#!/usr/bin/env python3
"""Deterministic multimodal fixture generator (dev tool; output is committed).

Produces fixtures/media.parquet: 88 rows of opaque binary payloads with typed
metadata, the shape a multimodal training-data pipeline stores media in.

Payload layouts (parsed by graft.operators.Multimodal):
  image rows (ids 0-59, png/jpeg slots) — the remaining fake "codec":
    bytes 0-1  width,  big-endian u16
    bytes 2-3  height, big-endian u16
    remaining bytes  body: byte i = (media_id*31 + i*7) % 256,
    length = 16 + (id % 64)
  audio rows — REAL RIFF/WAVE containers: "RIFF" + u32-LE riff size +
  "WAVE", a canonical 16-byte "fmt " chunk (PCM, channels, sample rate,
  byte rate, block align, bits), then a "data" chunk holding
  n_samples * block_align bytes of the same body formula. graft's wavMeta
  chunk-walk parses these actual container bytes.
  video/mp4 rows — REAL ISO-BMFF containers (the fixture video codec is
  retired): ftyp + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
  minf(vmhd, stbl(stsd, stts))))) + mdat, with three layout variants
  (moov-before-mdat, streaming mdat-before-moov with a free box, and a
  64-bit largesize mdat) and both version-0 and version-1 full boxes.
  graft's mp4Meta box-walk parses the actual container bytes: dims from
  tkhd's 16.16 fixed-point fields, frame count / duration from the stts
  entry table (split in two entries so the parser must sum), fps from
  the mdhd media timescale (fps*1000) over the constant sample delta
  (1000).
  video/x-msvideo rows (ids 76-87) — REAL AVI containers: RIFF "AVI " +
  LIST hdrl (avih main header + LIST strl(strh, strf)) + odd-size JUNK
  (padding rule exercised) + LIST movi with one 00dc frame chunk.
  graft's aviMeta RIFF/LIST walk reads dwMicroSecPerFrame,
  dwTotalFrames, dwWidth, dwHeight from the avih chunk.

The metadata columns (width/height/n_bytes/checksum, n_frames/fps for video,
sample_rate/channels/bits/n_samples for audio) are written REDUNDANTLY with
the containers so the engine's byte-level parse can be verified against an
independently-stored value by the DuckDB oracle (DuckDB cannot index into
BLOBs, so the oracle reads the metadata while Spark reads the bytes).
Checksum convention: fixture-codec rows sum the BODY mod 9973; real
containers (WAV, GIF, BMP, MP4, AVI) sum the WHOLE payload mod 9973.

No randomness: every value is a fixed formula of media_id.
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
os.makedirs(OUT, exist_ok=True)

MIMES = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]


# ---------------------------------------------------------------- ISO-BMFF

def be16(n):
    return n.to_bytes(2, "big")


def be32(n):
    return n.to_bytes(4, "big")


def be64(n):
    return n.to_bytes(8, "big")


def box(typ, *parts):
    body = b"".join(parts)
    return be32(8 + len(body)) + typ + body


def largesize_box(typ, *parts):
    """size=1 escape: the real 64-bit size follows the type."""
    body = b"".join(parts)
    return be32(1) + typ + be64(16 + len(body)) + body


def fullbox(typ, version, *parts):
    return box(typ, bytes([version]) + b"\x00\x00\x00", *parts)


UNITY_MATRIX = (be32(0x00010000) + be32(0) * 2 + be32(0) + be32(0x00010000)
                + be32(0) * 3 + be32(0x40000000))


def mp4_bytes(i, w, h, nf, fps, version, layout):
    """A minimal but REAL ISO-BMFF movie: every box a demuxer walks to
    reach dims / frame count / rate is present and spec-layout-exact."""
    med_ts = fps * 1000          # media timescale
    delta = 1000                 # constant sample delta -> fps exact
    ticks = nf * delta
    mov_ts = 600                 # movie timescale (QuickTime convention)
    mov_dur = nf * mov_ts // fps

    if version == 0:
        mvhd = fullbox(b"mvhd", 0, be32(0), be32(0), be32(mov_ts),
                       be32(mov_dur), be32(0x00010000), be16(0x0100), be16(0),
                       be32(0) * 2, UNITY_MATRIX, be32(0) * 6, be32(2))
        tkhd = fullbox(b"tkhd", 0, be32(0), be32(0), be32(1), be32(0),
                       be32(mov_dur), be32(0) * 2, be16(0), be16(0), be16(0),
                       be16(0), UNITY_MATRIX, be32(w << 16), be32(h << 16))
        mdhd = fullbox(b"mdhd", 0, be32(0), be32(0), be32(med_ts),
                       be32(ticks), be16(0x55C4), be16(0))
    else:
        mvhd = fullbox(b"mvhd", 1, be64(0), be64(0), be32(mov_ts),
                       be64(mov_dur), be32(0x00010000), be16(0x0100), be16(0),
                       be32(0) * 2, UNITY_MATRIX, be32(0) * 6, be32(2))
        tkhd = fullbox(b"tkhd", 1, be64(0), be64(0), be32(1), be32(0),
                       be64(mov_dur), be32(0) * 2, be16(0), be16(0), be16(0),
                       be16(0), UNITY_MATRIX, be32(w << 16), be32(h << 16))
        mdhd = fullbox(b"mdhd", 1, be64(0), be64(0), be32(med_ts),
                       be64(ticks), be16(0x55C4), be16(0))

    hdlr = fullbox(b"hdlr", 0, be32(0), b"vide", be32(0) * 3,
                   b"VideoHandler\x00")
    # stts split into TWO runs of the same delta: the parser must SUM the
    # entry table, not read a single field
    nf1 = nf // 2
    stts = fullbox(b"stts", 0, be32(2), be32(nf1), be32(delta),
                   be32(nf - nf1), be32(delta))
    stsd = fullbox(b"stsd", 0, be32(0))
    vmhd = fullbox(b"vmhd", 0, be16(0), be16(0) * 3)
    stbl = box(b"stbl", stsd, stts)
    minf = box(b"minf", vmhd, stbl)
    mdia = box(b"mdia", mdhd, hdlr, minf)
    trak = box(b"trak", tkhd, mdia)
    moov = box(b"moov", mvhd, trak)
    ftyp = box(b"ftyp", b"isom", be32(512), b"isom", b"mp41")
    body = bytes((i * 31 + j * 7) % 256 for j in range(16 + i % 64))

    if layout == 0:                         # canonical: moov then mdat
        return ftyp + moov + box(b"mdat", body)
    if layout == 1:                         # streaming: mdat first, free box
        return ftyp + box(b"free", b"\x00" * 5) + box(b"mdat", body) + moov
    return ftyp + moov + largesize_box(b"mdat", body)   # 64-bit size escape


# -------------------------------------------------------------------- AVI

def le16(n):
    return n.to_bytes(2, "little")


def le32(n):
    return n.to_bytes(4, "little")


def riff_chunk(fcc, body):
    pad = b"\x00" if len(body) % 2 else b""
    return fcc + le32(len(body)) + body + pad


def list_chunk(form, body):
    return riff_chunk(b"LIST", form + body)


def avi_bytes(i, w, h, nf, uspf, fps):
    """A minimal but REAL AVI: RIFF 'AVI ' with the hdrl header list a
    demuxer walks to the avih main header, stream list included, odd-size
    JUNK so the walk must pad, one frame chunk in movi. uspf is passed in
    (NOT re-derived from fps) so fixtures can carry NTSC-style rates where
    dwMicroSecPerFrame != 1000000//fps."""
    avih = riff_chunk(b"avih",
                      le32(uspf) + le32(0) + le32(0) + le32(0x10)   # HASINDEX
                      + le32(nf) + le32(0) + le32(1) + le32(0)
                      + le32(w) + le32(h) + le32(0) * 4)
    strh = riff_chunk(b"strh",
                      b"vids" + b"\x00" * 4 + le32(0) + le16(0) + le16(0)
                      + le32(0) + le32(1) + le32(fps) + le32(0) + le32(nf)
                      + le32(0) + le32(0) + le32(0)
                      + le16(0) + le16(0) + le16(w) + le16(h))
    strf = riff_chunk(b"strf",
                      le32(40) + le32(w) + le32(h) + le16(1) + le16(24)
                      + le32(0) + le32(w * h * 3) + le32(0) * 4)
    hdrl = list_chunk(b"hdrl", avih + list_chunk(b"strl", strh + strf))
    junk = riff_chunk(b"JUNK", b"\x00" * 13)            # odd size: pad rule
    body = bytes((i * 31 + j * 7) % 256 for j in range(16 + i % 64))
    movi = list_chunk(b"movi", riff_chunk(b"00dc", body))
    total = b"AVI " + hdrl + junk + movi
    return b"RIFF" + le32(len(total)) + total


ids, mimes, payloads, widths, heights = [], [], [], [], []
n_bytes, checksums, n_frames, fpss, uspfs = [], [], [], [], []
sample_rates, channelss, bitss, n_sampless = [], [], [], []
for i in range(60):
    mime = MIMES[i % 4]
    if mime == "audio/wav":
        sr = (8000, 11025, 22050, 44100)[(i // 4) % 4]
        ch = 1 + (i // 4) % 2
        bits = (8, 16)[(i // 8) % 2]
        block = ch * bits // 8
        nsamp = 50 + (i * 11) % 300
        body = bytes((i * 31 + j * 7) % 256 for j in range(nsamp * block))
        fmt = (
            (1).to_bytes(2, "little")          # PCM
            + ch.to_bytes(2, "little")
            + sr.to_bytes(4, "little")
            + (sr * block).to_bytes(4, "little")
            + block.to_bytes(2, "little")
            + bits.to_bytes(2, "little")
        )
        payload = (
            b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
            + b"fmt " + (16).to_bytes(4, "little") + fmt
            + b"data" + len(body).to_bytes(4, "little") + body
        )
        checksum = sum(body) % 9973
        w, h, nf, fps = None, None, None, None
    elif mime == "video/mp4":
        w = 64 + (i * 17) % 512
        h = 48 + (i * 29) % 512
        nf = 24 + (i * 13) % 200
        fps = (12, 24, 25, 30)[(i // 4) % 4]
        payload = mp4_bytes(i, w, h, nf, fps,
                            version=(i // 4) % 2, layout=(i // 4) % 3)
        checksum = sum(payload) % 9973      # real-container convention
        sr, ch, bits, nsamp = None, None, None, None
    else:
        w = 64 + (i * 17) % 512
        h = 48 + (i * 29) % 512
        body = bytes((i * 31 + j * 7) % 256 for j in range(16 + i % 64))
        payload = w.to_bytes(2, "big") + h.to_bytes(2, "big") + body
        checksum = sum(body) % 9973
        nf, fps = None, None
        sr, ch, bits, nsamp = None, None, None, None
    ids.append(i)
    mimes.append(mime)
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(checksum)
    n_frames.append(nf)
    fpss.append(fps)
    sample_rates.append(sr)
    channelss.append(ch)
    bitss.append(bits)
    n_sampless.append(nsamp)

# ---- rows 60-75: REAL GIF and BMP containers (complete valid files,
# parsed byte-level by graft's gifDims/bmpDims; metadata stays the
# independent verification channel). Checksum convention for real
# containers: sum over the WHOLE payload, mod 9973.


def gif_bytes(i, w, h, version):
    """A complete valid GIF: header + logical screen descriptor + 4-color
    global palette + image descriptor + LZW data (min code size 2, a
    clear code before every pixel code so the code width never grows —
    the standard 'uncompressed GIF' trick) + trailer."""
    hdr = b"GIF" + version
    # flags 0x91: global palette, color resolution 2 bits, palette 2^(1+1)=4
    lsd = w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([0x91, 0, 0])
    palette = bytes(((i * 7 + k * 11) % 256) for k in range(12))
    desc = b"\x2c" + (0).to_bytes(2, "little") * 2 \
        + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    codes = []
    for j in range(w * h):
        codes.append(4)                       # clear
        codes.append((i * 31 + j * 7) % 4)    # pixel index
    codes.append(5)                           # end of information
    bits, nbits = 0, 0
    stream = bytearray()
    for c in codes:                           # LSB-first packing, 3-bit codes
        bits |= c << nbits
        nbits += 3
        while nbits >= 8:
            stream.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8
    if nbits:
        stream.append(bits & 0xFF)
    blocks = b""
    for off in range(0, len(stream), 255):
        chunk = stream[off:off + 255]
        blocks += bytes([len(chunk)]) + bytes(chunk)
    return hdr + lsd + palette + desc + b"\x02" + blocks + b"\x00" + b"\x3b"


def bmp_bytes(i, w, h):
    """A complete valid bottom-up 24-bpp BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + 4-byte-aligned pixel rows."""
    row = w * 3
    pad = (4 - row % 4) % 4
    rows = b"".join(
        bytes((i * 31 + (r * row + j) * 7) % 256 for j in range(row))
        + b"\x00" * pad
        for r in range(h))
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
           + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
           + len(rows).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
           + (0).to_bytes(4, "little") + (0).to_bytes(4, "little"))
    filehdr = (b"BM" + (14 + 40 + len(rows)).to_bytes(4, "little")
               + (0).to_bytes(4, "little") + (54).to_bytes(4, "little"))
    return filehdr + dib + rows


for i in range(60, 76):
    k = i - 60
    w = 3 + (k * 5) % 14
    h = 2 + (k * 3) % 9
    if k % 2 == 0:
        mime = "image/gif"
        payload = gif_bytes(i, w, h, b"87a" if k % 4 == 0 else b"89a")
    else:
        mime = "image/bmp"
        payload = bmp_bytes(i, w, h)
    ids.append(i)
    mimes.append(mime)
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# ---- rows 76-87: REAL AVI containers (second video container format, so
# the demux dispatch on magic bytes is exercised both ways).

for i in range(76, 88):
    k = i - 76
    w = 80 + (k * 37) % 400
    h = 60 + (k * 23) % 300
    nf = 30 + (k * 17) % 180
    # half the rows deviate from the round 1000000//fps tick (NTSC-style
    # timebases): dwMicroSecPerFrame is the container's authoritative rate,
    # and the stored fps/uspf metadata derive FROM it — an oracle that
    # re-derived uspf as 1000000//fps would be wrong on these rows
    nominal = (12, 24, 25, 30)[k % 4]
    uspf = 1000000 // nominal + (0, 3, 0, 34)[k % 4]
    fps = 1000000 // uspf
    payload = avi_bytes(i, w, h, nf, uspf, fps)
    ids.append(i)
    mimes.append(mime := "video/x-msvideo")
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(nf)
    fpss.append(fps)
    uspfs.append(uspf)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# ---- rows 88-99: perceptual-hash near-dup families (image + audio).
# Every payload is still a complete valid container built by the same
# builders above; what changes is that the PIXEL/SAMPLE streams are
# derived from a BASE row's formula (optionally sparsely perturbed), so
# the corpus contains genuine exact- and near-duplicate CONTENT under
# different media_ids — the thing a perceptual hash exists to find, and
# absent from rows 0-87 (every formula there is keyed on media_id).
# Formula convention (the oracle replays it):
#   seed(id): 89,90 -> 88; 93,94 -> 92; 97,98 -> 96; else id
#   BMP byte at unpadded index n: (seed*31 + n*7 + d) % 256,
#     d = 16 if id == 89 and n % 103 == 0 else 0
#   GIF pixel code at raster index j: ((seed*31 + j*7) % 4 + e) % 4,
#     e = 1 if id == 93 and j % 37 == 0 else 0 (palette keyed on seed)
#   WAV body byte j: (seed*31 + j*7 + d) % 256,
#     d = 40 if id == 98 and j % 9 == 0 else 0
# Measured separation (tools/proto — replayed by the oracle): image
# family pairs Hamming <= 1 / sample-L1 <= 132, nearest non-family pair
# Hamming 4 / L1 1852; audio family pairs Hamming <= 2 / relative-L1
# <= 34 permille, nearest non-family Hamming 15.


def bmp_bytes_seeded(seed, w, h, perturb):
    row = w * 3
    pad = (4 - row % 4) % 4

    def v(n):
        d = 16 if (perturb and n % 103 == 0) else 0
        return (seed * 31 + n * 7 + d) % 256
    rows = b"".join(
        bytes(v(r * row + j) for j in range(row)) + b"\x00" * pad
        for r in range(h))
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
           + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
           + len(rows).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
           + (0).to_bytes(4, "little") + (0).to_bytes(4, "little"))
    filehdr = (b"BM" + (14 + 40 + len(rows)).to_bytes(4, "little")
               + (0).to_bytes(4, "little") + (54).to_bytes(4, "little"))
    return filehdr + dib + rows


def gif_bytes_seeded(seed, w, h, perturb):
    hdr = b"GIF89a"
    lsd = w.to_bytes(2, "little") + h.to_bytes(2, "little") + bytes([0x91, 0, 0])
    palette = bytes(((seed * 7 + k * 11) % 256) for k in range(12))
    desc = b"\x2c" + (0).to_bytes(2, "little") * 2 \
        + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    codes = []
    for j in range(w * h):
        codes.append(4)
        c = (seed * 31 + j * 7) % 4
        if perturb and j % 37 == 0:
            c = (c + 1) % 4
        codes.append(c)
    codes.append(5)
    bits, nbits = 0, 0
    stream = bytearray()
    for c in codes:
        bits |= c << nbits
        nbits += 3
        while nbits >= 8:
            stream.append(bits & 0xFF)
            bits >>= 8
            nbits -= 8
    if nbits:
        stream.append(bits & 0xFF)
    blocks = b""
    for off in range(0, len(stream), 255):
        chunk = stream[off:off + 255]
        blocks += bytes([len(chunk)]) + bytes(chunk)
    return hdr + lsd + palette + desc + b"\x02" + blocks + b"\x00" + b"\x3b"


def wav_bytes_seeded(seed, nsamp, perturb):
    sr, ch, bits = 8000, 1, 8

    def v(j):
        d = 40 if (perturb and j % 9 == 0) else 0
        return (seed * 31 + j * 7 + d) % 256
    body = bytes(v(j) for j in range(nsamp))
    fmt = ((1).to_bytes(2, "little") + ch.to_bytes(2, "little")
           + sr.to_bytes(4, "little") + (sr * ch).to_bytes(4, "little")
           + (ch).to_bytes(2, "little") + bits.to_bytes(2, "little"))
    payload = (b"RIFF" + (36 + len(body)).to_bytes(4, "little") + b"WAVE"
               + b"fmt " + (16).to_bytes(4, "little") + fmt
               + b"data" + len(body).to_bytes(4, "little") + body)
    return payload, body


NEARDUP_IMAGES = [
    # (id, mime, builder args): seed, w, h, perturb
    (88, "image/bmp", (88, 16, 12, False)),
    (89, "image/bmp", (88, 16, 12, True)),   # near-dup of 88
    (90, "image/bmp", (88, 16, 12, False)),  # exact pixel copy of 88
    (91, "image/bmp", (91, 16, 12, False)),  # unrelated
    (92, "image/gif", (92, 12, 10, False)),
    (93, "image/gif", (92, 12, 10, True)),   # near-dup of 92
    (94, "image/gif", (92, 12, 10, False)),  # exact pixel copy of 92
    (95, "image/gif", (95, 12, 10, False)),  # unrelated
]
for i, mime, (seed, w, h, perturb) in NEARDUP_IMAGES:
    payload = (bmp_bytes_seeded if mime == "image/bmp"
               else gif_bytes_seeded)(seed, w, h, perturb)
    ids.append(i)
    mimes.append(mime)
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

NEARDUP_AUDIO = [
    (96, 96, False),  # base
    (97, 96, False),  # exact stream copy of 96
    (98, 96, True),   # near-dup of 96
    (99, 99, False),  # unrelated
]
for i, seed, perturb in NEARDUP_AUDIO:
    payload, body = wav_bytes_seeded(seed, 256, perturb)
    ids.append(i)
    mimes.append("audio/wav")
    payloads.append(payload)
    widths.append(None)
    heights.append(None)
    n_bytes.append(len(payload))
    checksums.append(sum(body) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(8000)
    channelss.append(1)
    bitss.append(8)
    n_sampless.append(256)

# ---- row 100: CROSS-FORMAT content duplicate — a 24-bpp BMP whose
# pixel colors are byte-identical to GIF row 92's decoded palette
# colors. The perceptual hash is computed over decoded luma rasters, so
# the pair (92, 100) must collide at Hamming 0 even though the
# containers share not a single byte: content-keyed, not
# container-keyed.


def bmp_bytes_pixels(w, h, rgb_of):
    """24-bpp bottom-up BMP from an explicit (x, y) -> (r, g, b) map."""
    row = w * 3
    pad = (4 - row % 4) % 4
    rows = b""
    for rr in range(h):                     # file rows bottom-up
        y = h - 1 - rr
        for x in range(w):
            r, g, b = rgb_of(x, y)
            rows += bytes([b, g, r])        # stored B,G,R
        rows += b"\x00" * pad
    dib = ((40).to_bytes(4, "little") + w.to_bytes(4, "little")
           + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
           + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
           + len(rows).to_bytes(4, "little")
           + (2835).to_bytes(4, "little") + (2835).to_bytes(4, "little")
           + (0).to_bytes(4, "little") + (0).to_bytes(4, "little"))
    filehdr = (b"BM" + (14 + 40 + len(rows)).to_bytes(4, "little")
               + (0).to_bytes(4, "little") + (54).to_bytes(4, "little"))
    return filehdr + dib + rows


def gif92_rgb(x, y):
    j = y * 12 + x
    c = (92 * 31 + j * 7) % 4
    pal = [(92 * 7 + k * 11) % 256 for k in range(12)]
    return pal[3 * c], pal[3 * c + 1], pal[3 * c + 2]


_xfmt = bmp_bytes_pixels(12, 10, gif92_rgb)
ids.append(100)
mimes.append("image/bmp")
payloads.append(_xfmt)
widths.append(12)
heights.append(10)
n_bytes.append(len(_xfmt))
checksums.append(sum(_xfmt) % 9973)
n_frames.append(None)
fpss.append(None)
sample_rates.append(None)
channelss.append(None)
bitss.append(None)
n_sampless.append(None)

# ---- rows 101-103: REAL PNG containers (8-bit truecolor, IDAT zlib
# stream, filter-0 scanlines) — the third real pixel-decode format.
# Channel byte at index n = 3*(y*w+x)+c is (seed*31 + n*7) % 256 in
# R,G,B scanline order (no row flip, no padding — unlike BMP), so the
# oracle regenerates pixels directly. Row 102 is an exact pixel copy of
# 101 under its own id (the PNG leg of the near-dup family); 103 is the
# unrelated control. graft's pngGray inflates and defilters the actual
# container bytes.
import struct
import zlib


def png_chunk(typ, data):
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def png_bytes_seeded(seed, w, h):
    raw = b""
    for y in range(h):
        raw += b"\x00"  # filter type 0 per scanline
        for x in range(w):
            n = 3 * (y * w + x)
            raw += bytes(((seed * 31 + (n + c) * 7) % 256) for c in range(3))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolor
    return (b"\x89PNG\r\n\x1a\n" + png_chunk(b"IHDR", ihdr)
            + png_chunk(b"IDAT", zlib.compress(raw))
            + png_chunk(b"IEND", b""))


for i, seed in ((101, 101), (102, 101), (103, 103)):
    payload = png_bytes_seeded(seed, 11, 9)
    ids.append(i)
    mimes.append("image/png")
    payloads.append(payload)
    widths.append(11)
    heights.append(9)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# ---- row 104: GAIN-SHIFTED audio duplicate — row 96's PCM stream at
# half volume (amp' = floor(amp/2), byte = 128 + amp'). The energy-
# envelope fingerprint is volume-invariant by construction (bit =
# 64·E_t > ΣE scales out), so (96, 104) collides at Hamming 0 — but the
# ABSOLUTE relative-L1 verify of q279 correctly rejects it (≈333‰);
# only the normalized per-window PROFILE verify (q285) accepts it.
_half = bytes(128 + ((((96 * 31 + j * 7) % 256) - 128) // 2)
              for j in range(256))
_fmt104 = ((1).to_bytes(2, "little") + (1).to_bytes(2, "little")
           + (8000).to_bytes(4, "little") + (8000).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + (8).to_bytes(2, "little"))
_wav104 = (b"RIFF" + (36 + len(_half)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little") + _fmt104
           + b"data" + len(_half).to_bytes(4, "little") + _half)
ids.append(104)
mimes.append("audio/wav")
payloads.append(_wav104)
widths.append(None)
heights.append(None)
n_bytes.append(len(_wav104))
checksums.append(sum(_half) % 9973)
n_frames.append(None)
fpss.append(None)
sample_rates.append(8000)
channelss.append(1)
bitss.append(8)
n_sampless.append(256)

# ---- rows 105-109: REAL baseline sequential JPEGs (grayscale, one
# component) — SOI + DQT + SOF0 + two DHT tables + SOS + a genuine
# Huffman-coded entropy stream (DC difference coding, AC run-length with
# EOB/ZRL, byte stuffing) + EOI. The QUANTIZED COEFFICIENTS follow a
# fixed formula of (seed, block b in raster order, zigzag index z):
#   DC (z=0): ((seed*5 + b*11) % 61) - 30, +8 on blocks b%3==0 of the
#             perturbed row 107 only
#   AC:       ((seed*3 + b*7 + z*11) % 19) - 9 when (seed + b*3 + z*5)%7
#             == 0, else 0
#   quant table (zigzag index): Q[z] = 1 + (z % 5)
# Decoded pixels are pinned to graft's documented integer IDCT
# (K[u][x] = round(alpha(u)/2 * cos((2x+1)u*pi/16) * 2^10), pixel =
# floor((sum + 2^19)/2^20) + 128, clamped) so the DuckDB oracle replays
# the identical integer algorithm from this coefficient formula — the
# decoder's Huffman/dequant/IDCT walk must reproduce it bit-exactly.
# Huffman tables are written in the DHT segments (canonical codes: 12 DC
# symbols at 4 bits, 66 AC symbols at 7 bits) — the decoder must build
# its tables from the FILE, not assume Annex K.
# seed(id): 106,107 -> 105; else id. Row 106 = exact coefficient copy of
# 105; 107 = DC-perturbed near-dup; 108 unrelated; 109 unrelated with
# non-multiple-of-8 dims (MCU padding/crop path).

DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 5)]


def jpeg_qc(seed, b, z, perturb):
    if z == 0:
        v = ((seed * 5 + b * 11) % 61) - 30
        if perturb and b % 3 == 0:
            v += 8
        return v
    if (seed + b * 3 + z * 5) % 7 == 0:
        return ((seed * 3 + b * 7 + z * 11) % 19) - 9
    return 0


def jpeg_bytes_seeded(seed, w, h, perturb, restart=0):
    """restart > 0 (r16): emit a DRI segment and a byte-aligned RSTn
    marker every `restart` MCUs, resetting the DC predictor — the
    resync machinery every long real-world scan carries. Markers are
    never byte-stuffed; the 1-padded final data byte before one IS
    stuffed when it lands on 0xFF (the flush_scan convention)."""
    bw, bh = (w + 7) // 8, (h + 7) // 8
    Q = [1 + (z % 5) for z in range(64)]
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}

    acc = [0, 0]          # bit accumulator, bit count
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)       # byte stuffing
                acc[0] = acc[1] = 0

    rst = [0]

    def align_rst():
        if acc[1]:
            pad = 8 - acc[1]
            fin = (acc[0] << pad) | ((1 << pad) - 1)
            out.append(fin)
            if fin == 0xFF:
                out.append(0)
            acc[0] = acc[1] = 0
        out.append(0xFF)
        out.append(0xD0 + (rst[0] & 7))
        rst[0] += 1

    pred = 0
    for b in range(bw * bh):
        if restart and b > 0 and b % restart == 0:
            align_rst()
            pred = 0
        coefs = [jpeg_qc(seed, b, z, perturb) for z in range(64)]
        diff = coefs[0] - pred
        pred = coefs[0]
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        put(code, ln)
        if s:
            put(diff if diff > 0 else diff + (1 << s) - 1, s)
        last = 63
        while last > 0 and coefs[last] == 0:
            last -= 1
        k = 1
        while k <= last:
            run = 0
            while coefs[k] == 0:
                run += 1
                k += 1
            while run >= 16:
                code, ln = ac_codes[0xF0]
                put(code, ln)
                run -= 16
            v = coefs[k]
            s = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            put(code, ln)
            put(v if v > 0 else v + (1 << s) - 1, s)
            k += 1
        if last < 63:
            code, ln = ac_codes[0x00]
            put(code, ln)
    if acc[1]:                         # pad final byte with 1-bits
        pad = 8 - acc[1]
        fin = (acc[0] << pad) | ((1 << pad) - 1)
        out.append(fin)
        if fin == 0xFF:
            out.append(0)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)          # all DC codes 4 bits long
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)          # all AC codes 7 bits long
    dri = seg(0xDD, restart.to_bytes(2, "big")) if restart else b""
    return (b"\xFF\xD8"
            + seg(0xDB, bytes([0x00]) + bytes(Q))
            + seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                  + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + dri
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bytes(out) + b"\xFF\xD9")


JPEG_ROWS = [
    (105, 105, 24, 16, False),   # base
    (106, 105, 24, 16, False),   # exact coefficient copy of 105
    (107, 105, 24, 16, True),    # DC-perturbed near-dup of 105
    (108, 108, 24, 16, False),   # unrelated
    (109, 109, 20, 12, False),   # unrelated, non-multiple-of-8 dims (crop)
]
for i, seed, w, h, perturb in JPEG_ROWS:
    payload = jpeg_bytes_seeded(seed, w, h, perturb)
    ids.append(i)
    mimes.append("image/jpeg")
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# ---- rows 110-115: video CONTENT near-dup family — real MP4/AVI
# containers whose media data is the fixture RAW-GRAY codec: 8-bit
# grayscale frames stored frame-major, rows top-down, w*h bytes per
# frame (MP4: one contiguous mdat; AVI: one 00dc chunk per frame in
# movi). Frame-stream byte at global index n = f*w*h + y*w + x:
#   (seed*31 + n*7 + d) % 256, d = 16 if id == 112 and n % 251 == 0
# seed(id): 111,112 -> 110; 115 -> 114; else id. 111 = exact stream
# copy of 110; 112 = sparse perturbation; 113 unrelated; (114, 115) =
# the CROSS-CONTAINER duplicate: the same stream in an AVI (114) and an
# MP4 (115) — content-keyed, not container-keyed.


def raw_frames(seed, w, h, nf, perturb):
    def v(n):
        d = 16 if (perturb and n % 251 == 0) else 0
        return (seed * 31 + n * 7 + d) % 256
    return bytes(v(n) for n in range(nf * w * h))


def mp4_bytes_frames(seed, w, h, nf, fps, perturb):
    """Same REAL ISO-BMFF skeleton as mp4_bytes, mdat = raw-gray frames."""
    med_ts = fps * 1000
    delta = 1000
    ticks = nf * delta
    mov_ts = 600
    mov_dur = nf * mov_ts // fps
    mvhd = fullbox(b"mvhd", 0, be32(0), be32(0), be32(mov_ts),
                   be32(mov_dur), be32(0x00010000), be16(0x0100), be16(0),
                   be32(0) * 2, UNITY_MATRIX, be32(0) * 6, be32(2))
    tkhd = fullbox(b"tkhd", 0, be32(0), be32(0), be32(1), be32(0),
                   be32(mov_dur), be32(0) * 2, be16(0), be16(0), be16(0),
                   be16(0), UNITY_MATRIX, be32(w << 16), be32(h << 16))
    mdhd = fullbox(b"mdhd", 0, be32(0), be32(0), be32(med_ts),
                   be32(ticks), be16(0x55C4), be16(0))
    hdlr = fullbox(b"hdlr", 0, be32(0), b"vide", be32(0) * 3,
                   b"VideoHandler\x00")
    nf1 = nf // 2
    stts = fullbox(b"stts", 0, be32(2), be32(nf1), be32(delta),
                   be32(nf - nf1), be32(delta))
    stsd = fullbox(b"stsd", 0, be32(0))
    vmhd = fullbox(b"vmhd", 0, be16(0), be16(0) * 3)
    stbl = box(b"stbl", stsd, stts)
    minf = box(b"minf", vmhd, stbl)
    mdia = box(b"mdia", mdhd, hdlr, minf)
    trak = box(b"trak", tkhd, mdia)
    moov = box(b"moov", mvhd, trak)
    ftyp = box(b"ftyp", b"isom", be32(512), b"isom", b"mp41")
    return ftyp + moov + box(b"mdat", raw_frames(seed, w, h, nf, perturb))


def avi_bytes_frames(seed, w, h, nf, uspf, fps, perturb):
    """Same REAL AVI skeleton as avi_bytes, movi = one 00dc chunk/frame."""
    avih = riff_chunk(b"avih",
                      le32(uspf) + le32(0) + le32(0) + le32(0x10)
                      + le32(nf) + le32(0) + le32(1) + le32(0)
                      + le32(w) + le32(h) + le32(0) * 4)
    strh = riff_chunk(b"strh",
                      b"vids" + b"\x00" * 4 + le32(0) + le16(0) + le16(0)
                      + le32(0) + le32(1) + le32(fps) + le32(0) + le32(nf)
                      + le32(0) + le32(0) + le32(0)
                      + le16(0) + le16(0) + le16(w) + le16(h))
    strf = riff_chunk(b"strf",
                      le32(40) + le32(w) + le32(h) + le16(1) + le16(8)
                      + le32(0) + le32(w * h) + le32(0) * 4)
    hdrl = list_chunk(b"hdrl", avih + list_chunk(b"strl", strh + strf))
    stream = raw_frames(seed, w, h, nf, perturb)
    movi_body = b"".join(
        riff_chunk(b"00dc", stream[f * w * h:(f + 1) * w * h])
        for f in range(nf))
    movi = list_chunk(b"movi", movi_body)
    total = b"AVI " + hdrl + movi
    return b"RIFF" + le32(len(total)) + total


VIDEO_ROWS = [
    # (id, container, seed, w, h, nf, fps, perturb)
    (110, "mp4", 110, 16, 12, 20, 12, False),   # base
    (111, "mp4", 110, 16, 12, 20, 12, False),   # exact stream copy of 110
    (112, "mp4", 110, 16, 12, 20, 12, True),    # sparse perturbation
    (113, "mp4", 113, 16, 12, 20, 12, False),   # unrelated
    (114, "avi", 114, 16, 12, 20, 25, False),   # cross-container base
    (115, "mp4", 114, 16, 12, 20, 25, False),   # same STREAM, other container
]
for i, cont, seed, w, h, nf, fps, perturb in VIDEO_ROWS:
    if cont == "mp4":
        payload = mp4_bytes_frames(seed, w, h, nf, fps, perturb)
        mime = "video/mp4"
        uspf = None
    else:
        uspf = 1000000 // fps
        payload = avi_bytes_frames(seed, w, h, nf, uspf, fps, perturb)
        mime = "video/x-msvideo"
    ids.append(i)
    mimes.append(mime)
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(nf)
    fpss.append(fps)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)
    if cont == "avi":
        uspfs.append(uspf)

# ---- rows 116-119: COLOR baseline JPEGs — the dominant real-world
# layout. 116-118 are 4:2:0 (Y has H=V=2: four Y blocks per 16x16 MCU,
# one Cb + one Cr block each, interleaved per the spec; chroma carries
# its OWN quant table Tq=1 and its own Huffman pair Td=Ta=1, so the
# multi-table DQT/DHT parse is exercised); 119 is 4:4:4 (all H=V=1).
# The decoder's fast-luma path entropy-decodes the chroma blocks (the
# bitstream cannot be advanced otherwise) but reconstructs pixels from
# the Y plane only — luma IS what the perceptual-hash stack consumes.
# Y-coefficient formula: same jpeg_qc keyed on the GLOBAL Y-block
# counter in stream order (for 4:2:0 that is MCU-major, 4 sub-blocks
# per MCU: bY = mcu*4 + (inMcuRow*2 + inMcuCol)); chroma coefficients
# follow their own formula (jpeg_qc_chroma) so the skipped blocks carry
# real entropy-coded data, not zeros. seed(117) = 116 (exact copy).

QC = [2 + (z % 4) for z in range(64)]   # chroma quant table (Tq=1)


def jpeg_qc_chroma(seed, comp, b, z):
    if z == 0:
        return ((seed * 3 + comp * 17 + b * 5) % 41) - 20
    if (seed + comp + b + z * 3) % 5 == 0:
        return ((seed + comp * 5 + b * 7 + z * 11) % 15) - 7
    return 0


def jpeg_bytes_color(seed, w, h, subsampled, perturb=False, cswap=False,
                     samp=None):
    """Baseline JFIF-style color JPEG from the coefficient formulas.
    subsampled: True -> 4:2:0 (Y H=V=2), False -> 4:4:4 (all 1x1);
    samp: explicit (yh, yv) luma sampling override (e.g. (2, 1) for
    4:2:2) — chroma always 1x1.
    perturb: the row-107 DC rule (+8 on Y blocks b%3==0).
    cswap: swap the Cb and Cr coefficient formulas (hue shift at
    IDENTICAL luma)."""
    yh, yv = samp if samp else ((2, 2) if subsampled else (1, 1))
    Q = [1 + (z % 5) for z in range(64)]
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}
    # chroma tables: same symbol sets, different canonical lengths (5/8)
    dc2_codes = {sym: (i, 5) for i, sym in enumerate(DC_SYMS)}
    ac2_codes = {sym: (i, 8) for i, sym in enumerate(AC_SYMS)}

    acc = [0, 0]
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)
                acc[0] = acc[1] = 0

    def put_block(coefs, pred, dcc, acc_codes):
        diff = coefs[0] - pred
        s = abs(diff).bit_length()
        code, ln = dcc[s]
        put(code, ln)
        if s:
            put(diff if diff > 0 else diff + (1 << s) - 1, s)
        last = 63
        while last > 0 and coefs[last] == 0:
            last -= 1
        k = 1
        while k <= last:
            run = 0
            while coefs[k] == 0:
                run += 1
                k += 1
            while run >= 16:
                code, ln = acc_codes[0xF0]
                put(code, ln)
                run -= 16
            v = coefs[k]
            s = abs(v).bit_length()
            code, ln = acc_codes[(run << 4) | s]
            put(code, ln)
            put(v if v > 0 else v + (1 << s) - 1, s)
            k += 1
        if last < 63:
            code, ln = acc_codes[0x00]
            put(code, ln)
        return coefs[0]

    mw = (w + 8 * yh - 1) // (8 * yh)
    mh = (h + 8 * yv - 1) // (8 * yv)
    predY = predCb = predCr = 0
    bY = 0
    for m in range(mw * mh):
        cb_comp, cr_comp = (2, 1) if cswap else (1, 2)
        for _ in range(yh * yv):    # luma blocks per MCU, raster order
            predY = put_block([jpeg_qc(seed, bY, z, perturb) for z in range(64)],
                              predY, dc_codes, ac_codes)
            bY += 1
        predCb = put_block([jpeg_qc_chroma(seed, cb_comp, m, z) for z in range(64)],
                           predCb, dc2_codes, ac2_codes)
        predCr = put_block([jpeg_qc_chroma(seed, cr_comp, m, z) for z in range(64)],
                           predCr, dc2_codes, ac2_codes)
    if acc[1]:
        pad = 8 - acc[1]
        fin = (acc[0] << pad) | ((1 << pad) - 1)
        out.append(fin)
        if fin == 0xFF:
            out.append(0)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    yhv = (yh << 4) | yv
    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)
    bits_dc2 = [0] * 16
    bits_dc2[4] = len(DC_SYMS)          # chroma DC codes 5 bits long
    bits_ac2 = [0] * 16
    bits_ac2[7] = len(AC_SYMS)          # chroma AC codes 8 bits long
    return (b"\xFF\xD8"
            + seg(0xDB, bytes([0x00]) + bytes(Q) + bytes([0x01]) + bytes(QC))
            + seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                  + bytes([3, 1, yhv, 0, 2, 0x11, 1, 3, 0x11, 1]))
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + seg(0xC4, bytes([0x01]) + bytes(bits_dc2) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x11]) + bytes(bits_ac2) + bytes(AC_SYMS))
            + seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
            + bytes(out) + b"\xFF\xD9")


# rows 120-123 extend the color family for CHROMA RECONSTRUCTION
# (round 14): 120 base; 121 the HUE-SHIFTED twin — identical Y
# coefficients, Cb/Cr formulas SWAPPED, so the luma stack sees an exact
# duplicate while the color planes differ; 122 the true near-dup (the
# row-107 DC perturbation on Y, chroma unchanged); 123 unrelated.
COLOR_JPEG_ROWS = [
    # (id, seedY, w, h, sub, perturbY, chroma_swap)
    (116, 116, 32, 16, True, False, False),  # 4:2:0 base (2x1 MCU grid)
    (117, 116, 32, 16, True, False, False),  # exact coefficient copy of 116
    (118, 118, 32, 16, True, False, False),  # unrelated 4:2:0
    (119, 119, 24, 16, False, False, False), # 4:4:4 layout
    (120, 120, 32, 16, True, False, False),  # color base
    (121, 120, 32, 16, True, False, True),   # hue-shifted: same Y, Cb/Cr swapped
    (122, 120, 32, 16, True, True, False),   # true near-dup: Y perturbed
    (123, 123, 32, 16, True, False, False),  # unrelated
]
for i, seed, w, h, sub, perturb, cswap in COLOR_JPEG_ROWS:
    payload = jpeg_bytes_color(seed, w, h, sub, perturb=perturb, cswap=cswap)
    ids.append(i)
    mimes.append("image/jpeg")
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# ---- rows 124-127: PROGRESSIVE (SOF2) grayscale JPEGs — round 15. The
# SAME jpeg_qc quantized coefficients as the baseline rows, serialized
# through a full Annex G progression (spectral selection + successive
# approximation), so the expected pixels replay through the identical
# pinned-IDCT coefficient formula — and row 125 is a progressive
# RE-ENCODE of row 105 (bit-identical pixels: the cross-layout exact
# duplicate a crawl near-dup screen must collapse). Scan script
# (exercises every progressive mode):
#   1. DC first    Ss=0 Se=0  Ah=0 Al=1   (diffs of coef>>1, floor)
#   2. AC first    Ss=1 Se=5  Ah=0 Al=1   (values truncated toward 0)
#   3. AC first    Ss=6 Se=63 Ah=0 Al=1
#   4. DC refine   Ss=0 Se=0  Ah=1 Al=0   (one raw bit per block)
#   5. AC refine   Ss=1 Se=5  Ah=1 Al=0   (correction-bit protocol)
#   6. AC refine   Ss=6 Se=63 Ah=1 Al=0
# EOB runs are encoded per-block (EOB0) — legal, and what the per-block
# run-length encoder below emits.


def jpeg_bytes_progressive(seed, w, h, perturb):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    Q = [1 + (z % 5) for z in range(64)]
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}
    blocks = [[jpeg_qc(seed, b, z, perturb) for z in range(64)]
              for b in range(bw * bh)]

    acc = [0, 0]
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)
                acc[0] = acc[1] = 0

    def put_code(codes, sym):
        code, ln = codes[sym]
        put(code, ln)

    def flush_scan():
        if acc[1]:
            pad = 8 - acc[1]
            fin = (acc[0] << pad) | ((1 << pad) - 1)
            out.append(fin)
            if fin == 0xFF:
                out.append(0)
            acc[0] = acc[1] = 0
        scan = bytes(out)
        out.clear()
        return scan

    def dc_first(al):
        pred = 0
        for c in blocks:
            v = c[0] >> al                 # point transform: floor
            diff = v - pred
            pred = v
            s = abs(diff).bit_length()
            put_code(dc_codes, s)
            if s:
                put(diff if diff > 0 else diff + (1 << s) - 1, s)
        return flush_scan()

    def dc_refine(al):
        for c in blocks:
            put((c[0] >> al) & 1, 1)
        return flush_scan()

    def ac_first(ss, se, al):
        for c in blocks:
            vals = []
            for k in range(ss, se + 1):
                a = abs(c[k]) >> al        # point transform: toward zero
                vals.append(a if c[k] >= 0 else -a)
            last = len(vals) - 1
            while last >= 0 and vals[last] == 0:
                last -= 1
            k = 0
            while k <= last:
                run = 0
                while vals[k] == 0:
                    run += 1
                    k += 1
                while run >= 16:
                    put_code(ac_codes, 0xF0)
                    run -= 16
                v = vals[k]
                s = abs(v).bit_length()
                put_code(ac_codes, (run << 4) | s)
                put(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
            if last < len(vals) - 1:
                put_code(ac_codes, 0x00)   # EOB0
        return flush_scan()

    def ac_refine(ss, se, al):
        # the libjpeg encode_mcu_AC_refine shape with per-block EOB0
        for c in blocks:
            eob = ss - 1                  # last NEWLY-nonzero position
            for k in range(ss, se + 1):
                if (abs(c[k]) >> al) == 1:
                    eob = k
            r = 0
            br = []                        # buffered correction bits
            for k in range(ss, se + 1):
                temp = abs(c[k]) >> al
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    put_code(ac_codes, 0xF0)
                    r -= 16
                    for b in br:
                        put(b, 1)
                    br = []
                if temp > 1:               # history coefficient: one bit
                    br.append(temp & 1)
                    continue
                put_code(ac_codes, (r << 4) | 1)
                put(1 if c[k] > 0 else 0, 1)
                for b in br:
                    put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                put_code(ac_codes, 0x00)   # EOB0
                for b in br:
                    put(b, 1)
        return flush_scan()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(ss, se, ah, al):
        return seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)
    return (b"\xFF\xD8"
            + seg(0xDB, bytes([0x00]) + bytes(Q))
            + seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                  + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + sos(0, 0, 0, 1) + dc_first(1)
            + sos(1, 5, 0, 1) + ac_first(1, 5, 1)
            + sos(6, 63, 0, 1) + ac_first(6, 63, 1)
            + sos(0, 0, 1, 0) + dc_refine(0)
            + sos(1, 5, 1, 0) + ac_refine(1, 5, 0)
            + sos(6, 63, 1, 0) + ac_refine(6, 63, 0)
            + b"\xFF\xD9")


# row 128: COLOR 4:4:4 progressive — the INTERLEAVED DC scan (three
# components per MCU, separate predictors and DC tables) plus
# per-component AC scans; Y follows jpeg_qc (raster block order), chroma
# follows jpeg_qc_chroma on the same block counter (the row-119 4:4:4
# convention), so the stored color expectations replay unchanged.


def jpeg_bytes_progressive_color(seed, w, h):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    Q = [1 + (z % 5) for z in range(64)]
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}
    dc2_codes = {sym: (i, 5) for i, sym in enumerate(DC_SYMS)}
    ac2_codes = {sym: (i, 8) for i, sym in enumerate(AC_SYMS)}
    comps = []  # per component: list of 64-coef blocks
    comps.append([[jpeg_qc(seed, b, z, False) for z in range(64)]
                  for b in range(bw * bh)])
    for comp in (1, 2):
        comps.append([[jpeg_qc_chroma(seed, comp, b, z) for z in range(64)]
                      for b in range(bw * bh)])

    acc = [0, 0]
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)
                acc[0] = acc[1] = 0

    def put_code(codes, sym):
        code, ln = codes[sym]
        put(code, ln)

    def flush_scan():
        if acc[1]:
            pad = 8 - acc[1]
            fin = (acc[0] << pad) | ((1 << pad) - 1)
            out.append(fin)
            if fin == 0xFF:
                out.append(0)
            acc[0] = acc[1] = 0
        scan = bytes(out)
        out.clear()
        return scan

    def dc_first_interleaved(al):
        preds = [0, 0, 0]
        for b in range(bw * bh):
            for c in range(3):
                v = comps[c][b][0] >> al
                diff = v - preds[c]
                preds[c] = v
                s = abs(diff).bit_length()
                put_code(dc_codes if c == 0 else dc2_codes, s)
                if s:
                    put(diff if diff > 0 else diff + (1 << s) - 1, s)
        return flush_scan()

    def dc_refine_interleaved(al):
        for b in range(bw * bh):
            for c in range(3):
                put((comps[c][b][0] >> al) & 1, 1)
        return flush_scan()

    def ac_first_c(c, ss, se, al):
        codes = ac_codes if c == 0 else ac2_codes
        for blk in comps[c]:
            vals = []
            for k in range(ss, se + 1):
                a = abs(blk[k]) >> al
                vals.append(a if blk[k] >= 0 else -a)
            last = len(vals) - 1
            while last >= 0 and vals[last] == 0:
                last -= 1
            k = 0
            while k <= last:
                run = 0
                while vals[k] == 0:
                    run += 1
                    k += 1
                while run >= 16:
                    put_code(codes, 0xF0)
                    run -= 16
                v = vals[k]
                s = abs(v).bit_length()
                put_code(codes, (run << 4) | s)
                put(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
            if last < len(vals) - 1:
                put_code(codes, 0x00)
        return flush_scan()

    def ac_refine_c(c, ss, se, al):
        codes = ac_codes if c == 0 else ac2_codes
        for blk in comps[c]:
            eob = ss - 1
            for k in range(ss, se + 1):
                if (abs(blk[k]) >> al) == 1:
                    eob = k
            r = 0
            br = []
            for k in range(ss, se + 1):
                temp = abs(blk[k]) >> al
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    put_code(codes, 0xF0)
                    r -= 16
                    for b in br:
                        put(b, 1)
                    br = []
                if temp > 1:
                    br.append(temp & 1)
                    continue
                put_code(codes, (r << 4) | 1)
                put(1 if blk[k] > 0 else 0, 1)
                for b in br:
                    put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                put_code(codes, 0x00)
                for b in br:
                    put(b, 1)
        return flush_scan()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(comps_sel, ss, se, ah, al):
        body = bytes([len(comps_sel)])
        for cid, sel in comps_sel:
            body += bytes([cid, sel])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)
    bits_dc2 = [0] * 16
    bits_dc2[4] = len(DC_SYMS)
    bits_ac2 = [0] * 16
    bits_ac2[7] = len(AC_SYMS)
    return (b"\xFF\xD8"
            + seg(0xDB, bytes([0x00]) + bytes(Q) + bytes([0x01]) + bytes(QC))
            + seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                  + bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + seg(0xC4, bytes([0x01]) + bytes(bits_dc2) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x11]) + bytes(bits_ac2) + bytes(AC_SYMS))
            + sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
            + dc_first_interleaved(1)
            + sos([(1, 0x00)], 1, 63, 0, 1) + ac_first_c(0, 1, 63, 1)
            + sos([(2, 0x11)], 1, 63, 0, 1) + ac_first_c(1, 1, 63, 1)
            + sos([(3, 0x11)], 1, 63, 0, 1) + ac_first_c(2, 1, 63, 1)
            + sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0)
            + dc_refine_interleaved(0)
            + sos([(1, 0x00)], 1, 63, 1, 0) + ac_refine_c(0, 1, 63, 0)
            + sos([(2, 0x11)], 1, 63, 1, 0) + ac_refine_c(1, 1, 63, 0)
            + sos([(3, 0x11)], 1, 63, 1, 0) + ac_refine_c(2, 1, 63, 0)
            + b"\xFF\xD9")


# rows 129/130/132: SAMPLED progressive (round 16 — the real-web
# majority class). Same coefficient formulas as the baseline color rows
# (jpeg_qc on the MCU-major Y block counter, jpeg_qc_chroma per MCU), so
# a progressive re-encode of a baseline row is PIXEL-IDENTICAL across
# layouts. Interleaved DC scans walk the padded MCU grid — right-edge
# PADDING blocks (non-aligned width) carry the formula's coefficients
# and advance the DC predictor exactly as the spec requires, and the
# decoder must entropy-walk then DISCARD them; AC scans walk each
# component's REAL block raster (ISO 10918-1 A.2). Scan script = the
# grayscale progression's six modes, color-interleaved DC.


def jpeg_bytes_progressive_color_sub(seed, w, h, yh, yv, perturb=False,
                                     restart=0):
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}
    dc2_codes = {sym: (i, 5) for i, sym in enumerate(DC_SYMS)}
    ac2_codes = {sym: (i, 8) for i, sym in enumerate(AC_SYMS)}
    mcusX = (w + 8 * yh - 1) // (8 * yh)
    mcusY = (h + 8 * yv - 1) // (8 * yv)
    cw, ch2 = (w + yh - 1) // yh, (h + yv - 1) // yv

    def y_coef(row, col):
        b = (((row // yv) * mcusX + col // yh) * (yh * yv)
             + (row % yv) * yh + (col % yh))
        return [jpeg_qc(seed, b, z, perturb) for z in range(64)]

    def c_coef(comp, row, col):
        m = row * mcusX + col
        return [jpeg_qc_chroma(seed, comp, m, z) for z in range(64)]

    # real-raster block lists for the non-interleaved AC scans
    comps_real = [
        [y_coef(r, c) for r in range((h + 7) // 8)
         for c in range((w + 7) // 8)],
        [c_coef(1, r, c) for r in range((ch2 + 7) // 8)
         for c in range((cw + 7) // 8)],
        [c_coef(2, r, c) for r in range((ch2 + 7) // 8)
         for c in range((cw + 7) // 8)],
    ]

    acc = [0, 0]
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)
                acc[0] = acc[1] = 0

    def put_code(codes, sym):
        code, ln = codes[sym]
        put(code, ln)

    def flush_scan():
        if acc[1]:
            pad = 8 - acc[1]
            fin = (acc[0] << pad) | ((1 << pad) - 1)
            out.append(fin)
            if fin == 0xFF:
                out.append(0)
            acc[0] = acc[1] = 0
        scan = bytes(out)
        out.clear()
        return scan

    rst = [0]

    def align_rst():
        # byte-align (1-padding, stuffed when it lands on 0xFF), then a
        # raw RSTn marker — markers are never byte-stuffed
        if acc[1]:
            pad = 8 - acc[1]
            fin = (acc[0] << pad) | ((1 << pad) - 1)
            out.append(fin)
            if fin == 0xFF:
                out.append(0)
            acc[0] = acc[1] = 0
        out.append(0xFF)
        out.append(0xD0 + (rst[0] & 7))
        rst[0] += 1

    def mcu_units(my, mx):
        """(comp, coefs) of ONE MCU in interleaved stream order —
        right/bottom padding blocks included."""
        for v in range(yv):
            for hh in range(yh):
                yield 0, y_coef(my * yv + v, mx * yh + hh)
        yield 1, c_coef(1, my, mx)
        yield 2, c_coef(2, my, mx)

    def dc_first_interleaved(al):
        rst[0] = 0
        preds = [0, 0, 0]
        for m in range(mcusY * mcusX):
            if restart and m > 0 and m % restart == 0:
                align_rst()
                preds = [0, 0, 0]
            for c, coefs in mcu_units(m // mcusX, m % mcusX):
                v = coefs[0] >> al
                diff = v - preds[c]
                preds[c] = v
                s = abs(diff).bit_length()
                put_code(dc_codes if c == 0 else dc2_codes, s)
                if s:
                    put(diff if diff > 0 else diff + (1 << s) - 1, s)
        return flush_scan()

    def dc_refine_interleaved(al):
        rst[0] = 0
        for m in range(mcusY * mcusX):
            if restart and m > 0 and m % restart == 0:
                align_rst()
            for _, coefs in mcu_units(m // mcusX, m % mcusX):
                put((coefs[0] >> al) & 1, 1)
        return flush_scan()

    def ac_first_blocks(c, ss, se, al):
        codes = ac_codes if c == 0 else ac2_codes
        rst[0] = 0
        for bi, blk in enumerate(comps_real[c]):
            if restart and bi > 0 and bi % restart == 0:
                align_rst()  # non-interleaved: every `restart` data units
            vals = []
            for k in range(ss, se + 1):
                a = abs(blk[k]) >> al
                vals.append(a if blk[k] >= 0 else -a)
            last = len(vals) - 1
            while last >= 0 and vals[last] == 0:
                last -= 1
            k = 0
            while k <= last:
                run = 0
                while vals[k] == 0:
                    run += 1
                    k += 1
                while run >= 16:
                    put_code(codes, 0xF0)
                    run -= 16
                v = vals[k]
                s = abs(v).bit_length()
                put_code(codes, (run << 4) | s)
                put(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
            if last < len(vals) - 1:
                put_code(codes, 0x00)
        return flush_scan()

    def ac_refine_blocks(c, ss, se, al):
        codes = ac_codes if c == 0 else ac2_codes
        rst[0] = 0
        for bi, blk in enumerate(comps_real[c]):
            if restart and bi > 0 and bi % restart == 0:
                align_rst()
            eob = ss - 1
            for k in range(ss, se + 1):
                if (abs(blk[k]) >> al) == 1:
                    eob = k
            r = 0
            br = []
            for k in range(ss, se + 1):
                temp = abs(blk[k]) >> al
                if temp == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    put_code(codes, 0xF0)
                    r -= 16
                    for b in br:
                        put(b, 1)
                    br = []
                if temp > 1:
                    br.append(temp & 1)
                    continue
                put_code(codes, (r << 4) | 1)
                put(1 if blk[k] > 0 else 0, 1)
                for b in br:
                    put(b, 1)
                br = []
                r = 0
            if r > 0 or br:
                put_code(codes, 0x00)
                for b in br:
                    put(b, 1)
        return flush_scan()

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(comps_sel, ss, se, ah, al):
        body = bytes([len(comps_sel)])
        for cid, sel in comps_sel:
            body += bytes([cid, sel])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)
    bits_dc2 = [0] * 16
    bits_dc2[4] = len(DC_SYMS)
    bits_ac2 = [0] * 16
    bits_ac2[7] = len(AC_SYMS)
    yhv = (yh << 4) | yv
    dri = seg(0xDD, restart.to_bytes(2, "big")) if restart else b""
    return (b"\xFF\xD8"
            + seg(0xDB, bytes([0x00]) + bytes([1 + (z % 5) for z in range(64)])
                  + bytes([0x01]) + bytes(QC))
            + seg(0xC2, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                  + bytes([3, 1, yhv, 0, 2, 0x11, 1, 3, 0x11, 1]))
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + seg(0xC4, bytes([0x01]) + bytes(bits_dc2) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x11]) + bytes(bits_ac2) + bytes(AC_SYMS))
            + dri
            + sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 0, 1)
            + dc_first_interleaved(1)
            + sos([(1, 0x00)], 1, 63, 0, 1) + ac_first_blocks(0, 1, 63, 1)
            + sos([(2, 0x11)], 1, 63, 0, 1) + ac_first_blocks(1, 1, 63, 1)
            + sos([(3, 0x11)], 1, 63, 0, 1) + ac_first_blocks(2, 1, 63, 1)
            + sos([(1, 0x00), (2, 0x11), (3, 0x11)], 0, 0, 1, 0)
            + dc_refine_interleaved(0)
            + sos([(1, 0x00)], 1, 63, 1, 0) + ac_refine_blocks(0, 1, 63, 0)
            + sos([(2, 0x11)], 1, 63, 1, 0) + ac_refine_blocks(1, 1, 63, 0)
            + sos([(3, 0x11)], 1, 63, 1, 0) + ac_refine_blocks(2, 1, 63, 0)
            + b"\xFF\xD9")


PROG_JPEG_ROWS = [
    (124, 124, 24, 16, False),  # unrelated progressive image
    (125, 105, 24, 16, False),  # progressive RE-ENCODE of 105: exact pixels
    (126, 105, 24, 16, True),   # progressive near-dup (the 107 DC rule)
    (127, 127, 20, 12, False),  # non-multiple-of-8 dims (crop path)
]
for i, seed, w, h, perturb in PROG_JPEG_ROWS:
    payload = jpeg_bytes_progressive(seed, w, h, perturb)
    ids.append(i)
    mimes.append("image/jpeg")
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# row 128: the color 4:4:4 progressive (interleaved DC scans)
_p128 = jpeg_bytes_progressive_color(128, 24, 16)
ids.append(128)
mimes.append("image/jpeg")
payloads.append(_p128)
widths.append(24)
heights.append(16)
n_bytes.append(len(_p128))
checksums.append(sum(_p128) % 9973)
n_frames.append(None)
fpss.append(None)
sample_rates.append(None)
channelss.append(None)
bitss.append(None)
n_sampless.append(None)

# rows 129-132: sampled progressive + 4:2:2 (round 16).
#   129  progressive 4:2:0 RE-ENCODE of row 116 — exact cross-layout
#        duplicate of the baseline 4:2:0 family (116/117)
#   130  unrelated progressive 4:2:0 at NON-MCU-ALIGNED width (w=24,
#        MCU grid 2x1: one right-edge padding column of Y blocks in the
#        interleaved DC scans)
#   131  baseline 4:2:2 (luma 2x1)
#   132  progressive 4:2:2 re-encode of 131 — cross-layout duplicate
SAMP_JPEG_ROWS = [
    # (id, seed, w, h, yh, yv, progressive, restart)
    (129, 116, 32, 16, 2, 2, True, 0),
    (130, 130, 24, 16, 2, 2, True, 0),
    (131, 131, 32, 16, 2, 1, False, 0),
    (132, 131, 32, 16, 2, 1, True, 0),
    # 133/134: RESTART MARKERS (r16) — the resync machinery every long
    # real scan carries. 133 is a baseline grayscale re-encode of row
    # 105 with DRI=3 (RSTn every 3 MCUs, DC predictor resets); 134 a
    # progressive 4:2:0 re-encode of row 116 with DRI=2 (restarts in
    # EVERY scan of the progression: interleaved DC counts MCUs,
    # non-interleaved AC counts data units). Both must land on their
    # twin's exact pixels — the markers are pure framing.
    (134, 116, 32, 16, 2, 2, True, 2),
]
for i, seed, w, h, yh, yv, prog, rsti in SAMP_JPEG_ROWS:
    if prog:
        payload = jpeg_bytes_progressive_color_sub(seed, w, h, yh, yv,
                                                   restart=rsti)
    else:
        payload = jpeg_bytes_color(seed, w, h, True, samp=(yh, yv))
    ids.append(i)
    mimes.append("image/jpeg")
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(payload) % 9973)
    n_frames.append(None)
    fpss.append(None)
    sample_rates.append(None)
    channelss.append(None)
    bitss.append(None)
    n_sampless.append(None)

# row 133: baseline grayscale re-encode of row 105 with DRI=3 (see the
# 133/134 comment above)
GRAY_RESTART_ROWS = [(133, 105, 24, 16, False)]
_p133 = jpeg_bytes_seeded(105, 24, 16, False, restart=3)
assert b"\xff\xd0" in _p133 or b"\xff\xd1" in _p133, "no RSTn emitted"
ids.append(133)
mimes.append("image/jpeg")
payloads.append(_p133)
widths.append(24)
heights.append(16)
n_bytes.append(len(_p133))
checksums.append(sum(_p133) % 9973)
n_frames.append(None)
fpss.append(None)
sample_rates.append(None)
channelss.append(None)
bitss.append(None)
n_sampless.append(None)

# ---- round 14: pinned CHROMA-reconstruction expectations for the jpeg
# rows — an INDEPENDENT Python implementation of the engine's pinned
# integer pipeline (IDCT -> nearest upsample -> 16-bit fixed-point
# YCbCr->RGB -> per-channel 8x8 above-mean hash), stored as exp_*
# columns (the q33/q130 decode-vs-stored convention): the Scala byte
# walk and this formula replay must agree bit-for-bit.

IDCT_K = [362, 362, 362, 362, 362, 362, 362, 362,
          502, 426, 284, 100, -100, -284, -426, -502,
          473, 196, -196, -473, -473, -196, 196, 473,
          426, -100, -502, -284, 284, 502, 100, -426,
          362, -362, -362, 362, 362, -362, -362, 362,
          284, -502, 100, 426, -426, -100, 502, -284,
          196, -473, 473, -196, -196, 473, -473, 196,
          100, -284, 426, -502, 502, -426, 284, -100]
ZZU = [0, 1, 0, 0, 1, 2, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 4, 3, 2, 1, 0, 0,
       1, 2, 3, 4, 5, 6, 7, 6, 5, 4, 3, 2, 1, 0, 1, 2, 3, 4, 5, 6, 7, 7,
       6, 5, 4, 3, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 5, 6, 7, 7, 6, 7]
ZZV = [0, 0, 1, 2, 1, 0, 0, 1, 2, 3, 4, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 6,
       5, 4, 3, 2, 1, 0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 2, 1, 2,
       3, 4, 5, 6, 7, 7, 6, 5, 4, 3, 4, 5, 6, 7, 7, 6, 5, 6, 7, 7]
QY64 = [1 + (z % 5) for z in range(64)]
QC64 = [2 + (z % 4) for z in range(64)]


def idct_pixel(coefs, Q, bx, by):
    ssum = 0
    for z in range(64):
        c = coefs[z]
        if c:
            ssum += c * Q[z] * IDCT_K[ZZU[z] * 8 + bx] * IDCT_K[ZZV[z] * 8 + by]
    pix = ((ssum + (1 << 19)) >> 20) + 128
    return 0 if pix < 0 else 255 if pix > 255 else pix


def y_plane_s(seed, w, h, yh, yv, perturb):
    """Luma expectation for luma sampling (yh, yv): the MCU-major global
    Y-block counter, yh*yv sub-blocks per MCU in raster order."""
    mcu_w = (w + 8 * yh - 1) // (8 * yh)
    out = [[0] * w for _ in range(h)]
    for py in range(h):
        for px in range(w):
            b = (((py // (8 * yv)) * mcu_w + px // (8 * yh)) * (yh * yv)
                 + ((py % (8 * yv)) // 8) * yh + (px % (8 * yh)) // 8)
            coefs = [jpeg_qc(seed, b, z, perturb) for z in range(64)]
            out[py][px] = idct_pixel(coefs, QY64, px % 8, py % 8)
    return out


def y_plane(seed, w, h, sub, perturb):
    return y_plane_s(seed, w, h, 2 if sub else 1, 2 if sub else 1, perturb)


def chroma_plane_s(seed, comp, w, h, yh, yv):
    """Chroma expectation (always 1x1): one block per MCU, raster."""
    cw, ch2 = (w + yh - 1) // yh, (h + yv - 1) // yv
    mcu_w = (w + 8 * yh - 1) // (8 * yh)
    out = [[0] * cw for _ in range(ch2)]
    for cy in range(ch2):
        for cx in range(cw):
            m = (cy // 8) * mcu_w + (cx // 8)
            coefs = [jpeg_qc_chroma(seed, comp, m, z) for z in range(64)]
            out[cy][cx] = idct_pixel(coefs, QC64, cx % 8, cy % 8)
    return out


def chroma_plane(seed, comp, w, h, sub):
    s = 2 if sub else 1
    return chroma_plane_s(seed, comp, w, h, s, s)


def clamp8(v):
    return 0 if v < 0 else 255 if v > 255 else v


def rgb_planes(yP, cbP, crP, w, h, sx, sy=None):
    if sy is None:
        sy = sx
    r = [[0] * w for _ in range(h)]
    g = [[0] * w for _ in range(h)]
    b = [[0] * w for _ in range(h)]
    for yy in range(h):
        for x in range(w):
            Y = yP[yy][x]
            if cbP is None:
                r[yy][x] = g[yy][x] = b[yy][x] = Y
            else:
                cb = cbP[yy // sy][x // sx] - 128
                cr = crP[yy // sy][x // sx] - 128
                r[yy][x] = clamp8(Y + ((91881 * cr + 32768) >> 16))
                g[yy][x] = clamp8(Y - ((22554 * cb + 46802 * cr + 32768) >> 16))
                b[yy][x] = clamp8(Y + ((116130 * cb + 32768) >> 16))
    return r, g, b


def ahash64(plane, w, h):
    smp = [plane[((k // 8) * h) // 8][((k % 8) * w) // 8] for k in range(64)]
    tot = sum(smp)
    hi = sum(1 << (k - 32) for k in range(32, 64) if 64 * smp[k] > tot)
    lo = sum(1 << k for k in range(32) if 64 * smp[k] > tot)
    return hi, lo


exp_cols = {}
for i, seed, w, h, perturb in JPEG_ROWS + PROG_JPEG_ROWS + GRAY_RESTART_ROWS:
    yp = y_plane(seed, w, h, False, perturb)
    rp, gp, bp = rgb_planes(yp, None, None, w, h, 1)
    exp_cols[i] = (sum(map(sum, rp)), sum(map(sum, gp)), sum(map(sum, bp)),
                   *ahash64(rp, w, h), *ahash64(bp, w, h))

# the progressive re-encode must be PIXEL-identical to its baseline
# twin (125 vs 105, 126 vs 107) — same coefficients, different container
assert exp_cols[125] == exp_cols[105], "progressive re-encode diverged"
assert exp_cols[126] == exp_cols[107], "perturbed progressive diverged"

# row 128: color 4:4:4 progressive — the 4:4:4 expectation machinery
# (row 119's path) over the progressive serialization's coefficients
_yp128 = y_plane(128, 24, 16, False, False)
_cb128 = chroma_plane(128, 1, 24, 16, False)
_cr128 = chroma_plane(128, 2, 24, 16, False)
_r128, _g128, _b128 = rgb_planes(_yp128, _cb128, _cr128, 24, 16, 1)
exp_cols[128] = (sum(map(sum, _r128)), sum(map(sum, _g128)),
                 sum(map(sum, _b128)),
                 *ahash64(_r128, 24, 16), *ahash64(_b128, 24, 16))
for i, seed, w, h, sub, perturb, cswap in COLOR_JPEG_ROWS:
    yp = y_plane(seed, w, h, sub, perturb)
    cb_comp, cr_comp = (2, 1) if cswap else (1, 2)
    cbp = chroma_plane(seed, cb_comp, w, h, sub)
    crp = chroma_plane(seed, cr_comp, w, h, sub)
    rp, gp, bp = rgb_planes(yp, cbp, crp, w, h, 2 if sub else 1)
    exp_cols[i] = (sum(map(sum, rp)), sum(map(sum, gp)), sum(map(sum, bp)),
                   *ahash64(rp, w, h), *ahash64(bp, w, h))

# rows 129-134: the sampled progressive / 4:2:2 / restart family — same
# formula machinery at (yh, yv)
for i, seed, w, h, yh, yv, prog, rsti in SAMP_JPEG_ROWS:
    yp = y_plane_s(seed, w, h, yh, yv, False)
    cbp = chroma_plane_s(seed, 1, w, h, yh, yv)
    crp = chroma_plane_s(seed, 2, w, h, yh, yv)
    rp, gp, bp = rgb_planes(yp, cbp, crp, w, h, yh, yv)
    exp_cols[i] = (sum(map(sum, rp)), sum(map(sum, gp)), sum(map(sum, bp)),
                   *ahash64(rp, w, h), *ahash64(bp, w, h))
# the cross-layout duplicates must be PIXEL-identical to their baseline
# twins: 129 == 116 (4:2:0), 132 == 131 (4:2:2), and the restart
# re-encodes 133 == 105 (baseline, DRI=3) / 134 == 116 (progressive,
# DRI=2) — markers are pure framing
assert exp_cols[129] == exp_cols[116], "progressive 4:2:0 re-encode diverged"
assert exp_cols[132] == exp_cols[131], "progressive 4:2:2 re-encode diverged"
assert exp_cols[133] == exp_cols[105], "restart baseline re-encode diverged"
assert exp_cols[134] == exp_cols[116], "restart progressive re-encode diverged"

# engineered-exactness assertions for the hue-shift family: identical
# luma, different color signature; the perturbed row stays color-close
_y120 = y_plane(120, 32, 16, True, False)
assert _y120 == y_plane(120, 32, 16, True, False)
assert exp_cols[121][3:] != exp_cols[120][3:], "hue shift invisible to color hash"
_d = sum(bin(a ^ b).count("1")
         for a, b in zip(exp_cols[120][3:], exp_cols[121][3:]))
assert _d > 6, f"hue-shift color hamming too small: {_d}"
_d2 = sum(bin(a ^ b).count("1")
          for a, b in zip(exp_cols[120][3:], exp_cols[122][3:]))
assert _d2 <= 6, f"true near-dup color hamming too large: {_d2}"

# ---- row 135 (r17): EXIF-ORIENTED RE-SAVE of the 105 image — the
# real-web defeat of a stored-raster perceptual hash (r16 verdict #7).
# The STORED raster is rot90-CCW of 105's (16x24), tagged EXIF
# Orientation=6 ("rotate 90 CW to display"), so the DISPLAYED raster is
# bit-identical to 105's 24x16 — the engine must rotate-normalize at
# decode and hash the pair identical. Construction is EXACT in
# coefficient space: rot90CCW = transpose (coef (u,v) -> (v,u), Q table
# transposed into the file's own DQT) then vertical flip (factor (-1)^v,
# intra-block), block grid permuted to match — exact because the pinned
# IDCT is a direct 2D sum with one final rounding, so it commutes with
# the dihedral maps (asserted below against the formula pixels).

ZZ_OF = {(ZZU[z], ZZV[z]): z for z in range(64)}


def exif_app1(orientation):
    tiff = (b"II" + (42).to_bytes(2, "little") + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (0x0112).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little")
            + orientation.to_bytes(2, "little") + b"\x00\x00"
            + (0).to_bytes(4, "little"))
    body = b"Exif\x00\x00" + tiff
    return bytes([0xFF, 0xE1]) + (len(body) + 2).to_bytes(2, "big") + body


def jpeg_bytes_blocks(blocks, w, h, Q, pre_segs=b""):
    """Baseline grayscale writer over EXPLICIT zigzag coefficient
    blocks (raster order) with the file's own Q table — the
    jpeg_bytes_seeded entropy writer, payload-parameterized."""
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}
    acc = [0, 0]
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)
                acc[0] = acc[1] = 0

    pred = 0
    for coefs in blocks:
        diff = coefs[0] - pred
        pred = coefs[0]
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        put(code, ln)
        if s:
            put(diff if diff > 0 else diff + (1 << s) - 1, s)
        last = 63
        while last > 0 and coefs[last] == 0:
            last -= 1
        k = 1
        while k <= last:
            run = 0
            while coefs[k] == 0:
                run += 1
                k += 1
            while run >= 16:
                code, ln = ac_codes[0xF0]
                put(code, ln)
                run -= 16
            v = coefs[k]
            s = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | s]
            put(code, ln)
            put(v if v > 0 else v + (1 << s) - 1, s)
            k += 1
        if last < 63:
            code, ln = ac_codes[0x00]
            put(code, ln)
    if acc[1]:
        pad = 8 - acc[1]
        fin = (acc[0] << pad) | ((1 << pad) - 1)
        out.append(fin)
        if fin == 0xFF:
            out.append(0)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)
    return (b"\xFF\xD8" + pre_segs
            + seg(0xDB, bytes([0x00]) + bytes(Q))
            + seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
                  + bytes([1, 1, 0x11, 0]))
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
            + bytes(out) + b"\xFF\xD9")


def _a105_block(r, c):
    bwA = 3  # 24x16 -> 3x2 blocks
    return [jpeg_qc(105, r * bwA + c, z, False) for z in range(64)]


def _rot90ccw_blocks():
    """Stored grid of the rot90-CCW raster: B(rowB, colB)[zig(u, v)] =
    (-1)^v * A(colB, bwA-1-rowB)[zig(v, u)] — transpose then v-flip."""
    bwA, bhA = 3, 2
    blocks = []
    for rowB in range(bwA):          # B grid: 2 wide x 3 tall
        for colB in range(bhA):
            a = _a105_block(colB, bwA - 1 - rowB)
            b = [0] * 64
            for z in range(64):
                u, v = ZZU[z], ZZV[z]
                b[z] = (-1 if v % 2 else 1) * a[ZZ_OF[(v, u)]]
            blocks.append(b)
    return blocks


_q135 = [QY64[ZZ_OF[(ZZV[z], ZZU[z])]] for z in range(64)]  # Q transposed
_p135 = jpeg_bytes_blocks(_rot90ccw_blocks(), 16, 24, _q135,
                          pre_segs=exif_app1(6))

# exactness assert: idct the STORED raster, apply the o=6 display map
# (displayed(x, y) = stored(y, hB-1-x)), compare to 105's formula pixels
_stored135 = [[0] * 16 for _ in range(24)]
_b135 = _rot90ccw_blocks()
for _py in range(24):
    for _px in range(16):
        _blk = _b135[(_py // 8) * 2 + (_px // 8)]
        _stored135[_py][_px] = idct_pixel(_blk, _q135, _px % 8, _py % 8)
_disp135 = [[_stored135[23 - x][y] for x in range(24)] for y in range(16)]
assert _disp135 == y_plane(105, 24, 16, False, False), \
    "EXIF-oriented re-save's displayed raster diverged from its twin"

ids.append(135)
mimes.append("image/jpeg")
payloads.append(_p135)
widths.append(24)   # DISPLAY dims: the EXIF-aware dims every consumer
heights.append(16)  # (meta, sampling grid, color sig) agrees on
n_bytes.append(len(_p135))
checksums.append(sum(_p135) % 9973)
n_frames.append(None)
fpss.append(None)
sample_rates.append(None)
channelss.append(None)
bitss.append(None)
n_sampless.append(None)
exp_cols[135] = exp_cols[105]  # displayed raster is 105's, bit for bit

# ---- row 136 (r17): 4-component Adobe CMYK re-save of the 108 image
# (r16 verdict #8) — the print-pipeline re-export that defeats a
# 3-component-only decoder. Baseline, 1x1 sampling on all four
# components, APP14 Adobe transform=0 (inverted CMYK, the Adobe writer
# convention). ENGINEERED so the pinned ink reconstruction lands exactly
# on 108's luma raster: C/M/Y carry 108's coefficient content (s0 = s1 =
# s2 pixel-wise -> r0 = g0 = b0), K is a DC-only constant-255 plane
# (DC 1013: ((1013*1*362*362 + 2^19) >> 20) + 128 clamps to 255), so
# R = G = B = s0*255//255 = s0 and luma (299R+587G+114B)//1000 = s0 —
# the cross-colorspace exact duplicate the near-dup screens must see.


def jpeg_bytes_cmyk(seed, w, h):
    bw, bh = (w + 7) // 8, (h + 7) // 8
    dc_codes = {sym: (i, 4) for i, sym in enumerate(DC_SYMS)}
    ac_codes = {sym: (i, 7) for i, sym in enumerate(AC_SYMS)}
    acc = [0, 0]
    out = bytearray()

    def put(val, size):
        for k in range(size - 1, -1, -1):
            acc[0] = (acc[0] << 1) | ((val >> k) & 1)
            acc[1] += 1
            if acc[1] == 8:
                out.append(acc[0])
                if acc[0] == 0xFF:
                    out.append(0)
                acc[0] = acc[1] = 0

    kblock = [1013] + [0] * 63
    preds = [0, 0, 0, 0]
    for b in range(bw * bh):
        content = [jpeg_qc(seed, b, z, False) for z in range(64)]
        for ci in range(4):
            coefs = content if ci < 3 else kblock
            diff = coefs[0] - preds[ci]
            preds[ci] = coefs[0]
            s = abs(diff).bit_length()
            code, ln = dc_codes[s]
            put(code, ln)
            if s:
                put(diff if diff > 0 else diff + (1 << s) - 1, s)
            last = 63
            while last > 0 and coefs[last] == 0:
                last -= 1
            k = 1
            while k <= last:
                run = 0
                while coefs[k] == 0:
                    run += 1
                    k += 1
                while run >= 16:
                    code, ln = ac_codes[0xF0]
                    put(code, ln)
                    run -= 16
                v = coefs[k]
                s = abs(v).bit_length()
                code, ln = ac_codes[(run << 4) | s]
                put(code, ln)
                put(v if v > 0 else v + (1 << s) - 1, s)
                k += 1
            if last < 63:
                code, ln = ac_codes[0x00]
                put(code, ln)
    if acc[1]:
        pad = 8 - acc[1]
        fin = (acc[0] << pad) | ((1 << pad) - 1)
        out.append(fin)
        if fin == 0xFF:
            out.append(0)

    def seg(marker, body):
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    bits_dc = [0] * 16
    bits_dc[3] = len(DC_SYMS)
    bits_ac = [0] * 16
    bits_ac[6] = len(AC_SYMS)
    adobe = seg(0xEE, b"Adobe" + bytes([0, 101, 0, 0, 0, 0, 0]))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([4])
    for cid in range(1, 5):
        sof += bytes([cid, 0x11, 0])
    sos = bytes([4])
    for cid in range(1, 5):
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    return (b"\xFF\xD8" + adobe
            + seg(0xDB, bytes([0x00]) + bytes(QY64))
            + seg(0xC0, sof)
            + seg(0xC4, bytes([0x00]) + bytes(bits_dc) + bytes(DC_SYMS))
            + seg(0xC4, bytes([0x10]) + bytes(bits_ac) + bytes(AC_SYMS))
            + seg(0xDA, sos)
            + bytes(out) + b"\xFF\xD9")


_p136 = jpeg_bytes_cmyk(108, 24, 16)
# independent replay of the pinned ink transform: K plane is constant
# 255, so R = G = B = s0 and gray = s0 — exactly 108's formula raster
assert idct_pixel([1013] + [0] * 63, QY64, 3, 5) == 255
_s0 = y_plane(108, 24, 16, False, False)
assert all((299 * v + 587 * v + 114 * v) // 1000 == v for v in range(256))
_r136 = [[_s0[y][x] * 255 // 255 for x in range(24)] for y in range(16)]
assert _r136 == _s0

ids.append(136)
mimes.append("image/jpeg")
payloads.append(_p136)
widths.append(24)
heights.append(16)
n_bytes.append(len(_p136))
checksums.append(sum(_p136) % 9973)
n_frames.append(None)
fpss.append(None)
sample_rates.append(None)
channelss.append(None)
bitss.append(None)
n_sampless.append(None)
exp_cols[136] = exp_cols[108]  # R = G = B = the 108 luma raster exactly

exp_rsum = [exp_cols.get(i, (None,) * 7)[0] for i in ids]
exp_gsum = [exp_cols.get(i, (None,) * 7)[1] for i in ids]
exp_bsum = [exp_cols.get(i, (None,) * 7)[2] for i in ids]
exp_rhash_hi = [exp_cols.get(i, (None,) * 7)[3] for i in ids]
exp_rhash_lo = [exp_cols.get(i, (None,) * 7)[4] for i in ids]
exp_bhash_hi = [exp_cols.get(i, (None,) * 7)[5] for i in ids]
exp_bhash_lo = [exp_cols.get(i, (None,) * 7)[6] for i in ids]

# uspf is only appended in the AVI loops; reassemble aligned to ids
assert len(uspfs) == 13
_uspf_avi, _uspf_114 = uspfs[:12], uspfs[12]
uspfs = ([None] * 76 + _uspf_avi + [None] * (114 - 88) + [_uspf_114]
         + [None] * (len(ids) - 115))

table = pa.table({
    "media_id": pa.array(ids, pa.int64()),
    "mime": pa.array(mimes, pa.string()),
    "payload": pa.array(payloads, pa.binary()),
    "width": pa.array(widths, pa.int32()),
    "height": pa.array(heights, pa.int32()),
    "n_bytes": pa.array(n_bytes, pa.int64()),
    "checksum": pa.array(checksums, pa.int64()),
    "n_frames": pa.array(n_frames, pa.int32()),
    "fps": pa.array(fpss, pa.int32()),
    "uspf": pa.array(uspfs, pa.int64()),
    "sample_rate": pa.array(sample_rates, pa.int32()),
    "channels": pa.array(channelss, pa.int32()),
    "bits": pa.array(bitss, pa.int32()),
    "n_samples": pa.array(n_sampless, pa.int64()),
    "exp_rsum": pa.array(exp_rsum, pa.int64()),
    "exp_gsum": pa.array(exp_gsum, pa.int64()),
    "exp_bsum": pa.array(exp_bsum, pa.int64()),
    "exp_rhash_hi": pa.array(exp_rhash_hi, pa.int64()),
    "exp_rhash_lo": pa.array(exp_rhash_lo, pa.int64()),
    "exp_bhash_hi": pa.array(exp_bhash_hi, pa.int64()),
    "exp_bhash_lo": pa.array(exp_bhash_lo, pa.int64()),
})
pq.write_table(table, os.path.join(OUT, "media.parquet"))
print("wrote", os.path.join(OUT, "media.parquet"), table.num_rows, "rows")
