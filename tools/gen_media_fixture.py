#!/usr/bin/env python3
"""Deterministic multimodal fixture generator (dev tool; output is committed).

Produces fixtures/media.parquet: 60 rows of opaque binary payloads with typed
metadata, the shape a multimodal training-data pipeline stores images/audio in.

Payload layouts (parsed by graft.operators.Multimodal):
  image/video rows — our fake "codec":
    bytes 0-1  width,  big-endian u16
    bytes 2-3  height, big-endian u16
    video rows additionally:
      bytes 4-5  n_frames, big-endian u16
      byte  6    fps, u8
    remaining bytes  body: byte i = (media_id*31 + i*7) % 256,
    length = 16 + (id % 64)
  audio rows — REAL RIFF/WAVE containers (the fixture codec is retired for
  audio): "RIFF" + u32-LE riff size + "WAVE", a canonical 16-byte "fmt "
  chunk (PCM, channels, sample rate, byte rate, block align, bits), then a
  "data" chunk holding n_samples * block_align bytes of the same body
  formula. graft's wavMeta chunk-walk parses these actual container bytes.

The metadata columns (width/height/n_bytes/checksum, n_frames/fps for video,
sample_rate/channels/bits/n_samples for audio) are written REDUNDANTLY with
the headers so the engine's byte-level decode can be verified against an
independently-stored value by the DuckDB oracle (DuckDB cannot index into
BLOBs, so the oracle reads the metadata while Spark reads the bytes).

No randomness: every value is a fixed formula of media_id.
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
os.makedirs(OUT, exist_ok=True)

MIMES = ["image/png", "image/jpeg", "audio/wav", "video/mp4"]

ids, mimes, payloads, widths, heights = [], [], [], [], []
n_bytes, checksums, n_frames, fpss = [], [], [], []
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
        w, h, nf, fps = None, None, None, None
    else:
        w = 64 + (i * 17) % 512
        h = 48 + (i * 29) % 512
        body = bytes((i * 31 + j * 7) % 256 for j in range(16 + i % 64))
        header = w.to_bytes(2, "big") + h.to_bytes(2, "big")
        if mime.startswith("video/"):
            nf = 24 + (i * 13) % 200
            fps = (12, 24, 25, 30)[i % 4]
            header += nf.to_bytes(2, "big") + fps.to_bytes(1, "big")
        else:
            nf, fps = None, None
        payload = header + body
        sr, ch, bits, nsamp = None, None, None, None
    ids.append(i)
    mimes.append(mime)
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(body) % 9973)
    n_frames.append(nf)
    fpss.append(fps)
    sample_rates.append(sr)
    channelss.append(ch)
    bitss.append(bits)
    n_sampless.append(nsamp)

# ---- rows 60-75: REAL GIF and BMP containers (the fixture codec is
# retired for these two formats as well — complete valid files, parsed
# byte-level by graft's gifDims/bmpDims; metadata stays the independent
# verification channel). Checksum convention for real containers matches
# the engine's real-codec path: sum over the WHOLE payload, mod 9973.


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
    "sample_rate": pa.array(sample_rates, pa.int32()),
    "channels": pa.array(channelss, pa.int32()),
    "bits": pa.array(bitss, pa.int32()),
    "n_samples": pa.array(n_sampless, pa.int64()),
})
pq.write_table(table, os.path.join(OUT, "media.parquet"))
print("wrote", os.path.join(OUT, "media.parquet"), table.num_rows, "rows")
