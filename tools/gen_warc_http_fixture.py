#!/usr/bin/env python3
"""HTTP body-framing WARC fixture (dev tool; output is committed).

Raw (non-Common-Crawl) WARC captures routinely store HTTP bodies exactly
as the server sent them: Transfer-Encoding: chunked framing and/or
Content-Encoding: gzip/deflate compression. A walker that ignores both
decodes framing garbage and silently poisons extraction/dedup
(r14 verdict #2). PACK-AND-RECOVER with a stored expectation:

  warc_http_pages.parquet  (url, charset, text) — what Warc.decodedResponses
                           must RECOVER from the container bytes
  warc_http_shards.parquet one plain WARC/1.0 shard packing each framing:

  group A (0-4)   Transfer-Encoding: chunked, plain utf-8 text, several
                  chunks incl. a chunk extension (";ext=1") and trailers
  group B (5-9)   Content-Encoding: gzip (whole body one gzip stream)
  group C (10-14) chunked + gzip COMBINED (gzip bytes inside chunks —
                  the transfer encoding wraps the content encoding)
  group D (15-17) Content-Encoding: deflate, zlib-wrapped (RFC form)
  group E (18-20) Content-Encoding: deflate, RAW deflate (the historic
                  server bug browsers accept)
  group F (21-23) plain control rows (no special framing)
  group G (24-25) MALFORMED chunk framing (bad hex size line) — the
                  pinned fallback: body = raw block remainder, so the
                  stored expectation is the raw framed bytes as text
  group H (26)    truncated gzip body -> body None -> decodes to ''
  group I (27-28) chunked body carrying a legacy charset (windows-1252
                  declared in the header) — framing then charset decode
  group J (29-34) Content-Encoding: br / zstd / compress.
                  r17: the engine carries a FULL RFC 7932 decode.
                  Row 29 is a brotli stream in STORED mode (uncompressed
                  meta-blocks + a metadata block, the `brotli -q 0`
                  framing); row 33 a REAL quality-11 COMPRESSED stream
                  from the system encoder (prefix codes, context
                  modeling, static dictionary) — both must inflate to
                  their expected text. Row 32 (a compressed meta-block
                  truncated before its prefix-code preamble) and row 34
                  (a real q11 stream cut at half) are malformed -> None
                  body (decodes to ''), never garbage. zstd (30) /
                  compress (31) stay codec-less -> None (r15 advice):
                  never raw compressed bytes mojibaking through the
                  charset ladder into extraction/dedup

Everything deterministic: zlib with fixed level, gzip with mtime=0,
hand-framed brotli bits (LSB-first per the RFC).
"""
import gzip
import pathlib
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT_SHARDS = ROOT / "fixtures" / "warc_http_shards.parquet"
OUT_PAGES = ROOT / "fixtures" / "warc_http_pages.parquet"

WORDS = ["data", "model", "corpus", "quality", "stream", "index"]


def chunk(body, sizes, ext_on=None, trailers=False, bad_hex=False):
    """Chunked transfer encoding of `body` split at `sizes`."""
    out = bytearray()
    pos = 0
    for k, n in enumerate(sizes):
        part = body[pos:pos + n]
        pos += n
        size_line = "%x" % len(part)
        if bad_hex and k == 0:
            size_line = "zz"  # malformed: not hex
        if ext_on is not None and k == ext_on:
            size_line += ";ext=1"
        out += size_line.encode("ascii") + b"\r\n" + part + b"\r\n"
    out += b"0\r\n"
    if trailers:
        out += b"X-Trailer: t\r\n"
    out += b"\r\n"
    return bytes(out)


def gz(b):
    import io
    bio = io.BytesIO()
    with gzip.GzipFile(fileobj=bio, mode="wb", mtime=0) as g:
        g.write(b)
    return bio.getvalue()


class _BrotliBits:
    """LSB-first bit writer (RFC 7932 bit order)."""

    def __init__(self):
        self.bits = []

    def w(self, val, n):
        for k in range(n):
            self.bits.append((val >> k) & 1)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def raw(self, bs):
        self.align()
        for b in bs:
            self.w(b, 8)

    def out(self):
        self.align()
        by = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for k in range(8):
                v |= self.bits[i + k] << k
            by.append(v)
        return bytes(by)


def brotli_stored(data, meta_skip=b""):
    """A conforming brotli stream in STORED mode: WBITS=16 header, an
    optional metadata meta-block (skipped content), one uncompressed
    meta-block carrying `data`, and the empty last block — the framing
    `brotli -q 0` emits for incompressible payloads."""
    assert 1 <= len(data) <= (1 << 16)
    bw = _BrotliBits()
    bw.w(0, 1)                      # WBITS code '0' -> 16
    if meta_skip:
        assert len(meta_skip) <= 255
        bw.w(0, 1)                  # ISLAST = 0
        bw.w(3, 2)                  # MNIBBLES code 3 -> metadata block
        bw.w(0, 1)                  # reserved
        bw.w(1, 2)                  # MSKIPBYTES = 1
        bw.w(len(meta_skip) - 1, 8)  # MSKIPLEN - 1
        bw.raw(meta_skip)
    bw.w(0, 1)                      # ISLAST = 0
    bw.w(0, 2)                      # MNIBBLES code 0 -> 4 nibbles
    bw.w(len(data) - 1, 16)         # MLEN - 1
    bw.w(1, 1)                      # ISUNCOMPRESSED
    bw.raw(data)
    bw.w(1, 1)                      # ISLAST
    bw.w(1, 1)                      # ISLASTEMPTY
    return bw.out()


def brotli_real(data, quality, lgwin):
    """A REAL compressed brotli stream from the system encoder
    (libbrotlienc via ctypes) — prefix codes, context modeling and
    static-dictionary references the engine's full RFC 7932 decode
    (r17) must inflate bit-exactly."""
    import ctypes
    enc = ctypes.CDLL("libbrotlienc.so.1")
    enc.BrotliEncoderCompress.restype = ctypes.c_int
    enc.BrotliEncoderCompress.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
    out = ctypes.create_string_buffer(len(data) + 1024)
    n = ctypes.c_size_t(len(out))
    ok = enc.BrotliEncoderCompress(quality, lgwin, 0, len(data), data,
                                   ctypes.byref(n), out)
    assert ok == 1
    return out.raw[: n.value]


def brotli_compressed_stub():
    """A brotli stream whose first meta-block is COMPRESSED
    (ISUNCOMPRESSED=0) but truncates before a parseable prefix-code
    preamble — malformed: the decode must refuse (None body), never
    guess."""
    bw = _BrotliBits()
    bw.w(0, 1)                      # WBITS 16
    bw.w(0, 1)                      # ISLAST = 0
    bw.w(0, 2)                      # 4 nibbles
    bw.w(9, 16)                     # MLEN = 10
    bw.w(0, 1)                      # ISUNCOMPRESSED = 0 -> compressed
    bw.raw(b"\xde\xad\xbe\xef")     # opaque prefix-code bits (never read)
    return bw.out()


def record(headers, block):
    h = headers + [("Content-Length", str(len(block)))]
    head = "WARC/1.0\r\n" + "".join("%s: %s\r\n" % (k, v) for k, v in h) + "\r\n"
    return head.encode("ascii") + block + b"\r\n\r\n"


def http(lines, body):
    return ("\r\n".join(["HTTP/1.1 200 OK"] + lines) + "\r\n\r\n").encode("ascii") + body


pages = []  # (i, http_headers, wire_body, expected_charset, expected_text)
for i in range(35):
    w = WORDS[i % 6]
    text = "page p%d body of %s and %s — framed" % (i, w, WORDS[(i + 2) % 6])
    raw = text.encode("utf-8")
    if i < 5:  # A: chunked
        sizes = [7, 11, len(raw) - 18]
        wire = chunk(raw, sizes, ext_on=(1 if i % 2 == 0 else None),
                     trailers=(i % 2 == 1))
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Transfer-Encoding: chunked"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 10:  # B: gzip
        wire = gz(raw)
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: gzip" if i % 2 == 0 else "Content-Encoding: x-gzip"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 15:  # C: chunked THEN gzip (transfer wraps content)
        gzb = gz(raw)
        wire = chunk(gzb, [9, len(gzb) - 9])
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Transfer-Encoding: chunked", "Content-Encoding: gzip"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 18:  # D: zlib-wrapped deflate
        wire = zlib.compress(raw, 6)
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: deflate"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 21:  # E: raw deflate
        c = zlib.compressobj(6, zlib.DEFLATED, -15)
        wire = c.compress(raw) + c.flush()
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: deflate"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 24:  # F: plain
        wire = raw
        hdr = ["Content-Type: text/html; charset=utf-8"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 26:  # G: malformed chunk framing -> raw remainder fallback
        wire = chunk(raw, [7, len(raw) - 7], bad_hex=True)
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Transfer-Encoding: chunked"]
        expected = wire.decode("utf-8")  # the raw framed bytes as text
        pages.append((i, hdr, wire, "utf-8", expected))
    elif i < 27:  # H: truncated gzip -> body None -> ''
        wire = gz(raw)[:10]
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: gzip"]
        pages.append((i, hdr, wire, "utf-8", ""))
    elif i < 29:  # I: chunked + legacy charset
        t2 = "p%d café “%s” résumé" % (i, w)
        raw2 = t2.encode("cp1252")
        wire = chunk(raw2, [5, len(raw2) - 5])
        hdr = ["Content-Type: text/html; charset=windows-1252",
               "Transfer-Encoding: chunked"]
        pages.append((i, hdr, wire, "windows-1252", t2))
    elif i == 29:  # J: REAL brotli, stored mode (+ a metadata block)
        wire = brotli_stored(raw, meta_skip=b"graft-meta")
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: br"]
        pages.append((i, hdr, wire, "utf-8", text))
    elif i < 32:  # J: known-compressed coding without a codec -> None body
        coding = {30: "zstd", 31: "compress"}[i]
        # stand-in compressed bytes (the engine never decodes them; it
        # must refuse on the header alone) — zlib output is realistic
        # non-text garbage under a deterministic level
        wire = zlib.compress(raw, 6)
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: %s" % coding]
        pages.append((i, hdr, wire, "utf-8", ""))
    elif i == 32:  # J: br whose compressed meta-block truncates before a
        # parseable prefix-code preamble -> malformed -> None body
        # (refused, never guessed)
        wire = brotli_compressed_stub()
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: br"]
        pages.append((i, hdr, wire, "utf-8", ""))
    elif i == 33:  # J (r17): REAL quality-11 COMPRESSED brotli — the
        # form production servers actually send; the full RFC 7932
        # decode (prefix codes, context modeling, static dictionary)
        # must recover the text through the same HTTP framing path
        t3 = ("page p%d the information of the government and the "
              "different language through the public example "
              "because there would be time" % i)
        wire = brotli_real(t3.encode("utf-8"), quality=11, lgwin=22)
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: br"]
        pages.append((i, hdr, wire, "utf-8", t3))
    else:  # J (r17): a TRUNCATED real q11 brotli stream -> None body
        t4 = "page p%d body of %s — truncated" % (i, WORDS[i % 6])
        full = brotli_real((t4 * 20).encode("utf-8"), quality=11, lgwin=22)
        wire = full[: max(4, len(full) // 2)]
        hdr = ["Content-Type: text/html; charset=utf-8",
               "Content-Encoding: br"]
        pages.append((i, hdr, wire, "utf-8", ""))

buf = bytearray()
urls, labels, texts = [], [], []
for i, hdr, wire, label, expected in pages:
    url = "https://framed.example.net/page%d" % i
    buf += record(
        [("WARC-Type", "response"),
         ("WARC-Target-URI", url),
         ("WARC-Date", "2026-08-01T01:%02d:00Z" % (i % 60)),
         ("WARC-Record-ID", "<urn:graft:http-%d>" % i),
         ("Content-Type", "application/http; msgtype=response")],
        http(hdr, wire))
    urls.append(url)
    labels.append(label)
    texts.append(expected)

pq.write_table(pa.table({
    "shard_id": pa.array([0], pa.int64()),
    "gz": pa.array([False], pa.bool_()),
    "payload": pa.array([bytes(buf)], pa.binary()),
}), OUT_SHARDS)
pq.write_table(pa.table({
    "url": pa.array(urls, pa.string()),
    "charset": pa.array(labels, pa.string()),
    "text": pa.array(texts, pa.string()),
}), OUT_PAGES)
print("wrote %s (1 shard, %d pages) and %s" % (OUT_SHARDS, len(pages), OUT_PAGES))
