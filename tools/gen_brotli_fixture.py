#!/usr/bin/env python3
"""fixtures/brotli_vectors.parquet — REAL brotli streams for the full
RFC 7932 decode (r17).

Every row is (vec_id, quality, lgwin, n_raw, payload, br) where `br` is
produced by the system brotli ENCODER (libbrotlienc via ctypes) over
`payload` at the given quality/window — the engine's pure-JVM decoder
must inflate `br` back to `payload` bit-exactly. The generator
cross-checks every stream against libbrotlidec before writing, so a
broken row cannot enter the fixture.

Payload families × encoder settings are chosen to exercise every format
feature: dictionary-heavy English (static-dictionary refs + transforms
at high quality), HTML, UTF-8 multilingual (UTF8 context mode),
incompressible pseudo-random bytes (uncompressed meta-blocks), long
runs (window-capped back-references at lgwin=10), an empty and a 1-byte
payload (empty-last-block framing), and all-byte-values binary.
Qualities 0/1 use brotli's fast-path encoders (different meta-block
shapes than 5/9/11); lgwin 10/16/22/24 cover the WBITS codes.

Deterministic: payload formulas are seed-driven (no RNG state), brotli
encoding is deterministic for fixed (input, quality, lgwin).
"""
import ctypes
import hashlib
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "brotli_vectors.parquet"

enc = ctypes.CDLL("libbrotlienc.so.1")
dec = ctypes.CDLL("libbrotlidec.so.1")
enc.BrotliEncoderCompress.restype = ctypes.c_int
enc.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
dec.BrotliDecoderDecompress.restype = ctypes.c_int
dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
    ctypes.c_char_p]


def brotli_c(data, quality, lgwin):
    out = ctypes.create_string_buffer(len(data) + 1024)
    n = ctypes.c_size_t(len(out))
    ok = enc.BrotliEncoderCompress(quality, lgwin, 0, len(data), data,
                                   ctypes.byref(n), out)
    assert ok == 1, (quality, lgwin, len(data))
    comp = out.raw[: n.value]
    # cross-check with the reference DECODER: the fixture must never
    # carry a stream the reference itself reads differently
    back = ctypes.create_string_buffer(len(data) + 16)
    bn = ctypes.c_size_t(len(back))
    rc = dec.BrotliDecoderDecompress(len(comp), comp, ctypes.byref(bn), back)
    assert rc == 1 and back.raw[: bn.value] == data, (quality, lgwin)
    return comp


WORDS = ["the", "of", "and", "information", "system", "public", "data",
         "time", "work", "because", "there", "people", "which", "would",
         "different", "language", "through", "example", "government"]


def english(n_words, seed):
    ws = []
    for i in range(n_words):
        w = WORDS[(seed + i * 7) % len(WORDS)]
        if (seed + i) % 11 == 0:
            w = w.capitalize()
        ws.append(w)
        if (seed + i) % 13 == 5:
            ws.append(".")
    return (" ".join(ws)).encode("utf-8")


def html_page(seed):
    paras = "".join(
        "<p>%s</p>\n" % english(40, seed + j).decode() for j in range(40))
    return ("<!DOCTYPE html><html><head><title>page %d</title>"
            '<meta charset="utf-8"></head><body>%s</body></html>'
            % (seed, paras)).encode("utf-8")


def pseudo_random(n, seed):
    # xorshift-ish formula: incompressible enough to force uncompressed
    # meta-blocks at every quality
    out = bytearray(n)
    x = seed * 2654435761 % (1 << 32) or 1
    for i in range(n):
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out[i] = x & 0xFF
    return bytes(out)


def multilingual(n_units, seed):
    frag = ["café résumé naïve — ", "宇宙と時間の物語。", "данные и модели ",
            "δεδομένα και χρόνος ", "🙂 tokens "]
    return ("".join(frag[(seed + i) % len(frag)]
                    for i in range(n_units))).encode("utf-8")


payloads = [
    ("english_small", english(200, 1)),
    ("english_large", english(20000, 2)),
    ("html", html_page(3)),
    ("random_64k", pseudo_random(65536, 4)),
    ("run_200k", b"a" * 200000),
    ("multilingual", multilingual(3000, 5)),
    ("all_bytes", bytes(range(256)) * 200),
    ("empty", b""),
    ("one_byte", b"x"),
    ("mixed", english(5000, 6) + pseudo_random(5000, 7) + html_page(8)),
]

rows = []
vec_id = 0
for name, data in payloads:
    for quality in (0, 1, 2, 5, 9, 11):
        for lgwin in (10, 16, 22, 24):
            # one (q, w) grid for the two principal families; the rest
            # ride a diagonal to keep the fixture small
            principal = name in ("english_large", "mixed")
            if not principal and (quality, lgwin) not in (
                    (0, 16), (1, 22), (2, 10), (5, 22), (9, 24), (11, 22),
                    (11, 10)):
                continue
            br = brotli_c(data, quality, lgwin)
            rows.append((vec_id, name, quality, lgwin, len(data), data, br))
            vec_id += 1

table = pa.table({
    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
    "family": pa.array([r[1] for r in rows], pa.string()),
    "quality": pa.array([r[2] for r in rows], pa.int32()),
    "lgwin": pa.array([r[3] for r in rows], pa.int32()),
    "n_raw": pa.array([r[4] for r in rows], pa.int64()),
    "payload": pa.array([r[5] for r in rows], pa.binary()),
    "br": pa.array([r[6] for r in rows], pa.binary()),
})
pq.write_table(table, OUT)
total = sum(len(r[6]) for r in rows)
print(f"wrote {OUT}: {len(rows)} vectors, {total} br bytes, "
      f"{sum(r[4] for r in rows)} raw bytes")
print("sha256 of concat payloads:",
      hashlib.sha256(b"".join(r[5] for r in rows)).hexdigest()[:16])
