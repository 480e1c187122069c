#!/usr/bin/env python3
"""Extract the RFC 7932 (Brotli) static data tables into engine resources.

The full brotli decode needs three pieces of PUBLIC STANDARD data that
are impractical to transcribe by hand:

  - the 122,784-byte static dictionary (RFC 7932 Appendix A),
  - the 121 word transforms (RFC 7932 Appendix B): prefix string,
    transform kind, suffix string,
  - the 2,048-byte literal-context lookup table (RFC 7932 §7.1 — the
    four context modes' p1/p2 maps, concatenated).

All three are fixed normative constants of the RFC; this tool reads
them out of the system brotli library (libbrotlicommon exports
BrotliGetDictionary / BrotliGetTransforms / _kBrotliContextLookupTable)
and writes them as binary resources under src/main/resources/graft/.
The dictionary sha256 is pinned below so a regeneration on a different
library build fails loudly instead of silently shipping altered data.

Outputs:
  src/main/resources/graft/brotli_dict.bin        (122,784 bytes)
  src/main/resources/graft/brotli_ctx.bin         (2,048 bytes)
  src/main/resources/graft/brotli_transforms.bin  (custom framing:
      for each of 121 transforms: u8 prefix_len, prefix bytes,
      u8 kind, u8 suffix_len, suffix bytes — kind per the RFC:
      0 identity, 1-9 omit-last-1..9, 10 uppercase-first,
      11 uppercase-all, 12-20 omit-first-1..9)
"""
import ctypes
import hashlib
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "src" / "main" / "resources" / "graft"
OUT.mkdir(parents=True, exist_ok=True)

common = ctypes.CDLL("libbrotlicommon.so.1")

# ------------------------------------------------------------ dictionary
DICT_SHA256 = "20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70"


class BrotliDictionary(ctypes.Structure):
    _fields_ = [("size_bits_by_length", ctypes.c_uint8 * 32),
                ("offsets_by_length", ctypes.c_uint32 * 32),
                ("data_size", ctypes.c_size_t),
                ("data", ctypes.POINTER(ctypes.c_uint8))]


common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
d = common.BrotliGetDictionary().contents
assert d.data_size == 122784, d.data_size
raw = bytes(ctypes.cast(
    d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
assert hashlib.sha256(raw).hexdigest() == DICT_SHA256, \
    "system brotli dictionary differs from the RFC 7932 Appendix A data"
# the per-length tables are small fixed constants; the Scala side embeds
# them directly — assert they match the RFC values here
assert list(d.size_bits_by_length[:25]) == \
    [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7, 7, 8,
     7, 7, 6, 6, 5, 5]
assert list(d.offsets_by_length[:25]) == \
    [0, 0, 0, 0, 0, 4096, 9216, 21504, 35840, 44032, 53248, 63488,
     74752, 87040, 93696, 100864, 104704, 106752, 108928, 113536,
     115968, 118528, 119872, 121280, 122016]
(OUT / "brotli_dict.bin").write_bytes(raw)
print(f"wrote brotli_dict.bin ({len(raw)} bytes)")

# ------------------------------------------------------- context lookup
ctx = bytes((ctypes.c_uint8 * 2048).in_dll(common, "_kBrotliContextLookupTable"))
(OUT / "brotli_ctx.bin").write_bytes(ctx)
print(f"wrote brotli_ctx.bin ({len(ctx)} bytes, sha256 "
      f"{hashlib.sha256(ctx).hexdigest()[:16]}…)")

# ----------------------------------------------------------- transforms


class BrotliTransforms(ctypes.Structure):
    _fields_ = [("prefix_suffix_size", ctypes.c_uint16),
                ("prefix_suffix", ctypes.POINTER(ctypes.c_uint8)),
                ("prefix_suffix_map", ctypes.POINTER(ctypes.c_uint16)),
                ("num_transforms", ctypes.c_uint32),
                ("transforms", ctypes.POINTER(ctypes.c_uint8)),
                ("params", ctypes.POINTER(ctypes.c_uint8)),
                ("cutOffTransforms", ctypes.c_int16 * 10)]


common.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
t = common.BrotliGetTransforms().contents
assert t.num_transforms == 121, t.num_transforms
ps = bytes(ctypes.cast(
    t.prefix_suffix,
    ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)


def pool_string(idx):
    # prefix_suffix is a pool of length-prefixed strings; the map gives
    # each id's offset of its LENGTH byte
    off = t.prefix_suffix_map[idx]
    n = ps[off]
    return ps[off + 1: off + 1 + n]


frames = bytearray()
for i in range(121):
    pre = pool_string(t.transforms[3 * i])
    kind = t.transforms[3 * i + 1]
    suf = pool_string(t.transforms[3 * i + 2])
    assert kind <= 20, kind
    frames += bytes([len(pre)]) + pre + bytes([kind, len(suf)]) + suf
(OUT / "brotli_transforms.bin").write_bytes(bytes(frames))
print(f"wrote brotli_transforms.bin ({len(frames)} bytes)")
# transform 0 must be the bare identity — the most common transform
assert pool_string(t.transforms[0]) == b"" and t.transforms[1] == 0 \
    and pool_string(t.transforms[2]) == b""
