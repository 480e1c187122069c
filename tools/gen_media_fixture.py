#!/usr/bin/env python3
"""Deterministic multimodal fixture generator (dev tool; output is committed).

Produces fixtures/media.parquet: 60 rows of opaque binary payloads with typed
metadata, the shape a multimodal training-data pipeline stores images/audio in.

Payload layout (our fake "codec", parsed by graft.operators.Multimodal):
  bytes 0-1  width,  big-endian u16
  bytes 2-3  height, big-endian u16
  video rows additionally:
    bytes 4-5  n_frames, big-endian u16
    byte  6    fps, u8
  remaining bytes  body: byte i = (media_id*31 + i*7) % 256, length = 16 + (id % 64)

The metadata columns (width/height/n_bytes/checksum, and n_frames/fps for
video) are written REDUNDANTLY with the header so the engine's byte-level
decode can be verified against an independently-stored value by the DuckDB
oracle (DuckDB cannot index into BLOBs, so the oracle reads the metadata
while Spark reads the bytes).

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
for i in range(60):
    mime = MIMES[i % 4]
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
    ids.append(i)
    mimes.append(mime)
    payloads.append(payload)
    widths.append(w)
    heights.append(h)
    n_bytes.append(len(payload))
    checksums.append(sum(body) % 9973)
    n_frames.append(nf)
    fpss.append(fps)

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
})
pq.write_table(table, os.path.join(OUT, "media.parquet"))
print("wrote", os.path.join(OUT, "media.parquet"), table.num_rows, "rows")
