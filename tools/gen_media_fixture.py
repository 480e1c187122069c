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
