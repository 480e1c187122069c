#!/usr/bin/env python3
"""Deterministic dirty-JSONL fixture (dev tool; output is committed).

fixtures/events_dirty.jsonl: 70 lines; every 7th line (id % 7 == 0) is
SYNTACTICALLY corrupt (last 3 characters dropped, so the brace never
closes) — the shape a real ingestion quarantine faces. Valid lines are
exactly-typed {"id": int, "kind": str, "v": int} so Spark's PERMISSIVE
corrupt-record semantics and DuckDB's json_valid() agree: corrupt ⟺
not parseable. No randomness: every value is a fixed formula of id."""
import os

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")
kinds = ["click", "view", "purchase"]
lines = []
for i in range(70):
    line = '{"id": %d, "kind": "%s", "v": %d}' % (i, kinds[i % 3], (i * 37) % 1000)
    if i % 7 == 0:
        line = line[:-3]
    lines.append(line)
path = os.path.join(OUT, "events_dirty.jsonl")
with open(path, "w") as f:
    f.write("\n".join(lines) + "\n")
print("wrote", path, len(lines), "lines")
