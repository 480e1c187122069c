#!/usr/bin/env python3
"""Redirect-chain WARC fixture (dev tool; output is committed).

The ubiquitous real-web redirect is a CHAIN — http -> https -> www ->
200 — plus the occasional 301 loop. Produces:

  fixtures/redirect_shards.parquet   one plain WARC/1.0 shard:
    for n in 0..9 the three-hop chain
      http://chain.example.org/p{n}        301 -> HTTPS://CHAIN.example.org:443/p{n}?utm_source=mv#f
      https://chain.example.org/p{n}       301 -> https://www.chain.example.org/p{n}
      https://www.chain.example.org/p{n}   200 (html body)
    (the first Location is DECORATED — cased scheme/host, default port,
    tracking param, fragment — so the chain only links up through
    canonicalization, the q332 rule set)
    plus a 2-cycle loop:  https://loop.example.org/a <-> /b  (both 301)
    plus a dangling hop:  https://dangle.example.org/x 301 -> an
    offsite url that was never fetched (terminal after 1 hop)

  fixtures/redirect_expected.parquet (url, terminal_url, n_hops,
    unterminated) — the STORED expectation for Url.resolveChains at
    maxHops=4, computed by a Python replay of the same pinned bounded
    iteration and asserted against hand-pinned rows.
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT_SHARDS = ROOT / "fixtures" / "redirect_shards.parquet"
OUT_EXPECT = ROOT / "fixtures" / "redirect_expected.parquet"

MAX_HOPS = 4


def record(headers, block):
    h = headers + [("Content-Length", str(len(block)))]
    head = "WARC/1.0\r\n" + "".join("%s: %s\r\n" % (k, v) for k, v in h) + "\r\n"
    return head.encode("ascii") + block + b"\r\n\r\n"


def http_301(location):
    return ("HTTP/1.1 301 Moved Permanently\r\n"
            "Location: %s\r\nContent-Length: 0\r\n\r\n" % location).encode("ascii")


def http_200(body):
    b = body.encode("ascii")
    return ("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            "Content-Length: %d\r\n\r\n" % len(b)).encode("ascii") + b


# (target_uri, wire_location_or_None-for-200, canonical_location)
pages = []
for n in range(10):
    pages.append((
        "http://chain.example.org/p%d" % n,
        "HTTPS://CHAIN.example.org:443/p%d?utm_source=mv#f" % n,
        "https://chain.example.org/p%d" % n))
    pages.append((
        "https://chain.example.org/p%d" % n,
        "https://www.chain.example.org/p%d" % n,
        "https://www.chain.example.org/p%d" % n))
    pages.append(("https://www.chain.example.org/p%d" % n, None, None))
pages.append(("https://loop.example.org/a",
              "https://loop.example.org/b", "https://loop.example.org/b"))
pages.append(("https://loop.example.org/b",
              "https://loop.example.org/a", "https://loop.example.org/a"))
pages.append(("https://dangle.example.org/x",
              "https://offsite.example.net/y", "https://offsite.example.net/y"))
# duplicate capture (r15 advice): ONE url 301-captured twice with two
# different Location targets — the resolver must functionalize the map
# (pinned min(dst)) instead of fanning out through every hop join
pages.append(("https://dup.example.org/s",
              "https://dup.example.org/t2", "https://dup.example.org/t2"))
pages.append(("https://dup.example.org/s",
              "https://dup.example.org/t1", "https://dup.example.org/t1"))

buf = bytearray()
for i, (url, loc, _) in enumerate(pages):
    body = http_301(loc) if loc is not None else http_200(
        "<html><body><p>terminal page %s reached</p></body></html>" % url)
    buf += record(
        [("WARC-Type", "response"),
         ("WARC-Target-URI", url),
         ("WARC-Date", "2026-08-01T02:%02d:00Z" % (i % 60)),
         ("WARC-Record-ID", "<urn:graft:redir-%d>" % i),
         ("Content-Type", "application/http; msgtype=response")],
        body)

pq.write_table(pa.table({
    "shard_id": pa.array([0], pa.int64()),
    "gz": pa.array([False], pa.bool_()),
    "payload": pa.array([bytes(buf)], pa.binary()),
}), OUT_SHARDS)

# ---- expectation: replay the pinned bounded iteration ----
# functionalize first (the operator's pinned min(dst)-per-src rule)
edges = {}
for (u, _, c) in pages:
    if c is not None:
        edges[u] = c if u not in edges else min(edges[u], c)
rows = []
for src, first in sorted(edges.items()):
    t, h = first, 1
    for _ in range(2, MAX_HOPS + 1):
        if t in edges:
            t = edges[t]
            h += 1
    rows.append((src, t, h, t in edges))

by_url = {r[0]: r for r in rows}
# hand-pinned: a full chain head terminates at www in 2 hops
assert by_url["http://chain.example.org/p0"] == (
    "http://chain.example.org/p0", "https://www.chain.example.org/p0", 2, False)
assert by_url["https://chain.example.org/p3"] == (
    "https://chain.example.org/p3", "https://www.chain.example.org/p3", 1, False)
# the 2-cycle loop burns all hops and stays flagged (terminal oscillates:
# a->b->a->b->a after 4 hops)
assert by_url["https://loop.example.org/a"] == (
    "https://loop.example.org/a", "https://loop.example.org/a", 4, True)
assert by_url["https://loop.example.org/b"] == (
    "https://loop.example.org/b", "https://loop.example.org/b", 4, True)
# dangling: offsite target has no outgoing edge
assert by_url["https://dangle.example.org/x"] == (
    "https://dangle.example.org/x", "https://offsite.example.net/y", 1, False)
# duplicate capture: ONE row, the min(dst) target, no fan-out
assert by_url["https://dup.example.org/s"] == (
    "https://dup.example.org/s", "https://dup.example.org/t1", 1, False)
assert len(rows) == len(edges)

pq.write_table(pa.table({
    "url": pa.array([r[0] for r in rows], pa.string()),
    "terminal_url": pa.array([r[1] for r in rows], pa.string()),
    "n_hops": pa.array([r[2] for r in rows], pa.int64()),
    "unterminated": pa.array([r[3] for r in rows], pa.bool_()),
}), OUT_EXPECT)
print("wrote %s (%d responses) and %s (%d chains)"
      % (OUT_SHARDS, len(pages), OUT_EXPECT, len(rows)))
