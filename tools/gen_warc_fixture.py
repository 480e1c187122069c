#!/usr/bin/env python3
"""WARC fixture: packs the 300 html_docs pages into real WARC/1.0 shard
files (the on-disk format web crawls actually arrive in — ISO 28500 /
the Common Crawl layout), so the engine's WARC walk is a PACK-AND-RECOVER
oracle: the DuckDB side computes every expected field from
html_docs.parquet + the formulas below, and the engine must recover them
from the raw container bytes.

Layout (deterministic, no randomness):
- 6 shards, page doc_id -> shard doc_id % 6. Shard 5 is GZIPPED the way
  Common Crawl ships: one gzip MEMBER PER RECORD, members concatenated
  (mtime=0 for byte determinism).
- Each shard opens with a `warcinfo` record, then per page (ascending
  doc_id): a `request` record + a `response` record. Every 25th page
  (doc_id % 25 == 0) also gets a `metadata` record after its response.
- HTTP status formula: doc_id % 53 == 7  -> 404 (body still the html —
  a custom 404 page), doc_id % 53 == 21 -> 301 (EMPTY body + Location
  header), else 200.
- Content-Type header case varies (doc_id % 10 == 3 -> "Text/HTML;
  charset=utf-8") so parsers must not assume canonical case.
- WARC-Date: 2026-08-01T00:00:00Z + doc_id minutes.
- Shard 2 ends with NON-RECORD GARBAGE bytes (a torn tail, no WARC/1.0
  magic): the walk must stop cleanly, recovering every whole record.
"""
import gzip
import io
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
HTML = ROOT / "fixtures" / "html_docs.parquet"
OUT = ROOT / "fixtures" / "warc_shards.parquet"

pages = pq.read_table(HTML).to_pylist()
pages.sort(key=lambda r: r["doc_id"])


def status_of(doc_id):
    if doc_id % 53 == 7:
        return 404
    if doc_id % 53 == 21:
        return 301
    return 200


def ctype_of(doc_id):
    return "Text/HTML; charset=utf-8" if doc_id % 10 == 3 else "text/html; charset=utf-8"


def warc_date(doc_id):
    m = doc_id
    return f"2026-08-01T{m // 60:02d}:{m % 60:02d}:00Z"


def record(warc_type, headers, block):
    h = [("WARC-Type", warc_type)] + headers + [("Content-Length", str(len(block)))]
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in h) + "\r\n"
    return head.encode("ascii") + block + b"\r\n\r\n"


def http_response(doc_id, html):
    st = status_of(doc_id)
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}[st]
    body = b"" if st == 301 else html.encode("ascii")
    lines = [f"HTTP/1.1 {st} {reason}",
             f"Content-Type: {ctype_of(doc_id)}",
             f"Content-Length: {len(body)}",
             "Server: graft-fixture/1.0"]
    # r17: header-level robots directive (the X-Robots-Tag form real
    # servers use for non-HTML responses): noindex ONLY — the page is
    # rejected at the noindex gate but its links stay followable
    # (independence from the meta noindex,nofollow population at %53==34)
    if st == 200 and doc_id % 53 == 42:
        lines.append("X-Robots-Tag: noindex")
    if st == 301:
        # DECORATED on purpose: cased scheme/host, default port, tracking
        # param, unsorted params, fragment — the redirect-following query
        # (q332) must canonicalize the target, and the expected canonical
        # form is a formula (the q300 pack-and-recover convention).
        # r16 sub-rule: EVEN 301 sources redirect INTO the corpus — the
        # Location canonicalizes to the previous doc's url (status 200,
        # fetched), so a link target chaining here must be dropped by
        # the frontier's redirect-terminal gate; odd sources keep the
        # never-fetched /moved target.
        if doc_id % 2 == 0:
            lines.append("Location: HTTPS://EXAMPLE.com:443/doc"
                         f"{doc_id - 1}?utm_source=crawl#frag")
        else:
            lines.append("Location: HTTPS://EXAMPLE.com:443/doc"
                         f"{doc_id}/moved?utm_source=crawl&b=2&a=1#frag")
    return ("\r\n".join(lines) + "\r\n\r\n").encode("ascii") + body


shard_ids, gzs, payloads = [], [], []
for shard in range(6):
    buf = bytearray()
    recs = []
    recs.append(record(
        "warcinfo",
        [("WARC-Date", "2026-08-01T00:00:00Z"),
         ("WARC-Record-ID", f"<urn:graft:warcinfo-{shard}>"),
         ("Content-Type", "application/warc-fields")],
        f"software: graft-fixture/1.0\r\nshard: {shard}\r\n".encode("ascii")))
    for p in pages:
        did = p["doc_id"]
        if did % 6 != shard:
            continue
        url = p["url"]
        recs.append(record(
            "request",
            [("WARC-Target-URI", url),
             ("WARC-Date", warc_date(did)),
             ("WARC-Record-ID", f"<urn:graft:req-{did}>"),
             ("Content-Type", "application/http; msgtype=request")],
            (f"GET /doc{did} HTTP/1.1\r\nHost: example.com\r\n"
             "User-Agent: graft-crawler/1.0\r\n\r\n").encode("ascii")))
        recs.append(record(
            "response",
            [("WARC-Target-URI", url),
             ("WARC-Date", warc_date(did)),
             ("WARC-Record-ID", f"<urn:graft:resp-{did}>"),
             ("Content-Type", "application/http; msgtype=response")],
            http_response(did, p["html"])))
        if did % 25 == 0:
            recs.append(record(
                "metadata",
                [("WARC-Target-URI", url),
                 ("WARC-Date", warc_date(did)),
                 ("WARC-Record-ID", f"<urn:graft:meta-{did}>"),
                 ("Content-Type", "application/warc-fields")],
                f"fetchTimeMs: {100 + did}\r\n".encode("ascii")))
    if shard == 5:
        out = io.BytesIO()
        for r in recs:  # one gzip member per record, Common Crawl style
            with gzip.GzipFile(fileobj=out, mode="wb", mtime=0) as g:
                g.write(r)
        buf = out.getvalue()
    else:
        for r in recs:
            buf += r
        if shard == 2:  # torn tail: no WARC/1.0 magic anywhere in it
            buf += b"\x00\x01garbage torn tail without magic bytes\x02"
        buf = bytes(buf)
    shard_ids.append(shard)
    gzs.append(shard == 5)
    payloads.append(buf)

table = pa.table({
    "shard_id": pa.array(shard_ids, pa.int64()),
    "gz": pa.array(gzs, pa.bool_()),
    "payload": pa.array(payloads, pa.binary()),
})
pq.write_table(table, OUT)
n200 = sum(1 for p in pages if status_of(p["doc_id"]) == 200)
print(f"wrote {OUT}: {len(shard_ids)} shards, {len(pages)} pages "
      f"({n200} status-200), {sum(len(p) for p in payloads)} bytes")
