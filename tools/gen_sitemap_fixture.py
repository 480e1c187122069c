#!/usr/bin/env python3
"""Sitemap fixture: real sitemap XML (urlset files + one sitemapindex)
per crawl host, feeding the composed crawl-frontier pipeline
(discover -> canonicalize -> dedup against crawled -> robots filter).

Deterministic URL groups (each loc carries the ?b=2&amp;a=1 query in
ESCAPED form — the parser must entity-decode; canonicalization then
sorts it to ?a=1&b=2, the same canonical identity the q300/q301 crawled
set carries):
- www.example.com/sitemap.xml: a sitemapindex referencing sitemap-a +
  sitemap-b (the index row itself contains NO <url> blocks);
- sitemap-a: g 0-49    -> canonical DUPLICATES of already-crawled urls;
- sitemap-b: g 1000-1019 -> new, robots-allowed;
             g 2000-2009 -> new, robots-BLOCKED (graftbot Disallow /a/2);
- api.news.example.co.uk: g 300-339 -> new; /a/3 disallowed except the
  /a/33 Allow carve-out, so 330-339 survive and 300-329 drop;
- cdn.files.sample.org: g 500-509 -> new but Disallow: / blocks all;
- example.com (no robots row): g 600-607 -> new, default-allowed.

Mixed formatting: indentation + newlines vary, some <url> blocks carry
<lastmod> (formula: 2026-07-(g%28+1)), uppercase scheme decorations on
g%10==0 locs (canonicalization must absorb them).
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "sitemaps.parquet"


def loc(host, g):
    scheme = "HTTPS" if g % 10 == 0 else "https"
    return f"{scheme}://{host}/a/{g}?b=2&amp;a=1"


def urlset(host, gs):
    blocks = []
    for g in gs:
        lm = f"\n    <lastmod>2026-07-{g % 28 + 1:02d}</lastmod>" if g % 3 == 0 else ""
        blocks.append(f"  <url>\n    <loc> {loc(host, g)} </loc>{lm}\n  </url>")
    return ('<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            + "\n".join(blocks) + "\n</urlset>\n")


rows = []  # (url-of-the-sitemap-file, xml)

rows.append((
    "https://www.example.com/sitemap.xml",
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    '  <sitemap><loc>https://www.example.com/sitemap-a.xml</loc></sitemap>\n'
    '  <sitemap>\n    <loc> https://www.example.com/sitemap-b.xml </loc>\n'
    '    <lastmod>2026-08-01</lastmod>\n  </sitemap>\n'
    '</sitemapindex>\n'))
rows.append(("https://www.example.com/sitemap-a.xml",
             urlset("www.example.com", range(0, 50))))
rows.append(("https://www.example.com/sitemap-b.xml",
             urlset("www.example.com", list(range(1000, 1020)) + list(range(2000, 2010)))))
rows.append(("https://api.news.example.co.uk/sitemap.xml",
             urlset("api.news.example.co.uk", range(300, 340))))
rows.append(("https://cdn.files.sample.org/sitemap.xml",
             urlset("cdn.files.sample.org", range(500, 510))))
rows.append(("https://example.com/sitemap.xml",
             urlset("example.com", range(600, 608))))

table = pa.table({
    "url": pa.array([u for u, _ in rows], pa.string()),
    "xml": pa.array([x for _, x in rows], pa.string()),
})
pq.write_table(table, OUT)
n = sum(x.count("<url>") for _, x in rows)
print(f"wrote {OUT}: {len(rows)} sitemap files, {n} url entries")
