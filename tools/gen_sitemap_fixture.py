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

# ---------------------------------------------------------------- r17:
# the WebCorpusApp crawl's OWN fetched-sitemap store (a separate table —
# the q306/q307 discovery fixture above has formula-driven oracles that
# must not absorb these rows). Contains EXACTLY the file the crawl
# host's robots.txt declares (`sitemap: http://example.com/s.xml` — the
# q346 discovery hook) plus a DECOY the robots never declares (the
# sitemap-seeded frontier must read declared files only). Populations:
#  - /doc3                  already FETCHED -> must NOT be scheduled;
#  - /doc21                 a 301 SOURCE -> resolves through the redirect
#                           map to its never-fetched terminal (already a
#                           link target too: the union dedups);
#  - /smapnew1?b=2&amp;a=1  new -> scheduled (entity decode + query sort);
#  - /smapnew2              new -> scheduled;
#  - /doc1009               new but robots-BLOCKED (Disallow: /doc*9$).
OUT2 = ROOT / "fixtures" / "crawl_sitemaps.parquet"
crawl_rows = [
    ("http://example.com/s.xml",
     '<?xml version="1.0" encoding="UTF-8"?>\n'
     '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
     '  <url><loc>https://example.com/doc3</loc></url>\n'
     '  <url>\n    <loc> https://example.com/doc21 </loc>\n'
     '    <lastmod>2026-08-02</lastmod>\n  </url>\n'
     '  <url><loc>https://example.com/smapnew1?b=2&amp;a=1</loc></url>\n'
     '  <url><loc>https://example.com/smapnew2</loc></url>\n'
     '  <url><loc>https://example.com/doc1009</loc></url>\n'
     '</urlset>\n'),
    ("https://example.com/undeclared-sitemap.xml",
     '<?xml version="1.0" encoding="UTF-8"?>\n'
     '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
     '  <url><loc>https://example.com/never-declared</loc></url>\n'
     '</urlset>\n'),
]
table2 = pa.table({
    "url": pa.array([u for u, _ in crawl_rows], pa.string()),
    "xml": pa.array([x for _, x in crawl_rows], pa.string()),
})
pq.write_table(table2, OUT2)
print(f"wrote {OUT2}: {len(crawl_rows)} crawl sitemap files")
