#!/usr/bin/env python3
"""robots.txt fixture: real Robots Exclusion Protocol files (RFC 9309
shapes) per crawl host, with the EXPECTED graftbot rule set stored as
independent array columns — pack-and-recover: the engine must parse the
bytes back to exactly the stored rules (group selection included), and
the URL allow-filter then replays relationally from the stored rules.

Realism exercised:
- mixed-case directives, CRLF and LF line endings, comments (# ...),
  blank lines inside and between groups;
- multiple User-agent lines sharing one group;
- a SPECIFIC graftbot group that OVERRIDES the * group (RFC: most
  specific group wins, others ignored);
- groups for other bots that must not leak in;
- empty Disallow (matches nothing -> no rule), unknown directives
  (Crawl-delay, Sitemap) skipped;
- rules BEFORE any User-agent line (ignored per spec);
- one host blocking everything (Disallow: /), one host absent from the
  fixture entirely (default-allow path in the filter).
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "robots.parquet"

SITES = []


def site(name, txt, rules, delay=None):
    """rules: expected (allow, path) for agent graftbot, file order;
    delay: expected graftbot Crawl-delay (None when undeclared/invalid)."""
    SITES.append((name, txt, rules, delay))


# graftbot has its OWN group here: the * group must be IGNORED entirely.
# The group also carries RFC 9309 §2.2.3 WILDCARD patterns: `*` matches
# any char sequence, a TRAILING `$` anchors the end of the path
# (specificity stays the raw pattern length, ties Allow-wins).
site(
    "www.example.com",
    "# robots for example.com\r\n"
    "Disallow: /ignored-no-group\r\n"          # before any UA: ignored
    "SITEMAP: https://www.example.com/sitemap-index.xml.gz # master\r\n"
    # ^ r16: sitemap discovery — upper-case key, PRE-group position
    #   (Sitemap is global, groups are irrelevant), trailing comment
    "User-agent: *\r\n"
    "Disallow: /a/1\r\n"
    "Allow: /a/12\r\n"
    "\r\n"
    "User-Agent: graftbot\r\n"                  # mixed-case directive
    "Crawl-delay: 10\r\n"                       # unknown: skipped
    "Disallow: /a/2\r\n"
    "ALLOW: /a/25\r\n"                          # upper-case directive
    "Disallow: /a/7\r\n"
    "Disallow: /a/*0$\r\n"                      # wildcard: any /a/ path ending in 0
    "Allow: /a/1*\r\n"                          # trailing-* (= prefix) form
    "\r\n"
    "User-agent: otherbot\r\n"
    "Disallow: /\r\n"
    "\r\n"
    "Sitemap: https://www.example.com/news-sitemap.xml\r\n"  # r16: between groups
    "User-agent: graftbot\r\n"                  # 2nd graftbot group: no rules,
    "Crawl-delay: 4\r\n",                       # a SECOND delay -> max merge
    [(False, "/a/2"), (True, "/a/25"), (False, "/a/7"),
     (False, "/a/*0$"), (True, "/a/1*")],
    delay=10)

# the WebCorpusApp crawl host (plain + wildcard rules): /doc7 blocks the
# /doc7x tree with a /doc75 carve-out; /doc*9$ blocks every path ending
# in 9. NOTE: no /a/-prefixed rule here, so the q305/q307 populations
# (paths /a/N on host example.com) still take the default-allow path.
site(
    "example.com",
    "User-agent: graftbot\n"
    "Crawl-delay: 2\n"
    "Disallow: /doc7\n"
    "Allow: /doc75\n"
    "Disallow: /doc*9$\n"
    "  sitemap: http://example.com/s.xml\n",   # r16: lowercase, indented

    [(False, "/doc7"), (True, "/doc75"), (False, "/doc*9$")],
    delay=2)

# only a * group (LF endings, comments, blank lines, empty Disallow,
# two UA lines sharing the group, Sitemap skipped)
site(
    "api.news.example.co.uk",
    "User-agent: somebot\n"
    # r16: an ignored line BETWEEN two User-agent lines must NOT end
    # agent collection (RFC 9309 grouping) — if it split the group, the
    # stored * rules would stop applying and q305's replay would break
    "Sitemap: https://api.news.example.co.uk/sitemap-news.xml\n"
    "User-agent: *\n"
    "# block the /a/3 tree except /a/33\n"
    "Disallow: /a/3\n"
    "\n"
    "Allow: /a/33\n"
    "Disallow:\n"                               # empty: matches nothing
    "Crawl-delay: 3\n"
    "Sitemap: https://api.news.example.co.uk/sitemap.xml\n",
    [(False, "/a/3"), (True, "/a/33")],
    delay=3)

# block everything
site(
    "cdn.files.sample.org",
    "User-agent: *\nDisallow: /\n",
    [(False, "/")])

# a host the URL table never visits: parsed, then unused by the filter
site(
    "unvisited.example.net",
    "User-agent: graftbot\nCrawl-delay: fast\n"
    "Disallow: /private\nAllow: /private/ok\n",
    [(False, "/private"), (True, "/private/ok")],
    delay=None)

# NOTE: unvisited.example.net keeps the parsed-but-unused path; the
# q305/q307 default-allow case is now example.com's /a/N population
# (rules exist for the host but none match those paths).

table = pa.table({
    "site": pa.array([s for s, _, _, _ in SITES], pa.string()),
    "robots_txt": pa.array([t for _, t, _, _ in SITES], pa.string()),
    "exp_allow": pa.array([[a for a, _ in r] for _, _, r, _ in SITES],
                          pa.list_(pa.bool_())),
    "exp_path": pa.array([[p for _, p in r] for _, _, r, _ in SITES],
                         pa.list_(pa.string())),
    "exp_crawl_delay": pa.array([d for _, _, _, d in SITES], pa.int64()),
})
pq.write_table(table, OUT)
print(f"wrote {OUT}: {len(SITES)} sites, "
      f"{sum(len(r) for _, _, r, _ in SITES)} expected graftbot rules")
