#!/usr/bin/env python3
"""Link-resolution fixture (dev tool; output is committed).

Produces fixtures/link_pages.parquet: (doc_id, url, html) pages whose
<a href> targets exercise EVERY branch of graft.operators.Html.resolveHref
— the pinned RFC 3986 §5.2 subset: absolute kept, protocol-relative
scheme-prefixed, other-scheme (mailto:/javascript:) dropped, fragment-only
dropped, path-absolute host-prefixed, query-only path-appended, and
page-relative merged against the base DIRECTORY with bounded dot-segment
removal (./, seg/.., excess .. clamped at root).

The q336 oracle replays the identical formula in SQL (patterns
interpolated from the operator's constants); this generator replays it a
THIRD time in Python (re.sub, same patterns, same pass counts) and
asserts hand-pinned expectations — three independent replays of one
pinned formula (the round-13 engineered-exactness convention).
"""
import pathlib
import re

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "link_pages.parquet"

# the pinned dot-removal chain: (pattern, passes), each pass a GLOBAL
# sub. SEG is "a segment that is not . or .." — RE2-safe, no lookahead
SEG = r"(?:[^./][^/]*|\.[^./][^/]*|\.\.[^/]+)"
DOT_STEPS = [
    (r"/\./", 2),
    (r"/\.$", 1),
    ("/%s/\\.\\./" % SEG, 4),
    ("/%s/\\.\\.$" % SEG, 1),
    (r"^(?:/\.\.)+(?:/|$)", 1),
]


def remove_dots(p):
    for pat, passes in DOT_STEPS:
        for _ in range(passes):
            p = re.sub(pat, "/", p)
    return p


def resolve(src, href):
    """Python twin of Html.resolveHref (branch order is the contract)."""
    src_ok = re.match(r"^https?://", src) is not None
    m = re.match(r"^(https?://[^/?#]+)", src)
    base = m.group(1) if m else ""
    mp = re.match(r"^https?://[^/?#]+([^?#]*)", src)
    spath = (mp.group(1) if mp else "") or "/"
    sdir = re.sub(r"[^/]+$", "", spath)
    if re.match(r"^https?://", href):
        return href  # anchored: embedded-url hrefs are NOT absolute
    if href.startswith("//") and re.match(r"^//[^/]", href) and src_ok:
        return re.match(r"^(https?):", src).group(1) + ":" + href
    if href.startswith("//"):
        return None  # degenerate '//' / schemeless '///p': no authority
    if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", href):
        return None
    if href.startswith("#"):
        return None
    if href.startswith("/") and src_ok:
        return base + href
    if href.startswith("?") and src_ok:
        return base + spath + href
    if src_ok:
        return base + remove_dots(sdir + href)
    return None


# (url, [(href, expected-dst-or-None)]) — expectations HAND-PINNED, the
# generator only verifies its replay agrees with them
PAGES = [
    ("https://site-a.com/dir/sub/page.html", [
        ("https://other.com/abs", "https://other.com/abs"),
        ("//cdn.site-a.com/lib.js", "https://cdn.site-a.com/lib.js"),
        ("/rooted/x", "https://site-a.com/rooted/x"),
        ("?page=2", "https://site-a.com/dir/sub/page.html?page=2"),
        ("#top", None),
        ("mailto:team@site-a.com", None),
        ("next.html", "https://site-a.com/dir/sub/next.html"),
        ("./here.html", "https://site-a.com/dir/sub/here.html"),
        ("../up.html", "https://site-a.com/dir/up.html"),
        ("../../top.html", "https://site-a.com/top.html"),
        ("a/b/../c.html", "https://site-a.com/dir/sub/a/c.html"),
    ]),
    ("https://site-b.com/dir/", [
        ("img/pic.png", "https://site-b.com/dir/img/pic.png"),
        ("../other/../root.html", "https://site-b.com/root.html"),
        ("javascript:void(0)", None),
        ("//site-b.com/proto", "https://site-b.com/proto"),
        ("//", None),       # degenerate protocol-relative: no authority
        ("///x", None),     # schemeless empty-authority form
    ]),
    ("https://site-c.com", [
        ("rel.html", "https://site-c.com/rel.html"),
        ("../escape.html", "https://site-c.com/escape.html"),
        ("#frag-only", None),
    ]),
    # uppercase scheme: NOT a recognizable base — only absolutes survive
    ("HTTP://site-d.com/x", [
        ("https://keep.com/ok", "https://keep.com/ok"),
        ("/dropped", None),
        ("rel.html", None),
    ]),
    # query in the base url: excluded from both path and directory
    ("https://site-e.com/a?q=1", [
        ("?r=2", "https://site-e.com/a?r=2"),
        ("b.html", "https://site-e.com/b.html"),
    ]),
    # deep ../ chain at the pinned bound (4 levels)
    ("https://site-f.com/d1/d2/d3/d4/f.html", [
        ("../../../../root.html", "https://site-f.com/root.html"),
        ("./a/./b.html", "https://site-f.com/d1/d2/d3/d4/a/b.html"),
        ("x/..", "https://site-f.com/d1/d2/d3/d4/"),
    ]),
    # http (not https) base: protocol-relative keeps the http scheme
    ("http://plain.org/p/q.html", [
        ("//cdn.plain.org/z", "http://cdn.plain.org/z"),
        ("r.html", "http://plain.org/p/r.html"),
        ("tel:+123456", None),
    ]),
    # embedded-url hrefs (r15 advice): '://' INSIDE the href must not be
    # mistaken for an absolute target — the absolute branch is anchored
    # to ^https?://, so these resolve as path-absolute/query/relative,
    # and javascript:// falls to the other-scheme drop
    ("https://site-g.com/out/page.html", [
        ("/redirect?u=https://partner.com",
         "https://site-g.com/redirect?u=https://partner.com"),
        ("go?next=http://x.org/a",
         "https://site-g.com/out/go?next=http://x.org/a"),
        ("?back=https://site-g.com/out/page.html",
         "https://site-g.com/out/page.html?back=https://site-g.com/out/page.html"),
        ("javascript://alert(1)", None),
        ("HTTPS://upper.com/x", None),  # uppercase scheme: not the pinned
                                        # lowercase absolute form → scheme drop
    ]),
]

ids, urls, htmls = [], [], []
n_edges = 0
for d, (url, links) in enumerate(PAGES):
    body = []
    for href, expect in links:
        got = resolve(url, href)
        assert got == expect, (url, href, got, expect)
        if expect is not None:
            n_edges += 1
        # alternate quoted/unquoted so the capture pattern is exercised
        if len(body) % 2 == 0:
            body.append('<a href="%s">l%d</a>' % (href, len(body)))
        else:
            body.append('<a href=%s>l%d</a>' % (href, len(body)))
    html = ("<html><head><title>links %d</title></head><body><p>%s</p>"
            "</body></html>" % (d, " ".join(body)))
    ids.append(d)
    urls.append(url)
    htmls.append(html)

pq.write_table(pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "url": pa.array(urls, pa.string()),
    "html": pa.array(htmls, pa.string()),
}), OUT)
print("wrote %s: %d pages, %d resolvable edges" % (OUT, len(ids), n_edges))
