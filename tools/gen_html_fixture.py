#!/usr/bin/env python3
"""Deterministic HTML fixture generator (dev tool; output is committed).

Produces fixtures/html_docs.parquet: 300 rows (doc_id, url, html) of
real-world-shaped web pages — head/title/meta, <style> and <script> noise
(with tag-looking text inside), HTML comments, link-dense nav/footer
boilerplate, low-link-density content paragraphs, named + numeric
entities, and deliberate malformations (unclosed <p>, a bare '<' in text,
uppercase tags, unquoted attributes) — the input of graft.operators.Html.

CONTENT populations (what the composed q64-clean on extracted text sees):
  ids   0-199  normal unique English content, 4-8 paragraphs
  ids 200-219  EXACT content duplicate of (id-200) under different
               boilerplate/nav (extraction-keyed, not byte-keyed)
  ids 220-239  NEAR-duplicate of (id-220): one word of the last sentence
               changed (3-shingle Jaccard ~0.87-0.95)
  ids 240-259  too short (8 tokens after the entity suffix) -> quality-dropped
  ids 260-279  Spanish-flavored content -> language-dropped
  ids 280-299  link farm (nav blocks only, no >=25-char text block):
               empty extraction -> dropped
  ids 320-329  SINGLE-BLOCK exact REGROUP of (id-300), i.e. seeds 20-29:
               the identical content tokens in ONE <p> instead of one
               per sentence - every BLOCK differs from the base's blocks
               (survives paragraph dedup) while the concatenated clean
               text is byte-identical (dies at doc-level EXACT dedup;
               in the incremental app path the base sits in history, so
               this population exercises the corpus-fp history gate).
  ids 300-319  SINGLE-BLOCK near-duplicate of (id-260), i.e. seeds 40-59:
               the whole content (incl. the suffix decorations at their
               original token positions) packed into ONE <p> with ONE
               word changed -> the block text differs from every base
               block (SURVIVES corpus-wide paragraph dedup whole) while
               the doc-level 3-shingle Jaccard vs the base stays >= 0.8
               (dies at the doc near-dup ladder). The population that
               keeps the near-dup stage observable in a composed
               paragraph-dedup-first pipeline (graft.app.WebCorpusApp).

Paragraph sentence formula (seed = content seed, j = sentence index,
k = slot): the English pattern
  'the p{seed} of W2 and a W3 to the W4 in W5 W1' with Wk =
  WORDS[(seed*7 + j*5 + k*3) % 16]; the near-dup rows replace the W3
  slot of the LAST sentence with WORDS[(seed + 9) % 16]. Spanish rows
  use 'el p{seed} la W2 de W3 W4 W5'. No randomness anywhere.
"""
import os
import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures")

WORDS = ["data", "model", "training", "corpus", "quality", "filter",
         "sample", "token", "graph", "index", "batch", "stream",
         "shard", "merge", "join", "scan"]


def sentence(seed, j, alt=False):
    w = [WORDS[(seed * 7 + j * 5 + k * 3) % 16] for k in range(1, 6)]
    if alt:
        w[2] = WORDS[(seed + 9) % 16]
    # the unique mid-sentence p{seed} token keeps every seed's content
    # far from every other seed's under 3-shingle Jaccard (~0.54 for
    # otherwise-identical word patterns; a trailing suffix would leave
    # repeated patterns sitting exactly AT the 0.8 threshold)
    return ("the p%d of %s and a %s to the %s in %s %s"
            % (seed, w[1], w[2], w[3], w[4], w[0]))


def sentence_es(seed, j):
    w = [WORDS[(seed * 7 + j * 5 + k * 3) % 16] for k in range(1, 6)]
    return ("el p%d la %s de %s %s %s" % ((seed,) + tuple(w[1:])))


def content_paras(seed, n, lang="en", alt_last=False):
    out = []
    for j in range(n):
        mk = sentence_es if lang == "es" else sentence
        if lang == "en":
            s = sentence(seed, j, alt=(alt_last and j == n - 1))
        else:
            s = mk(seed, j)
        out.append(s)
    return out


def nav_block(d, n_links):
    items = "".join(
        '<li><a href="/page%d">section %s link %d</a></li>'
        % (k, WORDS[(d + k) % 16], k)
        for k in range(n_links))
    return "<nav><ul>%s</ul></nav>" % items


def page(d, paras, extra_navs=0, ckey=None, raw_paras=False):
    # ckey keys every CONTENT-affecting decoration (entity suffixes,
    # inline-link text, the bare-< sentence) so duplicate rows replicate
    # their base's EXTRACTED text exactly while the boilerplate (nav,
    # hrefs, style/script/comment noise, tag casing) stays keyed on d —
    # extraction-keyed duplication, not byte-keyed
    if ckey is None:
        ckey = d
    # deliberate malformations on a deterministic cadence
    open_p = (d % 5 == 2)          # one unclosed <p> (tags only: no text effect)
    upper = (d % 4 == 1)           # uppercase tags
    p_open = "<P>" if upper else "<p>"
    p_close = "</P>" if upper else "</p>"
    body = []
    body.append(nav_block(d, 4 + d % 4))
    for j, text in enumerate(paras):
        # entities + an inline low-density link on some paragraphs
        # (raw_paras: the caller baked every suffix in already — the
        # 300-319 single-block near-dups need the decorations at their
        # BASE token positions, which the j-keyed rules can't express)
        t = text
        if raw_paras:
            body.append(p_open + t + p_close)
            continue
        if j == 0:
            t += " &amp; the &quot;%s&quot; of %s" % (WORDS[ckey % 16],
                                                      WORDS[(ckey + 5) % 16])
        if j == 1 and len(paras) > 1:
            t += ' see <a href=/ref%d>the %s note</a> of it' % (d, WORDS[(ckey + 7) % 16])
        if ckey % 5 == 2 and j == len(paras) - 1 and len(paras) > 1:
            t += " where 3 < %d of the budget" % (5 + ckey % 9)
        if open_p and j == len(paras) - 1:
            body.append(p_open + t)          # never closed
        else:
            body.append(p_open + t + p_close)
    for k in range(extra_navs):
        body.append(nav_block(d + 31 * (k + 1), 5 + (d + k) % 3))
    # r16: a few pages link to 301 SOURCES (doc74 chains to the fetched
    # doc73, doc21 to the never-fetched /doc21/moved) so the frontier's
    # redirect-terminal gate is exercised by the fixture itself
    extra = ('<a href="/doc74">moved archive</a> '
             '<a href="/doc21">old index</a> ' if d % 100 == 3 else '')
    # r17: per-anchor rel=nofollow on a ZERO-TEXT anchor (strips to '' —
    # no extracted-text change anywhere): its /nf{d} target must be
    # flagged in the link table and never scheduled by the frontier
    nf = '<a href="/nf%d" rel="nofollow"></a>' % d if d % 11 == 5 else ''
    body.append('<footer>%s%s<a href="/about">about the site</a> '
                '<a href="/terms">terms of it</a></footer>' % (extra, nf))
    style = "<style>body { color: #%03d; } /* a > b */</style>" % (d % 1000)
    script = ('<script type="text/javascript">var x = "<p>not a tag</p>"; '
              'if (x < %d) { x = x + 1; }</script>' % (d % 97))
    comment = "<!-- generated page %d\n     multi-line comment -->" % d
    # r17 HEAD injections (all tag-only: zero extracted-text change):
    #  - d%53==34: page-level robots meta — noindex (rejected at the
    #    noindex gate) + nofollow (every outlink flagged in links);
    #  - d%53==12: canonical VARIANT — declares the (always-fetched,
    #    d-1 % 53 == 11 -> status 200) previous doc as canonical member:
    #    the election gate rejects this page as canonical_variant;
    #  - d%53==46: canonical hint to a NEVER-FETCHED url (RELATIVE href
    #    — the hint resolves through the RFC 3986 chain): the page
    #    stays, the hint's dst seeds the frontier.
    head_extra = ""
    if d % 53 == 34:
        head_extra += '<meta name="robots" content="noindex, nofollow">'
    if d % 53 == 12:
        head_extra += ('<link rel="canonical" '
                       'href="https://example.com/doc%d">' % (d - 1))
    if d % 53 == 46:
        head_extra += '<link rel="canonical" href="/canon%d">' % d
    return ("<!DOCTYPE html><html><head><title>doc %d</title>"
            "<meta charset=utf-8>%s%s%s</head><body>%s%s%s</body></html>"
            % (d, head_extra, style, script, comment, "".join(body), comment))


def norm_tokens(paras, ckey):
    """The EXTRACTED token stream of a base-population page (the Html
    normalize chain applied by hand: entities decoded, tags stripped,
    whitespace collapsed) — used to engineer/assert the 300-319
    near-dup Jaccard exactly (round-13 lesson: verify survivor
    populations EXACTLY, not 'roughly')."""
    toks = []
    for j, s in enumerate(paras):
        t = s
        if j == 0:
            t += ' & the "%s" of %s' % (WORDS[ckey % 16], WORDS[(ckey + 5) % 16])
        if j == 1 and len(paras) > 1:
            t += " see the %s note of it" % WORDS[(ckey + 7) % 16]
        if ckey % 5 == 2 and j == len(paras) - 1 and len(paras) > 1:
            t += " where 3 < %d of the budget" % (5 + ckey % 9)
        toks.extend(t.split(" "))
    return toks


def shingles3(toks):
    low = [t.lower() for t in toks]
    return set(tuple(low[i:i + 3]) for i in range(len(low) - 2))


def single_block_page(d, seed, change_word):
    """A base page's full EXTRACTED content (suffixes at their original
    token positions, entity-encoded as the base encodes them) as ONE
    paragraph; change_word swaps sentence 1's "a W to" slot (the k=3
    word) for WORDS[(seed+9)%16] — provably != the original
    (7*seed+14)%16 word, since equality would need the odd
    6*seed ≡ -5 (mod 16)."""
    n = 4 + (seed * 3) % 5
    base = content_paras(seed, n)
    alt = list(base)
    if change_word:
        w_orig = WORDS[(seed * 7 + 1 * 5 + 3 * 3) % 16]
        w_alt = WORDS[(seed + 9) % 16]
        assert w_alt != w_orig, (d, w_orig)
        alt[1] = alt[1].replace(" a %s to " % w_orig, " a %s to " % w_alt, 1)
        assert alt[1] != base[1], d
    parts = []
    for j, s in enumerate(alt):
        t = s
        if j == 0:
            t += " &amp; the &quot;%s&quot; of %s" % (WORDS[seed % 16],
                                                      WORDS[(seed + 5) % 16])
        if j == 1:
            t += ' see <a href=/ref%d>the %s note</a> of it' % (
                d, WORDS[(seed + 7) % 16])
        if seed % 5 == 2 and j == n - 1:
            t += " where 3 < %d of the budget" % (5 + seed % 9)
        parts.append(t)
    big = " ".join(parts)
    html = page(d, [big], raw_paras=True)
    # engineered-exactness assertions (round-13 lesson: verify survivor
    # populations EXACTLY): the regrouped block must be longer than any
    # base block (it can never hash-equal one, so it survives paragraph
    # dedup whole); with change_word the doc must clear the integer
    # 3-shingle Jaccard gate 5*|∩| >= 4*|∪| vs its base WITHOUT being
    # exact; without change_word the token stream must be IDENTICAL
    import re as _re
    base_toks = norm_tokens(base, seed)
    raw = big.replace("&amp;", "&").replace("&quot;", '"')
    raw = _re.sub(r"<[^>]*>", " ", raw)
    alt_toks = " ".join(raw.split()).split(" ")
    if change_word:
        assert alt_toks != base_toks, d
        sa, sb = shingles3(base_toks), shingles3(alt_toks)
        inter, union = len(sa & sb), len(sa | sb)
        assert 5 * inter >= 4 * union, (d, inter, union)
    else:
        assert alt_toks == base_toks, d
    assert len(alt_toks) > max(len(s.split(" ")) for s in base) + 11, d
    return html


ids, urls, htmls = [], [], []
for d in range(330):
    if d < 200:
        paras = content_paras(d, 4 + (d * 3) % 5)
        html = page(d, paras)
    elif d < 220:
        paras = content_paras(d - 200, 4 + ((d - 200) * 3) % 5)
        html = page(d, paras, extra_navs=1, ckey=d - 200)  # same CONTENT, other noise
    elif d < 240:
        seed = d - 220
        paras = content_paras(seed, 4 + (seed * 3) % 5, alt_last=True)
        html = page(d, paras, extra_navs=1, ckey=seed)
    elif d < 260:
        # 3 tokens + the 5-token entity suffix = 8 < 10: quality-dropped
        html = page(d, ["p%d of %s" % (d, WORDS[d % 16])])
    elif d < 280:
        paras = content_paras(d, 4 + (d * 3) % 5, lang="es")
        html = page(d, paras)
    elif d < 300:
        html = page(d, [], extra_navs=3)       # link farm, no content
    elif d < 320:
        html = single_block_page(d, d - 260, change_word=True)
    else:
        html = single_block_page(d, d - 300, change_word=False)
    ids.append(d)
    urls.append("https://example.com/doc%d" % d)
    htmls.append(html)

table = pa.table({
    "doc_id": pa.array(ids, pa.int64()),
    "url": pa.array(urls, pa.string()),
    "html": pa.array(htmls, pa.string()),
})
pq.write_table(table, os.path.join(OUT, "html_docs.parquet"))
print("wrote", os.path.join(OUT, "html_docs.parquet"), table.num_rows, "rows")
