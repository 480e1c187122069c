#!/usr/bin/env python3
"""PDF fixture: 40 real (minimal) PDF documents whose text the engine
must recover from the BYTES — object scan, page-tree walk in /Kids
order, /Contents resolution (single ref AND ref arrays), FlateDecode
inflate, and text-operator tokenization (Tj, ' and TJ arrays, string
escapes, nested balanced parens, octal, line continuation). The parquet
stores the expected text/n_pages as independent columns (the q33/q130
decode-vs-stored-metadata convention): matching proves the byte walk.

Populations:
- 0-29: FlateDecode streams, 1-3 pages (doc_id%3+1), one Tj per sentence;
  page 2 of every 3-page doc uses a /Contents ARRAY of two streams.
- 30-33: uncompressed streams (no /Filter).
- 34: TJ arrays with kerning numbers splitting words mid-token.
- 35: escapes — \\( \\) \\\\, octal \\101, line continuation, nested
  balanced parens, \\t tab.
- 36: same TEXT as pdf 0, uncompressed + different layout (dedup bait).
- 37: same TEXT as pdf 1, TJ-split (dedup bait).
- 38: an IMAGE XObject stream (/DCTDecode garbage) in the file that the
  page does NOT reference — a ref-resolution walk skips it, a
  grab-every-stream walk corrupts the text.
- 39: malformed — the only page's stream is truncated mid-deflate:
  expected n_pages=0, text=''.
- 40-42: PDF 1.5 OBJECT STREAMS — catalog/pages/page dicts packed inside
  a /Type /ObjStm stream (the layout modern writers emit; they never
  appear as top-level objects), content streams top-level (spec forbids
  streams inside an ObjStm). 1/2/3 pages.
- 43: same TEXT as pdf 2 in ObjStm layout (cross-variant dedup bait —
  classic and ObjStm packings must collapse at the text level).
- 44: malformed ObjStm (decreasing member offsets): the member set is
  dropped whole — no catalog/pages reachable, n_pages=0, text=''.

Kids-order trap: every 3-page doc lists /Kids in (3rd,1st,2nd) page
order; expected text follows /Kids order, not object order.
"""
import pathlib
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "pdf_docs.parquet"

WORDS = ["ledger", "harbor", "quartz", "meadow", "signal", "copper",
         "willow", "ember", "falcon", "tundra", "cobalt", "prism"]


def sent(seed, j):
    # unique mid-sentence token p{seed}x{j}: repeats can never collide
    a = WORDS[(seed * 7 + j) % 12]
    b = WORDS[(seed * 5 + j * 3 + 1) % 12]
    c = WORDS[(seed + j * 11 + 5) % 12]
    return f"{a} p{seed}x{j} {b} {c} row"


def content_stream(sentences):
    ops = ["BT /F1 12 Tf 72 720 Td"]
    for s in sentences:
        esc = s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(f"({esc}) Tj 0 -14 Td")
    ops.append("ET")
    return " ".join(ops).encode("latin-1")


def obj(num, body):
    return f"{num} 0 obj\n".encode("latin-1") + body + b"\nendobj\n"


def stream_obj(num, data, flate=True, filt=None):
    enc = zlib.compress(data, 6) if flate else data
    f = " /Filter /FlateDecode" if flate else (f" /Filter {filt}" if filt else "")
    return obj(num, f"<< /Length {len(enc)}{f} >>\nstream\n".encode("latin-1")
               + enc + b"\nendstream")


def build_pdf(objects, root=1):
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    for o in objects:
        out += o
    out += f"trailer\n<< /Root {root} 0 R >>\n%%EOF\n".encode("latin-1")
    return bytes(out)


def simple_pdf(page_streams, extra_objects=b"", kids_rotate=False):
    """page_streams: list per page of list of raw content bytes (each
    inner list becomes a /Contents array when len>1)."""
    objects = []
    next_num = 3
    page_nums, content_chunks = [], []
    for streams in page_streams:
        cnums = []
        for _ in streams:
            cnums.append(next_num + 1 + len(cnums))
        page_nums.append((next_num, cnums))
        next_num += 1 + len(streams)
    kids = [p for p, _ in page_nums]
    if kids_rotate and len(kids) > 1:
        kids = kids[-1:] + kids[:-1]  # /Kids order != object order
    objects.append(obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"))
    objects.append(obj(2, ("<< /Type /Pages /Kids ["
                           + " ".join(f"{k} 0 R" for k in kids)
                           + f"] /Count {len(kids)} >>").encode("latin-1")))
    for (pnum, cnums), streams in zip(page_nums, page_streams):
        cont = (f"{cnums[0]} 0 R" if len(cnums) == 1
                else "[" + " ".join(f"{c} 0 R" for c in cnums) + "]")
        objects.append(obj(pnum, (f"<< /Type /Page /Parent 2 0 R /Contents {cont} >>")
                           .encode("latin-1")))
        for cn, data in zip(cnums, streams):
            objects.append(data(cn))
    if extra_objects:
        objects.append(extra_objects)
    return build_pdf(objects), kids, {p: c for p, c in page_nums}


ids, payloads, n_pagess, texts, n_bytess = [], [], [], [], []


def emit(pdf_id, payload, n_pages, text):
    ids.append(pdf_id)
    payloads.append(payload)
    n_pagess.append(n_pages)
    texts.append(text)
    n_bytess.append(len(payload))


def flate_stream(sentences):
    return lambda n: stream_obj(n, content_stream(sentences), flate=True)


def raw_stream(sentences):
    return lambda n: stream_obj(n, content_stream(sentences), flate=False)


# ---- 0-29: flate, 1-3 pages, kids rotated on 3-page docs
for d in range(30):
    npages = d % 3 + 1
    page_sents = [[sent(d, p * 4 + j) for j in range(3)] for p in range(npages)]
    page_streams = []
    for p, ss in enumerate(page_sents):
        if npages == 3 and p == 1:
            # /Contents ARRAY: two streams split the page's sentences
            page_streams.append([flate_stream(ss[:2]), flate_stream(ss[2:])])
        else:
            page_streams.append([flate_stream(ss)])
    pdf, kids, pmap = simple_pdf(page_streams, kids_rotate=(npages == 3))
    # expected text follows /Kids order
    order = [list(pmap).index(k) for k in kids]
    text = " ".join(" ".join(page_sents[i]) for i in order)
    emit(d, pdf, npages, text)

# ---- 30-33: uncompressed
for d in range(30, 34):
    ss = [sent(d, j) for j in range(4)]
    pdf, _, _ = simple_pdf([[raw_stream(ss)]])
    emit(d, pdf, 1, " ".join(ss))

# ---- 34: TJ arrays with kerning splits
tj_content = (b"BT /F1 12 Tf 72 720 Td "
              b"[ (led) -120 (ger p34x0 har) 30 (bor quartz row) ] TJ "
              b"0 -14 Td [ (meadow p34x1) ( signal copper row) ] TJ ET")
pdf34, _, _ = simple_pdf([[lambda n: stream_obj(n, tj_content, flate=True)]])
emit(34, pdf34, 1,
     "ledger p34x0 harbor quartz row meadow p34x1 signal copper row")

# ---- 35: escapes, octal, continuation, nested parens, ' operator
esc_content = (b"BT /F1 12 Tf 72 720 Td "
              b"(call f\\(x\\) \\\\ back p35x0) Tj "
              b"0 -14 Td ((nested (deep)) ok) Tj "
              b"0 -14 Td (\\101\\102 tab\\there) Tj "
              b"0 -14 Td (contin\\\nued p35x1) ' ET")
pdf35, _, _ = simple_pdf([[lambda n: stream_obj(n, esc_content, flate=True)]])
emit(35, pdf35, 1,
     "call f(x) \\ back p35x0 (nested (deep)) ok AB tab\there continued p35x1")

# ---- 36: text of pdf 0, uncompressed, different layout (one sentence per line op)
text0 = texts[0]
alt = ("BT /F1 9 Tf 50 700 Td (" +
       text0.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)") +
       ") Tj ET").encode("latin-1")
pdf36, _, _ = simple_pdf([[lambda n: stream_obj(n, alt, flate=False)]])
emit(36, pdf36, 1, text0)

# ---- 37: text of pdf 1, TJ-split across array elements
text1 = texts[1]
halves = [text1[:len(text1) // 2], text1[len(text1) // 2:]]
tj37 = ("BT /F1 12 Tf 72 720 Td [ ("
        + halves[0].replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        + ") -55 ("
        + halves[1].replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        + ") ] TJ ET").encode("latin-1")
pdf37, _, _ = simple_pdf([[lambda n: stream_obj(n, tj37, flate=True)]])
emit(37, pdf37, 1, text1)

# ---- 38: unreferenced IMAGE stream in the file
ss38 = [sent(38, j) for j in range(3)]
img_garbage = bytes((i * 37 + 11) % 256 for i in range(400))
img_obj = stream_obj(90, img_garbage, flate=False, filt="/DCTDecode")
pdf38, _, _ = simple_pdf([[flate_stream(ss38)]], extra_objects=img_obj)
emit(38, pdf38, 1, " ".join(ss38))

# ---- 39: truncated deflate stream -> page undecodable
good = zlib.compress(content_stream([sent(39, 0)]), 6)
trunc = good[: len(good) // 2]
bad_obj = obj(4, f"<< /Length {len(trunc)} /Filter /FlateDecode >>\nstream\n"
              .encode("latin-1") + trunc + b"\nendstream")
pdf39 = build_pdf([
    obj(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
    obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
    obj(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"),
    bad_obj])
emit(39, pdf39, 0, "")

# ---- 40-44: PDF 1.5 object streams (/ObjStm)
def objstm_pdf(page_sents, malformed=False):
    npages = len(page_sents)
    page_nums = [3 + i for i in range(npages)]
    content_nums = [3 + npages + i for i in range(npages)]
    members = [(1, b"<< /Type /Catalog /Pages 2 0 R >>"),
               (2, ("<< /Type /Pages /Kids ["
                    + " ".join(f"{k} 0 R" for k in page_nums)
                    + f"] /Count {npages} >>").encode("latin-1"))]
    for pn, cn in zip(page_nums, content_nums):
        members.append((pn, f"<< /Type /Page /Parent 2 0 R /Contents {cn} 0 R >>"
                        .encode("latin-1")))
    offs, acc = [], 0
    for _, b in members:
        offs.append(acc)
        acc += len(b) + 1
    if malformed:
        offs = list(reversed(offs))  # decreasing: members dropped whole
    header = (" ".join(f"{num} {off}"
                       for (num, _), off in zip(members, offs)) + " ").encode("latin-1")
    data = header + b"".join(b + b" " for _, b in members)
    enc = zlib.compress(data, 6)
    objstm = obj(50, (f"<< /Type /ObjStm /N {len(members)} /First {len(header)}"
                      f" /Length {len(enc)} /Filter /FlateDecode >>\nstream\n")
                 .encode("latin-1") + enc + b"\nendstream")
    objects = [objstm]
    for cn, ss in zip(content_nums, page_sents):
        objects.append(stream_obj(cn, content_stream(ss), flate=True))
    return build_pdf(objects)


for d in range(40, 43):
    npages = d - 39
    page_sents = [[sent(d, p * 4 + j) for j in range(3)] for p in range(npages)]
    emit(d, objstm_pdf(page_sents), npages,
         " ".join(" ".join(ss) for ss in page_sents))

# 43: the text of pdf 2 (a 3-page classic doc) as ONE ObjStm page
emit(43, objstm_pdf([[texts[2]]]), 1, texts[2])

# 44: malformed ObjStm header -> nothing reachable
emit(44, objstm_pdf([[sent(44, 0)]], malformed=True), 0, "")

table = pa.table({
    "pdf_id": pa.array(ids, pa.int64()),
    "payload": pa.array(payloads, pa.binary()),
    "n_pages": pa.array(n_pagess, pa.int64()),
    "text": pa.array(texts, pa.string()),
    "n_bytes": pa.array(n_bytess, pa.int64()),
})
pq.write_table(table, OUT)
print(f"wrote {OUT}: {len(ids)} pdfs, {sum(n_bytess)} bytes, "
      f"{sum(n_pagess)} decodable pages")
