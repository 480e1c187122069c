#!/usr/bin/env python3
"""Charset WARC fixture: pages whose HTTP bodies are NOT utf-8 — the
legacy ~10-20% of any real crawl. PACK-AND-RECOVER with a stored
expectation: warc_charset_pages.parquet holds (url, charset, text) —
the canonical charset label the engine must REPORT and the decoded text
it must RECOVER from the raw container bytes; warc_charset_shards.parquet
is the WARC/1.0 shard packing those pages through each declaration path:

  group A (0-9)   Content-Type header declares windows-1252
  group B (10-19) header is bare text/html; <meta charset=iso-8859-1>
  group C (20-29) header bare; <meta http-equiv Content-Type ... Shift_JIS>
  group D (30-34) NO declaration anywhere, body is valid UTF-8 (CJK +
                  accents) -> strict-utf-8 path
  group E (35-39) NO declaration, body is windows-1252 bytes (0xE9 etc.,
                  malformed as utf-8) -> the windows-1252 fallback
  group F (40-44) header declares utf-8 in QUOTED form (charset="utf-8")
  group G (45-49) header declares EUC-KR (hangul) — CJK ladder, r15
  group H (50-54) <meta charset=gb18030> (simplified hanzi)
  group I (55-59) header declares Big5 (traditional hanzi)
  group J (60-62) header declares GBK — canonical label "gbk"
  group K (63-64) header declares gb2312 — the WHATWG rule maps the
                  label to GBK, so the canonical label is "gbk"

Shift_JIS texts avoid the codepoints whose mappings differ between
Shift_JIS variants (wave dash, backslash/yen) - plain kana + common
kanji only, so Python shift_jis and Java Shift_JIS agree byte-for-byte.
The CJK texts stick to everyday hangul/hanzi for the same reason:
Python euc_kr/gbk/gb18030/big5 and the JVM charsets of the same names
agree byte-for-byte on these ranges.
"""
import pathlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT_SHARDS = ROOT / "fixtures" / "warc_charset_shards.parquet"
OUT_PAGES = ROOT / "fixtures" / "warc_charset_pages.parquet"

WORDS = ["data", "model", "corpus", "quality", "stream", "index"]


def body_html(i, text, meta=""):
    return ("<!DOCTYPE html><html><head><title>page %d</title>%s</head>"
            "<body><p>%s</p></body></html>" % (i, meta, text))


pages = []  # (url, declared_ct, meta, body_text, encoding, canonical_label)
for i in range(65):
    w = WORDS[i % 6]
    if i < 10:  # header-declared windows-1252: smart quotes + accents
        text = "the “%s” café résumé of p%d – déjà vu" % (w, i)
        pages.append((i, "text/html; charset=windows-1252", "", text,
                      "cp1252", "windows-1252"))
    elif i < 20:  # meta-declared latin-1
        text = "el p%d señor %s ètude über café" % (i, w)
        pages.append((i, "text/html",
                      "<meta charset=iso-8859-1>", text, "latin-1", "iso-8859-1"))
    elif i < 30:  # meta http-equiv Shift_JIS: kana + common kanji
        text = "p%d の データ %s 品質 と 検索" % (i, w)
        pages.append((i, "text/html",
                      '<meta http-equiv="Content-Type" '
                      'content="text/html; charset=Shift_JIS">',
                      text, "shift_jis", "shift_jis"))
    elif i < 35:  # undeclared, valid utf-8 (strict path)
        text = "p%d café 中文 %s über — ok" % (i, w)
        pages.append((i, "text/html", "", text, "utf-8", "utf-8"))
    elif i < 40:  # undeclared windows-1252 bytes -> fallback path
        text = "p%d résumé “%s” fallback café" % (i, w)
        pages.append((i, "text/html", "", text, "cp1252", "windows-1252"))
    elif i < 45:  # quoted utf-8 declaration
        text = "p%d café %s declared ✓" % (i, w)
        pages.append((i, 'text/html; charset="utf-8"', "", text,
                      "utf-8", "utf-8"))
    elif i < 50:  # header-declared EUC-KR: everyday hangul
        text = "p%d 데이터 품질 %s 말뭉치 검색" % (i, w)
        pages.append((i, "text/html; charset=EUC-KR", "", text,
                      "euc_kr", "euc-kr"))
    elif i < 55:  # meta-declared gb18030: simplified hanzi
        text = "p%d 数据 质量 %s 语料 索引" % (i, w)
        pages.append((i, "text/html", "<meta charset=gb18030>", text,
                      "gb18030", "gb18030"))
    elif i < 60:  # header-declared Big5: traditional hanzi
        text = "p%d 資料 品質 %s 語料 索引" % (i, w)
        pages.append((i, "text/html; charset=Big5", "", text,
                      "big5", "big5"))
    elif i < 63:  # header-declared GBK
        text = "p%d 数据 模型 %s 训练" % (i, w)
        pages.append((i, "text/html; charset=GBK", "", text,
                      "gbk", "gbk"))
    else:  # gb2312 label -> GBK decode (the WHATWG rule); gb2312 bytes
        # are a GBK subset, so encoding with gb2312 keeps the pack honest
        text = "p%d 数据 集合 %s 清洗" % (i, w)
        pages.append((i, "text/html; charset=gb2312", "", text,
                      "gb2312", "gbk"))


def record(warc_type, headers, block):
    h = [("WARC-Type", warc_type)] + headers + [("Content-Length", str(len(block)))]
    head = "WARC/1.0\r\n" + "".join("%s: %s\r\n" % (k, v) for k, v in h) + "\r\n"
    return head.encode("ascii") + block + b"\r\n\r\n"


buf = bytearray()
urls, labels, texts = [], [], []
for i, ct, meta, text, enc, label in pages:
    url = "https://legacy.example.org/page%d" % i
    html = body_html(i, text, meta)
    body = html.encode(enc)
    http = ("HTTP/1.1 200 OK\r\nContent-Type: %s\r\nContent-Length: %d\r\n\r\n"
            % (ct, len(body))).encode("ascii") + body
    buf += record("response",
                  [("WARC-Target-URI", url),
                   ("WARC-Date", "2026-08-01T00:%02d:00Z" % (i % 60)),
                   ("WARC-Record-ID", "<urn:graft:cs-%d>" % i),
                   ("Content-Type", "application/http; msgtype=response")],
                  http)
    urls.append(url)
    labels.append(label)
    # the stored EXPECTATION is the decoded text of the whole body
    texts.append(html)

pq.write_table(pa.table({
    "shard_id": pa.array([0], pa.int64()),
    "gz": pa.array([False], pa.bool_()),
    "payload": pa.array([bytes(buf)], pa.binary()),
}), OUT_SHARDS)
pq.write_table(pa.table({
    "url": pa.array(urls, pa.string()),
    "charset": pa.array(labels, pa.string()),
    "text": pa.array(texts, pa.string()),
}), OUT_PAGES)
print("wrote %s (1 shard, %d pages) and %s" % (OUT_SHARDS, len(pages), OUT_PAGES))
