#!/usr/bin/env python3
"""Public-suffix-list fixture: a PSL-SHAPED table (~7.6k rows) replacing
the 7-suffix pin in graft.operators.Url. Generated deterministically
(zero egress, so not the real publicsuffix.org list — the same shape and
scale): every 2-letter country code with the common second-level
registry labels (co.uk-style), the bare ccTLDs, a block of common gTLDs,
and a few deep 3-label registry suffixes (the parts a longest-match
implementation must get right). One column: suffix.

Semantics pinned by the engine + oracle (documented in Url.scala):
registrable domain = one label + the LONGEST listed suffix the host ends
with on a label boundary; a host that IS a suffix maps to itself; a host
whose TLD is unlisted falls back to the last two labels.
"""
import pathlib
import string

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = pathlib.Path(__file__).resolve().parent.parent
OUT = ROOT / "fixtures" / "psl.parquet"

suffixes = []

# bare ccTLDs: aa..zz
cc = ["".join((a, b)) for a in string.ascii_lowercase for b in string.ascii_lowercase]
suffixes += cc

# second-level registry labels under every cc (the co.uk family)
for c in cc:
    for sld in ("co", "com", "org", "net", "ac", "gov", "edu", "sch", "mil"):
        suffixes.append("%s.%s" % (sld, c))

# common gTLDs
suffixes += ["com", "org", "net", "info", "biz", "io", "dev", "app",
             "xyz", "online", "site", "shop", "blog", "cloud", "ai"]

# deep 3-label registry suffixes (longest-match must pick these over
# their 2-label parents, which are ALSO listed)
for c in ("uk", "jp", "au", "nz", "br"):
    for a in ("city", "pref", "metro"):
        suffixes.append("%s.go.%s" % (a, c))
        suffixes.append("go.%s" % c)

suffixes = sorted(set(suffixes))
pq.write_table(pa.table({"suffix": pa.array(suffixes, pa.string())}), OUT)
print("wrote %s: %d suffixes" % (OUT, len(suffixes)))
