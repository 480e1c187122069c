#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tool only, not part of
the library). Usage:

    python3 tools/check.py [sfdir] [verify_outdir]

Reads each Verify-written result parquet + oracle_sql.json, runs the oracle in
DuckDB over the same source tables, and diffs after sorting columns by name
and rows by all columns."""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow.parquet as pq

# int64-nanosecond horizon: the driver's hash path reads the Spark result
# parquet through Arrow, which decodes timestamps as int64 NANOSECONDS
# (max 2262-04-11T23:47:16.854775807). A value past it (e.g. a 9999-12-31
# SCD2 sentinel) silently WRAPS under that reader while the DuckDB read
# below yields the true value — hash mismatch with rows/schema matching
# (round-11 q275). This gate therefore inspects every timestamp column of
# the ACTUAL spark artifact through pyarrow before the DuckDB-based value
# compare. The comparison is on RAW epoch integers (never a pd.Timestamp
# round-trip, which itself raises OutOfBoundsDatetime for exactly the
# values this gate exists to catch), against the exact horizon.
NS_HORIZON_US = (2**63 - 1) // 1000  # int64-ns max, expressed in micros

def ns_violation(result_glob: str):
    """Returns an error string if any timestamp column in the spark result
    parquet holds a value past the int64-ns horizon (driver-path hazard)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    for f in glob.glob(result_glob):
        t = pq.read_table(f)
        for i, field in enumerate(t.schema):
            if str(field.type).startswith("timestamp"):
                col = t.column(i)
                if len(col) == 0:
                    continue
                # raw epoch micros as int64 — total, no datetime round-trip
                unit = field.type.unit
                scale = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[unit]
                mx = pc.max(col.cast(pa.int64())).as_py()
                if mx is None:
                    continue
                mx_us = mx // 1000 if unit == "ns" else mx * scale
                if mx_us > NS_HORIZON_US:
                    return (f"ns-portability: column {field.name} max epoch-us {mx_us} "
                            f"is past 2262-04-11T23:47:16.854775Z (int64-ns horizon; "
                            f"wraps under the driver's arrow hash read)")
    return None

def stale_violation(result_glob: str, source_mtime: float):
    """Returns an error string if the result artifact predates the newest
    source (fixture/testdata) file — a stale Verify outdir produces
    confusing diffs against regenerated fixtures (round-12 q245 episode)."""
    files = glob.glob(result_glob)
    if not files:
        return "no result parquet found (Verify not run for this query?)"
    newest = max(os.path.getmtime(f) for f in files)
    if newest < source_mtime:
        return (f"stale result: artifact mtime {newest:.0f} predates newest "
                f"source fixture mtime {source_mtime:.0f} — re-run Verify")
    return None

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

# newest source-data mtime: sf tables + repo fixtures. Results older than
# this are stale by construction (Verify reads these inputs).
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_source_files = glob.glob(f"{sfdir}/*.parquet") + [
    os.path.join(dp, fn)
    for dp, _, fns in os.walk(os.path.join(_repo_root, "fixtures"))
    for fn in fns]
source_mtime = max((os.path.getmtime(f) for f in _source_files), default=0.0)

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

n_pass = n_fail = 0
for name in sorted(oracles):
    sql = oracles[name]
    try:
        viol = (stale_violation(f"{outdir}/{name}/*.parquet", source_mtime)
                or ns_violation(f"{outdir}/{name}/*.parquet"))
        if viol:
            print(f"FAIL {name}: {viol}")
            n_fail += 1
            continue
        spark_df = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        oracle_df = con.execute(sql).df()
        a, b = norm(spark_df), norm(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
            continue
        dtypes_a = [str(t) for t in a.dtypes]
        dtypes_b = [str(t) for t in b.dtypes]
        if dtypes_a != dtypes_b:
            print(f"WARN {name}: dtypes {dtypes_a} vs {dtypes_b}")
        eq = a.equals(b)
        if not eq:
            # find first differing cell
            diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
            for c in diff_cols[:3]:
                mism = a[c] != b[c]
                mism &= ~(a[c].isna() & b[c].isna())
                idx = mism[mism].index[:3]
                for i in idx:
                    print(f"  diff {name}.{c}[{i}]: spark={a[c][i]!r} oracle={b[c][i]!r}")
            print(f"FAIL {name}: values differ in {diff_cols}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}")
        n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail of {len(oracles)}")
sys.exit(1 if n_fail else 0)
