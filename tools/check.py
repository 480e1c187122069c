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
# (max 2262-04-11). A value past it (e.g. a 9999-12-31 SCD2 sentinel)
# silently WRAPS under that reader while the DuckDB read below yields the
# true value — hash mismatch with rows/schema matching (round-11 q275).
# This gate therefore inspects every timestamp column of the ACTUAL spark
# artifact through pyarrow before the DuckDB-based value compare.
NS_HORIZON = pd.Timestamp("2262-04-11")

def ns_violation(result_glob: str):
    """Returns an error string if any timestamp column in the spark result
    parquet holds a value past the int64-ns horizon (driver-path hazard)."""
    import pyarrow.compute as pc
    for f in glob.glob(result_glob):
        t = pq.read_table(f)
        for i, field in enumerate(t.schema):
            if str(field.type).startswith("timestamp"):
                col = t.column(i)
                if len(col) == 0:
                    continue
                mx = pc.max(col).as_py()
                if mx is not None and pd.Timestamp(mx) > NS_HORIZON:
                    return (f"ns-portability: column {field.name} max {mx} is past "
                            f"2262-04-11 (int64-ns horizon; wraps under the driver's "
                            f"arrow hash read)")
    return None

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))

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
        viol = ns_violation(f"{outdir}/{name}/*.parquet")
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
