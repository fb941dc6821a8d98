#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB on the same parquet tables and compare per-query.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def _canon(series):
    """Canonical per-cell string, dtype-sensitive the way a serialized hash
    is: ints render without a decimal point, floats with one, so an
    int64/float64 representation split on equal values is caught."""
    out = []
    for v in series.tolist():
        if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
            out.append("NULL")
        elif isinstance(v, (bytes, bytearray)):
            out.append("0x" + bytes(v).hex())
        elif isinstance(v, bool):
            out.append("true" if v else "false")
        elif isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            out.append("[" + ",".join(str(x) for x in v) + "]")
        else:
            out.append(str(v))
    return out

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        got = pd.read_parquet(spark_path)
        want = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gс = sorted(got.columns); wc = sorted(want.columns)
    if gс != wc:
        print(f"FAIL {name}: columns {gс} vs {wc}"); fails += 1; continue
    got, want = got[gс], want[gс]
    if len(got) != len(want):
        print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); fails += 1; continue
    # normalize dtypes (timestamps → ns, ints → int64) then value-compare
    mism = []
    for c in gс:
        g, w = got[c], want[c]
        try:
            if str(g.dtype).startswith("datetime") or str(w.dtype).startswith("datetime"):
                g = pd.to_datetime(g).astype("datetime64[us]")
                w = pd.to_datetime(w).astype("datetime64[us]")
            eq = (g.values == w.values) | (pd.isna(g).values & pd.isna(w).values)
            if not eq.all():
                i = int((~eq).argmax())
                mism.append(f"col {c} row {i}: {g.iloc[i]!r} vs {w.iloc[i]!r} ({(~eq).sum()} diffs)")
                continue
            # representation-strict pass (mirrors the driver's value hash):
            # equal values with different canonical forms — e.g. DuckDB
            # HUGEINT→float64 "3.0" vs Spark BIGINT "3" — must fail here too.
            gc_, wc_ = _canon(g), _canon(w)
            if gc_ != wc_:
                i = next(j for j in range(len(gc_)) if gc_[j] != wc_[j])
                mism.append(
                    f"col {c} row {i}: repr {gc_[i]!r} vs {wc_[i]!r}"
                    f" (dtypes {g.dtype} vs {w.dtype})")
        except Exception as e:
            mism.append(f"col {c}: compare error {e}")
    if mism:
        print(f"FAIL {name}: " + "; ".join(mism[:3])); fails += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
