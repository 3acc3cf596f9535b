#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's t2 gate: for each query with an oracle, run the SQL in
DuckDB over the testdata parquet tables, load the Spark result parquet, sort
columns by name, sort rows, and compare values exactly (with a float report
for near-misses). Usage: compare_oracle.py <sfdir> <verify_outdir>
"""
import json, sys, glob, math
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    # normalize: sort columns by name, then rows by all columns
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        print(f"FAIL {name}: columns differ spark={scols} oracle={ocols}")
        fail += 1
        continue
    odf, sdf = odf[ocols], sdf[scols]
    if len(odf) != len(sdf):
        print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
        fail += 1
        continue
    o = odf.sort_values(by=ocols, ignore_index=True)
    s = sdf.sort_values(by=scols, ignore_index=True)
    bad = []
    for c in ocols:
        oc, sc = o[c], s[c]
        # the driver's hash is dtype-sensitive: DuckDB HUGEINT sums become
        # float64 in pandas while Spark writes int64, and the driver fails on
        # the 99111.0-vs-99111 formatting even when values match (round 1:
        # q_json_extract, q_sessionize). Mirror that by failing on any
        # numeric-kind mismatch before the value compare.
        okind, skind = oc.dtype.kind, sc.dtype.kind
        if okind != skind and {okind, skind} != {"i", "u"}:
            bad.append((c, f"dtype kind mismatch oracle={oc.dtype} spark={sc.dtype}"))
            continue
        if str(oc.dtype).startswith("datetime") or str(sc.dtype).startswith("datetime"):
            oc = pd.to_datetime(oc).astype("datetime64[us]")
            sc = pd.to_datetime(sc).astype("datetime64[us]")
            if not oc.equals(sc):
                bad.append((c, "ts mismatch"))
        elif oc.dtype.kind == "f" or sc.dtype.kind == "f":
            diff = (oc.astype(float) - sc.astype(float)).abs()
            mx = diff.max()
            if mx > 0:
                exact = (diff == 0).mean()
                bad.append((c, f"max abs diff {mx:.3e}, exact frac {exact:.4f}"))
        else:
            if not oc.astype(object).equals(sc.astype(object)):
                neq = (oc.astype(object) != sc.astype(object)).sum()
                bad.append((c, f"{neq} values differ"))
    if bad:
        print(f"FAIL {name}: {bad}")
        fail += 1
    else:
        print(f"OK   {name} ({len(o)} rows)")
print(f"\n{len(oracle)-fail}/{len(oracle)} oracles match")
sys.exit(1 if fail else 0)
