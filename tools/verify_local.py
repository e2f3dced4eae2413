#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/verify_local.py <sfDir> <outDir>

For each query in <outDir>/oracle_sql.json: run the oracle SQL in DuckDB
(views named after the parquet tables in <sfDir>), load the Spark result
parquet, sort columns by name + rows by all columns, and compare values
exactly. Reports per-query PASS/FAIL with the first differing cell.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True,
                            key=lambda s: s.astype(str))
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    produced = {os.path.basename(d) for d in glob.glob(f"{out_dir}/*")
                if os.path.isdir(d)}
    for name in sorted(produced):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"[FAIL] {name}: spark wrote no parquet")
            n_fail += 1
            continue
        # Load the Spark result with pyarrow/pandas (NOT through duckdb):
        # the driver's hash compare reads it this way, and pyarrow keeps
        # DECIMAL columns as Decimal objects while duckdb's df() coerces
        # them to float64 — going through duckdb masked exactly the
        # canonicalization divergence that failed round 1's hash gate.
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                             ignore_index=True)

        # DECIMAL output columns are a HARD FAILURE, not a warning: the
        # driver's hash gate canonicalizes arrow Decimals differently per
        # side, and round 15 shipped three value-correct gates that failed
        # the driver on exactly this. Bound order-free sums into BIGINT
        # (SUM(h60 % 2^40), the exportManifest spelling) or cast to
        # DOUBLE/STRING on both sides before the gate.
        decimal_fail = []

        def check_decimals(df, side):
            deci = [c for c in df.columns
                    if df[c].map(lambda v: type(v).__name__).eq("Decimal").any()]
            if deci:
                print(f"[FAIL] {name}: DECIMAL {side} columns {deci} — "
                      f"hash-gate mismatch; bound to BIGINT (mod 2^40) or "
                      f"cast to DOUBLE on both sides")
                decimal_fail.append(side)

        if name not in oracles:
            print(f"[rows-only] {name}: {len(spark_df)} rows (no oracle)")
            continue
        check_decimals(spark_df, "spark")
        try:
            # Fetch the oracle through arrow -> pandas, the SAME path the
            # Spark result takes: duckdb's .df() coerces DECIMAL to float64
            # and DATE to datetime64, silently hiding canonicalization
            # divergence that the hash gate would catch.
            oracle_df = con.sql(oracles[name]).arrow().to_pandas()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        check_decimals(oracle_df, "oracle")
        if decimal_fail:
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"[FAIL] {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"[FAIL] {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        # exact value compare (string canonicalization mirrors hash compare)
        diff = None
        for c in a.columns:
            av, bv = a[c].astype(str), b[c].astype(str)
            neq = av != bv
            if neq.any():
                i = neq.idxmax()
                diff = (c, i, av[i], bv[i])
                break
        if diff:
            c, i, av, bv = diff
            print(f"[FAIL] {name}: col={c} row={i} spark={av!r} oracle={bv!r}")
            n_fail += 1
        else:
            print(f"[PASS] {name}: {len(a)} rows, {len(a.columns)} cols")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail, "
          f"{len(produced) - n_pass - n_fail} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    sys.exit(main(sf, out))
