#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py [sfDir] [outDir]

Reads each Spark result parquet written by `graft.Verify` from outDir,
runs the matching oracle SQL from outDir/oracle_sql.json in DuckDB over
the sfDir tables, and compares: row count, column names, and values
(exact for non-floats; floats must match to the last bit, with the max
abs diff reported when they don't).
"""
import json
import math
import sys

import duckdb

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUTDIR = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SFDIR}/{t}.parquet')")
    with open(f"{OUTDIR}/oracle_sql.json") as f:
        oracles = json.load(f)

    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(
                f"SELECT * FROM read_parquet('{OUTDIR}/{name}/*.parquet')")
            spark_cols = list(rel.columns)
            spark_types = [str(t) for t in rel.types]
            spark_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        try:
            rel = con.sql(sql)
            oracle_cols = list(rel.columns)
            oracle_types = [str(t) for t in rel.types]
            oracle_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {str(e)[:300]}")
            failures += 1
            continue

        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: columns differ\n  spark:  {sorted(spark_cols)}\n  oracle: {sorted(oracle_cols)}")
            failures += 1
            continue

        # The driver's hash-compare is type-sensitive (e.g. DuckDB HUGEINT
        # vs Spark int64) — compare the DuckDB logical types too.
        stypes = dict(zip(spark_cols, spark_types))
        otypes = dict(zip(oracle_cols, oracle_types))
        mismatched = {c: (stypes[c], otypes[c]) for c in stypes
                      if stypes[c] != otypes[c]}
        if mismatched:
            print(f"FAIL {name}: column types differ: {mismatched}")
            failures += 1
            continue
        if len(spark_rows) != len(oracle_rows):
            print(f"FAIL {name}: row count spark={len(spark_rows)} oracle={len(oracle_rows)}")
            failures += 1
            continue

        # align column order by name, then sort rows for a stable compare
        sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
        oidx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        skey = sorted((tuple(str(r[i]) for i in sidx) for r in spark_rows))
        okey = sorted((tuple(str(r[i]) for i in oidx) for r in oracle_rows))

        if skey == okey:
            print(f"PASS {name}: {len(spark_rows)} rows")
            continue

        # find first diff + max float divergence for diagnosis
        max_diff, n_diff, example = 0.0, 0, None
        for a, b in zip(skey, okey):
            if a != b:
                n_diff += 1
                if example is None:
                    example = (a, b)
                for x, y in zip(a, b):
                    try:
                        fx, fy = float(x), float(y)
                        if not (math.isnan(fx) and math.isnan(fy)):
                            max_diff = max(max_diff, abs(fx - fy))
                    except ValueError:
                        pass
        print(f"FAIL {name}: {n_diff}/{len(skey)} rows differ, max float diff {max_diff:.3e}")
        if example:
            print(f"  spark:  {example[0]}\n  oracle: {example[1]}")
        failures += 1

    print(f"\n{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} ({len(oracles)} oracle-checked queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
