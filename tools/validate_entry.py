"""Local stand-in for the driver's correctness gate: run every
__spark_entry__ query AND its DuckDB oracle at a given sf dir, compare
row count, column names, and exact values (columns sorted by name, rows
sorted) — doubles must match bit-for-bit, same as a value-hash would
require.

Usage: python tools/validate_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entry  # noqa: E402
from nobletools_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    # scale-derived oracle constants (IVF centroid literals, cap floor)
    # must be generated against the SAME sf dir the queries run on
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        spd = sdf.toPandas()
        if name not in oracles:
            # Mimic the driver's rows-only canonicalization: it still
            # sorts rows with pandas, which dies on unhashable cells
            # (dict/list) — exactly the kg_mentions_full r01 failure.
            try:
                cols = sorted(spd.columns)
                spd[cols].sort_values(cols).reset_index(drop=True)
                print(f"{name:24s} rows={len(spd):7d}  "
                      "(no oracle — rows-only, canonicalizes OK)")
            except Exception as e:
                print(f"{name:24s} CANONICALIZE ERROR: {e}")
                failures += 1
            continue
        try:
            opd = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name:24s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        scols, ocols = sorted(spd.columns), sorted(opd.columns)
        if scols != ocols:
            print(f"{name:24s} SCHEMA MISMATCH spark={scols} oracle={ocols}")
            failures += 1
            continue
        if len(spd) != len(opd):
            print(f"{name:24s} ROWCOUNT MISMATCH spark={len(spd)} "
                  f"oracle={len(opd)}")
            failures += 1
            continue
        a = spd[scols].sort_values(scols).reset_index(drop=True)
        b = opd[scols].sort_values(scols).reset_index(drop=True)
        for c in scols:
            if a[c].dtype != b[c].dtype:
                try:
                    b[c] = b[c].astype(a[c].dtype)
                except (TypeError, ValueError):
                    pass
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=True)
            print(f"{name:24s} rows={len(spd):7d}  OK")
        except AssertionError as e:
            print(f"{name:24s} VALUE MISMATCH: {str(e)[:400]}")
            failures += 1
    print(f"\n{'FAIL' if failures else 'PASS'} ({failures} failures)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
