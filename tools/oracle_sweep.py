"""Pandas-canonicalized oracle sweep mimicking the driver's comparator.

The driver converts BOTH the Spark result and the DuckDB oracle result to
pandas, sorts columns by name, sorts rows by all columns, and hashes the
values. That pipeline is *dtype-sensitive*: DuckDB HUGEINT (from SUM over
INT) lands in pandas as float64 and hashes differently from Spark's int64
even when every value is equal, and list-valued cells crash
``sort_values`` outright. This sweep reproduces that exact failure mode
locally so oracle-dialect bugs are caught before the driver sees them.

Usage: python tools/oracle_sweep.py [sf_dir] [key ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from fastetl_spark.registry import ORACLES, QUERIES, load_all
    from fastetl_spark.session import get_spark
    from tests.oracle_utils import compare_pandas, duckdb_conn

    load_all()
    spark = get_spark()
    con = duckdb_conn(sf_dir)

    keys = [k for k in QUERIES if k in ORACLES and (not only or k in only)]
    bad = 0
    for k in keys:
        try:
            s_pdf = QUERIES[k](spark, sf_dir).toPandas()
            d_pdf = con.execute(ORACLES[k]).df()
            problems = compare_pandas(s_pdf, d_pdf, k)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            problems = [f"{k}: EXC {type(e).__name__}: {e}"]
        if problems:
            bad += 1
            for p in problems:
                print("FAIL", p)
        else:
            print("ok  ", k)
    print(f"\n{len(keys) - bad}/{len(keys)} clean")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
