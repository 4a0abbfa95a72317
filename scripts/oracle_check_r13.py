"""Targeted oracle check: run the named registry queries at a given SF
and compare to their DuckDB oracles (same canonicalization as
scripts/driver_sim.py). Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
      python scripts/oracle_check_r13.py q1_pricing_summary dedup_minhash_lsh
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pg_lakehouse_spark import get_spark  # noqa: E402
from pg_lakehouse_spark.tables import TABLE_NAMES  # noqa: E402
from pg_lakehouse_spark.workload import REGISTRY, _load_all  # noqa: E402
from tests.oracle_utils import normalize  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    names = sys.argv[1:]
    _load_all()
    spark = get_spark("oracle-check-r13")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS "
                f"SELECT * FROM read_parquet('{path}')"
            )
    failed = []
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"  {name}: NOT REGISTERED")
            failed.append(name)
            continue
        try:
            sdf = spec.fn(spark, SF_DIR).toPandas()
            if spec.oracle:
                ddf = con.execute(spec.oracle).df()
                ok = (
                    sorted(sdf.columns) == sorted(ddf.columns)
                    and len(sdf) == len(ddf)
                    and normalize(sdf) == normalize(ddf)
                )
                print(f"  {name}: {'MATCH' if ok else 'MISMATCH'} "
                      f"({len(sdf)} rows)")
                if not ok:
                    failed.append(name)
            else:
                print(f"  {name}: rows-only ({len(sdf)} rows)")
        except Exception:
            failed.append(name)
            print(f"  {name}: ERROR")
            traceback.print_exc()
    print(f"failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
