"""Mimic the driver's correctness gate locally: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, then compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, ".")

import duckdb


def norm_cell(v):
    if isinstance(v, Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if v is None:
        return "<null>"
    return str(v)


def normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


# DuckDB integer results must come out as BIGINT: the driver hasher
# canonicalizes HUGEINT (and narrower ints) differently from Spark's
# LongType even for equal values — catch type drift systematically
# instead of per-query comments (windowed SUM of ints is the classic
# silent HUGEINT producer).
_BAD_ORACLE_INT_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def oracle_type_violations(dtypes) -> list[str]:
    return [str(t) for t in dtypes if str(t) in _BAD_ORACLE_INT_TYPES]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.queries import all_specs
    from hyper_storage_spark.session import get_spark

    spark = get_spark("check_oracles", cpus=8)

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name, spec in all_specs().items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        finally:
            release_tracked_caches()
        if spec.sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            drel = con.sql(spec.sql)
            dcols = list(drel.columns)
            bad_types = oracle_type_violations(drel.types)
            drows = drel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if bad_types:
            print(f"FAIL {name}: oracle emits {bad_types} — cast to BIGINT in the SQL")
            failed.append(name)
            continue
        sc, sv = normalize(scols, srows)
        dc, dv = normalize(dcols, drows)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duckdb={dc}")
            failed.append(name)
            continue
        if len(sv) != len(dv):
            print(f"FAIL {name}: rowcount spark={len(sv)} duckdb={len(dv)}")
            failed.append(name)
            continue
        if sv != dv:
            bad = next(i for i, (a, b) in enumerate(zip(sv, dv)) if a != b)
            print(f"FAIL {name}: values differ at sorted-row {bad}:")
            print(f"  cols:   {sc}")
            print(f"  spark:  {sv[bad]}")
            print(f"  duckdb: {dv[bad]}")
            failed.append(name)
            continue
        print(f"PASS {name}: {len(sv)} rows [{time.time()-t0:.1f}s]")

    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    main()
