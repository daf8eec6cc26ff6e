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


def spark_decimal_violations(schema) -> list[str]:
    """DRIVER-tier entries must not emit DECIMAL output columns: the
    driver's hasher canonicalizes DECIMAL cells engine-specifically
    (Spark decimal(30,2) vs DuckDB DECIMAL(38,2) hash differently even
    for equal values), so every exact-decimal aggregate is projected as
    ROUND(dec, scale)::DOUBLE before it leaves the query. The rule
    lived only in comments until round 9, when rotation #5 moved three
    raw-DECIMAL entries into the driver window and all three went
    hash-red with values verified equal — this is the mechanical
    mirror of the oracle-side HUGEINT check above. Recurses into
    struct/array/map so a nested decimal can't slip through."""
    from pyspark.sql.types import ArrayType, DecimalType, MapType, StructType

    def has_dec(dt) -> bool:
        if isinstance(dt, DecimalType):
            return True
        if isinstance(dt, ArrayType):
            return has_dec(dt.elementType)
        if isinstance(dt, MapType):
            return has_dec(dt.keyType) or has_dec(dt.valueType)
        if isinstance(dt, StructType):
            return any(has_dec(f.dataType) for f in dt.fields)
        return False

    return [f.name for f in schema.fields if has_dec(f.dataType)]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from hyper_storage_spark.operators._caches import release_tracked_caches
    from hyper_storage_spark.queries import QUERIES, all_specs
    from hyper_storage_spark.session import get_spark

    driver_tier = set(QUERIES)

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
            if name in driver_tier:
                dec_cols = spark_decimal_violations(sdf.schema)
                if dec_cols:
                    print(
                        f"FAIL {name}: driver-tier entry emits DECIMAL "
                        f"column(s) {dec_cols} — project ROUND(dec, "
                        f"scale)::DOUBLE (no-DECIMAL-output rule)"
                    )
                    failed.append(name)
                    continue
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
