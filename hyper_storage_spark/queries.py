"""The engine's query catalog: every entry pairs a Spark implementation
with (where SQL-expressible) a DuckDB oracle over the same parquet
tables. This is the driver-facing surface (``__spark_entry__.py``
re-exports it) and the SURVEY.md §2 coverage demonstration.

Naming convention:
- ``parity_*``  — re-expressions of the reference's operators
  (S1-S4 scans, L2/L3 expression filters, L9 keyset paging, L12 top-N,
  L16 revision/latest semantics) over the synthetic tables.
- ``q*``        — the relational surface Spark adds for free
  (joins/aggregations/windows/set-ops; SURVEY.md §2.4).
- ``dedup_*``, ``ann_*``, ``text_*``, ``mm_*`` — the large-scale
  training-data pipeline operators.

Cross-engine exactness rules (hash-compare is exact):
- money math is cast to DECIMAL before aggregation (exact in both
  engines), but NO final output column is DECIMAL-typed: the driver's
  hasher canonicalizes DECIMAL cells engine-specifically, so every
  money aggregate is emitted as ROUND(dec, 2)::DOUBLE — both engines
  round decimals half-away-from-zero and the exact 2-decimal value has
  one nearest double, so the bits agree;
- double averages are computed as ROUND(CAST(sum AS DOUBLE)/count, 6)
  in both engines (identical IEEE ops);
- ORDER BY ... LIMIT over a money aggregate sorts on the EXACT decimal
  (with a total tie-break order) and only the projection is rounded;
- timestamps: parquet nanos are truncated to micros on the Spark side,
  so oracles over `events.ts` pin DuckDB to the same µs domain via
  CAST(ts AS TIMESTAMP) (TIMESTAMP_NS→TIMESTAMP truncates);
- every computed column is aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from decimal import Decimal
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .expression import parse
from .expression.compiler import apply_filter
from .operators import (
    dedup,
    funnel,
    multimodal,
    sampling,
    search,
    similarity,
    skew,
    text,
    timeseries,
    versioning,
)
from .plans import FieldFilter, FilterOp, SortBy, SortItem, least_rows_filter_fields
from .sources import load_table


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: Optional[str]  # DuckDB oracle; None => rows-only check


QUERIES: dict[str, QuerySpec] = {}

# Second catalog tier: redundant variants of operator classes already
# proven by a QUERIES entry. The driver's correctness gate records
# exactly 50 rows, so QUERIES is capped at 50 entries (asserted at the
# bottom of this module) and these extras live outside the gate —
# still oracle-verified on every tools/check_oracles.py run and still
# timed by bench.py where listed.
EXTRA_QUERIES: dict[str, QuerySpec] = {}


def register(name: str, sql: Optional[str]):
    def deco(fn):
        if name in QUERIES or name in EXTRA_QUERIES:
            raise RuntimeError(f"duplicate catalog entry name {name!r}")
        QUERIES[name] = QuerySpec(fn, sql)
        return fn

    return deco


def register_extra(name: str, sql: Optional[str]):
    def deco(fn):
        # a silent overwrite would drop an entry from oracle coverage
        # with no signal (RuntimeError, not assert: -O strips asserts)
        if name in EXTRA_QUERIES or name in QUERIES:
            raise RuntimeError(f"duplicate catalog entry name {name!r}")
        EXTRA_QUERIES[name] = QuerySpec(fn, sql)
        return fn

    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


DEC = "decimal(12,4)"  # money/quantity cast: exact and overflow-safe


# --------------------------------------------------------------------------
# parity_* — the reference's own operator surface (SURVEY.md §2.1/2.2)
# --------------------------------------------------------------------------


@register(
    "parity_point_get",
    "SELECT doc_id, text, lang, source, n_chars FROM documents WHERE doc_id = 42",
)
def parity_point_get(spark, sf_dir):
    """S1 point get (db/Db.scala:141-144): single-key lookup; parquet
    scan prunes via min/max stats on the pushed predicate."""
    return _t(spark, sf_dir, "documents").filter(F.col("doc_id") == 42)


@register_extra(
    "parity_static_get",
    "SELECT doc_id, lang, n_chars FROM documents WHERE doc_id = 7",
)
def parity_static_get(spark, sf_dir):
    """S2 static get (db/Db.scala:179-183): header-only projection —
    column pruning reaches the scan (ReadSchema shows 3 columns)."""
    return _t(spark, sf_dir, "documents").filter(F.col("doc_id") == 7).select(
        "doc_id", "lang", "n_chars"
    )


@register(
    "parity_range_scan",
    """SELECT * FROM (SELECT event_id, event_type, value, 'asc' AS dir FROM events
                      WHERE user_id = 7 AND event_id > 100
                      ORDER BY event_id LIMIT 20)
       UNION ALL
       SELECT * FROM (SELECT event_id, event_type, value, 'desc' AS dir FROM events
                      WHERE user_id = 7 ORDER BY event_id DESC LIMIT 20)""",
)
def parity_range_scan(spark, sf_dir):
    """S3 clustered range scan (db/Db.scala:146-177), both directions
    (the ascending=true/false paths of selectContentCollection) in one
    entry: key-bounded, ordered, limited — each branch compiles to
    TakeOrderedAndProject (no global sort), unioned with a direction
    tag."""
    e = _t(spark, sf_dir, "events")
    asc = (
        e.filter((F.col("user_id") == 7) & (F.col("event_id") > 100))
        .orderBy("event_id")
        .limit(20)
        .select("event_id", "event_type", "value", F.lit("asc").alias("dir"))
    )
    desc = (
        e.filter(F.col("user_id") == 7)
        .orderBy(F.col("event_id").desc())
        .limit(20)
        .select("event_id", "event_type", "value", F.lit("desc").alias("dir"))
    )
    return asc.unionAll(desc)


@register(
    "parity_index_scan",
    """SELECT event_id, user_id, value FROM events
       WHERE event_type = 'click' AND value > 5
       ORDER BY value DESC, event_id LIMIT 50""",
)
def parity_index_scan(spark, sf_dir):
    """S4 index range scan (db/Db.scala:317-359): multi-conjunct
    pushdown + clustering-key order + limit."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "click") & (F.col("value") > 5))
        .orderBy(F.col("value").desc(), F.col("event_id"))
        .limit(50)
        .select("event_id", "user_id", "value")
    )


@register(
    "parity_residual_filter",
    """SELECT event_id, value FROM events
       WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
         AND event_type = 'click'""",
)
def parity_residual_filter(spark, sf_dir):
    """L2+L3 (HyperbusAdapter.scala:146,236-243): the reference's filter
    expression language, parsed and compiled to a Catalyst Column over a
    schemaless JSON column (`k` lives inside events.props)."""
    events = _t(spark, sf_dir, "events")
    return apply_filter(events, 'k > 50 and event_type = "click"', json_col="props").select(
        "event_id", "value"
    )


@register_extra(
    "parity_topn_sort",
    """SELECT doc_id, lang, n_chars FROM documents
       ORDER BY lang, n_chars DESC, doc_id LIMIT 25""",
)
def parity_topn_sort(spark, sf_dir):
    """L12 in-memory top-N (HyperbusAdapter.scala:181-197): multi-field
    mixed-direction sort + take(pageSize) → TakeOrderedAndProject."""
    return (
        _t(spark, sf_dir, "documents")
        .orderBy(F.col("lang"), F.col("n_chars").desc(), F.col("doc_id"))
        .limit(25)
        .select("doc_id", "lang", "n_chars")
    )


@register_extra(
    "parity_keyset_page",
    """WITH p1 AS (SELECT lang, doc_id FROM documents ORDER BY lang, doc_id LIMIT 10),
       last AS (SELECT lang AS ll, doc_id AS ld FROM p1 ORDER BY lang DESC, doc_id DESC LIMIT 1)
       SELECT doc_id, lang, n_chars FROM documents, last
       WHERE lang = ll AND doc_id > ld
       ORDER BY lang, doc_id LIMIT 30""",
)
def parity_keyset_page(spark, sf_dir):
    """L9/L10 keyset pagination (IndexLogic.scala:108-191),
    SELF-DRIVING: page 1 (10 rows) actually runs, its last row feeds
    the ported least-rows generator, and the generated resume filter —
    the reference's narrow same-prefix continuation (sort-prefix EQ +
    id GT; the fetch loop widens on later iterations) — fetches page 2.
    The oracle derives the identical resume point itself."""
    docs0 = _t(spark, sf_dir, "documents")
    page1 = docs0.orderBy("lang", "doc_id").limit(10).select("lang", "doc_id").collect()
    sort_items = [SortItem("lang", "text", "asc"), SortItem("id", "decimal", "asc")]
    last_row = {"lang": page1[-1].lang, "id": Decimal(int(page1[-1].doc_id))}
    resume = least_rows_filter_fields(sort_items, [], 0, False, last_row, False)
    colmap = {"t0": F.col("lang"), "item_id": F.col("doc_id")}
    cond = F.lit(True)
    for ff in resume:
        c = colmap[ff.name]
        v = F.lit(str(ff.value) if ff.name == "t0" else int(ff.value))
        cond = cond & {
            FilterOp.EQ: c == v,
            FilterOp.GT: c > v,
            FilterOp.GTEQ: c >= v,
            FilterOp.LT: c < v,
            FilterOp.LTEQ: c <= v,
        }[ff.op]
    return (
        _t(spark, sf_dir, "documents")
        .filter(cond)
        .orderBy("lang", "doc_id")
        .limit(30)
        .select("doc_id", "lang", "n_chars")
    )


@register(
    "parity_latest_revision",
    """SELECT user_id, event_id AS last_event_id, value FROM (
         SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
         FROM events) WHERE rn = 1""",
)
def parity_latest_revision(spark, sf_dir):
    """L16 revision semantics analog: latest state per key via a single
    window pass (the streaming engine's mapGroupsWithState equivalent
    for batch backfill)."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        _t(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_id").alias("last_event_id"), "value")
    )


# --------------------------------------------------------------------------
# q* — relational surface (joins / aggregations / windows / set ops)
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_qty,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_base_price,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_disc_price,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) * (1 + CAST(l_tax AS DECIMAL(12,4)))), 2) AS DOUBLE) AS sum_charge,
              ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
              COUNT(*) AS count_order
       FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
       GROUP BY l_returnflag, l_linestatus""",
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: single scan, map-side partial aggregation, one
    shuffle on a low-cardinality key. Money math stays DECIMAL (exact in
    both engines) until the final projection, which canonicalizes to
    ROUND(dec, 2)::DOUBLE — the driver's hasher treats DECIMAL cells
    engine-specifically, doubles are bit-identical across engines."""
    return _q1_impl(spark, sf_dir, exact=True)


def _q1_impl(spark, sf_dir, exact: bool):
    """Shared Q1 body. ``exact=False`` is the r12 production fast path:
    DECIMAL hash-agg accumulators are the profiled cost of this query
    (SCALE.md r6 note: double accumulators are ~5× faster), so the
    money expressions run in IEEE doubles instead — sums then carry
    ~1-ulp partition-order sensitivity and a half-boundary ROUND can
    differ from the exact value, which is why the ORACLE entry stays
    on exact and the fast twin (q1_pricing_fast) is rows-only gated
    plus an agreement pytest (rel diff ≤ 1e-9 on gate data)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "2001-09-02")
    typ = DEC if exact else "double"
    qty = F.col("l_quantity").cast(typ)
    price = F.col("l_extendedprice").cast(typ)
    disc = F.col("l_discount").cast(typ)
    tax = F.col("l_tax").cast(typ)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(qty), 2).cast("double").alias("sum_qty"),
        F.round(F.sum(price), 2).cast("double").alias("sum_base_price"),
        F.round(F.sum(price * (F.lit(1) - disc)), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax)), 2).cast("double").alias("sum_charge"),
        F.round(F.sum(qty).cast("double") / F.count("*"), 6).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@register_extra("q1_pricing_fast", None)
def q1_pricing_fast(spark, sf_dir):
    """q1_pricing_summary's IEEE fast path (``_q1_impl(exact=False)``)
    — same plan shape, double accumulators instead of DECIMAL. No SQL
    oracle on purpose: a double sum is partition-order-sensitive in
    its last ulps, so cross-engine hashing would flake; correctness is
    gated by the agreement pytest against the exact entry
    (test_q1_fast_agreement) and the driver's rows/schema check."""
    return _q1_impl(spark, sf_dir, exact=False)


@register_extra(
    "q3_shipping_priority",
    """SELECT l_orderkey, CAST(ROUND(revenue_x, 2) AS DOUBLE) AS revenue,
              o_orderdate, o_orderpriority
       FROM (
         SELECT l_orderkey,
                SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS revenue_x,
                o_orderdate, o_orderpriority
         FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate, o_orderpriority
         ORDER BY revenue_x DESC, l_orderkey LIMIT 10)""",
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dimension (customer) broadcast into the
    fact join; revenue top-10 via TakeOrdered. The top-10 order uses the
    EXACT decimal revenue (identical in both engines); the rounded
    double is only the output representation."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).alias("revenue_x"))
        .orderBy(F.col("revenue_x").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round("revenue_x", 2).cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


@register_extra(
    "q5_local_supplier_volume",
    """SELECT n_name,
              CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
       FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n_name""",
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: star join. Broadcast hints only on the true
    dimensions (supplier/nation/region — bounded size at any SF);
    orders (a year of the fact table) and customer (data-proportional)
    carry no hint, so AQE picks broadcast at small SF and a shuffle
    join at 100 TB instead of OOMing a forced broadcast."""
    return _q5_impl(spark, sf_dir, exact=True)


def _q5_impl(spark, sf_dir, exact: bool):
    """Shared Q5 body; ``exact=False`` runs the revenue expression in
    IEEE doubles (the q1 fast-path rationale — see _q1_impl)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    typ = DEC if exact else "double"
    rev = F.col("l_extendedprice").cast(typ) * (F.lit(1) - F.col("l_discount").cast(typ))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


@register_extra("q5_volume_fast", None)
def q5_volume_fast(spark, sf_dir):
    """q5's IEEE fast path — rows-only gated, agreement pytest against
    the exact entry (see q1_pricing_fast for why no SQL oracle)."""
    return _q5_impl(spark, sf_dir, exact=False)


@register_extra(
    "q6_revenue_change",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         AND l_discount BETWEEN 0.04 AND 0.07 AND l_quantity < 24""",
)
def q6_revenue_change(spark, sf_dir):
    """TPC-H Q6 shape: pure scan+filter+agg — every predicate pushes to
    parquet (PushedFilters), zero joins, one-row result."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast(DEC)), 2)
        .cast("double")
        .alias("revenue")
    )


# --------------------------------------------------------------------------
# Synthetic partsupp: the driver's parquet set has no partsupp table, which
# blocked the TPC-H q2/q9/q11/q16/q20 join/agg shapes through rounds 5-8.
# Both engines synthesize the IDENTICAL frame IN-PLAN from lineitem's
# distinct (l_partkey, l_suppkey) pairs — foreign-key-consistent by
# construction — with availqty/supplycost derived from the first 13 hex
# digits of seeded md5 (exact in both engines; the md5-uniform discipline
# of sampling.md5_uniform). Supply cost is kept in integer CENTS so every
# threshold comparison is pure BIGINT/decimal-exact arithmetic.
# --------------------------------------------------------------------------

_PARTSUPP_SQL = """partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(1 + ('0x' || substr(md5('a:' || ps_partkey || ':' || ps_suppkey), 1, 13))::UBIGINT % 9999 AS BIGINT) AS ps_availqty,
         CAST(100 + ('0x' || substr(md5('c:' || ps_partkey || ':' || ps_suppkey), 1, 13))::UBIGINT % 99900 AS BIGINT) AS ps_supplycost_cents
  FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem)
)"""

# exact decimal dollars from integer cents: multiply by DECIMAL 0.01,
# never divide (DuckDB's / returns DOUBLE; Spark's decimal-division
# scale rules differ) — both engines do exact decimal multiplication
_PS_COST_SQL = "CAST(ps_supplycost_cents AS DECIMAL(14,2)) * CAST(0.01 AS DECIMAL(4,2))"


def _synth_partsupp(spark, sf_dir):
    """The partsupp-shaped frame, Spark side (see _PARTSUPP_SQL — the
    DuckDB oracle builds the identical rows). One distinct over the
    lineitem key pair (a single shuffle, O(pairs) rows ~ 86% of
    lineitem at the gate SFs); the hash columns are codegen'd md5 over
    the pair, no UDFs. At 100 TB the frame co-partitions with whatever
    key the consumer joins on — it is derived, not stored."""
    pair = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )

    def h(salt):
        s = F.concat_ws(":", F.lit(salt), F.col("ps_partkey"), F.col("ps_suppkey"))
        return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("bigint")

    return pair.select(
        "ps_partkey",
        "ps_suppkey",
        (F.lit(1) + h("a") % 9999).alias("ps_availqty"),
        (F.lit(100) + h("c") % 99900).alias("ps_supplycost_cents"),
    )


def _ps_cost_spark():
    # a function, not a module-level Column: Column construction needs
    # an active SparkContext, which imports must not assume
    return F.col("ps_supplycost_cents").cast("decimal(14,2)") * F.expr(
        "CAST(0.01 AS DECIMAL(4,2))"
    )


@register_extra(
    "q2_min_cost_supplier",
    f"""WITH {_PARTSUPP_SQL},
eu AS (
  SELECT ps_partkey, ps_supplycost_cents, s_name, s_acctbal, n_name
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey AND r_name = 'EUROPE'
  JOIN part ON p_partkey = ps_partkey AND p_type = 'SMALL'
),
m AS (SELECT *, MIN(ps_supplycost_cents) OVER (PARTITION BY ps_partkey) AS min_cents FROM eu)
SELECT s_acctbal, s_name, n_name, ps_partkey AS p_partkey,
       CAST(ROUND({_PS_COST_SQL}, 2) AS DOUBLE) AS supplycost
FROM m WHERE ps_supplycost_cents = min_cents
ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100""",
)
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape (minimum-cost supplier): for every SMALL-type
    part, the European supplier(s) with the minimal supply cost —
    the correlated-min subquery expressed as a window MIN over the
    part key (one shuffle on ps_partkey), dimension tables broadcast.
    The min comparison runs on integer cents (exact); ties keep every
    minimal supplier, and the top-100 order has a total tie-break."""
    ps = _synth_partsupp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL")
    eu = (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("ps_partkey", "ps_supplycost_cents", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("ps_partkey")
    return (
        eu.withColumn("min_cents", F.min("ps_supplycost_cents").over(w))
        .filter(F.col("ps_supplycost_cents") == F.col("min_cents"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.round(_ps_cost_spark(), 2).cast("double").alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    f"""WITH {_PARTSUPP_SQL}
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))
                      - {_PS_COST_SQL} * CAST(l_quantity AS DECIMAL(12,4))), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey AND p_name LIKE '%bolt%'
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
GROUP BY 1, 2""",
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): the six-table join —
    lineitem x orders on the order key, partsupp on the COMPOUND
    (partkey, suppkey) key, three broadcast dims. Profit stays exact
    decimal until the final ROUND(...,2)::DOUBLE. Scale: the two
    fact-fact joins shuffle on their join keys (AQE picks the
    strategy); part is filtered before the join so the like-predicate
    prunes the build side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    ps = _synth_partsupp(spark, sf_dir)
    price = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    qty = F.col("l_quantity").cast(DEC)
    profit = price * (F.lit(1) - disc) - _ps_cost_spark() * qty
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(ps, (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


@register_extra(
    "q11_important_stock",
    f"""WITH {_PARTSUPP_SQL},
v AS (
  SELECT ps_partkey,
         SUM(CAST(ps_supplycost_cents AS HUGEINT) * ps_availqty) AS value_cents
  FROM partsupp
  JOIN supplier ON s_suppkey = ps_suppkey
  JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_7'
  GROUP BY 1
),
t AS (SELECT SUM(value_cents) AS total_cents, COUNT(*) AS n_parts FROM v)
SELECT ps_partkey,
       CAST(ROUND(CAST(value_cents AS DECIMAL(24,2)) * CAST(0.01 AS DECIMAL(4,2)), 2) AS DOUBLE) AS value
FROM v, t WHERE value_cents * n_parts > 2 * total_cents
ORDER BY value DESC, ps_partkey""",
)
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part inventory value for
    one nation's suppliers, kept when above 2x the MEAN part value —
    TPC-H's own fraction scales with 1/SF for exactly this reason, so
    the gate uses a scale-free threshold that binds at the gate SFs
    (187 rows at 0.01, 1748 at 0.1; sf0.001's 10 suppliers include
    none from NATION_7, so the frame is legitimately empty there). The
    scalar subquery is a one-row broadcast cross join, and the
    comparison is exact integer cents (value*n_parts > 2*total) —
    accumulated in decimal(38,0) on the Spark side and HUGEINT in the
    oracle (the cross-engine exactification pattern for sums whose
    terms are quadratic in corpus magnitude): int64 products wrap
    SILENTLY under non-ANSI Spark arithmetic while DuckDB promotes to
    HUGEINT, a latent divergence outside the gate SFs."""
    ps = _synth_partsupp(spark, sf_dir)
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    v = (
        ps.join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents").cast("decimal(38,0)")
                * F.col("ps_availqty")
            ).alias("value_cents")
        )
    )
    total = v.agg(F.sum("value_cents").alias("total_cents"), F.count("*").alias("n_parts"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * F.col("n_parts") > 2 * F.col("total_cents"))
        .select(
            "ps_partkey",
            F.round(
                F.col("value_cents").cast("decimal(24,2)") * F.expr("CAST(0.01 AS DECIMAL(4,2))"),
                2,
            )
            .cast("double")
            .alias("value"),
        )
        .orderBy(F.col("value").desc(), "ps_partkey")
    )


@register_extra(
    "q16_parts_supplier_relationship",
    f"""WITH {_PARTSUPP_SQL}
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%'
  AND p_size IN (2, 5, 11, 28, 37, 42)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
)
def q16_parts_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    counts per (brand, type, size) with a NOT-IN exclusion subquery —
    the exclusion runs as a broadcast LEFT ANTI join (the supplier
    blacklist is dim-sized), the distinct count is one expand+agg
    shuffle on the grouping key."""
    ps = _synth_partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(2, 5, 11, 28, 37, 42))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register_extra(
    "q20_potential_promotion",
    f"""WITH {_PARTSUPP_SQL},
lq AS (
  SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,4))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
)
SELECT DISTINCT s_name, s_acctbal
FROM partsupp
JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
JOIN lq ON lq.l_partkey = ps_partkey AND lq.l_suppkey = ps_suppkey
JOIN supplier ON s_suppkey = ps_suppkey
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
WHERE CAST(ps_availqty AS DECIMAL(20,4)) > CAST(100 AS DECIMAL(4,0)) * qty
ORDER BY s_name""",
)
def q20_potential_promotion(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation holding excess stock (availqty > 100x the 1996 shipped
    quantity) of red parts — the nested exists-chain expressed as a
    pre-aggregated lineitem frame joined on the compound key, then a
    distinct over the surviving suppliers. The quantity threshold
    compares exact decimals; every dimension is broadcast."""
    ps = _synth_partsupp(spark, sf_dir)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    lq = (
        _t(spark, sf_dir, "lineitem")
        .filter((F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    return (
        ps.join(F.broadcast(part), ps.ps_partkey == part.p_partkey)
        .join(lq, (ps.ps_partkey == lq.l_partkey) & (ps.ps_suppkey == lq.l_suppkey))
        .join(F.broadcast(sup), ps.ps_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .filter(
            F.col("ps_availqty").cast("decimal(20,4)")
            > F.expr("CAST(100 AS DECIMAL(4,0))") * F.col("qty")
        )
        .select("s_name", "s_acctbal")
        .distinct()
        .orderBy("s_name")
    )


# lineitem extension for the q12/q21 shapes: the driver's lineitem has
# no receipt/commit dates and no shipmode; both engines synthesize the
# IDENTICAL columns from seeded md5 over (l_orderkey, l_linenumber) —
# receipt = ship + [1,30] days, commit = ship + [-25,34] days, mode =
# one of seven. Determinism is the contract (duplicated line numbers
# get identical values in both engines); day offsets are integer-exact.
_LINEITEM_EXT_SQL = """lineitem_ext AS (
  SELECT *,
    l_shipdate + to_days(CAST(1 + ('0x' || substr(md5('r:' || l_orderkey || ':' || l_linenumber), 1, 13))::UBIGINT % 30 AS INTEGER)) AS l_receiptdate,
    l_shipdate + to_days(CAST(('0x' || substr(md5('m:' || l_orderkey || ':' || l_linenumber), 1, 13))::UBIGINT % 60 AS INTEGER) - 25) AS l_commitdate,
    ['AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK'][CAST(('0x' || substr(md5('s:' || l_orderkey || ':' || l_linenumber), 1, 13))::UBIGINT % 7 AS INTEGER) + 1] AS l_shipmode
  FROM lineitem
)"""


def _synth_lineitem_ext(spark, sf_dir):
    """The extended lineitem frame, Spark side (see _LINEITEM_EXT_SQL).
    Pure codegen column synthesis over the base scan — no shuffle, no
    UDFs; at 100 TB it costs what the scan costs."""
    li = _t(spark, sf_dir, "lineitem")

    def h(salt):
        s = F.concat_ws(":", F.lit(salt), F.col("l_orderkey"), F.col("l_linenumber"))
        return F.conv(F.substring(F.md5(s), 1, 13), 16, 10).cast("bigint")

    return (
        li.withColumn("__hr", (1 + h("r") % 30).cast("int"))
        .withColumn("__hm", ((h("m") % 60).cast("int") - 25))
        .withColumn("__hs", (h("s") % 7).cast("int"))
        .withColumn("l_receiptdate", F.expr("timestampadd(DAY, __hr, l_shipdate)"))
        .withColumn("l_commitdate", F.expr("timestampadd(DAY, __hm, l_shipdate)"))
        .withColumn(
            "l_shipmode",
            F.expr("elt(__hs + 1, 'AIR','FOB','MAIL','RAIL','REG AIR','SHIP','TRUCK')"),
        )
        .drop("__hr", "__hm", "__hs")
    )


@register_extra(
    "q12_shipping_modes",
    f"""WITH {_LINEITEM_EXT_SQL}
SELECT l_shipmode,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem_ext ON o_orderkey = l_orderkey
WHERE l_shipmode IN ('MAIL', 'SHIP')
  AND l_commitdate < l_receiptdate AND l_shipdate < l_commitdate
  AND l_receiptdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_receiptdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_shipmode ORDER BY l_shipmode""",
)
def q12_shipping_modes(spark, sf_dir):
    """TPC-H Q12 shape (shipping modes & order priority): the
    late-delivery predicate chain (ship < commit < receipt) over the
    synthesized date columns, conditional-CASE counts per mode. One
    fact-fact join on the order key; every filter is codegen over the
    scan. Previously blocked — the driver's lineitem lacks
    receipt/commit dates (FIXTURES.md)."""
    li = _synth_lineitem_ext(spark, sf_dir).filter(
        F.col("l_shipmode").isin("MAIL", "SHIP")
        & (F.col("l_commitdate") < F.col("l_receiptdate"))
        & (F.col("l_shipdate") < F.col("l_commitdate"))
        & (F.col("l_receiptdate") >= "1997-01-01")
        & (F.col("l_receiptdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_shipmode")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
        .orderBy("l_shipmode")
    )


@register_extra(
    "q21_suppliers_kept_waiting",
    f"""WITH {_LINEITEM_EXT_SQL},
lall AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem_ext),
late AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem_ext
         WHERE l_receiptdate > l_commitdate)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM late l1
JOIN orders ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
JOIN supplier ON s_suppkey = l1.l_suppkey
JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_5'
WHERE EXISTS (SELECT 1 FROM lall l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""",
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS / NOT-EXISTS correlated pair over the same fact — a
    multi-supplier order where exactly THIS supplier was the only late
    one. Expressed as a left-semi (some other supplier on the order)
    plus a left-anti (no other LATE supplier) against de-duplicated
    (order, supplier) pair sets, then the dim joins broadcast.
    Previously blocked on the missing date columns."""
    ext = _synth_lineitem_ext(spark, sf_dir)
    lall = ext.select("l_orderkey", "l_suppkey").distinct()
    late = (
        ext.filter(F.col("l_receiptdate") > F.col("l_commitdate"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    l1 = late.alias("l1")
    l2 = lall.alias("l2")
    l3 = late.alias("l3")
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        cand.join(o, cand.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sup), cand.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register_extra(
    "q_window_running_total",
    """SELECT o_orderkey, o_custkey,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS DOUBLE) AS running_total
       FROM orders""",
)
def q_window_running_total(spark, sf_dir):
    """Running aggregate per key — single shuffle on the partition key."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum(F.col("o_totalprice").cast(DEC)).over(w), 2)
        .cast("double")
        .alias("running_total"),
    )


@register_extra(
    "q_window_rank",
    """SELECT s_suppkey, s_nationkey, s_acctbal, rnk FROM (
         SELECT s_suppkey, s_nationkey, s_acctbal,
                rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rnk
         FROM supplier) WHERE rnk <= 3""",
)
def q_window_rank(spark, sf_dir):
    """Top-N per group via rank window."""
    w = Window.partitionBy("s_nationkey").orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return (
        _t(spark, sf_dir, "supplier")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("s_suppkey", "s_nationkey", "s_acctbal", "rnk")
    )


@register_extra(
    "q_semi_anti_join",
    """SELECT c_custkey, 'semi' AS side FROM customer
       WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
       UNION ALL
       SELECT c_custkey, 'anti' AS side FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""",
)
def q_semi_anti_join(spark, sf_dir):
    """EXISTS / NOT EXISTS in one entry: a left-semi and a left-anti
    join over the same key, unioned with a side tag."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    semi = c.join(
        o.filter(F.col("o_totalprice") > 400000), c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("semi").alias("side"))
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", F.lit("anti").alias("side")
    )
    return semi.unionAll(anti)


@register_extra(
    "q_events_json_agg",
    """SELECT event_type, COUNT(*) AS n,
              ROUND(CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / COUNT(*), 6) AS avg_k,
              MAX(value) AS max_value
       FROM events GROUP BY event_type""",
)
def q_events_json_agg(spark, sf_dir):
    """Aggregation over a semi-structured JSON column."""
    e = _t(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k").cast("bigint")
    )
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("k").cast("double") / F.count("*"), 6).alias("avg_k"),
        F.max("value").alias("max_value"),
    )


@register_extra(
    "q_distinct_users_daily",
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(DISTINCT user_id) AS users
       FROM events GROUP BY 1""",
)
def q_distinct_users_daily(spark, sf_dir):
    """Exact distinct per day (two-phase partial aggregation)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.countDistinct("user_id").alias("users"))
    )


@register(
    "q_sessionization",
    """WITH e AS (
         -- Spark reads the nanosecond parquet timestamps truncated to
         -- microseconds; pin the oracle to the same µs domain so window
         -- order and durations agree exactly.
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
       ), gaps AS (
         SELECT user_id, event_id, ts,
                CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), sessions AS (
         -- DuckDB's windowed SUM of ints is HUGEINT (int128); the
         -- driver hasher canonicalizes HUGEINT differently from
         -- BIGINT even for equal values, so pin the type (same rule
         -- as the catalog's no-DECIMAL-output rule; q_grouping_sets'
         -- gid cast is the precedent)
         SELECT user_id, event_id, ts,
                CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id
         FROM gaps
       )
       SELECT user_id, session_id, COUNT(*) AS n_events,
              epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
       FROM sessions GROUP BY user_id, session_id""",
)
def q_sessionization(spark, sf_dir):
    """Batch sessionization: 30-minute inactivity gap → session ids via
    lag + running sum (the batch analog of a session window in
    Structured Streaming)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    gaps = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1800 * 1000 * 1000),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(w))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )


@register_extra(
    "q4_order_priority",
    """SELECT o_orderpriority, COUNT(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-04-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority""",
)
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a non-equi correlated condition →
    left-semi join with a compound join predicate."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register_extra(
    "q10_returned_items",
    """SELECT c_custkey, c_name, n_name, CAST(ROUND(revenue_x, 2) AS DOUBLE) AS revenue
       FROM (
         SELECT c_custkey, c_name, n_name,
                SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS revenue_x
         FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
         GROUP BY c_custkey, c_name, n_name
         ORDER BY revenue_x DESC, c_custkey LIMIT 20)""",
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue ranking. Only nation is
    hint-broadcast; orders (6-month window) and customer grow with the
    data, so their join strategy is left to AQE."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).alias("revenue_x"))
        .orderBy(F.col("revenue_x").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("revenue_x", 2).cast("double").alias("revenue"),
        )
    )


@register_extra(
    "q14_promo_share",
    """SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))
                     ELSE CAST(0 AS DECIMAL(21,8)) END) AS DOUBLE)
              / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE), 6) AS promo_share
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'""",
)
def q14_promo_share(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share (conditional ratio over a
    dimension join)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(21,8)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                F.lit(100.0) * F.sum(promo).cast("double") / F.sum(rev).cast("double"), 6
            ).alias("promo_share")
        )
    )


@register_extra(
    "q19_disjunctive_join",
    """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))), 2) AS DOUBLE) AS revenue
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
          OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
          OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)""",
)
def q19_disjunctive_join(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-ANDs across both join sides."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & qty.between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30) & qty.between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50) & qty.between(20, 40))
    )
    rev = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return j.filter(cond).agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))


@register_extra(
    "q_percentiles",
    """SELECT event_type,
              ROUND(quantile_cont(value, 0.5), 6) AS p50,
              ROUND(quantile_cont(value, 0.9), 6) AS p90,
              ROUND(quantile_cont(value, 0.99), 6) AS p99
       FROM events GROUP BY event_type""",
)
def q_percentiles(spark, sf_dir):
    """Exact interpolated percentiles (both engines: linear
    interpolation over the sorted set)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
            F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
            F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
        )
    )


@register_extra(
    "q_moving_average",
    """WITH daily AS (
         SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS rev
         FROM orders GROUP BY 1
       )
       SELECT day,
              ROUND(CAST(SUM(rev) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
                    / COUNT(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS ma7,
              CAST(ROUND(rev - lag(rev) OVER (ORDER BY day), 2) AS DOUBLE) AS delta
       FROM daily""",
)
def q_moving_average(spark, sf_dir):
    """7-day moving average + day-over-day lag delta over one
    pre-aggregated daily series (frame window and lag share a single
    sort)."""
    daily = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", "o_orderdate").cast("date").alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast(DEC)).alias("rev"))
    )
    # unpartitioned window is intentional: the input is the DAILY
    # series — bounded by the calendar (a few thousand rows at any
    # corpus size), not by the data. The single-partition warning is
    # about data-proportional inputs; this one is pre-reduced.
    w = Window.orderBy("day").rowsBetween(-6, 0)
    wl = Window.orderBy("day")
    return daily.select(
        "day",
        F.round(F.sum("rev").over(w).cast("double") / F.count("*").over(w), 6).alias("ma7"),
        F.round(F.col("rev") - F.lag("rev").over(wl), 2).cast("double").alias("delta"),
    )


_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


@register_extra(
    "q_pivot_status_priority",
    """SELECT o_orderstatus,
              COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS urgent,
              COUNT(*) FILTER (o_orderpriority = '2-HIGH') AS high,
              COUNT(*) FILTER (o_orderpriority = '3-MEDIUM') AS medium,
              COUNT(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS unspecified,
              COUNT(*) FILTER (o_orderpriority = '5-LOW') AS low
       FROM orders GROUP BY o_orderstatus""",
)
def q_pivot_status_priority(spark, sf_dir):
    """Pivot: order counts status × priority."""
    aliases = ["urgent", "high", "medium", "unspecified", "low"]
    df = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
    )
    for p, a in zip(_PRIORITIES, aliases):
        df = df.withColumnRenamed(p, a)
    return df.na.fill(0, aliases)


@register_extra(
    "q_monthly_revenue",
    """SELECT CAST(year(o_orderdate) AS BIGINT) AS y, CAST(month(o_orderdate) AS BIGINT) AS m,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS revenue,
              COUNT(*) AS n
       FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY 1, 2""",
)
def q_monthly_revenue(spark, sf_dir):
    """Date-part bucketing (year/month semantics agree across engines)."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1998-01-01")
        .groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.month("o_orderdate").cast("bigint").alias("m"),
        )
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2).cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register_extra(
    "q_above_avg_orders",
    """WITH a AS (
         SELECT o_custkey AS k,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) / COUNT(*) AS avg_price
         FROM orders GROUP BY 1
       )
       SELECT o_orderkey, o_custkey FROM orders JOIN a ON o_custkey = k
       WHERE o_totalprice > avg_price""",
)
def q_above_avg_orders(spark, sf_dir):
    """Correlated-subquery shape (orders above their customer's average)
    as a single window pass: avg(o_totalprice) OVER (PARTITION BY
    o_custkey) — one shuffle on the customer key, no join, and no
    broadcast of a data-proportional aggregate (the per-customer
    average's cardinality grows with the data, so the aggregate+join
    decorrelation would not survive 100×)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    avg_price = F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double") / F.count(
        "*"
    ).over(w)
    return (
        o.withColumn("avg_price", avg_price)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_custkey")
    )


@register_extra(
    "q_string_functions",
    """SELECT c_custkey, upper(c_name) AS name_upper, length(c_name) AS name_len,
              substring(c_name, 1, 8) AS name_prefix,
              concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
              CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS name_num,
              CAST(regexp_matches(c_name, '00[0-9]9$') AS BIGINT) AS ends_odd_pattern
       FROM customer WHERE c_name LIKE '%001%'""",
)
def q_string_functions(spark, sf_dir):
    """Scalar string + regex function surface (the reference delegates
    all scalar work to its expression library; SURVEY §2.4): case /
    length / substring / concat plus capture-group extraction and a
    pattern-match flag."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_name").like("%001%"))
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws(":", "c_mktsegment", F.col("c_nationkey").cast("string")).alias("seg_nation"),
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("name_num"),
        # 0/1 here; the catalog's BOOLEAN-output proof lives in
        # q_string_agg_sorted (one boolean row-class is enough risk)
        F.col("c_name").rlike("00[0-9]9$").cast("bigint").alias("ends_odd_pattern"),
    )


@register_extra(
    "q_conditional_agg",
    """SELECT c_nationkey,
              COUNT(*) FILTER (c_acctbal > 5000) AS rich,
              COUNT(*) FILTER (c_acctbal < 0) AS negative,
              CAST(ROUND(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN CAST(c_acctbal AS DECIMAL(12,4)) ELSE 0 END), 2) AS DOUBLE) AS building_bal
       FROM customer GROUP BY c_nationkey""",
)
def q_conditional_agg(spark, sf_dir):
    """Conditional aggregation (FILTER / CASE-sum)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count_if(F.col("c_acctbal") > 5000).alias("rich"),
        F.count_if(F.col("c_acctbal") < 0).alias("negative"),
        F.round(
            F.sum(
                F.when(F.col("c_mktsegment") == "BUILDING", F.col("c_acctbal").cast(DEC)).otherwise(
                    F.lit(0).cast(DEC)
                )
            ),
            2,
        )
        .cast("double")
        .alias("building_bal"),
    )


@register_extra(
    "q_set_ops",
    """SELECT nationkey, 'except' AS side FROM (
         SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < -900
         EXCEPT
         SELECT s_nationkey FROM supplier WHERE s_acctbal < 0)
       UNION ALL
       SELECT nationkey, 'intersect' AS side FROM (
         SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 9900
         INTERSECT
         SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)""",
)
def q_set_ops(spark, sf_dir):
    """Set operations in one entry: EXCEPT (nations with deeply-negative
    customers but no negative-balance suppliers) and INTERSECT (nations
    with both very-rich customers and rich suppliers), unioned with a
    side tag."""
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    exc = (
        cust.filter(F.col("c_acctbal") < -900)
        .select(F.col("c_nationkey").alias("nationkey"))
        .subtract(
            supp.filter(F.col("s_acctbal") < 0).select(F.col("s_nationkey").alias("nationkey"))
        )
        .select("nationkey", F.lit("except").alias("side"))
    )
    ints = (
        cust.filter(F.col("c_acctbal") > 9900)
        .select(F.col("c_nationkey").alias("nationkey"))
        .intersect(
            supp.filter(F.col("s_acctbal") > 9000).select(F.col("s_nationkey").alias("nationkey"))
        )
        .select("nationkey", F.lit("intersect").alias("side"))
    )
    return exc.unionAll(ints)


@register_extra(
    "q_cube_events",
    """SELECT event_type, CAST(year(ts) AS BIGINT) AS y, COUNT(*) AS n
       FROM events GROUP BY CUBE(event_type, y)""",
)
def q_cube_events(spark, sf_dir):
    """CUBE grouping sets over the event stream."""
    e = _t(spark, sf_dir, "events").withColumn("y", F.year("ts").cast("bigint"))
    return e.cube("event_type", "y").agg(F.count("*").alias("n"))


@register_extra(
    "q_window_ntile",
    """SELECT o_orderkey, o_orderstatus,
              ntile(4) OVER w AS quartile,
              ROUND(cume_dist() OVER w, 6) AS cume
       FROM orders WHERE o_totalprice > 450000
       WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""",
)
def q_window_ntile(spark, sf_dir):
    """Distribution window functions (ntile buckets + cumulative
    distribution) — deterministic under the total tie-break order."""
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
    )


@register_extra(
    "q_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total,
              CAST(grouping(o_orderstatus) AS BIGINT) * 2
              + CAST(grouping(o_orderpriority) AS BIGINT) AS gid
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                               (o_orderstatus), (o_orderpriority), ())""",
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS with a grouping id distinguishing the
    aggregation level. The four sets cover the full ROLLUP lattice
    ((status, priority), (status), ()) plus a set not derivable from
    rollup/cube ((priority)), so the former standalone rollup entry is
    subsumed — one shuffle computes every level."""
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_gs")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
                  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total,
                  CAST(grouping(o_orderstatus) AS BIGINT) * 2
                  + CAST(grouping(o_orderpriority) AS BIGINT) AS gid
           FROM __orders_gs
           GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                   (o_orderstatus), (o_orderpriority), ())"""
    )


@register_extra(
    "q_date_arithmetic",
    """SELECT o_orderkey,
              CAST(o_orderdate AS DATE) AS d,
              datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS days_to_98,
              CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus3m,
              last_day(CAST(o_orderdate AS DATE)) AS month_end
       FROM orders WHERE o_orderkey < 200""",
)
def q_date_arithmetic(spark, sf_dir):
    """Date arithmetic parity: day difference, month addition (both
    engines clamp to month end), last_day."""
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 200)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.datediff(F.lit("1998-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
                "days_to_98"
            ),
            F.add_months(F.col("o_orderdate").cast("date"), 3).alias("plus3m"),
            F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        )
    )


@register_extra(
    "q_explode_top_tokens",
    """WITH toks AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
         FROM documents
       )
       SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS df
       FROM toks WHERE length(token) >= 4
       GROUP BY token ORDER BY n DESC, token LIMIT 20""",
)
def q_explode_top_tokens(spark, sf_dir):
    """Lateral/explode surface: token stream via explode (one shuffle
    for the count-distinct aggregation), top-20 with total tie-break."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(text.tokens_col(F.col("text"))).alias("token")
    )
    return (
        toks.filter(F.length("token") >= 4)
        .groupBy("token")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("df"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register_extra(
    "q7_volume_shipping",
    """SELECT supp_nation, cust_nation, l_year,
              CAST(ROUND(SUM(vol), 2) AS DOUBLE) AS revenue
       FROM (
         SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                CAST(year(l_shipdate) AS BIGINT) AS l_year,
                CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol
         FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
              JOIN orders ON o_orderkey = l_orderkey
              JOIN customer ON c_custkey = o_custkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
              JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
           AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       ) GROUP BY supp_nation, cust_nation, l_year""",
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by
    year. Both nation sides broadcast (bounded dims); the fact-fact
    lineitem⨝orders join and customer join are hint-free for AQE."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    vol = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.round(F.sum(vol), 2).cast("double").alias("revenue"))
    )


@register_extra(
    "q8_market_share",
    """SELECT o_year,
              ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE CAST(0 AS DECIMAL(21,8)) END) AS DOUBLE)
                    / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
       FROM (
         SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4))) AS vol,
                n1.n_name AS supp_nation
         FROM lineitem JOIN part ON l_partkey = p_partkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN orders ON l_orderkey = o_orderkey
              JOIN nation n1 ON s_nationkey = n1.n_nationkey
         WHERE p_type = 'STANDARD' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       ) GROUP BY o_year""",
)
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of STANDARD-part revenue by
    year — conditional decimal sums, double division only at the end."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    n = _t(spark, sf_dir, "nation")
    vol = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    nat = F.when(F.col("n_name") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(21,8)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(F.sum(nat).cast("double") / F.sum(vol).cast("double"), 6).alias("mkt_share")
        )
    )


@register_extra(
    "q_min_per_group_subquery",
    """SELECT s_suppkey, s_nationkey, s_acctbal
       FROM supplier
       WHERE s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                          WHERE s2.s_nationkey = supplier.s_nationkey)""",
)
def q_min_per_group_subquery(spark, sf_dir):
    """Correlated scalar-subquery shape (TPC-H Q2's min-per-group):
    expressed as a min window over the group — one shuffle, no
    self-join (Catalyst decorrelates the subquery form into an
    aggregate+join; the window is strictly leaner)."""
    w = Window.partitionBy("s_nationkey")
    return (
        _t(spark, sf_dir, "supplier")
        .withColumn("__min", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__min"))
        .select("s_suppkey", "s_nationkey", "s_acctbal")
    )


@register_extra(
    "q13_customer_distribution",
    """SELECT c_count, COUNT(*) AS custdist
       FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
             FROM customer LEFT JOIN orders
               ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             GROUP BY c_custkey)
       GROUP BY c_count""",
)
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: outer join with an ON-clause residual (the
    non-matching customers must survive with count 0 — a WHERE would
    delete them), then a distribution-of-counts re-aggregation. Both
    groupBys reduce before they shuffle; the second input is one row
    per customer."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register_extra(
    "q15_top_supplier",
    """WITH rev AS (
         SELECT l_suppkey AS s_suppkey,
                SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * (1 - CAST(l_discount AS DECIMAL(12,4)))) AS r
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1998-01-01' AND l_shipdate < TIMESTAMP '1998-04-01'
         GROUP BY 1
       )
       SELECT s.s_suppkey, s_name, CAST(ROUND(r, 2) AS DOUBLE) AS total_revenue
       FROM supplier s JOIN rev USING (s_suppkey)
       WHERE r = (SELECT MAX(r) FROM rev)""",
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier by quarterly revenue): the view +
    scalar-max subquery becomes one grouped reduction, a 1-row max
    cross-joined back (no unpartitioned window, no re-scan of the
    fact), and a broadcast dimension join. The max comparison runs on
    the EXACT decimal; rounding is output-only."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(
            F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
        ).alias("r")
    )
    mx = rev.agg(F.max("r").alias("mx"))
    s = _t(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(mx)
        .filter(F.col("r") == F.col("mx"))
        .join(F.broadcast(s), "s_suppkey")
        .select("s_suppkey", "s_name", F.round("r", 2).cast("double").alias("total_revenue"))
    )


@register_extra(
    "q17_small_quantity_revenue",
    """SELECT CAST(ROUND(ROUND(SUM(CAST(l1.l_extendedprice AS DECIMAL(12,4))), 2) / 7.0, 6) AS DOUBLE) AS avg_yearly
       FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
       WHERE p_brand = 'Brand#1'
         AND l1.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                              WHERE l2.l_partkey = l1.l_partkey)""",
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape (correlated per-part average): the correlated
    subquery decorrelates into an avg WINDOW over the brand-filtered
    fact — one shuffle on l_partkey, no self-join of lineitem. The
    brand dimension broadcasts. The decimal sum is rounded BEFORE the
    /7 double division so both engines divide the identical exact
    value."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")), F.col("l_partkey") == F.col("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("__avg_qty", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.2 * F.col("__avg_qty"))
        .agg(
            F.round(
                F.round(F.sum(F.col("l_extendedprice").cast(DEC)), 2) / F.lit(7.0), 6
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


@register_extra(
    "q18_large_volume_customers",
    """SELECT c_custkey, c_name, o_orderkey,
              CAST(o_totalprice AS DOUBLE) AS o_totalprice,
              CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty
       FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
       GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
       HAVING SUM(CAST(l_quantity AS DECIMAL(12,4))) > 200""",
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): aggregate the fact FIRST
    (per-order quantity, HAVING > 200), then join the two dimensions —
    the join input shrinks from 60k line items to ~900 orders before
    any dimension shuffle. The HAVING comparison runs on the exact
    decimal."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("sq"))
        .filter(F.col("sq") > 200)
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("sq").cast("double").alias("sum_qty"),
        )
    )


@register_extra(
    "q22_dormant_balances",
    """WITH seg AS (
         SELECT * FROM customer
         WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE', 'MACHINERY') AND c_acctbal > 0
       ),
       tot AS (
         SELECT COUNT(*) AS cnt, SUM(CAST(c_acctbal AS DECIMAL(12,4))) AS t FROM seg
       ),
       eligible AS (
         SELECT c_custkey, c_mktsegment, c_acctbal FROM seg, tot
         WHERE CAST(c_acctbal AS DECIMAL(12,4)) * cnt > t
       )
       SELECT c_mktsegment AS segment, COUNT(*) AS numcust,
              CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,4))), 2) AS DOUBLE) AS totacctbal
       FROM eligible e
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = e.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '2001-01-01')
       GROUP BY 1""",
)
def q22_dormant_balances(spark, sf_dir):
    """TPC-H Q22 shape (above-average balances with no recent orders):
    the global-average threshold is expressed as the exact decimal
    cross-multiplication acctbal*cnt > sum — a float average would
    make the boundary rows nondeterministic between engines — and the
    NOT EXISTS becomes a left_anti against the date-filtered orders
    (anti join input pre-filtered, never the whole fact)."""
    seg = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE", "MACHINERY")
        & (F.col("c_acctbal") > 0)
    )
    tot = seg.agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("c_acctbal").cast(DEC)).alias("t"),
    )
    eligible = seg.crossJoin(tot).filter(
        F.col("c_acctbal").cast(DEC) * F.col("cnt") > F.col("t")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2001-01-01"
    )
    dormant = eligible.join(
        recent, eligible.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("numcust"),
        F.round(F.sum(F.col("c_acctbal").cast(DEC)), 2).cast("double").alias("totacctbal"),
    )


@register_extra(
    "q_string_agg_sorted",
    """SELECT s_nationkey, string_agg(s_name, ',' ORDER BY s_name) AS names,
              CAST(to_json(list_sort(list(s_name))) AS VARCHAR) AS names_arr,
              COUNT(*) > 2 AS has_many, COUNT(*) AS n
       FROM supplier WHERE s_acctbal > 9000
       GROUP BY s_nationkey""",
)
def q_string_agg_sorted(spark, sf_dir):
    """Ordered string aggregation: collect → sort → join gives a
    deterministic result under any partitioning (an UNORDERED listagg
    is nondeterministic at scale and would never hash-match). Also the
    catalog's typed-output proof row: ``names_arr`` (the sorted ARRAY,
    emitted in its canonical JSON-string form because the driver's
    pandas canonicalizer cannot factorize raw list cells) and
    ``has_many`` (BOOLEAN) exercise output classes no other entry
    emits against the driver hasher. The raw-ARRAY variant lives in
    the EXTRA tier (q_string_agg_raw_array) under the engine's own
    oracle check, which handles list cells."""
    return (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("s_name")), ",").alias("names"),
            F.to_json(F.array_sort(F.collect_list("s_name"))).alias("names_arr"),
            (F.count("*") > 2).alias("has_many"),
            F.count("*").alias("n"),
        )
    )


@register_extra(
    "q_string_agg_raw_array",
    """SELECT s_nationkey, list_sort(list(s_name)) AS names_arr, COUNT(*) AS n
       FROM supplier WHERE s_acctbal > 9000
       GROUP BY s_nationkey""",
)
def q_string_agg_raw_array(spark, sf_dir):
    """Raw ARRAY<STRING>-typed output proof, EXTRA tier only: the
    driver's pandas canonicalizer cannot factorize list cells (the
    r4 q_string_agg_sorted failure), but the engine's own oracle
    check (tools/check_oracles.py) stringifies cells and digests
    lists fine — so the raw-array representation stays proven here
    while the driver-tier entry carries the JSON-string form."""
    return (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(
            F.array_sort(F.collect_list("s_name")).alias("names_arr"),
            F.count("*").alias("n"),
        )
    )


@register_extra(
    "q_skew_salted_join",
    """SELECT c_mktsegment,
              COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,4))), 2) AS DOUBLE) AS total
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY 1""",
)
def q_skew_salted_join(spark, sf_dir):
    """The explicit skew-resilient equi join
    (operators/skew.py:salted_join) proven at catalog level: the big
    side (orders) carries a deterministic row-content salt, the small
    side (customer) replicates once per salt value, and the result
    must equal the PLAIN join — the oracle runs exactly that, so the
    salt/replicate/join/unsalt pipeline is value-gated end-to-end
    (the salted-aggregation twin q_skew_salted_agg has held a driver
    row since round 6). Money closes with the q1 ROUND(dec,2)::DOUBLE
    canonicalization."""
    big = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    small = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment"
    )
    j = skew.salted_join(big, small, on=["custkey"], salt_buckets=8)
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast(DEC)), 2).cast("double").alias("total"),
    )


@register(
    "q_skew_salted_agg",
    """SELECT event_type,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value,
              MIN(value) AS min_value, MAX(value) AS max_value,
              COUNT(*) AS n
       FROM events GROUP BY event_type""",
)
def q_skew_salted_agg(spark, sf_dir):
    """Hot-key aggregation routed through the two-phase salted
    aggregate (operators/skew.py:20): events has 5 pathologically hot
    event_type keys, which at 100 TB would pin one reducer each under a
    plain groupBy — the salt spreads each key over 16 sub-keys and the
    partials re-aggregate losslessly. Values must equal the UNSALTED
    GROUP BY oracle exactly; sums run on DECIMAL because float partial
    sums would drift with the salt bucketing."""
    e = _t(spark, sf_dir, "events").withColumn("v", F.col("value").cast("decimal(18,6)"))
    agg = skew.salted_aggregate(
        e, ["event_type"], sum_cols=["v"], min_cols=["value"], max_cols=["value"], count=True
    )
    return agg.select(
        "event_type",
        F.round("sum_v", 2).cast("double").alias("sum_value"),
        "min_value",
        "max_value",
        "n",
    )


@register_extra(
    "q_skew_report",
    """WITH counts AS (
           SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
       ),
       totals AS (SELECT SUM(n) AS total, COUNT(*) AS nkeys FROM counts)
       SELECT event_type, n,
              CAST((n * 2000000 + total) // (2 * total) AS DOUBLE) / 10000.0
                  AS share_pct,
              CAST((n * nkeys * 200 + total) // (2 * total) AS DOUBLE) / 100.0
                  AS skew_factor,
              CAST(CASE WHEN CAST(n AS DOUBLE) * nkeys / total <= 2.0 THEN 1
                        ELSE LEAST(CAST(CEIL(CAST(n AS DOUBLE) * nkeys / total) AS BIGINT), 1024)
                   END AS INTEGER) AS suggested_salt
       FROM counts, totals
       ORDER BY n DESC, event_type LIMIT 10""",
)
def q_skew_report(spark, sf_dir):
    """The decide-before-you-salt diagnostic (operators/skew.py:94) as
    an oracle-gated entry: heaviest keys with corpus share, skew factor
    (key rows ÷ mean rows/key — the reducer imbalance a plain shuffle
    suffers) and the r7 suggested_salt that feeds straight into
    salted_aggregate. One partial-agg shuffle + TakeOrdered; the two
    corpus scalars ride a 1-row broadcast."""
    return skew.skew_report(_t(spark, sf_dir, "events"), ["event_type"], k=10)


_STREAM_STORES: dict[str, object] = {}


@register(
    "q_stream_ingest",
    """SELECT doc_id, lang, n_chars FROM documents WHERE doc_id < 60""",
)
def q_stream_ingest(spark, sf_dir):
    """S12/S14/L16 streaming semantics end-to-end (streaming/ingest.py):
    the first 60 documents become PUT commands on a command log,
    consumed by run_command_stream — Structured Streaming foreachBatch,
    bucket-partitioned executor-side apply, checkpoint + batch-id
    watermark — then the ingested collection is queried back through
    the store and must match the source table value-for-value."""
    store = _STREAM_STORES.get(sf_dir)
    if store is None:
        import tempfile

        from .store import DocumentStore
        from .streaming import run_command_stream, write_commands

        rows = (
            _t(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 60)
            .select("doc_id", "lang", "n_chars")
            .collect()  # 60 rows by contract: command production is the producer side
        )
        commands = [
            {
                "seq": i + 1,
                "method": "put",
                "path": f"sdocs~/{int(r.doc_id):06d}",
                "body": {"doc_id": int(r.doc_id), "lang": r.lang, "n_chars": int(r.n_chars)},
            }
            for i, r in enumerate(rows)
        ]
        store = DocumentStore(tempfile.mkdtemp(prefix="hs_stream_"), spark=spark)
        tmp = tempfile.mkdtemp(prefix="hs_stream_log_")
        write_commands(f"{tmp}/commands", commands)
        run_command_stream(spark, store, f"{tmp}/commands", f"{tmp}/ckpt")
        _STREAM_STORES[sf_dir] = store
    res = store.query("sdocs~", sort=[SortBy("id")], size=100)
    return _items_df(spark, res.items, "doc_id long, lang string, n_chars long")


# --------------------------------------------------------------------------
# dedup_* / ann_* / text_* / mm_* — pipeline operators
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS canonical_doc_id, COUNT(*) AS dup_count
       FROM documents WHERE text IS NOT NULL
       GROUP BY 1 HAVING COUNT(*) > 1""",
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_duplicates(_t(spark, sf_dir, "documents"))


_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3
),
sh0 AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx
),
-- document-frequency cap (mirrors ngram_jaccard_pairs max_df=100):
-- stop-shingles carry no signal and are the quadratic skew term
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= 100)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 6) AS jaccard
FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5
"""


@register("dedup_ngram_jaccard", _JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    # max_df passed explicitly: the operator's default is the exact
    # (uncapped) contract; the catalog opts into the df-capped scale
    # path, and the oracle SQL above caps identically
    return dedup.ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.5, max_df=100)


@register_extra("dedup_ngram_autoroute", _JACCARD_SQL)
def dedup_ngram_autoroute(spark, sf_dir):
    """dedup_ngram_jaccard with the r12 posting-mass budget armed: the
    production spelling of the exact path. At the gate SFs the measured
    mass (Σ C(df,2) over retained lists — sf0.1: ~1.3M) sits far below
    the 10M budget, so this is bit-identical to the exact entry and the
    same oracle gates it; past the budget (the sf1 smoke's replicated
    corpus measures ~100M) the call reroutes itself to auto-sized
    minhash_lsh_pairs instead of emitting a quadratic candidate set —
    closing the one superlinear region r11 measured (79× pairs on 10×
    data below the df cap, SCALE.md)."""
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"),
        threshold=0.5,
        max_df=100,
        candidate_budget=10_000_000,
    )


@register_extra(
    "dedup_embedding_cosine",
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
              ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 6) AS cosine
       FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
       WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])) >= 0.45""",
)
def dedup_embedding_cosine(spark, sf_dir):
    """Exact all-pairs cosine — the small-n oracle twin of
    dedup_embedding_lsh (which is the bucketed scale path)."""
    return dedup.embedding_cosine_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.45)


@register_extra(
    "dedup_embedding_lsh",
    """WITH pairs AS (
         SELECT a.vec_id AS a_id, b.vec_id AS b_id
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) >= 0.45
       )
       SELECT COUNT(*) AS n_exact_pairs,
              true AS precision_exact,
              true AS recall_ok
       FROM pairs""",
)
def dedup_embedding_lsh(spark, sf_dir):
    """Bucketed embedding near-dup (multi-table hyperplane LSH +
    exact-cosine verify), driven through its contract: every emitted
    pair must appear in the exact all-pairs set WITH the identical
    rounded cosine (precision_exact — the verify step computes true
    cosines, so this must hold exactly), and recall ≥ 0.9 of the
    exact set (measured 13/14 at sf0.01; pytest pins ≥ 0.9). The
    quadratic exact twin appears here only as the in-plan verifier of
    a gate row at gate SF — the scale path (the raw operator, EXTRA
    tier dedup_embedding_lsh_raw) never does an all-pairs join."""
    emb = _t(spark, sf_dir, "embeddings")
    lsh = dedup.embedding_lsh_pairs(emb, threshold=0.45).select("a_id", "b_id", "cosine")
    exact = dedup.embedding_cosine_pairs(emb, threshold=0.45)
    n_found = lsh.agg(F.count("*").alias("n_found"))
    n_true = (
        lsh.join(exact, ["a_id", "b_id", "cosine"], "left_semi")
        .agg(F.count("*").alias("n_true"))
    )
    n_exact = exact.agg(F.count("*").alias("n_exact_pairs"))
    return (
        n_exact.crossJoin(n_found)
        .crossJoin(n_true)
        .select(
            "n_exact_pairs",
            (F.col("n_true") == F.col("n_found")).alias("precision_exact"),
            (F.col("n_true") * 10 >= F.col("n_exact_pairs") * 9).alias("recall_ok"),
        )
    )


# Connected components as a recursive CTE: seed every node with its own
# id, propagate labels along edges to a fixed point (DuckDB's UNION
# dedup terminates the recursion), take the min label per node. The
# pair graph is the SAME df-capped Jaccard set the dedup_ngram_jaccard
# entry is pinned on, so this oracle checks the clustering END TO END:
# pair generation AND the component labeling.
_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({_JACCARD_SQL}),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach(node, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node
"""


# ONE FastSS one-shot oracle (deletion neighborhoods + hot-block cap +
# levenshtein verify over custkey<1500) shared by dedup_fuzzy_keys and
# dedup_fuzzy_incremental — two verbatim copies previously had to be
# edited in lockstep (the _CLUSTERS_SQL/_JACCARD_SQL sharing pattern).
_FASTSS_SQL = """WITH s AS (SELECT c_custkey AS id, c_name AS k
                  FROM customer WHERE c_custkey < 1500 AND c_name IS NOT NULL),
       v0 AS (
         SELECT id, k,
                unnest(list_append(
                  list_transform(range(1, len(k)+1),
                                 i -> substr(k, 1, i-1) || substr(k, i+1, len(k))),
                  k)) AS var
         FROM s
       ),
       hot AS (SELECT var FROM v0 GROUP BY var HAVING COUNT(*) > 64),
       v AS (SELECT * FROM v0 WHERE var NOT IN (SELECT var FROM hot)),
       cand AS (
         SELECT DISTINCT a.id AS a_id, b.id AS b_id, a.k AS ak, b.k AS bk
         FROM v a JOIN v b ON a.var = b.var AND a.id < b.id
       )
       SELECT a_id, b_id, CAST(levenshtein(ak, bk) AS BIGINT) AS dist
       FROM cand WHERE levenshtein(ak, bk) <= 1"""


@register_extra(
    "dedup_fuzzy_incremental",
    _FASTSS_SQL,
)
def dedup_fuzzy_incremental(spark, sf_dir):
    """The persisted-index incremental face of fuzzy-key resolution
    (operators/dedup.py:fuzzy_key_index / fuzzy_key_pairs_incremental)
    — the same discipline as the MinHash/embedding/PQ incremental
    entries: an index built on the corpus (custkey<1200), a new batch
    (1200–1499) joined against it at O(batch × block), and the
    DECOMPOSITION contract value-gated — pairs(corpus) ∪
    incremental(batch, index) must equal the oracle's ONE-SHOT FastSS
    run over the union, row for row. The incremental side caps blocks
    over the union universe so the cap can never make ITS half
    diverge; the base half caps over the corpus — customer-name
    blocks top out at 10 (digit positions), far under 64, so no cap
    binds anywhere at gate scope (the cap is a scale valve, not
    semantics)."""
    cust = _t(spark, sf_dir, "customer")
    corpus = cust.filter(F.col("c_custkey") < 1200)
    batch = cust.filter((F.col("c_custkey") >= 1200) & (F.col("c_custkey") < 1500))
    idx = dedup.fuzzy_key_index(corpus, key_col="c_name", id_col="c_custkey")
    inc = dedup.fuzzy_key_pairs_incremental(
        idx, batch, key_col="c_name", id_col="c_custkey"
    )
    base = dedup.fuzzy_key_pairs(corpus, key_col="c_name", id_col="c_custkey")
    return base.unionByName(inc).distinct()


@register_extra(
    "graph_triangle_stats",
    f"""WITH pairs AS ({{JACCARD}}),
e AS (SELECT DISTINCT least(a_id, b_id) AS u, greatest(a_id, b_id) AS v
      FROM pairs WHERE a_id <> b_id),
nbrs AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM nbrs GROUP BY 1),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
                CAST(SUM(CAST(d AS HUGEINT) * (d - 1)) // 2 AS BIGINT) AS n_wedges
         FROM deg),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM e ab JOIN e bc ON ab.v = bc.u
                  JOIN e ac ON ac.u = ab.u AND ac.v = bc.v),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
SELECT n_nodes, n_edges, n_triangles, n_wedges,
       ROUND(CASE WHEN n_wedges > 0
                  THEN CAST(3 * CAST(n_triangles AS HUGEINT) AS DOUBLE)
                       / CAST(n_wedges AS DOUBLE) END, 6) AS transitivity
FROM base, tri, ne""".replace("{JACCARD}", _JACCARD_SQL),
)
def graph_triangle_stats(spark, sf_dir):
    """Triangle census of the near-dup pair graph
    (operators/graph.py:triangle_stats): n_triangles, wedges, and the
    global transitivity 3T/W — the clique-ness diagnostic for
    connected-components dedup (transitivity near 1 = components are
    cliques, safe to collapse; near 0 = chains, CC is bridging
    dissimilar documents through intermediates). Canonical-order
    enumeration counts each triangle once via two equi-joins; wedge
    sums accumulate in decimal(38,0)/HUGEINT (quadratic in degree);
    transitivity is one rounded double division. The oracle replays
    the identical pair set (the _JACCARD_SQL reused by the cluster
    entries) plus the same census."""
    from .operators import graph as graph_ops

    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_df=100
    )
    return graph_ops.triangle_stats(pairs, src_col="a_id", dst_col="b_id")


@register_extra(
    "dedup_cluster_stats",
    f"""WITH clusters AS ({_CLUSTERS_SQL}),
s AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM clusters GROUP BY 1)
SELECT cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
       CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS removable
FROM s GROUP BY 1""",
)
def dedup_cluster_stats(spark, sf_dir):
    """The dedup savings report (operators/dedup.py:cluster_stats):
    cluster-size histogram over the near-dup components with the rows
    a keep-one-per-cluster pass would delete at each size — the
    sizing summary a 100 TB dedup run ends with before committing to
    the rewrite. Runs the full pair generator + distributed CC
    in-plan (the dedup_clusters stack); the oracle replays pairs +
    recursive-CTE labeling + the same integer histogram, so the check
    is end-to-end. All-integer output, exact in both engines."""
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_df=100
    )
    return dedup.cluster_stats(dedup.duplicate_clusters(pairs))


@register_extra("dedup_clusters", _CLUSTERS_SQL)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate CLUSTERS (operators/dedup.py:duplicate_clusters):
    connected components of the df-capped n-gram-Jaccard pair graph,
    labeled by component-minimum doc_id — the "keep one per cluster"
    decision pairwise output alone cannot make (similarity is not
    transitive). Distributed alternating large-star/small-star, driver
    holds only a per-round checksum; the oracle replays it as a DuckDB
    recursive CTE over the identical pair set, so the check is
    end-to-end (pairs + labeling), not just the graph step."""
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_df=100
    )
    return dedup.duplicate_clusters(pairs).orderBy("doc_id")


@register_extra(
    "ts_holt_forecast",
    """WITH RECURSIVE base AS (
  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
nb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn FROM base),
hw(event_type, rn, level, trend) AS (
  SELECT event_type, 1, y, CAST(0.0 AS DOUBLE) FROM nb WHERE rn = 1
  UNION ALL
  SELECT b.event_type, b.rn,
         0.5 * b.y + 0.5 * (h.level + h.trend),
         0.25 * ((0.5 * b.y + 0.5 * (h.level + h.trend)) - h.level) + 0.75 * h.trend
  FROM hw h JOIN nb b ON b.event_type = h.event_type AND b.rn = h.rn + 1
),
last AS (SELECT event_type, MAX(rn) AS n FROM hw GROUP BY 1)
SELECT h.event_type, CAST(l.n AS BIGINT) AS n, h.level, h.trend,
       h.level + h.trend AS forecast
FROM hw h JOIN last l ON h.event_type = l.event_type AND h.rn = l.n""",
)
def ts_holt_forecast(spark, sf_dir):
    """Holt linear-trend smoothing + one-step forecast per event type
    over the daily value series (operators/timeseries.py:holt_linear).
    The recurrence is sequential per key — the applyInPandas custom-
    operator path, keys partitioning the work — and α=0.5 / β=0.25 are
    EXACT binary fractions, so the DuckDB recursive CTE replays the
    identical IEEE operation order and the unrounded doubles match
    bit-for-bit (series built from exact decimal daily sums cast to
    double identically in both engines)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("y"))
    )
    return timeseries.holt_linear(
        daily, ["event_type"], "day", "y", alpha=0.5, beta=0.25
    ).orderBy("event_type")


_CONTAM_RADIUS_SQL = f"""
WITH RECURSIVE pairs AS ({{jaccard}}),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs
  UNION
  SELECT b_id, a_id FROM pairs
),
reach(doc_id, hops) AS (
  SELECT doc_id, 0 FROM documents WHERE doc_id % 97 = 0
  UNION
  SELECT e.v, r.hops + 1 FROM reach r JOIN edges e ON e.u = r.doc_id
  WHERE r.hops < 2
)
SELECT doc_id, CAST(MIN(hops) AS INT) AS hops FROM reach GROUP BY doc_id
"""


@register("dedup_contamination_radius", _CONTAM_RADIUS_SQL.format(jaccard=_JACCARD_SQL))
def dedup_contamination_radius(spark, sf_dir):
    """Transitive decontamination
    (operators/dedup.py:contamination_radius): every document within
    2 hops of a seed in the near-dup pair graph, with its BFS
    distance — the eval-hygiene radius around benchmark matches (a
    near-dup of a contaminated document leaks the benchmark just as
    well as the match itself; unbounded components over-delete). The
    seed set here is the deterministic doc_id % 97 slice standing in
    for the decontaminate match set; the oracle replays pair
    generation AND the bounded BFS as a hop-counting recursive CTE,
    so the row is end-to-end (pairs + traversal + min-hop
    labeling)."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    seeds = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0).select("doc_id")
    return dedup.contamination_radius(pairs, seeds, max_hops=2).orderBy("doc_id")


_KEEP_BEST_SQL = f"""
WITH clusters AS ({_CLUSTERS_SQL}),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM clusters GROUP BY 1),
ranked AS (
  SELECT c.cluster_id, c.doc_id, d.n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY c.cluster_id ORDER BY d.n_chars DESC, c.doc_id
         ) AS rn
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT r.cluster_id, r.doc_id AS kept_doc_id, s.cluster_size,
       r.n_chars AS kept_n_chars
FROM ranked r JOIN sizes s USING (cluster_id) WHERE r.rn = 1
"""


@register_extra("dedup_keep_best", _KEEP_BEST_SQL)
def dedup_keep_best(spark, sf_dir):
    """The dedup DECISION (operators/dedup.py:keep_best_per_cluster):
    one surviving document per near-dup cluster, chosen by max n_chars
    (tie → min doc_id) — the keep-best policy corpus preps apply after
    clustering, where keep-first loses the best copy whenever crawl
    order and quality disagree. The oracle replays pair generation,
    the recursive-CTE connected components, AND the keep decision, so
    the row is end-to-end: a drift anywhere in the pipeline reddens
    it. Output is the per-cluster decision (cluster id, winner, size,
    winning score); the kept corpus itself is the operator's return."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    clusters = dedup.duplicate_clusters(pairs)
    kept = dedup.keep_best_per_cluster(docs, clusters, score_col="n_chars")
    winners = kept.select("doc_id", "n_chars").join(clusters, "doc_id")
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return winners.join(sizes, "cluster_id").select(
        "cluster_id",
        F.col("doc_id").alias("kept_doc_id"),
        "cluster_size",
        F.col("n_chars").alias("kept_n_chars"),
    )


@register_extra(
    "q_domain_mixture_contract",
    """SELECT lang AS domain, true AS share_ok, true AS saturated_ok, true AS no_upsample
       FROM documents WHERE lang IS NOT NULL GROUP BY 1""",
)
def q_domain_mixture_contract(spark, sf_dir):
    """Domain-mixture resampling (operators/sampling.py:domain_mixture)
    under a 40/15/15/15/15 language target, driven through its
    contract: every realized share lands within 5 points of target
    (share_ok — the content-hash Bernoulli is deterministic, so this
    is a fixed property of the corpus, not a flaky draw), the binding
    domain keeps ~all its rows (saturated_ok — the mixture wastes no
    keepable data), and no domain exceeds its availability
    (no_upsample). The kept-row set itself is hash-family-specific;
    what a pipeline depends on is the mixture, which this row pins."""
    weights = {"en": 0.4, "de": 0.15, "es": 0.15, "fr": 0.15, "zh": 0.15}
    docs = _t(spark, sf_dir, "documents")
    kept = sampling.domain_mixture(docs, "lang", weights)
    avail = docs.groupBy(F.col("lang").alias("domain")).agg(
        F.count("*").alias("n_avail")
    )
    got = kept.groupBy(F.col("lang").alias("domain")).agg(
        F.count("*").alias("n_kept")
    )
    tgt = F.create_map(*[x for d, w in weights.items() for x in (F.lit(d), F.lit(w))])
    joined = avail.join(got, "domain", "left").na.fill(0, ["n_kept"])
    total = joined.agg(F.sum("n_kept").alias("n_total"))
    per_domain = joined.crossJoin(total).select(
        "domain",
        (
            F.abs(F.col("n_kept") / F.col("n_total") - tgt[F.col("domain")]) <= 0.05
        ).alias("share_ok"),
        F.col("n_kept").alias("_k"),
        F.col("n_avail").alias("_a"),
    )
    saturated = per_domain.agg(
        (F.max(F.col("_k") / F.col("_a")) >= 1.0).alias("sat")
    )
    return (
        per_domain.crossJoin(saturated)
        .select(
            "domain",
            "share_ok",
            F.col("sat").alias("saturated_ok"),
            (F.col("_k") <= F.col("_a")).alias("no_upsample"),
        )
        .orderBy("domain")
    )


# The query batch is a fixed literal VALUES list so both engines see
# the identical retrieval workload; scores are ranked on full doubles
# and rounded to 6 only in the output (ln/avg run in IEEE double on
# both sides — a 1-ulp divergence sits ~10 orders below the rounding).
_BM25_SQL = """
WITH q(query_id, query) AS (
  VALUES ('q1', 'table scan'), ('q2', 'hash merge batch'), ('q3', 'window sort fast')
),
toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
dl AS (SELECT doc_id, len(list_filter(t, x -> x <> '')) AS dl FROM toks),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
post AS (
  SELECT doc_id, u AS term, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(t) AS u FROM toks)
  WHERE u <> '' GROUP BY 1, 2
),
dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
qterms AS (
  SELECT DISTINCT query_id, u AS term
  FROM (SELECT query_id, unnest(string_split_regex(trim(query), '\\s+')) AS u FROM q)
  WHERE u <> ''
),
scored AS (
  SELECT query_id, p.doc_id,
         SUM(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
  FROM qterms qt
  JOIN post p USING (term)
  JOIN dfreq f USING (term)
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
ranked AS (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, ROUND(score, 6) AS score, rank FROM ranked WHERE rank <= 10
"""


@register_extra("search_bm25_topk", _BM25_SQL)
def search_bm25_topk(spark, sf_dir):
    """Sparse lexical retrieval (operators/search.py:bm25_topk): Okapi
    BM25 top-10 per query over the documents corpus — the keyword
    counterpart of ann_cosine_topk's dense side. Postings + df are
    one-shuffle corpus reductions (reusable artifacts at scale); the
    query batch joins in unhinted (AQE broadcasts it), scoring is a
    grouped partial sum, top-k is a per-query rank window. The oracle
    replays the identical formula in SQL end to end."""
    queries = spark.createDataFrame(
        [("q1", "table scan"), ("q2", "hash merge batch"), ("q3", "window sort fast")],
        "query_id string, query string",
    )
    return search.bm25_topk(_t(spark, sf_dir, "documents"), queries, k=10)


# 1/log2(r+1) discount table, precomputed ONCE and embedded as
# shortest-repr double literals in BOTH engines: no runtime log2, whose
# last ulp may differ between libm and java.lang.Math (the same
# reasoning as the catalog's no-runtime-transcendental rule for
# hash-compared outputs). operators/search.py:ranking_metrics computes
# the identical list with the identical formula in the same process.
_NDCG_W = [1.0 / __import__("math").log2(r + 1) for r in range(1, 11)]
# string→DOUBLE cast per element, NOT a bare numeric array literal:
# DuckDB parses `0.38685280723454163` as DECIMAL(17,17) first and the
# decimal→double conversion lands one ulp off the correctly-rounded
# string parse for 3 of the 10 weights (measured) — the exact
# last-ulp class the precomputed table exists to eliminate
_NDCG_W_SQL = "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in _NDCG_W) + "]"

_RANKING_METRICS_SQL = f"""
{_BM25_SQL.split("SELECT query_id, doc_id, ROUND")[0]}
, qrels AS (
  SELECT query_id, doc_id,
         CASE WHEN m = 0 THEN 3 WHEN m <= 2 THEN 2 WHEN m <= 4 THEN 1 ELSE 0 END AS rel
  FROM (
    SELECT q.query_id, d.doc_id,
           CAST(('0x' || substr(md5(q.query_id || '|' || CAST(d.doc_id AS VARCHAR)), 1, 13))
                AS UBIGINT) % 20 AS m
    FROM (SELECT DISTINCT query_id FROM q) q
    CROSS JOIN (SELECT doc_id FROM documents WHERE doc_id < 400) d
  )
  WHERE (CASE WHEN m = 0 THEN 3 WHEN m <= 2 THEN 2 WHEN m <= 4 THEN 1 ELSE 0 END) > 0
),
joined AS (
  SELECT r.query_id, r.rank, COALESCE(qr.rel, 0) AS rel
  FROM ranked r LEFT JOIN qrels qr ON r.query_id = qr.query_id AND r.doc_id = qr.doc_id
  WHERE r.rank <= 10
),
run_m AS (
  SELECT query_id,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(list_sort(list({{'r': rank, 'g': rel}})),
                          x -> CAST(x.g AS DOUBLE) * ({_NDCG_W_SQL})[x.r])),
           (a, b) -> a + b) AS dcg,
         MIN(CASE WHEN rel > 0 THEN rank END) AS first_hit,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits
  FROM joined GROUP BY query_id
),
ideal AS (
  SELECT query_id,
         list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(list_reverse(list_sort(list(CAST(rel AS BIGINT))))[1:10],
                          (g, i) -> CAST(g AS DOUBLE) * ({_NDCG_W_SQL})[i])),
           (a, b) -> a + b) AS idcg,
         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS positives
  FROM qrels GROUP BY query_id
)
SELECT r.query_id,
       COALESCE(CASE WHEN i.idcg > 0 THEN r.dcg / i.idcg END, 0.0) AS ndcg,
       COALESCE(1.0 / r.first_hit, 0.0) AS mrr,
       CAST(r.hits AS DOUBLE) / 10.0 AS precision,
       COALESCE(CASE WHEN i.positives > 0
                     THEN CAST(r.hits AS DOUBLE) / CAST(i.positives AS DOUBLE) END,
                0.0) AS recall,
       r.hits,
       COALESCE(i.positives, 0) AS positives
FROM run_m r LEFT JOIN ideal i ON r.query_id = i.query_id
"""


@register_extra("search_ranking_metrics", _RANKING_METRICS_SQL)
def search_ranking_metrics(spark, sf_dir):
    """Retrieval-eval metrics (operators/search.py:ranking_metrics —
    nDCG@10 / MRR / precision / recall, the trec_eval core set) over
    the REAL BM25 ranker's run: the run is bm25_topk in-plan (the
    search_bm25_topk precedent — the oracle replays the identical
    Okapi formula in SQL), qrels are md5-derived graded relevance
    (integer 52-bit hash % 20 → grades 3/2/1 at 5%/10%/10% — the
    cross-engine md5-uniform discipline, zero doubles in the grade).
    DCG/IDCG fold their term lists in pinned rank order with a
    precomputed discount table (no runtime log2, no re-associating
    SUM), so every output double is bit-identical across engines.
    Scale: metric work is O(queries × k) after one k-bounded
    run↔qrels equi-join."""
    docs = _t(spark, sf_dir, "documents")
    queries = spark.createDataFrame(
        [("q1", "table scan"), ("q2", "hash merge batch"), ("q3", "window sort fast")],
        "query_id string, query string",
    )
    run = search.bm25_topk(docs, queries, k=10).select("query_id", "doc_id", "rank")
    # qrels via explode, not crossJoin: 3 literal query ids per doc row
    # keeps the plan CartesianProduct-free (the oracle's CROSS JOIN is
    # DuckDB-side only)
    v = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.col("query_id"), F.col("doc_id").cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % 20
    )
    qrels = (
        docs.filter(F.col("doc_id") < 400)
        .select(
            "doc_id",
            F.explode(F.array(F.lit("q1"), F.lit("q2"), F.lit("q3"))).alias("query_id"),
        )
        .withColumn(
            "rel",
            F.when(v == 0, 3).when(v <= 2, 2).when(v <= 4, 1).otherwise(0),
        )
        .filter(F.col("rel") > 0)
        .select("query_id", "doc_id", "rel")
    )
    return search.ranking_metrics(run, qrels, k=10).select(
        "query_id", "ndcg", "mrr", "precision", "recall", "hits", "positives"
    )


@register_extra(
    "q_cap_per_group",
    """WITH ranked AS (
         SELECT doc_id, lang,
                ROW_NUMBER() OVER (PARTITION BY lang
                                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
         FROM documents
       )
       SELECT doc_id, lang FROM ranked WHERE rn <= 50""",
)
def q_cap_per_group(spark, sf_dir):
    """Per-domain document cap (operators/sampling.py:cap_per_group):
    keep at most 50 docs per language, selected by a deterministic
    md5-of-id order both engines share — the mega-domain cap rule of
    corpus prep, reproducible with no sampler state. Output is the
    kept id set itself, so the oracle checks the exact selection, not
    just the counts."""
    return sampling.cap_per_group(
        _t(spark, sf_dir, "documents"), "lang", 50
    ).select("doc_id", "lang").orderBy("doc_id")


@register_extra(
    "q_pack_sequences_contract",
    """SELECT COUNT(*) AS n_docs,
              CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
              true AS assigned_once, true AS capacity_ok, true AS fill_ok
       FROM documents""",
)
def q_pack_sequences_contract(spark, sf_dir):
    """Sequence packing for training batches
    (operators/sampling.py:pack_sequences — hash-grouped
    first-fit-decreasing, applyInPandas over (id, count) pairs only),
    driven through its contract: every document assigned exactly once
    with total tokens conserved (n_docs/total_tokens must equal the
    corpus numbers the oracle computes directly), no sequence over the
    256-token budget (capacity_ok), and at most n_groups underfull
    bins (fill_ok — the FFD at-most-one-half-empty-bin-per-group
    guarantee). The assignment itself is engine-specific (bin order);
    the contract is the part a training pipeline depends on."""
    n_groups = 8
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(text.tokens_col(F.col("text"))).alias("n_tokens")
    )
    packed = sampling.pack_sequences(docs, max_tokens=256, n_groups=n_groups)
    seqs = packed.groupBy("seq_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("over"),
    )
    totals = packed.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("doc_id").alias("n_distinct"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    seq_stats = seqs.filter(F.col("over") == 0).agg(
        F.max("fill").alias("max_fill"),
        F.sum((F.col("fill") * 2 < 256).cast("long")).alias("n_underfull"),
    )
    return totals.crossJoin(seq_stats).select(
        F.col("n_rows").alias("n_docs"),
        "total_tokens",
        (F.col("n_rows") == F.col("n_distinct")).alias("assigned_once"),
        (F.col("max_fill") <= 256).alias("capacity_ok"),
        (F.col("n_underfull") <= n_groups).alias("fill_ok"),
    )


@register_extra(
    "dedup_incremental",
    """WITH hist AS (
         SELECT md5(text) AS text_hash FROM documents WHERE doc_id % 7 = 0
       ),
       batch AS (
         SELECT doc_id, md5(text) AS text_hash FROM documents WHERE doc_id % 7 <> 0
       ),
       fresh AS (
         SELECT * FROM batch WHERE text_hash NOT IN (SELECT text_hash FROM hist)
       ),
       first AS (
         SELECT doc_id, text_hash,
                ROW_NUMBER() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
         FROM fresh
       )
       SELECT doc_id, text_hash FROM first WHERE rn = 1""",
)
def dedup_incremental(spark, sf_dir):
    """Incremental (daily-batch) exact dedup
    (operators/dedup.py:incremental_exact_dedup): docs with
    doc_id % 7 = 0 play the already-ingested corpus (as its digest
    index); the rest arrive as the new batch and are admitted only if
    their hash is absent from the index AND first within the batch —
    one left_anti equi-join on the 32-byte digest plus a first-row
    window, never a re-dedup of the corpus."""
    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.md5("text").alias("text_hash")
    )
    batch = docs.filter(F.col("doc_id") % 7 != 0)
    return (
        dedup.incremental_exact_dedup(batch, hist)
        .select("doc_id", "text_hash")
        .orderBy("doc_id")
    )


# Benchmark split: doc_id % 13 = 0 plays the eval benchmark, the rest
# is the training corpus — deterministic, so both engines derive the
# identical partition. 5-gram shingles (every test doc has ≥ 10
# tokens; the operator's 13-gram default is the published convention
# for real corpora).
_DECONTAM_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i FROM toks WHERE len(t) >= 5
),
sh AS (
  SELECT DISTINCT doc_id,
         t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS shingle
  FROM idx
),
bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 13 = 0),
train_ids AS (SELECT doc_id FROM documents WHERE doc_id % 13 <> 0),
totals AS (
  SELECT doc_id, COUNT(*) AS n_ngrams FROM sh WHERE doc_id % 13 <> 0 GROUP BY 1
),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_hit_ngrams
  FROM sh s JOIN bench b USING (shingle)
  WHERE s.doc_id % 13 <> 0 GROUP BY 1
)
SELECT t.doc_id,
       COALESCE(tt.n_ngrams, 0) AS n_ngrams,
       COALESCE(h.n_hit_ngrams, 0) AS n_hit_ngrams,
       COALESCE(h.n_hit_ngrams, 0) >= 1 AS contaminated
FROM train_ids t
LEFT JOIN totals tt USING (doc_id)
LEFT JOIN hits h USING (doc_id)
"""


@register("text_decontaminate", _DECONTAM_SQL)
def text_decontaminate(spark, sf_dir):
    """Eval-benchmark decontamination
    (operators/dedup.py:benchmark_contamination): flag every training
    document sharing an n-gram with the benchmark corpus — the
    leakage check LLM training pipelines run before a corpus ships.
    One unhinted equi-join of train shingle hashes against the
    distinct benchmark shingle set (AQE broadcasts the benchmark side
    when small), then a per-document count; short docs surface with
    zero counts instead of vanishing."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 13 != 0)
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    return dedup.benchmark_contamination(train, bench, n=5).orderBy("doc_id")


# The WHOLE corpus-prep flow in one plan and one oracle: quality gate
# → eval-benchmark decontamination → near-dup clustering with
# keep-one-per-component → per-language corpus stats. Every stage is
# oracle-checked on its own elsewhere; this entry proves the
# COMPOSITION (Catalyst fuses the stages; the recursive-CTE labeling
# runs inside the same oracle query).
_PREP_SQL = """
WITH RECURSIVE base AS (
  SELECT doc_id, lang, text,
         len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> lower(x) IN ('the','and','of','a','is'))) AS stop
  FROM documents
),
kept AS (
  SELECT doc_id, lang, text, n_tokens FROM base
  WHERE ROUND(least(n_tokens / 100.0, 1.0) * 0.5
        + 0.3 * (1.0 - least(ROUND(punct * 1.0 / greatest(n_chars, 1), 6) * 4, 1.0))
        + 0.2 * least(ROUND(stop * 1.0 / greatest(n_tokens, 1), 6) * 5, 1.0), 6) >= 0.5
),
train AS (SELECT * FROM kept WHERE doc_id % 13 <> 0),
toks5 AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
  WHERE doc_id % 13 = 0
),
bench_sh AS (
  SELECT DISTINCT t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS shingle
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i FROM toks5 WHERE len(t) >= 5)
),
train5 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM train),
train_sh AS (
  SELECT DISTINCT doc_id,
         t[i]||' '||t[i+1]||' '||t[i+2]||' '||t[i+3]||' '||t[i+4] AS shingle
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i FROM train5 WHERE len(t) >= 5)
),
contaminated AS (
  SELECT DISTINCT s.doc_id FROM train_sh s JOIN bench_sh b USING (shingle)
),
clean AS (
  SELECT * FROM train WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
toks3 AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM clean),
sh0 AS (
  SELECT DISTINCT doc_id, t[i]||' '||t[i+1]||' '||t[i+2] AS shingle
  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks3 WHERE len(t) >= 3)
),
sh AS (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= 100)
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id
  FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
  WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5
),
edges AS (
  SELECT a_id AS u, b_id AS v FROM pairs UNION SELECT b_id, a_id FROM pairs
),
reach(node, lbl) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.node
),
labels AS (SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
dropped AS (SELECT doc_id FROM labels WHERE doc_id <> cluster_id),
final AS (SELECT * FROM clean WHERE doc_id NOT IN (SELECT doc_id FROM dropped))
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM final GROUP BY lang
"""


@register("pipeline_corpus_prep", _PREP_SQL)
def pipeline_corpus_prep(spark, sf_dir):
    """End-to-end corpus preparation as ONE composed plan: quality
    gate (score ≥ 0.5) → eval-benchmark decontamination (drop docs
    sharing a 5-gram with the doc_id%13 benchmark) → n-gram-Jaccard
    near-dup clustering with keep-one-per-component → per-language
    doc/token totals. Four operator families fuse under Catalyst;
    the oracle replays the identical pipeline (including the
    connected-components labeling as a recursive CTE), so the
    composition — not just the pieces — is value-checked."""
    docs = _t(spark, sf_dir, "documents")
    kept = text.with_quality_score(docs).filter(F.col("quality_score") >= 0.5)
    train = kept.filter(F.col("doc_id") % 13 != 0)
    bench = docs.filter(F.col("doc_id") % 13 == 0)
    decon = dedup.benchmark_contamination(train, bench, n=5)
    clean = train.join(
        decon.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    pairs = dedup.ngram_jaccard_pairs(clean, threshold=0.5, max_df=100)
    clusters = dedup.duplicate_clusters(pairs)
    dropped = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    final = clean.join(dropped, "doc_id", "left_anti")
    return final.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(text.tokens_col(F.col("text")))).alias("total_tokens"),
    )


@register_extra("dedup_cdc_chunks", None)  # rolling-hash family is engine-specific
def dedup_cdc_chunks(spark, sf_dir):
    """Content-defined-chunking near-dup candidates (rsync/LBFS-style
    rolling-hash boundaries; operators/dedup.py:cdc_chunk_hashes):
    pairs sharing ≥2 content chunks. Shift-resistant — the long-doc
    partial-overlap case n-gram Jaccard underweights; pytest pins the
    shift-resistance and coverage properties."""
    return dedup.cdc_shared_chunk_pairs(_t(spark, sf_dir, "documents"), min_shared=2).orderBy(
        "a_id", "b_id"
    )


@register_extra("dedup_embedding_lsh_raw", None)  # hyperplane constants live Spark-side
def dedup_embedding_lsh_raw(spark, sf_dir):
    """Bucketed near-dup pairs: multi-table hyperplane LSH candidates +
    exact-cosine verify; no all-pairs join anywhere in the plan."""
    return dedup.embedding_lsh_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.45).orderBy(
        "a_id", "b_id"
    )


# Uncapped exact-Jaccard: the valid oracle for the LSH entry because
# LSH candidates are VERIFIED with exact Jaccard — whenever banding
# recall is 1.0 (measured: 25/25 pairs at the gate's sf0.01, 256/256
# on the SCALE.md corpus), the output set EQUALS the exact set. The
# murmur3 banding itself stays engine-specific; what the oracle pins
# is the end-to-end answer, which is the contract that matters.
_JACCARD_SQL_UNCAPPED = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 6) AS jaccard
FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5
"""


@register_extra("dedup_minhash_lsh", _JACCARD_SQL_UNCAPPED)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash banding + exact-Jaccard verify. Oracle-pinned against
    the UNCAPPED exact-Jaccard set: banding recall is 1.0 at the
    gate's corpus (verified pairwise-equal at sf0.01 before
    promotion, round 5), and the verify step makes every emitted
    jaccard exact — so any banding miss OR verify drift fails the
    row. If a future corpus drops recall below 1.0, demote this back
    to rows-only rather than ship a flaky gate row."""
    return dedup.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.5).orderBy(
        "a_id", "b_id"
    )


@register_extra(
    "dedup_contam_routed",
    _CONTAM_RADIUS_SQL.format(jaccard=_JACCARD_SQL_UNCAPPED),
)
def dedup_contam_routed(spark, sf_dir):
    """dedup_contamination_radius on the SCALE-PATH pair source
    (the q_leakage_split_routed pattern): the bounded BFS consumes
    minhash_lsh_pairs instead of the exact ngram pair graph whose
    volume drove the consumer family's sf1 growth rows (SCALE.md).
    Oracle: the same hop-counting recursive CTE over the UNCAPPED
    exact pair set — equal to the LSH output whenever banding recall
    is 1.0 (the dedup_minhash_lsh pin), so seeds, traversal, and
    min-hop labeling replay exactly while the pair generation stays
    banded-candidates-only."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    seeds = docs.filter(F.pmod(F.col("doc_id"), F.lit(97)) == 0).select("doc_id")
    return dedup.contamination_radius(pairs, seeds, max_hops=2).orderBy("doc_id")


@register_extra(
    "dedup_simhash",
    """SELECT true AS banding_complete, true AS hamming_bound_ok""",
)
def dedup_simhash(spark, sf_dir):
    """SimHash chunk-banding, driven through its invariant: the banded
    pair set must EQUAL the brute-force all-pairs hamming≤3 set over
    the same signatures (the pigeonhole guarantee — 4 16-bit chunks,
    hamming ≤ 3 forces one equal chunk), and every emitted distance
    must respect the bound. The signature values are xxhash64-family
    engine constants SQL cannot reproduce, so the oracle pins the
    invariant, not the values: if banding drops a pair, admits a bad
    one, or the verify drifts, Spark emits false and the row goes
    red. The quadratic brute-force twin runs only inside this gate
    row at gate SF; the scale-path operator is dedup_simhash_raw
    (EXTRA tier, also the bench entry)."""
    docs = _t(spark, sf_dir, "documents")
    from hyper_storage_spark.operators._caches import tracked_persist

    # persisted: the brute-force reference self-joins the signature set
    # (two plan branches) — unpersisted, each branch re-runs the Arrow
    # kernel over the corpus (simhash_pairs persists its own copy for
    # the same reason)
    sig = tracked_persist(dedup.simhash_signatures(docs))
    banded = dedup.simhash_pairs(docs, max_hamming=3)
    a, b = sig.alias("a"), sig.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    n_banded = banded.agg(F.count("*").alias("n_banded"))
    n_brute = brute.agg(F.count("*").alias("n_brute"))
    n_common = (
        banded.join(brute, ["a_id", "b_id", "hamming"], "left_semi")
        .agg(F.count("*").alias("n_common"))
    )
    n_bad = banded.filter(F.col("hamming") > 3).agg(F.count("*").alias("n_bad"))
    return (
        n_banded.crossJoin(n_brute)
        .crossJoin(n_common)
        .crossJoin(n_bad)
        .select(
            (
                (F.col("n_banded") == F.col("n_brute"))
                & (F.col("n_common") == F.col("n_brute"))
            ).alias("banding_complete"),
            (F.col("n_bad") == 0).alias("hamming_bound_ok"),
        )
    )


@register_extra("dedup_simhash_raw", None)  # xxhash64 family is engine-specific
def dedup_simhash_raw(spark, sf_dir):
    """The scale-path SimHash operator itself (chunk-band candidates +
    bit_count verify, no all-pairs join); benched under this name."""
    return dedup.simhash_pairs(_t(spark, sf_dir, "documents"), max_hamming=3).orderBy(
        "a_id", "b_id"
    )


_ANN_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id IN (0,1,2,3,4)
),
scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q JOIN embeddings e ON e.vec_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank, ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= 10
"""


_HARDNEG_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, label AS query_label, embedding AS qv
  FROM embeddings WHERE vec_id IN (0,1,2,3,4)
),
scored AS (
  SELECT query_id, query_label, e.vec_id AS neighbor_id, e.label AS neighbor_label,
         list_cosine_similarity(CAST(qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q JOIN embeddings e ON e.label != query_label
),
ranked AS (
  SELECT query_id, query_label, neighbor_id, neighbor_label, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, query_label, neighbor_id, neighbor_label, rank,
       ROUND(cos, 6) AS cosine
FROM ranked WHERE rank <= 5
"""


@register_extra("emb_hard_negatives", _HARDNEG_SQL)
def emb_hard_negatives(spark, sf_dir):
    """Hard-negative mining (operators/similarity.py hard_negatives):
    per anchor, the 5 nearest OTHER-label vectors — the contrastive-
    training pair miner, exact-baseline face (the ANN route for
    corpus scale is documented in the operator). Full SQL replay
    incl. the label-inequality join and tie-break."""
    return similarity.hard_negatives(
        _t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=5
    )


@register_extra("ann_cosine_topk", _ANN_SQL)
def ann_cosine_topk(spark, sf_dir):
    return similarity.cosine_topk(_t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10)


# ANN contract rows: an approximate index's contract is NOT "equals
# exact top-k" — it is "k results per query, recall ≥ a floor, with
# true similarity values". That contract IS ANSI-SQL-predictable even
# though the hash/cell structure is engine-specific, so the driver
# entries emit the contract check (computed in-plan against the exact
# top-k) and the raw neighbor lists live in the EXTRA tier. A recall
# regression, a short result list, or a drifted cosine turns the row
# red — a hard driver signal where rows-only gave none.
def _ann_contract(ann, exact, min_recall_pct: int, corpus_min_recall_pct: int = 90):
    """(query_id, n_results, recall_ok, corpus_recall_ok) —
    integer-arithmetic recall bounds (n_hits * 100 >= pct * n_exact) to
    keep the booleans exact. ``recall_ok`` is the per-query floor;
    ``corpus_recall_ok`` (r7) pins AGGREGATE recall across all queries
    to the pytest bar (≥ 0.9) — per-query recall on 10-item lists is
    quantized to 0.1 steps and legitimately dips to 0.8 for an
    occasional query, but the corpus-level number is what the internal
    tests certify, so the driver gate now certifies it too."""
    ann_ids = ann.select("query_id", "neighbor_id")
    exact_ids = exact.select("query_id", "neighbor_id")
    n_ann = ann_ids.groupBy("query_id").agg(F.count("*").alias("n_results"))
    n_hit = (
        ann_ids.join(exact_ids, ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    n_exact = exact_ids.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    # the EXACT side is the spine, with LEFT joins + coalesce(0): a
    # query whose ANN result collapsed to zero rows must surface as
    # n_results=0 / recall_ok=false and still weigh its n_exact in the
    # corpus sums — inner joins here silently dropped exactly the
    # worst-case query and overstated corpus recall
    per_query = (
        n_exact.join(n_ann, "query_id", "left")
        .join(n_hit, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_results", F.lit(0)).alias("n_results"),
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            "n_exact",
        )
    )
    # corpus-level sums ride a size-n_queries broadcast join (the
    # contract tables are tiny — one row per query id)
    corpus = per_query.agg(
        F.sum("n_hits").alias("c_hits"), F.sum("n_exact").alias("c_exact")
    )
    return per_query.crossJoin(F.broadcast(corpus)).select(
        "query_id",
        "n_results",
        (F.col("n_hits") * 100 >= F.lit(min_recall_pct) * F.col("n_exact")).alias(
            "recall_ok"
        ),
        (
            F.col("c_hits") * 100 >= F.lit(corpus_min_recall_pct) * F.col("c_exact")
        ).alias("corpus_recall_ok"),
    )


_ANN_CONTRACT_SQL = """
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(10 AS BIGINT) AS n_results,
       true AS recall_ok,
       true AS corpus_recall_ok
FROM (SELECT unnest([0, 1, 2, 3, 4]) AS query_id)
"""


@register_extra("ann_lsh_bucket", _ANN_CONTRACT_SQL)
def ann_lsh_bucket(spark, sf_dir):
    """Hyperplane-LSH bucketed ANN, driven through its contract: 10
    results per query, per-query recall ≥ 0.8, AND corpus-level recall
    ≥ 0.9 vs the exact top-10 (the pytest bar, now gate-enforced via
    corpus_recall_ok; measured corpus 0.92 at sf0.01, 0.98 at
    sf0.001 — per-query recall on 10-item lists quantizes to 0.1
    steps, hence the 0.8 per-query floor). Raw neighbor lists:
    ann_lsh_bucket_raw (EXTRA); the hyperplane constants stay
    engine-specific but the contract is SQL-predictable."""
    emb = _t(spark, sf_dir, "embeddings")
    ann = similarity.lsh_bucket_topk(emb, [0, 1, 2, 3, 4], k=10)
    exact = similarity.cosine_topk(emb, [0, 1, 2, 3, 4], k=10)
    return _ann_contract(ann, exact, min_recall_pct=80)


@register_extra("ann_ivf", _ANN_CONTRACT_SQL)
def ann_ivf(spark, sf_dir):
    """IVF ANN (k-means cells, 10-of-16 probing), driven through its
    contract: 10 results per query, per-query recall ≥ 0.8, AND
    corpus-level recall ≥ 0.9 vs exact top-10 (the pytest bar, now
    gate-enforced via corpus_recall_ok). Round 7 raised n_probe 8→10
    after measuring probe=8 corpus recall at 0.88 on sf0.1 — recall is
    monotonic in probe count, and 10 probes measure corpus 0.96 /
    per-query ≥ 0.9 at sf0.1 and ≥ 0.94 at sf0.01 for +25% candidate
    scans, the right side of the recall/cost knob for a gate contract.
    At sf0.001 the corpus bar still doesn't hold (16 cells over a few
    hundred vectors scatters each true top-10 wider than any fixed
    probe budget) — the gate SFs are 0.01/0.1, where it does. Raw lists: ann_ivf_raw (EXTRA); the
    k-means cells stay engine-specific."""
    emb = _t(spark, sf_dir, "embeddings")
    ann = similarity.ivf_topk(emb, [0, 1, 2, 3, 4], k=10, n_cells=16, n_probe=10)
    exact = similarity.cosine_topk(emb, [0, 1, 2, 3, 4], k=10)
    return _ann_contract(ann, exact, min_recall_pct=80)


@register_extra("ann_pq_contract", _ANN_CONTRACT_SQL)
def ann_pq_contract(spark, sf_dir):
    """Product-quantization ANN (operators/similarity.py pq_topk — the
    FAISS ADC recipe, round 8), driven through the standard contract:
    10 results per query, per-query recall ≥ 0.8, corpus recall ≥ 0.9
    vs the exact top-10 computed in-plan (measured 1.0 at every gate
    SF with m=16/codes=32/refine=16). The scale story this entry
    certifies: codebooks train on a bounded driver sample, the corpus
    is ENCODED to m small ints (32× smaller than the vectors), search
    is one pass over the compressed codes via per-query lookup tables,
    and exact cosine re-ranks only the k·refine ADC candidates — the
    compressed-scan ANN family next to the LSH (bucketed) and IVF
    (clustered) entries."""
    emb = _t(spark, sf_dir, "embeddings")
    ann = similarity.pq_topk(emb, [0, 1, 2, 3, 4], k=10)
    exact = similarity.cosine_topk(emb, [0, 1, 2, 3, 4], k=10)
    return _ann_contract(ann, exact, min_recall_pct=80)


@register_extra("ann_pq_raw", None)  # trained codebooks are engine-specific
def ann_pq_raw(spark, sf_dir):
    """Raw PQ-ADC neighbor lists (the operator ann_pq_contract
    certifies); rows-only like the other trained-state ANN raws —
    the codebook k-means is engine-side state no SQL oracle can
    replay, the contract twin carries the oracle."""
    return similarity.pq_topk(_t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10)


def _incremental_eq(contract, ann, oneshot):
    """Append-path ≡ bulk-build gate shared by the incremental ANN
    entries: per query, the incremental result must equal the one-shot
    result row-for-row — cardinalities equal on both sides AND every
    incremental row present in the one-shot set (semi-join count),
    which together prove set equality."""
    a_cnt = ann.groupBy("query_id").agg(F.count("*").alias("na"))
    o_cnt = oneshot.groupBy("query_id").agg(F.count("*").alias("no"))
    both = ann.join(
        oneshot, ["query_id", "neighbor_id", "rank", "cosine"], "left_semi"
    ).groupBy("query_id").agg(F.count("*").alias("ni"))
    eq = (
        a_cnt.join(o_cnt, "query_id")
        .join(both, "query_id", "left")
        .select(
            "query_id",
            (
                (F.col("na") == F.col("no"))
                & (F.coalesce("ni", F.lit(0)) == F.col("na"))
            ).alias("incremental_eq"),
        )
    )
    return contract.join(eq, "query_id")


_ANN_PQ_INCR_SQL = """
SELECT CAST(query_id AS BIGINT) AS query_id,
       CAST(10 AS BIGINT) AS n_results,
       true AS recall_ok,
       true AS corpus_recall_ok,
       true AS incremental_eq
FROM (SELECT unnest([0, 1, 2, 3, 4]) AS query_id)
"""


@register("ann_ivfpq_contract", _ANN_CONTRACT_SQL)
def ann_ivfpq_contract(spark, sf_dir):
    """IVF-PQ ANN (operators/similarity.py ivfpq_topk — the full FAISS
    IVFADC recipe, round 9): k-means cells route each query to its
    n_probe nearest cells, the in-cell scan reads product-quantized
    RESIDUAL codes (ADC decomposes as q·centroid + LUT gathers since
    the residual codebooks are global), and exact cosine re-ranks the
    bounded candidate set. Same contract as the rest of the ANN
    family: 10 results/query, per-query recall ≥ 0.8, corpus recall
    ≥ 0.9 vs the exact top-10 computed in-plan. Completes the ANN
    matrix: buckets (LSH), cells (IVF), compressed scan (PQ), and now
    cells × compressed scan — the shape that serves billion-vector
    corpora."""
    emb = _t(spark, sf_dir, "embeddings")
    ann = similarity.ivfpq_topk(emb, [0, 1, 2, 3, 4], k=10, n_cells=16, n_probe=10)
    exact = similarity.cosine_topk(emb, [0, 1, 2, 3, 4], k=10)
    return _ann_contract(ann, exact, min_recall_pct=80)


@register_extra("ann_ivfpq_incremental", _ANN_PQ_INCR_SQL)
def ann_ivfpq_incremental(spark, sf_dir):
    """The persisted-IVF-PQ-index path (similarity.ivfpq_index /
    ivfpq_append / ivfpq_search — round 9): bootstrap cells + residual
    codebooks on 90% of the corpus, append the 10% batch by
    assigning + encoding ONLY its rows with the frozen state, search
    the combined index. Gates: the standard recall contract vs the
    exact top-10 AND ``incremental_eq`` — row-for-row equality with a
    one-shot encode of the full corpus under the same cells/codebooks
    (append+search ≡ bulk-build, the ann_pq_incremental twin for the
    combined index)."""
    emb = _t(spark, sf_dir, "embeddings")
    boot = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    qids = [0, 1, 2, 3, 4]
    idx = similarity.ivfpq_index(boot, n_cells=16)
    # n_probe 12 (vs the contract entry's 10): the cells train on the
    # 90% bootstrap only, so probes compensate the slightly shifted
    # centroids — recall is monotone in probe count (measured: 10
    # probes read corpus 0.88 at sf0.1 under bootstrap-trained cells)
    ann = similarity.ivfpq_search(
        similarity.ivfpq_append(idx, batch), emb, qids, k=10, n_probe=12
    )
    oneshot = similarity.ivfpq_search(
        similarity.IVFPQIndex(
            idx.centroids, idx.codebooks, similarity.ivfpq_encode(idx, emb)
        ),
        emb,
        qids,
        k=10,
        n_probe=12,
    )
    contract = _ann_contract(ann, similarity.cosine_topk(emb, qids, k=10), min_recall_pct=80)
    return _incremental_eq(contract, ann, oneshot)


@register_extra(
    "ann_ivfpq_lifecycle",
    """SELECT CAST(500 AS BIGINT) AS n_rows,
              CAST(16 AS BIGINT) AS cells_before,
              true AS undersized, true AS rebuilt,
              CAST(64 AS BIGINT) AS cells_after,
              true AS recall_ok""",
)
def ann_ivfpq_lifecycle(spark, sf_dir):
    """The persisted-index APPEND LIFECYCLE behind the oracle gate
    (similarity.ivfpq_health / ivfpq_rebuild_if_needed — round 11):
    bootstrap 16 cells on half a fixed 500-vector scope, append the
    other half with frozen state, let the health check flag the index
    undersized (ivfpq_params_for at target_occupancy=8 wants 64 cells
    for 500 rows), rebuild at the sized cell count, and verify the
    rebuilt index still clears the family's 0.8 recall floor vs exact
    cosine (n_probe=32 of 64 cells: at this deliberately tiny scope
    the fine cells hold ~8 vectors each, so the recall knob is probe
    count, exactly as the sizing docs prescribe). Every output is deterministic (seeded k-means,
    hash-ordered samples, fixed scope), so the oracle pins the whole
    lifecycle as constants."""
    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 500)
    boot = emb.filter(F.col("vec_id") < 250)
    batch = emb.filter(F.col("vec_id") >= 250)
    idx = similarity.ivfpq_index(boot, n_cells=16)
    grown = similarity.ivfpq_append(idx, batch)
    health = similarity.ivfpq_health(grown, target_occupancy=8)
    rebuilt_idx, rebuilt, _ = similarity.ivfpq_rebuild_if_needed(
        grown, emb, target_occupancy=8
    )
    qids = [0, 10, 20]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ivfpq_search(
            rebuilt_idx, emb, qids, k=10, n_probe=32
        ).collect()
    }
    recall_ok = len(got & exact) / len(exact) >= 0.8
    return spark.createDataFrame(
        [(
            health["n_rows"], health["n_cells"], health["undersized"],
            bool(rebuilt), int(rebuilt_idx.centroids.shape[0]), bool(recall_ok),
        )],
        "n_rows long, cells_before long, undersized boolean, rebuilt boolean, "
        "cells_after long, recall_ok boolean",
    )


@register_extra(
    "ann_ivfpq_refine",
    """SELECT CAST(500 AS BIGINT) AS n_rows,
              true AS skewed_before,
              true AS split_fired,
              CAST(16 AS BIGINT) AS cells_before,
              true AS cells_grew,
              true AS untouched_identical,
              true AS reencode_bounded,
              true AS recall_ok,
              true AS recall_parity""",
)
def ann_ivfpq_refine(spark, sf_dir):
    """INCREMENTAL index maintenance behind the oracle gate
    (similarity.ivfpq_split_cells — r12, VERDICT item 7): the health
    check's skew verdict no longer forces a FULL rebuild. Scope: 16
    cells bootstrapped on vectors 0-249, then a 250-row appended batch
    of near-duplicates of vector 0 (deterministic per-id jitter) —
    one cell swallows the batch and trips the skew rule. Gates: the
    hot cell splits (cells grow), every untouched cell's codes are
    BYTE-IDENTICAL afterward (the O(hot-mass)-not-O(corpus) claim,
    checked by set difference), the re-encoded row count equals the
    hot cells' mass exactly, and the refined index's recall vs exact
    cosine clears the family 0.8 floor AND matches a full rebuild at
    the same cell count within 0.1 (recall parity — the reason the
    cheap path is safe to schedule instead of the rebuild). All
    deterministic (seeded k-means, hash-ordered samples, fixed
    scope), so the oracle pins constants."""
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 500)
        .select("vec_id", "embedding")
    )
    boot = emb.filter(F.col("vec_id") < 250)
    v0 = [float(x) for x in boot.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    batch = emb.filter(F.col("vec_id") >= 250).select(
        "vec_id",
        F.array(
            *[
                F.lit(v0[i])
                + ((F.col("vec_id") * (i + 3)) % 7).cast("double") * F.lit(1e-4)
                for i in range(len(v0))
            ]
        ).alias("embedding"),
    )
    corpus = boot.unionByName(batch)
    idx = similarity.ivfpq_index(boot, n_cells=16)
    grown = similarity.ivfpq_append(idx, batch)
    health = similarity.ivfpq_health(grown, skew_factor=4.0)
    before = {
        (r.neighbor_id, r.cell, tuple(r.codes)) for r in grown.codes.collect()
    }
    refined, report = similarity.ivfpq_split_cells(grown, corpus, skew_factor=4.0)
    hot = set(report["split_cell_ids"])
    after = {
        (r.neighbor_id, r.cell, tuple(r.codes)) for r in refined.codes.collect()
    }
    untouched_identical = {t for t in before if t[1] not in hot} <= after and len(
        after
    ) == len(before)
    reencode_bounded = report["reencoded_rows"] == sum(
        1 for t in before if t[1] in hot
    )
    # queries AWAY from the jitter cluster: vector 0's own top-10 is
    # 250 near-identical ties (any 10 qualify equally), so set-recall
    # against it measures tie-breaking, not index quality
    qids = [10, 20, 30]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(corpus, qids, k=10).collect()
    }

    # probe most of the (deliberately tiny) cell population — the
    # lifecycle entry's convention: at this scope the recall knob is
    # probe count. refine=32 (vs the default 16): frozen codebooks
    # lose ADC precision on the drifted mass by design, and the
    # documented production compensation is a larger bounded exact
    # re-rank — measured here: refine 16 → 0.83 vs rebuild 1.0,
    # refine 32 → 1.0 == 1.0 (the parity this entry gates)
    n_probe = max(12, report["cells_after"] - 2)

    def recall(index):
        got = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ivfpq_search(
                index, corpus, qids, k=10, n_probe=n_probe, refine=32
            ).collect()
        }
        return len(got & exact) / len(exact)

    rebuilt = similarity.ivfpq_index(corpus, n_cells=report["cells_after"])
    r_ref, r_reb = recall(refined), recall(rebuilt)
    return spark.createDataFrame(
        [(
            report["n_rows"],
            bool(health["skewed"]),
            report["split"] >= 1,
            report["cells_before"],
            report["cells_after"] > report["cells_before"],
            bool(untouched_identical),
            bool(reencode_bounded),
            r_ref >= 0.8,
            r_ref >= r_reb - 0.1,
        )],
        "n_rows long, skewed_before boolean, split_fired boolean, "
        "cells_before long, cells_grew boolean, untouched_identical boolean, "
        "reencode_bounded boolean, recall_ok boolean, recall_parity boolean",
    )


@register_extra("ann_ivfpq_raw", None)  # cells + residual codebooks are engine state
def ann_ivfpq_raw(spark, sf_dir):
    """Raw IVF-PQ neighbor lists (ann_ivfpq_contract certifies);
    rows-only like the other trained-state ANN raws."""
    return similarity.ivfpq_topk(
        _t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10, n_cells=16, n_probe=10
    )


@register_extra("ann_pq_incremental", _ANN_PQ_INCR_SQL)
def ann_pq_incremental(spark, sf_dir):
    """The persisted-PQ-index path (similarity.pq_index / pq_append /
    pq_search — round 9): bootstrap the index on 90% of the corpus
    (vec_id % 10 != 7), append the 10% "daily batch" by encoding ONLY
    its rows with the frozen codebooks (no retrain — the FAISS add()
    convention, the ANN twin of dedup_minhash_incremental's persisted
    band index), then search the combined index. Two gates per query:
    the standard recall contract vs the exact top-10, AND
    ``incremental_eq`` — the incremental result must equal, row for
    row (id, rank, exact cosine), a one-shot encode of the full corpus
    under the same codebooks, proving append+search ≡ bulk-build."""
    emb = _t(spark, sf_dir, "embeddings")
    boot = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    qids = [0, 1, 2, 3, 4]
    idx = similarity.pq_index(boot)
    ann = similarity.pq_search(similarity.pq_append(idx, batch), emb, qids, k=10)
    oneshot = similarity.pq_search(
        similarity.PQIndex(idx.codebooks, similarity.pq_encode(emb, idx.codebooks)),
        emb,
        qids,
        k=10,
    )
    contract = _ann_contract(ann, similarity.cosine_topk(emb, qids, k=10), min_recall_pct=80)
    return _incremental_eq(contract, ann, oneshot)


@register_extra("ann_lsh_bucket_raw", None)  # hyperplane constants live Spark-side
def ann_lsh_bucket_raw(spark, sf_dir):
    return similarity.lsh_bucket_topk(_t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10)


@register_extra("ann_ivf_raw", None)  # k-means cells are engine-specific
def ann_ivf_raw(spark, sf_dir):
    """IVF ANN: k-means cells (data-adaptive, unlike hyperplane LSH) +
    8-of-16-cell probing; exact cosine within probed cells. Recall 0.94
    vs exact top-10 on the test vectors (pytest-pinned ≥ 0.9)."""
    return similarity.ivf_topk(
        _t(spark, sf_dir, "embeddings"), [0, 1, 2, 3, 4], k=10, n_cells=16, n_probe=8
    )


@register(
    "text_quality_score",
    """WITH base AS (
         SELECT doc_id, text,
                len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS n_tokens,
                length(text) AS n_chars,
                length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct,
                len(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> lower(x) IN ('the','and','of','a','is'))) AS stop
         FROM documents
       )
       SELECT doc_id, n_tokens,
              CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_subwords_est,
              ROUND(punct * 1.0 / greatest(n_chars, 1), 6) AS punct_ratio,
              ROUND(stop * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
              ROUND(n_chars * 1.0 / greatest(n_tokens, 1), 6) AS mean_token_len,
              ROUND(least(n_tokens / 100.0, 1.0) * 0.5
                    + 0.3 * (1.0 - least(ROUND(punct * 1.0 / greatest(n_chars, 1), 6) * 4, 1.0))
                    + 0.2 * least(ROUND(stop * 1.0 / greatest(n_tokens, 1), 6) * 5, 1.0), 6) AS quality_score
       FROM base""",
)
def text_quality_score(spark, sf_dir):
    """Quality features + the token-count surface (n_tokens and the
    BPE-ish subword estimate from with_token_count) in one entry."""
    docs = text.with_token_count(_t(spark, sf_dir, "documents"))
    return text.with_quality_score(docs).select(
        "doc_id",
        "n_tokens",
        "n_subwords_est",
        "punct_ratio",
        "stopword_ratio",
        "mean_token_len",
        "quality_score",
    )


@register_extra(
    "text_langid",
    """WITH toks AS (
         SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
       ), scores AS (
         SELECT doc_id, lang,
                len(list_filter(t, x -> x IN ('der','die','und','das','ist'))) AS s_de,
                len(list_filter(t, x -> x IN ('the','and','of','a','is'))) AS s_en,
                len(list_filter(t, x -> x IN ('el','la','de','los','es'))) AS s_es,
                len(list_filter(t, x -> x IN ('le','la','et','les','est'))) AS s_fr
         FROM toks
       )
       SELECT doc_id, lang,
              CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                   WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                   WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                   WHEN s_es >= s_fr THEN 'es'
                   ELSE 'fr' END AS lang_pred
       FROM scores""",
)
def text_langid(spark, sf_dir):
    return text.with_lang_id(_t(spark, sf_dir, "documents")).select("doc_id", "lang", "lang_pred")


@register_extra(
    "text_fingerprint",
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       ),
       idx AS (
         SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3
       ),
       sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx)
       SELECT doc_id, MIN(md5(shingle)) AS fingerprint FROM sh GROUP BY doc_id""",
)
def text_fingerprint(spark, sf_dir):
    sh = dedup.shingle_df(_t(spark, sf_dir, "documents"))
    return sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))


@register_extra(
    "text_repetition",
    """WITH ngr AS (
         SELECT doc_id,
                CASE WHEN len(t) >= 2
                     THEN [t[i] || ' ' || t[i+1] FOR i IN generate_series(1, len(t)-1)]
                END AS ng
         FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents)
       )
       SELECT doc_id,
              CAST(len(ng) AS BIGINT) AS n_ngrams,
              ROUND(1.0 - len(list_distinct(ng)) * 1.0 / len(ng), 6) AS dup_ngram_frac,
              ROUND(list_max([len(list_filter(ng, y -> y = x)) FOR x IN list_distinct(ng)])
                    * 1.0 / len(ng), 6) AS top_ngram_frac
       FROM ngr""",
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition quality filters (duplicate-2-gram
    fraction + most-frequent-2-gram share) — pure per-row array HOFs,
    no explode/shuffle (operators/text.py:with_repetition_stats)."""
    return text.with_repetition_stats(_t(spark, sf_dir, "documents"), n=2).select(
        "doc_id",
        F.col("n_ngrams").cast("bigint").alias("n_ngrams"),
        "dup_ngram_frac",
        "top_ngram_frac",
    )


@register(
    "text_pii_redact",
    """WITH d AS (
         SELECT doc_id,
                text
                || CASE WHEN doc_id % 7 = 0
                        THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                        ELSE '' END
                || CASE WHEN doc_id % 5 = 0
                        THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1 logged'
                        ELSE '' END
                || CASE WHEN doc_id % 11 = 0
                        THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ok'
                        ELSE '' END AS text2
         FROM documents
       )
       , r1 AS (SELECT doc_id, text2,
                       regexp_replace(text2,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '[EMAIL]', 'g') AS t1
                FROM d)
       , r2 AS (SELECT *, regexp_replace(t1,
                           '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '[IPV4]', 'g') AS t2
                FROM r1)
       SELECT doc_id,
              CAST(len(regexp_extract_all(
                  text2, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(
                  t1, '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ipv4,
              CAST(len(regexp_extract_all(
                  t2, '\\+\\d{1,3}-\\d{3}-\\d{4}')) AS BIGINT) AS n_phones,
              md5(regexp_replace(t2, '\\+\\d{1,3}-\\d{3}-\\d{4}', '[PHONE]', 'g')) AS redacted_md5
       FROM r2""",
)
def text_pii_redact(spark, sf_dir):
    """Multi-class PII scrubbing (operators/text.py:with_pii_redacted —
    emails, IPv4 addresses, international phone numbers). The
    synthetic corpus contains no PII, so the entry PLANTS one
    deterministic instance of each class on disjoint id slices
    (doc_id % 7/5/11 == 0) — identically in the SQL oracle — to keep
    every per-class count and the byte-level redaction (compared via
    md5) genuinely differential. All three patterns stick to syntax
    Java regex and RE2 read identically."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "text2",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" from 10."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".0.1 logged"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" ok"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    red = text.with_pii_redacted(d, "text2")
    return red.select(
        "doc_id",
        F.col("n_emails").cast("bigint").alias("n_emails"),
        F.col("n_ipv4").cast("bigint").alias("n_ipv4"),
        F.col("n_phones").cast("bigint").alias("n_phones"),
        F.md5("text_redacted").alias("redacted_md5"),
    )


@register_extra(
    "mm_binary_stats",
    """SELECT doc_id, octet_length(encode(text)) AS byte_len, sha256(text) AS sha FROM documents""",
)
def mm_binary_stats(spark, sf_dir):
    """Opaque-binary column handling: byte length + content digest,
    computed on the binary payload (here: UTF-8 encoded text)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.octet_length("text").alias("byte_len"),
        F.sha2(F.encode("text", "UTF-8"), 256).alias("sha"),
    )


@register(
    "mm_feature_extract",
    """SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS media_type,
              CAST(CASE WHEN doc_id % 3 = 0 THEN 108
                        WHEN doc_id % 3 = 1 THEN 120
                        ELSE 288 END AS BIGINT) AS n_samples,
              CAST((doc_id % 256) // 16 AS BIGINT) AS peak_bin,
              CAST(1.0 AS DOUBLE) AS peak_val
       FROM documents""",
)
def mm_feature_extract(spark, sf_dir):
    """Feature extraction through the REAL stdlib codecs end-to-end:
    attach_media generates actual PNG / 8-bit-PCM WAV / ISO BMFF mp4
    payloads (operators/multimodal.py:66), extract_features
    decodes them (zlib inflate + unfilter, RIFF parse, BMFF demux —
    operators/media_codecs.py) and computes a 16-bin intensity
    histogram. The synthetic media is uniform intensity doc_id % 256,
    so SQL predicts the decode exactly: pixel/sample counts are
    12*9=108 (png), 120 (wav), 8*6*6=288 (mp4, 6 raw frames), and the
    histogram peaks at bin (doc_id % 256) // 16 with mass 1.0. A
    wrong byte anywhere in encode OR decode shifts counts or spreads
    the histogram — this row fails."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, mode="real")
    return feats.select(
        "doc_id",
        "media_type",
        "n_samples",
        (F.expr("array_position(features, array_max(features))") - 1)
        .cast("bigint")
        .alias("peak_bin"),
        F.array_max("features").cast("double").alias("peak_val"),
    )


@register_extra(
    "mm_image_stats",
    """SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS media_type,
              CASE WHEN doc_id % 3 = 0 THEN 12 ELSE -1 END AS img_w,
              CASE WHEN doc_id % 3 = 0 THEN 9 ELSE -1 END AS img_h,
              CAST(CASE WHEN doc_id % 3 = 0 THEN 108 ELSE -1 END AS BIGINT) AS n_px,
              CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 256 ELSE -1.0 END AS DOUBLE)
                AS mean_px
       FROM documents""",
)
def mm_image_stats(spark, sf_dir):
    """PNG round-trip proof via decoded pixel statistics
    (operators/multimodal.py:image_stats): dims, pixel count, and
    mean intensity come from DECODING the generated PNG bytes (zlib
    inflate + scanline unfilter), and the uniform-intensity payloads
    make every one of them SQL-predictable — mean_px must equal
    doc_id % 256 exactly; non-images carry -1 sentinels."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return multimodal.image_stats(media).select(
        "doc_id", "media_type", "img_w", "img_h", "n_px", "mean_px"
    )


@register_extra(
    "mm_audio_features",
    """SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS media_type,
              CAST(CASE WHEN doc_id % 3 = 1 THEN 120 ELSE -1 END AS BIGINT) AS n_samples,
              CAST(CASE WHEN doc_id % 3 = 1
                        THEN ROUND(ABS((doc_id % 256) - 128) / 128.0, 7)
                        ELSE -1.0 END AS DOUBLE) AS rms,
              CAST(CASE WHEN doc_id % 3 = 1 THEN 0.0 ELSE -1.0 END AS DOUBLE) AS zcr
       FROM documents""",
)
def mm_audio_features(spark, sf_dir):
    """Audio DSP features through the REAL WAV decode
    (operators/multimodal.py:audio_features): constant-amplitude
    synthetic PCM makes RMS exactly |g-128|/128 (a dyadic rational —
    exact in float AND at 7 decimal digits, so the rounding mode
    can't diverge) and the zero-crossing rate exactly 0. A decode
    that mis-reads even one sample shifts the RMS and fails the
    row."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    feats = multimodal.audio_features(media)
    return feats.select(
        "doc_id",
        "media_type",
        "n_samples",
        F.round("rms", 7).cast("double").alias("rms"),
        F.round("zcr", 7).cast("double").alias("zcr"),
    )


@register_extra("mm_feature_extract_fake", None)  # Arrow plumbing, fake decoder
def mm_feature_extract_fake(spark, sf_dir):
    """The fake-decoder plumbing variant (byte histogram, no decode):
    kept in the EXTRA tier as the no-codec fallback's integration
    surface; the driver-tier entry runs the real codecs."""
    media = multimodal.attach_binary(_t(spark, sf_dir, "documents"))
    feats = multimodal.extract_features(media, mode="fake")
    return feats.select(
        "doc_id", "media_type", "byte_len", F.round(F.element_at("features", 1), 6).alias("f0")
    ).orderBy("doc_id")


@register_extra(
    "mm_resize",
    """SELECT doc_id,
              CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                   WHEN doc_id % 3 = 1 THEN 'audio/wav'
                   ELSE 'video/mp4' END AS media_type,
              CASE WHEN doc_id % 3 = 0 THEN 8 ELSE -1 END AS width,
              CASE WHEN doc_id % 3 = 0 THEN 8 ELSE -1 END AS height,
              CASE WHEN doc_id % 3 = 0 THEN 64
                   ELSE octet_length(encode(text)) END AS byte_len,
              CASE WHEN doc_id % 3 = 0 THEN NULL
                   ELSE sha256(text) END AS sha
       FROM documents""",
)
def mm_resize(spark, sf_dir):
    """Image resize plumbing contract, oracle-checked on the parts SQL
    can see: images land at width×height bytes (fake nearest-neighbor
    resample stands in for PIL), non-images pass through untouched —
    proven by length AND content digest (the mm_binary_stats surface,
    merged here; resized image bytes are engine-side, so their digest
    is NULL in the oracle)."""
    media = multimodal.attach_binary(_t(spark, sf_dir, "documents"))
    resized = multimodal.resize_images(media, width=8, height=8)
    return resized.select(
        "doc_id",
        "media_type",
        "width",
        "height",
        F.octet_length("payload").alias("byte_len"),
        F.when(F.col("media_type") == "image/png", F.lit(None).cast("string"))
        .otherwise(F.sha2(F.col("payload"), 256))
        .alias("sha"),
    )


@register_extra(
    "mm_frame_sample",
    """WITH v AS (
         SELECT doc_id, octet_length(encode(text)) AS n FROM documents
         WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
       ), f AS (
         SELECT doc_id, unnest(generate_series(0, 3)) AS frame_idx, n FROM v
       )
       SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
              LEAST(64, n - (frame_idx * n) // 4) AS frame_len
       FROM f""",
)
def mm_frame_sample(spark, sf_dir):
    """Video frame sampling: one output row per sampled frame (the
    exploding-cardinality mapInPandas shape) — frame offsets/lengths
    are oracle-checked; the byte slices themselves are engine-side."""
    media = multimodal.attach_binary(_t(spark, sf_dir, "documents"))
    frames = multimodal.sample_frames(media, n_frames=4, frame_bytes=64)
    return frames.select("doc_id", "frame_idx", F.octet_length("frame").alias("frame_len"))


# --------------------------------------------------------------------------
# ts_* — timeseries operators Spark lacks natively (as-of join, range
# join, hypertable rollup), composed shuffle-lean from DataFrame ops
# --------------------------------------------------------------------------


@register_extra(
    "ts_asof_join",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
                  FROM events),
       c AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'click'),
       p AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value
             FROM e WHERE event_type = 'purchase')
       SELECT c.user_id, c.event_id, c.ts, p_event_id, p_value
       FROM c ASOF JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts""",
)
def ts_asof_join(spark, sf_dir):
    """Backward as-of join: each click gets the user's latest preceding
    (inclusive) purchase. Physically NOT a join: one union + one
    shuffle on user_id + a running last(...) window — no join
    explosion, no non-equi condition. Oracle: DuckDB's native ASOF
    JOIN. Timestamps are unique per (user_id, ts) in the test data, so
    the match is deterministic."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    return timeseries.asof_join(
        clicks, purchases, on=["user_id"], right_cols=["p_event_id", "p_value"]
    )


@register_extra(
    "ts_asof_forward",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
                  FROM events),
       c AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'click'),
       p AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value
             FROM e WHERE event_type = 'purchase')
       SELECT c.user_id, c.event_id, c.ts, p_event_id, p_value
       FROM c ASOF JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts""",
)
def ts_asof_forward(spark, sf_dir):
    """Forward as-of: each click gets the user's NEXT purchase at or
    after it — the mirrored descending-order window, still zero joins.
    Oracle: DuckDB ASOF with the >= inequality."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    return timeseries.asof_join(
        clicks, purchases, on=["user_id"], right_cols=["p_event_id", "p_value"],
        direction="forward",
    )


@register_extra(
    "ts_asof_nearest",
    """WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
                  FROM events),
       c AS (SELECT user_id, event_id, ts FROM e WHERE event_type = 'click'),
       p AS (SELECT user_id, ts, event_id AS p_event_id, value AS p_value
             FROM e WHERE event_type = 'purchase'),
       b AS (SELECT c.user_id, c.event_id, c.ts,
                    p.ts AS b_ts, p_event_id AS b_eid, p_value AS b_val
             FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts),
       f AS (SELECT c.user_id, c.event_id,
                    p.ts AS f_ts, p_event_id AS f_eid, p_value AS f_val
             FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts >= c.ts)
       SELECT b.user_id, b.event_id, b.ts,
              CASE WHEN b_ts IS NULL THEN f_eid
                   WHEN f_ts IS NULL THEN b_eid
                   WHEN epoch(b.ts) - epoch(b_ts) <= epoch(f_ts) - epoch(b.ts)
                   THEN b_eid ELSE f_eid END AS p_event_id,
              CASE WHEN b_ts IS NULL THEN f_val
                   WHEN f_ts IS NULL THEN b_val
                   WHEN epoch(b.ts) - epoch(b_ts) <= epoch(f_ts) - epoch(b.ts)
                   THEN b_val ELSE f_val END AS p_value
       FROM b JOIN f ON b.user_id = f.user_id AND b.event_id = f.event_id
       WHERE b_ts IS NOT NULL OR f_ts IS NOT NULL""",
)
def ts_asof_nearest(spark, sf_dir):
    """Nearest as-of: each click gets its time-closest purchase (ties
    resolve backward, the pandas merge_asof convention). Both
    direction windows run over ONE key-partitioned exchange — still
    zero joins. Oracle: two DuckDB ASOF LEFT joins + closer-of-two."""
    e = _t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "event_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
    )
    return timeseries.asof_join(
        clicks, purchases, on=["user_id"], right_cols=["p_event_id", "p_value"],
        direction="nearest",
    )


@register_extra(
    "ts_gapfill_locf",
    """WITH agg AS (
         SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                COUNT(*) AS n
         FROM events WHERE user_id < 40 GROUP BY 1, 2
       ),
       span AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM agg GROUP BY 1),
       grid AS (
         SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
         FROM span
       ),
       j AS (
         SELECT g.user_id, g.day, a.n, a.n IS NULL AS filled
         FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.day = a.day
       )
       SELECT user_id, day,
              CAST(last_value(n IGNORE NULLS) OVER (
                  PARTITION BY user_id ORDER BY day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
              ) AS BIGINT) AS n,
              filled
       FROM j""",
)
def ts_gapfill_locf(spark, sf_dir):
    """time_bucket_gapfill + last-observation-carried-forward
    (operators/timeseries.py:gapfill): per-user daily event counts
    densified over each user's own [min, max] day span, gaps flagged
    and LOCF-filled. One groupBy + one explode + one left join + one
    window — no per-key driver loops."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    agg = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    return timeseries.gapfill(
        agg, keys=["user_id"], bucket_col="day", step="interval 1 day", value_cols=["n"]
    ).select("user_id", "day", "n", "filled")


@register_extra(
    "pipeline_filter_dedup",
    """WITH scored AS (
         SELECT doc_id, lang, text,
                ROUND(least(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) / 100.0, 1.0) * 0.5
                      + 0.3 * (1.0 - least(ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) * 1.0
                                                 / greatest(length(text), 1), 6) * 4, 1.0))
                      + 0.2 * least(ROUND(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                                          x -> lower(x) IN ('the','and','of','a','is'))) * 1.0
                                          / greatest(len(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')), 1), 6) * 5, 1.0),
                      6) AS q
         FROM documents
       ),
       kept AS (SELECT * FROM scored WHERE q >= 0.5),
       canonical AS (
         SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)
       )
       SELECT k.lang, COUNT(*) AS n_docs
       FROM kept k JOIN canonical c ON k.doc_id = c.doc_id
       GROUP BY k.lang""",
)
def pipeline_filter_dedup(spark, sf_dir):
    """End-to-end corpus-pipeline composition in ONE plan: quality
    scoring (operators/text.py) → threshold filter → exact dedup
    keeping the canonical (min doc_id) copy → per-language counts.
    The operators compose as plain DataFrame stages, so Catalyst
    optimizes across them (the quality projection and the dedup
    groupBy pipeline into two shuffles total); the oracle replays the
    identical pipeline in SQL, making the whole composition
    value-checked, not just its pieces."""
    docs = text.with_quality_score(_t(spark, sf_dir, "documents"))
    kept = docs.filter(F.col("quality_score") >= 0.5)
    canonical = (
        kept.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        kept.join(canonical, "doc_id")
        .groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
    )


@register_extra(
    "q_hash_split_contract",
    """SELECT s AS split, true AS frac_ok, true AS covers_all
       FROM (SELECT unnest(['test', 'train', 'val']) AS s)""",
)
def q_hash_split_contract(spark, sf_dir):
    """Deterministic train/val/test splitting
    (operators/sampling.py:hash_split), driven through its contract:
    the three splits are exhaustive (their counts sum to the corpus)
    and each realized fraction lands within 3 points of its target —
    the statistical bound a content-hash split guarantees. The
    murmur-family bucket itself is engine-specific; determinism and
    disjointness are pytest-pinned."""
    docs = _t(spark, sf_dir, "documents")
    split = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    targets = {"train": 0.8, "val": 0.1, "test": 0.1}
    target_col = F.create_map(
        *[x for k, v in targets.items() for x in (F.lit(k), F.lit(v))]
    )
    # the corpus total rides in-plan (1-row scalar cross, the
    # q_domain_mixture_contract pattern) instead of a separate
    # driver-side count() action re-scanning the table
    total = docs.agg(F.count("*").alias("__total"))
    agg = split.groupBy("split").agg(F.count("*").alias("n")).crossJoin(total)
    return agg.select(
        "split",
        (
            F.abs(F.col("n") / F.col("__total") - target_col[F.col("split")])
            <= 0.03
        ).alias("frac_ok"),
        (F.sum("n").over(Window.partitionBy()) == F.col("__total")).alias("covers_all"),
    ).orderBy("split")


@register_extra(
    "q_seeded_shuffle",
    """SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':42') AS ord_key
       FROM documents ORDER BY ord_key, doc_id LIMIT 100""",
)
def q_seeded_shuffle(spark, sf_dir):
    """Reproducible training order (operators/sampling.py:
    seeded_shuffle): the corpus sorted by md5(doc_id ':' seed) — a
    pure content-hash permutation that is identical across clusters,
    partitionings, and task retries, where orderBy(rand(seed)) is
    none of those. md5 deliberately, so the oracle (and any external
    consumer) reproduces the exact order from the recipe; the head of
    the shuffled corpus is compared value-for-value. The full sort is
    a range exchange + local sort; with the limit it collapses to
    TakeOrdered."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return sampling.seeded_shuffle(docs, "doc_id", seed=42).limit(100)


@register_extra(
    "q_histogram_stats",
    """WITH v AS (SELECT CAST(value AS DOUBLE) AS v FROM events WHERE value IS NOT NULL),
       b AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM v)
       SELECT LEAST(CAST(FLOOR((v - mn) / ((mx - mn) / 10)) AS INT), 9) AS bucket,
              COUNT(*) AS n, MIN(v) AS v_min, MAX(v) AS v_max
       FROM v, b GROUP BY 1""",
)
def q_histogram_stats(spark, sf_dir):
    """Equi-width histogram construction — the engine-level form of
    the ANALYZE statistics the store commits per collection
    (store/stats.py, the reference's «histograms/statistics»
    future-work item). The min/max bounds come from a scalar
    aggregate crossed back into the scan (1-row build side — the
    shape plan_audit auto-allows), then one groupBy on the bucket id:
    two passes over the column, no sort, partials compose. Bucket
    arithmetic runs in identical IEEE double steps on both engines so
    the exact per-bucket counts and extrema must match."""
    e = _t(spark, sf_dir, "events").select(
        F.col("value").cast("double").alias("v")
    ).filter(F.col("v").isNotNull())
    b = e.agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    j = e.crossJoin(b)
    bucket = F.least(
        F.floor((F.col("v") - F.col("mn")) / ((F.col("mx") - F.col("mn")) / 10)).cast("int"),
        F.lit(9),
    )
    return j.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
    )


@register_extra(
    "q_approx_distinct_contract",
    """SELECT event_type,
              COUNT(DISTINCT user_id) AS n_exact,
              true AS within_5pct
       FROM events GROUP BY event_type""",
)
def q_approx_distinct_contract(spark, sf_dir):
    """Sketch surface with an honest gate: HyperLogLog++ approximate
    distinct counts (approx_count_distinct, rsd=0.02) per event_type,
    gated by the contract |approx - exact| <= 5% of exact — the bound
    the sketch is sold on, computed in-plan against the exact
    distinct. At 100 TB the sketch is the only viable path (fixed
    ~kB of state per group vs a shuffle of every distinct user); the
    exact twin here exists only to verify it at gate SF."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
    )
    return agg.select(
        "event_type",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact")) * 100
            <= F.col("n_exact") * 5
        ).alias("within_5pct"),
    )


@register_extra(
    "ts_correlation_pairs",
    """WITH daily AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
         FROM events GROUP BY 1, 2
       )
       SELECT a.event_type AS a_type, b.event_type AS b_type,
              ROUND(corr(a.v, b.v), 6) AS r, COUNT(*) AS n_days
       FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
       GROUP BY 1, 2""",
)
def ts_correlation_pairs(spark, sf_dir):
    """Cross-series Pearson correlation between the per-type daily
    value series — the co-movement screen time-series warehouses run
    across metrics. The fact table reduces to (type, day) partials
    FIRST (exact decimal sums; one shuffle proportional to days ×
    types, not events), and only the tiny reduced series self-join —
    at 100 TB the pairwise stage is metadata-sized. corr runs on
    doubles and is rounded to 6 (both engines compute sample Pearson
    over identical inputs)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("v"))
    )
    a = daily.alias("a")
    b = daily.alias("b")
    return (
        a.join(
            b,
            (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("a_type"),
            F.col("b.event_type").alias("b_type"),
        )
        .agg(
            # Spark corr yields NaN on zero-variance/single-point
            # groups where SQL corr yields NULL — normalize to NULL
            F.round(
                F.when(
                    ~F.isnan(F.corr(F.col("a.v"), F.col("b.v"))),
                    F.corr(F.col("a.v"), F.col("b.v")),
                ),
                6,
            ).alias("r"),
            F.count("*").alias("n_days"),
        )
    )


@register_extra(
    "ts_series_similarity",
    """WITH daily AS (
         SELECT user_id AS sid, CAST(date_trunc('day', ts) AS DATE) AS d,
                CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
         FROM events GROUP BY 1, 2
       ),
       span AS (SELECT MIN(d) AS d0 FROM daily),
       dd AS (SELECT sid, d - (SELECT d0 FROM span) AS di, v FROM daily),
       days AS (
         SELECT unnest(generate_series(0, (SELECT MAX(di) FROM dd))) AS di
       ),
       grid AS (SELECT sid, di FROM (SELECT DISTINCT sid FROM dd) CROSS JOIN days),
       dense AS (
         SELECT g.sid, g.di, COALESCE(dd.v, 0.0) AS v
         FROM grid g LEFT JOIN dd ON g.sid = dd.sid AND g.di = dd.di
       ),
       qv AS (SELECT di, v FROM dense WHERE sid = 0),
       dist AS (
         SELECT d.sid, SQRT(SUM((d.v - q.v) * (d.v - q.v))) AS dist
         FROM dense d JOIN qv q ON d.di = q.di WHERE d.sid <> 0 GROUP BY 1
       ),
       ranked AS (
         SELECT sid, dist, ROW_NUMBER() OVER (ORDER BY dist, sid) AS rank FROM dist
       )
       SELECT sid AS neighbor_id, ROUND(dist, 6) AS distance, rank, true AS certified
       FROM ranked WHERE rank <= 5""",
)
def ts_series_similarity(spark, sf_dir):
    """Whole-series similarity search
    (operators/timeseries.py:series_similarity_topk): top-5 users by
    euclidean distance between densified daily value series, with PAA
    lower-bound pruning and a per-row exactness certificate. The
    synthetic series are white-noise-like — the adversarial case
    where PAA bounds are weak and the certificate correctly reports
    that pruning would be unsafe — so this entry runs with a
    corpus-covering candidate set (candidate_factor=None = exact
    no-pruning mode at ANY scale factor; certified=true trivially,
    answer provably exact, oracle = the full SQL scan). The pruning
    payoff on smooth/trended series, certified at candidate_factor=2,
    is pytest-pinned (test_series_similarity_*)."""
    return timeseries.series_similarity_topk(
        _t(spark, sf_dir, "events"), 0, k=5, candidate_factor=None
    )


@register_extra(
    "q_funnel_ordered",
    """WITH ev AS (
         SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
       ),
       s1 AS (
         SELECT user_id, MIN(ts) AS t FROM ev WHERE event_type = 'view' GROUP BY 1
       ),
       s2 AS (
         SELECT e.user_id, MIN(e.ts) AS t
         FROM ev e JOIN s1 ON e.user_id = s1.user_id
         WHERE e.event_type = 'click' AND e.ts > s1.t
           AND e.ts <= s1.t + INTERVAL 259200 SECOND
         GROUP BY 1
       ),
       s3 AS (
         SELECT e.user_id, MIN(e.ts) AS t
         FROM ev e JOIN s2 ON e.user_id = s2.user_id
         WHERE e.event_type = 'purchase' AND e.ts > s2.t
           AND e.ts <= s2.t + INTERVAL 259200 SECOND
         GROUP BY 1
       )
       SELECT 1 AS step, 'view' AS step_name, (SELECT COUNT(*) FROM s1) AS n_users
       UNION ALL
       SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
       UNION ALL
       SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)""",
)
def q_funnel_ordered(spark, sf_dir):
    """Ordered conversion funnel (operators/funnel.py): view → click
    → purchase with each step within 3 days of the previous. One
    shuffle + one JVM array fold per user — the oracle's k-level
    min-chaining join cascade re-scans the fact table per step, which
    is exactly what the fold form avoids at 100 TB. Counts at sf0.01:
    150 → 115 → 81."""
    return funnel.funnel(
        _t(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        max_gap_seconds=259200,
    )


@register_extra(
    "dedup_fuzzy_names",
    """SELECT a.c_custkey AS a_id, b.c_custkey AS b_id,
              levenshtein(a.c_name, b.c_name) AS distance
       FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
       WHERE a.c_custkey < 2000 AND b.c_custkey < 2000
         AND levenshtein(a.c_name, b.c_name) <= 1""",
)
def dedup_fuzzy_names(spark, sf_dir):
    """Record linkage by edit distance (operators/dedup.py:fuzzy_pairs):
    pigeonhole segment blocking + exact levenshtein verify, checked
    against the quadratic all-pairs oracle. Honest caveat: the
    synthetic Customer#%09d names share 15 constant characters, so
    the non-digit segment blocks are degenerate and the candidate set
    approaches all-pairs AT THIS CORPUS — real name corpora spread
    blocks, and the join stays a keyed equi-join (skewed, never a
    nested-loop product) even here. Recall is complete for the
    equal-length substitution pairs this table contains, which is why
    the exact oracle is valid. The entry (and its all-pairs oracle)
    runs on a FIXED 2000-key slice so the degenerate-block cost stays
    scale-independent — at sf0.1 the unsliced degenerate case is
    ~112M verify pairs on both engines."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 2000)
    return dedup.fuzzy_pairs(c, "c_custkey", "c_name", max_distance=1).orderBy(
        "a_id", "b_id"
    )


@register_extra(
    "text_normalized_dedup",
    """WITH n AS (
         SELECT doc_id,
                md5(text) AS raw_hash,
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^\\w \\t\\n\\f\\r]', '', 'g'),
                                        '[ \\t\\n\\f\\r]+', ' ', 'g'))) AS norm_hash
         FROM documents
       )
       SELECT COUNT(*) AS n_docs,
              COUNT(DISTINCT raw_hash) AS n_raw_distinct,
              COUNT(DISTINCT norm_hash) AS n_norm_distinct
       FROM n""",
)
def text_normalized_dedup(spark, sf_dir):
    """Normalization-robust exact dedup
    (operators/text.py:normalized_text): hash the canonical text form
    (lowercase, punctuation stripped, whitespace collapsed) next to
    the raw hash — the cheap first rung of the near-dup ladder that
    catches trivial variants before any shingling. Emits corpus-level
    distinct counts for both hash families; at 100 TB each distinct
    count is one shuffle of 16-byte digests."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.select(
        F.md5("text").alias("raw_hash"),
        F.md5(text.normalized_text(F.col("text"))).alias("norm_hash"),
    )
    return n.agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("raw_hash").alias("n_raw_distinct"),
        F.count_distinct("norm_hash").alias("n_norm_distinct"),
    )


@register_extra(
    "dedup_span_stats",
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       ),
       idx AS (
         SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS i
         FROM toks WHERE len(t) >= 8
       ),
       sp AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+7], ' ') AS span FROM idx),
       boiler AS (SELECT span FROM sp GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2),
       per_doc AS (
         SELECT s.doc_id, COUNT(*) AS n_spans, COUNT(b.span) AS n_dup_spans
         FROM sp s LEFT JOIN boiler b ON s.span = b.span
         GROUP BY s.doc_id
       )
       SELECT d.doc_id,
              COALESCE(p.n_spans, 0) AS n_spans,
              COALESCE(p.n_dup_spans, 0) AS n_dup_spans,
              CAST(ROUND(CAST(COALESCE(p.n_dup_spans, 0) AS DECIMAL(38,12))
                         / GREATEST(COALESCE(p.n_spans, 0), 1), 6) AS DOUBLE) AS dup_fraction
       FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id""",
)
def dedup_span_stats(spark, sf_dir):
    """Cross-document duplicated-span profile
    (operators/dedup.py:dup_span_stats): per document, how many of its
    distinct 8-token sliding windows occur in ≥2 documents — the
    fixed-granularity form of exact substring dedup (a duplicated run
    of ≥8 tokens is caught at ANY alignment) and the cross-corpus
    complement of text_repetition's intra-document stats. The oracle
    replays the full window/flag/count pipeline on raw spans while the
    engine shuffles only 8-byte span hashes — the counts must still
    agree exactly. dup_fraction divides as DECIMAL before rounding so
    both engines round the same digits."""
    return dedup.dup_span_stats(
        _t(spark, sf_dir, "documents"), span=8, min_docs=2
    )


@register_extra(
    "text_token_rarity",
    """WITH toks AS (
         SELECT doc_id, tok
         FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
               FROM documents)
         WHERE tok <> ''
       ),
       freq AS (SELECT tok, COUNT(*) AS freq FROM toks GROUP BY tok)
       SELECT t.doc_id, COUNT(*) AS n_tokens,
              CAST(SUM(freq) AS BIGINT) AS sum_freq,
              CAST(ROUND(CAST(SUM(freq) AS DECIMAL(28,12)) / COUNT(*), 6) AS DOUBLE) AS mean_freq
       FROM toks t JOIN freq USING (tok)
       GROUP BY t.doc_id""",
)
def text_token_rarity(spark, sf_dir):
    """Corpus token-rarity quality profile
    (operators/text.py:token_rarity): per document, the total and
    mean corpus frequency of its token occurrences — the two-pass
    (vocabulary count + join back) corpus statistic that flags
    gibberish (rare-heavy) and boilerplate (common-heavy) tails,
    complementing the corpus-free per-row quality score. Integer
    sums end-to-end with one DECIMAL division, so both engines must
    agree exactly."""
    return text.token_rarity(_t(spark, sf_dir, "documents"))


_STREAM_WINDOW_RESULTS: dict[str, object] = {}


def _events_stream(spark, sf_dir, prefix="hs_stream_src_"):
    """The events table as a real file-source stream, staged as one
    symlinked parquet (no data copy). Single-file replay delivers
    everything in one micro-batch, so the ordered-replay rule for
    watermarked multi-file backfills does not come into play here.
    Returns (batch_df, stream_df)."""
    import os
    import tempfile

    batch = _t(spark, sf_dir, "events")
    d = tempfile.mkdtemp(prefix=prefix)
    src = os.path.abspath(os.path.join(sf_dir, "events.parquet"))
    if os.path.isdir(src):
        # Spark-written fixtures (e.g. tools/sf1_smoke.py) store a
        # parquet DIRECTORY; consolidate it to one staged file so the
        # single-file replay contract above holds for them too (a bare
        # dir symlink globs zero files -> an empty stream that commits
        # no state at all — r12 full-driver sf1 smoke finding)
        stage = tempfile.mkdtemp(prefix=prefix + "stage_")
        batch.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in sorted(os.listdir(stage)) if f.endswith(".parquet"))
        os.symlink(os.path.join(stage, part), os.path.join(d, "events.parquet"))
    else:
        os.symlink(src, os.path.join(d, "events.parquet"))
    return batch, spark.readStream.schema(batch.schema).parquet(d)


def _run_to_memory(spark, out, name, mode):
    """Drain a streaming DataFrame into a memory sink (availableNow)
    and return the result table — the run-to-completion harness every
    streaming catalog entry shares."""
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


@register_extra(
    "q_stream_window_counts",
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start, event_type,
              COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
       FROM events GROUP BY 1, 2""",
)
def q_stream_window_counts(spark, sf_dir):
    """Structured Streaming tumbling-window aggregation gated against
    the BATCH oracle: the events table is replayed through an actual
    readStream (file source, availableNow trigger) into
    streaming/windows.py:windowed_event_counts — event-time 1-day
    windows, watermark, complete-mode memory sink — and the streamed
    result must equal GROUP BY date_trunc over the same rows. This is
    the only way to prove the streaming window path computes the same
    answer as the batch engine, not merely that it runs. Values sum
    on DECIMAL so stream/batch/oracle agree bit-for-bit; the stream
    runs once per (session, sf_dir) and is memoized — re-planning the
    entry must not re-run the query."""
    df = _STREAM_WINDOW_RESULTS.get(sf_dir)
    if df is None:
        from .streaming.windows import windowed_event_counts

        _, stream = _events_stream(spark, sf_dir, prefix="hs_stream_win_")
        stream = stream.withColumn("value", F.col("value").cast("decimal(18,6)"))
        agg = windowed_event_counts(stream, window="1 day", watermark="2 hours")
        df = _run_to_memory(spark, agg, f"stream_win_{abs(hash(sf_dir))}", "complete")
        _STREAM_WINDOW_RESULTS[sf_dir] = df
    return df.select(
        "window_start",
        "event_type",
        "n",
        F.round("total_value", 2).cast("double").alias("total_value"),
    )


_JSONL_ROUNDTRIP_RESULTS: dict[str, DataFrame] = {}


@register_extra(
    "q_jsonl_roundtrip",
    """SELECT doc_id, text, lang FROM documents
       WHERE lang = 'fr' AND doc_id < 500""",
)
def q_jsonl_roundtrip(spark, sf_dir):
    """The JSONL corpus boundary (sources/jsonl.py) in the oracle
    gate: a deterministic documents slice is WRITTEN as JSONL shards
    and READ BACK under the explicit schema (PERMISSIVE +
    quarantine split), and the round-trip must reproduce the parquet
    slice value-for-value — newline/quote/unicode escaping included,
    which a pytest on constructed rows cannot prove against real
    corpus text. Quarantine must come back empty (asserted in-plan by
    the anti-join union trick: any quarantine row would change the
    count). Memoized per (session, sf_dir)."""
    df = _JSONL_ROUNDTRIP_RESULTS.get(sf_dir)
    if df is None:
        import tempfile

        from .sources import read_jsonl, write_jsonl

        src = (
            _t(spark, sf_dir, "documents")
            .filter((F.col("lang") == "fr") & (F.col("doc_id") < 500))
            .select("doc_id", "text", "lang")
        )
        out = tempfile.mkdtemp(prefix="hs_jsonl_rt_") + "/docs"
        write_jsonl(src, out, shards=2)
        clean, quarantine = read_jsonl(spark, out, "doc_id long, text string, lang string")
        # a non-empty quarantine is a round-trip failure: surface it as
        # extra rows (doc_id NULL) so the oracle compare cannot pass
        df = clean.unionByName(
            quarantine.select(
                F.lit(None).cast("long").alias("doc_id"),
                F.col("raw").alias("text"),
                F.lit("__quarantined__").alias("lang"),
            )
        )
        _JSONL_ROUNDTRIP_RESULTS[sf_dir] = df
    return df


_STREAM_EXPECT_RESULTS: dict[str, DataFrame] = {}


@register_extra(
    "q_stream_expectations",
    """WITH n AS (SELECT COUNT(*) AS n_rows FROM events)
       SELECT 'not_null(user_id)' AS rule, n.n_rows,
              (SELECT COUNT(*) FROM events WHERE user_id IS NULL)
                  AS n_violations
       FROM n
       UNION ALL
       SELECT 'in_range(value,0.0,100.0)', n.n_rows,
              (SELECT COUNT(*) FROM events
               WHERE value IS NOT NULL AND (value < 0.0 OR value > 100.0))
       FROM n
       UNION ALL
       SELECT 'unique(event_id)', n.n_rows,
              (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM
                 (SELECT COUNT(*) AS c FROM events
                  WHERE event_id IS NOT NULL GROUP BY event_id))
       FROM n
       ORDER BY rule""",
)
def q_stream_expectations(spark, sf_dir):
    """The streaming data-quality gate in the oracle catalog
    (operators/expectations.py streaming_expectations): events
    replayed through a real readStream into the continuous rule
    engine, cumulative per-rule counts read back from the persisted
    state — and they must equal rule-by-rule SQL recomputation over
    the whole table (value 0-100 genuinely violates on this corpus;
    the other two rules pin the zero-violation path). The quarantine
    file count is implicitly gated too: a wrong quarantine split
    would desynchronize the violation counts it derives from.
    Memoized per (session, sf_dir)."""
    df = _STREAM_EXPECT_RESULTS.get(sf_dir)
    if df is None:
        import tempfile

        from .operators import expectations as ex

        _, stream = _events_stream(spark, sf_dir, prefix="hs_stream_exp_")
        rules = [
            ex.not_null("user_id"),
            ex.in_range("value", 0.0, 100.0),
            ex.unique("event_id"),
        ]
        state = tempfile.mkdtemp(prefix="hs_exp_state_")
        sink = ex.streaming_expectations(state, rules, run_id=state)
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="hs_exp_ckpt_"))
            .start()
        )
        q.awaitTermination()
        df = ex.read_expectation_counts(spark, state)
        _STREAM_EXPECT_RESULTS[sf_dir] = df
    return df.select("rule", "n_rows", "n_violations").orderBy("rule")


_STREAM_HH_RESULTS: dict[str, DataFrame] = {}


@register_extra(
    "q_stream_heavy_hitters",
    """WITH t AS (SELECT COUNT(*) AS n FROM events)
       SELECT event_type AS value, COUNT(*) AS exact_n,
              true AS est_sound, CAST(t.n AS BIGINT) AS n_total
       FROM events, t GROUP BY event_type, t.n ORDER BY event_type""",
)
def q_stream_heavy_hitters(spark, sf_dir):
    """Streaming heavy hitters in the oracle gate (operators/
    sketches.py streaming_heavy_hitters): the events table replayed
    through a real readStream into the persisted count-min +
    pigeonhole-admission sink at φ=0.05, then the served set audited
    in-plan — every event type holds ≥ ~20% share, so the served set
    must be EXACTLY the 5 types (oracle pins value + exact count +
    total), and each estimate must satisfy the CM contract
    exact ≤ est ≤ exact + (e/width)·N (emitted as est_sound; the
    grid hash is engine-specific, the CONTRACT is not). Memoized per
    (session, sf_dir)."""
    df = _STREAM_HH_RESULTS.get(sf_dir)
    if df is None:
        import tempfile

        from .operators.sketches import read_heavy_hitters, streaming_heavy_hitters

        batch, stream = _events_stream(spark, sf_dir, prefix="hs_stream_hh_")
        state = tempfile.mkdtemp(prefix="hs_hh_state_")
        sink = streaming_heavy_hitters(state, "event_type", phi=0.05, run_id=state)
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="hs_hh_ckpt_"))
            .start()
        )
        q.awaitTermination()
        served = read_heavy_hitters(spark, state)
        exact = batch.groupBy(F.col("event_type").alias("value")).agg(
            F.count("*").alias("exact_n")
        )
        bound = F.lit(2.718281828459045 / 2719.0) * F.col("n_total")
        df = (
            served.join(exact, "value")
            .select(
                "value",
                "exact_n",
                (
                    (F.col("cms_estimate") >= F.col("exact_n"))
                    & (F.col("cms_estimate") <= F.col("exact_n") + bound)
                ).alias("est_sound"),
                F.col("n_total").cast("long").alias("n_total"),
            )
        )
        _STREAM_HH_RESULTS[sf_dir] = df
    return df.orderBy("value")


_STREAM_CORPUS_STATS_RESULTS: dict[str, DataFrame] = {}


@register_extra(
    "q_stream_corpus_stats",
    """WITH uniq AS (
         SELECT doc_id, text, lang FROM (
           SELECT doc_id, text, lang,
                  ROW_NUMBER() OVER (PARTITION BY md5(text)
                                     ORDER BY doc_id) AS rn
           FROM documents WHERE text IS NOT NULL
         ) WHERE rn = 1
       )
       SELECT lang, COUNT(*) AS n_docs,
              CAST(SUM(length(text)) AS BIGINT) AS n_chars
       FROM uniq GROUP BY lang ORDER BY lang""",
)
def q_stream_corpus_stats(spark, sf_dir):
    """The streaming corpus-prep capstone in the oracle gate
    (operators/dedup.py streaming_corpus_stats): the documents table
    replayed through a real readStream into the continuous
    incremental-dedup + stats sink, then the persisted per-language
    state read back — and it must equal the SQL batch pipeline
    (digest keep-first dedup + grouped stats) over the whole table,
    because after any stream prefix the state equals the batch
    computation over the rows so far. Memoized per (session, sf_dir)
    like the other stream entries."""
    import os
    import tempfile

    df = _STREAM_CORPUS_STATS_RESULTS.get(sf_dir)
    if df is None:
        from .operators.dedup import read_corpus_stats, streaming_corpus_stats

        batch = _t(spark, sf_dir, "documents")
        d = tempfile.mkdtemp(prefix="hs_stream_cstats_")
        os.symlink(
            os.path.abspath(os.path.join(sf_dir, "documents.parquet")),
            os.path.join(d, "documents.parquet"),
        )
        stream = spark.readStream.schema(batch.schema).parquet(d)
        state = tempfile.mkdtemp(prefix="hs_cstats_state_")
        sink = streaming_corpus_stats(state, run_id=state)
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", tempfile.mkdtemp(prefix="hs_cstats_ckpt_")
            )
            .start()
        )
        q.awaitTermination()
        df = read_corpus_stats(spark, state)
        _STREAM_CORPUS_STATS_RESULTS[sf_dir] = df
    return df.select("lang", "n_docs", "n_chars").orderBy("lang")


_STREAM_SAMPLE_RESULTS: dict[str, DataFrame] = {}


@register(
    "q_stream_uniform_sample",
    """SELECT event_id, event_type FROM events
       ORDER BY md5('smp:' || event_id), event_id LIMIT 256""",
)
def q_stream_uniform_sample(spark, sf_dir):
    """Streaming deterministic uniform sample (operators/sampling.py
    streaming_uniform_sample): the events table replayed through a
    real readStream into the bottom-k-by-hash foreachBatch sink, then
    the persisted ≤256-row state read back — and it must equal the
    SQL bottom-k over the entire table, because bottom-k(A∪B) ≡
    bottom-k(bottom-k(A)∪B) makes the incremental fold exact after
    any prefix. The only streaming sample with a full-value oracle:
    a random reservoir could never be gated this way. Memoized per
    (session, sf_dir) like the other stream entries."""
    import tempfile

    df = _STREAM_SAMPLE_RESULTS.get(sf_dir)
    if df is None:
        _, stream = _events_stream(spark, sf_dir, prefix="hs_stream_smp_")
        state = tempfile.mkdtemp(prefix="hs_smp_state_")
        sink = sampling.streaming_uniform_sample(
            state,
            id_col="event_id",
            payload_cols=("event_type",),
            k=256,
            run_id=state,
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .trigger(availableNow=True)
            .option("checkpointLocation", tempfile.mkdtemp(prefix="hs_smp_ckpt_"))
            .start()
        )
        q.awaitTermination()
        df = sampling.read_uniform_sample(spark, state)
        _STREAM_SAMPLE_RESULTS[sf_dir] = df
    return df.select("event_id", "event_type").orderBy("event_id")


@register_extra(
    "q_stream_session_windows",
    """WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
       b AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS cutoff FROM ev),
       o AS (
         SELECT user_id, ts,
                CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END AS brk
         FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       ),
       s AS (SELECT user_id, ts,
                    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
             FROM o),
       g AS (
         SELECT user_id, MIN(ts) AS session_start,
                MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                COUNT(*) AS n_events
         FROM s GROUP BY user_id, sid
       )
       SELECT user_id, session_start, session_end, n_events
       FROM g, b WHERE session_end < cutoff""",
)
def q_stream_session_windows(spark, sf_dir):
    """Streaming SESSION windows gated against a batch gaps-and-islands
    oracle: events replay through a real readStream into
    F.session_window (streaming/windows.py:session_windows — dynamic
    merge within a 30-minute gap, watermark-closed state, append
    mode), and every emitted session must equal the LAG-based SQL
    sessionization. Both sides restrict to sessions ending at least
    one watermark-delay before the stream's end — append mode only
    emits watermark-CLOSED sessions, so the cutoff makes the
    comparison set well-defined regardless of exact final-watermark
    boundary semantics. Session end is last-event + gap (the
    F.session_window convention), and a gap of exactly 30 minutes
    starts a new session (half-open windows) — the oracle mirrors
    both."""
    df = _STREAM_WINDOW_RESULTS.get(f"sess:{sf_dir}")
    if df is None:
        import tempfile

        from .streaming.windows import session_windows

        batch = _t(spark, sf_dir, "events")
        src = tempfile.mkdtemp(prefix="hs_stream_sess_")
        # Replay history IN EVENT ORDER (range-partitioned by ts,
        # sorted files): a hash-partitioned staging makes every file
        # span the whole time range, so after the first micro-batch
        # the watermark jumps near the end and every later batch's
        # rows are dropped as LATE — half the sessions silently
        # vanish (observed). Time-ordered files keep each batch ahead
        # of the watermark, which is how a real backfill must feed a
        # watermarked streaming job.
        batch.repartitionByRange(8, F.col("ts")).sortWithinPartitions("ts").write.mode(
            "overwrite"
        ).parquet(src)
        # FileStreamSource orders files by MODIFICATION TIME, and a
        # parallel write leaves ties — observed batches mixing ranges,
        # which re-creates the late-drop problem. Stamp strictly
        # increasing mtimes in part order (range partition k is
        # part-0000k) so replay order == event order.
        import glob
        import os as _os
        import time as _time

        base = _time.time() - 3600
        for i, p in enumerate(sorted(glob.glob(f"{src}/part-*.parquet"))):
            _os.utime(p, (base + i, base + i))
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        agg = session_windows(stream, gap="30 minutes", watermark="1 hour")
        df = _run_to_memory(spark, agg, f"stream_sess_{abs(hash(sf_dir))}", "append")
        _STREAM_WINDOW_RESULTS[f"sess:{sf_dir}"] = df
    cutoff = (
        _t(spark, sf_dir, "events")
        .agg((F.max("ts") - F.expr("INTERVAL 1 HOUR")).alias("c"))
        .collect()[0]["c"]
    )
    return df.filter(F.col("session_end") < F.lit(cutoff)).select(
        "user_id", "session_start", "session_end", "n_events"
    )


@register_extra(
    "q_stream_dedup",
    """SELECT DISTINCT event_id, user_id, event_type, ts, value
       FROM events WHERE event_id < 5000""",
)
def q_stream_dedup(spark, sf_dir):
    """Streaming exact dedup gated against the batch DISTINCT oracle:
    a slice of events is DOUBLED (every row gets an identical twin)
    and replayed through dropDuplicatesWithinWatermark
    (streaming/windows.py:stream_dedup, keyed on event_id). Because
    each duplicate pair arrives inside the watermark horizon, the
    emitted set must equal DISTINCT of the slice value-for-value —
    the firehose-dedup face of dedup_exact, proven not just to run
    but to compute the batch answer. Identical twins also make the
    kept-row content deterministic (whichever arrival survives, the
    values are the same)."""
    df = _STREAM_WINDOW_RESULTS.get(f"dedup:{sf_dir}")
    if df is None:
        import tempfile

        from .streaming.windows import stream_dedup

        batch = (
            _t(spark, sf_dir, "events")
            .filter(F.col("event_id") < 5000)
            .select("event_id", "user_id", "event_type", "ts", "value")
        )
        doubled = batch.unionAll(batch)
        src = tempfile.mkdtemp(prefix="hs_stream_dedup_")
        doubled.repartition(4).write.mode("overwrite").parquet(src)
        stream = (
            spark.readStream.schema(doubled.schema)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        # 100-day watermark >> the slice's span: no pair straddles the
        # horizon, so at-least-once-per-horizon degenerates to exact
        out = stream_dedup(stream, ["event_id"], watermark="100 days")
        df = _run_to_memory(spark, out, f"stream_dedup_{abs(hash(sf_dir))}", "append")
        _STREAM_WINDOW_RESULTS[f"dedup:{sf_dir}"] = df
    return df.select("event_id", "user_id", "event_type", "ts", "value")


@register_extra(
    "q_range_frame_window",
    """SELECT user_id, event_id,
              COUNT(*) OVER w AS n_3d,
              CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE) AS sum_3d
       FROM (SELECT user_id, event_id, value, CAST(ts AS TIMESTAMP) AS ts FROM events)
       WINDOW w AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL 3 DAY PRECEDING AND CURRENT ROW)""",
)
def q_range_frame_window(spark, sf_dir):
    """Time-based sliding window via a RANGE frame: per user, the
    rolling 3-day event count and decimal value sum ending at each
    event — the frame is defined by TIME distance, not row count
    (rows frames undercount on irregular event spacing). Spark's
    rangeBetween needs a numeric ordering key, so the frame runs on
    epoch MICROseconds — full timestamp precision; flooring to whole
    seconds would misclassify boundary events and same-second peers
    against the oracle's INTERVAL arithmetic (caught at sf0.1). Same
    per-user single sort either way."""
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3 * 86400 * 1_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_3d"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 2)
        .cast("double")
        .alias("sum_3d"),
    )


@register_extra(
    "q_array_functions",
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       )
       SELECT doc_id,
              len(t) AS n_tokens,
              len(list_distinct(t)) AS n_distinct,
              list_has_any(t, ['the', 'and', 'of']) AS has_stopword,
              list_sort(t)[1] AS first_sorted,
              list_sort(t)[len(t)] AS last_sorted,
              len(list_filter(t, x -> length(x) >= 6)) AS n_long_tokens
       FROM toks""",
)
def q_array_functions(spark, sf_dir):
    """Array/higher-order-function surface in one row-local pass:
    distinct count, membership against a literal set, sorted extremes,
    and a filtered length — all inside whole-stage codegen, zero
    shuffles (set results cross the boundary as sizes/booleans/
    extremes because element ORDER of intersections is
    engine-specific)."""
    t = text.tokens_col(F.col("text"))
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.arrays_overlap(t, F.array(F.lit("the"), F.lit("and"), F.lit("of"))).alias(
            "has_stopword"
        ),
        F.array_sort(t)[0].alias("first_sorted"),
        F.element_at(F.array_sort(t), F.size(t)).alias("last_sorted"),
        F.size(F.filter(t, lambda x: F.length(x) >= 6)).alias("n_long_tokens"),
    )


@register_extra(
    "q_argminmax_nth",
    """WITH ranked AS (
         SELECT user_id, value,
                ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
         FROM events
       ),
       agg AS (
         SELECT user_id,
                arg_min(value, event_id) AS first_value,
                arg_max(value, event_id) AS last_value,
                COUNT(*) AS n_events
         FROM events GROUP BY 1
       )
       SELECT a.user_id, first_value, last_value, t.value AS third_value, n_events
       FROM agg a LEFT JOIN (SELECT user_id, value FROM ranked WHERE rn = 3) t
         USING (user_id)""",
)
def q_argminmax_nth(spark, sf_dir):
    """Ordered-selection aggregates: min_by/max_by (argmin/argmax —
    one grouped pass, no sort) plus an nth-row pick via a rank window,
    keyed on the unique event_id so selection is deterministic.
    Values cross the boundary uncopied (no arithmetic), so the hash
    comparison is exact."""
    e = _t(spark, sf_dir, "events")
    agg = e.groupBy("user_id").agg(
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("value", "event_id").alias("last_value"),
        F.count("*").alias("n_events"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    third = (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 3)
        .select("user_id", F.col("value").alias("third_value"))
    )
    return agg.join(third, "user_id", "left").select(
        "user_id", "first_value", "last_value", "third_value", "n_events"
    )


@register_extra(
    "q_cohort_retention",
    """WITH activity AS (
         SELECT DISTINCT user_id AS u, CAST(date_trunc('week', ts) AS DATE) AS w
         FROM events
       ),
       cohorts AS (SELECT u, MIN(w) AS cohort_week FROM activity GROUP BY 1),
       sizes AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
       joined AS (
         SELECT cohort_week, CAST((w - cohort_week) / 7 AS BIGINT) AS week_offset, a.u
         FROM activity a JOIN cohorts c ON a.u = c.u
       )
       SELECT j.cohort_week, week_offset, COUNT(DISTINCT u) AS n_active, cohort_size
       FROM joined j JOIN sizes s ON j.cohort_week = s.cohort_week
       WHERE week_offset <= 8
       GROUP BY 1, 2, 4""",
)
def q_cohort_retention(spark, sf_dir):
    """Weekly cohort retention (operators/funnel.py:cohort_retention):
    first-seen week × activity offset × distinct active users, with
    cohort sizes attached — two grouped reductions over one scan,
    counts only across the engine boundary (ratios are presentation
    and a float hazard)."""
    return funnel.cohort_retention(_t(spark, sf_dir, "events"), max_weeks=8)


@register_extra(
    "q_approx_percentile_contract",
    """SELECT event_type,
              ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50_exact,
              ROUND(percentile_cont(0.99) WITHIN GROUP (ORDER BY value), 6) AS p99_exact,
              true AS p50_ok, true AS p99_ok
       FROM events GROUP BY event_type""",
)
def q_approx_percentile_contract(spark, sf_dir):
    """Quantile-sketch surface with an honest gate (the
    q_approx_distinct_contract pattern for percentile_approx), stated
    in the sketch's OWN terms: Greenwald–Khanna guarantees the
    returned element's rank window [count(<a)+1, count(≤a)] overlaps
    q·n ± εn (ε = 1/accuracy), so the gate recomputes both counts
    in-plan and asserts exactly that, ±1 for rank-definition
    discretization. A value-distance band was the previous gate and
    mis-fired at sf0.001: with 200 rows/group the sketch legally
    returns an exact order statistic whose DISTANCE to the
    interpolated p99 is one tail gap — large in value, zero in rank.
    The rank gate is scale-free: it is the contract GK actually
    makes at n=200 and at 100 TB alike. The exact percentile twins
    are still emitted and oracle-matched."""
    e = _t(spark, sf_dir, "events")
    acc = 10_000
    agg = e.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_exact"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99_exact"),
        F.percentile_approx("value", F.lit(0.5), F.lit(acc)).alias("a50"),
        F.percentile_approx("value", F.lit(0.99), F.lit(acc)).alias("a99"),
        F.count("value").alias("n"),
    )
    j = e.select("event_type", "value").join(F.broadcast(agg), "event_type")
    chk = j.groupBy(
        "event_type", "p50_exact", "p99_exact", "n", "a50", "a99"
    ).agg(
        F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a99")).cast("long")).alias("le99"),
        F.sum((F.col("value") < F.col("a99")).cast("long")).alias("lt99"),
    )

    def rank_ok(q, le, lt):
        target = F.col("n") * F.lit(q)
        slack = F.col("n") * F.lit(1.0 / acc) + F.lit(1.0)
        return (F.col(le) >= target - slack) & (F.col(lt) + 1 <= target + slack)

    return chk.select(
        "event_type",
        "p50_exact",
        "p99_exact",
        rank_ok(0.5, "le50", "lt50").alias("p50_ok"),
        rank_ok(0.99, "le99", "lt99").alias("p99_ok"),
    )


@register_extra(
    "ts_gapfill_linear",
    """WITH agg AS (
         SELECT user_id, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
                COUNT(*) AS n
         FROM events WHERE user_id < 40 GROUP BY 1, 2
       ),
       span AS (SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM agg GROUP BY 1),
       grid AS (
         SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
         FROM span
       ),
       j AS (
         SELECT g.user_id, g.day, a.n, a.n IS NULL AS filled
         FROM grid g LEFT JOIN agg a ON g.user_id = a.user_id AND g.day = a.day
       ),
       w AS (
         SELECT *,
                last_value(CASE WHEN NOT filled
                           THEN struct_pack(t := epoch(day), v := n) END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
                first_value(CASE WHEN NOT filled
                            THEN struct_pack(t := epoch(day), v := n) END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY day
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nx
         FROM j
       )
       SELECT user_id, day,
              ROUND(CASE WHEN NOT filled THEN CAST(n AS DOUBLE)
                         ELSE p.v + (nx.v - p.v) * (epoch(day) - p.t) / (nx.t - p.t)
                    END, 6) AS n_interp,
              filled
       FROM w""",
)
def ts_gapfill_linear(spark, sf_dir):
    """Linear-interpolated gap filling (the TimescaleDB interpolate
    shape): gaps take the value on the line between the surrounding
    observations — two mirrored struct-carry windows over one sorted
    exchange (operators/timeseries.py:gapfill how='linear'). Both
    engines compute p.v + (n.v - p.v) * dt ratio in double and round
    to 6, so the match is value-exact."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    agg = e.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    g = timeseries.gapfill(
        agg, keys=["user_id"], bucket_col="day", step="interval 1 day",
        value_cols=["n"], how="linear",
    )
    return g.select("user_id", "day", F.round("n", 6).alias("n_interp"), "filled")


@register_extra(
    "ts_interval_overlap",
    """WITH bands AS (SELECT b AS band_id, b * 5.0 AS a_lo, b * 5.0 + 7.5 AS a_hi
                      FROM range(0, 20) t(b)),
       spans AS (SELECT user_id, MIN(value) AS b_lo, MAX(value) AS b_hi
                 FROM events WHERE user_id < 50 GROUP BY 1)
       SELECT band_id, user_id
       FROM bands JOIN spans ON a_lo < b_hi AND b_lo < a_hi""",
)
def ts_interval_overlap(spark, sf_dir):
    """Interval×interval overlap join executed as a bucketed equi join
    with first-shared-bucket dedup (operators/timeseries.py:
    interval_overlap_join) — never a BNLJ. Oracle: the plain
    inequality join (quadratic, fine at gate SF)."""
    bands = spark.range(0, 20).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 5.0).alias("a_lo"),
        (F.col("id") * 5.0 + 7.5).alias("a_hi"),
    )
    spans = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.min("value").alias("b_lo"), F.max("value").alias("b_hi"))
    )
    out = timeseries.interval_overlap_join(
        bands, spans, "a_lo", "a_hi", "b_lo", "b_hi", bucket_width=10.0
    )
    return out.select("band_id", "user_id")


@register_extra(
    "ts_range_join",
    """WITH bands AS (SELECT b AS band_id, b * 5.0 AS lo, b * 5.0 + 7.5 AS hi
                      FROM range(0, 20) t(b))
       SELECT band_id, COUNT(*) AS n, MIN(value) AS min_value, MAX(value) AS max_value
       FROM events e JOIN bands ON e.value >= lo AND e.value < hi
       GROUP BY band_id""",
)
def ts_range_join(spark, sf_dir):
    """Containment join of events.value against overlapping value
    bands, executed as an EQUI join on interval buckets (ranges explode
    into width-5 buckets; exact containment filtered after) — the plan
    has a shuffle/broadcast HASH join, never a nested-loop over
    points × ranges."""
    bands = spark.createDataFrame(
        [(b, b * 5.0, b * 5.0 + 7.5) for b in range(20)], "band_id long, lo double, hi double"
    )
    j = timeseries.range_join(
        _t(spark, sf_dir, "events").select("event_id", "value"),
        bands,
        "value",
        "lo",
        "hi",
        bucket_width=5.0,
    )
    return j.groupBy("band_id").agg(
        F.count("*").alias("n"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


@register_extra(
    "ts_rollup_hypertable",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, CAST(value AS DECIMAL(18,6)) AS v
                  FROM events)
       SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket_start,
              COUNT(*) AS n, CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total
       FROM e GROUP BY 2
       UNION ALL
       SELECT 'day', date_trunc('day', ts), COUNT(*), CAST(ROUND(SUM(v), 2) AS DOUBLE)
       FROM e GROUP BY 2
       UNION ALL
       SELECT 'week', date_trunc('week', ts), COUNT(*), CAST(ROUND(SUM(v), 2) AS DOUBLE)
       FROM e GROUP BY 2""",
)
def ts_rollup_hypertable(spark, sf_dir):
    """Hour/day/week rollups from ONE scan of the fact table: coarser
    levels re-aggregate the finer level's partials (decimal sums and
    counts compose exactly), matching the oracle's three direct
    aggregations value-for-value."""
    e = _t(spark, sf_dir, "events").select(
        "ts", F.col("value").cast("decimal(18,6)").alias("v")
    )
    out = timeseries.hypertable_rollup(e, "ts", "v", resolutions=("hour", "day", "week"))
    return out.select(
        "resolution",
        "bucket_start",
        "n",
        F.round("total", 2).cast("double").alias("total"),
    )


# --------------------------------------------------------------------------
# store_* — the document-store engine end-to-end: Spark bulk ingest →
# MV index build → planner-routed collection queries (SURVEY.md §3.1)
# --------------------------------------------------------------------------

_STORES: dict[str, object] = {}


def _docs_store(spark, sf_dir):
    """One store per sf_dir/process: documents.parquet bulk-ingested as
    collection ``docs~`` (item_id = zero-padded doc_id so lexicographic
    item order == numeric order), with a text index on lang."""
    store = _STORES.get(sf_dir)
    if store is None:
        import tempfile

        from .store import DocumentStore

        docs = _t(spark, sf_dir, "documents").withColumn(
            "item", F.lpad(F.col("doc_id").cast("string"), 10, "0")
        )
        store = DocumentStore(tempfile.mkdtemp(prefix="hs_store_"), spark=spark)
        store.ingest_collection(docs, "docs~", "item")
        store.create_index("docs~", "by_lang", [SortItem("lang", "text", "asc")], None)
        store.create_index("docs~", "long_docs", [], "n_chars > 300")
        _STORES[sf_dir] = store
    return store


def _items_df(spark, items, cols: str):
    rows = [tuple(i.get(c.split()[0]) for c in cols.split(", ")) for i in items]
    return spark.createDataFrame(rows, cols)


@register(
    "store_analyze_stats",
    """SELECT 'n_chars' AS field_name,
              COUNT(*) AS n_rows,
              COUNT(n_chars) AS n_nonnull,
              COUNT(DISTINCT n_chars) AS ndv,
              CAST(MIN(n_chars) AS DOUBLE) AS min_num,
              CAST(MAX(n_chars) AS DOUBLE) AS max_num
       FROM documents""",
)
def store_analyze_stats(spark, sf_dir):
    """The store's ANALYZE (store/stats.py — the reference's
    «histograms/statistics» future-work item) gated end-to-end: the
    documents corpus is bulk-ingested into the catalog store, ANALYZEd
    through the Spark one-pass stats job over the collection's JSON
    bodies, and the committed field statistics must equal the oracle's
    direct aggregates over the source parquet — proving the
    get_json_object extraction, typing, and commit path value-exact.
    The equi-width/equi-height histograms and explain() row estimates
    ride the same stats rows (pytest-pinned, tests/test_stats.py)."""
    store = _docs_store(spark, sf_dir)
    if "n_chars" not in store.collection_stats("docs~"):
        store.analyze("docs~", [("n_chars", "decimal")])
    st = store.collection_stats("docs~")["n_chars"]
    return spark.createDataFrame(
        [
            (
                "n_chars",
                st.n_rows,
                st.n_nonnull,
                st.ndv,
                float(st.min_num),
                float(st.max_num),
            )
        ],
        "field_name string, n_rows long, n_nonnull long, ndv long, min_num double, max_num double",
    )


@register(
    "store_query_mv_sorted",
    """SELECT doc_id, lang, n_chars FROM documents
       ORDER BY lang, lpad(CAST(doc_id AS VARCHAR), 10, '0') LIMIT 40""",
)
def store_query_mv_sorted(spark, sf_dir):
    """Collection GET sorted by an indexed field: the planner must route
    to the lang MV (index_content_ta0) and order by its clustering key."""
    store = _docs_store(spark, sf_dir)
    res = store.query("docs~", sort=[SortBy("lang")], size=40)
    # plan routing (index_id == "by_lang") is asserted in tests/test_catalog_store.py;
    # the driver-facing body stays assertion-free.
    return _items_df(spark, res.items, "doc_id long, lang string, n_chars long")


@register(
    "store_query_filter_implication",
    """SELECT doc_id, lang, n_chars FROM documents
       WHERE n_chars > 400
       ORDER BY lpad(CAST(doc_id AS VARCHAR), 10, '0') LIMIT 40""",
)
def store_query_filter_implication(spark, sf_dir):
    """Query filter narrower than the MV filter (n_chars>400 ⊂
    n_chars>300, range widening in the AST comparator): implication
    routes to the filtered MV, the residual re-filter drops the
    300..400 rows."""
    store = _docs_store(spark, sf_dir)
    res = store.query("docs~", filter="n_chars > 400", sort=[SortBy("id")], size=40)
    # plan routing (index_id == "long_docs") is asserted in tests/test_catalog_store.py.
    return _items_df(spark, res.items, "doc_id long, lang string, n_chars long")


@register(
    "store_query_paged_keyset",
    """SELECT doc_id, lang FROM documents
       WHERE lang = 'zh'
       ORDER BY lpad(CAST(doc_id AS VARCHAR), 10, '0') LIMIT 15""",
)
def store_query_paged_keyset(spark, sf_dir):
    """The REST fetch loop end-to-end: residual filter (lang='zh' is not
    sargable on the base table) + keyset resume filters across multiple
    bounded storage selects."""
    store = _docs_store(spark, sf_dir)
    res = store.query_paged("docs~", filter='lang = "zh"', size=15)
    # the multi-select fetch-loop shape (len(res.selects) >= 1) is asserted
    # in tests/test_catalog_store.py.
    return _items_df(spark, res.items, "doc_id long, lang string")


@register_extra(
    "emb_pca_contract",
    """SELECT COUNT(*) AS n_rows, 16 AS k,
              true AS dims_ok, true AS var_nonneg_nonincreasing,
              true AS var_sum_le_1, true AS axes_orthonormal
       FROM embeddings""",
)
def emb_pca_contract(spark, sf_dir):
    """PCA dimensionality reduction with an honest gate (the
    q_approx_distinct_contract pattern): project the 64-dim embeddings
    to 16 components and verify, in one row, the properties the
    operator is sold on — every input row projected, output dimension
    exactly k, explained-variance spectrum non-negative and
    non-increasing with total ≤ 1, and the loading axes orthonormal
    (Gram matrix == I within 1e-6; k×d is driver-tiny by design, the
    corpus-sized work all happened executor-side in the fit)."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    k = 16
    proj, model = similarity.pca_project(emb, k=k, with_model=True)
    ev = np.asarray(model.explainedVariance)
    pc = model.pc.toArray()  # d×k loading matrix
    gram_err = float(np.abs(pc.T @ pc - np.eye(k)).max())
    agg = proj.agg(
        F.count("*").alias("n_rows"),
        F.min(F.size("components")).alias("min_d"),
        F.max(F.size("components")).alias("max_d"),
    )
    return agg.select(
        "n_rows",
        F.lit(k).alias("k"),
        ((F.col("min_d") == k) & (F.col("max_d") == k)).alias("dims_ok"),
        F.lit(bool(np.all(ev >= 0) and np.all(np.diff(ev) <= 1e-12))).alias(
            "var_nonneg_nonincreasing"
        ),
        F.lit(bool(ev.sum() <= 1.0 + 1e-9)).alias("var_sum_le_1"),
        F.lit(bool(gram_err <= 1e-6)).alias("axes_orthonormal"),
    )


@register_extra(
    "text_tfidf_topk",
    r"""WITH toks AS (
         SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
       ), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2 GROUP BY 1, 2),
       dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM toks2),
       scored AS (
         SELECT tf.doc_id, tf.term,
                tf.tf * (ln((n.n_docs + 1.0) / (dft.df + 1.0)) + 1.0) AS s
         FROM tf JOIN dft USING (term) CROSS JOIN n
       )
       SELECT doc_id, term, rank, ROUND(s, 6) AS tfidf FROM (
         SELECT doc_id, term, s,
                ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, term) AS rank
         FROM scored
       ) WHERE rank <= 3""",
)
def text_tfidf_topk(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (smooth idf), the classic
    keyword-extraction / relevance-weighting primitive — full formula
    replayed in the SQL oracle (the search_bm25_topk precedent for
    ln()-bearing cross-engine doubles)."""
    return text.tfidf_topk(_t(spark, sf_dir, "documents"), k=3)


@register_extra(
    "emb_kmeans_contract",
    """SELECT COUNT(*) AS n_rows, true AS clusters_within_k,
              true AS all_nearest_centroid, true AS nonempty_majority
       FROM embeddings""",
)
def emb_kmeans_contract(spark, sf_dir):
    """KMeans clustering with an assignment-soundness gate: every
    vector must be assigned to its NEAREST model centroid (squared
    L2 recomputed in-plan against all k broadcast-literal centroids,
    1e-9 tolerance), cluster ids within [0, k), and a majority of
    cells non-empty (k=10 over 10 synthetic label clusters). The
    corpus-sized work (Lloyd passes, assignment) is executor-side;
    only the k×d centroid matrix touches the driver."""
    import numpy as np

    emb = _t(spark, sf_dir, "embeddings")
    k = 10
    assigned, model = similarity.kmeans_clusters(emb, k=k, seed=7, with_model=True)
    centers = [np.asarray(c, dtype=float) for c in model.clusterCenters()]

    def sqdist(c):
        arr = F.array(*[F.lit(float(x)) for x in c])
        return F.aggregate(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                arr,
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dists = F.array(*[sqdist(c) for c in centers])
    joined = assigned.join(emb.select("vec_id", "embedding"), "vec_id").select(
        "vec_id",
        "cluster",
        (F.element_at(dists, F.col("cluster") + 1) <= F.array_min(dists) + F.lit(1e-9)).alias(
            "is_nearest"
        ),
    )
    agg = joined.agg(
        F.count("*").alias("n_rows"),
        F.min("is_nearest").alias("all_nearest_centroid"),
        ((F.min("cluster") >= 0) & (F.max("cluster") < k)).alias("clusters_within_k"),
        (F.count_distinct("cluster") > k / 2).alias("nonempty_majority"),
    )
    return agg.select(
        "n_rows", "clusters_within_k", "all_nearest_centroid", "nonempty_majority"
    )


@register_extra(
    "emb_semantic_dedup_contract",
    """SELECT COUNT(*) AS n_rows, true AS removal_sound, true AS keep_sound,
              true AS cos_agree, true AS some_removed
       FROM embeddings""",
)
def emb_semantic_dedup_contract(spark, sf_dir):
    """SemDeDup (dedup.semantic_dedup) with an independently-verified
    decision audit: the operator prunes via per-cluster numpy gram
    blocks inside applyInPandas; the contract RECOMPUTES every
    vector's max-cosine-to-earlier-same-cluster-vector through a
    completely different path (a JVM expression equi-join on the
    cluster id + zip_with/aggregate dot products) and asserts
    (a) every removed vector really has a prior neighbor ≥ τ,
    (b) every kept vector really has none, (c) the operator's
    reported max_prior_cos agrees with the recomputation to 1e-9,
    (d) the corpus actually contains removals at τ=0.4 (measured:
    ~6-15% across the gate SFs). n_rows doubles as the partition-
    completeness check: every input vector must be classified.
    k-means assignments are not SQL-replayable, so this is a
    contract entry (the emb_kmeans_contract precedent)."""
    from .operators.similarity import _dot, _norm

    tau = 0.4
    emb = _t(spark, sf_dir, "embeddings")
    res = dedup.semantic_dedup(emb, k=10, tau=tau, seed=7)
    withv = res.join(emb.select("vec_id", "embedding"), "vec_id")
    a = withv.select(
        F.col("vec_id").alias("a_id"),
        F.col("cluster").alias("a_cl"),
        F.col("embedding").alias("av"),
        _norm(F.col("embedding")).alias("an"),
    )
    b = withv.select(
        F.col("vec_id").alias("b_id"),
        F.col("cluster").alias("b_cl"),
        F.col("embedding").alias("bv"),
        _norm(F.col("embedding")).alias("bn"),
    )
    cos = _dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    prior = (
        a.join(b, (F.col("a_cl") == F.col("b_cl")) & (F.col("a_id") < F.col("b_id")))
        .select(F.col("b_id").alias("vec_id"), cos.alias("c"))
        .groupBy("vec_id")
        .agg(F.max("c").alias("chk"))
    )
    checked = res.join(prior, "vec_id", "left").select(
        "kept",
        "max_prior_cos",
        F.coalesce(F.col("chk"), F.lit(-1.0)).alias("chk"),
    )
    return checked.agg(
        F.count("*").alias("n_rows"),
        F.min(
            F.when(~F.col("kept"), F.col("chk") >= tau).otherwise(F.lit(True))
        ).alias("removal_sound"),
        F.min(
            F.when(F.col("kept"), F.col("chk") < tau).otherwise(F.lit(True))
        ).alias("keep_sound"),
        F.min(F.abs(F.col("chk") - F.col("max_prior_cos")) < 1e-9).alias("cos_agree"),
        (F.sum((~F.col("kept")).cast("int")) > 0).alias("some_removed"),
    )


@register(
    "store_time_travel",
    """SELECT doc_id, lang, n_chars FROM documents
       WHERE lang = 'de' AND doc_id < 200""",
)
def store_time_travel(spark, sf_dir):
    """Snapshot isolation across history, gated end-to-end: ingest a
    deterministic slice as a collection, pin the manifest version, then
    MUTATE the collection (overwrite one item, delete another, insert a
    new one) — and prove the time-travel read still returns exactly the
    pre-mutation state the DuckDB oracle computes from the raw parquet.
    Exercises ingest → snapshot → at_version → collection query on the
    frozen file list."""
    import tempfile

    from .store import DocumentStore

    docs = (
        _t(spark, sf_dir, "documents")
        .filter((F.col("lang") == "de") & (F.col("doc_id") < 200))
        .withColumn("item", F.lpad(F.col("doc_id").cast("string"), 10, "0"))
    )
    store = DocumentStore(tempfile.mkdtemp(prefix="hs_tt_"), spark=spark)
    store.ingest_collection(docs, "tt~", "item")
    pinned = store.storage._read_manifest()["version"]
    first_two = [i["id"] for i in store.query("tt~", size=2).items]
    store.put(f"tt~/{first_two[0]}", {"doc_id": -1, "lang": "xx", "n_chars": 0})
    store.delete(f"tt~/{first_two[1]}")
    store.put("tt~/zzz-new", {"doc_id": 999999, "lang": "zz", "n_chars": 1})
    res = store.at_version(pinned).query("tt~", size=100000)
    rows = [(i["doc_id"], i["lang"], i["n_chars"]) for i in res.items]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


@register_extra(
    "q_stream_sliding_counts",
    """WITH ev AS (
         SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                CAST(value AS DECIMAL(18,6)) AS v
         FROM events
       ),
       expanded AS (
         SELECT CAST(date_trunc('day', ts) - INTERVAL (k) DAY AS TIMESTAMP) AS window_start,
                event_type, v
         FROM ev, unnest([0, 1]) AS t(k)
       )
       SELECT window_start, event_type, COUNT(*) AS n,
              CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total_value
       FROM expanded GROUP BY 1, 2""",
)
def q_stream_sliding_counts(spark, sf_dir):
    """SLIDING event-time windows through a real readStream replay —
    the third member of the streaming-windows family (tumbling and
    session are driver-gated): 2-day windows sliding 1 day, so every
    event lands in exactly two windows. The oracle expands the same
    two-window assignment explicitly (date_trunc minus 0/1 days) and
    must match the streamed aggregation bit-for-bit (DECIMAL sums).
    Memoized per (session, sf_dir) like the tumbling entry."""
    key = f"slide::{sf_dir}"
    df = _STREAM_WINDOW_RESULTS.get(key)
    if df is None:
        from .streaming.windows import windowed_event_counts

        _, stream = _events_stream(spark, sf_dir, prefix="hs_stream_slide_")
        stream = stream.withColumn("value", F.col("value").cast("decimal(18,6)"))
        agg = windowed_event_counts(stream, window="2 days", watermark="2 hours", slide="1 day")
        df = _run_to_memory(spark, agg, f"stream_slide_{abs(hash(sf_dir))}", "complete")
        _STREAM_WINDOW_RESULTS[key] = df
    return df.select(
        "window_start",
        "event_type",
        "n",
        F.round("total_value", 2).cast("double").alias("total_value"),
    )


@register_extra(
    "text_chunk_documents",
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS t
         FROM documents
       ),
       starts AS (
         SELECT doc_id, t, unnest(generate_series(1, greatest(len(t), 1), 24)) AS s
         FROM toks WHERE len(t) > 0
       ),
       chunks AS (
         SELECT doc_id,
                CAST((s - 1) / 24 AS INT) AS chunk_id,
                t[s : least(s + 31, len(t))] AS ct
         FROM starts
       )
       SELECT doc_id, chunk_id,
              len(ct) AS n_chunk_tokens,
              array_to_string(ct, ' ') AS chunk_text
       FROM chunks
       WHERE chunk_id = 0 OR len(ct) > 8""",
)
def text_chunk_documents(spark, sf_dir):
    """Overlapping token-window chunking (32-token windows, 8-token
    overlap, stride 24 — sized so the fixture's 10-99-token documents
    produce MULTI-chunk output and trailing-window drops; production
    sizes like 512/64 are parameters) — the context-window preparation
    step for RAG indexes and fixed-length training samples. Trailing
    windows wholly contained in the previous chunk are dropped; the
    oracle replays the identical slicing arithmetic in SQL."""
    return text.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@register_extra(
    "dedup_embedding_incremental",
    """WITH pairs AS (
         SELECT a.vec_id AS a_id, b.vec_id AS b_id
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) >= 0.45
           AND (a.vec_id % 10 = 7 OR b.vec_id % 10 = 7)
       )
       SELECT COUNT(*) AS n_exact_pairs,
              true AS precision_exact,
              true AS recall_ok
       FROM pairs""",
)
def dedup_embedding_incremental(spark, sf_dir):
    """Incremental embedding near-dup (10%% batch vs the persisted
    hyperplane-signature index), driven through the
    dedup_embedding_lsh contract style: every emitted pair must sit in
    the exact batch-involving pair set with the identical rounded
    cosine (precision_exact — the verify computes true cosines), and
    recall ≥ 0.9 of that exact set (measured 3/3 at sf0.01, 27/28 at
    sf0.1). The quadratic exact twin appears only as this gate row's
    in-plan verifier."""
    emb = _t(spark, sf_dir, "embeddings")
    batch = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) == 7)
    corpus = emb.filter(F.pmod(F.col("vec_id"), F.lit(10)) != 7)
    index = dedup.embedding_signature_index(corpus)
    found = dedup.incremental_embedding_pairs(
        batch, corpus, threshold=0.45, corpus_index=index
    )
    exact = dedup.embedding_cosine_pairs(emb, threshold=0.45).filter(
        (F.pmod(F.col("a_id"), F.lit(10)) == 7) | (F.pmod(F.col("b_id"), F.lit(10)) == 7)
    )
    n_found = found.agg(F.count("*").alias("n_found"))
    n_true = found.join(exact, ["a_id", "b_id", "cosine"], "left_semi").agg(
        F.count("*").alias("n_true")
    )
    n_exact = exact.agg(F.count("*").alias("n_exact_pairs"))
    return (
        n_exact.crossJoin(n_found)
        .crossJoin(n_true)
        .select(
            "n_exact_pairs",
            (F.col("n_true") == F.col("n_found")).alias("precision_exact"),
            (F.col("n_true") * 10 >= F.col("n_exact_pairs") * 9).alias("recall_ok"),
        )
    )


@register(
    "dedup_minhash_incremental",
    """WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
idx AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3
),
sh AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id, ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 6) AS jaccard
FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.5
  AND (a_id % 10 = 7 OR b_id % 10 = 7)""",
)
def dedup_minhash_incremental(spark, sf_dir):
    """The incremental near-dup path: a 10%% "daily batch" (doc_id %% 10
    == 7) checked against the other 90%% through the persisted band
    index — batch×corpus and batch×batch candidates, exact-Jaccard
    verify over candidate documents only. Oracle = the UNCAPPED exact
    Jaccard set restricted to pairs involving the batch (same gate
    style as dedup_minhash_lsh: any banding miss or verify drift fails
    the row)."""
    docs = _t(spark, sf_dir, "documents")
    batch = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) == 7)
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(10)) != 7)
    index = dedup.minhash_band_index(corpus)
    return dedup.incremental_minhash_pairs(
        batch, corpus, threshold=0.5, corpus_index=index
    ).orderBy("a_id", "b_id")


@register(
    "q_token_budget_select",
    """WITH w AS (
         SELECT doc_id, n_chars,
                CAST(SUM(n_chars) OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS cum_chars
         FROM documents
       )
       SELECT doc_id, n_chars, cum_chars FROM w WHERE cum_chars <= 60000""",
)
def q_token_budget_select(spark, sf_dir):
    """Budget-bounded corpus curation: take the largest documents
    first until a 60k-char training budget fills (binding at both SFs) — an exact GLOBAL
    running total computed as a two-level distributed prefix sum
    (range partition → per-partition totals → offset + LOCAL windows),
    never the single-task Window.orderBy cumsum the naive form needs.
    The oracle runs exactly that naive global window; values must
    match row for row."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return sampling.budget_select(
        docs,
        "n_chars",
        60000,
        [F.col("n_chars").desc(), F.col("doc_id")],
        cum_col="cum_chars",
    ).select("doc_id", "n_chars", "cum_chars")


@register_extra(
    "q_countmin_heavy_hitters",
    """SELECT value, n_exact, true AS overestimates, true AS within_eps_n
       FROM (
         SELECT user_id AS value, COUNT(*) AS n_exact
         FROM events GROUP BY user_id
         ORDER BY n_exact DESC, value LIMIT 20
       )""",
)
def q_countmin_heavy_hitters(spark, sf_dir):
    """Count-Min frequency sketch with its certificate (the sketch
    family's third member after HLL++ and percentile_approx): the
    events table's top-20 users by event count, each row carrying the
    sketch's one-sided guarantee (estimate ≥ exact) and the
    eps×N error bound — both computed against the exact counts at gate
    SF. The cms_estimate column itself is engine-specific (hash-seeded)
    and stays out of the compared projection."""
    e = _t(spark, sf_dir, "events")
    from .operators.sketches import heavy_hitters_cms

    return heavy_hitters_cms(e, "user_id", k=20).select(
        "value", "n_exact", "overestimates", "within_eps_n"
    )


@register(
    "store_bulk_merge",
    """SELECT doc_id,
              CASE WHEN doc_id >= 150 THEN n_chars + 1000
                   ELSE n_chars END AS n_chars_eff
       FROM documents WHERE doc_id < 300""",
)
def store_bulk_merge(spark, sf_dir):
    """Bulk merge gated end-to-end: ingest doc_id<250 as a collection,
    merge a batch covering [150, 300) with a +1000 marker on n_chars
    (so 150-249 are REPLACED, 250-299 INSERTED, <150 untouched), and
    read the collection back — the result must equal the oracle's
    CASE over the raw parquet. Exercises ingest → merge (shared
    revision bump, one flip, executor-written sorted bucket) → typed
    collection read."""
    import tempfile

    from .store import DocumentStore

    docs = _t(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") < 250).withColumn(
        "item", F.lpad(F.col("doc_id").cast("string"), 10, "0")
    )
    store = DocumentStore(tempfile.mkdtemp(prefix="hs_merge_"), spark=spark)
    store.ingest_collection(base.select("doc_id", "n_chars", "item"), "bm~", "item")
    batch = (
        docs.filter((F.col("doc_id") >= 150) & (F.col("doc_id") < 300))
        .withColumn("item", F.lpad(F.col("doc_id").cast("string"), 10, "0"))
        .select("doc_id", (F.col("n_chars") + 1000).alias("n_chars"), "item")
    )
    store.merge_collection(batch, "bm~", "item")
    return store.collection_df("bm~", "doc_id long, n_chars long, id string").select(
        "doc_id", F.col("n_chars").alias("n_chars_eff")
    )


@register(
    "store_collection_join",
    """SELECT c.c_mktsegment AS segment,
              COUNT(*) AS n_orders,
              CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                  AS total_price
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_custkey < 500
       GROUP BY 1""",
)
def store_collection_join(spark, sf_dir):
    """Analytics ACROSS live collections: ingest customers and orders
    as two document collections, then JOIN their typed Spark views
    (collection_df) and aggregate — the "query your operational store
    like a warehouse" path no single-collection entry exercises. Must
    equal the plain-SQL join over the raw parquet: the JSON body
    round-trip (ingest serializes rows, the view parses them against
    an explicit schema) may not corrupt keys or DECIMAL money. The
    collection reads are ordinary parquet scans, so Catalyst plans the
    join like any other (broadcast the small side at scale); the
    c_custkey < 500 cut keeps the gate-SF ingest cost bounded."""
    import tempfile

    from .store import DocumentStore

    store = DocumentStore(tempfile.mkdtemp(prefix="hs_join_"), spark=spark)
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") < 500)
        .withColumn("item", F.lpad(F.col("c_custkey").cast("string"), 10, "0"))
    )
    store.ingest_collection(
        cust.select("c_custkey", "c_mktsegment", "item"), "customers~", "item"
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 500)
        .withColumn("item", F.lpad(F.col("o_orderkey").cast("string"), 10, "0"))
    )
    store.ingest_collection(
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "item"),
        "orders~",
        "item",
    )
    c = store.collection_df("customers~", "c_custkey long, c_mktsegment string")
    o = store.collection_df("orders~", "o_custkey long, o_totalprice decimal(18,2)")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("total_price"),
        )
    )


@register(
    "q_bloom_prejoin",
    """SELECT o.o_orderpriority AS priority,
              COUNT(*) AS n_orders,
              CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                  AS total_price
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY 1""",
)
def q_bloom_prejoin(spark, sf_dir):
    """Runtime bloom-filter join pruning (operators/bloomjoin.py): the
    fact side is pre-filtered by an 8 KiB membership sketch of the
    dim's key set BEFORE the join, so at scale the join exchange moves
    only (matches + <1% false positives) of the fact instead of all of
    it — the pattern for a dim too big to broadcast whose keyset still
    fits a bloom. The real join then removes the false positives, so
    the result must be bit-identical to the oracle's plain join; the
    bloom build is one sketch-sized aggregation (map-side bit_or
    partials), and the probe is pure codegen'd bit math."""
    from .operators import bloomjoin

    dim = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    fact = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    )
    joined = bloomjoin.bloom_prejoin(fact, "o_custkey", dim, "c_custkey")
    return joined.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("price"), 2).cast("double").alias("total_price"),
    )


@register_extra(
    "mv_incremental_rollup",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                         CAST(value AS DECIMAL(18,6)) AS v
                  FROM events)
       SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
              COUNT(v) AS n,
              CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total,
              CAST(ROUND(MIN(v), 4) AS DOUBLE) AS vmin,
              CAST(ROUND(MAX(v), 4) AS DOUBLE) AS vmax,
              CAST((CAST(SUM(v) * 1000000 AS HUGEINT) * 20000
                    + COUNT(v) * 1000000)
                   // (COUNT(v) * 2000000) AS DOUBLE) / 10000.0
                  AS avg_value
       FROM e GROUP BY 1, 2""",
)
def mv_incremental_rollup(spark, sf_dir):
    """Continuous-aggregate maintenance (operators/rollup_mv.py): an
    existing per-(event_type, day) rollup built from events BEFORE
    2024-01-21 is refreshed with the later rows as a DELTA — delta-
    scan partials, broadcast bucket-list split of the MV into
    touched/untouched, re-aggregation of ONLY the touched slice. The
    merged result must equal the oracle's direct aggregation over ALL
    events (merge(partials(A), partials(B)) ≡ partials(A ∪ B)); at
    100 TB the refresh cost is delta + touched buckets, never a
    rescan of the full MV. avg_value is rounded by EXACT integer
    half-up (floor((2·sum·10¹⁰ + n·10⁶)/(2n·10⁶)) on the decimal
    sum's integer micros) instead of ROUND on the double quotient:
    power-of-two bucket counts make the quotient TERMINATE, so
    4-decimal half boundaries (307.03/8 = 38.37875 at sf0.001) are
    systematic, and Spark (shortest-decimal) vs DuckDB (binary)
    round them apart. Positive domain: Spark `div` truncates,
    DuckDB `//` floors — identical only because value ≥ 0."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    cutoff = F.lit("2024-01-21").cast("timestamp")
    base = rollup_mv.rollup_partials(e.filter(F.col("ts") < cutoff), "ts", ["event_type"], "v")
    delta = rollup_mv.rollup_partials(e.filter(F.col("ts") >= cutoff), "ts", ["event_type"], "v")
    mv = rollup_mv.rollup_finalize(rollup_mv.rollup_merge(base, delta, ["event_type"]))
    avg4 = F.expr(
        "(CAST(total * 1000000 AS DECIMAL(38,0)) * 20000"
        " + CAST(n AS DECIMAL(38,0)) * 1000000)"
        " div (CAST(n AS DECIMAL(38,0)) * 2000000)"
    )
    return mv.select(
        "event_type",
        "bucket_start",
        "n",
        F.round("total", 2).cast("double").alias("total"),
        F.round("vmin", 4).cast("double").alias("vmin"),
        F.round("vmax", 4).cast("double").alias("vmax"),
        (avg4.cast("double") / F.lit(10_000.0)).alias("avg_value"),
    )


@register_extra(
    "mv_rollup_distinct_contract",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type, user_id FROM events)
       SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
              COUNT(DISTINCT user_id) AS n_exact,
              true AS within_5pct, true AS merge_consistent
       FROM e GROUP BY 1, 2""",
)
def mv_rollup_distinct_contract(spark, sf_dir):
    """Count-distinct inside the incremental rollup: COUNT(DISTINCT)
    is the aggregate that does NOT decompose into additive partials,
    so the MV stores an HLL sketch per bucket (rollup_mv
    distinct_col) and merges refreshes by register-max union. Two
    contracts, both computed in-plan per (event_type, day) bucket:
    the base+delta MERGED sketch estimate must (a) land within 5% of
    the exact distinct count and (b) EQUAL the single-pass sketch's
    estimate — union(sketch(A), sketch(B)) ≡ sketch(A ∪ B), the
    mergeability the MV depends on. At 100 TB the sketch is a few
    KiB per bucket vs re-shuffling every (bucket, user) pair on
    every refresh."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", "user_id", F.col("value").cast("decimal(18,6)").alias("v")
    )
    cutoff = F.lit("2024-01-21").cast("timestamp")
    base = rollup_mv.rollup_partials(
        e.filter(F.col("ts") < cutoff), "ts", ["event_type"], "v", distinct_col="user_id"
    )
    delta = rollup_mv.rollup_partials(
        e.filter(F.col("ts") >= cutoff), "ts", ["event_type"], "v", distinct_col="user_id"
    )
    merged = rollup_mv.rollup_finalize(
        rollup_mv.rollup_merge(base, delta, ["event_type"])
    ).select("event_type", "bucket_start", F.col("n_distinct").alias("n_merged"))
    direct = rollup_mv.rollup_finalize(
        rollup_mv.rollup_partials(e, "ts", ["event_type"], "v", distinct_col="user_id")
    ).select("event_type", "bucket_start", F.col("n_distinct").alias("n_direct"))
    exact = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).agg(F.count_distinct("user_id").alias("n_exact"))
    grain = ["event_type", "bucket_start"]
    return (
        exact.join(merged, on=grain)
        .join(direct, on=grain)
        .select(
            *grain,
            "n_exact",
            (F.abs(F.col("n_merged") - F.col("n_exact")) * 100 <= F.col("n_exact") * 5).alias(
                "within_5pct"
            ),
            (F.col("n_merged") == F.col("n_direct")).alias("merge_consistent"),
        )
    )


@register_extra(
    "q_weighted_sample",
    """WITH keyed AS (
         SELECT doc_id, lang, n_chars,
                ROUND(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT::DOUBLE + 0.5)
                          / 4503599627370496.0) / n_chars, 12) AS k
         FROM documents WHERE n_chars > 0
       )
       SELECT doc_id, lang, n_chars FROM keyed ORDER BY k, doc_id LIMIT 100""",
)
def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted sampling without replacement
    (operators/sampling.py:weighted_sample): 100 documents with
    inclusion probability ∝ n_chars via the Efraimidis–Spirakis
    exponential race — key = -ln(md5_uniform(id))/weight, k earliest
    arrivals win. The draw is a pure content hash both engines
    share, so the oracle replays the EXACT kept set, not a
    statistical bound. Plan is TakeOrdered (per-partition top-k
    heaps, k rows to the driver) — no global sort at any scale."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_sample(docs, "n_chars", 100)


@register_extra(
    "mv_rollup_ohlc",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                         CAST(value AS DECIMAL(18,6)) AS v
                  FROM events)
       SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
              CAST(ROUND((MIN(struct_pack(t := ts, v := v))).v, 4) AS DOUBLE) AS open,
              CAST(ROUND(MAX(v), 4) AS DOUBLE) AS high,
              CAST(ROUND(MIN(v), 4) AS DOUBLE) AS low,
              CAST(ROUND((MAX(struct_pack(t := ts, v := v))).v, 4) AS DOUBLE) AS close
       FROM e GROUP BY 1, 2""",
)
def mv_rollup_ohlc(spark, sf_dir):
    """OHLC candles from the incremental rollup (rollup_mv ohlc=True):
    open/close are min/max over struct(ts, value) — first/last-by-time
    partials that stay MERGEABLE (a struct min/max composes across
    refreshes exactly like a plain min/max, with a deterministic value
    tiebreak on equal timestamps that both engines share), where a
    naive FIRST()/LAST() aggregate would be order-dependent and
    unmergeable. Base/delta split at 2024-01-21 as in the other MV
    entries; the merged candle must equal the oracle's direct
    per-bucket aggregation over all events."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    cutoff = F.lit("2024-01-21").cast("timestamp")
    base = rollup_mv.rollup_partials(
        e.filter(F.col("ts") < cutoff), "ts", ["event_type"], "v", ohlc=True
    )
    delta = rollup_mv.rollup_partials(
        e.filter(F.col("ts") >= cutoff), "ts", ["event_type"], "v", ohlc=True
    )
    mv = rollup_mv.rollup_finalize(rollup_mv.rollup_merge(base, delta, ["event_type"]))
    return mv.select(
        "event_type",
        "bucket_start",
        F.round("open", 4).cast("double").alias("open"),
        F.round("vmax", 4).cast("double").alias("high"),
        F.round("vmin", 4).cast("double").alias("low"),
        F.round("close", 4).cast("double").alias("close"),
    )


@register_extra(
    "q_weighted_sample_per_group",
    """WITH keyed AS (
         SELECT doc_id, lang, n_chars,
                ROW_NUMBER() OVER (
                  PARTITION BY lang
                  ORDER BY ROUND(-ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::UBIGINT::DOUBLE + 0.5)
                                     / 4503599627370496.0) / n_chars, 12),
                           doc_id) AS rn
         FROM documents WHERE n_chars > 0
       )
       SELECT doc_id, lang, n_chars FROM keyed WHERE rn <= 20""",
)
def q_weighted_sample_per_group(spark, sf_dir):
    """Stratified weighted sampling
    (operators/sampling.py:weighted_sample_per_group): 20 documents
    PER LANGUAGE with inclusion probability ∝ n_chars — the same
    deterministic exponential race as q_weighted_sample, ranked by a
    per-group window instead of a global top-k, so the oracle again
    replays the exact kept set. One hash-partitioned sort per group;
    per-group state is bounded by k."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return sampling.weighted_sample_per_group(docs, "lang", "n_chars", 20)


@register(
    "q_stream_interval_join",
    """WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type
                  FROM events),
       c AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'click'),
       v AS (SELECT user_id, ts, event_id FROM e WHERE event_type = 'view')
       SELECT c.user_id, c.ts, c.event_id,
              v.ts AS ts_r, v.event_id AS event_id_r
       FROM c JOIN v ON c.user_id = v.user_id
                     AND v.ts >= c.ts - INTERVAL 10 MINUTE
                     AND v.ts <= c.ts""",
)
def q_stream_interval_join(spark, sf_dir):
    """Stream-to-stream interval join (streaming/joins.py): clicks and
    views replayed as TWO live readStream sources, equi-joined on
    user_id where the view happened within the 10 minutes before the
    click — watermarks on both sides plus the event-time bound keep
    the join state evictable (bounded by keys × interval, not stream
    history). Inner matches emit as soon as both rows arrive, so the
    drained stream must equal the oracle's batch interval join
    row-for-row. Replayed once per (session, sf_dir) and memoized."""
    key = f"ij:{sf_dir}"
    df = _STREAM_WINDOW_RESULTS.get(key)
    if df is None:
        import os
        import tempfile

        from .streaming.joins import stream_interval_join

        _, stream = _events_stream(spark, sf_dir, prefix="hs_stream_ij_")
        clicks = stream.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        views = stream.filter(F.col("event_type") == "view").select(
            "user_id", "ts", "event_id"
        )
        out = stream_interval_join(
            clicks, views, keys=["user_id"], lower="10 minutes", upper="0 seconds"
        )
        df = _run_to_memory(spark, out, f"stream_ij_{abs(hash(sf_dir))}", "append")
        _STREAM_WINDOW_RESULTS[key] = df
    return df.select("user_id", "ts", "event_id", "ts_r", "event_id_r")


@register_extra(
    "mv_rollup_coarsen",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                         CAST(value AS DECIMAL(18,6)) AS v
                  FROM events)
       SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS bucket_start,
              COUNT(v) AS n,
              CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total
       FROM e GROUP BY 1, 2""",
)
def mv_rollup_coarsen(spark, sf_dir):
    """Coarser resolutions served FROM the incremental MV
    (rollup_mv.rollup_coarsen): the maintained day-grain partials are
    re-aggregated to week grain — partials compose exactly, so the
    answer equals the oracle's direct week aggregation while the
    query scans only the MV (bucket-count-sized), never the fact
    table. The MV itself is built through the same base/delta refresh
    as mv_incremental_rollup, so this also re-proves
    coarsen(merge(A,B)) ≡ direct weekly over A ∪ B."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    cutoff = F.lit("2024-01-21").cast("timestamp")
    base = rollup_mv.rollup_partials(e.filter(F.col("ts") < cutoff), "ts", ["event_type"], "v")
    delta = rollup_mv.rollup_partials(e.filter(F.col("ts") >= cutoff), "ts", ["event_type"], "v")
    daily = rollup_mv.rollup_merge(base, delta, ["event_type"])
    weekly = rollup_mv.rollup_coarsen(daily, ["event_type"], "week")
    return weekly.select(
        "event_type",
        "bucket_start",
        "n",
        F.round("total", 2).cast("double").alias("total"),
    )


# The char-trigram LM replayed in SQL — ends in doc_scores with the
# UNROUNDED per-doc mean log-prob (bit-identical cross-engine: decimal
# gram sums, IEEE division), shared by text_lm_perplexity and
# text_ppl_buckets so the score arithmetic cannot drift between them
# (the _DSIR_CTES discipline).
_CHAR_LM_CTES = """grams AS (
  SELECT d.doc_id, substr(d.text, CAST(i AS INT), 3) AS g
  FROM documents d,
       UNNEST(range(1, greatest(length(d.text) - 1, 1))) AS t(i)
),
tot AS (SELECT COUNT(*) AS total FROM grams),
model AS (
  SELECT g, COUNT(*) AS cnt FROM grams GROUP BY g
  ORDER BY cnt DESC, g LIMIT 50000
),
scored AS (
  SELECT gr.doc_id,
         CAST(ln(COALESCE(m.cnt, 0.5) / t.total) AS DECIMAL(20,10)) AS lp
  FROM grams gr LEFT JOIN model m USING (g), tot t
),
doc_scores AS (
  SELECT doc_id, COUNT(*) AS n_grams,
         CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS lm_score
  FROM scored GROUP BY doc_id
)"""


@register(
    "text_lm_perplexity",
    "WITH "
    + _CHAR_LM_CTES
    + """
       SELECT doc_id, n_grams,
              CAST(ROUND(lm_score, 6) AS DOUBLE) AS lm_score
       FROM doc_scores""",
)
def text_lm_perplexity(spark, sf_dir):
    """Character-trigram LM quality score (operators/text.py
    char_lm_score): the CCNet/KenLM-style perplexity proxy — train a
    unigram-over-trigrams model on the corpus, score each document by
    mean trigram log-probability (unseen grams floored at 0.5/total).
    The oracle replays the ENTIRE formula — gram extraction, top-50k
    Zipf-capped model with deterministic tie-break, backoff, and the
    decimal-exact per-doc sum — so the score matches to 6 decimals,
    not just directionally. Scale shape: per-row HOF gram extraction,
    one bounded (top-k) count table broadcast into the scoring join,
    per-gram log-probs cast to DECIMAL before summing so the mean is
    partition-order-independent."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = text.char_lm_score(docs, n=3, top_k=50_000)
    return out.select(
        "doc_id",
        "n_grams",
        F.round("lm_score", 6).cast("double").alias("lm_score"),
    )


@register_extra(
    "text_ppl_buckets",
    "WITH "
    + _CHAR_LM_CTES
    + """,
lab AS (
  SELECT d.lang, ds.lm_score,
         NTILE(3) OVER (PARTITION BY d.lang
                        ORDER BY ds.lm_score DESC, ds.doc_id) AS nt
  FROM doc_scores ds JOIN documents d USING (doc_id)
)
SELECT lang, nt AS bucket,
       CASE nt WHEN 1 THEN 'head' WHEN 3 THEN 'tail' ELSE 'middle' END
           AS bucket_label,
       COUNT(*) AS n_docs,
       CAST(ROUND(MIN(lm_score), 6) AS DOUBLE) AS min_score,
       CAST(ROUND(MAX(lm_score), 6) AS DOUBLE) AS max_score
FROM lab GROUP BY lang, nt ORDER BY lang, nt""",
)
def text_ppl_buckets(spark, sf_dir):
    """CCNet-style per-language perplexity bucketing (operators/
    text.py ppl_buckets; Wenzek et al. 2020): every language's
    documents split into equal-depth head/middle/tail thirds by the
    corpus-trained char-LM score — the standard crawl-quality
    stratification a mixing policy consumes. Summarized per (lang,
    bucket) with the score range. The oracle shares _CHAR_LM_CTES
    with text_lm_perplexity (the score arithmetic cannot drift) and
    replays the ntile cut on the identical (score DESC, doc_id)
    total order — lm_score is bit-identical cross-engine, so the
    equal-depth boundaries match exactly. Scale shape: scoring is a
    scan + broadcast join; the window shuffles slim (id, score) rows
    on lang; the docstring documents the approx-percentile cut for
    groups too large to sort per-partition."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    lab = text.ppl_buckets(docs, by_col="lang", n_buckets=3)
    return (
        lab.groupBy("lang", "bucket", "bucket_label")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.min("lm_score"), 6).cast("double").alias("min_score"),
            F.round(F.max("lm_score"), 6).cast("double").alias("max_score"),
        )
        .orderBy("lang", "bucket")
    )


@register_extra(
    "text_ppl_buckets_approx",
    "WITH "
    + _CHAR_LM_CTES
    + """,
langs AS (
  SELECT d.lang, COUNT(*) AS n_docs
  FROM doc_scores ds JOIN documents d USING (doc_id)
  GROUP BY d.lang
)
SELECT lang, n_docs, true AS buckets_valid, true AS monotone_ok, true AS depth_ok
FROM langs ORDER BY lang""",
)
def text_ppl_buckets_approx(spark, sf_dir):
    """The UNBOUNDED-GROUP spelling of text_ppl_buckets (r12):
    ``ppl_buckets(exact_depth=False)`` cuts each language on
    percentile_approx sketches of lm_score instead of an ntile window
    — no partition ever holds a whole language's (id, score) pairs,
    so a dominant language at 100 TB cannot single-task the plan.
    Approx cut points are sketch-dependent, so per-doc buckets are
    not oracle-replayable; the entry gates the CONTRACT instead:
    per language, (a) every scored document got a bucket in [1, 3]
    and the coverage count matches the oracle's exact scored-doc
    count, (b) buckets are score-monotone (min of bucket b ≥ max of
    bucket b+1 — exact by construction of the cut predicate), and
    (c) for languages with ≥ 30 docs, all 3 buckets exist with depth
    within max(6, 20%) of equal — the sketch-accuracy envelope. The
    exact-vs-approx per-doc agreement is pinned separately in pytest
    (test_ppl_buckets_approx_agreement)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    lab = text.ppl_buckets(docs, by_col="lang", n_buckets=3, exact_depth=False)
    per = lab.groupBy("lang", "bucket").agg(
        F.count("*").alias("nb"),
        F.min("lm_score").alias("mn"),
        F.max("lm_score").alias("mx"),
    )
    agg = per.groupBy("lang").agg(
        F.sum("nb").alias("n_docs"),
        F.sort_array(F.collect_list(F.struct("bucket", "nb", "mn", "mx"))).alias("bs"),
    )
    third = F.col("n_docs") / F.lit(3.0)
    return agg.select(
        "lang",
        "n_docs",
        F.expr("forall(bs, b -> b.bucket >= 1 AND b.bucket <= 3)").alias(
            "buckets_valid"
        ),
        F.expr(
            "forall(transform(sequence(1, size(bs) - 1),"
            " i -> bs[i - 1].mn >= bs[i].mx), x -> x)"
        ).alias("monotone_ok"),
        (
            (F.col("n_docs") < 30)
            | (
                (F.size("bs") == 3)
                & F.forall(
                    F.col("bs"),
                    lambda b: F.abs(b["nb"] - third)
                    <= F.greatest(F.lit(6.0), third * 0.2),
                )
            )
        ).alias("depth_ok"),
    ).orderBy("lang")


@register_extra(
    "mv_rollup_quantile_contract",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                         CAST(value AS DECIMAL(18,6)) AS v
                  FROM events)
       SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
              CAST(ROUND(quantile_cont(CAST(v AS DOUBLE), 0.5), 6) AS DOUBLE)
                  AS p50_exact,
              true AS merge_consistent, true AS within_band
       FROM e GROUP BY 1, 2""",
)
def mv_rollup_quantile_contract(spark, sf_dir):
    """Quantiles inside the incremental rollup: percentiles are the
    other aggregate with no additive partials, so the MV carries a
    BOTTOM-K-BY-HASH sample per bucket (rollup_mv sample_col) — a
    deterministic uniform sample whose merge is EXACT
    (bottom-k(A ∪ B) ≡ bottom-k(bottom-k(A) ∪ bottom-k(B))), unlike
    a reservoir, which needs sampler state. Contracts per
    (event_type, day), all in-plan: (a) the base+delta MERGED
    sample's p50 must EQUAL the single-pass sample's p50 — the exact
    mergeability the MV depends on; (b) buckets with n ≤ k carry the
    WHOLE bucket as their sample, so the estimator must EQUAL the
    exact nearest-rank median (decimal positional equality — the
    sf0.001 tiny-bucket case, where an interpolated-median band is
    the wrong yardstick and flagged a correct answer); larger buckets
    must land within 10% of the bucket's value range of the exact
    interpolated median (k=128; measured max deviation 3.0% at
    sf0.1, 1.3% at sf0.01 — the band is 3× the observed worst case
    and the draw is a pure content hash, so the margin cannot drift
    run-to-run)."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", "event_id", F.col("value").cast("decimal(18,6)").alias("v")
    )
    kw = dict(sample_col="v", sample_id_col="event_id", sample_k=128)
    cutoff = F.lit("2024-01-21").cast("timestamp")
    base = rollup_mv.rollup_partials(
        e.filter(F.col("ts") < cutoff), "ts", ["event_type"], "v", **kw
    )
    delta = rollup_mv.rollup_partials(
        e.filter(F.col("ts") >= cutoff), "ts", ["event_type"], "v", **kw
    )
    merged = rollup_mv.rollup_quantile(
        rollup_mv.rollup_merge(base, delta, ["event_type"], sample_k=128),
        0.5,
        out_col="p50_m",
    ).select("event_type", "bucket_start", "p50_m")
    direct = rollup_mv.rollup_quantile(
        rollup_mv.rollup_partials(e, "ts", ["event_type"], "v", **kw),
        0.5,
        out_col="p50_d",
    ).select("event_type", "bucket_start", "p50_d")
    exact = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).agg(
        F.percentile(F.col("v").cast("double"), F.lit(0.5)).alias("p50_exact"),
        (F.max("v") - F.min("v")).cast("double").alias("rng"),
        F.count("v").alias("bn"),
        F.element_at(
            F.array_sort(F.collect_list("v")),
            F.ceil(F.count("v") * F.lit(0.5)).cast("int"),
        ).alias("nr50"),
    )
    grain = ["event_type", "bucket_start"]
    return (
        exact.join(merged, on=grain)
        .join(direct, on=grain)
        .select(
            *grain,
            F.round("p50_exact", 6).cast("double").alias("p50_exact"),
            (F.col("p50_m") == F.col("p50_d")).alias("merge_consistent"),
            F.when(F.col("bn") <= 128, F.col("p50_m") == F.col("nr50"))
            .otherwise(
                F.abs(F.col("p50_m").cast("double") - F.col("p50_exact"))
                <= F.col("rng") * 0.10
            )
            .alias("within_band"),
        )
    )


@register_extra(
    "dedup_containment",
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS sh
              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-4)) AS i
                    FROM toks WHERE len(t) >= 5)),
       df AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 100),
       shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN df USING (sh)),
       inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS n_common
                 FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       sz AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY doc_id)
       SELECT a_id, b_id, sa.n AS n_a, sb.n AS n_b, n_common,
              CAST(ROUND(CAST(n_common AS DECIMAL(38,12)) / LEAST(sa.n, sb.n), 6)
                   AS DOUBLE) AS containment
       FROM inter
       JOIN sz sa ON sa.doc_id = a_id
       JOIN sz sb ON sb.doc_id = b_id
       WHERE n_common * 1000 >= 800 * LEAST(sa.n, sb.n)""",
)
def dedup_containment(spark, sf_dir):
    """Asymmetric shingle containment (operators/dedup.py:
    containment_pairs): pairs where the smaller document's 5-gram
    shingle set is ≥80% inside the larger one's — the Broder
    containment metric that catches quote-inclusion and
    doc-plus-boilerplate duplication Jaccard structurally misses (a
    short doc fully embedded in a long one has Jaccard ≈ short/long
    but containment 1.0). Same df-capped posting-list plan as
    dedup_ngram_jaccard (one groupBy on the 8-byte shingle hash,
    pairs emitted from each capped list with array HOFs — no
    self-join of the shingle set); the threshold compares in integer
    arithmetic on both engines so the 0.8 boundary cannot diverge on
    float rounding. The oracle replays the identical cap + metric on
    raw shingle strings."""
    return dedup.containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, n=5, max_df=100
    )


@register_extra(
    "dedup_span_removal",
    """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents),
       w AS (SELECT doc_id, i AS start, array_to_string(t[i:i+7], chr(31)) AS win
             FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-7)) AS i
                   FROM toks WHERE len(t) >= 8)),
       dup AS (SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
       cov AS (SELECT DISTINCT doc_id, start + k AS pos
               FROM w JOIN dup USING (win), unnest(generate_series(0, 7)) g(k)),
       tp AS (SELECT doc_id, t[i] AS tok, i AS ord
              FROM (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS i FROM toks)),
       kept AS (SELECT tp.doc_id, tp.tok, tp.ord
                FROM tp ANTI JOIN cov ON tp.doc_id = cov.doc_id AND tp.ord = cov.pos),
       agg AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY ord) AS ct FROM kept GROUP BY doc_id),
       nrem AS (SELECT doc_id, COUNT(*) AS n_removed FROM cov GROUP BY doc_id)
       SELECT toks.doc_id, len(t) AS n_tokens,
              COALESCE(n_removed, 0) AS n_removed,
              CAST(ROUND(CAST(len(t) - COALESCE(n_removed, 0) AS DECIMAL(38,12))
                         / GREATEST(len(t), 1), 6) AS DOUBLE) AS keep_fraction,
              md5(COALESCE(ct, '')) AS clean_hash
       FROM toks LEFT JOIN nrem USING (doc_id) LEFT JOIN agg USING (doc_id)""",
)
def dedup_span_removal(spark, sf_dir):
    """Cross-document duplicated-span REMOVAL (operators/dedup.py:
    remove_dup_spans) — the rewrite op dedup_span_stats only
    profiles: drop every token position covered by an 8-token window
    occurring in ≥2 documents (fixed-granularity exact substring
    dedup à la Lee et al.), and emit per doc the removed-token count
    plus an md5 of the REBUILT text so the oracle value-checks the
    actual rewrite, not just the counts. The engine shuffles only
    (doc_id, 8-byte window hash) and (doc_id, start) pairs — token
    arrays stay in the scan stage and the rebuild runs in array HOFs
    inside codegen; the oracle replays the pipeline on raw spans with
    an anti-join on covered positions."""
    return dedup.remove_dup_spans(
        _t(spark, sf_dir, "documents"), span=8, min_docs=2
    )


@register_extra(
    "q_stream_static_join",
    """SELECT c.c_mktsegment, e.event_type, COUNT(*) AS n,
              CAST(ROUND(SUM(CAST(e.value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value
       FROM events e JOIN customer c ON e.user_id = c.c_custkey
       GROUP BY 1, 2""",
)
def q_stream_static_join(spark, sf_dir):
    """Stream-static enrichment (streaming/joins.py:
    stream_static_enrich) — the remaining first-class Structured
    Streaming join pattern after the stream-stream interval entries:
    events replay through a real readStream, each micro-batch joins
    the BROADCAST customer dimension (no state store, nothing to
    watermark), and the streamed per-(segment, event_type) decimal
    totals must equal the batch join oracle exactly. At 100 TB the
    plan is the right shape by construction: the bounded dim
    broadcasts once per micro-batch and the stream side never
    shuffles or buffers."""
    df = _STREAM_WINDOW_RESULTS.get(f"static_join:{sf_dir}")
    if df is None:
        from .streaming.joins import stream_static_enrich

        _, stream = _events_stream(spark, sf_dir, prefix="hs_stream_stjoin_")
        dim = _t(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        enriched = stream_static_enrich(stream, dim, ["user_id"])
        agg = enriched.groupBy("c_mktsegment", "event_type").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("total_value"),
        )
        df = _run_to_memory(
            spark, agg, f"stream_stjoin_{abs(hash(sf_dir))}", "complete"
        )
        _STREAM_WINDOW_RESULTS[f"static_join:{sf_dir}"] = df
    return df.select(
        "c_mktsegment",
        "event_type",
        "n",
        F.round("total_value", 2).cast("double").alias("total_value"),
    )


@register_extra(
    "q_assign_row_ids",
    """SELECT doc_id,
              ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS row_id
       FROM documents""",
)
def q_assign_row_ids(spark, sf_dir):
    """Dense global row numbering (operators/sampling.py:
    assign_contiguous_ids): 0-based ids in (n_chars DESC, doc_id)
    order — the training-example indexing primitive (stable shard
    offsets, resumable exports) — computed WITHOUT the single-task
    global Window the oracle's ROW_NUMBER uses: a unit-weight
    two-level prefix sum (range exchange + per-partition counts to
    the driver + parallel LOCAL windows), the same scale shape the
    plan linter enforces for all corpus-proportional ranked work.
    Ids are a pure function of the data and the total order, so both
    engines must agree row-for-row."""
    from .operators import sampling

    docs = _t(spark, sf_dir, "documents")
    return sampling.assign_contiguous_ids(
        docs, [F.col("n_chars").desc(), F.col("doc_id")]
    ).select("doc_id", "row_id")


@register(
    "ann_join_contract",
    """SELECT CAST(vec_id AS BIGINT) AS query_id,
              CAST(10 AS BIGINT) AS n_results,
              true AS recall_ok,
              true AS corpus_recall_ok
       FROM embeddings WHERE vec_id % 5 = 0""",
)
def ann_join_contract(spark, sf_dir):
    """Cross-corpus ANN JOIN (operators/similarity.py:ann_join) —
    top-10 corpus neighbors for EVERY query row where both sides are
    data-proportional tables (retrieval-based decontamination, eval
    attribution), unlike the fixed-query-set ann_* entries: every
    fifth embedding is the query table, the rest the corpus, all
    joins unhinted (signature equi-join on (table_id, bucket), AQE
    decides broadcast), per-query ranking on a query-partitioned
    window. Contract vs the exact cross top-10
    (cosine_join_topk, the gate-SF quadratic twin): 10 results per
    query, per-query recall ≥ 0.8, corpus recall ≥ 0.9 — measured
    corpus 0.992 (sf0.01) / 0.997 (sf0.1) with worst query exactly
    0.8 at 8 tables × 4 planes + Hamming-1 probes; the hash draw is
    seed-fixed so the floors are deterministic."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_t = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) == 0)
    corpus_t = emb.filter(F.pmod(F.col("vec_id"), F.lit(5)) != 0)
    # planes sized by the documented occupancy rule (r12): identical to
    # the measured fixed-4 floors at every gate SF (planes_for returns
    # 4 up to ~2k corpus rows), and it is what keeps the production
    # path sublinear past them — the r12 sf1 smoke measured ann_join
    # alone at 11.9× wall on 10× data with fixed planes vs 6.0× sized
    # (the remaining smoke growth is cosine_join_topk, the entry's
    # deliberately-quadratic exact verifier)
    ann = similarity.ann_join(
        corpus_t, queries_t, k=10, n_planes=similarity.planes_for(corpus_t.count())
    )
    exact = similarity.cosine_join_topk(corpus_t, queries_t, k=10)
    return _ann_contract(ann, exact, min_recall_pct=80)


@register_extra(
    "mv_rollup_variance",
    """WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, event_type,
                         CAST(value AS DECIMAL(18,6)) AS v
                  FROM events),
       g AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
                    COUNT(v) AS n, SUM(v) AS total,
                    SUM(CAST(v * v AS DECIMAL(38,12))) AS ssq
             FROM e GROUP BY 1, 2),
       d AS (SELECT *,
                    (CAST(ssq AS DOUBLE)
                     - CAST(total AS DOUBLE) * CAST(total AS DOUBLE) / n) / n AS vr
             FROM g)
       SELECT event_type, bucket_start, n,
              CAST(ROUND(CASE WHEN vr < 0 THEN 0 ELSE vr END, 6) AS DOUBLE) AS var_pop,
              CAST(ROUND(SQRT(CASE WHEN vr < 0 THEN 0 ELSE vr END), 6) AS DOUBLE) AS stddev_pop,
              true AS merge_consistent
       FROM d""",
)
def mv_rollup_variance(spark, sf_dir):
    """Exact variance/stddev inside the incremental rollup
    (operators/rollup_mv.py sumsq partials): the MV carries the
    DECIMAL sum of squares next to n/total — the additive partial
    variance decomposes into, unlike the textbook two-pass formula —
    and rollup_finalize derives var_pop = (ssq − total²/n)/n on
    doubles cast from the exact decimal sums, so both engines compute
    the identical IEEE expression over identical inputs (a clamp
    handles the catastrophic-cancellation negative on near-constant
    buckets). merge_consistent pins merge(partials(A), partials(B)) ≡
    partials(A ∪ B) for the new column through the same base/delta
    split the other MV entries use; refresh cost stays
    O(delta + touched buckets)."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    cutoff = F.lit("2024-01-21").cast("timestamp")
    kw = dict(sumsq=True)
    base = rollup_mv.rollup_partials(
        e.filter(F.col("ts") < cutoff), "ts", ["event_type"], "v", **kw
    )
    delta = rollup_mv.rollup_partials(
        e.filter(F.col("ts") >= cutoff), "ts", ["event_type"], "v", **kw
    )
    merged = rollup_mv.rollup_finalize(
        rollup_mv.rollup_merge(base, delta, ["event_type"])
    ).select("event_type", "bucket_start", "n", "var_pop", "stddev_pop")
    direct = rollup_mv.rollup_finalize(
        rollup_mv.rollup_partials(e, "ts", ["event_type"], "v", **kw)
    ).select(
        "event_type",
        "bucket_start",
        F.col("var_pop").alias("var_d"),
        F.col("stddev_pop").alias("sd_d"),
    )
    grain = ["event_type", "bucket_start"]
    return merged.join(direct, on=grain).select(
        *grain,
        "n",
        "var_pop",
        "stddev_pop",
        (
            F.col("var_pop").eqNullSafe(F.col("var_d"))
            & F.col("stddev_pop").eqNullSafe(F.col("sd_d"))
        ).alias("merge_consistent"),
    )


@register_extra(
    "q_profile_table",
    """WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
       SELECT p.column, n.n_rows, p.n_nulls,
              CAST(ROUND(CAST(p.n_nulls AS DECIMAL(38,12))
                         / GREATEST(n.n_rows, 1), 6) AS DOUBLE) AS null_frac,
              p.n_distinct
       FROM n, (
         SELECT 'o_orderkey' AS column,
                COUNT(*) - COUNT(o_orderkey) AS n_nulls,
                COUNT(DISTINCT o_orderkey) AS n_distinct FROM orders
         UNION ALL
         SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
                COUNT(DISTINCT o_custkey) FROM orders
         UNION ALL
         SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
                COUNT(DISTINCT o_orderstatus) FROM orders
         UNION ALL
         SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
                COUNT(DISTINCT o_totalprice) FROM orders
         UNION ALL
         SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
                COUNT(DISTINCT o_orderdate) FROM orders
         UNION ALL
         SELECT 'o_orderpriority', COUNT(*) - COUNT(o_orderpriority),
                COUNT(DISTINCT o_orderpriority) FROM orders
       ) p""",
)
def q_profile_table(spark, sf_dir):
    """Generic data-quality profiler (operators/profiling.py:
    profile_table): per-column null counts/rates and EXACT distinct
    counts for the orders table in ONE aggregation pass — the
    pre-flight check a pipeline runs before trusting a join key or
    partition column. The multiple exact distincts compile to one
    Expand (k+1 pruned replicas into partial aggregates — the
    documented one-pass exactness cost; approx=True is the 10^9-row
    mode); the oracle recomputes every column's profile as separate
    scans and must match exactly."""
    from .operators.profiling import profile_table

    return profile_table(_t(spark, sf_dir, "orders"))


@register_extra(
    "mv_rollup_anomaly",
    """WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
                         CAST(value AS DECIMAL(18,6)) AS v
                  FROM events),
       g AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
                    COUNT(v) AS n, SUM(v) AS total,
                    SUM(CAST(v * v AS DECIMAL(38,12))) AS ssq
             FROM e GROUP BY 1, 2),
       f AS (SELECT event_type, bucket_start,
                    CAST(total AS DOUBLE) / n AS bucket_avg,
                    CAST(ssq AS DOUBLE) / n
                      - (CAST(total AS DOUBLE) / n) * (CAST(total AS DOUBLE) / n) AS var_raw,
                    (CAST(ssq AS DOUBLE)
                     - CAST(total AS DOUBLE) * CAST(total AS DOUBLE) / n) / n AS vr2
             FROM g),
       s AS (SELECT event_type, bucket_start, bucket_avg,
                    SQRT(CASE WHEN var_raw < 0 THEN 0 ELSE var_raw END) AS sd,
                    CAST(ROUND(SQRT(CASE WHEN vr2 < 0 THEN 0 ELSE vr2 END), 6) AS DOUBLE)
                        AS bucket_stddev
             FROM f)
       SELECT e.event_id, e.event_type, s.bucket_start,
              CAST(ROUND(e.v, 4) AS DOUBLE) AS v,
              CAST(ROUND(s.bucket_avg, 4) AS DOUBLE) AS bucket_avg,
              s.bucket_stddev,
              CAST(ROUND((CAST(e.v AS DOUBLE) - s.bucket_avg) / s.sd, 4) AS DOUBLE)
                  AS zscore
       FROM e
       JOIN s ON e.event_type = s.event_type
             AND CAST(date_trunc('day', e.ts) AS TIMESTAMP) = s.bucket_start
       WHERE s.sd > 0
         AND ABS(CAST(e.v AS DOUBLE) - s.bucket_avg) > 3 * s.sd""",
)
def mv_rollup_anomaly(spark, sf_dir):
    """Anomaly serving off the incremental rollup (operators/
    rollup_mv.py:rollup_anomalies): flag events more than 3
    population standard deviations from their (event_type, day)
    bucket mean, with avg/stddev derived from the MV's exact decimal
    partials (n/total/ssq) rather than a rescan — the alerting read
    path a continuous aggregate exists for. Both engines derive the
    flag from the identical IEEE expression over identical decimal
    sums, so the boundary cannot diverge; zero-variance buckets flag
    nothing by construction. The oracle replays the full
    stats-join-flag pipeline from the raw events."""
    from .operators import rollup_mv

    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", F.col("value").cast("decimal(18,6)").alias("v")
    )
    mv = rollup_mv.rollup_partials(e, "ts", ["event_type"], "v", sumsq=True)
    out = rollup_mv.rollup_anomalies(e, mv, "ts", ["event_type"], "v", z=3.0)
    return out.select(
        "event_id",
        "event_type",
        "bucket_start",
        F.round("v", 4).cast("double").alias("v"),
        "bucket_avg",
        "bucket_stddev",
        "zscore",
    )


@register_extra(
    "q_temperature_mixture_contract",
    """SELECT lang AS domain, true AS share_ok, true AS flattened_ok,
              true AS saturated_ok, true AS no_upsample
       FROM documents WHERE lang IS NOT NULL GROUP BY 1""",
)
def q_temperature_mixture_contract(spark, sf_dir):
    """Temperature-flattened domain rebalancing (operators/sampling.py:
    temperature_mixture, the XLM-R p^(1/T) schedule) at T = 2, driven
    through its contract: every realized share lands within 5 points
    of the sqrt-flattened target √n_d/Σ√n (share_ok — computed
    in-plan from the availability counts; IEEE sqrt is correctly
    rounded, so the target is engine-exact, which is why the contract
    pins T = 2 rather than an arbitrary pow), the kept-share spread is
    strictly narrower than the raw availability spread (flattened_ok —
    the property the temperature exists for), the binding domain keeps
    ~all its rows (saturated_ok), and no domain exceeds availability
    (no_upsample). Kept rows are the content-hash Bernoulli — a fixed
    property of the corpus, not a draw."""
    docs = _t(spark, sf_dir, "documents")
    kept = sampling.temperature_mixture(docs, "lang", temperature=2.0)
    avail = docs.filter(F.col("lang").isNotNull()).groupBy(
        F.col("lang").alias("domain")
    ).agg(F.count("*").alias("n_avail"))
    got = kept.groupBy(F.col("lang").alias("domain")).agg(
        F.count("*").alias("n_kept")
    )
    joined = avail.join(got, "domain", "left").na.fill(0, ["n_kept"])
    tots = joined.agg(
        F.sum("n_kept").alias("k_tot"),
        F.sum("n_avail").alias("a_tot"),
        F.sum(F.sqrt(F.col("n_avail"))).alias("sq_tot"),
    )
    per = joined.crossJoin(F.broadcast(tots)).select(
        "domain",
        "n_kept",
        "n_avail",
        (F.col("n_kept") / F.col("k_tot")).alias("kshare"),
        (F.col("n_avail") / F.col("a_tot")).alias("ashare"),
        (F.sqrt(F.col("n_avail")) / F.col("sq_tot")).alias("tshare"),
    )
    spreads = per.agg(
        (F.max("kshare") - F.min("kshare")).alias("kspread"),
        (F.max("ashare") - F.min("ashare")).alias("aspread"),
        (F.max(F.col("n_kept") / F.col("n_avail")) >= 1.0).alias("sat"),
    )
    return per.crossJoin(F.broadcast(spreads)).select(
        "domain",
        (F.abs(F.col("kshare") - F.col("tshare")) <= 0.05).alias("share_ok"),
        (F.col("kspread") < F.col("aspread")).alias("flattened_ok"),
        F.col("sat").alias("saturated_ok"),
        (F.col("n_kept") <= F.col("n_avail")).alias("no_upsample"),
    )


@register_extra(
    "text_collocations",
    """WITH toks AS (SELECT doc_id,
                            list_filter(string_split_regex(trim(text), '\\s+'),
                                        x -> x <> '') AS t
                     FROM documents),
       pairs AS (SELECT t[i] AS w1, t[i+1] AS w2
                 FROM (SELECT t, unnest(generate_series(1, len(t)-1)) AS i
                       FROM toks WHERE len(t) >= 2)),
       uni AS (SELECT u.w AS w, COUNT(*) AS cw
               FROM toks, unnest(t) u(w) GROUP BY 1),
       pc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM pairs GROUP BY 1, 2),
       tot AS (SELECT (SELECT SUM(n_pair) FROM pc) AS nb,
                      (SELECT SUM(cw) FROM uni) AS nu),
       scored AS (
         SELECT pc.w1, pc.w2, pc.n_pair,
                LN(CAST(pc.n_pair AS DOUBLE) / nb)
                  - LN(CAST(u1.cw AS DOUBLE) / nu)
                  - LN(CAST(u2.cw AS DOUBLE) / nu) AS pmi_raw
         FROM pc
         JOIN uni u1 ON u1.w = pc.w1
         JOIN uni u2 ON u2.w = pc.w2
         CROSS JOIN tot
         WHERE pc.n_pair >= 5
       )
       SELECT w1, w2, n_pair, CAST(ROUND(pmi_raw, 6) AS DOUBLE) AS pmi
       FROM scored
       ORDER BY pmi_raw DESC, w1, w2
       LIMIT 20""",
)
def text_collocations(spark, sf_dir):
    """Top-20 collocations by pointwise mutual information
    (operators/text.py:collocations_topk): exact corpus-wide bigram
    and unigram occurrence counts, PMI = ln(p(w1w2)/(p(w1)p(w2)))
    with the identical IEEE expression written on both engines over
    identical integer counts (the text_lm_perplexity precedent for
    log-formula oracles), TakeOrdered on the total order
    (pmi desc, w1, w2) so the top-k boundary cannot flap. The
    unigram table joins unhinted — vocabulary-sized, AQE broadcasts
    it. Corpus analytics for tokenizer design and boilerplate
    discovery."""
    return text.collocations_topk(_t(spark, sf_dir, "documents"), k=20, min_count=5)


# Fusion ranks are exact integers, so unlike the legs' double scores
# the fused ordering is bit-identical across engines by construction;
# the only doubles (1/(60+rank)) are quotients of exact ints.
_HYBRID_RRF_SQL = r"""
WITH q(query_id, query) AS (
  VALUES ('q1', 'table scan'), ('q2', 'hash merge batch'), ('q3', 'window sort fast')
),
toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents),
toks2 AS (SELECT doc_id, u AS term FROM (SELECT doc_id, unnest(t) AS u FROM toks) WHERE u <> ''),
post AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks2 GROUP BY 1, 2),
dl AS (SELECT d.doc_id, COALESCE(SUM(p.tf), 0) AS dl
       FROM documents d LEFT JOIN post p ON d.doc_id = p.doc_id GROUP BY 1),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
dfreq AS (SELECT term, COUNT(*) AS df FROM post GROUP BY 1),
qterms AS (
  SELECT DISTINCT query_id, u AS term
  FROM (SELECT query_id, unnest(string_split_regex(trim(query), '\s+')) AS u FROM q)
  WHERE u <> ''
),
bm_scored AS (
  SELECT query_id, p.doc_id,
         SUM(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
             * (p.tf * 2.2) / (p.tf + 1.2 * (1 - 0.75 + 0.75 * d.dl / s.avgdl))) AS score
  FROM qterms qt
  JOIN post p USING (term)
  JOIN dfreq f USING (term)
  JOIN dl d ON p.doc_id = d.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
bm20 AS (
  SELECT query_id, doc_id, bm25_rank FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS bm25_rank
    FROM bm_scored
  ) WHERE bm25_rank <= 20
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
dw AS (SELECT p.doc_id, p.term,
              p.tf * (ln((n.n_docs + 1.0) / (f.df + 1.0)) + 1.0) AS w
       FROM post p JOIN dfreq f USING (term) CROSS JOIN n),
dnorm AS (SELECT doc_id, sqrt(SUM(w * w)) AS dnorm FROM dw GROUP BY 1),
qtf AS (
  SELECT query_id, u AS term, COUNT(*) AS tf
  FROM (SELECT query_id, unnest(string_split_regex(trim(query), '\s+')) AS u FROM q)
  WHERE u <> '' GROUP BY 1, 2
),
qwt AS (SELECT qtf.query_id, qtf.term,
               qtf.tf * (ln((n.n_docs + 1.0) / (COALESCE(f.df, 0) + 1.0)) + 1.0) AS qw
        FROM qtf LEFT JOIN dfreq f USING (term) CROSS JOIN n),
qnorm AS (SELECT query_id, sqrt(SUM(qw * qw)) AS qnorm FROM qwt GROUP BY 1),
dots AS (SELECT qwt.query_id, dw.doc_id, SUM(qwt.qw * dw.w) AS dot
         FROM qwt JOIN dw USING (term) GROUP BY 1, 2),
cos20 AS (
  SELECT query_id, doc_id, cos_rank FROM (
    SELECT d.query_id, d.doc_id,
           ROW_NUMBER() OVER (PARTITION BY d.query_id
                              ORDER BY d.dot / (qn.qnorm * dn.dnorm) DESC, d.doc_id ASC) AS cos_rank
    FROM dots d
    JOIN qnorm qn USING (query_id)
    JOIN dnorm dn USING (doc_id)
  ) WHERE cos_rank <= 20
),
fused AS (
  SELECT COALESCE(b.query_id, c.query_id) AS query_id,
         COALESCE(b.doc_id, c.doc_id) AS doc_id,
         b.bm25_rank, c.cos_rank,
         COALESCE(CAST(1 AS DOUBLE) / (60 + b.bm25_rank), 0)
           + COALESCE(CAST(1 AS DOUBLE) / (60 + c.cos_rank), 0) AS rrf_raw
  FROM bm20 b
  FULL OUTER JOIN cos20 c ON b.query_id = c.query_id AND b.doc_id = c.doc_id
)
SELECT query_id, doc_id, bm25_rank, cos_rank, ROUND(rrf_raw, 6) AS rrf, rank FROM (
  SELECT query_id, doc_id, bm25_rank, cos_rank, rrf_raw,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_raw DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= 10
"""


@register("search_hybrid_rrf", _HYBRID_RRF_SQL)
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval by reciprocal-rank fusion
    (operators/search.py:hybrid_rrf): the BM25 leg and a sparse
    TF-IDF-cosine leg each rank the corpus top-20 per query, then RRF
    (Cormack et al. 2009: Σ 1/(60 + rank) over the legs that retrieved
    the doc) fuses them into one top-10 — the standard way production
    retrieval stacks combine lexical and vector rankings without
    reconciling score scales. The oracle replays both legs' full
    formulas AND the fusion; because RRF consumes only integer ranks,
    the fused ordering is exactly reproducible across engines. Both
    legs share one postings reduction; the fusion is a full-outer join
    of two (queries × 20)-row tables — query-proportional, never
    corpus-proportional."""
    queries = spark.createDataFrame(
        [("q1", "table scan"), ("q2", "hash merge batch"), ("q3", "window sort fast")],
        "query_id string, query string",
    )
    return search.hybrid_rrf(_t(spark, sf_dir, "documents"), queries, k=10, leg_k=20)


@register_extra(
    "text_lexical_diversity",
    r"""WITH toks AS (
         SELECT doc_id, u AS term
         FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS u
               FROM documents)
         WHERE u <> ''
       ),
       c AS (SELECT doc_id, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       cn AS (SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n FROM c),
       per AS (
         SELECT doc_id,
                CAST(SUM(c) AS BIGINT) AS n_tokens,
                COUNT(*) AS n_types,
                -SUM((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)) AS h
         FROM cn GROUP BY 1
       )
       SELECT d.doc_id,
              COALESCE(per.n_tokens, 0) AS n_tokens,
              COALESCE(per.n_types, 0) AS n_types,
              ROUND(CAST(per.n_types AS DOUBLE) / per.n_tokens, 6) AS ttr,
              ROUND(per.h, 6) AS entropy
       FROM documents d LEFT JOIN per USING (doc_id)""",
)
def text_lexical_diversity(spark, sf_dir):
    """Per-document lexical diversity
    (operators/text.py:lexical_diversity): type-token ratio and exact
    Shannon entropy of each doc's own token distribution — the
    within-document degeneracy signal a quality filter pairs with the
    cross-document repetition score. One explode + window + groupBy all
    keyed by doc_id (one corpus shuffle, per-doc bounded state); the
    oracle replays the identical −Σ p ln p over identical integer
    counts. Tokenless docs surface with n_tokens=0 and NULL
    ttr/entropy instead of vanishing."""
    return text.lexical_diversity(_t(spark, sf_dir, "documents"))


@register_extra(
    "q_exact_percentiles",
    """SELECT event_type,
              quantile_cont(value, 0.25) AS p25,
              quantile_cont(value, 0.5) AS p50,
              quantile_cont(value, 0.75) AS p75,
              quantile_cont(value, 0.9) AS p90,
              quantile_cont(value, 0.99) AS p99
       FROM events GROUP BY event_type""",
)
def q_exact_percentiles(spark, sf_dir):
    """EXACT grouped percentiles
    (operators/profiling.py:grouped_percentiles): Spark's sort-based
    `percentile` aggregate vs DuckDB quantile_cont, matched
    bit-for-bit on doubles INCLUDING the linearly interpolated order
    statistics — no rounding anywhere, unlike the sketch-based
    q_approx_percentile_contract. One hash shuffle on the
    low-cardinality group key; per-group state bounds memory, the
    documented fit for event-type-over-100 TB-log profiles (the
    docstring routes high-cardinality/giant-group cases to the sketch
    or prefix-sum selector)."""
    from .operators import profiling

    return profiling.grouped_percentiles(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )


@register_extra(
    "q_weighted_quantiles",
    """WITH g AS (
         SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,4)) AS v,
                SUM(CAST(l_quantity AS DECIMAL(20,6))) AS w
         FROM lineitem
         WHERE l_extendedprice IS NOT NULL
         GROUP BY 1, 2
       ),
       c AS (
         SELECT l_returnflag, v,
                SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
                SUM(w) OVER (PARTITION BY l_returnflag) AS tw
         FROM g
       )
       SELECT l_returnflag,
              CAST(ROUND(MIN(CASE WHEN cw >= CAST(0.5 AS DECIMAL(8,6)) * tw
                                  THEN v END), 2) AS DOUBLE) AS p50,
              CAST(ROUND(MIN(CASE WHEN cw >= CAST(0.9 AS DECIMAL(8,6)) * tw
                                  THEN v END), 2) AS DOUBLE) AS p90
       FROM c GROUP BY l_returnflag ORDER BY l_returnflag""",
)
def q_weighted_quantiles(spark, sf_dir):
    """EXACT weighted quantiles (operators/profiling.py
    weighted_quantiles): per return flag, the quantity-weighted
    median and p90 of extended price — the lower weighted quantile
    (smallest value whose cumulative weight reaches q·W), with
    DECIMAL weights so the threshold comparison is exact in both
    engines and ties collapsed before cumulating so intra-tie row
    order cannot matter. The mixing-policy primitive (token-weighted
    medians) demonstrated on the densest table. Scale shape: one
    (group, value) collapse shuffle, then a cumulative window over
    DISTINCT values — cardinality-bounded, not row-bounded."""
    from .operators import profiling

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast(DEC).alias("v"), "l_quantity"
    )
    out = profiling.weighted_quantiles(
        li, "v", "l_quantity", group_cols=("l_returnflag",), qs=(0.5, 0.9)
    )
    return out.select(
        "l_returnflag",
        F.round("p50", 2).cast("double").alias("p50"),
        F.round("p90", 2).cast("double").alias("p90"),
    ).orderBy("l_returnflag")


@register_extra(
    "q_auc_score",
    """WITH b AS (
         SELECT embedding[1] AS score,
                CASE WHEN label < 5 THEN 1 ELSE 0 END AS lab
         FROM embeddings
       ),
       g AS (SELECT score, SUM(lab) AS pos_s, SUM(1 - lab) AS neg_s
             FROM b GROUP BY 1),
       c AS (SELECT pos_s, neg_s,
                    SUM(pos_s) OVER (ORDER BY score DESC) - pos_s AS pos_above
             FROM g),
       agg AS (SELECT SUM(pos_s) AS np, SUM(neg_s) AS nn,
                      SUM(2 * neg_s * pos_above + neg_s * pos_s) AS num2
               FROM c)
       SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
              ROUND(CAST(num2 AS DOUBLE) / (2.0 * np * nn), 6) AS auc
       FROM agg""",
)
def q_auc_score(spark, sf_dir):
    """Exact tie-aware ROC AUC (operators/profiling.py:auc_binary) of
    the first embedding component against the binarized cluster label
    — the Mann-Whitney rank-sum form with an ALL-INTEGER numerator
    (2·neg·pos_above + neg·pos per distinct score) and one final
    double division, so both engines agree bit-for-bit with no
    float-sum ordering anywhere. The corpus reduces to one row per
    distinct score; the global prefix sum is the two-level
    distributed_cumsum, not a single-task Window (the oracle may use
    one — DuckDB's problem is 500 rows, ours is 100 TB). Evaluates
    whether a quality/filter score separates classes before you gate a
    corpus on it."""
    from .operators import profiling

    emb = _t(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).alias("score"),
        F.when(F.col("label") < 5, F.lit(1)).otherwise(F.lit(0)).alias("lab"),
    )
    return profiling.auc_binary(emb, "score", "lab")


@register_extra(
    "q_event_transitions",
    """WITH pairs AS (
         SELECT event_type AS from_type,
                LEAD(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS to_type
         FROM events
       ),
       n AS (SELECT from_type, to_type, COUNT(*) AS n
             FROM pairs WHERE to_type IS NOT NULL GROUP BY 1, 2),
       tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS tot
               FROM n GROUP BY 1)
       SELECT n.from_type, n.to_type, n.n,
              ROUND(CAST(n.n AS DOUBLE) / tot.tot, 6) AS p
       FROM n JOIN tot USING (from_type)""",
)
def q_event_transitions(spark, sf_dir):
    """First-order Markov transition matrix
    (operators/funnel.py:transition_matrix): adjacent (from → to)
    event pairs per user under the total order (ts, event_id), counted
    exactly, with row-normalized probabilities from one exact-integer
    division per cell — path DISCOVERY next to q_funnel_ordered's
    path verification. The lead window is per-user (never global); the
    |types|²-sized matrix broadcasts for the row-total join."""
    from .operators import funnel as funnel_ops

    return funnel_ops.transition_matrix(_t(spark, sf_dir, "events"))


@register_extra(
    "text_kl_divergence",
    r"""WITH toks AS (
         SELECT lang AS g, u AS term
         FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS u
               FROM documents)
         WHERE u <> ''
       ),
       gt AS (SELECT g, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       gtot AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM gt GROUP BY 1),
       ttot AS (SELECT term, CAST(SUM(c) AS BIGINT) AS ct FROM gt GROUP BY 1),
       n AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gt)
       SELECT gt.g AS lang, gtot.ng AS n_tokens,
              ROUND(SUM((CAST(gt.c AS DOUBLE) / gtot.ng)
                        * ln((CAST(gt.c AS DOUBLE) / gtot.ng)
                             / (CAST(ttot.ct AS DOUBLE) / n.n))), 6) AS kl
       FROM gt
       JOIN ttot USING (term)
       JOIN gtot ON gt.g IS NOT DISTINCT FROM gtot.g
       CROSS JOIN n
       GROUP BY 1, 2""",
)
def text_kl_divergence(spark, sf_dir):
    """Per-language KL divergence from the corpus unigram distribution
    (operators/text.py:kl_unigram_divergence) — the domain-drift
    measure for mixture curation: KL(P_lang ‖ P_corpus) in nats over
    exact integer counts, no smoothing needed because the corpus
    contains every group's tokens. One explode feeds all four count
    tables; the scoring join is vocabulary-sized and unhinted. The
    oracle replays the identical Σ p·ln(p/q); both engines round the
    one float sum to 6 after summing."""
    return text.kl_unigram_divergence(_t(spark, sf_dir, "documents"), "lang")


@register_extra(
    "ts_interarrival_stats",
    """WITH g AS (
         SELECT user_id,
                date_diff('microsecond',
                          LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                          ts) AS gap
         FROM events
       )
       SELECT user_id,
              COUNT(*) AS n_gaps,
              CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap_us,
              quantile_cont(gap, 0.5) AS p50_gap_us,
              CAST(MAX(gap) AS BIGINT) AS max_gap_us
       FROM g WHERE gap IS NOT NULL GROUP BY user_id""",
)
def ts_interarrival_stats(spark, sf_dir):
    """Per-user inter-arrival statistics
    (operators/timeseries.py:interarrival_stats): exact integer
    microsecond gaps between consecutive events under the total order
    (ts, event_id), then count / exact-division mean (UNROUNDED — one
    IEEE division of exact ints is bit-stable, while ROUND at 1e10
    magnitude asks for digits past double precision and the engines'
    rounders pick different neighbors) / interpolating exact median
    (the q_exact_percentiles parity) / max per user —
    the burstiness profile behind session-timeout calibration and
    rate-limit sizing. Per-key window + per-key sort state only; the
    oracle replays gap extraction and every statistic."""
    from .operators import timeseries as ts_ops

    return ts_ops.interarrival_stats(_t(spark, sf_dir, "events"))


@register(
    "q_robust_outliers",
    """WITH med AS (
         SELECT event_type, quantile_cont(value, 0.5) AS med
         FROM events GROUP BY event_type
       ),
       dev AS (
         SELECT e.event_type, m.med, ABS(e.value - m.med) AS dev
         FROM events e JOIN med m USING (event_type)
       ),
       mad AS (
         SELECT event_type, COUNT(*) AS n, ANY_VALUE(med) AS med,
                quantile_cont(dev, 0.5) AS mad
         FROM dev GROUP BY event_type
       )
       SELECT d.event_type, m.n, m.med, m.mad,
              CAST(SUM(CASE WHEN d.dev > 3.0 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_outliers
       FROM dev d JOIN mad m USING (event_type)
       GROUP BY 1, 2, 3, 4""",
)
def q_robust_outliers(spark, sf_dir):
    """Robust per-group outlier profile
    (operators/profiling.py:robust_outlier_stats): median absolute
    deviation with the 1.4826 normal-consistency factor and a 3-robust-
    z outlier count — the heavy-tail-safe alternative to the rollup's
    mean/σ anomaly gate (outliers can't inflate their own threshold;
    MAD's breakdown point is 50%). med and mad are the exact
    interpolating percentile (proven bit-parity), the deviations and
    the strict threshold compare are pure double arithmetic on
    identical bits, so the whole row needs NO rounding. All three
    aggregations and both joins are keyed by event_type."""
    from .operators import profiling

    return profiling.robust_outlier_stats(
        _t(spark, sf_dir, "events"), "event_type", "value", k=3.0
    )


@register_extra(
    "q_winsorize",
    """WITH b AS (
         SELECT event_type,
                quantile_cont(value, 0.01) AS lo,
                quantile_cont(value, 0.99) AS hi
         FROM events GROUP BY event_type
       )
       SELECT e.event_id, e.event_type, e.value,
              LEAST(GREATEST(e.value, b.lo), b.hi) AS value_w
       FROM events e JOIN b USING (event_type)""",
)
def q_winsorize(spark, sf_dir):
    """Per-group winsorization (operators/profiling.py:winsorize):
    every event row back with value clipped into its event type's
    exact [p1, p99] band — the tail-taming transform that keeps rows
    (so downstream counts/joins are unchanged) instead of dropping
    them. The clip emits either the original double or an exact
    interpolated percentile, so the whole column is rounding-free.
    One percentile agg + one broadcast bounds join; the fact rows
    never shuffle."""
    from .operators import profiling

    return profiling.winsorize(
        _t(spark, sf_dir, "events").select("event_id", "event_type", "value"),
        "event_type",
        "value",
    )


@register_extra(
    "q_chi2_independence",
    """WITH cells AS (
         SELECT lang AS a, source AS b, COUNT(*) AS o
         FROM documents
         WHERE lang IS NOT NULL AND source IS NOT NULL
         GROUP BY 1, 2
       ),
       ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
       cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
       n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
       per AS (
         SELECT cells.a, cells.b, n.n,
                (cells.o - CAST(ra.ra AS DOUBLE) * cb.cb / n.n)
                  * (cells.o - CAST(ra.ra AS DOUBLE) * cb.cb / n.n)
                  / (CAST(ra.ra AS DOUBLE) * cb.cb / n.n) AS x
         FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN n
       )
       SELECT n,
              CAST((COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS BIGINT) AS dof,
              ROUND(SUM(x), 6) AS chi2,
              ROUND(SQRT(SUM(x) / (n * LEAST(COUNT(DISTINCT a) - 1,
                                             COUNT(DISTINCT b) - 1))), 6) AS cramers_v
       FROM per GROUP BY n""",
)
def q_chi2_independence(spark, sf_dir):
    """Chi-squared independence test + Cramér's V
    (operators/profiling.py:chi2_independence) between document
    language and source — the categorical drift/association primitive
    ("did the label mix shift across sources"). One corpus groupBy
    yields the r·c contingency table; marginals, the statistic, and
    the effect size are aggregations of that tiny table (broadcast
    joins), never a corpus self-join. Counts are exact ints; each
    cell's (o−e)²/e is the identical IEEE expression on both engines,
    summed over r·c cells and rounded to 6."""
    from .operators import profiling

    return profiling.chi2_independence(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )


@register_extra(
    "q_spearman_corr",
    """WITH b AS (
         SELECT event_type, value AS x,
                CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
         FROM events
       ),
       r AS (
         SELECT event_type,
                RANK() OVER (PARTITION BY event_type ORDER BY x)
                  + (COUNT(*) OVER (PARTITION BY event_type, x) - 1) / 2.0 AS rx,
                RANK() OVER (PARTITION BY event_type ORDER BY y)
                  + (COUNT(*) OVER (PARTITION BY event_type, y) - 1) / 2.0 AS ry
         FROM b
       ),
       a AS (
         SELECT event_type, COUNT(*) AS n,
                SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
                SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
         FROM r GROUP BY 1
       )
       SELECT event_type, n,
              (n * sxy - sx * sy)
                / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rho
       FROM a""",
)
def q_spearman_corr(spark, sf_dir):
    """Per-event-type Spearman rank correlation
    (operators/profiling.py:spearman_by_group) between the numeric
    value and the JSON payload's k — tie-corrected via midranks, the
    outlier-proof monotonic-association measure. Midranks are
    quarter-integers bounded by group size, so every sum is exactly
    representable regardless of partition order and rho needs NO
    rounding — bit parity by construction (the q_auc_score
    integer-arithmetic discipline extended to rank statistics). Both
    rank windows are partitioned by event_type; nothing global."""
    from .operators import profiling

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.col("value").alias("x"),
        F.get_json_object("props", "$.k").cast("bigint").alias("y"),
    )
    return profiling.spearman_by_group(ev, "event_type", "x", "y")


@register_extra(
    "q_ks_two_sample",
    """WITH b AS (
         SELECT value,
                CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s
         FROM events WHERE event_type IN ('click', 'view')
       ),
       g AS (SELECT value, SUM(s) AS c1, SUM(1 - s) AS c2 FROM b GROUP BY 1),
       c AS (SELECT value, SUM(c1) OVER (ORDER BY value) AS cum1,
                    SUM(c2) OVER (ORDER BY value) AS cum2
             FROM g),
       n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM g)
       SELECT n.n1, n.n2,
              CAST(MAX(ABS(c.cum1 * n.n2 - c.cum2 * n.n1)) AS DOUBLE)
                / (n.n1 * n.n2) AS d
       FROM c CROSS JOIN n
       GROUP BY n.n1, n.n2""",
)
def q_ks_two_sample(spark, sf_dir):
    """Exact two-sample Kolmogorov–Smirnov distance
    (operators/profiling.py:ks_two_sample) between the click and view
    value distributions — the distribution-shift test. At each
    distinct value the ECDF gap is the exact integer
    |cum1·n2 − cum2·n1|; the max is integer; ONE double division
    closes (the q_auc_score all-integer discipline) — bit parity, no
    rounding. Both running totals are two-level distributed_cumsum
    passes, never a single-task global window (the oracle's window is
    DuckDB's problem at 10k rows, not ours at 100 TB)."""
    from .operators import profiling

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "value",
            F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0)).alias("s"),
        )
    )
    return profiling.ks_two_sample(ev, "value", "s")


@register_extra(
    "q_psi_drift",
    """WITH b AS (
         SELECT value,
                CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s
         FROM events WHERE event_type IN ('click', 'view')
       ),
       e AS (
         SELECT quantile_cont(value, 0.1) AS e1, quantile_cont(value, 0.2) AS e2,
                quantile_cont(value, 0.3) AS e3, quantile_cont(value, 0.4) AS e4,
                quantile_cont(value, 0.5) AS e5, quantile_cont(value, 0.6) AS e6,
                quantile_cont(value, 0.7) AS e7, quantile_cont(value, 0.8) AS e8,
                quantile_cont(value, 0.9) AS e9
         FROM b WHERE s = 1
       ),
       binned AS (
         SELECT s,
                CAST(value > e1 AS INT) + CAST(value > e2 AS INT)
                  + CAST(value > e3 AS INT) + CAST(value > e4 AS INT)
                  + CAST(value > e5 AS INT) + CAST(value > e6 AS INT)
                  + CAST(value > e7 AS INT) + CAST(value > e8 AS INT)
                  + CAST(value > e9 AS INT) AS bin
         FROM b CROSS JOIN e
       ),
       counts AS (SELECT bin, SUM(s) AS c1, SUM(1 - s) AS c2 FROM binned GROUP BY 1),
       spine AS (SELECT unnest(generate_series(0, 9)) AS bin),
       fullb AS (
         SELECT spine.bin, COALESCE(counts.c1, 0) AS c1, COALESCE(counts.c2, 0) AS c2
         FROM spine LEFT JOIN counts USING (bin)
       ),
       tot AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2 FROM fullb)
       SELECT tot.n1 AS n_ref, tot.n2 AS n_tgt,
              ROUND(SUM(((c1 + 0.5) / (n1 + 5.0) - (c2 + 0.5) / (n2 + 5.0))
                        * ln(((c1 + 0.5) / (n1 + 5.0)) / ((c2 + 0.5) / (n2 + 5.0)))), 6) AS psi
       FROM fullb CROSS JOIN tot
       GROUP BY tot.n1, tot.n2""",
)
def q_psi_drift(spark, sf_dir):
    """Population stability index (operators/profiling.py:psi) between
    click (reference) and view (target) value distributions over the
    reference's exact decile bins — the binned magnitude-weighted
    drift score next to q_ks_two_sample's worst-point distance. Edges
    are the proven-parity interpolating percentiles attached by a
    broadcast 1-row cross join; counts are exact ints over an explicit
    10-bin spine (empty bins kept); the +0.5 smoothing is part of the
    formula on BOTH engines; one Σ of 10 IEEE terms rounds to 6."""
    from .operators import profiling

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "value",
            F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0)).alias("s"),
        )
    )
    return profiling.psi(ev, "value", "s", bins=10)


@register_extra(
    "q_gini_concentration",
    r"""WITH x AS (
         SELECT len(list_filter(string_split_regex(trim(text), '\s+'),
                                t -> t <> '')) AS v
         FROM documents
       ),
       g AS (SELECT v, COUNT(*) AS c FROM x GROUP BY 1),
       cw AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM g),
       a AS (
         SELECT CAST(SUM(c) AS BIGINT) AS n,
                CAST(SUM(v * c) AS BIGINT) AS total,
                CAST(SUM(v * (2 * cum - c + 1) * c) AS BIGINT) AS s2
         FROM cw
       )
       SELECT n, total,
              CAST(s2 - (n + 1) * total AS DOUBLE) / (n * total) AS gini
       FROM a""",
)
def q_gini_concentration(spark, sf_dir):
    """Gini coefficient of token mass across documents
    (operators/profiling.py:gini) — the concentration summary behind
    cap/mixture decisions ("is the corpus a few giant docs or an even
    spread"). Sorted-rank identity evaluated per tie-run of distinct
    token counts: v·(a+b)·c terms are exact integers, ranks come from
    the two-level distributed_cumsum (no single-task window on our
    side), and ONE closing double division gives bit parity with the
    oracle's window replay."""
    from .operators import profiling

    docs = _t(spark, sf_dir, "documents").select(
        F.size(text.tokens_col(F.col("text"))).alias("v")
    )
    return profiling.gini(docs, "v")


@register_extra(
    "q_calibration_bins",
    """WITH b AS (
         SELECT embedding[1] AS s,
                CASE WHEN label < 5 THEN 1 ELSE 0 END AS y
         FROM embeddings
       ),
       e AS (
         SELECT quantile_cont(s, 0.1) AS e1, quantile_cont(s, 0.2) AS e2,
                quantile_cont(s, 0.3) AS e3, quantile_cont(s, 0.4) AS e4,
                quantile_cont(s, 0.5) AS e5, quantile_cont(s, 0.6) AS e6,
                quantile_cont(s, 0.7) AS e7, quantile_cont(s, 0.8) AS e8,
                quantile_cont(s, 0.9) AS e9
         FROM b
       ),
       binned AS (
         SELECT y, s,
                CAST(s > e1 AS INT) + CAST(s > e2 AS INT) + CAST(s > e3 AS INT)
                  + CAST(s > e4 AS INT) + CAST(s > e5 AS INT) + CAST(s > e6 AS INT)
                  + CAST(s > e7 AS INT) + CAST(s > e8 AS INT) + CAST(s > e9 AS INT) AS bin
         FROM b CROSS JOIN e
       ),
       counts AS (
         SELECT bin, COUNT(*) AS n, SUM(s) AS sum_s, SUM(y) AS pos
         FROM binned GROUP BY 1
       ),
       spine AS (SELECT unnest(generate_series(0, 9)) AS bin)
       SELECT spine.bin,
              CAST(COALESCE(counts.n, 0) AS BIGINT) AS n,
              ROUND(counts.sum_s / counts.n, 6) AS mean_score,
              CAST(counts.pos AS DOUBLE) / counts.n AS frac_pos
       FROM spine LEFT JOIN counts USING (bin)""",
)
def q_calibration_bins(spark, sf_dir):
    """Reliability-diagram bins
    (operators/profiling.py:calibration_bins) for the first embedding
    component against the binarized cluster label — the calibration
    complement of q_auc_score's ranking check. Equal-population bins
    from the score's own exact deciles; frac_pos is an exact integer
    division (unrounded), mean_score rounds to 6 because a float SUM
    is last-ulp partition-order-sensitive; empty bins survive via the
    explicit spine."""
    from .operators import profiling

    emb = _t(spark, sf_dir, "embeddings").select(
        F.element_at("embedding", 1).alias("s"),
        F.when(F.col("label") < 5, F.lit(1)).otherwise(F.lit(0)).alias("y"),
    )
    return profiling.calibration_bins(emb, "s", "y", bins=10)


@register_extra(
    "q_mutual_information",
    """WITH cells AS (
         SELECT lang AS a, source AS b, COUNT(*) AS o
         FROM documents
         WHERE lang IS NOT NULL AND source IS NOT NULL
         GROUP BY 1, 2
       ),
       ra AS (SELECT a, SUM(o) AS ra FROM cells GROUP BY 1),
       cb AS (SELECT b, SUM(o) AS cb FROM cells GROUP BY 1),
       n AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
       ha AS (SELECT -SUM((CAST(ra AS DOUBLE) / n.n) * ln(CAST(ra AS DOUBLE) / n.n)) AS ha
              FROM ra CROSS JOIN n),
       hb AS (SELECT -SUM((CAST(cb AS DOUBLE) / n.n) * ln(CAST(cb AS DOUBLE) / n.n)) AS hb
              FROM cb CROSS JOIN n),
       mi AS (
         SELECT n.n AS n,
                SUM((CAST(cells.o AS DOUBLE) / n.n)
                    * ln((CAST(cells.o AS DOUBLE) * n.n)
                         / (CAST(ra.ra AS DOUBLE) * cb.cb))) AS mi_raw
         FROM cells JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN n
         GROUP BY n.n
       )
       SELECT mi.n, ROUND(mi.mi_raw, 6) AS mi,
              ROUND(mi.mi_raw / SQRT(ha.ha * hb.hb), 6) AS nmi
       FROM mi CROSS JOIN ha CROSS JOIN hb""",
)
def q_mutual_information(spark, sf_dir):
    """Mutual information + sqrt-normalized NMI between document
    language and source (operators/profiling.py:mutual_information) —
    the scale-free association measure comparable ACROSS column pairs,
    next to q_chi2_independence's significance framing. Same
    one-groupBy contingency reduction; margins feed the entropies;
    every probability is an exact-integer ratio before one log per
    cell, both sums rounded to 6 after summing."""
    from .operators import profiling

    return profiling.mutual_information(
        _t(spark, sf_dir, "documents"), "lang", "source"
    )


@register_extra(
    "text_zipf_alpha",
    r"""WITH toks AS (
         SELECT u AS term
         FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS u
               FROM documents)
         WHERE u <> ''
       ),
       c AS (SELECT term, COUNT(*) AS c FROM toks GROUP BY 1 HAVING COUNT(*) >= 5)
       SELECT COUNT(*) AS n_tail,
              CAST(5 AS INT) AS xmin,
              ROUND(1.0 + COUNT(*) / SUM(ln(CAST(c AS DOUBLE) / 5.0)), 6) AS alpha
       FROM c""",
)
def text_zipf_alpha(spark, sf_dir):
    """Hill estimator of the token-frequency power-law exponent
    (operators/text.py:zipf_alpha) — the one-number Zipf fingerprint
    a corpus pipeline tracks across versions (template spam flattens
    the tail, over-dedup steepens it). Exact integer counts ≥ xmin=5,
    one log per tail term, one closing division rounded to 6 — the
    same vocabulary-sized reduction as the rest of the corpus
    statistics."""
    return text.zipf_alpha(_t(spark, sf_dir, "documents"), xmin=5)


@register_extra(
    "dedup_threshold_profile",
    """WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
       ),
       idx AS (
         SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i FROM toks WHERE len(t) >= 3
       ),
       sh0 AS (
         SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle FROM idx
       ),
       sh AS (
         SELECT doc_id, shingle FROM sh0
         WHERE shingle IN (SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= 100)
       ),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
       inter AS (
         SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS c
         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2
       ),
       pairs AS (
         SELECT a_id, b_id, ROUND(c * 1.0 / (sa.n_sh + sb.n_sh - c), 6) AS jaccard
         FROM inter JOIN sizes sa ON a_id = sa.doc_id JOIN sizes sb ON b_id = sb.doc_id
         WHERE c * 1.0 / (sa.n_sh + sb.n_sh - c) >= 0.3
       ),
       t AS (SELECT CAST(x AS DOUBLE) AS threshold
             FROM (VALUES (0.3), (0.5), (0.7), (0.9)) v(x)),
       hits AS (SELECT t.threshold, p.a_id, p.b_id
                FROM t JOIN pairs p ON p.jaccard >= t.threshold),
       np AS (SELECT threshold, COUNT(*) AS n_pairs FROM hits GROUP BY 1),
       nd AS (SELECT threshold, COUNT(DISTINCT d) AS n_docs_affected
              FROM (SELECT threshold, a_id AS d FROM hits
                    UNION ALL SELECT threshold, b_id FROM hits)
              GROUP BY 1)
       SELECT t.threshold,
              COALESCE(np.n_pairs, 0) AS n_pairs,
              COALESCE(nd.n_docs_affected, 0) AS n_docs_affected
       FROM t LEFT JOIN np USING (threshold) LEFT JOIN nd USING (threshold)""",
)
def dedup_threshold_profile(spark, sf_dir):
    """Dedup threshold tuning profile
    (operators/dedup.py:jaccard_threshold_profile): pair volume and
    blast radius (distinct docs in ≥1 pair) at thresholds
    0.3/0.5/0.7/0.9, from ONE df-capped posting-list pass at the
    loosest cutoff — stricter rows are filtered counts of the
    persisted pair table, never re-joins. Jaccard is an exact ratio
    of integer shingle-set sizes, so the threshold compares are
    engine-exact; zero-pair thresholds still emit (t, 0, 0) on both
    engines."""
    return dedup.jaccard_threshold_profile(
        _t(spark, sf_dir, "documents"),
        thresholds=(0.3, 0.5, 0.7, 0.9),
        max_df=100,
    )


@register_extra(
    "q_ols_trend",
    """WITH m AS (
         SELECT event_type,
                MIN(epoch_us(ts)) AS t0
         FROM events GROUP BY 1
       ),
       prep AS (
         SELECT e.event_type,
                (epoch_us(e.ts) - m.t0) // 1000000 AS x,
                CAST(FLOOR(e.value * 1000) AS BIGINT) AS y
         FROM events e JOIN m USING (event_type)
       ),
       s AS (
         SELECT event_type, COUNT(*) AS n,
                CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                CAST(SUM(x * y) AS BIGINT) AS sxy,
                CAST(SUM(x * x) AS BIGINT) AS sxx,
                CAST(SUM(y * y) AS BIGINT) AS syy
         FROM prep GROUP BY 1
       )
       SELECT event_type, n,
              ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)) * 86.4, 6)
                AS slope_per_day,
              ROUND(((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                    * ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                       / (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6) AS r2
       FROM s""",
)
def q_ols_trend(spark, sf_dir):
    """Per-event-type least-squares time trend
    (operators/profiling.py:ols_trend): slope per day in value units
    + r² — direction-of-drift next to the rollup's point anomalies.
    Inputs are exactified FIRST (whole seconds from the group's first
    event via integer `div`, milli-unit floor of the value), so every
    sum is an exact BIGINT in any partition order; the closing
    normal-equation arithmetic is the identical IEEE expression on
    both engines, rounded to 6. One min-reduction broadcast-joined
    back + one grouped sum pass."""
    from .operators import profiling

    return profiling.ols_trend(
        _t(spark, sf_dir, "events"), "event_type", "ts", "value"
    )


@register_extra(
    "q_welch_ttest",
    """WITH b AS (
         SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS s,
                CAST(FLOOR(value * 1000) AS BIGINT) AS y
         FROM events WHERE event_type IN ('click', 'view')
       ),
       agg AS (
         SELECT CAST(SUM(s) AS BIGINT) AS n1,
                CAST(SUM(1 - s) AS BIGINT) AS n2,
                CAST(SUM(s * y) AS BIGINT) AS s1,
                CAST(SUM((1 - s) * y) AS BIGINT) AS s2,
                CAST(SUM(s * y * y) AS BIGINT) AS q1,
                CAST(SUM((1 - s) * y * y) AS BIGINT) AS q2
         FROM b
       )
       SELECT n1, n2,
              ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2) / 1000.0, 6)
                AS mean_diff,
              ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                    / SQRT(((CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                            / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0))) / CAST(n1 AS DOUBLE)
                           + ((CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
                              / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))) / CAST(n2 AS DOUBLE)), 6)
                AS t_stat,
              ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
                    / SQRT(((CAST(n1 AS DOUBLE) - 1.0)
                              * ((CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1)
                                 / (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1.0)))
                            + (CAST(n2 AS DOUBLE) - 1.0)
                              * ((CAST(n2 AS DOUBLE) * q2 - CAST(s2 AS DOUBLE) * s2)
                                 / (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1.0))))
                           / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2.0)), 6)
                AS cohens_d
       FROM agg""",
)
def q_welch_ttest(spark, sf_dir):
    """Welch's t statistic + Cohen's d between click and view values
    (operators/profiling.py:welch_ttest) — the parametric mean-shift
    test next to q_ks_two_sample's shape test and q_psi_drift's binned
    score. Values exactified to milli-unit integers first (the
    q_ols_trend discipline), so all six sums are exact BIGINTs in any
    partition order; t and d are one fixed IEEE closing expression
    per engine over identical bits, rounded to 6. No p-value by
    design: neither engine ships Student's CDF and monitors threshold
    the statistic directly."""
    from .operators import profiling

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "value",
            F.when(F.col("event_type") == "click", F.lit(1)).otherwise(F.lit(0)).alias("s"),
        )
    )
    return profiling.welch_ttest(ev, "value", "s")


@register_extra(
    "pipeline_quality_report",
    r"""WITH toks AS (
         SELECT lang, u AS term
         FROM (SELECT lang, unnest(string_split_regex(trim(text), '\s+')) AS u
               FROM documents)
         WHERE u <> ''
       ),
       vocab AS (
         SELECT lang, CAST(COUNT(*) AS BIGINT) AS total_tokens,
                COUNT(DISTINCT term) AS vocabulary
         FROM toks GROUP BY 1
       ),
       tc AS (SELECT lang, term, COUNT(*) AS c FROM toks GROUP BY 1, 2),
       zipf AS (
         SELECT lang, COUNT(*) AS n_tail,
                ROUND(1.0 + COUNT(*) / SUM(ln(CAST(c AS DOUBLE) / 5.0)), 6) AS zipf_alpha
         FROM tc WHERE c >= 5 GROUP BY 1
       ),
       norm AS (
         SELECT lang,
                md5(trim(regexp_replace(regexp_replace(lower(text), '[^\w \t\n\f\r]', '', 'g'),
                                        '[ \t\n\f\r]+', ' ', 'g'))) AS h
         FROM documents
       ),
       hc AS (SELECT lang, h, COUNT(*) AS c FROM norm GROUP BY 1, 2),
       dup AS (
         SELECT lang, CAST(SUM(c) AS BIGINT) AS n_docs,
                CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_docs
         FROM hc GROUP BY 1
       )
       SELECT dup.lang, dup.n_docs, vocab.total_tokens, vocab.vocabulary,
              CAST(vocab.vocabulary AS DOUBLE) / vocab.total_tokens AS ttr,
              CAST(dup.dup_docs AS DOUBLE) / dup.n_docs AS dup_share,
              zipf.zipf_alpha
       FROM dup JOIN vocab USING (lang) LEFT JOIN zipf USING (lang)""",
)
def pipeline_quality_report(spark, sf_dir):
    """Per-language corpus HEALTH report in one composed plan — the
    diagnostics face of the prep pipelines (those transform, this
    measures): n_docs, token mass, vocabulary size, corpus-level TTR
    (exact integer division vocabulary/tokens — no per-doc float
    averaging), normalized-exact-dup share (the near-dup ladder's
    first rung, exact division), and the per-language Zipf/Hill alpha
    (tail shape). One tokenize+explode feeds vocabulary AND the zipf
    tail; one normalization pass feeds the dup share; the joins are
    language-cardinality-sized. Every non-count column is either an
    exact-integer ratio (unrounded bit parity) or the documented
    one-Σ-of-logs estimator rounded to 6."""
    docs = _t(spark, sf_dir, "documents")
    toks = (
        docs.select("lang", F.explode(text.tokens_col(F.col("text"))).alias("term"))
        .filter(F.col("term") != "")
    )
    vocab = toks.groupBy("lang").agg(
        F.count("*").alias("total_tokens"),
        F.count_distinct("term").alias("vocabulary"),
    )
    tc = toks.groupBy("lang", "term").agg(F.count("*").alias("c")).filter(F.col("c") >= 5)
    zipf = tc.groupBy("lang").agg(
        F.count("*").alias("n_tail"),
        F.round(
            F.lit(1.0)
            + F.count("*") / F.sum(F.log(F.col("c").cast("double") / F.lit(5.0))),
            6,
        ).alias("zipf_alpha"),
    )
    hc = (
        docs.select("lang", F.md5(text.normalized_text(F.col("text"))).alias("h"))
        .groupBy("lang", "h")
        .agg(F.count("*").alias("c"))
    )
    dup = hc.groupBy("lang").agg(
        F.sum("c").alias("n_docs"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup_docs"),
    )
    return (
        dup.join(vocab, "lang")
        .join(zipf.select("lang", "zipf_alpha"), "lang", "left")
        .select(
            "lang",
            "n_docs",
            "total_tokens",
            "vocabulary",
            (F.col("vocabulary").cast("double") / F.col("total_tokens")).alias("ttr"),
            (F.col("dup_docs").cast("double") / F.col("n_docs")).alias("dup_share"),
            "zipf_alpha",
        )
    )


@register_extra(
    "q_user_growth",
    """WITH first_seen AS (
         SELECT user_id, CAST(MIN(date_trunc('day', ts)) AS TIMESTAMP) AS day
         FROM events GROUP BY user_id
       ),
       daily AS (SELECT day, COUNT(*) AS new_users FROM first_seen GROUP BY day)
       SELECT day, new_users,
              CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
       FROM daily""",
)
def q_user_growth(spark, sf_dir):
    """Cumulative unique-user growth curve: each user reduces to a
    first-seen day (one groupBy — the scale step), then per-day
    new-user counts and a running total over the DAY-cardinality
    table (the q_moving_average precedent: a global window over a
    few hundred rows is a scalar-bounded reduction, not the
    unpartitioned-Window hazard — the corpus-sized work already
    collapsed). The 'how fast is the audience growing' complement of
    q_distinct_users_daily's per-day actives."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = first_seen.groupBy("day").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("day")
    return daily.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


@register_extra(
    "ts_scd2_intervals",
    """SELECT user_id, value,
              ts AS valid_from,
              LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
              LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                AS is_current
       FROM events""",
)
def ts_scd2_intervals(spark, sf_dir):
    """Type-2 SCD validity intervals from the event log
    (operators/timeseries.py:scd2_intervals): every observation
    becomes a half-open [valid_from, valid_to) interval under the
    total order (ts, event_id), the latest per key flagged current —
    the build-once dimension history that turns repeated as-of
    lookups into plain range predicates. One per-key lead window,
    row-preserving; the oracle replays the identical window."""
    from .operators import timeseries as ts_ops

    return ts_ops.scd2_intervals(_t(spark, sf_dir, "events"))


@register(
    "ts_point_in_time_read",
    """WITH ranked AS (
         SELECT user_id, value,
                ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events
         WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
       )
       SELECT user_id, value FROM ranked WHERE rn = 1""",
)
def ts_point_in_time_read(spark, sf_dir):
    """Point-in-time dimension read THROUGH the SCD2 intervals
    (operators/timeseries.py:scd2_intervals): build the type-2
    history, then the state of every user at T is one range predicate
    — valid_from ≤ T < valid_to (NULL-open current rows included).
    The oracle computes the same answer the asof way (last event
    strictly before T per user), so the interval construction's
    half-open semantics are value-checked against the independent
    formulation — intervals and as-of reads must agree or one of
    them lies."""
    from .operators import timeseries as ts_ops

    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    iv = ts_ops.scd2_intervals(_t(spark, sf_dir, "events"))
    return iv.filter(
        (F.col("valid_from") <= t)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
    ).select("user_id", "value")


@register_extra(
    "q_session_duration_stats",
    """WITH e AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
       ), gaps AS (
         SELECT user_id, event_id, ts,
                CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       ), sessions AS (
         SELECT user_id,
                CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_id,
                ts
         FROM gaps
       ), durs AS (
         SELECT user_id, session_id,
                COUNT(*) AS n_events,
                epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
         FROM sessions GROUP BY 1, 2
       )
       SELECT COUNT(*) AS n_sessions,
              CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
              quantile_cont(duration_us, 0.5) AS p50_duration_us,
              quantile_cont(duration_us, 0.9) AS p90_duration_us,
              CAST(MAX(duration_us) AS BIGINT) AS max_duration_us,
              quantile_cont(CAST(n_events AS DOUBLE), 0.5) AS p50_events
       FROM durs""",
)
def q_session_duration_stats(spark, sf_dir):
    """Session-quality summary composing sessionization with the
    exact interpolating percentile: one row — session count, bounce
    count (single-event sessions), exact p50/p90 session duration in
    integer µs, max, and median events-per-session. The number set a
    product team actually tracks; durations are exact integer
    differences so the percentile interpolation (the
    q_exact_percentiles parity) is the only non-integer step. Same
    per-user windows as q_sessionization; the final percentile
    aggregates the SESSION table (corpus already collapsed)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = _t(spark, sf_dir, "events").withColumn("ts_us", F.unix_micros("ts"))
    gaps = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(w).isNull()
            | ((F.col("ts_us") - F.lag("ts_us").over(w)) > 1800 * 1000 * 1000),
            1,
        ).otherwise(0),
    )
    sessions = gaps.withColumn("session_id", F.sum("new_session").over(w))
    durs = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    )
    return durs.agg(
        F.count("*").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias("n_bounces"),
        F.percentile(F.col("duration_us"), F.lit(0.5)).alias("p50_duration_us"),
        F.percentile(F.col("duration_us"), F.lit(0.9)).alias("p90_duration_us"),
        F.max("duration_us").alias("max_duration_us"),
        F.percentile(F.col("n_events").cast("double"), F.lit(0.5)).alias("p50_events"),
    )


@register_extra(
    "q_pareto_share",
    """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
       ranked AS (
         SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS rn FROM c
       ),
       tot AS (SELECT COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events FROM c)
       SELECT tot.n_users, tot.n_events,
              CAST(CEIL(tot.n_users / 10.0) AS BIGINT) AS top_users,
              CAST((SELECT SUM(n) FROM ranked WHERE rn <= CEIL(tot.n_users / 10.0))
                   AS DOUBLE) / tot.n_events AS top_decile_share
       FROM tot""",
)
def q_pareto_share(spark, sf_dir):
    """Pareto concentration: what share of all events do the top 10%
    of users generate — the 80/20 check behind skew planning and
    per-user caps (the scalar companion of q_skew_report's per-key
    view and q_gini_concentration's integral). Ranks come from the
    two-level distributed_cumsum over unit weights (never a
    single-task global window on our side — the oracle's window is
    fine at its row counts); counts are exact ints with ONE closing
    division."""
    from .operators.sampling import distributed_cumsum

    c = _t(spark, sf_dir, "events").groupBy("user_id").agg(F.count("*").alias("n"))
    ranked = distributed_cumsum(
        c.withColumn("__one", F.lit(1)),
        "__one",
        [F.col("n").desc(), F.col("user_id")],
        cum_col="rn",
    )
    tot = c.agg(
        F.count("*").alias("n_users"), F.sum("n").alias("n_events")
    )
    top = (
        ranked.crossJoin(F.broadcast(tot))
        .filter(F.col("rn") <= F.ceil(F.col("n_users") / F.lit(10.0)))
        .agg(F.sum("n").alias("top_n"))
    )
    return (
        tot.crossJoin(F.broadcast(top))
        .select(
            "n_users",
            "n_events",
            F.ceil(F.col("n_users") / F.lit(10.0)).cast("long").alias("top_users"),
            (F.col("top_n").cast("double") / F.col("n_events")).alias("top_decile_share"),
        )
    )


@register_extra(
    "emb_vector_stats",
    """WITH n AS (
         SELECT vec_id, len(embedding) AS dim,
                sqrt(list_sum(list_transform(embedding,
                                             x -> CAST(x AS DOUBLE) * x))) AS nrm
         FROM embeddings
       )
       SELECT COUNT(*) AS n_vecs,
              MIN(dim) AS min_dim, MAX(dim) AS max_dim,
              CAST(SUM(CASE WHEN nrm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
              quantile_cont(nrm, 0.5) AS p50_norm,
              MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
       FROM n""",
)
def emb_vector_stats(spark, sf_dir):
    """Embedding-table QA in one row: vector count, dim bounds (a
    ragged table breaks every downstream kernel), zero-vector count
    (cosine against a zero vector is NaN — the classic silent ANN
    poison), and the norm distribution (min/median/max — unnormalized
    mixtures break inner-product search). Norms fold each row's own
    array left-to-right on both engines (same IEEE add sequence, so
    the doubles agree bit-for-bit and the interpolating median
    inherits parity); everything else is exact counts. Pure per-row
    HOFs + one aggregation — scan-shaped."""
    emb = _t(spark, sf_dir, "embeddings")
    n = emb.select(
        F.size("embedding").alias("dim"),
        F.sqrt(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x,
            )
        ).alias("nrm"),
    )
    return n.agg(
        F.count("*").alias("n_vecs"),
        F.min("dim").alias("min_dim"),
        F.max("dim").alias("max_dim"),
        F.sum(F.when(F.col("nrm") == 0, 1).otherwise(0)).alias("n_zero"),
        F.percentile(F.col("nrm"), F.lit(0.5)).alias("p50_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
    )


@register_extra(
    "q_dau_mau_stickiness",
    """WITH d AS (
         SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                COUNT(DISTINCT user_id) AS dau
         FROM events GROUP BY 1
       ),
       t AS (SELECT COUNT(*) AS n_days, CAST(SUM(dau) AS BIGINT) AS sum_dau FROM d),
       m AS (SELECT COUNT(DISTINCT user_id) AS mau FROM events)
       SELECT t.n_days, t.sum_dau, m.mau,
              CAST(t.sum_dau AS DOUBLE) / t.n_days / m.mau AS stickiness
       FROM t CROSS JOIN m""",
)
def q_dau_mau_stickiness(spark, sf_dir):
    """DAU/MAU stickiness in one row: active days, summed daily
    actives, period uniques, and stickiness = avg-DAU / MAU — the
    engagement ratio product teams watch (1.0 = everyone active every
    day). Exact distinct counts (one per-day reduction + one period
    reduction), exact-integer numerators, two chained IEEE divisions
    written identically on both engines — no rounding needed."""
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count_distinct("user_id").alias("dau")
    )
    t = d.agg(F.count("*").alias("n_days"), F.sum("dau").alias("sum_dau"))
    m = ev.agg(F.count_distinct("user_id").alias("mau"))
    return t.crossJoin(F.broadcast(m)).select(
        "n_days",
        "sum_dau",
        "mau",
        (F.col("sum_dau").cast("double") / F.col("n_days") / F.col("mau")).alias(
            "stickiness"
        ),
    )


@register_extra(
    "q_rfm_segments",
    """WITH mx AS (SELECT MAX(epoch_us(ts)) AS tmax FROM events),
       u AS (
         SELECT user_id,
                mx.tmax - MAX(epoch_us(ts)) AS recency_us,
                COUNT(*) AS frequency,
                CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS monetary_milli
         FROM events CROSS JOIN mx GROUP BY user_id, mx.tmax
       ),
       e AS (
         SELECT quantile_cont(CAST(recency_us AS DOUBLE), 0.25) AS r1,
                quantile_cont(CAST(recency_us AS DOUBLE), 0.5) AS r2,
                quantile_cont(CAST(recency_us AS DOUBLE), 0.75) AS r3,
                quantile_cont(CAST(frequency AS DOUBLE), 0.25) AS f1,
                quantile_cont(CAST(frequency AS DOUBLE), 0.5) AS f2,
                quantile_cont(CAST(frequency AS DOUBLE), 0.75) AS f3,
                quantile_cont(CAST(monetary_milli AS DOUBLE), 0.25) AS m1,
                quantile_cont(CAST(monetary_milli AS DOUBLE), 0.5) AS m2,
                quantile_cont(CAST(monetary_milli AS DOUBLE), 0.75) AS m3
         FROM u
       )
       SELECT 1 + CAST(recency_us > e.r1 AS INT) + CAST(recency_us > e.r2 AS INT)
                + CAST(recency_us > e.r3 AS INT) AS r_quartile,
              1 + CAST(frequency > e.f1 AS INT) + CAST(frequency > e.f2 AS INT)
                + CAST(frequency > e.f3 AS INT) AS f_quartile,
              1 + CAST(monetary_milli > e.m1 AS INT) + CAST(monetary_milli > e.m2 AS INT)
                + CAST(monetary_milli > e.m3 AS INT) AS m_quartile,
              COUNT(*) AS n_users
       FROM u CROSS JOIN e
       GROUP BY 1, 2, 3""",
)
def q_rfm_segments(spark, sf_dir):
    """RFM user segmentation: recency (µs since the corpus's last
    event — exact ints), frequency (exact counts), monetary
    (milli-floor exactified value sums — partition-order-proof), each
    bucketed by the metric's own exact quartile edges (the PSI
    binning idiom: broadcast 1-row edge attach, strict > compares),
    then segment counts over the ≤64-cell (r, f, m) cube. The
    marketing-analytics staple, fully engine-exact: integer metrics,
    proven-parity interpolated edges, integer bin arithmetic."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts")).alias("tmax"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "tmax")
        .agg(
            (F.col("tmax") - F.max(F.unix_micros("ts"))).alias("recency_us"),
            F.count("*").alias("frequency"),
            F.sum(F.floor(F.col("value") * F.lit(1000)).cast("long")).alias(
                "monetary_milli"
            ),
        )
    )
    edges = u.agg(
        *[
            F.percentile(F.col(c).cast("double"), F.lit(p)).alias(f"{c[0]}{i}")
            for c in ("recency_us", "frequency", "monetary_milli")
            for i, p in ((1, 0.25), (2, 0.5), (3, 0.75))
        ]
    )

    def quartile(col, prefix):
        return (
            F.lit(1)
            + (F.col(col) > F.col(f"{prefix}1")).cast("int")
            + (F.col(col) > F.col(f"{prefix}2")).cast("int")
            + (F.col(col) > F.col(f"{prefix}3")).cast("int")
        )

    return (
        u.crossJoin(F.broadcast(edges))
        .select(
            quartile("recency_us", "r").alias("r_quartile"),
            quartile("frequency", "f").alias("f_quartile"),
            quartile("monetary_milli", "m").alias("m_quartile"),
        )
        .groupBy("r_quartile", "f_quartile", "m_quartile")
        .agg(F.count("*").alias("n_users"))
    )


@register_extra(
    "q_hourly_mix_entropy",
    """WITH c AS (
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2
       ),
       h AS (SELECT hour, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1)
       SELECT c.hour, h.tot AS n_events,
              ROUND(-SUM((CAST(c.n AS DOUBLE) / h.tot)
                         * ln(CAST(c.n AS DOUBLE) / h.tot)) + 0.0, 6) AS mix_entropy
       FROM c JOIN h USING (hour)
       GROUP BY 1, 2""",
)
def q_hourly_mix_entropy(spark, sf_dir):
    """Hourly event-mix entropy: −Σ p ln p over each hour's
    event-type distribution — the mix-shift monitor (entropy collapse
    = one event type flooding the hour: an incident signature counts
    alone miss). Exact hourly counts, probabilities as exact-integer
    ratios, one ≤|types|-term log sum per hour rounded to 6; the
    ``+ 0.0`` normalizes the IEEE −0.0 a single-type hour produces
    (−(1·ln 1) negates a positive zero; engines disagree on printing
    the sign, surfaced by the sf0.001 sweep). Two
    grouped reductions + an hour-keyed join; nothing global."""
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(F.count("*").alias("n"))
    h = c.groupBy("hour").agg(F.sum("n").alias("tot"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.join(h, "hour")
        .groupBy("hour", "tot")
        .agg(F.round(-F.sum(p * F.log(p)) + F.lit(0.0), 6).alias("mix_entropy"))
        .select("hour", F.col("tot").alias("n_events"), "mix_entropy")
    )


@register_extra(
    "q_top_movers",
    """WITH d AS (
         SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                COUNT(*) AS n
         FROM events GROUP BY 1, 2
       ),
       delta AS (
         SELECT event_type, day, n,
                n - LAG(n) OVER (PARTITION BY event_type ORDER BY day) AS delta
         FROM d
       )
       SELECT event_type, day, n, delta
       FROM delta WHERE delta IS NOT NULL
       ORDER BY ABS(delta) DESC, event_type, day
       LIMIT 10""",
)
def q_top_movers(spark, sf_dir):
    """Top day-over-day volume movers: the 10 largest absolute daily
    count changes per event type — the triage view after an alert
    ("what actually jumped"). Exact integer counts and deltas from a
    per-type lag window over the day-cardinality series; the top-10
    is a TakeOrdered on the total order (|delta| desc, type, day) so
    the boundary cannot flap."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    delta = d.withColumn("delta", F.col("n") - F.lag("n").over(w)).filter(
        F.col("delta").isNotNull()
    )
    return (
        delta.orderBy(F.abs("delta").desc(), "event_type", "day")
        .limit(10)
        .select("event_type", "day", "n", "delta")
    )


@register_extra(
    "q_ship_delay_stats",
    """WITH d AS (
         SELECT o.o_orderpriority,
                date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
         FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       )
       SELECT o_orderpriority,
              COUNT(*) AS n_items,
              quantile_cont(CAST(delay_days AS DOUBLE), 0.5) AS p50_delay,
              quantile_cont(CAST(delay_days AS DOUBLE), 0.9) AS p90_delay,
              CAST(MAX(delay_days) AS BIGINT) AS max_delay
       FROM d GROUP BY 1""",
)
def q_ship_delay_stats(spark, sf_dir):
    """Shipping-delay distribution per order priority: exact integer
    day gaps (order date → line-item ship date) through the
    orders⨝lineitem equi-join, then count / exact interpolating
    p50/p90 / max per priority — the fulfillment-SLA profile, and the
    TPC-H-side exercise of the percentile parity (everything before
    the interpolation is integer). Join is unhinted (AQE broadcasts
    the orders side when it fits); the percentile state is per
    priority group."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    d = o.join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        "o_orderpriority",
        F.datediff("l_shipdate", "o_orderdate").alias("delay_days"),
    )
    return d.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.percentile(F.col("delay_days").cast("double"), F.lit(0.5)).alias("p50_delay"),
        F.percentile(F.col("delay_days").cast("double"), F.lit(0.9)).alias("p90_delay"),
        F.max("delay_days").cast("long").alias("max_delay"),
    )


@register_extra(
    "q_market_basket",
    """WITH items AS (
         SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
       ),
       pf AS (SELECT l_partkey, COUNT(*) AS n_orders FROM items GROUP BY 1),
       n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items),
       pairs AS (
         SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_pair
         FROM items a JOIN items b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
       )
       SELECT part_a, part_b, n_pair,
              ROUND(CAST(n_pair AS DOUBLE) * n.n_baskets
                    / (CAST(fa.n_orders AS DOUBLE) * fb.n_orders), 6) AS lift
       FROM pairs
       JOIN pf fa ON fa.l_partkey = part_a
       JOIN pf fb ON fb.l_partkey = part_b
       CROSS JOIN n
       ORDER BY n_pair DESC, part_a, part_b
       LIMIT 20""",
)
def q_market_basket(spark, sf_dir):
    """Market-basket co-occurrence: top-20 part pairs by basket count
    with lift = P(a,b)/(P(a)·P(b)) — association mining over orders
    (the collocations idea lifted from token bigrams to basket
    items). The self-join is keyed by ORDER (per-basket pair fan-out
    is bounded by basket size, ~7 items — never a parts×parts
    product); frequencies are exact ints, lift is one fixed IEEE
    expression over them, top-k is TakeOrdered on the total order
    (n_pair desc, a, b)."""
    items = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    pf = items.groupBy("l_partkey").agg(F.count("*").alias("n_orders"))
    n = items.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_pair"))
    )
    return (
        pairs.join(pf.select(F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("na")), "part_a")
        .join(pf.select(F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("nb")), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_pair",
            F.round(
                F.col("n_pair").cast("double") * F.col("n_baskets")
                / (F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("n_pair").desc(), "part_a", "part_b")
        .limit(20)
    )


@register_extra(
    "text_ngram_novelty",
    r"""WITH toks AS (
         SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
       ),
       sh AS (
         SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
         FROM (SELECT doc_id, t, unnest(generate_series(1, len(t)-2)) AS i
               FROM toks WHERE len(t) >= 3)
       ),
       df AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
       per AS (
         SELECT sh.doc_id,
                COUNT(*) AS n_shingles,
                CAST(SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
         FROM sh JOIN df USING (shingle) GROUP BY 1
       )
       SELECT d.doc_id,
              COALESCE(per.n_shingles, 0) AS n_shingles,
              COALESCE(per.n_unique, 0) AS n_unique,
              CAST(per.n_unique AS DOUBLE) / per.n_shingles AS novelty
       FROM documents d LEFT JOIN per USING (doc_id)""",
)
def text_ngram_novelty(spark, sf_dir):
    """Per-document 3-gram novelty: the fraction of a doc's DISTINCT
    shingles that appear in NO other document — the curation signal
    between exact dedup (novelty 0 for copies) and true originality
    (novelty → 1): boilerplate-heavy docs score low without being
    literal duplicates. Exact distinct-shingle sets and document
    frequencies (the decontamination reduction reused as a score);
    novelty is one exact-integer division, unrounded. Docs shorter
    than 3 tokens surface with zero shingles and NULL novelty."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", text.tokens_col(F.col("text")).alias("t"))
    sh = (
        toks.filter(F.size("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("t", i.cast("int")),
                        F.element_at("t", (i + 1).cast("int")),
                        F.element_at("t", (i + 2).cast("int")),
                    ),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    from .operators._caches import tracked_persist

    sh = tracked_persist(sh)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    per = (
        sh.join(dfreq, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("n_unique"),
        )
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_unique", F.lit(0)).alias("n_unique"),
        (F.col("n_unique").cast("double") / F.col("n_shingles")).alias("novelty"),
    )


@register_extra(
    "q_returns_by_brand",
    """SELECT p.p_brand,
              COUNT(*) AS n_items,
              CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_returned,
              CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
                / COUNT(*) AS return_rate
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       GROUP BY 1""",
)
def q_returns_by_brand(spark, sf_dir):
    """Return rate per part brand: lineitem ⨝ part (unhinted — AQE
    broadcasts the dimension), exact flag counts, one exact-integer
    division per brand (unrounded). The defect-rate-by-dimension
    shape every quality dashboard runs against a 100 TB fact: the
    dimension broadcasts, the fact never reshuffles except for the
    brand-keyed aggregate."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_returnflag")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    returned = F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
    return (
        l.join(p, l["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            returned.alias("n_returned"),
        )
        .select(
            "p_brand",
            "n_items",
            "n_returned",
            (F.col("n_returned").cast("double") / F.col("n_items")).alias("return_rate"),
        )
    )


@register_extra(
    "q_segment_revenue_share",
    """WITH seg AS (
         SELECT c.c_mktsegment,
                COUNT(*) AS n_orders,
                SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
         FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         GROUP BY 1
       ),
       t AS (SELECT SUM(rev) AS total FROM seg)
       SELECT seg.c_mktsegment, seg.n_orders,
              CAST(ROUND(seg.rev, 2) AS DOUBLE) AS revenue,
              CAST(seg.rev AS DOUBLE) / CAST(t.total AS DOUBLE) AS revenue_share
       FROM seg CROSS JOIN t""",
)
def q_segment_revenue_share(spark, sf_dir):
    """Revenue mix by market segment: exact DECIMAL money sums
    through the customer-dimension join (broadcast under AQE), then
    each segment's share of total as ONE double division of two exact
    decimals (identical cast-then-divide on both engines, no
    rounding on the ratio). The contribution-analysis shape every
    revenue dashboard runs — segment cardinality bounds everything
    after the join."""
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev"),
        )
    )
    t = seg.agg(F.sum("rev").alias("total"))
    return seg.crossJoin(F.broadcast(t)).select(
        "c_mktsegment",
        "n_orders",
        F.round("rev", 2).cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.col("total").cast("double")).alias(
            "revenue_share"
        ),
    )


@register_extra(
    "q_quality_length_rho",
    r"""WITH scored AS (
         SELECT 'all' AS g,
                ROUND(least(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) / 100.0, 1.0) * 0.5
                      + 0.3 * (1.0 - least(ROUND((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) * 1.0
                                                 / greatest(length(text), 1), 6) * 4, 1.0))
                      + 0.2 * least(ROUND(len(list_filter(string_split_regex(trim(text), '\s+'),
                                                          x -> lower(x) IN ('the','and','of','a','is'))) * 1.0
                                          / greatest(len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')), 1), 6) * 5, 1.0),
                      6) AS x,
                CAST(n_chars AS DOUBLE) AS y
         FROM documents
       ),
       r AS (
         SELECT g,
                RANK() OVER (PARTITION BY g ORDER BY x)
                  + (COUNT(*) OVER (PARTITION BY g, x) - 1) / 2.0 AS rx,
                RANK() OVER (PARTITION BY g ORDER BY y)
                  + (COUNT(*) OVER (PARTITION BY g, y) - 1) / 2.0 AS ry
         FROM scored
       ),
       a AS (
         SELECT g, COUNT(*) AS n,
                SUM(rx) AS sx, SUM(ry) AS sy, SUM(rx * ry) AS sxy,
                SUM(rx * rx) AS sxx, SUM(ry * ry) AS syy
         FROM r GROUP BY 1
       )
       SELECT n,
              (n * sxy - sx * sy)
                / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rho
       FROM a""",
)
def q_quality_length_rho(spark, sf_dir):
    """Is the quality score just a length proxy? Spearman rho between
    each document's quality_score and its n_chars — the self-audit a
    curation pipeline runs before gating on a score (rho ≈ 1 means
    the 'quality' gate is a length gate wearing a costume). Composes
    the quality formula (text.with_quality_score, replayed verbatim
    in the oracle as in pipeline_filter_dedup) with the GLOBAL
    Spearman (profiling.spearman_global — distinct-value cumsum
    midranks; a constant-key grouped window optimizes into the
    single-task corpus sort the plan linter rightly flagged on this
    entry's first draft, so the global variant exists now)."""
    from .operators import profiling

    scored = text.with_quality_score(_t(spark, sf_dir, "documents")).select(
        F.col("quality_score").alias("x"),
        F.col("n_chars").cast("double").alias("y"),
    )
    return profiling.spearman_global(scored, "x", "y")


@register_extra(
    "dedup_cluster_sizes",
    f"""WITH clusters AS ({_CLUSTERS_SQL}),
       sizes AS (SELECT cluster_id, COUNT(*) AS sz FROM clusters GROUP BY 1)
       SELECT sz AS cluster_size,
              COUNT(*) AS n_clusters,
              CAST(SUM(sz) AS BIGINT) AS n_docs
       FROM sizes GROUP BY 1""",
)
def dedup_cluster_sizes(spark, sf_dir):
    """Duplicate-family size distribution: how many near-dup clusters
    of each size exist and how many documents they hold — the
    blast-radius histogram that decides between keep-one dedup (many
    small families) and source-level remediation (one giant family =
    a template/mirror problem upstream). Derived from the SAME
    df-capped pair graph + connected components as dedup_clusters
    (the oracle replays pairs, the recursive-CTE labeling, AND the
    histogram); exact integer counts end to end."""
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.5, max_df=100
    )
    clusters = dedup.duplicate_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").alias("n_clusters"),
        F.sum("sz").alias("n_docs"),
    )


@register_extra(
    "text_langid_confusion",
    """WITH toks AS (
         SELECT lang, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
       ), scores AS (
         SELECT lang,
                len(list_filter(t, x -> x IN ('der','die','und','das','ist'))) AS s_de,
                len(list_filter(t, x -> x IN ('the','and','of','a','is'))) AS s_en,
                len(list_filter(t, x -> x IN ('el','la','de','los','es'))) AS s_es,
                len(list_filter(t, x -> x IN ('le','la','et','les','est'))) AS s_fr
         FROM toks
       ), pred AS (
         SELECT lang,
                CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                     WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                     WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                     WHEN s_es >= s_fr THEN 'es'
                     ELSE 'fr' END AS lang_pred
         FROM scores
       )
       SELECT lang, lang_pred, COUNT(*) AS n,
              CAST(SUM(CASE WHEN lang = lang_pred THEN COUNT(*) ELSE 0 END)
                   OVER () AS DOUBLE)
                / SUM(COUNT(*)) OVER () AS overall_accuracy
       FROM pred GROUP BY 1, 2""",
)
def text_langid_confusion(spark, sf_dir):
    """Language-ID confusion matrix: the marker-based with_lang_id
    predictions cross-tabulated against the table's labeled lang,
    with the overall accuracy repeated on every cell — the
    honest-evaluation view of our own classifier (the driver row
    text_langid checks the predictions; this measures them). Exact
    counts; accuracy is one exact-integer division; the windows run
    over the ≤25-cell confusion table, not the corpus."""
    from pyspark.sql import Window

    pred = text.with_lang_id(_t(spark, sf_dir, "documents")).select("lang", "lang_pred")
    cells = pred.groupBy("lang", "lang_pred").agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    correct = F.sum(
        F.when(F.col("lang") == F.col("lang_pred"), F.col("n")).otherwise(F.lit(0))
    ).over(w)
    total = F.sum("n").over(w)
    return cells.select(
        "lang",
        "lang_pred",
        "n",
        (correct.cast("double") / total).alias("overall_accuracy"),
    )


@register_extra(
    "q_peak_to_average",
    """WITH h AS (
         SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
                COUNT(*) AS n
         FROM events GROUP BY 1
       )
       SELECT COUNT(*) AS n_hours,
              CAST(SUM(n) AS BIGINT) AS n_events,
              CAST(MAX(n) AS BIGINT) AS peak_hour_events,
              CAST(MAX(n) AS DOUBLE) * COUNT(*) / SUM(n) AS peak_to_avg
       FROM h""",
)
def q_peak_to_average(spark, sf_dir):
    """Peak-to-average hourly load: max hourly event count over the
    mean — the capacity-planning scalar (provision for peak, bill for
    average; a ratio near 1 wants steady capacity, a high one wants
    elasticity). Exact hourly counts; the ratio is max·hours/total
    with ONE double expression written identically on both engines."""
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n")
    )
    return h.agg(
        F.count("*").alias("n_hours"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("peak_hour_events"),
        (F.max("n").cast("double") * F.count("*") / F.sum("n")).alias("peak_to_avg"),
    )


@register(
    "store_rollup_serve",
    """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
                         CAST(value AS DECIMAL(20,6)) AS v
                  FROM events WHERE event_id < 3000)
       SELECT event_type,
              CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
              COUNT(*) AS n,
              CAST(ROUND(SUM(v), 6) AS DOUBLE) AS total
       FROM e GROUP BY 1, 2""",
)
def store_rollup_serve(spark, sf_dir):
    """A collection aggregate answered FROM a catalog-registered
    rollup MV (store/rollups.py) — the continuous-aggregate face of
    the store, served through the planner route the way sorted-MV
    indexes serve filtered reads. The entry is PLAN-ASSERTED: it
    ingests most of the subset, registers a day rollup
    (INDEXING→NORMAL lifecycle), writes the remainder as per-item
    PUTs, then requires aggregate() to route source="rollup" with
    refresh_mode="merged" — proving the stale MV was brought current
    by the delta-bounded insert-only merge (feed-classified), not a
    rebuild, and that the merged MV equals the oracle's plain
    aggregate over the full subset. At scale the refresh exchange is
    bounded by the delta and touched buckets; untouched buckets pass
    through the merge without re-aggregation."""
    import tempfile

    from .store import DocumentStore

    st = DocumentStore(tempfile.mkdtemp(prefix="hs_rollup_"), spark=spark)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .withColumn("item", F.lpad(F.col("event_id").cast("string"), 10, "0"))
        .select("event_id", "ts", "event_type", "value", "item")
    )
    st.ingest_collection(ev.filter(F.col("event_id") % 100 != 7), "events~", "item")
    st.create_rollup(
        "events~",
        "ts",
        ["event_type"],
        "value",
        resolution="day",
        schema="event_id long, ts timestamp, event_type string, value double",
    )
    for r in ev.filter(F.col("event_id") % 100 == 7).collect():
        st.put(
            f"events~/{r.item}",
            {
                "event_id": r.event_id,
                "ts": str(r.ts),
                "event_type": r.event_type,
                "value": r.value,
            },
        )
    df, route = st.aggregate("events~", "ts", ["event_type"], "value", resolution="day")
    if route.source != "rollup" or route.refresh_mode != "merged":
        raise RuntimeError(f"expected a merged rollup route, got {route!r}")
    # the MV's exact decimal(38,6) total is canonicalized to
    # ROUND(dec, 6)::DOUBLE in the final projection — the catalog's
    # no-DECIMAL-output rule (q1's documented pattern; enforced
    # mechanically by tools/check_oracles.spark_decimal_violations)
    return df.select(
        "event_type",
        "bucket_start",
        "n",
        F.round(F.col("total"), 6).cast("double").alias("total"),
    )


@register_extra(
    "q_map_functions",
    """WITH c AS (
         SELECT user_id, event_type, COUNT(*) AS n
         FROM events GROUP BY 1, 2
       )
       SELECT user_id,
              COUNT(*) AS n_types,
              CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), 0)
                   AS BIGINT) AS clicks,
              CAST(SUM(n) AS BIGINT) AS total_events
       FROM c GROUP BY 1
       HAVING user_id < 50""",
)
def q_map_functions(spark, sf_dir):
    """MapType column surface: per user, build event_type→count as a
    real MAP (map_from_entries over collected structs), then read it
    back through the map API — map_keys size, element_at point lookup
    (NULL-safe via coalesce), and an aggregate over map_values. The
    oracle computes identical values map-free (MAX(CASE) pivot), so
    the map construction/lookup round-trip is value-checked rather
    than trusted. Maps stay inside one groupBy's rows — no shuffle
    beyond the count aggregation itself."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("by_type")
    )
    return m.select(
        "user_id",
        F.size(F.map_keys(F.col("by_type"))).cast("long").alias("n_types"),
        F.coalesce(F.element_at(F.col("by_type"), "click"), F.lit(0)).alias("clicks"),
        F.aggregate(
            F.map_values(F.col("by_type")), F.lit(0).cast("long"), lambda a, v: a + v
        ).alias("total_events"),
    )


@register(
    "q_unpivot_metrics",
    """WITH m AS (
         SELECT 'quantity' AS metric, CAST(l_quantity AS DECIMAL(18,2)) AS v FROM lineitem
         UNION ALL
         SELECT 'extendedprice', CAST(l_extendedprice AS DECIMAL(18,2)) FROM lineitem
         UNION ALL
         SELECT 'discount', CAST(l_discount AS DECIMAL(18,2)) FROM lineitem
         UNION ALL
         SELECT 'tax', CAST(l_tax AS DECIMAL(18,2)) FROM lineitem
       )
       SELECT metric, COUNT(*) AS n,
              CAST(ROUND(SUM(v), 2) AS DOUBLE) AS total
       FROM m GROUP BY 1""",
)
def q_unpivot_metrics(spark, sf_dir):
    """Wide→long reshape (UNPIVOT/melt — the inverse of the pivot the
    catalog already covers): four lineitem measures melt into
    (metric, value) rows, then aggregate per metric with exact DECIMAL
    sums. Spark's native ``DataFrame.unpivot`` is an Expand node —
    row-multiplying but shuffle-free, the right physical shape (the
    UNION-ALL oracle form would scan the fact once per measure). The
    melt-then-aggregate is the standard metrics-normalization step in
    telemetry pipelines."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(18,2)").alias("quantity"),
        F.col("l_extendedprice").cast("decimal(18,2)").alias("extendedprice"),
        F.col("l_discount").cast("decimal(18,2)").alias("discount"),
        F.col("l_tax").cast("decimal(18,2)").alias("tax"),
    )
    melted = li.unpivot(
        [], ["quantity", "extendedprice", "discount", "tax"], "metric", "v"
    )
    # exact DECIMAL(28,2) sums internally; the projection canonicalizes
    # to ROUND(dec,2)::DOUBLE per the no-DECIMAL-output rule (the scaled
    # int fits 2^53 at every gate SF, so the nearest double is the same
    # bit pattern in both engines)
    return melted.groupBy("metric").agg(
        F.count("*").alias("n"),
        F.round(F.sum("v"), 2).cast("double").alias("total"),
    )


@register_extra(
    "ts_seasonality_profile",
    """WITH cells AS (
         SELECT dayofweek(CAST(ts AS TIMESTAMP)) + 1 AS dow,
                hour(CAST(ts AS TIMESTAMP)) AS hod,
                COUNT(*) AS n
         FROM events GROUP BY 1, 2
       ),
       t AS (SELECT SUM(n) AS tt, COUNT(*) AS c FROM cells)
       SELECT dow, hod, n,
              ROUND(CAST(n * c AS DOUBLE) / tt, 6) AS seasonal_index
       FROM cells, t""",
)
def ts_seasonality_profile(spark, sf_dir):
    """Weekly seasonality of event volume
    (operators/timeseries.py:seasonality_profile): per observed
    (day-of-week, hour-of-day) cell, count + index over the mean cell
    — WHERE in the week the load lives, the placement complement of
    q_peak_to_average's peakiness scalar. The corpus reduces to ≤168
    cells in one partial-agg shuffle; the oracle adds 1 to DuckDB's
    0-based Sunday to match Spark's 1-based convention."""
    from .operators import timeseries as ts_ops

    return ts_ops.seasonality_profile(_t(spark, sf_dir, "events"))


@register_extra(
    "dedup_fuzzy_keys",
    _FASTSS_SQL,
)
def dedup_fuzzy_keys(spark, sf_dir):
    """Fuzzy-key entity resolution (operators/dedup.py:
    fuzzy_key_pairs): all customer pairs whose NAMES sit within edit
    distance 1, via FastSS deletion-neighborhood blocking — the
    scalable fuzzy join (complete candidate generation from an
    equi-join on O(len) variants per key, exact levenshtein verify on
    candidates only, df-capped blocks, never a cross join). The
    entity-resolution face of the dedup family: near-identical KEYS
    rather than near-identical documents. All-integer output; the
    oracle replays neighborhoods + cap + verify end-to-end."""
    return dedup.fuzzy_key_pairs(
        _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 1500),
        key_col="c_name",
        id_col="c_custkey",
    )



def _trade_edges(spark, sf_dir, custkey_lt: int = 500):
    """Symmetric customer↔supplier trade edges ("c<key>"/"s<key>"
    nodes, custkey < ``custkey_lt``) — ONE construction shared by
    every graph entry over this graph so a scope tweak can never
    desynchronize an entry from its oracle's ce CTE (the six entries
    previously each carried a verbatim copy)."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < custkey_lt)
    li = _t(spark, sf_dir, "lineitem")
    ce = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return ce.unionByName(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _copurchase_edges(spark, sf_dir, partkey_lt: int = 300):
    """Undirected co-purchase edges: parts shipping in the same order
    (partkey < ``partkey_lt``), canonical src < dst — shared by the
    link-prediction and k-core entries (same de-duplication rationale
    as :func:`_trade_edges`)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < partkey_lt)
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v"))
    return (
        a.join(b, "ok")
        .filter(F.col("u") < F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
    )


_PAGERANK_D = 0.85
# cross-engine source bucket for the two-level pagerank fold: 13 hex
# digits of md5 of the string id, mod 32 — MUST equal graph.pagerank's
# default hub_buckets and its Spark expression (conv(substr(md5,1,13)))
_PR_BUCKET_OF = (
    "CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 13))::UBIGINT % 32 AS INTEGER)"
)
_PAGERANK_SQL = f"""
WITH RECURSIVE ce AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_custkey < 500
),
-- DISTINCT over UNION ALL, never a bare UNION: inside WITH RECURSIVE
-- DuckDB gives every two-branch-UNION CTE recursive working-table
-- semantics and SKIPS the dedup (measured: nodes read 64,504 instead
-- of 600, silently rescaling every rank)
e AS (SELECT DISTINCT * FROM (SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce)),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
e2 AS (
  SELECT e.src, e.dst, CAST(1 AS DOUBLE) AS w, COALESCE(deg.d, 1) AS d,
         {_PR_BUCKET_OF.format(col='e.src')} AS b
  FROM e LEFT JOIN deg ON deg.src = e.src
  UNION ALL
  SELECT node, node, CAST(0 AS DOUBLE), COALESCE(deg.d, 1),
         {_PR_BUCKET_OF.format(col='node')}
  FROM nodes LEFT JOIN deg ON deg.src = nodes.node
),
pr(it, node, val) AS (
  SELECT 0, node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) FROM nodes
  UNION ALL
  SELECT x.it + 1, x.dst,
         (CAST(1 AS DOUBLE) - CAST('{_PAGERANK_D!r}' AS DOUBLE)) / (SELECT n FROM nn)
         + CAST('{_PAGERANK_D!r}' AS DOUBLE) * x.s
  FROM (
    -- two-level pinned fold (graph.pagerank exact mode): per-bucket
    -- source-id-sorted partials, then bucket-sorted final fold
    SELECT it, dst,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_sort(list({{'b': b, 's': sb}})), t -> t.s)),
             (a, v) -> a + v) AS s
    FROM (
      SELECT pr.it AS it, e2.dst AS dst, e2.b AS b,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_sort(list({{'u': e2.src, 'c': e2.w * pr.val / e2.d}})),
                              t -> t.c)),
               (a, v) -> a + v) AS sb
      FROM pr JOIN e2 ON e2.src = pr.node
      WHERE pr.it < 8
      GROUP BY pr.it, e2.dst, e2.b
    )
    GROUP BY it, dst
  ) x
)
SELECT node, val AS pr FROM pr WHERE it = 8
ORDER BY pr DESC, node LIMIT 20
"""


@register("graph_pagerank", _PAGERANK_SQL)
def graph_pagerank(spark, sf_dir):
    """PageRank (operators/graph.py:pagerank) — the crawl-graph
    quality signal, run over the customer↔supplier trade graph
    (distinct orders⋈lineitem pairs, both directions, custkey<500
    scope): top-20 nodes after 8 synchronous iterations. The oracle
    replays the identical iteration as a DuckDB recursive CTE —
    per-node contribution sums fold in pinned source-id order in BOTH
    engines (never a re-associating SUM over doubles), constants
    enter through the same repr literals, so ranks are bit-identical
    and the final ordering cannot diverge. Scale: edge-partitioned
    join + grouped fold per iteration, driver holds two scalars —
    the textbook distributed PageRank; graph work beyond connected
    components (dedup_clusters) enters the catalog here."""
    from .operators import graph as graph_ops

    edges = _trade_edges(spark, sf_dir)
    ranks = graph_ops.pagerank(edges, damping=_PAGERANK_D, iters=8)
    return (
        ranks.select("node", F.col("val").alias("pr"))
        .orderBy(F.col("pr").desc(), "node")
        .limit(20)
    )


_WEIGHTED_PR_SQL = """
WITH RECURSIVE ce AS (
  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS src,
         's' || CAST(l_suppkey AS VARCHAR) AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_custkey < 500
  GROUP BY 1, 2
),
e AS (SELECT src, dst, w FROM ce UNION ALL SELECT dst, src, w FROM ce),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
deg AS (SELECT src, SUM(w) AS d FROM e GROUP BY 1),
e2 AS (
  SELECT e.src, e.dst, e.w, COALESCE(deg.d, CAST(1 AS DOUBLE)) AS d,
         __B_SRC__ AS b
  FROM e LEFT JOIN deg ON deg.src = e.src
  UNION ALL
  SELECT node, node, CAST(0 AS DOUBLE), COALESCE(deg.d, CAST(1 AS DOUBLE)),
         __B_NODE__
  FROM nodes LEFT JOIN deg ON deg.src = nodes.node
),
pr(it, node, val) AS (
  SELECT 0, node, CAST(1 AS DOUBLE) / (SELECT n FROM nn) FROM nodes
  UNION ALL
  SELECT x.it + 1, x.dst,
         (CAST(1 AS DOUBLE) - CAST('__D__' AS DOUBLE)) / (SELECT n FROM nn)
         + CAST('__D__' AS DOUBLE) * x.s
  FROM (
    SELECT it, dst,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_sort(list({'b': b, 's': sb})), t -> t.s)),
             (a, v) -> a + v) AS s
    FROM (
      SELECT pr.it AS it, e2.dst AS dst, e2.b AS b,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_sort(list({'u': e2.src, 'c': e2.w * pr.val / e2.d})),
                              t -> t.c)),
               (a, v) -> a + v) AS sb
      FROM pr JOIN e2 ON e2.src = pr.node
      WHERE pr.it < 8
      GROUP BY pr.it, e2.dst, e2.b
    )
    GROUP BY it, dst
  ) x
)
SELECT node, val AS pr FROM pr WHERE it = 8
ORDER BY pr DESC, node LIMIT 20
""".replace("__D__", repr(_PAGERANK_D)).replace(
    "__B_SRC__", _PR_BUCKET_OF.format(col="e.src")
).replace("__B_NODE__", _PR_BUCKET_OF.format(col="node"))


@register_extra("graph_pagerank_weighted", _WEIGHTED_PR_SQL)
def graph_pagerank_weighted(spark, sf_dir):
    """Weighted PageRank (operators/graph.py:pagerank with
    ``weight_col``) — each customer's mass splits across suppliers
    proportionally to TRADE VOLUME (lineitem rows per pair), the
    volume-weighted importance signal rather than the mere-existence
    one. Weights are integer-valued (counts), so the per-src weight
    sums are exact in any order and the single division per edge
    keeps the bit-exact contract; the oracle replays the weighted
    iteration as a recursive CTE."""
    from .operators import graph as graph_ops

    o = _t(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    li = _t(spark, sf_dir, "lineitem")
    ce = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    edges = ce.unionByName(
        ce.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    )
    ranks = graph_ops.pagerank(edges, damping=_PAGERANK_D, iters=8, weight_col="w")
    return (
        ranks.select("node", F.col("val").alias("pr"))
        .orderBy(F.col("pr").desc(), "node")
        .limit(20)
    )


@register_extra(
    "graph_label_propagation",
    """WITH RECURSIVE ce AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_custkey < 500
),
seeds AS (
  SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node, r_name AS label
  FROM supplier JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey
  WHERE s_suppkey % 2 = 0
),
e AS (SELECT DISTINCT * FROM (
  SELECT src, dst FROM ce
  UNION ALL SELECT dst, src FROM ce
  UNION ALL SELECT node, node FROM seeds
)),
lab(it, node, label) AS (
  SELECT 0, node, label FROM seeds
  UNION ALL
  SELECT x.it + 1, x.node, COALESCE(s.label, x.vote)
  FROM (
    SELECT it, node, (MIN(struct_pack(nc := -cnt, lab := label))).lab AS vote
    FROM (
      SELECT l.it AS it, e.dst AS node, l.label AS label, COUNT(*) AS cnt
      FROM lab l JOIN e ON e.src = l.node
      WHERE l.it < 4
      GROUP BY 1, 2, 3
    )
    GROUP BY it, node
  ) x
  LEFT JOIN seeds s ON s.node = x.node
)
SELECT node, label FROM lab WHERE it = 4""",
)
def graph_label_propagation(spark, sf_dir):
    """Semi-supervised label propagation
    (operators/graph.py:label_propagation): HALF the suppliers are
    seeded with their nation's REGION name, then four synchronous
    majority votes spread the labels across the trade graph —
    customers inherit the region their labeled suppliers concentrate
    in, and the label flows onward to the unseeded suppliers through
    them (the transfer-known-labels-to-near-neighbors curation
    recipe). Determinism is structural: integer vote counts, ties by
    lexicographically smallest label via a struct MIN both engines
    order identically, seeds clamped — no floating point anywhere.
    The oracle replays the full vote loop as a recursive CTE."""
    from .operators import graph as graph_ops

    edges = _trade_edges(spark, sf_dir)
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    sup = _t(spark, sf_dir, "supplier").filter(F.col("s_suppkey") % 2 == 0)
    seeds = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"),
            F.col("r_name").alias("label"),
        )
    )
    return graph_ops.label_propagation(edges, seeds, iters=4)


_PPR_SQL = f"""
WITH RECURSIVE ce AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
  WHERE o_custkey < 500
),
e AS (SELECT DISTINCT * FROM (SELECT src, dst FROM ce UNION ALL SELECT dst, src FROM ce)),
nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
e2 AS (
  SELECT e.src, e.dst, CAST(1 AS DOUBLE) AS w, COALESCE(deg.d, 1) AS d,
         {_PR_BUCKET_OF.format(col='e.src')} AS b
  FROM e LEFT JOIN deg ON deg.src = e.src
  UNION ALL
  SELECT node, node, CAST(0 AS DOUBLE), COALESCE(deg.d, 1),
         {_PR_BUCKET_OF.format(col='node')}
  FROM nodes LEFT JOIN deg ON deg.src = nodes.node
),
seeds AS (
  SELECT s.node FROM (
    SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node
    FROM supplier WHERE s_suppkey <= 10
  ) s WHERE s.node IN (SELECT node FROM nodes)
),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM seeds),
pr(it, node, val) AS (
  SELECT 0, n.node,
         CASE WHEN s.node IS NOT NULL
              THEN CAST(1 AS DOUBLE) / (SELECT n FROM ns)
              ELSE CAST(0 AS DOUBLE) END
  FROM nodes n LEFT JOIN seeds s ON s.node = n.node
  UNION ALL
  SELECT x.it + 1, x.dst,
         CASE WHEN s.node IS NOT NULL
              THEN (CAST(1 AS DOUBLE) - CAST('{_PAGERANK_D!r}' AS DOUBLE))
                   / (SELECT n FROM ns)
              ELSE CAST(0 AS DOUBLE) END
         + CAST('{_PAGERANK_D!r}' AS DOUBLE) * x.s
  FROM (
    SELECT it, dst,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(list_sort(list({{'b': b, 's': sb}})), t -> t.s)),
             (a, v) -> a + v) AS s
    FROM (
      SELECT pr.it AS it, e2.dst AS dst, e2.b AS b,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
               list_transform(list_sort(list({{'u': e2.src, 'c': e2.w * pr.val / e2.d}})),
                              t -> t.c)),
               (a, v) -> a + v) AS sb
      FROM pr JOIN e2 ON e2.src = pr.node
      WHERE pr.it < 8
      GROUP BY pr.it, e2.dst, e2.b
    )
    GROUP BY it, dst
  ) x
  LEFT JOIN seeds s ON s.node = x.dst
)
SELECT node, val AS pr FROM pr WHERE it = 8
ORDER BY pr DESC, node LIMIT 20
"""


@register_extra("graph_pagerank_personalized", _PPR_SQL)
def graph_pagerank_personalized(spark, sf_dir):
    """Personalized PageRank (operators/graph.py:pagerank with
    ``seeds``) — the quality-PROPAGATION face of the graph signal:
    the walk restarts only at a trusted seed set (suppliers 1–10
    here), so every other node's rank measures how strongly the link
    structure ties it to the seeds — the standard
    seed-known-good-then-propagate curation recipe. Same bit-exact
    discipline as graph_pagerank (pinned-order folds, shared repr
    literals, seed-conditional teleport is one CASE both engines
    evaluate identically); oracle replays the full personalized
    iteration as a recursive CTE."""
    from .operators import graph as graph_ops

    edges = _trade_edges(spark, sf_dir)
    seeds = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") <= 10)
        .select(F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node"))
    )
    ranks = graph_ops.pagerank(edges, damping=_PAGERANK_D, iters=8, seeds=seeds)
    return (
        ranks.select("node", F.col("val").alias("pr"))
        .orderBy(F.col("pr").desc(), "node")
        .limit(20)
    )


@register_extra(
    "ts_cusum_changepoint",
    """WITH daily AS (
         SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
                COUNT(*) AS x
         FROM events GROUP BY 1
       ),
       pre AS (
         SELECT day, x,
                SUM(x) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS p,
                ROW_NUMBER() OVER (ORDER BY day) AS i
         FROM daily
       ),
       t AS (SELECT SUM(x) AS total, COUNT(*) AS n_days FROM daily),
       scored AS (
         SELECT day, p, i, total, n_days,
                abs(CAST(n_days AS HUGEINT) * p - CAST(i AS HUGEINT) * total) AS score
         FROM pre, t
       )
       SELECT day AS change_day,
              CAST(n_days AS BIGINT) AS n_days,
              CAST(total AS BIGINT) AS total,
              CAST(score AS BIGINT) AS scaled_score,
              ROUND(CAST(p AS DOUBLE) / i, 6) AS mean_before,
              ROUND(CASE WHEN n_days > i
                         THEN CAST(total - p AS DOUBLE) / (n_days - i) END,
                    6) AS mean_after
       FROM scored
       ORDER BY score DESC, day ASC LIMIT 1""",
)
def ts_cusum_changepoint(spark, sf_dir):
    """Level-shift changepoint of the daily event series
    (operators/timeseries.py:cusum_changepoint) — the at-most-one-
    change CUSUM estimator, argmax |n·P_i − i·total| with an
    earliest-day tie-break. The argmax statistic is EXACT integer
    arithmetic (decimal(38,0) products on the Spark side, HUGEINT in
    the oracle — n·P is corpus²-magnitude and would wrap int64
    silently), so both engines pick the identical day; the two
    segment means are one rounded double division each. Completes the
    series-diagnostics trio: seasonality (where load lives), lag-ACF
    (is it stationary), CUSUM (did the level shift)."""
    from .operators import timeseries as ts_ops

    return ts_ops.cusum_changepoint(_t(spark, sf_dir, "events"))


@register_extra(
    "ts_lag_autocorrelation",
    """WITH d AS (
         SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
                COUNT(*) AS n
         FROM events GROUP BY 1
       ),
       p AS (
         SELECT a.n AS x, b.n AS y
         FROM d a JOIN d b ON b.day = a.day + INTERVAL 1 DAY
       ),
       s AS (
         SELECT COUNT(*) AS np, SUM(x) AS sx, SUM(y) AS sy,
                SUM(x*y) AS sxy, SUM(x*x) AS sxx, SUM(y*y) AS syy
         FROM p
       )
       SELECT CAST(np AS BIGINT) AS n_pairs,
              ROUND(CAST(np*sxy - sx*sy AS DOUBLE)
                    / (sqrt(CAST(np*sxx - sx*sx AS DOUBLE))
                       * sqrt(CAST(np*syy - sy*sy AS DOUBLE))), 6) AS acf
       FROM s""",
)
def ts_lag_autocorrelation(spark, sf_dir):
    """Lag-1 autocorrelation of the daily event-count series
    (operators/timeseries.py:lag_autocorrelation) — the stationarity
    gate before trusting trend/anomaly thresholds on the series.
    Daily counts are exact integers, Pearson's sums accumulate in
    decimal(38,0) (counts² pass int64 at corpus scale), and both
    engines close with the identical IEEE expression; the lag pairing
    is a calendar-sized self-equi-join on day+1."""
    from .operators import timeseries as ts_ops

    return ts_ops.lag_autocorrelation(_t(spark, sf_dir, "events"))


_LEAKAGE_SPLIT_SQL = f"""
WITH clusters AS ({_CLUSTERS_SQL}),
canon AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN clusters c USING (doc_id)
),
draws AS (
  SELECT doc_id, canonical_id,
         (('0x' || substr(md5(CAST(canonical_id AS VARCHAR)), 1, 13))::UBIGINT::DOUBLE
          + 0.5) / 4503599627370496.0 AS u
  FROM canon
)
SELECT doc_id, canonical_id,
       CASE WHEN u < 0.8 THEN 'train'
            WHEN u < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM draws
"""


_LEAKAGE_KFOLD_SQL = f"""
WITH clusters AS ({_CLUSTERS_SQL}),
canon AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS canonical_id
  FROM documents d LEFT JOIN clusters c USING (doc_id)
),
draws AS (
  SELECT doc_id, canonical_id,
         (('0x' || substr(md5(CAST(canonical_id AS VARCHAR)), 1, 13))::UBIGINT::DOUBLE
          + 0.5) / 4503599627370496.0 AS u
  FROM canon
)
SELECT doc_id, canonical_id,
       CAST(LEAST(FLOOR(u * 5), 4) AS INT) AS fold
FROM draws
"""


@register_extra("q_leakage_safe_kfold", _LEAKAGE_KFOLD_SQL)
def q_leakage_safe_kfold(spark, sf_dir):
    """Leakage-safe 5-fold cross-validation assignment
    (operators/sampling.py leakage_safe_kfold): near-duplicate
    families fold as UNITS via the canonical-id md5 uniform — the
    k-fold twin of q_leakage_safe_split sharing _canonical_ids (one
    family definition for both protocols) and _CLUSTERS_SQL (one
    recursive-CTE component replay). The one-ulp LEAST clamp on
    ⌊u·k⌋ is mirrored in both engines."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    return sampling.leakage_safe_kfold(docs, pairs, k=5)


@register("q_leakage_safe_split", _LEAKAGE_SPLIT_SQL)
def q_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split
    (operators/sampling.py:leakage_safe_split): near-duplicate
    families (connected components of the df-capped Jaccard pair
    graph — the dedup_clusters set) are assigned AS UNITS by hashing
    the family's canonical id, so a test document can never have a
    near-copy in train (the eval-inflation leak a per-document
    hash_split permits whenever splitting precedes dedup). The draw
    is the cross-engine md5 uniform, so the oracle replays the EXACT
    assignment: recursive-CTE components + the identical hex-prefix
    arithmetic — end-to-end over pairs, labeling, canonicalization,
    and thresholding."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_df=100)
    return sampling.leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


# The routed twins' oracles: the SAME split/kfold SQL with the
# df-capped pair CTE swapped for the uncapped exact set — the
# substitution keeps the oracles in lockstep the way _CLUSTERS_SQL
# shares _JACCARD_SQL. Valid for the MinHash-fed entries on the
# dedup_minhash_lsh argument: banding recall is 1.0 at the gate
# corpora and the verify step makes every emitted pair exact, so the
# routed pair set EQUALS the uncapped exact set and the component
# labels + md5 draws replay bit-for-bit.
_LEAKAGE_SPLIT_ROUTED_SQL = _LEAKAGE_SPLIT_SQL.replace(
    _JACCARD_SQL, _JACCARD_SQL_UNCAPPED
)
_LEAKAGE_KFOLD_ROUTED_SQL = _LEAKAGE_KFOLD_SQL.replace(
    _JACCARD_SQL, _JACCARD_SQL_UNCAPPED
)


@register_extra("q_leakage_kfold_routed", _LEAKAGE_KFOLD_ROUTED_SQL)
def q_leakage_kfold_routed(spark, sf_dir):
    """leakage_safe_kfold on the SCALE-PATH pair source — the k-fold
    face of q_leakage_split_routed (one family definition, both
    protocols): folds assigned over minhash_lsh_pairs families, oracle
    replayed over the uncapped exact pair set the LSH output equals at
    recall 1.0."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return sampling.leakage_safe_kfold(docs, pairs, k=5)


@register_extra("q_leakage_split_routed", _LEAKAGE_SPLIT_ROUTED_SQL)
def q_leakage_split_routed(spark, sf_dir):
    """q_leakage_safe_split on the SCALE-PATH pair source: the sf1
    smoke attributed the split family's 3.8-7.5× growth rows to the
    exact ngram pair graph they consume (SCALE.md) — this entry gates
    the production composition that avoids that region, feeding
    leakage_safe_split from minhash_lsh_pairs (banded candidates, no
    posting-list explosion) instead of ngram_jaccard_pairs. Oracle:
    the split replay over the UNCAPPED exact pair set, which the LSH
    output equals whenever banding recall is 1.0 (the dedup_minhash_lsh
    pin — any recall miss changes a family and goes red here too).
    Downstream of the pair source, nothing changes: components,
    canonical ids, and the md5 draw are the same code path the exact
    entry gates."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    return sampling.leakage_safe_split(
        docs, pairs, {"train": 0.8, "val": 0.1, "test": 0.1}
    )


@register(
    "store_rollup_quantile",
    """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
                         CAST(value AS DECIMAL(20,6)) AS v
                  FROM events WHERE event_id < 3000),
       b AS (SELECT event_type,
                    CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
                    COUNT(*) AS n,
                    (array_agg(v ORDER BY v))[CAST(ceil(0.5 * COUNT(*)) AS INTEGER)] AS p50x,
                    (array_agg(v ORDER BY v))[CAST(ceil(0.95 * COUNT(*)) AS INTEGER)] AS p95x
             FROM e GROUP BY 1, 2)
       SELECT event_type, bucket_start, n,
              CAST(p50x AS DOUBLE) AS p50, CAST(p95x AS DOUBLE) AS p95
       FROM b""",
)
def store_rollup_quantile(spark, sf_dir):
    """The quantile face of store-served rollups (round 9): the def
    carries sample_k — a bottom-k-by-hash sample of the value per
    bucket, the mergeable quantile substitute (rollup_mv sample face)
    now registered, refreshed, and served THROUGH the store catalog
    like the HLL-distinct and variance faces. PLAN-ASSERTED like its
    siblings: the stale MV must come current via the insert-only
    MERGE — proving the sample partials survive the delta merge, not
    a rebuild. With sample_k ≥ every bucket size the sample keeps ALL
    rows, so the served p50/p95 are EXACT positional quantiles
    (element at ceil(q·n), 1-indexed) and the DuckDB oracle replays
    the identical arithmetic; at production sizes the same machinery
    degrades gracefully to O(1/√k) estimates."""
    import tempfile

    from .store import DocumentStore

    st = DocumentStore(tempfile.mkdtemp(prefix="hs_rollup_q_"), spark=spark)
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 3000)
        .withColumn("item", F.lpad(F.col("event_id").cast("string"), 10, "0"))
        .select("event_id", "ts", "event_type", "value", "item")
    )
    st.ingest_collection(ev.filter(F.col("event_id") % 100 != 7), "events~", "item")
    st.create_rollup(
        "events~",
        "ts",
        ["event_type"],
        "value",
        resolution="day",
        schema="event_id long, ts timestamp, event_type string, value double",
        sample_k=2048,
    )
    for r in ev.filter(F.col("event_id") % 100 == 7).collect():
        st.put(
            f"events~/{r.item}",
            {
                "event_id": r.event_id,
                "ts": str(r.ts),
                "event_type": r.event_type,
                "value": r.value,
            },
        )
    df, route = st.aggregate(
        "events~", "ts", ["event_type"], "value", resolution="day", sample_k=2048
    )
    if route.source != "rollup" or route.refresh_mode != "merged":
        raise RuntimeError(f"expected a merged rollup route, got {route!r}")
    return df.select(
        "event_type",
        "bucket_start",
        "n",
        F.col("p50").cast("double").alias("p50"),
        F.col("p95").cast("double").alias("p95"),
    )


@register(
    "store_rollup_invalidate",
    """WITH e AS (SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
                         CAST(CASE WHEN event_id % 10 = 3
                                   THEN value + 1000 ELSE value END
                              AS DECIMAL(20,6)) AS v
                  FROM events WHERE event_id < 60)
       SELECT event_type,
              CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
              COUNT(*) AS n,
              CAST(ROUND(SUM(v), 6) AS DOUBLE) AS total
       FROM e GROUP BY 1, 2""",
)
def store_rollup_invalidate(spark, sf_dir):
    """The bucket-scoped invalidation refresh, plan-asserted: a
    per-item-API collection (its feed retains full history, the
    precondition store/rollups.py:_affected_groups proves) gets a day
    rollup, a deterministic slice of items is then PATCHED (+1000 on
    the value — the update class that can never merge additively), and
    the serve must take refresh_mode="invalidated": only the touched
    grain groups recompute, the rest of the MV passes through — and
    the result must equal the oracle's plain aggregate over the
    post-patch state. Complements store_rollup_serve (the insert-only
    "merged" route) so both non-trivial refresh tiers are value-gated."""
    import tempfile

    from .store import DocumentStore

    st = DocumentStore(tempfile.mkdtemp(prefix="hs_rollinv_"), spark=spark)
    rows = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") < 60)
        .select("event_id", "ts", "event_type", "value")
        .collect()
    )
    for r in rows:
        st.put(
            f"events~/{r.event_id:06d}",
            {"event_id": r.event_id, "ts": str(r.ts),
             "event_type": r.event_type, "value": r.value},
        )
    st.create_rollup(
        "events~", "ts", ["event_type"], "value", resolution="day",
        schema="event_id long, ts timestamp, event_type string, value double",
    )
    for r in rows:
        if r.event_id % 10 == 3:
            st.patch(f"events~/{r.event_id:06d}", {"value": r.value + 1000})
    df, route = st.aggregate("events~", "ts", ["event_type"], "value", resolution="day")
    if route.source != "rollup" or route.refresh_mode != "invalidated":
        raise RuntimeError(f"expected an invalidated rollup route, got {route!r}")
    # no-DECIMAL-output rule: exact decimal total → ROUND(dec,6)::DOUBLE
    return df.select(
        "event_type",
        "bucket_start",
        "n",
        F.round(F.col("total"), 6).cast("double").alias("total"),
    )



_LINK_PRED_SQL = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 300 AND b.l_partkey < 300
),
nbrs AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT u, COUNT(*) AS d FROM nbrs GROUP BY 1),
wedges AS (
  SELECT za.v AS a, zb.v AS b, za.u AS z, dz.d AS dz
  FROM nbrs za JOIN nbrs zb ON za.u = zb.u AND za.v < zb.v
  JOIN deg dz ON dz.u = za.u
),
cand AS (
  SELECT w.a, w.b, COUNT(*) AS cn,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(list_sort(list(struct_pack(z := w.z, dz := w.dz))),
                          t -> CAST(1 AS DOUBLE) / CAST(t.dz AS DOUBLE))),
           (acc, x) -> acc + x) AS ra_raw
  FROM wedges w
  ANTI JOIN e ON e.u = w.a AND e.v = w.b
  GROUP BY 1, 2
)
SELECT c.a, c.b, c.cn, da.d AS deg_a, db.d AS deg_b,
       ROUND(CAST(c.cn AS DOUBLE) / CAST(da.d + db.d - c.cn AS DOUBLE), 6) AS jaccard,
       ROUND(c.ra_raw, 6) AS ra
FROM cand c JOIN deg da ON da.u = c.a JOIN deg db ON db.u = c.b
ORDER BY c.cn DESC, c.a, c.b LIMIT 20
"""


@register_extra("graph_link_prediction", _LINK_PRED_SQL)
def graph_link_prediction(spark, sf_dir):
    """Link prediction over the co-purchase graph
    (operators/graph.py:link_scores): parts are linked when they ship
    in the same order (partkey < 300 bounds the projection), and the
    top-20 NOT-yet-linked pairs are ranked by common neighbors with
    jaccard and resource-allocation scores alongside — the
    find-what-the-dedup/link-graph-almost-says curation face next to
    triangle_stats' transitivity gap. cn/deg are integers; jaccard is
    one rounded division; RA folds 1/deg(z) in pinned common-neighbor
    order, each term a single correctly-rounded IEEE division, so the
    hash compare is exact. adamic_adar (ln-damped) stays OUT of the
    projection: Java Math.log and glibc ln disagree at the ulp on ~1%%
    of integer inputs (measured), so it is pytest-pinned instead —
    the documented cross-engine-transcendental rule."""
    from .operators import graph as graph_ops

    edges = _copurchase_edges(spark, sf_dir)
    return graph_ops.link_scores(edges, top_k=20).drop("adamic_adar")



_HOLT_WINTERS_SQL = """
WITH RECURSIVE base AS (
  SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
         CAST(SUM(CAST(value AS DECIMAL(20,6))) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
nb AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
              COUNT(*) OVER (PARTITION BY event_type) AS cnt
       FROM base),
init AS (
  SELECT event_type, cnt,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list(y ORDER BY rn) FILTER (rn <= 7)), (a, b) -> a + b) / 7.0 AS l0,
         list(y ORDER BY rn) FILTER (rn <= 7) AS y7
  FROM nb WHERE cnt >= 7 GROUP BY event_type, cnt
),
hw(event_type, rn, level, trend, seas) AS (
  SELECT event_type, 7, l0, CAST(0.0 AS DOUBLE),
         list_transform(y7, y -> y - l0)
  FROM init
  UNION ALL
  SELECT b.event_type, b.rn,
         0.5 * (b.y - h.seas[1]) + 0.5 * (h.level + h.trend),
         0.25 * ((0.5 * (b.y - h.seas[1]) + 0.5 * (h.level + h.trend)) - h.level)
           + 0.75 * h.trend,
         list_append(h.seas[2:],
           0.25 * (b.y - (0.5 * (b.y - h.seas[1]) + 0.5 * (h.level + h.trend)))
             + 0.75 * h.seas[1])
  FROM hw h JOIN nb b ON b.event_type = h.event_type AND b.rn = h.rn + 1
)
SELECT h.event_type, CAST(i.cnt AS BIGINT) AS n, h.level, h.trend,
       h.seas[1] AS s_next, h.level + h.trend + h.seas[1] AS forecast
FROM hw h JOIN init i ON h.event_type = i.event_type AND h.rn = i.cnt
"""


@register("ts_holt_winters", _HOLT_WINTERS_SQL)
def ts_holt_winters(spark, sf_dir):
    """Holt-Winters ADDITIVE-seasonal smoothing + one-step forecast
    per event type over the daily value series
    (operators/timeseries.py:holt_winters, m=7 weekly season) —
    ts_holt_forecast's big sibling: level AND trend AND a seasonal
    ring folded sequentially per key on the applyInPandas custom-
    operator path. α=0.5/β=0.25/γ=0.25 are exact binary fractions and
    the DuckDB oracle carries the 7-slot seasonal ring as a LIST
    through the recursive CTE (slice + append per step), replaying
    the identical IEEE operation order — the unrounded doubles match
    bit-for-bit, init mean included (left-to-right fold, not a
    re-associating SUM)."""
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(20,6)")).cast("double").alias("y"))
    )
    return timeseries.holt_winters(
        daily, ["event_type"], "day", "y",
        alpha=0.5, beta=0.25, gamma=0.25, period=7,
    ).orderBy("event_type")



_DSIR_CTES = r"""toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
), toks2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
rb AS (SELECT doc_id, CAST(('0x' || substring(md5(term),1,8)) AS UBIGINT) % 1024 AS bucket FROM toks2),
tgt AS (SELECT doc_id FROM documents WHERE lang = 'en'),
tb AS (SELECT bucket FROM rb WHERE doc_id IN (SELECT doc_id FROM tgt)),
tc AS (SELECT bucket, COUNT(*) AS ct FROM tb GROUP BY 1),
rc AS (SELECT bucket, COUNT(*) AS cr FROM rb GROUP BY 1),
tt AS (SELECT SUM(ct) AS tt FROM tc), rt AS (SELECT SUM(cr) AS rt FROM rc),
ratios AS (
  SELECT COALESCE(rc.bucket, tc.bucket) AS bucket,
         CAST(ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE) / CAST(tt + 1024 AS DOUBLE))
            - ln(CAST(COALESCE(cr, 0) + 1 AS DOUBLE) / CAST(rt + 1024 AS DOUBLE))
            AS DECIMAL(20,10)) AS lr
  FROM rc FULL JOIN tc ON rc.bucket = tc.bucket CROSS JOIN tt CROSS JOIN rt
),
scored AS (
  SELECT rb.doc_id, COUNT(*) AS n_tokens, SUM(lr) AS sum_lr
  FROM rb JOIN ratios USING (bucket) GROUP BY 1
),
dsir AS (
  SELECT doc_id, n_tokens, CAST(sum_lr AS DOUBLE) / n_tokens AS score
  FROM scored
)"""

_DSIR_SQL = (
    "WITH " + _DSIR_CTES
    + " SELECT doc_id, n_tokens, score FROM dsir"
    + " ORDER BY score DESC, doc_id LIMIT 200"
)


@register_extra("text_dsir_select", _DSIR_SQL)
def text_dsir_select(spark, sf_dir):
    """Domain-targeted data selection (operators/text.py:dsir_scores):
    the Moore-Lewis cross-entropy-difference selector in its DSIR
    hashed-unigram form — every document scored by the mean per-token
    log-likelihood ratio between a 1024-bucket hashed unigram model
    of the TARGET domain (the English slice here) and one of the raw
    corpus, head-200 selected by (score desc, doc_id). The feature
    exchanges are bucket-count-sized, the ratio table broadcasts, and
    the ordering is cross-engine total: md5-prefix buckets, per-token
    log-ratios quantized to DECIMAL(20,10) before the order-
    independent sum (char_lm's discipline), one IEEE division per
    doc. The oracle replays tokenization, hashing, smoothing, and the
    selection end-to-end."""
    docs = _t(spark, sf_dir, "documents")
    scored = text.dsir_scores(docs, docs.filter(F.col("lang") == "en"), n_buckets=1024)
    return scored.orderBy(F.col("score").desc(), "doc_id").limit(200)



_BPE_SQL = r"""
WITH RECURSIVE words0 AS (
  SELECT term AS w, COUNT(*) AS cnt FROM (
    SELECT unnest(string_split_regex(trim(text), '\s+')) AS term FROM documents
  ) WHERE term <> '' GROUP BY 1
),
bpe(it, w, cnt, s, ba, bb, bc) AS (
  -- every symbol is wrapped chr(31)...chr(31) on BOTH sides, so the
  -- replace() pattern is fully anchored: a right symbol that merely
  -- STARTS with b (e.g. [a, bc] under merge (a,b)) cannot match.
  -- A single-separator encoding had exactly that latent prefix bug —
  -- pinned by test_bpe_oracle_sql_prefix_adversarial.
  SELECT 0, w, cnt,
         chr(31) || array_to_string(list_transform(range(1, length(w) + 1), i -> w[i:i]),
                                    chr(31) || chr(31)) || chr(31),
         CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
  FROM words0
  UNION ALL
  SELECT it + 1, w, cnt,
         replace(s, chr(31) || best.a || chr(31) || chr(31) || best.b || chr(31),
                    chr(31) || best.a || best.b || chr(31)),
         best.a, best.b, -best.nc
  FROM (
    SELECT it, w, cnt, s, MIN(best1) OVER () AS best
    FROM (
      SELECT it, w, cnt, s,
             CASE WHEN pr.list_2 IS NOT NULL
                  THEN struct_pack(
                    nc := -SUM(cnt) OVER (PARTITION BY pr.list_1, pr.list_2),
                    a := pr.list_1, b := pr.list_2) END AS best1
      FROM (
        SELECT it, w, cnt, s,
               unnest(list_concat(
                 list_zip(syms, syms[2:]),
                 [CAST(NULL AS STRUCT(list_1 VARCHAR, list_2 VARCHAR))])) AS pr
        FROM (SELECT it, w, cnt, s,
                     string_split(s[2:length(s) - 1], chr(31) || chr(31)) AS syms
              FROM bpe WHERE it < 20)
      )
    )
    GROUP BY it, w, cnt, s, best1
  )
  WHERE best IS NOT NULL AND best.nc <= -2
  GROUP BY it, w, cnt, s, best
)
SELECT DISTINCT it AS rank, ba AS left_sym, bb AS right_sym, ba || bb AS merged, bc AS pair_count
FROM bpe WHERE it > 0
"""


@register("text_bpe_merges", _BPE_SQL)
def text_bpe_merges(spark, sf_dir):
    """Distributed BPE tokenizer TRAINING (operators/bpe.py:bpe_train,
    20 merges, min count 2): the learn-the-tokenizer step of an LLM
    pipeline, run on the corpus's WORD-FREQUENCY table so every round
    is vocabulary-sized regardless of corpus size — one pair-count
    aggregation, one TakeOrdered argmax with a (count desc, pair lex)
    tie-break, one JVM array-fold applying the merge greedily
    left-to-right. All-integer decisions: any engine replays training
    bit-identically, and the oracle replays the ENTIRE loop as a
    recursive CTE — each word's symbols ride as a string with every
    symbol chr(31)-wrapped on BOTH sides (fully anchored, so a right
    symbol that merely starts with the pattern cannot match) where
    SQL replace() IS the greedy non-overlapping merge,
    and the per-round argmax is a windowed min-struct over the
    exploded pair stream. Differentially pinned against a pure-Python
    Sennrich reference in pytest (training AND the encode-reproduces-
    final-state invariant). Round 11: the entry runs the BATCHED
    trainer (bpe_train_batched, ~round_size merges per distributed
    round, Sennrich's recompute-every-N variant made exact) — pinned
    bit-identical to bpe_train in pytest, and gated here against the
    same recursive-CTE oracle."""
    from .operators import bpe

    return bpe.bpe_train_batched(
        _t(spark, sf_dir, "documents"), n_merges=20, min_count=2, round_size=8
    ).orderBy("rank")



_ATTRIBUTION_SQL = """
WITH base AS (
  SELECT user_id AS u, event_id AS eid, event_type AS etype,
         epoch_us(CAST(ts AS TIMESTAMP)) AS ep,
         CASE WHEN event_type IN ('click','view') THEN event_type END AS tch
  FROM events
),
win AS (
  SELECT u, eid, etype,
         MIN(CASE WHEN tch IS NOT NULL THEN struct_pack(ep := ep, eid := eid, ch := tch) END)
           OVER w AS ft,
         MAX(CASE WHEN tch IS NOT NULL THEN struct_pack(ep := ep, eid := eid, ch := tch) END)
           OVER w AS lt,
         list_filter(list(tch) OVER w, x -> x IS NOT NULL) AS chs
  FROM base
  WINDOW w AS (PARTITION BY u ORDER BY ep RANGE BETWEEN 259200000000 PRECEDING AND CURRENT ROW)
),
convs AS (
  SELECT eid, COALESCE(ft.ch, '(direct)') AS first_ch,
         COALESCE(lt.ch, '(direct)') AS last_ch, chs
  FROM win WHERE etype = 'purchase'
),
credit AS (
  SELECT eid, t.ch AS ch, t.cnt AS cnt, t.n AS n
  FROM (
    SELECT eid, unnest(CASE WHEN len(chs) = 0
      THEN [struct_pack(ch := '(direct)', cnt := 1, n := 1)]
      ELSE list_transform(list_distinct(chs),
             c -> struct_pack(ch := c,
                              cnt := CAST(len(list_filter(chs, y -> y = c)) AS INT),
                              n := CAST(len(chs) AS INT))) END) AS t
    FROM convs
  )
),
lin AS (
  SELECT ch AS channel,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(list_sort(list(struct_pack(eid := eid, cnt := cnt, n := n))),
                          s -> CAST(s.cnt AS DOUBLE) / CAST(s.n AS DOUBLE))),
           (a, b) -> a + b) AS linear
  FROM credit GROUP BY 1
),
f AS (SELECT first_ch AS channel, COUNT(*) AS first_touch FROM convs GROUP BY 1),
l AS (SELECT last_ch AS channel, COUNT(*) AS last_touch FROM convs GROUP BY 1)
SELECT COALESCE(f.channel, l.channel, lin.channel) AS channel,
       CAST(COALESCE(first_touch, 0) AS BIGINT) AS first_touch,
       CAST(COALESCE(last_touch, 0) AS BIGINT) AS last_touch,
       ROUND(COALESCE(linear, 0.0), 6) AS linear
FROM f FULL JOIN l ON f.channel = l.channel
       FULL JOIN lin ON COALESCE(f.channel, l.channel) = lin.channel
"""


@register("q_attribution_models", _ATTRIBUTION_SQL)
def q_attribution_models(spark, sf_dir):
    """Multi-model marketing attribution
    (operators/funnel.py:attribution): every purchase credits its
    user's click/view touches inside a 3-day lookback under first-
    touch, last-touch, and linear models simultaneously; untouched
    conversions credit "(direct)", so every model column sums to the
    conversion count (the conservation invariant the pytest pins).
    NO self-join: one RANGE window per user over epoch MICROseconds
    carries the lookback; first/last are struct-min/max with the
    unique event id as tie-break, and linear credits fold per channel
    in pinned conversion-id order (one correctly-rounded IEEE
    division per term) — bit-exact cross-engine, the full window +
    fold replayed in the oracle."""
    return funnel.attribution(
        _t(spark, sf_dir, "events"),
        "purchase",
        ["click", "view"],
        lookback_seconds=3 * 86400,
    )



_KCORE_SQL = """
WITH RECURSIVE e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_partkey < 300 AND b.l_partkey < 300
),
sym0 AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
peel(it, u, v) AS (
  -- it < 60 bounds the recursion as a runaway guard, NOT semantics:
  -- the peel reaches its fixpoint when an iteration removes nothing,
  -- and the co-purchase graph peels in < 10 rounds at every gate SF
  -- (a pathological onion graph needing > 60 layers would diverge
  -- from the uncapped Spark operator — documented, unreachable here)
  SELECT 0, u, v FROM sym0
  UNION ALL
  SELECT it + 1, u, v FROM (
    SELECT p.it, p.u, p.v,
           COUNT(*) OVER (PARTITION BY p.it, p.u) AS du,
           COUNT(*) OVER (PARTITION BY p.it, p.v) AS dv,
           MIN(cnt_low) OVER (PARTITION BY p.it) AS any_low
    FROM (
      SELECT it, u, v,
             CASE WHEN MIN(c) OVER (PARTITION BY it) < 8 THEN 1 ELSE 0 END AS cnt_low
      FROM (SELECT it, u, v, COUNT(*) OVER (PARTITION BY it, u) AS c
            FROM peel WHERE it < 60)
    ) p
  ) WHERE du >= 8 AND dv >= 8 AND any_low = 1
),
last AS (
  SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS degree
  FROM peel WHERE it = (SELECT MAX(it) FROM peel)
  GROUP BY u
)
SELECT node, degree FROM last
WHERE (SELECT MIN(degree) FROM last) >= 8
"""


@register_extra("graph_kcore", _KCORE_SQL)
def graph_kcore(spark, sf_dir):
    """The 8-core of the co-purchase graph
    (operators/graph.py:kcore): iterative degree-peel to the unique
    fixpoint, (node, in-core degree) — the noise-robust dense heart
    of a link/near-dup graph, completing the graph family next to
    link prediction and the triangle census. Pure integer counting
    (the k-core is order-independent, so no tie-break is even
    needed); the oracle replays the peel as a recursive CTE whose
    per-iteration windowed degree test mirrors the batch-peel rounds,
    INCLUDING the empty-core fixpoint guard (an exhausted peel's last
    non-empty state is not a core — pytest-pinned). The oracle's
    recursion carries a 60-round runaway guard; the operator itself
    peels to the true fixpoint (gate graphs peel in < 10 rounds, so
    the guard is unreachable — noted in the SQL)."""
    from .operators import graph as graph_ops

    edges = _copurchase_edges(spark, sf_dir)
    return graph_ops.kcore(edges, k=8).orderBy("node")



@register_extra(
    "text_quality_model_contract",
    """SELECT CAST(COUNT(*) FILTER (doc_id % 2 = 0) AS BIGINT) AS n_train,
              CAST(COUNT(*) FILTER (doc_id % 2 = 1) AS BIGINT) AS n_test,
              true AS auc_ok, true AS scores_in_unit_interval,
              true AS both_classes_held_out
       FROM documents""",
)
def text_quality_model_contract(spark, sf_dir):
    """Model-based corpus filtering with a held-out quality gate
    (operators/text.py:quality_train/quality_score — the CCNet/
    FineWeb classifier-filter step): a fastText-style hashed-BoW
    logistic regression is trained on the even-doc_id half against a
    WEAK content label (≥3 occurrences of the token "slow" — the
    heuristic-teacher pattern; the synthetic corpus's lang/source
    metadata is deliberately textless, measured AUC 0.51, so a
    metadata label would gate nothing) and must rank the UNSEEN odd
    half at exact Mann-Whitney AUC > 0.95 (profiling.auc_binary,
    all-integer until one division), with every score inside (0,1)
    and both classes present held-out. Training is executor-side
    LBFGS over hashed features; scoring is one broadcast-coefficient
    scan. Booleans gate the contract because LBFGS float partials are
    legitimately ulp-unstable across engines — the integers (split
    sizes) are exact."""
    from .operators import profiling

    docs = _t(spark, sf_dir, "documents")
    toks = text.tokens_col(F.col("text"))
    labeled = docs.withColumn(
        "label",
        (F.size(F.filter(toks, lambda t: t == "slow")) >= 3).cast("double"),
    )
    train = labeled.filter(F.col("doc_id") % 2 == 0)
    test = labeled.filter(F.col("doc_id") % 2 == 1)
    model = text.quality_train(train, "label")
    scored = text.quality_score(test, model).select("doc_id", "label", "quality_p")
    auc_row = profiling.auc_binary(scored, "quality_p", "label")
    bounds = scored.agg(
        F.min("quality_p").alias("mn"),
        F.max("quality_p").alias("mx"),
        F.sum(F.col("label")).alias("pos"),
        F.count("*").alias("n"),
    )
    n_train = train.count()
    return (
        auc_row.crossJoin(F.broadcast(bounds))
        .select(
            F.lit(n_train).cast("long").alias("n_train"),
            F.col("n").cast("long").alias("n_test"),
            (F.col("auc") > 0.95).alias("auc_ok"),
            ((F.col("mn") > 0.0) & (F.col("mx") < 1.0)).alias(
                "scores_in_unit_interval"
            ),
            ((F.col("pos") > 0) & (F.col("pos") < F.col("n"))).alias(
                "both_classes_held_out"
            ),
        )
    )



_KCENTER_SQL = """
WITH RECURSIVE c0 AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  ORDER BY vec_id LIMIT 1
),
state(it, id, vec, dmin, bid, bd) AS (
  SELECT 0, e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(CAST(e.embedding AS DOUBLE[])) + 1),
             i -> (CAST(e.embedding AS DOUBLE[])[i] - (c0.v)[i])
                * (CAST(e.embedding AS DOUBLE[])[i] - (c0.v)[i]))),
           (a, b) -> a + b),
         c0.id, CAST(NULL AS DOUBLE)
  FROM embeddings e, c0
  UNION ALL
  SELECT it + 1, id, vec,
         LEAST(dmin,
           list_reduce(list_prepend(CAST(0 AS DOUBLE),
             list_transform(range(1, len(vec) + 1),
               i -> (vec[i] - (best.v)[i]) * (vec[i] - (best.v)[i]))),
             (a, b) -> a + b)),
         best.id, -best.nd
  FROM (
    SELECT it, id, vec, dmin,
           MIN(struct_pack(nd := -dmin, id := id, v := vec)) OVER () AS best
    FROM state WHERE it < 7
  )
)
SELECT 1 AS sel_rank, (SELECT id FROM c0) AS vec_id, CAST(NULL AS DOUBLE) AS radius
UNION ALL
SELECT it + 1, bid, bd FROM (SELECT DISTINCT it, bid, bd FROM state WHERE it > 0)
"""


@register("emb_kcenter_select", _KCENTER_SQL)
def emb_kcenter_select(spark, sf_dir):
    """Greedy k-center coreset selection
    (operators/similarity.py:kcenter_select, k=8): the farthest-point
    traversal picks the corpus's 8 most mutually distant embeddings —
    diversity sampling with a 2-approximation covering guarantee, the
    exemplar-picking counterpart to kmeans' density clustering.
    Squared L2 in PINNED element order means every arithmetic op is a
    correctly-rounded mul/add/sub, so the selection sequence AND the
    unrounded selection radii are bit-identical cross-engine; the
    oracle replays the whole traversal as a recursive CTE whose state
    carries each point's running distance-to-selected-set and whose
    per-round argmax is a windowed min-struct (id tie-break)."""
    return similarity.kcenter_select(
        _t(spark, sf_dir, "embeddings"), k=8
    ).orderBy("sel_rank")



_TARGETED_PIPELINE_SQL = (
    "WITH " + _DSIR_CTES + """,
sel AS (SELECT doc_id FROM dsir ORDER BY score DESC, doc_id LIMIT 300),
kept AS (SELECT d.* FROM documents d JOIN sel USING (doc_id)),
canonical AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
uniq AS (
  SELECT k.lang, k.doc_id,
         len(list_filter(string_split_regex(trim(k.text), '\\s+'), x -> x <> '')) AS n_toks,
         s.score
  FROM kept k JOIN canonical c ON k.doc_id = c.doc_id
              JOIN dsir s ON s.doc_id = k.doc_id
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       MIN(score) AS min_score, MAX(score) AS max_score
FROM uniq GROUP BY lang"""
)


@register_extra("pipeline_targeted_corpus", _TARGETED_PIPELINE_SQL)
def pipeline_targeted_corpus(spark, sf_dir):
    """Round-10 composition in ONE Catalyst plan: DSIR importance
    scoring against the English target (text.dsir_scores) → top-300
    selection → exact dedup keeping the canonical (min doc_id) copy →
    per-language corpus stats (docs, total whitespace tokens, min/max
    selection score). The point is cross-operator optimization: the
    selection TakeOrdered, the digest groupBy, and the final
    aggregation pipeline as plain DataFrame stages, and the oracle
    replays the ENTIRE composition (shared _DSIR_CTES block — the
    score arithmetic cannot drift between the standalone entry and
    the pipeline). min/max score instead of an average: the per-doc
    scores are exact by the decimal-quantized-fold discipline, and
    min/max are order-independent, so no float-sum re-association can
    enter the hash."""
    docs = _t(spark, sf_dir, "documents")
    scored = text.dsir_scores(docs, docs.filter(F.col("lang") == "en"), n_buckets=1024)
    sel = scored.orderBy(F.col("score").desc(), "doc_id").limit(300)
    kept = docs.join(sel.select("doc_id", "score"), "doc_id")
    canonical = kept.groupBy(F.md5(F.col("text")).alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    uniq = kept.join(canonical.select("doc_id"), "doc_id").select(
        "lang", F.size(text.tokens_col(F.col("text"))).alias("n_toks"), "score"
    )
    return uniq.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("total_tokens"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )



@register_extra(
    "text_label_noise_contract",
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(COUNT(*) FILTER (doc_id % 37 = 0) AS BIGINT) AS n_planted,
              true AS recall_ok, true AS disagreement_ordered
       FROM documents""",
)
def text_label_noise_contract(spark, sf_dir):
    """Label-noise detection with a planted-corruption gate
    (operators/text.py:label_noise_candidates — confident learning,
    cross-fitted): the content label (≥3 "slow" tokens) is FLIPPED on
    the deterministic doc_id % 37 slice, the detector ranks by
    cross-fitted disagreement, and at least 60% of the planted flips
    must surface in the top 2·n_planted candidates (measured
    0.93/0.79/0.95 at the three gate SFs — the bound carries ≥2-flip
    margin at the weakest). Integer columns are exact (split sizes,
    planted count); the recall gate is integer arithmetic
    (10·recovered ≥ 6·planted); booleans absorb LBFGS\'s legitimate
    cross-engine ulp instability, the classifier-contract rule."""
    docs = _t(spark, sf_dir, "documents")
    toks = text.tokens_col(F.col("text"))
    clean = (F.size(F.filter(toks, lambda t: t == "slow")) >= 3).cast("double")
    flipped = F.when(
        F.pmod(F.col("doc_id"), F.lit(37)) == 0, F.lit(1.0) - clean
    ).otherwise(clean)
    labeled = docs.withColumn("clean", clean).withColumn("label", flipped)
    n_planted = labeled.filter(F.col("label") != F.col("clean")).count()
    sus = text.label_noise_candidates(labeled, "label", top_k=2 * n_planted)
    recovered = sus.filter(F.col("label") != F.col("clean")).count()
    ordered = sus.agg(
        (F.min("disagreement") >= 0.0).alias("lo"),
        (F.max("disagreement") <= 1.0).alias("hi"),
    )
    n_docs = labeled.count()
    return ordered.select(
        F.lit(n_docs).cast("long").alias("n_docs"),
        F.lit(n_planted).cast("long").alias("n_planted"),
        F.lit(10 * recovered >= 6 * n_planted).alias("recall_ok"),
        (F.col("lo") & F.col("hi")).alias("disagreement_ordered"),
    )



@register_extra(
    "q_temporal_embargo_split",
    """WITH base AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
                CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-24 00:00:00'
                       THEN 'test'
                     WHEN CAST(ts AS TIMESTAMP)
                          < TIMESTAMP '2024-01-24 00:00:00' - INTERVAL 86400 SECOND
                       THEN 'train'
                     ELSE 'embargo' END AS split
         FROM events
       ),
       ft AS (SELECT user_id, MIN(ts) AS fts FROM base WHERE split = 'test' GROUP BY 1),
       lab AS (
         SELECT b.user_id, b.ts,
                CASE WHEN b.split = 'train' AND ft.fts IS NOT NULL
                          AND b.ts >= ft.fts - INTERVAL 172800 SECOND
                     THEN 'purged' ELSE b.split END AS split
         FROM base b LEFT JOIN ft USING (user_id)
       )
       SELECT split, CAST(COUNT(*) AS BIGINT) AS n_events,
              CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
              MIN(ts) AS min_ts, MAX(ts) AS max_ts
       FROM lab GROUP BY 1""",
)
def q_temporal_embargo_split(spark, sf_dir):
    """Leakage-safe TIME split with purging
    (operators/sampling.py:temporal_embargo_split — the de Prado
    purged/embargoed split): cutoff 2024-01-24, a 1-day global
    embargo gap dropped between train and test, and a 2-day
    per-entity purge — a user\'s train rows within 2 days of their
    own first test event are excised (an entity\'s recent history is
    the strongest leak). The time-axis complement of
    q_leakage_safe_split\'s similarity-axis family splitting. Pure
    deterministic timestamp arithmetic; the oracle replays labeling
    end-to-end and the entry emits the per-split census."""
    labeled = sampling.temporal_embargo_split(
        _t(spark, sf_dir, "events"),
        "ts",
        "2024-01-24 00:00:00",
        embargo_seconds=86400,
        entity_col="user_id",
        entity_embargo_seconds=172800,
    )
    ts = F.col("ts").cast("timestamp")
    return labeled.groupBy("split").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min(ts).alias("min_ts"),
        F.max(ts).alias("max_ts"),
    )



@register_extra(
    "mm_scene_changes",
    """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
              CAST(0.0 AS DOUBLE) AS l1_change,
              false AS is_scene_change
       FROM documents, range(1, 6) t(i)
       WHERE doc_id % 3 = 2""",
)
def mm_scene_changes(spark, sf_dir):
    """Shot-boundary detection over the video corpus
    (operators/multimodal.py:scene_changes): REAL BMFF demux of every
    mp4 payload, mean-absolute-byte difference per consecutive frame
    pair, thresholded. The synthetic videos carry 6 IDENTICAL frames
    (every byte = doc_id %% 256), so the whole table is
    SQL-predictable — 5 pairs per video doc, l1 exactly 0, no
    boundary — which makes the end-to-end mux→demux→diff pipeline
    value-checkable like the other mm entries; the pytest drives the
    REAL signal with constructed multi-scene videos."""
    media = multimodal.attach_media(_t(spark, sf_dir, "documents"))
    return multimodal.scene_changes(media, threshold=16.0)



@register_extra(
    "q_data_expectations",
    """WITH li AS (SELECT * FROM lineitem), o AS (SELECT * FROM orders),
       u AS (
       SELECT 'not_null(l_orderkey)' AS rule,
              (SELECT COUNT(*) FROM li) AS n_rows,
              (SELECT COUNT(*) FROM li WHERE l_orderkey IS NULL) AS n_violations
       UNION ALL
       SELECT 'in_range(l_quantity,1,50)',
              (SELECT COUNT(*) FROM li),
              (SELECT COUNT(*) FROM li
               WHERE l_quantity IS NOT NULL AND (l_quantity < 1 OR l_quantity > 50))
       UNION ALL
       SELECT 'in_set(l_returnflag)',
              (SELECT COUNT(*) FROM li),
              (SELECT COUNT(*) FROM li
               WHERE l_returnflag IS NOT NULL AND l_returnflag NOT IN ('A','N','R'))
       UNION ALL
       SELECT 'matches(l_linestatus)',
              (SELECT COUNT(*) FROM li),
              (SELECT COUNT(*) FROM li
               WHERE l_linestatus IS NOT NULL
                 AND NOT regexp_full_match(l_linestatus, '[OF]'))
       UNION ALL
       SELECT 'fk(l_orderkey->o_orderkey)',
              (SELECT COUNT(*) FROM li),
              (SELECT COUNT(*) FROM (
                 SELECT DISTINCT l.l_orderkey FROM li l
                 ANTI JOIN o ON o.o_orderkey = l.l_orderkey
                 WHERE l.l_orderkey IS NOT NULL) x
               JOIN li y ON y.l_orderkey = x.l_orderkey)
       UNION ALL
       SELECT 'unique(o_orderkey)',
              (SELECT COUNT(*) FROM o),
              (SELECT COALESCE(SUM(c - 1), 0) FROM (
                 SELECT COUNT(*) AS c FROM o
                 WHERE o_orderkey IS NOT NULL GROUP BY o_orderkey))
       )
       SELECT rule, CAST(n_rows AS BIGINT) AS n_rows,
              CAST(n_violations AS BIGINT) AS n_violations
       FROM u""",
)
def q_data_expectations(spark, sf_dir):
    """Declarative data-quality gate
    (operators/expectations.py:check — the Great-Expectations/dbt-test
    idea): six rules over lineitem/orders — not-null and FK integrity
    on the join key, a quantity range, a returnflag domain set, an
    anchored linestatus regex, and orderkey uniqueness — compiled so
    every scalar rule shares ONE aggregate scan, uniqueness is one
    groupBy, and the FK check is one anti-join. The oracle replays
    each count independently; all-integer output plus the pass flag
    recomputed in SQL as n_violations = 0. A clean corpus passes
    every rule — the gate\'s value is the count machinery being
    value-checked so a dirty corpus CANNOT pass silently (the pytest
    plants violations of every class and pins the exact counts)."""
    from .operators import expectations as X

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    rules = [
        X.not_null("l_orderkey"),
        X.in_range("l_quantity", 1, 50),
        X.in_set("l_returnflag", ["A", "N", "R"]),
        X.matches("l_linestatus", "[OF]"),
        X.foreign_key("l_orderkey", o, "o_orderkey"),
    ]
    summary = X.check(li, rules)
    uniq = X.check(o, [X.unique("o_orderkey")])
    out = summary.unionByName(uniq)
    # rename rules to the oracle labels (the operator's auto-names
    # carry python reprs the SQL should not have to reproduce)
    mapping = {
        "not_null(l_orderkey)": "not_null(l_orderkey)",
        "in_range(l_quantity,1,50)": "in_range(l_quantity,1,50)",
        "in_set(l_returnflag)": "in_set(l_returnflag)",
        "matches(l_linestatus)": "matches(l_linestatus)",
        "fk(l_orderkey->o_orderkey)": "fk(l_orderkey->o_orderkey)",
        "unique(o_orderkey)": "unique(o_orderkey)",
    }
    me = F.create_map([F.lit(x) for kv in mapping.items() for x in kv])
    return out.select(
        me[F.col("rule")].alias("rule"),
        "n_rows",
        "n_violations",
    )



@register_extra(
    "ts_seasonal_outliers",
    """WITH daily AS (
         SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
                COUNT(*) AS n
         FROM events GROUP BY 1
       ),
       d2 AS (SELECT day, n, CAST(dayofweek(day) + 1 AS INT) AS dow FROM daily),
       prof AS (SELECT dow, median(n) AS dow_median FROM d2 GROUP BY 1),
       resid AS (
         SELECT d2.day, d2.n, d2.dow, prof.dow_median,
                d2.n - prof.dow_median AS residual
         FROM d2 JOIN prof USING (dow)
       ),
       m AS (SELECT median(abs(residual)) AS mad FROM resid)
       SELECT day, CAST(n AS BIGINT) AS n, dow,
              CAST(dow_median AS DOUBLE) AS dow_median,
              CAST(residual AS DOUBLE) AS residual,
              abs(residual) > 3.0 * (SELECT mad FROM m) AS is_outlier
       FROM resid""",
)
def ts_seasonal_outliers(spark, sf_dir):
    """Seasonally-adjusted anomaly detection
    (operators/timeseries.py:seasonal_outliers): the daily event
    count minus its DAY-OF-WEEK median profile, flagged at 3×MAD of
    the residuals — the deseasonalized counterpart of
    q_robust_outliers (raw MAD would flag every weekend; adjusted MAD
    flags genuine level breaks). Integer counts, exact-half medians
    (both engines average the even-n middle pair), one multiply and
    one compare — bit-exact with no rounding. DuckDB\'s dayofweek is
    0=Sunday vs Spark\'s 1=Sunday, bridged by the +1 in the oracle."""
    return timeseries.seasonal_outliers(
        _t(spark, sf_dir, "events"), "ts", k=3.0
    ).orderBy("day")


# --------------------------------------------------------------------------
# Corpus snapshot diffing (operators/versioning.py): v2 is built
# IN-PLAN from the documents table by the seeded-md5 discipline of
# _synth_partsupp — both engines construct the identical second
# version, so the diff classification is fully oracle-checkable.
# Bands on the deterministic uniform u = md5_uniform('v2:'||doc_id):
# u < 0.06 removed, 0.06 ≤ u < 0.12 changed (text gets a ' [rev2]'
# suffix), u ≥ 0.94 also spawns a brand-new doc at doc_id+10'000'000.
# --------------------------------------------------------------------------

_CORPUS_V2_SQL = """u AS (
  SELECT doc_id, text, lang,
         (('0x' || substr(md5('v2:' || doc_id), 1, 13))::UBIGINT::DOUBLE + 0.5)
           / 4503599627370496.0 AS u
  FROM documents
),
v2 AS (
  SELECT doc_id,
         CASE WHEN u < 0.12 THEN text || ' [rev2]' ELSE text END AS text,
         lang
  FROM u WHERE u >= 0.06
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, txt AS text, lang
  FROM (SELECT doc_id, 'added:' || doc_id AS txt, lang FROM u WHERE u >= 0.94)
)"""


def _corpus_v2(spark, sf_dir):
    """The synthesized second corpus version, Spark side (see
    _CORPUS_V2_SQL — the oracle builds the identical rows). Shared by
    q_corpus_diff and pipeline_incremental_stats."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    u = sampling.md5_uniform(F.concat(F.lit("v2:"), F.col("doc_id").cast("string")))
    base = docs.withColumn("u", u)
    surviving = base.filter(F.col("u") >= 0.06).select(
        "doc_id",
        F.when(
            F.col("u") < 0.12, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    )
    added = base.filter(F.col("u") >= 0.94).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.concat(F.lit("added:"), F.col("doc_id").cast("string")).alias("text"),
        "lang",
    )
    return docs, surviving.unionByName(added)


@register(
    "q_corpus_diff",
    f"""WITH {_CORPUS_V2_SQL},
od AS (SELECT doc_id, lang, {versioning.content_digest_sql(('text', 'lang'))} AS dg FROM documents),
nd AS (SELECT doc_id, lang, {versioning.content_digest_sql(('text', 'lang'))} AS dg FROM v2),
j AS (
  SELECT COALESCE(nd.doc_id, od.doc_id) AS doc_id,
         COALESCE(nd.lang, od.lang) AS lang,
         CASE WHEN od.doc_id IS NULL THEN 'added'
              WHEN nd.doc_id IS NULL THEN 'removed'
              WHEN od.dg <> nd.dg THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM od FULL OUTER JOIN nd ON od.doc_id = nd.doc_id
)
SELECT status, lang, COUNT(*) AS n
FROM j GROUP BY status, lang ORDER BY status, lang""",
)
def q_corpus_diff(spark, sf_dir):
    """Corpus version diff (operators/versioning.py corpus_diff): v2
    of the documents corpus is synthesized in-plan (seeded-md5 bands:
    ~6% removed, ~6% text-edited, ~6% fresh ids appended) and every
    id in either version is classified added/removed/changed/
    unchanged by digest comparison, summarized per (status, lang).
    Scale shape: both sides reduce to (id, digest, lang) AT THE SCAN
    — the full-outer join shuffles two slim 3-column frames, never
    the text payload; bucketed-by-id storage makes it exchange-free.
    The oracle replays v2 construction, the 0x1F/0x1E digest encoding
    (versioning.content_digest_sql — the same constant builds both
    sides), and the classification end-to-end."""
    docs, v2 = _corpus_v2(spark, sf_dir)
    return (
        versioning.corpus_diff(
            docs, v2, "doc_id", ("text", "lang"), carry_cols=("lang",)
        )
        .groupBy("status", "lang")
        .agg(F.count("*").alias("n"))
        .orderBy("status", "lang")
    )


@register(
    "q_golden_records",
    """WITH d AS (
         SELECT doc_id // 5 AS cluster, lang, n_chars, text
         FROM documents WHERE doc_id < 1000
       ),
       m AS (
         SELECT cluster, lang FROM (
           SELECT cluster, lang,
                  ROW_NUMBER() OVER (PARTITION BY cluster
                                     ORDER BY cnt DESC, lang DESC) AS rn
           FROM (SELECT cluster, lang, COUNT(*) AS cnt
                 FROM d WHERE lang IS NOT NULL GROUP BY 1, 2)
         ) WHERE rn = 1
       ),
       x AS (SELECT cluster, MAX(n_chars) AS n_chars FROM d GROUP BY 1),
       t AS (
         SELECT cluster, text FROM (
           SELECT cluster, text,
                  ROW_NUMBER() OVER (PARTITION BY cluster
                                     ORDER BY length(text) DESC, text DESC) AS rn
           FROM d WHERE text IS NOT NULL
         ) WHERE rn = 1
       )
       SELECT x.cluster, m.lang, x.n_chars, t.text
       FROM x LEFT JOIN m USING (cluster) LEFT JOIN t USING (cluster)
       ORDER BY cluster""",
)
def q_golden_records(spark, sf_dir):
    """Golden-record survivorship (operators/dedup.py golden_records):
    entity clusters (deterministic doc_id÷5 blocks over the scoped
    corpus) merged field-by-field — consensus language (mode),
    maximal n_chars, most complete text (longest) — each with the
    documented greatest-value tie-break the oracle replays via
    ORDER BY ... DESC ROW_NUMBER. The step AFTER near-dup clustering
    that keep_best (whole-row survivor) cannot express: the golden
    row may combine fields from DIFFERENT members. Every shuffle is
    keyed on the cluster id; mode fields cost one count+argmax pair
    each."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 1000)
        .select(
            F.expr("doc_id div 5").alias("cluster"), "lang", "n_chars", "text"
        )
    )
    return dedup.golden_records(
        d, "cluster", {"lang": "mode", "n_chars": "max", "text": "longest"}
    ).orderBy("cluster")


@register_extra(
    "pipeline_ccnet_prep",
    "WITH "
    + _CHAR_LM_CTES
    + """,
lab AS (
  SELECT d.doc_id, d.text, d.lang,
         NTILE(3) OVER (PARTITION BY d.lang
                        ORDER BY ds.lm_score DESC, ds.doc_id) AS nt
  FROM doc_scores ds JOIN documents d USING (doc_id)
),
kept AS (SELECT doc_id, text, lang FROM lab WHERE nt <= 2),
dedup AS (
  SELECT doc_id, text, lang FROM (
    SELECT doc_id, text, lang,
           ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM kept
  ) WHERE rn = 1
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM dedup GROUP BY lang ORDER BY lang""",
)
def pipeline_ccnet_prep(spark, sf_dir):
    """The CCNet corpus-prep recipe END-TO-END in one Catalyst plan:
    char-LM perplexity scoring → per-language head+middle cut (drop
    the tail third) → exact dedup (first doc per text digest) →
    per-language stats. The oracle shares _CHAR_LM_CTES with
    text_lm_perplexity/text_ppl_buckets (one definition of the score
    arithmetic across all three entries) and replays the cut, the
    digest dedup tie-break, and the final aggregate. Scale shape:
    scoring is scan + broadcast model join; the cut's window moves
    slim (id, score) rows; dedup shuffles (digest, id) — at no stage
    does the payload cross an exchange except the final
    delta-to-stats aggregation."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    lab = text.ppl_buckets(docs, by_col="lang", n_buckets=3)
    kept = (
        lab.filter(F.col("bucket") <= 2)
        .select("doc_id")
        .join(docs, "doc_id")
    )
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (
        kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    )
    return (
        deduped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
        .orderBy("lang")
    )


@register_extra(
    "text_collapse_repeats",
    r"""WITH toks AS (
         SELECT doc_id,
                list_filter(string_split_regex(trim(text), '\s+'),
                            x -> x <> '') AS l
         FROM documents
       ),
       flat AS (
         SELECT doc_id, l, CAST(i AS INT) AS ord, l[CAST(i AS INT)] AS tok
         FROM toks, UNNEST(range(1, len(l) + 1)) AS t(i)
       ),
       marked AS (
         SELECT doc_id, tok, ord,
                (ord = 1 OR tok <> l[ord - 1]) AS keep
         FROM flat
       ),
       agg AS (
         SELECT doc_id, COUNT(*) AS n_tokens,
                COUNT(*) FILTER (WHERE NOT keep) AS n_collapsed,
                string_agg(tok, ' ' ORDER BY ord) FILTER (WHERE keep) AS ct
         FROM marked GROUP BY doc_id
       )
       SELECT t.doc_id,
              CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens,
              CAST(COALESCE(a.n_collapsed, 0) AS BIGINT) AS n_collapsed,
              md5(COALESCE(a.ct, '')) AS clean_hash
       FROM toks t LEFT JOIN agg a USING (doc_id)""",
)
def text_collapse_repeats(spark, sf_dir):
    """Consecutive-duplicate token collapse (operators/text.py
    collapse_repeats): the stutter-cleanup rewrite for OCR/scrape/ASR
    text, certified by md5 of the surviving token stream — the oracle
    rebuilds the keep-set from token ordinality and the hash compares
    byte-for-byte (the remove_dup_spans convention). Per-row HOFs in
    codegen, zero shuffle; the synthetic corpus genuinely stutters
    ("batch batch batch"), so n_collapsed is non-trivially nonzero."""
    docs = _t(spark, sf_dir, "documents")
    return text.collapse_repeats(docs).select(
        "doc_id", "n_tokens", "n_collapsed", "clean_hash"
    )


@register_extra(
    "text_gopher_rules",
    r"""WITH base AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
       toks AS (
         SELECT doc_id, t,
                list_filter(string_split_regex(trim(t), '\s+'), x -> x <> '') AS w,
                list_filter(string_split(t, chr(10)), ln -> trim(ln) <> '') AS lines
         FROM base
       ),
       sig AS (
         SELECT doc_id,
                len(w) AS n_words,
                ROUND(COALESCE(list_sum(list_transform(w, x -> length(x))), 0) * 1.0
                      / greatest(len(w), 1), 6) AS mean_word_len,
                ROUND(((length(t) - length(replace(t, '#', '')))
                       + (len(string_split(t, '...')) - 1)) * 1.0
                      / greatest(len(w), 1), 6) AS symbol_ratio,
                ROUND(len(list_filter(lines, ln -> regexp_matches(trim(ln), '^[-*•]')))
                      * 1.0 / greatest(len(lines), 1), 6) AS bullet_frac,
                ROUND(len(list_filter(lines, ln -> regexp_matches(trim(ln), '\.\.\.$')))
                      * 1.0 / greatest(len(lines), 1), 6) AS ellipsis_frac,
                ROUND(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                      * 1.0 / greatest(len(w), 1), 6) AS alpha_frac,
                len(list_filter(['the','be','to','of','and','that','have','with'],
                    s -> list_contains(list_transform(w, x -> lower(x)), s))) AS stop_hits
         FROM toks
       )
       SELECT doc_id, CAST(n_words AS BIGINT) AS n_words, mean_word_len,
              symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac,
              CAST(stop_hits AS BIGINT) AS stop_hits,
              (n_words BETWEEN 50 AND 100000) AS r_word_count,
              (mean_word_len BETWEEN 3.0 AND 10.0) AS r_mean_word_len,
              (symbol_ratio <= 0.1) AS r_symbol_ratio,
              (bullet_frac <= 0.9) AS r_bullet_lines,
              (ellipsis_frac <= 0.3) AS r_ellipsis_lines,
              (alpha_frac >= 0.8) AS r_alpha_words,
              (stop_hits >= 2) AS r_stopwords,
              ((n_words BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3.0 AND 10.0)
               AND (symbol_ratio <= 0.1) AND (bullet_frac <= 0.9)
               AND (ellipsis_frac <= 0.3) AND (alpha_frac >= 0.8)
               AND (stop_hits >= 2)) AS gopher_pass
       FROM sig""",
)
def text_gopher_rules(spark, sf_dir):
    """The Gopher doc-quality rule battery (operators/text.py
    gopher_rules; Rae et al. 2021 §A1.1): word-count bounds, mean word
    length, symbol-to-word ratio, bullet/ellipsis line fractions,
    alphabetic-word fraction, and the required-stopword rule — the
    canonical pretraining pre-filter, emitted as raw signals + per-rule
    booleans + the conjunction. Pure per-row HOF columns in codegen
    (zero shuffle); every ratio is one rounded division of integer
    counts, replayed bit-identically by the oracle."""
    return text.gopher_rules(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "mean_word_len", "symbol_ratio", "bullet_frac",
        "ellipsis_frac", "alpha_frac", "stop_hits", "r_word_count",
        "r_mean_word_len", "r_symbol_ratio", "r_bullet_lines",
        "r_ellipsis_lines", "r_alpha_words", "r_stopwords", "gopher_pass",
    )


@register_extra(
    "text_c4_line_filters",
    r"""WITH base AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
       l AS (
         SELECT doc_id, t,
                list_filter(string_split(t, chr(10)), ln -> trim(ln) <> '') AS lines
         FROM base
       ),
       k AS (
         SELECT doc_id, t, lines,
                list_filter(lines, ln ->
                  regexp_matches(trim(ln), '[.!?"]$')
                  AND len(list_filter(string_split_regex(trim(ln), '\s+'),
                                      x -> x <> '')) >= 3) AS kept
         FROM l
       )
       SELECT doc_id,
              CAST(len(lines) AS BIGINT) AS n_lines,
              CAST(len(kept) AS BIGINT) AS n_lines_kept,
              contains(lower(t), 'lorem ipsum') AS has_lorem_ipsum,
              (contains(t, '{') OR contains(t, '}')) AS has_curly_brace,
              md5(COALESCE(array_to_string(kept, chr(10)), '')) AS clean_hash,
              (len(kept) >= 3 AND NOT contains(lower(t), 'lorem ipsum')
               AND NOT (contains(t, '{') OR contains(t, '}'))) AS c4_keep
       FROM k""",
)
def text_c4_line_filters(spark, sf_dir):
    """The C4 line-level cleaning recipe (operators/text.py
    c4_line_filters; Raffel et al. 2020 §2.2): keep lines ending in
    terminal punctuation with ≥ 3 words, flag lorem-ipsum and
    curly-brace documents, and certify the surviving line stream by
    md5 (byte-exact cross-engine, the collapse_repeats convention).
    Per-row HOFs only — no shuffle; the document policy (≥ 3 kept
    lines, neither flag) ships as ``c4_keep``."""
    return text.c4_line_filters(_t(spark, sf_dir, "documents")).select(
        "doc_id", "n_lines", "n_lines_kept", "has_lorem_ipsum",
        "has_curly_brace", "clean_hash", "c4_keep",
    )


@register_extra(
    "q_waterfill_budget",
    """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
       b AS (
         SELECT lang, n,
                ROW_NUMBER() OVER w AS j,
                SUM(n) OVER w - n AS p_prev,
                COUNT(*) OVER () AS ng
         FROM c WINDOW w AS (ORDER BY n, lang)
       ),
       f AS (
         SELECT *, CAST((300 - p_prev) // (ng - j + 1) AS BIGINT) AS tj FROM b
       ),
       cut AS (SELECT MIN(CASE WHEN tj < n THEN j END) AS cut_j FROM f),
       cr AS (
         SELECT tj AS t_level,
                300 - p_prev - tj * (ng - j + 1) AS leftover, j AS cj
         FROM f, cut WHERE j = cut_j
       )
       SELECT f.lang, f.n,
              CAST(CASE WHEN cut.cut_j IS NULL THEN f.n
                        WHEN f.j < cut.cut_j THEN f.n
                        ELSE cr.t_level
                             + CASE WHEN f.j - cr.cj < cr.leftover
                                    THEN 1 ELSE 0 END
                   END AS BIGINT) AS quota
       FROM f CROSS JOIN cut LEFT JOIN cr ON cut.cut_j = cr.cj
       ORDER BY lang""",
)
def q_waterfill_budget(spark, sf_dir):
    """Water-filling budget allocation across languages
    (operators/sampling.py waterfill_quota, budget 300): cap the big
    groups at a common level, keep small groups whole, distribute the
    integer remainder deterministically — quotas sum to EXACTLY
    min(budget, corpus). Closed-form integer windows, no iteration;
    the oracle replays ordering, prefix algebra, the water-line cut,
    and remainder placement. (Beyond-cut candidate levels can go
    negative, where Spark `div` truncates and DuckDB `//` floors —
    harmless by construction: only the cut row's non-negative level
    reaches the output, and the capped-flag comparison agrees under
    either rounding.) The corpus collapses to group counts first; all
    window work runs on the group-cardinality frame."""
    docs = _t(spark, sf_dir, "documents")
    return sampling.waterfill_quota(docs, "lang", 300).orderBy("lang")


@register_extra(
    "ts_rolling_trend",
    """WITH daily AS (
         SELECT event_type, CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
                COUNT(*) AS y
         FROM events GROUP BY 1, 2
       ),
       idx AS (
         SELECT event_type, day, y,
                datediff('day', DATE '1970-01-01', CAST(day AS DATE)) AS di
         FROM daily
       ),
       st AS (
         SELECT event_type, day,
                COUNT(*) OVER w AS n,
                SUM(di) OVER w AS sx, SUM(y) OVER w AS sy,
                SUM(di * y) OVER w AS sxy, SUM(di * di) OVER w AS sxx
         FROM idx
         WINDOW w AS (PARTITION BY event_type ORDER BY di
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
       ),
       m AS (
         SELECT event_type, day, n,
                CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
                CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den
         FROM st
       )
       SELECT event_type, day, CAST(n AS BIGINT) AS n_days,
              CASE WHEN den > 0 THEN
                CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                     * ((2 * abs(num) * 1000000 + den) // (2 * den)) AS DOUBLE)
                / 1000000.0
              END AS slope
       FROM m ORDER BY event_type, day""",
)
def ts_rolling_trend(spark, sf_dir):
    """Rolling 7-day OLS trend of the daily count per event type
    (operators/timeseries.py rolling_trend): integer moment sums over
    a calendar RANGE window, slope emitted as the exact-integer
    half-away-from-zero of the true rational — the heating-up/
    cooling-down monitor with no IEEE accumulation anywhere. The
    oracle replays day indexing, the RANGE frame, the moment algebra,
    and the signed division bit-for-bit. Scale: corpus → (key, day)
    counts in one partial-agg shuffle; windows run over
    calendar-bounded rows."""
    e = _t(spark, sf_dir, "events")
    return timeseries.rolling_trend(
        e, "ts", group_cols=("event_type",), window_days=7
    ).orderBy("event_type", "day")


@register(
    "ts_time_weighted_avg",
    """WITH o AS (
         SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                CAST(value AS DECIMAL(18,6)) AS v
         FROM events
       ),
       seg AS (
         SELECT event_type, v,
                LEAD(us) OVER (PARTITION BY event_type ORDER BY us, v) - us AS dur
         FROM o
       ),
       a AS (
         SELECT event_type, COUNT(*) AS n_obs,
                SUM(dur) AS span_us, SUM(v * dur) AS wsum
         FROM seg GROUP BY 1
       )
       SELECT event_type, n_obs, CAST(span_us AS BIGINT) AS span_us,
              CAST((CAST(wsum * 1000000 AS HUGEINT) * 2 + span_us)
                   // (CAST(span_us AS HUGEINT) * 2) AS DOUBLE) / 1000000.0
                  AS twa
       FROM a ORDER BY event_type""",
)
def ts_time_weighted_avg(spark, sf_dir):
    """Time-weighted average per event type (operators/timeseries.py
    time_weighted_avg): LOCF-weighted mean over the irregular event
    series — each value weighted by how long it was in force, the
    TWAP/sensor primitive a burst-skewed plain AVG gets wrong.
    Integer-microsecond durations × decimal values keep Σ v·dur
    exact, and the 6-decimal output is the exact-integer half-up of
    the true rational (no IEEE accumulation). The oracle replays
    segmentation (LEAD over the same (us, v) tie-broken order),
    accumulation, and the division bit-for-bit."""
    e = _t(spark, sf_dir, "events")
    return timeseries.time_weighted_avg(
        e, "ts", "value", group_cols=("event_type",)
    ).orderBy("event_type")


@register(
    "pipeline_incremental_stats",
    f"""WITH {_CORPUS_V2_SQL}
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS sum_chars
FROM v2 GROUP BY lang ORDER BY lang""",
)
def pipeline_incremental_stats(spark, sf_dir):
    """Incremental pipeline maintenance: per-language corpus stats for
    v2 computed WITHOUT rescanning v2 — v1's stats plus delta
    adjustments driven by the corpus diff (removed/changed rows
    subtract their OLD doc at the old language, added/changed rows
    add their NEW doc at the new language; language moves fall out of
    the same algebra). The oracle aggregates v2 DIRECTLY, so equality
    proves the maintenance identity stats(v2) = stats(v1) + Δ(diff)
    end-to-end — the 100 TB shape where a nightly corpus update
    re-aggregates only the delta (three slim joins on id, each
    delta-sized) instead of re-reading the corpus. Unchanged rows
    never join back to their payload; only classified delta ids do."""
    docs, v2 = _corpus_v2(spark, sf_dir)
    diff = versioning.corpus_diff(docs, v2, "doc_id", ("text", "lang"))
    v1_stats = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum(F.length("text")).alias("sum_chars")
    )
    old_side = (
        diff.filter(F.col("status").isin("removed", "changed"))
        .join(docs, "doc_id")
        .select("lang", F.lit(-1).alias("d_docs"), (-F.length("text")).alias("d_chars"))
    )
    new_side = (
        diff.filter(F.col("status").isin("added", "changed"))
        .join(v2, "doc_id")
        .select("lang", F.lit(1).alias("d_docs"), F.length("text").alias("d_chars"))
    )
    adj = old_side.unionByName(new_side)
    merged = (
        v1_stats.select("lang", F.col("n_docs").alias("d_docs"), F.col("sum_chars").alias("d_chars"))
        .unionByName(adj.select("lang", F.col("d_docs").cast("long"), F.col("d_chars").cast("long")))
        .groupBy("lang")
        .agg(F.sum("d_docs").alias("n_docs"), F.sum("d_chars").alias("sum_chars"))
        .filter(F.col("n_docs") > 0)
    )
    return merged.orderBy("lang")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in QUERIES.items() if spec.sql is not None}


def all_specs() -> dict[str, QuerySpec]:
    """Driver-tier + extra-tier catalog, for local verification
    (tools/check_oracles.py) and the bench harness."""
    overlap = QUERIES.keys() & EXTRA_QUERIES.keys()
    if overlap:  # registration already guards; keep -O-safe defense
        raise RuntimeError(f"catalog name collision: {sorted(overlap)}")
    return {**QUERIES, **EXTRA_QUERIES}


# The driver's correctness gate records exactly 50 rows, in catalog
# order — every driver-tier entry must fit inside that window or it
# silently gets no correctness signal (rounds 2/3 shipped 68 entries
# and left 18 unproven), and an underfull window wastes correctness
# rows. RuntimeError, not assert: asserts vanish under `python -O`.
# Redundant variants belong in EXTRA_QUERIES.
#
# Rotation policy (round 6): the 50-slot window rotates so high-value
# work gets a driver-gate row while every ex-driver entry stays
# oracle-verified in the EXTRA tier (tools/check_oracles.py covers
# both tiers on every run — nothing loses its oracle by rotating out).
# Bench comparability is tier-independent (bench.py times its HEADLINE
# list from all_specs, both tiers), so rotation never changes what is
# measured; the store_* planner rows stay in the driver tier. Rotated
# IN (r6): store_analyze_stats,
# dedup_clusters, q_stream_window_counts, q_stream_session_windows,
# text_decontaminate, pipeline_corpus_prep. Rotated OUT to EXTRA —
# each redundant with a surviving driver row of the same operator
# class: parity_topn_sort (parity_range_scan + q1 cover scan+TopN),
# parity_keyset_page (store_query_paged_keyset runs the REAL keyset
# loop), q_moving_average + q_window_ntile (q_window_running_total +
# q_percentiles cover window frames/ranking), q_string_functions
# (q_string_agg_sorted + q_explode_top_tokens cover string ops),
# q_set_ops (q_semi_anti_join covers set-membership shapes).
#
# Rotated IN (r7) — round-6's new operator tier gets driver rows:
# store_bulk_merge, store_time_travel, q_countmin_heavy_hitters,
# q_token_budget_select, dedup_minhash_incremental,
# q_stream_sliding_counts. Rotated OUT to EXTRA, each redundant with a
# surviving driver row of the same operator class:
# q_pivot_status_priority (pivot IS per-column conditional agg —
# q_conditional_agg survives), q_date_arithmetic (q_distinct_users_daily
# + q_sessionization cover date/timestamp arithmetic), q_string_agg_sorted
# (q_explode_top_tokens covers string/array aggregation),
# q8_market_share (q5_local_supplier_volume covers the multi-table
# join + ratio-agg shape), dedup_simhash (dedup_minhash_lsh survives for
# the banded-signature-LSH class; simhash stays double-covered in EXTRA
# by the contract row + dedup_simhash_raw), dedup_embedding_lsh
# (dedup_embedding_cosine survives for embedding near-dup;
# dedup_embedding_lsh_raw + dedup_embedding_incremental stay in EXTRA).
#
# Rotated IN (late r7) — this round's new operator tier:
# q_bloom_prejoin (runtime join pruning), mv_incremental_rollup
# (continuous aggregates), q_stream_interval_join (stream-stream
# joins), q_weighted_sample (weighted sampling w/o replacement).
# Rotated OUT to EXTRA, each redundant with a surviving driver row:
# q_explode_top_tokens (text_quality_score/text_langid cover
# tokenize-explode-agg; q_events_json_agg covers explode+agg over
# parsed structures), q_conditional_agg (q_grouping_sets +
# q_percentiles cover multi-shape aggregation; the pivot twin in
# EXTRA is the same per-column conditional agg), dedup_embedding_cosine
# (ann_cosine_topk covers the cosine kernel, dedup_minhash_lsh the
# banded near-dup class; the embedding-LSH/incremental variants keep
# their EXTRA oracles), mm_resize (mm_feature_extract drives the same
# PNG decode path; mm_frame_sample keeps the mp4 path).
#
# Rotated IN (late r7, second pass) — the final additions of the
# round: dedup_span_removal (the duplicated-span REWRITE — md5 of the
# rebuilt text value-checked), ann_join_contract (cross-corpus ANN
# join, both sides data-proportional, recall-contracted vs the exact
# cross top-k), q_stream_static_join (per-micro-batch broadcast-dim
# enrichment — the remaining Structured Streaming join pattern),
# mv_rollup_variance (exact variance from additive decimal ssq
# partials — exercises the same base/delta merge machinery as
# mv_incremental_rollup PLUS the new partial). Rotated OUT to EXTRA,
# each redundant with a surviving driver row: q_distinct_users_daily
# (exact NDV is driver-covered by store_analyze_stats, and the
# expand+aggregate distinct shape runs inside dedup_clusters and the
# span entries), ann_cosine_topk (ann_lsh_bucket + ann_ivf survive
# for fixed-query ANN; the exact-cosine reference now also runs
# in-plan inside ann_join_contract's twin), q_stream_sliding_counts
# (q_stream_window_counts survives for watermarked windowed
# aggregation — sliding is the two-window expansion of the same
# machinery), mv_incremental_rollup (mv_rollup_variance runs the
# identical partials/merge/finalize path with a superset of columns;
# the plain refresh stays oracle-checked in EXTRA).
#
# Rotated IN (late r7, third pass) — the retrieval-eval / robust-stats
# tier: search_hybrid_rrf (RRF fusion whose two legs run the full BM25
# and TF-IDF-cosine rankers in-plan — one driver row proves sparse
# retrieval AND fusion), q_auc_score (exact Mann-Whitney AUC on the
# two-level distributed_cumsum — the score-evaluation class had no
# driver row), q_robust_outliers (MAD robust outliers — runs the
# sort-based interpolating percentile UNROUNDED, a strictly stronger
# parity check than the rounded q_percentiles row it replaces),
# text_kl_divergence (distribution-divergence class, previously
# driver-uncovered). Rotated OUT to EXTRA, each redundant with a
# surviving driver row: q_percentiles (q_robust_outliers' med/mad are
# the same percentile aggregate, unrounded; q_exact_percentiles twins
# it in EXTRA), q_window_running_total (q_token_budget_select IS the
# scale-shaped global running total; mv_rollup_variance covers
# windowed/frame aggregation), ts_range_join (ts_asof_join survives
# for the temporal-join class, q_stream_interval_join for interval
# predicates; ts_interval_overlap stays in EXTRA), dedup_minhash_lsh
# (dedup_minhash_incremental runs the identical banded-LSH join +
# candidate verify against the persisted index; the uncapped-Jaccard
# twin stays in EXTRA).
# Rotated IN (r8) — round-7's strongest unrepresented work, per the
# round-7 review: store_collection_join (first cross-collection
# analytics THROUGH the store read path), dedup_keep_best (the dedup
# DECISION — which replica survives), mv_rollup_quantile_contract
# (mergeable bottom-k quantile partials through the same merge
# machinery), text_lm_perplexity (CCNet-style char-LM quality score,
# model trained in-plan), q_weighted_sample_per_group (A-ExpJ weighted
# reservoir per group), ts_point_in_time_read (SCD2 intervals
# value-checked against the independent as-of formulation). Rotated
# OUT to EXTRA, each redundant with a surviving driver row:
# q_weighted_sample (the per-group entry runs the identical
# exponential-key reservoir; global = one group), mv_rollup_variance
# (the quantile contract runs the identical partials/merge/finalize
# path; the variance face stays oracle-checked in EXTRA),
# text_kl_divergence (text_lm_perplexity is the same cross-
# distribution log-likelihood arithmetic driven through a trained
# model), ann_lsh_bucket (ann_join_contract drives the same
# hyperplane-signature kernel with BOTH sides data-proportional plus
# a recall contract; ann_ivf survives for the adaptive-cell family),
# q_semi_anti_join (text_decontaminate IS an anti-join decontamination
# and dedup_minhash_incremental runs a left-anti against the persisted
# index in-plan), q_stream_static_join (q_stream_interval_join
# survives for Structured Streaming joins — the strictly harder
# stream-stream case; the broadcast static-dim face stays in EXTRA).
#
# Rotated IN (r9) — round-8's strongest unrepresented work, per the
# round-8 review: store_rollup_serve + store_rollup_invalidate (the
# only PLAN-ASSERTED MV-routing entries — the planner choosing
# "merged" vs "invalidated" refresh is exactly what the gate should
# pin), ann_pq_contract (the PQ recall certificate over trained
# codebooks + ADC scan + exact re-rank), q_leakage_safe_split
# (near-dup families split as units, exact assignment replayed via
# recursive CTE), ts_seasonality_profile (calendar-bounded 168-cell
# reduction), q_unpivot_metrics (native Expand reshape, shuffle-free).
# Rotated OUT to EXTRA, each redundant with a surviving driver row:
# ts_rollup_hypertable (store_rollup_serve/invalidate run the rollup
# machinery THROUGH the store — planner-routed and plan-asserted, a
# strict superset; mv_rollup_quantile_contract keeps the mergeable-
# partials face), mm_frame_sample (mm_feature_extract drives the same
# mapInPandas multimodal plumbing; the mp4 path stays oracle-checked
# in EXTRA), q_grouping_sets (q_unpivot_metrics exercises the same
# physical Expand operator; q1/q_events_json_agg keep multi-shape
# aggregation), text_fingerprint (text_quality_score/text_langid keep
# the single-traversal text-struct class; the fingerprint row stays in
# EXTRA), q_countmin_heavy_hitters (store_analyze_stats +
# mv_rollup_quantile_contract keep sketch-sized reductions driver-
# covered), ann_ivf (ann_pq_contract is the richer trained-state ANN
# gate — codebook k-means IS adaptive cells — and ann_join_contract
# keeps the hyperplane family; the IVF contract stays in EXTRA).
#
# Rotated IN (r10) — round-9's strongest unrepresented work, per the
# round-9 review, every incoming entry checked against the mechanical
# no-DECIMAL-output guard (tools/check_oracles.spark_decimal_violations)
# BEFORE the window shipped: ann_ivfpq_contract (the combined
# cells × compressed-residual-scan FAISS IVFADC recipe with recall
# certificate), store_rollup_quantile (exact positional-quantile
# store face, plan-asserted merged route), dedup_contamination_radius
# (bounded BFS over the near-dup graph, hop-counting recursive-CTE
# oracle), ts_holt_forecast (bit-exact sequential Holt smoothing,
# recursive-CTE oracle), text_pii_redact (multi-class PII scrub,
# byte-compared end-to-end), q9_product_type_profit (the heaviest
# synthesized-TPC-H join tree — 6-table join over in-plan partsupp).
# Rotated OUT to EXTRA, each redundant with a surviving driver row:
# ann_pq_contract (ann_ivfpq_contract runs the identical trained-
# codebook + ADC + exact-re-rank recipe PLUS cell routing — a strict
# superset; ann_join_contract keeps the hyperplane family),
# mv_rollup_quantile_contract (store_rollup_quantile drives the same
# mergeable bottom-k quantile partials THROUGH the store planner
# route — registration, refresh classification, and serve on top of
# the identical merge machinery), dedup_clusters
# (dedup_contamination_radius traverses the same near-dup EDGES
# graph; dedup_keep_best keeps the cluster-decision face and
# q_leakage_safe_split keeps family connected-components),
# ts_asof_join (ts_point_in_time_read value-checks an independent
# as-of formulation in-plan — the SCD2 point-in-time read IS an
# as-of), text_langid (text_quality_score keeps the single-traversal
# text-struct class; langid stays benched every round + oracled in
# EXTRA), q5_local_supplier_volume (q9 is the strictly heavier
# multi-table join + agg of the same class; q3 keeps the
# join-then-topN shape).
#
# Rotated IN (r10, second half) — the round's own strongest new work,
# guard-first (every IN entry passes the DecimalType registration
# guard and was oracle-green at all three SFs before the swap):
# ts_holt_winters, text_bpe_merges, q_attribution_models,
# emb_kcenter_select. Rotated OUT to EXTRA, each redundant with a
# surviving driver row of the same operator class: ts_holt_forecast
# (ts_holt_winters runs the identical applyInPandas sequential-
# smoothing recipe with level+trend PLUS the seasonal ring — a strict
# superset, same bit-exact recursive-CTE oracle discipline),
# dedup_keep_best (pipeline_corpus_prep executes clustering +
# keep-one-per-component end-to-end inside its surviving driver row),
# q_weighted_sample_per_group (q_token_budget_select keeps the
# deterministic md5-uniform selection class; the global
# q_weighted_sample twin stays oracle-verified in EXTRA),
# q_stream_window_counts (q_stream_session_windows keeps the
# watermarked stateful windowed-agg class with the strictly harder
# window type; tumbling counts stay oracled in EXTRA).
#
# Rotation #7 (r10, second half — executed): every IN entry was
# oracle-green at ALL THREE SFs and DecimalType-guard-clean before
# the swap. IN: graph_pagerank (the iterative-graph class's first
# driver row — 8-iteration Pregel-shape PageRank with the
# recursive-CTE oracle), q_corpus_diff (corpus snapshot diffing — a
# class the window never had), ts_time_weighted_avg (exact
# decimal-microsecond TWAP), q_golden_records (field-level
# survivorship merge), q_stream_uniform_sample (the only STREAMING
# entry with a full-value oracle — persisted bottom-k state == SQL
# bottom-k over the whole table), pipeline_incremental_stats
# (stats(v2) = stats(v1) + Δ(diff) maintenance identity). OUT to
# EXTRA, each redundant with surviving driver rows of its class:
# q3_shipping_priority (q1/q9/store_collection_join keep the
# join+agg+TopN class, q9 with the heavier tree),
# q_events_json_agg (parity_residual_filter keeps the JSON
# expression-language class end-to-end), ts_seasonality_profile
# (ts_holt_winters keeps per-key series smoothing; the calendar
# profile shape also lives inside ts_seasonal_outliers' oracle),
# q_auc_score (q_robust_outliers keeps the exact-stats class; AUC
# stays oracle-verified in EXTRA), dedup_span_removal (five dedup
# driver rows survive incl. the span class's shingle machinery in
# text_decontaminate), q_stream_session_windows (q_stream_ingest /
# q_stream_interval_join / q_stream_uniform_sample keep stateful
# streaming; session windows stay oracled in EXTRA).
if len(QUERIES) != 50:
    raise RuntimeError(
        f"driver-tier catalog has {len(QUERIES)} entries; the gate records exactly 50"
    )
