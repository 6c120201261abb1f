"""Operational diagnostics: the measurements that drive 100 TB tuning.

Two operators a pipeline owner runs before touching knobs:

- ``key_skew_report`` — the shuffle-key skew profile (max/p99/p50 key
  frequency, hot-key share, coefficient of variation) that decides
  whether a join/agg needs salting or AQE skew handling. Quantiles come
  from a counts-of-counts table (distinct frequency values, cumulative
  sums over that tiny table) — NOT ``percentile_cont`` (engines differ in
  interpolation conventions) and NOT a window over the per-key table
  (which can be ~100M rows for a user-id key at 100 TB). The variance is
  computed from exact BIGINT power sums in the final projection, never
  from a float-accumulating ``stddev`` aggregate whose merge order is
  nondeterministic across partitions.
- ``compaction_plan_stats`` — per-partition (event day) size estimates
  and the target file count at a fixed file-size budget: the
  small-files/compaction planning pass. Pure partition-grain aggregate;
  its output is metadata-sized at any corpus scale.

Both collapse the corpus with one narrow-key aggregate (map-side
combine) before anything non-linear happens, so the shapes are
scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import portable_hash64_sql
from ..plans.catalog import register
from ..sources.registry import load_table

# compaction target: bytes per output file (small for the synthetic data;
# 128 MiB in production — the logic is budget-independent)
TARGET_FILE_BYTES = 256 * 1024
# fixed-width estimate per event row on top of the variable props payload
ROW_OVERHEAD_BYTES = 64


def _quantile_disc_expr(q: float) -> str:
    """DuckDB: smallest frequency value whose cumulative key-count reaches
    ceil(q * n_keys), from the counts-of-counts CTE ``cc``."""
    return f"""(
        SELECT min(cnt) FROM (
            SELECT cnt,
                   sum(freq) OVER (ORDER BY cnt
                                   ROWS UNBOUNDED PRECEDING) AS cum,
                   (SELECT sum(freq) FROM cc) AS nk
            FROM cc
        ) WHERE cum >= ceil({q} * nk)
    )"""


@register(
    "key_skew_report",
    oracle=f"""
        WITH counts AS (
            SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
        ),
        cc AS (
            SELECT cnt, count(*) AS freq FROM counts GROUP BY cnt
        ),
        sums AS (
            SELECT count(*) AS n_keys,
                   sum(cnt)::BIGINT AS total_rows,
                   max(cnt)::BIGINT AS max_cnt,
                   sum(cnt * cnt)::BIGINT AS sum_sq
            FROM counts
        )
        SELECT CAST(n_keys AS BIGINT) AS n_keys,
               total_rows,
               max_cnt,
               CAST({_quantile_disc_expr(0.5)} AS BIGINT) AS p50_cnt,
               CAST({_quantile_disc_expr(0.99)} AS BIGINT) AS p99_cnt,
               round(max_cnt / total_rows::DOUBLE, 6) AS top1_share,
               round(sqrt(sum_sq / n_keys::DOUBLE
                          - (total_rows / n_keys::DOUBLE)
                            * (total_rows / n_keys::DOUBLE))
                     / (total_rows / n_keys::DOUBLE), 6) AS cv,
               round(max_cnt / ({_quantile_disc_expr(0.5)})::DOUBLE, 6)
                   AS skew_ratio
        FROM sums
    """,
    doc="Shuffle-key skew profile for events.user_id: key count, max/p99/"
    "p50 key frequency (discrete quantiles via a counts-of-counts table — "
    "scalable and engine-agnostic), hottest-key row share, coefficient of "
    "variation from exact integer power sums, and max/median skew ratio — "
    "the numbers that decide whether a key needs salting or AQE skew "
    "splitting before a 100 TB join. One narrow-key aggregate collapses "
    "the corpus; every window after that runs over the distinct-frequency "
    "table (tiny by construction)",
    tags=("events", "stats", "skew", "diagnostics"),
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    # counts-of-counts: one row per DISTINCT frequency value — the
    # cumulative window below touches only this corpus-size-independent
    # table, never the per-key table
    cc = counts.groupBy("cnt").agg(F.count("*").alias("freq"))
    cum = cc.select(
        "cnt",
        F.sum("freq")
        .over(W.orderBy("cnt").rowsBetween(W.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("freq").over(W.partitionBy()).alias("nk"),
    )

    def qdisc(q: float) -> DataFrame:
        # round before int(): float products like 0.29*100 truncate to 28
        return cum.where(
            F.col("cum") >= F.ceil(F.lit(q) * F.col("nk"))
        ).agg(F.min("cnt").alias(f"_q{int(round(q * 100))}"))

    sums = counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").cast("bigint").alias("total_rows"),
        F.max("cnt").cast("bigint").alias("max_cnt"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("sum_sq"),
    )
    one = (
        sums.withColumn("_k", F.lit(1))
        .join(qdisc(0.5).withColumn("_k", F.lit(1)), "_k")
        .join(qdisc(0.99).withColumn("_k", F.lit(1)), "_k")
    )
    mean = F.col("total_rows") / F.col("n_keys").cast("double")
    var = F.col("sum_sq") / F.col("n_keys").cast("double") - mean * mean
    return one.select(
        F.col("n_keys").cast("bigint").alias("n_keys"),
        "total_rows",
        "max_cnt",
        F.col("_q50").cast("bigint").alias("p50_cnt"),
        F.col("_q99").cast("bigint").alias("p99_cnt"),
        F.round(F.col("max_cnt") / F.col("total_rows").cast("double"), 6).alias(
            "top1_share"
        ),
        F.round(F.sqrt(var) / mean, 6).alias("cv"),
        F.round(F.col("max_cnt") / F.col("_q50").cast("double"), 6).alias(
            "skew_ratio"
        ),
    )


@register(
    "compaction_plan_stats",
    oracle=f"""
        SELECT CAST(ts::DATE AS VARCHAR) AS day,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(length(props) + {ROW_OVERHEAD_BYTES})
                    AS BIGINT) AS est_bytes,
               CAST(ceil(sum(length(props) + {ROW_OVERHEAD_BYTES})
                         / {TARGET_FILE_BYTES}.0) AS BIGINT) AS target_files,
               sum(length(props) + {ROW_OVERHEAD_BYTES})
                   < {TARGET_FILE_BYTES} AS undersized
        FROM events
        GROUP BY day
    """,
    doc="Compaction planning per event-day partition: estimated bytes "
    "(payload length + fixed row overhead), the file count at a "
    f"{TARGET_FILE_BYTES}-byte budget (128 MiB in production), and an "
    "undersized flag marking partitions that should merge into their "
    "neighbors — the small-files pass every long-lived table needs. One "
    "partition-grain aggregate; output is metadata-sized at any scale",
    tags=("events", "diagnostics", "agg", "date"),
)
def q_compaction_plan_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    est = F.sum(F.length("props") + ROW_OVERHEAD_BYTES)
    return (
        ev.groupBy(F.col("ts").cast("date").cast("string").alias("day"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            est.cast("bigint").alias("est_bytes"),
            F.ceil(est / float(TARGET_FILE_BYTES)).cast("bigint").alias(
                "target_files"
            ),
            (est < TARGET_FILE_BYTES).alias("undersized"),
        )
    )


# --------------------------------------------------------------------------
# Data-quality audit: the dbt-test / Great-Expectations pattern as one
# oracle-checked query — referential integrity, primary-key uniqueness,
# null and range contracts, each reported as (checked, violations, pass).
@register(
    "dq_audit_stats",
    oracle="""
        SELECT 'lineitem_orphan_orderkey' AS check_name,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_checked,
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
                WHERE NOT EXISTS (SELECT 1 FROM orders o
                                  WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        UNION ALL
        SELECT 'orders_orphan_custkey',
               (SELECT CAST(count(*) AS BIGINT) FROM orders),
               (SELECT CAST(count(*) AS BIGINT) FROM orders o
                WHERE NOT EXISTS (SELECT 1 FROM customer c
                                  WHERE c.c_custkey = o.o_custkey))
        UNION ALL
        SELECT 'customer_orphan_nationkey',
               (SELECT CAST(count(*) AS BIGINT) FROM customer),
               (SELECT CAST(count(*) AS BIGINT) FROM customer c
                WHERE NOT EXISTS (SELECT 1 FROM nation n
                                  WHERE n.n_nationkey = c.c_nationkey))
        UNION ALL
        SELECT 'orders_pk_duplicates',
               (SELECT CAST(count(*) AS BIGINT) FROM orders),
               (SELECT CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
                FROM orders)
        UNION ALL
        SELECT 'lineitem_pk_duplicates',
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(count(*) - count(DISTINCT l_orderkey * 100 + l_linenumber)
                            AS BIGINT) FROM lineitem)
        UNION ALL
        SELECT 'lineitem_quantity_range',
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50
                                     THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
        UNION ALL
        SELECT 'lineitem_discount_range',
               (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
               (SELECT CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1
                                     THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem)
        UNION ALL
        SELECT 'documents_empty_text',
               (SELECT CAST(count(*) AS BIGINT) FROM documents),
               (SELECT CAST(sum(CASE WHEN text IS NULL OR text = ''
                                     THEN 1 ELSE 0 END) AS BIGINT) FROM documents)
    """,
    doc="Data-quality audit suite (the dbt-test / expectations pattern): "
    "referential integrity (lineitem->orders, orders->customer, "
    "customer->nation via anti-join counts), primary-key uniqueness "
    "(count minus distinct), and range/null contracts — one row per "
    "check with checked/violation counts. Scale: every check is either a "
    "single-pass conditional aggregate (map-side combined) or an "
    "anti-join whose dimension side broadcasts; the whole audit is a "
    "union of one-row aggregates, so checks run in parallel stages and "
    "the output is metadata-sized regardless of table size",
    tags=("diagnostics", "quality"),
)
def q_dq_audit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    docs = load_table(spark, sf_dir, "documents")

    def rows_of(agg_df: DataFrame, checks: list[str]) -> DataFrame:
        # one wide aggregate row -> one output row per check via stack():
        # the big table is SCANNED ONCE for all its conditional checks.
        stack_args = ", ".join(
            f"'{name}', `n_{name}`" for name in checks
        )
        return agg_df.selectExpr(
            f"stack({len(checks)}, {stack_args}) AS (check_name, n_violations)",
            "n_checked",
        ).select("check_name", "n_checked", "n_violations")

    li_row = li.agg(
        F.count("*").cast("bigint").alias("n_checked"),
        (F.count("*") - F.countDistinct(F.col("l_orderkey") * 100 + F.col("l_linenumber")))
        .cast("bigint")
        .alias("n_lineitem_pk_duplicates"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_lineitem_quantity_range"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_lineitem_discount_range"),
    )
    orders_row = orders.agg(
        F.count("*").cast("bigint").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("n_orders_pk_duplicates"),
    )
    docs_row = docs.agg(
        F.count("*").cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("text").isNull() | (F.col("text") == ""), 1).otherwise(0))
        .cast("bigint")
        .alias("n_documents_empty_text"),
    )

    def ref_check(name: str, checked: DataFrame, violations: DataFrame) -> DataFrame:
        n = checked.agg(F.count("*").cast("bigint").alias("n_checked"))
        v = violations.agg(F.count("*").cast("bigint").alias("n_violations"))
        return n.crossJoin(v).select(
            F.lit(name).alias("check_name"), "n_checked", "n_violations"
        )

    rows = [
        ref_check(
            "lineitem_orphan_orderkey",
            li,
            li.join(orders, li.l_orderkey == orders.o_orderkey, "anti"),
        ),
        ref_check(
            "orders_orphan_custkey",
            orders,
            orders.join(cust, orders.o_custkey == cust.c_custkey, "anti"),
        ),
        ref_check(
            "customer_orphan_nationkey",
            cust,
            cust.join(
                F.broadcast(nation),
                cust.c_nationkey == nation.n_nationkey,
                "anti",
            ),
        ),
        rows_of(orders_row, ["orders_pk_duplicates"]),
        rows_of(
            li_row,
            [
                "lineitem_pk_duplicates",
                "lineitem_quantity_range",
                "lineitem_discount_range",
            ],
        ),
        rows_of(docs_row, ["documents_empty_text"]),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# --------------------------------------------------------------------------
# Benford first-digit audit: fabricated or corrupted monetary columns
# betray themselves by a first-significant-digit distribution that strays
# from log10(1 + 1/d). Digit extraction is pure float math (floor/log10 on
# the identical IEEE doubles), never string formatting — engines disagree
# on number->string, they agree on arithmetic.
@register(
    "benford_digit_stats",
    oracle="""
        WITH d AS (
            SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS BIGINT) AS digit
            FROM orders WHERE o_totalprice > 0
        ),
        c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c)
        SELECT digit, n,
               round(CAST(n AS DOUBLE) / total, 6) AS observed_freq,
               round(log10(1.0 + 1.0 / digit), 6) AS benford_expected,
               round(pow(CAST(n AS DOUBLE) / total
                         - log10(1.0 + 1.0 / digit), 2)
                     / log10(1.0 + 1.0 / digit), 6) AS chi2_term
        FROM c CROSS JOIN t
    """,
    doc="Benford's-law first-digit audit of o_totalprice: observed vs "
    "expected log10(1+1/d) frequencies with per-digit chi-square terms — "
    "the forensic data-quality screen for monetary columns. Digit "
    "extraction: exact integer cents (round(x*100) is exact for 2dp "
    "money) rendered as a string — INTEGER printing is bit-identical "
    "everywhere, whereas floor(log10(x)) sits on a discontinuity where "
    "Java Math.log10 and libm may round a power-of-ten differently, and "
    "float printing differs across engines. Scale: one map-side-combined "
    "9-key aggregation plus a broadcast one-row total",
    tags=("diagnostics", "quality", "stats"),
)
def q_benford_digit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"),
        1,
        1,
    ).cast("bigint")
    c = (
        orders.where(F.col("o_totalprice") > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").alias("n"))
    )
    t = c.agg(F.sum("n").cast("bigint").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return c.crossJoin(F.broadcast(t)).select(
        "digit",
        "n",
        F.round(obs, 6).alias("observed_freq"),
        F.round(exp, 6).alias("benford_expected"),
        F.round(F.pow(obs - exp, F.lit(2.0)) / exp, 6).alias("chi2_term"),
    )


# --------------------------------------------------------------------------
# Consistent-hashing rebalance audit: how many keys MOVE when the shard
# count changes 16 -> 17, under (a) mod-N assignment (nearly everything
# moves) vs (b) a REAL token ring with virtual nodes (only the new
# shard's arcs move, ~ vnodes_new / vnodes_total). The reason every
# distributed store shards by ring, measured on real keys with the
# portable hash — pure integer arithmetic, bit-identical in both engines.
CH_OLD_N = 16
CH_NEW_N = 17
CH_VNODES = 64
CH_RING = 1 << 30


@register(
    "consistent_hash_rebalance",
    oracle=f"""
        WITH keys AS (
            SELECT DISTINCT {portable_hash64_sql('CAST(o_custkey AS VARCHAR)')} AS h
            FROM orders
        ),
        tokens AS (
            SELECT (t.t // {CH_VNODES}) AS owner,  -- // : DuckDB float-cast ROUNDS
                   {portable_hash64_sql("('tok:' || CAST(t.t AS VARCHAR))")}
                       % {CH_RING} AS pos
            FROM (SELECT unnest(range({CH_NEW_N * CH_VNODES})) AS t) t
        ),
        toks AS (  -- dedupe ring positions deterministically
            SELECT pos, min(owner) AS owner FROM tokens GROUP BY pos
        ),
        scored AS (
            SELECT k.h,
                   ((toks.pos - (k.h % {CH_RING})) % {CH_RING}
                    + {CH_RING}) % {CH_RING} AS d,
                   toks.owner
            FROM keys k CROSS JOIN toks
        ),
        owners AS (
            SELECT h,
                   arg_min(owner, d) FILTER (WHERE owner < {CH_OLD_N}) AS own_old,
                   arg_min(owner, d) AS own_new
            FROM scored GROUP BY h
        ),
        m AS (
            SELECT h, own_old, own_new,
                   h % {CH_OLD_N} AS mod_old, h % {CH_NEW_N} AS mod_new
            FROM owners JOIN keys USING (h)
        )
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS moved_mod,
               CAST(sum(CASE WHEN own_old <> own_new THEN 1 ELSE 0 END) AS BIGINT)
                   AS moved_ring,
               round(CAST(sum(CASE WHEN mod_old <> mod_new THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS frac_moved_mod,
               round(CAST(sum(CASE WHEN own_old <> own_new THEN 1 ELSE 0 END)
                          AS DOUBLE) / count(*), 6) AS frac_moved_ring
        FROM m
    """,
    doc=f"Shard-rebalance audit ({CH_OLD_N} -> {CH_NEW_N} shards): fraction "
    "of keys that move under mod-N assignment (~ (N-1)/N, a full "
    f"reshuffle) vs a REAL consistent-hash ring with {CH_VNODES} virtual "
    "nodes per shard (only the new shard's arcs move, ~ 1/(N+1)) — "
    "measured on the real customer-key distribution with the portable "
    "hash: the reason resharding a 100 TB store uses rings. Token table "
    f"is fixed-size ({CH_NEW_N * CH_VNODES} rows, broadcast); ownership "
    "is an argmin of clockwise distance per key (production replaces the "
    "argmin scan with an interval join on sorted token arcs — same "
    "result, same broadcast). Old-ring ownership reuses the SAME tokens "
    "filtered to the surviving shards, which is exactly the consistency "
    "property being measured. Pure integer arithmetic in both engines",
    tags=("diagnostics", "stats"),
)
def q_consistent_hash_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import portable_hash64

    orders = load_table(spark, sf_dir, "orders")
    spark_s = orders.sparkSession
    keys = orders.select(
        portable_hash64(F.col("o_custkey").cast("string")).alias("h")
    ).distinct()
    tokens = spark_s.range(CH_NEW_N * CH_VNODES).select(
        (F.col("id") / CH_VNODES).cast("bigint").alias("owner"),
        (
            portable_hash64(F.concat(F.lit("tok:"), F.col("id").cast("string")))
            % CH_RING
        ).alias("pos"),
    )
    toks = tokens.groupBy("pos").agg(F.min("owner").alias("owner"))
    d = (
        (F.col("pos") - (F.col("h") % CH_RING)) % CH_RING + CH_RING
    ) % CH_RING
    scored = keys.crossJoin(F.broadcast(toks)).select(
        "h", d.alias("d"), "owner"
    )
    owners = scored.groupBy("h").agg(
        F.min_by("owner", F.when(F.col("owner") < CH_OLD_N, F.col("d"))).alias(
            "own_old"
        ),
        F.min_by("owner", "d").alias("own_new"),
    )
    m = owners.select(
        "h",
        "own_old",
        "own_new",
        (F.col("h") % CH_OLD_N).alias("mod_old"),
        (F.col("h") % CH_NEW_N).alias("mod_new"),
    )
    moved_mod = F.sum(
        F.when(F.col("mod_old") != F.col("mod_new"), 1).otherwise(0)
    ).cast("bigint")
    moved_ring = F.sum(
        F.when(F.col("own_old") != F.col("own_new"), 1).otherwise(0)
    ).cast("bigint")
    return m.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        moved_mod.alias("moved_mod"),
        moved_ring.alias("moved_ring"),
        F.round(moved_mod.cast("double") / F.count("*"), 6).alias(
            "frac_moved_mod"
        ),
        F.round(moved_ring.cast("double") / F.count("*"), 6).alias(
            "frac_moved_ring"
        ),
    )


# --------------------------------------------------------------------------
# Range-partitioner balance audit: exact-percentile cut points (what
# Spark's RangePartitioner approximates by sampling) and the resulting
# per-partition row counts — quantifying how balanced a range shuffle or
# a sorted file layout would be on this column.
RANGE_PARTS = 32
_RANGE_FRACS = [k / RANGE_PARTS for k in range(1, RANGE_PARTS)]


@register(
    "range_partition_balance",
    oracle=f"""
        WITH cuts AS (
            SELECT quantile_cont(o_totalprice,
                                 [{", ".join(str(f) for f in _RANGE_FRACS)}])
                       AS cs
            FROM orders
        ),
        pids AS (
            SELECT len(list_filter(cs, c -> o_totalprice > c)) AS pid
            FROM orders CROSS JOIN cuts
        ),
        cnt AS (
            SELECT pid, CAST(count(*) AS BIGINT) AS n_rows FROM pids GROUP BY pid
        ),
        tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS t FROM cnt)
        SELECT CAST(pid AS BIGINT) AS pid, n_rows,
               round(CAST(n_rows AS DOUBLE) / t, 6) AS frac
        FROM cnt CROSS JOIN tot
    """,
    doc=f"Range-partitioner balance audit: {RANGE_PARTS} partitions cut at "
    "EXACT o_totalprice percentiles (the boundary set Spark's "
    "RangePartitioner estimates by reservoir sampling), with per-"
    "partition row counts and shares — the skew check you run before "
    "committing to a sorted layout or range shuffle at 100 TB. Cut "
    "points broadcast as one array row; partition id is a pure "
    "column-level array scan (Spark percentile == DuckDB quantile_cont, "
    "so boundaries agree bit-for-bit)",
    tags=("diagnostics", "percentile", "stats"),
)
def q_range_partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cuts = orders.agg(
        F.percentile(
            "o_totalprice", F.array(*[F.lit(f) for f in _RANGE_FRACS])
        ).alias("cs")
    )
    pids = orders.crossJoin(F.broadcast(cuts)).select(
        F.size(
            F.filter(F.col("cs"), lambda c: F.col("o_totalprice") > c)
        ).alias("pid")
    )
    cnt = pids.groupBy("pid").agg(F.count("*").alias("n_rows"))
    tot = cnt.agg(F.sum("n_rows").cast("bigint").alias("t"))
    return cnt.crossJoin(F.broadcast(tot)).select(
        F.col("pid").cast("bigint").alias("pid"),
        "n_rows",
        F.round(F.col("n_rows").cast("double") / F.col("t"), 6).alias("frac"),
    )


# --------------------------------------------------------------------------
# Join-cardinality estimator evaluation: the textbook optimizer estimate
# |R JOIN S| ~ |R|*|S| / max(ndv_R(k), ndv_S(k)) (uniformity + containment
# assumptions) against the TRUE join size computed without materializing
# the join (sum of per-key count products). The diagnostic that explains
# why a skewed key blows up an optimizer's plan choice.
@register(
    "join_cardinality_eval",
    oracle="""
        WITH r AS (
            SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1
        ),
        s AS (
            SELECT c_custkey AS k, count(*) AS c FROM customer GROUP BY 1
        ),
        actual AS (
            SELECT CAST(sum(r.c * s.c) AS BIGINT) AS act
            FROM r JOIN s USING (k)
        ),
        stats AS (
            SELECT (SELECT CAST(sum(c) AS BIGINT) FROM r) AS nr,
                   (SELECT CAST(sum(c) AS BIGINT) FROM s) AS ns,
                   (SELECT CAST(count(*) AS BIGINT) FROM r) AS ndv_r,
                   (SELECT CAST(count(*) AS BIGINT) FROM s) AS ndv_s
        )
        SELECT nr AS n_left, ns AS n_right, ndv_r, ndv_s, act AS actual_rows,
               CAST(floor(CAST(nr AS DOUBLE) * ns
                          / greatest(ndv_r, ndv_s)) AS BIGINT) AS estimated_rows,
               round(CAST(nr AS DOUBLE) * ns / greatest(ndv_r, ndv_s)
                     / nullif(act, 0), 6) AS est_over_actual
        FROM stats CROSS JOIN actual
    """,
    doc="Join-cardinality estimator evaluation (orders x customer on "
    "custkey): the classic |R|*|S|/max(ndv) uniformity estimate next to "
    "the TRUE join size — computed as sum of per-key count products over "
    "the two count tables, never by materializing the join. The "
    "over/under ratio is the signal that tells you whether skew will "
    "invalidate the optimizer's plan choice at 100 TB. Two narrow "
    "per-key aggregates + a key-grid join of the count tables",
    tags=("diagnostics", "join", "stats"),
)
def q_join_cardinality_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    r = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").alias("c")
    )
    s = cust.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").alias("c2")
    )
    actual = (
        r.join(s, "k")
        .agg(F.sum(F.col("c") * F.col("c2")).cast("bigint").alias("act"))
    )
    stats = (
        r.agg(
            F.sum("c").cast("bigint").alias("nr"),
            F.count("*").cast("bigint").alias("ndv_r"),
        )
        .crossJoin(
            s.agg(
                F.sum("c2").cast("bigint").alias("ns"),
                F.count("*").cast("bigint").alias("ndv_s"),
            )
        )
    )
    est = (
        F.col("nr").cast("double")
        * F.col("ns")
        / F.greatest("ndv_r", "ndv_s")
    )
    return stats.crossJoin(F.broadcast(actual)).select(
        F.col("nr").alias("n_left"),
        F.col("ns").alias("n_right"),
        "ndv_r",
        "ndv_s",
        F.col("act").alias("actual_rows"),
        F.floor(est).cast("bigint").alias("estimated_rows"),
        F.round(est / F.nullif(F.col("act"), F.lit(0)), 6).alias(
            "est_over_actual"
        ),
    )


# --------------------------------------------------------------------------
# Functional-dependency discovery: for candidate FDs A -> B, the number
# of A-groups mapping to more than one B value — the data-profiling pass
# that finds real keys, denormalization opportunities, and broken
# assumptions before schema decisions. Each FD check is ONE narrow
# two-column aggregate (count distinct B per A, then counts-of-violators).
@register(
    "functional_dependency_audit",
    oracle="""
        WITH fd1 AS (
            SELECT count(*) AS n_groups,
                   sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS n_violating
            FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS ndv
                  FROM orders GROUP BY o_orderkey)
        ),
        fd2 AS (
            SELECT count(*) AS n_groups,
                   sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS n_violating
            FROM (SELECT c_custkey, count(DISTINCT c_nationkey) AS ndv
                  FROM customer GROUP BY c_custkey)
        ),
        fd3 AS (
            SELECT count(*) AS n_groups,
                   sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS n_violating
            FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS ndv
                  FROM lineitem GROUP BY l_partkey)
        ),
        fd4 AS (
            SELECT count(*) AS n_groups,
                   sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS n_violating
            FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS ndv
                  FROM nation GROUP BY n_nationkey)
        )
        SELECT 'o_orderkey->o_custkey' AS fd,
               CAST(n_groups AS BIGINT) AS n_lhs_groups,
               CAST(n_violating AS BIGINT) AS n_violating,
               n_violating = 0 AS holds
        FROM fd1
        UNION ALL
        SELECT 'c_custkey->c_nationkey', CAST(n_groups AS BIGINT),
               CAST(n_violating AS BIGINT), n_violating = 0 FROM fd2
        UNION ALL
        SELECT 'l_partkey->l_suppkey', CAST(n_groups AS BIGINT),
               CAST(n_violating AS BIGINT), n_violating = 0 FROM fd3
        UNION ALL
        SELECT 'n_nationkey->n_regionkey', CAST(n_groups AS BIGINT),
               CAST(n_violating AS BIGINT), n_violating = 0 FROM fd4
    """,
    doc="Functional-dependency discovery over four candidate FDs (two "
    "true keys, one many-to-many that must FAIL, one dimension "
    "hierarchy): per FD, the LHS group count, groups mapping to >1 RHS "
    "value, and a holds verdict — the profiling pass behind key "
    "inference and normalization decisions. Each check is one narrow "
    "(A, distinct B) aggregate, map-side combined; output is four rows "
    "at any scale",
    tags=("diagnostics", "stats", "quality"),
)
def q_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def fd(df: DataFrame, name: str, a: str, b: str) -> DataFrame:
        g = df.groupBy(a).agg(F.countDistinct(b).alias("ndv"))
        return g.agg(
            F.count("*").cast("bigint").alias("n_lhs_groups"),
            F.sum(F.when(F.col("ndv") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
        ).select(
            F.lit(name).alias("fd"),
            "n_lhs_groups",
            "n_violating",
            (F.col("n_violating") == 0).alias("holds"),
        )

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        fd(orders, "o_orderkey->o_custkey", "o_orderkey", "o_custkey")
        .unionAll(fd(cust, "c_custkey->c_nationkey", "c_custkey", "c_nationkey"))
        .unionAll(fd(li, "l_partkey->l_suppkey", "l_partkey", "l_suppkey"))
        .unionAll(
            fd(nation, "n_nationkey->n_regionkey", "n_nationkey", "n_regionkey")
        )
    )
