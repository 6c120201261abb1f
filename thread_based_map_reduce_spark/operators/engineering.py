"""Data-engineering patterns round 4 (late): sketch-based frequency
estimation, runtime Bloom-filter join pruning, incremental
materialized-view maintenance, and deterministic A/B significance testing.

These are the remaining classic engine-room patterns the catalog did not
yet cover. The reference engine (`MapReduceFramework.cpp`, ~580 LoC
pthread MapReduce) has none of this surface; they are SURVEY-§2.3-style
extensions whose correctness is proven by the independent DuckDB oracle.

Why each one matters at 100 TB, in one line apiece:

- **Count-Min sketch** (`countmin_topk_estimate`): a frequency table over
  a web-scale vocabulary does not fit anywhere, but a D×W counter grid of
  FIXED size does — and it is mergeable, so Spark's map-side partial
  aggregation builds it with one narrow (k, bucket) shuffle whose key
  space is ≤ D·W regardless of corpus size.
- **Bloom-filter probe** (`bloom_filter_join_stats`): the runtime-filter
  trick big joins live on — broadcast an M-bit set of the small side's
  keys and drop non-matching probe rows BEFORE the shuffle. The M-bit
  array is fixed-size; the probe stage is map-side only. (Spark's own
  `spark.sql.optimizer.runtime.bloomFilter.enabled` automates the
  pattern; this operator makes the mechanics + its false-positive-rate
  contract measurable and oracle-checkable.)
- **Incremental MV refresh** (`mv_incremental_refresh`): at 100 TB you
  never re-aggregate the base — you aggregate the (small) delta and merge
  it into the stored MV. Decimal-exact sums make "incremental == full
  recompute" literally bit-true, which is what the oracle asserts.
- **A/B z-test** (`ab_test_zstat`): deterministic hash-based assignment
  (no RNG — replayable in any engine) plus a two-proportion z statistic
  from exact integer counts: the measurement loop of every data-driven
  rollout, in one shuffle on user_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import (
    minhash_perm,
    minhash_perm_sql,
    portable_hash64,
    portable_hash64_sql,
)
from ..functions.textfns import tokens
from ..plans.catalog import register
from ..sources.registry import load_table

# --------------------------------------------------------------------------
# Count-Min sketch: D independent hash rows × W buckets. Estimate error is
# bounded by eps = e/W of the total mass with probability 1 - e^-D; the
# sketch never undercounts, so `overcount >= 0` is a hard invariant (tested
# in tests/test_engineering.py and visible in the output column).
CM_D = 4
CM_W = 1024
CM_TOPN = 10

_CM_KS = ", ".join(f"({k})" for k in range(CM_D))


def _cm_bucket_sql(hash_expr: str) -> str:
    cases = " ".join(
        f"WHEN {k} THEN ({minhash_perm_sql(hash_expr, k)}) % {CM_W}"
        for k in range(CM_D)
    )
    return f"CASE k {cases} END"


def _cm_bucket_cols(h):
    return [(minhash_perm(h, k) % CM_W).alias(f"b{k}") for k in range(CM_D)]


def _cm_kb_explode(df: DataFrame, extra: list[str]) -> DataFrame:
    """Explode per-word bucket columns b0..b{D-1} into (k, bucket) rows."""
    kb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(k).cast("int").alias("k"), F.col(f"b{k}").alias("bucket")
                )
                for k in range(CM_D)
            ]
        )
    ).alias("kb")
    return df.select(*extra, kb).select(
        *extra, F.col("kb.k").alias("k"), F.col("kb.bucket").alias("bucket")
    )


@register(
    "countmin_topk_estimate",
    oracle=f"""
        WITH counts AS (
            SELECT word, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> ''
            GROUP BY word
        ),
        hashed AS (
            SELECT word, n, {portable_hash64_sql('word')} AS h FROM counts
        ),
        ks(k) AS (VALUES {_CM_KS}),
        sketch AS (
            SELECT k, {_cm_bucket_sql('h')} AS bucket,
                   CAST(sum(n) AS BIGINT) AS cnt
            FROM hashed CROSS JOIN ks
            GROUP BY 1, 2
        ),
        topn AS (
            SELECT word, n, h,
                   row_number() OVER (ORDER BY n DESC, word) AS rnk
            FROM hashed
            QUALIFY rnk <= {CM_TOPN}
        ),
        probe AS (
            SELECT word, n, rnk, k, {_cm_bucket_sql('h')} AS bucket
            FROM topn CROSS JOIN ks
        )
        SELECT word, n AS true_n,
               CAST(min(cnt) AS BIGINT) AS cm_est,
               CAST(min(cnt) - n AS BIGINT) AS overcount,
               CAST(rnk AS BIGINT) AS rnk
        FROM probe JOIN sketch USING (k, bucket)
        GROUP BY word, n, rnk
    """,
    doc="Count-Min sketch frequency estimation over the corpus vocabulary: "
    f"a {CM_D}x{CM_W} counter grid built with ONE narrow (k, bucket) "
    "shuffle (map-side combinable, key space fixed at D*W regardless of "
    "corpus size), probed for the exact top-10 words. Output carries the "
    "true count, the sketch estimate, and the (always >= 0) overcount, so "
    "the sketch's one-sided error contract sits directly under the hash "
    "gate. Hash family: the same portable md5-based universal hashes the "
    "minhash family uses (functions/hashing.py) — bit-identical in DuckDB",
    tags=("text", "approx", "agg"),
)
def q_countmin_topk_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    h = portable_hash64(F.col("word"))
    hashed = counts.select("word", "n", *_cm_bucket_cols(h))
    # Sketch build: one aggregation over a key space of at most D*W cells —
    # the whole point of CM at scale (the shuffle width is independent of
    # the vocabulary size; partial aggregation compresses map-side).
    sketch = (
        _cm_kb_explode(hashed, ["n"])
        .groupBy("k", "bucket")
        .agg(F.sum("n").alias("cnt"))
    )
    # Exact top-N via distributed TakeOrderedAndProject; the 10-row window
    # that assigns rnk afterwards is bounded by construction.
    topn = (
        hashed.orderBy(F.desc("n"), "word")
        .limit(CM_TOPN)
        .withColumn("rnk", F.row_number().over(W.orderBy(F.desc("n"), "word")))
    )
    probe = _cm_kb_explode(topn, ["word", "n", "rnk"])
    return (
        probe.join(F.broadcast(sketch), ["k", "bucket"])
        .groupBy("word", "n", "rnk")
        .agg(F.min("cnt").alias("est"))
        .select(
            "word",
            F.col("n").alias("true_n"),
            F.col("est").alias("cm_est"),
            (F.col("est") - F.col("n")).alias("overcount"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


# --------------------------------------------------------------------------
# Bloom filter: K hash functions into an M-bit array. With n build keys,
# expected false-positive rate ~ (1 - (1 - 1/M)^(K*n))^K.
BLOOM_M = 8192
BLOOM_K = 3
BLOOM_SEGMENT = "BUILDING"

_BLOOM_KS = ", ".join(f"({k})" for k in range(BLOOM_K))


def _bloom_bit_sql(hash_expr: str) -> str:
    cases = " ".join(
        f"WHEN {k} THEN ({minhash_perm_sql(hash_expr, k)}) % {BLOOM_M}"
        for k in range(BLOOM_K)
    )
    return f"CASE k {cases} END"


@register(
    "bloom_filter_join_stats",
    oracle=f"""
        WITH build AS (
            SELECT c_custkey, {portable_hash64_sql('CAST(c_custkey AS VARCHAR)')} AS h
            FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'
        ),
        ks(k) AS (VALUES {_BLOOM_KS}),
        bits AS (
            SELECT DISTINCT {_bloom_bit_sql('h')} AS bit FROM build CROSS JOIN ks
        ),
        probe AS (
            SELECT o_orderkey, o_custkey,
                   {portable_hash64_sql('CAST(o_custkey AS VARCHAR)')} AS h
            FROM orders
        ),
        hits AS (
            SELECT o_orderkey,
                   count(*) AS nset
            FROM (SELECT o_orderkey, {_bloom_bit_sql('h')} AS bit
                  FROM probe CROSS JOIN ks) p
            JOIN bits USING (bit)
            GROUP BY o_orderkey
        ),
        agg AS (
            SELECT
                (SELECT CAST(count(*) AS BIGINT) FROM build) AS n_build_keys,
                (SELECT CAST(count(*) AS BIGINT) FROM bits) AS n_bits_set,
                (SELECT CAST(count(*) AS BIGINT) FROM probe) AS n_probe,
                (SELECT CAST(count(*) AS BIGINT) FROM hits WHERE nset = {BLOOM_K}) AS n_pass,
                (SELECT CAST(count(*) AS BIGINT) FROM probe
                 WHERE o_custkey IN (SELECT c_custkey FROM build)) AS n_true_members
        )
        SELECT n_build_keys, n_bits_set, n_probe, n_pass, n_true_members,
               n_pass - n_true_members AS n_false_pos,
               round(CAST(n_pass - n_true_members AS DOUBLE)
                     / nullif(n_probe - n_true_members, 0), 6) AS fpr_measured,
               round(pow(1.0 - pow(1.0 - 1.0/{BLOOM_M},
                                   {BLOOM_K} * n_build_keys), {BLOOM_K}), 6)
                   AS fpr_expected
        FROM agg
    """,
    doc="Runtime Bloom-filter join pruning, measured: build an "
    f"{BLOOM_M}-bit / {BLOOM_K}-hash filter over the '{BLOOM_SEGMENT}'-"
    "segment customer keys, probe every order through it, and report pass "
    "/ true-member / false-positive counts plus measured-vs-expected FPR. "
    "Scale shape: the bit set is a fixed-size broadcast (the small side's "
    "whole point); the probe is map-side only — orders that fail the "
    "filter would never reach the join shuffle. A probe row passes iff "
    "all K of its bit positions are set (counted with multiplicity, so "
    "colliding positions stay correct). Oracle replays the identical bit "
    "arithmetic in DuckDB",
    tags=("join", "approx", "diagnostics"),
)
def q_bloom_filter_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    build = cust.where(F.col("c_mktsegment") == BLOOM_SEGMENT).select("c_custkey")
    bh = portable_hash64(F.col("c_custkey").cast("string"))
    bits = (
        build.select(
            F.explode(
                F.array(*[(minhash_perm(bh, k) % BLOOM_M) for k in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
    )
    oh = portable_hash64(F.col("o_custkey").cast("string"))
    opos = orders.select(
        "o_orderkey",
        F.explode(
            F.array(*[(minhash_perm(oh, k) % BLOOM_M) for k in range(BLOOM_K)])
        ).alias("bit"),
    )
    # The membership test: every probe row explodes to K bit positions and
    # passes iff all K hit the broadcast bit set. Duplicate positions match
    # the same bit twice, so the with-multiplicity count of K is exact.
    hits = (
        opos.join(F.broadcast(bits), "bit")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("nset"))
    )
    n_pass = hits.where(F.col("nset") == BLOOM_K).agg(
        F.count("*").alias("n_pass")
    )
    n_true = orders.join(F.broadcast(build), orders.o_custkey == build.c_custkey, "semi").agg(
        F.count("*").alias("n_true_members")
    )
    totals = (
        build.agg(F.count("*").alias("n_build_keys"))
        .crossJoin(bits.agg(F.count("*").alias("n_bits_set")))
        .crossJoin(orders.agg(F.count("*").alias("n_probe")))
        .crossJoin(n_pass)
        .crossJoin(n_true)
    )
    fp = F.col("n_pass") - F.col("n_true_members")
    nonmember = F.col("n_probe") - F.col("n_true_members")
    expected = F.pow(
        F.lit(1.0)
        - F.pow(
            F.lit(1.0 - 1.0 / BLOOM_M), F.lit(BLOOM_K) * F.col("n_build_keys")
        ),
        F.lit(BLOOM_K),
    )
    return totals.select(
        "n_build_keys",
        "n_bits_set",
        "n_probe",
        "n_pass",
        "n_true_members",
        fp.alias("n_false_pos"),
        F.round(fp.cast("double") / F.nullif(nonmember, F.lit(0)), 6).alias(
            "fpr_measured"
        ),
        F.round(expected, 6).alias("fpr_expected"),
    )


# --------------------------------------------------------------------------
# Incremental MV maintenance: base/delta split date. Sums are carried as
# DECIMAL(30,6) so base-agg + delta-agg equals the full recompute EXACTLY
# (decimal addition is associative) — the catalog-header technique, here
# load-bearing: the oracle IS the full recompute.
MV_SPLIT = "1999-01-01"


@register(
    "mv_incremental_refresh",
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,6))), 4) AS DOUBLE)
                   AS total_price
        FROM orders
        GROUP BY 1
    """,
    doc="Incremental materialized-view maintenance: the per-month order MV "
    f"is built from a base partition (orderdate < {MV_SPLIT}) PLUS a "
    "delta aggregate merged in with a full-outer coalesce — never by "
    "re-aggregating the base. The oracle is the FULL recompute, so the "
    "hash gate asserts incremental == full bit-for-bit (decimal-exact "
    "sums make the merge associative). Scale shape: the delta aggregate "
    "is map-side-combined over only the new data; the merge join is "
    "MV-sized (months), broadcastable; the 100 TB base is never rescanned",
    tags=("agg", "incremental", "pipeline"),
)
def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")

    def mv(df: DataFrame) -> DataFrame:
        return df.groupBy(
            F.date_format("o_orderdate", "yyyy-MM").alias("month")
        ).agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(30,6)")).alias("s"),
        )

    base = mv(orders.where(F.col("o_orderdate") < F.lit(MV_SPLIT)))
    delta = mv(orders.where(F.col("o_orderdate") >= F.lit(MV_SPLIT)))
    merged = base.alias("b").join(delta.alias("d"), "month", "full_outer")
    zero = F.lit(0).cast("decimal(30,6)")
    return merged.select(
        "month",
        (
            F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n_orders"),
        F.round(
            F.coalesce(F.col("b.s"), zero) + F.coalesce(F.col("d.s"), zero), 4
        )
        .cast("double")
        .alias("total_price"),
    )


# --------------------------------------------------------------------------
# A/B test: deterministic hash-parity assignment (replayable — no RNG),
# conversion = user ever emitted a 'purchase' event, two-proportion z-test
# from exact integer counts.
@register(
    "ab_test_zstat",
    oracle=f"""
        WITH users AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
            FROM events GROUP BY user_id
        ),
        assigned AS (
            SELECT {portable_hash64_sql('CAST(user_id AS VARCHAR)')} % 2 AS v, conv
            FROM users
        ),
        agg AS (
            SELECT
                CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
                CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                CAST(sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_b
            FROM assigned
        )
        SELECT n_a, conv_a, n_b, conv_b,
               round(CAST(conv_a AS DOUBLE) / n_a, 6) AS rate_a,
               round(CAST(conv_b AS DOUBLE) / n_b, 6) AS rate_b,
               round((CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
                     / nullif(sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                                   * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b))
                                   * (1.0 / n_a + 1.0 / n_b)), 0), 6) AS z_stat
        FROM agg
    """,
    doc="Two-proportion A/B z-test with deterministic hash-parity variant "
    "assignment (portable hash % 2 — replayable in any engine, no RNG) "
    "and conversion = user ever purchased. All stats derive from exact "
    "integer counts, so both engines compute bit-identical doubles; the "
    "pooled-variance denominator is nullif-guarded against the degenerate "
    "all-convert / none-convert corpus (ADVICE r3 lesson). One shuffle on "
    "user_id, then a single-row aggregate",
    tags=("events", "stats", "eval"),
)
def q_ab_test_zstat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("conv")
    )
    assigned = users.select(
        (portable_hash64(F.col("user_id").cast("string")) % 2).alias("v"), "conv"
    )
    agg = assigned.agg(
        F.sum(F.when(F.col("v") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when(F.col("v") == 0, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("v") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when(F.col("v") == 1, F.col("conv")).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    # try_divide throughout: an empty variant (every user hashing to one
    # arm on tiny data) nulls its rate and the z-stat instead of raising
    # under ANSI mode
    rate_a = F.try_divide(F.col("conv_a").cast("double"), F.col("n_a"))
    rate_b = F.try_divide(F.col("conv_b").cast("double"), F.col("n_b"))
    pooled = F.try_divide(
        (F.col("conv_a") + F.col("conv_b")).cast("double"),
        F.col("n_a") + F.col("n_b"),
    )
    denom = F.sqrt(
        pooled
        * (F.lit(1.0) - pooled)
        * (
            F.try_divide(F.lit(1.0), F.col("n_a"))
            + F.try_divide(F.lit(1.0), F.col("n_b"))
        )
    )
    return agg.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round((rate_a - rate_b) / F.nullif(denom, F.lit(0.0)), 6).alias(
            "z_stat"
        ),
    )


# --------------------------------------------------------------------------
# MERGE-semantics CDC apply (the lakehouse MERGE INTO / upsert-delete
# pattern). The changelog derives deterministically from the documents
# table (op 'D' for doc_id % 7 == 1, else 'U' for even doc_id; base =
# doc_id % 4 != 0) so matched-update, unmatched-insert and matched-delete
# all occur; the content checksum proves the merged STATE, not just its
# cardinality, identical across engines.
CDC_HASH_MOD = 1_000_000_007


def merge_apply(base: DataFrame, chg: DataFrame) -> tuple[DataFrame, DataFrame]:
    """MERGE INTO semantics: ``base(doc_id, text)`` + changelog
    ``chg(c_doc_id, op, new_text)`` with op in ('U', 'D') -> (merged
    bookkeeping frame, final state frame). Matched 'U' updates, unmatched
    'U' inserts, matched 'D' deletes, unmatched 'D' is a no-op. One
    equi-join shuffle; property-tested against a brute-force python merge
    (tests/test_property_engineering.py)."""
    merged = base.join(
        chg, chg.c_doc_id == base.doc_id, "full_outer"
    ).select(
        F.coalesce("doc_id", "c_doc_id").alias("k"),
        "text",
        "op",
        "new_text",
        F.col("doc_id").isNotNull().alias("in_base"),
    )
    final = merged.where(F.col("op").isNull() | (F.col("op") == "U")).select(
        "k",
        F.when(F.col("op") == "U", F.col("new_text"))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return merged, final



@register(
    "cdc_merge_apply",
    oracle=f"""
        WITH base AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0
        ),
        chg AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 1 THEN 'D'
                        WHEN doc_id % 2 = 0 THEN 'U' END AS op,
                   upper(text) AS new_text
            FROM documents
            WHERE doc_id % 7 = 1 OR doc_id % 2 = 0
        ),
        merged AS (
            SELECT coalesce(b.doc_id, c.doc_id) AS doc_id,
                   b.text, c.op, c.new_text,
                   b.doc_id IS NOT NULL AS in_base,
                   c.doc_id IS NOT NULL AS in_chg
            FROM base b FULL OUTER JOIN chg c ON c.doc_id = b.doc_id
        ),
        final AS (
            SELECT doc_id,
                   CASE WHEN op = 'U' THEN new_text ELSE text END AS text
            FROM merged WHERE op IS NULL OR op = 'U'
        )
        SELECT
            (SELECT CAST(count(*) AS BIGINT) FROM base) AS n_base,
            (SELECT CAST(count(*) AS BIGINT) FROM chg) AS n_changelog,
            (SELECT CAST(count(*) AS BIGINT) FROM merged
             WHERE op = 'U' AND in_base) AS n_updated,
            (SELECT CAST(count(*) AS BIGINT) FROM merged
             WHERE op = 'U' AND NOT in_base) AS n_inserted,
            (SELECT CAST(count(*) AS BIGINT) FROM merged
             WHERE op = 'D' AND in_base) AS n_deleted,
            (SELECT CAST(count(*) AS BIGINT) FROM final) AS n_final,
            (SELECT CAST(sum({portable_hash64_sql(
                "(CAST(doc_id AS VARCHAR) || ':' || coalesce(text, ''))"
            )} % {CDC_HASH_MOD}) AS BIGINT) FROM final) AS content_checksum
    """,
    doc="MERGE INTO semantics (CDC apply): a deterministic changelog of "
    "updates/deletes/inserts full-outer-joins the base snapshot and "
    "resolves per the MERGE matched/not-matched rules; output reports "
    "applied-operation counts AND a portable-hash content checksum of "
    "the final state — the gate proves the merged DATA, not just row "
    "counts. Scale: one equi-join shuffle on the key (AQE-splittable; a "
    "typical small changelog broadcasts), map-side-combined stat "
    "aggregates; this is the incremental-upkeep sibling of "
    "mv_incremental_refresh at row granularity",
    tags=("join", "incremental", "pipeline"),
)
def q_cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.where(F.col("doc_id") % 4 != 0)
    chg = (
        docs.where((F.col("doc_id") % 7 == 1) | (F.col("doc_id") % 2 == 0))
        .select(
            F.col("doc_id").alias("c_doc_id"),
            F.when(F.col("doc_id") % 7 == 1, "D")
            .when(F.col("doc_id") % 2 == 0, "U")
            .alias("op"),
            F.upper("text").alias("new_text"),
        )
    )
    merged, final = merge_apply(base, chg)
    checksum = final.agg(
        F.sum(
            portable_hash64(
                F.concat(
                    F.col("k").cast("string"),
                    F.lit(":"),
                    F.coalesce("text", F.lit("")),
                )
            )
            % CDC_HASH_MOD
        )
        .cast("bigint")
        .alias("content_checksum")
    )
    stats = merged.agg(
        F.sum(F.when((F.col("op") == "U") & F.col("in_base"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_updated"),
        F.sum(F.when((F.col("op") == "U") & ~F.col("in_base"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_inserted"),
        F.sum(F.when((F.col("op") == "D") & F.col("in_base"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_deleted"),
    )
    return (
        base.agg(F.count("*").alias("n_base"))
        .crossJoin(chg.agg(F.count("*").alias("n_changelog")))
        .crossJoin(stats)
        .crossJoin(final.agg(F.count("*").alias("n_final")))
        .crossJoin(checksum)
        .select(
            "n_base",
            "n_changelog",
            "n_updated",
            "n_inserted",
            "n_deleted",
            "n_final",
            "content_checksum",
        )
    )


# --------------------------------------------------------------------------
# HyperLogLog over the portable hash. KMV (kmv_distinct_estimate) is the
# k-smallest-hashes sketch; this is the REGISTER sketch actually used by
# engine-native approx_count_distinct — re-built here over portable_hash64
# so the whole estimator (registers, harmonic sum, final estimate) is
# bit-identical in both engines and sits under the hash gate, unlike the
# engine-native sketch whose internals legitimately differ per engine.
#
# Layout of the 60-bit hash: low 8 bits pick one of m=256 registers, the
# remaining 52 bits are the suffix whose leading-zero rank feeds the
# register: rho = (# leading zeros of the 52-bit suffix) + 1, in 1..53.
# rho is computed with a pure integer comparison ladder (suffix >= 2^51,
# >= 2^50, ...) — no log2/floor float path, so there is no ulp hazard
# (the Benford log10 lesson). The harmonic denominator is kept EXACT by
# integer-scaling: S = sum_j 2^(53 - M_j) as BIGINT (empty registers
# contribute 2^53), max 256 * 2^53 < 2^62 — order-independent, so Spark's
# nondeterministic aggregation order cannot perturb the estimate. The
# final alpha_m * m^2 * 2^53 / S is one fixed double expression tree over
# exact integer inputs — IEEE-deterministic across engines.
HLL_M = 256  # registers; standard error ~ 1.04/sqrt(m) = 6.5%
HLL_SUFFIX_BITS = 52
_HLL_POW2K = 1 << (HLL_SUFFIX_BITS + 1)  # 2^53: empty-register term


def _hll_rho_sql(suffix: str) -> str:
    arms = " ".join(
        f"WHEN {suffix} >= {1 << (HLL_SUFFIX_BITS - p)} THEN {p}"
        for p in range(1, HLL_SUFFIX_BITS + 1)
    )
    return f"CASE {arms} ELSE {HLL_SUFFIX_BITS + 1} END"


def _hll_rho_col(suffix):
    expr = None
    for p in range(1, HLL_SUFFIX_BITS + 1):
        cond = suffix >= F.lit(1 << (HLL_SUFFIX_BITS - p))
        expr = F.when(cond, p) if expr is None else expr.when(cond, p)
    return expr.otherwise(HLL_SUFFIX_BITS + 1)


# alpha_256 * m^2 * 2^53, as ONE shared expression tree (identical literal
# parse + identical op order in both engines -> identical double).
_HLL_ALPHA_SQL = (
    "(((CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / 256.0))"
    f" * {HLL_M * HLL_M}.0) * {float(_HLL_POW2K):.1f})"
)


@register(
    "hll_distinct_estimate",
    oracle=f"""
        WITH hashes AS (
            SELECT DISTINCT {portable_hash64_sql('CAST(l_orderkey AS VARCHAR)')} AS h
            FROM lineitem
        ),
        regs AS (
            SELECT h % {HLL_M} AS bucket,
                   max({_hll_rho_sql(f'(h // {HLL_M})')}) AS m_j
            FROM hashes GROUP BY 1
        ),
        sums AS (
            SELECT CAST(count(*) AS BIGINT) AS n_present,
                   CAST(sum(1::BIGINT << ({HLL_SUFFIX_BITS + 1} - m_j)) AS BIGINT)
                       AS s_present
            FROM regs
        ),
        est AS (
            SELECT ({HLL_M} - n_present) AS n_zero_buckets,
                   s_present + ({HLL_M} - n_present) * {_HLL_POW2K}::BIGINT
                       AS register_sum,
                   {_HLL_ALPHA_SQL}
                       / CAST(s_present + ({HLL_M} - n_present) * {_HLL_POW2K}::BIGINT
                              AS DOUBLE) AS raw
            FROM sums
        )
        SELECT CAST({HLL_M} AS BIGINT) AS m,
               CAST(n_zero_buckets AS BIGINT) AS n_zero_buckets,
               register_sum,
               CAST((SELECT count(DISTINCT l_orderkey) FROM lineitem) AS BIGINT)
                   AS true_distinct,
               CAST(floor(raw) AS BIGINT) AS hll_estimate,
               round(abs(raw - (SELECT count(DISTINCT l_orderkey) FROM lineitem))
                     / (SELECT count(DISTINCT l_orderkey) FROM lineitem), 6)
                   AS rel_err
        FROM est
    """,
    doc="HyperLogLog distinct-count sketch over the portable hash: 256 "
    "registers from the hash's low byte, register value = leading-zero "
    "rank of the 52-bit suffix via a pure integer comparison ladder (no "
    "float log2 -> no ulp hazard), harmonic denominator integer-scaled to "
    "an order-independent BIGINT sum, so the ENTIRE estimator is "
    "bit-identical across engines and hash-gated VALUE-FOR-VALUE (the "
    "engine-native sketch in approx_aggregates differs per engine, so "
    "that entry gates on an accuracy CONTRACT instead). No small-range branch: "
    "distinct orderkeys exceed 2.5m at every shipped SF (the "
    "n_zero_buckets column keeps the linear-counting input auditable). "
    "Scale shape: one map-side-combined max-aggregate into at most 256 "
    "groups — the sketch is mergeable, which is exactly why HLL is THE "
    "100 TB distinct-count structure; the register table is constant-size "
    "regardless of corpus",
    tags=("agg", "approx", "sketch"),
)
def q_hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = portable_hash64(F.col("l_orderkey").cast("string"))
    regs = (
        li.select(h.alias("h"))
        .distinct()
        .select(
            (F.col("h") % HLL_M).alias("bucket"),
            # h is 60-bit: h / 256 in DOUBLE would round above 2^53, so the
            # suffix extraction must stay integer — shiftright(h, 8) == the
            # oracle's exact `h // 256` (m is a power of two by design).
            _hll_rho_col(F.expr("shiftright(h, 8)")).alias("rho"),
        )
        .groupBy("bucket")
        .agg(F.max("rho").alias("m_j"))
    )
    sums = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_SUFFIX_BITS + 1} - m_j AS INT))"
            )
        )
        .cast("bigint")
        .alias("s_present"),
    )
    true_d = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("true_distinct")
    )
    s_total = (
        F.col("s_present")
        + (F.lit(HLL_M) - F.col("n_present")) * F.lit(_HLL_POW2K)
    ).cast("bigint")
    raw = F.expr(_HLL_ALPHA_SQL) / s_total.cast("double")
    return (
        sums.crossJoin(F.broadcast(true_d))
        .select(
            F.lit(HLL_M).cast("bigint").alias("m"),
            (F.lit(HLL_M) - F.col("n_present")).cast("bigint").alias(
                "n_zero_buckets"
            ),
            s_total.alias("register_sum"),
            "true_distinct",
            F.floor(raw).cast("bigint").alias("hll_estimate"),
            F.round(
                F.abs(raw - F.col("true_distinct")) / F.col("true_distinct"), 6
            ).alias("rel_err"),
        )
    )
