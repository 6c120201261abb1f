"""Classical ML trained *inside* the engine, as aggregations.

kmeans_train / pca_power_iteration (operators/similarity.py) cover the
iterative linear-algebra side; this module adds the two closed-form /
counting learners every data platform ends up hosting:

- **Multinomial Naive Bayes** (`nb_langid_train_eval`): train/eval split by
  portable hash, token-likelihood + prior estimation as plain group-by
  counts, argmax scoring as a join + sum — a LEARNED classifier whose
  entire train→predict→confusion-matrix loop is expressible in both
  engines and sits under the driver's hash gate.
- **Ordinary least squares** (`ols_price_model`): per-group 2-feature
  linear regression solved exactly from sufficient statistics via
  Cramer's rule — the "regression as aggregation" pattern (one pass, one
  shuffle), with decimal-exact moment sums so both engines solve the
  *identical* normal equations.

The reference engine (`MapReduceFramework.cpp`, ~580-LoC pthread
MapReduce) has no such surface; these are SURVEY-§2.3-style extensions
proven by the independent DuckDB oracle.

Cross-engine determinism techniques (catalog.py header conventions):

- NB log-likelihoods are quantized to BIGINT **micronats**
  (`floor(1e6 * ln(p))`) before any summation — integer sums are
  order-independent, so Spark's nondeterministic aggregation order cannot
  perturb an argmax; ties break on language code. The only float step is
  one `ln` per (vocab × lang) cell, evaluated from exact integer ratios
  by both engines (the integer-scaled-pagerank technique from
  `dup_graph_pagerank`).
- OLS moment sums are BIGINT (integer features) and DECIMAL(30,6)/(32,6)
  (price moments) — exact and associative; the Cramer determinants are
  then ONE shared SQL expression tree (`_OLS_BETA_SQL`, passed to
  `F.expr` on the Spark side and embedded verbatim in the oracle), so
  both engines execute the same IEEE op sequence on the same exact
  inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions.hashing import portable_hash64, portable_hash64_sql
from ..functions.textfns import tokens
from ..plans.catalog import register
from ..sources.registry import load_table

# ---------------------------------------------------------------------------
# Naive Bayes language model
NB_FOLDS = 5  # fold 0 = eval (20%), folds 1-4 = train
NB_SCALE = 1000000.0  # micronats


@register(
    "nb_langid_train_eval",
    oracle=f"""
        WITH split AS (
            SELECT doc_id, lang, text,
                   {portable_hash64_sql('CAST(doc_id AS VARCHAR)')} % {NB_FOLDS}
                       AS fold
            FROM documents
        ),
        train AS (SELECT * FROM split WHERE fold <> 0),
        ev AS (SELECT * FROM split WHERE fold = 0),
        tr_tok AS (
            SELECT lang, unnest(list_filter(string_split(text, ' '),
                                            t -> t <> '')) AS w
            FROM train
        ),
        vocab AS (SELECT DISTINCT w FROM tr_tok),
        vstats AS (SELECT count(*) AS v FROM vocab),
        cls AS (SELECT lang, count(*) AS n_docs FROM train GROUP BY 1),
        ntr AS (SELECT count(*) AS n FROM train),
        ltot AS (SELECT lang, count(*) AS tot FROM tr_tok GROUP BY 1),
        cnts AS (SELECT lang, w, count(*) AS c FROM tr_tok GROUP BY 1, 2),
        lp AS (
            SELECT cl.lang, vo.w,
                   CAST(floor({NB_SCALE} * ln(
                        (coalesce(k.c, 0) + 1)::DOUBLE / (lt.tot + vs.v)
                   )) AS BIGINT) AS lp
            FROM vocab vo
            CROSS JOIN cls cl
            JOIN ltot lt ON lt.lang = cl.lang
            CROSS JOIN vstats vs
            LEFT JOIN cnts k ON k.lang = cl.lang AND k.w = vo.w
        ),
        prior AS (
            SELECT cl.lang,
                   CAST(floor({NB_SCALE} * ln(cl.n_docs::DOUBLE / ntr.n))
                        AS BIGINT) AS lpri
            FROM cls cl CROSS JOIN ntr
        ),
        ev_tok AS (
            SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                              t -> t <> '')) AS w
            FROM ev
        ),
        scored AS (
            SELECT t.doc_id, l.lang, sum(l.lp) AS s
            FROM ev_tok t JOIN lp l ON l.w = t.w
            GROUP BY 1, 2
        ),
        total AS (
            SELECT e.doc_id, e.lang AS true_lang, p.lang AS cand,
                   coalesce(s.s, 0) + p.lpri AS score
            FROM ev e
            CROSS JOIN prior p
            LEFT JOIN scored s ON s.doc_id = e.doc_id AND s.lang = p.lang
        ),
        pred AS (
            SELECT true_lang, cand AS pred_lang,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY score DESC, cand) AS rn
            FROM total
        )
        SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM pred WHERE rn = 1
        GROUP BY 1, 2
    """,
    doc="Multinomial Naive Bayes language classifier, trained and evaluated "
    "entirely in-engine: deterministic hash split (fold 0 of 5 = eval), "
    "add-one-smoothed token likelihoods and class priors from group-by "
    "counts, argmax scoring via a token join + integer sum, confusion "
    "matrix out. Log-likelihoods are quantized to BIGINT micronats before "
    "summation, so scores are order-independent and the argmax (ties -> "
    "language code) is bit-identical across engines — the learned-model "
    "loop under the hash gate. NOTE the synthetic corpus draws all "
    "languages from one shared vocabulary, so the learned signal is the "
    "per-language frequency skew plus the prior (the char-trigram "
    "heuristic twin is langid_confusion_matrix). Scale: token counts "
    "shuffle on (lang, token); the dense (vocab x lang) likelihood table "
    "shuffles-joins the eval tokens on token (broadcast when the vocab "
    "is small); scoring aggregates on (doc, lang) — no stage is corpus "
    "x corpus",
    tags=("text", "ml", "eval"),
)
def q_nb_langid_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    split = docs.withColumn(
        "fold", portable_hash64(F.col("doc_id").cast("string")) % NB_FOLDS
    )
    train = split.where(F.col("fold") != 0)
    evald = split.where(F.col("fold") == 0)

    tr_tok = train.select("lang", F.explode(tokens("text")).alias("w"))
    vocab = tr_tok.select("w").distinct()
    vstats = vocab.agg(F.count("*").alias("v"))
    cls = train.groupBy("lang").agg(F.count("*").alias("n_docs"))
    ntr = train.agg(F.count("*").alias("n"))
    ltot = tr_tok.groupBy("lang").agg(F.count("*").alias("tot"))
    cnts = tr_tok.groupBy("lang", "w").agg(F.count("*").alias("c"))

    lp = (
        vocab.crossJoin(cls.select("lang"))
        .join(ltot, "lang")
        .crossJoin(F.broadcast(vstats))
        .join(cnts, ["lang", "w"], "left")
        .select(
            "lang",
            "w",
            F.floor(
                F.lit(NB_SCALE)
                * F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + 1).cast("double")
                    / (F.col("tot") + F.col("v"))
                )
            )
            .cast("bigint")
            .alias("lp"),
        )
    )
    prior = cls.crossJoin(F.broadcast(ntr)).select(
        "lang",
        F.floor(
            F.lit(NB_SCALE) * F.log(F.col("n_docs").cast("double") / F.col("n"))
        )
        .cast("bigint")
        .alias("lpri"),
    )

    ev_tok = evald.select("doc_id", F.explode(tokens("text")).alias("w"))
    scored = (
        ev_tok.join(lp, "w")
        .groupBy("doc_id", "lang")
        .agg(F.sum("lp").alias("s"))
    )
    total = (
        evald.select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(prior))
        .join(scored, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("cand"),
            (F.coalesce(F.col("s"), F.lit(0)) + F.col("lpri")).alias("score"),
        )
    )
    pred = total.withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand")
        ),
    ).where(F.col("rn") == 1)
    return pred.groupBy(
        "true_lang", F.col("cand").alias("pred_lang")
    ).agg(F.count("*").cast("bigint").alias("n_docs"))


# ---------------------------------------------------------------------------
# OLS: o_totalprice ~ b0 + b1 * n_items + b2 * total_qty, per order
# priority. ONE shared SQL fragment computes the Cramer solution and R^2 in
# both engines (F.expr on the Spark side, verbatim text in the oracle) over
# identically-named DOUBLE columns cast from exact moment sums.
_OLS_DETS = {
    "det": "(nd*(s11*s22 - s12*s12) - s1*(s1*s22 - s12*s2) + s2*(s1*s12 - s11*s2))",
    "det0": "(sy*(s11*s22 - s12*s12) - s1*(s1y*s22 - s12*s2y) + s2*(s1y*s12 - s11*s2y))",
    "det1": "(nd*(s1y*s22 - s12*s2y) - sy*(s1*s22 - s12*s2) + s2*(s1*s2y - s1y*s2))",
    "det2": "(nd*(s11*s2y - s1y*s12) - s1*(s1*s2y - s1y*s2) + sy*(s1*s12 - s11*s2))",
}
_OLS_BETA_SQL = {
    "b0": f"round({_OLS_DETS['det0']} / nullif({_OLS_DETS['det']}, 0.0), 6)",
    "b1": f"round({_OLS_DETS['det1']} / nullif({_OLS_DETS['det']}, 0.0), 6)",
    "b2": f"round({_OLS_DETS['det2']} / nullif({_OLS_DETS['det']}, 0.0), 6)",
    "r2": (
        f"round(1.0 - (syy - ({_OLS_DETS['det0']} / nullif({_OLS_DETS['det']}, 0.0)) * sy"
        f" - ({_OLS_DETS['det1']} / nullif({_OLS_DETS['det']}, 0.0)) * s1y"
        f" - ({_OLS_DETS['det2']} / nullif({_OLS_DETS['det']}, 0.0)) * s2y)"
        f" / nullif(syy - sy * sy / nd, 0.0), 6)"
    ),
}

_OLS_STATS_SQL = """
        feats AS (
            SELECT l_orderkey,
                   CAST(count(*) AS BIGINT) AS x1,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
            FROM lineitem GROUP BY 1
        ),
        base AS (
            SELECT o.o_orderpriority, f.x1, f.x2,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS yd
            FROM orders o JOIN feats f ON f.l_orderkey = o.o_orderkey
        ),
        stats AS (
            SELECT o_orderpriority,
                   CAST(count(*) AS DOUBLE) AS nd,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x1) AS DOUBLE) AS s1,
                   CAST(sum(x2) AS DOUBLE) AS s2,
                   CAST(sum(x1 * x1) AS DOUBLE) AS s11,
                   CAST(sum(x1 * x2) AS DOUBLE) AS s12,
                   CAST(sum(x2 * x2) AS DOUBLE) AS s22,
                   CAST(sum(CAST(yd AS DECIMAL(30,6))) AS DOUBLE) AS sy,
                   CAST(sum(CAST(x1 * yd AS DECIMAL(30,6))) AS DOUBLE) AS s1y,
                   CAST(sum(CAST(x2 * yd AS DECIMAL(30,6))) AS DOUBLE) AS s2y,
                   CAST(sum(CAST(yd * yd AS DECIMAL(32,6))) AS DOUBLE) AS syy
            FROM base GROUP BY 1
        )
"""


@register(
    "ols_price_model",
    oracle=f"""
        WITH {_OLS_STATS_SQL.strip()}
        SELECT o_orderpriority, n,
               {_OLS_BETA_SQL['b0']} AS b0,
               {_OLS_BETA_SQL['b1']} AS b1,
               {_OLS_BETA_SQL['b2']} AS b2,
               {_OLS_BETA_SQL['r2']} AS r2
        FROM stats
    """,
    doc="Per-group ordinary least squares, solved exactly from sufficient "
    "statistics: o_totalprice regressed on (line-item count, total "
    "quantity) per order priority, via the 3x3 normal equations and "
    "Cramer's rule. Feature moments are BIGINT and price moments "
    "DECIMAL(30,6)/(32,6) — exact, associative, order-independent — and "
    "the determinant/R^2 arithmetic is ONE shared SQL expression tree "
    "evaluated by F.expr and by the oracle verbatim, so both engines run "
    "the identical IEEE op sequence on identical inputs (nullif-guarded "
    "degenerate determinant/variance). Scale: regression-as-aggregation "
    "— one map-side-combined pass builds the moments (groups x 10 "
    "doubles), the solve is per-group constant work; no driver-side "
    "matrix library, no second data pass",
    tags=("agg", "ml", "stats"),
)
def q_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.groupBy("l_orderkey").agg(
        F.count("*").cast("bigint").alias("x1"),
        F.sum(F.col("l_quantity").cast("bigint")).cast("bigint").alias("x2"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_totalprice").cast("decimal(18,2)").alias("yd"),
    )
    base = orders.join(feats, orders.o_orderkey == feats.l_orderkey)
    stats = base.groupBy("o_orderpriority").agg(
        F.count("*").cast("double").alias("nd"),
        F.count("*").cast("bigint").alias("n"),
        F.sum("x1").cast("double").alias("s1"),
        F.sum("x2").cast("double").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("s22"),
        F.sum(F.col("yd").cast("decimal(30,6)")).cast("double").alias("sy"),
        F.sum((F.col("x1") * F.col("yd")).cast("decimal(30,6)"))
        .cast("double")
        .alias("s1y"),
        F.sum((F.col("x2") * F.col("yd")).cast("decimal(30,6)"))
        .cast("double")
        .alias("s2y"),
        F.sum((F.col("yd") * F.col("yd")).cast("decimal(32,6)"))
        .cast("double")
        .alias("syy"),
    )
    return stats.select(
        "o_orderpriority",
        "n",
        F.expr(_OLS_BETA_SQL["b0"]).alias("b0"),
        F.expr(_OLS_BETA_SQL["b1"]).alias("b1"),
        F.expr(_OLS_BETA_SQL["b2"]).alias("b2"),
        F.expr(_OLS_BETA_SQL["r2"]).alias("r2"),
    )
