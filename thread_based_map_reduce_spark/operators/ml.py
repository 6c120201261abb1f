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

  KNOWN EXPOSURE (ADVICE r4): the quantization assumes DuckDB's libm
  `ln`/`exp` and the JVM's `Math.log`/`exp` return the SAME double for
  the same exact-integer-ratio input. Both are correctly-rounded to
  <1 ulp in practice, but neither is *guaranteed* correctly-rounded by
  its spec, so an input whose true `1e6*ln(x)` lands within ~1 ulp of an
  integer could floor differently per platform and flip the BIGINT —
  failing the hash gate nondeterministically for that (value, platform).
  Every micronat call site in this file shares that exposure; it has
  never fired across five driver rounds + the local suite (the floor
  boundary is hit with probability ~1e-10 per cell, and the inputs are
  low-entropy rationals far from boundaries). If it ever does, the fix
  is READY, not a change to the operators: rename the affected output
  column to the ``_micronat`` suffix and pass ``micronat_tolerance=1`` to
  ``plans.oracle_check.compare_frames`` (off by default; unit-tested in
  tests/test_micronat_tolerance.py).
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
# Unrounded Cramer solutions — reused by ols_kfold_cv, whose SSE needs the
# raw betas, not the 6-decimal presentation rounding.
_OLS_BETA_RAW = {
    "b0r": f"({_OLS_DETS['det0']} / nullif({_OLS_DETS['det']}, 0.0))",
    "b1r": f"({_OLS_DETS['det1']} / nullif({_OLS_DETS['det']}, 0.0))",
    "b2r": f"({_OLS_DETS['det2']} / nullif({_OLS_DETS['det']}, 0.0))",
}
_OLS_BETA_SQL = {
    "b0": f"round({_OLS_BETA_RAW['b0r']}, 6)",
    "b1": f"round({_OLS_BETA_RAW['b1r']}, 6)",
    "b2": f"round({_OLS_BETA_RAW['b2r']}, 6)",
    "r2": (
        f"round(1.0 - (syy - {_OLS_BETA_RAW['b0r']} * sy"
        f" - {_OLS_BETA_RAW['b1r']} * s1y"
        f" - {_OLS_BETA_RAW['b2r']} * s2y)"
        f" / nullif(syy - sy * sy / nd, 0.0), 6)"
    ),
}

def _order_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE definition of the regression design rows shared by
    ols_price_model and ols_kfold_cv (the ADVICE-r3 twin-definition
    lesson): per-order (o_orderkey, o_orderpriority, x1 item count,
    x2 total quantity, yd exact decimal price)."""
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
    return orders.join(feats, orders.o_orderkey == feats.l_orderkey)


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
    base = _order_features(spark, sf_dir)
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


# ---------------------------------------------------------------------------
# K-fold cross-validation of the OLS model — WITHOUT k training passes.
# Per-fold moment sums are EXACT (BIGINT / DECIMAL), so the training-side
# moments of fold f are literally total - fold_f: one data pass builds all
# k train/test moment sets, Cramer solves each, and the holdout SSE comes
# from the *test-side moments* (SSE = Syy - 2 b'X'y + b'X'Xb), never from a
# per-row residual sum — which would be an order-dependent float
# accumulation Spark cannot replay deterministically.
OLS_CV_FOLDS = 5

_OLS_SSE_SQL = (
    "greatest(tsyy - 2.0 * (b0r * tsy + b1r * ts1y + b2r * ts2y)"
    " + (tnd * b0r * b0r + 2.0 * b0r * b1r * ts1 + 2.0 * b0r * b2r * ts2"
    " + b1r * b1r * ts11 + 2.0 * b1r * b2r * ts12 + b2r * b2r * ts22), 0.0)"
)

_OLS_CV_FOLDS_SQL = f"""
        feats AS (
            SELECT l_orderkey,
                   CAST(count(*) AS BIGINT) AS x1,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x2
            FROM lineitem GROUP BY 1
        ),
        base AS (
            SELECT {portable_hash64_sql('CAST(o.o_orderkey AS VARCHAR)')}
                       % {OLS_CV_FOLDS} AS fold,
                   f.x1, f.x2,
                   CAST(o.o_totalprice AS DECIMAL(18,2)) AS yd
            FROM orders o JOIN feats f ON f.l_orderkey = o.o_orderkey
        ),
        fstats AS (
            SELECT fold,
                   CAST(count(*) AS BIGINT) AS fn,
                   CAST(sum(x1) AS BIGINT) AS fs1,
                   CAST(sum(x2) AS BIGINT) AS fs2,
                   CAST(sum(x1 * x1) AS BIGINT) AS fs11,
                   CAST(sum(x1 * x2) AS BIGINT) AS fs12,
                   CAST(sum(x2 * x2) AS BIGINT) AS fs22,
                   CAST(sum(CAST(yd AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS fsy,
                   CAST(sum(CAST(x1 * yd AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS fs1y,
                   CAST(sum(CAST(x2 * yd AS DECIMAL(30,6))) AS DECIMAL(38,6)) AS fs2y,
                   CAST(sum(CAST(yd * yd AS DECIMAL(32,6))) AS DECIMAL(38,6)) AS fsyy
            FROM base GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(fn) AS BIGINT) AS tn,
                   CAST(sum(fs1) AS BIGINT) AS t1,
                   CAST(sum(fs2) AS BIGINT) AS t2,
                   CAST(sum(fs11) AS BIGINT) AS t11,
                   CAST(sum(fs12) AS BIGINT) AS t12,
                   CAST(sum(fs22) AS BIGINT) AS t22,
                   CAST(sum(fsy) AS DECIMAL(38,6)) AS ty,
                   CAST(sum(fs1y) AS DECIMAL(38,6)) AS t1y,
                   CAST(sum(fs2y) AS DECIMAL(38,6)) AS t2y,
                   CAST(sum(fsyy) AS DECIMAL(38,6)) AS tyy
            FROM fstats
        ),
        train AS (
            SELECT fold,
                   CAST(tn - fn AS DOUBLE) AS nd,
                   CAST(tn - fn AS BIGINT) AS n_train,
                   fn AS n_test,
                   CAST(t1 - fs1 AS DOUBLE) AS s1,
                   CAST(t2 - fs2 AS DOUBLE) AS s2,
                   CAST(t11 - fs11 AS DOUBLE) AS s11,
                   CAST(t12 - fs12 AS DOUBLE) AS s12,
                   CAST(t22 - fs22 AS DOUBLE) AS s22,
                   CAST(ty - fsy AS DOUBLE) AS sy,
                   CAST(t1y - fs1y AS DOUBLE) AS s1y,
                   CAST(t2y - fs2y AS DOUBLE) AS s2y,
                   CAST(fn AS DOUBLE) AS tnd,
                   CAST(fs1 AS DOUBLE) AS ts1,
                   CAST(fs2 AS DOUBLE) AS ts2,
                   CAST(fs11 AS DOUBLE) AS ts11,
                   CAST(fs12 AS DOUBLE) AS ts12,
                   CAST(fs22 AS DOUBLE) AS ts22,
                   CAST(fsy AS DOUBLE) AS tsy,
                   CAST(fs1y AS DOUBLE) AS ts1y,
                   CAST(fs2y AS DOUBLE) AS ts2y,
                   CAST(fsyy AS DOUBLE) AS tsyy
            FROM fstats CROSS JOIN tot
        ),
        betas AS (
            SELECT *,
                   {_OLS_BETA_RAW['b0r']} AS b0r,
                   {_OLS_BETA_RAW['b1r']} AS b1r,
                   {_OLS_BETA_RAW['b2r']} AS b2r
            FROM train
        )
"""


@register(
    "ols_kfold_cv",
    oracle=f"""
        WITH {_OLS_CV_FOLDS_SQL.strip()}
        SELECT CAST(fold AS BIGINT) AS fold, n_train, n_test,
               round(b0r, 6) AS b0,
               round(b1r, 6) AS b1,
               round(b2r, 6) AS b2,
               round(sqrt({_OLS_SSE_SQL} / tnd), 6) AS rmse_holdout
        FROM betas
    """,
    doc=f"{OLS_CV_FOLDS}-fold cross-validation of the linear price model in "
    "ONE data pass: per-fold moment sums are exact (BIGINT / DECIMAL), so "
    "each fold's TRAINING moments are computed by subtraction "
    "(total - fold) instead of re-scanning, Cramer's rule solves each "
    "fold's normal equations (the shared _OLS_BETA_RAW fragments), and "
    "the holdout RMSE derives from the held-out fold's own moments "
    "(SSE = Syy - 2b'X'y + b'X'Xb) — never a per-row residual sum, which "
    "would be an order-dependent float accumulation. Scale: one "
    "map-side-combined aggregate into k rows, then k x constant-work "
    "solves; adding folds costs nothing but a k-row cross join — "
    "model-selection machinery at aggregation cost",
    tags=("agg", "ml", "eval"),
)
def q_ols_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _order_features(spark, sf_dir).select(
        (portable_hash64(F.col("o_orderkey").cast("string")) % OLS_CV_FOLDS).alias(
            "fold"
        ),
        "x1",
        "x2",
        "yd",
    )
    fstats = base.groupBy("fold").agg(
        F.count("*").cast("bigint").alias("fn"),
        F.sum("x1").cast("bigint").alias("fs1"),
        F.sum("x2").cast("bigint").alias("fs2"),
        F.sum(F.col("x1") * F.col("x1")).cast("bigint").alias("fs11"),
        F.sum(F.col("x1") * F.col("x2")).cast("bigint").alias("fs12"),
        F.sum(F.col("x2") * F.col("x2")).cast("bigint").alias("fs22"),
        F.sum(F.col("yd").cast("decimal(30,6)"))
        .cast("decimal(38,6)")
        .alias("fsy"),
        F.sum((F.col("x1") * F.col("yd")).cast("decimal(30,6)"))
        .cast("decimal(38,6)")
        .alias("fs1y"),
        F.sum((F.col("x2") * F.col("yd")).cast("decimal(30,6)"))
        .cast("decimal(38,6)")
        .alias("fs2y"),
        F.sum((F.col("yd") * F.col("yd")).cast("decimal(32,6)"))
        .cast("decimal(38,6)")
        .alias("fsyy"),
    )
    tot = fstats.agg(
        F.sum("fn").cast("bigint").alias("tn"),
        F.sum("fs1").cast("bigint").alias("t1"),
        F.sum("fs2").cast("bigint").alias("t2"),
        F.sum("fs11").cast("bigint").alias("t11"),
        F.sum("fs12").cast("bigint").alias("t12"),
        F.sum("fs22").cast("bigint").alias("t22"),
        F.sum("fsy").cast("decimal(38,6)").alias("ty"),
        F.sum("fs1y").cast("decimal(38,6)").alias("t1y"),
        F.sum("fs2y").cast("decimal(38,6)").alias("t2y"),
        F.sum("fsyy").cast("decimal(38,6)").alias("tyy"),
    )
    train = fstats.crossJoin(F.broadcast(tot)).select(
        "fold",
        (F.col("tn") - F.col("fn")).cast("double").alias("nd"),
        (F.col("tn") - F.col("fn")).cast("bigint").alias("n_train"),
        F.col("fn").alias("n_test"),
        (F.col("t1") - F.col("fs1")).cast("double").alias("s1"),
        (F.col("t2") - F.col("fs2")).cast("double").alias("s2"),
        (F.col("t11") - F.col("fs11")).cast("double").alias("s11"),
        (F.col("t12") - F.col("fs12")).cast("double").alias("s12"),
        (F.col("t22") - F.col("fs22")).cast("double").alias("s22"),
        (F.col("ty") - F.col("fsy")).cast("double").alias("sy"),
        (F.col("t1y") - F.col("fs1y")).cast("double").alias("s1y"),
        (F.col("t2y") - F.col("fs2y")).cast("double").alias("s2y"),
        F.col("fn").cast("double").alias("tnd"),
        F.col("fs1").cast("double").alias("ts1"),
        F.col("fs2").cast("double").alias("ts2"),
        F.col("fs11").cast("double").alias("ts11"),
        F.col("fs12").cast("double").alias("ts12"),
        F.col("fs22").cast("double").alias("ts22"),
        F.col("fsy").cast("double").alias("tsy"),
        F.col("fs1y").cast("double").alias("ts1y"),
        F.col("fs2y").cast("double").alias("ts2y"),
        F.col("fsyy").cast("double").alias("tsyy"),
    )
    betas = (
        train.withColumn("b0r", F.expr(_OLS_BETA_RAW["b0r"]))
        .withColumn("b1r", F.expr(_OLS_BETA_RAW["b1r"]))
        .withColumn("b2r", F.expr(_OLS_BETA_RAW["b2r"]))
    )
    return betas.select(
        F.col("fold").cast("bigint").alias("fold"),
        "n_train",
        "n_test",
        F.round("b0r", 6).alias("b0"),
        F.round("b1r", 6).alias("b1"),
        F.round("b2r", 6).alias("b2"),
        F.round(F.sqrt(F.expr(_OLS_SSE_SQL) / F.col("tnd")), 6).alias(
            "rmse_holdout"
        ),
    )


# ---------------------------------------------------------------------------
# Decision stump: the best single (feature, threshold) split by weighted
# Gini impurity — the base learner of every boosted-tree stack, trained as
# pure aggregation. Candidate thresholds are ordered bins; cumulative
# class counts over the ≤64-row bin table turn "evaluate every split" into
# one bounded window pass per feature.
STUMP_PRICE_BINS = 64

# Weighted Gini of a split, over DOUBLE columns (nld, pld) = left (count,
# positives) and (nrd, prd) = right. One shared fragment -> identical IEEE
# tree in both engines; sides are guaranteed non-empty by the nl < ntot
# filter (left always contains the first bin).
_STUMP_SCORE_SQL = (
    "(nld * (1.0 - (pld / nld) * (pld / nld)"
    " - ((nld - pld) / nld) * ((nld - pld) / nld))"
    " + nrd * (1.0 - (prd / nrd) * (prd / nrd)"
    " - ((nrd - prd) / nrd) * ((nrd - prd) / nrd)))"
)

# Equal-width price binning (the zorder quantizer shape, with its
# degenerate-range guard) over broadcast min/max columns mn/mx.
_STUMP_PRICE_BIN_SQL = (
    f"CAST(least(floor((o_totalprice - mn) * {STUMP_PRICE_BINS}.0"
    f" / greatest(mx - mn, 0.000000001)), {STUMP_PRICE_BINS - 1}.0) AS BIGINT)"
)


@register(
    "decision_stump_train",
    oracle=f"""
        WITH minmax AS (
            SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
        ),
        labeled AS (
            SELECT 'price_bin' AS feature,
                   {_STUMP_PRICE_BIN_SQL} AS bin,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
            FROM orders CROSS JOIN minmax
            UNION ALL
            SELECT 'month', CAST(month(o_orderdate) AS BIGINT),
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
            FROM orders
        ),
        bins AS (
            SELECT feature, bin, count(*) AS n, sum(pos) AS p
            FROM labeled GROUP BY 1, 2
        ),
        cum AS (
            SELECT feature, bin,
                   sum(n) OVER (PARTITION BY feature ORDER BY bin) AS nl,
                   sum(p) OVER (PARTITION BY feature ORDER BY bin) AS pl,
                   sum(n) OVER (PARTITION BY feature) AS ntot,
                   sum(p) OVER (PARTITION BY feature) AS ptot
            FROM bins
        ),
        scored AS (
            SELECT feature, bin,
                   CAST(nl AS BIGINT) AS n_left,
                   CAST(pl AS BIGINT) AS pos_left,
                   CAST(ntot - nl AS BIGINT) AS n_right,
                   CAST(ptot - pl AS BIGINT) AS pos_right,
                   CAST(nl AS DOUBLE) AS nld,
                   CAST(pl AS DOUBLE) AS pld,
                   CAST(ntot - nl AS DOUBLE) AS nrd,
                   CAST(ptot - pl AS DOUBLE) AS prd
            FROM cum WHERE nl < ntot
        ),
        ranked AS (
            SELECT feature, bin, n_left, pos_left, n_right, pos_right,
                   {_STUMP_SCORE_SQL} AS score,
                   row_number() OVER (PARTITION BY feature
                                      ORDER BY {_STUMP_SCORE_SQL}, bin) AS rn
            FROM scored
        )
        SELECT feature, CAST(bin AS BIGINT) AS threshold_bin,
               round(score, 6) AS gini_weighted,
               n_left, pos_left, n_right, pos_right
        FROM ranked WHERE rn = 1
    """,
    doc="Decision-stump training (the boosted-tree base learner) as pure "
    "aggregation: label = order status 'F', candidate features = "
    f"{STUMP_PRICE_BINS}-bin equal-width total price (zorder-style "
    "quantizer with the degenerate-range guard) and order month; per "
    "feature, cumulative class counts over the ordered bin table price "
    "every 'bin <= t' split in one bounded window pass, and the argmin "
    "of weighted Gini (a shared IEEE expression tree on exact integer "
    "counts; ties break on bin) picks the split. Scale: the data pass is "
    "one map-side-combined count into <=64 bins per feature; the window "
    "runs on the bin table (bounded by construction), so training cost "
    "is independent of row count — exactly how large-scale tree "
    "libraries (approx hist mode) price splits",
    tags=("agg", "ml", "window"),
)
def q_decision_stump_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    minmax = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    pos = F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
    price = orders.crossJoin(F.broadcast(minmax)).select(
        F.lit("price_bin").alias("feature"),
        F.expr(_STUMP_PRICE_BIN_SQL).alias("bin"),
        pos.alias("pos"),
    )
    month = orders.select(
        F.lit("month").alias("feature"),
        F.month("o_orderdate").cast("bigint").alias("bin"),
        pos.alias("pos"),
    )
    bins = (
        price.unionAll(month)
        .groupBy("feature", "bin")
        .agg(F.count("*").alias("n"), F.sum("pos").alias("p"))
    )
    w_cum = W.partitionBy("feature").orderBy("bin")
    w_all = W.partitionBy("feature")
    cum = bins.select(
        "feature",
        "bin",
        F.sum("n").over(w_cum).alias("nl"),
        F.sum("p").over(w_cum).alias("pl"),
        F.sum("n").over(w_all).alias("ntot"),
        F.sum("p").over(w_all).alias("ptot"),
    )
    scored = cum.where(F.col("nl") < F.col("ntot")).select(
        "feature",
        "bin",
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("pl").cast("bigint").alias("pos_left"),
        (F.col("ntot") - F.col("nl")).cast("bigint").alias("n_right"),
        (F.col("ptot") - F.col("pl")).cast("bigint").alias("pos_right"),
        F.col("nl").cast("double").alias("nld"),
        F.col("pl").cast("double").alias("pld"),
        (F.col("ntot") - F.col("nl")).cast("double").alias("nrd"),
        (F.col("ptot") - F.col("pl")).cast("double").alias("prd"),
    )
    ranked = scored.withColumn("score", F.expr(_STUMP_SCORE_SQL)).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("feature").orderBy(F.col("score"), F.col("bin"))
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "feature",
        F.col("bin").cast("bigint").alias("threshold_bin"),
        F.round("score", 6).alias("gini_weighted"),
        "n_left",
        "pos_left",
        "n_right",
        "pos_right",
    )


# ---------------------------------------------------------------------------
# Markov next-event prediction, evaluated train/test — the sequence-model
# eval loop. User-level hash split (no per-user sequence leakage); the
# model is the argmax row of the training transition matrix; every number
# in train, predict and score is an exact integer count, so the whole
# loop sits under the hash gate.
MARKOV_FOLDS = 5


def _markov_oracle() -> str:
    from .relational_more import transition_cte_sql

    h = portable_hash64_sql("CAST(user_id AS VARCHAR)")
    return f"""
        WITH tr_ev AS (
            SELECT * FROM events WHERE {h} % {MARKOV_FOLDS} <> 0
        ),
        ev_ev AS (
            SELECT * FROM events WHERE {h} % {MARKOV_FOLDS} = 0
        ),
        {transition_cte_sql('tr_ev', 'tr_')},
        {transition_cte_sql('ev_ev', 'ev_')},
        best AS (
            SELECT prev_type, next_type AS pred_next FROM (
                SELECT prev_type, next_type,
                       row_number() OVER (PARTITION BY prev_type
                                          ORDER BY n DESC, next_type) AS rn
                FROM tr_trans
            ) WHERE rn = 1
        ),
        scored AS (
            SELECT t.next_type, t.n, b.pred_next
            FROM ev_trans t LEFT JOIN best b ON b.prev_type = t.prev_type
        )
        SELECT CAST(sum(n) AS BIGINT) AS n_eval_transitions,
               CAST(sum(CASE WHEN pred_next IS NOT NULL THEN n ELSE 0 END)
                    AS BIGINT) AS n_scored,
               CAST(sum(CASE WHEN pred_next = next_type THEN n ELSE 0 END)
                    AS BIGINT) AS n_correct,
               round(sum(CASE WHEN pred_next = next_type THEN n ELSE 0 END)::DOUBLE
                     / nullif(sum(CASE WHEN pred_next IS NOT NULL
                                       THEN n ELSE 0 END), 0), 6) AS accuracy,
               CAST(sum(CASE WHEN pred_next IS NULL THEN n ELSE 0 END)
                    AS BIGINT) AS n_unseen_prev
        FROM scored
    """


@register(
    "markov_next_event_accuracy",
    oracle=_markov_oracle(),
    doc="Next-event prediction accuracy of the order-1 Markov model, "
    "trained and evaluated in-engine with a user-level hash split (folds "
    "1-4 train the transition matrix, fold-0 users are held out — "
    "splitting by user, not by row, so no sequence leaks across the "
    "split). The model is argmax_next count(prev, next) with "
    "lexicographic tie-break; scoring joins held-out transitions to the "
    "model on prev_type and counts hits — every quantity an exact "
    "integer, fully hash-gated. The (prev, next) counting reuses the ONE "
    "shared Markov core (relational_more.transition_cte_sql / "
    "transition_counts). Scale: two transition matrices (one shuffle on "
    "user_id each), a model of |event_types|^2 rows, and a broadcast-"
    "sized model join — sequence-model evaluation at metadata cost",
    tags=("events", "ml", "eval"),
)
def q_markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational_more import transition_counts

    ev = load_table(spark, sf_dir, "events")
    fold = portable_hash64(F.col("user_id").cast("string")) % MARKOV_FOLDS
    train_t = transition_counts(ev.where(fold != 0))
    eval_t = transition_counts(ev.where(fold == 0))
    best = (
        train_t.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("prev_type").orderBy(F.col("n").desc(), "next_type")
            ),
        )
        .where(F.col("rn") == 1)
        .select("prev_type", F.col("next_type").alias("pred_next"))
    )
    scored = eval_t.join(F.broadcast(best), "prev_type", "left")
    return scored.agg(
        F.sum("n").cast("bigint").alias("n_eval_transitions"),
        F.sum(F.when(F.col("pred_next").isNotNull(), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_scored"),
        F.sum(
            F.when(F.col("pred_next") == F.col("next_type"), F.col("n")).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
        F.round(
            F.sum(
                F.when(
                    F.col("pred_next") == F.col("next_type"), F.col("n")
                ).otherwise(0)
            ).cast("double")
            / F.nullif(
                F.sum(
                    F.when(F.col("pred_next").isNotNull(), F.col("n")).otherwise(0)
                ),
                F.lit(0),
            ),
            6,
        ).alias("accuracy"),
        F.sum(F.when(F.col("pred_next").isNull(), F.col("n")).otherwise(0))
        .cast("bigint")
        .alias("n_unseen_prev"),
    )


# ---------------------------------------------------------------------------
# Weight-of-evidence / information value — the credit-scoring feature
# evaluation, over the SAME price bins and label as the decision stump
# (shared _STUMP_PRICE_BIN_SQL, so the two feature views cannot drift).
# Laplace-smoothed shares make WOE finite on one-class bins; each bin's
# IV term is quantized to BIGINT micro-units before the (bounded-window)
# total, the usual order-independence rail.
@register(
    "woe_iv_price_bins",
    oracle=f"""
        WITH minmax AS (
            SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
        ),
        labeled AS (
            SELECT {_STUMP_PRICE_BIN_SQL} AS bin,
                   CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS pos
            FROM orders CROSS JOIN minmax
        ),
        bins AS (
            SELECT bin, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(pos) AS BIGINT) AS pos,
                   CAST(count(*) - sum(pos) AS BIGINT) AS neg
            FROM labeled GROUP BY 1
        ),
        shares AS (
            SELECT bin, n, pos, neg,
                   (pos + 1)::DOUBLE
                       / (sum(pos) OVER () + count(*) OVER ()) AS p,
                   (neg + 1)::DOUBLE
                       / (sum(neg) OVER () + count(*) OVER ()) AS q
            FROM bins
        ),
        terms AS (
            SELECT bin, n, pos, neg,
                   round(ln(p / q), 6) AS woe,
                   CAST(floor(1000000.0 * ((p - q) * ln(p / q))) AS BIGINT)
                       AS iv_term_micro
            FROM shares
        )
        SELECT CAST(bin AS BIGINT) AS bin, n, pos, neg, woe, iv_term_micro,
               round(sum(iv_term_micro) OVER () / 1000000.0, 4) AS iv_total
        FROM terms
    """,
    doc="Weight-of-evidence and information value of the binned price "
    "feature against the order-status label — the credit-scoring feature "
    "evaluation, sharing the decision stump's exact bin definition "
    "(_STUMP_PRICE_BIN_SQL) so the two feature views cannot silently "
    "diverge. Laplace-smoothed class shares keep WOE finite on one-class "
    "bins; per-bin IV terms are floored to BIGINT micro-units before the "
    "total so the sum is order-independent, and the over-all windows run "
    "on the <=64-row bin table (bounded by construction). Scale: one "
    "map-side-combined count into the bin grid; everything after is "
    "metadata-sized",
    tags=("agg", "ml", "eval"),
)
def q_woe_iv_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    minmax = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    labeled = orders.crossJoin(F.broadcast(minmax)).select(
        F.expr(_STUMP_PRICE_BIN_SQL).alias("bin"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("pos"),
    )
    bins = labeled.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("pos").cast("bigint").alias("pos"),
        (F.count("*") - F.sum("pos")).cast("bigint").alias("neg"),
    )
    w_all = W.partitionBy()
    p = (F.col("pos") + 1).cast("double") / (
        F.sum("pos").over(w_all) + F.count("*").over(w_all)
    )
    q = (F.col("neg") + 1).cast("double") / (
        F.sum("neg").over(w_all) + F.count("*").over(w_all)
    )
    terms = bins.select(
        "bin",
        "n",
        "pos",
        "neg",
        F.round(F.log(p / q), 6).alias("woe"),
        F.floor(F.lit(1000000.0) * ((p - q) * F.log(p / q)))
        .cast("bigint")
        .alias("iv_term_micro"),
    )
    return terms.select(
        F.col("bin").cast("bigint").alias("bin"),
        "n",
        "pos",
        "neg",
        "woe",
        "iv_term_micro",
        F.round(
            F.sum("iv_term_micro").over(W.partitionBy()) / F.lit(1000000.0), 4
        ).alias("iv_total"),
    )
