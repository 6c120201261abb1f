"""Invariant tests for operators/ml.py — contracts the DuckDB hash gate
cannot express: the NB confusion matrix partitions the eval fold exactly,
and the Cramer-rule OLS solution matches an independent numpy lstsq solve
of the same normal equations."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from thread_based_map_reduce_spark.functions.hashing import portable_hash64
from thread_based_map_reduce_spark.operators.ml import (
    NB_FOLDS,
    q_nb_langid_train_eval,
    q_ols_price_model,
)
from thread_based_map_reduce_spark.sources.registry import load_table


def test_nb_confusion_partitions_eval_fold(spark, sf_dir):
    conf = q_nb_langid_train_eval(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_eval = docs.where(
        portable_hash64(F.col("doc_id").cast("string")) % NB_FOLDS == 0
    ).count()
    assert sum(r.n_docs for r in conf) == n_eval
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert {r.true_lang for r in conf} <= langs
    assert {r.pred_lang for r in conf} <= langs
    # exactly one prediction per doc => no (true, pred) pair double-counted
    assert len({(r.true_lang, r.pred_lang) for r in conf}) == len(conf)


def test_ols_matches_numpy_lstsq(spark, sf_dir):
    rows = q_ols_price_model(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    feats = li.groupBy("l_orderkey").agg(
        F.count("*").alias("x1"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("x2"),
    )
    base = (
        load_table(spark, sf_dir, "orders")
        .join(feats, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_orderpriority", "x1", "x2", "o_totalprice")
        .collect()
    )
    by_grp: dict[str, list] = {}
    for r in base:
        by_grp.setdefault(r.o_orderpriority, []).append(r)
    for out in rows:
        grp = by_grp[out.o_orderpriority]
        X = np.array([[1.0, r.x1, r.x2] for r in grp])
        y = np.array([round(r.o_totalprice, 2) for r in grp])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert out.n == len(grp)
        # Cramer on exact sums vs numpy's SVD path: agree to ~1e-4 relative
        for got, want in zip((out.b0, out.b1, out.b2), beta):
            assert abs(got - want) <= 1e-4 * max(1.0, abs(want)), (
                out.o_orderpriority,
                (out.b0, out.b1, out.b2),
                beta,
            )
        pred = X @ beta
        sst = ((y - y.mean()) ** 2).sum()
        r2 = 1.0 - ((y - pred) ** 2).sum() / sst
        assert abs(out.r2 - r2) <= 1e-4


def test_ols_kfold_cv_folds_partition_and_match_numpy(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.ml import (
        OLS_CV_FOLDS,
        q_ols_kfold_cv,
    )

    rows = q_ols_kfold_cv(spark, sf_dir).collect()
    assert len(rows) == OLS_CV_FOLDS
    total = rows[0].n_train + rows[0].n_test
    for r in rows:
        assert r.n_train + r.n_test == total

    li = load_table(spark, sf_dir, "lineitem")
    feats = li.groupBy("l_orderkey").agg(
        F.count("*").alias("x1"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("x2"),
    )
    base = (
        load_table(spark, sf_dir, "orders")
        .join(feats, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            (portable_hash64(F.col("o_orderkey").cast("string")) % OLS_CV_FOLDS)
            .alias("fold"),
            "x1",
            "x2",
            "o_totalprice",
        )
        .collect()
    )
    for out in rows:
        tr = [r for r in base if r.fold != out.fold]
        te = [r for r in base if r.fold == out.fold]
        assert (len(tr), len(te)) == (out.n_train, out.n_test)
        X = np.array([[1.0, r.x1, r.x2] for r in tr])
        y = np.array([round(r.o_totalprice, 2) for r in tr])
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        for got, want in zip((out.b0, out.b1, out.b2), beta):
            assert abs(got - want) <= 1e-4 * max(1.0, abs(want))
        Xt = np.array([[1.0, r.x1, r.x2] for r in te])
        yt = np.array([round(r.o_totalprice, 2) for r in te])
        rmse = float(np.sqrt(((yt - Xt @ beta) ** 2).mean()))
        assert abs(out.rmse_holdout - rmse) <= 1e-3 * max(1.0, rmse)


def test_decision_stump_matches_bruteforce(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.ml import (
        STUMP_PRICE_BINS,
        q_decision_stump_train,
    )

    rows = {r.feature: r for r in q_decision_stump_train(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").collect()
    mn = min(r.o_totalprice for r in orders)
    mx = max(r.o_totalprice for r in orders)

    def bin_of(r, feature):
        if feature == "month":
            return r.o_orderdate.month
        raw = (r.o_totalprice - mn) * STUMP_PRICE_BINS / max(mx - mn, 1e-9)
        return min(int(raw), STUMP_PRICE_BINS - 1)

    for feature, out in rows.items():
        pts = [(bin_of(r, feature), 1 if r.o_orderstatus == "F" else 0) for r in orders]
        best = None
        for t in sorted({b for b, _ in pts})[:-1]:
            nl = sum(1 for b, _ in pts if b <= t)
            pl = sum(p for b, p in pts if b <= t)
            nr, pr = len(pts) - nl, sum(p for _, p in pts) - pl
            gini = nl * (1 - (pl / nl) ** 2 - ((nl - pl) / nl) ** 2) + nr * (
                1 - (pr / nr) ** 2 - ((nr - pr) / nr) ** 2
            )
            if best is None or gini < best[1] - 1e-9:
                best = (t, gini, nl, pl, nr, pr)
        t, gini, nl, pl, nr, pr = best
        assert out.threshold_bin == t, (feature, out, best)
        assert abs(out.gini_weighted - gini) <= 1e-4
        assert (out.n_left, out.pos_left, out.n_right, out.pos_right) == (
            nl,
            pl,
            nr,
            pr,
        )


def test_markov_accuracy_matches_bruteforce(spark, sf_dir):
    from collections import Counter, defaultdict

    from thread_based_map_reduce_spark.operators.ml import (
        MARKOV_FOLDS,
        q_markov_next_event_accuracy,
    )

    out = q_markov_next_event_accuracy(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").withColumn(
        "fold", portable_hash64(F.col("user_id").cast("string")) % MARKOV_FOLDS
    ).collect()

    def transitions(rows):
        seqs = defaultdict(list)
        for r in rows:
            seqs[r.user_id].append((r.ts, r.event_id, r.event_type))
        t = Counter()
        for s in seqs.values():
            s.sort()
            for (_, _, a), (_, _, b) in zip(s, s[1:]):
                t[(a, b)] += 1
        return t

    tr = transitions([r for r in ev if r.fold != 0])
    te = transitions([r for r in ev if r.fold == 0])
    best = {}
    for (a, b), n in tr.items():
        cur = best.get(a)
        if cur is None or n > cur[0] or (n == cur[0] and b < cur[1]):
            best[a] = (n, b)
    n_eval = sum(te.values())
    n_scored = sum(n for (a, _), n in te.items() if a in best)
    n_correct = sum(n for (a, b), n in te.items() if a in best and best[a][1] == b)
    assert out.n_eval_transitions == n_eval
    assert out.n_scored == n_scored
    assert out.n_correct == n_correct
    assert out.n_unseen_prev == n_eval - n_scored
    if n_scored:
        assert abs(out.accuracy - n_correct / n_scored) < 1e-6


def test_woe_iv_partitions_and_sums(spark, sf_dir):
    from thread_based_map_reduce_spark.operators.ml import q_woe_iv_price_bins

    rows = q_woe_iv_price_bins(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n for r in rows) == n_orders
    assert all(r.pos + r.neg == r.n for r in rows)
    iv_total = rows[0].iv_total
    assert all(r.iv_total == iv_total for r in rows)
    assert abs(iv_total - sum(r.iv_term_micro for r in rows) / 1e6) <= 1e-4
    # IV of a smoothed split is always >= 0 up to quantization loss
    assert iv_total >= -1e-4 * len(rows)
