"""Recall gate for the banded sign-LSH (VERDICT r1 next-round #2).

Round-1's fixed 256-bucket scheme measured recall@3 = 0.033; the banded
construction (16 seeded hyperplanes, 4 band tables) must never regress
below a floor well above that, and hamming-1 multi-probe must approach
brute force. Any retune of N_PLANES / N_LSH_BANDS is gated here.
"""

from __future__ import annotations

from thread_based_map_reduce_spark.plans.catalog import CATALOG, queries

ROUND1_RECALL = 0.033  # the measured floor the redesign must beat
BANDED_FLOOR = 0.30
MULTIPROBE_FLOOR = 0.80


def _mean_recall(spark, sf_dir) -> float:
    queries()
    df = CATALOG["ann_recall_eval"].fn(spark, sf_dir).toPandas()
    assert len(df) == 10  # one row per query vector
    return float(df.recall_at_3.mean())


def test_banded_recall_floor(spark, sf_dir):
    r = _mean_recall(spark, sf_dir)
    assert r > ROUND1_RECALL
    assert r >= BANDED_FLOOR


def test_multiprobe_recall_floor(spark, sf_dir):
    queries()
    bf = CATALOG["ann_bruteforce_topk"].fn(spark, sf_dir).toPandas()
    mp = CATALOG["ann_lsh_multiprobe"].fn(spark, sf_dir).toPandas()
    truth = {(r.qid, r.vec_id) for r in bf[bf.rnk <= 3].itertuples()}
    got = {(r.qid, r.vec_id) for r in mp.itertuples()}
    recall = len(truth & got) / len(truth)
    assert recall >= MULTIPROBE_FLOOR


def test_multiprobe_supersets_banded_candidates(spark, sf_dir):
    """Probe delta 0 is the exact bucket: multi-probe candidates must be a
    superset of the plain banded candidates."""
    from pyspark.sql import functions as F

    from thread_based_map_reduce_spark.operators.similarity import lsh_candidates
    from thread_based_map_reduce_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    plain = {tuple(r) for r in lsh_candidates(emb, multiprobe=False).collect()}
    probed = {tuple(r) for r in lsh_candidates(emb, multiprobe=True).collect()}
    assert plain <= probed
    # and the LSH candidate set prunes: far fewer pairs than the cross join
    n = emb.count()
    assert len(plain) < 10 * (n - 1) * 0.6
