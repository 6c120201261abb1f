"""Deterministic Lloyd k-means (IVF training): fixed seeds + fixed
iteration count → bit-reproducible; inertia must not increase across
iterations; every vector gets a valid centroid."""

from __future__ import annotations

from thread_based_map_reduce_spark.operators.similarity import kmeans_train

K, ITERS = 8, 3


def test_kmeans_deterministic_and_convergent(spark, sf_dir):
    a1, inertia1 = kmeans_train(spark, sf_dir, k=K, iters=ITERS)
    got1 = {r.vec_id: r.centroid for r in a1.collect()}
    a2, inertia2 = kmeans_train(spark, sf_dir, k=K, iters=ITERS)
    got2 = {r.vec_id: r.centroid for r in a2.collect()}

    assert got1 == got2 and inertia1 == inertia2  # no RNG anywhere
    assert len(inertia1) == ITERS
    assert all(b <= a * (1 + 1e-9) for a, b in zip(inertia1, inertia1[1:])), (
        "inertia increased across Lloyd iterations"
    )
    assert set(got1.values()) <= set(range(K))
    assert len(got1) == 500  # every vector assigned (sf0.001)
