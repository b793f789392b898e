"""Hyperplane-count sizing rule (round-2 verdict item): per-bucket pair
work must stay bounded as the corpus grows — a FIXED plane count makes
same-bucket pair counts grow ~quadratically with corpus size.

The properties are numeric (bucket occupancy under sign-random-projection),
so they're checked with NumPy over the SAME deterministic integer
hyperplanes the engine bakes into its Spark/SQL expressions — no Spark
session needed, which keeps the 10x-scale case cheap to test exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from docling_service_spark.queries.similarity import (
    DIM,
    TARGET_BUCKET_SIZE,
    hyperplane_weights,
    n_planes_for,
)


def _buckets(n_vecs: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n_vecs, DIM))
    w = np.array([[hyperplane_weights(i, j) for j in range(n_planes)]
                  for i in range(DIM)], dtype=np.float64)
    bits = (x @ w) > 0
    return (bits * (1 << np.arange(n_planes))).sum(axis=1)


def _pair_count(buckets: np.ndarray) -> int:
    _, counts = np.unique(buckets, return_counts=True)
    return int((counts * (counts - 1) // 2).sum())


def test_rule_pins_expected_occupancy():
    for n in (100, 1_000, 10_000, 1_000_000, 10**9, 10**12):
        planes = n_planes_for(n)
        occ = n / (1 << planes)
        # ceil(log2) lands expected occupancy in (target/2, target].
        assert TARGET_BUCKET_SIZE / 2 < occ <= TARGET_BUCKET_SIZE, (n, planes, occ)


def test_rule_edge_cases():
    assert n_planes_for(0) == 1
    assert n_planes_for(TARGET_BUCKET_SIZE) == 1
    assert n_planes_for(10**30) == 62  # bigint bucket-id cap


def test_occupancy_growth_decoupled_from_corpus_growth():
    """10x corpus with the rule's planes: the hottest bucket grows far
    slower than the corpus (the tail skew of the deterministic integer
    hyperplanes, not linear fill), while a FIXED plane count grows the
    hottest bucket ~10x — linearly with the corpus."""
    n1, n2 = 2_000, 20_000
    p1, p2 = n_planes_for(n1), n_planes_for(n2)
    assert p2 >= p1 + 3  # 10x ⇒ +3-4 planes

    max1 = np.bincount(_buckets(n1, p1).astype(int)).max()
    max2 = np.bincount(_buckets(n2, p2).astype(int)).max()
    fixed = np.bincount(_buckets(n2, p1).astype(int)).max()
    assert max2 < 6 * max1, (max1, max2)   # rule: well under the 10x of linear
    assert fixed > 8 * max1                 # fixed planes: ~linear growth
    assert fixed > 2 * max2                 # and strictly worse than the rule


def test_pair_count_grows_linearly_not_quadratically():
    n1, n2 = 2_000, 20_000
    pairs1 = _pair_count(_buckets(n1, n_planes_for(n1)))
    pairs2 = _pair_count(_buckets(n2, n_planes_for(n2)))
    growth = pairs2 / max(pairs1, 1)
    # Quadratic would be ~100x; the rule keeps it near-linear (~10x).
    assert growth < 25, (pairs1, pairs2, growth)

    pairs_fixed = _pair_count(_buckets(n2, n_planes_for(n1)))
    assert pairs_fixed / max(pairs1, 1) > 40  # fixed planes ⇒ ~quadratic


def test_driver_scale_uses_pinned_planes():
    """At the driver's correctness/bench scales the rule's output is <= the
    pinned N_PLANES, so static oracles and the rule agree by construction."""
    from docling_service_spark.queries.similarity import N_PLANES

    for sf_vecs in (500, 5_000):  # sf0.01, sf0.1
        assert n_planes_for(sf_vecs) <= N_PLANES


@pytest.mark.parametrize("j", range(12))
def test_hyperplanes_are_nondegenerate(j):
    w = [hyperplane_weights(i, j) for i in range(DIM)]
    assert any(v > 0 for v in w) and any(v < 0 for v in w)
