"""Two-level IVF ANN search (q48, hierarchical descent): exhaustive-probe
degeneracy vs the q40 brute force (exact, including ranks and sim values),
recall@k against the same baseline, and live-quantizer search coverage.
The frozen-quantizer driver path additionally carries a full DuckDB oracle
(tests/test_entry_contract.py::q48)."""

from __future__ import annotations

from docling_service_spark.queries.ann import (
    N_QUERIES,
    TOP_K,
    ivf2_ann_topk,
    q48_ivf2_ann_topk,
    train_ivf_2level,
    _frozen2_quantizer,
)
from docling_service_spark.queries.similarity import q40_cosine_topk

SF_DIR = "/root/testdata/sf0.01"


def test_exhaustive_descent_equals_brute_force(spark):
    """n_probe1 = k₁, n_probe2 = k₁·k₂ searches every cluster, so the
    descent must reproduce q40 EXACTLY — ranks, neighbors, sim_e6 — proving
    routing/candidate plumbing loses nothing and the scoring recipe is
    identical to the brute-force path."""
    quant = _frozen2_quantizer(spark)
    exact = sorted(tuple(r) for r in q40_cosine_topk(spark, SF_DIR).collect())
    full = sorted(
        tuple(r) for r in
        ivf2_ann_topk(spark, SF_DIR, quant,
                      n_probe1=quant.k1, n_probe2=quant.k1 * quant.k2).collect())
    assert full == exact


def test_ivf2_recall_vs_bruteforce(spark):
    exact = q40_cosine_topk(spark, SF_DIR).collect()
    approx = q48_ivf2_ann_topk(spark, SF_DIR).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    for r in approx:
        got.setdefault(r["probe_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(range(N_QUERIES))
    recalls = [len(truth[p] & got[p]) / TOP_K for p in truth]
    # Near-orthogonal synthetic vectors are ANN's worst case; the descent
    # searches 4 of 16 fine cells (~25% of the corpus), the q45 budget.
    assert sum(recalls) / len(recalls) >= 0.3, recalls
    # The probe's own coarse cell is its rank-1 coarse route and its own
    # fine cell its nearest fine centroid, so the probe finds itself.
    for r in approx:
        if r["rank"] == 1:
            assert r["neighbor_id"] == r["probe_id"]


def test_ivf2_ann_rows_shape(spark):
    df = q48_ivf2_ann_topk(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == N_QUERIES * TOP_K
    assert df.columns == ["probe_id", "neighbor_id", "rank", "sim_e6"]


def test_descent_with_live_trained_quantizer(spark):
    """The non-frozen path: train the hierarchy live, search with it.  Pin
    the self-recall invariant (probe's own cluster is always descended)."""
    quant = train_ivf_2level(spark, SF_DIR, k=16)
    try:
        rows = ivf2_ann_topk(spark, SF_DIR, quant).collect()
        by_probe = {}
        for r in rows:
            by_probe.setdefault(r["probe_id"], []).append(r)
        assert set(by_probe) == set(range(N_QUERIES))
        for p, rs in by_probe.items():
            top = min(rs, key=lambda r: r["rank"])
            assert top["neighbor_id"] == p and top["sim_e6"] >= 999_999
    finally:
        quant.unpersist()
