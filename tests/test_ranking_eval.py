"""Ranking-evaluation metric core: hand-checked NDCG/MRR/recall values,
float-reference agreement of the fixed-point DCG, and catalog-entry
metric variety (the eval must discriminate between runs)."""

import math

import pytest

from search_engine_core_ray.functions.ranking_eval import (
    DCG_W,
    NDCG_K,
    gain,
    idcg_from_counts,
    query_metrics,
)

SF_DIR = "/root/testdata/sf0.001"


def test_dcg_weights_are_rounded_micro_discounts():
    for i, w in enumerate(DCG_W, start=1):
        assert w == round(10**6 / math.log2(i + 1))
    assert DCG_W[0] == 10**6  # log2(2) == 1


def test_query_metrics_hand_example():
    # run: rel sequence [2, 0, 1] at ranks 1..3; corpus has 2 docs of
    # grade 2 and 3 of grade 1 (n_rel = 5)
    run = [(1, 2), (2, 0), (3, 1)]
    counts = {2: 2, 1: 3}
    m = query_metrics(run, counts, k=NDCG_K)
    dcg = gain(2) * DCG_W[0] + gain(1) * DCG_W[2]
    idcg = (
        gain(2) * DCG_W[0] + gain(2) * DCG_W[1]
        + gain(1) * DCG_W[2] + gain(1) * DCG_W[3] + gain(1) * DCG_W[4]
    )
    assert m["ndcg"] == dcg / idcg
    assert m["mrr"] == 1.0
    assert m["recall"] == 2 / 5
    assert m["n_rel"] == 5
    # float-reference sanity: micro-weights track 1/log2 within 1e-5
    ref_dcg = gain(2) / math.log2(2) + gain(1) / math.log2(4)
    ref_idcg = (
        gain(2) / math.log2(2) + gain(2) / math.log2(3)
        + gain(1) / math.log2(4) + gain(1) / math.log2(5) + gain(1) / math.log2(6)
    )
    assert m["ndcg"] == pytest.approx(ref_dcg / ref_idcg, abs=1e-5)


def test_query_metrics_edge_cases():
    # nothing relevant anywhere
    m = query_metrics([(1, 0), (2, 0)], {})
    assert m == {"ndcg": 0.0, "mrr": 0.0, "recall": 0.0, "n_rel": 0, "n_run": 2}
    # first relevant at rank 4
    m = query_metrics([(1, 0), (2, 0), (3, 0), (4, 1)], {1: 1})
    assert m["mrr"] == 0.25 and m["recall"] == 1.0 and m["ndcg"] > 0
    # idcg histogram caps at k
    counts = {2: 100}
    assert idcg_from_counts(counts) == sum(gain(2) * w for w in DCG_W)


def test_ranking_eval_discriminates_runs(ray_session):
    from search_engine_core_ray.pipelines.catalog import QUERIES

    out = QUERIES["ranking_eval"](SF_DIR).to_pandas()
    assert len(out) == 6 and set(out["run_name"]) == {"bm25", "by_id"}
    # non-vacuity: every metric takes at least two distinct values
    for col in ("ndcg10", "mrr10", "recall10"):
        assert out[col].nunique() >= 2, col
    # and the two runs actually disagree on at least one query
    piv = out.pivot(index="query", columns="run_name", values="ndcg10")
    assert (piv["bm25"] != piv["by_id"]).any()
    assert ((out["ndcg10"] >= 0) & (out["ndcg10"] <= 1)).all()
