"""Misra-Gries heavy-hitters: the mergeable-summaries error bound on
adversarial/random streams, exact-mode identity, and the Dataset fold
vs the pure-Python reference."""

import random
from collections import Counter

import polars as pl
import pyarrow as pa
import pytest

from search_engine_core_ray.stages.sketches import (
    _compress,
    heavy_hitters,
    mg_reference_merge,
)

SF_DIR = "/root/testdata/sf0.001"


def _zipf_streams(rng, n_streams, n_per, vocab=200, s=1.3):
    # skewed stream: token i with weight ~ 1/i^s
    weights = [1.0 / (i + 1) ** s for i in range(vocab)]
    toks = [f"w{i}" for i in range(vocab)]
    return [
        rng.choices(toks, weights=weights, k=n_per) for _ in range(n_streams)
    ]


def test_mg_error_bound_and_heavy_hitter_guarantee():
    rng = random.Random(77)
    for m in (8, 16, 64):
        streams = _zipf_streams(rng, n_streams=7, n_per=500)
        truth = Counter(t for s in streams for t in s)
        n_total = sum(truth.values())
        est = mg_reference_merge(streams, m)
        bound = n_total / (m + 1)
        # every estimate is a lower bound within bound of truth
        for term, c in est.items():
            assert c <= truth[term]
            assert truth[term] - c <= bound, (m, term)
        # every true heavy hitter (> N/(m+1)) survives the fold
        for term, c in truth.items():
            if c > bound:
                assert term in est, (m, term)


def test_mg_exact_when_capacity_covers_vocab():
    rng = random.Random(5)
    streams = _zipf_streams(rng, n_streams=4, n_per=300, vocab=50)
    truth = Counter(t for s in streams for t in s)
    est = mg_reference_merge(streams, m=1000)
    assert est == dict(truth)


def test_compress_drops_to_capacity_and_keeps_order():
    t = pl.DataFrame(
        {"term": [f"t{i}" for i in range(10)],
         "cnt": [100, 90, 80, 70, 60, 50, 40, 30, 20, 10]},
        schema={"term": pl.String, "cnt": pl.Int64},
    )
    out = _compress(t, 3)
    # threshold is the 4th-largest (70): survivors 100-70, 90-70, 80-70
    assert dict(zip(out["term"], out["cnt"])) == {"t0": 30, "t1": 20, "t2": 10}
    assert _compress(t, 10).height == 10  # no-op at capacity


def test_heavy_hitters_dataset_exact_mode(ray_session):
    import ray.data

    # whole corpus, exact mode: fold == plain polars count
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
    out = heavy_hitters(
        ray.data.from_arrow(tbl).repartition(6), m=4096, k=15
    ).to_pandas()
    truth = (
        pl.from_arrow(tbl)
        .with_columns(pl.col("text").fill_null("").str.extract_all(r"[A-Za-z0-9]{2,}").alias("tok"))
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
        .group_by("term")
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .sort(["cnt", "term"], descending=[True, False])
        .head(15)
    )
    assert out["term"].tolist() == truth["term"].to_list()
    assert out["cnt"].tolist() == truth["cnt"].to_list()
    assert out["rank"].tolist() == list(range(1, 16))


def test_heavy_hitters_dataset_small_m_bound(ray_session):
    import ray.data

    rng = random.Random(11)
    streams = _zipf_streams(rng, n_streams=6, n_per=400)
    truth = Counter(t for s in streams for t in s)
    n_total = sum(truth.values())
    docs = pa.table({"text": [" ".join(s) for s in streams]})
    m = 12
    out = heavy_hitters(
        ray.data.from_arrow(docs).repartition(3), m=m, k=m
    ).to_pandas()
    bound = n_total / (m + 1)
    for term, c in zip(out["term"], out["cnt"]):
        assert c <= truth[term] and truth[term] - c <= bound
    # every true hitter above the bound must be present (and the
    # stream is skewed enough that at least one is)
    guaranteed = [t for t, c in truth.items() if c > bound]
    assert guaranteed
    assert set(guaranteed) <= set(out["term"])


# --------------------------------------------------------------- Bloom


def test_bloom_flags_superset_of_exact_and_fp_rate():
    import numpy as np

    from search_engine_core_ray.functions.hll import md5_lower64_array
    from search_engine_core_ray.stages.sketches import (
        BLOOM_K,
        BLOOM_M_BITS,
        bloom_build,
        bloom_positions,
    )

    bench = [f"w{i} w{i+1} w{i+2}" for i in range(0, 3000, 3)]
    bits = bloom_build(bench, BLOOM_M_BITS, BLOOM_K)
    # every inserted value is flagged (no false negatives, ever)
    pos = bloom_positions(md5_lower64_array(bench), BLOOM_M_BITS, BLOOM_K)
    assert bits[pos].all(axis=1).all()
    # false-positive rate on disjoint probes tracks (1 - e^-kd/m)^k
    probes = [f"q{i} q{i+1} q{i+2}" for i in range(20000)]
    ppos = bloom_positions(md5_lower64_array(probes), BLOOM_M_BITS, BLOOM_K)
    fp = bits[ppos].all(axis=1).mean()
    d = len(set(bench))
    expected = (1 - np.exp(-BLOOM_K * d / BLOOM_M_BITS)) ** BLOOM_K
    assert fp <= max(4 * expected, 0.01), (fp, expected)


def test_bloom_entry_superset_of_exact_contamination(ray_session):
    from search_engine_core_ray.pipelines.catalog import QUERIES

    bloom = (
        QUERIES["bloom_contaminated"]("/root/testdata/sf0.001")
        .to_pandas().set_index("doc_id").sort_index()
    )
    exact = (
        QUERIES["contamination_frac"]("/root/testdata/sf0.001")
        .to_pandas().set_index("doc_id").sort_index()
    )
    assert (bloom["n_win"] == exact["n_win"]).all()
    # Bloom can only over-flag, never miss
    assert (bloom["flagged_win"] >= exact["contam_win"]).all()
    assert bloom["flagged_win"].sum() > 0  # non-vacuous


# ----------------------------------------------------------- Count-Min


def test_cm_overestimate_guarantee(ray_session):
    import ray.data

    from search_engine_core_ray.stages.sketches import cm_estimate

    rng = random.Random(31)
    streams = _zipf_streams(rng, n_streams=5, n_per=800, vocab=400)
    truth = Counter(t for s in streams for t in s)
    docs = pa.table({"text": [" ".join(s) for s in streams]})
    probes = [t for t, _ in truth.most_common(5)] + ["w399", "absent1", "absent2"]
    out = cm_estimate(
        ray.data.from_arrow(docs).repartition(3), probes
    ).to_pandas().set_index("term")
    n_total = sum(truth.values())
    for t in probes:
        est = int(out.loc[t, "est"])
        assert est >= truth.get(t, 0), t          # never underestimates
        # e/width error bound at 3 sigma-ish slack
        assert est - truth.get(t, 0) <= max(10, 8 * n_total / 2048), t


def test_cm_entry_probe_mix(ray_session):
    from search_engine_core_ray.pipelines.catalog import QUERIES

    out = QUERIES["cm_term_counts"]("/root/testdata/sf0.001").to_pandas()
    out = out.set_index("term")
    assert (out["est"] >= out["true_cnt"]).all()
    assert out.loc["zzznotaterm", "true_cnt"] == 0
    assert out.loc["query", "true_cnt"] > 300  # real common-term count
