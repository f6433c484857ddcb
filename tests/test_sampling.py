"""stratified_sample / mixture_plan: determinism, exact-integer
semantics (including negative doc_id sign handling), and the
no-upsampling plan property.  The SQL-oracle identity itself is covered
by tests/test_catalog_oracle.py (stratified_sample, mixture_plan)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.stages.packing import KNUTH
from search_engine_core_ray.stages.sampling import (
    mixture_plan,
    sample_threshold,
    stratified_sample,
)


def _docs_table(ids, langs, sources=None, texts=None):
    n = len(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "lang": pa.array(langs),
            "source": pa.array(sources or ["s"] * n),
            "text": pa.array(texts or ["a b c"] * n),
        }
    )


def _ref_keep(doc_id: int, salt: int, thr: int) -> bool:
    """Pure-python reference of the keep rule (exact big-int residue)."""
    h = (((doc_id + salt) % 2**32) * KNUTH) % 2**32
    return h < thr


def test_sample_threshold_exact_ints():
    assert sample_threshold(0) == 0
    assert sample_threshold(1_000_000) == 2**32
    assert sample_threshold(500_000) == 2**31
    assert sample_threshold(250_000) == 2**30
    with pytest.raises(ValueError):
        sample_threshold(1_000_001)


def test_stratified_sample_matches_reference_rule(ray_session):
    rng = np.random.default_rng(5)
    ids = rng.integers(-(2**62), 2**62, 500).tolist()  # incl. negatives
    langs = rng.choice(["en", "fr", "de"], 500).tolist()
    rates = {"en": 500_000, "fr": 250_000}
    ds = ray.data.from_arrow(_docs_table(ids, langs))
    kept = set(
        r["doc_id"]
        for r in stratified_sample(ds, rates, key="lang", salt=23).take_all()
    )
    for i, lang in zip(ids, langs):
        thr = sample_threshold(rates.get(lang, 1_000_000))
        assert (i in kept) == _ref_keep(i, 23, thr), (i, lang)


def test_stratified_sample_deterministic_and_salt_independent(ray_session):
    ids = list(range(1000))
    langs = ["en"] * 1000
    ds = ray.data.from_arrow(_docs_table(ids, langs))
    a = sorted(r["doc_id"] for r in stratified_sample(ds, {"en": 400_000}, salt=1).take_all())
    b = sorted(r["doc_id"] for r in stratified_sample(ds, {"en": 400_000}, salt=1).take_all())
    c = sorted(r["doc_id"] for r in stratified_sample(ds, {"en": 400_000}, salt=2).take_all())
    assert a == b                      # reproducible
    assert a != c                      # new salt = independent sample
    assert 0.3 < len(a) / 1000 < 0.5   # close to the 40% target


def test_stratified_sample_rate_monotone(ray_session):
    """Raising a stratum's rate only ADDS documents (nested samples) —
    the property that makes rate tuning incremental."""
    ids = list(range(800))
    ds = ray.data.from_arrow(_docs_table(ids, ["en"] * 800))
    lo = set(r["doc_id"] for r in stratified_sample(ds, {"en": 200_000}).take_all())
    hi = set(r["doc_id"] for r in stratified_sample(ds, {"en": 600_000}).take_all())
    assert lo <= hi


def test_mixture_plan_no_upsampling_and_binding_source(ray_session):
    texts = {"a": "t " * 100, "b": "t " * 50, "c": "t " * 10}
    rows = []
    for s, t in texts.items():
        rows.extend((s, t) for _ in range(5))
    tbl = _docs_table(
        list(range(len(rows))),
        ["en"] * len(rows),
        sources=[s for s, _ in rows],
        texts=[t for _, t in rows],
    )
    plan = mixture_plan(
        ray.data.from_arrow(tbl), {"a": 1, "b": 1, "c": 1}
    ).to_pylist()
    by = {r["source"]: r for r in plan}
    # equal weights -> the smallest source binds and is taken in full
    assert by["c"]["rate_ppm"] == 1_000_000
    assert by["c"]["sampled_tokens"] == by["c"]["n_tokens"]
    for r in plan:
        assert r["sampled_tokens"] <= r["n_tokens"]  # never upsample
        assert 0 <= r["rate_ppm"] <= 1_000_000
    # target proportions realized exactly (equal weights, integer floor)
    assert by["a"]["sampled_tokens"] == by["b"]["sampled_tokens"] == by["c"]["n_tokens"]


def test_mixture_plan_weight_validation(ray_session):
    ds = ray.data.from_arrow(_docs_table([1], ["en"]))
    with pytest.raises(ValueError):
        mixture_plan(ds, {})
    with pytest.raises(ValueError):
        mixture_plan(ds, {"s": 0})
