"""HyperLogLog: exact register derivation vs pure-python bit_length,
estimate accuracy across magnitudes, and catalog-entry branch/accuracy
non-vacuity."""

import numpy as np
import pytest

from search_engine_core_ray.functions.hll import (
    HLL_M,
    HLL_MAX_RANK,
    estimate_from_registers,
    md5_lower64_array,
    register_partial,
    registers_from_hashes,
)

SF_DIR = "/root/testdata/sf0.001"


def test_registers_match_python_bit_length():
    rng = np.random.default_rng(9)
    h = rng.integers(0, 2**64, size=2000, dtype=np.uint64)
    # force some edge values
    h[:4] = [0, 1, 2**52 - 1, 2**63]
    idx, rank = registers_from_hashes(h)
    for hv, i, r in zip(h.tolist(), idx.tolist(), rank.tolist()):
        assert i == hv >> 52
        w = hv & (2**52 - 1)
        want = (52 + 1 - w.bit_length()) if w > 0 else HLL_MAX_RANK
        assert r == want, hv


def test_estimate_accuracy_across_magnitudes():
    # deterministic value streams; md5 is a good enough hash that the
    # estimate must land within ~3 sigma (sigma = 1.04/sqrt(4096))
    for n in (50, 1000, 20000, 200000):
        vals = [f"value-{i}" for i in range(n)]
        part = register_partial(vals)
        rows = list(zip(part.column("idx").to_pylist(),
                        part.column("rank").to_pylist()))
        est = estimate_from_registers(rows)["est"]
        assert abs(est - n) / n < 0.05, (n, est)


def test_partials_merge_like_one_pass():
    # max-merge of two partials == the single-pass registers
    a = [f"a{i}" for i in range(5000)]
    b = [f"b{i}" for i in range(5000)] + a[:1000]
    pa_, pb = register_partial(a), register_partial(b)
    merged: dict[int, int] = {}
    for p in (pa_, pb):
        for i, r in zip(p.column("idx").to_pylist(), p.column("rank").to_pylist()):
            merged[i] = max(merged.get(i, 0), r)
    one = register_partial(a + b)
    one_map = dict(zip(one.column("idx").to_pylist(),
                       one.column("rank").to_pylist()))
    assert merged == one_map


def test_hll_entry_exercises_both_branches(ray_session):
    from search_engine_core_ray.pipelines.catalog import QUERIES

    out = QUERIES["hll_distinct"](SF_DIR).to_pandas().set_index("field")
    # term/url cardinalities are far below 2.5m -> linear counting;
    # doc_term is above -> raw HLL branch
    assert out.loc["doc_term", "n_exact"] > 2.5 * HLL_M > out.loc["url", "n_exact"]
    for field in ("term", "url", "doc_term"):
        est, exact = out.loc[field, "est"], out.loc[field, "n_exact"]
        assert abs(est - exact) / max(exact, 1) < 0.06, (field, est, exact)
