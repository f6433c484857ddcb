"""Elias-Fano postings codec: round-trip properties, the multi-run
encoder vs the single-run twin, and end-to-end index integration — an
index built with codec="ef" is rank-identical (and score-identical) to
the vbyte index on a mixed query set, with the codec recorded in the
manifest and applied by the reader.

EF semantics are the public quasi-succinct-index construction (Elias
1974, Fano 1971; Vigna WSDM'13 for the inverted-index application); the
reference engine stores postings in Redis (RedisSearchStorage) so this
codec has no reference twin to match — the correctness bar is
self-inverse + engine identity across codecs. Non-monotone value
streams (tf runs) are prefix-summed inside the codec, so "ef" keeps the
same raw-stream contract as vbyte/pfor.
"""

import numpy as np
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.index.codec import (
    decode_postings,
    ef_decode,
    ef_encode,
    ef_encode_runs,
    encode_runs,
    pfor_encode,
    varbyte_encode,
)
from search_engine_core_ray.query.engine import SearchEngine


def _dists(rng, n):
    """Value streams shaped like real posting data (per-run sums must
    fit in uint64 — the documented EF precondition)."""
    if n == 0:
        return [np.empty(0, np.uint64)]
    out = []
    # doc-id gaps: small with one large absolute head
    g = rng.integers(1, 5000, n).astype(np.uint64)
    g[0] = np.uint64((1 << 55) + 12345)
    out.append(g)
    # term frequencies: mostly 0..3, heavy zero
    out.append(rng.choice([0, 0, 0, 1, 1, 2, 3, 9], n).astype(np.uint64))
    # uniform wide (cumsum still < 2^64 at n <= 4321)
    out.append(rng.integers(0, 1 << 24, n).astype(np.uint64))
    # all-zero stream (l == 0, upper array only)
    out.append(np.zeros(n, np.uint64))
    return out


@pytest.mark.parametrize("n", [0, 1, 2, 7, 8, 127, 128, 129, 1000, 4321])
def test_ef_round_trip(n):
    rng = np.random.default_rng(200 + n)
    for v in _dists(rng, n):
        enc = ef_encode(v)
        dec = ef_decode(enc)
        assert dec.dtype == np.uint64
        assert np.array_equal(dec, v)


def test_ef_edge_streams():
    for v in [
        np.zeros(300, np.uint64),                   # l=0, dense upper
        np.array([1 << 62], np.uint64),             # one huge value
        np.array([0, 0, 0], np.uint64),             # duplicate prefix sums
        np.arange(128, dtype=np.uint64),            # smooth ramp
        np.array([5], np.uint64),                   # single small value
    ]:
        assert np.array_equal(ef_decode(ef_encode(v)), v)


def test_ef_overflow_raises():
    """Per-run sum >= 2^64 is detected, not silently wrapped."""
    with pytest.raises(ValueError, match="overflow"):
        ef_encode(np.full(4, np.uint64(1) << np.uint64(63), np.uint64))


def test_ef_runs_match_single_run_twin():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 14, 700).astype(np.uint64)
    vals[rng.random(700) < 0.02] = np.uint64(1) << np.uint64(40)
    bounds = np.array([0, 3, 3, 130, 400, 699], dtype=np.int64)  # incl. empty run
    arr = ef_encode_runs(vals, bounds)
    ends = list(bounds[1:]) + [len(vals)]
    for i, (lo, hi) in enumerate(zip(bounds, ends)):
        blob = arr[i].as_py()
        assert blob == ef_encode(vals[lo:hi])
        assert np.array_equal(ef_decode(blob), vals[lo:hi])


def test_ef_smaller_than_vbyte_on_posting_streams():
    """EF's prefix-sum trick gives ~(2 + log2(mean)) bits/value —
    always under VByte's 8-bit floor on dense posting shapes. (PFor can
    still edge it out when values fit one tiny packed width, e.g. tf in
    {1,2,3} packs at 2 bits vs EF's ~2.6; both are asserted against the
    VByte floor, the honest shared bar.)"""
    rng = np.random.default_rng(11)
    tf = rng.choice([1, 1, 1, 1, 2, 2, 3], 20000).astype(np.uint64)
    assert len(ef_encode(tf)) < len(varbyte_encode(tf))
    gaps = rng.integers(1, 50, 20000).astype(np.uint64)
    assert len(ef_encode(gaps)) < len(varbyte_encode(gaps))


def test_ef_escape_tag_on_zipf_tail_runs():
    """Hashed 63-bit doc-id spaces make df-1 runs cheaper in VByte than
    in EF's 13-byte header; the codec must take the escape there and
    the EF branch on head terms, both transparently to the decoder."""
    rng = np.random.default_rng(3)
    tail = np.array([(1 << 62) + 99], np.uint64)              # df=1 gap run
    head = rng.integers(1, 2**20, 5000).astype(np.uint64)     # df=5000 gaps
    e_tail, e_head = ef_encode(tail), ef_encode(head)
    assert e_tail[4] == 0xFF, "tail run should take the VByte escape"
    assert e_head[4] != 0xFF, "head run should take the EF branch"
    assert np.array_equal(ef_decode(e_tail), tail)
    assert np.array_equal(ef_decode(e_head), head)
    # escape caps the cost at vbyte + 5-byte header
    assert len(e_tail) == 5 + len(varbyte_encode(tail))
    # mixed runs through the multi-run encoder
    vals = np.concatenate((tail, head))
    arr = ef_encode_runs(vals, np.array([0, 1], np.int64))
    assert arr[0].as_py() == e_tail and arr[1].as_py() == e_head


def test_ef_dispatch_round_trip():
    v = np.array([5, 6, 7], np.uint64)
    arr = encode_runs(v, np.zeros(1, np.int64), "ef")
    assert np.array_equal(decode_postings(arr[0].as_py(), "ef"), v)


QUERIES = [
    "search", "machine learning", "apple OR banana", '"the quick"',
    "site:example.com data", "-banana fruit", "prog*",
]


def test_index_ef_identical_to_vbyte(ray_session, tmp_path):
    pages = synth_pages_table(SynthConfig(n_docs=220, seed=31))
    d_v = str(tmp_path / "idx_vbyte")
    d_e = str(tmp_path / "idx_ef")
    build_index(ray.data.from_arrow(pages), d_v, lineage="cmp", num_shards=4)
    build_index(
        ray.data.from_arrow(pages), d_e, lineage="cmp", num_shards=4, codec="ef"
    )
    e_v = SearchEngine(d_v)
    e_e = SearchEngine(d_e)
    assert e_v.manifest.get("codec", "vbyte") == "vbyte"
    assert e_e.manifest["codec"] == "ef"
    for q in QUERIES:
        rv = e_v.search(q, limit=25)
        re_ = e_e.search(q, limit=25)
        assert [r["doc_id"] for r in rv["results"]] == [
            r["doc_id"] for r in re_["results"]
        ], q
        sv = np.array([r["score"] for r in rv["results"]])
        se = np.array([r["score"] for r in re_["results"]])
        assert np.allclose(sv, se, rtol=0, atol=0), q  # bit-identical scores
        assert rv["total"] == re_["total"], q
