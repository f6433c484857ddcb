"""PForDelta postings codec: round-trip properties, the multi-run
encoder vs the single-run twin, and end-to-end index integration —
an index built with codec="pfor" is rank-identical (and score-identical)
to the vbyte index on a mixed query set, with the codec recorded in
the manifest and applied by the reader.

PFor semantics are the public NewPFD family (Zukowski et al. ICDE'06,
Yan et al. WWW'09); the reference engine stores postings in Redis
(RedisSearchStorage) so this codec has no reference twin to match —
the correctness bar is self-inverse + engine identity across codecs.
"""

import numpy as np
import pytest

import ray.data

from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_table
from search_engine_core_ray.index.build import build_index
from search_engine_core_ray.index.codec import (
    decode_postings,
    encode_runs,
    pfor_decode,
    pfor_encode,
    pfor_encode_runs,
    varbyte_encode,
)
from search_engine_core_ray.query.engine import SearchEngine


def _dists(rng, n):
    """Value streams shaped like real posting data."""
    if n == 0:
        return [np.empty(0, np.uint64)]
    out = []
    # doc-id gaps: small with one absolute 63-bit head
    g = rng.integers(1, 5000, n).astype(np.uint64)
    g[0] = np.uint64((1 << 62) + 12345)
    out.append(g)
    # term frequencies: mostly 0..3, heavy zero
    out.append(rng.choice([0, 0, 0, 1, 1, 2, 3, 9], n).astype(np.uint64))
    # uniform wide + rare huge outliers (exception stress)
    w = rng.integers(0, 1 << 24, n).astype(np.uint64)
    w[rng.random(n) < 0.03] = np.uint64(1) << np.uint64(61)
    out.append(w)
    return out


@pytest.mark.parametrize("n", [0, 1, 2, 127, 128, 129, 255, 256, 1000, 4321])
def test_pfor_round_trip(n):
    rng = np.random.default_rng(100 + n)
    for v in _dists(rng, n):
        enc = pfor_encode(v)
        dec = pfor_decode(enc)
        assert dec.dtype == np.uint64
        assert np.array_equal(dec, v)


def test_pfor_edge_streams():
    for v in [
        np.zeros(300, np.uint64),                        # width-0 blocks
        np.full(200, (1 << 63) + 7, np.uint64),          # max-width values
        np.array([0, 1, 1 << 63, 2, 0], np.uint64),      # lone outlier
        np.arange(128, dtype=np.uint64),                 # exactly one block
    ]:
        assert np.array_equal(pfor_decode(pfor_encode(v)), v)


def test_pfor_runs_match_single_run_twin():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 14, 700).astype(np.uint64)
    vals[rng.random(700) < 0.02] = np.uint64(1) << np.uint64(55)
    bounds = np.array([0, 3, 3, 130, 400, 699], dtype=np.int64)  # incl. empty run
    arr = pfor_encode_runs(vals, bounds)
    ends = list(bounds[1:]) + [len(vals)]
    for i, (lo, hi) in enumerate(zip(bounds, ends)):
        blob = arr[i].as_py()
        assert blob == pfor_encode(vals[lo:hi])
        assert np.array_equal(pfor_decode(blob), vals[lo:hi])


def test_pfor_smaller_than_vbyte_on_posting_gaps():
    """On dense small gaps (the head-term shape that dominates index
    bytes) PFor must beat VByte's 1-byte-per-value floor."""
    rng = np.random.default_rng(11)
    gaps = rng.integers(1, 50, 20000).astype(np.uint64)
    assert len(pfor_encode(gaps)) < len(varbyte_encode(gaps))


def test_codec_dispatch_round_trip_and_unknown():
    v = np.array([5, 6, 7], np.uint64)
    for codec in ("vbyte", "pfor"):
        arr = encode_runs(v, np.zeros(1, np.int64), codec)
        assert np.array_equal(decode_postings(arr[0].as_py(), codec), v)
    with pytest.raises(ValueError):
        encode_runs(v, np.zeros(1, np.int64), "lz77")
    with pytest.raises(ValueError):
        decode_postings(b"", "lz77")


QUERIES = [
    "search", "machine learning", "apple OR banana", '"the quick"',
    "site:example.com data", "-banana fruit", "prog*",
]


def test_index_pfor_identical_to_vbyte(ray_session, tmp_path):
    pages = synth_pages_table(SynthConfig(n_docs=220, seed=31))
    d_v = str(tmp_path / "idx_vbyte")
    d_p = str(tmp_path / "idx_pfor")
    build_index(ray.data.from_arrow(pages), d_v, lineage="cmp", num_shards=4)
    build_index(
        ray.data.from_arrow(pages), d_p, lineage="cmp", num_shards=4, codec="pfor"
    )
    e_v = SearchEngine(d_v)
    e_p = SearchEngine(d_p)
    assert e_v.manifest.get("codec", "vbyte") == "vbyte"
    assert e_p.manifest["codec"] == "pfor"
    for q in QUERIES:
        rv = e_v.search(q, limit=25)
        rp = e_p.search(q, limit=25)
        assert [r["doc_id"] for r in rv["results"]] == [
            r["doc_id"] for r in rp["results"]
        ], q
        sv = np.array([r["score"] for r in rv["results"]])
        sp = np.array([r["score"] for r in rp["results"]])
        assert np.allclose(sv, sp, rtol=0, atol=0), q  # bit-identical scores
        assert rv["total"] == rp["total"], q


def test_pfor_resume_reuses_segments(ray_session, tmp_path):
    """A second build into the same dir with the same lineage+codec
    skips the merge (per-partition resume) and stays readable."""
    import glob
    import os

    pages = synth_pages_table(SynthConfig(n_docs=60, seed=5))
    d = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(pages), d, lineage="r", num_shards=2, codec="pfor")
    seg = sorted(glob.glob(os.path.join(d, "segments", "*", "*.parquet")))
    mtimes = {p: os.path.getmtime(p) for p in seg}
    build_index(ray.data.from_arrow(pages), d, lineage="r", num_shards=2, codec="pfor")
    for p in seg:
        assert os.path.getmtime(p) == mtimes[p], "segment was rebuilt on resume"
    e = SearchEngine(d)
    assert e.search("search", limit=5)["total"] >= 0
