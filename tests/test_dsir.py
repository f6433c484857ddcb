"""DSIR importance weights: target separation (non-vacuity), exact
hand oracle on a tiny corpus, zero-gram contract."""

import math

import numpy as np
import pyarrow as pa
import ray.data

from search_engine_core_ray.stages.dedup import _md5_lower64
from search_engine_core_ray.stages.dsir import LN_SCALE, dsir_logweights
from search_engine_core_ray.stages.textstats import round_half_away


def _ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "is_target": pa.array([r[2] for r in rows], pa.bool_()),
            }
        )
    ).repartition(2)


def test_exact_vs_hand_oracle(ray_session):
    rows = [(1, "aa bb", True), (2, "bb cc", False), (3, "aa", False)]
    got = {
        r["doc_id"]: r["w_q"]
        for r in dsir_logweights(_ds(rows), n_buckets=64).take_all()
    }
    # brute-force replay
    B = 64

    def grams(text):
        toks = text.split()
        return toks + [f"{x} {y}" for x, y in zip(toks, toks[1:])]

    cr, ct = {}, {}
    for _d, text, tgt in rows:
        for g in grams(text):
            b = int(_md5_lower64([g])[0] % np.uint64(B))
            cr[b] = cr.get(b, 0) + 1
            if tgt:
                ct[b] = ct.get(b, 0) + 1
    tr, tt = sum(cr.values()), sum(ct.values())
    dq = {
        b: int(
            round_half_away(
                np.float64(
                    np.log((ct.get(b, 0) + 1.0) / (tt + B))
                    - np.log((cr[b] + 1.0) / (tr + B))
                )
                * LN_SCALE,
                0,
            )
        )
        for b in cr
    }
    want = {}
    for d, text, _t in rows:
        want[d] = sum(
            dq[int(_md5_lower64([g])[0] % np.uint64(B))] for g in grams(text)
        )
    assert got == want
    # the target doc must outscore the disjoint non-target doc
    assert got[1] > got[2]


def test_zero_gram_docs_absent(ray_session):
    rows = [(1, "aa bb", True), (2, "?!", False)]
    got = dsir_logweights(_ds(rows)).take_all()
    assert {r["doc_id"] for r in got} == {1}


def test_catalog_entry_separates_target(ray_session):
    # non-vacuity on the real entry: injected sig tokens must pull
    # en-doc weights above the rest on average
    import duckdb

    from search_engine_core_ray.pipelines.catalog import QUERIES

    w = QUERIES["dsir_logweights"]("/root/testdata/sf0.001").to_pandas()
    con = duckdb.connect()
    lang = con.sql(
        "SELECT doc_id, lang FROM '/root/testdata/sf0.001/documents.parquet'"
    ).df()
    m = w.merge(lang, on="doc_id")
    en = m[m.lang == "en"]["w_q"].mean()
    rest = m[m.lang != "en"]["w_q"].mean()
    assert en > rest
    assert m["w_q"].nunique() > len(m) // 2  # weights genuinely vary


def test_dsir_select_matches_naive_topk(ray_session):
    """Two-phase threshold selection == naive (w_q DESC, doc_id ASC)
    top-k, on weights spanning negatives, boundary-bucket ties and
    duplicate values; exercised at several fractions incl. k == n."""
    from search_engine_core_ray.stages.dsir import dsir_select

    rng = np.random.default_rng(11)
    n = 500
    ids = np.arange(n, dtype=np.int64)
    # cluster weights so many land in the same 2^16 bucket + exact ties
    w = (rng.integers(-3, 4, n) * (1 << 16) + rng.integers(0, 5, n)).astype(
        np.int64
    )
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "w_q": pa.array(w)})
    ).repartition(4)

    order = sorted(zip(-w, ids))  # (w desc, doc_id asc)
    for num, den in [(1, 5), (1, 2), (9, 10), (1, 1)]:
        k = (num * n + den - 1) // den
        want = sorted(i for _, i in order[:k])
        got = sorted(
            r["doc_id"]
            for r in dsir_select(ds, frac_num=num, frac_den=den).take_all()
        )
        assert got == want, (num, den)


def test_dsir_select_empty(ray_session):
    from search_engine_core_ray.stages.dsir import dsir_select

    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "w_q": pa.array([], pa.int64())})
    )
    assert dsir_select(ds).count() == 0
