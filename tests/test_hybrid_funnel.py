"""Non-vacuity checks for the hybrid-retrieval / eval / funnel entries
(value identity vs DuckDB is covered by test_catalog_oracle.py)."""

import pytest

import __ray_entry__ as entrymod

SF_DIR = __import__("os").environ.get("SECR_TEST_SF_DIR", "/root/testdata/sf0.001")


def _df(name):
    out = entrymod.queries()[name](SF_DIR)
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(out, ray.data.Dataset):
        return out.to_pandas()
    if isinstance(out, pa.Table):
        return out.to_pandas()
    return out


def test_rrf_fuses_both_sides(ray_session):
    df = _df("rrf_hybrid_topk")
    # top-10 per hybrid query, ranks contiguous
    assert set(df.groupby("query")["rnk"].max()) == {10}
    assert (df["rrf"] > 0).all()
    # fusion is non-vacuous: some results come from the text list only,
    # some from the vector list only, and the rank-0 sentinel marks the
    # missing side
    assert ((df.trank > 0) & (df.vrank == 0)).any()
    assert ((df.vrank > 0) & (df.trank == 0)).any()
    # a doc present in BOTH lists outranks equal single-side ranks
    both = df[(df.trank > 0) & (df.vrank > 0)]
    if len(both):
        assert (both.rrf > 1.0 / (60 + both.trank)).all()


def test_ann_recall_bounds(ray_session):
    df = _df("ann_recall")
    assert len(df) == 5
    assert ((df.recall >= 0) & (df.recall <= 1)).all()
    # probing 2 of 8 buckets on this corpus finds a meaningful share of
    # the exact neighbors — and not trivially all of them for every query
    assert df.recall.mean() > 0.2


def test_funnel_has_converters_and_non_converters(ray_session):
    df = _df("funnel_conversion")
    assert (df.converted.isin([0, 1])).all()
    assert df.converted.sum() > 0, "no converters — funnel is vacuous"
    assert (df.converted == 0).sum() > 0, "everyone converts — vacuous"
    conv = df[df.converted == 1]
    assert (conv.convert_us > 0).all()
    assert (conv.convert_us <= 2 * 24 * 3600 * 1_000_000).all()
    assert (df.loc[df.converted == 0, "convert_us"] == -1).all()


def test_mmr_diversifies(ray_session):
    """MMR's picks differ from the pure relevance top-5 for at least
    one query (otherwise the diversity term is vacuous on this
    corpus), scores stay rounded to 4 decimals, and no query repeats
    a pick."""
    import ray.data

    from search_engine_core_ray.functions.similarity import ann_topk
    from search_engine_core_ray.pipelines.catalog import ANN_QUERY_IDS, _read

    df = _df("mmr_diversify_topk")
    assert set(df.groupby("query_id")["pick"].max()) == {5}
    assert df.groupby("query_id").doc_id.nunique().min() == 5
    assert (df.mmr.round(4) == df.mmr).all()
    top5 = ann_topk(
        _read(SF_DIR, "embeddings"), ANN_QUERY_IDS, k=5, round_digits=4
    ).to_pandas()
    rel_sets = top5.groupby("query_id").neighbor_id.apply(set)
    mmr_sets = df.groupby("query_id").doc_id.apply(set)
    assert any(rel_sets[q] != mmr_sets[q] for q in rel_sets.index)
