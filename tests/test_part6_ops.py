"""Edge cases for the part-6 operators (bpe_encode, c4_signals,
resolve_chains, SQ8) that the catalog oracle's fixture corpus cannot
reach: cycle guards, constant dimensions, empty/token-free docs, and
the encoder/counter consistency invariant."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(ray, rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


def test_resolve_chains_hops_and_terminals(ray_session):
    import ray.data

    from search_engine_core_ray.stages.linkgraph import resolve_chains

    # one 7-hop chain 7->6->...->0 plus an isolated node 100
    nodes = ray.data.from_arrow(
        pa.table({"src": pa.array(list(range(8)) + [100], pa.int64())})
    )
    edges = ray.data.from_arrow(
        pa.table(
            {
                "src": pa.array(list(range(1, 8)), pa.int64()),
                "dst": pa.array(list(range(0, 7)), pa.int64()),
            }
        )
    )
    out = {r["src"]: r for r in resolve_chains(nodes, edges).take_all()}
    assert len(out) == 9
    for s in range(8):
        assert out[s]["final"] == 0
        assert out[s]["hops"] == s
    assert out[100]["final"] == 100 and out[100]["hops"] == 0


def test_resolve_chains_cycle_raises(ray_session):
    import ray.data

    from search_engine_core_ray.stages.linkgraph import resolve_chains

    nodes = ray.data.from_arrow(pa.table({"src": pa.array([1, 2], pa.int64())}))
    edges = ray.data.from_arrow(
        pa.table({"src": pa.array([1, 2], pa.int64()),
                  "dst": pa.array([2, 1], pa.int64())})
    )
    with pytest.raises(RuntimeError, match="cycle|settled"):
        resolve_chains(nodes, edges, max_rounds=5)


def test_sq8_constant_dim_codes_zero(ray_session):
    import ray.data

    from search_engine_core_ray.functions.similarity import (
        sq8_encode,
        sq8_train,
    )

    # dim 0 constant, dim 1 spans [0, 1]: codes must be 0 / exact ends
    emb = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2], pa.int64()),
                "embedding": pa.array(
                    [[0.5, 0.0], [0.5, 1.0], [0.5, 0.5]],
                    pa.list_(pa.float32()),
                ),
            }
        )
    )
    mn, mx = sq8_train(emb)
    assert mn[0] == mx[0] == 500_000
    rows = {(r["vec_id"], r["dim"]): r["code"]
            for r in sq8_encode(emb, mn, mx).take_all()}
    assert rows[(0, 0)] == rows[(1, 0)] == rows[(2, 0)] == 0  # constant dim
    assert rows[(0, 1)] == 0
    assert rows[(1, 1)] == 255
    assert rows[(2, 1)] == 128  # round-half-away of 127.5


def test_bpe_encode_consistency_and_empty_doc(ray_session):
    from search_engine_core_ray.stages.bpe import bpe_encode, learn_bpe

    rows = [
        (0, "low lower lowest low low"),
        (1, "newer newest new low"),
        (2, "   "),  # token-free: must be dropped
        (3, None),  # null text: must be dropped
    ]
    docs = _docs_ds(ray_session, rows)
    merges, _words = learn_bpe(docs, n_merges=5)
    enc = {r["doc_id"]: r for r in bpe_encode(docs, merges).take_all()}
    assert set(enc) == {0, 1}

    # invariant: encoder symbol count == the count path's n_bpe_tokens
    import polars as pl

    from search_engine_core_ray.stages.bpe import split_symbols, word_repr

    pats = [
        (f"|{x}||{y}|", f"|{x}{y}|")
        for x, y in zip(merges.column("x").to_pylist(),
                        merges.column("y").to_pylist())
    ]

    def n_sym_of(text):
        import re

        total = 0
        for w in re.findall(r"[A-Za-z0-9]{2,}", text):
            r = word_repr(w.lower())
            for p, q in pats:
                r = r.replace(p, q)
            total += len(split_symbols(r))
        return total

    for did, text in rows[:2]:
        assert enc[did]["n_sym"] == n_sym_of(text)
        # prefix is a true prefix of the stream
        assert len(enc[did]["bpe_prefix"].split(" ")) <= 24


def test_c4_signals_empty_and_all_dropped(ray_session):
    from search_engine_core_ray.stages.textstats import c4_signals

    docs = _docs_ds(
        ray_session,
        [
            (0, ""),  # empty page
            (1, "no terminal punctuation here at all"),  # line dropped
            (2, "one. two. three. four. five sentences kept here ok."),
        ],
    ).map_batches(c4_signals, batch_format="pyarrow")
    out = {r["doc_id"]: r for r in docs.take_all()}
    empty_md5 = hashlib.md5(b"").hexdigest()
    assert out[0]["n_kept"] == 0 and out[0]["clean_md5"] == empty_md5
    assert not out[0]["keep"]
    assert out[1]["n_kept"] == 0 and not out[1]["keep"]
    # doc 2 is ONE line with 5 terminal marks -> 5 sentences, kept
    assert out[2]["n_kept"] == 1
    assert out[2]["n_sentences"] == 5
    assert out[2]["keep"]


def test_passage_stats_lowercases_df(ray_session):
    """df must use the same lowercasing as tf/oracle: a chunk holding
    only 'Dup' counts toward df('dup')."""
    import ray.data

    from search_engine_core_ray.pipelines.catalog import _passage_stats

    chunks = ray.data.from_arrow(
        pa.table(
            {
                "chunk_text": pa.array(["Dup table", "merge merge"],
                                       pa.string()),
                "tok_len": pa.array([2, 2], pa.int64()),
            }
        )
    )
    n, avgdl, dfs = _passage_stats(chunks, ["dup", "merge"])
    assert n == 2 and avgdl == 2.0
    assert dfs["dup"] == 1.0  # 'Dup' lowercased into the membership test
    assert dfs["merge"] == 1.0


def test_split_by_domain_null_source(ray_session, tmp_path):
    """NULL source maps to 'test' (oracle CASE fall-through), not a
    crash."""
    import pyarrow.parquet as pq

    from search_engine_core_ray.pipelines.catalog import QUERIES

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a", "b"], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                "source": pa.array(["src0", None], pa.string()),
                "n_chars": pa.array([1, 1], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    out = {r["doc_id"]: r["split"]
           for r in QUERIES["split_by_domain"](str(d)).take_all()}
    assert out[1] == "test"
    assert out[0] in ("train", "val", "test")
