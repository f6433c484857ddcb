"""BPE trainer: greedy non-overlap semantics, tie-break, tier
conformance (driver vs distributed rounds), and merge-table shape."""

import pyarrow as pa
import ray.data

from search_engine_core_ray.stages.bpe import (
    EOW,
    learn_bpe,
    split_symbols,
    word_repr,
)


def _docs_ds(texts):
    return ray.data.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(2)


def test_tier_conformance_on_corpus(ray_session):
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )
    m1, w1 = learn_bpe(docs, n_merges=6)
    m2, w2 = learn_bpe(docs, n_merges=6, collect_threshold=0)
    assert m1.equals(m2)
    assert sorted((r["term"], r["repr"]) for r in w1.take_all()) == sorted(
        (r["term"], r["repr"]) for r in w2.take_all()
    )
    # non-vacuity: rounds build MULTI-CHAR symbols (real subword growth)
    d = m1.to_pydict()
    assert len(d["round"]) == 6
    assert any(len(x) > 1 or len(y) > 1 for x, y in zip(d["x"], d["y"]))
    assert all(m == x + y for x, y, m in zip(d["x"], d["y"], d["merged"]))


def test_same_symbol_runs_fuse_non_overlapping(ray_session):
    # "aaaa": pairs (a,a) fusable twice per word (NOT the zip count 3)
    m, w = learn_bpe(_docs_ds(["aaaa aaaa", "aaaa"]), n_merges=2)
    d = m.to_pydict()
    assert (d["x"][0], d["y"][0], d["cnt"][0]) == ("a", "a", 6)
    # after round 1 every word is ||aa||aa||_||: pairs (aa,aa) and
    # (aa,_) tie at 3; '_' < 'a' so the lexicographic rule picks (aa,_)
    assert (d["x"][1], d["y"][1], d["cnt"][1]) == ("aa", "_", 3)
    reprs = {r["repr"] for r in w.take_all()}
    assert reprs == {"||aa||aa_||"}


def test_tiebreak_lexicographic(ray_session):
    # "ab" and "cd" each appear 3 times as words -> pairs (a,b) and
    # (c,d) tie at 3 with (b,_) and (d,_); smallest pair string wins
    m, _ = learn_bpe(_docs_ds(["ab cd ab", "cd ab cd"]), n_merges=1)
    d = m.to_pydict()
    assert (d["x"][0], d["y"][0]) == ("a", "b")


def test_early_stop_when_fully_fused(ray_session):
    # one word type "ab": merges a+b, ab+_, then nothing left
    m, w = learn_bpe(_docs_ds(["ab ab"]), n_merges=10)
    assert len(m) == 2
    assert [r["repr"] for r in w.take_all()] == [f"||ab{EOW}||"]


def test_counts_oracle_survives_early_stop(ray_session):
    # a fully-fusing corpus exhausts merges before BPE_MERGES rounds;
    # the SQL word chain must keep the fused words (LEFT JOIN ON TRUE
    # + chr(1) no-op), not empty the table via a CROSS JOIN
    import duckdb

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1::BIGINT, 'ab ab'), (2::BIGINT, 'ab')) t(doc_id, text)"
    )
    got = con.execute(entrymod.oracle_sql()["bpe_token_counts"]).df()
    # every word fuses to the single symbol 'ab_' -> 1 bpe token per word
    assert sorted(zip(got.doc_id, got.n_words, got.n_bpe_tokens)) == [
        (1, 2, 2), (2, 1, 1)
    ]


def test_repr_helpers_roundtrip():
    r = word_repr("cat")
    assert r == "||c||a||t||_||"
    assert split_symbols(r) == ["c", "a", "t", "_"]
