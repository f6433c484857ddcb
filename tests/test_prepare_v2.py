"""prepare_training_data_v2: the composed full recipe (scrub -> gate ->
exact dedup -> minhash near-dup drop -> span removal -> packing) does
REAL near-duplicate work on the synth corpus — not a pass-through of
the v1 pipeline.  Value-identity vs the composed DuckDB oracle is
covered by tests/test_catalog_oracle.py's parametrization."""

import pytest

import __ray_entry__ as entrymod

SF_DIR = __import__("os").environ.get("SECR_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def v1_v2(ray_session):
    qs = entrymod.queries()
    v1 = qs["prepare_training_data"](SF_DIR).to_pandas()
    v2 = qs["prepare_training_data_v2"](SF_DIR).to_pandas()
    return v1, v2


def test_near_dup_drop_removes_docs(v1_v2):
    v1, v2 = v1_v2
    docs1, docs2 = set(v1.doc_id), set(v2.doc_id)
    assert docs2 < docs1, "v2 must drop at least one near-duplicate doc"
    # dropped docs are never the LOWEST doc_id of their near-dup pair
    # (any-lower-id suppression keeps the minimum)
    assert min(docs1) in docs2


def test_packed_stream_shrinks_but_stays_contiguous(v1_v2):
    v1, v2 = v1_v2
    assert v2["len"].sum() < v1["len"].sum()
    # span map still partitions a contiguous token stream: per seq_id,
    # spans cover [0, seq_len) except the final partial sequence
    by_seq = v2.groupby("seq_id")["len"].sum()
    assert (by_seq.iloc[:-1] == by_seq.iloc[0]).all() or len(by_seq) <= 1
    assert (v2["len"] > 0).all()
    assert (v2["seq_off"] >= 0).all() and (v2["doc_off"] >= 0).all()
