"""Duplicated-line removal (C4 §2.2 / RefinedWeb §3.2 analog):
semantics pinned against a scalar Python oracle on dup-heavy fixtures,
plus the no-dup identity path and the catalog entry's DuckDB oracle
agreement at sf0.001 (where the transform is an identity — the synth
docs share no exact lines, so the SQL gate checks the
no-false-positive direction and these fixtures check the removals).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.stages.dedup import line_dedup


def _oracle(docs: dict[int, str]) -> dict[int, str]:
    from collections import defaultdict

    owners = defaultdict(set)
    for d, t in docs.items():
        for line in t.split("\n"):
            k = line.strip(" \t\r")
            if k:
                owners[k].add(d)
    dup = {k for k, v in owners.items() if len(v) >= 2}
    return {
        d: "\n".join(
            l for l in t.split("\n") if l.strip(" \t\r") not in dup
        )
        for d, t in docs.items()
    }


def _run(docs: dict[int, str]) -> dict[int, str]:
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values()), pa.string()),
        }
    )
    out = line_dedup(ray.data.from_arrow(tbl)).to_pandas()
    return dict(zip(out["doc_id"], out["text"]))


FIXTURE = {
    1: "unique alpha\ncookie banner accept all\nunique beta",
    2: "cookie banner accept all\nsomething else entirely",
    3: "  cookie banner accept all \t\nunrelated line\ncookie banner accept all",
    4: "no boilerplate here at all",
    5: "",
    6: "shared footer line\nmiddle\nshared footer line",  # dup only within ONE doc
    7: "\n\nonly blank lines\n\n",
}


def test_matches_scalar_oracle(ray_session):
    assert _run(FIXTURE) == _oracle(FIXTURE)


def test_cross_doc_lines_removed_in_every_occurrence(ray_session):
    out = _run(FIXTURE)
    assert out[1] == "unique alpha\nunique beta"
    assert out[2] == "something else entirely"
    # whitespace-variant occurrences share the stripped key and all go,
    # including the repeat
    assert out[3] == "unrelated line"


def test_within_doc_repeat_is_kept(ray_session):
    out = _run(FIXTURE)
    assert out[6] == FIXTURE[6]


def test_blank_lines_never_dup(ray_session):
    out = _run(FIXTURE)
    assert out[7] == FIXTURE[7]
    assert out[5] == ""


def test_all_boilerplate_doc_survives_empty(ray_session):
    docs = {1: "x\ny", 2: "x\ny", 3: "x"}
    out = _run(docs)
    assert out == {1: "", 2: "", 3: ""}
    assert set(out) == {1, 2, 3}


def test_identity_when_no_dups(ray_session):
    docs = {i: f"line a{i}\nline b{i}" for i in range(10)}
    assert _run(docs) == docs


def test_catalog_entry_matches_duckdb_oracle(ray_session):
    import duckdb

    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = (
        entrymod.queries()["line_dedup"](sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = (
        con.execute(entrymod.oracle_sql()["line_dedup"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() == want["doc_id"].to_numpy()).all()
    assert (got["text"].to_numpy() == want["text"].to_numpy()).all()
