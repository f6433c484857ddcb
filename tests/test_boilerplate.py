"""Domain-conditional boilerplate removal (Onion/CleanEval per-site
rule): semantics pinned against a scalar Python oracle on chrome-heavy
fixtures — threshold boundary (exactly half), cross-domain isolation
(the same line below threshold elsewhere survives there), order
preservation, fully-boilerplate docs, and the randomized agreement
sweep."""

import random

import pyarrow as pa
import ray.data

from search_engine_core_ray.stages.dedup import boilerplate_strip


def _oracle(docs, num=1, den=2):
    """docs: {doc_id: (domain, text)} -> {doc_id: stripped_text}."""
    from collections import defaultdict

    dom_docs = defaultdict(set)
    owners = defaultdict(set)
    for d, (dom, t) in docs.items():
        dom_docs[dom].add(d)
        for line in t.split("\n"):
            k = line.strip(" \t\r")
            if k:
                owners[(dom, k)].add(d)
    bp = {
        (dom, k)
        for (dom, k), v in owners.items()
        if len(v) * den >= num * len(dom_docs[dom])
    }
    return {
        d: "\n".join(
            l
            for l in t.split("\n")
            if not (l.strip(" \t\r") and (dom, l.strip(" \t\r")) in bp)
        )
        for d, (dom, t) in docs.items()
    }


def _run(docs, num=1, den=2):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "domain": pa.array([v[0] for v in docs.values()], pa.string()),
            "text": pa.array([v[1] for v in docs.values()], pa.string()),
        }
    )
    out = boilerplate_strip(
        ray.data.from_arrow(tbl).repartition(3),
        domain_col="domain",
        num_frac=num,
        den_frac=den,
    ).take_all()
    return {r["doc_id"]: r["text"] for r in out}


def test_threshold_boundary_and_isolation(ray_session):
    docs = {
        # domain a: 4 docs; "footer" in 2/4 (exactly half -> stripped),
        # "rare" in 1/4 (-> kept)
        1: ("a", "footer\nbody one\nrare"),
        2: ("a", "footer\nbody two"),
        3: ("a", "body three"),
        4: ("a", "body four"),
        # domain b: 3 docs; the SAME "footer" line in 1/3 (< half) ->
        # kept there: the rule is per-domain, not global
        5: ("b", "footer\nother body"),
        6: ("b", "more body"),
        7: ("b", "yet more"),
    }
    got = _run(docs)
    want = _oracle(docs)
    assert got == want
    assert got[1] == "body one\nrare"
    assert got[5] == "footer\nother body"


def test_fully_boilerplate_doc_survives_empty(ray_session):
    docs = {
        1: ("a", "nav"),
        2: ("a", "nav"),
        3: ("a", "nav\ncontent"),
    }
    got = _run(docs)
    assert got == {1: "", 2: "", 3: "content"}


def test_no_boilerplate_identity(ray_session):
    docs = {i: ("a", f"unique line {i}") for i in range(6)}
    assert _run(docs) == {i: f"unique line {i}" for i in range(6)}


def test_randomized_vs_oracle(ray_session):
    rng = random.Random(3)
    lines = [f"l{j}" for j in range(12)]
    docs = {}
    for i in range(40):
        dom = rng.choice(["a", "b", "c"])
        n = rng.randint(0, 6)
        docs[i] = (dom, "\n".join(rng.choice(lines) for _ in range(n)))
    for num, den in [(1, 2), (1, 4), (3, 4)]:
        assert _run(docs, num, den) == _oracle(docs, num, den), (num, den)
