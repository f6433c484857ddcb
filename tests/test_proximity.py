"""proximity_spans: minimal-window correctness vs a brute-force pair
scan, adjacency-trick validity on randomized position streams, top-k
cut + rank determinism, and absence semantics (single-term docs)."""

import random

import numpy as np
import pyarrow as pa
import ray.data

from search_engine_core_ray.stages.textstats import proximity_spans

TOK_RE_VOCAB = ["dup", "vector", "xx", "yy", "zz", "filler"]


def _ds(rows, parts=2):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    ).repartition(parts)


def _brute_min_span(text, t1, t2):
    toks = [t for t in __import__("re").findall(r"[a-z0-9]{2,}", text.lower())]
    pa_ = [i for i, t in enumerate(toks) if t == t1]
    pb_ = [i for i, t in enumerate(toks) if t == t2]
    if not pa_ or not pb_:
        return None
    return min(abs(a - b) + 1 for a in pa_ for b in pb_)


def test_hand_cases(ray_session):
    rows = [
        (1, "dup vector"),                      # adjacent -> 2
        (2, "dup xx yy vector"),                # gap 3 -> 4
        (3, "vector zz dup zz zz vector dup"),  # adjacent at the end -> 2
        (4, "dup only here"),                   # one term -> absent
        (5, "vector vector vector"),            # other term only -> absent
        (6, ""),                                # empty -> absent
    ]
    out = proximity_spans(_ds(rows), [("q", "dup", "vector")], k=10).to_pandas()
    got = dict(zip(out["doc_id"], out["span"]))
    assert got == {1: 2, 2: 4, 3: 2}
    # rank order: span asc, doc_id asc
    ranked = out.sort_values("rnk")[["doc_id", "span"]].values.tolist()
    assert ranked == [[1, 2], [3, 2], [2, 4]]


def test_randomized_vs_brute_force(ray_session):
    rng = random.Random(7)
    rows = []
    for i in range(60):
        n = rng.randint(0, 30)
        rows.append((i, " ".join(rng.choice(TOK_RE_VOCAB) for _ in range(n))))
    out = proximity_spans(
        _ds(rows, parts=4), [("q", "dup", "vector")], k=10_000
    ).to_pandas()
    got = dict(zip(out["doc_id"], out["span"]))
    want = {}
    for i, text in rows:
        s = _brute_min_span(text, "dup", "vector")
        if s is not None:
            want[i] = s
    assert got == want


def test_topk_cut_and_multiple_queries(ray_session):
    # spans 2..21 by construction: doc i has i filler tokens between
    rows = [
        (i, "dup " + " ".join(["filler"] * i) + " vector") for i in range(20)
    ]
    rows += [(100 + i, "xx yy") for i in range(5)]
    out = proximity_spans(
        _ds(rows, parts=3),
        [("a", "dup", "vector"), ("b", "xx", "yy")],
        k=5,
    ).to_pandas()
    a = out[out["query"] == "a"].sort_values("rnk")
    assert a["doc_id"].tolist() == [0, 1, 2, 3, 4]
    assert a["span"].tolist() == [2, 3, 4, 5, 6]
    assert a["rnk"].tolist() == [1, 2, 3, 4, 5]
    b = out[out["query"] == "b"].sort_values("rnk")
    assert b["doc_id"].tolist() == [100, 101, 102, 103, 104]  # tie -> doc_id
    assert set(b["span"]) == {2}
