"""remove_dup_spans: owner-keeps rule, coverage-union masking,
cross-block behavior, and real removals on the synth corpus."""

import pyarrow as pa
import ray.data

from search_engine_core_ray.stages.dedup import remove_dup_spans


def _run(docs, n=3, n_blocks=3):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in docs], pa.int64()),
                "text": pa.array([t for _, t in docs], pa.string()),
            }
        )
    ).repartition(n_blocks)
    out = remove_dup_spans(ds, n=n).to_pandas()
    return {
        int(r.doc_id): (r.clean_text, int(r.removed_tokens))
        for r in out.itertuples()
    }


def test_owner_keeps_duplicate_span(ray_session):
    # the shared 3-gram "aa bb cc" is owned by doc 1 (min id): doc 1
    # keeps it, doc 2 loses exactly those 3 tokens
    docs = [
        (1, "aa bb cc xx yy"),
        (2, "pp qq aa bb cc"),
        (3, "zz ww vv uu tt"),
    ]
    got = _run(docs, n=3)
    assert got[1] == ("aa bb cc xx yy", 0)
    assert got[2] == ("pp qq", 3)
    assert got[3] == ("zz ww vv uu tt", 0)


def test_overlapping_windows_union_coverage(ray_session):
    # doc 20 shares TWO overlapping duplicated 3-grams with doc 10;
    # covered tokens are the UNION (4 tokens), not double-counted
    docs = [
        (10, "aa bb cc dd"),
        (20, "aa bb cc dd xx"),
    ]
    got = _run(docs, n=3)
    assert got[10] == ("aa bb cc dd", 0)
    assert got[20] == ("xx", 4)


def test_doc_fully_covered_and_tokenless(ray_session):
    docs = [
        (5, "mm nn oo"),
        (6, "mm nn oo"),   # fully duplicated -> emptied
        (7, "?!"),          # tokenless -> empty, nothing removed
    ]
    got = _run(docs, n=3)
    assert got[5] == ("mm nn oo", 0)
    assert got[6] == ("", 3)
    assert got[7] == ("", 0)


def test_corpus_has_real_removals(ray_session):
    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = remove_dup_spans(docs, n=8).to_pandas()
    assert len(out) == 500
    assert (out.removed_tokens > 0).sum() >= 10  # non-vacuous
    assert (out.removed_tokens == 0).sum() > 400  # and not degenerate


def test_no_duplicate_windows_is_a_noop(ray_session):
    """A corpus with ZERO cross-doc duplicated windows (e.g. after an
    upstream near-dup drop) must pass through — every dup-table block
    is then a schema-less empty, which crashed the wkey join before
    the short-circuit."""
    docs = [
        (1, "alpha beta gamma delta"),
        (2, "one two three four five"),
        (3, "red green blue cyan magenta"),
    ]
    out = _run(docs, n=3)
    assert out == {
        1: ("alpha beta gamma delta", 0),
        2: ("one two three four five", 0),
        3: ("red green blue cyan magenta", 0),
    }
