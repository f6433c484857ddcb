"""Postings explode: docs -> (term, doc_id, tf_title, tf_content, tf_desc).

The per-field term definition is the reference tokenizer
(scoring_utils::extractTerms, src/scoring/SearchScorer.cpp:692-712):
maximal ASCII-alnum runs, lowercased, length >= 2. Per-field term
frequencies mirror calculateTermFrequencies (:714-723); the per-doc term
UNION over title/content/description is what document frequency counts
(updateCorpusStatistics, :225-255) — equal to the number of postings
rows per term, since a row exists iff any field tf > 0.

Vectorized with polars (Rust regex + explode + group_by) — no Python
loop over rows or tokens. A batch of B docs becomes one long token
frame, grouped to (doc, term, field) counts, pivoted to one row per
(doc, term).
"""

from __future__ import annotations

import pyarrow as pa
import polars as pl

TOKEN_RE = r"[A-Za-z0-9]{2,}"

_FIELDS = ("title", "content", "description")


def _field_tf(
    doc_ids: pl.Series,
    texts: pl.Series,
    out_name: str,
    analyzer="default",
    langs: pl.Series | None = None,
) -> pl.DataFrame:
    from ..functions.analyzers import polars_term_expr_dispatch

    cols = {"doc_id": doc_ids, "s": texts}
    if langs is not None:
        cols["lang"] = langs
    df = pl.DataFrame(cols)
    exploded = (
        df.with_columns(
            pl.col("s").fill_null("").str.extract_all(TOKEN_RE).alias("tok")
        )
        .drop("s")
        .explode("tok")
        .drop_nulls("tok")
    )
    lang_expr = pl.col("lang") if langs is not None else pl.lit(None, pl.String)
    return (
        exploded.with_columns(
            polars_term_expr_dispatch(
                pl.col("tok").str.to_lowercase(), analyzer, lang_expr
            ).alias("term")
        )
        .group_by(["doc_id", "term"])
        .agg(pl.len().cast(pl.Int32).alias(out_name))
    )


def explode_postings(batch: pa.Table, analyzer="default") -> pa.Table:
    """map_batches kernel: docs batch -> postings rows.

    Input columns: doc_id, title, text (content), meta_description —
    plus ``lang`` when ``analyzer`` is a per-language mapping (each
    document's language picks its analyzer; functions/analyzers.py).
    Output: term, doc_id, tf_title:int32, tf_content:int32, tf_desc:int32.
    """
    cols = ["doc_id", "title", "text", "meta_description"]
    langs = None
    if not isinstance(analyzer, str):
        cols.append("lang")
    df = pl.from_arrow(batch.select(cols))
    if not isinstance(analyzer, str):
        langs = df["lang"]
    t = _field_tf(df["doc_id"], df["title"], "tf_title", analyzer, langs)
    c = _field_tf(df["doc_id"], df["text"], "tf_content", analyzer, langs)
    d = _field_tf(df["doc_id"], df["meta_description"], "tf_desc", analyzer, langs)
    merged = (
        t.join(c, on=["doc_id", "term"], how="full", coalesce=True)
        .join(d, on=["doc_id", "term"], how="full", coalesce=True)
        .with_columns(
            pl.col("tf_title").fill_null(0),
            pl.col("tf_content").fill_null(0),
            pl.col("tf_desc").fill_null(0),
        )
        .select(["term", "doc_id", "tf_title", "tf_content", "tf_desc"])
    )
    return merged.to_arrow().cast(
        pa.schema(
            [
                ("term", pa.string()),
                ("doc_id", pa.int64()),
                ("tf_title", pa.int32()),
                ("tf_content", pa.int32()),
                ("tf_desc", pa.int32()),
            ]
        )
    )
