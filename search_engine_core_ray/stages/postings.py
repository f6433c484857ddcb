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


def _field_tf(doc_ids: pl.Series, texts: pl.Series, out_name: str) -> pl.DataFrame:
    df = pl.DataFrame({"doc_id": doc_ids, "s": texts})
    return (
        df.with_columns(
            pl.col("s").fill_null("").str.extract_all(TOKEN_RE).alias("tok")
        )
        .drop("s")
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
        .group_by(["doc_id", "term"])
        .agg(pl.len().cast(pl.Int32).alias(out_name))
    )


def explode_postings(batch: pa.Table) -> pa.Table:
    """map_batches kernel: docs batch -> postings rows.

    Input columns: doc_id, title, text (content), meta_description.
    Output: term, doc_id, tf_title:int32, tf_content:int32, tf_desc:int32.
    """
    df = pl.from_arrow(
        batch.select(["doc_id", "title", "text", "meta_description"])
    )
    t = _field_tf(df["doc_id"], df["title"], "tf_title")
    c = _field_tf(df["doc_id"], df["text"], "tf_content")
    d = _field_tf(df["doc_id"], df["meta_description"], "tf_desc")
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


class TokenizeFields:
    """Actor-pool stage: docs -> postings rows + (shard, salt) keys.

    The class form holds per-actor state (shard lookup cache; the hook
    point for future language-aware analyzers keyed off ``lang`` —
    SURVEY.md §7.3 step 2; the reference has a single analyzer).

    - ``shard`` = crc32(term) % num_shards — the partition key of the
      final inverted index.
    - ``salt``  = doc_id % salt_mod — term-skew handling: a Zipf-head
      term's postings are spread over salt_mod sub-groups so no single
      shuffle group exceeds df/salt_mod rows; the segment merge folds
      the sorted runs back together (north_rule: "salted groupby plus
      secondary merge").
    """

    def __init__(self, num_shards: int = 32, salt_mod: int = 4):
        self.num_shards = num_shards
        self.salt_mod = salt_mod
        self._shard_cache: dict[str, int] = {}

    def _shards_for(self, terms: list[str]) -> list[int]:
        from ..index.segments import shard_of_term

        cache = self._shard_cache
        out = []
        for t in terms:
            s = cache.get(t)
            if s is None:
                s = shard_of_term(t, self.num_shards)
                cache[t] = s
            out.append(s)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        out = explode_postings(batch)
        # shard per unique term (vocab-sized work, not postings-sized)
        enc = pc.dictionary_encode(out.column("term").combine_chunks())
        vocab = enc.dictionary.to_pylist()
        shard_by_code = pa.array(self._shards_for(vocab), pa.int32())
        shards = shard_by_code.take(enc.indices)
        salt = pc.cast(
            pc.subtract(
                out.column("doc_id"),
                pc.multiply(
                    pc.divide(out.column("doc_id"), self.salt_mod),
                    self.salt_mod,
                ),
            ),
            pa.int32(),
        )
        return out.append_column("shard", shards).append_column("salt", salt)
