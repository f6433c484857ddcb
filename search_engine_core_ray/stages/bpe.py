"""Distributed BPE tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
learned-subword tokenizer an LLM training-data pipeline runs before
token counting / sequence packing.

Algorithm: tokenize the corpus to a WORD-FREQUENCY table (the only
corpus-proportional pass), explode each word type into a character
sequence plus an end-of-word marker, then for ``n_merges`` rounds pick
the adjacent symbol pair with the highest corpus count (ties: smallest
pair lexicographically) and fuse every non-overlapping left-to-right
occurrence of it.

Cross-engine representation: a word rides as a delimiter-encoded
string ``||c||a||t||_||`` (``||`` between symbols, ``||`` at both
ends). Merging pair (x, y) is then the LITERAL string replacement
``|x||y| -> |xy|`` — both Python ``str.replace`` and DuckDB
``replace`` scan left-to-right non-overlapping, the doubled delimiter
keeps consecutive occurrences independent, and the single-bar-wrapped
pattern cannot match inside a multi-char symbol. Each replacement
removes exactly two characters, so the per-word occurrence count is
``(len(before) - len(after)) / 2`` — the same formula the SQL oracle
uses, making the whole training replayable as k unrolled MATERIALIZED
CTEs.

Pair-count semantics: non-overlapping left-to-right (= what the
replacement actually fuses), NOT the overlapping zip count — the two
differ only for same-symbol runs (``aaa`` has one fusable ``aa``).

Scale shape (100 TB): the corpus is touched ONCE (tokenize -> partial
counts -> sorted_agg keyed by word). Every merge round runs over the
word-TYPE table, which is vocabulary-bounded, not corpus-bounded; at
or below ``collect_threshold`` types the rounds run driver-side on the
collected table (the classic in-memory BPE trainer, exact), above it
each round is a map_batches pair-count partial + a small groupby whose
result — bounded by the active-symbol adjacency, a few thousand rows —
is the only thing the driver sees. Both tiers produce identical merge
tables (conformance-tested with a forced threshold of 0).
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

TOKEN_RE = r"[A-Za-z0-9]{2,}"  # same word rule as the postings entries
EOW = "_"
COLLECT_THRESHOLD = 100_000  # word types; mirrors shuffle.AUTO_THRESHOLD

MERGE_SCHEMA = pa.schema(
    [("round", pa.int64()), ("x", pa.string()), ("y", pa.string()),
     ("merged", pa.string()), ("cnt", pa.int64())]
)
WORD_SCHEMA = pa.schema(
    [("term", pa.string()), ("repr", pa.string()), ("cnt", pa.int64())]
)


def word_repr(word: str) -> str:
    return "||" + "||".join(list(word) + [EOW]) + "||"


def split_symbols(r: str) -> list[str]:
    return r.strip("|").split("||")


def _pair_pat(x: str, y: str) -> tuple[str, str]:
    return f"|{x}||{y}|", f"|{x}{y}|"


def _word_pair_counts(syms: list[str]) -> Counter:
    """Non-overlapping left-to-right pair counts for ONE word — for
    x != y this equals the zip count; for same-symbol runs it is the
    fusable count (floor of run/2 per run), matching replace()."""
    out: Counter = Counter()
    n = len(syms)
    for x, y in set(zip(syms, syms[1:])):
        c = 0
        i = 0
        while i < n - 1:
            if syms[i] == x and syms[i + 1] == y:
                c += 1
                i += 2
            else:
                i += 1
        out[(x, y)] = c
    return out


def _best_pair(totals: dict) -> tuple | None:
    """argmax by count, ties -> lexicographically smallest (x, y)."""
    if not totals:
        return None
    return min(totals.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))


def _word_freq(docs_ds, text_col: str):
    """(term, cnt) word-frequency Dataset — the one corpus pass."""
    import polars as pl

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    def partial(b: pa.Table) -> pa.Table:
        from .textstats import term_count_frame

        out = term_count_frame(
            pl.from_arrow(b), text_col=text_col, token_re=TOKEN_RE
        )
        return out.to_arrow().cast(
            pa.schema([("term", pa.string()), ("cnt", pa.int64())])
        )

    narrowed = docs_ds.map_batches(
        lambda b: b.select([text_col]), batch_format="pyarrow"
    )
    return sorted_agg(
        narrowed.map_batches(partial, batch_format="pyarrow"),
        "term",
        {"cnt": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    )


def _batch_pair_partials(b: pa.Table) -> pa.Table:
    totals: Counter = Counter()
    reprs = b.column("repr").to_pylist()
    cnts = b.column("cnt").to_pylist()
    for r, c in zip(reprs, cnts):
        for p, k in _word_pair_counts(split_symbols(r)).items():
            totals[p] += k * c
    xs, ys, cs = [], [], []
    for (x, y), c in totals.items():
        xs.append(x)
        ys.append(y)
        cs.append(c)
    return pa.table(
        {"x": pa.array(xs, pa.string()), "y": pa.array(ys, pa.string()),
         "cnt": pa.array(cs, pa.int64())}
    )


def bpe_encode(docs_ds, merges: pa.Table, *, text_col: str = "text",
               prefix_k: int = 24):
    """Apply a trained merge table to every document — the ENCODER half
    of the tokenizer (``learn_bpe`` is the trainer).

    BPE encoding is exactly "apply each merge rule globally in rank
    order", so the encoder needs only the ``n_merges``-row merge table
    (always broadcast-safe — real vocabularies are tens of thousands of
    rules, bytes per rule), NOT the word-type table: each doc's token
    stream is delimiter-encoded in-row (word reprs joined by a space,
    which no ``|x||y|`` pattern can cross because symbols are [a-z0-9_]
    only), then the k literal replaces run as vectorized polars passes.
    Map-only, zero exchange at any corpus size.

    Returns (doc_id, n_sym, bpe_prefix): the encoded-symbol count and
    the first ``prefix_k`` symbols space-joined. Docs with no tokens
    are dropped (nothing to encode).
    """
    import polars as pl

    pats = [
        _pair_pat(x, y)
        for x, y in zip(merges.column("x").to_pylist(),
                        merges.column("y").to_pylist())
    ]
    out_schema = pa.schema(
        [("doc_id", pa.int64()), ("n_sym", pa.int64()),
         ("bpe_prefix", pa.string())]
    )

    def kern(b: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(b.select(["doc_id", text_col]))
            .with_columns(
                pl.col(text_col).fill_null("")
                .str.extract_all(TOKEN_RE).alias("tok")
            )
            .filter(pl.col("tok").list.len() > 0)
            .select(["doc_id", "tok"])
            .explode("tok")
            .with_columns(
                # '||c||a||t||_||' — one replace pass builds the repr
                r="||"
                + pl.col("tok").str.to_lowercase()
                     .str.replace_all("(.)", "${1}||")
                + EOW + "||"
            )
            .group_by("doc_id", maintain_order=True)
            .agg(r=pl.col("r").str.join(" "))
        )
        col = pl.col("r")
        for pat, rep in pats:
            col = col.str.replace_all(pat, rep, literal=True)
        df = df.with_columns(
            syms=col.str.replace_all("|| ||", "||", literal=True)
            .str.strip_chars("|")
            .str.split("||")
        )
        return df.select(
            pl.col("doc_id"),
            pl.col("syms").list.len().cast(pl.Int64).alias("n_sym"),
            pl.col("syms").list.head(prefix_k).list.join(" ")
            .alias("bpe_prefix"),
        ).to_arrow().cast(out_schema)

    return docs_ds.map_batches(kern, batch_format="pyarrow")


def learn_bpe(
    docs_ds,
    n_merges: int = 10,
    *,
    text_col: str = "text",
    collect_threshold: int = COLLECT_THRESHOLD,
) -> tuple[pa.Table, pa.Table]:
    """Train ``n_merges`` BPE merges over ``docs_ds[text_col]``.

    Returns ``(merges, words)``: merges as a pa.Table with one row per
    round ``(round, x, y, merged, cnt)`` (may be shorter than n_merges
    if the vocabulary fuses completely), and the final word table as a
    DATASET ``(term, repr, cnt)`` with all merges applied — kept
    distributed because it is vocabulary-proportional.
    """
    import ray.data
    wf = _word_freq(docs_ds, text_col).materialize()
    n_types = wf.count()

    if n_types <= collect_threshold:
        # driver tier: the classic in-memory trainer over word TYPES
        # (vocabulary-bounded — NOT a corpus-proportional collect)
        rows = wf.take_all()
        terms = [r["term"] for r in rows]
        cnts = [int(r["cnt"]) for r in rows]
        reprs = [word_repr(t) for t in terms]
        merges = []
        for rnd in range(1, n_merges + 1):
            totals: Counter = Counter()
            for r, c in zip(reprs, cnts):
                for p, k in _word_pair_counts(split_symbols(r)).items():
                    totals[p] += k * c
            best = _best_pair(totals)
            if best is None or best[1] <= 0:
                break
            (x, y), cnt = best
            merges.append((rnd, x, y, x + y, cnt))
            pat, rep = _pair_pat(x, y)
            reprs = [r.replace(pat, rep) for r in reprs]
        merge_tbl = pa.table(
            {
                "round": pa.array([m[0] for m in merges], pa.int64()),
                "x": pa.array([m[1] for m in merges], pa.string()),
                "y": pa.array([m[2] for m in merges], pa.string()),
                "merged": pa.array([m[3] for m in merges], pa.string()),
                "cnt": pa.array([m[4] for m in merges], pa.int64()),
            }
        )
        word_tbl = pa.table(
            {"term": pa.array(terms, pa.string()),
             "repr": pa.array(reprs, pa.string()),
             "cnt": pa.array(cnts, pa.int64())}
        )
        return merge_tbl, ray.data.from_arrow(word_tbl.cast(WORD_SCHEMA))

    # distributed tier: rounds over the word-type Dataset; the driver
    # sees only the aggregated pair table (active-symbol adjacency)
    from ray.data.aggregate import Sum

    ds = wf.map_batches(
        lambda b: b.append_column(
            "repr",
            pa.array([word_repr(t) for t in b.column("term").to_pylist()],
                     pa.string()),
        ),
        batch_format="pyarrow",
    ).materialize()
    merges = []
    for rnd in range(1, n_merges + 1):
        agg = (
            ds.map_batches(_batch_pair_partials, batch_format="pyarrow")
            .groupby(["x", "y"])
            .aggregate(Sum("cnt", alias_name="total"))
        )
        totals = {
            (r["x"], r["y"]): int(r["total"]) for r in agg.take_all()
        }
        best = _best_pair(totals)
        if best is None or best[1] <= 0:
            break
        (x, y), cnt = best
        merges.append((rnd, x, y, x + y, cnt))
        pat, rep = _pair_pat(x, y)

        def apply(b: pa.Table, _pat=pat, _rep=rep) -> pa.Table:
            import pyarrow.compute as pc

            return b.set_column(
                b.schema.get_field_index("repr"), "repr",
                pc.replace_substring(b.column("repr"), _pat, _rep),
            )

        ds = ds.map_batches(apply, batch_format="pyarrow").materialize()
    merge_tbl = pa.table(
        {
            "round": pa.array([m[0] for m in merges], pa.int64()),
            "x": pa.array([m[1] for m in merges], pa.string()),
            "y": pa.array([m[2] for m in merges], pa.string()),
            "merged": pa.array([m[3] for m in merges], pa.string()),
            "cnt": pa.array([m[4] for m in merges], pa.int64()),
        }
    )
    words_ds = ds.map_batches(
        lambda b: b.select(["term", "repr", "cnt"]), batch_format="pyarrow"
    )
    return merge_tbl, words_ds
