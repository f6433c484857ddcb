"""Text-analysis batch kernels for the training-data pipeline operators:
content-only postings, word counts, quality scoring, language ID,
document fingerprinting. All vectorized (polars / pyarrow.compute); no
Python loop over rows in any hot path.

Each kernel is a deterministic function of the input so the DuckDB
oracle in pipelines/catalog.py can recompute it in SQL; where doubles
are produced they come from a single division of exactly-reconstructed
integers (bit-identical across engines) or are rounded with
``round_half_away`` (matching DuckDB ROUND).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import polars as pl

TOKEN_RE = r"[A-Za-z0-9]{2,}"
# RE2's exact \S class ([^\t\n\f\r ]): the DuckDB oracles tokenize with
# RE2 '\S+' (ASCII-only \s), while polars' Rust regex makes \S+
# Unicode-aware (U+00A0/U+2009 count as whitespace) — pinning the
# kernel to the explicit class keeps kernel and oracle identical on
# ANY corpus, not just ASCII synth text.
WS_TOKEN_RE = r"[^ \t\n\r\f]+"
WS_CHAR_RE = r"[ \t\n\r\f]"  # RE2's exact \s class

# \b(the|and|of|is|in|to|a)\b on lowercased text — the language-ID /
# quality stopword probe (shared with the SQL oracle).
STOP_PROBE_RE = r"\b(the|and|of|is|in|to|a)\b"


def round_half_away(x: np.ndarray, digits: int) -> np.ndarray:
    """Round half away from zero — DuckDB/C++ ROUND semantics (numpy's
    np.round is banker's rounding and would disagree at .5 boundaries)."""
    m = 10.0**digits
    return np.sign(x) * np.floor(np.abs(x) * m + 0.5) / m


def term_count_frame(
    t: "pl.DataFrame",
    text_col: str = "text",
    filter_terms: list[str] | None = None,
    token_re: str | None = None,
) -> "pl.DataFrame":
    """The ONE tokenize->explode->lowercase->count block (term, cnt)
    every corpus-wide term statistic shares (sketches, probe counts,
    heavy hitters) — change the token-stream definition here, nowhere
    else, or the Ray and SQL sides of multiple entries drift apart."""
    out = (
        t.with_columns(
            pl.col(text_col).fill_null("")
            .str.extract_all(token_re or TOKEN_RE).alias("tok")
        )
        .select("tok")
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
    )
    if filter_terms is not None:
        out = out.filter(pl.col("term").is_in(filter_terms))
    return out.group_by("term").agg(pl.len().cast(pl.Int64).alias("cnt"))


def content_postings(batch: pa.Table) -> pa.Table:
    """documents(doc_id, text) -> (term, doc_id, tf) content-only postings."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    out = (
        df.with_columns(pl.col("text").fill_null("").str.extract_all(TOKEN_RE).alias("tok"))
        .drop("text")
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
        .group_by(["term", "doc_id"])
        .agg(pl.len().cast(pl.Int64).alias("tf"))
        .select(["term", "doc_id", "tf"])
    )
    return out.to_arrow().cast(
        pa.schema([("term", pa.string()), ("doc_id", pa.int64()), ("tf", pa.int64())])
    )


def partial_term_df(batch: pa.Table) -> pa.Table:
    """Per-batch partial document frequencies (combiner before the tiny
    groupby(term).sum shuffle — the pre-aggregation idiom)."""
    p = content_postings(batch)
    df = (
        pl.from_arrow(p)
        .group_by("term")
        .agg(pl.len().cast(pl.Int64).alias("pdf"))
    )
    return df.to_arrow().cast(pa.schema([("term", pa.string()), ("pdf", pa.int64())]))


def word_counts(batch: pa.Table) -> pa.Table:
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    out = df.with_columns(
        pl.col("text").fill_null("").str.count_matches(WS_TOKEN_RE).cast(pl.Int64).alias("n_words")
    ).drop("text")
    return out.to_arrow()


def content_quality_col(batch: pa.Table) -> pa.Table:
    """quality = min(1.0, utf8_bytes(text)/10000) as LEAST(bytes,10000)/10000.0
    — exact integer reconstruction, bit-identical to the SQL oracle."""
    nbytes = pc.binary_length(pc.fill_null(batch.column("text"), "")).to_numpy()
    q = np.minimum(nbytes, 10000).astype(np.float64) / 10000.0
    return pa.table(
        {"doc_id": batch.column("doc_id"), "quality": pa.array(q, pa.float64())}
    )


def language_id(batch: pa.Table) -> pa.Table:
    """Heuristic language ID: 'nonascii' when < 70% of bytes are ASCII,
    else 'en' when the English stop-probe hits, else 'und'. Deterministic
    and SQL-expressible — the operator shape matters (per-batch vectorized
    classification), not linguistic accuracy."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        pl.col("text").fill_null("")
    )
    out = df.with_columns(
        ascii_bytes=pl.col("text").str.replace_all(r"[^\x00-\x7F]", "").alias("a")
        .str.len_bytes().cast(pl.Int64),
        total_bytes=pl.col("text").str.len_bytes().cast(pl.Int64),
        the_hits=pl.col("text").str.to_lowercase().str.count_matches(r"\bthe\b").cast(pl.Int64),
    ).with_columns(
        lang_pred=pl.when(pl.col("total_bytes") == 0)
        .then(pl.lit("und"))
        .when(pl.col("ascii_bytes") * 10 < pl.col("total_bytes") * 7)
        .then(pl.lit("nonascii"))
        .when(pl.col("the_hits") > 0)
        .then(pl.lit("en"))
        .otherwise(pl.lit("und"))
    ).select(["doc_id", "lang_pred"])
    return out.to_arrow()


def quality_metrics(batch: pa.Table) -> pa.Table:
    """Composite text-quality metrics per doc:
    n_words, n_chars (unicode), stop_hits, mean_word_len, score.
    mean_word_len = nonspace_chars/n_words; score = min(1, n_words/100)
    * stop share complement — all doubles from exact integer division.
    """
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        pl.col("text").fill_null("")
    )
    out = df.with_columns(
        n_words=pl.col("text").str.count_matches(WS_TOKEN_RE).cast(pl.Int64),
        n_chars=pl.col("text").str.len_chars().cast(pl.Int64),
        nonspace=pl.col("text").str.replace_all(WS_CHAR_RE, "").str.len_chars().cast(pl.Int64),
        stop_hits=pl.col("text").str.to_lowercase().str.count_matches(STOP_PROBE_RE).cast(pl.Int64),
    ).drop("text")
    t = out.to_arrow()
    n_words = t.column("n_words").to_numpy().astype(np.float64)
    nonspace = t.column("nonspace").to_numpy().astype(np.float64)
    stop = t.column("stop_hits").to_numpy().astype(np.float64)
    safe = np.maximum(n_words, 1.0)
    mean_word_len = nonspace / safe
    stop_ratio = stop / safe
    score = np.minimum(n_words, 100.0) / 100.0 * (1.0 - stop_ratio)
    return pa.table(
        {
            "doc_id": t.column("doc_id"),
            "n_words": t.column("n_words"),
            "n_chars": t.column("n_chars"),
            "stop_hits": t.column("stop_hits"),
            "mean_word_len": pa.array(mean_word_len, pa.float64()),
            "stop_ratio": pa.array(stop_ratio, pa.float64()),
            "score": pa.array(score, pa.float64()),
        }
    )


# GPT-2-style pretokenizer shape WITHOUT lookaheads, so Python re,
# polars (rust regex) and DuckDB (RE2) agree token-for-token:
# contractions, letter runs, digit runs, punctuation runs — each with
# an optional leading space. Counts approximate BPE token budgets.
# \s spelled as RE2's exact ASCII class so the polars (Unicode-regex)
# kernel and the RE2 oracle agree on non-ASCII whitespace too.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^ \t\n\r\fA-Za-z0-9]+"


def token_counts(batch: pa.Table) -> pa.Table:
    """Per-doc token budgets: whitespace tokens and BPE-ish tokens
    (vectorized regex counts — the training-data cost estimator)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        pl.col("text").fill_null("")
    )
    out = df.with_columns(
        ws_tokens=pl.col("text").str.count_matches(WS_TOKEN_RE).cast(pl.Int64),
        bpe_tokens=pl.col("text").str.count_matches(BPE_RE).cast(pl.Int64),
    ).drop("text")
    return out.to_arrow()


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def _tok_h32(t: str) -> int:
    """32-bit token hash: first 4 md5 bytes big-endian — chosen over
    crc32 because BOTH engines can compute it (DuckDB:
    ('0x' || substr(md5(t), 1, 8))::HUGEINT), making the fingerprint
    SQL-checkable end to end."""
    import hashlib

    return int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big")


def doc_fingerprint(batch: pa.Table) -> pa.Table:
    """Order-sensitive rolling polynomial hash over the token stream:
    fp = sum(base^i * h32(tok_i)) mod 2^61-1 with h32 = md5-prefix-32.
    Python-int modular arithmetic (products exceed 64 bits); token
    extraction stays vectorized; the per-token hash loop is the
    operator's cost (swap in a vectorized hash at scale if SQL
    comparability is not needed). The DuckDB oracle reproduces the
    exact rolling recurrence with a recursive CTE (catalog entry
    doc_fingerprint)."""
    df = pl.from_arrow(batch.select(["doc_id", "text"]))
    toks = (
        df.with_columns(
            pl.col("text").fill_null("").str.to_lowercase().str.extract_all(TOKEN_RE).alias("tok")
        )
        .drop("text")
    )
    fps = []
    for doc_toks in toks["tok"].to_list():
        acc = 0
        power = 1
        for t in doc_toks or ():
            acc = (acc + power * _tok_h32(t)) % _FP_MOD
            power = (power * _FP_BASE) % _FP_MOD
        fps.append(acc)
    return pa.table(
        {"doc_id": df["doc_id"].to_arrow(), "fp": pa.array(fps, pa.int64())}
    )


# Gopher-style document quality gate thresholds (Rae et al. 2021 §A1.1)
GATE_MIN_WORDS = 30
GATE_MWL_RANGE = (3.0, 5.0)
GATE_MIN_STOP_HITS = 1


def gopher_gate(batch: pa.Table) -> pa.Table:
    """Filter a (doc_id, text, ...) batch to rows passing the Gopher
    quality gate — the ONE definition shared by the standalone
    quality_filter entry and the composed prepare_training_data
    flagship (and their SQL oracles)."""
    m = quality_metrics(batch)
    n_words = m.column("n_words").to_numpy()
    mwl = m.column("mean_word_len").to_numpy()
    stop = m.column("stop_hits").to_numpy()
    keep = (
        (n_words >= GATE_MIN_WORDS)
        & (mwl >= GATE_MWL_RANGE[0])
        & (mwl <= GATE_MWL_RANGE[1])
        & (stop >= GATE_MIN_STOP_HITS)
    )
    return batch.filter(pa.array(keep))


# ----------------------------------------------------------------------
# corpus char-trigram LM familiarity (CCNet-style LM quality filtering,
# integer-exact so the two-pass pipeline is SQL-checkable end to end)
# ----------------------------------------------------------------------

_TRI_SEP = 0x200000  # above any Unicode codepoint (max 0x10FFFF)


def _tri_windows(texts: list, doc_idx_base: int = 0):
    """All character-trigram keys of a batch of texts, vectorized:
    codepoint arrays joined with a sentinel, one stride-window pass,
    sentinel windows masked out.  Returns (keys int64, doc_index int64)
    — key = a<<42 | b<<21 | c (codepoints < 2^21, sentinel excluded)."""
    bufs = []
    for t in texts:
        bufs.append(np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32))
        bufs.append(np.array([_TRI_SEP], dtype=np.uint32))
    cat = np.concatenate(bufs).astype(np.int64)
    if len(cat) < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    a, b, c = cat[:-2], cat[1:-1], cat[2:]
    ok = (a != _TRI_SEP) & (b != _TRI_SEP) & (c != _TRI_SEP)
    keys = (a << 42) | (b << 21) | c
    # window start position -> owning doc: doc i owns starts in
    # [off_i, off_i + max(len_i - 2, 0)) where off_i includes separators
    lens = np.array([len(t or "") for t in texts], dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
    doc_of = np.full(len(a), -1, dtype=np.int64)
    for i in range(len(texts)):  # per DOC (not per char); bounded by batch size
        n_win = max(int(lens[i]) - 2, 0)
        if n_win:
            doc_of[offs[i] : offs[i] + n_win] = doc_idx_base + i
    ok &= doc_of >= 0
    return keys[ok], doc_of[ok]


def trigram_partial_counts(batch: pa.Table) -> pa.Table:
    """Map-side combiner for the model pass: per-batch distinct trigram
    counts (tri int64 key, cnt) — only the combined partials shuffle."""
    keys, _ = _tri_windows(batch.column("text").to_pylist())
    tri, cnt = np.unique(keys, return_counts=True)
    return pa.table(
        {"tri": pa.array(tri, pa.int64()), "cnt": pa.array(cnt.astype(np.int64), pa.int64())}
    )


def make_score_familiarity(model_ref):
    """Scoring pass: per-doc trigram count and the summed corpus
    frequency of every trigram occurrence (the unigram-LM-over-
    trigrams 'familiarity' — rare-charset / garbled docs score low).
    A plain task closure over the ray.put model handle — per-task
    ray.get is a local object-store hit, so no actor pool needs to
    spin up for what is otherwise a stateless map."""

    def score_familiarity(batch: pa.Table) -> pa.Table:
        import ray

        keys, counts = ray.get(model_ref)
        texts = batch.column("text").to_pylist()
        wkeys, doc_of = _tri_windows(texts)
        n_docs = len(texts)
        n_tri = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
        if len(keys) == 0:
            # empty model (closure reused against a different corpus):
            # every trigram is unknown — counts[idx] below would raise
            fam = np.zeros(len(wkeys), dtype=np.int64)
        else:
            idx = np.searchsorted(keys, wkeys)
            # model is built on this corpus, so every trigram is present;
            # guard anyway (scoring a doc NOT in the model corpus)
            idx = np.clip(idx, 0, len(keys) - 1)
            hit = keys[idx] == wkeys
            fam = np.where(hit, counts[idx], 0).astype(np.int64)
        # int64 scatter-add (bincount's float64 weights would round
        # above 2^53; corpus-scale counts can reach that)
        fam_sum = np.zeros(n_docs, dtype=np.int64)
        np.add.at(fam_sum, doc_of, fam)
        denom = np.maximum(n_tri, 1)
        # single division of exactly-reconstructed integers: bit-identical
        # to the SQL oracle's CAST(fam_sum AS DOUBLE) / n_tri
        fam_avg = np.where(n_tri > 0, fam_sum / denom, 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_tri": pa.array(n_tri, pa.int64()),
                "fam_sum": pa.array(fam_sum, pa.int64()),
                "fam_avg": pa.array(fam_avg, pa.float64()),
            }
        )

    return score_familiarity


# trigram model rows the driver may collect and broadcast: ~32 MB of
# two int64 arrays.  The vocab saturates at charset^3 — a few hundred
# keys on the synth corpus, a few million on real web text — so the
# broadcast tier covers real corpora; the guard exists because
# "a few million" is an expectation, not a bound, on full-unicode web
# text, and an unguarded take_all of an unbounded key set is a driver
# OOM at 100 TB.
VOCAB_BROADCAST_LIMIT = 2_000_000


def doc_trigram_partial(batch: pa.Table) -> pa.Table:
    """Map-side combiner for the big-vocab scoring pass: per-(doc,
    trigram) counts (doc_id, tri, cnt) — vectorized, one np.unique
    over composite keys per batch."""
    ids = batch.column("doc_id").to_numpy().astype(np.int64)
    keys, doc_of = _tri_windows(batch.column("text").to_pylist())
    if len(keys) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "tri": pa.array([], pa.int64()),
             "cnt": pa.array([], pa.int64())}
        )
    df = (
        pl.DataFrame({"doc_id": ids[doc_of], "tri": keys})
        .group_by(["doc_id", "tri"])
        .agg(cnt=pl.len().cast(pl.Int64))
    )
    return df.to_arrow().cast(
        pa.schema([("doc_id", pa.int64()), ("tri", pa.int64()), ("cnt", pa.int64())])
    )


def lm_familiarity(
    docs_ds,
    vocab_broadcast_limit: int = VOCAB_BROADCAST_LIMIT,
    num_partitions: int = 8,
):
    """Two-pass corpus-LM quality score: (1) train — map-side combined
    trigram partials -> groupby(tri) model; (2) score.  Returns
    (doc_id, n_tri, fam_sum, fam_avg).

    Cardinality-gated: at or under ``vocab_broadcast_limit`` distinct
    trigrams the model is driver-collected once, broadcast via
    ``ray.put``, and scoring is a vectorized per-batch searchsorted
    lookup (zero exchanges).  Above the limit nothing
    vocabulary-proportional touches the driver: scoring becomes a
    distributed hash join of per-(doc, tri) partial counts against the
    model on ``tri``, re-aggregated per doc through ``sorted_agg``
    (doc count is corpus-proportional).  Both tiers are integer-exact
    and conformance-tested identical (tests/test_packing_semdedup_lm.py).
    """
    import ray
    import ray.data

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    model_ds = sorted_agg(
        docs_ds.map_batches(trigram_partial_counts, batch_format="pyarrow"),
        "tri",
        {"c": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    ).materialize()

    if model_ds.count() <= vocab_broadcast_limit:
        model_tbl = model_ds.take_all()
        tri = np.array([r["tri"] for r in model_tbl], dtype=np.int64)
        cnt = np.array([r["c"] for r in model_tbl], dtype=np.int64)
        order = np.argsort(tri)
        model_ref = ray.put((tri[order], cnt[order]))
        return docs_ds.map_batches(
            make_score_familiarity(model_ref), batch_format="pyarrow"
        )

    # big-vocab tier: (doc, tri, cnt) ⋈ model(tri, c) -> per-doc sums.
    # Every doc trigram is in the model (trained on the same corpus),
    # so the inner join loses nothing; zero-trigram docs re-enter via
    # a unioned (doc_id, 0, 0) row per doc.
    doc_tri = docs_ds.map_batches(doc_trigram_partial, batch_format="pyarrow")
    joined = doc_tri.join(
        model_ds, join_type="inner", num_partitions=num_partitions, on=("tri",)
    ).repartition(num_partitions)  # merge schema-less empty join blocks

    def contrib(b: pa.Table) -> pa.Table:
        n = b.column("cnt").to_numpy().astype(np.int64)
        c = b.column("c").to_numpy().astype(np.int64)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "cnt": b.column("cnt"),
                "fam": pa.array(n * c, pa.int64()),
            }
        )

    zeros = docs_ds.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "cnt": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
                "fam": pa.array(np.zeros(b.num_rows, np.int64), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    agg = sorted_agg(
        joined.map_batches(contrib, batch_format="pyarrow").union(zeros),
        "doc_id",
        {"n_tri": ("sum", "cnt"), "fam_sum": ("sum", "fam")},
        auto_threshold=AUTO_THRESHOLD,
    )

    def finish(b: pa.Table) -> pa.Table:
        n_tri = b.column("n_tri").to_numpy().astype(np.int64)
        fam_sum = b.column("fam_sum").to_numpy().astype(np.int64)
        fam_avg = np.where(n_tri > 0, fam_sum / np.maximum(n_tri, 1), 0.0)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "n_tri": b.column("n_tri"),
                "fam_sum": b.column("fam_sum"),
                "fam_avg": pa.array(fam_avg, pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def rep_signals(batch: pa.Table) -> pa.Table:
    """Within-document repetition signals (the Gopher §A1.1 repetition
    filter family, Rae et al. 2021 — public method): per doc,

      dup_line_frac  = (n_lines - n_distinct_lines) / n_lines over
                       non-empty space/tab-trimmed lines (boilerplate
                       and listicle spam repeat lines verbatim);
      top2gram_frac  = occurrences of the most frequent word 2-gram
                       / total 2-gram occurrences (keyword-stuffed and
                       template docs concentrate mass on one 2-gram).

    Map-only (no shuffle, no corpus state) and integer-exact: both
    fractions are single divisions of exact counts, so the operator is
    SQL-checkable value-identically."""
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        pl.col("text").fill_null("")
    )
    lines = (
        df.select("doc_id", ln=pl.col("text").str.split("\n"))
        .explode("ln")
        .with_columns(pl.col("ln").str.strip_chars(" \t"))
        .filter(pl.col("ln").is_not_null() & (pl.col("ln") != ""))
        .group_by("doc_id")
        .agg(
            n_lines=pl.len().cast(pl.Int64),
            n_distinct=pl.col("ln").n_unique().cast(pl.Int64),
        )
    )
    toks = (
        df.select(
            "doc_id",
            tk=pl.col("text").str.to_lowercase().str.extract_all("[a-z0-9]{2,}"),
        )
        .explode("tk")
        .filter(pl.col("tk").is_not_null())
    )
    grams = (
        toks.with_columns(
            g=pl.concat_str(
                [pl.col("tk"), pl.col("tk").shift(-1).over("doc_id")],
                separator=" ",
            )
        )
        .filter(pl.col("g").is_not_null())
        .group_by("doc_id", "g")
        .agg(c=pl.len().cast(pl.Int64))
        .group_by("doc_id")
        .agg(
            n_2grams=pl.col("c").sum().cast(pl.Int64),
            top_2gram_cnt=pl.col("c").max().cast(pl.Int64),
        )
    )
    out = (
        df.select("doc_id")
        .join(lines, on="doc_id", how="left")
        .join(grams, on="doc_id", how="left")
        .with_columns(
            pl.col("n_lines", "n_distinct", "n_2grams", "top_2gram_cnt").fill_null(0)
        )
        .with_columns(
            dup_line_frac=pl.when(pl.col("n_lines") > 0)
            .then(
                (pl.col("n_lines") - pl.col("n_distinct")).cast(pl.Float64)
                / pl.col("n_lines")
            )
            .otherwise(0.0),
            top2gram_frac=pl.when(pl.col("n_2grams") > 0)
            .then(pl.col("top_2gram_cnt").cast(pl.Float64) / pl.col("n_2grams"))
            .otherwise(0.0),
        )
        .select(
            "doc_id", "n_lines", "dup_line_frac", "n_2grams",
            "top_2gram_cnt", "top2gram_frac",
        )
    )
    return out.to_arrow().cast(
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_lines", pa.int64()),
                ("dup_line_frac", pa.float64()),
                ("n_2grams", pa.int64()),
                ("top_2gram_cnt", pa.int64()),
                ("top2gram_frac", pa.float64()),
            ]
        )
    )


def familiarity_buckets(docs_ds, n_buckets: int = 3):
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020
    §4.3, public method): rank every doc by corpus-LM familiarity
    (``lm_familiarity``'s fam_avg, the in-domain analog of CCNet's
    target-LM perplexity), most-familiar first (fam_avg DESC, doc_id
    tiebreak), and NTILE the ranking into ``n_buckets`` equal-count
    groups — bucket 1 = "head" (cleanest), last = "tail".  Returns
    (doc_id, fam_avg, bucket, label).

    Distribution (100-TB note): only the NARROW (doc_id, fam_avg)
    table — 16 B/row — rides the rank exchange.  Exact global ranks
    come from the same two-pass distributed prefix scan sequence
    packing uses: sort + materialize pins rank-disjoint sorted blocks,
    ONE row per block reaches the driver (block first-key + count),
    the exclusive block-prefix broadcasts back via ``ray.put``, and a
    second whole-block map adds the within-block arange — no
    corpus-proportional driver collect anywhere.  fam_avg is a single
    division of exact int64s, so the ordering (and therefore the
    NTILE) is bit-identical to the SQL oracle's.
    """
    import ray

    fam = lm_familiarity(docs_ds)
    narrow = fam.map_batches(
        lambda b: b.select(["doc_id", "fam_avg"]), batch_format="pyarrow"
    )
    srt = narrow.sort(["fam_avg", "doc_id"], descending=[True, False]).materialize()

    def block_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"first_fam": pa.array([], pa.float64()),
                 "first_doc": pa.array([], pa.int64()),
                 "cnt": pa.array([], pa.int64())}
            )
        return pa.table(
            {
                "first_fam": pa.array(
                    [b.column("fam_avg")[0].as_py()], pa.float64()
                ),
                "first_doc": pa.array([b.column("doc_id")[0].as_py()], pa.int64()),
                "cnt": pa.array([b.num_rows], pa.int64()),
            }
        )

    parts = srt.map_batches(
        block_partial, batch_format="pyarrow", batch_size=None
    ).take_all()  # O(blocks) rows, by design
    parts.sort(key=lambda r: (-r["first_fam"], r["first_doc"]))
    n_total = sum(int(p["cnt"]) for p in parts)
    base: dict[tuple, int] = {}
    acc = 0
    for p in parts:
        base[(float(p["first_fam"]), int(p["first_doc"]))] = acc
        acc += int(p["cnt"])
    # DuckDB NTILE sizes: first (N % k) tiles get one extra row
    q, r = divmod(n_total, n_buckets)
    cum = np.cumsum([q + (1 if i < r else 0) for i in range(n_buckets)])
    labels3 = {1: "head", 2: "middle", 3: "tail"}
    ref = ray.put((base, cum))

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()),
                 "fam_avg": pa.array([], pa.float64()),
                 "bucket": pa.array([], pa.int64()),
                 "label": pa.array([], pa.string())}
            )
        base_map, cum_b = ray.get(ref)
        key = (
            float(b.column("fam_avg")[0].as_py()),
            int(b.column("doc_id")[0].as_py()),
        )
        ranks = base_map[key] + np.arange(b.num_rows, dtype=np.int64)
        bucket = np.searchsorted(cum_b, ranks, side="right") + 1
        if n_buckets == 3:
            lab = [labels3[int(x)] for x in bucket]
        else:
            lab = [f"q{int(x)}" for x in bucket]
        return pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "fam_avg": b.column("fam_avg"),
                "bucket": pa.array(bucket, pa.int64()),
                "label": pa.array(lab, pa.string()),
            }
        )

    out = srt.map_batches(assign, batch_format="pyarrow", batch_size=None)
    # merge the sort's schema-less empty range partitions (they bypass
    # the map UDFs above and would surface in the output)
    return out.repartition(max(1, min(srt.num_blocks(), 16)))


def cooccurrence_pmi(
    docs_ds,
    window: int = 2,
    min_count: int = 3,
    round_digits: int = 6,
    broadcast_limit: int | None = None,
):
    """Skip-gram co-occurrence counts + PMI over the document token
    stream — the statistic word2vec-style embedding training data is
    built from (Levy & Goldberg 2014's implicit matrix; Church & Hanks
    1990 PMI).

    Semantics (replayed exactly by the SQL oracle): tokens are the
    postings tokenizer's ``[a-z0-9]{2,}`` runs of lower(text) in
    document order; every position pair (i, j) with i < j <= i+window
    inside one document is ONE co-occurrence event for the unordered,
    lexicographically-normalized pair (least, greatest); ``c_ab`` sums
    events over the corpus; ``pmi = ln(c_ab * T / (u_a * u_b))`` with
    ``u_x`` the corpus unigram count and ``T`` total tokens, rounded
    half-away (``round_digits``) because DuckDB/libm ``ln`` may differ
    in the last ulp.  The log argument's numerator/denominator are
    exact int64 products cast to double identically in both engines.

    100-TB shape: pair extraction + a per-batch polars combine are
    map-only (exchange rows = distinct pairs per block, not token
    events); both reductions run through ``sorted_agg`` because the
    key spaces (vocab^2-bounded pairs, vocab) grow with the corpus;
    the unigram attach is a ``gated_left_join`` (broadcast under the
    row gate, distributed hash join above).  int64 headroom: c_ab * T
    overflows past T ~ 3e9 * c_ab — at full web scale compute the log
    argument as ln(c_ab) + ln(T) - ln(u_a) - ln(u_b) instead; kept as
    the exact-product form here because it is bit-replayable in SQL.
    """
    from ..functions.joins import gated_left_join
    from .shuffle import AUTO_THRESHOLD, _unlarge, sorted_agg

    pair_empty = pa.table(
        {
            "a": pa.array([], pa.string()),
            "b": pa.array([], pa.string()),
            "cnt": pa.array([], pa.int64()),
        }
    )
    uni_empty = pa.table(
        {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
    )

    def _explode(batch: pa.Table):
        df = pl.from_arrow(batch.select(["text"]))
        ex = (
            df.with_columns(
                pl.col("text")
                .fill_null("")
                .str.to_lowercase()
                .str.extract_all(r"[a-z0-9]{2,}")
                .alias("tok")
            )
            .drop("text")
            .with_row_index("did")
            .explode("tok")
            .drop_nulls("tok")
        )
        return ex["tok"].to_numpy(), ex["did"].to_numpy()

    def pair_partial(batch: pa.Table) -> pa.Table:
        tok, did = _explode(batch)
        if len(tok) == 0:
            return pair_empty
        xs, ys = [], []
        for o in range(1, window + 1):
            if o >= len(tok):
                break
            same = did[:-o] == did[o:]
            xs.append(tok[:-o][same])
            ys.append(tok[o:][same])
        if not xs or not sum(len(x) for x in xs):
            return pair_empty
        x = np.concatenate(xs)
        y = np.concatenate(ys)
        lo = x <= y  # ASCII tokens: python/duckdb binary collation agree
        part = (
            pl.DataFrame({"a": np.where(lo, x, y), "b": np.where(lo, y, x)})
            .group_by(["a", "b"])
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return _unlarge(part.to_arrow())

    def uni_partial(batch: pa.Table) -> pa.Table:
        tok, _did = _explode(batch)
        if len(tok) == 0:
            return uni_empty
        part = (
            pl.DataFrame({"term": tok})
            .group_by("term")
            .agg(pl.len().cast(pl.Int64).alias("cnt"))
        )
        return _unlarge(part.to_arrow())

    pairs = sorted_agg(
        docs_ds.map_batches(pair_partial, batch_format="pyarrow"),
        ["a", "b"],
        {"c_ab": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    ).map_batches(
        lambda b, _m=min_count: b.filter(
            pc.greater_equal(b.column("c_ab"), _m)
        ),
        batch_format="pyarrow",
    )
    uni = sorted_agg(
        docs_ds.map_batches(uni_partial, batch_format="pyarrow"),
        "term",
        {"u": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    ).materialize()
    total_tokens = int(uni.sum("u") or 0)  # empty corpus -> 0, not TypeError

    join_kw = {} if broadcast_limit is None else {"broadcast_limit": broadcast_limit}
    with_ua = gated_left_join(pairs, "a", uni, "term", ["u"], **join_kw).map_batches(
        lambda b: b.rename_columns(
            ["u_a" if c == "u" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    with_ub = gated_left_join(with_ua, "b", uni, "term", ["u"], **join_kw).map_batches(
        lambda b: b.rename_columns(
            ["u_b" if c == "u" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )

    def score(t: pa.Table) -> pa.Table:
        c = t.column("c_ab").to_numpy(zero_copy_only=False).astype(np.int64)
        ua = t.column("u_a").to_numpy(zero_copy_only=False).astype(np.int64)
        ub = t.column("u_b").to_numpy(zero_copy_only=False).astype(np.int64)
        num = (c * total_tokens).astype(np.float64)
        den = (ua * ub).astype(np.float64)
        pmi = round_half_away(np.log(num / den), round_digits)
        return pa.table(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "c_ab": pa.array(c),
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return with_ub.map_batches(score, batch_format="pyarrow")


def tfidf_related_docs(
    docs_ds,
    n_docs: int,
    k: int = 5,
    df_min: int = 2,
    df_max: int | None = None,
    idf_scale: int = 1000,
    round_digits: int = 4,
    num_partitions: int = 8,
    broadcast_limit: int | None = None,
):
    """Related documents by sparse TF-IDF cosine through the inverted
    index — the classic more-like-this / lexical-clustering operator:
    docs are vectors in the term space restricted to ``df_min <= df <=
    df_max`` (rare/stop-term pruning — ALSO the scale guard: the pair
    exchange is bounded by sum_term df^2 <= df_max * |postings|, the
    standard bound for postings-self-join similarity), pair dot
    products ride a term-partitioned distributed hash join, and the
    per-doc top-k cut is a per-batch vectorized prune followed by a
    hash-partitioned groupby(doc_id) cut — no driver concentration.

    Exactness: idf is quantized to int64 milli-nats (``round_half_away
    (ln(N/df) * idf_scale)`` — N/df and the ln argument are identical
    doubles in both engines; the rounding absorbs libm ulp skew), so
    weights w = tf * idf_q, norms sum(w^2) and pair numerators
    sum(w_a*w_b) are exact int64; cosine divides identical doubles
    (IEEE sqrt is correctly rounded), rounded at ``round_digits`` with
    neighbor-id tiebreak for engine-exact ranking.  int64 headroom:
    per-doc sum(w^2) <= terms * (tf * ln(N)*scale)^2 — overflows only
    past ~1e9 tf*idf mass per doc; lower idf_scale if a corpus nears it.

    Returns (doc_id, neighbor_id, rnk, cos) with rnk 1-based per doc.
    """
    from ..functions.joins import gated_left_join
    from .shuffle import AUTO_THRESHOLD, _unlarge, sorted_agg

    if df_max is None:
        df_max = max(df_min, n_docs // 4)
    join_kw = {} if broadcast_limit is None else {"broadcast_limit": broadcast_limit}

    # materialize the NARROW tf table once: it feeds both the df pass
    # and the weight attach — unmaterialized, the tokenizer would run
    # twice (the double-scan wart the BM25 entries fixed in round 4)
    tf = docs_ds.map_batches(content_postings, batch_format="pyarrow").materialize()
    df_tbl = sorted_agg(
        tf, "term", {"df": ("count", "doc_id")}, auto_threshold=AUTO_THRESHOLD
    )

    def to_idf(b: pa.Table) -> pa.Table:
        dfv = b.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (dfv >= df_min) & (dfv <= df_max)
        t = b.filter(pa.array(keep))
        dfk = t.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        idf_q = round_half_away(np.log(float(n_docs) / dfk) * idf_scale, 0)
        return pa.table(
            {
                "term": t.column("term"),
                "idf_q": pa.array(idf_q.astype(np.int64)),
            }
        )

    idf_tbl = df_tbl.map_batches(to_idf, batch_format="pyarrow")

    w_attached = gated_left_join(tf, "term", idf_tbl, "term", ["idf_q"], **join_kw)

    def to_w(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(b.column("idf_q")))  # pruned terms out
        w = pc.multiply_checked(
            pc.cast(t.column("tf"), pa.int64()), t.column("idf_q")
        )
        return pa.table(
            {"term": t.column("term"), "doc_id": t.column("doc_id"), "w": w}
        )

    w_ds = w_attached.map_batches(to_w, batch_format="pyarrow").materialize()

    norm2 = sorted_agg(
        w_ds.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": b.column("doc_id"),
                    "w2": pc.multiply_checked(b.column("w"), b.column("w")),
                }
            ),
            batch_format="pyarrow",
        ),
        "doc_id",
        {"n2": ("sum", "w2")},
        auto_threshold=AUTO_THRESHOLD,
    )

    right = w_ds.map_batches(
        lambda b: pa.table(
            {
                "term": b.column("term"),
                "doc_b": b.column("doc_id"),
                "w_b": b.column("w"),
            }
        ),
        batch_format="pyarrow",
    )
    joined = w_ds.join(
        right, join_type="inner", num_partitions=num_partitions, on=("term",)
    ).repartition(num_partitions)

    def prod(b: pa.Table) -> pa.Table:
        t = b.filter(pc.less(b.column("doc_id"), b.column("doc_b")))
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "doc_b": t.column("doc_b"),
                "p": pc.multiply_checked(t.column("w"), t.column("w_b")),
            }
        )

    nums = sorted_agg(
        joined.map_batches(prod, batch_format="pyarrow"),
        ["doc_id", "doc_b"],
        {"num": ("sum", "p")},
        auto_threshold=AUTO_THRESHOLD,
    )

    with_na = gated_left_join(
        nums, "doc_id", norm2, "doc_id", ["n2"], **join_kw
    ).map_batches(
        lambda b: b.rename_columns(["n2_a" if c == "n2" else c for c in b.column_names]),
        batch_format="pyarrow",
    )
    with_nb = gated_left_join(
        with_na, "doc_b", norm2, "doc_id", ["n2"], **join_kw
    ).map_batches(
        lambda b: b.rename_columns(["n2_b" if c == "n2" else c for c in b.column_names]),
        batch_format="pyarrow",
    )

    def cos_mirror(b: pa.Table) -> pa.Table:
        num = b.column("num").to_numpy(zero_copy_only=False).astype(np.float64)
        na = b.column("n2_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = b.column("n2_b").to_numpy(zero_copy_only=False).astype(np.float64)
        cos = round_half_away(num / (np.sqrt(na) * np.sqrt(nb)), round_digits)
        da = b.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        db = b.column("doc_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([da, db])),
                "neighbor_id": pa.array(np.concatenate([db, da])),
                "cos": pa.array(np.concatenate([cos, cos]), pa.float64()),
            }
        )

    sym = with_nb.map_batches(cos_mirror, batch_format="pyarrow")

    def prune(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        return _unlarge(
            pl.from_arrow(b)
            .sort(["cos", "neighbor_id"], descending=[True, False])
            .group_by("doc_id", maintain_order=True)
            .head(k)
            .to_arrow()
        )

    def cut(g: pa.Table) -> pa.Table:
        t = (
            pl.from_arrow(g)
            .sort(["cos", "neighbor_id"], descending=[True, False])
            .head(k)
            .with_row_index("rnk", offset=1)
            .with_columns(pl.col("rnk").cast(pl.Int64))
            .select(["doc_id", "neighbor_id", "rnk", "cos"])
        )
        return _unlarge(t.to_arrow())

    return (
        sym.map_batches(prune, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(cut, batch_format="pyarrow")
    )


WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 4  # k-grams per winnowing window
_WIN_MOD = 2147483647  # 2^31-1: every product stays < 2^62 (int64-exact)
_WIN_POW = [pow(_FP_BASE, j, _WIN_MOD) for j in range(WINNOW_K)]


def winnow_fingerprints(
    batch: pa.Table, k: int = WINNOW_K, w: int = WINNOW_W
) -> pa.Table:
    """Robust winnowing (Schleimer, Wilkerson, Aiken, SIGMOD 2003 —
    the MOSS fingerprint selection): hash every k-token gram with the
    doc_fingerprint polynomial (md5-prefix-32 token hash, base
    _FP_BASE) reduced mod 2^31-1 so all arithmetic is int64-exact in
    BOTH engines, slide a window of ``w`` consecutive gram hashes, and
    select each window's minimum with ties broken RIGHTMOST (the
    paper's robust rule — guarantees every substring match of length
    >= w+k-1 shares a selected fingerprint, with expected density
    2/(w+1)).  Documents with fewer than k tokens emit nothing; with
    fewer than w grams, one window over all grams.

    Returns (doc_id, pos, fp): 1-based gram position and selected gram
    hash — the per-doc fingerprint SET used for containment-style
    near-dup detection where MinHash's whole-document Jaccard is too
    coarse (partial plagiarism, quote detection, boilerplate reuse).

    Map-only per doc; the numpy path vectorizes the gram hashing and
    the rightmost-argmin (reversed sliding_window_view); the per-token
    md5 is the cost, same trade as doc_fingerprint (SQL comparability
    over a faster non-replayable hash).
    """
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        pl.col("text")
        .fill_null("")
        .str.to_lowercase()
        .str.extract_all(TOKEN_RE)
        .alias("tok")
    )
    # hash each DISTINCT token once per batch (the _token_hashes md5
    # trade in stages/dedup.py): occurrences then cost a dict lookup,
    # not an md5 — web batches repeat tokens heavily
    lut = {
        t: _tok_h32(t) % _WIN_MOD
        for t in df["tok"].explode().unique().drop_nulls().to_list()
    }
    out_doc: list[int] = []
    out_pos: list[int] = []
    out_fp: list[int] = []
    for did, toks in zip(df["doc_id"].to_list(), df["tok"].to_list()):
        toks = toks or []
        n = len(toks)
        if n < k:
            continue
        h = np.fromiter((lut[t] for t in toks), dtype=np.int64, count=n)
        m = n - k + 1
        acc = (h[0:m] * _WIN_POW[0]) % _WIN_MOD
        for j in range(1, k):
            acc = (acc + (h[j : j + m] * _WIN_POW[j]) % _WIN_MOD) % _WIN_MOD
        we = min(w, m)
        sw = np.lib.stride_tricks.sliding_window_view(acc, we)
        # argmin over the REVERSED window axis = rightmost minimum
        idx = we - 1 - np.argmin(sw[:, ::-1], axis=1)
        pos = np.unique(np.arange(sw.shape[0], dtype=np.int64) + idx)
        out_doc.extend([did] * len(pos))
        out_pos.extend((pos + 1).tolist())  # 1-based gram position
        out_fp.extend(acc[pos].tolist())
    return pa.table(
        {
            "doc_id": pa.array(out_doc, pa.int64()),
            "pos": pa.array(out_pos, pa.int64()),
            "fp": pa.array(out_fp, pa.int64()),
        }
    )


def source_vocab_overlap(docs_ds, *, auto_threshold: int | None = None):
    """Pairwise vocabulary Jaccard between corpus SOURCES ->
    (source_a, source_b, inter_cnt, union_cnt, jaccard): the
    data-mixing diagnostic (how lexically similar are two crawl
    sources / domains / dumps) used to pick mixture weights next to
    DSIR's importance weights.  Tokenization is the engine's
    extractTerms rule (TOKEN_RE, lowercased); a source's vocabulary is
    its distinct term set; only intersecting pairs appear (disjoint
    vocabularies are not web-plausible and would add C(sources,2)
    zero rows).

    Scale shape: one distinct over (source, term) — map-side unique per
    batch, then ``sorted_distinct`` (corpus-proportional keys, the one
    big exchange); per-term pair emission is groupby(term).map_groups
    with fan-out bounded by sources-per-term <= |sources| (the source
    DOMAIN is tiny — dumps / registrable domains buckets — so pair rows
    are |terms| * O(|sources|^2) worst case, and the final pair/vocab
    reduction is pair-domain-bounded).  ``jaccard`` is one exact IEEE
    division of int64 counts — bit-identical across engines.
    """
    from .shuffle import sorted_agg, sorted_distinct

    def explode(batch: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(batch.select(["source", "text"]))
            .with_columns(
                pl.col("text").fill_null("").str.extract_all(TOKEN_RE).alias("tok")
            )
            .select("source", "tok")
            .explode("tok")
            .drop_nulls("tok")
            .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
            .select("source", "term")
            .unique()
        )
        return df.to_arrow().cast(
            pa.schema([("source", pa.string()), ("term", pa.string())])
        )

    tok = sorted_distinct(
        docs_ds.map_batches(explode, batch_format="pyarrow"),
        ["source", "term"],
        auto_threshold=auto_threshold,
    ).materialize()

    vocab = sorted_agg(
        tok, "source", {"nv": ("count", "term")}, auto_threshold=auto_threshold
    )
    # source-domain-bounded collect (dumps/domain buckets, not corpus)
    nv = {
        r["source"]: int(r["nv"])
        for b in vocab.iter_batches(batch_size=None, batch_format="pyarrow")
        for r in b.to_pylist()
    }

    def pair_rows(group: pa.Table) -> pa.Table:
        srcs = sorted(group.column("source").to_pylist())
        a_l, b_l = [], []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                a_l.append(srcs[i])
                b_l.append(srcs[j])
        return pa.table(
            {
                "source_a": pa.array(a_l, pa.string()),
                "source_b": pa.array(b_l, pa.string()),
                "cnt": pa.array(np.ones(len(a_l), np.int64), pa.int64()),
            }
        )

    inter = sorted_agg(
        tok.groupby("term").map_groups(pair_rows, batch_format="pyarrow"),
        ["source_a", "source_b"],
        {"inter_cnt": ("sum", "cnt")},
        auto_threshold=auto_threshold,
    )

    def finish(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        na = np.asarray([nv[s] for s in df["source_a"].to_list()], np.int64)
        nb = np.asarray([nv[s] for s in df["source_b"].to_list()], np.int64)
        ic = df["inter_cnt"].to_numpy().astype(np.int64)
        un = na + nb - ic
        return pa.table(
            {
                "source_a": df["source_a"].to_arrow().cast(pa.string()),
                "source_b": df["source_b"].to_arrow().cast(pa.string()),
                "inter_cnt": pa.array(ic, pa.int64()),
                "union_cnt": pa.array(un, pa.int64()),
                "jaccard": pa.array(ic.astype(np.float64) / un, pa.float64()),
            }
        )

    return inter.map_batches(finish, batch_format="pyarrow")


def proximity_spans(
    docs_ds,
    term_pairs: list[tuple[str, str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
):
    """Per-query proximity top-k: the minimal analyzer-token window
    containing BOTH query terms, per document (span = position gap + 1
    in the token stream the analyzer emits — '[a-z0-9]{2,}' over
    lowercased text, the flagship tokenization), ranked (span ASC,
    doc_id ASC) and cut to ``k``.  The classic term-proximity ranking
    signal (Buettcher et al., SIGIR 2006) the BM25 engine's bag-of-
    words score cannot see; phrase queries are its span==len special
    case.

    ``term_pairs``: (query_label, term_a, term_b), term_a != term_b.

    Kernel (one pass, fully vectorized): tokenize each batch once,
    explode to (doc, token, position); for each query select both
    terms' occurrences and exploit that the pair minimizing |pa - pb|
    is ADJACENT in the merged position-sorted stream — one boolean
    mask + one diff per query, no per-pair work (cost O(tf_a + tf_b)
    per doc, never tf_a * tf_b like the verification oracle's join).

    100-TB shape: the heavy explode is map-only and batch-local; the
    only exchange is grouped_topk over query labels (a tiny bounded
    group domain) at <= |queries| * k rows per block after the partial
    cut.  Docs are row-atomic in a batch, so per-batch spans are final
    per doc — no (query, doc) reduce is needed at all.
    """
    from .shuffle import grouped_topk

    empty = pa.table(
        {
            "query": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "span": pa.array([], pa.int64()),
        }
    )

    def kern(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty
        df = pl.from_arrow(b.select([id_col, text_col])).with_columns(
            ts=pl.col(text_col)
            .fill_null("")
            .str.to_lowercase()
            .str.extract_all(r"[a-z0-9]{2,}")
        )
        ex = (
            df.select([id_col, "ts"])
            .with_row_index("r")
            .explode("ts")
            .drop_nulls("ts")
        )
        if ex.height == 0:
            return empty
        ex = ex.with_columns(p=pl.int_range(pl.len()).over("r"))
        did = ex[id_col].to_numpy()
        pos = ex["p"].to_numpy()
        toks = ex["ts"].to_numpy()
        outs = []
        for label, t1, t2 in term_pairs:
            m1 = toks == t1
            idx = np.flatnonzero(m1 | (toks == t2))
            if idx.size < 2:
                continue
            lab = m1[idx]
            d2, p2 = did[idx], pos[idx]
            adj = (d2[1:] == d2[:-1]) & (lab[1:] != lab[:-1])
            if not adj.any():
                continue
            spans = (
                pl.DataFrame(
                    {id_col: d2[1:][adj], "span": (p2[1:] - p2[:-1])[adj] + 1}
                )
                .group_by(id_col)
                .agg(pl.col("span").min())
                .with_columns(query=pl.lit(label))
                .select(["query", id_col, "span"])
            )
            outs.append(spans)
        if not outs:
            return empty
        return pl.concat(outs).to_arrow().cast(empty.schema)

    partial = docs_ds.map_batches(kern, batch_format="pyarrow")
    return grouped_topk(
        partial,
        "query",
        "span",
        k,
        descending=False,
        tiebreak_cols=[id_col],
        emit_rank="rnk",
    )


# the 8 Gopher stop words (Rae et al. 2021, Gopher App. A quality rule)
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")
_WS_CLASS = r"[^ \t\n\r\f\v]"  # RE2/rust-regex-agreeing non-whitespace


def gopher_signals(batch: pa.Table) -> pa.Table:
    """Per-doc Gopher quality-rule signals + the keep verdict (Rae et
    al. 2021 'Scaling Language Models: ... Gopher', Appendix A — the
    published web-text repetition/format rule set this engine's
    quality_metrics heuristic predates).  All signals are integers and
    every threshold compare is cross-multiplied, so the verdict is
    exact in both engines (no ratio ever materializes):

    keep iff  50 <= n_words <= 100000
          and 3*n_words <= nonws_chars <= 10*n_words   (mean word len)
          and 10*sym_words <= n_words                  (#/... ratio)
          and 10*bullet_lines <= 9*n_lines             (<=90% bullets)
          and 10*ellipsis_lines <= 3*n_lines           (<=30% ...)
          and 10*alpha_words >= 8*n_words              (>=80% alphabetic)
          and stop_hits >= 2        (distinct Gopher stop words present)
    """
    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        t=pl.col("text").fill_null("")
    )
    df = df.with_columns(
        ws=pl.col("t").str.extract_all(_WS_CLASS + "+"),
        lines=pl.col("t").str.split("\n"),
        nonws=pl.col("t").str.count_matches(_WS_CLASS).cast(pl.Int64),
        toks=pl.col("t").str.to_lowercase().str.extract_all(r"[a-z]+"),
    )
    df = df.with_columns(
        n_words=pl.col("ws").list.len().cast(pl.Int64),
        n_lines=pl.col("lines").list.len().cast(pl.Int64),
        sym_words=pl.col("ws")
        .list.eval(pl.element().str.contains(r"#|\.\.\.").cast(pl.Int64))
        .list.sum()
        .fill_null(0)
        .cast(pl.Int64),
        alpha_words=pl.col("ws")
        .list.eval(pl.element().str.contains(r"[a-zA-Z]").cast(pl.Int64))
        .list.sum()
        .fill_null(0)
        .cast(pl.Int64),
        bullet_lines=pl.col("lines")
        .list.eval(pl.element().str.contains(r"^[-*•]").cast(pl.Int64))
        .list.sum()
        .fill_null(0)
        .cast(pl.Int64),
        ellipsis_lines=pl.col("lines")
        .list.eval(
            pl.element().str.contains(r"(\.\.\.|…)$").cast(pl.Int64)
        )
        .list.sum()
        .fill_null(0)
        .cast(pl.Int64),
        stop_hits=pl.col("toks")
        .list.unique()
        .list.set_intersection(pl.lit(list(GOPHER_STOPS)))
        .list.len()
        .fill_null(0)
        .cast(pl.Int64),
    )
    n, nw = pl.col("n_words"), pl.col("nonws")
    df = df.with_columns(
        keep=(n >= 50)
        & (n <= 100_000)
        & (3 * n <= nw)
        & (nw <= 10 * n)
        & (10 * pl.col("sym_words") <= n)
        & (10 * pl.col("bullet_lines") <= 9 * pl.col("n_lines"))
        & (10 * pl.col("ellipsis_lines") <= 3 * pl.col("n_lines"))
        & (10 * pl.col("alpha_words") >= 8 * n)
        & (pl.col("stop_hits") >= 2)
    )
    cols = [
        "doc_id", "n_words", "nonws", "n_lines", "sym_words",
        "alpha_words", "bullet_lines", "ellipsis_lines", "stop_hits", "keep",
    ]
    return df.select(cols).to_arrow().cast(
        pa.schema(
            [("doc_id", pa.int64())]
            + [(c, pa.int64()) for c in cols[1:-1]]
            + [("keep", pa.bool_())]
        )
    )


# stand-in for C4's external "bad words" blocklist (the published list
# is a separate repository; the RULE — drop the page on any hit — is
# what the operator implements, over a deterministic two-word list)
C4_BAD_WORDS = ("badword", "uglyword")


def c4_signals(batch: pa.Table) -> pa.Table:
    """Per-doc C4 cleaning-rule signals + verdicts (Raffel et al. 2020
    'Exploring the Limits of Transfer Learning ...' §2.2 — the T5/C4
    web-text recipe, the line-level sibling of gopher_signals' page
    heuristics).  Line rules (a line survives iff ALL hold):

      - ends in a terminal punctuation mark (``. ! ? "``)
      - contains at least 3 words
      - does not mention 'javascript' (case-insensitive)

    Page rules (the page survives iff ALL hold):

      - at least 5 sentences survive (terminal marks in kept lines)
      - no 'lorem ipsum', no '{', no blocklisted word anywhere

    All signals are integer/boolean and every compare is exact, so the
    verdicts are engine-identical; the cleaned page rides out as an
    md5 so the row stays narrow (the rebuild is the kept-lines join,
    recomputable map-side)."""
    import hashlib

    df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
        t=pl.col("text").fill_null("")
    )
    df = df.with_columns(lines=pl.col("t").str.split("\n"))
    df = df.with_columns(
        n_lines=pl.col("lines").list.len().cast(pl.Int64),
        kept=pl.col("lines").list.eval(
            pl.element().filter(
                pl.element().str.contains(r'[.!?"]$')
                & (pl.element().str.count_matches(_WS_CLASS + "+") >= 3)
                & ~pl.element()
                .str.to_lowercase()
                .str.contains("javascript", literal=True)
            )
        ),
    )
    df = df.with_columns(
        n_kept=pl.col("kept").list.len().cast(pl.Int64),
        cleaned=pl.col("kept").list.join("\n"),
        low=pl.col("t").str.to_lowercase(),
    )
    df = df.with_columns(
        n_sentences=pl.col("cleaned")
        .str.count_matches(r"[.!?]")
        .cast(pl.Int64),
        has_lorem=pl.col("low").str.contains("lorem ipsum", literal=True),
        has_brace=pl.col("t").str.contains("{", literal=True),
        has_badword=pl.col("low").str.contains(
            "|".join(C4_BAD_WORDS)
        ),
    )
    df = df.with_columns(
        keep=(pl.col("n_sentences") >= 5)
        & ~pl.col("has_lorem")
        & ~pl.col("has_brace")
        & ~pl.col("has_badword"),
    )
    clean_md5 = [
        hashlib.md5(s.encode("utf-8")).hexdigest()
        for s in df.get_column("cleaned").to_list()
    ]
    out = df.select(
        ["doc_id", "n_lines", "n_kept", "n_sentences",
         "has_lorem", "has_brace", "has_badword", "keep"]
    ).with_columns(clean_md5=pl.Series(clean_md5, dtype=pl.String))
    return out.to_arrow().cast(
        pa.schema(
            [("doc_id", pa.int64()), ("n_lines", pa.int64()),
             ("n_kept", pa.int64()), ("n_sentences", pa.int64()),
             ("has_lorem", pa.bool_()), ("has_brace", pa.bool_()),
             ("has_badword", pa.bool_()), ("keep", pa.bool_()),
             ("clean_md5", pa.string())]
        )
    )
