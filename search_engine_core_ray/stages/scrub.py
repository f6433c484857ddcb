"""Training-data scrubbing operators — the cleaning passes a
large-scale LLM corpus pipeline runs between crawl and tokenization,
expressed Ray-Data-first (vectorized map_batches / filter over Arrow
batches; nothing materializes on the driver):

- ``pii_redact``: replace e-mail addresses and phone-number-shaped
  digit runs with placeholder tags, reporting per-doc match counts
  (the C4 / FineWeb "PII removal" pass).
- ``decontaminate``: drop documents containing any benchmark
  contamination phrase (the n-gram decontamination pass used before
  training on held-out evals). Multi-pattern matching is a single
  Aho-Corasick scan per batch (polars ``contains_any``); the phrase
  set is a broadcast small side — shipped once per actor, never
  re-sent per batch, and at real scale (100k+ benchmark n-grams) it
  rides ``ray.put`` exactly like the query-term broadcast in bm25.
- ``stratified_sample``: deterministic per-source sampling by a
  Knuth multiplicative hash of doc_id — the "domain mixing" pass
  that up/down-weights sources. Hash-based (not RNG) so any worker,
  any partitioning, any re-run keeps exactly the same rows, and the
  SQL oracle can reproduce the decision bit-for-bit.
- ``normalize_text``: NFC unicode normalization + whitespace
  collapse + trim (the canonicalization pass before exact-hash
  dedup; NFC via the same definition DuckDB's nfc_normalize uses).

All four are SQL-checked catalog entries (pipelines/catalog.py); the
regex dialect is the RE2/Rust-regex common subset so polars and
DuckDB agree byte-for-byte (verified for every fixture in
tests/test_scrub.py).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


# RE2 / Rust-regex common subset (no lookaround, no backrefs).
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
# 8+ chars total, digits with optional spaces/hyphens, digit at both
# ends; applied AFTER e-mail redaction so digit runs inside addresses
# are never double-counted.
PHONE_RE = r"\+?\d[\d \-]{6,}\d"

EMAIL_TAG = "<EMAIL>"
PHONE_TAG = "<PHONE>"


def _pii_batch(batch: pa.Table, col: str) -> pa.Table:
    df = pl.from_arrow(batch)
    text = df[col]
    n_emails = text.str.count_matches(EMAIL_RE).cast(pl.Int64)
    red = text.str.replace_all(EMAIL_RE, EMAIL_TAG)
    n_phones = red.str.count_matches(PHONE_RE).cast(pl.Int64)
    red = red.str.replace_all(PHONE_RE, PHONE_TAG)
    out = df.with_columns(
        red.alias(col),
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
    )
    return out.to_arrow()


def pii_redact(docs_ds, col: str = "text"):
    """E-mail + phone redaction -> same rows with ``col`` scrubbed
    plus int64 ``n_emails`` / ``n_phones`` counts. One vectorized
    Rust-regex pass per pattern per batch; order is e-mails first,
    then phones over the already-e-mail-redacted text."""
    return docs_ds.map_batches(
        _pii_batch, fn_kwargs={"col": col}, batch_format="pyarrow"
    )


def decontaminate(docs_ds, phrases: list[str], col: str = "text"):
    """Drop every document whose lowercased ``col`` contains any of
    ``phrases`` (case-insensitive substring = whitespace-normalized
    n-gram hit). Survivors keep their full row. The phrase list is a
    closure constant here (small); at benchmark-suite scale pass a
    ``ray.put`` handle and resolve it in an actor-pool ``__init__``."""
    pats = [p.lower() for p in phrases]

    def keep(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        # null text contains no contamination -> kept (fill_null, or the
        # null mask would silently drop the row; SQL three-valued logic
        # drops NULL rows instead — deliberate divergence, nulls never
        # reach the oracle comparison on this corpus)
        hit = df[col].str.to_lowercase().str.contains_any(pats).fill_null(False)
        return df.filter(~hit).to_arrow()

    return docs_ds.map_batches(keep, batch_format="pyarrow")


# Knuth multiplicative hash constants — chosen so numpy uint64
# arithmetic and DuckDB HUGEINT arithmetic produce identical buckets:
# bucket(id) = (id * 2654435761) mod 2^32 mod 10000.
_KNUTH = np.uint64(2654435761)
_MOD32 = np.uint64(1 << 32)
_BUCKETS = np.uint64(10000)


def sample_bucket(doc_ids: np.ndarray) -> np.ndarray:
    """Deterministic 0..9999 bucket per doc_id (vectorized; uint64
    wrap-around multiply == mod-2^64, then mod 2^32 mod 10^4)."""
    return (doc_ids.astype(np.uint64) * _KNUTH) % _MOD32 % _BUCKETS


def stratified_sample(docs_ds, rates: dict[str, float], key: str = "source"):
    """Keep each row iff its doc_id's hash bucket falls under its
    source's rate (rate 1.0 keeps all, 0.0 none; resolution 1/10000).
    Decision depends only on (doc_id, source) — stable across runs,
    partitionings and engines. Sources absent from ``rates`` drop."""
    thresholds = {k: int(round(v * 10000)) for k, v in rates.items()}

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        bucket = sample_bucket(ids)
        src = np.asarray(batch.column(key).to_pylist(), dtype=object)
        thr = np.zeros(len(ids), dtype=np.uint64)
        for s, t in thresholds.items():
            thr[src == s] = t
        return batch.filter(pa.array(bucket < thr))

    return docs_ds.map_batches(pick, batch_format="pyarrow")


_WS_RE = r"[ \t\r\n\f\v]+"  # \s without the unicode spaces, identical in RE2+Rust


def _normalize_batch(batch: pa.Table, col: str) -> pa.Table:
    # polars str.normalize, not pyarrow utf8_normalize: pyarrow 16.1's
    # kernel fails to compose e+U+0301 -> é (verified), polars matches
    # DuckDB's nfc_normalize byte-for-byte.
    df = pl.from_arrow(batch)
    clean = (
        df[col]
        .str.normalize("NFC")
        .str.replace_all(_WS_RE, " ")
        .str.strip_chars(" ")
        .alias(col)
    )
    return df.with_columns(clean).to_arrow()


def normalize_text(docs_ds, col: str = "text"):
    """NFC-normalize, collapse ASCII whitespace runs to single spaces,
    trim — the canonicalization pass run before exact-hash dedup so
    byte-different renderings of the same text collide."""
    return docs_ds.map_batches(
        _normalize_batch, fn_kwargs={"col": col}, batch_format="pyarrow"
    )


_CONTAM_HASH_SEED = 90210


def contamination_frac(docs_ds, benchmark_texts: list[str], n: int = 3):
    """Fuzzy decontamination signal (the GPT-3 appendix-C / PaLM-style
    n-gram overlap check, public method): per document, the fraction
    of its token n-gram windows that also occur in any benchmark text.
    Exact-phrase dropping (``decontaminate``) misses paraphrased or
    partially-quoted contamination; the window-overlap fraction is the
    standard graded alternative — filter or down-weight above a
    threshold.  Returns (doc_id, n_win, contam_win, contam_frac) with
    contam_frac a single division of exact integers.

    Scale shape: the benchmark window set is tiny (benchmarks are
    MB-scale, corpora are TB-scale) — hashed once on the driver,
    ``ray.put`` once, probed per batch with a sorted-array
    searchsorted; the operator is MAP-ONLY, no shuffle."""
    import ray

    def _win_hashes(df: pl.DataFrame, col: str) -> pl.DataFrame:
        ex = (
            df.with_columns(
                tk=pl.col(col).str.to_lowercase().str.extract_all("[a-z0-9]{2,}")
            )
            .with_row_index("_rid")
            .select("_rid", "tk")
            .explode("tk")
            .filter(pl.col("tk").is_not_null())
        )
        return (
            ex.with_columns(
                w=pl.concat_str(
                    [pl.col("tk").shift(-j).over("_rid") for j in range(n)],
                    separator=" ",
                )
            )
            .filter(pl.col("w").is_not_null())
            .with_columns(h=pl.col("w").hash(seed=_CONTAM_HASH_SEED))
            .select("_rid", "h")
        )

    bench = _win_hashes(
        pl.DataFrame({"t": pl.Series(benchmark_texts, dtype=pl.String)}), "t"
    )
    bench_keys = ray.put(np.unique(bench["h"].to_numpy()))

    def score(batch: pa.Table) -> pa.Table:
        keys = ray.get(bench_keys)
        df = pl.from_arrow(batch.select(["doc_id", "text"])).with_columns(
            pl.col("text").fill_null("")
        )
        wins = _win_hashes(df, "text")
        h = wins["h"].to_numpy()
        rid = wins["_rid"].to_numpy().astype(np.int64)
        n_docs = len(df)
        n_win = np.bincount(rid, minlength=n_docs).astype(np.int64)
        if len(keys) and len(h):
            idx = np.clip(np.searchsorted(keys, h), 0, len(keys) - 1)
            hit = (keys[idx] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), dtype=np.int64)
        contam = np.zeros(n_docs, dtype=np.int64)
        np.add.at(contam, rid, hit)
        frac = np.where(n_win > 0, contam / np.maximum(n_win, 1), 0.0)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").cast(pa.int64()),
                "n_win": pa.array(n_win, pa.int64()),
                "contam_win": pa.array(contam, pa.int64()),
                "contam_frac": pa.array(frac, pa.float64()),
            }
        )

    return docs_ds.map_batches(score, batch_format="pyarrow")
