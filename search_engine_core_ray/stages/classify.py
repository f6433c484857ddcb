"""Multinomial Naive Bayes text classification — the closed-form
analog of the fastText-style quality/language classifiers web-scale
training-data pipelines run (CCNet, GPT-3 quality filtering). Unlike
SGD-trained models, NB training is a pure counting problem, so it is
order-free, deterministic, and replayable by a SQL oracle.

Model: Laplace-smoothed multinomial NB over the corpus token rule
(``[a-z0-9]{2,}`` on lowercased text, the postings tokenizer).
log-likelihoods and priors are quantized to MICRO-NATS
(``round_half_away(ln(x) * 1e6)`` as int64 — the idf_q / pmi /
ranking_eval fixed-point discipline), so document scores are exact
int64 sums and the argmax is bit-identical across engines; ties break
to the lexicographically smallest label.

Scale shape (100 TB):
- training is ONE corpus pass: per-batch partial (label, term) counts
  -> sorted_agg; every derived scalar (per-label totals, vocab size,
  doc priors) is a label- or vocab-bounded aggregate.
- the model is vocabulary x labels; scoring attaches it with the
  threshold-gated join (broadcast under the limit, distributed hash
  join above), then ONE hash-bucketed exchange of per-(doc, label)
  partial sums feeds a vectorized per-bucket argmax kernel — the
  sessionize pattern, no per-doc Python.
- the label-domain tables (priors, OOV penalties) are L rows and ride
  in closures.

Docs whose text yields zero tokens are absent from the output (they
have no evidence rows; the SQL oracle drops them identically).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from .textstats import TOKEN_RE, round_half_away

LN_SCALE = 1_000_000  # micro-nats
N_BUCKETS = 32


def _explode_label_terms(b: pa.Table, text_col: str, label_col: str) -> pa.Table:
    """(label, term, cnt) occurrence partials for one batch."""
    df = (
        pl.from_arrow(b.select([label_col, text_col]))
        .with_columns(
            pl.col(text_col).fill_null("").str.extract_all(TOKEN_RE).alias("tok")
        )
        .drop(text_col)
        .explode("tok")
        .drop_nulls("tok")
        .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
        .group_by([label_col, "term"])
        .agg(pl.len().cast(pl.Int64).alias("cnt"))
        .rename({label_col: "label"})
    )
    return df.to_arrow().cast(
        pa.schema([("label", pa.string()), ("term", pa.string()),
                   ("cnt", pa.int64())])
    )


def nb_train(train_ds, *, label_col: str, text_col: str):
    """Train the quantized NB model.

    Returns ``(model_ds, label_info)``: model_ds is a Dataset
    ``(label, term, lq)`` with lq the micro-nat log-likelihood
    (vocabulary-proportional, stays distributed); label_info is the
    L-row driver-side dict ``{label: (prior_q, oov_q)}``.
    """
    from ray.data.aggregate import Count, Sum

    from .shuffle import AUTO_THRESHOLD, sorted_agg

    counts = sorted_agg(
        train_ds.map_batches(
            lambda b: _explode_label_terms(b, text_col, label_col),
            batch_format="pyarrow",
        ),
        ["label", "term"],
        {"cnt": ("sum", "cnt")},
        auto_threshold=AUTO_THRESHOLD,
    ).materialize()

    # label-domain scalars: T(label) occurrence totals (L rows),
    # vocabulary size V (1 row), doc-count priors (L rows)
    totals = {
        r["label"]: int(r["total"])
        for r in counts.groupby("label")
        .aggregate(Sum("cnt", alias_name="total"))
        .take_all()
    }
    vocab_n = counts.groupby("term").aggregate(Count(alias_name="c")).count()
    doc_counts = {
        r[label_col]: int(r["n"])
        for r in train_ds.groupby(label_col)
        .aggregate(Count(alias_name="n"))
        .take_all()
    }
    n_train = sum(doc_counts.values())

    label_info = {}
    for lab in sorted(totals):
        denom = float(totals[lab] + vocab_n)
        prior_q = int(
            round_half_away(
                np.log(doc_counts[lab] / float(n_train)) * LN_SCALE, 0
            )
        )
        oov_q = int(round_half_away(np.log(1.0 / denom) * LN_SCALE, 0))
        label_info[lab] = (prior_q, oov_q)

    def quantize(b: pa.Table) -> pa.Table:
        labs = b.column("label").to_pylist()
        cnt = b.column("cnt").to_numpy().astype(np.float64)
        denom = np.array([totals[l] + vocab_n for l in labs], dtype=np.float64)
        lq = round_half_away(np.log((cnt + 1.0) / denom) * LN_SCALE, 0)
        return pa.table(
            {
                "label": b.column("label"),
                "term": b.column("term"),
                "lq": pa.array(lq.astype(np.int64), pa.int64()),
            }
        )

    return counts.map_batches(quantize, batch_format="pyarrow"), label_info


def nb_predict(test_ds, model_ds, label_info: dict, *, id_col: str,
               text_col: str, num_partitions: int = 8,
               broadcast_limit: int | None = None):
    """Score + argmax: Dataset ``(id_col, pred, score_q)`` — one row
    per test doc with >= 1 token."""
    import zlib

    from ..functions.joins import gated_left_join

    labels = sorted(label_info)
    oov = {lab: label_info[lab][1] for lab in labels}
    prior = {lab: label_info[lab][0] for lab in labels}

    def explode(b: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(b.select([id_col, text_col]))
            .with_columns(
                pl.col(text_col).fill_null("")
                .str.extract_all(TOKEN_RE).alias("tok")
            )
            .drop(text_col)
            .explode("tok")
            .drop_nulls("tok")
            .with_columns(pl.col("tok").str.to_lowercase().alias("term"))
            .group_by([id_col, "term"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
        )
        # cross with the L labels; composite key for the gated join
        df = df.join(pl.DataFrame({"label": labels}), how="cross")
        df = df.with_columns(
            (pl.col("label") + pl.lit("|") + pl.col("term")).alias("k")
        )
        return df.select([id_col, "label", "term", "tf", "k"]).to_arrow().cast(
            pa.schema(
                [(id_col, pa.int64()), ("label", pa.string()),
                 ("term", pa.string()), ("tf", pa.int64()),
                 ("k", pa.string())]
            )
        )

    keyed_model = model_ds.map_batches(
        lambda b: pa.table(
            {
                "k": pa.array(
                    [f"{l}|{t}" for l, t in zip(
                        b.column("label").to_pylist(),
                        b.column("term").to_pylist())],
                    pa.string(),
                ),
                "lq": b.column("lq"),
            }
        ),
        batch_format="pyarrow",
    )
    join_kw = {"num_partitions": num_partitions}
    if broadcast_limit is not None:
        join_kw["broadcast_limit"] = broadcast_limit
    attached = gated_left_join(
        test_ds.map_batches(explode, batch_format="pyarrow"),
        "k", keyed_model, "k", ["lq"], **join_kw,
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()),
                 "label": pa.array([], pa.string()),
                 "psum": pa.array([], pa.int64()),
                 "_bucket": pa.array([], pa.int32())}
            )
        df = pl.from_arrow(b)
        df = df.with_columns(
            lqf=pl.col("lq").fill_null(
                pl.col("label").replace_strict(oov, return_dtype=pl.Int64)
            )
        ).with_columns(w=pl.col("tf") * pl.col("lqf"))
        out = df.group_by([id_col, "label"]).agg(psum=pl.col("w").sum())
        ids = out[id_col].to_list()
        return out.to_arrow().append_column(
            "_bucket",
            pa.array([zlib.crc32(str(i).encode()) % N_BUCKETS for i in ids],
                     pa.int32()),
        )

    def argmax_bucket(group: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(group)
            .group_by([id_col, "label"])
            .agg(psum=pl.col("psum").sum())
            .with_columns(
                score_q=pl.col("psum")
                + pl.col("label").replace_strict(prior, return_dtype=pl.Int64)
            )
            .sort([id_col, "score_q", "label"], descending=[False, True, False])
            .group_by(id_col, maintain_order=True)
            .first()
        )
        return df.select([id_col, "label", "score_q"]).rename(
            {"label": "pred"}
        ).to_arrow().cast(
            pa.schema([(id_col, pa.int64()), ("pred", pa.string()),
                       ("score_q", pa.int64())])
        )

    return (
        attached.map_batches(partial, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(argmax_bucket, batch_format="pyarrow")
    )
