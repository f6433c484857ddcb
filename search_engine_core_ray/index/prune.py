"""Static index pruning: keep each term's top-K highest-impact postings.

The classic serving-cost lever (Carmel et al., SIGIR 2001 "Static index
pruning for information retrieval systems" — public algorithm): head
terms with millions of postings dominate both segment bytes and query
latency, yet only their highest-impact postings can ever reach a top-10
result page. Pruning each term's posting list to its K best postings
by the engine's own impact rule bounds per-term work at query time at a
measured fidelity cost (``fidelity_at_k`` below reports the honest
overlap number, and tests pin it).

Reference context: the reference engine serves unpruned Redis posting
sets (RedisSearchStorage); pruning here is the scale path its
10^12-doc target needs, not a reference twin.

Impact rule — the engine's ACTUAL single-term query score for the doc
(query/engine.py ``_score_candidates``, bm25 branch):

    fs  = w_t*C(tft) + w_c*C(tfc) + w_d*C(tfd)*[len_desc > 0],
          C(tf) = tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))
    idf = ln((N - df + 0.5) / (df + 0.5))          # SIGNED: head terms
                                                   # have NEGATIVE idf,
                                                   # flipping the fs order
    impact = (idf*fs + w_kw*[term in doc.keywords])
             * (quality if quality > 0 else 1)
             * (1 + domain_authority_boost*[authority domain])

i.e. everything the engine awards the doc for a one-term query EXCEPT
the two query-dependent boosts (exact-phrase and the case-sensitive
title-substring boost — the latter is skipped deliberately: computing
it for EVERY vocabulary term is a vocab x corpus substring scan, and
its signal is largely carried by tft inside fs). Each term's ORIGINAL
df is preserved in the pruned rows, so every surviving posting scores
bit-identically to the full index — the pruned top-k therefore equals
the full top-k whenever the full winners survive the cut (score
preservation, the Carmel property). Ties break on lower doc_id: the
cut is deterministic.

Design (Ray-Data-native):
- one task per term shard (terms are hash-sharded, so a term's rows —
  one per docID-range bucket — all live in its shard's segment files;
  the per-shard group IS the pruning unit and no cross-shard exchange
  exists). Sizing assumption matches the merge path: a shard's term
  table must be worker-sized — raise ``num_shards`` otherwise.
- the per-doc field lengths the impact needs are broadcast as ONE
  plasma object per docID-range bucket (narrow doc_id + 3 length
  columns, ~20 B/doc): ``ray.put`` once on the driver, zero-copy reads
  in every shard task, each node materializing each bucket object at
  most once — the broadcast-small-side pattern, never a per-task
  docstore re-read.
- inside a task everything is vectorized across ALL the shard's terms
  at once: one lexsort ranks every posting of every term by
  (impact desc, doc_id asc); survivors are regrouped per (term,
  bucket) and re-encoded by the battle-tested ``merge_bucket_runs``
  kernel, which also rebuilds the block-max metadata, so the pruned
  index is a self-consistent index in the SAME on-disk format (the
  WAND bounds stay valid upper bounds: df is the original, larger,
  value, so idf — and with it every block bound — is unchanged).
- the pruned index SHARES its parent's docstore via the manifest
  ``docstore_dir`` override — pruning must not copy the corpus.
  Corpus stats (N, avgdl) are inherited unchanged: they describe the
  documents, not the postings.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .build import load_manifest
from .codec import decode_postings, delta_encode_sorted, encode_group_sliced
from .segments import (
    RUNS_SCHEMA,
    TERMS_SCHEMA,
    _boundaries,
    merge_bucket_runs,
)
from ..state.checkpoint import atomic_write_json


def _decode_cells(col: pa.ChunkedArray, codec: str) -> list[np.ndarray]:
    return [decode_postings(cell.as_py(), codec) for cell in col]


def _fscores_arrays(
    tft: np.ndarray,
    tfc: np.ndarray,
    tfd: np.ndarray,
    lt: np.ndarray,
    lc: np.ndarray,
    ld: np.ndarray,
    params: dict,
) -> np.ndarray:
    """The engine's _fscores formula over posting-aligned arrays."""
    k1, b = params["k1"], params["b"]
    avg = max(params["avgdl"], 1e-9)
    w_t, w_c, w_d = params["w_title"], params["w_content"], params["w_desc"]
    with np.errstate(divide="ignore", invalid="ignore"):
        fs = (tft * (k1 + 1.0)) / (tft + k1 * (1.0 - b + b * lt / avg))
        fs *= w_t
        c = (tfc * (k1 + 1.0)) / (tfc + k1 * (1.0 - b + b * lc / avg))
        fs += c * w_c
        d = (tfd * (k1 + 1.0)) / (tfd + k1 * (1.0 - b + b * ld / avg))
        d *= ld > 0  # hasDescription gate
        fs += d * w_d
    np.nan_to_num(fs, copy=False, nan=0.0)
    return fs


def prune_shard_table(
    t: pa.Table,
    shard: int,
    k: int,
    codec: str,
    params: dict,
    lens_of_bucket,
) -> tuple[pa.Table, int, int]:
    """Prune one shard's term table -> (pruned TERMS table,
    postings_before, postings_after). ``lens_of_bucket(b)`` returns the
    bucket's docstore broadcast dict (see ``_bucket_lens_refs``).
    Pure given its inputs (tested directly)."""
    if t.num_rows == 0:
        return TERMS_SCHEMA.empty_table(), 0, 0
    counts = t.column("df").to_numpy()
    n_vals = int(counts.sum())
    gap_runs = _decode_cells(t.column("docs_enc"), codec)
    ids = np.concatenate(
        [np.cumsum(g.astype(np.int64)) for g in gap_runs]
    ) if n_vals else np.empty(0, np.int64)
    tft = np.concatenate(_decode_cells(t.column("tft_enc"), codec)).astype(np.float64)
    tfc = np.concatenate(_decode_cells(t.column("tfc_enc"), codec)).astype(np.float64)
    tfd = np.concatenate(_decode_cells(t.column("tfd_enc"), codec)).astype(np.float64)

    terms = t.column("term").to_pylist()
    uniq, row_code = np.unique(np.asarray(terms, dtype=object), return_inverse=True)
    val_code = np.repeat(row_code, counts)
    val_bucket = np.repeat(t.column("bucket").to_numpy(), counts)

    # each term's ORIGINAL total df (over all its bucket rows) drives
    # both the idf in the impact and the df restore after the cut
    orig_df = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(orig_df, row_code, counts)
    idf_term = np.log(
        (params["N"] - orig_df + 0.5) / (orig_df + 0.5)
    )

    # join per-doc docstore stats bucket by bucket (searchsorted against
    # the bucket's sorted doc_id column) and resolve keyword hits per
    # (term, doc) from the bucket's flattened keyword postings
    lt = np.zeros(n_vals)
    lc = np.zeros(n_vals)
    ld = np.zeros(n_vals)
    q_eff = np.ones(n_vals)
    auth = np.zeros(n_vals, dtype=bool)
    kw_hit = np.zeros(n_vals, dtype=bool)
    for b in np.unique(val_bucket):
        m = val_bucket == b
        bb = lens_of_bucket(int(b))
        bid = bb["doc_ids"]
        loc = np.searchsorted(bid, ids[m])
        loc = np.minimum(loc, max(len(bid) - 1, 0))
        hit = (bid[loc] == ids[m]) if len(bid) else np.zeros(int(m.sum()), bool)
        if not np.all(hit):
            raise ValueError(
                f"postings reference doc ids absent from docstore bucket {b}"
            )
        lt[m], lc[m], ld[m] = bb["len_title"][loc], bb["len_content"][loc], bb["len_desc"][loc]
        q = bb["quality"][loc]
        q_eff[m] = np.where(q > 0, q, 1.0)
        auth[m] = bb["is_authority"][loc]
        # keyword membership: bucket keyword postings are flattened
        # (term-sorted, doc_id-ascending within term); one bisect per
        # (term in this shard) x (this bucket)
        kw_terms, kw_ids = bb["kw_terms"], bb["kw_doc_ids"]
        if len(kw_terms):
            midx = np.flatnonzero(m)
            mcodes = val_code[midx]
            for c in np.unique(mcodes):
                lo = np.searchsorted(kw_terms, uniq[c], side="left")
                hi = np.searchsorted(kw_terms, uniq[c], side="right")
                if hi == lo:
                    continue
                sel = midx[mcodes == c]
                kdoc = kw_ids[lo:hi]
                pos2 = np.searchsorted(kdoc, ids[sel])
                pos2 = np.minimum(pos2, len(kdoc) - 1)
                kw_hit[sel] = kdoc[pos2] == ids[sel]

    fs = _fscores_arrays(tft, tfc, tfd, lt, lc, ld, params)
    # tft > 0 proxies the case-sensitive title-substring boost (module
    # docstring): a term tokenized from the title is almost always a
    # title substring, and the true check is a vocab x corpus scan
    impact = (
        (idf_term[val_code] * fs + params["w_keywords"] * kw_hit)
        * q_eff
        * (1.0 + params["authority_boost"] * auth
           + params["title_boost"] * (tft > 0))
    )
    # per-term rank by (impact desc, doc_id asc): one lexsort
    order = np.lexsort((ids, -impact, val_code))
    starts = _boundaries(val_code[order])
    term_sizes = np.diff(np.concatenate((starts, [n_vals])))
    rank = np.arange(n_vals, dtype=np.int64) - np.repeat(starts, term_sizes)
    keep = order[rank < k]

    ids_k = ids[keep]
    tft_k = tft[keep].astype(np.int64)
    tfc_k = tfc[keep].astype(np.int64)
    tfd_k = tfd[keep].astype(np.int64)
    code_k, bucket_k = val_code[keep], val_bucket[keep]

    # regroup survivors per (bucket, term, doc_id) and hand each bucket
    # to merge_bucket_runs (rebuilds the block-max metadata in one pass)
    out_parts = []
    for b in np.unique(bucket_k):
        m = bucket_k == b
        sub_order = np.lexsort((ids_k[m], code_k[m]))
        c_s = code_k[m][sub_order]
        i_s = ids_k[m][sub_order]
        run_starts = _boundaries(c_s)
        n_per = np.diff(np.concatenate((run_starts, [len(i_s)])))
        gaps = delta_encode_sorted(i_s)
        gaps[run_starts] = i_s[run_starts].astype(np.uint64)
        group = pa.table(
            {
                "shard": pa.array(np.full(len(run_starts), shard, np.int32)),
                "bucket": pa.array(np.full(len(run_starts), int(b), np.int32)),
                "term": pa.array(uniq[c_s[run_starts]].astype(object), pa.string()),
                "n": pa.array(n_per, pa.int64()),
                "docs_enc": encode_group_sliced(gaps, run_starts),
                "tft_enc": encode_group_sliced(
                    tft_k[m][sub_order].astype(np.uint64), run_starts
                ),
                "tfc_enc": encode_group_sliced(
                    tfc_k[m][sub_order].astype(np.uint64), run_starts
                ),
                "tfd_enc": encode_group_sliced(
                    tfd_k[m][sub_order].astype(np.uint64), run_starts
                ),
            },
            schema=RUNS_SCHEMA,
        )
        out_parts.append(merge_bucket_runs(group, codec=codec))
    out = (
        pa.concat_tables(out_parts) if out_parts else TERMS_SCHEMA.empty_table()
    )
    # Restore each term's ORIGINAL df (score preservation): N, avgdl,
    # tf and df unchanged means every surviving posting scores
    # bit-identically to the full index. df is summed across a term's
    # rows by the readers, so the term's first row carries the whole
    # original total and its other rows carry 0.
    if out.num_rows:
        out_terms = np.asarray(out.column("term").to_pylist(), dtype=object)
        out_code = np.searchsorted(uniq, out_terms)
        first = np.zeros(len(out_terms), dtype=bool)
        first[np.unique(out_code, return_index=True)[1]] = True
        df_col = np.where(first, orig_df[out_code], 0)
        out = out.set_column(
            out.schema.get_field_index("df"), "df", pa.array(df_col, pa.int64())
        )
    return out, n_vals, int(len(keep))


def _bucket_lens_refs(docstore_dir: str) -> dict[int, "object"]:
    """ray.put one narrow docstore projection per bucket — the
    broadcast side of the prune: sorted doc_ids, the three field
    lengths, quality, the authority flag, and the flattened keyword
    postings (term-sorted, doc_id-ascending within term)."""
    import ray
    import pyarrow.compute as _pc

    from ..scoring.config import AUTHORITY_DOMAINS

    refs = {}
    for d in sorted(glob.glob(os.path.join(docstore_dir, "bucket=*"))):
        b = int(d.rsplit("=", 1)[1])
        t = pq.read_table(
            d,
            columns=[
                "doc_id", "len_title", "len_content", "len_desc",
                "quality", "domain", "keywords",
            ],
        )
        ids = t.column("doc_id").to_numpy()
        order = np.argsort(ids, kind="stable")
        t = t.take(pa.array(order))
        ids = t.column("doc_id").to_numpy()
        kw_col = t.column("keywords")
        if isinstance(kw_col, pa.ChunkedArray):
            kw_col = kw_col.combine_chunks()
        kw_lens = (
            _pc.fill_null(_pc.list_value_length(kw_col), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        kw_flat = np.asarray(_pc.list_flatten(kw_col).to_pylist(), dtype=object)
        kw_docs = np.repeat(ids, kw_lens)
        kw_order = np.argsort(kw_flat, kind="stable")  # doc order preserved
        refs[b] = ray.put(
            {
                "doc_ids": ids,
                "len_title": t.column("len_title").to_numpy().astype(np.float64),
                "len_content": t.column("len_content").to_numpy().astype(np.float64),
                "len_desc": t.column("len_desc").to_numpy().astype(np.float64),
                "quality": t.column("quality").to_numpy().astype(np.float64),
                "is_authority": np.asarray(
                    [x in AUTHORITY_DOMAINS for x in t.column("domain").to_pylist()],
                    dtype=bool,
                ),
                "kw_terms": kw_flat[kw_order],
                "kw_doc_ids": kw_docs[kw_order],
            }
        )
    return refs


def prune_index(index_dir: str, out_dir: str, max_postings: int) -> dict:
    """Write a statically pruned copy of ``index_dir`` to ``out_dir``.

    Returns metrics: per-shard and total postings before/after. The
    output is a complete index directory (manifest + segments) whose
    manifest points back at the parent's docstore, loadable by
    ``SearchEngine(out_dir)`` / the distributed serving path unchanged.
    """
    import ray
    import ray.data

    if max_postings <= 0:
        raise ValueError("max_postings must be positive")
    manifest = load_manifest(index_dir)
    codec = manifest.get("codec", "vbyte")
    cfg = manifest["config"]
    params = {
        "k1": float(cfg["bm25_params"]["k1"]),
        "b": float(cfg["bm25_params"]["b"]),
        "avgdl": float(manifest["stats"]["avgdl"]),
        "N": int(manifest["stats"]["total_docs"]),
        "w_title": float(cfg["field_weights"].get("title", 5.0)),
        "w_content": float(cfg["field_weights"].get("content", 1.0)),
        "w_desc": float(cfg["field_weights"].get("description", 3.0)),
        "w_keywords": float(cfg["field_weights"].get("keywords", 4.0)),
        "authority_boost": float(
            cfg["boost_factors"].get("domain_authority_boost", 1.2)
        ),
        "title_boost": float(cfg["boost_factors"].get("title_match_boost", 1.5)),
    }
    parent_docstore = manifest.get("docstore_dir") or os.path.join(
        os.path.abspath(index_dir), "docstore"
    )
    lens_refs = _bucket_lens_refs(parent_docstore)
    shard_dirs = sorted(glob.glob(os.path.join(index_dir, "segments", "shard=*")))

    def kern(batch: pa.Table) -> pa.Table:
        lens_cache: dict[int, tuple] = {}

        def lens_of_bucket(b: int):
            if b not in lens_cache:
                lens_cache[b] = ray.get(lens_refs[b])  # zero-copy plasma read
            return lens_cache[b]

        rows = []
        for d in batch.column("dir").to_pylist():
            shard = int(d.rsplit("=", 1)[1])
            files = sorted(glob.glob(os.path.join(d, "*.parquet")))
            t = pa.concat_tables([pq.read_table(p) for p in files])
            if "shard" not in t.column_names:  # hive layout stores it in the path
                t = t.append_column(
                    "shard", pa.array(np.full(t.num_rows, shard, np.int32))
                )
            t = t.select(TERMS_SCHEMA.names)
            pruned, before, after = prune_shard_table(
                t, shard, max_postings, codec, params, lens_of_bucket
            )
            sd = os.path.join(out_dir, "segments", f"shard={shard:05d}")
            os.makedirs(sd, exist_ok=True)
            # one file per bucket — the layout the readers glob
            # (bucket=*.parquet whole-index, bucket=J.parquet in
            # bucket-serving mode)
            buckets = pruned.column("bucket").to_numpy() if pruned.num_rows else []
            for b in sorted(set(int(x) for x in buckets)):
                part = pruned.filter(
                    pa.compute.equal(pruned.column("bucket"), b)
                ).drop_columns(["shard"])
                tmp = os.path.join(sd, f"_tmp_bucket={b:03d}.parquet")
                pq.write_table(part, tmp, compression="zstd")
                os.replace(tmp, os.path.join(sd, f"bucket={b:03d}.parquet"))
            rows.append(
                {"shard": shard, "postings_before": before, "postings_after": after}
            )
        return pa.Table.from_pylist(rows)

    stats = (
        ray.data.from_items(
            [{"dir": d} for d in shard_dirs], override_num_blocks=len(shard_dirs)
        )
        .map_batches(kern, batch_format="pyarrow")
        .take_all()
    )
    out_manifest = dict(manifest)
    out_manifest["docstore_dir"] = parent_docstore
    out_manifest["pruned"] = {
        "from": os.path.abspath(index_dir),
        "max_postings": max_postings,
        "impact": "engine single-term score: (idf*fscores + kw)*quality"
                  "*(1 + authority + title[tft>0])",
    }
    atomic_write_json(os.path.join(out_dir, "manifest.json"), out_manifest)
    return {
        "shards": stats,
        "postings_before": sum(r["postings_before"] for r in stats),
        "postings_after": sum(r["postings_after"] for r in stats),
    }


def fidelity_at_k(full_engine, pruned_engine, queries: list[str], k: int = 10) -> float:
    """Mean top-k overlap |full ∩ pruned| / k' across queries (k' =
    min(k, |full top-k|); queries where the full index returns nothing
    are skipped). The honest pruning-quality number."""
    overlaps = []
    for q in queries:
        full = [r["doc_id"] for r in full_engine.search(q, limit=k)["results"]]
        if not full:
            continue
        pr = {r["doc_id"] for r in pruned_engine.search(q, limit=k)["results"]}
        overlaps.append(len(pr.intersection(full)) / len(full))
    return float(np.mean(overlaps)) if overlaps else 1.0
