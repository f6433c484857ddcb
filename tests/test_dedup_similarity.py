"""Pytest oracles for the rows-only operators: MinHash-LSH near-dup vs
brute-force Jaccard, SimHash properties, fingerprint determinism,
similarity search vs exact numpy, multimodal stub plumbing, and
distributed-synth determinism."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from search_engine_core_ray.functions.similarity import (
    ann_topk,
    cosine_block,
    embedding_dupes,
)
from search_engine_core_ray.stages.dedup import (
    _shingle_hashes,
    exact_dedup,
    jaccard_pairs,
    minhash_near_dupes,
    minhash_signature,
    simhash64,
)
from search_engine_core_ray.stages.multimodal import (
    DecodeImage,
    ResizeImage,
    SampleFrames,
    synth_media_table,
)
from search_engine_core_ray.stages.textstats import doc_fingerprint

SF = "/root/testdata/sf0.001"


def _docs_table(texts):
    return pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )


def test_minhash_similarity_estimates_jaccard():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy")
    far = "completely different words everywhere now " * 10
    sh = _shingle_hashes([base, near, far])
    sig = [minhash_signature(s) for s in sh]
    est_near = (sig[0] == sig[1]).mean()
    est_far = (sig[0] == sig[2]).mean()
    true_near = jaccard_pairs({0: base, 1: near}, [(0, 1)])[0][2]
    assert abs(est_near - true_near) < 0.25  # unbiased estimator, 64 perms
    assert est_far < 0.2


def test_minhash_lsh_finds_brute_force_dupes(ray_session):
    # brute-force oracle on the sf0.001 documents
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    rows = ds.take_all()
    texts = {r["doc_id"]: r["text"] for r in rows}
    ids = sorted(texts)
    all_pairs = [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]
    brute = {
        (a, b): j for a, b, j in jaccard_pairs(texts, all_pairs) if j >= 0.5
    }
    got = minhash_near_dupes(ds, threshold=0.5)
    got_pairs = {(r["a"], r["b"]): r["jaccard"] for r in got.take_all()}
    # LSH with 16 bands of 4 rows: P(detect) at j=0.5 is ~0.67 per band
    # batch -> near 1 overall for j>=0.5; require high recall + exact
    # verification values
    missed = set(brute) - set(got_pairs)
    assert len(missed) <= max(1, len(brute) // 10), (len(brute), missed)
    for p, j in got_pairs.items():
        assert p in brute
        assert j == pytest.approx(brute[p], abs=1e-12)


def test_exact_dedup_survivors(ray_session):
    t = _docs_table(["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"])
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert len(out) == 3
    assert sorted(out["doc_id"]) == [0, 1, 3]  # min doc_id per content


def test_simhash_near_texts_close():
    base = "spark table join filter sort merge batch stream " * 8
    near = base.replace("sort", "order")
    far = "zzz yyy xxx www vvv uuu " * 8
    t = _docs_table([base, near, far])
    out = simhash64(t).to_pydict()
    h = out["simhash"]

    def hamming(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert hamming(h[0], h[1]) < 12
    assert hamming(h[0], h[2]) > 20


def test_fingerprint_order_sensitive_and_deterministic():
    t1 = _docs_table(["alpha beta gamma", "gamma beta alpha"])
    out1 = doc_fingerprint(t1).to_pydict()["fp"]
    assert out1[0] != out1[1]  # order matters
    out2 = doc_fingerprint(t1).to_pydict()["fp"]
    assert out1 == out2


def test_ann_topk_matches_numpy(ray_session):
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    out = ann_topk(ds, [0, 1], k=5).to_pandas()
    for qid in (0, 1):
        sims = cosine_block(m[ids == qid], m)[0]
        sims[ids == qid] = -np.inf
        # numpy oracle: top-5 by (cos desc, id asc)
        idx = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:5]
        expected = [int(ids[i]) for i in idx]
        got = out[out["query_id"] == qid].sort_values("rank")["neighbor_id"].tolist()
        assert got == expected


def test_embedding_dupes_threshold(ray_session):
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    out = embedding_dupes(ds, threshold=0.4).to_pandas()
    rows = ds.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    sims = cosine_block(m, m)
    exp = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(len(ids))
        if ids[j] > ids[i] and sims[i, j] >= 0.4
    }
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert got == exp


def test_multimodal_stub_plumbing(ray_session):
    t = synth_media_table(30, seed=5)
    ds = ray.data.from_arrow(t)
    feats = ds.map_batches(
        DecodeImage(fake=True), batch_format="pyarrow", batch_size=8
    ).to_pandas()
    assert len(feats) == 30
    assert all(len(f) == DecodeImage.FEATURE_DIM for f in feats["feature"])
    # deterministic
    feats2 = DecodeImage(fake=True)(t).to_pandas()
    assert np.array_equal(feats["feature"].tolist()[0], feats2["feature"].tolist()[0])
    resized = ResizeImage(fake=True)(t)
    assert resized.column("width").to_pylist() == [64] * 30
    frames = SampleFrames(n_frames=4, fake=True)(t)
    assert frames.num_rows == 30 * 4
    # the REAL decoder (round-2) decodes the PNG rows and rejects
    # non-PNG payloads loudly (tests/test_codecs_multimodal.py covers
    # the codec itself)
    imgs = t.filter(
        __import__("pyarrow").compute.equal(t.column("kind"), "image")
    )
    real = DecodeImage()(imgs)
    assert real.num_rows == imgs.num_rows
    with pytest.raises(ValueError):
        DecodeImage()(t)  # mixed kinds: audio/video payloads aren't PNG


def test_synth_ds_matches_partitioning(ray_session):
    """Distributed corpus generation is partition-invariant."""
    from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_ds

    cfg = SynthConfig(n_docs=100, seed=9)
    # sort by (url, warc_ts): re-crawl rows share the url, so url alone
    # leaves their order execution-dependent
    key = ["url", "warc_ts"]
    a = synth_pages_ds(cfg, blocks=2).to_pandas().sort_values(key, ignore_index=True)
    b = synth_pages_ds(cfg, blocks=16).to_pandas().sort_values(key, ignore_index=True)
    assert a.equals(b)


def test_synth_ds_roundtrip_extraction(ray_session):
    from search_engine_core_ray.corpus.synth import SynthConfig, synth_pages_ds
    from search_engine_core_ray.stages.extract import extract_page

    cfg = SynthConfig(n_docs=40, seed=3)
    for r in synth_pages_ds(cfg, blocks=4).take_all():
        got = extract_page(r["html"].decode(), r["url"])
        assert got["text"] == r["text"]


def test_minhash_matches_exact_ngram_pairs_sf(ray_session):
    """The distributed MinHash verify must reproduce the SQL-checked
    exact-Jaccard pair set over the driver's documents table (VERDICT
    round-1 'done' criterion for the scale-safe verify)."""
    import os

    from search_engine_core_ray.pipelines.catalog import QUERIES

    sf = os.environ.get("SECR_TEST_SF_DIR", "/root/testdata/sf0.001")
    exact = {
        (r["a"], r["b"]): r["jaccard"]
        for r in QUERIES["ngram_jaccard_pairs"](sf).take_all()
    }
    mh = {
        (r["a"], r["b"]): r["jaccard"]
        for r in QUERIES["minhash_dupes"](sf).take_all()
    }
    assert set(mh) == set(exact)
    for p, j in mh.items():
        assert j == pytest.approx(exact[p], abs=1e-4)  # exact side rounds to 4


def test_minhash_no_candidates(ray_session):
    """No shared shingles at all -> empty pair output, empty-safe
    through the pair-dedup groupby, join and verify groupby."""
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six seven",
        "red orange yellow green blue indigo",
    ]
    ds = ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    out = minhash_near_dupes(ds, threshold=0.5)
    assert out.take_all() == []


# ---- independent scalar oracles for the rows-only signature ops ----

def _oracle_simhash(text: str) -> int:
    """Scalar reimplementation sharing only the token hash kernel:
    per-token ±1 bit voting, built with ints and pow(), no numpy."""
    import re

    import polars as pl

    from search_engine_core_ray.stages.dedup import TOKEN_RE, _TOKEN_HASH_SEED

    toks = re.findall(TOKEN_RE, (text or "").lower())
    if not toks:
        return 0
    hashes = pl.Series(toks).hash(seed=_TOKEN_HASH_SEED).to_list()
    votes = [0] * 64
    for h in hashes:
        for b in range(64):
            votes[b] += 1 if (h >> b) & 1 else -1
    sig = 0
    for b in range(64):
        if votes[b] > 0:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_simhash_matches_independent_oracle():
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "completely different content about databases and indexes",
        "",
        "one",
        "Tie tie TIE tie words words",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    got = dict(zip(*(simhash64(t).to_pydict()[c] for c in ("doc_id", "simhash"))))
    for i, text in enumerate(texts):
        assert got[i] == _oracle_simhash(text), (i, text)


def _oracle_fingerprint(text: str) -> int:
    """Scalar reimplementation of the rolling polynomial hash with
    pow(base, i, mod) — independent of the pipeline's accumulator."""
    import hashlib
    import re

    from search_engine_core_ray.stages.textstats import TOKEN_RE

    MOD = (1 << 61) - 1
    BASE = 1_000_003
    toks = re.findall(TOKEN_RE, (text or "").lower())
    return sum(
        pow(BASE, i, MOD) * int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        for i, t in enumerate(toks)
    ) % MOD


def test_doc_fingerprint_matches_independent_oracle():
    from search_engine_core_ray.stages import textstats as ts

    texts = [
        "alpha beta gamma",
        "gamma beta alpha",   # order-sensitive: must differ from above
        "",
        "solo",
        "a b c d e f g h i j k l m n o p",
    ]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = ts.doc_fingerprint(t).to_pydict()
    got = dict(zip(out["doc_id"], out["fp"]))
    for i, text in enumerate(texts):
        assert got[i] == _oracle_fingerprint(text), (i, text)
    assert got[0] != got[1]  # order sensitivity


def test_ivf_full_probe_equals_exact(ray_session):
    """Probing every centroid makes IVF exact: identical ids AND cosines
    to the brute-force ann_topk baseline."""
    import os

    from search_engine_core_ray.functions.similarity import ann_topk, ivf_ann

    sf = os.environ.get("SECR_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    qids = [0, 1, 2]
    exact = {}
    for r in ann_topk(emb, qids, k=5).take_all():
        exact.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos"]))
    got = {}
    for r in ivf_ann(emb, qids, k=5, n_centroids=4, n_probe=4).take_all():
        got.setdefault(r["query_id"], []).append((r["neighbor_id"], r["cos"]))
    assert set(got) == set(exact)
    for q in exact:
        assert [n for n, _ in got[q]] == [n for n, _ in exact[q]], q
        for (gn, gc), (en, ec) in zip(got[q], exact[q]):
            assert gc == pytest.approx(ec, abs=1e-12)


def test_ivf_partial_probe_shape_and_recall(ray_session):
    import os

    from search_engine_core_ray.functions.similarity import ann_topk, ivf_ann

    sf = os.environ.get("SECR_TEST_SF_DIR", "/root/testdata/sf0.001")
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {}
    for r in ann_topk(emb, qids, k=10).take_all():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    rows = ivf_ann(emb, qids, k=10, n_centroids=8, n_probe=4).take_all()
    got = {}
    for r in rows:
        assert r["query_id"] in set(qids) and r["neighbor_id"] != r["query_id"]
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # half the buckets probed: expect meaningful (not perfect) recall
    hits = sum(len(got.get(q, set()) & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.3, hits / total


def test_lsh_ann_matches_independent_oracle(ray_session):
    """lsh_bucket_ann's planes are deterministic (seeded), so an
    independent scalar re-derivation pins it: every query's result must
    equal brute-force cosine top-k RESTRICTED to the query's LSH bucket
    (recomputed here from the same seed, no engine code)."""
    import collections

    from search_engine_core_ray.functions.similarity import (
        _LSH_PLANES_SEED,
        cosine_block,
        lsh_bucket_ann,
    )

    rng = np.random.RandomState(7)
    n, d, n_planes, k = 80, 8, 3, 5
    emb = rng.randn(n, d)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(list(range(n)), pa.int64()),
                "embedding": pa.array([e.tolist() for e in emb]),
            }
        )
    )
    qids = [0, 3, 17]
    got = lsh_bucket_ann(ds, qids, k=k, n_planes=n_planes).take_all()

    # independent oracle: same seeded planes, numpy only
    planes = np.random.RandomState(_LSH_PLANES_SEED).randn(n_planes, d)
    sig = (emb @ planes.T) > 0
    bucket = np.zeros(n, dtype=np.int64)
    for i in range(n_planes):
        bucket |= sig[:, i].astype(np.int64) << i

    by_q = collections.defaultdict(list)
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q[r["query_id"]].append((r["neighbor_id"], r["cos"]))
    assert set(by_q) == set(qids)
    for q in qids:
        members = np.flatnonzero(bucket == bucket[q])
        cands = members[members != q]
        sims = cosine_block(emb[[q]], emb[cands])[0]
        order = np.lexsort((cands, -sims))[:k]
        want = [(int(cands[i]), float(sims[i])) for i in order]
        assert [g[0] for g in by_q[q]] == [w[0] for w in want]
        for (gid, gc), (wid, wc) in zip(by_q[q], want):
            assert abs(gc - wc) < 1e-9


def test_near_dup_survivors_union_find_oracle(ray_session):
    """near_dup_survivors == union-find over the engine's own verified
    pair set, on a corpus with a transitive CHAIN (a~b, b~c, a!~c) so
    cluster-level semantics actually differ from pair-level."""
    from search_engine_core_ray.stages.dedup import (
        minhash_near_dupes,
        near_dup_survivors,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon").split()
    texts = {
        1: " ".join(base),
        2: " ".join(base[:18] + ["changed", "words"]),      # ~ 1
        3: " ".join(base[:15] + ["more", "different", "tail", "words", "here"]),  # ~ 2, maybe not ~1
        10: "completely unrelated content about ray data pipelines and arrow",
        11: "completely unrelated content about ray data pipelines and arrow",  # exact dup of 10
        20: "a singleton document with its own vocabulary entirely",
    }
    docs = pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)
    pair_rows = minhash_near_dupes(ds, threshold=0.5).take_all()
    pairs = {(r["a"], r["b"]) for r in pair_rows}
    assert (1, 2) in pairs and (10, 11) in pairs  # sanity: graph non-trivial

    # independent union-find over the same pair set
    parent = {d: d for d in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp: dict[int, list[int]] = {}
    for d in texts:
        comp.setdefault(find(d), []).append(d)
    want = sorted(min(members) for members in comp.values())

    got = sorted(
        r["doc_id"] for r in near_dup_survivors(ds, threshold=0.5).take_all()
    )
    assert got == want

def test_near_dup_survivors_nonconvergence_raises(ray_session):
    """An exhausted max_iters must raise, not silently keep extra
    survivors (round-3 review finding)."""
    from search_engine_core_ray.stages.dedup import near_dup_survivors

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(
                ["alpha beta gamma delta epsilon zeta eta theta",
                 "alpha beta gamma delta epsilon zeta eta theta"],
                pa.string(),
            ),
        }
    )
    with pytest.raises(RuntimeError, match="did not reach a fixed point"):
        near_dup_survivors(
            ray.data.from_arrow(docs), threshold=0.5, max_iters=0
        )


def test_simhash_md5_variant_matches_duckdb_hash_kernel():
    """The SQL-checkable variant: token hash == DuckDB's
    md5_number_lower (last 8 md5 bytes little-endian), same bit-voting
    machinery; scalar oracle built with hashlib + ints only."""
    import hashlib
    import re

    from search_engine_core_ray.stages.dedup import TOKEN_RE, simhash64

    texts = ["alpha beta beta", "", "one two three four", "alpha beta beta"]
    t = pa.table({"doc_id": list(range(len(texts))), "text": texts})
    out = simhash64(t, token_hash="md5").to_pydict()
    got = dict(zip(out["doc_id"], out["simhash"]))

    def oracle(text):
        toks = re.findall(TOKEN_RE, text.lower())
        if not toks:
            return 0
        votes = [0] * 64
        for tok in toks:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[8:16], "little")
            for b in range(64):
                votes[b] += 1 if (h >> b) & 1 else -1
        sig = sum(1 << b for b in range(64) if votes[b] > 0)
        return sig - (1 << 64) if sig >= (1 << 63) else sig

    for i, text in enumerate(texts):
        assert got[i] == oracle(text), (i, text)
    assert got[0] == got[3] and got[0] != got[2]


def test_minhash_attach_join_path_identical(ray_session):
    """The gated shingle-attach must give identical pairs on both
    tiers: map-side broadcast (default) and the reduced-table hash
    joins (forced with attach_byte_limit=0)."""
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    bcast = {
        (r["a"], r["b"]): round(r["jaccard"], 12)
        for r in minhash_near_dupes(ds, threshold=0.5).take_all()
    }
    joined = {
        (r["a"], r["b"]): round(r["jaccard"], 12)
        for r in minhash_near_dupes(
            ds, threshold=0.5, attach_byte_limit=0
        ).take_all()
    }
    assert bcast == joined and len(bcast) > 0


def test_incremental_dedup_paths_identical(ray_session):
    """Gated broadcast anti-join vs forced distributed left_anti give
    the same survivor set, and the injected boilerplate really drops
    rows (the entry is non-vacuous)."""
    from search_engine_core_ray.pipelines.catalog import QUERIES
    import ray.data
    import pyarrow as pa
    from search_engine_core_ray.stages.dedup import incremental_dedup, text_md5

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["incremental_dedup"](sf).take_all()
    got = sorted((r["text_md5"], r["doc_id"]) for r in rows)
    n_shard = 100
    assert 0 < len(got) < n_shard  # drops happened

    # rebuild the same inputs and force the distributed tier
    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])

    def dirty(b):
        ids = b.column("doc_id").to_pylist()
        texts = b.column("text").to_pylist()
        out = [
            f"boilerplate page {i % 3}" if i % 11 == 0
            else f"shard-only boilerplate {i % 2}" if i % 5 == 4 and i % 7 == 3
            else t
            for i, t in zip(ids, texts)
        ]
        return b.set_column(
            b.schema.get_field_index("text"), "text", pa.array(out, pa.string())
        )

    def keep(pred):
        return lambda b: b.filter(
            pa.array([pred(i) for i in b.column("doc_id").to_pylist()])
        )

    dirtied = docs.map_batches(dirty, batch_format="pyarrow")
    shard = dirtied.map_batches(keep(lambda i: i % 5 == 4), batch_format="pyarrow")
    corpus = dirtied.map_batches(
        keep(lambda i: i % 5 != 4), batch_format="pyarrow"
    ).map_batches(lambda b: text_md5(b).select(["text_md5"]), batch_format="pyarrow")
    forced = incremental_dedup(shard, corpus, broadcast_limit=0).take_all()
    assert sorted((r["text_md5"], r["doc_id"]) for r in forced) == got


def test_incremental_minhash_paths_identical(ray_session):
    """Broadcast attach + gated anti-join vs forced hash-join tiers
    give identical shard survivors, and the entry is non-vacuous
    (shard docs with corpus near-twins really drop)."""
    import pyarrow as pa
    import ray.data
    from search_engine_core_ray.pipelines.catalog import QUERIES
    from search_engine_core_ray.stages.dedup import (
        doc_shingles,
        incremental_minhash_dedup,
        minhash_bands,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(r["doc_id"] for r in QUERIES["incremental_minhash_dedup"](sf).take_all())
    assert 0 < len(got) < 100  # some of the 100 shard docs dropped

    docs = ray.data.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])

    def keep(pred):
        return lambda b: b.filter(
            pa.array([pred(i) for i in b.column("doc_id").to_pylist()])
        )

    shard = docs.map_batches(keep(lambda i: i % 5 == 4), batch_format="pyarrow")
    corpus = docs.map_batches(keep(lambda i: i % 5 != 4), batch_format="pyarrow")
    forced = incremental_minhash_dedup(
        shard,
        corpus.map_batches(lambda b: minhash_bands(b, 3, "md5"), batch_format="pyarrow"),
        corpus.map_batches(lambda b: doc_shingles(b, 3, "md5"), batch_format="pyarrow"),
        threshold=0.5,
        token_hash="md5",
        attach_byte_limit=0,
        broadcast_limit=0,
    )
    assert sorted(r["doc_id"] for r in forced.take_all()) == got


def test_simhash_near_dupes_paths_identical(ray_session):
    """Broadcast vs hash-join signature attach give identical pairs,
    and the hamming<=3 pair set is non-empty on the synth corpus."""
    import ray.data
    from search_engine_core_ray.stages.dedup import simhash_near_dupes

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    a = simhash_near_dupes(docs, max_hamming=3, token_hash="md5").take_all()
    b = simhash_near_dupes(
        docs, max_hamming=3, token_hash="md5", broadcast_limit=0
    ).take_all()
    key = lambda r: (r["a"], r["b"])
    a, b = sorted(a, key=key), sorted(b, key=key)
    assert len(a) > 0
    assert [(r["a"], r["b"], r["hamming"]) for r in a] == [
        (r["a"], r["b"], r["hamming"]) for r in b
    ]


def test_gram_matrix_matches_numpy_and_is_psd(ray_session):
    """gram_matrix == numpy X^T X on the quantized coordinates (exact),
    and the reconstructed full matrix is symmetric PSD with a positive
    diagonal — i.e. it really is a second-moment matrix, not vacuous."""
    import pyarrow.parquet as pq

    from search_engine_core_ray.functions.similarity import gram_matrix
    from search_engine_core_ray.stages.textstats import round_half_away

    sf = "/root/testdata/sf0.001"
    out = gram_matrix(
        ray.data.read_parquet(f"{sf}/embeddings.parquet"), scale=1_000_000
    ).to_pandas()

    t = pq.read_table(f"{sf}/embeddings.parquet")
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = round_half_away(x * 1e6, 0).astype(np.int64)
    g_ref = (q.T @ q).astype(np.float64) / 1e12

    d = x.shape[1]
    assert len(out) == d * (d + 1) // 2
    full = np.zeros((d, d))
    ii = out["i"].to_numpy()
    jj = out["j"].to_numpy()
    full[ii, jj] = out["gram"].to_numpy()
    full[jj, ii] = out["gram"].to_numpy()
    assert (full == np.where(np.ones((d, d)), g_ref, 0)).all()
    assert (np.diag(full) > 0).all()
    assert np.linalg.eigvalsh(full).min() > -1e-6


def test_cooccurrence_pmi_tiers_identical_and_nonvacuous(ray_session):
    """Broadcast vs distributed-hash-join unigram attach give identical
    (a, b, c_ab, pmi) rows, and the synth corpus actually produces
    pairs above min_count with varying PMI (non-vacuity)."""
    from search_engine_core_ray.stages.textstats import cooccurrence_pmi

    docs = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    key = lambda r: (r["a"], r["b"])
    got = sorted(cooccurrence_pmi(docs).take_all(), key=key)
    forced = sorted(
        cooccurrence_pmi(docs, broadcast_limit=0).take_all(), key=key
    )
    assert len(got) > 100  # real pair mass, not a trivial handful
    assert got == forced
    pmis = {r["pmi"] for r in got}
    assert len(pmis) > 10  # PMI varies — the statistic is informative


def test_embedding_dim_stats_matches_numpy(ray_session):
    """dim stats equal numpy moments computed on the quantized
    coordinates (exact), and variance is strictly positive on real
    embedding data."""
    import pyarrow.parquet as pq

    from search_engine_core_ray.functions.similarity import embedding_dim_stats
    from search_engine_core_ray.stages.textstats import round_half_away

    sf = "/root/testdata/sf0.001"
    out = (
        embedding_dim_stats(
            ray.data.read_parquet(f"{sf}/embeddings.parquet"), scale=1_000_000
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    t = pq.read_table(f"{sf}/embeddings.parquet")
    x = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    q = round_half_away(x * 1e6, 0).astype(object)  # exact big-int math
    n = q.shape[0]
    for k in range(q.shape[1]):
        col = [int(v) for v in q[:, k]]
        s, ss = sum(col), sum(v * v for v in col)
        assert out["n"][k] == n
        assert out["mean"][k] == float(s) / float(n * 10**6)
        assert out["var_pop"][k] == float(n * ss - s * s) / float(n * n * 10**12)
    assert (out["var_pop"] > 0).all()


def test_related_docs_tiers_identical(ray_session):
    """tfidf_related_docs with broadcast joins vs forced distributed
    hash joins produce identical (doc, neighbor, rnk, cos) rows, and
    the cut is non-vacuous (full k for docs with enough neighbors,
    multiple distinct cosine levels)."""
    import __ray_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    a = (
        entrymod.queries()["related_docs_topk"](sf)
        .to_pandas()
        .sort_values(["doc_id", "rnk"], ignore_index=True)
    )
    # forced-distributed twin: same injection, broadcast_limit=0
    import pyarrow.parquet as pq

    import polars as pl_

    from search_engine_core_ray.stages.textstats import tfidf_related_docs

    n_docs = pq.read_metadata(f"{sf}/documents.parquet").num_rows

    def inject(b):
        t = pl_.from_arrow(b.select(["doc_id", "text"]))
        return t.with_columns(
            pl_.format(
                "{} tag{} tag{}",
                pl_.col("text").fill_null(""),
                pl_.col("doc_id") % 97,
                (pl_.col("doc_id") * 31) % 97,
            ).alias("text")
        ).to_arrow()

    docs = ray.data.read_parquet(
        f"{sf}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(inject, batch_format="pyarrow")
    b = (
        tfidf_related_docs(docs, n_docs, k=5, broadcast_limit=0)
        .to_pandas()
        .sort_values(["doc_id", "rnk"], ignore_index=True)
    )
    assert len(a) > 0 and a["doc_id"].nunique() == n_docs
    assert a["cos"].nunique() > 3
    assert a.equals(b)
