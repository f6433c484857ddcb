"""Independent scalar oracles for the training-data layout operators:
sequence packing (GPT-style span map), SemDeDup, and the corpus
trigram-LM familiarity score.  Each oracle is a from-scratch pure
Python/numpy replay — no shared code with the pipeline kernels beyond
the public regex constant."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from search_engine_core_ray.stages.packing import pack_sequences
from search_engine_core_ray.stages.textstats import BPE_RE, lm_familiarity
from search_engine_core_ray.functions.similarity import semdedup

SEQ_LEN = 64

TEXTS = [
    "the quick brown fox jumps over the lazy dog " * 7,
    "",  # EOS-only doc
    "short one",
    "it's a contraction-heavy text, isn't it? they're all here! " * 5,
    "числа 123 and symbols #$% mixed in " * 11,
    "x",
    "tail doc with a moderately long body of plain words " * 3,
]


def _docs_ds(ray):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
                "text": pa.array(TEXTS, pa.string()),
            }
        )
    ).repartition(3)


def _oracle_spans(texts, seq_len):
    pat = re.compile(BPE_RE)
    rows = []
    start = 0
    for did, t in enumerate(texts):
        n = len(pat.findall(t)) + 1  # EOS
        for seq in range(start // seq_len, (start + n - 1) // seq_len + 1):
            cs = seq * seq_len
            a = max(start, cs)
            b = min(start + n, cs + seq_len)
            rows.append((did, seq, a - cs, a - start, b - a))
        start += n
    return rows


def test_pack_sequences_matches_scalar_oracle(ray_session):
    out = pack_sequences(_docs_ds(ray_session), seq_len=SEQ_LEN).to_pandas()
    got = sorted(map(tuple, out.to_numpy().tolist()))
    want = sorted(_oracle_spans(TEXTS, SEQ_LEN))
    assert got == want


def test_pack_sequences_invariants(ray_session):
    out = pack_sequences(_docs_ds(ray_session), seq_len=SEQ_LEN).to_pandas()
    # every doc's chunks cover exactly its token stream, in order
    pat = re.compile(BPE_RE)
    for did, g in out.groupby("doc_id"):
        g = g.sort_values("doc_off")
        n = len(pat.findall(TEXTS[did])) + 1
        assert g["len"].sum() == n
        assert g["doc_off"].iloc[0] == 0
        assert (g["doc_off"] + g["len"]).iloc[-1] == n
        # chunks are contiguous in doc space
        assert (
            g["doc_off"].iloc[1:].to_numpy()
            == (g["doc_off"] + g["len"]).iloc[:-1].to_numpy()
        ).all()
    # every sequence except the last is exactly full
    per_seq = out.groupby("seq_id")["len"].sum()
    assert (per_seq.iloc[:-1] == SEQ_LEN).all()
    assert 0 < per_seq.iloc[-1] <= SEQ_LEN
    # inside a sequence, chunk spans never overlap
    for _, g in out.groupby("seq_id"):
        g = g.sort_values("seq_off")
        assert (
            g["seq_off"].iloc[1:].to_numpy()
            >= (g["seq_off"] + g["len"]).iloc[:-1].to_numpy()
        ).all()


def _emb_ds(ray):
    import ray.data

    return ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_semdedup_matches_scalar_oracle(ray_session):
    import pyarrow.parquet as pq

    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    ids = tbl.column("vec_id").to_numpy()
    m = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    g = m / norms
    tau, k = 0.4, 8
    cmat = g[np.searchsorted(ids, np.arange(k))]
    cluster = np.argmax(g @ cmat.T, axis=1)
    kept = {}
    for c in range(k):
        members = ids[cluster == c]
        gm = g[cluster == c]
        for i, v in enumerate(members):
            dup = any(
                gm[j] @ gm[i] >= tau for j in range(i) if members[j] < v
            )
            kept[int(v)] = 0 if dup else 1

    out = semdedup(_emb_ds(ray_session), n_clusters=k, threshold=tau).to_pandas()
    assert len(out) == len(ids)
    for _, r in out.iterrows():
        assert kept[int(r["vec_id"])] == int(r["kept"]), int(r["vec_id"])
        assert cluster[np.searchsorted(ids, r["vec_id"])] == r["cluster_id"]
    # the lowest vec_id of every cluster always survives
    low = out.loc[out.groupby("cluster_id")["vec_id"].idxmin()]
    assert (low["kept"] == 1).all()


def test_lm_familiarity_matches_scalar_oracle(ray_session):
    import ray.data

    texts = [
        "aaab aaab aaab",
        "zzz qqq unique glyphs",
        "aa",  # shorter than a trigram
        "",
        "ünïcødé smörgåsbord ünïcødé",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)

    model = Counter()
    for t in texts:
        for i in range(len(t) - 2):
            model[t[i : i + 3]] += 1

    out = lm_familiarity(ds).to_pandas().set_index("doc_id").sort_index()
    for did, t in enumerate(texts):
        tris = [t[i : i + 3] for i in range(len(t) - 2)]
        assert out.loc[did, "n_tri"] == len(tris)
        assert out.loc[did, "fam_sum"] == sum(model[x] for x in tris)
        want_avg = (sum(model[x] for x in tris) / len(tris)) if tris else 0.0
        assert out.loc[did, "fam_avg"] == want_avg
    # the all-unique-glyph doc is the least familiar of the non-empty docs
    nonempty = out[out["n_tri"] > 0]
    assert nonempty["fam_avg"].idxmin() == 1


def test_dup_ngram_stats_matches_scalar_oracle(ray_session):
    import ray.data

    from search_engine_core_ray.stages.dedup import dup_ngram_stats

    base = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    texts = [
        base + " iota kappa",            # shares windows with doc 1
        base + " iota different tail",   # overlap with doc 0
        "totally unique words here that nobody else repeats anywhere at all",
        base + " " + base,               # self-repetition counts too
        "tiny",                          # < 8 tokens -> zero windows
        "",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)

    n = 8
    tok = [re.findall(r"[a-z0-9]{2,}", t.lower()) for t in texts]
    wins = [
        [" ".join(tk[i : i + n]) for i in range(len(tk) - n + 1)] for tk in tok
    ]
    corpus = Counter(w for ws in wins for w in ws)
    out = (
        dup_ngram_stats(ds, n=n).to_pandas().set_index("doc_id").sort_index()
    )
    assert len(out) == len(texts)
    for did, ws in enumerate(wins):
        dup = sum(1 for w in ws if corpus[w] >= 2)
        assert out.loc[did, "n_win"] == len(ws)
        assert out.loc[did, "dup_win"] == dup
        want = dup / len(ws) if ws else 0.0
        assert out.loc[did, "dup_frac"] == want
    # sanity on the fixture itself: both directions exercised
    assert out["dup_win"].sum() > 0 and (out["dup_win"] == 0).any()


def test_rep_signals_matches_scalar_oracle(ray_session):
    import ray.data

    from search_engine_core_ray.stages.textstats import rep_signals

    texts = [
        "alpha beta\nalpha beta\n  alpha beta \nunique line",  # dup lines (trim folds)
        "spam spam spam spam spam",                            # one dominant 2-gram
        "a mix of words without any repeats at all",
        "",
        "\n\n   \n\t\n",                                       # only blank lines
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(2)

    out = (
        ds.map_batches(rep_signals, batch_format="pyarrow")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    for did, t in enumerate(texts):
        lines = [l.strip(" \t") for l in t.split("\n")]
        lines = [l for l in lines if l]
        tk = re.findall(r"[a-z0-9]{2,}", t.lower())
        grams = Counter(" ".join(tk[i : i + 2]) for i in range(len(tk) - 1))
        assert out.loc[did, "n_lines"] == len(lines)
        want_dlf = (len(lines) - len(set(lines))) / len(lines) if lines else 0.0
        assert out.loc[did, "dup_line_frac"] == want_dlf
        assert out.loc[did, "n_2grams"] == sum(grams.values())
        assert out.loc[did, "top_2gram_cnt"] == (max(grams.values()) if grams else 0)
        want_tgf = max(grams.values()) / sum(grams.values()) if grams else 0.0
        assert out.loc[did, "top2gram_frac"] == want_tgf
    # fixture sanity: both signals fire somewhere
    assert out["dup_line_frac"].max() > 0 and out["top2gram_frac"].max() > 0.5


def test_lm_familiarity_big_vocab_tier_identical(ray_session):
    """The cardinality-gated big-vocab tier (distributed join scoring,
    forced with vocab_broadcast_limit=0) must be value-identical to
    the broadcast tier on a synthetic wide-vocab corpus."""
    import ray.data

    rng = np.random.default_rng(11)
    # wide vocab: random unicode-ish codepoints -> thousands of
    # distinct trigrams over a few docs, plus degenerate docs
    alphabet = [chr(c) for c in rng.integers(0x61, 0x2FFF, 400)]
    texts = [
        "".join(rng.choice(alphabet, rng.integers(3, 300))) for _ in range(40)
    ] + ["", "ab", "aaaaaa"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)

    bcast = lm_familiarity(ds).to_pandas().set_index("doc_id").sort_index()
    big = (
        lm_familiarity(ds, vocab_broadcast_limit=0)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(bcast.columns) == list(big.columns)
    assert len(bcast) == len(big) == len(texts)
    for col in ("n_tri", "fam_sum", "fam_avg"):
        assert bcast[col].tolist() == big[col].tolist(), col


def test_semdedup_kmeans_production_path(ray_session):
    """kmeans=True (seeded Lloyd centroids, sqrt(N) sizing) is the
    production configuration; the det path (centroids = low vec_ids)
    exists for the SQL gate. Same dedup rule, so keep-rates on the
    synth corpus must be close, every row accounted for, and the
    lowest vec_id of every cluster always kept."""
    import ray.data

    from search_engine_core_ray.functions.similarity import semdedup

    ds = ray.data.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = ds.count()

    det = semdedup(ds, n_clusters=8, threshold=0.4).to_pandas()
    km = semdedup(ds, n_clusters=None, threshold=0.4, kmeans=True).to_pandas()

    assert len(det) == len(km) == n
    assert int(np.sqrt(n)) >= km["cluster_id"].nunique() > 1
    low = km.loc[km.groupby("cluster_id")["vec_id"].idxmin()]
    assert (low["kept"] == 1).all()
    # same rule, different partitions: keep-rates must be in the same
    # band (clustering only changes which pairs are co-clustered;
    # finer clusters can only keep MORE)
    det_rate = det["kept"].mean()
    km_rate = km["kept"].mean()
    assert km_rate >= det_rate - 0.02
    assert abs(km_rate - det_rate) < 0.15, (det_rate, km_rate)


def test_familiarity_buckets_properties(ray_session):
    """Distributed NTILE sanity independent of the SQL oracle: sizes
    differ by at most 1, every doc appears once, and bucket boundaries
    respect the (fam_avg DESC, doc_id ASC) order."""
    import ray.data

    from search_engine_core_ray.stages.textstats import familiarity_buckets

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).repartition(5)
    out = familiarity_buckets(ds, n_buckets=3).to_pandas()
    n = len(out)
    assert out["doc_id"].nunique() == n
    sizes = out.groupby("bucket").size()
    assert sorted(sizes.index) == [1, 2, 3]
    assert sizes.max() - sizes.min() <= 1
    srt = out.sort_values(["fam_avg", "doc_id"], ascending=[False, True])
    assert srt["bucket"].is_monotonic_increasing
    assert set(out["label"]) == {"head", "middle", "tail"}
    # head really is the most familiar tercile
    assert (
        out[out["label"] == "head"]["fam_avg"].min()
        >= out[out["label"] == "tail"]["fam_avg"].max()
    )


# ----------------------------------------------------------------------
# chunk_windows (sliding-window chunking)
# ----------------------------------------------------------------------

def _oracle_chunks(texts, window, stride):
    rows = []
    for did, t in enumerate(texts):
        toks = (t or "").split()
        n = len(toks)
        if n == 0:
            continue
        start = 0
        while True:
            ln = min(window, n - start)
            rows.append((did, start // stride, start, ln, " ".join(toks[start:start + ln])))
            if start + window >= n:
                break
            start += stride
    return rows


def test_chunk_windows_matches_scalar_oracle(ray_session):
    from search_engine_core_ray.stages.packing import chunk_windows

    texts = list(TEXTS) + [None]  # null text must behave like empty
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = chunk_windows(ds, window=16, stride=12).to_pandas()
    got = sorted(map(tuple, out.itertuples(index=False)))
    want = sorted(_oracle_chunks(texts, 16, 12))
    assert got == want


def test_chunk_windows_invariants(ray_session):
    from search_engine_core_ray.stages.packing import chunk_windows

    out = chunk_windows(_docs_ds(ray_session), window=16, stride=12).to_pandas()
    # the corpus genuinely exercises multi-chunk docs AND 1-chunk docs
    per_doc = out.groupby("doc_id").size()
    assert per_doc.max() >= 3 and per_doc.min() == 1
    for _, r in out.iterrows():
        assert r["tok_start"] == r["chunk_id"] * 12
        assert 1 <= r["tok_len"] <= 16
        assert len(r["chunk_text"].split()) == r["tok_len"]
    # consecutive chunks of one doc overlap by window - stride tokens
    multi = out[out["doc_id"].isin(per_doc[per_doc > 1].index)]
    for did, g in multi.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        ids = g["chunk_id"].tolist()
        assert ids == list(range(len(ids)))  # dense, stop-at-end rule
        rows = list(g.itertuples(index=False))
        for a, b in zip(rows, rows[1:]):
            a_toks = a.chunk_text.split()
            b_toks = b.chunk_text.split()
            ov = a.tok_start + a.tok_len - b.tok_start
            if ov > 0:
                assert a_toks[-ov:] == b_toks[:ov]
        # final chunk reaches the end; the previous one did not
        last = rows[-1]
        assert last.tok_start + 16 >= last.tok_start + last.tok_len
        if len(rows) > 1:
            n_tok = last.tok_start + last.tok_len
            assert rows[-2].tok_start + 16 < n_tok
    # empty doc (doc_id 1) emits nothing
    assert 1 not in set(out["doc_id"])


def test_chunk_windows_rejects_bad_stride(ray_session):
    from search_engine_core_ray.stages.packing import chunk_windows

    with pytest.raises(ValueError):
        chunk_windows(_docs_ds(ray_session), window=8, stride=9)
    with pytest.raises(ValueError):
        chunk_windows(_docs_ds(ray_session), window=8, stride=0)


# ----------------------------------------------------------------------
# epoch_shuffle (deterministic global training order)
# ----------------------------------------------------------------------

def _ids_ds(ray, n=101, parts=4):
    import ray.data

    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(n), pa.int64())})
    ).repartition(parts)


def test_epoch_shuffle_matches_numpy_oracle(ray_session):
    from search_engine_core_ray.stages.packing import KNUTH, epoch_shuffle

    n, seed = 101, 5
    out = (
        epoch_shuffle(_ids_ds(ray_session, n), seed=seed)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    ids = np.arange(n, dtype=np.uint64)
    h = ((ids + np.uint64(seed)) % np.uint64(2**32)) * np.uint64(KNUTH)
    h %= np.uint64(2**32)
    # rank under (h, doc_id): h values are distinct here, argsort suffices
    order = np.argsort(h, kind="stable")
    pos = np.empty(n, dtype=np.int64)
    pos[order] = np.arange(1, n + 1)
    assert out["position"].tolist() == pos.tolist()


def test_epoch_shuffle_is_scrambled_permutation(ray_session):
    from search_engine_core_ray.stages.packing import epoch_shuffle

    n = 101
    a = epoch_shuffle(_ids_ds(ray_session, n), seed=0).to_pandas()
    assert sorted(a["position"]) == list(range(1, n + 1))  # permutation
    srt = a.sort_values("doc_id")["position"].tolist()
    assert srt != list(range(1, n + 1))  # genuinely scrambled
    b = epoch_shuffle(_ids_ds(ray_session, n), seed=1).to_pandas()
    assert b.sort_values("doc_id")["position"].tolist() != srt  # new epoch
    # reproducible: same seed, different partitioning, same order
    c = epoch_shuffle(_ids_ds(ray_session, n, parts=7), seed=0).to_pandas()
    assert c.sort_values("doc_id")["position"].tolist() == srt


# ----------------------------------------------------------------------
# winnow_fingerprints (MOSS robust winnowing)
# ----------------------------------------------------------------------

def _winnow_scalar(text, k=4, w=4):
    import hashlib
    import re as _re

    from search_engine_core_ray.stages.textstats import _WIN_MOD, _WIN_POW

    toks = _re.findall(r"[a-z0-9]{2,}", (text or "").lower())
    n = len(toks)
    if n < k:
        return set()
    hs = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:4], "big") % _WIN_MOD
        for t in toks
    ]
    grams = [
        sum(hs[i + j] * _WIN_POW[j] for j in range(k)) % _WIN_MOD
        for i in range(n - k + 1)
    ]
    we = min(w, len(grams))
    sel = set()
    for t in range(len(grams) - we + 1):
        win = grams[t : t + we]
        mn = min(win)
        # rightmost index attaining the window min
        idx = max(i for i, g in enumerate(win) if g == mn)
        sel.add((t + idx + 1, grams[t + idx]))
    return sel


def test_winnow_matches_scalar_oracle(ray_session):
    import ray.data

    from search_engine_core_ray.stages.textstats import winnow_fingerprints

    texts = list(TEXTS) + [None, "just three toks"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = ds.map_batches(winnow_fingerprints, batch_format="pyarrow").to_pandas()
    for did, t in enumerate(texts):
        got = set(
            map(tuple, out[out.doc_id == did][["pos", "fp"]].itertuples(index=False))
        )
        assert got == _winnow_scalar(t), f"doc {did}"


def test_winnow_substring_guarantee_and_density(ray_session):
    """The paper's guarantee: two docs sharing a token run of length
    >= w + k - 1 share at least one selected fingerprint; density of
    selected positions is around 2/(w+1)."""
    shared = "alpha bravo charlie delta echo foxtrot golf"  # 7 = w+k-1 tokens
    a = "unrelated prefix words here " + shared + " and a suffix tail"
    b = "totally different beginning text " + shared + " other ending words"
    fa = {fp for _, fp in _winnow_scalar(a)}
    fb = {fp for _, fp in _winnow_scalar(b)}
    assert fa & fb, "shared 7-token run must share a fingerprint"
    long = " ".join(f"tok{i * 37 % 101}x" for i in range(400))
    sel = _winnow_scalar(long)
    density = len({p for p, _ in sel}) / (400 - 4 + 1)
    assert 0.25 < density < 0.55  # 2/(w+1) = 0.4 expected


def test_winnow_overlap_pairs_fixture(ray_session):
    import ray.data

    from search_engine_core_ray.stages.dedup import winnow_overlap_pairs

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    boiler = "standard footer words repeated on every single page here now"
    texts = [
        "unique start one " + shared + " ending one two",          # 0
        "different opening here " + shared + " other tail words",  # 1
        "nothing in common with anybody else at all truly",        # 2
        boiler + " page three unique content body text",           # 3
        boiler + " page four distinct content body words",         # 4
        boiler + " page five other content body tokens",           # 5
        boiler + " page six more content body phrases",            # 6
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = winnow_overlap_pairs(ds, min_shared=2, max_fp_df=10).to_pandas()
    pairs = set(map(tuple, out[["a", "b"]].itertuples(index=False)))
    assert (0, 1) in pairs  # long shared run -> containment pair
    assert not any(2 in p for p in pairs)  # unique doc pairs with nobody
    # boilerplate cap: fps shared by all 4 footer docs exceed max_fp_df=3
    capped = winnow_overlap_pairs(ds, min_shared=1, max_fp_df=3).to_pandas()
    cpairs = set(map(tuple, capped[["a", "b"]].itertuples(index=False)))
    boiler_pairs = {(a, b) for a in (3, 4, 5, 6) for b in (3, 4, 5, 6) if a < b}
    assert not (cpairs & boiler_pairs)  # footer fps dropped by the cap
    uncapped = winnow_overlap_pairs(ds, min_shared=1, max_fp_df=10).to_pandas()
    upairs = set(map(tuple, uncapped[["a", "b"]].itertuples(index=False)))
    assert cpairs <= upairs and (upairs & boiler_pairs)  # cap is the only cause


def test_winnow_overlap_pairs_no_shared_fps(ray_session):
    """A corpus with zero shared fingerprints must return a typed empty
    result, not crash the fp self-join on schema-less blocks."""
    import ray.data

    from search_engine_core_ray.stages.dedup import winnow_overlap_pairs

    texts = [
        "alpha beta gamma delta epsilon",
        "zeta eta theta iota kappa",
        "lam mu nu xi omicron",
        "pi rho sigma tau upsilon",
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    ).repartition(3)
    out = winnow_overlap_pairs(ds)
    assert out.count() == 0
    # schema asserted on the Dataset: an empty Dataset loses its
    # columns through to_pandas (known Ray behavior, noted in catalog)
    assert out.schema().names == ["a", "b", "shared"]


@pytest.mark.parametrize(
    "n_tok,window,stride,want_chunks",
    [
        (16, 16, 12, 1),   # exactly one window
        (17, 16, 12, 2),   # one token over -> second (short) chunk
        (28, 16, 12, 2),   # second chunk exactly reaches the end
        (29, 16, 12, 3),
        (32, 16, 16, 2),   # stride == window: disjoint tiling
        (33, 16, 16, 3),
        (3, 4, 4, 0),      # fewer tokens than a window... but >= 1 token
    ],
)
def test_chunk_windows_boundaries(ray_session, n_tok, window, stride, want_chunks):
    import ray.data

    from search_engine_core_ray.stages.packing import chunk_windows

    text = " ".join(f"w{i}" for i in range(n_tok))
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text], pa.string())})
    )
    out = chunk_windows(ds, window=window, stride=stride).to_pandas()
    if want_chunks == 0:
        # docs shorter than one window still emit ONE chunk (their
        # whole token stream) as long as they have >= 1 token
        want_chunks = 1
    assert len(out) == want_chunks
    out = out.sort_values("chunk_id")
    # full coverage, in order, ending exactly at n_tok
    assert out["tok_start"].iloc[0] == 0
    assert (out["tok_start"] + out["tok_len"]).iloc[-1] == n_tok
    toks = text.split()
    for _, r in out.iterrows():
        assert r["chunk_text"] == " ".join(
            toks[r["tok_start"] : r["tok_start"] + r["tok_len"]]
        )
