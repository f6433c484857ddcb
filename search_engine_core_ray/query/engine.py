"""The BM25 top-k query engine over the sharded inverted index.

One ``SearchEngine`` instance = one opened index: manifest + corpus
stats, per-shard term dictionaries (``index/segments.ShardReader``) and
the in-memory forward index (docstore arrays sorted by doc_id). Query
actors hold an instance each — the SearchClient connection-pool pattern
(src/search_core/SearchClient.cpp:12-51) with segment readers as state.

Execution of one query:
1. parse (query/parser) -> AST.
2. retrieval: set algebra over decoded posting lists — And = sorted
   intersection, Or = sorted union, phrase = token-AND then substring
   verify, Filter = precomputed metadata posting list (domain/lang).
   Semantics per query/plan docstring.
3. scoring: vectorized numpy BM25 over the candidate array, with the
   reference's exact formula chain (see scoring/oracle.py docstring for
   the file:line inventory) — rank-identical to the oracle.
4. min-score filter, min-max normalize, sort by (-score, doc_id),
   offset/limit; snippet = first 200 chars + "..."
   (RedisSearchStorage.cpp:286-288).

``search_topk_wand`` is the scale path for pure term queries: block-max
WAND pruning with a bounded min-heap over EXACT per-block score bounds
(``np.maximum.reduceat`` of the cached posting-aligned field scores —
see ``_term_block_bounds`` for why the stored max-tf metadata bound is
too loose to ever fire under BM25 tf saturation) — it returns the same
top-k doc_ids as the fidelity path (asserted in tests) without scoring
every candidate; raw (pre-normalization) scores.
"""

from __future__ import annotations

import heapq
import os
import string

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.analyzers import analyze
from ..index.build import load_manifest
from ..index.segments import BLOCK_SIZE, ShardReader, shard_of_term
from ..query.parser import And, Filter, Or, Term, parse_query
from ..query.plan import exact_phrases, normalize_filter_field, scoring_terms
from ..scoring.config import AUTHORITY_DOMAINS, ScoringConfig

_ASCII_LOWER = str.maketrans(string.ascii_uppercase, string.ascii_lowercase)


def _lower(s: str) -> str:
    return s.translate(_ASCII_LOWER)


def _slice_offset(view: np.ndarray, base: np.ndarray) -> int | None:
    """-> k such that ``view`` IS the contiguous slice ``base[k:k+len
    (view)]`` (same buffer, verified by pointer arithmetic +
    shares_memory), else None. Lets the scorer index its cached
    posting-aligned arrays directly when the two-phase top-k hands it
    a slice of a term's posting array, skipping the candidates→
    postings binary search entirely."""
    if (
        view is base
        or view.base is None
        or view.dtype != base.dtype
        or view.strides != (base.itemsize,)
        or base.strides != (base.itemsize,)
        or not np.shares_memory(view, base)
    ):
        return None
    delta = view.__array_interface__["data"][0] - base.__array_interface__["data"][0]
    if delta < 0 or delta % base.itemsize:
        return None
    off = delta // base.itemsize
    if off + len(view) > len(base):
        return None
    return int(off)


def build_highlighter(terms: list[str]):
    """-> callable wrapping each whole-token query-term occurrence in
    RediSearch's default ``<b>``/``</b>`` tags, case-insensitively —
    what FT.SEARCH ... HIGHLIGHT FIELDS 2 title content returns
    (RedisSearchStorage.cpp:254-261); None when there are no terms."""
    import re

    toks = sorted({t for t in terms if t}, key=len, reverse=True)
    if not toks:
        return None
    pat = re.compile(
        r"\b(?:" + "|".join(re.escape(t) for t in toks) + r")\b", re.IGNORECASE
    )
    return lambda s: pat.sub(lambda m: f"<b>{m.group(0)}</b>", s)


class SearchEngine:
    def __init__(
        self,
        index_dir: str,
        config: ScoringConfig | None = None,
        preload_shards: bool = False,
        algorithm: str = "bm25",
        bucket: int | None = None,
        query_lang: str | None = None,
    ):
        """``algorithm``: "bm25" | "tfidf" | "combined" — the reference's
        pluggable scorers (SearchScorer factory methods,
        SearchScorer.cpp:625-643). Custom algorithms plug in by
        subclassing SearchEngine and overriding _score_candidates —
        the ScoringAlgorithm extension surface (SearchScorer.h:125-152).
        """
        if algorithm not in ("bm25", "tfidf", "combined"):
            raise ValueError(f"unknown algorithm {algorithm!r}")
        # Bucket-mode TFIDF needs the GLOBAL title+content document
        # frequencies injected per query (``df_tc_override``) — the
        # coordinator gathers them (DistributedSearch._global_df_tcs).
        # A direct bucket engine scoring a term WITHOUT that override
        # raises in _score_candidates rather than serving silently
        # wrong scores (bucket-local df_tc against global N).
        self.algorithm = algorithm
        # bucket mode: serve ONE docID-range bucket (doc-partitioned
        # serving; see query/distributed.py). Loads only that bucket's
        # docstore rows and segment files; corpus stats stay GLOBAL
        # (manifest) and per-term df is injected per query by the
        # coordinator so scores are identical to a whole-index engine.
        self.bucket = bucket
        self._df_override: dict[str, int] = {}
        self._df_tc_override: dict[str, int] = {}
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        self.num_shards = int(self.manifest["num_shards"])
        self.N = int(self.manifest["stats"]["total_docs"])
        self.avgdl = float(self.manifest["stats"]["avgdl"])
        self.config = config or ScoringConfig.from_json(
            __import__("json").dumps(self.manifest["config"])
        )
        # the analyzer is an index-time property: query-side tokenization
        # must match what built the postings (manifest-recorded). A
        # per-language mapping resolves via this session's query_lang —
        # the caller states the language its queries are written in
        # (falling back to the mapping's "*" entry), mirroring how each
        # document's lang column picked its analyzer at build time.
        from ..functions.analyzers import resolve_analyzer

        self.analyzer_spec = self.manifest.get("analyzer", "default")
        self.text_analyzer = resolve_analyzer(self.analyzer_spec, query_lang)
        # posting codec is likewise an index-time property
        self.postings_codec = self.manifest.get("codec", "vbyte")
        self._shards: dict[int, ShardReader] = {}
        self._postings_cache: dict[str, tuple] = {}
        self._pos_cache: dict[str, tuple] = {}
        self._fscore_cache: dict[str, np.ndarray] = {}
        self._block_bounds_cache: dict[str, tuple] = {}
        # observability: chunks considered / skipped by block-max pruning
        self.prune_stats = {"chunks": 0, "pruned": 0, "pruned_cands": 0}
        # a derived index (e.g. a statically pruned one, index/prune.py)
        # shares its parent's forward index instead of copying the
        # corpus: manifest "docstore_dir" overrides the default layout
        self._load_docstore(
            self.manifest.get("docstore_dir") or os.path.join(index_dir, "docstore")
        )
        # doc-level tombstones (deleteDocumentsByDomain analog):
        from ..index.delete import load_tombstones

        self.tombstones = np.asarray(
            load_tombstones(index_dir)["doc_ids"], dtype=np.int64
        )
        if len(self.tombstones) and len(self.doc_ids):
            # positions-space twin for the hot path (sorted asc)
            loc = np.searchsorted(self.doc_ids, self.tombstones)
            loc = np.minimum(loc, len(self.doc_ids) - 1)
            self._tomb_pos = loc[self.doc_ids[loc] == self.tombstones]
        if preload_shards:
            # open every term dictionary up front: first-query latency
            # moves into __init__ (the actor-pool warmup), flattening p99
            for shard in range(self.num_shards):
                self._reader(shard)

    # ---- loading -------------------------------------------------------
    def _docstore_files(self, docstore_dir: str) -> tuple[list[str], bool]:
        """-> (parquet paths, pruned). Bucket engines read ONLY their
        ``bucket=J/`` hive partition (the docstore is written partitioned
        by the same docID-range key as the segments), so per-actor memory
        and read IO are index_size / 2^bucket_bits. Falls back to a full
        scan + mask for pre-partitioning flat layouts."""
        import glob as _glob

        if self.bucket is not None:
            part = os.path.join(docstore_dir, f"bucket={self.bucket}")
            if os.path.isdir(part):
                return (
                    sorted(_glob.glob(os.path.join(part, "**", "*.parquet"),
                                      recursive=True)),
                    True,
                )
            hive = _glob.glob(os.path.join(docstore_dir, "bucket=*"))
            if hive:
                # partitioned layout, but this bucket holds no docs
                return [], True
        return (
            sorted(_glob.glob(os.path.join(docstore_dir, "**", "*.parquet"),
                              recursive=True)),
            False,
        )

    def _load_docstore(self, docstore_dir: str) -> None:
        files, pruned = self._docstore_files(docstore_dir)
        self._docstore_files_read = files  # observability + tests
        if files:
            t = pq.read_table(files)
        else:
            import glob as _glob

            any_file = sorted(
                _glob.glob(os.path.join(docstore_dir, "**", "*.parquet"),
                           recursive=True)
            )
            if not any_file:
                raise FileNotFoundError(
                    f"no docstore parquet files under {docstore_dir!r} — "
                    "the index was built over an empty corpus or the "
                    "index_dir path is wrong"
                )
            t = pq.read_schema(any_file[0]).empty_table()
        if self.bucket is not None and not pruned:
            from ..index.segments import range_bucket

            bits = int(self.manifest["bucket_bits"])
            mask = range_bucket(t.column("doc_id").to_numpy(), bits) == self.bucket
            t = t.filter(pa.array(mask))
        order = np.argsort(t.column("doc_id").to_numpy(), kind="stable")
        t = t.take(pa.array(order))
        self.doc_ids = t.column("doc_id").to_numpy()
        self.titles = np.asarray(t.column("title").to_pylist(), dtype=object)
        self.contents = np.asarray(t.column("text").to_pylist(), dtype=object)
        self.descriptions = np.asarray(
            t.column("meta_description").to_pylist(), dtype=object
        )
        self.urls = np.asarray(t.column("norm_url").to_pylist(), dtype=object)
        self.domains = np.asarray(t.column("domain").to_pylist(), dtype=object)
        self.langs = np.asarray(t.column("lang").to_pylist(), dtype=object)
        # category TAG (RedisSearchStorage.cpp:105, :148-150); docstores
        # built before the column existed serve "" (never matches)
        self.categories = (
            np.asarray(t.column("category").to_pylist(), dtype=object)
            if "category" in t.column_names
            else np.asarray([""] * t.num_rows, dtype=object)
        )
        self.quality = t.column("quality").to_numpy().astype(np.float64)
        # scoring multiplies by quality where quality > 0; the pruning
        # bound must cover corpora where quality exceeds 1.0
        self._q_mult_max = float(max(1.0, self.quality.max())) if t.num_rows else 1.0
        self.is_authority = np.asarray(
            [d in AUTHORITY_DOMAINS for d in self.domains], dtype=bool
        )
        # positions-space tombstones (set after tombstones load below)
        self._tomb_pos = np.empty(0, dtype=np.int64)
        self._title_boost_cache: dict[str, np.ndarray] = {}
        # Arrow string arrays for substring kernels (C++ match_substring
        # beats any Python/pandas loop by ~100x on the p99 path).
        # titles_pa is eager (every term query hits the title boost);
        # the LOWERED twins are built lazily on the first phrase query —
        # a pure-term workload never pays the extra text copies in RAM.
        self.titles_pa = pa.array([x or "" for x in self.titles], pa.string())
        self._lower_pa_cache: dict[str, "pa.Array"] = {}
        self.len_title = t.column("len_title").to_numpy().astype(np.float64)
        self.len_content = t.column("len_content").to_numpy().astype(np.float64)
        self.len_desc = t.column("len_desc").to_numpy().astype(np.float64)
        # precomputed BM25 length normalizers k1*(1 - b + b*len/avgdl):
        # the per-query tf component becomes tf*(k1+1)/(tf + norm[pos])
        # — one gather instead of recomputing the normalizer per query
        k1, b = self.config.bm25_params.k1, self.config.bm25_params.b
        avg = max(self.avgdl, 1e-9)
        self._bm25_norm = {
            "title": k1 * (1.0 - b + b * self.len_title / avg),
            "content": k1 * (1.0 - b + b * self.len_content / avg),
            "desc": k1 * (1.0 - b + b * self.len_desc / avg),
        }
        # keyword + metadata posting lists in POSITIONS space (docstore
        # row indices; position order == docID order because t is
        # doc_id-sorted), built VECTORIZED — one stable argsort per
        # column + run slicing; the old per-row dict-append loops
        # dominated bucket-actor warmup at large partitions
        import pyarrow.compute as _pc

        all_pos = np.arange(t.num_rows, dtype=np.int64)

        def _runs(keys: np.ndarray, docs: np.ndarray) -> dict:
            order = np.argsort(keys, kind="stable")
            ks, ds = keys[order], docs[order]
            if len(ks) == 0:
                return {}
            change = np.concatenate(([True], ks[1:] != ks[:-1]))
            starts = np.flatnonzero(change)
            ends = np.concatenate((starts[1:], [len(ks)]))
            return {ks[s]: ds[s:e] for s, e in zip(starts.tolist(), ends.tolist())}

        self.kw_postings: dict[str, np.ndarray] = {}
        if t.num_rows:
            kw_col = t.column("keywords")
            if isinstance(kw_col, pa.ChunkedArray):
                kw_col = kw_col.combine_chunks()
            lens = (
                _pc.fill_null(_pc.list_value_length(kw_col), 0)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            flat = np.asarray(_pc.list_flatten(kw_col).to_pylist(), dtype=object)
            self.kw_postings = _runs(flat, np.repeat(all_pos, lens))
        # metadata posting lists
        self._meta_postings: dict[tuple[str, str], np.ndarray] = {}
        if t.num_rows:
            meta_cols = {
                "domain": t.column("domain"),
                "lang": t.column("lang"),
                "category": (
                    t.column("category")
                    if "category" in t.column_names
                    else pa.array([""] * t.num_rows, pa.string())
                ),
            }
            for fld, col in meta_cols.items():
                vals = np.asarray(
                    _pc.fill_null(col, "").to_pylist(), dtype=object
                )
                for v, ids in _runs(vals, all_pos).items():
                    self._meta_postings[(fld, v)] = ids

    def _lower_pa(self, which: str) -> "pa.Array":
        """Lazily-built ASCII-lowered Arrow column for phrase kernels."""
        arr = self._lower_pa_cache.get(which)
        if arr is None:
            src = {
                "titles": self.titles,
                "contents": self.contents,
                "descs": self.descriptions,
            }[which]
            arr = pa.array([_lower(x or "") for x in src], pa.string())
            self._lower_pa_cache[which] = arr
        return arr

    @property
    def titles_lower_pa(self) -> "pa.Array":
        return self._lower_pa("titles")

    @property
    def contents_lower_pa(self) -> "pa.Array":
        return self._lower_pa("contents")

    @property
    def descs_lower_pa(self) -> "pa.Array":
        return self._lower_pa("descs")

    def _reader(self, shard: int) -> ShardReader:
        r = self._shards.get(shard)
        if r is None:
            import glob

            shard_dir = os.path.join(self.index_dir, "segments", f"shard={shard:05d}")
            pattern = (
                "bucket=*.parquet"
                if self.bucket is None
                else f"bucket={self.bucket:03d}.parquet"
            )
            paths = sorted(glob.glob(os.path.join(shard_dir, pattern)))
            r = ShardReader(paths, codec=self.postings_codec)
            self._shards[shard] = r
        return r

    def _postings_base(self, term: str) -> tuple:
        """Raw decoded postings (ids, tft, tfc, tfd, base_df) or ()."""
        hit = self._postings_cache.get(term)
        if hit is None:
            if len(self._postings_cache) >= 8192:
                # same bound-and-clear policy as _title_boost_cache: a
                # long-lived actor serving a diverse term stream must not
                # re-materialize the decoded index in Python arrays
                self._postings_cache.clear()
            reader = self._reader(shard_of_term(term, self.num_shards))
            p = reader.postings(term)
            hit = () if p is None else (*p, reader.df(term))
            self._postings_cache[term] = hit
        return hit

    def _postings(self, term: str):
        """-> (ids, tft, tfc, tfd, df) or None; decoded once per engine.
        In bucket mode the coordinator injects GLOBAL df per query via
        ``_df_override`` (local postings, global statistics)."""
        hit = self._postings_base(term)
        if hit == ():
            return None
        df = self._df_override.get(term)
        return hit if df is None else (*hit[:4], df)

    def _postings_pos(self, term: str):
        """Positions-space postings: (pos, tft, tfc, tfd, df) where
        ``pos`` are docstore ROW POSITIONS (monotone in doc_id, so all
        sorted-set algebra carries over) and the tf arrays are float64.
        Mapping + cast happen ONCE per term per engine — the per-query
        hot path never binary-searches doc_ids into the docstore again.
        df honors the per-query ``_df_override`` exactly like
        ``_postings``."""
        hit = self._pos_cache.get(term)
        if hit is None:
            base = self._postings_base(term)
            if base == ():
                hit = ()
            else:
                ids, tft, tfc, tfd, df = base
                pos = np.searchsorted(self.doc_ids, ids)
                hit = (
                    pos,
                    tft.astype(np.float64),
                    tfc.astype(np.float64),
                    tfd.astype(np.float64),
                    df,
                )
            if len(self._pos_cache) >= 8192:
                self._pos_cache.clear()
            self._pos_cache[term] = hit
        if hit == ():
            return None
        df = self._df_override.get(term)
        return hit if df is None else (*hit[:4], df)

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        """This engine's (bucket-local) document frequencies."""
        out = {}
        for t in set(terms):
            reader = self._reader(shard_of_term(t, self.num_shards))
            out[t] = reader.df(t)
        return out

    def local_df_tcs(self, terms: list[str]) -> dict[str, int]:
        """Bucket-local docs-with-term-in-TITLE-OR-CONTENT counts — the
        TFIDFAlgorithm df (updateDocumentFrequencies semantics). The
        coordinator sums these across buckets into the global
        df_tc_override."""
        out = {}
        for t in set(terms):
            p = self._postings(t)
            if p is None:
                out[t] = 0
            else:
                _, tft, tfc, _, _ = p
                out[t] = int(np.count_nonzero((tft > 0) | (tfc > 0)))
        return out

    # ---- retrieval -----------------------------------------------------
    # All retrieval set algebra runs in POSITIONS space (docstore row
    # indices): the docstore is doc_id-sorted, so position order equals
    # docID order and intersections/unions/tombstone-subtraction carry
    # over unchanged — while docstore gathers become direct indexing
    # instead of a 20k-element binary search per query.
    _EMPTY = np.empty(0, dtype=np.int64)

    @staticmethod
    def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Sorted-unique intersection via ONE binary-search pass of the
        smaller array into the larger (cheaper than np.intersect1d's
        concat+sort for pre-sorted posting lists)."""
        if len(a) > len(b):
            a, b = b, a
        if len(a) == 0 or len(b) == 0:
            return a[:0]
        loc = np.searchsorted(b, a)
        loc[loc == len(b)] = len(b) - 1
        return a[b[loc] == a]

    @staticmethod
    def _setdiff_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """a minus b for sorted-unique arrays, one binary-search pass."""
        if len(a) == 0 or len(b) == 0:
            return a
        loc = np.searchsorted(b, a)
        loc[loc == len(b)] = len(b) - 1
        return a[b[loc] != a]

    def _eval(self, node) -> np.ndarray:
        """-> candidate POSITIONS (sorted ascending)."""
        if isinstance(node, Term):
            toks = analyze(node.value, self.text_analyzer)
            if not toks:
                return self._EMPTY
            cur: np.ndarray | None = None
            for t in toks:
                p = self._postings_pos(t)
                ids = p[0] if p is not None else self._EMPTY
                cur = ids if cur is None else self._intersect_sorted(cur, ids)
                if len(cur) == 0:
                    return cur
            if node.exact:
                cur = self._verify_phrase(cur, node.value)
            return cur
        if isinstance(node, Filter):
            fld = normalize_filter_field(node.field)
            if fld in ("domain", "lang", "category"):
                return self._meta_postings.get((fld, node.value), self._EMPTY)
            if fld == "keywords":
                # @keywords:{v} TAG filter (RedisSearchStorage.cpp:104,
                # :152-160): docs whose keyword list contains the value;
                # served straight from the keyword posting lists
                p = self.kw_postings.get(node.value)
                return p if p is not None else self._EMPTY
            return self._EMPTY
        if isinstance(node, And):
            cur = None
            for c in node.children:
                ids = self._eval(c)
                cur = ids if cur is None else self._intersect_sorted(cur, ids)
                if len(cur) == 0:
                    return cur
            return cur if cur is not None else self._EMPTY
        if isinstance(node, Or):
            cur = self._EMPTY
            for c in node.children:
                cur = np.union1d(cur, self._eval(c))
            return cur
        return self._EMPTY

    def _pos_of(self, ids: np.ndarray) -> np.ndarray:
        """doc_ids -> row positions in the docstore arrays (the output
        boundary only: hydrate gets page-sized doc_id lists)."""
        return np.searchsorted(self.doc_ids, ids)

    @staticmethod
    def _contains(arr: "pa.Array", pos: np.ndarray, needle: str) -> np.ndarray:
        """C++ substring containment over docstore rows at ``pos``."""
        import pyarrow.compute as _pc

        taken = arr.take(pa.array(pos))
        return _pc.match_substring(taken, needle).to_numpy(zero_copy_only=False)

    def _verify_phrase(self, pos: np.ndarray, phrase: str) -> np.ndarray:
        """Substring-verify candidate POSITIONS; returns the survivors."""
        if len(pos) == 0:
            return pos
        p = _lower(phrase)
        mask = self._contains(self.titles_lower_pa, pos, p)
        mask |= self._contains(self.contents_lower_pa, pos, p)
        mask |= self._contains(self.descs_lower_pa, pos, p)
        return pos[mask] if mask.any() else self._EMPTY

    # ---- scoring -------------------------------------------------------
    def _fscores(self, term: str) -> np.ndarray | None:
        """Posting-aligned combined BM25 field score for one term —
        idf- and query-INDEPENDENT, so it's computed once per term per
        engine:

            w_t*C(tft) + w_c*C(tfc) + w_d*C(tfd)*[len_desc > 0],
            C(tf) = tf*(k1+1) / (tf + k1*(1 - b + b*len/avgdl))

        A per-query term contribution is then just ``idf * fscores``
        gathered at the candidates — the whole per-field scoring loop
        collapses to one fused multiply-add (the p99 lever: head terms
        score ~N candidates per query)."""
        fs = self._fscore_cache.get(term)
        if fs is None:
            p = self._postings_pos(term)
            if p is None:
                return None
            pos, tft, tfc, tfd, _ = p
            w = self.config.field_weights
            k1 = self.config.bm25_params.k1
            with np.errstate(divide="ignore", invalid="ignore"):
                fs = (tft * (k1 + 1.0)) / (tft + self._bm25_norm["title"][pos])
                fs *= w.title
                c = (tfc * (k1 + 1.0)) / (tfc + self._bm25_norm["content"][pos])
                fs += c * w.content
                d = (tfd * (k1 + 1.0)) / (tfd + self._bm25_norm["desc"][pos])
                d *= self.len_desc[pos] > 0  # hasDescription gate
                fs += d * w.description
            # 0/0 (tf=0 with a zero normalizer, only when b=1 and len=0)
            # means "term absent from the field" -> contributes 0
            np.nan_to_num(fs, copy=False, nan=0.0)
            if len(self._fscore_cache) >= 8192:
                self._fscore_cache.clear()
            self._fscore_cache[term] = fs
        return fs

    def _score_candidates(
        self, cands: np.ndarray, terms: list[str], phrases: list[str]
    ) -> np.ndarray:
        """Vectorized scoring with the selected algorithm ("bm25",
        "tfidf" or "combined" — the reference's pluggable
        ScoringAlgorithm hierarchy, SearchScorer.h:125-222).

        ``cands`` are docstore ROW POSITIONS (see the retrieval section
        note). When a candidate set IS one term's posting array (the
        single-term query — the p99 worst case), the postings→candidate
        mapping is skipped entirely (object identity check)."""
        cfg = self.config
        w = cfg.field_weights
        tfidf = self.algorithm == "tfidf"
        n = len(cands)
        pos = cands
        field_s = np.zeros(n)
        kw_s = np.zeros(n)

        if tfidf:
            lt = self.len_title[pos]
            lc = self.len_content[pos]
            ld = self.len_desc[pos]
            has_desc = ld > 0
            for term in terms:
                p = self._postings_pos(term)
                if p is None:
                    continue
                ids, tft, tfc, tfd, df = p
                # TFIDFAlgorithm df = docs with the term in title or
                # content only (SearchScorer.cpp:358-375); postings
                # carry per-field tfs so it's a cheap count. Bucket
                # engines must receive the GLOBAL count per query.
                df_tc = self._df_tc_override.get(term)
                if df_tc is None:
                    if self.bucket is not None:
                        raise RuntimeError(
                            "bucket-mode tfidf scoring requires a "
                            "df_tc_override (global title+content "
                            "dfs) — serve via DistributedSearch"
                        )
                    df_tc = int(np.count_nonzero((tft > 0) | (tfc > 0)))
                idf = np.log(self.N / max(df_tc, 1))
                identity = ids is cands
                if identity:
                    h = lh = None
                elif len(ids) == 0:
                    continue
                else:
                    loc = np.searchsorted(ids, cands)
                    loc = np.minimum(loc, len(ids) - 1)
                    hit = ids[loc] == cands
                    if not hit.any():
                        continue
                    h = np.flatnonzero(hit)
                    lh = loc[h]
                for tf_arr, lens, weight, gate in (
                    (tft, lt, w.title, None),
                    (tfc, lc, w.content, None),
                    (tfd, ld, w.description, has_desc),
                ):
                    tf = tf_arr if identity else tf_arr[lh]
                    m = tf > 0
                    if gate is not None:
                        m &= gate if identity else gate[h]
                    if m.any():
                        hm = np.flatnonzero(m) if identity else h[m]
                        tfm = tf[m]
                        # min(tf, cap) -> log(1+tf) -> / byte len
                        tfn = np.minimum(tfm, cfg.tf_params.max_term_frequency)
                        if cfg.tf_params.use_log_normalization:
                            tfn = np.log(1.0 + tfn)
                        if cfg.tf_params.normalize_by_length:
                            lz = lens[hm]
                            tfn = np.where(lz > 0, tfn / np.maximum(lz, 1.0), tfn)
                        field_s[hm] += tfn * idf * weight
        else:
            # bm25 / combined: per-term contribution is one gather of the
            # cached posting-aligned field score + a fused multiply-add
            for term in terms:
                p = self._postings_pos(term)
                if p is not None:
                    ids, _, _, _, df = p
                    idf = np.log((self.N - df + 0.5) / (df + 0.5))
                    fs = self._fscores(term)
                    off = _slice_offset(cands, ids)
                    if ids is cands:
                        field_s += idf * fs
                    elif off is not None:
                        # cands is a contiguous VIEW of this term's
                        # postings (the two-phase top-k scorer hands
                        # out slices): direct fs slice, no mapping
                        field_s += idf * fs[off : off + len(cands)]
                    elif len(ids):
                        loc = np.searchsorted(ids, cands)
                        loc = np.minimum(loc, len(ids) - 1)
                        hit = ids[loc] == cands
                        if hit.any():
                            h = np.flatnonzero(hit)
                            field_s[h] += idf * fs[loc[h]]
                # TFIDFAlgorithm has no keyword scoring; bm25/combined do
                kw_ids = self.kw_postings.get(term)
                if kw_ids is not None and len(kw_ids):
                    if len(kw_ids) * 4 < n:
                        # probe the small side into the big side
                        loc = np.searchsorted(cands, kw_ids)
                        loc = np.minimum(loc, n - 1)
                        sel = loc[cands[loc] == kw_ids]
                        kw_s[sel] += 1.0 * w.keywords
                    else:
                        loc = np.searchsorted(kw_ids, cands)
                        loc = np.minimum(loc, len(kw_ids) - 1)
                        hit = kw_ids[loc] == cands
                        kw_s[hit] += 1.0 * w.keywords

        exact_s = np.zeros(n)
        if phrases:
            # BM25: boost * field weight; TFIDF: unweighted title boost,
            # half boost for content (SearchScorer.cpp:194-202, 328-336)
            w_title = 1.0 if tfidf else w.title
            w_content = 0.5 if tfidf else w.content
            for phrase in phrases:
                pl = _lower(phrase)
                hit_t = self._contains(self.titles_lower_pa, pos, pl)
                exact_s[hit_t] += cfg.boost_factors.exact_match_boost * w_title
                hit_c = self._contains(self.contents_lower_pa, pos, pl)
                exact_s[hit_c] += cfg.boost_factors.exact_match_boost * w_content

        total = field_s + kw_s + exact_s
        q = self.quality[pos]
        total = np.where(q > 0, total * q, total)
        if self.algorithm == "combined":
            # 30% base score + 70% custom (SearchScorer.cpp:400-407)
            total = np.where(q > 0, q * 0.3 + total * 0.7, total)
        # applyBoosts: domain authority + case-sensitive title substring
        boost = np.zeros(n)
        boost[self.is_authority[pos]] += cfg.boost_factors.domain_authority_boost
        if terms:
            anyhit = np.zeros(n, dtype=bool)
            for term in dict.fromkeys(terms):
                full = self._title_boost_cache.get(term)
                if full is None:
                    if len(self._title_boost_cache) >= 4096:
                        # bound actor-lifetime memory: each entry is an
                        # n_docs bool mask; arbitrary query streams would
                        # otherwise grow it without limit
                        self._title_boost_cache.clear()
                    import pyarrow.compute as _pc

                    full = _pc.match_substring(self.titles_pa, term).to_numpy(
                        zero_copy_only=False
                    )
                    self._title_boost_cache[term] = full
                anyhit |= full[pos]
            boost[anyhit] += cfg.boost_factors.title_match_boost
        total *= 1.0 + boost
        return total

    # ---- public API ----------------------------------------------------
    def search_raw(
        self,
        query: str,
        df_override: dict | None = None,
        df_tc_override: dict | None = None,
        fuzzy: bool = False,
        ast=None,
    ) -> tuple:
        """Retrieve + score WITHOUT normalization/sort/pagination —
        the partial a doc-partitioned bucket actor returns to the
        coordinator. -> (cands int64, raw scores float64, pure_filter).
        Pure-filter results carry quality scores; term/phrase results
        are raw (pre-min-score-filter) totals.  ``ast`` short-circuits
        the parse (callers that already parsed/rewrote, e.g. the fuzzy
        path, pass it to avoid a second dictionary scan)."""
        if df_override is not None:
            self._df_override = df_override
        if df_tc_override is not None:
            self._df_tc_override = df_tc_override
        try:
            if ast is None:
                ast = parse_query(query)
                if fuzzy:
                    ast = self.fuzzy_rewrite(ast)
            terms = scoring_terms(ast, self.text_analyzer)
            phrases = exact_phrases(ast)
            cands = self._eval(ast)  # positions
            if len(self._tomb_pos):
                cands = self._setdiff_sorted(cands, self._tomb_pos)
            pure_filter = not terms and not phrases
            if len(cands) == 0:
                return (
                    np.empty(0, dtype=np.int64),
                    np.empty(0, dtype=np.float64),
                    pure_filter,
                )
            if pure_filter:
                scores = self.quality[cands]
            else:
                scores = self._score_candidates(cands, terms, phrases)
            # doc_ids at the public boundary (distributed merge contract)
            return self.doc_ids[cands], scores, pure_filter
        finally:
            if df_override is not None:
                self._df_override = {}
            if df_tc_override is not None:
                self._df_tc_override = {}

    def search(
        self,
        query: str,
        limit: int = 10,
        offset: int = 0,
        highlight: bool = False,
        fuzzy: bool = False,
    ) -> dict:
        """Fidelity path: full candidate scoring, reference-identical.
        ``highlight=True`` mirrors searchSimple's always-on HIGHLIGHT
        (RedisSearchStorage.cpp:365-372): result title/snippet carry
        ``<b>`` tags around matched terms (RediSearch returns the
        fields pre-tagged and parseSearchResult truncates the TAGGED
        content), plus the SearchResult.highlights{} field->text map
        (RedisSearchStorage.h:43).  ``fuzzy=True`` applies the
        zero-match typo rewrite (see fuzzy_rewrite) before scoring —
        computed ONCE here and shared with the highlight pass (the
        rewrite's dictionary scan is the expensive part)."""
        ast = None
        if fuzzy:
            ast = self.fuzzy_rewrite(parse_query(query))
        cands, scores, pure_filter = self.search_raw(query, ast=ast)
        hl = None
        if highlight:
            if ast is None:
                ast = parse_query(query)
            hl = scoring_terms(ast, self.text_analyzer)
        return self.finish_search(
            cands, scores, pure_filter, limit, offset, highlight_terms=hl
        )

    def finish_search(
        self,
        cands: np.ndarray,
        scores: np.ndarray,
        pure_filter: bool,
        limit: int = 10,
        offset: int = 0,
        highlight_terms: list[str] | None = None,
    ) -> dict:
        """min-score filter + normalize + sort + paginate + hydrate.
        Split out so the distributed coordinator can apply the GLOBAL
        tail over gathered per-bucket partials."""
        if len(cands) == 0:
            return {"total": 0, "results": []}
        if not pure_filter:
            # pure-filter queries: the reference service path orders by
            # the stored score field (FT.SEARCH ... SORTBY score DESC,
            # RedisSearchStorage.cpp:242-252) with no min-score filter
            # and no normalization; term queries get both.
            keep = scores >= self.config.min_score
            cands, scores = cands[keep], scores[keep]
        if not pure_filter and len(scores) and self.config.normalize_scores:
            lo, hi = scores.min(), scores.max()
            rng = hi - lo
            if rng > 0:
                scores = (scores - lo) / rng
        order = np.lexsort((cands, -scores))
        cands, scores = cands[order], scores[order]
        total = len(cands)
        sel = slice(offset, offset + limit if limit else None)
        cands, scores = cands[sel], scores[sel]
        return {
            "total": total,
            "results": self.hydrate(cands, scores, highlight_terms=highlight_terms),
        }

    def hydrate(
        self,
        cands: np.ndarray,
        scores: np.ndarray,
        highlight_terms: list[str] | None = None,
    ) -> list[dict]:
        """doc ids -> result rows from this engine's forward index.
        With ``highlight_terms``, title and content are tagged BEFORE the
        200-char snippet cut (the reference truncates the value RediSearch
        already highlighted, RedisSearchStorage.cpp:283-288) and each row
        carries the highlights{} map."""
        pos = self._pos_of(cands)
        hfn = (
            build_highlighter(highlight_terms)
            if highlight_terms is not None
            else None
        )
        results = []
        for did, s, rp in zip(cands.tolist(), scores.tolist(), pos.tolist()):
            content = self.contents[rp] or ""
            title = self.titles[rp] or ""
            if highlight_terms is not None and hfn is not None:
                title = hfn(title)
                content = hfn(content)
            snippet = content[:200] + "..." if len(content) > 200 else content
            row = {
                "doc_id": did,
                "url": self.urls[rp],
                "title": title,
                "snippet": snippet,
                "domain": self.domains[rp],
                "score": s,
            }
            if highlight_terms is not None:
                row["highlights"] = {"title": title, "content": snippet}
            results.append(row)
        return results

    def rank(self, query: str, top_k: int = 0) -> list[tuple[int, float]]:
        """Oracle-comparable output: [(doc_id, score)] desc."""
        r = self.search(query, limit=top_k or 0, offset=0)
        return [(x["doc_id"], x["score"]) for x in r["results"]]

    def search_fast(
        self, query: str, limit: int = 10, offset: int = 0, highlight: bool = False
    ) -> dict:
        """Serving path tuned for p99: pure-term bm25 queries with a
        bounded page go through the pruned top-k (block-max + MaxScore)
        instead of scoring every candidate — SAME ranked doc ids as
        ``search`` (asserted in tests), but scores are RAW (no min-max
        normalization: that needs the min over all candidate scores,
        which pruning exists to avoid) and ``total`` counts the full
        RETRIEVAL set — pre min-score filter, so it can exceed the
        fidelity path's post-filter total (computing the filtered count
        would require scoring every candidate, which pruning exists to
        avoid; the divergence is surfaced in search_api too). Falls
        back to the fidelity path for phrases, filters, limit=0
        (return-all) and non-bm25 engines."""
        ast = parse_query(query)
        if (
            limit == 0
            or exact_phrases(ast)
            or self._has_filter(ast)
            or self.algorithm != "bm25"
        ):
            return self.search(query, limit=limit, offset=offset, highlight=highlight)
        # evaluate the retrieval set ONCE: it is both the wand path's
        # candidate set (non-Or shapes) and the reported total
        cands = self._eval(ast)
        if len(self._tomb_pos):
            cands = self._setdiff_sorted(cands, self._tomb_pos)
        ranked = self._topk_wand_inner(
            query, offset + limit, ast=ast, cands=cands
        )
        page = ranked[offset : offset + limit]
        hl = None
        if highlight:
            hl = scoring_terms(ast, self.text_analyzer)
        ids = np.asarray([d for d, _ in page], dtype=np.int64)
        scores = np.asarray([s for _, s in page], dtype=np.float64)
        return {
            "total": int(len(cands)),
            "results": self.hydrate(ids, scores, highlight_terms=hl),
        }

    def suggest(self, prefix: str, limit: int = 10) -> list[str]:
        """Autocomplete — the FT.SUGGET surface
        (RedisSearchStorage::suggest, RedisSearchStorage.cpp:374-397;
        ContentStorage.cpp:373-378). The reference reads a suggestion
        dictionary it NEVER populates (no FT.SUGADD exists anywhere in
        the codebase), so its suggest() always returns empty. Here the
        suggestion dictionary IS the index's term dictionary: indexed
        terms with the given (lowercased) prefix, ranked by document
        frequency descending then lexicographically — the natural
        engine-side semantics for the same API.

        Each shard's term dictionary is kept term-sorted, so the prefix
        range is found by bisect — O(log V + hits) per shard, and the
        accumulation is bounded by ``heapq.nsmallest`` instead of
        collecting every match before truncating."""
        import bisect

        if not prefix or limit <= 0:
            return []
        p = _lower(prefix)

        def gen():
            for shard in range(self.num_shards):
                reader = self._reader(shard)
                terms = reader.terms_sorted
                i = bisect.bisect_left(terms, p)
                while i < len(terms) and terms[i].startswith(p):
                    yield (-reader.df(terms[i]), terms[i])
                    i += 1

        return [t for _, t in heapq.nsmallest(limit, gen())]

    def fuzzy_terms(
        self, term: str, max_dist: int = 2, limit: int = 10
    ) -> list[tuple[str, int, int]]:
        """Typo-tolerant term lookup over the index's term dictionaries
        — the serving-side twin of the batch operator
        functions/fuzzy.fuzzy_match_terms (the RediSearch %term%
        capability).  Returns [(term, dist, df)] ranked by
        (dist asc, df desc, term asc), at most ``limit`` rows.

        Every term lives in exactly one shard (shard_of_term), so the
        scan unions the per-shard sorted dictionaries; a length-band
        prefilter (|len(t)-len(q)| <= max_dist) gates the capped-band
        DP, the same discipline as the batch kernel.  Cost is
        vocabulary-bounded, never corpus-bounded."""
        from ..functions.fuzzy import levenshtein

        if not term or limit <= 0:
            return []
        q = _lower(term)
        ql = len(q)

        def gen():
            for shard in range(self.num_shards):
                reader = self._reader(shard)
                for t in reader.terms_sorted:
                    if abs(len(t) - ql) > max_dist:
                        continue
                    d = levenshtein(q, t, cap=max_dist)
                    if d <= max_dist:
                        yield (d, -reader.df(t), t)

        return [(t, d, -ndf) for d, ndf, t in heapq.nsmallest(limit, gen())]

    def fuzzy_rewrite(self, ast, max_dist: int = 2, limit: int = 3):
        """Typo tolerance as an AST rewrite — the %term% capability of
        the reference's RediSearch backend, applied only where needed:
        every non-exact Term NONE of whose analyzed tokens exist in the
        index is replaced by the Or of its nearest indexed terms
        (``fuzzy_terms`` ranking, top ``limit``).  Queries whose terms
        all match are returned untouched, so reference parity holds for
        them; phrases and filters are never rewritten.  Inserted
        candidates come from the index dictionary (already analyzer
        space) — assumes an idempotent analyzer, true of the built-in
        ones."""
        from .parser import And, Or, Term
        from .plan import analyze

        def walk(node):
            if isinstance(node, Term):
                if node.exact:
                    return node
                toks = analyze(node.value, self.text_analyzer)
                if not toks:
                    # analysis yields nothing (e.g. a 1-char word the
                    # tokenizer drops): NOT a typo — never substitute
                    return node
                if any(self.local_dfs([t]).get(t, 0) > 0 for t in toks):
                    return node
                cands = [
                    c
                    for c, _d, _df in self.fuzzy_terms(
                        node.value, max_dist, limit + 1
                    )
                    if c != node.value
                ][:limit]
                if not cands:
                    return node
                if len(cands) == 1:
                    return Term(cands[0])
                return Or([Term(c) for c in cands])
            if isinstance(node, (And, Or)):
                node.children = [walk(c) for c in node.children]
                return node
            return node  # Filter

        return walk(ast)

    # ---- block-max WAND fast path --------------------------------------
    def search_topk_wand(
        self, query: str, k: int = 10, df_override: dict | None = None
    ) -> list[tuple[int, float]]:
        """Top-k doc_ids for a conjunctive/disjunctive pure-term query via
        block-max pruning + bounded min-heap; returns RAW scores (no
        min-max normalization, no offset). Falls back to the fidelity
        path for queries with phrases or filters.
        """
        if df_override is not None:
            self._df_override = df_override
        try:
            return self._topk_wand_inner(query, k)
        finally:
            if df_override is not None:
                self._df_override = {}

    def _topk_wand_inner(
        self, query: str, k: int, ast=None, cands=None
    ) -> list[tuple[int, float]]:
        ast = ast if ast is not None else parse_query(query)
        phrases = exact_phrases(ast)
        has_filter = self._has_filter(ast)
        if phrases or has_filter or self.algorithm != "bm25":
            # the block-max bounds below are BM25-shaped (floored idf x
            # monotone tf component); pruning with them under tfidf /
            # combined scoring would drop true top-k docs — fall back
            r = self.search(query, limit=k)
            return [(x["doc_id"], x["score"]) for x in r["results"]]
        terms = scoring_terms(ast, self.text_analyzer)
        cfg = self.config
        max_mult = (
            1.0
            + cfg.boost_factors.domain_authority_boost
            + cfg.boost_factors.title_match_boost
        ) * self._q_mult_max
        term_blocks = self._term_block_bounds(terms)

        heap: list[tuple[float, int]] = []
        or_tokens = self._flat_or_tokens(ast)
        if or_tokens is not None and len(or_tokens) > 1:
            # MaxScore term-at-a-time pruning for flat Or queries: terms
            # are processed in DESCENDING upper-bound order, each term's
            # not-yet-scored postings go through the chunked block-max
            # scorer, and once the k-th best score exceeds the summed
            # upper bounds of every REMAINING term, those whole posting
            # lists are skipped — their docs cannot reach the heap. A
            # negative-idf head term (UB ~ 0) costs nothing. Scored docs
            # get their FULL exact score, so results are identical to
            # the union path.
            order = sorted(
                range(len(or_tokens)),
                key=lambda i: -(self._term_ub(term_blocks[i]) if i < len(term_blocks) else 0.0),
            )
            scored = np.empty(0, dtype=np.int64)
            kw_all = [tb[2] if tb is not None else None for tb in term_blocks]
            w_kw = cfg.field_weights.keywords
            for n_done, i in enumerate(order):
                if len(heap) >= k:
                    rem = sum(
                        self._term_ub(term_blocks[j]) for j in order[n_done:]
                    )
                    # an unscored doc is outside every scored term's
                    # postings but can still hold a scored term's
                    # KEYWORD bonus if that term's kw set reaches
                    # beyond its postings
                    rem += sum(
                        w_kw
                        for j in order[:n_done]
                        if term_blocks[j] is not None and term_blocks[j][3]
                    )
                    if rem * max_mult < heap[0][0]:
                        break  # no unscored doc can beat the k-th best
                p = self._postings_pos(or_tokens[i])
                if p is None:
                    continue
                cand = self._setdiff_sorted(p[0], scored)
                if len(self._tomb_pos):
                    cand = self._setdiff_sorted(cand, self._tomb_pos)
                if len(cand):
                    # bound only with the CURRENT + REMAINING terms'
                    # blocks: cand was set-subtracted from every
                    # already-scored term's postings, so those terms
                    # contribute exactly 0 — including their block ubs
                    # would inflate every candidate's bound and stop
                    # the prune from ever firing
                    # scoring must keep the FULL term list even though
                    # scored terms' field scores are provably 0 on cand
                    # (set-subtracted): the title-match boost substring-
                    # matches ANY query term against titles, postings
                    # membership or not
                    self._chunk_score_into_heap(
                        cand,
                        terms,
                        [term_blocks[j] for j in order[n_done:]],
                        k,
                        heap,
                        max_mult,
                        kw_all=kw_all,
                    )
                scored = np.union1d(scored, p[0])
        else:
            if cands is None:
                cands = self._eval(ast)
                if len(self._tomb_pos):
                    cands = self._setdiff_sorted(cands, self._tomb_pos)
            if len(cands) == 0:
                return []
            self._chunk_score_into_heap(
                cands,
                terms,
                term_blocks,
                k,
                heap,
                max_mult,
                kw_all=[tb[2] if tb is not None else None for tb in term_blocks],
            )
        # heap holds (score, -position); positions -> doc_ids here only
        out = sorted(((s, -nd) for s, nd in heap), key=lambda t: (-t[0], t[1]))
        return [(int(self.doc_ids[p_]), s) for s, p_ in out]

    def _flat_or_tokens(self, ast) -> list[str] | None:
        """-> one analyzed token per child when the AST is a flat Or of
        single-token non-exact Terms (the MaxScore-prunable shape),
        else None."""
        if not isinstance(ast, Or):
            return None
        toks = []
        for c in ast.children:
            if not isinstance(c, Term) or c.exact:
                return None
            t = analyze(c.value, self.text_analyzer)
            if len(t) != 1:
                return None
            toks.append(t[0])
        return toks

    def _term_ub(self, tb) -> float:
        """Global score upper bound of one term (max over its blocks,
        plus the keyword bonus if any doc carries it)."""
        if tb is None:
            return 0.0
        kw = (
            self.config.field_weights.keywords
            if tb[2] is not None and len(tb[2])
            else 0.0
        )
        return float(tb[1].max(initial=0.0)) + kw

    def _term_block_bounds(self, terms: list[str]):
        """Per-term (block_last_position, block upper bound) arrays,
        computed EXACTLY from the positions-space postings; None for
        absent terms.

        Earlier rounds derived bounds from the stored per-block max-tf
        metadata with the document length sent to 0 in the BM25
        normalizer. That bound is valid but so loose it never fires:
        BM25's tf saturation squeezes every block's bound toward
        idf*(k1+1)*sum(w_f) regardless of the actual tfs (tf=1 at len 0
        already reaches (k1+1)/(1+k1*(1-b)) ~ 77% of the ceiling with
        the default k1=1.2, b=0.75), so the summed chunk bound always
        clears the heap minimum. The engine already holds the cached
        posting-aligned combined field score (`_fscores`) — the exact
        per-doc score modulo idf and boosts — so the TIGHT bound is one
        ``np.maximum.reduceat`` over it per term, once per engine.
        Bounds and block boundaries both live in positions space, which
        also removes the docID translation from the chunk scorer.
        """
        # bounds depend on df, which a per-query df_override changes —
        # cache only when no override is active on a whole-index engine
        # (an override-derived bound could be too LOW for a later
        # override-free query and over-prune true top-k docs)
        cacheable = self.bucket is None and not self._df_override
        term_blocks: list[tuple[np.ndarray, np.ndarray] | None] = []
        for t in terms:
            if cacheable and t in self._block_bounds_cache:
                term_blocks.append(self._block_bounds_cache[t])
                continue
            p = self._postings_pos(t)
            if p is None or len(p[0]) == 0:
                # a term can have KEYWORD postings without text postings
                # (extract_keywords strips punctuation differently from
                # the tokenizer: "e-mail" -> keyword "email" vs tokens
                # "mail"). Such a term contributes no field score but
                # still awards the binary w.keywords bonus, so it must
                # stay visible to every bound (empty blocks, kw set,
                # kw_outside=True) — a None tb here made the phase-B
                # bound and the MaxScore remaining-UB underestimate true
                # scores and prune docs the fidelity path ranks.
                kw_pos = self.kw_postings.get(t)
                if kw_pos is None or len(kw_pos) == 0:
                    tb = None
                else:
                    tb = (
                        np.empty(0, dtype=np.int64),
                        np.empty(0, dtype=np.float64),
                        np.sort(kw_pos),
                        True,
                    )
            else:
                pos, df = p[0], p[4]
                idf = max(0.0, float(np.log((self.N - df + 0.5) / (df + 0.5))))
                fs = self._fscores(t)
                starts = np.arange(0, len(pos), BLOCK_SIZE, dtype=np.int64)
                ub = idf * np.maximum.reduceat(fs, starts)
                blk_last = pos[np.minimum(starts + BLOCK_SIZE - 1, len(pos) - 1)]
                # the keyword bonus is BINARY (w.keywords iff the doc's
                # keyword list contains the term), so it is bounded
                # per-candidate with one searchsorted into kw_pos
                # instead of inflating every block bound by w.keywords
                # (which would exceed any realistic heap minimum and
                # stop pruning from ever firing). kw_outside flags docs
                # that carry the keyword WITHOUT appearing in the
                # term's postings — they can receive the bonus while
                # being invisible to this term's blocks, which matters
                # for the MaxScore remaining-terms bound.
                kw_pos = self.kw_postings.get(t)
                kw_outside = bool(
                    kw_pos is not None
                    and len(self._setdiff_sorted(np.sort(kw_pos), pos))
                )
                tb = (blk_last, ub, kw_pos, kw_outside)
            if cacheable:
                if len(self._block_bounds_cache) >= 8192:
                    self._block_bounds_cache.clear()
                self._block_bounds_cache[t] = tb
            term_blocks.append(tb)
        return term_blocks

    def _chunk_score_into_heap(
        self, cands, terms, term_blocks, k, heap, max_mult, kw_all=None
    ) -> None:
        """Score candidate POSITIONS in docID-ordered chunks (positions
        ascend with doc_id), TWO-PHASE:

        A. if the heap isn't full yet, score the first 4096 candidates
           vectorized to establish a heap minimum (skipped when the
           caller — e.g. MaxScore's later terms — arrives with a full
           heap);
        B. compute a PER-CANDIDATE block-max bound over ALL remaining
           candidates in one vectorized pass — sum over query terms of
           each candidate's 128-posting block's exact score bound (one
           searchsorted per term) plus the exact binary keyword bonus
           (one searchsorted into each term's kw posting list) — and
           score only the survivors, once.

        An earlier revision looped 4096-candidate chunks with a
        chunk-level skip test; measured on both uniform and Zipf-tf
        corpora that never fires (every chunk contains SOME
        saturated-tf doc, so the chunk max stays above the heap min
        even when most of its candidates are individually prunable)
        while paying a per-chunk candidates→postings searchsorted in
        the scorer that the one-shot fidelity path never pays. The
        two-phase shape makes the no-prune worst case one bound pass
        more than fidelity scoring, and the prunable case one
        ~O(survivors) scoring call. Heap entries are (score, -pos);
        ``self.prune_stats`` counts phases, all-pruned phases, and
        individually pruned candidates."""
        start = 0
        if len(heap) < k:
            B0 = 4096
            # keep object identity for small candidate sets so the
            # scorer's postings==candidates shortcut still fires
            first = cands if len(cands) <= B0 else cands[:B0]
            self.prune_stats["chunks"] += 1
            self._merge_scores_into_heap(first, terms, k, heap)
            start = len(first)
            if start >= len(cands):
                return
        rest = cands[start:] if start else cands
        self.prune_stats["chunks"] += 1
        if len(heap) >= k:
            hm = heap[0][0]
            bound = np.zeros(len(rest))
            for tb in term_blocks:
                if tb is None:
                    continue
                blk_last, ub = tb[0], tb[1]
                if len(ub) == 0:
                    continue  # keyword-only term: bonus added via kw_all
                # block of each candidate (bounds live in positions
                # space). Candidates outside this term's postings land
                # in SOME block whose ub >= 0 — an overestimate of
                # their true 0 contribution, so the bound stays a true
                # upper bound.
                bi = np.minimum(np.searchsorted(blk_last, rest), len(ub) - 1)
                bound += ub[bi]
            if kw_all is not None:
                # exact binary keyword bonus per candidate (see
                # _term_block_bounds): one searchsorted per term
                w_kw = self.config.field_weights.keywords
                for kw_pos in kw_all:
                    if kw_pos is None or len(kw_pos) == 0:
                        continue
                    loc = np.minimum(
                        np.searchsorted(kw_pos, rest), len(kw_pos) - 1
                    )
                    bound += w_kw * (kw_pos[loc] == rest)
            keep_m = bound * max_mult > hm
            n_keep = int(keep_m.sum())
            self.prune_stats["pruned_cands"] += len(rest) - n_keep
            if n_keep == 0:
                self.prune_stats["pruned"] += 1
                return  # block-max prune: nothing left can reach the heap
            if n_keep < len(rest):
                rest = rest[keep_m]
        self._merge_scores_into_heap(rest, terms, k, heap)

    def _merge_scores_into_heap(self, chunk, terms, k, heap) -> None:
        """Score ``chunk`` (candidate positions) and merge into the
        k-bounded heap with one C-side lexsort — a per-doc Python heapq
        loop costs more than scoring does."""
        scores = self._score_candidates(chunk, terms, [])
        thresh = self.config.min_score
        if len(heap) >= k and heap[0][0] > thresh:
            thresh = heap[0][0]
        keep = scores >= thresh
        if not keep.any():
            return
        c_ids = chunk[keep]
        c_sc = scores[keep]
        if heap:
            c_ids = np.concatenate(
                [c_ids, np.asarray([-nd for _, nd in heap], dtype=np.int64)]
            )
            c_sc = np.concatenate(
                [c_sc, np.asarray([s for s, _ in heap], dtype=np.float64)]
            )
        order = np.lexsort((c_ids, -c_sc))[:k]
        heap[:] = [(float(c_sc[i]), -int(c_ids[i])) for i in order]
        heapq.heapify(heap)

    @staticmethod
    def _has_filter(node) -> bool:
        if isinstance(node, Filter):
            return True
        if isinstance(node, (And, Or)):
            return any(SearchEngine._has_filter(c) for c in node.children)
        return False
