"""Doc-partitioned distributed query serving (the 10^12-doc shape).

``QueryPool`` replicates the whole index per actor — right for small
indexes and read-throughput. At web scale no single node can hold the
docstore, so serving must be DOC-PARTITIONED. The segment layout
already is: every posting list is stored split by docID-range bucket
(``segments/shard=K/bucket=J.parquet``), so a bucket actor loads ONLY

- the docstore rows whose ``range_bucket(doc_id) == J``, and
- every shard's ``bucket=J`` segment file (its slice of every posting
  list),

i.e. memory per actor = index_size / 2^bucket_bits — raise bucket_bits
with corpus size and this scales to any index.

Scoring correctness across partitions: BM25 needs GLOBAL statistics.
N and avgdl come from the manifest (global by construction); per-term
document frequencies are gathered by the coordinator (one tiny fan-out
summing bucket-local dfs, cached per term) and injected into each
actor's scoring via ``df_override`` — so every actor computes exactly
the score a whole-index engine would, verified rank-identical in
tests/test_distributed.py.

Query flow (scatter-gather):
1. coordinator resolves global df for the query's terms (cached);
2. fan out: each bucket actor retrieves + scores its local candidates
   (``search_raw``) — candidates are disjoint by construction;
3. gather: concatenate partials, then apply the single-engine tail
   (min-score filter -> global min-max normalize -> sort -> paginate)
   on the coordinator; result hydration is served by the owning actors.

``topk`` skips the gather-everything step: each actor runs its
block-max pruned bounded-heap top-k and only k results per bucket
travel — the per-shard-top-k + final-merge shape SURVEY.md §7.5 calls
for at 10^12 docs.
"""

from __future__ import annotations

import numpy as np
import ray

from ..functions.analyzers import analyze
from ..index.build import load_manifest
from ..query.parser import parse_query
from ..query.plan import walk_terms


@ray.remote
class _BucketActor:
    """Serving actor owning one or more docID-range buckets.

    One bucket per actor is the pure partitioned shape; grouping
    several buckets into one actor (``buckets`` is a list) is the
    per-NODE serving daemon a real cluster runs — at 2^16 buckets a
    coordinator cannot fan a query out to 65k actors, it fans out to
    the ~256 node daemons each holding its node's bucket slice.  The
    coordinator's scatter-gather latency scales with the FAN-OUT
    width, not the bucket count (measured: a 16-wide no-op actor
    fan-out costs ~3.4 ms p50 on this box vs ~1.7 ms for 1-wide), so
    grouping is the latency lever; per-actor memory grows to
    index_size * len(buckets) / 2^bucket_bits — still sized by how
    many buckets a node is assigned, never by the corpus."""

    def __init__(self, index_dir: str, buckets: list[int], engine_kwargs: dict):
        from .engine import SearchEngine

        self.buckets = [int(b) for b in buckets]
        self.engines = [
            SearchEngine(index_dir, bucket=j, preload_shards=True, **engine_kwargs)
            for j in self.buckets
        ]
        from ..index.build import load_manifest

        self._bucket_bits = int(load_manifest(index_dir)["bucket_bits"])

    def local_dfs(self, terms: list[str]) -> dict[str, int]:
        out = dict.fromkeys(terms, 0)
        for e in self.engines:
            for t, v in e.local_dfs(terms).items():
                out[t] += v
        return out

    def local_df_tcs(self, terms: list[str]) -> dict[str, int]:
        out = dict.fromkeys(terms, 0)
        for e in self.engines:
            for t, v in e.local_df_tcs(terms).items():
                out[t] += v
        return out

    def search_raw(self, query: str, df_override: dict, df_tc_override=None):
        cands_l, scores_l, pure_filter = [], [], False
        for e in self.engines:
            cands, scores, pure_filter = e.search_raw(
                query, df_override, df_tc_override=df_tc_override
            )
            cands_l.append(cands)
            scores_l.append(scores)
        return (
            np.concatenate(cands_l),
            np.concatenate(scores_l),
            pure_filter,
        )

    def topk(self, query: str, k: int, df_override: dict):
        merged = []
        for e in self.engines:
            merged.extend(e.search_topk_wand(query, k, df_override))
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def hydrate(
        self, ids: list[int], scores: list[float], highlight_terms=None
    ) -> list[dict]:
        ids_np = np.asarray(ids, dtype=np.int64)
        scores_np = np.asarray(scores, dtype=np.float64)
        if len(self.engines) == 1:
            return self.engines[0].hydrate(
                ids_np, scores_np, highlight_terms=highlight_terms
            )
        # route each id to its owning bucket engine, preserve caller order
        from ..index.segments import range_bucket

        buckets = range_bucket(ids_np, self._bucket_bits)
        out: list = [None] * len(ids_np)
        for j, e in zip(self.buckets, self.engines):
            idx = np.flatnonzero(buckets == j)
            if len(idx):
                rows = e.hydrate(
                    ids_np[idx], scores_np[idx], highlight_terms=highlight_terms
                )
                for i, row in zip(idx.tolist(), rows):
                    out[i] = row
        return out

    def rss_mb(self) -> float:
        """Peak RSS of this bucket's dedicated process, MB — the
        per-actor memory number the 10^12-doc sharding claim needs
        (each bucket actor holds 1/2^bucket_bits of the index)."""
        import resource

        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


class DistributedSearch:
    """Coordinator over the bucket actors (one per docID range by
    default; ``buckets_per_actor`` > 1 groups contiguous buckets into
    per-node serving daemons — identical results, narrower fan-out)."""

    def __init__(self, index_dir: str, buckets_per_actor: int = 1, **engine_kwargs):
        self.algorithm = engine_kwargs.get("algorithm", "bm25")
        manifest = load_manifest(index_dir)
        self.n_buckets = 1 << int(manifest["bucket_bits"])
        # per-language analyzer mappings resolve with the session's
        # query_lang (same contract as SearchEngine.query_lang)
        from ..functions.analyzers import resolve_analyzer

        self.analyzer = resolve_analyzer(
            manifest.get("analyzer", "default"),
            engine_kwargs.get("query_lang"),
        )
        per = max(1, int(buckets_per_actor))
        groups = [
            list(range(j, min(j + per, self.n_buckets)))
            for j in range(0, self.n_buckets, per)
        ]
        self.actors = [
            _BucketActor.remote(index_dir, g, engine_kwargs) for g in groups
        ]
        self._actor_of_bucket = {
            b: i for i, g in enumerate(groups) for b in g
        }
        self.bucket_bits = int(manifest["bucket_bits"])
        from ..scoring.config import ScoringConfig

        self.config = ScoringConfig.from_json(
            __import__("json").dumps(manifest["config"])
        )
        self._df_cache: dict[str, int] = {}
        self._df_tc_cache: dict[str, int] = {}

    # ---- global statistics --------------------------------------------
    def _query_terms(self, query: str) -> set[str]:
        terms: set[str] = set()
        for t in walk_terms(parse_query(query)):
            terms.update(analyze(t.value, self.analyzer))
        return terms

    def _global_dfs(self, query: str) -> dict[str, int]:
        terms = self._query_terms(query)
        missing = [t for t in terms if t not in self._df_cache]
        if missing:
            parts = ray.get([a.local_dfs.remote(missing) for a in self.actors])
            for t in missing:
                self._df_cache[t] = sum(p[t] for p in parts)
        return {t: self._df_cache[t] for t in terms}

    def _global_df_tcs(self, query: str) -> dict[str, int] | None:
        """TFIDF's second statistics exchange: docs-with-term-in-
        title-or-content summed across buckets (the reference's
        updateDocumentFrequencies, SearchScorer.cpp:358-375). Only the
        tfidf algorithm consumes it; bm25/combined return None."""
        if self.algorithm != "tfidf":
            return None
        terms = self._query_terms(query)
        missing = [t for t in terms if t not in self._df_tc_cache]
        if missing:
            parts = ray.get([a.local_df_tcs.remote(missing) for a in self.actors])
            for t in missing:
                self._df_tc_cache[t] = sum(p[t] for p in parts)
        return {t: self._df_tc_cache[t] for t in terms}

    # ---- fidelity path -------------------------------------------------
    def search(
        self, query: str, limit: int = 10, offset: int = 0, highlight: bool = False
    ) -> dict:
        dfs = self._global_dfs(query)
        df_tcs = self._global_df_tcs(query)
        parts = ray.get(
            [a.search_raw.remote(query, dfs, df_tcs) for a in self.actors]
        )
        cands = np.concatenate([p[0] for p in parts])
        scores = np.concatenate([p[1] for p in parts])
        pure_filter = parts[0][2]
        if len(cands) == 0:
            return {"total": 0, "results": []}
        # global tail, identical to SearchEngine.finish_search: min-score
        # filter -> global min-max normalize -> (-score, doc_id) sort ->
        # paginate. No docstore lives on the coordinator.
        if not pure_filter:
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
        hl = None
        if highlight:
            ast = parse_query(query)
            hl = []
            for t in walk_terms(ast):
                hl.extend(analyze(t.value, self.analyzer))
        return {
            "total": total,
            "results": self._hydrate_via_actors(cands, scores, highlight_terms=hl),
        }

    def _hydrate_via_actors(
        self,
        cands: np.ndarray,
        scores: np.ndarray,
        highlight_terms: list[str] | None = None,
    ) -> list[dict]:
        """Result rows come from the OWNING bucket actors (the forward
        index never materializes on the coordinator); order preserved."""
        if len(cands) == 0:
            return []
        from ..index.segments import range_bucket

        buckets = range_bucket(cands, self.bucket_bits)
        owner = np.asarray(
            [self._actor_of_bucket[int(j)] for j in buckets], dtype=np.int64
        )
        refs, slots = [], []
        for ai in range(len(self.actors)):
            idx = np.flatnonzero(owner == ai)
            if len(idx):
                refs.append(
                    self.actors[ai].hydrate.remote(
                        cands[idx].tolist(), scores[idx].tolist(), highlight_terms
                    )
                )
                slots.append(idx)
        out: list = [None] * len(cands)
        for idx, rows in zip(slots, ray.get(refs)):
            for i, row in zip(idx.tolist(), rows):
                out[i] = row
        return out

    def rank(self, query: str, top_k: int = 0) -> list[tuple[int, float]]:
        r = self.search(query, limit=top_k or 0)
        return [(x["doc_id"], x["score"]) for x in r["results"]]

    # ---- scatter-gather top-k -----------------------------------------
    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Per-bucket block-max top-k, k results per bucket travel,
        final (score desc, doc_id asc) merge — raw scores.

        Phrase/filter queries (and non-bm25 engines) make the bucket
        actors fall back to their LOCAL fidelity path whose scores are
        bucket-normalized — incomparable across buckets — so the
        coordinator routes those through the global fidelity path."""
        from ..query.parser import Filter as _F, And as _A, Or as _O
        from ..query.plan import exact_phrases as _ep

        ast = parse_query(query)

        def has_filter(node):
            if isinstance(node, _F):
                return True
            if isinstance(node, (_A, _O)):
                return any(has_filter(c) for c in node.children)
            return False

        if _ep(ast) or has_filter(ast) or self.algorithm != "bm25":
            # non-bm25 bucket actors would fall back to their LOCAL
            # fidelity path (bucket-normalized scores, incomparable
            # across buckets) — route through the global fidelity path
            r = self.search(query, limit=k)
            return [(x["doc_id"], x["score"]) for x in r["results"]]
        dfs = self._global_dfs(query)
        parts = ray.get([a.topk.remote(query, k, dfs) for a in self.actors])
        merged = [item for p in parts for item in p]
        merged.sort(key=lambda t: (-t[1], t[0]))
        return merged[:k]

    def actor_rss_mb(self) -> list[float]:
        """Peak RSS per bucket actor, MB (one dedicated process per
        docID-range bucket)."""
        return ray.get([a.rss_mb.remote() for a in self.actors])

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
