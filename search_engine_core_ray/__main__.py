"""CLI entry points: build an index, query it, synthesize a corpus.

    python -m search_engine_core_ray synth  --out /tmp/pages --n 20000
    python -m search_engine_core_ray build  --pages /tmp/pages --index /tmp/idx
    python -m search_engine_core_ray build  --from-documents /root/testdata/sf0.01 --index /tmp/idx
    python -m search_engine_core_ray search --index /tmp/idx "machine OR python" --limit 5

The CLI owns the Ray session (the library never calls ray.init).
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if num_cpus:
            kw["num_cpus"] = num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="search_engine_core_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_synth = sub.add_parser("synth", help="generate a deterministic page corpus")
    p_synth.add_argument("--out", required=True)
    p_synth.add_argument("--n", type=int, default=10000)
    p_synth.add_argument("--seed", type=int, default=42)

    p_build = sub.add_parser("build", help="build the inverted index")
    src = p_build.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages", help="parquet dir with (url, warc_ts, html, text, lang)")
    src.add_argument("--from-documents", help="sf dir with documents.parquet")
    p_build.add_argument("--index", required=True)
    p_build.add_argument("--num-shards", type=int, default=32)
    p_build.add_argument("--bucket-bits", type=int, default=2)
    p_build.add_argument("--analyzer", default="default",
                         choices=["default", "en_stem"])
    p_build.add_argument("--lineage", default="cli")

    p_search = sub.add_parser("search", help="query an index")
    p_search.add_argument("--index", required=True)
    p_search.add_argument("query")
    p_search.add_argument("--limit", type=int, default=10)
    p_search.add_argument("--offset", type=int, default=0)
    p_search.add_argument("--algorithm", default="bm25",
                          choices=["bm25", "tfidf", "combined"])
    p_search.add_argument("--highlight", action="store_true",
                          help="tag matched terms in title/snippet (searchSimple)")
    p_search.add_argument("--fast", action="store_true",
                          help="pruned top-k serving path (raw scores)")

    p_sug = sub.add_parser("suggest", help="prefix autocomplete (FT.SUGGET analog)")
    p_sug.add_argument("--index", required=True)
    p_sug.add_argument("prefix")
    p_sug.add_argument("--limit", type=int, default=10)

    p_upd = sub.add_parser(
        "update", help="upsert a pages delta into an index (new generation)"
    )
    p_upd.add_argument("--index", required=True, help="existing index dir")
    p_upd.add_argument("--pages", required=True, help="parquet dir with the delta")
    p_upd.add_argument("--out", required=True, help="output dir for the new generation")
    p_upd.add_argument("--num-shards", type=int, default=32)
    p_upd.add_argument("--bucket-bits", type=int, default=2)
    p_upd.add_argument("--lineage", default="cli-update")

    p_mrg = sub.add_parser(
        "merge",
        help="segment-merge built indexes (oldest..newest) into a new "
             "generation without re-tokenizing — later generations "
             "upsert earlier ones; tombstones applied",
    )
    p_mrg.add_argument("indexes", nargs="+", help="input index dirs, oldest first")
    p_mrg.add_argument("--out", required=True)
    p_mrg.add_argument("--codec", default=None, choices=[None, "vbyte", "pfor", "ef"])
    p_mrg.add_argument("--lineage", default="cli-merge")

    p_exp = sub.add_parser(
        "export-training",
        help="resumable partitioned export of the training-data flagship "
             "(prepare_training_data -> hive buckets with per-partition "
             "commit markers; a rerun skips finished buckets)",
    )
    p_exp.add_argument("--sf-dir", required=True)
    p_exp.add_argument("--out", required=True)
    p_exp.add_argument("--buckets", type=int, default=8)
    p_exp.add_argument("--lineage", default="cli-export")
    p_exp.add_argument(
        "--recipe", default="v1", choices=["v1", "v2"],
        help="v1 = exact-dedup only; v2 = the full published recipe "
             "(+ MinHash near-dup drop + duplicated-span removal)",
    )

    p_cat = sub.add_parser(
        "catalog",
        help="run any operator-catalog entry over an sf dir; print the "
             "first rows or write partitioned parquet with --out",
    )
    p_cat.add_argument("name", help="entry name (see catalog --list)")
    p_cat.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p_cat.add_argument("--out", default=None, help="parquet output dir")
    p_cat.add_argument("--head", type=int, default=10)
    p_cat.add_argument("--list", action="store_true", dest="list_entries")

    args = ap.parse_args(argv)

    if args.cmd == "synth":
        ray = _init_ray(args.num_cpus)
        from .corpus.synth import SynthConfig, synth_pages_ds

        synth_pages_ds(SynthConfig(n_docs=args.n, seed=args.seed)).write_parquet(args.out)
        print(json.dumps({"out": args.out, "n_docs": args.n}))
        ray.shutdown()
        return 0

    if args.cmd == "build":
        ray = _init_ray(args.num_cpus)
        import ray.data

        from .index.build import build_index
        from .sources.pages import read_documents_as_pages, read_pages

        pages = (
            read_pages(args.pages)
            if args.pages
            else read_documents_as_pages(args.from_documents)
        )
        r = build_index(
            pages, args.index, num_shards=args.num_shards,
            bucket_bits=args.bucket_bits, analyzer=args.analyzer,
            lineage=args.lineage,
        )
        print(json.dumps({
            "index": args.index, "docs": r.stats.total_docs,
            "avgdl": round(r.stats.avgdl, 2), "shards": r.n_segments,
            "build_seconds": round(r.metrics["build_seconds"], 2),
        }))
        ray.shutdown()
        return 0

    if args.cmd == "search":
        from .query.engine import SearchEngine
        from .query.parser import ParseError

        eng = SearchEngine(args.index, algorithm=args.algorithm)
        try:
            fn = eng.search_fast if args.fast else eng.search
            out = fn(
                args.query, limit=args.limit, offset=args.offset,
                highlight=args.highlight,
            )
        except ParseError as e:
            print(json.dumps({"error": str(e)}), file=sys.stderr)
            return 2
        print(json.dumps(out, indent=1))
        return 0

    if args.cmd == "suggest":
        from .query.engine import SearchEngine

        eng = SearchEngine(args.index)
        print(json.dumps(eng.suggest(args.prefix, limit=args.limit)))
        return 0

    if args.cmd == "update":
        ray = _init_ray(args.num_cpus)

        from .index.update import add_pages
        from .sources.pages import read_pages

        r = add_pages(
            args.index, read_pages(args.pages), args.out,
            num_shards=args.num_shards, bucket_bits=args.bucket_bits,
            lineage=args.lineage,
        )
        print(json.dumps({
            "out": args.out, "docs": r.stats.total_docs,
            "avgdl": round(r.stats.avgdl, 2),
        }))
        ray.shutdown()
        return 0

    if args.cmd == "merge":
        ray = _init_ray(args.num_cpus)

        from .index.update import merge_indexes

        r = merge_indexes(
            args.indexes, args.out, codec=args.codec, lineage=args.lineage
        )
        print(json.dumps({
            "out": args.out, "docs": r.stats.total_docs,
            "codec": r.metrics["codec"], "segments": r.n_segments,
        }))
        ray.shutdown()
        return 0

    if args.cmd == "export-training":
        ray = _init_ray(args.num_cpus)
        import pyarrow as pa
        import pyarrow.compute as pc

        from .pipelines.catalog import QUERIES
        from .state.sink import write_resumable_partitions

        nb = args.buckets
        recipe = (
            "prepare_training_data_v2" if args.recipe == "v2"
            else "prepare_training_data"
        )
        ds = QUERIES[recipe](args.sf_dir).map_batches(
            lambda b, _n=nb: b.append_column(
                "bucket",
                pc.cast(
                    pc.subtract(
                        b.column("seq_id"),
                        pc.multiply(pc.divide(b.column("seq_id"), _n), _n),
                    ),
                    pa.int64(),
                ),
            ),
            batch_format="pyarrow",
        )
        m = write_resumable_partitions(
            ds, args.out, "bucket", args.lineage, range(nb)
        )
        print(json.dumps({"out": args.out, **m}))
        ray.shutdown()
        return 0

    if args.cmd == "catalog":
        from .pipelines.catalog import QUERIES

        if args.list_entries or args.name == "list":
            print(json.dumps(sorted(QUERIES)))
            return 0
        if args.name not in QUERIES:
            print(json.dumps({"error": f"unknown entry {args.name!r}"}),
                  file=sys.stderr)
            return 2
        ray = _init_ray(args.num_cpus)
        import pandas as pd
        import pyarrow as pa
        import ray.data

        out = QUERIES[args.name](args.sf_dir)
        if args.out:
            if isinstance(out, pa.Table):
                out = ray.data.from_arrow(out)
            elif isinstance(out, pd.DataFrame):
                out = ray.data.from_pandas(out)
            out.write_parquet(args.out)
            print(json.dumps({"out": args.out, "entry": args.name}))
        else:
            if isinstance(out, ray.data.Dataset):
                df = out.limit(args.head).to_pandas()
            elif isinstance(out, pa.Table):
                df = out.slice(0, args.head).to_pandas()
            else:
                df = out.head(args.head)
            print(df.to_string())
        ray.shutdown()
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
