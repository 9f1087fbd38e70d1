"""CLI entrypoint (argparse core shared by local `python -m` use and the
spark-submit wrapper).

Production shape (north_rule; see scripts/submit_build.sh which does
exactly this):

    zip -r pkg.zip parser_indexer_py_spark
    spark-submit --py-files pkg.zip \\
        --master <cluster> [--packages org.apache.iceberg:...] \\
        scripts/submit_main.py build \\
        --input <table-or-parquet> --out /data/index

Subcommands:
  build   — build/resume the index from a transcripts table
  search  — run a BM25 top-k query against an index
  select  — Solr-style request: Lucene classic q (groups/fuzzy/phrases),
            fq, pagination, sort, facet.field / facet.range, grouping, hl
  gen     — write a deterministic synthetic transcripts corpus
  terms   — /terms handler: term-dictionary enumeration (prefix, mincount)
  tvrh    — /tvrh handler: per-document term vectors
  stats   — StatsComponent: stats.field over a docmap column (+ stats.facet)
  elevate — /elevate handler: editorial pins above the organic ranking
  cluster — /clustering handler: label-clustered top-k results
  suggest — /suggest handler: fuzzy weighted completion over a docmap field
            (or --dict, a prebuilt pruned dictionary)
  build-suggest — build the suggester dictionary parquet (suggest.build)
  analyze — /analysis/field handler: stage-by-stage analyzer breakdown

In local mode the session factory propagates PYTHONPATH so --py-files is
optional; on a cluster the zip is required (executors have no repo checkout).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="parser_indexer_py_spark")
    p.add_argument("--cores", type=int, default=None, help="local[N] threads")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True, help="parquet path or table of transcripts")
    b.add_argument("--out", required=True)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--salt", type=int, default=8)
    b.add_argument("--chunks", type=int, default=4)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument(
        "--positions", action="store_true",
        help="store positional postings (enables phrase / pf queries)",
    )

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=["full", "pruned"], default="pruned")
    s.add_argument("--role", default=None)
    s.add_argument("--and", dest="conjunctive", action="store_true")
    s.add_argument(
        "--synonyms", default=None,
        help="Solr-format synonyms.txt applied at query time (expand=true)",
    )
    s.add_argument(
        "--excerpt", action="store_true",
        help="attach an F11 sentence excerpt to each hit",
    )

    sel = sub.add_parser("select")
    sel.add_argument("--index", required=True)
    sel.add_argument("-q", default="*:*")
    sel.add_argument("--fq", action="append", default=None)
    sel.add_argument("--rows", type=int, default=10)
    sel.add_argument("--start", type=int, default=0)
    sel.add_argument("--sort", default=None)
    sel.add_argument("--fl", default=None, help="comma-separated columns")
    sel.add_argument("--q-op", choices=["OR", "AND"], default="OR")
    sel.add_argument("--facet-field", default=None)
    sel.add_argument(
        "--facet-range", default=None, help="field:start:end:gap"
    )
    sel.add_argument(
        "--facet-mincount", type=int, default=0,
        help="drop facet values counting below this (facet.mincount)",
    )
    sel.add_argument(
        "--facet-missing", action="store_true",
        help="append the NULL-value bucket after the ranked values",
    )
    sel.add_argument(
        "--facet-range-other", default=None,
        help="comma list from before,after,between — or 'all' "
        "(facet.range.other; needs --facet-range)",
    )
    sel.add_argument("--group-field", default=None)
    sel.add_argument(
        "--group-rows", type=int, default=100,
        help="max group rows printed (grouping returns one row per "
        "distinct field value — unbounded on a big corpus)",
    )
    sel.add_argument("--hl", action="store_true")
    sel.add_argument("--hl-fragsize", type=int, default=100)
    sel.add_argument("--hl-snippets", type=int, default=1)
    sel.add_argument("--mode", choices=["full", "pruned"], default="pruned")
    sel.add_argument(
        "--facet-pivot", default=None, help="comma-separated fields (2-3)"
    )
    sel.add_argument(
        "--facet-query", action="append", default=None,
        help="repeatable facet.query sub-query",
    )
    sel.add_argument(
        "--cursor-mark", default=None,
        help="'*' or a mark from a previous page; switches to cursorMark "
        "deep paging (start must stay 0) and prints next_cursor_mark",
    )

    g = sub.add_parser("gen")
    g.add_argument("--convs", type=int, required=True)
    g.add_argument("--out", required=True)

    t = sub.add_parser("terms")
    t.add_argument("--index", required=True)
    t.add_argument("--prefix", default="")
    t.add_argument("--mincount", type=int, default=1)
    t.add_argument("--limit", type=int, default=10)
    t.add_argument("--sort", choices=["count", "index"], default="count")

    tv = sub.add_parser("tvrh")
    tv.add_argument("--index", required=True)
    tv.add_argument("--docs", required=True, help="comma-separated doc ids")
    tv.add_argument("--no-positions", action="store_true")

    st = sub.add_parser("stats")
    st.add_argument("--index", required=True)
    st.add_argument("--field", required=True)
    st.add_argument("--facet", default=None, help="stats.facet group field")

    el = sub.add_parser("elevate")
    el.add_argument("--index", required=True)
    el.add_argument("--query", required=True)
    el.add_argument(
        "--ids", required=True,
        help="comma-separated pinned ids, editorial order",
    )
    el.add_argument(
        "--key", default=None,
        help="docmap column the ids refer to (default: internal doc ids)",
    )
    el.add_argument("-k", type=int, default=10)
    el.add_argument("--no-force", action="store_true")
    el.add_argument("--mode", choices=["full", "pruned"], default="full")

    sg = sub.add_parser("suggest")
    sg.add_argument("--index", required=True)
    sg.add_argument("--query", required=True)
    sg.add_argument("--field", default="text",
                    help="docmap column used as the suggestion dictionary")
    sg.add_argument("--weight-field", default=None)
    sg.add_argument("--count", type=int, default=20)
    sg.add_argument("--max-edits", type=int, default=1)
    sg.add_argument("--dict", default=None,
                    help="prebuilt dictionary parquet (build-suggest "
                         "output) — the pruned serving path")

    sb = sub.add_parser("build-suggest")
    sb.add_argument("--index", required=True)
    sb.add_argument("--out", required=True)
    sb.add_argument("--field", default="text")
    sb.add_argument("--weight-field", default=None)

    cl = sub.add_parser("cluster")
    cl.add_argument("--index", required=True)
    cl.add_argument("--query", required=True)
    cl.add_argument("-k", type=int, default=20)
    cl.add_argument("--clusters", type=int, default=5)
    cl.add_argument("--mode", choices=["full", "pruned"], default="full")

    ex = sub.add_parser("explain")
    ex.add_argument("--index", required=True)
    ex.add_argument("--query", required=True)
    ex.add_argument("-k", type=int, default=10)

    xp = sub.add_parser("export")
    xp.add_argument("--index", required=True)
    xp.add_argument("-q", required=True)
    xp.add_argument("--out", required=True)
    xp.add_argument("--sort", required=True, help="non-score Solr sort")
    xp.add_argument("--fq", action="append", default=None)
    xp.add_argument("--fl", default=None, help="comma-separated columns")
    xp.add_argument("--format", choices=["parquet", "jsonl"], default="parquet")

    pa = sub.add_parser("parent")
    pa.add_argument("--index", required=True)
    pa.add_argument("-q", required=True)
    pa.add_argument("-k", type=int, default=10)
    pa.add_argument(
        "--score-mode", default="max",
        choices=["max", "total", "avg", "min", "none"],
    )
    pa.add_argument("--min-children", type=int, default=1)
    pa.add_argument("--fq", action="append", default=None)

    sm = sub.add_parser("sample")
    sm.add_argument("--input", required=True, help="parquet path")
    sm.add_argument("--out", required=True)
    sm.add_argument("--id-col", required=True)
    sm.add_argument("--fraction", type=float, required=True)
    sm.add_argument("--salt", default="s1")

    sp2 = sub.add_parser("split")
    sp2.add_argument("--input", required=True, help="parquet path")
    sp2.add_argument("--out", required=True)
    sp2.add_argument("--id-col", required=True)
    sp2.add_argument(
        "--splits", required=True,
        help="name=frac,name=frac (fractions sum to 1), e.g. "
             "train=0.98,val=0.01,test=0.01",
    )
    sp2.add_argument("--salt", default="s1")

    pk = sub.add_parser("pack")
    pk.add_argument("--input", required=True, help="parquet path")
    pk.add_argument("--out", required=True)
    pk.add_argument("--id-col", required=True)
    pk.add_argument("--len-col", required=True)
    pk.add_argument("--budget", type=int, required=True)

    mx = sub.add_parser("mix")
    mx.add_argument("--input", required=True, help="parquet path")
    mx.add_argument("--out", required=True)
    mx.add_argument("--group-col", required=True)
    mx.add_argument("--temperature", type=float, required=True)
    mx.add_argument("--id-col", default="doc_id")
    mx.add_argument("--salt", default="mix")

    cc = sub.add_parser("components")
    cc.add_argument("--nodes", required=True, help="parquet path")
    cc.add_argument("--edges", required=True, help="parquet path of pairs")
    cc.add_argument("--out", required=True)
    cc.add_argument("--id-col", default="doc_id")
    cc.add_argument("--src-col", default="a")
    cc.add_argument("--dst-col", default="b")

    an = sub.add_parser("analyze")
    an.add_argument("--text", required=True)
    an.add_argument("-q", default=None, help="query for analysis.showmatch")
    an.add_argument(
        "--synonyms", default=None, help="Solr-format synonyms.txt"
    )

    args = p.parse_args(argv)

    if args.cmd == "analyze":
        # driver-side debug handler: no Spark session needed
        from .functions.analyzer import field_analysis, parse_synonyms

        syn = None
        if args.synonyms:
            with open(args.synonyms) as f:
                syn = parse_synonyms(f)
        print(json.dumps(field_analysis(args.text, synonyms=syn, query=args.q)))
        return 0

    from .session import get_spark

    spark = get_spark(f"cli-{args.cmd}", cores=args.cores)

    if args.cmd == "gen":
        from .datagen import generate_transcripts

        generate_transcripts(spark, args.convs).write.mode("overwrite").parquet(
            args.out
        )
        print(json.dumps({"written": args.out, "convs": args.convs}))
        return 0

    if args.cmd == "build":
        from .index.build import build_index

        import os

        t0 = time.time()
        # path vs table: anything that exists on disk, carries a path
        # separator, or has a parquet suffix is a file path; only bare
        # catalog identifiers go to read.table (round-2 review: a
        # slash-free relative path like 'transcripts.parquet' used to be
        # misrouted to the table reader)
        is_path = (
            os.path.exists(args.input)
            or "/" in args.input
            or args.input.endswith(".parquet")
        )
        df = (
            spark.read.parquet(args.input)
            if is_path
            else spark.read.table(args.input)
        )
        build_index(
            spark,
            df,
            args.out,
            n_buckets=args.buckets,
            salt=args.salt,
            n_chunks=args.chunks,
            resume=not args.no_resume,
            positions=args.positions,
        )
        from .index.search import load_index

        idx = load_index(spark, args.out)
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "built": args.out,
                    "n_docs": idx.n_docs,
                    "seconds": round(dt, 2),
                    "turns_per_sec": round(idx.n_docs / dt, 1),
                }
            )
        )
        return 0

    if args.cmd == "search":
        from .index.search import load_index, search

        idx = load_index(spark, args.index)
        syn = None
        if args.synonyms:
            from .functions.analyzer import parse_synonyms

            with open(args.synonyms) as f:
                syn = parse_synonyms(f)
        t0 = time.time()
        rows = search(
            idx,
            args.query,
            k=args.k,
            mode=args.mode,
            role=args.role,
            conjunctive=args.conjunctive,
            synonyms=syn,
            with_excerpt=args.excerpt,
        ).collect()
        print(
            json.dumps(
                {
                    "query": args.query,
                    "seconds": round(time.time() - t0, 3),
                    "hits": [
                        {
                            "doc_id": r["doc_id"],
                            "score": r["score"],
                            "conv_id": r["conv_id"],
                            "turn_idx": r["turn_idx"],
                            **(
                                {"excerpt": r["excerpt"]}
                                if args.excerpt
                                else {}
                            ),
                        }
                        for r in rows
                    ],
                }
            )
        )
        return 0

    if args.cmd == "export":
        from .index.export import export_results
        from .index.search import load_index

        idx = load_index(spark, args.index)
        t0 = time.time()
        res = export_results(
            idx, args.q, args.out, sort=args.sort, fq=args.fq,
            fl=args.fl.split(",") if args.fl else None, fmt=args.format,
        )
        res["seconds"] = round(time.time() - t0, 3)
        print(json.dumps(res))
        return 0

    if args.cmd == "sample":
        from .operators.sampling import sample_hash_gate

        df = spark.read.parquet(args.input)
        out = sample_hash_gate(
            df, args.id_col, args.fraction, salt=args.salt
        )
        out.write.mode("errorifexists").parquet(args.out)
        print(json.dumps({
            "written": args.out, "rows": spark.read.parquet(args.out).count(),
            "of": df.count(), "fraction": args.fraction,
        }))
        return 0

    if args.cmd == "split":
        from .operators.sampling import assign_splits

        fractions = {}
        for part in args.splits.split(","):
            name, frac = part.split("=")
            fractions[name.strip()] = float(frac)
        df = spark.read.parquet(args.input)
        out = assign_splits(df, args.id_col, fractions, salt=args.salt)
        out.write.mode("errorifexists").partitionBy("split").parquet(args.out)
        back = spark.read.parquet(args.out)
        from pyspark.sql import functions as _F

        per = {
            r["split"]: r["n"]
            for r in back.groupBy("split").agg(
                _F.count("*").alias("n")
            ).collect()
        }
        print(json.dumps({"written": args.out, "per_split": per}))
        return 0

    if args.cmd == "pack":
        from .operators.packing import pack_offsets

        df = spark.read.parquet(args.input)
        out = pack_offsets(df, args.id_col, args.len_col, args.budget)
        out.write.mode("errorifexists").parquet(args.out)
        back = spark.read.parquet(args.out)
        from pyspark.sql import functions as _F

        g = back.agg(
            _F.count("*").alias("rows"),
            (_F.max(_F.col("offset") + _F.col("len"))).alias("stream_len"),
            _F.max("seq_last").alias("n_seqs_minus_1"),
        ).collect()[0]
        print(json.dumps({
            "written": args.out, "rows": g["rows"],
            "stream_len": g["stream_len"],
            "n_sequences": int(g["n_seqs_minus_1"]) + 1,
            "budget": args.budget,
        }))
        return 0

    if args.cmd == "mix":
        from .operators.mixing import temperature_mix, temperature_rates

        df = spark.read.parquet(args.input)
        out = temperature_mix(
            df, args.group_col, args.temperature,
            id_col=args.id_col, salt=args.salt,
        )
        out.write.mode("errorifexists").parquet(args.out)
        rates = {
            r[args.group_col]: {"n": r["n"], "rate": r["rate"]}
            for r in temperature_rates(
                df, args.group_col, args.temperature
            ).collect()
        }
        print(json.dumps({
            "written": args.out,
            "rows": spark.read.parquet(args.out).count(),
            "of": df.count(), "temperature": args.temperature,
            "rates": rates,
        }))
        return 0

    if args.cmd == "components":
        from pyspark.sql import functions as _F

        from .operators.components import connected_components

        nodes = spark.read.parquet(args.nodes)
        edges = spark.read.parquet(args.edges)
        out = connected_components(
            nodes, edges, id_col=args.id_col,
            src_col=args.src_col, dst_col=args.dst_col,
        )
        out.write.mode("errorifexists").parquet(args.out)
        back = spark.read.parquet(args.out)
        g = back.agg(
            _F.count("*").alias("rows"),
            _F.countDistinct("component").alias("n_components"),
        ).collect()[0]
        print(json.dumps({
            "written": args.out, "rows": g["rows"],
            "n_components": g["n_components"],
        }))
        return 0

    if args.cmd == "parent":
        from .index.blockjoin import parent_search
        from .index.search import load_index

        idx = load_index(spark, args.index)
        rows = parent_search(
            idx, args.q, k=args.k, score_mode=args.score_mode,
            fq=args.fq, min_children=args.min_children,
        ).collect()
        for r in rows:
            print(json.dumps({
                "parent": r["parent"], "score": r["score"],
                "n_matched": r["n_matched"],
            }))
        return 0

    if args.cmd == "explain":
        from .index.debug import explain
        from .index.search import load_index

        idx = load_index(spark, args.index)
        t0 = time.time()
        rows = [r.asDict() for r in explain(idx, args.query, k=args.k).collect()]
        print(json.dumps({
            "q": args.query, "explain": rows,
            "seconds": round(time.time() - t0, 3),
        }, default=str))
        return 0

    if args.cmd == "select":
        from .index.boolean import select
        from .index.search import load_index

        idx = load_index(spark, args.index)
        if args.cursor_mark is not None:
            from .index.boolean import cursor_page

            if args.start:
                raise SystemExit("cursorMark paging forbids --start")
            t0 = time.time()
            out = cursor_page(
                idx, args.q, rows=args.rows, sort=args.sort,
                cursor_mark=args.cursor_mark, fq=args.fq,
                q_op=args.q_op,
                fl=args.fl.split(",") if args.fl else None,
            )
            resp = [r.asDict() for r in out["response"].collect()]
            print(json.dumps({
                "q": args.q,
                "response": resp,
                "next_cursor_mark": out["next_cursor_mark"](),
                "seconds": round(time.time() - t0, 3),
            }, default=str))
            return 0
        fr = None
        if args.facet_range:
            fld, lo, hi, gap = args.facet_range.split(":")
            fr = (fld, int(lo), int(hi), int(gap))
        t0 = time.time()
        res = select(
            idx,
            q=args.q,
            fq=args.fq,
            rows=args.rows,
            start=args.start,
            sort=args.sort,
            fl=args.fl.split(",") if args.fl else None,
            q_op=args.q_op,
            facet_field=args.facet_field,
            facet_mincount=args.facet_mincount,
            facet_missing=args.facet_missing,
            facet_range=fr,
            facet_range_other=(
                "all" if args.facet_range_other == "all"
                else args.facet_range_other.split(",")
            ) if args.facet_range_other else None,
            facet_pivot=(
                args.facet_pivot.split(",") if args.facet_pivot else None
            ),
            facet_query=args.facet_query,
            group_field=args.group_field,
            hl=args.hl,
            hl_fragsize=args.hl_fragsize,
            hl_snippets=args.hl_snippets,
            mode=args.mode,
        )
        out = {"q": args.q}
        if res["response"] is not None:
            out["response"] = [
                r.asDict() for r in res["response"].collect()
            ]
        for key in ("facets", "range_facets", "range_other",
                    "pivot_facets", "query_facets", "groups",
                    "highlighting"):
            if res[key] is not None:
                df = res[key]
                if key == "groups":
                    # one row per distinct group value — cap the driver
                    # collect (review finding, round 4)
                    df = df.limit(args.group_rows)
                out[key] = [r.asDict() for r in df.collect()]
        out["seconds"] = round(time.time() - t0, 3)
        print(json.dumps(out, default=str))
        return 0

    if args.cmd == "build-suggest":
        from .index.components import build_suggest_dict
        from .index.search import load_index

        idx = load_index(spark, args.index)
        t0 = time.time()
        build_suggest_dict(
            idx.docmap, args.out, field=args.field,
            weight_field=args.weight_field,
        )
        print(json.dumps({
            "cmd": "build-suggest", "out": args.out,
            "seconds": round(time.time() - t0, 3),
        }))
        return 0

    if args.cmd in ("terms", "tvrh", "stats", "elevate", "cluster", "suggest"):
        from .index.search import load_index

        idx = load_index(spark, args.index)
        t0 = time.time()
        if args.cmd == "terms":
            from .index.components import terms_enum

            df = terms_enum(
                idx, args.prefix, mincount=args.mincount,
                limit=args.limit, sort=args.sort,
            )
        elif args.cmd == "tvrh":
            from .index.components import term_vectors

            df = term_vectors(
                idx,
                [int(d) for d in args.docs.split(",")],
                with_positions=not args.no_positions,
            )
        elif args.cmd == "stats":
            from .index.components import stats_field

            df = stats_field(idx.docmap, args.field, by=args.facet)
        elif args.cmd == "elevate":
            from .index.components import elevate

            df = elevate(
                idx, args.query, args.ids.split(","), k=args.k,
                key=args.key, force=not args.no_force, mode=args.mode,
            )
        elif args.cmd == "suggest":
            from .index.components import suggest

            if args.dict:
                df = suggest(
                    spark.read.parquet(args.dict), args.query,
                    count=args.count, max_edits=args.max_edits,
                    prebuilt=True,
                )
            else:
                df = suggest(
                    idx.docmap, args.query, field=args.field,
                    weight_field=args.weight_field, count=args.count,
                    max_edits=args.max_edits,
                )
        else:
            from .index.components import cluster_results

            df = cluster_results(
                idx, args.query, k=args.k,
                clusters=args.clusters, mode=args.mode,
            )
        rows = [r.asDict() for r in df.collect()]
        print(
            json.dumps(
                {
                    "cmd": args.cmd,
                    "seconds": round(time.time() - t0, 3),
                    "rows": rows,
                },
                default=str,
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
