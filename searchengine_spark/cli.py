"""Command-line surface mirroring the reference's three entry points
(SURVEY.md §3): indexer Main, interactive cli Main, and the batch
evaluation harness (QueryPerformancesMain).

  python -m searchengine_spark.cli build --input SRC --index-dir DIR
      [--no-stem-stop] [--no-compression] [--no-maxscore] [--partitions N]
      [--positions] [--fields] [--spellings]
  python -m searchengine_spark.cli query --index-dir DIR "terms..."
      [-k 10] [--conjunctive] [--scoring bm25|tfidf]
      [--maxscore [--blockmax] | --bmw | --correct]
  python -m searchengine_spark.cli repl --index-dir DIR   # warm session
  python -m searchengine_spark.cli eval --index-dir DIR --queries TSV
      --output DIR [-k 100] [--scoring bm25]
  python -m searchengine_spark.cli optimize --index-dir DIR  # blocks +
      packed artifacts for a streamed handoff (maintenance window)

``build --input`` accepts a parquet dir, a catalog (Iceberg) table
name, a ``pid\\ttext`` TSV (MS MARCO collection.tsv, the reference's
native format), a ``.tar.gz`` containing it (Spimi.java:71-81), a
``.jsonl``/``.ndjson``(.gz) document dump, or ``files:<dir>`` to
index a tree of raw source files (one doc per file, pid = path).
`eval` reads `qid\ttext` lines (QueryPerformancesMain.java:64-99) and
writes a trec_eval run file. On a cluster, submit with
``spark-submit --py-files searchengine_spark.zip path/to/launcher.py``
where launcher.py calls ``searchengine_spark.cli.main()``
(tools/package.py builds the zip and a launcher); locally it runs on
local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path


def _spark(app: str):
    from .session import get_spark

    s = get_spark(app)
    s.sparkContext.setLogLevel("WARN")
    return s


def cmd_build(args: argparse.Namespace) -> int:
    from .operators.indexer import IndexConfig, build_index
    from .sources.corpus import read_corpus, to_engine_docs
    from .sources.sinks import append_build_stats

    spark = _spark("se-build")
    docs = to_engine_docs(
        read_corpus(spark, args.input, schema=args.input_schema)
    )
    t0 = time.time()
    idx = build_index(
        docs,
        args.index_dir,
        IndexConfig(
            stem_stop=not args.no_stem_stop,
            compression=not args.no_compression,
            max_score=not args.no_maxscore,
            positions=args.positions,
            fields=args.fields,
            num_partitions=args.partitions,
            overwrite=args.overwrite,
        ),
    )
    if args.spellings:
        from .operators.suggest import build_spellings

        build_spellings(idx)
    total = time.time() - t0
    append_build_stats(idx, " ".join(sys.argv[1:]), total,
                       f"{args.index_dir}/indexerStatistics.tsv")
    print(f"built index in {total:.1f}s: {idx.stats}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from .operators.indexer import InvertedIndex
    from .operators.query import top_k

    if args.bmw and args.maxscore:
        raise SystemExit("--bmw and --maxscore are different pruning "
                         "strategies; pick one")
    if args.blockmax and not args.maxscore:
        raise SystemExit("--blockmax modifies --maxscore (BMW carries "
                         "its own block bounds); add --maxscore")
    if args.prf and (args.bmw or args.blockmax or args.conjunctive):
        raise SystemExit("--prf composes its own two disjunctive MaxScore "
                         "passes; drop --bmw/--blockmax/--conjunctive")
    if args.snippets and (args.bmw or args.blockmax or args.conjunctive
                          or args.prf):
        raise SystemExit("--snippets composes its own disjunctive ranking "
                         "pass; drop --bmw/--blockmax/--conjunctive/--prf")
    if args.snippets and not args.docs:
        raise SystemExit("--snippets renders from the corpus; add "
                         "--docs <parquet|table|TSV(.gz)|tar.gz>")
    if args.correct and (args.bmw or args.maxscore or args.prf
                         or args.snippets):
        raise SystemExit("--correct runs the plain evaluator over the "
                         "corrected terms; drop --bmw/--maxscore/--prf/"
                         "--snippets")
    spark = _spark("se-query")
    idx = InvertedIndex.load(spark, args.index_dir)
    t0 = time.time()
    if args.snippets:
        from .operators.phrase import search_with_snippets_rows
        from .sources.corpus import read_corpus, to_engine_docs

        if not idx.manifest.get("flags", {}).get("positions", False):
            raise SystemExit("index was built without the positions "
                             "stage; rebuild with --positions to "
                             "render snippets")
        docs = to_engine_docs(read_corpus(spark, args.docs))
        rows = search_with_snippets_rows(idx, docs, args.text, k=args.k,
                                         scoring=args.scoring)
        ms = (time.time() - t0) * 1000
        for _, pid, score, _start, _n, snippet in rows:
            print(f"{pid}\t{score:.10f}\t{snippet or ''}")
        print(f"({len(rows)} results in {ms:.0f} ms)")
        return 0
    if args.prf:
        from .operators.query import prf_topk_rows

        rows = [
            {"pid": p, "score": s}
            for _, p, s in prf_topk_rows(
                idx, args.text, k=args.k, fb_docs=args.fb_docs,
                fb_terms=args.fb_terms, scoring=args.scoring,
            )
        ]
        ms = (time.time() - t0) * 1000
        for r in rows:
            print(f"{r['pid']}\t{r['score']:.10f}")
        print(f"({len(rows)} results in {ms:.0f} ms)")
        return 0
    if args.bmw:
        from .operators.maxscore import bmw_topk

        if args.conjunctive:
            raise SystemExit("--bmw is disjunctive-only; "
                             "use --maxscore for conjunctive queries")
        res = bmw_topk(idx, args.text, k=args.k, scoring=args.scoring)
    elif args.maxscore:
        from .operators.maxscore import maxscore_topk

        res = maxscore_topk(idx, args.text, k=args.k,
                            conjunctive=args.conjunctive, scoring=args.scoring,
                            block_max=args.blockmax)
    elif args.correct:
        from .operators.query import top_k_terms
        from .operators.suggest import correct_query

        try:
            fixes = correct_query(idx, args.text)
        except ValueError as exc:  # no spellings/ artifact
            raise SystemExit(f"{exc} (rebuild with `build --spellings` "
                             f"or run suggest.build_spellings)")
        for t, c in fixes.items():
            if c is None:
                print(f"# no correction within 1 edit for '{t}' — dropped")
            elif c != t:
                print(f"# corrected '{t}' -> '{c}'")
        # order-preserving dedup: two inputs may correct to the SAME
        # vocab term, and the terms= evaluators require deduped terms
        # (duplicates double-count the partial scores)
        terms = list(dict.fromkeys(c for c in fixes.values() if c))
        res = top_k_terms(idx, terms, k=args.k,
                          conjunctive=args.conjunctive, scoring=args.scoring)
    else:
        res = top_k(idx, args.text, k=args.k,
                    conjunctive=args.conjunctive, scoring=args.scoring)
    rows = res.collect()
    ms = (time.time() - t0) * 1000
    for r in rows:
        print(f"{r['pid']}\t{r['score']:.10f}")
    print(f"({len(rows)} results in {ms:.0f} ms)")
    return 0


def cmd_optimize(args: argparse.Namespace) -> int:
    """Background optimize (segment-then-optimize completion): derive
    blocks/ + packed postings/positions for a servable dir that lacks
    them — typically a streaming ``compact_to_dir`` handoff — so a
    long-lived streamed index gains block-max pruning and compression
    without a batch rebuild. Run in a maintenance window (or on a
    snapshot copy): the in-place rewrites are crash-safe but not
    reader-transparent (see operators.indexer.optimize_index)."""
    from .operators.indexer import optimize_index

    spark = _spark("se-optimize")
    t0 = time.time()
    idx = optimize_index(spark, args.index_dir,
                         num_partitions=args.partitions)
    total = time.time() - t0
    stages = {
        k: v["sec"]
        for k, v in idx.manifest.get("stages", {}).items()
        if k.startswith("optimize_")
    }
    print(f"optimized index in {total:.1f}s: {stages}")
    return 0


def cmd_eval(args: argparse.Namespace) -> int:
    """Batch TREC evaluation (QueryPerformancesMain.java:100-136).

    The run file is produced by the warm batch path
    (maxscore.batch_top_k_rows: ONE union posting fetch + vectorized
    per-query scoring, delegating to the distributed relational
    query.batch_top_k when Σdf over the union exceeds the driver's
    fetch budget); a per-query loop would pay a ~0.5 s job-scheduling
    floor per query (an hour of overhead on the 6,980-query MS MARCO
    dev set). The reference's per-query latency report (mean ± stddev,
    QueryPerformancesMain.java:130-136) is measured afterwards on the
    warmed serving path over ``--latency-sample`` queries."""
    import statistics

    from .operators.indexer import InvertedIndex
    from .operators.maxscore import batch_top_k_frame, maxscore_topk_rows
    from .sources.sinks import write_trec

    spark = _spark("se-eval")
    idx = InvertedIndex.load(spark, args.index_dir).warm()
    queries: dict[str, str] = {}
    with open(args.queries) as f:
        for line in f:
            line = line.rstrip("\n")
            if line and "\t" in line:
                qid, text = line.split("\t", 1)
                queries[qid] = text
    t0 = time.time()
    # warm batch path: one union posting fetch + vectorized per-query
    # scoring, uploaded once; the over-budget delegation hands the
    # DISTRIBUTED relational batch frame straight to the sink (no
    # k·|Q|-row driver round-trip on the at-scale path)
    allq = batch_top_k_frame(idx, queries, k=args.k, scoring=args.scoring)
    write_trec(allq.select("qid", "docid", "pid", "score"),
               args.output, run_id=args.run_id)
    batch_sec = time.time() - t0

    if args.qrels:
        # TREC qrels: `qid iter docno rel` (whitespace) or qid\tpid\trel
        from .sources.sinks import trec_metrics

        qrows = []
        with open(args.qrels) as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    qrows.append((parts[0], parts[-2], int(parts[-1])))
        qrels = spark.createDataFrame(qrows, "qid string, pid string, rel int")
        m = trec_metrics(
            allq.select("qid", "pid", "score"), qrels, k=args.k
        ).collect()
        if m:
            import statistics as st

            aps = [r["ap"] for r in m]
            ps = [r[f"p_at_{args.k}"] for r in m]
            print(
                f"MAP={st.mean(aps):.4f} mean P@{args.k}={st.mean(ps):.4f} "
                f"over {len(m)} judged queries"
            )

    sample = list(queries.values())[: args.latency_sample]
    times = []
    for text in sample:
        t1 = time.time()
        maxscore_topk_rows(idx, text, k=args.k, scoring=args.scoring)
        times.append((time.time() - t1) * 1000)
    mean = statistics.mean(times) if times else float("nan")
    std = statistics.stdev(times) if len(times) > 1 else 0.0
    print(
        f"{len(queries)} queries in {batch_sec:.1f}s "
        f"({len(queries)/batch_sec:.1f} q/s batched); "
        f"warm per-query latency over {len(sample)} samples: "
        f"mean {mean:.1f} ms, stddev {std:.1f} ms; "
        f"run written to {args.output}"
    )
    return 0


def cmd_repl(args: argparse.Namespace) -> int:
    """Interactive query loop with a WARM session (cli Main.java:54-118):
    one SparkSession, lexicon + pid maps memoized on the driver and a
    posting-list LRU (CacheTests.java:36-131's warm posture), so repeat
    terms answer with zero Spark jobs. Directives: ``:k N``,
    ``:conj on|off``, ``:scoring bm25|tfidf``, ``:maxscore on|off``,
    ``:algo maxscore|bmw|daat``, ``:blockmax on|off``,
    ``:prf on|off`` (warm pseudo-relevance feedback — both retrieval
    passes through the warm kernel), ``:snippets on|off`` (results
    page with context windows — needs ``--docs`` and a positions
    build), ``:correct on|off`` (spell-correct OOV terms — needs the
    spellings/ artifact), ``:quit``."""
    from .operators.indexer import InvertedIndex
    from .operators.maxscore import maxscore_topk_rows
    from .operators.query import prf_topk_rows, top_k

    spark = _spark("se-repl")
    t0 = time.time()
    idx = InvertedIndex.load(spark, args.index_dir).warm()
    docs_df = None
    if args.docs:
        from .sources.corpus import read_corpus, to_engine_docs

        docs_df = to_engine_docs(read_corpus(spark, args.docs))
    print(f"index warmed in {time.time()-t0:.1f}s: {idx.stats}", flush=True)
    k, conjunctive, scoring, use_maxscore = args.k, False, args.scoring, True
    algo, blockmax, prf, snippets = "maxscore", False, False, False
    correct = False
    stream = open(args.input) if args.input else sys.stdin
    for line in stream:
        line = line.strip()
        if not line:
            continue
        if line.startswith(":"):
            # malformed directives report and continue — they must not
            # kill the interactive session
            parts = line[1:].split()
            if parts[0] in ("quit", "exit", "q"):
                break
            elif parts[0] == "k" and len(parts) > 1:
                try:
                    k = int(parts[1])
                except ValueError:
                    print(f"bad :k value (want an integer): {parts[1]}")
            elif parts[0] == "conj" and len(parts) > 1:
                conjunctive = parts[1] == "on"
            elif parts[0] == "scoring" and len(parts) > 1:
                if parts[1] in ("bm25", "tfidf"):
                    scoring = parts[1]
                else:
                    print(f"bad :scoring value (want bm25|tfidf): {parts[1]}")
            elif parts[0] == "maxscore" and len(parts) > 1:
                use_maxscore = parts[1] == "on"
            elif parts[0] == "algo" and len(parts) > 1:
                if parts[1] in ("maxscore", "bmw", "daat"):
                    algo = parts[1]
                else:
                    print(
                        f"bad :algo value (want maxscore|bmw|daat): {parts[1]}"
                    )
            elif parts[0] == "blockmax" and len(parts) > 1:
                blockmax = parts[1] == "on"
            elif parts[0] == "prf" and len(parts) > 1:
                prf = parts[1] == "on"
            elif parts[0] == "correct" and len(parts) > 1:
                want = parts[1] == "on"
                if want and not (
                    Path(idx.index_dir) / "spellings"
                ).exists():
                    print("index has no spellings/ artifact; rebuild with "
                          "--spellings to enable :correct")
                else:
                    correct = want
            elif parts[0] == "snippets" and len(parts) > 1:
                want = parts[1] == "on"
                if want and docs_df is None:
                    print("start the repl with --docs <corpus> to "
                          "render snippets")
                elif want and not idx.manifest.get("flags", {}).get(
                    "positions", False
                ):
                    print("index was built without the positions stage; "
                          "rebuild with --positions to render snippets")
                else:
                    snippets = want
            else:
                print(f"unknown directive: {line}")
            continue
        t1 = time.time()
        if correct and (prf or snippets):
            # BEFORE the snippets dispatch — otherwise the raw typo'd
            # query would rank silently with the correction skipped
            print(":correct composes with the plain evaluators; "
                  ":prf off / :snippets off first")
            continue
        if snippets:
            if conjunctive or prf:
                print(":snippets composes its own disjunctive ranking; "
                      ":conj off / :prf off first")
                continue
            if algo != "maxscore" or blockmax or not use_maxscore:
                print(":snippets ranks through warm MaxScore; "
                      ":algo maxscore / :blockmax off / :maxscore on "
                      "first")
                continue
            from .operators.phrase import search_with_snippets_rows

            page = search_with_snippets_rows(idx, docs_df, line, k=k,
                                             scoring=scoring)
            ms = (time.time() - t1) * 1000
            for _, pid, score, _start, _n, snip in page:
                print(f"{pid}\t{score:.10f}\t{snip or ''}")
            print(f"({len(page)} results in {ms:.1f} ms)", flush=True)
            continue
        qterms = None
        if correct:
            from .operators.suggest import correct_query

            fixes = correct_query(idx, line)
            for t, c in fixes.items():
                if c is None:
                    print(f"# no correction within 1 edit for '{t}' "
                          f"— dropped")
                elif c != t:
                    print(f"# corrected '{t}' -> '{c}'")
            # order-preserving dedup: collisions onto one vocab term
            # would double-count partials in the terms= evaluators
            qterms = list(dict.fromkeys(c for c in fixes.values() if c))
        if prf:
            if conjunctive:
                print(":prf composes disjunctive passes; :conj off first")
                continue
            rows = [
                {"pid": p, "score": s}
                for _, p, s in prf_topk_rows(idx, line, k=k, scoring=scoring)
            ]
        elif use_maxscore:
            # warm path: plain rows, zero Spark jobs on cached terms
            if algo == "bmw" and conjunctive:
                # report and continue — a bad combination must not
                # kill the interactive session
                print(":algo bmw is disjunctive-only; :conj off first")
                continue
            rows = [
                {"pid": p, "score": s}
                for _, p, s in maxscore_topk_rows(
                    idx, line, k=k, conjunctive=conjunctive, scoring=scoring,
                    algo=algo, block_max=blockmax, terms=qterms,
                )
            ]
        else:
            if qterms is not None:
                from .operators.query import top_k_terms

                res = top_k_terms(idx, qterms, k=k, conjunctive=conjunctive,
                                  scoring=scoring)
            else:
                res = top_k(idx, line, k=k, conjunctive=conjunctive,
                            scoring=scoring)
            rows = [
                {"pid": r["pid"], "score": r["score"]}
                for r in res.collect()
            ]
        ms = (time.time() - t1) * 1000
        for r in rows:
            print(f"{r['pid']}\t{r['score']:.10f}")
        print(f"({len(rows)} results in {ms:.1f} ms)", flush=True)
    if args.input:
        stream.close()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument(
        "--input", required=True,
        help="parquet dir, catalog table, pid\\ttext TSV(.gz), tar.gz, "
             "jsonl/ndjson(.gz), or files:<dir> source tree",
    )
    b.add_argument(
        "--input-schema", default=None,
        help="explicit DDL schema for jsonl/ndjson inputs (e.g. "
             "'id string, text string') — skips the full-input "
             "inference pass",
    )
    b.add_argument("--index-dir", required=True)
    b.add_argument("--no-stem-stop", action="store_true")
    b.add_argument("--no-compression", action="store_true")
    b.add_argument("--no-maxscore", action="store_true")
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--positions", action="store_true",
                   help="also build the positional postings stage")
    b.add_argument("--fields", action="store_true",
                   help="also build the BM25F field-postings stage")
    b.add_argument("--spellings", action="store_true",
                   help="also derive the spellings/ artifact (SymSpell "
                        "delete-neighborhood index for query --correct)")
    b.add_argument("--overwrite", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="top-k query")
    q.add_argument("--index-dir", required=True)
    q.add_argument("text")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--conjunctive", "-c", action="store_true")
    q.add_argument("--scoring", choices=["bm25", "tfidf"], default="bm25")
    q.add_argument("--maxscore", action="store_true")
    q.add_argument("--blockmax", action="store_true",
                   help="with --maxscore: BMM per-block bailouts over "
                        "the stored blocks/ bounds")
    q.add_argument("--bmw", action="store_true",
                   help="Block-Max WAND pruning (disjunctive only)")
    q.add_argument("--correct", action="store_true",
                   help="spell-correct OOV query terms against the "
                        "vocabulary (needs the spellings/ artifact: "
                        "build --spellings)")
    q.add_argument("--prf", action="store_true",
                   help="pseudo-relevance feedback: expand the query "
                        "from the top feedback docs, then re-rank")
    q.add_argument("--fb-docs", type=int, default=5,
                   help="PRF feedback depth (top docs mined for terms)")
    q.add_argument("--fb-terms", type=int, default=3,
                   help="PRF expansion terms appended to the query")
    q.add_argument("--snippets", action="store_true",
                   help="render a results page: top-k plus each hit's "
                        "best context window (needs --docs and a "
                        "positions build)")
    q.add_argument("--docs", default=None,
                   help="corpus source for snippet rendering (parquet "
                        "dir, catalog table, TSV(.gz), or tar.gz)")
    q.set_defaults(fn=cmd_query)

    o = sub.add_parser(
        "optimize",
        help="derive blocks/ + packed artifacts for a servable dir "
             "(background optimize of a streamed handoff)",
    )
    o.add_argument("--index-dir", required=True)
    o.add_argument("--partitions", type=int, default=None)
    o.set_defaults(fn=cmd_optimize)

    e = sub.add_parser("eval", help="batch TREC evaluation")
    e.add_argument("--index-dir", required=True)
    e.add_argument("--queries", required=True, help="qid\\ttext TSV")
    e.add_argument("--output", required=True)
    e.add_argument("-k", type=int, default=100)
    e.add_argument("--scoring", choices=["bm25", "tfidf"], default="bm25")
    e.add_argument("--run-id", default="searchengine_spark")
    e.add_argument("--latency-sample", type=int, default=50,
                   help="queries timed individually on the warm path")
    e.add_argument("--qrels", default=None,
                   help="TREC qrels file -> report MAP and P@k")
    e.set_defaults(fn=cmd_eval)

    r = sub.add_parser("repl", help="interactive query loop (warm session)")
    r.add_argument("--index-dir", required=True)
    r.add_argument("-k", type=int, default=10)
    r.add_argument("--scoring", choices=["bm25", "tfidf"], default="bm25")
    r.add_argument("--input", default=None,
                   help="read queries from a file instead of stdin")
    r.add_argument("--docs", default=None,
                   help="corpus source enabling :snippets rendering")
    r.set_defaults(fn=cmd_repl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
