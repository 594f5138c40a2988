"""Command-line surface mirroring the reference's three entry points
(SURVEY.md §3): indexer Main, interactive cli Main, and the batch
evaluation harness (QueryPerformancesMain).

  python -m searchengine_spark.cli build --input DIR --index-dir DIR
      [--no-stem-stop] [--no-compression] [--partitions N]
  python -m searchengine_spark.cli query --index-dir DIR "terms..."
      [-k 10] [--conjunctive] [--scoring bm25|tfidf] [--maxscore]
  python -m searchengine_spark.cli eval --index-dir DIR --queries TSV
      --output DIR [-k 100] [--scoring bm25]

`eval` reads `qid\ttext` lines (QueryPerformancesMain.java:64-99) and
writes a trec_eval run file. On a cluster, submit with
``spark-submit --py-files searchengine_spark.zip`` (tools/package.py
builds the zip); locally it runs on local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import sys
import time


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
    docs = to_engine_docs(read_corpus(spark, args.input))
    t0 = time.time()
    idx = build_index(
        docs,
        args.index_dir,
        IndexConfig(
            stem_stop=not args.no_stem_stop,
            compression=not args.no_compression,
            num_partitions=args.partitions,
            overwrite=args.overwrite,
        ),
    )
    total = time.time() - t0
    append_build_stats(idx, " ".join(sys.argv[1:]), total,
                       f"{args.index_dir}/indexerStatistics.tsv")
    print(f"built index in {total:.1f}s: {idx.stats}")
    return 0


def cmd_query(args: argparse.Namespace) -> int:
    from .operators.indexer import InvertedIndex
    from .operators.query import top_k

    spark = _spark("se-query")
    idx = InvertedIndex.load(spark, args.index_dir)
    t0 = time.time()
    if args.maxscore:
        from .operators.maxscore import maxscore_topk

        res = maxscore_topk(idx, args.text, k=args.k,
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


def cmd_eval(args: argparse.Namespace) -> int:
    from pyspark.sql import functions as F

    from .operators.indexer import InvertedIndex
    from .operators.query import top_k
    from .sources.sinks import write_trec

    spark = _spark("se-eval")
    idx = InvertedIndex.load(spark, args.index_dir).warm()
    queries = []
    with open(args.queries) as f:
        for line in f:
            line = line.rstrip("\n")
            if line and "\t" in line:
                qid, text = line.split("\t", 1)
                queries.append((qid, text))
    parts, times = [], []
    for qid, text in queries:
        t0 = time.time()
        r = top_k(idx, text, k=args.k, scoring=args.scoring)
        parts.append(r.select(F.lit(qid).alias("qid"), "docid", "pid", "score"))
        times.append(time.time() - t0)
    allq = parts[0]
    for p in parts[1:]:
        allq = allq.unionByName(p)
    write_trec(allq, args.output, run_id=args.run_id)
    import statistics

    print(
        f"{len(queries)} queries; plan-build mean "
        f"{statistics.mean(times)*1000:.1f} ms; run written to {args.output}"
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--input", required=True, help="parquet dir of documents")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--no-stem-stop", action="store_true")
    b.add_argument("--no-compression", action="store_true")
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--overwrite", action="store_true")
    b.set_defaults(fn=cmd_build)

    q = sub.add_parser("query", help="top-k query")
    q.add_argument("--index-dir", required=True)
    q.add_argument("text")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--conjunctive", "-c", action="store_true")
    q.add_argument("--scoring", choices=["bm25", "tfidf"], default="bm25")
    q.add_argument("--maxscore", action="store_true")
    q.set_defaults(fn=cmd_query)

    e = sub.add_parser("eval", help="batch TREC evaluation")
    e.add_argument("--index-dir", required=True)
    e.add_argument("--queries", required=True, help="qid\\ttext TSV")
    e.add_argument("--output", required=True)
    e.add_argument("-k", type=int, default=100)
    e.add_argument("--scoring", choices=["bm25", "tfidf"], default="bm25")
    e.add_argument("--run-id", default="searchengine_spark")
    e.set_defaults(fn=cmd_eval)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
