"""Result / debug sinks (SURVEY.md §2.1 S13-S15).

* TREC results sink — `qid Q0 pid rank score runid` lines for
  trec_eval (performanceTests/.../QueryPerformancesMain.java:37-58).
* Debug dumps — human-readable JSON of postings / lexicon / doc index
  behind a debug flag (PostingList.java:237-275,
  VocabularyEntry.java:436-447, DocumentIndexEntry.java:212-223).
* Build-stats sink — one TSV row per build: args, duration, sizes
  (indexer/.../Main.java:99-111); here the manifest already carries
  per-stage metrics, this writes the flat summary row.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def write_docstore(
    docs: DataFrame, path: str, num_partitions: int | None = None
) -> None:
    """Results-page docstore with the POINT-LOOKUP layout contract:
    pid-range-partitioned and sorted within partitions, so every
    parquet file (and row group) covers a tight, non-overlapping pid
    range. A k-row render (``search_with_snippets``'s
    ``pid.isin(k pids)`` read) then prunes to O(k) files/row groups by
    parquet min/max statistics at ANY corpus size; on an unclustered
    100 TB docstore the same pushed In() filter prunes nothing and the
    k-row page pays a corpus-wide scan. Iceberg twin of this layout:
    ``WRITE ORDERED BY pid`` (the same contract, catalog-managed).
    Layout + pushdown are pinned in tests/test_round5.py."""
    from ..operators.indexer import _n_eff

    spark = docs.sparkSession
    (
        docs.repartitionByRange(_n_eff(spark, num_partitions), "pid")
        .sortWithinPartitions("pid")
        .write.mode("overwrite")
        .parquet(path)
    )


def trec_lines(results: DataFrame, qid_col: str = "qid", run_id: str = "searchengine_spark") -> DataFrame:
    """(qid, docid, pid, score) -> single-column TREC lines, ranked
    per qid by (score DESC, docid ASC)."""
    w = Window.partitionBy(qid_col).orderBy(F.col("score").desc(), F.col("docid").asc())
    return results.withColumn("rank", F.row_number().over(w)).select(
        F.concat_ws(
            " ",
            F.col(qid_col),
            F.lit("Q0"),
            F.col("pid"),
            F.col("rank"),
            F.col("score").cast("string"),
            F.lit(run_id),
        ).alias("value")
    )


def write_trec(results: DataFrame, path: str, run_id: str = "searchengine_spark") -> None:
    """Write a trec_eval-consumable run file (one part per partition;
    coalesce(1) for the single-file convention at evaluation scale)."""
    trec_lines(results, run_id=run_id).coalesce(1).write.mode("overwrite").text(path)


def write_debug_dumps(index, out_dir: str) -> None:
    """Debug sinks: JSON dumps of the index tables (reference flag -d)."""
    root = Path(out_dir)
    index.postings.orderBy("term", "docid").write.mode("overwrite").json(
        str(root / "postings_debug")
    )
    index.lexicon.orderBy("term").write.mode("overwrite").json(
        str(root / "lexicon_debug")
    )
    index.doc_stats.orderBy("docid").write.mode("overwrite").json(
        str(root / "doc_stats_debug")
    )


def trec_metrics(results: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """MAP and P@k per the trec_eval definitions used by the
    reference's evaluation (documentation.pdf §4.2: map / P@10 over the
    MS MARCO dev qrels).

    ``results``: (qid, docid|pid, score) ranked run; ``qrels``:
    (qid, pid, rel) with rel > 0 = relevant. Pure DataFrame math:
    rank via window, precision@i for relevant hits, AP = mean over the
    query's relevant set, MAP = mean over queries.
    """
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("pid").asc())
    ranked = results.withColumn("rank", F.row_number().over(w))
    rel = qrels.filter(F.col("rel") > 0).select("qid", "pid")
    n_rel = rel.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hits = ranked.join(rel, ["qid", "pid"])  # relevant retrieved
    wcum = (
        Window.partitionBy("qid")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prec_at_hit = hits.withColumn(
        "prec", F.count("*").over(wcum) / F.col("rank")
    )
    ap = (
        prec_at_hit.groupBy("qid")
        .agg(F.sum("prec").alias("sum_prec"))
        .join(n_rel, "qid")
        .select("qid", (F.col("sum_prec") / F.col("n_rel")).alias("ap"))
    )
    p_at_k = (
        ranked.filter(F.col("rank") <= k)
        .join(rel.withColumn("hit", F.lit(1)), ["qid", "pid"], "left")
        .groupBy("qid")
        .agg((F.sum(F.coalesce(F.col("hit"), F.lit(0))) / F.lit(k)).alias(f"p_at_{k}"))
    )
    return (
        ap.join(p_at_k, "qid", "full")
        .select(
            "qid",
            F.coalesce("ap", F.lit(0.0)).alias("ap"),
            F.coalesce(f"p_at_{k}", F.lit(0.0)).alias(f"p_at_{k}"),
        )
    )


def append_build_stats(index, args: str, total_sec: float, stats_path: str) -> None:
    """One TSV row: args, total seconds, per-stage seconds, collection
    stats (indexerStatistics.tsv equivalent)."""
    stages = {k: v.get("sec") for k, v in index.manifest.get("stages", {}).items()}
    row = "\t".join(
        [
            time.strftime("%Y-%m-%dT%H:%M:%S"),
            args,
            f"{total_sec:.2f}",
            json.dumps(stages),
            json.dumps(index.manifest.get("stats", {})),
        ]
    )
    p = Path(stats_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with p.open("a") as f:
        f.write(row + "\n")
