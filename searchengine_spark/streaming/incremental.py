"""Incremental index maintenance with Structured Streaming.

The reference is batch-only (SURVEY.md §2.8); this extends the engine
with the streaming ingest a production corpus needs: new documents
arrive continuously, postings accumulate in staged micro-batch blocks,
and a periodic compaction folds them into the servable index.

Design (append-only, checkpoint-resumable — the streaming face of the
batch build's posting-block granularity):

  readStream(docs) --foreachBatch--> per-batch:
      analysis chain -> (pid, tokens) -> postings (term, pid, tf,
      doc_len, batch_id) appended to stage_stream/ parquet
      + doc-arrival stats appended to doc_stream/
  compact(index_dir): batch job that re-runs the merge/lexicon stages
      over base + staged rows (dense docids reassigned globally — docid
      stability across compactions is NOT promised, pid is the stable
      key, exactly like the reference's rebuild-from-scratch contract).

Micro-batch lineage: each appended block carries ``batch_id`` so a
crashed stream resumes from the Structured Streaming checkpoint and
overwrite-by-batch keeps the staging area idempotent (exactly-once
per-batch parquet append via dynamic partition overwrite on batch_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col


def batch_postings(docs: DataFrame, stem_stop: bool = True) -> DataFrame:
    """(pid, content) -> (term, pid, tf, doc_len) for one micro-batch.
    Same semantics as the batch build's stage 1+2 (blank-token doc-len
    rule, empty-doc filter), keyed by pid — dense docids are assigned
    at compaction, not per batch (a per-batch counter could not be
    globally dense)."""
    toks = docs.select(
        "pid",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
        tokens_col(F.col("content"), stem_stop).alias("tokens"),
    ).filter(F.size("tokens") > 0)
    return (
        toks.select(
            "pid",
            "content_sha256",
            F.size("tokens").cast("long").alias("doc_len"),
            F.explode("tokens").alias("term"),
        )
        .filter(F.col("term") != "")
        .groupBy("pid", "content_sha256", "doc_len", "term")
        .agg(F.count("*").cast("int").alias("tf"))
    )


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    schema: str = "pid string, content string",
    stem_stop: bool = True,
    trigger_once: bool = True,
):
    """Start the streaming ingest: parquet-dir source -> staged posting
    blocks. ``trigger_once`` processes the backlog and stops (the
    testable mode); continuous triggers are a config away.

    The ingest's ``stem_stop`` is persisted in ``stream_manifest.json``
    so compaction serves queries with the SAME analysis chain the
    postings were built with (Flags.java:11-55 contract — a mismatch
    would stem the query against unstemmed postings)."""
    import json
    from pathlib import Path

    idx_root = Path(index_dir)
    idx_root.mkdir(parents=True, exist_ok=True)
    (idx_root / "stream_manifest.json").write_text(
        json.dumps({"flags": {"stem_stop": stem_stop, "compression": False,
                              "max_score": True}})
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = batch_postings(batch_df, stem_stop).withColumn(
            "batch_id", F.lit(batch_id).cast("long")
        )
        (
            out.write.mode("overwrite")
            .partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(f"{index_dir}/stage_stream")
        )

    reader = spark.readStream.schema(schema).parquet(source_dir)
    writer = reader.writeStream.foreachBatch(sink).option(
        "checkpointLocation", f"{index_dir}/stream_checkpoint"
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_to_dir(spark: SparkSession, index_dir: str, out_dir: str):
    """Materialize the compacted streaming index as a SERVABLE disk
    index (same layout as the batch build: doc_stats/, postings/,
    lexicon/, manifest.json), so ``InvertedIndex.load(out_dir)`` works
    on it — the streaming-ingest-to-serving handoff. Postings land
    range-partitioned and sorted by (term, docid) like the batch merge
    stage."""
    import json
    from pathlib import Path

    from ..operators.indexer import InvertedIndex

    frames = compact(spark, index_dir)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    frames.doc_stats.write.mode("overwrite").parquet(str(out / "doc_stats"))
    (
        frames.postings.repartitionByRange("term", "docid")
        .sortWithinPartitions("term", "docid")
        .write.mode("overwrite")
        .parquet(str(out / "postings"))
    )
    frames.lexicon.write.mode("overwrite").parquet(str(out / "lexicon"))
    n_terms = spark.read.parquet(str(out / "lexicon")).count()
    stats = dict(frames.stats)
    stats["n_terms"] = int(n_terms)
    manifest = {
        "flags": frames.manifest["flags"],
        "stages": {"compacted_from": index_dir},
        "stats": stats,
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return InvertedIndex(spark, str(out), manifest)


_WINDOW_SINK_SEQ = [0]


def windowed_event_stats(
    spark: SparkSession,
    source: str,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    timeout_sec: int = 300,
) -> DataFrame:
    """Watermarked tumbling-window aggregation over an event stream —
    the standard Structured Streaming analytics shape (readStream ->
    withWatermark -> window groupBy -> sink). The watermark bounds the
    aggregation state the way a production stream needs (late events
    beyond the delay are dropped and their window's state evicted);
    with an ``availableNow`` backlog run + complete-mode memory sink
    the result equals the batch aggregation exactly, which is how the
    gate pins it to a SQL oracle.

    Returns (window_start, event_type, n_events, sum_value)."""
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(source)
    agg = (
        stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window("ts", window_duration).alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    _WINDOW_SINK_SEQ[0] += 1
    name = f"se_windowed_events_{_WINDOW_SINK_SEQ[0]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)


def compact(spark: SparkSession, index_dir: str):
    """Fold staged streaming blocks into a servable in-memory index:
    doc stats + postings + lexicon over everything ingested so far.
    Dense docids are (re)assigned by pid order at compaction time.
    Flags come from the ingest's ``stream_manifest.json`` (never
    assumed), so query-time analysis matches ingest-time analysis."""
    import json
    from pathlib import Path

    from ..operators.frames import IndexFrames
    from ..operators.indexer import assign_dense_ids, compute_lexicon

    mpath = Path(index_dir) / "stream_manifest.json"
    manifest = (
        json.loads(mpath.read_text())
        if mpath.exists()
        else {"flags": {"stem_stop": True, "compression": False,
                        "max_score": True}}
    )
    staged = spark.read.parquet(f"{index_dir}/stage_stream")
    # a pid re-ingested in a later batch supersedes earlier batches
    latest = staged.groupBy("pid").agg(F.max("batch_id").alias("batch_id"))
    cur = staged.join(latest, ["pid", "batch_id"])

    doc_rows = cur.select("pid", "content_sha256", "doc_len").distinct()
    with_ids = assign_dense_ids(doc_rows, ["pid"], "docid", start=1)
    doc_stats = with_ids.select("docid", "pid", "doc_len", "content_sha256").cache()
    postings = (
        cur.join(doc_stats.select("pid", "docid"), "pid")
        .select("term", "docid", "tf", "doc_len")
    )
    n_docs, total_doc_len = doc_stats.agg(
        F.count("*"), F.sum("doc_len")
    ).collect()[0]
    avgdl = total_doc_len / n_docs
    lexicon = compute_lexicon(postings, int(n_docs), avgdl)
    stats = {
        "n_docs": int(n_docs),
        "total_doc_len": int(total_doc_len),
        "avg_doc_len": avgdl,
        "n_terms": None,
    }
    return IndexFrames(
        spark,
        doc_stats,
        postings,
        lexicon,
        spark.createDataFrame(
            [], "term string, block_id long, max_docid long, num_postings long"
        ),
        stats,
        manifest,
    )
