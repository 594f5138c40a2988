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
    from ..operators.frames import exploded_term_tf

    # narrow per-row run-length tf: no shuffle per micro-batch (a
    # groupBy here would force a stateless shuffle on every trigger)
    toks = toks.withColumn("doc_len", F.size("tokens").cast("long"))
    return exploded_term_tf(
        toks, ["pid", "content_sha256", "doc_len"]
    ).select(
        "pid",
        "content_sha256",
        "doc_len",
        "term",
        F.col("tf").cast("int").alias("tf"),
    )


def batch_positions(docs: DataFrame, stem_stop: bool = True) -> DataFrame:
    """(pid, content) -> (pid, doc_len, term, tf, positions) for one
    micro-batch — the positional twin of :func:`batch_postings`, same
    narrow run-length plan (``exploded_term_positions``: a (term, pid)
    group never spans rows, so NO shuffle per trigger) and the same
    analysis chain, so a streamed corpus serves phrase/proximity with
    offsets identical to a batch build over the same docs."""
    from ..operators.frames import exploded_term_positions

    toks = docs.select(
        "pid",
        tokens_col(F.col("content"), stem_stop).alias("tokens"),
    ).filter(F.size("tokens") > 0)
    toks = toks.withColumn("doc_len", F.size("tokens").cast("long"))
    return exploded_term_positions(toks, ["pid", "doc_len"]).select(
        "pid",
        "doc_len",
        "term",
        F.col("tf").cast("int").alias("tf"),
        "positions",
    )


def start_ingest(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    schema: str = "pid string, content string",
    stem_stop: bool = True,
    trigger_once: bool = True,
    positions: bool = False,
    fields: bool = False,
    source_format: str = "parquet",
):
    """Start the streaming ingest: file-dir source -> staged posting
    blocks. ``trigger_once`` processes the backlog and stops (the
    testable mode); continuous triggers are a config away.
    ``source_format`` = "parquet" (default) or "json" for a
    landing zone where documents arrive as JSONL files (the explicit
    ``schema`` is mandatory for streams, so JSON inference is not a
    concern here).

    The ingest's ``stem_stop`` is persisted in ``stream_manifest.json``
    so compaction serves queries with the SAME analysis chain the
    postings were built with (Flags.java:11-55 contract — a mismatch
    would stem the query against unstemmed postings)."""
    import json
    from pathlib import Path

    # validate BEFORE any manifest write: persisting a bad format and
    # raising after would wedge the dir against every valid resume
    if source_format not in ("parquet", "json"):
        raise ValueError(f"unsupported source_format: {source_format!r}")
    idx_root = Path(index_dir)
    idx_root.mkdir(parents=True, exist_ok=True)
    mpath = idx_root / "stream_manifest.json"
    if mpath.exists():
        # flag-mismatch-on-resume, the streaming twin of the batch
        # build's Flags contract: resuming an ingest with different
        # analysis or positional settings would mix incompatible staged
        # rows (and a positions toggle would leave doc versions whose
        # postings and positions disagree — the staged tables share
        # batch_id lineage precisely so they stay in lockstep)
        old_manifest = json.loads(mpath.read_text())
        old = old_manifest.get("flags", {})
        # source_format lives BESIDE flags: the flags dict propagates
        # into the compacted index manifest, where a non-index key
        # would be noise
        old_fmt = old_manifest.get("source_format", "parquet")
        if (
            bool(old.get("stem_stop", True)) != bool(stem_stop)
            or bool(old.get("positions", False)) != bool(positions)
            or bool(old.get("fields", False)) != bool(fields)
            or old_fmt != source_format
        ):
            raise ValueError(
                "stream flag mismatch on resume: ingest was started with "
                f"{old} source_format={old_fmt}, got stem_stop={stem_stop} "
                f"positions={positions} fields={fields} "
                f"source_format={source_format}"
            )
    mpath.write_text(
        json.dumps({"flags": {"stem_stop": stem_stop, "compression": False,
                              "max_score": True, "positions": positions,
                              "fields": fields},
                    "source_format": source_format})
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
        if positions:
            # positional staging rides the same trigger with the same
            # batch_id lineage, so overwrite-by-batch idempotency and
            # the latest-batch-wins rule at compaction apply to both
            # staged tables identically
            pos = batch_positions(batch_df, stem_stop).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            )
            (
                pos.write.mode("overwrite")
                .partitionBy("batch_id")
                .option("partitionOverwriteMode", "dynamic")
                .parquet(f"{index_dir}/pos_stream")
            )

    base = spark.readStream.schema(schema)
    reader = (
        base.json(source_dir)
        if source_format == "json"
        else base.parquet(source_dir)
    )
    writer = reader.writeStream.foreachBatch(sink).option(
        "checkpointLocation", f"{index_dir}/stream_checkpoint"
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _prepare_out(out) -> None:
    """mkdir the servable dir and delete the derived artifacts of any
    PREVIOUS compaction into it (plus ``optimize_index``'s swap/staging
    leftovers): recompaction reassigns docids, so a stale blocks/'s
    bmax bounds would let MaxScore prune against the previous corpus
    and stale packed postings/positions would resolve old docids
    against the new doc_stats — while ``optimize_index``'s
    per-artifact resume checks (``_SUCCESS`` / column presence) cannot
    tell "resumed run" from "previous corpus"."""
    import shutil

    out.mkdir(parents=True, exist_ok=True)
    for stale in (
        "blocks", "postings_packed", "positions_packed", "term_blk__opt",
        "postings__opt", "lexicon__opt", "postings__old", "lexicon__old",
    ):
        shutil.rmtree(out / stale, ignore_errors=True)


def _write_servable(
    spark: SparkSession,
    frames,
    out_dir: str,
    index_dir: str,
    positions_df: DataFrame | None,
    optimize: bool,
    doc_stats_written: bool = False,
):
    """Shared disk handoff for both streaming compaction flavors:
    materialize an ``IndexFrames`` in the batch build's layout
    (doc_stats/, postings/ range-sorted by (term, docid), lexicon/,
    manifest.json — plus positions/ and field_postings/ when the ingest
    ran with those flags) so ``InvertedIndex.load(out_dir)`` works on
    it. With ``optimize=True`` the handoff writes the batch
    compression build's own shapes directly — postings with
    ``block_id`` stamped in the SAME range shuffle that produces the
    final layout (build stage 3's plan), lexicon with the block meta
    joined, and positions gap-VB packed from the in-memory sorted
    frame (stage 6's plan) — then ``indexer.optimize_index`` completes
    only the derived side artifacts (blocks/ with stored bmax,
    postings_packed/). The streamed index thus serves MaxScore
    block-max pruning and the packed codecs WITHOUT a batch rebuild
    (segment-then-optimize), and without paying a second full shuffle
    + rewrite of the two largest artifacts just to stamp metadata.

    Re-compaction into an EXISTING servable dir is supported: any
    previously derived optimization artifacts are deleted up front —
    docids are reassigned by recompaction, so old blocks/' bmax bounds
    would let MaxScore prune against the previous corpus and old
    packed postings/positions would resolve stale docids against the
    new doc_stats, while ``optimize_index``'s per-artifact resume
    checks (``_SUCCESS`` / column presence) cannot tell "resumed run"
    from "previous corpus". A crash MID-handoff leaves a mixed dir the
    same way it always did: re-run the handoff (every write is
    mode=overwrite) before serving.

    ``doc_stats_written=True`` means the caller already prepared the
    dir and wrote doc_stats/, and every frame it passes derives its
    docids from the READ-BACK of that parquet (``compact_to_dir``'s
    pin) — the strongest form of the one-assignment invariant: all
    artifacts of one handoff provably share the docids that were
    written, whatever happens to in-memory caches between actions."""
    import json
    from pathlib import Path

    from ..operators.indexer import (
        InvertedIndex,
        _block_meta,
        _n_eff,
        _rank_within_groups,
        _release_persisted,
        optimize_index,
    )
    from ..operators.indexer import pack_positions

    out = Path(out_dir)
    if not doc_stats_written:
        _prepare_out(out)
        frames.doc_stats.write.mode("overwrite").parquet(
            str(out / "doc_stats")
        )
    flags = dict(frames.manifest["flags"])
    if optimize:
        # stamp block_id inside the one range shuffle that also yields
        # the final (term, docid)-sorted layout — identical plan (and
        # single-sourced √df law) to batch build stage 3 and to
        # optimize_index's rewrite, so block alignment stays bit-equal
        df_per_term = (
            frames.postings.groupBy("term").agg(F.count("*").alias("df"))
        )
        blk = _block_meta(df_per_term).persist()
        joined = frames.postings.join(
            blk.select("term", "max_per_block"), "term"
        )
        ranked = _rank_within_groups(joined, "term", "docid", "posting_rank")
        (
            ranked.withColumn(
                "block_id",
                (F.col("posting_rank") / F.col("max_per_block")).cast("long"),
            )
            .select("term", "docid", "tf", "doc_len", "block_id")
            .write.mode("overwrite")
            .parquet(str(out / "postings"))
        )
        (
            frames.lexicon.join(
                blk.select("term", "num_blocks", "max_per_block"), "term"
            )
            .write.mode("overwrite")
            .parquet(str(out / "lexicon"))
        )
        blk.unpersist()
        _release_persisted()
    else:
        (
            frames.postings.repartitionByRange(
                _n_eff(spark), "term", "docid"
            )
            .sortWithinPartitions("term", "docid")
            .write.mode("overwrite")
            .parquet(str(out / "postings"))
        )
        frames.lexicon.write.mode("overwrite").parquet(str(out / "lexicon"))
    if flags.get("positions", False):
        pos = (
            positions_df.select("term", "docid", "doc_len", "tf", "positions")
            .repartitionByRange(_n_eff(spark), "term", "docid")
            .sortWithinPartitions("term", "docid")
        )
        if optimize:
            # gap-VB pack from the in-memory sorted frame (batch stage
            # 6's compression shape) instead of writing the plain stage
            # only for optimize_index to re-read, pack, and delete it
            pack_positions(pos).write.mode("overwrite").parquet(
                str(out / "positions_packed")
            )
            flags["positions_packed"] = True
        else:
            pos.write.mode("overwrite").parquet(str(out / "positions"))
            flags["positions_packed"] = False
    avg_field_len = None
    if flags.get("fields", False):
        # BM25F filename-field postings are a narrow projection of the
        # compacted doc_stats (pid path tokens) — same derivation as
        # batch build stage 7, same (term, docid) range layout, so
        # fielded_top_k serves a streamed code corpus unchanged
        from ..operators.indexer import avg_field_len_of, field_postings_frame

        handoff_ds = spark.read.parquet(str(out / "doc_stats"))
        (
            field_postings_frame(handoff_ds)
            .repartitionByRange(_n_eff(spark), "term", "docid")
            .sortWithinPartitions("term", "docid")
            .write.mode("overwrite")
            .parquet(str(out / "field_postings"))
        )
        # stored like batch stage 7's manifest stat (indexer.py) so a
        # new session's first bm25f_top_k reads the scalar instead of
        # recomputing a corpus-wide aggregate
        avg_field_len = avg_field_len_of(handoff_ds)
    n_terms = spark.read.parquet(str(out / "lexicon")).count()
    stats = dict(frames.stats)
    stats["n_terms"] = int(n_terms)
    if avg_field_len is not None:
        stats["avg_field_len"] = avg_field_len
    manifest = {
        "flags": flags,
        "stages": {"compacted_from": index_dir},
        "stats": stats,
    }
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    if optimize:
        return optimize_index(spark, str(out))
    return InvertedIndex(spark, str(out), manifest)


def compact_to_dir(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    optimize: bool = False,
):
    """Materialize the compacted streaming index as a SERVABLE disk
    index — the streaming-ingest-to-serving handoff (full recompaction
    flavor: dense docids reassigned globally). Serving parity with a
    batch build: DAAT top-k, MaxScore (lexicon TUBs), phrase/proximity/
    snippets and BM25F fielded search all work as-is; pass
    ``optimize=True`` (or call ``indexer.optimize_index`` later, e.g.
    on a background schedule) to also derive the block-max descriptors
    and gap-VB packed postings/positions, after which block-max
    MaxScore and packed phrase serving match a compression batch
    build exactly."""
    from pathlib import Path

    # write doc_stats FIRST, then derive EVERY other artifact from the
    # read-back of that parquet: recompaction assigns fresh docids, and
    # an assignment that lives only in a cached plan is one
    # clearCache()/cache-loss-plus-replan away from a resampled range
    # shuffle handing the later writes DIFFERENT docids than the
    # doc_stats already on disk. Reading back pins the invariant
    # structurally — the same stage-checkpoint posture as the batch
    # build, whose stages 2+ always read stage 1's parquet.
    frames = compact(spark, index_dir)
    out = Path(out_dir)
    _prepare_out(out)
    frames.doc_stats.write.mode("overwrite").parquet(str(out / "doc_stats"))
    frames.doc_stats.unpersist()
    ds_pin = spark.read.parquet(str(out / "doc_stats"))
    frames = compact(spark, index_dir, doc_stats=ds_pin)
    positions_df = None
    if frames.manifest["flags"].get("positions", False):
        # fold the positional staging area (latest batch per pid wins,
        # same superseding rule as stage_stream) onto the docids the
        # compaction just assigned. Latest-wins comes from STAGE_STREAM
        # (the authoritative doc-version table), not pos_stream:
        # start_ingest enforces the positions flag across resumes so
        # the two stay in lockstep, but the doc version compacted into
        # doc_stats must always govern which positional rows serve
        staged_pos = spark.read.parquet(f"{index_dir}/pos_stream")
        latest = (
            spark.read.parquet(f"{index_dir}/stage_stream")
            .groupBy("pid")
            .agg(F.max("batch_id").alias("batch_id"))
        )
        positions_df = (
            staged_pos.join(latest, ["pid", "batch_id"])
            .join(ds_pin.select("pid", "docid"), "pid")
            .select("term", "docid", "doc_len", "tf", "positions")
        )
    return _write_servable(
        spark, frames, out_dir, index_dir, positions_df, optimize,
        doc_stats_written=True,
    )


def compact_incremental_to_dir(
    spark: SparkSession,
    index_dir: str,
    out_dir: str,
    optimize: bool = False,
):
    """Disk handoff for the O(delta) segment store
    (``compact_incremental``): same servable layout as
    ``compact_to_dir`` but docids are the segment store's STABLE ids
    and positions come straight from the committed positional segments
    (``incremental_positions`` — already on the right docids, with
    tombstones applied), so the handoff never re-joins the staging
    area. With ``optimize=True`` the dir gains blocks/ + packed
    postings/positions (``indexer.optimize_index``) — a long-lived
    streamed corpus gets block-max pruning and compression on a
    background compact-then-optimize schedule, never a full rebuild."""
    frames = compact_incremental(spark, index_dir)
    positions_df = None
    if frames.manifest["flags"].get("positions", False):
        positions_df = incremental_positions(spark, index_dir)
    return _write_servable(
        spark, frames, out_dir, index_dir, positions_df, optimize
    )


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


def dedup_event_stream(
    spark: SparkSession,
    source: str,
    watermark_delay: str = "2 hours",
    timeout_sec: int = 300,
) -> DataFrame:
    """Streaming exact deduplication: at-least-once event delivery ->
    exactly-once analytics via ``dropDuplicatesWithinWatermark`` on the
    event key. Unlike plain streaming ``dropDuplicates`` (whose key
    state grows forever), the watermark EVICTS state for keys older
    than the delay — the bounded-state production shape; a replayed
    event arriving within the delay is dropped, one arriving later
    than the watermark is the standard at-least-once residual risk.

    To exercise the drop path deterministically the source backlog is
    read twice and unioned, so every event arrives exactly twice with
    identical payloads; the availableNow output must equal the distinct
    input — which is how the gate pins it to a SQL oracle.

    Returns the deduplicated event rows from the memory sink."""
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    once = spark.readStream.schema(schema).parquet(source)
    again = spark.readStream.schema(schema).parquet(source)
    deduped = (
        once.union(again)
        .withWatermark("ts", watermark_delay)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    _WINDOW_SINK_SEQ[0] += 1
    name = f"se_dedup_events_{_WINDOW_SINK_SEQ[0]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)


def _term_partials(postings: DataFrame) -> DataFrame:
    """Per-term N/avgdl-INDEPENDENT aggregates, from which every lexicon
    column derives by a map-only pass (``derive_lexicon``):

      df, max_tf, best   — the associative aggregates of compute_lexicon
      skyline            — the Pareto frontier of (tf, doc_len) pairs:
                           points not dominated by any (tf' >= tf,
                           dl' <= dl). The BM25 bound factor
                           g(tf, dl; avgdl) is increasing in tf and
                           decreasing in dl, so for EVERY avgdl the
                           maximizer over a term's postings lies on this
                           frontier — max_g is recomputable under a
                           drifting avgdl without touching the postings
                           (the same idea as Lucene's competitive
                           (freq, norm) impact pairs).
    """
    from pyspark.sql import Window as W

    ratio = (
        F.col("tf").cast("double")
        / (F.col("doc_len") + F.col("tf")).cast("double")
    )
    base = postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.max("tf").alias("max_tf"),
        F.max(
            F.struct(
                ratio.alias("r"),
                (-F.col("docid")).alias("nd"),
                F.col("tf").alias("tf"),
                F.col("doc_len").alias("dl"),
            )
        ).alias("best"),
    )
    # skyline: max tf per (term, dl), kept only if it beats every
    # smaller dl's tf (running-max window over the term's distinct
    # doc_lens — bounded by the distinct-length count, never df)
    per_dl = postings.groupBy("term", "doc_len").agg(F.max("tf").alias("tf"))
    prev_max = F.max("tf").over(
        W.partitionBy("term")
        .orderBy(F.col("doc_len").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky = (
        per_dl.withColumn("prev_max", prev_max)
        .filter(F.col("tf") > F.coalesce(F.col("prev_max"), F.lit(-1)))
        .groupBy("term")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("tf"), F.col("doc_len").alias("dl")))
            ).alias("skyline")
        )
    )
    return base.join(sky, "term")


def derive_lexicon(partials: DataFrame, n_docs: int, avg_doc_len: float) -> DataFrame:
    """Map-only lexicon from ``_term_partials`` given the CURRENT
    collection stats — exactly equal to ``compute_lexicon`` over the
    live postings (same JVM expressions; the skyline contains every
    possible g-maximizer for any avgdl)."""
    from ..operators.indexer import B, K1

    def g(tf_col, dl_col):
        ltf = F.lit(1.0) + F.log10(tf_col.cast("double"))
        return ltf / (
            ltf
            + F.lit(K1)
            * (
                F.lit(1.0 - B)
                + F.lit(B) * dl_col.cast("double") / F.lit(avg_doc_len)
            )
        )

    max_g = F.array_max(
        F.transform(F.col("skyline"), lambda s: g(s["tf"], s["dl"]))
    )
    return (
        partials.select(
            "term",
            "df",
            "max_tf",
            F.col("best.tf").alias("bm25_tf"),
            F.col("best.dl").alias("bm25_dl"),
            max_g.alias("max_g_bm25"),
        )
        .withColumn(
            "idf", F.log10(F.lit(float(n_docs)) / F.col("df").cast("double"))
        )
        .withColumn(
            "tub_tfidf",
            (F.lit(1.0) + F.log10(F.col("max_tf").cast("double"))) * F.col("idf"),
        )
        .withColumn(
            "tub_bm25",
            (F.col("idf") * F.col("bm25_tf"))
            / (
                F.col("bm25_tf")
                + F.lit(K1)
                * (
                    F.lit(1.0 - B)
                    + F.lit(B) * F.col("bm25_dl").cast("double") / F.lit(avg_doc_len)
                )
            ),
        )
        .withColumn("tub_bm25_exact", F.col("idf") * F.col("max_g_bm25"))
    )


def _inc_segs(spark: SparkSession, root, name: str, n: int) -> DataFrame | None:
    """Union of committed segment parquets inc/<name>/seg_0..n-1."""
    from functools import reduce

    paths = [str(root / name / f"seg_{i}") for i in range(n)]
    frames = [spark.read.parquet(p) for p in paths]
    if not frames:
        return None
    return reduce(lambda a, b: a.unionByName(b), frames)


def incremental_positions(spark: SparkSession, index_dir: str) -> DataFrame:
    """Live positional postings of the incremental segment store: the
    union of committed ``positions/seg_*`` minus tombstoned docids —
    exactly the positions DataFrame ``phrase_search`` /
    ``proximity_search`` / ``snippet_windows`` take (pair it with the
    lexicon from ``compact_incremental``'s frames for rarest-first
    ordering). O(delta) maintenance: each compaction appends one
    positional segment on the docids it assigned; a re-ingested pid's
    old positions are invalidated by the SAME docid tombstone that
    kills its postings, so no positional rewrite ever happens."""
    import json
    from pathlib import Path

    root = Path(index_dir) / "inc"
    state_path = root / "state.json"
    if not state_path.exists():
        raise ValueError("no compacted segments: run compact_incremental first")
    n_seg = json.loads(state_path.read_text())["segments"]
    if n_seg == 0 or not (root / "positions").exists():
        raise ValueError(
            "no positional segments: ingest with positions=True, then "
            "compact_incremental"
        )
    pos = _inc_segs(spark, root, "positions", n_seg)
    tombs = _inc_segs(spark, root, "tombstones", n_seg)
    if tombs is not None:
        pos = pos.join(tombs, "docid", "left_anti")
    return pos


def compact_incremental(spark: SparkSession, index_dir: str):
    """O(delta) compaction: fold only the staged micro-batches newer
    than the last compaction into a persistent base, instead of
    rebuilding the whole index per call (the ``compact`` contract).

    Lucene-style segment model under ``{index_dir}/inc/``:

      docs/seg_k, postings/seg_k   — per-compaction APPENDS; docids are
          assigned PAST the current max in pid order, so ids of
          already-compacted documents never move (stable-docid
          contract; a FULL rebuild instead reassigns globally).
      tombstones/seg_k             — docids superseded by a re-ingested
          pid; readers anti-join them. A re-ingested doc gets a NEW
          docid (doc rows are immutable versions).
      positions/seg_k              — positional appends on the same
          docids (only when the ingest ran with ``positions=True``);
          invalidated by the same tombstones, served by
          ``incremental_positions``.
      partials/seg_k               — full snapshot of per-term
          N/avgdl-independent aggregates; only TOUCHED terms (terms of
          delta docs + terms of tombstoned docs) are recomputed from
          live postings, the rest are carried over — O(delta-touched),
          never O(vocabulary-postings).
      state.json                   — last compacted batch_id, next
          docid, running n_docs / total_doc_len (committed LAST, so a
          crashed compaction's orphan seg_k is invisible and simply
          overwritten by the retry).

    The derived lexicon (``derive_lexicon``) equals ``compute_lexicon``
    over the live postings exactly — idf/tub columns are recomputed
    per call from the CURRENT n_docs/avgdl, and the skyline partial
    makes the exact BM25 bound avgdl-drift-safe (asserted equal to the
    full rebuild in tests/test_incremental_compaction.py).
    """
    import json
    from pathlib import Path

    from ..operators.frames import IndexFrames
    from ..operators.indexer import assign_dense_ids

    root = Path(index_dir) / "inc"
    root.mkdir(parents=True, exist_ok=True)
    state_path = root / "state.json"
    state = (
        json.loads(state_path.read_text())
        if state_path.exists()
        else {
            "last_batch_id": -1,
            "next_docid": 1,
            "segments": 0,
            "n_docs": 0,
            "total_doc_len": 0,
        }
    )
    mpath = Path(index_dir) / "stream_manifest.json"
    manifest = (
        json.loads(mpath.read_text())
        if mpath.exists()
        else {"flags": {"stem_stop": True, "compression": False,
                        "max_score": True}}
    )

    staged = spark.read.parquet(f"{index_dir}/stage_stream")
    delta = staged.filter(F.col("batch_id") > state["last_batch_id"])
    n_seg = state["segments"]
    new_batch_row = delta.agg(
        F.max("batch_id").alias("mb"), F.count("*").alias("cnt")
    ).collect()[0]
    if new_batch_row["cnt"] > 0:
        sid = n_seg
        # within the delta, a pid's LATEST batch wins
        latest = delta.groupBy("pid").agg(F.max("batch_id").alias("batch_id"))
        cur = delta.join(latest, ["pid", "batch_id"]).cache()

        # tombstone base docs superseded by re-ingested pids; their
        # terms join the touched set (doc rows carry a distinct-term
        # array precisely so this needs NO docid-keyed postings scan)
        base_docs = _inc_segs(spark, root, "docs", n_seg)
        old_tombs = _inc_segs(spark, root, "tombstones", n_seg)
        if base_docs is not None:
            live_docs = base_docs
            if old_tombs is not None:
                live_docs = live_docs.join(old_tombs, "docid", "left_anti")
            superseded = live_docs.join(
                cur.select("pid").distinct(), "pid"
            ).cache()
        else:
            superseded = None

        delta_docs = cur.select("pid", "content_sha256", "doc_len").distinct()
        with_ids = assign_dense_ids(
            delta_docs, ["pid"], "docid", start=state["next_docid"]
        )
        delta_terms = cur.groupBy("pid").agg(
            F.collect_set("term").alias("terms")
        )
        doc_rows = with_ids.join(delta_terms, "pid").select(
            "docid", "pid", "doc_len", "content_sha256", "terms"
        )
        doc_rows.write.mode("overwrite").parquet(str(root / "docs" / f"seg_{sid}"))
        post_rows = cur.join(
            spark.read.parquet(str(root / "docs" / f"seg_{sid}"))
            .select("pid", "docid"),
            "pid",
        ).select("term", "docid", "tf", "doc_len")
        post_rows.write.mode("overwrite").parquet(
            str(root / "postings" / f"seg_{sid}")
        )
        if manifest["flags"].get("positions", False):
            # positional segments mirror the postings segments exactly:
            # O(delta) appends on the docids this compaction assigned,
            # invalidated by the same docid tombstones — a re-ingested
            # pid's old positions die with its old docid
            pos_delta = spark.read.parquet(f"{index_dir}/pos_stream").filter(
                F.col("batch_id") > state["last_batch_id"]
            )
            (
                pos_delta.join(latest, ["pid", "batch_id"])
                .join(
                    spark.read.parquet(str(root / "docs" / f"seg_{sid}"))
                    .select("pid", "docid"),
                    "pid",
                )
                .select("term", "docid", "doc_len", "tf", "positions")
                .write.mode("overwrite")
                .parquet(str(root / "positions" / f"seg_{sid}"))
            )
        tomb_rows = (
            superseded.select("docid")
            if superseded is not None
            else spark.createDataFrame([], "docid long")
        )
        tomb_rows.write.mode("overwrite").parquet(
            str(root / "tombstones" / f"seg_{sid}")
        )

        # touched terms: delta terms + tombstoned docs' terms
        touched = cur.select("term").distinct()
        if superseded is not None:
            touched = touched.unionByName(
                superseded.select(F.explode("terms").alias("term")).distinct()
            ).distinct()
        all_posts = _inc_segs(spark, root, "postings", sid + 1)
        all_tombs = _inc_segs(spark, root, "tombstones", sid + 1)
        live_posts = all_posts.join(all_tombs, "docid", "left_anti")
        recomputed = _term_partials(live_posts.join(touched, "term"))
        old_partials = (
            spark.read.parquet(str(root / "partials" / f"seg_{n_seg - 1}"))
            if n_seg > 0
            else None
        )
        if old_partials is not None:
            partials = old_partials.join(touched, "term", "left_anti").unionByName(
                recomputed
            )
        else:
            partials = recomputed
        partials.write.mode("overwrite").parquet(
            str(root / "partials" / f"seg_{sid}")
        )

        # running collection stats: O(delta) aggregates only
        added = spark.read.parquet(str(root / "docs" / f"seg_{sid}")).agg(
            F.count("*").alias("n"), F.sum("doc_len").alias("dl")
        ).collect()[0]
        removed = (
            superseded.agg(
                F.count("*").alias("n"), F.sum("doc_len").alias("dl")
            ).collect()[0]
            if superseded is not None
            else None
        )
        state["n_docs"] += int(added["n"]) - (int(removed["n"]) if removed else 0)
        state["total_doc_len"] += int(added["dl"] or 0) - (
            int(removed["dl"] or 0) if removed else 0
        )
        state["next_docid"] += int(added["n"])
        state["last_batch_id"] = int(new_batch_row["mb"])
        state["segments"] = sid + 1
        state_path.write_text(json.dumps(state, indent=2))  # commit point
        cur.unpersist()
        if superseded is not None:
            superseded.unpersist()

    # ---- serve the committed state --------------------------------------
    n_seg = state["segments"]
    docs = _inc_segs(spark, root, "docs", n_seg)
    tombs = _inc_segs(spark, root, "tombstones", n_seg)
    posts = _inc_segs(spark, root, "postings", n_seg)
    if docs is None:
        raise ValueError("no compacted segments and no staged batches")
    if tombs is not None:
        docs = docs.join(tombs, "docid", "left_anti")
        posts = posts.join(tombs, "docid", "left_anti")
    doc_stats = docs.select("docid", "pid", "doc_len", "content_sha256")
    n_docs, total_doc_len = state["n_docs"], state["total_doc_len"]
    avgdl = total_doc_len / n_docs
    partials = spark.read.parquet(str(root / "partials" / f"seg_{n_seg - 1}"))
    lexicon = derive_lexicon(partials, n_docs, avgdl)
    stats = {
        "n_docs": int(n_docs),
        "total_doc_len": int(total_doc_len),
        "avg_doc_len": avgdl,
        "n_terms": None,
    }
    return IndexFrames(
        spark,
        doc_stats,
        posts,
        lexicon,
        spark.createDataFrame(
            [], "term string, block_id long, max_docid long, num_postings long"
        ),
        stats,
        manifest,
    )


def compact(
    spark: SparkSession,
    index_dir: str,
    doc_stats: DataFrame | None = None,
):
    """Fold staged streaming blocks into a servable in-memory index:
    doc stats + postings + lexicon over everything ingested so far.
    Dense docids are (re)assigned by pid order at compaction time.
    Flags come from the ingest's ``stream_manifest.json`` (never
    assumed), so query-time analysis matches ingest-time analysis.

    ``doc_stats`` pins an EXISTING (docid, pid, doc_len,
    content_sha256) assignment instead of assigning fresh ids —
    ``compact_to_dir`` passes the read-back of the doc_stats parquet
    it just wrote, so postings/lexicon/stats provably derive from the
    on-disk assignment rather than from a cached plan whose docids
    exist only in memory."""
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

    if doc_stats is None:
        doc_rows = cur.select("pid", "content_sha256", "doc_len").distinct()
        with_ids = assign_dense_ids(doc_rows, ["pid"], "docid", start=1)
        doc_stats = with_ids.select(
            "docid", "pid", "doc_len", "content_sha256"
        ).cache()
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
