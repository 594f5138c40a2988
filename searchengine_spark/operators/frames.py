"""In-memory (DataFrame-only) index build — the no-sink twin of
``indexer.build_index``.

Same logical plan as the staged build (SURVEY.md §3.1): analysis chain
-> empty-doc filter -> deterministic dense docids -> explode + hash agg
tf -> lexicon/blocks aggregation — but every stage stays a lazy
DataFrame; nothing is written to disk. This is the path used by the
driver's correctness gate (``__spark_entry__.queries``), by notebooks,
and by tests that don't need checkpoint/resume.

Reference lifecycle being re-expressed: Spimi.executeSpimi
(/root/reference/indexer/.../algorithms/Spimi.java:221-335) +
Merger.mergeIndexes (/root/reference/indexer/.../algorithms/Merger.java:260-458),
with Catalyst's spillable partial+final hash aggregation standing in
for SPIMI's memory-bounded flush and the sort-merge shuffle standing in
for the k-way merge.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import (
    BLOCK_DF_THRESHOLD,
    assign_dense_ids,
    compute_lexicon,
)


@dataclass
class IndexFrames:
    """Duck-typed drop-in for ``indexer.InvertedIndex``: exposes the same
    ``spark / postings / lexicon / doc_stats / blocks / stats / manifest``
    surface, so ``query.top_k`` runs unchanged against it."""

    spark: SparkSession
    doc_stats: DataFrame
    postings: DataFrame
    lexicon: DataFrame
    blocks: DataFrame
    stats: dict
    manifest: dict
    lexicon_map: dict | None = None  # driver-side memo (see InvertedIndex.warm)


def tokenized_docs(docs: DataFrame, stem_stop: bool) -> DataFrame:
    """(pid, content) -> (docid, pid, doc_len, content_sha256, tokens).

    Applies the analysis chain, the empty-doc filter (Spimi.java:260-261
    — no docid is consumed by an empty doc), and deterministic dense
    docids 1..N ordered by pid (the scalable two-pass replacement for
    the reference's sequential counter, Spimi.java:229).
    """
    from ..functions.analysis import tokens_col

    def analyze(part: DataFrame) -> DataFrame:
        return part.select(
            "pid",
            F.sha2(F.col("content"), 256).alias("content_sha256"),
            tokens_col(F.col("content"), stem_stop).alias("tokens"),
        ).filter(F.size("tokens") > 0)

    with_ids = assign_dense_ids(
        docs, ["pid"], "docid", start=1, post_partition=analyze
    )
    return with_ids.select(
        "docid",
        "pid",
        F.size("tokens").cast("long").alias("doc_len"),
        "content_sha256",
        "tokens",
    )


def exploded_term_tf(
    doc_tokens: DataFrame, keep_cols: list[str], tokens: str = "tokens"
) -> DataFrame:
    """``(*keep_cols, term, tf int)``: per-row term frequencies as run
    lengths of the sorted token array — pure JVM, O(len·log len) per
    row, and crucially NO shuffle: every (term, docid) pair lives
    entirely inside its own row, so the explode + groupBy formulation
    shuffles already-complete partial aggregates just to merge nothing.
    At full corpus scale that was an entire corpus-sized shuffle in the
    SPIMI stage (= updateOrAddPosting, Spimi.java:195-212, likewise a
    per-document in-memory counter).

    Each intermediate (sorted array, run starts) is materialized as its
    own projection column, NOT nested into one expression: Catalyst
    inlines duplicated subtrees when a single projection references
    them repeatedly, which re-evaluated ``array_sort`` per element and
    ran ~75x SLOWER than the groupBy it replaces (measured 357 s vs
    6.8 s at 200k docs; this chained form: 2.7 s). SPARK-36718 keeps
    multi-referenced expensive expressions in separate projections.

    Blank tokens emit no entry (they still count toward doc_len,
    Spimi.java:264,282-286); all-blank docs emit no rows (``zip_with``
    pads to the longer array, so the empty case must short-circuit
    before it fabricates a null run)."""
    st = F.array_sort(F.filter(F.col(tokens), lambda t: t != F.lit("")))
    d = doc_tokens.withColumn("__st", st).withColumn("__n", F.size("__st"))
    # 0-based indices where a new run (distinct term) starts; CASE WHEN
    # is lazy per-branch, so n == 0 never evaluates sequence(0, -1)
    starts = F.filter(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: (i == F.lit(0))
        | (
            F.element_at(F.col("__st"), i + 1)
            != F.element_at(F.col("__st"), i)
        ),
    )
    d = d.withColumn(
        "__starts",
        F.when(F.col("__n") > 0, starts).otherwise(
            F.array().cast("array<int>")
        ),
    )
    # each run's end = the next run's start (sentinel: array length)
    ends = F.concat(
        F.slice(
            F.col("__starts"),
            2,
            F.greatest(F.size(F.col("__starts")) - 1, F.lit(0)),
        ),
        F.array(F.col("__n")),
    )
    entries = F.zip_with(
        F.col("__starts"),
        ends,
        lambda s, e: F.struct(
            F.element_at(F.col("__st"), s + 1).alias("term"),
            (e - s).cast("int").alias("tf"),
        ),
    )
    guarded = F.when(F.col("__n") > 0, entries).otherwise(
        F.array().cast("array<struct<term:string,tf:int>>")
    )
    return d.select(*keep_cols, F.explode(guarded).alias("__e")).select(
        *keep_cols,
        F.col("__e.term").alias("term"),
        F.col("__e.tf").alias("tf"),
    )


def postings_frame(doc_tokens: DataFrame) -> DataFrame:
    """(term, docid, doc_len, tf) — blank tokens count toward doc_len
    but emit no posting; all-blank docs emit no rows."""
    return exploded_term_tf(doc_tokens, ["docid", "doc_len"]).select(
        "term", "docid", "doc_len", F.col("tf").cast("int").alias("tf")
    )


def exploded_term_positions(
    doc_tokens: DataFrame, keep_cols: list[str], tokens: str = "tokens"
) -> DataFrame:
    """``(*keep_cols, term, tf int, positions array<int>)``: per-row
    positional postings (0-based offsets into the analyzed token
    stream, blank tokens occupy a position but emit no entry) — the
    positional twin of ``exploded_term_tf``, same narrow run-length
    plan over ``array_sort(struct(term, pos))`` (sorts by term, then
    pos, so each run's pos slice is already ascending), same
    chained-column structure to keep every expensive intermediate
    evaluated once, and the same guarantee: NO shuffle, because a
    (term, docid) group never spans rows."""
    with_pos = F.filter(
        F.transform(
            F.col(tokens),
            lambda t, i: F.struct(t.alias("t"), i.cast("int").alias("p")),
        ),
        lambda s: s["t"] != F.lit(""),
    )
    d = doc_tokens.withColumn("__st", F.array_sort(with_pos)).withColumn(
        "__n", F.size("__st")
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: (i == F.lit(0))
        | (
            F.element_at(F.col("__st"), i + 1)["t"]
            != F.element_at(F.col("__st"), i)["t"]
        ),
    )
    d = d.withColumn(
        "__starts",
        F.when(F.col("__n") > 0, starts).otherwise(
            F.array().cast("array<int>")
        ),
    )
    ends = F.concat(
        F.slice(
            F.col("__starts"),
            2,
            F.greatest(F.size(F.col("__starts")) - 1, F.lit(0)),
        ),
        F.array(F.col("__n")),
    )
    entries = F.zip_with(
        F.col("__starts"),
        ends,
        lambda s, e: F.struct(
            F.element_at(F.col("__st"), s + 1)["t"].alias("term"),
            (e - s).cast("int").alias("tf"),
            F.transform(
                F.slice(F.col("__st"), s + 1, e - s), lambda x: x["p"]
            ).alias("positions"),
        ),
    )
    guarded = F.when(F.col("__n") > 0, entries).otherwise(
        F.array().cast(
            "array<struct<term:string,tf:int,positions:array<int>>>"
        )
    )
    return d.select(*keep_cols, F.explode(guarded).alias("__e")).select(
        *keep_cols,
        F.col("__e.term").alias("term"),
        F.col("__e.tf").alias("tf"),
        F.col("__e.positions").alias("positions"),
    )


def blocks_frame(postings: DataFrame) -> DataFrame:
    """Per-term sqrt block law + per-block max docid / posting count
    (VocabularyEntry.java:348-361; BlockDescriptor semantics) without a
    per-term window: block_id derives from the docid RANK which at
    gate scale is computed by ntile-free arithmetic — here we use the
    posting count ordering via a range-partitioned row_number done with
    groupBy aggregation only (rank = count of postings with smaller
    docid is avoided; instead sort_array over collected structs).

    For bounded-df vocabularies this collects each term's postings into
    one array (fine below ~1M postings/term); the staged builder's
    `_rank_within_groups` is the unbounded-scale path.
    """
    per_term = postings.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sort_array(F.collect_list(F.struct("docid"))).alias("ds"),
    )
    per_term = per_term.withColumn(
        "num_blocks",
        F.when(
            F.col("df") >= BLOCK_DF_THRESHOLD, F.ceil(F.sqrt(F.col("df")))
        )
        .otherwise(F.lit(1))
        .cast("long"),
    ).withColumn(
        "max_per_block", F.ceil(F.col("df") / F.col("num_blocks")).cast("long")
    )
    exploded = per_term.select(
        "term",
        "max_per_block",
        F.posexplode("ds").alias("rank", "d"),
    ).select(
        "term",
        (F.col("rank") / F.col("max_per_block")).cast("long").alias("block_id"),
        F.col("d.docid").alias("docid"),
    )
    return exploded.groupBy("term", "block_id").agg(
        F.max("docid").alias("max_docid"),
        F.count("*").alias("num_postings"),
    )


def build_index_frames(
    docs: DataFrame, stem_stop: bool = True, with_blocks: bool = False
) -> IndexFrames:
    """Build the full logical index as lazy DataFrames.

    ``stats`` requires one action (count + sum over doc_stats); the
    doc-token frame is cached around it so the postings branch reuses
    the analysis work instead of re-running the pandas UDF.
    """
    spark = docs.sparkSession
    dt = tokenized_docs(docs, stem_stop).cache()
    doc_stats = dt.select("docid", "pid", "doc_len", "content_sha256")
    n_docs, total_doc_len = doc_stats.agg(
        F.count("*"), F.sum("doc_len")
    ).collect()[0]
    if n_docs == 0:
        raise ValueError("empty corpus: every document tokenized to nothing")
    avgdl = total_doc_len / n_docs
    postings = postings_frame(dt)
    lexicon = compute_lexicon(postings, int(n_docs), avgdl)
    blocks = (
        blocks_frame(postings)
        if with_blocks
        else spark.createDataFrame(
            [], "term string, block_id long, max_docid long, num_postings long"
        )
    )
    stats = {
        "n_docs": int(n_docs),
        "total_doc_len": int(total_doc_len),
        "avg_doc_len": avgdl,
        "n_terms": None,  # lazily countable; not needed for scoring
    }
    manifest = {"flags": {"stem_stop": stem_stop, "compression": False}}
    return IndexFrames(spark, doc_stats, postings, lexicon, blocks, stats, manifest)
