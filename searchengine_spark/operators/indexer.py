"""Distributed SPIMI-equivalent inverted-index build.

Re-expresses the reference's two-stage build — SPIMI partial indexing
(/root/reference/indexer/.../algorithms/Spimi.java:221-335) followed by
a k-way sorted merge (/root/reference/indexer/.../algorithms/Merger.java:260-458)
— as a declarative Spark pipeline:

  source df
    -> analysis chain (JVM regex + Porter pandas UDF)      [= Preprocesser]
    -> empty-doc filter + deterministic dense docids       [= Spimi.java:229,260]
    -> doc_stats parquet (+ sha256 lineage per row)        [= DocumentIndexEntry]
    -> explode + hash agg (term, docid) -> tf              [= updateOrAddPosting]
    -> staged posting-block parquet (checkpoint point)     [= partial indexes]
    -> repartitionByRange(term, docid) + sort              [= Merger k-way merge]
    -> postings parquet, lexicon agg, block metadata       [= vocabulary + descriptors]
    -> optional packed postings (gap-VB docids, unary tfs) [= compression flags]

Catalyst supplies what the reference hand-builds: the memory-bounded
SPIMI flush becomes spillable partial+final hash aggregation; the k-way
merge-by-min-term becomes one sort-merge shuffle; skewed terms are
split across range partitions because the range key is (term, docid),
not term alone — a heavy term simply spans several partitions, so no
single task owns a boilerplate term's full posting list.

Layout on disk (parquet + manifest; production target is Iceberg — the
same code works with ``format("iceberg")`` when a catalog is present):

  index_dir/
    manifest.json     flags, collection stats, per-stage lineage/metrics
    doc_stats/        (docid, pid, doc_len, content_sha256)
    stage_postings/   (term, docid, tf, doc_len)     <- checkpoint granularity
    postings/         (term, docid, tf, doc_len)     sorted by (term, docid)
    lexicon/          (term, df, idf, max_tf, bm25_tf, bm25_dl,
                       tub_tfidf, tub_bm25, num_blocks, max_per_block)
    blocks/           (term, block_id, max_docid, num_postings)
    postings_packed/  (term, block_id, num_postings, max_docid,
                       docids_vb binary, tfs_unary binary)

``doc_len`` is denormalized into the postings (the reference keeps a
separate in-RAM DocumentIndex, DocumentIndex.java:9-75); carrying the
8 bytes per posting removes the docid join from the query hot path —
a deliberate space-for-shuffle trade the reference cannot make.
"""

from __future__ import annotations

import json
import shutil
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.analysis import tokens_col
from ..functions.codecs import gaps_encode, unary_encode, vb_encode

K1 = 1.5  # Scorer.java:15-19
B = 0.75
BLOCK_DF_THRESHOLD = 1024  # VocabularyEntry.java:348-352


@dataclass
class IndexConfig:
    stem_stop: bool = True       # reference flag -s
    compression: bool = True     # reference flag -c (packed postings)
    max_score: bool = True       # reference flag -m (Flags.java:11-55)
    positions: bool = False      # beyond-reference: positional postings stage
    fields: bool = False         # beyond-reference: BM25F field postings
    num_partitions: int | None = None
    overwrite: bool = False      # False => resume from completed stages


@dataclass
class InvertedIndex:
    """Handle to a built index: lazy DataFrame accessors + stats."""

    spark: SparkSession
    index_dir: str
    manifest: dict = field(default_factory=dict)

    @classmethod
    def load(cls, spark: SparkSession, index_dir: str) -> "InvertedIndex":
        manifest = json.loads((Path(index_dir) / "manifest.json").read_text())
        return cls(spark, index_dir, manifest)

    def _read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(str(Path(self.index_dir) / name))

    @property
    def doc_stats(self) -> DataFrame:
        return self._read("doc_stats")

    @property
    def postings(self) -> DataFrame:
        return self._read("postings")

    @property
    def lexicon(self) -> DataFrame:
        return self._read("lexicon")

    @property
    def blocks(self) -> DataFrame:
        return self._read("blocks")

    @property
    def postings_packed(self) -> DataFrame:
        return self._read("postings_packed")

    @property
    def field_postings(self) -> DataFrame:
        """BM25F filename-field postings (term, docid) — present only
        when built with fields=True. Lets fielded_top_k fold the path
        boost into a term-pushdown scan instead of a match-set-sized
        doc_stats join."""
        if not self.manifest.get("flags", {}).get("fields", False):
            raise ValueError(
                "index was built without the field-postings stage; rebuild "
                "with IndexConfig(fields=True) for indexed fielded search"
            )
        return self._read("field_postings")

    @property
    def positions(self) -> DataFrame:
        """Positional postings (term, docid, doc_len, tf, positions) —
        present only when the index was built with positions=True.
        When the build also compressed (positions_packed flag), the
        gap-VB arrays are decoded transparently here, so phrase/
        proximity/snippet serving is layout-agnostic."""
        if not self.manifest.get("flags", {}).get("positions", False):
            raise ValueError(
                "index was built without the positions stage; rebuild with "
                "IndexConfig(positions=True) to serve phrase queries from disk"
            )
        if self.manifest.get("flags", {}).get("positions_packed", False):
            return unpack_positions(self.positions_packed)
        return self._read("positions")

    @property
    def positions_packed(self) -> DataFrame:
        """Raw gap-VB packed positional postings (term, docid, doc_len,
        tf, n_positions, positions_vb) — compression + positions builds."""
        return self._read("positions_packed")

    @property
    def stats(self) -> dict:
        return self.manifest["stats"]

    # driver-side memos (None = not warmed / too large)
    lexicon_map: dict | None = None
    pid_map: dict | None = None

    def warm(
        self,
        max_lexicon_rows: int | None = None,
        max_doc_rows: int | None = None,
    ) -> "InvertedIndex":
        """Serving-mode warm-up: cache the hot tables and, when small
        enough, pull the lexicon and the docid->pid map into driver
        dicts so a query costs zero Spark jobs for term lookup and pid
        resolution — the reference's exact serving posture (it loads
        the ENTIRE DocumentIndex into RAM at startup,
        DocumentIndex.java:55-75, and LRU-caches vocabulary entries,
        Vocabulary.java:11-17).

        Beyond the thresholds (10^12-doc scale) queries fall back to
        the filtered-read point lookup and the broadcast pid join.
        Defaults come from SE_WARM_MAX_LEXICON_ROWS /
        SE_WARM_MAX_DOC_ROWS (driver-heap-dependent deploy config),
        else 1M lexicon / 5M doc rows."""
        import os

        if max_lexicon_rows is None:
            max_lexicon_rows = int(
                os.environ.get("SE_WARM_MAX_LEXICON_ROWS", 1_000_000)
            )
        if max_doc_rows is None:
            max_doc_rows = int(
                os.environ.get("SE_WARM_MAX_DOC_ROWS", 5_000_000)
            )
        self.postings.cache().count()
        ds = self.doc_stats.cache()
        lex = self.lexicon.cache()
        if lex.count() <= max_lexicon_rows:
            self.lexicon_map = {r["term"]: r.asDict() for r in lex.collect()}
        if ds.count() <= max_doc_rows:
            self.pid_map = {
                r["docid"]: r["pid"]
                for r in ds.select("docid", "pid").collect()
            }
        return self


def docs_from_code_table(df: DataFrame) -> DataFrame:
    """Adapt the north-star input (repo, path, commit, lang, content) to
    the engine's (pid, content) contract. pid = repo/path@commit
    truncated to 64 chars (DocumentIndexEntry.PID_SIZE,
    DocumentIndexEntry.java:43 — truncation is part of the semantics)."""
    pid = F.concat(F.col("repo"), F.lit("/"), F.col("path"), F.lit("@"), F.col("commit"))
    return df.select(
        F.substring(pid, 1, 64).alias("pid"),
        F.col("content").cast("string").alias("content"),
    )


def field_tokens_col(pid) -> Column:
    """Filename-field tokens of a pid (split on ``[/@.]``, empties
    dropped) — THE definition of the BM25F filename field.
    ``field_postings_frame``, build stage 7's ``avg_field_len``
    manifest stat, and ``query._avg_field_len``'s fallback all call
    this, so the persisted layout, the stored stat, and the serving
    fallback cannot desynchronize if the field definition changes."""
    return F.filter(F.split(pid, r"[/@.]"), lambda x: x != "")


def avg_field_len_of(doc_stats: DataFrame) -> float:
    """Scalar average filename-field length over a doc_stats frame —
    the per-field avg-length input of the Robertson BM25F normalizer,
    computed from the same ``field_tokens_col`` definition the field
    postings are built from."""
    row = (
        doc_stats.select(
            F.size(field_tokens_col(F.col("pid"))).alias("fl")
        )
        .agg(F.sum("fl").alias("s"), F.count("*").alias("c"))
        .collect()[0]
    )
    return float(row["s"]) / float(row["c"])


def field_postings_frame(doc_stats: DataFrame) -> DataFrame:
    """(term, docid, tf, field_len) filename-field postings derived
    from pid path tokens (pid split on ``[/@.]``, empties dropped) —
    the BM25F field layout (Robertson, Zaragoza & Taylor, CIKM 2004)
    specialized to the code table's filename field, now carrying the
    per-field term frequency and field length the FULL Robertson model
    needs (``query.bm25f_top_k``: per-field tf normalization with
    per-field b and avg length, field weights, shared saturation).
    One row per distinct (term, docid) like the old presence-only
    layout, so the boost-intuition ``fielded_top_k`` reads it
    unchanged. A narrow projection of doc_stats (per-row run-length
    tfs, no shuffle): the build persists it range-partitioned by
    (term, docid) so fielded search reads its rows with term pushdown
    instead of joining the match-set against doc_stats."""
    from .frames import exploded_term_tf

    toks = doc_stats.select(
        "docid",
        field_tokens_col(F.col("pid")).alias("tokens"),
    ).withColumn("field_len", F.size("tokens").cast("long"))
    return exploded_term_tf(toks, ["docid", "field_len"]).select(
        "term", "docid", F.col("tf").cast("int").alias("tf"), "field_len"
    )


def assign_dense_ids(
    df: DataFrame,
    order_cols: list[str],
    id_col: str = "docid",
    start: int = 1,
    num_partitions: int | None = None,
    post_partition=None,
) -> DataFrame:
    """Deterministic dense ids 1..N in ``ORDER BY order_cols`` without a
    driver collect of data (only one tiny count row per partition).

    Replaces the reference's sequential counter (Spimi.java:229) with
    the scalable two-pass pattern: range-partition + in-partition sort,
    per-partition counts -> cumulative offsets, then an Arrow-batched
    id stamp. The input is persisted so both passes see identical
    partitioning (RangePartitioner sampling is otherwise re-run per
    action).

    ``post_partition`` (DataFrame -> DataFrame, order-preserving narrow
    ops only: select/filter) is applied AFTER the range shuffle, so
    expensive derived columns (tokenization UDFs) stay out of the
    RangePartitioner's sampling pass — otherwise the sampler executes
    the whole upstream chain a second time just to sample the keys.

    The stamp itself is pure JVM: ``monotonically_increasing_id()``
    documents its layout as partition id in the upper bits and a
    per-row counter in the lower 33, so ``mid - (pid << 33)`` is the
    row's 0-based index within its (sorted, persisted) partition and
    ``offset[pid] + local_index`` is the dense id — no Arrow round
    trip of the (potentially wide: token arrays) rows through Python,
    which dominated the doc_stats stage wall time at 2M docs.
    """
    # always an explicit count: AQE's advisory sizing would coalesce a
    # small-to-mid shuffle to ONE partition (see _n_eff)
    part = df.repartitionByRange(
        _n_eff(df.sparkSession, num_partitions), *order_cols
    )
    part = part.sortWithinPartitions(*order_cols)
    if post_partition is not None:
        part = post_partition(part)
    part = part.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSIST_HANDLES.append(part)
    try:
        counts = (
            part.groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        by_pid = {r["pid"]: r["count"] for r in counts}
        offsets: dict[int, int] = {}
        acc = start
        for pid in sorted(by_pid):
            offsets[pid] = acc
            acc += by_pid[pid]

        pid_col = F.spark_partition_id().cast("long")
        local_ix = F.monotonically_increasing_id() - F.shiftleft(pid_col, 33)
        stamped = _stamp_ids_from_offsets(
            part.withColumn("__part", pid_col.cast("int")).withColumn(
                "__lix", local_ix
            ),
            offsets,
            key_col="__part",
            local_col="__lix",
            id_col=id_col,
            start=start,
        ).drop("__part", "__lix")
        # caller writes this to parquet next; keep the persist handle
        # alive via _PERSIST_HANDLES — the write re-reads cached blocks.
        return stamped
    except Exception:
        part.unpersist()
        raise


# above this many partitions the per-partition offset lookup switches
# from a codegen'd map literal to a broadcast hash join (100 TB path)
_OFFSET_MAP_MAX = 4096


def _stamp_ids_from_offsets(
    df: DataFrame,
    offsets: dict[int, int],
    key_col: str,
    local_col: str,
    id_col: str,
    start: int = 1,
) -> DataFrame:
    """``id_col = offsets[key_col] + local_col`` — the dense-id stamp
    given precomputed per-partition cumulative offsets. Map-literal
    lookup (stays inside whole-stage codegen) below ``_OFFSET_MAP_MAX``
    keys; a tiny broadcast hash join (narrow, no shuffle) above it."""
    if len(offsets) <= _OFFSET_MAP_MAX:
        pairs: list = []
        for p, o in offsets.items():
            pairs.extend((F.lit(int(p)), F.lit(int(o))))
        off_col = (
            F.element_at(F.create_map(*pairs), F.col(key_col).cast("int"))
            if pairs
            else F.lit(start)
        )
        return df.withColumn(
            id_col, (off_col + F.col(local_col)).cast("long")
        )
    off_df = df.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()],
        f"{key_col} int, __off long",
    )
    return (
        df.join(F.broadcast(off_df), key_col)
        .withColumn(id_col, (F.col("__off") + F.col(local_col)).cast("long"))
        .drop("__off")
    )


def _doc_token_offsets(spark: SparkSession, root: Path) -> dict[int, int]:
    """Per-partition cumulative docid offsets for the ``doc_tokens``
    stage, persisted as ``doc_offsets.json`` beside it (recomputed from
    the parquet's ``part_id`` column — a single RLE'd int column scan —
    if the json is missing, e.g. on resume of an interrupted build)."""
    p = root / "doc_offsets.json"
    if p.exists():
        return {int(k): int(v) for k, v in json.loads(p.read_text()).items()}
    cnt = (
        spark.read.parquet(str(root / "doc_tokens"))
        .groupBy("part_id")
        .count()
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 1
    for r in sorted(cnt, key=lambda r: r["part_id"]):
        offsets[int(r["part_id"])] = acc
        acc += r["count"]
    p.write_text(json.dumps(offsets))
    return offsets


def _doc_tokens_with_ids(
    spark: SparkSession, root: Path, min_splits: int | None = None
) -> DataFrame:
    """Read the ``doc_tokens`` stage with dense docids attached from the
    stored per-partition offsets (the ids are a pure function of
    ``(part_id, local_ix)``, so they never need to be materialized in
    the wide token parquet). Accepts the legacy layout (docid column
    already present) unchanged."""
    dt = (
        _read_stage(spark, root / "doc_tokens", min_splits)
        if min_splits is not None
        else spark.read.parquet(str(root / "doc_tokens"))
    )
    if "docid" in dt.columns:  # legacy layout (pre-fused stage 1)
        return dt
    offsets = _doc_token_offsets(spark, root)
    return _stamp_ids_from_offsets(
        dt, offsets, key_col="part_id", local_col="local_ix",
        id_col="docid",
    ).drop("part_id", "local_ix")


def _stage_done(path: Path) -> bool:
    return (path / "_SUCCESS").exists()


def _read_stage(spark: SparkSession, path: Path, min_splits: int) -> DataFrame:
    """Read a stage parquet with ``spark.sql.files.maxPartitionBytes``
    tuned so the scan yields at least ``min_splits`` input partitions.

    Needed because stage outputs (token arrays, postings over a small
    vocabulary) dictionary-encode so well that a multi-million-doc
    stage can fit inside one default 128 MB split — the downstream
    explode + partial aggregation then runs on a handful of tasks no
    matter how many cores exist (measured: the SPIMI stage was the one
    non-scaling build stage, 41 s -> 37 s from 4 to 16 cores). Clamped
    to [4 MB, 128 MB]: at real 100 TB scale the quotient exceeds
    128 MB and this is exactly the stock setting; only small-to-mid
    inputs get more splits. Local-size probing is best-effort (object
    stores skip it and keep the session default)."""
    try:
        total = sum(
            f.stat().st_size for f in Path(path).rglob("*.parquet")
        )
        if total > 0:  # empty probe (object store / no files): keep default
            mpb = min(max(total // max(min_splits, 1) + 1, 4 << 20), 128 << 20)
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(mpb))
    except Exception:
        pass
    return spark.read.parquet(str(path))


# persisted intermediates released at the end of build_index
def _n_eff(spark: SparkSession, n_part: int | None = None) -> int:
    """Effective shuffle-partition count for build-critical shuffles.

    AQE's advisory-size coalescing collapses a repartitionByRange with
    no explicit count to ONE partition for anything under ~64 MB
    shuffled (measured: 18.6 s vs 1.6 s on 32 cores at 100k docs), so
    every build stage passes an explicit count: the configured
    ``num_partitions`` when set, else max(shuffle.partitions,
    2 x defaultParallelism) — empty partitions cost nothing at real
    scale, while the default path keeps every core busy."""
    if n_part:
        return int(n_part)
    return max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        2 * spark.sparkContext.defaultParallelism,
    )


_PERSIST_HANDLES: list[DataFrame] = []


def _release_persisted() -> None:
    while _PERSIST_HANDLES:
        try:
            _PERSIST_HANDLES.pop().unpersist()
        except Exception:
            pass


def _rank_within_groups(
    df: DataFrame,
    group_col: str,
    order_col: str,
    rank_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based rank of each row within its group, ordered by order_col,
    WITHOUT a per-group window (a window over a boilerplate term would
    put that term's entire posting list in one task). Same two-pass
    offsets pattern as assign_dense_ids, keyed by (partition, group)."""
    n = _n_eff(df.sparkSession, num_partitions)
    part = df.repartitionByRange(n, group_col, order_col)
    part = part.sortWithinPartitions(group_col, order_col)
    part = part.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSIST_HANDLES.append(part)
    counts = part.groupBy(
        F.spark_partition_id().alias("pid"), F.col(group_col)
    ).count()
    # Only groups SPANNING a partition boundary need a nonzero offset;
    # range partitioning on (group, order) makes these O(#partitions)
    # rows regardless of vocabulary size — never a full-vocab collect.
    from pyspark.sql import Window as W

    spanning = (
        counts.withColumn(
            "n_parts", F.count("*").over(W.partitionBy(group_col))
        )
        .filter(F.col("n_parts") > 1)
        .collect()
    )
    per_group: dict[str, list[tuple[int, int]]] = {}
    for r in spanning:
        per_group.setdefault(r[group_col], []).append((r["pid"], r["count"]))
    offsets: dict[tuple[int, str], int] = {}
    for g, lst in per_group.items():
        acc = 0
        for pid, cnt in sorted(lst):
            offsets[(pid, g)] = acc
            acc += cnt

    out_schema = T.StructType(
        part.schema.fields + [T.StructField(rank_col, T.LongType(), False)]
    )

    def stamp(iterator: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seen: dict[str, int] = {}
        for batch in iterator:
            ranks = []
            for g in batch[group_col]:
                base = seen.get(g)
                if base is None:
                    base = offsets.get((pid, g), 0)
                ranks.append(base)
                seen[g] = base + 1
            batch = batch.copy()
            batch[rank_col] = ranks
            yield batch

    return part.mapInPandas(stamp, schema=out_schema)


def compute_lexicon(postings: DataFrame, n_docs: int, avg_doc_len: float) -> DataFrame:
    """Per-term statistics (VocabularyEntry semantics).

    Floating-point expressions replicate the reference's operation order
    bit-for-bit (IEEE-754 doubles both sides):

    * ``idf = log10(N / df)``                      VocabularyEntry.computeIDF
    * ``tub_tfidf = (1 + log10(max_tf)) * idf``    computeUpperBounds
    * ``tub_bm25 = (idf*bm25_tf) / (bm25_tf + k1*(1 - b + b*bm25_dl/avgdl))``
      with RAW bm25_tf (not log-tf) — the reference's admitted heuristic
      (documentation.pdf §3.2.1), reproduced as-is.

    The BM25 arg-max keeps the (tf, dl) pair maximizing ``tf/(tf+dl)``;
    the reference's streaming strict-``>`` update means the FIRST
    maximizer in docid order wins ties (PostingList.java:113-120) —
    reproduced via max over ``struct(ratio, -docid)``.
    """
    ratio = F.col("tf").cast("double") / (F.col("doc_len") + F.col("tf")).cast("double")
    best = F.max(
        F.struct(
            ratio.alias("r"),
            (-F.col("docid")).alias("nd"),
            F.col("tf").alias("tf"),
            F.col("doc_len").alias("dl"),
        )
    ).alias("best")
    # PROVABLE per-term BM25 bound factor: max over postings of
    # ltf/(ltf + k1*(1-b+b*dl/avgdl)). The reference's tub_bm25 uses raw
    # bm25_tf (an admitted heuristic, documentation.pdf §3.2.1) and is
    # NOT a true upper bound; MaxScore pruning with the exact bound is
    # guaranteed rank-identical to DAAT (tub_bm25_exact = idf * max_g).
    ltf = F.lit(1.0) + F.log10(F.col("tf").cast("double"))
    g = ltf / (
        ltf
        + F.lit(K1)
        * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len").cast("double") / F.lit(avg_doc_len))
    )
    max_g = F.max(g).alias("max_g_bm25")
    return (
        postings.groupBy("term")
        .agg(F.count("*").alias("df"), F.max("tf").alias("max_tf"), best, max_g)
        .select(
            "term",
            "df",
            "max_tf",
            F.col("best.tf").alias("bm25_tf"),
            F.col("best.dl").alias("bm25_dl"),
            "max_g_bm25",
        )
        .withColumn("idf", F.log10(F.lit(float(n_docs)) / F.col("df").cast("double")))
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


def compute_lexicon_salted(
    postings: DataFrame,
    n_docs: int,
    avg_doc_len: float,
    salt_buckets: int = 64,
) -> DataFrame:
    """Two-phase salted twin of ``compute_lexicon`` for skew-extreme
    vocabularies (north-rule requirement: stopword-heavy / boilerplate
    code terms whose posting lists hold a large fraction of all docs).

    Catalyst's partial+final hash aggregation already combines map-side,
    so plain ``groupBy(term)`` handles most skew; the salted form adds
    an explicit intermediate reduction keyed by ``(term, salt)`` —
    bounding ANY single reduce task to ~1/salt_buckets of a heavy
    term's postings even when the map-side combine ratio is poor (e.g.
    high-cardinality agg state or per-term array collection). Every
    statistic here decomposes associatively:

      df   = sum of partial counts        max_tf = max of partial maxes
      best = struct-max of partial maxes  max_g  = max of partial maxes

    so the salted result is EXACTLY equal to the unsalted one
    (asserted in tests/test_skew.py).
    """
    salt = F.pmod(F.hash(F.col("docid")), F.lit(salt_buckets)).alias("salt")
    ratio = F.col("tf").cast("double") / (F.col("doc_len") + F.col("tf")).cast("double")
    ltf = F.lit(1.0) + F.log10(F.col("tf").cast("double"))
    g = ltf / (
        ltf
        + F.lit(K1)
        * (F.lit(1.0 - B) + F.lit(B) * F.col("doc_len").cast("double") / F.lit(avg_doc_len))
    )
    part = (
        postings.withColumn("salt", salt)
        .groupBy("term", "salt")
        .agg(
            F.count("*").alias("df_p"),
            F.max("tf").alias("max_tf_p"),
            F.max(
                F.struct(
                    ratio.alias("r"),
                    (-F.col("docid")).alias("nd"),
                    F.col("tf").alias("tf"),
                    F.col("doc_len").alias("dl"),
                )
            ).alias("best_p"),
            F.max(g).alias("max_g_p"),
        )
    )
    merged = part.groupBy("term").agg(
        F.sum("df_p").alias("df"),
        F.max("max_tf_p").alias("max_tf"),
        F.max("best_p").alias("best"),
        F.max("max_g_p").alias("max_g_bm25"),
    )
    out = merged.select(
        "term",
        "df",
        "max_tf",
        F.col("best.tf").alias("bm25_tf"),
        F.col("best.dl").alias("bm25_dl"),
        "max_g_bm25",
    )
    out = (
        out.withColumn(
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
    return out


_PACK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("block_id", T.LongType()),
        T.StructField("num_postings", T.LongType()),
        T.StructField("max_docid", T.LongType()),
        T.StructField("docids_vb", T.BinaryType()),
        T.StructField("tfs_unary", T.BinaryType()),
    ]
)


def _pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas packer for one (term, block_id) group: gap+VB docids
    (SURVEY.md §2.7 C1 — documented deviation: reference VB-encodes raw
    docids, Merger.java:341-358; we encode gaps) and unary tfs."""
    pdf = pdf.sort_values("docid")
    docids = pdf["docid"].to_numpy()
    tfs = pdf["tf"].to_numpy()
    return pd.DataFrame(
        {
            "term": [pdf["term"].iloc[0]],
            "block_id": [int(pdf["block_id"].iloc[0])],
            "num_postings": [len(docids)],
            "max_docid": [int(docids.max())],
            "docids_vb": [vb_encode(gaps_encode(docids))],
            "tfs_unary": [unary_encode(tfs)],
        }
    )


# mapInPandas output of the in-partition packer: packed rows carry the
# codec columns (r_* null); residual rows carry one raw posting each
# (codec columns null) for the tiny straddler shuffle
_PACK_WIDE_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("block_id", T.LongType()),
        T.StructField("num_postings", T.LongType()),
        T.StructField("max_docid", T.LongType()),
        T.StructField("docids_vb", T.BinaryType()),
        T.StructField("tfs_unary", T.BinaryType()),
        T.StructField("r_docid", T.LongType()),
        T.StructField("r_tf", T.IntegerType()),
    ]
)


def _pack_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Shuffle-free packer: the postings stage is written
    (term, docid)-range-partitioned and sorted, so every (term,
    block_id) group occupies one contiguous run inside one file — a
    group whose run lies strictly INSIDE this partition's chunk of a
    file is complete here and packs locally; only the first and last
    group of each file-chunk can straddle a partition/file boundary
    and are emitted as raw residual rows for the (tiny) straddler
    shuffle. The old formulation shuffled the ENTIRE posting set just
    to co-locate groups that were already 99%+ co-located.

    Byte identity with the per-group packer is guaranteed by sharing
    its exact sort + codec calls per group."""
    import numpy as np

    parts = list(batches)
    if not parts:
        return
    pdf = pd.concat(parts, ignore_index=True) if len(parts) > 1 else parts[0]
    if pdf.empty:
        return
    files = pdf["__file"].to_numpy()
    seg_starts = np.flatnonzero(np.r_[True, files[1:] != files[:-1]])
    seg_ends = np.r_[seg_starts[1:] - 1, len(files) - 1]
    resid_keys = set()
    terms = pdf["term"].to_numpy()
    bids = pdf["block_id"].to_numpy()
    for s, e in zip(seg_starts, seg_ends):
        resid_keys.add((terms[s], int(bids[s])))
        resid_keys.add((terms[e], int(bids[e])))
    packed = {
        "term": [], "block_id": [], "num_postings": [], "max_docid": [],
        "docids_vb": [], "tfs_unary": [],
    }
    resid_frames = []
    for (term, bid), g in pdf.groupby(["term", "block_id"], sort=False):
        if (term, int(bid)) in resid_keys:
            resid_frames.append(g)
            continue
        g = g.sort_values("docid")  # identical to _pack_group
        docids = g["docid"].to_numpy()
        tfs = g["tf"].to_numpy()
        packed["term"].append(term)
        packed["block_id"].append(int(bid))
        packed["num_postings"].append(len(docids))
        packed["max_docid"].append(int(docids.max()))
        packed["docids_vb"].append(vb_encode(gaps_encode(docids)))
        packed["tfs_unary"].append(unary_encode(tfs))
    if packed["term"]:
        n = len(packed["term"])
        yield pd.DataFrame(
            {**packed, "r_docid": [None] * n, "r_tf": [None] * n}
        )
    if resid_frames:
        r = pd.concat(resid_frames, ignore_index=True)
        yield pd.DataFrame(
            {
                "term": r["term"],
                "block_id": r["block_id"].astype("int64"),
                "num_postings": pd.array([None] * len(r), dtype="Int64"),
                "max_docid": pd.array([None] * len(r), dtype="Int64"),
                "docids_vb": [None] * len(r),
                "tfs_unary": [None] * len(r),
                "r_docid": r["docid"].astype("int64"),
                "r_tf": r["tf"].astype("int32"),
            }
        )


def pack_postings(postings: DataFrame) -> DataFrame:
    """(term, docid, tf, block_id) -> packed blocks, shuffle-free for
    interior groups + a straddler-only shuffle (see _pack_partition).
    The input must be the postings stage's on-disk layout (file rows
    sorted by (term, docid)); any source where ``input_file_name`` is
    empty degrades gracefully to one segment per partition."""
    wide = postings.select(
        "term",
        "block_id",
        "docid",
        "tf",
        F.xxhash64(F.input_file_name()).alias("__file"),
    ).mapInPandas(_pack_partition, schema=_PACK_WIDE_SCHEMA)
    wide = wide.persist(StorageLevel.MEMORY_AND_DISK)
    resid = wide.filter(F.col("docids_vb").isNull()).select(
        "term",
        "block_id",
        F.col("r_docid").alias("docid"),
        F.col("r_tf").alias("tf"),
    )
    resid_packed = resid.groupBy("term", "block_id").applyInPandas(
        _pack_group, schema=_PACK_SCHEMA
    )
    done = wide.filter(F.col("docids_vb").isNotNull()).select(
        "term", "block_id", "num_postings", "max_docid",
        "docids_vb", "tfs_unary",
    )
    _PERSIST_HANDLES.append(wide)
    return done.unionByName(resid_packed)


_UNPACK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("block_id", T.LongType()),
        T.StructField("docid", T.LongType()),
        T.StructField("tf", T.IntegerType()),
    ]
)


_POSPACK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("docid", T.LongType()),
        T.StructField("doc_len", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("n_positions", T.IntegerType()),
        T.StructField("positions_vb", T.BinaryType()),
    ]
)


def pack_positions(pos: DataFrame) -> DataFrame:
    """Gap-VB pack of positional postings (the positions twin of the
    C1 codec): per (term, docid) row, the ascending 0-based position
    array becomes VB bytes of gaps over (position + 1) — the +1 keeps
    every stored value >= 1, dodging the reference's 0x00 quirk byte
    (an unterminated VB zero folds into the next value on decode).
    One vb_encode pass per Arrow batch (vb_encode_rows), never a
    per-row encoder call. At 100 TB the positional index is the
    largest artifact, so it compresses like the postings do."""
    from ..functions.codecs import gaps_encode, vb_encode_rows

    import numpy as np

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            plists = [
                np.asarray(p, dtype=np.int64) for p in pdf["positions"]
            ]
            blobs = vb_encode_rows([gaps_encode(p + 1) for p in plists])
            yield pd.DataFrame(
                {
                    "term": pdf["term"],
                    "docid": pdf["docid"],
                    "doc_len": pdf["doc_len"],
                    "tf": pdf["tf"],
                    "n_positions": [len(p) for p in plists],
                    "positions_vb": blobs,
                }
            )

    return pos.select(
        "term", "docid", "doc_len", "tf", "positions"
    ).mapInPandas(pack, schema=_POSPACK_SCHEMA)


def unpack_positions(packed: DataFrame) -> DataFrame:
    """Inverse of pack_positions: VB bytes -> gaps -> cumsum -> minus 1
    restores the 0-based position arrays; output schema matches the
    plain positions stage exactly so phrase/proximity/snippet serving
    is layout-agnostic."""
    import numpy as np

    from ..functions.codecs import gaps_decode, vb_decode

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "term": pdf["term"],
                    "docid": pdf["docid"],
                    "doc_len": pdf["doc_len"],
                    "tf": pdf["tf"],
                    "positions": [
                        (gaps_decode(vb_decode(bytes(vb), int(n))) - 1)
                        .astype(np.int32)
                        .tolist()
                        for vb, n in zip(
                            pdf["positions_vb"].to_numpy(),
                            pdf["n_positions"].to_numpy(np.int64),
                        )
                    ],
                }
            )

    return packed.mapInPandas(
        unpack,
        schema=(
            "term string, docid long, doc_len long, tf int, "
            "positions array<int>"
        ),
    )


def unpack_postings(packed: DataFrame) -> DataFrame:
    """Inverse of the packed-postings writer: decode gap-VB docids and
    unary tfs back to (term, block_id, docid, tf) rows. Arrow-batched
    mapInPandas — each packed block row is independent (this is the
    query-side block reader, BlockDescriptor.getBlockPostings
    semantics, common/.../BlockDescriptor.java:136-201)."""
    import numpy as np

    from ..functions.codecs import gaps_decode, unary_decode, vb_decode

    def unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # column-wise numpy iteration (one zip per block row, never
            # pandas iterrows); per-block arrays concatenate once
            ns = pdf["num_postings"].to_numpy(np.int64)
            docid_parts = [
                gaps_decode(vb_decode(bytes(vb), int(n)))
                for vb, n in zip(pdf["docids_vb"].to_numpy(), ns)
            ]
            tf_parts = [
                unary_decode(bytes(u), int(n))
                for u, n in zip(pdf["tfs_unary"].to_numpy(), ns)
            ]
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(), ns),
                    "block_id": np.repeat(
                        pdf["block_id"].to_numpy(np.int64), ns
                    ),
                    "docid": (
                        np.concatenate(docid_parts)
                        if docid_parts
                        else np.empty(0, np.int64)
                    ).astype(np.int64),
                    "tf": (
                        np.concatenate(tf_parts)
                        if tf_parts
                        else np.empty(0, np.int32)
                    ).astype(np.int32),
                }
            )

    return packed.select(
        "term", "block_id", "num_postings", "docids_vb", "tfs_unary"
    ).mapInPandas(unpack, _UNPACK_SCHEMA)


def _blocks_with_bmax(postings_with_idf: DataFrame, avgdl: float) -> DataFrame:
    """Block metadata extended with per-block max scores
    (term, block_id, max_docid, num_postings, bmax_bm25, bmax_tfidf).

    Per-posting scores are computed by the IDENTICAL numpy expressions
    as the serving scorer (maxscore._score_arrays) on the identical
    float64 inputs (idf from the lexicon, avgdl from the manifest), so
    the stored per-block max is bit-equal to the max the driver would
    compute over that block — the bound can never be an ulp below a
    real score, which preserves MaxScore's rank-identity guarantee.
    Input: postings joined with lexicon idf (vocabulary-sized side —
    AQE broadcasts it)."""
    import numpy as np

    sch = T.StructType(
        [
            T.StructField("term", T.StringType()),
            T.StructField("block_id", T.LongType()),
            T.StructField("docid", T.LongType()),
            T.StructField("s_bm25", T.DoubleType()),
            T.StructField("s_tfidf", T.DoubleType()),
        ]
    )
    k1, b = float(K1), float(B)

    def score_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tfs = pdf["tf"].to_numpy()
            dls = pdf["doc_len"].to_numpy()
            idfs = pdf["idf"].to_numpy(np.float64)
            # same op order as _score_arrays: idf * ltf / denom
            ltf = 1.0 + np.log10(tfs.astype(np.float64))
            denom = ltf + k1 * ((1.0 - b) + b * dls.astype(np.float64) / avgdl)
            yield pd.DataFrame(
                {
                    "term": pdf["term"],
                    "block_id": pdf["block_id"],
                    "docid": pdf["docid"],
                    "s_bm25": idfs * ltf / denom,
                    "s_tfidf": idfs * ltf,
                }
            )

    scored = postings_with_idf.select(
        "term", "block_id", "docid", "tf", "doc_len", "idf"
    ).mapInPandas(score_batch, sch)
    return scored.groupBy("term", "block_id").agg(
        F.max("docid").alias("max_docid"),
        F.count("*").alias("num_postings"),
        F.max("s_bm25").alias("bmax_bm25"),
        F.max("s_tfidf").alias("bmax_tfidf"),
    )


def build_index(
    docs: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
) -> InvertedIndex:
    """Build the full index from a (pid string, content string) DataFrame.

    Stages are individually checkpointed: each writes parquet + _SUCCESS
    and is skipped on resume if already complete (the reference's
    closest analog is the Spimi/Merger file handoff + rollback,
    Spimi.java:87-93). ``manifest.json`` records flags, collection
    stats, and per-stage row counts / durations / partition lineage.
    """
    cfg = config or IndexConfig()
    spark = docs.sparkSession
    root = Path(index_dir)
    if cfg.overwrite and root.exists():
        shutil.rmtree(root)
    root.mkdir(parents=True, exist_ok=True)
    manifest_path = root / "manifest.json"
    # all three reference flags persist with the index (Flags.java:11-55:
    # compression, stemStopRemoval, maxScore) so query-time behavior
    # always matches index-time
    flags = {
        "stem_stop": cfg.stem_stop,
        "compression": cfg.compression,
        "max_score": cfg.max_score,
    }
    manifest: dict = (
        json.loads(manifest_path.read_text())
        if manifest_path.exists()
        else {"flags": dict(flags), "stages": {}, "stats": {}}
    )
    # pre-max_score manifests (2 keys) default the flag like query time does
    manifest["flags"].setdefault("max_score", True)
    # `positions`/`positions_packed`/`fields` are stage presence, not
    # query-semantics flags: stages 6-7 (and optimize_index) record them
    # in the manifest as they complete, so a resume — or an idempotent
    # re-run — of a positional/fielded build must not read them as a
    # semantic mismatch (stem_stop/compression/max_score must match).
    loaded_semantic = {
        k: v
        for k, v in manifest["flags"].items()
        if k not in ("positions", "positions_packed", "fields")
    }
    if loaded_semantic != flags:
        raise ValueError(
            "index flags mismatch on resume — query-time behavior must match "
            f"index-time (Flags.java:11-55): {loaded_semantic}"
        )
    n_part = cfg.num_partitions  # None -> AQE-sized shuffles

    def record(stage: str, t0: float, **extra) -> None:
        manifest["stages"][stage] = {"sec": round(time.time() - t0, 3), **extra}
        manifest_path.write_text(json.dumps(manifest, indent=2))

    # ---- stage 1: analysis + docids + doc_stats --------------------------
    doc_stats_dir = root / "doc_stats"
    if not _stage_done(doc_stats_dir):
        t0 = time.time()

        def analyze(part: DataFrame) -> DataFrame:
            # doc_len counts blank tokens (Spimi.java:264); docs with an
            # empty token LIST are skipped before docid assignment
            # (Spimi.java:260). Runs post-shuffle so the range sampler
            # never executes the analysis chain.
            return part.select(
                "pid",
                F.sha2(F.col("content"), 256).alias("content_sha256"),
                tokens_col(F.col("content"), cfg.stem_stop).alias("tokens"),
            ).filter(F.size("tokens") > 0)

        # ONE full pass: range shuffle + analysis + parquet write. No
        # persist of the token arrays (columnar cache build of
        # array<string> cost ~3x the analysis itself) and no separate
        # count job: the write records (part_id, local_ix) instead of
        # docid, the per-partition counts come from a single RLE'd int
        # column scan of the output, and docid = offset[part_id] +
        # local_ix is attached on every read (_doc_tokens_with_ids) —
        # deterministic because the in-partition sort fixes row order.
        # explicit partition count: AQE's advisory-size coalescing would
        # otherwise collapse a small-to-mid corpus (anything under
        # ~64 MB shuffled) to ONE partition and run the whole
        # analysis+write single-threaded (measured: 18.6 s vs 1.6 s on
        # 32 cores at 100k docs). At real scale deployments size
        # spark.sql.shuffle.partitions; locally 2x defaultParallelism
        # keeps every core busy and empty partitions cost nothing.
        n_eff = _n_eff(spark, n_part)
        part = docs.repartitionByRange(n_eff, "pid")
        analyzed = analyze(part.sortWithinPartitions("pid"))
        pid_col = F.spark_partition_id()
        local_ix = F.monotonically_increasing_id() - F.shiftleft(
            pid_col.cast("long"), 33
        )
        analyzed.select(
            "pid", F.size("tokens").alias("doc_len"), "content_sha256",
            "tokens", pid_col.alias("part_id"), local_ix.alias("local_ix"),
        ).write.mode("overwrite").parquet(str(root / "doc_tokens"))
        (root / "doc_offsets.json").unlink(missing_ok=True)
        dt = _doc_tokens_with_ids(spark, root)  # computes + stores offsets
        dt.select("docid", "pid", "doc_len", "content_sha256").write.mode(
            "overwrite"
        ).parquet(str(doc_stats_dir))
        record("doc_stats", t0, partitions=n_part)

    # ---- stages 2..6 tune spark.sql.files.maxPartitionBytes per stage
    # read (_read_stage); restore the session's value on EVERY exit path
    # (a stage failure must not leave later scans at a 4 MB split size)
    min_splits = 2 * spark.sparkContext.defaultParallelism
    _mpb_before = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        # ---- stage 2: SPIMI posting blocks (checkpoint granularity) ------
        stage_dir = root / "stage_postings"
        if not _stage_done(stage_dir):
            t0 = time.time()
            from .frames import exploded_term_tf

            dt = _doc_tokens_with_ids(spark, root, min_splits)
            # narrow per-row run-length tf (exploded_term_tf): a
            # (term, docid) pair never spans rows, so no shuffle —
            # the SPIMI stage is scan -> JVM sort/count -> write
            postings = exploded_term_tf(dt, ["docid", "doc_len"]).select(
                "term",
                "docid",
                "doc_len",
                F.col("tf").cast("long").alias("tf"),
            )
            postings.write.mode("overwrite").parquet(str(stage_dir))
            record("stage_postings", t0)

        # ---- stage 3: merge shuffle -> final sorted postings + block ids -----
        postings_dir = root / "postings"
        if not _stage_done(postings_dir):
            t0 = time.time()
            staged = _read_stage(spark, stage_dir, min_splits)
            # per-term df drives the sqrt block law (VocabularyEntry.java:348-361)
            df_per_term = staged.groupBy("term").agg(F.count("*").alias("df"))
            blk = _block_meta(df_per_term)
            # join the per-term block width BEFORE the rank pass (no
            # broadcast hint: the term table is vocabulary-sized; AQE picks
            # broadcast when it fits, shuffle join with skew splitting when
            # it doesn't), so ONE range shuffle serves both the rank stamp
            # and the final (term, docid)-sorted layout — the rank pass's
            # output is already range-partitioned and sorted within
            # partitions (mapInPandas preserves order), making a second
            # repartitionByRange + sort of the full posting data redundant.
            joined = staged.join(blk.select("term", "max_per_block"), "term")
            ranked = _rank_within_groups(
                joined, "term", "docid", "posting_rank", num_partitions=n_part
            )
            merged = ranked.withColumn(
                "block_id",
                (F.col("posting_rank") / F.col("max_per_block")).cast("long"),
            ).select("term", "docid", "tf", "doc_len", "block_id")
            merged.write.mode("overwrite").parquet(str(postings_dir))
            blk.write.mode("overwrite").parquet(str(root / "term_df"))
            record("postings", t0)

        # ---- stage 4: lexicon + block metadata (incl. block-max scores) --
        lexicon_dir = root / "lexicon"
        if not _stage_done(lexicon_dir):
            t0 = time.time()
            doc_stats = spark.read.parquet(str(doc_stats_dir))
            n_docs, total_doc_len = (
                doc_stats.agg(F.count("*"), F.sum("doc_len")).collect()[0]
            )
            avgdl = total_doc_len / n_docs
            postings = _read_stage(spark, postings_dir, min_splits)
            lex = compute_lexicon(postings, int(n_docs), avgdl)
            blk_meta = spark.read.parquet(str(root / "term_df")).select(
                "term", "num_blocks", "max_per_block"
            )
            lex = lex.join(blk_meta, "term")
            lex.write.mode("overwrite").parquet(str(lexicon_dir))

            # blocks carry per-block MAX SCORES for both scoring functions
            # (Ding & Suel, SIGIR 2011: block-max structures live in the
            # index, not recomputed per query). Scores come from the same
            # numpy kernel the serving scorer uses (maxscore._score_arrays)
            # so a stored bound is bit-identical to — hence a true upper
            # bound of — every score the driver computes at query time.
            lexw = spark.read.parquet(str(lexicon_dir)).select("term", "idf")
            blocks = _blocks_with_bmax(
                postings.join(lexw, "term"), float(avgdl)
            )
            blocks.write.mode("overwrite").parquet(str(root / "blocks"))
            n_terms = spark.read.parquet(str(lexicon_dir)).count()
            manifest["stats"] = {
                "n_docs": int(n_docs),
                "total_doc_len": int(total_doc_len),
                "avg_doc_len": avgdl,
                "n_terms": int(n_terms),
            }
            record("lexicon", t0, terms=int(n_terms))

        # ---- stage 5: packed postings (compression flag) ----------------------
        packed_dir = root / "postings_packed"
        if cfg.compression and not _stage_done(packed_dir):
            t0 = time.time()
            postings = _read_stage(spark, postings_dir, min_splits)
            # shuffle-free interior packing + straddler-only residual
            # shuffle (pack_postings): the stage layout already
            # co-locates 99%+ of every (term, block_id) group
            pack_postings(postings).write.mode("overwrite").parquet(
                str(packed_dir)
            )
            record("postings_packed", t0)


        # ---- stage 6: positional postings (positions flag) ---------------
        # (term, docid)-range layout like postings/, so a phrase query's
        # per-term reads are contiguous scans with term pushdown. Phrase
        # search then serves from disk with NO corpus re-analysis.
        pos_dir = (
            root / "positions_packed" if cfg.compression else root / "positions"
        )
        if cfg.positions and not _stage_done(pos_dir):
            t0 = time.time()
            from .frames import exploded_term_positions

            dt = _doc_tokens_with_ids(spark, root, min_splits)
            # narrow per-row positional runs (exploded_term_positions):
            # the only shuffle in this stage is the final (term, docid)
            # range layout — the old posexplode + groupBy added a
            # second, redundant full shuffle before it
            pos = exploded_term_positions(dt, ["docid", "doc_len"]).select(
                "term", "docid", "doc_len", "tf", "positions"
            )
            pos = (
                pos.repartitionByRange(
                    _n_eff(spark, cfg.num_partitions), "term", "docid"
                )
                .sortWithinPartitions("term", "docid")
            )
            if cfg.compression:
                # gap-VB pack the position arrays (narrow, keeps the
                # range layout): at 100 TB the positional index is the
                # largest artifact — it compresses like the postings do
                pos = pack_positions(pos)
            pos.write.mode("overwrite").parquet(str(pos_dir))
            record(pos_dir.name, t0)
        if cfg.positions:
            manifest["flags"]["positions"] = True
            manifest["flags"]["positions_packed"] = bool(cfg.compression)

        # ---- stage 7: BM25F field postings (fields flag) ------------------
        # filename-field (term, docid) pairs in the same (term, docid)
        # range layout as postings/, so fielded search reads its boost
        # rows with term pushdown; a narrow projection of doc_stats —
        # no corpus re-analysis
        fp_dir = root / "field_postings"
        if cfg.fields and not _stage_done(fp_dir):
            t0 = time.time()
            ds = spark.read.parquet(str(doc_stats_dir))
            (
                field_postings_frame(ds)
                .repartitionByRange(
                    _n_eff(spark, cfg.num_partitions), "term", "docid"
                )
                .sortWithinPartitions("term", "docid")
                .write.mode("overwrite")
                .parquet(str(fp_dir))
            )
            # per-field avg length for the full BM25F normalizer
            # (query.bm25f_top_k) — stored like avg_doc_len so serving
            # never recomputes it
            manifest["stats"]["avg_field_len"] = avg_field_len_of(ds)
            record("field_postings", t0)
        if cfg.fields:
            manifest["flags"]["fields"] = True

        manifest_path.write_text(json.dumps(manifest, indent=2))
    finally:
        if _mpb_before is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", _mpb_before)
        else:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        # every stage is materialized to parquet; cached intermediates can go
        _release_persisted()
    return InvertedIndex(spark, str(root), manifest)


def _block_meta(df_per_term: DataFrame) -> DataFrame:
    """(term, df, num_blocks, max_per_block) from a (term, df) frame —
    THE √df skip-block law (VocabularyEntry.java:348-361: df >= 1024
    splits into ceil(√df) blocks of ceil(df/num_blocks), else one
    block). Single-sourced because block alignment is parity-critical:
    build stage 3, optimize_index's postings rewrite, and its lexicon
    resume path must stay bit-identical, or an optimized streamed
    index and a batch build disagree on block boundaries — and with
    them on stored block-max bounds, which MaxScore trusts to prune."""
    return df_per_term.select(
        "term",
        "df",
        F.when(F.col("df") >= BLOCK_DF_THRESHOLD, F.ceil(F.sqrt(F.col("df"))))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("num_blocks"),
    ).withColumn(
        "max_per_block",
        F.ceil(F.col("df") / F.col("num_blocks")).cast("long"),
    )


def _swap_dir(tmp: Path, dst: Path) -> None:
    """CRASH-safe replace of ``dst`` with ``tmp`` (rename old aside,
    rename tmp in, delete old): a kill at any point leaves either the
    old or the new dir fully intact on disk, never a half-written one
    (``_recover_swap`` heals the in-between states on the next run).

    NOT reader-transparent: Spark parquet readers re-list files per
    action rather than holding POSIX handles, so a query planned in
    the rename window — or against a manifest loaded pre-swap — can
    fail and must be retried. ``optimize_index`` therefore requires a
    maintenance window (see its docstring); the production posture for
    zero-downtime is to optimize a snapshot/copy and flip a catalog
    pointer (Iceberg snapshot commit), which this per-artifact-dir
    layout maps onto directly."""
    old = dst.with_name(dst.name + "__old")
    if old.exists():
        shutil.rmtree(old)
    if dst.exists():
        dst.rename(old)
    tmp.rename(dst)
    shutil.rmtree(old, ignore_errors=True)


def _recover_swap(dst: Path) -> None:
    """Heal a crash INSIDE ``_swap_dir``: a process killed between
    ``dst.rename(old)`` and ``tmp.rename(dst)`` leaves ``dst`` missing
    and ``dst__old`` holding the intact pre-swap data. Rename it back
    so the (idempotent) stage re-runs from the old artifact; a kill
    AFTER ``tmp.rename(dst)`` but before the old dir's rmtree instead
    leaves both — then ``dst`` is authoritative and the stale ``__old``
    copy (postings-sized, the largest artifact) must be deleted here,
    or the stage's column check skips forever and the copy leaks
    permanently. The leftover ``__opt`` tmp dir is simply overwritten
    by a re-run."""
    old = dst.with_name(dst.name + "__old")
    if not dst.exists() and old.exists():
        old.rename(dst)
    elif old.exists():
        shutil.rmtree(old, ignore_errors=True)
    # a leftover tmp dir from an interrupted run is garbage whether the
    # stage re-runs (mode=overwrite replaces it) or skips (it would
    # otherwise linger forever) — clear it while nothing is mid-write
    shutil.rmtree(dst.with_name(dst.name + "__opt"), ignore_errors=True)


def optimize_index(
    spark: SparkSession,
    index_dir: str,
    num_partitions: int | None = None,
) -> InvertedIndex:
    """Segment-then-optimize completion: derive the batch build's
    OPTIMIZATION artifacts for a servable index that lacks them — the
    Lucene-style background *optimize* a long-lived streamed index
    needs so it never requires a full batch rebuild for block-max
    pruning or compression (the round-4 documented gap, closed):

      * ``block_id`` on postings/ via the √df skip-block law
        (VocabularyEntry.java:348-361) + ``num_blocks``/``max_per_block``
        on lexicon/ — both rewritten in place via tmp-dir swap,
      * ``blocks/`` with stored per-block max scores (Ding & Suel,
        SIGIR 2011 — same numpy kernel as the serving scorer, so the
        bound is bit-identical to every query-time score),
      * ``postings_packed/`` (gap-VB docids + unary tfs, C1/C3) via the
        shuffle-free interior packer,
      * ``positions_packed/`` (gap-VB position arrays) replacing the
        plain positions/ when the index has a positional stage.

    Input: any servable dir in the batch layout — in practice the
    streaming handoffs ``compact_to_dir`` / ``compact_incremental_to_dir``
    (streaming/incremental.py), whose postings/positions land already
    (term, docid)-range-sorted, which is exactly the layout the packer's
    interior fast path wants. Idempotent per artifact (resume checks
    ``_SUCCESS`` / existing columns); after it, ``maxscore_topk(...,
    block_max=True)`` and packed phrase serving behave exactly as on a
    ``build_index(compression=True)`` index (parity pinned in
    tests/test_round5.py).

    Concurrency contract: CRASH-safe, not reader-transparent. The
    in-place rewrites swap dirs by rename and retire positions/ after
    the manifest flip — a kill at any point leaves a servable index
    that resume heals, but a SESSION SERVING QUERIES from this same
    dir during the optimize can catch a rename window or a
    flag-mismatched manifest and fail a query (Spark readers re-list
    files per action; they hold no handles). Run it in a maintenance
    window, or optimize a snapshot/copy and flip a catalog pointer
    (Iceberg snapshot commit) for zero-downtime — the per-artifact-dir
    layout is exactly that pattern's unit of swap."""
    root = Path(index_dir)
    manifest_path = root / "manifest.json"
    manifest = json.loads(manifest_path.read_text())
    flags = manifest["flags"]
    stats = manifest["stats"]
    avgdl = stats["total_doc_len"] / stats["n_docs"]
    min_splits = 2 * spark.sparkContext.defaultParallelism
    _mpb_before = spark.conf.get("spark.sql.files.maxPartitionBytes", None)

    def record(stage: str, t0: float) -> None:
        manifest.setdefault("stages", {})[stage] = {
            "sec": round(time.time() - t0, 3)
        }
        manifest_path.write_text(json.dumps(manifest, indent=2))

    try:
        postings_dir = root / "postings"
        lexicon_dir = root / "lexicon"
        blk_side_dir = root / "term_blk__opt"
        _recover_swap(postings_dir)
        _recover_swap(lexicon_dir)
        if "block_id" not in spark.read.parquet(str(postings_dir)).columns:
            t0 = time.time()
            staged = _read_stage(spark, postings_dir, min_splits)
            # √df block law + single range shuffle serving both the rank
            # stamp and the final layout — same plan as build stage 3
            df_per_term = (
                staged.groupBy("term").agg(F.count("*").alias("df")).persist()
            )
            _PERSIST_HANDLES.append(df_per_term)
            blk = _block_meta(df_per_term)
            joined = staged.join(blk.select("term", "max_per_block"), "term")
            ranked = _rank_within_groups(
                joined, "term", "docid", "posting_rank",
                num_partitions=num_partitions,
            )
            merged = ranked.withColumn(
                "block_id",
                (F.col("posting_rank") / F.col("max_per_block")).cast("long"),
            ).select("term", "docid", "tf", "doc_len", "block_id")
            tmp = root / "postings__opt"
            merged.write.mode("overwrite").parquet(str(tmp))
            # Stash the per-term block meta (|vocab| rows) BEFORE the
            # swap, while the pre-swap postings files still exist: the
            # lexicon stage joins this side parquet instead of paying a
            # second full postings scan + aggregate, and unlike a lazy
            # frame it stays valid after the swap deletes the old files.
            # df_per_term is already cached hot from the merged write.
            blk.write.mode("overwrite").parquet(str(blk_side_dir))
            _release_persisted()  # ranked's range layout is on disk now
            _swap_dir(tmp, postings_dir)
            record("optimize_postings_blocks", t0)

        if "num_blocks" not in spark.read.parquet(str(lexicon_dir)).columns:
            t0 = time.time()
            if blk_side_dir.exists():
                # the postings stage stashed the per-term block meta to
                # a side parquet pre-swap — join the |vocab|-row file
                # instead of re-scanning + re-aggregating all postings
                blk_meta = spark.read.parquet(str(blk_side_dir)).select(
                    "term", "num_blocks", "max_per_block"
                )
            else:
                # resume path (postings stage done in an earlier run):
                # recompute from the swapped postings dir — df per term
                # is unchanged by the rewrite
                blk_meta = _block_meta(
                    spark.read.parquet(str(postings_dir))
                    .groupBy("term")
                    .agg(F.count("*").alias("df"))
                ).select("term", "num_blocks", "max_per_block")
            lex = spark.read.parquet(str(lexicon_dir)).join(blk_meta, "term")
            tmp = root / "lexicon__opt"
            lex.write.mode("overwrite").parquet(str(tmp))
            _swap_dir(tmp, lexicon_dir)
            record("optimize_lexicon", t0)
        shutil.rmtree(blk_side_dir, ignore_errors=True)

        blocks_dir = root / "blocks"
        if not _stage_done(blocks_dir):
            t0 = time.time()
            postings = _read_stage(spark, postings_dir, min_splits)
            lexw = spark.read.parquet(str(root / "lexicon")).select(
                "term", "idf"
            )
            _blocks_with_bmax(postings.join(lexw, "term"), float(avgdl)).write.mode(
                "overwrite"
            ).parquet(str(blocks_dir))
            record("optimize_blocks_bmax", t0)

        packed_dir = root / "postings_packed"
        if not _stage_done(packed_dir):
            t0 = time.time()
            postings = _read_stage(spark, postings_dir, min_splits)
            pack_postings(postings).write.mode("overwrite").parquet(
                str(packed_dir)
            )
            record("optimize_postings_packed", t0)

        if flags.get("positions", False) and not flags.get(
            "positions_packed", False
        ):
            pos_dir = root / "positions"
            pos_packed_dir = root / "positions_packed"
            if not _stage_done(pos_packed_dir):
                t0 = time.time()
                pos = _read_stage(spark, pos_dir, min_splits)
                pack_positions(pos).write.mode("overwrite").parquet(
                    str(pos_packed_dir)
                )
                record("optimize_positions_packed", t0)
            # Flip + persist the flag BEFORE deleting the plain stage:
            # serving dispatches on positions_packed, so positions/ must
            # outlive any manifest that still points at it (a concurrent
            # load, or a crash here, must see either flag=False with
            # positions/ intact or flag=True with positions_packed/
            # complete — never flag=False with positions/ gone).
            flags["positions_packed"] = True
            manifest_path.write_text(json.dumps(manifest, indent=2))
        if flags.get("positions_packed", False):
            # the packed stage fully supersedes the plain one (the batch
            # compression build writes only positions_packed/); also
            # clears the stale dir a crash between the manifest write
            # and this rmtree would have left behind on a prior run
            shutil.rmtree(root / "positions", ignore_errors=True)

        flags["compression"] = True
        manifest_path.write_text(json.dumps(manifest, indent=2))
    finally:
        if _mpb_before is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes", _mpb_before)
        else:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        _release_persisted()
    return InvertedIndex(spark, str(root), manifest)
