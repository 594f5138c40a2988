"""BPE tokenizer induction over the corpus.

The missing third piece of the tokenizer story (token COUNTING lives
in textstats, sequence PACKING in curation): learning the merge table
itself — byte-pair encoding as introduced for NMT subwords by
Sennrich, Haddow & Birch, "Neural Machine Translation of Rare Words
with Subword Units" (ACL 2016). Words initialize to character
sequences; each round merges the most frequent adjacent symbol pair.

Spark-first shape:

* ``bpe_pair_counts``  — ONE aggregation: adjacent-pair occurrences
  across the corpus, partial/final hash agg on a tiny key space (pairs
  of current symbols), the map-side-combinable count a 100 TB corpus
  needs. This is the per-round workhorse.
* ``bpe_learn``        — the standard trainer loop: count -> argmax
  (ONE driver row per round: the winning pair) -> apply the merge with
  a per-row JVM fold (greedy leftmost application, the reference
  rule). The corpus-sized data never leaves the executors; rounds are
  Spark jobs over a re-derived symbol column. Lineage is truncated
  every few rounds (localCheckpoint) so the plan does not deepen
  linearly in merges.
* ``bpe_segment``      — applies a learned merge list to new text as a
  chain of the same JVM folds (for big merge tables, chunk the chain
  or move to an Arrow UDF — documented, not needed at test scale).

Ties break lexicographically on (left, right) so the learned table is
deterministic across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .entry_ops import register
from .textstats import ws_tokens


def _adjacent_pairs(sym_col: Column) -> Column:
    """array<struct<pair_left,pair_right>> of adjacent symbol pairs."""
    n = F.size(sym_col)
    return F.zip_with(
        F.slice(sym_col, 1, n - 1),
        F.slice(sym_col, 2, n - 1),
        lambda a, b: F.struct(
            a.alias("pair_left"), b.alias("pair_right")
        ),
    )


def _pair_counts_of(words: DataFrame, sym: str) -> DataFrame:
    d = words.filter(F.size(F.col(sym)) >= 2)
    return (
        d.select(F.explode(_adjacent_pairs(F.col(sym))).alias("p"))
        .select("p.pair_left", "p.pair_right")
        .groupBy("pair_left", "pair_right")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def _words(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(F.explode(ws_tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .withColumn("syms", F.split(F.col("w"), ""))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(pair_left, pair_right, cnt): corpus-wide adjacent CHARACTER
    pair counts over whitespace words — round 0 of the BPE trainer."""
    return _pair_counts_of(_words(df, text_col), "syms")


def _apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Greedy leftmost merge of (left, right) -> left+right inside a
    symbol array: fold that appends each symbol unless it completes
    the pair with the accumulator's tail (the non-overlapping
    left-to-right rule of the reference BPE implementation)."""
    merged = left + right

    def step(acc: Column, s: Column) -> Column:
        tail = F.element_at(acc, -1)
        return F.when(
            (F.size(acc) > 0)
            & (tail == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(
        sym_col, F.array().cast("array<string>"), step
    )


def bpe_learn(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` BPE merges; returns them in order.
    Stops early when no adjacent pair occurs twice. Driver traffic:
    one (pair, count) row per round."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    words = _words(df, text_col).select("syms").localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            _pair_counts_of(words, "syms")
            .orderBy(
                F.col("cnt").desc(),
                F.col("pair_left").asc(),
                F.col("pair_right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["pair_left"], top[0]["pair_right"]
        merges.append((left, right))
        words = words.select(
            _apply_merge(F.col("syms"), left, right).alias("syms")
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def _contains_pair(sym_col: Column, left: str, right: str) -> Column:
    """True when the symbol array has (left, right) adjacent."""
    return F.array_contains(
        _adjacent_pairs(sym_col),
        F.struct(
            F.lit(left).alias("pair_left"), F.lit(right).alias("pair_right")
        ),
    )


def bpe_learn_incremental(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
    stats: list | None = None,
):
    """Merge-for-merge equal to :func:`bpe_learn`, but round r touches
    O(affected) rows instead of re-aggregating every pair: the pair-
    count table is KEYED STATE, updated by splitting the word set on
    adjacency of the winning pair (the affected/unaffected anti-join)
    and applying a -old/+new delta aggregation over ONLY the affected
    words. The pair table itself is vocabulary-sized (tiny), so the
    per-round cost is |affected| + |pairs| — the shape a 32k-merge
    production run needs, where late rounds affect a vanishing
    fraction of the corpus.

    ``stats`` (optional list) receives one dict per round:
    {"pair": (l, r), "cnt": n, "affected": m} — the O(affected)
    evidence pinned in tests."""
    if n_merges < 0:
        raise ValueError("n_merges must be >= 0")
    words = _words(df, text_col).select("syms").localCheckpoint(eager=True)
    # union sums partition counts and affected/merged inherit words',
    # so the unioned words frame would DOUBLE its partitions every
    # round (2^r tasks by round r) — pin the layout to the input's
    n_parts = max(words.rdd.getNumPartitions(), 1)
    pairs = _pair_counts_of(words, "syms").localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        top = (
            pairs.orderBy(
                F.col("cnt").desc(),
                F.col("pair_left").asc(),
                F.col("pair_right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        left, right = top[0]["pair_left"], top[0]["pair_right"]
        merges.append((left, right))
        hit = _contains_pair(F.col("syms"), left, right)
        # materialize ONLY the affected slice (this is the whole
        # per-round data volume); unaffected words stay where they are
        affected = words.filter(hit).localCheckpoint(eager=True)
        merged = affected.select(
            _apply_merge(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint(eager=True)
        if stats is not None:
            stats.append(
                {
                    "pair": (left, right),
                    "cnt": int(top[0]["cnt"]),
                    "affected": merged.count(),
                }
            )
        # one weighted delta agg: -1 per pre-merge pair occurrence in
        # the affected words, +1 per post-merge occurrence
        tagged = affected.select(
            "syms", F.lit(-1).alias("w")
        ).unionByName(merged.select("syms", F.lit(1).alias("w")))
        delta = (
            tagged.filter(F.size(F.col("syms")) >= 2)
            .select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "w"
            )
            .groupBy("p.pair_left", "p.pair_right")
            .agg(F.sum("w").cast("long").alias("cnt"))
        )
        pairs = (
            pairs.unionByName(delta)
            .groupBy("pair_left", "pair_right")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
            .filter(F.col("cnt") > 0)
        ).localCheckpoint(eager=True)
        # keep the words plan FLAT: filter+union re-planned over a
        # deepening chain costs more in Catalyst time than the tiny
        # checkpoint job (checkpoint_every bounds rounds between
        # materializations; the affected slice is already checkpointed)
        words = words.filter(~hit).unionByName(merged).coalesce(n_parts)
        if checkpoint_every <= 1 or (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    return merges


def _segment_word(syms: list[str], ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-based BPE application: repeatedly merge the LOWEST-rank
    adjacent pair present, all occurrences left-to-right (the standard
    tokenizer loop — Sennrich apply_bpe / GPT-2 bpe()). Produces the
    same result as applying the merge list sequentially because a
    merge can only create pairs involving its (later-ranked) output
    symbol, never an earlier-ranked pair."""
    while len(syms) >= 2:
        best = None
        best_rank = None
        for a, b in zip(syms, syms[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, (a, b)
        if best is None:
            break
        left, right = best
        merged = left + right
        out: list[str] = []
        for s in syms:
            if out and out[-1] == left and s == right:
                out[-1] = merged  # greedy leftmost, non-overlapping
            else:
                out.append(s)
        syms = out
    return syms


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """(word, pieces): each distinct whitespace word segmented by the
    learned merge list.

    Arrow-batched ``mapInPandas`` with a merge-rank dict: per-word cost
    depends on the word's own merge opportunities, NOT on the merge-
    table size — a realistic 32k-merge table would otherwise chain 32k
    interpreted ``F.aggregate`` folds in one expression, hitting both
    documented Catalyst traps at once (HOFs never codegen;
    multi-referenced expression blowup). ``bpe_segment_expr`` keeps the
    column-expression twin for equality tests at small merge counts."""
    import pandas as pd

    words = _words(df, text_col).select("w").distinct()
    ranks = {(lt, rt): i for i, (lt, rt) in enumerate(merges)}

    def seg(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "w": pdf["w"],
                    "pieces": [
                        _segment_word(list(w), ranks) for w in pdf["w"]
                    ],
                }
            )

    return words.mapInPandas(seg, schema="w string, pieces array<string>")


def bpe_segment_expr(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Column-expression twin of :func:`bpe_segment` (one JVM fold per
    merge, applied in learning order). Only viable at small merge
    counts — kept as the cross-implementation equality oracle."""
    words = _words(df, text_col).select("w", "syms").distinct()
    col = F.col("syms")
    for left, right in merges:
        col = _apply_merge(col, left, right)
    return words.select("w", col.alias("pieces"))


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracle
# ---------------------------------------------------------------------------


def _q_bpe_pairs(spark, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_pair_counts(docs)


register(
    "bpe_pair_stats",
    _q_bpe_pairs,
    """
WITH wrd AS (
  SELECT unnest(string_split(text, ' ')) AS w FROM documents
),
f AS (SELECT w FROM wrd WHERE w <> '' AND length(w) >= 2),
pr AS (
  SELECT substr(w, CAST(i.i AS INT), 1) AS pair_left,
         substr(w, CAST(i.i AS INT) + 1, 1) AS pair_right
  FROM f, LATERAL (SELECT unnest(range(1, length(w))) AS i) i
)
SELECT pair_left, pair_right, CAST(count(*) AS BIGINT) AS cnt
FROM pr GROUP BY 1, 2
""",
)
