"""Corpus-curation operators for training-data pipelines.

Four operator families a 100 TB pretraining pipeline runs after
dedup/quality filtering, each expressed as a shuffle-conscious
DataFrame plan with a bit-identical DuckDB oracle twin:

* hash split / sampling — deterministic train/val/test assignment and
  Bernoulli sampling by a content- or id-keyed sha256 prefix (the
  standard "hash the id, compare against a threshold" scheme: stable
  under reruns, resharding, and corpus growth). Map-only, no shuffle.
* sequence packing — assign every document a global token offset and
  the training-sequence ids it lands in, via a DISTRIBUTED prefix sum
  (per-partition partials + broadcast prefix offsets), never a global
  single-partition window.
* PII redaction — email / IPv4 / phone scrubbing with counts, as pure
  JVM ``regexp_replace`` / ``regexp_extract_all`` column expressions
  (patterns restricted to the RE2 ∩ java.util.regex dialect so the
  DuckDB oracle is exact).
* mixture weights — per-group (language/domain) corpus statistics and
  temperature-alpha sampling weights (w_g ∝ tokens_g^alpha, the
  multilingual/mixture sampling rule of Lample & Conneau, "Cross-
  lingual Language Model Pretraining", NeurIPS 2019 §3.1, used for
  corpus mixing in Gopher/Chinchilla-style data pipelines).

Scale notes (10^12 docs):
* `hash_split` / `hash_sample` touch each row once, push down to the
  scan, and never shuffle; the hex-prefix compare keeps the whole
  predicate inside whole-stage codegen.
* `pack_sequences` is the classic two-phase scan: one range shuffle to
  order by docid, a P-row partial-sum collect (P = partitions, never
  data rows), then an Arrow-batched per-partition cumsum with the
  broadcast prefix — O(rows) work, O(P) driver state. A naive
  `Window.orderBy(docid)` would serialize 100 TB through ONE task.
* `pii_redact` is map-only JVM regex; `mixture_weights` shuffles only
  the per-group aggregate (|groups| rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .entry_ops import register
from .textstats import ws_tokens

ROUND = 9

# ---------------------------------------------------------------------------
# Deterministic hash split / sampling
# ---------------------------------------------------------------------------

_HEX_SPACE = 16**8  # first 8 hex chars of sha256 ~ uniform u32


def _frac_to_hex(frac: float) -> str:
    """Cumulative fraction -> 8-char lowercase-hex threshold; hex
    strings of equal length compare lexicographically == numerically,
    so the predicate is a plain string compare in BOTH engines."""
    v = min(int(frac * _HEX_SPACE), _HEX_SPACE - 1)
    return format(v, "08x")


def _hash_u32_hex(col, seed: str):
    key = F.concat(F.lit(f"{seed}:"), col.cast("string")) if seed else col.cast("string")
    return F.substring(F.sha2(key, 256), 1, 8)


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Deterministic, rerun-stable split assignment: each row lands in
    the split whose cumulative-fraction interval contains its
    sha256(seed:id) 32-bit prefix. Adds a ``split`` column. The last
    split absorbs rounding remainder (intervals are half-open)."""
    if not fractions or abs(sum(fractions.values()) - 1.0) > 1e-9:
        raise ValueError("fractions must sum to 1")
    names = list(fractions)
    h = _hash_u32_hex(F.col(id_col), seed)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(_frac_to_hex(cum))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    return df.withColumn("split", expr)


def split_case_sql(fractions: dict[str, float], id_expr: str, seed: str = "") -> str:
    """The DuckDB twin of ``hash_split``'s CASE expression."""
    key = f"'{seed}:' || CAST({id_expr} AS VARCHAR)" if seed else f"CAST({id_expr} AS VARCHAR)"
    h = f"substr(sha256({key}), 1, 8)"
    names = list(fractions)
    cum = 0.0
    whens = []
    for name in names[:-1]:
        cum += fractions[name]
        whens.append(f"WHEN {h} < '{_frac_to_hex(cum)}' THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"


def hash_sample(
    df: DataFrame, frac: float, id_col: str = "doc_id", seed: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep rows whose hash prefix
    falls below the fraction threshold. Unlike ``DataFrame.sample``,
    membership is a pure function of (seed, id): reruns, different
    partitionings, and incremental corpus growth all agree."""
    thr = _frac_to_hex(frac)
    return df.filter(_hash_u32_hex(F.col(id_col), seed) < F.lit(thr))


# ---------------------------------------------------------------------------
# Sequence packing (distributed prefix sum)
# ---------------------------------------------------------------------------


def pack_sequences(
    counts: DataFrame,
    seq_len: int,
    id_col: str = "docid",
    count_col: str = "n_tokens",
) -> DataFrame:
    """Global token offsets + training-sequence spans for a corpus laid
    out in ``id_col`` order: returns ``(docid, n_tokens, start_offset,
    seq_first, seq_last)`` where ``start_offset`` is the exclusive
    prefix sum of ``count_col`` and ``seq_first/seq_last`` are the
    ids of the fixed-``seq_len`` training sequences the document's
    tokens span (documents are concatenated in id order and chunked —
    the standard pretraining packing layout).

    Distributed prefix sum, not a global window:

    1. range-shuffle on the id (explicit partition count — AQE would
       otherwise coalesce a small shuffle to ONE partition),
    2. per-partition totals (one tiny job; P rows to the driver),
    3. exclusive prefix over the P totals, broadcast,
    4. one Arrow-batched ``mapInPandas`` pass adding the partition
       prefix to each row's within-partition cumulative sum.

    Input is a (id, token_count) frame — pair it with the index's
    ``doc_stats`` (docid, doc_len) to pack an indexed corpus without
    re-tokenizing anything.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    spark = counts.sparkSession
    base = counts.select(
        F.col(id_col).cast("long").alias("docid"),
        # a null count (e.g. a null-text doc upstream) contributes no
        # tokens; left null it would NaN-poison the Arrow cumsum
        F.coalesce(F.col(count_col).cast("long"), F.lit(0)).alias("n_tokens"),
    )
    p = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        2 * spark.sparkContext.defaultParallelism,
    )
    ranged = base.repartitionByRange(p, "docid").sortWithinPartitions("docid")

    totals = {
        r["part"]: r["tot"]
        for r in ranged.select(
            F.spark_partition_id().alias("part"), "n_tokens"
        )
        .groupBy("part")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    }
    prefix: dict[int, int] = {}
    acc = 0
    for part in range(p):
        prefix[part] = acc
        acc += int(totals.get(part, 0))
    prefix_bc = spark.sparkContext.broadcast(prefix)

    def cumsum(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        off = prefix_bc.value.get(TaskContext.get().partitionId(), 0)
        run = 0
        for pdf in batches:
            n = pdf["n_tokens"].to_numpy()
            start = off + run + n.cumsum() - n
            run += int(n.sum())
            yield pd.DataFrame(
                {
                    "docid": pdf["docid"],
                    "n_tokens": pdf["n_tokens"],
                    "start_offset": start,
                }
            )

    out = ranged.mapInPandas(
        cumsum, schema="docid long, n_tokens long, start_offset long"
    )
    return out.select(
        "docid",
        "n_tokens",
        "start_offset",
        F.expr(f"start_offset DIV {seq_len}").alias("seq_first"),
        F.expr(
            f"(start_offset + greatest(n_tokens, 1L) - 1L) DIV {seq_len}"
        ).alias("seq_last"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# RE2 ∩ java.util.regex dialect only (char classes, bounded repeats,
# \b, \d): no backreferences, no lookaround — portable to the oracle.
PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails, phone numbers, and IPv4 addresses; emit per-doc
    match counts (counted on the ORIGINAL text) plus the redacted
    text. Pure JVM column expressions — map-only, codegen'd, no
    shuffle; patterns applied email -> phone -> ip (disjoint by
    construction: the later patterns cannot match inside the earlier
    replacements)."""
    t = F.col(text_col)
    redacted = F.regexp_replace(t, PII_EMAIL, "<email>")
    redacted = F.regexp_replace(redacted, PII_PHONE, "<phone>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<ip>")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(PII_PHONE), F.lit(0))).alias("n_phones"),
        F.size(F.regexp_extract_all(t, F.lit(PII_IPV4), F.lit(0))).alias("n_ips"),
        redacted.alias("redacted"),
    )


# ---------------------------------------------------------------------------
# Mixture / temperature sampling weights
# ---------------------------------------------------------------------------


def mixture_weights(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "content",
    alpha: float = 0.7,
) -> DataFrame:
    """Per-group corpus stats + temperature-``alpha`` sampling weights:
    ``w_g = tokens_g^alpha / sum_g tokens_g^alpha`` (alpha=1 is
    proportional sampling, alpha=0 uniform; 0<alpha<1 upsamples tail
    groups — the standard multilingual mixing rule). One |rows|->|groups|
    partial-aggregate shuffle; the normalizer is an ordered fold over
    the |groups|-row aggregate (deterministic float sum, same device as
    the scorer's ordered partial-sum fold)."""
    agg = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(ws_tokens(F.col(text_col))).cast("long")).alias("n_tokens"),
    )
    agg = agg.withColumn("w_raw", F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))))
    tot = agg.select(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("grp", "w_raw"))),
            F.lit(0.0).cast("double"),
            lambda a, x: a + x["w_raw"],
        ).alias("tot")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_tokens",
            F.round(F.col("w_raw") / F.col("tot"), ROUND).alias("weight"),
        )
    )


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracles
# ---------------------------------------------------------------------------

_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.1, "test": 0.1}
_SPLIT_SEED = "r3"
_SEQ_LEN = 256

# deterministic PII plant: every engine-side concat has a bit-equal
# SQL twin, so redaction correctness is checked on non-trivial text
# (a function — Column construction needs an active SparkContext)
def _pii_suffix_spark():
    return F.concat(
        F.lit(" mail u"),
        F.col("doc_id").cast("string"),
        F.lit("@ex"),
        (F.col("doc_id") % 5).cast("string"),
        F.lit(".org ip 10."),
        (F.col("doc_id") % 200).cast("string"),
        F.lit("."),
        (F.col("doc_id") % 250).cast("string"),
        F.lit(".7 call 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
_PII_SUFFIX_SQL = (
    "' mail u' || CAST(doc_id AS VARCHAR) || '@ex' || CAST(doc_id % 5 AS VARCHAR)"
    " || '.org ip 10.' || CAST(doc_id % 200 AS VARCHAR) || '.'"
    " || CAST(doc_id % 250 AS VARCHAR) || '.7 call 555-'"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)

_LANGS = ("py", "java", "go", "rust", "md")


def _docs(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _q_hash_split(spark, sf_dir: str) -> DataFrame:
    out = hash_split(_docs(spark, sf_dir), _SPLIT_FRACTIONS, seed=_SPLIT_SEED)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "split")


def _q_pack_sequences(spark, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    counts = docs.select(
        F.col("doc_id").alias("docid"),
        F.size(ws_tokens(F.col("text"))).alias("n_tokens"),
    )
    return pack_sequences(counts, seq_len=_SEQ_LEN)


def _q_pii_redact(spark, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.concat(F.col("text"), _pii_suffix_spark()).alias("text")
    )
    return pii_redact(docs)


def _q_mixture_weights(spark, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    code = docs.select(
        F.element_at(
            F.array(*[F.lit(x) for x in _LANGS]),
            ((F.col("doc_id") % len(_LANGS)) + 1).cast("int"),
        ).alias("lang"),
        F.col("text").alias("content"),
    )
    return mixture_weights(code, alpha=0.7)


register(
    "hash_split_assign",
    _q_hash_split,
    f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       {split_case_sql(_SPLIT_FRACTIONS, "doc_id", _SPLIT_SEED)} AS split
FROM documents
""",
)

register(
    "pack_sequences",
    _q_pack_sequences,
    f"""
WITH c AS (
  SELECT CAST(doc_id AS BIGINT) AS docid,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
s AS (
  SELECT docid, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (
           ORDER BY docid ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS start_offset
  FROM c
)
SELECT docid, n_tokens, start_offset,
       start_offset // {_SEQ_LEN} AS seq_first,
       (start_offset + greatest(n_tokens, 1) - 1) // {_SEQ_LEN} AS seq_last
FROM s
""",
)

register(
    "pii_redaction",
    _q_pii_redact,
    f"""
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         text || {_PII_SUFFIX_SQL} AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text, '{PII_IPV4}')) AS INT) AS n_ips,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{PII_EMAIL}', '<email>', 'g'),
           '{PII_PHONE}', '<phone>', 'g'),
         '{PII_IPV4}', '<ip>', 'g') AS redacted
FROM d
""",
)

register(
    "mixture_weights",
    _q_mixture_weights,
    f"""
WITH code AS (
  SELECT (['py', 'java', 'go', 'rust', 'md'])[CAST(doc_id % 5 AS INT) + 1]
           AS lang,
         text AS content
  FROM documents
),
agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(content, ' '))) AS BIGINT) AS n_tokens,
         power(CAST(sum(len(string_split(content, ' '))) AS DOUBLE), 0.7)
           AS w_raw
  FROM code GROUP BY lang
),
tot AS (
  SELECT CAST(list_sum(list(w_raw ORDER BY lang)) AS DOUBLE) AS tot FROM agg
)
SELECT lang, n_docs, n_tokens,
       round(w_raw / (SELECT tot FROM tot), {ROUND}) AS weight
FROM agg
""",
)
