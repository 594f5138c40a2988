"""Text-analysis operators for large-scale training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting.

These extend the reference engine's analysis surface (SURVEY.md §2.2)
with the corpus-curation operators a 100 TB pretraining pipeline runs
over the same tokenized documents. Everything here is pure JVM column
expressions (whole-stage codegen, no Python in the hot path); the only
cross-engine primitive is the portable 60-bit hash
``conv(substr(md5(x),1,15),16,10)`` shared with the DuckDB oracles.

Scale notes: every operator is a narrow per-row projection or a single
hash aggregation on doc_id — no joins, no windows; at 10^12 rows they
pipeline inside the scan stage and shuffle only for the final group-by
(dedup-style consumers handle their own shuffles, see dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .entry_ops import register

# Marker-token sets for the n-gram/stopword-density heuristics. Small
# on purpose: they are inlined into both the Spark plan and the DuckDB
# oracle SQL, and a handful of high-frequency function words is what
# fastText-style heuristic langid keys on anyway.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "it", "a"),
    "es": ("el", "la", "de", "los", "es", "y", "que", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "que"),
}

QUALITY_MARKERS: tuple[str, ...] = LANG_MARKERS["en"]

# BPE-ish pre-tokenization: letter runs | digit runs | single symbol.
# (The real BPE split regex adds case/unicode classes; the corpus is
# lowercase ASCII so this is the faithful projection.)
BPE_SPLIT_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

PORTABLE_HASH_BITS = 60


def portable_hash(col: Column) -> Column:
    """60-bit positive hash identical in Spark and DuckDB:
    Spark  conv(substr(md5(x),1,15),16,10)::long
    DuckDB ('0x' || substr(md5(x),1,15))::bigint
    (verified bit-equal in tests/test_textstats.py)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def portable_hash_sql(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def ws_tokens(text: Column) -> Column:
    return F.split(text, " ", 0)


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per doc."""
    t = F.col(text_col)
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(ws_tokens(t)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_SPLIT_PATTERN), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_features(
    df: DataFrame,
    text_col: str = "text",
    markers: tuple[str, ...] = QUALITY_MARKERS,
) -> DataFrame:
    """Per-doc quality features + a [0,1] score.

    Classic cheap quality signals (C4/Gopher-style): document length,
    mean token length, stopword density (too low => boilerplate/code,
    not prose), distinct-token ratio (too low => repetitive spam).
    score = 0.25*len_ok + 0.25*avg_len_ok + 0.25*sw_ok + 0.25*distinct_ok
    with fixed public thresholds; deterministic, no model.
    """
    toks = ws_tokens(F.col(text_col))
    marker_arr = F.array(*[F.lit(m) for m in markers])
    n = F.size(toks).cast("double")
    n_chars = F.length(F.col(text_col)).cast("double")
    sw_cnt = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    n_distinct = F.size(F.array_distinct(toks))
    feat = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        n.alias("n_tokens"),
        (n_chars / n).alias("avg_token_len"),
        (sw_cnt.cast("double") / n).alias("stopword_ratio"),
        (n_distinct.cast("double") / n).alias("distinct_ratio"),
    )
    score = (
        F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.25).otherwise(0.0)
        + F.when((F.col("avg_token_len") >= 3.0) & (F.col("avg_token_len") <= 10.0), 0.25).otherwise(0.0)
        + F.when(F.col("stopword_ratio") >= 0.01, 0.25).otherwise(0.0)
        + F.when(F.col("distinct_ratio") >= 0.1, 0.25).otherwise(0.0)
    )
    return feat.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("avg_token_len", 6).alias("avg_token_len"),
        F.round("stopword_ratio", 6).alias("stopword_ratio"),
        F.round("distinct_ratio", 6).alias("distinct_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: count hits per language's marker set,
    argmax with (count DESC, lang ASC) tie-break; zero hits -> 'und'.
    A deterministic stand-in for n-gram langid (fastText-style) that
    stays JVM-side and oracle-reproducible."""
    toks = ws_tokens(F.col(text_col))

    def hit_counter(markers: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(m) for m in markers])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("long")

    cols = [
        hit_counter(markers).alias(f"hits_{lang}")
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(F.col("doc_id").cast("long").alias("doc_id"), *cols)
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    F.col(f"hits_{lang}").alias("hits"),
                    # lang DESC in struct-max == lang ASC preference on
                    # ties, because array_max keeps the largest struct
                    F.lit(-i).alias("ord"),
                    F.lit(lang).alias("lang"),
                )
                for i, lang in enumerate(sorted(LANG_MARKERS))
            ]
        )
    )
    return scored.select(
        "doc_id",
        *[F.col(f"hits_{lang}") for lang in sorted(LANG_MARKERS)],
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
    )


def fingerprints(
    df: DataFrame, text_col: str = "text", shingle: int = 5
) -> DataFrame:
    """Rolling-hash document fingerprint: portable hash of every
    ``shingle``-token window; keep min-hash (winnowing-style
    representative) + distinct-window count. Docs shorter than the
    window get the whole-text hash."""
    toks = ws_tokens(F.col(text_col))
    n = F.size(toks)
    windows = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (shingle - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, shingle), " "),
    )
    hashes = F.transform(windows, portable_hash)
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_min(hashes).alias("min_fingerprint"),
        F.size(F.array_distinct(hashes)).cast("long").alias("n_distinct_shingles"),
    )


def unigram_perplexity(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Unigram-LM cross-entropy quality signal (the CCNet-family
    perplexity filter, Wenzek et al. 2020 — there with a KenLM 5-gram;
    here the corpus's own unigram model, fully deterministic and
    oracle-reproducible): p(t) = cf(t) / total_tokens over the whole
    corpus, and per document

        cross_entropy = -(1/len) * sum_t tf_t * log10 p(t)

    High cross-entropy = tokens rare in the corpus (noise/junk); low =
    boilerplate. Output: (doc_id, doc_len, cross_entropy).

    Determinism: cf and total are integer-valued double sums (exact
    below 2^53, order-free); the per-doc partial sum is an ORDERED
    fold over the term-sorted list (float addition isn't associative —
    same pattern as the top-k score fold in __spark_entry__).

    Scale notes: per-(doc,term) tf is the narrow run-length SPIMI
    kernel (no shuffle, see frames.exploded_term_tf); cf is one
    map-side-combinable term aggregation; the join back is an
    equi-join on term (AQE broadcast for bounded vocabularies); the
    per-doc fold shuffles once on doc_id. When the inverted index is
    already built these frames exist as postings/lexicon — compute the
    filter from the index instead of re-tokenizing.
    """
    from .frames import exploded_term_tf

    toks = df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.split(F.col(text_col), " ", -1).alias("tokens"),
    )
    tf = exploded_term_tf(toks, ["doc_id"])
    return _perplexity_over_tf(tf)


def unigram_perplexity_from_index(idx) -> DataFrame:
    """``unigram_perplexity`` served from a built inverted index — the
    per-(term,doc) tf already exists as ``postings/``, so the quality
    filter costs one cf aggregation + one equi-join + one per-doc fold
    and NEVER re-tokenizes the corpus (the same serve-from-the-index
    posture as ``phrase_search_indexed``). Token identity follows the
    index's analysis chain (cleanText/tokenize/stem per its flags)
    rather than the raw whitespace split; with analysis disabled the
    two variants are equal (pinned in tests).

    Accepts an ``InvertedIndex`` or a bare postings DataFrame with
    (term, docid, tf) columns.
    """
    postings = idx if isinstance(idx, DataFrame) else idx.postings
    tf = postings.select(
        F.col("docid").cast("long").alias("doc_id"), "term", "tf"
    )
    return _perplexity_over_tf(tf)


def _perplexity_over_tf(tf: DataFrame) -> DataFrame:
    """Shared core: (doc_id, term, tf) -> (doc_id, doc_len,
    cross_entropy) with the deterministic term-ordered fold."""
    cf = tf.groupBy("term").agg(F.sum("tf").cast("double").alias("cf"))
    total = cf.agg(F.sum("cf").alias("total"))
    scored = (
        tf.join(cf, "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            "tf",
            F.struct(
                F.col("term"),
                (
                    F.col("tf").cast("double")
                    * F.log10(F.col("cf") / F.col("total"))
                ).alias("v"),
            ).alias("__tv"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("doc_len"),
        F.array_sort(F.collect_list("__tv")).alias("__tvs"),
    )
    s = F.aggregate("__tvs", F.lit(0.0), lambda acc, x: acc + x["v"])
    return agg.select(
        "doc_id",
        "doc_len",
        F.round(-s / F.col("doc_len").cast("double"), 9).alias(
            "cross_entropy"
        ),
    )


REPETITION_NGRAM = 2
REPETITION_MAX_DUP_FRACTION = 0.6


def repetition_stats(
    df: DataFrame, text_col: str = "text", n: int = REPETITION_NGRAM,
    max_dup_fraction: float = REPETITION_MAX_DUP_FRACTION,
) -> DataFrame:
    """Within-document repetition signal (the Gopher quality-filter
    family, Rae et al. 2021 §A1.1: documents dominated by repeated
    n-grams are low-quality boilerplate/spam): per doc, the fraction
    of word n-grams that are duplicates of an earlier one, and a
    ``repetitive`` flag at ``max_dup_fraction``. Pure JVM column
    expressions — array slice windows + distinct count; no UDF, no
    shuffle."""
    toks = ws_tokens(F.col(text_col))
    nn = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(nn - (n - 1), F.lit(1))),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    total = F.size(grams)
    dup_frac = F.round(
        (total - F.size(F.array_distinct(grams))).cast("double")
        / total.cast("double"),
        9,
    )
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        total.cast("long").alias("n_ngrams"),
        dup_frac.alias("dup_ngram_fraction"),
        (dup_frac > max_dup_fraction).alias("repetitive"),
    )


# ---------------------------------------------------------------------------
# Driver-gate registration (documents table) + DuckDB oracles
# ---------------------------------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _markers_sql(markers: tuple[str, ...]) -> str:
    return "[" + ", ".join(f"'{m}'" for m in markers) + "]"


register(
    "text_repetition",
    lambda spark, sf_dir: repetition_stats(_docs(spark, sf_dir)),
    f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         CAST(greatest(len(toks) - {REPETITION_NGRAM - 1}, 1) AS BIGINT)
           AS n_ngrams,
         len(list_distinct(list_transform(
           range(1, greatest(len(toks) - {REPETITION_NGRAM - 1}, 1) + 1),
           i -> array_to_string(toks[i:i+{REPETITION_NGRAM - 1}], ' ')
         ))) AS n_distinct
  FROM t
)
SELECT doc_id, n_ngrams,
       round(CAST(n_ngrams - n_distinct AS DOUBLE) / n_ngrams, 9)
         AS dup_ngram_fraction,
       (round(CAST(n_ngrams - n_distinct AS DOUBLE) / n_ngrams, 9)
        > {REPETITION_MAX_DUP_FRACTION}) AS repetitive
FROM g
""",
)

register(
    "text_token_counts",
    lambda spark, sf_dir: token_counts(_docs(spark, sf_dir)),
    f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_SPLIT_PATTERN}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
""",
)

register(
    "text_quality",
    lambda spark, sf_dir: quality_features(_docs(spark, sf_dir)),
    f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
         CAST(length(text) AS DOUBLE) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
                  t -> list_contains({_markers_sql(QUALITY_MARKERS)}, t)))
              AS DOUBLE) AS sw,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) AS nd
  FROM documents
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       round(n_chars / n, 6) AS avg_token_len,
       round(sw / n, 6) AS stopword_ratio,
       round(nd / n, 6) AS distinct_ratio,
       round(CAST(
         (CASE WHEN n >= 10 AND n <= 100000 THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN n_chars / n >= 3.0 AND n_chars / n <= 10.0 THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN sw / n >= 0.01 THEN 0.25 ELSE 0.0 END)
         + (CASE WHEN nd / n >= 0.1 THEN 0.25 ELSE 0.0 END) AS DOUBLE), 2) AS quality_score
FROM f
""",
)

_LANG_HIT_COLS = ",\n         ".join(
    f"CAST(len(list_filter(string_split(text, ' '), "
    f"t -> list_contains({_markers_sql(m)}, t))) AS BIGINT) AS hits_{lang}"
    for lang, m in sorted(LANG_MARKERS.items())
)
# argmax with (hits DESC, lang ASC) tie-break as a CASE chain — the
# first matching branch in sorted-lang order wins ties, which is
# exactly the Spark struct-max ordering above
_LANG_MAX = "greatest(" + ", ".join(f"hits_{lg}" for lg in sorted(LANG_MARKERS)) + ")"
_LANG_CASE = " ".join(
    f"WHEN hits_{lg} = {_LANG_MAX} THEN '{lg}'" for lg in sorted(LANG_MARKERS)
)

register(
    "text_langid",
    lambda spark, sf_dir: lang_id(_docs(spark, sf_dir)),
    f"""
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         {_LANG_HIT_COLS}
  FROM documents
)
SELECT doc_id, hits_de, hits_en, hits_es, hits_fr,
       CASE WHEN {_LANG_MAX} = 0 THEN 'und' {_LANG_CASE} END AS lang_pred
FROM f
""",
)

register(
    "text_perplexity",
    lambda spark, sf_dir: unigram_perplexity(_docs(spark, sf_dir)),
    """
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(string_split(text, ' ')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM t WHERE term <> '' GROUP BY doc_id, term
),
cf AS (SELECT term, CAST(sum(tf) AS DOUBLE) AS cf FROM tf GROUP BY term),
n AS (SELECT CAST(sum(cf) AS DOUBLE) AS total FROM cf),
v AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         CAST(tf.tf AS DOUBLE) * log10(cf.cf / (SELECT total FROM n)) AS v
  FROM tf JOIN cf USING (term)
)
SELECT doc_id, CAST(sum(tf) AS BIGINT) AS doc_len,
       round(-(CAST(list_sum(list(v ORDER BY term)) AS DOUBLE))
             / CAST(sum(tf) AS DOUBLE), 9) AS cross_entropy
FROM v GROUP BY doc_id
""",
)

register(
    "text_fingerprints",
    lambda spark, sf_dir: fingerprints(_docs(spark, sf_dir)),
    f"""
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS toks
  FROM documents
),
w AS (
  SELECT doc_id,
         {portable_hash_sql("array_to_string(toks[i.i:i.i+4], ' ')")} AS h
  FROM t,
       LATERAL (SELECT unnest(range(1, greatest(len(toks) - 4, 1) + 1)) AS i) i
)
SELECT doc_id, min(h) AS min_fingerprint,
       CAST(count(DISTINCT h) AS BIGINT) AS n_distinct_shingles
FROM w GROUP BY doc_id
""",
)


# ---------------------------------------------------------------------------
# Corpus profile (dataset-card summary)
# ---------------------------------------------------------------------------

PROFILE_PCTS = (0.5, 0.9, 0.99)


def corpus_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row dataset-card summary: document/token totals, vocabulary
    size, and nearest-rank doc-length percentiles (p(q) = the smallest
    length whose cumulative doc count reaches ceil(q*N) — a
    deterministic integer definition both engines agree on, unlike
    interpolated quantiles).

    Scale shape: percentiles come from a HISTOGRAM — one small
    groupBy(doc_len) shuffle, then a cumulative sum over the tiny
    distinct-length aggregate — never a global sort of the corpus;
    vocab size is one distinct-aggregate over the exploded token
    stream. At 10^12 docs the histogram has at most |distinct
    lengths| rows, so the percentile step is driver-trivial."""
    from pyspark.sql import Window

    lens = df.select(
        F.size(ws_tokens(F.col(text_col))).cast("long").alias("doc_len")
    )
    hist = lens.groupBy("doc_len").agg(F.count("*").alias("n"))
    w = Window.orderBy("doc_len").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cn", F.sum("n").over(w))
    tot = lens.agg(
        F.count("*").alias("n_docs"), F.sum("doc_len").alias("n_tokens")
    )
    pct_cols = []
    for q in PROFILE_PCTS:
        tag = f"p{int(q * 100)}_len"
        pct_cols.append(
            F.min(
                F.when(
                    F.col("cn") >= F.ceil(F.col("n_docs") * q),
                    F.col("doc_len"),
                )
            ).alias(tag)
        )
    pcts = cum.crossJoin(F.broadcast(tot)).agg(
        *pct_cols, F.max("doc_len").alias("max_len")
    )
    vocab = df.select(
        F.explode(ws_tokens(F.col(text_col))).alias("tok")
    ).agg(F.count_distinct("tok").alias("vocab_size"))
    return (
        tot.crossJoin(pcts)
        .crossJoin(vocab)
        .select(
            "n_docs", "n_tokens", "vocab_size",
            "p50_len", "p90_len", "p99_len", "max_len",
        )
    )


register(
    "corpus_profile",
    lambda spark, sf_dir: corpus_profile(_docs(spark, sf_dir)),
    """
WITH lens AS (
  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS doc_len
  FROM documents
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(doc_len) AS BIGINT) AS n_tokens
  FROM lens
),
hist AS (SELECT doc_len, count(*) AS n FROM lens GROUP BY doc_len),
cum AS (
  SELECT doc_len, sum(n) OVER (ORDER BY doc_len
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn
  FROM hist
),
pcts AS (
  SELECT
    CAST(min(CASE WHEN cn >= ceil(n_docs * 0.5) THEN doc_len END) AS BIGINT)
      AS p50_len,
    CAST(min(CASE WHEN cn >= ceil(n_docs * 0.9) THEN doc_len END) AS BIGINT)
      AS p90_len,
    CAST(min(CASE WHEN cn >= ceil(n_docs * 0.99) THEN doc_len END) AS BIGINT)
      AS p99_len,
    CAST(max(doc_len) AS BIGINT) AS max_len
  FROM cum CROSS JOIN tot
),
vocab AS (
  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size
  FROM documents, LATERAL unnest(string_split(text, ' ')) AS u(tok)
)
SELECT n_docs, n_tokens, vocab_size, p50_len, p90_len, p99_len, max_len
FROM tot CROSS JOIN pcts CROSS JOIN vocab
""",
)
