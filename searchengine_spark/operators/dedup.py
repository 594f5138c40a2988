"""Deduplication operators for large-scale corpus curation.

Five dedup families over a (doc_id, text) table, each expressed as
shuffle-conscious DataFrame plans (no Python in any hot path):

* exact            — sha256(content) hash-groupBy (one shuffle on the hash)
* token multiset   — md5 of the sorted token list (permutation-invariant)
* n-gram Jaccard   — word-shingle inverted join; |A∩B| by a pair groupBy
* MinHash + LSH    — K portable min-hashes, banded; candidates verified
* SimHash          — 60-bit tf-weighted signature, banded Hamming join

Scale notes (10^12 docs):
* The shingle inverted join is the textbook all-pairs plan; its cost is
  sum over shingles of |posting|^2 — boilerplate shingles are the skew
  risk, so `ngram_jaccard_pairs` drops shingles above `max_shingle_df`
  (the standard prefix-filtering/stop-shingle mitigation; disabled at
  oracle scale so the SQL twin stays exact).
* MinHash-LSH replaces the quadratic join with band-bucket joins —
  O(candidates), the scale path. Bands/rows trade recall vs cost.
* SimHash pairs use the pigeonhole band join (d+1 bands: any pair
  within Hamming distance d shares at least one exact band), never a
  cross join.

The 60-bit hash is `portable_hash` (textstats.py) so every step has a
bit-identical DuckDB oracle.

Literature: MinHash resemblance sketching — Broder, "On the
resemblance and containment of documents" (SEQUENCES 1997); LSH
banding — Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
ch. 3; SimHash — Charikar, "Similarity estimation techniques from
rounding algorithms" (STOC 2002) and Manku et al., "Detecting
near-duplicates for web crawling" (WWW 2007).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .entry_ops import register
from .textstats import portable_hash, portable_hash_sql, ws_tokens

JACCARD_THRESHOLD = 0.8
MINHASH_K = 16
MINHASH_BANDS = 4
SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # pigeonhole-exact for Hamming distance <= 3
SIMHASH_MAX_HAMMING = 3
ROUND = 9

# MinHash-LSH recall at the J=0.8 threshold, P(candidate) = 1-(1-J^r)^b
# with r rows per band and b bands (Broder 1997; MMDS ch.3):
#   k=16,  b=4  (r=4):  1-(1-0.41)^4  ~ 0.88   <- oracle configuration
#   k=16,  b=8  (r=2):  1-(1-0.64)^8  ~ 0.9997 <- pipeline configuration
#   k=128, b=32 (r=4):  1-(1-0.41)^32 ~ 0.9999995 <- production default
# The oracle gate keeps k=16/b=4 (cheap, deterministic twin in SQL);
# production dedup at 100 TB should run PRODUCTION_MINHASH_K/BANDS —
# recall asserted on the planted >=0.8 pairs in tests/test_pipeline_ops.py.
PRODUCTION_MINHASH_K = 128
PRODUCTION_MINHASH_BANDS = 32

# cached shingle frames registered here; call release_caches() after
# materializing results in long-lived sessions (pipelines, REPLs) so
# executor storage memory doesn't accumulate across dedup calls
from .cacheutil import make_cache_registry

_cached, release_caches = make_cache_registry()


# ---------------------------------------------------------------------------
# exact + token-multiset dedup
# ---------------------------------------------------------------------------


def exact_dup_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Group identical content by sha256; keep the smallest doc_id as
    the representative. One hash shuffle; never groups by raw content
    (the hash is 32 bytes regardless of document size)."""
    return (
        df.select(F.col("doc_id").cast("long").alias("doc_id"),
                  F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_copies"))
    )


def token_fingerprint_groups(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Permutation-invariant near-dup: md5 of the SORTED token multiset
    (catches shuffled/boilerplate-reordered copies that exact hashing
    misses)."""
    key = F.md5(F.array_join(F.array_sort(ws_tokens(F.col(text_col))), " "))
    return (
        df.select(F.col("doc_id").cast("long").alias("doc_id"),
                  key.alias("token_fingerprint"))
        .groupBy("token_fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# word n-gram shingles + Jaccard
# ---------------------------------------------------------------------------


def shingle_array(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column, as an array."""
    toks = ws_tokens(text)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text") -> DataFrame:
    """Distinct word n-gram shingles per doc: (doc_id, shingle)."""
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.explode(shingle_array(F.col(text_col), n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    n: int = 3,
    threshold: float = JACCARD_THRESHOLD,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All (doc_a < doc_b, jaccard) pairs with shingle-set Jaccard >=
    threshold via the inverted shingle join. ``max_shingle_df`` drops
    ultra-common shingles before the self-join (skew guard at scale;
    None = exact)."""
    sh = shingles(df, n, text_col)
    if max_shingle_df is not None:
        heavy = (
            sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        )
        sh = sh.join(F.broadcast(heavy.select("shingle")), "shingle", "left_anti")
    sh = _cached(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                ROUND,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


# Universal-hash MinHash family (Carter & Wegman 1979; the standard
# MinHash construction, Broder 1997 §4): one 60-bit portable base hash
# per shingle, then h_i(x) = (a_i * x + b_i) mod p over the base hash.
# p = 2^31 - 1 (Mersenne prime) keeps every product < 2^62, inside
# signed-64 range on BOTH engines (DuckDB raises on BIGINT overflow —
# wrap-around tricks are not portable). The (a_i, b_i) are fixed
# LCG-derived constants so the DuckDB oracle embeds the identical
# family as literals. One md5 per shingle instead of k: the k affine
# min-folds are cheap integer HOFs (higher-order functions evaluate
# interpreted — they never enter codegen — so hashing work per element
# is the term that matters).
MINHASH_PRIME = (1 << 31) - 1


def _affine_params(k: int) -> list[tuple[int, int]]:
    params, x = [], 1103515245
    for _ in range(k):
        x = (1103515245 * x + 12345) % (1 << 31)
        a = x % (MINHASH_PRIME - 1) + 1  # a != 0 (mod p)
        x = (1103515245 * x + 12345) % (1 << 31)
        b = x % MINHASH_PRIME
        params.append((a, b))
    return params


def base_hash_col(sh_col: Column) -> Column:
    """Per-shingle 60-bit portable hash reduced mod p — computed ONCE
    per shingle; all k min-hash folds derive from it."""
    return F.transform(
        sh_col, lambda s: portable_hash(s) % F.lit(MINHASH_PRIME)
    )


def _minhash_cols(bh_col: Column, k: int) -> list[Column]:
    """k min-hashes over a base-hash array column:
    sig_i = min over shingles of (a_i * base + b_i) mod p.

    ``bh_col`` must be a projected ATTRIBUTE (withColumn), not an
    inline expression: these k columns each reference it, and Catalyst
    keeps multi-referenced non-cheap expressions un-collapsed
    (SPARK-36718) only when they are their own attribute — otherwise
    the md5 base-hash subtree would inline k times.

    NB: the per-i lambda comes from a closure factory — a default-arg
    lambda (``lambda s, i=i``) would be read by PySpark as a
    TWO-parameter HOF lambda, binding ``i`` to the array index column."""

    def affine(a: int, b: int):
        return lambda x: (x * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    return [
        F.array_min(F.transform(bh_col, affine(a, b)))
        for a, b in _affine_params(k)
    ]


def minhash_signatures(
    df: DataFrame, n: int = 3, k: int = MINHASH_K, text_col: str = "text"
) -> DataFrame:
    """(doc_id, hash_idx, minhash): k independent min-hashes, where
    hash_i(s) = (a_i * (portable_hash(s) mod p) + b_i) mod p.

    NARROW plan: each doc's shingle set is already one row's array, so
    every min-hash is a per-row array_min — no explode of
    |shingles| x k rows and no (doc_id, hash_idx) shuffle (which at
    10^12 docs would shuffle ~10^16 rows for k=16). The posexplode
    emits only k rows per doc, map-side."""
    sh = _shingle_rows(df, n, text_col)
    sig = F.array(*_minhash_cols(F.col("_bh"), k))
    return sh.select("doc_id", F.posexplode(sig).alias("hash_idx", "minhash"))


def _shingle_rows(df: DataFrame, n: int, text_col: str) -> DataFrame:
    """(doc_id, _sh, _bh): per-doc shingle + base-hash arrays, with
    signature-less docs DROPPED. A null text yields [NULL] from the
    shingle builder (slice of a null array), which would otherwise
    min-fold to an all-NULL signature — and every such doc would share
    the md5('') band key, making the LSH bucket self-join quadratic in
    the number of null-text docs on a dirty crawl. array_compact +
    size>0 drops them exactly like the explode formulation did."""
    return (
        df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.array_compact(shingle_array(F.col(text_col), n)).alias("_sh"),
        )
        .filter(F.size("_sh") > 0)
        .withColumn("_bh", base_hash_col(F.col("_sh")))
    )


def band_signatures(
    df: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, band, band_key): each band's md5 over its
    ``k // bands`` minhash values in hash_idx order — the LSH bucket
    key. Shared by the self-join dedup path and the cross-corpus
    decontamination join.

    NARROW plan (no shuffle): signatures and band keys are per-row
    column expressions over the doc's shingle array; only ``bands``
    rows per doc leave the map task. Value-identical to the relational
    explode + min-agg + collect_list formulation it replaced (which
    requires bands | k — a partial trailing band would diverge from
    the hash_idx // rows_per_band grouping of the SQL twin)."""
    if k % bands:
        raise ValueError(f"bands must divide k (got k={k}, bands={bands})")
    rows_per_band = k // bands
    sh = _shingle_rows(df, n, text_col)
    sigs = _minhash_cols(F.col("_bh"), k)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band"),
                F.md5(
                    F.concat_ws(
                        ",",
                        *[
                            sigs[b * rows_per_band + j].cast("string")
                            for j in range(rows_per_band)
                        ],
                    )
                ).alias("band_key"),
            )
            for b in range(bands)
        ]
    )
    return sh.select("doc_id", F.explode(band_structs).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.band_key").alias("band_key")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    text_col: str = "text",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs, verified with exact Jaccard.

    Docs agreeing on all rows of at least one band become candidates
    (bucket equi-join, the scale path); candidates then get the exact
    shingle Jaccard and the threshold filter — so output = exact pairs
    RESTRICTED to LSH-recalled candidates, matching the standard
    MinHash-dedup pipeline."""
    # cached: the self-join would otherwise evaluate the signature
    # expressions once per side
    band_sig = _cached(band_signatures(df, n, k, bands, text_col))
    a, b = band_sig.alias("a"), band_sig.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # output-sensitive verification: exact Jaccard computed ONLY for
    # candidate pairs (join the candidate list against each side's
    # shingle set), not via the full quadratic inverted join — this is
    # what makes LSH the scale path: cost O(|candidates| x shingles/doc).
    # (On toy corpora the full inverted join is cheaper — fewer stages —
    # but it is quadratic in posting sizes and impossible at 10^12 docs.)
    sh = shingles(df, n, text_col)
    if max_shingle_df is not None:
        heavy = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        sh = sh.join(F.broadcast(heavy.select("shingle")), "shingle", "left_anti")
    sh = _cached(sh)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(
        F.col("doc_id").alias("b_doc"), F.col("shingle").alias("b_shingle")
    )
    inter = (
        cands.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("b_doc"))
            & (F.col("shingle") == F.col("b_shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
                ROUND,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# Cross-corpus decontamination (train vs eval overlap)
# ---------------------------------------------------------------------------


def cross_corpus_contamination(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """(train_doc_id, eval_doc_id, jaccard): training documents whose
    shingle-set Jaccard against an evaluation document reaches the
    threshold — the train/eval DECONTAMINATION join a pretraining
    pipeline runs before training (eval-set look-alikes leak benchmark
    answers; see GPT-3's n-gram decontamination, Brown et al. 2020
    App. C, and Lee et al., "Deduplicating training data makes
    language models better", ACL 2022).

    Scale shape: banded MinHash BETWEEN the two tables — each side's
    band signatures bucket-equi-join on (band, band_key); never a
    train x eval cross join. Exact Jaccard verification is restricted
    to the LSH candidates (output-sensitive, same contract as
    minhash_lsh_pairs). The eval side is typically tiny vs the corpus
    (thousands of benchmark rows vs 10^12 files), so AQE broadcasts
    its signature and shingle frames."""
    tb = band_signatures(train, n, k, bands, text_col)
    eb = band_signatures(evalset, n, k, bands, text_col)
    cands = (
        tb.alias("t")
        .join(
            eb.alias("e"),
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.band_key") == F.col("e.band_key")),
        )
        .select(
            F.col("t.doc_id").alias("train_doc_id"),
            F.col("e.doc_id").alias("eval_doc_id"),
        )
        .distinct()
    )
    sht = _cached(shingles(train, n, text_col))
    she = _cached(shingles(evalset, n, text_col))
    szt = sht.groupBy("doc_id").agg(F.count("*").alias("nt"))
    sze = she.groupBy("doc_id").agg(F.count("*").alias("ne"))
    inter = (
        cands.join(
            sht.select(F.col("doc_id").alias("train_doc_id"), "shingle"),
            "train_doc_id",
        )
        .join(
            she.select(
                F.col("doc_id").alias("e_doc"),
                F.col("shingle").alias("e_shingle"),
            ),
            (F.col("eval_doc_id") == F.col("e_doc"))
            & (F.col("shingle") == F.col("e_shingle")),
        )
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("inter"))
    )
    st = szt.select(F.col("doc_id").alias("train_doc_id"), "nt")
    se = sze.select(F.col("doc_id").alias("eval_doc_id"), "ne")
    return (
        inter.join(st, "train_doc_id")
        .join(se, "eval_doc_id")
        .select(
            "train_doc_id",
            "eval_doc_id",
            F.round(
                F.col("inter").cast("double")
                / (F.col("nt") + F.col("ne") - F.col("inter")).cast("double"),
                ROUND,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_collision_pairs(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 13,
    text_col: str = "text",
) -> DataFrame:
    """(train_doc_id, eval_doc_id, n_collisions): EXACT shared word
    n-grams between the corpora — the published GPT-3 decontamination
    rule (13-gram collision, Brown et al. 2020 App. C), complementary
    to the Jaccard join: it catches a long verbatim quote inside an
    otherwise-different document, which set-level Jaccard dilutes.

    Docs shorter than n tokens cannot contain an n-gram and are
    excluded on both sides. Pure shingle equi-join — the n-gram key is
    highly selective at n=13, so the join is output-sensitive."""
    def side(df, id_alias, sh_alias):
        toks = ws_tokens(F.col(text_col))
        return (
            df.filter(F.size(toks) >= n)
            .select(
                F.col("doc_id").cast("long").alias(id_alias),
                F.explode(
                    F.array_distinct(
                        F.transform(
                            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                            lambda i: F.array_join(F.slice(toks, i, n), " "),
                        )
                    )
                ).alias(sh_alias),
            )
        )

    t = side(train, "train_doc_id", "shingle")
    e = side(evalset, "eval_doc_id", "e_shingle")
    return (
        t.join(e, F.col("shingle") == F.col("e_shingle"))
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count("*").cast("long").alias("n_collisions"))
    )


def decontaminate_corpus(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """The training corpus minus every row contaminated by the eval
    set (left-anti on the contamination join's train ids)."""
    bad = (
        cross_corpus_contamination(
            train, evalset, n, k, bands, threshold, text_col
        )
        .select(F.col("train_doc_id").alias("doc_id"))
        .distinct()
    )
    return train.join(bad, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def duplicated_spans(
    df: DataFrame, n: int = 13, text_col: str = "text",
    hash_key: bool = False,
) -> DataFrame:
    """Exact-substring deduplication at token n-gram granularity (Lee
    et al., "Deduplicating Training Data Makes Language Models
    Better", ACL 2022 — the suffix-array ExactSubstr pass, re-expressed
    for Spark as windowed n-gram occurrences): every occurrence of an
    n-token window whose text appears MORE THAN ONCE in the corpus is
    marked for removal, except the canonical first occurrence
    (smallest (doc_id, pos)) which is kept; per document, marked
    windows merge into maximal token spans via gaps-and-islands over
    the running max end.

    One shuffle keyed by the n-gram (selective at n=13) decides
    duplicate-vs-canonical for every occurrence at once; the island
    merge shuffles only the marked occurrences, keyed by doc_id —
    output-sensitive, never corpus-sized. Docs shorter than n tokens
    contain no window and emit no span.

    ``hash_key=True`` shuffles xxhash64(gram) instead of the gram
    string — ~8 bytes per occurrence instead of ~8n, the 100 TB
    configuration (a 64-bit collision falsely merges two windows, the
    same accepted trade hash-based ExactSubstr pipelines make; the
    default stays exact so the DuckDB oracle is collision-free).

    Returns (doc_id, span_start, span_end, n_tokens): 0-based
    INCLUSIVE token intervals to delete, disjoint and maximal per doc.
    """
    toks = ws_tokens(F.col(text_col))
    occ = df.filter(F.size(toks) >= n).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        ).alias("pos0", "gram"),
    )
    if hash_key:
        occ = occ.select("doc_id", "pos0", F.xxhash64("gram").alias("gram"))
    wg = Window.partitionBy("gram")
    wfirst = Window.partitionBy("gram").orderBy("doc_id", "pos0")
    marked = (
        occ.withColumn("cnt", F.count("*").over(wg))
        .withColumn("rn", F.row_number().over(wfirst))
        .filter((F.col("cnt") > 1) & (F.col("rn") > 1))
        .select(
            "doc_id",
            F.col("pos0").alias("s"),
            (F.col("pos0") + (n - 1)).alias("e"),
        )
    )
    wdoc = Window.partitionBy("doc_id").orderBy("s", "e")
    prev_max = F.max("e").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = (
        marked.withColumn(
            "brk",
            F.when(F.col("s") > F.coalesce(prev_max, F.lit(-1)), 1).otherwise(0),
        )
        .withColumn("island", F.sum("brk").over(wdoc))
    )
    return grouped.groupBy("doc_id", "island").agg(
        F.min("s").cast("long").alias("span_start"),
        F.max("e").cast("long").alias("span_end"),
        (F.max("e") - F.min("s") + 1).cast("long").alias("n_tokens"),
    ).drop("island")


def substring_dedup_corpus(
    df: DataFrame, n: int = 13, text_col: str = "text",
    hash_key: bool = False,
) -> DataFrame:
    """The corpus with every duplicated span's tokens deleted: the
    realization step of ``duplicated_spans`` (Lee et al. 2022 keep-one
    semantics — the canonical first occurrence survives verbatim).
    Returns (doc_id, text, n_removed); docs without duplicated spans
    pass through unchanged (n_removed = 0). The spans-per-doc array is
    tiny (disjoint merged intervals), so the token filter is a narrow
    per-row map after one broadcast-sized left join."""
    spans = (
        duplicated_spans(df, n, text_col, hash_key=hash_key)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("spans")
        )
    )
    toks = ws_tokens(F.col(text_col))
    base = df.select(
        F.col("doc_id").cast("long").alias("doc_id"), toks.alias("toks")
    )
    joined = base.join(spans, "doc_id", "left").withColumn(
        "removed",
        F.flatten(
            F.transform(
                F.coalesce(F.col("spans"), F.array()),
                lambda sp: F.sequence(sp["span_start"], sp["span_end"]),
            )
        ),
    )
    clean = F.filter(
        F.col("toks"),
        lambda x, i: ~F.array_contains(F.col("removed"), i.cast("long")),
    )
    return joined.select(
        "doc_id",
        F.array_join(clean, " ").alias("text"),
        (F.size("toks") - F.size(clean)).cast("long").alias("n_removed"),
    )


def simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """60-bit tf-weighted SimHash per doc.

    bit_j(doc) = 1 iff sum over distinct tokens of
    tf * (+1 if bit_j(hash(token)) else -1) > 0.

    NARROW plan (no shuffle): a doc's token multiset is one row's
    array, so per-token tf is the run lengths of the sorted array and
    every bit's signed sum is a per-row integer fold over the
    (hash, tf) entries — all-integer arithmetic, so exactly the value
    the explode -> tf-agg -> per-bit-agg relational plan produced
    while shuffling |tokens| + 60 x |distinct tokens| rows per doc.
    Each intermediate is its own projection attribute (SPARK-36718
    keeps multi-referenced non-cheap expressions un-collapsed);
    the per-bit lambdas come from a closure factory, never default-arg
    lambdas (PySpark reads extra lambda args as HOF parameters).
    Docs with no tokens emit no row (the explode formulation dropped
    them; the fold must not resurrect them as signature 0)."""
    d = (
        df.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            ws_tokens(F.col(text_col)).alias("__tk"),
        )
        .filter(F.size("__tk") > 0)
        .withColumn("__st", F.array_sort("__tk"))
        .withColumn("__n", F.size("__st"))
    )
    starts = F.filter(
        F.sequence(F.lit(0), F.col("__n") - 1),
        lambda i: (i == F.lit(0))
        | (F.element_at(F.col("__st"), i + 1) != F.element_at(F.col("__st"), i)),
    )
    d = d.withColumn("__starts", starts)
    ends = F.concat(
        F.slice(
            F.col("__starts"), 2, F.greatest(F.size("__starts") - 1, F.lit(0))
        ),
        F.array(F.col("__n")),
    )
    entries = F.zip_with(
        F.col("__starts"),
        ends,
        lambda s, e: F.struct(
            portable_hash(F.element_at(F.col("__st"), s + 1)).alias("h"),
            (e - s).cast("long").alias("tf"),
        ),
    )
    d = d.withColumn("__e", entries)

    def bit_sum(j: int) -> Column:
        return F.aggregate(
            F.col("__e"),
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + x["tf"] * (F.shiftright(x["h"], j).bitwiseAND(F.lit(1)) * 2 - 1),
        )

    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(bit_sum(j) > 0, F.lit(1 << j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = term if sim is None else sim + term
    return d.select("doc_id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = SIMHASH_MAX_HAMMING,
    text_col: str = "text",
) -> DataFrame:
    """(doc_a < doc_b, hamming) pairs within Hamming distance d, found
    with the pigeonhole band join: split the 60-bit signature into
    d+1 = 4 15-bit bands; any pair at distance <= d agrees exactly on
    some band, so an equi-join per band finds ALL such pairs without a
    cross join."""
    sig = _cached(simhash(df, text_col))
    band_width = SIMHASH_BITS // SIMHASH_BANDS
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(
            f"shiftright(simhash, cast(band as int) * {band_width})"
            f" & {(1 << band_width) - 1}"
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).cast("long")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# Duplicate-cluster resolution (connected components)
# ---------------------------------------------------------------------------


# duplicate-pair sets are output-sensitive (the LSH candidate set, not
# |docs|^2): below the edge budget an exact driver-side union-find
# beats O(log d) rounds of Spark jobs outright. A collected edge costs
# ~300 bytes peak on the driver (collect() Rows + the Python tuple
# list + a dict of up to 2 boxed ints per edge — NOT the 16 raw
# bytes), so the default budget derives from spark.driver.memory like
# MaxScore's fetch budget (a 1g driver lands near the old 1M-edge
# constant; big drivers scale up automatically). Env override:
# SE_CC_LOCAL_EDGES. CC_LOCAL_EDGE_LIMIT remains the memory-unaware
# floor/fallback.
CC_LOCAL_EDGE_LIMIT = 1_000_000
_CC_BYTES_PER_EDGE = 300
_CC_MEM_FRACTION = 4  # budget caps edges at 1/4 of driver memory


def _default_cc_edge_budget(spark) -> int:
    from .maxscore import driver_memory_bytes

    return max(
        CC_LOCAL_EDGE_LIMIT,
        int(driver_memory_bytes(spark) // _CC_MEM_FRACTION // _CC_BYTES_PER_EDGE),
    )


def _local_components(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Exact union-find (path-halving) over the edge endpoints; every
    touched node maps to the MIN doc_id of its component — identical
    labels to the distributed min-label loop by definition of both."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min root so the representative IS the min label
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    return {x: find(x) for x in parent}


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    max_iter: int = 30,
    local_threshold: int | None = None,
) -> DataFrame:
    """Connected components of the near-duplicate graph: every node is
    labeled with the MINIMUM doc_id reachable from it (the canonical
    cluster representative of the standard dedup keep-policy).

    ``nodes``: one ``doc_id`` column (every document, so singletons get
    ``cluster_id = doc_id``); ``edges``: ``(doc_a, doc_b)`` pairs from a
    pair generator (`minhash_lsh_pairs`, `simhash_pairs`, ...).

    Algorithm — iterated min-label propagation with pointer jumping
    (the hash-to-min family: Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds", ICDE 2013; see
    also Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014). Each round does

    1. ``l(x) <- min(l(x), min over neighbors y of l(y))`` — one
       edges-with-labels hash join + one groupBy min, and
    2. a pointer jump ``l(x) <- l(l(x))`` — one labels self-join,

    so label paths halve per round and convergence is O(log diameter)
    rounds, not O(diameter) (near-dup chains in boilerplate-heavy
    corpora can be long). Every round's frames are localCheckpointed to
    cut the iterative lineage; convergence is detected by the strictly
    decreasing label sum (labels only ever decrease), one tiny
    aggregate per round — never a data collect.

    Scale shape: per round, one shuffle of |edges| (output-sensitive —
    the LSH candidate set, not |docs|^2) and two shuffles of |docs|
    (doc_id, label) pairs; the whole loop is O(log d) such rounds.
    Below ``local_threshold`` edges (default derived from
    ``spark.driver.memory`` — ``_default_cc_edge_budget``; env
    override SE_CC_LOCAL_EDGES) the pair set collects to the driver for an
    exact union-find instead — one scalar count + one k-row collect +
    one broadcast join beats O(log d) rounds of jobs whenever the
    dup-pair set fits driver memory; labels are identical by
    construction (both label every node with its component's min).
    """
    import logging
    import os

    if local_threshold is None:
        raw = os.environ.get("SE_CC_LOCAL_EDGES")
        try:
            local_threshold = (
                int(raw)
                if raw is not None
                else _default_cc_edge_budget(nodes.sparkSession)
            )
        except ValueError:
            fallback = _default_cc_edge_budget(nodes.sparkSession)
            logging.getLogger(__name__).warning(
                "ignoring non-integer SE_CC_LOCAL_EDGES=%r; using %d",
                raw, fallback,
            )
            local_threshold = fallback
    base = nodes.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("doc_id").cast("long").alias("cluster_id"),
    )
    probe_df = None
    if local_threshold > 0:
        # persist -> count -> collect: pair generation (the expensive
        # LSH-verification pipeline) runs ONCE and the probe reads the
        # cache. NOT limit(t+1): CollectLimit's incremental execution
        # re-runs the final stage in 1/4/16/... -partition waves until
        # it has t+1 rows, so a generous threshold over a small pair
        # set re-executes the verification join several times
        # (measured 16.7 s vs ~5 s for this cache-probe at sf0.1).
        # Null endpoints and endpoints outside ``nodes`` are dropped
        # FIRST — the distributed loop's label joins ignore such edges,
        # so the union-find must never see them (a union through a
        # non-node would re-root a cluster onto a doc_id that cannot be
        # kept as its representative).
        node_ids = base.select("doc_id")
        probe_df = (
            edges.select(
                F.col("doc_a").cast("long").alias("doc_a"),
                F.col("doc_b").cast("long").alias("doc_b"),
            )
            .filter(F.col("doc_a").isNotNull() & F.col("doc_b").isNotNull())
            .join(
                node_ids.withColumnRenamed("doc_id", "doc_a"),
                "doc_a", "leftsemi",
            )
            .join(
                node_ids.withColumnRenamed("doc_id", "doc_b"),
                "doc_b", "leftsemi",
            )
            .persist()
        )
        if probe_df.count() <= local_threshold:
            try:
                mapping = _local_components(
                    [(int(r[0]), int(r[1])) for r in probe_df.collect()]
                )
            finally:
                probe_df.unpersist()
            if not mapping:
                return base
            spark = nodes.sparkSession
            lbl = spark.createDataFrame(
                list(mapping.items()), "doc_id long, _lbl long"
            )
            return (
                base.select("doc_id")
                .join(F.broadcast(lbl), "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce(F.col("_lbl"), F.col("doc_id")).alias(
                        "cluster_id"
                    ),
                )
            )
    if probe_df is not None:
        # over budget: reuse the persisted probe frame — the pair
        # pipeline must not recompute for the loop's edge table
        sym = probe_df.select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    else:
        sym = edges.select(
            F.col("doc_a").cast("long").alias("src"),
            F.col("doc_b").cast("long").alias("dst"),
        )
    sym = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = base.localCheckpoint(eager=True)
    sym = sym.localCheckpoint(eager=True)
    if probe_df is not None:
        probe_df.unpersist()
    prev_sum = labels.agg(
        F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
    ).collect()[0]["s"]
    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("doc_id").alias("dst"),
                    F.col("cluster_id").alias("nbr_lbl"),
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("nbr_lbl").alias("nbr_lbl"))
        )
        step = (
            labels.join(nbr_min, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("nbr_lbl"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
        )
        # pointer jump: follow the label one hop (labels are node ids,
        # so the lookup join always hits; coalesce guards the contract)
        parent = step.select(
            F.col("doc_id").alias("cluster_id"),
            F.col("cluster_id").alias("jump_lbl"),
        )
        jumped = step.join(parent, "cluster_id", "left").select(
            "doc_id",
            F.coalesce(F.col("jump_lbl"), F.col("cluster_id")).alias(
                "cluster_id"
            ),
        )
        labels = jumped.localCheckpoint(eager=True)
        cur_sum = labels.agg(
            F.sum(F.col("cluster_id").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(O(log diameter) expected — raise max_iter)"
    )


def duplicate_clusters(
    df: DataFrame,
    n: int = 3,
    k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
    threshold: float = JACCARD_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """End-to-end fuzzy-dedup cluster assignment: MinHash-LSH verified
    pairs -> connected components -> ``(doc_id, cluster_id)`` for EVERY
    document (``cluster_id`` = min doc_id of the duplicate cluster;
    singletons map to themselves). ``cluster_dedup_corpus`` keeps one
    representative per cluster — the final stage of the standard
    pretraining dedup pipeline (transitive closure matters: A~B and
    B~C dedups {A,B,C} even when A~C is below threshold)."""
    pairs = minhash_lsh_pairs(df, n, k, bands, threshold, text_col)
    nodes = df.select(F.col("doc_id").cast("long").alias("doc_id"))
    return connected_components(nodes, pairs.select("doc_a", "doc_b"))


def cluster_dedup_corpus(
    df: DataFrame,
    clusters: DataFrame,
) -> DataFrame:
    """Keep exactly one document (the min-doc_id representative) per
    duplicate cluster: broadcast-free equi-join of the corpus with its
    cluster assignment, filtered to ``doc_id == cluster_id``."""
    keep = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    return df.join(keep, df["doc_id"].cast("long") == keep["doc_id"]).drop(
        keep["doc_id"]
    )


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracles
# ---------------------------------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


_SHINGLES_CTE = """
t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, string_split(text, ' ') AS toks
      FROM documents),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i.i:i.i+2], ' ') AS shingle
  FROM t, LATERAL (SELECT unnest(range(1, greatest(len(toks) - 2, 1) + 1)) AS i) i
),
sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT doc_a, doc_b,
         round(CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i), 9) AS jaccard
  FROM inter
  JOIN sz sa ON sa.doc_id = doc_a
  JOIN sz sb ON sb.doc_id = doc_b
)
"""

register(
    "dedup_exact",
    lambda spark, sf_dir: exact_dup_groups(_docs(spark, sf_dir)),
    """
SELECT sha256(text) AS content_sha256,
       min(CAST(doc_id AS BIGINT)) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
""",
)

register(
    "dedup_token_fingerprint",
    lambda spark, sf_dir: token_fingerprint_groups(_docs(spark, sf_dir)),
    """
SELECT md5(array_to_string(list_sort(string_split(text, ' ')), ' '))
         AS token_fingerprint,
       min(CAST(doc_id AS BIGINT)) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM documents GROUP BY 1
""",
)

register(
    "dedup_ngram_jaccard",
    lambda spark, sf_dir: ngram_jaccard_pairs(_docs(spark, sf_dir)),
    f"WITH {_SHINGLES_CTE} SELECT doc_a, doc_b, jaccard FROM jac "
    f"WHERE jaccard >= {JACCARD_THRESHOLD}",
)

def minhash_ctes_sql(k: int = MINHASH_K, bands: int = MINHASH_BANDS) -> str:
    """DuckDB CTEs reproducing ``minhash_signatures`` + banding at any
    (k, bands); expects the ``sh`` shingle CTE in scope. Embeds the
    same affine universal-hash family (a_i, b_i, p) as literals."""
    if k % bands:
        raise ValueError(f"bands must divide k (got k={k}, bands={bands})")
    rows_per_band = k // bands
    values = ", ".join(
        f"({i}, {a}, {b})" for i, (a, b) in enumerate(_affine_params(k))
    )
    return f"""
hp(hash_idx, a, b) AS (VALUES {values}),
hs AS (
  SELECT sh.doc_id, hp.hash_idx,
         min((hp.a * ({portable_hash_sql("sh.shingle")} % {MINHASH_PRIME})
              + hp.b) % {MINHASH_PRIME}) AS minhash
  FROM sh CROSS JOIN hp
  GROUP BY sh.doc_id, hp.hash_idx
),
bandsig AS (
  SELECT doc_id, hash_idx // {rows_per_band} AS band,
         md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY hash_idx))
           AS band_key
  FROM hs GROUP BY doc_id, hash_idx // {rows_per_band}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bandsig a
  JOIN bandsig b ON a.band = b.band AND a.band_key = b.band_key
                AND a.doc_id < b.doc_id
)
"""


_MINHASH_CTES = minhash_ctes_sql()

register(
    "dedup_minhash_lsh",
    lambda spark, sf_dir: minhash_lsh_pairs(_docs(spark, sf_dir)),
    f"""
WITH {_SHINGLES_CTE}, {_MINHASH_CTES}
SELECT c.doc_a, c.doc_b, j.jaccard
FROM cands c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
WHERE j.jaccard >= {JACCARD_THRESHOLD}
""",
)

# deterministic gate split: eval = doc_id % 10 == 3 (6 planted near-dup
# pairs cross this split at sf0.01 — a non-trivial contamination set)
_EVAL_MOD, _EVAL_REM = 10, 3


def _q_decontaminate(spark, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    evalset = docs.filter(F.col("doc_id") % _EVAL_MOD == _EVAL_REM)
    train = docs.filter(F.col("doc_id") % _EVAL_MOD != _EVAL_REM)
    return cross_corpus_contamination(train, evalset)


def _q_decontaminate_13gram(spark, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    evalset = docs.filter(F.col("doc_id") % _EVAL_MOD == _EVAL_REM)
    train = docs.filter(F.col("doc_id") % _EVAL_MOD != _EVAL_REM)
    return ngram_collision_pairs(train, evalset, n=13)


register(
    "decontaminate_13gram",
    _q_decontaminate_13gram,
    f"""
WITH t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
                  string_split(text, ' ') AS toks
           FROM documents),
sh13 AS (
  SELECT DISTINCT doc_id, array_to_string(toks[i.i:i.i+12], ' ') AS shingle
  FROM t, LATERAL (SELECT unnest(range(1, len(toks) - 12 + 1)) AS i) i
  WHERE len(toks) >= 13
)
SELECT a.doc_id AS train_doc_id, b.doc_id AS eval_doc_id,
       CAST(count(*) AS BIGINT) AS n_collisions
FROM sh13 a JOIN sh13 b ON a.shingle = b.shingle
WHERE a.doc_id % {_EVAL_MOD} <> {_EVAL_REM}
  AND b.doc_id % {_EVAL_MOD} = {_EVAL_REM}
GROUP BY 1, 2
""",
)


register(
    "decontaminate_train",
    _q_decontaminate,
    f"""
WITH {_SHINGLES_CTE}, {_MINHASH_CTES},
xc AS (
  SELECT DISTINCT a.doc_id AS train_doc_id, b.doc_id AS eval_doc_id
  FROM bandsig a
  JOIN bandsig b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id % {_EVAL_MOD} <> {_EVAL_REM}
    AND b.doc_id % {_EVAL_MOD} = {_EVAL_REM}
),
xinter AS (
  SELECT c.train_doc_id, c.eval_doc_id, count(*) AS i
  FROM xc c
  JOIN sh a ON a.doc_id = c.train_doc_id
  JOIN sh b ON b.doc_id = c.eval_doc_id AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT train_doc_id, eval_doc_id,
       round(CAST(i AS DOUBLE) / (st.n_sh + se.n_sh - i), {ROUND}) AS jaccard
FROM xinter
JOIN sz st ON st.doc_id = train_doc_id
JOIN sz se ON se.doc_id = eval_doc_id
WHERE round(CAST(i AS DOUBLE) / (st.n_sh + se.n_sh - i), {ROUND})
      >= {JACCARD_THRESHOLD}
""",
)

_SIMHASH_CTES = f"""
tok AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf,
         {portable_hash_sql("token")} AS h
  FROM tok GROUP BY doc_id, token
),
bits AS (
  SELECT doc_id, j.j,
         sum(tf * (((h >> CAST(j.j AS INT)) & 1) * 2 - 1)) AS s
  FROM tf, LATERAL (SELECT unnest(range(0, {SIMHASH_BITS})) AS j) j
  GROUP BY doc_id, j.j
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::BIGINT << CAST(j AS INT))
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
),
banded AS (
  SELECT doc_id, simhash, b.b AS band,
         (simhash >> (CAST(b.b AS INT) * {SIMHASH_BITS // SIMHASH_BANDS}))
           & {(1 << (SIMHASH_BITS // SIMHASH_BANDS)) - 1} AS band_val
  FROM sig, LATERAL (SELECT unnest(range(0, {SIMHASH_BANDS})) AS b) b
),
scands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sa, b.simhash AS sb
  FROM banded a
  JOIN banded b ON a.band = b.band AND a.band_val = b.band_val
               AND a.doc_id < b.doc_id
)
"""

register(
    "dedup_simhash",
    lambda spark, sf_dir: simhash_pairs(_docs(spark, sf_dir)),
    f"""
WITH {_SIMHASH_CTES}
SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM scands
WHERE bit_count(xor(sa, sb)) <= {SIMHASH_MAX_HAMMING}
""",
)


def _q_dedup_clusters(spark, sf_dir: str) -> DataFrame:
    return duplicate_clusters(_docs(spark, sf_dir))


register(
    "dedup_clusters",
    _q_dedup_clusters,
    f"""
WITH RECURSIVE {_SHINGLES_CTE}, {_MINHASH_CTES},
vpairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cands c JOIN jac j ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
  WHERE j.jaccard >= {JACCARD_THRESHOLD}
),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM vpairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM vpairs
),
nodes AS (SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents),
reach(doc_id, r) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT s.src, reach.r FROM sym s JOIN reach ON reach.doc_id = s.dst
)
SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id
""",
)


_SPAN_N = 13

_SPANS_SQL = f"""
t AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
             string_split(text, ' ') AS toks
      FROM documents),
occ AS (
  SELECT doc_id, i.i - 1 AS pos0,
         array_to_string(toks[i.i:i.i + {_SPAN_N - 1}], ' ') AS gram
  FROM t, LATERAL (
    SELECT unnest(range(1, len(toks) - {_SPAN_N} + 2)) AS i) i
  WHERE len(toks) >= {_SPAN_N}
),
marked AS (
  SELECT doc_id, pos0 AS s, pos0 + {_SPAN_N} - 1 AS e
  FROM (SELECT doc_id, pos0,
               count(*) OVER (PARTITION BY gram) AS cnt,
               row_number() OVER (
                 PARTITION BY gram ORDER BY doc_id, pos0) AS rn
        FROM occ)
  WHERE cnt > 1 AND rn > 1
),
isl AS (
  SELECT doc_id, s, e,
         CASE WHEN s > coalesce(max(e) OVER (
                PARTITION BY doc_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS brk
  FROM marked
),
grp AS (
  SELECT doc_id, s, e,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY s, e) AS island
  FROM isl
),
spans AS (
  SELECT doc_id, CAST(min(s) AS BIGINT) AS span_start,
         CAST(max(e) AS BIGINT) AS span_end,
         CAST(max(e) - min(s) + 1 AS BIGINT) AS n_tokens
  FROM grp GROUP BY doc_id, island
)"""


register(
    "substring_dup_spans",
    lambda spark, sf_dir: duplicated_spans(_docs(spark, sf_dir), n=_SPAN_N),
    f"""
WITH {_SPANS_SQL}
SELECT doc_id, span_start, span_end, n_tokens FROM spans
""",
)

register(
    "substring_dedup_corpus",
    lambda spark, sf_dir: substring_dedup_corpus(
        _docs(spark, sf_dir), n=_SPAN_N
    ),
    f"""
WITH {_SPANS_SQL},
pos AS (
  SELECT doc_id, p.i AS i, toks[p.i] AS tok
  FROM t, LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) p
),
kept AS (
  SELECT p.doc_id, p.i, p.tok
  FROM pos p
  WHERE NOT EXISTS (
    SELECT 1 FROM spans s
    WHERE s.doc_id = p.doc_id
      AND p.i - 1 BETWEEN s.span_start AND s.span_end)
),
agg AS (
  SELECT doc_id,
         coalesce(array_to_string(list(tok ORDER BY i), ' '), '') AS text,
         CAST(count(*) AS BIGINT) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(a.text, '') AS text,
       CAST(len(t.toks) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed
FROM t LEFT JOIN agg a ON a.doc_id = t.doc_id
""",
)
