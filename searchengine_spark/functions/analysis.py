"""Text-analysis chain: clean -> tokenize -> [stopword-remove -> stem].

Re-expresses the reference's preprocessing contract
(/root/reference/common/.../preprocess/Preprocesser.java) in vectorized
form. Order matters and is part of the contract
(Preprocesser.java:190-211):

1. ``clean_text``  (Preprocesser.java:125-147): each of {URL match, HTML
   tag, non-``[a-zA-Z ]`` char} is replaced with a SINGLE SPACE (the
   Java ``"\\s"`` string literal is a space character), then 3+ repeated
   chars collapse to 2, multi-space collapses, trim. Replacing digits/
   punctuation with a space (not deleting) introduces token boundaries:
   ``foo123bar`` -> ``foo bar`` (two tokens).
2. ``tokenize``    (Preprocesser.java:97-117): split on a literal space,
   split camelCase boundaries ``(?<=[a-z])(?=[A-Z])``, truncate each
   token to 64 chars, lowercase. ``"" -> [""]`` (Java split semantics).
3. ``remove_stopwords`` (Preprocesser.java:154-167): drop the 683-word
   list (stopwords.txt) and tokens longer than 64 chars.
4. ``stem_tokens`` (Preprocesser.java:174-182): classic Porter.

Non-ASCII stripping (``[^\\x00-\\x7F]`` -> "" , Spimi.java:255) is
applied to document payloads AND queries before the chain.

Two surfaces:

* Pure-Python functions — the oracle / unit-test path.
* Spark column-expression builders (``tokens_col``) that keep the whole
  chain JVM-side (regexp_replace / split / transform / filter, all
  whole-stage-codegen'd); only Porter stemming crosses into an
  Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .porter import stem

MAX_TOKEN_LEN = 64  # Preprocesser.java:70; VocabularyEntry.TERM_SIZE

# Patterns shared verbatim between Python `re` and Spark (Java regex) —
# both dialects parse these identically (Preprocesser.java:24-49).
URL_PATTERN = (
    r"[(http(s)?):\/\/(www\.)?a-zA-Z0-9@:%._\+~#=]{2,256}"
    r"\.[a-z]{2,6}\b([-a-zA-Z0-9@:%_\+.~#?&\/\/=]*)"
)
HTML_PATTERN = r"<[^>]+>"
NON_LETTER_PATTERN = r"[^a-zA-Z ]"
REPEAT3_PATTERN = r"(.)\1{2,}"
MULTISPACE_PATTERN = r" +"
CAMEL_PATTERN = r"(?<=[a-z])(?=[A-Z])"
NON_ASCII_PATTERN = r"[^\x00-\x7F]"

_URL_RE = re.compile(URL_PATTERN)
_HTML_RE = re.compile(HTML_PATTERN)
_NON_LETTER_RE = re.compile(NON_LETTER_PATTERN)
_REPEAT3_RE = re.compile(REPEAT3_PATTERN)
_MULTISPACE_RE = re.compile(MULTISPACE_PATTERN)
_CAMEL_RE = re.compile(CAMEL_PATTERN)
_NON_ASCII_RE = re.compile(NON_ASCII_PATTERN)


@lru_cache(maxsize=1)
def stopwords() -> frozenset[str]:
    """The reference's 683-word stopword list (config/stopwords.txt).

    Loaded through ``importlib.resources`` so it resolves inside a
    ``spark-submit --py-files searchengine_spark.zip`` deployment,
    where ``__file__`` points INTO the zip and plain ``Path.read_text``
    raises NotADirectoryError on every executor."""
    from importlib import resources

    text = (
        resources.files(__package__).joinpath("stopwords.txt").read_text()
    )
    return frozenset(w for w in text.splitlines() if w)


def strip_non_ascii(text: str) -> str:
    """Spimi.java:255 — applied to document payloads and queries."""
    return _NON_ASCII_RE.sub("", text)


def clean_text(text: str) -> str:
    text = _URL_RE.sub(" ", text)
    text = _HTML_RE.sub(" ", text)
    text = _NON_LETTER_RE.sub(" ", text)
    text = _REPEAT3_RE.sub(r"\1\1", text)
    text = _MULTISPACE_RE.sub(" ", text)
    return text.strip()


def _java_split_space(text: str) -> list[str]:
    """Java ``String.split(" ")`` semantics: trailing empties removed;
    splitting the empty string yields ``[""]``."""
    if text == "":
        return [""]
    parts = text.split(" ")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


def tokenize(text: str) -> list[str]:
    out: list[str] = []
    for tok in _java_split_space(text):
        for sub in _CAMEL_RE.split(tok):
            out.append(sub[:MAX_TOKEN_LEN].lower())
    return out


def remove_stopwords(tokens: list[str]) -> list[str]:
    sw = stopwords()
    return [t for t in tokens if t not in sw and len(t) <= MAX_TOKEN_LEN]


def stem_tokens(tokens: list[str]) -> list[str]:
    return [stem(t) for t in tokens]


def process_text(text: str, stem_stop: bool = True) -> list[str]:
    """Full chain (Preprocesser.processDocument semantics).

    Returns the token list; blank tokens are KEPT (they count toward
    doc length but produce no postings — Spimi.java:264, 282-286).
    """
    tokens = tokenize(clean_text(strip_non_ascii(text)))
    if stem_stop:
        tokens = stem_tokens(remove_stopwords(tokens))
    return tokens


# ---------------------------------------------------------------------------
# Spark-side chain (JVM, whole-stage codegen; Porter via pandas UDF).
# ---------------------------------------------------------------------------


def cleaned_col(text: Column) -> Column:
    """JVM-side strip_non_ascii + clean_text as chained regexp_replace.

    The URL pattern's big bounded char class (``{2,256}``) backtracks
    heavily on letter-only text (~8 ms/doc measured); but it REQUIRES a
    literal ``.`` and the HTML pattern a literal ``<``, so a cheap
    contains() guard skips them with exact semantic equivalence —
    documents without the sentinel character cannot match."""
    c = F.regexp_replace(text, NON_ASCII_PATTERN, "")
    c = F.when(
        F.contains(c, F.lit(".")), F.regexp_replace(c, URL_PATTERN, " ")
    ).otherwise(c)
    c = F.when(
        F.contains(c, F.lit("<")), F.regexp_replace(c, HTML_PATTERN, " ")
    ).otherwise(c)
    c = F.regexp_replace(c, NON_LETTER_PATTERN, " ")
    c = F.regexp_replace(c, REPEAT3_PATTERN, "$1$1")
    c = F.regexp_replace(c, MULTISPACE_PATTERN, " ")
    return F.trim(c)


def raw_tokens_col(text: Column) -> Column:
    """JVM-side tokenize. ``limit=0`` reproduces Java's trailing-empty
    removal; cleaned text has single internal spaces, so this matches
    ``_java_split_space`` exactly (incl. ``"" -> [""]``)."""
    ws = F.split(text, " ", 0)
    camel = F.transform(ws, lambda t: F.split(t, CAMEL_PATTERN, 0))
    flat = F.flatten(camel)
    return F.transform(flat, lambda t: F.lower(F.substring(t, 1, MAX_TOKEN_LEN)))


@F.pandas_udf(T.ArrayType(T.StringType()))
def _stop_stem_udf(series: pd.Series) -> pd.Series:
    """Arrow-batched stopword-remove + Porter stem (the only Python step
    in the chain). Set-membership is O(1) per token — measured ~8x
    faster than a JVM `array_contains` filter against a 683-element
    literal array, which Spark re-materializes per row.

    A per-batch memo dict makes stemming effectively O(distinct tokens)
    — natural-language/code token distributions are heavily repeated.
    """
    sw = stopwords()
    cache: dict[str, str] = {}

    def stop_stem(tokens):
        if tokens is None:  # null text propagates as null (SQL semantics)
            return None
        out = []
        for t in tokens:
            # remove_stopwords semantics (Preprocesser.java:154-167):
            # drop stopwords and >64-char tokens, then Porter-stem
            if t in sw or len(t) > MAX_TOKEN_LEN:
                continue
            s = cache.get(t)
            if s is None:
                s = stem(t)
                cache[t] = s
            out.append(s)
        return out

    return series.map(stop_stem)


def tokens_col(text: Column, stem_stop: bool = True) -> Column:
    """Full analysis chain as ONE column expression: clean + tokenize
    stay JVM-side (whole-stage codegen'd regex/split/transform); with
    ``stem_stop`` the tail crosses into ONE Arrow-batched pandas UDF
    for stopword removal + Porter."""
    toks = raw_tokens_col(cleaned_col(text))
    if not stem_stop:
        return toks
    return _stop_stem_udf(toks)
