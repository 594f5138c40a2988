"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Pure seeded generation — byte-stable across runs, so sha256(content)
is a stable per-row invariant. Exercises: camelCase identifiers, URLs,
HTML-ish strings, stopwords, repeated-char runs, >64-char tokens,
digits/punctuation, empty/blank contents, and a heavy-skew boilerplate
term present in nearly every file.
"""

from __future__ import annotations

import random

LANGS = ["py", "java", "c", "md", "go"]

_WORDS = [
    "parse", "token", "index", "merge", "shuffle", "partition", "query",
    "score", "ranking", "document", "compress", "encode", "decode",
    "buffer", "stream", "vector", "matrix", "kernel", "thread", "lock",
    "cache", "flush", "commit", "rollback", "schema", "column", "filter",
]
_CAMEL = [
    "getUserName", "parseHtmlDocument", "MaxScoreEvaluator", "readFileFully",
    "toLowerCase", "OnlyCamelCase", "httpRequestHandler", "BM25Scorer",
]
_STOPWORDY = "this is the of and to in that it with as for was on are"
_NOISE = [
    "https://www.example.com/path?q=1",
    "<div class='x'>markup</div>",
    "soooo coool!!!",
    "x" * 80,
    "1234 5678 9.81",
    "foo123bar",
]
BOILERPLATE = "licenseboilerplate"


def make_corpus(n_docs: int, seed: int = 42) -> list[dict]:
    """Rows of the north-star input shape (repo, path, commit, lang,
    content). Deterministic in (n_docs, seed)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        repo = f"org/project-{i % max(2, n_docs // 20)}"
        path = f"src/module_{i % 7}/file_{i}.{rng.choice(LANGS)}"
        commit = "".join(rng.choice("0123456789abcdef") for _ in range(40))
        lang = path.rsplit(".", 1)[1]
        if i % 53 == 51:
            content = ""           # empty doc -> no docid
        elif i % 53 == 52:
            content = "  \t\n 42 "  # blank after cleaning -> [""] token
        else:
            parts = []
            if i % 3 != 0:
                parts.append(BOILERPLATE)  # skew term in ~2/3 of docs
            for _ in range(rng.randint(3, 40)):
                r = rng.random()
                if r < 0.55:
                    parts.append(rng.choice(_WORDS))
                elif r < 0.7:
                    parts.append(rng.choice(_CAMEL))
                elif r < 0.85:
                    parts.append(rng.choice(_STOPWORDY.split()))
                else:
                    parts.append(rng.choice(_NOISE))
            content = " ".join(parts)
        rows.append(
            {"repo": repo, "path": path, "commit": commit, "lang": lang,
             "content": content}
        )
    return rows


def corpus_queries() -> list[tuple[str, str]]:
    """(qid, text) query set mirroring the reference harness format
    (QueryPerformancesMain.java:92-98)."""
    qs = [
        "parse token index",
        "merge shuffle",
        "MaxScoreEvaluator ranking",
        "document score",
        "licenseboilerplate query",          # skew term
        "compress encode decode buffer",
        "getUserName",                        # camelCase
        "https://www.example.com/path?q=1",  # URL-only -> empty after clean
        "to be or not to be",                # stopword-only
        "zzzunknownterm",                     # absent from corpus
        "zzzunknownterm parse",               # mixed absent/present
        "kernel thread lock cache",
        "flush commit rollback",
        "schema column filter",
        "soooo coool",
        "vector matrix",
        "this is the query of documents",
        "foo123bar",
        "index",
        "x" * 80,
    ]
    return [(f"q{i+1}", t) for i, t in enumerate(qs)]
