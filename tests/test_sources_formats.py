"""Corpus-source formats beyond the reference's TSV/tar.gz: JSONL
document dumps and raw source-file trees (sources/corpus.py)."""

import gzip
import json

from searchengine_spark.operators.query import top_k
from searchengine_spark.sources.corpus import (
    code_table_from_files,
    read_corpus,
    read_files_corpus,
    to_engine_docs,
)


def _write_jsonl(path, rows, compress=False):
    data = "\n".join(rows) + "\n"
    if compress:
        with gzip.open(path, "wt", encoding="utf-8") as fh:
            fh.write(data)
    else:
        path.write_text(data, encoding="utf-8")


_JSONL_ROWS = [
    json.dumps({"id": "a1", "text": "hello spark world café"}),
    json.dumps({"id": "b2", "text": "spark join fast\ttab kept"}),
    "this line is not json at all {",
    json.dumps({"id": "c3", "text": None}),
    json.dumps({"id": 4, "text": "merge sort batch"}),
]

# unlike the TSV path (which mirrors Spimi.java's read-time non-ASCII
# strip), JSONL content is byte-exact: café keeps its accent, tabs
# survive; corrupt lines and NULL-text rows drop like tab-less lines
_JSONL_EXPECT = [
    ("4", "merge sort batch"),
    ("a1", "hello spark world café"),
    ("b2", "spark join fast\ttab kept"),
]


def test_jsonl_round_trip(spark, tmp_path):
    plain = tmp_path / "dump.jsonl"
    packed = tmp_path / "dump2.jsonl.gz"
    _write_jsonl(plain, _JSONL_ROWS)
    _write_jsonl(packed, _JSONL_ROWS, compress=True)

    for src in (str(plain), str(packed)):
        docs = to_engine_docs(read_corpus(spark, src))
        assert sorted(
            (r["pid"], r["content"]) for r in docs.collect()
        ) == _JSONL_EXPECT, src


def test_jsonl_explicit_schema_skips_inference(spark, tmp_path):
    path = tmp_path / "dump.ndjson"
    _write_jsonl(path, _JSONL_ROWS)
    from searchengine_spark.sources.corpus import read_jsonl_corpus

    docs = to_engine_docs(
        read_jsonl_corpus(spark, str(path), schema="id string, text string")
    )
    assert sorted(
        (r["pid"], r["content"]) for r in docs.collect()
    ) == _JSONL_EXPECT


def test_jsonl_build_and_query(spark, tmp_path):
    from searchengine_spark.operators.indexer import IndexConfig, build_index

    path = tmp_path / "dump.jsonl"
    _write_jsonl(path, _JSONL_ROWS)
    idx = build_index(
        to_engine_docs(read_corpus(spark, str(path))),
        str(tmp_path / "idx"),
        IndexConfig(stem_stop=False, compression=False),
    )
    hits = top_k(idx, "spark fast", k=5).collect()
    assert [r["pid"] for r in hits] == ["b2", "a1"]


def test_files_corpus_tree(spark, tmp_path):
    root = tmp_path / "repos"
    (root / "projA/src").mkdir(parents=True)
    (root / "projB").mkdir()
    (root / "projA/src/main.py").write_text(
        "def hello():\n    return 'spark'\n", encoding="utf-8"
    )
    (root / "projA/README.md").write_text("hello café docs", encoding="utf-8")
    # malformed UTF-8 decodes to U+FFFD replacement chars, not an error
    (root / "projB/blob.bin").write_bytes(b"raw \xff\xfe bytes")

    docs = read_corpus(spark, f"files:{root}")
    rows = {r["pid"].rsplit("/repos/", 1)[1]: r["content"]
            for r in docs.collect()}
    assert set(rows) == {"projA/src/main.py", "projA/README.md",
                         "projB/blob.bin"}
    assert rows["projA/src/main.py"] == "def hello():\n    return 'spark'\n"
    assert rows["projA/README.md"] == "hello café docs"
    assert rows["projB/blob.bin"] == "raw �� bytes"

    only_py = read_files_corpus(spark, str(root), glob="*.py")
    assert [r["pid"].rsplit("/", 1)[1] for r in only_py.collect()] == [
        "main.py"
    ]

    # (pid, content) passes the schema adapter unchanged
    assert to_engine_docs(docs).columns == ["pid", "content"]


def test_jsonl_mixed_type_ids_survive_inference(spark, tmp_path):
    """Full-pass inference merges numeric and string ids to string —
    a sampled inference that saw only numeric ids would type id as
    long and silently NULL (then drop) the string-id rows."""
    path = tmp_path / "mixed.jsonl"
    rows = [json.dumps({"id": i, "text": f"numeric {i}"}) for i in range(50)]
    rows.append(json.dumps({"id": "strX", "text": "string id row"}))
    _write_jsonl(path, rows)
    docs = to_engine_docs(read_corpus(spark, str(path)))
    assert docs.count() == 51
    assert docs.filter("pid = 'strX'").count() == 1


def test_code_table_from_files_uri_root(spark, tmp_path):
    """A file:/// URI root must resolve to the same marker Hadoop puts
    in the binaryFile path column — string heuristics mis-sliced every
    repo/path here before the qualified-Path fix."""
    root = tmp_path / "checkouts"
    (root / "alpha").mkdir(parents=True)
    (root / "alpha/a.py").write_text("print('x')\n")
    table = code_table_from_files(spark, f"file://{root}")
    rows = [(r["repo"], r["path"]) for r in table.collect()]
    assert rows == [("alpha", "a.py")]


def test_code_table_from_files(spark, tmp_path):
    root = tmp_path / "checkouts"
    (root / "alpha/src").mkdir(parents=True)
    (root / "beta").mkdir()
    (root / "alpha/src/lib.rs").write_text("fn main() {}\n")
    (root / "alpha/Makefile").write_text("all:\n\techo hi\n")
    (root / "beta/app.py").write_text("print('hi')\n")
    (root / "stray.md").write_text("# top-level file\n")

    table = code_table_from_files(spark, str(root), commit="abc123")
    assert table.columns == ["repo", "path", "commit", "lang", "content"]
    rows = {(r["repo"], r["path"]): (r["commit"], r["lang"])
            for r in table.collect()}
    assert rows == {
        ("alpha", "src/lib.rs"): ("abc123", "rust"),
        ("alpha", "Makefile"): ("abc123", "text"),
        ("beta", "app.py"): ("abc123", "py"),
        ("", "stray.md"): ("abc123", "md"),
    }

    # feeds the code operators and the engine adapter directly
    from searchengine_spark.operators.codestats import code_file_stats
    from searchengine_spark.operators.indexer import docs_from_code_table

    stats = code_file_stats(table)
    assert stats.filter("repo = 'beta'").count() == 1
    pids = [r["pid"] for r in docs_from_code_table(table).collect()]
    assert "beta/app.py@abc123" in pids
