"""End-to-end rank-identity: Spark engine vs pure-Python oracle on the
synthetic source-code corpus, plus the reference binary fixture run
through the full Spark query path, plus checkpoint/resume."""

import json
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from searchengine_spark.operators.indexer import (
    IndexConfig,
    InvertedIndex,
    build_index,
    docs_from_code_table,
)
from searchengine_spark.operators.query import top_k
from tests.corpus import corpus_queries, make_corpus
from tests.fixture_loader import load_fixture_index
from tests.oracle import PyIndex

N_DOCS = 300


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    rows = make_corpus(N_DOCS)
    docs = spark.createDataFrame(rows)
    idx_dir = str(tmp_path_factory.mktemp("index") / "idx")
    index = build_index(
        docs_from_code_table(docs), idx_dir,
        IndexConfig(stem_stop=True, compression=True),
    )
    # oracle over the same (pid, content) pairs
    pid_content = [
        (r["pid"], r["content"])
        for r in docs_from_code_table(docs).collect()
    ]
    oracle = PyIndex.from_docs(pid_content, stem_stop=True)
    return index, oracle


def test_collection_stats_match(built):
    index, oracle = built
    assert index.stats["n_docs"] == oracle.n_docs
    assert index.stats["total_doc_len"] == oracle.total_doc_len
    assert index.stats["n_terms"] == len(oracle.postings)


def test_doc_stats_match(built):
    index, oracle = built
    rows = index.doc_stats.collect()
    assert len(rows) == oracle.n_docs
    for r in rows:
        assert oracle.doc_len[r["docid"]] == r["doc_len"]
        assert oracle.pid_of[r["docid"]] == r["pid"]


def test_postings_match(built):
    index, oracle = built
    got = {}
    for r in index.postings.collect():
        got.setdefault(r["term"], []).append((r["docid"], r["tf"]))
    got = {t: sorted(pl) for t, pl in got.items()}
    assert got == oracle.postings


def test_lexicon_matches_oracle_exactly(built):
    index, oracle = built
    for r in index.lexicon.collect():
        want = oracle.lexicon_entry(r["term"])
        for key in ("df", "max_tf", "bm25_tf", "bm25_dl"):
            assert r[key] == want[key], (r["term"], key)
        for key in ("idf", "tub_tfidf", "tub_bm25"):
            assert r[key] == want[key], (r["term"], key)  # bit-exact doubles


def test_block_law(built):
    index, _ = built
    import math
    lex = {r["term"]: r for r in index.lexicon.collect()}
    blocks = {}
    for r in index.blocks.collect():
        blocks.setdefault(r["term"], []).append(r)
    for term, e in lex.items():
        want_blocks = math.ceil(math.sqrt(e["df"])) if e["df"] >= 1024 else 1
        assert e["num_blocks"] == want_blocks, term
        assert len(blocks[term]) <= want_blocks  # last block may be short
        n = sum(b["num_postings"] for b in blocks[term])
        assert n == e["df"], term


def test_sha256_lineage(built, spark):
    index, _ = built
    # per-row invariant: content sha256 carried end-to-end
    rows = make_corpus(N_DOCS)
    import hashlib
    by_pid = {}
    for r in rows:
        pid = f"{r['repo']}/{r['path']}@{r['commit']}"[:64]
        by_pid[pid] = hashlib.sha256(r["content"].encode()).hexdigest()
    for r in index.doc_stats.collect():
        assert r["content_sha256"] == by_pid[r["pid"]], r["pid"]


def test_packed_postings_roundtrip(built):
    from searchengine_spark.functions.codecs import gaps_decode, unary_decode, vb_decode

    index, oracle = built
    packed = index.postings_packed.collect()
    got: dict[str, list[tuple[int, int]]] = {}
    for r in sorted(packed, key=lambda r: (r["term"], r["block_id"])):
        docids = gaps_decode(vb_decode(bytes(r["docids_vb"]), r["num_postings"]))
        tfs = unary_decode(bytes(r["tfs_unary"]), r["num_postings"])
        assert int(docids.max()) == r["max_docid"]
        got.setdefault(r["term"], []).extend(zip(docids.tolist(), tfs.tolist()))
    assert {t: sorted(pl) for t, pl in got.items()} == oracle.postings


@pytest.mark.parametrize("scoring", ["bm25", "tfidf"])
@pytest.mark.parametrize("conjunctive", [False, True])
def test_query_rank_identity(built, scoring, conjunctive):
    index, oracle = built
    for qid, text in corpus_queries():
        for k in (10, 100):
            got = [
                (r["docid"], r["pid"], r["score"])
                for r in top_k(index, text, k=k, conjunctive=conjunctive,
                               scoring=scoring).collect()
            ]
            want = oracle.top_k(text, k=k, conjunctive=conjunctive,
                                scoring=scoring)
            assert got == want, (qid, text, scoring, conjunctive, k)


def test_fixture_through_spark_engine(spark, tmp_path):
    """Reference binary fixture -> parquet index -> Spark top_k must
    reproduce QueryProcesserTest's exact golden doubles."""
    s = load_fixture_index()
    root = Path(tmp_path) / "fixidx"
    root.mkdir()
    doc_rows = [
        (d, s["pid_of"][d], dl, "") for d, dl in s["doc_len"].items()
    ]
    spark.createDataFrame(
        doc_rows, "docid long, pid string, doc_len int, content_sha256 string"
    ).write.parquet(str(root / "doc_stats"))
    post_rows = [
        (t, d, tf, s["doc_len"][d], 0)
        for t, pl in s["postings"].items()
        for d, tf in pl
    ]
    spark.createDataFrame(
        post_rows, "term string, docid long, tf int, doc_len int, block_id long"
    ).write.parquet(str(root / "postings"))
    lex_rows = [
        (t, e["df"], e["idf"]) for t, e in s["lexicon"].items()
    ]
    spark.createDataFrame(
        lex_rows, "term string, df long, idf double"
    ).write.parquet(str(root / "lexicon"))
    manifest = {
        "flags": {"stem_stop": False, "compression": False},
        "stats": {"n_docs": 8, "total_doc_len": 61, "avg_doc_len": 61 / 8,
                  "n_terms": len(s["lexicon"])},
        "stages": {},
    }
    (root / "manifest.json").write_text(json.dumps(manifest))
    index = InvertedIndex.load(spark, str(root))

    def run(text, conj, scoring, k=3):
        return {
            (r["score"], r["docid"])
            for r in top_k(index, text, k=k, conjunctive=conj,
                           scoring=scoring).collect()
        }

    assert run("another example", True, "bm25") == {
        (0.38158664142011345, 2), (0.2582940702253402, 8),
    }
    assert run("another example", False, "bm25") == {
        (0.38158664142011345, 2), (0.2582940702253402, 8),
        (0.1123005090598549, 3),
    }
    assert run("example", False, "bm25") == {
        (0.1123005090598549, 3), (0.09661547190697509, 2),
        (0.09030875025937561, 5),
    }
    assert run("simple example", True, "bm25") == set()
    assert run("another example", True, "tfidf") == {
        (0.9874180905628003, 8), (0.8061799739838872, 2),
    }
    assert run("another example", False, "tfidf") == {
        (0.9874180905628003, 8), (0.8061799739838872, 2),
        (0.30150996489407533, 6),
    }


def test_resume_skips_completed_stages(spark, tmp_path):
    rows = make_corpus(60)
    docs = docs_from_code_table(spark.createDataFrame(rows))
    idx_dir = str(tmp_path / "idx")
    cfg = IndexConfig(stem_stop=True, compression=True)
    index1 = build_index(docs, idx_dir, cfg)
    before = {r["term"]: (r["df"], r["idf"]) for r in index1.lexicon.collect()}
    # simulate a crash after stage 2: wipe final outputs, keep stages 1-2
    import shutil
    for stage in ("postings", "lexicon", "blocks", "postings_packed", "term_df"):
        shutil.rmtree(Path(idx_dir) / stage, ignore_errors=True)
    index2 = build_index(docs, idx_dir, cfg)
    after = {r["term"]: (r["df"], r["idf"]) for r in index2.lexicon.collect()}
    assert before == after
    manifest = json.loads((Path(idx_dir) / "manifest.json").read_text())
    assert manifest["stats"]["n_docs"] == index1.stats["n_docs"]


def test_flag_mismatch_on_resume_rejected(spark, tmp_path):
    rows = make_corpus(20)
    docs = docs_from_code_table(spark.createDataFrame(rows))
    idx_dir = str(tmp_path / "idx")
    build_index(docs, idx_dir, IndexConfig(stem_stop=True))
    with pytest.raises(ValueError, match="flags mismatch"):
        build_index(docs, idx_dir, IndexConfig(stem_stop=False))
    # all three persisted flags participate (Flags.java:11-55)
    with pytest.raises(ValueError, match="flags mismatch"):
        build_index(docs, idx_dir, IndexConfig(stem_stop=True, max_score=False))
