"""End-to-end tests for the CLI, sinks, packaging, and streaming
incremental indexing."""

from __future__ import annotations

import glob
import zipfile

import pytest

from searchengine_spark import cli


@pytest.fixture(scope="module")
def built(tmp_path_factory, spark):
    """Build a real on-disk index from sf0.001 documents via the CLI."""
    root = tmp_path_factory.mktemp("cliidx")
    rc = cli.main(
        [
            "build",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--index-dir", str(root / "idx"),
            "--positions",
            "--fields",
            "--spellings",
            "--overwrite",
        ]
    )
    assert rc == 0
    return root / "idx"


def test_cli_build_artifacts(built):
    assert (built / "manifest.json").exists()
    assert (built / "indexerStatistics.tsv").exists()
    for sub in ("doc_stats", "postings", "lexicon", "blocks",
                "postings_packed", "positions_packed", "field_postings",
                "spellings"):
        assert (built / sub / "_SUCCESS").exists(), sub


def test_cli_query(built, capsys):
    rc = cli.main(["query", "--index-dir", str(built), "spark join", "-k", "5"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "results in" in out


def test_cli_query_maxscore_matches(built, capsys):
    cli.main(["query", "--index-dir", str(built), "table scan fast", "-k", "5"])
    daat = capsys.readouterr().out.splitlines()[:-1]
    cli.main(["query", "--index-dir", str(built), "table scan fast", "-k", "5",
              "--maxscore"])
    ms = capsys.readouterr().out.splitlines()[:-1]
    assert daat == ms and len(daat) == 5


def test_cli_query_bmw_matches(built, capsys):
    """--bmw (Block-Max WAND) is rank-identical to exact DAAT."""
    cli.main(["query", "--index-dir", str(built), "table scan fast", "-k", "5"])
    daat = capsys.readouterr().out.splitlines()[:-1]
    cli.main(["query", "--index-dir", str(built), "table scan fast", "-k", "5",
              "--bmw"])
    bmw = capsys.readouterr().out.splitlines()[:-1]
    assert daat == bmw and len(bmw) == 5


def test_cli_query_correct(built, spark, capsys):
    """--correct fixes a one-edit typo of the highest-df vocabulary
    term and then serves the corrected query; combining with a pruning
    evaluator is rejected."""
    import pytest

    from searchengine_spark.operators.indexer import InvertedIndex
    from pyspark.sql import functions as F

    idx = InvertedIndex.load(spark, str(built))
    top = idx.lexicon.orderBy(F.col("df").desc(), "term").first()["term"]
    typo = top + "q"
    rc = cli.main(["query", "--index-dir", str(built), typo, "-k", "3",
                   "--correct"])
    assert rc == 0
    out = capsys.readouterr().out
    assert f"# corrected '{typo}' -> '{top}'" in out
    assert "results in" in out

    with pytest.raises(SystemExit, match="--correct"):
        cli.main(["query", "--index-dir", str(built), typo, "--correct",
                  "--maxscore"])

    # collision: the true term AND its typo correct to ONE vocab term —
    # must dedupe (not double-count partials) and equal the plain query
    cli.main(["query", "--index-dir", str(built), top, "-k", "3"])
    want = capsys.readouterr().out.splitlines()[:-1]
    rc = cli.main(["query", "--index-dir", str(built), f"{top} {typo}",
                   "-k", "3", "--correct"])
    assert rc == 0
    out_lines = capsys.readouterr().out.splitlines()
    got = [ln for ln in out_lines if "\t" in ln]
    assert got == want


def test_cli_query_bmw_conjunctive_rejected(built):
    with pytest.raises(SystemExit):
        cli.main(["query", "--index-dir", str(built), "table scan",
                  "--bmw", "--conjunctive"])


def test_cli_query_contradictory_flag_combos_rejected(built):
    """--blockmax without --maxscore (it would silently run plain DAAT)
    and --bmw with --maxscore (two different pruning strategies) are
    rejected instead of silently picking one."""
    with pytest.raises(SystemExit):
        cli.main(["query", "--index-dir", str(built), "table scan",
                  "--blockmax"])
    with pytest.raises(SystemExit):
        cli.main(["query", "--index-dir", str(built), "table scan",
                  "--bmw", "--maxscore"])


def test_cli_query_blockmax_matches(built, capsys):
    """--maxscore --blockmax (BMM bailouts over stored blocks/ bounds)
    is rank-identical to exact DAAT."""
    cli.main(["query", "--index-dir", str(built), "spark join fast", "-k", "5"])
    daat = capsys.readouterr().out.splitlines()[:-1]
    cli.main(["query", "--index-dir", str(built), "spark join fast", "-k", "5",
              "--maxscore", "--blockmax"])
    bmm = capsys.readouterr().out.splitlines()[:-1]
    assert daat == bmm and len(bmm) == 5


def test_cli_query_prf_matches_relational(built, capsys, spark):
    """`query --prf` (warm PRF composition) prints the same page as the
    relational prf_top_k; contradictory flag combos are rejected."""
    from searchengine_spark.operators.indexer import InvertedIndex
    from searchengine_spark.operators.query import prf_top_k

    rc = cli.main(["query", "--index-dir", str(built), "spark join",
                   "-k", "5", "--prf", "--fb-docs", "3", "--fb-terms", "2"])
    assert rc == 0
    page = capsys.readouterr().out.splitlines()[:-1]
    idx = InvertedIndex.load(spark, str(built))
    want = [
        f"{r['pid']}\t{r['score']:.10f}"
        for r in prf_top_k(idx, "spark join", k=5,
                           fb_docs=3, fb_terms=2).collect()
    ]
    assert page == want and len(page) == 5

    for combo in (["--prf", "--bmw"], ["--prf", "--blockmax"],
                  ["--prf", "--conjunctive"]):
        with pytest.raises(SystemExit):
            cli.main(["query", "--index-dir", str(built), "spark join",
                      *combo])


def test_cli_optimize_idempotent_on_full_build(built, capsys):
    """`optimize` wiring: on an already-complete compression build every
    per-artifact resume check hits, so the command is a cheap no-op that
    reports zero optimize stages and leaves the index servable."""
    rc = cli.main(["optimize", "--index-dir", str(built)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "optimized index in" in out
    rc = cli.main(["query", "--index-dir", str(built), "spark join",
                   "-k", "3", "--maxscore", "--blockmax"])
    assert rc == 0


def test_cli_repl_directives(built, tmp_path, capsys):
    """repl session over --input: every pruning strategy directive
    (:algo bmw, :blockmax on, :maxscore off -> relational DAAT) returns
    rank-identical pages; the rejected bmw+conj combination reports and
    continues instead of killing the session."""
    import re

    qfile = tmp_path / "session.txt"
    qfile.write_text(
        "table scan fast\n"
        ":algo bmw\n"
        "table scan fast\n"
        ":blockmax on\n"
        ":algo maxscore\n"
        "table scan fast\n"
        ":conj on\n"
        ":algo bmw\n"
        "table scan fast\n"
        ":conj off\n"
        ":maxscore off\n"
        "table scan fast\n"
        ":quit\n"
    )
    rc = cli.main(["repl", "--index-dir", str(built), "-k", "5",
                   "--input", str(qfile)])
    assert rc == 0
    out = capsys.readouterr().out
    pages = re.findall(r"((?:\S+\t\d+\.\d{10}\n)+)\(5 results", out)
    assert len(pages) == 4  # warm ms, bmw, bmm, relational daat
    assert len(set(pages)) == 1  # all strategies rank-identical
    assert "disjunctive-only" in out


def test_cli_repl_correct_directive(built, spark, tmp_path, capsys):
    """repl `:correct on` fixes a typo'd top-df term on the warm path
    AND the relational path (:maxscore off), both rank-identical to
    querying the true term; prf+correct reports and continues."""
    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import InvertedIndex

    idx = InvertedIndex.load(spark, str(built))
    top = idx.lexicon.orderBy(F.col("df").desc(), "term").first()["term"]
    typo = top + "q"
    qfile = tmp_path / "cq.txt"
    qfile.write_text(
        f":correct on\n{typo}\n"
        f"{top} {typo}\n"          # collision: both correct to `top`
        f":maxscore off\n{typo}\n"
        f":maxscore on\n:prf on\n{typo}\n"
        f":prf off\n:snippets on\n{typo}\n:quit\n"
    )
    rc = cli.main(["repl", "--index-dir", str(built), "-k", "3",
                   "--input", str(qfile), "--docs",
                   "/root/testdata/sf0.001/documents.parquet"])
    assert rc == 0
    out = capsys.readouterr().out
    assert out.count(f"# corrected '{typo}' -> '{top}'") == 3
    import re

    pages = re.findall(r"((?:\S+\t\d+\.\d{10}\n)+)\(3 results", out)
    # warm typo == warm collision (deduped) == relational typo
    assert len(pages) == 3 and len(set(pages)) == 1
    assert ":prf off" in out      # prf+correct rejected, reported
    # snippets+correct rejected BEFORE the snippets branch could rank
    # the raw typo silently
    assert out.count(":prf off / :snippets off first") == 2

    cli.main(["query", "--index-dir", str(built), top, "-k", "3"])
    want = capsys.readouterr().out.splitlines()[:-1]
    assert pages[0].splitlines() == want  # corrected == true-term query


def test_cli_repl_prf_directive(built, tmp_path, capsys):
    """repl `:prf on` answers through the warm PRF composition (same
    page as `query --prf` at default fb knobs); the rejected prf+conj
    combination reports and continues instead of killing the session."""
    import re

    cli.main(["query", "--index-dir", str(built), "spark join", "-k", "5",
              "--prf"])
    want = capsys.readouterr().out.splitlines()[:-1]

    qfile = tmp_path / "prf_session.txt"
    qfile.write_text(
        ":prf on\n"
        "spark join\n"
        ":conj on\n"
        "spark join\n"
        ":quit\n"
    )
    rc = cli.main(["repl", "--index-dir", str(built), "-k", "5",
                   "--input", str(qfile)])
    assert rc == 0
    out = capsys.readouterr().out
    pages = re.findall(r"((?:\S+\t\d+\.\d{10}\n)+)\(5 results", out)
    assert len(pages) == 1 and pages[0].splitlines() == want
    assert ":conj off first" in out


def test_cli_snippets_query_and_repl(built, tmp_path, capsys, spark):
    """`query --snippets --docs` renders the warm results page (same
    rows as search_with_snippets_rows); repl `:snippets on` prints the
    same page; the docs-less repl reports instead of enabling; flag
    combos are rejected."""
    import re

    from searchengine_spark.operators.indexer import InvertedIndex
    from searchengine_spark.operators.phrase import search_with_snippets_rows
    from searchengine_spark.sources.corpus import read_corpus, to_engine_docs

    src = "/root/testdata/sf0.001/documents.parquet"
    rc = cli.main(["query", "--index-dir", str(built), "spark join fast",
                   "-k", "5", "--snippets", "--docs", src])
    assert rc == 0
    page = capsys.readouterr().out.splitlines()[:-1]
    idx = InvertedIndex.load(spark, str(built))
    docs = to_engine_docs(read_corpus(spark, src))
    want = [
        f"{pid}\t{score:.10f}\t{snip or ''}"
        for _, pid, score, _s, _n, snip in search_with_snippets_rows(
            idx, docs, "spark join fast", k=5
        )
    ]
    assert page == want and len(page) == 5
    assert any(ln.split("\t")[2] for ln in page)  # snippets rendered

    with pytest.raises(SystemExit):  # --snippets without --docs
        cli.main(["query", "--index-dir", str(built), "x", "--snippets"])
    with pytest.raises(SystemExit):
        cli.main(["query", "--index-dir", str(built), "x", "--snippets",
                  "--docs", src, "--prf"])

    qfile = tmp_path / "snip_session.txt"
    qfile.write_text(
        ":snippets on\n"
        ":algo bmw\n"
        "spark join fast\n"      # reported: snippets rank via maxscore
        ":algo maxscore\n"
        "spark join fast\n"
        ":quit\n"
    )
    rc = cli.main(["repl", "--index-dir", str(built), "-k", "5",
                   "--input", str(qfile), "--docs", src])
    assert rc == 0
    out = capsys.readouterr().out
    assert ":algo maxscore" in out  # the bmw+snippets combo reported
    body = re.search(r"((?:\S+\t\d+\.\d{10}\t[^\n]*\n)+)\(5 results", out)
    assert body and body.group(1).splitlines() == want

    # docs-less repl: directive reports and serving stays non-snippet
    qfile2 = tmp_path / "snip_less.txt"
    qfile2.write_text(":snippets on\nspark join\n:quit\n")
    rc = cli.main(["repl", "--index-dir", str(built), "-k", "3",
                   "--input", str(qfile2)])
    assert rc == 0
    out2 = capsys.readouterr().out
    assert "--docs" in out2 and "(3 results" in out2


def test_cli_query_snippets_needs_positions(tmp_path, capsys):
    """`query --snippets` on an index built WITHOUT --positions exits
    with the rebuild hint instead of a raw positions-property
    traceback (the repl's guard, applied to the one-shot path)."""
    idx_dir = str(tmp_path / "nopos")
    rc = cli.main(
        ["build", "--input", "/root/testdata/sf0.001/documents.parquet",
         "--index-dir", idx_dir, "--overwrite"]
    )
    assert rc == 0
    with pytest.raises(SystemExit, match="--positions"):
        cli.main(["query", "--index-dir", idx_dir, "spark join",
                  "--snippets", "--docs",
                  "/root/testdata/sf0.001/documents.parquet"])


def test_cli_eval_trec(built, tmp_path, capsys):
    qfile = tmp_path / "queries.tsv"
    qfile.write_text("q1\tspark join\nq2\thash table\n")
    out_dir = tmp_path / "run"
    rc = cli.main(
        ["eval", "--index-dir", str(built), "--queries", str(qfile),
         "--output", str(out_dir), "-k", "5"]
    )
    assert rc == 0
    lines = []
    for p in glob.glob(f"{out_dir}/part-*"):
        lines += open(p).read().splitlines()
    assert len(lines) == 10
    parts = lines[0].split(" ")
    assert len(parts) == 6 and parts[1] == "Q0" and parts[5] == "searchengine_spark"
    ranks = sorted(int(ln.split(" ")[3]) for ln in lines if ln.startswith("q1 "))
    assert ranks == [1, 2, 3, 4, 5]

    # qrels wiring: declare each query's own rank-1 pid relevant ->
    # AP = P@1 = 1 for it, so MAP must print and be positive
    top1 = {
        ln.split(" ")[0]: ln.split(" ")[2]
        for ln in lines
        if ln.split(" ")[3] == "1"
    }
    qrels = tmp_path / "qrels.txt"
    qrels.write_text(
        "".join(f"{qid} 0 {pid} 1\n" for qid, pid in top1.items())
    )
    capsys.readouterr()
    rc = cli.main(
        ["eval", "--index-dir", str(built), "--queries", str(qfile),
         "--output", str(tmp_path / "run2"), "-k", "5",
         "--qrels", str(qrels)]
    )
    out = capsys.readouterr().out
    assert rc == 0 and "MAP=1.0000" in out, out


def test_debug_dumps(built, spark, tmp_path):
    from searchengine_spark.operators.indexer import InvertedIndex
    from searchengine_spark.sources.sinks import write_debug_dumps

    idx = InvertedIndex.load(spark, str(built))
    write_debug_dumps(idx, str(tmp_path))
    assert spark.read.json(str(tmp_path / "lexicon_debug")).count() > 0


def test_package_zip(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "se.zip"
    subprocess.run(
        [sys.executable, "tools/package.py", str(out)], check=True, cwd="/root/repo"
    )
    names = zipfile.ZipFile(out).namelist()
    assert "searchengine_spark/cli.py" in names
    assert "searchengine_spark/functions/stopwords.txt" in names


def test_streaming_ingest_and_compact(spark, tmp_path):
    from searchengine_spark.operators.query import top_k
    from searchengine_spark.streaming.incremental import compact, start_ingest

    src = tmp_path / "src"
    idxd = tmp_path / "sidx"
    batch1 = spark.createDataFrame(
        [("p1", "spark join fast"), ("p2", "hash table")],
        "pid string, content string",
    )
    batch1.write.mode("append").parquet(str(src))
    q = start_ingest(spark, str(src), str(idxd), stem_stop=False)
    q.awaitTermination(120)

    batch2 = spark.createDataFrame(
        [("p3", "spark table scan"), ("p1", "spark join fast updated")],
        "pid string, content string",
    )
    batch2.write.mode("append").parquet(str(src))
    q2 = start_ingest(spark, str(src), str(idxd), stem_stop=False)
    q2.awaitTermination(120)

    idx = compact(spark, str(idxd))
    assert idx.stats["n_docs"] == 3  # p1 superseded, not duplicated
    stats = {r["pid"]: r["doc_len"] for r in idx.doc_stats.collect()}
    assert stats["p1"] == 4  # the batch-2 version won
    hits = [r["pid"] for r in top_k(idx, "spark", k=10).collect()]
    assert set(hits) == {"p1", "p3"}


def test_streaming_ingest_jsonl_landing_zone(spark, tmp_path):
    """JSONL landing-zone ingest: documents arriving as .jsonl files
    stage, compact, and serve exactly like the parquet stream; a
    source_format switch on resume is rejected like any flag
    mismatch."""
    import json as _json

    import pytest

    from searchengine_spark.operators.query import top_k
    from searchengine_spark.streaming.incremental import compact, start_ingest

    src = tmp_path / "landing"
    src.mkdir()
    idxd = tmp_path / "jidx"
    (src / "drop1.jsonl").write_text(
        _json.dumps({"pid": "p1", "content": "spark join fast"}) + "\n"
        + _json.dumps({"pid": "p2", "content": "hash table"}) + "\n"
    )
    # a bad format is rejected BEFORE the manifest write — it must not
    # wedge the dir against the valid ingest that follows
    with pytest.raises(ValueError, match="source_format"):
        start_ingest(spark, str(src), str(idxd), stem_stop=False,
                     source_format="csv")
    q = start_ingest(
        spark, str(src), str(idxd), stem_stop=False, source_format="json"
    )
    q.awaitTermination(120)
    (src / "drop2.jsonl").write_text(
        _json.dumps({"pid": "p3", "content": "spark table scan"}) + "\n"
    )
    q2 = start_ingest(
        spark, str(src), str(idxd), stem_stop=False, source_format="json"
    )
    q2.awaitTermination(120)

    idx = compact(spark, str(idxd))
    assert idx.stats["n_docs"] == 3
    hits = [r["pid"] for r in top_k(idx, "spark", k=10).collect()]
    assert set(hits) == {"p1", "p3"}

    with pytest.raises(ValueError, match="source_format"):
        start_ingest(spark, str(src), str(idxd), stem_stop=False)


def test_corpus_adapter_table_and_schemas(spark):
    from searchengine_spark.sources.corpus import read_corpus, to_engine_docs

    code = spark.createDataFrame(
        [("r1", "src/a.py", "c0ffee", "py", "import spark")],
        "repo string, path string, commit string, lang string, content string",
    )
    code.createOrReplaceTempView("code_files")
    df = to_engine_docs(read_corpus(spark, "code_files"))
    row = df.collect()[0]
    assert row["pid"] == "r1/src/a.py@c0ffee" and row["content"] == "import spark"

    docs = spark.createDataFrame([(3, "hello")], "doc_id long, text string")
    row = to_engine_docs(docs).collect()[0]
    assert row["pid"] == "000000000003"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        to_engine_docs(spark.createDataFrame([(1,)], "x long"))


def test_trec_metrics_hand_computed(spark):
    from searchengine_spark.sources.sinks import trec_metrics

    # q1: relevant docs {a, c}; run ranks a(1) b(2) c(3)
    #   AP = (1/1 + 2/3)/2 = 0.8333...; P@2 = 1/2
    results = spark.createDataFrame(
        [("q1", "a", 3.0), ("q1", "b", 2.0), ("q1", "c", 1.0),
         ("q2", "x", 1.0)],
        "qid string, pid string, score double",
    )
    qrels = spark.createDataFrame(
        [("q1", "a", 1), ("q1", "c", 1), ("q2", "zzz", 1)],
        "qid string, pid string, rel int",
    )
    got = {r["qid"]: (r["ap"], r["p_at_2"]) for r in
           trec_metrics(results, qrels, k=2).collect()}
    assert got["q1"][0] == pytest.approx((1.0 + 2 / 3) / 2, abs=1e-12)
    assert got["q1"][1] == pytest.approx(0.5, abs=1e-12)
    assert got["q2"] == (0.0, 0.0)  # relevant doc never retrieved
