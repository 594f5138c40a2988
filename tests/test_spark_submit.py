"""Executed evidence for the north rule's deployment clause: the
engine runs via ``spark-submit --py-files searchengine_spark.zip``
with NO repo checkout on the Python path — the zip built by
tools/package.py is the only source of the package, exactly as a
multi-executor cluster submit would ship it.

Builds an index from a ``pid\\ttext`` TSV (the reference's MS MARCO
collection format) in one submit, then serves a query from the
persisted index in a second submit."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)


def _submit_env() -> dict[str, str]:
    env = dict(os.environ)
    # the zip must be the ONLY way to import the package
    env.pop("PYTHONPATH", None)
    env["SPARK_GRAFT_CPUS"] = "2"  # agree with --master local[2]
    env["SPARK_DRIVER_MEM"] = "2g"
    return env


def _submit(args: list[str], cwd: Path) -> subprocess.CompletedProcess:
    cmd = [
        shutil.which("spark-submit"),
        "--master", "local[2]",
        "--conf", "spark.sql.shuffle.partitions=4",
        *args,
    ]
    return subprocess.run(
        cmd, cwd=cwd, env=_submit_env(), capture_output=True, text=True,
        timeout=420,
    )


def test_spark_submit_py_files_build_then_query(tmp_path):
    zip_path = tmp_path / "searchengine_spark.zip"
    subprocess.run(
        [sys.executable, str(REPO / "tools" / "package.py"), str(zip_path)],
        check=True, capture_output=True,
    )
    launcher = tmp_path / "launcher.py"
    assert zip_path.exists() and launcher.exists()

    tsv = tmp_path / "collection.tsv"
    docs = [
        ("0", "spark join fast scan"),
        ("1", "join join merge sort"),
        ("2", "fast scan scan spark spark"),
        ("3", "window agg stream batch"),
        ("4", "hash table scan probe"),
    ]
    tsv.write_text("".join(f"{p}\t{t}\n" for p, t in docs))
    idx_dir = tmp_path / "idx"

    build = _submit(
        ["--py-files", str(zip_path), str(launcher),
         "build", "--input", str(tsv), "--index-dir", str(idx_dir)],
        cwd=tmp_path,
    )
    assert build.returncode == 0, build.stderr[-4000:]
    assert (idx_dir / "manifest.json").exists()
    assert "built index" in build.stdout

    query = _submit(
        ["--py-files", str(zip_path), str(launcher),
         "query", "--index-dir", str(idx_dir), "-k", "3", "spark join"],
        cwd=tmp_path,
    )
    assert query.returncode == 0, query.stderr[-4000:]
    hits = [
        ln for ln in query.stdout.splitlines()
        if "\t" in ln and not ln.startswith("(")
    ]
    assert len(hits) == 3, query.stdout
    # doc 2 has the most spark occurrences and shortest path to the top
    assert hits[0].split("\t")[0] in {"0", "2"}
