"""Training-data-pipeline operator registry for the driver gate.

Collects the (spark, sf_dir) -> DataFrame callables and their DuckDB
oracle SQL for the large-scale-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing). Populated operator-by-
operator; keys appear in __spark_entry__.queries()/oracle_sql().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable, sql: str | None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


def extra_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return dict(_QUERIES)


def extra_oracle_sql() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_DISK_IDX: dict[str, object] = {}


def gate_disk_index(spark: SparkSession, sf_dir: str):
    """Shared PERSISTED index (stem_stop=False, compression on,
    positions on — positions therefore gap-VB packed) for gates that
    exercise the disk path (phrase-from-index, materialized block-max,
    packed-position framing). Built once per corpus into a
    deterministic cache dir keyed on the corpus files."""
    idx = _DISK_IDX.get(sf_dir)
    if idx is None:
        import hashlib
        import json
        import os
        import shutil
        import tempfile

        import __spark_entry__ as entry

        from .indexer import IndexConfig, InvertedIndex, build_index

        # Deterministic cache path keyed by corpus identity (path + file
        # mtimes/sizes) so repeated gate/test runs in separate processes
        # reuse ONE directory instead of leaking a fresh mkdtemp each time.
        key_parts = [os.path.abspath(sf_dir), "stem_stop=0,comp=1,pos=1"]
        docs_path = os.path.join(sf_dir, "documents.parquet")
        try:
            if os.path.isdir(docs_path):
                for f in sorted(os.listdir(docs_path)):
                    st = os.stat(os.path.join(docs_path, f))
                    key_parts.append(f"{f}:{st.st_size}:{st.st_mtime_ns}")
            else:
                st = os.stat(docs_path)
                key_parts.append(f"{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            pass
        key = hashlib.sha256("|".join(key_parts).encode()).hexdigest()[:16]
        tmp = os.path.join(tempfile.gettempdir(), f"se_gate_idx_{key}")
        marker = os.path.join(tmp, "_GATE_INDEX_OK")
        if not os.path.exists(marker):
            # Build into a process-unique staging dir (the expensive
            # part, safely concurrent), then PUBLISH under an exclusive
            # flock: the marker check, any rmtree of a markerless
            # leftover, and the rename into the keyed path happen as
            # one critical section, so a loser can never rmtree a
            # directory another process published between its check
            # and its delete (the pre-lock marker test is only an
            # optimization; the locked one decides).
            import fcntl

            stage = f"{tmp}__build_{os.getpid()}"
            shutil.rmtree(stage, ignore_errors=True)
            try:
                build_index(
                    entry._docs(spark, sf_dir),
                    stage,
                    IndexConfig(
                        stem_stop=False, compression=True, positions=True
                    ),
                )
                with open(os.path.join(stage, "_GATE_INDEX_OK"), "w") as fh:
                    json.dump({"key": key}, fh)
                with open(f"{tmp}__lock", "w") as lk:
                    fcntl.flock(lk, fcntl.LOCK_EX)
                    try:
                        if os.path.exists(marker):
                            # another process published first — serve its
                            # copy
                            shutil.rmtree(stage, ignore_errors=True)
                        else:
                            # a markerless dir at the keyed path is a
                            # crashed pre-publish leftover (published dirs
                            # always carry the marker, and nobody serves an
                            # unpublished dir)
                            shutil.rmtree(tmp, ignore_errors=True)
                            os.rename(stage, tmp)
                    finally:
                        fcntl.flock(lk, fcntl.LOCK_UN)
            except BaseException:
                # a failed build (or a publish error) must not leak the
                # pid-unique staging dir — it holds a full compressed
                # positional index and no later run reuses the path
                shutil.rmtree(stage, ignore_errors=True)
                raise
        idx = InvertedIndex.load(spark, tmp)
        _DISK_IDX[sf_dir] = idx
    return idx


_LOADED = False


def _load() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import (  # noqa: F401
        bpe,
        codestats,
        curation,
        dedup,
        engine_extra,
        forks,
        multimodal,
        phrase,
        related,
        sessions,
        similarity,
        textstats,
    )
