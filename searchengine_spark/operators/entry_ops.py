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
    """Shared PERSISTED index (stem_stop=False, positions on) for gates
    that exercise the disk path (phrase-from-index, materialized
    block-max). Built once per sf_dir per process into a fresh temp
    dir, so gate runs never resume stale stages."""
    idx = _DISK_IDX.get(sf_dir)
    if idx is None:
        import tempfile

        import __spark_entry__ as entry

        from .indexer import IndexConfig, InvertedIndex, build_index

        tmp = tempfile.mkdtemp(prefix="se_gate_idx_")
        build_index(
            entry._docs(spark, sf_dir),
            tmp,
            IndexConfig(stem_stop=False, compression=False, positions=True),
        )
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
        multimodal,
        phrase,
        related,
        sessions,
        similarity,
        textstats,
    )
