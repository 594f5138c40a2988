"""Shared cache registry for operators that materialize a frame ahead
of a self-join (HOF-heavy expressions evaluate interpreted, so
re-evaluating per join side is the dominant cost). Callers register
through a module-local handle list and expose ``release_caches`` so
long-lived sessions (pipelines, REPLs, benchmarks) can return executor
storage after materializing results."""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_cache_registry():
    handles: list[DataFrame] = []

    def release() -> None:
        while handles:
            try:
                handles.pop().unpersist()
            except Exception:
                pass

    def cached(df: DataFrame) -> DataFrame:
        out = df.cache()
        handles.append(out)
        return out

    return cached, release
