"""Corpus source adapter (SURVEY §2.1 S1/S2).

The production input per the north star is an Iceberg table
``(repo, path, commit, lang, content)``; locally the driver supplies
parquet. One adapter serves both: catalog table names (any Spark
catalog — Iceberg, Hive, temp views) resolve via ``spark.read.table``,
filesystem paths via the parquet reader. Schema adaptation to the
engine's (pid, content) contract happens in
``indexer.docs_from_code_table`` / the doc_id adapter.

No Iceberg runtime ships in this sandbox; with
``--packages org.apache.iceberg:iceberg-spark-runtime-...`` and a
catalog configured, ``read_corpus(spark, "catalog.db.code_files")``
works unchanged — the engine itself never assumes a file layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_corpus(spark: SparkSession, source: str) -> DataFrame:
    """``source`` = catalog table name (no slash) or parquet path."""
    if "/" not in source:
        return spark.read.table(source)
    return spark.read.parquet(source)


def to_engine_docs(df: DataFrame) -> DataFrame:
    """Adapt any supported corpus schema to (pid, content)."""
    cols = set(df.columns)
    if {"repo", "path", "commit", "content"} <= cols:
        from ..operators.indexer import docs_from_code_table

        return docs_from_code_table(df)
    if {"doc_id", "text"} <= cols:
        return df.select(
            F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("pid"),
            F.col("text").alias("content"),
        )
    if {"pid", "content"} <= cols:
        return df.select("pid", "content")
    raise ValueError(f"unsupported corpus schema: {sorted(cols)}")
