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

# the reference strips non-ASCII on read (Spimi.java:255:
# ``split[1].replaceAll("[^\\x00-\\x7F]", "")``)
_NON_ASCII = "[^\\x00-\\x7F]"


def read_corpus(
    spark: SparkSession, source: str, schema: str | None = None
) -> DataFrame:
    """``source`` = catalog table name (no slash), a ``pid\\ttext``
    TSV(.gz) file — the reference's native MS MARCO collection format
    (Spimi.java:251-255) — a ``.tar.gz``/``.tgz`` archive wrapping that
    TSV (Spimi.java:71-81 compressed-read mode), a ``.jsonl``/
    ``.ndjson``(.gz) document dump, a ``files:<dir>`` tree of raw
    source files (one doc per file, pid = file path), or a parquet
    path. ``schema`` applies to the JSONL formats only (skips the
    inference pass)."""
    low = source.lower()
    if low.startswith("files:"):
        return read_files_corpus(spark, source[len("files:"):])
    if low.endswith((".tar.gz", ".tgz")):
        return read_targz_corpus(spark, source)
    if low.endswith((".tsv", ".tsv.gz", ".txt", ".txt.gz")):
        return read_tsv_corpus(spark, source)
    if low.endswith((".jsonl", ".jsonl.gz", ".ndjson", ".ndjson.gz")):
        return read_jsonl_corpus(spark, source, schema=schema)
    if "/" not in source:
        return spark.read.table(source)
    return spark.read.parquet(source)


def _parse_tsv_lines(lines: DataFrame) -> DataFrame:
    """``pid\\ttext`` line -> (pid, content), mirroring Spimi.java:
    251-255: split on tab, field 0 = pid, field 1 = text (a second tab
    truncates, exactly like Java's ``split[1]``), non-ASCII stripped.
    Blank/tab-less lines are skipped."""
    fields = F.split(F.col("value"), "\t")
    return (
        lines.filter(F.size(fields) >= 2)
        .select(
            F.element_at(fields, 1).alias("pid"),
            F.regexp_replace(F.element_at(fields, 2), _NON_ASCII, "").alias(
                "content"
            ),
        )
        .filter(F.col("pid") != "")
    )


def read_tsv_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Uncompressed-read branch (Spimi.java:79). ``spark.read.text``
    decompresses .gz transparently; a .gz file is non-splittable, so
    the analysis chain downstream repartitions before the heavy work
    (assign_dense_ids' range shuffle) — the single-stream read cost is
    unavoidable for gzip, same as the reference's BufferedReader."""
    return _parse_tsv_lines(spark.read.text(path))


def read_targz_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Compressed-read branch (Spimi.java:71-77): a tar.gz whose first
    entry is the collection TSV. tar+gzip is a single sequential
    stream (not splittable by ANY engine — the reference also reads it
    through one TarArchiveInputStream), so this is a binaryFiles +
    per-partition tarfile decode; parallelism is recovered immediately
    downstream by the dense-id range shuffle."""
    import io
    import tarfile

    def entries(kv):
        _, data = kv
        with tarfile.open(fileobj=io.BytesIO(bytes(data)), mode="r:gz") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                fh = tf.extractfile(member)
                if fh is None:
                    continue
                for raw in io.TextIOWrapper(fh, encoding="utf-8"):
                    yield (raw.rstrip("\n").rstrip("\r"),)

    rdd = spark.sparkContext.binaryFiles(path).flatMap(entries)
    return _parse_tsv_lines(spark.createDataFrame(rdd, "value string"))


def read_jsonl_corpus(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """JSON-lines document dump — the common interchange format of
    LLM-pretraining corpora (one ``{"id": ..., "text": ...}`` object
    per line; The Pile / RedPajama / Dolma all ship this shape).
    Content is left byte-exact (no non-ASCII strip — matches the
    parquet path: the analysis chain normalizes at tokenize time, so
    the per-row content sha256 invariant survives the read).

    Pass an explicit ``schema`` ("id string, text string") to skip
    Spark's inference scan — the at-scale path, reachable from the CLI
    via ``build --input-schema``. Without one, inference reads the
    FULL input (an extra pass, priced in deliberately): sampled
    inference silently loses data on mixed-type columns — a 10%
    sample seeing only numeric ids infers LongType, the string-id
    rows then parse to NULL under PERMISSIVE mode and the schema
    adapter drops them without a trace. Malformed lines land in
    ``_corrupt_record`` and are dropped by the schema adapter, same
    fate as the TSV reader's tab-less lines. ``.gz`` inputs
    decompress transparently but are single-stream reads, like the
    TSV path; parallelism returns at the dense-id range shuffle.
    """
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_files_corpus(
    spark: SparkSession, root: str, glob: str | None = None
) -> DataFrame:
    """One-document-per-file tree of raw source files (the shape a
    source-code corpus has BEFORE it is tabularized into the
    ``(repo, path, commit, lang, content)`` Iceberg table): pid = the
    file's path URI, content = its bytes decoded as UTF-8 (malformed
    sequences become U+FFFD via ``make_valid_utf8`` — ANSI ``decode``
    would abort the whole scan on one bad file; the replacement chars
    are then removed downstream by the analysis chain's non-ASCII
    strip. The byte-exact original stays available in the
    ``binaryFile`` source if a sha256 lineage column is needed).

    ``binaryFile`` is the idiomatic DataFrame source here: it
    parallelizes across files (one whole file per row — source files
    are small; there is nothing to split) and prunes on the ``path``/
    ``length`` partition columns. Dispatch via ``read_corpus(spark,
    "files:<dir>")`` — extension sniffing cannot distinguish a tree of
    code files from a parquet dataset directory, so the mode is
    explicit."""
    reader = spark.read.format("binaryFile").option(
        "recursiveFileLookup", "true"
    )
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(root).select(
        F.col("path").alias("pid"),
        F.make_valid_utf8(F.col("content").cast("string")).alias("content"),
    )


# extension -> language tag, aligned with the testdata code table's
# lang values ('py', 'java', 'go', 'rust', 'md'); unknown extensions
# fall through to the raw extension, extension-less files to 'text'
_EXT_LANG = {
    "py": "py", "java": "java", "go": "go", "rs": "rust", "md": "md",
    "js": "js", "ts": "ts", "c": "c", "h": "c", "cpp": "cpp",
    "cc": "cpp", "hpp": "cpp", "cs": "cs", "rb": "rb", "php": "php",
    "scala": "scala", "kt": "kt", "swift": "swift", "sh": "sh",
    "sql": "sql", "html": "html", "css": "css", "json": "json",
    "yaml": "yaml", "yml": "yaml", "xml": "xml", "txt": "text",
}


def code_table_from_files(
    spark: SparkSession,
    root: str,
    commit: str = "WORKTREE",
    glob: str | None = None,
) -> DataFrame:
    """Tabularize a checkout tree (``root/<repo>/<path...>``) into the
    north-star code-table shape ``(repo, path, commit, lang, content)``
    so raw repositories feed the code operators (quality filters,
    license gate, BM25F fielded search) without a separate ETL step.

    repo = the first path segment under ``root``, path = the rest,
    commit = the caller-supplied label (a plain tree carries no VCS
    metadata), lang = extension-mapped tag. All derivations are JVM
    expressions over the ``binaryFile`` scan — no Python boundary, so
    the tabularization pipelines into whatever operator follows."""
    # resolve the root through Hadoop's own Path qualification so the
    # marker matches the binaryFile `path` column byte-for-byte —
    # string heuristics break on file:/// vs file:/ and on namenode
    # port normalization, silently mis-slicing every repo/path
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    marker = fs.makeQualified(hpath).toString().rstrip("/") + "/"
    df = read_files_corpus(spark, root, glob=glob)
    # locate takes the needle as a plain Python string — no SQL-string
    # escaping of user paths; a non-match raises instead of silently
    # slicing mid-path
    loc = F.locate(marker, F.col("pid"))
    rel = F.when(
        loc > 0,
        F.substring(F.col("pid"), loc + F.lit(len(marker)), F.lit(2147483647)),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"file path does not contain the qualified root "
                      f"'{marker}': "),
                F.col("pid"),
            )
        )
    )
    d = df.select(
        rel.alias("rel"), F.col("content")
    ).filter(F.col("rel") != "")
    ext = F.lower(F.regexp_extract(F.col("rel"), r"\.([^./]+)$", 1))
    lang_map = F.create_map(
        *[F.lit(x) for kv in _EXT_LANG.items() for x in kv]
    )
    has_dir = F.instr(F.col("rel"), "/") > 0
    return d.select(
        F.when(has_dir, F.substring_index(F.col("rel"), "/", 1))
        .otherwise(F.lit("")).alias("repo"),
        F.when(has_dir, F.expr("substring(rel, instr(rel, '/') + 1)"))
        .otherwise(F.col("rel")).alias("path"),
        F.lit(commit).alias("commit"),
        F.coalesce(
            lang_map[ext],
            F.when(ext != "", ext).otherwise(F.lit("text")),
        ).alias("lang"),
        F.col("content"),
    )


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
    if {"id", "text"} <= cols:
        # JSONL dump shape ({"id": ..., "text": ...}); ids are opaque
        # strings, kept verbatim. NULL-id/text rows (including JSON
        # _corrupt_record spills) are dropped like tab-less TSV lines.
        return df.select(
            F.col("id").cast("string").alias("pid"),
            F.col("text").alias("content"),
        ).filter(F.col("pid").isNotNull() & F.col("content").isNotNull())
    if {"pid", "content"} <= cols:
        return df.select("pid", "content")
    raise ValueError(f"unsupported corpus schema: {sorted(cols)}")
