"""Multimodal column plumbing: opaque binary payloads + typed metadata
+ Arrow-batched decode/feature-extract operators.

Pattern for image/audio/video at 100 TB: store the raw payload as ONE
``binary`` column beside typed metadata (mime, n_bytes, sha256); run
decode / resize / frame-sample as ``mapInPandas`` stages so each task
streams Arrow batches of payloads through the Python worker without
ever materializing a row-at-a-time Python object per byte.

The decode step itself is STUBBED here (no PIL/ffmpeg in this
container): ``decode_image_features`` tries the real libraries and
falls back to a deterministic byte-level featurizer, keeping the
Spark-side contract — schema, batch shape, partition mapping — real
and tested. The fallback features (byte_sum, n_bytes, sha256) are also
what the DuckDB oracle checks, so the whole Arrow path is correctness-
gated even without codecs installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .entry_ops import register

FRAME_BYTES = 64  # stub "video": fixed-size frames
FRAME_STRIDE = 4  # sample every 4th frame
IMG_WIDTH = 32  # stub "image": row-major width in bytes
RESIZE_FACTOR = 2  # nearest-neighbor downsample stride


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque payload column + typed metadata the way an
    image/audio ingest would: (doc_id, payload binary, mime, n_bytes,
    payload_sha256). Here the payload is the UTF-8 text bytes — the
    plumbing is payload-agnostic."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("decoder", T.StringType()),
    ]
)


def _decode_real(payload: bytes) -> dict | None:
    """Real decode path — requires PIL; absent in this container."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError(
        "real image decode is intentionally stubbed: this container has no "
        "codec libraries; install PIL/ffmpeg and implement here"
    )


def decode_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas featurizer over binary payloads.

    Arrow streams (doc_id, payload) batches into Python; numpy reduces
    each payload without per-byte Python objects. Falls back to the
    deterministic byte featurizer when codec libs are missing."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # media-less doc: no feature row
                    continue
                buf = bytes(payload)
                decoded = _decode_real(buf)
                if decoded is None:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    decoded = {
                        "n_bytes": int(arr.size),
                        "byte_sum": int(arr.sum(dtype=np.int64)),
                        "payload_sha256": hashlib.sha256(buf).hexdigest(),
                        "decoder": "stub-bytes",
                    }
                rows.append({"doc_id": int(doc_id), **decoded})
            yield pd.DataFrame(rows, columns=[f.name for f in _FEATURE_SCHEMA.fields])

    return df.select("doc_id", "payload").mapInPandas(featurize, _FEATURE_SCHEMA)


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
        T.StructField("frame_checksum", T.LongType()),
    ]
)


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame-sampling stub: treat the payload as FRAME_BYTES-sized
    frames, emit every FRAME_STRIDE-th frame's (index, size, byte-sum
    checksum). The 1->N row fan-out through mapInPandas is the real
    video-pipeline shape; only the codec is fake."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {k: [] for k in ("doc_id", "frame_idx", "frame_bytes", "frame_checksum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # media-less doc: no frames
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                n_frames = (arr.size + FRAME_BYTES - 1) // FRAME_BYTES
                for i in range(0, n_frames, FRAME_STRIDE):
                    fr = arr[i * FRAME_BYTES : (i + 1) * FRAME_BYTES]
                    out["doc_id"].append(int(doc_id))
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(int(fr.size))
                    out["frame_checksum"].append(int(fr.sum(dtype=np.int64)))
            yield pd.DataFrame(out)

    return df.select("doc_id", "payload").mapInPandas(frames, _FRAME_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("resized_bytes", T.LongType()),
        T.StructField("resized_sha256", T.StringType()),
    ]
)


def resize_payloads(
    df: DataFrame, width: int = IMG_WIDTH, factor: int = RESIZE_FACTOR
) -> DataFrame:
    """Resize stub: treat each payload as a row-major ``width``-byte
    image and nearest-neighbor downsample by ``factor`` (keep byte p
    iff (p div width) % factor == 0 AND (p mod width) % factor == 0) —
    the 1/f² pixel-drop a real thumbnailer performs, minus the codec.
    numpy boolean-mask gather per Arrow batch; emits the resized
    payload's size + sha256 (the lineage columns a downstream stage
    carries). The fan-in shape (1 row -> 1 smaller row) is the real
    image-pipeline resize stage; only bytes-as-pixels is fake."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not payload:  # media-less or zero-byte doc: nothing
                    continue  # to resize, no row (oracle-consistent)
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                p = np.arange(arr.size)
                mask = ((p // width) % factor == 0) & (
                    (p % width) % factor == 0
                )
                out = arr[mask].tobytes()
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "orig_bytes": int(arr.size),
                        "resized_bytes": len(out),
                        "resized_sha256": hashlib.sha256(out).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RESIZE_SCHEMA.fields]
            )

    return df.select("doc_id", "payload").mapInPandas(resize, _RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Driver-gate registration + DuckDB oracles
# ---------------------------------------------------------------------------


def _payloads(spark, sf_dir):
    return with_binary_payload(spark.read.parquet(f"{sf_dir}/documents.parquet"))


register(
    "multimodal_metadata",
    lambda spark, sf_dir: _payloads(spark, sf_dir).select(
        "doc_id", "mime", "n_bytes", "payload_sha256"
    ),
    """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       'text/plain' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha256
FROM documents
""",
)

register(
    "multimodal_features",
    lambda spark, sf_dir: decode_image_features(_payloads(spark, sf_dir)),
    """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(list_sum(list_transform(string_split(text, ''), c -> ord(c)))
            AS BIGINT) AS byte_sum,
       sha256(text) AS payload_sha256,
       'stub-bytes' AS decoder
FROM documents
""",
)

# frame sampling: SQL-expressible too (range over frame indexes)
register(
    "multimodal_frames",
    lambda spark, sf_dir: sample_frames(_payloads(spark, sf_dir)),
    f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
         octet_length(encode(text)) AS nb
  FROM documents
),
fr AS (
  SELECT doc_id, i.i AS frame_idx,
         substr(text, CAST(i.i * {FRAME_BYTES} + 1 AS INT), {FRAME_BYTES}) AS chunk
  FROM p, LATERAL (
    SELECT unnest(range(0, CAST((nb + {FRAME_BYTES} - 1) // {FRAME_BYTES} AS BIGINT),
                  {FRAME_STRIDE})) AS i) i
)
SELECT doc_id, frame_idx,
       CAST(octet_length(encode(chunk)) AS BIGINT) AS frame_bytes,
       CAST(list_sum(list_transform(string_split(chunk, ''), c -> ord(c)))
            AS BIGINT) AS frame_checksum
FROM fr
""",
)

def _q_resize(spark, sf_dir):
    """Gate payloads are ASCII-STRIPPED text bytes (the reference's own
    non-ASCII strip, Spimi.java:255) so byte and character positions
    coincide and the SQL twin — which can only index characters, DuckDB
    has no blob subscripting — masks exactly the bytes numpy masks.
    The operator itself is byte-true for arbitrary binary payloads."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "text", F.regexp_replace(F.col("text"), r"[^\x00-\x7F]", "")
    )
    return resize_payloads(with_binary_payload(docs))


register(
    "multimodal_resize",
    _q_resize,
    f"""
WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_replace(text, '[^\\x00-\\x7F]', '', 'g') AS t
  FROM documents
),
p2 AS (SELECT doc_id, t, length(t) AS nb FROM p WHERE length(t) > 0),
kept AS (
  SELECT doc_id, nb, i.i AS i, substr(t, CAST(i.i AS INT), 1) AS c
  FROM p2, LATERAL (SELECT unnest(range(1, nb + 1)) AS i) i
  WHERE ((i.i - 1) // {IMG_WIDTH}) % {RESIZE_FACTOR} = 0
    AND ((i.i - 1) % {IMG_WIDTH}) % {RESIZE_FACTOR} = 0
)
SELECT doc_id,
       CAST(any_value(nb) AS BIGINT) AS orig_bytes,
       CAST(count(*) AS BIGINT) AS resized_bytes,
       sha256(string_agg(c, '' ORDER BY i)) AS resized_sha256
FROM kept GROUP BY doc_id
""",
)
