"""Event sessionization: batch operator + stateful-streaming twin.

Sessionization (split each user's event stream into sessions at
``gap``-minute silences) is the canonical custom stateful operator a
log/analytics pipeline needs. Two implementations with pinned-equal
semantics:

* ``sessionize``        — batch, pure DataFrame: per-user lag ->
  new-session flag -> running sum = session id -> per-session agg.
  The per-user window is safe at scale: a window partitions by
  ``user_id`` (billions of small groups), never by a global key; a
  pathological single hyper-active user is the one skew case, handled
  the same way as heavy terms (range-partition by (user, ts) and
  two-pass offsets — see indexer._rank_within_groups) if it arises.
* ``sessionize_stream`` — Structured Streaming via
  ``applyInPandasWithState`` (the custom-stateful-operator API): state
  per user carries the OPEN session (id, bounds, aggregates) across
  micro-batches; closed sessions emit once, the open session re-emits
  updated each batch (downstream keeps the last row per
  (user_id, session_id) — the standard update-sessionization
  contract). On an ``availableNow`` backlog the output equals the
  batch operator exactly (pinned in tests/test_round2.py).

The gate query ``event_sessionization`` checks the batch operator
against a DuckDB lag/cumsum oracle on the ``events`` table.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_ops import register

GAP_MINUTES = 30
ROUND = 6

_OUT_SCHEMA = (
    "user_id long, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long, sum_value double"
)
_STATE_SCHEMA = (
    "session_id long, start_us long, last_us long, n_events long, "
    "sum_value double"
)


def sessionize(events: DataFrame, gap_minutes: int = GAP_MINUTES) -> DataFrame:
    """Batch sessionization: (user_id, session_id 1.., start, end,
    n_events, sum_value). A new session starts when the gap since the
    user's previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = gap_minutes * 60
    # TIMESTAMP_NTZ has no direct double cast; go through epoch micros
    # (gap differences are timezone-invariant either way)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    new_sess = F.when(
        prev_us.isNull() | (ts_us - prev_us > F.lit(gap_s * 1_000_000)),
        1,
    ).otherwise(0)
    # a null user cannot be sessionized (and cannot key stateful
    # streaming state) — dropped identically in the stream twin
    tagged = (
        events.filter(F.col("user_id").isNotNull())
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            "ts",
            F.col("event_id").cast("long").alias("event_id"),
            F.col("value").cast("double").alias("value"),
        )
        .withColumn("session_id", F.sum(new_sess).over(w))
    )
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), ROUND).alias("sum_value"),
        )
    )


def _session_func(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: Tuple[Any], pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        if key[0] is None or pd.isna(key[0]):  # see sessionize: null
            return  # users are dropped before sessionization
        user_id = int(key[0])
        chunks = [c for c in pdfs if len(c)]
        if not chunks:
            return
        rows = pd.concat(chunks).sort_values(["ts", "event_id"])
        # normalize to epoch MICROS regardless of the incoming pandas
        # resolution (Arrow hands over datetime64[ns])
        ts_us = (
            rows["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        )
        vals = rows["value"].astype("float64").to_numpy()

        if state.exists:
            sid, start_us, last_us, n_ev, sum_v = state.get
            if sum_v is not None and pd.isna(sum_v):
                sum_v = None  # a NULL stored in the double slot
        else:
            sid, start_us, last_us, n_ev, sum_v = 0, None, None, 0, None

        out = []

        def emit(sid, start_us, last_us, n_ev, sum_v):
            out.append(
                (
                    user_id, sid, start_us, last_us, n_ev,
                    None if sum_v is None else round(sum_v, ROUND),
                )
            )

        for t, v in zip(ts_us, vals):
            if last_us is None or t - last_us > gap_us:
                if last_us is not None:
                    emit(sid, start_us, last_us, n_ev, sum_v)  # closed
                sid += 1
                start_us, n_ev, sum_v = int(t), 0, None
            last_us = int(t)
            n_ev += 1
            # a NULL value arrives through Arrow as NaN. The batch
            # twin's F.sum SKIPS NULLs but returns NULL when every
            # value is NULL — so the accumulator starts as None and
            # only becomes numeric at the first real value (a plain
            # 0.0 start would emit 0.0 where the batch emits NULL)
            if not pd.isna(v):
                sum_v = float(v) if sum_v is None else sum_v + float(v)
        # the still-open session: emit its current shape and carry it in
        # state so the next micro-batch can extend it (last row per
        # (user_id, session_id) wins downstream)
        emit(sid, start_us, last_us, n_ev, sum_v)
        state.update(
            (
                sid,
                int(start_us),
                int(last_us),
                int(n_ev),
                None if sum_v is None else float(sum_v),
            )
        )

        pdf = pd.DataFrame(
            out,
            columns=[
                "user_id", "session_id", "session_start", "session_end",
                "n_events", "sum_value",
            ],
        )
        pdf["session_start"] = pd.to_datetime(pdf["session_start"], unit="us")
        pdf["session_end"] = pd.to_datetime(pdf["session_end"], unit="us")
        yield pdf

    return fn


def sessionize_stream(
    spark: SparkSession,
    source: str,
    gap_minutes: int = GAP_MINUTES,
    timeout_sec: int = 300,
) -> DataFrame:
    """Streaming sessionization over a parquet event directory via
    ``applyInPandasWithState`` (availableNow backlog run; update mode).
    Returns the memory-sink table — on a single-batch backlog it equals
    ``sessionize`` exactly."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(source)
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_minutes),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"se_sessions_{abs(hash(source)) % 10**8}"
    q = (
        sessions.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return spark.table(name)


def _q_sessionization_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful-streaming sessionization (applyInPandasWithState) over
    the events backlog. An ``availableNow`` single-file backlog is one
    deterministic micro-batch, so the output equals the batch
    ``sessionize`` exactly (pinned in tests/test_round2.py) — the batch
    operator's SQL twin is therefore a valid oracle for the stream gate
    too, and is registered below (``_SESSIONIZE_SQL``)."""
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory(prefix="se_sess_") as tmp:
        shutil.copy(f"{sf_dir}/events.parquet", f"{tmp}/events.parquet")
        df = sessionize_stream(spark, tmp)
        rows = df.collect()
    return spark.createDataFrame(rows, _OUT_SCHEMA)


_SESSIONIZE_SQL = f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts,
         CAST(event_id AS BIGINT) AS event_id, CAST(value AS DOUBLE) AS value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
  WHERE user_id IS NOT NULL
),
tagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) > {GAP_MINUTES * 60}.0
              THEN 1 ELSE 0 END AS new_sess
  FROM e
),
sess AS (
  SELECT user_id, ts, value,
         CAST(sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
  FROM tagged
)
SELECT user_id, session_id,
       min(ts) AS session_start, max(ts) AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), {ROUND}) AS sum_value
FROM sess GROUP BY user_id, session_id
"""

register("event_sessionization_stream", _q_sessionization_stream, _SESSIONIZE_SQL)

register(
    "event_sessionization",
    lambda spark, sf_dir: sessionize(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ),
    _SESSIONIZE_SQL,
)
