"""Every driver-gate query must SURVIVE a hostile corpus.

The oracle gates prove value-correctness on the clean synthetic
corpus; this suite proves the other half of the 100 TB contract: no
operator crashes on the dirt a real crawl contains — null text, empty
and whitespace-only documents, unicode (CJK + emoji), 500-char tokens,
control characters, symbol-only rows, duplicate rows, zero / NaN /
null embeddings, and null event fields. The contract asserted is
no-crash + a well-formed (possibly empty) result, not specific rows.
"""

from __future__ import annotations

import datetime

import pytest


def _names() -> list[str]:
    import __spark_entry__ as e

    return sorted(e.queries())


@pytest.fixture(scope="module")
def adv_sf(spark, tmp_path_factory) -> str:
    base = tmp_path_factory.mktemp("advsf")
    docs = [
        (1, "spark join fast table scan", "en", "s", 26),
        (2, None, "en", "s", 0),
        (3, "", "en", "s", 0),
        (4, "café résumé ünïcode 北京 \U0001f680 rocket", "xx", "s", 30),
        (5, "x" * 500 + " " + "y" * 80 + " spark", "en", "s", 587),
        (6, "spark join fast table scan", "en", "s", 26),  # exact dup of 1
        (7, "a\tb\nc  d", "en", "s", 8),
        (8, "   ", "en", "s", 3),
        (9, "7 8 9 !!! ### $$$", "en", "s", 17),
        (10, "merge sort group order filter spark join", "en", "s", 40),
        (11, "window agg stream hash table", "en", "s", 28),
        (12, "slow query merge sort group order filter", "en", "s", 40),
        (13, "spark join fast table scan extra", "en", "s", 32),  # near-dup of 1
    ]
    emb = []
    for i in range(8):
        if i == 5:
            vec = None  # null embedding
        elif i == 6:
            vec = [0.0] * 64  # zero vector: cosine divides by zero
        elif i == 7:
            vec = [float("nan")] + [0.5] * 63  # NaN component
        else:
            vec = [float((i * 7 + j) % 13) - 6.0 for j in range(64)]
        emb.append((i, vec, i % 3))
    t0 = datetime.datetime(2026, 1, 1)
    events = []
    for i in range(12):
        events.append(
            (
                i,
                t0 + datetime.timedelta(seconds=40 * i),
                None if i == 11 else i % 3,
                None if i == 10 else f"type{i % 2}",
                None if i == 9 else float(i),
                None if i == 8 else "{}",
            )
        )
    # single parquet FILES, exactly like the driver's testdata layout
    # (the streaming gates read <sf_dir>/events.parquet as a file)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in docs], pa.int64()),
                "text": pa.array([r[1] for r in docs], pa.string()),
                "lang": pa.array([r[2] for r in docs], pa.string()),
                "source": pa.array([r[3] for r in docs], pa.string()),
                "n_chars": pa.array([r[4] for r in docs], pa.int64()),
            }
        ),
        str(base / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([r[0] for r in emb], pa.int64()),
                "embedding": pa.array(
                    [r[1] for r in emb], pa.list_(pa.float32())
                ),
                "label": pa.array([r[2] for r in emb], pa.int32()),
            }
        ),
        str(base / "embeddings.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in events], pa.int64()),
                "ts": pa.array([r[1] for r in events], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in events], pa.int64()),
                "event_type": pa.array([r[3] for r in events], pa.string()),
                "value": pa.array([r[4] for r in events], pa.float64()),
                "props": pa.array([r[5] for r in events], pa.string()),
            }
        ),
        str(base / "events.parquet"),
    )
    return str(base)


@pytest.mark.parametrize("name", _names())
def test_gate_survives_adversarial_corpus(spark, adv_sf, name):
    import __spark_entry__ as e

    df = e.queries()[name](spark, adv_sf)
    rows = df.collect()  # full evaluation; empty results are legitimate
    assert rows is not None
    assert len(df.columns) > 0
