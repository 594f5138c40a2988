"""Interleaved A/B of the index build: r3-shape vs full-stage build.

Round-4 open question (VERDICT r4 'next round' #4): best-evidence
build_20x moved 18.6 s (r3) -> 19.4-21.7 s (r4). Is that the new
stages, shared-stage code drift, or machine noise?  Note the bench's
own build lines use IndexConfig(compression=True) with NO positions/
fields — the exact r3 shape — so any real drift must be shared-stage
or noise, never the new stages themselves.

This tool alternates, in ONE session (same JVM, same page cache):

  leg A: IndexConfig(stem_stop=True, compression=True)           [r3/bench shape]
  leg B: A + positions=True, fields=True                          [full r5 build]

over the bench's 20x-replicated sf corpus, N rounds each, and prints
one JSON line with per-leg wall times, per-stage manifest timings
(median across rounds), and the A-vs-B delta attribution.  Interleaving
inside one session is the only layout this VM's external load waves
allow a conclusion from (BENCH/BASELINE.md addendum).

Usage: python tools/build_ab.py [rounds=3]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from searchengine_spark.operators.indexer import IndexConfig, build_index
    from searchengine_spark.session import get_spark

    spark = get_spark("build_ab")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = 20
    reps = spark.range(rep).select(F.col("id").alias("rep"))
    docs = base.crossJoin(reps).select(
        F.lpad(
            (F.col("doc_id") * rep + F.col("rep")).cast("string"), 12, "0"
        ).alias("pid"),
        F.col("text").alias("content"),
    ).repartition(64)
    n_docs = docs.count()

    legs = {
        "A_r3_shape": IndexConfig(
            stem_stop=True, compression=True, overwrite=True
        ),
        "B_full_stages": IndexConfig(
            stem_stop=True, compression=True, positions=True, fields=True,
            overwrite=True,
        ),
    }
    wall: dict[str, list[float]] = {k: [] for k in legs}
    stage_secs: dict[str, dict[str, list[float]]] = {k: {} for k in legs}
    tmp = tempfile.mkdtemp(prefix="se_ab_", dir="/dev/shm")
    load0 = os.getloadavg()
    try:
        # warm-up build (JVM/code paths) not counted
        build_index(docs, f"{tmp}/warm", legs["A_r3_shape"])
        for r in range(rounds):
            for name, cfg in legs.items():
                out = f"{tmp}/{name}_{r}"
                t0 = time.time()
                idx = build_index(docs, out, cfg)
                wall[name].append(round(time.time() - t0, 3))
                for st, meta in idx.manifest.get("stages", {}).items():
                    stage_secs[name].setdefault(st, []).append(meta["sec"])
                shutil.rmtree(out, ignore_errors=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    load1 = os.getloadavg()

    med = {k: statistics.median(v) for k, v in wall.items()}
    stage_med = {
        k: {st: round(statistics.median(v), 3) for st, v in sts.items()}
        for k, sts in stage_secs.items()
    }
    extra_stages = {
        st: s
        for st, s in stage_med["B_full_stages"].items()
        if st not in stage_med["A_r3_shape"]
    }
    shared_delta = {
        st: round(stage_med["B_full_stages"][st] - s, 3)
        for st, s in stage_med["A_r3_shape"].items()
        if st in stage_med["B_full_stages"]
    }
    print(
        json.dumps(
            {
                "n_docs": n_docs,
                "rounds": rounds,
                "wall": wall,
                "median": med,
                "docs_per_sec_A": round(n_docs / med["A_r3_shape"], 1),
                "docs_per_sec_B": round(n_docs / med["B_full_stages"], 1),
                "delta_B_minus_A": round(
                    med["B_full_stages"] - med["A_r3_shape"], 3
                ),
                "stage_median": stage_med,
                "extra_stage_cost": extra_stages,
                "shared_stage_delta": shared_delta,
                "loadavg_before": load0,
                "loadavg_after": load1,
            }
        )
    )


if __name__ == "__main__":
    main()
