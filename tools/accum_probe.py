"""Within-session accumulation probe (r10): does running the streaming
rigs the way the bench does (3x each) slow down LATER queries in the same
session?

Times a set of probe queries at session start (best-of-2), runs the
memory-sink streaming rigs 3x each, re-times the probes, and prints JVM
heap + block-manager storage before/after. One JSON line to stdout.

Usage: python tools/accum_probe.py [--skip-rigs]  (the control arm runs
the probes twice with nothing in between, separating warm-up drift from
rig-induced accumulation).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBES = [
    "events_quantiles_exact_twopass",
    "events_theil_sen",
    "documents_ngram_novelty",
    "ob_modify_top2",
]

RIGS = [
    "ob_stream_keyed_mutations_top2",
    "events_sessionize_stream",
    "events_attribution_stream",
    "events_attribution_stream_outer",
    "events_enriched_stream",
    "events_user_profile_stream",
    "dedup_stream_survivors",
    "documents_wordfreq_stream",
    "events_heavy_hitters_stream",
    "events_heavy_hitters_stream_abs",
    "ob_stream_deep_top20_rocksdb",  # has cleanup — the control rig
]


def jvm_stats(spark):
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    used_mb = (rt.totalMemory() - rt.freeMemory()) / 1e6
    sc = spark.sparkContext
    storage = sc._jsc.sc().getRDDStorageInfo()
    n_rdds = len(storage)
    mem_rdd_mb = sum(s.memSize() for s in storage) / 1e6
    try:
        tables = [
            t.name for t in spark.catalog.listTables() if t.isTemporary
        ]
    except Exception:  # noqa: BLE001
        tables = []
    return {
        "heap_used_mb": round(used_mb, 1),
        "cached_rdds": n_rdds,
        "cached_rdd_mb": round(mem_rdd_mb, 1),
        "temp_tables": len(tables),
    }


def main() -> None:
    skip_rigs = "--skip-rigs" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as E
    from polars_order_book_spark.session import get_spark

    spark = get_spark("accum_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    from pyspark.sql import functions as F

    def checksum(df):
        """Force full computation of every output column; returns (cs, n)
        so callers CAN compare values, not just row counts (r10 ADVICE:
        the old row-count-only return overstated what was checked)."""
        row = df.select(
            F.sum(F.xxhash64(*df.columns).cast("decimal(38,0)")).alias("cs"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        return row["cs"], row["n"]

    # same warmups as bench.py
    for warm in ("q1_pricing_summary", "ob_updates_top1"):
        try:
            checksum(qs[warm](spark, sf_dir))
        except Exception:  # noqa: BLE001
            pass

    def time_probes(tag):
        out = {}
        for name in PROBES:
            spark.sparkContext.setJobDescription(f"probe:{tag}:{name}")
            runs = []
            for _ in range(2):
                t0 = time.time()
                checksum(qs[name](spark, sf_dir))
                runs.append(time.time() - t0)
            out[name] = round(min(runs), 3)
        return out

    before = time_probes("before")
    stats_before = jvm_stats(spark)

    rig_sec = {}
    if not skip_rigs:
        for name in RIGS:
            spark.sparkContext.setJobDescription(f"rig:{name}")
            t0 = time.time()
            for _ in range(3):
                checksum(qs[name](spark, sf_dir))
            rig_sec[name] = round(time.time() - t0, 3)

    stats_mid = jvm_stats(spark)
    after = time_probes("after")
    stats_after = jvm_stats(spark)

    print(json.dumps({
        "skip_rigs": skip_rigs,
        "probes_before": before,
        "probes_after": after,
        "rig_3x_sec": rig_sec,
        "jvm_before": stats_before,
        "jvm_after_rigs": stats_mid,
        "jvm_end": stats_after,
        "loadavg": round(os.getloadavg()[0], 2),
    }))


if __name__ == "__main__":
    main()
