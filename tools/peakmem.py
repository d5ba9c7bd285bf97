"""Peak-RSS probe for a single registry query: runs the query once on a warm
session while a 2 s sampler sums VmRSS across the java + python process tree
(local mode: the JVM holds executor heap, pyspark.daemon workers hold the
Arrow/pandas frames — both matter for the fold operators). Prints one JSON
line; used for the SCALE.md peak-memory notes (r10 verdict task 2).

Usage: python tools/peakmem.py <query_name> <sf_dir> [state_store]
(optional 3rd arg, e.g. 'rocksdb', passes through to get_spark — the
production provider for the large streaming-state rows)
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_rss_mb() -> int:
    total = 0
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{pid}/status") as fh:
                s = fh.read()
            if "java" in s[:60] or "python" in s[:60] or "pyspark" in s:
                for line in s.splitlines():
                    if line.startswith("VmRSS:"):
                        total += int(line.split()[1]) // 1024
                        break
        except OSError:
            pass
    return total


def main() -> None:
    import __spark_entry__ as E
    from polars_order_book_spark.session import get_spark

    name, sf = sys.argv[1], sys.argv[2]
    state_store = sys.argv[3] if len(sys.argv) > 3 else None
    spark = get_spark("peakmem", state_store=state_store)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["q1_pricing_summary"](spark, "/root/testdata/sf0.1").count()  # warm
    time.sleep(3)
    base = tree_rss_mb()
    peak = {"v": 0}
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            peak["v"] = max(peak["v"], tree_rss_mb())
            time.sleep(2)

    t = threading.Thread(target=sampler, daemon=True)
    t.start()
    t0 = time.time()
    n = qs[name](spark, sf).count()
    wall = time.time() - t0
    stop.set()
    t.join()
    print(json.dumps({
        "query": name, "sf": sf, "rows": n, "wall_sec": round(wall, 1),
        "baseline_rss_mb": base, "peak_rss_mb": peak["v"],
        "delta_mb": peak["v"] - base,
    }))


if __name__ == "__main__":
    main()
