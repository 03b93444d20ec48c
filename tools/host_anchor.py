"""Host-speed anchor — the drift-attribution instruments from
ROUND8_NOTES, made repeatable (VERDICT r8 item 3: "re-measure the
host anchor at round start and end").

Two instruments, both deliberately minimal:

1. **CPU anchor** — a Spark-free, single-threaded md5 fold over 2M
   strings. Diffs against prior rounds separate "host got slower"
   (anchor moves) from "host got busier" (anchor steady, wide-parallel
   suite timings inflated). Round-8 baseline: 0.492 s.
2. **Isolated query** — ``q_join_inner`` (source and plan bit-identical
   since round 4) in a fresh session: 2 warm-ups, 10 passes, median.
   A 1-task-at-a-time run always finds an idle core, so it tracks the
   HOST's speed, not its load. Historical: r4 0.567 s, r8 0.661 s.

Also records /proc/loadavg at measurement time (the co-tenant-load
covariate) and JVM GC ms across the passes.

Usage: python tools/host_anchor.py [--label round9-start]
Prints one JSON line; append it to ROUND{N}_NOTES by hand.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_anchor() -> float:
    """md5 over 2M short strings, single thread — the round-8 anchor."""
    t0 = time.perf_counter()
    h = hashlib.md5()
    for i in range(2_000_000):
        h.update(str(i).encode())
    h.hexdigest()
    return round(time.perf_counter() - t0, 3)


def isolated_query(passes: int = 10, warmups: int = 2) -> dict:
    from mapreduce_llm_spark import registry
    from mapreduce_llm_spark.session import get_spark

    registry.load_all()
    spark = get_spark(app_name="mapreduce_llm_spark-host-anchor")
    fn = registry.QUERIES["q_join_inner"]

    def gc_ms() -> int:
        total = 0
        beans = spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        for i in range(beans.size()):
            total += beans.get(i).getCollectionTime()
        return total

    for _ in range(warmups):
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
    times, gcs = [], []
    for _ in range(passes):
        g0 = gc_ms()
        t0 = time.perf_counter()
        fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
        times.append(time.perf_counter() - t0)
        gcs.append(gc_ms() - g0)
    times.sort()
    return {
        "q_join_inner_isolated_median_s": round(times[len(times) // 2], 3),
        "q_join_inner_range_s": [round(times[0], 3), round(times[-1], 3)],
        "gc_ms_per_pass_max": max(gcs),
    }


def main() -> None:
    label = ""
    if "--label" in sys.argv:
        label = sys.argv[sys.argv.index("--label") + 1]
    with open("/proc/loadavg") as fh:
        loadavg = fh.read().split()[:3]
    rec = {
        "label": label,
        "loadavg": [float(x) for x in loadavg],
        "cpu_anchor_md5_2m_s": cpu_anchor(),
    }
    rec.update(isolated_query())
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
