"""Full-catalog aging probe with JVM telemetry — round-12 root-cause run.

Mimics bench.py's exact protocol (noop force, 1 warm-up + 3 timed runs,
median, same hygiene) over the whole headline catalog, but:
  * times streaming_join_e2e FRESH at session start,
  * prints JVM telemetry (CodeHeap pools, Metaspace, loaded classes,
    terminated-query count) every N queries,
  * re-times streaming_join_e2e at the end.

The round-11 VERDICT saw streaming_join_e2e at 16-25 s late in a full
bench vs 2.1 s fresh. The streaming family alone does NOT reproduce it
(probe_streaming_aging.py: 30 drains → 2.75 s), so the mechanism is
whole-session: candidate = JIT code-cache exhaustion (default
ReservedCodeCacheSize=240 MB; ~1000 codegen'd executions; when full the
JIT stops compiling and late queries run interpreted).

Usage: python scripts/probe_full_aging.py {old|new} [out.json]
"""

from __future__ import annotations

import json
import statistics
import sys
import time


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median(fn, spark, sf_dir, runs=3) -> float:
    samples = []
    for i in range(runs + 1):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        _force(df)
        dt = time.perf_counter() - t0
        if i > 0:
            samples.append(dt)
        del df
        spark._jvm.System.gc()
    return round(statistics.median(samples), 3)


def _telemetry(spark) -> dict:
    mf = spark._jvm.java.lang.management.ManagementFactory
    out: dict[str, float] = {}
    for pool in mf.getMemoryPoolMXBeans():
        name = pool.getName()
        if "CodeHeap" in name or name == "Metaspace":
            u = pool.getUsage()
            out[name] = round(u.getUsed() / 2**20, 1)
            # getMax() == -1 means "undefined" (unbounded pool)
            mx = u.getMax()
            out[name + " max"] = round(mx / 2**20, 1) if mx >= 0 else None
    out["loaded_classes"] = mf.getClassLoadingMXBean().getLoadedClassCount()
    out["jit_time_ms"] = mf.getCompilationMXBean().getTotalCompilationTime()
    return out


def _old_hygiene(spark) -> None:
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary:
            spark.catalog.dropTempView(tbl.name)
    spark._jvm.System.gc()


def _new_hygiene(spark) -> None:
    # same order as bench.py's shipped hygiene: release the references
    # (views, terminated queries, state-store providers) FIRST, gc last
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary:
            spark.catalog.dropTempView(tbl.name)
    spark.streams.resetTerminated()
    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark._jvm.System.gc()


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "old"
    out_path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/full_aging_{variant}.json"
    hygiene = _new_hygiene if variant == "new" else _old_hygiene

    from gridiron_spark.queries import catalog
    from gridiron_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(f"probe-full-{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    panel = {
        "pagerank_knn_centrality", "harmonic_centrality_knn",
        "kcore_decompose_knn", "triangle_count_knn", "label_propagation_knn",
    }
    cat = {n: e for n, e in sorted(catalog().items()) if n not in panel}
    join_fn = cat["streaming_join_e2e"].spark_fn

    fresh = _median(join_fn, spark, sf_dir)
    print(f"# fresh streaming_join_e2e: {fresh}s", file=sys.stderr, flush=True)
    print(f"# telemetry@start: {_telemetry(spark)}", file=sys.stderr, flush=True)

    timings: dict[str, float] = {}
    for i, (name, entry) in enumerate(cat.items()):
        timings[name] = _median(entry.spark_fn, spark, sf_dir)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
        hygiene(spark)
        if i % 25 == 24:
            print(f"# telemetry@{i + 1}: {_telemetry(spark)}",
                  file=sys.stderr, flush=True)

    aged = _median(join_fn, spark, sf_dir)
    tel = _telemetry(spark)
    print(f"# telemetry@end: {tel}", file=sys.stderr, flush=True)
    result = {
        "variant": variant,
        "fresh_join_s": fresh,
        "aged_join_s": aged,
        "inflation": round(aged / fresh, 2),
        "in_run_join_s": timings["streaming_join_e2e"],
        "total_s": round(sum(timings.values()), 1),
        "n_queries": len(timings),
        "telemetry_end": tel,
        "queries": timings,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    spark.stop()


if __name__ == "__main__":
    main()
