"""Probe: does session aging inflate the late-alphabet streaming entries,
and does stronger between-query hygiene fix it?

Round-11 VERDICT finding: inside a full-catalog bench session,
``streaming_join_e2e`` reads 16-25 s vs 2.1 s fresh. Hypothesis: the
aging is accumulated *streaming* residue, not generic plan garbage —
  (a) every drained memory-sink query object (StreamExecution + its
      MemorySink holding the full result rowset) stays referenced by
      StreamingQueryManager until ``resetTerminated()``;
  (b) executor-side state-store providers from every drain stay in the
      JVM's loadedProviders map until the 60 s maintenance tick happens
      to notice the query is gone — ``StateStore.stop()`` unloads them
      all immediately (safe: the next streaming query lazily restarts
      maintenance).

Protocol (mirrors bench.py): noop-sink force, 1 warm-up + 3 timed runs,
median. Steps per variant:
  1. fresh session → median(streaming_join_e2e)            [baseline]
  2. age: run every streaming_* catalog entry, bench-style, with the
     variant's hygiene between entries
  3. median(streaming_join_e2e) again                      [aged]

Usage: python scripts/probe_streaming_aging.py {old|new} [repeat_family]
Writes one JSON line to stdout.
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


def _old_hygiene(spark) -> None:
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary:
            spark.catalog.dropTempView(tbl.name)
    spark._jvm.System.gc()


def _new_hygiene(spark) -> None:
    _old_hygiene(spark)
    spark.streams.resetTerminated()
    spark._jvm.org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    spark._jvm.System.gc()


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "old"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hygiene = _new_hygiene if variant == "new" else _old_hygiene

    from gridiron_spark.queries import catalog
    from gridiron_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(f"probe-aging-{variant}")
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    streaming = {
        n: e for n, e in sorted(cat.items()) if n.startswith("streaming_")
    }
    join_fn = cat["streaming_join_e2e"].spark_fn

    fresh = _median(join_fn, spark, sf_dir)
    print(f"# fresh: {fresh}s", file=sys.stderr, flush=True)

    t_family = time.perf_counter()
    for r in range(repeat):
        for name, entry in streaming.items():
            m = _median(entry.spark_fn, spark, sf_dir)
            print(f"# age[{r}] {name}: {m}s", file=sys.stderr, flush=True)
            hygiene(spark)
    family_s = round(time.perf_counter() - t_family, 1)

    aged = _median(join_fn, spark, sf_dir)
    print(f"# aged: {aged}s", file=sys.stderr, flush=True)
    print(
        json.dumps(
            {
                "variant": variant,
                "repeat": repeat,
                "fresh_join_s": fresh,
                "aged_join_s": aged,
                "inflation": round(aged / fresh, 2),
                "family_wall_s": family_s,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
