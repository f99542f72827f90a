"""Probe: where does streaming_late_data_e2e wait under CPU load?

Round-12's session-hygiene fix cured every sibling streaming entry in the
driver's own BENCH_r12 (join 24.7 -> 3.34 s) but this entry ROSE
(14.5 -> 16.4 s) while reading ~2.5 s on a quiet box. The entry is the
only append-mode watermarked aggregation drain (3 strictly-ordered
micro-batches via maxFilesPerTrigger=1 + the no-data finalization batch),
so the suspects are entry-specific waits: state-store commit/maintenance,
per-trigger WAL (offset/commit log) fsync, or append-mode finalization.

This probe runs the EXACT entry drain at a given sf, captures
``query.recentProgress`` (per-trigger durationMs breakdown:
triggerExecution / getBatch / addBatch / walCommit / commitOffsets +
stateOperators commit times), and prints a per-batch table — optionally
under a synthetic all-core CPU load (``--load``) to reproduce the driver
box. Run both and diff the columns: the wait that inflates only under
load is the mechanism.

Usage:
    PYTHONPATH=/root/repo python scripts/probe_late_data.py [--load] \
        [--sf /root/testdata/sf0.1] [--runs 2] [--entry late|tumbling]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing
import os
import sys
import time
import uuid


def _burn(stop_flag) -> None:  # pragma: no cover - child process
    x = 1.0
    while not stop_flag.value:
        for _ in range(10000):
            x = (x * 1.0000001) % 97.0


def start_load(n: int):
    ctx = multiprocessing.get_context("spawn")
    stop = ctx.Value("b", False)
    procs = [ctx.Process(target=_burn, args=(stop,), daemon=True) for _ in range(n)]
    for p in procs:
        p.start()
    return stop, procs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--load", action="store_true", help="run under all-core CPU load")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--entry", default="late", choices=["late", "tumbling"])
    ap.add_argument("--cold-stage", action="store_true",
                    help="delete the staged source before the first run")
    ap.add_argument("--state-parts", type=int, default=32,
                    help="shuffle/state partitions for the drain")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )

    from gridiron_spark.queries.streaming_batch import (
        _stage_events,
        _stage_late_arrival_events,
    )
    from gridiron_spark.streaming.pipelines import stream_events, tumbling_agg

    stop = procs = None
    if args.load:
        n = multiprocessing.cpu_count()
        stop, procs = start_load(n)
        print(f"# synthetic load: {n} busy processes", file=sys.stderr)
        time.sleep(1)

    try:
        for run in range(args.runs):
            if args.entry == "late":
                t0 = time.time()
                if args.cold_stage and run == 0:
                    import shutil

                    from gridiron_spark.queries.streaming_batch import (
                        _late_stage_key,
                    )

                    shutil.rmtree(_late_stage_key(args.sf),
                                  ignore_errors=True)
                stage = _stage_late_arrival_events(spark, args.sf)
                t_stage = time.time() - t0
                stream = stream_events(spark, stage, max_files_per_trigger=1)
                agg = tumbling_agg(stream, watermark="1 minute")
                mode = "append"
            else:
                t0 = time.time()
                stage = _stage_events(spark, args.sf)
                t_stage = time.time() - t0
                stream = stream_events(spark, stage, max_files_per_trigger=1)
                agg = tumbling_agg(stream)
                mode = "complete"

            name = f"probe_{uuid.uuid4().hex[:8]}"
            spark.conf.set("spark.sql.shuffle.partitions", str(args.state_parts))
            t1 = time.time()
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode(mode)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            t_drain = time.time() - t1
            n_rows = spark.table(name).count()
            print(
                f"\n== run {run} entry={args.entry} load={args.load} "
                f"stage={t_stage:.2f}s drain={t_drain:.2f}s rows={n_rows}"
            )
            hdr = (
                "batch rows   trigExec   getBatch latestOffset   addBatch"
                "  walCommit commitOff  stateCommit stateTotal"
            )
            print(hdr)
            for p in q.recentProgress:
                d = p["durationMs"]
                so = p.get("stateOperators") or []
                state_commit = sum(s.get("commitTimeMs", 0) for s in so)
                state_total = sum(
                    s.get("allUpdatesTimeMs", 0)
                    + s.get("allRemovalsTimeMs", 0)
                    + s.get("commitTimeMs", 0)
                    for s in so
                )
                print(
                    f"{p['batchId']:>5} {p['numInputRows']:>5}"
                    f" {d.get('triggerExecution', 0):>9}"
                    f" {d.get('getBatch', 0):>9}"
                    f" {d.get('latestOffset', 0):>12}"
                    f" {d.get('addBatch', 0):>9}"
                    f" {d.get('walCommit', 0):>9}"
                    f" {d.get('commitOffsets', 0):>9}"
                    f" {state_commit:>12} {state_total:>10}"
                )
            # anything not covered by the named phases
            last = q.recentProgress[-1] if q.recentProgress else None
            if last:
                print("last progress json (durations):",
                      json.dumps(last["durationMs"]))
            spark.catalog.dropTempView(name)
            spark.streams.resetTerminated()
    finally:
        if stop is not None:
            stop.value = True
            for p in procs:
                p.join(timeout=2)

    spark.stop()


if __name__ == "__main__":
    main()
