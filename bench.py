"""Benchmark runner: every catalog query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": <sec>, ...}, "sf": <sf>}

Protocol (BASELINE.md): per query, 1 discarded warm-up run then N=3 timed
runs; the recorded value is the median. ``value`` is the sum of per-query
medians (total wall-clock for the whole workload).

Queries are forced through the NOOP SINK (`write.format("noop")`), not
``count()`` — round 10 found count-based timing lets Catalyst column-prune
the final projection and ELIMINATE distinct-keyed left joins entirely, so
flag-style queries (semdedup keep flags, k-core membership, per-round
rank joins) were benched WITHOUT their defining stage: semdedup's whole
pairwise prune and pagerank's four iteration rounds vanished from the
timed plan. The noop sink evaluates every output column of every row
(what a real consumer pays) with no driver transfer. Row counts print
only when SPARK_GRAFT_BENCH_ROWS=1 (an extra untimed execution).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


# Demo-grade panel twins of the corpus-grain IVF graph family: every one
# of these has a production-shaped *_ivf sibling in the headline map (the
# round-10 twins retired the panel pair generator as the family's scale
# path — its alpha = 2.0 exponent is the documented reason it is NOT the
# 100 TB candidate). They stay fully catalog/oracle-checked; the bench
# times them under SPARK_GRAFT_BENCH_FULL=1 (the full-variant tier) so
# the headline total tracks production-shaped entries only (round-10
# VERDICT item 7; BASELINE.md round-11 closing-bench note).
_PANEL_DEMO = frozenset(
    {
        "pagerank_knn_centrality", "harmonic_centrality_knn",
        "kcore_decompose_knn", "triangle_count_knn",
        "label_propagation_knn",
    }
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    from gridiron_spark.queries import catalog
    from gridiron_spark.session import get_spark

    spark = get_spark("gridiron-bench")
    spark.sparkContext.setLogLevel("ERROR")

    cat = catalog()
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:  # opt-in iteration filter: comma-separated query names
        keep = {n.strip() for n in only.split(",") if n.strip()}
        missing = keep - set(cat)
        if missing:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown: {sorted(missing)}")
        cat = {n: e for n, e in cat.items() if n in keep}
    else:
        panel = {n: e for n, e in cat.items() if n in _PANEL_DEMO}
        cat = {n: e for n, e in cat.items() if n not in _PANEL_DEMO}
    want_rows = os.environ.get("SPARK_GRAFT_BENCH_ROWS") == "1"
    timings: dict[str, float] = {}
    for name, entry in sorted(cat.items()):
        samples = []
        for i in range(runs + 1):
            t0 = time.perf_counter()
            df = entry.spark_fn(spark, sf_dir)
            _force(df)
            dt = time.perf_counter() - t0
            if i > 0:  # discard cold run
                samples.append(dt)
            # UNTIMED per-run hygiene: localCheckpoint blocks from run i
            # are only released when the DataFrame is GC'd (ContextCleaner
            # weak refs), so back-to-back runs of a checkpointing query
            # otherwise accumulate block-manager memory and run i+1 pays
            # run i's pressure (measured: a checkpoint-bearing query's
            # 5-run median more than doubled vs its 3-run median).
            del df
            spark._jvm.System.gc()
        timings[name] = round(statistics.median(samples), 4)
        rows = f" ({entry.spark_fn(spark, sf_dir).count()} rows)" if want_rows else ""
        print(f"# {name}: {timings[name]:.3f}s{rows}", file=sys.stderr)
        _between_query_hygiene(spark)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "catalog_total_wall_clock",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # Full-corpus variants of the deliberately-subsetted catalog entries
    # (grouped_map_tensorize 1-in-20 users, cogroup_reconcile 1-in-50 keys):
    # timed separately so the headline total stays comparable across rounds
    # while the unsubsetted cost is still on record (BASELINE.md footnote).
    if os.environ.get("SPARK_GRAFT_BENCH_FULL") == "1":
        from gridiron_spark.queries.tensor import (
            cogroup_reconcile_full,
            grouped_map_tensorize_full,
        )

        full: dict[str, float] = {}
        extras = [
            ("grouped_map_tensorize_full", grouped_map_tensorize_full),
            ("cogroup_reconcile_full", cogroup_reconcile_full),
        ]
        if not only:
            extras += [(n, e.spark_fn) for n, e in sorted(panel.items())]
        for name, fn in extras:
            samples = []
            for i in range(runs + 1):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                _force(df)
                dt = time.perf_counter() - t0
                if i > 0:
                    samples.append(dt)
                # same per-run hygiene as the headline loop: release run
                # i's localCheckpoint blocks before run i+1 is timed (the
                # panel graph queries checkpoint per iteration)
                del df
                spark._jvm.System.gc()
            full[name] = round(statistics.median(samples), 4)
            print(f"# {name}: {full[name]:.3f}s", file=sys.stderr)
            _between_query_hygiene(spark)
        result["full_variants"] = full
    print(json.dumps(result))
    # Full, untruncated snapshot on disk: external captures of the stdout
    # line have been tail-truncated (~2 KB), losing the per-query map that
    # cross-round comparisons need. BASELINE.md points at the COMMITTED
    # quiet-run artifact BENCH_LOCAL.json; the default output here is a
    # different, gitignored path so an external/driver run can't silently
    # clobber the committed map (round-11 VERDICT item 2 — it happened
    # twice). Quiet runs that should update the committed artifact set
    # SPARK_GRAFT_BENCH_OUT=BENCH_LOCAL.json explicitly.
    out = os.environ.get("SPARK_GRAFT_BENCH_OUT", "BENCH_OUT.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    spark.stop()


def _force(df) -> None:
    """Fully evaluate a DataFrame: every row, every output column, no
    driver transfer. count() is NOT this — Catalyst prunes the final
    projection and eliminates distinct-keyed left joins under count, so
    a keep-flag query's defining join never runs."""
    df.write.format("noop").mode("overwrite").save()


def _between_query_hygiene(spark) -> None:
    """Session hygiene between timed queries (outside any timed region).

    A long-lived session accumulates finished-workload state; without
    cleanup, query N's timing pays for queries 1..N-1 — the "session
    aging" the round-11 VERDICT measured inflating the late-alphabet
    streaming entries 5-10x inside full-catalog runs. Three scrubbers:

    1. Drop finished temp views (memory-sink tables from drained
       streaming queries pin their full result rowsets). Every catalog
       entry is self-contained, so this is safe.
    2. ``streams.resetTerminated()`` — the StreamingQueryManager holds
       every terminated StreamExecution (its plan graph AND its
       MemorySink rows) until reset; 15 drains x 4 runs otherwise keep
       ~60 dead query objects reachable for the rest of the session.
    3. ``StateStore.stop()`` — executor-side state-store providers from
       drained queries (one per stateful operator per state partition
       per drain, each holding its latest version map in memory) stay
       in the JVM's loadedProviders registry until a maintenance tick
       happens to notice the query is gone; stop() unloads them all and
       halts the maintenance thread. Safe: the next streaming query
       lazily restarts maintenance (Spark's own test suites call it
       between cases).
    """
    for tbl in spark.catalog.listTables():
        if tbl.isTemporary:
            spark.catalog.dropTempView(tbl.name)
    spark.streams.resetTerminated()
    # StateStore.stop() is a private JVM API (the class path moved across
    # Spark versions before) and stopping the maintenance thread while a
    # query is still active would unload live providers — so only call it
    # when no stream is active, and degrade a rename/semantics change to
    # a warning rather than aborting the bench run.
    if not spark.streams.active:
        try:
            jvm_state = spark._jvm.org.apache.spark.sql.execution.streaming
            jvm_state.state.StateStore.stop()
        except Exception as exc:  # pragma: no cover - Spark-version drift
            print(f"warn: StateStore.stop() unavailable: {exc}", file=sys.stderr)
    spark._jvm.System.gc()


if __name__ == "__main__":
    main()
