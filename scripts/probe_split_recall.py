"""Probe: the split-recall operating CURVE (round-13, VERDICT item 4).

Round 12 measured one point — probes=2 at cap=100 recovers recall 0.632
vs the unsplit knn_graph_ivf graph — but no curve existed to justify it.
This probe sweeps probes ∈ {1,2,3} × cap ∈ {50,100,200} on the sf0.01
corpus (whose IVF map genuinely splits at cap ≤ 100) and reports, per
point:

  - recall   = |probe-graph edges ∩ unsplit edges| / |unsplit edges|
    (src,dst pairs; the unsplit graph is the ground truth BY DESIGN —
    the split exists to bound its candidate cost, recall measures what
    that bound gives up)
  - cand     = candidate-pair count of the composite-key join (the real
    cost driver: each candidate pays one exact integer dot)
  - sec      = wall time of the full graph build

The unsplit graph's own candidate count anchors the cost axis. Results
land in BASELINE.md (round-13 section) and the chosen operating point is
stated in knn_graph_cellsplit_probe's docstring.

Usage: PYTHONPATH=/root/repo python scripts/probe_split_recall.py
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from gridiron_spark.queries.similarity import (
        _GIVF_SFAC,
        _cell_split_assign,
        knn_graph_cellsplit_probe,
        knn_graph_ivf_edges,
    )

    t0 = time.time()
    truth_df = knn_graph_ivf_edges(spark, sf_dir, super_fac=_GIVF_SFAC)
    truth = set(map(tuple, truth_df.select("src", "dst").collect()))
    t_truth = time.time() - t0
    # unsplit candidate count anchors the cost axis
    _, assigned_remap = _cell_split_assign(spark, sf_dir, cap=10**9)
    base_cand = (
        assigned_remap.alias("a")
        .join(
            assigned_remap.alias("b"),
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select("a.vec_id", "b.vec_id")
        .distinct()
        .count()
    )
    print(f"# sf={sf_dir} unsplit: edges={len(truth)} cand={base_cand} "
          f"({t_truth:.1f}s)")
    print(f"{'cap':>5} {'probes':>6} {'recall':>7} {'cand':>9} "
          f"{'cand/unsplit':>12} {'sec':>6}")
    for cap in (50, 100, 200):
        for probes in (1, 2, 3):
            t1 = time.time()
            got = set(
                map(
                    tuple,
                    knn_graph_cellsplit_probe(
                        spark, sf_dir, cap=cap, probes=probes
                    ).select("src", "dst").collect(),
                )
            )
            sec = time.time() - t1
            _, remap = _cell_split_assign(spark, sf_dir, cap=cap,
                                          probes=probes)
            a = remap.localCheckpoint(eager=False)
            cand = (
                a.alias("a")
                .join(
                    a.filter(F.col("home")).alias("b"),
                    (F.col("a.cid") == F.col("b.cid"))
                    & (F.col("a.sub_cid") == F.col("b.sub_cid"))
                    & (F.col("a.vec_id") != F.col("b.vec_id")),
                )
                .select("a.vec_id", "b.vec_id")
                .distinct()
                .count()
            )
            recall = len(got & truth) / len(truth) if truth else 1.0
            print(
                f"{cap:>5} {probes:>6} {recall:>7.3f} {cand:>9} "
                f"{cand / base_cand:>12.3f} {sec:>6.2f}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
