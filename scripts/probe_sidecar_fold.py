"""Probe: side-car compaction fold at ≥50 micro-batches (round-13 item 5).

The banded side-car bounds per-trigger READS by bucket pruning, but the
``batch=<id>`` dir population — and therefore `_batch_parts`' per-trigger
globStatus and the accumulated small files — grew O(#batches ever
drained). `fold_sidecar_state` is the remedy; this probe demonstrates it
at 50+ batches the way a long-running ingest would use it: drain 10
arriving files at a time (maxFilesPerTrigger=1 → one micro-batch per
file, same checkpoint continued across drains), fold between drains, and
verify:

  1. the listing stays bounded (≤ live-batches + 1 folded dir) instead
     of growing to 50;
  2. the final flag table is BYTE-EQUAL to an unfolded reference drain
     over the same 50 files (strictly-earlier semantics preserved
     across every fold);
  3. wall time per segment does not degrade as batches accumulate.

Usage: PYTHONPATH=/root/repo python scripts/probe_sidecar_fold.py
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
import time


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )

    from gridiron_spark.streaming.pipelines import (
        _batch_parts,
        fold_sidecar_state,
        minhash_sidecar_dedup_available_now,
        stream_documents,
    )

    root = tempfile.mkdtemp(prefix="gridiron_foldprobe_")
    n_files, seg = 50, 10
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lamda", "mu"]

    def doc_text(i: int) -> str:
        if i % 7 == 0:  # planted near-dup family
            return "the quick brown fox jumps over the lazy dog again"
        return " ".join(words[(i + j) % len(words)] for j in range(8))

    src = f"{root}/docs"
    os.makedirs(src)

    def stage_file(i: int) -> None:
        spark.createDataFrame(
            [(i, doc_text(i), "en", "probe", len(doc_text(i)))],
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        ).coalesce(1).write.mode("overwrite").parquet(f"{root}/_w")
        part = glob.glob(f"{root}/_w/*.parquet")[0]
        shutil.copy(part, f"{src}/{i:04d}.parquet")

    # reference: unfolded drain over all 50 files
    for i in range(n_files):
        stage_file(i)
    t0 = time.time()
    ref = {
        r["doc_id"]: r.asDict()
        for r in minhash_sidecar_dedup_available_now(
            stream_documents(spark, src, max_files_per_trigger=1),
            f"{root}/ref_sigs", f"{root}/ref_flags", f"{root}/ref_ckpt",
        ).collect()
    }
    print(f"# reference unfolded drain: {n_files} batches "
          f"{time.time() - t0:.1f}s; sig dirs = "
          f"{len(_batch_parts(spark, f'{root}/ref_sigs'))}")

    # folded run: same files, drained in segments with a fold between
    src2 = f"{root}/docs2"
    os.makedirs(src2)
    sig, flags, ckpt = f"{root}/sigs", f"{root}/flags", f"{root}/ckpt"
    print(f"{'seg':>4} {'drain_s':>8} {'dirs_before':>11} {'dirs_after':>10}")
    final = None
    for s in range(0, n_files, seg):
        for i in range(s, s + seg):
            shutil.copy(f"{src}/{i:04d}.parquet", f"{src2}/{i:04d}.parquet")
        t1 = time.time()
        final = minhash_sidecar_dedup_available_now(
            stream_documents(spark, src2, max_files_per_trigger=1),
            sig, flags, ckpt,
        )
        got = {r["doc_id"]: r.asDict() for r in final.collect()}
        drain_s = time.time() - t1
        before = len(_batch_parts(spark, sig))
        fold_sidecar_state(spark, sig, flags)
        after = len(_batch_parts(spark, sig))
        print(f"{s // seg:>4} {drain_s:>8.1f} {before:>11} {after:>10}")
    assert got == ref, "folded flags diverge from unfolded reference"
    print(f"# folded == unfolded on all {len(ref)} docs; final sig "
          f"listing = {len(_batch_parts(spark, sig))} dir(s) vs "
          f"{len(_batch_parts(spark, f'{root}/ref_sigs'))} unfolded")
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
