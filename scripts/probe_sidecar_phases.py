"""Phase-level timing probe for the streaming side-car drain entries.

Replays the streaming_sidecar_pruned_read_e2e drain with a per-step timer
wrapped around every Spark action inside the foreachBatch merge, so the
11 s bench entry decomposes into its per-trigger fixed costs (guide §1.1:
decide whether the time is compute, I/O, or scheduling before changing
anything). Measurement-only; the production path stays in
gridiron_spark/streaming/pipelines.py.

Usage: python scripts/probe_sidecar_phases.py [runs]
"""

from __future__ import annotations

import collections
import os
import shutil
import sys
import tempfile
import time
import uuid

AGG = collections.defaultdict(float)
CNT = collections.defaultdict(int)


class T:
    def __init__(self, name):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()

    def __exit__(self, *a):
        dt = time.perf_counter() - self.t0
        AGG[self.name] += dt
        CNT[self.name] += 1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from pyspark.sql import functions as F

    from gridiron_spark.queries.streaming_batch import (
        _SPR_BUCKETS,
        _SPR_MAX_DOC,
        _stage_documents_mod_sharded,
    )
    from gridiron_spark.session import get_spark
    import gridiron_spark.streaming.pipelines as P
    from gridiron_spark.streaming.pipelines import (
        _batch_parts,
        _count_part_files,
        _write_sidecar_stats,
        stream_documents,
    )
    from gridiron_spark.operators.dedup import (
        band_keys,
        minhash_signature_df,
        shingle_rows,
    )

    spark = get_spark("gridiron-probe")
    spark.sparkContext.setLogLevel("ERROR")

    stage = _stage_documents_mod_sharded(spark, sf_dir, max_doc_id=_SPR_MAX_DOC)

    threshold, num_hashes, bands, n_buckets = 0.5, 16, 4, _SPR_BUCKETS
    rows = num_hashes // bands

    def banded(sig_df):
        b = sig_df.select(
            "doc_id", "sig",
            F.posexplode(band_keys(F.col("sig"), bands, rows)).alias(
                "band_idx", "band_key"),
        )
        return b.withColumn(
            "bucket",
            F.pmod(
                F.conv(F.substring(F.md5("band_key"), 1, 8), 16, 10)
                .cast("bigint"),
                F.lit(n_buckets),
            ),
        )

    for run in range(runs):
        run_dir = tempfile.mkdtemp(prefix=f"gridiron_probe_{uuid.uuid4().hex[:8]}_")
        sig_dir, flags_dir, ckpt = (
            f"{run_dir}/sigs", f"{run_dir}/flags", f"{run_dir}/ckpt")
        stats_dir = f"{run_dir}/stats"

        def merge(batch_df, batch_id):
            with T("01_sig_ckpt+take"):
                batch_sig = minhash_signature_df(
                    shingle_rows(batch_df), num_hashes).localCheckpoint()
                empty = not batch_sig.take(1)
            assert not empty
            with T("02_banded_ckpt"):
                bb = banded(batch_sig).localCheckpoint()
            with T("03_hot_collect"):
                hot_buckets = [
                    r["bucket"]
                    for r in bb.select("bucket").distinct().collect()
                ]
            with T("04_list_prior"):
                prior_dirs = _batch_parts(spark, sig_dir, before=batch_id)
            prior_schema = (
                "doc_id bigint, sig array<string>, band_idx int, "
                "band_key string, batch int, bucket bigint"
            )
            if prior_dirs:
                prior = (
                    spark.read.option("basePath", sig_dir)
                    .schema(prior_schema)
                    .parquet(*prior_dirs)
                    .filter(F.col("bucket").isin(hot_buckets))
                    .select("doc_id", "sig", "band_idx", "band_key", "bucket")
                )
                probe = prior.unionByName(bb)
            else:
                probe = bb
            build = F.broadcast(bb)
            with T("05_files_read_count"):
                files_read = files_total = 0
                if prior_dirs:
                    files_read = (
                        prior.select(F.input_file_name()).distinct().count())
                    files_total = _count_part_files(spark, prior_dirs)
            with T("06_stats_write"):
                _write_sidecar_stats(spark, stats_dir, batch_id,
                                     len(hot_buckets), files_read, files_total)
            est = (
                probe.alias("p")
                .join(
                    build.alias("b"),
                    (F.col("p.band_idx") == F.col("b.band_idx"))
                    & (F.col("p.band_key") == F.col("b.band_key"))
                    & (F.col("p.doc_id") != F.col("b.doc_id")),
                )
                .select(
                    F.least("p.doc_id", "b.doc_id").alias("pid"),
                    F.greatest("p.doc_id", "b.doc_id").alias("did"),
                    F.col("p.sig").alias("p_sig"),
                    F.col("b.sig").alias("b_sig"),
                )
                .dropDuplicates(["pid", "did"])
                .select(
                    "pid", "did",
                    (
                        F.aggregate(
                            F.zip_with("p_sig", "b_sig",
                                       lambda x, y: (x == y).cast("int")),
                            F.lit(0),
                            lambda acc, x: acc + x,
                        )
                        / F.lit(float(num_hashes))
                    ).alias("est_jaccard"),
                )
            )
            hits = (
                est.filter(F.col("est_jaccard") >= threshold)
                .groupBy("did")
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_matches"),
                    F.min("pid").alias("min_partner"),
                    F.max("est_jaccard").alias("max_est"),
                )
                .select(F.col("did").alias("doc_id"),
                        "n_matches", "min_partner", "max_est")
            )
            base = batch_sig.select(
                "doc_id",
                F.lit(0).cast("bigint").alias("n_matches"),
                F.lit(None).cast("bigint").alias("min_partner"),
                F.lit(None).cast("double").alias("max_est"),
            )
            delta = base.unionByName(hits)
            with T("07_delta_write"):
                delta.write.mode("overwrite").parquet(
                    f"{flags_dir}/batch={batch_id}")
            with T("08_sig_write_bucketed"):
                bb.repartition("bucket").write.partitionBy("bucket").mode(
                    "overwrite").parquet(f"{sig_dir}/batch={batch_id}")

        t_all = time.perf_counter()
        stream = stream_documents(spark, stage, max_files_per_trigger=1)
        with T("00_start+drain_total"):
            q = (
                stream.writeStream.foreachBatch(merge)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        with T("09_final_stats_read"):
            stats = (
                spark.read.parquet(stats_dir)
                .select("batch_id", "n_hot_buckets", "files_read",
                        "files_prior_total")
                .localCheckpoint()
            )
            stats.write.format("noop").mode("overwrite").save()
        print(f"run {run}: total {time.perf_counter() - t_all:.3f}s",
              file=sys.stderr)
        shutil.rmtree(run_dir, ignore_errors=True)
        spark.streams.resetTerminated()

    inside = sum(v for k, v in AGG.items()
                 if k not in ("00_start+drain_total", "09_final_stats_read"))
    print("\nphase totals over", runs, "runs:")
    for k in sorted(AGG):
        print(f"  {k:26s} {AGG[k]:7.3f}s  ({CNT[k]} calls)")
    print(f"  {'drain minus merge phases':26s} "
          f"{AGG['00_start+drain_total'] - inside:7.3f}s  (streaming machinery)")
    spark.stop()


if __name__ == "__main__":
    main()
