"""Round-12 probes for the split-family additions.

1. Sibling-probe recall: on sf0.01 (cap=100 genuinely trips), recall of
   knn_graph_cellsplit vs knn_graph_cellsplit_probe against the unsplit
   knn_graph_ivf edge set as ground truth, plus candidate-term cost of
   both (Σ per-key |side|·|home-side| fan-out proxy: edge candidates).
2. Recursive split: on a x100 exact-copy mega-cell corpus, the one-round
   split leaves sub-cells at the full multiplicity (exact ties collapse
   to one seed); recursive_cell_split must cap every final sub-cell and
   the candidate term Σ|cell|² with it.

Writes one JSON line to stdout; table rows to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    from pyspark.sql import functions as F

    from gridiron_spark.queries import catalog
    from gridiron_spark.queries.similarity import (
        _SPLIT_CAP,
        _cell_split_assign,
        recursive_cell_split,
    )
    from gridiron_spark.session import get_spark

    spark = get_spark("probe-r12-split")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    sf_dir = "/root/testdata/sf0.01"
    out: dict = {}

    # --- 1. sibling-probe recall vs knn_graph_ivf ground truth
    def edges(name):
        t0 = time.perf_counter()
        s = set(
            map(
                tuple,
                cat[name].spark_fn(spark, sf_dir)
                .select("src", "dst").collect(),
            )
        )
        return s, round(time.perf_counter() - t0, 2)

    true, t_true = edges("knn_graph_ivf")
    home, t_home = edges("knn_graph_cellsplit")
    probe, t_probe = edges("knn_graph_cellsplit_probe")
    out["recall"] = {
        "true_edges": len(true),
        "home_recall": round(len(home & true) / len(true), 4),
        "probe_recall": round(len(probe & true) / len(true), 4),
        "home_s": t_home,
        "probe_s": t_probe,
        "ivf_s": t_true,
    }
    print(
        f"# recall vs knn_graph_ivf ({len(true)} edges): "
        f"home {out['recall']['home_recall']} ({t_home}s) -> "
        f"probe {out['recall']['probe_recall']} ({t_probe}s)",
        file=sys.stderr,
    )

    # --- 2. recursive split on a x100 exact-copy mega-cell
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="r12split_")
    base = [float(i % 7) / 7.0 for i in range(16)]
    n_copies = 100
    rows = [(i, base, 0) for i in range(n_copies)]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")

    def cand_term(remap_df, key):
        sizes = [
            r["n"]
            for r in remap_df.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        ]
        return sum(n * n for n in sizes), max(sizes)

    cap = 8
    _, one_round = _cell_split_assign(spark, tmp, cap=cap)
    before, max_before = cand_term(
        one_round.filter(F.col("home")), ["cid", "sub_cid"]
    )
    rec = recursive_cell_split(spark, tmp, cap=cap, max_rounds=4)
    after, max_after = cand_term(rec, ["cid", "ck"])
    out["recursive_split_x100_exact_copy"] = {
        "cap": cap,
        "one_round_cand_term": before,
        "one_round_max_cell": max_before,
        "recursive_cand_term": after,
        "recursive_max_cell": max_after,
        "reduction_x": round(before / max(after, 1), 1),
    }
    print(
        f"# recursive split x{n_copies} exact-copy: one-round "
        f"Σ|cell|²={before} (max {max_before}) -> recursive "
        f"Σ|cell|²={after} (max {max_after}, cap {cap})",
        file=sys.stderr,
    )
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
