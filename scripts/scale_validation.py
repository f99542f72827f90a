"""Empirical scale validation of the heavy query tail (round-5 verdict #2).

The 100 TB claims are otherwise enforced only by plan-shape guards; this
script measures them. It synthesizes k× corpora from sf0.1 into /tmp (never
touching /root/testdata), times the heavy entries at each scale on the same
session, and reports per-query scaling exponents
``alpha = ln(t_k/t_1)/ln(k)`` (alpha ≈ 1 → linear, 2 → quadratic).

Corpus construction keeps the STATISTICS of the original while making
replicas genuinely distinct, so pair-generating operators scale the way a
real bigger corpus would instead of degenerating into k near-identical
copies of every document (which would quadratically explode every near-dup
operator by construction — a first attempt that ROTATED each word sequence
failed exactly this way: rotation preserves ~95% of a doc's word 3-grams,
so every replica was a 0.9-Jaccard near-dup of its source):

- documents: replica r suffixes every word with a per-replica tag built
  from letters ABSENT from the corpus alphabet ('z' + letter(r)) — a
  bijective vocabulary rename, so each replica's internal shingle/dup
  structure is exactly the original corpus's while cross-replica shingle
  overlap is zero. Word-frequency distribution, doc lengths, and per-doc
  shingle counts are preserved up to the constant suffix; doc_id offset
  per replica.
- embeddings: replica copies with vec_id offsets (timing-neutral for the
  scoring kernels; the knn query set vec_id % 25 == 0 grows with the
  corpus, which the report calls out).

Usage: python scripts/scale_validation.py [k ...]   (default: 3 10)
Writes /tmp/gridiron_scale/report.json and prints a BASELINE.md-ready table.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/gridiron_scale"
HEAVY = (
    "corpus_clean_pipeline",
    "dedup_clusters_star",
    "dedup_ngram_prefix",
    "dedup_ngram_jaccard",
    "mllib_minhash_sim_join",
    "mllib_minhash_banded",
    "knn_join_topk",
    "dup_span_coverage",
)
ALL_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def build_corpus(k: int) -> str:
    import duckdb

    out = f"{ROOT}/x{k}"
    os.makedirs(out, exist_ok=True)
    marker = f"{out}/.complete"
    if os.path.isfile(marker):
        return out
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    n_vecs = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    # per-replica word tag: 'z' (absent from the corpus alphabet) + a
    # replica letter — a bijective vocab rename per replica
    con.execute(
        f"""
COPY (
  SELECT doc_id, text, lang, source,
         CAST(len(text) AS BIGINT) AS n_chars
  FROM (
    SELECT d.doc_id + r.r * {n_docs} AS doc_id,
           CASE WHEN r.r = 0 THEN d.text
                ELSE array_to_string(list_transform(t,
                       w -> w || 'z' || chr(CAST(97 + (r.r % 26) AS INTEGER))), ' ')
           END AS text,
           d.lang, d.source
    FROM (SELECT *, string_split(text, ' ') AS t
          FROM read_parquet('{SRC}/documents.parquet')) d
    CROSS JOIN range(0, {k}) r(r)
  )
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )
    con.execute(
        f"""
COPY (
  SELECT e.vec_id + r.r * {n_vecs} AS vec_id, e.embedding, e.label
  FROM read_parquet('{SRC}/embeddings.parquet') e
  CROSS JOIN range(0, {k}) r(r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    for t in ALL_TABLES:
        if t in ("documents", "embeddings"):
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [3, 10]
    from gridiron_spark.queries import catalog
    from gridiron_spark.session import get_spark

    spark = get_spark("gridiron-scale")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()
    dirs = {1: SRC}
    for k in ks:
        print(f"# building x{k} corpus ...", file=sys.stderr)
        dirs[k] = build_corpus(k)

    results: dict[str, dict[int, float]] = {q: {} for q in HEAVY}
    for k in [1] + ks:
        for q in HEAVY:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, dirs[k]).count()
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k} {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        for tbl in spark.catalog.listTables():
            if tbl.isTemporary:
                spark.catalog.dropTempView(tbl.name)
        spark._jvm.System.gc()

    kmax = max(ks)
    header = "| query | " + " | ".join(f"t(x{k}) s" for k in [1] + ks) + " | alpha(x{}) |".format(kmax)
    sep = "|---" * (len(ks) + 3) + "|"
    lines = [header, sep]
    for q in HEAVY:
        r = results[q]
        alpha = math.log(r[kmax] / r[1]) / math.log(kmax)
        lines.append(
            f"| {q} | "
            + " | ".join(f"{r[k]:.2f}" for k in [1] + ks)
            + f" | {alpha:.2f} |"
        )
    table = "\n".join(lines)
    print(table)
    with open(f"{ROOT}/report.json", "w") as f:
        json.dump({"scales": [1] + ks, "timings": results}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
