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


# Hot-shingle regime for the prefix-vs-naive crossover: the rename corpus
# keeps per-shingle document frequency CONSTANT (each replica is a disjoint
# vocabulary), which is precisely the regime where the naive inverted-index
# variant stays linear. Real corpora carry boilerplate whose document
# frequency grows WITH n — so phase 2 appends one fixed sentence to a
# constant fraction of docs (SCALE_BP_MOD=m -> 1/m of docs; same sentence
# across replicas, so its shingle DF is n/m). Those pairs sit far below the
# 0.5 Jaccard threshold, so outputs stay identical between the two
# variants — only the naive candidate generator pays the (n/m)² blow-up;
# the prefix filter never indexes hot shingles (they are nobody's rarest).
# Measured (BASELINE.md round-5 section): at m=20 the quadratic term is
# visible but not dominant by x10; at m=4 the crossover flips (naive
# alpha 1.68 vs prefix 0.96, 3x apart at x10).
BOILERPLATE = (
    "all rights reserved contact us for more information terms of service"
)


def build_corpus(k: int, boilerplate_mod: int | None = None) -> str:
    """boilerplate_mod=m appends the fixed sentence to docs with
    doc_id % m == 0 (fraction 1/m)."""
    import duckdb

    out = f"{ROOT}/x{k}b{boilerplate_mod}" if boilerplate_mod else f"{ROOT}/x{k}"
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
    bp = (
        f" || CASE WHEN doc_id % {boilerplate_mod} = 0 THEN ' {BOILERPLATE}' ELSE '' END"
        if boilerplate_mod
        else ""
    )
    con.execute(
        f"""
COPY (
  SELECT doc_id, text{bp} AS text, lang, source,
         CAST(len(text{bp}) AS BIGINT) AS n_chars
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


def build_corpus_emb_distinct(k: int) -> str:
    """Embedding-growth variant: replicas get genuinely NEW vectors
    instead of copies — each replica r applies a cyclic rotation of the
    64 dimensions (7·r positions; 7 ⊥ 64 so every r < 64 is distinct).
    Rotation preserves the corpus geometry exactly (unit norms, the
    10-cluster structure, all within-replica distances) while rotated
    cluster centers become fresh directions, so replica r contributes 10
    NEW clusters of the original density — "new content arriving". A
    rotated copy of a vector is NOT its neighbor (dot of a random unit
    vector with its own rotation ≈ 0). Exact-copy replication, by
    contrast, makes every neighbor structure degenerate (each vector's
    true neighbors are its own copies and duplicate centroids collapse
    into shared cells) — a duplicate-flooded crawl, not a growing corpus.
    (A first draft used md5-uniform elements; all-positive un-normalized
    vectors make the largest-norm centroid win nearly every dot-product
    assignment — a one-giant-cell pathology WORSE than exact copies, and
    nothing like real embedding geometry.)"""
    import duckdb

    out = f"{ROOT}/x{k}e"
    os.makedirs(out, exist_ok=True)
    marker = f"{out}/.complete"
    if os.path.isfile(marker):
        return out
    con = duckdb.connect()
    n_vecs = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
COPY (
  SELECT e.vec_id + r.r * {n_vecs} AS vec_id,
         CASE WHEN r.r = 0 THEN e.embedding
              ELSE list_transform(range(0, 64), i ->
                   e.embedding[CAST((i + 7 * r.r) % 64 + 1 AS INTEGER)])
         END AS embedding,
         e.label
  FROM read_parquet('{SRC}/embeddings.parquet') e
  CROSS JOIN range(0, {k}) r(r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    for t in ALL_TABLES:
        if t == "embeddings":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def build_corpus_doc_distinct(k: int) -> str:
    """Objective-space document-growth variant (round-10, the skyline
    adjudication probe). The plain rename corpus is DEGENERATE for the
    skyline objectives: every replica suffixes every word with the same
    2-char tag, so (n_chars, distinct tokens, diversity) is the SAME
    triple for every replica r >= 1 — an objective-space duplicate flood,
    exactly what the r9 exact-copy probe measured (alpha 1.26: copies of
    a frontier point never dominate each other, all survive). Here
    replica r's suffix is r 'z's + a letter (length r+1), so replica r's
    doc d lands at (n_chars_d + (r+1)·n_words_d, y_d, z_d) — distinct
    per replica, still a bijective vocabulary rename (shingle/dup
    structure preserved within each replica, zero cross-replica
    overlap). Longer-suffix replicas dominate shorter ones that tie on
    (y, z), so the frontier stays output-sensitive instead of growing
    ×k — 'new distinct content arriving', the regime the skyline's
    dedup-first caveat assumes."""
    import duckdb

    out = f"{ROOT}/x{k}d"
    os.makedirs(out, exist_ok=True)
    marker = f"{out}/.complete"
    if os.path.isfile(marker):
        return out
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{SRC}/documents.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
COPY (
  SELECT doc_id, text, lang, source,
         CAST(len(text) AS BIGINT) AS n_chars
  FROM (
    SELECT d.doc_id + r.r * {n_docs} AS doc_id,
           CASE WHEN r.r = 0 THEN d.text
                ELSE array_to_string(list_transform(t,
                       w -> w || repeat('z', CAST(r.r AS INTEGER))
                              || chr(CAST(97 + (r.r % 26) AS INTEGER))), ' ')
           END AS text,
           d.lang, d.source
    FROM (SELECT *, string_split(text, ' ') AS t
          FROM read_parquet('{SRC}/documents.parquet')) d
    CROSS JOIN range(0, {k}) r(r)
  )
) TO '{out}/documents.parquet' (FORMAT PARQUET)
"""
    )
    for t in ALL_TABLES:
        if t == "documents":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def _force(df) -> None:
    """Fully evaluate every output column of every row (noop sink).
    count() is NOT this: Catalyst prunes the final projection and
    eliminates distinct-keyed LEFT joins under count, so flag-style
    queries (semdedup keep flags, k-core membership, pagerank's final
    rank join) time WITHOUT their defining stage — round 10 measured
    semdedup's whole pairwise prune vanishing this way. Phases r6-r9c
    predate this helper; their .count() timings are kept as recorded,
    with the affected adjudications re-measured in round 10."""
    df.write.format("noop").mode("overwrite").save()


def _exponent_table(results: dict, ks: list[int]) -> str:
    klo, khi = sorted(ks)[-2:] if len(ks) >= 2 else (1, ks[0])
    header = (
        "| query | "
        + " | ".join(f"t(x{k}) s" for k in [1] + ks)
        + f" | alpha(x{klo}->x{khi}) |"
    )
    lines = [header, "|---" * (len(ks) + 3) + "|"]
    for q, r in results.items():
        alpha = math.log(max(r[khi], 1e-3) / max(r[klo], 1e-3)) / math.log(khi / klo)
        lines.append(
            f"| {q} | "
            + " | ".join(f"{r[k]:.2f}" for k in [1] + ks)
            + f" | {alpha:.2f} |"
        )
    return "\n".join(lines)


def phase_r6(spark, cat, dirs, ks) -> dict:
    """Round-6 additions to the measured table (round-5 verdict #5): the
    three heavy round-5 entries whose 100 TB claims were still
    plan-guard-only — bpe_merge_sequence (claim: rounds are vocab-bounded;
    the one corpus-scale shuffle is the word-freq collapse),
    winnow_overlap_pairs (claim: the document-frequency cap applied before
    the inverted-index self-join keeps the pair join linear), and
    semdedup_prune (claim: pairwise stage bounded by cluster size; note
    the timing INCLUDES mining the staged converged-centroid artifact,
    keyed per corpus dir, i.e. the full capped-round training) — plus the
    semdedup k-regime probe: at the largest scale, fixed k=8 (clusters
    grow with n -> pairwise fan-out) vs k scaled with n (assignment cost
    grows as n*k -> the disclosed brute-assignment term)."""
    r6 = ("bpe_merge_sequence", "winnow_overlap_pairs", "semdedup_prune")
    results: dict[str, dict[int, float]] = {q: {} for q in r6}
    for k in [1] + ks:
        for q in r6:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, dirs[k]).count()
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k} {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nround-6 additions:")
    print(_exponent_table(results, ks))

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.operators.similarity import kmeans_fit, semdedup_flags

    khi = max(ks)
    emb = load_table(spark, dirs[khi], "embeddings")
    probe: dict[str, float] = {}
    for label, kk in (("fixed_k8", 8), (f"scaled_k{8 * khi}", 8 * khi)):
        t0 = time.perf_counter()
        cents = kmeans_fit(emb, k=kk, rounds=8)
        semdedup_flags(emb, cents, 0.4).count()
        probe[label] = round(time.perf_counter() - t0, 3)
        print(f"# x{khi} semdedup {label}: {probe[label]:.2f}s", file=sys.stderr)
    print(f"\nsemdedup k-regime probe at x{khi} (train+prune, no stage):")
    for label, dt in probe.items():
        print(f"| {label} | {dt:.2f} s |")
    return {"timings": results, "semdedup_k_probe": probe}


def phase_r6_late(spark, cat, dirs, ks) -> dict:
    """Late-round-6 additions: the selection/sketch/PQ/CDC family. All
    four claim alpha ~= 1 by construction — perplexity_filter and
    dsir_select_topk are zero-exchange maps (+ a constant top-N),
    dedup_cdc_chunks is a map + three keyed linear shuffles whose chunk
    directory SHRINKS with duplication, and ann_pq_topk's codebook/ADC
    table stay constant-size while encode scales with the table. A
    measured alpha materially above 1 for any of them would falsify the
    plan-shape story."""
    late = (
        "dedup_cdc_chunks",
        "perplexity_filter",
        "dsir_select_topk",
        "ann_pq_topk",
    )
    results: dict[str, dict[int, float]] = {q: {} for q in late}
    for k in [1] + ks:
        for q in late:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, dirs[k]).count()
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k} {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nround-6 late additions:")
    print(_exponent_table(results, ks))
    return {"timings": results}


def phase_r7(spark, cat, dirs, ks) -> dict:
    """Round-7 additions. Claims under test: bm25 / tfidf /
    ngram_lm_train_score / filter_funnel_report are linear (maps +
    vocabulary-bounded count shuffles; note the rename corpus grows the
    VOCABULARY with k, so the LM/df model tables grow ∝ k — the broadcast
    payload term — while a real corpus's vocabulary grows sub-linearly).
    The two deliberately super-linear entries are reported with their
    adjudication: image_dhash_neardup's hash stage is a map (α≈1) but the
    rename corpus replicates doc_ids mod 50, so planted FAMILY SIZE grows
    ∝ k and the verified-pair OUTPUT grows ∝ k² — an artifact of the
    synthetic families (real corpora grow the family count, not family
    size); pagerank_knn_centrality's centrality panel grows ∝ k, so its
    brute-force edge generator pays panel² exactly like knn_join_topk's
    growing-query-panel term (the iteration itself is linear in |E|)."""
    r7 = (
        "bm25_search_topk",
        "tfidf_topk_terms",
        "ngram_lm_train_score",
        "filter_funnel_report",
        "image_dhash_neardup",
        "pagerank_knn_centrality",
    )
    results: dict[str, dict[int, float]] = {q: {} for q in r7}
    for k in [1] + ks:
        for q in r7:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, dirs[k]).count()
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k} {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nround-7 additions:")
    print(_exponent_table(results, ks))

    # pagerank fixed-panel probe: the growing-panel term above is the edge
    # GENERATOR (panel² dots — knn_join_topk's adjudication); with the
    # panel held at x1 size (mod scaled with k) the edge list and the 4
    # iteration rounds are constant-size, so the timing should be flat —
    # proving the iteration itself carries no corpus-scale term.
    import gridiron_spark.queries.similarity as sim

    khi = max(ks)
    probe: dict[str, float] = {}
    base_mod = sim._PR_MOD
    try:
        for label, corpus_k, mod in (
            ("x1_panel1x", 1, base_mod),
            (f"x{khi}_panel1x", khi, base_mod * khi),
        ):
            sim._PR_MOD = mod
            t0 = time.perf_counter()
            cat["pagerank_knn_centrality"].spark_fn(
                spark, dirs[corpus_k]
            ).count()
            probe[label] = round(time.perf_counter() - t0, 3)
            print(
                f"# pagerank {label} (mod={mod}): {probe[label]:.2f}s",
                file=sys.stderr,
            )
    finally:
        sim._PR_MOD = base_mod
    print(f"\npagerank fixed-panel probe (edge generator isolated):")
    for label, dt in probe.items():
        print(f"| {label} | {dt:.2f} s |")
    return {"timings": results, "pagerank_fixed_panel_probe": probe}


def phase_r9(spark, cat, dirs, ks) -> dict:
    """Round-9 probes, both closing adjudications left open by rounds 6-8.

    1. SemDeDup k-regime, two-level fix (round-6 probe follow-up): the
       brute-force n×k assignment measured 6.4× at k=80/×10; re-measure
       the same train+prune at x{khi} under (a) fixed k=8 brute,
       (b) scaled k=8·khi brute (the round-6 pathology), (c) scaled
       k=8·khi TWO-LEVEL (groups=⌈√k⌉, probes=2 — both training rounds
       and the final assignment go coarse-then-fine). Claim: (c) lands
       near (a)·(pairwise growth), far below (b).

    2. image_dhash fixed-family probe (the pagerank fixed-panel trick):
       the rename corpus replicates doc_ids, so with DHASH_BASES held at
       50 the planted FAMILY SIZE grows ∝k and verified-pair output grows
       ∝k² (α=1.79 measured r7 — adjudicated as synthetic-family
       artifact). Scaling DHASH_BASES with k holds family size constant
       (real corpora grow the family COUNT): hash stage is a map, band
       join output now grows ∝k, so α should fall to ≈1."""
    import math as _math

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.operators.similarity import kmeans_fit, semdedup_flags, two_level_assign

    khi = max(ks)
    probe: dict[str, float] = {}
    kk = 8 * khi
    g = _math.isqrt(kk) + (0 if _math.isqrt(kk) ** 2 == kk else 1)
    for label, corpus_k, k_clusters, two_level in (
        ("x1_k8_brute", 1, 8, False),
        (f"x{khi}_k8_brute", khi, 8, False),
        (f"x{khi}_k{kk}_brute", khi, kk, False),
        (f"x{khi}_k{kk}_twolevel_g{g}", khi, kk, True),
    ):
        emb = load_table(spark, dirs[corpus_k], "embeddings")
        t0 = time.perf_counter()
        if two_level:
            cents = kmeans_fit(emb, k=k_clusters, rounds=8,
                               two_level_groups=g)
            assign = two_level_assign(emb, cents, groups=g, probes=2)
            semdedup_flags(emb, cents, 0.4, assign=assign).count()
        else:
            cents = kmeans_fit(emb, k=k_clusters, rounds=8)
            semdedup_flags(emb, cents, 0.4).count()
        probe[label] = round(time.perf_counter() - t0, 3)
        print(f"# semdedup {label}: {probe[label]:.2f}s", file=sys.stderr)
        spark._jvm.System.gc()
    print(f"\nsemdedup two-level k-regime probe (train+prune, no stage):")
    for label, dt in probe.items():
        print(f"| {label} | {dt:.2f} s |")

    import gridiron_spark.operators.multimodal as mm

    dh: dict[str, float] = {}
    base = mm.DHASH_BASES
    try:
        for label, corpus_k, bases in (
            ("x1_fam50", 1, base),
            (f"x{khi}_fam50x{khi}", khi, base * khi),
        ):
            mm.DHASH_BASES = bases
            t0 = time.perf_counter()
            n = cat["image_dhash_neardup"].spark_fn(
                spark, dirs[corpus_k]
            ).count()
            dh[label] = round(time.perf_counter() - t0, 3)
            print(
                f"# dhash {label} (bases={bases}): {dh[label]:.2f}s"
                f" ({n} pairs)",
                file=sys.stderr,
            )
            spark._jvm.System.gc()
    finally:
        mm.DHASH_BASES = base
    alpha = _math.log(max(dh[f"x{khi}_fam50x{khi}"], 1e-3)
                      / max(dh["x1_fam50"], 1e-3)) / _math.log(khi)
    print(f"\nimage_dhash fixed-family probe: alpha(x1->x{khi}) = {alpha:.2f}")
    for label, dt in dh.items():
        print(f"| {label} | {dt:.2f} s |")
    return {"semdedup_two_level_probe": probe,
            "dhash_fixed_family_probe": dh,
            "dhash_fixed_family_alpha": round(alpha, 3)}


def main() -> None:
    args = [a for a in sys.argv[1:]
            if a not in ("--r6", "--r6-late", "--r7", "--r9", "--r9b",
                         "--r9c", "--r10", "--r10b", "--r10c", "--r10d",
                         "--r11", "--r11b")]
    only_r6 = "--r6" in sys.argv[1:]
    only_r6_late = "--r6-late" in sys.argv[1:]
    only_r7 = "--r7" in sys.argv[1:]
    only_r9 = "--r9" in sys.argv[1:]
    only_r9b = "--r9b" in sys.argv[1:]
    only_r9c = "--r9c" in sys.argv[1:]
    only_r10 = "--r10" in sys.argv[1:]
    only_r10b = "--r10b" in sys.argv[1:]
    only_r10c = "--r10c" in sys.argv[1:]
    only_r10d = "--r10d" in sys.argv[1:]
    only_r11 = "--r11" in sys.argv[1:]
    only_r11b = "--r11b" in sys.argv[1:]
    ks = [int(a) for a in args] or [3, 10]
    from gridiron_spark.queries import catalog
    from gridiron_spark.session import get_spark

    spark = get_spark("gridiron-scale")
    spark.sparkContext.setLogLevel("ERROR")
    cat = catalog()

    if only_r11:
        # builds its own corpora (embeddings-only exact copies)
        r11 = phase_r11(spark, cat, {1: SRC}, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r11.json", "w") as f:
            json.dump({**r11}, f, indent=1)
        spark.stop()
        return

    if only_r10d:
        # builds its own corpora (distinct-embedding)
        r10d = phase_r10d(spark, cat, {1: SRC}, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r10d.json", "w") as f:
            json.dump({"scales": [1] + ks, **r10d}, f, indent=1)
        spark.stop()
        return

    if only_r10:
        # builds its own corpora (distinct-embedding + distinct-objective)
        r10 = phase_r10(spark, cat, {1: SRC}, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r10.json", "w") as f:
            json.dump({"scales": [1] + ks, **r10}, f, indent=1)
        spark.stop()
        return

    if only_r10b:
        # builds its own corpora (embeddings-only exact copies)
        r10b = phase_r10b(spark, cat, {1: SRC}, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r10b.json", "w") as f:
            json.dump({**r10b}, f, indent=1)
        spark.stop()
        return

    dirs = {1: SRC}
    for k in ks:
        print(f"# building x{k} corpus ...", file=sys.stderr)
        dirs[k] = build_corpus(k)

    if only_r10c:
        r10c = phase_r10c(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r10c.json", "w") as f:
            json.dump({"scales": [1] + ks, **r10c}, f, indent=1)
        spark.stop()
        return

    if only_r11b:
        r11b = phase_r11b(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r11b.json", "w") as f:
            json.dump({"scales": [1] + ks, **r11b}, f, indent=1)
        spark.stop()
        return

    if only_r9b:
        r9b = phase_r9b(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r9b.json", "w") as f:
            json.dump({"scales": [1] + ks, **r9b}, f, indent=1)
        spark.stop()
        return

    if only_r9c:
        r9c = phase_r9c(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r9c.json", "w") as f:
            json.dump({"scales": [1] + ks, **r9c}, f, indent=1)
        spark.stop()
        return

    if only_r9:
        r9 = phase_r9(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r9.json", "w") as f:
            json.dump({"scales": [1] + ks, **r9}, f, indent=1)
        spark.stop()
        return

    if only_r7:
        r7 = phase_r7(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r7.json", "w") as f:
            json.dump({"scales": [1] + ks, **r7}, f, indent=1)
        spark.stop()
        return

    if only_r6_late:
        r6b = phase_r6_late(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r6_late.json", "w") as f:
            json.dump({"scales": [1] + ks, **r6b}, f, indent=1)
        spark.stop()
        return

    if only_r6:
        r6 = phase_r6(spark, cat, dirs, ks)
        os.makedirs(ROOT, exist_ok=True)
        with open(f"{ROOT}/report_r6.json", "w") as f:
            json.dump({"scales": [1] + ks, **r6}, f, indent=1)
        spark.stop()
        return

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

    # exponent over the two LARGEST scales: the x1 pass runs on a cold JVM
    # (first queries of the session), so t(x1) carries warm-up that would
    # understate alpha; the larger scales are both warm and dominate any
    # fixed overhead.
    klo, khi = sorted(ks)[-2:] if len(ks) >= 2 else (1, ks[0])
    header = (
        "| query | "
        + " | ".join(f"t(x{k}) s" for k in [1] + ks)
        + f" | alpha(x{klo}->x{khi}) |"
    )
    sep = "|---" * (len(ks) + 3) + "|"
    lines = [header, sep]
    for q in HEAVY:
        r = results[q]
        alpha = math.log(max(r[khi], 1e-3) / max(r[klo], 1e-3)) / math.log(khi / klo)
        lines.append(
            f"| {q} | "
            + " | ".join(f"{r[k]:.2f}" for k in [1] + ks)
            + f" | {alpha:.2f} |"
        )
    table = "\n".join(lines)
    print(table)

    # phase 2: the hot-shingle crossover (naive vs prefix only)
    bp_mod = int(os.environ.get("SCALE_BP_MOD", "4"))
    bp_dirs = {}
    for k in [1] + ks:
        print(f"# building x{k}b{bp_mod} (boilerplate) corpus ...", file=sys.stderr)
        bp_dirs[k] = build_corpus(k, boilerplate_mod=bp_mod)
    bp_results: dict[str, dict[int, float]] = {
        q: {} for q in ("dedup_ngram_jaccard", "dedup_ngram_prefix")
    }
    for k in [1] + ks:
        for q in bp_results:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, bp_dirs[k]).count()
            dt = time.perf_counter() - t0
            bp_results[q][k] = round(dt, 3)
            print(f"# x{k}b {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nhot-shingle (5% boilerplate) crossover:")
    lines = [header, sep]
    for q, r in bp_results.items():
        alpha = math.log(max(r[khi], 1e-3) / max(r[klo], 1e-3)) / math.log(khi / klo)
        lines.append(
            f"| {q} | "
            + " | ".join(f"{r[k]:.2f}" for k in [1] + ks)
            + f" | {alpha:.2f} |"
        )
    print("\n".join(lines))

    with open(f"{ROOT}/report.json", "w") as f:
        json.dump(
            {"scales": [1] + ks, "timings": results, "boilerplate": bp_results},
            f,
            indent=1,
        )
    spark.stop()


def phase_r9b(spark, cat, dirs, ks) -> dict:
    """Scaling exponents for the round-9 additions. Stories (measured,
    BASELINE.md round-9b): knn_graph_ivf — FIXED stride keeps cell
    population constant as the corpus grows, so the CANDIDATE join is
    linear by construction, but centroid count C grows with n, so the
    single-level n×C assignment fan-out measured alpha~1.5-2.0; the
    two-level assignment landed in response drops it to ~0.5 at this
    size. The domain/url family is maps + map-side-combined aggregates
    (alpha<=1); semdedup_two_level holds k fixed here so assignment is
    linear and the pairwise stage grows with cluster size;
    hll_rollup_merge is one map-side pass into bounded register
    tables."""
    r9 = (
        "knn_graph_ivf",
        "semdedup_two_level",
        "url_canonical_dedup",
        "domain_cap_keep",
        "domain_contamination_rollup",
        "domain_holdout_split",
        "hll_rollup_merge",
    )
    results: dict[str, dict[int, float]] = {q: {} for q in r9}
    for k in [1] + ks:
        for q in r9:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, dirs[k]).count()
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k} {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nround-9 additions:")
    print(_exponent_table(results, ks))

    # knn_graph_ivf isolation: exact-copy replication makes every vector's
    # true neighbors its own copies and collapses duplicate centroids into
    # shared cells — cell population grows with multiplicity and the
    # candidate join pays multiplicity² (a duplicate-flooded crawl, the
    # input you dedup BEFORE graph-building). The distinct-embedding
    # corpus models new content arriving: cells multiply while their
    # population stays ~stride·probes, so the operator itself is linear.
    dirs_e = {1: SRC}
    for k in ks:
        print(f"# building x{k}e (distinct embeddings) corpus ...",
              file=sys.stderr)
        dirs_e[k] = build_corpus_emb_distinct(k)
    iso: dict[str, dict[int, float]] = {"knn_graph_ivf": {}}
    for k in [1] + ks:
        t0 = time.perf_counter()
        n = cat["knn_graph_ivf"].spark_fn(spark, dirs_e[k]).count()
        dt = time.perf_counter() - t0
        iso["knn_graph_ivf"][k] = round(dt, 3)
        print(f"# x{k}e knn_graph_ivf: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nknn_graph_ivf distinct-embedding isolation:")
    print(_exponent_table(iso, ks))
    return {"timings": results, "knn_graph_distinct_emb": iso}


def phase_r9c(spark, cat, dirs, ks) -> dict:
    """Scaling exponents for the late-round-9 additions. Expected
    stories: label_propagation_knn rides the brute panel edge generator
    (panel = a fixed 1/25 fraction, so pair generation is the known
    alpha~2 term shared by the whole panel graph family — the rounds
    themselves are linear in |E|, and the corpus-grain story swaps the
    generator for knn_graph_ivf's cell-join edges);
    domain_quality_threshold_keep and skyline_pareto_docs are
    histogram-aggregate + broadcast-join-back linear passes;
    quantile_normalize_scores and epoch_shuffle_interleave are
    range-exchange ranks (one/two linear shuffles);
    bitmap_posting_index is one map-side-combined bit_or (linear, with
    the 63× stopword-mask compression realized pre-exchange);
    pca_power_projection is one mapInPandas Gram pass + a map-only
    projection (linear; the iteration is corpus-independent driver
    work). documents-table queries use the replica corpus (documents
    grow ×k); pca/LPA ride embeddings (also replicated ×k)."""
    r9c = (
        "label_propagation_knn",
        "domain_quality_threshold_keep",
        "quantile_normalize_scores",
        "pca_power_projection",
        "bitmap_posting_index",
        "skyline_pareto_docs",
        "epoch_shuffle_interleave",
        "community_lpa_ivf",
        "skyline_pareto_3d",
        "harmonic_centrality_knn",
    )
    results: dict[str, dict[int, float]] = {q: {} for q in r9c}
    for k in [1] + ks:
        for q in r9c:
            t0 = time.perf_counter()
            n = cat[q].spark_fn(spark, dirs[k]).count()
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k} {q}: {dt:.2f}s ({n} rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nlate round-9 additions:")
    print(_exponent_table(results, ks))
    return {"timings": results}


def phase_r10(spark, cat, dirs, ks) -> dict:
    """Round-10 probes. (a) The corpus-grain graph family
    (pagerank/harmonic/k-core over IVF edges) on the DISTINCT-embedding
    corpora — the round-9b isolation protocol: rotated replicas add new
    clusters of the original density, so cells multiply while their
    population stays ~stride·probes and the whole chain (edge build +
    rounds) should be ~linear, vs the panel family's measured alpha=2
    pair generator. (b) skyline_pareto_3d on the variable-suffix
    DISTINCT-objective corpora — the r9 adjudication ('dedup before
    skyline') measured at doc grain: distinct content keeps the frontier
    output-sensitive, so the candidate broadcast must NOT grow ×k and
    alpha should be ~linear or below."""
    graph = (
        "knn_graph_ivf",  # the shared edge generator, as the reference row
        "pagerank_ivf_centrality",
        "harmonic_centrality_ivf",
        "kcore_decompose_ivf",
    )
    dirs_e = {1: SRC}
    for k in ks:
        print(f"# building x{k}e (distinct embeddings) corpus ...",
              file=sys.stderr)
        dirs_e[k] = build_corpus_emb_distinct(k)
    results: dict[str, dict[int, float]] = {q: {} for q in graph}
    for k in [1] + ks:
        for q in graph:
            t0 = time.perf_counter()
            _force(cat[q].spark_fn(spark, dirs_e[k]))
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k}e {q}: {dt:.2f}s", file=sys.stderr)
        spark._jvm.System.gc()
    print("\ncorpus-grain graph family, distinct-embedding growth:")
    print(_exponent_table(results, ks))

    dirs_d = {1: SRC}
    for k in ks:
        print(f"# building x{k}d (distinct doc objectives) corpus ...",
              file=sys.stderr)
        dirs_d[k] = build_corpus_doc_distinct(k)
    sky: dict[str, dict[int, float]] = {"skyline_pareto_3d": {}}
    frontier: dict[int, int] = {}
    for k in [1] + ks:
        t0 = time.perf_counter()
        _force(cat["skyline_pareto_3d"].spark_fn(spark, dirs_d[k]))
        dt = time.perf_counter() - t0
        sky["skyline_pareto_3d"][k] = round(dt, 3)
        frontier[k] = cat["skyline_pareto_3d"].spark_fn(
            spark, dirs_d[k]
        ).count()
        print(f"# x{k}d skyline_pareto_3d: {dt:.2f}s "
              f"({frontier[k]} frontier rows)", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nskyline_pareto_3d distinct-objective growth "
          f"(frontier sizes {frontier}):")
    print(_exponent_table(sky, ks))
    return {"graph_distinct_emb": results, "skyline_distinct_doc": sky,
            "skyline_frontier_rows": frontier}


def build_corpus_emb_copies(k: int) -> str:
    """Embeddings-only ×k replication (exact copies, vec_id offsets) —
    the prune-stage probe's growth axis: cluster sizes grow ∝ k at fixed
    cluster count, which is exactly the regime where the intra-cluster
    pairwise prune pays Σ|cluster|²."""
    import duckdb

    out = f"{ROOT}/x{k}emb"
    os.makedirs(out, exist_ok=True)
    marker = f"{out}/.complete"
    if os.path.isfile(marker):
        return out
    con = duckdb.connect()
    nv = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{SRC}/embeddings.parquet')"
    ).fetchone()[0]
    con.execute(
        f"""
COPY (
  SELECT e.vec_id + r.r * {nv} AS vec_id, e.embedding, e.label
  FROM read_parquet('{SRC}/embeddings.parquet') e
  CROSS JOIN range(0, {k}) r(r)
) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
"""
    )
    for t in ALL_TABLES:
        if t == "embeddings":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{t}.parquet", dst)
    open(marker, "w").close()
    return out


def phase_r10b(spark, cat, dirs, ks) -> dict:
    """SemDeDup prune-stage probe, v2 — the honest one. The round-9
    'residual prune super-linearity' adjudication dissolved under
    scrutiny twice over: (a) probe timings (and bench) used .count(),
    under which Catalyst ELIMINATES the keep-flag left join — the prune
    never executed in any previous timing; (b) at catalog corpus sizes
    the clusters are too small for the Σ|cluster|² term to matter
    anyway. This probe isolates the PRUNE STAGE alone (assignment
    eagerly checkpointed outside the timer), forces full evaluation via
    the noop sink, and grows CLUSTER SIZE directly (fixed k=8 over ×k
    exact-copy embeddings): full prune pays Σ|cluster|²/2 cosines and
    must go quadratic in k; the rank-window prefix prune pays
    Σ R·|cluster| and must stay ~linear."""
    import math as _math

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.operators.similarity import (
        kmeans_fit,
        lloyd_assign,
        semdedup_flags,
    )
    from gridiron_spark.queries.similarity import _SD2_RANK_WINDOW

    scales = [10, 30] + ([100] if os.environ.get("PRUNE_X100") == "1"
                         else [])
    probe: dict[str, float] = {}
    sizes: dict[int, int] = {}
    for k in scales:
        corpus = build_corpus_emb_copies(k)
        emb = load_table(spark, corpus, "embeddings")
        cents = kmeans_fit(emb, k=8, rounds=8)
        assign = lloyd_assign(emb, cents).localCheckpoint()  # outside timer
        sizes[k] = max(
            r["count"]
            for r in assign.groupBy("cluster").count().collect()
        )
        for window, wl in ((_SD2_RANK_WINDOW, f"prefixR{_SD2_RANK_WINDOW}"),
                           (None, "full")):
            if window is None and k > 30:
                continue  # ~(k/30)² × the x30 time — estimated, not run
            _force(semdedup_flags(emb, None, 0.4, assign=assign,
                                  prune_rank_window=window))  # warm
            t0 = time.perf_counter()
            _force(semdedup_flags(emb, None, 0.4, assign=assign,
                                  prune_rank_window=window))
            probe[f"x{k}emb_{wl}"] = round(time.perf_counter() - t0, 3)
            print(f"# prune x{k}emb (maxclust {sizes[k]}) {wl}: "
                  f"{probe[f'x{k}emb_{wl}']:.2f}s", file=sys.stderr)
            spark._jvm.System.gc()
    alphas = {}
    for wl in (f"prefixR{_SD2_RANK_WINDOW}", "full"):
        lo, hi = f"x10emb_{wl}", f"x30emb_{wl}"
        if lo in probe and hi in probe:
            alphas[wl] = round(
                _math.log(max(probe[hi], 1e-3) / max(probe[lo], 1e-3))
                / _math.log(3), 3)
    print(f"\nsemdedup ISOLATED prune-stage probe (k=8, cluster sizes "
          f"{sizes}; alpha x10->x30 {alphas}):")
    for label, dt in probe.items():
        print(f"| {label} | {dt:.2f} s |")
    return {"prune_stage_probe": probe, "max_cluster": sizes,
            "alpha": alphas}


def phase_r11(spark, cat, dirs, ks) -> dict:
    """Round-11 self-protection probe: the GUARDED exact prune
    (exact_cap=_SD_EXACT_CAP — what the catalog entries semdedup_prune /
    semdedup_two_level now run) on the same exact-copy corpora as the
    r10b probe. In contract (max|cluster| ≤ cap) the guard is inert and
    the time is the exact prune's; out of contract it must auto-degrade
    to the R=cap rank-window prune and stay bounded — the ×30emb exact
    time was 1 099.6 s, the guarded entry must land near the prefix
    regime plus the one-job census. Same protocol: assignment eagerly
    checkpointed outside the timer, noop-sink forced evaluation."""
    import math as _math

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.operators.similarity import (
        kmeans_fit,
        lloyd_assign,
        semdedup_flags,
    )
    from gridiron_spark.queries.similarity import _SD_EXACT_CAP

    probe: dict[str, float] = {}
    sizes: dict[int, int] = {}
    for k in [10, 30]:
        corpus = build_corpus_emb_copies(k)
        emb = load_table(spark, corpus, "embeddings")
        cents = kmeans_fit(emb, k=8, rounds=8)
        assign = lloyd_assign(emb, cents).localCheckpoint()  # outside timer
        sizes[k] = max(
            r["count"]
            for r in assign.groupBy("cluster").count().collect()
        )
        _force(semdedup_flags(emb, None, 0.4, assign=assign,
                              exact_cap=_SD_EXACT_CAP))  # warm
        t0 = time.perf_counter()
        _force(semdedup_flags(emb, None, 0.4, assign=assign,
                              exact_cap=_SD_EXACT_CAP))
        probe[f"x{k}emb_guarded"] = round(time.perf_counter() - t0, 3)
        print(f"# guarded prune x{k}emb (maxclust {sizes[k]}, cap "
              f"{_SD_EXACT_CAP}): {probe[f'x{k}emb_guarded']:.2f}s",
              file=sys.stderr)
        spark._jvm.System.gc()
    alpha = round(
        _math.log(max(probe["x30emb_guarded"], 1e-3)
                  / max(probe["x10emb_guarded"], 1e-3)) / _math.log(3), 3)
    print(f"\nsemdedup GUARDED exact prune (cap {_SD_EXACT_CAP}, cluster "
          f"sizes {sizes}; alpha x10->x30 {alpha}):")
    for label, dt in probe.items():
        print(f"| {label} | {dt:.2f} s |")

    # --- ivf_cell_split: |cell|² candidate-term bound on the adversarial
    # exact-copy corpus. The split entry's own output (cid, sub_cid,
    # n_members) carries both sides: before = Σ(Σ n_members per cid)²,
    # after = Σ n_members² — the candidate terms of the cell self-join
    # on the original vs post-split cell map.
    split_probe: dict[str, dict] = {}
    for k in [10, 30]:
        corpus = build_corpus_emb_copies(k)
        _force(cat["ivf_cell_split"].spark_fn(spark, corpus))  # warm
        t0 = time.perf_counter()
        rows = cat["ivf_cell_split"].spark_fn(spark, corpus).collect()
        dt = round(time.perf_counter() - t0, 3)
        by_cid: dict[int, int] = {}
        after = 0
        for r in rows:
            by_cid[r["cid"]] = by_cid.get(r["cid"], 0) + r["n_members"]
            after += r["n_members"] ** 2
        before = sum(n * n for n in by_cid.values())
        split_probe[f"x{k}emb"] = {
            "sec": dt, "cells_before": len(by_cid), "cells_after": len(rows),
            "cand_before": before, "cand_after": after,
            "reduction_x": round(before / max(after, 1), 1),
        }
        print(f"# cell_split x{k}emb: {dt:.2f}s, candidate term "
              f"{before} -> {after} "
              f"({split_probe[f'x{k}emb']['reduction_x']}x)",
              file=sys.stderr)
        spark._jvm.System.gc()
    print("\nivf_cell_split candidate-term bound (exact-copy corpus):")
    for label, d in split_probe.items():
        print(f"| {label} | {d['sec']:.2f} s | cells {d['cells_before']}"
              f"->{d['cells_after']} | Σ|cell|² {d['cand_before']}"
              f"->{d['cand_after']} ({d['reduction_x']}×) |")
    return {"guarded_prune_probe": probe, "max_cluster": sizes,
            "alpha": alpha, "exact_cap": _SD_EXACT_CAP,
            "cell_split_probe": split_probe}


def phase_r11b(spark, cat, dirs, ks) -> dict:
    """Growth exponents for the round-11 additions: the cell-split pair
    (ivf_cell_split, knn_graph_cellsplit) rides the DISTINCT-embedding
    corpora (the round-9b IVF isolation protocol; knn_graph_ivf rides
    along as the shared-generator reference row), and
    streaming_incremental_dedup_e2e rides the rename corpus at doc grain
    (every replica distinct — the side-car, the band join, and the flag
    state all grow ×k; the drain replays the whole stream per run, so
    the timing covers staging + 4 shard merges end to end). All batch
    entries forced through the noop sink; the streaming entry's own
    drain forces itself."""
    emb_qs = ("knn_graph_ivf", "ivf_cell_split", "knn_graph_cellsplit")
    doc_qs = ("streaming_incremental_dedup_e2e",)
    dirs_e = {1: SRC}
    for k in ks:
        print(f"# building x{k}e (distinct embeddings) corpus ...",
              file=sys.stderr)
        dirs_e[k] = build_corpus_emb_distinct(k)
    results: dict[str, dict[int, float]] = {}
    for qs, dd in ((emb_qs, dirs_e), (doc_qs, dirs)):
        for q in qs:
            results[q] = {}
            for k in [1] + ks:
                t0 = time.perf_counter()
                _force(cat[q].spark_fn(spark, dd[k]))
                dt = time.perf_counter() - t0
                results[q][k] = round(dt, 3)
                print(f"# x{k} {q}: {dt:.2f}s", file=sys.stderr)
            spark._jvm.System.gc()
    print("\nround-11 additions, distinct-content growth (forced eval):")
    print(_exponent_table(results, ks))
    return {"timings": results}


def phase_r10c(spark, cat, dirs, ks) -> dict:
    """Growth exponents for the remaining round-10 additions (the graph
    twins and skyline have their own probes): tokenizer_fertility_gate
    rides the rename corpus (distinct vocab per replica — the train
    split and the explode both grow ×k, the vocab grows ×k too so the
    broadcast stays vocab-sized); hard_negative_mining and
    ranking_eval_topk ride the DISTINCT-embedding corpus (the IVF
    candidate chain's isolation protocol); embedding_drift_monitor and
    semdedup_prefix_prune ride exact-copy embeddings (drift is a pure
    linear pass; the prefix prune's bound is the point of its own r10b
    probe — here it runs train+assign+prune end to end). All forced
    through the noop sink."""
    doc_qs = ("tokenizer_fertility_gate",)
    emb_qs = ("hard_negative_mining", "ranking_eval_topk")
    copy_qs = ("embedding_drift_monitor", "semdedup_prefix_prune")
    dirs_e = {1: SRC}
    dirs_c = {1: SRC}
    for k in ks:
        dirs_e[k] = build_corpus_emb_distinct(k)
        dirs_c[k] = build_corpus_emb_copies(k)
    results: dict[str, dict[int, float]] = {}
    for qs, dd in ((doc_qs, dirs), (emb_qs, dirs_e), (copy_qs, dirs_c)):
        for q in qs:
            results[q] = {}
            for k in [1] + ks:
                t0 = time.perf_counter()
                _force(cat[q].spark_fn(spark, dd[k]))
                dt = time.perf_counter() - t0
                results[q][k] = round(dt, 3)
                print(f"# x{k} {q}: {dt:.2f}s", file=sys.stderr)
            spark._jvm.System.gc()
    print("\nround-10 additions, distinct-content growth (forced eval):")
    print(_exponent_table(results, ks))
    return {"timings": results}


def phase_r10d(spark, cat, dirs, ks) -> dict:
    """Growth exponents for the second-wave round-10 additions on the
    DISTINCT-embedding corpora (the round-9b IVF isolation protocol):
    triangle_count_ivf (the last panel-only graph query's corpus-grain
    twin) and decontaminate_semantic_ivf (panel-to-corpus screen — the
    benchmark panel grows with vec_id range, so the screen side scales
    with the corpus while staying cell-bucketed); knn_graph_ivf rides
    along as the shared-generator reference row, and kcore_decompose_ivf
    re-measures post peel-round materialization (its round-10 table row
    predates the fix). All forced through the noop sink."""
    probe = (
        "knn_graph_ivf",  # shared edge generator, reference row
        "triangle_count_ivf",
        "decontaminate_semantic_ivf",
        "kcore_decompose_ivf",  # re-measure after the peel-round fix
    )
    dirs_e = {1: SRC}
    for k in ks:
        print(f"# building x{k}e (distinct embeddings) corpus ...",
              file=sys.stderr)
        dirs_e[k] = build_corpus_emb_distinct(k)
    results: dict[str, dict[int, float]] = {q: {} for q in probe}
    for k in [1] + ks:
        for q in probe:
            t0 = time.perf_counter()
            _force(cat[q].spark_fn(spark, dirs_e[k]))
            dt = time.perf_counter() - t0
            results[q][k] = round(dt, 3)
            print(f"# x{k}e {q}: {dt:.2f}s", file=sys.stderr)
        spark._jvm.System.gc()
    print("\nsecond-wave round-10 additions, distinct-embedding growth:")
    print(_exponent_table(results, ks))

    # quantile_rollup_merge is events-grain: ride the generic ×k corpus
    # (events replicate with shifted ids/types — the r6 protocol). One
    # linear shard pass + register-table-sized merge ⇒ α ≈ linear-or-below.
    dirs_g = {1: SRC}
    for k in ks:
        print(f"# building x{k} corpus ...", file=sys.stderr)
        dirs_g[k] = build_corpus(k)
    qr: dict[str, dict[int, float]] = {"quantile_rollup_merge": {}}
    for k in [1] + ks:
        t0 = time.perf_counter()
        _force(cat["quantile_rollup_merge"].spark_fn(spark, dirs_g[k]))
        dt = time.perf_counter() - t0
        qr["quantile_rollup_merge"][k] = round(dt, 3)
        print(f"# x{k} quantile_rollup_merge: {dt:.2f}s", file=sys.stderr)
    print("\nquantile rollup, generic corpus growth:")
    print(_exponent_table(qr, ks))
    results.update(qr)
    return {"timings": results}


if __name__ == "__main__":
    main()
