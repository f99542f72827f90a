"""Behavioral pins for the round-9 session-2 operators — properties the
oracle hash can't state directly: PCA alignment with a float eigensolver,
bitmap popcounts vs exact distinct postings, skyline vs the O(n²) brute
frontier, and the epoch shuffle being a balanced permutation."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from gridiron_spark.io.tables import load_table
from gridiron_spark.queries import catalog
from tests.conftest import SF_SMALL

_CATALOG = catalog()


def _quantized(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    return {
        r["vec_id"]: r["q"]
        for r in emb.select(
            "vec_id",
            F.transform(
                "embedding", lambda x: F.floor(x.cast("double") * 64).cast("bigint")
            ).alias("q"),
        ).collect()
    }


def test_pca_projection_aligns_with_numpy_eigensolver(spark):
    """The integer power iteration is an approximation of the top
    eigenvector of G = Σqqᵀ; after 4 rounds on a PSD matrix with a real
    spectral gap the projections must be COLLINEAR with numpy's exact
    float eigenprojection (|cosine| ≈ 1 over the doc axis), while
    staying bit-exact integers (the oracle pins the exact values)."""
    import numpy as np

    qs = _quantized(spark)
    out = {
        r["vec_id"]: r["proj"]
        for r in _CATALOG["pca_power_projection"].spark_fn(spark, SF_SMALL).collect()
    }
    assert set(out) == set(qs)
    m = np.array([qs[k] for k in sorted(qs)], dtype=np.float64)
    w, vecs = np.linalg.eigh(m.T @ m)
    top = vecs[:, -1]
    p_np = m @ top
    p_sp = np.array([out[k] for k in sorted(qs)], dtype=np.float64)
    cos = abs(p_np @ p_sp) / (np.linalg.norm(p_np) * np.linalg.norm(p_sp))
    assert cos > 0.999, cos
    # fixed-point bound: |proj| <= 64 (dims) * 64 (|q_i|) * 2^20 (|v_i|)
    assert max(abs(v) for v in out.values()) <= 64 * 64 * (1 << 20)


def test_bitmap_index_popcounts_equal_exact_distinct_postings(spark):
    """Σ bit_count(mask) per term must equal the exact distinct
    (term, doc) posting count — the OR-idempotence contract that lets
    the build skip the distinct pre-shuffle — and the container ids
    must tile doc_id div 63."""
    out = {
        r["term"]: r
        for r in _CATALOG["bitmap_posting_index"].spark_fn(spark, SF_SMALL).collect()
    }
    doc = load_table(spark, SF_SMALL, "documents")
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            "  +",
            " ",
        )
    )
    brute: dict[str, set[int]] = {}
    for r in doc.select("doc_id", clean.alias("t")).collect():
        for term in r["t"].split(" "):
            if term:
                brute.setdefault(term, set()).add(r["doc_id"])
    assert set(out) == set(brute)
    for term, docs in brute.items():
        row = out[term]
        assert row["n_postings"] == len(docs), term
        containers = {d // 63 for d in docs}
        assert row["n_containers"] == len(containers), term
        assert row["first_container"] == min(containers)
        assert row["last_container"] == max(containers)
        xor = 0
        for c in containers:
            mask = 0
            for d in docs:
                if d // 63 == c:
                    mask |= 1 << (d % 63)
            xor ^= mask
        assert row["mask_xor"] == xor, term


def test_skyline_equals_brute_force_frontier(spark):
    """The histogram-factorized plan must return EXACTLY the strict-
    dominance Pareto frontier the O(n²) definition yields."""
    doc = load_table(spark, SF_SMALL, "documents")
    from gridiron_spark.queries.domains import _SCORE_SPARK
    from gridiron_spark.queries.selection import _NDIST_SPARK

    pts = {
        r["doc_id"]: (r["x"], r["y"])
        for r in doc.select(
            "doc_id",
            F.expr(_SCORE_SPARK).cast("bigint").alias("x"),
            F.expr(_NDIST_SPARK).cast("bigint").alias("y"),
        ).collect()
    }

    def dominated(p):
        return any(
            q[0] >= p[0] and q[1] >= p[1] and (q[0] > p[0] or q[1] > p[1])
            for q in pts.values()
        )

    brute = {k for k, p in pts.items() if not dominated(p)}
    out = _CATALOG["skyline_pareto_docs"].spark_fn(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in out} == brute
    assert brute, "fixture corpus must have a non-empty frontier"
    for r in out:
        assert (r["score"], r["n_distinct_tokens"]) == pts[r["doc_id"]]


def test_epoch_shuffle_is_a_balanced_seeded_permutation(spark):
    """rank_sum over all cells must be N(N+1)/2 (the ranks are a
    permutation), decile populations differ by at most 1 (the integer
    decile split), and a source's docs spread across deciles instead of
    clustering (the interleaving the shuffle exists for). The rank order
    itself is pinned against hashlib md5."""
    rows = _CATALOG["epoch_shuffle_interleave"].spark_fn(spark, SF_SMALL).collect()
    doc = load_table(spark, SF_SMALL, "documents").select("doc_id", "source").collect()
    n = len(doc)
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["rank_sum"] for r in rows) == n * (n + 1) // 2
    assert sum(r["id_sum"] for r in rows) == sum(d["doc_id"] for d in doc)
    per_decile: dict[int, int] = {}
    for r in rows:
        per_decile[r["decile"]] = per_decile.get(r["decile"], 0) + r["n_docs"]
    assert set(per_decile) == set(range(10))
    assert max(per_decile.values()) - min(per_decile.values()) <= 1
    # replay the permutation with hashlib and check one cell exactly
    order = sorted(
        (hashlib.md5(f"ep1|{d['doc_id']}".encode()).hexdigest(), d["doc_id"])
        for d in doc
    )
    rank = {doc_id: i + 1 for i, (_, doc_id) in enumerate(order)}
    src = {d["doc_id"]: d["source"] for d in doc}
    cells: dict[tuple[str, int], list[int]] = {}
    for doc_id, rk in rank.items():
        cells.setdefault((src[doc_id], (rk - 1) * 10 // n), []).append(doc_id)
    for r in rows:
        ids = cells[(r["source"], r["decile"])]
        assert r["n_docs"] == len(ids)
        assert r["id_sum"] == sum(ids)
        assert r["rank_sum"] == sum(rank[i] for i in ids)


def test_corpus_lpa_equals_panel_machinery_modulo_broadcast(spark):
    """community_lpa_ivf differs from the panel LPA only in the label
    join STRATEGY (equi-join vs broadcast) — a physical-plan choice that
    must not change a single community assignment. Also pins label
    closure: every community label is itself a member vertex."""
    from gridiron_spark.queries.similarity import (
        _GIVF_SFAC,
        _lpa_over_edges,
        knn_graph_ivf_edges,
    )

    edges = knn_graph_ivf_edges(spark, SF_SMALL, super_fac=_GIVF_SFAC)
    a = {
        r["vec_id"]: r["community"]
        for r in _lpa_over_edges(edges, broadcast_labels=False).collect()
    }
    b = {
        r["vec_id"]: r["community"]
        for r in _lpa_over_edges(edges, broadcast_labels=True).collect()
    }
    assert a == b
    assert a, "fixture graph must be non-empty"
    assert set(a.values()) <= set(a), "labels must be member vertices"
    out = {
        r["vec_id"]: r["community"]
        for r in _CATALOG["community_lpa_ivf"].spark_fn(spark, SF_SMALL).collect()
    }
    assert out == a


def test_skyline_3d_equals_brute_force_and_is_partition_invariant(spark):
    """The partition-local-frontier + broadcast-verify plan must return
    EXACTLY the 3-D strict-dominance frontier, and must return the SAME
    set under a different partitioning (the transitivity soundness
    argument, executed)."""
    from gridiron_spark.queries.selection import _DIVR_SPARK, _NDIST_SPARK

    doc = load_table(spark, SF_SMALL, "documents")
    pts = {
        r["doc_id"]: (r["x"], r["y"], r["z"])
        for r in doc.select(
            "doc_id",
            F.col("n_chars").cast("bigint").alias("x"),
            F.expr(_NDIST_SPARK).cast("bigint").alias("y"),
            F.expr(_DIVR_SPARK).cast("bigint").alias("z"),
        ).collect()
    }

    def dominated(p):
        return any(
            all(q[i] >= p[i] for i in range(3)) and any(q[i] > p[i] for i in range(3))
            for q in pts.values()
        )

    brute = {k for k, p in pts.items() if not dominated(p)}
    out = _CATALOG["skyline_pareto_3d"].spark_fn(spark, SF_SMALL)
    assert {r["doc_id"] for r in out.collect()} == brute
    assert len(brute) > 2, "3-D frontier should be a real trade-off surface"
    # partition invariance: rerun with the corpus forced through a
    # different partition count — identical frontier
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "5")
    try:
        again = {
            r["doc_id"]
            for r in _CATALOG["skyline_pareto_3d"].spark_fn(spark, SF_SMALL).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert again == brute


def test_harmonic_centrality_equals_brute_bfs(spark):
    """The iterative min-plus expansion must reproduce exact 3-hop BFS
    distances: harmonic_x6 = Σ 6//d and n_reached = |ball(v, 3)| − 1,
    replayed with a python BFS over the same symmetrized edge set."""
    from gridiron_spark.queries.similarity import _panel_knn_edges

    _, edges = _panel_knn_edges(spark, SF_SMALL)
    adj: dict[int, set[int]] = {}
    for r in edges.collect():
        adj.setdefault(r["src"], set()).add(r["dst"])
        adj.setdefault(r["dst"], set()).add(r["src"])
    out = {
        r["vec_id"]: (r["harmonic_x6"], r["n_reached"])
        for r in _CATALOG["harmonic_centrality_knn"].spark_fn(spark, SF_SMALL).collect()
    }
    assert set(out) == set(adj)
    for v in adj:
        dist = {v: 0}
        frontier = {v}
        for d in (1, 2, 3):
            frontier = {
                u for f in frontier for u in adj[f] if u not in dist
            }
            for u in frontier:
                dist[u] = d
        h6 = sum(6 // d for u, d in dist.items() if u != v)
        assert out[v] == (h6, len(dist) - 1), v
