"""Behavioral pins for the round-10 corpus-grain graph family — exact
Python replays of each iteration over the SAME IVF edge set, proving the
distributed rounds compute the textbook algorithm (the oracle hash proves
cross-engine parity; these prove the algorithm itself)."""

from __future__ import annotations

from gridiron_spark.queries import catalog
from tests.conftest import SF_SMALL

_CATALOG = catalog()


def _ivf_edges(spark):
    from gridiron_spark.queries.similarity import (
        _GIVF_SFAC,
        knn_graph_ivf_edges,
    )

    return [
        (r["src"], r["dst"])
        for r in knn_graph_ivf_edges(
            spark, SF_SMALL, super_fac=_GIVF_SFAC
        ).collect()
    ]


def test_pagerank_ivf_equals_python_power_iteration(spark):
    """Exact fixed-point replay: rank unit 2^20, d = 17/20, contributions
    divided by the node's ACTUAL out-degree (the semantic difference from
    the panel variant's constant k), floor divisions throughout."""
    from gridiron_spark.queries.similarity import _PR_ITERS, _PR_SCALE

    edges = _ivf_edges(spark)
    od: dict[int, int] = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    r = {v: _PR_SCALE for v in nodes}
    for _ in range(_PR_ITERS):
        m = dict.fromkeys(nodes, 0)
        for s, d in edges:
            m[d] += r[s] // od[s]
        r = {v: (3 * _PR_SCALE) // 20 + (17 * m[v]) // 20 for v in nodes}
    out = {
        row["vec_id"]: row["rank_scaled"]
        for row in _CATALOG["pagerank_ivf_centrality"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert out == r


def test_pagerank_degree_normalization_exercised_on_sparse_graph(spark):
    """On the catalog corpora every IVF node happens to reach out-degree
    exactly k, so the registered query can't distinguish actual-degree
    normalization from the panel's constant-k shortcut. Drive the shared
    round machinery on a deliberately SPARSE IVF graph (small stride →
    many cells, k larger than most cells can fill) and replay in Python:
    degrees < k must occur AND the ranks must still match exactly."""
    from gridiron_spark.queries.similarity import (
        _PR_ITERS,
        _PR_SCALE,
        _pagerank_over_edges,
        knn_graph_ivf_edges,
    )

    k = 7
    edges_df = knn_graph_ivf_edges(
        spark, SF_SMALL, stride=7, probes=1, k=k, super_fac=None
    )
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    od: dict[int, int] = {}
    for s, _ in edges:
        od[s] = od.get(s, 0) + 1
    assert any(v < k for v in od.values()), sorted(set(od.values()))
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    r = {v: _PR_SCALE for v in nodes}
    for _ in range(_PR_ITERS):
        m = dict.fromkeys(nodes, 0)
        for s, d in edges:
            m[d] += r[s] // od[s]
        r = {v: (3 * _PR_SCALE) // 20 + (17 * m[v]) // 20 for v in nodes}
    out = {
        row["vec_id"]: row["rank_scaled"]
        for row in _pagerank_over_edges(edges_df).collect()
    }
    assert out == r


def test_harmonic_ivf_equals_brute_bfs(spark):
    """3-hop BFS over the symmetrized IVF edge set: harmonic_x6 = Σ 6//d,
    n_reached = |ball(v, 3)| − 1 — the panel pin re-run on the corpus
    grain graph."""
    adj: dict[int, set[int]] = {}
    for s, d in _ivf_edges(spark):
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out = {
        r["vec_id"]: (r["harmonic_x6"], r["n_reached"])
        for r in _CATALOG["harmonic_centrality_ivf"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert set(out) == set(adj)
    for v in adj:
        dist = {v: 0}
        frontier = {v}
        for d in (1, 2, 3):
            frontier = {u for f in frontier for u in adj[f] if u not in dist}
            for u in frontier:
                dist[u] = d
        h6 = sum(6 // dd for u, dd in dist.items() if u != v)
        assert out[v] == (h6, len(dist) - 1), v


def test_tokenizer_fertility_gate_python_replay(spark):
    """End-to-end Python replay: train-split segmentation lengths from
    the staged artifact, byte-fallback encode of every word occurrence,
    per-doc gates, per-source rollup — and the gate must be NON-VACUOUS
    (some docs kept AND some dropped) so the thresholds actually split
    this corpus."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.text import (
        _FERT_MAX_FRAG_PERMILLE,
        _FERT_MIN_CPT_MILLI,
        _staged_segmentations,
    )

    wsyms = {
        r["word"]: r["n_syms"]
        for r in _staged_segmentations(spark, SF_SMALL, split="even").collect()
    }
    docs = load_table(spark, SF_SMALL, "documents").select(
        "doc_id", "source", "text"
    ).collect()
    agg: dict[str, list[int]] = {}
    for row in docs:
        words = [w for w in row["text"].lower().split(" ") if w]
        if not words:
            continue
        n_oov = sum(1 for w in words if w not in wsyms)
        n_frag = sum(
            1
            for w in words
            if wsyms.get(w, len(w)) == len(w) and len(w) > 1
        )
        n_bpe = sum(wsyms.get(w, len(w)) for w in words)
        n_chars = sum(len(w) for w in words)
        keep = (
            1000 * n_frag <= _FERT_MAX_FRAG_PERMILLE * len(words)
            and 1000 * n_chars >= _FERT_MIN_CPT_MILLI * n_bpe
        )
        a = agg.setdefault(row["source"], [0, 0, 0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += int(keep)
        a[2] += len(words)
        a[3] += n_oov
        a[4] += n_frag
        a[5] += n_bpe
        a[6] += n_chars
    expected = {
        s: (
            a[0], a[1], a[2], a[3], a[4], a[5],
            1000 * a[6] // a[5], 1000 * a[4] // a[2],
        )
        for s, a in agg.items()
    }
    out = {
        r["source"]: (
            r["n_docs"], r["n_kept"], r["n_words"], r["n_oov_words"],
            r["n_fragmented_words"], r["n_bpe_tokens"],
            r["chars_per_token_milli"], r["fragmented_permille"],
        )
        for r in _CATALOG["tokenizer_fertility_gate"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert out == expected
    total_docs = sum(a[0] for a in agg.values())
    total_kept = sum(a[1] for a in agg.values())
    assert 0 < total_kept < total_docs, (total_kept, total_docs)


def test_hard_negatives_match_brute_force_on_candidates(spark):
    """Per-anchor top-k over the label-filtered candidate set must equal
    a brute Python rank over the same candidates — and label-awareness
    must be load-bearing: for some anchor the unfiltered top-k differs
    (its nearest candidate shares its label)."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.similarity import _HNEG_K

    emb = load_table(spark, SF_SMALL, "embeddings")
    labels = {
        r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()
    }
    cand = {}
    for s, d in _ivf_edges_scored(spark):
        cand.setdefault(s[0], []).append((s[1], d))
    expected = {}
    label_matters = False
    for a, lst in cand.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        neg = [(b, dot) for b, dot in lst if labels[b] != labels[a]]
        if lst[:_HNEG_K] != neg[:_HNEG_K]:
            label_matters = True
        for rk, (b, dot) in enumerate(neg[:_HNEG_K]):
            expected[(a, b)] = (dot, labels[a], labels[b])
    assert label_matters
    out = {
        (r["anchor"], r["negative"]): (
            r["dot"], r["anchor_label"], r["negative_label"]
        )
        for r in _CATALOG["hard_negative_mining"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert out == expected


def _ivf_edges_scored(spark):
    """All scored IVF candidate pairs (not just the top-k edges):
    re-derive via knn_graph_ivf_edges with k large enough to keep every
    candidate."""
    from gridiron_spark.queries.similarity import (
        _GIVF_SFAC,
        knn_graph_ivf_edges,
    )

    big = knn_graph_ivf_edges(spark, SF_SMALL, super_fac=_GIVF_SFAC,
                              k=10**9)
    return [((r["src"], r["dst"]), r["dot"]) for r in big.collect()]


def test_embedding_drift_matches_numpy_centroids(spark):
    """drift_x must equal n_old·n_new · L1(mean_old − mean_new) on the
    2²⁰-quantized vectors, computed independently with numpy."""
    import numpy as np

    from gridiron_spark.io.tables import load_table

    rows = load_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    by = {}
    for r in rows:
        q = np.floor(np.array(r["embedding"], dtype=np.float64) * (1 << 20))
        by.setdefault((r["label"], r["vec_id"] % 2), []).append(q)
    labels = sorted({lb for lb, _ in by})
    expected = {}
    for lb in labels:
        old = np.array(by.get((lb, 0), []), dtype=np.int64)
        new = np.array(by.get((lb, 1), []), dtype=np.int64)
        drift = int(
            np.abs(
                old.sum(axis=0) * len(new) - new.sum(axis=0) * len(old)
            ).sum()
        )
        expected[lb] = (len(old), len(new), drift)
    out = {
        r["label"]: (r["n_old"], r["n_new"], r["drift_x"])
        for r in _CATALOG["embedding_drift_monitor"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert out == expected
    assert any(v[2] > 0 for v in out.values())  # drift actually measured


def test_ranking_eval_matches_python_metrics(spark):
    """Exact metric replay: re-derive the top-10 ranked lists from the
    IVF candidate chain in Python (same (dot desc, dst) order), compute
    first-relevant-rank / rr_x / hits / truncated recall with plain
    integer arithmetic, and require equality — plus at least one anchor
    with a non-trivial rank (first_rel_rank > 1) so MRR isn't constant."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.similarity import (
        _GIVF_SFAC,
        _RANKEVAL_K,
        _RR_SCALE,
        knn_graph_ivf_edges,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    labels = {
        r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()
    }
    cls: dict[int, int] = {}
    for lb in labels.values():
        cls[lb] = cls.get(lb, 0) + 1
    edges = knn_graph_ivf_edges(
        spark, SF_SMALL, k=_RANKEVAL_K, super_fac=_GIVF_SFAC
    ).collect()
    lists: dict[int, list] = {}
    for r in edges:
        lists.setdefault(r["src"], []).append((-r["dot"], r["dst"]))
    expected = {}
    for a, lst in lists.items():
        lst.sort()
        first = 0
        n_rel = 0
        for rk, (_, b) in enumerate(lst, start=1):
            if labels[b] == labels[a]:
                n_rel += 1
                if first == 0:
                    first = rk
        rr = _RR_SCALE // first if first else 0
        denom = min(_RANKEVAL_K, cls[labels[a]] - 1)
        expected[a] = (len(lst), n_rel, first, rr, 1000 * n_rel // denom)
    out = {
        r["anchor"]: (
            r["n_ranked"], r["n_rel"], r["first_rel_rank"], r["rr_x"],
            r["recall_milli"],
        )
        for r in _CATALOG["ranking_eval_topk"].spark_fn(spark, SF_SMALL).collect()
    }
    assert out == expected
    assert any(v[2] > 1 for v in out.values())


def test_semdedup_prefix_prune_degrades_to_full_prune(spark):
    """R ≥ max|cluster| makes the rank-window prefix the whole cluster,
    so the capped prune must reproduce semdedup_two_level bit-for-bit —
    and at the catalog R the cap must actually bite somewhere (some
    cluster larger than R), else the probe row measures nothing."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.operators.similarity import (
        semdedup_flags,
        two_level_assign,
    )
    from gridiron_spark.queries.similarity import (
        _SD2_G,
        _SD2_PROBES,
        _SD2_RANK_WINDOW,
        _SEMDEDUP_THRESHOLD,
        _sd2_cents,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    assign = two_level_assign(
        emb, _sd2_cents(emb), groups=_SD2_G, probes=_SD2_PROBES
    )
    sizes = [
        r["c"]
        for r in assign.groupBy("cluster").count()
        .withColumnRenamed("count", "c").collect()
    ]
    assert max(sizes) > _SD2_RANK_WINDOW, sizes  # the cap must bite
    full = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semdedup_flags(
            emb, None, _SEMDEDUP_THRESHOLD, assign=assign
        ).collect()
    }
    capped_large = {
        (r["vec_id"], r["cluster"], r["keep"])
        for r in semdedup_flags(
            emb, None, _SEMDEDUP_THRESHOLD, assign=assign,
            prune_rank_window=max(sizes),
        ).collect()
    }
    assert capped_large == full


def test_kcore_ivf_equals_python_peel(spark):
    """Exact 4-round degree-peel replay over the undirected IVF edge set:
    deg0, the round-4 survivor flag, and the survivor-subgraph degree."""
    from gridiron_spark.queries.similarity import _KCORE_K, _KCORE_ROUNDS

    und = {
        (min(s, d), max(s, d)) for s, d in _ivf_edges(spark) if s != d
    }

    def degs(es):
        d: dict[int, int] = {}
        for u, v in es:
            d[u] = d.get(u, 0) + 1
            d[v] = d.get(v, 0) + 1
        return d

    d0 = degs(und)
    e = set(und)
    keep: set[int] = set()
    for _ in range(_KCORE_ROUNDS):
        keep = {n for n, dd in degs(e).items() if dd >= _KCORE_K}
        e = {(u, v) for u, v in e if u in keep and v in keep}
    df = degs(e)
    expected = {
        n: (d0[n], 1 if n in keep else 0, df.get(n, 0)) for n in d0
    }
    out = {
        r["vec_id"]: (r["deg0"], r["in_core"], r["core_deg"])
        for r in _CATALOG["kcore_decompose_ivf"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert out == expected


def test_semantic_decontamination_matches_brute_force_on_candidates(spark):
    """The contamination report must equal a brute Python replay over the
    same IVF candidate pairs: per corpus vector, argmax-dot benchmark
    neighbor (ties to the lower bench_id), kept iff dot >= the bar — and
    the bar must be load-bearing (some best-neighbor pair falls below it)."""
    from gridiron_spark.queries.similarity import _DECON_MOD, _DECON_T

    best: dict[int, tuple[int, int]] = {}
    for (s, d), dot in _ivf_edges_scored(spark):
        if s % _DECON_MOD == 0 or d % _DECON_MOD != 0:
            continue
        cur = best.get(s)
        if cur is None or (dot, -d) > (cur[1], -cur[0]):
            best[s] = (d, dot)
    expected = {
        v: (b, dot) for v, (b, dot) in best.items() if dot >= _DECON_T
    }
    assert expected, "fixture must flag at least one contaminated vector"
    assert len(expected) < len(best), "the dot bar must filter something"
    out = {
        r["vec_id"]: (r["bench_id"], r["dot"])
        for r in _CATALOG["decontaminate_semantic_ivf"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert out == expected


def test_quantile_rollup_merge_pins_additivity(spark):
    """The merge==direct pin must actually hold (n_mismatched_cells == 0
    on every row — count additivity), and the extracted quantiles must be
    ordered p50 <= p90 <= p99 with n = sum of day-shard counts."""
    rows = (
        _CATALOG["quantile_rollup_merge"].spark_fn(spark, SF_SMALL).collect()
    )
    assert rows
    for r in rows:
        assert r["n_mismatched_cells"] == 0, r
        assert r["p50_lo"] <= r["p90_lo"] <= r["p99_lo"], r
        assert r["n"] > 0 and r["n_days"] > 0 and r["n_bins_set"] > 0


def test_streaming_sketch_equals_batch_histogram(spark):
    """The streaming-maintained register table must extract the SAME
    quantile rows as histogram_quantile_sketch computes from the batch
    table (shared binning, shared rank arithmetic)."""
    batch = {
        r["event_type"]: (r["n"], r["p50_lo"], r["p90_lo"], r["p99_lo"])
        for r in _CATALOG["histogram_quantile_sketch"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    stream = {
        r["event_type"]: (r["n"], r["p50_lo"], r["p90_lo"], r["p99_lo"])
        for r in _CATALOG["streaming_sketch_rollup_e2e"]
        .spark_fn(spark, SF_SMALL)
        .collect()
    }
    assert stream == batch
