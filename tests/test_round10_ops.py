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
