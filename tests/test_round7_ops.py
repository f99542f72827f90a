"""Behavioral pins for the round-7 operators — properties the oracle hash
can't state directly (monotone funnels, planted-pair structure, Z-order
rectangle bounds, PageRank fixed-point anatomy)."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_zorder_buckets_are_tight_rectangles(spark):
    """The file-skipping property Z-order exists for: fixing zval bits
    >= 14 fixes both keys' bits >= 7, so every bucket's span on EACH
    dimension is < 2^7 — versus a 1-D sort where the second dimension's
    span is the full domain."""
    from gridiron_spark.queries.layout import zorder_layout_sort

    rows = zorder_layout_sort(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.ck_max - r.ck_min <= 127, r
        assert r.dd_max - r.dd_min <= 127, r
    # and the layout is non-trivial: more than one occupied tile
    assert len(rows) > 1


def test_dhash_pairs_are_exactly_the_planted_families(spark):
    """Every emitted near-dup pair shares a base pattern (id mod 50), the
    planted perturbation flips at most 6 of 64 bits, and same-variant
    twins collide exactly (Hamming 0)."""
    from gridiron_spark.queries.multimodal import image_dhash_neardup

    rows = image_dhash_neardup(spark, SF_SMALL).collect()
    assert rows, "planted families must produce pairs"
    for r in rows:
        assert r.id_a % 50 == r.id_b % 50, "cross-base pair leaked"
        assert 0 <= r.hamming <= 6
        same_variant = (r.id_a // 50) % 2 == (r.id_b // 50) % 2
        if same_variant:
            assert r.hamming == 0


def test_pagerank_base_rank_for_sinks_and_mass_bounds(spark):
    """A node nobody links to holds exactly the teleport mass
    (3·S)//20 at every iteration; every rank sits in [(3·S)//20, S·n]."""
    from gridiron_spark.queries.similarity import (
        _PR_SCALE,
        pagerank_knn_centrality,
    )

    rows = pagerank_knn_centrality(spark, SF_SMALL).collect()
    assert rows
    base = (3 * _PR_SCALE) // 20
    ranks = {r.vec_id: r.rank_scaled for r in rows}
    assert min(ranks.values()) >= base
    # total mass can only shrink under floor division + teleport
    assert sum(ranks.values()) <= _PR_SCALE * len(ranks)
    # centrality must differentiate: a 3-regular out-degree graph with
    # uneven in-degrees cannot produce a constant rank vector
    assert len(set(ranks.values())) > 1


def test_bm25_results_are_positive_sorted_and_on_topic(spark):
    from gridiron_spark.queries.retrieval import _BM25_QUERY, bm25_search_topk
    from gridiron_spark.io.tables import load_table

    rows = bm25_search_topk(spark, SF_SMALL).collect()
    assert rows
    scores = [r.score_scaled for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        assert any(t in texts[r.doc_id].lower().split() for t in _BM25_QUERY)


def test_ngram_lm_gate_anatomy(spark):
    from gridiron_spark.queries.retrieval import ngram_lm_train_score

    rows = ngram_lm_train_score(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.n_bigrams == 0:
            assert r.keep == 0 and r.p_sum == 0 and r.avg_p_scaled == 0.0
        else:
            # add-one smoothed probabilities are in (0, 1] => scaled (0, S]
            assert 0 < r.avg_p_scaled <= 1_000_000


def test_filter_funnel_is_monotone(spark):
    from gridiron_spark.queries.quality import filter_funnel_report

    rows = filter_funnel_report(spark, SF_SMALL).collect()
    assert rows
    total = [0, 0, 0, 0]
    for r in rows:
        assert r.n_docs >= r.n_pass_lexical >= r.n_pass_model >= r.n_kept >= 0
        total[0] += r.n_docs
        total[1] += r.n_pass_lexical
        total[2] += r.n_pass_model
        total[3] += r.n_kept
    # each stage must have measurable attrition corpus-wide
    assert total[0] > total[1] > total[2] >= total[3]
