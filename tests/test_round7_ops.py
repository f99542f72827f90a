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


def test_record_linkage_recall_is_total(spark):
    """The two blocking passes partition the corrupted positions, so the
    true source is ALWAYS a candidate: every dirty record must link back
    to its own customer at distance exactly 1."""
    from gridiron_spark.queries.dedup import (
        _RL_CORRUPT_MOD,
        _RL_DIRTY_OFFSET,
        record_linkage_blocked,
    )
    from gridiron_spark.io.tables import load_table

    rows = record_linkage_blocked(spark, SF_SMALL).collect()
    assert rows
    true_links = {
        (r.dirty_id, r.c_custkey): r.lev
        for r in rows
        if r.dirty_id - _RL_DIRTY_OFFSET == r.c_custkey
    }
    n_dirty = (
        load_table(spark, SF_SMALL, "customer")
        .filter(f"c_custkey % {_RL_CORRUPT_MOD} = 0")
        .count()
    )
    assert len(true_links) == n_dirty, "a dirty record failed to link home"
    assert all(v == 1 for v in true_links.values())


def test_kmv_sketch_accuracy_and_merge(spark):
    """Estimates stay inside the ±3/sqrt(k) KMV bound for sources with
    >= k values, and the sketch is mergeable: the k smallest of the union
    of two halves' bottom-k sets equal the whole corpus's bottom-k."""
    import hashlib

    from gridiron_spark.queries.scale import _KMV_K, kmv_distinct_sketch

    rows = kmv_distinct_sketch(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        if r.n_exact >= _KMV_K:
            assert abs(r.est_ratio - 1.0) <= 3.0 / (_KMV_K ** 0.5), r
        else:
            assert r.kmv_estimate == r.n_exact

    # mergeability on plain python sets of hash values
    def h(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:8], 16)

    vals = [h(f"tok{i}") for i in range(500)]
    whole = sorted(set(vals))[:_KMV_K]
    half_a = sorted(set(vals[:250]))[:_KMV_K]
    half_b = sorted(set(vals[250:]))[:_KMV_K]
    merged = sorted(set(half_a) | set(half_b))[:_KMV_K]
    assert merged == whole


def test_curriculum_schedule_is_a_phase_monotone_permutation(spark):
    from gridiron_spark.queries.selection import curriculum_schedule

    rows = curriculum_schedule(spark, SF_SMALL).collect()
    assert rows
    seqs = sorted(r.seq for r in rows)
    assert seqs == list(range(1, len(rows) + 1)), "seq must be a permutation"
    by_seq = sorted(rows, key=lambda r: r.seq)
    phases = [r.phase for r in by_seq]
    assert phases == sorted(phases), "difficulty phases must ramp"
    # in-phase source interleave: the dominant phase must not schedule one
    # source as a single contiguous block
    from collections import Counter

    phase_counts = Counter(r.phase for r in rows)
    top_phase = phase_counts.most_common(1)[0][0]
    run = [r.source for r in by_seq if r.phase == top_phase]
    if len(set(run)) > 1:
        changes = sum(1 for a, b in zip(run, run[1:]) if a != b)
        assert changes > len(set(run)) - 1, "sources must interleave"


def test_source_affinity_matrix_bounds(spark):
    from gridiron_spark.queries.similarity import source_affinity_matrix
    from gridiron_spark.io.tables import load_table

    rows = source_affinity_matrix(spark, SF_SMALL).collect()
    n_sources = (
        load_table(spark, SF_SMALL, "documents")
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_sources * (n_sources - 1) // 2
    for r in rows:
        assert r.source_a < r.source_b
        assert -1.0 - 1e-9 <= r.cos_sim <= 1.0 + 1e-9


def test_snapshot_diff_classes_match_the_planted_edits(spark):
    from gridiron_spark.queries.sinks import (
        _DIFF_DEL_MOD,
        _DIFF_INS_MOD,
        _DIFF_UPD_MOD,
        table_snapshot_diff,
    )
    from gridiron_spark.io.tables import load_table

    rows = table_snapshot_diff(spark, SF_SMALL).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.change_type, set()).add(r.o_orderkey)
    keys = [
        r.o_orderkey
        for r in load_table(spark, SF_SMALL, "orders")
        .select("o_orderkey")
        .collect()
    ]
    want_removed = {k for k in keys if k % _DIFF_DEL_MOD == 0}
    want_changed = {
        k for k in keys if k % _DIFF_UPD_MOD == 0 and k % _DIFF_DEL_MOD != 0
    }
    want_added = {
        k + 1_000_000_000 for k in keys if k % _DIFF_INS_MOD == 0
    }
    assert by_type.get("removed", set()) == want_removed
    assert by_type.get("changed", set()) == want_changed
    assert by_type.get("added", set()) == want_added


# --- round-7 second wave ------------------------------------------------------


def test_nearest_defender_is_the_true_minimum(spark):
    """Recompute the pairwise minimum driver-side for a handful of plays
    and check the operator's nearest/count agree; offense entities are
    even, defenders odd, and groups are bounded by players-per-frame."""
    from collections import defaultdict

    from gridiron_spark.queries.analytics import frame_nearest_defender
    from gridiron_spark.io.tables import load_table

    rows = frame_nearest_defender(spark, SF_SMALL).collect()
    assert rows
    by_play = defaultdict(list)
    for r in rows:
        assert r.entity_id % 2 == 0
        assert 1 <= r.n_defenders <= 4
        by_play[r.play_id].append(r)
    track = (
        load_table(spark, SF_SMALL, "lineitem")
        .selectExpr(
            "l_orderkey AS play_id",
            "l_linenumber AS entity_id",
            "l_partkey % 120 AS x",
            "l_suppkey % 54 AS y",
        )
        .groupBy("play_id", "entity_id")
        .agg({"x": "min", "y": "min"})
        .selectExpr("play_id", "entity_id", "`min(x)` AS x", "`min(y)` AS y")
    )
    sample_plays = sorted(by_play)[:5]
    t = track.filter(track.play_id.isin([int(p) for p in sample_plays])).collect()
    for play in sample_plays:
        offense = [r for r in t if r.play_id == play and r.entity_id % 2 == 0]
        defense = [r for r in t if r.play_id == play and r.entity_id % 2 == 1]
        got = {r.entity_id: r for r in by_play[play]}
        for o in offense:
            dists = {
                d.entity_id: (o.x - d.x) ** 2 + (o.y - d.y) ** 2 for d in defense
            }
            if not dists:
                assert o.entity_id not in got
                continue
            g = got[o.entity_id]
            assert g.nearest_dist_sq == min(dists.values())
            assert g.n_defenders == len(defense)
            assert dists[g.nearest_defender] == g.nearest_dist_sq


def test_scd2_intervals_tile_each_user_history(spark):
    """Per user: versions are 1..n, consecutive intervals abut exactly
    (eff_to == next eff_from), exactly one open current row, and the
    attribute actually changes at every boundary."""
    from collections import defaultdict

    from gridiron_spark.queries.analytics import scd2_dimension_build

    rows = scd2_dimension_build(spark, SF_SMALL).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].is_current == 1 and rs[-1].eff_to_us is None
        for a, b in zip(rs, rs[1:]):
            assert a.eff_to_us == b.eff_from_us, user
            assert a.event_type != b.event_type, user


def test_islands_are_disjoint_and_cover_all_intervals(spark):
    """Merged islands within a user never overlap (a gap strictly
    separates consecutive islands) and interval counts sum to the
    user's event count."""
    from collections import defaultdict

    from gridiron_spark.queries.analytics import interval_islands_merge
    from gridiron_spark.io.tables import load_table

    rows = interval_islands_merge(spark, SF_SMALL).collect()
    assert rows
    by_user = defaultdict(list)
    for r in rows:
        assert r.island_start_us < r.island_end_us
        by_user[r.user_id].append(r)
    ev = (
        load_table(spark, SF_SMALL, "events")
        .groupBy("user_id")
        .count()
        .collect()
    )
    n_events = {r.user_id: r["count"] for r in ev}
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.island_start_us)
        for a, b in zip(rs, rs[1:]):
            assert a.island_end_us < b.island_start_us, user
        assert sum(r.n_intervals for r in rs) == n_events[user]


def test_theta_intersection_estimate_is_in_the_kmv_error_band(spark):
    """k=64 gives ~12% relative error; allow 4 sigma. The sample can
    never exceed k, and the estimate is exact when both sets fit in
    one sketch (theta = full domain)."""
    from gridiron_spark.queries.scale import theta_sketch_intersect

    (r,) = theta_sketch_intersect(spark, SF_SMALL).collect()
    assert 0 <= r.n_common <= 64
    assert r.n_exact > 0
    assert 0.5 <= r.est_ratio <= 1.5, r
    if r.theta == 1 << 32:
        assert r.est_intersection == r.n_exact


def test_fusion_scores_decompose_into_the_two_arms(spark):
    """Every fused row's score equals the Borda sum of its (possibly
    absent) arm ranks, rows are sorted by (score desc, doc_id), and a
    doc present in both arms outranks one with the same single-arm
    rank."""
    from gridiron_spark.queries.retrieval import (
        _FUSE_DEPTH,
        hybrid_retrieval_fusion,
    )

    rows = hybrid_retrieval_fusion(spark, SF_SMALL).collect()
    assert rows
    scores = [(r.fused_score, r.doc_id) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], t[1]))
    for r in rows:
        expect = 0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= _FUSE_DEPTH
            expect += _FUSE_DEPTH + 1 - r.lex_rank
        if r.sem_rank is not None:
            assert 1 <= r.sem_rank <= _FUSE_DEPTH
            expect += _FUSE_DEPTH + 1 - r.sem_rank
        assert r.fused_score == expect


def test_confusion_matrix_is_conservative(spark):
    """tp+fn == support per class, total support is the corpus size,
    anchors classify themselves (so every class with an anchor has
    tp >= 1), and the emitted rationals equal their integer ratios."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.quality import eval_confusion_metrics

    rows = eval_confusion_metrics(spark, SF_SMALL).collect()
    assert rows
    n_emb = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(r.support for r in rows) == n_emb
    for r in rows:
        assert r.tp + r.fn == r.support
        assert r.recall == r.tp / r.support
        if r.tp + r.fp > 0:
            assert r.precision == r.tp / (r.tp + r.fp)
            assert r.f1 == 2 * r.tp / ((r.tp + r.fp) + r.support)


def test_bucketed_roundtrip_join_has_no_exchange_before_the_join(spark):
    """The round-trip entry's executed plan must actually realize the
    bucketing promise: a sort-merge join fed straight from the bucketed
    scans — the only Exchange in the plan is the final aggregate's."""
    from gridiron_spark.queries.sinks import bucketed_join_roundtrip

    df = bucketed_join_roundtrip(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 1, plan


def test_auc_matches_brute_force_pair_counting(spark):
    """The rank-sum identity must equal the definitional AUC: over all
    (positive, negative) bucket pairs, count score_pos > score_neg as 1
    and ties as 1/2 — doubled to stay integer, compared exactly."""
    from gridiron_spark.queries.quality import _AUC_BUCKET, eval_auc_ranksum
    from gridiron_spark.io.tables import load_table

    row = eval_auc_ranksum(spark, SF_SMALL).collect()[0]
    orders = load_table(spark, SF_SMALL, "orders").collect()
    scored = [
        (int(o.o_totalprice // _AUC_BUCKET), o.o_orderstatus == "F")
        for o in orders
    ]
    pos = [s for s, y in scored if y]
    neg = [s for s, y in scored if not y]
    u2_brute = sum(
        2 if p > n else (1 if p == n else 0) for p in pos for n in neg
    )
    assert row.n_pos == len(pos) and row.n_neg == len(neg)
    assert row.u2 == u2_brute
    assert abs(row.auc - u2_brute / (2 * len(pos) * len(neg))) == 0.0


def test_calibration_bins_conserve_the_confusion_totals(spark):
    """The reliability diagram is a re-binning of the same inference pass
    the confusion matrix aggregates: total n = corpus size, total
    n_correct = trace(confusion) = sum of per-class tp, and every bin
    accuracy is a valid proportion."""
    from pyspark.sql import functions as F

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.quality import (
        calibration_reliability_bins,
        eval_confusion_metrics,
    )

    bins = calibration_reliability_bins(spark, SF_SMALL).collect()
    conf = eval_confusion_metrics(spark, SF_SMALL).collect()
    n_vecs = load_table(spark, SF_SMALL, "embeddings").count()
    assert sum(b.n for b in bins) == n_vecs
    assert sum(b.n_correct for b in bins) == sum(c.tp for c in conf)
    for b in bins:
        assert 0 <= b.n_correct <= b.n
        assert abs(b.accuracy - b.n_correct / b.n) == 0.0
        assert -10 <= b.conf_bin <= 10


def test_target_encoding_never_contains_the_rows_own_label(spark):
    """The leakage property LOO encoding exists for: adding the row's own
    y back to the numerator reconstructs the full category sum, and two
    rows of the same category with different y get DIFFERENT encodings
    (the own-label exclusion is visible)."""
    from collections import defaultdict

    from gridiron_spark.queries.features import target_encode_loo

    rows = target_encode_loo(spark, SF_SMALL).collect()
    cat_sum = defaultdict(int)
    cat_n = defaultdict(int)
    for r in rows:
        cat_sum[r.cat] += r.y
        cat_n[r.cat] += 1
    for r in rows:
        assert r.loo_num + r.y == cat_sum[r.cat]
        assert r.loo_den == cat_n[r.cat] - 1
        if r.loo_den > 0:
            assert abs(r.loo_enc - r.loo_num / r.loo_den) == 0.0
    # own-label exclusion is observable: same category, different y ->
    # different encoding (numerators differ by exactly 1)
    by_cat = defaultdict(set)
    for r in rows:
        if r.loo_den > 0:
            by_cat[r.cat].add((r.y, r.loo_num))
    for cat, pairs in by_cat.items():
        ys = {y for y, _ in pairs}
        if len(ys) == 2:
            nums = {num for _, num in pairs}
            assert len(nums) == 2


def test_l_diversity_flags_exactly_the_homogeneous_groups(spark):
    """Replay the audit driver-side: distinct sensitive bands per QI group
    computed brute-force must match, and at_risk = (l < 3)."""
    from collections import defaultdict

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.quality import (
        _LDIV_BAND,
        _LDIV_L,
        l_diversity_audit,
    )

    rows = l_diversity_audit(spark, SF_SMALL).collect()
    customers = load_table(spark, SF_SMALL, "customer").collect()
    import math

    bands = defaultdict(set)
    counts = defaultdict(int)
    for c in customers:
        key = (c.c_nationkey, c.c_mktsegment)
        bands[key].add(math.floor(c.c_acctbal / _LDIV_BAND))
        counts[key] += 1
    assert len(rows) == len(bands)
    for r in rows:
        key = (r.c_nationkey, r.c_mktsegment)
        assert r.n == counts[key]
        assert r.l_distinct == len(bands[key])
        assert r.at_risk == (1 if r.l_distinct < _LDIV_L else 0)


def test_binned_interval_join_equals_the_naive_pair_set(spark):
    """The bin-replication rewrite must emit EXACTLY the naive quadratic
    join's pairs — no duplicate from multi-bin meetings, no miss at bin
    boundaries — replayed brute-force driver-side."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.analytics import interval_overlap_join_binned
    import datetime

    out = {
        (r.custkey, r.a_key, r.b_key): r.overlap_days
        for r in interval_overlap_join_binned(spark, SF_SMALL).collect()
    }
    orders = load_table(spark, SF_SMALL, "orders").collect()
    epoch = datetime.date(1992, 1, 1)
    iv = []
    for o in orders:
        s = (o.o_orderdate.date() - epoch).days
        iv.append(
            (o.o_custkey, o.o_orderkey, o.o_orderpriority, s,
             s + 30 + o.o_orderkey % 60)
        )
    a = [t for t in iv if t[2] in ("1-URGENT", "2-HIGH")]
    b = [t for t in iv if t[2] in ("4-NOT SPECIFIED", "5-LOW")]
    naive = {}
    for ck, ak, _, as_, ae in a:
        for ck2, bk, _, bs, be in b:
            if ck == ck2 and as_ <= be and bs <= ae:
                naive[(ck, ak, bk)] = min(ae, be) - max(as_, bs) + 1
    assert out == naive
    assert naive, "the planted intervals must actually overlap"


def test_grid_neighbors_match_brute_force(spark):
    """The 3x3 cell join must find every within-r pair the O(n^2) scan
    finds — including isolated points as explicit zero rows."""
    import hashlib

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.analytics import (
        _GRID_R2,
        grid_cell_neighbor_join,
    )

    out = {
        r.point_id: (r.n_neighbors, r.nearest_dist_sq)
        for r in grid_cell_neighbor_join(spark, SF_SMALL).collect()
    }
    orders = load_table(spark, SF_SMALL, "orders").collect()
    pts = {}
    for o in orders:
        h = int(hashlib.md5(str(o.o_orderkey).encode()).hexdigest()[:12], 16)
        pts[o.o_orderkey] = (h % 360, (h // 360) % 180)
    assert set(out) == set(pts)
    for pid, (x, y) in pts.items():
        d2s = [
            (x - x2) ** 2 + (y - y2) ** 2
            for pid2, (x2, y2) in pts.items()
            if pid2 != pid and (x - x2) ** 2 + (y - y2) ** 2 <= _GRID_R2
        ]
        assert out[pid] == (len(d2s), min(d2s) if d2s else None)
    assert any(n > 0 for n, _ in out.values()), "some neighbors must exist"


def test_recursive_hierarchy_depths_follow_the_key_domain(spark):
    """parent = key div 8 means depth(k) = number of base-8 digits above
    the root band: closed-form node counts per depth must match, and the
    depths must partition the whole table."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.advanced import recursive_cte_hierarchy

    rows = {r.depth: r for r in recursive_cte_hierarchy(spark, SF_SMALL).collect()}
    n = load_table(spark, SF_SMALL, "orders").count()
    max_key = n - 1  # keys are 0..n-1

    def depth_of(k):
        d = 0
        while k >= 8:
            k //= 8
            d += 1
        return d

    expected = {}
    for k in range(max_key + 1):
        expected[depth_of(k)] = expected.get(depth_of(k), 0) + 1
    assert {d: r.n_nodes for d, r in rows.items()} == expected
    assert sum(r.n_nodes for r in rows.values()) == n
    for r in rows.values():
        assert 1 <= r.n_roots <= 8


def test_triangle_counts_match_brute_force_enumeration(spark):
    """Replay the degree-ordered algorithm against the O(n^3)-ish brute
    force over the materialized undirected edge set: per-node triangle
    membership counts and the clustering identity 2t/(d(d-1))."""
    from itertools import combinations

    from gridiron_spark.queries.similarity import (
        _panel_knn_edges,
        triangle_count_knn,
    )

    out = {
        r.vec_id: (r.degree, r.n_triangles, r.clustering)
        for r in triangle_count_knn(spark, SF_SMALL).collect()
    }
    _, edges = _panel_knn_edges(spark, SF_SMALL)
    und = {
        tuple(sorted((r.src, r.dst))) for r in edges.collect()
    }
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri_count = dict.fromkeys(adj, 0)
    n_triangles = 0
    for node, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            if node < a and b in adj.get(a, set()):
                n_triangles += 1
                for m in (node, a, b):
                    tri_count[m] += 1
    assert set(out) == set(adj)
    assert n_triangles > 0, "the k-NN graph must contain triangles"
    for n, (d, t, c) in out.items():
        assert d == len(adj[n])
        assert t == tri_count[n]
        if d >= 2:
            assert abs(c - 2 * t / (d * (d - 1))) == 0.0
        else:
            assert c is None


def test_weighted_sample_prefers_heavy_documents(spark):
    """The integer-priority race must (a) match the brute-force selection
    exactly and (b) actually express the weights: the selected docs'
    mean length exceeds the corpus mean (at sf0.01, where the sample is
    a strict subset)."""
    import hashlib

    from tests.conftest import SF_ORACLE

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.curation import (
        _WS_K,
        _WS_SCALE,
        weighted_sample_topk,
    )

    rows = weighted_sample_topk(spark, SF_ORACLE).collect()
    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id", "n_chars"
    ).collect()
    assert len(docs) > _WS_K, "sf0.01 must make the sample a strict subset"

    def prio(doc_id, n_chars):
        hv = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
        return hv * _WS_SCALE // max(n_chars, 1)

    brute = sorted(
        ((prio(d.doc_id, d.n_chars), d.doc_id) for d in docs)
    )[:_WS_K]
    assert [(r.priority, r.doc_id) for r in rows] == brute
    sel_mean = sum(r.n_chars for r in rows) / len(rows)
    corpus_mean = sum(d.n_chars for d in docs) / len(docs)
    assert sel_mean > corpus_mean


def test_markov_rows_conserve_and_probabilities_sum(spark):
    """Transition counts per from_type sum to n_from; total transitions =
    total events minus one per user with >= 1 event; p_ppm per row
    replays as the exact integer division."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.analytics import markov_next_event

    rows = markov_next_event(spark, SF_SMALL).collect()
    assert rows
    ev = load_table(spark, SF_SMALL, "events").select("user_id").collect()
    n_events = len(ev)
    n_users = len({r.user_id for r in ev})
    assert sum(r.n_transitions for r in rows) == n_events - n_users
    by_from = {}
    for r in rows:
        by_from.setdefault(r.from_type, []).append(r)
        assert r.p_ppm == r.n_transitions * 1000000 // r.n_from
    for group in by_from.values():
        assert sum(r.n_transitions for r in group) == group[0].n_from


def test_trend_slope_matches_numpy_ols(spark):
    """The integer-moment slope equals numpy's lstsq slope on the same
    (days, floor-dollars) pairs, per group."""
    import numpy as np

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.analytics import trend_slope_by_group

    out = {r.priority: r for r in trend_slope_by_group(spark, SF_SMALL).collect()}
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderpriority", "o_orderdate", "o_totalprice"
    ).collect()
    import collections
    import datetime
    import math

    pts = collections.defaultdict(list)
    epoch = datetime.date(1995, 6, 1)
    for r in o:
        x = (r.o_orderdate.date() - epoch).days
        y = math.floor(r.o_totalprice)
        pts[r.o_orderpriority].append((x, y))
    assert set(out) == set(pts)
    for prio, xy in pts.items():
        x = np.array([p[0] for p in xy], dtype=float)
        y = np.array([p[1] for p in xy], dtype=float)
        slope = np.polyfit(x, y, 1)[0]
        assert abs(out[prio].slope_per_day - slope) < 1e-6, prio
        assert out[prio].n == len(xy)


def test_data_contract_finds_the_two_real_generator_defects(spark):
    """The audit earns its keep on the synthetic lake: it exposes the two
    expectations the generator REALLY violates — duplicate
    (l_orderkey, l_linenumber) composite keys and lineitems shipping
    before their order date (shipdate is drawn independently) — with
    violation counts that replay exactly from a collected brute force,
    and no other check may false-positive."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.quality import data_quality_contract

    rows = {r.check_name: r for r in data_quality_contract(spark, SF_SMALL).collect()}
    assert len(rows) == 8
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    ).collect()
    odate = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, SF_SMALL, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    n_li = len(li)
    n_dups = n_li - len({(r.l_orderkey, r.l_linenumber) for r in li})
    n_early = sum(1 for r in li if r.l_shipdate < odate[r.l_orderkey])
    assert n_dups > 0 and n_early > 0, "the generator defects this test pins"
    assert rows["lineitem_pk_unique"].n_bad == n_dups
    assert rows["lineitem_ship_after_order"].n_bad == n_early
    defects = {"lineitem_pk_unique", "lineitem_ship_after_order"}
    for name, r in rows.items():
        if name not in defects:
            assert r.n_bad == 0, f"{name}: {r.n_bad} violations"
    assert rows["lineitem_pk_unique"].n_rows == n_li
    assert rows["lineitem_orderkey_fk"].n_rows == n_li
    assert rows["lineitem_ship_after_order"].n_rows == n_li


def test_skew_audit_replays_brute_force(spark):
    """share_ppm / skew_x1000 / hhi replay exactly from a collected count
    map, and the top-20 frontier is the (cnt desc, key) order."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.scale import key_skew_audit

    rows = key_skew_audit(spark, SF_SMALL).collect()
    assert len(rows) == 20
    li = load_table(spark, SF_SMALL, "lineitem").select("l_partkey").collect()
    import collections

    cnt = collections.Counter(r.l_partkey for r in li)
    total = sum(cnt.values())
    sum_sq = sum(c * c for c in cnt.values())
    n_keys = len(cnt)
    max_cnt = max(cnt.values())
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.key, r.cnt) for r in rows] == expect
    for r in rows:
        assert r.share_ppm == r.cnt * 1000000 // total
        assert r.skew_x1000 == max_cnt * n_keys * 1000 // total
        assert r.n_keys == n_keys and r.total == total
        assert r.hhi == sum_sq / (total * total)


def test_pmi_prefers_collocations_over_frequency(spark):
    """PMI ranking is genuinely different from raw-count ranking (the two
    top-k frontiers differ), every emitted score replays exactly, and all
    pairs clear the count floor."""
    from gridiron_spark.queries.text import pmi_collocations, word_topk

    rows = pmi_collocations(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.n_xy >= 5
        assert r.pmi_x1000 == r.n_xy * r.n_bigrams * 1000 // (r.n_x * r.n_y)
    # scores are in ranked order
    scores = [(r.pmi_x1000, r.bigram) for r in rows]
    assert scores == sorted(scores, key=lambda s: (-s[0], s[1]))


def test_containment_catches_a_planted_excerpt(spark):
    """A short doc whose shingles are a strict subset of a long doc has
    low Jaccard but containment 1.0: the operator must emit it, orient it
    (contained -> container), and agree with a brute-force set replay."""
    from pyspark.sql import functions as F

    from gridiron_spark.io.tables import load_table
    from gridiron_spark.operators.dedup import containment_prefix_pairs

    doc = load_table(spark, SF_SMALL, "documents")
    base = doc.orderBy("doc_id").limit(1).collect()[0]
    words = base.text.lower().split(" ")
    long_text = " ".join(words)
    short_text = " ".join(words[: max(6, len(words) // 4)])
    planted = spark.createDataFrame(
        [(900000001, long_text), (900000002, short_text)], "doc_id long, text string"
    )
    out = containment_prefix_pairs(planted, threshold=0.8)
    rows = {(r.doc_in, r.doc_out): r for r in out.collect()}
    assert (900000002, 900000001) in rows
    r = rows[(900000002, 900000001)]
    assert r.cont_pct == 100 and r.inter == r.sz_in
    # jaccard of the planted pair is far below the containment threshold
    assert r.inter / (r.sz_in + r.sz_out - r.inter) < 0.5


def test_containment_matches_brute_force_on_the_corpus(spark):
    """Prefix-filtered candidates lose nothing: the emitted pair set at
    t=0.8 equals the brute-force shingle-set replay over the corpus."""
    from gridiron_spark.io.tables import load_table
    from gridiron_spark.queries.dedup import containment_dup_pairs

    out = {
        (r.doc_in, r.doc_out): (r.inter, r.sz_in, r.sz_out, r.cont_pct)
        for r in containment_dup_pairs(spark, SF_SMALL).collect()
    }
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text").collect()

    def shingles(text):
        t = text.lower().split(" ")
        if len(t) < 3:
            return {" ".join(t)}
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    sets = {d.doc_id: shingles(d.text) for d in docs}
    brute = {}
    items = sorted(sets.items())
    for a, sa in items:
        for b, sb in items:
            if a == b:
                continue
            inter = len(sa & sb)
            if inter and inter * 100 // len(sa) >= 80:
                brute[(a, b)] = (inter, len(sa), len(sb), inter * 100 // len(sa))
    assert out == brute
    assert brute, "the corpus must contain containment pairs"
