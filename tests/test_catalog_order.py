"""Catalog-ordering invariants (no Spark session needed).

External verification hash-checks the first 50 catalog entries in catalog
order, so the ordering is load-bearing. Since round 5 the window is a
rotating re-verification ring: new queries get their first evidence row
immediately, then the stalest-evidence queries (round-2 greens) re-enter,
then round-3, then round-4 — keeping every query's driver evidence at most
~2-3 rounds old.
"""

from __future__ import annotations

from gridiron_spark.queries import (
    _DEFER_R6,
    _EVIDENCE_R2,
    _EVIDENCE_R3,
    _EVIDENCE_R4,
    _NEW_R5,
    catalog,
    oracle_sql,
    queries,
)

WINDOW = 50


def test_ordering_sets_exist_in_catalog():
    """A typo in the ordering sets would silently misorder the window."""
    cat = set(catalog().keys())
    for s in (_EVIDENCE_R2, _EVIDENCE_R3, _EVIDENCE_R4, set(_NEW_R5),
              set(_DEFER_R6)):
        missing = s - cat
        assert not missing, f"ordering-set names not in catalog: {missing}"


def test_ordering_sets_disjoint_and_complete():
    """Evidence tiers partition the catalog: each query has exactly one
    latest-evidence round (or is new this round)."""
    tiers = [set(_NEW_R5), _EVIDENCE_R2, _EVIDENCE_R3, _EVIDENCE_R4,
             set(_DEFER_R6)]
    seen: set[str] = set()
    for t in tiers:
        assert not (t & seen), f"query in two tiers: {sorted(t & seen)}"
        seen |= t
    cat = set(catalog().keys())
    assert cat <= seen, f"no evidence plan for: {sorted(cat - seen)}"


def test_tier_order():
    names = list(catalog().keys())
    new_r5, defer_r6 = set(_NEW_R5), set(_DEFER_R6)

    def tier(n: str) -> int:
        if n in new_r5:
            return 1
        if n in defer_r6:
            return 6
        if n in _EVIDENCE_R2:
            return 3
        if n in _EVIDENCE_R3:
            return 4
        if n in _EVIDENCE_R4:
            return 5
        return 2

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "catalog order violates tier priority"


def test_window_rotation():
    """Every new round-5 query and every stalest (round-2-evidence) query
    must be inside the driver's 50-entry verification window."""
    window = set(list(catalog().keys())[:WINDOW])
    assert set(_NEW_R5) <= window
    assert _EVIDENCE_R2 <= window, (
        "stalest-evidence queries fell out of the window: "
        f"{sorted(_EVIDENCE_R2 - window)}"
    )


def test_queries_and_oracles_consistent():
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_deferred_entries_sort_last():
    """Round-6-deferred entries must never consume round-5 window slots."""
    names = list(catalog().keys())
    window = set(names[:WINDOW])
    assert not (set(_DEFER_R6) & window), (
        "deferred entry leaked into the verification window"
    )
