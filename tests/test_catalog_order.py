"""Catalog-ordering invariants (no Spark session needed).

External verification hash-checks the first 50 catalog entries in catalog
order, so the ordering is load-bearing: queries that were red in round 3
(now fixed) must re-enter the window, the never-driver-checked backlog must
get its first evidence rows, and only then do re-verification slots fill.
"""

from __future__ import annotations

from gridiron_spark.queries import (
    _FAILED_R3,
    _NEW_R4,
    _VERIFIED_R1_R3,
    catalog,
    oracle_sql,
    queries,
)

WINDOW = 50


def test_verified_names_exist_in_catalog():
    """A typo in the ordering sets would silently misorder the window."""
    cat = set(catalog().keys())
    for s in (_VERIFIED_R1_R3, _FAILED_R3, set(_NEW_R4)):
        missing = s - cat
        assert not missing, f"ordering-set names not in catalog: {missing}"
    # fixed-reds and never-checked tiers are disjoint by construction
    assert not (_FAILED_R3 & set(_NEW_R4))


def test_tier_order():
    names = list(catalog().keys())

    def tier(n: str) -> int:
        if n in _FAILED_R3:
            return 0
        if n in set(_NEW_R4):
            return 1
        if n not in _VERIFIED_R1_R3:
            return 2
        return 3

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "catalog order violates tier priority"


def test_window_contains_fixed_and_backlog():
    """Every r3-red (now fixed) query and every never-driver-checked query
    must be inside the driver's 50-entry verification window — round 4
    should end with 100% of the catalog carrying a driver evidence row."""
    window = set(list(catalog().keys())[:WINDOW])
    assert _FAILED_R3 <= window
    assert set(_NEW_R4) <= window


def test_full_catalog_has_evidence_plan():
    """No query may sit outside all three evidence tiers: everything is
    either already driver-verified or scheduled inside this round's window."""
    cat = set(catalog().keys())
    covered = _VERIFIED_R1_R3 | _FAILED_R3 | set(_NEW_R4)
    assert cat <= covered, f"no evidence plan for: {sorted(cat - covered)}"


def test_queries_and_oracles_consistent():
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in o.values())
