"""Catalog-ordering invariants (no Spark session needed).

External verification hash-checks the first 50 catalog entries in catalog
order, so the ordering is load-bearing: queries that were red in round 2
(now fixed) must re-enter the window, this round's new operators must get
their first evidence rows, and only then does the never-checked backlog
fill the remaining slots.
"""

from __future__ import annotations

from gridiron_spark.queries import (
    _FAILED_R2,
    _NEW_R3,
    _VERIFIED_R1_R2,
    catalog,
    oracle_sql,
    queries,
)

WINDOW = 50


def test_verified_names_exist_in_catalog():
    """A typo in the ordering sets would silently misorder the window."""
    cat = set(catalog().keys())
    for s in (_VERIFIED_R1_R2, _FAILED_R2, set(_NEW_R3)):
        missing = s - cat
        assert not missing, f"ordering-set names not in catalog: {missing}"
    # the failed tier is a subset of the driver-checked set by construction
    assert _FAILED_R2 <= _VERIFIED_R1_R2


def test_tier_order():
    names = list(catalog().keys())

    def tier(n: str) -> int:
        if n in _FAILED_R2:
            return 0
        if n in set(_NEW_R3):
            return 1
        if n not in _VERIFIED_R1_R2:
            return 2
        return 3

    tiers = [tier(n) for n in names]
    assert tiers == sorted(tiers), "catalog order violates tier priority"


def test_window_contains_fixed_and_new():
    """Every r2-red (now fixed) query and every round-3 addition must be
    inside the driver's 50-entry verification window."""
    window = set(list(catalog().keys())[:WINDOW])
    assert _FAILED_R2 <= window
    assert set(_NEW_R3) <= window


def test_queries_and_oracles_consistent():
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in o.values())
