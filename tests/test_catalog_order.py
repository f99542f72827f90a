"""Catalog-ordering invariants (no Spark session needed).

External verification hash-checks the first 50 catalog entries in catalog
order, so the ordering is load-bearing: never-driver-checked queries must
come first to maximize new CORRECTNESS rows per round.
"""

from __future__ import annotations

from gridiron_spark.queries import _VERIFIED_R1_R2, catalog, oracle_sql, queries


def test_verified_names_exist_in_catalog():
    """A typo in _VERIFIED_R1_R2 would silently misorder the window."""
    cat = set(catalog().keys())
    missing = _VERIFIED_R1_R2 - cat
    assert not missing, f"_VERIFIED_R1_R2 names not in catalog: {missing}"


def test_unverified_entries_precede_verified():
    names = list(catalog().keys())
    seen_verified = False
    for n in names:
        if n in _VERIFIED_R1_R2:
            seen_verified = True
        else:
            assert not seen_verified, f"unverified {n} after a verified entry"


def test_queries_and_oracles_consistent():
    q = queries()
    o = oracle_sql()
    assert set(o) <= set(q)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and s.strip() for s in o.values())
