"""The in-repo replica of the driver's correctness gate.

For every catalog query with an oracle: run the Spark plan and the DuckDB SQL
on the same parquet tables, canonicalize both results (columns sorted by name,
rows sorted by all values), and require EXACT equality — including bit-exact
doubles, because the driver compares order-insensitive value *hashes*, not
approximate values. Any tolerance here would hide a driver-level failure.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from gridiron_spark.queries import catalog
from tests.conftest import SF_ORACLE

_CATALOG = catalog()
_ORACLE_QUERIES = sorted(n for n, e in _CATALOG.items() if e.oracle)
_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    # bytes→hex so bytes/str mismatches surface as visible diffs, floats kept
    # exact; Decimal normalized to str for stable compare.
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [c for _, c in sorted(enumerate(colnames), key=lambda p: p[1])], out


@pytest.fixture(scope="module")
def duck():
    con = _duck_connection(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", _ORACLE_QUERIES)
def test_oracle_parity(name, spark, duck):
    entry = _CATALOG[name]
    sdf = entry.spark_fn(spark, SF_ORACLE)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    res = duck.execute(entry.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column sets differ\n spark={sorted(spark_cols)}\n duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row counts differ spark={len(spark_rows)} duck={len(duck_rows)}"
    )

    _, s_canon = _canon(spark_rows, spark_cols)
    _, d_canon = _canon(duck_rows, duck_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_every_query_has_rows(spark):
    """Rows-only sanity for oracle-less queries (the driver's weaker check).

    Every oracle-less query must produce at least one row at SF_ORACLE —
    a zero-row result means the operator silently did nothing.
    """
    for name, entry in _CATALOG.items():
        if entry.oracle:
            continue
        df = entry.spark_fn(spark, SF_ORACLE)
        assert df.count() > 0, f"{name}: oracle-less query returned 0 rows"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "flagship entry() returned 0 rows"
    assert set(e.oracle_sql()) <= set(e.queries())


def test_events_ts_us_subsecond(spark):
    """Pin sub-second precision of the derived ts_us column.

    Regression guard for the round-2 failure: Spark 4.1 reads the events
    table's TIMESTAMP(NANOS) column natively as timestamp_ntz, and the old
    fallback (`unix_timestamp(ts) * 1e6`) truncated to whole seconds,
    hash-failing every downstream time-ordered query.
    """
    from gridiron_spark.io.tables import load_table

    ev = load_table(spark, SF_ORACLE, "events")
    subsec = ev.filter("ts_us % 1000000 != 0").count()
    assert subsec > 0, "ts_us lost sub-second precision"
    # and it must agree with DuckDB's µs epoch to the microsecond
    con = _duck_connection(SF_ORACLE)
    try:
        (dmin, dmax) = con.execute(
            "SELECT min(epoch_us(ts)), max(epoch_us(ts)) FROM events"
        ).fetchone()
    finally:
        con.close()
    row = ev.selectExpr("min(ts_us) AS lo", "max(ts_us) AS hi").first()
    assert (row.lo, row.hi) == (dmin, dmax)
