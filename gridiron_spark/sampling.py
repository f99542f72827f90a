"""Seeded exact-N sampling — the reference's signature operator, rebuilt for scale.

The reference samples exactly *n* distinct keys reproducibly
(``valid_keys.sample(n=n, seed=seed)``, reference src/query.py:52) after a
distinct key projection (src/query.py:39-43). Spark's ``DataFrame.sample`` is
fraction-based and inexact, so we need our own exact-n seeded semantics.

Design: **rank-by-hash**. Assign every key ``md5(key || '#' || seed)`` and take
the n smallest digests. Properties:

- *Exact-n* and *seeded-deterministic* — same keys for the same seed, on any
  cluster size, any partitioning, any Spark version (md5 is a spec, not an
  implementation detail like ``rand(seed)``'s per-partition streams).
- *Uniform* — md5 output is uniform over the key space, so the n smallest
  digests are a uniform random subset.
- *Scale-friendly* — ``ORDER BY digest LIMIT n`` compiles to
  ``TakeOrderedAndProject``: each partition keeps a local top-n heap and only
  n rows per partition reach the driver-side merge. No global sort, no full
  shuffle. At 100 TB this is a single map pass + tiny reduce.
- *Oracle-expressible* — plain SQL (``ORDER BY md5(...) LIMIT n``) runs
  identically in DuckDB, which is what makes the sampling pipeline
  hash-checkable against an oracle at all (a `rand(seed)` order would not be).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sample_digest(cols: Sequence[str], seed: int) -> Column:
    """md5 digest column over the composite key + seed.

    SQL mirror: ``md5(concat_ws('#', key1, key2, ..., '<seed>'))``.
    """
    parts = [F.col(c).cast("string") for c in cols] + [F.lit(str(seed))]
    return F.md5(F.concat_ws("#", *parts))


def sample_exact_n(
    df: DataFrame, key_cols: Sequence[str], n: int, seed: int
) -> DataFrame:
    """Exactly-n seeded sample of distinct keys (reference src/query.py:31-55).

    Distinct-project the keys, rank by seeded digest, keep the n smallest.
    If fewer than n distinct keys exist, all are returned (the reference's
    return-all fallback, src/query.py:45-52, without its driver-side count).
    """
    keys = df.select(*key_cols).distinct()
    digest = sample_digest(key_cols, seed)
    # key columns as tie-breakers: md5 collisions are cryptographically
    # implausible, but determinism should not rest on that.
    ranked = keys.orderBy(digest, *key_cols).limit(n)
    return ranked
