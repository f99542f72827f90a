"""Exchange-width helpers shared by the range-partitioned rank machinery."""

from __future__ import annotations


def range_parts(spark) -> int:
    """Range-exchange width for the ranked-sort machinery: the session's
    configured shuffle parallelism, NOT a literal — results are
    rank-exact under any partition count (pytest pins invariance), so
    the only effect is parallelism, which must scale with the cluster
    (ADVICE r9: a hardcoded width caps a 1000-executor deployment).
    Lives outside the query modules so any of them can import it
    without triggering a sibling's catalog registrations."""
    return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
