"""Query layer over the partitioned tracking lake (reference src/query.py,
app listing helpers app/main.py:46-81, CSV export src/export.py).

Everything stays a lazy DataFrame until the caller acts. Partition columns
(``season``, ``gameId``) are first-class via ``basePath`` discovery, so
``filter(season=...)`` / ``filter(gameId=...)`` prune whole directories before
any I/O — the reference's glob scan only got this for gameId via the embedded
column (SURVEY.md §4 partition-pruning note).
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gridiron_spark.sampling import sample_digest

PLAY_KEY = ("gameId", "playId")


class Pool:
    """A partitioned parquet lake of long-format tracking rows."""

    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.path = str(path)
        if not Path(self.path).exists():
            raise FileNotFoundError(f"pool not found: {self.path}")

    def scan(self) -> DataFrame:
        """Lazy whole-lake scan with partition-column discovery
        (reference src/query.py:18-24)."""
        return self.spark.read.option("basePath", self.path).parquet(self.path)

    def probe(self) -> bool:
        """Cheap liveness check: can we read one row? (Fixes the reference
        dashboard's collect-the-whole-pool probe, app/main.py:46 — this reads
        a single row group.)"""
        return len(self.scan().limit(1).collect()) == 1

    # -- listings (dashboard surface, app/main.py:49-60) ----------------------

    def games(self) -> list[int]:
        rows = self.scan().select("gameId").distinct().orderBy("gameId").collect()
        return [r.gameId for r in rows]

    def plays(self, game_id: int) -> list[int]:
        rows = (
            self.scan()
            .filter(F.col("gameId") == game_id)
            .select("playId")
            .distinct()
            .orderBy("playId")
            .collect()
        )
        return [r.playId for r in rows]

    def fetch_play(self, game_id: int, play_id: int) -> DataFrame:
        """One play's frames in time order (app/main.py:74-81)."""
        return (
            self.scan()
            .filter((F.col("gameId") == game_id) & (F.col("playId") == play_id))
            .orderBy("frameId", "nflId")
        )

    # -- the signature sampler (src/query.py:31-55) ---------------------------

    def sample_plays(
        self,
        n: int,
        filters: Iterable[Column] = (),
        seed: int = 42,
        key_cols: Sequence[str] = PLAY_KEY,
    ) -> DataFrame:
        """Exactly-n seeded random plays, with all their frames.

        Pipeline: conjunctive filters → distinct key projection → rank-by-hash
        exact-n sample (gridiron_spark.sampling) → broadcast join-back. The
        sampled key set is ≤ n rows, so the join never shuffles the lake —
        one scan, map-side join, done. If fewer than n plays match, all are
        returned (reference return-all fallback, src/query.py:45-52).
        """
        pool = self.scan()
        for f in filters:
            pool = pool.filter(f)
        keys = pool.select(*key_cols).distinct()
        sampled = keys.orderBy(sample_digest(key_cols, seed), *key_cols).limit(n)
        full = self.scan()  # frames come from the unfiltered pool, like the reference
        return full.join(F.broadcast(sampled), on=list(key_cols), how="inner")

    # -- sinks (src/export.py) -------------------------------------------------

    def export_csv(
        self,
        df: DataFrame,
        out_dir: str | Path,
        single_file: bool = False,
        order_by: Sequence[str] = ("gameId", "playId", "frameId", "nflId"),
    ) -> None:
        """Canonically-ordered CSV dump (reference src/export.py + the
        sampler's sort contract, scripts/random_plays_sampler.py:96).
        ``single_file`` coalesces to one part — only for fixture-sized data."""
        out = df
        present = [c for c in order_by if c in df.columns]
        if present:
            out = out.orderBy(*present)
        if single_file:
            out = out.coalesce(1)
        out.write.mode("overwrite").option("header", True).csv(str(out_dir))
