"""Declarative table schemas: the canonical-target / aliased-source model.

The reference drives ingestion from a YAML schema that declares, per canonical
column, the candidate source-column spellings, the target dtype, nullability,
and a constant default (reference configs/schema.yaml; applied at
src/ingest.py:27-43). This module is our own take on that model — the schema
is the single source of truth *for ingestion only*; post-ingest parquet is
self-describing (reference docs/DATA_LAKE_GUIDE.md:116-123).

YAML format (ours — compact, Spark-typed):

    table: tracking
    partition_by: [season, gameId]
    columns:
      gameId:   {type: long, aliases: [game_id, GameId]}
      nflId:    {type: int, aliases: [nfl_id, NflId], nullable: true}
      s:        {type: float, aliases: [speed, S], default: 0.0}

Type names are Spark SQL simple strings (long/int/short/float/double/string/
boolean/timestamp/date). Unsigned reference dtypes (UInt8/UInt16) map to the
next-wider signed Spark type with an optional declared ``min: 0`` range check
(SURVEY.md §1.2), since Spark has no unsigned integers.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import yaml
from pyspark.sql import types as T

_TYPE_MAP: dict[str, T.DataType] = {
    "long": T.LongType(),
    "bigint": T.LongType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}


@dataclass(frozen=True)
class ColumnSpec:
    name: str
    type_name: str
    aliases: tuple[str, ...] = ()
    nullable: bool = False
    default: Any = None
    # declared value range (YAML keys ``min``/``max``). This is how unsigned
    # reference dtypes survive the widening to signed Spark types: a UInt8
    # column becomes ``short`` with ``min: 0, max: 255`` and out-of-range
    # values null out instead of silently wrapping (reference
    # data/nfl-bdb/2026/schema.yaml declares UInt8/UInt16 columns).
    min_value: Any = None
    max_value: Any = None

    @property
    def spark_type(self) -> T.DataType:
        try:
            return _TYPE_MAP[self.type_name]
        except KeyError:
            raise ValueError(
                f"column {self.name!r}: unknown type {self.type_name!r}"
            ) from None

    @property
    def candidates(self) -> tuple[str, ...]:
        """Source-name candidates in priority order: canonical name first,
        then declared aliases (reference resolution order, src/ingest.py:30-31)."""
        return (self.name, *self.aliases)


@dataclass(frozen=True)
class TableSchema:
    name: str
    columns: tuple[ColumnSpec, ...]
    partition_by: tuple[str, ...] = ()
    metadata: dict = field(default_factory=dict)

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable or c.default is None)
             for c in self.columns]
        )

    def __getitem__(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    @classmethod
    def from_dict(cls, d: dict) -> TableSchema:
        cols = []
        for name, spec in d["columns"].items():
            if isinstance(spec, str):  # shorthand: colname: type
                spec = {"type": spec}
            cols.append(
                ColumnSpec(
                    name=name,
                    type_name=spec["type"],
                    aliases=tuple(spec.get("aliases", ())),
                    nullable=bool(spec.get("nullable", False)),
                    default=spec.get("default"),
                    min_value=spec.get("min"),
                    max_value=spec.get("max"),
                )
            )
        return cls(
            name=d.get("table", "table"),
            columns=tuple(cols),
            partition_by=tuple(d.get("partition_by", ())),
            metadata=d.get("metadata", {}),
        )

    @classmethod
    def load(cls, path: str | Path) -> TableSchema:
        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f))
