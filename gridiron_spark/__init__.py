"""gridiron_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system (JHollenb/gridiron, surveyed in SURVEY.md): schema-normalizing
ingest into a Hive-partitioned Parquet lake, a lazy query/sampling layer, and
large-scale training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing, streaming) — all expressed Spark-first:
DataFrame/SQL plans that Catalyst optimizes, with Pandas UDFs only where
built-in operators genuinely cannot express the semantics.
"""

__version__ = "0.1.0"

from gridiron_spark.session import get_spark  # noqa: F401
