from gridiron_spark.schema.registry import ColumnSpec, TableSchema  # noqa: F401
from gridiron_spark.schema.normalize import normalize  # noqa: F401
