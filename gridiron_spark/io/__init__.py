from gridiron_spark.io.tables import TABLES, load_table  # noqa: F401
