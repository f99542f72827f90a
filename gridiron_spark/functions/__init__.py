from gridiron_spark.functions.decimal_safe import dec, dsum, dmean  # noqa: F401
