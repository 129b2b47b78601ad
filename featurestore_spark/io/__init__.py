from featurestore_spark.io.tables import TABLE_NAMES, load_table, load_tables, register_views  # noqa: F401
