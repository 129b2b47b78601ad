from featurestore_spark.queries.catalog import QUERIES, QuerySpec  # noqa: F401
