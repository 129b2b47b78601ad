from featurestore_spark.star.loader import DimSpec, StarConfig, StarLoader  # noqa: F401
