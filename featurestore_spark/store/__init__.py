from featurestore_spark.store.registry import Feature, FeatureStore  # noqa: F401
