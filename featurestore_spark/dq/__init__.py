from featurestore_spark.dq.plan import AssertionResult, DQRunner  # noqa: F401
