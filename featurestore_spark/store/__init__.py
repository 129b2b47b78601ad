from featurestore_spark.store.audit import (  # noqa: F401
    ErrorRepository,
    JobStepRepository,
    persist_context_audit,
)
from featurestore_spark.store.registry import Feature, FeatureStore  # noqa: F401
