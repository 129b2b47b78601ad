from featurestore_spark.load.vault import (  # noqa: F401
    LoadResult,
    VaultLoader,
    classify_upserts,
)
