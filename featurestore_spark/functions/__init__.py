from featurestore_spark.functions.hashing import (  # noqa: F401
    fingerprint,
    hash_key,
    sha256_hash_key,
)
