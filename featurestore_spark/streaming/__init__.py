from featurestore_spark.streaming.ops import (  # noqa: F401
    read_event_stream,
    streaming_attribution,
    streaming_dedup_exact,
    streaming_event_counts,
    streaming_sessionize,
)
