from featurestore_spark.operators.events import (  # noqa: F401
    collapse_runs,
    count_events,
    count_unique_events,
    current_events,
    days_since_earliest,
    days_since_latest,
    extract_chords,
    paths,
    previous_interactions,
    previous_interactions_chord,
    previous_unique_interactions,
    sessionize,
    sum_events,
    unique_paths,
)
from featurestore_spark.operators.pivot import chord_pivot, snapshot_pivot  # noqa: F401
from featurestore_spark.operators.snapshot import latest_per_key  # noqa: F401
from featurestore_spark.operators.curation import (  # noqa: F401
    boilerplate_flags,
    decontaminate,
    decontaminate_spans,
    dedup_lines,
    line_doc_frequency,
    redact_pii,
    remove_shared_spans,
    repetition_metrics,
)
from featurestore_spark.operators.temporal import (  # noqa: F401
    asof_join,
    interval_join,
    time_rollup,
)
