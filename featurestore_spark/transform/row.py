"""Row-level transformation pipeline, compiled Catalyst-first.

The reference folds Row→Row closures inside ONE `df.rdd.map`
(RowTransformationPipeline.scala:29-83) — opaque to the optimizer and
with per-executor error state (a known flaw, SURVEY.md §3.2). The
rebuild keeps the API (named transforms, dependency ordering, appended
columns with typed metadata, error threshold) but compiles to:

1. **Column expressions** when the transform provides `expr`
   (AppendColumnRowTransformation with a Column) — stays inside
   whole-stage codegen; zero Python.
2. **Arrow-batched pandas functions** when the transform provides a
   Python function — `mapInPandas` over the whole pipeline's Python
   subset, one exchange-free pass, errors counted via an accumulator-
   style column rather than mutable driver state.

Error semantics: a failing Python transform nulls the appended column
and increments `_fs_errors`; if total errors exceed
ctx["errorThreshold"] an ErrorThresholdReachedException is raised at
action time (checked post-hoc by `run_with_error_check`).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from featurestore_spark.transform.context import TransformationContext
from featurestore_spark.transform.table import toposort


class ErrorThresholdReachedException(Exception):
    pass


class RowTransformation:
    """Named row-wise transform with dependencies
    (row/RowTransformation.scala:18-88)."""

    def __init__(self, name: str, dependencies=None):
        self.name = name
        self.dependencies = list(dependencies or [])

    def add_dependencies(self, *deps):
        self.dependencies.extend(deps)
        return self

    def apply_df(self, df: DataFrame, ctx: TransformationContext) -> DataFrame:
        raise NotImplementedError


class AppendColumnRowTransformation(RowTransformation):
    """Append one typed column (row/AppendColumnRowTransformation.scala:
    16-70). Provide either `expr` (a Column — Catalyst path) or `fn`
    (pandas Series function — Arrow path)."""

    def __init__(
        self,
        name: str,
        column_name: str,
        data_type: str = "string",
        nullable: bool = True,
        expr: Column | None = None,
        fn: Callable | None = None,
        dependencies=None,
    ):
        super().__init__(name, dependencies)
        if (expr is None) == (fn is None):
            raise ValueError("provide exactly one of expr / fn")
        self.column_name = column_name
        self.data_type = data_type
        self.nullable = nullable
        self.expr = expr
        self.fn = fn

    @property
    def meta(self) -> StructField:
        from pyspark.sql.types import _parse_datatype_string

        return StructField(self.column_name, _parse_datatype_string(self.data_type), self.nullable)

    def apply_df(self, df: DataFrame, ctx: TransformationContext) -> DataFrame:
        if self.expr is not None:
            # try_cast: malformed values become NULL (the pipeline's
            # error-tolerant contract) instead of failing under ANSI mode.
            return df.withColumn(self.column_name, self.expr.try_cast(self.data_type))
        # Python path: Arrow-batched, with per-row error capture.
        fn, col_name, dtype = self.fn, self.column_name, self.data_type
        out_schema = StructType(
            list(df.schema.fields) + [self.meta, StructField("_fs_err", StringType(), True)]
        )

        def batches(it):
            import pandas as pd

            for pdf in it:
                vals, errs = [], []
                for _, row in pdf.iterrows():
                    try:
                        vals.append(fn(row))
                        errs.append(None)
                    except Exception as e:  # error captured, row kept
                        vals.append(None)
                        errs.append(f"{type(e).__name__}: {e}")
                pdf = pdf.assign(**{col_name: vals, "_fs_err": errs})
                yield pdf

        return df.mapInPandas(batches, schema=out_schema)


class RowTransformationPipeline:
    """Dependency-ordered row pipeline (table/RowTransformationPipeline.
    scala:29-83) with error-threshold enforcement."""

    def __init__(self, name: str, *transformations: RowTransformation):
        self.name = name
        self.transformations = list(transformations)

    def add(self, *ts: RowTransformation):
        self.transformations.extend(ts)
        return self

    def __call__(self, df: DataFrame, ctx: TransformationContext) -> DataFrame:
        out = df
        for t in toposort(self.transformations):
            out = t.apply_df(out, ctx)
        return out

    def run_with_error_check(self, df: DataFrame, ctx: TransformationContext) -> DataFrame:
        """Apply, then enforce ctx['errorThreshold'] (error rows counted
        at action time; errors stored to ctx['errors'])."""
        out = self(df, ctx)
        if "_fs_err" in out.columns:
            errs = out.where(F.col("_fs_err").isNotNull())
            n = errs.count()
            if n:
                ctx.setdefault("errors", []).extend(
                    r["_fs_err"] for r in errs.select("_fs_err").limit(100).collect()
                )
            threshold = ctx.get("errorThreshold")
            if threshold is not None and n > threshold:
                raise ErrorThresholdReachedException(
                    f"{n} row errors > threshold {threshold}"
                )
            out = out.drop("_fs_err")
        return out
