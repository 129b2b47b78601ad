"""Pipeline orchestration: source → transformations → sink
(diamond/transform/Pipeline.scala:12-45).

The two-source variant joins with explicit conditions — the reference
discarded the `df.where` results in its loop (Pipeline.scala:23-30, a
known bug); here the filters are actually applied (SURVEY.md §7:
implement documented intent, note divergence).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame

from featurestore_spark.transform.context import TransformationContext


class Pipeline:
    def __init__(self, name: str, transformation: Callable):
        self.name = name
        self.transformation = transformation

    def run(self, source: Callable, sink: Callable, ctx: TransformationContext):
        """sink(apply(source(ctx), ctx), ctx) — Pipeline.scala:20-21."""
        df = source(ctx)
        out = self.transformation(df, ctx)
        return sink(out, ctx)

    def run_two_sources(
        self,
        source1: Callable,
        source2: Callable,
        on: list,
        sink: Callable,
        ctx: TransformationContext,
        how: str = "inner",
    ):
        """Two-source join variant (Pipeline.scala:23-30, bug fixed:
        join conditions are applied, not discarded)."""
        df = source1(ctx).join(source2(ctx), on, how)
        out = self.transformation(df, ctx)
        return sink(out, ctx)

    def print_dag(self) -> str:
        """ASCII DAG render (Pipeline.scala:32-45)."""
        lines = [self.name]
        t = self.transformation
        for sub in getattr(t, "transformations", []):
            deps = ",".join(d.name for d in getattr(sub, "dependencies", []))
            lines.append(f"  {sub.name}" + (f" <- [{deps}]" if deps else ""))
        return "\n".join(lines)
