"""Table-level transformation pipeline with DAG dependency ordering.

Rebuilds diamond/transform/table/TableTransformationPipeline.scala:21-35
and sortFunctions.tsort (sortFunctions.scala:18-40) using
graphlib.TopologicalSorter. Each transformation is DF→DF; the fold is
lazy (one Catalyst plan end-to-end — the pipeline adds zero execution
barriers, so predicate pushdown and column pruning cross step
boundaries freely).
"""

from __future__ import annotations

from graphlib import TopologicalSorter
from typing import Callable

from pyspark.sql import DataFrame

from featurestore_spark.transform.context import JobStep, TransformationContext


class TableTransformation:
    """Named DF→DF function with declared dependencies
    (table/TableTransformation.scala:17-30)."""

    def __init__(
        self,
        name: str,
        fn: Callable[[DataFrame, TransformationContext], DataFrame],
        dependencies: list["TableTransformation"] | None = None,
    ):
        self.name = name
        self.fn = fn
        self.dependencies = list(dependencies or [])

    def add_dependencies(self, *deps: "TableTransformation") -> "TableTransformation":
        self.dependencies.extend(deps)
        return self

    def __call__(self, df: DataFrame, ctx: TransformationContext) -> DataFrame:
        return self.fn(df, ctx)


def toposort(transformations) -> list:
    """Dependency-ordered list; orphans appended in declaration order
    (TableTransformationPipeline.scala:39-50)."""
    graph = {t: set(t.dependencies) for t in transformations}
    # include dependencies not explicitly listed
    for t in list(graph):
        for d in graph[t]:
            graph.setdefault(d, set(d.dependencies))
    ts = TopologicalSorter({t: deps for t, deps in graph.items()})
    ordered = list(ts.static_order())
    declared = [t for t in ordered if t in graph]
    return declared


class TableTransformationPipeline:
    """Toposorted fold of TableTransformations with JobStep audit
    (TableTransformationPipeline.scala:21-35)."""

    def __init__(self, name: str, *transformations: TableTransformation):
        self.name = name
        self.transformations = list(transformations)

    def add(self, *ts: TableTransformation) -> "TableTransformationPipeline":
        self.transformations.extend(ts)
        return self

    def __call__(self, df: DataFrame, ctx: TransformationContext) -> DataFrame:
        steps = ctx.setdefault("steps", [])
        out = df
        for t in toposort(self.transformations):
            try:
                out = t(out, ctx)
                steps.append(JobStep(t.name, "success"))
            except Exception as e:
                steps.append(JobStep(t.name, "failure", str(e)))
                raise
        return out
