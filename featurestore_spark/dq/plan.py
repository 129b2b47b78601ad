"""Data-quality assertion / diff / view plans (TopNotch-style, D1–D4).

The reference declared this capability through the external
com.bfm.topnotch dependency (docs/dq_testing.md, DQTestSpec.scala:1-32;
plan JSONs at resources/testsuite/). Reimplemented natively:

- **Assertion** (D1): a SQL where-clause defines VALID rows; the check
  fails when invalid_fraction > threshold. Invalid rows are returned
  (and optionally persisted) for triage.
- **Diff** (D2): full-outer join of two datasets on a unique key;
  per-column mismatch flags.
- **View** (D3): SQL over temp-view-registered inputs producing a
  dataset for later steps.
- **Plan** (D4): JSON-driven sequence of the above with in-memory refs.

Scale: assertions are a single filtered count (one scan, predicate
pushed down); the invalid-row sample is `limit`ed so a 100 TB failure
doesn't materialize 100 TB of evidence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class AssertionResult:
    name: str
    query: str
    total: int
    invalid: int
    threshold: float
    passed: bool
    fraction: float

    def to_dict(self) -> dict:
        return self.__dict__.copy()


@dataclass
class PlanReport:
    assertions: list[AssertionResult] = field(default_factory=list)
    diffs: dict[str, int] = field(default_factory=dict)

    @property
    def passed(self) -> bool:
        return all(a.passed for a in self.assertions)

    def to_dict(self) -> dict:
        return {
            "passed": self.passed,
            "assertions": [a.to_dict() for a in self.assertions],
            "diffs": self.diffs,
        }


class DQRunner:
    def __init__(self, spark: SparkSession, invalid_sample_rows: int = 1000):
        self.spark = spark
        self.invalid_sample_rows = invalid_sample_rows

    # -- D1 ------------------------------------------------------------------

    def run_assertion(
        self, df: DataFrame, name: str, query: str, threshold: float
    ) -> tuple[AssertionResult, DataFrame]:
        """`query` is a SQL boolean expression describing VALID rows
        (e.g. "unit_price > 0"); fail when invalid fraction > threshold
        (resources/testsuite/assertions.json)."""
        valid = F.expr(query)
        counted = df.select(
            F.count(F.lit(1)).alias("total"),
            F.sum(F.when(~valid | valid.isNull(), 1).otherwise(0)).alias("invalid"),
        ).first()
        total, invalid = counted["total"], int(counted["invalid"] or 0)
        fraction = (invalid / total) if total else 0.0
        result = AssertionResult(
            name=name,
            query=query,
            total=total,
            invalid=invalid,
            threshold=threshold,
            passed=fraction <= threshold,
            fraction=fraction,
        )
        invalid_rows = df.where(~valid | valid.isNull()).limit(self.invalid_sample_rows)
        return result, invalid_rows

    # -- D2 ------------------------------------------------------------------

    def run_diff(
        self,
        left: DataFrame,
        right: DataFrame,
        key_cols: list[str],
        compare_cols: list[str],
    ) -> DataFrame:
        """Full-outer join on the unique key; one `<col>_match` flag per
        compared column plus presence flags."""
        l = left.select(
            *key_cols, *[F.col(c).alias(f"{c}__l") for c in compare_cols]
        )
        r = right.select(
            *key_cols, *[F.col(c).alias(f"{c}__r") for c in compare_cols]
        )
        joined = l.join(r, key_cols, "full_outer")
        flags = [
            (
                F.col(f"{c}__l").eqNullSafe(F.col(f"{c}__r"))
            ).alias(f"{c}_match")
            for c in compare_cols
        ]
        return joined.select(
            *key_cols,
            *[F.col(f"{c}__l") for c in compare_cols],
            *[F.col(f"{c}__r") for c in compare_cols],
            *flags,
        )

    # -- D3 ------------------------------------------------------------------

    def run_view(self, sql: str, inputs: dict[str, DataFrame]) -> DataFrame:
        for name, df in inputs.items():
            df.createOrReplaceTempView(name)
        return self.spark.sql(sql)

    # -- D4 ------------------------------------------------------------------

    def run_plan(self, plan: dict, inputs: dict[str, DataFrame]) -> PlanReport:
        """JSON-driven plan: steps of type view/assertion/diff with
        in-memory refs (resources/testsuite/plan.json shape)."""
        report = PlanReport()
        datasets = dict(inputs)
        for step in plan.get("steps", []):
            kind = step["type"]
            if kind == "view":
                datasets[step["name"]] = self.run_view(step["sql"], datasets)
            elif kind == "assertion":
                df = datasets[step["input"]]
                for a in step["assertions"]:
                    res, invalid = self.run_assertion(
                        df, a.get("name", a["query"]), a["query"], a.get("threshold", 0.0)
                    )
                    report.assertions.append(res)
                    if a.get("output"):
                        invalid.write.mode("overwrite").parquet(a["output"])
            elif kind == "diff":
                diff = self.run_diff(
                    datasets[step["left"]],
                    datasets[step["right"]],
                    step["key_cols"],
                    step["compare_cols"],
                )
                match_all = F.expr(
                    " AND ".join(f"{c}_match" for c in step["compare_cols"])
                )
                n_mismatch = diff.where(~match_all | match_all.isNull()).count()
                report.diffs[step.get("name", f"{step['left']}~{step['right']}")] = (
                    n_mismatch
                )
                datasets[step.get("name", "diff")] = diff
            else:
                raise ValueError(f"unknown plan step type: {kind}")
        return report
