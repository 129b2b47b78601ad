"""Audit repositories: CSV persistence for the JobStep /
TransformationError records a pipeline run collects in its context
(diamond/store/JobStepRepository.scala:25-41,
ErrorRepository.scala:25-41).

Driver-side small data (a run produces tens of steps, at most a
bounded error sample). Writes go through the Hadoop FileSystem when a
SparkSession is supplied — same any-scheme protocol as the loaders —
and plain local files otherwise.
"""

from __future__ import annotations

import csv
import io
from dataclasses import fields

from featurestore_spark.transform.context import JobStep, TransformationError


class _CsvRepository:
    record_cls = None  # set by subclass

    def __init__(self, path: str, spark=None):
        self.path = path
        self.spark = spark

    # -- storage --------------------------------------------------------

    def _write_text(self, text: str) -> None:
        if self.spark is not None:
            from featurestore_spark.io.fs import HadoopFS

            HadoopFS(self.spark).write_text(self.path, text)
        else:
            with open(self.path, "w", newline="") as f:
                f.write(text)

    def _read_text(self) -> str | None:
        if self.spark is not None:
            from featurestore_spark.io.fs import HadoopFS

            return HadoopFS(self.spark).read_text(self.path)
        try:
            with open(self.path, newline="") as f:
                return f.read()
        except FileNotFoundError:
            return None

    # -- API ------------------------------------------------------------

    def save(self, records: list) -> None:
        """Overwrite the file with `records` (the reference's
        `fs.create(path, true)` truncate-write)."""
        cols = [f.name for f in fields(self.record_cls)]
        buf = io.StringIO()
        w = csv.writer(buf)
        w.writerow(cols)
        for r in records:
            w.writerow([getattr(r, c) for c in cols])
        self._write_text(buf.getvalue())

    def load(self) -> list:
        text = self._read_text()
        if text is None:
            return []
        rows = list(csv.reader(io.StringIO(text)))
        if not rows:
            return []
        cols = rows[0]
        return [self.record_cls(**dict(zip(cols, r))) for r in rows[1:]]


class JobStepRepository(_CsvRepository):
    record_cls = JobStep


class ErrorRepository(_CsvRepository):
    record_cls = TransformationError


def persist_context_audit(
    ctx: dict,
    *,
    steps_path: str,
    errors_path: str,
    spark=None,
) -> None:
    """Flush the context's collected audit trail ("steps" / "errors"
    keys, see TransformationContext) to the repositories in one call —
    what the reference's job runner does at the end of a run."""
    JobStepRepository(steps_path, spark).save(ctx.get("steps", []))
    ErrorRepository(errors_path, spark).save(ctx.get("errors", []))
