"""TransformationContext — the mutable map "passed like a baton"
(diamond/transform/TransformationContext.scala:19-36).

A thin dict subclass; conventional keys:
- "sqlparams": dict for `$var` SQL templating
- "errors": list of TransformationError records
- "steps": list of JobStep audit records
- "errorThreshold": int abort limit for row pipelines
"""

from __future__ import annotations

from dataclasses import dataclass


class TransformationContext(dict):
    def copy(self) -> "TransformationContext":
        return TransformationContext(dict.copy(self))


@dataclass
class JobStep:
    """Audit record per pipeline step (diamond/models/JobStep.scala:9-16)."""

    name: str
    status: str  # "success" | "failure"
    message: str = ""


@dataclass
class TransformationError:
    """Row-level error record (diamond/models/Errors.scala:11-21)."""

    transformation: str
    message: str
    row_repr: str = ""
