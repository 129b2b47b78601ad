"""Key-hash and row-fingerprint column expressions.

Reference semantics (common/utility/hashFunctions.scala:30-61):
- `hashKey`      = MD5 hex of a concatenated string  → entity keys.
- `sha256HashKey` = SHA-256 hex variant.
- `fastHash`     = xxHash64 of the value columns     → change detection.

All are Spark built-ins here (md5 / sha2 / xxhash64) — JVM-side,
codegen'd, no Python UDFs. The exact hash family for `fingerprint` is
configurable because its only contract is "stable row fingerprint";
`md5` mode exists so DuckDB oracles can reproduce it exactly.

Null / ordering discipline (SURVEY.md §7 "what's hard"): the inputs to
both hashes are rendered null-safely in a pinned column order,
otherwise updates are spuriously detected. Two renderings:

- `hash_key` renders null as "\x01" and concatenates WITHOUT field
  separators, matching the reference's `hashKey(idType ++ id)` for all
  non-null inputs (hashFunctions.scala:30-37) so entity ids equal the
  reference's. Inherited caveat: multi-field keys are ambiguous under
  bare concatenation (('ab','c') == ('a','bc')) — acceptable for keys,
  which are near-always single non-null fields.
- `fingerprint` (change detection; internal-only contract) breaks from
  the reference deliberately: fields joined with the ASCII unit
  separator, null rendered as the record separator — field boundaries
  unambiguous, null never collides with any real string. A silent
  missed-update is worse than hash inequality with the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

NULL_SENTINEL = "\x01"  # hash_key null marker (distinct from '' but unseparated)
FP_FIELD_SEP = "\x1f"  # fingerprint field boundary (ASCII unit separator)
FP_NULL_SENTINEL = "\x1e"  # fingerprint null marker (ASCII record separator)


def _rendered(
    cols: Sequence[str | Column], null_sentinel: str = NULL_SENTINEL
) -> list[Column]:
    """Null-safe string rendering of hash inputs in pinned order."""
    out = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        out.append(F.coalesce(col.cast("string"), F.lit(null_sentinel)))
    return out


def hash_key(*cols: str | Column) -> Column:
    """MD5 hex of the concatenated key columns (entity_id convention).

    Mirrors hashFunctions.scala:30-37 (`hashKey(idType ++ id)`), e.g.
    ``hash_key(F.lit("customer"), "c_custkey")``.
    """
    return F.md5(F.concat(*_rendered(cols)))


def sha256_hash_key(*cols: str | Column) -> Column:
    """SHA-256 hex variant (hashFunctions.scala:45-51)."""
    return F.sha2(F.concat(*_rendered(cols)), 256)


def fingerprint(cols: Sequence[str | Column], method: str = "xxhash64") -> Column:
    """Stable row fingerprint over the value columns (change detection).

    `xxhash64` (default) is the fast JVM path, mirroring `fastHash`
    (hashFunctions.scala:60-61). `md5` gives a cross-engine-stable
    string (same result in DuckDB) for oracle-checked paths.
    """
    rendered = _rendered(cols, FP_NULL_SENTINEL)
    if method == "xxhash64":
        return F.xxhash64(*rendered).cast("string")
    if method == "md5":
        return F.md5(F.concat_ws(FP_FIELD_SEP, *rendered))
    raise ValueError(f"unknown fingerprint method: {method}")
