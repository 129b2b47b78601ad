"""String utilities (F9): naming/config helpers
(common/utility/stringFunctions.scala:15-63).

Driver-side pure Python (used for table naming and config keys, not in
dataflows).
"""

from __future__ import annotations

import re


def camelize(s: str, upper_first: bool = False) -> str:
    """snake_case / kebab-case → camelCase (stringFunctions.scala:15-24)."""
    parts = re.split(r"[_\-\s]+", s.strip())
    if not parts:
        return s
    head = parts[0].lower() if not upper_first else parts[0].capitalize()
    return head + "".join(p.capitalize() for p in parts[1:] if p)


def underscore(s: str) -> str:
    """camelCase → snake_case, lowercased (stringFunctions.scala:26-33);
    also normalizes spaces/dashes (star table naming, Setup.scala:28-30)."""
    s = re.sub(r"([a-z0-9])([A-Z])", r"\1_\2", s.strip())
    s = re.sub(r"[\s\-]+", "_", s)
    return s.lower()


def count_substring(s: str, sub: str) -> int:
    """Non-overlapping occurrence count (stringFunctions.scala:35-44)."""
    return s.count(sub) if sub else 0


def is_number(s: str) -> bool:
    """Numeric-literal test for SQL quoting decisions
    (stringFunctions.scala:46-53)."""
    try:
        float(s)
        return True
    except (TypeError, ValueError):
        return False
