"""Date/time parsing helpers (F4–F6): Java SimpleDateFormat-style
patterns → Spark built-ins (common/utility/dateFunctions.scala:22-65).

All pure Column expressions — the reference registered row-at-a-time
UDFs for these (common/utility/udfs.scala:12-22); every one maps to a
built-in here (F11: zero Python UDFs on the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Java SimpleDateFormat → Spark datetime pattern differences that
# matter in practice (most tokens coincide).
_JAVA_TO_SPARK = {
    "yyyy": "yyyy",
    "MM": "MM",
    "dd": "dd",
    "HH": "HH",
    "mm": "mm",
    "ss": "ss",
    "SSS": "SSS",
}


def convert_string_to_date(col: str | Column, fmt: str = "yyyy-MM-dd") -> Column:
    """F4 (dateFunctions.scala:22-25). try_to_date: malformed → null
    (ANSI-safe), matching the reference's parse-or-fail-row semantics."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)).cast("date")


def convert_string_to_timestamp(col: str | Column, fmt: str = "yyyy-MM-dd HH:mm:ss") -> Column:
    """F6: parse → timestamp (epoch-millis view via unix_millis)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt))


def format_date_string(col: str | Column, in_fmt: str = "dd/MM/yyyy") -> Column:
    """F5: reformat to canonical yyyy-MM-dd (dateFunctions.scala:34-43)."""
    return F.date_format(convert_string_to_timestamp(col, in_fmt), "yyyy-MM-dd")


def format_datetime_string(col: str | Column, in_fmt: str = "dd/MM/yyyy HH:mm:ss") -> Column:
    """F5: reformat to canonical yyyy-MM-dd HH:mm:ss."""
    return F.date_format(convert_string_to_timestamp(col, in_fmt), "yyyy-MM-dd HH:mm:ss")
