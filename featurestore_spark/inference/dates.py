"""Multi-format date parsing with move-to-front (I5).

Replicates common/parsing/DateParser.scala:11-100: a prioritized list
of 36 Joda-style patterns tried in order; on a hit the winning format
moves to the front, so a file whose dates share one format pays one
format-scan for the first value and O(1) after (the reference's exact
optimization). Patterns are kept in Joda/java.time syntax — the same
strings Spark's CSV reader accepts as `dateFormat`/`timestampFormat`
options — paired with their strptime equivalents for driver-side
parsing.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import NamedTuple

# (Joda/Spark pattern, strptime format) — order matters and matches
# DateParser.scala:13-49 (EU day-first before US month-first, long
# before short so greedy prefixes don't shadow).
_FORMATS: list[tuple[str, str]] = [
    ("yyyy-MM-dd'T'HH:mm:ss.SSSZ", "%Y-%m-%dT%H:%M:%S.%f%z"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSXXX", "%Y-%m-%dT%H:%M:%S.%f%z"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSSSSS", "%Y-%m-%dT%H:%M:%S.%f"),
    ("yyyy-MM-dd HH:mm:ss.SSSZ", "%Y-%m-%d %H:%M:%S.%f%z"),
    ("yyyy-MM-dd HH:mm:ss.SSSXXX", "%Y-%m-%d %H:%M:%S.%f%z"),
    ("yyyy-MM-dd HH:mm:ss.SSSSSS", "%Y-%m-%d %H:%M:%S.%f"),
    ("yyyyMMdd HH:mm:ss", "%Y%m%d %H:%M:%S"),
    ("EEE, MMM d, ''yy", "%a, %b %d, '%y"),
    ("EEE, MMM d, yyyy", "%a, %b %d, %Y"),
    ("yyyy.MM.dd", "%Y.%m.%d"),
    ("yyyy-MM-dd", "%Y-%m-%d"),
    ("yyyy/MM/dd", "%Y/%m/%d"),
    ("dd.MM.yyyy", "%d.%m.%Y"),
    ("dd-MM-yyyy", "%d-%m-%Y"),
    ("dd/MM/yyyy", "%d/%m/%Y"),
    ("MM.dd.yyyy", "%m.%d.%Y"),
    ("MM-dd-yyyy", "%m-%d-%Y"),
    ("MM/dd/yyyy", "%m/%d/%Y"),
    ("dd.MM.yy", "%d.%m.%y"),
    ("dd-MM-yy", "%d-%m-%y"),
    ("dd/MM/yy", "%d/%m/%y"),
    ("MM.dd.yy", "%m.%d.%y"),
    ("MM-dd-yy", "%m-%d-%y"),
    ("MM/dd/yy", "%m/%d/%y"),
    ("dd/MMM/yy", "%d/%b/%y"),
    ("yyyy-MM-dd'T'HH", "%Y-%m-%dT%H"),
    ("yyyy-MM-dd HH", "%Y-%m-%d %H"),
    ("yyyy-MM-dd'T'HH:mm", "%Y-%m-%dT%H:%M"),
    ("yyyy-MM-dd HH:mm", "%Y-%m-%d %H:%M"),
    ("yyyy-MM-dd'T'HH:mm:ss", "%Y-%m-%dT%H:%M:%S"),
    ("yyyy-MM-dd HH:mm:ss", "%Y-%m-%d %H:%M:%S"),
    ("yyyy-MM-dd'T'HH:mm:ss.SSS", "%Y-%m-%dT%H:%M:%S.%f"),
    ("yyyy-MM-dd HH:mm:ss.SSS", "%Y-%m-%d %H:%M:%S.%f"),
    ("yyyy-MM-dd'T'HH:mm:ss Z", "%Y-%m-%dT%H:%M:%S %z"),
    ("yyyy-MM-dd HH:mm:ss Z", "%Y-%m-%d %H:%M:%S %z"),
]

# quick reject: every supported format has a digit and a separator
# somewhere; avoids 36 strptime exception rounds for plain words
_PLAUSIBLE = re.compile(r"\d.*[-/:,.' ]|[-/:,.' ].*\d")

# strptime is lenient where java.time is strict: %f takes 1-6 fraction
# digits ('.SSSSSS' would "match" '.123' and then null out under
# Spark's parser), and %z takes '+01:00', '+0100', and 'Z' alike
# (Joda 'Z' = RFC822 '+0100' only; 'XXX' = ISO '+01:00'/'Z'). After a
# hit, conform the reported Joda pattern to the value's actual shape
# so spark_read_options() round-trips.
_FRACTION = re.compile(r"\.(\d+)(?=$|[+\- ]|Z$)")
_OFFSET = re.compile(r"(Z|[+-]\d{2}:?\d{2})$")
_S_RUN = re.compile(r"S+")


def _conform(pattern: str, value: str) -> str:
    if "S" in pattern:
        m = _FRACTION.search(value)
        if m:  # exact-width fraction: java.time 'S' = one digit each
            pattern = _S_RUN.sub("S" * len(m.group(1)), pattern, count=1)
    if pattern.endswith(("Z", "XXX")) and "'" not in pattern[-4:]:
        m = _OFFSET.search(value)
        if m:
            iso = m.group(1) == "Z" or ":" in m.group(1)
            joda = "XXX" if iso else "Z"
            pattern = (
                pattern[: -3 if pattern.endswith("XXX") else -1] + joda
            )
    return pattern


class ParsedDate(NamedTuple):
    value: datetime
    pattern: str  # Joda/Spark pattern that matched

    @property
    def has_time(self) -> bool:
        return "H" in self.pattern


class DateParser:
    """Stateful multi-format parser; successful formats move to the
    front of the try-order (DateParser.scala:62-85)."""

    def __init__(self, formats: list[tuple[str, str]] | None = None):
        self.formats = list(formats if formats is not None else _FORMATS)

    def parse(self, value) -> ParsedDate | None:
        if value is None:
            return None
        x = str(value).strip()
        if not x or not _PLAUSIBLE.search(x):
            return None
        for i, (pattern, pyfmt) in enumerate(self.formats):
            try:
                dt = datetime.strptime(x, pyfmt)
            except ValueError:
                continue
            if i:  # move-to-front
                self.formats.insert(0, self.formats.pop(i))
            return ParsedDate(dt, _conform(pattern, x))
        return None
