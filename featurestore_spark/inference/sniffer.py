"""Raw-file metadata inference (I1–I6): delimiter / quote / header /
line-ending / column-type sniffing for CSV-ish files.

Covers the capability of common/inference/FileMetadataExtractor.scala:
31-428 (delimiter via character-frequency consistency, quote+delimiter
via quoted-field patterns, header via per-column type voting against
the first row, type detection incl. multi-format dates and a boolean
lexicon). Driver-side pure Python — the result feeds explicit
`spark.read.csv(...)` options and a StructType, so executors never
re-infer (at 100 TB, schema inference on read would be a full extra
scan; sniffing a bounded head sample costs nothing).
"""

from __future__ import annotations

import re
from collections import Counter
from dataclasses import dataclass, field

from featurestore_spark.inference.dates import DateParser

_CANDIDATE_DELIMS = [",", "\t", ";", "|", ":", " "]
_BOOLEANS = {"true", "false", "yes", "no", "t", "f", "y", "n", "0", "1"}


@dataclass
class FileMetadata:
    """Sniffed file properties (common/inference/FileMetadata.scala:44-100)."""

    delimiter: str = ","
    quote_char: str | None = None
    has_header: bool = False
    line_ending: str = "\n"
    column_types: list[str] = field(default_factory=list)
    column_names: list[str] = field(default_factory=list)
    # winning Joda/java.time patterns, fed straight to spark.read.csv
    date_format: str | None = None
    timestamp_format: str | None = None

    def spark_read_options(self) -> dict[str, str]:
        opts = {"sep": self.delimiter, "header": str(self.has_header).lower()}
        if self.quote_char:
            opts["quote"] = self.quote_char
        if self.date_format:
            opts["dateFormat"] = self.date_format
        if self.timestamp_format:
            opts["timestampFormat"] = self.timestamp_format
        return opts

    def spark_schema_ddl(self) -> str:
        names = self.column_names or [f"_c{i}" for i in range(len(self.column_types))]
        return ", ".join(
            f"`{n}` {t}" for n, t in zip(names, self.column_types)
        )


def detect_line_ending(data: str) -> str:
    """I6: pick the terminator splitting into most-consistent lines."""
    counts = {"\r\n": data.count("\r\n")}
    counts["\n"] = data.count("\n") - counts["\r\n"]
    counts["\r"] = data.count("\r") - counts["\r\n"]
    best = max(counts, key=counts.get)
    return best if counts[best] > 0 else "\n"


def guess_quote_and_delimiter(data: str) -> tuple[str | None, str | None]:
    """I2: look for delimiter-adjacent quoted fields."""
    pattern = re.compile(
        r"""(?P<delim>[^\w"'\n]) ?(?P<quote>["']).*?(?P=quote)(?P=delim)""",
        re.S,
    )
    matches = pattern.findall(data)
    if not matches:
        # quoted field at line start/end
        edge = re.findall(r"""(?:^|\n)(?P<quote>["']).*?(?P=quote)(?P<delim>[^\w"'\n])""", data)
        if edge:
            quotes = Counter(q for q, _ in edge)
            delims = Counter(d for _, d in edge)
            return quotes.most_common(1)[0][0], delims.most_common(1)[0][0]
        return None, None
    delims = Counter(d for d, _ in matches)
    quotes = Counter(q for _, q in matches)
    return quotes.most_common(1)[0][0], delims.most_common(1)[0][0]


def guess_delimiter(lines: list[str], consistency: float = 0.9) -> str:
    """I3: the candidate whose per-line occurrence count is most
    consistent (mode frequency ≥ `consistency` of lines), preferring
    higher counts on ties."""
    best, best_score = ",", -1.0
    for cand in _CANDIDATE_DELIMS:
        counts = [ln.count(cand) for ln in lines if ln]
        if not counts or max(counts) == 0:
            continue
        mode, freq = Counter(counts).most_common(1)[0]
        if mode == 0:
            continue
        score = freq / len(counts) + mode * 1e-6  # consistency, then arity
        if score > best_score and freq / len(counts) >= consistency * 0.5:
            best, best_score = cand, score
    return best


def get_type_and_format(
    value: str, parser: DateParser | None = None
) -> tuple[str, str | None]:
    """I5: Integer/Double/Date/Timestamp/Boolean/String detection.

    Dates go through the 36-format move-to-front DateParser
    (DateParser.scala:11-100) — pass one `parser` instance per file so
    the move-to-front state pays off. Returns (spark type, matched
    Joda pattern or None). Pure digit runs stay numeric (a bare
    `20010704` is more often an id than a date).
    """
    v = value.strip()
    if v == "":
        return "string", None
    if re.fullmatch(r"[+-]?\d+", v):
        return "bigint", None
    if re.fullmatch(r"[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?", v):
        return "double", None
    parsed = (parser or DateParser()).parse(v)
    if parsed is not None:
        return ("timestamp" if parsed.has_time else "date"), parsed.pattern
    if v.lower() in _BOOLEANS - {"0", "1"}:
        return "boolean", None
    return "string", None


def get_type(value: str, parser: DateParser | None = None) -> str:
    return get_type_and_format(value, parser)[0]


def _merge_types(types: set[str]) -> str:
    types = set(types)
    if not types:
        return "string"
    if types <= {"bigint"}:
        return "bigint"
    if types <= {"bigint", "double"}:
        return "double"
    if len(types) == 1:
        return next(iter(types))
    return "string"


def has_header(rows: list[list[str]]) -> bool:
    """I4: per-column type voting — header likely when first-row types
    disagree with the body's (e.g. strings over numeric columns)."""
    if len(rows) < 2:
        return False
    first, body = rows[0], rows[1:]
    votes = 0
    for i, cell in enumerate(first):
        body_types = {get_type(r[i]) for r in body if i < len(r)}
        body_type = _merge_types(body_types)
        first_type = get_type(cell)
        if body_type != "string" and first_type == "string":
            votes += 1
        elif body_type == "string" and first_type == "string":
            # lengths heuristic: header cells rarely repeat in body
            votes += 0
    return votes >= max(1, len(first) // 3)


def sniff(data: str) -> FileMetadata:
    """I1: full sniff over a head sample of the file."""
    ending = detect_line_ending(data)
    lines = [ln for ln in data.split(ending) if ln][:100]
    quote, delim = guess_quote_and_delimiter(data)
    if delim is None:
        delim = guess_delimiter(lines)
    rows = [ln.split(delim) for ln in lines]
    header = has_header(rows)
    body = rows[1:] if header else rows
    n_cols = max((len(r) for r in body), default=0)
    parser = DateParser()  # one per file: move-to-front pays off
    col_types: list[str] = []
    col_fmts: list[set[str]] = []
    for i in range(n_cols):
        types, fmts = set(), set()
        for r in body:
            if i < len(r) and r[i].strip() != "":
                t, f = get_type_and_format(r[i], parser)
                types.add(t)
                if f:
                    fmts.add(f)
        col_types.append(_merge_types(types))
        col_fmts.append(fmts)
    # Spark takes ONE dateFormat + ONE timestampFormat per read: the
    # first consistent (single-format) date/timestamp column sets it;
    # columns with a conflicting or mixed format demote to string so
    # the subsequent read can't silently mis-parse them.
    date_format = timestamp_format = None
    for i, t in enumerate(col_types):
        if t not in ("date", "timestamp") :
            continue
        if len(col_fmts[i]) != 1:
            col_types[i] = "string"
            continue
        fmt = next(iter(col_fmts[i]))
        if t == "date":
            if date_format is None:
                date_format = fmt
            elif fmt != date_format:
                col_types[i] = "string"
        else:
            if timestamp_format is None:
                timestamp_format = fmt
            elif fmt != timestamp_format:
                col_types[i] = "string"
    names = (
        [c.strip().strip('"').strip("'") for c in rows[0]]
        if header
        else [f"_c{i}" for i in range(n_cols)]
    )
    return FileMetadata(
        delimiter=delim,
        quote_char=quote,
        has_header=header,
        line_ending=ending,
        column_types=col_types,
        column_names=names,
        date_format=date_format,
        timestamp_format=timestamp_format,
    )


def sniff_file(path: str, max_bytes: int = 64 * 1024, encoding: str = "utf-8") -> FileMetadata:
    """S20 + I1: sniff the first `max_bytes` of a file
    (common/utility/fileFunctions.scala:13-20)."""
    with open(path, "rb") as f:
        raw = f.read(max_bytes)
    return sniff(raw.decode(encoding, errors="replace"))


def read_ebcdic_lines(path: str, codec: str = "cp500") -> list[str]:
    """S15: decode an EBCDIC (IBM-500) text file to lines
    (common/utility/encodingFunctions.scala:33-58)."""
    with open(path, "rb") as f:
        text = f.read().decode(codec)
    return text.splitlines()
