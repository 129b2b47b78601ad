"""Property-based tests (hypothesis) for driver-side pure functions —
a test dimension the reference lacked entirely (SURVEY.md §5)."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from featurestore_spark.functions.strings import (
    camelize,
    count_substring,
    is_number,
    underscore,
)
from featurestore_spark.functions.templating import template
from featurestore_spark.inference.sniffer import get_type, sniff

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
safe_text = st.text(
    alphabet=st.characters(blacklist_characters="$", blacklist_categories=("Cs",)),
    max_size=80,
)


@given(safe_text, ident, st.text(max_size=20).filter(lambda s: "$" not in s))
def test_template_substitutes_all_known_vars(prefix, name, value):
    out = template(f"{prefix}${name}", {name: value})
    assert out == f"{prefix}{value}"


@given(safe_text)
def test_template_no_vars_is_identity(text):
    assert template(text, {"x": "y"}) == text


@given(ident)
def test_template_unknown_passthrough_and_escape(name):
    assert template(f"${name}", {}) == f"${name}"
    assert template(f"$${name}", {name: "v"}) == f"$${name}"


@given(st.text(alphabet="abcXYZ_- ", min_size=1, max_size=30))
def test_underscore_idempotent_and_lower(s):
    once = underscore(s)
    assert once == underscore(once)  # idempotent
    assert once == once.lower()


@given(st.from_regex(r"[a-z]{2,8}(_[a-z]{2,8})*", fullmatch=True))
def test_camelize_underscore_roundtrip(snake):
    # single-letter segments ("a_a") are inherently ambiguous in
    # camelCase ("aAA") — the roundtrip holds on multi-char segments
    assert underscore(camelize(snake)) == snake


@given(st.text(max_size=50), st.text(min_size=1, max_size=5))
def test_count_substring_matches_str_count(s, sub):
    assert count_substring(s, sub) == s.count(sub)


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_is_number_accepts_float_reprs(x):
    assert is_number(repr(x))


@given(st.integers(-(10**15), 10**15))
def test_get_type_integers(n):
    assert get_type(str(n)) == "bigint"


@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_get_type_floats_never_string(x):
    assert get_type(repr(float(x))) in ("bigint", "double")


@given(
    st.lists(
        st.tuples(
            st.integers(0, 10**6),
            st.floats(0, 10**6, allow_nan=False),
            st.sampled_from(["aa", "bb", "cc"]),
        ),
        min_size=2,
        max_size=20,
    )
)
@settings(max_examples=25)
def test_sniffer_csv_roundtrip(rows):
    data = "id,val,tag\n" + "\n".join(f"{a},{b},{c}" for a, b, c in rows) + "\n"
    md = sniff(data)
    assert md.delimiter == ","
    assert md.has_header
    assert md.column_names == ["id", "val", "tag"]
    assert md.column_types[0] == "bigint"
    assert md.column_types[1] in ("double", "bigint")
    assert md.column_types[2] == "string"
