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


# -- byte-format walker fuzz (VERDICT r10 #8) ---------------------------------
#
# The GIF/MP4/header walkers are the most branch-dense byte code in
# the tree and previously carried fixture-roundtrip evidence only.
# Each fuzz builds a RANDOMIZED payload with an independent test-local
# byte generator (tracking ground-truth offsets as it writes), so any
# walker drift — extension skip, color-table sizing, sub-block walk,
# stts/stsc run expansion, chunk-offset math — trips on inputs the
# fixed fixtures never produce.

import struct as _struct


def _gen_gif(frames_spec, global_ct_bits):
    """Test-local randomized GIF writer: returns (payload, expected
    [(offset, left, top, w, h)]) — offsets tracked while writing."""
    out = bytearray(b"GIF89a")
    packed = 0x80 | global_ct_bits if global_ct_bits is not None else 0
    out += _struct.pack("<HH", 40, 30) + bytes([packed, 0, 0])
    if global_ct_bits is not None:
        out += bytes(3 * (2 << global_ct_bits))
    expected = []
    for exts, (left, top, w, h), local_bits, subs in frames_spec:
        for label, blocks in exts:
            out += bytes([0x21, label])
            for blen in blocks:
                out += bytes([blen]) + bytes(blen)
            out += b"\x00"
        expected.append((len(out), left, top, w, h))
        out += b"\x2c" + _struct.pack("<HHHH", left, top, w, h)
        out += bytes([0x80 | local_bits if local_bits is not None else 0])
        if local_bits is not None:
            out += bytes(3 * (2 << local_bits))
        out += bytes([3])  # LZW min code size
        for blen in subs:
            out += bytes([blen]) + bytes(blen)
        out += b"\x00"
    out += b"\x3b"
    return bytes(out), expected


_gif_exts = st.lists(
    st.tuples(
        st.sampled_from([0xF9, 0xFE, 0x01, 0xFF]),
        st.lists(st.integers(1, 12), min_size=0, max_size=3),
    ),
    min_size=0,
    max_size=2,
)
_gif_frame = st.tuples(
    _gif_exts,
    st.tuples(
        st.integers(0, 300), st.integers(0, 300),
        st.integers(1, 500), st.integers(1, 500),
    ),
    st.none() | st.integers(0, 3),           # local color table bits
    st.lists(st.integers(1, 20), min_size=1, max_size=4),  # LZW subs
)


@settings(max_examples=60)
@given(
    frames=st.lists(_gif_frame, min_size=0, max_size=5),
    gct=st.none() | st.integers(0, 3),
    cut=st.integers(0, 100),
)
def test_gif_walker_fuzz_roundtrip(frames, gct, cut):
    from featurestore_spark.operators.multimodal import parse_gif_frames

    payload, expected = _gen_gif(frames, gct)
    assert parse_gif_frames(payload) == expected
    assert parse_gif_frames(payload, max_frames=1) == expected[:1]
    # truncation never raises and returns a PREFIX of the true frames
    # (a frame only counts once its descriptor bytes are intact)
    t = payload[: max(13, len(payload) - cut)]
    got = parse_gif_frames(t)
    assert got is not None and got == expected[: len(got)]


@settings(max_examples=60)
@given(
    samples=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 10)),
        min_size=0,
        max_size=8,
    ),
    chunk_seed=st.integers(1, 4),
    co64=st.booleans(),
    timescale=st.integers(1, 10**6),
    cut=st.integers(0, 60),
)
def test_mp4_walker_fuzz_roundtrip(samples, chunk_seed, co64, timescale, cut):
    from featurestore_spark.operators.multimodal import (
        build_mp4_fixture,
        parse_mp4_frames,
    )

    # random chunking that exactly covers the samples
    chunk_lens, left = [], len(samples)
    while left > 0:
        take = min(left, 1 + (chunk_seed + len(chunk_lens)) % 3)
        chunk_lens.append(take)
        left -= take
    payload = build_mp4_fixture(
        timescale, samples, chunk_lens=chunk_lens or None, co64=co64
    )
    got = parse_mp4_frames(payload)
    offs, dts, acc, t = [], [], 24, 0
    for s, d in samples:
        offs.append(acc)
        dts.append(t)
        acc += s
        t += d
    want = [
        (0, i, offs[i], samples[i][0], dts[i], timescale)
        for i in range(len(samples))
    ]
    assert got == want
    assert parse_mp4_frames(payload, max_frames=2) == want[:2]
    # truncation: never raises, yields a prefix (possibly [])
    tr = parse_mp4_frames(payload[: max(12, len(payload) - cut)])
    assert tr is not None and tr == want[: len(tr)]


@settings(max_examples=60)
@given(
    fmt=st.sampled_from(["png", "jpeg", "gif"]),
    w=st.integers(1, 65535),
    h=st.integers(1, 65535),
    ch=st.integers(1, 4),
    junk=st.binary(max_size=24),
)
def test_image_header_fuzz_roundtrip(fmt, w, h, ch, junk):
    from featurestore_spark.operators.multimodal import (
        build_image,
        parse_image_header,
    )

    if fmt == "jpeg" and ch == 2:
        ch = 3  # 2-channel JPEG is not a real encoding
    payload = build_image(fmt, w, h, ch if fmt != "gif" else 3)
    got = parse_image_header(payload)
    want_ch = {"png": ch, "jpeg": ch, "gif": 3}[fmt]
    assert got == (fmt, w, h, want_ch)
    # a non-magic prefix is never a valid header (nulls, not raises);
    # truncation yields the null tuple or the full parse (GIF/PNG
    # headers live entirely in the first bytes)
    none4 = (None, None, None, None)
    assert parse_image_header(b"\x00" + junk + payload) == none4
    assert parse_image_header(payload[: len(payload) // 2]) in (none4, got)


# -- WAV/RIFF chunk walker fuzz ------------------------------------------------


def _gen_wav(pre, ch, rate, bits, n_frames, post, with_data):
    """Test-local randomized RIFF writer: returns (payload, expected
    parse_wav_header tuple) — offsets tracked while writing. `pre`/
    `post` are (4-byte id, body length) junk chunks around fmt/data;
    odd bodies exercise the even-offset padding."""
    balign = ch * (bits // 8)
    body = bytearray()

    def chunk(cid, cbody):
        body.extend(cid + _struct.pack("<I", len(cbody)) + cbody)
        if len(cbody) & 1:
            body.append(0)

    for cid, blen in pre:
        chunk(cid, bytes(blen))
    chunk(b"fmt ", _struct.pack(
        "<HHIIHH", 1, ch, rate, rate * balign, balign, bits))
    data_off = data_size = None
    if with_data:
        data_off = 12 + len(body) + 8
        data_size = n_frames * balign
        chunk(b"data", bytes(data_size))
    for cid, blen in post:
        chunk(cid, bytes(blen))
    payload = b"RIFF" + _struct.pack("<I", 4 + len(body)) + b"WAVE" + bytes(body)
    return payload, (ch, rate, bits, balign, data_off, data_size)


_wav_junk = st.lists(
    st.tuples(
        st.sampled_from([b"LIST", b"fact", b"cue ", b"junk"]),
        st.integers(0, 9),
    ),
    min_size=0,
    max_size=3,
)


@settings(max_examples=60)
@given(
    pre=_wav_junk,
    ch=st.integers(1, 8),
    rate=st.sampled_from([8000, 16000, 22050, 44100, 48000]),
    bits=st.sampled_from([8, 16, 24, 32]),
    n_frames=st.integers(0, 500),
    post=_wav_junk,
    with_data=st.booleans(),
    cut=st.integers(0, 64),
)
def test_wav_walker_fuzz_roundtrip(
    pre, ch, rate, bits, n_frames, post, with_data, cut
):
    from featurestore_spark.operators.multimodal import parse_wav_header

    payload, expected = _gen_wav(pre, ch, rate, bits, n_frames, post, with_data)
    assert parse_wav_header(payload) == expected
    # truncation: never an exception; either None (fmt gone / not WAV)
    # or the fmt tuple with data fields None-or-intact
    t = payload[: len(payload) - cut] if cut else payload
    got = parse_wav_header(t)
    if got is not None:
        assert got[:4] == expected[:4]
    # non-RIFF prefixes are rejected, not walked
    assert parse_wav_header(b"RIFX" + payload[4:]) is None
    assert parse_wav_header(payload[:8]) is None


# -- WARC record walker fuzz ----------------------------------------------------


def _gen_warc(records, extra_headers, junk_tail):
    """Test-local randomized WARC writer: returns (payload, expected
    [(offset, type, uri, content_offset, content_length)]) with
    offsets tracked while writing. Payloads may contain CRLFs and
    header-like bytes; extra headers shuffle the field order."""
    out = bytearray()
    expected = []
    for wtype, uri, content in records:
        off = len(out)
        hdr = f"WARC/1.0\r\n"
        fields = [
            ("WARC-Type", wtype),
            ("WARC-Target-URI", uri),
            ("Content-Length", str(len(content))),
        ] + [(f"X-H{i}", v) for i, v in enumerate(extra_headers)]
        for k, v in fields:
            hdr += f"{k}: {v}\r\n"
        hdr += "\r\n"
        out += hdr.encode()
        co = len(out)
        out += bytes(content) + b"\r\n\r\n"
        expected.append((off, wtype, uri, co, len(content)))
    out += junk_tail
    return bytes(out), expected


_warc_content = st.binary(min_size=0, max_size=40) | st.sampled_from(
    [b"WARC/1.0\r\nWARC-Type: fake\r\n\r\n", b"\r\n\r\n\r\n", b"x" * 30]
)
_warc_rec = st.tuples(
    st.sampled_from(["warcinfo", "response", "conversion", "request"]),
    st.sampled_from(["-", "http://a.com/x", "https://b.org/p?q=1"]),
    _warc_content,
)


@settings(max_examples=60)
@given(
    records=st.lists(_warc_rec, min_size=0, max_size=5),
    extra=st.lists(st.sampled_from(["v", "a b", ""]), max_size=2),
    junk=st.sampled_from([b"", b"\r\n", b"garbage"]),
    cut=st.integers(0, 80),
)
def test_warc_walker_fuzz_roundtrip(records, extra, junk, cut):
    from featurestore_spark.operators.multimodal import parse_warc_records

    payload, expected = _gen_warc(records, extra, junk)
    got = parse_warc_records(payload)
    if not records:
        assert got is None  # nothing starts with WARC/
    else:
        assert got == expected, (payload, got, expected)
        # truncation never raises and yields a prefix of the records
        t = payload[: len(payload) - cut] if cut else payload
        gt = parse_warc_records(t)
        if gt is not None:
            assert gt == expected[: len(gt)]
