"""Property-based tests: the arrow fast path must agree with the pandas
reference implementation on arbitrary printable input, and the tokenizer
must round-trip arbitrary unicode text."""

import pandas as pd
from hypothesis import given, settings, strategies as st

from redeye_spark.functions import tokens as tok
from redeye_spark.functions.logparse import (
    FORMAT_COMBINED,
    FORMAT_COMMON,
    parse_lines,
    parse_lines_pandas,
)

# ASCII-printable lines (the parity domain: RE2's \s is ASCII-only by
# design — documented deviation for non-ASCII whitespace)
ascii_line = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E), max_size=200
)

# fragments that assemble into almost-valid log lines — worst case for
# regex edge behavior
fragment = st.sampled_from([
    "127.0.0.1", "-", "frank", "[10/Oct/2000:13:55:36 -0700]", "[-]", "[x]",
    '"GET / HTTP/1.0"', '"GET /a b"', '""', "200", "-1", "abc", "99999999999999999999",
    '"r"', '"-"', " ", "  ",
])
assembled = st.lists(fragment, min_size=0, max_size=12).map(" ".join)


def _frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    for c in a.columns:
        ga = a[c].astype("object").where(a[c].notna(), None)
        gb = b[c].astype("object").where(b[c].notna(), None)
        eq = (ga == gb) | (a[c].isna() & b[c].isna())
        assert eq.all(), (c, a[~eq].head(3), b[~eq].head(3))


@settings(max_examples=200, deadline=None)
@given(st.lists(ascii_line, min_size=1, max_size=20))
def test_engines_agree_on_random_ascii(lines):
    s = pd.Series(lines)
    for fmt in (FORMAT_COMMON, FORMAT_COMBINED):
        _frames_equal(parse_lines(s, fmt), parse_lines_pandas(s, fmt))


@settings(max_examples=200, deadline=None)
@given(st.lists(assembled, min_size=1, max_size=20))
def test_engines_agree_on_log_like_fragments(lines):
    s = pd.Series(lines)
    for fmt in (FORMAT_COMMON, FORMAT_COMBINED):
        _frames_equal(parse_lines(s, fmt), parse_lines_pandas(s, fmt))


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(max_size=100), min_size=1, max_size=20))
def test_tokenizer_roundtrip_any_unicode(lines):
    s = pd.Series(lines)
    toks = tok.tokenize(s)
    back = tok.detokenize(toks)
    assert list(back) == list(s)
    assert tok.tokens_equal(s, toks).all()


@settings(max_examples=100, deadline=None)
@given(st.lists(ascii_line, min_size=1, max_size=10))
def test_parse_never_loses_rows_and_message_is_trimmed(lines):
    s = pd.Series(lines)
    out = parse_lines(s, FORMAT_COMMON)
    assert len(out) == len(s)
    assert list(out["message"]) == [x.strip() for x in lines]
    # every row is either ok or classified
    bad = out["error_kind"].dropna()
    assert set(bad) <= {"ParseError", "TimestampParseError"}
