"""Tokenizer parity: regex path == literal C++ byte-scan reimplementation,
and Spark UDF path == pure-SQL path == oracle."""

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparksearch.constants import SEPARATOR_CHARS, SEPARATOR_REGEX
from sparksearch.tokenize import tokenize_text, tokenize_text_literal


def test_separator_inventory():
    # exact char inventory of hw3/config.h:59 (deduplicated)
    assert " " in SEPARATOR_CHARS and "\\" in SEPARATOR_CHARS
    for ch in ":;,.\t\x0b\r\n\x0c[]{}()<>+-=*&^%$#@!~`'\"|\\/?":
        assert ch in SEPARATOR_CHARS, repr(ch)
    for ch in "·：“”":
        assert ch in SEPARATOR_CHARS
    assert len(set(SEPARATOR_CHARS)) == len(SEPARATOR_CHARS)


CASES = [
    "",
    "hello world",
    "if (x>0) { return x; }",
    "a..b,,c  d\te\nf",
    "no_separators_here_123",
    ":::leading and trailing:::",
    "under_score stays intact",
    "UPPER lower MiXeD",  # no lowercasing
    "running runs ran",  # no stemming
    'quotes "inside" \'single\' `back`',
    "tab\tvtab\x0bff\x0ccr\rnl\n",
    "int main(){return 0;}",
]


@pytest.mark.parametrize("text", CASES)
def test_regex_matches_literal(text):
    assert tokenize_text(text) == tokenize_text_literal(text)


ascii_alphabet = string.ascii_letters + string.digits + string.punctuation + " \t\r\n\x0b\x0c_"


@given(st.text(alphabet=ascii_alphabet, max_size=300))
@settings(max_examples=200, deadline=None)
def test_regex_matches_literal_property(text):
    assert tokenize_text(text) == tokenize_text_literal(text)


def test_no_case_folding_or_stemming():
    assert tokenize_text("Return return RETURN") == ["Return", "return", "RETURN"]


def test_regex_class_is_valid_python_java_re2():
    import re

    re.compile(SEPARATOR_REGEX)  # Python
    import duckdb

    # RE2 (DuckDB) accepts the same class
    out = duckdb.sql(
        f"select regexp_split_to_array('if (x>0) {{ return x; }}', '{SEPARATOR_REGEX.replace(chr(39), chr(39)*2)}')"
    ).fetchone()[0]
    assert [t for t in out if t] == ["if", "x", "0", "return", "x"]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(
        st.text(
            alphabet=st.characters(
                codec="utf-8", categories=("L", "N", "P", "S", "Z", "Cc")
            ),
            max_size=400,
        )
    )
    @settings(max_examples=300, deadline=None)
    def test_regex_tokenizer_equals_literal_scan_property(text):
        """Property: the regex tokenizer used in the Spark plans equals the
        literal char-scan reimplementation of hw2/DataLoader.cpp:27-70 on
        arbitrary unicode text (incl. control chars and the full separator
        set)."""
        from sparksearch.tokenize import tokenize_text, tokenize_text_literal

        assert tokenize_text(text) == tokenize_text_literal(text)

except ImportError:  # pragma: no cover - hypothesis is baked in per brief
    pass
