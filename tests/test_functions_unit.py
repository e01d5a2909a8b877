"""Unit tests for the scalar-function layer (pure Python, no Spark).

Golden expectations derive from the reference's behaviour:
- pct-str URIReserved encoding (``/root/reference/src/function/uri_encode.rs``)
- iri_string UriSpec validation (``/root/reference/src/function/iri.rs``)
- template parser cases (``/root/reference/src/function/template_parser.rs:100-185``)
"""

import pandas as pd
import pytest

from mopper_spark.functions import (
    TemplateParseError,
    is_valid_uri,
    is_valid_uri_reference,
    iri_finalize,
    parse_template,
    pct_encode,
    pct_encode_series,
    remove_join_alias_prefix,
)


class TestPctEncode:
    def test_space(self):
        # golden: RMLTC0008b output.nq line 1
        assert pct_encode("Venus Williams") == "Venus%20Williams"

    def test_reserved_set(self):
        assert pct_encode("a/b?c#d[e]f@g") == "a%2Fb%3Fc%23d%5Be%5Df%40g"
        assert pct_encode("!$&'()*+,;=:") == "%21%24%26%27%28%29%2A%2B%2C%3B%3D%3A"
        assert pct_encode("%") == "%25"

    def test_kept_raw(self):
        # ASCII-graphic chars outside the reserved set stay raw (pct-str parity)
        assert pct_encode('"<>\\^_`{|}~-.') == '"<>\\^_`{|}~-.'
        assert pct_encode("AZaz09") == "AZaz09"

    def test_non_ascii_utf8_bytes(self):
        assert pct_encode("René") == "Ren%C3%A9"
        assert pct_encode("日") == "%E6%97%A5"

    def test_controls_and_newline(self):
        assert pct_encode("a\nb\tc") == "a%0Ab%09c"

    def test_series(self):
        s = pd.Series(["plain", "a b", None])
        out = pct_encode_series(s)
        assert list(out) == ["plain", "a%20b", ""]


class TestUriValidation:
    @pytest.mark.parametrize(
        "uri",
        [
            "http://example.com/Student/10/Venus%20Williams",
            "http://example.com/Tennis",
            "urn:isbn:0451450523",
            "http://a/b?q=1&r=2#frag",
            "http://[2001:db8::1]:8080/p",
            "http://127.0.0.1/x",
            "file:///tmp/x.txt",
            "http://example.com",
        ],
    )
    def test_valid_absolute(self, uri):
        assert is_valid_uri(uri)

    @pytest.mark.parametrize(
        "bad",
        [
            "http://example.com/a b",      # raw space
            "http://example.com/{x}",      # raw braces
            "http://example.com/a\\b",     # raw backslash
            "http://example.com/a%2",      # truncated pct
            "http://example.com/a%GG",     # bad hex
            "not a uri at all",
            "http://exa mple.com/",
            "1http://example.com/",        # scheme can't start with digit
        ],
    )
    def test_invalid(self, bad):
        assert not is_valid_uri(bad)
        # these all contain chars/sequences invalid even as references
        assert not is_valid_uri_reference(bad) or ":" not in bad

    def test_relative_reference_ok(self):
        assert is_valid_uri_reference("Student/10")
        assert is_valid_uri_reference("")
        assert not is_valid_uri("Student/10")

    def test_finalize_matches_reference_semantics(self):
        s = pd.Series(
            [
                "http://example.com/Sport",  # absolute → kept
                "Student/10",                # relative → base prepended
                "bad value",                 # base + raw space → INVALID
            ]
        )
        out = iri_finalize(s, "http://example.com/base/")
        assert list(out) == [
            "http://example.com/Sport",
            "http://example.com/base/Student/10",
            "INVALID",
        ]

    def test_finalize_no_base(self):
        out = iri_finalize(pd.Series(["rel/path", "a b"]), None)
        assert list(out) == ["rel/path", "INVALID"]


class TestTemplateParser:
    # the ten inline cases from template_parser.rs:100-185
    def test_normal(self):
        assert parse_template("Hello {world}!") == [
            (False, "Hello "),
            (True, "world"),
            (False, "!"),
        ]

    def test_no_var(self):
        assert parse_template("Hello world!") == [(False, "Hello world!")]

    def test_two_vars(self):
        assert parse_template("{Hello}{world}!") == [
            (True, "Hello"),
            (True, "world"),
            (False, "!"),
        ]

    def test_var_at_end(self):
        assert parse_template("{a}") == [(True, "a")]

    def test_escapes(self):
        assert parse_template("Hello \\{world\\}!") == [(False, "Hello {world}!")]
        assert parse_template("a\\\\b") == [(False, "a\\b")]

    def test_nested_errors(self):
        with pytest.raises(TemplateParseError):
            parse_template("Hello {{world}}!")

    def test_bad_escape(self):
        with pytest.raises(TemplateParseError):
            parse_template("Hello w\\orld!")

    def test_unclosed(self):
        with pytest.raises(TemplateParseError):
            parse_template("Hello {world!")

    def test_stray_close(self):
        with pytest.raises(TemplateParseError):
            parse_template("Hello world}!")

    def test_trailing_escape(self):
        with pytest.raises(TemplateParseError):
            parse_template("Hello \\")

    def test_empty_var_dropped(self):
        assert parse_template("Hello {}!") == [(False, "Hello "), (False, "!")]

    def test_empty_template(self):
        assert parse_template("") == []

    def test_alias_stripping(self):
        assert parse_template("x{join_0_Sport}y", "join_0") == [
            (False, "x"),
            (True, "Sport"),
            (False, "y"),
        ]
        # exact reference quirk: startswith check, strip len(alias)+1
        assert remove_join_alias_prefix("join_0_Sport", "join_0") == "Sport"
        assert remove_join_alias_prefix("Sport", "join_0") == "Sport"
        assert remove_join_alias_prefix("join_0x_Sport", "join_0") == "_Sport"
