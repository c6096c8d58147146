"""Golden transform fixtures ported from the reference:
/root/reference/internal/pipeline/transform_test.go:9-120 and
/root/reference/internal/scraper/enhanced_extractor_test.go:440-700
(TestAdvancedTransformations). Same inputs, same expected outputs.
"""

import pytest

from datascrapexter_spark.functions.transforms import (
    TransformError,
    apply_chain,
    apply_transform,
    compile_chain,
)

GOLDEN_SINGLE = [
    # (rule, input, expected) — transform_test.go:18-110
    ({"type": "trim"}, "  hello world  ", "hello world"),
    ({"type": "normalize_spaces"}, "hello    world\n\ttest", "hello world test"),
    ({"type": "lowercase"}, "HELLO World", "hello world"),
    ({"type": "uppercase"}, "hello world", "HELLO WORLD"),
    ({"type": "remove_html"}, "This is <b>bold</b> text", "This is bold text"),
    ({"type": "extract_numbers"}, "Price: $123.45", "123.45"),
    ({"type": "parse_int"}, "123", "123"),
    ({"type": "parse_float"}, "123.45", "123.45"),
    ({"type": "regex", "pattern": r"\$([0-9,]+\.\d*)", "replacement": "$1"},
     "$1,299.99", "1,299.99"),
    ({"type": "prefix", "params": {"value": "https://"}},
     "example.com", "https://example.com"),
    ({"type": "suffix", "params": {"value": ".html"}}, "page", "page.html"),
    ({"type": "replace", "pattern": "old", "replacement": "new"},
     "old text", "new text"),
]

GOLDEN_CHAINS = [
    # enhanced_extractor_test.go:449-700 (TestAdvancedTransformations)
    ([{"type": "split", "pattern": ",", "params": {"index": 1}}],
     "apple,banana,orange", "banana"),
    ([{"type": "substring", "params": {"start": 6, "end": 11}}],
     "Hello World", "World"),
    ([{"type": "truncate", "params": {"length": 20, "suffix": "..."}}],
     "This is a very long text that needs to be truncated",
     "This is a very lo..."),
    ([{"type": "title_case"}], "hello world from go", "Hello World From Go"),
    ([{"type": "format_currency", "params": {"symbol": "$"}}],
     "1234.56", "$1234.56"),
    ([{"type": "format_currency", "params": {"symbol": "€"}}],
     "€1,234.56 EUR", "€1234.56"),
    ([{"type": "format_currency", "params": {"symbol": "$"}}],
     "1 234.56 USD", "$1234.56"),
    ([{"type": "regex", "pattern": ",", "replacement": "."},
      {"type": "format_currency", "params": {"symbol": "€"}}],
     "€ 1 500,75 EUR", "€1500.75"),
    ([{"type": "extract_domain"}],
     "https://www.example.com/path/to/page?query=1", "www.example.com"),
    ([{"type": "extract_filename"}],
     "https://example.com/images/photo.jpg", "photo.jpg"),
    ([{"type": "capitalize_words"}], "hello WORLD from GO",
     "Hello World From Go"),
    ([{"type": "remove_duplicates", "params": {"delimiter": ","}}],
     "apple,banana,apple,orange,banana", "apple,banana,orange"),
    ([{"type": "pad_left", "params": {"length": 6, "char": "0"}}],
     "123", "000123"),
    ([{"type": "pad_right", "params": {"length": 6, "char": "x"}}],
     "abc", "abcxxx"),
    ([{"type": "reverse"}], "hello", "olleh"),
    ([{"type": "remove_commas"}], "1,234,567", "1234567"),
]


@pytest.mark.parametrize("rule,inp,expected", GOLDEN_SINGLE)
def test_single_transform(rule, inp, expected):
    assert apply_transform(rule, inp) == expected


@pytest.mark.parametrize("rules,inp,expected", GOLDEN_CHAINS)
def test_chain_transform(rules, inp, expected):
    assert apply_chain(rules, inp) == expected


def test_invalid_type_errors():
    with pytest.raises((TransformError, ValueError)):
        apply_transform({"type": "invalid_type"}, "test")


def test_regex_without_pattern_errors():
    with pytest.raises(TransformError):
        apply_transform({"type": "regex"}, "test")


def test_parse_float_error():
    with pytest.raises(TransformError):
        apply_transform({"type": "parse_float"}, "not a number")


def test_parse_int_empty_returns_zero():
    assert apply_transform({"type": "parse_int"}, "abc") == "0"


def test_split_no_index_joins_with_comma():
    assert apply_chain([{"type": "split", "pattern": "-"}], "a-b-c") == "a,b,c"


def test_chain_error_aborts():
    rules = [{"type": "trim"}, {"type": "parse_float"}, {"type": "uppercase"}]
    with pytest.raises(TransformError):
        apply_chain(rules, "  nope  ")


# ---------------------------------------------------------------------------
# Spark parity: the compiled Column chain must equal the Python port
# ---------------------------------------------------------------------------

NATIVE_CHAIN_CASES = [
    ([{"type": "trim"}, {"type": "normalize_spaces"}],
     ["  hello   world ", "\ta\n b ", None, ""]),
    ([{"type": "regex", "pattern": r"\$([0-9,]+\.?[0-9]*)", "replacement": "$1"},
      {"type": "remove_commas"}],
     ["$1,299.99", "no price", "$15", None]),
    ([{"type": "lowercase"}, {"type": "prefix", "params": {"value": ">>"}}],
     ["ABC", "MixedCase", ""]),
    ([{"type": "extract_numbers"}], ["Price: $123.45", "nothing", "77"]),
    ([{"type": "parse_int"}], ["abc123", "no digits", "-45x"]),
    ([{"type": "split", "pattern": ",", "params": {"index": 1}}],
     ["a,b,c", "single", ""]),
]

UDF_CHAIN_CASES = [
    ([{"type": "title_case"}], ["hello world", "IT'S fine"]),
    ([{"type": "format_currency", "params": {"symbol": "$"}}],
     ["1234.56", "€1,234.56 EUR", "junk"]),
    ([{"type": "substring", "params": {"start": 2, "end": 5}}], ["abcdefgh"]),
    ([{"type": "pad_left", "params": {"length": 5, "char": "0"}}], ["42"]),
]


def _expected(rules, values):
    out = []
    for v in values:
        if v is None:
            out.append(None)
            continue
        try:
            out.append(apply_chain(rules, v))
        except TransformError:
            out.append(None)
    return out


@pytest.mark.parametrize("rules,values", NATIVE_CHAIN_CASES + UDF_CHAIN_CASES)
def test_compiled_chain_matches_python(spark, rules, values):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(v,) for v in values], "s string")
    fn = compile_chain(rules)
    got = [r[0] for r in df.select(fn(F.col("s")).alias("out")).collect()]
    assert got == _expected(rules, values)


def test_native_chain_has_no_python_udf(spark):
    """The hot-path chains must compile to pure Catalyst expressions."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("x",)], "s string")
    for rules, _ in NATIVE_CHAIN_CASES:
        fn = compile_chain(rules)
        plan = df.select(fn(F.col("s")))._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, (
            f"chain {rules} fell back to Python"
        )
