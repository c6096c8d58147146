"""Extended config validation — table-driven fixtures ported from the
reference's internal/config/validation.go + edge_case_test.go styles.
No Spark session needed (pure driver-side validation)."""

from __future__ import annotations

import pytest

from datascrapexter_spark.extract.config import (
    FieldConfig,
    ScraperConfig,
    load_config,
)
from datascrapexter_spark.extract.config_validation import (
    format_validation_error,
    lint_css_selector,
    parse_go_duration,
    validate_with_details,
    validation_suggestions,
)


def base_cfg(**kw) -> ScraperConfig:
    d = dict(
        name="t",
        base_url="https://example.com",
        fields=[FieldConfig(name="title", selector="h1", type="text")],
    )
    d.update(kw)
    return ScraperConfig(**d)


# ---------------------------------------------------------------------------
# Go duration parsing (time.ParseDuration grammar)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("s,expected", [
    ("300ms", 0.3),
    ("2s", 2.0),
    ("1.5h", 5400.0),
    ("1m30s", 90.0),
    ("-2s", -2.0),
    ("0", 0.0),
    ("100us", 0.0001),
])
def test_parse_go_duration_valid(s, expected):
    assert parse_go_duration(s) == pytest.approx(expected)


@pytest.mark.parametrize("s", ["", "5", "2 s", "s", "5x", "1h5", "abc"])
def test_parse_go_duration_invalid(s):
    with pytest.raises(ValueError):
        parse_go_duration(s)


# ---------------------------------------------------------------------------
# field-level checks (validation.go:124-225)
# ---------------------------------------------------------------------------


def _errs(cfg) -> list[str]:
    return [e.field for e in validate_with_details(cfg).errors]


def test_valid_config_passes():
    r = validate_with_details(base_cfg())
    assert r.valid and not r.errors


def test_missing_basics():
    cfg = ScraperConfig(name="", base_url="", fields=[])
    fields = _errs(cfg)
    assert "name" in fields and "base_url" in fields and "fields" in fields


def test_duplicate_field_names():
    cfg = base_cfg(fields=[
        FieldConfig(name="a", selector="h1"),
        FieldConfig(name="a", selector="h2"),
    ])
    assert "fields[1].name" in _errs(cfg)


def test_attr_requires_attribute_and_invalid_type():
    cfg = base_cfg(fields=[
        FieldConfig(name="x", selector="a", type="attr"),
        FieldConfig(name="y", selector="b", type="nonsense"),
    ])
    errs = _errs(cfg)
    assert "fields[0].attribute" in errs and "fields[1].type" in errs


def test_selector_lint():
    assert lint_css_selector("") == "empty selector"
    assert "unclosed single quote" in lint_css_selector("a[href='x]")
    assert "unclosed double quote" in lint_css_selector('a[id="y]')
    assert "invalid character sequence" in lint_css_selector("div <<p")
    # the reference's own configs use attribute selectors: must lint clean
    assert lint_css_selector("a[href]") is None
    assert lint_css_selector("meta[property='og:title']") is None

    cfg = base_cfg(fields=[FieldConfig(name="x", selector="p'", type="text")])
    assert "fields[0].selector" in _errs(cfg)


def test_transform_checks():
    cfg = base_cfg(fields=[FieldConfig(
        name="x", selector="p", type="text",
        transform=[
            {"type": ""},
            {"type": "bogus"},
            {"type": "regex"},                       # pattern required
            {"type": "regex", "pattern": "(unclosed"},
            {"type": "regex", "pattern": r"\d+", "replacement": "N"},
        ])])
    errs = _errs(cfg)
    assert "fields[0].transform[0].type" in errs
    assert "fields[0].transform[1].type" in errs
    assert "fields[0].transform[2].pattern" in errs
    assert "fields[0].transform[3].pattern" in errs
    assert not any("transform[4]" in e for e in errs)


# ---------------------------------------------------------------------------
# URL / output / engine settings (validation.go:84-121, :228-312)
# ---------------------------------------------------------------------------


def test_url_checks_and_http_warning():
    errs = _errs(base_cfg(base_url="example.com/path"))
    assert "base_url" in errs  # no scheme
    errs = _errs(base_cfg(urls=["https://ok.com", "https://"]))
    assert "urls[1]" in errs   # no host
    r = validate_with_details(base_cfg(base_url="http://plain.com"))
    assert r.valid
    assert any("HTTP instead of HTTPS" in w for w in r.warnings)


def test_output_format_whitelist():
    assert "output.format" in _errs(base_cfg(output_format="excel"))
    assert "output.format" in _errs(base_cfg(output_format=""))
    r = validate_with_details(base_cfg(output_format="sqlite"))
    assert r.valid
    assert any("stdout" in w for w in r.warnings)  # no output file


def test_engine_settings_bounds():
    assert "rate_limit.requests_per_second" in _errs(
        base_cfg(requests_per_second=-1.0))
    assert "timeout" in _errs(base_cfg(timeout="fast"))
    assert "timeout" in _errs(base_cfg(timeout="-5s"))
    assert "retries" in _errs(base_cfg(retries=-1))
    assert "error_threshold" in _errs(base_cfg(error_threshold=-2))
    assert "error_threshold_percent" in _errs(
        base_cfg(error_threshold_percent=150.0))
    # warnings, not errors
    r = validate_with_details(base_cfg(requests_per_second=10.0,
                                       timeout="120s"))
    assert r.valid
    assert any("overwhelm" in w for w in r.warnings)
    assert any("60 seconds" in w for w in r.warnings)


# ---------------------------------------------------------------------------
# report formatting + suggestions (:349-441)
# ---------------------------------------------------------------------------


def test_format_and_suggestions_and_raise():
    cfg = base_cfg(base_url="nohost",
                   fields=[FieldConfig(name="", selector="", type="text")])
    r = validate_with_details(cfg)
    report = format_validation_error(r)
    assert report.startswith("Configuration validation failed:")
    assert "(field: base_url)" in report

    sugg = validation_suggestions(r)
    assert any("protocol" in s for s in sugg)
    assert any("unique" in s for s in sugg)

    with pytest.raises(ValueError, match="validation failed"):
        cfg.validate_extended()
    base_cfg().validate_extended()  # clean config does not raise


# ---------------------------------------------------------------------------
# loader edge cases (edge_case_test.go style)
# ---------------------------------------------------------------------------


def test_load_config_edge_cases(tmp_path):
    # YAML string with extended engine settings round-trips
    cfg = load_config("""
name: edge
urls: [https://a.com]
timeout: 30s
retries: 2
error_threshold: 5
error_threshold_percent: 10.5
output: {format: csv, file: out.csv}
fields:
  - {name: t, selector: h1}
""")
    assert cfg.timeout == "30s" and cfg.retries == 2
    assert cfg.error_threshold_percent == 10.5
    assert cfg.output_file == "out.csv"
    assert cfg.validate_extended().valid

    # missing file raises
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "missing.yaml"))

    # config with no fields fails the operational gate
    with pytest.raises(ValueError, match="at least one field"):
        load_config({"name": "x", "urls": ["https://a.com"], "fields": []})


# ---------------------------------------------------------------------------
# config cache (config.go:241-420) + templates (:737-836)
# ---------------------------------------------------------------------------


def test_config_cache_content_hash_invalidation(tmp_path):
    from datascrapexter_spark.extract.config_cache import ConfigCache

    p = tmp_path / "job.yaml"
    p.write_text("""
name: cached
urls: [https://a.com]
fields: [{name: t, selector: h1}]
""")
    cache = ConfigCache(capacity=2)
    c1 = cache.get(str(p))
    c2 = cache.get(str(p))
    assert c1 is c2                      # content unchanged -> same object
    assert cache.stats.hits == 1 and cache.stats.misses == 1

    # touching mtime alone must NOT invalidate (hash is content-based)
    import os
    os.utime(p)
    assert cache.get(str(p)) is c1

    # an edited file must reload
    p.write_text(p.read_text().replace("cached", "edited"))
    c3 = cache.get(str(p))
    assert c3 is not c1 and c3.name == "edited"

    # LRU eviction at capacity
    for i in range(3):
        q = tmp_path / f"x{i}.yaml"
        q.write_text(f"""
name: x{i}
urls: [https://a.com]
fields: [{{name: t, selector: h1}}]
""")
        cache.get(str(q))
    assert len(cache) == 2 and cache.stats.evictions >= 1


def test_generate_templates():
    from datascrapexter_spark.extract.config_cache import generate_template

    ec = generate_template("ecommerce")
    assert ec.name == "ecommerce_scraper"
    assert [f.name for f in ec.fields] == ["title", "price", "description",
                                           "image"]
    assert ec.fields[3].type == "attr" and ec.fields[3].attribute == "src"
    ec.validate()  # every template must pass the operational gate

    news = generate_template("news")
    assert news.output_file == "articles.json" and len(news.fields) == 4
    news.validate()

    basic = generate_template("anything-else")
    assert basic.name == "basic_scraper"
    basic.validate()


def test_env_vars_not_expanded(tmp_path):
    """Parity: the reference does NOT expand ${VARS} in YAML configs
    (edge_case_test.go:483-570 expectations)."""
    import os

    os.environ["DSX_TEST_HOST"] = "should-not-appear.com"
    try:
        cfg = load_config("""
name: env
base_url: https://${DSX_TEST_HOST}/x
fields: [{name: t, selector: h1}]
""")
        assert cfg.base_url == "https://${DSX_TEST_HOST}/x"
    finally:
        del os.environ["DSX_TEST_HOST"]
