"""Contract tests for the pluggable HTML parser seam (html/backends.py).

The sandbox has no C parser (lxml / selectolax are ModuleNotFoundError —
round-3 verdict #3), so these tests pin the selection CONTRACT: stdlib is
the resolved default here, an explicitly named missing backend is an
error (never a silent fallback), and a registered backend is honored via
argument and env var — which is exactly how a deployment picks up a C
parser without touching the extraction engine."""

import pytest

from datascrapexter_spark.html import parse_html
from datascrapexter_spark.html.backends import (
    _ENV_VAR,
    available_backends,
    get_parser,
    register_backend,
    select_backend,
    _REGISTRY,
)
from datascrapexter_spark.html.dom import Node


def test_stdlib_always_available_and_default():
    assert "stdlib" in available_backends()
    # no C parser in this sandbox -> stdlib resolves as the default
    assert select_backend() == "stdlib"


def test_missing_named_backend_is_an_error(monkeypatch):
    with pytest.raises(ValueError, match="not available"):
        select_backend("no-such-parser")
    monkeypatch.setenv(_ENV_VAR, "no-such-parser")
    with pytest.raises(ValueError, match="not available"):
        select_backend()


def test_registered_backend_honored_by_arg_and_env(monkeypatch):
    calls = []

    def fake(html: str) -> Node:
        calls.append(html)
        root = Node("#document")
        el = Node("fake")
        el.append(Node(None, text_data="hi"))
        root.append(el)
        return root

    register_backend("faketest", fake)
    try:
        assert "faketest" in available_backends()
        assert select_backend("faketest") == "faketest"
        doc = parse_html("<p>x</p>", backend="faketest")
        assert doc.children[0].tag == "fake" and calls == ["<p>x</p>"]

        monkeypatch.setenv(_ENV_VAR, "faketest")
        assert select_backend() == "faketest"
        assert get_parser()("<i>") .children[0].tag == "fake"
    finally:
        _REGISTRY.pop("faketest", None)


def test_stdlib_backend_parses_same_tree_via_seam():
    doc = parse_html("<ul><li>a<li>b</ul>", backend="stdlib")
    ul = doc.children[0]
    assert [c.tag for c in ul.element_children()] == ["li", "li"]
    assert ul.text() == "ab"
