"""DOM + CSS selector engine tests, including the canonical fixture page
from /root/reference/test/utils/test_utils.go:49-66 (CreateBasicHTML)."""

from datascrapexter_spark.html import parse_html, select, matches

# test_utils.go:49-66, verbatim structure
BASIC_HTML = """
<html>
<head><title>Test Page</title></head>
<body>
    <h1>Test Page Title</h1>
    <div class="description">This is a test page description</div>
    <span class="price">$99.99</span>
    <div class="rating">4.5 stars</div>
    <ul class="items">
        <li>Item 1</li>
        <li>Item 2</li>
        <li>Item 3</li>
    </ul>
</body>
</html>
"""


def test_basic_selectors():
    doc = parse_html(BASIC_HTML)
    assert select(doc, "h1")[0].text() == "Test Page Title"
    assert select(doc, ".description")[0].text() == "This is a test page description"
    assert select(doc, ".price")[0].text() == "$99.99"
    assert select(doc, "title")[0].text() == "Test Page"
    items = select(doc, "ul.items li")
    assert [n.text() for n in items] == ["Item 1", "Item 2", "Item 3"]


def test_id_and_attr_selectors():
    doc = parse_html(
        '<div id="main"><a href="/x" rel="nofollow">A</a>'
        '<a href="/y">B</a><a>C</a></div>'
    )
    assert len(select(doc, "#main")) == 1
    assert [n.text() for n in select(doc, "a[href]")] == ["A", "B"]
    assert [n.text() for n in select(doc, 'a[rel="nofollow"]')] == ["A"]
    assert [n.text() for n in select(doc, "a[rel='nofollow']")] == ["A"]


def test_child_vs_descendant():
    doc = parse_html("<div><p>direct</p><section><p>nested</p></section></div>")
    assert len(select(doc, "div p")) == 2
    assert [n.text() for n in select(doc, "div > p")] == ["direct"]


def test_comma_groups_document_order():
    doc = parse_html("<table><tr><th>h</th><td>d</td></tr></table>")
    cells = select(doc, "td, th")
    assert [n.text() for n in cells] == ["h", "d"]  # document order


def test_first_child_pseudo():
    doc = parse_html("<ul><li>one</li><li>two</li></ul>")
    assert [n.text() for n in select(doc, "li:first-child")] == ["one"]


def test_implied_tbody():
    doc = parse_html("<table><tr><td>x</td></tr></table>")
    assert len(select(doc, "tbody")) == 1
    assert select(doc, "tbody tr td")[0].text() == "x"


def test_auto_close_li():
    doc = parse_html("<ul><li>a<li>b<li>c</ul>")
    assert [n.text() for n in select(doc, "li")] == ["a", "b", "c"]


def test_void_elements():
    doc = parse_html('<div><br><img src="x.png">text</div>')
    div = select(doc, "div")[0]
    assert div.text() == "text"
    assert select(doc, "img")[0].attr("src") == "x.png"


def test_entities_decoded_in_text():
    doc = parse_html("<p>a &amp; b &lt;c&gt;</p>")
    assert select(doc, "p")[0].text() == "a & b <c>"


def test_inner_html_escaping():
    doc = parse_html("<div><b>bold &amp; strong</b></div>")
    assert select(doc, "div")[0].inner_html() == "<b>bold &amp; strong</b>"


def test_matches_filter_semantics():
    doc = parse_html("<table class='t'><tr><td>x</td></tr></table>")
    table = select(doc, "table")[0]
    assert matches(table, "table")
    assert matches(table, ".t")
    assert not matches(table, "td")


def test_script_content_preserved():
    doc = parse_html('<script type="application/ld+json">{"a": 1}</script>')
    assert select(doc, "script")[0].text() == '{"a": 1}'


def test_class_multi():
    doc = parse_html('<div class="a b c">x</div>')
    assert len(select(doc, ".b")) == 1
    assert len(select(doc, "div.a.c")) == 1
    assert select(doc, "div")[0].has_class("b")
