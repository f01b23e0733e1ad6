"""DOM + selector-engine unit tests (the stdlib-only replacement for the
reference's bs4/lxml/parsel backends)."""

from dude_ray.htmlparser import (
    compile_css,
    compile_xpath,
    css_select,
    parse_html,
    regex_select,
    text_select,
    xpath_select,
)

HTML = """
<html><body>
<div id="main" class="wrap outer">
  <p class="a b">one</p>
  <span class="a">two</span>
  <div class="inner"><p class="a">three</p></div>
</div>
<ul>
  <li data-x="1">L1</li>
  <li data-x="2" class="sel">L2</li>
</ul>
</body></html>
"""


def sel(css, scope=None):
    dom = scope or parse_html(HTML)
    return css_select(dom, compile_css(css))


def texts(els):
    return [e.text_content() for e in els]


def test_tag_and_class():
    assert texts(sel("p")) == ["one", "three"]
    assert texts(sel(".a")) == ["one", "two", "three"]
    assert texts(sel("p.a")) == ["one", "three"]
    assert texts(sel("span.a")) == ["two"]


def test_multi_class_and_id():
    assert texts(sel(".a.b")) == ["one"]
    assert len(sel("#main")) == 1
    assert sel("#main")[0].tag == "div"


def test_descendant_and_child_combinators():
    assert texts(sel(".inner p")) == ["three"]
    assert texts(sel("#main > p")) == ["one"]
    assert texts(sel("ul > li")) == ["L1", "L2"]


def test_attr_selectors():
    assert texts(sel("li[data-x]")) == ["L1", "L2"]
    assert texts(sel('li[data-x="2"]')) == ["L2"]


def test_selector_list_document_order():
    assert texts(sel("span.a, p.a")) == ["one", "two", "three"]


def test_root_selector():
    dom = parse_html(HTML)
    els = sel(":root", dom)
    assert [e.tag for e in els] == ["html"]


def test_pseudo_text_and_attr():
    dom = parse_html(HTML)
    c = compile_css("li.sel::text")
    assert c.extract == "text"
    c2 = compile_css("li[data-x]::attr(data-x)")
    assert c2.extract == ("attr", "data-x")


def test_xpath_steps_and_predicates():
    dom = parse_html(HTML)
    els = xpath_select(dom, compile_xpath('.//p[contains(@class, "a")]'))
    assert texts(els) == ["one", "three"]
    els = xpath_select(dom, compile_xpath('.//li[@data-x="2"]'))
    assert texts(els) == ["L2"]
    els = xpath_select(dom, compile_xpath('.//ul/li'))
    assert texts(els) == ["L1", "L2"]
    els = xpath_select(dom, compile_xpath('.//p[contains(text(), "thr")]'))
    assert texts(els) == ["three"]


def test_xpath_extractors():
    x = compile_xpath('.//li/@data-x')
    assert x.extract == ("attr", "data-x")
    x2 = compile_xpath('.//p[contains(@class, "a")]/text()')
    assert x2.extract == "text"


def test_text_and_regex_select_direct_text_only():
    dom = parse_html("<div>outer<p>match inner</p></div>")
    # 'match' is direct text of <p>, not of <div>
    assert [e.tag for e in text_select(dom, "match")] == ["p"]
    assert [e.tag for e in regex_select(dom, r"MATCH\s")] == ["p"]  # case-insensitive


def test_malformed_html_recovers():
    dom = parse_html("<div class='g'><p class='t'>Ok<div><span>tail")
    assert texts(sel(".t", dom)) == ["Oktail"] or texts(sel(".t", dom))[0].startswith("Ok")


def test_entity_decoding():
    dom = parse_html('<p class="t">A &amp; B &lt;ok&gt;</p>')
    assert texts(sel(".t", dom)) == ["A & B <ok>"]


def test_void_elements_do_not_nest():
    dom = parse_html('<div><img src="x.png"><p class="t">after</p></div>')
    img = sel("img", dom)[0]
    assert img.children == []
    assert texts(sel(".t", dom)) == ["after"]


def test_index_consistency_after_reuse():
    dom = parse_html(HTML)
    a1 = texts(sel(".a", dom))
    a2 = texts(sel(".a", dom))  # cached index path
    assert a1 == a2 == ["one", "two", "three"]
