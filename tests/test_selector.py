"""Selector/Rule model tests — re-encoding of
/root/reference/tests/test_selector.py:10-65."""

import pytest

from dude_ray.rule import Rule, Selector, SelectorType, resolve_rule_groups, rule_filter
from dude_ray.spec import DudeApp


def test_selector_precedence():
    s = Selector(selector="any", css="css", xpath="xp", text="tx", regex="rx")
    assert s.to_str() == "any"
    assert s.selector_type() == SelectorType.ANY
    assert Selector(css="c", xpath="x").to_str(with_type=True) == "css=c"
    assert Selector(xpath="x", text="t").to_str(with_type=True) == "xpath=x"
    assert Selector(text="t", regex="r").to_str(with_type=True) == "text=t"
    assert Selector(regex="r").to_str(with_type=True) == "text=/r/i"


def test_selector_types():
    assert Selector(css="c").selector_type() == SelectorType.CSS
    assert Selector(xpath="x").selector_type() == SelectorType.XPATH
    assert Selector(text="t").selector_type() == SelectorType.TEXT
    assert Selector(regex="r").selector_type() == SelectorType.REGEX
    with pytest.raises(ValueError):
        Selector().selector_type()


def test_selector_truthiness_and_order():
    assert not Selector()
    assert Selector(css="x")
    assert Selector(css="a") < Selector(text="a")  # "css=a" < "text=a"


def test_rule_filter_glob_and_callable():
    r_glob = Rule(group=Selector(selector=":root"), selector=Selector(css=".t"),
                  url_matcher="https://example.com/*", handler=lambda e: {})
    r_call = r_glob.replace(url_matcher=lambda u: u.endswith(".html"))
    assert rule_filter("https://example.com/a")(r_glob)
    assert not rule_filter("https://other.com/a")(r_glob)
    assert rule_filter("https://x/y.html")(r_call)
    assert not rule_filter("https://x/y.css")(r_call)
    # setup/navigate flag matching (/root/reference/dude/rule.py:78-86)
    r_setup = r_glob.replace(setup=True)
    assert not rule_filter("https://example.com/a")(r_setup)
    assert rule_filter("https://example.com/a", setup=True)(r_setup)


def test_decorator_registration_counts():
    app = DudeApp()

    @app.select(css=".title")
    def title(el):
        return {}

    @app.select(css=".url", group_css=".g")
    def url(el):
        return {}

    @app.select(css=".nav", navigate=True)
    def nav(el):
        return {}

    @app.select(css=".setup", setup=True)
    def setup(el):
        return {}

    assert len(app.rules) == 4
    spec = app.build_spec()
    assert len(spec.scraping_rules()) == 2


def test_select_requires_a_selector():
    app = DudeApp()
    with pytest.raises(AssertionError):
        app.select()(lambda el: {})


def test_group_resolution_precedence():
    """group param > @group registry > :root
    (/root/reference/dude/base.py:393-400)."""

    def h1(el):
        return {}

    def h2(el):
        return {}

    def h3(el):
        return {}

    groups = {h2: Selector(css=".registered")}
    rules = [
        Rule(group=Selector(css=".explicit"), selector=Selector(css=".a"),
             url_matcher="*", handler=h1),
        Rule(group=Selector(), selector=Selector(css=".b"), url_matcher="*", handler=h2),
        Rule(group=Selector(), selector=Selector(css=".c"), url_matcher="*", handler=h3),
    ]
    out = resolve_rule_groups(rules, groups)
    assert out[0].group.css == ".explicit"
    assert out[1].group.css == ".registered"
    assert out[2].group.selector == ":root"


def test_group_decorator_first_registration_wins():
    app = DudeApp()

    def h(el):
        return {}

    app.group(css=".first")(h)
    app.group(css=".second")(h)
    assert app.groups[h].css == ".first"
