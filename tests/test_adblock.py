"""EasyList network-rule engine unit tests (reference parity: the
reference gates requests through braveblock's ``check_network_urls``,
/root/reference/dude/playwright_scraper.py:138-153).  Expectations
mirror documented Adblock Plus filter semantics."""

from dude_ray.adblock import Adblocker


def blocked(rules, url, src=None, rtype="document"):
    return Adblocker(rules).check_network_urls(
        url, source_url=src or url, request_type=rtype)


def test_substring_and_wildcard():
    assert blocked(["/banner/"], "http://e.com/ads/banner/img.gif")
    assert not blocked(["/banner/"], "http://e.com/article/1")
    assert blocked(["/banner/*/img"], "http://e.com/banner/x/y/img.gif")


def test_anchors():
    assert blocked(["|http://baddomain."], "http://baddomain.com/x")
    assert not blocked(["|http://baddomain."], "http://good.com/?http://baddomain.")
    assert blocked(["swf|"], "http://e.com/movie.swf")
    assert not blocked(["swf|"], "http://e.com/movie.swf?x=1")


def test_domain_anchor_label_boundary():
    assert blocked(["||ads.example.com^"], "http://ads.example.com/banner")
    assert blocked(["||ads.example.com^"], "https://sub.ads.example.com/x")
    assert not blocked(["||ads.example.com^"], "http://badads.example.com.evil.io/")
    assert not blocked(["||ads.example.com^"], "http://example.com/ads.example.com")


def test_separator_caret():
    assert blocked(["||e.com/ad^"], "http://e.com/ad?x=1")
    assert blocked(["||e.com/ad^"], "http://e.com/ad/next")
    assert blocked(["||e.com/ad^"], "http://e.com/ad")  # end of URL
    assert not blocked(["||e.com/ad^"], "http://e.com/adjacent")


def test_exception_rules():
    rules = ["||ads.com^", "@@||ads.com/allowed^"]
    assert blocked(rules, "http://ads.com/banner.gif")
    assert not blocked(rules, "http://ads.com/allowed/banner.gif")


def test_domain_option():
    rules = ["/promo$domain=news.com|~blog.news.com"]
    assert blocked(rules, "http://cdn.io/promo.js", src="http://news.com/a")
    assert blocked(rules, "http://cdn.io/promo.js", src="http://m.news.com/a")
    assert not blocked(rules, "http://cdn.io/promo.js", src="http://blog.news.com/a")
    assert not blocked(rules, "http://cdn.io/promo.js", src="http://other.com/a")


def test_third_party_option():
    rules = ["||tracker.io^$third-party"]
    assert blocked(rules, "http://tracker.io/t.gif", src="http://site.com/")
    assert not blocked(rules, "http://tracker.io/t.gif", src="http://tracker.io/home")


def test_resource_type_option():
    rules = ["||cdn.io^$script,image"]
    assert blocked(rules, "http://cdn.io/a.js", rtype="script")
    assert blocked(rules, "http://cdn.io/a.png", rtype="image")
    assert not blocked(rules, "http://cdn.io/page", rtype="document")
    neg = ["||cdn.io^$~document"]
    assert blocked(neg, "http://cdn.io/a.js", rtype="script")
    assert not blocked(neg, "http://cdn.io/page", rtype="document")


def test_comments_headers_cosmetic_ignored():
    rules = ["! a comment", "[Adblock Plus 2.0]", "example.com##.ad-banner", ""]
    assert not blocked(rules, "http://example.com/ad-banner")


def test_case_insensitive():
    assert blocked(["/BANNER/"], "http://e.com/banner/x")


def test_crawl_engine_applies_rules(ray_session, tmp_path):
    """Frontier shards compile the rules once and count blocked edges
    (M11: the engine-level analog of the reference's request gate)."""
    from dude_ray.crawl import run_crawl

    out_plain = tmp_path / "plain"
    base = run_crawl("/root/testdata/sf0.001", out_dir=str(out_plain),
                     num_shards=2, concurrency=2)
    base_ids = {r["doc_id"] for r in base.take_all()}
    blocked_docs = {u for u in base_ids if "/docs/45" in u}
    assert blocked_docs  # corpus has matching pages

    out_ab = tmp_path / "ab"
    ds = run_crawl("/root/testdata/sf0.001", out_dir=str(out_ab),
                   num_shards=2, concurrency=2,
                   adblock_rules=("/docs/45",))
    got = {r["doc_id"] for r in ds.take_all()}
    assert not (got & blocked_docs)
    assert got <= base_ids


def test_scraper_fetch_gate(ray_session, tmp_path):
    """Scraper.run(adblock_rules=...): a matching fetch is aborted like
    the reference's route.abort() → page skipped, crawl continues."""
    from dude_ray.scraper import Scraper

    (tmp_path / "index.html").write_text(
        '<div class="g"><a class="u" href="ads/banner.html">x</a>'
        '<a class="u" href="ok.html">y</a></div>')
    (tmp_path / "ok.html").write_text(
        '<div class="g"><p class="t">fine</p></div>')
    (tmp_path / "ads").mkdir()
    (tmp_path / "ads" / "banner.html").write_text(
        '<div class="g"><p class="t">AD</p></div>')

    app = Scraper()

    @app.select(css=".t", group_css=".g")
    def t(el):
        return {"t": el.text_content()}

    rows = app.run(urls=[f"file://{tmp_path}/index.html"], follow_urls=True,
                   adblock_rules=("/ads/",))
    texts = {r["t"] for r in rows}
    assert "fine" in texts
    assert "AD" not in texts


def test_add_rules_twice_keeps_earlier_plain_rules():
    """Regression: a second add_rules call must not drop option-free
    rules fused by the first call."""
    from dude_ray.adblock import Adblocker

    ab = Adblocker(["/banner/"])
    assert ab.check_network_urls("http://x.com/banner/ad.png")
    ab.add_rules(["/popup/"])
    assert ab.check_network_urls("http://x.com/banner/ad.png")
    assert ab.check_network_urls("http://x.com/popup/ad.png")
    # exceptions persist too
    ab.add_rules(["@@/banner/ok"])
    assert not ab.check_network_urls("http://x.com/banner/ok.png")
    assert ab.check_network_urls("http://x.com/banner/ad.png")


def test_important_overrides_exception():
    """braveblock precedence: a $important block rule wins even when an
    @@ exception also matches."""
    from dude_ray.adblock import Adblocker

    plain = Adblocker(["||ads.example^", "@@||ads.example^"])
    assert not plain.check_network_urls("https://ads.example/x.js")
    imp = Adblocker(["||ads.example^$important", "@@||ads.example^"])
    assert imp.check_network_urls("https://ads.example/x.js")


def test_regex_literal_rule():
    from dude_ray.adblock import Adblocker

    b = Adblocker([r"/banner\d+\.gif/"])
    assert b.check_network_urls("https://cdn.example/banner123.gif")
    assert not b.check_network_urls("https://cdn.example/banner.gif")
    # invalid regex bodies are skipped, not fatal
    assert not Adblocker(["/([unclosed/"]).check_network_urls(
        "https://cdn.example/x")


def test_match_case_option():
    from dude_ray.adblock import Adblocker

    cs = Adblocker(["/TrackPixel$match-case"])
    assert cs.check_network_urls("https://x.example/TrackPixel")
    assert not cs.check_network_urls("https://x.example/trackpixel")
    ci = Adblocker(["/TrackPixel"])
    assert ci.check_network_urls("https://x.example/trackpixel")
