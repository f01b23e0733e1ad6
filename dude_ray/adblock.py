"""EasyList-style network-rule ad blocking (reference parity: the
reference constructs a braveblock ``Adblocker`` and gates every
browser request through ``check_network_urls``
(/root/reference/dude/base.py:31,74,
/root/reference/dude/playwright_scraper.py:138-153).  braveblock is a
Rust engine over the full Adblock Plus syntax; this is a from-scratch
engine over the NETWORK-rule subset that matters for a crawler:

* ``substring`` patterns with ``*`` wildcards,
* ``|`` start/end anchors, ``||`` domain anchor (label boundary),
* ``^`` separator placeholder,
* ``@@`` exception rules,
* ``$`` options: ``domain=a|~b`` (source-URL host filter, with
  subdomain semantics), ``third-party``/``~third-party``, resource
  types (``script``, ``image``, ``stylesheet``, ``xmlhttprequest``,
  ``document``, ``subdocument``, ``media``, ``font``, ``other``),
  ``important`` (block wins over exceptions) and ``match-case``,
* ``/regex/`` raw-regex rule bodies,
* ``!`` comments / ``[Adblock…]`` headers / element-hiding rules
  (``##``) are ignored — they are not network rules.

Rules compile once per worker/shard actor (T3 in SURVEY §2) into one
alternation regex per bucket for O(1) regex invocations per URL.
"""

from __future__ import annotations

import re
from typing import Iterable, Optional
from urllib.parse import urlparse

_RESOURCE_TYPES = {
    "script", "image", "stylesheet", "xmlhttprequest", "document",
    "subdocument", "media", "font", "websocket", "ping", "other",
}

# ^ matches a "separator": anything that is not a letter, digit, or
# one of _ - . % — or the end of the URL
_SEP = r"(?:[^\w\-.%]|$)"


def _pattern_to_regex(pat: str) -> str:
    """Translate the filter pattern body (no options) to a regex."""
    anchor_start = anchor_end = domain_anchor = False
    if pat.startswith("||"):
        domain_anchor = True
        pat = pat[2:]
    elif pat.startswith("|"):
        anchor_start = True
        pat = pat[1:]
    if pat.endswith("|"):
        anchor_end = True
        pat = pat[:-1]
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "^":
            out.append(_SEP)
        else:
            out.append(re.escape(ch))
    body = "".join(out)
    if domain_anchor:
        # match at a hostname label boundary after the scheme
        body = r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*\.)?" + body
    elif anchor_start:
        body = "^" + body
    if anchor_end:
        body += "$"
    return body


class _Rule:
    __slots__ = ("regex", "domains", "not_domains", "third_party",
                 "types", "not_types", "important", "match_case")

    def __init__(self, regex: str):
        self.regex = regex
        self.domains: tuple[str, ...] = ()
        self.not_domains: tuple[str, ...] = ()
        self.third_party: Optional[bool] = None
        self.types: frozenset[str] = frozenset()
        self.not_types: frozenset[str] = frozenset()
        self.important = False     # $important: wins over exceptions
        self.match_case = False    # $match-case: case-sensitive search

    @property
    def plain(self) -> bool:
        """No per-request options → eligible for the fused alternation
        ($important changes exception precedence and $match-case the
        regex flags, so both stay out of the case-insensitive fusion)."""
        return (not self.domains and not self.not_domains
                and self.third_party is None and not self.types
                and not self.not_types and not self.important
                and not self.match_case)


def _host_matches(host: str, dom: str) -> bool:
    return host == dom or host.endswith("." + dom)


def _parse_line(line: str) -> Optional[_Rule]:
    line = line.strip()
    if (not line or line.startswith("!") or line.startswith("[")
            or "##" in line or "#@#" in line or "#?#" in line):
        return None
    opts = ""
    body = line
    # a '$' that splits pattern from options (the last one outside regex)
    idx = body.rfind("$")
    if idx > 0:
        maybe = body[idx + 1:]
        if maybe and all(
                p.split("=")[0].lstrip("~") in _RESOURCE_TYPES
                | {"domain", "third-party", "match-case", "important"}
                for p in maybe.split(",") if p):
            body, opts = body[:idx], maybe
    if not body:
        return None
    if len(body) > 2 and body.startswith("/") and body.endswith("/"):
        # braveblock regex-literal rule: /.../ is a raw regex pattern
        try:
            re.compile(body[1:-1])
        except re.error:
            return None
        rule = _Rule(body[1:-1])
    else:
        rule = _Rule(_pattern_to_regex(body))
    for opt in filter(None, opts.split(",")):
        if opt.startswith("domain="):
            for d in opt[7:].split("|"):
                d = d.strip().lower()
                if not d:
                    continue
                if d.startswith("~"):
                    rule.not_domains += (d[1:],)
                else:
                    rule.domains += (d,)
        elif opt == "third-party":
            rule.third_party = True
        elif opt == "~third-party":
            rule.third_party = False
        elif opt == "match-case":
            rule.match_case = True
        elif opt == "important":
            rule.important = True
        elif opt.startswith("~"):
            if opt[1:] in _RESOURCE_TYPES:
                rule.not_types |= {opt[1:]}
        elif opt in _RESOURCE_TYPES:
            rule.types |= {opt}
    return rule


class Adblocker:
    """Compiled network-rule set.  ``check_network_urls`` mirrors the
    braveblock call the reference gates requests through."""

    def __init__(self, rules: Iterable[str] = ()):
        self._block: list[_Rule] = []        # option-carrying rules only
        self._except: list[_Rule] = []
        self._plain_block: list[_Rule] = []  # option-free, persist across
        self._plain_except: list[_Rule] = []  # add_rules calls (re-fused)
        self._fused_block: Optional[re.Pattern] = None
        self._fused_except: Optional[re.Pattern] = None
        self.add_rules(rules)

    def add_rules(self, rules: Iterable[str]) -> None:
        for line in rules:
            is_exc = line.startswith("@@")
            r = _parse_line(line[2:] if is_exc else line)
            if r is None:
                continue
            if r.plain:
                (self._plain_except if is_exc else self._plain_block).append(r)
            else:
                (self._except if is_exc else self._block).append(r)
        # fuse all option-free rules into one alternation per side: one
        # C-level regex scan per URL instead of len(rules) scans
        self._fused_block = self._fuse(self._plain_block)
        self._fused_except = self._fuse(self._plain_except)

    @staticmethod
    def _fuse(rules: list[_Rule]) -> Optional[re.Pattern]:
        if not rules:
            return None
        return re.compile("|".join(f"(?:{r.regex})" for r in rules),
                          re.IGNORECASE)

    @staticmethod
    def _rule_applies(rule: _Rule, url_host: str, src_host: str,
                      request_type: str) -> bool:
        if rule.types and request_type not in rule.types:
            return False
        if rule.not_types and request_type in rule.not_types:
            return False
        if rule.third_party is not None:
            third = not (_host_matches(url_host, src_host)
                         or _host_matches(src_host, url_host))
            if rule.third_party != third:
                return False
        if rule.domains and not any(_host_matches(src_host, d)
                                    for d in rule.domains):
            return False
        if rule.not_domains and any(_host_matches(src_host, d)
                                    for d in rule.not_domains):
            return False
        return True

    @staticmethod
    def _search(rule: _Rule, url: str) -> bool:
        return bool(re.search(rule.regex, url,
                              0 if rule.match_case else re.IGNORECASE))

    def check_network_urls(self, url: str, source_url: str = "",
                           request_type: str = "document") -> bool:
        """True = block (matches a block rule and no exception;
        ``$important`` block rules win over exceptions, braveblock
        precedence)."""
        url_host = (urlparse(url).hostname or "").lower()
        src_host = (urlparse(source_url).hostname or url_host or "").lower()
        for r in self._block:
            if r.important \
                    and self._rule_applies(r, url_host, src_host,
                                           request_type) \
                    and self._search(r, url):
                return True
        blocked = bool(self._fused_block and self._fused_block.search(url))
        if not blocked:
            for r in self._block:
                if not r.important \
                        and self._rule_applies(r, url_host, src_host,
                                               request_type) \
                        and self._search(r, url):
                    blocked = True
                    break
        if not blocked:
            return False
        if self._fused_except and self._fused_except.search(url):
            return False
        for r in self._except:
            if self._rule_applies(r, url_host, src_host, request_type) \
                    and self._search(r, url):
                return False
        return True
