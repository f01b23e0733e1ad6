"""Selector / Rule model — the typed query expressions of the engine.

Semantics mirror the reference exactly (parity citations):

* ``Selector`` precedence when several fields are set:
  ``selector → css → xpath → text → regex``
  (/root/reference/dude/rule.py:21-45).
* Truthiness = any field set (/root/reference/dude/rule.py:47-48);
  total order by the typed string (/root/reference/dude/rule.py:56-57)
  — used as the deterministic group/rule sort key.
* ``Rule`` carries (group, selector, url_matcher, handler, setup,
  navigate, priority) (/root/reference/dude/rule.py:60-67).
* ``rule_filter`` matches the page URL by fnmatch glob or predicate and
  the setup/navigate flags (/root/reference/dude/rule.py:78-86).

Selectors here are *configuration*, not data: compiled once per worker
into matcher closures (see ``dude_ray.stages.extract``) and broadcast
inside the immutable pipeline spec.
"""

from __future__ import annotations

import fnmatch
from dataclasses import dataclass, field
from enum import Enum, auto
from typing import Callable, Optional, Tuple, Union


class SelectorType(Enum):
    ANY = auto()
    CSS = auto()
    XPATH = auto()
    TEXT = auto()
    REGEX = auto()


@dataclass(frozen=True)
class Selector:
    selector: Optional[str] = None
    css: Optional[str] = None
    xpath: Optional[str] = None
    text: Optional[str] = None
    regex: Optional[str] = None

    def to_str(self, with_type: bool = False) -> str:
        if not with_type or self.selector:
            sel = self.selector or self.css or self.xpath or self.text or self.regex
            assert sel is not None
            return sel
        if self.css:
            return f"css={self.css}"
        if self.xpath:
            return f"xpath={self.xpath}"
        if self.text:
            return f"text={self.text}"
        return f"text=/{self.regex}/i"

    def selector_type(self) -> SelectorType:
        if self.selector:
            return SelectorType.ANY
        if self.css:
            return SelectorType.CSS
        if self.xpath:
            return SelectorType.XPATH
        if self.text:
            return SelectorType.TEXT
        if self.regex:
            return SelectorType.REGEX
        raise ValueError("No selector specified.")

    def __bool__(self) -> bool:
        return (self.selector or self.css or self.xpath or self.text or self.regex) is not None

    def __str__(self) -> str:
        return self.selector or self.css or self.xpath or self.text or self.regex or ""

    def __lt__(self, other: "Selector") -> bool:
        return self.to_str(with_type=True) < other.to_str(with_type=True)


@dataclass(frozen=True)
class Rule:
    group: Selector
    selector: Selector
    url_matcher: Union[str, Callable]
    handler: Callable
    setup: bool = False
    navigate: bool = False
    priority: int = 100

    def replace(self, **kw) -> "Rule":
        data = {f: getattr(self, f) for f in ("group", "selector", "url_matcher",
                                              "handler", "setup", "navigate", "priority")}
        data.update(kw)
        return Rule(**data)


def rule_sorter(rule: Rule) -> Tuple[Selector, Selector]:
    """Deterministic (group, selector) ordering
    (/root/reference/dude/rule.py:70-71)."""
    return rule.group, rule.selector


def rule_grouper(rule: Rule) -> Selector:
    return rule.group


def rule_filter(url: str, setup: bool = False, navigate: bool = False) -> Callable[[Rule], bool]:
    def wrapper(rule: Rule) -> bool:
        if callable(rule.url_matcher):
            matches = rule.url_matcher(url)
        else:
            matches = fnmatch.fnmatch(url, rule.url_matcher)
        return matches and rule.setup is setup and rule.navigate is navigate

    return wrapper


def resolve_rule_groups(rules: list[Rule], groups: dict[Callable, Selector]) -> list[Rule]:
    """Group defaulting: explicit group param > ``@group`` registry for
    the handler > ``:root`` (/root/reference/dude/base.py:393-400)."""
    out = []
    for rule in rules:
        if rule.group:
            out.append(rule)
        elif rule.handler in groups:
            out.append(rule.replace(group=groups[rule.handler]))
        else:
            out.append(rule.replace(group=Selector(selector=":root")))
    return out
