"""Decorator front-end + immutable PipelineSpec.

The reference's user API is a set of decorators on a ``Scraper``
application object (``@select`` /root/reference/dude/base.py:143-199,
``@group`` :201-249, ``@save`` :251-267, event hooks :269-338,
``@start_requests`` :340-353), with module-level singletons exported
from /root/reference/dude/context.py + /root/reference/dude/__init__.py.

Here the same decorators build an immutable ``PipelineSpec`` that is
broadcast (by value, via Ray's closure capture / ``ray.put``) to every
extraction worker; registries are never mutated mid-run.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Tuple

from .rule import Rule, Selector, resolve_rule_groups


@dataclass(frozen=True)
class SeedRequest:
    """A custom start request (@start_requests rows —
    /root/reference/tests/test_bs4.py:374-398): method/body columns on
    the seed table."""

    url: str
    method: str = "GET"
    body: Optional[str] = None


@dataclass(frozen=True)
class PipelineSpec:
    """Everything the distributed stages need, resolved and immutable."""

    rules: Tuple[Rule, ...]
    save_rules: Dict[Tuple[str, bool], Callable]
    events: Dict[str, Tuple[Callable, ...]]
    requests: Tuple[SeedRequest, ...] = ()

    def scraping_rules(self) -> List[Rule]:
        return [r for r in self.rules if not r.setup and not r.navigate]


class DudeApp:
    """The decorator application object (analog of the reference's
    ``Scraper`` front-end, /root/reference/dude/scraper.py:15-99 minus
    backend dispatch — there is exactly one engine here)."""

    def __init__(self) -> None:
        self.rules: List[Rule] = []
        self.groups: Dict[Callable, Selector] = {}
        self.save_rules: Dict[Tuple[str, bool], Callable] = {}
        self.events: Dict[str, List[Callable]] = collections.defaultdict(list)
        self.requests: List[SeedRequest] = []

    # ---- decorators -------------------------------------------------------
    def select(
        self,
        selector: Optional[str] = None,
        group: Optional[str] = None,
        setup: bool = False,
        navigate: bool = False,
        url_match: Any = "*",
        priority: int = 100,
        css: Optional[str] = None,
        xpath: Optional[str] = None,
        text: Optional[str] = None,
        regex: Optional[str] = None,
        group_css: Optional[str] = None,
        group_xpath: Optional[str] = None,
        group_text: Optional[str] = None,
        group_regex: Optional[str] = None,
    ) -> Callable:
        """(/root/reference/dude/base.py:143-199)"""

        def wrapper(func: Callable) -> Callable:
            sel = Selector(selector=selector, css=css, xpath=xpath, text=text, regex=regex)
            assert sel, "Any of selector, css, xpath, text and regex params should be present."
            self.rules.append(
                Rule(
                    selector=sel,
                    group=Selector(selector=group, css=group_css, xpath=group_xpath,
                                   text=group_text, regex=group_regex),
                    url_matcher=url_match,
                    handler=func,
                    setup=setup,
                    navigate=navigate,
                    priority=priority,
                )
            )
            return func

        return wrapper

    def group(
        self,
        selector: Optional[str] = None,
        css: Optional[str] = None,
        xpath: Optional[str] = None,
        text: Optional[str] = None,
        regex: Optional[str] = None,
    ) -> Callable:
        """(/root/reference/dude/base.py:201-249) — first registration
        wins per handler."""

        def wrapper(func: Callable) -> Callable:
            if not (selector or css or xpath or text or regex):
                raise ValueError("Any of selector, css, xpath, text or regex selectors must be present")
            if func not in self.groups:
                self.groups[func] = Selector(selector=selector, css=css, xpath=xpath,
                                             text=text, regex=regex)
            return func

        return wrapper

    def save(self, format: str, is_per_page: bool = False) -> Callable:
        """(/root/reference/dude/base.py:251-267)"""

        def wrapper(func: Callable) -> Callable:
            self.save_rules[format, is_per_page] = func
            return func

        return wrapper

    def _event(self, name: str) -> Callable:
        def wrapper(func: Callable) -> Callable:
            self.events[name].append(func)
            return func

        return wrapper

    def startup(self) -> Callable:
        return self._event("startup")

    def pre_setup(self) -> Callable:
        return self._event("pre-setup")

    def post_setup(self) -> Callable:
        return self._event("post-setup")

    def shutdown(self) -> Callable:
        return self._event("shutdown")

    def start_requests(self) -> Callable:
        """(/root/reference/dude/base.py:340-353) — the generator is drained
        at registration; rows append to the seed-request frontier."""

        def wrapper(func: Callable) -> Callable:
            for req in func():
                assert isinstance(req, SeedRequest)
                self.requests.append(req)
            return func

        return wrapper

    # ---- spec build -------------------------------------------------------
    def build_spec(self) -> PipelineSpec:
        """Resolve rule groups (param > @group registry > :root —
        /root/reference/dude/base.py:393-400) and freeze."""
        from .storage import DEFAULT_SAVE_RULES

        resolved = resolve_rule_groups(self.rules, self.groups)
        return PipelineSpec(
            rules=tuple(resolved),
            save_rules={**DEFAULT_SAVE_RULES, **self.save_rules},
            events={k: tuple(v) for k, v in self.events.items()},
            requests=tuple(self.requests),
        )
