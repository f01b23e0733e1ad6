"""ScrapedData row model + deterministic sort/group keys.

Mirrors /root/reference/dude/scraped_data.py:4-19 with ONE deliberate
change: the reference's ``group_id`` is ``id(group_element)`` — a
CPython address, nondeterministic across runs
(/root/reference/dude/playwright_scraper.py:274); its own tests treat
it as an opaque integer (/root/reference/tests/conftest.py:16-21).
Here ``group_id`` is the deterministic ordinal of the group *selector*
in the sorted distinct-group-selector list, which preserves the only
property the reference relies on: two group elements produced by
different group selectors but sharing ``group_index`` never merge.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple


@dataclass(frozen=True)
class ScrapedData:
    page_number: int
    page_url: str
    group_id: int
    group_index: int
    element_index: int
    data: Dict[str, Any]


def scraped_data_sorter(d: ScrapedData) -> Tuple[int, int, int, int]:
    """(/root/reference/dude/scraped_data.py:14-15)"""
    return d.page_number, d.group_index, d.group_id, d.element_index


def scraped_data_grouper(d: ScrapedData) -> Tuple[int, str, int, int, int]:
    """(/root/reference/dude/scraped_data.py:18-19)"""
    return d.page_number, d.page_url, d.group_index, d.group_id, d.element_index
