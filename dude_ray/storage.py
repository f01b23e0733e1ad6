"""Sinks — json/csv/yaml writers + the (format, per_page) save registry.

Mirrors /root/reference/dude/storage.py and the registry semantics of
/root/reference/dude/base.py:624-666: format resolved from the output
file extension when present; handler ``(data, output) -> bool``; a
falsy return raises; unknown format raises ``KeyError``; success
clears the buffer (here: the caller's responsibility — blocks stream,
there is no global buffer).

Large-scale output goes through ``write_spans_parquet`` instead: the
span table partitioned by shard so a resumed run skips finished
partitions (see dude_ray.crawl).
"""

from __future__ import annotations

import csv
import json
import logging
import sys
from pathlib import Path
from typing import Callable, Dict, List, Optional, Tuple

logger = logging.getLogger(__name__)


def save_json(data: List[dict], output: Optional[str]) -> bool:
    """(/root/reference/dude/storage.py:8-30)"""
    if output is not None:
        with open(output, "w") as f:
            json.dump(data, f, indent=2)
        logger.info("%d items saved to %s.", len(data), output)
    else:
        json.dump(data, sys.stdout, indent=2)
    return True


def save_csv(data: List[dict], output: Optional[str]) -> bool:
    """(/root/reference/dude/storage.py:33-49,70-82): header = sorted
    union of all row keys; stdout fallback degrades to JSON."""
    if output is not None:
        headers: set = set()
        for item in data:
            headers.update(item.keys())
        with open(output, "w") as f:
            writer = csv.DictWriter(f, fieldnames=sorted(headers))
            writer.writeheader()
            writer.writerows(data)
        logger.info("%d items saved to %s.", len(data), output)
    else:
        logger.warning("Printing CSV to terminal is currently not supported. Defaulting to json.")
        json.dump(data, sys.stdout, indent=2)
    return True


def save_yaml(data: List[dict], output: Optional[str]) -> bool:
    """(/root/reference/dude/storage.py:52-67)"""
    import yaml

    if output is not None:
        with open(output, "w") as f:
            yaml.safe_dump(data, f)
        logger.info("%d items saved to %s.", len(data), output)
    else:
        yaml.safe_dump(data, sys.stdout)
    return True


DEFAULT_SAVE_RULES: Dict[Tuple[str, bool], Callable] = {
    ("json", False): save_json,
    ("csv", False): save_csv,
    ("yml", False): save_yaml,
    ("yaml", False): save_yaml,
}


def dispatch_save(
    save_rules: Dict[Tuple[str, bool], Callable],
    data: List[dict],
    format: str = "json",
    output: Optional[str] = None,
    save_per_page: bool = False,
) -> bool:
    """Writer dispatch (/root/reference/dude/base.py:624-642): extension
    overrides format; empty data skips; falsy handler result raises."""
    if output:
        extension = Path(output).suffix.lower()[1:]
        if extension:
            format = extension
    handler = save_rules[format, save_per_page]  # KeyError on unknown format, as reference
    if not len(data):
        logger.info("No data was scraped. Skipped saving %s.",
                    dict(format=format, output=output, save_per_page=save_per_page))
        return False
    if handler(data, output):
        return True
    raise RuntimeError(f"Failed to save output {{'output': {output!r}, 'format': {format!r}}}.")
