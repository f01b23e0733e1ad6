"""Sink tests — /root/reference/tests/test_playwright_sync.py:269-375
re-encoded (json/csv round trips, custom save, unknown format, failed
save)."""

import csv
import json

import pytest

from dude_ray.spec import DudeApp
from dude_ray.storage import dispatch_save


ROWS = [
    {"_page_number": 1, "title": "Title 1", "url": "u1"},
    {"_page_number": 1, "title": "Title 2"},
]


def test_json_roundtrip(tmp_path):
    out = tmp_path / "o.json"
    app = DudeApp()
    assert dispatch_save(app.build_spec().save_rules, ROWS, output=str(out))
    assert json.loads(out.read_text()) == ROWS


def test_csv_header_union_sorted(tmp_path):
    """CSV header = sorted union of all row keys
    (/root/reference/dude/storage.py:70-82)."""
    out = tmp_path / "o.csv"
    app = DudeApp()
    assert dispatch_save(app.build_spec().save_rules, ROWS, output=str(out))
    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["_page_number", "title", "url"]
    assert rows[1] == ["1", "Title 1", "u1"]
    assert rows[2] == ["1", "Title 2", ""]


def test_extension_overrides_format(tmp_path):
    out = tmp_path / "o.csv"
    app = DudeApp()
    dispatch_save(app.build_spec().save_rules, ROWS, format="json", output=str(out))
    assert out.read_text().startswith("_page_number,")


def test_custom_save_registry():
    """@save registry keyed (format, per_page)
    (/root/reference/dude/base.py:251-267)."""
    app = DudeApp()
    calls = []

    @app.save("custom")
    def save_to_db(data, output):
        calls.append(data)
        return True

    spec = app.build_spec()
    assert dispatch_save(spec.save_rules, ROWS, format="custom")
    assert calls == [ROWS]


def test_unknown_format_raises_keyerror():
    app = DudeApp()
    with pytest.raises(KeyError):
        dispatch_save(app.build_spec().save_rules, ROWS, format="nope")


def test_failed_save_raises():
    """Falsy handler result raises (/root/reference/dude/base.py:637-640)."""
    app = DudeApp()

    @app.save("bad")
    def bad(data, output):
        return False

    with pytest.raises(RuntimeError):
        dispatch_save(app.build_spec().save_rules, ROWS, format="bad")


def test_empty_data_skips():
    app = DudeApp()
    assert dispatch_save(app.build_spec().save_rules, [], format="json") is False


def test_yaml_roundtrip(tmp_path):
    import yaml

    out = tmp_path / "o.yaml"
    app = DudeApp()
    assert dispatch_save(app.build_spec().save_rules, ROWS, output=str(out))
    assert yaml.safe_load(out.read_text()) == ROWS
