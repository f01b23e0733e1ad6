"""CLI parity test (/root/reference/dude/__init__.py:49-249 analog)."""

import csv
import subprocess
import sys


def test_cli_scrape_local_file(tmp_path):
    (tmp_path / "index.html").write_text(
        '<div class="custom-group"><a class="url" href="u1.html">'
        '<p class="title">T1</p></a></div>')
    (tmp_path / "handlers.py").write_text(
        "import dude_ray as dude\n"
        "@dude.select(css='.title', group_css='.custom-group')\n"
        "def title(el):\n"
        "    return {'title': el.text_content()}\n")
    out = tmp_path / "out.csv"
    proc = subprocess.run(
        [sys.executable, "-m", "dude_ray", "scrape",
         "--url", f"file://{tmp_path}/index.html",
         "--output", str(out), "--num-cpus", "2",
         str(tmp_path / "handlers.py")],
        capture_output=True, text=True, cwd="/root/repo", timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = list(csv.DictReader(open(out)))
    assert [r["title"] for r in rows] == ["T1"]
