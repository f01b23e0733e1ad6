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


def test_cli_http_fetch_with_proxy(tmp_path):
    """--http-fetch + --proxy-server/-user/-pass
    (/root/reference/dude/__init__.py:150-162,222-235): the shaped
    proxy string routes every fetch through the proxy; the fake proxy
    answers with a page the rules extract from."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    seen = []

    class _Proxy(BaseHTTPRequestHandler):
        def log_message(self, *a):
            pass

        def do_GET(self):
            seen.append(self.path)
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(b'<div class="custom-group">'
                             b'<p class="title">VIA-PROXY</p></div>')

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Proxy)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    (tmp_path / "handlers.py").write_text(
        "import dude_ray as dude\n"
        "@dude.select(css='.title', group_css='.custom-group')\n"
        "def title(el):\n"
        "    return {'title': el.text_content()}\n")
    out = tmp_path / "out.csv"
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "dude_ray", "scrape",
             "--url", "http://origin.invalid/index.html",
             "--http-fetch",
             "--proxy-server", f"127.0.0.1:{srv.server_address[1]}",
             "--proxy-user", "u", "--proxy-pass", "s",
             "--output", str(out), "--num-cpus", "2",
             str(tmp_path / "handlers.py")],
            capture_output=True, text=True, cwd="/root/repo", timeout=180)
    finally:
        srv.shutdown()
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = list(csv.DictReader(open(out)))
    assert [r["title"] for r in rows] == ["VIA-PROXY"]
    assert seen == ["http://origin.invalid/index.html"]
