"""Deterministic synthetic web corpus — the engine's "internet".

Derived purely from the driver-provided ``documents`` table
(/root/testdata/sf*/documents.parquet, doc_id 0..n-1) + seed 42; no
external data, no wall clock.  One corpus row per source doc:

    doc_id    string   canonical URL (RFC 3986-normal by construction)
    spans     list<struct<kind,text,media_ref,offset>>  golden span seq
    html      string   dude.html-shaped page (input to the extractor)
    host      string   politeness / shuffle key
    part      int32    host-hash partition (fetch-lookup pruning key)
    src_id    int64    originating documents.doc_id

Page shape mirrors /root/reference/examples/dude.html: ``.custom-group``
divs with ``a.url``/``p.title`` and an optional ``p.description``
(/root/reference/tests/conftest.py:105-135 golden), plus nav links,
an optional ``img.thumb`` media span, a "Next Page" pagination link
(/root/reference/examples/dude.html:20) and raw text paragraphs.

The ``spans`` column is the *independent* ground truth for the
extractor: it is computed from the generator's internal structure
list, replicating dude's deterministic output ordering — rows sorted
by (page_number, group_index, group_id, element_index)
(/root/reference/dude/scraped_data.py:14-15) with group_id = the
sorted-distinct-group-selector ordinal.  For the flagship rule program
(see dude_ray.pipelines.flagship) that ordering concretely is:

    [nav links] [group 0: title,url,description?,image?] [next?]
    [text paras] [group 1: ...] ... [group G-1: ...]

because the distinct group selectors sort as ":root"(0) <
"css=.custom-group"(1) < "css=.pagination"(2) < "css=div.content"(3)
and nav/next/para rows all carry group_index 0.

Hosts get contiguous doc-id ranges with Zipf-skewed sizes (host 0 is
hot — the skew-handling test case).  Host membership is therefore a
pure function of (doc_id, n_docs) — no global inverse map is needed
to pick same-host link targets, which keeps generation a stateless
``map_batches`` over the documents table at any scale.
"""

from __future__ import annotations

import hashlib
import html as html_mod
import json
import os
import random
from bisect import bisect_right
from dataclasses import dataclass
from typing import Iterable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..canonical import host_shard

SEED = 42
CORPUS_VERSION = "v3"
DEFAULT_NUM_PARTS = 16


# --------------------------------------------------------------------------
# host topology (pure functions of n_docs)
# --------------------------------------------------------------------------

def num_hosts(n_docs: int) -> int:
    return max(4, n_docs // 50)


def host_boundaries(n_docs: int) -> list[int]:
    """Cumulative doc-count boundaries; host i owns [b[i], b[i+1]).
    Sizes ∝ 1/(i+1)^0.8 (heavy-tailed: host 0 is hot)."""
    h = num_hosts(n_docs)
    w = np.array([1.0 / (i + 1) ** 0.8 for i in range(h)])
    sizes = np.maximum(1, np.floor(w / w.sum() * n_docs).astype(int))
    # distribute the rounding remainder to the largest hosts
    deficit = n_docs - int(sizes.sum())
    for i in range(abs(deficit)):
        sizes[i % h] += 1 if deficit > 0 else -1
    bounds = [0]
    for s in sizes:
        bounds.append(bounds[-1] + int(s))
    bounds[-1] = n_docs
    return bounds


def host_of(doc_id: int, bounds: list[int]) -> int:
    return bisect_right(bounds, doc_id) - 1


def host_name(h: int) -> str:
    return f"h{h:04d}.test"


def url_for(doc_id: int, h: int) -> str:
    return f"https://{host_name(h)}/docs/{doc_id}.html"


def robots_txt_for(h: int) -> str:
    """Per-host robots rules (re-encodes the Disallow + Crawl-delay test
    /root/reference/tests/test_bs4.py:401-435 without network)."""
    if h % 23 == 4:
        return "User-agent: *\nDisallow: /\n"
    if h % 7 == 2:
        return "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n"
    if h % 7 == 6:
        return "User-agent: *\nDisallow: /private/\n"
    return ""


def seed_urls(n_docs: int, seed_every: int = 2) -> list[dict]:
    """Seeds = first doc of every ``seed_every``-th host (FIFO priority
    order).  allowed_domains is derived from these, as in
    /root/reference/dude/base.py:405 — unseeded hosts are reachable only
    via cross-links and get dropped by the domain filter.  The bench
    profile uses seed_every=1 (all hosts crawlable, shallow BFS)."""
    bounds = host_boundaries(n_docs)
    out = []
    for h in range(num_hosts(n_docs)):
        if h % seed_every == 0:
            out.append({"url": url_for(bounds[h], h), "method": "GET",
                        "priority": len(out)})
    return out


# --------------------------------------------------------------------------
# per-doc page generation
# --------------------------------------------------------------------------

@dataclass
class _PageStruct:
    groups: list[dict]      # {title, url_href, description|None, image|None}
    nav_links: list[tuple[str, str]]   # (anchor_text, href)
    next_href: Optional[str]
    paras: list[str]


def _build_struct(doc_id: int, text: str, n_docs: int, bounds: list[int]) -> _PageStruct:
    rng = random.Random(f"{SEED}:{doc_id}")
    h = host_of(doc_id, bounds)
    start_h, end_h = bounds[h], bounds[h + 1]
    words = text.split() or ["empty"]

    n_groups = rng.randint(2, 6)
    groups = []
    for g in range(n_groups):
        t = start_h + rng.randrange(end_h - start_h)
        w0 = (g * 7) % len(words)
        desc = " ".join(words[w0:w0 + 16]) if rng.random() < 0.7 else None
        image = f"/media/{doc_id}_{g}.png" if rng.random() < 0.4 else None
        groups.append({
            "title": f"Title {doc_id}-{g}",
            "url_href": f"/docs/{t}.html",
            "description": desc,
            "image": image,
        })

    n_links = rng.randint(3, 8)
    nav_links = []
    for i in range(n_links):
        roll = rng.random()
        if roll < 0.60:  # same host
            t = start_h + rng.randrange(end_h - start_h)
            href = f"/docs/{t}.html"
        elif roll < 0.80:  # cross host (absolute URL)
            t = rng.randrange(n_docs)
            href = url_for(t, host_of(t, bounds))
        elif roll < 0.90:  # robots-disallowed path
            href = f"/private/{rng.randrange(n_docs)}.html"
        else:  # dead link
            href = f"/docs/dead-{rng.randrange(10 ** 6)}.html"
        nav_links.append((f"Nav {doc_id}-{i}", href))

    next_href = None
    if (doc_id - start_h) % 4 != 3 and doc_id + 1 < end_h:
        next_href = f"/docs/{doc_id + 1}.html"

    n_paras = rng.randint(2, 6)
    paras = []
    for p in range(n_paras):
        w0 = (p * 13) % len(words)
        paras.append(" ".join(words[w0:w0 + 24]))
    return _PageStruct(groups, nav_links, next_href, paras)


def _render_html(doc_id: int, s: _PageStruct) -> str:
    esc = html_mod.escape
    parts = [
        "<!DOCTYPE html>",
        '<html lang="en">',
        f"<head><meta charset=\"UTF-8\"><title>Doc {doc_id}</title></head>",
        "<body>",
        "<div class=\"navbar\">",
    ]
    for text, href in s.nav_links:
        parts.append(f'    <a class="nav" href="{esc(href)}">{esc(text)}</a>')
    parts.append("</div>")
    for g in s.groups:
        parts.append('<div class="custom-group">')
        parts.append(
            f'    <a class="url" href="{esc(g["url_href"])}"><p class="title">{esc(g["title"])}</p></a>'
        )
        if g["description"] is not None:
            parts.append(f'    <p class="description">{esc(g["description"])}</p>')
        if g["image"] is not None:
            parts.append(f'    <img class="thumb" src="{esc(g["image"])}">')
        parts.append("</div>")
    if s.next_href is not None:
        parts.append(
            f'<div class="pagination"><a class="next" href="{esc(s.next_href)}">Next Page</a></div>'
        )
    parts.append('<div class="content">')
    for p in s.paras:
        parts.append(f'    <p class="para">{esc(p)}</p>')
    parts.append("</div>")
    parts.append("</body></html>")
    return "\n".join(parts)


def _golden_spans(s: _PageStruct) -> list[dict]:
    """Expected extractor output for the flagship rule program — see the
    module docstring for the ordering derivation."""
    spans: list[dict] = []

    def add(kind: str, text: str, ref: str = "") -> None:
        spans.append({"kind": kind, "text": text, "media_ref": ref,
                      "offset": len(spans)})

    def add_group(g: dict) -> None:
        add("title", g["title"])
        add("url", g["title"], g["url_href"])   # a.url text_content == title
        if g["description"] is not None:
            add("description", g["description"])
        if g["image"] is not None:
            add("image", "", g["image"])

    for text, href in s.nav_links:
        add("link", text, href)
    if s.groups:
        add_group(s.groups[0])
    if s.next_href is not None:
        add("next", "Next Page", s.next_href)
    for p in s.paras:
        add("text", p)
    for g in s.groups[1:]:
        add_group(g)
    return spans


def media_payload(media_ref: str) -> bytes:
    """Deterministic fake media bytes (no codecs in this container; the
    decode stage is a stub over these — see dude_ray.stages.multimodal)."""
    d = hashlib.blake2b(media_ref.encode(), digest_size=32).digest()
    n = 256 + d[0] * 8  # 256..2296 bytes
    reps = (n + len(d) - 1) // len(d)
    return (d * reps)[:n]


def generate_batch(batch: pa.Table, n_docs: int, num_parts: int,
                   scale: int = 1) -> pa.Table:
    """map_batches kernel: documents rows → corpus rows (stateless; all
    topology is a pure function of (virtual doc id, n_docs*scale)).

    ``scale`` expands each source doc into ``scale`` virtual pages
    (virtual id = doc_id*scale + j, same text, different seeded page
    structure) so the bench corpus can be sized independently of the
    driver table while staying deterministic."""
    from ..stages.extract import SPANS_TYPE, spans_to_arrow

    n_virtual = n_docs * scale
    bounds = host_boundaries(n_virtual)
    in_ids = batch["doc_id"].to_pylist()
    in_texts = batch["text"].to_pylist()
    src_ids, texts = [], []
    for d, t in zip(in_ids, in_texts):
        for j in range(scale):
            src_ids.append(d * scale + j)
            texts.append(t)
    urls, spans_col, htmls, hosts, parts = [], [], [], [], []
    media_refs_col = []
    for doc_id, text in zip(src_ids, texts):
        h = host_of(doc_id, bounds)
        s = _build_struct(doc_id, text or "", n_virtual, bounds)
        urls.append(url_for(doc_id, h))
        spans_col.append(_golden_spans(s))
        htmls.append(_render_html(doc_id, s))
        hosts.append(host_name(h))
        parts.append(host_shard(host_name(h), num_parts))
        media_refs_col.append([g["image"] for g in s.groups if g["image"] is not None])
    return pa.table({
        "doc_id": pa.array(urls, type=pa.string()),
        "spans": spans_to_arrow(spans_col),
        "html": pa.array(htmls, type=pa.string()),
        "host": pa.array(hosts, type=pa.string()),
        "part": pa.array(parts, type=pa.int32()),
        "src_id": pa.array(src_ids, type=pa.int64()),
        "media_refs": pa.array(media_refs_col, type=pa.list_(pa.string())),
    })


# --------------------------------------------------------------------------
# corpus build + cache
# --------------------------------------------------------------------------

def corpus_dir_for(sf_dir: str, base: str = "/tmp/dude_ray_corpus",
                   scale: int = 1, seed_every: int = 2,
                   num_parts: int = DEFAULT_NUM_PARTS) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(base,
                        f"{tag}-{CORPUS_VERSION}-x{scale}-e{seed_every}-p{num_parts}")


def ensure_corpus(sf_dir: str, out_dir: Optional[str] = None,
                  num_parts: int = DEFAULT_NUM_PARTS, scale: int = 1,
                  seed_every: int = 2) -> str:
    """Generate (once, cached — generation is deterministic) the corpus
    for an sf dir.  Runs as a Ray Data pipeline: read documents →
    stateless map_batches → parquet partitioned by fetch-lookup ``part``
    so a fetch for one host-hash range touches one directory."""
    import ray.data as rd

    out_dir = out_dir or corpus_dir_for(sf_dir, scale=scale, seed_every=seed_every,
                                        num_parts=num_parts)
    manifest_path = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(manifest_path):
        return out_dir
    n_src = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    n_docs = n_src * scale
    # build into a temp sibling and rename into place (same atomic-commit
    # pattern as crawl round dirs): an interrupted build can never leave
    # partial parquet that a retry would then append to and the manifest
    # check would cache permanently
    import shutil
    tmp_dir = out_dir + ".build"
    if os.path.exists(tmp_dir):
        shutil.rmtree(tmp_dir)
    os.makedirs(tmp_dir)
    from dude_ray.io import read_parquet_clean

    ds = read_parquet_clean(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
    ds = ds.map_batches(generate_batch, batch_format="pyarrow", batch_size=512,
                        fn_kwargs={"n_docs": n_src, "num_parts": num_parts,
                                   "scale": scale})
    ds.write_parquet(os.path.join(tmp_dir, "web"), partition_cols=["part"])

    robots = [{"host": host_name(h), "robots_txt": robots_txt_for(h)}
              for h in range(num_hosts(n_docs))]
    with open(os.path.join(tmp_dir, "robots.json"), "w") as f:
        json.dump(robots, f)
    with open(os.path.join(tmp_dir, "seeds.json"), "w") as f:
        json.dump(seed_urls(n_docs, seed_every), f)
    with open(os.path.join(tmp_dir, "MANIFEST.json"), "w") as f:
        json.dump({"sf_dir": sf_dir, "n_docs": n_docs, "num_parts": num_parts,
                   "num_hosts": num_hosts(n_docs), "version": CORPUS_VERSION,
                   "scale": scale, "seed_every": seed_every}, f)
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.rename(tmp_dir, out_dir)
    return out_dir


def load_manifest(corpus_dir: str) -> dict:
    with open(os.path.join(corpus_dir, "MANIFEST.json")) as f:
        return json.load(f)


def load_robots(corpus_dir: str) -> dict[str, str]:
    with open(os.path.join(corpus_dir, "robots.json")) as f:
        return {r["host"]: r["robots_txt"] for r in json.load(f)}


def load_seeds(corpus_dir: str) -> list[dict]:
    with open(os.path.join(corpus_dir, "seeds.json")) as f:
        return json.load(f)
