"""Hardware scaling probe: runs the ACTUAL per-URL kernel (parse +
extract + link canon) on identical inputs in 6 vs 24 concurrent
processes (the crawl's worker counts at 8 vs 32 CPUs) with NO Ray, no
shuffles, no coordination — pure embarrassingly-parallel work.  The
per-doc wall time ratio between the two levels is this box's
memory-bus ceiling for the workload; any engine-level scaling loss
comes on top of it.  Prints one JSON line.

    python tools/hw_probe.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _work(args) -> float:
    """Parse+extract+links over the doc set; returns per-doc seconds."""
    htmls, n_iter = args
    from dude_ray.htmlparser import parse_html
    from dude_ray.pipelines.flagship import flagship_rules
    from dude_ray.stages.extract import _CompiledRules, extract_all, rows_to_spans
    from dude_ray.stages.links import collect_links

    comp = _CompiledRules(list(flagship_rules()))
    t0 = time.time()
    n = 0
    for _ in range(n_iter):
        for i, h in enumerate(htmls):
            url = f"https://h{i % 7:04d}.test/docs/{i}.html"
            dom = parse_html(h)
            rows_to_spans(extract_all(comp, dom, url))
            collect_links(dom, url)
            n += 1
    return (time.time() - t0) / n


def level(nproc: int, htmls, n_iter: int) -> float:
    with mp.Pool(nproc) as pool:
        per_doc = pool.map(_work, [(htmls, n_iter)] * nproc)
    return sum(per_doc) / len(per_doc)


def probe() -> dict:
    """Run both levels; returns the probe dict (importable — bench.py
    embeds this line in its output so every BENCH file carries its own
    window-health evidence: the ABSOLUTE µs/doc flags uniformly slow
    windows, the lo/hi ratio flags memory-bus saturation)."""
    from dude_ray.sources.corpus import ensure_corpus, load_manifest
    from dude_ray.stages.fetch import CorpusFetcher

    cd = ensure_corpus("/root/testdata/sf0.01", scale=1, seed_every=2)
    f = CorpusFetcher(cd, load_manifest(cd)["num_parts"])
    import pyarrow.dataset as pads

    urls = pads.dataset(f"{cd}/web", partitioning="hive").to_table(
        columns=["doc_id"])["doc_id"].to_pylist()
    htmls = f.lookup(urls)
    lo_w, hi_w = (int(os.environ.get("PROBE_LO", "6")),
                  int(os.environ.get("PROBE_HI", "24")))
    # equal per-process work at both levels
    t_lo = level(lo_w, htmls, 6)
    t_hi = level(hi_w, htmls, 6)
    return {
        "metric": "hardware ceiling probe (pure-parallel per-doc kernel)",
        "workers_lo": lo_w, "workers_hi": hi_w,
        "us_per_doc_lo": round(t_lo * 1e6, 1),
        "us_per_doc_hi": round(t_hi * 1e6, 1),
        "slowdown": round(t_hi / t_lo, 3),
        "hw_efficiency_ceiling": round(t_lo / t_hi, 3),
    }


def main() -> None:
    print(json.dumps(probe()))


if __name__ == "__main__":
    main()
