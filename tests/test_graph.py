"""Distributed PageRank vs a single-process numpy power iteration."""

from __future__ import annotations

import numpy as np

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_reference(ray_session):
    from dude_ray.pipelines.graph import (link_edges, pagerank_reference,
                                          run_pagerank)

    pr = run_pagerank(SF, iters=6).to_pandas()
    edges, nodes = link_edges(SF)
    el = [(r["src"], r["dst"]) for r in edges.take_all()]
    nl = [r["node"] for r in nodes.take_all()]
    assert len(pr) == len(nl)
    # probability distribution over all corpus pages
    assert abs(pr["rank"].sum() - 1.0) < 1e-9
    assert (pr["rank"] > 0).all()
    ref = pagerank_reference(el, nl, iters=6)
    got = dict(zip(pr["node"], pr["rank"]))
    assert max(abs(got[n] - ref[n]) for n in nl) < 1e-12


def test_pagerank_prefers_linked_pages(ray_session):
    """Pages with incoming links must outrank the dangling floor."""
    from dude_ray.pipelines.graph import link_edges, run_pagerank

    pr = run_pagerank(SF, iters=6).to_pandas()
    edges, _nodes = link_edges(SF)
    linked = {r["dst"] for r in edges.take_all()}
    got = pr.set_index("node")["rank"]
    floor = got[~got.index.isin(linked)]
    if len(floor) and len(linked):
        assert got[got.index.isin(linked)].mean() > floor.mean()
        assert np.isclose(floor.to_numpy(), floor.iloc[0]).all()
