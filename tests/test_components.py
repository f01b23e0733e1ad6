"""Connected components + BFS depth: tier equivalence and DuckDB
recursive-CTE oracle equality at sf0.001."""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{SF}/documents.parquet')")
    return con


def test_link_components_local_oracle(ray_session):
    """(node, component) equals the DuckDB reachability-closure
    recompute; every corpus page appears exactly once; component ids
    are members of their own component."""
    from dude_ray.pipelines.components import (link_components_oracle_sql,
                                               run_link_components)

    want = _con().execute(link_components_oracle_sql(SF)).df() \
        .reset_index(drop=True)
    got = run_link_components(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    assert got["node"].is_unique
    comp_ids = set(got["component"])
    assert comp_ids <= set(got["node"])
    # a component id labels itself
    self_rows = got[got["node"].isin(comp_ids)]
    assert (self_rows["node"] == self_rows["component"]).all()


def test_link_components_tiers_agree(ray_session):
    """Driver union-find tier == distributed min-label-propagation
    tier (local_threshold=0 forces the scale path)."""
    from dude_ray.pipelines.components import run_link_components

    small = run_link_components(SF).to_pandas().reset_index(drop=True)
    dist = run_link_components(SF, local_threshold=0) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, small, check_dtype=False,
                                  check_exact=True)


def test_link_depth_local_oracle(ray_session):
    """BFS depths equal the DuckDB bounded recursive-CTE BFS; seeds
    are at depth 0 and every non-seed reachable node has a parent one
    hop shallower."""
    from dude_ray.pipelines.components import (link_depth_oracle_sql,
                                               run_link_depth)

    want = _con().execute(link_depth_oracle_sql(SF)).df() \
        .reset_index(drop=True)
    got = run_link_depth(SF).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
    assert (got["depth"] >= 0).all()
    assert (got["depth"] == 0).any()


def test_link_depth_tiers_agree(ray_session):
    """Driver BFS tier == distributed Bellman-Ford tier."""
    from dude_ray.pipelines.components import run_link_depth

    small = run_link_depth(SF).to_pandas().reset_index(drop=True)
    dist = run_link_depth(SF, local_threshold=0) \
        .to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, small, check_dtype=False,
                                  check_exact=True)
