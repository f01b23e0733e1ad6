"""Registry invariants for the driver gate: every oracle has a query,
the 50-slot gate window is maximally SQL-verified, and entries are
callable with one sf_dir argument."""

import inspect


def _entry_module():
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "entry_mod",
        str(Path(__file__).resolve().parent.parent / "__ray_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_registry_consistency():
    m = _entry_module()
    q = m.queries()
    o = m.oracle_sql()
    assert set(o) <= set(q), "oracle without a queries() entry"
    assert len(q) >= 79
    # the driver records only the first 50 entries: all of them must
    # be SQL-oracled EXCEPT the documented rows-only crawl/extract ops
    first50 = list(q)[:50]
    # anchor_texts joins the r5 window per VERDICT_r04 "Next round" #1
    # (it is HTML-extraction-derived, hence rows-only like the crawl
    # entries); crawl_visits/extract_spans join it because the r5
    # adblock/fetch/scraper changes touch their code path and the
    # driver record should re-verify changed paths; substring_redact
    # is pytest-oracled by design.
    rows_only_allowed = {"substring_redact", "anchor_texts",
                         "crawl_visits", "extract_spans"}
    not_oracled = [k for k in first50 if k not in o]
    assert set(not_oracled) <= rows_only_allowed, not_oracled
    # the 21 never-driver-verified entries (VERDICT_r04) lead the gate
    assert first50[:21] == [
        "dataset_split", "dup_rate_by_source", "editdist_neardup",
        "shipping_priority", "knn_triangles", "events_lag_diff",
        "events_rolling", "revenue_by_nation", "qty_rollup",
        "cheapest_part", "priority_semijoin", "lapsed_customers",
        "user_top_event", "event_pivot", "event_transitions",
        "kmeans_assign", "label_centroids", "events_hopping_window",
        "value_percent_rank", "bloom_registers", "anchor_texts"]
    # every registered callable takes exactly one required positional
    for k, fn in q.items():
        params = [p for p in inspect.signature(fn).parameters.values()
                  if p.default is inspect.Parameter.empty
                  and p.kind in (p.POSITIONAL_ONLY,
                                 p.POSITIONAL_OR_KEYWORD)]
        assert len(params) == 1, (k, params)
