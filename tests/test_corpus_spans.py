"""Span-sequence equality — the engine's correctness gate: the Arrow
extractor run over the generated HTML must reproduce the corpus's
independently derived golden ``spans`` column byte-for-byte
(kind, text, media_ref, order)."""

import pyarrow.parquet as pq
import pytest

from dude_ray.pipelines.flagship import flagship_rules
from dude_ray.sources.corpus import (
    generate_batch,
    host_boundaries,
    host_of,
    num_hosts,
    seed_urls,
)
from dude_ray.stages.extract import SpanExtractor

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_batch():
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return generate_batch(t, n_docs=t.num_rows, num_parts=16)


def test_span_equality_all_docs(corpus_batch):
    """Extractor(html) == golden spans for every sf0.001 document."""
    extractor = SpanExtractor(rules=flagship_rules())
    out = extractor(corpus_batch.select(["doc_id", "html"]))
    got = out["spans"].to_pylist()
    want = corpus_batch["spans"].to_pylist()
    ids = corpus_batch["doc_id"].to_pylist()
    for i, (g, w) in enumerate(zip(got, want)):
        assert g == w, f"span mismatch for {ids[i]}: got {g[:4]}... want {w[:4]}..."
    assert len(got) == corpus_batch.num_rows


def test_generation_deterministic(corpus_batch):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    again = generate_batch(t, n_docs=t.num_rows, num_parts=16)
    assert again.equals(corpus_batch)


def test_host_topology():
    n = 500
    bounds = host_boundaries(n)
    assert bounds[0] == 0 and bounds[-1] == n
    assert len(bounds) == num_hosts(n) + 1
    sizes = [bounds[i + 1] - bounds[i] for i in range(len(bounds) - 1)]
    assert all(s >= 1 for s in sizes)
    assert sizes[0] == max(sizes)  # host 0 is the hot host
    assert host_of(0, bounds) == 0
    assert host_of(n - 1, bounds) == num_hosts(n) - 1


def test_seeds_are_even_hosts():
    seeds = seed_urls(500)
    assert len(seeds) == (num_hosts(500) + 1) // 2
    assert all(s["url"].startswith("https://h") for s in seeds)
    hosts = [s["url"].split("/")[2] for s in seeds]
    assert all(int(h[1:5]) % 2 == 0 for h in hosts)


def test_spans_cover_all_kinds(corpus_batch):
    kinds = {s["kind"] for spans in corpus_batch["spans"].to_pylist() for s in spans}
    assert kinds == {"title", "url", "description", "image", "link", "next", "text"}


def test_scaled_corpus_span_equality():
    """The scale knob (virtual pages per source doc) preserves the
    extractor-vs-golden contract."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    small = t.slice(0, 50)
    batch = generate_batch(small, n_docs=50, num_parts=8, scale=3)
    assert batch.num_rows == 150
    ex = SpanExtractor(rules=flagship_rules())
    out = ex(batch.select(["doc_id", "html"]))
    assert out["spans"].to_pylist() == batch["spans"].to_pylist()
    # virtual ids partition hosts over n_docs*scale
    assert len(set(batch["host"].to_pylist())) >= 4


def test_extract_spans_local_oracle(ray_session):
    """The exploded flagship extraction equals the DuckDB
    skeleton+text-window recompute at sf0.001 span-for-span (the
    rows-only -> SQL-checked upgrade): literal spans from the inlined
    rng skeleton, description/paragraph text rebuilt in SQL from
    documents.text."""
    import duckdb
    import pandas as pd

    import __ray_entry__ as entry
    from dude_ray.pipelines.flagship import extract_spans_oracle_sql

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    cols = ["doc_id", "kind", "text", "media_ref", "offset"]
    want = (con.execute(extract_spans_oracle_sql(sf)).df()
            .sort_values(["doc_id", "offset"]).reset_index(drop=True)
            [cols])
    got = (entry.queries()["extract_spans"](sf).to_pandas()
           .sort_values(["doc_id", "offset"]).reset_index(drop=True)
           [cols])
    assert len(want) > 10000
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
