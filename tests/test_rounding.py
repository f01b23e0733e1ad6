"""Unit oracles for the round-5 ADVICE fixes: _vec_round must equal
_py_round (correctly-rounded decimal == DuckDB round) element-for-
element including tie-adjacent values; _pivot_labels must sanitize
SQL-hostile event_type strings bijectively; the lapsed_customers cents
conversion must be half-away-from-zero like DuckDB round(x*100)."""

import numpy as np
import pyarrow as pa

from dude_ray.pipelines.relational import _pivot_labels, _py_round, _vec_round


def test_vec_round_matches_duckdb_bitwise():
    """_vec_round must be BITWISE DuckDB round(v, n) — including exact
    scaled-double .5 ties (half away from zero), signed zeros, the
    large-|y| spacing-1 region where a naive floor(|y|+0.5) diverges,
    and the overflow branch."""
    import duckdb

    rng = np.random.default_rng(3)
    vals = np.concatenate([
        rng.uniform(-1e6, 1e6, 300000),
        rng.uniform(-1e12, 1e12, 100000),
        rng.uniform(-1e-3, 1e-3, 50000),
        np.array([0.0000005, -0.0000005, 2.0000025, 1.0000005,
                  -2.0000015, 123.4567895, 1.5e-6, -0.0, 0.0,
                  1e300, -1e300]),
    ])
    for n in (2, 4, 6, 10):
        got = _vec_round(vals, n)
        want = duckdb.sql(
            f"SELECT round(v, {n}) AS r FROM (SELECT unnest(?) AS v)",
            params=[list(vals)]).fetchnumpy()["r"]
        assert np.array_equal(got.view(np.int64), want.view(np.int64)), n


def test_vec_round_equals_py_round_off_ties():
    """Away from exact scaled ties, DuckDB's scale-multiply round and
    Python's correctly-rounded decimal round agree — the contract the
    repo's 106 _py_round hash matches rest on."""
    rng = np.random.default_rng(7)
    vals = rng.uniform(-1e5, 1e5, 20000)
    got = _vec_round(vals, 6)
    want = _py_round(pa.array(vals), 6).to_numpy(zero_copy_only=False)
    assert np.array_equal(got, want)


def test_pivot_labels_sanitize_and_collide():
    types = ["click", "add to cart", "add-to-cart", "O'Brien; DROP",
             "add_to_cart"]
    labels = _pivot_labels(types)
    assert labels == ["n_click", "n_add_to_cart", "n_add_to_cart__2",
                      "n_O_Brien__DROP", "n_add_to_cart__3"]
    assert len(set(labels)) == len(types)
    for lbl in labels:
        assert lbl.replace("_", "a").isalnum()


def test_pivot_oracle_quotes_hostile_types(monkeypatch):
    """The generated SQL must stay parseable with quote-bearing types."""
    import duckdb

    from dude_ray.pipelines import relational

    monkeypatch.setattr(relational, "_event_type_domain",
                        lambda sf: ("O'Brien; DROP", "plain"))
    sql = relational.event_pivot_oracle_sql("/ignored")
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT 1 AS user_id, "
                "'plain' AS event_type")
    df = con.execute(sql).df()
    assert list(df.columns) == ["user_id", "n_O_Brien__DROP", "n_plain",
                                "n_total"]
    assert df.iloc[0].tolist() == [1, 0, 1, 1]


def test_cents_half_away_from_zero():
    """The exact conversion lapsed_customers applies, vs DuckDB."""
    import duckdb

    vals = np.array([1.005, -1.005, 2.675, -2.675, 0.005, -0.005, 3.14159])
    y = vals * 100.0
    cents = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
    want = duckdb.sql(
        "SELECT CAST(round(v * 100) AS BIGINT) FROM (SELECT unnest(?) AS v)",
        params=[list(vals)]).fetchnumpy()
    assert np.array_equal(cents, list(want.values())[0])
