"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 and compare against oracle_sql() via DuckDB — row count, column names,
and exact values after name-sorted columns and row sorting."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _canon_rows(cols, rows):
    import decimal

    def norm(v):
        # Type-tagged: Python's cross-type numeric equality (Decimal('730.00')
        # == 730.0) let round-2's q18 decimal-vs-double mismatch pass pytest
        # while the driver's value-hash (type-sensitive) failed it.  Tagging
        # the numeric class makes this mirror as strict as the driver.
        if isinstance(v, bool):
            return ("b", v)
        if isinstance(v, float):
            return ("f", round(v, 9))
        if isinstance(v, decimal.Decimal):
            return ("d", v)
        if isinstance(v, int):
            return ("i", v)
        return ("o", v)

    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # repr-keyed sort: null-safe (ROLLUP rows carry None group keys) and
    # applied identically to both engines' rows.
    return sorted((tuple(norm(r[i]) for i in idx) for r in rows), key=repr)


QUERY_NAMES = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(s_rows) > 0, f"{name}: rows-only check failed (0 rows)"
        return

    ores = duck.sql(sql)
    o_cols = ores.columns
    o_rows = [tuple(r) for r in ores.fetchall()]

    assert sorted(s_cols) == sorted(o_cols), f"{name}: column mismatch {s_cols} vs {o_cols}"
    assert len(s_rows) == len(o_rows), f"{name}: row count {len(s_rows)} vs {len(o_rows)}"
    sc = _canon_rows(s_cols, s_rows)
    oc = _canon_rows(o_cols, o_rows)
    mismatches = [(a, b) for a, b in zip(sc, oc) if a != b][:5]
    assert sc == oc, f"{name}: value mismatch, first diffs: {mismatches}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert len(rows) > 0
    assert set(df.columns) == {"doc_id", "status", "n_spans", "heading_text", "body_text"}
