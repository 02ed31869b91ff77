"""Local replica of the driver's correctness gate: run every catalog
query on Spark AND its oracle SQL on DuckDB over the same parquet,
compare row count, column names, and order-insensitive values.

This is the test that makes CORRECTNESS_r{N}.json green before the
driver ever runs.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from coinbase_data_pipeline_spark.plans.registry import (
    ALL_ORACLES as ORACLE_SQL,
    ALL_QUERIES as SPARK_QUERIES,
)
from coinbase_data_pipeline_spark.sources.tables import TABLES

import os

# default: fast sf0.001; set SPARK_GRAFT_PARITY_SF_DIR=/root/testdata/sf0.01
# to replicate the driver's exact scale
SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR",
                        "/root/testdata/sf0.001")


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, cols):
    """Sort columns by name, stringify values (floats pre-rounded by the
    queries themselves), sort rows — order-insensitive comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = f"{v:.6f}"
            vals.append(str(v))
        out.append(tuple(vals))
    out.sort()
    return out


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_oracle_parity(spark, name):
    sdf = SPARK_QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    con = duck_con(SF_DIR)
    # ONE oracle execution: the Arrow table serves both the schema
    # guard and the row comparison (running the SQL twice doubled
    # oracle runtime across ~107 parametrized tests).
    arrow = con.execute(ORACLE_SQL[name]).arrow()
    # Guard the HUGEINT bug class: DuckDB's sum(INTEGER) returns
    # HUGEINT, which Arrow surfaces as decimal128 — a type Spark never
    # produces, so the driver's value-hash diverges even when every
    # value matches (cost a driver row in rounds 1 AND 2). Python-level
    # stringification hides it (int vs int), so check the Arrow schema.
    import pyarrow.types as pat
    for field in arrow.schema:
        assert not pat.is_decimal(field.type), (
            f"{name}: oracle column {field.name} is {field.type} "
            f"(DuckDB HUGEINT?) — CAST it to BIGINT/DOUBLE in the SQL")
    dcols = arrow.column_names
    drows = list(zip(*(c.to_pylist() for c in arrow.columns))) \
        if arrow.num_rows else []

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    s_norm = normalize([tuple(r) for r in srows], scols)
    d_norm = normalize(drows, dcols)
    mismatches = [(a, b) for a, b in zip(s_norm, d_norm) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_have_rows(spark):
    """Every query must return rows at this scale — a 0-row result
    passes 0==0 parity trivially, so emptiness is its own failure.

    On a FUZZED dir (SPARK_GRAFT_PARITY_SF_DIR override) emptiness
    can be legitimate data dependence — e.g. a 55% independent TPC-H
    subsample breaks q5's four-table join chain, a 400-event corpus
    has no 3-step event paths. There the contract weakens to
    "emptiness must AGREE with the oracle": a one-sided 0 still
    fails, an agreed 0 is recorded, the real-testdata gate stays
    strict."""
    fuzzed = "SPARK_GRAFT_PARITY_SF_DIR" in os.environ \
        and not SF_DIR.startswith("/root/testdata/")
    con = duck_con(SF_DIR) if fuzzed else None
    agreed_empty = []
    for name, fn in SPARK_QUERIES.items():
        n = fn(spark, SF_DIR).count()
        if n == 0 and fuzzed and name in ORACLE_SQL:
            n_oracle = len(con.execute(ORACLE_SQL[name]).fetchall())
            assert n_oracle == 0, (
                f"{name}: Spark empty but oracle has {n_oracle} rows "
                f"at {SF_DIR}")
            agreed_empty.append(name)
            continue
        assert n > 0, f"{name} returned 0 rows at {SF_DIR}"
    if agreed_empty:
        print(f"agreed-empty on fuzzed dir: {agreed_empty}")
