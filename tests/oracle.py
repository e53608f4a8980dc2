"""Local replica of the driver's differential gate.

The driver canonicalizes BOTH the Spark result and the DuckDB oracle
result through pandas: columns sorted by name, ``sort_values`` over all
columns, then a value-hash over str-rendered cells. Two consequences we
deliberately reproduce here (round-1/2 postmortems):

* list/array-valued output columns make ``sort_values`` raise
  ``TypeError: unhashable type: 'list'`` — a query that returns an array
  column MUST fail the local gate too (render arrays as joined strings
  in the workload instead);
* DuckDB HUGEINT/nullable ints surface in pandas as float64 and render
  ``"50.0"`` while a Spark long renders ``"50"`` — a mismatch the old
  ``fetchall``-based normalizer hid.
"""

from __future__ import annotations

import os

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon(pdf):
    """Driver-faithful canonical form: sort columns by name, sort rows by
    all columns (raises on unhashable cells, exactly like the driver's
    canonicalizer), then str-render every cell."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort")
    return [
        tuple(str(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]


def compare(spark_df, con, sql: str):
    """Return (ok, detail) comparing the Spark result with the oracle."""
    s_pdf = spark_df.toPandas()
    d_pdf = con.execute(sql).df()

    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return False, (
            f"column mismatch: spark={sorted(s_pdf.columns)} "
            f"duck={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        return False, f"row count: spark={len(s_pdf)} duck={len(d_pdf)}"
    try:
        sn = _canon(s_pdf)
    except TypeError as e:  # unhashable (array) output column
        return False, f"spark result not canonicalizable (driver would err): {e}"
    try:
        dn = _canon(d_pdf)
    except TypeError as e:
        return False, f"oracle result not canonicalizable (driver would err): {e}"
    if sn != dn:
        diff = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_pdf)} rows)"
