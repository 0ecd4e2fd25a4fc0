"""Replicates the driver's correctness gate locally: run each Spark
query and its DuckDB oracle at sf0.01, compare row count + schema-ish +
order-insensitive values (columns sorted by name, rows sorted)."""

import math
import os


import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def run_oracle(sql: str):
    """Run the DuckDB oracle in a subprocess: duckdb's allocator fights the
    in-process JVM for commit space, so isolate it (the driver harness
    runs DuckDB separately too)."""
    import subprocess
    import sys
    import tempfile

    import pandas as pd

    with tempfile.TemporaryDirectory() as td:
        sql_path = os.path.join(td, "q.sql")
        out_path = os.path.join(td, "out.parquet")
        with open(sql_path, "w") as f:
            f.write(sql)
        views = "\n".join(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet');"
            for t in TABLES
            if os.path.exists(f"{SF_DIR}/{t}.parquet")
        )
        script = (
            "import duckdb\n"
            "con = duckdb.connect()\n"
            f"con.execute('''{views}''')\n"
            f"sql = open({sql_path!r}).read()\n"
            f"con.execute(f\"COPY ({{sql}}) TO '{out_path}' (FORMAT PARQUET)\")\n"
        )
        subprocess.run([sys.executable, "-c", script], check=True, capture_output=True)
        return pd.read_parquet(out_path)


def normalize(df_pandas):
    cols = sorted(df_pandas.columns)
    df = df_pandas[cols]
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append(None)
            elif isinstance(v, float):
                row.append(round(v, 6))
            elif hasattr(v, "item"):
                row.append(v.item() if not (isinstance(v.item(), float) and math.isnan(v.item())) else None)
            else:
                row.append(v)
        rows.append(tuple(row))
    return cols, sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare(spark, name, builder, sql):
    sdf = builder(spark, SF_DIR).toPandas()
    ddf = run_oracle(sql)
    scols, srows = normalize(sdf)
    dcols, drows = normalize(ddf)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    mismatches = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{srows[mismatches[0]]} vs {drows[mismatches[0]]}"
    )


def _all_queries():
    # the driver contract module aggregates every registered query —
    # importing it here keeps this rehearsal from drifting when a new
    # dataops module is added
    import __spark_entry__

    return __spark_entry__._all()


@pytest.mark.parametrize("name", sorted(_all_queries().keys()))
def test_oracle_parity(spark, name):
    builder, sql = _all_queries()[name]
    if sql is None:
        pytest.skip("rows-only query (no SQL oracle)")
    compare(spark, name, builder, sql)
