"""Mirror the driver's correctness gate locally: run every queries() entry
at sf0.001 and compare row count + schema + order-insensitive values with
the DuckDB oracle_sql()."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

pytestmark = [
    pytest.mark.sweep,
    pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing"),
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append(None)
                else:
                    canon_row.append(round(v, 6))
            elif pd.isna(v):
                canon_row.append(None)
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle(name):
    fn = entry_mod.queries()[name]
    got = _to_pandas(fn(SF))
    con = _duck()
    want = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns), (sorted(got.columns), sorted(want.columns))
    assert len(got) == len(want), f"rows: got {len(got)} want {len(want)}"
    assert _canon(got) == _canon(want)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_oracle_emits_no_decimal_or_unsigned(name):
    """Guard against the r3 driver-red class: DuckDB SUM(BIGINT) returns
    HUGEINT, which pyarrow surfaces as decimal128 and the driver's value
    hash then distinguishes Decimal("120") from 120 even when every value
    matches. Every oracle output column must be a plain signed-int / float /
    string / bool / timestamp type — never decimal or unsigned."""
    import pyarrow as pa

    con = _duck()
    tbl = con.execute(entry_mod.oracle_sql()[name]).fetch_arrow_table()
    bad = {
        f.name: str(f.type)
        for f in tbl.schema
        if pa.types.is_decimal(f.type) or pa.types.is_unsigned_integer(f.type)
    }
    assert not bad, (
        f"oracle {name} emits decimal/unsigned columns {bad}; "
        "wrap the expression in CAST(... AS BIGINT)"
    )


def test_every_query_has_an_oracle():
    """No rows-only queries remain: every pipeline the driver runs is
    hash-checked against a DuckDB oracle."""
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())


def test_entry_smoke():
    table = entry_mod.entry()
    assert table.num_rows > 0
    assert {"repo", "path", "commit", "lang", "content"} <= set(table.column_names)
