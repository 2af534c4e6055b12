"""Force the gated SHUFFLE paths of size-gated queries at sf0.001 and
compare against the same DuckDB oracles — the driver tiers are all below
the gates, so without this the distributed variants would ship untested."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from etl_rs_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing")

# queries whose plans change shape above the size gates (inline
# _table_rows / _docs_small checks in pipelines/queries.py)
GATED = [
    "docs_exact_dedup",
    "customer_order_revenue",
    "orders_topk_per_customer",
    "docs_minhash_dedup",
    "docs_simhash_dedup",
    "docs_decontaminate",
    "q3_shipping_priority",
    "q5_regional_supplier_volume",
    "parts_fuzzy_pairs",
    "events_window_distinct_users",
    "events_cumulative_users",
    # r5: keyed-shuffle fold tiers for the unbounded-domain partial_folds
    "orders_integrity_audit",
    "events_mode_value",
    "events_entropy",
    "events_user_set_ops",
    "events_profile",
    # late r5: Q13/Q17/Q19 shapes — keyed-shuffle histogram merge,
    # tagged-union join-back, keyed_lookup_join dimension attach
    "orders_count_histogram",
    "parts_low_quantity_revenue",
    "parts_brand_promo_revenue",
    "orders_priority_exists",
    "orders_large_volume",
    "q10_returned_revenue",
    "q14_promo_revenue_share",
    "q22_idle_balance",
    "q7_nation_volume",
]


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(None if math.isnan(v) else round(v, 6))
            elif pd.isna(v):
                canon_row.append(None)
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", GATED)
def test_big_path_matches_oracle(name, monkeypatch):
    real_rows = q._table_rows

    # every gate compares _table_rows / _docs_small against a constant;
    # pretending the tables are huge flips ALL of them to the shuffle
    # paths (partition sizing also uses _table_rows — capped, harmless)
    monkeypatch.setattr(q, "_table_rows", lambda sf, t: 10_000_000)
    monkeypatch.setattr(q, "_docs_small", lambda sf, threshold=200_000: False)

    import pyarrow as pa
    import ray.data

    res = q.QUERIES[name](SF)
    if isinstance(res, ray.data.Dataset):
        got = res.to_pandas()
    elif isinstance(res, pa.Table):
        got = res.to_pandas()
    else:
        got = res

    monkeypatch.setattr(q, "_table_rows", real_rows)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    want = con.execute(entry_mod.oracle_sql()[name]).fetchdf()
    assert sorted(got.columns) == sorted(want.columns)
    assert len(got) == len(want), f"rows: got {len(got)} want {len(want)}"
    assert _canon(got) == _canon(want)
