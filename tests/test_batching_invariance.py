"""Batching/fold-order invariance: a query's result must not depend on
how the input happens to be split into blocks. Two real bugs escaped the
oracle sweeps because the default block layout masked them (a float32
squash of int64 partial sums; winnow fingerprints leaking across batch
neighbors) — this sweep re-runs the fold-heavy queries with the read
blocks forced tiny and asserts bit-identical canonical results."""

import math
import os

import pandas as pd
import pytest

import __ray_entry__ as entry_mod
from etl_rs_ray.pipelines import queries as q

SF = "/root/testdata/sf0.001"

pytestmark = [
    pytest.mark.sweep,
    pytest.mark.skipif(not os.path.isdir(SF), reason="testdata missing"),
]

# queries whose plans carry per-batch partials / folds / float finals —
# the surface where batch composition could leak into the result
FOLD_HEAVY = [
    "q1_pricing_summary",
    "orders_rollup",
    "orders_cube",
    "events_value_corr",
    "events_value_regression",
    "events_winsorized_stats",
    "events_profile",
    "events_mode_value",
    "events_entropy",
    "events_chi_square",
    "events_percentile_cont",
    "events_quantiles_by_type",
    "events_time_histogram",
    "events_user_set_ops",
    "events_gap_histogram",
    "events_table_digest",
    "events_sketch_stats",
    "events_cms_frequencies",
    "events_distinct_users_by_type",
    "embeddings_group_centroids",
    "embeddings_dim_stats",
    "embeddings_cov_block",
    "docs_top_tokens",
    "docs_tfidf_top_terms",
]


class _TinyBlocks(dict):
    """Any table reads at ~100 rows per block."""

    def get(self, key, default=None):
        return 100


def _canon(df: pd.DataFrame):
    df = df[sorted(df.columns)]
    rows = []
    for row in df.itertuples(index=False):
        canon_row = []
        for v in row:
            if isinstance(v, float):
                canon_row.append(None if math.isnan(v) else round(v, 12))
            elif pd.isna(v):
                canon_row.append(None)
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(rows, key=repr)


def _run(name):
    import pyarrow as pa
    import ray.data

    res = q.QUERIES[name](SF)
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


@pytest.mark.parametrize("name", FOLD_HEAVY)
def test_result_is_batching_invariant(name, monkeypatch, ray_session):
    baseline = _canon(_run(name))
    monkeypatch.setattr(q, "_ROWS_PER_BLOCK", _TinyBlocks())
    tiny = _canon(_run(name))
    assert tiny == baseline, f"{name}: result changed with block layout"
