"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay pipeline on sf0.001;
``queries()`` exposes one named pipeline per implemented operator family
(SURVEY.md §2) over the driver testdata; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for every SQL-expressible query.

Ray is initialised by the driver before this module is imported — nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Callable
from typing import Any

from etl_rs_ray.pipelines.queries import ORACLE_SQL, QUERIES

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: synthesize the change-event log derived from a seeded
    source-repo table (BASELINE.json input_hint shape), replay it through
    the exactly-once merge into a lake upsert table, return the final
    table state as a Ray Dataset."""
    from etl_rs_ray.datagen import generate_events, generate_repos, write_event_log
    from etl_rs_ray.pipelines.cdc import replay
    from etl_rs_ray.sources.lake import LakeTable

    work = tempfile.mkdtemp(prefix="etl_rs_ray_entry_")
    try:
        repos = generate_repos(n_files=2000, seed=42)
        events = generate_events(repos, update_frac=0.4, delete_frac=0.1, dup_frac=0.05, seed=42)
        log_dir = os.path.join(work, "log")
        write_event_log(events, log_dir, num_partitions=4, events_per_segment=50_000)
        table_dir = os.path.join(work, "table")
        replay(log_dir, table_dir, num_buckets=16)
        snap = LakeTable(table_dir).snapshot_table()
        return snap  # pyarrow.Table; driver converts
    finally:
        # lake files already materialized into the returned table
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
