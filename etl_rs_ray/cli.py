"""Job entry points — the ``ray job submit`` surface of the engine.

Usage (each owns its Ray session; the driver-embedded paths in
__ray_entry__.py never init Ray):

    python -m etl_rs_ray.cli generate --out /data/log --files 1000000
    python -m etl_rs_ray.cli replay   --log /data/log --table /data/table
    python -m etl_rs_ray.cli tail     --log /data/log --table /data/table --partitions 8
    python -m etl_rs_ray.cli snapshot --table /data/table --limit 10
    python -m etl_rs_ray.cli vacuum   --table /data/table

On a real cluster: ``ray job submit --working-dir . -- python -m
etl_rs_ray.cli replay --log s3://... --table s3://...`` (local-mode here).
"""

from __future__ import annotations

import argparse
import json


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        # log_to_driver=False: raylet warnings would otherwise stream into
        # stdout and corrupt the one-JSON-line output contract
        kwargs = {"include_dashboard": False, "log_to_driver": False}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(address="local", **kwargs)


def run_tail(log: str, table: str, partitions: int = 8, micro_batch_rows: int = 50_000,
             max_delta_depth: int = 8, atomic_txns: bool = False) -> dict:
    """One bounded streaming tail: pool-merge new events (lsn > table HWM)
    and persist. Bootstrap (empty table) flushes the pool's full state as
    an overwrite epoch; incremental tails append a DELTA epoch — the
    pool's state holds only this window's keys, so an overwrite here would
    wipe every previously committed row (ADVICE r1: cli.py:133)."""
    from .sources.lake import LakeTable
    from .stages.streaming import StreamingMerge

    sm = StreamingMerge(num_partitions=partitions)
    try:
        hwm = LakeTable(table).hwm_lsn()
        sm.tail(log, lsn_from=hwm if hwm >= 0 else None,
                micro_batch_rows=micro_batch_rows, atomic_txns=atomic_txns)
        if hwm >= 0:
            sm.flush_delta_to_lake(table)
        else:
            sm.flush_to_lake(table)
        # bound merge-on-read amplification under a steady tail of delta
        # epochs (no-op below the depth bound)
        compacted = max_delta_depth > 0 and LakeTable(table).maybe_compact(max_delta_depth)
        return sm.stats() | {"table": table, "compacted": bool(compacted)}
    finally:
        sm.shutdown()


def run_pipeline(cfg, source: str | None = None) -> dict:
    """Config-driven pipeline: CSV -> change events -> transform chain ->
    lake (the reference's io-config example surface,
    examples/csv_jdd_to_postgres.rs / kafka_jdd_to_mongo.rs). A CSV
    without the repo key columns is keyed by ROW INDEX, the reference's
    Kafka key for these rows (csv_jdd_to_kafka.rs); its other columns
    flow through schema evolution in the merge."""
    import pyarrow as _pa

    from .functions.registry import TransformChain
    from .pipelines.cdc import replay
    from .sources.csv_source import read_csv_table
    from .sources.event_log import ingest_table_as_inserts

    name = source or next(iter(cfg.csv), None)
    out = {"source": name}
    if name is not None:
        c = cfg.csv[name]
        table = read_csv_table(c.file_path)
        if c.number_of_rows >= 0:
            table = table.slice(0, c.number_of_rows)
        if "repo" not in table.column_names:
            n = table.num_rows
            table = table.add_column(0, "repo", _pa.array([c.table_name] * n))
            table = table.add_column(1, "path", _pa.array([f"row-{i:08d}" for i in range(n)]))
            table = table.add_column(2, "commit", _pa.array(["0" * 40] * n))
        next_lsn = ingest_table_as_inserts(
            table, cfg.event_log.log_dir, num_partitions=cfg.event_log.num_partitions
        )
        out |= {"ingested_rows": table.num_rows, "next_lsn": next_lsn}
    normalize = TransformChain(cfg.transforms) if cfg.transforms else None
    res = replay(
        cfg.event_log.log_dir,
        cfg.lake.table_dir,
        num_buckets=cfg.lake.num_buckets,
        normalize=normalize,
        mode=cfg.lake.mode,
    )
    return out | {
        "committed": res.committed,
        "epoch": res.epoch,
        "rows_total": res.rows_total,
        "wall_seconds": round(res.wall_seconds, 3),
    }


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etl_rs_ray")
    ap.add_argument("--num-cpus", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="seeded repos table + change-event log")
    g.add_argument("--out", required=True)
    g.add_argument("--files", type=int, default=10_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--partitions", type=int, default=8)
    g.add_argument("--txn-frac", type=float, default=0.0,
                   help="wrap runs of events in BEGIN..COMMIT transactions")
    g.add_argument("--open-tail", action="store_true",
                   help="drop the last txn's commit marker (producer crash)")

    ic = sub.add_parser("ingest-csv", help="CSV rows -> op=I change events (row index ≙ offset)")
    ic.add_argument("--csv", required=True)
    ic.add_argument("--log", required=True)
    ic.add_argument("--partitions", type=int, default=8)

    r = sub.add_parser("replay", help="bounded replay into the lake upsert table")
    r.add_argument("--log", required=True)
    r.add_argument("--table", required=True)
    r.add_argument("--target-lsn", type=int, default=None)
    r.add_argument("--buckets", type=int, default=64)
    r.add_argument("--curate", action="store_true")
    r.add_argument("--mode", choices=["upsert", "overwrite", "delta"], default="upsert")
    r.add_argument("--atomic-txns", action="store_true",
                   help="never apply a partial transaction: cut the window at the last fully-committed LSN")
    r.add_argument("--dry-run", action="store_true",
                   help="print the replay plan (segments, window, txn cut) without applying")
    r.add_argument("--quarantine", action="store_true",
                   help="divert structurally-broken events to table/quarantine/epoch-N with a reason instead of failing")

    cp = sub.add_parser("compact", help="fold delta files into fresh bucket bases")
    cp.add_argument("--table", required=True)

    ly = sub.add_parser("layout", help="per-bucket row/byte skew report (footers only)")
    ly.add_argument("--table", required=True)
    ly.add_argument("--epoch", type=int, default=None)

    rb = sub.add_parser("rebucket", help="k-multiple bucket split/merge, shuffle-free")
    rb.add_argument("--table", required=True)
    rb.add_argument("--buckets", type=int, required=True,
                    help="new bucket count (multiple or divisor of current)")

    t = sub.add_parser("tail", help="streaming actor-pool merge of the log")
    t.add_argument("--log", required=True)
    t.add_argument("--table", required=True)
    t.add_argument("--partitions", type=int, default=8)
    t.add_argument("--micro-batch-rows", type=int, default=50_000)
    t.add_argument("--atomic-txns", action="store_true")

    s = sub.add_parser("snapshot", help="print table state sample + metrics")
    s.add_argument("--table", required=True)

    ln = sub.add_parser("lineage", help="per-epoch lineage chain of a table")
    ln.add_argument("--table", required=True)

    lk = sub.add_parser("lookup", help="point read by key: touched buckets only, no scan")
    lk.add_argument("--table", required=True)
    lk.add_argument("--key", action="append", required=True,
                    help="repo,path[,commit] — repeatable")
    lk.add_argument("--epoch", type=int, default=None)
    lk.add_argument("--columns", default=None, help="comma-separated output columns")

    fk = sub.add_parser("fsck", help="manifest/storage consistency check")
    fk.add_argument("--table", required=True)
    fk.add_argument("--epoch", type=int, default=None)
    fk.add_argument("--deep", action="store_true",
                    help="also verify every row hashes to its bucket (key-column scan)")

    dg = sub.add_parser(
        "digest", help="anti-entropy bucket digests; --other compares two replicas")
    dg.add_argument("--table", required=True)
    dg.add_argument("--other", default=None,
                    help="second replica to compare against (bucket counts may "
                         "differ — maps are folded to the gcd granularity)")
    dg.add_argument("--epoch", type=int, default=None)

    vw = sub.add_parser(
        "view", help="materialized grouped-agg view: create if absent, refresh from the change feed")
    vw.add_argument("--dir", required=True, help="view directory")
    vw.add_argument("--table", default=None, help="source table (create)")
    vw.add_argument("--group", default=None, help="group column (create)")
    vw.add_argument("--sum", default=None,
                    help="comma-separated int payload columns to sum (create)")
    vw.add_argument("--limit", type=int, default=5)

    rs = sub.add_parser(
        "restore",
        help="roll the table back to a retained epoch (new manifest commit, "
        "no data movement; Delta RESTORE semantics)")
    rs.add_argument("--table", required=True)
    rs.add_argument("--to-epoch", type=int)
    rs.add_argument("--tag", help="restore to a tagged epoch")

    cc = sub.add_parser(
        "cascade",
        help="CDC fan-out: export a table's change feed as a NEW event log "
        "(incremental via a CASCADE_STATE checkpoint) so downstream tables "
        "replay a derived table like a source")
    cc.add_argument("--table", required=True)
    cc.add_argument("--out-log", required=True)
    cc.add_argument("--partitions", type=int, default=4)
    cc.add_argument("--to-epoch", type=int, default=None)

    mt = sub.add_parser(
        "maintain",
        help="observe layout_stats and run whatever maintenance thresholds "
        "demand: compact deep delta chains, split oversized buckets, "
        "shrink a sparse layout, optional vacuum; idempotent")
    mt.add_argument("--table", required=True)
    mt.add_argument("--max-delta-depth", type=int, default=3)
    mt.add_argument("--target-bucket-mb", type=int, default=256)
    mt.add_argument("--min-buckets", type=int, default=8)
    mt.add_argument("--vacuum-keep", type=int, default=None)
    mt.add_argument("--dry-run", action="store_true")

    tg = sub.add_parser(
        "tag", help="named epoch refs: retention anchors vacuum respects "
        "(no args beyond --table: list tags)")
    tg.add_argument("--table", required=True)
    tg.add_argument("--name")
    tg.add_argument("--epoch", type=int, default=None, help="default: current")
    tg.add_argument("--force", action="store_true", help="move an existing tag")
    tg.add_argument("--delete", action="store_true")

    cl = sub.add_parser("clone", help="zero-copy shallow clone (branch) of a table")
    cl.add_argument("--table", required=True)
    cl.add_argument("--dest", required=True)
    cl.add_argument("--epoch", type=int, default=None)
    s.add_argument("--limit", type=int, default=5)
    s.add_argument("--epoch", type=int, default=None)
    s.add_argument("--tag", help="read at a tagged epoch")

    ex = sub.add_parser(
        "expire", help="retention: tombstone live keys older than an LSN through the log")
    ex.add_argument("--log", required=True)
    ex.add_argument("--table", required=True)
    ex.add_argument("--before-lsn", type=int, required=True)
    ex.add_argument("--buckets", type=int, default=64)

    pg = sub.add_parser(
        "purge-log",
        help="binlog retention: delete log segments wholly below an LSN "
        "(clamped to the table's applied HWM; replay refuses windows "
        "reaching below the recorded cut)")
    pg.add_argument("--log", required=True)
    pg.add_argument("--below-lsn", type=int, required=True)
    pg.add_argument("--table", help="clamp the cut to this table's hwm+1")
    pg.add_argument(
        "--force", action="store_true",
        help="purge without a table HWM bound (may delete unapplied events)")

    ch = sub.add_parser(
        "changes", help="row-level I/U/D change feed between two epochs (table_changes)")
    ch.add_argument("--table", required=True)
    ch.add_argument("--from-epoch", type=int, default=None,
                    help="omit to diff against the empty table (bootstrap feed)")
    ch.add_argument("--to-epoch", type=int, default=None, help="default: current")
    ch.add_argument("--limit", type=int, default=5)

    v = sub.add_parser("vacuum", help="remove unreferenced data files")
    v.add_argument("--table", required=True)
    v.add_argument("--keep-epochs", type=int, default=1)

    pl = sub.add_parser(
        "pipeline", help="run a config-driven pipeline: CSV -> change events -> "
        "transform chain -> lake (the reference's io-config example surface)")
    pl.add_argument("--config", required=True)
    pl.add_argument("--source", default=None,
                    help="csv source name from the config (default: first)")

    cu = sub.add_parser(
        "curate", help="end-to-end corpus curation: quality/lang filter -> "
        "exact + near dedup -> token stats -> resumable partitioned export")
    cu.add_argument("--docs", required=True, help="parquet file/dir with (doc_id, text)")
    cu.add_argument("--out", default=None, help="output dir (omit for stats only)")
    cu.add_argument("--min-quality", type=float, default=0.2)
    cu.add_argument("--reference", default=None,
                    help="parquet with a benchmark corpus (doc_id, text): near-dups "
                    "of it are decontaminated out of the output")
    cu.add_argument("--splits", default=None,
                    help="train/val/test recipe, e.g. 'train=0.9,val=0.05,test=0.05' "
                    "— adds a deterministic `split` column")

    q = sub.add_parser("query", help="run a named operator query over an sf dir")
    q.add_argument("--name", help="query name (omit or use 'list' to list all)", default="list")
    q.add_argument("--sf", default="/root/testdata/sf0.001", help="testdata sf directory")
    q.add_argument("--limit", type=int, default=5, help="sample rows to print")
    q.add_argument("--oracle", action="store_true",
                   help="also run the DuckDB oracle and report row-count match")

    args = ap.parse_args(argv)

    if args.cmd == "generate":
        from .datagen import generate_events, generate_repos, write_event_log

        repos = generate_repos(n_files=args.files, seed=args.seed)
        events = generate_events(
            repos, seed=args.seed, txn_frac=args.txn_frac, open_tail=args.open_tail
        )
        write_event_log(events, args.out, num_partitions=args.partitions)
        print(json.dumps({"files": repos.num_rows, "events": events.num_rows, "log": args.out}))
        return 0

    if args.cmd == "ingest-csv":
        from .sources.csv_source import read_csv_table
        from .sources.event_log import ingest_table_as_inserts

        table = read_csv_table(args.csv)
        next_lsn = ingest_table_as_inserts(table, args.log, num_partitions=args.partitions)
        print(json.dumps({"rows": table.num_rows, "next_lsn": next_lsn, "log": args.log}))
        return 0

    if args.cmd == "replay":
        _init_ray(args.num_cpus)
        from .pipelines.cdc import curate_batch, replay, replay_plan

        if args.dry_run:
            plan = replay_plan(
                args.log, args.table, target_lsn=args.target_lsn,
                num_buckets=args.buckets, atomic_txns=args.atomic_txns,
            )
            print(json.dumps(plan))
            import ray

            ray.shutdown()
            return 0

        res = replay(
            args.log,
            args.table,
            target_lsn=args.target_lsn,
            num_buckets=args.buckets,
            normalize=curate_batch if args.curate else None,
            mode=args.mode,
            atomic_txns=args.atomic_txns,
            quarantine=args.quarantine,
        )
        print(
            json.dumps(
                {
                    "committed": res.committed,
                    "epoch": res.epoch,
                    "hwm_lsn": res.hwm_lsn,
                    "events_applied": res.events_applied,
                    "rows_total": res.rows_total,
                    "wall_seconds": round(res.wall_seconds, 3),
                }
            )
        )
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "tail":
        _init_ray(args.num_cpus)
        try:
            print(json.dumps(run_tail(args.log, args.table, args.partitions,
                                      args.micro_batch_rows, atomic_txns=args.atomic_txns)))
        finally:
            import ray

            ray.shutdown()
        return 0

    if args.cmd == "pipeline":
        _init_ray(args.num_cpus)
        from .config import PipelineConfig

        cfg = PipelineConfig.load(args.config)
        out = {"config": args.config} | run_pipeline(cfg, args.source)
        print(json.dumps(out))
        import ray as _ray

        _ray.shutdown()
        return 0

    if args.cmd == "curate":
        _init_ray(args.num_cpus)
        import ray.data as _rd

        from .pipelines.curation import curate_corpus

        ds = _rd.read_parquet(args.docs, columns=["doc_id", "text"])
        small = ds.count() < 200_000
        reference = (
            _rd.read_parquet(args.reference, columns=["doc_id", "text"])
            if args.reference
            else None
        )
        splits = (
            {k: float(v) for k, v in (p.split("=") for p in args.splits.split(","))}
            if args.splits
            else None
        )
        stats = curate_corpus(ds, out_dir=args.out, min_quality=args.min_quality,
                              reference=reference, splits=splits, small_input=small)
        print(json.dumps(stats))
        import ray as _ray

        _ray.shutdown()
        return 0

    if args.cmd == "query":
        from .pipelines.queries import ORACLE_SQL, QUERIES

        if args.name in ("list", None):
            print(json.dumps({"queries": sorted(QUERIES), "oracles": len(ORACLE_SQL)}))
            return 0
        if args.name not in QUERIES:
            print(json.dumps({"error": f"unknown query {args.name!r}", "queries": sorted(QUERIES)}))
            return 1
        _init_ray(args.num_cpus)
        import time as _time

        import pyarrow as _pa
        import ray as _ray
        import ray.data as _rd

        t0 = _time.perf_counter()
        res = QUERIES[args.name](args.sf)
        if isinstance(res, _rd.Dataset):
            tbl = _pa.Table.from_pylist(res.take_all())
        elif isinstance(res, _pa.Table):
            tbl = res
        else:
            tbl = _pa.Table.from_pandas(res)
        out = {
            "query": args.name,
            "rows": tbl.num_rows,
            "columns": tbl.column_names,
            "wall_seconds": round(_time.perf_counter() - t0, 3),
            "sample": tbl.slice(0, args.limit).to_pylist(),
        }
        if args.oracle and args.name in ORACLE_SQL:
            import duckdb

            con = duckdb.connect()
            for t in ("region nation customer supplier part orders lineitem "
                      "events documents embeddings").split():
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{args.sf}/{t}.parquet')")
            want = con.sql(ORACLE_SQL[args.name]).arrow()
            out["oracle_rows"] = want.num_rows
            out["rows_match"] = want.num_rows == tbl.num_rows

            # order-insensitive value compare, same canon the test
            # harness uses (floats rounded to 6dp, nulls unified)
            import math as _math

            def _canon(t: _pa.Table):
                df = t.to_pandas()
                df = df[sorted(df.columns)]
                rows = []
                for row in df.itertuples(index=False):
                    c = []
                    for v in row:
                        if isinstance(v, float):
                            c.append(None if _math.isnan(v) else round(v, 6))
                        else:
                            try:
                                import pandas as _pd

                                c.append(None if _pd.isna(v) else v)
                            except (TypeError, ValueError):
                                c.append(v)
                    rows.append(tuple(c))
                return sorted(rows, key=repr)

            out["schema_match"] = sorted(tbl.column_names) == sorted(want.column_names)
            out["values_match"] = bool(
                out["rows_match"] and out["schema_match"] and _canon(tbl) == _canon(want)
            )
        print(json.dumps(out, default=str))
        _ray.shutdown()
        return 0

    if args.cmd == "expire":
        _init_ray(args.num_cpus)
        from .pipelines.cdc import expire_before

        out = expire_before(args.log, args.table, args.before_lsn,
                            num_buckets=args.buckets)
        print(json.dumps(out))
        return 0

    if args.cmd == "restore":
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        if (args.to_epoch is None) == (args.tag is None):
            print(json.dumps({"error": "pass exactly one of --to-epoch / --tag"}))
            return 2
        target = lake.resolve_tag(args.tag) if args.tag else args.to_epoch
        new_epoch = lake.restore(target)
        print(json.dumps({
            "restored_from": target,
            "epoch": new_epoch,
            "hwm_lsn": lake.hwm_lsn(),
            "num_buckets": lake.num_buckets,
        }))
        return 0

    if args.cmd == "cascade":
        _init_ray(args.num_cpus)
        from .pipelines.cdc import cascade_changes

        out = cascade_changes(
            args.table, args.out_log,
            num_partitions=args.partitions, to_epoch=args.to_epoch,
        )
        print(json.dumps(out))
        return 0

    if args.cmd == "maintain":
        _init_ray(args.num_cpus)
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        out = lake.maintain(
            max_delta_depth=args.max_delta_depth,
            target_bucket_bytes=args.target_bucket_mb << 20,
            min_buckets=args.min_buckets,
            vacuum_keep_epochs=args.vacuum_keep,
            dry_run=args.dry_run,
        )
        print(json.dumps(out))
        return 0

    if args.cmd == "tag":
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        if args.delete:
            if not args.name:
                print(json.dumps({"error": "--delete needs --name"}))
                return 2
            lake.delete_tag(args.name)
            print(json.dumps({"deleted": args.name, "tags": lake.list_tags()}))
        elif args.name:
            e = lake.tag_epoch(args.name, epoch=args.epoch, force=args.force)
            print(json.dumps({"tag": args.name, "epoch": e}))
        else:
            print(json.dumps({"tags": lake.list_tags()}))
        return 0

    if args.cmd == "purge-log":
        from .sources.event_log import purge_log
        from .sources.lake import LakeTable

        if not args.table and not args.force:
            print(json.dumps({"error": "pass --table (HWM bound) or --force"}))
            return 2
        hwm = LakeTable(args.table).hwm_lsn() if args.table else None
        out = purge_log(args.log, args.below_lsn, applied_hwm=hwm)
        print(json.dumps(out))
        return 0

    if args.cmd == "changes":
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        feed = lake.changes(args.from_epoch, args.to_epoch)
        t = feed.to_pandas()
        ops = t["op"].value_counts().to_dict() if len(t) else {}
        print(json.dumps({
            "rows": len(t),
            "from_epoch": args.from_epoch,
            "to_epoch": args.to_epoch if args.to_epoch is not None else lake.current_epoch(),
            "ops": {k: int(v) for k, v in ops.items()},
        }))
        for row in t.head(args.limit).to_dict(orient="records"):
            print(json.dumps({k: (v[:60] if isinstance(v, str) else v) for k, v in row.items()}, default=str))
        return 0

    if args.cmd == "lineage":
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        chain = []
        e = lake.current_epoch()
        while e >= 0:
            m = lake.manifests.read(e)
            if m is None:
                break
            lin = dict(m.get("lineage", {}))
            lin.pop("segments", None)  # keep the line short; segment list is in the manifest
            chain.append(
                {
                    "epoch": e,
                    "mode": m.get("mode"),
                    "hwm_lsn": m.get("hwm_lsn"),
                    "buckets": len(m.get("buckets", {})),
                    "metrics": {
                        k: m.get("metrics", {}).get(k)
                        for k in ("events_applied", "quarantined", "wall_seconds")
                        if k in m.get("metrics", {})
                    },
                    "lineage": lin,
                }
            )
            e = int(m.get("parent_epoch", -1))
        print(json.dumps({"table": args.table, "epochs": chain}))
        return 0

    if args.cmd == "fsck":
        from .sources.lake import LakeTable

        print(json.dumps(LakeTable(args.table).fsck(epoch=args.epoch, deep=args.deep)))
        return 0

    if args.cmd == "view":
        from .state.matview import MaterializedView

        _init_ray(args.num_cpus)
        mv = MaterializedView(
            args.dir, table_dir=args.table, group_col=args.group,
            sum_cols=args.sum.split(",") if args.sum else None,
        )
        res = mv.refresh()
        t = mv.read()
        out = {**res, "view_epoch": mv.current_epoch(),
               "groups": t.num_rows if t is not None else 0}
        if t is not None and t.num_rows:
            out["sample"] = t.slice(0, args.limit).to_pylist()
        print(json.dumps(out, default=str))
        return 0

    if args.cmd == "digest":
        from functools import reduce

        from .sources.lake import LakeTable, compare_digests

        _init_ray(args.num_cpus)
        la = LakeTable(args.table)
        da = la.bucket_digests(epoch=args.epoch)
        out = {
            "table": args.table,
            "num_buckets": la.num_buckets,
            "occupied": len(da),
            "rows": sum(r for _, r in da.values()),
            # table-level digest = XOR of bucket digests (layout-free)
            "table_digest": str(reduce(lambda a, b: a ^ b, (int(d) for d, _ in da.values()), 0)),
        }
        if args.other:
            lb = LakeTable(args.other)
            db = lb.bucket_digests()
            diverged = compare_digests(da, la.num_buckets, db, lb.num_buckets)
            import math

            out["other"] = {"table": args.other, "num_buckets": lb.num_buckets,
                            "rows": sum(r for _, r in db.values())}
            out["compare_granularity"] = math.gcd(la.num_buckets, lb.num_buckets)
            out["diverged_buckets"] = diverged
            out["in_sync"] = not diverged
        print(json.dumps(out))
        return 0

    if args.cmd == "clone":
        from .sources.lake import LakeTable

        src = LakeTable(args.table)
        dest = src.clone_to(args.dest, epoch=args.epoch)
        m = dest.manifests.read()
        print(
            json.dumps(
                {
                    "cloned_from": m["lineage"]["cloned_from"],
                    "source_epoch": m["lineage"]["source_epoch"],
                    "dest": args.dest,
                    "hwm_lsn": dest.hwm_lsn(),
                    "buckets": len(m["buckets"]),
                }
            )
        )
        return 0

    if args.cmd == "snapshot":
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        epoch = lake.resolve_tag(args.tag) if args.tag else args.epoch
        snap = lake.snapshot_table(epoch=epoch)
        print(json.dumps({"rows": snap.num_rows, "epoch": lake.current_epoch(), "metrics": lake.metrics()}))
        for row in snap.slice(0, args.limit).to_pylist():
            print(json.dumps({k: (v[:60] if isinstance(v, str) else v) for k, v in row.items()}))
        return 0

    if args.cmd == "lookup":
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        keys = [tuple(k.split(",")) for k in args.key]
        cols = args.columns.split(",") if args.columns else None
        t = lake.lookup(keys, epoch=args.epoch, columns=cols)
        print(json.dumps({"keys": len(keys), "rows": t.num_rows}))
        for row in t.to_pylist():
            print(json.dumps({k: (v[:60] if isinstance(v, str) else v) for k, v in row.items()}))
        return 0

    if args.cmd == "compact":
        _init_ray(args.num_cpus)
        from .sources.lake import LakeTable

        did = LakeTable(args.table).compact()
        print(json.dumps({"compacted": did}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "layout":
        from .sources.lake import LakeTable

        print(json.dumps(LakeTable(args.table).layout_stats(epoch=args.epoch)))
        return 0

    if args.cmd == "rebucket":
        _init_ray(args.num_cpus)
        from .sources.lake import LakeTable

        lake = LakeTable(args.table)
        before = lake.num_buckets
        did = lake.rebucket(args.buckets)
        print(json.dumps({"rebucketed": did, "from": before, "to": lake.num_buckets,
                          "epoch": lake.current_epoch()}))
        import ray

        ray.shutdown()
        return 0

    if args.cmd == "vacuum":
        from .sources.lake import LakeTable

        removed = LakeTable(args.table).vacuum(keep_epochs=args.keep_epochs)
        print(json.dumps({"removed": len(removed)}))
        return 0

    return 1


if __name__ == "__main__":
    raise SystemExit(main())
