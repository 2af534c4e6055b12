"""Bucket-partitioned lake upsert table with manifest snapshots.

The Ray-native replacement for the reference's Postgres/Mongo sinks
(examples/csv_jdd_to_postgres.rs:40-125, kafka_jdd_to_mongo.rs:68-95):
Overwrite mode ≙ copy-on-write bucket rewrite + manifest swap; Append
mode ≙ adding data files to the manifest. A snapshot read
(``SELECT * FROM t``, examples/transform_jdd_normalisation.rs:32-38)
≙ ``read_parquet`` over the CURRENT manifest's file list.

Layout::

    table_dir/_manifests/{manifest-N.json, CURRENT}
    table_dir/_staging/epoch-N/bucket-K.parquet   (task outputs, pre-commit)
    table_dir/data/epoch-N/bucket-K.parquet       (committed)

Data files are renamed from staging into ``data/`` at commit time by the
driver; uncommitted staging epochs are garbage (never referenced by
CURRENT) and can be vacuumed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.event_log import PARTITIONER_ID
from ..state import fs
from ..state.manifest import ManifestStore


class LakeTable:
    def __init__(self, table_dir: str, num_buckets: int = 64):
        self.table_dir = table_dir
        fs.makedirs(table_dir)
        self.manifests = ManifestStore(table_dir)
        m = self.manifests.read()
        if m is not None:
            self.num_buckets = int(m["num_buckets"])
            # bucket layout is durable: refuse to merge into a table laid
            # out by a different key-hash (silent cross-bucket duplicates
            # otherwise — ADVICE r1)
            # a manifest written before the partitioner field existed used
            # the old bucket layout — default the MISSING field to a legacy
            # sentinel so those tables are refused too (ADVICE r2)
            stored = m.get("partitioner", "pre-poly64-legacy")
            if stored != PARTITIONER_ID:
                raise ValueError(
                    f"table {table_dir} was written with partitioner "
                    f"{stored!r}; this engine uses {PARTITIONER_ID!r} — "
                    "rewrite the table (overwrite replay) before upserting"
                )
        else:
            self.num_buckets = num_buckets

    # --- read side ---------------------------------------------------------

    def current_epoch(self) -> int:
        return self.manifests.current_epoch()

    def hwm_lsn(self) -> int:
        m = self.manifests.read()
        return int(m["hwm_lsn"]) if m else -1

    def _resolve(self, ref: str) -> str:
        """Manifest file references are table-dir-relative for files this
        table wrote, and absolute (or URIs) for files referenced from a
        shallow clone's source table."""
        if fs.is_uri(ref) or os.path.isabs(ref):
            return ref
        return fs.join(self.table_dir, ref)

    def bucket_files(self, epoch: int | None = None) -> dict[int, str]:
        m = self.manifests.read(epoch)
        if not m:
            return {}
        return {
            int(b): self._resolve(e["file"])
            for b, e in m["buckets"].items()
            if e.get("file")
        }

    def bucket_file_sets(self, epoch: int | None = None) -> dict[int, list[str]]:
        """Per bucket: [base?, *delta_files] — the merge-on-read unit."""
        m = self.manifests.read(epoch)
        if not m:
            return {}
        out = {}
        for b, e in m["buckets"].items():
            files = []
            if e.get("file"):
                files.append(self._resolve(e["file"]))
            files.extend(self._resolve(f) for f in e.get("delta_files", []))
            if files:
                out[int(b)] = files
        return out

    def has_deltas(self, epoch: int | None = None) -> bool:
        m = self.manifests.read(epoch)
        return bool(m) and any(e.get("delta_files") for e in m["buckets"].values())

    def max_delta_depth(self, epoch: int | None = None) -> int:
        """Longest per-bucket delta chain — the read-amplification factor
        of a merge-on-read snapshot (each read folds base + that many
        delta files)."""
        m = self.manifests.read(epoch)
        if not m:
            return 0
        return max((len(e.get("delta_files", [])) for e in m["buckets"].values()), default=0)

    def maybe_compact(self, max_delta_depth: int = 4, key_cols=("repo", "path", "commit")) -> bool:
        """Compaction policy: fold deltas into fresh bases once any
        bucket's chain exceeds ``max_delta_depth`` — bounds snapshot read
        amplification under a steady stream of delta epochs while keeping
        delta appends cheap between compactions. Returns True if a
        compaction ran."""
        if self.max_delta_depth() <= max_delta_depth:
            return False
        return self.compact(key_cols=key_cols)

    def data_files(self, epoch: int | None = None) -> list[str]:
        return sorted(self.bucket_files(epoch).values())

    @staticmethod
    def _merge_on_read(files: list[str], key_cols=("repo", "path", "commit")) -> pa.Table:
        from ..stages.merge_apply import lww_reduce
        from ..state.schema_evolution import unify_tables

        t = unify_tables([fs.read_table(f) for f in files])
        return lww_reduce(t, tuple(key_cols), drop_tombstones=True)

    def snapshot(self, columns: list[str] | None = None, epoch: int | None = None,
                 key_cols=("repo", "path", "commit")):
        """Table state as a streaming Ray Dataset. ``epoch`` gives time
        travel to any retained manifest (lineage is per-epoch). Buckets
        with outstanding delta files are merged on read — one task per
        bucket, no shuffle (bucket files are already key-partitioned)."""
        import ray.data

        if not self.has_deltas(epoch):
            files = self.data_files(epoch)
            if not files:
                return ray.data.from_arrow(pa.schema([]).empty_table())
            kwargs = {"columns": columns} if columns else {}
            if fs.is_uri(files[0]):
                # a LIST of URI paths trips pyarrow's local-path resolver
                # ("Expected a local filesystem path, got a URI") — resolve
                # the filesystem once and pass scheme-less paths. Caught by
                # the file:// fault-injection walk.
                from pyarrow.fs import FSSpecHandler, PyFileSystem

                kwargs["filesystem"] = PyFileSystem(FSSpecHandler(fs._fs(files[0])))
                files = [fs._strip(f) for f in files]
            return ray.data.read_parquet(files, **kwargs)

        sets = self.bucket_file_sets(epoch)
        items = [{"files": files} for files in sets.values()]
        merge = self._merge_on_read

        def read_bucket(batch: pa.Table) -> pa.Table:
            tables = [merge(files.as_py(), key_cols) for files in batch.column("files")]
            from ..state.schema_evolution import unify_tables

            out = unify_tables(tables)
            return out.select(columns) if columns else out

        return ray.data.from_items(items).repartition(len(items)).map_batches(
            read_bucket, batch_format="pyarrow", batch_size=None
        )

    def snapshot_table(self, epoch: int | None = None, key_cols=("repo", "path", "commit")) -> pa.Table:
        """Driver-side materialized snapshot (tests / small tables)."""
        if self.has_deltas(epoch):
            from ..state.schema_evolution import unify_tables

            sets = self.bucket_file_sets(epoch)
            if not sets:
                return pa.schema([]).empty_table()
            return unify_tables([self._merge_on_read(f, key_cols) for f in sets.values()])
        files = self.data_files(epoch)
        if not files:
            return pa.schema([]).empty_table()
        return pa.concat_tables([fs.read_table(f) for f in files], promote_options="permissive")

    def lookup(self, keys, epoch: int | None = None,
               key_cols=("repo", "path", "commit"),
               columns: list[str] | None = None) -> pa.Table:
        """Point reads by primary key — the latency path of the lake.

        ``keys`` is an iterable of ``(repo, path)`` pairs or
        ``(repo, path, commit)`` triples. Each key hashes to its bucket
        (the same durable ``poly64-v1`` partitioner the writer used), so
        only the touched buckets' file sets are opened — a 100 TB table
        with 64k buckets serves a point read from ONE bucket's base +
        delta chain. Within each file the ``(repo, path)`` equality set
        is pushed into the parquet scan as a row-group filter (string
        min/max statistics prune untouched row groups), the survivors
        are LWW-folded, and tombstoned keys come back absent — exactly
        the rows a full ``snapshot()`` would yield for those keys,
        without the scan. Bulk key lists (millions of probes) belong in
        the join machinery (``stages/joins.keyed_lookup_join``), not
        here: this path is driver-side by design, O(keys) tiny reads.
        """
        from ..sources.event_log import fast_hash_bucket
        from ..state.schema_evolution import unify_tables

        keys = list(keys)
        empty = pa.schema([]).empty_table()
        sets = self.bucket_file_sets(epoch)
        if not keys or not sets:
            return empty
        # the requested epoch's OWN bucket count: a time-travel read across
        # a rebucket boundary must hash with the layout that epoch was
        # written under, not the current one
        n_buckets = int(self.manifests.read(epoch)["num_buckets"])
        repos = pa.array([k[0] for k in keys], pa.string())
        paths = pa.array([k[1] for k in keys], pa.string())
        touched = set(
            pc.unique(fast_hash_bucket(repos, paths, n_buckets)).to_pylist()
        )
        # superset scan filter (row-group pruning); exactness restored by
        # the joined-key post-filter below
        filters = [("repo", "in", set(repos.to_pylist())),
                   ("path", "in", set(paths.to_pylist()))]
        tables = []
        for b in sorted(touched):
            for f in sets.get(b, ()):
                t = fs.read_table(f, filters=filters)
                if t.num_rows:
                    tables.append(t)
        if not tables:
            return empty
        t = unify_tables(tables)
        want = pc.binary_join_element_wise(repos, paths, "\x00")
        got = pc.binary_join_element_wise(
            t.column("repo").cast(pa.string()), t.column("path").cast(pa.string()), "\x00"
        )
        t = t.filter(pc.is_in(got, value_set=want))
        # LWW across the collected rows: per-key ordering is global (keys
        # never span buckets), so one fold over <=len(keys) buckets' rows
        # reproduces snapshot semantics, tombstones dropped
        t = self._merge_on_read_fold(t, key_cols)
        # commit filtering is PER KEY, not global: with mixed pair/triple
        # probes a global commit set would drop every pair-probed row (its
        # commit isn't in the set) and leak cross-products (probing
        # (r1,p1,c1)+(r2,p2,c2) must not return (r1,p1,c2))
        triples = [k for k in keys if len(k) > 2 and k[2] is not None]
        if triples and "commit" in t.column_names:
            pairs = [k for k in keys if len(k) < 3 or k[2] is None]
            got2 = pc.binary_join_element_wise(
                t.column("repo").cast(pa.string()),
                t.column("path").cast(pa.string()), "\x00",
            )
            got3 = pc.binary_join_element_wise(
                got2, pc.cast(t.column("commit"), pa.string()), "\x00"
            )
            keep = pc.is_in(
                got3,
                value_set=pa.array([f"{k[0]}\x00{k[1]}\x00{k[2]}" for k in triples]),
            )
            if pairs:
                keep = pc.or_kleene(
                    keep,
                    pc.is_in(
                        got2,
                        value_set=pa.array([f"{k[0]}\x00{k[1]}" for k in pairs]),
                    ),
                )
            t = t.filter(pc.fill_null(keep, False))
        return t.select(columns) if columns else t

    @staticmethod
    def _merge_on_read_fold(t: pa.Table, key_cols) -> pa.Table:
        from ..stages.merge_apply import lww_reduce

        return lww_reduce(t, tuple(key_cols), drop_tombstones=True)

    def changes(self, from_epoch: int | None, to_epoch: int | None = None,
                key_cols=("repo", "path", "commit"), lsn_col: str = "lsn",
                op_col: str = "op", include_old: bool = False):
        """Row-level change feed between two committed epochs — the
        lakehouse table_changes() surface: one I/U/D row per key whose
        LWW state differs between the epochs, carrying the new state
        (nulls for D) and the LSN that changed it. ``from_epoch=None``
        diffs against the empty table (bootstrap feed = pure inserts).
        ``include_old=True`` adds ``old_<col>``/``old_lsn`` columns (the
        from-epoch state, nulls for I) — what an incremental view
        maintainer needs to retract superseded contributions
        (stages/ivm.py).

        Shuffle-free: with ``bucket = hash mod N`` on both sides, the
        diff decomposes into one task per bucket-aligned key range
        reading only that range's files at each epoch — O(range) memory,
        no key exchange. When the two epochs straddle a ``rebucket``
        boundary their counts differ, so buckets are paired at the
        COARSEST shared granularity ``g = gcd(N_a, N_b)``: coarse range
        ``c`` holds exactly the keys with ``hash mod g == c``, i.e. the
        union of fine buckets ``b ≡ c (mod g)`` on each side (same-ID
        pairing across a rebucket would misalign key sets and emit a
        phantom D+I pair for every key whose bucket id changed). For the
        k-multiple changes ``rebucket`` permits, g is the smaller count
        — still one independent task per coarse bucket.
        """
        import math

        import ray.data

        from ..stages.merge_apply import lww_reduce
        from ..state.schema_evolution import unify_tables

        sets_a = self.bucket_file_sets(from_epoch) if from_epoch is not None else {}
        sets_b = self.bucket_file_sets(to_epoch)
        if not (set(sets_a) | set(sets_b)):
            return ray.data.from_arrow(pa.schema([]).empty_table())
        n_b = int(self.manifests.read(to_epoch)["num_buckets"])
        g = n_b
        if from_epoch is not None:
            n_a = int(self.manifests.read(from_epoch)["num_buckets"])
            g = math.gcd(n_a, n_b)
        coarse_a: dict[int, list[str]] = {}
        for b, files in sets_a.items():
            coarse_a.setdefault(int(b) % g, []).extend(files)
        coarse_b: dict[int, list[str]] = {}
        for b, files in sets_b.items():
            coarse_b.setdefault(int(b) % g, []).extend(files)
        buckets = sorted(set(coarse_a) | set(coarse_b))
        items = [
            {"a": coarse_a.get(b, []), "b": coarse_b.get(b, [])} for b in buckets
        ]
        keys = tuple(key_cols)

        def _state(files: list[str]) -> pa.Table | None:
            if not files:
                return None
            t = unify_tables([fs.read_table(f) for f in files])
            return lww_reduce(t, keys, lsn_col=lsn_col, op_col=op_col,
                              drop_tombstones=False)

        def _ckey(t: pa.Table):
            parts = [pc.cast(t.column(k), pa.string()) for k in keys]
            return pc.binary_join_element_wise(*parts, "\x1f")

        def _diff(ta: pa.Table | None, tb: pa.Table | None) -> pa.Table:
            if tb is None or tb.num_rows == 0:
                # bucket emptied at B (overwrite replay): every A-live key
                # is a delete; payload/typing comes from the A side
                if ta is None or ta.num_rows == 0:
                    return pa.schema([]).empty_table()
                live_a = pc.fill_null(pc.not_equal(ta.column(op_col), "D"), True)
                ga = ta.filter(live_a)
                payload = [
                    c for c in ta.column_names
                    if c not in keys and c not in (lsn_col, op_col)
                ]
                cols = {
                    **{k: ga.column(k) for k in keys},
                    "op": pa.array(["D"] * ga.num_rows, pa.string()),
                    "change_lsn": pa.array([-1] * ga.num_rows, pa.int64()),
                    **{c: pa.nulls(ga.num_rows, ta.schema.field(c).type)
                       for c in payload},
                }
                if include_old:
                    cols["old_lsn"] = ga.column(lsn_col).cast(pa.int64())
                    for c in payload:
                        cols["old_" + c] = ga.column(c)
                return pa.table(cols)
            payload = [
                c for c in tb.column_names
                if c not in keys and c not in (lsn_col, op_col)
            ]
            live_b = pc.fill_null(pc.not_equal(tb.column(op_col), "D"), True) \
                if tb.num_rows else pa.array([], pa.bool_())
            if ta is None or ta.num_rows == 0:
                out = tb.filter(live_b)
                res = pa.table(
                    {**{k: out.column(k) for k in keys},
                     "op": pa.array(["I"] * out.num_rows, pa.string()),
                     "change_lsn": out.column(lsn_col),
                     **{c: out.column(c) for c in payload}}
                )
                if include_old:
                    res = res.append_column(
                        "old_lsn", pa.nulls(res.num_rows, pa.int64())
                    )
                    for c in payload:
                        res = res.append_column(
                            "old_" + c, pa.nulls(res.num_rows, tb.schema.field(c).type)
                        )
                return res
            ka = _ckey(ta)
            kb = _ckey(tb)
            live_a = pc.fill_null(pc.not_equal(ta.column(op_col), "D"), True)
            pos = pc.index_in(kb, value_set=ka.combine_chunks())
            a_live_at = pc.fill_null(live_a.combine_chunks().take(pos), False)
            a_lsn_at = ta.column(lsn_col).combine_chunks().take(pos)
            is_i = pc.and_(live_b, pc.invert(a_live_at))
            moved = pc.fill_null(
                pc.not_equal(tb.column(lsn_col).combine_chunks(), a_lsn_at), True
            )
            is_u = pc.and_(pc.and_(live_b, a_live_at), moved)
            is_d = pc.and_(pc.invert(live_b), a_live_at)
            op = pc.if_else(is_i, "I", pc.if_else(is_d, "D", "U"))
            keep = pc.or_(pc.or_(is_i, is_u), is_d)
            out = tb.append_column("__op", op).filter(keep)
            dmask = pc.equal(out.column("__op"), "D")
            cols = {k: out.column(k) for k in keys}
            cols["op"] = out.column("__op")
            cols["change_lsn"] = out.column(lsn_col)
            for c in payload:
                cols[c] = pc.if_else(
                    dmask, pa.nulls(out.num_rows, out.schema.field(c).type),
                    out.column(c),
                )
            if include_old:
                def _arr(a):
                    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a

                pos_kept = _arr(_arr(pos).filter(_arr(keep)))
                had_old = _arr(_arr(a_live_at).filter(_arr(keep)))

                def _old(col_name, typ):
                    if col_name not in ta.column_names:
                        return pa.nulls(out.num_rows, typ)
                    vals = ta.column(col_name).combine_chunks().take(pos_kept)
                    return pc.if_else(had_old, vals, pa.nulls(out.num_rows, typ))

                cols["old_lsn"] = _old(lsn_col, pa.int64())
                for c in payload:
                    cols["old_" + c] = _old(c, out.schema.field(c).type)
            res = pa.table(cols)
            # overwrite replays can drop keys entirely: A-live keys with
            # no row at B are deletes too (change_lsn = -1 sentinel — no
            # event carried the delete)
            gone = pc.and_(
                live_a, pc.is_null(pc.index_in(ka, value_set=kb.combine_chunks()))
            )
            if pc.any(gone).as_py():
                ga = ta.filter(gone)
                gcols = {
                    **{k: ga.column(k) for k in keys},
                    "op": pa.array(["D"] * ga.num_rows, pa.string()),
                    "change_lsn": pa.array([-1] * ga.num_rows,
                                           res.schema.field("change_lsn").type
                                           if res.num_rows else pa.int64()),
                    **{c: pa.nulls(ga.num_rows, tb.schema.field(c).type)
                       for c in payload},
                }
                if include_old:
                    gcols["old_lsn"] = ga.column(lsn_col).cast(pa.int64())
                    for c in payload:
                        gcols["old_" + c] = (
                            ga.column(c) if c in ga.column_names
                            else pa.nulls(ga.num_rows, tb.schema.field(c).type)
                        )
                gone_tbl = pa.table(gcols)
                res = unify_tables([res, gone_tbl]) if res.num_rows else gone_tbl
            return res

        def diff_bucket(batch: pa.Table) -> pa.Table:
            outs = []
            for a_files, b_files in zip(batch.column("a"), batch.column("b")):
                t = _diff(_state(a_files.as_py()), _state(b_files.as_py()))
                if t.num_rows:
                    outs.append(t)
            if not outs:
                return pa.schema([]).empty_table()
            return unify_tables(outs)

        return ray.data.from_items(items).repartition(len(items)).map_batches(
            diff_bucket, batch_format="pyarrow", batch_size=None
        )

    def bucket_digests(self, epoch: int | None = None,
                       key_cols=("repo", "path", "commit"),
                       cols=("repo", "path", "commit", "lsn"),
                       lsn_col: str = "lsn", op_col: str = "op") -> dict:
        """Per-bucket anti-entropy digests: XOR of per-row stable hashes
        over the bucket's LIVE state (stages/digest.py semantics). Two
        replicas compare {bucket: (digest, rows)} maps — one local read
        pass each, zero row exchange — and re-sync only the buckets
        whose digests diverge. Buckets are the unit because the durable
        partitioner makes them comparable across replicas; replicas
        whose bucket COUNTS differ (one side rebucketed) compare via
        ``compare_digests``, which XOR-folds both maps to the shared
        gcd granularity — no re-read needed, XOR is associative."""
        import ray

        from ..stages.merge_apply import lww_reduce

        sets = self.bucket_file_sets(epoch)
        if not sets:
            return {}
        items = [{"bucket": b, "files": f} for b, f in sorted(sets.items())]
        keys = tuple(key_cols)
        want = list(cols)

        def digest_bucket(batch: pa.Table) -> pa.Table:
            import numpy as np

            from ..stages.digest import row_hashes
            from ..state.schema_evolution import unify_tables

            out = []
            for b, files in zip(batch.column("bucket"), batch.column("files")):
                t = unify_tables([fs.read_table(f) for f in files.as_py()])
                t = lww_reduce(t, keys, lsn_col=lsn_col, op_col=op_col,
                               drop_tombstones=True)
                # the SHARED canonical row encoding (stages/digest.py) —
                # replicas and table_digest outputs stay comparable
                h = row_hashes(t, want, hash="fast")
                out.append(
                    {"bucket": b.as_py(),
                     "digest": str(np.bitwise_xor.reduce(h) if len(h) else 0),
                     "rows": t.num_rows}
                )
            return pa.Table.from_pylist(
                out,
                schema=pa.schema(
                    [("bucket", pa.int64()), ("digest", pa.string()), ("rows", pa.int64())]
                ),
            )

        import ray.data

        res = (
            ray.data.from_items(items)
            .repartition(len(items))
            .map_batches(digest_bucket, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        return {
            int(r.bucket): (r.digest, int(r.rows)) for r in res.itertuples(index=False)
        }

    def compact(self, key_cols=("repo", "path", "commit")) -> bool:
        """Fold every bucket's delta files into a fresh base (one Ray task
        per bucket) and commit — bounds read amplification after many
        delta epochs."""
        import ray

        if not self.has_deltas():
            return False
        m = self.manifests.read()
        epoch = self.current_epoch() + 1
        staging = self.staging_dir(epoch)
        sets = self.bucket_file_sets()
        merge = self._merge_on_read

        @ray.remote(num_cpus=1)
        def compact_bucket(b: int, files: list[str], staging: str) -> dict:
            t = merge(files, key_cols).sort_by([(k, "ascending") for k in key_cols])
            filename = f"bucket-{b}.parquet"
            fs.write_table_atomic(t, fs.join(staging, filename), row_group_size=128 * 1024)
            return {"bucket": b, "filename": filename, "rows": t.num_rows}

        entries = ray.get([compact_bucket.remote(b, files, staging) for b, files in sets.items()])
        written = {
            e["bucket"]: {
                "filename": e["filename"],
                "rows": e["rows"],
                "hwm_lsn": int(m["buckets"][str(e["bucket"])].get("hwm_lsn", m["hwm_lsn"])),
                "stats": {"compacted": True},
            }
            for e in entries
        }
        return self.commit_epoch(
            epoch, written, m["hwm_lsn"], {"compaction": True}, {"source": "compact"}, mode="overwrite"
        )

    def rebucket(self, new_num_buckets: int, key_cols=("repo", "path", "commit")) -> bool:
        """Change the bucket count WITHOUT a shuffle — the online layout
        migration a growing table needs (64 buckets at 100 TB is 1.5 TB
        per bucket; merge tasks and point reads want splits long before
        that).

        Works for k-multiple changes only, and that restriction is the
        whole design: with ``bucket = hash mod N``, growing to ``k*N``
        means every row of old bucket ``b`` lands in one of exactly k
        children ``{b, b+N, .., b+(k-1)N}`` — so a split is one
        independent task per OLD bucket (read its base+delta set, fold,
        partition among its k children, write), and a shrink to ``N/k``
        is one task per NEW bucket reading its k contributors. No
        cross-task row ever moves; an arbitrary (non-multiple) target
        would be an all-to-all exchange and is refused. The change
        commits as a normal overwrite epoch (atomic manifest swing,
        time-travelable, idempotent on retry); subsequent replays pick
        the new count up from the manifest automatically.
        """
        import ray

        old = self.num_buckets
        if new_num_buckets == old:
            return False
        if new_num_buckets < 1 or (new_num_buckets % old and old % new_num_buckets):
            raise ValueError(
                f"rebucket {old} -> {new_num_buckets}: target must be a "
                "multiple or divisor of the current bucket count (anything "
                "else is an all-to-all shuffle; replay into a fresh table "
                "for that)"
            )
        m = self.manifests.read()
        if m is None:
            # nothing committed yet: just adopt the new count for epoch 0
            self.num_buckets = new_num_buckets
            return True
        epoch = self.current_epoch() + 1
        staging = self.staging_dir(epoch)
        sets = self.bucket_file_sets()
        merge = self._merge_on_read
        table_hwm = int(m["hwm_lsn"])

        def _write_children(t: pa.Table, staging: str) -> list[dict]:
            from ..sources.event_log import fast_hash_bucket

            out = []
            child = fast_hash_bucket(
                t.column("repo").combine_chunks(),
                t.column("path").combine_chunks(),
                new_num_buckets,
            )
            for c in pc.unique(child).to_pylist():
                part = t.filter(pc.equal(child, c)).sort_by(
                    [(k, "ascending") for k in key_cols]
                )
                filename = f"bucket-{c}.parquet"
                fs.write_table_atomic(
                    part, fs.join(staging, filename), row_group_size=128 * 1024
                )
                out.append({"bucket": int(c), "filename": filename, "rows": part.num_rows})
            return out

        if new_num_buckets > old:
            # split: one task per OLD bucket, children are disjoint by
            # construction (child ≡ parent mod old)
            @ray.remote(num_cpus=1)
            def split_bucket(files: list[str], hwm: int) -> list[dict]:
                entries = _write_children(merge(files, key_cols), staging)
                for e in entries:
                    e["hwm_lsn"] = hwm
                return entries

            futs = [
                split_bucket.remote(
                    files, int(m["buckets"][str(b)].get("hwm_lsn", table_hwm))
                )
                for b, files in sets.items()
            ]
            entries = [e for part in ray.get(futs) for e in part]
        else:
            # shrink: one task per NEW bucket over its k contributors
            k = old // new_num_buckets
            groups: dict[int, list[int]] = {}
            for b in sets:
                groups.setdefault(b % new_num_buckets, []).append(b)

            @ray.remote(num_cpus=1)
            def merge_buckets(c: int, contributors: list[int]) -> dict:
                from ..state.schema_evolution import unify_tables

                t = unify_tables([merge(sets[b], key_cols) for b in contributors])
                t = t.sort_by([(kc, "ascending") for kc in key_cols])
                filename = f"bucket-{c}.parquet"
                fs.write_table_atomic(
                    t, fs.join(staging, filename), row_group_size=128 * 1024
                )
                return {"bucket": c, "filename": filename, "rows": t.num_rows}

            hwms = {
                c: max(
                    int(m["buckets"][str(b)].get("hwm_lsn", table_hwm))
                    for b in contributors
                )
                for c, contributors in groups.items()
            }
            entries = ray.get(
                [merge_buckets.remote(c, bs) for c, bs in sorted(groups.items())]
            )
            for e in entries:
                e["hwm_lsn"] = hwms[e["bucket"]]

        written = {
            e["bucket"]: {
                "filename": e["filename"],
                "rows": e["rows"],
                "hwm_lsn": e["hwm_lsn"],
                "stats": {"rebucketed_from": old},
            }
            for e in entries
        }
        self.num_buckets = new_num_buckets
        try:
            ok = self.commit_epoch(
                epoch,
                written,
                table_hwm,
                {"rebucket": {"from": old, "to": new_num_buckets}},
                {"source": "rebucket"},
                mode="overwrite",
            )
        except BaseException:
            self.num_buckets = old
            raise
        if not ok:
            self.num_buckets = old
        return ok

    # --- named epoch tags (retention anchors / refs) --------------------
    @property
    def _tags_dir(self) -> str:
        return fs.join(self.table_dir, "_manifests", "tags")

    def tag_epoch(self, name: str, epoch: int | None = None, force: bool = False) -> int:
        """Pin a name to an epoch (current by default). Tags are retention
        anchors: ``vacuum`` keeps every file a tagged manifest references,
        so ``snapshot(epoch=resolve_tag(name))`` stays readable no matter
        how far the table moves on. Immutable unless ``force`` (the git
        tag -f semantics)."""
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"bad tag name: {name!r}")
        epoch = self.current_epoch() if epoch is None else int(epoch)
        try:
            m = self.manifests.read(epoch) if epoch >= 0 else None
        except FileNotFoundError:
            m = None
        if m is None:
            raise ValueError(f"tag {name}: epoch {epoch} is not committed")
        path = fs.join(self._tags_dir, name)
        fs.makedirs(self._tags_dir)
        if fs.exists(path) and not force:
            raise ValueError(f"tag {name} exists (epoch {self.resolve_tag(name)}); use force to move it")
        fs.write_text_atomic(path, str(epoch))
        return epoch

    def resolve_tag(self, name: str) -> int:
        try:
            return int(fs.read_text(fs.join(self._tags_dir, name)).strip())
        except FileNotFoundError:
            raise ValueError(f"unknown tag: {name}")

    def delete_tag(self, name: str) -> None:
        fs.unlink(fs.join(self._tags_dir, name))

    def list_tags(self) -> dict[str, int]:
        if not fs.exists(self._tags_dir):
            return {}
        return {n: self.resolve_tag(n) for n in sorted(fs.listdir(self._tags_dir))}

    def vacuum(self, keep_epochs: int = 1) -> list[str]:
        """Delete data files not referenced by the last ``keep_epochs``
        committed manifests, by any TAGGED manifest, or by orphaned
        staging. Returns removed paths."""
        cur = self.current_epoch()
        if cur < 0:
            return []
        referenced: set[str] = set()
        kept = 0
        keep_set = set(self.list_tags().values())
        for e in range(cur, -1, -1):
            pinned = e in keep_set
            if kept >= keep_epochs and not pinned:
                continue
            try:
                m = self.manifests.read(e)
            except FileNotFoundError:
                continue
            if m is None:
                continue
            for entry in m["buckets"].values():
                if entry.get("file"):
                    referenced.add(self._resolve(entry["file"]))
                referenced.update(
                    self._resolve(f) for f in entry.get("delta_files", [])
                )
            if not pinned:
                kept += 1
        removed = []
        data_root = fs.join(self.table_dir, "data")
        for p in fs.find_files(data_root):
            if p not in referenced:
                fs.unlink(p)
                removed.append(p)
        staging_root = fs.join(self.table_dir, "_staging")
        if fs.exists(staging_root):
            fs.rmtree(staging_root)
            removed.append(staging_root)
        # drop manifests older than the kept window (CURRENT stays valid;
        # tagged epochs' manifests are anchors and stay readable)
        for fn in fs.listdir(self.manifests.manifest_dir):
            if fn.startswith("manifest-"):
                e = int(fn.split("-")[1].split(".")[0])
                if e <= cur - keep_epochs and e not in keep_set:
                    fs.unlink(fs.join(self.manifests.manifest_dir, fn))
        return removed

    def fsck(self, epoch: int | None = None, deep: bool = False) -> dict:
        """Manifest↔storage consistency check (footer metadata only, no
        data pages): every referenced file exists and is a readable
        parquet; base-file footer row counts match the manifest; per-
        bucket HWMs never exceed the table HWM; no stale staging dirs.
        ``deep=True`` additionally reads each file's (repo, path) columns
        and verifies every row hashes to the bucket holding it — the
        placement invariant all pruned reads (lookup, merge) rely on;
        catches hand-moved files and foreign-layout data the footer
        checks can't. Deep is a key-column scan: opt-in, run it per
        suspect bucket at scale, not per table.
        Returns {"ok": bool, "files_checked": n, "issues": [...]}."""
        import pyarrow.parquet as pq

        issues: list[str] = []
        m = self.manifests.read(epoch)
        if m is None:
            return {"ok": True, "files_checked": 0, "issues": []}
        n_buckets = int(m["num_buckets"])
        table_hwm = int(m["hwm_lsn"])
        checked = 0
        for b, e in m["buckets"].items():
            refs = []
            if e.get("file"):
                # rows may be absent in hand-written / legacy manifests:
                # keep None so the mismatch check is skipped (a -1
                # sentinel would report a spurious mismatch)
                rows = e.get("rows")
                refs.append((self._resolve(e["file"]), int(rows) if rows is not None else None))
            for f in e.get("delta_files", []):
                refs.append((self._resolve(f), None))
            for path, want_rows in refs:
                checked += 1
                if not fs.exists(path):
                    issues.append(f"bucket {b}: missing file {path}")
                    continue
                try:
                    got = pq.ParquetFile(path).metadata.num_rows
                except Exception as exc:  # corrupt footer
                    issues.append(f"bucket {b}: unreadable parquet {path}: {exc}")
                    continue
                if want_rows is not None and got != want_rows:
                    issues.append(
                        f"bucket {b}: row count mismatch {path}: manifest={want_rows} footer={got}"
                    )
                if deep and got:
                    from ..sources.event_log import fast_hash_bucket

                    t = fs.read_table(path, columns=["repo", "path"])
                    h = fast_hash_bucket(
                        t.column("repo").combine_chunks(),
                        t.column("path").combine_chunks(),
                        n_buckets,
                    )
                    bad = pc.sum(pc.cast(pc.not_equal(h, int(b)), pa.int64())).as_py() or 0
                    if bad:
                        issues.append(
                            f"bucket {b}: {bad} misplaced rows in {path} "
                            f"(keys hash elsewhere under {n_buckets} buckets)"
                        )
            if int(e.get("hwm_lsn", -1)) > table_hwm:
                issues.append(
                    f"bucket {b}: bucket hwm {e.get('hwm_lsn')} exceeds table hwm {table_hwm}"
                )
        staging_root = fs.join(self.table_dir, "_staging")
        if fs.exists(staging_root) and fs.listdir(staging_root):
            issues.append(f"stale staging dirs under {staging_root} (crashed attempt; next replay wipes them)")
        return {"ok": not issues, "files_checked": checked, "issues": issues}

    def clone_to(self, dest_dir: str, epoch: int | None = None) -> "LakeTable":
        """Zero-copy shallow clone (branching): the destination table
        starts from this table's state at ``epoch`` WITHOUT copying any
        data file — its first manifest references the source's files by
        absolute path. Upserts on the clone copy-on-write only the
        buckets they touch (new files land under the clone's own data/
        dir); the source is never modified, and the two tables evolve
        independently from the shared base.

        Delta-style caveat: ``vacuum`` on the SOURCE can delete files a
        clone still references (a clone's own vacuum never touches
        foreign files — it only scans its own data/ dir). Keep the source
        epoch retained, or compact the clone to materialize it."""
        m = self.manifests.read(epoch)
        if m is None:
            raise ValueError(f"nothing to clone: {self.table_dir} has no committed epoch")
        src_base = (
            self.table_dir if fs.is_uri(self.table_dir) else os.path.abspath(self.table_dir)
        )

        def _abs(ref: str) -> str:
            if fs.is_uri(ref) or os.path.isabs(ref):
                return ref  # already foreign (this table is itself a clone)
            return fs.join(src_base, ref)

        buckets = {}
        for b, e in m["buckets"].items():
            e2 = dict(e)
            if e2.get("file"):
                e2["file"] = _abs(e2["file"])
            if e2.get("delta_files"):
                e2["delta_files"] = [_abs(f) for f in e2["delta_files"]]
            buckets[b] = e2
        dest = LakeTable(dest_dir, self.num_buckets)
        if dest.current_epoch() >= 0:
            raise ValueError(f"clone destination {dest_dir} is not empty")
        manifest = dict(
            m,
            buckets=buckets,
            lineage={"cloned_from": src_base, "source_epoch": int(m["epoch"])},
            parent_epoch=-1,
        )
        dest.manifests.commit(int(m["epoch"]), manifest)
        return dest

    def restore(self, to_epoch: int) -> int:
        """Roll the table back to ``to_epoch`` by committing a NEW epoch
        whose manifest re-references that epoch's files — no data moves,
        history is preserved (the rolled-back epochs stay time-travelable
        until vacuumed), and the rollback itself is an ordinary atomic
        manifest commit. The Delta Lake RESTORE semantics.

        The restored manifest carries the old epoch's bucket layout and
        HWM, so a later replay re-applies the rolled-back LSN window from
        the log; LWW merge makes that re-application idempotent — the
        table converges back to head state if replayed, or evolves down
        the new timeline otherwise. If the log was purged ABOVE the
        restored HWM, replay refuses (PurgedLogError) rather than
        silently losing the gap.

        Returns the new epoch. Raises if ``to_epoch`` is not retained
        (vacuumed away) or is the current epoch."""
        cur = self.current_epoch()
        if to_epoch == cur:
            raise ValueError(f"restore: epoch {to_epoch} is already current")
        try:
            m = self.manifests.read(to_epoch)
        except FileNotFoundError:
            m = None
        if m is None:
            raise ValueError(
                f"restore: epoch {to_epoch} is not retained (vacuumed?)"
            )
        # files referenced by a retained manifest may already be gone if a
        # vacuum kept the manifest but not its files — fail fast, not at
        # first read
        for entry in m["buckets"].values():
            for ref in [entry.get("file")] + list(entry.get("delta_files", [])):
                if ref and not fs.exists(self._resolve(ref)):
                    raise ValueError(
                        f"restore: epoch {to_epoch} data file missing "
                        f"(vacuumed): {ref}"
                    )
        new_epoch = cur + 1
        manifest = dict(
            m,
            metrics={"restored_from": int(to_epoch)},
            lineage={"op": "restore", "from_epoch": int(to_epoch)},
            parent_epoch=cur,
        )
        if not self.manifests.commit(new_epoch, manifest):
            raise RuntimeError(f"restore: epoch {new_epoch} already committed")
        self.num_buckets = int(m["num_buckets"])
        return new_epoch

    def layout_stats(self, epoch: int | None = None) -> dict:
        """Per-bucket layout report from manifest + parquet footers only
        (no data pages): row/byte distribution, delta-chain depth, and a
        skew factor (max/mean rows) — what an operator reads to decide
        when to ``rebucket`` (split when buckets outgrow the merge-task
        budget) or ``compact`` (when chains deepen)."""
        m = self.manifests.read(epoch)
        if m is None:
            return {"buckets": 0, "rows_total": 0}
        rows: list[int] = []
        byts: list[int] = []
        depths: list[int] = []
        for b, files in self.bucket_file_sets(epoch).items():
            r = t = 0
            for f in files:
                md = fs.parquet_file(f).metadata
                r += md.num_rows
                t += sum(
                    md.row_group(i).total_byte_size for i in range(md.num_row_groups)
                )
            rows.append(r)
            byts.append(t)
            depths.append(len(files) - 1)
        if not rows:
            return {"buckets": 0, "rows_total": 0}
        srt = sorted(rows)
        n = len(srt)
        mean = sum(rows) / n
        return {
            "num_buckets": int(m["num_buckets"]),
            "occupied_buckets": n,
            "rows_total": sum(rows),
            "bytes_total": sum(byts),
            "rows_min": srt[0],
            "rows_median": srt[n // 2],
            "rows_max": srt[-1],
            "rows_p99": srt[min(n - 1, int(n * 0.99))],
            "skew_max_over_mean": round(srt[-1] / mean, 3) if mean else 0.0,
            "max_delta_depth": max(depths),
            "largest_bucket_bytes": max(byts),
        }

    def maintain(
        self,
        *,
        max_delta_depth: int = 3,
        target_bucket_bytes: int = 256 << 20,
        min_buckets: int = 8,
        vacuum_keep_epochs: int | None = None,
        dry_run: bool = False,
    ) -> dict:
        """Observe → act in one idempotent call: read ``layout_stats``
        (manifest + footers only) and run whichever maintenance the
        thresholds demand —

        - ``compact``   when the deepest delta chain exceeds
          ``max_delta_depth`` (merge-on-read cost grows with the chain),
        - ``rebucket`` SPLIT when the largest bucket outgrows
          ``target_bucket_bytes`` (the unit of merge-task memory): one
          call computes the full power-of-two factor k so largest/k fits,
        - ``rebucket`` SHRINK (halve) when buckets average under 1/16 of
          the target and the count is above ``min_buckets`` (per-task
          scheduling overhead dominates tiny buckets),
        - ``vacuum``    when ``vacuum_keep_epochs`` is given (tag anchors
          are respected as always).

        A healthy table yields no actions, so a cron loop of
        ``maintain`` is safe. ``dry_run`` returns the plan untouched."""
        before = self.layout_stats()
        actions: list[dict] = []
        if before.get("rows_total", 0):
            if before["max_delta_depth"] > max_delta_depth:
                actions.append({"op": "compact", "reason": f"delta depth {before['max_delta_depth']} > {max_delta_depth}"})
            largest = before["largest_bucket_bytes"]
            if largest > target_bucket_bytes:
                k = 1
                while largest / (2 * k) > target_bucket_bytes and 2 * k * before["num_buckets"] <= 4096:
                    k *= 2
                actions.append({
                    "op": "rebucket",
                    "target": before["num_buckets"] * 2 * k,
                    "reason": f"largest bucket {largest >> 20} MiB > {target_bucket_bytes >> 20} MiB",
                })
            elif (
                before["num_buckets"] > min_buckets
                and before["bytes_total"] / before["num_buckets"] < target_bucket_bytes / 16
            ):
                actions.append({
                    "op": "rebucket",
                    "target": max(min_buckets, before["num_buckets"] // 2),
                    "reason": "buckets average under 1/16 of target size",
                })
        if vacuum_keep_epochs is not None:
            actions.append({"op": "vacuum", "keep_epochs": vacuum_keep_epochs})
        out = {"actions": actions, "stats_before": before, "dry_run": dry_run}
        if dry_run:
            return out
        for a in actions:
            if a["op"] == "compact":
                a["done"] = self.compact()
            elif a["op"] == "rebucket":
                a["done"] = self.rebucket(a["target"])
            elif a["op"] == "vacuum":
                a["removed"] = len(self.vacuum(keep_epochs=a["keep_epochs"]))
                a["done"] = True
        if actions:
            out["stats_after"] = LakeTable(self.table_dir).layout_stats()
        return out

    def metrics(self) -> dict:
        m = self.manifests.read()
        return m.get("metrics", {}) if m else {}

    # --- write side --------------------------------------------------------

    def staging_dir(self, epoch: int) -> str:
        d = fs.join(self.table_dir, "_staging", f"epoch-{epoch}")
        fs.makedirs(d)
        return d

    def commit_epoch(
        self,
        epoch: int,
        written_buckets: dict[int, dict],
        hwm_lsn: int,
        metrics: dict,
        lineage: dict,
        schema_str: str | None = None,
        mode: str = "upsert",
    ) -> bool:
        """Publish an epoch: move staged bucket files into data/, carry over
        untouched buckets from the parent manifest, swing CURRENT.

        Idempotent: returns False without side effects if ``epoch`` is
        already committed. ``mode='upsert'`` replaces touched buckets
        (copy-on-write); ``mode='overwrite'`` drops all previous buckets;
        ``mode='delta'`` APPENDS each staged file to its bucket's delta
        list (LSM-style: merge-on-read, no base rewrite — tombstones stay
        in the delta files so reads can delete base rows).
        """
        if self.manifests.current_epoch() >= epoch:
            return False
        prev = self.manifests.read()
        buckets: dict[str, dict] = {}
        if prev and mode in ("upsert", "delta"):
            buckets.update({str(k): dict(v) for k, v in prev["buckets"].items()})

        data_dir = fs.join(self.table_dir, "data", f"epoch-{epoch}")
        fs.makedirs(data_dir)
        staging = self.staging_dir(epoch)
        for b, entry in written_buckets.items():
            staged = fs.join(staging, entry["filename"])
            if mode != "delta" and entry.get("rows", 0) == 0:
                # bucket became empty (all keys tombstoned) -> drop it
                buckets.pop(str(b), None)
                if fs.exists(staged):
                    fs.unlink(staged)
                continue
            final_rel = os.path.join("data", f"epoch-{epoch}", entry["filename"])
            final_abs = fs.join(self.table_dir, final_rel)
            if fs.exists(staged):
                fs.replace_into(staged, final_abs)
            elif not fs.exists(final_abs):
                raise FileNotFoundError(f"bucket {b}: neither staged nor final file exists: {staged}")
            if mode == "delta":
                cur = buckets.get(str(b), {"file": None, "rows": 0, "delta_files": []})
                cur.setdefault("delta_files", [])
                cur["delta_files"].append(final_rel)
                cur["hwm_lsn"] = int(entry.get("hwm_lsn", hwm_lsn))
                cur["delta_rows"] = int(cur.get("delta_rows", 0)) + int(entry["rows"])
                buckets[str(b)] = cur
            else:
                buckets[str(b)] = {
                    "file": final_rel,
                    "rows": int(entry["rows"]),
                    "hwm_lsn": int(entry.get("hwm_lsn", hwm_lsn)),
                    "stats": entry.get("stats", {}),
                }
        fs.rmtree(staging)
        manifest = {
            "num_buckets": self.num_buckets,
            "partitioner": PARTITIONER_ID,
            "mode": mode,
            "buckets": buckets,
            "hwm_lsn": int(hwm_lsn),
            "metrics": metrics,
            "lineage": lineage,
            "schema": schema_str,
            "parent_epoch": prev["epoch"] if prev else -1,
        }
        return self.manifests.commit(epoch, manifest)


def coarsen_digests(digests: dict, num_buckets: int, g: int) -> dict:
    """Fold a ``bucket_digests`` map from ``num_buckets`` granularity down
    to divisor granularity ``g`` WITHOUT re-reading any data: with
    ``bucket = hash mod N``, coarse bucket ``c`` under ``g | N`` holds
    exactly the keys of fine buckets ``b ≡ c (mod g)``, and XOR digests
    fold with XOR (associative, order-free) while row counts add."""
    if g < 1 or num_buckets % g:
        raise ValueError(
            f"coarsen_digests: {g} does not divide the bucket count {num_buckets}"
        )
    acc: dict[int, tuple[int, int]] = {}
    for b, (digest, rows) in digests.items():
        c = int(b) % g
        d0, r0 = acc.get(c, (0, 0))
        acc[c] = (d0 ^ int(digest), r0 + int(rows))
    return {c: (str(d), r) for c, (d, r) in acc.items()}


def compare_digests(
    digests_a: dict, num_buckets_a: int, digests_b: dict, num_buckets_b: int
) -> list[int]:
    """Anti-entropy comparison of two replicas' ``bucket_digests`` maps
    that stays correct when the replicas' bucket counts differ (one side
    ran ``rebucket``): both maps are folded to the shared
    ``g = gcd(N_a, N_b)`` granularity and compared there. Returns the
    sorted coarse bucket ids whose live state diverges — the key ranges
    a re-sync must ship. Same-count replicas degenerate to the plain
    per-bucket comparison (g = N)."""
    import math

    g = math.gcd(int(num_buckets_a), int(num_buckets_b))
    ca = coarsen_digests(digests_a, num_buckets_a, g)
    cb = coarsen_digests(digests_b, num_buckets_b, g)
    empty = ("0", 0)
    return sorted(
        c for c in set(ca) | set(cb) if ca.get(c, empty) != cb.get(c, empty)
    )
