"""Reusable broadcast joins: the map-side join family for small
dimension tables.

The dimension is collected once on the driver, shipped to the object
store with ``ray.put`` (read zero-copy by every task — never re-shipped
per batch), and each fact batch resolves it with one vectorized
``pc.index_in`` + ``take`` per lookup. No shuffle; the fact side never
moves. This generalizes the pattern the query suite uses
(nation_region_join, supplier_nation_region, customers_without_orders)
into one stage the way the reference's is_in reconciliation generalizes
its anti join (transform_hdd_deduplication.rs:241-252).

Use when the dimension fits comfortably in the object store (rule of
thumb: <~1 GB). For two big sides, use the tagged-union grouped merge
(pipelines/queries.customer_order_revenue) or Dataset.join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _as_table(dim) -> pa.Table:
    import ray.data

    if isinstance(dim, pa.Table):
        return dim
    if isinstance(dim, ray.data.Dataset):
        return pa.Table.from_pylist(dim.take_all())
    raise TypeError(type(dim))


def broadcast_lookup_join(
    ds,
    dim,
    on: str,
    dim_key: str,
    take_cols: dict[str, str],
    how: str = "left",
):
    """Attach dimension columns to every fact row.

    ``take_cols`` maps dim column -> output column name. ``how``:
    "left" keeps unmatched fact rows (nulls), "inner" drops them.
    """
    import ray

    t = _as_table(dim)
    payload = (
        t.column(dim_key).combine_chunks(),
        {out: t.column(src).combine_chunks() for src, out in take_cols.items()},
    )
    ref = ray.put(payload)

    def join_fn(batch: pa.Table) -> pa.Table:
        keys, cols = ray.get(ref)
        pos = pc.index_in(batch.column(on), value_set=keys)
        if how == "inner":
            keep = pc.is_valid(pos)
            batch = batch.filter(keep)
            pos = pos.filter(keep)
        for out, arr in cols.items():
            batch = batch.append_column(out, arr.take(pos))
        return batch

    return ds.map_batches(join_fn, batch_format="pyarrow", zero_copy_batch=True)


def broadcast_semi_join(ds, keys, on: str, anti: bool = False):
    """Keep fact rows whose key is (semi) / is not (anti) in ``keys`` —
    the reference's is_in membership filter as a broadcast stage.
    ``keys``: pa.Array / list, or a Dataset of one column (distinct
    aggregated dataset-side before the driver ever sees it)."""
    import ray
    import ray.data

    if isinstance(keys, ray.data.Dataset):
        name = keys.schema().names[0]
        keys = keys.map_batches(
            lambda b, _n=name: pa.table({_n: pc.unique(b.column(_n))}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).unique(name)
        keys = pa.array(sorted(keys))
    elif not isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = pa.array(sorted(keys))
    ref = ray.put(keys)

    def filt(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        mask = pc.is_in(batch.column(on), value_set=ks)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def keyed_lookup_join(
    fact,
    dim,
    on: str,
    dim_key: str,
    take_cols: dict[str, str],
    how: str = "inner",
    num_partitions: int | None = None,
):
    """The shuffle-tier sibling of ``broadcast_lookup_join``: attach
    dimension columns when the dimension is too big to broadcast. One
    tagged union keyed on the join key, hash-repartitioned, then a
    whole-block index_in/take per partition. ``dim`` must be unique on
    ``dim_key`` (a lookup, not a general join). ``how``: "inner" drops
    unmatched fact rows, "anti" keeps ONLY unmatched fact rows (and
    attaches nothing), "left" keeps all."""
    import ray.data
    from ray.data.context import ShuffleStrategy

    def _pa_types(ds) -> dict:
        sch = ds.schema()
        base = getattr(sch, "base_schema", sch)
        return dict(zip(base.names, base.types))

    fact_types = _pa_types(fact)
    dim_types = _pa_types(dim)
    fact_cols = list(fact_types)
    payload = [c for c in fact_cols if c != on]
    out_cols = {out for out in take_cols.values()}
    if out_cols & set(fact_cols):
        raise ValueError(f"take_cols collide with fact columns: {out_cols & set(fact_cols)}")
    # plain dicts only below — closures must not capture the Datasets
    payload_types = {c: fact_types[c] for c in payload}
    taken_types = {out: dim_types[src] for src, out in take_cols.items()}

    def tag_dim(b: pa.Table) -> pa.Table:
        cols = {on: b.column(dim_key)}
        for c in payload:
            cols[c] = pa.nulls(b.num_rows, payload_types[c])
        for src, out in take_cols.items():
            cols["__d_" + out] = b.column(src)
        cols["__dim"] = pa.array(np.ones(b.num_rows, dtype=bool))
        return pa.table(cols)

    def tag_fact(b: pa.Table) -> pa.Table:
        cols = {on: b.column(on)}
        for c in payload:
            cols[c] = b.column(c)
        for _, out in take_cols.items():
            cols["__d_" + out] = pa.nulls(b.num_rows, taken_types[out])
        cols["__dim"] = pa.array(np.zeros(b.num_rows, dtype=bool))
        return pa.table(cols)

    def merge(t: pa.Table) -> pa.Table:
        t = t.combine_chunks()
        dmask = t.column("__dim").combine_chunks()
        d = t.filter(dmask)
        f = t.filter(pc.invert(dmask))
        pos = pc.index_in(
            f.column(on).combine_chunks(), value_set=d.column(on).combine_chunks()
        )
        if how == "anti":
            out = f.filter(pc.is_null(pos))
            return out.drop_columns(
                ["__dim"] + [c for c in out.column_names if c.startswith("__d_")]
            )
        cols = {on: f.column(on)}
        for c in payload:
            cols[c] = f.column(c)
        for _, outn in take_cols.items():
            cols[outn] = d.column("__d_" + outn).combine_chunks().take(pos)
        out = pa.table(cols)
        if how == "inner":
            out = out.filter(pc.is_valid(pos))
        return out

    u = fact.map_batches(tag_fact, batch_format="pyarrow", zero_copy_batch=True).union(
        dim.map_batches(tag_dim, batch_format="pyarrow", zero_copy_batch=True)
    )
    u.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    nparts = num_partitions or 16
    out = u.repartition(num_blocks=nparts, keys=[on]).map_batches(
        merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    from ..util import drop_empty_blocks

    out = drop_empty_blocks(out)
    out.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return out


def _key_hash64(arr: "pa.Array | pa.ChunkedArray") -> "tuple[np.ndarray, np.ndarray | None]":
    """Vectorized version-stable 64-bit hash of a key column: integers go
    straight through splitmix64; strings/binary use the owned poly64-v1
    rolling hash (sources/event_log.stable_hash64). Returns
    (hashes, null_mask-or-None) — a null integer key would otherwise
    convert the WHOLE batch to float64+NaN and corrupt every row's hash
    through the uint64 reinterpret."""
    import numpy as np

    from ..sources.event_log import _splitmix64, stable_hash64

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    nulls = None
    if arr.null_count:
        nulls = pc.is_null(arr).to_numpy(zero_copy_only=False)
        arr = arr.fill_null(0) if pa.types.is_integer(arr.type) else arr.fill_null("")
    if pa.types.is_integer(arr.type):
        v = arr.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
        return _splitmix64(v.copy()), nulls
    return stable_hash64(arr), nulls


def build_bloom(keys_ds, on: str, *, bits_log2: int = 20, k: int = 4):
    """Distributed Bloom-filter build over a key column: each batch folds
    to ONE partial bitmap (numpy bitwise_or at k probe positions derived
    Kirsch-Mitzenmacher style from one 64-bit hash), the driver OR-merges
    the per-block partials — m/8 bytes each, no shuffle. Returns the
    bitmap (np.uint64 words) ready for ``ray.put``.

    Size ``bits_log2`` to the key cardinality: false-positive rate is
    (1 - e^(-k*n/m))^k — at m/n = 16 and k = 4 that is ~0.24%."""
    import numpy as np

    m_words = (1 << bits_log2) >> 6

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(m_words, dtype=np.uint64)
        h, nulls = _key_hash64(b.column(on))
        if nulls is not None:
            h = h[~nulls]  # null keys never join; keep them out of the filter
        h1 = h >> np.uint64(64 - bits_log2)
        h2 = (h & np.uint64((1 << 32) - 1)) | np.uint64(1)  # odd -> full-period step
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) & np.uint64((1 << bits_log2) - 1)
            np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], pa.large_binary())})

    parts = keys_ds.select_columns([on]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()
    bitmap = np.zeros(m_words, dtype=np.uint64)
    for row in parts:
        bitmap |= np.frombuffer(row["bm"], dtype=np.uint64)
    return bitmap


def bloom_semi_join(
    fact,
    dim,
    on: str,
    dim_key: str | None = None,
    *,
    bits_log2: int = 20,
    k: int = 4,
    anti: bool = False,
    verify: str | None = "broadcast",
    counters: dict | None = None,
):
    """Semi/anti join with a Bloom prefilter — the 100-TB shape: the
    dimension's keys fold to ONE m-bit bitmap (``build_bloom``, no
    shuffle), every fact batch drops non-members with k vectorized bit
    probes against the broadcast bitmap, and only the tiny survivor set
    pays for exact verification. ``verify="broadcast"`` re-checks
    survivors against the exact distinct key set (collected
    dataset-side), making the result EXACT — at a scale where even the
    distinct key set can't broadcast, verify the survivors with one
    keyed shuffle join instead (they are ~sel + 0.24% of the fact side,
    not the fact side). ``verify=None`` returns the probabilistic
    prefilter output alone (supersets the true result by the FPR; not
    valid for ``anti``).

    ``counters`` (optional dict) receives ``bloom_survivors`` — the
    per-run evidence of how much the prefilter pruned."""
    import ray

    if anti and verify is None:
        raise ValueError("anti join requires exact verification")
    dim_key = dim_key or on
    dkeys = dim.select_columns([dim_key])
    if dim_key != on:
        dkeys = dkeys.map_batches(
            lambda b, _d=dim_key, _o=on: b.rename_columns([_o]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    bitmap_ref = ray.put(build_bloom(dkeys, on, bits_log2=bits_log2, k=k))

    def make_probe(keep_members: bool):
        def probe(batch: pa.Table) -> pa.Table:
            import numpy as np

            bm = ray.get(bitmap_ref)
            h, nulls = _key_hash64(batch.column(on))
            h1 = h >> np.uint64(64 - bits_log2)
            h2 = (h & np.uint64((1 << 32) - 1)) | np.uint64(1)
            member = np.ones(len(h), dtype=bool)
            for i in range(k):
                pos = (h1 + np.uint64(i) * h2) & np.uint64((1 << bits_log2) - 1)
                bit = (bm[(pos >> np.uint64(6)).astype(np.int64)]
                       >> (pos & np.uint64(63))) & np.uint64(1)
                member &= bit.astype(bool)
            if nulls is not None:
                # null keys are definite non-members (is_in semantics)
                member &= ~nulls
            return batch.filter(pa.array(member if keep_members else ~member))

        return probe

    survivors = fact.map_batches(
        make_probe(True), batch_format="pyarrow", zero_copy_batch=True
    )
    if verify is None:
        return survivors
    if verify not in ("broadcast", "shuffle"):
        raise ValueError(f"unknown verify mode {verify!r}")
    if counters is not None:
        survivors = survivors.materialize()
        counters["bloom_survivors"] = survivors.count()

    def _exact(side, anti_: bool):
        if verify == "broadcast":
            return broadcast_semi_join(side, dkeys, on, anti=anti_)
        # shuffle tier: even the distinct key set can't broadcast — the
        # survivors (~sel + FPR of the fact side) pay ONE keyed-shuffle
        # lookup against the dimension keys instead
        ddist = dkeys.map_batches(
            lambda b, _o=on: pa.table({_o: pc.unique(b.column(_o))}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return keyed_lookup_join(
            side, ddist, on=on, dim_key=on, take_cols={},
            how="anti" if anti_ else "inner",
        )

    if not anti:
        return _exact(survivors, False)
    # a Bloom filter has no false negatives, so bloom-rejected rows are
    # DEFINITE non-members; only the survivors (members + ~0.24% false
    # positives) pay the exact check to recover the rest of the anti set
    rejected = fact.map_batches(
        make_probe(False), batch_format="pyarrow", zero_copy_batch=True
    )
    false_pos = _exact(survivors, True)
    return rejected.union(false_pos)


def range_join(
    points,
    intervals,
    point_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    bucket_width: float | None = None,
    num_partitions: int | None = None,
    max_bucket_pairs: int = 50_000_000,
):
    """Distributed interval join: one output row per (point row, interval
    row) with ``lo <= point < hi``. The classic bucketed shape: the point
    domain is split into fixed-width buckets; every interval REPLICATES
    to each bucket it overlaps (intervals are the small side — tiers,
    SLA bands, histogram bins — so replication is cheap), points land in
    exactly one bucket, and ONE hash-shuffle groupby co-locates them.
    Inside a bucket the match is a lo-sorted searchsorted prefix scan +
    hi filter — vectorized, O(points x candidate prefix) worst case,
    bounded by the bucket guard.

    Partitioning assumption (documented per the custom-operator rule):
    interval span / bucket_width is the replication factor — pick
    bucket_width near the MEDIAN interval span so most intervals copy to
    O(1) buckets. Degenerate inputs (one interval spanning the whole
    domain) replicate everywhere; the ``max_bucket_pairs`` guard raises
    before a bucket goes quadratic silently.

    ``bucket_width=None`` derives it from a driver-side aggregate over
    the intervals (median span) — two tiny passes over the SMALL side
    only."""
    import numpy as np

    if bucket_width is None:
        spans = [
            r[hi_col] - r[lo_col]
            for r in intervals.select_columns([lo_col, hi_col]).take_all()
        ]
        if not spans:
            bucket_width = 1.0
        else:
            bucket_width = max(float(np.median(spans)), 1e-9)
    w = float(bucket_width)

    def tag_points(b: pa.Table) -> pa.Table:
        p = b.column(point_col).combine_chunks().to_numpy(zero_copy_only=False)
        return b.append_column("_rb", pa.array(np.floor(p / w).astype(np.int64)))

    def explode_intervals(b: pa.Table) -> pa.Table:
        lo = b.column(lo_col).combine_chunks().to_numpy(zero_copy_only=False)
        hi = b.column(hi_col).combine_chunks().to_numpy(zero_copy_only=False)
        first = np.floor(lo / w).astype(np.int64)
        # hi is exclusive: a bucket starting exactly at hi gets no copy
        last = np.ceil(hi / w).astype(np.int64) - 1
        last = np.maximum(last, first)
        counts = (last - first + 1).astype(np.int64)
        idx = np.repeat(np.arange(b.num_rows), counts)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        buckets = first[idx] + (np.arange(len(idx)) - offsets[idx])
        out = b.take(pa.array(idx))
        return out.append_column("_rb", pa.array(buckets))

    pts = points.map_batches(tag_points, batch_format="pyarrow", zero_copy_batch=True)
    ivs = intervals.map_batches(explode_intervals, batch_format="pyarrow", zero_copy_batch=True)

    pt_schema = points.schema()
    iv_schema = intervals.schema()
    pt_cols = list(pt_schema.names)
    iv_cols = list(iv_schema.names)
    pt_types = dict(zip(pt_schema.names, pt_schema.types))
    iv_types = dict(zip(iv_schema.names, iv_schema.types))
    if set(pt_cols) & set(iv_cols):
        raise ValueError(
            f"point/interval column names must be disjoint, both have: "
            f"{sorted(set(pt_cols) & set(iv_cols))}"
        )
    ordered = pt_cols + iv_cols + ["_rb"]

    def side_tag(side: int, pad: "dict[str, pa.DataType]"):
        # pad each side with typed nulls for the OTHER side's columns so
        # the union has ONE schema in ONE column order (heterogeneous
        # unions break the keyed shuffle downstream)
        def fn(b: pa.Table) -> pa.Table:
            for c, t in pad.items():
                if c not in b.column_names:
                    b = b.append_column(c, pa.nulls(b.num_rows, t))
            b = b.select(ordered)
            return b.append_column("_side", pa.array(np.full(b.num_rows, side, dtype=np.int8)))

        return fn

    both = pts.map_batches(
        side_tag(0, iv_types), batch_format="pyarrow", zero_copy_batch=True
    ).union(
        ivs.map_batches(side_tag(1, pt_types), batch_format="pyarrow", zero_copy_batch=True)
    )

    def bucket_match(block: pa.Table) -> pa.Table:
        # whole-block kernel: a hash partition holds MANY _rb buckets —
        # sort by _rb, walk bucket segments in python (bounded by the
        # bucket count, not the row count) with the numpy candidate
        # expansion inside each segment
        empty_cols = {c: pa.array([], block.schema.field(c).type) for c in pt_cols + iv_cols}
        if block.num_rows == 0:
            return pa.table(empty_cols)
        block = block.take(pc.sort_indices(block, sort_keys=[("_rb", "ascending")]))
        from ..stages.merge_apply import _first_per_key_mask

        first = _first_per_key_mask(block, ("_rb",)).to_numpy(zero_copy_only=False)
        bounds = np.flatnonzero(first).tolist() + [block.num_rows]
        pieces = []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            group = block.slice(s0, s1 - s0)
            sides = group.column("_side").combine_chunks().to_numpy(zero_copy_only=False)
            p_rows = group.filter(pa.array(sides == 0))
            i_rows = group.filter(pa.array(sides == 1))
            if p_rows.num_rows == 0 or i_rows.num_rows == 0:
                continue
            p = p_rows.column(point_col).combine_chunks().to_numpy(zero_copy_only=False)
            lo = i_rows.column(lo_col).combine_chunks().to_numpy(zero_copy_only=False)
            hi = i_rows.column(hi_col).combine_chunks().to_numpy(zero_copy_only=False)
            order = np.argsort(lo, kind="stable")
            lo_s, hi_s = lo[order], hi[order]
            # candidates per point: intervals with lo <= p (sorted prefix)
            n_cand = np.searchsorted(lo_s, p, side="right")
            if int(n_cand.sum()) > max_bucket_pairs:
                raise ValueError(
                    f"range_join bucket exceeds {max_bucket_pairs} candidate pairs "
                    f"({p_rows.num_rows} points x {i_rows.num_rows} intervals); "
                    "shrink bucket_width or pre-split hot intervals"
                )
            p_idx = np.repeat(np.arange(len(p)), n_cand)
            offs = np.concatenate([[0], np.cumsum(n_cand)[:-1]])
            c_idx = np.arange(len(p_idx)) - offs[p_idx]
            keep = hi_s[c_idx] > p[p_idx]
            p_take, i_take = p_idx[keep], order[c_idx[keep]]
            out = {}
            for c in pt_cols:
                out[c] = p_rows.column(c).take(pa.array(p_take))
            for c in iv_cols:
                out[c] = i_rows.column(c).take(pa.array(i_take))
            pieces.append(pa.table(out))
        if not pieces:
            return pa.table(empty_cols)
        return pa.concat_tables(pieces)

    from .dedup import _group_partitions, _hash_shuffle

    nparts = num_partitions or _group_partitions(16)
    return (
        _hash_shuffle(both)
        .repartition(num_blocks=nparts, keys=["_rb"])
        .map_batches(bucket_match, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )


def audience_overlap(
    ds,
    user_col: str,
    type_col: str,
    type_a: str,
    type_b: str,
    num_partitions: int | None = None,
) -> pa.Table:
    """Set-operation audience counts between two event types: how many
    users did BOTH (INTERSECT), only A (EXCEPT), only B — plus the
    union — in one pass.

    Scale shape: pre-filter to the two types at the read, per-batch
    partial folds to one (user, has_a, has_b) row per user per block
    (TableGroupBy max), ONE keyed shuffle co-locates users, the segment
    fold ORs the flags and each block emits four counters — the driver
    sums a handful of rows. No DISTINCT shuffle, no join."""
    from .dedup import _group_partitions, _hash_shuffle

    def partial(b: pa.Table) -> pa.Table:
        tv = b.column(type_col)
        sel = pc.or_(pc.equal(tv, pa.scalar(type_a)), pc.equal(tv, pa.scalar(type_b)))
        b = b.filter(pc.fill_null(sel, False))
        ha = pc.cast(pc.equal(b.column(type_col), pa.scalar(type_a)), pa.int8())
        hb = pc.cast(pc.equal(b.column(type_col), pa.scalar(type_b)), pa.int8())
        t = pa.table({user_col: b.column(user_col), "_ha": ha, "_hb": hb})
        g = pa.TableGroupBy(t, [user_col]).aggregate([("_ha", "max"), ("_hb", "max")])
        return g.rename_columns([user_col, "_ha", "_hb"])

    def fold(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "n_both": pa.array([], pa.int64()),
                    "n_only_a": pa.array([], pa.int64()),
                    "n_only_b": pa.array([], pa.int64()),
                    "n_either": pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(t, [user_col]).aggregate([("_ha", "max"), ("_hb", "max")])
        ha = g.column("_ha_max").to_numpy(zero_copy_only=False) > 0
        hb = g.column("_hb_max").to_numpy(zero_copy_only=False) > 0
        return pa.table(
            {
                "n_both": pa.array([int((ha & hb).sum())], pa.int64()),
                "n_only_a": pa.array([int((ha & ~hb).sum())], pa.int64()),
                "n_only_b": pa.array([int((~ha & hb).sum())], pa.int64()),
                "n_either": pa.array([int(len(ha))], pa.int64()),
            }
        )

    nparts = num_partitions or _group_partitions(16)
    partial_counts = (
        _hash_shuffle(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(num_blocks=nparts, keys=[user_col])
        .map_batches(fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    totals = {"n_both": 0, "n_only_a": 0, "n_only_b": 0, "n_either": 0}
    for r in partial_counts.take_all():
        for k in totals:
            totals[k] += int(r[k])
    return pa.table({k: pa.array([v], pa.int64()) for k, v in totals.items()})


def cooccurrence_pairs(
    ds,
    basket_col: str,
    item_col: str,
    *,
    count_col: str = "n_baskets",
    num_partitions: int | None = None,
):
    """Market-basket co-occurrence: for every unordered item pair
    (a < b), count the baskets containing BOTH — the support table
    association mining starts from.

    Scale shape: per-batch partials fold to distinct (basket, item)
    rows; ONE keyed shuffle co-locates baskets; the segment kernel
    expands each basket's k items to its k(k-1)/2 pairs with the same
    vectorized repeat/offset expansion the range join uses (cost is
    pairs emitted, not a python loop); per-block pair counts fold once
    more on the bounded pair domain. Guard baskets with
    ``items-per-basket`` far below the block budget (an item DOMAIN of
    d gives at most d(d-1)/2 distinct pairs)."""
    import numpy as np

    from .dedup import _group_partitions, _hash_shuffle
    from .merge_apply import _first_per_key_mask

    def partial(b: pa.Table) -> pa.Table:
        t = b.select([basket_col, item_col])
        g = pa.TableGroupBy(t, [basket_col, item_col]).aggregate([([], "count_all")])
        return g.select([basket_col, item_col])

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "item_a": pa.array([], t.schema.field(item_col).type),
                "item_b": pa.array([], t.schema.field(item_col).type),
                "_n": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0:
            return empty
        # re-distinct across blocks, then sort so each basket segment's
        # items are ascending (pairs come out a < b by construction)
        t = pa.TableGroupBy(t, [basket_col, item_col]).aggregate([([], "count_all")])
        t = t.take(
            pc.sort_indices(
                t, sort_keys=[(basket_col, "ascending"), (item_col, "ascending")]
            )
        )
        first = _first_per_key_mask(t, (basket_col,)).to_numpy(zero_copy_only=False)
        gidx = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        seg_len = np.append(starts[1:], t.num_rows) - starts
        pos = np.arange(t.num_rows) - starts[gidx]
        n_follow = (seg_len[gidx] - 1 - pos).astype(np.int64)  # partners after each row
        total = int(n_follow.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(t.num_rows), n_follow)
        offs = np.concatenate(([0], np.cumsum(n_follow)[:-1]))
        b_idx = a_idx + 1 + (np.arange(total) - offs[a_idx])
        items = t.column(item_col)
        p = pa.table(
            {
                "item_a": items.take(pa.array(a_idx)),
                "item_b": items.take(pa.array(b_idx)),
            }
        )
        g = pa.TableGroupBy(p, ["item_a", "item_b"]).aggregate([([], "count_all")])
        return g.rename_columns(["item_a", "item_b", "_n"])

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "item_a": pa.array([], t.schema.field("item_a").type),
                    "item_b": pa.array([], t.schema.field("item_b").type),
                    count_col: pa.array([], pa.int64()),
                }
            )
        g = pa.TableGroupBy(t, ["item_a", "item_b"]).aggregate([("_n", "sum")])
        return g.rename_columns(["item_a", "item_b", count_col])

    nparts = num_partitions or _group_partitions(16)
    per_basket = (
        _hash_shuffle(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(num_blocks=nparts, keys=[basket_col])
        .map_batches(pairs, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    return (
        _hash_shuffle(per_basket)
        .repartition(num_blocks=min(nparts, 4), keys=["item_a", "item_b"])
        .map_batches(merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
