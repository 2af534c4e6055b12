"""TPC-H-style benchmark pipelines (Q1/Q3/Q5 shapes plus the
customer-order revenue join), split out of pipelines/queries.py.

Each pipeline documents its scale strategy inline: bounded-domain
partial-aggregate-then-gather for Q1, size-gated broadcast joins with
tagged-union keyed-merge / Bloom shuffle fallbacks for Q3/Q5 (forced-big-
path tested in tests/test_queries_big_path.py). Helper gates resolve
through pipelines/queries.py AT CALL TIME so the big-path suite's
monkeypatching of ``queries._table_rows`` / ``queries._docs_small``
governs these pipelines too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _queries_mod():
    from . import queries

    return queries


def _read(*a, **k):
    return _queries_mod()._read(*a, **k)


def _table_rows(*a, **k):
    return _queries_mod()._table_rows(*a, **k)


def _partitions(*a, **k):
    return _queries_mod()._partitions(*a, **k)


def _hash_shuffle(ds):
    return _queries_mod()._hash_shuffle(ds)


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-style groupby aggregate over lineitem (columns pruned at
    the read). The group domain is BOUNDED (returnflag x linestatus ≈ 6
    groups), so this is partial-aggregate-then-gather: each batch folds to
    ≤6 partial rows (sums + counts, Mean decomposed as sum/count), and one
    final block merges them — no keyed shuffle at any scale."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )
    keys = ["l_returnflag", "l_linestatus"]

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, keys).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("l_discount", "sum"),
                # avg() skips nulls (valid count) but count(*) doesn't
                ("l_discount", "count"),
                ("l_discount", "count", pc.CountOptions(mode="all")),
            ]
        )
        return g.rename_columns(
            keys + ["sum_qty", "sum_base_price", "sum_disc", "n_disc", "count_order"]
        )

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, keys).aggregate(
            [
                ("sum_qty", "sum"),
                ("sum_base_price", "sum"),
                ("sum_disc", "sum"),
                ("n_disc", "sum"),
                ("count_order", "sum"),
            ]
        )
        n = g.column("n_disc_sum")
        # parallel float reduction order differs from DuckDB's by ~1e-6 on
        # 1e9-magnitude sums; round to cents / 6dp on BOTH sides so the
        # driver's value hash compares stably
        return pa.table(
            {
                "l_returnflag": g.column("l_returnflag"),
                "l_linestatus": g.column("l_linestatus"),
                "sum_qty": g.column("sum_qty_sum"),
                "sum_base_price": pc.round(g.column("sum_base_price_sum"), ndigits=2),
                "avg_disc": pc.round(
                    pc.divide(g.column("sum_disc_sum"), pc.cast(n, pa.float64())), ndigits=6
                ),
                "count_order": g.column("count_order_sum"),
            }
        )

    ds = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return ds.repartition(1).map_batches(
        merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6-style forecasting-revenue-change scalar aggregate.

    Scale strategy: the predicate is pushed INTO the parquet read as a
    pyarrow dataset expression, so row groups whose shipdate/discount/
    quantity statistics exclude the window never leave storage — the
    read is the filter. What remains folds to ONE partial row per block
    (bounded domain: a single global group), then one trivial merge.

    Determinism: revenue is summed as EXACT int64 fixed-point —
    round(price*100) * round(discount*100) — with the identical final
    float64 division mirrored in the DuckDB oracle, so the result is
    batching- and fold-order-invariant by construction (the repo-wide
    float rule; see stages/stats.py)."""
    from datetime import datetime

    import pyarrow.dataset as pads

    lo, hi = datetime(1998, 1, 1), datetime(1999, 1, 1)
    f = pads.field
    expr = (
        (f("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (f("l_shipdate") < pa.scalar(hi, pa.timestamp("us")))
        & (f("l_discount") >= 0.05)
        & (f("l_discount") <= 0.07)
        & (f("l_quantity") < 24.0)
    )
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_extendedprice", "l_discount"],
        filter=expr,
    )

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        bp = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        prod = pc.multiply(cents, bp)
        return pa.table(
            {
                "rev_fp": pa.array([pc.sum(prod).as_py() or 0], pa.int64()),
                "n_items": pa.array([len(b)], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        rev_fp = pc.sum(t.column("rev_fp")).as_py() or 0
        n = pc.sum(t.column("n_items")).as_py() or 0
        return pa.table(
            {
                "revenue": pa.array([rev_fp / 10000.0], pa.float64()),
                "n_items": pa.array([n], pa.int64()),
            }
        )

    from ..stages.stats import partial_fold

    return partial_fold(ds, partial, fold)


def lineitem_revenue_filter(sf_dir: str):
    """Filter + computed projection with column pruning at the read."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.greater(batch.column("l_quantity"), 45.0))
        revenue = pc.multiply(
            batch.column("l_extendedprice"), pc.subtract(1.0, batch.column("l_discount"))
        )
        return pa.table(
            {
                "l_orderkey": batch.column("l_orderkey"),
                "l_linenumber": batch.column("l_linenumber"),
                "revenue": revenue,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# --- CDC-style operators over the events stream ------------------------------
def customer_order_revenue(sf_dir: str):
    """Inner join + aggregate: revenue per customer.

    Eager aggregation below the join: orders are partial-aggregated per
    batch down to one row per custkey FIRST, so whatever join mechanism
    follows moves ~|customers| rows, never |orders| rows. The join itself
    is a tagged union: customer rows and order-partials share one schema,
    and a single grouped pass merges them (Max picks the name, Sum folds
    the partials); inner-join semantics = keep keys seen on both sides.
    Small inputs take the partial-aggregate-then-gather path (one final
    merge block, no keyed shuffle — same gate as the events queries); big
    inputs run the same union through one hash-shuffle groupby.
    """
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def o_partial(b: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(b, "o_custkey").aggregate(
            [("o_totalprice", "sum"), ("o_totalprice", "count")]
        )
        return pa.table(
            {
                "c_custkey": t.column("o_custkey"),
                "c_name": pa.nulls(t.num_rows, pa.string()),
                "revenue": t.column("o_totalprice_sum"),
                "order_count": t.column("o_totalprice_count").cast(pa.int64()),
            }
        )

    def c_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "c_custkey": b.column("c_custkey"),
                "c_name": b.column("c_name"),
                "revenue": pa.nulls(b.num_rows, pa.float64()),
                "order_count": pa.array(np.zeros(b.num_rows, dtype=np.int64)),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "c_custkey").aggregate(
            [("c_name", "max"), ("revenue", "sum"), ("order_count", "sum")]
        )
        keep = pc.and_(
            pc.is_valid(g.column("c_name_max")), pc.greater(g.column("order_count_sum"), 0)
        )
        g = g.filter(keep)
        # integer cents: immune to ulp-level differences in parallel float
        # reduction order (sum of 2dp prices x100 sits ~1e-6 from an int)
        cents = pc.cast(pc.round(pc.multiply(g.column("revenue_sum"), 100.0)), pa.int64())
        return pa.table(
            {
                "c_custkey": g.column("c_custkey"),
                "c_name": g.column("c_name_max"),
                "revenue_cents": cents,
                "order_count": g.column("order_count_sum"),
            }
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    u = orders.map_batches(o_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        cust.map_batches(c_tag, batch_format="pyarrow", zero_copy_batch=True)
    )
    if _table_rows(sf_dir, "customer") < 2_000_000:
        # union fits one merge block: gather, no keyed shuffle
        return u.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    u = _hash_shuffle(u)
    nparts = _partitions(rows=_table_rows(sf_dir, "customer"))
    # merge() folds via TableGroupBy, so one whole-block call per hash
    # partition does all its groups at once (map_groups would pay one
    # python call per customer)
    return u.repartition(num_blocks=nparts, keys=["c_custkey"]).map_batches(
        merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
def _micro_revenue(b: pa.Table) -> pa.ChunkedArray:
    # per-row revenue = extendedprice * (1 - discount), quantized to
    # integer micro-units so parallel fold order cannot flip the sum
    # (2dp x 2dp inputs put x*1e6 ~50 units from any .5 boundary)
    rev = pc.multiply(
        b.column("l_extendedprice"), pc.subtract(1.0, b.column("l_discount"))
    )
    return pc.cast(pc.round(pc.multiply(rev, 1_000_000.0)), pa.int64())
def q3_shipping_priority(sf_dir: str):
    """TPC-H Q3-style 3-way join + grouped revenue + top-10: customers in
    one market segment, orders placed before a date, lineitems shipped
    after it. Distributed shape: the (filtered) customer keyset never
    joins — it broadcast-semi-filters orders map-side; lineitem revenue
    is partial-aggregated to one row per orderkey per batch BEFORE the
    join, so the tagged-union merge moves ~|orders| rows, never
    |lineitem| rows. Merged blocks emit their local top-10 and one final
    block picks the global top-10 — no global range sort."""
    from ..stages.joins import broadcast_semi_join

    cutoff = pa.scalar(np.datetime64("1998-06-01T00:00:00", "us"), pa.timestamp("us"))
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cutoff)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust_keys = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"])
    )
    n_cust = _table_rows(sf_dir, "customer")
    if n_cust < 2_000_000:
        orders = broadcast_semi_join(orders, cust_keys, on="o_custkey")
    else:
        # keyset too big for a plain is_in broadcast: Bloom prefilter
        # sized to the keyset (m/n ~ 16 -> ~0.24% FPR, capped at a
        # 128 MiB bitmap) + exact verification of the survivors through
        # the keyed-SHUFFLE tier — the distinct keyset never broadcasts
        # either
        import math

        from ..stages.joins import bloom_semi_join

        bits = min(30, max(20, math.ceil(math.log2(max(n_cust, 1) * 16))))
        orders = bloom_semi_join(
            orders, cust_keys, on="o_custkey", dim_key="c_custkey",
            bits_log2=bits, verify="shuffle",
        )

    li = _read(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("l_shipdate"), cutoff)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"l_orderkey": b.column("l_orderkey"), "revenue_micro": _micro_revenue(b)}
        )
        g = pa.TableGroupBy(t, "l_orderkey").aggregate([("revenue_micro", "sum")])
        return pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "revenue_micro": g.column("revenue_micro_sum"),
                "o_orderdate": pa.nulls(g.num_rows, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(g.num_rows, pa.string()),
            }
        )

    def o_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": b.column("o_orderkey"),
                "revenue_micro": pa.nulls(b.num_rows, pa.int64()),
                "o_orderdate": b.column("o_orderdate"),
                "o_orderpriority": b.column("o_orderpriority"),
            }
        )

    def topk(t: pa.Table, k: int = 10) -> pa.Table:
        idx = pc.sort_indices(
            t, sort_keys=[("revenue_micro", "descending"), ("l_orderkey", "ascending")]
        )
        return t.take(idx[:k])

    def merge(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "l_orderkey").aggregate(
            [("revenue_micro", "sum"), ("o_orderdate", "max"), ("o_orderpriority", "max")]
        )
        keep = pc.and_(
            pc.is_valid(g.column("o_orderdate_max")),
            pc.is_valid(g.column("revenue_micro_sum")),
        )
        g = g.filter(keep)
        out = pa.table(
            {
                "l_orderkey": g.column("l_orderkey"),
                "revenue_micro": g.column("revenue_micro_sum"),
                "o_orderdate": g.column("o_orderdate_max"),
                "o_orderpriority": g.column("o_orderpriority_max"),
            }
        )
        return topk(out)

    u = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(o_tag, batch_format="pyarrow", zero_copy_batch=True)
    )
    if _table_rows(sf_dir, "orders") < 2_000_000:
        merged = u.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    else:
        u = _hash_shuffle(u)
        nparts = _partitions(rows=_table_rows(sf_dir, "orders"))
        merged = u.repartition(num_blocks=nparts, keys=["l_orderkey"]).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    # merged blocks are already local top-10s; one tiny final pass
    from ..util import drop_empty_blocks

    return drop_empty_blocks(
        merged.repartition(1).map_batches(
            lambda t: topk(t), batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )
def q5_regional_supplier_volume(sf_dir: str):
    """TPC-H Q5-style 6-table join with a nation-equality condition
    (customer's nation == supplier's nation, both in one region).
    Distributed shape: region/nation/supplier/customer are dimension
    lookups broadcast once (ray.put) and applied map-side — at true
    scale customer would flip to the tagged-union hash join like
    customer_order_revenue; the two BIG tables (orders, lineitem) never
    broadcast. Lineitem is partial-aggregated per batch to one row per
    (orderkey, supplier-nation) before the keyed merge, which compares
    each order's customer-nation against its lineitems' supplier-nations
    and folds matching revenue per nation — block-local partials, one
    tiny final fold."""
    from ..stages.joins import broadcast_lookup_join

    nat = pa.Table.from_pylist(
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name", "n_regionkey"]).take_all()
    )
    reg = pa.Table.from_pylist(
        _read(sf_dir, "region", columns=["r_regionkey", "r_name"]).take_all()
    )
    asia = reg.filter(pc.equal(reg.column("r_name"), "ASIA")).column("r_regionkey")
    nat = nat.filter(pc.is_in(nat.column("n_regionkey"), value_set=asia.combine_chunks()))
    nat_keys = nat.column("n_nationkey").combine_chunks()

    lo = pa.scalar(np.datetime64("1996-01-01T00:00:00", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1997-01-01T00:00:00", "us"), pa.timestamp("us"))
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    nat_keys32 = nat_keys.cast(pa.int32())
    if _table_rows(sf_dir, "customer") < 2_000_000:
        # small dimension: one broadcast, applied map-side
        orders = broadcast_lookup_join(
            orders, cust, on="o_custkey", dim_key="c_custkey",
            take_cols={"c_nationkey": "c_nationkey"}, how="inner",
        ).map_batches(
            lambda b: b.filter(pc.is_in(b.column("c_nationkey"), value_set=nat_keys32)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
        # customer too big to broadcast: attach c_nationkey through the
        # shuffle-tier lookup join (stages/joins.keyed_lookup_join) —
        # nothing big ever broadcasts. The dimension is pre-filtered to
        # the region's nations so non-matching customers never shuffle;
        # partitions sized by the DOMINANT side (orders)
        from ..stages.joins import keyed_lookup_join

        cust_r = cust.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column("c_nationkey").cast(pa.int32()), value_set=nat_keys32)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        orders = keyed_lookup_join(
            orders.select_columns(["o_orderkey", "o_custkey"]),
            cust_r,
            on="o_custkey",
            dim_key="c_custkey",
            take_cols={"c_nationkey": "c_nationkey"},
            how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "orders")),
        )

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    if _table_rows(sf_dir, "supplier") < 2_000_000:
        li = broadcast_lookup_join(
            li, sup, on="l_suppkey", dim_key="s_suppkey",
            take_cols={"s_nationkey": "s_nationkey"}, how="inner",
        )
    else:
        # supplier too big to broadcast: shuffle-tier lookup join on
        # suppkey BEFORE the revenue partials; the dimension is
        # pre-filtered to the region's nations so ~(1 - 1/|regions|) of
        # lineitem drops at the attach, not later
        from ..stages.joins import keyed_lookup_join

        sup_r = sup.map_batches(
            lambda b: b.filter(
                pc.is_in(b.column("s_nationkey").cast(pa.int32()), value_set=nat_keys32)
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        li = keyed_lookup_join(
            li,
            sup_r,
            on="l_suppkey",
            dim_key="s_suppkey",
            take_cols={"s_nationkey": "s_nationkey"},
            how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "lineitem")),
        )

    def li_partial(b: pa.Table) -> pa.Table:
        b = b.filter(
            pc.is_in(b.column("s_nationkey").cast(pa.int32()), value_set=nat_keys32)
        )
        t = pa.table(
            {
                "okey": b.column("l_orderkey"),
                "s_nat": b.column("s_nationkey").cast(pa.int32()),
                "revenue_micro": _micro_revenue(b),
            }
        )
        g = pa.TableGroupBy(t, ["okey", "s_nat"]).aggregate([("revenue_micro", "sum")])
        return pa.table(
            {
                "okey": g.column("okey"),
                "s_nat": g.column("s_nat"),
                "c_nat": pa.nulls(g.num_rows, pa.int32()),
                "revenue_micro": g.column("revenue_micro_sum"),
            }
        )

    def o_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "okey": b.column("o_orderkey"),
                "s_nat": pa.nulls(b.num_rows, pa.int32()),
                "c_nat": b.column("c_nationkey").cast(pa.int32()),
                "revenue_micro": pa.nulls(b.num_rows, pa.int64()),
            }
        )

    def merge(t: pa.Table) -> pa.Table:
        # split the tagged union: one orders row per okey carries c_nat
        t = t.combine_chunks()
        o = t.filter(pc.is_valid(t.column("c_nat")))
        l = t.filter(pc.is_valid(t.column("s_nat")))
        pos = pc.index_in(
            l.column("okey").combine_chunks(), value_set=o.column("okey").combine_chunks()
        )
        c_nat = o.column("c_nat").combine_chunks().take(pos)
        keep = pc.and_kleene(
            pc.is_valid(pos), pc.equal(l.column("s_nat").combine_chunks(), c_nat)
        )
        l = l.filter(pc.fill_null(keep, False))
        g = pa.TableGroupBy(
            pa.table(
                {"n_nationkey": l.column("s_nat"), "revenue_micro": l.column("revenue_micro")}
            ),
            "n_nationkey",
        ).aggregate([("revenue_micro", "sum")])
        return pa.table(
            {
                "n_nationkey": g.column("n_nationkey"),
                "revenue_micro": g.column("revenue_micro_sum"),
            }
        )

    u = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True).union(
        orders.map_batches(o_tag, batch_format="pyarrow", zero_copy_batch=True)
    )
    if _table_rows(sf_dir, "orders") < 2_000_000:
        partials = u.repartition(1).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    else:
        u = _hash_shuffle(u)
        nparts = _partitions(rows=_table_rows(sf_dir, "orders"))
        partials = u.repartition(num_blocks=nparts, keys=["okey"]).map_batches(
            merge, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    names = dict(
        zip(nat.column("n_nationkey").to_pylist(), nat.column("n_name").to_pylist())
    )

    def finish(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "n_nationkey").aggregate([("revenue_micro", "sum")])
        keys = g.column("n_nationkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([names[k] for k in keys], pa.string()),
                "revenue_micro": g.column("revenue_micro_sum"),
            }
        )

    from ..util import drop_empty_blocks

    return drop_empty_blocks(
        partials.repartition(1).map_batches(
            finish, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )


def orders_count_histogram(sf_dir: str):
    """TPC-H Q13-style customer-distribution histogram: how many customers
    placed exactly k orders, INCLUDING the zero-order bucket the SQL
    expresses as a LEFT JOIN.

    Scale strategy — the left join is decomposed away entirely:
    1. orders fold per block to (custkey, partial count); the merge is
       size-gated like every keyed aggregate here (gather below 2M
       customers, hash-shuffle keyed merge above), and the per-partition
       merge task ALSO folds its customers straight into (c_count,
       custdist) histogram partials, so what leaves the shuffle is the
       bounded c_count domain, never |customers| rows.
    2. the zero bucket needs no join at all: referential integrity
       (every o_custkey is a customer — true of TPC-H and asserted of the
       testdata) makes it |customer| - |custkeys seen in orders|, and
       |customer| is one parquet-footer read.
    A 100-TB orders table therefore moves one keyed shuffle of
    pre-aggregated custkey counts and a bounded histogram gather."""
    orders = _read(sf_dir, "orders", columns=["o_custkey"])
    n_customers = _queries_mod()._semantic_table_rows(sf_dir, "customer")

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, "o_custkey").aggregate([("o_custkey", "count")])
        return pa.table(
            {
                "c_custkey": g.column("o_custkey"),
                "c_count": g.column("o_custkey_count").cast(pa.int64()),
            }
        )

    def merge_hist(t: pa.Table) -> pa.Table:
        # fold this partition's customers, then collapse immediately to
        # histogram partials — the partition's output is O(max orders per
        # customer) rows, not O(customers)
        g = pa.TableGroupBy(t, "c_custkey").aggregate([("c_count", "sum")])
        h = pa.TableGroupBy(
            g.rename_columns(["c_custkey", "c_count"]), "c_count"
        ).aggregate([("c_count", "count")])
        return pa.table(
            {
                "c_count": h.column("c_count"),
                "custdist": h.column("c_count_count").cast(pa.int64()),
            }
        )

    u = orders.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    if _table_rows(sf_dir, "customer") < 2_000_000:
        parts = u.repartition(1)
    else:
        u = _hash_shuffle(u)
        nparts = _partitions(rows=_table_rows(sf_dir, "customer"))
        parts = u.repartition(num_blocks=nparts, keys=["c_custkey"])
    hist = parts.map_batches(
        merge_hist, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "c_count").aggregate([("custdist", "sum")])
        counts = g.column("c_count")
        dist = g.column("custdist_sum")
        zero = n_customers - (pc.sum(dist).as_py() or 0)
        if zero > 0:
            counts = pa.concat_arrays(
                [counts.combine_chunks(), pa.array([0], pa.int64())]
            )
            dist = pa.concat_arrays(
                [dist.combine_chunks(), pa.array([zero], pa.int64())]
            )
        return pa.table({"c_count": counts, "custdist": dist})

    return hist.repartition(1).map_batches(
        fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def parts_low_quantity_revenue(sf_dir: str):
    """TPC-H Q17-style correlated scalar subquery: total revenue of
    lineitems whose quantity is below 20% of their part's average
    quantity. The per-part average is an aggregate of the SAME fact
    table joined back onto it.

    Scale strategy: per-part (sum, count) partials fold per block first.
    Below 2M parts the folded dimension broadcasts (ray.put once, read
    per task) onto a second streaming pass of lineitem. Above the gate
    there is no small side, so partials and raw rows share ONE tagged
    union and ONE hash shuffle on partkey; each partition folds its
    partials and filters its rows locally, emitting a single global
    revenue partial — the join-back never materializes.

    Determinism: the threshold compare is EXACT integer cross-
    multiplication — qty_cents * 5 * cnt < sum_qty_cents is
    qty < 0.2 * avg in rationals — mirrored verbatim in the oracle, so
    no float boundary row can flip between engines (repo float rule,
    stages/stats.py)."""
    cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    li = _read(sf_dir, "lineitem", columns=cols)

    def cents(col) -> pa.ChunkedArray:
        return pc.cast(pc.round(pc.multiply(col, 100.0)), pa.int64())

    def part_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {"l_partkey": b.column("l_partkey"), "qc": cents(b.column("l_quantity"))}
        )
        g = pa.TableGroupBy(t, "l_partkey").aggregate([("qc", "sum"), ("qc", "count")])
        return pa.table(
            {
                "l_partkey": g.column("l_partkey"),
                "sqc": g.column("qc_sum"),
                "cnt": g.column("qc_count").cast(pa.int64()),
            }
        )

    def global_fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "low_qty_revenue_cents": pa.array(
                    [pc.sum(t.column("rev")).as_py() or 0], pa.int64()
                ),
                "n_lines": pa.array([pc.sum(t.column("n")).as_py() or 0], pa.int64()),
            }
        )

    from ..stages.stats import partial_fold

    if _table_rows(sf_dir, "part") < 2_000_000:
        from ..stages.joins import broadcast_lookup_join

        dim = (
            li.map_batches(part_partial, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(1)
            .map_batches(
                lambda t: pa.TableGroupBy(t, "l_partkey")
                .aggregate([("sqc", "sum"), ("cnt", "sum")])
                .rename_columns(["l_partkey", "sqc", "cnt"]),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
        )
        joined = broadcast_lookup_join(
            li, dim, on="l_partkey", dim_key="l_partkey",
            take_cols={"sqc": "sqc", "cnt": "cnt"}, how="inner",
        )

        def row_partial(b: pa.Table) -> pa.Table:
            qc = cents(b.column("l_quantity"))
            cond = pc.less(
                pc.multiply(pc.multiply(qc, 5), b.column("cnt")), b.column("sqc")
            )
            price = cents(b.column("l_extendedprice")).filter(cond)
            return pa.table(
                {
                    "rev": pa.array([pc.sum(price).as_py() or 0], pa.int64()),
                    "n": pa.array([len(price)], pa.int64()),
                }
            )

        return partial_fold(joined, row_partial, global_fold)

    # big path: tagged union, one keyed shuffle, local join-back
    def row_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": b.column("l_partkey"),
                "sqc": pa.nulls(b.num_rows, pa.int64()),
                "cnt": pa.nulls(b.num_rows, pa.int64()),
                "qc": cents(b.column("l_quantity")),
                "price_c": cents(b.column("l_extendedprice")),
            }
        )

    def part_tag(b: pa.Table) -> pa.Table:
        p = part_partial(b)
        return pa.table(
            {
                "l_partkey": p.column("l_partkey"),
                "sqc": p.column("sqc"),
                "cnt": p.column("cnt"),
                "qc": pa.nulls(p.num_rows, pa.int64()),
                "price_c": pa.nulls(p.num_rows, pa.int64()),
            }
        )

    u = li.map_batches(row_tag, batch_format="pyarrow", zero_copy_batch=True).union(
        li.map_batches(part_tag, batch_format="pyarrow", zero_copy_batch=True)
    )
    u = _hash_shuffle(u)
    nparts = _partitions(rows=_table_rows(sf_dir, "lineitem"))

    def merge_partition(t: pa.Table) -> pa.Table:
        is_row = pc.is_valid(t.column("qc"))
        rows = t.filter(is_row)
        parts = t.filter(pc.invert(is_row))
        g = pa.TableGroupBy(
            parts.select(["l_partkey", "sqc", "cnt"]), "l_partkey"
        ).aggregate([("sqc", "sum"), ("cnt", "sum")])
        pos = pc.index_in(rows.column("l_partkey"), value_set=g.column("l_partkey"))
        sqc = g.column("sqc_sum").combine_chunks().take(pos)
        cnt = g.column("cnt_sum").combine_chunks().take(pos)
        cond = pc.less(pc.multiply(pc.multiply(rows.column("qc"), 5), cnt), sqc)
        price = rows.column("price_c").filter(cond)
        return pa.table(
            {
                "rev": pa.array([pc.sum(price).as_py() or 0], pa.int64()),
                "n": pa.array([len(price)], pa.int64()),
            }
        )

    partials = u.repartition(num_blocks=nparts, keys=["l_partkey"]).map_batches(
        merge_partition, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return partials.repartition(1).map_batches(
        global_fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def parts_brand_promo_revenue(sf_dir: str):
    """TPC-H Q19-style disjunctive cross-table predicate: revenue over an
    OR of (brand, size, quantity) clause conjunctions, where brand/size
    live on the part dimension and quantity on the fact.

    Scale strategy: only the two part columns the predicate needs are
    read; below 2M parts they broadcast onto the lineitem stream
    (ray.put once), above they attach via the shuffle-tier
    keyed_lookup_join. The clause mask is pure vectorized pyarrow
    boolean algebra; what survives folds to one exact fixed-point
    revenue partial per block (price_cents x (100 - disc_pct), unit
    1e-4 dollars) and a trivial final merge, with the identical float64
    division mirrored in the oracle."""
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"])

    if _table_rows(sf_dir, "part") < 2_000_000:
        from ..stages.joins import broadcast_lookup_join

        joined = broadcast_lookup_join(
            li, part, on="l_partkey", dim_key="p_partkey",
            take_cols={"p_brand": "p_brand", "p_size": "p_size"}, how="inner",
        )
    else:
        from ..stages.joins import keyed_lookup_join

        joined = keyed_lookup_join(
            li, part, on="l_partkey", dim_key="p_partkey",
            take_cols={"p_brand": "p_brand", "p_size": "p_size"}, how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "lineitem")),
        )

    CLAUSES = [
        ("Brand#3", 1, 15, 1.0, 11.0),
        ("Brand#13", 5, 30, 10.0, 20.0),
        ("Brand#23", 10, 50, 20.0, 35.0),
    ]

    def partial(b: pa.Table) -> pa.Table:
        mask = None
        for brand, slo, shi, qlo, qhi in CLAUSES:
            m = pc.and_(
                pc.and_(
                    pc.equal(b.column("p_brand"), brand),
                    pc.and_(
                        pc.greater_equal(b.column("p_size"), slo),
                        pc.less_equal(b.column("p_size"), shi),
                    ),
                ),
                pc.and_(
                    pc.greater_equal(b.column("l_quantity"), qlo),
                    pc.less_equal(b.column("l_quantity"), qhi),
                ),
            )
            mask = m if mask is None else pc.or_(mask, m)
        hit = b.filter(mask)
        price_c = pc.cast(
            pc.round(pc.multiply(hit.column("l_extendedprice"), 100.0)), pa.int64()
        )
        disc_pct = pc.cast(
            pc.round(pc.multiply(hit.column("l_discount"), 100.0)), pa.int64()
        )
        fp = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_pct))
        return pa.table(
            {
                "fp": pa.array([pc.sum(fp).as_py() or 0], pa.int64()),
                "n": pa.array([hit.num_rows], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        fp = pc.sum(t.column("fp")).as_py() or 0
        n = pc.sum(t.column("n")).as_py() or 0
        return pa.table(
            {
                "revenue": pa.array([fp / 10000.0], pa.float64()),
                "n_lines": pa.array([n], pa.int64()),
            }
        )

    from ..stages.stats import partial_fold

    return partial_fold(joined, partial, fold)


def orders_priority_exists(sf_dir: str):
    """TPC-H Q4-style EXISTS with a cross-table inequality: count orders
    per priority having at least one lineitem shipped AFTER the order
    date. The correlated EXISTS collapses to an aggregate — EXISTS
    (l_shipdate > o_orderdate) is max(l_shipdate) per order >
    o_orderdate — so the semi join never runs per-lineitem.

    Scale strategy: lineitem folds per block to (orderkey, partial max
    shipdate). Below 2M orders the folded map broadcasts onto the orders
    stream; above, order rows and shipdate partials share one tagged
    union and one hash shuffle on orderkey, and each partition folds its
    maxes, applies the inequality to its own orders, and emits bounded
    (priority, count) partials. Timestamps compare as exact int64
    microseconds — no float boundary."""
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def li_partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b, "l_orderkey").aggregate([("l_shipdate", "max")])
        return g.rename_columns(["o_orderkey", "max_ship"])

    def count_partial(t: pa.Table) -> pa.Table:
        keep = t.filter(pc.greater(t.column("max_ship"), t.column("o_orderdate")))
        g = pa.TableGroupBy(keep, "o_orderpriority").aggregate(
            [("o_orderpriority", "count")]
        )
        return pa.table(
            {
                "o_orderpriority": g.column("o_orderpriority"),
                "order_count": g.column("o_orderpriority_count").cast(pa.int64()),
            }
        )

    def final(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "o_orderpriority").aggregate([("order_count", "sum")])
        return g.rename_columns(["o_orderpriority", "order_count"])

    if _table_rows(sf_dir, "orders") < 2_000_000:
        from ..stages.joins import broadcast_lookup_join

        dim = (
            li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(1)
            .map_batches(
                lambda t: pa.TableGroupBy(t, "o_orderkey")
                .aggregate([("max_ship", "max")])
                .rename_columns(["o_orderkey", "max_ship"]),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
        )
        joined = broadcast_lookup_join(
            orders, dim, on="o_orderkey", dim_key="o_orderkey",
            take_cols={"max_ship": "max_ship"}, how="inner",
        )
        hist = joined.map_batches(
            count_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        return hist.repartition(1).map_batches(
            final, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    def o_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_orderdate": b.column("o_orderdate"),
                "o_orderpriority": b.column("o_orderpriority"),
                "max_ship": pa.nulls(b.num_rows, pa.timestamp("us")),
            }
        )

    def l_tag(b: pa.Table) -> pa.Table:
        p = li_partial(b)
        return pa.table(
            {
                "o_orderkey": p.column("o_orderkey"),
                "o_orderdate": pa.nulls(p.num_rows, pa.timestamp("us")),
                "o_orderpriority": pa.nulls(p.num_rows, pa.string()),
                "max_ship": p.column("max_ship").cast(pa.timestamp("us")),
            }
        )

    def merge_partition(t: pa.Table) -> pa.Table:
        is_order = pc.is_valid(t.column("o_orderdate"))
        orows = t.filter(is_order)
        lrows = t.filter(pc.invert(is_order))
        g = pa.TableGroupBy(
            lrows.select(["o_orderkey", "max_ship"]), "o_orderkey"
        ).aggregate([("max_ship", "max")])
        pos = pc.index_in(orows.column("o_orderkey"), value_set=g.column("o_orderkey"))
        ship = g.column("max_ship_max").combine_chunks().take(pos)
        keep = pc.and_(
            pc.is_valid(ship), pc.greater(ship, orows.column("o_orderdate"))
        )
        kept = orows.filter(keep)
        g2 = pa.TableGroupBy(kept, "o_orderpriority").aggregate(
            [("o_orderpriority", "count")]
        )
        return pa.table(
            {
                "o_orderpriority": g2.column("o_orderpriority"),
                "order_count": g2.column("o_orderpriority_count").cast(pa.int64()),
            }
        )

    u = orders.map_batches(o_tag, batch_format="pyarrow", zero_copy_batch=True).union(
        li.map_batches(l_tag, batch_format="pyarrow", zero_copy_batch=True)
    )
    u = _hash_shuffle(u)
    nparts = _partitions(rows=_table_rows(sf_dir, "orders"))
    partials = u.repartition(num_blocks=nparts, keys=["o_orderkey"]).map_batches(
        merge_partition, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    return partials.repartition(1).map_batches(
        final, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def orders_large_volume(sf_dir: str):
    """TPC-H Q18-style HAVING-IN: orders whose total lineitem quantity
    exceeds a threshold, listed with their customer's name.

    Scale strategy: per-order quantity partials fold per block; the
    HAVING filter runs where the sums finish (one gather block below 2M
    orders, per-partition after a tagged-union orderkey shuffle above),
    so only the few qualifying orders — a fixed selectivity of the
    threshold, not O(orders) — flow into the customer-name attach, which
    broadcasts below 2M customers and keyed-joins above. Quantity sums
    are exact int64 cents; threshold compare mirrored in the oracle."""
    THRESH_C = 15_000  # 150.00 qty units, in cents
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    orders = _read(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"]
    )

    def li_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "qc": pc.cast(
                    pc.round(pc.multiply(b.column("l_quantity"), 100.0)), pa.int64()
                ),
            }
        )
        g = pa.TableGroupBy(t, "o_orderkey").aggregate([("qc", "sum")])
        return g.rename_columns(["o_orderkey", "sum_qty_cents"])

    def attach_customer(qualified):
        cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        if _table_rows(sf_dir, "customer") < 2_000_000:
            from ..stages.joins import broadcast_lookup_join

            return broadcast_lookup_join(
                qualified, cust, on="o_custkey", dim_key="c_custkey",
                take_cols={"c_name": "c_name"}, how="inner",
            ).drop_columns(["o_custkey"])
        from ..stages.joins import keyed_lookup_join

        return keyed_lookup_join(
            qualified, cust, on="o_custkey", dim_key="c_custkey",
            take_cols={"c_name": "c_name"}, how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "customer")),
        ).drop_columns(["o_custkey"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": t.column("o_orderkey"),
                "o_custkey": t.column("o_custkey"),
                "totalprice_cents": pc.cast(
                    pc.round(pc.multiply(t.column("o_totalprice"), 100.0)), pa.int64()
                ),
                "sum_qty_cents": t.column("sum_qty_cents"),
            }
        )

    if _table_rows(sf_dir, "orders") < 2_000_000:
        from ..stages.joins import broadcast_lookup_join

        dim = (
            li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
            .repartition(1)
            .map_batches(
                lambda t: pa.TableGroupBy(t, "o_orderkey")
                .aggregate([("sum_qty_cents", "sum")])
                .rename_columns(["o_orderkey", "sum_qty_cents"])
                .filter(pc.greater(pc.field("sum_qty_cents"), THRESH_C)),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
        )
        qualified = broadcast_lookup_join(
            orders, dim, on="o_orderkey", dim_key="o_orderkey",
            take_cols={"sum_qty_cents": "sum_qty_cents"}, how="inner",
        ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        return attach_customer(qualified)

    # big path: orders rows + qty partials share one orderkey shuffle
    def o_tag(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_orderkey": b.column("o_orderkey"),
                "o_custkey": b.column("o_custkey"),
                "o_totalprice": b.column("o_totalprice"),
                "sum_qty_cents": pa.nulls(b.num_rows, pa.int64()),
            }
        )

    def l_tag(b: pa.Table) -> pa.Table:
        p = li_partial(b)
        return pa.table(
            {
                "o_orderkey": p.column("o_orderkey"),
                "o_custkey": pa.nulls(p.num_rows, pa.int64()),
                "o_totalprice": pa.nulls(p.num_rows, pa.float64()),
                "sum_qty_cents": p.column("sum_qty_cents"),
            }
        )

    def merge_partition(t: pa.Table) -> pa.Table:
        is_order = pc.is_valid(t.column("o_custkey"))
        orows = t.filter(is_order)
        lrows = t.filter(pc.invert(is_order))
        g = pa.TableGroupBy(
            lrows.select(["o_orderkey", "sum_qty_cents"]), "o_orderkey"
        ).aggregate([("sum_qty_cents", "sum")])
        g = g.rename_columns(["o_orderkey", "sum_qty_cents"]).filter(
            pc.greater(pc.field("sum_qty_cents"), THRESH_C)
        )
        pos = pc.index_in(orows.column("o_orderkey"), value_set=g.column("o_orderkey"))
        keep = pc.is_valid(pos)
        orows = orows.filter(keep)
        sums = g.column("sum_qty_cents").combine_chunks().take(pos.filter(keep))
        return project(
            pa.table(
                {
                    "o_orderkey": orows.column("o_orderkey"),
                    "o_custkey": orows.column("o_custkey"),
                    "o_totalprice": orows.column("o_totalprice"),
                    "sum_qty_cents": sums,
                }
            )
        )

    u = orders.map_batches(o_tag, batch_format="pyarrow", zero_copy_batch=True).union(
        li.map_batches(l_tag, batch_format="pyarrow", zero_copy_batch=True)
    )
    u = _hash_shuffle(u)
    nparts = _partitions(rows=_table_rows(sf_dir, "orders"))
    qualified = u.repartition(num_blocks=nparts, keys=["o_orderkey"]).map_batches(
        merge_partition, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )
    from ..util import drop_empty_blocks

    return attach_customer(drop_empty_blocks(qualified))


def q10_returned_revenue(sf_dir: str):
    """TPC-H Q10-style returned-item report: top-20 customers by revenue
    on lineitems flagged 'R', resolved through orders to customer names.

    Scale strategy: the returnflag predicate is pushed INTO the parquet
    read (row groups without 'R' never leave storage); what remains folds
    per block to (orderkey, revenue-fp) partials before any join; the
    custkey attach and the per-customer merge are size-gated
    (broadcast / keyed shuffle); per-partition top-20 candidates gather
    into one final top-20 block (20 x partitions rows, never
    |customers|). Revenue is exact int64 fixed-point
    price_cents x (100 - disc_pct); ties break on custkey in BOTH
    engines."""
    import pyarrow.dataset as pads

    from ..stages.joins import broadcast_lookup_join, keyed_lookup_join

    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def li_partial(b: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        t = pa.table(
            {
                "o_orderkey": b.column("l_orderkey"),
                "fp": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)),
            }
        )
        g = pa.TableGroupBy(t, "o_orderkey").aggregate([("fp", "sum")])
        return g.rename_columns(["o_orderkey", "fp"])

    partials = li.map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    if _table_rows(sf_dir, "orders") < 2_000_000:
        keyed = broadcast_lookup_join(
            partials, orders, on="o_orderkey", dim_key="o_orderkey",
            take_cols={"o_custkey": "o_custkey"}, how="inner",
        )
    else:
        keyed = keyed_lookup_join(
            partials, orders, on="o_orderkey", dim_key="o_orderkey",
            take_cols={"o_custkey": "o_custkey"}, how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "orders")),
        )

    def cust_partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select(["o_custkey", "fp"]), "o_custkey").aggregate(
            [("fp", "sum")]
        )
        return g.rename_columns(["c_custkey", "revenue_fp"])

    def topk(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "c_custkey").aggregate([("revenue_fp", "sum")])
        g = g.rename_columns(["c_custkey", "revenue_fp"])
        order = pc.sort_indices(
            g, sort_keys=[("revenue_fp", "descending"), ("c_custkey", "ascending")]
        )
        return g.take(order.slice(0, 20))

    u = keyed.map_batches(cust_partial, batch_format="pyarrow", zero_copy_batch=True)
    if _table_rows(sf_dir, "customer") < 2_000_000:
        top = u.repartition(1).map_batches(
            topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    else:
        u = _hash_shuffle(u)
        nparts = _partitions(rows=_table_rows(sf_dir, "customer"))
        per_part = u.repartition(num_blocks=nparts, keys=["c_custkey"]).map_batches(
            topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
        top = per_part.repartition(1).map_batches(
            topk, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    if _table_rows(sf_dir, "customer") < 2_000_000:
        return broadcast_lookup_join(
            top, cust, on="c_custkey", dim_key="c_custkey",
            take_cols={"c_name": "c_name"}, how="inner",
        )
    return keyed_lookup_join(
        top, cust, on="c_custkey", dim_key="c_custkey",
        take_cols={"c_name": "c_name"}, how="inner",
        num_partitions=_partitions(rows=_table_rows(sf_dir, "customer")),
    )


def q14_promo_revenue_share(sf_dir: str):
    """TPC-H Q14-style conditional-aggregate ratio: the share of revenue
    from PROMO-type parts within a shipdate window.

    Scale strategy: the shipdate window is a read-level pyarrow dataset
    expression (row-group pruning); the part-type dimension attaches via
    the gated broadcast / keyed join; promo and total revenues fold as
    exact int64 fixed-point partials per block with the final float64
    percentage expression mirrored verbatim in the oracle."""
    from datetime import datetime

    import pyarrow.dataset as pads

    from ..stages.joins import broadcast_lookup_join, keyed_lookup_join

    lo, hi = datetime(1996, 1, 1), datetime(1996, 7, 1)
    f = pads.field
    li = _read(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(f("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (f("l_shipdate") < pa.scalar(hi, pa.timestamp("us"))),
    )
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"])
    if _table_rows(sf_dir, "part") < 2_000_000:
        joined = broadcast_lookup_join(
            li, part, on="l_partkey", dim_key="p_partkey",
            take_cols={"p_type": "p_type"}, how="inner",
        )
    else:
        joined = keyed_lookup_join(
            li, part, on="l_partkey", dim_key="p_partkey",
            take_cols={"p_type": "p_type"}, how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "lineitem")),
        )

    def partial(b: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(b.column("l_discount"), 100.0)), pa.int64())
        fp = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc))
        promo = pc.equal(b.column("p_type"), "PROMO")
        promo_fp = pc.sum(fp.filter(promo)).as_py() or 0
        return pa.table(
            {
                "promo_fp": pa.array([promo_fp], pa.int64()),
                "total_fp": pa.array([pc.sum(fp).as_py() or 0], pa.int64()),
                "n": pa.array([len(b)], pa.int64()),
            }
        )

    def fold(t: pa.Table) -> pa.Table:
        promo = pc.sum(t.column("promo_fp")).as_py() or 0
        total = pc.sum(t.column("total_fp")).as_py() or 0
        n = pc.sum(t.column("n")).as_py() or 0
        share = 100.0 * promo / total if total else None
        return pa.table(
            {
                "promo_share_pct": pa.array([share], pa.float64()),
                "n_lines": pa.array([n], pa.int64()),
            }
        )

    from ..stages.stats import partial_fold

    return partial_fold(joined, partial, fold)


def q22_idle_balance(sf_dir: str):
    """TPC-H Q22-style: customers with above-average positive balances
    who never placed a HIGH-VALUE order (totalprice above 300k — every
    custkey appears in orders at all testdata tiers, so the unfiltered
    anti set is empty), aggregated per market segment. Combines a GLOBAL
    scalar subquery (the average) with an anti join and a bounded
    group-by; the totalprice predicate is pushed into the orders read.

    Scale strategy: pass 1 folds (sum of positive balances, their count)
    to one tiny row; the threshold compare is exact integer
    cross-multiplication (bal_cents x n_pos > sum_pos_cents, identical in
    the oracle). Pass 2 streams customers through the vectorized
    threshold filter and the size-gated anti membership vs order
    custkeys (broadcast below 2M orders, keyed anti shuffle above —
    duplicate buyer keys need no distinct pass, index_in is a presence
    test), then folds bounded per-segment partials."""
    from ..stages.joins import broadcast_semi_join, keyed_lookup_join
    from ..stages.stats import partial_fold

    cust_bal = _read(sf_dir, "customer", columns=["c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("c_acctbal"), 100.0)), pa.int64())
        pos = cents.filter(pc.greater(cents, 0))
        return pa.table(
            {
                "s": pa.array([pc.sum(pos).as_py() or 0], pa.int64()),
                "n": pa.array([len(pos)], pa.int64()),
            }
        )

    def bal_fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "s": pa.array([pc.sum(t.column("s")).as_py() or 0], pa.int64()),
                "n": pa.array([pc.sum(t.column("n")).as_py() or 0], pa.int64()),
            }
        )

    g = partial_fold(cust_bal, bal_partial, bal_fold).take_all()[0]
    sum_pos, n_pos = int(g["s"]), int(g["n"])

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    def rich(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("c_acctbal"), 100.0)), pa.int64())
        keep = pc.greater(pc.multiply(cents, n_pos), sum_pos)
        out = b.filter(keep)
        return pa.table(
            {
                "c_custkey": out.column("c_custkey"),
                "c_mktsegment": out.column("c_mktsegment"),
                "bal_cents": pc.cast(
                    pc.round(pc.multiply(out.column("c_acctbal"), 100.0)), pa.int64()
                ),
            }
        )

    import pyarrow.dataset as pads

    rich_ds = cust.map_batches(rich, batch_format="pyarrow", zero_copy_batch=True)
    buyers = _read(
        sf_dir, "orders", columns=["o_custkey"],
        filter=(pads.field("o_totalprice") > 300_000.0),
    )
    if _table_rows(sf_dir, "orders") < 2_000_000:
        idle = broadcast_semi_join(rich_ds, buyers, on="c_custkey", anti=True)
    else:
        idle = keyed_lookup_join(
            rich_ds, buyers, on="c_custkey", dim_key="o_custkey",
            take_cols={}, how="anti",
            num_partitions=_partitions(rows=_table_rows(sf_dir, "customer")),
        )

    def seg_partial(b: pa.Table) -> pa.Table:
        g2 = pa.TableGroupBy(
            b.select(["c_mktsegment", "bal_cents"]), "c_mktsegment"
        ).aggregate([("bal_cents", "sum"), ("bal_cents", "count")])
        return pa.table(
            {
                "segment": g2.column("c_mktsegment"),
                "total_bal_cents": g2.column("bal_cents_sum"),
                "n_custs": g2.column("bal_cents_count").cast(pa.int64()),
            }
        )

    def seg_fold(t: pa.Table) -> pa.Table:
        g2 = pa.TableGroupBy(t, "segment").aggregate(
            [("total_bal_cents", "sum"), ("n_custs", "sum")]
        )
        return g2.rename_columns(["segment", "total_bal_cents", "n_custs"])

    return partial_fold(idle, seg_partial, seg_fold)


def q7_nation_volume(sf_dir: str):
    """TPC-H Q7-style volume shipping between nation pairs: revenue per
    (supplier nation, customer nation) pair, cross-border only, within a
    shipdate window — the longest dimension chain in the roster
    (lineitem -> supplier -> nation, lineitem -> orders -> customer ->
    nation).

    Scale strategy: the shipdate window is a read-level expression; the
    supplier and customer nation attaches are size-gated broadcast /
    keyed joins; the orders custkey attach reuses the same gate. The
    nation-name map (25 rows) is a driver-side constant like q5's.
    Everything after the attaches folds per block to the BOUNDED
    (supp_nation, cust_nation) domain (<= 25 x 24 rows) and one final
    merge — no keyed shuffle on the pair key at any size."""
    from datetime import datetime

    import pyarrow.dataset as pads

    from ..stages.joins import broadcast_lookup_join, keyed_lookup_join

    lo, hi = datetime(1996, 1, 1), datetime(1998, 1, 1)
    f = pads.field
    li = _read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        filter=(f("l_shipdate") >= pa.scalar(lo, pa.timestamp("us")))
        & (f("l_shipdate") < pa.scalar(hi, pa.timestamp("us"))),
    )

    def attach(ds, dim_table, on, dim_key, out_col, src_col, gate_table, fact_rows_table):
        dim = _read(sf_dir, dim_table, columns=[dim_key, src_col])
        if _table_rows(sf_dir, gate_table) < 2_000_000:
            return broadcast_lookup_join(
                ds, dim, on=on, dim_key=dim_key,
                take_cols={src_col: out_col}, how="inner",
            )
        return keyed_lookup_join(
            ds, dim, on=on, dim_key=dim_key,
            take_cols={src_col: out_col}, how="inner",
            num_partitions=_partitions(rows=_table_rows(sf_dir, fact_rows_table)),
        )

    ds = attach(li, "supplier", "l_suppkey", "s_suppkey", "supp_nk", "s_nationkey",
                "supplier", "lineitem")
    ds = attach(ds, "orders", "l_orderkey", "o_orderkey", "o_custkey", "o_custkey",
                "orders", "lineitem")
    ds = attach(ds, "customer", "o_custkey", "c_custkey", "cust_nk", "c_nationkey",
                "customer", "lineitem")

    nat = fs_read_nation(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        keep = pc.invert(pc.equal(b.column("supp_nk"), b.column("cust_nk")))
        t = b.filter(keep)
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"), 100.0)), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t.column("l_discount"), 100.0)), pa.int64())
        t2 = pa.table(
            {
                "supp_nk": t.column("supp_nk"),
                "cust_nk": t.column("cust_nk"),
                "fp": pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc)),
            }
        )
        g = pa.TableGroupBy(t2, ["supp_nk", "cust_nk"]).aggregate(
            [("fp", "sum"), ("fp", "count")]
        )
        return g.rename_columns(["supp_nk", "cust_nk", "revenue_fp", "n_lines"])

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, ["supp_nk", "cust_nk"]).aggregate(
            [("revenue_fp", "sum"), ("n_lines", "sum")]
        )
        sn = [nat[k] for k in g.column("supp_nk").to_pylist()]
        cn = [nat[k] for k in g.column("cust_nk").to_pylist()]
        return pa.table(
            {
                "supp_nation": pa.array(sn, pa.string()),
                "cust_nation": pa.array(cn, pa.string()),
                "revenue_fp": g.column("revenue_fp_sum"),
                "n_lines": g.column("n_lines_sum").cast(pa.int64()),
            }
        )

    from ..stages.stats import partial_fold

    return partial_fold(ds, partial, fold)


def fs_read_nation(sf_dir: str) -> dict:
    """Driver-side nationkey -> name map (25 rows, the q5 pattern)."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    return dict(zip(t.column("n_nationkey").to_pylist(), t.column("n_name").to_pylist()))


def parts_cheapest_per_type(sf_dir: str):
    """TPC-H Q2-style argmin-row-per-group: for every part type, THE
    cheapest part (row retrieval, not just the min) with ties broken on
    the smallest partkey — the correlated min-subquery join-back shape.

    Scale strategy: the lexicographic (price, partkey) argmin packs into
    ONE int64 (price_cents << 34 | partkey — exact while price_cents <
    2^29 and partkey < 2^34, far past the 100-TB tier), so each block
    folds to one packed-min candidate per type present (bounded domain)
    and one final block takes the group min and unpacks — an ordinary
    mergeable MIN, shuffle-free at any size, no order-dependent
    aggregate anywhere."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type", "p_retailprice"])
    SHIFT = 34

    def partial(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(b.column("p_retailprice"), 100.0)), pa.int64())
        packed = pc.add(
            pc.shift_left(cents, SHIFT), b.column("p_partkey").cast(pa.int64())
        )
        t = pa.table({"p_type": b.column("p_type"), "packed": packed})
        g = pa.TableGroupBy(t, "p_type").aggregate([("packed", "min")])
        return g.rename_columns(["p_type", "packed"])

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, "p_type").aggregate([("packed", "min")])
        packed = g.column("packed_min")
        return pa.table(
            {
                "p_type": g.column("p_type"),
                "price_cents": pc.shift_right(packed, SHIFT),
                "p_partkey": pc.bit_wise_and(
                    packed, pa.scalar((1 << SHIFT) - 1, pa.int64())
                ),
            }
        )

    from ..stages.stats import partial_fold

    return partial_fold(part, partial, fold)
