"""Distributed connected components over an edge Dataset — min-label
propagation (a Pregel-style iterate: each node adopts the smallest label
among itself and its neighbors until fixpoint).

Replaces the driver-side union-find in the dedup family when the
duplicate graph itself is too large to collect: every step is Ray-native
(flat emit + hash-shuffle groupby min), state lives in the object store,
and rounds converge in O(component diameter) — near-dup clusters are
almost always diameter <= 2-3.

Returns (node, root) assignments; the removal set for dedup is every node
whose root differs from itself (the min node id per component survives,
matching the union-find's deterministic smallest-root-wins rule).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min


def _hash_shuffle(ds):
    from ray.data.context import ShuffleStrategy

    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds


def connected_components(
    edges, num_partitions: int = 8, max_rounds: int = 12
) -> "ray.data.Dataset":
    """edges: Dataset or pa.Table with int64 columns (a, b), undirected.
    Returns a Dataset (node, root)."""
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)

    # undirected adjacency, both directions (node -> neighbor)
    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("a").combine_chunks()
        b = batch.column("b").combine_chunks()
        return pa.table(
            {
                "node": pa.concat_arrays([a.cast(pa.int64()), b.cast(pa.int64())]),
                "nbr": pa.concat_arrays([b.cast(pa.int64()), a.cast(pa.int64())]),
            }
        )

    adj = edges.map_batches(both_dirs, batch_format="pyarrow", zero_copy_batch=True).materialize()

    # labels: node -> min(node, min neighbor) as the first round
    def self_and_nbr(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"), "label": batch.column("nbr")})

    from ..util import blocks_stats

    labels = (
        _hash_shuffle(adj.map_batches(self_and_nbr, batch_format="pyarrow", zero_copy_batch=True)
                      .union(adj.map_batches(
                          lambda b: pa.table({"node": b.column("node"), "label": b.column("node")}),
                          batch_format="pyarrow", zero_copy_batch=True)))
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )
    # convergence check: labels only ever decrease, so an unchanged SUM
    # means no label moved. Sums come from the already-materialized label
    # blocks (blocks_stats) and the previous round's sum is reused — zero
    # extra dataset executions per round.
    prev_sum = blocks_stats(labels, ["label"])[1]

    for _round in range(max_rounds):
        # propagate: neighbor's current label -> node, plus keep own label
        joined = adj.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("nbr",),
            right_on=("node",),
            right_suffix="_r",
        )

        def msg(batch: pa.Table) -> pa.Table:
            return pa.table({"node": batch.column("node"), "label": batch.column("label")})

        msgs = joined.map_batches(msg, batch_format="pyarrow", zero_copy_batch=True)
        new_labels = (
            _hash_shuffle(msgs.union(labels))
            .groupby("node", num_partitions=num_partitions)
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new_sum = blocks_stats(new_labels, ["label"])[1]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "root": b.column("label")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def _canonical(ds) -> "ray.data.Dataset":
    """(a, b) -> (min, max), self-loops dropped, exact-dup edges kept
    (they collapse in the next groupby anyway)."""

    def canon(batch: pa.Table) -> pa.Table:
        a = batch.column("a").cast(pa.int64())
        b = batch.column("b").cast(pa.int64())
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"a": lo, "b": hi})
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    return ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)


_EDGE_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])


def _materialize_edges(ds) -> "ray.data.Dataset":
    """Materialize edges with zero-row blocks stripped (util.drop_empty_blocks)."""
    from ..util import drop_empty_blocks

    return drop_empty_blocks(ds, _EDGE_SCHEMA)


def _distinct_edges(ds, num_partitions: int) -> "ray.data.Dataset":
    """Exact per-round dedup of the edge multiset. Without it, duplicate
    edges duplicate adjacency rows which duplicate next-round emits —
    multiplicative growth across rounds."""
    from ray.data.aggregate import Count

    return (
        _hash_shuffle(ds)
        .groupby(["a", "b"], num_partitions=num_partitions)
        .aggregate(Count(alias_name="_n"))
        .map_batches(
            lambda b: b.select(["a", "b"]), batch_format="pyarrow", zero_copy_batch=True
        )
    )


def connected_components_star(
    edges, num_partitions: int = 8, max_rounds: int = 24
) -> "ray.data.Dataset":
    """Alternating large-star / small-star connected components
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log d) rounds instead of min-label's O(d), so a long
    chain that min-label cannot finish inside its round budget resolves
    here. Each half-round is one grouped pass: hash-shuffle adjacency by
    node, compute m and emit rewired edges inside map_groups (no join
    operator), then an exact edge-distinct; returns (node, root).

    large-star: every neighbor v > u rewires to m = min({u} ∪ N(u));
    small-star: every neighbor v ≤ u (and u) rewires to
    m = min({u} ∪ {v ∈ N(u), v ≤ u}). Fixpoint = star graphs rooted at
    each component's min id.
    """
    if isinstance(edges, pa.Table):
        edges = ray.data.from_arrow(edges)
    cur = _materialize_edges(_distinct_edges(_canonical(edges), num_partitions))

    def adj_of(e):
        def both(batch: pa.Table) -> pa.Table:
            a = batch.column("a").combine_chunks()
            b = batch.column("b").combine_chunks()
            return pa.table({"node": pa.concat_arrays([a, b]), "nbr": pa.concat_arrays([b, a])})

        return e.map_batches(both, batch_format="pyarrow", zero_copy_batch=True)

    def checksum(e) -> tuple:
        # (edge count, sum a, sum b) straight from the edge blocks that
        # _materialize_edges just pinned — no extra dataset execution
        from ..util import blocks_stats

        return blocks_stats(e.materialize(), ["a", "b"])

    def large_star(group: pa.Table) -> pa.Table:
        # one node's whole neighborhood per call: m = min({u} ∪ N(u)),
        # every neighbor v > u rewires to (m, v)
        node = group.column("node")[0].as_py()
        nbrs = group.column("nbr")
        m = min(node, pc.min(nbrs).as_py())
        out = pc.unique(nbrs.filter(pc.greater(nbrs, node)).combine_chunks())
        out = out.filter(pc.not_equal(out, m))
        return pa.table({"a": pa.array([m] * len(out), pa.int64()), "b": out})

    def small_star(group: pa.Table) -> pa.Table:
        # m = min over the ≤-side ∪ {u}; every v in N≤(u) ∪ {u} rewires
        node = group.column("node")[0].as_py()
        nbrs = group.column("nbr")
        le = nbrs.filter(pc.less_equal(nbrs, node)).combine_chunks()
        if len(le) == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())})
        m = min(node, pc.min(le).as_py())
        out = pc.unique(pa.concat_arrays([le, pa.array([node], pa.int64())]))
        out = out.filter(pc.not_equal(out, m))
        return pa.table({"a": pa.array([m] * len(out), pa.int64()), "b": out})

    prev = None
    for _round in range(max_rounds):
        for fn in (large_star, small_star):
            cur = _materialize_edges(
                _distinct_edges(
                    _canonical(
                        _hash_shuffle(adj_of(cur))
                        .groupby("node", num_partitions=num_partitions)
                        .map_groups(fn, batch_format="pyarrow")
                    ),
                    num_partitions,
                )
            )
        sig = checksum(cur)
        if sig == prev:
            break
        prev = sig

    # fixpoint: stars (root=a, child=b). assignments = children + roots
    def assigns(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [batch.column("b").combine_chunks(), batch.column("a").combine_chunks()]
                ),
                "root": pa.concat_arrays(
                    [batch.column("a").combine_chunks(), batch.column("a").combine_chunks()]
                ),
            }
        )

    out = cur.map_batches(assigns, batch_format="pyarrow", zero_copy_batch=True)
    # roots appear once per child edge: collapse to one row per node
    return (
        _hash_shuffle(out)
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("root", alias_name="root"))
    )


def removal_ds(edges, num_partitions: int = 8, algorithm: str = "label") -> "ray.data.Dataset":
    """Nodes to drop — every node that is not its component's min id — as
    a DATASET: nothing is collected to the driver, so the duplicate graph
    can exceed driver memory. Consume via an anti join against the corpus
    (``Dataset.join(..., "left_anti")``) or collect when known-small.

    ``algorithm``: "label" (min-label, O(diameter) rounds — right for the
    shallow clusters near-dup graphs produce) or "star" (large-star/
    small-star, O(log d) rounds — right when components may be long
    chains)."""
    fn = {"label": connected_components, "star": connected_components_star}[algorithm]
    cc = fn(edges, num_partitions)
    return cc.map_batches(
        lambda b: pa.table(
            {"node": b.filter(pc.not_equal(b.column("node"), b.column("root"))).column("node")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def removal_set_distributed(edges, num_partitions: int = 8, algorithm: str = "label") -> set:
    """Driver-side view of :func:`removal_ds` (small graphs / tests)."""
    return {r["node"] for r in removal_ds(edges, num_partitions, algorithm=algorithm).take_all()}
