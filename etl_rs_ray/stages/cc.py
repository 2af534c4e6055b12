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

    labels = (
        _hash_shuffle(adj.map_batches(self_and_nbr, batch_format="pyarrow", zero_copy_batch=True)
                      .union(adj.map_batches(
                          lambda b: pa.table({"node": b.column("node"), "label": b.column("node")}),
                          batch_format="pyarrow", zero_copy_batch=True)))
        .groupby("node", num_partitions=num_partitions)
        .aggregate(Min("label", alias_name="label"))
        .materialize()
    )

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
        # converged when the label multiset is unchanged (labels only ever
        # decrease, so an equal SUM means no label moved)
        old_sum = labels.sum("label")
        new_sum = new_labels.sum("label")
        labels = new_labels
        if old_sum == new_sum:
            break
    return labels.map_batches(
        lambda b: pa.table({"node": b.column("node"), "root": b.column("label")}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def removal_ds(edges, num_partitions: int = 8) -> "ray.data.Dataset":
    """Nodes to drop — every node that is not its component's min id — as
    a DATASET: nothing is collected to the driver, so the duplicate graph
    can exceed driver memory. Consume via an anti join against the corpus
    (``Dataset.join(..., "left_anti")``) or collect when known-small."""
    cc = connected_components(edges, num_partitions)
    return cc.map_batches(
        lambda b: pa.table(
            {"node": b.filter(pc.not_equal(b.column("node"), b.column("root"))).column("node")}
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def removal_set_distributed(edges, num_partitions: int = 8) -> set:
    """Driver-side view of :func:`removal_ds` (small graphs / tests)."""
    return {r["node"] for r in removal_ds(edges, num_partitions).take_all()}
