"""Reusable grouped-statistics kernels shared by the query surface.

Every kernel follows the map-side-partial → single-fold shape: a
vectorized ``map_batches`` stage reduces each Arrow block to a tiny
per-group partial (|rows| → |groups| or |distinct pairs|), the partials
concentrate on one partition, and one fold finishes the job. The fold's
input is O(blocks × groups), never O(rows), so the pattern holds at
100-TB inputs as long as the group domain is bounded — the same
contract the sketch stages document.

Mirrors the spirit of the reference's aggregate helpers
(/root/reference/crates/libs/lib-etl/src/transform.rs — scalar chains
over rows) re-expressed as Arrow partials over Ray Data blocks.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..util import drop_empty_blocks


def partial_fold(ds, partial: Callable, fold: Callable):
    """The shared two-stage reduction: vectorized per-block ``partial``
    → all partials onto one partition → one ``fold``. Both callables are
    pyarrow.Table → pyarrow.Table and run zero-copy.

    The single fold's input is O(blocks × key domain), so this shape is
    only safe when the partials' key domain is BOUNDED (event types,
    value cents, column names). For a domain that grows with the data
    (primary keys, user ids, high-cardinality values) use
    ``keyed_partial_fold`` — otherwise the one fold task receives the
    whole domain and becomes a single-node funnel at scale."""
    return drop_empty_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(
            fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )


def keyed_partial_fold(
    ds, partial: Callable, fold: Callable, keys: Sequence[str], num_partitions: int
):
    """Shuffle tier of ``partial_fold`` for key domains that grow with
    the data: the per-block partials hash-shuffle on ``keys`` so every
    fold task sees only its key range — no task ever receives the whole
    domain. ``fold`` must be key-local: every output row derives from
    the cells of ONE key tuple (true of mode argmax, set-op membership
    masks, duplicate-count checks). Per-key-range fold outputs that are
    themselves partials (a count per partition, say) still need a tiny
    final reduce — that input is O(partitions), which is bounded."""
    from ray.data.context import ShuffleStrategy

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    parts.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return drop_empty_blocks(
        parts.repartition(num_blocks=num_partitions, keys=list(keys)).map_batches(
            fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )


# --- exact integer moments → closed-form statistics --------------------------


def _moment_cols(with_syy: bool) -> list[str]:
    return ["n", "sx", "sy", "sxx"] + (["syy"] if with_syy else []) + ["sxy"]


def _grouped_moments(ds, key: str, build_xy: Callable, with_syy: bool):
    """Fold exact int64 moment sums (n, Σx, Σy, Σx², [Σy²,] Σxy) per
    group. ``build_xy(block) -> (x, y)`` returns two int64 arrays; exact
    integer partials mean the fold is associative with no FP drift, and
    the finalizer's IEEE expression is bit-equal to SQL's over the same
    moments."""
    cols = _moment_cols(with_syy)

    def partial(b: pa.Table) -> pa.Table:
        x, y = build_xy(b)
        data = {
            key: b.column(key),
            "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            "sx": x,
            "sy": y,
            "sxx": pc.multiply(x, x),
        }
        if with_syy:
            data["syy"] = pc.multiply(y, y)
        data["sxy"] = pc.multiply(x, y)
        g = pa.TableGroupBy(pa.table(data), key).aggregate(
            [(c, "sum") for c in cols]
        )
        return g.rename_columns([key] + cols)

    def refold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, key).aggregate([(c, "sum") for c in cols])
        return g.rename_columns([key] + cols)

    return partial, refold


def _np(t: pa.Table, c: str) -> np.ndarray:
    return t.column(c).to_numpy(zero_copy_only=False).astype(np.float64)


def grouped_pearson(ds, key: str, build_xy: Callable):
    """Pearson r per group from one pass of exact integer moments.
    Zero-variance groups emit NULL like SQL's division by zero."""
    partial, refold = _grouped_moments(ds, key, build_xy, with_syy=True)

    def fold(t: pa.Table) -> pa.Table:
        g = refold(t)
        n, sx, sy = _np(g, "n"), _np(g, "sx"), _np(g, "sy")
        sxx, syy, sxy = _np(g, "sxx"), _np(g, "syy"), _np(g, "sxy")
        denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = (n * sxy - sx * sy) / denom
        bad = denom == 0.0
        return g.append_column(
            "corr", pa.array(np.where(bad, np.nan, corr), pa.float64(), mask=bad)
        )

    return partial_fold(ds, partial, fold)


def grouped_ols(ds, key: str, build_xy: Callable):
    """Single-regressor OLS per group (closed-form normal-equation
    solve) from the same exact integer moments as ``grouped_pearson``.
    Zero-variance groups emit NULL slope/intercept."""
    partial, refold = _grouped_moments(ds, key, build_xy, with_syy=False)

    def fold(t: pa.Table) -> pa.Table:
        g = refold(t)
        n, sx, sy = _np(g, "n"), _np(g, "sx"), _np(g, "sy")
        sxx, sxy = _np(g, "sxx"), _np(g, "sxy")
        denom = n * sxx - sx * sx
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = (n * sxy - sx * sy) / denom
            intercept = (sy - slope * sx) / n
        bad = denom == 0.0
        return pa.table(
            {
                key: g.column(key),
                "n": g.column("n"),
                "slope": pa.array(
                    np.where(bad, np.nan, slope), pa.float64(), mask=bad
                ),
                "intercept": pa.array(
                    np.where(bad, np.nan, intercept), pa.float64(), mask=bad
                ),
            }
        )

    return partial_fold(ds, partial, fold)


# --- winsorized statistics ----------------------------------------------------


def winsorized_group_stats(ds, key: str, value: str, plo: float, phi: float):
    """Per-group winsorization over an integer domain: cap ``value`` at
    the EXACT per-group plo/phi order statistics (percentile_disc via
    grouping.grouped_quantiles_discrete), then sum/count the capped
    values. The caps table is one row per group — it broadcasts via
    ray.put; values never leave their blocks, so the only shuffle is the
    quantile kernel's keyed exchange."""
    import ray as _ray

    from .grouping import grouped_quantiles_discrete

    def _pcol(p: float) -> str:
        # mirror grouped_quantiles_discrete's output naming (p005, p095, ...)
        return "p" + str(float(p)).replace(".", "")

    caps = pa.Table.from_pylist(
        grouped_quantiles_discrete(ds, key, value, [plo, phi]).take_all()
    )
    lo = dict(zip(caps.column(key).to_pylist(), caps.column(_pcol(plo)).to_pylist()))
    hi = dict(zip(caps.column(key).to_pylist(), caps.column(_pcol(phi)).to_pylist()))
    gkeys = pa.array(sorted(lo), pa.string())
    lo_arr = pa.array([lo[k] for k in sorted(lo)], pa.int64())
    hi_arr = pa.array([hi[k] for k in sorted(hi)], pa.int64())
    ref = _ray.put((gkeys, lo_arr, hi_arr))

    def partial(b: pa.Table) -> pa.Table:
        ks, los, his = _ray.get(ref)
        pos = pc.index_in(b.column(key), value_set=ks)
        w = pc.min_element_wise(
            pc.max_element_wise(b.column(value), los.take(pos)), his.take(pos)
        )
        t = pa.table(
            {
                key: b.column(key),
                "w": w,
                "one": pa.array(np.ones(b.num_rows, dtype=np.int64)),
            }
        )
        g = pa.TableGroupBy(t, key).aggregate([("w", "sum"), ("one", "sum")])
        return g.rename_columns([key, "wsum", "n"])

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, key).aggregate([("wsum", "sum"), ("n", "sum")])
        return g.rename_columns([key, "winsorized_cents", "n"])

    return partial_fold(ds, partial, fold)


# --- column profiling ---------------------------------------------------------


def profile_columns(
    ds, cols: Sequence[str], numeric: Sequence[str], num_partitions: int | None = None
):
    """Data-quality column profile (the Deequ/expectations shape): one
    row per column with row count, null count, EXACT distinct count and
    canonical min/max strings. Per-batch partials carry per-column
    unique-value sets (the |rows| → |domain| reduction); one fold unions
    them.

    ``num_partitions`` selects the keyed-shuffle tier for columns whose
    domain grows with the data (ids, high-cardinality values): distinct
    (column, value) cells hash-shuffle so each partition counts its own
    cells exactly and emits per-column additive partials (n, nulls,
    distinct, min/max); a tiny final fold over O(columns × partitions)
    rows finishes. Exact at any scale — no single task ever holds a
    whole column's domain. (The HLL sketch remains the cheaper
    approximate option when exactness isn't required.)"""
    cols = list(cols)
    numeric = set(numeric)

    def partial(b: pa.Table) -> pa.Table:
        out = []
        for c in cols:
            col = b.column(c)
            u = pc.unique(pc.drop_null(col))
            nonnull = b.num_rows - col.null_count
            out.append(
                {
                    "column": c,
                    "n": b.num_rows,
                    "nulls": col.null_count,
                    "uniques": [str(x) for x in u.to_pylist()],
                    "vmin": str(pc.min(col).as_py()) if nonnull else None,
                    "vmax": str(pc.max(col).as_py()) if nonnull else None,
                }
            )
        return pa.Table.from_pylist(
            out,
            schema=pa.schema(
                [
                    ("column", pa.string()),
                    ("n", pa.int64()),
                    ("nulls", pa.int64()),
                    ("uniques", pa.list_(pa.string())),
                    ("vmin", pa.string()),
                    ("vmax", pa.string()),
                ]
            ),
        )

    def fold(t: pa.Table) -> pa.Table:
        out = []
        for c in cols:
            rows = t.filter(pc.equal(t.column("column"), c))
            uniq = set()
            for lst in rows.column("uniques").to_pylist():
                uniq.update(lst)
            mins = [x for x in rows.column("vmin").to_pylist() if x is not None]
            maxs = [x for x in rows.column("vmax").to_pylist() if x is not None]
            k = (lambda v: int(v)) if c in numeric else (lambda v: v)
            out.append(
                {
                    "column": c,
                    "n": int(pc.sum(rows.column("n")).as_py() or 0),
                    "nulls": int(pc.sum(rows.column("nulls")).as_py() or 0),
                    "n_distinct": len(uniq),
                    "vmin": min(mins, key=k) if mins else None,
                    "vmax": max(maxs, key=k) if maxs else None,
                }
            )
        return pa.Table.from_pylist(out)

    if num_partitions is None:
        return partial_fold(ds, partial, fold)

    CELL_SCHEMA = pa.schema(
        [("column", pa.string()), ("value", pa.string()), ("cnt", pa.int64())]
    )
    PART_SCHEMA = pa.schema(
        [
            ("column", pa.string()),
            ("n", pa.int64()),
            ("nulls", pa.int64()),
            ("n_distinct", pa.int64()),
            ("vmin", pa.string()),
            ("vmax", pa.string()),
        ]
    )

    def cell_partial(b: pa.Table) -> pa.Table:
        rows = []
        for c in cols:
            col = b.column(c)
            vc = pc.value_counts(pc.drop_null(col))
            for v, cnt in zip(
                vc.field("values").to_pylist(), vc.field("counts").to_pylist()
            ):
                rows.append({"column": c, "value": str(v), "cnt": int(cnt)})
            if col.null_count:
                rows.append({"column": c, "value": None, "cnt": col.null_count})
        return pa.Table.from_pylist(rows, schema=CELL_SCHEMA)

    def part_fold(t: pa.Table) -> pa.Table:
        # this partition holds EVERY copy of its (column, value) cells:
        # merged counts are exact totals, distinct/min/max are final for
        # the partition's value range and additive across partitions
        g = pa.TableGroupBy(t, ["column", "value"]).aggregate([("cnt", "sum")])
        g = g.rename_columns(["column", "value", "cnt"])
        out = []
        for c in set(pc.unique(g.column("column")).to_pylist()):
            rows = g.filter(pc.equal(g.column("column"), c))
            isnull = pc.is_null(rows.column("value"))
            nulls = int(pc.sum(rows.filter(isnull).column("cnt")).as_py() or 0)
            vals = rows.filter(pc.invert(isnull))
            k = (lambda v: int(v)) if c in numeric else (lambda v: v)
            vl = vals.column("value").to_pylist()
            out.append(
                {
                    "column": c,
                    "n": int(pc.sum(rows.column("cnt")).as_py() or 0),
                    "nulls": nulls,
                    "n_distinct": len(vl),
                    "vmin": min(vl, key=k) if vl else None,
                    "vmax": max(vl, key=k) if vl else None,
                }
            )
        return pa.Table.from_pylist(out, schema=PART_SCHEMA)

    def final_fold(t: pa.Table) -> pa.Table:
        out = []
        for c in cols:
            rows = t.filter(pc.equal(t.column("column"), c))
            mins = [x for x in rows.column("vmin").to_pylist() if x is not None]
            maxs = [x for x in rows.column("vmax").to_pylist() if x is not None]
            k = (lambda v: int(v)) if c in numeric else (lambda v: v)
            out.append(
                {
                    "column": c,
                    "n": int(pc.sum(rows.column("n")).as_py() or 0),
                    "nulls": int(pc.sum(rows.column("nulls")).as_py() or 0),
                    "n_distinct": int(pc.sum(rows.column("n_distinct")).as_py() or 0),
                    "vmin": min(mins, key=k) if mins else None,
                    "vmax": max(maxs, key=k) if maxs else None,
                }
            )
        return pa.Table.from_pylist(out)

    parts = keyed_partial_fold(
        ds, cell_partial, part_fold, ["column", "value"], num_partitions
    )
    return drop_empty_blocks(
        parts.repartition(1).map_batches(
            final_fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )


# --- per-group mode -----------------------------------------------------------


def grouped_mode(
    ds,
    key: str,
    value: str,
    out_value: str,
    out_count: str,
    num_partitions: int | None = None,
):
    """MODE per group: the most frequent ``value`` per ``key`` (ties →
    smaller value, SQL-mirrorable). Per-batch (group, value) count
    partials, one fold, then a vectorized per-group argmax by sort +
    first-per-key mask.

    ``num_partitions`` selects the keyed-shuffle tier for unbounded
    (group, value) domains, sharded in BOTH dimensions: cells
    hash-shuffle on (key, value) — so a hot group's value domain never
    lands in one task — each partition merges its cells exactly and
    argmaxes a per-key candidate; a second shuffle on ``key`` reduces
    the O(keys × partitions) candidates to the final per-key mode."""
    from .merge_apply import _first_per_key_mask

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(b.select([key, value]), [key, value]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([key, value, "c"])

    def fold(t: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(t, [key, value]).aggregate([("c", "sum")])
        g = g.rename_columns([key, value, "c"])
        idx = pc.sort_indices(
            g,
            sort_keys=[(key, "ascending"), ("c", "descending"), (value, "ascending")],
        )
        g = g.take(idx)
        g = g.filter(_first_per_key_mask(g, (key,)))
        return pa.table(
            {
                key: g.column(key),
                out_value: g.column(value),
                out_count: g.column("c"),
            }
        )

    if num_partitions is None:
        return partial_fold(ds, partial, fold)

    # stage 1: every copy of a (key, value) cell lands in one partition,
    # so the merged count is exact and fold's argmax yields this value
    # range's candidate per key — rename to the partial's column names
    # so the final fold can rerun the same argmax over the candidates
    def cell_fold(t: pa.Table) -> pa.Table:
        return fold(t).rename_columns([key, value, "c"])

    cands = keyed_partial_fold(ds, partial, cell_fold, [key, value], num_partitions)
    # stage 2: O(keys × partitions) candidate rows, keyed on the group —
    # never a single-task fold over an unbounded key domain either
    from ray.data.context import ShuffleStrategy

    cands.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return drop_empty_blocks(
        cands.repartition(num_blocks=num_partitions, keys=[key]).map_batches(
            fold, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
        )
    )
