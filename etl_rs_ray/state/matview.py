"""Persisted materialized views with incremental refresh.

The operational wrapper around ``stages/ivm.maintain_grouped_agg``: a
grouped-aggregate view over a lake table lives in its own directory and
is refreshed from the table's CHANGE FEED, never recomputed — the
refresh cost tracks |changes since last refresh|, not |table|, which is
the only viable freshness model for aggregate views over a 100 TB
upsert table.

Layout::

    view_dir/META.json            (source table, group/sum spec — immutable)
    view_dir/view-<epoch>.parquet (view state as of source epoch N)
    view_dir/CURRENT              (int pointer: newest refreshed epoch)

Crash safety mirrors the lake manifest protocol: the view file is
written atomically FIRST (deterministic bytes — maintain_grouped_agg
output is group-sorted, so a retry rewrites identical content), then
``CURRENT`` advances through the flock-serialized monotonic pointer.
A crash between the two leaves CURRENT on the old epoch; the retried
refresh re-reads the OLD view, re-pulls the same feed window, and
converges — refresh is idempotent.

If the source table vacuumed away the view's last-refreshed manifest,
the incremental path is gone; refresh falls back to a full rebuild from
the bootstrap feed (``changes(None, head)``) and says so in its result.

Domain assumption (by design): the GROUP domain is bounded — dashboard
aggregates (per type / lang / day / region), not per-key rollups. The
stored view and the per-refresh delta fold are O(groups) driver-side
Arrow; feed increments are partial-aggregated inside the shuffle-free
bucket-diff tasks first, so the driver only ever folds
O(groups × feed blocks) tiny rows. For a group domain that scales with
the data (group = user/key), a flat view is the wrong structure at any
implementation — the bucketed lake table itself IS the per-key view
(LWW state, point-readable via ``lookup``), and per-key aggregates
belong in a second lake table maintained by a keyed-shuffle replay
(stages/stats.keyed_partial_fold is the building block).
"""

from __future__ import annotations

import pyarrow as pa

from ..sources.lake import LakeTable
from . import fs


class MaterializedView:
    def __init__(
        self,
        view_dir: str,
        table_dir: str | None = None,
        group_col: str | None = None,
        sum_cols: list[str] | None = None,
    ):
        self.view_dir = view_dir
        fs.makedirs(view_dir)
        self.meta_path = fs.join(view_dir, "META.json")
        self.current_path = fs.join(view_dir, "CURRENT")
        if fs.exists(self.meta_path):
            meta = fs.read_json(self.meta_path)
            for given, stored, name in (
                (table_dir, meta["table_dir"], "table_dir"),
                (group_col, meta["group_col"], "group_col"),
                (sum_cols, meta["sum_cols"], "sum_cols"),
            ):
                if given is not None and list_or(given) != list_or(stored):
                    raise ValueError(
                        f"view {view_dir} was created with {name}={stored!r}; "
                        f"got {given!r} — views are spec-immutable, create a "
                        "new directory for a different spec"
                    )
            self.table_dir = meta["table_dir"]
            self.group_col = meta["group_col"]
            self.sum_cols = list(meta["sum_cols"])
        else:
            if table_dir is None or group_col is None:
                raise ValueError(
                    f"view {view_dir} does not exist yet: table_dir and "
                    "group_col are required to create it"
                )
            self.table_dir = table_dir
            self.group_col = group_col
            self.sum_cols = list(sum_cols or [])
            fs.write_json_atomic(
                self.meta_path,
                {"table_dir": table_dir, "group_col": group_col,
                 "sum_cols": self.sum_cols},
            )

    # --- read side ---------------------------------------------------------

    def current_epoch(self) -> int:
        """Source-table epoch the stored view reflects (-1 = never built)."""
        try:
            return int(fs.read_text(self.current_path).strip())
        except (FileNotFoundError, ValueError):
            return -1

    def read(self) -> pa.Table | None:
        e = self.current_epoch()
        if e < 0:
            return None
        return fs.read_table(fs.join(self.view_dir, f"view-{e}.parquet"))

    # --- refresh -----------------------------------------------------------

    def refresh(self) -> dict:
        from ..stages.ivm import maintain_grouped_agg

        lake = LakeTable(self.table_dir)
        e_to = lake.current_epoch()
        e_from = self.current_epoch()
        if e_to < 0:
            return {"refreshed": False, "reason": "source table has no epochs",
                    "epoch": e_from}
        if e_to <= e_from:
            return {"refreshed": False, "reason": "up to date", "epoch": e_from}

        rebuilt = False
        view = self.read() if e_from >= 0 else None
        try:
            feed = lake.changes(
                None if e_from < 0 else e_from, e_to, include_old=True
            )
            new = maintain_grouped_agg(view, feed, self.group_col, self.sum_cols)
        except FileNotFoundError:
            # the source vacuumed our last-refreshed manifest: the
            # incremental window is unreadable — rebuild from bootstrap
            rebuilt = True
            feed = lake.changes(None, e_to, include_old=True)
            new = maintain_grouped_agg(None, feed, self.group_col, self.sum_cols)

        fs.write_table_atomic(new, fs.join(self.view_dir, f"view-{e_to}.parquet"))
        fs.advance_int_pointer(self.current_path, e_to)
        return {"refreshed": True, "from_epoch": e_from, "to_epoch": e_to,
                "rows": new.num_rows, "rebuilt": rebuilt}

    def vacuum(self, keep: int = 1) -> list[str]:
        """Drop view files older than the newest ``keep`` refreshed epochs."""
        cur = self.current_epoch()
        removed = []
        for f in fs.listdir(self.view_dir):
            if f.startswith("view-") and f.endswith(".parquet"):
                e = int(f[len("view-"):-len(".parquet")])
                if e <= cur - keep:
                    fs.unlink(fs.join(self.view_dir, f))
                    removed.append(f)
        return removed


def list_or(v):
    return list(v) if isinstance(v, (list, tuple)) else v
