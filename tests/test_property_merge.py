"""Property-based tests (hypothesis) for the LWW merge kernels: any event
log, any delivery order, any batch split — the fold equals the sequential
oracle. Pure Arrow kernels, no Ray."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_rs_ray.stages.merge_apply import lww_reduce, merge_bucket_tables

KEYS = ["k0", "k1", "k2"]
OPS = ["I", "U", "D"]


@st.composite
def event_logs(draw):
    n = draw(st.integers(1, 40))
    lsns = draw(st.permutations(list(range(n))))
    rows = []
    for i in range(n):
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(OPS))
        rows.append(
            {
                "lsn": lsns[i],
                "op": op,
                "repo": "r",
                "path": "p",
                "commit": key,
                "lang": None if op == "D" else "py",
                "content": None if op == "D" else f"c{lsns[i]}",
            }
        )
    # duplicate re-deliveries
    n_dups = draw(st.integers(0, 5))
    for _ in range(n_dups):
        rows.append(dict(rows[draw(st.integers(0, n - 1))]))
    return rows


def _oracle(rows):
    state = {}
    for r in sorted(rows, key=lambda r: r["lsn"]):
        key = (r["repo"], r["path"], r["commit"])
        if r["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = (r["lsn"], r["content"])
    return state


def _to_state(table: pa.Table):
    return {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"])
        for r in table.to_pylist()
    }


@settings(max_examples=150, deadline=None)
@given(event_logs())
def test_lww_reduce_matches_oracle(rows):
    table = pa.Table.from_pylist(rows)
    out = lww_reduce(table, drop_tombstones=True)
    assert _to_state(out) == _oracle(rows)


@settings(max_examples=150, deadline=None)
@given(event_logs(), st.integers(1, 10))
def test_split_merge_matches_oracle(rows, split):
    """Arbitrary batch split + incremental merge_bucket_tables fold ==
    one-shot oracle. Events are split by LSN windows (the engine's epoch
    boundaries guarantee LSN-monotone application)."""
    rows = sorted(rows, key=lambda r: r["lsn"])
    state = None
    hwm = -1  # the engine reads only lsn > hwm per epoch; a re-delivered
    # older event must never resurrect a tombstoned key
    for start in range(0, len(rows), split):
        chunk = [r for r in rows[start : start + split] if r["lsn"] > hwm]
        if not chunk:
            continue
        hwm = max(r["lsn"] for r in chunk)
        incoming = lww_reduce(pa.Table.from_pylist(chunk))
        state = merge_bucket_tables(state, incoming)
    assert _to_state(state if state is not None else pa.table({})) == _oracle(rows)
