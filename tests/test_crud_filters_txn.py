"""Typed list filters (modql OpVals surface, agent.rs:45-54) and
ref-counted commit groups (dbx.rs:31-138) on CrudStore."""

import pytest

from etl_rs_ray.crud import CrudStore, NoTxn, UnknownFilterOp
from etl_rs_ray.sources.event_log import read_event_log_table


def _row(i, lang="py", content="v1"):
    return {
        "repo": f"org/r{i % 3}",
        "path": f"src/f{i}.py",
        "commit": f"{i:040x}",
        "lang": lang,
        "content": content,
    }


@pytest.fixture
def store(tmp_path):
    s = CrudStore(str(tmp_path / "log"), str(tmp_path / "table"))
    s.create_many([_row(i, lang=("py" if i % 2 == 0 else "rs"), content=f"body {i}") for i in range(10)])
    s.flush()
    return s


# --- typed filter operators --------------------------------------------------


def test_filter_eq_scalar_and_dollar(store):
    assert store.count({"lang": "py"}) == 5
    assert store.count({"lang": {"$eq": "py"}}) == 5


def test_filter_not_in_notin(store):
    assert store.count({"lang": {"$not": "py"}}) == 5
    assert store.count({"repo": {"$in": ["org/r0", "org/r1"]}}) == 7
    assert store.count({"repo": {"$notIn": ["org/r0", "org/r1"]}}) == 3


def test_filter_comparisons(store):
    # lsn is monotone with creation order
    n = store.count({"lsn": {"$gte": 5}})
    assert n == 5
    assert store.count({"lsn": {"$gt": 5}}) == 4
    assert store.count({"lsn": {"$lt": 2}}) == 2
    assert store.count({"lsn": {"$lte": 2}}) == 3
    assert store.count({"lsn": {"$gte": 2, "$lt": 5}}) == 3  # AND within a field


def test_filter_string_search(store):
    assert store.count({"path": {"$contains": "f1"}}) == 1
    assert store.count({"path": {"$startsWith": "src/"}}) == 10
    assert store.count({"path": {"$endsWith": ".py"}}) == 10
    assert store.count({"content": {"$notContains": "body"}}) == 0
    assert store.count({"path": {"$containsAny": ["f1.", "f2."]}}) == 2


def test_filter_null(store):
    key = ("org/r0", "src/f0.py", f"{0:040x}")
    store.update(key, lang=None)
    store.flush()
    assert store.count({"lang": {"$null": True}}) == 1
    assert store.count({"lang": {"$null": False}}) == 9


def test_filter_or_groups(store):
    # list of dicts = OR of AND-groups (modql FilterGroups)
    n = store.count([{"lang": "py", "repo": "org/r0"}, {"lang": "rs", "repo": "org/r1"}])
    one = store.count({"lang": "py", "repo": "org/r0"})
    two = store.count({"lang": "rs", "repo": "org/r1"})
    assert n == one + two > 0


def test_filter_in_list_and_order(store):
    rows = store.list(
        filters={"lang": {"$in": ["py"]}}, order_bys=["!lsn"], limit=3
    )
    assert len(rows) == 3
    assert [r["lsn"] for r in rows] == sorted([r["lsn"] for r in rows], reverse=True)


def test_unknown_op_raises(store):
    with pytest.raises(UnknownFilterOp):
        store.count({"lang": {"$regex": "x"}})


# --- transactions ------------------------------------------------------------


def _log_rows(store):
    return read_event_log_table(store.log_dir).num_rows


def test_txn_commit_emits_once(store):
    before = _log_rows(store)
    with store.txn():
        store.create(_row(100))
        store.create(_row(101))
        # staged, not in the log yet
        assert _log_rows(store) == before
        # but visible through the overlay
        assert store.get(("org/r1", "src/f100.py", f"{100:040x}")) is not None
        assert store.count() == 12
    assert _log_rows(store) == before + 2
    store.flush()
    assert store.count() == 12


def test_txn_rollback_discards(store):
    before = _log_rows(store)
    lsn_before = store._next_lsn
    with pytest.raises(RuntimeError):
        with store.txn():
            store.create(_row(100))
            raise RuntimeError("boom")
    assert _log_rows(store) == before
    assert store._next_lsn == lsn_before
    assert store.count() == 10


def test_txn_nested_commit_folds_into_outermost(store):
    before = _log_rows(store)
    with store.txn():
        store.create(_row(100))
        with store.txn():
            store.create(_row(101))
        # inner commit must NOT write yet
        assert _log_rows(store) == before
    assert _log_rows(store) == before + 2


def test_txn_inner_rollback_decrements_only(store):
    """dbx.rs:77-97: rollback with counter > 1 just decrements — the
    transaction (and prior staged work) stays open."""
    before = _log_rows(store)
    store.begin_txn()
    store.create(_row(100))
    store.begin_txn()
    store.rollback_txn()  # inner: dec only
    store.create(_row(101))
    store.commit_txn()  # outermost: emits both
    assert _log_rows(store) == before + 2


def test_txn_update_of_staged_row(store):
    with store.txn():
        store.create(_row(100))
        key = ("org/r1", "src/f100.py", f"{100:040x}")
        store.update(key, content="v2")  # must see the staged create
        assert store.get(key)["content"] == "v2"
    store.flush()
    assert store.get(("org/r1", "src/f100.py", f"{100:040x}"))["content"] == "v2"


def test_txn_delete_overlay(store):
    key = ("org/r0", "src/f0.py", f"{0:040x}")
    with store.txn():
        store.delete(key)
        assert store.get(key) is None
        assert store.count() == 9
    store.flush()
    assert store.get(key) is None


def test_txn_flush_guard_and_no_txn_errors(store):
    with pytest.raises(NoTxn):
        store.commit_txn()
    with pytest.raises(NoTxn):
        store.rollback_txn()
    store.begin_txn()
    with pytest.raises(NoTxn):
        store.flush()
    store.rollback_txn()


def test_txn_staged_rows_survive_into_replay(store, tmp_path):
    with store.txn():
        store.create_many([_row(i) for i in range(200, 220)])
    store.flush()
    assert store.count() == 30
    # a fresh store over the same dirs sees the committed state
    s2 = CrudStore(str(tmp_path / "log"), str(tmp_path / "table"))
    assert s2.count() == 30
