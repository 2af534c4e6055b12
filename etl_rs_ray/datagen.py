"""Deterministic synthetic source-repo table + change-event log.

BASELINE.json input_hint: Parquet table of source-code repositories with
columns (repo, path, commit, lang, content); the event log derives from it
as the binlog the north rule replays: insert every file version, then
seeded updates (content mutation, same key) and deletes (tombstones),
plus re-delivered duplicate events (same LSN, identical payload) to
exercise exact dedup — the at-least-once Kafka behavior of the reference
(auto-commit consumer, src/kafka.rs:127-140).

Everything is seeded — no wall clock, no external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .sources.event_log import EVENT_SCHEMA, EventLogWriter

LANGS = np.array(["py", "rs", "js", "go", "md"])
_VOCAB = np.array(
    (
        "def fn let return if else for while import use mod pub struct class "
        "self impl match async await map filter reduce batch arrow table row "
        "column key value lsn commit merge apply shuffle partition stream"
    ).split()
)


def _commit_hex(repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{repo}:{path}:{version}".encode()).hexdigest()


def _content(rng: np.random.Generator, repo: str, path: str, commit: str, n_tokens: int = 40) -> str:
    toks = _VOCAB[rng.integers(0, len(_VOCAB), n_tokens)]
    return f"// {repo}/{path}@{commit[:8]}\n" + " ".join(toks.tolist())


def generate_repos(n_files: int = 2000, n_orgs: int = 10, versions_per_file: int = 1, seed: int = 42) -> pa.Table:
    """One row per (repo, path, commit) file version."""
    rng = np.random.default_rng(seed)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in range(n_files):
        repo = f"org{i % n_orgs}/project{i % (n_orgs * 7)}"
        ext_i = int(rng.integers(0, len(LANGS)))
        path = f"src/module_{i}.{LANGS[ext_i]}"
        for v in range(versions_per_file):
            commit = _commit_hex(repo, path, v)
            repos.append(repo)
            paths.append(path)
            commits.append(commit)
            langs.append(str(LANGS[ext_i]))
            contents.append(_content(rng, repo, path, commit))
    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        }
    )


def generate_events(
    repos: pa.Table,
    update_frac: float = 0.4,
    delete_frac: float = 0.1,
    dup_frac: float = 0.05,
    seed: int = 42,
) -> pa.Table:
    """Derive the LSN-ordered change log: I for every row (shuffled order),
    then U/D against random keys (after their insert in LSN order), then
    duplicate re-deliveries of random events (identical rows, same LSN)."""
    rng = np.random.default_rng(seed + 1)
    n = repos.num_rows
    d = repos.to_pydict()

    # inserts in shuffled order, lsn 0..n-1
    order = rng.permutation(n)
    lsns = np.empty(n, dtype=np.int64)
    lsns[order] = np.arange(n, dtype=np.int64)

    ev_lsn = list(lsns)
    ev_op = ["I"] * n
    ev_repo = list(d["repo"])
    ev_path = list(d["path"])
    ev_commit = list(d["commit"])
    ev_lang = list(d["lang"])
    ev_content = list(d["content"])

    next_lsn = n
    n_updates = int(n * update_frac)
    upd_rows = rng.integers(0, n, n_updates)  # with replacement: multiple U per key
    for r in upd_rows:
        r = int(r)
        ev_lsn.append(next_lsn)
        ev_op.append("U")
        ev_repo.append(d["repo"][r])
        ev_path.append(d["path"][r])
        ev_commit.append(d["commit"][r])
        ev_lang.append(d["lang"][r])
        ev_content.append(d["content"][r] + f"\n// updated lsn={next_lsn}")
        next_lsn += 1

    n_deletes = int(n * delete_frac)
    del_rows = rng.choice(n, size=n_deletes, replace=False)
    for r in del_rows:
        r = int(r)
        ev_lsn.append(next_lsn)
        ev_op.append("D")
        ev_repo.append(d["repo"][r])
        ev_path.append(d["path"][r])
        ev_commit.append(d["commit"][r])
        ev_lang.append(None)
        ev_content.append(None)
        next_lsn += 1

    # duplicate re-deliveries: identical (lsn, payload) rows appended
    n_dups = int(len(ev_lsn) * dup_frac)
    dup_idx = rng.integers(0, len(ev_lsn), n_dups)
    for i in dup_idx:
        i = int(i)
        ev_lsn.append(ev_lsn[i])
        ev_op.append(ev_op[i])
        ev_repo.append(ev_repo[i])
        ev_path.append(ev_path[i])
        ev_commit.append(ev_commit[i])
        ev_lang.append(ev_lang[i])
        ev_content.append(ev_content[i])

    return pa.table(
        {
            "lsn": pa.array(ev_lsn, pa.int64()),
            "op": pa.array(ev_op, pa.string()),
            "repo": pa.array(ev_repo, pa.string()),
            "path": pa.array(ev_path, pa.string()),
            "commit": pa.array(ev_commit, pa.string()),
            "lang": pa.array(ev_lang, pa.string()),
            "content": pa.array(ev_content, pa.string()),
        },
        schema=EVENT_SCHEMA,
    )


def write_event_log(
    events: pa.Table,
    log_dir: str,
    num_partitions: int = 8,
    events_per_segment: int = 200_000,
) -> None:
    """Write the log as LSN-windowed segment batches so replay can prune."""
    events = events.sort_by("lsn")
    writer = EventLogWriter(log_dir, num_partitions)
    for start in range(0, events.num_rows, events_per_segment):
        writer.write(events.slice(start, events_per_segment))


def oracle_replay(events: pa.Table, lsn_to: int | None = None) -> dict[tuple, tuple]:
    """Pure-Python sequential oracle: key -> last non-deleted payload by LSN
    (FIXTURES.md §2). Duplicate LSNs apply idempotently (identical payload)."""
    rows = sorted(
        zip(*[events.column(c).to_pylist() for c in ("lsn", "op", "repo", "path", "commit", "lang", "content")]),
        key=lambda r: r[0],
    )
    state: dict[tuple, tuple] = {}
    for lsn, op, repo, path, commit, lang, content in rows:
        if lsn_to is not None and lsn > lsn_to:
            continue
        key = (repo, path, commit)
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = (lsn, lang, content)
    return state
