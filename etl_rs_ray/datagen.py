"""Deterministic synthetic source-repo table + change-event log.

BASELINE.json input_hint: Parquet table of source-code repositories with
columns (repo, path, commit, lang, content); the event log derives from it
as the binlog the north rule replays: insert every file version, then
seeded updates (content mutation, same key) and deletes (tombstones),
plus re-delivered duplicate events (same LSN, identical payload) to
exercise exact dedup — the at-least-once Kafka behavior of the reference
(auto-commit consumer, src/kafka.rs:127-140).

Everything is seeded and vectorized (numpy index math + Arrow take /
binary_join kernels) — generating millions of events takes seconds.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .sources.event_log import EVENT_SCHEMA, EventLogWriter

LANGS = np.array(["py", "rs", "js", "go", "md"])
_VOCAB = np.array(
    (
        "def fn let return if else for while import use mod pub struct class "
        "self impl match async await map filter reduce batch arrow table row "
        "column key value lsn commit merge apply shuffle partition stream"
    ).split()
)
_GOLD = 0x9E3779B97F4A7C15


def _commit_hex_vec(n: int, salt: int) -> list[str]:
    """Deterministic unique 40-hex 'commit' ids without per-row hashing."""
    idx = np.arange(n, dtype=np.uint64)
    a = (idx * np.uint64(_GOLD) + np.uint64(salt)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    b = ((idx + np.uint64(salt)) * np.uint64(0xC2B2AE3D27D4EB4F)) & np.uint64(0xFFFFFFFFFFFFFFFF)
    c = (a ^ (b >> np.uint64(29))) * np.uint64(0xFF51AFD7ED558CCD) & np.uint64(0xFFFFFFFFFFFFFFFF)
    return [f"{int(x):016x}{int(y):016x}{int(z) & 0xFFFFFFFF:08x}" for x, y, z in zip(a, b, c)]


_GEN_CHUNK = 4_000_000  # rows per Arrow chunk: keeps every string chunk
                        # under the 2 GiB array capacity at any n_files


def _chunked_str(values: list[str]) -> pa.ChunkedArray:
    return pa.chunked_array(
        [
            pa.array(values[s : s + _GEN_CHUNK], pa.string())
            for s in range(0, max(len(values), 1), _GEN_CHUNK)
        ]
    )


def generate_repos(n_files: int = 2000, n_orgs: int = 10, versions_per_file: int = 1, seed: int = 42) -> pa.Table:
    """One row per (repo, path, commit) file version. Vectorized; all
    string columns are built in ≤4M-row chunks so no Arrow array ever
    crosses the 2 GiB capacity limit (needed for the 40M+-event bench
    tiers)."""
    rng = np.random.default_rng(seed)
    n = n_files * versions_per_file
    file_idx = np.repeat(np.arange(n_files), versions_per_file)
    lang_idx = rng.integers(0, len(LANGS), n_files)[file_idx]
    langs = LANGS[lang_idx]
    repos = [f"org{i % n_orgs}/project{i % (n_orgs * 7)}" for i in file_idx]
    paths = [f"src/module_{i}.{lang}" for i, lang in zip(file_idx, langs)]
    commits = _commit_hex_vec(n, seed * 7919 + 13)
    # content: header + token soup, joined via the Arrow kernel per chunk
    tok_mat = _VOCAB[rng.integers(0, len(_VOCAB), (n, 12))]
    soup = [" ".join(row) for row in tok_mat.tolist()]
    headers = [f"// {r}/{p}@{c[:8]}\n" for r, p, c in zip(repos, paths, commits)]
    content_chunks = []
    for s in range(0, max(n, 1), _GEN_CHUNK):
        content_chunks.append(
            pc.binary_join_element_wise(
                pa.array(headers[s : s + _GEN_CHUNK]),
                pa.array(soup[s : s + _GEN_CHUNK]),
                "",
            ).cast(pa.string())
        )
    return pa.table(
        {
            "repo": _chunked_str(repos),
            "path": _chunked_str(paths),
            "commit": _chunked_str(commits),
            "lang": _chunked_str(langs.tolist()),
            "content": pa.chunked_array(content_chunks),
        }
    )


def attach_txns(
    events: pa.Table,
    txn_frac: float = 0.3,
    txn_len: tuple[int, int] = (2, 5),
    open_tail: bool = False,
    seed: int = 42,
) -> pa.Table:
    """Group runs of consecutive events into multi-event transactions
    (the binlog BEGIN..COMMIT envelope): member events get a ``txn_id``
    column, and one op='C' commit-marker row (null key/payload, LSN >
    every member event's) is spliced in right after each transaction.
    Non-member events stay ``txn_id`` null ≙ single-event autocommit.
    ``open_tail=True`` drops the LAST transaction's commit marker — the
    producer-crash case atomic replay must hold back. Fully vectorized:
    LSNs are renumbered with one cumulative-shift gather.

    Input must be the pre-duplicate-injection log with dense LSNs
    0..n-1; apply redelivery duplication AFTER (a re-delivered commit
    marker is idempotent by construction)."""
    rng = np.random.default_rng(seed + 3)
    n = events.num_rows
    events = events.sort_by("lsn")
    lo, hi = txn_len
    approx = max(1, int(n * txn_frac / ((lo + hi) / 2)))
    starts = np.sort(rng.choice(n, size=min(approx, n), replace=False))
    lens = rng.integers(lo, hi + 1, size=len(starts))
    # greedy overlap resolution against the last KEPT txn (comparing only
    # the sampled predecessor let a candidate overlap a kept txn through a
    # dropped neighbor — two txns then shared events and commit LSNs
    # collided; found by the hypothesis sweep)
    kept = []
    frontier = -1
    for i in range(len(starts)):
        if starts[i] >= frontier:
            kept.append(i)
            frontier = int(starts[i] + lens[i])
    starts, lens = starts[kept], np.minimum(lens[kept], n - starts[kept])
    ends = starts + lens  # exclusive event positions; strictly increasing
    T = len(starts)
    if T == 0:
        return events.append_column("txn_id", pa.nulls(n, pa.string()))

    # txn membership + ids for member events (vectorized interval lookup)
    pos = np.arange(n)
    cand = np.searchsorted(starts, pos, side="right") - 1
    valid = (cand >= 0) & (pos < ends[np.clip(cand, 0, None)])
    member_txn = np.where(valid, cand, -1)
    txn_names = np.array([f"t{int(s)}" for s in starts])
    txn_id = np.where(member_txn >= 0, txn_names[np.clip(member_txn, 0, None)], None)

    # renumber: event at position p shifts by #commit markers before it
    shift = np.searchsorted(ends, pos, side="right")
    new_lsn = pos + shift
    commit_lsn = ends - 1 + np.searchsorted(ends, ends - 1, side="right") + 1

    out = pa.table(
        {
            "lsn": pa.array(new_lsn, pa.int64()),
            "op": events.column("op"),
            "repo": events.column("repo"),
            "path": events.column("path"),
            "commit": events.column("commit"),
            "lang": events.column("lang"),
            "content": events.column("content"),
            "txn_id": pa.array(txn_id, pa.string()),
        }
    )
    commit_keep = slice(0, T - 1) if open_tail else slice(0, T)
    c_lsn = commit_lsn[commit_keep]
    k = len(c_lsn)
    commits = pa.table(
        {
            "lsn": pa.array(c_lsn, pa.int64()),
            "op": pa.array(np.full(k, "C")).cast(pa.string()),
            "repo": pa.nulls(k, pa.string()),
            "path": pa.nulls(k, pa.string()),
            "commit": pa.nulls(k, pa.string()),
            "lang": pa.nulls(k, pa.string()),
            "content": pa.nulls(k, pa.string()),
            "txn_id": pa.array(txn_names[commit_keep].tolist(), pa.string()),
        }
    )
    return pa.concat_tables([out, commits]).sort_by("lsn")


def generate_events(
    repos: pa.Table,
    update_frac: float = 0.4,
    delete_frac: float = 0.1,
    dup_frac: float = 0.05,
    seed: int = 42,
    txn_frac: float = 0.0,
    open_tail: bool = False,
) -> pa.Table:
    """Derive the LSN-ordered change log: I for every row (shuffled order),
    then U/D against random keys (after their insert in LSN order), then
    duplicate re-deliveries of random events (identical rows, same LSN).
    ``txn_frac > 0`` wraps runs of events in BEGIN..COMMIT transactions
    (see attach_txns) before the duplicates are injected.

    Above ~12M input rows every string column switches to large_string
    for the duration of generation: Arrow's 32-bit-offset take/concat
    overflows past 2 GiB per column otherwise. write_event_log casts
    each ≤200k-row segment slice back to the plain-string EVENT_SCHEMA
    types, so the on-disk log is identical either way."""
    rng = np.random.default_rng(seed + 1)
    n = repos.num_rows
    large = n > 12_000_000
    if large:
        repos = pa.table(
            {
                c: (
                    repos.column(c).cast(pa.large_string())
                    if pa.types.is_string(repos.column(c).type)
                    else repos.column(c)
                )
                for c in repos.column_names
            }
        )
    str_t = pa.large_string() if large else pa.string()
    ev_schema = pa.schema(
        [(f.name, str_t if pa.types.is_string(f.type) else f.type) for f in EVENT_SCHEMA]
    )

    # inserts in shuffled order, lsn 0..n-1
    order = rng.permutation(n)
    ins_lsn = np.empty(n, dtype=np.int64)
    ins_lsn[order] = np.arange(n, dtype=np.int64)
    inserts = repos.add_column(0, "lsn", pa.array(ins_lsn)).add_column(
        1, "op", pa.array(np.full(n, "I")).cast(str_t)
    )

    next_lsn = n
    n_updates = int(n * update_frac)
    upd_rows = rng.integers(0, n, n_updates)  # with replacement: several U per key
    upd = repos.take(pa.array(upd_rows))
    upd_lsns = np.arange(next_lsn, next_lsn + n_updates, dtype=np.int64)
    upd_content = pc.binary_join_element_wise(
        upd.column("content").cast(str_t),
        pa.array([f"\n// updated lsn={lsn}" for lsn in upd_lsns], str_t),
        pa.scalar("", str_t),
    ).cast(str_t)
    updates = pa.table(
        {
            "lsn": pa.array(upd_lsns),
            "op": pa.array(np.full(n_updates, "U")).cast(str_t),
            "repo": upd.column("repo"),
            "path": upd.column("path"),
            "commit": upd.column("commit"),
            "lang": upd.column("lang"),
            "content": upd_content,
        },
        schema=ev_schema,
    )
    next_lsn += n_updates

    n_deletes = int(n * delete_frac)
    del_rows = rng.choice(n, size=n_deletes, replace=False)
    dl = repos.take(pa.array(del_rows))
    deletes = pa.table(
        {
            "lsn": pa.array(np.arange(next_lsn, next_lsn + n_deletes, dtype=np.int64)),
            "op": pa.array(np.full(n_deletes, "D")).cast(str_t),
            "repo": dl.column("repo"),
            "path": dl.column("path"),
            "commit": dl.column("commit"),
            "lang": pa.nulls(n_deletes, str_t),
            "content": pa.nulls(n_deletes, str_t),
        },
        schema=ev_schema,
    )

    inserts = pa.table(
        {name: inserts.column(name) for name in ev_schema.names}, schema=ev_schema
    )
    events = pa.concat_tables([inserts, updates, deletes])
    if txn_frac > 0:
        events = attach_txns(events, txn_frac=txn_frac, open_tail=open_tail, seed=seed)

    # duplicate re-deliveries: identical rows (same LSN) appended
    n_dups = int(events.num_rows * dup_frac)
    dup_idx = rng.integers(0, events.num_rows, n_dups)
    dups = events.take(pa.array(dup_idx))
    return pa.concat_tables([events, dups])


def write_event_log(
    events: pa.Table,
    log_dir: str,
    num_partitions: int = 8,
    events_per_segment: int = 200_000,
) -> None:
    """Write the log as LSN-windowed segment batches so replay can prune.
    large_string columns (big-tier generation) cast back to plain string
    per ≤200k-row slice — the on-disk schema is always EVENT_SCHEMA's."""
    events = events.sort_by("lsn")
    writer = EventLogWriter(log_dir, num_partitions)
    for start in range(0, events.num_rows, events_per_segment):
        sl = events.slice(start, events_per_segment)
        if any(pa.types.is_large_string(t) for t in sl.schema.types):
            # combine_chunks compacts the slice view first: a slice into a
            # >2 GiB contiguous large_string array fails the cast outright
            # (the kernel sizes the source chunk, not the logical slice)
            sl = pa.table(
                {
                    c: (
                        sl.column(c).combine_chunks().cast(pa.string())
                        if pa.types.is_large_string(sl.column(c).type)
                        else sl.column(c)
                    )
                    for c in sl.column_names
                }
            )
        writer.write(sl)


_FIRST = ["amélie", "LOUCA", "H-an", "élie", "anne-marie", "Jean", "Hélène&Adelin", "marc", "Sophie", "émile"]
_LAST = ["Jean-Dupont//Smith", "O'Neil & Sons", "El Niño", "Brøgger", "Carre_/", "MARTIN", "&Lagrave&", "N/A", "petit", "Sébastien / Pascal"]
_CIV = ["Mm", "MR", "Ms", "MMe", "MAD", "MM Mme", "MISS", None, "M.", "Docteur"]
_RS = ['"ED""BANGER"', "Imagin&tiff_", "S’ociété", "Straße", "édouardservices", "HecøTOR", "TIGER_Milk", "Société dupont", None, "Paul&JO"]


def generate_contacts(n: int = 100_000, seed: int = 42) -> pa.Table:
    """Synthetic dirty JDD-shaped contact table (the reference's
    normalization workload shape, schemas/jdd.rs) at arbitrary scale —
    deterministic, built from the reference test vectors' dirt patterns."""
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, 10, (n, 8))
    tel = [f"0{d} {a:02d} {b:02d} {c:02d} {e:02d}" if d % 3 else f"08{a}{b:02d}{c:02d}{e:02d}{d}"
           for d, a, b, c, e in zip(idx[:, 4] % 10, idx[:, 0] * 7 % 100, idx[:, 1] * 13 % 100,
                                    idx[:, 2] * 17 % 100, idx[:, 3] * 19 % 100)]
    email = [f"Luc’as{i}@gmail.com" if i % 4 else f"user {i}@mail..com" for i in range(n)]
    siret = [f"443 169 524 {i % 100000:05d}" if i % 5 else "4ZT 169 524 00120" for i in range(n)]
    siren = [f"{i % 1000000000:09d}" if i % 3 else f"{i}-{i}" for i in range(n)]
    ape = [f"62.0{i % 10}z" if i % 2 else "94z" for i in range(n)]
    return pa.table(
        {
            "RAISON_SOCIALE": pa.array([_RS[i] for i in idx[:, 0]], pa.string()),
            "SIRET": pa.array(siret, pa.string()),
            "SIREN": pa.array(siren, pa.string()),
            "APE": pa.array(ape, pa.string()),
            "CODE_NAF": pa.array([f"01{i}1;Z"[: 6] for i in idx[:, 1]], pa.string()),
            "LIBELE_NAF": pa.array([f"0111{chr(97 + i)}" for i in idx[:, 2]], pa.string()),
            "CIVILITE": pa.array([_CIV[i] for i in idx[:, 3]], pa.string()),
            "NOM": pa.array([_LAST[i] for i in idx[:, 4]], pa.string()),
            "PRENOM": pa.array([_FIRST[i] for i in idx[:, 5]], pa.string()),
            "TELEPHONE": pa.array(tel, pa.string()),
            "email": pa.array(email, pa.string()),
        }
    )


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
