"""HDD contact-deduplication — the reference's cluster-merge dedup
(examples/transform_hdd_deduplication.rs) re-expressed Ray-Data-first.

Reference shape: sort+window-count filter (D1, :265-280), per-Nom
hash partition materializing one LazyFrame per key (D2, :282-311), rayon
thread pool (D9, :313-328), per-partition cross-join pair detection
(D3, :24-66), per-pair list union (D4, :67-127), group merge (D5,
:129-162), subset elimination via second cross join (D6, :164-200),
"/"-joined merged rows (D7, :202-218), ids_to_remove (D8, :220-228),
reconciliation anti join + concat (D11, :233-263).

Ray shape: ONE ``groupby(Nom).map_groups`` — the groupby does the hash
partition + parallelism (D2+D9 for free); pair detection and
reconciliation happen inside the group (removals only ever hit same-Nom
rows because pairs require Nom equality, so no global ids_to_remove
round-trip is needed); singleton and null-Nom groups pass through
unchanged, subsuming D1 (a window count over the partition == group
size).

Order note: Polars' ``list.unique()`` is hash-ordered and unstable —
the reference's own committed golden and its regenerated ``_test`` output
disagree on element order (``3/8/2`` vs ``2/3/8``). We use deterministic
first-appearance order; golden comparison is order-insensitive on the
multi-valued fields.
"""

from __future__ import annotations

import pyarrow as pa

# canonical HDD column names (schemas/hdd.rs:20-37)
ID = "ID"
NOM = "Nom"
PRENOM = "Prenom"
PCE = "PCE"
EMAIL = "Email"
TELEPHONE = "Telephone"
SIRET = "SIRET"
SIRET_SUCC = "SIRET successeur"
RAISON_SOCIALE = "Raison_sociale"
ID_SOURCE = "Id_source"
IDS = "IDS"

# list-merge columns: per-pair unique, then flatten (+unique except PCE,
# transform_hdd_deduplication.rs:129-162 — PCE flattened but NOT uniqued)
_UNIQUE_ATTRS = (EMAIL, TELEPHONE, SIRET, SIRET_SUCC, RAISON_SOCIALE, ID_SOURCE)

OUTPUT_COLUMNS = [ID, NOM, PRENOM, PCE, EMAIL, TELEPHONE, SIRET, SIRET_SUCC, RAISON_SOCIALE, ID_SOURCE, IDS]


def _pair_unique(left, right) -> list:
    """concat_list([l, r]).unique() (:71-77) with first-appearance order;
    a null is a distinct element (kept once)."""
    return [left] if left == right else [left, right]


def detect_pairs(rows: list[dict]) -> list[tuple[dict, dict]]:
    """Candidate duplicate pairs within one Nom partition (D3, :24-66):
    left SIRET null ∧ Id < Id_right (string compare — Id is stringly)
    ∧ Nom equal ∧ Prenom equal-or-either-null
    ∧ (PCE eq ∨ Email eq ∨ Telephone eq) — null never equals null."""
    pairs = []
    for a in rows:
        if a[SIRET] is not None:
            continue
        for b in rows:
            if a[ID] is None or b[ID] is None or not a[ID] < b[ID]:
                continue
            if a[NOM] is None or b[NOM] is None or a[NOM] != b[NOM]:
                continue
            if not (a[PRENOM] == b[PRENOM] or a[PRENOM] is None or b[PRENOM] is None):
                continue
            if not (
                (a[PCE] is not None and a[PCE] == b[PCE])
                or (a[EMAIL] is not None and a[EMAIL] == b[EMAIL])
                or (a[TELEPHONE] is not None and a[TELEPHONE] == b[TELEPHONE])
            ):
                continue
            pairs.append((a, b))
    return pairs


def merge_pairs(pairs: list[tuple[dict, dict]]) -> dict[str, dict]:
    """Group pairs by the left row (D5, :129-162): flatten the per-pair
    unique lists; unique again for all attrs EXCEPT PCE."""
    clusters: dict[str, dict] = {}
    for a, b in pairs:
        c = clusters.get(a[ID])
        if c is None:
            c = {
                ID: a[ID],
                NOM: a[NOM],
                PRENOM: a[PRENOM],
                "Ids": [],
                PCE: [],
                **{attr: [] for attr in _UNIQUE_ATTRS},
            }
            clusters[a[ID]] = c
        for v in _pair_unique(a[ID], b[ID]):
            if v not in c["Ids"]:
                c["Ids"].append(v)
        c[PCE].extend(_pair_unique(a[PCE], b[PCE]))  # flatten, NOT uniqued
        for attr in _UNIQUE_ATTRS:
            for v in _pair_unique(a[attr], b[attr]):
                if v not in c[attr]:
                    c[attr].append(v)
    return clusters


def eliminate_subsets(clusters: dict[str, dict]) -> dict[str, dict]:
    """Drop any cluster whose Ids set is a subset of another cluster's
    (D6, :164-200)."""
    out = {}
    for cid, c in clusters.items():
        ids = set(c["Ids"])
        subsumed = any(
            ocid != cid and ids <= set(oc["Ids"]) for ocid, oc in clusters.items()
        )
        if not subsumed:
            out[cid] = c
    return out


def _join_list(values: list) -> str | None:
    """polars list.join("/", ignore_nulls=false): null if any element null
    (:202-218)."""
    if any(v is None for v in values):
        return None
    return "/".join(values)


def merged_row(c: dict) -> dict:
    """One output row per surviving cluster (D7, :202-218)."""
    return {
        ID: c[ID],
        NOM: c[NOM],
        PRENOM: c[PRENOM],
        PCE: _join_list(c[PCE]),
        EMAIL: _join_list(c[EMAIL]),
        TELEPHONE: _join_list(c[TELEPHONE]),
        SIRET: _join_list(c[SIRET]),
        SIRET_SUCC: _join_list(c[SIRET_SUCC]),
        RAISON_SOCIALE: _join_list(c[RAISON_SOCIALE]),
        ID_SOURCE: _join_list(c[ID_SOURCE]),
        IDS: _join_list(c["Ids"]),
    }


def ids_to_remove(clusters: dict[str, dict]) -> set[str]:
    """Flatten+unique surviving clusters' Ids (D8, :220-228)."""
    out: set[str] = set()
    for c in clusters.values():
        out.update(c["Ids"])
    return out


# Above this size the cross-join pair scan (faithful to the reference's
# per-partition cross join, transform_hdd_deduplication.rs:24-66) switches
# to attribute-bucketed detection: candidate pairs can only exist between
# rows sharing a PCE / Email / Telephone VALUE, so indexing those values
# restores ~O(n + pairs) detection for skewed Nom groups instead of O(n²).
PAIRWISE_THRESHOLD = 512


def detect_pairs_indexed(rows: list[dict]) -> list[tuple[dict, dict]]:
    """Skew-safe pair detection: bucket row indices by each join-attribute
    value, enumerate within-bucket pairs only, then apply the FULL pair
    predicate. Emits pairs in the same (left-position, right-position)
    order as :func:`detect_pairs`, so downstream cluster merging is
    byte-identical."""
    from collections import defaultdict

    cand: set[tuple[int, int]] = set()
    for attr in (PCE, EMAIL, TELEPHONE):
        buckets: dict = defaultdict(list)
        for i, r in enumerate(rows):
            v = r[attr]
            if v is not None:
                buckets[v].append(i)
        for idxs in buckets.values():
            for x in range(len(idxs) - 1):
                for y in range(x + 1, len(idxs)):
                    cand.add((idxs[x], idxs[y]))
    pairs = []
    for i, j in cand:
        a, b = rows[i], rows[j]
        if a[ID] is None or b[ID] is None:
            continue
        if not a[ID] < b[ID]:
            a, b, i, j = b, a, j, i
            if not a[ID] < b[ID]:
                continue
        if a[SIRET] is not None:
            continue
        if a[NOM] is None or b[NOM] is None or a[NOM] != b[NOM]:
            continue
        if not (a[PRENOM] == b[PRENOM] or a[PRENOM] is None or b[PRENOM] is None):
            continue
        if not (
            (a[PCE] is not None and a[PCE] == b[PCE])
            or (a[EMAIL] is not None and a[EMAIL] == b[EMAIL])
            or (a[TELEPHONE] is not None and a[TELEPHONE] == b[TELEPHONE])
        ):
            continue
        pairs.append((i, j, a, b))
    pairs.sort(key=lambda p: (p[0], p[1]))  # detect_pairs emission order
    return [(a, b) for _i, _j, a, b in pairs]


def dedup_group(group: pa.Table) -> pa.Table:
    """map_groups body: pass through singleton / null-Nom groups;
    otherwise replace clustered rows with merged rows (D3-D8 +
    reconciliation D11). Large groups use indexed pair detection."""
    rows = [dict(r) for r in group.select([c for c in OUTPUT_COLUMNS if c != IDS]).to_pylist()]
    out_rows: list[dict]
    nom = rows[0][NOM] if rows else None
    if nom is None or len(rows) <= 1:
        out_rows = [dict(r, **{IDS: None}) for r in rows]
    else:
        detect = detect_pairs if len(rows) <= PAIRWISE_THRESHOLD else detect_pairs_indexed
        pairs = detect(rows)
        clusters = eliminate_subsets(merge_pairs(pairs))
        removed = ids_to_remove(clusters)
        out_rows = [dict(r, **{IDS: None}) for r in rows if r[ID] not in removed]
        out_rows.extend(merged_row(c) for c in clusters.values())
    arrays = {c: pa.array([r[c] for r in out_rows], pa.string()) for c in OUTPUT_COLUMNS}
    return pa.table(arrays)


def hdd_dedup_dataset(ds, num_partitions: int | None = None):
    """Full distributed dedup: groupby(Nom) hash shuffle + per-group merge.

    Hash shuffle (not the default range sort) both to co-locate whole key
    groups — range-sort map_groups applies the UDF per block and can split
    a group — and because a range sort on a nullable key fails outright.
    The strategy is pinned on the dataset's own captured context so it
    survives lazy execution after this function returns.
    """
    import ray
    from ray.data.context import ShuffleStrategy

    if num_partitions is None:
        # the default (200) spawns one aggregator actor per partition and
        # stalls small clusters; stay at or below the CPU budget
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, min(64, cpus))
    ds.context.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    return ds.groupby(NOM, num_partitions=num_partitions).map_groups(
        dedup_group, batch_format="pyarrow"
    )
