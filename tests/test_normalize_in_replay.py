"""The normalize hook of the CDC replay: the reference Transform chain and
the curate stage run inside the pipeline, before the merge — and the final
table reflects the transformed payloads under LWW."""

import pyarrow.compute as pc

from etl_rs_ray.datagen import generate_events, generate_repos, oracle_replay, write_event_log
from etl_rs_ray.pipelines.cdc import curate_batch, replay
from etl_rs_ray.sources.lake import LakeTable


def _setup(tmp_path, n=150, seed=13):
    repos = generate_repos(n_files=n, seed=seed)
    events = generate_events(repos, update_frac=0.4, delete_frac=0.1, dup_frac=0.05, seed=seed)
    log_dir = str(tmp_path / "log")
    write_event_log(events, log_dir, num_partitions=2)
    return events, log_dir


def test_transform_chain_normalize_applies_before_merge(tmp_path):
    from etl_rs_ray.functions.text import transform_raison_sociale

    events, log_dir = _setup(tmp_path)
    table_dir = str(tmp_path / "table")
    # T7 on the lang column: uppercases ("py" -> "PY"), null passes (op=D)
    res = replay(log_dir, table_dir, num_buckets=4, normalize={"lang": "raison_sociale"})
    assert res.committed
    snap = LakeTable(table_dir).snapshot_table()
    oracle = oracle_replay(events)
    assert snap.num_rows == len(oracle)
    got = {
        (r["repo"], r["path"], r["commit"]): r["lang"] for r in snap.to_pylist()
    }
    for k, (lsn, lang, content) in oracle.items():
        assert got[k] == transform_raison_sociale(lang)
    assert set(got.values()) <= {"PY", "RS", "JS", "GO", "MD"}


def test_curated_multi_epoch_replay_matches_oracle(tmp_path):
    events, log_dir = _setup(tmp_path, seed=17)
    max_lsn = pc.max(events.column("lsn")).as_py()
    table_dir = str(tmp_path / "table")
    r1 = replay(log_dir, table_dir, target_lsn=max_lsn // 2, num_buckets=4, normalize=curate_batch)
    r2 = replay(log_dir, table_dir, num_buckets=4, normalize=curate_batch)
    assert r1.committed and r2.committed
    snap = LakeTable(table_dir).snapshot_table()
    oracle = oracle_replay(events)
    assert snap.num_rows == len(oracle)
    # curation columns exist and are populated for live rows
    assert {"lang_pred", "quality_score" if "quality_score" in snap.column_names else "n_tokens",
            "fingerprint"} <= set(snap.column_names)
    got = {
        (r["repo"], r["path"], r["commit"]): (r["lsn"], r["content"], r["n_tokens"], r["fingerprint"])
        for r in snap.to_pylist()
    }
    for k, (lsn, lang, content) in oracle.items():
        g = got[k]
        assert g[0] == lsn and g[1] == content
        assert g[2] is not None and g[3] is not None
