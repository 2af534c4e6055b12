"""Fuzzy edit-distance join: kernel-vs-bruteforce and the gather/shuffle
path equivalence."""

import itertools

import numpy as np
import pyarrow as pa
import pytest

from etl_rs_ray.stages.fuzzy import _del1_signatures, _ed_le1, fuzzy_name_pairs


def levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


ALPHA = "abc"
WORDS = ["".join(w) for n in range(4) for w in itertools.product(ALPHA, repeat=n)]


def test_ed_le1_matches_dp():
    for a in WORDS:
        for b in WORDS:
            assert _ed_le1(a, b) == (levenshtein(a, b) <= 1), (a, b)


def test_signature_blocking_is_complete():
    # every pair at distance exactly 1 shares at least one signature
    for a in WORDS:
        for b in WORDS:
            if a != b and levenshtein(a, b) == 1:
                assert set(_del1_signatures(a)) & set(_del1_signatures(b)), (a, b)


def _expected_pairs(names: list[str]):
    from collections import Counter

    cnt = Counter(names)
    out = {}
    for a, b in itertools.combinations(sorted(cnt), 2):
        if levenshtein(a, b) == 1:
            out[(a, b)] = cnt[a] * cnt[b]
    return out


@pytest.mark.parametrize("gather", [True, False])
def test_fuzzy_name_pairs(gather, ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    vocab = ["red bolt", "hot bolt", "red bolts", "red colt", "blue gear",
             "blue gears", "glue gear", "tiny washer", "tiny washers", "shiny washer"]
    names = [vocab[i] for i in rng.integers(0, len(vocab), 400)]
    ds = ray.data.from_arrow(pa.table({"p_name": pa.array(names)})).repartition(6)
    got = fuzzy_name_pairs(ds, "p_name", gather=gather, nparts=4).to_pandas()
    got_map = {
        (r.name_a, r.name_b): r.n_pairs for r in got.itertuples(index=False)
    }
    assert got_map == _expected_pairs(names)
