"""Dedup family: exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
cosine — seeded corpora with planted duplicates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from etl_rs_ray.stages.dedup import (
    embedding_dedup,
    exact_dedup,
    jaccard,
    minhash_lsh_dedup,
    minhash_signature,
    ngram_jaccard_dedup,
    simhash64,
    simhash_dedup,
    word_ngrams,
    char_shingles,
    _perm_params,
)


def _corpus():
    base = [
        "the quick brown fox jumps over the lazy dog again and again in the field",
        "rust and python are both fine systems languages for data processing work",
        "ray data streams arrow record batches through a distributed object store",
        "completely unrelated text about cooking pasta with tomato sauce and basil",
    ]
    docs = []
    did = 0
    for t in base:
        docs.append({"doc_id": did, "text": t}); did += 1
        # exact duplicate
        docs.append({"doc_id": did, "text": t}); did += 1
        # near duplicate: one word changed
        docs.append({"doc_id": did, "text": t.replace("the", "a", 1) + " extra"}); did += 1
    # fillers with genuinely disjoint vocabulary (high mutual jaccard would
    # make LSH legitimately cluster them)
    fillers = [
        "astronomy telescopes reveal distant galaxies spinning through darkness",
        "baking sourdough requires patient fermentation and steady oven heat",
        "glaciers carve valleys slowly grinding bedrock into fine silt",
        "jazz trumpeters improvise over shifting chord progressions nightly",
        "volcanic islands emerge where tectonic plates pull steadily apart",
        "marathon runners pace themselves across twenty six grueling miles",
        "honeybees communicate flower locations through waggle dances",
        "submarines navigate ocean trenches using sonar echoes alone",
    ]
    for t in fillers:
        docs.append({"doc_id": did, "text": t})
        did += 1
    return docs


def test_exact_dedup():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(4)
    out = exact_dedup(ds, "text", "doc_id").take_all()
    texts = [r["text"] for r in out]
    assert len(texts) == len(set(texts))
    # survivor is the min doc_id of each identical-text group
    kept = {r["text"]: r["doc_id"] for r in out}
    for t, i in kept.items():
        assert i == min(d["doc_id"] for d in docs if d["text"] == t)


def test_minhash_estimates_jaccard():
    a, b = _perm_params(256)
    s1 = char_shingles("the quick brown fox jumps over the lazy dog", 5)
    s2 = char_shingles("the quick brown fox jumped over the lazy dog", 5)
    sig1 = minhash_signature(s1, a, b)
    sig2 = minhash_signature(s2, a, b)
    est = (sig1 == sig2).mean()
    true = len(np.intersect1d(s1, s2)) / len(np.union1d(s1, s2))
    assert abs(est - true) < 0.15


def test_minhash_lsh_dedup_removes_near_dups():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(4)
    out = minhash_lsh_dedup(ds, "text", "doc_id", num_perm=64, bands=16).take_all()
    ids = sorted(r["doc_id"] for r in out)
    # every planted triple (base, exact-dup, near-dup) collapses to its min id
    for trip in range(4):
        base_id = trip * 3
        assert base_id in ids
        assert base_id + 1 not in ids  # exact dup removed
    # fillers survive
    assert all(d["doc_id"] in ids for d in docs[-8:])


def test_simhash_dedup():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(3)
    out = simhash_dedup(ds, "text", "doc_id", max_hamming=3).take_all()
    ids = sorted(r["doc_id"] for r in out)
    for trip in range(4):
        assert trip * 3 in ids
        assert trip * 3 + 1 not in ids  # exact dup: hamming 0
    assert all(d["doc_id"] in ids for d in docs[-8:])


def test_simhash_near_texts_close():
    h1 = simhash64("the quick brown fox jumps over the lazy dog many times")
    h2 = simhash64("the quick brown fox jumps over the lazy dog many time")
    h3 = simhash64("tomato sauce with basil garlic and olive oil for dinner")
    assert bin(h1 ^ h2).count("1") < bin(h1 ^ h3).count("1")


def test_ngram_jaccard_dedup_verifies():
    docs = _corpus()
    ds = ray.data.from_items(docs).repartition(3)
    out = ngram_jaccard_dedup(ds, "text", "doc_id", n=3, threshold=0.95).take_all()
    ids = sorted(r["doc_id"] for r in out)
    # only exact dups (jaccard 1.0) exceed 0.95; near-dups (<=0.91) survive
    for trip in range(4):
        assert trip * 3 in ids
        assert trip * 3 + 1 not in ids
        assert trip * 3 + 2 in ids


def test_jaccard_helper():
    assert jaccard(set("ab"), set("ab")) == 1.0
    assert jaccard(set(), set()) == 1.0
    assert jaccard({1, 2}, {2, 3}) == pytest.approx(1 / 3)
    assert word_ngrams("a b c d", 3) == {"a b c", "b c d"}


def test_embedding_dedup():
    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((40, 16)).astype(np.float32)
    rows = [{"vec_id": i, "embedding": vecs[i].tolist()} for i in range(40)]
    # plant near-dups: 40+i is a tiny perturbation of i for i in 0..4
    for i in range(5):
        rows.append({"vec_id": 40 + i, "embedding": (vecs[i] + 0.01 * rng.standard_normal(16).astype(np.float32)).tolist()})
    ds = ray.data.from_items(rows).repartition(3)
    out = embedding_dedup(ds, "embedding", "vec_id", threshold=0.98).take_all()
    ids = sorted(r["vec_id"] for r in out)
    for i in range(5):
        assert i in ids
        assert 40 + i not in ids
    assert len(ids) >= 35


def test_md5_u64_matches_duckdb():
    """The SQL-checkable dedup variants depend on md5_u64 ==
    DuckDB md5_number_lower (upper 8 digest bytes, little-endian)."""
    import duckdb

    from etl_rs_ray.stages.dedup import md5_u64

    for s in ["hello", "", "a b c", "naïve ünïcode"]:
        want = duckdb.sql("SELECT md5_number_lower(?)", params=[s]).fetchone()[0]
        assert md5_u64(s) == want, s


def test_pairwise_dedup_variants(ray_docs_corpus=None):
    """Pairwise-dominated variants: exact duplicate texts always collapse
    to the min id; survivors are a subset of the input."""
    import ray.data

    from etl_rs_ray.stages.dedup import minhash_dedup_pairwise, simhash_dedup_pairwise

    rows = [
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again and again"},
        {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog again and again"},
        {"doc_id": 3, "text": "a completely different document about ray data pipelines"},
        {"doc_id": 4, "text": "the quick brown fox jumps over the lazy dog again and again today"},
        {"doc_id": 5, "text": "another unrelated text mentioning arrow batches and shuffles"},
    ]
    ds = ray.data.from_items(rows)
    for fn in (minhash_dedup_pairwise, simhash_dedup_pairwise):
        out = {r["doc_id"] for r in fn(ds).take_all()}
        assert 1 in out and 2 not in out, fn.__name__  # exact dup collapses
        assert out <= {1, 2, 3, 4, 5}
        assert {3, 5} <= out  # unrelated docs survive


def test_batch_kernels_match_scalar_reference():
    """Batch-vectorized signature kernels == scalar reference paths."""
    import numpy as np

    from etl_rs_ray.stages.dedup import (
        MINHASH_P31,
        _crc_token_hash,
        _flatten_hash_lists,
        _minhash_segments,
        _perm_params,
        char_shingles,
        md5_u64,
        minhash_perms31,
        minhash_signature,
        simhash64,
        simhash64_md5,
        simhash_batch,
        word_shingle_list,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs today",
        None,
        "",
        "one",
        "the quick brown fox jumps over the lazy dog again and again and again",
    ]
    # simhash: crc and md5 flavors
    got = simhash_batch(texts, "t_crc", _crc_token_hash)
    for t, g in zip(texts, got):
        if t is None:
            assert g is None
        else:
            assert g == (simhash64(t), bool(t.split()))
    got_md5 = simhash_batch(texts, "t_md5", md5_u64)
    for t, g in zip(texts, got_md5):
        if t is not None and t.split():
            assert g[0] == simhash64_md5(t)

    # minhash: uint64 wrap flavor (CC variant)
    a, b = _perm_params(16)
    hlists = [char_shingles(t, 5) for t in texts if t]
    flat, starts, keep = _flatten_hash_lists(hlists)
    sigs = _minhash_segments(flat, starts, a, b, np.uint64((1 << 61) - 1))
    live = [t for t in texts if t]
    for row, t in enumerate([live[i] for i in keep]):
        want = minhash_signature(char_shingles(t, 5), a, b)
        assert (sigs[row] == want).all(), t

    # minhash: int64 31-bit flavor (SQL-compatible variant)
    a2, b2 = minhash_perms31(16)
    hl2 = [
        np.array([md5_u64(s) & 0xFFFFFFFF for s in word_shingle_list(t)], dtype=np.int64)
        for t in texts
        if t
    ]
    flat2, starts2, keep2 = _flatten_hash_lists(hl2)
    sigs2 = _minhash_segments(flat2, starts2, a2, b2, MINHASH_P31)
    for row, i in enumerate(keep2):
        h = hl2[i]
        want = ((a2[:, None] * h[None, :] + b2[:, None]) % MINHASH_P31).min(axis=1)
        assert (sigs2[row] == want).all()


def test_hamming_helpers_vectorized_matches_scalar():
    """The numpy popcount-matrix path (n >= 16) must emit exactly the
    edges/losers of the scalar pair loop."""
    import numpy as np

    from etl_rs_ray.stages.dedup import _hamming_edges, _hamming_losers

    rng = np.random.default_rng(7)
    for n in (2, 15, 16, 64, 200):
        ids = rng.permutation(n * 3)[:n].astype(np.int64).tolist()
        # cluster signatures so some pairs land within distance 3
        base = rng.integers(0, 1 << 63, size=max(1, n // 5), dtype=np.uint64)
        sigs = []
        for i in range(n):
            s = int(base[i % len(base)])
            for _ in range(int(rng.integers(0, 5))):
                s ^= 1 << int(rng.integers(0, 64))
            sigs.append(s)

        rows = sorted(zip(ids, sigs))
        want_edges = [
            (rows[i][0], rows[j][0])
            for i in range(n)
            for j in range(i + 1, n)
            if bin(rows[i][1] ^ rows[j][1]).count("1") <= 3
        ]
        ea, eb = _hamming_edges(ids, sigs, 3)
        assert list(zip(ea, eb)) == want_edges, n

        want_losers = []
        for i in range(1, n):
            if any(bin(rows[i][1] ^ rows[j][1]).count("1") <= 3 for j in range(i)):
                want_losers.append(rows[i][0])
        assert _hamming_losers(ids, sigs, 3) == want_losers, n


def test_decontaminate_cross_corpus_paths_agree():
    """Corpus docs near-duplicating a reference ('benchmark') doc are
    removed; unrelated docs survive; the gathered small-input path and the
    distributed groupby + anti-join path emit the same survivors."""
    import ray.data

    from etl_rs_ray.stages.dedup import decontaminate

    bench = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "machine learning benchmarks must never leak into the training corpus",
    ]
    corpus_rows = [
        # near-dups of benchmark docs (one-word edits) -> removed
        {"doc_id": 1, "text": bench[0].replace("lazy", "sleepy")},
        {"doc_id": 2, "text": bench[1].replace("never", "not ever")},
        # exact copy -> removed
        {"doc_id": 3, "text": bench[0]},
        # unrelated -> survive
        {"doc_id": 4, "text": "completely different content about distributed data processing engines"},
        {"doc_id": 5, "text": "ray datasets stream blocks through the object store with backpressure"},
        # null text -> no bands -> survives
        {"doc_id": 6, "text": None},
    ]
    ref_rows = [{"doc_id": 100 + i, "text": t} for i, t in enumerate(bench)]
    corpus = ray.data.from_items(corpus_rows).repartition(3)
    reference = ray.data.from_items(ref_rows).repartition(2)

    small = sorted(
        r["doc_id"] for r in decontaminate(corpus, reference, small_input=True).take_all()
    )
    dist = sorted(
        r["doc_id"] for r in decontaminate(corpus, reference, small_input=False).take_all()
    )
    assert small == dist
    assert 4 in small and 5 in small and 6 in small
    assert 3 not in small  # exact copy removed
    assert 1 not in small and 2 not in small  # near-dups removed


def test_decontaminate_distinct_ref_columns():
    """Reference corpus with different column names maps through."""
    import ray.data

    from etl_rs_ray.stages.dedup import decontaminate

    corpus = ray.data.from_items(
        [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta"},
         {"doc_id": 2, "text": "totally unrelated words in this particular document here"}]
    )
    reference = ray.data.from_items(
        [{"bench_id": 9, "content": "alpha beta gamma delta epsilon zeta eta theta"}]
    )
    out = sorted(r["doc_id"] for r in decontaminate(
        corpus, reference, "text", "doc_id",
        ref_text_col="content", ref_id_col="bench_id", small_input=True,
    ).take_all())
    assert out == [2]


def test_decontaminate_broadcast_path_agrees():
    """The zero-shuffle broadcast path must remove exactly the same docs
    as the shuffle and gathered paths."""
    import ray.data

    from etl_rs_ray.stages.dedup import decontaminate

    bench = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "machine learning benchmarks must never leak into the training corpus",
    ]
    corpus_rows = [
        {"doc_id": 1, "text": bench[0].replace("lazy", "sleepy")},
        {"doc_id": 2, "text": bench[1]},
        {"doc_id": 3, "text": "completely unrelated content about ray data pipelines"},
        {"doc_id": 4, "text": None},
    ]
    ref_rows = [{"doc_id": 100 + i, "text": t} for i, t in enumerate(bench)]
    corpus = ray.data.from_items(corpus_rows).repartition(2)
    reference = ray.data.from_items(ref_rows)

    bc = sorted(r["doc_id"] for r in decontaminate(
        corpus, reference, broadcast_reference=True).take_all())
    sh = sorted(r["doc_id"] for r in decontaminate(
        corpus, reference, broadcast_reference=False, small_input=False).take_all())
    ga = sorted(r["doc_id"] for r in decontaminate(
        corpus, reference, broadcast_reference=False, small_input=True).take_all())
    assert bc == sh == ga == [3, 4]
