"""Term-sharded inverted index over a document corpus — the text
retrieval analogue of the physical IVF index (stages/ann.py:96): build
once, then a search READS ONLY the shards its query terms hash to, so
at 100 TB the rest of the postings never leave storage.

Layout: ``<index_dir>/terms/shard=<s>/postings.parquet`` with
(term, doc_id, tf) rows, plus ``meta.json`` {n_docs, num_shards}.
Scoring is a pure-integer tf-idf variant — ``tf * ((n_docs*1000) //
df)`` — deliberately ln-free so a SQL oracle reproduces every score
bit-for-bit (same reason priority sampling uses integer keys).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from .text_stats import _doc_terms


def _term_shard(terms: pa.Array | pa.ChunkedArray, num_shards: int) -> np.ndarray:
    from ..sources.event_log import stable_hash64

    t = terms.combine_chunks() if isinstance(terms, pa.ChunkedArray) else terms
    return (stable_hash64(t) % np.uint64(num_shards)).astype(np.int64)


def build_text_index(ds, index_dir: str, *, text_col: str = "text",
                     id_col: str = "doc_id", n_docs: int, num_shards: int = 16) -> None:
    """Tokenize (the tfidf tokenizer: lower + non-alphanumeric split),
    reduce each batch to (doc, term, tf) partials — final, docs never
    span batches — hash-shuffle on the term shard, and write one
    postings file per shard. Pass ``n_docs`` from parquet metadata."""
    from .dedup import _hash_shuffle

    def partial(b: pa.Table) -> pa.Table:
        t = _doc_terms(b, text_col, id_col)
        return pa.table(
            {
                "shard": pa.array(_term_shard(t.column("term"), num_shards)),
                "term": t.column("term"),
                "doc_id": t.column(id_col),
                "tf": t.column("tf_cnt").cast(pa.int64()),
            }
        )

    os.makedirs(os.path.join(index_dir, "terms"), exist_ok=True)

    def write_shard(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()), "rows": pa.array([], pa.int64())})
        t = t.combine_chunks()
        out = []
        for s in pc.unique(t.column("shard")).to_pylist():
            part = t.filter(pc.equal(t.column("shard"), s)).drop_columns(["shard"])
            part = part.take(
                pc.sort_indices(part, sort_keys=[("term", "ascending"), ("doc_id", "ascending")])
            )
            d = os.path.join(index_dir, "terms", f"shard={s}")
            os.makedirs(d, exist_ok=True)
            tmp = os.path.join(d, "postings.parquet.tmp")
            pq.write_table(part, tmp, row_group_size=64 * 1024)
            os.replace(tmp, os.path.join(d, "postings.parquet"))
            out.append({"shard": s, "rows": part.num_rows})
        return pa.Table.from_pylist(out, schema=pa.schema([("shard", pa.int64()), ("rows", pa.int64())]))

    shards = (
        _hash_shuffle(ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True))
        .repartition(num_blocks=num_shards, keys=["shard"])
        .map_batches(write_shard, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    shards.count()  # execute
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"n_docs": n_docs, "num_shards": num_shards}, f)


def search_text_index(index_dir: str, query_terms: list[str], k: int = 10):
    """Score docs against the query: read ONLY the shards the query
    terms hash to (the pruning contract), df comes from the postings
    themselves, score = sum(tf * ((n_docs*1000) // df)) over matched
    terms, top-k by (score desc, doc_id). Returns (table, read_paths)."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    n_docs, num_shards = meta["n_docs"], meta["num_shards"]
    terms = sorted(set(t.lower() for t in query_terms))
    shards = sorted(set(_term_shard(pa.array(terms, pa.string()), num_shards).tolist()))
    paths = [
        os.path.join(index_dir, "terms", f"shard={s}", "postings.parquet") for s in shards
    ]
    paths = [p for p in paths if os.path.exists(p)]
    if not paths:
        return (
            pa.table({"doc_id": pa.array([], pa.int64()), "score_milli": pa.array([], pa.int64())}),
            [],
        )
    term_set = pa.array(terms, pa.string())
    # postings are term-sorted in 64k row groups: the parquet filter
    # prunes row groups by term statistics instead of reading each shard
    # in full
    t = pa.concat_tables(
        pq.read_table(p, filters=[("term", "in", terms)]) for p in paths
    )
    t = t.filter(pc.is_in(t.column("term"), value_set=term_set)).combine_chunks()
    if t.num_rows == 0:
        return (
            pa.table({"doc_id": pa.array([], pa.int64()), "score_milli": pa.array([], pa.int64())}),
            paths,
        )
    df = pa.TableGroupBy(t.select(["term", "doc_id"]), "term").aggregate([([], "count_all")])
    dft = df.column("term").combine_chunks()
    w = pa.array(
        [
            (n_docs * 1000) // int(n)
            for n in df.column("count_all").to_pylist()
        ],
        pa.int64(),
    )
    # vectorized weight join: position of each posting's term in the
    # (tiny) df table, then take — no per-row Python over postings
    pos = pc.index_in(t.column("term"), value_set=dft)
    weights = w.take(pos)
    scored = pa.table(
        {
            "doc_id": t.column("doc_id"),
            "part": pc.multiply(t.column("tf"), weights),
        }
    )
    g = pa.TableGroupBy(scored, "doc_id").aggregate([("part", "sum")])
    g = g.rename_columns(["doc_id", "score_milli"])
    idx = pc.sort_indices(
        g, sort_keys=[("score_milli", "descending"), ("doc_id", "ascending")]
    )
    return g.take(idx[:k]), paths
