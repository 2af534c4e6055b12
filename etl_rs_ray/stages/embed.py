"""Text -> embedding as a batched-inference actor stage.

The container has no model runtime, so the "model" is the feature-hashing
trick (public: Weinberger et al., "Feature Hashing for Large Scale
Multitask Learning"): token/bigram counts hashed into a fixed-dim vector
with a sign hash, L2-normalized. Deterministic, CPU-only, and linear in
text size — a real encoder (sentence-transformers etc.) drops into the
same actor slot: weights load once in ``__init__``, ``__call__`` embeds
a batch.

Output plugs straight into the ANN/embedding-dedup family
(list<float32> column), closing the loop text -> embed -> index ->
search / near-dup entirely inside the engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources.event_log import stable_hash64


class HashingEmbedder:
    """Actor-pool stage: ``map_batches(HashingEmbedder, concurrency=N,
    fn_constructor_kwargs={...})``. State (dim, seeds) fixed in __init__."""

    def __init__(self, text_col: str = "text", out_col: str = "embedding",
                 dim: int = 64, bigrams: bool = True):
        self.text_col = text_col
        self.out_col = out_col
        self.dim = dim
        self.bigrams = bigrams

    def _embed_one(self, tokens: list[str]) -> "np.ndarray":
        v = np.zeros(self.dim, dtype=np.float32)
        if not tokens:
            return v
        feats = tokens
        if self.bigrams and len(tokens) > 1:
            feats = feats + [f"{a} {b}" for a, b in zip(tokens, tokens[1:])]
        h = stable_hash64(pa.array(feats))
        idx = (h % np.uint64(self.dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) != 0, -1.0, 1.0).astype(np.float32)
        np.add.at(v, idx, sign)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        out = [self._embed_one((t or "").lower().split()) for t in texts]
        return batch.append_column(
            self.out_col, pa.array([e.tolist() for e in out], pa.list_(pa.float32()))
        )


def embed_texts(ds, text_col: str = "text", out_col: str = "embedding",
                dim: int = 64, concurrency: int = 2, batch_size: int = 256):
    """Embed a text column with the actor pool (model state per actor)."""
    return ds.map_batches(
        HashingEmbedder,
        fn_constructor_kwargs={"text_col": text_col, "out_col": out_col, "dim": dim},
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
        num_cpus=0.5,
    )
