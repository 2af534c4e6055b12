"""Text analysis for training-data curation: token counting, quality
scoring, language-ID, document fingerprinting.

All column kernels are vectorized pyarrow.compute (RE2) where possible;
the per-doc ones (fingerprint) run bounded Python over the batch. Shapes:
one ``map_batches`` each, no shuffle.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import re

_WS_RE = re.compile(r"\S+")

# --- token counting ----------------------------------------------------------


def token_count(arr) -> pa.Array:
    """Whitespace tokens: count of \\S+ runs (0 for empty/null->null)."""
    return pc.count_substring_regex(arr, pattern=r"\S+")


def bpe_ish_token_count(arr) -> pa.Array:
    """BPE-ish estimate: letter runs, digit runs, and single punctuation
    each count as one token (a GPT-2-style pre-tokenizer regex)."""
    return pc.count_substring_regex(arr, pattern=r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


# --- quality scoring ---------------------------------------------------------

_STOPWORDS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|as|on|are|it|be|this|by|an|or|at)\b",
    "fr": r"\b(le|la|les|de|des|du|et|un|une|est|que|pour|dans|en|au|aux|sur|avec|ce)\b",
    "de": r"\b(der|die|das|und|ist|von|zu|den|mit|auf|für|im|ein|eine|nicht|als|auch|es)\b",
    "es": r"\b(el|la|los|las|de|del|y|un|una|es|que|por|para|en|con|se|su|al|lo)\b",
}


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc curation signals: lengths, token counts, punctuation /
    uppercase / stopword / unique-token ratios."""
    txt = batch.column(text_col)
    n_chars = pc.utf8_length(txt)
    n_tokens = token_count(txt)
    n_punct = pc.count_substring_regex(txt, pattern=r"[^\w\s]")
    n_upper = pc.count_substring_regex(txt, pattern=r"[A-Z]")
    n_stop = pc.count_substring_regex(pc.utf8_lower(txt), pattern=_STOPWORDS["en"])
    denom_c = pc.max_element_wise(n_chars, 1)
    denom_t = pc.max_element_wise(n_tokens, 1)
    batch = batch.append_column("n_tokens", pc.cast(n_tokens, pa.int64()))
    batch = batch.append_column("n_chars_computed", pc.cast(n_chars, pa.int64()))
    batch = batch.append_column(
        "punct_ratio", pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(denom_c, pa.float64()))
    )
    batch = batch.append_column(
        "upper_ratio", pc.divide(pc.cast(n_upper, pa.float64()), pc.cast(denom_c, pa.float64()))
    )
    batch = batch.append_column(
        "stopword_ratio", pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(denom_t, pa.float64()))
    )
    mean_tok_len = pc.divide(
        pc.cast(pc.subtract(n_chars, pc.max_element_wise(pc.subtract(n_tokens, 1), 0)), pa.float64()),
        pc.cast(denom_t, pa.float64()),
    )
    batch = batch.append_column("mean_token_len", mean_tok_len)
    return batch


def quality_score(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Scalar [0,1] quality score from the stats (heuristic filter knob)."""
    b = quality_stats(batch, text_col)
    import numpy as np

    punct = b.column("punct_ratio").to_numpy(zero_copy_only=False)
    stop = b.column("stopword_ratio").to_numpy(zero_copy_only=False)
    ntok = b.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.float64)
    length_score = np.clip(ntok / 100.0, 0, 1)
    punct_score = np.clip(1.0 - 4.0 * np.abs(punct - 0.03), 0, 1)
    stop_score = np.clip(stop / 0.4, 0, 1)
    score = 0.4 * length_score + 0.3 * punct_score + 0.3 * stop_score
    return b.append_column("quality_score", pa.array(score, pa.float64()))


# --- language ID -------------------------------------------------------------


def lang_id(batch: pa.Table, text_col: str = "text", out_col: str = "lang_pred") -> pa.Table:
    """n-gram-free heuristic language ID: stopword-hit rate per language
    (vectorized: one RE2 count per language over the whole column)."""
    low = pc.utf8_lower(batch.column(text_col))
    n_tokens = pc.max_element_wise(token_count(low), 1)
    scores = []
    langs = sorted(_STOPWORDS)
    for lang in langs:
        c = pc.count_substring_regex(low, pattern=_STOPWORDS[lang])
        scores.append(
            pc.divide(pc.cast(c, pa.float64()), pc.cast(n_tokens, pa.float64())).to_numpy(
                zero_copy_only=False
            )
        )
    m = np.vstack(scores)  # (langs, n)
    best = m.argmax(axis=0)
    confident = m.max(axis=0) > 0.02
    out = np.where(confident, np.array(langs, dtype=object)[best], "unknown")
    return batch.append_column(out_col, pa.array(out.tolist(), pa.string()))


# --- document fingerprinting -------------------------------------------------


from functools import lru_cache


@lru_cache(maxsize=None)
def _pows(k: int) -> np.ndarray:
    B, m = 1099511628211, 1 << 64
    vals = [1]
    for _ in range(k - 1):
        vals.append((vals[-1] * B) % m)
    return np.array(vals[::-1], dtype=np.uint64)


def _kgram_hashes(text: str, k: int) -> np.ndarray:
    """Vectorized k-gram rolling hash: polynomial hash over the byte
    array via precomputed powers (no per-gram Python call)."""
    data = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(data) - k + 1 <= 0:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64) if text else np.array([], dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    return (windows * _pows(k)).sum(axis=1, dtype=np.uint64)


def winnow_fingerprint(text: str, k: int = 8, window: int = 6) -> list[int]:
    """Winnowing (Schleimer et al., SIGMOD'03): per sliding window keep the
    min k-gram hash position — a compact, position-robust fingerprint.
    Fully vectorized (sliding_window_view + argmin along axis). Values are
    int64 (wrapped) so they store directly in Arrow list<int64> columns."""
    hashes = _kgram_hashes(text, k)
    if len(hashes) == 0:
        return []
    if len(hashes) <= window:
        return [int(hashes.view(np.int64).min())]
    wins = np.lib.stride_tricks.sliding_window_view(hashes, window)
    pos = wins.argmin(axis=1) + np.arange(len(wins))
    sel = np.unique(pos)
    return hashes[sel].view(np.int64).tolist()


def winnow_fingerprints_batch(
    texts: list[str | None], k: int = 8, window: int = 6
) -> list[list[int] | None]:
    """Batch winnowing: ONE set of numpy ops for the whole batch.

    All documents' bytes are concatenated (separated by k sentinel bytes so
    no k-gram spans two documents), hashed once, and the winnow mask —
    "position is the minimum of its trailing window" (the robust-winnowing
    selection variant) — is computed globally, then split back per document
    via offset search. ~20x the per-doc path.
    """
    enc = [t.encode("utf-8", "surrogatepass") if t is not None else None for t in texts]
    sep = b"\x00" * k
    live = [e for e in enc if e is not None]
    if not live:
        return [None] * len(texts)
    blob = sep.join(live) + sep
    data = np.frombuffer(blob, dtype=np.uint8)
    if len(data) < k:
        return [[] if e is not None else None for e in enc]
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    hashes = (windows * _pows(k)).sum(axis=1, dtype=np.uint64)
    n = len(hashes)
    # a document's winnow selection must depend on ITS bytes alone: mask
    # every k-gram position outside a document's own range (the sentinel-
    # spanning positions) to MAX so a trailing window reaching across the
    # boundary can never import the previous document's minima — without
    # this, a doc's fingerprint varied with batch composition (found as
    # an incremental-vs-one-shot replay divergence in the curate chain)
    in_doc = np.zeros(n, dtype=bool)
    dpos = 0
    for e in live:
        if len(e) >= k:
            in_doc[dpos : dpos + len(e) - k + 1] = True
        dpos += len(e) + k
    hashes = np.where(in_doc, hashes, np.uint64(0xFFFFFFFFFFFFFFFF))
    w = min(window, n)
    hw = np.lib.stride_tricks.sliding_window_view(hashes, w)
    trailing_min = hw.min(axis=1)  # min of hashes[p-w+1 .. p] at index p-w+1
    is_min = np.zeros(n, dtype=bool)
    is_min[w - 1 :] = hashes[w - 1 :] == trailing_min
    is_min[: w - 1] = hashes[: w - 1] == np.minimum.accumulate(hashes[: w - 1]) if w > 1 else True
    sel = np.flatnonzero(is_min)
    sel_hashes = hashes[sel].view(np.int64)

    # split selections back into documents (k-gram starting inside doc i
    # occupies positions [start_i, start_i + len_i - k])
    out: list[list[int] | None] = []
    pos = 0
    for e in enc:
        if e is None:
            out.append(None)
            continue
        if len(e) < k:
            out.append([zlib.crc32(e)] if e else [])
            pos += len(e) + k
            continue
        lo = np.searchsorted(sel, pos)
        hi = np.searchsorted(sel, pos + len(e) - k, side="right")
        out.append(sel_hashes[lo:hi].tolist())
        pos += len(e) + k
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text", out_col: str = "fingerprint") -> pa.Table:
    fps = winnow_fingerprints_batch(batch.column(text_col).to_pylist())
    return batch.append_column(out_col, pa.array(fps, pa.list_(pa.int64())))


def explode_ngrams(text_col: str = "text", n: int = 1, out_col: str = "token"):
    """map_batches fn: one row per word n-gram occurrence (duplicates
    kept — downstream counts are frequencies). Tokens come from ONE
    regexp pass over the batch; n-grams are built by zipping the token
    list against its shifts, no per-token Python beyond the join."""

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch.column(text_col).to_pylist():
            if t is None:
                continue
            toks = _WS_RE.findall(t.lower())
            if n == 1:
                out.extend(toks)
            elif len(toks) >= n:
                out.extend(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
        return pa.table({out_col: pa.array(out, pa.string())})

    return fn


def top_ngrams(ds, text_col: str = "text", n: int = 1, k: int = 20, m: int | None = None):
    """Vocabulary mining: the EXACT k most frequent word n-grams in the
    corpus, via the two-pass Misra-Gries heavy-hitter stage (no token
    shuffle; token frequencies are Zipfian, exactly the distribution the
    MG guarantee wants). The exploded token stream stays lazy — both
    passes re-stream it rather than materializing the token multiset.
    Output: (key, n) sorted by count desc, token asc."""
    from .heavy import heavy_hitters

    toks = ds.map_batches(
        explode_ngrams(text_col, n), batch_format="pyarrow", zero_copy_batch=True
    )
    return heavy_hitters(toks, "token", k=k, m=m)


# --- PII redaction -----------------------------------------------------------

PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\d{2,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{3,4}"


def redact_pii(batch: pa.Table, text_col: str = "text",
               out_col: str = "text_redacted") -> pa.Table:
    """Scrub emails then phone-shaped numbers from a text column — all
    RE2, zero Python per row. Emits the redacted text plus per-row match
    counts (n_emails, n_phones). Phones are counted/redacted AFTER email
    redaction so an address's digits can't double-count; the SQL mirror
    applies the same order."""
    arr = batch.column(text_col)
    n_emails = pc.count_substring_regex(arr, pattern=PII_EMAIL_RE)
    red = pc.replace_substring_regex(arr, pattern=PII_EMAIL_RE, replacement="<EMAIL>")
    n_phones = pc.count_substring_regex(red, pattern=PII_PHONE_RE)
    red = pc.replace_substring_regex(red, pattern=PII_PHONE_RE, replacement="<PHONE>")
    batch = batch.append_column("n_emails", pc.cast(n_emails, pa.int64()))
    batch = batch.append_column("n_phones", pc.cast(n_phones, pa.int64()))
    return batch.append_column(out_col, red)


# --- repetition signals (Gopher-style quality heuristics) --------------------


def repetition_stats(batch: pa.Table, text_col: str = "text",
                     id_col: str = "doc_id") -> pa.Table:
    """Per-document token-repetition signals used by corpus quality
    filters: total tokens, distinct-token ratio, and the fraction of the
    document covered by its single most frequent token (near 1.0 =
    degenerate repetition). One row per doc WITH at least one token —
    matching the SQL mirror's group-by domain. Ratios are exact-operand
    double divisions, so both sides produce identical bits."""
    from collections import Counter

    ids, n_out, d_out, m_out = [], [], [], []
    for did, t in zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist()):
        if t is None:
            continue
        toks = _WS_RE.findall(t.lower())
        if not toks:
            continue
        c = Counter(toks)
        ids.append(did)
        n_out.append(len(toks))
        d_out.append(len(c))
        m_out.append(max(c.values()))
    n = np.array(n_out, dtype=np.float64)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_tokens_rep": pa.array(n_out, pa.int64()),
            "distinct_ratio": pa.array(np.array(d_out, dtype=np.float64) / n if len(n) else [], pa.float64()),
            "top_token_frac": pa.array(np.array(m_out, dtype=np.float64) / n if len(n) else [], pa.float64()),
        }
    )


# --- TF-IDF ------------------------------------------------------------------

_TFIDF_SPLIT = r"[^a-z0-9]+"


def _doc_terms(batch: pa.Table, text_col: str, id_col: str) -> pa.Table:
    """Per-batch TF partial: (doc_id, term, tf_cnt, doc_total) — one
    vectorized lower + RE2 split + flatten, then a TableGroupBy count.
    Docs are whole rows, so these partials are globally final."""
    if batch.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf_cnt": pa.array([], pa.int64()),
                "doc_total": pa.array([], pa.int64()),
            }
        )
    lists = pc.split_pattern_regex(
        pc.utf8_lower(batch.column(text_col).combine_chunks()), pattern=_TFIDF_SPLIT
    )
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    parent = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False),
        np.diff(lists.offsets.to_numpy(zero_copy_only=False)),
    )
    flat = pa.table({id_col: pa.array(parent, pa.int64()), "term": lists.flatten()})
    flat = flat.filter(pc.not_equal(flat.column("term"), pa.scalar("")))
    g = pa.TableGroupBy(flat, [id_col, "term"]).aggregate([([], "count_all")])
    g = g.rename_columns([id_col, "term", "tf_cnt"])
    totals = pa.TableGroupBy(flat, [id_col]).aggregate([([], "count_all")])
    tot_ids = totals.column(id_col)
    pos = pc.index_in(g.column(id_col), value_set=tot_ids.combine_chunks())
    return g.append_column("doc_total", totals.column("count_all").take(pos))


def tfidf_top_terms(
    ds,
    n_docs: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int | None = None,
):
    """Top TF-IDF term per document: tokenize (lower, split on
    non-alphanumeric), score each (doc, term) with
    ``tf/doc_len * ln(N/df)`` quantized to micros, keep each doc's
    highest-scoring term (ties broken by term ASC).

    Scale shape: per-batch TF partials are final (docs never span
    batches); shuffle 1 co-locates each TERM to count df within the
    segment (no broadcast vocabulary — the vocab can be huge); shuffle 2
    co-locates each DOC to take its argmax. Pass ``n_docs`` from
    metadata (parquet row count) — don't re-count the dataset."""
    from .dedup import _group_partitions, _hash_shuffle
    from .merge_apply import _first_per_key_mask

    def attach_df(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("tfidf_micros", pa.array([], pa.int64()))
        t = t.take(pc.sort_indices(t, sort_keys=[("term", "ascending")]))
        first = _first_per_key_mask(t, ("term",)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        gidx = np.cumsum(first) - 1
        df = (np.append(starts[1:], t.num_rows) - starts)[gidx]
        tf_cnt = t.column("tf_cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        tot = t.column("doc_total").to_numpy(zero_copy_only=False).astype(np.float64)
        score = tf_cnt * 1_000_000.0 / tot * np.log(float(n_docs) / df)
        # round half-away-from-zero (scores are >= 0) to match SQL round()
        micros = np.floor(score + 0.5).astype(np.int64)
        return t.append_column("tfidf_micros", pa.array(micros, pa.int64()))

    def top_per_doc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "top_term": pa.array([], pa.string()),
                    "tfidf_micros": pa.array([], pa.int64()),
                }
            )
        t = t.take(
            pc.sort_indices(
                t,
                sort_keys=[
                    (id_col, "ascending"),
                    ("tfidf_micros", "descending"),
                    ("term", "ascending"),
                ],
            )
        )
        first = _first_per_key_mask(t, (id_col,)).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(first)
        keep = pa.array(starts, pa.int64())
        return pa.table(
            {
                id_col: t.column(id_col).take(keep),
                "top_term": t.column("term").take(keep),
                "tfidf_micros": t.column("tfidf_micros").take(keep),
            }
        )

    nparts = num_partitions or _group_partitions(16)
    tf = ds.map_batches(
        lambda b: _doc_terms(b, text_col, id_col), batch_format="pyarrow", zero_copy_batch=True
    )
    scored = (
        _hash_shuffle(tf)
        .repartition(num_blocks=nparts, keys=["term"])
        .map_batches(attach_df, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
    return (
        _hash_shuffle(scored)
        .repartition(num_blocks=nparts, keys=[id_col])
        .map_batches(top_per_doc, batch_format="pyarrow", batch_size=None, zero_copy_batch=True)
    )
