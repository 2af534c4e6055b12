"""DuckDB oracle SQL for every entry in pipelines/queries.QUERIES.

Each string is ANSI SQL the driver runs over the same parquet tables
(pre-registered views: region nation customer supplier part orders
lineitem events documents embeddings) to cross-check the Ray pipeline's
rows + schema + values. Conventions (learned the hard way, see
NOTES_r3.md): every SUM-derived output is CAST(... AS BIGINT) (DuckDB
SUM(BIGINT) -> HUGEINT -> decimal128 breaks dtype-sensitive value
hashes — tests/test_queries_oracle.py guards this for all entries), and
every computed column is named identically to the Ray output column.
"""

from __future__ import annotations

def _zorder_sql(bits: int = 8) -> str:
    """SQL mirror of morton2d: sum of per-bit extract/shift terms."""
    terms = []
    for i in range(bits):
        terms.append(f"((xb // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((yb // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    zexpr = " + ".join(terms)
    return f"""
    WITH b AS (
        SELECT (o_custkey & 255) AS xb,
               least(CAST(round(o_totalprice * 100) AS BIGINT) // 200000, 255) AS yb,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        FROM orders
    ),
    z AS (SELECT ({zexpr}) AS zkey, cents FROM b)
    SELECT zkey // 1024 AS zpart,
           min(zkey) AS zkey_min, max(zkey) AS zkey_max,
           CAST(sum(cents) AS BIGINT) AS cents_sum, count(*) AS n
    FROM z GROUP BY 1
    """


ORACLE_SQL = {
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE)
                   / 10000.0 AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01'
          AND l_shipdate <  TIMESTAMP '1999-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
    "lineitem_revenue_filter": """
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS revenue
        FROM lineitem WHERE l_quantity > 45
    """,
    "events_lww_state": """
        SELECT user_id, event_id, event_type, value FROM (
            SELECT user_id, event_id, event_type, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
            FROM events
        ) t WHERE rn = 1 AND event_type <> 'error'
    """,
    "events_exact_dedup": """
        SELECT user_id, event_type, event_id, value FROM (
            SELECT user_id, event_type, event_id, value,
                   ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
            FROM events
        ) t WHERE rn = 1
    """,
    "events_window_filter": """
        SELECT event_id, user_id, partition_size FROM (
            SELECT event_id, user_id,
                   count(*) OVER (PARTITION BY user_id) AS partition_size
            FROM events
        ) t WHERE partition_size > 60
    """,
    "orders_topk": """
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
    "customer_order_revenue": """
        SELECT c.c_custkey, c.c_name,
               CAST(round(sum(o.o_totalprice) * 100) AS BIGINT) AS revenue_cents,
               count(*) AS order_count
        FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_name
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name FROM customer
        WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    """,
    "nation_region_join": """
        SELECT n.n_nationkey, n.n_name, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "docs_exact_dedup": """
        SELECT min(doc_id) AS doc_id, md5(text) AS text_md5
        FROM documents GROUP BY md5(text)
    """,
    "docs_digits": """
        SELECT doc_id, regexp_replace(source, '[^0-9]', '', 'g') AS digits
        FROM documents
    """,
    "docs_token_stats": """
        SELECT doc_id,
               length(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               length(text) AS n_chars2
        FROM documents
    """,
    "embeddings_topk": """
        SELECT e.vec_id,
               CAST(round(list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])
               ) * 10000) AS BIGINT) AS cos_sim_e4
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        ORDER BY list_cosine_similarity(
                 CAST(e.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])
               ) DESC, e.vec_id
        LIMIT 10
    """,
    "events_type_stats": """
        SELECT event_type,
               count(*) AS n_events,
               round(avg(value), 6) AS avg_value,
               min(value) AS min_value,
               max(value) AS max_value
        FROM events GROUP BY event_type
    """,
    "supplier_nation_region": """
        SELECT s.s_suppkey, s.s_name, n.n_name, r.r_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    "part_filter_like": """
        SELECT p_partkey, p_name, p_retailprice
        FROM part WHERE p_name LIKE '%widget%'
    """,
    # docs_minhash_cc_dedup / docs_simhash_cc_dedup get full recursive-CTE
    # oracles (reachability closure over the band-bucket edges) — assigned
    # below with the other generated oracles.
}


# --- generated oracles (shared constants with the Ray implementations) -------

def _lang_quality_sql() -> str:
    from ..stages.text_stats import _STOPWORDS  # identical RE2 patterns

    langs = {k: _STOPWORDS[k] for k in sorted(_STOPWORDS)}
    stop_counts = ",\n         ".join(
        f"len(regexp_extract_all(lower(text), '{p}')) AS c_{k}" for k, p in langs.items()
    )
    scores = ",\n    ".join(
        f"CAST(c_{k} AS DOUBLE)/CAST(greatest(n_tok,1) AS DOUBLE) AS s_{k}" for k in langs
    )
    return f"""
    WITH base AS (
      SELECT doc_id,
         length(text) AS n_chars,
         len(regexp_extract_all(text, '\\S+')) AS n_tok,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
         {stop_counts}
      FROM documents
    ), r AS (
      SELECT doc_id, n_tok, n_chars,
    CAST(n_punct AS DOUBLE)/CAST(greatest(n_chars,1) AS DOUBLE) AS punct_r,
    CAST(n_upper AS DOUBLE)/CAST(greatest(n_chars,1) AS DOUBLE) AS upper_r,
    CAST(c_en AS DOUBLE)/CAST(greatest(n_tok,1) AS DOUBLE) AS stop_r,
    CAST(n_chars - greatest(n_tok-1,0) AS DOUBLE)/CAST(greatest(n_tok,1) AS DOUBLE) AS mtl,
    {scores}
      FROM base
    )
    SELECT doc_id,
      n_tok AS n_tokens,
      n_chars AS n_chars_computed,
      floor(punct_r * 1000000.0)/1000000.0 AS punct_ratio,
      floor(upper_r * 1000000.0)/1000000.0 AS upper_ratio,
      floor(stop_r * 1000000.0)/1000000.0 AS stopword_ratio,
      floor(mtl * 1000000.0)/1000000.0 AS mean_token_len,
      floor((0.4*least(CAST(n_tok AS DOUBLE)/100.0, 1.0)
          + 0.3*greatest(least(1.0 - 4.0*abs(punct_r - 0.03), 1.0), 0.0)
          + 0.3*least(stop_r/0.4, 1.0)) * 1000000.0)/1000000.0 AS quality_score,
      CASE WHEN greatest(s_de, s_en, s_es, s_fr) <= 0.02 THEN 'unknown'
           WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_es >= s_fr THEN 'es'
           ELSE 'fr' END AS lang_pred
    FROM r
    """


def _minhash_sql() -> str:
    from ..stages.dedup import MINHASH_P31, minhash_perms31

    a, b = minhash_perms31(64, seed=7)
    perm_rows = ", ".join(f"({j}, {int(x)}, {int(y)})" for j, (x, y) in enumerate(zip(a, b)))
    return f"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t
      FROM documents WHERE text IS NOT NULL
    ), sh AS (
      SELECT doc_id, list_distinct(
        CASE WHEN len(t) = 0 THEN []
             WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
             ELSE list_transform(generate_series(1, len(t)-2),
                                 i -> array_to_string(t[i:i+2], ' '))
        END) AS shingles
      FROM toks
    ), sx0 AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh
    ), sx AS (
      SELECT doc_id, CAST(md5_number_lower(s) % 4294967296 AS BIGINT) AS h FROM sx0
    ), perms(j, a, b) AS (SELECT * FROM (VALUES {perm_rows}) v(j, a, b)),
    mh AS (
      SELECT doc_id, j, min((a*h + b) % {MINHASH_P31}) AS m
      FROM sx CROSS JOIN perms GROUP BY doc_id, j
    ), bands AS (
      SELECT doc_id, j // 8 AS band, string_agg(CAST(m AS VARCHAR), '-' ORDER BY j) AS sig
      FROM mh GROUP BY doc_id, j // 8
    ), buckets AS (
      SELECT band, sig, min(doc_id) AS keep, count(*) AS n
      FROM bands GROUP BY band, sig
    ), removed AS (
      SELECT DISTINCT bd.doc_id
      FROM bands bd JOIN buckets k ON bd.band = k.band AND bd.sig = k.sig
      WHERE k.n BETWEEN 2 AND 1000 AND bd.doc_id > k.keep
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM removed)
    """


# transitive-closure suffix shared by the CC-dedup oracles: undirected
# reachability via a recursive CTE (the candidate graph at oracle scale is
# tiny), then keep each component's min id — exactly the union-find /
# distributed-CC rule (stages/cc.py).
def _cc_closure_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    return f"""
    adj AS (
      SELECT a, b FROM cand_edges UNION SELECT b AS a, a AS b FROM cand_edges
    ), reach AS (
      SELECT a AS node, a AS r FROM adj
      UNION
      SELECT reach.node, adj.b AS r FROM reach JOIN adj ON reach.r = adj.a
    ), roots AS (
      SELECT node, min(r) AS root FROM reach GROUP BY node
    ), removed AS (
      SELECT node AS {id_col} FROM roots WHERE root < node
    )
    SELECT {id_col} FROM {table}
    WHERE {id_col} NOT IN (SELECT {id_col} FROM removed)
"""


_CC_CLOSURE_SQL = _cc_closure_sql()


def _minhash_cc_sql() -> str:
    """Transitive variant: same shingle/minhash/band/bucket pipeline, but
    the removal rule is connected components over the bucket-star edges
    (bucket-min -> member, buckets of size 2..1000 — the same edge set
    _bucket_edges_table emits), closed recursively."""
    base = _minhash_sql()
    head, _sep, _tail = base.partition("), removed AS (")
    return (
        "WITH RECURSIVE"
        + head.split("WITH", 1)[1]
        + """), cand_edges AS (
      SELECT DISTINCT k.keep AS a, bd.doc_id AS b
      FROM bands bd JOIN buckets k ON bd.band = k.band AND bd.sig = k.sig
      WHERE k.n BETWEEN 2 AND 1000 AND bd.doc_id > k.keep
    ),"""
        + _CC_CLOSURE_SQL
    )


def _simhash_sql() -> str:
    return """
    WITH tk AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
      FROM documents WHERE text IS NOT NULL
    ), th AS (
      SELECT doc_id, md5_number_lower(tok) AS h FROM tk
    ), bitsum AS (
      SELECT doc_id, bb.b AS b,
             sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) bb
      GROUP BY doc_id, bb.b
    ), sig AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN v > 0 THEN CAST(1 AS UBIGINT) << b
                           ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS s
      FROM bitsum GROUP BY doc_id
    ), bands AS (
      SELECT doc_id, bi.bi AS band,
             CAST((s >> (16*bi.bi)) & 65535 AS BIGINT) AS bh, s
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bi) bi
    ), removed AS (
      SELECT DISTINCT x.doc_id
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bh = y.bh AND y.doc_id < x.doc_id
      WHERE bit_count(xor(x.s, y.s)) <= 3
    )
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (SELECT doc_id FROM removed)
    """


def _simhash_cc_sql() -> str:
    """Transitive variant: edges are the in-bucket pairs within
    hamming<=3 (the same pairs bucket_edges emits), closed recursively."""
    base = _simhash_sql()
    head, _sep, _tail = base.partition("), removed AS (")
    return (
        "WITH RECURSIVE"
        + head.split("WITH", 1)[1]
        + """), cand_edges AS (
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
      WHERE bit_count(xor(x.s, y.s)) <= 3
    ),"""
        + _CC_CLOSURE_SQL
    )


ORACLE_SQL["docs_lang_quality"] = _lang_quality_sql()
ORACLE_SQL["docs_minhash_dedup"] = _minhash_sql()


def _decontaminate_sql() -> str:
    """Cross-corpus variant of _minhash_sql: same signature pipeline, but
    the removal rule is 'corpus doc shares a (band, sig) bucket with a
    reference doc' (reference = doc_id % 17 == 0)."""
    base = _minhash_sql()
    head, _sep, _tail = base.partition("), buckets AS (")
    return (
        head
        + """), corp AS (
      SELECT doc_id, band, sig FROM bands WHERE doc_id % 17 <> 0
    ), refb AS (
      SELECT DISTINCT band, sig FROM bands WHERE doc_id % 17 = 0
    ), removed AS (
      SELECT DISTINCT corp.doc_id
      FROM corp JOIN refb ON corp.band = refb.band AND corp.sig = refb.sig
    )
    SELECT doc_id FROM documents
    WHERE doc_id % 17 <> 0 AND doc_id NOT IN (SELECT doc_id FROM removed)
    """
    )


ORACLE_SQL["docs_decontaminate"] = _decontaminate_sql()
ORACLE_SQL["docs_simhash_dedup"] = _simhash_sql()
# transitive CC variants: survivors after connected components over the
# candidate graph, computed in SQL with a recursive reachability closure
ORACLE_SQL["docs_minhash_cc_dedup"] = _minhash_cc_sql()
ORACLE_SQL["docs_simhash_cc_dedup"] = _simhash_cc_sql()
ORACLE_SQL["events_asof_join"] = """
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS ts_r, r.value AS value_r
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def _ngram_cc_sql(threshold: float = 0.5) -> str:
    """Bands prefix + exact trigram-Jaccard verify + recursive closure —
    mirrors ngram_jaccard_dedup(n=3, bands=8) exactly (the shingle lists
    in `sh` ARE the verify's word-trigram sets)."""
    base = _minhash_sql()
    head, _sep, _tail = base.partition("), removed AS (")
    return (
        "WITH RECURSIVE"
        + head.split("WITH", 1)[1]
        + f"""), raw_edges AS (
      SELECT DISTINCT k.keep AS a, bd.doc_id AS b
      FROM bands bd JOIN buckets k ON bd.band = k.band AND bd.sig = k.sig
      WHERE k.n BETWEEN 2 AND 1000 AND bd.doc_id > k.keep
    ), cand_edges AS (
      SELECT e.a, e.b
      FROM raw_edges e
      JOIN sh sa ON sa.doc_id = e.a
      JOIN sh sb ON sb.doc_id = e.b
      WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(sa.shingles, sb.shingles)))
            >= {threshold}
    ),"""
        + _cc_closure_sql()
    )


ORACLE_SQL["docs_ngram_dedup"] = _ngram_cc_sql(0.5)


def _cosine_lsh_sql(threshold: float = 0.4, dim: int = 64,
                    num_planes: int = 12, seed: int = 13) -> str:
    """Mirror of stages/dedup.py embedding_dedup: the EXACT float32 plane
    weights are inlined as VALUES (float32 is exactly representable in
    DOUBLE, and the Ray side projects in float64 over those weights, so
    the sign patterns agree bit-for-bit); buckets = full 12-bit sign
    pattern (band 0) + low-half 6-bit pattern (band 1); in-bucket pairs
    with double cosine >= threshold are closed recursively."""
    from ..stages.dedup import hyperplanes

    P = hyperplanes(dim, num_planes, seed)
    plane_rows = ", ".join(
        f"({j}, {i}, {float(P[i, j])!r})"
        for j in range(num_planes) for i in range(dim)
    )
    half = num_planes // 2
    return (
        f"""WITH RECURSIVE planes(j, i, w) AS (
      SELECT * FROM (VALUES {plane_rows}) v(j, i, w)
    ), emb AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), proj AS (
      SELECT vec_id, p.j AS j, sum(e[p.i + 1] * p.w) AS s
      FROM emb CROSS JOIN planes p GROUP BY vec_id, p.j
    ), sig AS (
      SELECT vec_id,
             sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS h_full,
             sum(CASE WHEN s > 0 AND j < {half} THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS h_half
      FROM proj GROUP BY vec_id
    ), bands AS (
      SELECT vec_id, 0 AS band, h_full AS bh FROM sig
      UNION ALL
      SELECT vec_id, 1 AS band, h_half AS bh FROM sig
    ), cand_edges AS (
      SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
      FROM bands x JOIN bands y
        ON x.band = y.band AND x.bh = y.bh AND x.vec_id < y.vec_id
      JOIN emb ex ON ex.vec_id = x.vec_id
      JOIN emb ey ON ey.vec_id = y.vec_id
      WHERE list_cosine_similarity(ex.e, ey.e) >= {threshold}
    ),"""
        + _cc_closure_sql("embeddings", "vec_id")
    )


ORACLE_SQL["embeddings_cosine_dedup"] = _cosine_lsh_sql()

ORACLE_SQL["orders_topk_per_customer"] = """
    SELECT o_orderkey, o_custkey, o_totalprice, rnk FROM (
      SELECT o_orderkey, o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    ) WHERE rnk <= 3
"""
ORACLE_SQL["docs_deterministic_sample"] = f"""
    SELECT doc_id FROM documents
    WHERE md5_number_lower('s0:' || CAST(doc_id AS VARCHAR))
          < CAST({int(0.3 * (1 << 64))} AS UHUGEINT)
"""
# same cumulative cuts as assign_split builds from _SPLITS (boundary hash
# == cut belongs to the earlier interval on both sides)
_SPLIT_C0 = min(int(0.9 * (1 << 64)), (1 << 64) - 1)
_SPLIT_C1 = min(int(0.95 * (1 << 64)), (1 << 64) - 1)
ORACLE_SQL["events_stratified_sample"] = """
    SELECT event_id, event_type FROM (
      SELECT event_id, event_type,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5_number_lower('s0:' || CAST(event_id AS VARCHAR)),
                        event_id
             ) AS rn
      FROM events
    ) WHERE rn <= 20
"""
ORACLE_SQL["events_funnel"] = """
    WITH s0 AS (
      SELECT user_id, min(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s1 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s0 ON e.user_id = s0.user_id AND e.ts > s0.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST(0 AS BIGINT) AS step_idx, 'view' AS step,
           CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
    UNION ALL
    SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
    UNION ALL
    SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
"""
ORACLE_SQL["docs_repetition_stats"] = r"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      FROM documents WHERE text IS NOT NULL
    ), per_tok AS (
      SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens_rep,
           CAST(count(*) AS DOUBLE) / sum(c) AS distinct_ratio,
           CAST(max(c) AS DOUBLE) / sum(c) AS top_token_frac
    FROM per_tok GROUP BY doc_id
"""
ORACLE_SQL["customers_pii_redact"] = r"""
    WITH blob AS (
      SELECT c_custkey,
             c_name || ' call '
               || CAST(10 + c_custkey % 90 AS VARCHAR) || '-'
               || CAST(100 + c_custkey % 900 AS VARCHAR) || '-'
               || CAST(100 + (c_custkey * 7) % 900 AS VARCHAR) || '-'
               || CAST(1000 + (c_custkey * 13) % 9000 AS VARCHAR)
               || ' or c' || CAST(c_custkey AS VARCHAR) || '@example.com soon' AS text
      FROM customer
    ), emails AS (
      SELECT c_custkey,
             CAST(len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
      FROM blob
    )
    SELECT c_custkey, n_emails,
           CAST(len(regexp_extract_all(t1,
             '\d{2,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{3,4}')) AS BIGINT) AS n_phones,
           regexp_replace(t1,
             '\d{2,3}[-. ]\d{3}[-. ]\d{3,4}[-. ]\d{3,4}', '<PHONE>', 'g') AS text_redacted
    FROM emails
"""
ORACLE_SQL["events_salted_agg"] = """
    SELECT user_id,
           CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_micros,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY user_id
"""
ORACLE_SQL["events_range_join"] = """
    WITH bands AS (
      SELECT CAST(i AS BIGINT) AS band_id,
             CAST(i * 25 AS DOUBLE) AS lo,
             CAST(i * 25 + 60 AS DOUBLE) AS hi
      FROM generate_series(0, 19) t(i)
    )
    SELECT e.event_id, b.band_id, e.value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
"""
ORACLE_SQL["docs_top_tokens"] = """
    SELECT key, CAST(count(*) AS BIGINT) AS n FROM (
      SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS key
      FROM documents WHERE text IS NOT NULL
    ) GROUP BY key
    ORDER BY n DESC, key LIMIT 25
"""
# fixed-point mirror of stages/ann.py::group_centroids(quantize=1e6):
# inputs round-half-away at 2^31, EXACT integer sums (fold-order-free on
# both sides), one identical float64 quantization expression
ORACLE_SQL["embeddings_group_centroids"] = """
    SELECT CAST(vec_id % 10 AS BIGINT) AS g, CAST(i AS BIGINT) AS i,
           CAST(round((CAST(SUM(xq) AS DOUBLE) * 1000000.0)
                      / (CAST(count(*) AS DOUBLE) * 2147483648.0)) AS BIGINT)
               AS avg_q,
           CAST(count(*) AS BIGINT) AS n_vectors
    FROM (SELECT vec_id,
                 CAST(round(CAST(unnest(embedding) AS DOUBLE) * 2147483648.0)
                      AS BIGINT) AS xq,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings)
    GROUP BY g, i
"""
ORACLE_SQL["docs_split"] = f"""
    SELECT doc_id,
           CASE WHEN h <= CAST({_SPLIT_C0} AS UHUGEINT) THEN 'train'
                WHEN h <= CAST({_SPLIT_C1} AS UHUGEINT) THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 md5_number_lower('s0:' || CAST(doc_id AS VARCHAR)) AS h
          FROM documents) t
"""
ORACLE_SQL["events_heavy_hitters"] = """
    SELECT user_id, count(*) AS n
    FROM events GROUP BY user_id
    ORDER BY n DESC, user_id LIMIT 10
"""
ORACLE_SQL["events_sketch_stats"] = """
    SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct_users,
           true AS hll_within_5pct,
           true AS p50_within_bound,
           true AS p90_within_bound
    FROM events
"""
ORACLE_SQL["events_hopping_agg"] = """
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) - j.j * (INTERVAL 15 MINUTE)
             AS window_start,
           event_type, count(*) AS n_events,
           CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_micros
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
    GROUP BY 1, 2
"""
ORACLE_SQL["events_session_agg"] = """
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), y AS (
      SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_micros
    FROM y GROUP BY user_id, sid
"""
ORACLE_SQL["events_windowed_agg"] = """
    SELECT window_start, event_type, n_events, sum_value_micros,
           CAST(round(CAST(sum_value_micros AS DOUBLE) / n_events) AS BIGINT)
             AS avg_value_micros
    FROM (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
             count(*) AS n_events,
             CAST(round(sum(value) * 1000000) AS BIGINT) AS sum_value_micros
      FROM events
      GROUP BY 1, 2
    )
"""
# Invariant oracle: the Ray side measures IVF recall against the exact
# brute-force top-k; the SQL states the required invariants as constants.
ORACLE_SQL["embeddings_ann_ivf"] = """
    SELECT CAST(q AS BIGINT) AS query_id,
           CAST(10 AS BIGINT) AS n_results,
           true AS recall_ge_070
    FROM generate_series(0, 2) t(q)
"""
ORACLE_SQL["media_features"] = """
    SELECT doc_id AS media_id,
      CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      CAST(16 + (CAST('0x' || substr(md5(text), 1, 2) AS INTEGER) % 240) AS BIGINT) AS width,
      CAST(16 + (CAST('0x' || substr(md5(text), 3, 2) AS INTEGER) % 240) AS BIGINT) AS height,
      CAST(CAST('0x' || substr(md5(text), 5, 2) AS INTEGER) AS DOUBLE) AS mean_luma,
      CASE WHEN doc_id % 3 = 2
           THEN CAST(((1 + octet_length(encode(text)) % 97) + 9) // 10 AS BIGINT)
           ELSE NULL END AS n_offsets
    FROM documents
"""

ORACLE_SQL["events_scd2_history"] = """
    SELECT user_id,
           event_id AS valid_from,
           COALESCE(LEAD(event_id) OVER w, -1) AS valid_to,
           LEAD(event_id) OVER w IS NULL AS is_current,
           event_type,
           CAST(round(value * 100) AS BIGINT) AS value_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""
ORACLE_SQL["events_running_total"] = """
    SELECT user_id, event_id,
           CAST(round(value * 100) AS BIGINT) AS value_cents,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS run_value_cents,
           COALESCE(LAG(CAST(round(value * 100) AS BIGINT)) OVER w, -1)
               AS prev_value_cents,
           ROW_NUMBER() OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
"""
ORACLE_SQL["events_watermark"] = """
    SELECT event_id,
           COALESCE(MAX(epoch_us(ts)) OVER wprior, -1) AS wm_micros,
           COALESCE(epoch_us(ts) < MAX(epoch_us(ts)) OVER wprior - 60000000,
                    FALSE) AS late,
           MAX(CAST(round(value * 100) AS BIGINT)) OVER
               (ORDER BY event_id ROWS UNBOUNDED PRECEDING)
               AS run_max_value_cents
    FROM events
    WINDOW wprior AS
        (ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
"""

ORACLE_SQL["orders_bloom_semi_join"] = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_custkey IN
        (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
"""

ORACLE_SQL["orders_rollup"] = """
    SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
           COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""
ORACLE_SQL["events_pivot_by_type"] = """
    SELECT user_id,
      CAST(SUM(CASE WHEN event_type='click'    THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS click_sum,
      CAST(SUM(CASE WHEN event_type='error'    THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS error_sum,
      CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS purchase_sum,
      CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS signup_sum,
      CAST(SUM(CASE WHEN event_type='view'     THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS view_sum,
      CAST(SUM(CASE WHEN event_type IN ('click','error','purchase','signup','view')
               THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
"""

# Invariant oracles: the Ray side computes BOTH the sketch and the exact
# judge and asserts the error bounds; the SQL restates the exact values
# and the bound flags as constants (same pattern as events_sketch_stats).
ORACLE_SQL["events_cms_frequencies"] = """
    SELECT count(DISTINCT user_id) AS n_keys,
           true AS cms_never_underestimates,
           true AS cms_within_bound
    FROM events
"""
ORACLE_SQL["events_distinct_users_by_type"] = """
    SELECT event_type,
           count(DISTINCT user_id) AS exact_distinct,
           true AS hll_within_5pct
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["events_quantiles_by_type"] = """
    SELECT event_type,
           percentile_disc(0.5) WITHIN GROUP
               (ORDER BY CAST(round(value*100) AS BIGINT)) AS p05,
           percentile_disc(0.9) WITHIN GROUP
               (ORDER BY CAST(round(value*100) AS BIGINT)) AS p09,
           percentile_disc(0.99) WITHIN GROUP
               (ORDER BY CAST(round(value*100) AS BIGINT)) AS p099,
           count(*) AS n
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["events_rolling_revenue"] = """
    SELECT user_id, event_id,
           CAST(round(value * 100) AS BIGINT) AS value_cents,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS BIGINT)
               AS roll_sum_cents,
           LEAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id), 10)
               AS roll_n
    FROM events
"""

# the incremental SCD2 result must equal the FULL-history window — the
# oracle is identical to events_scd2_history's
ORACLE_SQL["events_scd2_incremental"] = ORACLE_SQL["events_scd2_history"]

ORACLE_SQL["events_retention_cohorts"] = """
    WITH ud AS (
      SELECT DISTINCT user_id,
             datediff('day', TIMESTAMP '1970-01-01', date_trunc('day', ts)) AS d
      FROM events
    ),
    f AS (SELECT user_id, MIN(d) AS cohort FROM ud GROUP BY user_id)
    SELECT f.cohort AS cohort_day, ud.d - f.cohort AS day_offset,
           COUNT(*) AS n_users
    FROM ud JOIN f USING (user_id)
    GROUP BY 1, 2
"""

ORACLE_SQL["events_mad_outliers"] = """
    WITH e AS (
      SELECT event_id, event_type, CAST(round(value*100) AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY v) AS BIGINT) AS med
      FROM e GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             CAST(percentile_disc(0.5) WITHIN GROUP
                 (ORDER BY abs(e.v - med.med)) AS BIGINT) AS mad
      FROM e JOIN med USING (event_type) GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.v AS value_cents
    FROM e JOIN med USING (event_type) JOIN mad USING (event_type)
    WHERE abs(e.v - med.med) > 3 * mad.mad
"""

ORACLE_SQL["events_user_paths"] = """
    WITH r AS (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, string_agg(event_type, '->' ORDER BY rn) AS path,
           count(*) AS path_len
    FROM r WHERE rn <= 8 GROUP BY user_id
"""

# dense_rank gets its OWN window ordered by the value alone: DuckDB
# ranks over the full ORDER BY list, and the (v, event_id) tie-break
# would make dense_rank == row_number
ORACLE_SQL["events_rank_stats"] = """
    WITH e AS (
      SELECT event_type, event_id, CAST(round(value*100) AS BIGINT) AS v
      FROM events
    ),
    r AS (
      SELECT event_type, event_id, v AS value_cents,
             row_number() OVER w AS rn,
             dense_rank() OVER (PARTITION BY event_type ORDER BY v DESC)
                 AS dense_rank,
             count(*) OVER (PARTITION BY event_type) AS n,
             ntile(4) OVER w AS ntile
      FROM e WINDOW w AS (PARTITION BY event_type ORDER BY v DESC, event_id)
    )
    SELECT event_type, event_id, value_cents, rn, dense_rank,
           CASE WHEN n = 1 THEN 0
                ELSE ((rn-1)*2000000 + (n-1)) // (2*(n-1)) END
               AS pct_rank_micros,
           ntile
    FROM r
"""

ORACLE_SQL["events_audience_overlap"] = """
    WITH f AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS ha,
             max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS hb
      FROM events WHERE event_type IN ('purchase', 'error')
      GROUP BY user_id
    )
    SELECT count(*) FILTER (ha = 1 AND hb = 1) AS n_both,
           count(*) FILTER (ha = 1 AND hb = 0) AS n_only_a,
           count(*) FILTER (ha = 0 AND hb = 1) AS n_only_b,
           count(*) AS n_either
    FROM f
"""

ORACLE_SQL["docs_tfidf_top_terms"] = """
    WITH toks AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents
      ) t WHERE term <> ''
    ),
    tf AS (SELECT doc_id, term, count(*) AS c FROM toks GROUP BY 1, 2),
    tot AS (SELECT doc_id, count(*) AS tot FROM toks GROUP BY 1),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS nd FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(round(tf.c * 1000000.0 / tot.tot * ln(nd * 1.0 / df.df))
                  AS BIGINT) AS tfidf_micros
      FROM tf JOIN tot USING (doc_id) JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term AS top_term, tfidf_micros
    FROM (SELECT *, row_number() OVER
              (PARTITION BY doc_id ORDER BY tfidf_micros DESC, term) AS rn
          FROM scored)
    WHERE rn = 1
"""

ORACLE_SQL["events_sessionize"] = """
    WITH o AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS ns
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT *, CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM o
    )
    SELECT user_id, event_id, session_seq,
           row_number() OVER (PARTITION BY user_id, session_seq
                              ORDER BY ts, event_id) AS event_seq
    FROM s
"""

ORACLE_SQL["events_cooccurrence"] = """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           count(*) AS n_baskets
    FROM d a JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
"""

ORACLE_SQL["events_gapfill_locf"] = """
    WITH RECURSIVE e AS (
      SELECT event_type, epoch_us(ts) // 3600000000 AS h,
             CAST(round(value*100) AS BIGINT) AS v
      FROM events
    ),
    agg AS (SELECT event_type, h, count(*) AS n,
                   CAST(sum(v) AS BIGINT) AS s FROM e GROUP BY 1, 2),
    bounds AS (SELECT min(h) AS lo, max(h) AS hi FROM e),
    series(h) AS (
      SELECT lo FROM bounds
      UNION ALL
      SELECT h + 1 FROM series, bounds WHERE h < hi
    ),
    types AS (SELECT DISTINCT event_type FROM e),
    grid AS (SELECT t.event_type, s.h FROM types t CROSS JOIN series s),
    j AS (
      SELECT g.event_type, g.h, coalesce(a.n, 0) AS n_events, a.s
      FROM grid g LEFT JOIN agg a USING (event_type, h)
    ),
    f AS (SELECT *, count(s) OVER (PARTITION BY event_type ORDER BY h) AS grp FROM j)
    SELECT event_type, h AS bucket_start, n_events,
           coalesce(max(s) OVER (PARTITION BY event_type, grp), -1) AS sum_locf
    FROM f
"""

ORACLE_SQL["q3_shipping_priority"] = """
    SELECT l_orderkey,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT))
               AS BIGINT) AS revenue_micro,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue_micro DESC, l_orderkey
    LIMIT 10
"""

ORACLE_SQL["q5_regional_supplier_volume"] = """
    SELECT n_name,
           CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT))
               AS BIGINT) AS revenue_micro
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
"""

ORACLE_SQL["parts_skyline"] = """
    SELECT p_partkey, p_size, p_retailprice
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE q.p_retailprice <= p.p_retailprice
          AND q.p_size >= p.p_size
          AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
    )
"""

ORACLE_SQL["events_props_extract"] = """
    WITH e AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    )
    SELECT event_type,
           CAST(sum(k) AS BIGINT) AS k_sum,
           max(k) AS k_max,
           count(k) AS n_with_k,
           count(*) AS n
    FROM e GROUP BY event_type
"""

ORACLE_SQL["docs_priority_sample"] = """
    SELECT doc_id, n_chars, priority_key FROM (
        SELECT doc_id, n_chars,
               CAST((md5_number_lower('s0:' || CAST(doc_id AS VARCHAR)) >> 1)
                    // CAST(n_chars AS UHUGEINT) AS BIGINT) AS priority_key
        FROM documents
    ) ORDER BY priority_key, doc_id
    LIMIT 50
"""

ORACLE_SQL["parts_fuzzy_pairs"] = """
    WITH n AS (SELECT p_name AS name, count(*) AS c FROM part GROUP BY p_name)
    SELECT a.name AS name_a, b.name AS name_b, a.c * b.c AS n_pairs
    FROM n a JOIN n b
      ON a.name < b.name AND levenshtein(a.name, b.name) = 1
"""

ORACLE_SQL["events_value_corr"] = """
    WITH e AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS x,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
        FROM events
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM e GROUP BY event_type
    )
    SELECT event_type, n, sx, sy, sxx, syy, sxy,
           CASE WHEN (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                      * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) = 0
                THEN NULL
                ELSE (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
           END AS corr
    FROM m
"""

ORACLE_SQL["events_cdc_diff"] = """
    WITH c AS (
        SELECT count(*) * 3 // 5 AS cut1, count(*) * 9 // 10 AS cut2 FROM events
    ),
    s1 AS (
        SELECT user_id, event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS value_cents,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events, c WHERE event_id < cut1
    ),
    l1 AS (SELECT * FROM s1 WHERE rn = 1 AND event_type <> 'error'),
    s2 AS (
        SELECT user_id, event_id, event_type,
               CAST(round(value * 100) AS BIGINT) AS value_cents,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events, c WHERE event_id < cut2
    ),
    l2 AS (SELECT * FROM s2 WHERE rn = 1 AND event_type <> 'error')
    SELECT coalesce(l2.user_id, l1.user_id) AS user_id,
           CASE WHEN l1.user_id IS NULL THEN 'I'
                WHEN l2.user_id IS NULL THEN 'D'
                ELSE 'U' END AS op,
           coalesce(l2.event_type, '') AS event_type,
           coalesce(l2.value_cents, -1) AS value_cents,
           coalesce(l2.event_id, -1) AS new_event_id
    FROM l1 FULL JOIN l2 ON l1.user_id = l2.user_id
    WHERE l1.user_id IS NULL OR l2.user_id IS NULL OR l1.event_id <> l2.event_id
"""

ORACLE_SQL["orders_zorder_layout"] = _zorder_sql()

ORACLE_SQL["events_window_distinct_users"] = """
    SELECT time_bucket(INTERVAL 15 MINUTE, ts) - j.j * (INTERVAL 15 MINUTE)
             AS window_start,
           count(DISTINCT user_id) AS n_users
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS j) j
    GROUP BY 1
"""

ORACLE_SQL["events_cumulative_users"] = """
    WITH f AS (
        SELECT user_id, min(time_bucket(INTERVAL 1 DAY, ts)) AS day
        FROM events GROUP BY user_id
    ),
    g AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
               AS BIGINT) AS cumulative_users
    FROM g
"""

ORACLE_SQL["embeddings_dim_stats"] = """
    SELECT u.i - 1 AS dim, count(*) AS n,
           CAST(sum(CAST(round(CAST(u.e AS DOUBLE) * 1000000) AS BIGINT))
               AS BIGINT) AS sum_micro,
           min(u.e) AS vmin, max(u.e) AS vmax
    FROM (
        SELECT unnest(embedding) AS e,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings
    ) u
    GROUP BY 1
"""

ORACLE_SQL["events_gap_histogram"] = """
    WITH g AS (
        SELECT (epoch_us(ts)
                - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)))
               // 1000000 AS gap_s
        FROM events
    )
    SELECT CASE WHEN gap_s < 60 THEN 'lt_1m'
                WHEN gap_s < 600 THEN '1m_10m'
                WHEN gap_s < 3600 THEN '10m_1h'
                WHEN gap_s < 21600 THEN '1h_6h'
                WHEN gap_s < 86400 THEN '6h_1d'
                ELSE 'ge_1d' END AS bucket,
           count(*) AS n_gaps
    FROM g WHERE gap_s IS NOT NULL
    GROUP BY 1
"""

ORACLE_SQL["docs_chunking"] = """
    WITH t AS (
        -- regexp_extract_all('\\S+') counts tokens exactly like the
        -- engine's token_count (0 for empty/whitespace-only text) and
        -- the column-bound generate_series caps nothing: any document
        -- length produces exactly ceil(n_tok/16) chunks on both sides
        SELECT doc_id, length(regexp_extract_all(text, '\\S+')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tok,
               unnest(generate_series(0, (n_tok + 15) // 16 - 1)) AS chunk_idx
        FROM t WHERE n_tok > 0
    )
    SELECT doc_id, chunk_idx,
           least(32, n_tok - chunk_idx * 16) AS chunk_tokens
    FROM c
"""

ORACLE_SQL["docs_search_topk"] = """
    WITH toks AS (
      SELECT doc_id, term FROM (
        SELECT doc_id,
               unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS term
        FROM documents
      ) t WHERE term IN ('shuffle', 'merge', 'vector')
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS nd FROM documents)
    SELECT doc_id,
           CAST(sum(tf * ((nd * 1000) // df)) AS BIGINT) AS score_milli
    FROM tf JOIN df USING (term) CROSS JOIN n
    GROUP BY doc_id
    ORDER BY score_milli DESC, doc_id
    LIMIT 10
"""

ORACLE_SQL["events_late_corrections"] = """
    WITH w AS (
        SELECT epoch_us(ts) AS tus,
               CAST(round(value * 100) AS BIGINT) AS cents,
               COALESCE(epoch_us(ts) <
                        MAX(epoch_us(ts)) OVER (ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        - 60000000, FALSE) AS late
        FROM events
    )
    SELECT (tus // 3600000000) * 3600000000 AS window_start,
           count(*) FILTER (WHERE NOT late) AS n_on_time,
           CAST(COALESCE(sum(cents) FILTER (WHERE NOT late), 0) AS BIGINT)
               AS on_time_cents,
           count(*) FILTER (WHERE late) AS n_late,
           CAST(COALESCE(sum(cents) FILTER (WHERE late), 0) AS BIGINT)
               AS late_cents
    FROM w GROUP BY 1
"""

ORACLE_SQL["embeddings_cov_block"] = """
    WITH e AS (
        SELECT u.r AS rid, u.i - 1 AS dim,
               CAST(round(CAST(u.e AS DOUBLE) * 1000) AS BIGINT) AS v
        FROM (
            SELECT vec_id AS r,
                   unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings
        ) u
        WHERE u.i <= 8
    )
    SELECT a.dim AS i, b.dim AS j, count(*) AS n,
           CAST(sum(a.v) AS BIGINT) AS sum_i,
           CAST(sum(b.v) AS BIGINT) AS sum_j,
           CAST(sum(a.v * b.v) AS BIGINT) AS sum_ij
    FROM e a JOIN e b ON a.rid = b.rid AND a.dim <= b.dim
    GROUP BY 1, 2
"""

ORACLE_SQL["events_table_digest"] = """
    SELECT event_type,
           CAST(bit_xor(md5_number_lower(
               CAST(event_id AS VARCHAR) || '|' ||
               CAST(user_id AS VARCHAR) || '|' ||
               CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)
           )) AS VARCHAR) AS digest,
           count(*) AS n
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["events_value_regression"] = """
    WITH e AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS x,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    ),
    m AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(x * y) AS BIGINT) AS sxy
        FROM e GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) = 0
                THEN NULL
                ELSE (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                     / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
           END AS slope,
           CASE WHEN (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) = 0
                THEN NULL
                ELSE (CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                         / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                        * sx)
                     / CAST(n AS DOUBLE)
           END AS intercept
    FROM m
"""

ORACLE_SQL["events_winsorized_stats"] = """
    WITH e AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    caps AS (
        SELECT event_type,
               percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) AS lo,
               percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) AS hi
        FROM e GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(sum(least(greatest(e.cents, c.lo), c.hi)) AS BIGINT)
               AS winsorized_cents,
           count(*) AS n
    FROM e JOIN caps c USING (event_type)
    GROUP BY e.event_type
"""

ORACLE_SQL["events_interval_coalesce"] = """
    WITH iv AS (
        SELECT user_id, epoch_us(ts) AS s,
               epoch_us(ts) + CAST(round(value * 100) AS BIGINT) * 10000 AS e
        FROM events
    ),
    x AS (
        SELECT user_id, s, e,
               max(e) OVER (PARTITION BY user_id ORDER BY s
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prev_max
        FROM iv
    ),
    y AS (
        SELECT *, CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END AS brk
        FROM x
    ),
    z AS (
        SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY s, e
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
        FROM y
    )
    SELECT user_id, island,
           min(s) AS island_start, max(e) AS island_end,
           count(*) AS n_intervals
    FROM z GROUP BY 1, 2
"""

ORACLE_SQL["events_profile"] = """
    WITH e AS (
        SELECT event_type, user_id,
               CAST(round(value * 100) AS BIGINT) AS value_cents
        FROM events
    )
    SELECT 'event_type' AS "column", count(*) AS n,
           count(*) - count(event_type) AS nulls,
           count(DISTINCT event_type) AS n_distinct,
           CAST(min(event_type) AS VARCHAR) AS vmin,
           CAST(max(event_type) AS VARCHAR) AS vmax
    FROM e
    UNION ALL
    SELECT 'user_id', count(*), count(*) - count(user_id),
           count(DISTINCT user_id),
           CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
    FROM e
    UNION ALL
    SELECT 'value_cents', count(*), count(*) - count(value_cents),
           count(DISTINCT value_cents),
           CAST(min(value_cents) AS VARCHAR), CAST(max(value_cents) AS VARCHAR)
    FROM e
"""

ORACLE_SQL["orders_integrity_audit"] = """
    SELECT 'orphan_orders' AS "check",
           (SELECT count(*) FROM orders
            WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
               AS violations
    UNION ALL
    SELECT 'childless_customers',
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
    UNION ALL
    SELECT 'duplicate_orderkeys',
           (SELECT CAST(COALESCE(sum(c - 1), 0) AS BIGINT) FROM
              (SELECT count(*) AS c FROM orders GROUP BY o_orderkey
               HAVING count(*) > 1) t)
"""

ORACLE_SQL["events_mode_value"] = """
    WITH c AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
               count(*) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, v AS mode_cents, c AS mode_count FROM (
        SELECT *, row_number() OVER (
            PARTITION BY event_type ORDER BY c DESC, v ASC) AS rn
        FROM c
    ) WHERE rn = 1
"""

ORACLE_SQL["events_pattern_matches"] = """
    WITH p AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(regexp_extract_all(s, 'vcp')) AS BIGINT) AS n_matches
    FROM p
    WHERE length(regexp_extract_all(s, 'vcp')) > 0
"""

ORACLE_SQL["orders_cube"] = """
    SELECT COALESCE(o_orderstatus, '(all)') AS o_orderstatus,
           COALESCE(o_orderpriority, '(all)') AS o_orderpriority,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

ORACLE_SQL["events_entropy"] = """
    WITH cells AS (
        SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type,
           CAST(SUM(c) AS BIGINT) AS n,
           log2(CAST(SUM(c) AS DOUBLE))
             - SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE)))
               / CAST(SUM(c) AS DOUBLE) AS entropy_bits
    FROM cells
    GROUP BY event_type
"""

ORACLE_SQL["events_percentile_cont"] = """
    SELECT event_type,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS p025,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5)  AS p05,
           quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS p075,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
"""

ORACLE_SQL["lineitem_unpivot"] = """
    SELECT l_orderkey, l_linenumber, 'quantity_cents' AS measure,
           CAST(round(l_quantity * 100) AS BIGINT) AS value_cents
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice_cents',
           CAST(round(l_extendedprice * 100) AS BIGINT)
    FROM lineitem WHERE l_returnflag = 'R'
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount_cents',
           CAST(round(l_discount * 100) AS BIGINT)
    FROM lineitem WHERE l_returnflag = 'R'
"""

ORACLE_SQL["events_chi_square"] = """
    WITH cells AS (
        SELECT event_type,
               CASE WHEN CAST(round(value * 100) AS BIGINT) < 1000 THEN 'low'
                    WHEN CAST(round(value * 100) AS BIGINT) < 5000 THEN 'mid'
                    ELSE 'high' END AS bucket,
               CAST(COUNT(*) AS BIGINT) AS o
        FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
    ct AS (SELECT bucket, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
    tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells)
    SELECT SUM(pow(CAST(o AS DOUBLE)
                   - CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 2)
               / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE)))
               AS chi_square,
           (COUNT(DISTINCT cells.event_type) - 1)
             * (COUNT(DISTINCT cells.bucket) - 1) AS dof,
           CAST(ANY_VALUE(n) AS BIGINT) AS n
    FROM cells
    JOIN rt USING (event_type)
    JOIN ct USING (bucket)
    CROSS JOIN tot
"""

ORACLE_SQL["events_time_histogram"] = """
    SELECT CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hour,
           CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2
"""

ORACLE_SQL["events_user_set_ops"] = """
    WITH n AS (SELECT COUNT(*) AS n FROM events),
    a AS (SELECT DISTINCT user_id FROM events, n WHERE event_id < (6 * n.n) // 10),
    b AS (SELECT DISTINCT user_id FROM events, n WHERE event_id >= (6 * n.n) // 10)
    SELECT
      (SELECT COUNT(*) FROM (SELECT user_id FROM a INTERSECT SELECT user_id FROM b)) AS users_both,
      (SELECT COUNT(*) FROM (SELECT user_id FROM a EXCEPT SELECT user_id FROM b)) AS users_first_only,
      (SELECT COUNT(*) FROM (SELECT user_id FROM b EXCEPT SELECT user_id FROM a)) AS users_second_only
"""

ORACLE_SQL["events_column_lww"] = """
    SELECT user_id,
           arg_max(CASE WHEN event_type = 'purchase'
                        THEN CAST(round(value * 100) AS BIGINT) END, event_id)
               FILTER (WHERE event_type = 'purchase') AS last_purchase_cents,
           arg_max(CASE WHEN event_type = 'click'
                        THEN CAST(regexp_extract(props, '"k":\\s*(-?\\d+)', 1) AS BIGINT) END,
                   event_id)
               FILTER (WHERE event_type = 'click') AS last_click_k,
           CAST(MAX(event_id) AS BIGINT) AS event_id_last
    FROM events
    GROUP BY user_id
"""

ORACLE_SQL["events_ivm_group_sum"] = """
    WITH ranked AS (
      SELECT user_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS value_cents,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events
    ), lww AS (
      -- per-user LWW row = latest event; latest value < 5.0 is a tombstone
      SELECT * FROM ranked WHERE rn = 1 AND value >= 5.0
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(value_cents) AS BIGINT) AS sum_value_cents
    FROM lww
    GROUP BY event_type
"""

ORACLE_SQL["events_schema_evolution"] = """
    WITH n AS (SELECT COUNT(*) AS n FROM events),
    src AS (
      SELECT * FROM events, n
      WHERE event_id < n.n // 2
         OR (event_id >= n.n // 2 AND event_type = 'purchase' AND value >= 95)
    ),
    latest AS (
      SELECT user_id, event_id, event_type, value, n,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM src
    )
    SELECT user_id,
           CAST(event_id AS BIGINT) AS last_event_id,
           event_type AS last_event_type,
           CASE WHEN event_id >= n // 2
                THEN CAST(round(value * 100) AS BIGINT) END AS value_cents
    FROM latest WHERE rn = 1
"""


def _incremental_dedup_sql() -> str:
    """Incremental dedup mirror: shared band CTEs from _minhash_sql, then
    the two-stage removal — increment docs colliding with any corpus
    (doc_id < cut) band drop first, the rest apply the ordinary bucket
    rule among THEMSELVES (min-keep, bucket size 2..1000)."""
    base = _minhash_sql()
    head, _sep, _tail = base.partition("), buckets AS (")
    return (
        head
        + """), cut AS (SELECT COUNT(*) // 2 AS c FROM documents),
    corp AS (
      SELECT DISTINCT band, sig FROM bands, cut WHERE doc_id < cut.c
    ), inc AS (
      SELECT doc_id, band, sig FROM bands, cut WHERE doc_id >= cut.c
    ), corpus_removed AS (
      SELECT DISTINCT inc.doc_id
      FROM inc JOIN corp ON inc.band = corp.band AND inc.sig = corp.sig
    ), fresh AS (
      SELECT * FROM inc WHERE doc_id NOT IN (SELECT doc_id FROM corpus_removed)
    ), buckets AS (
      SELECT band, sig, min(doc_id) AS keep, count(*) AS n
      FROM fresh GROUP BY band, sig
    ), removed AS (
      SELECT DISTINCT f.doc_id
      FROM fresh f JOIN buckets k ON f.band = k.band AND f.sig = k.sig
      WHERE k.n BETWEEN 2 AND 1000 AND f.doc_id > k.keep
    )
    SELECT doc_id FROM documents, cut
    WHERE doc_id >= cut.c
      AND doc_id NOT IN (SELECT doc_id FROM corpus_removed)
      AND doc_id NOT IN (SELECT doc_id FROM removed)
    """
    )


ORACLE_SQL["docs_incremental_dedup"] = _incremental_dedup_sql()

# Deterministic greedy packing mirror: ROW_NUMBER orders docs within each
# 256-doc partition, then a recursive CTE walks the greedy budget rule
# (reset when acc + n > 2048; an oversized doc therefore sits alone).
ORACLE_SQL["docs_token_packing"] = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             doc_id // 256 AS pgroup,
             CAST(length(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents
      WHERE text IS NOT NULL AND trim(text) <> ''
    ), ord AS (
      SELECT doc_id, pgroup, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY pgroup ORDER BY doc_id) AS rn
      FROM toks
    ), walk AS (
      SELECT pgroup, rn, doc_id, n_tokens,
             n_tokens AS acc, CAST(0 AS BIGINT) AS pack_seq
      FROM ord WHERE rn = 1
      UNION ALL
      SELECT o.pgroup, o.rn, o.doc_id, o.n_tokens,
             CASE WHEN w.acc + o.n_tokens > 2048 THEN o.n_tokens
                  ELSE w.acc + o.n_tokens END,
             CASE WHEN w.acc + o.n_tokens > 2048 THEN w.pack_seq + 1
                  ELSE w.pack_seq END
      FROM walk w JOIN ord o ON o.pgroup = w.pgroup AND o.rn = w.rn + 1
    )
    SELECT doc_id, pgroup, pack_seq, n_tokens FROM walk
"""

ORACLE_SQL["orders_count_histogram"] = """
    WITH per_cust AS (
        SELECT c.c_custkey, COUNT(o.o_custkey) AS c_count
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM per_cust GROUP BY c_count
"""

ORACLE_SQL["parts_low_quantity_revenue"] = """
    WITH pa AS (
        SELECT l_partkey,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_cents,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)), 0)
                AS BIGINT) AS low_qty_revenue_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN pa ON l.l_partkey = pa.l_partkey
    WHERE CAST(round(l.l_quantity * 100) AS BIGINT) * 5 * pa.cnt
          < pa.sum_qty_cents
"""

ORACLE_SQL["parts_brand_promo_revenue"] = """
    SELECT CAST(COALESCE(SUM(
               CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
           ), 0) AS DOUBLE) / 10000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1  AND 15
           AND l.l_quantity BETWEEN 1.0  AND 11.0)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 5  AND 30
           AND l.l_quantity BETWEEN 10.0 AND 20.0)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 50
           AND l.l_quantity BETWEEN 20.0 AND 35.0)
"""

ORACLE_SQL["orders_priority_exists"] = """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o_orderpriority
"""

ORACLE_SQL["orders_large_volume"] = """
    WITH t AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_cents
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(round(l_quantity * 100) AS BIGINT)) > 15000
    )
    SELECT c.c_name, o.o_orderkey,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_cents,
           t.sum_qty_cents
    FROM orders o
    JOIN t ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
"""

ORACLE_SQL["q10_returned_revenue"] = """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_fp
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue_fp DESC, c.c_custkey
    LIMIT 20
"""

ORACLE_SQL["q14_promo_revenue_share"] = """
    WITH t AS (
        SELECT CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS fp,
               p.p_type = 'PROMO' AS is_promo
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1996-07-01'
    )
    SELECT 100.0 * CAST(COALESCE(SUM(CASE WHEN is_promo THEN fp END), 0) AS DOUBLE)
               / CAST(SUM(fp) AS DOUBLE) AS promo_share_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM t
"""

ORACLE_SQL["q22_idle_balance"] = """
    WITH pos AS (
        SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
    )
    SELECT c.c_mktsegment AS segment,
           CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS total_bal_cents,
           CAST(COUNT(*) AS BIGINT) AS n_custs
    FROM customer c, pos
    WHERE CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.n > pos.s
      AND c.c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
    GROUP BY c.c_mktsegment
"""

ORACLE_SQL["q7_nation_volume"] = """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
                AS BIGINT) AS revenue_fp,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
      AND n1.n_nationkey <> n2.n_nationkey
    GROUP BY n1.n_name, n2.n_name
"""

ORACLE_SQL["parts_cheapest_per_type"] = """
    WITH ranked AS (
        SELECT p_type,
               CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents,
               p_partkey,
               ROW_NUMBER() OVER (
                   PARTITION BY p_type
                   ORDER BY CAST(round(p_retailprice * 100) AS BIGINT), p_partkey
               ) AS rn
        FROM part
    )
    SELECT p_type, price_cents, CAST(p_partkey AS BIGINT) AS p_partkey
    FROM ranked WHERE rn = 1
"""
