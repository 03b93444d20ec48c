"""Oracle staging and graduation.

``FUTURE_ORACLES`` holds DuckDB oracle twins for rows-only queries,
drafted and HASH-TESTED in advance (tests/test_future_oracles.py runs
them through the same compare harness as the driver gate) but not yet
registered in registry.ORACLE — an oracle-backed query must occupy a
DRIVER_PRIORITY window slot (tests/test_plans.py window invariants),
so a full window defers the flip to the next round.

``GRADUATED_ORACLES`` holds the SQL of entries that HAVE been flipped
into their ``@query(oracle=...)`` declarations (the round-5 staging
batch graduated in round 6). The text lives here rather than inline so
the large SQL blocks don't swamp the query modules; each declaration
references its entry by name, and tests/test_future_oracles.py pins
that every graduated name is registered with exactly this SQL.
"""

from __future__ import annotations

# 40-bit md5 fingerprint of null-tagged, unit-separated columns —
# byte-for-byte the operators/validate.row_fingerprint definition.
_FP_DOC = """CAST(('0x' || substr(md5(concat_ws(chr(31),
        coalesce('v:' || CAST(lang AS VARCHAR), 'null'),
        coalesce('v:' || CAST(n_chars AS VARCHAR), 'null'))), 1, 10)) AS BIGINT)"""

_FP_CS = """CAST(('0x' || substr(md5(concat_ws(chr(31),
        coalesce('v:' || CAST(doc_id AS VARCHAR), 'null'),
        coalesce('v:' || CAST(source AS VARCHAR), 'null'),
        coalesce('v:' || CAST(n_chars AS VARCHAR), 'null'))), 1, 10)) AS BIGINT)"""

# Round-8 staging area: drafted-and-proven twins awaiting a window
# slot (the round-7 batch below graduated; VERDICT r6 item 5 names
# the next tranche whose semantics are deterministic enough for an
# exact DuckDB replay — fixed-iteration PageRank, recall vs an exact
# brute-force baseline given fixed candidates, and md5-arithmetic
# fingerprints, the house cross-engine hashing idiom).
FUTURE_ORACLES: dict[str, str] = {}

GRADUATED_ORACLES: dict[str, str] = {
    # ---- round-7 graduation batch (staged + hash-proven in round 6:
    # the four deterministic streaming queries — the micro-batch
    # engine's answers equal a batch fold DuckDB can replay: dedup
    # restores the pre-doubling corpus, running totals are a grouped
    # aggregate, top-k is a rank window, and the EWMA recursion is a
    # list_reduce fold in the identical (ts, event_id) order with the
    # identical `0.3*x + (1.0-0.3)*acc` IEEE arithmetic — and the
    # snapshot time-travel summary, whose versions 1 and 2 are pure
    # functions of the documents table) ----
    "q_stream_dedup": """
    SELECT event_id, user_id, event_type
    FROM events
    ORDER BY event_id
    """,
    "q_stream_running_totals": """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 4)     AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    "q_stream_topk": """
    WITH r AS (
        SELECT event_type, event_id, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY value DESC, event_id) AS rank
        FROM events
    )
    SELECT event_type, CAST(rank AS BIGINT) AS rank, event_id,
           round(value, 4) AS value
    FROM r WHERE rank <= 5
    ORDER BY event_type, rank
    """,
    "q_stream_ewma": """
    WITH ord AS (
        SELECT user_id, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS i
        FROM events
    ),
    l AS (
        SELECT user_id,
               list(value ORDER BY i)    AS vs,
               list(event_id ORDER BY i) AS ids
        FROM ord GROUP BY user_id
    )
    SELECT user_id, ids[i] AS event_id,
           CAST(floor(list_reduce(vs[1:i],
                    (acc, x) -> 0.3 * x + (1.0 - 0.3) * acc) * 10000)
                AS BIGINT) AS ewma_e4
    FROM l, unnest(generate_series(1, len(vs))) AS t(i)
    ORDER BY user_id, event_id
    """,
    "q_snapshot_timetravel": """
    SELECT CAST(1 AS INT) AS version,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM documents
    UNION ALL
    SELECT CAST(2 AS INT), CAST(count(*) AS BIGINT),
           CAST(sum(n_chars) AS BIGINT)
    FROM documents WHERE n_chars >= 200
    ORDER BY version
    """,
    # ---- round-6 graduation batch (staged + hash-proven in round 5) ----
    "q_autocorr": """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY event_type, d
    ),
    shifted AS (
        SELECT event_type, lag, d + to_days(CAST(lag AS INT)) AS d,
               n AS n_lag
        FROM daily, unnest([1, 2, 3, 4, 5, 6, 7]) AS t(lag)
    )
    SELECT a.event_type, CAST(s.lag AS INT) AS lag,
           CAST(count(*) AS BIGINT)     AS n_days,
           round(corr(a.n, s.n_lag) + 0.0, 4) AS acf
    FROM daily a JOIN shifted s
      ON a.event_type = s.event_type AND a.d = s.d
    GROUP BY a.event_type, lag
    ORDER BY a.event_type, lag
    """,
    "q_cusum_changepoint": """
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n
        FROM events GROUP BY event_type, d
    ),
    stats AS (
        SELECT event_type, avg(n) AS mean_n, count(*) AS n_days
        FROM daily GROUP BY event_type
    ),
    cs AS (
        SELECT daily.event_type, d, mean_n, n_days,
               sum(n - mean_n) OVER (
                   PARTITION BY daily.event_type ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cusum
        FROM daily JOIN stats USING (event_type)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY event_type ORDER BY abs(cusum) DESC, d
               ) AS rk
        FROM cs
    )
    SELECT event_type,
           strftime(d, '%Y-%m-%d')     AS change_day,
           round(abs(cusum), 4)        AS max_abs_cusum,
           round(mean_n, 4)            AS mean_n,
           CAST(n_days AS BIGINT)      AS n_days
    FROM ranked WHERE rk = 1
    ORDER BY event_type
    """,
    "q_feature_hash": """
    WITH toks AS (
        SELECT source, w
        FROM (SELECT source,
                     unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
              FROM documents)
        WHERE w <> ''
    )
    SELECT source,
           CAST(CAST(('0x' || substr(md5(w), 1, 10)) AS BIGINT) % 64 AS INT)
               AS bucket,
           CAST(count(*) AS BIGINT)          AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_distinct_words
    FROM toks
    GROUP BY source, bucket
    ORDER BY source, bucket
    """,
    # regenerates mapreduce_llm_spark/pysource.py's generator from the
    # same integer arithmetic — an independent engine proving the
    # custom Python data source honors its contract
    "q_custom_source": """
    WITH g AS (SELECT unnest(generate_series(0, 19999)) AS i),
    r AS (SELECT i, ((i * 2654435761) & 2147483647) AS h FROM g),
    e AS (
        SELECT h % 997 AS user_id,
               ['view', 'click', 'purchase', 'signup', 'error'][(h % 5) + 1]
                   AS event_type,
               (h % 100000) / 100.0 AS value
        FROM r
    )
    SELECT CAST(user_id % 10 AS INT) AS user_bucket,
           CAST(count(*) AS BIGINT)  AS n_events,
           round(sum(value), 2)      AS sum_value
    FROM e
    WHERE event_type = 'purchase'
    GROUP BY user_bucket
    ORDER BY user_bucket
    """,
    "q_zipf_slope": """
    WITH freqs AS (
        SELECT source, w, count(*) AS n
        FROM (SELECT source,
                     unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
              FROM documents)
        WHERE w <> ''
        GROUP BY source, w
    ),
    ranked AS (
        SELECT source, n,
               row_number() OVER (
                   PARTITION BY source ORDER BY n DESC, w) AS rk
        FROM freqs QUALIFY rk <= 100
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_words,
           round(regr_slope(ln(n), ln(rk)) + 0.0, 4) AS zipf_slope,
           round(regr_r2(ln(n), ln(rk)) + 0.0, 4)    AS fit_r2
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
    "q_ttr_heaps": """
    WITH toks AS (
        SELECT source, w
        FROM (SELECT source,
                     unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
              FROM documents)
        WHERE w <> ''
    )
    SELECT source,
           CAST(count(*) AS BIGINT)          AS n_tokens,
           CAST(count(DISTINCT w) AS BIGINT) AS n_types,
           round(count(DISTINCT w) / CAST(count(*) AS DOUBLE), 4) AS ttr,
           round(ln(CAST(count(DISTINCT w) AS DOUBLE))
                 / ln(CAST(count(*) AS DOUBLE)), 4) AS heaps_beta
    FROM toks
    GROUP BY source
    ORDER BY source
    """,
    "q_ngram_novelty": """
    WITH grams AS (
        SELECT DISTINCT source, gram
        FROM (
            SELECT source,
                   unnest([ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                           FOR i IN generate_series(1, greatest(len(ws) - 2, 0))])
                       AS gram
            FROM (SELECT source,
                         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                                     w -> w <> '') AS ws
                  FROM documents)
        )
    ),
    spread AS (
        SELECT gram, count(*) AS n_sources FROM grams GROUP BY gram
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum((n_sources = 1)::INT) AS BIGINT) AS n_exclusive,
           round(sum((n_sources = 1)::INT) / CAST(count(*) AS DOUBLE), 4)
               AS novelty_rate
    FROM grams JOIN spread USING (gram)
    GROUP BY source
    ORDER BY source
    """,
    "q_heavy_hitters": """
    WITH toks AS (
        SELECT w
        FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS w
              FROM documents)
        WHERE w <> ''
    )
    SELECT w,
           CAST(count(*) AS BIGINT) AS exact_n,
           TRUE AS containment_ok,
           TRUE AS bounds_ok
    FROM toks
    GROUP BY w
    ORDER BY exact_n DESC, w
    LIMIT 10
    """,
    "q_seq_pattern": """
    WITH capped AS (
        SELECT user_id, event_type, ts, event_id,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS rk
        FROM events QUALIFY rk <= 1000
    ),
    seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM capped GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS INT) AS seq_len,
           regexp_matches(seq, 'v.*c.*p') AS has_funnel,
           CAST((length(seq) - length(replace(seq, 'vc', ''))) / 2 AS INT)
               AS n_direct_vc
    FROM seqs
    ORDER BY user_id
    """,
    "q_balanced_sample": """
    SELECT vec_id, label, CAST(rk AS INT) AS rk
    FROM (
        SELECT vec_id, label,
               row_number() OVER (
                   PARTITION BY label
                   ORDER BY md5('bs:' || CAST(vec_id AS VARCHAR)), vec_id
               ) AS rk
        FROM embeddings
    ) WHERE rk <= 20
    ORDER BY label, rk
    """,
    "q_group_checksum": f"""
    WITH f AS (
        SELECT lang, {_FP_CS} AS fp
        FROM documents
    )
    SELECT lang,
           CAST(sum(fp) AS BIGINT)  AS checksum,
           CAST(count(*) AS BIGINT) AS n_rows,
           TRUE AS stable_under_repartition
    FROM f GROUP BY lang ORDER BY lang
    """,
    "q_table_diff": f"""
    WITH v1 AS (SELECT doc_id, lang, n_chars FROM documents),
    v2 AS (
        SELECT doc_id, lang,
               CASE WHEN doc_id % 13 = 0 THEN n_chars + 1
                    ELSE n_chars END AS n_chars
        FROM documents WHERE doc_id % 17 <> 0
        UNION ALL
        SELECT doc_id + 10000000, lang, n_chars
        FROM documents WHERE doc_id % 29 = 0
    ),
    f1 AS (SELECT doc_id, {_FP_DOC} AS fp FROM v1),
    f2 AS (SELECT doc_id, {_FP_DOC} AS fp FROM v2),
    d AS (
        SELECT doc_id,
               CASE WHEN f1.fp IS NULL THEN 'added'
                    WHEN f2.fp IS NULL THEN 'removed'
                    WHEN f1.fp = f2.fp THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM f1 FULL OUTER JOIN f2 USING (doc_id)
    )
    SELECT status,
           CAST(count(*) AS BIGINT)                    AS n_keys,
           CAST(sum(doc_id % 1099511627776) AS BIGINT) AS key_checksum
    FROM d GROUP BY status ORDER BY status
    """,
    # scale_to_bits / z_value in SQL: identical IEEE double ops for the
    # grid mapping (cast-first subtraction, same divisor epsilon, same
    # multiply order), bit interleave via list comprehension.
    "q_zorder_skipping": """
    WITH b AS (
        SELECT min(o_custkey) AS ck_lo, max(o_custkey) AS ck_hi,
               min(CAST(o_orderdate AS DATE)) AS d_lo,
               max(CAST(o_orderdate AS DATE)) AS d_hi
        FROM orders
    ),
    g AS (
        SELECT
            greatest(0, least(16383, CAST(floor(
                (CAST(o_custkey AS DOUBLE) - ck_lo)
                / (ck_hi - ck_lo + 1e-300) * 16384) AS BIGINT))) AS xb,
            greatest(0, least(16383, CAST(floor(
                (CAST(date_diff('day', d_lo, CAST(o_orderdate AS DATE)) AS DOUBLE) - 0)
                / (date_diff('day', d_lo, d_hi) - 0 + 1e-300) * 16384) AS BIGINT))) AS yb
        FROM orders, b
    ),
    gz AS (
        SELECT xb, yb,
               CAST(list_sum([
                   ((xb >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i))
                   + ((yb >> i) & 1) * (CAST(1 AS BIGINT) << (2 * i + 1))
                   FOR i IN generate_series(0, 13)]) AS BIGINT) AS z
        FROM g
    ),
    fp AS (
        SELECT 'zorder' AS layout, z >> 22 AS file_id,
               min(xb) AS x_min, max(xb) AS x_max,
               min(yb) AS y_min, max(yb) AS y_max,
               count(*) AS n_rows
        FROM gz GROUP BY 1, 2
        UNION ALL
        SELECT 'linear', xb >> 8,
               min(xb), max(xb), min(yb), max(yb), count(*)
        FROM gz GROUP BY 1, 2
    ),
    probes AS (
        SELECT * FROM (VALUES
            ('date_slice', 0, 16383, 6553, 7372),
            ('custkey_slice', 6553, 7372, 0, 16383),
            ('square', 4096, 5734, 4096, 5734)
        ) AS t(probe, x_lo, x_hi, y_lo, y_hi)
    ),
    touched AS (
        SELECT probe, layout,
               CAST(sum(CASE WHEN x_max >= x_lo AND x_min <= x_hi
                              AND y_max >= y_lo AND y_min <= y_hi
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_files_touched,
               CAST(count(*) AS BIGINT)               AS n_files,
               CAST(sum(CASE WHEN x_max >= x_lo AND x_min <= x_hi
                              AND y_max >= y_lo AND y_min <= y_hi
                        THEN n_rows ELSE 0 END) AS BIGINT)
                   AS n_rows_in_touched
        FROM fp, probes
        GROUP BY probe, layout
    ),
    matches AS (
        SELECT probe, CAST(count(*) AS BIGINT) AS n_rows_match
        FROM gz, probes
        WHERE xb BETWEEN x_lo AND x_hi AND yb BETWEEN y_lo AND y_hi
        GROUP BY probe
    )
    SELECT t.probe, t.layout, t.n_files_touched, t.n_files,
           t.n_rows_in_touched,
           coalesce(m.n_rows_match, 0) AS n_rows_match
    FROM touched t LEFT JOIN matches m ON t.probe = m.probe
    ORDER BY t.probe, t.layout
    """,
}
