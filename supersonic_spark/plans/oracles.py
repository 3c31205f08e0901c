"""DuckDB oracle SQL, one entry per `queries()` key in __spark_entry__.py.

Conventions keeping Spark and DuckDB hash-identical:
- money/value sums via exact integer cents: CAST(round(x*100,0) AS BIGINT)
- DuckDB SUM(BIGINT) returns HUGEINT -> always CAST(... AS BIGINT)
- doubles rounded to 4 decimals on both sides
- portable hash = ('0x' || substr(md5(x),1,15))::BIGINT on DuckDB,
  conv(substring(md5(x),1,15),16,10)::long on Spark (verified identical)
Queries with no oracle entry (codec_selection_report) get the driver's
rows-only check.
"""

_CENTS = "CAST(round({col}*100, 0) AS BIGINT)"
_H = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

ORACLES: dict[str, str] = {}

ORACLES["scan_project"] = """
SELECT l_orderkey AS orderkey, l_partkey AS partkey, l_quantity AS qty
FROM lineitem
"""

ORACLES["compute_expr"] = """
SELECT l_orderkey, l_linenumber,
       CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT) AS disc_price_cents,
       CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100, 0) AS BIGINT) AS charge_cents,
       (CAST(l_quantity AS BIGINT) % 2 = 0) AS qty_even
FROM lineitem
"""

ORACLES["filter_null_semantics"] = """
SELECT event_id, et FROM (
  SELECT event_id, nullif(event_type, 'error') AS et FROM events)
WHERE et > 'purchase'
"""

ORACLES["filter_in_list"] = """
SELECT o_orderkey, o_orderpriority FROM orders
WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
"""

ORACLES["generate_sequence"] = """
SELECT i AS id, (i*7) % 13 AS m13, i*i AS sq FROM range(0, 10000) t(i)
"""

ORACLES["hash_join_inner"] = """
SELECT l.l_orderkey AS o_orderkey, l.l_linenumber, o.o_orderstatus,
       CAST(round(o.o_totalprice*100, 0) AS BIGINT) AS totalprice_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

ORACLES["hash_join_left_outer"] = """
SELECT o.o_orderkey, c.c_name, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""

ORACLES["broadcast_join_unique"] = """
SELECT c.c_custkey, n.n_name
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
"""

ORACLES["foreign_filter_semi"] = """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
"""

ORACLES["anti_join_orphans"] = """
SELECT o_orderkey, o_orderstatus FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
"""

ORACLES["rowid_merge_join"] = """
WITH rid AS (
  SELECT n_name, row_number() OVER (ORDER BY n_nationkey) - 1 AS _rowid
  FROM nation)
SELECT c.c_custkey, r.n_name
FROM customer c JOIN rid r ON c.c_nationkey = r._rowid
"""

ORACLES["lookup_index_multimatch"] = """
SELECT p.p_partkey, p.p_brand, count(*) AS n_matches,
       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
GROUP BY p.p_partkey, p.p_brand
"""

ORACLES["coalesce_zip"] = """
WITH l AS (SELECT r_regionkey, r_name,
                  row_number() OVER (ORDER BY r_regionkey, r_name) AS _pos
           FROM region),
     r AS (SELECT s_suppkey, s_name,
                  row_number() OVER (ORDER BY s_suppkey, s_name) AS _pos
           FROM (SELECT s_suppkey, s_name FROM supplier
                 ORDER BY s_suppkey LIMIT 5))
SELECT l.r_regionkey, l.r_name, r.s_suppkey, r.s_name
FROM l JOIN r USING (_pos)
"""

ORACLES["group_agg_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT) AS sum_base_cents,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""

ORACLES["agg_min_max"] = """
SELECT event_type,
       CAST(MIN(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS min_cents,
       CAST(MAX(CAST(round(value*100,0) AS BIGINT)) AS BIGINT) AS max_cents,
       MIN(ts) AS min_ts, CAST(MAX(user_id) AS BIGINT) AS max_user
FROM events GROUP BY event_type
"""

ORACLES["agg_distinct"] = """
SELECT o_orderstatus,
       count(DISTINCT o_custkey) AS n_cust,
       count(DISTINCT o_orderpriority) AS n_prio,
       count(*) AS n_rows
FROM orders GROUP BY o_orderstatus
"""

ORACLES["agg_concat"] = """
SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names
FROM nation GROUP BY n_regionkey
"""

ORACLES["agg_first_last"] = """
SELECT user_id, arg_min(event_type, event_id) AS first_type,
       arg_max(event_type, event_id) AS last_type, count(*) AS n
FROM events GROUP BY user_id
"""

ORACLES["scalar_agg_empty"] = """
SELECT count(*) AS n,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
       MAX(l_shipdate) AS mx
FROM lineitem WHERE l_quantity < -1
"""

ORACLES["agg_all_null_group"] = """
SELECT l_returnflag,
       SUM(nullif(l_discount, l_discount)) AS sum_all_null,
       MAX(nullif(l_discount, l_discount)) AS max_all_null,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["group_agg_with_limit"] = """
WITH agg AS (
  SELECT CAST(o_custkey AS VARCHAR) AS custkey,
         CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS agg_val,
         count(*) AS n_rows
  FROM orders GROUP BY 1),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY agg_val DESC, custkey ASC) AS rk
  FROM agg)
SELECT custkey, agg_val, n_rows FROM ranked WHERE rk <= 5
UNION ALL
SELECT '__other__' AS custkey, CAST(SUM(agg_val) AS BIGINT) AS agg_val,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows
FROM ranked WHERE rk > 5 HAVING count(*) > 0
"""

ORACLES["multi_distinct_rewrite"] = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS d_parts,
       count(DISTINCT l_suppkey) AS d_supps,
       count(DISTINCT l_orderkey) AS d_orders
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["avg_composed"] = """
SELECT o_orderpriority, sum_cents, n, round(sum_cents / n, 4) AS avg_cents
FROM (
  SELECT o_orderpriority,
         CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents,
         count(*) AS n
  FROM orders GROUP BY o_orderpriority)
"""

ORACLES["sort_topk"] = """
SELECT o_orderkey, CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey ASC LIMIT 100
"""

ORACLES["sort_case_insensitive"] = """
SELECT p_partkey, lower(p_type) AS p_type_lower FROM part
ORDER BY lower(p_type) ASC, p_partkey ASC LIMIT 50
"""

ORACLES["sort_nulls_first"] = """
SELECT event_id, v FROM (
  SELECT event_id, nullif(event_type, 'view') AS v FROM events)
ORDER BY v ASC NULLS FIRST, event_id ASC LIMIT 150
"""

ORACLES["limit_offset"] = """
SELECT o_orderkey, o_orderstatus FROM orders
ORDER BY o_orderkey LIMIT 100 OFFSET 200
"""

ORACLES["merge_union_all"] = """
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '1-URGENT'
UNION ALL
SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderpriority = '5-LOW'
"""

ORACLES["distinct"] = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""

ORACLES["intersect_nations"] = """
SELECT c_nationkey AS nk FROM customer
INTERSECT
SELECT s_nationkey AS nk FROM supplier
"""

ORACLES["except_nations"] = """
SELECT c_nationkey AS nk FROM customer
EXCEPT
SELECT s_nationkey AS nk FROM supplier
"""

ORACLES["expr_math"] = """
SELECT l_orderkey,
       round(abs(-l_quantity), 4) AS abs_q,
       round(sqrt(l_quantity), 4) AS sqrt_q,
       round(exp(l_quantity/100), 4) AS exp_q,
       round(ln(l_quantity+1), 4) AS ln_q,
       round(log10(l_quantity+1), 4) AS log10_q,
       round(pow(l_quantity, 2), 4) AS pow_q,
       CAST(ceil(l_quantity/7) AS BIGINT) AS ceil_q,
       CAST(floor(l_quantity/7) AS BIGINT) AS floor_q,
       round(sin(l_quantity), 4) AS sin_q,
       CAST(l_quantity AS BIGINT) % 5 AS mod_q
FROM lineitem WHERE l_linenumber = 1
"""

ORACLES["expr_string"] = """
SELECT c_custkey,
       upper(c_mktsegment) AS seg_upper,
       lower(c_name) AS name_lower,
       CAST(length(c_name) AS INTEGER) AS name_len,
       substring(c_name, 10, 5) AS name_sub,
       c_mktsegment || '|' || c_name AS joined,
       CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos,
       replace(c_name, 'Customer', 'Cust') AS name_repl,
       'pad' AS trimmed,
       contains(c_name, '0') AS has_zero
FROM customer
"""

ORACLES["expr_regexp"] = """
SELECT c_custkey,
       regexp_extract(c_name, '([0-9]+)', 1) AS digits,
       regexp_replace(c_name, '[0-9]', '#', 'g') AS masked
FROM customer WHERE regexp_matches(c_name, '[0-9]{2,}')
"""

ORACLES["expr_regexp2"] = """
SELECT c_custkey,
       regexp_full_match(c_name, 'Customer#[0-9]+') AS full_match,
       regexp_replace(c_name, '^Customer#0*([0-9]+)$', 'id=\\1') AS rewritten,
       ((c_acctbal > 0) <> regexp_matches(c_name, '[13579]$')) AS xor_pm,
       ((c_acctbal > 0) AND NOT regexp_matches(c_name, '[13579]$')) AS and_not
FROM customer
"""

ORACLES["expr_datetime"] = """
SELECT event_id,
       CAST(year(ts) AS INTEGER) AS y,
       CAST(month(ts) AS INTEGER) AS mo,
       CAST(day(ts) AS INTEGER) AS d,
       CAST(hour(ts) AS INTEGER) AS h,
       CAST(minute(ts) AS INTEGER) AS mi,
       CAST(second(ts) AS INTEGER) AS s,
       CAST(quarter(ts) AS INTEGER) AS qtr,
       CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       strftime(ts, '%Y-%m-%d %H') AS fmt,
       ts + INTERVAL 30 DAY AS plus30d
FROM events
"""

ORACLES["expr_case_cast"] = """
SELECT o_orderkey,
       CASE WHEN o_orderpriority = '1-URGENT' THEN 'hot'
            WHEN o_orderpriority = '5-LOW' THEN 'cold'
            ELSE 'warm' END AS heat,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(o_orderkey AS DOUBLE) AS key_dbl,
       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_filled,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
FROM orders
"""

ORACLES["expr_bitwise"] = """
SELECT o_orderkey,
       o_orderkey & 255 AS band,
       o_orderkey | 16 AS bor,
       xor(o_orderkey, 85) AS bxor,
       o_orderkey << 2 AS shl,
       o_orderkey >> 1 AS shr
FROM orders WHERE o_orderkey < 500
"""

ORACLES["expr_hashing"] = f"""
SELECT c_custkey,
       {_H.format(x='c_name')} AS name_hash,
       sha256(c_name) AS sha
FROM customer
"""

_W = "PARTITION BY user_id ORDER BY ts, event_id"
_WR = _W + " ROWS UNBOUNDED PRECEDING"

ORACLES["stateful_changed"] = f"""
WITH f AS (
  SELECT user_id,
         CASE WHEN lag(event_type) OVER ({_W}) IS NULL
                OR event_type <> lag(event_type) OVER ({_W})
              THEN 1 ELSE 0 END AS chg
  FROM events)
SELECT user_id, CAST(SUM(chg) AS BIGINT) AS n_runs, count(*) AS n_events
FROM f GROUP BY user_id
"""

ORACLES["stateful_running_sum"] = f"""
SELECT event_id,
       CAST(SUM(CAST(round(value*100,0) AS BIGINT)) OVER ({_WR}) AS BIGINT)
         AS rsum_cents
FROM events
"""

ORACLES["stateful_smudge"] = f"""
SELECT event_id,
       last_value(CASE WHEN event_type <> 'error'
                       THEN CAST(round(value*100,0) AS BIGINT) END
                  IGNORE NULLS) OVER ({_WR}) AS locf_cents
FROM events
"""

ORACLES["stateful_running_min_flush"] = f"""
WITH s AS (
  SELECT event_id, user_id, ts,
         CAST(round(value*100,0) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           OVER ({_WR}) AS session
  FROM events)
SELECT event_id,
       CAST(MIN(cents) OVER (PARTITION BY user_id, session
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rmin_cents
FROM s
"""

ORACLES["stateful_smudge_if"] = f"""
SELECT event_id,
       CASE WHEN event_type = 'error'
            THEN last_value(CASE WHEN NOT (event_type = 'error')
                                 THEN CAST(round(value*100,0) AS BIGINT) END
                            IGNORE NULLS) OVER ({_WR})
            ELSE CAST(round(value*100,0) AS BIGINT) END AS v_cents
FROM events
"""

ORACLES["window_rank"] = f"""
SELECT event_id,
       CAST(row_number() OVER ({_W}) AS INTEGER) AS rn,
       CAST(rank() OVER (PARTITION BY user_id ORDER BY event_type) AS INTEGER) AS rk,
       lag(event_type) OVER ({_W}) AS prev_type,
       lead(event_id) OVER ({_W}) AS next_id
FROM events
"""

ORACLES["dedup_exact"] = f"""
SELECT {_H.format(x='text')} AS content_hash,
       CAST(MIN(doc_id) AS BIGINT) AS rep_id, count(*) AS n_dups
FROM documents GROUP BY 1
"""

ORACLES["dedup_minhash_sig"] = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents WHERE doc_id < 50),
shingles AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] AS shingle
  FROM toks, UNNEST(generate_series(1, len(t)-1)) AS u(i)),
hashed AS (
  SELECT doc_id, k.i AS i,
         {_H.format(x="shingle || '#' || k.i")} AS h
  FROM shingles, UNNEST(generate_series(0, 7)) AS k(i))
SELECT doc_id, CAST(i AS INTEGER) AS i, CAST(MIN(h) AS BIGINT) AS minhash
FROM hashed GROUP BY doc_id, i
"""

ORACLES["dedup_simhash"] = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
  FROM documents WHERE doc_id < 100),
u AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(t) AS tok FROM toks)),
h AS (SELECT doc_id, {_H.format(x='tok')} AS h FROM u),
votes AS (
  SELECT doc_id, b.bit AS bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, UNNEST(generate_series(0, 59)) AS b(bit)
  GROUP BY doc_id, b.bit)
SELECT doc_id,
       CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END)
            AS BIGINT) AS simhash
FROM votes GROUP BY doc_id
"""

ORACLES["ngram_jaccard"] = """
WITH g AS (
  SELECT DISTINCT doc_id, source, tok AS g FROM (
    SELECT doc_id, source,
           unnest(string_split_regex(trim(text), '\\s+')) AS tok
    FROM documents)),
sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
hot AS (SELECT g, source FROM g GROUP BY g, source HAVING count(*) > 64),
gc AS (SELECT doc_id, source, g.g AS g FROM g
       WHERE NOT EXISTS (SELECT 1 FROM hot h
                         WHERE h.g = g.g AND h.source = g.source)),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM gc a JOIN gc b ON a.g = b.g AND a.source = b.source
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(n_inter / (sa.sz + sb.sz - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 4) >= 0.5
"""

ORACLES["pack_sequences"] = """
WITH t AS (
  SELECT source, doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END
              AS INTEGER) AS n_tokens
  FROM documents)
SELECT source, doc_id, n_tokens,
       CAST(floor(coalesce(SUM(n_tokens) OVER (
              PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            / 500) AS BIGINT) AS bin_id
FROM t
"""

ORACLES["mix_sources"] = f"""
SELECT doc_id, source FROM documents
WHERE (source = 'src0'
       AND {_H.format(x="source || '#' || doc_id")} % 10000 < 10000)
   OR (source = 'src1'
       AND {_H.format(x="source || '#' || doc_id")} % 10000 < 5000)
   OR (source = 'src2'
       AND {_H.format(x="source || '#' || doc_id")} % 10000 < 2500)
"""

ORACLES["sample_per_group"] = f"""
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {_H.format(x="source || '#' || doc_id")} ASC,
                    doc_id ASC) AS rk
  FROM documents)
WHERE rk <= 20
"""

ORACLES["redact_pii"] = """
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>',
             'g'),
           '[0-9a-fA-F]{16,}', '<HEX>', 'g'),
         '[0-9][0-9 ()+-]{6,}[0-9]', '<NUM>', 'g') AS redacted
FROM documents
"""

ORACLES["token_rarity"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE length(trim(text)) > 0),
freqs AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok),
tot AS (SELECT CAST(SUM(n_tok) AS BIGINT) AS n_total FROM freqs)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(length(bin(n_total // n_tok))) AS BIGINT) AS rarity_sum,
       CAST((CAST(SUM(length(bin(n_total // n_tok))) AS BIGINT) * 100)
            // count(*) AS BIGINT) AS avg_rarity_x100
FROM toks JOIN freqs USING (tok) CROSS JOIN tot
GROUP BY doc_id
"""

ORACLES["text_token_count"] = """
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END
            AS INTEGER) AS n_tokens
FROM documents WHERE length(text) > 0
"""

ORACLES["text_quality"] = """
SELECT doc_id,
       round(0.4*len_band + 0.4*alpha_ratio + 0.2*tok_band, 4) AS quality
FROM (
  SELECT doc_id,
    CASE WHEN length(text) BETWEEN 20 AND 4000 THEN 1.0 ELSE 0.3 END AS len_band,
    CASE WHEN length(text) > 0
         THEN length(regexp_replace(text, '[^A-Za-z]', '', 'g')) / length(text)
         ELSE 0.0 END AS alpha_ratio,
    CASE WHEN ntok > 0 AND length(text)/ntok BETWEEN 2.5 AND 12.0
         THEN 1.0 ELSE 0.5 END AS tok_band
  FROM (
    SELECT doc_id, text,
           CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\\s+')) END AS ntok
    FROM documents))
"""

_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "se", "del", "las"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "zu"],
}
_MK = {k: "[" + ", ".join(f"'{m}'" for m in v) + "]" for k, v in _MARKERS.items()}

ORACLES["text_langid"] = f"""
WITH s AS (
  SELECT doc_id,
         len(list_intersect(toks, {_MK['en']})) AS s_en,
         len(list_intersect(toks, {_MK['es']})) AS s_es,
         len(list_intersect(toks, {_MK['de']})) AS s_de
  FROM (
    SELECT doc_id,
           list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS toks
    FROM documents))
SELECT doc_id,
       CASE WHEN greatest(s_en, s_es, s_de) <= 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_es, s_de) THEN 'en'
            WHEN s_es = greatest(s_en, s_es, s_de) THEN 'es'
            ELSE 'de' END AS lang_guess
FROM s
"""

ORACLES["doc_fingerprint"] = f"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
                             '\\s+', ' ', 'g')) AS norm
  FROM documents)
SELECT {_H.format(x='norm')} AS fp, CAST(MIN(doc_id) AS BIGINT) AS rep_id,
       count(*) AS n
FROM n GROUP BY 1
"""

# capstone curation funnel: composes the text_quality, text_langid,
# dedup_exact and mix_sources oracle logic into one statement
ORACLES["curate_corpus"] = f"""
WITH q AS ({{quality}}),
lg AS ({{langid}}),
f AS (
  SELECT d.doc_id, d.source, d.text, q.quality
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN lg ON lg.doc_id = d.doc_id
  WHERE q.quality >= 0.5 AND lg.lang_guess = 'en'),
reps AS (
  SELECT MIN(doc_id) AS doc_id
  FROM f GROUP BY {_H.format(x='text')})
SELECT f.doc_id, f.source, f.quality
FROM f JOIN reps ON reps.doc_id = f.doc_id
WHERE {_H.format(x="f.source || '#' || f.doc_id")} % 10000 < 8000
"""
ORACLES["curate_corpus"] = ORACLES["curate_corpus"].format(
    quality=ORACLES["text_quality"].strip().rstrip(";")
    .replace("WHERE length(text) > 0", ""),
    langid=ORACLES["text_langid"])

ORACLES["ann_cosine_threshold"] = """
SELECT vec_id,
       round(list_cosine_similarity(
         embedding::DOUBLE[],
         (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 4)
         AS cos_sim
FROM embeddings
WHERE round(list_cosine_similarity(
        embedding::DOUBLE[],
        (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 4) >= 0.15
"""

ORACLES["ann_topk"] = """
SELECT vec_id,
       round(list_cosine_similarity(
         embedding::DOUBLE[],
         (SELECT embedding FROM embeddings WHERE vec_id = 0)::DOUBLE[]), 4)
         AS cos_sim
FROM embeddings
ORDER BY cos_sim DESC, vec_id ASC LIMIT 20
"""

ORACLES["embedding_near_pairs"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 4) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.embedding::DOUBLE[],
                                   b.embedding::DOUBLE[]), 4) >= 0.3
"""

ORACLES["multimodal_binary_meta"] = """
SELECT doc_id,
       CAST(octet_length(text::BLOB) AS INTEGER) AS n_bytes,
       sha256(text) AS sha,
       substring(text, 1, 8) AS head
FROM documents
"""

ORACLES["codec_roundtrip_docs"] = """
SELECT doc_id, text, lang, source, n_chars FROM documents
"""

ORACLES["codec_projection_pushdown"] = """
SELECT doc_id, source FROM documents WHERE doc_id BETWEEN 100 AND 299
"""

ORACLES["asof_join"] = """
SELECT l.event_id, r.signup_cents
FROM (SELECT user_id, ts, event_id FROM events) l
ASOF LEFT JOIN (
  SELECT user_id, ts, CAST(round(value*100,0) AS BIGINT) AS signup_cents
  FROM events WHERE event_type = 'signup') r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""

ORACLES["range_join"] = """
WITH bands AS (
  SELECT CAST(i % 5 AS INTEGER) AS band_user,
         i * 50.0 AS lo, i * 50.0 + 60.0 AS hi, i AS band_id
  FROM range(0, 10) t(i)),
l AS (
  SELECT CAST(user_id % 5 AS INTEGER) AS band_user, event_id, value
  FROM events WHERE event_id < 2000)
SELECT l.event_id, b.band_id,
       CAST(round(l.value*100, 0) AS BIGINT) AS value_cents
FROM l JOIN bands b
  ON l.band_user = b.band_user AND l.value >= b.lo AND l.value <= b.hi
"""

ORACLES["range_join_bucketed"] = ORACLES["range_join"]

ORACLES["cube_agg"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

ORACLES["rollup_agg"] = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""

ORACLES["expr_datetime2"] = """
SELECT event_id,
       make_date(CAST(year(ts) AS INTEGER), CAST(month(ts) AS INTEGER),
                 CAST(day(ts) AS INTEGER)) AS d_made,
       CAST(isodow(ts) - 1 AS INTEGER) AS wd,
       CAST(dayofyear(ts) AS INTEGER) AS doy,
       last_day(CAST(ts AS DATE)) AS eom,
       CAST(date_trunc('month', ts) AS TIMESTAMP) AS month_start,
       CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2mo,
       ts + INTERVAL 45 MINUTE AS plus45m
FROM events
"""

ORACLES["expr_math2"] = """
SELECT event_id,
       CAST(sign(value - 50) AS INTEGER) AS sgn,
       CAST(floor(value) AS BIGINT) AS trunc_v,
       greatest(value, 50.0) AS gst,
       least(value, 50.0) AS lst,
       isnan(value) AS is_nan,
       round(atan2(value, 10.0), 4) AS at2,
       round(pi(), 4) AS pi4
FROM events
"""

ORACLES["expr_string2"] = """
SELECT c_custkey,
       right(c_name, 5) AS name_tail,
       left(c_name, 4) AS name_head,
       lpad(c_mktsegment, 12, '*') AS seg_lpad,
       rpad(c_mktsegment, 12, '*') AS seg_rpad,
       repeat(substring(c_name, 1, 2), 3) AS rep2,
       reverse(c_mktsegment) AS seg_rev,
       format('{:,}', CAST(round(c_acctbal*100,0) AS BIGINT)) AS bal_fmt
FROM customer
"""

# DuckDB has no hyperbolic functions — exp/ln identities, rounded to 4dp
ORACLES["expr_math3"] = """
SELECT event_id,
       round((exp(x) - exp(-x))/2, 4) AS sh,
       round((exp(x) + exp(-x))/2, 4) AS ch,
       round((exp(x) - exp(-x))/(exp(x) + exp(-x)), 4) AS th,
       round(ln(x + sqrt(x*x + 1)), 4) AS ash,
       round(ln((x+1) + sqrt((x+1)*(x+1) - 1)), 4) AS ach,
       round(0.5*ln((1 + x/20)/(1 - x/20)), 4) AS ath,
       isinf(inf_mix) AS is_inf,
       (isfinite(inf_mix) AND inf_mix <> 0) AS is_normal,
       round(degrees(x), 4) AS deg,
       round(radians(value), 4) AS rad,
       round(cbrt(value), 4) AS cbr
FROM (
  SELECT event_id, value, value/50 AS x,
         CASE WHEN value > 50 THEN exp(1000.0) ELSE value END AS inf_mix
  FROM events)
"""

ORACLES["expr_make_datetime"] = """
SELECT event_id,
       make_timestamp(CAST(year(ts) AS BIGINT), CAST(month(ts) AS BIGINT),
                      CAST(day(ts) AS BIGINT), CAST(hour(ts) AS BIGINT),
                      CAST(minute(ts) AS BIGINT),
                      CAST(floor(second(ts)) AS DOUBLE)) AS ts_made,
       ts AT TIME ZONE 'UTC' AT TIME ZONE 'Asia/Kolkata' AS ist_wall,
       ts AT TIME ZONE 'Asia/Kolkata' AT TIME ZONE 'UTC' AS utc_from_ist,
       CAST(date_diff('day', DATE '1995-01-01', CAST(ts AS DATE))
            AS INTEGER) AS days_since,
       CAST(weekofyear(ts) AS INTEGER) AS woy
FROM events
"""

ORACLES["jobspec_declarative"] = """
SELECT o_orderpriority, count(*) AS n,
       CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY sum_cents DESC LIMIT 3
"""

ORACLES["enum_roundtrip"] = """
WITH sym AS (
  SELECT s, CAST(row_number() OVER (ORDER BY s) - 1 AS INTEGER) AS code
  FROM (SELECT DISTINCT o_orderpriority AS s FROM orders
        WHERE o_orderpriority IS NOT NULL))
SELECT o.o_orderkey, sym.code AS prio_code, sym.s AS prio_sym
FROM orders o JOIN sym ON o.o_orderpriority = sym.s
"""

ORACLES["spy_observe"] = """
SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
WHERE l_quantity > 25
"""

ORACLES["splitter_reuse"] = """
WITH src AS (SELECT * FROM lineitem WHERE l_quantity > 10)
SELECT l_returnflag AS k, count(*) AS n, 'by_flag' AS branch
FROM src GROUP BY l_returnflag
UNION ALL
SELECT l_linestatus AS k, count(*) AS n, 'by_status' AS branch
FROM src GROUP BY l_linestatus
"""

ORACLES["udaf_grouped"] = """
SELECT l_returnflag,
       round(SUM(CAST(round(l_extendedprice*100,0) AS BIGINT)
                 * CAST(l_quantity AS BIGINT))
             / SUM(CAST(l_quantity AS BIGINT)) / 100, 4) AS wavg_price
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["dedup_lsh_pairs"] = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE doc_id < 200),
sh AS (
  SELECT doc_id, unnest(t) AS shingle FROM toks),
hashed AS (
  SELECT doc_id, k.i AS i,
         {_H.format(x="shingle || '#' || k.i")} AS h
  FROM sh, UNNEST(generate_series(0, 7)) AS k(i)),
sig AS (SELECT doc_id, i, MIN(h) AS minhash FROM hashed GROUP BY doc_id, i),
banded AS (
  SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         string_agg(i || ':' || minhash, ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, band)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_bands
FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
"""

# connected components of the LSH pair graph: recursive-CTE reachability
# closure (min reachable id per node) over the same pairs as
# dedup_lsh_pairs
ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE
toks AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE doc_id < 200),
sh AS (
  SELECT doc_id, unnest(t) AS shingle FROM toks),
hashed AS (
  SELECT doc_id, k.i AS i,
         {_H.format(x="shingle || '#' || k.i")} AS h
  FROM sh, UNNEST(generate_series(0, 7)) AS k(i)),
sig AS (SELECT doc_id, i, MIN(h) AS minhash FROM hashed GROUP BY doc_id, i),
banded AS (
  SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         string_agg(i || ':' || minhash, ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, band),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id)
SELECT id, CAST(MIN(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY id
"""

ORACLES["expr_parse_datetime"] = """
SELECT event_id,
       strptime(strftime(ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S')
         AS parsed_sec,
       strftime(ts, '%Y/%m') AS ym,
       try_strptime('not a date', '%Y-%m-%d') AS bad
FROM events
"""

ORACLES["ann_ivf_topk"] = ORACLES["ann_topk"]
ORACLES["ann_topk_arrow"] = ORACLES["ann_topk"]
ORACLES["ann_ivf_topk_arrow"] = ORACLES["ann_topk"]


ORACLES["ann_topk_multi"] = """
WITH qs AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
            FROM embeddings WHERE vec_id IN (0, 1, 2)),
scored AS (
  SELECT CAST(q.query_id AS INTEGER) AS query_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.qe), 4)
           AS cos_sim
  FROM embeddings e CROSS JOIN qs q)
SELECT query_id, vec_id, cos_sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cos_sim DESC, vec_id) AS rk
  FROM scored)
WHERE rk <= 10
"""


def _lsh_topk_oracle(n_planes: int = 8, dim: int = 64, k: int = 20) -> str:
    """Replicates lsh_topk_arrow in SQL: the deterministic ±1 hyperplane
    weights (same md5-derived signs as supersonic_spark.ann.plane_matrix)
    are inlined as DOUBLE[] literals; bucket = sum of sign bits."""
    from supersonic_spark.ann import _plane_sign

    def bucket(vec_expr: str) -> str:
        terms = []
        for p in range(n_planes):
            w = "[" + ", ".join(
                "1.0" if _plane_sign(p, j) else "-1.0"
                for j in range(dim)) + "]"
            terms.append(f"(CASE WHEN list_dot_product({vec_expr}, {w}) > 0 "
                         f"THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
             {bucket("embedding::DOUBLE[]")} AS bucket
      FROM embeddings),
qb AS (SELECT {bucket("qe")} AS bucket FROM q)
SELECT vec_id,
       round(list_cosine_similarity(e, (SELECT qe FROM q)), 4) AS cos_sim
FROM b WHERE bucket = (SELECT bucket FROM qb)
ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
"""


ORACLES["lsh_topk"] = _lsh_topk_oracle()

ORACLES["grouping_sets"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""

ORACLES["topk_per_group"] = """
SELECT o_orderpriority, o_orderkey,
       CAST(round(o_totalprice*100,0) AS BIGINT) AS price_cents,
       CAST(rk AS INTEGER) AS rk
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders)
WHERE rk <= 3
"""

ORACLES["percentiles"] = """
SELECT l_returnflag,
       round(quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.5), 4) AS p50,
       round(quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.9), 4) AS p90,
       round(quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""

ORACLES["session_windows"] = """
WITH marked AS (
  SELECT user_id, ts, CAST(round(value*100,0) AS BIGINT) AS cents,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 10 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sessions AS (
  SELECT user_id, ts, cents,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked)
SELECT user_id, MIN(ts) AS sess_start,
       MAX(ts) + INTERVAL 10 MINUTE AS sess_end,
       count(*) AS n, CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM sessions GROUP BY user_id, sess_id
"""

ORACLES["tpch_q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-06-01'
  AND l_shipdate  > TIMESTAMP '1997-06-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue_cents DESC, o_orderdate, l_orderkey
LIMIT 10
"""

ORACLES["tpch_q5_local_supplier"] = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue_cents DESC, n_name
"""

ORACLES["tpch_q10_returned_items"] = """
SELECT c_custkey, c_name, n_name,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_cents DESC, c_custkey
LIMIT 20
"""

ORACLES["tpch_q6_forecast_revenue"] = """
SELECT CAST(SUM(CAST(round(l_extendedprice * l_discount * 100, 0)
                     AS BIGINT)) AS BIGINT) AS revenue_cents,
       count(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

ORACLES["window_lag_lead"] = """
SELECT CAST(user_id AS BIGINT) AS user_id, event_id,
       CAST(round(value*100, 0) AS BIGINT) AS value_cents,
       CAST(round(lag(value) OVER w * 100, 0) AS BIGINT) AS prev_cents,
       CAST(round(lead(value) OVER w * 100, 0) AS BIGINT) AS next_cents,
       CAST(floor(epoch(ts)) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w
            AS BIGINT) AS gap_s
FROM events WHERE event_id < 3000
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

ORACLES["tpch_q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS BIGINT)) > 200)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS odate,
       CAST(round(o_totalprice*100, 0) AS BIGINT) AS total_cents,
       sum_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_cents DESC, o_orderkey
LIMIT 100
"""

ORACLES["codec_roundtrip_floats"] = """
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
       unnest(embedding) AS val
FROM embeddings
"""

ORACLES["expr_datetime3"] = """
SELECT event_id,
       make_timestamp(us) AS ts_us,
       us % 1000000 AS micro,
       strftime(make_timestamp(us), '%f') AS frac_str,
       us AS epoch_us
FROM (SELECT event_id,
             epoch_us(ts) + (event_id * 137) % 1000000 AS us
      FROM events)
"""

ORACLES["expr_div_variants"] = """
SELECT o_orderkey,
       round(CASE WHEN dnm = 0 THEN NULL
                  ELSE cents / dnm END, 4) AS quiet_div,
       round(CASE WHEN dnm <> 0 THEN cents / dnm END, 4)
         AS signal_div_guarded,
       CAST(cents // NULLIF(dnm, 0) AS BIGINT) AS int_div,
       CAST(cents % NULLIF(dnm, 0) AS BIGINT) AS mod_v
FROM (SELECT o_orderkey, o_orderkey % 7 AS dnm,
             CAST(round(o_totalprice*100,0) AS BIGINT) AS cents
      FROM orders)
"""

ORACLES["tpch_q14_promo_revenue"] = """
SELECT promo_cents, total_cents,
       CAST(promo_cents * 10000 // total_cents AS BIGINT) AS promo_bps
FROM (
  SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(round(l_extendedprice * (1 - l_discount)
                                       * 100, 0) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS promo_cents,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS total_cents
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01')
"""

ORACLES["tpch_q4_priority_check"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > CAST(o_orderdate AS DATE)
                                 + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["codec_point_lookup"] = """
SELECT event_id, user_id, event_type
FROM events WHERE user_id = 7
"""

ORACLES["codec_in_lookup"] = """
SELECT event_id, user_id
FROM events WHERE user_id IN (3, 7, 11, 400)
"""

ORACLES["codec_compaction"] = """
SELECT event_id, user_id, event_type FROM events
"""

ORACLES["ann_ivf_topk_indexed"] = ORACLES["ann_topk"]

ORACLES["codec_stats_agg"] = """
SELECT 'event_id' AS col_name, count(*) AS n_rows,
       count(event_id) AS n_values,
       CAST(min(event_id) AS BIGINT) AS min_v,
       CAST(max(event_id) AS BIGINT) AS max_v,
       CAST(sum(event_id) AS BIGINT) AS sum_v
FROM events
UNION ALL
SELECT 'user_id', count(*), count(user_id),
       CAST(min(user_id) AS BIGINT), CAST(max(user_id) AS BIGINT),
       CAST(sum(user_id) AS BIGINT)
FROM events
ORDER BY col_name
"""

ORACLES["codec_roundtrip_embeddings"] = """
SELECT vec_id,
       CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
       unnest(embedding) AS val
FROM embeddings
"""

ORACLES["tpch_q7_volume_shipping"] = """
SELECT supp_nation, cust_nation, yr,
       CAST(SUM(cents) AS BIGINT) AS sum_cents, count(*) AS n
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS yr,
         CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
              AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY supp_nation, cust_nation, yr
ORDER BY supp_nation, cust_nation, yr
"""

# --- round-5 additions ------------------------------------------------------

ORACLES["tpch_q1_pricing_full"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT)
         AS sum_base_cents,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT))
            AS BIGINT) AS sum_disc_cents,
       CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100, 0)
                     AS BIGINT)) AS BIGINT) AS sum_charge_cents,
       round(SUM(CAST(l_quantity AS BIGINT))::DOUBLE / count(*), 4) AS avg_qty,
       round(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT))::DOUBLE
             / count(*), 4) AS avg_price_cents,
       round(SUM(CAST(round(l_discount*10000, 0) AS BIGINT))::DOUBLE
             / count(*), 4) AS avg_disc_bp,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

ORACLES["tpch_q12_priority_class"] = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

ORACLES["tpch_q17_small_quantity"] = """
WITH li_b AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'),
avg_q AS (
  SELECT l_partkey, avg(l_quantity) AS avg_qty FROM li_b GROUP BY l_partkey)
SELECT CAST(SUM(CAST(round(l_extendedprice*100, 0) AS BIGINT)) AS BIGINT)
         AS small_rev_cents,
       count(*) AS n
FROM li_b JOIN avg_q USING (l_partkey)
WHERE l_quantity < 0.5 * avg_qty
"""

ORACLES["tpch_q19_disjunctive_revenue"] = """
SELECT CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["codec_datetime_prune"] = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
  AND ts <= TIMESTAMP '2024-01-12 00:00:00'
"""

ORACLES["tpch_q8_market_share"] = """
SELECT yr,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_6' THEN vol_cents ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(SUM(vol_cents) AS BIGINT) AS total_cents,
       round(SUM(CASE WHEN supp_nation = 'NATION_6' THEN vol_cents ELSE 0 END)
             ::DOUBLE / SUM(vol_cents), 4) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS yr, n2.n_name AS supp_nation,
         CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT)
           AS vol_cents
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey AND n1.n_regionkey = 1
  JOIN part     ON l_partkey = p_partkey AND p_type = 'ECONOMY'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01')
GROUP BY yr ORDER BY yr
"""

ORACLES["tpch_q9_product_profit"] = """
SELECT nation, yr, CAST(SUM(amount_cents) AS BIGINT) AS profit_cents
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS yr,
         CAST(round((l_extendedprice*(1-l_discount)
                     - p_retailprice*0.6*l_quantity)*100, 0) AS BIGINT)
           AS amount_cents
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey AND p_type = 'STANDARD'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey)
GROUP BY nation, yr ORDER BY nation, yr DESC
"""

ORACLES["tpch_q13_customer_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey) t
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""

ORACLES["tpch_q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0)
                       AS BIGINT)) AS BIGINT) AS total_rev_cents
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_rev_cents
FROM supplier JOIN rev ON s_suppkey = l_suppkey
WHERE total_rev_cents = (SELECT max(total_rev_cents) FROM rev)
ORDER BY s_suppkey
"""

ORACLES["tpch_q16_supplier_relationship"] = """
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLES["tpch_q21_waiting_suppliers"] = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey AND o_orderstatus = 'F'
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey AND n_name = 'NATION_3'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
"""

ORACLES["tpch_q22_global_sales"] = """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal*100, 0) AS BIGINT) AS bal_cents
  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
thr AS (SELECT avg(bal_cents) AS thr FROM c WHERE bal_cents > 0)
SELECT c_nationkey, count(*) AS numcust,
       CAST(SUM(bal_cents) AS BIGINT) AS totacctbal_cents
FROM c
WHERE bal_cents > (SELECT thr FROM thr)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey ORDER BY c_nationkey
"""

ORACLES["multimodal_frame_sample"] = """
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       CAST(least(256, octet_length(encode(text)) - i*256) AS INT)
         AS n_bytes
FROM documents,
     UNNEST(generate_series(
       0, CAST(floor((octet_length(encode(text))-1)/256) AS BIGINT), 2))
       AS t(i)
WHERE octet_length(encode(text)) > 0
"""

ORACLES["multimodal_resize"] = """
SELECT doc_id, CAST(32 AS INT) AS out_width, CAST(16 AS INT) AS out_height,
       CAST(32*16/16 + 8 AS INT) AS n_bytes
FROM documents WHERE octet_length(encode(text)) > 0
"""

ORACLES["tpch_q2_min_cost_supplier"] = """
WITH elig AS (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk
              FROM lineitem),
cand AS (
  SELECT p_partkey, s_name, n_name, s_acctbal
  FROM elig
  JOIN part ON pk = p_partkey AND p_size <= 15 AND p_type = 'LARGE'
  JOIN supplier ON sk = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_regionkey = 3),
mn AS (SELECT p_partkey AS mpk, min(s_acctbal) AS mc
       FROM cand GROUP BY p_partkey)
SELECT p_partkey, s_name, n_name,
       CAST(round(s_acctbal*100, 0) AS BIGINT) AS acctbal_cents
FROM cand JOIN mn ON p_partkey = mpk AND s_acctbal = mc
ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey LIMIT 100
"""

ORACLES["tpch_q11_important_stock"] = """
WITH v AS (
  SELECT l_partkey,
         CAST(round(l_quantity * p_retailprice * 100, 0) AS BIGINT)
           AS val_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_2'),
per AS (SELECT l_partkey, CAST(SUM(val_cents) AS BIGINT) AS value_cents
        FROM v GROUP BY l_partkey)
SELECT l_partkey, value_cents
FROM per
WHERE value_cents > 0.001 * (SELECT SUM(value_cents) FROM per)
ORDER BY value_cents DESC, l_partkey
"""

ORACLES["tpch_q20_excess_availability"] = """
WITH sq AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
  GROUP BY l_partkey, l_suppkey),
tq AS (SELECT l_partkey, SUM(qty) AS tot FROM sq GROUP BY l_partkey)
SELECT DISTINCT s_suppkey, s_name
FROM sq JOIN tq USING (l_partkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_4'
WHERE qty > 0.08 * tot
ORDER BY s_suppkey
"""

ORACLES["codec_upsert"] = """
SELECT event_id, user_id,
       CASE WHEN user_id IN (3, 7) THEN 'UPD_' || event_type
            ELSE event_type END AS event_type
FROM events
"""

ORACLES["codec_zorder_prune"] = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us
FROM events
WHERE user_id BETWEEN 30 AND 70
  AND ts >= TIMESTAMP '2024-01-08 00:00:00'
  AND ts <= TIMESTAMP '2024-01-15 00:00:00'
"""


def _lsh_topk_multiprobe_oracle(n_planes: int = 8, dim: int = 64,
                                k: int = 20) -> str:
    """Multi-probe (hamming=1) twin of _lsh_topk_oracle: candidate set is
    the query bucket plus each single-plane flip, i.e. xor(qb, 1<<i)."""
    from supersonic_spark.ann import _plane_sign

    def bucket(vec_expr: str) -> str:
        terms = []
        for p in range(n_planes):
            w = "[" + ", ".join(
                "1.0" if _plane_sign(p, j) else "-1.0"
                for j in range(dim)) + "]"
            terms.append(f"(CASE WHEN list_dot_product({vec_expr}, {w}) > 0 "
                         f"THEN {1 << p} ELSE 0 END)")
        return " + ".join(terms)

    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0),
b AS (SELECT vec_id, embedding::DOUBLE[] AS e,
             {bucket("embedding::DOUBLE[]")} AS bucket
      FROM embeddings),
qb AS (SELECT {bucket("qe")} AS bucket FROM q),
probes AS (
  SELECT bucket FROM qb
  UNION
  SELECT xor(qb.bucket, 1 << i)
  FROM qb, UNNEST(generate_series(0, {n_planes - 1})) AS t(i))
SELECT vec_id,
       round(list_cosine_similarity(e, (SELECT qe FROM q)), 4) AS cos_sim
FROM b WHERE bucket IN (SELECT bucket FROM probes)
ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
"""


ORACLES["lsh_topk_multiprobe"] = _lsh_topk_multiprobe_oracle()
# the indexed probe reads the same Hamming-ball candidate set out of the
# bucket-partitioned layout — identical result, identical oracle
ORACLES["lsh_topk_indexed"] = _lsh_topk_multiprobe_oracle()

# codec_selection_report: the selector's choices on the deterministic
# sf0.01 documents table, pinned as literals (VERDICT r4 item 7) — the
# report itself is engine-specific (no DuckDB analogue), but pinning it
# turns selector-behavior regressions into gate failures. doc_id arrives
# round-robin-shuffled (unsorted) in each partition, so the selector
# correctly picks for_bitpack over delta_bitpack there; text at 250-row
# partition grain picks dict (tokdict needs the full-table sample).
ORACLES["codec_selection_report"] = """
SELECT * FROM (VALUES
  ('doc_id',  'for_bitpack', CAST(2 AS BIGINT)),
  ('lang',    'dict',        CAST(2 AS BIGINT)),
  ('n_chars', 'for_bitpack', CAST(2 AS BIGINT)),
  ('source',  'dict',        CAST(2 AS BIGINT)),
  ('text',    'dict',        CAST(2 AS BIGINT))
) AS t("column", codec, "count")
"""


ORACLES["codec_delete"] = """
SELECT event_id, user_id, event_type
FROM events WHERE user_id NOT IN (3, 7)
"""

# the snapshot decodes to the PRE-merge table: plain select
ORACLES["codec_snapshot"] = """
SELECT event_id, user_id, event_type FROM events
"""


def _pq_codes_cte(m: int = 8, ksub: int = 4, dim: int = 64) -> str:
    """Shared CTE chain computing per-subspace PQ codes in SQL from the
    pinned toy codebooks: per-codeword distance columns (same left-assoc
    term order as pq_assign_expr, so the doubles are bit-identical) and
    a lowest-index argmin (the first i with d_i <= every later d_j is
    the lowest argmin index)."""
    from supersonic_spark.pq import _codebook_matrix, toy_pq_codebooks
    dsub = dim // m
    c, c_sq = _codebook_matrix(toy_pq_codebooks(m, ksub, dsub))

    def dist(s: int, i: int) -> str:
        terms = [repr(float(c_sq[s][i]))]
        for j in range(dsub):
            terms.append(f"e[{s * dsub + j + 1}] * "
                         f"{repr(-2.0 * float(c[s][i][j]))}")
        return " + ".join(terms)

    dcols = ",\n       ".join(
        f"{dist(s, i)} AS d{s}_{i}"
        for s in range(m) for i in range(ksub))

    def argmin(s: int) -> str:
        branches = []
        for i in range(ksub - 1):
            cond = " AND ".join(f"d{s}_{i} <= d{s}_{j}"
                                for j in range(i + 1, ksub))
            branches.append(f"WHEN {cond} THEN {i}")
        return "CASE " + " ".join(branches) + f" ELSE {ksub - 1} END"

    ccols = ", ".join(f"{argmin(s)} AS c{s}" for s in range(m))
    return f"""b AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
d AS (SELECT vec_id, {dcols} FROM b),
codes AS (SELECT vec_id, {ccols} FROM d)"""


def _pq_assign_oracle(m: int = 8, ksub: int = 4, dim: int = 64) -> str:
    cols = ", ".join(f"c{s}" for s in range(m))
    return f"WITH {_pq_codes_cte(m, ksub, dim)}\n" \
           f"SELECT vec_id, {cols} FROM codes"


def _pq_adc_topk_oracle(m: int = 8, ksub: int = 4, dim: int = 64,
                        k: int = 20) -> str:
    """ADC cosine == exact cosine of the PQ reconstruction, so the
    oracle rebuilds each vector from the literal codebooks (one CASE per
    subspace returning a DOUBLE[] codeword, flattened) and scores it
    against the query with list_cosine_similarity."""
    from supersonic_spark.pq import _codebook_matrix, toy_pq_codebooks
    dsub = dim // m
    c, _ = _codebook_matrix(toy_pq_codebooks(m, ksub, dsub))

    def case_list(s: int) -> str:
        br = []
        for i in range(ksub):
            vals = ", ".join(repr(float(v)) for v in c[s][i])
            br.append(f"WHEN {i} THEN [{vals}]")
        return f"CASE c{s} " + " ".join(br) + " END"

    recon = ", ".join(case_list(s) for s in range(m))
    return f"""WITH q AS (SELECT embedding::DOUBLE[] AS qe
           FROM embeddings WHERE vec_id = 0),
{_pq_codes_cte(m, ksub, dim)},
recon AS (SELECT vec_id, flatten([{recon}]) AS r FROM codes)
SELECT vec_id,
       round(list_cosine_similarity(r, (SELECT qe FROM q)), 4) AS cos_sim
FROM recon ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}"""


ORACLES["pq_assign"] = _pq_assign_oracle()
ORACLES["pq_adc_topk"] = _pq_adc_topk_oracle()
# covering refine / full probing make both searches exactly brute force
ORACLES["pq_topk_refined"] = ORACLES["ann_topk"]
ORACLES["ivfpq_topk_indexed"] = ORACLES["ann_topk"]


# CDC off snapshot v1 after upserting users 3 and 7 with an UPD_ prefix:
# their old rows surface as deletes and new rows as inserts
ORACLES["codec_cdc"] = """
SELECT event_id, user_id, 'UPD_' || event_type AS event_type,
       'insert' AS change_type
FROM events WHERE user_id IN (3, 7)
UNION ALL
SELECT event_id, user_id, event_type, 'delete' AS change_type
FROM events WHERE user_id IN (3, 7)
"""


def _semantic_dedup_oracle(k: int = 4, dim: int = 64,
                           threshold: float = 0.2) -> str:
    """SemDeDup twin: literal-centroid cell argmin (same left-assoc term
    order as the distance fold, lowest-index ties), in-cell pairs at
    round(cosine, 4) >= threshold, recursive-CTE min-label components,
    singletons map to themselves."""
    from supersonic_spark.ann import toy_centroids
    import numpy as np
    c = np.asarray(toy_centroids(k, dim), dtype=np.float64)
    c_sq = (c * c).sum(axis=1)

    def dist(i: int) -> str:
        terms = [repr(float(c_sq[i]))]
        for j in range(dim):
            terms.append(f"e[{j + 1}] * {repr(-2.0 * float(c[i][j]))}")
        return " + ".join(terms)

    dcols = ",\n       ".join(f"{dist(i)} AS d{i}" for i in range(k))
    branches = []
    for i in range(k - 1):
        cond = " AND ".join(f"d{i} <= d{j}" for j in range(i + 1, k))
        branches.append(f"WHEN {cond} THEN {i}")
    argmin = "CASE " + " ".join(branches) + f" ELSE {k - 1} END"

    return f"""
WITH RECURSIVE b AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
d AS (SELECT vec_id, e, {dcols} FROM b),
cells AS (SELECT vec_id, e, {argmin} AS cell FROM d),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.e, b.e), 4) >= {threshold}),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
comp AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY id)
SELECT vec_id AS id,
       CAST(COALESCE(comp.cluster, vec_id) AS BIGINT) AS rep_id
FROM embeddings LEFT JOIN comp ON vec_id = comp.id
"""


ORACLES["semantic_dedup"] = _semantic_dedup_oracle()

# Gopher-style repetition metrics over a derived text (the doc plus two
# repeated first-80-char lines, so dup-line/dup-gram paths exercise
# nonzero values on the synthetic corpus). Tie-break for the top 2-gram
# mirrors Spark's struct-max: max count, then lexicographically greatest
# gram. The composite flag compares the ROUNDED metrics on both sides.
def _repetition_sql(src: str) -> str:
    """Repetition-metrics SQL over an arbitrary (doc_id, text) source —
    parameterized so the capstone funnel reuses the exact same formulas
    on raw text while the standalone gate uses a derived repetitive
    text."""
    return r"""
WITH src AS (@SRC@),
base AS (
  SELECT doc_id, text,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS lines,
    list_filter(
      CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
           ELSE string_split_regex(trim(text), '\s+') END,
      x -> length(x) > 0) AS toks
  FROM src),
g AS (
  SELECT doc_id, text, lines,
    CASE WHEN len(toks) >= 2
         THEN list_transform(generate_series(1, len(toks)-1),
                             i -> toks[i] || ' ' || toks[i+1])
         ELSE []::VARCHAR[] END AS grams2,
    CASE WHEN len(toks) >= 3
         THEN list_transform(generate_series(1, len(toks)-2),
                             i -> toks[i] || ' ' || toks[i+1] || ' '
                                  || toks[i+2])
         ELSE []::VARCHAR[] END AS grams3
  FROM base),
m AS (
  SELECT doc_id,
    CASE WHEN len(lines) > 0
         THEN round(1.0 - len(list_distinct(lines)) / len(lines), 4)
         ELSE 0.0 END AS dup_line_frac,
    CASE WHEN coalesce(list_sum(list_transform(lines, x -> length(x))), 0) > 0
         THEN round(list_sum(list_transform(list_distinct(lines),
                d -> (len(list_filter(lines, x -> x = d)) - 1) * length(d)))
              / list_sum(list_transform(lines, x -> length(x))), 4)
         ELSE 0.0 END AS dup_line_char_frac,
    CASE WHEN len(grams2) > 0 AND length(text) > 0
         THEN round(
           list_max(list_transform(list_distinct(grams2),
                    g -> len(list_filter(grams2, x -> x = g))))
           * length(list_max(list_filter(list_distinct(grams2),
               g -> len(list_filter(grams2, x -> x = g)) =
                    list_max(list_transform(list_distinct(grams2),
                             h -> len(list_filter(grams2, x -> x = h)))))))
           / length(text), 4)
         ELSE 0.0 END AS top_2gram_char_frac,
    CASE WHEN length(text) > 0
         THEN round(least(coalesce(list_sum(list_transform(
                list_distinct(grams3),
                g -> CASE WHEN len(list_filter(grams3, x -> x = g)) > 1
                          THEN len(list_filter(grams3, x -> x = g))
                               * length(g)
                          ELSE 0 END)), 0) / length(text), 1.0), 4)
         ELSE 0.0 END AS dup_3gram_char_frac
  FROM g)
SELECT doc_id, dup_line_frac, dup_line_char_frac, top_2gram_char_frac,
       dup_3gram_char_frac,
       (dup_line_frac > 0.30 OR dup_line_char_frac > 0.20
        OR top_2gram_char_frac > 0.20 OR dup_3gram_char_frac > 0.60)
       AS repetitive
FROM m
""".replace("@SRC@", src)


ORACLES["text_repetition"] = _repetition_sql("""
  SELECT doc_id,
         concat_ws(chr(10), text, substr(text, 1, 80),
                   substr(text, 1, 80)) AS text
  FROM documents""")

# benchmark set = every 97th doc; overlap counts DISTINCT shared word
# 4-grams (both sides shingle over the distinct-gram set, the same
# word_ngrams expression the MinHash stack uses)
ORACLES["decontaminate"] = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS toks
  FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(toks) >= 4
                THEN list_transform(generate_series(1, len(toks)-3),
                       i -> toks[i] || ' ' || toks[i+1] || ' '
                            || toks[i+2] || ' ' || toks[i+3])
                ELSE []::VARCHAR[] END)) AS gram
  FROM toks),
bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
hits AS (
  SELECT g.doc_id, count(DISTINCT g.gram) AS n_overlap
  FROM grams g JOIN bench USING (gram)
  GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""

# KMV sketch with k above the column's cardinality == exact distinct
# count (the estimator path below k is pytest-gated for accuracy)
ORACLES["sketch_kmv_distinct"] = """
SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders
"""

# rebucket is pure layout evolution: decoded content must equal the
# source table exactly
ORACLES["codec_rebucket"] = """
SELECT event_id, user_id, event_type FROM events
"""

# Misra-Gries with k >> cardinality == exact per-value counts (the
# approximation guarantee is pytest-gated on skewed data)
ORACLES["sketch_heavy_hitters"] = """
SELECT o_orderpriority AS value, CAST(count(*) AS BIGINT) AS est_count
FROM orders GROUP BY 1
"""

# deterministic split labels recomputed from the same md5 arithmetic
ORACLES["split_train_val_test"] = f"""
SELECT doc_id,
       CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT doc_id,
         {_H.format(x="'split#' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
  FROM documents)
"""

# capstone funnel v2: recomposes quality + langid + repetition +
# decontamination + exact-dedup + mix + split from the same fragments
# the standalone gates use
ORACLES["curate_corpus_v2"] = f"""
WITH q AS ({ORACLES["text_quality"].strip().rstrip(";")}),
lg AS ({ORACLES["text_langid"].strip()}),
f AS (
  SELECT d.doc_id, d.source, d.text, q.quality
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  JOIN lg ON lg.doc_id = d.doc_id
  WHERE q.quality >= 0.5 AND lg.lang_guess = 'en'),
rep AS ({_repetition_sql("SELECT doc_id, text FROM documents")}),
f2 AS (
  SELECT f.* FROM f JOIN rep ON rep.doc_id = f.doc_id
  WHERE NOT rep.repetitive),
btoks AS (
  SELECT doc_id,
         list_filter(
           CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                ELSE string_split_regex(trim(text), '\\s+') END,
           x -> length(x) > 0) AS toks
  FROM documents),
grams AS (
  SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(toks) >= 4
                THEN list_transform(generate_series(1, len(toks)-3),
                       i -> toks[i] || ' ' || toks[i+1] || ' '
                            || toks[i+2] || ' ' || toks[i+3])
                ELSE []::VARCHAR[] END)) AS gram
  FROM btoks),
bgrams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
cont AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bgrams USING (gram)),
f3 AS (
  SELECT * FROM f2
  WHERE doc_id NOT IN (SELECT doc_id FROM cont)),
reps AS (
  SELECT MIN(doc_id) AS doc_id
  FROM f3 GROUP BY {_H.format(x='text')}),
mixed AS (
  SELECT f3.doc_id, f3.source, f3.quality
  FROM f3 JOIN reps ON reps.doc_id = f3.doc_id
  WHERE {_H.format(x="f3.source || '#' || f3.doc_id")} % 10000 < 8000)
SELECT doc_id, source, quality,
       CASE WHEN b < 9000 THEN 'train'
            WHEN b < 9500 THEN 'val' ELSE 'test' END AS split
FROM (
  SELECT *, {_H.format(x="'split#' || CAST(doc_id AS VARCHAR)")} % 10000 AS b
  FROM mixed)
"""

def _knn_join_oracle(k_cells: int = 4, dim: int = 64, k: int = 5) -> str:
    """knn_join_ivf twin: literal-centroid argmin cells (same expansion
    as _semantic_dedup_oracle), in-cell self-join, per-id top-k over
    (round(cos,4) DESC, nbr_id)."""
    from supersonic_spark.ann import toy_centroids
    import numpy as np
    c = np.asarray(toy_centroids(k_cells, dim), dtype=np.float64)
    c_sq = (c * c).sum(axis=1)

    def dist(i: int) -> str:
        terms = [repr(float(c_sq[i]))]
        for j in range(dim):
            terms.append(f"e[{j + 1}] * {repr(-2.0 * float(c[i][j]))}")
        return " + ".join(terms)

    dcols = ",\n       ".join(f"{dist(i)} AS d{i}" for i in range(k_cells))
    branches = []
    for i in range(k_cells - 1):
        cond = " AND ".join(f"d{i} <= d{j}" for j in range(i + 1, k_cells))
        branches.append(f"WHEN {cond} THEN {i}")
    argmin = "CASE " + " ".join(branches) + f" ELSE {k_cells - 1} END"

    return f"""
WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
d AS (SELECT vec_id, e, {dcols} FROM b),
cells AS (SELECT vec_id, e, {argmin} AS cell FROM d),
pairs AS (
  SELECT a.vec_id AS vec_id, nb.vec_id AS nbr_id,
         round(list_cosine_similarity(a.e, nb.e), 4) AS cos_sim
  FROM cells a JOIN cells nb ON a.cell = nb.cell
                            AND a.vec_id <> nb.vec_id)
SELECT vec_id, nbr_id, cos_sim, CAST(rk AS INTEGER) AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY cos_sim DESC, nbr_id) AS rk
  FROM pairs)
WHERE rk <= {k}
"""


ORACLES["knn_join_ivf"] = _knn_join_oracle()

ORACLES["window_moving_avg"] = """
SELECT event_id, user_id, sum_1h_cents, n_1h,
       round(sum_1h_cents / (n_1h * 100.0), 4) AS avg_1h
FROM (
  SELECT event_id, user_id,
         CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) OVER w AS BIGINT)
           AS sum_1h_cents,
         COUNT(*) OVER w AS n_1h
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW))
"""

ORACLES["tumbling_window_agg"] = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start, event_type,
       count(*) AS n,
       CAST(SUM(CAST(round(value*100, 0) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events GROUP BY 1, 2
"""

def _dd_quantiles_oracle(gamma: float = 1.02,
                         qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> str:
    """DDSketch twin: identical pinned ln(gamma) divisor, bucket cumsum,
    rank floor(q*(n-1))+1, estimate 2*gamma^bkt/(gamma+1)."""
    import math
    lng = repr(math.log(gamma))

    def label(q: float) -> str:
        return "p" + f"{q * 100:g}".replace(".", "_")

    cols = ",\n       ".join(
        f"round(2.0 * pow({gamma!r}, MIN(CASE WHEN cum >= "
        f"floor({q!r} * (n - 1)) + 1 THEN bkt END)) / {gamma + 1.0!r}, 4)"
        f" AS {label(q)}" for q in qs)
    return f"""
WITH sk AS (
  SELECT o_orderpriority,
         CAST(ceil(ln(o_totalprice) / {lng}) AS INTEGER) AS bkt,
         count(*) AS cnt
  FROM orders GROUP BY 1, 2),
c AS (
  SELECT o_orderpriority, bkt,
         SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY bkt) AS cum,
         SUM(cnt) OVER (PARTITION BY o_orderpriority) AS n
  FROM sk)
SELECT o_orderpriority,
       {cols}
FROM c GROUP BY o_orderpriority
"""


ORACLES["sketch_dd_quantiles"] = _dd_quantiles_oracle()

ORACLES["triangle_count"] = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey)
SELECT count(*) AS n_triangles
FROM edges e1
JOIN edges e2 ON e1.v = e2.u
JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
"""

ORACLES["json_extract"] = """
WITH n AS (
  SELECT event_id, props,
         '{"a":{"b":[' || CAST(event_id % 7 AS VARCHAR)
           || ',5]},"s":"v' || CAST(event_id % 3 AS VARCHAR) || '"}'
           AS nested
  FROM events)
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract_string(nested, '$.a.b[0]') AS INTEGER) AS b0,
       json_extract_string(nested, '$.s') AS s
FROM n
"""

ORACLES["context_assembly"] = """
SELECT event_id, user_id,
       array_to_string(
         list(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id
                                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         ' > ') AS ctx
FROM events
"""

ORACLES["fuzzy_join_blocked"] = """
WITH dirty AS (
  SELECT DISTINCT 'x' || substr(n_name, 2) AS dirty_name FROM nation),
a AS (SELECT DISTINCT n_name, length(n_name) AS bk FROM nation),
b AS (SELECT DISTINCT dirty_name, length(dirty_name) AS bk FROM dirty)
SELECT a.n_name, b.dirty_name,
       CAST(levenshtein(a.n_name, b.dirty_name) AS INTEGER) AS dist
FROM a JOIN b USING (bk)
WHERE levenshtein(a.n_name, b.dirty_name) <= 2
"""

ORACLES["resample_ffill"] = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         MAX(CAST(round(value*100, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds)
SELECT g.user_id, g.h, hv.v
FROM grid g ASOF JOIN hourly hv
  ON hv.user_id = g.user_id AND g.h >= hv.h
"""

ORACLES["winsorize"] = """
WITH p AS (
  SELECT l_returnflag,
         quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.05)
           AS plo,
         quantile_cont(CAST(round(l_extendedprice*100,0) AS BIGINT), 0.95)
           AS phi
  FROM lineitem GROUP BY 1)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       CAST(round(l.l_extendedprice*100,0) AS BIGINT) AS cents,
       round(least(greatest(
         CAST(CAST(round(l.l_extendedprice*100,0) AS BIGINT) AS DOUBLE),
         p.plo), p.phi), 4) AS clipped
FROM lineitem l JOIN p USING (l_returnflag)
"""

# IVM gate: the oracle is the FROM-SCRATCH rollup — the merge of the
# two partial states must equal it exactly
ORACLES["incremental_rollup"] = """
SELECT o_orderpriority,
       CAST(SUM(CAST(round(o_totalprice*100,0) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       count(*) AS n,
       MIN(CAST(round(o_totalprice*100,0) AS BIGINT)) AS min_cents,
       MAX(CAST(round(o_totalprice*100,0) AS BIGINT)) AS max_cents
FROM orders GROUP BY o_orderpriority
"""

ORACLES["funnel_conversion"] = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'signup' GROUP BY 1),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1)
SELECT CAST(1 AS INTEGER) AS step, 'signup' AS step_name,
       count(*) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS INTEGER), 'view', count(*) FROM s2
UNION ALL
SELECT CAST(3 AS INTEGER), 'purchase', count(*) FROM s3
"""

ORACLES["cohort_retention"] = """
WITH wk AS (
  SELECT user_id, date_trunc('week', ts)::DATE AS w FROM events),
first AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1),
act AS (SELECT DISTINCT user_id, w AS active_week FROM wk)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, active_week) / 7 AS INTEGER)
         AS offset_weeks,
       count(DISTINCT user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY 1, 2
"""

ORACLES["weighted_sample"] = f"""
WITH keyed AS (
  SELECT doc_id, source, n_chars + 1 AS w,
         pow(({_H.format(x="'ws#' || CAST(doc_id AS VARCHAR)")} + 0.5)
               / 1152921504606846976.0,
             1.0 / (n_chars + 1)) AS k
  FROM documents)
SELECT doc_id, source, w, CAST(rn AS INTEGER) AS rn FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY k DESC, doc_id) AS rn
  FROM keyed)
WHERE rn <= 20
"""

ORACLES["pivot_agg"] = """
SELECT o_orderpriority,
       CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cents,
       CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cents,
       CAST(SUM(CAST(round(o_totalprice*100, 0) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cents
FROM orders GROUP BY o_orderpriority
"""

# paragraph-level exact dedup: winner per 60-bit paragraph hash is the
# minimum composite (doc_id*1e6 + line idx); docs reassembled from
# surviving lines in order. The derived corpus prepends one of 5 shared
# boilerplate lines so cross-document repeats provably exist.
ORACLES["paragraph_dedup"] = f"""
WITH ex AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(p)),
                i -> struct_pack(idx := i-1, para := trim(p[i])))) AS u
  FROM (SELECT doc_id, string_split(text, chr(10)) AS p FROM (
          SELECT doc_id,
                 concat_ws(chr(10),
                           '(c) corpus boilerplate '
                             || CAST(doc_id % 5 AS VARCHAR),
                           text) AS text
          FROM documents))),
lines AS (
  SELECT doc_id, u.idx AS idx, u.para AS para
  FROM ex WHERE length(u.para) > 0),
pos AS (
  SELECT doc_id, idx, para, doc_id*1000000 + idx AS pos,
         {_H.format(x='para')} AS h
  FROM lines),
tot AS (SELECT doc_id, count(*) AS n_total FROM lines GROUP BY doc_id),
win AS (SELECT h, min(pos) AS win_pos FROM pos GROUP BY h),
kept AS (
  SELECT p.doc_id, p.idx, p.para
  FROM pos p JOIN win ON win.h = p.h AND p.pos = win.win_pos),
re AS (
  SELECT doc_id, string_agg(para, chr(10) ORDER BY idx) AS text_dedup,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT re.doc_id, re.text_dedup, re.n_kept, tot.n_total
FROM re JOIN tot USING (doc_id)
"""

# batch twin of the stream-stream interval join (watermark is a no-op
# in batch; the range condition is the semantics)
ORACLES["interval_join"] = """
SELECT l.user_id, l.event_id AS l_id, r.event_id AS r_id
FROM events l JOIN events r ON l.user_id = r.user_id
WHERE l.event_type = 'view' AND r.event_type = 'purchase'
  AND r.ts >= l.ts AND r.ts <= l.ts + INTERVAL 2 HOUR
"""


# ---------------------------------------------------------------------------
# round-5 wave 3: stats / retrieval / graph / skew
# ---------------------------------------------------------------------------
# Float-parity notes for this wave: DuckDB numeric literals written in
# E-notation (0.9e0) parse as DOUBLE, matching Spark's double literals
# exactly — bare decimals would be DECIMAL and take a different
# arithmetic path. Integer-exact intermediates (cents, epoch-second
# deltas) keep interpolation bit-identical; everything transcendental
# is rounded to 4 decimals on both sides.

ORACLES["zscore_anomaly"] = """
WITH s AS (
  SELECT event_type, avg(value) AS mu, stddev_pop(value) AS sd
  FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
       round((e.value - s.mu) / s.sd, 4) AS z,
       abs(round((e.value - s.mu) / s.sd, 4)) > 1.5e0 AS is_anomaly
FROM events e JOIN s USING (event_type)
"""

ORACLES["window_distribution"] = """
SELECT o_orderkey, o_orderpriority, cents,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume
FROM (SELECT o_orderkey, o_orderpriority,
             CAST(round(o_totalprice*100, 0) AS BIGINT) AS cents
      FROM orders)
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY cents, o_orderkey)
"""

ORACLES["quantile_bucketize"] = """
WITH o AS (
  SELECT CAST(round(o_totalprice*100, 0) AS BIGINT) AS cents
  FROM orders),
b AS (
  SELECT quantile_cont(cents, [0.1e0,0.2e0,0.3e0,0.4e0,0.5e0,
                               0.6e0,0.7e0,0.8e0,0.9e0]) AS bs
  FROM o),
asg AS (
  SELECT cents, 1 + len(list_filter(b.bs, x -> cents > x)) AS bucket
  FROM o, b)
SELECT CAST(bucket AS INTEGER) AS bucket, count(*) AS n,
       min(cents) AS min_cents, max(cents) AS max_cents
FROM asg GROUP BY 1
"""

ORACLES["corr_by_group"] = """
SELECT l_returnflag, count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(corr(l_quantity, l_discount), 4) AS corr_qty_disc,
       round(covar_pop(l_quantity, l_discount), 4) AS covar_qty_disc
FROM lineitem GROUP BY 1
"""

ORACLES["tfidf_topterms"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token <> '' GROUP BY 1, 2),
dfx AS (SELECT token, count(*) AS df_docs FROM tf GROUP BY 1),
nn AS (SELECT count(*) AS n FROM documents),
sc AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfx.df_docs,
         tf.tf * (ln((nn.n + 1.0e0) / (dfx.df_docs + 1.0e0)) + 1.0e0)
           AS score
  FROM tf JOIN dfx USING (token), nn)
SELECT doc_id, token, tf, df_docs, round(score, 4) AS score,
       CAST(rn AS INTEGER) AS rn
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rn
      FROM sc)
WHERE rn <= 5
"""

ORACLES["bm25_topk"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token <> '' GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dlen FROM tf GROUP BY 1),
st AS (SELECT avg(dlen) AS avgdl, count(*) AS n FROM dl),
qt AS (SELECT * FROM tf WHERE token IN ('spark', 'window', 'hash')),
dfx AS (SELECT token, count(*) AS df FROM qt GROUP BY 1),
sc AS (
  SELECT qt.doc_id,
         SUM((ln(1.0e0 + (st.n - dfx.df + 0.5e0) / (dfx.df + 0.5e0))
              * (qt.tf * 2.2e0))
             / (qt.tf + 1.2e0 * (1.0e0 - 0.75e0
                                 + (0.75e0 * dl.dlen) / st.avgdl)))
           AS score
  FROM qt JOIN dfx USING (token) JOIN dl USING (doc_id), st
  GROUP BY 1)
SELECT doc_id, round(score, 4) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT 20
"""

ORACLES["feature_hash"] = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents)
SELECT doc_id,
       CAST({_H.format(x='token')} % 64 AS INTEGER) AS feature,
       count(*) AS cnt
FROM tok WHERE token <> '' GROUP BY 1, 2
"""

# closed-form EWMA twin of the pandas adjust=False recursion:
# y_t = (1-a)^t * (x_0 + sum_{i>=1} a*x_i/(1-a)^i); exact at this
# group depth (max ~100 rows/user -> (1/0.9)^100 ~ 3.7e4). The 1.37e-9
# shift before round(4) mirrors the Spark side: 2-decimal inputs put
# true EWMA values exactly on x.xxxx5 boundaries, where the ~1e-14
# recursion-vs-closed-form gap would flip the rounding.
ORACLES["ewma_smooth"] = """
WITH o AS (
  SELECT event_id, user_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events),
u AS (
  SELECT event_id, user_id, rn,
         CASE WHEN rn = 0 THEN value
              ELSE value * 0.1e0 / pow(0.9e0, rn) END AS uval
  FROM o)
SELECT event_id, user_id,
       round(pow(0.9e0, rn)
             * SUM(uval) OVER (PARTITION BY user_id ORDER BY rn)
             + 1.37e-9, 4)
         AS ewma
FROM u
"""

ORACLES["resample_interpolate"] = """
WITH hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS h,
         MAX(CAST(round(value*100, 0) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT user_id, min(h) AS lo, max(h) AS hi FROM hourly GROUP BY 1),
grid AS (
  SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds)
SELECT g.user_id, g.h,
       round(CASE WHEN hv.v IS NOT NULL THEN CAST(hv.v AS DOUBLE)
             ELSE p.v + ((n.v - p.v) * (epoch(g.h) - epoch(p.h)))
                        / (epoch(n.h) - epoch(p.h)) END, 4) AS v
FROM grid g
LEFT JOIN hourly hv ON hv.user_id = g.user_id AND hv.h = g.h
ASOF JOIN hourly p ON p.user_id = g.user_id AND g.h >= p.h
ASOF JOIN hourly n ON n.user_id = g.user_id AND g.h <= n.h
"""


def _pagerank_oracle(n_iter: int = 5) -> str:
    """Unrolled fixed-iteration PageRank: one CTE pair (contrib, rank)
    per iteration — the SQL twin of the Spark join+sum loop."""
    sql = """
WITH und AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey),
edges AS (SELECT u, v FROM und UNION ALL SELECT v, u FROM und),
deg AS (SELECT u, count(*) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT u AS id FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
r0 AS (SELECT id, 1.0e0 / nn.n AS pr FROM nodes, nn)"""
    for i in range(1, n_iter + 1):
        sql += f""",
c{i} AS (
  SELECT e.v AS id, SUM(r.pr / deg.deg) AS m
  FROM edges e JOIN deg ON deg.u = e.u JOIN r{i - 1} r ON r.id = e.u
  GROUP BY 1),
r{i} AS (
  SELECT nodes.id,
         (1.0e0 - 0.85e0) / nn.n
           + 0.85e0 * coalesce(c{i}.m, 0.0e0) AS pr
  FROM nodes LEFT JOIN c{i} USING (id), nn)"""
    sql += f"""
SELECT r.id AS part, round(r.pr * nn.n, 4) AS pr_scaled
FROM r{n_iter} r, nn"""
    return sql


ORACLES["pagerank"] = _pagerank_oracle(5)

# the salted join's entire claim: identical to the plain equi join
ORACLES["skew_join_salted"] = """
SELECT l.l_orderkey, l.l_linenumber, o.o_orderstatus,
       CAST(round(o.o_totalprice*100, 0) AS BIGINT) AS totalprice_cents
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
"""

# MERGE gate: the oracle recomposes the post-merge table — deletes
# removed, replaced users collapsed to their synthetic row, inserts
# appended
ORACLES["codec_merge"] = """
SELECT event_id, user_id, event_type FROM events
WHERE user_id % 10 NOT IN (0, 5)
UNION ALL
SELECT user_id * 1000000, user_id, 'replaced'
FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 10 = 5)
UNION ALL
SELECT 9000000 + i, 100000 + i, 'inserted' FROM range(0, 5) t(i)
"""


def _hll_oracle() -> str:
    """SQL replay of the HLL sketch with the engine's exact pinned
    constants (repr of the same Python-computed doubles — the DDSketch
    divisor trick), so the estimate matches to 4 decimals."""
    from supersonic_spark.functions.sketches import _hll_alpha
    b, hash_bits = 8, 60
    m = 1 << b
    rb1 = hash_bits - b + 1
    amm = repr(_hll_alpha(m) * m * m)
    h = _H.format(x="CAST(l_partkey AS VARCHAR)")
    return f"""
WITH h AS (
  SELECT l_returnflag AS g, {h} AS hv FROM lineitem),
r AS (
  SELECT g, CAST(hv % {m} AS INTEGER) AS bucket,
         CASE WHEN hv // {m} = 0 THEN {rb1}
              ELSE {rb1} - length(bin(hv // {m})) END AS rho
  FROM h),
regs AS (SELECT g, bucket, max(rho) AS mj FROM r GROUP BY 1, 2),
agg AS (SELECT g, count(*) AS nz, SUM(pow(2.0e0, -mj)) AS s
        FROM regs GROUP BY 1)
SELECT g AS l_returnflag,
       round(CASE WHEN {amm} / (s + ({m} - nz)) <= {2.5 * m!r}
                   AND nz < {m}
                  THEN {float(m)!r} * ln({float(m)!r} / ({m} - nz))
                  ELSE {amm} / (s + ({m} - nz)) END, 4) AS est_distinct
FROM agg
"""


ORACLES["sketch_hll_distinct"] = _hll_oracle()

ORACLES["cooccurrence_pmi"] = """
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS u, b.l_partkey AS v, count(*) AS c_uv
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey GROUP BY 1, 2),
marg AS (SELECT l_partkey AS k, count(*) AS c_k FROM li GROUP BY 1),
nn AS (SELECT count(*) AS n FROM li)
SELECT p.u, p.v, p.c_uv,
       round(ln((nn.n * p.c_uv) / (mu.c_k * mv.c_k)), 4) AS pmi
FROM pairs p
JOIN marg mu ON mu.k = p.u
JOIN marg mv ON mv.k = p.v, nn
WHERE p.c_uv >= 2
"""

# posexplode twin: struct_pack-in-lambda + generate_series (the
# paragraph_dedup idiom); empties filtered BEFORE the window on both
# sides so lead() crosses them identically
ORACLES["bigram_lm"] = """
WITH tok AS (
  SELECT doc_id, u.pos AS pos, u.w AS w FROM (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(p)),
                  i -> struct_pack(pos := i-1, w := p[i]))) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS p FROM documents))
  WHERE u.w <> ''),
bg AS (
  SELECT w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok),
cnt AS (SELECT w1, w2, count(*) AS c_bg FROM bg
        WHERE w2 IS NOT NULL GROUP BY 1, 2),
uni AS (SELECT w1, CAST(SUM(c_bg) AS BIGINT) AS c_w1 FROM cnt GROUP BY 1)
SELECT c.w1, c.w2, c.c_bg, u.c_w1,
       round(c.c_bg / u.c_w1, 4) AS p_cond
FROM cnt c JOIN uni u USING (w1)
WHERE c.c_bg >= 5
"""

ORACLES["asof_join_forward"] = """
SELECT l.event_id, r.signup_cents
FROM (SELECT user_id, ts, event_id FROM events) l
ASOF LEFT JOIN (
  SELECT user_id, ts, CAST(round(value*100,0) AS BIGINT) AS signup_cents
  FROM events WHERE event_type = 'signup') r
ON l.user_id = r.user_id AND l.ts <= r.ts
"""

# nearest = closer of backward (ties included) and strictly-forward;
# exact ties resolve backward. epoch() keeps the fractional seconds the
# Spark side compares (cast-to-double) — every event ts is sub-second.
ORACLES["asof_join_nearest"] = """
WITH s AS (
  SELECT user_id, ts, CAST(round(value*100,0) AS BIGINT) AS signup_cents
  FROM events WHERE event_type = 'signup')
SELECT l.event_id,
       CASE WHEN f.ts IS NULL THEN b.signup_cents
            WHEN b.ts IS NULL THEN f.signup_cents
            WHEN epoch(l.ts) - epoch(b.ts) <= epoch(f.ts) - epoch(l.ts)
              THEN b.signup_cents
            ELSE f.signup_cents END AS signup_cents
FROM (SELECT user_id, ts, event_id FROM events) l
ASOF LEFT JOIN s b ON l.user_id = b.user_id AND l.ts >= b.ts
ASOF LEFT JOIN s f ON l.user_id = f.user_id AND l.ts < f.ts
"""

ORACLES["sessionize_ids"] = """
WITH g AS (
  SELECT event_id, user_id, ts,
         epoch(ts) - epoch(lag(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) AS gap
  FROM events)
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN gap IS NULL OR gap > 1800.0e0 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS INTEGER) AS session_n
FROM g
"""

# expectations audit: each rule recomputed as an independent count over
# the same dirtied view; NULL semantics match ANSI CHECK (range/accepted
# pass NULLs; not_null catches them)
ORACLES["validate_expectations"] = """
WITH d AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus,
         o_orderkey % 1000 AS key_mod,
         nullif(o_orderpriority, '1-URGENT') AS pri,
         o_custkey + CASE WHEN o_orderkey % 50 = 0 THEN 1000000
                          ELSE 0 END AS cust_fk
  FROM orders)
SELECT 'pri_not_null' AS rule,
       CAST(count(*) FILTER (pri IS NULL) AS BIGINT) AS violations FROM d
UNION ALL
SELECT 'price_range',
       CAST(count(*) FILTER (o_totalprice < 1.0 OR o_totalprice > 200000.0)
            AS BIGINT) FROM d
UNION ALL
SELECT 'status_accepted',
       CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F'))
            AS BIGINT) FROM d
UNION ALL
SELECT 'key_mod_unique',
       CAST(count(key_mod) - count(DISTINCT key_mod) AS BIGINT) FROM d
UNION ALL
SELECT 'orderkey_unique',
       CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) FROM d
UNION ALL
SELECT 'custkey_fk', CAST(count(*) AS BIGINT) FROM d
WHERE cust_fk IS NOT NULL
  AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = d.cust_fk)
"""

# inverted index: postings string rebuilt with ORDER BY inside
# string_agg — byte-identical to Spark's array_sort(collect_list)
ORACLES["inverted_index"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token <> '' GROUP BY 1, 2)
SELECT token, CAST(count(*) AS BIGINT) AS df_docs,
       string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
FROM tf GROUP BY token HAVING count(*) BETWEEN 2 AND 499
"""

# winnowing: same positional 3-grams, same 60-bit md5 hash, same
# string-key windowed min (hash-hex padded to 15 || pos padded to 8),
# same window-start clamp for short docs
ORACLES["winnow_fingerprints"] = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE length(trim(text)) > 0),
grams AS (
  SELECT doc_id, u.i - 1 AS pos,
         t[u.i] || ' ' || t[u.i+1] || ' ' || t[u.i+2] AS gram
  FROM toks, unnest(generate_series(1, len(t) - 2)) AS u(i)
  WHERE len(t) >= 3),
keyed AS (
  SELECT doc_id, pos,
         lpad(hex(('0x' || substr(md5(gram), 1, 15))::BIGINT), 15, '0')
           || lpad(CAST(pos AS VARCHAR), 8, '0') AS key
  FROM grams),
sel AS (
  SELECT doc_id, pos,
         min(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel_key,
         count(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM keyed),
dd AS (
  SELECT DISTINCT doc_id, sel_key FROM sel
  WHERE pos <= greatest(n_grams - 4, 0))
SELECT doc_id,
       CAST(substr(sel_key, 16, 8) AS INTEGER) AS fp_pos,
       ('0x' || substr(sel_key, 1, 15))::BIGINT AS fp_hash
FROM dd
"""

# prefix-filter join is LOSSLESS, so the oracle is the brute-force
# exact pair set (no cap, no blocking) — the gate proves equivalence
ORACLES["jaccard_prefix_join"] = r"""
WITH g AS (
  SELECT DISTINCT doc_id, tok AS g FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS tok
    FROM documents WHERE length(trim(text)) > 0)),
sizes AS (SELECT doc_id, count(*) AS sz FROM g GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM g a JOIN g b ON a.g = b.g
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(n_inter / (sa.sz + sb.sz - n_inter), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE round(n_inter / (sa.sz + sb.sz - n_inter), 4) >= 0.5
"""

# transcript integrity audit over the corrupted conversation view:
# row_number/lag replayed identically; interval arithmetic on DuckDB
# timestamps matches Spark's (both microsecond-precision naive ts)
ORACLES["conv_integrity_audit"] = """
WITH base AS (
  SELECT 'c' || user_id AS conv_id, event_id, ts, props,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events),
v AS (
  SELECT conv_id, rn AS turn_idx,
         CASE WHEN event_id % 13 = 0 THEN 'assistant'
              WHEN rn % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 17 = 0 THEN '  ' ELSE props END AS text,
         CASE WHEN event_id % 31 = 0 THEN ts - INTERVAL 2 HOUR
              ELSE ts END AS ts
  FROM base WHERE event_id % 7 <> 0),
x AS (
  SELECT conv_id, turn_idx, role, text, ts,
         lag(turn_idx) OVER w AS pidx,
         lag(role) OVER w AS prole,
         lag(ts) OVER w AS pts,
         row_number() OVER w = 1 AS first
  FROM v WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx))
SELECT 'turn_gap' AS check,
       CAST(count(*) FILTER (pidx IS NOT NULL AND turn_idx <> pidx + 1)
            AS BIGINT) AS violations FROM x
UNION ALL
SELECT 'role_repeat',
       CAST(count(*) FILTER (role IN ('user','assistant')
                             AND prole IN ('user','assistant')
                             AND role = prole) AS BIGINT) FROM x
UNION ALL
SELECT 'ts_regression',
       CAST(count(*) FILTER (pts IS NOT NULL AND ts < pts) AS BIGINT)
FROM x
UNION ALL
SELECT 'empty_text',
       CAST(count(*) FILTER (length(trim(coalesce(text, ''))) = 0)
            AS BIGINT) FROM x
UNION ALL
SELECT 'first_turn',
       CAST(count(*) FILTER (first AND NOT (turn_idx = 0
                                            AND role = 'user'))
            AS BIGINT) FROM x
"""

# per-conversation rollup over the same corrupted view; token counts
# use the shared whitespace tokenizer (blank text -> 0 tokens)
ORACLES["conv_stats"] = r"""
WITH base AS (
  SELECT 'c' || user_id AS conv_id, event_id, ts, props,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events),
v AS (
  SELECT conv_id, rn AS turn_idx,
         CASE WHEN event_id % 13 = 0 THEN 'assistant'
              WHEN rn % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         CASE WHEN event_id % 17 = 0 THEN '  ' ELSE props END AS text,
         CASE WHEN event_id % 31 = 0 THEN ts - INTERVAL 2 HOUR
              ELSE ts END AS ts
  FROM base WHERE event_id % 7 <> 0)
SELECT conv_id,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(count(*) FILTER (role = 'user') AS BIGINT) AS n_user,
       CAST(count(*) FILTER (role = 'assistant') AS BIGINT)
         AS n_assistant,
       CAST(count(*) FILTER (role = 'tool') AS BIGINT) AS n_tool,
       CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len(string_split_regex(trim(text), '\s+')) END)
            AS BIGINT) AS n_tokens,
       CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000
            AS BIGINT) AS span_sec
FROM v GROUP BY conv_id
"""

# count-min sketch replayed cell-for-cell: same md5 bucket arithmetic
# (row || chr(31) || key), d=4 rows, w=64 buckets, min over counters
ORACLES["sketch_count_min"] = """
WITH r AS (SELECT unnest([0, 1, 2, 3]) AS row),
cells AS (
  SELECT row,
         CAST(('0x' || substr(md5(CAST(row AS VARCHAR) || chr(31)
                                  || event_type), 1, 15))::BIGINT % 64
              AS INTEGER) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events, r GROUP BY 1, 2),
ks AS (SELECT DISTINCT event_type FROM events),
probes AS (
  SELECT event_type AS key, row,
         CAST(('0x' || substr(md5(CAST(row AS VARCHAR) || chr(31)
                                  || event_type), 1, 15))::BIGINT % 64
              AS INTEGER) AS bucket
  FROM ks, r)
SELECT key, CAST(min(coalesce(cnt, 0)) AS BIGINT) AS est_count
FROM probes LEFT JOIN cells USING (row, bucket)
GROUP BY key
"""

# normalization chain with RE2 twins of the Java patterns; the dirty
# construction (tab/ZWSP/control noise on doc_id%3=0) is replayed with
# chr() codepoints
ORACLES["text_normalize"] = """
WITH dirty AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN chr(9) || 'x ' || text || ' y' || chr(8203) || 'z'
                   || chr(1) || '  w'
              ELSE text END AS raw
  FROM documents),
n AS (
  SELECT doc_id, raw,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(raw,
               '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
             '[\\x00-\\x1F\\x7F\\x{0080}-\\x{009F}]', ' ', 'g'),
           ' +', ' ', 'g')) AS norm
  FROM dirty)
SELECT doc_id, norm,
       CAST(CASE WHEN norm <> raw THEN 1 ELSE 0 END AS INTEGER)
         AS changed
FROM n
"""

# the bloom prefilter is exact (false positives die in the semi join),
# so the oracle is the PLAIN semi join aggregate
ORACLES["bloom_prefilter_join"] = """
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""

# bigram LM cross-entropy replayed exactly: same tokenization, same
# lead-window bigrams, same add-0.5 smoothing over integer counts
ORACLES["lm_perplexity"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
pos AS (
  SELECT doc_id, u.i AS pos, t[u.i] AS w
  FROM toks, unnest(generate_series(1, len(t))) AS u(i)),
tok AS (SELECT * FROM pos WHERE w <> ''),
bg AS (
  SELECT doc_id, w AS w1,
         lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM tok),
bg2 AS (SELECT doc_id, w1, w2 FROM bg WHERE w2 IS NOT NULL),
c_bg AS (SELECT w1, w2, count(*) AS c_bg FROM bg2 GROUP BY 1, 2),
c_w1 AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_w1
         FROM c_bg GROUP BY 1),
v AS (SELECT count(*) AS v FROM c_w1),
lp AS (
  SELECT doc_id, ln((c_bg + 0.5) / (c_w1 + 0.5 * v)) AS lp
  FROM bg2 JOIN c_bg USING (w1, w2) JOIN c_w1 USING (w1), v)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(-sum(lp) / count(*), 4) AS xent,
       CAST(CASE WHEN round(-sum(lp) / count(*), 4) <= 3.39
            THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM lp GROUP BY doc_id
"""

# Hamilton apportionment + smallest-portable-hash pick, all integer
# arithmetic, replayed step for step
ORACLES["stratified_sample"] = """
WITH c AS (SELECT source, count(*) AS c_s FROM documents GROUP BY 1),
n AS (SELECT sum(c_s) AS n FROM c),
a AS (SELECT source, c_s,
             CAST((100 * c_s) // n AS BIGINT) AS n_floor,
             CAST((100 * c_s) % n AS BIGINT) AS rem
      FROM c, n),
l AS (SELECT CAST(100 - sum(n_floor) AS BIGINT) AS leftover FROM a),
al AS (
  SELECT source,
         n_floor + CASE WHEN row_number()
                             OVER (ORDER BY rem DESC, source) <= leftover
                        THEN 1 ELSE 0 END AS n_s
  FROM a, l),
r AS (
  SELECT d.doc_id, d.source,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY ('0x' || substr(md5('strat#'
                     || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                    doc_id) AS rn
  FROM documents d)
SELECT r.doc_id, r.source FROM r JOIN al USING (source) WHERE rn <= n_s
"""

# skyline: distinct-size threshold table with the same two RANGE
# frames, NOT-EXISTS dominance semantics
ORACLES["skyline_parts"] = """
WITH p AS (
  SELECT p_partkey, p_size,
         CAST(round(p_retailprice * 100) AS BIGINT) AS price_cents
  FROM part),
pm AS (SELECT p_size, min(price_cents) AS mn FROM p GROUP BY 1),
th AS (
  SELECT p_size,
         min(mn) OVER (ORDER BY p_size DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS m_gt,
         min(mn) OVER (ORDER BY p_size DESC
                       RANGE BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS m_ge
  FROM pm)
SELECT p.p_partkey, p.p_size, p.price_cents
FROM p JOIN th USING (p_size)
WHERE (m_gt IS NULL OR m_gt > price_cents) AND m_ge >= price_cents
"""

# distribution/tile window functions — identical ordering key
# (ts, event_id) makes every function deterministic
ORACLES["window_rank_variants"] = """
SELECT event_id,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       nth_value(event_id, 3) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS third_id
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# RRF fusion: both rankers' CTEs replayed (rounded scores, identical
# (score desc, id) tie-break), ranks fused as sum 1/(60+rank)
ORACLES["rrf_hybrid_retrieval"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok
  WHERE token <> '' GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dlen FROM tf GROUP BY 1),
st AS (SELECT avg(dlen) AS avgdl, count(*) AS n FROM dl),
qt AS (SELECT * FROM tf WHERE token IN ('spark', 'window', 'hash')),
dfx AS (SELECT token, count(*) AS df FROM qt GROUP BY 1),
lex AS (
  SELECT doc_id, round(SUM(
           (ln(1.0e0 + (st.n - dfx.df + 0.5e0) / (dfx.df + 0.5e0))
            * (qt.tf * 2.2e0))
           / (qt.tf + 1.2e0 * (1.0e0 - 0.75e0
                               + (0.75e0 * dl.dlen) / st.avgdl))), 4)
           AS score
  FROM qt JOIN dfx USING (token) JOIN dl USING (doc_id), st
  GROUP BY 1 ORDER BY score DESC, doc_id LIMIT 50),
vec AS (
  SELECT vec_id AS doc_id,
         round(list_cosine_similarity(
           embedding::DOUBLE[],
           (SELECT embedding FROM embeddings WHERE vec_id = 0)
             ::DOUBLE[]), 4) AS score
  FROM embeddings
  WHERE vec_id IN (SELECT doc_id FROM documents)
  ORDER BY score DESC, doc_id LIMIT 50),
ranked AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM lex
  UNION ALL
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM vec)
SELECT doc_id, round(sum(1.0e0 / (60 + r)), 6) AS rrf,
       CAST(count(*) AS BIGINT) AS n_lists
FROM ranked GROUP BY doc_id
ORDER BY rrf DESC, doc_id LIMIT 20
"""

# anti-entropy: both sides' (bucket, count, xor-of-row-hashes)
# summaries replayed with the same md5 arithmetic and sentinels
ORACLES["antientropy_diff"] = """
WITH a AS (SELECT doc_id, text, lang, source FROM documents),
b AS (
  SELECT doc_id,
         CASE WHEN doc_id % 101 = 0 THEN text || ' [edited]'
              ELSE text END AS text,
         lang, source
  FROM documents WHERE doc_id % 97 <> 0
  UNION ALL
  SELECT doc_id + 1000000, text, lang, source
  FROM documents WHERE doc_id % 211 = 0),
sa AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              ::BIGINT % 4096 AS INTEGER) AS bucket,
         count(*) AS n_a,
         bit_xor(('0x' || substr(md5(
           CAST(doc_id AS VARCHAR) || chr(31) || coalesce(text, chr(1))
           || chr(31) || coalesce(lang, chr(1)) || chr(31)
           || coalesce(source, chr(1))), 1, 15))::BIGINT) AS x_a
  FROM a GROUP BY 1),
sb AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              ::BIGINT % 4096 AS INTEGER) AS bucket,
         count(*) AS n_b,
         bit_xor(('0x' || substr(md5(
           CAST(doc_id AS VARCHAR) || chr(31) || coalesce(text, chr(1))
           || chr(31) || coalesce(lang, chr(1)) || chr(31)
           || coalesce(source, chr(1))), 1, 15))::BIGINT) AS x_b
  FROM b GROUP BY 1)
SELECT bucket,
       CAST(coalesce(n_a, 0) AS BIGINT) AS n_a,
       CAST(coalesce(n_b, 0) AS BIGINT) AS n_b,
       CASE WHEN n_a IS NULL THEN 'added'
            WHEN n_b IS NULL THEN 'removed'
            ELSE 'changed' END AS status
FROM sa FULL OUTER JOIN sb USING (bucket)
WHERE n_a IS NULL OR n_b IS NULL OR n_a <> n_b OR x_a <> x_b
"""

# Markov role transitions: the dirty conversation view replayed (same
# CTE as conv_stats), lead(role) pairs, per-source-role normalization
ORACLES["markov_role_transitions"] = """
WITH base AS (
  SELECT 'c' || user_id AS conv_id, event_id, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events),
v AS (
  SELECT conv_id, rn AS turn_idx,
         CASE WHEN event_id % 13 = 0 THEN 'assistant'
              WHEN rn % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
  FROM base WHERE event_id % 7 <> 0),
pairs AS (
  SELECT role,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS next_role
  FROM v),
cnt AS (
  SELECT role, next_role, count(*) AS n
  FROM pairs WHERE next_role IS NOT NULL GROUP BY 1, 2)
SELECT role, next_role, CAST(n AS BIGINT) AS n,
       round(n / sum(n) OVER (PARTITION BY role), 6) AS p
FROM cnt
"""

# melt replayed as UNION ALL over the wide aggregate (DuckDB's UNPIVOT
# would also work; UNION ALL keeps the oracle engine-agnostic)
ORACLES["unpivot_melt"] = """
WITH w AS (
  SELECT o_orderpriority,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice*100, 0) AS BIGINT))
              AS BIGINT) AS sum_cents,
         CAST(max(CAST(round(o_totalprice*100, 0) AS BIGINT))
              AS BIGINT) AS max_cents
  FROM orders GROUP BY 1)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM w
UNION ALL
SELECT o_orderpriority, 'sum_cents', sum_cents FROM w
UNION ALL
SELECT o_orderpriority, 'max_cents', max_cents FROM w
"""

# exact linear-interpolation percentiles: Spark percentile() and DuckDB
# quantile_cont() both take value[floor(h)] + frac*(next - value) at
# h = p*(n-1); integer-cents input keeps the arithmetic identical
ORACLES["percentile_exact_groups"] = """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.5),
             4) AS p50,
       round(quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.9),
             4) AS p90,
       round(quantile_cont(CAST(round(value*100, 0) AS BIGINT), 0.99),
             4) AS p99
FROM events GROUP BY 1
"""

# gaps-and-islands: island id = global row_number - run-role row_number,
# constant within a consecutive tool run
ORACLES["conv_tool_runs"] = """
WITH base AS (
  SELECT 'c' || user_id AS conv_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS turn_idx
  FROM events),
v AS (
  SELECT conv_id, turn_idx,
         CASE WHEN event_type IN ('click', 'error') THEN 'tool'
              WHEN turn_idx % 2 = 0 THEN 'user'
              ELSE 'assistant' END AS role
  FROM base),
r AS (
  SELECT conv_id, turn_idx, role,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS rn_all
  FROM v),
t AS (
  SELECT conv_id,
         rn_all - row_number() OVER (PARTITION BY conv_id
                                     ORDER BY turn_idx) AS island
  FROM r WHERE role = 'tool'),
runs AS (
  SELECT conv_id, island, count(*) AS len FROM t GROUP BY 1, 2)
SELECT conv_id, CAST(max(len) AS BIGINT) AS max_tool_run,
       CAST(count(*) AS BIGINT) AS n_tool_runs,
       CAST(sum(len) AS BIGINT) AS n_tool_turns
FROM runs GROUP BY 1
"""

# LSH candidates (same CTE as dedup_lsh_pairs) verified by exact
# Levenshtein distance: confirmed iff dist*5 <= longer text's length
ORACLES["dedup_editdist_verify"] = f"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE doc_id < 200),
sh AS (
  SELECT doc_id, unnest(t) AS shingle FROM toks),
hashed AS (
  SELECT doc_id, k.i AS i,
         {_H.format(x="shingle || '#' || k.i")} AS h
  FROM sh, UNNEST(generate_series(0, 7)) AS k(i)),
sig AS (SELECT doc_id, i, MIN(h) AS minhash FROM hashed GROUP BY doc_id, i),
banded AS (
  SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         string_agg(i || ':' || minhash, ',' ORDER BY i) AS band_key
  FROM sig GROUP BY doc_id, band),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT p.id_a, p.id_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
       levenshtein(da.text, db.text) * 5
         <= greatest(length(da.text), length(db.text)) AS confirmed
FROM pairs p
JOIN documents da ON da.doc_id = p.id_a
JOIN documents db ON db.doc_id = p.id_b
"""

# consecutive same-role runs: island = running sum of change flags,
# texts re-joined in turn order by string_agg ORDER BY
ORACLES["conv_merge_turns"] = """
WITH base AS (
  SELECT 'c' || user_id AS conv_id, event_id, ts, props,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) - 1 AS rn
  FROM events),
v AS (
  SELECT conv_id, rn AS turn_idx,
         CASE WHEN event_id % 13 = 0 THEN 'assistant'
              WHEN rn % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         coalesce(CASE WHEN event_id % 17 = 0 THEN '  '
                       ELSE props END, '') AS text
  FROM base WHERE event_id % 7 <> 0),
flagged AS (
  SELECT conv_id, turn_idx, role, text,
         CASE WHEN lag(role) OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) IS DISTINCT
                   FROM role THEN 1 ELSE 0 END AS chg
  FROM v),
isl AS (
  SELECT conv_id, turn_idx, role, text,
         sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM flagged)
SELECT conv_id, min(turn_idx) AS turn_idx, min(role) AS role,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text,
       CAST(count(*) AS BIGINT) AS n_merged
FROM isl GROUP BY conv_id, island
"""

# per-doc character entropy: identical char split (empty separator
# chars both engines), per-(doc,char) counts, -sum(p*log2 p)
ORACLES["text_char_entropy"] = """
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
counts AS (
  SELECT doc_id, ch, count(*) AS c FROM chars
  WHERE ch <> '' GROUP BY 1, 2),
t AS (
  SELECT doc_id, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM counts)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
       round(-sum((c / n) * log2(c / n)), 4) AS entropy
FROM t GROUP BY doc_id
"""
