"""DuckDB oracle SQL for every driver query (single artifact).

Split from pipelines/queries.py; entries stay one dict so the SQL corpus
reads as a whole and queries.py re-exports it unchanged.
"""

from __future__ import annotations

__all__ = ["ORACLE_SQL"]


# SQL uses only pre-registered views (part, events, nation, ...). Column names
# must match the Ray outputs exactly.


_IMG = """
    SELECT 'img_' || p_partkey AS image_id,
           p_partkey AS i,
           CAST(64 + (p_partkey * 37) % 193 AS DOUBLE) AS w,
           CAST(64 + (p_partkey * 53) % 151 AS DOUBLE) AS h,
           CAST((p_partkey % 1000) * 256 AS DOUBLE) AS minx,
           CAST((p_partkey // 1000) * 256 AS DOUBLE) AS miny,
           CAST((p_partkey % 1000) * 256 + 64 + (p_partkey * 37) % 193 AS DOUBLE) AS maxx,
           CAST((p_partkey // 1000) * 256 + 64 + (p_partkey * 53) % 151 AS DOUBLE) AS maxy
    FROM part
"""


_PTS = """
    SELECT event_id,
           CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS DOUBLE) AS px,
           CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS DOUBLE) AS py
    FROM events
"""


# CTE chain deriving every image's integer block-mean hash from the
# generator rule (splitmix64 seeds, gradient pixels, raw0/qz1 dequantize,
# HUGEINT hash assembly): shared by phash_near_dup and image_curation


_IMG_IHASH_CTES = r'''n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
),
-- gray block sums over the floor-start 8x8 partition: pixel y is in block
-- row (8y+7)//h (identity for starts floor(r*h/8)); same for columns
bsum AS (
    SELECT i, h, w,
           (8 * y + 7) // h AS br,
           (8 * x + 7) // w AS bc,
           sum(d0 + d1 + d2) AS s
    FROM dec
    GROUP BY i, h, w, br, bc
),
tot AS (SELECT i, sum(s) AS t FROM bsum GROUP BY i),
hashes AS (
    SELECT b.i,
           sum(CASE WHEN b.s * (b.h * b.w)
                        > tot.t * ((((b.br + 1) * b.h) // 8 - (b.br * b.h) // 8)
                                   * (((b.bc + 1) * b.w) // 8 - (b.bc * b.w) // 8))
                    THEN (CAST(1 AS HUGEINT) << CAST(63 - (b.br * 8 + b.bc) AS INTEGER))
                    ELSE 0 END) AS v
    FROM bsum b JOIN tot ON b.i = tot.i
    GROUP BY b.i
),
signed AS (
    SELECT i,
           CAST(CASE WHEN v >= 9223372036854775808
                     THEN v - 18446744073709551616 ELSE v END AS BIGINT) AS ihash
    FROM hashes
)'''


ORACLE_SQL = {
    "tile_assignment": f"""
        WITH img AS ({_IMG})
        SELECT image_id,
               CAST(floor(minx / 256) + dx.x AS BIGINT) AS tile_x,
               CAST(floor(miny / 256) + dy.y AS BIGINT) AS tile_y
        FROM img
        CROSS JOIN (SELECT unnest([0, 1]) AS x) dx
        CROSS JOIN (SELECT unnest([0, 1]) AS y) dy
        WHERE floor(minx / 256) + dx.x <= floor((maxx - 1e-9) / 256)
          AND floor(miny / 256) + dy.y <= floor((maxy - 1e-9) / 256)
    """,
    "pip_join": f"""
        WITH img AS ({_IMG}), pts AS ({_PTS})
        SELECT img.image_id, img.i, pts.event_id
        FROM img JOIN pts
          ON pts.px >= img.minx AND pts.px < img.maxx
         AND pts.py >= img.miny AND pts.py < img.maxy
    """,
    "pip_anti_join": f"""
        WITH img AS ({_IMG}), pts AS ({_PTS})
        SELECT pts.event_id
        FROM pts
        WHERE NOT EXISTS (
            SELECT 1 FROM img
            WHERE pts.px >= img.minx AND pts.px < img.maxx
              AND pts.py >= img.miny AND pts.py < img.maxy
        )
    """,
    "geo_pruned_read": f"""
        WITH img AS ({_IMG})
        SELECT image_id, minx, miny, maxx, maxy
        FROM img
        WHERE minx < 46600 AND maxx >= 25600 AND miny < 4096 AND maxy >= 0
    """,
    "spatial_pruned_read": f"""
        WITH pts AS ({_PTS})
        SELECT CAST(px AS BIGINT) // 2048 + 1024 * (CAST(py AS BIGINT) // 2048)
                   AS gcell,
               CAST(count(*) AS BIGINT) AS n_points,
               CAST(min(event_id) AS BIGINT) AS min_eid,
               CAST(sum(event_id) AS BIGINT) AS sum_eid
        FROM pts
        WHERE px >= 131072 AND px < 197608 AND py >= 0 AND py < 4096
        GROUP BY 1
    """,
    "pip_join_agg": f"""
        WITH img AS ({_IMG}), pts AS ({_PTS})
        SELECT img.image_id, count(*) AS n_points
        FROM img JOIN pts
          ON pts.px >= img.minx AND pts.px < img.maxx
         AND pts.py >= img.miny AND pts.py < img.maxy
        GROUP BY img.image_id
    """,
    "clip_join": f"""
        WITH img AS ({_IMG}),
        tiles AS (
            SELECT *,
                   CAST(floor(minx / 256) + dx.x AS BIGINT) AS tile_x,
                   CAST(floor(miny / 256) + dy.y AS BIGINT) AS tile_y
            FROM img
            CROSS JOIN (SELECT unnest([0, 1]) AS x) dx
            CROSS JOIN (SELECT unnest([0, 1]) AS y) dy
            WHERE floor(minx / 256) + dx.x <= floor((maxx - 1e-9) / 256)
              AND floor(miny / 256) + dy.y <= floor((maxy - 1e-9) / 256)
        )
        SELECT image_id, tile_x, tile_y,
               greatest(least(maxx, (tile_x + 1) * 256) - greatest(minx, tile_x * 256), 0)
             * greatest(least(maxy, (tile_y + 1) * 256) - greatest(miny, tile_y * 256), 0)
               AS clip_area
        FROM tiles
    """,
    "knn": f"""
        WITH pts AS ({_PTS}),
        q AS (
            SELECT CAST(n_nationkey AS BIGINT) AS q_id,
                   CAST(n_nationkey * 256 + 128 AS DOUBLE) AS qx,
                   CAST((n_nationkey % 5) * 256 + 128 AS DOUBLE) AS qy
            FROM nation
        )
        SELECT q_id, event_id,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY (px - qx) * (px - qx) + (py - qy) * (py - qy), event_id
               ) AS rnk
        FROM q CROSS JOIN pts
        QUALIFY rnk <= 5
    """,
    "dedup_events": """
        SELECT user_id, event_type, min(event_id) AS event_id
        FROM events GROUP BY user_id, event_type
    """,
    "dedup_docs": """
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY text
    """,
    "token_count": """
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    # same RE2 pattern the Ray stage compiles (stages/text.py
    # BPE_PRETOKEN_PATTERN) — leftmost-first alternation matches Python re
    "bpe_tokens": """
        SELECT doc_id,
               CAST(len(regexp_extract_all(
                   text, '''[a-z]+| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n]+|[ \t\n]+'
               )) AS BIGINT) AS n_bpe_tokens
        FROM documents
    """,
    "text_quality": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_calc,
               CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (length(text) - length(replace(text, ' ', ''))) AS DOUBLE)
                 / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
        FROM documents
    """,
    # curation_pipeline: quality rules, dedup, the prefix-filter-exact
    # jaccard pair rule and the multiplicative-hash split are ALL pure
    # functions of the text/ids, so the whole composed chain re-derives in
    # one CTE chain
    "curation_pipeline": """
        WITH q AS (
            SELECT doc_id, text,
                   len(string_split(text, ' ')) AS n_tokens,
                   CAST(length(text) - (length(text) - length(replace(text, ' ', '')))
                        AS DOUBLE) / len(string_split(text, ' ')) AS atl
            FROM documents
        ),
        f AS (SELECT doc_id, text FROM q
              WHERE n_tokens >= 5 AND atl >= 3 AND atl <= 12),
        d AS (SELECT min(doc_id) AS doc_id, text FROM f GROUP BY text),
        tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM d),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        dup AS (
            SELECT DISTINCT b.doc_id AS doc_b
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                  / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
        ),
        keep AS (SELECT d.doc_id, d.text FROM d
                 WHERE d.doc_id NOT IN (SELECT doc_b FROM dup)),
        s AS (
            SELECT doc_id,
                   len(string_split(text, ' ')) AS n_tokens,
                   CASE WHEN (doc_id * 2654435761) % 4294967296 % 10 = 9
                        THEN 'val' ELSE 'train' END AS split
            FROM keep
        )
        SELECT split,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
               CAST(sum(doc_id) AS BIGINT) AS sum_doc_id
        FROM s GROUP BY split
    """,
    "ann_topk": """
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS qe FROM embeddings
            ORDER BY vec_id LIMIT 8
        )
        SELECT q_id, e.vec_id AS vec_id,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id
               ) AS rnk
        FROM q CROSS JOIN embeddings e
        QUALIFY rnk <= 10
    """,
    # NOTE: DuckDB sum(BIGINT) returns HUGEINT (int128) which the driver's
    # hash path widens to float64 — CAST every aggregate back to BIGINT so the
    # oracle dtype matches the Ray int64 outputs exactly.
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000) AS BIGINT)) AS BIGINT) AS sum_rev_u,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "events_window": """
        SELECT event_type,
               CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS hour_bucket,
               count(*) AS n,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c
        FROM events GROUP BY 1, 2
    """,
    # hopping window = UNION ALL of the two hop offsets (size/hop = 2)
    "hopping_window": """
        WITH assigned AS (
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 1800000000) * 1800000000 AS BIGINT)
                       AS wnd_start_us,
                   CAST(floor(value * 100) AS BIGINT) AS value_c
            FROM events
            UNION ALL
            SELECT event_type,
                   CAST(floor(epoch_us(ts) / 1800000000) * 1800000000
                        - 1800000000 AS BIGINT) AS wnd_start_us,
                   CAST(floor(value * 100) AS BIGINT) AS value_c
            FROM events
        )
        SELECT event_type, wnd_start_us,
               count(*) AS n,
               CAST(sum(value_c) AS BIGINT) AS sum_value_c
        FROM assigned GROUP BY 1, 2
    """,
    "top_orders": """
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    # no-prior-click is encoded as -1 (not NULL) on BOTH sides: a nullable
    # BIGINT degrades to float64-NaN through pandas, which breaks the driver's
    # dtype-sensitive value hash even when values agree.
    "range_join": """
        SELECT c.event_id AS click_id,
               p.event_id AS purchase_id
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id
         AND p.ts > c.ts
         AND p.ts <= c.ts + INTERVAL 6 HOUR
    """,
    "asof_join": """
        SELECT p.event_id AS purchase_id,
               CAST(coalesce(c.event_id, -1) AS BIGINT) AS click_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts > c.ts
    """,
    "sessionize": """
        WITH marked AS (
            SELECT user_id, event_id,
                   CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                            OVER (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                        OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, event_id,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS session_seq
            FROM marked
        )
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               count(*) AS n_events, min(event_id) AS first_event
        FROM sessions GROUP BY user_id, session_seq
    """,
    "fingerprint": """
        SELECT doc_id, md5(text) AS fp FROM documents
    """,
    # winnowing (Schleimer 2003) replayed in exact integer SQL: k=8-gram
    # polynomial hash over codepoints mod 1021 (base 131, exact in BIGINT),
    # fp key = (h % 2147483647) * 2^21 - pos (min key == min hash with the
    # RIGHTMOST position), one window-min per start, distinct selections.
    # Window starts are rows 1 .. npos-3 (or just row 1 when a doc has fewer
    # than 4 k-gram positions — the frame clips to all of them).
    "winnow_fp": """
        WITH idx AS (
            SELECT doc_id, text, length(text) - 7 AS npos,
                   unnest(range(1, greatest(length(text) - 6, 1))) AS i
            FROM documents
        ),
        pos AS (
            SELECT doc_id, CAST(i AS BIGINT) AS i, npos,
                   CAST(unicode(substr(text, CAST(i AS INT), 1)) % 1021 AS BIGINT) * 662062621900811
                 + CAST(unicode(substr(text, CAST(i AS INT) + 1, 1)) % 1021 AS BIGINT) * 5053913144281
                 + CAST(unicode(substr(text, CAST(i AS INT) + 2, 1)) % 1021 AS BIGINT) * 38579489651
                 + CAST(unicode(substr(text, CAST(i AS INT) + 3, 1)) % 1021 AS BIGINT) * 294499921
                 + CAST(unicode(substr(text, CAST(i AS INT) + 4, 1)) % 1021 AS BIGINT) * 2248091
                 + CAST(unicode(substr(text, CAST(i AS INT) + 5, 1)) % 1021 AS BIGINT) * 17161
                 + CAST(unicode(substr(text, CAST(i AS INT) + 6, 1)) % 1021 AS BIGINT) * 131
                 + (unicode(substr(text, CAST(i AS INT) + 7, 1)) % 1021)
                   AS h
            FROM idx
        ),
        keyed AS (
            SELECT doc_id, i, npos,
                   (h % 2147483647) * 2097152 - i AS key
            FROM pos
        ),
        wins AS (
            SELECT doc_id, i, npos,
                   min(key) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING
                   ) AS fp_key
            FROM keyed
        )
        SELECT DISTINCT doc_id, fp_key
        FROM wins
        WHERE i <= greatest(npos - 3, 1)
    """,
    # the LangId heuristic verbatim (stages/text.py): CJK codepoint in the
    # first 200 chars -> zh; else argmax of stopword counts with ties going
    # to the earlier language in (en, de, fr, es) profile order
    "lang_id": """
        WITH c AS (
            SELECT doc_id,
                   regexp_matches(left(text, 200), '[\\x{4e00}-\\x{9fff}]') AS cjk,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['the','and','of','a','to','in','is','it','for'], w))) AS en_c,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['der','die','und','das','ist','nicht','ein','zu'], w))) AS de_c,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['le','la','les','et','est','une','pour','dans'], w))) AS fr_c,
                   len(list_filter(string_split(lower(text), ' '),
                       w -> list_contains(['el','la','los','y','es','una','para','en','que'], w))) AS es_c
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN cjk THEN 'zh'
                    WHEN es_c > greatest(en_c, de_c, fr_c) THEN 'es'
                    WHEN fr_c > greatest(en_c, de_c) THEN 'fr'
                    WHEN de_c > en_c THEN 'de'
                    ELSE 'en' END AS lang_pred
        FROM c
    """,
    # corpus rule (q_buffer_by_m): segment (0,0)->(L,0) with constant M=m,
    # L = 10+k%7, m = 1+k%4; buffer = Minkowski sum of segment and 32-gon:
    # area = 16 m^2 sin(pi/16) + 2 m L (digest: floor(area*100))
    "buffer_by_m": """
        WITH p AS (
            SELECT s_suppkey,
                   CAST(1 + s_suppkey % 4 AS DOUBLE) AS m,
                   CAST(10 + s_suppkey % 7 AS DOUBLE) AS L
            FROM supplier
        )
        SELECT s_suppkey,
               CAST(floor((16 * m * m * sin(pi() / 16) + 2 * m * L) * 100) AS BIGINT)
                   AS buffer_area_c
        FROM p
    """,
    # corpus rule (q_overlay_nary): three overlapping axis-aligned integer
    # rectangles per key; union / difference / intersection areas recomputed
    # by inclusion-exclusion over the bounds — exact integer arithmetic, so
    # the sweep's float areas must round to the same scaled digests
    "overlay_nary": """
        WITH r AS (
            SELECT s_suppkey,
                   0 AS ax1, 0 AS ay1,
                   10 + s_suppkey % 5 AS ax2, 8 + s_suppkey % 3 AS ay2,
                   4 + s_suppkey % 3 AS bx1, 2 + s_suppkey % 2 AS by1,
                   13 + s_suppkey % 3 + s_suppkey % 4 AS bx2,
                   9 + 2 * (s_suppkey % 2) AS by2,
                   2 + s_suppkey % 2 AS cx1, 5 + s_suppkey % 3 AS cy1,
                   10 + s_suppkey % 2 + s_suppkey % 5 AS cx2,
                   11 + s_suppkey % 3 + s_suppkey % 4 AS cy2
            FROM supplier
        ),
        i AS (
            SELECT s_suppkey,
                   (ax2 - ax1) * (ay2 - ay1) AS a_a,
                   (bx2 - bx1) * (by2 - by1) AS a_b,
                   (cx2 - cx1) * (cy2 - cy1) AS a_c,
                   greatest(least(ax2, bx2) - greatest(ax1, bx1), 0)
                 * greatest(least(ay2, by2) - greatest(ay1, by1), 0) AS i_ab,
                   greatest(least(ax2, cx2) - greatest(ax1, cx1), 0)
                 * greatest(least(ay2, cy2) - greatest(ay1, cy1), 0) AS i_ac,
                   greatest(least(bx2, cx2) - greatest(bx1, cx1), 0)
                 * greatest(least(by2, cy2) - greatest(by1, cy1), 0) AS i_bc,
                   greatest(least(ax2, bx2, cx2) - greatest(ax1, bx1, cx1), 0)
                 * greatest(least(ay2, by2, cy2) - greatest(ay1, by1, cy1), 0)
                   AS i_abc
            FROM r
        )
        SELECT s_suppkey,
               CAST((a_a + a_b + a_c - i_ab - i_ac - i_bc + i_abc) * 100
                    AS BIGINT) AS union_area_c,
               CAST((a_a - i_ab - i_ac + i_abc) * 100 AS BIGINT) AS diff_area_c,
               CAST((i_ab + i_ac - i_abc) * 100 AS BIGINT) AS isect_area_c
        FROM i
    """,
    # corpus rule (q_squarish_grid): replay squarish_grid_dims in SQL.
    # Python round() is round-half-even; DuckDB round() is half-away-from-
    # zero, so halves (which occur: n/rows = 4.5) are emulated explicitly:
    # rhe(x) = floor(x)+floor(x)%2 when frac is exactly 0.5, else floor(x+.5).
    # Division order matches the Python solver (n / (W/H)) for IEEE identity.
    "squarish_grid": """
        WITH p AS (
            SELECT s_suppkey,
                   CAST(40 + s_suppkey % 7 * 10 AS DOUBLE) AS W,
                   CAST(30 + s_suppkey % 5 * 10 AS DOUBLE) AS H,
                   CAST(4 + s_suppkey % 13 AS BIGINT) AS n
            FROM supplier
        ),
        r AS (
            SELECT s_suppkey, n, sqrt(n / (W / H)) AS x
            FROM p
        ),
        rows_solved AS (
            SELECT s_suppkey, n,
                   least(greatest(
                       CASE WHEN x - floor(x) = 0.5
                            THEN CAST(floor(x) AS BIGINT)
                               + CAST(floor(x) AS BIGINT) % 2
                            ELSE CAST(floor(x + 0.5) AS BIGINT) END,
                       1), n) AS nb_rows
            FROM r
        ),
        cols_solved AS (
            SELECT s_suppkey, nb_rows,
                   CAST(n AS DOUBLE) / nb_rows AS y
            FROM rows_solved
        )
        SELECT s_suppkey,
               greatest(
                   CASE WHEN y - floor(y) = 0.5
                        THEN CAST(floor(y) AS BIGINT)
                           + CAST(floor(y) AS BIGINT) % 2
                        ELSE CAST(floor(y + 0.5) AS BIGINT) END,
                   1) AS nb_columns,
               nb_rows,
               greatest(
                   CASE WHEN y - floor(y) = 0.5
                        THEN CAST(floor(y) AS BIGINT)
                           + CAST(floor(y) AS BIGINT) % 2
                        ELSE CAST(floor(y + 0.5) AS BIGINT) END,
                   1) * nb_rows AS n_tiles
        FROM cols_solved
    """,
    # corpus rule (q_make_valid_area): bowtie (0,0)->(L,H)->(L,0)->(0,H)
    # self-crosses at the center; repair = two point-touching triangles
    # (valid MultiPolygon), total area exactly L*H/2
    "make_valid_area": """
        SELECT s_suppkey,
               CAST(2 AS BIGINT) AS n_parts,
               CAST(0 AS BIGINT) AS valid_in,
               CAST(1 AS BIGINT) AS valid_out,
               CAST((4 + s_suppkey % 9) * (2 + s_suppkey % 5) * 50 AS BIGINT)
                   AS area_c
        FROM supplier
    """,
    # corpus rule (q_difference_rects): 20x10 subject minus m = 1+k%4
    # strictly-interior disjoint unit squares -> one polygon, m holes,
    # area 200-m
    "difference_rects": """
        SELECT s_suppkey,
               CAST(1 AS BIGINT) AS n_polys,
               CAST(1 + s_suppkey % 4 AS BIGINT) AS n_holes,
               CAST((200 - (1 + s_suppkey % 4)) * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # q_difference_tiled: 20 x (10 + k%4) subject minus 4 interior unit
    # squares, tiled through the Ray stage → 1 merged polygon, 4 holes,
    # area 20h - 4
    "difference_tiled": """
        SELECT s_suppkey,
               CAST(1 AS BIGINT) AS n_polys,
               CAST(4 AS BIGINT) AS n_holes,
               CAST((20 * (10 + s_suppkey % 4) - 4) * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_split_tiles): one (0,0,W,H) tile toward wanted = 2+k%7
    # parts; the halve/third ratio loop gives counts {2:2,3:3,4:4,5:8,6:6,
    # 7:8,8:8}; split bounds telescope so the area sum is exactly W*H
    "split_tiles": """
        SELECT s_suppkey,
               CAST(CASE 2 + s_suppkey % 7
                    WHEN 2 THEN 2 WHEN 3 THEN 3 WHEN 4 THEN 4
                    WHEN 5 THEN 8 WHEN 6 THEN 6 ELSE 8 END AS BIGINT)
                   AS n_tiles,
               CAST((40 + s_suppkey % 4 * 10) * (30 + s_suppkey % 3 * 10)
                    * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_inner_rings): 30x30 square, holes a = 1+k%9 and
    # b = 5+k%13; keep a hole iff area > 8 (min_area_to_keep = 8)
    "inner_rings": """
        SELECT s_suppkey,
               CAST((CASE WHEN 1 + s_suppkey % 9 > 8 THEN 1 ELSE 0 END)
                  + (CASE WHEN 5 + s_suppkey % 13 > 8 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_holes_kept,
               CAST((900
                  - (CASE WHEN 1 + s_suppkey % 9 > 8
                          THEN 1 + s_suppkey % 9 ELSE 0 END)
                  - (CASE WHEN 5 + s_suppkey % 13 > 8
                          THEN 5 + s_suppkey % 13 ELSE 0 END)) * 100
                  AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_geom_zoo): p = 1+k%3 points, l = k%2 lines, q = 1+k%2
    # unit squares in a GeometryCollection; extract(polygon) keeps the q
    # squares, primitive ids: collection 0, polygon 3
    "geom_zoo": """
        SELECT s_suppkey,
               CAST((1 + s_suppkey % 3) + s_suppkey % 2 + (1 + s_suppkey % 2)
                   AS BIGINT) AS n_parts,
               CAST(1 + s_suppkey % 2 AS BIGINT) AS n_polys,
               CAST(0 AS BIGINT) AS ptype_coll,
               CAST(3 AS BIGINT) AS ptype_poly,
               CAST((1 + s_suppkey % 2) * 100 AS BIGINT) AS poly_area_c
        FROM supplier
    """,
    # corpus rule (q_subdivide_rect): 161-coord densified 12x8 rect with
    # num_coords_max = 40+(k%3)*10 -> ceil(161/ncm) in {5,4,3} squarish
    # tiles -> create_grid2 gives {4,4,3} non-empty parts; grid lines land
    # on exact binary fractions so the area sum is exactly 96
    "subdivide_rect": """
        SELECT s_suppkey,
               CAST(CASE s_suppkey % 3 WHEN 2 THEN 3 ELSE 4 END AS BIGINT)
                   AS n_parts,
               CAST(9600 AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_extend_line): L-bend (0,0)->(L,0)->(L,L), first segment
    # points -x from the start and last +y from the end, so the extension is
    # pure integer arithmetic: length 2L+s+e, start x = -s, end y = L+e
    "extend_line": """
        SELECT s_suppkey,
               CAST((2 * (5 + s_suppkey % 6)
                     + (1 + s_suppkey % 3)
                     + (1 + s_suppkey % 4)) * 100 AS BIGINT) AS length_c,
               CAST(-(1 + s_suppkey % 3) * 100 AS BIGINT) AS start_x_c,
               CAST(((5 + s_suppkey % 6) + (1 + s_suppkey % 4)) * 100
                   AS BIGINT) AS end_y_c
        FROM supplier
    """,
    # corpus rule (q_collect_explode): collect->explode is a lossless
    # roundtrip over distinct points (custkey is unique), so part count and
    # min/max part x reduce to plain per-nation aggregates
    "collect_explode": """
        SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(min(c_custkey) * 100 AS BIGINT) AS min_x_c,
               CAST(max(c_custkey) * 100 AS BIGINT) AS max_x_c
        FROM customer
        GROUP BY c_nationkey
    """,
    # corpus rule (q_view_angles): segment (1+k%7, 1+k%5) -> (+2, +3) seen
    # from the origin; both endpoints strictly in quadrant I so the interval
    # is the endpoint-angle min/max — no 0-deg-ray disambiguation needed
    "view_angles": """
        WITH a AS (
            SELECT s_suppkey,
                   degrees(atan2(CAST(1 + s_suppkey % 5 AS DOUBLE),
                                 CAST(1 + s_suppkey % 7 AS DOUBLE))) AS a1,
                   degrees(atan2(CAST(4 + s_suppkey % 5 AS DOUBLE),
                                 CAST(3 + s_suppkey % 7 AS DOUBLE))) AS a2
            FROM supplier
        )
        SELECT s_suppkey,
               CAST(floor(least(a1, a2) * 10000000) AS BIGINT) AS start_c,
               CAST(floor(greatest(a1, a2) * 10000000) AS BIGINT) AS end_c
        FROM a
    """,
    # the image table has max(count(part), 1000) rows over ordinals 0..n-1;
    # the generator injects exactly one duplicate class per i%101==0 (i>0):
    # that ordinal reuses i-1's pixels (table/images.py:189). The engine
    # derives keepers from the image CONTENT (phash bucket + exact
    # quantized-pixel digest); the oracle re-derives them from the rule.
    "phash_dedup": """
        WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part)
        SELECT CAST(u.i AS BIGINT) AS i
        FROM (SELECT unnest(range((SELECT cnt FROM n))) AS i) u
        WHERE NOT (u.i % 101 = 0 AND u.i > 0)
    """,
    # phash_near_dup: re-derive every image's integer block-mean hash from the
    # generator rule (same splitmix64/gradient/quantize replay as
    # image_features), assemble the 64-bit hash in HUGEINT, then the exact
    # all-pairs hamming check — bit-for-bit the kernel's arithmetic.
    "phash_near_dup": f"""
WITH {_IMG_IHASH_CTES}
SELECT CAST(a.i AS BIGINT) AS i_a, CAST(b.i AS BIGINT) AS i_b,
       CAST(bit_count(xor(a.ihash, b.ihash)) AS BIGINT) AS hamming
FROM signed a JOIN signed b ON a.i < b.i
WHERE bit_count(xor(a.ihash, b.ihash)) <= 3
    """,
    # zonal_stats: replay decode, then assign every pixel its 100-unit world
    # zone from the georeference rule and aggregate — pure integer SQL.
    "zonal_stats": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT ((i % 1000) * 256 + x) // 100 AS zone_x,
       ((i // 1000) * 256 + y) // 100 AS zone_y,
       CAST(sum(d0 + d1 + d2) AS BIGINT) AS sum_gray,
       CAST(count(*) AS BIGINT) AS n_px
FROM dec
GROUP BY 1, 2
    """,
    # image_pyramid: replay decode, then BOTH 2x2 floor-mean levels — floor
    # division at each level, exactly the kernel's arithmetic.
    "image_pyramid": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
),
lvl1 AS (
    SELECT i, h, w, y // 2 AS yb, x // 2 AS xb,
           sum(d0) // 4 AS e0, sum(d1) // 4 AS e1, sum(d2) // 4 AS e2
    FROM dec
    WHERE y < 2 * (h // 2) AND x < 2 * (w // 2)
    GROUP BY i, h, w, y // 2, x // 2
),
lvl2 AS (
    SELECT i, h, w, yb // 2 AS yb2, xb // 2 AS xb2,
           sum(e0) // 4 AS f0, sum(e1) // 4 AS f1, sum(e2) // 4 AS f2
    FROM lvl1
    WHERE yb < 2 * ((h // 2) // 2) AND xb < 2 * ((w // 2) // 2)
    GROUP BY i, h, w, yb // 2, xb // 2
)
SELECT CAST(i AS BIGINT) AS i, CAST(1 AS BIGINT) AS level,
       CAST(w // 2 AS BIGINT) AS w, CAST(h // 2 AS BIGINT) AS h,
       CAST(sum(e0 + e1 + e2) AS BIGINT) AS sum_rgb,
       CAST(sum(e0 * e0 + e1 * e1 + e2 * e2) AS BIGINT) AS sum_sq,
       CAST(1 AS BIGINT) AS pyramid_ok
FROM lvl1 GROUP BY i, h, w
UNION ALL
SELECT CAST(i AS BIGINT) AS i, CAST(2 AS BIGINT) AS level,
       CAST((w // 2) // 2 AS BIGINT) AS w, CAST((h // 2) // 2 AS BIGINT) AS h,
       CAST(sum(f0 + f1 + f2) AS BIGINT) AS sum_rgb,
       CAST(sum(f0 * f0 + f1 * f1 + f2 * f2) AS BIGINT) AS sum_sq,
       CAST(1 AS BIGINT) AS pyramid_ok
FROM lvl2 GROUP BY i, h, w
    """,
    # corpus rule (q_simplify_geo): W x H rectangle densified to unit spacing
    # (W = 16 + k%5*8, H = 8 + k%3*4); RDP at tol 0.5 keeps exactly the 4
    # corners (+ ring closure) and preserves the area
    "simplify_geo": """
        SELECT s_suppkey,
               CAST(2 * ((16 + s_suppkey % 5 * 8) + (8 + s_suppkey % 3 * 4)) + 1
                    AS BIGINT) AS n_pts_in,
               CAST(5 AS BIGINT) AS n_pts_out,
               CAST((16 + s_suppkey % 5 * 8) * (8 + s_suppkey % 3 * 4) * 100
                    AS BIGINT) AS area_c
        FROM supplier
    """,
    # corpus rule (q_centerline): the reference golden 10x2 rectangle
    # (medial axis LINESTRING (1 1, 9 1), length 8) scaled by s = 1 + k%4
    # and translated — similarity transforms commute with the medial axis,
    # so length = 8s exactly
    "centerline": """
        SELECT s_suppkey,
               CAST(800 * (1 + s_suppkey % 4) AS BIGINT) AS centerline_len_c
        FROM supplier
    """,
    # exact word-3-gram Jaccard all-pairs: the Ray side's prefix filter has
    # guaranteed recall, so the literal O(n^2) recomputation is an exact
    # oracle. DuckDB integer division of the same ints is IEEE-identical to
    # the Ray side's inter/union.
    "jaccard_pairs": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
        FROM pairs WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
    """,
    # 64-bit SimHash recomputed bit-by-bit: token hash = md5_number_lower
    # (the Ray side uses the little-endian low 8 bytes of hashlib.md5 — the
    # identical value), votes +1/-1 per token occurrence, bit set iff vote>0
    "simhash": """
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        h AS (SELECT doc_id, md5_number_lower(w) AS hw FROM tok),
        votes AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
            GROUP BY doc_id, b.bit
        )
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)
                    AS UBIGINT) AS simhash
        FROM votes GROUP BY doc_id
    """,
    "simhash_pairs": """
        WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        h AS (SELECT doc_id, md5_number_lower(w) AS hw FROM tok),
        votes AS (
            SELECT doc_id, b.bit,
                   sum(CASE WHEN (hw >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
            FROM h CROSS JOIN (SELECT unnest(range(64)) AS bit) b
            GROUP BY doc_id, b.bit
        ),
        sh AS (
            SELECT doc_id,
                   CAST(sum(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0::UBIGINT END)
                        AS UBIGINT) AS simhash
            FROM votes GROUP BY doc_id
        )
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    # exact cosine pairs: threshold 0.45 sits >=1e-4 away from every pair's
    # similarity at sf0.001/0.01/0.1 (measured), far above float64-vs-DOUBLE[]
    # rounding (~1e-15), so the numpy and DuckDB pair sets are identical
    "cosine_pairs": """
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.45
    """,
    # corpus rule (q_topo_simplify): rows of 8 adjacent W x 8 rectangles per
    # topology group; shared-arc RDP keeps exactly the ring corners
    "topo_simplify": """
        SELECT s_suppkey,
               CAST(5 AS BIGINT) AS n_pts_out,
               CAST((16 + (s_suppkey // 8) % 5 * 8) * 8 * 100 AS BIGINT) AS area_c
        FROM supplier
    """,
    # MinHash-LSH near-dup: recall is probabilistic in general, but on this
    # corpus every qualifying pair has J >= 0.8 (16 bands x 4 rows -> miss
    # probability ~2e-4/pair) and the seeded pipeline is deterministic; the
    # output was verified EQUAL to this exact all-pairs recomputation at
    # sf0.001 and sf0.01. The guaranteed-recall variant is jaccard_pairs.
    "near_dup_pairs": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        pairs AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        )
        SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (na + nb - i) AS jaccard
        FROM pairs WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
    """,
    # ann_lsh / ann_ivf weak oracle: the query itself measures recall@10 of
    # the approximate index against the exact top-10 (same table, same run)
    # and emits recall_ok — the oracle asserts the contract (1), so a recall
    # regression turns the driver hash red. n_queries mirrors the query's
    # first-8-vec_id selection rule in SQL.
    "ann_lsh": """
        SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
               CAST(10 AS BIGINT) AS k,
               CAST(1 AS BIGINT) AS recall_ok
        FROM embeddings
    """,
    "ann_ivf": """
        SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
               CAST(10 AS BIGINT) AS k,
               CAST(1 AS BIGINT) AS recall_ok
        FROM embeddings
    """,
    "table_profile": """
        SELECT col AS "column", n, n_null, min_v, max_v, n_distinct FROM (
          SELECT 'l_orderkey' AS col,
                 CAST(count(l_orderkey) AS BIGINT) AS n,
                 CAST(count(*) - count(l_orderkey) AS BIGINT) AS n_null,
                 CAST(min(l_orderkey) AS DOUBLE) AS min_v,
                 CAST(max(l_orderkey) AS DOUBLE) AS max_v,
                 CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
          FROM lineitem
          UNION ALL
          SELECT 'l_quantity', CAST(count(l_quantity) AS BIGINT),
                 CAST(count(*) - count(l_quantity) AS BIGINT),
                 CAST(min(l_quantity) AS DOUBLE), CAST(max(l_quantity) AS DOUBLE),
                 CAST(count(DISTINCT l_quantity) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'l_extendedprice', CAST(count(l_extendedprice) AS BIGINT),
                 CAST(count(*) - count(l_extendedprice) AS BIGINT),
                 CAST(min(l_extendedprice) AS DOUBLE),
                 CAST(max(l_extendedprice) AS DOUBLE),
                 CAST(count(DISTINCT l_extendedprice) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT 'l_discount', CAST(count(l_discount) AS BIGINT),
                 CAST(count(*) - count(l_discount) AS BIGINT),
                 CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE),
                 CAST(count(DISTINCT l_discount) AS BIGINT)
          FROM lineitem
        ) ORDER BY "column"
    """,
    # quarantine_decode: the corruption rule (i % 97 == 0 → truncated bytes)
    # is pure arithmetic, so BOTH paths — surviving-stream count and the
    # dead-letter sink contents — re-derive exactly in SQL
    "quarantine_decode": """
        WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
        s AS (SELECT unnest(generate_series(0,
                   CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i)
        SELECT CAST((SELECT cnt FROM n) AS BIGINT) AS n_total,
               CAST(count(*) FILTER (WHERE i % 97 <> 0) AS BIGINT) AS n_ok,
               CAST(count(*) FILTER (WHERE i % 97 = 0) AS BIGINT) AS n_quarantined,
               CAST(coalesce(sum(i) FILTER (WHERE i % 97 = 0), 0) AS BIGINT)
                   AS sum_quarantined
        FROM s
    """,
    # ann_ivf_disk: recall contract plus the I/O-pruning contract — the query
    # reads only probed partitions of the persisted index; pruned_ok asserts
    # files_read < files_total actually held
    "ann_ivf_disk": """
        SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
               CAST(10 AS BIGINT) AS k,
               CAST(1 AS BIGINT) AS recall_ok,
               CAST(1 AS BIGINT) AS pruned_ok
        FROM embeddings
    """,
    # image_features: the generator (splitmix64 offsets + per-axis gradient
    # mod 256 + raw0/qz1 decode) is re-derived entirely in SQL — integer pixel
    # digests are exact, so the oracle value-checks decode end-to-end;
    # features_ok binds the float feature vector in-run (_FeatureDigestStage).
    "image_features": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
-- splitmix64(src): mod-2^64 arithmetic in HUGEINT (mulmod via 32-bit split)
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT 'img_' || lpad(CAST(i AS VARCHAR), 12, '0') AS image_id,
       CAST(sum(d0 + d1 + d2) AS BIGINT) AS sum_rgb,
       CAST(sum(d0 * d0 + d1 * d1 + d2 * d2) AS BIGINT) AS sum_sq,
       CAST(sum((((4 * y + 3) // h) * 4 + ((4 * x + 3) // w) + 1) * (d0 + d1 + d2))
            AS BIGINT) AS cell_wsum,
       CAST(1 AS BIGINT) AS features_ok
FROM dec
GROUP BY i
    """,
    # audio_features: every int8 sample re-derived from the generator rule
    # (table/audio.py) — exact integer features check decode + kernel e2e
    "audio_features": """
WITH n AS (SELECT greatest(count(*), 500) AS cnt FROM documents),
clips AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
meta AS (
    SELECT i, 4000 + (i * 13) % 1000 AS ns,
           1 + (i * 7919) % 17 AS a, (i * 104729) % 256 AS b
    FROM clips
),
smp AS (
    SELECT m.i, t.t, ((m.a * t.t + m.b) % 256) - 128 AS s
    FROM meta m, LATERAL (SELECT unnest(generate_series(0, m.ns - 1)) AS t) t
),
feat AS (
    SELECT i,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS max_abs
    FROM smp GROUP BY i
),
zc AS (
    SELECT i, CAST(count(*) FILTER (WHERE s * s_next < 0) AS BIGINT) AS zero_crossings
    FROM (SELECT i, s, lead(s) OVER (PARTITION BY i ORDER BY t) AS s_next FROM smp)
    GROUP BY i
)
SELECT 'clip_' || lpad(CAST(f.i AS VARCHAR), 10, '0') AS clip_id,
       f.n_samples, f.sum_abs, f.energy, f.max_abs, z.zero_crossings
FROM feat f JOIN zc z USING (i)
    """,
    # audio_resample: nearest-sample resample to 4 kHz — output sample k maps
    # to input index (k*rate)//4000, n_out = ceil(ns*4000/rate), all integer
    "audio_resample": """
WITH n AS (SELECT greatest(count(*), 500) AS cnt FROM documents),
clips AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
meta AS (
    SELECT i, 4000 + (i * 13) % 1000 AS ns,
           1 + (i * 7919) % 17 AS a, (i * 104729) % 256 AS b,
           8000 + 1000 * (i % 3) AS rate
    FROM clips
),
rs AS (SELECT *, (ns * 4000 + rate - 1) // rate AS n_out FROM meta),
smp AS (
    SELECT m.i, k.k,
           ((m.a * ((k.k * m.rate) // 4000) + m.b) % 256) - 128 AS s
    FROM rs m, LATERAL (SELECT unnest(generate_series(0, m.n_out - 1)) AS k) k
),
feat AS (
    SELECT i,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
           CAST(sum(s * s) AS BIGINT) AS energy,
           CAST(max(abs(s)) AS BIGINT) AS max_abs
    FROM smp GROUP BY i
),
zc AS (
    SELECT i, CAST(count(*) FILTER (WHERE s * s_next < 0) AS BIGINT) AS zero_crossings
    FROM (SELECT i, s, lead(s) OVER (PARTITION BY i ORDER BY k) AS s_next FROM smp)
    GROUP BY i
)
SELECT 'clip_' || lpad(CAST(f.i AS VARCHAR), 10, '0') AS clip_id,
       f.n_samples, f.sum_abs, f.energy, f.max_abs, z.zero_crossings
FROM feat f JOIN zc z USING (i)
    """,
    # video_frames: sampled-frame pixel digests re-derived from the vz1 frame
    # generator rule (table/video.py) + qz1 requantization, all integer
    "video_frames": """
WITH n AS (SELECT greatest(2 * count(*), 200) AS cnt FROM supplier),
vids AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS v
),
meta AS (
    SELECT v, 16 + (v * 7) % 17 AS nf,
           16 + (v * 37) % 33 AS w, 16 + (v * 53) % 29 AS h
    FROM vids
),
fr AS (
    SELECT m.v, m.w, m.h, j.j
    FROM meta m, LATERAL (SELECT unnest(generate_series(0, m.nf - 1)) AS j) j
    WHERE j.j % 5 = 0
),
dec AS (
    SELECT f.v, f.j,
           p0 - (p0 % 4) + 2 AS d0,
           p1 - (p1 % 4) + 2 AS d1,
           p2 - (p2 % 4) + 2 AS d2
    FROM fr f,
         LATERAL (SELECT unnest(generate_series(0, f.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, f.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + (f.v * 11 + f.j * 17) % 256) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + (f.v * 23 + f.j * 29) % 256) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + (f.v * 31 + f.j * 41) % 256) % 256 AS p2) p
)
SELECT 'vid_' || lpad(CAST(v AS VARCHAR), 10, '0') AS video_id,
       CAST(j AS BIGINT) AS frame_idx,
       CAST(sum(d0 + d1 + d2) AS BIGINT) AS sum_rgb
FROM dec
GROUP BY v, j
    """,
    # geo_csv: the synthesized rect rule is plain arithmetic on the ordinal
    # (CSV keys are 0..n-1 where n = supplier row count)
    "geo_csv": """
WITH n AS (SELECT count(*) AS cnt FROM supplier),
ks AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS k
)
SELECT CAST(k AS BIGINT) AS s_suppkey,
       CAST((1 + k % 5) * (1 + k % 7) AS BIGINT) AS area_i,
       CAST(2 * ((1 + k % 5) + (1 + k % 7)) AS BIGINT) AS perim_i,
       CAST(k % 100 AS BIGINT) AS minx_i,
       CAST(k // 100 + 1 + k % 7 AS BIGINT) AS maxy_i
FROM ks
    """,
    # kmeans: the integer Lloyd's algorithm replayed verbatim — quantize
    # floor(x*100)+128 (shift keeps // floor/trunc-agnostic), centroids S//n,
    # ties to smallest cluster, emptied cluster keeps its previous centroid
    "kmeans": """
WITH qv AS (
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS BIGINT) AS idx,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100) AS BIGINT) + 128 AS q
    FROM embeddings
),
c0ids AS (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
    FROM embeddings ORDER BY vec_id LIMIT 8
),
cent0 AS (SELECT i.j, qv.idx, qv.q AS c FROM c0ids i JOIN qv USING (vec_id)),
d1 AS (
    SELECT qv.vec_id, c.j, sum((qv.q - c.c) * (qv.q - c.c)) AS d2
    FROM qv JOIN cent0 c USING (idx) GROUP BY qv.vec_id, c.j
),
a1 AS (
    SELECT vec_id, j FROM (
        SELECT vec_id, j,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
        FROM d1
    ) WHERE rn = 1
),
s1 AS (
    SELECT a1.j, qv.idx, sum(qv.q) AS sq, count(*) AS n
    FROM a1 JOIN qv USING (vec_id) GROUP BY a1.j, qv.idx
),
cent1 AS (
    SELECT c0.j, c0.idx, COALESCE(CAST(s1.sq // s1.n AS BIGINT), c0.c) AS c
    FROM cent0 c0 LEFT JOIN s1 ON s1.j = c0.j AND s1.idx = c0.idx
),
d2_ AS (
    SELECT qv.vec_id, c.j, sum((qv.q - c.c) * (qv.q - c.c)) AS d2
    FROM qv JOIN cent1 c USING (idx) GROUP BY qv.vec_id, c.j
),
a2 AS (
    SELECT vec_id, j FROM (
        SELECT vec_id, j,
               row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
        FROM d2_
    ) WHERE rn = 1
),
s2 AS (
    SELECT a2.j, qv.idx, sum(qv.q) AS sq, count(*) AS n
    FROM a2 JOIN qv USING (vec_id) GROUP BY a2.j, qv.idx
),
cent2 AS (
    SELECT c1.j, c1.idx, COALESCE(CAST(s2.sq // s2.n AS BIGINT), c1.c) AS c
    FROM cent1 c1 LEFT JOIN s2 ON s2.j = c1.j AND s2.idx = c1.idx
),
df AS (
    SELECT qv.vec_id, c.j, sum((qv.q - c.c) * (qv.q - c.c)) AS d2
    FROM qv JOIN cent2 c USING (idx) GROUP BY qv.vec_id, c.j
)
SELECT vec_id, CAST(j AS BIGINT) AS cluster, CAST(d2 AS BIGINT) AS dist2
FROM (
    SELECT vec_id, j, d2,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, j) AS rn
    FROM df
) WHERE rn = 1
    """,
    "topn_per_key": """
        SELECT user_id, event_id, CAST(rn AS BIGINT) AS rnk
        FROM (
            SELECT user_id, event_id,
                   row_number() OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS rn
            FROM events
        ) WHERE rn <= 3
    """,
    "top_terms": """
        WITH toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM toks
            WHERE term <> '' GROUP BY doc_id, term
        ),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        ranked AS (
            SELECT doc_id, term, tf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tf DESC, term
                   ) AS rnk
            FROM tf
        )
        SELECT r.doc_id, r.term, CAST(r.tf AS BIGINT) AS tf,
               CAST(r.rnk AS BIGINT) AS rnk, CAST(d.df AS BIGINT) AS df
        FROM ranked r JOIN dfq d USING (term)
        WHERE r.rnk <= 3
    """,
    "global_rank": """
        SELECT event_id,
               CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT) AS rnk
        FROM events
    """,
    "group_median": """
        WITH h AS (
            SELECT user_id, CAST(floor(value * 100) AS BIGINT) AS v, count(*) AS c
            FROM events GROUP BY 1, 2
        ),
        cum AS (
            SELECT user_id, v,
                   sum(c) OVER (PARTITION BY user_id ORDER BY v) AS cum
            FROM h
        ),
        n AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
        SELECT n.user_id, CAST(min(cum.v) AS BIGINT) AS median_c,
               CAST(n.n AS BIGINT) AS n
        FROM n JOIN cum ON n.user_id = cum.user_id
        WHERE cum.cum >= (50 * n.n + 99) // 100
        GROUP BY n.user_id, n.n
    """,
    # quantiles: smallest v with cumulative count >= ceil(p*n/100), exact
    "quantiles": """
        WITH h AS (
            SELECT CAST(floor(value * 100) AS BIGINT) AS v, count(*) AS c
            FROM events GROUP BY 1
        ),
        cum AS (SELECT v, sum(c) OVER (ORDER BY v) AS cum FROM h),
        n AS (SELECT count(*) AS n FROM events),
        p AS (SELECT unnest([25, 50, 75, 99]) AS pct)
        SELECT CAST(p.pct AS BIGINT) AS pct, CAST(min(cum.v) AS BIGINT) AS value_c
        FROM p, cum, n
        WHERE cum.cum >= (p.pct * n.n + 99) // 100
        GROUP BY p.pct
    """,
    # bloom_semi_join: the Bloom pass is exact end-to-end (no false
    # negatives; FPs removed by the left_semi join), so the oracle is the
    # plain semi-join aggregate
    "bloom_semi_join": """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders WHERE o_totalprice > 250000.0
        )
        GROUP BY l_returnflag
    """,
    # cust_order_stats: LEFT OUTER join semantics — inactive customers
    # (no orders) must survive with zero-filled measures
    "cust_order_stats": """
        WITH per AS (
            SELECT o_custkey,
                   count(*) AS n_orders,
                   sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS spend_c
            FROM orders GROUP BY o_custkey
        )
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(count(*) FILTER (WHERE per.o_custkey IS NULL) AS BIGINT)
                   AS n_inactive,
               CAST(coalesce(sum(per.n_orders), 0) AS BIGINT) AS n_orders,
               CAST(coalesce(sum(per.spend_c), 0) AS BIGINT) AS spend_c
        FROM customer LEFT JOIN per ON c_custkey = per.o_custkey
        GROUP BY c_mktsegment
    """,
    # stratified_sample: the multiplicative-hash membership rule replayed
    # verbatim (uint64 wraparound preserves the mod-2^32 value, so BIGINT
    # arithmetic agrees with the engine's numpy uint64 at these key ranges)
    "stratified_sample": """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_sampled,
               CAST(sum(o_orderkey) AS BIGINT) AS sum_okey
        FROM orders
        WHERE (o_orderkey * 2654435761) % 4294967296 % 100
              < CAST(substr(o_orderpriority, 1, 1) AS INTEGER) * 10
        GROUP BY o_orderpriority
    """,
    # sales_rollup: ROLLUP levels with 'ALL' sentinel labels
    "sales_rollup": """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_base_c
        FROM lineitem
        GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    # embed_quantize: the quantization transform replayed per element
    # (float32 -> float64 cast is exact on both sides)
    "embed_quantize": """
        SELECT vec_id,
               CAST(sum(qv) AS BIGINT) AS sum_q,
               CAST(sum(qv * qv) AS BIGINT) AS sum_q2,
               CAST(sum(qv * i) AS BIGINT) AS wsum
        FROM (
            SELECT vec_id,
                   CAST(floor(CAST(x AS DOUBLE) * 100) AS BIGINT) + 128 AS qv,
                   i
            FROM (
                SELECT vec_id, unnest(embedding) AS x,
                       generate_subscripts(embedding, 1) AS i
                FROM embeddings
            )
        )
        GROUP BY vec_id
    """,
    # image_augment: decode replayed from the generator rule (same splitmix64
    # CTE chain as image_features); flip/rot180 digests are the SAME pixels
    # with mirrored position weights — a wrong flip axis or off-by-one in the
    # engine's transform changes the sum
    "image_augment": """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT i,
       CAST(sum((d0 + d1 + d2) * (w - x)) AS BIGINT) AS flip_wx,
       CAST(sum((d0 + d1 + d2) * (w - x) * (h - y)) AS BIGINT) AS rot_w,
       CAST(1 AS BIGINT) AS aug_ok
FROM dec
GROUP BY i
    """,
    # dup_clusters: transitive closure of the exact-Jaccard pair graph via a
    # recursive CTE — cluster_id = min reachable doc_id; docs outside every
    # pair are their own singleton cluster
    "dup_clusters": """
        WITH RECURSIVE
        tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        p0 AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ),
        e1 AS MATERIALIZED (
            SELECT doc_a, doc_b FROM p0
            WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
        ),
        -- MATERIALIZED: the recursive step scans edges once per iteration;
        -- without the hint DuckDB inlines the CTE chain and replays the
        -- all-pairs Jaccard join EVERY round
        edges AS MATERIALIZED (
            SELECT doc_a AS s, doc_b AS d FROM e1
            UNION ALL
            SELECT doc_b, doc_a FROM e1
        ),
        nodes AS (SELECT DISTINCT s AS node FROM edges),
        reach(node, r) AS (
            SELECT node, node FROM nodes
            UNION
            SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
        ),
        cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        SELECT d.doc_id,
               CAST(coalesce(cc.cluster_id, d.doc_id) AS BIGINT) AS cluster_id
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
    """,
    # vocab_hll: every HLL register recomputed from scratch — hash =
    # md5_number_lower (little-endian bytes 8:16 of md5, the Ray-side value),
    # bucket = top 12 bits, rank = first-1-bit position of the low 52 bits
    # via exact binary-string length (53 - bit_length, 53 when zero)
    "vocab_hll": """
        WITH tok AS (
            SELECT DISTINCT unnest(string_split(text, ' ')) AS wd FROM documents
        ),
        h AS (SELECT md5_number_lower(wd) AS hw FROM tok)
        SELECT CAST(hw >> 52 AS BIGINT) AS bucket,
               CAST(max(CASE WHEN (hw & 4503599627370495) = 0 THEN 53
                        ELSE 53 - length(bin(hw & 4503599627370495)) END)
                    AS BIGINT) AS r
        FROM h GROUP BY bucket
    """,
    # footprint_pairs: L∞ proximity self-join — the band predicates ARE the
    # gap-<=-48 conditions (per axis: gap <= d ⇔ each side starts before the
    # other side's end + d)
    "footprint_pairs": f"""
        WITH img AS ({_IMG})
        SELECT a.i AS img_a, b.i AS img_b,
               CAST(greatest(b.minx - a.maxx, a.minx - b.maxx, 0) AS BIGINT) AS x_gap,
               CAST(greatest(b.miny - a.maxy, a.miny - b.maxy, 0) AS BIGINT) AS y_gap
        FROM img a JOIN img b
          ON a.i < b.i
         AND b.minx <= a.maxx + 48 AND a.minx <= b.maxx + 48
         AND b.miny <= a.maxy + 48 AND a.miny <= b.maxy + 48
    """,
    "running_total": """
        SELECT event_id, user_id,
               CAST(row_number() OVER w AS BIGINT) AS seq,
               CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
                   AS run_value_c
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """,
    "top_tokens": """
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        c AS (SELECT term, count(*) AS n FROM tok GROUP BY term)
        SELECT term, CAST(n AS BIGINT) AS n,
               CAST(row_number() OVER (ORDER BY n DESC, term) AS BIGINT) AS rank
        FROM c ORDER BY n DESC, term LIMIT 20
    """,
    "funnel": """
        WITH u AS (SELECT DISTINCT user_id FROM events),
        v AS (
            SELECT user_id, min(epoch_us(ts)) AS t1
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t2
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t1
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(epoch_us(e.ts)) AS t3
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t2
            GROUP BY e.user_id
        )
        SELECT u.user_id,
               CAST(coalesce(v.t1, -1) AS BIGINT) AS view_ts,
               CAST(coalesce(c.t2, -1) AS BIGINT) AS click_ts,
               CAST(coalesce(p.t3, -1) AS BIGINT) AS purchase_ts,
               CAST(CASE WHEN v.t1 IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END
                    + CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stages
        FROM u
        LEFT JOIN v ON u.user_id = v.user_id
        LEFT JOIN c ON u.user_id = c.user_id
        LEFT JOIN p ON u.user_id = p.user_id
    """,
    "shipping_priority": """
        WITH f AS (
            SELECT l.l_orderkey AS o_orderkey,
                   epoch_us(o.o_orderdate) AS odate_us,
                   CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100)
                        AS BIGINT) AS rev_c
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND epoch_us(o.o_orderdate) < epoch_us(TIMESTAMP '1998-06-01')
              AND epoch_us(l.l_shipdate) > epoch_us(TIMESTAMP '1998-06-01')
        )
        SELECT o_orderkey, CAST(odate_us AS BIGINT) AS odate_us,
               CAST(sum(rev_c) AS BIGINT) AS revenue_c
        FROM f GROUP BY o_orderkey, odate_us
        ORDER BY revenue_c DESC, o_orderkey LIMIT 10
    """,
    "knn_join": f"""
        WITH pts AS ({_PTS}),
        q AS (
            SELECT event_id AS q_id, px AS qx, py AS qy
            FROM pts WHERE event_id % 101 = 0
        ),
        d AS (
            SELECT q.q_id, p.event_id,
                   CAST((p.px - q.qx) * (p.px - q.qx)
                        + (p.py - q.qy) * (p.py - q.qy) AS BIGINT) AS dist2
            FROM q JOIN pts p ON p.event_id <> q.q_id
        ),
        r AS (
            SELECT q_id, event_id, dist2,
                   row_number() OVER (PARTITION BY q_id ORDER BY dist2, event_id)
                       AS rnk
            FROM d
        )
        SELECT q_id, event_id, CAST(rnk AS BIGINT) AS rnk, dist2
        FROM r WHERE rnk <= 3
    """,
    # dissolve: the union of overlapping [x0, x0+10]×[0,5] rects per nation
    # is an interval merge — lead() gives each slot's newly-covered length
    "dissolve": """
        WITH s AS (
            SELECT DISTINCT s_nationkey AS nk, (s_suppkey % 7) * 8 AS x0
            FROM supplier
        ),
        w AS (
            SELECT nk, x0, lead(x0) OVER (PARTITION BY nk ORDER BY x0) AS nxt
            FROM s
        ),
        seg AS (
            SELECT nk,
                   CASE WHEN nxt IS NULL THEN 10
                        WHEN nxt - x0 < 10 THEN nxt - x0
                        ELSE 10 END AS len
            FROM w
        )
        SELECT CAST(nk AS BIGINT) AS n_nationkey,
               CAST(sum(len) * 5 * 100 AS BIGINT) AS area_c,
               CAST(count(*) AS BIGINT) AS n_slots
        FROM seg GROUP BY nk
    """,
    # image_curation: the full composed chain replayed — generator dims, the
    # ordinal duplicate rule, the HUGEINT ihash derivation, all-pairs
    # hamming restricted to the gated+deduped survivors, and the split hash
    "image_curation": f"""
WITH {_IMG_IHASH_CTES},
gate AS (SELECT m.i, m.w, m.h FROM meta m WHERE m.w * m.h >= 1200),
ded AS (SELECT g.i, g.w, g.h FROM gate g WHERE NOT (g.i % 101 = 0 AND g.i > 0)),
prs AS (
    SELECT DISTINCT b.i AS ib
    FROM signed a JOIN signed b ON a.i < b.i
    WHERE bit_count(xor(a.ihash, b.ihash)) <= 3
      AND a.i IN (SELECT i FROM ded) AND b.i IN (SELECT i FROM ded)
),
kept AS (SELECT d.* FROM ded d WHERE d.i NOT IN (SELECT ib FROM prs)),
fin AS (
    SELECT CASE WHEN (i * 2654435761) % 4294967296 % 10 = 9
                THEN 'val' ELSE 'train' END AS split,
           i, w * h AS px
    FROM kept
)
SELECT split, CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(px) AS BIGINT) AS sum_px, CAST(sum(i) AS BIGINT) AS id_sum
FROM fin GROUP BY split
    """,
    # incremental_dedup: cross-boundary dups (i%101==0 with i-1 in history)
    # die in the anti join; same-increment dups in the argmin — both reduce
    # to dropping every dup ordinal in the increment
    "incremental_dedup": """
        WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part)
        SELECT CAST(u.i AS BIGINT) AS i
        FROM (SELECT unnest(range((SELECT cnt FROM n))) AS i) u
        WHERE u.i >= ((SELECT cnt FROM n) // 2) // 101 * 101
          AND u.i % 101 <> 0
    """,
    "sales_cube": """
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                   AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                   AS sum_base_c
        FROM lineitem
        GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    "user_mode": """
        WITH c AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        r AS (
            SELECT user_id, event_type, n,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY n DESC, event_type) AS rk
            FROM c
        )
        SELECT user_id, event_type AS mode_type, CAST(n AS BIGINT) AS n
        FROM r WHERE rk = 1
    """,
    "dup_triangles": """
        WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        p0 AS (
            SELECT a.doc_id AS da, b.doc_id AS db,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ),
        e AS MATERIALIZED (
            SELECT da AS a, db AS b FROM p0
            WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
        )
        SELECT CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e2.a = e1.b
                  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
}


# sink-mode ring join returns the identical exact result as the in-stream
# variant, so both check against the same windowed cross join
ORACLE_SQL["knn_join_pruned"] = ORACLE_SQL["knn_join"]


def _pagerank_rounds(n_iters: int) -> str:
    """r0..rN chained integer-CTE PageRank rounds (scale 1e9, damping
    85/100): bit-identical to stages/graph.pagerank's fixed-point updates."""
    parts = []
    for t in range(1, n_iters + 1):
        parts.append(
            f"""m{t} AS (
            SELECT e.d AS node, SUM(r.rank // g.deg) AS ms
            FROM edges e JOIN r{t - 1} r ON e.s = r.node
                         JOIN deg g ON e.s = g.node
            GROUP BY e.d
        ),
        r{t} AS (
            SELECT deg.node,
                   CAST(150000000 + (85 * COALESCE(m.ms, 0)) // 100 AS BIGINT) AS rank
            FROM deg LEFT JOIN m{t} m ON deg.node = m.node
        )"""
        )
    return ",\n        ".join(parts)


# pagerank: 5 fixed-point integer iterations over the same all-pairs
# Jaccard edge set as dup_clusters — every arithmetic step is int64
# (rank // deg per edge, 85/100 damping, +0.15 * 1e9 base), so the engine
# and the SQL replay are bit-identical
ORACLE_SQL["pagerank"] = f"""
        WITH
        tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        sh AS MATERIALIZED (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(tk) - 1),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
            FROM tok WHERE len(tk) >= 3
        ),
        p0 AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_intersect(a.s, b.s)) AS i,
                   len(a.s) AS na, len(b.s) AS nb
            FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        ),
        e1 AS MATERIALIZED (
            SELECT doc_a, doc_b FROM p0
            WHERE CAST(i AS DOUBLE) / (na + nb - i) >= 0.5
        ),
        edges AS MATERIALIZED (
            SELECT doc_a AS s, doc_b AS d FROM e1
            UNION ALL
            SELECT doc_b, doc_a FROM e1
        ),
        deg AS (SELECT s AS node, count(*) AS deg FROM edges GROUP BY s),
        r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM deg),
        {_pagerank_rounds(5)}
        SELECT node AS doc_id, rank FROM r5
"""

# Gopher-style repetition rules: top-bigram occurrences + duplicated-trigram
# token count, replayed verbatim from string_split (grams joined with chr(31)
# exactly like stages/text.py:_ngram_frame).
ORACLE_SQL["gopher_quality"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                   i -> tk[i] || chr(31) || tk[i+1])) AS g
        FROM tok
    ),
    bgc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g),
    bmax AS (SELECT doc_id, max(c) AS top_bigram_n FROM bgc GROUP BY doc_id),
    tg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || chr(31) || tk[i+1] || chr(31) || tk[i+2])) AS g
        FROM tok
    ),
    tgc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g),
    tdup AS (SELECT doc_id, sum(c) AS dup_trigram_n FROM tgc WHERE c > 1 GROUP BY doc_id)
    SELECT t.doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(COALESCE(b.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
           CAST(COALESCE(d.dup_trigram_n, 0) AS BIGINT) AS dup_trigram_n
    FROM tok t
    LEFT JOIN bmax b USING (doc_id)
    LEFT JOIN tdup d USING (doc_id)
"""

# Benchmark decontamination: the eval set is substr(text, 11, 24) of the 10
# smallest doc_ids (python text[10:34]); n_hits counts CONTAINING snippet rows.
ORACLE_SQL["decontaminate"] = """
    WITH snips AS (
        SELECT substr(text, 11, 24) AS s FROM documents WHERE doc_id < 10
    ),
    hits AS (
        SELECT d.doc_id, count(*) AS n_hits
        FROM documents d JOIN snips ON contains(d.text, snips.s)
        GROUP BY d.doc_id
    )
    SELECT d.doc_id, CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
    FROM documents d LEFT JOIN hits h USING (doc_id)
"""

# Corpus-LM fluency: per-doc sum of global bigram-instance counts.
ORACLE_SQL["bigram_lm"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(tk)),
                   i -> tk[i] || chr(31) || tk[i+1])) AS g
        FROM tok
    ),
    cnt AS (SELECT g, count(*) AS c FROM bg GROUP BY g)
    SELECT bg.doc_id,
           CAST(sum(cnt.c) AS BIGINT) AS lm_hits,
           CAST(count(*) AS BIGINT) AS n_bigrams
    FROM bg JOIN cnt USING (g)
    GROUP BY bg.doc_id
"""

# SemDeDup: the full kmeans chain (shared CTEs) assigns clusters; pairs join
# within cluster on CENTERED quantized vectors with the cross-multiplied
# cosine threshold (cos >= sqrt(1225/10000) = 0.35) — all-integer.
ORACLE_SQL["semantic_dedup"] = f"""
    WITH fin AS (
        {ORACLE_SQL["kmeans"]}
    ),
    qc AS (
        SELECT vec_id,
               CAST(unnest(range(len(embedding))) AS BIGINT) AS idx,
               CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100) AS BIGINT) AS q
        FROM embeddings
    ),
    dots AS (
        SELECT fa.vec_id AS a, fb.vec_id AS b,
               sum(qa.q * qb.q) AS dot,
               sum(qa.q * qa.q) AS na2,
               sum(qb.q * qb.q) AS nb2
        FROM fin fa JOIN fin fb ON fa.cluster = fb.cluster AND fa.vec_id < fb.vec_id
        JOIN qc qa ON qa.vec_id = fa.vec_id
        JOIN qc qb ON qb.vec_id = fb.vec_id AND qb.idx = qa.idx
        GROUP BY fa.vec_id, fb.vec_id
    )
    SELECT a, b FROM dots
    WHERE dot > 0 AND dot * dot * 10000 >= 1225 * na2 * nb2
"""

# Fixed-point BM25 (k1=1.2, b=0.75): tf-part scaled by 10·TOT is the exact
# rational 22·tf·TOT / (10·tf·TOT + 3·TOT + 9·dl·N); both sides floor-divide
# into the same int64 fixed point, then rank (score DESC, doc_id).
ORACLE_SQL["bm25_topk"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    stats AS (
        SELECT count(*) AS n_docs, sum(len(tk)) AS tot FROM tok
    ),
    inst AS (SELECT doc_id, unnest(tk) AS term, len(tk) AS dl FROM tok),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
        FROM inst
        WHERE term IN ('table', 'value', 'data', 'window', 'join')
        GROUP BY doc_id, term
    ),
    scored AS (
        SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
               CAST((22 * tf * tot * 1000000)
                    // (10 * tf * tot + 3 * tot + 9 * dl * n_docs) AS BIGINT)
                   AS score_fp
        FROM tf, stats
    )
    SELECT term, doc_id, tf, dl, score_fp,
           CAST(row_number() OVER (
               PARTITION BY term ORDER BY score_fp DESC, doc_id
           ) AS BIGINT) AS rnk
    FROM scored
    QUALIFY rnk <= 10
"""

# caption_search: caption words re-derived from the ordinal rule
# (table/images.py:caption_of — word k = WORDS[(i*(k+3)+k) % 20]; the query
# words 'river'/'tower' are indices 3/13), top-20 by (score DESC, i), hashes
# from the generator CTEs (decode replayed per pixel).
ORACLE_SQL["caption_search"] = f"""
WITH {_IMG_IHASH_CTES},
cap AS (
    SELECT m.i,
           (CASE WHEN (m.i * 3) % 20 IN (3, 13) THEN 1 ELSE 0 END
          + CASE WHEN (m.i * 4 + 1) % 20 IN (3, 13) THEN 1 ELSE 0 END
          + CASE WHEN (m.i * 5 + 2) % 20 IN (3, 13) THEN 1 ELSE 0 END
          + CASE WHEN (m.i * 6 + 3) % 20 IN (3, 13) THEN 1 ELSE 0 END
          + CASE WHEN (m.i * 7 + 4) % 20 IN (3, 13) THEN 1 ELSE 0 END) AS score
    FROM meta m
),
ranked AS (
    SELECT i, score, row_number() OVER (ORDER BY score DESC, i) AS rnk
    FROM cap WHERE score > 0
)
SELECT r.i, CAST(r.score AS BIGINT) AS score, CAST(r.rnk AS BIGINT) AS rnk, s.ihash
FROM ranked r JOIN signed s ON s.i = r.i
WHERE r.rnk <= 20
"""

# compaction layout is pure arithmetic: file_id = event_id // ceil(n/4)
ORACLE_SQL["compact"] = """
    SELECT CAST(event_id // ((SELECT (count(*) + 3) // 4 FROM events) ) AS BIGINT) AS file_id,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(event_id) AS BIGINT) AS sum_eid
    FROM events
    GROUP BY 1
"""

# PQ codes: the kmeans CTE chain generalized by subspace (sub = idx // 16),
# k=4, one iteration; same integer contract (S // n, ties smallest code).
ORACLE_SQL["pq_codes"] = """
WITH qv AS (
    SELECT vec_id,
           CAST(unnest(range(len(embedding))) AS BIGINT) AS idx,
           CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 100) AS BIGINT) + 128 AS q
    FROM embeddings
),
qs AS (SELECT vec_id, idx // 16 AS sub, idx, q FROM qv),
c0ids AS (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS j
    FROM embeddings ORDER BY vec_id LIMIT 4
),
cent0 AS (SELECT i.j, s.sub, s.idx, s.q AS c FROM c0ids i JOIN qs s USING (vec_id)),
d1 AS (
    SELECT s.vec_id, s.sub, c.j, sum((s.q - c.c) * (s.q - c.c)) AS d2
    FROM qs s JOIN cent0 c ON c.idx = s.idx AND c.sub = s.sub
    GROUP BY s.vec_id, s.sub, c.j
),
a1 AS (
    SELECT vec_id, sub, j FROM (
        SELECT vec_id, sub, j,
               row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn
        FROM d1
    ) WHERE rn = 1
),
s1 AS (
    SELECT a1.sub, a1.j, qs.idx, sum(qs.q) AS sq, count(*) AS n
    FROM a1 JOIN qs ON qs.vec_id = a1.vec_id AND qs.sub = a1.sub
    GROUP BY a1.sub, a1.j, qs.idx
),
cent1 AS (
    SELECT c0.sub, c0.j, c0.idx, COALESCE(CAST(s1.sq // s1.n AS BIGINT), c0.c) AS c
    FROM cent0 c0 LEFT JOIN s1 ON s1.sub = c0.sub AND s1.j = c0.j AND s1.idx = c0.idx
),
df AS (
    SELECT s.vec_id, s.sub, c.j, sum((s.q - c.c) * (s.q - c.c)) AS d2
    FROM qs s JOIN cent1 c ON c.idx = s.idx AND c.sub = s.sub
    GROUP BY s.vec_id, s.sub, c.j
)
SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(j AS BIGINT) AS code,
       CAST(d2 AS BIGINT) AS dist2
FROM (
    SELECT vec_id, sub, j, d2,
           row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn
    FROM df
) WHERE rn = 1
"""

ORACLE_SQL["ann_pq"] = """
    SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k,
           CAST(1 AS BIGINT) AS recall_ok
    FROM embeddings
"""

# Exact duplicated-window dedup (8-token windows shared by >=2 distinct docs;
# dup_tokens = interval-union coverage of a doc's duplicated windows). The
# window gram is the chr(31)-joined token slice, positions are 1-based here
# and 0-based in the kernel — coverage arithmetic is base-invariant.
ORACLE_SQL["dup_spans"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g8 AS (
        SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
               array_to_string(tk[u.pos : u.pos + 7], chr(31)) AS g
        FROM tok, unnest(range(1, len(tk) - 6)) AS u(pos)
    ),
    dg AS (SELECT g FROM g8 GROUP BY g HAVING count(DISTINCT doc_id) >= 2),
    dw AS (SELECT doc_id, pos FROM g8 JOIN dg USING (g)),
    cov AS (
        SELECT doc_id, pos,
               lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM dw
    ),
    per AS (
        SELECT doc_id, count(*) AS dup_windows,
               sum(CASE WHEN nxt IS NULL THEN 8 ELSE least(nxt - pos, 8) END)
                   AS dup_tokens
        FROM cov GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(greatest(len(tk) - 7, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
           CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
    FROM tok t LEFT JOIN per p USING (doc_id)
"""

# PII redaction: the oracle re-derives the deterministic enrichment, counts
# both patterns, and md5-hashes the same global regexp replacement (email
# pass first, phone second — matching the kernel's order).
ORACLE_SQL["pii_redact"] = r"""
    WITH enr AS (
        SELECT doc_id,
            text ||
            CASE WHEN doc_id % 7 = 0
                 THEN ' mail u' || CAST(doc_id AS VARCHAR) || '@ex'
                      || CAST(doc_id % 5 AS VARCHAR) || '.com'
                 ELSE '' END ||
            CASE WHEN doc_id % 11 = 0
                 THEN ' tel 555-' || CAST(1000 + doc_id % 9000 AS VARCHAR)
                      || '-' || CAST(10 + doc_id % 90 AS VARCHAR)
                 ELSE '' END AS t
        FROM documents
    )
    SELECT doc_id,
        CAST(len(regexp_extract_all(t, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+'))
             AS BIGINT) AS n_emails,
        CAST(len(regexp_extract_all(t, '555-[0-9]{4}-[0-9]{2}'))
             AS BIGINT) AS n_phones,
        md5(regexp_replace(
                regexp_replace(t, '[a-z0-9._]+@[a-z0-9]+\.[a-z]+',
                               '<EMAIL>', 'g'),
                '555-[0-9]{4}-[0-9]{2}', '<PHONE>', 'g')) AS red_fp
    FROM enr
"""

# Domain-mixture rebalance: every language kept down to the smallest
# domain's size, rows chosen by md5(doc_id) order (deterministic sampling).
ORACLE_SQL["domain_mix"] = """
    WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
    m AS (SELECT min(n) AS n_min FROM c),
    r AS (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rnk
        FROM documents
    )
    SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
    FROM r, m WHERE rnk <= m.n_min
"""

# JSONL roundtrip scan: the oracle aggregates the parquet source directly;
# equality proves the write_json -> read_json path lossless for int64/utf8.
ORACLE_SQL["jsonl_scan"] = """
    SELECT lang, source,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents
    GROUP BY lang, source
"""

# CLIP-style cross-modal gate: image tower from the pixel-generator CTEs
# (centered block-row gray sums), text tower from the ordinal caption rule
# + md5_number_lower bytes; keep = cross-multiplied cosine >= 5/100 in
# HUGEINT (dot^2 exceeds int64).
ORACLE_SQL["clip_score"] = f"""
WITH {_IMG_IHASH_CTES},
iv AS (SELECT i, br AS d, sum(s) AS rs FROM bsum GROUP BY i, br),
ivec AS (SELECT iv.i, iv.d, 8 * iv.rs - tot.t AS a FROM iv JOIN tot USING (i)),
cwords(widx, w) AS (VALUES
    (0, 'tile'), (1, 'grid'), (2, 'cell'), (3, 'river'), (4, 'field'),
    (5, 'road'), (6, 'house'), (7, 'tree'), (8, 'cloud'), (9, 'shadow'),
    (10, 'rock'), (11, 'water'), (12, 'bridge'), (13, 'tower'), (14, 'farm'),
    (15, 'forest'), (16, 'lake'), (17, 'coast'), (18, 'dune'), (19, 'track')),
ktab AS (SELECT unnest(range(5)) AS k),
capw AS (
    SELECT m.i, cw.w
    FROM meta m CROSS JOIN ktab kt
    JOIN cwords cw ON cw.widx = (m.i * (kt.k + 3) + kt.k) % 20
),
toks AS (
    SELECT i, 'caption' AS w FROM meta
    UNION ALL SELECT i, CAST(i AS VARCHAR) AS w FROM meta
    UNION ALL SELECT i, w FROM capw
),
dtab AS (SELECT unnest(range(8)) AS d),
tvec AS (
    SELECT t.i, dt.d,
           sum(CAST((md5_number_lower(t.w) >> CAST(8 * dt.d AS INTEGER)) & 255
                    AS BIGINT) - 128) AS b
    FROM toks t CROSS JOIN dtab dt
    GROUP BY t.i, dt.d
),
sc AS (
    SELECT v.i,
           sum(CAST(v.a AS HUGEINT) * tv.b) AS dot,
           sum(CAST(v.a AS HUGEINT) * v.a) AS na2,
           sum(CAST(tv.b AS HUGEINT) * tv.b) AS nb2
    FROM ivec v JOIN tvec tv ON tv.i = v.i AND tv.d = v.d
    GROUP BY v.i
)
SELECT i, CAST(dot AS BIGINT) AS dot,
       CAST(CASE WHEN dot > 0 AND 10000 * dot * dot >= 25 * na2 * nb2
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM sc
"""

# CDC merge: the oracle re-derives the delta stream and applies the same
# DELETE > UPDATE > base precedence; inserts land at n + event_id.
ORACLE_SQL["cdc_merge"] = """
    WITH b AS (
        SELECT event_id, CAST(floor(value * 100) AS BIGINT) AS value_c
        FROM events
    ),
    upd AS (
        SELECT event_id, value_c + 100000 AS value_c FROM b
        WHERE event_id % 10 = 3 AND event_id % 17 <> 5
    ),
    del AS (SELECT event_id FROM b WHERE event_id % 17 = 5),
    ins AS (
        SELECT (SELECT count(*) FROM events) + event_id AS event_id,
               CAST(event_id * 7 AS BIGINT) AS value_c
        FROM b WHERE event_id % 97 = 0
    )
    SELECT b.event_id, b.value_c, 'base' AS src
    FROM b
    WHERE b.event_id NOT IN (SELECT event_id FROM del)
      AND b.event_id NOT IN (SELECT event_id FROM upd)
    UNION ALL
    SELECT event_id, value_c, 'upd' AS src FROM upd
    UNION ALL
    SELECT event_id, value_c, 'ins' AS src FROM ins
"""

# ann_ivf_append: recall + per-layer pruning + append-completeness contracts
# (weak oracle, same pattern as ann_ivf_disk).
ORACLE_SQL["ann_ivf_append"] = """
    SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k,
           CAST(1 AS BIGINT) AS recall_ok,
           CAST(1 AS BIGINT) AS pruned_ok,
           CAST(1 AS BIGINT) AS append_ok
    FROM embeddings
"""

# True point-in-polygon join: the L-shape decomposes into two open boxes
# (all edges on half-integer lines, points integer -> never on a boundary).
ORACLE_SQL["pip_polygon"] = """
    WITH pl AS (
        SELECT s_suppkey,
               CAST((s_suppkey % 1000) * 256 AS DOUBLE) AS minx,
               CAST((s_suppkey // 1000) * 256 AS DOUBLE) AS miny,
               CAST(64 + (s_suppkey * 37) % 193 AS DOUBLE) AS w,
               CAST(64 + (s_suppkey * 53) % 151 AS DOUBLE) AS h
        FROM supplier
    ),
    pl2 AS (
        SELECT s_suppkey, minx, miny, w, h,
               minx + floor(w / 2) + 0.5 AS xcut,
               miny + floor(h / 2) + 0.5 AS ycut
        FROM pl
    ),
    pt AS (
        SELECT event_id,
               CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS DOUBLE) AS px,
               CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS DOUBLE) AS py
        FROM events
    )
    SELECT p.event_id, l.s_suppkey
    FROM pt p JOIN pl2 l
      ON p.px > l.minx + 0.5 AND p.px < l.minx + l.w - 0.5
     AND p.py > l.miny + 0.5 AND p.py < l.miny + l.h - 0.5
     AND (p.py < l.ycut OR p.px < l.xcut)
"""

# top-k scan with row-group stat pruning: plain ORDER BY ... LIMIT oracle.
ORACLE_SQL["topk_scan"] = """
    SELECT event_id,
           CAST(floor(value * 100) AS BIGINT) AS value_c,
           CAST(row_number() OVER (ORDER BY value DESC, event_id) AS BIGINT) AS rnk
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 20
"""


# Distributed BPE training: 10 merge rounds replayed as chained CTEs over
# the word-frequency table; sentinel-wrapped sequences make replace() the
# exact leftmost non-overlapping merge (see stages/text.seq_of_word).
ORACLE_SQL["bpe_train"] = """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    wc AS (SELECT w, count(*) AS cnt FROM tok WHERE w <> '' GROUP BY w),
    w0 AS (
        SELECT array_to_string(list_transform(range(1, length(w) + 1),
                   i -> chr(31) || w[i] || chr(31)), '') AS seq, cnt
        FROM wc
    ),
p1 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w0) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b1 AS (SELECT pair, c, 1 AS rnk FROM p1 ORDER BY c DESC, pair LIMIT 1),
w1 AS (
    SELECT replace(seq,
               chr(31) || split_part(b1.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b1.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b1.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w0, b1
),
p2 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w1) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b2 AS (SELECT pair, c, 2 AS rnk FROM p2 ORDER BY c DESC, pair LIMIT 1),
w2 AS (
    SELECT replace(seq,
               chr(31) || split_part(b2.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b2.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b2.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w1, b2
),
p3 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w2) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b3 AS (SELECT pair, c, 3 AS rnk FROM p3 ORDER BY c DESC, pair LIMIT 1),
w3 AS (
    SELECT replace(seq,
               chr(31) || split_part(b3.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b3.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b3.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w2, b3
),
p4 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w3) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b4 AS (SELECT pair, c, 4 AS rnk FROM p4 ORDER BY c DESC, pair LIMIT 1),
w4 AS (
    SELECT replace(seq,
               chr(31) || split_part(b4.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b4.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b4.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w3, b4
),
p5 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w4) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b5 AS (SELECT pair, c, 5 AS rnk FROM p5 ORDER BY c DESC, pair LIMIT 1),
w5 AS (
    SELECT replace(seq,
               chr(31) || split_part(b5.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b5.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b5.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w4, b5
),
p6 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w5) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b6 AS (SELECT pair, c, 6 AS rnk FROM p6 ORDER BY c DESC, pair LIMIT 1),
w6 AS (
    SELECT replace(seq,
               chr(31) || split_part(b6.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b6.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b6.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w5, b6
),
p7 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w6) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b7 AS (SELECT pair, c, 7 AS rnk FROM p7 ORDER BY c DESC, pair LIMIT 1),
w7 AS (
    SELECT replace(seq,
               chr(31) || split_part(b7.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b7.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b7.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w6, b7
),
p8 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w7) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b8 AS (SELECT pair, c, 8 AS rnk FROM p8 ORDER BY c DESC, pair LIMIT 1),
w8 AS (
    SELECT replace(seq,
               chr(31) || split_part(b8.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b8.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b8.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w7, b8
),
p9 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w8) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b9 AS (SELECT pair, c, 9 AS rnk FROM p9 ORDER BY c DESC, pair LIMIT 1),
w9 AS (
    SELECT replace(seq,
               chr(31) || split_part(b9.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b9.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b9.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w8, b9
),
p10 AS (
    SELECT t.sy[u.i] || chr(31) || t.sy[u.i + 1] AS pair, sum(t.cnt) AS c
    FROM (SELECT string_split(trim(seq, chr(31)), chr(31) || chr(31)) AS sy,
                 cnt FROM w9) t,
         unnest(range(1, len(t.sy))) AS u(i)
    GROUP BY 1
),
b10 AS (SELECT pair, c, 10 AS rnk FROM p10 ORDER BY c DESC, pair LIMIT 1),
w10 AS (
    SELECT replace(seq,
               chr(31) || split_part(b10.pair, chr(31), 1) || chr(31)
                       || chr(31) || split_part(b10.pair, chr(31), 2) || chr(31),
               chr(31) || replace(b10.pair, chr(31), '') || chr(31)) AS seq,
           cnt
    FROM w9, b10
)
    SELECT CAST(rnk AS BIGINT) AS rnk,
           split_part(pair, chr(31), 1) AS lft,
           split_part(pair, chr(31), 2) AS rgt,
           CAST(c AS BIGINT) AS c
    FROM (SELECT * FROM b1
UNION ALL
SELECT * FROM b2
UNION ALL
SELECT * FROM b3
UNION ALL
SELECT * FROM b4
UNION ALL
SELECT * FROM b5
UNION ALL
SELECT * FROM b6
UNION ALL
SELECT * FROM b7
UNION ALL
SELECT * FROM b8
UNION ALL
SELECT * FROM b9
UNION ALL
SELECT * FROM b10)
    ORDER BY rnk
"""

# late_events: watermark = running max of EVENT time over jittered arrival
# order (arr = tus + ±1 h hash jitter; ties broken by event_id) minus a 1 h
# allowed lateness; late events are excluded from the on-time value sum and
# counted per tumbling 1 h window
ORACLE_SQL["late_events"] = """
    WITH a AS (
        SELECT event_id,
               epoch_us(ts) AS tus,
               CAST(floor(value * 100) AS BIGINT) AS vc,
               epoch_us(ts) + (event_id * 2654435761) % 7200000000
                   - 3600000000 AS arr
        FROM events
    ),
    w AS (
        SELECT *,
               max(tus) OVER (
                   ORDER BY arr, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS pmax
        FROM a
    ),
    f AS (
        SELECT tus // 3600000000 * 3600000000 AS wnd_us,
               CASE WHEN pmax IS NOT NULL AND tus < pmax - 3600000000
                    THEN 1 ELSE 0 END AS late,
               vc
        FROM w
    )
    SELECT wnd_us,
           count(*) AS n_events,
           CAST(sum(late) AS BIGINT) AS n_late,
           CAST(sum(vc * (1 - late)) AS BIGINT) AS ontime_value_c
    FROM f GROUP BY wnd_us
"""

# seq_pack: greedy capacity-256 packing in doc_id order, replayed row by row
# with a recursive CTE (the sequential ground truth the distributed
# transfer-function scan must match exactly)
ORACLE_SQL["seq_pack"] = """
    WITH RECURSIVE docs AS (
        SELECT doc_id,
               LEAST(CAST(len(string_split(text, ' ')) AS BIGINT), 256) AS t,
               row_number() OVER (ORDER BY doc_id) AS rn
        FROM documents
    ),
    pk AS (
        SELECT rn, doc_id, t,
               CAST(0 AS BIGINT) AS pack_id,
               CAST(0 AS BIGINT) AS pack_off,
               t AS fill
        FROM docs WHERE rn = 1
        UNION ALL
        SELECT d.rn, d.doc_id, d.t,
               CASE WHEN p.fill + d.t <= 256 THEN p.pack_id
                    ELSE p.pack_id + 1 END,
               CASE WHEN p.fill + d.t <= 256 THEN p.fill ELSE 0 END,
               CASE WHEN p.fill + d.t <= 256 THEN p.fill + d.t ELSE d.t END
        FROM pk p JOIN docs d ON d.rn = p.rn + 1
    )
    SELECT doc_id, pack_id, pack_off FROM pk
"""

# zorder_scan: the layout is invisible to SQL — the oracle is the plain
# (user x time) box aggregate the pruned read must reproduce exactly
ORACLE_SQL["zorder_scan"] = """
    WITH e AS (
        SELECT user_id,
               epoch_us(ts) // 3600000000 AS hh,
               CAST(floor(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    b AS (SELECT min(hh) AS h0 FROM e)
    SELECT user_id,
           count(*) AS n_events,
           CAST(sum(vc) AS BIGINT) AS sum_value_c
    FROM e, b
    WHERE user_id >= 3 AND user_id < 7
      AND hh >= h0 + 200 AND hh < h0 + 500
    GROUP BY user_id
"""

# inverted_index: the bucketed layout is engine-internal — the oracle is the
# postings list itself for the queried terms (tf per containing document)
ORACLE_SQL["inverted_index"] = """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    SELECT term, doc_id, count(*) AS tf
    FROM toks
    WHERE term IN ('join', 'window', 'zzzabsent')
    GROUP BY term, doc_id
"""

# dataset_split: hash-stable train/val/test assignment; the per-(split,lang)
# sums make any misassigned row flip the value hash
ORACLE_SQL["dataset_split"] = """
    WITH s AS (
        SELECT doc_id, lang, n_chars,
               CASE WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 < 8
                        THEN 'train'
                    WHEN md5_number_lower(CAST(doc_id AS VARCHAR)) % 10 = 8
                        THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    SELECT split, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY split, lang
"""

# group_hll: per-language vocabulary HLL — register-exact (the per-group
# generalization of the vocab_hll oracle)
ORACLE_SQL["group_hll"] = """
    WITH tok AS (
        SELECT DISTINCT lang, unnest(string_split(text, ' ')) AS wd
        FROM documents
    ),
    h AS (SELECT lang, md5_number_lower(wd) AS hw FROM tok)
    SELECT lang, CAST(hw >> 52 AS BIGINT) AS bucket,
           CAST(max(CASE WHEN (hw & 4503599627370495) = 0 THEN 53
                    ELSE 53 - length(bin(hw & 4503599627370495)) END)
                AS BIGINT) AS r
    FROM h GROUP BY lang, bucket
"""

# aspect_bucket: integer ratio buckets + md5-ordered fixed-size batch packing
# with drop-last per bucket (diffusion-training loader shape)
ORACLE_SQL["aspect_bucket"] = f"""
    WITH img AS ({_IMG}),
    b AS (
        SELECT i,
               CASE WHEN (CAST(w AS BIGINT) * 1000) // CAST(h AS BIGINT) < 800
                        THEN 'tall'
                    WHEN (CAST(w AS BIGINT) * 1000) // CAST(h AS BIGINT) <= 1250
                        THEN 'square'
                    ELSE 'wide' END AS bucket,
               md5(CAST(i AS VARCHAR)) AS hh
        FROM img
    ),
    r AS (
        SELECT i, bucket,
               row_number() OVER (PARTITION BY bucket ORDER BY hh, i) - 1 AS rk,
               count(*) OVER (PARTITION BY bucket) AS n
        FROM b
    )
    SELECT i, bucket,
           CAST(rk // 32 AS BIGINT) AS batch_id,
           CAST(rk % 32 AS BIGINT) AS slot
    FROM r WHERE rk < (n // 32) * 32
"""

# time_travel: version 1 = the pre-append subset, version 2 = everything;
# equality proves as-of reads reconstruct each snapshot exactly
ORACLE_SQL["time_travel"] = """
    WITH vc AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS v
        FROM events
    )
    SELECT CAST(1 AS BIGINT) AS version, event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(v) AS BIGINT) AS sum_value_c
    FROM vc WHERE event_id % 7 != 0 GROUP BY event_type
    UNION ALL
    SELECT CAST(2 AS BIGINT), event_type,
           CAST(count(*) AS BIGINT), CAST(sum(v) AS BIGINT)
    FROM vc GROUP BY event_type
"""

# idw_grid: integer fixed-point IDW surface — 3x3 candidate tiles per point,
# exact d^2 radius filter, w = 2^24 // d^2
ORACLE_SQL["idw_grid"] = f"""
    WITH pts AS (
        SELECT event_id,
               CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS BIGINT) AS px,
               CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS BIGINT) AS py,
               CAST(floor(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    cand AS (
        SELECT p.px, p.py, p.vc,
               p.px // 256 + dx.o AS tx,
               p.py // 256 + dy.o AS ty
        FROM pts p,
             (SELECT unnest([-1, 0, 1]) AS o) dx,
             (SELECT unnest([-1, 0, 1]) AS o) dy
    ),
    wtab AS (
        SELECT tx, ty,
               16777216 // greatest(
                   (px - (tx * 256 + 128)) * (px - (tx * 256 + 128))
                   + (py - (ty * 256 + 128)) * (py - (ty * 256 + 128)), 1) AS w,
               vc
        FROM cand
        WHERE (px - (tx * 256 + 128)) * (px - (tx * 256 + 128))
              + (py - (ty * 256 + 128)) * (py - (ty * 256 + 128)) <= 36864
    )
    SELECT tx, ty,
           CAST(count(*) AS BIGINT) AS n_pts,
           CAST(sum(w) AS BIGINT) AS wsum,
           CAST(sum(w * vc) AS BIGINT) AS wvsum
    FROM wtab GROUP BY tx, ty
"""

# trajectories: per-user ordered step aggregate, integer-exact squared lengths
ORACLE_SQL["trajectories"] = """
    WITH pts AS (
        SELECT user_id, ts, event_id,
               CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS BIGINT) AS px,
               CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS BIGINT) AS py
        FROM events
    ),
    stp AS (
        SELECT user_id,
               px - lag(px) OVER w AS dx,
               py - lag(py) OVER w AS dy
        FROM pts
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_steps,
           CAST(sum(dx * dx + dy * dy) AS BIGINT) AS sum_d2,
           CAST(max(dx * dx + dy * dy) AS BIGINT) AS max_d2
    FROM stp WHERE dx IS NOT NULL
    GROUP BY user_id
"""

# tile_pyramid: zoom 0..3 rollup — each level is the direct aggregate of the
# points at that cell size, which must equal the engine's level-by-level rollup
ORACLE_SQL["tile_pyramid"] = """
    WITH pts AS (
        SELECT event_id,
               CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS BIGINT) // 256 AS tx,
               CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS BIGINT) // 256 AS ty
        FROM events
    ),
    lv AS (SELECT unnest([0, 1, 2, 3]) AS level)
    SELECT CAST(level AS BIGINT) AS level,
           tx // (1 << level) AS cx,
           ty // (1 << level) AS cy,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(event_id) AS BIGINT) AS sum_eid
    FROM pts, lv
    GROUP BY level, cx, cy
"""

# fuzzy_pairs: quadratic levenshtein ground truth — the FastSS candidate
# generation must reach exactly these pairs (guaranteed recall at ed<=1)
ORACLE_SQL["fuzzy_pairs"] = """
    WITH v AS (SELECT DISTINCT c_name FROM customer)
    SELECT a.c_name AS a, b.c_name AS b
    FROM v a JOIN v b
      ON a.c_name < b.c_name AND levenshtein(a.c_name, b.c_name) <= 1
"""

# skyline: analytic Pareto formulation — a row survives iff its ts is its
# value-group minimum AND strictly precedes every greater-value group's min
ORACLE_SQL["skyline"] = """
    WITH t AS (
        SELECT event_type, event_id,
               CAST(floor(value * 100) AS BIGINT) AS vc,
               CAST(epoch_us(ts) AS BIGINT) AS tus
        FROM events
    ),
    m AS (
        SELECT *,
               min(tus) OVER (PARTITION BY event_type, vc) AS min_tus_eq,
               min(tus) OVER (
                   PARTITION BY event_type ORDER BY vc DESC
                   RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS min_tus_gt
        FROM t
    )
    SELECT event_type, event_id, vc, tus
    FROM m
    WHERE tus = min_tus_eq AND (min_tus_gt IS NULL OR tus < min_tus_gt)
"""


# image_histogram: decode replayed per pixel (same CTE chain as zonal_stats),
# 8-bin luminance histogram — bin = (r+g+b) // 96
ORACLE_SQL["image_histogram"] = """
WITH n AS (SELECT greatest(count(*), 1000) AS cnt FROM part),
ords AS (
    SELECT unnest(generate_series(0, CAST((SELECT cnt FROM n) AS BIGINT) - 1)) AS i
),
imgs AS (
    SELECT i,
           CAST(CASE WHEN i % 101 = 0 AND i > 0 THEN i - 1 ELSE i END AS HUGEINT) AS src,
           (i % 3 = 0) AS is_qz
    FROM ords
),
s0 AS (
    SELECT *, (src + 11400714819323198485) % 18446744073709551616 AS z0 FROM imgs
),
s0x AS (SELECT *, xor(z0, z0 // 1073741824) AS a0 FROM s0),
s1 AS (
    SELECT *,
           ((a0 % 4294967296) * 13787848793156543929
            + (((a0 // 4294967296) * 13787848793156543929) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z1
    FROM s0x
),
s1x AS (SELECT *, xor(z1, z1 // 134217728) AS a1 FROM s1),
s2 AS (
    SELECT *,
           ((a1 % 4294967296) * 10723151780598845931
            + (((a1 // 4294967296) * 10723151780598845931) % 18446744073709551616)
              * 4294967296) % 18446744073709551616 AS z2
    FROM s1x
),
seeds AS (SELECT *, xor(z2, z2 // 2147483648) AS seed FROM s2),
meta AS (
    SELECT CAST(i AS BIGINT) AS i, is_qz,
           CAST(16 + (src * 37) % 49 AS BIGINT) AS w,
           CAST(16 + (src * 53) % 41 AS BIGINT) AS h,
           CAST(seed % 256 AS BIGINT) AS o0,
           CAST((seed // 256) % 256 AS BIGINT) AS o1,
           CAST((seed // 65536) % 256 AS BIGINT) AS o2
    FROM seeds
),
dec AS (
    SELECT m.i, m.h, m.w, ys.y, xs.x,
           CASE WHEN is_qz THEN p0 - (p0 % 4) + 2 ELSE p0 END AS d0,
           CASE WHEN is_qz THEN p1 - (p1 % 4) + 2 ELSE p1 END AS d1,
           CASE WHEN is_qz THEN p2 - (p2 % 4) + 2 ELSE p2 END AS d2
    FROM meta m,
         LATERAL (SELECT unnest(generate_series(0, m.h - 1)) AS y) ys,
         LATERAL (SELECT unnest(generate_series(0, m.w - 1)) AS x) xs,
         LATERAL (SELECT (ys.y * 3 + xs.x * 5 + m.o0) % 256 AS p0,
                         (ys.y * 7 + xs.x * 2 + m.o1) % 256 AS p1,
                         (ys.y * 1 + xs.x * 11 + m.o2) % 256 AS p2) p
)
SELECT i, (d0 + d1 + d2) // 96 AS bin,
       CAST(count(*) AS BIGINT) AS n_px
FROM dec
GROUP BY i, bin
"""

# anomaly_mad: nearest-rank median + MAD per user, exact integers — the rank
# convention matches group_median (0-based index (n-1)//2 of the sorted set)
ORACLE_SQL["anomaly_mad"] = """
    WITH v AS (
        SELECT user_id, event_id, CAST(floor(value * 100) AS BIGINT) AS vc
        FROM events
    ),
    r AS (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY vc, event_id) AS rk,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM v
    ),
    med AS (SELECT user_id, vc AS med_c FROM r WHERE rk = (n - 1) // 2 + 1),
    d AS (
        SELECT v.user_id, v.event_id, v.vc, m.med_c,
               abs(v.vc - m.med_c) AS ad
        FROM v JOIN med m USING (user_id)
    ),
    r2 AS (
        SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ad, event_id) AS rk,
               count(*) OVER (PARTITION BY user_id) AS n
        FROM d
    ),
    mad AS (SELECT user_id, ad AS mad_c FROM r2 WHERE rk = (n - 1) // 2 + 1)
    SELECT d.user_id, d.event_id, d.vc, d.med_c, m2.mad_c
    FROM d JOIN mad m2 USING (user_id)
    WHERE d.ad > 3 * m2.mad_c
"""

# nearest_rect: ring-bounded nearest footprint — candidates via the dilated
# covering-tile expansion (equi-join on tile), exact integer point-rect d²,
# ties to the smallest ordinal
ORACLE_SQL["nearest_rect"] = f"""
    WITH img AS ({_IMG}),
    imgd AS (
        SELECT i, CAST(minx AS BIGINT) AS minx, CAST(miny AS BIGINT) AS miny,
               CAST(maxx AS BIGINT) AS maxx, CAST(maxy AS BIGINT) AS maxy,
               CAST(minx AS BIGINT) // 256 - 1 AS tx_lo,
               (CAST(maxx AS BIGINT) - 1) // 256 + 1 AS tx_hi,
               CAST(miny AS BIGINT) // 256 - 1 AS ty_lo,
               (CAST(maxy AS BIGINT) - 1) // 256 + 1 AS ty_hi
        FROM img
    ),
    cand AS (
        SELECT m.*, txs.tx, tys.ty
        FROM imgd m,
             LATERAL (SELECT unnest(generate_series(m.tx_lo, m.tx_hi)) AS tx) txs,
             LATERAL (SELECT unnest(generate_series(m.ty_lo, m.ty_hi)) AS ty) tys
    ),
    pts AS (
        SELECT event_id,
               CAST((event_id % 1000) * 256 + (event_id * 7) % 256 AS BIGINT) AS px,
               CAST(((event_id // 1000) % 20) * 256 + (event_id * 13) % 256 AS BIGINT) AS py
        FROM events
    ),
    j AS (
        SELECT p.event_id, c.i,
               greatest(c.minx - p.px, p.px - c.maxx, 0) AS dx,
               greatest(c.miny - p.py, p.py - c.maxy, 0) AS dy
        FROM pts p JOIN cand c ON c.tx = p.px // 256 AND c.ty = p.py // 256
    ),
    d AS (
        SELECT event_id, i, CAST(dx * dx + dy * dy AS BIGINT) AS d2,
               row_number() OVER (
                   PARTITION BY event_id ORDER BY dx * dx + dy * dy, i
               ) AS rk
        FROM j
    )
    SELECT event_id, i, d2 FROM d WHERE rk = 1
"""

# dbscan: full replay — point derivation, grid-candidate neighbor counts,
# core graph, recursive min-label closure (cluster = min CORE member),
# border = min core-neighbor label. MATERIALIZED hints keep the recursive
# step from replaying the candidate joins every iteration.
ORACLE_SQL["dbscan"] = """
    WITH RECURSIVE
    par AS (SELECT greatest(1, (SELECT count(*) FROM events) // 8000) AS t),
    pts AS (
        SELECT event_id,
               CASE WHEN event_id % 13 = 0
                         OR (event_id // 97) % (SELECT t FROM par) != 0
                    THEN (event_id * 9973) % 1000000
                    ELSE ((event_id % 97) % 40) * 512 + 128 +
                         CASE WHEN event_id % 11 = 0
                              THEN 96 + (event_id * 7) % 32
                              ELSE (event_id * 7) % 64 END
               END AS pxd,
               CASE WHEN event_id % 13 = 0
                         OR (event_id // 97) % (SELECT t FROM par) != 0
                    THEN 30000 + (event_id * 31) % 5000
                    ELSE ((event_id % 97) // 40) * 512 + 128 +
                         CASE WHEN event_id % 11 = 0
                              THEN 96 + (event_id * 13) % 32
                              ELSE (event_id * 13) % 64 END
               END AS pyd
        FROM events
    ),
    c AS MATERIALIZED (
        SELECT event_id, CAST(pxd AS BIGINT) AS px, CAST(pyd AS BIGINT) AS py,
               CAST(pxd AS BIGINT) // 128 AS cx, CAST(pyd AS BIGINT) // 128 AS cy
        FROM pts
    ),
    nb AS MATERIALIZED (
        SELECT a.event_id, count(*) AS n
        FROM c a JOIN c b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) <= 16384
        GROUP BY a.event_id
    ),
    core AS MATERIALIZED (
        SELECT c.* FROM c JOIN nb USING (event_id) WHERE nb.n >= 6
    ),
    e1 AS MATERIALIZED (
        SELECT a.event_id AS s, b.event_id AS d
        FROM core a JOIN core b
          ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
         AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
         AND a.event_id < b.event_id
         AND (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) <= 16384
    ),
    edges AS MATERIALIZED (
        SELECT s, d FROM e1 UNION ALL SELECT d, s FROM e1
    ),
    reach(node, r) AS (
        SELECT event_id, event_id FROM core
        UNION
        SELECT reach.node, e.d FROM reach JOIN edges e ON reach.r = e.s
    ),
    cc AS MATERIALIZED (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
    SELECT core.event_id, CAST(cc.cluster_id AS BIGINT) AS cluster_id,
           'core' AS role
    FROM core JOIN cc ON cc.node = core.event_id
    UNION ALL
    SELECT a.event_id, CAST(min(cc.cluster_id) AS BIGINT), 'border'
    FROM c a
    JOIN core b
      ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
     AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
     AND (a.px-b.px)*(a.px-b.px) + (a.py-b.py)*(a.py-b.py) <= 16384
    JOIN cc ON cc.node = b.event_id
    WHERE a.event_id NOT IN (SELECT event_id FROM core)
    GROUP BY a.event_id
"""

# ann_hnsw: recall-contract row (same weak-oracle shape as ann_lsh/ann_ivf)
ORACLE_SQL["ann_hnsw"] = """
    SELECT CAST(8 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
           CAST(1 AS BIGINT) AS recall_ok
"""

# group_corr: exact integer Pearson sufficient statistics per event type
ORACLE_SQL["group_corr"] = """
    WITH m AS (
        SELECT event_type,
               CAST(floor(value * 100) AS BIGINT) AS x,
               CAST(epoch_us(ts) AS BIGINT) // 3600000000 % 24 AS y
        FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy,
           CAST(sum(x * x) AS BIGINT) AS sxx,
           CAST(sum(y * y) AS BIGINT) AS syy,
           CAST(sum(x * y) AS BIGINT) AS sxy
    FROM m GROUP BY event_type
"""

# cms_sketch: every Count-Min register recomputed from scratch — row r's
# cell is Kirsch-Mitzenmacher (lower + r*(upper|1)) mod 2^64 mod 1024 from
# ONE md5 per term (the exact Ray-side values), register = SUM of counts
ORACLE_SQL["cms_sketch"] = """
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
    c AS (SELECT term, count(*) AS n FROM tok GROUP BY term),
    hh AS (
        SELECT term, n,
               CAST(CAST(md5_number_lower(term) AS UBIGINT) AS HUGEINT) AS lo,
               CAST(CAST(md5_number_upper(term) AS UBIGINT) | 1 AS HUGEINT) AS hi
        FROM c
    ),
    h AS (
        SELECT r.r,
               CAST((lo + r.r * hi) % 18446744073709551616 % 1024 AS BIGINT) AS j,
               n
        FROM hh CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS r) r
    )
    SELECT CAST(r AS BIGINT) AS r, j, CAST(sum(n) AS BIGINT) AS cnt
    FROM h GROUP BY r, j
"""

# weighted_sample: the Efraimidis-Spirakis exponential race replayed in SQL —
# u = (md5_number_lower(id)+1)/2^64 rounded to DOUBLE identically to the
# numpy side (h+1 rounds once), clock s = -ln(u)/weight, 50 smallest win
ORACLE_SQL["weighted_sample"] = """
    WITH v AS (
        SELECT event_id, CAST(floor(value * 100) AS BIGINT) + 1 AS wgt FROM events
    ),
    k AS (
        SELECT event_id, wgt,
               -ln(CAST(md5_number_lower(CAST(event_id AS VARCHAR)) + 1
                        AS DOUBLE) / 18446744073709551616.0) / wgt AS s
        FROM v
    )
    SELECT event_id, wgt,
           CAST(row_number() OVER (ORDER BY s, event_id) AS BIGINT) AS rk
    FROM k ORDER BY s, event_id LIMIT 50
"""

# image_quality: pixel re-derivation (shared generator CTEs) + total-
# variation edge sums via positional self-joins on (i, x+1, y) / (i, x, y+1)
ORACLE_SQL["image_quality"] = f"""
WITH {_IMG_IHASH_CTES},
g AS (SELECT i, w, h, x, y, d0 + d1 + d2 AS gray FROM dec),
base AS (
    SELECT i, max(w) AS w, max(h) AS h,
           sum(gray) AS sum_g, sum(gray * gray) AS sum_sq
    FROM g GROUP BY i
),
ex AS (
    SELECT a.i, sum(abs(b.gray - a.gray)) AS e
    FROM g a JOIN g b ON a.i = b.i AND b.y = a.y AND b.x = a.x + 1
    GROUP BY a.i
),
ey AS (
    SELECT a.i, sum(abs(b.gray - a.gray)) AS e
    FROM g a JOIN g b ON a.i = b.i AND b.x = a.x AND b.y = a.y + 1
    GROUP BY a.i
)
SELECT base.i, CAST(base.w AS BIGINT) AS w, CAST(base.h AS BIGINT) AS h,
       CAST(base.sum_g AS BIGINT) AS sum_g, CAST(base.sum_sq AS BIGINT) AS sum_sq,
       CAST(COALESCE(ex.e, 0) AS BIGINT) AS edge_x,
       CAST(COALESCE(ey.e, 0) AS BIGINT) AS edge_y
FROM base LEFT JOIN ex ON base.i = ex.i LEFT JOIN ey ON base.i = ey.i
"""


# ann_ivf_pq: approximate by design — the recall floor is the contract row
ORACLE_SQL["ann_ivf_pq"] = """
    SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k,
           CAST(1 AS BIGINT) AS recall_ok
    FROM embeddings
"""

# lsh_disk: retrieval replayed as all-pairs 3-gram Jaccard restricted to the
# 8 fixed query ordinals (recall of the banded index is complete on this
# corpus — the same guarantee near_dup_pairs is gate-green on); short docs
# (<3 tokens) collapse to a single whole-doc shingle, mirroring
# _shingle_hashes' <shingle fallback
ORACLE_SQL["lsh_disk"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sh AS (
        SELECT doc_id,
               CASE WHEN len(tk) >= 3
                    THEN list_distinct(list_transform(range(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))
                    ELSE [array_to_string(tk, ' ')] END AS s
        FROM tok
    ),
    n AS (SELECT count(*) AS cnt FROM documents),
    qids AS (
        SELECT DISTINCT unnest(generate_series(0, 7)) * ((SELECT cnt FROM n) // 8) AS q_id
    ),
    p AS (
        SELECT q.q_id, b.doc_id AS cand_id,
               len(list_intersect(a.s, b.s)) AS i,
               len(a.s) AS na, len(b.s) AS nb
        FROM qids q JOIN sh a ON a.doc_id = q.q_id JOIN sh b ON true
    )
    SELECT CAST(q_id AS BIGINT) AS q_id, CAST(cand_id AS BIGINT) AS cand_id,
           CAST(100 * i // (na + nb - i) AS BIGINT) AS j_pct,
           CAST(1 AS BIGINT) AS pruned_ok
    FROM p WHERE 100 * i // (na + nb - i) >= 50
"""

# dp_counts: the discrete-Laplace mechanism replayed exactly — u's are md5
# uniforms of the group key, noise = floor(ln(u1)/-1) - floor(ln(u2)/-1)
ORACLE_SQL["dp_counts"] = """
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
    u AS (
        SELECT lang, n_docs,
               (CAST(md5_number_lower(lang || '#dp1') AS DOUBLE) + 1)
                   / 18446744073709551616.0 AS u1,
               (CAST(md5_number_lower(lang || '#dp2') AS DOUBLE) + 1)
                   / 18446744073709551616.0 AS u2
        FROM c
    )
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs + CAST(floor(ln(u1) / -1.0) AS BIGINT)
                       - CAST(floor(ln(u2) / -1.0) AS BIGINT) AS BIGINT) AS n_dp
    FROM u
"""

# bm25_disk: identical scoring to bm25_topk (the index changes I/O, not
# values) + the pruning contract constant
ORACLE_SQL["bm25_disk"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    stats AS (
        SELECT count(*) AS n_docs, sum(len(tk)) AS tot FROM tok
    ),
    inst AS (SELECT doc_id, unnest(tk) AS term, len(tk) AS dl FROM tok),
    tf AS (
        SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
        FROM inst
        WHERE term IN ('table', 'value', 'data', 'window', 'join')
        GROUP BY doc_id, term
    ),
    scored AS (
        SELECT term, doc_id, CAST(tf AS BIGINT) AS tf, CAST(dl AS BIGINT) AS dl,
               CAST((22 * tf * tot * 1000000)
                    // (10 * tf * tot + 3 * tot + 9 * dl * n_docs) AS BIGINT)
                   AS score_fp
        FROM tf, stats
    )
    SELECT term, doc_id, tf, dl, score_fp,
           CAST(row_number() OVER (
               PARTITION BY term ORDER BY score_fp DESC, doc_id
           ) AS BIGINT) AS rnk,
           CAST(1 AS BIGINT) AS pruned_ok
    FROM scored
    QUALIFY rnk <= 10
"""

# ann_filtered: approximate by design — the recall floor vs the exact
# FILTERED brute force is the contract row
ORACLE_SQL["ann_filtered"] = """
    SELECT CAST(least(count(*), 8) AS BIGINT) AS n_queries,
           CAST(10 AS BIGINT) AS k,
           CAST(1 AS BIGINT) AS recall_ok
    FROM embeddings
"""

# topo_global: the continuous-strip corpus collapses every ring to its 4
# corners with the 16x8 area preserved — closed form per supplier
ORACLE_SQL["topo_global"] = """
    SELECT s_suppkey, CAST(5 AS BIGINT) AS n_pts_out,
           CAST(12800 AS BIGINT) AS area_c
    FROM supplier
"""


# ipc_scan: same aggregate as jsonl_scan — the parquet side proves the
# Arrow-IPC roundtrip lossless
ORACLE_SQL["ipc_scan"] = """
    SELECT lang, source,
           CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents GROUP BY lang, source
"""

# multimodal_curation: size AND clip gates from the shared generator CTEs,
# the caption-sensitive dedup rule (a dup ordinal only drops when its
# ORIGINAL also survived both gates — captions differ per ordinal), then
# the split hash; dot/na2/nb2 CTEs are the clip_score oracle's
ORACLE_SQL["multimodal_curation"] = f"""
WITH {_IMG_IHASH_CTES},
iv AS (SELECT i, br AS d, sum(s) AS rs FROM bsum GROUP BY i, br),
ivec AS (SELECT iv.i, iv.d, 8 * iv.rs - tot.t AS a FROM iv JOIN tot USING (i)),
cwords(widx, w) AS (VALUES
    (0, 'tile'), (1, 'grid'), (2, 'cell'), (3, 'river'), (4, 'field'),
    (5, 'road'), (6, 'house'), (7, 'tree'), (8, 'cloud'), (9, 'shadow'),
    (10, 'rock'), (11, 'water'), (12, 'bridge'), (13, 'tower'), (14, 'farm'),
    (15, 'forest'), (16, 'lake'), (17, 'coast'), (18, 'dune'), (19, 'track')),
ktab AS (SELECT unnest(range(5)) AS k),
capw AS (
    SELECT m.i, cw.w
    FROM meta m CROSS JOIN ktab kt
    JOIN cwords cw ON cw.widx = (m.i * (kt.k + 3) + kt.k) % 20
),
toks AS (
    SELECT i, 'caption' AS w FROM meta
    UNION ALL SELECT i, CAST(i AS VARCHAR) AS w FROM meta
    UNION ALL SELECT i, w FROM capw
),
dtab AS (SELECT unnest(range(8)) AS d),
tvec AS (
    SELECT t.i, dt.d,
           sum(CAST((md5_number_lower(t.w) >> CAST(8 * dt.d AS INTEGER)) & 255
                    AS BIGINT) - 128) AS b
    FROM toks t CROSS JOIN dtab dt
    GROUP BY t.i, dt.d
),
sc AS (
    SELECT v.i,
           sum(CAST(v.a AS HUGEINT) * tv.b) AS dot,
           sum(CAST(v.a AS HUGEINT) * v.a) AS na2,
           sum(CAST(tv.b AS HUGEINT) * tv.b) AS nb2
    FROM ivec v JOIN tvec tv ON tv.i = v.i AND tv.d = v.d
    GROUP BY v.i
),
gate AS (
    SELECT m.i, m.w, m.h, sc.dot
    FROM meta m JOIN sc ON sc.i = m.i
    WHERE m.w * m.h >= 1200
      AND sc.dot > 0 AND 10000 * sc.dot * sc.dot >= 25 * sc.na2 * sc.nb2
),
ded AS (
    SELECT g.* FROM gate g
    WHERE NOT (g.i % 101 = 0 AND g.i > 0
               AND (g.i - 1) IN (SELECT i FROM gate))
),
fin AS (
    SELECT CASE WHEN (i * 2654435761) % 4294967296 % 10 = 9
                THEN 'val' ELSE 'train' END AS split,
           i, w * h AS px, dot
    FROM ded
)
SELECT split, CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(px) AS BIGINT) AS sum_px, CAST(sum(i) AS BIGINT) AS id_sum,
       CAST(sum(dot) AS BIGINT) AS dot_sum
FROM fin GROUP BY split
"""

# gpkg_scan: the rect rule is pure supplier-key arithmetic
ORACLE_SQL["gpkg_scan"] = """
    SELECT s_suppkey,
           CAST((5 + s_suppkey % 3) * (3 + s_suppkey % 5) * 100 AS BIGINT)
               AS area_c,
           CAST(2 * ((5 + s_suppkey % 3) + (3 + s_suppkey % 5)) * 100 AS BIGINT)
               AS perim_c
    FROM supplier
"""


# npy_scan: integer per-vector checksums re-derived from the parquet
# list<float> column — float32 roundtrip is exact (the .npy stores the
# same float32 the table holds)
ORACLE_SQL["npy_scan"] = """
    SELECT vec_id,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(floor(100.0 * CAST(x AS DOUBLE)) AS BIGINT)))
                AS BIGINT) AS checksum
    FROM embeddings
"""

# wds_scan: per-codec counts + decoded-gray sums + caption characters, all
# re-derived from the generator CTEs (pixels from dec, caption text from
# the ordinal word rule)
ORACLE_SQL["wds_scan"] = f"""
WITH {_IMG_IHASH_CTES},
g AS (SELECT i, sum(d0 + d1 + d2) AS gray FROM dec GROUP BY i),
cwords(widx, w) AS (VALUES
    (0, 'tile'), (1, 'grid'), (2, 'cell'), (3, 'river'), (4, 'field'),
    (5, 'road'), (6, 'house'), (7, 'tree'), (8, 'cloud'), (9, 'shadow'),
    (10, 'rock'), (11, 'water'), (12, 'bridge'), (13, 'tower'), (14, 'farm'),
    (15, 'forest'), (16, 'lake'), (17, 'coast'), (18, 'dune'), (19, 'track')),
ktab AS (SELECT unnest(range(5)) AS k),
caps AS (
    SELECT m.i,
           'caption ' || CAST(m.i AS VARCHAR) || ' ' ||
           string_agg(cw.w, ' ' ORDER BY kt.k) AS cap
    FROM meta m CROSS JOIN ktab kt
    JOIN cwords cw ON cw.widx = (m.i * (kt.k + 3) + kt.k) % 20
    GROUP BY m.i
)
SELECT CASE WHEN m.is_qz THEN 'qz1' ELSE 'raw0' END AS fmt,
       CAST(count(*) AS BIGINT) AS n_images,
       CAST(sum(g.gray) AS BIGINT) AS sum_gray,
       CAST(sum(length(c.cap)) AS BIGINT) AS sum_caplen
FROM meta m JOIN g ON g.i = m.i JOIN caps c ON c.i = m.i
GROUP BY 1
"""

# cohort_retention: weekly first-seen cohorts x activity age, distinct users
ORACLE_SQL["cohort_retention"] = """
    WITH a AS (
        SELECT DISTINCT user_id,
               epoch_us(ts) // (7 * 86400000000) AS wk
        FROM events
    ),
    f AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY user_id)
    SELECT CAST(f.cohort AS BIGINT) AS cohort,
           CAST(least(a.wk - f.cohort, 8) AS BIGINT) AS age,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
"""

# kcore: 8 chained peel rounds over the all-pairs jaccard edge set (peel
# with an empty sub-k set is a no-op, so the chain replays the engine's
# early-stop exactly); conv = no sub-k node remains after round 8
ORACLE_SQL["kcore"] = """
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(tk) - 1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS s
        FROM tok WHERE len(tk) >= 3
    ),
    p AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
    ),
    e0 AS MATERIALIZED (
        SELECT doc_a AS a, doc_b AS b FROM p
        UNION ALL SELECT doc_b, doc_a FROM p
    ),
    d1 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e0 GROUP BY a),
    s1 AS MATERIALIZED (SELECT a FROM d1 WHERE deg < 2),
    e1 AS MATERIALIZED (
        SELECT e.a, e.b FROM e0 e
        WHERE e.a NOT IN (SELECT a FROM s1)
          AND e.b NOT IN (SELECT a FROM s1)
    ),
    d2 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e1 GROUP BY a),
    s2 AS MATERIALIZED (SELECT a FROM d2 WHERE deg < 2),
    e2 AS MATERIALIZED (
        SELECT e.a, e.b FROM e1 e
        WHERE e.a NOT IN (SELECT a FROM s2)
          AND e.b NOT IN (SELECT a FROM s2)
    ),
    d3 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e2 GROUP BY a),
    s3 AS MATERIALIZED (SELECT a FROM d3 WHERE deg < 2),
    e3 AS MATERIALIZED (
        SELECT e.a, e.b FROM e2 e
        WHERE e.a NOT IN (SELECT a FROM s3)
          AND e.b NOT IN (SELECT a FROM s3)
    ),
    d4 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e3 GROUP BY a),
    s4 AS MATERIALIZED (SELECT a FROM d4 WHERE deg < 2),
    e4 AS MATERIALIZED (
        SELECT e.a, e.b FROM e3 e
        WHERE e.a NOT IN (SELECT a FROM s4)
          AND e.b NOT IN (SELECT a FROM s4)
    ),
    d5 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e4 GROUP BY a),
    s5 AS MATERIALIZED (SELECT a FROM d5 WHERE deg < 2),
    e5 AS MATERIALIZED (
        SELECT e.a, e.b FROM e4 e
        WHERE e.a NOT IN (SELECT a FROM s5)
          AND e.b NOT IN (SELECT a FROM s5)
    ),
    d6 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e5 GROUP BY a),
    s6 AS MATERIALIZED (SELECT a FROM d6 WHERE deg < 2),
    e6 AS MATERIALIZED (
        SELECT e.a, e.b FROM e5 e
        WHERE e.a NOT IN (SELECT a FROM s6)
          AND e.b NOT IN (SELECT a FROM s6)
    ),
    d7 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e6 GROUP BY a),
    s7 AS MATERIALIZED (SELECT a FROM d7 WHERE deg < 2),
    e7 AS MATERIALIZED (
        SELECT e.a, e.b FROM e6 e
        WHERE e.a NOT IN (SELECT a FROM s7)
          AND e.b NOT IN (SELECT a FROM s7)
    ),
    d8 AS MATERIALIZED (SELECT a, count(*) AS deg FROM e7 GROUP BY a),
    s8 AS MATERIALIZED (SELECT a FROM d8 WHERE deg < 2),
    e8 AS MATERIALIZED (
        SELECT e.a, e.b FROM e7 e
        WHERE e.a NOT IN (SELECT a FROM s8)
          AND e.b NOT IN (SELECT a FROM s8)
    ),
    fin AS (SELECT a AS node, count(*) AS degree FROM e8 GROUP BY a),
    conv AS (
        SELECT CASE WHEN EXISTS (SELECT 1 FROM fin WHERE degree < 2)
                    THEN 0 ELSE 1 END AS c
    )
    SELECT CAST(node AS BIGINT) AS node, CAST(degree AS BIGINT) AS degree,
           CAST((SELECT c FROM conv) AS BIGINT) AS conv_ok
    FROM fin
"""

# mixup_pairs: md5-rank pairing within aspect buckets + per-channel
# (a+b)//2 composites over the overlapping region, from the generator CTEs
ORACLE_SQL["mixup_pairs"] = f"""
WITH {_IMG_IHASH_CTES},
lbl AS (
    SELECT m.i, m.w, m.h,
           CASE WHEN m.w * 1000 // m.h < 800 THEN 'tall'
                WHEN m.w * 1000 // m.h <= 1250 THEN 'square'
                ELSE 'wide' END AS bucket,
           md5(CAST(m.i AS VARCHAR)) AS hh
    FROM meta m
),
r AS (
    SELECT i, bucket,
           row_number() OVER (PARTITION BY bucket ORDER BY hh, i) - 1 AS rk,
           count(*) OVER (PARTITION BY bucket) AS n
    FROM lbl
),
pr AS MATERIALIZED (
    SELECT bucket, rk // 2 AS pair,
           min(CASE WHEN rk % 2 = 0 THEN i END) AS i_a,
           min(CASE WHEN rk % 2 = 1 THEN i END) AS i_b
    FROM r WHERE rk < (n // 2) * 2
    GROUP BY bucket, rk // 2
),
dims AS MATERIALIZED (
    SELECT pr.i_a, pr.i_b, least(ma.w, mb.w) AS w, least(ma.h, mb.h) AS h
    FROM pr JOIN meta ma ON ma.i = pr.i_a JOIN meta mb ON mb.i = pr.i_b
),
dm AS MATERIALIZED (SELECT * FROM dec),
px AS (
    SELECT d.i_a, d.i_b, d.w, d.h,
           (a.d0 + bb.d0) // 2 AS c0,
           (a.d1 + bb.d1) // 2 AS c1,
           (a.d2 + bb.d2) // 2 AS c2
    FROM dims d
    JOIN dm a ON a.i = d.i_a AND a.x < d.w AND a.y < d.h
    JOIN dm bb ON bb.i = d.i_b AND bb.x = a.x AND bb.y = a.y
)
SELECT i_a, i_b, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
       CAST(sum(c0 + c1 + c2) AS BIGINT) AS comp_sum,
       CAST(sum(c0 * c0 + c1 * c1 + c2 * c2) AS BIGINT) AS comp_sq
FROM px GROUP BY i_a, i_b, w, h
"""

# orc_scan: same aggregate from the parquet side — equality proves the ORC
# write/read roundtrip lossless (int64 / string / float columns)
ORACLE_SQL["orc_scan"] = """
    SELECT event_type,
           CAST(sum(event_id) AS BIGINT) AS sum_event_id,
           CAST(sum(user_id) AS BIGINT) AS sum_user_id,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_c,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
"""

# ann_hnsw_disk: recall contract + disk==memory equality + shard-file count
# (same weak-oracle shape as ann_hnsw/ann_ivf_disk)
ORACLE_SQL["ann_hnsw_disk"] = """
    SELECT CAST(8 AS BIGINT) AS n_queries, CAST(10 AS BIGINT) AS k,
           CAST(1 AS BIGINT) AS recall_ok, CAST(1 AS BIGINT) AS loaded_eq,
           CAST(1 AS BIGINT) AS files_ok
"""
