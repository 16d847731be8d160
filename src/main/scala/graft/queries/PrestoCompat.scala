package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{Engine, Q, Tables}

/** Queries written in PRESTO dialect, executed through Engine.sql with the
  * compatibility registry (graft.functions.PrestoFunctions) — demonstrating
  * that reference SQL runs unchanged. Oracles use the DuckDB spellings of
  * the same semantics.
  */
object PrestoCompat {

  private def presto(text: String): (SparkSession, String) => DataFrame =
    (s, d) => Engine.cached(s, d).sql(text)

  val queries: Map[String, Q] = Map(

    // Presto string surface: strpos, levenshtein_distance, codepoint,
    // split_part, reverse (StringFunctions.java names).
    "p01_presto_strings" -> Q(
      presto("""
        SELECT doc_id,
          strpos(text, 'data') AS pos_data,
          levenshtein_distance(lang, 'en') AS lev,
          codepoint(lang) AS cp,
          split_part(source, 'c', 2) AS src_tail,
          CAST(cardinality(split(text, ' ')) AS INT) AS n_words
        FROM documents ORDER BY doc_id"""),
      Some("""
        SELECT doc_id,
          CAST(strpos(text, 'data') AS INT) AS pos_data,
          CAST(levenshtein(lang, 'en') AS INT) AS lev,
          CAST(ascii(lang) AS INT) AS cp,
          split_part(source, 'c', 2) AS src_tail,
          CAST(len(string_split(text, ' ')) AS INT) AS n_words
        FROM documents ORDER BY doc_id""")),

    // Presto datetime surface: date_parse/date_format with MySQL patterns
    // (DateTimeFunctions.java — translated to java.time internally),
    // to_unixtime, day_of_week/day_of_year ISO numbering.
    "p02_presto_datetime" -> Q(
      presto("""
        SELECT o_orderkey,
          date_format(o_orderdate, '%Y-%m-%d') AS iso,
          date_format(o_orderdate, '%d/%m/%Y %H:%i') AS eu,
          CAST(to_unixtime(o_orderdate) AS BIGINT) AS epoch_s,
          day_of_week(o_orderdate) AS dow,
          day_of_year(o_orderdate) AS doy,
          week(o_orderdate) AS wk,
          date_parse(date_format(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS roundtrip
        FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS iso,
          strftime(o_orderdate, '%d/%m/%Y %H:%M') AS eu,
          CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s,
          CAST(isodow(o_orderdate) AS INT) AS dow,
          CAST(dayofyear(o_orderdate) AS INT) AS doy,
          CAST(weekofyear(o_orderdate) AS INT) AS wk,
          strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS roundtrip
        FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey""")),

    // Presto json + array surface through the shim: json_extract_scalar,
    // cardinality, contains, reduce (4-arg form maps to aggregate),
    // any_match/all_match.
    "p03_presto_json_array" -> Q(
      presto("""
        SELECT event_id,
          CAST(json_extract_scalar(props, '$.k') AS INTEGER) AS k,
          contains(sequence(1, 5), 3) AS has3,
          CAST(cardinality(sequence(1, event_id % 5 + 1)) AS INT) AS card,
          reduce(sequence(1, 10), 0, (a, x) -> a + x, a -> a) AS tri,
          any_match(sequence(1, 4), x -> x > 3) AS anym,
          all_match(sequence(1, 4), x -> x > 0) AS allm
        FROM events WHERE event_id < 3000 ORDER BY event_id"""),
      Some("""
        SELECT event_id,
          CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
          list_contains([1,2,3,4,5], 3) AS has3,
          CAST(len(generate_series(1, event_id % 5 + 1)) AS INT) AS card,
          CAST(55 AS INT) AS tri,
          true AS anym, true AS allm
        FROM events WHERE event_id < 3000 ORDER BY event_id""")),

    // Presto math/binary surface: to_base/from_base, truncate, to_hex,
    // bitwise_* names, is_finite/is_nan.
    "p04_presto_math" -> Q(
      presto("""
        SELECT l_orderkey, l_linenumber,
          to_base(l_orderkey, 16) AS hex_key,
          from_base(to_base(l_orderkey, 7), 7) AS roundtrip7,
          truncate(l_extendedprice / 100) AS trunc_h,
          bitwise_and(l_orderkey, 255) AS low8,
          bitwise_xor(l_orderkey, l_partkey) AS bx,
          is_finite(l_extendedprice) AS fin,
          is_nan(l_discount) AS nn
        FROM lineitem WHERE l_orderkey <= 1000
        ORDER BY l_orderkey, l_linenumber"""),
      Some("""
        SELECT l_orderkey, l_linenumber,
          lower(format('{:x}', l_orderkey)) AS hex_key,
          l_orderkey AS roundtrip7,
          CAST(trunc(l_extendedprice / 100) AS DOUBLE) AS trunc_h,
          l_orderkey & 255 AS low8,
          xor(l_orderkey, l_partkey) AS bx,
          isfinite(l_extendedprice) AS fin,
          isnan(l_discount) AS nn
        FROM lineitem WHERE l_orderkey <= 1000
        ORDER BY l_orderkey, l_linenumber""")),

    // Presto aggregate names: arbitrary, geometric_mean, map_agg, checksum
    // (values not SQL-portable for checksum/map ordering → project the
    // portable columns; checksum asserted separately in ScalaTest).
    "p05_presto_aggs" -> Q(
      presto("""
        WITH gm AS (
          SELECT l_returnflag,
            round(geometric_mean(l_quantity), 6) AS gm_qty,
            arbitrary(l_linestatus) AS any_status,
            every(l_quantity > 0) AS all_pos
          FROM lineitem GROUP BY l_returnflag),
        st AS (
          SELECT l_returnflag,
            CAST(cardinality(map_agg(l_linestatus, l_linestatus)) AS INT) AS n_status
          FROM (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem)
          GROUP BY l_returnflag)
        SELECT gm.l_returnflag, gm.gm_qty, gm.all_pos, st.n_status,
          length(gm.any_status) AS status_len
        FROM gm JOIN st ON gm.l_returnflag = st.l_returnflag
        ORDER BY gm.l_returnflag"""),
      Some("""
        SELECT l_returnflag,
          round(exp(avg(ln(l_quantity))), 6) AS gm_qty,
          bool_and(l_quantity > 0) AS all_pos,
          CAST(count(DISTINCT l_linestatus) AS INT) AS n_status,
          CAST(1 AS INT) AS status_len
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Weighted approx_percentile overloads (ApproximateLongPercentile
    // Aggregations.java weightedInput: (value, weight, percentile
    // [, accuracy]) — weight is a repetition count, must be > 0). The
    // registry runs the weighted forms EXACT (Spark `percentile` with its
    // frequency argument; exact satisfies any accuracy bound), so the
    // DuckDB oracle replays the expansion literally: each row repeated
    // `weight` times, then continuous quantiles — same multiset, same
    // interpolation rule.
    "p14_weighted_percentile" -> Q(
      presto("""
        SELECT l_returnflag,
          round(approx_percentile(l_quantity, l_linenumber, 0.5), 6) AS wp50,
          round(approx_percentile(l_quantity, l_linenumber, 0.9), 6) AS wp90,
          round(approx_percentile(l_quantity, l_linenumber, 0.5, 0.01), 6) AS wp50_acc,
          round(approx_percentile(l_extendedprice, l_linenumber, ARRAY[0.25, 0.75])[1], 6) AS wq25
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      Some("""
        WITH expanded AS (
          SELECT l_returnflag, l_quantity, l_extendedprice,
            unnest(range(l_linenumber)) AS r
          FROM lineitem)
        SELECT l_returnflag,
          round(quantile_cont(l_quantity, 0.5), 6) AS wp50,
          round(quantile_cont(l_quantity, 0.9), 6) AS wp90,
          round(quantile_cont(l_quantity, 0.5), 6) AS wp50_acc,
          round(quantile_cont(l_extendedprice, 0.25), 6) AS wq25
        FROM expanded GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // IPADDRESS type surface (SPI/type/IpAddressType.java,
    // MAIN/type/IpAddressOperators.java): varchar/varbinary casts both
    // ways, RFC 5952 canonical rendering (IPv4 stored ::ffff-mapped in 16
    // bytes, uppercase-hex input lowered, longest zero run compressed),
    // bytewise-unsigned comparisons, and the IPADDRESS 'x' typed literal.
    // This DuckDB has no INET extension — the oracle replays the
    // canonical text and the 16-byte hex image closed-form.
    "p15_ipaddress" -> Q(
      presto("""
        WITH ips AS (
          SELECT doc_id,
            '10.' || CAST(doc_id % 200 AS VARCHAR) || '.' ||
              CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
              CAST(doc_id % 256 AS VARCHAR) AS v4,
            '2001:DB8:0:0:0:0:0:' || to_base(doc_id % 65000 + 2, 16) AS v6
          FROM documents)
        SELECT doc_id,
          CAST(CAST(v4 AS IPADDRESS) AS VARCHAR) AS v4_canon,
          CAST(CAST(v6 AS IPADDRESS) AS VARCHAR) AS v6_canon,
          to_hex(CAST(CAST(v4 AS IPADDRESS) AS VARBINARY)) AS v4_hex,
          to_hex(CAST(CAST(v6 AS IPADDRESS) AS VARBINARY)) AS v6_hex,
          CAST('::ffff:' || v4 AS IPADDRESS) = CAST(v4 AS IPADDRESS) AS mapped_eq,
          CAST(v6 AS IPADDRESS) > CAST(v4 AS IPADDRESS) AS v6_gt_v4,
          IPADDRESS '2001:db8::80' < CAST(v6 AS IPADDRESS) AS lit_lt
        FROM ips ORDER BY doc_id"""),
      Some("""
        SELECT doc_id,
          '10.' || CAST(doc_id % 200 AS VARCHAR) || '.' ||
            CAST((doc_id * 7) % 256 AS VARCHAR) || '.' ||
            CAST(doc_id % 256 AS VARCHAR) AS v4_canon,
          '2001:db8::' || lower(to_hex(doc_id % 65000 + 2)) AS v6_canon,
          '00000000000000000000FFFF0A' ||
            upper(lpad(to_hex(doc_id % 200), 2, '0')) ||
            upper(lpad(to_hex((doc_id * 7) % 256), 2, '0')) ||
            upper(lpad(to_hex(doc_id % 256), 2, '0')) AS v4_hex,
          '20010DB8' || repeat('0', 20) ||
            upper(lpad(to_hex(doc_id % 65000 + 2), 4, '0')) AS v6_hex,
          TRUE AS mapped_eq, TRUE AS v6_gt_v4,
          doc_id % 65000 + 2 > 128 AS lit_lt
        FROM documents ORDER BY doc_id""")),

    // HLL sketch family end-to-end (approx_set → merge → cardinality):
    // partial sketches per nation merged to a region rollup — estimate-based
    // (no hash oracle); ScalaTest asserts the relative-error bound.
    "p06_hll_sketch" -> Q(
      presto("""
        WITH per_nation AS (
          SELECT c_nationkey, approx_set(c_custkey) AS cust_set,
                 count(DISTINCT c_custkey) AS exact_n
          FROM customer GROUP BY c_nationkey)
        SELECT
          CAST(sum(exact_n) AS BIGINT) AS exact_total,
          count(*) AS n_nations,
          CAST(cardinality(merge(cust_set)) AS DOUBLE)
            BETWEEN 0.9 * sum(exact_n) AND 1.1 * sum(exact_n) AS approx_ok
        FROM per_nation"""),
      // the sketch estimate is algorithm-specific; the oracle pins the exact
      // distinct total + nation count and the estimate's 10% error bound
      Some("""
        SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_total,
          CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
          true AS approx_ok
        FROM customer""")),

    // Heavy hitters (approx_most_frequent = Misra-Gries summary): per-source
    // top-5 tokens. The fixture vocabulary (31 distinct tokens) fits the
    // 64-counter capacity, so the summary is EXACT — the oracle recomputes
    // the true top-5 (count desc, token asc) and the strings must match
    // byte-for-byte. At corpus scale the same plan ships 64 counters per
    // group through partial/final aggregation, never the token stream.
    "p10_heavy_hitters" -> Q(
      presto("""
        WITH toks AS (
          SELECT source,
            explode(split(trim(regexp_replace(lower(text), '\s+', ' ')), ' ')) AS tok
          FROM documents),
        hh AS (
          SELECT source, approx_most_frequent(5, tok, 64) AS m
          FROM toks GROUP BY source)
        SELECT source,
          array_join(transform(
            array_sort(map_entries(m), (a, b) -> CASE
              WHEN a.value > b.value THEN -1 WHEN a.value < b.value THEN 1
              WHEN a.key < b.key THEN -1 WHEN a.key > b.key THEN 1 ELSE 0 END),
            e -> concat(e.key, ':', CAST(e.value AS STRING))), ',') AS top_tokens
        FROM hh ORDER BY source"""),
      Some("""
        WITH toks AS (
          SELECT source,
            unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS tok
          FROM documents),
        cnt AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok),
        rk AS (SELECT source, tok, c,
          row_number() OVER (PARTITION BY source ORDER BY c DESC, tok) AS rn
          FROM cnt)
        SELECT source,
          string_agg(tok || ':' || c, ',' ORDER BY c DESC, tok) AS top_tokens
        FROM rk WHERE rn <= 5
        GROUP BY source ORDER BY source""")),

    // Color/terminal rendering surface (ColorFunctions.java:35-323):
    // render/bar/color/rgb emit byte-exact ANSI escapes. The oracle replays
    // the encoding closed-form in DuckDB: system colors are fixed ANSI
    // indices, #0f0 → cube index 46, and the default red→green gradient's
    // 8 per-block indices (196,202,214,226,226,154,82,46 — HSB-space lerp)
    // are constants for a fixed width.
    "p11_color_bar" -> Q(
      presto("""
        SELECT n_nationkey,
          render(n_name, color('#0f0')) AS name_green,
          render(n_nationkey % 2 = 0) AS even_mark,
          bar(CAST(n_nationkey AS DOUBLE) / 24, 10,
              rgb(0, 255, 0), rgb(0, 255, 0)) AS greenbar,
          bar(CAST(n_nationkey AS DOUBLE) / 24, 8) AS gradbar,
          rgb(n_nationkey * 10, 0, 255 - n_nationkey * 10) AS rgbv,
          color('red') AS sys_red
        FROM nation ORDER BY n_nationkey"""),
      Some("""
        WITH g AS (
          SELECT n_nationkey, n_name,
            CAST(floor(n_nationkey / 24.0 * 10) AS INT) AS c10,
            CAST(floor(n_nationkey / 24.0 * 8) AS INT) AS c8,
            [chr(27)||'[38;5;196m'||chr(9608), chr(27)||'[38;5;202m'||chr(9608),
             chr(27)||'[38;5;214m'||chr(9608), chr(27)||'[38;5;226m'||chr(9608),
             chr(27)||'[38;5;226m'||chr(9608), chr(27)||'[38;5;154m'||chr(9608),
             chr(27)||'[38;5;82m'||chr(9608), chr(27)||'[38;5;46m'||chr(9608)]
              AS blocks
          FROM nation)
        SELECT n_nationkey,
          chr(27)||'[38;5;46m'||n_name||chr(27)||'[0m' AS name_green,
          CASE WHEN n_nationkey % 2 = 0
            THEN chr(27)||'[38;5;2m'||chr(10003)||chr(27)||'[0m'
            ELSE chr(27)||'[38;5;1m'||chr(10007)||chr(27)||'[0m'
          END AS even_mark,
          repeat(chr(27)||'[38;5;46m'||chr(9608), c10)||chr(27)||'[0m'||
            repeat(' ', 10 - c10) AS greenbar,
          coalesce(array_to_string(blocks[1:c8], ''), '')||chr(27)||'[0m'||
            repeat(' ', 8 - c8) AS gradbar,
          CAST(n_nationkey * 10 * 65536 + (255 - n_nationkey * 10) AS BIGINT)
            AS rgbv,
          CAST(-2 AS BIGINT) AS sys_red
        FROM g ORDER BY n_nationkey""")),

    // SetDigest surface (type/setdigest/SetDigestFunctions.java): in exact
    // mode (< 8192 distinct hashes) cardinality, intersections, and the
    // hash-count map size are hash-independent — DuckDB replays them as
    // plain distinct counts. Partial digests merge through merge_set_digest
    // (the sketch shuffles through partial/final aggregation).
    "p13_setdigest" -> Q(
      presto("""
        WITH a AS (SELECT make_set_digest(c_custkey) d FROM customer
                   WHERE c_custkey % 3 = 0),
             b AS (SELECT make_set_digest(c_custkey) d FROM customer
                   WHERE c_custkey % 2 = 0),
             m AS (SELECT c_nationkey, make_set_digest(c_custkey) d
                   FROM customer WHERE c_custkey < 5000 GROUP BY c_nationkey)
        SELECT cardinality(a.d) AS card_a, cardinality(b.d) AS card_b,
          intersection_cardinality(a.d, b.d) AS inter,
          (SELECT cardinality(merge_set_digest(d)) FROM m) AS merged_card,
          CAST(cardinality(hash_counts(a.d)) AS BIGINT) AS n_hashes
        FROM a, b"""),
      Some("""
        SELECT
          (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_custkey % 3 = 0) AS card_a,
          (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_custkey % 2 = 0) AS card_b,
          (SELECT count(DISTINCT c_custkey) FROM customer
           WHERE c_custkey % 3 = 0 AND c_custkey % 2 = 0) AS inter,
          (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_custkey < 5000) AS merged_card,
          (SELECT count(DISTINCT c_custkey) FROM customer WHERE c_custkey % 3 = 0) AS n_hashes""")),

    // Bing tile family (presto-geospatial/BingTileFunctions.java): tiles
    // are packed BIGINTs, so the tile id itself is the shuffle key — the
    // groupBy below is a plain long hash-aggregate (the 100 TB posture for
    // tile-bucketed spatial rollups). DuckDB replays the web-mercator
    // math closed-form and the quadkey via bit arithmetic.
    "p14_bing_tiles" -> Q(
      presto("""
        WITH pts AS (
          SELECT c_custkey,
            CAST((c_custkey % 169) - 84 AS DOUBLE) + 0.5 AS lat,
            CAST((c_custkey % 360) - 180 AS DOUBLE) + 0.25 AS lon
          FROM customer WHERE c_custkey <= 2000),
        tiled AS (
          SELECT c_custkey, lat, lon, bing_tile_at(lat, lon, 8) AS tile FROM pts)
        SELECT tile,
          bing_tile_quadkey(tile) AS quadkey,
          CAST(bing_tile_zoom_level(tile) AS INTEGER) AS zoom,
          bing_tile_coordinates(tile).x AS tx,
          bing_tile_coordinates(tile).y AS ty,
          CAST(count(*) AS BIGINT) AS n_pts,
          round(min(great_circle_distance(lat, lon, 0.0, 0.0)), 6) AS min_gcd
        FROM tiled
        GROUP BY tile ORDER BY tile"""),
      Some("""
        WITH pts AS (
          SELECT c_custkey,
            CAST((c_custkey % 169) - 84 AS DOUBLE) + 0.5 AS lat,
            CAST((c_custkey % 360) - 180 AS DOUBLE) + 0.25 AS lon
          FROM customer WHERE c_custkey <= 2000),
        t AS (
          SELECT c_custkey, lat, lon,
            CAST(floor(least(greatest((lon + 180) / 360 * 65536.0, 0), 65535)) AS BIGINT) // 256 AS tx,
            CAST(floor(least(greatest(
              (0.5 - ln((1 + sin(lat * pi() / 180)) / (1 - sin(lat * pi() / 180))) / (4 * pi())) * 65536.0,
              0), 65535)) AS BIGINT) // 256 AS ty
          FROM pts),
        e AS (
          SELECT c_custkey, lat, lon, tx, ty,
            tx * 268435456 + ty * 32 + 8 AS tile
          FROM t)
        SELECT tile,
          list_aggregate(list_transform(range(8, 0, -1),
            i -> CAST(((tx >> (i - 1)) & 1) + 2 * ((ty >> (i - 1)) & 1) AS VARCHAR)),
            'string_agg', '') AS quadkey,
          8 AS zoom,
          CAST(tx AS INTEGER) AS tx, CAST(ty AS INTEGER) AS ty,
          CAST(count(*) AS BIGINT) AS n_pts,
          round(min(atan2(
            sqrt(pow(sin(radians(lon)), 2) +
                 pow(sin(radians(lat)) * cos(radians(lon)), 2)),
            cos(radians(lat)) * cos(radians(lon))) * 6371.01), 6) AS min_gcd
        FROM e
        GROUP BY tile, tx, ty ORDER BY tile""")),

    // ML surface (presto-ml): per-group learn_regressor → regress, the
    // model-as-aggregation-result dataflow. The Gram-sketch normal
    // equations for ONE feature are exactly the textbook slope/intercept,
    // so DuckDB's regr_slope/regr_intercept replay the whole pipeline.
    "p12_ml_regression" -> Q(
      presto("""
        WITH m AS (
          SELECT l_returnflag,
            learn_regressor(CAST(l_extendedprice AS DOUBLE),
              features(CAST(l_quantity AS DOUBLE))) AS model
          FROM lineitem GROUP BY l_returnflag)
        SELECT l_returnflag,
          round(regress(features(10.0), model), 2) AS pred10,
          round(regress(features(30.0), model), 2) AS pred30
        FROM m ORDER BY l_returnflag"""),
      Some("""
        WITH pts AS (
          SELECT l_returnflag, CAST(l_quantity AS DOUBLE) AS x,
            CAST(l_extendedprice AS DOUBLE) AS y
          FROM lineitem)
        SELECT l_returnflag,
          round(regr_intercept(y, x) + regr_slope(y, x) * 10.0, 2) AS pred10,
          round(regr_intercept(y, x) + regr_slope(y, x) * 30.0, 2) AS pred30
        FROM pts GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Native codegen'd cosine_similarity expression (CosineSimilarity
    // doGenCode) — same semantics as the HOF-based s01, checked vs DuckDB.
    "p07_cosine_native" -> Q(
      (s, d) => {
        val e = Engine.cached(s, d)
        e.sql("""
          SELECT a.vec_id,
            round(cosine_similarity(a.embedding, q.embedding), 6) AS cos_sim
          FROM embeddings a CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 1) q
          WHERE a.vec_id <> 1
          ORDER BY cos_sim DESC, a.vec_id LIMIT 15""")
      },
      Some("""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1)
        SELECT vec_id,
          round(
            list_sum(list_transform(range(1, len(embedding) + 1),
              i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE))) /
            (sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) *
             sqrt(list_sum(list_transform(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6)
            AS cos_sim
        FROM embeddings, q WHERE vec_id <> 1
        ORDER BY cos_sim DESC, vec_id LIMIT 15""")),

    // URL function surface (UrlFunctions.java:38-193): extract components of
    // synthesized URLs; encode/decode as a round-trip check (DuckDB has no
    // url_encode — oracle pins the round-trip to true).
    "p08_url_fns" -> Q(
      presto("""
        WITH u AS (
          SELECT doc_id,
            concat('https://h', CAST(doc_id % 5 AS STRING), '.example.com',
              CASE WHEN doc_id % 3 = 0 THEN concat(':', CAST(8000 + doc_id % 7 AS STRING)) ELSE '' END,
              '/docs/', source, '?id=', CAST(doc_id AS STRING), '&lang=', lang,
              '#sec', CAST(doc_id % 4 AS STRING)) AS url,
            source, lang
          FROM documents)
        SELECT doc_id,
          url_extract_protocol(url) AS proto,
          url_extract_host(url) AS host,
          url_extract_port(url) AS port,
          url_extract_path(url) AS path,
          url_extract_query(url) AS query,
          url_extract_fragment(url) AS frag,
          url_extract_parameter(url, 'lang') AS lang_param,
          url_decode(url_encode(concat(source, ' +/', lang))) =
            concat(source, ' +/', lang) AS enc_roundtrip
        FROM u ORDER BY doc_id"""),
      Some("""
        WITH u AS (
          SELECT doc_id,
            concat('https://h', CAST(doc_id % 5 AS VARCHAR), '.example.com',
              CASE WHEN doc_id % 3 = 0 THEN concat(':', CAST(8000 + doc_id % 7 AS VARCHAR)) ELSE '' END,
              '/docs/', source, '?id=', CAST(doc_id AS VARCHAR), '&lang=', lang,
              '#sec', CAST(doc_id % 4 AS VARCHAR)) AS url
          FROM documents)
        SELECT doc_id,
          regexp_extract(url, '^([a-z][a-z0-9+.-]*):', 1) AS proto,
          regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
          CAST(nullif(regexp_extract(url, '^[a-z]+://[^/:?#]+:([0-9]+)', 1), '') AS BIGINT) AS port,
          regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
          regexp_extract(url, '\?([^#]*)', 1) AS query,
          regexp_extract(url, '#(.*)$', 1) AS frag,
          regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
          true AS enc_roundtrip
        FROM u ORDER BY doc_id""")),

    // Semantics-audit: the divergences fixed in the compat layer (arg
    // orders, zero-start substr, null-on-out-of-range split_part,
    // null-propagating greatest, type-aware to_iso8601, 2-arg bit_count,
    // object-aware json_size) hash-checked through the oracle.
    "p09_semantics_audit" -> Q(
      presto("""
        SELECT o_orderkey,
          round(log(CAST(o_orderkey AS DOUBLE) + 8, 2), 9) AS log2v,
          ltrim(concat('xx', o_orderstatus, 'x'), 'x') AS lt,
          rtrim(concat('x', o_orderstatus, 'xx'), 'x') AS rt,
          substr(o_orderpriority, 0) AS s0,
          substr(o_orderpriority, 3) AS s3,
          split_part(o_orderpriority, '-', 2) AS sp2,
          split_part(o_orderpriority, '-', 9) AS sp_oor,
          greatest(o_orderkey, CAST(NULL AS BIGINT)) AS g_null,
          least(o_orderkey, o_custkey) AS l_ok,
          to_iso8601(CAST(o_orderdate AS DATE)) AS iso_d,
          bit_count(o_orderkey, 64) AS bc,
          CAST(json_size('{"a": {"x":1,"y":2}}', '$.a') AS INT) AS js
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey"""),
      Some("""
        SELECT o_orderkey,
          round(log(2, CAST(o_orderkey AS DOUBLE) + 8), 9) AS log2v,
          ltrim(concat('xx', o_orderstatus, 'x'), 'x') AS lt,
          rtrim(concat('x', o_orderstatus, 'xx'), 'x') AS rt,
          '' AS s0,
          substr(o_orderpriority, 3) AS s3,
          string_split(o_orderpriority, '-')[2] AS sp2,
          CAST(NULL AS VARCHAR) AS sp_oor,
          CAST(NULL AS BIGINT) AS g_null,
          least(o_orderkey, o_custkey) AS l_ok,
          strftime(o_orderdate, '%Y-%m-%d') AS iso_d,
          CAST(bit_count(o_orderkey) AS BIGINT) AS bc,
          2 AS js
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey"""))
  )
}
