package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar function library parity (SURVEY §2.9).
  *
  * Reference: presto-main operator/scalar/ — StringFunctions.java:67-840,
  * MathFunctions.java, DateTimeFunctions.java, JsonFunctions.java,
  * JoniRegexpFunctions.java, VarbinaryFunctions.java, BitwiseFunctions.java,
  * ArrayFunctions.java + Array*.java, higher-order lambdas
  * (ArrayTransformFunction.java …). Each suite evaluates a batch of functions
  * over fixture rows; all are Catalyst built-ins (whole-stage codegen'd — no
  * UDFs in any hot path).
  */
object Scalars {
  private def t(s: SparkSession, d: String, n: String) = Tables.t(s, d, n)

  import org.apache.spark.sql.Column
  /** "1,2,3" — matches DuckDB array_to_string(list, ','). Array cells can't
    * survive the driver's pandas row-sort, so array results dump as strings. */
  private def joinedInts(c: Column): Column =
    array_join(transform(c, x => x.cast("string")), ",")

  val queries: Map[String, Q] = Map(

    // String functions (StringFunctions.java:67-840).
    "q70_string_fns" -> Q(
      (s, d) => t(s, d, "documents")
        .select(
          col("doc_id"),
          length(col("text")).as("len"),
          upper(substring(col("text"), 1, 12)).as("head_up"),
          lower(col("source")).as("src_lo"),
          trim(substring(col("text"), 5, 10)).as("trimmed"),
          lpad(col("lang"), 5, "_").as("lang_pad"),
          rpad(col("lang"), 4, "*").as("lang_rpad"),
          reverse(col("lang")).as("lang_rev"),
          regexp_replace(col("source"), "src", "s").as("src_short"),
          concat_ws("|", col("lang"), col("source")).as("tag"),
          split_part(col("text"), lit(" "), lit(2)).as("word2"),
          instr(col("text"), "data").cast("long").as("pos_data"),
          substring_index(col("text"), " ", 3).as("first3"),
          repeat(col("lang"), 2).as("lang2"),
          translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
          levenshtein(col("lang"), lit("en")).as("lev_en"),
          ascii(col("lang")).cast("int").as("lang_ascii"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          length(text) AS len,
          upper(substr(text, 1, 12)) AS head_up,
          lower(source) AS src_lo,
          trim(substr(text, 5, 10)) AS trimmed,
          lpad(lang, 5, '_') AS lang_pad,
          rpad(lang, 4, '*') AS lang_rpad,
          reverse(lang) AS lang_rev,
          replace(source, 'src', 's') AS src_short,
          concat_ws('|', lang, source) AS tag,
          split_part(text, ' ', 2) AS word2,
          CAST(strpos(text, 'data') AS BIGINT) AS pos_data,
          array_to_string((string_split(text, ' '))[1:3], ' ') AS first3,
          repeat(lang, 2) AS lang2,
          translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
          levenshtein(lang, 'en') AS lev_en,
          CAST(ascii(lang) AS INT) AS lang_ascii
        FROM documents ORDER BY doc_id""")),

    // Math functions (MathFunctions.java — 98 fns).
    "q71_math_fns" -> Q(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 2000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("abs_c"),
          ceil(col("l_extendedprice") / 1000).cast("long").as("ceil_k"),
          floor(col("l_extendedprice") / 1000).cast("long").as("floor_k"),
          round(col("l_extendedprice") / 7, 2).as("div7"),
          round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
          round(sqrt(col("l_extendedprice")), 6).as("sqrt_p"),
          round(exp(col("l_discount")), 8).as("exp_d"),
          round(log(col("l_extendedprice")), 8).as("ln_p"),
          round(log10(col("l_extendedprice")), 8).as("log10_p"),
          round(log2(col("l_quantity")), 8).as("log2_q"),
          signum(col("l_quantity") - 25).cast("double").as("sign_c"),
          (col("l_orderkey") % 7).cast("long").as("mod7"),
          round(cbrt(col("l_extendedprice")), 6).as("cbrt_p"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_tax"), col("l_discount")).as("ls"),
          round(sin(col("l_quantity")), 9).as("sin_q"),
          round(cos(col("l_quantity")), 9).as("cos_q"),
          round(atan(col("l_discount")), 9).as("atan_d"),
          round(degrees(col("l_discount")), 6).as("deg_d"),
          round(radians(col("l_quantity")), 6).as("rad_q"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
          abs(l_quantity - 25) AS abs_c,
          CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_k,
          CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
          round(l_extendedprice / 7, 2) AS div7,
          round(pow(l_quantity, 2), 4) AS qty_sq,
          round(sqrt(l_extendedprice), 6) AS sqrt_p,
          round(exp(l_discount), 8) AS exp_d,
          round(ln(l_extendedprice), 8) AS ln_p,
          round(log10(l_extendedprice), 8) AS log10_p,
          round(log2(l_quantity), 8) AS log2_q,
          CAST(sign(l_quantity - 25) AS DOUBLE) AS sign_c,
          CAST(l_orderkey % 7 AS BIGINT) AS mod7,
          round(cbrt(l_extendedprice), 6) AS cbrt_p,
          greatest(l_quantity, l_discount * 100) AS gr,
          least(l_tax, l_discount) AS ls,
          round(sin(l_quantity), 9) AS sin_q,
          round(cos(l_quantity), 9) AS cos_q,
          round(atan(l_discount), 9) AS atan_d,
          round(degrees(l_discount), 6) AS deg_d,
          round(radians(l_quantity), 6) AS rad_q
        FROM lineitem WHERE l_orderkey <= 2000
        ORDER BY l_orderkey, l_linenumber""")),

    // Date/time functions (DateTimeFunctions.java — 87 fns).
    // weekday()+1 == DuckDB isodow; dayofweek dialects differ, so the shared
    // ISO numbering is the compared surface.
    "q72_datetime_fns" -> Q(
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") <= 3000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          dayofyear(col("o_orderdate")).as("doy"),
          (weekday(col("o_orderdate")) + 1).as("isodow"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_trunc("week", col("o_orderdate")).as("week_start"),
          last_day(col("o_orderdate")).as("month_end"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_2002"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("iso"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          CAST(year(o_orderdate) AS INT) AS y,
          CAST(quarter(o_orderdate) AS INT) AS q,
          CAST(month(o_orderdate) AS INT) AS m,
          CAST(day(o_orderdate) AS INT) AS dom,
          CAST(dayofyear(o_orderdate) AS INT) AS doy,
          CAST(isodow(o_orderdate) AS INT) AS isodow,
          date_trunc('month', o_orderdate) AS month_start,
          date_trunc('week', o_orderdate) AS week_start,
          CAST(last_day(o_orderdate) AS DATE) AS month_end,
          CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
          CAST(o_orderdate + INTERVAL 2 MONTH AS DATE) AS plus2m,
          date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
          CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
          strftime(o_orderdate, '%Y-%m-%d') AS iso
        FROM orders WHERE o_orderkey <= 3000 ORDER BY o_orderkey""")),

    // Time-of-day extraction on the events table.
    "q73_time_fns" -> Q(
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          hour(col("ts")).as("h"),
          minute(col("ts")).as("mi"),
          second(col("ts")).as("sec"),
          date_trunc("hour", col("ts")).as("ts_hour"),
          date_trunc("day", col("ts")).as("ts_day"),
          col("ts").cast("date").as("dt"))
        .orderBy("event_id"),
      Some("""
        SELECT event_id,
          CAST(hour(ts) AS INT) AS h,
          CAST(minute(ts) AS INT) AS mi,
          CAST(second(ts) AS INT) AS sec,
          date_trunc('hour', ts) AS ts_hour,
          date_trunc('day', ts) AS ts_day,
          CAST(ts AS DATE) AS dt
        FROM events ORDER BY event_id""")),

    // JSON functions (JsonFunctions.java — json_extract/_scalar ≈
    // get_json_object; json casts ≈ from_json).
    "q74_json_fns" -> Q(
      (s, d) => t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("int").as("k_int"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("k",
              org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_typed"),
          (get_json_object(col("props"), "$.missing").isNull).as("missing_null"))
        .orderBy("event_id"),
      Some("""
        SELECT event_id,
          json_extract_string(props, '$.k') AS k_str,
          CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
          CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
          json_extract_string(props, '$.missing') IS NULL AS missing_null
        FROM events ORDER BY event_id""")),

    // JSON as a first-class typed value: Presto's `json` type (SURVEY §1.3)
    // on the modern mapping — Spark 4 VariantType. Parse once
    // (parse_json), typed extraction (variant_get), error-as-null
    // (try_parse_json on non-JSON input). The oracle uses DuckDB's native
    // JSON type for the same parse-once/extract-typed shape.
    "q82_json_variant" -> Q(
      (s, d) => t(s, d, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
          expr("variant_get(parse_json(props), '$.missing', 'string')").as("miss"),
          expr("try_parse_json(event_type)").as("bare"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("k")).cast("long").as("sum_k"),
          min(col("k")).cast("long").as("min_k"),
          count(col("miss")).cast("long").as("n_missing"),
          count(col("bare")).cast("long").as("n_bare_json"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
          CAST(min(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
          CAST(count(props->>'$.missing') AS BIGINT) AS n_missing,
          CAST(count(TRY_CAST(event_type AS JSON)) AS BIGINT) AS n_bare_json
        FROM events GROUP BY event_type ORDER BY event_type""")),

    // Regex functions (JoniRegexpFunctions.java — Java regex ≈ Joni on this
    // conservative subset; DuckDB is RE2, so patterns avoid dialect corners).
    "q75_regex_fns" -> Q(
      (s, d) => t(s, d, "documents")
        .select(
          col("doc_id"),
          regexp_extract(col("source"), "([0-9]+)", 1).as("src_num"),
          regexp_replace(col("text"), "[aeiou]", "").as("no_vowels"),
          col("text").rlike("data").as("has_data"),
          size(expr("regexp_extract_all(text, 'the', 0)")).as("n_the"),
          size(split(col("text"), "[0-9]+")).as("n_numsplit"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          regexp_extract(source, '([0-9]+)', 1) AS src_num,
          regexp_replace(text, '[aeiou]', '', 'g') AS no_vowels,
          regexp_matches(text, 'data') AS has_data,
          CAST(len(regexp_extract_all(text, 'the')) AS INT) AS n_the,
          CAST(len(string_split_regex(text, '[0-9]+')) AS INT) AS n_numsplit
        FROM documents ORDER BY doc_id""")),

    // Binary/hash functions (VarbinaryFunctions.java — md5/sha/base64/hex).
    "q76_hash_fns" -> Q(
      (s, d) => t(s, d, "documents").filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          md5(col("text").cast("binary")).as("md5_hex"),
          sha2(col("text").cast("binary"), 256).as("sha256_hex"),
          base64(col("lang").cast("binary")).as("lang_b64"),
          hex(col("lang").cast("binary")).as("lang_hex"),
          length(col("text").cast("binary")).as("n_bytes"))
        .orderBy("doc_id"),
      Some("""
        SELECT doc_id,
          md5(text) AS md5_hex,
          lower(sha256(text)) AS sha256_hex,
          to_base64(CAST(lang AS BLOB)) AS lang_b64,
          upper(hex(lang)) AS lang_hex,
          CAST(octet_length(CAST(text AS BLOB)) AS INT) AS n_bytes
        FROM documents WHERE doc_id < 100 ORDER BY doc_id""")),

    // Bitwise functions (BitwiseFunctions.java).
    "q77_bitwise_fns" -> Q(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_orderkey").bitwiseAND(col("l_partkey"))).as("band"),
          (col("l_orderkey").bitwiseOR(col("l_partkey"))).as("bor"),
          (col("l_orderkey").bitwiseXOR(col("l_partkey"))).as("bxor"),
          shiftleft(col("l_linenumber"), 3).cast("long").as("shl"),
          shiftright(col("l_orderkey"), 2).as("shr"),
          bit_count(col("l_orderkey")).cast("int").as("popcnt"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        SELECT l_orderkey, l_linenumber,
          l_orderkey & l_partkey AS band,
          l_orderkey | l_partkey AS bor,
          xor(l_orderkey, l_partkey) AS bxor,
          CAST(l_linenumber << 3 AS BIGINT) AS shl,
          l_orderkey >> 2 AS shr,
          CAST(bit_count(l_orderkey) AS INT) AS popcnt
        FROM lineitem WHERE l_orderkey <= 1000
        ORDER BY l_orderkey, l_linenumber""")),

    // Conditional expressions: CASE/coalesce/nullif/if (Presto desugars
    // try/if in analysis; Spark evaluates them natively).
    "q78_conditional_fns" -> Q(
      (s, d) => t(s, d, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000, "high")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("low").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_x"),
          (col("o_totalprice") / nullif(col("o_custkey").cast("double"), lit(0.0)))
            .cast("double").as("per_cust"),
          expr("if(o_orderpriority = '1-URGENT', 1, 0)").cast("int").as("is_urgent"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          CASE WHEN o_totalprice > 300000 THEN 'high'
               WHEN o_totalprice > 100000 THEN 'mid'
               ELSE 'low' END AS bucket,
          coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_x,
          CAST(o_totalprice / nullif(CAST(o_custkey AS DOUBLE), 0.0) AS DOUBLE) AS per_cust,
          CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS INT) AS is_urgent
        FROM orders ORDER BY o_orderkey""")),

    // Array functions (ArrayFunctions.java + Array*.java) over generated int
    // arrays (exact arithmetic — no float ambiguity).
    "q79_array_fns" -> Q(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          sequence(lit(1), col("l_linenumber")).as("seq"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          size(col("seq")).as("card"),
          element_at(col("seq"), 1).as("first_el"),
          array_contains(col("seq"), 3).as("has3"),
          array_position(col("seq"), 2).cast("int").as("pos2"),
          // array results joined to scalar strings — the driver's row-sort
          // cannot handle array cells (pandas lexsort → unhashable ndarray)
          joinedInts(reverse(col("seq"))).as("rev"),
          joinedInts(slice(col("seq"), 1, 2)).as("first2"),
          array_max(col("seq")).as("mx"),
          array_min(col("seq")).as("mn"),
          array_join(transform(col("seq"), x => x.cast("string")), ",").as("joined"),
          joinedInts(sort_array(array_distinct(concat(col("seq"), col("seq"))))).as("dedup"),
          joinedInts(sort_array(array_union(col("seq"), array(lit(9), lit(10))))).as("uni"),
          joinedInts(sort_array(array_intersect(col("seq"), array(lit(2), lit(3), lit(99))))).as("inter"),
          joinedInts(array_remove(col("seq"), 1)).as("no1"),
          joinedInts(flatten(array(col("seq"), array(lit(0))))).as("flat"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        WITH base AS (
          SELECT l_orderkey, l_linenumber,
            CAST(generate_series(1, l_linenumber) AS INT[]) AS seq
          FROM lineitem WHERE l_orderkey <= 500)
        SELECT l_orderkey, l_linenumber,
          CAST(len(seq) AS INT) AS card,
          seq[1] AS first_el,
          list_contains(seq, 3) AS has3,
          CAST(coalesce(list_position(seq, 2), 0) AS INT) AS pos2,
          array_to_string(list_reverse(seq), ',') AS rev,
          array_to_string(seq[1:2], ',') AS first2,
          list_max(seq) AS mx,
          list_min(seq) AS mn,
          array_to_string(seq, ',') AS joined,
          array_to_string(list_sort(list_distinct(list_concat(seq, seq))), ',') AS dedup,
          array_to_string(list_sort(list_distinct(list_concat(seq, [9, 10]))), ',') AS uni,
          coalesce(array_to_string(list_sort(list_intersect(seq, [2, 3, 99])), ','), '') AS inter,
          coalesce(array_to_string(list_filter(seq, x -> x <> 1), ','), '') AS no1,
          array_to_string(list_concat(seq, [0]), ',') AS flat
        FROM base ORDER BY l_orderkey, l_linenumber""")),

    // Higher-order lambdas (ArrayTransformFunction.java, ArrayFilterFunction
    // .java, ArrayReduceFunction.java, ZipFunction.java).
    "q80_lambda_fns" -> Q(
      (s, d) => t(s, d, "lineitem").filter(col("l_orderkey") <= 500)
        .select(col("l_orderkey"), col("l_linenumber"),
          sequence(lit(1), col("l_linenumber") + 2).as("seq"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          joinedInts(transform(col("seq"), x => x * x)).as("squares"),
          joinedInts(filter(col("seq"), x => x % 2 === 0)).as("evens"),
          aggregate(col("seq"), lit(0), (acc, x) => acc + x).as("total"),
          exists(col("seq"), x => x > 4).as("any_gt4"),
          forall(col("seq"), x => x > 0).as("all_pos"),
          joinedInts(zip_with(col("seq"), reverse(col("seq")), (a, b) => a * b)).as("zipped"),
          joinedInts(transform(col("seq"), (x, i) => x + i)).as("plus_idx"))
        .orderBy("l_orderkey", "l_linenumber"),
      Some("""
        WITH base AS (
          SELECT l_orderkey, l_linenumber,
            CAST(generate_series(1, l_linenumber + 2) AS INT[]) AS seq
          FROM lineitem WHERE l_orderkey <= 500)
        SELECT l_orderkey, l_linenumber,
          array_to_string(list_transform(seq, x -> x * x), ',') AS squares,
          array_to_string(list_filter(seq, x -> x % 2 = 0), ',') AS evens,
          CAST(list_sum(seq) AS INT) AS total,
          len(list_filter(seq, x -> x > 4)) > 0 AS any_gt4,
          len(list_filter(seq, x -> x <= 0)) = 0 AS all_pos,
          array_to_string(list_transform(range(1, len(seq) + 1),
            i -> seq[i] * seq[len(seq) - i + 1]), ',') AS zipped,
          array_to_string(list_transform(range(1, len(seq) + 1), i -> seq[i] + i - 1), ',') AS plus_idx
        FROM base ORDER BY l_orderkey, l_linenumber""")),

    // Map functions (MapConstructor.java, MapKeys/MapValues/MapConcat…).
    // Compared via sorted entry strings (map key order is engine-specific).
    "q81_map_fns" -> Q(
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") <= 500)
        .select(col("o_orderkey"),
          map(lit("status"), col("o_orderstatus"),
              lit("prio"), col("o_orderpriority")).as("m"))
        .select(
          col("o_orderkey"),
          size(col("m")).as("card"),
          element_at(col("m"), "status").as("status"),
          array_join(sort_array(map_keys(col("m"))), ",").as("keys_sorted"),
          array_join(sort_array(map_values(col("m"))), ",").as("vals_sorted"))
        .orderBy("o_orderkey"),
      Some("""
        SELECT o_orderkey,
          CAST(2 AS INT) AS card,
          o_orderstatus AS status,
          'prio,status' AS keys_sorted,
          array_to_string(list_sort([o_orderstatus, o_orderpriority]), ',') AS vals_sorted
        FROM orders WHERE o_orderkey <= 500 ORDER BY o_orderkey"""))
  )
}
