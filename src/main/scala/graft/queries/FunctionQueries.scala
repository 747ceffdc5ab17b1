package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables.table

/** Scalar-function surface (SURVEY.md §2.7 F1–F14): strings, regex,
  * JSON, dates, math, arrays, maps, explode. All column expressions
  * (codegen'd) — no UDFs, mirroring the engine rule that built-in
  * functions beat closures in the hot path.
  */
object FunctionQueries extends QueryPack {

  def defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1-F4: concat_ws / case / trim / length / substring.
    "q16_string_funcs" -> ((s, dir) => {
      table(s, dir, "customer")
        .filter(col("c_custkey") <= 200)
        .select(
          col("c_custkey"),
          lower(col("c_name")).as("lname"),
          upper(col("c_mktsegment")).as("useg"),
          length(col("c_name")).as("name_len"),
          substring(col("c_name"), 1, 4).as("name4"),
          concat_ws("_", col("c_mktsegment"), col("c_name")).as("seg_name"),
          trim(concat(lit("  "), col("c_mktsegment"), lit(" "))).as("trimmed"))
        .orderBy(col("c_custkey"))
    }),

    // F2/F4: split + element access + size (ref ReadPushData.scala:20
    // delimited projection pattern).
    "q17_split_array" -> ((s, dir) => {
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          split(col("p_name"), " ").as("words"))
        .select(
          col("p_partkey"),
          size(col("words")).as("n_words"),
          element_at(col("words"), 1).as("first_word"),
          element_at(col("words"), -1).as("last_word"),
          concat_ws("-", col("words")).as("joined"))
        .orderBy(col("p_partkey"))
    }),

    // F5: regex replace (global) + extract.
    "q18_regex" -> ((s, dir) => {
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("consonants"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_token"),
          regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_tail"))
        .orderBy(col("p_partkey"))
    }),

    // F11: date/time kernels (ref YoutubeTimeStat.scala:23-43 epoch
    // formatting → native functions, no SimpleDateFormat UDF).
    "q19_dates" -> ((s, dir) => {
      table(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(date_trunc("week", col("o_orderdate"))).as("n_weeks"),
          min(date_format(col("o_orderdate"), "yyyy-MM-dd")).as("first_day"))
        .orderBy(col("yr"), col("mo"))
    }),

    // F12: math kernels; transcendentals rounded on both sides.
    "q20_math" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") <= 1000)
        .select(
          col("l_orderkey"),
          col("l_linenumber"),
          round(log(col("l_quantity") + 1.0), 4).as("log_qty"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(pow(col("l_discount"), 2.0), 6).as("disc_sq"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          floor(col("l_extendedprice")).as("price_floor"),
          ceil(col("l_tax") * 100).as("tax_pct"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // F6: JSON path extraction (ref ReadPushClickData.scala:41
    // get_json_object) — Spark side uses the real JSON function; the
    // oracle derives the same value with a regex, keeping the check
    // engine-independent.
    "q21_json" -> ((s, dir) => {
      table(s, dir, "events")
        .select(get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("value"))
        .groupBy((col("k") % 10).as("k_bucket"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 4).as("avg_value"))
        .orderBy(col("k_bucket"))
    }),

    // VariantType (Spark 4's binary semi-structured encoding): parse
    // once into variant, extract typed paths — the scale path past
    // re-parsing JSON strings per access (F6's get_json_object twin
    // in the modern engine). The nested document is constructed
    // deterministically from events.props so the oracle can verify
    // the extraction without any JSON machinery of its own.
    "q114_variant_json" -> ((s, dir) => {
      val j = concat(lit("{\"meta\": "), col("props"),
        lit(", \"type\": \""), col("event_type"), lit("\"}"))
      table(s, dir, "events")
        .select(parse_json(j).as("v"))
        .select(
          expr("variant_get(v, '$.type', 'string')").as("etype"),
          (expr("variant_get(v, '$.meta.k', 'int')") % 10).as("k_bucket"))
        .groupBy(col("etype"), col("k_bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("etype"), col("k_bucket"))
    }),

    // U2-U4: array set algebra (ref ReadAppPortrait.scala:66-89 UDFs
    // → native array_intersect/except/union).
    "q22_array_ops" -> ((s, dir) => {
      val dict = array(lit("red"), lit("blue"), lit("small"), lit("big"))
      table(s, dir, "part")
        .select(col("p_partkey"), split(col("p_name"), " ").as("words"))
        .select(
          col("p_partkey"),
          concat_ws(",", array_sort(array_intersect(col("words"), dict)))
            .as("in_dict"),
          concat_ws(",", array_sort(array_except(col("words"), dict)))
            .as("not_in_dict"),
          concat_ws(",", array_sort(array_union(col("words"), dict)))
            .as("unioned"))
        .orderBy(col("p_partkey"))
    }),

    // F10: map build + access (ref PrepData.scala:194, ReadAppPortrait
    // .scala:30-34 k:v parsing). The oracle derives the same values
    // without map types, so this checks Spark's map kernel against an
    // independent computation.
    "q23_map_ops" -> ((s, dir) => {
      table(s, dir, "customer")
        .filter(col("c_custkey") <= 100)
        .withColumn("kv", concat(
          lit("seg:"), col("c_mktsegment"),
          lit(",nation:"), col("c_nationkey").cast("string")))
        .select(
          col("c_custkey"),
          str_to_map(col("kv"), lit(","), lit(":")).as("m"))
        .select(
          col("c_custkey"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
          element_at(col("m"), "seg").as("seg"),
          element_at(col("m"), "nation").cast("int").as("nation"))
        .orderBy(col("c_custkey"))
    }),

    // F9: posexplode (UDTF-shaped row expansion, SURVEY §2.10).
    "q24_posexplode" -> ((s, dir) => {
      table(s, dir, "part")
        .filter(col("p_partkey") <= 300)
        .select(col("p_partkey"),
          posexplode(split(col("p_name"), " ")).as(Seq("pos0", "word")))
        .select(col("p_partkey"), (col("pos0") + 1).as("pos"), col("word"))
        .orderBy(col("p_partkey"), col("pos"))
    }),

    // Pivot (dynamic column fan-out; SQL oracle via CASE sums).
    "q25_pivot" -> ((s, dir) => {
      table(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy(col("user_id"))
    })
  )

  def oracles: Map[String, String] = Map(
    "q16_string_funcs" ->
      """SELECT c_custkey, lower(c_name) AS lname, upper(c_mktsegment) AS useg,
        | cast(length(c_name) as int) AS name_len,
        | substring(c_name, 1, 4) AS name4,
        | c_mktsegment || '_' || c_name AS seg_name,
        | trim('  ' || c_mktsegment || ' ') AS trimmed
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,
    "q17_split_array" ->
      """SELECT p_partkey,
        | cast(len(string_split(p_name,' ')) as int) AS n_words,
        | string_split(p_name,' ')[1] AS first_word,
        | string_split(p_name,' ')[-1] AS last_word,
        | array_to_string(string_split(p_name,' '), '-') AS joined
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q18_regex" ->
      """SELECT p_partkey,
        | regexp_replace(p_name, '[aeiou]', '*', 'g') AS consonants,
        | regexp_extract(p_name, '^([a-z]+)', 1) AS first_token,
        | regexp_extract(p_type, '([A-Z]+)$', 1) AS type_tail
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q19_dates" ->
      """SELECT cast(year(o_orderdate) as int) AS yr,
        | cast(month(o_orderdate) as int) AS mo,
        | cast(count(*) as bigint) AS n,
        | cast(count(DISTINCT date_trunc('week', o_orderdate)) as bigint) AS n_weeks,
        | min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q20_math" ->
      """SELECT l_orderkey, l_linenumber,
        | round(ln(l_quantity + 1.0), 4) AS log_qty,
        | round(sqrt(l_extendedprice), 4) AS sqrt_price,
        | round(pow(l_discount, 2.0), 6) AS disc_sq,
        | abs(l_quantity - 25.0) AS qty_dev,
        | cast(floor(l_extendedprice) as bigint) AS price_floor,
        | cast(ceil(l_tax * 100) as bigint) AS tax_pct
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q21_json" ->
      """SELECT cast(regexp_extract(props, '"k": ([0-9]+)', 1) as int) % 10 AS k_bucket,
        | cast(count(*) as bigint) AS n,
        | round(cast(sum(cast(value as decimal(18,4))) as double) / count(*), 4) AS avg_value
        |FROM events GROUP BY 1 ORDER BY k_bucket""".stripMargin,
    "q114_variant_json" ->
      """SELECT event_type AS etype,
        | CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INT) % 10
        |   AS k_bucket,
        | cast(count(*) as bigint) AS n
        |FROM events GROUP BY 1, 2 ORDER BY etype, k_bucket""".stripMargin,
    "q22_array_ops" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS words
        |           FROM part),
        |     d AS (SELECT ['red','blue','small','big'] AS dict)
        |SELECT p_partkey,
        | coalesce(array_to_string(list_sort(list_distinct(
        |   list_filter(words, x -> list_contains(dict, x)))), ','), '') AS in_dict,
        | coalesce(array_to_string(list_sort(list_distinct(
        |   list_filter(words, x -> NOT list_contains(dict, x)))), ','), '') AS not_in_dict,
        | array_to_string(list_sort(list_distinct(words ||
        |   list_filter(dict, x -> NOT list_contains(words, x)))), ',') AS unioned
        |FROM w, d ORDER BY p_partkey""".stripMargin,
    "q23_map_ops" ->
      """SELECT c_custkey,
        | 'nation,seg' AS keys,
        | c_mktsegment AS seg,
        | cast(c_nationkey as int) AS nation
        |FROM customer WHERE c_custkey <= 100 ORDER BY c_custkey""".stripMargin,
    "q24_posexplode" ->
      """SELECT p_partkey,
        | cast(generate_subscripts(string_split(p_name,' '), 1) as int) AS pos,
        | unnest(string_split(p_name,' ')) AS word
        |FROM part WHERE p_partkey <= 300
        |ORDER BY p_partkey, pos""".stripMargin,
    "q25_pivot" ->
      """SELECT user_id,
        | cast(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) as bigint) AS click,
        | cast(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) as bigint) AS error,
        | cast(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) as bigint) AS purchase,
        | cast(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) as bigint) AS signup,
        | cast(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) as bigint) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
