package graft.queries

import graft.Fixtures
import org.apache.spark.sql.functions._

/** Scalar-function inventory (SURVEY.md §2B B-8): string, regex-free
  * tokenization, date, math, conditional, JSON. All built-in
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs, so every
  * expression stays inside WholeStageCodegen.
  *
  * Cross-engine type pinning (rule D6): DuckDB `length`/`year`/
  * `date_diff` return BIGINT where Spark returns INT — the Spark side
  * casts to long so parquet schemas match the oracle's arrow output.
  */
object Scalars {

  val queries: Map[String, Q] = Map(
    "q_str_funcs" -> ((s, dir) =>
      Fixtures.customer(s, dir)
        .filter(col("c_custkey") <= 500)
        .select(
          col("c_custkey"),
          upper(col("c_name")).as("up_name"),
          lower(col("c_mktsegment")).as("lo_seg"),
          substring(col("c_name"), 10, 9).as("sub_name"),
          trim(concat(lit(" "), col("c_mktsegment"), lit(" "))).as("trimmed"),
          length(col("c_name")).cast("long").as("name_len"),
          concat(col("c_name"), lit("-"), col("c_mktsegment")).as("cat"))
        .orderBy("c_custkey")),

    "q_tok_explode" -> ((s, dir) =>
      Fixtures.documents(s, dir)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("token")),

    "q_date_funcs" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("mon_start"),
          last_day(col("o_orderdate")).as("mon_end"),
          datediff(lit("2000-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("long").as("days_to_2000"))
        .orderBy("o_orderkey")),

    "q_math_funcs" -> ((s, dir) =>
      Fixtures.lineitem(s, dir)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 4).as("sq"),
          round(log(col("l_extendedprice")), 4).as("lg"),
          ceil(col("l_quantity")).as("ce"),
          floor(col("l_quantity")).as("fl"),
          (col("l_orderkey") % 7).as("md"),
          round(pow(col("l_discount") + 1.0, 2), 4).as("p2"),
          round(abs(col("l_tax") - 0.05), 4).as("ab"))
        // total order: duplicate (l_orderkey, l_linenumber) pairs
        // exist in the fixture, so every output column tie-breaks
        .orderBy("l_orderkey", "l_linenumber", "sq", "lg", "ce", "fl",
          "md", "p2", "ab")),

    "q_conditional" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 300000.0, "high")
            .when(col("o_totalprice") > 150000.0, "mid")
            .otherwise("low").as("band"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"),
          least(col("o_totalprice"), lit(250000.0)).as("lp"),
          greatest(col("o_totalprice"), lit(100000.0)).as("gp"))
        .orderBy("o_orderkey")),

    "q_json_extract" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .select(col("event_type"),
                get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(sum("k").as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy("event_type")),

    // DataFrameNaFunctions surface: nulls manufactured by the outer
    // join are filled per-column (numeric + string defaults) before a
    // grouped aggregate — na.fill lowers to coalesce projections,
    // staying codegen'd.
    "q_na_fill" -> ((s, dir) => {
      val c = Fixtures.customer(s, dir)
      val o = Fixtures.orders(s, dir).filter(col("o_totalprice") > 400000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .na.fill(Map("o_totalprice" -> 0.0, "o_orderpriority" -> "NONE"))
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(count(lit(1)).as("cnt"),
          round(sum("o_totalprice"), 2).as("total"))
        .orderBy("c_mktsegment", "o_orderpriority")
    }),

    "q_str_regex" -> ((s, dir) =>
      Fixtures.part(s, dir)
        .select(col("p_partkey"),
                regexp_extract(col("p_brand"), "Brand#(\\d+)", 1)
                  .cast("long").as("brand_num"),
                regexp_replace(col("p_name"), "\\s+", "_").as("snake_name"))
        .orderBy("p_partkey")),

    // The DECIMAL(12,2) round-trips exercise the cast paths, but the
    // output schema stays decimal-free (double/string/bigint/date):
    // the oracle harness normalizes arrow decimal128 and DuckDB DECIMAL
    // differently, so a decimal-typed result column hash-mismatches
    // even when every value is identical.
    "q_cast" -> ((s, dir) =>
      Fixtures.orders(s, dir)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").cast("double").as("price_dec"),
          col("o_totalprice").cast("decimal(12,2)").cast("string").as("price_str"),
          col("o_orderkey").cast("int").cast("bigint").as("key_big"),
          lit("1999-12-31").cast("date").as("fixed_date"),
          col("o_orderdate").cast("date").as("order_date"))
        .orderBy("o_orderkey")),

    // Higher-order functions over the embedding array — slice/fold
    // run inside codegen, no UDF.
    "q_array_funcs" -> ((s, dir) =>
      Fixtures.embeddings(s, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(element_at(col("embedding"), 1).cast("double"), 4).as("first_elem"),
          round(aggregate(transform(slice(col("embedding"), 1, 8), _.cast("double")),
                          lit(0.0), (acc, x) => acc + x), 4).as("head_sum"))
        .orderBy("vec_id")),

    // Build a map, extract back — output the extracted scalars only
    // (map-typed parquet output is cross-engine-fragile).
    "q_map_from_entries" -> ((s, dir) =>
      Fixtures.events(s, dir)
        .select(col("event_id"),
                map(lit("type"), col("event_type"),
                    lit("uid"), col("user_id").cast("string")).as("m"))
        .select(col("event_id"),
                element_at(col("m"), "type").as("type_val"),
                element_at(col("m"), "uid").cast("long").as("uid_val"))
        .orderBy("event_id")))

  val oracle: Map[String, String] = Map(
    "q_na_fill" ->
      """SELECT c_mktsegment,
        |       coalesce(o_orderpriority, 'NONE') AS o_orderpriority,
        |       count(*) AS cnt,
        |       round(sum(coalesce(o_totalprice, 0.0)), 2) AS total
        |FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY c_mktsegment, o_orderpriority""".stripMargin,
    "q_str_funcs" ->
      """SELECT c_custkey,
        |       upper(c_name) AS up_name,
        |       lower(c_mktsegment) AS lo_seg,
        |       substring(c_name, 10, 9) AS sub_name,
        |       trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
        |       CAST(length(c_name) AS BIGINT) AS name_len,
        |       concat(c_name, '-', c_mktsegment) AS cat
        |FROM customer WHERE c_custkey <= 500 ORDER BY c_custkey""".stripMargin,
    "q_tok_explode" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
        |       last_day(o_orderdate) AS mon_end,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_2000
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(sqrt(l_extendedprice), 4) AS sq,
        |       round(ln(l_extendedprice), 4) AS lg,
        |       CAST(ceil(l_quantity) AS BIGINT) AS ce,
        |       CAST(floor(l_quantity) AS BIGINT) AS fl,
        |       l_orderkey % 7 AS md,
        |       round(pow(l_discount + 1.0, 2), 4) AS p2,
        |       round(abs(l_tax - 0.05), 4) AS ab
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, sq, lg, ce, fl,
        |  md, p2, ab""".stripMargin,
    "q_conditional" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 300000.0 THEN 'high'
        |            WHEN o_totalprice > 150000.0 THEN 'mid'
        |            ELSE 'low' END AS band,
        |       coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS st,
        |       least(o_totalprice, 250000.0) AS lp,
        |       greatest(o_totalprice, 100000.0) AS gp
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_json_extract" ->
      """SELECT event_type,
        |       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_str_regex" ->
      """SELECT p_partkey,
        |       CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS BIGINT) AS brand_num,
        |       regexp_replace(p_name, '\s+', '_', 'g') AS snake_name
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_cast" ->
      """SELECT o_orderkey,
        |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
        |       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
        |       CAST(CAST(o_orderkey AS INTEGER) AS BIGINT) AS key_big,
        |       DATE '1999-12-31' AS fixed_date,
        |       CAST(o_orderdate AS DATE) AS order_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_array_funcs" ->
      """SELECT vec_id,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(CAST(embedding[1] AS DOUBLE), 4) AS first_elem,
        |       round(CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE) +
        |             CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE) +
        |             CAST(embedding[5] AS DOUBLE) + CAST(embedding[6] AS DOUBLE) +
        |             CAST(embedding[7] AS DOUBLE) + CAST(embedding[8] AS DOUBLE), 4)
        |         AS head_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q_map_from_entries" ->
      """SELECT event_id, event_type AS type_val, user_id AS uid_val
        |FROM events ORDER BY event_id""".stripMargin)
}
