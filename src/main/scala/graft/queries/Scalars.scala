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
        .orderBy("l_orderkey", "l_linenumber")),

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
        .orderBy("event_type")))

  val oracle: Map[String, String] = Map(
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
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
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
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)
}
