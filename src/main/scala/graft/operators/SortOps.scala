package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** T6 — sort, limit, top-k (SURVEY §2 T6).
  *
  * Scale notes: global `orderBy` is a range-partitioned sort (sampled
  * boundaries) — fine at 100 TB; `orderBy.limit(k)` compiles to
  * `TakeOrderedAndProject` (per-partition top-k then merge on the driver),
  * which never materializes the full sort. Top-k *per group* uses a window
  * rank, one shuffle on the group key.
  */
object SortOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // explicit nulls ordering: Spark's defaults (asc→nulls first) are made
    // explicit so the oracle can pin the identical order
    "q_sort_multi" -> ((s, sf) =>
      Tables.events(s, sf)
        .select(
          col("event_id"),
          nullif(col("event_type"), lit("click")).as("et_null"),
          col("value"))
        .orderBy(
          col("et_null").desc_nulls_first,
          col("value").asc,
          col("event_id").asc)),

    "q_topk" -> ((s, sf) =>
      Tables.lineitem(s, sf)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(20)),

    "q_topk_per_group" -> ((s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
      Tables.events(s, sf)
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .filter(col("rn") <= 3)
        .select("event_type", "rn", "event_id", "value")
        .orderBy("event_type", "rn")
    }),

    "q_limit_offset" -> ((s, sf) => {
      Tables.lineitem(s, sf).createOrReplaceTempView("lineitem")
      // (l_orderkey, l_linenumber) is not unique: include l_quantity so the
      // offset slice falls on a deterministic boundary (ties that remain
      // are fully identical rows)
      s.sql(
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |ORDER BY l_orderkey, l_linenumber, l_quantity
          |LIMIT 20 OFFSET 100""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multi" ->
      """SELECT event_id, nullif(event_type, 'click') AS et_null, value
        |FROM events
        |ORDER BY et_null DESC NULLS FIRST, value ASC, event_id ASC""".stripMargin,

    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 20""".stripMargin,

    "q_topk_per_group" ->
      """SELECT event_type, rn, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |                       ORDER BY value DESC, event_id) AS rn
        |  FROM events) t
        |WHERE rn <= 3
        |ORDER BY event_type, rn""".stripMargin,

    "q_limit_offset" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity
        |LIMIT 20 OFFSET 100""".stripMargin
  )
}
