package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reshaping + remaining enumerable surface: pivot/unpivot, percentile
  * window ranks, multiset set-ops (widens SURVEY §2 T5/T7).
  *
  * Scale notes: `pivot` with an explicit value list is a single hash
  * aggregate (no second pass to discover values — at 100 TB the implicit
  * form would need an extra distinct scan); `unpivot` is a generate-side
  * expansion, partition-local, no shuffle.
  */
object ReshapeOps {

  private val eventTypes = Seq("click", "error", "purchase", "signup", "view")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_pivot" -> ((s, sf) => {
      val p = Tables.events(s, sf)
        .groupBy("user_id")
        .pivot("event_type", eventTypes)
        .agg(count(lit(1)))
      p.select(
        col("user_id") +: eventTypes.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
        .orderBy("user_id")
    }),

    "q_unpivot" -> ((s, sf) =>
      Tables.events(s, sf)
        .select(col("event_id"), col("value"), col("user_id").cast(DoubleType).as("uid_d"))
        .unpivot(
          ids = Array(col("event_id")),
          values = Array(col("value"), col("uid_d")),
          variableColumnName = "metric",
          valueColumnName = "mval")
        .orderBy("event_id", "metric")),

    "q_win_pct" -> ((s, sf) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
      Tables.events(s, sf)
        .select(
          col("event_type"), col("event_id"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("event_type", "event_id")
    }),

    "q_except_all" -> ((s, sf) => {
      val e = Tables.events(s, sf)
      e.filter(col("event_type") === "view").select("user_id")
        .exceptAll(e.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    }),

    "q_intersect_all" -> ((s, sf) => {
      val e = Tables.events(s, sf)
      e.filter(col("event_type") === "click").select("user_id")
        .intersectAll(e.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_pivot" -> {
      val cols = eventTypes.map(t =>
        s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS \"$t\"")
        .mkString(",\n  ")
      s"""SELECT user_id,
         |  $cols
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
    },

    "q_unpivot" ->
      """SELECT event_id, 'value' AS metric, value AS mval FROM events
        |UNION ALL
        |SELECT event_id, 'uid_d' AS metric, CAST(user_id AS DOUBLE) AS mval FROM events
        |ORDER BY event_id, metric""".stripMargin,

    "q_win_pct" ->
      """SELECT event_type, event_id,
        |  round(percent_rank() OVER w, 6) AS pr,
        |  round(cume_dist() OVER w, 6) AS cd
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_type, event_id""".stripMargin,

    "q_except_all" ->
      """SELECT user_id FROM events WHERE event_type = 'view'
        |EXCEPT ALL
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin,

    "q_intersect_all" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |INTERSECT ALL
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin
  )
}
