package graft

import org.apache.spark.sql.SparkSession

/** One-line plan-shape census over the whole registry: per query, counts of
  * banned/structural physical nodes on the FINAL (AQE-finalized) plan at
  * sf0.001. Source material for PlanShapeSpec's pinned expectations —
  * `sbt "runMain graft.PlanShapeDump [regex]"`, eyeball/diff the table, pin
  * the curated rows in the spec. Dev tool only, not a driver surface.
  */
object PlanShapeDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val pat = args.headOption.getOrElse(".")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(f"${"query"}%-36s cart bnlj shuf bcast reuse pushed")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(s".*$pat.*")).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.collect()
          val p = df.queryExecution.executedPlan.toString
          def n(s: String) = s.r.findAllIn(p).size
          println(f"$name%-36s ${n("CartesianProduct")}%4d " +
            f"${n("BroadcastNestedLoopJoin")}%4d " +
            f"${n("Exchange (hash|range|Single|RoundRobin)")}%4d " +
            f"${n("BroadcastExchange")}%5d ${n("ReusedExchange")}%5d " +
            f"${n("PushedFilters: \\[[^\\]]")}%6d")
        } catch {
          case e: Throwable =>
            println(f"$name%-36s ERROR ${e.getClass.getSimpleName}")
        }
      }
    spark.stop()
  }
}
