package graft
import org.apache.spark.sql.SparkSession

/** Scratch: plan probe for the q_anomaly_mad bucketed rank selection. */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.events(spark, sf).createOrReplaceTempView("events")
    val sql = s"""WITH ev AS (SELECT event_type, value AS v FROM events),
      |${graft.operators.AggOps.medSelCtes("m1", "ev")}
      |SELECT event_type, med FROM m1m""".stripMargin
    spark.sql(sql).explain("formatted")
    spark.stop()
  }
}
