package graft
import org.apache.spark.sql.SparkSession

/** Scratch: plan probe for the pagerank iteration chain. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextOps
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STEP $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { rep =>
      Tables.lineitem(spark, sf).createOrReplaceTempView("lineitem")
      t(s"edges-$rep")(spark.sql(TextOps.pagerankEdgesSql("STRING"))
        .localCheckpoint().createOrReplaceTempView("pr_e"))
      val df = spark.sql(s"WITH ${TextOps.pagerankIterCtes}\n${TextOps.pagerankFinalSql}")
      t(s"chain-$rep")(df.count())
    }
    spark.stop()
  }
}
