package graft
import org.apache.spark.sql.SparkSession

/** Scratch: plan + timing probe for the PCA covariance stage rewrite. */
object Scratch4 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")
    val cov = spark.sql(graft.operators.VectorOps.pcaCovSparkSql)
    cov.explain("formatted")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val c = cov.count()
      println(f"SCRATCH cov run$i rows=$c ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
