package graft
import org.apache.spark.sql.SparkSession

/** Scratch: drive q_dedup_clusters with verbose heap/iteration output. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries("q_dedup_clusters")(spark, sf)
    println(f"SCRATCH2 built plan ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val c = df.count()
    println(f"SCRATCH2 rows=$c ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
