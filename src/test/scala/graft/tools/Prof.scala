package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiler: time named SparkEntry queries repeatedly.
  * Usage: runMain graft.Prof <sfDir> <n> <query...> [-e to print plan] */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val n = args(1).toInt
    val explain = args.contains("-e")
    val names = args.drop(2).filterNot(_ == "-e")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm codegen/JIT once on flagship
    SparkEntry.entry(spark).count()
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, c)
      }
      println(f"PROF $name%-28s rows=${ts.head._2}%-8d " +
        ts.map(t => f"${t._1}%.2f").mkString(" "))
    }
    spark.stop()
  }
}
