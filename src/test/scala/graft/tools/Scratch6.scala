package graft
import org.apache.spark.sql.SparkSession

/** Scratch: bisect eval-family cost. */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documentsPar(spark, sfDir).createOrReplaceTempView("documents")
    graft.functions.GraftFunctions.register(spark)
    def time(label: String, sql: String): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        spark.sql(sql).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE $label ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val d = "SELECT doc_id, lang, array_distinct(char_ngrams(lower(text), 3)) AS gs FROM documents WHERE length(text) >= 3"
    time("d", d)
    time("tg", s"SELECT doc_id, lang, explode(gs) AS g FROM ($d)")
    time("prof", s"SELECT lang, g, count(*) AS c FROM (SELECT doc_id, lang, explode(gs) AS g FROM ($d)) tg WHERE pmod(doc_id, 4) = 0 GROUP BY lang, g")
    val prof = s"(SELECT lang, g, count(*) AS c FROM (SELECT doc_id, lang, explode(gs) AS g FROM ($d)) tg WHERE pmod(doc_id, 4) = 0 GROUP BY lang, g)"
    val top = s"(SELECT lang AS plang, g FROM (SELECT lang, g, row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rn FROM $prof r0) r WHERE rn <= 30)"
    time("top", s"SELECT * FROM $top t")
    time("hits", s"SELECT /*+ BROADCAST(p) */ t.doc_id, p.plang, count(*) AS s FROM (SELECT doc_id, lang, explode(gs) AS g FROM ($d)) t JOIN $top p ON t.g = p.g WHERE pmod(t.doc_id, 4) <> 0 GROUP BY t.doc_id, p.plang")
    spark.stop()
  }
}
