package graft
import org.apache.spark.sql.SparkSession

/** Scratch piecewise timing for the query under iteration (not part of the
  * library surface; see Prof for the general per-query profiler). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documentsPar(spark, sf).createOrReplaceTempView("documents")
    graft.functions.GraftFunctions.register(spark)
    val explain = args.contains("-e")
    def t(name: String, sql: String): Unit = {
      if (explain) { println(s"===== $name"); spark.sql(sql).explain("formatted") }
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val c = spark.sql(sql).count()
        println(f"SCRATCH $name%-12s run$i rows=$c%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val profSql = """WITH d AS (SELECT doc_id, lang, array_distinct(char_ngrams(lower(text), 3)) AS gs
      FROM documents WHERE length(text) >= 3),
      tg AS (SELECT doc_id, lang, explode(gs) AS g FROM d)
      SELECT lang, g, count(*) AS c FROM tg WHERE pmod(doc_id, 4) = 0 GROUP BY lang, g"""
    t("prof_aqe", profSql)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    t("prof_noaqe", profSql)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    t("prof_8part", profSql)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    t("scan", "SELECT doc_id, lang, text FROM documents WHERE length(text) >= 3")
    Tables.documents(spark, sf).createOrReplaceTempView("docs_raw")
    t("grp_raw", "SELECT lang, count(*) AS c FROM docs_raw GROUP BY lang")
    t("grp_par", "SELECT lang, count(*) AS c FROM documents GROUP BY lang")
    t("grp2_par", "SELECT lang, c, count(*) FROM (SELECT lang, doc_id % 7 AS k, count(*) AS c FROM documents GROUP BY lang, doc_id % 7) GROUP BY lang, c")
    t("ngrams", "SELECT doc_id, array_distinct(char_ngrams(lower(text), 3)) AS gs FROM documents WHERE length(text) >= 3")
    t("explode", "SELECT doc_id, lang, explode(array_distinct(char_ngrams(lower(text), 3))) AS g FROM documents WHERE length(text) >= 3")
    t("prof", """WITH d AS (SELECT doc_id, lang, array_distinct(char_ngrams(lower(text), 3)) AS gs
      FROM documents WHERE length(text) >= 3),
      tg AS (SELECT doc_id, lang, explode(gs) AS g FROM d)
      SELECT lang, g, count(*) AS c FROM tg WHERE pmod(doc_id, 4) = 0 GROUP BY lang, g""")
    t("top", """WITH d AS (SELECT doc_id, lang, array_distinct(char_ngrams(lower(text), 3)) AS gs
      FROM documents WHERE length(text) >= 3),
      tg AS (SELECT doc_id, lang, explode(gs) AS g FROM d),
      prof AS (SELECT lang, g, count(*) AS c FROM tg WHERE pmod(doc_id, 4) = 0 GROUP BY lang, g)
      SELECT lang AS plang, g FROM
        (SELECT lang, g, row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rn FROM prof) r
      WHERE rn <= 30""")
    t("hits", """WITH d AS (SELECT doc_id, lang, array_distinct(char_ngrams(lower(text), 3)) AS gs
      FROM documents WHERE length(text) >= 3),
      tg AS (SELECT doc_id, lang, explode(gs) AS g FROM d),
      prof AS (SELECT lang, g, count(*) AS c FROM tg WHERE pmod(doc_id, 4) = 0 GROUP BY lang, g),
      top AS (SELECT lang AS plang, g FROM
        (SELECT lang, g, row_number() OVER (PARTITION BY lang ORDER BY c DESC, g) AS rn FROM prof) r
        WHERE rn <= 30)
      SELECT /*+ BROADCAST(p) */ t.doc_id, p.plang, count(*) AS s
      FROM tg t JOIN top p ON t.g = p.g GROUP BY t.doc_id, p.plang""")
    spark.stop()
  }
}
