package graft
import org.apache.spark.sql.SparkSession

/** Scratch: A/B the pre/post-refactor bm25 spellings. */
object Scratch7 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.documents(spark, sfDir).createOrReplaceTempView("documents")
    val ctes =
      """d AS (SELECT doc_id, split(text, ' ') AS toks FROM documents),
        |dl AS (SELECT doc_id, size(toks) AS dl FROM d),
        |g AS (SELECT count(*) AS n_docs,
        |        CAST(SUM(CAST(dl AS DECIMAL(30,10))) AS DOUBLE) / count(*) AS avgdl
        |      FROM dl),
        |t AS (SELECT doc_id, tok FROM
        |        (SELECT doc_id, explode(toks) AS tok FROM d) x
        |      WHERE tok IN ('spark', 'query', 'join', 'the')),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM t GROUP BY doc_id, tok),
        |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |wt AS (SELECT tf.doc_id,
        |        ln((g.n_docs - df.df + 0.5) / (df.df + 0.5) + 1.0) *
        |          (tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / g.avgdl)) AS w
        |      FROM tf JOIN df USING (tok) JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN g)""".stripMargin
    val oldSql =
      s"""WITH $ctes
         |SELECT doc_id, round(CAST(SUM(CAST(w AS DECIMAL(30,12))) AS DOUBLE), 6) AS bm25
         |FROM wt GROUP BY doc_id
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    val newSql =
      s"""WITH $ctes,
         |bs AS (SELECT doc_id, round(CAST(SUM(CAST(w AS DECIMAL(30,12))) AS DOUBLE), 6) AS bm25
         |       FROM wt GROUP BY doc_id)
         |SELECT doc_id, bm25 FROM bs
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    for ((l, q) <- Seq("old" -> oldSql, "new" -> newSql, "old2" -> oldSql, "new2" -> newSql)) {
      val t0 = System.nanoTime()
      spark.sql(q).count()
      println(f"AB $l ${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
