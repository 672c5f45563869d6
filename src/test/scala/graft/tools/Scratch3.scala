package graft
import org.apache.spark.sql.SparkSession
/** Scratch: time the PCA covariance phase pieces in isolation. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.embeddings(spark, sf).createOrReplaceTempView("embeddings")
    def t(name: String, sql: String): Unit = {
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        val c = spark.sql(sql).count()
        println(f"SCRATCH3 $name%-12s rows=$c%-9d ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    t("explode", "SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings")
    t("pairs", """WITH x AS (SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings)
      |SELECT a.pos AS i, b.pos AS j, count(*) AS n
      |FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.pos, b.pos""".stripMargin)
    t("pairs_dec", """WITH x AS (SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings)
      |SELECT a.pos AS i, b.pos AS j,
      |  CAST(SUM(CAST(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE) AS DECIMAL(18,12))) AS DOUBLE) AS s
      |FROM x a JOIN x b ON a.vec_id = b.vec_id GROUP BY a.pos, b.pos""".stripMargin)
    t("cov_center", """WITH x AS (SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings),
      |mu AS (SELECT pos,
      |         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE)
      |           / COUNT(v) AS m
      |       FROM x GROUP BY pos),
      |cx AS (SELECT x.vec_id, x.pos, CAST(x.v AS DOUBLE) - mu.m AS cv
      |       FROM x JOIN mu ON x.pos = mu.pos)
      |SELECT a.pos AS i, b.pos AS j,
      |  CAST(SUM(CAST(a.cv * b.cv AS DECIMAL(18,12))) AS DOUBLE) AS s
      |FROM cx a JOIN cx b ON a.vec_id = b.vec_id GROUP BY a.pos, b.pos""".stripMargin)
    t("cov_n", """WITH x AS (SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings),
      |mu AS (SELECT pos,
      |         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE)
      |           / COUNT(v) AS m
      |       FROM x GROUP BY pos),
      |cx AS (SELECT x.vec_id, x.pos, CAST(x.v AS DOUBLE) - mu.m AS cv
      |       FROM x JOIN mu ON x.pos = mu.pos),
      |n AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS nv FROM cx)
      |SELECT a.pos AS i, b.pos AS j,
      |  CAST(SUM(CAST(a.cv * b.cv AS DECIMAL(18,12))) AS DOUBLE)
      |    / (SELECT nv FROM n) AS s
      |FROM cx a JOIN cx b ON a.vec_id = b.vec_id GROUP BY a.pos, b.pos""".stripMargin)
    // piecewise replication of the query fn
    def phase(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SCRATCH3 phase $name%-10s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val covSql = """WITH x AS (SELECT vec_id, posexplode(embedding) AS (pos, v) FROM embeddings),
      |mu AS (SELECT pos,
      |         CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(30,12))) AS DOUBLE)
      |           / COUNT(v) AS m
      |       FROM x GROUP BY pos),
      |cx AS (SELECT x.vec_id, x.pos, CAST(x.v AS DOUBLE) - mu.m AS cv
      |       FROM x JOIN mu ON x.pos = mu.pos),
      |n AS (SELECT CAST(count(DISTINCT vec_id) AS DOUBLE) AS nv FROM cx)
      |SELECT a.pos AS i, b.pos AS j,
      |  CAST(SUM(CAST(a.cv * b.cv AS DECIMAL(18,12))) AS DOUBLE)
      |    / (SELECT nv FROM n) AS cv
      |FROM cx a JOIN cx b ON a.vec_id = b.vec_id
      |GROUP BY a.pos, b.pos""".stripMargin
    phase("cov_ckpt") { spark.sql(covSql).localCheckpoint().createOrReplaceTempView("pca_cov") }
    phase("b0") { spark.sql("SELECT DISTINCT i AS i, CAST(0.125 AS DOUBLE) AS w FROM pca_cov").localCheckpoint().createOrReplaceTempView("pca_b") }
    spark.stop()
  }
}
