package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog-statistics-fed CBO: ANALYZE'd column stats alone — no hint,
  * no AQE runtime rescue — must flip a filtered self-join from
  * sort-merge to broadcast, because the planner can finally see that
  * `doc_id < 20` keeps ~20 rows of the table. Also pins the
  * complementary fact the MAD hint removal relies on: driver-literal
  * LocalRelations carry exact sizes, so q_anomaly_mad's median joins
  * broadcast hint-free. */
class CatalogStatsSpec extends AnyFunSuite with SparkSessionTest {
  private val sfd = "/root/testdata/sf0.01"

  test("ANALYZE column stats flip a join to broadcast under CBO") {
    spark.sql("DROP TABLE IF EXISTS cbo_docs")
    spark.sql(
      s"""CREATE TABLE cbo_docs
         |  (doc_id BIGINT, text STRING, lang STRING, source STRING,
         |   n_chars BIGINT)
         |  USING parquet LOCATION '$sfd/documents.parquet'""".stripMargin)
    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // isolate STATIC planning: AQE could flip the join at runtime from
      // observed sizes, which is not what this spec is proving
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // The filter is on n_chars while the join key is doc_id, so
      // constraint inference can NOT copy it to the probe side (a
      // doc_id<k filter would be inferred onto both sides and both would
      // shrink). Threshold = half the planner's own UN-analyzed estimate
      // of the filtered side: without column stats the estimate cannot
      // fit under it, with stats the ~5%-selectivity range estimate can.
      val q =
        """SELECT a.doc_id, a.text FROM cbo_docs a
          |JOIN (SELECT doc_id FROM cbo_docs WHERE n_chars < 87) b
          |  ON a.doc_id = b.doc_id""".stripMargin
      val estB = spark.sql("SELECT doc_id FROM cbo_docs WHERE n_chars < 87")
        .queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        (estB / 2).toString)
      def plan = spark.sql(q).queryExecution.executedPlan.toString
      val before = plan
      assert(before.contains("SortMergeJoin") &&
        !before.contains("BroadcastHashJoin"),
        s"un-analyzed plan should sort-merge:\n$before")
      spark.sql("ANALYZE TABLE cbo_docs COMPUTE STATISTICS " +
        "FOR COLUMNS doc_id, n_chars")
      val after = plan
      assert(after.contains("BroadcastHashJoin"),
        s"stats did not flip the join:\n$after")
      // the approximate ndv the graded query deliberately excludes is
      // still sane: within 2x of the true distinct count
      val cs = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("cbo_docs"))
        .stats.get.colStats("doc_id")
      val ndv = cs.distinctCount.get.toLong
      val truth = spark.table("cbo_docs").select("doc_id").distinct().count()
      assert(ndv > truth / 2 && ndv < truth * 2, s"ndv $ndv vs $truth")
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
      spark.sql("DROP TABLE IF EXISTS cbo_docs")
    }
  }

  test("q_anomaly_mad broadcasts its median literals without hints") {
    val df = SparkEntry.queries("q_anomaly_mad")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    val n = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(n >= 2, s"expected 2 hint-free broadcast joins, got $n:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"median join degraded:\n$plan")
  }
}
