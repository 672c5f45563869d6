package graft

import org.scalatest.funsuite.AnyFunSuite

/** JVM-side replay of the ranking eval metrics (EvalOps): recompute
  * NDCG@10 / MRR / AP@20 naively from the graded queries' own rank rows
  * and from first principles, and assert the SQL results match exactly —
  * the same replay discipline as the tokenizer trainers. The DuckDB gate
  * proves Spark ≡ DuckDB on the full pipeline; this spec proves the
  * metric FORMULAS (clipped gain table, prefix-sum precision, reciprocal
  * rank) against straight-line Scala over the same inputs. */
class EvalRankSpec extends AnyFunSuite with SparkSessionTest {

  // gains[r] = floor(1e6 / log2(r + 1) + 0.5), ranks 1..10 — must equal
  // EvalOps' literal VALUES table
  private val gains: Map[Long, Long] = (1L to 10L).map { r =>
    r -> math.floor(1e6 / (math.log(r + 1.0) / math.log(2.0)) + 0.5).toLong
  }.toMap

  /** (qlang, rnk, rel, rtot) rows straight off the Spark rank base, via
    * the registered query's own session path (q_eval_ndcg registers the
    * rank_base view as a side effect). */
  private def rankRows(): Seq[(String, Long, Long, Long)] = {
    SparkEntry.queries("q_eval_ndcg")(spark, sf0001).collect() // builds rank_base
    spark.table("rank_base").collect()
      .map(r => (r.getString(0),
        r.getAs[Number](1).longValue(), // rnk is row_number's IntegerType
        r.getAs[Number](2).longValue(), r.getAs[Number](3).longValue()))
      .toSeq
  }

  test("gain table literals equal floor(1e6/log2(r+1)+0.5)") {
    // independent recompute of the constants baked into ndcgSql
    assert(gains(1L) == 1000000L && gains(2L) == 630930L &&
      gains(10L) == 289065L)
  }

  test("NDCG@10 matches a naive recompute over the rank base") {
    val rows = rankRows()
    val got = SparkEntry.queries("q_eval_ndcg")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (q, dcg, idcg, ndcg) =>
      val mine = rows.filter(r => r._1 == q && r._2 <= 10)
        .map(r => r._3 * gains(r._2)).sum
      val rtot = rows.filter(_._1 == q).map(_._4).max
      val myIdcg = (1L to math.min(rtot, 10L)).map(gains).sum
      assert(dcg == mine, s"$q dcg")
      assert(idcg == myIdcg, s"$q idcg")
      assert(ndcg == dcg * 1000000L / idcg, s"$q ndcg")
      assert(ndcg <= 1000000L && dcg <= idcg, s"$q bounds")
    }
  }

  test("MRR matches the first relevant rank") {
    val rows = rankRows()
    SparkEntry.queries("q_eval_mrr")(spark, sf0001).collect().foreach { r =>
      val q = r.getString(0)
      val firstRel = rows.filter(x => x._1 == q && x._3 == 1L)
        .map(_._2).minOption
      firstRel match {
        case Some(fr) =>
          assert(r.getLong(1) == fr, s"$q rank")
          assert(r.getLong(2) == 1000000L / fr, s"$q rr")
        case None => assert(r.isNullAt(1) && r.isNullAt(2), s"$q null")
      }
    }
  }

  test("AP@20 matches prefix-sum precision over relevant ranks") {
    val rows = rankRows()
    SparkEntry.queries("q_eval_map")(spark, sf0001).collect().foreach { r =>
      val q = r.getString(0)
      val mine = rows.filter(_._1 == q).sortBy(_._2)
      var cum = 0L; var sumPrec = 0L
      mine.foreach { x =>
        cum += x._3
        if (x._3 == 1L) sumPrec += cum * 1000000L / x._2
      }
      val rtot = mine.map(_._4).max
      assert(r.getLong(1) == sumPrec, s"$q sum_prec")
      assert(r.getLong(2) == sumPrec / math.min(rtot, 20L), s"$q ap")
    }
  }
}
