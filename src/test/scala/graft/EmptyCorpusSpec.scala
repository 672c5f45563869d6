package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-input sweep: EVERY registered query must execute against a
  * zero-row corpus (schema-exact empty parquet, including the ns-timestamp
  * events table — fixture committed under test resources, regenerable with
  * tools/make_empty_corpus.py).
  *
  * Spark 4 runs in ANSI mode, where an aggregate-then-divide over an empty
  * relation is one unguarded expression away from a DIVIDE_BY_ZERO job kill
  * (q_events_ab_lift needed a nullif for exactly this). Empty partitions
  * are routine at 100 TB — a date with no data, a filter matching nothing —
  * so "runs to completion on empty input" is a production property, not a
  * test nicety. Queries may legitimately return zero rows or NULL-valued
  * aggregates; they must not throw.
  */
class EmptyCorpusSpec extends AnyFunSuite with SparkSessionTest {

  private val emptySf: String =
    getClass.getResource("/empty_sf").getPath

  /** Probe-driven queries that inherently require a non-empty input:
    * the MLlib LSH fits a model on the corpus (fit on empty throws) and
    * takes a driver-side probe row. The SQL-probe ANN variants degrade
    * gracefully (empty probe → empty result) and stay in the sweep. */
  private val requiresData = Set("q_vec_ann_lsh")

  private def sweep(sfDir: String, skip: Set[String]): Seq[String] =
    SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, _) if skip(name) => None
      case (name, fn) =>
        try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(120)}") }
    }

  test("every registered query executes on a zero-row corpus") {
    val failures = sweep(emptySf, requiresData)
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("every registered query executes on a one-row corpus") {
    // one row per table: the degenerate-but-nonempty case — single-element
    // groups (n−1 = 0 in variance denominators), one-vector labels,
    // single-token documents; doubles go NaN/Infinity (fine), nothing may
    // throw. The MLlib LSH fits on one vector, so it stays in this sweep.
    val tinySf = getClass.getResource("/tiny_sf").getPath
    val failures = sweep(tinySf, Set.empty)
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
