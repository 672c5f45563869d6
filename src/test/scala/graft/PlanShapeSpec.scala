package graft

import org.scalatest.funsuite.AnyFunSuite

/** Machine-checkable plan-shape pins for the WHOLE registry (round-10
  * verdict item 2 — extend TpchSpec's discipline beyond TPC-H): every
  * registered query is run to AQE finality at sf0.001 and its physical
  * plan's structural fingerprint — CartesianProduct / BNLJ / shuffle-
  * exchange / broadcast-exchange / reused-exchange / pushed-filter-scan
  * counts — must equal the committed `PLANSHAPE.tsv` baseline. A lost
  * broadcast pin, a join that degrades to nested-loop, a filter that
  * stops reaching the scan, or a new shuffle stage now FAILS A TEST
  * instead of surfacing as bench noise (this box's weakest signal).
  *
  * On an intended plan change: review the diff this spec prints, then
  * regenerate deliberately —
  * `sbt "Test/runMain graft.PlanShapeDump --tsv PLANSHAPE.tsv"` — and
  * commit the new baseline alongside the change (the PLANS.md audit
  * entry is the prose half of that review).
  *
  * Global invariant on top of the per-query pins: CartesianProduct may
  * appear ONLY in the four documented calendar-bounded pair
  * constructions (Walsh averages / Kendall concordance / K-M risk sets
  * over month-of-hours series, and the eval threshold grid) — each a
  * cross of SMALL aggregated relations whose size is fixed by the
  * calendar, not the corpus, so the product is bounded at any SF. */
class PlanShapeSpec extends AnyFunSuite with SparkSessionTest {

  /** Queries whose exchange counts flap ±1 across identical fresh runs
    * (measured: back-to-back PlanShapeDump runs disagree) — AQE makes a
    * borderline broadcast/coalesce call from runtime stage stats, and
    * task completion order tips it. For these three, shuf/bcast/reuse
    * get a ±1 tolerance; cart/bnlj/pushed stay exact like everyone
    * else's. */
  private val aqeJitter = Set(
    "q_dedup_substring", "q_events_ccf", "q_graph_adamic_adar",
    "q_graph_modularity",
    // measured round 14 (back-to-back PlanShapeDump runs disagree by
    // exactly one): ols_trend ±1 shuffle, neighbor_jaccard ±1 broadcast
    "q_agg_ols_trend", "q_graph_neighbor_jaccard")

  private val cartesianByDesign = Map(
    "q_agg_hodges_lehmann" -> 2, // Walsh-average pair grid, hours × hours
    "q_agg_kendall" -> 2,        // concordant/discordant hourly pair grid
    "q_eval_prf" -> 1,           // threshold grid × per-class counts
    "q_report_kaplan_meier" -> 1 // risk-set day grid × censored lifetimes
  )

  test("every query's physical plan matches the committed PLANSHAPE.tsv") {
    val path = java.nio.file.Paths.get("PLANSHAPE.tsv")
    assert(java.nio.file.Files.exists(path),
      "PLANSHAPE.tsv missing — regenerate: " +
        "sbt \"Test/runMain graft.PlanShapeDump --tsv PLANSHAPE.tsv\"")
    val src = scala.io.Source.fromFile(path.toFile)
    val want =
      try src.getLines().filterNot(_.startsWith("#")).map { l =>
        val p = l.split("\t")
        p(0) -> p.tail.map(_.toInt).toSeq
      }.toMap
      finally src.close()

    val names = SparkEntry.queries.keySet
    val diffs = scala.collection.mutable.Buffer[String]()
    (names -- want.keySet).toSeq.sorted.foreach(n =>
      diffs += s"$n: registered but has no baseline row (regenerate PLANSHAPE.tsv)")
    (want.keySet -- names).toSeq.sorted.foreach(n =>
      diffs += s"$n: baseline row for an unregistered query (regenerate PLANSHAPE.tsv)")

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, _) =>
      want.get(name).foreach { w =>
        PlanShapeDump.census(spark, sf0001, name) match {
          case Right(m) =>
            val ok =
              if (aqeJitter(name))
                m(0) == w(0) && m(1) == w(1) && m(5) == w(5) &&
                  (2 to 4).forall(i => math.abs(m(i) - w(i)) <= 1)
              else m == w
            if (!ok)
              diffs += s"$name: cart/bnlj/shuf/bcast/reuse/pushed = " +
                s"${m.mkString("/")} vs baseline ${w.mkString("/")}"
            if (m.head > cartesianByDesign.getOrElse(name, 0))
              diffs += s"$name: ${m.head} CartesianProduct nodes " +
                "(not in the calendar-bounded allowlist)"
          case Left(e) => diffs += s"$name: failed to run ($e)"
        }
      }
    }
    assert(diffs.isEmpty,
      s"\nplan-shape drift vs PLANSHAPE.tsv (${diffs.size} rows) — if " +
        "intended, regenerate the baseline deliberately:\n" +
        diffs.mkString("\n"))
  }
}
