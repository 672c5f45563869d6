package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The corpus is DRIVER-OWNED and has changed physical shape between
  * rounds (round 6 lost a day to an events ns→µs flip). This suite pins
  * the loaders against the physical-layout axes a regeneration could
  * plausibly move next: file count, compression codec, row-group size,
  * and the events timestamp unit. Each variant holds the SAME sf0.001
  * rows; a representative query per table family must return value-
  * identical results over every variant — loaders must detect file
  * properties, never bake in one generator's encoding.
  */
class CorpusShapeSpec extends AnyFunSuite with SparkSessionTest {

  /** One query per table family + the loader special paths: lineitem agg,
    * multiway join over orders/customer/nation/region + supplier/part,
    * events ts pushdown + JSON props, documents tokenize (the
    * single-row-group-sensitive repartition path), embeddings knn. */
  private val repQueries = Seq(
    "q_agg_pricing_summary",   // lineitem
    "q_join_multiway",         // orders + customer + nation + region
    "q_join_broadcast",        // supplier + nation
    "q_filter_range_time",     // events: ts predicate pushdown path
    "q_ingest_json_events",    // events: props JSON
    "q_agg_ttest",             // events: value moments
    "q_text_tokenize_wordcount", // documents: documentsPar repartition path
    "q_dedup_exact",           // documents: hash-groupBy
    "q_vec_knn_cosine")        // embeddings

  private def canon(df: DataFrame): Seq[String] = {
    val names = df.columns.sorted.toSeq
    df.select(names.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  private lazy val baseline: Map[String, Seq[String]] =
    repQueries.map(n => n -> canon(SparkEntry.queries(n)(spark, sf0001))).toMap

  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Rewrite every table into `dir/<t>.parquet` with `write` applied to
    * the canonical rows (events via Tables.events so this spec itself
    * never assumes the source unit). */
  private def variant(name: String)(write: (DataFrame, String) => Unit): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_shape_$name").toString
    tables.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sf0001)
               else spark.read.parquet(s"$sf0001/$t.parquet")
      write(df, s"$dir/$t.parquet")
    }
    dir
  }

  private def assertParity(sfDir: String, clue: String): Unit =
    repQueries.foreach { n =>
      val got = canon(SparkEntry.queries(n)(spark, sfDir))
      assert(got == baseline(n), s"[$clue] $n diverged from canonical corpus")
    }

  test("multi-file tables (3-way split directories) read identically") {
    // at 100 TB every table IS a many-file directory — the single-file
    // test corpus is the special case, not the rule
    val dir = variant("multifile") { (df, path) =>
      df.repartition(3).write.mode(SaveMode.Overwrite).parquet(path)
    }
    assertParity(dir, "multifile")
  }

  test("zstd-compressed, many-row-group tables read identically") {
    val dir = variant("zstd_rg") { (df, path) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("compression", "zstd")
        .option("parquet.block.size", (256 * 1024).toString) // many row groups
        .parquet(path)
    }
    assertParity(dir, "zstd_rg")
  }

  test("uncompressed single-file tables read identically") {
    val dir = variant("plain") { (df, path) =>
      df.coalesce(1).write.mode(SaveMode.Overwrite)
        .option("compression", "uncompressed").parquet(path)
    }
    assertParity(dir, "plain")
  }

  test("TIMESTAMP(NANOS) events (the original corpus unit) read identically") {
    // committed fixture: sf0.001 events re-encoded as timestamp[ns]
    // (tools/make_shape_fixtures.py); other tables come from the
    // canonical dir via symlinks so only the unit axis moves
    val nanosEvents = getClass.getResource("/nanos_events/events.parquet").getPath
    val dir = java.nio.file.Files.createTempDirectory("graft_shape_nanos")
    tables.foreach { t =>
      val target = if (t == "events") java.nio.file.Paths.get(nanosEvents)
                   else java.nio.file.Paths.get(s"$sf0001/$t.parquet")
      java.nio.file.Files.createSymbolicLink(dir.resolve(s"$t.parquet"), target)
    }
    // unit probe: the loader must classify this dir as nanos and the
    // canonical dir as micros, and both must yield the same instants
    val a = canon(Tables.events(spark, dir.toString))
    val b = canon(Tables.events(spark, sf0001))
    assert(a == b, "events loader rows differ across ts units")
    val ra = canon(Tables.eventsRaw(spark, dir.toString))
    val rb = canon(Tables.eventsRaw(spark, sf0001))
    assert(ra == rb, "eventsRaw rows differ across ts units")
    assertParity(dir.toString, "nanos")
  }

  test("a missing events directory throws instead of caching a unit verdict") {
    val bogus = "/tmp/graft_no_such_corpus_dir"
    val e = intercept[Exception] {
      Tables.events(spark, bogus).count()
    }
    // must be a path error surfaced from the probe, not a legacy-nanos
    // read failure from a cached wrong classification
    val msg = String.valueOf(e.getMessage)
    assert(msg.contains("PATH_NOT_FOUND") || msg.contains("does not exist")
      || msg.contains("bogus") || msg.contains(bogus), msg)
  }
}
