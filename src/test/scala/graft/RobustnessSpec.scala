package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge-case robustness: nulls, empties, skew — the cases the corpus lacks
  * (FIXTURES.md "Unit-test fixtures" guidance). */
class RobustnessSpec extends AnyFunSuite with SparkSessionTest {

  test("salted join ≡ plain inner join, including a hot key") {
    import spark.implicits._
    // 10k rows on 3 keys, 90% on key 1 (hot), joined to a small dim
    val left = spark.range(10000)
      .select((when($"id" % 10 === 0, $"id" % 2 + 2).otherwise(1)).as("k"), $"id")
    val dim = Seq((1L, "hot"), (2L, "warm"), (3L, "cold")).toDF("k", "name")
    val plain = left.join(dim, "k")
    val salted = Skew.saltedJoin(left, dim, "k", col("id"), 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("k", "name").count().orderBy("k").collect().toSeq
    val b = salted.groupBy("k", "name").count().orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("windows and sessionize tolerate null timestamps") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = Seq(
      (1L, 1L, Some("2024-01-01 10:00:00")),
      (2L, 1L, None), // null ts
      (3L, 1L, Some("2024-01-01 11:00:00")))
      .toDF("event_id", "user_id", "ts_str")
      .withColumn("ts_s", to_timestamp($"ts_str"))
    val w = Window.partitionBy("user_id").orderBy($"ts_s".asc_nulls_first, $"event_id")
    val out = df.withColumn("rn", row_number().over(w))
      .withColumn("gap", unix_timestamp($"ts_s") - unix_timestamp(lag($"ts_s", 1).over(w)))
      .collect()
    assert(out.length == 3) // no crash; null sorts first, gap is null there
  }

  test("dedup and tokenize tolerate empty and null text") {
    import spark.implicits._
    val docs = Seq((1L, Some("a b")), (2L, Some("")), (3L, None))
      .toDF("doc_id", "text")
    val toks = docs.withColumn("toks", split(coalesce($"text", lit("")), " "))
    // explode of [""] yields one empty token; null text coalesced
    val n = toks.select(explode($"toks")).count()
    assert(n == 4)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(concat_ws(" ", sort_array($"toks"))).orderBy("doc_id")
    val dd = toks.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(dd.count() == 2) // empty and null normalize to the same key
  }

  test("vec_dot handles empty and length-mismatched arrays") {
    graft.functions.GraftFunctions.register(spark)
    // untyped array() is ARRAY<VOID>: correctly rejected at analysis
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(), array())").collect()
    }
    val r = spark.sql(
      """SELECT vec_dot(CAST(array() AS ARRAY<FLOAT>), CAST(array() AS ARRAY<FLOAT>)) AS a,
        |       vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |               array(CAST(3.0 AS FLOAT))) AS b""".stripMargin).head()
    assert(r.getDouble(0) == 0.0)
    assert(r.getDouble(1) == 3.0) // min-length zip
  }

  test("outer join null extension flows through downstream aggregates") {
    import spark.implicits._
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "x")
    val b = Seq((2L, "y2")).toDF("k", "tag")
    val j = a.join(b, Seq("k"), "left_outer")
    val agg = j.agg(count(lit(1)), count($"tag"), Det.dsum($"x")).head()
    assert(agg.getLong(0) == 2 && agg.getLong(1) == 1 && agg.getDouble(2) == 30.0)
  }

  test("char_ngrams ≡ the substring lambda, incl. unicode and short strings") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq("hello world", "ab", "abc", "", "héllo wörld ünïcode",
      "日本語のテキスト", "x").toDF("s")
    // (sequence(1, 0) is a DESCENDING range in Spark, so the lambda twin
    // needs the short-string guard explicitly — char_ngrams builds it in)
    val rows = df.selectExpr(
      "char_ngrams(s, 3) AS fast",
      """CASE WHEN length(s) < 3 THEN array()
        |ELSE transform(sequence(1, length(s) - 2), i -> substring(s, i, 3)) END AS slow""".stripMargin)
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), s"mismatch on row $r")
    }
    // n larger than the string → empty, not negative-sized
    assert(df.selectExpr("size(char_ngrams(s, 40))").collect().forall(_.getInt(0) == 0))
  }
}
