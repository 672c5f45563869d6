package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative properties (SURVEY §5.2 layer 3): the clever encodings must
  * equal their naive definitions on arbitrary inputs, not just the corpus. */
class PropertySpec extends AnyFunSuite with SparkSessionTest {

  /** Deterministic sampling from a Gen (no scalatest-plus bridge in the
    * offline cache): fixed seeds, n draws. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val vocab: Vector[String] =
    (0 until 200).map(i => f"w$i%03d").toVector // within the 256-token bitmap cap

  private val docGen: Gen[List[String]] =
    Gen.chooseNum(3, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("bitmap Jaccard pipeline == direct set Jaccard on random corpora") {
    for (docs <- samples(Gen.listOfN(25, docGen), 4)) {
      {
        import spark.implicits._
        docs.zipWithIndex.map { case (toks, i) => (i.toLong, "x", toks.mkString(" ")) }
          .toDF("doc_id", "lang", "text")
          .createOrReplaceTempView("documents")
        val got = spark.sql(TextOps.nearDupSql(
            tokTable = "SELECT doc_id, lang, explode(array_distinct(split(text, ' '))) AS tok FROM documents",
            shift = "shiftleft(CAST(1 AS BIGINT), id - %d)",
            probe = "explode(sequence((9 * n + 9) div 10, (10 * n) div 9))"))
          .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
        // naive reference: exact set jaccard + the same band prune + rounding
        val sets = docs.map(_.toSet).zipWithIndex
        val want = (for {
          (a, i) <- sets; (b, j) <- sets if i < j
          if math.min(a.size, b.size) * 10 >= math.max(a.size, b.size) * 9
          inter = (a & b).size
          j6 = round6(inter.toDouble / (a.size + b.size - inter))
          if j6 >= 0.9
        } yield (i.toLong, j.toLong, j6)).toSet
        assert(got == want)
      }
    }
  }

  test("two-phase prefix-bucketed dict rank == naive codepoint-order rank on unicode vocab") {
    // The distributed id assignment (dictCtes) claims its (prefix, tok)
    // bucketed rank equals the global sorted rank. The graded corpus is
    // ASCII, so this property drives the claim through the boundary the
    // gate never sees: multi-byte characters, supplementary-plane
    // codepoints (where Java's String.compareTo UTF-16 order DIVERGES
    // from Spark/DuckDB's binary-UTF-8 = codepoint order), empty and
    // 1-char tokens. The naive reference therefore compares UTF-8 byte
    // arrays, not compareTo.
    val cpGen: Gen[Int] = Gen.oneOf(
      Gen.chooseNum('a'.toInt, 'z'.toInt),
      Gen.oneOf(0x00e9, 0x00df, 0x4e2d, 0x3042, 0xe000, 0xfffd),
      Gen.chooseNum(0x1f600, 0x1f640)) // supplementary plane
    val tokGen: Gen[String] = Gen.chooseNum(0, 5).flatMap(n =>
      Gen.listOfN(n, cpGen).map(cps => new String(cps.toArray, 0, cps.length)))
    def utf8Lt(a: String, b: String): Boolean = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = (x(i) & 0xff) - (y(i) & 0xff)
        if (c != 0) return c < 0
        i += 1
      }
      x.length < y.length
    }
    for (toks <- samples(Gen.listOfN(120, tokGen), 3)) {
      import spark.implicits._
      toks.toDF("tok").createOrReplaceTempView("prop_toks")
      val got = spark.sql(
        s"""WITH ${TextOps.dictCtes("prop_toks")}
           |SELECT tok, id FROM dict""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val want = toks.distinct.sortWith(utf8Lt).zipWithIndex.toMap
      assert(got == want, s"rank divergence on vocab of ${want.size}")
    }
  }

  test("SimHash is invariant under token-order permutation") {
    for ((doc, seed) <- samples(Gen.zip(docGen, Gen.long), 4)) {
      {
        import spark.implicits._
        val shuffled = new scala.util.Random(seed).shuffle(doc)
        Seq((1L, doc.mkString(" ")), (2L, shuffled.mkString(" ")))
          .toDF("doc_id", "text")
          .createOrReplaceTempView("d2")
        val hashes = spark.sql(
          """SELECT concat_ws('', transform(sequence(1, 16), j ->
            |  CASE WHEN aggregate(split(text, ' '), 0, (acc, t) ->
            |    acc + (CASE WHEN substring(md5(t), j, 1) IN ('8','9','a','b','c','d','e','f')
            |           THEN 1 ELSE -1 END)) >= 0 THEN '1' ELSE '0' END)) AS h
            |FROM d2""".stripMargin).collect().map(_.getString(0))
        assert(hashes(0) == hashes(1)) // frequency-weighted → order-free
      }
    }
  }

  test("as-of result time is the max right time <= left time (generative)") {
    val timesGen = Gen.listOfN(20, Gen.chooseNum(0L, 1000000L))
    for ((lts, rts) <- samples(Gen.zip(timesGen, timesGen), 3)) {
      {
        import spark.implicits._
        val l = lts.distinct.zipWithIndex
          .map { case (t, i) => (i.toLong, 1L, new java.sql.Timestamp(t * 1000)) }
          .toDF("event_id", "user_id", "ts_s")
        val r = rts.distinct.zipWithIndex
          .map { case (t, i) => (i.toLong, 1L, new java.sql.Timestamp(t * 1000)) }
          .toDF("o_orderkey", "o_custkey", "o_orderdate")
        val got = graft.plans.AsOf
          .join(l, r, "user_id", "o_custkey", "ts_s", "o_orderdate", "o_orderkey", leftOuter = true)
          .select("event_id", "o_orderdate").collect()
          .map(row => row.getLong(0) -> Option(row.getTimestamp(1)).map(_.getTime / 1000)).toMap
        val rsorted = rts.distinct.sorted
        for ((t, i) <- lts.distinct.zipWithIndex) {
          val expect = rsorted.takeWhile(_ <= t).lastOption
          assert(got(i.toLong) == expect, s"left t=$t")
        }
      }
    }
  }

  test("int8 quantization error is bounded by half a step, per element (generative)") {
    import spark.implicits._
    val vecGen = Gen.chooseNum(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0f, 10.0f).suchThat(v => !v.isNaN)))
    for ((vec, id) <- samples(vecGen, 40).zipWithIndex if vec.exists(_ != 0.0f)) {
      val df = Seq((id.toLong, vec.toArray)).toDF("vec_id", "embedding")
      df.createOrReplaceTempView("embeddings")
      val r = spark.sql(
        """SELECT
          |  127.0 / array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS scale,
          |  transform(embedding, x ->
          |    least(greatest(floor(CAST(x AS DOUBLE) *
          |      (127.0 / array_max(transform(embedding, y -> abs(CAST(y AS DOUBLE))))) + 0.5D),
          |      -127.0D), 127.0D)) AS qv
          |FROM embeddings""".stripMargin).head()
      val scale = r.getDouble(0)
      val qv = r.getSeq[Double](1)
      vec.zip(qv).foreach { case (x, q) =>
        // |x - q/scale| <= 0.5/scale: floor(x*scale+0.5) is within half a
        // quantization step, and clamping never engages because the max
        // element maps exactly to +/-127
        assert(math.abs(x.toDouble - q / scale) <= 0.5 / scale + 1e-12,
          s"x=$x q=$q scale=$scale")
      }
      assert(qv.exists(q => math.abs(q) == 127.0)) // max element saturates
    }
  }

  test("ASOF lowering never rewrites inside literals or comments (generative)") {
    // the advisor's corruption scenario, generalized: random payloads
    // containing the keyword, embedded as a literal and as comments —
    // the parsed plan must carry the literal byte-for-byte, and the
    // statement must not be mistaken for an ASOF join
    val ext = org.apache.spark.sql.GraftBridge.newSessionWithExtensions(
      spark, "graft.functions.GraftExtensions")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    ext.createDataFrame(
      java.util.Arrays.asList(Row(1L)),
      StructType(Seq(StructField("k", LongType))))
      .createOrReplaceTempView("prop_t")
    val payloadGen: Gen[String] = for {
      pre <- Gen.oneOf("", "x ", "-- not really ", "*/ ")
      kw <- Gen.oneOf("asof join", "ASOF JOIN", "Asof  Left Join", "asof\nouter join")
      post <- Gen.oneOf("", " pending", " -- eh", " /*")
    } yield pre + kw + post
    for (p <- samples(payloadGen, 12)) {
      val lit = p.replace("'", "''")
      val got = ext.sql(s"SELECT '$lit' AS c FROM prop_t").collect()(0).getString(0)
      assert(got == p, s"literal corrupted: <$p> -> <$got>")
      // bracketed comments nest in Spark: strip both delimiters from the
      // payload so the wrapper comment itself stays well-formed
      val safe = p.replace("*/", "").replace("/*", "")
      val viaComment = ext.sql(
        s"SELECT k /* $safe */ FROM prop_t -- ${p.replace("\n", " ")}\n")
        .collect()(0).getLong(0)
      assert(viaComment == 1L)
    }
  }

  test("portable md5 hex arithmetic equals direct base-16 parsing (generative)") {
    // the instr('0123456789abcdef', digit)-1 positional arithmetic behind
    // q_pipeline_split / q_events_ab_lift must equal parseInt(hex, 16)
    import spark.implicits._
    for (ids <- samples(Gen.listOfN(64, Gen.chooseNum(Long.MinValue, Long.MaxValue)), 3)) {
      ids.toDF("doc_id").createOrReplaceTempView("documents")
      val h = "md5(CAST(doc_id AS STRING))"
      val arith = (0 until 4).map { i =>
        val mult = 1 << (4 * (3 - i))
        s"(instr('0123456789abcdef', substring($h, ${i + 1}, 1)) - 1) * $mult"
      }.mkString(" + ")
      val rows = spark.sql(
        s"SELECT doc_id, $h AS hex, ($arith) AS v FROM documents").collect()
      rows.foreach { r =>
        val expect = Integer.parseInt(r.getString(1).substring(0, 4), 16)
        assert(r.getInt(2) == expect, s"${r.getLong(0)} ${r.getString(1)}")
      }
    }
  }

  test("largest-remainder token budget == naive apportionment on random splits") {
    // q_pipeline_token_budget's ledger must sum to the budget EXACTLY and
    // match Hamilton's method computed naively, for arbitrary source
    // splits (including degenerate one-source and many-tiny-source mixes)
    import graft.operators.PipelineOps
    import spark.implicits._
    val srcGen = Gen.chooseNum(1, 12).flatMap { ns =>
      Gen.listOfN(60, Gen.chooseNum(0, ns - 1).flatMap(s =>
        Gen.chooseNum(1, 50).map(nw => (s"src$s", nw))))
    }
    for (docs <- samples(srcGen, 4)) {
      docs.zipWithIndex.map { case ((src, nw), i) =>
        (i.toLong, (0 until nw).map(_ => "w").mkString(" "), "en", src, 1L)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .createOrReplaceTempView("documents")
      val got = spark.sql(PipelineOps.tokenBudgetSql(
          toklen = "size(split(text, ' '))", idiv = "DIV"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
      assert(got.map(_._3).sum == 100000L, s"ledger != budget: $got")
      // naive Hamilton: floor quotas, then +1 by remainder rank (src tiebreak)
      val toks = docs.groupBy(_._1).view.mapValues(_.map(_._2.toLong).sum).toMap
      val total = toks.values.sum
      val floorQ = toks.view.mapValues(t => t * 100000L / total).toMap
      val leftover = 100000L - floorQ.values.sum
      val byRem = toks.toSeq
        .sortBy { case (s, t) => (-(t * 100000L % total), s) }.map(_._1)
      val bump = byRem.take(leftover.toInt).toSet
      val want = toks.keys.toList.sorted.map(s =>
        (s, toks(s), floorQ(s) + (if (bump(s)) 1L else 0L)))
      assert(got == want, s"got=$got\nwant=$want")
    }
  }

  test("star-contraction components == union-find on random and adversarial graphs") {
    import spark.implicits._
    val edgeGen: Gen[List[(Long, Long)]] = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
    } yield es
    val chain = (0L until 30L).map(i => (i, i + 1)).toList          // diameter-30 path
    val clique = (for (i <- 0L until 12L; j <- 0L until i) yield (i, j)).toList
    val twoComps = chain.map { case (a, b) => (a + 100, b + 100) } ++ clique
    val cases = (samples(edgeGen, 5).map(_.filter(e => e._1 != e._2)) ++
      Seq(chain, clique, twoComps)).filter(_.nonEmpty)
    for (es <- cases) {
      val got = graft.operators.TextOps.starContractLabels(es.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.flatMap(e => Seq(e._1, e._2)).distinct
      val want = nodes.groupBy(find).flatMap { case (_, ns) =>
        val m = ns.min; ns.map(_ -> m)
      }.toMap
      assert(got == want, s"edges=$es")
    }
  }

  test("frontier-BFS labels == naive BFS min-depths on random and adversarial graphs") {
    import spark.implicits._
    val caseGen: Gen[(List[(Long, Long)], List[Long])] = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 70)
      es <- Gen.listOfN(m, Gen.zip(Gen.chooseNum(0L, n - 1L), Gen.chooseNum(0L, n - 1L)))
      ns <- Gen.chooseNum(1, 3)
      seeds <- Gen.listOfN(ns, Gen.chooseNum(0L, n - 1L))
    } yield (es, seeds)
    val chain = ((0L until 30L).map(i => (i, i + 1)).toList, List(0L))    // 30 rounds deep
    val cycle = ((0L until 12L).map(i => (i, (i + 1) % 12)).toList, List(3L))
    val diamond = (List((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)), List(0L))
    val twoIslands = (chain._1 ++ List((100L, 101L)), List(0L, 100L))
    val unreachable = (List((5L, 6L), (7L, 8L)), List(5L))                // 7,8 never reached
    for ((es, seeds) <- samples(caseGen, 5) ++
           Seq(chain, cycle, diamond, twoIslands, unreachable)) {
      val got = graft.operators.TextOps.reachLabels(
          es.toDF("src", "dst"), seeds.toDF("node"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      // naive BFS reference (directed, multi-seed, min depth)
      val adj = es.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val depth = scala.collection.mutable.Map[Long, Int]()
      seeds.distinct.foreach(sd => depth(sd) = 0)
      var front = seeds.distinct
      var d = 0
      while (front.nonEmpty) {
        d += 1
        front = front.flatMap(u => adj.getOrElse(u, Nil)).distinct
          .filterNot(depth.contains)
        front.foreach(v => depth(v) = d)
      }
      assert(got == depth.toMap, s"edges=$es seeds=$seeds")
    }
  }

  test("distributed SSSP == naive Dijkstra on random weighted graphs") {
    import spark.implicits._
    val caseGen: Gen[(List[(Long, Long, Long)], List[Long])] = for {
      n <- Gen.chooseNum(2, 30)
      m <- Gen.chooseNum(1, 60)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n - 1L); b <- Gen.chooseNum(0L, n - 1L)
        w <- Gen.chooseNum(1L, 9L)
      } yield (a, b, w))
      seeds <- Gen.listOfN(2, Gen.chooseNum(0L, n - 1L))
    } yield (es, seeds)
    // adversarial: a long cheap detour beating a short expensive hop
    val detour = ((0L until 10L).map(i => (i, i + 1, 1L)).toList :+ (0L, 10L, 100L), List(0L))
    val zeroIsh = (List((0L, 1L, 1L), (1L, 2L, 1L), (0L, 2L, 3L), (2L, 0L, 1L)), List(0L))
    for ((es, seeds) <- samples(caseGen, 5) ++ Seq(detour, zeroIsh)) {
      val got = graft.operators.TextOps.ssspLabels(
          es.toDF("src", "dst", "w"), seeds.toDF("node"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // naive Dijkstra (multi-seed, directed)
      val adj = es.groupBy(_._1).view.mapValues(_.map(e => (e._2, e._3))).toMap
      val distm = scala.collection.mutable.Map[Long, Long]()
      val pq = scala.collection.mutable.PriorityQueue[(Long, Long)]()(
        Ordering.by[(Long, Long), Long](_._1).reverse)
      seeds.distinct.foreach { sd => distm(sd) = 0L; pq.enqueue((0L, sd)) }
      while (pq.nonEmpty) {
        val (d, u) = pq.dequeue()
        if (distm(u) == d)
          adj.getOrElse(u, Nil).foreach { case (v, w) =>
            if (distm.get(v).forall(_ > d + w)) { distm(v) = d + w; pq.enqueue((d + w, v)) }
          }
      }
      assert(got == distm.toMap, s"edges=$es seeds=$seeds")
    }
  }

  test("KS statement == naive ECDF max-gap on random samples") {
    import spark.implicits._
    val vGen = Gen.chooseNum(0, 99999).map(_ / 100.0)
    val evGen = Gen.listOfN(120,
      Gen.zip(vGen, Gen.oneOf("click", "purchase", "view")))
    for (ev <- samples(evGen, 4)) {
      ev.zipWithIndex.map { case ((v, t), i) => (i.toLong, v, t) }
        .toDF("event_id", "value", "event_type")
        .createOrReplaceTempView("events")
      val r = spark.sql(graft.operators.AggOps.ksTestSql).collect()(0)
      val a = ev.filter(_._2 == "click").map(_._1).sorted
      val b = ev.filter(_._2 == "purchase").map(_._1).sorted
      val pooled = (a ++ b).distinct.sorted
      val d = pooled.map { v =>
        math.abs(a.count(_ <= v).toDouble / a.length -
          b.count(_ <= v).toDouble / b.length)
      }.max
      assert(r.getLong(0) == a.length && r.getLong(1) == b.length)
      assert(math.abs(r.getDouble(2) - d) < 1e-6,
        s"ks_d ${r.getDouble(2)} vs naive $d")
    }
  }
}
