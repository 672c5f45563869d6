package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** T8 — scalar function surface: string / date / math / array / map / JSON /
  * explode (SURVEY §2 T8). One consolidated query per family so the oracle
  * checks the whole family cell-by-cell.
  *
  * Cross-engine type parity: Spark int-returning functions (length, instr,
  * year, ...) are cast to BIGINT to match DuckDB's natural result types;
  * transcendental functions (exp/ln/log10/pow) are rounded to 6 dp because
  * libm implementations may differ in the last ulp (SURVEY §A-3.4). All of
  * this stays inside whole-stage codegen — no UDFs.
  */
object FnOps {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fn_string" -> ((s, sf) =>
      Tables.documents(s, sf)
        .select(
          col("doc_id"),
          upper(substring(col("text"), 1, 12)).as("up12"),
          length(col("text")).cast(LongType).as("len"),
          concat_ws("|", col("lang"), col("source")).as("tag"),
          replace(substring(col("text"), 1, 20), lit(" "), lit("_")).as("und"),
          regexp_replace(substring(col("text"), 1, 30), "[aeiou]", "*").as("vow"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          lpad(col("n_chars").cast(StringType), 6, "0").as("pad"),
          instr(col("text"), "spark").cast(LongType).as("pos_spark"),
          levenshtein(col("lang"), lit("en")).cast(LongType).as("lev_en"),
          trim(concat(lit(" "), col("lang"), lit(" "))).as("trimmed"))
        .orderBy("doc_id")),

    // Binary encode/decode + cryptographic hash family. hex is uppercase in
    // both engines; base64 is unchunked RFC 4648; the unhex→decode
    // round-trip proves bytes survive both directions.
    "q_fn_encode" -> ((s, sf) =>
      Tables.documents(s, sf)
        .select(
          col("doc_id"),
          base64(substring(col("text"), 1, 8).cast(BinaryType)).as("b64"),
          hex(substring(col("text"), 1, 4).cast(BinaryType)).as("hx"),
          decode(unhex(hex(substring(col("text"), 1, 4).cast(BinaryType))), "UTF-8").as("rt"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"))
        .orderBy("doc_id")),

    "q_fn_date" -> ((s, sf) =>
      Tables.orders(s, sf)
        .select(
          col("o_orderkey"),
          date_trunc("day", col("o_orderdate")).as("od_day"),
          year(col("o_orderdate")).cast(LongType).as("yr"),
          month(col("o_orderdate")).cast(LongType).as("mo"),
          dayofweek(col("o_orderdate")).cast(LongType).as("dow"),
          hour(col("o_orderdate")).cast(LongType).as("hr"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          to_date(col("o_orderdate")).as("d"),
          date_add(to_date(col("o_orderdate")), 30).as("d30"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast(DateType))
            .cast(LongType).as("days_since_95"),
          make_timestamp(lit(1999), lit(12), lit(31), lit(23), lit(59), lit(59)).as("mk"))
        .orderBy("o_orderkey")),

    "q_fn_math" -> ((s, sf) =>
      Tables.lineitem(s, sf)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") / 7, 2).as("r2"),
          floor(col("l_extendedprice")).as("flr"),
          ceil(col("l_extendedprice")).as("cl"),
          abs(col("l_discount") - 0.05).as("ab"),
          round(pow(col("l_quantity"), 2), 6).as("p2"),
          round(sqrt(col("l_extendedprice")), 6).as("sq"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(log10(col("l_extendedprice")), 6).as("lg10"),
          pmod(col("l_orderkey") - 3, lit(7)).as("pm"),
          signum(col("l_discount") - 0.05).cast(LongType).as("sg"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_tax") * 100).as("ls"))
        // (l_orderkey, l_linenumber) is not unique: order by the full
        // emitted list so ties are identical rows (hash-order-proof)
        .orderBy("l_orderkey", "l_linenumber", "r2", "flr", "cl", "ab", "p2",
          "sq", "ex", "lg", "lg10", "pm", "sg", "gr", "ls")),

    // NaN handling with an explicit NaN literal (engines disagree on which
    // expressions *produce* NaN, but agree on NaN semantics once present).
    "q_fn_conditional" -> ((s, sf) =>
      Tables.events(s, sf)
        .withColumn("maybe_nan",
          when(col("value") < 300.0, expr("CAST('NaN' AS DOUBLE)")).otherwise(col("value")))
        .select(
          col("event_id"),
          coalesce(nullif(col("event_type"), lit("click")), lit("<clicked>")).as("c1"),
          when(col("maybe_nan").isNaN, "is-nan").otherwise("finite").as("nan_check"),
          nanvl(col("maybe_nan"), lit(-1.0)).as("nan_defaulted"),
          greatest(col("value"), col("user_id").cast(DoubleType)).as("g"),
          least(col("value"), col("user_id").cast(DoubleType)).as("l"))
        .orderBy("event_id")),

    "q_fn_array" -> ((s, sf) =>
      Tables.documents(s, sf)
        .withColumn("toks", split(col("text"), " "))
        .select(
          col("doc_id"),
          size(col("toks")).cast(LongType).as("n_toks"),
          array_contains(col("toks"), "spark").as("has_spark"),
          concat_ws(",", sort_array(array_distinct(col("toks")))).as("uniq"),
          element_at(col("toks"), 3).as("third"),
          concat_ws(",", slice(col("toks"), 2, 3)).as("s2_4"),
          concat_ws(",", transform(slice(col("toks"), 1, 5), x => upper(x))).as("up5"),
          expr("CAST(aggregate(transform(toks, x -> length(x)), 0, (a, x) -> a + x) AS BIGINT)")
            .as("total_len"),
          concat_ws(",",
            zip_with(slice(col("toks"), 1, 3),
              transform(slice(col("toks"), 1, 3), x => length(x)),
              (x, y) => concat(x, lit("#"), y.cast(StringType)))).as("zipped"),
          concat_ws(",", flatten(array(slice(col("toks"), 1, 2), slice(col("toks"), 3, 2))))
            .as("flat4"))
        .orderBy("doc_id")),

    "q_fn_map" -> ((s, sf) =>
      Tables.events(s, sf)
        .withColumn("m", from_json(col("props"), MapType(StringType, IntegerType)))
        .select(
          col("event_id"),
          concat_ws(",", map_keys(col("m"))).as("ks"),
          element_at(col("m"), "k").as("k_val"),
          element_at(map_values(col("m")), 1).as("v1"),
          element_at(
            map_from_entries(array(struct(lit("t"), col("event_type")))), "t").as("t_val"))
        .orderBy("event_id")),

    "q_fn_json" -> ((s, sf) =>
      Tables.events(s, sf)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k_int"),
          to_json(struct(col("event_id"), col("event_type"))).as("j"))
        .orderBy("event_id")),

    // XML surface (built into Spark 4's sql module — no external package):
    // to_xml serializes a struct to an XML record (entity-escaping the
    // payload), from_xml parses it back against a schema, and a second
    // hand-assembled record exercises the `_`-prefixed ATTRIBUTE path.
    // The oracle recomputes every output from the SOURCE columns, so the
    // row only matches if the escape→parse round trip is lossless —
    // `props` is JSON (quotes, braces) and `marked` injects <, > and &
    // on purpose.
    "q_fn_xml" -> ((s, sf) =>
      Tables.events(s, sf)
        .withColumn("marked", concat(col("event_type"), lit(" <tag> & co")))
        .withColumn("xml",
          to_xml(struct(col("user_id").as("u"), col("marked").as("t"),
            col("props").as("p"))))
        .withColumn("back",
          from_xml(col("xml"), StructType(Seq(
            StructField("u", LongType), StructField("t", StringType),
            StructField("p", StringType)))))
        .withColumn("attr",
          from_xml(
            concat(lit("<e id=\""), col("event_id"), lit("\"><v>"), col("user_id"),
              lit("</v></e>")),
            StructType(Seq(StructField("_id", LongType), StructField("v", LongType)))))
        .select(col("event_id"),
          col("back.u").as("u"), col("back.t").as("t"), col("back.p").as("p"),
          col("attr._id").as("attr_id"), col("attr.v").as("v"))
        .orderBy("event_id")),

    "q_explode" -> ((s, sf) =>
      Tables.documents(s, sf)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "word")))
        .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"), col("word"))
        .orderBy("doc_id", "pos")),

    // struct family: create, field access, nesting, array-of-struct
    // element access — nested data is how log/event payloads arrive.
    "q_fn_struct" -> ((s, sf) =>
      Tables.orders(s, sf)
        .withColumn("st", struct(col("o_orderstatus").as("status"),
          col("o_totalprice").as("price")))
        .withColumn("nested", struct(col("o_orderkey").as("k"), col("st").as("inner")))
        .withColumn("arr", array(col("st"), col("st")))
        .select(
          col("o_orderkey"),
          col("st.status").as("status"),
          round(col("nested.inner.price"), 2).as("price2"),
          element_at(col("arr"), 2).getField("status").as("arr_status"),
          size(col("arr")).cast(LongType).as("n_arr"))
        .orderBy("o_orderkey")),

    // regexp family beyond rlike-search: first-group extract, extract-all,
    // count, and backreference-free masking replace.
    "q_fn_regexp" -> ((s, sf) =>
      Tables.documents(s, sf)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([a-z]+) ([a-z]+)", 2).as("second_word"),
          concat_ws(",", expr("regexp_extract_all(text, '[a-z]{7,}', 0)")).as("long_words"),
          expr("regexp_count(text, 'the')").cast(LongType).as("n_the"),
          regexp_replace(col("text"), "[aeiou]", "_").as("masked"))
        .orderBy("doc_id")),

    // Spark 4 VARIANT: schema-on-read semi-structured access — parse once,
    // extract typed fields lazily; the 100 TB answer to "props has no
    // fixed schema". Emitted as concrete types (the binary variant itself
    // is engine-private); DuckDB mirrors with json_extract.
    "q_fn_variant" -> ((s, sf) =>
      Tables.events(s, sf)
        .withColumn("v", parse_json(col("props")))
        .select(
          col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing', 'string')").isNull.as("miss_null"))
        .orderBy("event_id")),

    // bitwise family: AND/OR/XOR/NOT, shifts, popcount — the primitives
    // under the bitmap set-similarity operators, exposed as a first-class
    // scalar surface.
    "q_fn_bitwise" -> ((s, sf) =>
      Tables.orders(s, sf)
        .select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("b_and"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("b_or"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("b_xor"),
          bitwise_not(col("o_orderkey")).as("b_not"),
          shiftleft(col("o_orderkey"), 3).as("b_shl"),
          shiftright(col("o_orderkey"), 2).as("b_shr"),
          bit_count(col("o_orderkey")).cast(LongType).as("b_pop"))
        .orderBy("o_orderkey")),

    // URL dissection: parse_url on Spark (codegen'd built-in); the oracle
    // mirrors the same fields with plain regexes — values, not engines,
    // are what's compared. URLs are derived deterministically from order
    // rows so the query runs on the stock corpus.
    "q_fn_url" -> ((s, sf) =>
      Tables.orders(s, sf)
        .withColumn("url",
          // '4-NOT SPECIFIED' has a space → would make the URI invalid
          concat(lit("https://logs.example.com/"), translate(col("o_orderpriority"), " ", "_"),
            lit("/order?id="), col("o_orderkey"), lit("&seg="), col("o_orderstatus")))
        .select(
          col("o_orderkey"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("QUERY"), lit("seg")).as("seg"))
        .orderBy("o_orderkey")),

    // IP dissection + subnet math over a synthesized address column (the
    // same derive-from-fact-table pattern as q_fn_url): octet split,
    // RFC-1918 private classification, numeric form for range predicates,
    // and the /24 rollup a log analyzer groups attack sources by. All
    // per-row integer/string work on one scan; the /24 aggregate is an
    // ordinary hash agg on the derived subnet key.
    "q_fn_ip" -> ((s, sf) =>
      Tables.events(s, sf)
        .withColumn("ip", concat_ws(".",
          pmod(col("user_id"), lit(223)) + lit(1),
          pmod(col("event_id"), lit(256)),
          pmod(col("user_id") * lit(7), lit(256)),
          pmod(col("event_id") * lit(13), lit(256))))
        .select(
          col("event_id"), col("ip"),
          split(col("ip"), "\\.").getItem(0).cast(LongType).as("o1"),
          split(col("ip"), "\\.").getItem(1).cast(LongType).as("o2"),
          split(col("ip"), "\\.").getItem(2).cast(LongType).as("o3"),
          split(col("ip"), "\\.").getItem(3).cast(LongType).as("o4"))
        .select(
          col("event_id"), col("ip"),
          (col("o1") * 16777216L + col("o2") * 65536L + col("o3") * 256L + col("o4"))
            .as("ip_num"),
          (col("o1") === 10L ||
            (col("o1") === 172L && col("o2").between(16L, 31L)) ||
            (col("o1") === 192L && col("o2") === 168L)).as("is_private"),
          concat(col("o1"), lit("."), col("o2"), lit("."), col("o3"), lit(".0/24"))
            .as("subnet24"))
        .orderBy("event_id")),

    // Data masking (`mask()`): the column-level redaction primitive —
    // uppercase→X, lowercase→x, digit→n, punctuation kept — applied to
    // name and phone. Complements q_text_pii_mask (regex span redaction)
    // with the whole-column form a warehouse applies to restricted
    // columns. Pure projection, one scan.
    "q_fn_mask" -> ((s, sf) =>
      Tables.customer(s, sf)
        .withColumn("phone", concat(
          pmod(col("c_custkey"), lit(90)) + lit(10), lit("-"),
          lpad(pmod(col("c_custkey") * 7, lit(1000)).cast("string"), 3, "0"), lit("-"),
          lpad(pmod(col("c_custkey") * 13, lit(10000)).cast("string"), 4, "0")))
        .select(
          col("c_custkey"),
          mask(col("c_name")).as("name_masked"),
          mask(col("phone")).as("phone_masked"),
          mask(col("phone"), lit("X"), lit("x"), lit("#"), lit("-")).as("phone_hash"))
        .orderBy("c_custkey")),

    // The try_* ANSI-safe family: Spark 4 runs ANSI mode, where division
    // by zero / bad casts / long overflow THROW — at 100 TB one malformed
    // row must not kill a 6-hour job, so production arithmetic uses the
    // try_ forms that yield NULL instead. DuckDB's native semantics
    // (NULL on div-0, TRY_CAST, out-of-range list_extract, try_strptime)
    // mirror each column exactly; the overflow column's oracle states the
    // only non-overflowing case directly.
    "q_fn_try" -> ((s, sf) =>
      Tables.events(s, sf)
        .select(
          col("event_id"),
          expr("try_divide(CAST(user_id AS BIGINT), CAST(user_id % 5 AS BIGINT))").as("safe_div"),
          expr("try_cast(event_type AS INT)").as("bad_int"),
          expr("try_element_at(split(event_type, '_'), 1)").as("seg1"),
          expr("try_element_at(split(event_type, '_'), 5)").as("seg_oob"),
          expr("try_to_timestamp(event_type, 'yyyy-MM-dd')").as("bad_ts"),
          expr("try_add(9223372036854775807L, event_id)").as("ovf"))
        .orderBy("event_id")),

    // Spark 4 COLLATIONS: case-insensitive grouping via the UTF8_LCASE
    // collation instead of lower()-normalizing — collation-aware
    // comparison keeps the ORIGINAL strings (display, downstream joins)
    // while grouping/equality ignore case, and under codegen it avoids
    // materializing a lowered copy of a 100 TB column. The group key is
    // emitted as min(original) because the collated key itself would pick
    // an arbitrary case representative; the oracle states the equivalent
    // lower()-keyed aggregation.
    "q_fn_collate" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events_coll")
      s.sql(
        """WITH m AS (
          |  SELECT event_id,
          |    CASE WHEN event_id % 2 = 0 THEN upper(event_type)
          |         ELSE event_type END AS et
          |  FROM events_coll)
          |SELECT min(et) AS et_repr, count(*) AS n,
          |  CAST(count(IF(et = collate('click', 'UTF8_LCASE'), 1, NULL)) AS BIGINT)
          |    AS n_click_ci
          |FROM m GROUP BY collate(et, 'UTF8_LCASE')
          |ORDER BY et_repr""".stripMargin)
    }),

    // Calendar arithmetic beyond q_fn_date's basics: end-of-month
    // clamping add_months, whole-month months_between (computed on
    // month-truncated dates so the fractional-day term is zero and the
    // DuckDB datediff('month') twin is exact), last_day, next_day
    // (stated in the oracle via the isodow offset formula), quarter and
    // ISO week/day-of-year. All per-row projection on one scan.
    "q_fn_date_arith" -> ((s, sf) =>
      Tables.orders(s, sf)
        .withColumn("d", to_date(col("o_orderdate")))
        .select(
          col("o_orderkey"), col("d"),
          add_months(col("d"), 3).as("plus3m"),
          months_between(trunc(col("d"), "MM"), lit("1995-01-01").cast("date"))
            .as("months_since_95"),
          last_day(col("d")).as("eom"),
          next_day(col("d"), "Monday").as("next_mon"),
          quarter(col("d")).as("qtr"),
          dayofyear(col("d")).as("doy"),
          weekofyear(col("d")).as("woy"))
        .orderBy("o_orderkey")),

    // The remaining GENERATOR surface in one normalized (key, value)
    // union: stack() row-expansion, inline() over an array of structs,
    // explode(str_to_map(...)) for string-encoded attribute bags, and
    // LATERAL VIEW OUTER explode — the null-preserving variant that keeps
    // parent rows whose array is empty (the outer-join of generators).
    // Spark allows one generator per select, hence the UNION ALL shape;
    // each branch is an embarrassingly-parallel row expansion.
    "q_fn_generators" -> ((s, sf) => {
      Tables.orders(s, sf).filter(col("o_orderkey") % 100 === 0)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("orders_gen")
      s.sql(
        """SELECT o_orderkey, 'stack' AS src, k, v FROM (
          |  SELECT o_orderkey,
          |    stack(2, 'price', CAST(round(o_totalprice, 2) AS STRING),
          |             'status', o_orderstatus) AS (k, v)
          |  FROM orders_gen)
          |UNION ALL
          |SELECT o_orderkey, 'inline' AS src, k, v FROM (
          |  SELECT o_orderkey, inline(array(
          |    named_struct('k', 'bucket', 'v', CAST(o_orderkey div 1000 AS STRING)),
          |    named_struct('k', 'parity', 'v', CAST(o_orderkey % 2 AS STRING)))) AS (k, v)
          |  FROM orders_gen)
          |UNION ALL
          |SELECT o_orderkey, 'map' AS src, k, v FROM (
          |  SELECT o_orderkey, explode(str_to_map(
          |    concat('id:', o_orderkey, ',st:', o_orderstatus), ',', ':')) AS (k, v)
          |  FROM orders_gen)
          |UNION ALL
          |SELECT o_orderkey, 'outer' AS src, CAST(x AS STRING) AS k, 'seen' AS v
          |FROM orders_gen
          |LATERAL VIEW OUTER explode(
          |  CASE WHEN o_orderstatus = 'O' THEN array()
          |       ELSE array(1, 2) END) t AS x
          |ORDER BY o_orderkey, src, k, v""".stripMargin)
    }),

    // printf-style formatting + character-level string surface. Spark's
    // format_string and DuckDB's printf share the C format-spec language,
    // but their tie-break modes differ (Java Formatter HALF_UP vs fmt's
    // round-half-even), so %.3f is fed a PRE-QUANTIZED value: the portable
    // fixed-point floor(x·1000 + 0.5)/1000 (pure IEEE ops, identical in
    // both engines) snaps the double onto the millis grid, and a double
    // that close to a 3-decimal value is never at a formatting tie — the
    // formatter's rounding mode becomes unobservable. translate/repeat/
    // reverse/left/right/ascii/chr are name-and-semantics identical. Pure
    // per-row projection: narrow, codegen'd, parallel at any scale.
    "q_fn_format" -> ((s, sf) => {
      Tables.events(s, sf).createOrReplaceTempView("events")
      s.sql(
        """SELECT event_id,
          |  format_string('%05d|%.3f|%s', user_id,
          |                floor(value * 1000 + 0.5) / 1000, event_type) AS fmt,
          |  translate(event_type, 'aeiou', 'AEIOU') AS tr,
          |  repeat(substring(event_type, 1, 2), 3) AS rep,
          |  reverse(event_type) AS rev,
          |  ascii(event_type) AS ascii_c,
          |  chr(65 + CAST(user_id % 26 AS INT)) AS ch,
          |  left(event_type, 3) AS l3, right(event_type, 3) AS r3
          |FROM events ORDER BY event_id""".stripMargin)
    })
  )

  val oracle: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT doc_id,
        |  upper(substring(text, 1, 12)) AS up12,
        |  length(text) AS len,
        |  concat_ws('|', lang, source) AS tag,
        |  replace(substring(text, 1, 20), ' ', '_') AS und,
        |  regexp_replace(substring(text, 1, 30), '[aeiou]', '*', 'g') AS vow,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  lpad(CAST(n_chars AS VARCHAR), 6, '0') AS pad,
        |  instr(text, 'spark') AS pos_spark,
        |  levenshtein(lang, 'en') AS lev_en,
        |  trim(concat(' ', lang, ' ')) AS trimmed
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fn_encode" ->
      """SELECT doc_id,
        |  to_base64(encode(substring(text, 1, 8))) AS b64,
        |  hex(encode(substring(text, 1, 4))) AS hx,
        |  decode(unhex(hex(encode(substring(text, 1, 4))))) AS rt,
        |  md5(text) AS h_md5,
        |  sha256(text) AS h_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fn_date" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS od_day,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  hour(o_orderdate) AS hr,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(o_orderdate AS DATE) + 30 AS d30,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
        |  make_timestamp(1999, 12, 31, 23, 59, 59.0) AS mk
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice / 7, 2) AS r2,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS flr,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS cl,
        |  abs(l_discount - 0.05) AS ab,
        |  round(pow(l_quantity, 2), 6) AS p2,
        |  round(sqrt(l_extendedprice), 6) AS sq,
        |  round(exp(l_discount), 6) AS ex,
        |  round(ln(l_extendedprice), 6) AS lg,
        |  round(log10(l_extendedprice), 6) AS lg10,
        |  (((l_orderkey - 3) % 7) + 7) % 7 AS pm,
        |  CAST(sign(l_discount - 0.05) AS BIGINT) AS sg,
        |  greatest(l_quantity, l_discount * 100) AS gr,
        |  least(l_quantity, l_tax * 100) AS ls
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, r2, flr, cl, ab, p2, sq, ex, lg, lg10, pm, sg, gr, ls""".stripMargin,

    "q_fn_conditional" ->
      """WITH m AS (SELECT event_id, event_type, value, user_id,
        |  CASE WHEN value < 300.0 THEN CAST('NaN' AS DOUBLE) ELSE value END AS maybe_nan
        |  FROM events)
        |SELECT event_id,
        |  coalesce(nullif(event_type, 'click'), '<clicked>') AS c1,
        |  CASE WHEN isnan(maybe_nan) THEN 'is-nan' ELSE 'finite' END AS nan_check,
        |  CASE WHEN isnan(maybe_nan) THEN -1.0 ELSE maybe_nan END AS nan_defaulted,
        |  greatest(value, CAST(user_id AS DOUBLE)) AS g,
        |  least(value, CAST(user_id AS DOUBLE)) AS l
        |FROM m ORDER BY event_id""".stripMargin,

    "q_fn_array" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_toks,
        |  list_contains(toks, 'spark') AS has_spark,
        |  array_to_string(list_sort(list_distinct(toks)), ',') AS uniq,
        |  toks[3] AS third,
        |  array_to_string(list_slice(toks, 2, 4), ',') AS s2_4,
        |  array_to_string(list_transform(list_slice(toks, 1, 5), x -> upper(x)), ',') AS up5,
        |  CAST(list_aggregate(list_transform(toks, x -> length(x)), 'sum') AS BIGINT) AS total_len,
        |  array_to_string(list_transform(
        |    list_zip(list_slice(toks, 1, 3),
        |             list_transform(list_slice(toks, 1, 3), x -> length(x))),
        |    p -> p[1] || '#' || CAST(p[2] AS VARCHAR)), ',') AS zipped,
        |  array_to_string(flatten([list_slice(toks, 1, 2), list_slice(toks, 3, 4)]), ',') AS flat4
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_fn_map" ->
      """SELECT event_id,
        |  array_to_string(json_keys(props), ',') AS ks,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS v1,
        |  event_type AS t_val
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_json" ->
      """SELECT event_id,
        |  json_extract_string(props, '$.k') AS k_str,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  to_json(struct_pack(event_id := event_id, event_type := event_type)) AS j
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_xml" ->
      """SELECT event_id,
        |  user_id AS u,
        |  event_type || ' <tag> & co' AS t,
        |  props AS p,
        |  event_id AS attr_id,
        |  user_id AS v
        |FROM events ORDER BY event_id""".stripMargin,

    "q_explode" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
        |  unnest(toks) AS word
        |FROM t ORDER BY doc_id, pos""".stripMargin,

    "q_fn_struct" ->
      """WITH t AS (SELECT o_orderkey,
        |  {'status': o_orderstatus, 'price': o_totalprice} AS st
        |  FROM orders),
        |n AS (SELECT o_orderkey, st, {'k': o_orderkey, 'inner': st} AS nested,
        |        [st, st] AS arr FROM t)
        |SELECT o_orderkey,
        |  st.status AS status,
        |  round(nested.inner.price, 2) AS price2,
        |  arr[2].status AS arr_status,
        |  CAST(len(arr) AS BIGINT) AS n_arr
        |FROM n ORDER BY o_orderkey""".stripMargin,

    "q_fn_regexp" ->
      """SELECT doc_id,
        |  regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
        |  COALESCE(array_to_string(regexp_extract_all(text, '[a-z]{7,}', 0), ','), '') AS long_words,
        |  CAST(len(regexp_extract_all(text, 'the', 0)) AS BIGINT) AS n_the,
        |  regexp_replace(text, '[aeiou]', '_', 'g') AS masked
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
        |  json_extract_string(props, '$.k') AS k_str,
        |  json_extract_string(props, '$.missing') IS NULL AS miss_null
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_bitwise" ->
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS b_and,
        |  o_orderkey | 4096 AS b_or,
        |  xor(o_orderkey, o_custkey) AS b_xor,
        |  ~o_orderkey AS b_not,
        |  o_orderkey << 3 AS b_shl,
        |  o_orderkey >> 2 AS b_shr,
        |  CAST(bit_count(o_orderkey) AS BIGINT) AS b_pop
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_fn_url" ->
      """WITH u AS (SELECT o_orderkey,
        |  'https://logs.example.com/' || replace(o_orderpriority, ' ', '_')
        |    || '/order?id=' || CAST(o_orderkey AS VARCHAR)
        |    || '&seg=' || o_orderstatus AS url
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_extract(url, '^https://([^/]+)', 1) AS host,
        |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, '\?(.*)$', 1) AS query,
        |  regexp_extract(url, '[?&]seg=([^&]*)', 1) AS seg
        |FROM u ORDER BY o_orderkey""".stripMargin,

    "q_fn_ip" ->
      """WITH ipt AS (
        |  SELECT event_id,
        |    user_id % 223 + 1 AS o1, event_id % 256 AS o2,
        |    (user_id * 7) % 256 AS o3, (event_id * 13) % 256 AS o4
        |  FROM events)
        |SELECT event_id,
        |  CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.' ||
        |    CAST(o3 AS VARCHAR) || '.' || CAST(o4 AS VARCHAR) AS ip,
        |  o1 * 16777216 + o2 * 65536 + o3 * 256 + o4 AS ip_num,
        |  (o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
        |    OR (o1 = 192 AND o2 = 168)) AS is_private,
        |  CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.' ||
        |    CAST(o3 AS VARCHAR) || '.0/24' AS subnet24
        |FROM ipt ORDER BY event_id""".stripMargin,

    "q_fn_mask" ->
      """WITH p AS (SELECT c_custkey, c_name,
        |    CAST(c_custkey % 90 + 10 AS VARCHAR) || '-' ||
        |    lpad(CAST((c_custkey * 7) % 1000 AS VARCHAR), 3, '0') || '-' ||
        |    lpad(CAST((c_custkey * 13) % 10000 AS VARCHAR), 4, '0') AS phone
        |  FROM customer)
        |SELECT c_custkey,
        |  regexp_replace(regexp_replace(regexp_replace(c_name,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS name_masked,
        |  regexp_replace(regexp_replace(regexp_replace(phone,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g') AS phone_masked,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(phone,
        |    '[^A-Za-z0-9]', '-', 'g'),
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', '#', 'g') AS phone_hash
        |FROM p ORDER BY c_custkey""".stripMargin,

    "q_fn_try" ->
      """SELECT event_id,
        |  CAST(user_id AS BIGINT) / CAST(user_id % 5 AS BIGINT) AS safe_div,
        |  TRY_CAST(event_type AS INT) AS bad_int,
        |  list_extract(string_split(event_type, '_'), 1) AS seg1,
        |  list_extract(string_split(event_type, '_'), 5) AS seg_oob,
        |  try_strptime(event_type, '%Y-%m-%d') AS bad_ts,
        |  CASE WHEN event_id = 0 THEN CAST(9223372036854775807 AS BIGINT) END AS ovf
        |FROM events ORDER BY event_id""".stripMargin,

    "q_fn_collate" ->
      """WITH m AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 2 = 0 THEN upper(event_type)
        |         ELSE event_type END AS et
        |  FROM events)
        |SELECT min(et) AS et_repr, count(*) AS n,
        |  CAST(count(CASE WHEN lower(et) = 'click' THEN 1 END) AS BIGINT)
        |    AS n_click_ci
        |FROM m GROUP BY lower(et)
        |ORDER BY et_repr""".stripMargin,

    "q_fn_date_arith" ->
      """WITH b AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey, d,
        |  CAST(d + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  CAST(datediff('month', DATE '1995-01-01', date_trunc('month', d)) AS DOUBLE)
        |    AS months_since_95,
        |  last_day(d) AS eom,
        |  d + CAST(CASE WHEN (8 - isodow(d)) % 7 = 0 THEN 7
        |                ELSE (8 - isodow(d)) % 7 END AS INT) AS next_mon,
        |  CAST(quarter(d) AS INT) AS qtr,
        |  CAST(dayofyear(d) AS INT) AS doy,
        |  CAST(weekofyear(d) AS INT) AS woy
        |FROM b ORDER BY o_orderkey""".stripMargin,

    "q_fn_generators" ->
      """WITH og AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |            FROM orders WHERE o_orderkey % 100 = 0),
        |u AS (
        |  SELECT o_orderkey, 'stack' AS src, 'price' AS k,
        |    CAST(round(o_totalprice, 2) AS VARCHAR) AS v FROM og
        |  UNION ALL
        |  SELECT o_orderkey, 'stack', 'status', o_orderstatus FROM og
        |  UNION ALL
        |  SELECT o_orderkey, 'inline', 'bucket', CAST(o_orderkey // 1000 AS VARCHAR) FROM og
        |  UNION ALL
        |  SELECT o_orderkey, 'inline', 'parity', CAST(o_orderkey % 2 AS VARCHAR) FROM og
        |  UNION ALL
        |  SELECT o_orderkey, 'map', 'id', CAST(o_orderkey AS VARCHAR) FROM og
        |  UNION ALL
        |  SELECT o_orderkey, 'map', 'st', o_orderstatus FROM og
        |  UNION ALL
        |  SELECT o_orderkey, 'outer', NULL, 'seen' FROM og WHERE o_orderstatus = 'O'
        |  UNION ALL
        |  SELECT o_orderkey, 'outer', CAST(x AS VARCHAR), 'seen'
        |  FROM og, unnest([1, 2]) AS t(x) WHERE o_orderstatus <> 'O')
        |SELECT o_orderkey, src, k, v FROM u
        |ORDER BY o_orderkey, src, k, v""".stripMargin,

    "q_fn_format" ->
      """SELECT event_id,
        |  printf('%05d|%.3f|%s', user_id,
        |         floor(value * 1000 + 0.5) / 1000, event_type) AS fmt,
        |  translate(event_type, 'aeiou', 'AEIOU') AS tr,
        |  repeat(substring(event_type, 1, 2), 3) AS rep,
        |  reverse(event_type) AS rev,
        |  ascii(event_type) AS ascii_c,
        |  chr(65 + CAST(user_id % 26 AS INT)) AS ch,
        |  left(event_type, 3) AS l3, right(event_type, 3) AS r3
        |FROM events ORDER BY event_id""".stripMargin
  )
}
