package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4.2 / prompt: "salting for skew").
  *
  * AQE's skew-join splitting handles sort-merge joins automatically; the
  * salted join below is the explicit fallback for the cases AQE doesn't
  * cover (e.g. a hot key feeding a shuffled hash join or an aggregation
  * where one key holds a double-digit percentage of all rows — a "null
  * key" or "anonymous user" in log data at 100 TB).
  *
  * `saltedJoin(left, right, key, n)`: the skewed left side gets a random-
  * free deterministic salt in [0, n) derived from a high-cardinality
  * column; the small right side is exploded n× so every (key, salt) bucket
  * finds its match. Semantics are exactly an inner equi-join on `key`; the
  * hot key's rows now spread over n reducers instead of one.
  */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSrc: Column, n: Int): DataFrame = {
    val salted = left.withColumn("_salt", pmod(hash(saltSrc), lit(n)))
    val exploded = right.withColumn("_salt", explode(sequence(lit(0), lit(n - 1))))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
