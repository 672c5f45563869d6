package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cross-engine determinism helpers (SURVEY §A-3).
  *
  * The correctness gate hash-compares our parquet output against a DuckDB
  * oracle, so every float-valued output must be bit-identical across engines.
  * Plain `sum(double)` is summation-order-dependent (partial aggregation over
  * shuffled partitions), so money/metric sums are computed as *exact decimal
  * sums* and only then emitted as doubles: the decimal sum is
  * order-independent, and decimal→double conversion is uniquely defined, so
  * both engines produce the same bits no matter the parallelism. This is
  * also the right call at 100 TB: partial aggregation (map-side combine)
  * still applies to decimal sums, and exactness is scale-independent.
  *
  * The oracle SQL twin of each helper is in [[OracleDet]] — keep in sync.
  */
object Det {
  /** Order-independent sum of a double column, emitted as double. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Deterministic average: exact decimal sum as double / count. */
  def davg(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType) / count(c)
}

/** SQL fragments mirroring [[Det]] for the DuckDB oracle strings. */
object OracleDet {
  def dsum(col: String, scale: Int = 4): String =
    s"CAST(SUM(CAST($col AS DECIMAL(30,$scale))) AS DOUBLE)"

  def davg(col: String, scale: Int = 6): String =
    s"CAST(SUM(CAST($col AS DECIMAL(30,$scale))) AS DOUBLE) / COUNT($col)"
}
