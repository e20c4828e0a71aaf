package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables (SURVEY §5.3).
  *
  * Determinism contract (drives every implementation in this package):
  *  - column names identical between Spark result and oracle result
  *    (driver sorts columns by name before hashing);
  *  - no floating-point aggregation across engine-dependent orders:
  *    money-style sums go through exact DECIMAL(18,4) addends (bitwise
  *    reproducible in any order), averages divide an exact decimal sum by
  *    an exact count in double (single IEEE op, identical both engines);
  *  - integer-valued computed columns cast to BIGINT on both sides
  *    (Spark `year()` is INT, DuckDB's is BIGINT, etc.);
  *  - any LIMIT/top-k is totally ordered by a unique key suffix.
  */
final case class QuerySpec(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QuerySpec {
  /** Decimal type for exact money sums. Scale 6 matters: money inputs
    * carry 2 true decimals, so 3-factor products carry ≤6 — the cast
    * never rounds, sidestepping the Java-vs-C double→decimal midpoint
    * divergence (Java rounds the shortest string repr, DuckDB the exact
    * binary value). */
  val MoneyAddend = "decimal(18,6)"
  /** Final results leave as DOUBLE: the decimal sum is exact and
    * identical in both engines, and decimal→double is deterministic —
    * while decimal *outputs* would hit driver-side representation
    * mismatches (pyarrow Decimal vs DuckDB float64). */
  val MoneyResult = "double"
}
