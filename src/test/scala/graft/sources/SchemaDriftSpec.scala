package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard for the driver-generated testdata.
  *
  * The driver has regenerated `/root/testdata` between rounds and changed a
  * column's physical type once already (`events.ts`: parquet TIMESTAMP(NANOS)
  * → `timestamp[us]`, which silently broke 20 queries in round 7). This spec
  * turns the next such drift into a one-line diagnosis naming the table and
  * column instead of 20 opaque ANALYSIS errors.
  *
  * The spec is tolerant by design: it pins only the column NAMES and, for
  * columns the engine normalizes or depends on semantically, an ACCEPT-SET of
  * types (every shape `Tables` knows how to load). It does not pin exact
  * types for columns where any reasonable numeric/string shape would work —
  * that would turn benign driver changes into red rounds.
  */
class SchemaDriftSpec extends AnyFunSuite {
  import graft.TestSpark._

  private def raw(name: String) = Tables.read(spark, sf001, name)

  /** table → (column → acceptable raw read types). */
  private val expected: Map[String, Map[String, Set[DataType]]] = Map(
    "region"   -> Map("r_regionkey" -> Set(LongType, IntegerType), "r_name" -> Set(StringType)),
    "nation"   -> Map("n_nationkey" -> Set(LongType, IntegerType),
                      "n_regionkey" -> Set(LongType, IntegerType), "n_name" -> Set(StringType)),
    "customer" -> Map("c_custkey" -> Set(LongType, IntegerType),
                      "c_nationkey" -> Set(LongType, IntegerType)),
    "supplier" -> Map("s_suppkey" -> Set(LongType, IntegerType),
                      "s_nationkey" -> Set(LongType, IntegerType)),
    "part"     -> Map("p_partkey" -> Set(LongType, IntegerType)),
    "orders"   -> Map("o_orderkey" -> Set(LongType, IntegerType),
                      "o_custkey" -> Set(LongType, IntegerType),
                      "o_totalprice" -> Set(DoubleType, FloatType),
                      "o_orderdate" -> Set(DateType, TimestampType, TimestampNTZType)),
    "lineitem" -> Map("l_orderkey" -> Set(LongType, IntegerType),
                      "l_partkey" -> Set(LongType, IntegerType),
                      "l_quantity" -> Set(DoubleType, LongType, IntegerType),
                      "l_extendedprice" -> Set(DoubleType),
                      "l_shipdate" -> Set(DateType, TimestampType, TimestampNTZType)),
    // events.ts: every shape Tables.events can normalize (epoch-nanos long
    // under nanosAsLong, timestamp_ntz from timestamp[us], or timestamp).
    "events"   -> Map("event_id" -> Set(LongType, IntegerType),
                      "ts" -> Set(LongType, TimestampNTZType, TimestampType),
                      "user_id" -> Set(LongType, IntegerType),
                      "event_type" -> Set(StringType),
                      "value" -> Set(DoubleType),
                      "props" -> Set(StringType)),
    "documents" -> Map("doc_id" -> Set(LongType, IntegerType),
                       "source" -> Set(StringType), "text" -> Set(StringType)),
    "embeddings" -> Map("vec_id" -> Set(LongType, IntegerType),
                        "embedding" -> Set(ArrayType(FloatType, containsNull = true),
                                           ArrayType(FloatType, containsNull = false),
                                           ArrayType(DoubleType, containsNull = true),
                                           ArrayType(DoubleType, containsNull = false)))
  )

  test("driver testdata schemas match the tolerant spec (drift → named column)") {
    val drifted = for {
      (table, cols)    <- expected.toSeq
      schema            = raw(table).schema
      (col, accepted)  <- cols.toSeq
      problem          <- schema.find(_.name == col) match {
                            case None    => Some(s"$table.$col: column MISSING (have: ${schema.fieldNames.mkString(",")})")
                            case Some(f) if !accepted.contains(f.dataType) =>
                              Some(s"$table.$col: read as ${f.dataType.simpleString}, " +
                                s"expected one of {${accepted.map(_.simpleString).mkString(", ")}}")
                            case _       => None
                          }
    } yield problem
    assert(drifted.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — update graft.sources.Tables loaders:\n  ${drifted.mkString("\n  ")}")
  }

  test("Tables.events normalizes ts to TimestampType for every observed shape") {
    val df = Tables.events(spark, sf001)
    assert(df.schema("ts").dataType == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${df.schema("ts").dataType}")
    assert(df.count() > 0)
  }
}
