package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** The user-extension surface (SURVEY §2.2 "UDF/UDAF/UDTF" row).
  *
  * Design stance: the engine itself uses NO UDFs in any shipped operator
  * (every hot path is Catalyst expressions or the native [[DotProductD]]).
  * These are the documented escape hatches a *user* of the engine gets,
  * with the cost model spelled out: a Scala UDF breaks WholeStageCodegen
  * and serializes per row — fine for prototyping, wrong for a 100 TB hot
  * path; an [[Aggregator]] is the right shape for custom aggregation
  * state (typed, partial-aggregable, shuffle = one buffer per group).
  */
object Udfs {

  /** Geometric mean — an aggregate Spark has no built-in for. Buffer is
    * (Σ ln x, n); merge is associative+commutative so map-side partial
    * aggregation applies, exactly like a built-in agg. */
  object GeometricMean extends Aggregator[Double, (Double, Long), Double] {
    override def zero: (Double, Long) = (0.0, 0L)
    override def reduce(b: (Double, Long), x: Double): (Double, Long) =
      if (x > 0) (b._1 + math.log(x), b._2 + 1) else b
    override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Long)): Double =
      if (b._2 == 0) Double.NaN else math.exp(b._1 / b._2)
    override def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Example scalar UDF (prototyping escape hatch — NOT used by any
    * shipped operator; see scaladoc above for why). */
  val slugify: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf { (s: String) =>
      if (s == null) null
      else s.toLowerCase.replaceAll("[^a-z0-9]+", "-").stripPrefix("-").stripSuffix("-")
    }

  /** Register the user-extension functions for SQL use. */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geometric_mean", udaf(GeometricMean))
    spark.udf.register("slugify", slugify)
    spark.udf.register("topk_terms", udaf(SpaceSaving.TopKAgg(64)))
  }
}
