package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator (SURVEY §2 inventory + the LLM-pipeline
  * extension surface) is exposed as a named query over the driver parquet
  * testdata; SQL-expressible ones carry a DuckDB oracle.
  */
object SparkEntry {

  /** All registered query specs, in evaluation order. */
  def specs: Seq[QuerySpec] =
    RelationalQueries.specs ++ ExtensionQueries.specs ++ EventQueries.specs ++
      ExtraQueries.specs ++ ExtensionQueries.extraSpecs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.ensureConfs(spark)
    specs.head.fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    specs.map(q => q.name -> { (s: SparkSession, d: String) =>
      GraftSession.ensureConfs(s); q.fn(s, d)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    specs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
