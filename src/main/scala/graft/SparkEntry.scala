package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{FuzzyDedup, Multimodal, Q, Relational, TextOps, VectorOps}
import graft.streaming.StreamingOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Every implemented operator from SURVEY §2 (and the training-data
  * extensions) registers one entry in [[queries]]; SQL-expressible ones
  * also register a DuckDB oracle in [[oracleSql]].
  */
object SparkEntry {

  /** The full declared query surface. */
  def all: Seq[Q] =
    Relational.queries ++ TextOps.queries ++ FuzzyDedup.queries ++
      VectorOps.queries ++ Multimodal.queries ++ StreamingOps.queries

  /** Headline queries timed by Bench at sf0.1. */
  def headline: Seq[Q] = all.filter(_.headline)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
