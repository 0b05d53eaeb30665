package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's surface: a Spark-first DataFrame build
  * plus (when SQL-expressible) an equivalent DuckDB oracle statement over
  * the same parquet tables. Oracle-less queries get the driver's weaker
  * rows-only check (builder contract).
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times at sf0.1 */
    headline: Boolean = false,
    /** Auxiliary deterministic intermediates exported by Verify into
      * `<outDir>/_aux/<name>/<auxName>/` so the oracle SQL can recompute
      * the derived logic in DuckDB from them (the `{OUT}` placeholder in
      * the oracle is substituted with the absolute outDir at dump time).
      * Used where the full pipeline hinges on a Spark-only primitive
      * (xxhash64) but everything downstream of the exported intermediate
      * is plain integer/list arithmetic both engines share. Aux frames
      * MUST live outside the query's own directory: the driver's gate
      * reads `<outDir>/<name>` RECURSIVELY, so anything under it is
      * hashed as part of the result (round-2 lesson — 7 aux-bearing
      * queries failed the driver with result+aux row counts).
      */
    aux: Seq[(String, (SparkSession, String) => DataFrame)] = Nil)

/** Table loaders. All testdata tables are one parquet file per table. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS) which Spark refuses by default;
    * with `nanosAsLong` it reads as BIGINT nanoseconds since epoch — all
    * event-time logic here works in exact integer nanos (no double
    * precision loss on ~1.7e18 values).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(spark, dir, "events")
  }
}
