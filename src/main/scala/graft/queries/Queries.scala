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
      * the `<outDir>_aux/<name>/<auxName>/` SIBLING tree so the oracle
      * SQL can recompute the derived logic in DuckDB from them. Oracle
      * text keeps the stable token path `{OUT}/_aux/<name>/<auxName>`;
      * Verify re-roots the `{OUT}/_aux` prefix to the sibling before
      * substituting `{OUT}` itself. Used where the full pipeline hinges
      * on a Spark-only primitive (xxhash64) but everything downstream of
      * the exported intermediate is plain integer/list arithmetic both
      * engines share. Aux frames MUST live entirely outside `<outDir>`:
      * the driver's gate reads `<outDir>/<name>` RECURSIVELY (round-2
      * lesson — 7 aux-bearing queries failed with result+aux row counts)
      * and ENUMERATES `<outDir>` subdirs (round-3 lesson — a
      * `<outDir>/_aux` dir became a spurious `err` row in the gate).
      */
    aux: Seq[(String, (SparkSession, String) => DataFrame)] = Nil)

/** Table loaders. All testdata tables are one parquet file per table. */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events with `ts` normalized to the engine's canonical event-time
    * domain: BIGINT nanoseconds since epoch (exact integer arithmetic —
    * no double precision loss on ~1.7e18 values; all downstream logic
    * does `ts div 1000` to reach the µs domain DuckDB's `epoch_us`
    * sees).
    *
    * The driver's fixtures have shipped two physical encodings of `ts`:
    * TIMESTAMP(NANOS) through round 5 (Spark refuses it unless
    * `nanosAsLong` maps it to BIGINT nanos) and TIMESTAMP(MICROS) from
    * round 6 (reads as TIMESTAMP_NTZ — `nanosAsLong` no longer applies).
    * Engine-written event landings (streaming fixtures) carry the
    * canonical BIGINT directly. Normalizing HERE, adaptively on the
    * observed read schema, keeps every consumer on one exact integer
    * contract whichever encoding the files carry: µs instants scale by
    * ×1000 losslessly, and the NTZ→TIMESTAMP cast is instant-preserving
    * because every harness session pins UTC.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(t(spark, dir, "events"))
  }

  /** `ts` → BIGINT nanos whatever the physical type (see [[events]]). */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case _ => df.withColumn(
        "ts",
        org.apache.spark.sql.functions
          .expr("unix_micros(CAST(ts AS TIMESTAMP)) * 1000L"))
    }
}
