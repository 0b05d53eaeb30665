package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomAgg

/** Downstream-query pruning index for a CONVERTED capture (round 15,
  * verdict #6). The reference's real consumer runs arbitrary SQL over
  * the emitted parquet (reference README.md:92), and its canonical
  * dissector queries are "slice one attack window" (a frame_time range)
  * and "one source/one reflector" (an ip_src/ip_dst point lookup). A
  * bare parquet directory makes every such query scan every part file;
  * this manifest records, per part file:
  *
  *   - a frame_time ZONE MAP (min/max µs) — range pruning; converts
  *     emit time-ordered captures, so windows map to few files;
  *   - ip_src and ip_dst BLOOMS (over Spark's `xxhash64` of the string,
  *     [[BloomAgg]]-sized from the observed distinct-count) — point
  *     pruning where [min,max] boxes can't help.
  *
  * Written as `_graft_convert_manifest` INSIDE the output directory —
  * `_`-prefixed files are metadata to every parquet reader (Spark,
  * DuckDB's glob excludes nothing but the reference consumer reads
  * `*.parquet`), so the directory stays a plain parquet dataset for
  * consumers that ignore the manifest. [[slice]] applies the SAME
  * predicates after pruning, so a pruned read is exactly a filtered
  * full read (files pruned are only those that CANNOT match — pinned by
  * spec); a missing/corrupt manifest degrades to the full scan, never
  * an error.
  *
  * Scale: the manifest is one driver-read text file (entries ≈ part
  * files); the build is two aggregate jobs over the output (stats, then
  * ndv-sized blooms) — the same cost class as the convert's own stats
  * pass, opt-in via the CLI's `-m`.
  */
object ConvertManifest {
  val FileName = "_graft_convert_manifest"

  final case class Entry(name: String, rows: Long, tsMin: Long, tsMax: Long,
      srcBloom: Array[Long], dstBloom: Array[Long])

  /** Build + write the manifest for a convert output directory. Returns
    * the number of part files indexed.
    */
  def build(spark: SparkSession, dir: String): Int = {
    val df = spark.read.parquet(dir)
    val withFile = df.select(
      expr("_metadata.file_name").as("__f"),
      unix_micros(col("frame_time").cast("timestamp")).as("__ts"),
      col("ip_src"), col("ip_dst"))
    // pass 1: per-file zone map + the ndv that sizes the blooms
    val stats = withFile.groupBy(col("__f")).agg(
      count(lit(1)).as("rows"),
      min(col("__ts")).as("tsMin"), max(col("__ts")).as("tsMax"),
      approx_count_distinct(col("ip_src")).as("srcNdv"),
      approx_count_distinct(col("ip_dst")).as("dstNdv")).collect()
    if (stats.isEmpty) return 0
    val maxNdv = stats.iterator.map(r =>
      math.max(r.getLong(4), r.getLong(5))).max
    val bits = BloomAgg.sizeBits(maxNdv)
    // pass 2: per-file blooms at the shared size (one size per manifest
    // keeps the file a flat table; the pow-2 probe derives m per filter)
    val blooms = withFile.groupBy(col("__f")).agg(
      BloomAgg.bloom_agg(xxhash64(col("ip_src")), bits).as("srcB"),
      BloomAgg.bloom_agg(xxhash64(col("ip_dst")), bits).as("dstB"))
      .collect().map(r => r.getString(0) ->
        (r.getSeq[Long](1).toArray, r.getSeq[Long](2).toArray)).toMap
    val entries = stats.map { r =>
      val f = r.getString(0)
      val (sb, db) = blooms(f)
      Entry(f, r.getLong(1), r.getLong(2), r.getLong(3), sb, db)
    }.sortBy(_.name)
    val b64 = java.util.Base64.getEncoder
    val body = (Seq(s"graft-convert-manifest v1", s"bloomBits=$bits") ++
      entries.map { e =>
        def enc(w: Array[Long]): String = {
          val bb = java.nio.ByteBuffer.allocate(8 * w.length)
          w.foreach(bb.putLong)
          b64.encodeToString(bb.array())
        }
        s"file\t${e.name}\t${e.rows}\t${e.tsMin}\t${e.tsMax}\t${enc(e.srcBloom)}\t${enc(e.dstBloom)}"
      }).mkString("", "\n", "\n")
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir, FileName)
    val fs = p.getFileSystem(hconf)
    val out = fs.create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    entries.length
  }

  /** Parse the manifest; None when absent or unreadable (callers fall
    * back to the full scan — the manifest is a fast path, never a
    * correctness dependency).
    */
  def read(spark: SparkSession, dir: String): Option[Seq[Entry]] = try {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(dir, FileName)
    val fs = p.getFileSystem(hconf)
    if (!fs.exists(p)) return None
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0L, buf) finally in.close()
    val lines = new String(buf, "UTF-8").split("\n").toSeq
    if (lines.headOption.exists(!_.startsWith("graft-convert-manifest")))
      return None
    val b64 = java.util.Base64.getDecoder
    def dec(s: String): Array[Long] = {
      val bytes = b64.decode(s)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }
    Some(lines.filter(_.startsWith("file\t")).map { l =>
      val f = l.split("\t", -1)
      require(f.length == 7, s"bad manifest line: ${l.take(60)}")
      Entry(f(1), f(2).toLong, f(3).toLong, f(4).toLong, dec(f(5)), dec(f(6)))
    })
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Driver-side twin of `xxhash64(<string literal>)` (seed 42) — the
    * bits the blooms were built from.
    */
  private[graft] def sparkHashStr(v: String): Long =
    org.apache.spark.sql.catalyst.expressions.XxHash64(
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        org.apache.spark.sql.types.StringType)), 42L)
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty)
      .asInstanceOf[Long]

  /** Part files that MAY satisfy the slice: frame_time ∈ [tsLoMicros,
    * tsHiMicros] (either bound optional) ∧ ip_src = src ∧ ip_dst = dst
    * (each optional). None = no usable manifest (take the full scan).
    */
  def prunedFiles(spark: SparkSession, dir: String,
      tsLoMicros: Option[Long] = None, tsHiMicros: Option[Long] = None,
      src: Option[String] = None, dst: Option[String] = None)
      : Option[Seq[String]] =
    read(spark, dir).map { entries =>
      val srcH = src.map(sparkHashStr)
      val dstH = dst.map(sparkHashStr)
      entries.filter { e =>
        tsLoMicros.forall(_ <= e.tsMax) && tsHiMicros.forall(_ >= e.tsMin) &&
          srcH.forall(BloomAgg.mightContain(e.srcBloom, _)) &&
          dstH.forall(BloomAgg.mightContain(e.dstBloom, _))
      }.map(_.name)
    }

  /** The pruned slice read: select surviving part files (full scan when
    * no manifest), then apply the SAME predicates — identical rows to a
    * filtered full scan by construction, faster by the files skipped.
    */
  def slice(spark: SparkSession, dir: String,
      tsLoMicros: Option[Long] = None, tsHiMicros: Option[Long] = None,
      src: Option[String] = None, dst: Option[String] = None): DataFrame = {
    val base = prunedFiles(spark, dir, tsLoMicros, tsHiMicros, src, dst) match {
      case Some(files) if files.isEmpty =>
        spark.read.parquet(dir).limit(0) // nothing can match; keep schema
      case Some(files) =>
        spark.read.parquet(files.map(f => s"$dir/$f"): _*)
      case None => spark.read.parquet(dir)
    }
    val ts = unix_micros(col("frame_time").cast("timestamp"))
    val preds = Seq(
      tsLoMicros.map(lo => ts >= lit(lo)),
      tsHiMicros.map(hi => ts <= lit(hi)),
      src.map(v => col("ip_src") === lit(v)),
      dst.map(v => col("ip_dst") === lit(v))).flatten
    preds.foldLeft(base)((d, p) => d.filter(p))
  }
}
