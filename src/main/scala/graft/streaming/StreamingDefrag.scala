package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Streaming defrag: continuous capture conversion with the reference's
  * fragment back-fill (SURVEY §2.4) as CUSTOM STREAMING STATE — something
  * the reference's one-shot converter structurally cannot do. Packets
  * stream from a landing directory through the DSv2 pcap source; state is
  * keyed on the datagram 4-tuple (src, dst, proto, id) and holds the
  * first fragment's six patch fields, so non-first fragments landing in
  * LATER micro-batches still back-fill correctly.
  *
  * Semantics vs batch `Defrag.defrag`: identical whenever a datagram's
  * first fragment arrives no later than the batch of its continuation
  * fragments (fragments of one datagram are adjacent in a capture file —
  * the landing-zone norm). A continuation arriving in an EARLIER batch
  * than its first fragment emits unpatched — the same information a
  * file-at-a-time converter would have had.
  *
  * Scale: state is one small record per in-flight fragmented datagram;
  * on a real deployment a `GroupStateTimeout` eviction bounds it (not set
  * here — `AvailableNow` drains finite captures).
  */
object StreamingDefrag {
  final case class FragKey(ip_src: String, ip_dst: String, ip_proto: Short, ip_id: Int)
  final case class FragRow(
      ip_src: String, ip_dst: String, ip_proto: Short, ip_id: Int,
      tsu: Long, ip_mf: Boolean, ip_frag_offset: Int,
      udp_srcport: Option[Int], udp_dstport: Option[Int],
      ntp_priv_reqcode: Option[Short], dns_qry_type: Option[Int],
      dns_qry_name: Option[String], col_protocol: Option[String])
  final case class Patch(
      udp_srcport: Option[Int], udp_dstport: Option[Int],
      ntp_priv_reqcode: Option[Short], dns_qry_type: Option[Int],
      dns_qry_name: Option[String], col_protocol: Option[String])
  final case class PatchedRow(
      ip_src: String, ip_dst: String, ip_proto: Short, ip_id: Int, tsu: Long,
      udp_srcport: Option[Int], udp_dstport: Option[Int],
      ntp_priv_reqcode: Option[Short], dns_qry_type: Option[Int],
      dns_qry_name: Option[String], col_protocol: Option[String])

  // ---- round 14 (verdict #1): SENTINEL-CODED state machine ------------------
  // The Option-boxed FragRow encoder allocated up to 10 objects per row
  // crossing the state shuffle (Some + boxed numerics on deserialize,
  // again on the emit side). The shuffled row, the carried state, and
  // the emitted row are now all primitives — -1 = NULL for the numeric
  // columns (ports/reqcode/qry_type are unsigned on the wire, so -1 is
  // unreachable), null for the two strings. A codegen'd projection
  // restores the nullable schema AFTER the state op, where it's one
  // columnar `when` per column instead of per-row boxing.
  final case class FragRowS(
      ip_src: String, ip_dst: String, ip_proto: Short, ip_id: Int,
      tsu: Long, ip_mf: Boolean, ip_frag_offset: Int,
      udp_srcport: Int, udp_dstport: Int, ntp_priv_reqcode: Int,
      dns_qry_type: Int, dns_qry_name: String, col_protocol: String)
  final case class PatchS(
      udp_srcport: Int, udp_dstport: Int, ntp_priv_reqcode: Int,
      dns_qry_type: Int, dns_qry_name: String, col_protocol: String)
  final case class PatchedRowS(
      ip_src: String, ip_dst: String, ip_proto: Short, ip_id: Int, tsu: Long,
      udp_srcport: Int, udp_dstport: Int, ntp_priv_reqcode: Int,
      dns_qry_type: Int, dns_qry_name: String, col_protocol: String)

  private def toPatch(r: FragRow) = Patch(r.udp_srcport, r.udp_dstport,
    r.ntp_priv_reqcode, r.dns_qry_type, r.dns_qry_name, r.col_protocol)
  private def toPatchS(r: FragRowS) = PatchS(r.udp_srcport, r.udp_dstport,
    r.ntp_priv_reqcode, r.dns_qry_type, r.dns_qry_name, r.col_protocol)

  /** The 13 columns the defrag state machine consumes, from any packet
    * table (streaming or batch). */
  def project(df: DataFrame): DataFrame =
    df.select(col("ip_src"), col("ip_dst"), col("ip_proto"), col("ip_id"),
      unix_micros(col("frame_time")).as("tsu"), col("ip_mf"), col("ip_frag_offset"),
      col("udp_srcport"), col("udp_dstport"), col("ntp_priv_reqcode"),
      col("dns_qry_type"), col("dns_qry_name"), col("col_protocol"))

  /** The stateful back-fill transform over a (streaming) projected packet
    * frame — exposed so tests can drive multi-batch triggers around it.
    *
    * Round 13: the first-fragment pick is a single-pass MIN under the
    * full sort key, not a group-wide sort — the old `toSeq.sortBy` over
    * a 7-tuple of boxed Options allocated ~10 objects per ROW at 100M
    * packets for an ordering whose only consumer was the min (emitted
    * row ORDER is no contract: the parquet sink's order was already
    * partition-arbitrary, and the s07 oracle compares sorted). The pick
    * itself is unchanged: carried state outranks this batch, then the
    * least first-fragment row by (tsu, patched… NULLS FIRST) — pinned
    * ≡ the sortBy reference by StreamingDefragPickProps. `sortless =
    * false` keeps the old path for the interleaved A/B
    * (`tools.BenchStreamDefrag`).
    */
  /** [[defragStateful]] with a BYPASS SPLIT (round-13 experiment, the
    * batch ShuffleBypass's streaming twin): rows that provably cannot
    * change under the back-fill skip the state shuffle entirely and
    * union with the stateful branch's output. The proof is tighter
    * than batch's: a row is patchable only if its (proto=17) key can
    * match a first fragment, and EVERY proto-17 row is joinable anyway
    * (dns_* and ntp_* are mutually exclusive by the L7 dispatcher, so
    * no UDP row has all six patched columns non-null) — hence the
    * bypass is exactly the non-UDP slice. On TCP-heavy real traffic
    * that removes 80–90% of the shuffle; the trade is that a streaming
    * self-union plans TWO scans of the source per micro-batch, so the
    * win is corpus-dependent — MEASURE with `tools.BenchStreamDefrag
    * --bypass` before turning it on for a deployment. Default stays
    * the single-scan plan.
    */
  def defragStatefulSplit(projected: DataFrame,
      sortless: Boolean = true, sentinel: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val joinable = col("ip_proto") === 17 &&
      col("ip_src").isNotNull && col("ip_dst").isNotNull
    val stateful = defragStateful(projected.filter(joinable), sortless, sentinel)
    val bypass = projected.filter(!joinable).select(
      col("ip_src"), col("ip_dst"), col("ip_proto"), col("ip_id"), col("tsu"),
      col("udp_srcport"), col("udp_dstport"), col("ntp_priv_reqcode"),
      col("dns_qry_type"), col("dns_qry_name"), col("col_protocol"))
    stateful.unionByName(bypass)
  }

  /** The stateful back-fill. Round 14 (verdict #1): `sentinel = true`
    * selects the SENTINEL-CODED implementation — the row crossing the
    * state shuffle, the carried state, and the emitted row are all
    * primitives (-1/null = NULL), with a codegen'd `when` projection
    * restoring the nullable schema after the state op. Output rows and
    * schema are identical across paths (property-pinned), and the
    * isolated state-op A/B (`tools.BenchStreamDefrag --batch`) measured
    * PARITY (17.97/21.77 s vs 18.16/22.50 s at 100M) — the state
    * shuffle + store dominate, not the encoder. The DEFAULT therefore
    * stays the rounds-12/13 Option-boxed coding: the sentinel variant
    * changes the flatMapGroupsWithState STATE SCHEMA (Option[Short] →
    * Int etc.), and a deployed stream restarting from an existing
    * checkpoint would die on StateSchemaNotCompatible — the same
    * compatibility bar the pcap source's offsets honor (legacy forms
    * still parse). Opt into `sentinel = true` on fresh checkpoints
    * where allocation pressure matters more than restartability.
    */
  def defragStateful(projected: DataFrame, sortless: Boolean = true,
      sentinel: Boolean = false): DataFrame = {
    if (sentinel) {
      require(sortless, "the sentinel path implements only the sortless pick")
      return defragStatefulSentinel(projected)
    }
    import projected.sparkSession.implicits._
    val fn: (FragKey, Iterator[FragRow], GroupState[Patch]) => Iterator[PatchedRow] =
      (_, rows, state) => {
        // carried state (an earlier batch) outranks anything in this
        // batch — the append-mode contract: rows already emitted with
        // that patch cannot be retracted, so a duplicate first fragment
        // with an earlier tsu arriving in a LATER batch is ignored (the
        // class doc's arrival-order caveat; s07's one-file fixture is
        // single-batch, so its oracle's global pick agrees)
        val carried = state.getOption
        val (buf, ff) =
          if (sortless) {
            val b = new scala.collection.mutable.ArrayBuffer[FragRow]()
            var best: FragRow = null
            rows.foreach { r =>
              b += r
              if (r.ip_proto == 17 && r.ip_mf && r.ip_frag_offset == 0 &&
                  (best == null || ffOrdering.compare(r, best) < 0))
                best = r
            }
            (b, carried.orElse(Option(best).map(toPatch)))
          } else {
            // the round-12 reference path, kept for the interleaved A/B:
            // FULL sort key (the batch Defrag.firstFragments tiebreak) —
            // tsu alone ties for duplicated first fragments at the same
            // µs; None sorts first, like SQL ASC NULLS FIRST
            val sorted = rows.toSeq.sortBy(r => (r.tsu, r.udp_srcport,
              r.udp_dstport, r.ntp_priv_reqcode, r.dns_qry_type,
              r.dns_qry_name, r.col_protocol))
            (sorted, carried.orElse(
              sorted.find(r => r.ip_proto == 17 && r.ip_mf && r.ip_frag_offset == 0)
                .map(toPatch)))
          }
        // write state only when it changes — an unconditional update
        // re-serializes the identical patch every batch that touches the
        // key (pure changelog write amplification under RocksDB)
        if (carried.isEmpty) ff.foreach(state.update)
        val p = ff.getOrElse(Patch(None, None, None, None, None, None))
        buf.iterator.map { r =>
          PatchedRow(r.ip_src, r.ip_dst, r.ip_proto, r.ip_id, r.tsu,
            r.udp_srcport.orElse(p.udp_srcport), r.udp_dstport.orElse(p.udp_dstport),
            r.ntp_priv_reqcode.orElse(p.ntp_priv_reqcode),
            r.dns_qry_type.orElse(p.dns_qry_type),
            r.dns_qry_name.orElse(p.dns_qry_name),
            r.col_protocol.orElse(p.col_protocol))
        }
      }
    projected.as[FragRow]
      .groupByKey(r => FragKey(r.ip_src, r.ip_dst, r.ip_proto, r.ip_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
  }

  /** The round-14 sentinel-coded implementation (see [[defragStateful]]).
    * Same pick (carried state outranks the batch; least first-fragment
    * row under [[ffOrderingS]] — the boxed [[ffOrdering]]'s total order
    * with -1/null standing in for None), same state-update discipline,
    * same output schema.
    */
  private def defragStatefulSentinel(projected: DataFrame): DataFrame = {
    import projected.sparkSession.implicits._
    import org.apache.spark.sql.functions.{coalesce, lit, when}
    val fn: (FragKey, Iterator[FragRowS], GroupState[PatchS]) => Iterator[PatchedRowS] =
      (_, rows, state) => {
        val carried = state.getOption
        val b = new scala.collection.mutable.ArrayBuffer[FragRowS]()
        var best: FragRowS = null
        rows.foreach { r =>
          b += r
          if (r.ip_proto == 17 && r.ip_mf && r.ip_frag_offset == 0 &&
              (best == null || ffOrderingS.compare(r, best) < 0))
            best = r
        }
        val ff = carried.orElse(Option(best).map(toPatchS))
        // write state only when it changes (changelog write amplification)
        if (carried.isEmpty) ff.foreach(state.update)
        val p = ff.getOrElse(PatchS(-1, -1, -1, -1, null, null))
        b.iterator.map { r =>
          PatchedRowS(r.ip_src, r.ip_dst, r.ip_proto, r.ip_id, r.tsu,
            if (r.udp_srcport >= 0) r.udp_srcport else p.udp_srcport,
            if (r.udp_dstport >= 0) r.udp_dstport else p.udp_dstport,
            if (r.ntp_priv_reqcode >= 0) r.ntp_priv_reqcode else p.ntp_priv_reqcode,
            if (r.dns_qry_type >= 0) r.dns_qry_type else p.dns_qry_type,
            if (r.dns_qry_name != null) r.dns_qry_name else p.dns_qry_name,
            if (r.col_protocol != null) r.col_protocol else p.col_protocol)
        }
      }
    import org.apache.spark.sql.functions.col
    val coded = projected.select(
      col("ip_src"), col("ip_dst"), col("ip_proto"), col("ip_id"),
      col("tsu"), col("ip_mf"), col("ip_frag_offset"),
      coalesce(col("udp_srcport"), lit(-1)).as("udp_srcport"),
      coalesce(col("udp_dstport"), lit(-1)).as("udp_dstport"),
      coalesce(col("ntp_priv_reqcode").cast("int"), lit(-1)).as("ntp_priv_reqcode"),
      coalesce(col("dns_qry_type"), lit(-1)).as("dns_qry_type"),
      col("dns_qry_name"), col("col_protocol"))
    coded.as[FragRowS]
      .groupByKey(r => FragKey(r.ip_src, r.ip_dst, r.ip_proto, r.ip_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
      .toDF()
      .select(
        col("ip_src"), col("ip_dst"), col("ip_proto"), col("ip_id"), col("tsu"),
        when(col("udp_srcport") >= 0, col("udp_srcport")).as("udp_srcport"),
        when(col("udp_dstport") >= 0, col("udp_dstport")).as("udp_dstport"),
        when(col("ntp_priv_reqcode") >= 0,
          col("ntp_priv_reqcode").cast("smallint")).as("ntp_priv_reqcode"),
        when(col("dns_qry_type") >= 0, col("dns_qry_type")).as("dns_qry_type"),
        col("dns_qry_name"), col("col_protocol"))
  }

  /** [[ffOrdering]]'s total order over the sentinel coding: -1 / null
    * sort first, exactly where None sorted. Ports/reqcode/qry_type are
    * unsigned wire fields, so -1 < any real value by plain Int compare.
    */
  private[graft] val ffOrderingS: Ordering[FragRowS] = new Ordering[FragRowS] {
    @inline private def cmpStr(a: String, b: String): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else a.compareTo(b)
    def compare(a: FragRowS, b: FragRowS): Int = {
      var c = java.lang.Long.compare(a.tsu, b.tsu)
      if (c != 0) return c
      c = Integer.compare(a.udp_srcport, b.udp_srcport); if (c != 0) return c
      c = Integer.compare(a.udp_dstport, b.udp_dstport); if (c != 0) return c
      c = Integer.compare(a.ntp_priv_reqcode, b.ntp_priv_reqcode); if (c != 0) return c
      c = Integer.compare(a.dns_qry_type, b.dns_qry_type); if (c != 0) return c
      c = cmpStr(a.dns_qry_name, b.dns_qry_name); if (c != 0) return c
      cmpStr(a.col_protocol, b.col_protocol)
    }
  }

  /** The full first-fragment sort key as an allocation-free comparator:
    * (tsu, udp_srcport, udp_dstport, ntp_priv_reqcode, dns_qry_type,
    * dns_qry_name, col_protocol), each Option ASC NULLS FIRST — exactly
    * the old sortBy tuple's ordering (and Defrag.firstFragments'
    * min(struct) order).
    */
  private[graft] val ffOrdering: Ordering[FragRow] = new Ordering[FragRow] {
    @inline private def cmpOpt[T](a: Option[T], b: Option[T])(
        implicit o: Ordering[T]): Int = (a, b) match {
      case (None, None) => 0
      case (None, _) => -1
      case (_, None) => 1
      case (Some(x), Some(y)) => o.compare(x, y)
    }
    def compare(a: FragRow, b: FragRow): Int = {
      var c = java.lang.Long.compare(a.tsu, b.tsu)
      if (c != 0) return c
      c = cmpOpt(a.udp_srcport, b.udp_srcport); if (c != 0) return c
      c = cmpOpt(a.udp_dstport, b.udp_dstport); if (c != 0) return c
      c = cmpOpt(a.ntp_priv_reqcode, b.ntp_priv_reqcode); if (c != 0) return c
      c = cmpOpt(a.dns_qry_type, b.dns_qry_type); if (c != 0) return c
      c = cmpOpt(a.dns_qry_name, b.dns_qry_name); if (c != 0) return c
      cmpOpt(a.col_protocol, b.col_protocol)
    }
  }

  /** capturePath may be a landing-zone directory or a single capture file
    * (s07 streams the exact fixture file so its input set provably equals
    * the aux export's). */
  def defragStream(spark: SparkSession, capturePath: String): DataFrame = {
    // parquet sink, not memory: a memory sink collects the full result on
    // the driver and any downstream write re-ships it INSIDE the task
    // binaries (LocalTableScan — the "task of very large size" warning at
    // 20k rows); the file sink is also the production deployment shape
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_defrag").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_defrag_ckpt").toString
    val q = defragStateful(project(spark.readStream.format("pcap").load(capturePath)))
      .writeStream.outputMode("append").format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Deterministic 20k-packet capture fixture for the s07 query (the
    * driver's tables are parquet-only; defrag needs pcap input).
    *
    * The streamed input and the aux export read the SAME single file —
    * never a directory — so the stream's input set provably equals the
    * oracle's. The path is content-versioned (the generator params are in
    * the name), so a fixture from a different generator version can never
    * be picked up, and the file is written via temp + atomic rename so a
    * concurrent JVM racing the generation sees either nothing or the
    * complete capture (the JVM-local synchronized alone can't guarantee
    * that). */
  def fixture(): String = synchronized {
    val dir = java.nio.file.Paths.get(
      "/tmp/graft_s07_capture_n20000_ts1700000000000000")
    java.nio.file.Files.createDirectories(dir)
    val f = dir.resolve("cap.pcap")
    if (!java.nio.file.Files.exists(f)) {
      val tmp = dir.resolve(
        s"cap.pcap.tmp.${java.util.UUID.randomUUID.toString}")
      graft.spark.PcapGen.write(tmp.toString, 20000, 1700000000000000L)
      try
        java.nio.file.Files.move(tmp, f,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        // another process won the race with identical bytes
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
      }
    }
    f.toString
  }

  val queries: Seq[graft.queries.Q] = Seq(
    graft.queries.Q("s07_streaming_defrag",
      (s, _) => defragStream(s, fixture()),
      // the oracle replays the SAME back-fill over the aux-exported
      // nodefrag packet table (DuckDB can't read pcap; the dissection is
      // deterministic, so the aux export IS the capture)
      Some("""WITH p AS (SELECT * FROM '{OUT}/_aux/s07_streaming_defrag/aux_nodefrag/*.parquet'),
             |ff AS (SELECT * FROM (
             |  SELECT ip_src, ip_dst, ip_proto, ip_id,
             |         udp_srcport, udp_dstport, ntp_priv_reqcode,
             |         dns_qry_type, dns_qry_name, col_protocol,
             |         ROW_NUMBER() OVER (PARTITION BY ip_src, ip_dst, ip_proto, ip_id
             |                            ORDER BY tsu,
             |                              udp_srcport NULLS FIRST, udp_dstport NULLS FIRST,
             |                              ntp_priv_reqcode NULLS FIRST, dns_qry_type NULLS FIRST,
             |                              dns_qry_name NULLS FIRST, col_protocol NULLS FIRST) AS rn
             |  FROM p WHERE ip_proto = 17 AND ip_mf AND ip_frag_offset = 0)
             |  WHERE rn = 1)
             |SELECT p.ip_src, p.ip_dst, p.ip_proto, p.ip_id, p.tsu,
             |  COALESCE(p.udp_srcport, ff.udp_srcport) AS udp_srcport,
             |  COALESCE(p.udp_dstport, ff.udp_dstport) AS udp_dstport,
             |  COALESCE(p.ntp_priv_reqcode, ff.ntp_priv_reqcode) AS ntp_priv_reqcode,
             |  COALESCE(p.dns_qry_type, ff.dns_qry_type) AS dns_qry_type,
             |  COALESCE(p.dns_qry_name, ff.dns_qry_name) AS dns_qry_name,
             |  COALESCE(p.col_protocol, ff.col_protocol) AS col_protocol
             |FROM p LEFT JOIN ff USING (ip_src, ip_dst, ip_proto, ip_id)""".stripMargin),
      aux = Seq(
        "aux_nodefrag" -> ((s: SparkSession, _: String) =>
          project(graft.spark.PcapSource.read(s, fixture())))))
  )
}
