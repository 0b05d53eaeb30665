package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TopKAgg}

class FunctionsSpec extends SparkFunSuite {

  test("tcp_flags_str expression: Column API, SQL registration, codegen") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq(0x12, 0x01, 0xff, 0x00, 0x18).toDF("f")
    val viaCol = df.select(GraftFunctions.tcp_flags_str(col("f"))).as[String].collect()
    assert(viaCol.toSeq == Seq("...A..S.", ".......F", "CEUAPRSF", "........", "...AP..."))
    df.createOrReplaceTempView("flags")
    val viaSql = spark.sql("SELECT tcp_flags_str(f) FROM flags").as[String].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    // survives whole-stage codegen over a real scan
    val pkts = spark.range(256).select(col("id").cast("int").as("f"))
    val all = pkts.select(GraftFunctions.tcp_flags_str(col("f")).as("s")).as[String].collect()
    assert(all(0x12) == "...A..S." && all.length == 256)
  }

  test("expressions constant-fold: literal args collapse at plan time") {
    val df = spark.range(3).select(GraftFunctions.tcp_flags_str(lit(0x12)).as("s"))
    val plan = df.queryExecution.optimizedPlan.toString()
    // after folding the projection carries the literal result, not a call
    assert(plan.contains("...A..S."), plan)
    assert(!plan.toLowerCase.contains("tcpflagsstr"), plan)
  }

  test("GraftExtensions wires the SQL functions into a fresh session") {
    val exts = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions()(exts)
    // a cloned session state picks the injected functions up end-to-end
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2) // same builders the extension injects
    assert(s2.sql("SELECT tcp_flags_str(255)").head.getString(0) == "CEUAPRSF")
    // the extension also carries the as-of planner strategy
    assert(org.apache.spark.sql.GraftSqlBridge.plannerStrategies(exts, s2)
      .contains(graft.plans.AsOfJoinStrategy))
    // the custom AGGREGATES ride the same shared builder list: a plain
    // SQL user gets the bounded-heap top-k end to end
    s2.range(10).selectExpr("id % 2 AS g", "id AS v")
      .createOrReplaceTempView("graft_fn_probe") // s2's temp catalog
    val tk = s2.sql(
      "SELECT g, graft_topk(v, v, 2) AS tk FROM graft_fn_probe GROUP BY g ORDER BY g")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)))
    assert(tk.toSeq == Seq(0L -> Seq(8L, 6L), 1L -> Seq(9L, 7L)), tk.mkString(","))
    // literal-k contract: a non-literal k is refused at analysis, not
    // mis-sized at runtime
    val err = intercept[Exception](
      s2.sql("SELECT graft_topk(v, v, CAST(v AS INT)) FROM graft_fn_probe").collect())
    assert(err.getMessage.contains("integer literal"), err.getMessage)
  }

  test("graft_bloom: optional bit-count arg sizes the table; bad args refuse at analysis") {
    GraftFunctions.register(spark)
    spark.range(100).createOrReplaceTempView("gb_in")
    def words(sql: String): Int =
      spark.sql(sql).head().getSeq[Long](0).size
    assert(words("SELECT graft_bloom(xxhash64(id)) FROM gb_in") == 65536 / 32)
    assert(words("SELECT graft_bloom(xxhash64(id), 131072) FROM gb_in") == 131072 / 32)
    // non-power-of-two sizing refused
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_bloom(xxhash64(id), 100000) FROM gb_in").collect())
    assert(e1.getMessage.contains("power of two"), e1.getMessage)
    // non-BIGINT hash input refused at analysis, not asInstanceOf at runtime
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_bloom(CAST(id AS INT)) FROM gb_in").collect())
    assert(e2.getMessage.contains("BIGINT") ||
      e2.getMessage.contains("DATATYPE_MISMATCH"), e2.getMessage)
  }

  test("cosine_sim expression agrees with the interpreted HOF formulation") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val q = emb.filter(col("vec_id") === 0)
      .select(col("e").as("qe"))
    val joined = emb.crossJoin(broadcast(q)).filter(col("vec_id") =!= 0)
    val native = joined.select(col("vec_id"),
      round(GraftFunctions.cosine_sim(col("qe"), col("e")), 10).as("s"))
    val hof = joined.select(col("vec_id"),
      round(expr(
        """aggregate(zip_with(qe, e, (x, y) -> x * y), 0D, (a, x) -> a + x) /
          |(sqrt(aggregate(transform(qe, x -> x * x), 0D, (a, x) -> a + x)) *
          | sqrt(aggregate(transform(e, x -> x * x), 0D, (a, x) -> a + x)))""".stripMargin), 10).as("s"))
    val n = native.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val h = hof.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(n == h)
    // type checking rejects non-array args
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(1, 2)").collect()
    }
    assert(err.getMessage.toLowerCase.contains("array") ||
      err.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("cosine_sim: zero-norm vectors are orthogonal-to-everything (0.0, never NaN)") {
    // The round-5 divergence made unreachable (VERDICT r6 #8): a NaN sim
    // ranked FIRST under window sim-DESC but LAST under
    // min(struct(-sim,...)) — with zero-norm defined as 0.0 every sim is
    // finite and the two orderings agree. Covers both the interpreted
    // and codegen paths plus a planted-zero-vector k-means run.
    import spark.implicits._
    GraftFunctions.register(spark)
    val rows = Seq(
      (0L, Seq(0.0, 0.0, 0.0)),            // zero vector
      (1L, Seq(1.0, 2.0, 2.0)),
      (2L, Seq(0.0, 0.0, 0.0)),            // another zero vector
      (3L, Seq(-1.0, 0.5, 4.0))).toDF("vec_id", "e")
    val sims = rows.crossJoin(
        rows.select(col("vec_id").as("id2"), col("e").as("e2")))
      .select(col("vec_id"), col("id2"),
        GraftFunctions.cosine_sim(col("e"), col("e2")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(sims.values.forall(s => !s.isNaN), s"NaN leaked: $sims")
    assert(sims((0L, 0L)) == 0.0 && sims((0L, 1L)) == 0.0 && sims((2L, 3L)) == 0.0)
    assert(math.abs(sims((1L, 1L)) - 1.0) < 1e-12)
    // planted zero vectors through the full IVF loop: no NaN survives to
    // the ranked output, and the run is deterministic (rank ties break on
    // finite values only)
    val rnd = new scala.util.Random(41)
    val emb = (0 until 200).map { i =>
      val v = if (i % 17 == 0) Array.fill(8)(0.0f)
        else Array.fill(8)(rnd.nextFloat())
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
    def run() = graft.operators.KMeansIvf.search(
        emb, k = 4, iterations = 2, nQueries = 5, topK = 10, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toSeq
    val r1 = run()
    assert(r1.nonEmpty && r1.forall(t => !t._3.isNaN), "NaN sim in IVF output")
    assert(r1 == run(), "planted zero vectors broke determinism")
  }

  test("topk_by equals the window top-k under adversarial partitioning") {
    import org.apache.spark.sql.expressions.Window
    // 20 groups × 250 rows across 13 uneven partitions: the partial
    // buffers trim (4k overflow) and merge in arbitrary order; ord
    // collisions exercise the id tiebreak. Must equal the window answer
    // pair for pair, rank for rank.
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(100).toLong, i.toLong))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 13)).toDF("g", "ord", "id")
    val got = df.groupBy("g")
      .agg(TopKAgg.topk_by(col("ord"), col("id"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), col("pos"), col("col.ord"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), (col("rn") - 1).cast("int").as("pos"), col("ord"), col("id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want)
    // a group smaller than k returns all its rows, ranked
    val small = spark.createDataFrame(Seq((1L, 10L, 1L), (1L, 20L, 2L)))
      .toDF("g", "ord", "id")
      .groupBy("g").agg(TopKAgg.topk_by(col("ord"), col("id"), 5).as("tk"))
      .select(size(col("tk"))).head().getInt(0)
    assert(small == 2)
  }

  test("topk_by_payload carries string payloads intact across partial merges") {
    import org.apache.spark.sql.expressions.Window
    // buffer-backed UTF8Strings must be COPIED on update and survive the
    // UnsafeRow serialize/deserialize between partial and final
    // aggregation — a reuse bug would surface as scrambled payloads
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(50).toLong, i.toLong, s"payload-$i-${rnd.nextInt(1000)}"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 11)).toDF("g", "ord", "id", "s")
    val got = df.groupBy("g")
      .agg(graft.functions.TopKPayloadAgg.topk_by_payload(
        col("ord"), col("id"), col("s"), 4).as("tk"))
      .select(col("g"), posexplode(col("tk")))
      .select(col("g"), col("pos"), col("col.ord"), col("col.id"), col("col.payload"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    val w = Window.partitionBy("g").orderBy(col("ord").desc, col("id").asc)
    val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("g"), (col("rn") - 1).cast("int").as("pos"), col("ord"), col("id"), col("s"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    assert(got == want)
  }

  test("topk aggregates type-check at analysis instead of failing per-task") {
    import spark.implicits._
    val df = Seq((1, 10, 5L), (1, 20, 6L)).toDF("g", "ord_i", "id")
    // an explicit cast to BIGINT is the supported path
    val casted = df.groupBy("g")
      .agg(TopKAgg.topk_by(col("ord_i").cast("long"), col("id"), 2).as("tk"))
      .select(posexplode(col("tk"))).select(col("col.ord"))
      .collect().map(_.getLong(0)).toSet
    assert(casted == Set(10L, 20L))
    // any non-BIGINT ord (INT here, DOUBLE below) is rejected at ANALYSIS
    // — pre-fix: every executor task died with ClassCastException
    // mid-job; and an implicit double→long cast would silently truncate
    // and reorder the top-k, so strict is the only safe contract
    val errInt = intercept[Exception] {
      df.groupBy("g").agg(TopKAgg.topk_by(col("ord_i"), col("id"), 2)).collect()
    }
    assert(errInt.getMessage.contains("DATATYPE_MISMATCH") ||
      errInt.getMessage.toUpperCase.contains("BIGINT"), errInt.getMessage)
    val errDouble = intercept[Exception] {
      df.withColumn("d", col("ord_i") * 0.5).groupBy("g")
        .agg(graft.functions.TopKPayloadAgg.topk_by_payload(
          col("d"), col("id"), col("g"), 2)).collect()
    }
    assert(errDouble.getMessage.contains("DATATYPE_MISMATCH") ||
      errDouble.getMessage.toUpperCase.contains("BIGINT"), errDouble.getMessage)
  }

  test("topk aggregates rank hash-range ords exactly: Long.MinValue never beats larger values") {
    import spark.implicits._
    // pre-fix: the sort key was -ord, and -Long.MinValue overflows back
    // to Long.MinValue — the SMALLEST possible ord ranked as the largest
    // (plausible exactly when ord is hash-derived, spanning the range)
    val df = Seq(
      (1, Long.MinValue, 1L), (1, Long.MaxValue, 2L),
      (1, 0L, 3L), (1, Long.MinValue + 1, 4L)).toDF("g", "o", "id")
    val top = df.groupBy("g")
      .agg(TopKAgg.topk_by(col("o"), col("id"), 2).as("tk"))
      .select(explode(col("tk"))).select(col("col.ord"), col("col.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(top == Seq((Long.MaxValue, 2L), (0L, 3L)), top.mkString(","))
    val topP = df.groupBy("g")
      .agg(graft.functions.TopKPayloadAgg.topk_by_payload(
        col("o"), col("id"), col("g"), 2).as("tk"))
      .select(explode(col("tk"))).select(col("col.ord"))
      .collect().map(_.getLong(0)).toSeq
    assert(topP == Seq(Long.MaxValue, 0L), topP.mkString(","))
  }

  test("graft_minhash: non-BIGINT input and non-positive counts refuse at analysis") {
    GraftFunctions.register(spark)
    spark.range(10).createOrReplaceTempView("mh_in")
    val ok = spark.sql("SELECT graft_minhash(xxhash64(id), 4) FROM mh_in")
      .head().getSeq[Long](0)
    assert(ok.size == 4)
    // pre-fix: analysis passed and every task died with a
    // ClassCastException at v.asInstanceOf[Long]
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_minhash(CAST(id AS INT), 4) FROM mh_in").collect())
    assert(e1.getMessage.contains("BIGINT") ||
      e1.getMessage.contains("DATATYPE_MISMATCH"), e1.getMessage)
    // counts are sizes: zero/negative k or numPerms silently produced
    // empty signatures/arrays pre-fix
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_minhash(xxhash64(id), 0) FROM mh_in").collect())
    assert(e2.getMessage.contains("positive"), e2.getMessage)
    val e3 = intercept[Exception](
      spark.sql("SELECT graft_topk(id, id, 0) FROM mh_in").collect())
    assert(e3.getMessage.contains("positive"), e3.getMessage)
  }

  test("bloom memberExpr probes SIZED filters correctly (bits derived from the words array)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // build a NON-default-size filter and probe all inserted keys via the
    // SQL membership fragment: pre-fix the fragment masked with the
    // hardcoded default 65535, probing wrong bits of any sized filter —
    // silent false negatives, the worst failure class for a pruning filter
    spark.range(500).createOrReplaceTempView("bm_in")
    spark.sql("SELECT graft_bloom(xxhash64(id), 1048576) AS words FROM bm_in")
      .createOrReplaceTempView("bm_filter")
    val misses = spark.sql(
      s"""SELECT count(*) FROM bm_in CROSS JOIN bm_filter
         |WHERE NOT ${graft.functions.BloomAgg.memberExpr("words", "xxhash64(id)")}"""
        .stripMargin).head().getLong(0)
    assert(misses == 0L, s"$misses inserted keys missed the sized filter")
    // and the JVM kernel agrees with the SQL fragment on the same filter
    val words = spark.sql("SELECT words FROM bm_filter").head().getSeq[Long](0).toArray
    val hashes = spark.sql("SELECT xxhash64(id) h FROM bm_in").as[Long].collect()
    assert(hashes.forall(graft.functions.BloomAgg.mightContain(words, _)))
  }

  test("sized bloom agg: per-group finalize sizing, no false negatives, overflow cap") {
    import spark.implicits._
    import graft.functions.{BloomAgg, SizedBloomAgg}
    // one aggregation pass, two groups with very different ndv: each
    // group's filter must be sized from ITS OWN distinct count at
    // finalize (the round-16 single-pass ConvertManifest contract) and
    // contain every inserted key
    val df = spark.range(0, 40000).selectExpr(
      "case when id < 500 then 'small' else 'big' end AS g",
      "xxhash64(cast(id AS string)) AS h")
    val rows = df.groupBy($"g")
      .agg(SizedBloomAgg.sized_bloom_agg($"h").as("w"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toArray).toMap
    assert(rows("small").length * BloomAgg.WordBits ==
      BloomAgg.sizeBits(500L), "small group not sized from its own ndv")
    assert(rows("big").length * BloomAgg.WordBits ==
      BloomAgg.sizeBits(39500L), "big group not sized from its own ndv")
    val hashes = df.select($"g", $"h").as[(String, Long)].collect()
    assert(hashes.forall { case (g, h) => BloomAgg.mightContain(rows(g), h) },
      "sized filter dropped an inserted key (false negative)")

    // overflow: >2^17 distinct keys degrade to the MaxNumBits cap — and
    // membership still holds through the spill + a serialize round-trip
    // + an exact-buffer merge (every Buf mode transition covered)
    val buf = new SizedBloomAgg.Buf
    val rnd = new scala.util.Random(7)
    val keys = Array.fill(SizedBloomAgg.ExactMax + 5000)(rnd.nextLong())
    keys.foreach(buf.add)
    buf.add(0L) // the sentinel-coded zero hash is a legal key
    val spilled = SizedBloomAgg.Buf.deserialize(buf.serialized())
    val late = new SizedBloomAgg.Buf
    late.add(42L)
    spilled.mergeFrom(SizedBloomAgg.Buf.deserialize(late.serialized()))
    val words = spilled.finalizeWords()
    assert(words.length * BloomAgg.WordBits == BloomAgg.MaxNumBits,
      "overflowed group must emit the cap-size filter")
    assert(keys.forall(BloomAgg.mightContain(words, _)))
    assert(BloomAgg.mightContain(words, 0L) && BloomAgg.mightContain(words, 42L))
    // exact-mode round-trip keeps the exact set (sizing stays tight)
    val small = new SizedBloomAgg.Buf
    Seq(1L, 2L, 0L, -9L).foreach(small.add)
    val back = SizedBloomAgg.Buf.deserialize(small.serialized()).finalizeWords()
    assert(back.length * BloomAgg.WordBits == BloomAgg.sizeBits(4L))
    assert(Seq(1L, 2L, 0L, -9L).forall(BloomAgg.mightContain(back, _)))
    // strict input typing, like every TypedImperativeAggregate here
    val e = intercept[Exception](
      df.groupBy($"g").agg(SizedBloomAgg.sized_bloom_agg(lit(1.5))).collect())
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("cosine_sim refuses ragged vectors and null elements instead of degrading") {
    GraftFunctions.register(spark)
    // a prefix-truncated similarity or a null-as-0.0 slot is a confident
    // wrong number; both are contract violations that must surface
    val eRag = intercept[Exception](spark.sql(
      "SELECT cosine_sim(array(1.0d, 2.0d), array(1.0d, 2.0d, 3.0d))").collect())
    assert(eRag.getMessage.contains("lengths differ"), eRag.getMessage)
    val eNull = intercept[Exception](spark.sql(
      "SELECT cosine_sim(array(1.0d, CAST(NULL AS DOUBLE)), array(1.0d, 2.0d))").collect())
    assert(eNull.getMessage.contains("null element"), eNull.getMessage)
  }
}
