package graft

import org.apache.spark.sql.functions._

import graft.queries.{FuzzyDedup, Multimodal, TextOps, VectorOps}

/** Validates the non-oracled operators against exact baselines, plus a
  * smoke pass over the whole declared surface at sf0.001.
  */
class QuerySurfaceSpec extends SparkFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Driver-side shingle hashes per doc via the SAME SQL exprs the
    * pipeline uses — deliberately inlined (independent of TextOps) and
    * shared by the minhash and simhash exact-recompute pins. */
  private def driverShingleHashes(path: String): Map[Long, Array[Long]] =
    spark.read.parquet(path)
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id",
        "explode(transform(sequence(0, size(ws)-2), i -> concat(ws[i], ' ', ws[i+1]))) AS sh")
      .selectExpr("doc_id", "xxhash64(sh) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2) }

  test("every declared query runs at sf0.001; oracles cover the SQL-expressible ones") {
    val names = SparkEntry.all.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    SparkEntry.all.foreach { q =>
      val n = q.build(spark, sf).count()
      assert(n >= 0, s"${q.name} failed")
    }
    assert(SparkEntry.oracleSql.keySet.subsetOf(names.toSet))
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("minhash LSH recovers the exact-Jaccard near-dup pairs (recall)") {
    val exact = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = FuzzyDedup.minhashNearDups(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("minhash signature estimates track exact jaccard on planted dups") {
    val est = FuzzyDedup.minhashNearDups(spark, sf)
      .filter(col("est_jaccard_permille") >= 500).count()
    assert(est > 0)
  }

  test("simhash near-dups include the strongly similar pairs") {
    val exact = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard_permille") >= 800)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = FuzzyDedup.simhashNearDups(spark, sf)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    // The operator's own contract first: recall is pigeonhole-GUARANTEED
    // 1.0 for pairs within Hamming 6 of each other — verify it exactly
    // against an all-pairs driver-side Hamming scan of the fingerprints.
    // (Historical note: the pre-fix 32-bit-wrapped fingerprints herded
    // half the corpus into shared upper-block buckets, which inflated
    // jaccard-recall to 1.0 by accident; the honest number is below.)
    val fps = FuzzyDedup.simhashes(
      spark.read.parquet(s"$sf/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val within6 = (for {
      (da, fa) <- fps; (db, fb) <- fps
      if da < db && java.lang.Long.bitCount(fa ^ fb) <= 6
    } yield (da, db)).toSet
    assert(within6.subsetOf(sim) && sim == within6,
      s"pigeonhole contract: found ${sim.size} vs true ${within6.size}")
    // quality indicator: how many strong-jaccard pairs land within
    // Hamming 6 of each other (not guaranteed — simhash is a different
    // similarity; empirically 26/28 at sf0.001)
    val recall = (exact & sim).size.toDouble / exact.size
    assert(recall >= 0.9, s"simhash recall $recall over ${exact.size} strong pairs")
  }

  test("minhash signatures equal an exact driver-side recompute (slot-by-slot)") {
    // the d06/d29/d45 oracles replay EXPORTED signatures, so MinHashAgg
    // itself sits in the gate's aux-replay blind spot (where the simhash
    // shift-wrap bug lived) — pin it exactly: per-slot min of
    // XXH64.hashLong(shingleHash, slot), recomputed on the driver from
    // the same shingle hashes
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val sigs = FuzzyDedup.signatures(
      spark.read.parquet(s"$sf/documents.parquet"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val hs = driverShingleHashes(s"$sf/documents.parquet")
    assert(hs.keySet == sigs.keySet)
    hs.foreach { case (doc, hashes) =>
      val expect = Array.tabulate(FuzzyDedup.NumPerms) { slot =>
        hashes.map(h => XXH64.hashLong(h, slot)).min
      }
      assert(sigs(doc).sameElements(expect), s"doc $doc signature diverges")
    }
  }

  test("simhash upper bits are real: 63-bit non-negative, bits 32-62 vote independently") {
    // regression pin for the INT-shift wrap bug: `1 << i` in Spark SQL is
    // a 32-bit shift (mod 32), so bits 32-62 aliased onto 0-30 and bit 31
    // sign-extended through the BIGINT cast — every fingerprint's upper
    // 32 bits collapsed to all-0s or all-1s ({0, -1} after >> 32). The
    // DuckDB oracle replays the exported fingerprints, so only this spec
    // can see the difference.
    val fps = FuzzyDedup.simhashes(
      spark.read.parquet(s"$sf/documents.parquet"))
      .select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps.values.forall(_ >= 0L), "63-bit contract: non-negative")
    val upper = fps.values.map(_ >>> 32).toSet
    assert(upper.size > 2,
      s"upper 31 bits collapsed to ${upper.size} distinct values (wrap bug)")
    // exact parity with a driver-side recomputation from the same shingle
    // hashes (votes majority per bit, bit set iff positive)
    val hs = driverShingleHashes(s"$sf/documents.parquet")
    hs.foreach { case (doc, hashes) =>
      var fp = 0L
      (0 until FuzzyDedup.SimHashBits).foreach { i =>
        val vote = hashes.map(h => if (((h >> i) & 1L) == 1L) 1L else -1L).sum
        if (vote > 0) fp |= (1L << i)
      }
      assert(fps(doc) == fp, s"doc $doc: engine ${fps(doc)} vs local $fp")
    }
  }

  test("LSH bucket cap: a degenerate corpus (1k identical docs) stays bounded") {
    import spark.implicits._
    val docs = (1L to 1000L)
      .map(i => (i, "the same exact text repeated for every single document body"))
      .toDF("doc_id", "text")
    // every (band, bucket) holds all 1000 docs — far over MaxBucketDocs —
    // so the cap must skip them all: zero candidate pairs, not ~500k×16
    val pairs = FuzzyDedup.candidatePairs(FuzzyDedup.signatures(docs))
    assert(pairs.count() == 0)
  }

  test("d25 boilerplate cap: a degenerate corpus (200 identical docs) yields zero pairs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("d25degen")
    (1L to 200L)
      .map(i => (i, "one two three four five six seven eight nine ten eleven twelve", "en", "srcX", 64L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // every 8-token span occurs in all 200 docs — far over MaxSpanDocs —
    // so the cap must drop them all instead of forming 200²/2 pairs
    assert(SparkEntry.queries("d25_substring_dedup")(spark, dir.toString).count() == 0)
  }

  test("winnowing fingerprints: deterministic, near-dups share fingerprints") {
    val fp1 = FuzzyDedup.fingerprints(
      spark.read.parquet(s"$sf/documents.parquet")).cache()
    // deterministic across runs
    val a = fp1.groupBy("doc_id").count().orderBy("doc_id").collect()
    val b = FuzzyDedup.fingerprints(
      spark.read.parquet(s"$sf/documents.parquet"))
      .groupBy("doc_id").count().orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // a planted near-dup pair shares a large fraction of fingerprints
    val pair = SparkEntry.queries("d05_ngram_jaccard")(spark, sf)
      .filter(col("jaccard_permille") >= 800).select("doc_a", "doc_b").head()
    val fa = fp1.filter(col("doc_id") === pair.getLong(0))
      .select("fingerprint").collect().map(_.getLong(0)).toSet
    val fb = fp1.filter(col("doc_id") === pair.getLong(1))
      .select("fingerprint").collect().map(_.getLong(0)).toSet
    val overlap = (fa & fb).size.toDouble / math.min(fa.size, fb.size)
    assert(overlap >= 0.5, s"fingerprint overlap $overlap")
    fp1.unpersist()
  }

  test("brute-force cosine topk: self-consistency against a local computation") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      math.rint(d / (math.sqrt(na) * math.sqrt(nb)) * 10000) / 10000
    }
    val got = VectorOps.cosineTopK(spark, sf, nQueries = 3, k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    got.groupBy(_._1).foreach { case (qid, rows) =>
      val expTop = emb.keys.filter(_ != qid)
        .map(c => (c, cos(emb(qid), emb(c)))).toSeq
        .sortBy { case (c, s) => (-s, c) }.take(4)
      assert(rows.sortBy(r => (-r._3, r._2)).map(r => (r._2, r._3)).toSeq == expTop,
        s"qid=$qid")
    }
  }

  test("k-means IVF: deterministic across runs, recall vs brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val r1 = graft.operators.KMeansIvf.search(emb, 8, 2, 10, 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r2 = graft.operators.KMeansIvf.search(emb, 8, 2, 10, 5, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r2, "IVF must be deterministic")
    val exact = VectorOps.cosineTopK(spark, sf, nQueries = 10, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (r1 & exact).size.toDouble / exact.size
    // nprobe=2 of 8 cells on near-uniform random vectors: recall is modest
    // by design; the bound catches gross breakage, not tuning
    assert(recall >= 0.2, s"recall $recall")
  }

  test("k-means|| init: deterministic, and separates a hostile clustered distribution") {
    import spark.implicits._
    import graft.operators.KMeansIvf
    // 4 tight clusters along distinct axes; the first k=4 vec_ids all sit
    // in cluster 0, so first-k seeding collapses while k-means|| must
    // place centers in all 4 clusters
    val vecs = (0L until 400L).map { i =>
      val cluster = if (i < 4) 0 else (i % 4).toInt
      val base = Array.fill(8)(0.001f)
      base(cluster * 2) = 1f
      base(cluster * 2 + 1) = 0.2f + 0.001f * (i % 7)
      (i, base.toSeq, cluster)
    }.toDF("vec_id", "embedding", "label")
    val (c1, a1) = KMeansIvf.fit(vecs, k = 4, iterations = 2, init = "kmeans||")
    val (c2, a2) = KMeansIvf.fit(vecs, k = 4, iterations = 2, init = "kmeans||")
    assert(c1.collect().map(_.toString).sorted.sameElements(
      c2.collect().map(_.toString).sorted), "kmeans|| init must be deterministic")
    assert(a1.collect().map(r => (r.getLong(0), r.getInt(2))).toSet ==
      a2.collect().map(r => (r.getLong(0), r.getInt(2))).toSet)
    // each true cluster maps to exactly one learned cell (clean separation);
    // note vec_ids 0-3 all sit in cluster 0 by construction
    val byCluster = a1.select("vec_id", "cell").collect()
      .map(r => (if (r.getLong(0) < 4) 0L else r.getLong(0) % 4, r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.toSet).toMap
    val cellsUsed = byCluster.values.reduce(_ ++ _)
    assert(cellsUsed.size == 4, s"expected 4 distinct cells, got $byCluster")
    byCluster.foreach { case (cl, cells) =>
      assert(cells.size == 1, s"cluster $cl split across cells $cells")
    }
  }

  test("bucketed ANN only returns same-label neighbors") {
    val labels = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = VectorOps.bucketedAnn(spark, sf, nQueries = 20, k = 3).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(labels(r.getLong(0)) == labels(r.getLong(1))))
  }

  test("q52 cross-engine HLL estimates within raw-sketch error of the exact count") {
    import org.apache.spark.sql.functions._
    // sf0.01: ~2000 distinct partkeys per flag ≈ 8·m, where the RAW
    // estimator (no small-range correction) is in its accurate regime
    // (theoretical sigma ≈ 1.04/sqrt(256) ≈ 6.5%)
    val dir = "/root/testdata/sf0.01"
    val est = SparkEntry.queries("q52_hll_cross_engine")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (flag, e) =>
      val n = exact(flag).toDouble
      assert(e > n * 0.75 && e < n * 1.25,
        s"flag=$flag est=$e exact=$n outside 25% raw-HLL bound")
    }
  }

  test("q42 sigma predicate survives the int64-overflow domain (128-bit compare)") {
    import spark.implicits._
    // one user, 10500 events at ±1e5 cents: n·ss = 1.05e18, so the old
    // int64 form 9·(n·ss − s²) = 9.45e18 exceeds Long.MaxValue — under
    // Spark 4's default ANSI mode the whole query THROWS (and with ANSI
    // off it would wrap and flag every row); every value is exactly 1σ
    // from the mean, so the true anomaly set is EMPTY
    val rows = (1 to 5250).flatMap(i =>
      Seq((i.toLong * 2, 1L, 100000L), (i.toLong * 2 + 1, 1L, -100000L)))
    val e = rows.toDF("event_id", "user_id", "cents")
    val stats = e.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum(col("cents")).as("s"),
      sum(col("cents") * col("cents")).as("ss"))
    val joined = e.join(stats, "user_id")
    val wide = joined.filter(expr(
      """(CAST(n AS DECIMAL(38,0)) * cents - s) * (CAST(n AS DECIMAL(38,0)) * cents - s)
        | > 9 * (CAST(n AS DECIMAL(38,0)) * ss - CAST(s AS DECIMAL(38,0)) * s)""".stripMargin))
    assert(wide.count() == 0, "128-bit sigma test must flag nothing at 1 sigma")
    // the old int64 predicate demonstrably overflows on this domain
    val narrow = joined.filter(expr(
      "(n * cents - s) * (n * cents - s) > 9 * (n * ss - s * s)"))
    val thrown = intercept[Exception] { narrow.count() }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(thrown).exists(_.toLowerCase.contains("overflow")),
      s"expected int64 overflow, got: $thrown")
  }

  test("PNG codec round trip: exact dimensions and pixels through ImageIO") {
    // a known 70-byte ramp: 32×3 raster, last row zero-padded after 6 px
    val bytes = Array.tabulate(70)(i => ((i * 3 + 7) % 256).toByte)
    val png = Multimodal.encodePng(bytes)
    // real PNG magic
    assert((png(0) & 0xff) == 0x89 && png(1) == 'P'.toByte &&
      png(2) == 'N'.toByte && png(3) == 'G'.toByte)
    val d = Multimodal.decodePng(png)
    assert(d.width == 32 && d.height == 3)
    assert(d.pixels.take(70).sameElements(bytes), "decoded pixels != source bytes")
    assert(d.pixels.drop(70).forall(_ == 0), "raster padding must be zero")
    // empty payload → 32×1 all-zero image
    val e = Multimodal.decodePng(Multimodal.encodePng(Array.emptyByteArray))
    assert(e.width == 32 && e.height == 1 && e.pixels.forall(_ == 0))
  }

  test("WAV codec round trip: exact 8-bit PCM samples through AudioSystem") {
    val bytes = Array.tabulate(333)(i => ((i * 7 + 11) % 256).toByte)
    val wav = Multimodal.encodeWav(bytes)
    assert(wav(0) == 'R'.toByte && wav(1) == 'I'.toByte &&
      wav(2) == 'F'.toByte && wav(3) == 'F'.toByte)
    val samples = Multimodal.decodeWav(wav)
    assert(samples.sameElements(bytes), "decoded samples != source bytes")
    assert(Multimodal.decodeWav(Multimodal.encodeWav(Array.emptyByteArray)).isEmpty)
  }

  test("multimodal real decode: dims/sums match raw text, no shuffle") {
    import org.apache.spark.sql.functions._
    val feats = Multimodal.extractFeatures(Multimodal.imageBlobs(spark, sf))
    val rows = feats.collect()
    assert(rows.length == 500)
    // the ImageIO-decoded features must equal the direct byte math
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { f =>
      assert(f.width == 32)
      assert(f.height == math.max(1, (expected(f.media_id) + 31) / 32))
    }
    // narrow plan: no exchange in the physical plan
    val plan = feats.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"decode stage must not shuffle:\n$plan")
  }

  test("multimodal resize and frame sampling: shapes, determinism, no shuffle") {
    val b = Multimodal.imageBlobs(spark, sf)
    val rs = Multimodal.resized(b)
    val rows = rs.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      assert(r.width == 16 && r.height >= 0 && r.pooled_sum >= 0)
    }
    assert(!rs.queryExecution.executedPlan.toString().contains("Exchange"))
    val fr = Multimodal.sampledFrames(b)
    val f1 = fr.collect().map(f => (f.media_id, f.frame_index, f.byte_sum)).sorted.toSeq
    val f2 = Multimodal.sampledFrames(Multimodal.imageBlobs(spark, sf))
      .collect().map(f => (f.media_id, f.frame_index, f.byte_sum)).sorted.toSeq
    assert(f1 == f2 && f1.nonEmpty)
    assert(f1.forall { case (_, fi, s) => fi % 4 == 0 && s >= 0 && s <= 64L * 255 })
  }

  test("streaming hourly agg equals the batch q14 answer") {
    val stream = graft.streaming.StreamingOps.hourlyAgg(spark, sf)
      .orderBy("hour_bucket").collect()
    val batch = SparkEntry.queries("q14_events_hourly")(spark, sf)
      .orderBy("hour_bucket").collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s0, b0) =>
      assert(s0.getLong(0) == b0.getLong(0))
      assert(s0.getLong(1) == b0.getLong(1))
      assert(s0.getLong(2) == b0.getLong(2))
    }
  }

  test("salted join equals the plain join exactly") {
    import graft.operators.SaltedJoin
    val li = spark.read.parquet(s"$sf/lineitem.parquet").select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderpriority").withColumnRenamed("o_orderkey", "l_orderkey")
    val salted = SaltedJoin(li, o, Seq("l_orderkey"), salts = 8)
      .orderBy("l_orderkey", "l_quantity", "o_orderpriority").collect().toSeq
    val plain = li.join(o, Seq("l_orderkey"))
      .orderBy("l_orderkey", "l_quantity", "o_orderpriority").collect().toSeq
    assert(salted == plain && salted.nonEmpty)
  }

  test("approx_count_distinct lands within 10% of exact and cross-checks q52's HLL") {
    val joined = SparkEntry.queries("q21_approx_distinct")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(joined(k) - e).toDouble / e <= 0.10, s"$k: ${joined(k)} vs $e")
    }
    // round 10 (verdict #7): q21 is the one gate row that can never
    // hash-match (engine-specific sketch bytes), so cross-check it
    // against q52 — the md5-deterministic, fully-oracled HLL computing
    // the SAME estimate (distinct l_partkey per flag). Two independent
    // sketches agreeing within their combined error needs no exact
    // count, which is the check that still works at 100 TB. Run at
    // sf0.01 like q52's own bound spec: ~2000 distinct per flag ≈ 8·m
    // is the RAW estimator's accurate regime (at sf0.001's ~200 ≈
    // 0.8·m the missing small-range correction dominates and the two
    // sketches legitimately diverge). Bound: q21's HLL++ ≤10% + q52's
    // raw estimator ≤25% ⇒ 35% worst case; 30% passes with margin.
    val xDir = "/root/testdata/sf0.01"
    val q21x = SparkEntry.queries("q21_approx_distinct")(spark, xDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val q52x = SparkEntry.queries("q52_hll_cross_engine")(spark, xDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(q52x.keySet == q21x.keySet && q52x.nonEmpty)
    q52x.foreach { case (k, d) =>
      assert(math.abs(q21x(k) - d).toDouble / d <= 0.30,
        s"q21 vs q52 disagree beyond combined sketch error for $k: " +
          s"${q21x(k)} vs $d")
    }
  }

  test("KMV sketch estimates land within 20% of exact (k=256)") {
    // q48 emits estimate AND exact side by side; KMV k=256 has ~1/sqrt(k)
    // ≈ 6% relative stddev, so 20% is a ~3-sigma bound
    SparkEntry.queries("q48_kmv_distinct")(spark, sf).collect().foreach { r =>
      val (est, exact) = (r.getAs[Long]("est_distinct"), r.getAs[Long]("exact_distinct"))
      assert(math.abs(est - exact).toDouble / exact <= 0.20, s"${r.getString(0)}: $est vs $exact")
    }
    // q49's intersection estimate vs the exact region-overlap count
    val row = SparkEntry.queries("q49_kmv_intersect")(spark, sf).collect().head
    val est = row.getAs[Long]("est_intersection")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val c = spark.read.parquet(s"$sf/customer.parquet")
    val n = spark.read.parquet(s"$sf/nation.parquet")
    val rg = spark.read.parquet(s"$sf/region.parquet")
    def parts(region: String) = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .join(rg, n("n_regionkey") === rg("r_regionkey"))
      .filter(col("r_name") === region).select("l_partkey").distinct()
    val exact = parts("ASIA").intersect(parts("EUROPE")).count()
    assert(math.abs(est - exact).toDouble / exact <= 0.25, s"intersection: $est vs $exact")
  }

  test("langid heuristic emits only known languages and matches text") {
    val out = SparkEntry.queries("d04_langid")(spark, sf).collect()
    assert(out.length == 500)
    val preds = out.map(_.getAs[String]("lang_pred")).toSet
    assert(preds.subsetOf(Set("en", "de", "fr", "es", "zh")))
  }

  test("d19 keep-list: exactly one survivor per cluster, consistent with d09") {
    val keep = SparkEntry.queries("d19_dedup_keep")(spark, sf).collect()
    assert(keep.length == 500, "one verdict per document")
    // each cluster keeps exactly its min doc_id
    keep.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, rows) =>
      val kept = rows.filter(_.getAs[Long]("keep") == 1L).map(_.getAs[Long]("doc_id"))
      assert(kept.toSeq == Seq(rows.map(_.getAs[Long]("doc_id")).min), s"cluster $cid")
      assert(cid == rows.map(_.getAs[Long]("doc_id")).min, s"cluster label is min id")
    }
    // the multi-doc clusters are exactly d09's components
    val d09 = SparkEntry.queries("d09_dedup_clusters")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    keep.filter(r => d09.contains(r.getAs[Long]("doc_id"))).foreach { r =>
      assert(r.getAs[Long]("cluster_id") == d09(r.getAs[Long]("doc_id")))
    }
  }

  test("d16 repetition signals: permille bounds and exact value on a planted doc") {
    val out = SparkEntry.queries("d16_repetition")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("top_bigram_permille") <= 1000L)
      assert(r.getAs[Long]("distinct_permille") <= 1000L)
      assert(r.getAs[Long]("top_bigram_n") >= 1L)
    }
  }

  test("d18 contamination: src0 is the benchmark, counts are set-consistent") {
    val out = SparkEntry.queries("d18_contamination")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_shingles"))
      assert(r.getAs[Long]("contam_permille") <= 1000L)
    }
    // no src0 (benchmark) doc may appear in the audited output
    val src0 = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("source") === "src0").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(out.forall(r => !src0.contains(r.getAs[Long]("doc_id"))))
  }

  test("e12 SRP-LSH: every candidate shares a bucket within Hamming≤1; sims exact") {
    val res = SparkEntry.queries("e12_srp_lsh")(spark, sf).collect()
    assert(res.nonEmpty)
    res.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.length <= 5, s"query $q returned ${rs.length} > k")
    }
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def w(p: Int, i: Int): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"srp:$p:$i".getBytes("UTF-8"))
      val h = d.take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      h % 2001L - 1000L
    }
    def code(v: Array[Double]): Long =
      (0 until 8).map { p =>
        val s = v.indices.map(i => w(p, i) * math.floor(1e6 * v(i) + 0.5).toLong).sum
        if (s > 0) 1L << p else 0L
      }.sum
    val codes = vecs.map { case (id, v) => id -> code(v) }
    res.foreach { r =>
      val (q, c) = (r.getAs[Long]("qid"), r.getAs[Long]("cid"))
      assert(java.lang.Long.bitCount(codes(q) ^ codes(c)) <= 1,
        s"candidate ($q,$c) outside the Hamming≤1 probe ring")
      val (a, b) = (vecs(q), vecs(c))
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val exact = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      assert(math.abs(r.getAs[Double]("sim") - exact) < 1e-3, s"($q,$c)")
    }
  }

  test("e05 PQ: deterministic across runs, recall vs exact L2 top-k") {
    val pq = SparkEntry.queries("e05_pq_ann")(spark, sf).collect()
    val byQ = pq.groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Long]("cid")).toSet).toMap
    // exact L2 top-10 per query, computed locally
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = byQ.map { case (qid, got) =>
      val exact = vecs.collect { case (cid, v) if cid != qid => (cid, l2(vecs(qid), v)) }
        .toSeq.sortBy { case (cid, d) => (d, cid) }.take(10).map(_._1).toSet
      (got & exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"mean PQ recall@10 $mean across ${recalls.size} queries")
    assert(recalls.count(_ >= 0.3) == recalls.size, s"worst-case recall too low: $recalls")
  }

  test("e06 IVF+PQ: candidates honor the probed cells; recall near the full PQ scan") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val (res, assign, probes, _, _) = graft.operators.IvfPq.searchWithIndex(
      emb, cells = 8, cellIterations = 3, nprobe = 3,
      m = 32, k = 32, pqIterations = 5, nQueries = 10, topK = 10)
    val cellOf = assign.collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    val probed = probes.collect().groupBy(_.getAs[Long]("qid"))
      .view.mapValues(_.map(_.getAs[Int]("cell")).toSet).toMap
    val rows = res.collect()
    assert(rows.nonEmpty)
    // every returned candidate must live in one of its query's probed cells
    rows.foreach { r =>
      val qid = r.getAs[Long]("qid"); val cid = r.getAs[Long]("cid")
      assert(probed(qid).contains(cellOf(cid)), s"$cid not in $qid's probed cells")
    }
    // probing 3 of 8 cells should stay near the full-scan PQ recall
    val vecs = emb.selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val recalls = rows.groupBy(_.getAs[Long]("qid")).map { case (qid, rs) =>
      val got = rs.map(_.getAs[Long]("cid")).toSet
      val exact = vecs.collect { case (cid, v) if cid != qid => (cid, l2(vecs(qid), v)) }
        .toSeq.sortBy { case (c, d) => (d, c) }.take(10).map(_._1).toSet
      (got & exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.55, s"mean IVF+PQ recall@10 $mean")
  }

  test("s05 stream-stream join equals the batch interval-join answer") {
    val streamed = SparkEntry.queries("s05_stream_stream_join")(spark, sf)
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_conversions")).toMap
    val e = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("tsu"), col("event_type"))
    val batch = e.filter(col("event_type") === "view").select(col("user_id"), col("tsu").as("vt"))
      .join(e.filter(col("event_type") === "purchase").select(col("user_id"), col("tsu").as("pt")),
        "user_id")
      .filter(col("pt") >= col("vt") && col("pt") <= col("vt") + 1800000000L)
      .groupBy("user_id").count()
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("count")).toMap
    assert(streamed == batch)
  }

  test("e08 two-stage re-rank: exact scores on survivors, ordered, useful recall") {
    val rows = SparkEntry.queries("e08_two_stage_rerank")(spark, sf).collect()
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    def score(q: Seq[Double], c: Seq[Double]): Long =
      q.zip(c).map { case (x, y) => math.floor(1000000 * x * y + 0.5).toLong }.sum
    // the full-dim score of every survivor is the EXACT integer score
    rows.foreach { r =>
      assert(r.getAs[Long]("full_e6") ==
        score(emb(r.getAs[Long]("qid")), emb(r.getAs[Long]("cid"))))
    }
    // ranks are dense 1..10 ordered by (full_e6 desc, cid)
    val recalls = rows.groupBy(_.getAs[Long]("qid")).map { case (qid, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("rank"))
      assert(byRank.map(_.getAs[Long]("rank")).toSeq == (1L to 10L))
      val keys = byRank.map(r => (-r.getAs[Long]("full_e6"), r.getAs[Long]("cid"))).toSeq
      assert(keys == keys.sorted, s"qid=$qid not ordered by score")
      // recall vs the exact full-dim top-10: the 16-dim coarse stage is a
      // genuine prefilter at this corpus size (500 vecs, coarseK=50), so
      // agreement is approximate by design — require a useful fraction
      val exact = emb.collect { case (cid, v) if cid != qid => (cid, score(emb(qid), v)) }
        .toSeq.sortBy { case (c, s) => (-s, c) }.take(10).map(_._1).toSet
      (byRank.map(_.getAs[Long]("cid")).toSet & exact).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean two-stage recall@10 $mean (coarse 16/64 dims)")
  }

  test("q40 distribution functions stay in range with exhaustive quartiles") {
    val rows = SparkEntry.queries("q40_window_distribution")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cd, qt) = (r.getAs[Long]("pr_e6"), r.getAs[Long]("cd_e6"), r.getAs[Long]("quartile"))
      assert(pr >= 0 && pr <= 1000000 && cd > 0 && cd <= 1000000 && qt >= 1 && qt <= 4)
    }
  }

  test("d25 shared-span pairs are ordered and meet the threshold; planted dups found") {
    val rows = SparkEntry.queries("d25_substring_dedup")(spark, sf).collect()
    assert(rows.nonEmpty, "testdata plants near-identical docs sharing 8-token spans")
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      assert(r.getAs[Long]("n_shared_spans") >= 2)
    }
  }

  test("d24 redaction only rewrites rows that matched; d26 keeps within totals") {
    val red = SparkEntry.queries("d24_redaction")(spark, sf)
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("event_id"), md5(col("props")).as("orig_md5"))
    val joined = red.join(ev, "event_id").collect()
    joined.foreach { r =>
      val changed = r.getAs[String]("redacted_md5") != r.getAs[String]("orig_md5")
      assert(changed == (r.getAs[Long]("n_redacted") > 0))
    }
    SparkEntry.queries("d26_source_mix")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_docs"))
    }
  }

  test("d27 bloom contamination: no false negatives vs d18's exact audit, bounded FPR") {
    val exact = SparkEntry.queries("d18_contamination")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_contaminated")).toMap
    val bloom = SparkEntry.queries("d27_bloom_contamination")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_hits"), r.getAs[Long]("n_shingles"))).toMap
    assert(bloom.keySet == exact.keySet)
    // one-sided error: every exact hit is a bloom hit
    bloom.foreach { case (id, (hits, _)) => assert(hits >= exact(id), s"doc $id lost hits") }
    // false-positive rate over the truly-clean probes stays near design (~1%)
    val fp = bloom.map { case (id, (hits, _)) => hits - exact(id) }.sum.toDouble
    val clean = bloom.map { case (id, (_, n)) => n - exact(id) }.sum.toDouble
    assert(fp / clean <= 0.05, s"bloom FPR ${fp / clean}")
  }

  test("d28 keeps >= 3/4 of each source, all at or above the p25 threshold") {
    val rows = SparkEntry.queries("d28_quantile_filter")(spark, sf).collect()
    rows.foreach(r => assert(r.getAs[Long]("n_chars") >= r.getAs[Long]("thr")))
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      // p25 cut keeps at least 3/4 (ties can keep more, never fewer)
      assert(rs.length >= (3 * total(src)) / 4, s"$src kept ${rs.length}/${total(src)}")
    }
  }

  test("e09 joins every doc to its embedding with exact integer norms") {
    val rows = SparkEntry.queries("e09_text_embedding_join")(spark, sf).collect()
    assert(rows.length == spark.read.parquet(s"$sf/documents.parquet").count())
    rows.foreach { r =>
      assert(r.getAs[Long]("norm_e6") >= 0)
      val expectKeep = {
        val n = r.getAs[Long]("n_chars")
        n >= 100 && n <= 400 && r.getAs[Long]("norm_e6") >= 1000000L
      }
      assert(r.getAs[Long]("keep") == (if (expectKeep) 1L else 0L))
    }
  }

  test("d29 incremental pairs = d06 pairs whose larger member is in the new batch") {
    val full = FuzzyDedup.minhashNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inc = SparkEntry.queries("d29_incremental_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = full.filter { case (_, b) => b >= FuzzyDedup.NewBatchMin }
    assert(inc == expected, s"diff: ${(inc diff expected) ++ (expected diff inc)}")
  }

  test("q41 lateral top-n equals the window-function answer") {
    val got = SparkEntry.queries("q41_lateral_topn")(spark, sf)
      .collect().map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Int]("l_linenumber"))).toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_linenumber"),
        expr("CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)").as("qty_c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy(col("qty_c").desc, col("l_linenumber").asc)
    val expected = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(spark.read.parquet(s"$sf/orders.parquet"), col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey", "l_linenumber")
      .collect().map(r => (r.getAs[Long]("o_orderkey"), r.getAs[Int]("l_linenumber"))).toSet
    assert(got == expected)
  }

  test("q42/q43: anomaly flags are per-user extremes; funnel stages strictly ordered") {
    val flagged = SparkEntry.queries("q42_anomaly_3sigma")(spark, sf).collect()
    flagged.foreach(r => assert(r.getAs[Long]("n") >= 1))
    // every flagged event must really sit beyond 3 population sigmas of
    // its user's distribution (independent double-domain recomputation)
    val byUser = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), expr("CAST(floor((value) * 100 + 0.5) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("cents")))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2.toDouble) }
    flagged.foreach { r =>
      val xs = byUser(r.getAs[Long]("user_id"))
      val mean = xs.sum / xs.size
      val sigma = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.size)
      assert(math.abs(r.getAs[Long]("cents") - mean) > 3 * sigma - 1e-6, s"not an outlier: $r")
    }
    SparkEntry.queries("q43_funnel_sequence")(spark, sf).collect().foreach { r =>
      val (v1, c1, p1) = (r.getAs[Long]("v1"), r.getAs[java.lang.Long]("c1"), r.getAs[java.lang.Long]("p1"))
      if (c1 != null) assert(c1 > v1)
      if (p1 != null) { assert(c1 != null); assert(p1 > c1) }
    }
  }

  test("s08 streaming contamination equals the batch d27 audit") {
    def asMap(name: String) = SparkEntry.queries(name)(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("contam_permille"))).toMap
    assert(asMap("s08_streaming_contamination") == asMap("d27_bloom_contamination"))
  }

  test("q56 two-phase sweep equals the single-window concurrency answer") {
    import org.apache.spark.sql.expressions.Window
    // naive formulation: ONE global cumsum window (fine at test scale) —
    // the two-phase plan must reproduce it exactly, hour for hour
    val wu = Window.partitionBy("user_id").orderBy(col("tsu").asc, col("event_id").asc)
    val sess = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), expr("ts div 1000").as("tsu"), col("event_id"))
      .withColumn("prev", lag(col("tsu"), 1).over(wu))
      .withColumn("new_s",
        when(col("prev").isNull || col("tsu") - col("prev") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(wu))
      .groupBy("user_id", "sid").agg(min("tsu").as("st"), max("tsu").as("en"))
    val deltas = sess.select(col("st").as("tsu"), lit(1L).as("delta"))
      .unionAll(sess.select((col("en") + 1).as("tsu"), lit(-1L).as("delta")))
    val naive = deltas
      .withColumn("conc", sum("delta").over(
        Window.orderBy(col("tsu").asc, col("delta").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(expr("tsu div 3600000000").as("hour"))
      .agg(max("conc").as("mc"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q56_peak_concurrency")(spark, sf)
      .collect().map(r => r.getAs[Long]("hour") -> r.getAs[Long]("max_concurrency")).toMap
    assert(got == naive, "two-phase sweep diverged from the global window")
    assert(got.values.max >= 2, "test data should have overlapping sessions")
  }

  test("q57 gini matches a direct per-nation window computation and stays in range") {
    import org.apache.spark.sql.expressions.Window
    val direct = {
      val cr = graft.queries.Tables.t(spark, sf, "orders")
        .select(col("o_custkey"),
          expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
        .groupBy("o_custkey").agg(sum("cents").as("cents"))
      graft.queries.Tables.t(spark, sf, "customer")
        .join(cr, col("c_custkey") === col("o_custkey"))
        .join(graft.queries.Tables.t(spark, sf, "nation"),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("i", row_number().over(
          Window.partitionBy("n_name").orderBy(col("cents").asc, col("c_custkey").asc))
          .cast("long"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"),
          sum(expr("i * cents")).as("w"))
        .select(col("n_name"),
          expr("CAST(1000 * (2 * w - (n + 1) * s) div (n * s) AS BIGINT)").as("g"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val got = SparkEntry.queries("q57_gini_concentration")(spark, sf)
      .collect().map(r => r.getAs[String]("n_name") -> r.getAs[Long]("gini_permille")).toMap
    assert(got == direct, "GlobalRank-derived gini diverged from the window formulation")
    got.values.foreach(g => assert(g >= 0 && g < 1000, s"gini out of range: $g"))
  }

  test("d36 vocab growth: cumulative columns reconcile with corpus totals") {
    val docs = graft.queries.Tables.t(spark, sf, "documents")
    val totalWords = docs.select(explode(split(col("text"), " ")).as("w"))
      .agg(countDistinct("w")).head().getLong(0)
    val totalTokens = docs.select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).head().getLong(0)
    val rows = SparkEntry.queries("d36_vocab_growth")(spark, sf)
      .orderBy("bucket").collect()
    assert(rows.map(_.getAs[Long]("new_words")).sum == totalWords)
    assert(rows.last.getAs[Long]("vocab_size") == totalWords)
    assert(rows.last.getAs[Long]("tokens_cum") == totalTokens)
    // vocab_size is a cumsum: strictly the running total of new_words
    val cum = rows.map(_.getAs[Long]("new_words")).scanLeft(0L)(_ + _).drop(1)
    assert(rows.map(_.getAs[Long]("vocab_size")).sameElements(cum))
  }

  test("d37 novelty: first doc fully novel; novel counts sum to the distinct gram total") {
    val rows = SparkEntry.queries("d37_ngram_novelty")(spark, sf).collect()
    val byDoc = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_grams"), r.getAs[Long]("n_novel"))).toMap
    val firstDoc = byDoc.keys.min
    assert(byDoc(firstDoc)._1 == byDoc(firstDoc)._2, "earliest doc must be 100% novel")
    byDoc.values.foreach { case (g, n) => assert(n <= g) }
    // each distinct 5-gram is novel in exactly one doc (its first)
    val distinctGrams = graft.queries.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 5)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))")).as("g"))
      .agg(countDistinct("g")).head().getLong(0)
    assert(byDoc.values.map(_._2).sum == distinctGrams)
  }

  test("m10 patches: grid size follows the raster height; sums bounded by 8-bit depth") {
    val byDoc = SparkEntry.queries("m10_image_patches")(spark, sf).collect()
      .groupBy(_.getAs[Long]("media_id"))
    assert(byDoc.nonEmpty)
    val lens = graft.queries.Tables.t(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, rows) =>
      val h = math.max((lens(id) + 31) / 32, 1)
      assert(rows.length == (h / 8) * 4,
        s"doc $id: ${rows.length} patches for raster height $h")
      rows.foreach(r => assert(r.getAs[Long]("pixel_sum") <= 255L * 64))
    }
  }

  test("e11 recall audit: hits are the true exact∩approx intersection per query") {
    val exact = VectorOps.cosineTopK(spark, sf, nQueries = 20, k = 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = VectorOps.bucketedAnn(spark, sf, nQueries = 20, k = 10)
      .collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val rows = SparkEntry.queries("e11_ann_recall")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (qid, nExact, nHits, rec) = (r.getAs[Long]("qid"), r.getAs[Long]("n_exact"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_permille"))
      val want = (exact(qid) & approx.getOrElse(qid, Set.empty)).size.toLong
      assert(nExact == exact(qid).size.toLong)
      assert(nHits == want, s"qid=$qid hits $nHits != $want")
      assert(rec == 1000L * nHits / nExact)
    }
  }

  test("q68 CMS join estimate: upper-bounds the true join size, below the full cross product") {
    val r = SparkEntry.queries("q68_cms_join_estimate")(spark, sf).collect().head
    val (t, e) = (r.getAs[Long]("true_join_rows"), r.getAs[Long]("cms_estimate"))
    // AMS/CMS inner-product guarantee: hash collisions only inflate
    assert(e >= t, s"join-size estimate underestimated: est=$e true=$t")
    val na = graft.queries.Tables.events(spark, sf).count()
    val nb = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(e <= na * nb, s"estimate above the cross product: $e > ${na * nb}")
    assert(t > 0, "fixture join is non-empty by construction")
  }

  test("q63 CMS: every estimate upper-bounds the true count and is bounded by N") {
    val rows = SparkEntry.queries("q63_cms_heavy_hitters")(spark, sf).collect()
    assert(rows.length == 10)
    val total = graft.queries.Tables.events(spark, sf).count()
    rows.foreach { r =>
      val (t, e) = (r.getAs[Long]("true_cnt"), r.getAs[Long]("cms_est"))
      // the CMS one-sided error guarantee: collisions only inflate
      assert(e >= t, s"CMS underestimated: est=$e true=$t")
      assert(e <= total, s"estimate above the event total: $e > $total")
    }
  }

  test("q64 merge: statuses partition keys correctly, deleted keys are absent") {
    import graft.queries.PipelineOps
    val rows = SparkEntry.queries("q64_merge_upsert")(spark, sf).collect()
    val latest = PipelineOps.latestChanges(PipelineOps.changeFeed(spark, sf))
      .collect().map(r => r.getAs[Long]("custkey") ->
        (r.getAs[String]("op"), r.getAs[Long]("bal_cents"))).toMap
    val thr = PipelineOps.mergeBase(spark, sf)
      .agg(max("custkey")).head().getLong(0) + 1
    assert(Set("kept", "updated", "inserted").subsetOf(
      rows.map(_.getAs[String]("row_status")).toSet),
      "all three merge outcomes must be exercised by the fixture")
    rows.foreach { r =>
      val (k, st, bal) = (r.getAs[Long]("c_custkey"),
        r.getAs[String]("row_status"), r.getAs[Long]("bal_cents"))
      st match {
        case "kept" => assert(!latest.contains(k) && k < thr)
        case "updated" =>
          assert(k < thr && latest(k)._1 == "U" && bal == latest(k)._2)
        case "inserted" =>
          assert(k >= thr && latest(k)._1 == "U" && bal == latest(k)._2)
      }
    }
    // a matched delete removes the row; an unmatched delete inserts nothing
    val present = rows.map(_.getAs[Long]("c_custkey")).toSet
    latest.collect { case (k, ("D", _)) => k }
      .foreach(k => assert(!present.contains(k), s"deleted key $k still present"))
  }

  test("s16 streaming CDC apply lands exactly the batch MERGE snapshot") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("c_custkey"), r.getAs[String]("c_name"),
        r.getAs[Long]("bal_cents"), r.getAs[String]("row_status"))
    val batch = SparkEntry.queries("q64_merge_upsert")(spark, sf).collect().map(key).sorted
    val streamed = SparkEntry.queries("s16_stream_cdc_apply")(spark, sf).collect().map(key).sorted
    assert(streamed.nonEmpty && streamed.sameElements(batch),
      s"streaming CDC diverged from batch MERGE: ${streamed.length} vs ${batch.length} rows")
  }

  test("d39 semdedup: keep-first per cluster, drops exist and verdicts are exhaustive") {
    val rows = SparkEntry.queries("d39_semdedup")(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => Set(0L, 1L).contains(r.getAs[Long]("kept"))))
    assert(rows.exists(_.getAs[Long]("kept") == 0L),
      "synthetic corpus has planted near-dups; some must be dropped")
    // keep-first: the lowest vec_id of every cluster has no lower-id mate,
    // so it can never be dropped
    rows.groupBy(_.getAs[Int]("cell")).foreach { case (cell, members) =>
      val first = members.minBy(_.getAs[Long]("vec_id"))
      assert(first.getAs[Long]("kept") == 1L,
        s"cell $cell: lowest-id member ${first.getAs[Long]("vec_id")} was dropped")
    }
  }

  test("q74 HDR sketch: percentile bounds hold the ≤1/16 relative-error envelope") {
    val rows = SparkEntry.queries("q74_hdr_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    // exact per-type cents (clamped ≥ 1 exactly as the sketch does)
    val cents = graft.queries.Tables.events(spark, sf)
      .selectExpr("event_type",
        "greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 1L) AS c")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val xs = cents(et)
      assert(r.getAs[Long]("n_events") == xs.length.toLong)
      val ps = Seq(50 -> r.getAs[Long]("p50_lo_c"),
        90 -> r.getAs[Long]("p90_lo_c"), 99 -> r.getAs[Long]("p99_lo_c"))
      // quantiles are monotone
      assert(ps.map(_._2) == ps.map(_._2).sorted, s"$et: ${ps.map(_._2)}")
      ps.foreach { case (p, lo) =>
        // the exact rank-r value lives inside the reported bucket:
        // [lo, lo + width) with width = 1 below 32 and ≤ lo/16 above
        val exact = xs((xs.length * p + 99) / 100 - 1)
        val width = math.max(1L, lo / 16)
        assert(lo <= exact && exact < lo + width,
          s"$et p$p: lo=$lo exact=$exact width=$width")
      }
    }
  }

  test("q75 triangle count equals the brute-force a<b<c enumeration") {
    val row = SparkEntry.queries("q75_triangle_count")(spark, sf).collect().head
    // brute force: all unordered vertex triples with all three edges
    val und = graft.queries.GraphOps.q47Edges(spark, sf)
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().collect().map(r => (r.getString(0), r.getString(1))).toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    var brute = 0L
    for {
      i <- verts.indices; j <- (i + 1) until verts.size
      if und((verts(i), verts(j)))
      k <- (j + 1) until verts.size
      if und((verts(j), verts(k))) && und((verts(i), verts(k)))
    } brute += 1
    assert(row.getAs[Long]("n_triangles") == brute,
      s"oriented count ${row.getAs[Long]("n_triangles")} != brute $brute")
    assert(row.getAs[Long]("n_edges") == und.size.toLong)
    assert(brute > 0, "trade graph should contain triangles")
  }

  test("d42 BM25: top-10 is ordered, every hit matches a query term, scores positive") {
    val rows = SparkEntry.queries("d42_bm25")(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.sameElements(scores.sorted.reverse), "not score-descending")
    assert(scores.forall(_ > 0L))
    rows.foreach { r =>
      val t = r.getAs[Long]("n_terms")
      assert(t >= 1L && t <= 3L, s"n_terms $t out of [1,3]")
    }
    // a doc that matches more of the query's terms at equal length should
    // be findable: the top hit must match at least 2 of the 3 widest terms
    // (the widest terms cover most docs — a 1-term top hit would mean the
    // tf normalization collapsed)
    assert(rows.head.getAs[Long]("n_terms") >= 2L)
  }

  test("e14 hybrid RRF equals a naive driver-side two-ranker fusion") {
    val res = SparkEntry.queries("e14_hybrid_rrf")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("cid")) ->
        r.getAs[Long]("rrf_score")).toMap
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    val words = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "array_distinct(split(text, ' ')) AS wd")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toSet)
      .toMap.view.filterKeys(vecs.contains).toMap
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      round4(dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum)))
    }
    val expected = (0L until 10L).flatMap { q =>
      val ra = vecs.keys.filter(_ != q).toSeq
        .map(c => c -> cos(vecs(q), vecs(c)))
        .sortBy { case (c, s) => (-s, c) }.take(20).map(_._1)
      val rb = words.keys.filter(_ != q).toSeq
        .map { c =>
          val inter = (words(q) & words(c)).size.toLong
          c -> 1000000L * inter / (words(q).size + words(c).size - inter)
        }
        .sortBy { case (c, s) => (-s, c) }.take(20).map(_._1)
      val contrib = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      ra.zipWithIndex.foreach { case (c, i) => contrib(c) += 1000000000L / (60 + i + 1) }
      rb.zipWithIndex.foreach { case (c, i) => contrib(c) += 1000000000L / (60 + i + 1) }
      contrib.toSeq.sortBy { case (c, s) => (-s, c) }.take(10)
        .map { case (c, s) => (q, c) -> s }
    }.toMap
    assert(res == expected)
    // the fusion must be non-degenerate: some fused row carries BOTH arms
    // (score > a single rank-1 contribution), so the lexical arm genuinely
    // reorders the dense ranking
    assert(res.values.exists(_ > 1000000000L / 61),
      "no candidate was ranked by both arms — fusion is degenerate")
  }

  test("d50 MMR: greedy invariants hold and diversity genuinely reorders top-k") {
    val rows = SparkEntry.queries("d50_mmr_diversify")(spark, sf).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(rows.map(_.getAs[Long]("step")).toSeq == (1L to 10L))
    val picked = rows.map(_.getAs[Long]("cid"))
    assert(picked.distinct.length == 10, "a candidate was picked twice")
    assert(!picked.contains(0L), "the query vector itself was picked")
    // mmr scores are non-increasing ONLY for step>=2 relative to what a
    // pure-relevance pick would give; the hard invariant is: step 1 is the
    // single most relevant candidate, and the selection diverges from the
    // pure top-10-by-relevance (diversity term does real work)
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1).toArray).toMap
    def relE4(a: Array[Double], b: Array[Double]): Long = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val c = dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
      val r4 = BigDecimal(c).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      math.floor(r4 * 10000 + 0.5).toLong
    }
    val rels = vecs.keys.filter(_ != 0L)
      .map(c => c -> relE4(vecs(0L), vecs(c))).toMap
    val topByRel = rels.toSeq.sortBy { case (c, r) => (-r, c) }.take(10).map(_._1)
    assert(picked.head == topByRel.head, "step 1 must be the most relevant")
    assert(picked.toSet != topByRel.toSet,
      "MMR picked exactly the relevance top-10 — diversity term did nothing")
    // full naive replay: greedy argmax over the top-40 shortlist
    val short = rels.toSeq.sortBy { case (c, r) => (-r, c) }.take(40).map(_._1)
    var chosen = Vector.empty[Long]
    val expect = (1 to 10).map { step =>
      val best = short.filterNot(chosen.contains).map { c =>
        val sc = if (chosen.isEmpty) 7L * rels(c)
          else 7L * rels(c) - 3L * chosen.map(b => relE4(vecs(c), vecs(b))).max
        (c, sc)
      }.minBy { case (c, sc) => (-sc, c) }
      chosen :+= best._1
      (step.toLong, best._1, best._2)
    }
    assert(rows.map(r => (r.getAs[Long]("step"), r.getAs[Long]("cid"),
      r.getAs[Long]("mmr_e4"))).toSeq == expect)
  }

  test("q82 k-core: fixpoint reached, equals a naive driver-side peel") {
    val rows = SparkEntry.queries("q82_kcore")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("core_deg")).toMap
    // independent edge list via the d05 operator the query composes on
    val edges = SparkEntry.queries("d05_ngram_jaccard")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    // naive peel to TRUE fixpoint (unbounded rounds): if the query's 8
    // unrolled rounds didn't converge at this SF this comparison fails
    var g = edges.toSet
    var changed = true
    while (changed) {
      val deg = g.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.collect { case (n, d) if d >= 2 => n }.toSet
      val g2 = g.filter(e => keep(e._1) && keep(e._2))
      changed = g2 != g
      g = g2
    }
    val expect = g.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(rows == expect)
    assert(rows.nonEmpty, "the planted near-dup clusters should yield a 2-core")
    assert(rows.values.forall(_ >= 2L), "a survivor below k peeled nothing")
  }

  test("d49 boilerplate scrub equals a naive driver-side positional scrub") {
    val res = SparkEntry.queries("d49_boilerplate_scrub")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_kept"), r.getAs[String]("kept_md5"))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "split(text, ' ') AS ws")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1).toArray).toMap
    def shingles(ws: Array[String]): Seq[(Int, String)] =
      if (ws.length < 5) Nil
      else (0 to ws.length - 5).map(i => i -> ws.slice(i, i + 5).mkString(" "))
    val freq = docs.toSeq
      .flatMap { case (d, ws) => shingles(ws).map(_._2).distinct.map(_ -> d) }
      .groupBy(_._1).collect { case (sh, ds) if ds.map(_._2).distinct.size >= 3 => sh }
      .toSet
    def md5(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    assert(res.size == docs.size)
    docs.foreach { case (d, ws) =>
      val covered = shingles(ws).collect {
        case (i, sh) if freq(sh) => i until (i + 5)
      }.flatten.toSet
      val kept = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      assert(res(d) == (kept.length.toLong, md5(kept.mkString(" "))), s"doc $d")
    }
    // the scrub must actually remove something at this SF
    assert(docs.exists { case (d, ws) => res(d)._1 < ws.length })
  }
}
