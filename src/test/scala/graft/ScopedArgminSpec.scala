package graft

import org.apache.spark.sql.functions._

/** Round-17 scoping of the ObjectHashAggregate fallback threshold
  * (r16 verdict #3): the raised threshold must ride a session CLONE
  * attached to argmin-bearing frames, never the caller's session.
  */
class ScopedArgminSpec extends SparkFunSuite {
  import graft.functions.MinStructAgg

  test("scoped() re-roots into a clone carrying the raised threshold; parent keeps default") {
    val df = spark.range(10).selectExpr("id % 3 AS k", "id AS v")
    val s = MinStructAgg.scoped(df)
    assert(s.sparkSession ne spark)
    assert(s.sparkSession.conf.get(MinStructAgg.FallbackKey) ===
      MinStructAgg.FallbackThreshold.toString)
    // the parent session's conf is untouched (Spark default is 128)
    assert(spark.conf.get(MinStructAgg.FallbackKey) === "128")
    // same SparkContext (caches/accumulators/broadcasts shared)
    assert(s.sparkSession.sparkContext eq spark.sparkContext)
    // rows unchanged by the re-root
    assert(s.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("scoped() is idempotent and caches one clone per parent") {
    val a = MinStructAgg.scoped(spark.range(5).toDF())
    val b = MinStructAgg.scoped(spark.range(7).toDF())
    assert(a.sparkSession eq b.sparkSession)
    // re-scoping a frame already in the clone is a no-op
    val again = MinStructAgg.scoped(a)
    assert(again eq a)
  }

  test("firstFragments output executes under the clone (fused-stats collect path)") {
    import PcapFixtures._
    val first = ethernet(0x0800, ipv4("198.51.100.7", "192.0.2.9", 17,
      udp(53, 41000, dnsQuery("s.example.org", 1)), id = 77, mf = true))
    val tail = ethernet(0x0800, ipv4("198.51.100.7", "192.0.2.9", 17,
      Array.fill[Byte](16)(0x42), id = 77, mf = false, fragOffset = 5))
    val dir = java.nio.file.Files.createTempDirectory("scopedargmin")
    val f = dir.resolve("p.pcap")
    java.nio.file.Files.write(f, legacyPcap(Seq((1L, -1, first), (2L, -1, tail))))
    val pcap = graft.spark.PcapSource.read(spark, f.toString)
    // round 17: the ff site ships the declarative argmin (SortAggregate)
    // — the scoping must still hold for the forced-MinStructAgg A/B arm
    sys.props("graft.agg.ffMinStruct") = "1"
    try {
      val ff = graft.spark.Defrag.firstFragments(pcap)
      assert(ff.sparkSession ne pcap.sparkSession)
      assert(ff.sparkSession.conf.get(MinStructAgg.FallbackKey) ===
        MinStructAgg.FallbackThreshold.toString)
      // the forced argmin PLANS as ObjectHashAggregate under the clone
      val plan = ff.queryExecution.executedPlan.toString
      assert(plan.contains("ObjectHashAggregate"), plan.take(500))
      assert(!plan.contains("SortAggregate"), plan.take(500))
    } finally { sys.props.remove("graft.agg.ffMinStruct"); () }
    // the shipped default plans the declarative SortAggregate form
    val dplan = graft.spark.Defrag.firstFragments(pcap)
      .queryExecution.executedPlan.toString
    assert(dplan.contains("SortAggregate"), dplan.take(500))
  }

  test("KMeansIvf results execute under the clone, caller session untouched") {
    val emb = spark.range(0, 40).selectExpr("id AS vec_id",
      "array(CAST(id % 7 AS DOUBLE), CAST(id % 5 AS DOUBLE), 1.0D) AS embedding")
    val (centroids, assigned) = graft.operators.KMeansIvf.fit(emb, 4, 2)
    assert(assigned.sparkSession.conf.get(MinStructAgg.FallbackKey) ===
      MinStructAgg.FallbackThreshold.toString)
    assert(spark.conf.get(MinStructAgg.FallbackKey) === "128")
    // every point assigned exactly once, to a live cell
    val cells = centroids.select("cell").collect().map(_.getInt(0)).toSet
    val rows = assigned.select("vec_id", "cell").collect()
    assert(rows.length === 40)
    assert(rows.map(_.getInt(1)).forall(cells.contains))
  }
}
