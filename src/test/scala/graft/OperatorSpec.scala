package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, JaccardAllPairs, SaltedJoin}

/** Operator-level equivalence tests: each custom operator against a
  * brute-force reference implementation on randomized inputs.
  */
class OperatorSpec extends SparkFunSuite {

  test("AsOfJoin equals the brute-force per-row search on random data") {
    import spark.implicits._
    for (seed <- Seq(1, 42, 7)) {
      val rnd = new Random(seed)
      val left = (1 to 200).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val right = (1 to 300).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, 1000L + i))
      val l = left.toDF("k", "ts", "lid")
      val r = right.toDF("k", "ts", "rid")
      val got = AsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"))
        .select("lid", "asof_ts", "asof_rid")
        .collect()
        .map(x => (x.getLong(0),
          Option(x.get(1)).map(_.asInstanceOf[Long]),
          Option(x.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      val expected = left.map { case (k, ts, lid) =>
        val candidates = right.filter(rr => rr._1 == k && rr._2 <= ts)
        if (candidates.isEmpty) (lid, None, None)
        else {
          // max by (ts, rid): mirrors the operator's struct ordering
          val best = candidates.maxBy(c => (c._2, c._3))
          (lid, Some(best._2), Some(best._3))
        }
      }.toSet
      assert(got == expected, s"seed=$seed")
    }
  }

  test("PhysicalAsOfJoin (custom SparkPlan) equals brute force and the composed operator") {
    import spark.implicits._
    for (seed <- Seq(1, 42, 7)) {
      val rnd = new Random(seed)
      val left = (1 to 200).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, i.toLong))
      val right = (1 to 300).map(i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(1000).toLong, 1000L + i))
      val l = left.toDF("k", "ts", "lid")
      val r = right.toDF("k", "ts", "rid")
      val phys = graft.plans.PhysicalAsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"))
      // the strategy must actually plan the custom node
      // the strategy plans the custom exec (nodeName renders as "AsOfJoin",
      // with no "!" invalid-plan marker)
      val planStr = phys.queryExecution.executedPlan.toString
      assert(planStr.contains("AsOfJoin") && !planStr.contains("!AsOfJoin"), planStr)
      val got = phys.select("lid", "asof_ts", "asof_rid").collect()
        .map(x => (x.getLong(0),
          Option(x.get(1)).map(_.asInstanceOf[Long]),
          Option(x.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      val expected = left.map { case (k, ts, lid) =>
        val candidates = right.filter(rr => rr._1 == k && rr._2 <= ts)
        if (candidates.isEmpty) (lid, None, None)
        else {
          // ties on ts: the sorted merge keeps the LAST right row at that
          // ts, which under the (ts, rid) sort is max rid — same rule as
          // the composed operator's struct ordering
          val best = candidates.maxBy(c => (c._2, c._3))
          (lid, Some(best._2), Some(best._3))
        }
      }.toSet
      assert(got == expected, s"seed=$seed")
      val composed = AsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"))
        .select("lid", "asof_ts", "asof_rid").collect()
        .map(x => (x.getLong(0),
          Option(x.get(1)).map(_.asInstanceOf[Long]),
          Option(x.get(2)).map(_.asInstanceOf[Long])))
        .toSet
      assert(got == composed, s"seed=$seed: physical != composed")
    }
  }

  test("PhysicalAsOfJoin: duplicate (key, ts) right rows tie-break to max payload, deterministically") {
    import spark.implicits._
    // 40 right rows ALL at the same (key, ts): without the payload in the
    // right child's required ordering, the merge kept whichever duplicate
    // the shuffle happened to deliver last — nondeterministic, and free to
    // diverge from the composed operator's max(struct(ts, payload)) rule
    val l = Seq((1L, 10L, 1L), (1L, 9L, 2L)).toDF("k", "ts", "lid")
    val r = (1 to 40).map(i => (1L, 9L, 100L + i)).toDF("k", "ts", "rid")
    (1 to 3).foreach { _ =>
      val got = graft.plans.PhysicalAsOfJoin(
        l.repartition(7), r.repartition(5), Seq("k"), "ts", "ts", Seq("rid"))
        .select("lid", "asof_rid").collect()
        .map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(got == Map(1L -> 140L, 2L -> 140L), got.toString)
    }
  }

  test("PhysicalAsOfJoin: null timestamps never match") {
    import spark.implicits._
    val l = Seq((1L, Some(10L), 1L), (1L, Option.empty[Long], 2L), (2L, Some(5L), 3L))
      .toDF("k", "ts", "lid")
    val r = Seq((1L, Some(8L), 100L), (1L, Option.empty[Long], 101L), (3L, Some(1L), 102L))
      .toDF("k", "ts", "rid")
    val got = graft.plans.PhysicalAsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid"))
      .select("lid", "asof_rid").collect()
      .map(x => x.getLong(0) -> Option(x.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(got == Map(1L -> Some(100L), 2L -> None, 3L -> None), got.toString)
  }

  test("PhysicalAsOfJoin rejects mismatched ts/key types loudly") {
    import spark.implicits._
    // the merge reads ts/keys at fixed widths — an INT right ts against a
    // BIGINT left ts would silently corrupt asof_ts if it ever planned
    val l = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val rIntTs = Seq((1L, 8, 100L)).toDF("k", "ts", "rid")
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.PhysicalAsOfJoin(l, rIntTs, Seq("k"), "ts", "ts", Seq("rid"))
    }
    assert(e1.getMessage.contains("ts type mismatch"), e1.getMessage)
    val rIntKey = Seq((1, 8L, 100L)).toDF("k", "ts", "rid")
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.PhysicalAsOfJoin(l, rIntKey, Seq("k"), "ts", "ts", Seq("rid"))
    }
    assert(e2.getMessage.contains("key type mismatch"), e2.getMessage)
  }

  test("IndexStore: a reloaded PQ index scores identically to the just-learned one") {
    // the restartable-vector-store property (SURVEY §9 round-6 #4):
    // learning is the expensive half; a later session reloads the saved
    // codebooks/codes and ADC-scores bit-identically, no Lloyd re-run
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (res, cbs, codes) = graft.operators.PqAnn.searchWithIndex(
      emb, m = 8, k = 8, iterations = 2, nQueries = 5, topK = 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).toSet
    val want = canon(res)
    assert(want.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_index_store").toString
    graft.operators.IndexStore.save(dir, "codebooks" -> cbs, "codes" -> codes)
    cbs.unpersist(); codes.unpersist()
    val cb2 = graft.operators.IndexStore.load(spark, dir, "codebooks")
    val codes2 = graft.operators.IndexStore.load(spark, dir, "codes")
    val dsub = graft.operators.IndexStore.dsubOf(cb2)
    val got = canon(graft.operators.PqAnn.adcScore(
      codes2, graft.operators.PqAnn.queryTables(emb, cb2, dsub, 5), 5))
    assert(got == want)
  }

  test("JaccardAllPairs: dense and join paths agree exactly") {
    val sh = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val dense = canon(JaccardAllPairs(sh, 500))
    val joined = canon(JaccardAllPairs(sh, 500, maxDenseVocab = 0)) // force join path
    assert(dense == joined && dense.nonEmpty)
    // prefix filtering must stay exact at other thresholds too
    for (t <- Seq(100, 800)) {
      assert(canon(JaccardAllPairs(sh, t)) ==
        canon(JaccardAllPairs(sh, t, maxDenseVocab = 0)), s"t=$t")
    }
  }

  test("JaccardAllPairs: prefix-filtered join equals dense on random corpora") {
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    for (seed <- Seq(7, 31)) {
      val rnd = new Random(seed)
      // Zipf-ish shingle popularity: low hash values are shared widely,
      // so prefixes and high-df shingles both occur
      val rows = (0 until 80).flatMap { d0 =>
        val n = 3 + rnd.nextInt(12)
        (0 until n).map(_ => (d0.toLong, (rnd.nextInt(40) * rnd.nextInt(40)).toLong))
      }
      val sh = rows.toDF("doc_id", "h")
      for (t <- Seq(150, 500, 900)) {
        assert(canon(JaccardAllPairs(sh, t)) ==
          canon(JaccardAllPairs(sh, t, maxDenseVocab = 0)),
          s"seed=$seed t=$t")
      }
    }
  }

  test("JaccardAllPairs prefix filter: planted stop-word shingle stays bounded") {
    import spark.implicits._
    // 120 docs, each carrying the same 3 stop shingles (df≥120) plus 20
    // unique ones; docs 200..204 are exact clones of docs 0..4. A raw
    // shingle self-equijoin streams 3·C(125,2) ≈ 23k pairs from the stop
    // shingles alone; with the (df ASC, h ASC) canonical order the stop
    // shingles sort LAST inside every doc, so at t=0.5 (prefix = 12 of 23
    // shingles) they never enter a prefix and the candidate stream is
    // just the clone pairs found via their unique shingles.
    val rows = (0 until 120).flatMap { d0 =>
      (Seq(-1L, -2L, -3L) ++ (0 until 20).map(i => (d0 * 100 + i).toLong))
        .map(h => (d0.toLong, h))
    } ++ (0 until 5).flatMap { d0 =>
      (Seq(-1L, -2L, -3L) ++ (0 until 20).map(i => (d0 * 100 + i).toLong))
        .map(h => (200L + d0, h))
    }
    val sh = rows.toDF("doc_id", "h")
    val cand = JaccardAllPairs.candidates(sh, 500)
    val nCand = cand.count()
    assert(nCand <= 10, s"stop-word shingles leaked into prefixes: $nCand candidates")
    // exactness: the bounded path still finds exactly the clone pairs
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = canon(JaccardAllPairs(sh, 500, maxDenseVocab = 0))
    val expected = (0 until 5).map(d0 => (d0.toLong, 200L + d0, 1000L)).toSet
    assert(got == expected, s"got=$got")
    assert(got == canon(JaccardAllPairs(sh, 500)))
  }

  test("SaltedJoin left/outer types preserved") {
    import spark.implicits._
    val l = Seq((1L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "lv")
    val r = Seq((1L, "X"), (2L, "Y")).toDF("k", "rv")
    val inner = SaltedJoin(l, r, Seq("k"), 4).orderBy("k", "lv").collect()
    assert(inner.length == 3)
    val leftJoin = SaltedJoin(l, r, Seq("k"), 4, "left").orderBy("k", "lv").collect()
    assert(leftJoin.length == 4)
    assert(leftJoin.last.isNullAt(2)) // k=3 has no match
  }

  test("SaltedJoin: byte-identical hot-key rows still join correctly (round-robin salt)") {
    import spark.implicits._
    // the canonical worst case the operator exists for: one hot key whose
    // rows are byte-identical. The old column-hash salt sent every copy
    // to ONE reducer (zero mitigation); round-robin spreads them, and the
    // result must equal the plain join regardless of salt routing
    val l = Seq.fill(200)((7L, "dup")).toDF("k", "lv")
    val r = Seq((7L, "X"), (8L, "Y")).toDF("k", "rv")
    val got = SaltedJoin(l, r, Seq("k"), 8).collect()
    assert(got.length == 200 && got.forall(_.getString(2) == "X"))
  }

  test("MergeInto: a NULL delete predicate is not a delete (SQL MERGE semantics)") {
    import spark.implicits._
    val base = Seq((1L, 10L), (2L, 20L)).toDF("custkey", "v")
    // op NULL on a matched key and on a source-only key: pre-fix the
    // filter evaluated to NULL and silently DROPPED both rows (the
    // matched base row vanished; the insert was suppressed)
    val source = Seq((1L, 11L, null.asInstanceOf[String]),
      (3L, 30L, null.asInstanceOf[String]),
      (2L, 0L, "D")).toDF("custkey", "v", "op")
    val merged = graft.operators.MergeInto(
      base, source, "custkey",
      deleteWhen = col("s.op") === "D",
      outCols = Seq(
        "custkey" -> ((col("s.custkey"), col("b.custkey"), col("s.custkey"))),
        "v" -> ((col("s.v"), col("b.v"), col("s.v")))))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == Map(1L -> 11L, 3L -> 30L), merged.toString)
  }

  test("MergeInto: a NULL-key source row inserts, never fabricates an all-null keep row") {
    import spark.implicits._
    val base = Seq((1L, 10L)).toDF("custkey", "v")
    // pre-fix the NULL-key source row was classified base-only (sk.isNull)
    // and emitted a keep row built from the ABSENT base side: all nulls
    val source = Seq((Option.empty[Long], 99L, "U")).toDF("custkey", "v", "op")
    val merged = graft.operators.MergeInto(
      base, source, "custkey",
      deleteWhen = col("s.op") === "D",
      outCols = Seq(
        "custkey" -> ((col("s.custkey"), col("b.custkey"), col("s.custkey"))),
        "v" -> ((col("s.v"), col("b.v"), col("s.v")))))
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
      .toMap
    // kept base row + the NULL-key row as an INSERT (SQL NOT MATCHED)
    assert(merged == Map(Some(1L) -> 10L, None -> 99L), merged.toString)
  }

  test("AsOfJoin: a NULL-ts right row is no candidate (no phantom payload)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 1L)).toDF("k", "ts", "lid")
    val r = Seq((1L, Option.empty[Long], 777L)).toDF("k", "ts", "rid")
    // pre-fix: struct(NULL, 777) sorted first, sat in every frame, and
    // max() returned it when no real candidate preceded — asof_ts NULL
    // but asof_rid populated. Both implementations must emit no match.
    val composed = AsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid")).collect()
    assert(composed.length == 1 && composed.head.isNullAt(3) && composed.head.isNullAt(4),
      composed.mkString)
    val phys = graft.plans.PhysicalAsOfJoin(l, r, Seq("k"), "ts", "ts", Seq("rid")).collect()
    assert(phys.length == 1 && phys.head.isNullAt(3) && phys.head.isNullAt(4),
      phys.mkString)
  }

  test("ConnectedComponents: exhausting maxIterations without a fixpoint refuses loudly") {
    import spark.implicits._
    // a 30-edge chain cannot converge in 3 min-label rounds; pre-fix the
    // operator returned a silently SPLIT component (labels look valid)
    val chain = (0 until 30).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val err = intercept[IllegalArgumentException] {
      graft.operators.ConnectedComponents(chain, maxIterations = 3).collect()
    }
    assert(err.getMessage.contains("fixpoint"), err.getMessage)
  }

  test("KMeansIvf: a cell that loses every point keeps its centroid (no index shrink)") {
    import spark.implicits._
    // seeds 0 and 1 are identical vectors, so every point tie-breaks into
    // one cell and the other captures nothing — pre-fix the Lloyd update
    // emitted only assigned cells and the index silently shrank below k
    val emb = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(1.0, 0.0)),
      (2L, Seq(0.0, 1.0)), (3L, Seq(0.0, 1.0))).toDF("vec_id", "embedding")
    val (centroids, assigned) = graft.operators.KMeansIvf.fit(emb, k = 2, iterations = 2)
    assert(centroids.count() == 2, "empty cell dropped from the index")
    assert(assigned.count() == 4)
  }

  test("ConnectedComponents equals union-find on random graphs") {
    import spark.implicits._
    for (seed <- Seq(3, 99)) {
      val rnd = new Random(seed)
      val edges = (1 to 150).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
        .filter(e => e._1 != e._2)
      val got = graft.operators.ConnectedComponents(edges.toDF("a", "b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(n => n -> find(n)).toMap
      assert(got == expected, s"seed=$seed")
    }
  }

  test("shortestPaths equals Floyd-Warshall on random weighted digraphs") {
    import spark.implicits._
    for (seed <- Seq(7, 42)) {
      val rnd = new Random(seed)
      val n = 10
      val edges = (1 to 40).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1L + rnd.nextInt(100)))
        .filter(e => e._1 != e._2).distinct
      val src = edges.flatMap(e => Seq(e._1, e._2)).min
      // rounds = node count bounds any shortest path's hop length
      val dist = graft.queries.GraphOps.shortestPaths(
          edges.toDF("src", "dst", "cost"),
          Seq(src).toDF("s0"), rounds = n)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // Floyd-Warshall reference over the observed node set
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val inf = 1000000000000000L
      val d = scala.collection.mutable.Map[(Long, Long), Long]()
        .withDefaultValue(inf)
      nodes.foreach(v => d((v, v)) = 0L)
      edges.foreach { case (a, b, c) => d((a, b)) = math.min(d((a, b)), c) }
      for (k <- nodes; i <- nodes; j <- nodes)
        if (d((i, k)) + d((k, j)) < d((i, j))) d((i, j)) = d((i, k)) + d((k, j))
      val expected = nodes.map(v => v -> d((src, v))).toMap
      assert(dist == expected, s"seed=$seed src=$src")
    }
  }

  test("two-phase CC equals union-find on random graphs and needs O(log) rounds on chains") {
    import spark.implicits._
    for (seed <- Seq(3, 99)) {
      val rnd = new Random(seed)
      val edges = (1 to 150).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      val got = graft.operators.ConnectedComponents.twoPhase(edges.toDF("a", "b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(n => n -> find(n)).toMap
      assert(got == expected, s"seed=$seed")
    }
    // 200-node chain: min-label would need 199 rounds; star contraction
    // must finish inside the default 25-iteration cap
    val chain = (1L until 200L).map(i => (i, i + 1))
    val got = graft.operators.ConnectedComponents.twoPhase(chain.toDF("a", "b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 200 && got.values.forall(_ == 1L))
  }

  test("ConnectedComponents: 54-diameter chain converges without plan blowup") {
    import spark.implicits._
    // min-label propagation moves one hop per round: a 55-node chain needs
    // 54 rounds — only survivable because localCheckpoint truncates the
    // lineage every 3 rounds (round-1 verdict #6)
    val chain = (1L until 55L).map(i => (i, i + 1))
    val got = graft.operators.ConnectedComponents(chain.toDF("a", "b"), maxIterations = 60)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 55 && got.values.forall(_ == 1L))
  }

  test("BpeLearn equals the naive driver-side learner on random corpora") {
    import spark.implicits._
    // naive reference: same deterministic variant (one single-pass
    // java.lang.String.replace per rank, ties by cnt desc / l asc / r asc)
    def naive(words: Map[String, Long], nMerges: Int): (List[(String, String)], Map[String, Int]) = {
      var seqs = words.keys.map(w => w -> (" " + w.toCharArray.mkString("", " ", " "))).toMap
      var merges = List.empty[(String, String)]
      var continue = true
      while (merges.size < nMerges && continue) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, s) <- seqs) {
          val ts = s.trim.split(" ")
          for (i <- 0 until ts.length - 1)
            counts((ts(i), ts(i + 1))) = counts.getOrElse((ts(i), ts(i + 1)), 0L) + words(w)
        }
        if (counts.isEmpty) continue = false
        else {
          val ((l, r), _) = counts.toSeq.sortBy { case ((l, r), c) => (-c, l, r) }.head
          merges = merges :+ (l, r)
          seqs = seqs.map { case (w, s) => w -> s.replace(s" $l $r ", s" $l$r ") }
        }
      }
      (merges, seqs.map { case (w, s) => w -> s.trim.split(" ").length })
    }
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new Random(seed)
      val alpha = "abc"
      val corpus = (1 to 40).map { _ =>
        val w = (1 to (1 + rnd.nextInt(8))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
        w
      }.groupBy(identity).map { case (w, ws) => w -> (ws.size.toLong * (1 + rnd.nextInt(5))) }
      val df = corpus.toSeq.toDF("word", "freq")
      val (merges, applied) = graft.operators.BpeLearn.learn(df, 10)
      val (expMerges, expTokens) = naive(corpus, 10)
      assert(merges.map(m => (m.l, m.r)) == expMerges, s"seed=$seed merges")
      val gotTokens = applied.collect().map(r => r.getString(0) -> r.getLong(2).toInt).toMap
      assert(gotTokens == expTokens, s"seed=$seed token counts")
      // every merge reduces the weighted token count or keeps it equal
      // only via residual overlaps — total tokens must strictly decrease
      val total = gotTokens.map { case (w, n) => n * corpus(w) }.sum
      val chars = corpus.map { case (w, f) => w.length * f }.sum
      assert(total < chars || merges.isEmpty, s"seed=$seed no reduction")
    }
  }

  test("PageRank: 60-round run survives (checkpointed lineage) and converges") {
    import spark.implicits._
    val rnd = new Random(5)
    val edges = (1 to 300)
      .map(_ => (s"n${rnd.nextInt(50)}", s"n${rnd.nextInt(50)}", 1L + rnd.nextInt(5)))
      .toDF("src", "dst", "w")
    // 60 fixed rounds: only survivable because localCheckpoint truncates
    // the two-joins-per-round lineage every 3 rounds
    val (pr, rounds) = graft.queries.GraphOps.pageRank(edges, 60)
    assert(rounds == 60)
    val ranks = pr.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ranks.nonEmpty && ranks.values.forall(_ > 0))
    // determinism across reruns (checkpointing must not perturb values)
    val (pr2, _) = graft.queries.GraphOps.pageRank(edges, 60)
    assert(pr2.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == ranks)
    // convergence stop: integer ranks settle well before 60 rounds
    val (prTol, rTol) = graft.queries.GraphOps.pageRank(edges, 60, tolMicro = 1000000000L)
    assert(rTol < 60, s"convergence stop never fired (ran $rTol rounds)")
    assert(prTol.collect().length == ranks.size)
  }

  test("BpeLearn batched: production merge counts, capped expression depth") {
    import spark.implicits._
    // a corpus rich enough for several hundred merges
    val rnd = new Random(7)
    val alpha = "abcdef"
    val corpus = (1 to 400).map { _ =>
      (1 to (4 + rnd.nextInt(7))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    }.groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    val df = corpus.toSeq.toDF("word", "freq")
    val matEvery = 64
    val (merges, applied) =
      graft.operators.BpeLearn.learn(df, 512, batchK = 16, materializeEvery = matEvery)
    assert(merges.size > 200, s"expected deep merge table, got ${merges.size}")
    // ranks contiguous from 1, patterns well-formed
    assert(merges.map(_.rank) == (1L to merges.size))
    merges.foreach(m => assert(m.pat == s" ${m.l} ${m.r} " && m.rep == s" ${m.l}${m.r} "))
    // expression-depth cap: the applied plan carries at most one
    // re-materialization window of nested replaces, not the full rank count
    val planStr = applied.queryExecution.analyzed.toString()
    val nReplaces = "(?<![_a-z])replace\\(".r.findAllIn(planStr).size
    assert(nReplaces <= matEvery,
      s"nested replaces $nReplaces exceed materializeEvery=$matEvery")
    // replay contract survives batching: applying the exported merge table
    // rank-by-rank on the driver reproduces the learned tokenization
    val replayed = corpus.keys.map { w =>
      var s = " " + w.toCharArray.mkString("", " ", " ")
      merges.foreach(m => s = s.replace(m.pat, m.rep))
      w -> s.trim.split(" ").length.toLong
    }.toMap
    val got = applied.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got == replayed, "batched learner diverged from driver replay")
    // weighted token total must shrink materially vs raw characters
    val total = got.map { case (w, n) => n * corpus(w) }.sum
    val chars = corpus.map { case (w, f) => w.length * f }.sum
    assert(total < chars / 2, s"merges barely compressed: $total vs $chars")
  }

  test("GlobalRank equals the unpartitioned row_number window on random frames") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    for (seed <- Seq(3, 17)) {
      val rnd = new Random(seed)
      // duplicate cnt values force the word tiebreak to matter
      val df = (1 to 500).map(i => (s"w$i", rnd.nextInt(40).toLong)).toDF("word", "cnt")
      val want = df.withColumn("rank",
          row_number().over(Window.orderBy(col("cnt").desc, col("word").asc)))
        .select("word", "rank").as[(String, Int)].collect()
        .map { case (w, r) => (w, r.toLong) }.toSet
      val got = graft.operators.GlobalRank
        .withRowNumber(df, Seq(col("cnt").desc, col("word").asc), "rank", numPartitions = 7)
        .select("word", "rank").as[(String, Long)].collect().toSet
      assert(got == want, s"seed=$seed")
    }
  }

  test("GlobalRank: supplementary-plane string keys rank in Spark's UTF-8 order") {
    // java.lang.String sorts U+1F600 (surrogate pair, UTF-8 F0 9F 98 80)
    // BEFORE U+FFFD (EF BF BD); Spark's UTF8String binary order is the
    // reverse. Ranks are exact either way (the WHEN-tree bucket function
    // is monotone for any bounds arrangement — verified by temporarily
    // reverting the utf8Cmp case against this test), but the driver-side
    // quantile sort matching the executor order is what makes the sampled
    // boundaries REAL quantiles; this pins the end-to-end exactness on
    // keys where the two orders disagree. Heavy repetition of the tricky
    // keys forces sampled boundaries onto them.
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val keys = Seq("😀", "�", "a", "z", "😀!", "�!")
    val rnd = new Random(7)
    val df = (1 to 1200).map(i => (keys(rnd.nextInt(keys.length)), i.toLong))
      .toDF("word", "id")
    val want = df.withColumn("rank",
        row_number().over(Window.orderBy(col("word").asc, col("id").asc)))
      .select("id", "rank").as[(Long, Int)].collect()
      .map { case (w, r) => (w, r.toLong) }.toSet
    val got = graft.operators.GlobalRank
      .withRowNumber(df, Seq(col("word").asc, col("id").asc), "rank", numPartitions = 5)
      .select("id", "rank").as[(Long, Long)].collect().toSet
    assert(got == want)
  }

  test("GlobalRank soak: 10^7 distinct tokens rank with bounded per-task rows") {
    // the round-4 verdict's named scale-killer: an unpartitioned
    // row_number over a 100-TB corpus vocabulary. The two-phase ranker
    // must (a) stay exact (a permutation of 1..N ordered by the key) and
    // (b) never concentrate the vocabulary in one task.
    import java.util.concurrent.atomic.AtomicLong
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val n = 10_000_000L
    val parts = 16
    val vocab = spark.range(n).select(
      format_string("w%08d", col("id")).as("word"),
      (col("id") % 997L + 1L).as("cnt"))
    val maxRead = new AtomicLong
    val lsn = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          maxRead.updateAndGet(c => math.max(c, m.shuffleReadMetrics.recordsRead)); ()
        }
      }
    }
    // measure ONLY the ranking stages (checkpoint materialization + the
    // offset/join pass) — the verification aggregates below shuffle at the
    // session's 4 partitions and would dominate maxRead otherwise
    spark.sparkContext.addSparkListener(lsn)
    val ranked = try {
      val r = graft.operators.GlobalRank
        .withRowNumber(vocab, Seq(col("cnt").desc, col("word").asc), "rank", parts)
      assert(r.count() == n)
      Thread.sleep(1000) // listener bus is async
      r
    } finally spark.sparkContext.removeSparkListener(lsn)
    val share = n / parts
    assert(maxRead.get() > 0L)
    assert(maxRead.get() < share * 2,
      s"one task read ${maxRead.get()} rows — vocabulary concentrated (even share $share)")
    val row = ranked.agg(
      count(lit(1)).as("n"),
      sum("rank").as("s"),
      countDistinct("rank").as("d"),
      min("rank").as("lo"),
      max("rank").as("hi")).head()
    assert(row.getLong(0) == n && row.getLong(2) == n)
    assert(row.getLong(3) == 1L && row.getLong(4) == n)
    assert(row.getLong(1) == n * (n + 1) / 2)
    // rank 1 = max cnt (997), word-asc tiebreak → the smallest such word
    val top = ranked.filter(col("rank") === 1L).select("word", "cnt").head()
    assert(top.getLong(1) == 997L, top.toString)
  }

  test("malformed capture: errors surface via accumulators, job survives") {
    val dir = java.nio.file.Files.createTempDirectory("badpcap")
    // valid header + one good frame + garbage record whose frame bytes are junk
    val good = PcapFixtures.ethernet(0x0800,
      PcapFixtures.ipv4("1.1.1.1", "2.2.2.2", 17, PcapFixtures.udp(1, 2, Array.empty)))
    // IPv4 ethertype but a truncated IP header → dissect error, row kept
    val junkFrame = PcapFixtures.ethernet(0x0800, Array.fill[Byte](5)(0x7f))
    val bytes = PcapFixtures.legacyPcap(Seq((1L, -1, good), (2L, -1, junkFrame)))
    java.nio.file.Files.write(dir.resolve("bad.pcap"), bytes)
    val m = graft.spark.PcapSource.metrics(spark)
    val df = graft.spark.PcapSource.read(spark, dir.toString + "/bad.pcap", metrics = Some(m))
    assert(df.count() == 2) // both rows kept
    assert(m.packets.value == 2L)
    assert(m.errors.value >= 1L) // junk counted, not thrown
  }
}
