package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The TopKWindowRewrite optimizer rule: fires ONLY on the exact
  * window-top-k shape whose semantics the bounded-heap aggregate
  * reproduces, and the rewritten plan returns the same rows as the
  * window plan it replaced.
  */
class TopKWindowRewriteSpec extends SparkFunSuite {

  private def ruleSession(): SparkSession = {
    val s = spark.newSession()
    s.conf.set(graft.rules.TopKWindowRewrite.ConfKey, "true")
    s.experimental.extraOptimizations = Seq(graft.rules.TopKWindowRewrite)
    s
  }

  /** 7 groups, unique ids, non-null BIGINT keys (the rule's contract). */
  private def fixture(s: SparkSession): DataFrame = {
    import s.implicits._
    (1 to 200).map(i => (s"g${i % 7}", i.toLong, (i * 37 % 101).toLong))
      .toDF("g", "id", "score")
  }

  private def windowTopK(df: DataFrame, k: Int): DataFrame =
    df.withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= k)

  private def optimized(df: DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("fires on the canonical shape; same rows as the window plan") {
    val df = windowTopK(fixture(ruleSession()), 3)
    val p = optimized(df)
    assert(!p.contains("Window"), p)
    assert(p.contains("topk_by_payload"), p)
    assert(rows(df) == rows(windowTopK(fixture(spark), 3)))
  }

  test("fires on rn = 1 (first-per-group) and on a global top-k") {
    val s = ruleSession()
    val first = fixture(s).withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") === 1)
    assert(!optimized(first).contains("Window"), optimized(first))
    assert(rows(first) == rows(fixture(spark).withColumn("rn",
      row_number().over(Window.partitionBy("g")
        .orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") === 1)))
    // empty partition spec = global top-k: the rewrite replaces the
    // single-partition window (the classic scale-killer) with a
    // mergeable global aggregate
    val global = fixture(s).withColumn("rn", row_number().over(
      Window.orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 5)
    assert(!optimized(global).contains("Window"), optimized(global))
    assert(rows(global) == rows(fixture(spark).withColumn("rn",
      row_number().over(Window.orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 5)))
  }

  test("preserves residual conjuncts above the rewrite") {
    val s = ruleSession()
    val df = fixture(s).withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 3 && col("id") % 2 === 0)
    assert(!optimized(df).contains("Window"), optimized(df))
    assert(rows(df) == rows(windowTopK(fixture(spark), 3)
      .filter(col("id") % 2 === 0)))
  }

  test("falls through: shapes the heap cannot reproduce keep their window") {
    val s = ruleSession()
    val base = fixture(s)
    def stays(df: DataFrame): Unit =
      assert(optimized(df).contains("Window"), optimized(df))
    // ascending ord — heap orders (ord DESC, id ASC) only
    stays(base.withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("score").asc, col("id").asc)))
      .filter(col("rn") <= 3))
    // single sort key — no unique-id tiebreak to feed the heap
    stays(base.withColumn("rn", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc)))
      .filter(col("rn") <= 3))
    // rank(): tie semantics differ (can emit more than k rows)
    stays(base.withColumn("rn", rank().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 3))
    // k beyond the bounded-heap regime
    stays(windowTopK(base, 100000))
    // nullable ord: row_number ranks null-score rows last; the heap
    // would drop them — observable, so the rule must not fire
    stays(base
      .withColumn("nscore", when(col("id") % 3 === 0, col("score")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("nscore").desc, col("id").asc)))
      .filter(col("rn") <= 3))
    // a second window expression rides the same Window node
    stays(base
      .select(col("g"), col("id"), col("score"),
        row_number().over(Window.partitionBy("g")
          .orderBy(col("score").desc, col("id").asc)).as("rn"),
        sum(col("score")).over(Window.partitionBy("g")
          .orderBy(col("score").desc, col("id").asc)).as("cum"))
      .filter(col("rn") <= 3))
  }

  test("off by default: the same shape keeps its window without the flag") {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(graft.rules.TopKWindowRewrite)
    val df = windowTopK(fixture(s), 3)
    assert(optimized(df).contains("Window"), optimized(df))
  }
}
