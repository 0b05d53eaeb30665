package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-oracled cardinality sketches. q21's HLL is
  * engine-specific by nature (rows-only driver check); the KMV
  * (k-minimum-values) family here is the opposite: built on md5 — which
  * Spark and DuckDB compute identically — so the sketch *itself* is
  * cross-engine reproducible and the whole estimate hash-matches.
  *
  * KMV in one line: keep the k smallest distinct 32-bit hash values of a
  * set; the k-th smallest h estimates the cardinality as
  * (k-1)·2³² / h (uniform order statistics). All arithmetic is integer
  * floor-division, exactly mirrored in the oracle.
  *
  * Scale: a KMV sketch is MERGEABLE — per-partition top-k min-hashes
  * merge associatively, which is exactly what Spark's sort-limit
  * (`TakeOrderedAndProject`) computes: partial per-partition top-k, then
  * a k-sized merge on one reducer. No full shuffle of the hashed column,
  * no driver-side state; the same shape runs on 1000 executors over
  * 100 TB with k·partitions rows moved. q49 exercises the mergeability
  * directly: two region sketches are unioned into a theta-sketch-style
  * intersection estimate without touching the raw data again.
  */
object SketchOps {
  import Tables.t

  private val K = 256
  private val Domain = 4294967296L // 2^32

  /** 32-bit md5-prefix hash, identical expression in both engines. */
  private def h32(colSql: String): String =
    s"CAST(conv(substr(md5(CAST($colSql AS STRING)), 1, 8), 16, 10) AS BIGINT)"

  private def h32Duck(colSql: String): String =
    s"CAST(concat('0x', substr(md5(CAST($colSql AS VARCHAR)), 1, 8)) AS BIGINT)"

  // --- q48: KMV distinct-count estimate ----------------------------------
  // distinct l_partkey per l_returnflag — the oracled counterpart of
  // q21's HLL. Emits the estimate AND the exact count so the error is
  // visible (ScalaTest bounds it; the driver hashes both).
  private def q48(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.createOrReplaceTempView("lineitem_q48")
    s.sql(s"""WITH h AS (SELECT DISTINCT l_returnflag, ${h32("l_partkey")} AS h
             |          FROM lineitem_q48),
             |r AS (SELECT l_returnflag, h,
             |             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
             |      FROM h),
             |s AS (SELECT l_returnflag,
             |             MAX(CASE WHEN rn = $K THEN h END) AS kth,
             |             CAST(COUNT(*) AS BIGINT) AS n_h
             |      FROM r WHERE rn <= $K GROUP BY l_returnflag),
             |x AS (SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
             |      FROM lineitem_q48 GROUP BY l_returnflag)
             |SELECT s.l_returnflag,
             |       CAST(CASE WHEN s.kth IS NULL THEN s.n_h
             |                 ELSE (${K - 1} * CAST($Domain AS BIGINT)) div s.kth END AS BIGINT) AS est_distinct,
             |       x.exact_distinct
             |FROM s JOIN x ON x.l_returnflag = s.l_returnflag""".stripMargin)
  }

  private def q48Oracle: String =
    s"""WITH h AS (SELECT DISTINCT l_returnflag, ${h32Duck("l_partkey")} AS h
       |          FROM lineitem),
       |r AS (SELECT l_returnflag, h,
       |             ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
       |      FROM h),
       |s AS (SELECT l_returnflag,
       |             MAX(CASE WHEN rn = $K THEN h END) AS kth,
       |             CAST(COUNT(*) AS BIGINT) AS n_h
       |      FROM r WHERE rn <= $K GROUP BY l_returnflag),
       |x AS (SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_distinct
       |      FROM lineitem GROUP BY l_returnflag)
       |SELECT s.l_returnflag,
       |       CAST(CASE WHEN s.kth IS NULL THEN s.n_h
       |                 ELSE (${K - 1} * CAST($Domain AS BIGINT)) // s.kth END AS BIGINT) AS est_distinct,
       |       x.exact_distinct
       |FROM s JOIN x ON x.l_returnflag = s.l_returnflag""".stripMargin

  // --- q49: KMV set-intersection estimate (theta-sketch shape) -----------
  // |parts ordered from ASIA ∩ parts ordered from EUROPE| without joining
  // the raw sets: sketch each side (k smallest distinct hashes of the
  // parts a region's customers ordered), merge to the union's k smallest,
  // count how many of those appear in both sides, and scale:
  // est_inter = matches · est_union div k. Pure integer; both engines
  // replay every step from md5 up.
  private def sideSql(h: String => String, table: String, region: String): String =
    s"""SELECT DISTINCT ${h(s"l_partkey")} AS h
       |FROM $table l
       |  JOIN ${table.replace("lineitem", "orders")} o ON l.l_orderkey = o.o_orderkey
       |  JOIN ${table.replace("lineitem", "customer")} c ON o.o_custkey = c.c_custkey
       |  JOIN ${table.replace("lineitem", "nation")} n ON c.c_nationkey = n.n_nationkey
       |  JOIN ${table.replace("lineitem", "region")} r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = '$region'""".stripMargin

  private def q49Body(h: String => String, table: String, intDiv: String): String =
    s"""WITH a AS (SELECT h FROM (${sideSql(h, table, "ASIA")}) ORDER BY h LIMIT $K),
       |b AS (SELECT h FROM (${sideSql(h, table, "EUROPE")}) ORDER BY h LIMIT $K),
       |u AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) ORDER BY h LIMIT $K),
       |uk AS (SELECT MAX(h) AS kth, CAST(COUNT(*) AS BIGINT) AS n_u FROM u),
       |eu AS (SELECT CASE WHEN n_u < $K THEN n_u
       |                   ELSE (${K - 1} * CAST($Domain AS BIGINT)) $intDiv kth END AS est_union,
       |              n_u FROM uk),
       |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS matches
       |      FROM u WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b))
       |SELECT CAST(m.matches AS BIGINT) AS matches,
       |       CAST(eu.est_union AS BIGINT) AS est_union,
       |       CAST((m.matches * eu.est_union) $intDiv eu.n_u AS BIGINT) AS est_intersection
       |FROM m CROSS JOIN eu""".stripMargin

  private def q49(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "nation", "region")
      .foreach(n => t(s, dir, n).createOrReplaceTempView(s"${n}_q49"))
    s.sql(q49Body(h32, "lineitem_q49", "div"))
  }

  private def q49Oracle: String = q49Body(h32Duck, "lineitem", "//")

  // --- q52: cross-engine HyperLogLog -------------------------------------
  // The md5-deterministic counterpart of q21's engine-specific built-in:
  // a real HLL (m=256 registers, 60-bit md5-prefix hash — register =
  // h%256, rho = leading-zero rank of the remaining 52 bits via
  // `length(bin(w))`, an integer log2 both engines share) whose RAW
  // estimator runs entirely in integers: the harmonic sum is
  // Σ 2^(53−M[j]) ≤ 2^61 (BIGINT-exact; empty registers contribute 2^53),
  // and the estimate is one 128-bit floor division
  // N0 div (hsum·10^6), N0 = alpha_e6·m²·2^53 with the fixed-point
  // constant alpha_e6 = 718273 ≈ 0.7213/(1+1.079/256)·10^6. No small- or
  // large-range correction branch (those need ln) — this is the
  // documented RAW-sketch contract, mergeable by register-max like any
  // HLL. DuckDB replays every bit, so unlike q21 the whole estimate
  // hash-matches.
  private val HllRegisters = 256
  private val HllN0 = "423993542593778584572133376" // 718273 * 256^2 * 2^53

  private def h60(colSql: String): String =
    s"CAST(conv(substr(md5(CAST($colSql AS STRING)), 1, 15), 16, 10) AS BIGINT)"

  private def h60Duck(colSql: String): String =
    s"CAST(concat('0x', substr(md5(CAST($colSql AS VARCHAR)), 1, 15)) AS BIGINT)"

  private def q52Body(
      h: String => String, table: String, intDiv: String,
      shift: (String, String) => String, wide: String): String =
    s"""WITH k AS (SELECT DISTINCT l_returnflag, l_partkey FROM $table),
       |h AS (SELECT l_returnflag, ${h("l_partkey")} AS h FROM k),
       |r AS (SELECT l_returnflag, h % $HllRegisters AS j,
       |        CASE WHEN h $intDiv $HllRegisters = 0 THEN 53
       |             ELSE 53 - length(bin(h $intDiv $HllRegisters)) END AS rho
       |      FROM h),
       |m AS (SELECT l_returnflag, j, MAX(rho) AS mj FROM r GROUP BY l_returnflag, j),
       |s AS (SELECT l_returnflag,
       |        CAST(SUM(${shift("CAST(1 AS BIGINT)", "CAST(53 - mj AS INT)")})
       |             + ($HllRegisters - COUNT(*)) * ${shift("CAST(1 AS BIGINT)", "53")} AS BIGINT) AS hsum,
       |        CAST(COUNT(*) AS BIGINT) AS n_registers_used
       |      FROM m GROUP BY l_returnflag)
       |SELECT l_returnflag, n_registers_used,
       |  CAST(CAST('$HllN0' AS $wide) $intDiv (CAST(hsum AS $wide) * 1000000) AS BIGINT) AS est_distinct
       |FROM s""".stripMargin

  private def q52(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("lineitem_q52")
    s.sql(q52Body(h60, "lineitem_q52", "div",
      (x, n) => s"shiftleft($x, $n)", "DECIMAL(38,0)"))
  }

  private def q52Oracle: String =
    q52Body(h60Duck, "lineitem", "//", (x, n) => s"($x << $n)", "HUGEINT")

  // --- q63: Count-Min Sketch heavy hitters --------------------------------
  // The third classic mergeable sketch (after HLL and KMV): a fixed
  // D×W integer counter matrix — counter[j][h_j(key)] += 1 per event —
  // whose point estimate min_j counter[j][h_j(key)] upper-bounds the true
  // count (collisions only ever inflate). Like q48/q52 the hashes are
  // md5-prefix integers, so the ENTIRE sketch and every estimate is
  // bit-identical cross-engine and the driver hash-matches it.
  //
  // Scale shape: building the sketch is one groupBy over D·W = 192 keys —
  // map-side partial counters mean each partition ships ≤192 rows no
  // matter how many events it scanned (the whole point of a CMS at
  // 100 TB: bounded state, bounded shuffle, associative merge by cell-wise
  // sum). The probe joins the tiny counter table back by (j, bucket);
  // true counts appear alongside so the overestimate is visible (and
  // bounded in QuerySurfaceSpec: est >= true always).
  private val CmsDepth = 3
  private val CmsWidth = 64

  private def q63Body(h: String => String, str: String, js: String,
      table: String): String = {
    def bucket(keyCol: String) =
      s"${h(s"CAST($keyCol AS $str) || '#' || CAST(j AS $str)")} % $CmsWidth"
    s"""WITH ev AS (SELECT user_id FROM $table),
       |js AS (SELECT $js AS j),
       |c AS (SELECT j, ${bucket("user_id")} AS b, CAST(COUNT(*) AS BIGINT) AS cnt
       |      FROM ev CROSS JOIN js GROUP BY 1, 2),
       |t AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt FROM ev GROUP BY 1),
       |k AS (SELECT user_id, true_cnt, j, ${bucket("user_id")} AS b
       |      FROM t CROSS JOIN js),
       |e AS (SELECT k.user_id, k.true_cnt, CAST(MIN(c.cnt) AS BIGINT) AS cms_est
       |      FROM k JOIN c ON c.j = k.j AND c.b = k.b GROUP BY 1, 2)
       |SELECT user_id, true_cnt, cms_est
       |FROM e ORDER BY true_cnt DESC, user_id LIMIT 10""".stripMargin
  }

  private def q63(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_q63")
    s.sql(q63Body(h32, "STRING", "explode(array(0, 1, 2))", "events_q63"))
  }

  private def q63Oracle: String =
    q63Body(h32Duck, "VARCHAR", "unnest([0, 1, 2])", "events")

  // --- q68: CMS join-size estimation ---------------------------------------
  // The optimizer-statistics use of the q63 sketch: |A ⋈ B on k| equals
  // the inner product of the two sides' key-frequency vectors, and the
  // CMS row-wise inner product min_j Σ_b cA[j][b]·cB[j][b] upper-bounds
  // it (AMS/CMS estimate — collisions only inflate). This is how an
  // engine prices a join WITHOUT scanning either side twice: each side's
  // sketch is one bounded-state map-side-combinable pass (≤ D·W rows per
  // partition cross the wire), the estimate is a 192-row join. The true
  // size rides alongside (computed from per-key counts, never the
  // materialized join) so the overestimate is visible; QuerySurfaceSpec
  // bounds it. All md5-integer arithmetic — bit-identical cross-engine.
  private def q68Body(h: String => String, str: String, js: String,
      tblA: String, tblB: String): String = {
    def bucket(keyCol: String) =
      s"${h(s"CAST($keyCol AS $str) || '#' || CAST(j AS $str)")} % $CmsWidth"
    s"""WITH a AS (SELECT user_id AS k FROM $tblA),
       |b2 AS (SELECT o_custkey AS k FROM $tblB),
       |js AS (SELECT $js AS j),
       |ca AS (SELECT j, ${bucket("k")} AS b, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM a CROSS JOIN js GROUP BY 1, 2),
       |cb AS (SELECT j, ${bucket("k")} AS b, CAST(COUNT(*) AS BIGINT) AS cnt
       |       FROM b2 CROSS JOIN js GROUP BY 1, 2),
       |ip AS (SELECT ca.j, CAST(SUM(ca.cnt * cb.cnt) AS BIGINT) AS prod
       |       FROM ca JOIN cb ON cb.j = ca.j AND cb.b = ca.b GROUP BY ca.j),
       |tj AS (SELECT CAST(COALESCE(SUM(x.n * y.n), 0) AS BIGINT) AS true_rows
       |       FROM (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM a GROUP BY 1) x
       |       JOIN (SELECT k, CAST(COUNT(*) AS BIGINT) AS n FROM b2 GROUP BY 1) y
       |         ON x.k = y.k)
       |SELECT tj.true_rows AS true_join_rows,
       |  CAST((SELECT MIN(prod) FROM ip) AS BIGINT) AS cms_estimate
       |FROM tj""".stripMargin
  }

  private def q68(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_q68")
    Tables.t(s, dir, "orders").createOrReplaceTempView("orders_q68")
    s.sql(q68Body(h32, "STRING", "explode(array(0, 1, 2))",
      "events_q68", "orders_q68"))
  }

  private def q68Oracle: String =
    q68Body(h32Duck, "VARCHAR", "unnest([0, 1, 2])", "events", "orders")

  // --- q74: HDR-histogram quantile sketch --------------------------------
  // The fourth mergeable sketch family: approximate percentiles in FIXED
  // memory per group. Each value maps to a log-bucketed bin with 16
  // sub-buckets per octave (HdrHistogram's scheme at 4 significant bits,
  // ≤ 6.25% relative error): for v ≥ 1 in integer cents,
  //   m     = length(bin(v))            -- floor(log2 v)+1, both engines
  //   shift = max(m-5, 0)
  //   bin   = 16·shift + (v >> shift)   -- monotone in v
  // The sketch is the (event_type, bin) count table — a pure map-side-
  // combinable groupBy, merge-order independent by construction (the
  // property q19's exact sort-based quantiles lack at 100 TB: this
  // shuffles ≤ ~860 counter rows per group, never the data). Quantiles
  // read back as the LOWER BOUND of the first bin whose cumulative count
  // reaches ceil(p·n/100); the cumsum window is partitioned per group
  // over the bounded bin table. All integer arithmetic; `length(bin())`
  // and the shifts are exact in both engines.
  private def q74Body(intDiv: String, shr: (String, String) => String,
      shl: (String, String) => String): String = {
    val binExpr = {
      val v = s"greatest(CAST(floor(value * 100 + 0.5) AS BIGINT), 1)"
      s"""(SELECT event_type, 16 * greatest(length(bin($v)) - 5, 0)
         |   + ${shr(v, s"greatest(length(bin($v)) - 5, 0)")} AS b
         | FROM EVSRC)""".stripMargin.replace("\n", " ")
    }
    // bin → bucket lower bound: sub = bin - 16·shift, lo = sub << shift
    val loExpr = shl(s"(b - 16 * greatest(b $intDiv 16 - 1, 0))",
      s"greatest(b $intDiv 16 - 1, 0)")
    def thr(p: Int) = s"(n * $p + 99) $intDiv 100"
    s"""WITH bins AS $binExpr,
       |hist AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS cnt
       |         FROM bins GROUP BY 1, 2),
       |tot AS (SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
       |        FROM hist GROUP BY 1),
       |cum AS (SELECT event_type, b, cnt,
       |          CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY b) AS BIGINT) AS c
       |        FROM hist)
       |SELECT cum.event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       |  CAST(MIN(CASE WHEN c >= ${thr(50)} THEN $loExpr END) AS BIGINT) AS p50_lo_c,
       |  CAST(MIN(CASE WHEN c >= ${thr(90)} THEN $loExpr END) AS BIGINT) AS p90_lo_c,
       |  CAST(MIN(CASE WHEN c >= ${thr(99)} THEN $loExpr END) AS BIGINT) AS p99_lo_c
       |FROM cum JOIN tot ON tot.event_type = cum.event_type
       |GROUP BY cum.event_type""".stripMargin
  }

  private def q74(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir).createOrReplaceTempView("events_q74")
    s.sql(q74Body("div",
      (x, n) => s"shiftright($x, CAST($n AS INT))",
      (x, n) => s"shiftleft($x, CAST($n AS INT))")
      .replace("EVSRC", "events_q74"))
  }

  private def q74Oracle: String =
    q74Body("//", (x, n) => s"($x >> ($n))", (x, n) => s"($x << ($n))")
      .replace("EVSRC", "events")

  val queries: Seq[Q] = Seq(
    Q("q48_kmv_distinct", q48, Some(q48Oracle)),
    Q("q49_kmv_intersect", q49, Some(q49Oracle)),
    Q("q52_hll_cross_engine", q52, Some(q52Oracle)),
    Q("q63_cms_heavy_hitters", q63, Some(q63Oracle)),
    Q("q68_cms_join_estimate", q68, Some(q68Oracle)),
    Q("q74_hdr_quantiles", q74, Some(q74Oracle))
  )
}
