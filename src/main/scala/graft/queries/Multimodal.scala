package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-local stage.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * deterministic fake decoder (clearly marked); everything around it — the
  * schema, the `Dataset[MediaBlob]` encoder, the mapPartitions batch
  * shape, the partition sizing — is the real 100 TB plumbing: blobs never
  * pass through a shuffle (decode is a narrow map stage), and features
  * come out as fixed-width columns ready for columnar storage.
  */
object Multimodal {
  import Tables.t

  final case class MediaBlob(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, mean_byte: Double, features: Array[Float])

  /** STUB — stands in for a real image/audio decoder (libs absent here).
    * Deterministic: "dimensions" from the first payload bytes, an 8-bin
    * byte histogram as the "feature vector". A real deployment swaps only
    * this function; the surrounding pipeline is unchanged.
    */
  def decodeStub(b: MediaBlob): MediaFeatures = {
    val p = b.payload
    val w = if (p.length >= 2) ((p(0) & 0xff) << 4 | (p(1) & 0x0f)) + 16 else 16
    val h = if (p.length >= 4) ((p(2) & 0xff) << 4 | (p(3) & 0x0f)) + 16 else 16
    val hist = new Array[Float](8)
    var sum = 0L
    var i = 0
    while (i < p.length) {
      val v = p(i) & 0xff
      hist(v >> 5) += 1f
      sum += v
      i += 1
    }
    if (p.length > 0) { var j = 0; while (j < 8) { hist(j) /= p.length; j += 1 } }
    MediaFeatures(b.media_id, b.kind, p.length.toLong, w, h,
      if (p.length == 0) 0.0 else sum.toDouble / p.length, hist)
  }

  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int, thumb: Array[Float])
  final case class FrameSample(
      media_id: Long, frame_index: Int, frame_bytes: Long, mean_byte: Double)

  /** STUB resize — stands in for an image rescale (no codecs here): the
    * "image" is the byte histogram; resizing pools adjacent bins down to
    * `targetBins`. Deterministic; partition-local.
    */
  def resizeStub(f: MediaFeatures, targetBins: Int = 4): ResizedMedia = {
    val pooled = new Array[Float](targetBins)
    val ratio = f.features.length.toDouble / targetBins
    var i = 0
    while (i < f.features.length) {
      pooled(math.min((i / ratio).toInt, targetBins - 1)) += f.features(i)
      i += 1
    }
    ResizedMedia(f.media_id, f.width / 2, f.height / 2, pooled)
  }

  /** STUB frame sampling — stands in for video frame extraction: the
    * payload is treated as fixed-width frames; every `stride`-th frame is
    * emitted with its summary stats. The Spark-side contract (one blob →
    * many frame rows, no shuffle) is the real part.
    */
  def frameSampleStub(
      b: MediaBlob, frameSize: Int = 64, stride: Int = 4): Iterator[FrameSample] = {
    val n = b.payload.length / frameSize
    (0 until n by stride).iterator.map { fi =>
      var sum = 0L
      var i = fi * frameSize
      val end = i + frameSize
      while (i < end) { sum += b.payload(i) & 0xff; i += 1 }
      FrameSample(b.media_id, fi, frameSize.toLong, sum.toDouble / frameSize)
    }
  }

  /** Decode → resize, one narrow stage. */
  def resized(blobs: Dataset[MediaBlob]): Dataset[ResizedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => resizeStub(decodeStub(b))))
  }

  /** Blob → sampled frames (flatMap: one row in, many out, still narrow). */
  def sampledFrames(blobs: Dataset[MediaBlob]): Dataset[FrameSample] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(frameSampleStub(_)))
  }

  /** documents.text re-cast as opaque binary payloads — the testdata's
    * stand-in for an image/audio blob column.
    */
  def blobs(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    t(s, dir, "documents")
      .select(col("doc_id").as("media_id"), lit("image").as("kind"),
        col("text").cast(BinaryType).as("payload"))
      .as[MediaBlob]
  }

  final case class AudioWindow(
      media_id: Long, win_index: Int, energy: Long, crossings: Long)

  /** STUB audio feature frames — stands in for STFT-style windowing (no
    * audio codecs here): overlapping windows (size 32, hop 16 — 50%
    * overlap, the standard spectrogram shape) over the payload, each
    * emitting integer energy (byte sum) and DC-removed crossings (count
    * of adjacent samples straddling the window mean; compared as
    * `sample*win < energy`, all-integer so any engine agrees). One blob →
    * many window rows, narrow flatMap — the real 100 TB contract.
    */
  def audioWindowStub(
      b: MediaBlob, win: Int = 32, hop: Int = 16): Iterator[AudioWindow] = {
    val p = b.payload
    val n = if (p.length >= win) (p.length - win) / hop + 1 else 0
    (0 until n).iterator.map { wi =>
      val st = wi * hop
      var energy = 0L
      var i = st
      while (i < st + win) { energy += p(i) & 0xff; i += 1 }
      var crossings = 0L
      i = st
      while (i < st + win - 1) {
        val below0 = (p(i) & 0xff).toLong * win < energy
        val below1 = (p(i + 1) & 0xff).toLong * win < energy
        if (below0 != below1) crossings += 1
        i += 1
      }
      AudioWindow(b.media_id, wi, energy, crossings)
    }
  }

  /** Blob → overlapping audio feature windows (narrow flatMap). */
  def audioWindows(blobs: Dataset[MediaBlob]): Dataset[AudioWindow] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap(audioWindowStub(_)))
  }

  /** Decode/feature-extract stage: partition-local, no shuffle. */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(decodeStub))
  }

  val queries: Seq[Q] = Seq(
    // binary-column basics, oracled: byte length, content hash, magic bytes
    Q("m01_blob_stats",
      (s, dir) => {
        t(s, dir, "documents").select(
          col("doc_id"),
          octet_length(col("text").cast(BinaryType)).cast(LongType).as("n_bytes"),
          md5(col("text").cast(BinaryType)).as("content_md5"),
          hex(substring(col("text").cast(BinaryType), 1, 4)).as("magic_hex"))
      },
      Some("""SELECT doc_id,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
             |  md5(text) AS content_md5,
             |  upper(hex(CAST(substr(text, 1, 4) AS BLOB))) AS magic_hex
             |FROM documents""".stripMargin)),

    // full decode pipeline (stubbed decoder). The stub's outputs are exact
    // integer functions of the payload bytes (ASCII text here), so DuckDB
    // can recompute them: width/height from the header bytes, and the
    // byte sum recovered losslessly from the mean (mean*n is an integer
    // < 2^53, exact in double)
    Q("m02_decode_features",
      (s, dir) => extractFeatures(blobs(s, dir)).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          col("width"), col("height"),
          expr("CAST(round(mean_byte * n_bytes) AS BIGINT)").as("byte_sum")),
      Some("""WITH c AS (
             |  SELECT doc_id, CAST(SUM(ascii(ch)) AS BIGINT) AS s FROM (
             |    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
             |  GROUP BY doc_id)
             |SELECT d.doc_id AS media_id, 'image' AS kind,
             |  CAST(octet_length(CAST(d.text AS BLOB)) AS BIGINT) AS n_bytes,
             |  CAST(CASE WHEN octet_length(CAST(d.text AS BLOB)) >= 2
             |       THEN (ascii(substr(d.text, 1, 1)) << 4 | (ascii(substr(d.text, 2, 1)) & 15)) + 16
             |       ELSE 16 END AS INT) AS width,
             |  CAST(CASE WHEN octet_length(CAST(d.text AS BLOB)) >= 4
             |       THEN (ascii(substr(d.text, 3, 1)) << 4 | (ascii(substr(d.text, 4, 1)) & 15)) + 16
             |       ELSE 16 END AS INT) AS height,
             |  COALESCE(c.s, 0) AS byte_sum
             |FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id""".stripMargin)),

    // decode → resize chain (stub): halved header dimensions, exactly
    // recomputable (integer floor halving on positive ints)
    Q("m03_resize",
      (s, dir) => resized(blobs(s, dir)).toDF()
        .select(col("media_id"), col("width"), col("height")),
      Some("""SELECT doc_id AS media_id,
             |  CAST((CASE WHEN octet_length(CAST(text AS BLOB)) >= 2
             |       THEN (ascii(substr(text, 1, 1)) << 4 | (ascii(substr(text, 2, 1)) & 15)) + 16
             |       ELSE 16 END) // 2 AS INT) AS width,
             |  CAST((CASE WHEN octet_length(CAST(text AS BLOB)) >= 4
             |       THEN (ascii(substr(text, 3, 1)) << 4 | (ascii(substr(text, 4, 1)) & 15)) + 16
             |       ELSE 16 END) // 2 AS INT) AS height
             |FROM documents""".stripMargin)),

    // frame sampling (stub): one blob → many frame rows; per-frame byte
    // sums ARE exactly computable in SQL, so this one gets a real oracle
    // (mean*64 = the exact integer byte sum — /64 and *64 are lossless in
    // double, so no rounding games)
    Q("m04_frame_sample",
      (s, dir) => sampledFrames(blobs(s, dir)).toDF()
        .select(col("media_id"), col("frame_index").cast("long").as("frame_index"),
          col("frame_bytes"),
          expr("CAST(round(mean_byte * 64) AS BIGINT)").as("byte_sum")),
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id, unnest(range(0, length(text) // 64)) AS fi, text
             |  FROM documents),
             |fr AS (
             |  SELECT media_id, fi, substr(text, CAST(fi * 64 + 1 AS INT), 64) AS frame
             |  FROM f WHERE fi % 4 = 0),
             |c AS (SELECT media_id, fi, unnest(string_split(frame, '')) AS ch FROM fr)
             |SELECT media_id, CAST(fi AS BIGINT) AS frame_index,
             |       CAST(64 AS BIGINT) AS frame_bytes,
             |       CAST(SUM(ascii(ch)) AS BIGINT) AS byte_sum
             |FROM c GROUP BY media_id, fi""".stripMargin)),

    // perceptual-hash dedup: a dHash over the decoded blob — bit_i set
    // when frame_i's byte-sum exceeds frame_{i+1}'s (16-byte frames, ≤16
    // bits; the gradient structure of a real image dHash, on the stub's
    // "pixels"). All comparisons are integer byte-sums, so DuckDB replays
    // the hash bit-for-bit. Scale: hashing is narrow (mapPartitions); the
    // bucket size is one linear window/groupBy — the standard image-dedup
    // shape (pHash → bucket → review).
    Q("m05_phash_dedup",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val hashed = blobs(s, dir)
          .mapPartitions(_.map { b =>
            val fs = 16
            val n = math.min(b.payload.length / fs, 17)
            val sums = Array.tabulate(n) { fi =>
              var acc = 0L
              var i = fi * fs
              val end = i + fs
              while (i < end) { acc += b.payload(i) & 0xff; i += 1 }
              acc
            }
            var h = 0L
            var i = 0
            while (i + 1 < sums.length) {
              if (sums(i) > sums(i + 1)) h |= (1L << i)
              i += 1
            }
            (b.media_id, h)
          })
          .toDF("media_id", "phash")
        hashed.withColumn("n_same",
          count(lit(1)).over(Window.partitionBy("phash")))
      },
      Some("""WITH f AS (SELECT doc_id, unnest(range(0, least(length(text) // 16, 17))) AS fi, text
             |          FROM documents),
             |s AS (SELECT doc_id, fi, CAST(SUM(ascii(ch)) AS BIGINT) AS fsum
             |      FROM (SELECT doc_id, fi,
             |              unnest(string_split(substr(text, CAST(fi * 16 + 1 AS INT), 16), '')) AS ch
             |            FROM f)
             |      GROUP BY doc_id, fi),
             |b AS (SELECT a.doc_id, a.fi,
             |        CASE WHEN a.fsum > nx.fsum THEN 1 ELSE 0 END AS bit
             |      FROM s a JOIN s nx ON nx.doc_id = a.doc_id AND nx.fi = a.fi + 1),
             |h AS (SELECT doc_id,
             |        CAST(COALESCE(SUM(CASE WHEN bit = 1 THEN CAST(1 AS BIGINT) << fi ELSE 0 END), 0) AS BIGINT) AS phash
             |      FROM b GROUP BY doc_id)
             |SELECT d.doc_id AS media_id, COALESCE(h.phash, 0) AS phash,
             |       COUNT(*) OVER (PARTITION BY COALESCE(h.phash, 0)) AS n_same
             |FROM documents d LEFT JOIN h ON h.doc_id = d.doc_id""".stripMargin)),

    // audio-style overlapping feature windows (stub "samples" = payload
    // bytes): energy + DC-removed crossings per 50%-overlap window, all
    // integer arithmetic — DuckDB replays windowing, energy, and the
    // sample*win < energy crossing comparisons from the raw text bytes
    Q("m06_audio_windows",
      (s, dir) => audioWindows(blobs(s, dir)).toDF()
        .select(col("media_id"), col("win_index").cast("long").as("win_index"),
          col("energy"), col("crossings")),
      Some("""WITH f AS (SELECT doc_id AS media_id, text, length(text) AS L FROM documents),
             |w AS (SELECT media_id, text,
             |        unnest(range(0, CASE WHEN L >= 32 THEN (L - 32) // 16 + 1 ELSE 0 END)) AS wi
             |      FROM f),
             |cs AS (SELECT media_id, wi,
             |         [ascii(x) for x in string_split(substr(text, CAST(wi * 16 + 1 AS INT), 32), '')] AS c
             |       FROM w),
             |e AS (SELECT media_id, wi, c, CAST(list_sum(c) AS BIGINT) AS energy FROM cs)
             |SELECT media_id, CAST(wi AS BIGINT) AS win_index, energy,
             |  CAST(length(list_filter(range(1, 32),
             |    i -> (c[i] * 32 < energy) != (c[i + 1] * 32 < energy))) AS BIGINT) AS crossings
             |FROM e""".stripMargin)),

    // video-style scene-change detection (stub "frames" = 64-byte payload
    // slices, stride 1): a cut is an adjacent-frame byte-sum jump ≥ 300.
    // Frame extraction + integer sums are the narrow m04 stage; the only
    // wide step is the per-media lag window (co-partitioned by media_id —
    // one shuffle, linear). Byte sums are exact in both engines
    // (sum/64.0*64 round-trips exactly in IEEE — 64 is a power of two),
    // so the cut set replays bit-for-bit from the raw bytes.
    Q("m07_scene_cuts",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val fr = blobs(s, dir)
          .mapPartitions(_.flatMap(frameSampleStub(_, frameSize = 64, stride = 1)))
          .toDF()
          .select(col("media_id"), col("frame_index").cast(LongType).as("frame_index"),
            expr("CAST(round(mean_byte * 64) AS BIGINT)").as("byte_sum"))
        val w = Window.partitionBy("media_id").orderBy("frame_index")
        fr.withColumn("prev", lag("byte_sum", 1).over(w))
          .filter(col("prev").isNotNull)
          .withColumn("delta", abs(col("byte_sum") - col("prev")))
          .filter(col("delta") >= 300)
          .select(col("media_id"), col("frame_index"), col("delta"))
      },
      Some("""WITH f AS (SELECT doc_id AS media_id, unnest(range(0, length(text) // 64)) AS fi, text
             |        FROM documents),
             |c AS (SELECT media_id, fi, CAST(SUM(ascii(ch)) AS BIGINT) AS s
             |      FROM (SELECT media_id, fi,
             |              unnest(string_split(substr(text, CAST(fi * 64 + 1 AS INT), 64), '')) AS ch
             |            FROM f)
             |      GROUP BY media_id, fi),
             |d AS (SELECT media_id, fi, abs(s - lag(s) OVER (PARTITION BY media_id ORDER BY fi)) AS delta
             |      FROM c)
             |SELECT media_id, CAST(fi AS BIGINT) AS frame_index, CAST(delta AS BIGINT) AS delta
             |FROM d WHERE delta >= 300""".stripMargin))
  )
}
