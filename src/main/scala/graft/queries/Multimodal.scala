package graft.queries

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column pipeline: opaque `binary` payloads + typed metadata,
  * with decode/feature-extraction as a partition-local stage.
  *
  * Decode is REAL (round 4): images are genuine PNGs decoded with the
  * JDK's `javax.imageio.ImageIO`, audio is genuine 8-bit PCM WAV decoded
  * with `javax.sound.sampled.AudioSystem` — no external codec libs
  * needed. The fixture generator renders each document's bytes into a
  * grayscale PNG (pixel i = byte i, width 32, zero-padded final row) or a
  * WAV (sample i = byte i). Both codecs are LOSSLESS, so every decoded
  * feature is an exact integer function of the original text bytes —
  * which is what lets DuckDB replay the features straight from
  * `documents.text`: a hash-match across engines proves the encode →
  * real-decode round trip bit-for-bit.
  *
  * Scale shape (the 100 TB contract): blobs never cross a shuffle —
  * encode, decode, and feature extraction are narrow mapPartitions
  * stages; features come out as fixed-width columns; the only wide steps
  * are the final per-media windows/aggregations over the (tiny) feature
  * rows, never over payloads.
  */
object Multimodal {
  import Tables.t

  /** One media blob: opaque encoded payload + typed metadata. `orig_len`
    * records the content length before codec padding (the PNG raster pads
    * the last row to full width with zero pixels).
    */
  final case class MediaBlob(
      media_id: Long, kind: String, payload: Array[Byte], orig_len: Int)
  final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])
  final case class MediaFeatures(
      media_id: Long, kind: String, width: Int, height: Int, byte_sum: Long)
  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int, pooled_sum: Long)
  final case class FrameSample(
      media_id: Long, frame_index: Int, frame_bytes: Long, byte_sum: Long)
  final case class AudioWindow(
      media_id: Long, win_index: Int, energy: Long, crossings: Long)

  // ImageIO's default scratch is a temp FILE per operation — disk I/O per
  // task. In-memory cache only (runs once per executor JVM).
  ImageIO.setUseCache(false)

  private val ImgWidth = 32

  /** bytes → real grayscale PNG: pixel i = byte i, row-major, width 32,
    * final row zero-padded. Empty input → a 32×1 all-zero image.
    */
  def encodePng(bytes: Array[Byte], width: Int = ImgWidth): Array[Byte] = {
    val h = math.max(1, (bytes.length + width - 1) / width)
    val img = new BufferedImage(width, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var i = 0
    while (i < bytes.length) {
      raster.setSample(i % width, i / width, 0, bytes(i) & 0xff)
      i += 1
    }
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real PNG decode via ImageIO; returns the gray raster row-major. */
  def decodePng(payload: Array[Byte]): DecodedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1 }
      y += 1
    }
    DecodedImage(w, h, px)
  }

  /** bytes → real WAV: 8-bit unsigned PCM mono 8 kHz, sample i = byte i. */
  def encodeWav(bytes: Array[Byte]): Array[Byte] = {
    val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(
      new ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
    val out = new ByteArrayOutputStream(bytes.length + 64)
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Real WAV decode via AudioSystem; 8-bit unsigned PCM samples. */
  def decodeWav(payload: Array[Byte]): Array[Byte] = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try ais.readAllBytes()
    finally ais.close()
  }

  /** The fixture render contract is byte == codepoint: the oracles count
    * characters (`ascii`, `length`) while the render encodes bytes, which
    * agree exactly on ASCII and diverge on nothing else — DuckDB's
    * `CAST(text AS BLOB)` (m01) THROWS on non-ASCII, and this guard makes
    * the Spark side fail just as loudly instead of silently hash-
    * diverging (round-4 review finding).
    */
  private def asciiBytes(id: Long, text: String): Array[Byte] = {
    val b = text.getBytes(StandardCharsets.UTF_8)
    require(b.length == text.length,
      s"media render contract is ASCII (byte==codepoint); doc $id has ${b.length} bytes for ${text.length} chars")
    b
  }

  /** documents rendered as real PNG blobs — the testdata's stand-in for
    * an image column (encode is itself a narrow partition-local stage; a
    * deployment reads pre-encoded blobs).
    */
  def imageBlobs(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val b = asciiBytes(id, text)
        MediaBlob(id, "image/png", encodePng(b), b.length)
      })
  }

  /** documents rendered as real WAV blobs (8-bit PCM, sample = byte). */
  def audioBlobs(s: SparkSession, dir: String): Dataset[MediaBlob] = {
    import s.implicits._
    t(s, dir, "documents").select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val b = asciiBytes(id, text)
        MediaBlob(id, "audio/wav", encodeWav(b), b.length)
      })
  }

  /** Per-frame byte sums over the first `n` decoded values (trims the
    * codec's raster padding): frames of `frameSize`, every `stride`-th.
    */
  def frameSums(
      pixels: Array[Byte], n: Int, frameSize: Int,
      stride: Int): Iterator[(Int, Long)] = {
    val nf = n / frameSize
    (0 until nf by stride).iterator.map { fi =>
      var sum = 0L
      var i = fi * frameSize
      val end = i + frameSize
      while (i < end) { sum += pixels(i) & 0xff; i += 1 }
      (fi, sum)
    }
  }

  /** Decode → features, one narrow stage: real dims + whole-raster pixel
    * sum (padding pixels are zero, so the sum equals the content sum).
    */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val d = decodePng(b.payload)
      var sum = 0L
      var i = 0
      while (i < d.pixels.length) { sum += d.pixels(i) & 0xff; i += 1 }
      MediaFeatures(b.media_id, b.kind, d.width, d.height, sum)
    })
  }

  /** Decode → REAL 2× downscale (average-pool each 2×2 pixel block,
    * integer floor), one narrow stage. Emits the pooled-pixel sum as the
    * cross-engine checksum of the resampled raster.
    */
  def resized(blobs: Dataset[MediaBlob]): Dataset[ResizedMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val d = decodePng(b.payload)
      val rw = d.width / 2
      val rh = d.height / 2
      var sum = 0L
      var r = 0
      while (r < rh) {
        var c = 0
        while (c < rw) {
          val tl = 2 * r * d.width + 2 * c
          val p = (d.pixels(tl) & 0xff) + (d.pixels(tl + 1) & 0xff) +
            (d.pixels(tl + d.width) & 0xff) + (d.pixels(tl + d.width + 1) & 0xff)
          sum += p / 4
          c += 1
        }
        r += 1
      }
      ResizedMedia(b.media_id, rw, rh, sum)
    })
  }

  /** Blob → sampled frames over the decoded raster (flatMap: one row in,
    * many out, still narrow).
    */
  final case class PatchRow(
      media_id: Long, patch_row: Int, patch_col: Int, pixel_sum: Long)

  /** 8×8 patch tiling of the decoded raster (complete patch rows only):
    * one row per patch with its integer pixel sum. */
  def imagePatches(blobs: Dataset[MediaBlob], patch: Int = 8): Dataset[PatchRow] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val d = decodePng(b.payload)
      val rows = d.height / patch
      val cols = d.width / patch
      for {
        pr <- (0 until rows).iterator
        pc <- 0 until cols
      } yield {
        var sum = 0L
        var dr = 0
        while (dr < patch) {
          var dc = 0
          while (dc < patch) {
            sum += (d.pixels((pr * patch + dr) * d.width + pc * patch + dc) & 0xff)
            dc += 1
          }
          dr += 1
        }
        PatchRow(b.media_id, pr, pc, sum)
      }
    })
  }

  def sampledFrames(
      blobs: Dataset[MediaBlob], frameSize: Int = 64,
      stride: Int = 4): Dataset[FrameSample] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val d = decodePng(b.payload)
      frameSums(d.pixels, b.orig_len, frameSize, stride).map { case (fi, sum) =>
        FrameSample(b.media_id, fi, frameSize.toLong, sum)
      }
    })
  }

  /** Decoded WAV samples → overlapping feature windows (size 32, hop 16 —
    * 50% overlap, the standard spectrogram shape), each emitting integer
    * energy (sample sum) and DC-removed crossings (adjacent samples
    * straddling the window mean, compared as `sample*win < energy` — all
    * integer, so any engine agrees). Narrow flatMap.
    */
  def audioWindows(
      blobs: Dataset[MediaBlob], win: Int = 32,
      hop: Int = 16): Dataset[AudioWindow] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.flatMap { b =>
      val p = decodeWav(b.payload)
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
    })
  }

  final case class ResampledAudio(
      media_id: Long, n_in: Long, n_out: Long, wsum_out: Long)

  /** m12: 2:1 audio DOWNSAMPLE over the REAL decoded PCM — the sample-
    * rate-conversion prep op (a speech pipeline normalizes every clip to
    * one rate before featurization). Each output sample is the exact
    * integer midpoint of an adjacent input pair, `(s[2i] + s[2i+1]) div
    * 2` — the box-filter anti-aliasing for a 2:1 ratio — and the emitted
    * checksum is POSITION-WEIGHTED (Σ (i+1)·out_i, m11's geometry-
    * observable trick), so a dropped, duplicated, or reordered sample
    * changes the hash. Decode runs in the same shuffle-free
    * mapPartitions stage as every media op; DuckDB replays samples,
    * midpoints, and the weighted sum from the raw text bytes.
    */
  def resampleAudio(blobs: Dataset[MediaBlob]): Dataset[ResampledAudio] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val p = decodeWav(b.payload)
      val nOut = p.length / 2
      var wsum = 0L
      var i = 0
      while (i < nOut) {
        val mid = (((p(2 * i) & 0xff) + (p(2 * i + 1) & 0xff)) / 2).toLong
        wsum += (i + 1L) * mid
        i += 1
      }
      ResampledAudio(b.media_id, p.length.toLong, nOut.toLong, wsum)
    })
  }

  final case class AugMedia(
      media_id: Long, aug_width: Int, aug_height: Int, flip_crop_wsum: Long)

  /** m11: augmentation over the REAL decoded raster — horizontal flip of
    * a center crop (columns 8..23 of the 32-wide raster, mirrored), the
    * canonical vision-training prep transform. The emitted checksum is
    * POSITION-WEIGHTED (`Σ (c'+1)·pixel`) so a wrong mirror order or a
    * shifted crop window changes the value — a plain pixel sum would be
    * flip-invariant and prove nothing. Narrow mapPartitions, no shuffle.
    */
  def augmented(blobs: Dataset[MediaBlob]): Dataset[AugMedia] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { b =>
      val d = decodePng(b.payload)
      var sum = 0L
      var r = 0
      while (r < d.height) {
        var c = 0
        while (c < 16) {
          // output column c' reads source column 23-c' (flip of 8..23)
          sum += (c + 1).toLong * (d.pixels(r * d.width + 23 - c) & 0xff)
          c += 1
        }
        r += 1
      }
      AugMedia(b.media_id, 16, d.height, sum)
    })
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

    // REAL decode pipeline: render text bytes → PNG, decode with ImageIO,
    // emit the decoded dims + whole-raster pixel sum. PNG is lossless and
    // the render is pixel i = byte i (width 32, zero-padded last row), so
    // DuckDB recomputes every output from the raw text: width is the
    // constant raster width, height = ceil(len/32) (min 1), and the pixel
    // sum = the text byte sum (padding is zero). Matching hashes prove
    // the real encode→decode round trip.
    Q("m02_decode_features",
      (s, dir) => extractFeatures(imageBlobs(s, dir)).toDF(),
      Some("""WITH c AS (
             |  SELECT doc_id, CAST(SUM(ascii(ch)) AS BIGINT) AS s FROM (
             |    SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
             |  GROUP BY doc_id)
             |SELECT d.doc_id AS media_id, 'image/png' AS kind,
             |  CAST(32 AS INT) AS width,
             |  CAST(greatest((length(text) + 31) // 32, 1) AS INT) AS height,
             |  COALESCE(c.s, 0) AS byte_sum
             |FROM documents d LEFT JOIN c ON c.doc_id = d.doc_id""".stripMargin)),

    // REAL resize: decode the PNG, average-pool each 2×2 block (integer
    // floor — the standard box-filter downscale), emit halved dims + the
    // pooled-pixel sum. DuckDB replays the pooling from text bytes by
    // direct index lookups: block (pi//16, pi%16) pools flat indices
    // {base, base+1, base+32, base+33}, base = (pi//16)*64 + (pi%16)*2,
    // out-of-content indices are the PNG's zero padding.
    Q("m03_resize",
      (s, dir) => resized(imageBlobs(s, dir)).toDF(),
      Some("""WITH d AS (SELECT doc_id, text, length(text) AS n,
             |            CAST(greatest((length(text) + 31) // 32, 1) AS INT) AS h
             |          FROM documents),
             |g AS (SELECT doc_id, text, n, unnest(range(0, (h // 2) * 16)) AS pi FROM d),
             |v AS (SELECT doc_id,
             |        ((CASE WHEN (pi // 16) * 64 + (pi % 16) * 2 < n
             |           THEN ascii(substr(text, CAST((pi // 16) * 64 + (pi % 16) * 2 + 1 AS INT), 1)) ELSE 0 END)
             |       + (CASE WHEN (pi // 16) * 64 + (pi % 16) * 2 + 1 < n
             |           THEN ascii(substr(text, CAST((pi // 16) * 64 + (pi % 16) * 2 + 2 AS INT), 1)) ELSE 0 END)
             |       + (CASE WHEN (pi // 16) * 64 + (pi % 16) * 2 + 32 < n
             |           THEN ascii(substr(text, CAST((pi // 16) * 64 + (pi % 16) * 2 + 33 AS INT), 1)) ELSE 0 END)
             |       + (CASE WHEN (pi // 16) * 64 + (pi % 16) * 2 + 33 < n
             |           THEN ascii(substr(text, CAST((pi // 16) * 64 + (pi % 16) * 2 + 34 AS INT), 1)) ELSE 0 END)) // 4 AS pooled
             |      FROM g),
             |ps AS (SELECT doc_id, CAST(SUM(pooled) AS BIGINT) AS pooled_sum FROM v GROUP BY doc_id)
             |SELECT d.doc_id AS media_id, CAST(16 AS INT) AS width,
             |       CAST(d.h // 2 AS INT) AS height,
             |       COALESCE(ps.pooled_sum, 0) AS pooled_sum
             |FROM d LEFT JOIN ps ON ps.doc_id = d.doc_id""".stripMargin)),

    // frame sampling over the REAL decoded raster: one blob → many frame
    // rows (frames of 64 pixels, every 4th), per-frame integer pixel
    // sums. Frames cover the first orig_len pixels (the typed-metadata
    // column trims the raster padding), so DuckDB slices the same frames
    // straight out of the text.
    Q("m04_frame_sample",
      (s, dir) => sampledFrames(imageBlobs(s, dir)).toDF()
        .select(col("media_id"), col("frame_index").cast("long").as("frame_index"),
          col("frame_bytes"), col("byte_sum")),
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

    // perceptual-hash dedup: a dHash over the REAL decoded raster — bit_i
    // set when frame_i's pixel-sum exceeds frame_{i+1}'s (16-pixel
    // frames, ≤16 bits; the gradient structure of a real image dHash).
    // All comparisons are integer pixel-sums == text byte-sums, so DuckDB
    // replays the hash bit-for-bit. Scale: hashing is narrow
    // (mapPartitions); the bucket size is one linear window — the
    // standard image-dedup shape (pHash → bucket → review).
    Q("m05_phash_dedup",
      (s, dir) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val hashed = imageBlobs(s, dir)
          .mapPartitions(_.map { b =>
            val d = decodePng(b.payload)
            val sums = frameSums(d.pixels, math.min(b.orig_len, 17 * 16), 16, 1)
              .map(_._2).toArray
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

    // audio feature windows over REAL decoded WAV samples (8-bit PCM —
    // decode recovers sample i = byte i exactly): energy + DC-removed
    // crossings per 50%-overlap window, all integer arithmetic — DuckDB
    // replays windowing, energy, and the sample*win < energy crossing
    // comparisons from the raw text bytes.
    Q("m06_audio_windows",
      (s, dir) => audioWindows(audioBlobs(s, dir)).toDF()
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

    Q("m12_resample",
      (s, dir) => resampleAudio(audioBlobs(s, dir)).toDF(),
      Some("""WITH f AS (SELECT doc_id AS media_id, text,
             |             CAST(length(text) AS BIGINT) AS n_in FROM documents),
             |o AS (SELECT media_id, n_in, n_in // 2 AS n_out,
             |        [(ascii(text[CAST(2 * i - 1 AS INT)]) + ascii(text[CAST(2 * i AS INT)])) // 2
             |         for i in range(1, CAST(n_in // 2 AS INT) + 1)] AS outs
             |      FROM f)
             |SELECT media_id, n_in, CAST(n_out AS BIGINT) AS n_out,
             |  CAST(COALESCE(list_sum([outs[i] * i for i in range(1, CAST(n_out AS INT) + 1)]), 0) AS BIGINT) AS wsum_out
             |FROM o""".stripMargin)),

    // metadata-only blob scan: parse the PNG IHDR straight out of the
    // binary column with codegen'd byte arithmetic — NO decode. The cheap
    // first pass a 100 TB media pipeline runs (dimensions/type audit at
    // scan speed, one narrow stage). The render contract fixes what the
    // real encoder must have written (32-wide 8-bit grayscale, height
    // ceil(len/32)), so DuckDB replays the expected header from the raw
    // text and a hash-match proves both the encoder's output and the
    // binary-column parsing.
    Q("m08_png_metadata",
      (s, dir) => imageBlobs(s, dir).toDF()
        .select(col("media_id"),
          // PNG layout: 8-byte signature, IHDR chunk (4 len + 4 type),
          // then width/height as 4-byte big-endian + bit depth + color type
          expr("CAST(conv(hex(substring(payload, 17, 4)), 16, 10) AS INT)").as("width"),
          expr("CAST(conv(hex(substring(payload, 21, 4)), 16, 10) AS INT)").as("height"),
          expr("CAST(conv(hex(substring(payload, 25, 1)), 16, 10) AS INT)").as("bit_depth"),
          expr("CAST(conv(hex(substring(payload, 26, 1)), 16, 10) AS INT)").as("color_type")),
      Some("""SELECT doc_id AS media_id, CAST(32 AS INT) AS width,
             |  CAST(greatest((length(text) + 31) // 32, 1) AS INT) AS height,
             |  CAST(8 AS INT) AS bit_depth, CAST(0 AS INT) AS color_type
             |FROM documents""".stripMargin)),

    // metadata-only WAV scan (m08's audio sibling): decode the canonical
    // 44-byte RIFF/WAVE header from the binary column with little-endian
    // byte arithmetic — no audio decode. The render contract (8 kHz mono
    // 8-bit PCM, data bytes = text bytes) fixes what the real
    // javax.sound encoder must have written.
    Q("m09_wav_metadata",
      (s, dir) => {
        def b(pos: Int) = s"CAST(conv(hex(substring(payload, $pos, 1)), 16, 10) AS BIGINT)"
        audioBlobs(s, dir).toDF()
          .select(col("media_id"),
            expr(s"CAST(${b(25)} + 256*${b(26)} + 65536*${b(27)} + 16777216*${b(28)} AS BIGINT)")
              .as("sample_rate"),
            expr(s"CAST(${b(23)} + 256*${b(24)} AS INT)").as("channels"),
            expr(s"CAST(${b(35)} + 256*${b(36)} AS INT)").as("bits_per_sample"),
            expr(s"CAST(${b(41)} + 256*${b(42)} + 65536*${b(43)} + 16777216*${b(44)} AS BIGINT)")
              .as("data_bytes"))
      },
      Some("""SELECT doc_id AS media_id, CAST(8000 AS BIGINT) AS sample_rate,
             |  CAST(1 AS INT) AS channels, CAST(8 AS INT) AS bits_per_sample,
             |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS data_bytes
             |FROM documents""".stripMargin)),

    // video-style scene-change detection over REAL decoded frames
    // (64-pixel slices, stride 1): a cut is an adjacent-frame pixel-sum
    // jump ≥ 300. Frame extraction + integer sums are the narrow m04
    // stage; the only wide step is the per-media lag window
    // (co-partitioned by media_id — one shuffle, linear).
    Q("m07_scene_cuts",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val fr = sampledFrames(imageBlobs(s, dir), frameSize = 64, stride = 1)
          .toDF()
          .select(col("media_id"),
            col("frame_index").cast(LongType).as("frame_index"),
            col("byte_sum"))
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
             |FROM d WHERE delta >= 300""".stripMargin)),

    // --- m10: ViT-style patch grid over the REAL decoded raster ------------
    // The vision-transformer prep op: decode the PNG and tile the 32-wide
    // raster into 8×8 patches (complete patch rows only), one row per
    // patch with its integer pixel sum — the thing a patch-embedding
    // stage consumes. Same narrow shape as m02/m04 (decode inside
    // mapPartitions, no shuffle before the per-patch emission); the
    // lossless render contract lets DuckDB recompute every patch sum
    // straight from the text bytes (flat index (pr·8+dr)·32 + pc·8+dc,
    // zero beyond the content — the PNG's padding).
    Q("m10_image_patches",
      (s, dir) => imagePatches(imageBlobs(s, dir)).toDF()
        .select(col("media_id"), col("patch_row").cast(LongType).as("patch_row"),
          col("patch_col").cast(LongType).as("patch_col"), col("pixel_sum")),
      Some("""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n,
             |            CAST(greatest((length(text) + 31) // 32, 1) AS INT) AS h
             |          FROM documents),
             |g AS (SELECT media_id, text, n, unnest(range(0, (h // 8) * 4)) AS pi FROM d),
             |p AS (SELECT media_id, pi // 4 AS pr, pi % 4 AS pc,
             |        CAST(list_sum([CASE WHEN ((pi // 4) * 8 + k // 8) * 32 + (pi % 4) * 8 + k % 8 < n
             |          THEN ascii(substr(text, CAST(((pi // 4) * 8 + k // 8) * 32 + (pi % 4) * 8 + k % 8 + 1 AS INT), 1))
             |          ELSE 0 END for k in range(0, 64)]) AS BIGINT) AS pixel_sum
             |      FROM g)
             |SELECT media_id, CAST(pr AS BIGINT) AS patch_row,
             |       CAST(pc AS BIGINT) AS patch_col, pixel_sum
             |FROM p""".stripMargin)),

    // flip + center-crop augmentation over the real decoded raster; the
    // position-weighted checksum makes the mirror ORDER observable, so
    // DuckDB's index replay (source column 23-c' for output column c',
    // zero beyond the content length — the codec's raster padding)
    // verifies the actual geometry, not just the pixel multiset
    Q("m11_augment",
      (s, dir) => augmented(imageBlobs(s, dir)).toDF(),
      Some("""WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n,
             |            CAST(greatest((length(text) + 31) // 32, 1) AS INT) AS h
             |          FROM documents),
             |g AS (SELECT media_id, text, n, unnest(range(0, h * 16)) AS pi FROM d),
             |v AS (SELECT media_id,
             |        (pi % 16 + 1) * (CASE WHEN (pi // 16) * 32 + 23 - (pi % 16) < n
             |          THEN ascii(substr(text, CAST((pi // 16) * 32 + 23 - (pi % 16) + 1 AS INT), 1))
             |          ELSE 0 END) AS wv
             |      FROM g)
             |SELECT d.media_id, CAST(16 AS INT) AS aug_width, d.h AS aug_height,
             |       CAST(SUM(v.wv) AS BIGINT) AS flip_crop_wsum
             |FROM d JOIN v ON v.media_id = d.media_id
             |GROUP BY d.media_id, d.h""".stripMargin))
  )
}
