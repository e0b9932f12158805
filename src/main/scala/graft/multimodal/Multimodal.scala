package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling for training-data
  * pipelines: payloads are opaque `binary` columns with typed metadata; the
  * decode step itself is STUBBED (no media libraries in this environment)
  * behind a deterministic fake codec, while everything Spark-side — schema,
  * batch shape, partition sizing, column plumbing — is real.
  *
  * The fake codec: a payload is `[w:int16][h:int16][c:int8][pixels...]`
  * (big-endian), one byte per sample. `decodeMeta`/`resize`/`frameSample`/
  * `featurize` operate on that layout exactly as a real codec integration
  * would (replace `FakeCodec` with an actual decoder to go live).
  *
  * Scale notes: all operators are `mapPartitions` over the binary payloads —
  * narrow, no shuffle; `repartitionBySize` rebalances skewed media sizes
  * BEFORE the expensive decode so one task doesn't serialize a partition of
  * 4K videos while others hold thumbnails.
  */
object Multimodal {

  val metaType: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType),
    StructField("valid", BooleanType)))

  /** The stub decoder. A real integration replaces this object only. */
  object FakeCodec {
    def decode(payload: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (payload == null || payload.length < 5) return None
      val w = ((payload(0) & 0xff) << 8) | (payload(1) & 0xff)
      val h = ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
      val c = payload(4) & 0xff
      val n = w.toLong * h * c
      if (n != payload.length - 5L || c < 1) None
      else Some((w, h, c, java.util.Arrays.copyOfRange(payload, 5, payload.length)))
    }

    def encode(w: Int, h: Int, c: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length == w * h * c)
      val out = new Array[Byte](5 + pixels.length)
      out(0) = (w >> 8).toByte; out(1) = w.toByte
      out(2) = (h >> 8).toByte; out(3) = h.toByte
      out(4) = c.toByte
      System.arraycopy(pixels, 0, out, 5, pixels.length)
      out
    }
  }

  /** Decode metadata for a binary column: adds a `meta` struct column.
    * mapPartitions batch shape: one decoded payload at a time, nothing
    * buffered — bounded memory however large individual payloads are. */
  def withMeta(df: DataFrame, binCol: String): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", metaType))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val meta = FakeCodec.decode(payload) match {
          case Some((w, h, c, _)) =>
            Row(w, h, c, if (payload == null) 0L else payload.length.toLong, true)
          case None =>
            Row(null, null, null, if (payload == null) 0L else payload.length.toLong, false)
        }
        Row.fromSeq(r.toSeq :+ meta)
      }
    }(enc)
  }

  /** Nearest-neighbor resize of the fake-codec payloads to (tw x th).
    * Invalid payloads pass through as null. */
  def resize(df: DataFrame, binCol: String, tw: Int, th: Int): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(df.schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val out = FakeCodec.decode(r.getAs[Array[Byte]](idx)).map { case (w, h, c, px) =>
          val resized = new Array[Byte](tw * th * c)
          var y = 0
          while (y < th) {
            val sy = y * h / th
            var x = 0
            while (x < tw) {
              val sx = x * w / tw
              var ch = 0
              while (ch < c) {
                resized((y * tw + x) * c + ch) = px((sy * w + sx) * c + ch)
                ch += 1
              }
              x += 1
            }
            y += 1
          }
          FakeCodec.encode(tw, th, c, resized)
        }.orNull
        Row.fromSeq(r.toSeq.updated(idx, out))
      }
    }(enc)
  }

  /** Deterministic feature vector from a payload: `dim` floats folded from a
    * rolling hash of the pixel bytes (stands in for a real embedding model;
    * the column type Array[Float] matches graft.similarity's input). */
  def featurize(df: DataFrame, binCol: String, dim: Int = 64): DataFrame = {
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](idx)
        val feats =
          if (payload == null) null
          else {
            val acc = new Array[Long](dim)
            var i = 0
            while (i < payload.length) {
              acc(i % dim) = (acc(i % dim) * 31 + (payload(i) & 0xff)) % 1000003L
              i += 1
            }
            acc.map(v => (v.toDouble / 1000003d).toFloat)
          }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Frame sampling for video-like `array<binary>` columns: keep every
    * `stride`-th frame, exploded to one row per kept frame with its index.
    * Pure built-ins (posexplode + filter) — the generate and the filter
    * both stay inside whole-stage codegen and the filter prunes before any
    * downstream decode touches the dropped frames. */
  def frameSample(df: DataFrame, framesCol: String, stride: Int): DataFrame = {
    require(stride >= 1, "stride must be >= 1")
    df.select(col("*"), posexplode(col(framesCol)).as(Seq("frame_idx", "frame")))
      .filter(col("frame_idx") % stride === 0)
      .drop(framesCol)
  }

  /** Perceptual hash (aHash) of a decoded payload: each of the first
    * `bits` pixels compares to their integer mean; bit i is set when
    * pixel i exceeds it. Identical and near-identical images (re-encodes,
    * tiny edits) collide on the hash, so image dedup becomes the same
    * group-by-key shape as text fingerprint dedup — no pairwise image
    * comparison ever runs. A real deployment hashes a downscaled
    * luminance plane (resize feeds this directly); the mean-threshold
    * arithmetic is the part pinned cross-engine. Adds a `phash` column:
    * null when the payload fails decode OR decodes to fewer than `bits`
    * pixels — a partial payload must NOT hash (two images identical in
    * their first `bits` bytes but different elsewhere would otherwise
    * collide as "duplicate candidates"); feed resize(bits-sized) output
    * or pre-filter to full payloads. */
  def phash(df: DataFrame, binCol: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+ StructField("phash", LongType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val h: java.lang.Long = FakeCodec.decode(r.getAs[Array[Byte]](idx)) match {
          case Some((_, _, _, px)) if px.length >= bits =>
            var sum = 0L
            var i = 0
            while (i < bits) { sum += (px(i) & 0xff); i += 1 }
            val mean = sum / bits
            var out = 0L
            i = 0
            while (i < bits) {
              if ((px(i) & 0xff) > mean) out |= 1L << i
              i += 1
            }
            out
          case _ => null // failed decode or partial payload: no hash
        }
        Row.fromSeq(r.toSeq :+ h)
      }
    }(enc)
  }

  /** Windowed audio features over a decoded 1-D payload (the audio leg of
    * the fake codec: w = n samples, h = 1, c = 1 — a real integration
    * swaps FakeCodec for a PCM decoder only). Each window of `win`
    * samples at stride `stride` yields its integer energy (sum of
    * unsigned sample bytes) — the stand-in for a mel/chroma frame, which
    * is exactly how acoustic fingerprinting (Chromaprint/Shazam-style)
    * frames audio before hashing. Adds `energies: array<long>` (null for
    * failed decodes or payloads shorter than one window); same narrow
    * no-shuffle mapPartitions shape as the image operators. */
  def audioFeatures(df: DataFrame, binCol: String, win: Int, stride: Int): DataFrame = {
    require(win >= 1 && stride >= 1, s"win/stride must be >= 1, got $win/$stride")
    val idx = df.schema.fieldIndex(binCol)
    val schema = StructType(df.schema.fields :+
      StructField("energies", ArrayType(LongType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val feats = FakeCodec.decode(r.getAs[Array[Byte]](idx)) match {
          case Some((_, _, _, samples)) if samples.length >= win =>
            val n = (samples.length - win) / stride + 1
            val out = new Array[Long](n)
            var j = 0
            while (j < n) {
              var e = 0L
              var i = 0
              while (i < win) { e += (samples(j * stride + i) & 0xff); i += 1 }
              out(j) = e
              j += 1
            }
            out
          case _ => null
        }
        Row.fromSeq(r.toSeq :+ feats)
      }
    }(enc)
  }

  /** Rebalance by payload size before expensive per-byte work: targets
    * `bytesPerPartition` per task, so mixed thumbnail/4K corpora decode with
    * even task durations instead of long-tail stragglers. */
  def repartitionBySize(df: DataFrame, binCol: String, bytesPerPartition: Long = 128L << 20): DataFrame = {
    val total = df.select(sum(octet_length(col(binCol)).cast(LongType))).head().getLong(0)
    val parts = math.max(1, math.min(Int.MaxValue.toLong, (total + bytesPerPartition - 1) / bytesPerPartition)).toInt
    df.repartition(parts)
  }
}
