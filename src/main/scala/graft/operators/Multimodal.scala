package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, QModule, Tables}

/** Multimodal columns: image/audio/video as opaque BINARY content with
  * typed metadata, plus the decode / feature-extract / frame-sample
  * stages a multimodal training pipeline runs. The media libs are not in
  * this container, so the DECODE step is a clearly-marked deterministic
  * stub ([[decodeStub]]) — but the Spark-side plumbing is real: a binary
  * content column, a metadata struct, a partition-batched typed
  * `mapPartitions` feature extractor with a fixed-width Array[Float]
  * output (the exact shape a real decoder plugs into), and
  * modality-partitioned aggregation.
  *
  * Fixture binary content is synthesized from `documents.text` (UTF-8
  * bytes) so DuckDB can recompute every derived value from the same
  * parquet — making even the stubbed pipeline oracle-checkable.
  */
object Multimodal extends QModule {

  /** Modalities assigned deterministically by doc_id. */
  private val Modalities = Seq("image", "audio", "video")

  /** The multimodal table: (doc_id, modality, content BINARY, meta struct).
    * In production this is a parquet table with real media bytes; here
    * content = UTF-8(text). */
  def table(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables(s, d, "documents").select(
      $"doc_id",
      element_at(
        array(Modalities.map(lit): _*), ($"doc_id" % 3 + 1).cast("int")).as("modality"),
      $"text".cast("binary").as("content"),
      struct(
        length($"text").cast("long").as("n_bytes"),
        ($"n_chars" % 64 + 16).cast("long").as("width"),
        ($"n_chars" * 7 % 64 + 16).cast("long").as("height"))
        .as("meta"))
  }

  /** DECODE STUB — deterministic stand-in for the real media decoder
    * (`???` in spirit: a real implementation would replace exactly this
    * function, keeping the signature). Consumes the binary content of one
    * record, returns a fixed-width feature vector:
    *   f0 = mean byte value / 255
    *   f1 = (max − min byte) / 255       (dynamic range)
    *   f2 = n_bytes / 1000.0             (size feature)
    * A real image decoder would emit e.g. pooled channel statistics with
    * the same (binary → Array[Float]) contract. */
  def decodeStub(content: Array[Byte]): Array[Float] = {
    if (content.isEmpty) return Array(0.0f, 0.0f, 0.0f)
    var sum = 0L
    var mn = 255
    var mx = 0
    var i = 0
    while (i < content.length) {
      val b = content(i) & 0xff
      sum += b
      if (b < mn) mn = b
      if (b > mx) mx = b
      i += 1
    }
    val n = math.max(1, content.length)
    Array((sum.toDouble / n / 255.0).toFloat, ((mx - mn) / 255.0).toFloat, content.length / 1000.0f)
  }

  /** Frame sampling for "video" content: every `stride`-th 16-byte block
    * (deterministic frame-sample stand-in; a real pipeline samples every
    * Nth decoded frame with the same arithmetic). Returns sampled count. */
  def sampledFrames(nBytes: Long, stride: Int): Long = {
    val frames = (nBytes + 15) / 16
    (frames + stride - 1) / stride
  }

  // ---------------------------------------------------------------- q29
  /** Metadata extraction + modality-partitioned aggregation: per modality,
    * counts and average fake-decode dimensions, plus sampled-frame totals
    * for video rows. Everything derives from (doc_id, n_chars, text) so
    * the oracle recomputes it exactly. */
  private val q29 = Q(
    "q29_multimodal_meta",
    (s, d) => {
      import s.implicits._
      // pure column arithmetic (≡ sampledFrames(n, 4)) — stays inside
      // whole-stage codegen, no UDF in the path
      val frames = ceil(ceil($"meta.n_bytes" / 16.0) / 4.0).cast("long")
      table(s, d)
        .withColumn("n_frames_sampled",
          when($"modality" === "video", frames).otherwise(lit(0L)))
        .groupBy($"modality")
        .agg(
          count(lit(1)).as("n_items"),
          sum($"meta.n_bytes").as("total_bytes"),
          round(avg($"meta.width"), 4).as("avg_width"),
          round(avg($"meta.height"), 4).as("avg_height"),
          sum($"n_frames_sampled").as("total_frames_sampled"))
        .orderBy($"modality")
    },
    Some("""WITH mm AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(n_chars % 64 + 16 AS BIGINT) AS width,
               CAST(n_chars * 7 % 64 + 16 AS BIGINT) AS height
        FROM documents)
    SELECT modality, count(*) AS n_items, CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           round(avg(width), 4) AS avg_width, round(avg(height), 4) AS avg_height,
           CAST(sum(CASE WHEN modality = 'video'
                         THEN CAST(ceil(ceil(n_bytes / 16.0) / 4.0) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS total_frames_sampled
    FROM mm GROUP BY modality ORDER BY modality"""))

  // ---------------------------------------------------------------- q30
  /** The feature-extraction stage: typed mapPartitions over the binary
    * content running [[decodeStub]] per record (partition-batched — one
    * iterator pass, no per-row task overhead; swap in a real decoder and
    * nothing else changes), then a feature aggregate per modality. */
  private val q30 = Q(
    "q30_multimodal_features",
    (s, d) => {
      import s.implicits._
      val feats = table(s, d)
        .select($"doc_id", $"modality", $"content")
        .as[(Long, String, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, modality, content) =>
            val f = decodeStub(content)
            (id, modality, f(0).toDouble, f(1).toDouble, f(2).toDouble)
          }
        }
        .toDF("doc_id", "modality", "f_mean", "f_range", "f_size")
      feats
        .groupBy($"modality")
        .agg(
          count(lit(1)).as("n_items"),
          round(avg($"f_mean"), 4).as("avg_f_mean"),
          round(avg($"f_range"), 4).as("avg_f_range"),
          round(avg($"f_size"), 4).as("avg_f_size"))
        .orderBy($"modality")
    },
    Some("""WITH chars AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS modality,
               [ascii(c) for c in string_split(text, '')] AS bytes,
               CAST(length(text) AS BIGINT) AS n_bytes
        FROM documents),
      feats AS (
        SELECT doc_id, modality,
               CAST(CAST(list_avg(bytes) / 255.0 AS FLOAT) AS DOUBLE) AS f_mean,
               CAST(CAST((list_max(bytes) - list_min(bytes)) / 255.0 AS FLOAT) AS DOUBLE) AS f_range,
               CAST(CAST(n_bytes / 1000.0 AS FLOAT) AS DOUBLE) AS f_size
        FROM chars)
    SELECT modality, count(*) AS n_items,
           round(avg(f_mean), 4) AS avg_f_mean,
           round(avg(f_range), 4) AS avg_f_range,
           round(avg(f_size), 4) AS avg_f_size
    FROM feats GROUP BY modality ORDER BY modality"""))

  override def all: Seq[Q] = Seq(q29, q30)
}
