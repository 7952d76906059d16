package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Multimodal-column plumbing (north_star: image/audio/video as opaque
  * binary columns with typed metadata).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB; everything around it — the binary
  * column, the metadata struct, the batched mapPartitions feature
  * extractor, the frame sampler, the partitioning — is real, tested Spark
  * plumbing. Swapping `stubDecode` for a JNI/codec call changes no schema
  * and no plan shape.
  *
  * Scale: media bytes travel only inside their partition (mapPartitions,
  * no shuffle of blobs); metadata-only queries prune the binary column at
  * the parquet scan.
  */
object Multimodal {

  /** Media "asset" table derived from documents: payload = utf-8 bytes of
    * text standing in for an image blob; metadata struct typed as a real
    * pipeline would carry (mime, width, height derived deterministically). */
  def assets(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir).select(
      $"doc_id".as("asset_id"),
      encode($"text", "UTF-8").as("payload"),
      struct(
        lit("image/png").as("mime"),
        ($"n_chars" % 640 + 16).cast("int").as("width"),
        ($"n_chars" % 480 + 16).cast("int").as("height"),
        $"source".as("origin")).as("meta"))
  }

  /** ===== STUB ===== deterministic fake decoder: a real implementation
    * would decode image bytes to pixels here (no codec libs in this
    * container). Produces an 8-float "feature" vector from the payload
    * bytes so downstream plumbing is exercised end-to-end. */
  private def stubDecode(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction over the binary column: mapPartitions (the
    * Scala analog of mapInPandas batches) keeps the blob local to its
    * partition and amortizes per-batch setup (a real decoder would init
    * its codec once per partition here). */
  def extractFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    val df = assets(spark, sfDir)
    val outSchema = StructType(Seq(
      StructField("asset_id", LongType),
      StructField("byte_len", IntegerType),
      StructField("features", ArrayType(FloatType)),
      StructField("width", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init would go here (codec handles, model weights)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        val meta = r.getAs[Row]("meta")
        Row(r.getLong(0), payload.length, stubDecode(payload),
          meta.getAs[Int]("width"))
      }
    }(enc)
  }

  /** Frame sampling for "video" assets: every k-th frame index up to a
    * deterministic per-asset frame count — pure column ops, one explode. */
  /** Content-hash dedup of binary payloads — identical media stored under
    * different ids collapse to one kept asset (min id) per sha-256. The
    * hash computes next to the bytes (map-side); only the 32-byte digest
    * ever shuffles — the blob itself never moves, which is the entire
    * design constraint for multi-TB media dedup. */
  def payloadDedup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .select($"asset_id", sha2($"payload", 256).as("sha"))
      .groupBy($"sha")
      .agg(min($"asset_id").as("kept_id"), count(lit(1)).as("n_copies"))
      .orderBy($"kept_id")
  }

  def frameSample(spark: SparkSession, sfDir: String, everyK: Int = 10): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .select($"asset_id", ($"meta.width" % 90 + 10).as("n_frames"))
      .select($"asset_id", $"n_frames",
        explode(sequence(lit(0), $"n_frames" - 1, lit(everyK))).as("frame_idx"))
      .orderBy($"asset_id", $"frame_idx")
  }

  /** Size-bounded shard packing — the WebDataset/tar-sharding move that
    * turns a blob corpus into fixed-size training shards a dataloader
    * can stream: per origin, assets are assigned to fixed-size shards
    * (4 KiB here, scaled to the synthetic payloads — production uses
    * 100s of MiB) by cumulative payload size in deterministic asset-id
    * order (`shard = (cum_bytes − 1) div shard_size`), and the query
    * reports each shard's manifest (count, bytes, id range).
    *
    * Scale: only (id, origin, size) rows enter the window — the BLOBS
    * never move for the assignment; the subsequent write would
    * `repartitionByRange(shard)` so each task streams exactly one
    * shard's bytes. Per-origin cumsum is one per-key sort, integer
    * math throughout. */
  def shardPack(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"origin").orderBy($"asset_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assets(spark, sfDir)
      .select($"asset_id", $"meta.origin".as("origin"),
        length($"payload").cast("long").as("n_bytes"))
      .withColumn("cum", sum($"n_bytes").over(w))
      .withColumn("shard_id", expr("(cum - 1) div 4096"))
      .groupBy($"origin", $"shard_id")
      .agg(count(lit(1)).as("n_assets"), sum($"n_bytes").as("shard_bytes"),
        min($"asset_id").as("first_asset"), max($"asset_id").as("last_asset"))
      .orderBy($"origin", $"shard_id")
  }

  /** Oracle-able metadata/binary query: byte length + sha256 of the
    * payload + pruned metadata fields (binary handled as a first-class
    * column in both engines). */
  def multimodalBinaryMeta(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    assets(spark, sfDir)
      .select($"asset_id",
        length($"payload").as("byte_len"),
        lower(sha2($"payload", 256)).as("sha"),
        $"meta.mime".as("mime"), $"meta.width".as("width"),
        $"meta.height".as("height"))
      .orderBy($"asset_id")
  }
}
