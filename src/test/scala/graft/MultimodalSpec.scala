package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal

/** Multimodal plumbing: binary columns, metadata struct, batched feature
  * extraction (decode step stubbed — no codecs in container), frame
  * sampling. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("assets carry binary payloads with typed metadata") {
    val a = Multimodal.assets(spark, sfDir).cache()
    assert(a.schema("payload").dataType.typeName == "binary")
    assert(a.select($"meta.mime").distinct().as[String].collect()
      .sameElements(Array("image/png")))
    assert(a.filter($"meta.width" < 16 || $"meta.height" < 16).count() == 0)
    a.unpersist()
  }

  test("feature extraction is deterministic with fixed-width output") {
    val f1 = Multimodal.extractFeatures(spark, sfDir)
      .orderBy($"asset_id").collect().map(_.toSeq)
    val f2 = Multimodal.extractFeatures(spark, sfDir)
      .repartition(7).orderBy($"asset_id").collect().map(_.toSeq)
    assert(f1.sameElements(f2))
    val dims = Multimodal.extractFeatures(spark, sfDir)
      .select(size($"features")).distinct().as[Int].collect()
    assert(dims.sameElements(Array(8)))
  }

  test("byte length equals utf-8 length of the source text") {
    val j = Multimodal.multimodalBinaryMeta(spark, sfDir)
      .join(graft.Tables.documents(spark, sfDir),
        $"asset_id" === $"doc_id")
    assert(j.filter($"byte_len" =!= length($"text")).count() == 0)
  }

  test("frame sampling emits every k-th frame within bounds") {
    val fs = Multimodal.frameSample(spark, sfDir, everyK = 10).cache()
    assert(fs.filter($"frame_idx" % 10 =!= 0).count() == 0)
    assert(fs.filter($"frame_idx" >= $"n_frames").count() == 0)
    fs.unpersist()
  }
}
