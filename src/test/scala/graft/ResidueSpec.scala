package graft

import org.apache.spark.storage.StorageLevel
import graft.ops.Residue

/** Lifecycle contract of the checkpoint-residue registry (r10): a warm
  * re-invocation must never be slower than cold because of the previous
  * invocation's localCheckpoint blocks — Residue frees blocks on
  * re-entry (swap) and at family boundaries (freeAll). */
class ResidueSpec extends SparkSuite {
  import spark.implicits._

  private def persistedRddIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.collect {
      case (id, rdd) if rdd.getStorageLevel != StorageLevel.NONE => id
    }.toSet

  private def checkpointRddId(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.getOrElse(fail("no LogicalRDD in plan — not a checkpointed frame"))

  test("swap materializes eagerly and frees the previous holder on re-entry") {
    val a = Residue.swap("residue_spec.k1", spark.range(100).toDF("id"))
    val idA = checkpointRddId(a)
    assert(persistedRddIds.contains(idA), "swap must materialize blocks")
    assert(a.count() == 100)
    // second invocation under the SAME key: previous blocks must be freed
    val b = Residue.swap("residue_spec.k1", spark.range(50).toDF("id"))
    val idB = checkpointRddId(b)
    assert(!persistedRddIds.contains(idA),
      "re-entry must unpersist the previous invocation's blocks")
    assert(persistedRddIds.contains(idB))
    assert(b.count() == 50)
    Residue.free("residue_spec.k1")
  }

  test("freeAll drops every registered frame; keys are independent") {
    val x = Residue.swap("residue_spec.x", spark.range(10).toDF("id"))
    val y = Residue.swap("residue_spec.y", spark.range(20).toDF("id"))
    val (ix, iy) = (checkpointRddId(x), checkpointRddId(y))
    // freeing one key leaves the other untouched
    Residue.free("residue_spec.x")
    assert(!persistedRddIds.contains(ix))
    assert(persistedRddIds.contains(iy))
    Residue.freeAll()
    assert(!persistedRddIds.contains(iy),
      "freeAll must unpersist all registered frames")
  }

  test("track registers an already-materialized frame without re-checkpointing") {
    val cp = spark.range(30).toDF("id").localCheckpoint()
    val id = checkpointRddId(cp)
    val tracked = Residue.track("residue_spec.t", cp)
    assert(checkpointRddId(tracked) == id, "track must not rebuild the frame")
    Residue.free("residue_spec.t")
    assert(!persistedRddIds.contains(id))
  }

  test("free on an unknown key is a no-op") {
    Residue.free("residue_spec.never_registered")
  }
}
