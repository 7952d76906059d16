package graft

import graft.ops.Progress

/** Progress/status-store observability (§2.A progress_cadence,
  * state_job_status infra side). */
class ProgressSpec extends SparkSuite {

  test("status store: unknown job yields NOT_FOUND sentinel") {
    val store = new Progress.StatusStore
    assert(store.get("nope").step == "NOT_FOUND")
  }

  test("instrumented ingest walks INIT -> PROCESSING -> JOB_COMPLETE") {
    val store = new Progress.StatusStore
    val done = Progress.runInstrumentedIngest(spark, sfDir, "job1", store)
    assert(done.step == "JOB_COMPLETE")
    assert(done.processed == 1500L) // orders rows at sf0.001
    assert(done.processed == done.total)
    assert(store.get("job1").step == "JOB_COMPLETE")
  }

  test("processed counter equals valid + invalid split") {
    val store = new Progress.StatusStore
    val done = Progress.runInstrumentedIngest(spark, sfDir, "job2", store)
    val c = graft.ops.Ingest.aggJobCounters(spark, sfDir).collect()(0)
    assert(done.processed == c.getLong(0))
  }
}
