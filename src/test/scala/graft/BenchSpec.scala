package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's driver-facing stdout contract. The harness that runs
  * `graft.Bench` keeps only the last ~2000 characters of output and
  * parses the final JSON line; the summary exceeding that window is the
  * defect that silently nulled every BENCH_r*.json parse for seven
  * rounds — so the size budget is a test, not a comment. */
class BenchSpec extends AnyFunSuite {

  test("summary line stays far below the harness tail window") {
    // worst realistic case: long sf path and a handful of failed queries
    // with long names (a fully-failing board is driver-visible anyway)
    val errs = Seq("dedup_sorted_neighborhood", "dedup_incremental_minhash",
      "multimodal_frame_sample", "stream_watermark_late")
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = Bench.summaryLine(12345.678, 255, errs,
      "/root/testdata/sf0.1")
    assert(line.length <= 300, s"summary line ${line.length} chars: $line")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
    assert(line.endsWith("}"))
  }

  test("summary line is valid minimal JSON with the fields the driver reads") {
    val line = Bench.summaryLine(171.481, 255, "[]", "/root/testdata/sf0.1")
    assert(line ==
      """{"metric":"total","value":171.481,"unit":"sec","n":255,"errors":[],"detail":"bench_detail.json","sf":"/root/testdata/sf0.1"}""")
    assert(line.length <= 300)
  }
}
