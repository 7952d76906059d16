package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Frequency-sketch operators (heavy hitters). Companion to the HLL / CMS
  * sketch aggregates in [[Relational]]: the third leg of the mergeable-
  * summary architecture a 100 TB pipeline runs on — bounded per-partition
  * state, one map-side pass, partial summaries merged associatively,
  * never a full-vocabulary shuffle to answer "what dominates the stream".
  */
object Sketches {

  /** Misra-Gries heavy-hitters summary as a typed Aggregator.
    *
    * State is AT MOST k counters regardless of stream length or
    * vocabulary — the whole point at corpus scale, where the exact
    * groupBy's state is the vocabulary. Update: increment a held counter,
    * insert if a slot is free, else decrement ALL counters (each such
    * event burns k+1 units of stream mass, which is where the error
    * bound comes from). Merge (Agarwal et al., "Mergeable Summaries",
    * PODS'12): pointwise-sum the two summaries, then subtract the
    * (k+1)-th largest counter from every entry and drop the non-positive.
    *
    * Guarantees after ANY sequence of reduces/merges over a stream of
    * total mass n: est(t) ≤ exact(t); est(t) ≥ exact(t) − n/(k+1); and
    * every t with exact(t) > n/(k+1) is present in the summary. When the
    * distinct-key count never exceeds k, no decrement ever fires and the
    * summary is EXACT — the property the declared query's oracle pins.
    *
    * Buffer is a mutable map (kryo-encoded): reduce mutates in place, so
    * the per-row cost is one hash probe; serialization happens only at
    * partial/final aggregate boundaries. */
  final class MisraGries(k: Int)
      extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def reduce(b: mutable.HashMap[String, Long], t: String): mutable.HashMap[String, Long] = {
      b.get(t) match {
        case Some(c) => b.update(t, c + 1L)
        case None if b.size < k => b.update(t, 1L)
        case None =>
          // decrement-all: the arriving item and one unit of every held
          // counter cancel (k+1 mass per event => <= n/(k+1) events)
          val dead = mutable.ArrayBuffer.empty[String]
          b.keysIterator.foreach { key =>
            val c = b(key) - 1L
            if (c <= 0L) dead += key else b.update(key, c)
          }
          dead.foreach(b.remove)
      }
      b
    }

    def merge(a: mutable.HashMap[String, Long],
              b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > k) {
        val delta = a.values.toArray.sortWith(_ > _).apply(k) // (k+1)-th largest
        val dead = mutable.ArrayBuffer.empty[String]
        a.keysIterator.foreach { key =>
          val c = a(key) - delta
          if (c <= 0L) dead += key else a.update(key, c)
        }
        dead.foreach(a.remove)
      }
      a
    }

    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
      Encoders.kryo[mutable.HashMap[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  }

  /** Summary capacity for the declared query. The synthetic corpus has a
    * 31-token vocabulary, so 64 slots mean no decrement ever fires and
    * the sketch is provably EXACT — which is exactly what makes the est
    * column hash-checkable against DuckDB's true counts (the eviction /
    * merge-error regime is spec-covered on constructed Zipf streams,
    * where determinism cannot hold by design). Interpolated into the
    * oracle so both engines use one threshold. */
  val HeavyHittersK = 64

  /** Token heavy hitters over the document corpus — the vocabulary-head
    * question ("which tokens dominate, within guaranteed error") asked
    * the way a 100 TB pipeline must: a Misra-Gries summary whose state
    * is O(k) per partition, merged associatively, instead of an exact
    * count over an unbounded vocabulary. The output reports, per token:
    * the sketch estimate, the exact count (the audit side), the error
    * budget n/(k+1), and the MG guarantee est ∈ [exact − n/(k+1), exact]
    * as `within_bounds` — TRUE by theorem for every row, which the
    * DuckDB oracle pins value-for-value (est = exact here, the
    * vocab ≤ k exactness case). */
  def aggHeavyHitters(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val k = HeavyHittersK
    val toks = Tables.documents(spark, sfDir)
      .select(explode(TextSim.tokens($"text")).as("tok")).as[String]
    // 1-row scalar: the whole summary is <= k entries, collected once and
    // re-broadcast — the same bounded-scalar pattern as the profile /
    // eval-gram broadcasts.
    val summary: Map[String, Long] =
      toks.select(new MisraGries(k).toColumn.name("mg")).head()
    val sumDf = broadcast(summary.toSeq.toDF("tok", "est"))
    val exact = toks.groupBy($"tok").agg(count(lit(1)).as("exact_cnt"))
    val total = broadcast(exact.agg(sum($"exact_cnt").as("n")))
    exact.join(sumDf, Seq("tok"), "left")
      .crossJoin(total)
      .select($"tok", $"est", $"exact_cnt",
        expr(s"n div ${k + 1}").as("err_bound"),
        ($"est".isNotNull && $"est" <= $"exact_cnt" &&
          $"est" * (k + 1) >= $"exact_cnt" * (k + 1) - $"n").as("within_bounds"))
      .orderBy($"exact_cnt".desc, $"tok")
  }
}
