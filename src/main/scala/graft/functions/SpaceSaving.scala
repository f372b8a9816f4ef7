package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One summary entry: estimated count OVER-estimates the true count by at
  * most `maxErr` (`est − maxErr ≤ true ≤ est`). */
case class HeavyHitter(item: String, est_count: Long, max_err: Long)

/** SpaceSaving heavy-hitter sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams", ICDT'05)
  * as a bounded-buffer Spark aggregate — the 100 TB path for top-K
  * frequency queries where the exact (token, count) table
  * ([[graft.operators.Vocab.tokenStats]]) would shuffle the full distinct
  * key set: the aggregation buffer NEVER holds more than `m` counters,
  * whatever the key cardinality.
  *
  * Semantics: while distinct keys ≤ m the sketch is EXACT counting
  * (err 0, merge = sum) — that is the regime the oracle-verified query
  * runs in, with m derived from the corpus like `planesFor`/`cellsFor`.
  * Past m, an unseen key evicts the minimum-count entry and inherits its
  * count as its error bound: any key with true count > N/m is guaranteed
  * present, and every reported entry satisfies est − err ≤ true ≤ est.
  * Partial buffers MERGE by summing matched counters (plus errors) and
  * keeping the top m — the mergeable-summaries construction (Agarwal et
  * al., PODS'12), which preserves both invariants; the eviction choice
  * under count ties is deterministic (smallest count, then smallest key)
  * so a given merge tree reproduces, though like any SpaceSaving sketch
  * the ERROR BOUNDS beyond the exact regime depend on partitioning.
  */
final class SpaceSavingAgg(m: Int)
    extends Aggregator[String, mutable.HashMap[String, (Long, Long)],
      Array[HeavyHitter]] {
  require(m > 0, "capacity must be positive")

  override def zero: mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def evictMin(b: mutable.HashMap[String, (Long, Long)]): (String, Long) = {
    // Deterministic victim: smallest count, ties on smallest key string.
    var bestK: String = null
    var bestC = Long.MaxValue
    val it = b.iterator
    while (it.hasNext) {
      val (k, (c, _)) = it.next()
      if (c < bestC || (c == bestC && (bestK == null || k < bestK))) {
        bestK = k; bestC = c
      }
    }
    b.remove(bestK)
    (bestK, bestC)
  }

  override def reduce(b: mutable.HashMap[String, (Long, Long)],
                      a: String): mutable.HashMap[String, (Long, Long)] = {
    if (a == null) return b
    b.get(a) match {
      case Some((c, e)) => b.update(a, (c + 1, e))
      case None if b.size < m => b.update(a, (1L, 0L))
      case None =>
        val (_, minC) = evictMin(b)
        b.update(a, (minC + 1, minC))
    }
    b
  }

  override def merge(x: mutable.HashMap[String, (Long, Long)],
                     y: mutable.HashMap[String, (Long, Long)]):
      mutable.HashMap[String, (Long, Long)] = {
    val (into, from) = if (x.size >= y.size) (x, y) else (y, x)
    from.foreach { case (k, (c, e)) =>
      into.get(k) match {
        case Some((c2, e2)) => into.update(k, (c + c2, e + e2))
        case None => into.update(k, (c, e))
      }
    }
    if (into.size > m) {
      // Keep the top m by (count desc, key asc) — the mergeable-summaries
      // truncation. Sorting the buffer is O(m log m) per merge, and
      // merges happen per (partition × shuffle), never per row.
      val keep = into.toArray
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(m)
      into.clear()
      keep.foreach { case (k, v) => into.update(k, v) }
    }
    into
  }

  override def finish(b: mutable.HashMap[String, (Long, Long)]): Array[HeavyHitter] =
    b.toArray
      .sortBy { case (k, (c, _)) => (-c, k) }
      .map { case (k, (c, e)) => HeavyHitter(k, c, e) }

  override def bufferEncoder: Encoder[mutable.HashMap[String, (Long, Long)]] =
    Encoders.kryo[mutable.HashMap[String, (Long, Long)]]
  override def outputEncoder: Encoder[Array[HeavyHitter]] = ExpressionEncoder()
}

object SpaceSaving {
  /** Bounded-buffer heavy-hitter aggregate over a string key column:
    * returns `array<struct<item, est_count, max_err>>` sorted by
    * (est_count desc, item asc). See [[SpaceSavingAgg]]. */
  def spaceSaving(c: Column, m: Int): Column =
    udaf(new SpaceSavingAgg(m), Encoders.STRING).apply(c)
}
