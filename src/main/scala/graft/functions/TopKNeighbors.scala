package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-K-neighbors aggregate for kNN-graph builds: keeps the K
  * best (cos_sim DESC, neighbor_id ASC) scored neighbors, DISTINCT by
  * the full (cos, neighbor) pair, in a buffer that never exceeds K
  * entries.
  *
  * Result-equivalent to `row_number() OVER (PARTITION BY id ORDER BY
  * cos_sim DESC, neighbor_id) <= K` over de-duplicated candidates, with
  * the 100 TB difference that there is no window sort and no separate
  * dropDuplicates exchange: the aggregate is map-side combinable, so a
  * vector that meets bands × bucketCap candidates (≈512 with operator
  * defaults) ships AT MOST K buffer entries per map task instead of
  * every scored candidate row through a distinct exchange plus a window
  * partition.
  *
  * The distinct contract is BY NEIGHBOR ID, keeping the best-ranked
  * occurrence — strictly stronger than the dropDuplicates(id, neighbor)
  * it replaced (which kept an arbitrary occurrence). The current call
  * sites re-derive duplicates from identical arithmetic (same two
  * vectors through several shared LSH buckets → identical cosine bits),
  * where the two contracts coincide; the O(k) in-buffer scan exists for
  * any future caller whose scores are computed per-orientation or
  * post-rounded, so a neighbor can never appear twice in a top-k.
  * Merge-and-truncate stays exact for top-K: a globally-top-K pair
  * evicted from some partial buffer would need K distinct better pairs
  * in that partition, all of which are global candidates —
  * contradiction (replacing a worse duplicate never shrinks a buffer).
  */
object TopKNeighbors {

  /** Top-k scored neighbors as `array<struct<neighbor_id, cos_sim>>` in
    * rank order (cos DESC, neighbor ASC), buffer bounded by k. */
  def topKNeighbors(neighborId: Column, cosSim: Column, k: Int): Column = {
    val enc: Encoder[(Long, Double)] = ExpressionEncoder()
    // The tuple encoder flattens to two UDAF parameters (BIGINT, DOUBLE).
    udaf(new BoundedTopKNeighbors(k), enc).apply(neighborId, cosSim)
  }
}

final class BoundedTopKNeighbors(k: Int)
    extends Aggregator[(Long, Double), Array[(Long, Double)], Array[(Long, Double)]] {
  require(k > 0, "k must be positive")

  override def zero: Array[(Long, Double)] = Array.empty

  // cos DESC (total order, -0.0 == 0.0 canonicalized like the SQL sort),
  // neighbor ASC — the exact window order the aggregate replaces.
  private def less(a: (Long, Double), b: (Long, Double)): Boolean = {
    val ca = if (a._2 == 0.0d) 0.0d else a._2
    val cb = if (b._2 == 0.0d) 0.0d else b._2
    val c = java.lang.Double.compare(ca, cb)
    if (c != 0) c > 0 else a._1 < b._1 // higher cos first, then lower id
  }

  private def insert(buf: Array[(Long, Double)], v: (Long, Double)): Array[(Long, Double)] = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (less(buf(mid), v)) lo = mid + 1 else hi = mid
    }
    // Fast path: identical (cos bits, neighbor) sorts to the same slot.
    if (lo < buf.length && buf(lo)._1 == v._1 &&
      java.lang.Double.compare(buf(lo)._2, v._2) == 0) return buf
    // Neighbor-distinct guard (scaladoc): the same neighbor under a
    // NON-identical score sorts to a different slot, so scan the ≤ k
    // buffer for it — keep whichever occurrence ranks better.
    var dup = -1
    var i = 0
    while (i < buf.length && dup < 0) {
      if (buf(i)._1 == v._1) dup = i
      i += 1
    }
    if (dup >= 0 && dup < lo) return buf // existing occurrence ranks better
    if (dup >= 0) { // v ranks better: replace in place, length unchanged
      val out = new Array[(Long, Double)](buf.length)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = v
      System.arraycopy(buf, lo, out, lo + 1, dup - lo)
      System.arraycopy(buf, dup + 1, out, dup + 1, buf.length - dup - 1)
      return out
    }
    if (lo >= k) return buf
    val out = new Array[(Long, Double)](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  override def reduce(b: Array[(Long, Double)], a: (Long, Double)): Array[(Long, Double)] =
    if (a == null) b else insert(b, a)
  override def merge(x: Array[(Long, Double)], y: Array[(Long, Double)]): Array[(Long, Double)] =
    y.foldLeft(x)(insert)
  override def finish(b: Array[(Long, Double)]): Array[(Long, Double)] = b
  override def bufferEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[(Long, Double)]] = ExpressionEncoder()
}
