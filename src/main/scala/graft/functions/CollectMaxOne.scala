package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` form of the reference's `collect_max_one` UDAF
  * (reference: tools/script_converter_tool.py rule 13) for Dataset users:
  * the value carried by the max rank, with the reference's sentinel
  * semantics (any non-null value beats a null value, at any rank) and a
  * deterministic value tiebreak.
  *
  * The untyped/DataFrame path stays on
  * [[HiveFunctions.collectMaxOne]] (a max-of-struct declarative aggregate:
  * codegen'd, map-side combinable); this class is the type-safe equivalent
  * for `KeyValueGroupedDataset.agg`. Buffer is (seen, rank, value) — O(1),
  * merge-associative, so partial aggregation works across any partitioning.
  */
final class CollectMaxOne[V >: Null](implicit ord: Ordering[V],
                                     bufEnc: Encoder[(Boolean, Long, V)],
                                     outEnc: Encoder[V])
    extends Aggregator[(V, Long), (Boolean, Long, V), V] {

  override def zero: (Boolean, Long, V) = (false, Long.MinValue, null)

  override def reduce(b: (Boolean, Long, V), in: (V, Long)): (Boolean, Long, V) =
    merge(b, (true, in._2, in._1))

  // A non-null value beats a null value REGARDLESS of rank (the rank-0
  // sentinel this replaces was only minimal for positive ranks: a
  // negative real rank would lose to the sentinel and null the result —
  // HiveFunctions.collectMaxOne's has-value field, same fix); among
  // non-null values, max rank with the larger value on ties.
  override def merge(x: (Boolean, Long, V), y: (Boolean, Long, V)): (Boolean, Long, V) =
    if (!x._1) y
    else if (!y._1) x
    else if ((y._3 != null) != (x._3 != null)) { if (y._3 != null) y else x }
    else if (y._2 > x._2 || (y._2 == x._2 && gtNullsFirst(y._3, x._3))) y
    else x

  /** Rank ties can legitimately carry null values (the rank-0 null
    * sentinel), and Ordering[String].gt NPEs on null — treat null as
    * smaller than every non-null value. */
  private def gtNullsFirst(a: V, b: V): Boolean =
    if (a == null) false
    else if (b == null) true
    else ord.gt(a, b)

  override def finish(b: (Boolean, Long, V)): V = b._3
  override def bufferEncoder: Encoder[(Boolean, Long, V)] = bufEnc
  override def outputEncoder: Encoder[V] = outEnc
}

object CollectMaxOne {
  /** Code-POINT string order (UTF-8 byte order), not Ordering[String]'s
    * UTF-16 code-unit order: the untyped twin resolves value ties with
    * Spark's max(struct(...)), which compares UTF8String bytes, and the
    * two orders disagree exactly where BoundedMinK documents — a BMP
    * char in U+E000..U+FFFF vs a surrogate pair (code unit 0xD800 <
    * 0xFFFF but code point > U+FFFF). Same group, same rank tie, the
    * two paths must pick the same row. */
  private val codePointOrder: Ordering[String] = (a: String, b: String) =>
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** String-valued instance (the reference's dominant case). */
  def forString: TypedColumn[(String, Long), String] = {
    implicit val bufEnc: Encoder[(Boolean, Long, String)] =
      Encoders.tuple(Encoders.scalaBoolean, Encoders.scalaLong, Encoders.STRING)
    new CollectMaxOne[String]()(codePointOrder, bufEnc, Encoders.STRING).toColumn
  }
}
