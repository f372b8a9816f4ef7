package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded sorted-first-K aggregates: the K smallest non-null inputs in
  * ascending order, optionally distinct.
  *
  * Result-equivalent to `slice(sort_array(collect_list(x)), 1, K)` (or
  * `collect_set` for the distinct variant) with one crucial difference at
  * 100 TB: the aggregation BUFFER never holds more than K elements, so a
  * mega-group — millions of ids behind one fingerprint, a column
  * discrepant on every row — cannot OOM an executor mid-aggregate the way
  * an unbounded collect_list does before a post-hoc slice. Merge is a
  * sorted insert capped at K, so partial (map-side) aggregation works
  * under any partitioning.
  */
object BoundedMinK {

  /** K smallest strings in CODE-POINT order — the order Spark's
    * UTF8String binary sort and DuckDB's UTF-8 VARCHAR sort both use
    * (plain Java compareTo is UTF-16 code-unit order, which ranks
    * supplementary characters differently). */
  def minKStrings(c: Column, k: Int, distinct: Boolean = false): Column =
    udaf(new BoundedMinStrings(k, distinct), Encoders.STRING).apply(c)

  /** K smallest longs (numeric order). */
  def minKLongs(c: Column, k: Int, distinct: Boolean = false): Column =
    udaf(new BoundedMinLongs(k, distinct), Encoders.LONG).apply(c)

  /** K smallest doubles (numeric order, NaN last like Spark's sort). */
  def minKDoubles(c: Column, k: Int, distinct: Boolean = false): Column =
    udaf(new BoundedMinDoubles(k, distinct), Encoders.DOUBLE).apply(c)

  /** Sorted first-K keys rendered as an `array<string>`, ordered by the
    * key's NATIVE type order (the order sort_array and the DuckDB oracle
    * use): integral → the bounded long aggregate; double/float → the
    * bounded double aggregate; decimal → native sort_array + slice (the
    * one type a primitive buffer can't hold losslessly — correct ordering
    * wins over the buffer bound there, and decimal cast-to-string also
    * renders scale-dependently so no string aggregate matches either);
    * everything else → string order via the bounded string aggregate.
    * One dispatch point so every sampler in the engine agrees.
    *
    * NOTE on rendering: double/float keys are rendered via Spark's
    * double→string cast AFTER aggregation, identical to what the previous
    * sort_array+slice+cast produced. */
  def minKAsStrings(c: Column, dt: org.apache.spark.sql.types.DataType, k: Int,
                    distinct: Boolean = false): Column = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType =>
        transform(minKLongs(c.cast("long"), k, distinct), _.cast("string"))
      case DoubleType | FloatType =>
        transform(minKDoubles(c.cast("double"), k, distinct), _.cast(dt).cast("string"))
      case _: DecimalType =>
        val collected = if (distinct) collect_set(c) else collect_list(c)
        transform(slice(sort_array(collected), 1, k), _.cast("string"))
      case _ =>
        minKStrings(c.cast("string"), k, distinct)
    }
  }

  /** Code-point-order comparison (see [[minKStrings]]). */
  private[functions] def cpCompare(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    var i = 0
    while (i < la && i < lb) {
      val cpa = a.codePointAt(i)
      val cpb = b.codePointAt(i)
      if (cpa != cpb) return Integer.compare(cpa, cpb)
      i += Character.charCount(cpa)
    }
    Integer.compare(la - i, lb - i)
  }
}

final class BoundedMinStrings(k: Int, distinct: Boolean)
    extends Aggregator[String, Array[String], Array[String]] {
  require(k > 0, "k must be positive")

  override def zero: Array[String] = Array.empty

  private def insert(buf: Array[String], v: String): Array[String] = {
    if (v == null) return buf
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (BoundedMinK.cpCompare(buf(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    if (distinct && lo < buf.length && buf(lo) == v) return buf
    if (lo >= k) return buf // larger than the current K smallest
    val out = new Array[String](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  override def reduce(b: Array[String], a: String): Array[String] = insert(b, a)
  override def merge(x: Array[String], y: Array[String]): Array[String] =
    y.foldLeft(x)(insert)
  override def finish(b: Array[String]): Array[String] = b
  override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[String]] = ExpressionEncoder()
}

final class BoundedMinDoubles(k: Int, distinct: Boolean)
    extends Aggregator[java.lang.Double, Array[Double], Array[Double]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Double] = Array.empty

  private def insert(buf: Array[Double], v0: Double): Array[Double] = {
    // Canonicalize -0.0 to 0.0: Spark's SQL ordering (and DuckDB's)
    // treats them as equal; java.lang.Double.compare does not.
    val v = if (v0 == 0.0d) 0.0d else v0
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      // Total order with NaN last — matches Spark's sort_array ordering.
      if (java.lang.Double.compare(buf(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    if (distinct && lo < buf.length &&
      java.lang.Double.compare(buf(lo), v) == 0) return buf
    if (lo >= k) return buf
    val out = new Array[Double](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  override def reduce(b: Array[Double], a: java.lang.Double): Array[Double] =
    if (a == null) b else insert(b, a.doubleValue())
  override def merge(x: Array[Double], y: Array[Double]): Array[Double] =
    y.foldLeft(x)(insert)
  override def finish(b: Array[Double]): Array[Double] = b
  override def bufferEncoder: Encoder[Array[Double]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder()
}

final class BoundedMinLongs(k: Int, distinct: Boolean)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.empty

  private def insert(buf: Array[Long], v: Long): Array[Long] = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid) < v) lo = mid + 1 else hi = mid
    }
    if (distinct && lo < buf.length && buf(lo) == v) return buf
    if (lo >= k) return buf
    val out = new Array[Long](math.min(buf.length + 1, k))
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = v
    System.arraycopy(buf, lo, out, lo + 1, out.length - lo - 1)
    out
  }

  override def reduce(b: Array[Long], a: java.lang.Long): Array[Long] =
    if (a == null) b else insert(b, a.longValue())
  override def merge(x: Array[Long], y: Array[Long]): Array[Long] =
    y.foldLeft(x)(insert)
  override def finish(b: Array[Long]): Array[Long] = b
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
