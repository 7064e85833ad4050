package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udaf

/** Bounded partial top-k as a typed `Aggregator` (VERDICT r1 items 4/7).
  *
  * Why: `row_number().over(partitionBy(key))` shuffles EVERY candidate row
  * into one task per key — with few keys (8 ANN queries, 9 counter dims)
  * over a large corpus that is a handful of tasks holding the world. A udaf
  * plans as ObjectHashAggregate with a partial stage BEFORE the exchange:
  * each input partition reduces to ≤cap rows per key, the shuffle carries
  * k×partitions rows per key, the final stage merges. Two-stage top-k, the
  * same shape a TakeOrderedAndProject gives globally.
  *
  * Buffers trim lazily (sort only past 4k entries) so reduce stays O(1)
  * amortized; any global top-k member survives every partial trim because
  * trims keep a superset of each partition's top-k.
  */
object TopK {

  final case class Cand(neighbor_id: Long, cosine: Double)
  final case class KeyCount(key: String, cnt: Long)

  /** score desc, id asc — the ANN ordering */
  private val candOrd: Ordering[Cand] = (a: Cand, b: Cand) => {
    val c = java.lang.Double.compare(b.cosine, a.cosine)
    if (c != 0) c else java.lang.Long.compare(a.neighbor_id, b.neighbor_id)
  }

  /** cnt desc, key asc with nulls FIRST (Spark's asc null ordering, so the
    * aggregator ranks exactly like the window it replaces). Key comparison
    * is binary UTF-8 like Spark's UTF8String and DuckDB's memcmp collation —
    * Java String.compareTo (UTF-16 code units) disagrees with both for
    * supplementary characters vs U+E000..U+FFFF.
    */
  private def utf8Compare(x: String, y: String): Int =
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private val keyCountOrd: Ordering[KeyCount] = (a: KeyCount, b: KeyCount) => {
    val c = java.lang.Long.compare(b.cnt, a.cnt)
    if (c != 0) c
    else (a.key, b.key) match {
      case (null, null) => 0
      case (null, _)    => -1
      case (_, null)    => 1
      case (x, y)       => utf8Compare(x, y)
    }
  }

  private final class TopKAgg[T](k: Int, ord: Ordering[T], outEnc: Encoder[Seq[T]],
      bufEnc: Encoder[ArrayBuffer[T]])
      extends Aggregator[T, ArrayBuffer[T], Seq[T]] {
    private def trim(b: ArrayBuffer[T]): ArrayBuffer[T] =
      if (b.length <= 4 * k) b
      else { val kept = b.sorted(ord).take(k); b.clear(); b ++= kept }
    def zero: ArrayBuffer[T] = ArrayBuffer.empty
    def reduce(b: ArrayBuffer[T], a: T): ArrayBuffer[T] = { b += a; trim(b) }
    def merge(x: ArrayBuffer[T], y: ArrayBuffer[T]): ArrayBuffer[T] = { x ++= y; trim(x) }
    def finish(b: ArrayBuffer[T]): Seq[T] = b.sorted(ord).take(k).toSeq
    def bufferEncoder: Encoder[ArrayBuffer[T]] = bufEnc
    def outputEncoder: Encoder[Seq[T]] = outEnc
  }

  /** top-k (neighbor_id, cosine) pairs per group; apply as
    * `f(col("neighbor_id"), col("cosine"))`, result is an array of structs
    * sorted best-first
    */
  def topCands(k: Int): UserDefinedFunction =
    udaf(new TopKAgg[Cand](k, candOrd, ExpressionEncoder[Seq[Cand]](),
      Encoders.kryo[ArrayBuffer[Cand]]), Encoders.product[Cand])

  /** top-k (key, cnt) pairs per group — the counter report shrink (A4/A5) */
  def topKeyCounts(k: Int): UserDefinedFunction =
    udaf(new TopKAgg[KeyCount](k, keyCountOrd, ExpressionEncoder[Seq[KeyCount]](),
      Encoders.kryo[ArrayBuffer[KeyCount]]), Encoders.product[KeyCount])
}
