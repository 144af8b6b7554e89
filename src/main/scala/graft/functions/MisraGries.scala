package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a mergeable Spark aggregate
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012).
  *
  * Each partial buffer holds AT MOST `k` counters regardless of input
  * size — the bounded-memory heavy-hitters path for a corpus whose
  * vocabulary (or n-gram space) is too large to hash-aggregate
  * exactly. Guarantees, with n = total input count:
  *   - estimate ∈ [true - n/(k+1), true] for every item;
  *   - every item with true count > n/(k+1) is IN the summary
  *     (superset guarantee — so sketch-then-exact-recount returns the
  *     exact top-m whenever the m-th item clears that threshold);
  *   - if a buffer never exceeds k distinct items (fixture-scale
  *     corpora, k ≥ vocabulary), no decrement ever fires and the
  *     summary degenerates to exact counts.
  *
  * Two-phase topology: map-side partials of ≤ k counters, one final
  * merge — the shuffle carries ≤ k rows per partition instead of the
  * full token stream, the textbook mergeable-summary plan at 100 TB.
  *
  * The reference has no sketches at all (its only aggregate is the
  * word-count reducer, /root/reference/test/user_tasks.cc:24-33); this
  * is north-star surface, spec-gated in MisraGriesSuite and exercised
  * under the oracle gate by `heavy_hitters_mg` (whose exactness at
  * fixture scale follows from the superset guarantee above).
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k >= 1, s"misra_gries needs k >= 1, got $k")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)

  override def nullable: Boolean = false
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "graft_misra_gries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.catalogString}")
  }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) return buf // null keys are not counted (SQL agg convention)
    val tok = v.asInstanceOf[UTF8String].toString
    buf.get(tok) match {
      case Some(c) => buf.update(tok, c + 1)
      case None if buf.size < k => buf.update(tok, 1L)
      case None =>
        // Classic MG step: a full table + unseen item decrements every
        // counter (the new item's single vote cancels against one vote
        // of each survivor). Amortized O(1): each decrement pairs with
        // a prior increment.
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // Mergeable-summaries rule: subtract the (k+1)-th largest count
      // from everything and keep the strictly-positive survivors — at
      // most k remain, and the error bound n/(k+1) is preserved.
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val thr = counts(counts.length - (k + 1)) // (k+1)-th largest
      buf.mapValuesInPlace((_, c) => c - thr)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // Sorted key order so the emitted map is deterministic for a given
    // counter set (map *contents* can legitimately vary with partition
    // layout once decrements fire; consumers needing engine-stable
    // results must recount exactly, as heavy_hitters_mg does).
    val entries = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1)),
      entries.map(_._2))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) => out.writeUTF(t); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
}

object MisraGriesAgg {

  /** `misra_gries(tok, k)` as a Column aggregate (map<string,long> of
    * at most k surviving counters). */
  def misraGries(tok: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      MisraGriesAgg(
        org.apache.spark.sql.GraftColumnBridge.expression(tok), k)
        .toAggregateExpression())
}
