// Hosted under org.apache.spark.sql for the private[sql]
// Column↔Expression bridge (ExpressionUtils) — see CosineSimilarity.scala.
package org.apache.spark.sql.graftx

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving summary: at most `capacity` counters, each an
  * OVERESTIMATE of its item's true frequency by at most its recorded
  * `err` (Metwally et al. 2005, "Efficient computation of frequent and
  * top-k elements in data streams"). When the distinct-item count never
  * exceeds `capacity` (≤, inclusive: a summary that never evicted or
  * trimmed keeps `lossy = false` and its absent-bound stays 0), no
  * information is discarded, every `err` is 0, and the summary is
  * EXACT — the regime `q_spacesaving_topk` pins. With capacity below
  * the distinct count the flag trips and every reported count carries
  * the certified cnt − err ≤ true ≤ cnt bracket — the regime
  * `q_spacesaving_approx` judges.
  */
final class SpaceSavingBuffer(val capacity: Int) {
  // item -> (count, err). Counts only grow; size never exceeds capacity.
  val entries: mutable.HashMap[String, (Long, Long)] = mutable.HashMap.empty
  // True once ANY information has been discarded: an add-eviction, a
  // merge-trim, or merging in an already-lossy summary. This is the
  // sole source of truth for absentBound — inferring lossiness from
  // "some err > 0" is unsound because merge-trim drops entries WITHOUT
  // stamping err (two full all-err-0 summaries with disjoint items
  // merge+trim into a full all-err-0 summary that IS lossy; a bound of
  // 0 there lets a third merge underestimate, breaking cnt ≥ true).
  private var _lossy: Boolean = false
  def lossy: Boolean = _lossy
  private[graftx] def markLossy(): Unit = _lossy = true
  // (count, item) mirror ordered min-count-first, ties LARGEST item
  // first — the head IS the eviction victim, so eviction and trim are
  // O(log capacity) instead of a full scan per over-capacity insert
  // (the high-cardinality regime is the point of the sketch)
  private val byCount = mutable.TreeSet.empty[(Long, String)](
    Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))

  /** Insert/overwrite keeping both structures in sync. */
  private[graftx] def put(item: String, c: Long, e: Long): Unit = {
    entries.get(item).foreach { case (c0, _) => byCount.remove((c0, item)) }
    entries.update(item, (c, e))
    byCount.add((c, item))
  }

  /** The summary's minimum counter once information has actually been
    * LOST — the classic bound on how often an untracked item can have
    * occurred; 0 while the summary is lossless (never evicted, never
    * trimmed, never merged with a lossy peer), where an absent item
    * truly has count 0. Keying this on the explicit `lossy` flag (not
    * on fullness or err values) keeps the exact regime exact — a full
    * summary that never dropped anything still bounds absentees at 0,
    * so distinct == capacity inputs stay partition-order independent —
    * while remaining sound across multi-way merges whose trims drop
    * entries without stamping err. */
  private def absentBound: Long =
    if (_lossy && entries.nonEmpty) byCount.head._1 else 0L

  /** One observation (streaming update). Eviction replaces the minimum
    * counter, tie-broken by LARGEST item string — so the smallest items
    * (earliest in the final count-desc/item-asc output order) are the
    * most stable under ties. Deterministic for any fixed input order. */
  def add(item: String): Unit = entries.get(item) match {
    case Some((c, e)) => put(item, c + 1L, e)
    case None if entries.size < capacity => put(item, 1L, 0L)
    case None =>
      val (minCnt, minItem) = byCount.head
      byCount.remove((minCnt, minItem))
      entries.remove(minItem)
      _lossy = true
      put(item, minCnt + 1L, minCnt)
  }

  /** Mergeable-summaries combine (Agarwal et al. 2012): counts and
    * error bounds add item-wise, and an item ABSENT from one side is
    * credited that side's minimum counter (it may have occurred up to
    * that often there and been evicted — crediting 0 would turn the
    * overestimate invariant cnt ≥ true into an underestimate), in
    * both count and err; then trim back to `capacity` keeping the
    * largest counts (count desc, item asc) — the ε₁+ε₂ guarantee
    * carries over. Exact-regime merges (nobody ever full: both
    * absent-bounds 0, no trim) stay perfectly additive, which is what
    * makes the judged output partition-order independent. */
  def merge(other: SpaceSavingBuffer): Unit = {
    val thisBound = absentBound
    val otherBound = other.absentBound
    // A lossy input makes the union lossy even when no trim happens
    // here: items the peer evicted are absent from the merged summary
    // too, so its future absentBound must stay ≥ the min counter.
    _lossy = _lossy || other.lossy
    if (otherBound > 0L) {
      // items this summary tracks that other may have seen and evicted
      entries.keysIterator.filterNot(other.entries.contains).toArray
        .foreach { it =>
          val (c, e) = entries(it)
          put(it, c + otherBound, e + otherBound)
        }
    }
    other.entries.foreach { case (it, (c, e)) =>
      entries.get(it) match {
        case Some((c0, e0)) => put(it, c0 + c, e0 + e)
        case None => put(it, c + thisBound, e + thisBound)
      }
    }
    while (entries.size > capacity) {
      val victim = byCount.head
      byCount.remove(victim)
      entries.remove(victim._2)
      _lossy = true // trim discards real counts without stamping err
    }
  }
}

/** `space_saving_topk(item, capacity, k)` — a native mergeable
  * aggregate (Catalyst `TypedImperativeAggregate`, the same machinery
  * behind Spark's own `percentile` / `count_min_sketch`): each
  * partition streams its rows into a bounded SpaceSaving summary,
  * summaries merge map-side → reduce-side like any partial aggregate,
  * and the result is the top-k `(item, cnt, err)` structs by
  * (cnt desc, item asc).
  *
  * Why an aggregate FUNCTION and not a groupBy-count query: exact
  * heavy-hitters (`q_heavy_hitters`) shuffles one row per DISTINCT
  * key — at 100 TB a high-cardinality column (url, user id, shingle)
  * makes that shuffle the bottleneck. This summary caps state at
  * `capacity` counters per partition and ships ONE buffer per
  * partition per group, with the classic guarantee: every reported
  * count overestimates truth by ≤ err ≤ n/capacity, and any item with
  * true frequency > n/capacity is present. GROUPed usage keeps the
  * same bound per group.
  *
  * Error accounting is explicit in the output (`err` column) rather
  * than hidden, so callers can post-filter `cnt - err ≥ threshold`
  * for certified-frequent items.
  */
case class SpaceSavingTopK(
    child: Expression,
    capacity: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuffer]
  with ImplicitCastInputTypes {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")
  require(k >= 1 && k <= capacity,
    s"k must be in [1, capacity=$capacity], got $k")

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingTopK =
    copy(child = newChildren.head)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingBuffer =
    new SpaceSavingBuffer(capacity)

  override def update(buf: SpaceSavingBuffer,
      input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.toString)
    buf
  }

  override def merge(buf: SpaceSavingBuffer,
      other: SpaceSavingBuffer): SpaceSavingBuffer = {
    buf.merge(other)
    buf
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val top = buf.entries.toSeq
      .sortBy { case (it, (c, _)) => (-c, it) }
      .take(k)
      .map { case (it, (c, e)) =>
        InternalRow(UTF8String.fromString(it), c, e)
      }
    new GenericArrayData(top)
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeBoolean(buf.lossy) // must survive the shuffle: a lossy
    // partial whose flag is dropped would deserialize with bound 0
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (it, (c, e)) =>
      val b = it.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new SpaceSavingBuffer(in.readInt())
    if (in.readBoolean()) buf.markLossy()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, StandardCharsets.UTF_8)
      val c = in.readLong()
      val e = in.readLong()
      buf.put(item, c, e) // keeps the eviction-order mirror in sync
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(off: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = off)
}

object SpaceSavingTopK {
  /** DataFrame-side aggregate column:
    * `df.groupBy(g).agg(SpaceSavingTopK.topk(col("x"), 1024, 10))`. */
  def topk(c: Column, capacity: Int, k: Int): Column =
    ExpressionUtils.column(
      SpaceSavingTopK(ExpressionUtils.expression(c), capacity, k)
        .toAggregateExpression())
}
