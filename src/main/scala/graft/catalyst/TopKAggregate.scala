package graft.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregation state: the k best (score, id) pairs under
  * the ranking order (score DESC, id ASC), held as a binary heap keyed
  * WORST-at-root (lowest score, then highest id) over two parallel long
  * arrays — O(k) memory, O(log k) per insert, no boxing.
  *
  * This is the aggregation-state half of [[TopKPairs]]; see that class
  * for why an aggregate beats a rank-window for per-query top-k at
  * scale.
  */
final class TopKBuffer(val k: Int) {
  private val scores = new Array[Long](k)
  private val ids = new Array[Long](k)
  private var n = 0

  def size: Int = n

  /** a strictly worse than b under (score DESC, id ASC)? */
  @inline private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      // child worse than parent -> child belongs closer to the root
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val s = scores(i); val d = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = s; ids(p) = d
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) return
      val s = scores(i); val d = ids(i)
      scores(i) = scores(w); ids(i) = ids(w)
      scores(w) = s; ids(w) = d
      i = w
    }
  }

  def insert(score: Long, id: Long): Unit =
    if (n < k) {
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }

  def absorb(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** array<struct<score, id>> in rank order (score DESC, id ASC). */
  def toSortedArrayData: GenericArrayData = {
    val idx = Array.range(0, n).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i))): Any
    })
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putLong(scores(i)); bb.putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def deserialize(bytes: Array[Byte], k: Int): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

/** graft_topk(score, id, k) -> array<struct<score: bigint, id: bigint>>:
  * the k best (score, id) pairs of the group under (score DESC, id ASC),
  * sorted in that rank order.
  *
  * The scale rationale (SURVEY §7.3's "compose existing ops" escalated
  * one rung): per-query top-k as `row_number() OVER (PARTITION BY query
  * ORDER BY score)` must SORT every candidate row — a corpus-scale
  * external sort that spills the moment total candidate mass exceeds
  * aggregate execution memory (measured: the 100x kNN-graph build spills
  * 17 GiB in the ranking window even under perfect IVF sizing). As an
  * aggregate, the same selection is a bounded O(k) heap per group:
  * partial aggregation prunes each map task's candidates to <= k per
  * group BEFORE the exchange (the shuffle carries serialized k-entry
  * buffers, not candidate rows), no sort ever materializes, and reduce
  * state is O(groups x k). Ranks come from `posexplode` over the sorted
  * result array.
  *
  * Contract: score/id rows are non-null (null in either skips the row);
  * ids are unique within a group (every consumer ranks candidate SETS),
  * which makes the kept set unique under the strict total order — the
  * result is deterministic on any partitioning.
  */
case class TopKPairs(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  lazy val k: Int = {
    require(kExpr.foldable, "graft_topk: k must be a literal")
    val v = kExpr.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_topk: k must be an integer literal, got $other")
    }
    require(v >= 1, s"graft_topk: k must be >= 1, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buffer.insert(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = buffer.toSortedArrayData

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.serialize()

  override def deserialize(storageFormat: Array[Byte]): TopKBuffer =
    TopKBuffer.deserialize(storageFormat, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))

  override def prettyName: String = "graft_topk"
}
