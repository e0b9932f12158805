package graft.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** The ONE ranking order both top-k buffers share: (score DESC, id ASC),
  * expressed as "is a strictly worse than b". [[TopKBuffer]] and
  * [[TopKPayloadBuffer]] deliberately keep separate sift loops — the bare
  * buffer works over two primitive long arrays with no object array on
  * the hot path — but the comparator they must agree on lives here, and
  * TopKAggregateSpec pins the two buffers' kept sets equal on random
  * streams so the loops cannot drift apart silently. */
private[catalyst] object TopKOrdering {
  @inline def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)
}

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
    TopKOrdering.worse(sa, ia, sb, ib)

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

/** [[TopKBuffer]] extended with an opaque per-pair payload: the k best
  * (score, id, payload) triples under the SAME (score DESC, id ASC)
  * ranking order — the payload never participates in ordering, it just
  * rides along with its pair. Payload slots hold already-copied Catalyst
  * values (the aggregate copies on insert), so the buffer itself is
  * type-agnostic.
  */
final class TopKPayloadBuffer(val k: Int) {
  private[catalyst] val scores = new Array[Long](k)
  private[catalyst] val ids = new Array[Long](k)
  private[catalyst] val payloads = new Array[Any](k)
  private[catalyst] var n = 0

  def size: Int = n

  @inline private def worse(sa: Long, ia: Long, sb: Long, ib: Long): Boolean =
    TopKOrdering.worse(sa, ia, sb, ib)

  /** Would (score, id) enter this buffer right now? The aggregate tests
    * this BEFORE paying the payload deep-copy: at candidate-stream scale
    * nearly every row is rejected, and copying its payload first would be
    * one discarded allocation per rejected row. */
  @inline def accepts(score: Long, id: Long): Boolean =
    n < k || worse(scores(0), ids(0), score, id)

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); val d = ids(a); val p = payloads(a)
    scores(a) = scores(b); ids(a) = ids(b); payloads(a) = payloads(b)
    scores(b) = s; ids(b) = d; payloads(b) = p
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
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
      swap(i, w)
      i = w
    }
  }

  def insert(score: Long, id: Long, payload: Any): Unit =
    if (n < k) {
      scores(n) = score; ids(n) = id; payloads(n) = payload; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; payloads(0) = payload
      siftDown()
    }

  def absorb(other: TopKPayloadBuffer): Unit = {
    var i = 0
    while (i < other.n) {
      insert(other.scores(i), other.ids(i), other.payloads(i)); i += 1
    }
  }

  /** array<struct<score, id, payload>> in rank order (score DESC, id ASC). */
  def toSortedArrayData: GenericArrayData = {
    val idx = Array.range(0, n).sortWith { (a, b) =>
      scores(a) > scores(b) || (scores(a) == scores(b) && ids(a) < ids(b))
    }
    new GenericArrayData(idx.map { i =>
      new GenericInternalRow(Array[Any](scores(i), ids(i), payloads(i))): Any
    })
  }
}

/** graft_topk_payload(score, id, payload, k) ->
  * array<struct<score: bigint, id: bigint, payload: <payload type>>>:
  * [[TopKPairs]] with an opaque payload column riding each kept pair.
  *
  * This closes the LAST corpus-mass-sort door in the ranking API: a
  * caller whose candidate frame carries columns beyond (query, id,
  * score) — BM25 snippets, span metadata, rerank vectors — previously
  * fell back to a rank WINDOW, i.e. an external sort of the whole
  * candidate stream (measured 17 GiB of spill at the 100x kNN build).
  * Here the payload is packed into ONE struct child and stored beside
  * its pair in the same bounded O(k) heap: partial aggregation still
  * prunes every map task to <= k rows per group before the exchange,
  * and the shuffle carries k-entry buffers whose payload bytes are
  * UnsafeRow-serialized (so ANY Spark SQL type rides along, nulls
  * included).
  *
  * Contract: identical to [[TopKPairs]] — null score or id skips the
  * row (a NULL PAYLOAD does not: the pair still ranks); ids unique per
  * group; ordering is (score DESC, id ASC) with the payload inert.
  */
case class TopKPairsPayload(
    score: Expression,
    id: Expression,
    payload: Expression,
    kExpr: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPayloadBuffer] {

  lazy val k: Int = {
    require(kExpr.foldable, "graft_topk_payload: k must be a literal")
    val v = kExpr.eval() match {
      case i: java.lang.Integer => i.intValue()
      case l: java.lang.Long => l.intValue()
      case other => throw new IllegalArgumentException(
        s"graft_topk_payload: k must be an integer literal, got $other")
    }
    require(v >= 1, s"graft_topk_payload: k must be >= 1, got $v")
    v
  }

  override def children: Seq[Expression] = Seq(score, id, payload, kExpr)
  override def nullable: Boolean = false
  // the payload field keeps the payload EXPRESSION's nullability, so a
  // non-nullable input column re-derived through getField stays
  // non-nullable in the output schema — callers migrated off the window
  // path must see the schema the window preserved
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false),
      StructField("payload", payload.dataType, nullable = payload.nullable))),
    containsNull = false)

  /** Serializer for one payload value: a single-field UnsafeRow handles
    * any SQL type (nested structs, arrays, strings, nulls) with exact
    * round-tripping. Built lazily per task after deserialization too. */
  @transient private lazy val payloadProj: UnsafeProjection =
    UnsafeProjection.create(Array(payload.dataType))
  @transient private lazy val payloadHolder = new GenericInternalRow(1)

  override def createAggregationBuffer(): TopKPayloadBuffer =
    new TopKPayloadBuffer(k)

  override def update(
      buffer: TopKPayloadBuffer, input: InternalRow): TopKPayloadBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val sl = s.asInstanceOf[Long]
      val il = i.asInstanceOf[Long]
      // test acceptance FIRST: at candidate-stream scale nearly every row
      // is rejected, and the payload deep-copy (the evaluated value may
      // point into a reused row/buffer, so the heap must own a copy) is
      // only worth paying for the ~k rows per group that actually enter
      if (buffer.accepts(sl, il))
        buffer.insert(sl, il, InternalRow.copyValue(payload.eval(input)))
    }
    buffer
  }

  override def merge(
      buffer: TopKPayloadBuffer, other: TopKPayloadBuffer): TopKPayloadBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: TopKPayloadBuffer): Any = buffer.toSortedArrayData

  override def serialize(buffer: TopKPayloadBuffer): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(4 + 32 * buffer.n)
    val dos = new java.io.DataOutputStream(out)
    dos.writeInt(buffer.n)
    var i = 0
    while (i < buffer.n) {
      dos.writeLong(buffer.scores(i))
      dos.writeLong(buffer.ids(i))
      payloadHolder.update(0, buffer.payloads(i))
      val bytes = payloadProj(payloadHolder).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
      i += 1
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): TopKPayloadBuffer = {
    val bb = ByteBuffer.wrap(storageFormat)
    val n = bb.getInt
    val buf = new TopKPayloadBuffer(k)
    val row = new UnsafeRow(1)
    var i = 0
    while (i < n) {
      val s = bb.getLong
      val d = bb.getLong
      val len = bb.getInt
      val bytes = new Array[Byte](len)
      bb.get(bytes)
      row.pointTo(bytes, len)
      buf.insert(s, d, InternalRow.copyValue(row.get(0, payload.dataType)))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsPayload =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsPayload =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairsPayload =
    copy(score = newChildren(0), id = newChildren(1),
      payload = newChildren(2), kExpr = newChildren(3))

  override def prettyName: String = "graft_topk_payload"
}
