package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** KMV (k-minimum-values) buffer: the k smallest DISTINCT hash values
  * seen so far, in a bounded sorted set. Insert is O(log k); the
  * structure is tiny (k longs) and merge is a bounded set-union — the
  * properties that make the sketch map-side combinable.
  */
final class KmvBuffer(val k: Int) {
  val mins = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit =
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last && mins.add(h)) { mins.pollLast(); () }

  def merge(other: KmvBuffer): Unit = {
    val it = other.mins.iterator()
    while (it.hasNext) insert(it.next())
  }

  /** Distinct-count estimate. Hashes are uniform on [0, 2^32); with at
    * least k values the k-th smallest estimates k/n of the hash space,
    * giving n ≈ (k-1) * 2^32 / kthMin (the standard KMV estimator).
    * Below k values the sketch IS the exact distinct set. All-integer
    * math so the estimate is bit-identical in any engine. */
  def estimate: Long =
    if (mins.size < k) mins.size.toLong
    else ((k - 1).toLong << 32) / math.max(mins.last, 1L)
}

/** Distinct-count sketch as a native Catalyst aggregate — the (b)+ tier
  * of the custom-operator ladder (SURVEY §7.3): a
  * `TypedImperativeAggregate` with partial aggregation and merge, so it
  * combines map-side and ships k longs per group across the shuffle
  * instead of the full distinct set. This is the scale path for
  * `COUNT(DISTINCT)` dashboards (reference app.py:502–504 `nunique()`):
  * exact countDistinct shuffles every distinct key; the sketch shuffles
  * O(k) per group with a ~1/√k relative error (k=64 → ~12%).
  *
  * Unlike HLL, KMV over a DETERMINISTIC hash is engine-portable: the
  * DuckDB oracle reproduces the exact estimate with a window over the
  * same portable32 hashes, so even the "approximate" path is
  * hash-gate-checkable.
  *
  * Input contract: `child` is an already-hashed LongType column in
  * [0, 2^32) (use [[graft.util.Portable.portable32]]).
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = buf.estimate

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buf.mins.size + 1))
    bb.putLong(buf.mins.size.toLong)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

/** The KMV sketch ITSELF as an aggregate value: the sorted array of the
  * k smallest distinct hashes. Same bounded buffer/merge as
  * [[KmvDistinct]], but instead of collapsing to the estimate it emits
  * the sketch, so several set-algebra heads (per-set kth-min, sketch
  * sizes, sketch intersections) can be computed from ONE aggregation
  * pass — the q96 shape: four sketches as four aggregate columns in a
  * single ObjectHashAggregate, not four cross-joined sub-aggregations
  * each paying its own job. NULL inputs are skipped, so a conditional
  * sketch is just `kmvSketch(when(cond, hv))`. */
case class KmvSketch(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: KmvBuffer): Any = {
    val arr = new Array[Long](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 } // ascending
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buf.mins.size + 1))
    bb.putLong(buf.mins.size.toLong)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getLong.toInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvSketch =
    copy(child = newChild)
}

object KmvDistinct {
  import org.apache.spark.sql.graftbridge.Bridge

  /** Column-API entry point: `df.agg(kmvDistinct(col, 64))`. */
  def kmvDistinct(c: Column, k: Int = 64): Column =
    Bridge.column(KmvDistinct(Bridge.expression(c), k).toAggregateExpression())

  /** Column-API entry point for the sketch-valued aggregate. */
  def kmvSketch(c: Column, k: Int = 64): Column =
    Bridge.column(KmvSketch(Bridge.expression(c), k).toAggregateExpression())

  /** SQL registration: `SELECT kmv_distinct(hv) FROM ...`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Bridge.registerTemp(spark, "kmv_distinct",
      exprs => KmvDistinct(exprs.head))
}
