package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Compressed 64-bit id bitmap — the Druid/Kylin building block
  * (`docs/olap.md:25,35` 倒排索引/位图索引; Kylin's precise
  * count-distinct) behind the reference's 用户分群 audience module
  * (`docs/画像开发方案.md:6`).
  *
  * Why this exists: COUNT(DISTINCT user_id) is not additive — per-day
  * partial counts cannot be rolled up to a month without rescanning the
  * raw fact. A per-segment id BITMAP is additive: OR-merging segment
  * bitmaps gives the exact distinct count at any rollup level, and
  * audience combinations (users who did A AND B but NOT C) become
  * bitmap AND/ANDNOT over already-aggregated per-tag bitmaps instead of
  * a second shuffle over user-level rows. At 100 TB the fact is
  * aggregated ONCE into (segment, tag) → bitmap — a few MB per million
  * users — and every subsequent audience count is arithmetic on those
  * small binaries.
  *
  * Layout follows the RoaringBitmap idea (Chambi, Lemire, Kaser,
  * Godin, "Better bitmap performance with Roaring bitmaps", 2016),
  * extended to the full 64-bit keyspace: ids are partitioned by their
  * high 48 bits into 65536-id chunks; each chunk is serialized as a
  * sorted uint16 array when sparse (≤ 4096 ids) or an 8 KiB bitset
  * when dense. The serialized form is CANONICAL — equal sets produce
  * identical bytes regardless of build/merge order — so bitmap columns
  * are safely comparable, hashable, and parquet-persistable (the Kylin
  * segment-build pattern: materialize per-segment bitmaps, roll up by
  * OR-merge without touching the fact again).
  *
  * The in-memory builder always uses the dense word form per touched
  * chunk (an add is index+bit-set, O(1), with a last-chunk cache for
  * the clustered-id common case); canonicalization to the compact form
  * happens once at serialize time.
  */
final class Bitmap64 {
  /** chunk key (id >> 16) → 1024-word bitset of the low 16 bits. */
  val chunks = new java.util.TreeMap[java.lang.Long, Array[Long]]()
  @transient private var cachedKey: Long = Long.MinValue
  @transient private var cachedWords: Array[Long] = _

  def add(id: Long): Unit = {
    val key = id >> 16
    val words =
      if (cachedWords != null && cachedKey == key) cachedWords
      else {
        var w = chunks.get(key)
        if (w == null) { w = new Array[Long](1024); chunks.put(key, w) }
        cachedKey = key; cachedWords = w
        w
      }
    val low = (id & 0xFFFFL).toInt
    words(low >>> 6) |= 1L << (low & 63)
  }

  def orInPlace(other: Bitmap64): Unit = {
    val it = other.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val mine = chunks.get(e.getKey)
      if (mine == null) {
        // copy, not alias: `other` may be a reused deserialization buffer
        chunks.put(e.getKey, e.getValue.clone())
      } else {
        val theirs = e.getValue
        var i = 0
        while (i < 1024) { mine(i) |= theirs(i); i += 1 }
      }
    }
    cachedKey = Long.MinValue; cachedWords = null
  }

  def cardinality: Long = {
    var total = 0L
    val it = chunks.values().iterator()
    while (it.hasNext) {
      val words = it.next()
      var i = 0
      while (i < 1024) { total += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    total
  }

  def contains(id: Long): Boolean = {
    val words = chunks.get(id >> 16)
    if (words == null) false
    else {
      val low = (id & 0xFFFFL).toInt
      (words(low >>> 6) >>> (low & 63) & 1L) != 0L
    }
  }

  /** Canonical bytes: header int = #non-empty chunks; per chunk
    * [key: long][kind: byte][card: int][payload] with kind 0 = sorted
    * uint16 array (card ≤ 4096), kind 1 = 8 KiB bitset. */
  def serialize(): Array[Byte] = {
    var n = 0
    var bytes = 4
    val cards = new java.util.ArrayList[Int]()
    val it0 = chunks.values().iterator()
    while (it0.hasNext) {
      val words = it0.next()
      var card = 0
      var i = 0
      while (i < 1024) { card += java.lang.Long.bitCount(words(i)); i += 1 }
      cards.add(card)
      if (card > 0) {
        n += 1
        bytes += 8 + 1 + 4 + (if (card <= 4096) card * 2 else 8192)
      }
    }
    val buf = ByteBuffer.allocate(bytes)
    buf.putInt(n)
    var ci = 0
    val it = chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val card = cards.get(ci); ci += 1
      if (card > 0) {
        val words = e.getValue
        buf.putLong(e.getKey)
        if (card <= 4096) {
          buf.put(0: Byte).putInt(card)
          var i = 0
          while (i < 1024) {
            var w = words(i)
            while (w != 0L) {
              val bit = java.lang.Long.numberOfTrailingZeros(w)
              buf.putChar(((i << 6) | bit).toChar)
              w &= w - 1
            }
            i += 1
          }
        } else {
          buf.put(1: Byte).putInt(card)
          var i = 0
          while (i < 1024) { buf.putLong(words(i)); i += 1 }
        }
      }
    }
    buf.array()
  }
}

object Bitmap64 {
  def deserialize(bytes: Array[Byte]): Bitmap64 = {
    val bm = new Bitmap64
    orInto(bytes, bm)
    bm
  }

  /** OR the serialized set into `bm` (the merge-aggregate hot path —
    * no intermediate Bitmap64 allocation). */
  def orInto(bytes: Array[Byte], bm: Bitmap64): Unit = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    var c = 0
    while (c < n) {
      val key = buf.getLong
      val kind = buf.get()
      val card = buf.getInt
      var words = bm.chunks.get(key)
      if (words == null) { words = new Array[Long](1024); bm.chunks.put(key, words) }
      if (kind == 0) {
        var i = 0
        while (i < card) {
          val low = buf.getChar.toInt
          words(low >>> 6) |= 1L << (low & 63)
          i += 1
        }
      } else {
        var i = 0
        while (i < 1024) { words(i) |= buf.getLong; i += 1 }
      }
      c += 1
    }
  }

  /** Exact distinct count straight off the serialized header — no
    * chunk materialization (cardinalities are stored per chunk). */
  def serializedCardinality(bytes: Array[Byte]): Long = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    var total = 0L
    var c = 0
    while (c < n) {
      buf.getLong; buf.get()
      val card = buf.getInt
      total += card
      buf.position(buf.position() + (if (card <= 4096) card * 2 else 8192))
      c += 1
    }
    total
  }

  /** Membership probe on the serialized form: linear chunk walk +
    * binary search / bit probe, no materialization. */
  def serializedContains(bytes: Array[Byte], id: Long): Boolean = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val key = id >> 16
    val low = (id & 0xFFFFL).toInt
    var c = 0
    while (c < n) {
      val ckey = buf.getLong
      val kind = buf.get()
      val card = buf.getInt
      val payload = if (card <= 4096) card * 2 else 8192
      if (ckey == key) {
        if (kind == 0) {
          var lo = 0
          var hi = card - 1
          val base = buf.position()
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val v = buf.getChar(base + mid * 2).toInt
            if (v == low) return true
            else if (v < low) lo = mid + 1
            else hi = mid - 1
          }
          return false
        } else {
          val word = buf.getLong(buf.position() + (low >>> 6) * 8)
          return (word >>> (low & 63) & 1L) != 0L
        }
      }
      buf.position(buf.position() + payload)
      c += 1
    }
    false
  }

  val OpAnd = 0
  val OpOr = 1
  val OpAndNot = 2

  /** Set combine on two bitmaps; result is freshly allocated. */
  def combine(a: Bitmap64, b: Bitmap64, op: Int): Bitmap64 = {
    val out = new Bitmap64
    if (op == OpOr) {
      out.orInPlace(a); out.orInPlace(b)
      return out
    }
    val it = a.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val bw = b.chunks.get(e.getKey)
      if (op == OpAnd) {
        if (bw != null) {
          val aw = e.getValue
          val w = new Array[Long](1024)
          var i = 0
          var any = false
          while (i < 1024) {
            w(i) = aw(i) & bw(i); if (w(i) != 0L) any = true; i += 1
          }
          if (any) out.chunks.put(e.getKey, w)
        }
      } else { // AndNot
        val aw = e.getValue
        if (bw == null) out.chunks.put(e.getKey, aw.clone())
        else {
          val w = new Array[Long](1024)
          var i = 0
          var any = false
          while (i < 1024) {
            w(i) = aw(i) & ~bw(i); if (w(i) != 0L) any = true; i += 1
          }
          if (any) out.chunks.put(e.getKey, w)
        }
      }
    }
    out
  }

  /** Scalar-op kernel over serialized forms (called from codegen). */
  def combineBytes(a: Array[Byte], b: Array[Byte], op: Int): Array[Byte] =
    combine(deserialize(a), deserialize(b), op).serialize()

  private def bridge(c: Column): Expression =
    org.apache.spark.sql.graft.Bridge.expression(c)
  private def col(e: Expression): Column =
    org.apache.spark.sql.graft.Bridge.column(e)

  /** Aggregate: exact id set of a group as a bitmap (nulls skipped). */
  def bitmapBuild(ids: Column): Column =
    col(BitmapBuildAgg(bridge(ids)).toAggregateExpression())

  /** Aggregate: OR-merge already-built bitmaps (the rollup combine —
    * what makes exact count-distinct additive across segments). */
  def bitmapMerge(bitmaps: Column): Column =
    col(BitmapMergeAgg(bridge(bitmaps)).toAggregateExpression())

  def bitmapAnd(a: Column, b: Column): Column =
    col(BitmapOp(bridge(a), bridge(b), OpAnd))
  def bitmapOr(a: Column, b: Column): Column =
    col(BitmapOp(bridge(a), bridge(b), OpOr))
  def bitmapAndNot(a: Column, b: Column): Column =
    col(BitmapOp(bridge(a), bridge(b), OpAndNot))
  def bitmapCard(a: Column): Column = col(BitmapCardinality(bridge(a)))
  def bitmapContains(a: Column, id: Column): Column =
    col(BitmapContainsExpr(bridge(a), bridge(id)))
}

/** `bitmap_build(id)` — TypedImperativeAggregate building a
  * [[Bitmap64]] from a LONG/INT id column. Supports partial
  * aggregation: map-side partials are serialized bitmaps, so the
  * shuffle carries one compact binary per (group × partition), never
  * the ids themselves. */
case class BitmapBuildAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bitmap64] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_build requires an integral id column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Bitmap64 = new Bitmap64

  override def update(buffer: Bitmap64, input: InternalRow): Bitmap64 = {
    val v = child.eval(input)
    if (v != null) buffer.add(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short => s.longValue()
      case b: java.lang.Byte => b.longValue()
    })
    buffer
  }

  override def merge(buffer: Bitmap64, other: Bitmap64): Bitmap64 = {
    buffer.orInPlace(other); buffer
  }

  override def eval(buffer: Bitmap64): Any = buffer.serialize()
  override def serialize(buffer: Bitmap64): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): Bitmap64 =
    Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapBuildAgg =
    copy(child = c)
}

/** `bitmap_merge(bm)` — OR-union of serialized bitmaps. Rolling up a
  * materialized (segment, tag) → bitmap table through this aggregate
  * yields the EXACT distinct count at any coarser grain without
  * revisiting the fact table (Kylin's segment-merge). */
case class BitmapMergeAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Bitmap64] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_merge"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_merge requires a serialized bitmap column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Bitmap64 = new Bitmap64

  override def update(buffer: Bitmap64, input: InternalRow): Bitmap64 = {
    val v = child.eval(input)
    if (v != null) Bitmap64.orInto(v.asInstanceOf[Array[Byte]], buffer)
    buffer
  }

  override def merge(buffer: Bitmap64, other: Bitmap64): Bitmap64 = {
    buffer.orInPlace(other); buffer
  }

  override def eval(buffer: Bitmap64): Any = buffer.serialize()
  override def serialize(buffer: Bitmap64): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): Bitmap64 =
    Bitmap64.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BitmapMergeAgg =
    copy(child = c)
}

/** Scalar AND / OR / ANDNOT over two serialized bitmaps — audience
  * combination ("did A and B but not C") as arithmetic on already-
  * aggregated binaries, zero additional shuffles. */
case class BitmapOp(left: Expression, right: Expression, op: Int)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = op match {
    case Bitmap64.OpAnd => "bitmap_and"
    case Bitmap64.OpOr => "bitmap_or"
    case _ => "bitmap_andnot"
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bitmap columns, got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmap64.combineBytes(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]], op)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Bitmap64$$.MODULE$$" +
        s".combineBytes($a, $b, $op);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BitmapOp = copy(left = l, right = r)
}

/** Exact distinct count off the serialized header — O(#chunks), no
  * bitset materialization. */
case class BitmapCardinality(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bitmap_cardinality"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bitmap_cardinality requires a bitmap column, got ${child.dataType.catalogString}")

  override def nullSafeEval(bytes: Any): Any =
    Bitmap64.serializedCardinality(bytes.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Bitmap64$$.MODULE$$.serializedCardinality($c)")

  override protected def withNewChildInternal(c: Expression): BitmapCardinality =
    copy(child = c)
}

/** Membership probe (the 用户标签查询 point lookup: is user X in
  * audience Y) — binary search on the serialized form. */
case class BitmapContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "bitmap_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType | IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitmap_contains requires (bitmap, integral id), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(bytes: Any, id: Any): Any =
    Bitmap64.serializedContains(bytes.asInstanceOf[Array[Byte]],
      id match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      })

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.Bitmap64$$.MODULE$$" +
        s".serializedContains($a, (long) $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BitmapContainsExpr = copy(left = l, right = r)
}
