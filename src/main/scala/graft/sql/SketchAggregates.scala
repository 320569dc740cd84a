package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/**
 * Bounded mergeable sketches — the 100 TB shape of COUNT(DISTINCT) and
 * runtime join pruning. Both are TypedImperativeAggregates, so Spark's
 * two-phase partial/final aggregation gives map-side combine for free and
 * per-group state stays O(K) / O(bits) no matter how many rows flow in
 * ⟨ref: SURVEY §2.5 client-stream fold; scale additions⟩.
 *
 * Determinism contract (what makes these ORACLE-able, unlike typical
 * sketches): the KMV keeps the K smallest DISTINCT values of a hash the
 * query computes from visible SQL (the md5-prefix convention), so its
 * output is a pure set-function of the input — DuckDB mirrors it with
 * ORDER BY hash LIMIT K. The Bloom filter uses splitmix64 double hashing
 * fixed here, so false-positive behavior is reproducible run-to-run, and
 * correctness never depends on it (no false negatives; the exact join
 * runs after the prune).
 */
object Sketches {
  /** splitmix64 finalizer (shared with Images.splitmix64; public mixing fn). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set bloom bits for v: k double-hashed probes over nbits = bits.length*8. */
  def bloomAdd(bits: Array[Byte], v: Long, k: Int): Unit = {
    val n = bits.length.toLong * 8L
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5DEECE66DL) | 1L // odd → full period across probes
    var j = 0
    while (j < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + j.toLong * h2, n)
      bits((idx >>> 3).toInt) = (bits((idx >>> 3).toInt) | (1 << (idx & 7L).toInt)).toByte
      j += 1
    }
  }

  /** Membership probe — static call target for whole-stage codegen. */
  def bloomContains(bits: Array[Byte], v: Long, k: Int): Boolean = {
    val n = bits.length.toLong * 8L
    val h1 = mix(v)
    val h2 = mix(v ^ 0x5DEECE66DL) | 1L
    var j = 0
    while (j < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + j.toLong * h2, n)
      if ((bits((idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0) return false
      j += 1
    }
    true
  }

  private[graft] def litInt(e: Expression, what: String): Int = e.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(s"$what must be an INT literal, got $other")
  }
}

/**
 * kmv_minhashes(hash, K) → the K smallest DISTINCT hash values, ascending
 * (ArrayType(Long)). The classic KMV/bottom-k distinct sketch: exact
 * distinct count when |D| < K (= array length), estimate (K-1)·2^60/h_K
 * when saturated. Buffer is a bounded TreeSet — O(K) memory per group at
 * any input size, mergeable by union-then-truncate.
 */
case class KmvMinhashes(child: Expression, kExpr: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ExpectsInputTypes {
  private lazy val k = {
    val v = Sketches.litInt(kExpr, "kmv_minhashes K")
    require(v > 0 && v <= 65536, s"kmv_minhashes K out of range (1..65536): $v")
    v
  }
  type Buf = java.util.TreeSet[java.lang.Long]
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): Buf = new java.util.TreeSet[java.lang.Long]()
  private def add(b: Buf, v: Long): Unit = {
    if (b.size < k) { b.add(v); () }
    else if (v < b.last()) { if (b.add(v)) { b.pollLast(); () } }
  }
  override def update(b: Buf, row: InternalRow): Buf = {
    val v = child.eval(row)
    if (v != null) add(b, v.asInstanceOf[Long])
    b
  }
  override def merge(b: Buf, o: Buf): Buf = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next())
    b
  }
  override def eval(b: Buf): Any = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
  override def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.size * 8)
    val it = b.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = createAggregationBuffer()
    while (bb.remaining() >= 8) out.add(bb.getLong())
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): KmvMinhashes = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMinhashes = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), kExpr = cs(1))
}

/**
 * bloom_agg(key, nbits, nhashes) → the filter's bit array (BinaryType).
 * Built DISTRIBUTED (partials OR together), so the dim side never
 * collects to the driver; the single result row broadcast-joins onto the
 * fact scan where bloom_contains prunes before any shuffle — Spark's own
 * runtime-filter shape, made explicit and composable.
 */
case class BloomAgg(child: Expression, bitsExpr: Expression, hashExpr: Expression,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with ExpectsInputTypes {
  private lazy val nbits = {
    val v = Sketches.litInt(bitsExpr, "bloom_agg nbits")
    require(v >= 64 && v <= (1 << 27) && v % 64 == 0,
      s"bloom_agg nbits must be a multiple of 64 in [64, 2^27]: $v")
    v
  }
  private lazy val nh = {
    val v = Sketches.litInt(hashExpr, "bloom_agg nhashes")
    require(v >= 1 && v <= 16, s"bloom_agg nhashes out of range (1..16): $v")
    v
  }
  override def children: Seq[Expression] = Seq(child, bitsExpr, hashExpr)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, IntegerType, IntegerType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](nbits / 8)
  override def update(b: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Sketches.bloomAdd(b, v.asInstanceOf[Long], nh)
    b
  }
  override def merge(b: Array[Byte], o: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < b.length) { b(i) = (b(i) | o(i)).toByte; i += 1 }
    b
  }
  override def eval(b: Array[Byte]): Any = b.clone()
  override def serialize(b: Array[Byte]): Array[Byte] = b
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(n: Int): BloomAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): BloomAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0), bitsExpr = cs(1), hashExpr = cs(2))
}

/**
 * hll_registers(hash) → the 64 HyperLogLog registers (p=6) as
 * ArrayType(Long): register r = max over routed hashes of rho (leading-
 * zero count of the 54-bit remainder + 1; 0 = never touched). State is a
 * FIXED 64-long array per group regardless of cardinality, merge is
 * element-wise max — the canonical mergeable distinct sketch, safe
 * through the streaming state store (buffers serialize as 512 bytes).
 * Produces exactly the register values SketchOps.hll64 derives
 * relationally (spec-pinned), so the DuckDB oracle replays it with the
 * same smear arithmetic.
 */
case class HllRegisters(child: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)
  override def update(b: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      val reg = (hv >>> 54).toInt & 63 // top 6 of the 60-bit hash
      // w < 2^54 → nlz(w) ≥ 10; rho = 55 − msb_pos = nlz − 9 (w = 0 → 55)
      val rho = java.lang.Long.numberOfLeadingZeros(hv & ((1L << 54) - 1)) - 9L
      if (rho > b(reg)) b(reg) = rho
    }
    b
  }
  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }
  override def eval(b: Array[Long]): Any = new GenericArrayData(b.clone())
  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](64)
    var i = 0
    while (i < 64) { out(i) = bb.getLong(); i += 1 }
    out
  }
  override def withNewMutableAggBufferOffset(n: Int): HllRegisters = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllRegisters = copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs(0))
}

/** bloom_contains(bits, key, nhashes) → BOOLEAN; stays in whole-stage
  * codegen (static-call kernel) — it sits on the 100%-of-rows fact scan. */
case class BloomContains(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType, IntegerType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(bits: Any, v: Any, k: Any): Any =
    Sketches.bloomContains(bits.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) =>
      s"org.apache.spark.sql.graft.Sketches.bloomContains($a, $b, $c)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(f, s, t)
}

/** md5_sig60(str) → the 60-bit md5-prefix hash (BIGINT) both engines share:
  * DuckDB mirror is ('0x' || substr(md5(x), 1, 15))::BIGINT. The single-
  * value sibling of text_window_sig's per-window signature. */
case class Md5Sig60(child: Expression) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with ExpectsInputTypes {
  override def nullIntolerant: Boolean = true
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any): Any =
    graft.text.Text.md5Sig60(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.text.Text.md5Sig60($a.getBytes())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
