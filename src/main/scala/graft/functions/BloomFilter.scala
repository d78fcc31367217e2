package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types._

/** Bloom filter over BIGINT keys as a mergeable `Aggregator` plus an
  * allocation-free codegen membership probe — the engine's runtime
  * join-pruning primitive (the pattern Spark's own
  * `InjectRuntimeFilter` applies when it plants an internal
  * `BloomFilterAggregate`/`BloomFilterMightContain` pair under a
  * selective join; ours is the explicit, user-declarable form).
  *
  * Why this matters at 100 TB: when a fact⋈dim join's dim side is
  * selective but NOT broadcastable as a hash relation (tens of
  * millions of surviving keys), the shuffle moves every fact row —
  * including the ~99% that will never match — through the exchange.
  * A small bit set summarizing the dim keys IS broadcastable at any
  * dim cardinality (128 KiB default, sized up via `sketch(c,
  * numWords)` before the ~10M-key saturation point), and filtering
  * the fact side against it BEFORE the exchange drops non-matching
  * rows at the scan. False positives only
  * cost wasted shuffle rows; the exact join downstream removes them,
  * so the query result is bit-identical to the unpruned plan (exactly
  * what the q122 oracle checks).
  *
  * Distributed-correctness property (pinned by BloomFilterSpec): the
  * state is a commutative monoid (bitwise OR), so the merged filter is
  * IDENTICAL regardless of partition layout or merge order — the same
  * discipline as [[CountMinSketch]]. No false negatives, ever: every
  * inserted key probes true by construction.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing (h1 + i·h2 mod m,
  * "Less Hashing, Same Performance", 2006) over a splitmix64
  * finalizer — deterministic constants, no RNG, reproducible across
  * runs and JVMs. m is a power of two so the modulo is a mask.
  */
object BloomFilter {

  /** Default size: 2^14 longs = 2^20 bits = 128 KiB per filter. At
    * n = 100k keys, k = 5: FP ≈ (1 − e^(−kn/m))^k ≈ 0.8%; at n = 30k:
    * 4·10^−5. The filter saturates (FP → 1, pruning a silent no-op)
    * near n ≳ 10M at this size — size it up via `sketch(c, numWords)`
    * for large dim cardinalities: the probe reads m off the array
    * length, so filters of any power-of-two size interoperate with
    * the same `might_contain`.
    */
  val NumWords = 16384
  val NumBits: Long = NumWords.toLong * 64L
  val NumHashes = 5

  /** splitmix64 finalizer — the mix behind java.util.SplittableRandom;
    * full-avalanche on 64-bit keys.
    */
  private[functions] def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Set the k probe bits of `key` in `words` — m read off the array
    * length (power of two), so any filter size probes uniformly.
    */
  private[functions] def put(words: Array[Long], key: Long): Unit = {
    val mask = (words.length.toLong << 6) - 1L
    val h1 = mix(key)
    val h2 = mix(h1) | 1L // odd → walks all of the power-of-two range
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & mask).toInt
      words(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Probe — the scalar mirrored by the codegen below. */
  def mightContain(words: Array[Long], key: Long): Boolean = {
    val mask = (words.length.toLong << 6) - 1L
    val h1 = mix(key)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < NumHashes) {
      val bit = ((h1 + i * h2) & mask).toInt
      if ((words(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Boxed input + explicit null skip: SQL aggregates ignore NULL
    * inputs (Spark's own BloomFilterAggregate does; so does
    * [[CountMinSketch]].reduce) — a primitive-Long encoder would
    * silently decode NULL to 0L and plant a spurious key-0 bit.
    */
  private case class BloomAgg(numWords: Int)
      extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {
    require(numWords > 0 && (numWords & (numWords - 1)) == 0,
      s"numWords must be a positive power of two, got $numWords")
    // the probe computes bit indices in an int (bit = (hash & mask)
    // .toInt): past 2^26 words = 2^32 bits the high bits would be
    // silently truncated and the upper filter half never touched —
    // reject rather than degrade FP quietly (512 MiB is already far
    // past broadcast-sensible sizes)
    require(numWords <= (1 << 26),
      s"numWords capped at 2^26 (2^32 bits, 512 MiB), got $numWords")
    def zero: Array[Long] = new Array[Long](numWords)
    def reduce(st: Array[Long], key: java.lang.Long): Array[Long] = {
      if (key != null) put(st, key.longValue())
      st
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    def finish(st: Array[Long]): Array[Long] = st
    // native array<bigint> codec — the buffer crosses the wire on
    // every map-side partial merge, so no kryo/java serialization
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** `bloom_sketch(keyCol)` aggregate column: one `array<bigint>` bit
    * set for the group (normally one global row, cross-joined onto the
    * fact side by broadcast). `numWords` sizes the filter (64 bits per
    * word, power of two) — raise it past the default 128 KiB when the
    * dim side carries tens of millions of keys, where the default
    * saturates.
    */
  def sketch(c: Column, numWords: Int = NumWords): Column =
    udaf(BloomAgg(numWords), Encoders.LONG).apply(c)

  /** `might_contain(bloomCol, keyCol)` — true if `key` may be in the
    * set, false only if it is definitely absent.
    */
  def mightContainCol(bloom: Column, key: Column): Column =
    GraftSqlBridge.column(MightContainLong(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(key)))
}

/** Codegen Bloom probe: k word reads per row, zero allocation — stays
  * inside whole-stage codegen so the prune filter fuses with the scan
  * it is protecting.
  */
case class MightContainLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"might_contain requires (array<bigint>, bigint), got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "might_contain"

  override def nullSafeEval(words: Any, key: Any): Any = {
    val w = words.asInstanceOf[ArrayData]
    val k = key.asInstanceOf[Long]
    // m off the array length — probes any power-of-two filter size
    val mask = (w.numElements().toLong << 6) - 1L
    val h1 = BloomFilter.mix(k)
    val h2 = BloomFilter.mix(h1) | 1L
    var i = 0
    while (i < BloomFilter.NumHashes) {
      val bit = ((h1 + i * h2) & mask).toInt
      if ((w.getLong(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, k) => {
      val z = ctx.freshName("z")
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val i = ctx.freshName("i")
      val bit = ctx.freshName("bit")
      val hit = ctx.freshName("hit")
      val mask = ctx.freshName("mask")
      // splitmix64 inlined twice (h1 = mix(key), h2 = mix(h1) | 1);
      // `z` is reused across both rounds, so assign, don't declare
      def mixCode(src: String, dst: String): String =
        s"""$z = $src + 0x9E3779B97F4A7C15L;
           |$z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |$z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
           |$dst = $z ^ ($z >>> 31);
         """.stripMargin
      s"""
         |boolean $hit = true;
         |long $z; long $h1; long $h2;
         |final long $mask = (((long) $w.numElements()) << 6) - 1L;
         |${mixCode(k, h1)}
         |${mixCode(h1, h2)}
         |$h2 |= 1L;
         |for (int $i = 0; $i < ${BloomFilter.NumHashes}; $i++) {
         |  final int $bit = (int) (($h1 + $i * $h2) & $mask);
         |  if (($w.getLong($bit >>> 6) & (1L << ($bit & 63))) == 0L) { $hit = false; break; }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
