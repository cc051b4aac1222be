package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAFs (`Aggregator[IN, BUF, OUT]`) — the engine's custom-aggregate
  * surface (SURVEY.md Q26). All are associative/commutative with exact or
  * deterministic merge, so partial aggregation (map-side combine) applies.
  */
object Aggregators {

  /** Exact weighted average: scaled contributions (6 decimal digits)
    * accumulated as BigDecimal, so the result is independent of row order
    * and partitioning AND cannot overflow — a scaled-LONG accumulator wraps
    * at ~4M TPC-H-priced rows per group, silently corrupting the "exact"
    * average at exactly the scale this engine targets. Inputs are
    * (value, weight). */
  class WeightedAvg extends Aggregator[(Double, Long), (java.math.BigDecimal, Long), Double] {
    private val Scale = 1000000L // values quantized to 6 decimal digits
    def zero: (java.math.BigDecimal, Long) = (java.math.BigDecimal.ZERO, 0L)
    def reduce(b: (java.math.BigDecimal, Long), a: (Double, Long)): (java.math.BigDecimal, Long) = {
      // contribution held at its REAL magnitude (scale-6 decimal x weight),
      // not as a 1e6-scaled integer: the buffer encoder is DecimalType(38,18)
      // whose integer capacity (~1e20) a scaled representation would blow
      // through a million times earlier
      val v6 = java.math.BigDecimal.valueOf(math.round(a._1 * Scale), 6)
      (b._1.add(v6.multiply(java.math.BigDecimal.valueOf(a._2))), b._2 + a._2)
    }
    def merge(x: (java.math.BigDecimal, Long), y: (java.math.BigDecimal, Long)): (java.math.BigDecimal, Long) =
      (x._1.add(y._1), x._2 + y._2)
    def finish(b: (java.math.BigDecimal, Long)): Double =
      if (b._2 == 0) 0.0 else b._1.doubleValue() / b._2.toDouble
    def bufferEncoder: Encoder[(java.math.BigDecimal, Long)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bloom-filter builder over string keys: fixed m bits / k probes, double
    * hashing from two xxhash-style seeds. Mirrors the reference's bloom
    * policy shape (k probes from one hash + delta rotation,
    * kv/util/bloom.cpp:29-90) but built as a distributive aggregate: partial
    * bitsets OR together. Output is the bitset as Array[Long]. */
  class BloomBuild(mBits: Int, kProbes: Int) extends Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long]((mBits + 63) / 64)
    def reduce(bits: Array[Long], key: String): Array[Long] = {
      BloomOps.add(bits, mBits, kProbes, key)
      bits
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    def finish(bits: Array[Long]): Array[Long] = bits
    // Native primitive-array encoder (UnsafeArrayData), NOT
    // Encoders.javaSerialization: partial merges are hot-path at scale and
    // must not round-trip Java serialization per merge.
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object BloomOps {
    /** 64-bit FNV-1a. */
    def hash(s: String, seed: Long): Long = {
      var h = 0xcbf29ce484222325L ^ seed
      var i = 0
      while (i < s.length) {
        h ^= (s.charAt(i) & 0xffffL)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }

    /** Double hashing: probe_i = h1 + i*h2 (the standard Kirsch-Mitzenmacher
      * scheme; same idea as the reference's delta-rotation probes). */
    def add(bits: Array[Long], m: Int, k: Int, key: String): Unit = {
      val h1 = hash(key, 0L)
      val h2 = hash(key, 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m.toLong).toInt
        bits(bit >>> 6) |= (1L << (bit & 63))
        i += 1
      }
    }

    def mightContain(bits: Array[Long], m: Int, k: Int, key: String): Boolean = {
      val h1 = hash(key, 0L)
      val h2 = hash(key, 0x9e3779b97f4a7c15L) | 1L
      var i = 0
      while (i < k) {
        val bit = java.lang.Long.remainderUnsigned(h1 + i * h2, m.toLong).toInt
        if ((bits(bit >>> 6) & (1L << (bit & 63))) == 0L) return false
        i += 1
      }
      true
    }
  }
}
