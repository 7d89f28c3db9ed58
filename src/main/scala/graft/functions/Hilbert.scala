package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert space-filling curve index, as a pure Column expression.
  *
  * Z-order (Morton) is a bit interleave — cheap, but the curve jumps:
  * adjacent z-values can be far apart in key space, so file min/max
  * boxes overlap more than they must. The Hilbert curve is the
  * locality-optimal ordering (every consecutive pair of d-values is
  * an adjacent grid cell), which is why table formats offer it as the
  * premium clustering option; the construction below is the classic
  * bit-twiddling walk (Hamilton 2006 / the canonical xy2d recurrence:
  * per output bit, take one quadrant digit and rotate/reflect the
  * frame).
  *
  * The per-bit recurrence is STATEFUL (x and y rotate every step), so
  * a naive Column unroll would reference the previous step's columns
  * multiple times and blow the expression tree up exponentially (~3^16
  * nodes at 16 bits — Catalyst trees cannot share subtrees). Instead
  * the whole walk runs inside ONE `aggregate` higher-order function
  * over `sequence(bits-1 … 0)`, carrying (x, y, d) in a struct — the
  * expression is O(1) in size, evaluated iteratively per row, fully
  * codegen-compatible, and needs no UDF. */
object Hilbert {

  /** Hilbert d-index of a 2-D point whose coordinates are already
    * scaled to [0, 2^bits) longs. Result ranges over [0, 4^bits);
    * bits ≤ 31 keeps it in a positive long. */
  def index2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val n = 1L << bits
    aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      struct(x.cast("long").as("x"), y.cast("long").as("y"),
        lit(0L).as("d")),
      (acc, i) => {
        val s = call_function("shiftleft", lit(1L), i.cast("int"))
        val ax = acc.getField("x")
        val ay = acc.getField("y")
        val rx = ax.bitwiseAND(s) =!= 0L
        val ry = ay.bitwiseAND(s) =!= 0L
        // quadrant digit (3·rx) xor ry spelled as a CASE table
        val quad = when(!rx && !ry, 0L).when(!rx && ry, 1L)
          .when(rx && !ry, 3L).otherwise(2L)
        // rotate/reflect the frame for the next (finer) step:
        // ry=1 keeps the frame; ry=0 swaps axes, reflecting when rx=1
        struct(
          when(ry, ax).otherwise(
            when(rx, lit(n - 1) - ay).otherwise(ay)).as("x"),
          when(ry, ay).otherwise(
            when(rx, lit(n - 1) - ax).otherwise(ax)).as("y"),
          (acc.getField("d") + s * s * quad).as("d"))
      }).getField("d")
  }

  /** Driver-side reference of the same walk (for specs/tools). */
  def xy2d(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
