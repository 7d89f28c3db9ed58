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

  /** Hilbert index of a d-dimensional point whose coordinates are
    * already scaled to [0, 2^bits) longs — Skilling's transform
    * ("Programming the Hilbert curve", AIP 2004): an O(d·bits)
    * bit-twiddling walk with no tables, the standard generalization
    * beyond 2-D. Result ranges over [0, 2^(d·bits)); `d·bits ≤ 62`
    * keeps it a positive long.
    *
    * Expression shape: the same aggregate-HOF trick as [[index2]] —
    * the stateful level walk runs inside ONE `aggregate` over
    * `sequence(bits-1 … 1)` carrying the coordinate ARRAY, the Gray
    * correction in a second fold, and the bit interleave in a third
    * whose initial STATE carries the array (so no phase's result is
    * re-referenced per output bit — the tree stays O(4^d), evaluated
    * iteratively, codegen-compatible, no UDF). The per-level inner
    * dimension loop unrolls in Scala, which bounds d at 6 (tree
    * growth); 6 dims × 10 bits is already past what curve clustering
    * usefully distinguishes. */
  def indexD(coords: Seq[Column], bits: Int): Column = {
    val d = coords.size
    require(d >= 2 && d <= 6, s"hilbert index takes 2-6 dimensions, got $d")
    require(bits >= 1 && d * bits <= 62,
      s"d*bits must fit a positive long: $d*$bits > 62")
    def el(a: Column, i: Int) = element_at(a, i + 1)
    // Phase 1 (Skilling "inverse undo"): fold over levels Q=2^(bits-1)…2,
    // the inner i-loop unrolled with X[0]/X[i] threaded sequentially
    val p1 = aggregate(
      sequence(lit(bits - 1), lit(1), lit(-1)),
      array(coords.map(_.cast("long")): _*),
      (xs, qi) => {
        val q = call_function("shiftleft", lit(1L), qi.cast("int"))
        val p = q - 1
        var x0: Column = el(xs, 0)
        val rest = Array.tabulate(d - 1)(i => el(xs, i + 1))
        for (i <- 0 until d) {
          val xi = if (i == 0) x0 else rest(i - 1)
          val hit = xi.bitwiseAND(q) =!= 0L
          val inv = x0.bitwiseXOR(p)
          if (i == 0) {
            // exchange with itself is a no-op; only the invert branch acts
            x0 = when(hit, inv).otherwise(x0)
          } else {
            val t = x0.bitwiseXOR(xi).bitwiseAND(p)
            val nx0 = when(hit, inv).otherwise(x0.bitwiseXOR(t))
            rest(i - 1) = when(hit, xi).otherwise(xi.bitwiseXOR(t))
            x0 = nx0
          }
        }
        array(x0 +: rest.toSeq: _*)
      })
    // Phase 2 (Gray encode): Skilling's `X[i] ^= X[i-1]` is IN-PLACE
    // sequential — X[i-1] is already encoded — so Y is the running
    // PREFIX XOR of X, folded with the source array in the state
    // (p1 is referenced exactly once)
    val gray = aggregate(
      sequence(lit(0), lit(d - 1)),
      struct(p1.as("xs"),
        array().cast("array<bigint>").as("ys"), lit(0L).as("run")),
      (st, i) => {
        val run2 = st.getField("run")
          .bitwiseXOR(element_at(st.getField("xs"), i + 1))
        struct(st.getField("xs").as("xs"),
          concat(st.getField("ys"), array(run2)).as("ys"),
          run2.as("run"))
      }).getField("ys")
    // Phases 3+4 fused (Gray correction + interleave): Skilling's
    // t = XOR of (Q-1) over the set bits Q>1 of Y[d-1], so bit b of t
    // is the PARITY of Y[d-1]'s set bits strictly above b — which a
    // descending fold over the levels can carry as one running bit
    // instead of materializing t in a separate pass. That keeps the
    // transpose array in ONE fold's initial state, evaluated exactly
    // once per row (HOF lambdas are interpreted; a second reference to
    // `gray` would re-run the whole phase-1 walk — measured 4x on the
    // 3-D clustering rewrite). Index bit of (level b, dim i) sits at
    // position b·d + (d-1-i); every dim's bit-b flips by the parity.
    aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      struct(gray.as("ys"), lit(0L).as("par"), lit(0L).as("acc")),
      (st, bi) => {
        val contrib = (0 until d).map { i =>
          val bit = call_function("shiftright", el(st.getField("ys"), i),
            bi.cast("int")).bitwiseAND(lit(1L))
            .bitwiseXOR(st.getField("par"))
          call_function("shiftleft", bit,
            (bi.cast("int") * lit(d) + lit(d - 1 - i)).cast("int"))
        }.reduce(_ + _)
        val nextPar = st.getField("par").bitwiseXOR(
          call_function("shiftright", el(st.getField("ys"), d - 1),
            bi.cast("int")).bitwiseAND(lit(1L)))
        struct(st.getField("ys").as("ys"), nextPar.as("par"),
          (st.getField("acc") + contrib).as("acc"))
      }).getField("acc")
  }

  /** Driver-side reference of [[indexD]] (for specs/tools). */
  def axesToIndex(bits: Int, coords: Seq[Long]): Long =
    axesToIndexInPlace(bits, coords.toArray)

  /** Array form of [[axesToIndex]] that MUTATES `x` in place — the
    * zero-extra-allocation entry the compiled per-row kernel
    * ([[org.apache.spark.sql.graftshims.HilbertIndexExpr]]) calls on
    * its freshly gathered coordinate array. */
  def axesToIndexInPlace(bits: Int, x: Array[Long]): Long = {
    val d = x.length
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until d) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
      }
      q >>= 1
    }
    for (i <- 1 until d) x(i) ^= x(i - 1)
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(d - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    for (i <- 0 until d) x(i) ^= t
    var idx = 0L
    var b = bits - 1
    while (b >= 0) {
      for (i <- 0 until d) idx = (idx << 1) | ((x(i) >> b) & 1L)
      b -= 1
    }
    idx
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
