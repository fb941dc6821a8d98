package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** The Householder-reflection kernel shared by `HouseholderChain`'s
  * interpreted eval and its generated code (passed into codegen as a
  * reference object — the two execution paths call the SAME JVM method
  * and are bit-identical by construction; the `FwhtKernel` discipline).
  * A top-level class because Janino-generated code references it by
  * source name.
  *
  * Op order is the contract (the SQL oracle replays it term by term):
  * per reflection ux = Σ x_i·u_i in index order with a double
  * accumulator, one factor 2·ux/uu, then out_i = x_i − factor·u_i —
  * exactly the arithmetic of the previous
  * `zip_with(transform(...), ...)` formulation and of the oracle's
  * `e[d] - (2.0 * ux / uu) * u[d]`, evaluated ONCE per row instead of
  * once per nested higher-order-function reference (composing two
  * reflections as nested HOFs re-evaluated the inner one ~9× per row
  * — an 11× slowdown on the PCA2 chain, measured round 13).
  */
class HouseholderKernel extends Serializable {

  def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      // ArrayData.getFloat/getDouble on a null slot silently yields 0.0
      // — embeddings never carry null elements, so fail loudly
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"householder_chain: null array element at index $i - " +
          "embeddings must not contain nulls")
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    x
  }

  /** Apply the reflections IN ORDER, each in place: H_k(…H_1(x)…). The
    * per-u uu values are precomputed (exact: integer squares summed in
    * doubles stay < 2^53).
    */
  /** Unit-normalize in place — arithmetic identical to the HOF
    * formulation it replaces (left-to-right fold of squares from 0.0,
    * `Math.sqrt`, per-element divide), so results are bit-identical to
    * the oracle's replay. A zero vector yields the same NaNs the HOF
    * produced — never a silent alternative value.
    */
  def unit(x: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < x.length) { s += x(i) * x(i); i += 1 }
    val n = math.sqrt(s)
    i = 0
    while (i < x.length) { x(i) = x(i) / n; i += 1 }
    x
  }

  def chain(x: Array[Double], us: Array[Array[Double]],
      uus: Array[Double]): Array[Double] = {
    var r = 0
    while (r < us.length) {
      val u = us(r)
      if (x.length != u.length) throw new IllegalArgumentException(
        s"householder_chain: expected dim ${u.length}, got ${x.length}")
      var ux = 0.0
      var i = 0
      while (i < u.length) { ux += x(i) * u(i); i += 1 }
      val f = 2.0 * ux / uus(r)
      i = 0
      while (i < u.length) { x(i) = x(i) - f * u(i); i += 1 }
      r += 1
    }
    x
  }
}

object HouseholderKernel {
  val instance = new HouseholderKernel
}
