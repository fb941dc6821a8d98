package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** The fast Walsh–Hadamard kernel shared by `FwhtRotate`'s interpreted
  * eval and its generated code (passed into codegen as a reference
  * object, so the generated Java calls the SAME JVM method — the two
  * execution paths are bit-identical by construction). A top-level
  * class because Janino-generated code references it by source name.
  *
  * Op order is the contract (the SQL oracle replays it stage by stage):
  * sign diagonal first, then butterflies with h = 1, 2, 4, … — stage h
  * writes (a+b) at j and (a−b) at j+h — then one division by √d.
  */
class FwhtKernel extends Serializable {

  def toDoubles(a: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = a.numElements()
    val x = new Array[Double](n)
    var i = 0
    while (i < n) {
      // ArrayData.getFloat/getDouble on a null slot silently yields 0.0,
      // which would diverge from the naive-fold path (null propagates
      // through its HOF fold) — embeddings never carry null elements, so
      // a null here is corrupt input: fail loudly instead of rotating it
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"fwht_rotate: null array element at index $i - embeddings must not contain nulls")
      x(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    x
  }

  def kernel(x: Array[Double], signs: Array[Double]): Array[Double] = {
    val n = signs.length
    if (x.length != n) throw new IllegalArgumentException(
      s"fwht_rotate: expected dim $n, got ${x.length}")
    var i = 0
    while (i < n) { x(i) = x(i) * signs(i); i += 1 }
    var h = 1
    while (h < n) {
      var base = 0
      while (base < n) {
        var j = base
        while (j < base + h) {
          val a = x(j); val b = x(j + h)
          x(j) = a + b
          x(j + h) = a - b
          j += 1
        }
        base += 2 * h
      }
      h *= 2
    }
    val inv = math.sqrt(n.toDouble)
    var k = 0
    while (k < n) { x(k) = x(k) / inv; k += 1 }
    x
  }
}

object FwhtKernel {
  val instance = new FwhtKernel
}
