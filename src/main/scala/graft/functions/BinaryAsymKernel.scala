package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** The asymmetric-binary scoring kernel shared by `BinaryAsymScore`'s
  * interpreted eval and its generated code (the `HouseholderKernel`
  * discipline — both paths call the SAME JVM method, bit-identical by
  * construction; top-level class because Janino references it by
  * source name).
  *
  * Contract (the SQL oracle replays it term by term, in index order):
  * `Σ_{i=0}^{dim−1} qq_i · (((words_{i/32} >> (i mod 32)) & 1) = 1 ?
  * +1 : −1)` — the quantized query component is ADDED when the corpus
  * vector's sign bit is set, subtracted otherwise. All exact long
  * arithmetic.
  */
class BinaryAsymKernel extends Serializable {

  def score(qq: ArrayData, words: ArrayData, dim: Int): Long = {
    if (qq.numElements() < dim) throw new IllegalArgumentException(
      s"binary_asym_score: quantized query has ${qq.numElements()} " +
        s"components, dim=$dim")
    if (words.numElements() < (dim + 31) / 32) throw new IllegalArgumentException(
      s"binary_asym_score: ${words.numElements()} packed words cannot " +
        s"cover dim=$dim")
    var s = 0L
    var i = 0
    while (i < dim) {
      val bit = (words.getLong(i >> 5) >>> (i & 31)) & 1L
      val q = qq.getLong(i)
      s += (if (bit == 1L) q else -q)
      i += 1
    }
    s
  }
}

object BinaryAsymKernel {
  val instance = new BinaryAsymKernel
}
