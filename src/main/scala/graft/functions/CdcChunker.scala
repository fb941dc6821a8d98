package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries via a gear rolling hash — the
  * storage/transfer-dedup primitive (Muthitacharoen et al. 2001, LBFS;
  * the FastCDC family): a boundary falls wherever the local content
  * hash clears a mask, so an insertion early in a document only
  * re-chunks the chunk it lands in — unlike fixed-width chunking, where
  * one inserted byte shifts EVERY downstream boundary and defeats
  * chunk-level dedup.
  *
  * Exact contract (what the DuckDB oracle replays):
  *  - the text is a sequence of Unicode code points, 1-based positions;
  *  - `gear(cp) = splitmix64(cp)` ([[Sketches.splitmix64]]);
  *  - `h_i = 2·h_{i-1} + gear(cp_i)` wrapping mod 2^64 (h_0 = 0) — so
  *    `h_i` depends on only the last 64 code points, and an engine
  *    without the sequential fold can compute it per position as
  *    `Σ_{j=i-63..i} gear(cp_j)·2^{i-j} mod 2^64`;
  *  - position i (1 ≤ i < n) is a CUT iff `(h_i & mask) == 0`,
  *    `mask = 2^maskBits − 1` (expected chunk length 2^maskBits);
  *  - chunks are the maximal segments between cuts; a cut ends its
  *    chunk at i, the next starts at i+1; the tail segment is always a
  *    chunk. Empty text ⇒ no chunks.
  *
  * Cut decisions are per-position INDEPENDENT (no min/max-size
  * suppression), which is what keeps the semantics engine-replayable
  * without a sequential fold. Row-local, one linear code-point pass,
  * codegen'd — zero shuffles; the 100 TB cost is the scan itself.
  */
case class CdcChunks(child: Expression, maskBits: Int)
    extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 32,
    s"maskBits must be in [1, 32], got $maskBits")

  override def dataType: DataType = CdcChunks.outType

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String], maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcChunks.compute($c, $maskBits);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)

  def compute(s: UTF8String, maskBits: Int): GenericArrayData = {
    val str = s.toString
    val mask = (1L << maskBits) - 1L
    val rows = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    val n = str.codePointCount(0, str.length)
    var h = 0L
    var chunkStart = 1 // 1-based code-point position
    var pos = 0
    var i = 0 // Java char index
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      pos += 1
      h = h * 2L + Sketches.splitmix64(cp.toLong)
      if ((h & mask) == 0L && pos < n) {
        rows += InternalRow(chunkStart, pos - chunkStart + 1)
        chunkStart = pos + 1
      }
    }
    if (n >= chunkStart) rows += InternalRow(chunkStart, n - chunkStart + 1)
    new GenericArrayData(rows.toArray[Any])
  }

  def cdcChunks(text: Column, maskBits: Int): Column =
    toColumn(CdcChunks(exprOf(text), maskBits))
}
