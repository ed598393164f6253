package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper for [[SimHash64]]: one md5 per word with a thread-local
  * digest, ±1 vote per bit over the digest's FIRST 8 BYTES read MSB-first
  * (== the first 16 hex chars the spelled-out form slices), majority →
  * bit. Produces EXACTLY the hex the 64-SUM built-ins spelling produces
  * (bit k = CASE WHEN sum_k > 0), so the DuckDB oracle is unchanged —
  * but as a single narrow pass per document instead of an explode +
  * 64-buffer aggregation (no shuffle at all).
  */
object SimHashUtil {
  private val Hex = "0123456789abcdef".toCharArray
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  def simhash(words: ArrayData): UTF8String = {
    val md = digests.get()
    val counts = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      if (w != null) {
        md.reset()
        md.update(w.getBytes)
        val d = md.digest()
        var k = 0
        while (k < 64) {
          // bit k (MSB-first over the first 8 bytes): hex char k/4,
          // in-nibble bit k%4 — i.e. byte k>>3, in-byte bit 7-(k&7)
          if (((d(k >> 3) >> (7 - (k & 7))) & 1) == 1) counts(k) += 1
          else counts(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      var v = 0
      var b = 0
      while (b < 4) {
        if (counts(4 * j + b) > 0) v |= 1 << (3 - b)
        b += 1
      }
      out(j) = Hex(v)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Native 64-bit SimHash over an array<string> of words (SURVEY.md §2C
  * near-dup row) as a 16-hex string. Callers should filter empty word
  * arrays first when matching the explode+aggregate spelling, which
  * emits no row for a wordless document.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
