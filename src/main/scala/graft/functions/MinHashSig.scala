package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper for [[MinHashSig]]: for every shingle compute md5("a:"+s)
  * and md5("b:"+s) with a thread-local digest (Spark's built-in md5()
  * allocates a MessageDigest per call), slice each into four 8-hex 32-bit
  * values, and keep the running minimum per slot — one pass, no
  * intermediate hash arrays. Produces EXACTLY the values of the
  * spelled-out combo (min over substr(md5(seed||s), off, 8)), so the
  * DuckDB oracle is unchanged.
  */
object MinHashUtil {
  private val Hex = "0123456789abcdef".toCharArray
  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private def md5hex(md: MessageDigest, prefix: Byte, s: UTF8String): Array[Char] = {
    md.reset()
    md.update(prefix)
    md.update(':'.toByte)
    md.update(s.getBytes)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    out
  }

  private def updateMins(mins: Array[String], base: Int, hex: Array[Char]): Unit = {
    var k = 0
    while (k < 4) {
      val slice = new String(hex, k * 8, 8)
      val cur = mins(base + k)
      if (cur == null || slice.compareTo(cur) < 0) mins(base + k) = slice
      k += 1
    }
  }

  def sig(shingles: ArrayData): ArrayData = {
    val md = digests.get()
    val mins = new Array[String](8)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (s != null) { // null shingles: skip, like array_min over md5(null)=null
        updateMins(mins, 0, md5hex(md, 'a'.toByte, s))
        updateMins(mins, 4, md5hex(md, 'b'.toByte, s))
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }
}

/** Native MinHash signature over an array<string> of shingles (SURVEY.md
  * §2C near-dup row): m0..m7 as 8-hex strings, identical to the built-ins
  * spelling but ~an order less hashing overhead — the inner loop of
  * corpus-scale dedup.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHashUtil.sig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashUtil.sig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
