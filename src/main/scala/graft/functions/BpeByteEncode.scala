package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Executor-side BYTE-level BPE encoder — the GPT-2-family tokenizer
  * shape: a portable regex pre-tokenizer splits the ORIGINAL text into
  * pretokens whose concatenation IS the text (whitespace included),
  * each pretoken becomes its UTF-8 byte sequence, and the trained
  * merge list splices byte symbols within each pretoken. Token ids are
  * fully determined with no collected alphabet at all: byte b -> id b
  * (the 256-entry base vocabulary every byte-level tokenizer fixes up
  * front), merge of round r -> 256 + r - 1, a merge PRODUCT colliding
  * with an earlier product -> the earlier (smaller) id (the char-level
  * tokenizer's MIN rule). Decode is therefore LOSSLESS for the
  * original text: ids -> symbol byte strings -> concatenated bytes ->
  * UTF-8 text, byte-for-byte — unlike the word-internal char-level
  * tokenizer, whose decode reconstructs boundary-free word concat.
  *
  * Symbols are tracked as UPPERCASE HEX strings (one pair per byte) so
  * the merge list, the splice semantics, and the DuckDB oracle replay
  * are EXACTLY the char-level machinery's boundary-padded
  * string-replace discipline — including the non-overlapping
  * resume-after-boundary quirk ([[BpeIdEncoder]]'s scaladoc). The
  * pre-tokenizer pattern must behave identically under Java regex and
  * RE2 (the piiScrub discipline): [[graft.ops.TrainPrepOps.BytePreRegex]]
  * keeps to the common subset (no lookahead) AND is alternation-order
  * robust — at any position at most one alternative can win under
  * either leftmost-first or leftmost-longest semantics.
  *
  * Pretoken→ids results are memoized (pretoken TYPES are Zipf-few;
  * the [[BpeIdEncoder]] memo discipline).
  */
final class BpeByteEncoder(
    mergePairs: Seq[String], pattern: String) extends Serializable {

  private val merges: Array[(String, String, String)] =
    mergePairs.map { p =>
      val sp = p.indexOf(' ')
      require(sp > 0, s"malformed merge pair '$p'")
      (p.substring(0, sp), p.substring(sp + 1), p.replace(" ", ""))
    }.toArray

  /** product hex string -> id (256 + round - 1, MIN on collisions). */
  private val productIds: Map[String, Int] =
    merges.zipWithIndex.map { case ((_, _, ab), k) => (ab, 256 + k) }
      .groupMapReduce(_._1)(_._2)(math.min)

  /** id -> symbol hex string (the DECODE table: 256 base bytes + one
    * product per merge round; collided products keep their row — decode
    * of the surviving MIN id reads the identical string).
    */
  private val idToHex: Array[String] = {
    val base = (0 until 256).map(b => f"$b%02X")
    (base ++ merges.map(_._3)).toArray
  }

  @transient private lazy val re = java.util.regex.Pattern.compile(pattern)
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private val MemoCap = 1 << 16

  private val HexD = "0123456789ABCDEF"

  private def encodePretoken(pt: String): Array[Int] = {
    val cached = memo.get(pt)
    if (cached != null) return cached
    val bytes = pt.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var syms = {
      val buf = new java.util.ArrayList[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        buf.add(new String(Array(HexD.charAt(b >> 4), HexD.charAt(b & 0xf))))
        i += 1
      }
      buf
    }
    var mi = 0
    while (mi < merges.length) {
      val (a, b, ab) = merges(mi)
      val n = syms.size
      val out = new java.util.ArrayList[String](n)
      var i = 0
      while (i < n) {
        if (i + 1 < n && syms.get(i) == a && syms.get(i + 1) == b) {
          out.add(ab)
          // boundary-space consumption: symbol i+2 cannot START the
          // next match in this pass (the trainer's replace semantics)
          if (i + 2 < n) out.add(syms.get(i + 2))
          i += 3
        } else { out.add(syms.get(i)); i += 1 }
      }
      syms = out
      mi += 1
    }
    val ids = new Array[Int](syms.size)
    var i = 0
    while (i < syms.size) {
      val s = syms.get(i)
      ids(i) =
        if (s.length == 2)
          HexD.indexOf(s.charAt(0)) * 16 + HexD.indexOf(s.charAt(1))
        else productIds(s)
      i += 1
    }
    if (memo.size() < MemoCap) memo.put(pt, ids)
    ids
  }

  /** text -> (n_pretokens, n_tokens, ids, lossless) where `lossless`
    * re-derives the text FROM THE IDS (ids -> hex symbols -> bytes ->
    * UTF-8) and compares byte-for-byte — the real decode path, not the
    * pretoken concat shortcut.
    */
  def encode(text: UTF8String): InternalRow = {
    val str = text.toString
    val m = re.matcher(str)
    val ids = new java.util.ArrayList[Array[Int]]()
    var nPre = 0L
    var nTok = 0L
    while (m.find()) {
      val arr = encodePretoken(m.group())
      ids.add(arr)
      nPre += 1
      nTok += arr.length
    }
    val flat = new Array[Int](nTok.toInt)
    var o = 0
    var i = 0
    while (i < ids.size) {
      val a = ids.get(i)
      System.arraycopy(a, 0, flat, o, a.length)
      o += a.length
      i += 1
    }
    // decode: ids -> hex -> bytes -> text
    val hex = new java.lang.StringBuilder
    var j = 0
    while (j < flat.length) { hex.append(idToHex(flat(j))); j += 1 }
    val nb = hex.length() / 2
    val bytes = new Array[Byte](nb)
    j = 0
    while (j < nb) {
      bytes(j) = ((HexD.indexOf(hex.charAt(2 * j)) << 4) |
        HexD.indexOf(hex.charAt(2 * j + 1))).toByte
      j += 1
    }
    val lossless =
      new String(bytes, java.nio.charset.StandardCharsets.UTF_8) == str
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nPre, nTok, UnsafeArrayData.fromPrimitiveArray(flat),
        lossless))
  }
}

/** `graft_bpe_byte_encode(text)` -> struct<n_pretokens, n_tokens, ids,
  * lossless>: byte-level BPE encode + decode-roundtrip check in ONE
  * narrow codegen pass (the trained merge list rides as a reference
  * object — no join, no shuffle; text never leaves the row).
  */
case class BpeByteEncode(child: Expression, enc: BpeByteEncoder)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_pretokens", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("ids", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("lossless", BooleanType, nullable = false)))
  override def prettyName: String = "graft_bpe_byte_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    enc.encode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val encRef = ctx.addReferenceObj("bpeByteEnc", enc, classOf[BpeByteEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$encRef.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeByteEncode =
    copy(child = newChild)
}
