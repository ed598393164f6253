package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Executor-side BPE id encoder: the TRAINED tokenizer (merge list in
  * training order + token→id table) compiled into one reusable object
  * that turns a document's word array into its token-id array. Model
  * state is bounded (alphabet + one merge per round); the per-word
  * splice loop reproduces the boundary-padded string-replace semantics
  * of the trainer ([[graft.ops.PipelineOps.bpeMerges]]) EXACTLY on a
  * symbol array — including the non-overlapping resume-after-boundary
  * quirk (" a a a a " merges to "aa a a", not "aa aa": the match
  * consumes the boundary space of the symbol after the pair, so that
  * symbol cannot START the next match; see the trainer's scaladoc) —
  * without the per-merge string realloc the Column replace chain pays.
  *
  * Word→ids results are memoized in a bounded concurrent map (token
  * TYPES are Zipf-few relative to occurrences; codegen references are
  * shared across a stage's tasks, hence concurrent). A symbol missing
  * from the vocabulary encodes as -1 (UNK) — unreachable when encoding
  * the corpus the tokenizer was trained on, since every character of
  * every word is in the alphabet by construction.
  */
final class BpeIdEncoder(
    mergePairs: Seq[String],
    vocabIds: Map[String, Int]) extends Serializable {

  // parsed merges: (left, right, product); symbols never contain
  // spaces, so the single space is the pair delimiter
  private val merges: Array[(String, String, String)] =
    mergePairs.map { p =>
      val sp = p.indexOf(' ')
      require(sp > 0, s"malformed merge pair '$p'")
      (p.substring(0, sp), p.substring(sp + 1), p.replace(" ", ""))
    }.toArray

  @transient private lazy val vocab: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocabIds.size * 2)
    vocabIds.foreach { case (k, v) => m.put(k, Integer.valueOf(v)) }
    m
  }

  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Int]]()
  private val MemoCap = 1 << 16

  private def encodeWord(w: String): Array[Int] = {
    val cached = memo.get(w)
    if (cached != null) return cached
    // code-point split — the trainer's "(.)" regex matches code points
    var syms = {
      val buf = new java.util.ArrayList[String](w.length)
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        buf.add(w.substring(i, i + n))
        i += n
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
          // the string replace consumed symbol i+2's leading boundary
          // space — it cannot start the next match in this pass
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
      val id = vocab.get(syms.get(i))
      ids(i) = if (id == null) -1 else id.intValue()
      i += 1
    }
    if (memo.size() < MemoCap) memo.put(w, ids)
    ids
  }

  /** array<string> words → concatenated array<int> token ids. */
  def encode(wordsArr: ArrayData): ArrayData = {
    val nw = wordsArr.numElements()
    val per = new Array[Array[Int]](nw)
    var total = 0
    var i = 0
    while (i < nw) {
      per(i) = encodeWord(wordsArr.getUTF8String(i).toString)
      total += per(i).length
      i += 1
    }
    val out = new Array[Int](total)
    var o = 0
    i = 0
    while (i < nw) {
      System.arraycopy(per(i), 0, out, o, per(i).length)
      o += per(i).length
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** `graft_bpe_encode_ids(words)` -> array<int>: apply the trained BPE
  * merge list to each word and emit the concatenated token-id stream —
  * the tokenize-to-ids step of the training-data pipeline. The trained
  * tokenizer rides the expression as a reference object (the
  * BloomContains pattern), so the corpus-scale encode is one narrow
  * codegen pass with zero joins.
  */
case class BpeEncodeIds(child: Expression, encoder: BpeIdEncoder)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncoder", encoder,
      classOf[BpeIdEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

/** Runtime side of [[BpeDecodeIds]] (object-static so codegen can call
  * it with the vocab table as a reference object).
  */
object BpeDecodeUtil {
  /** Splice an id stream back to text through the id→token table
    * (vocab ids are dense: chars 0..|A|-1 in code-point order, merge
    * products |A|.. in training order). An id outside the table — UNK
    * (-1) or a foreign stream — renders as U+FFFD rather than failing
    * the job: decode is a diagnostic, and the replacement char makes a
    * mismatch VISIBLE in the roundtrip equality instead of fatal.
    */
  def decode(tokens: Array[String], ids: ArrayData): org.apache.spark.unsafe.types.UTF8String = {
    val n = ids.numElements()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      val id = ids.getInt(i)
      if (id >= 0 && id < tokens.length) sb.append(tokens(id))
      else sb.append('\uFFFD')
      i += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
  }
}

/** `graft_bpe_decode_ids(ids)` -> string: the inverse of
  * [[BpeEncodeIds]] — concatenate each id's token string. Word
  * boundaries are not represented in the id stream (word-level BPE,
  * no space marker), so the decode target is the boundary-free word
  * concatenation; the roundtrip contract is
  * decode(encode(words)) == concat(words, '').
  */
case class BpeDecodeIds(child: Expression, tokens: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_decode_ids"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<int>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BpeDecodeUtil.decode(tokens, input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeDecodeVocab", tokens, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeDecodeUtil.decode($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDecodeIds =
    copy(child = newChild)
}
