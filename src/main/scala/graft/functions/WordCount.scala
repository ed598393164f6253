package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen helper: one pass over the string, no token array allocation —
  * unlike `size(filter(split(...)))`, which materializes every token.
  * Public + static-shaped so generated Java can call it directly.
  */
object WordCountUtil {
  /** Go unicode.IsSpace / White_Space parity (reference `strings.Fields`,
    * /root/reference/main.go:195). Mirrors graft.ops.TextOps.WsRe.
    */
  def isGoSpace(c: Int): Boolean = c match {
    case 0x09 | 0x0a | 0x0b | 0x0c | 0x0d | 0x20 | 0x85 | 0xa0 | 0x1680 |
        0x2028 | 0x2029 | 0x202f | 0x205f | 0x3000 => true
    case _ => c >= 0x2000 && c <= 0x200a
  }

  def count(s: UTF8String): Long = {
    val str = s.toString
    var n = 0L
    var inWord = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val ws = isGoSpace(cp)
      if (!ws && !inWord) n += 1
      inWord = !ws
      i += Character.charCount(cp)
    }
    n
  }
}

/** Native Catalyst expression for the reference's word count (R9) — the
  * SURVEY.md §7.3 "optional native Expression with codegen" upgrade over
  * the expression combo. Stays inside WholeStageCodegen via a single
  * static call; null-safe (null in -> null out) like the built-ins.
  */
case class WordCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_word_count"

  override def nullSafeEval(input: Any): Any =
    WordCountUtil.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordCountUtil.count($c)")

  override protected def withNewChildInternal(newChild: Expression): WordCount =
    copy(child = newChild)
}
