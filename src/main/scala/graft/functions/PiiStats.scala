package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII battery: the same three java-regex patterns the
  * builtins spelling used (`regexp_count` ×3 + a cascaded
  * `regexp_replace` ×3 = six expression evaluations, each paying its
  * own UTF8String→String conversion per row), evaluated once per row.
  * Counts are over the ORIGINAL text; `scrubbed` applies the
  * replacements in the fixed email → IPv4 → phone order on the
  * progressively scrubbed string — semantics identical to the builtin
  * chain by construction (same Pattern class, same pattern strings,
  * parity spec'd in CurationOpsSpec).
  */
object PiiStatsUtil {
  // compiled once per JVM; Matcher instances are per-call (thread-safe)
  private val email = java.util.regex.Pattern.compile(
    graft.ops.CurationOps.EmailRe)
  private val ipv4 = java.util.regex.Pattern.compile(
    graft.ops.CurationOps.Ipv4Re)
  private val phone = java.util.regex.Pattern.compile(
    graft.ops.CurationOps.PhoneRe)

  private def countOf(p: java.util.regex.Pattern, s: String): Int = {
    val m = p.matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  def stats(text: UTF8String): InternalRow = {
    val s = text.toString
    val scrubbed = phone.matcher(
      ipv4.matcher(
        email.matcher(s).replaceAll("[EMAIL]"))
        .replaceAll("[IP]"))
      .replaceAll("[PHONE]")
    new GenericInternalRow(Array[Any](
      countOf(email, s), countOf(ipv4, s), countOf(phone, s),
      UTF8String.fromString(scrubbed)))
  }
}

/** `graft_pii_stats(text)` -> struct<n_emails, n_ips, n_phones, scrubbed>. */
case class PiiStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_ips", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))

  override def prettyName: String = "graft_pii_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    PiiStatsUtil.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PiiStatsUtil.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): PiiStats =
    copy(child = newChild)
}
