package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Literal language-model state for the narrow scoring path: a plain
  * gram → log-score hash map, shipped to executors ONCE via a real
  * `SparkContext.broadcast` (an expression field serialized into the
  * task binary would deserialize the whole map per TASK; `Broadcast
  * .value` deserializes once per executor and is a cached read after
  * that — the same transport a BroadcastHashJoin uses, minus its three
  * separate build jobs for a three-order probe).
  *
  * Values MUST be collected from a Spark-computed model table (never
  * recomputed driver-side) so the narrow path is bit-identical to the
  * join path by construction.
  */
final class LmMap(val m: java.util.HashMap[String, java.lang.Double])
    extends Serializable

object LmMapUtil {
  /** Stupid-backoff probe of a 3-token span "w1 w2 w3": the whole span,
    * then its 2-token suffix, then its final token — first known order
    * wins; null when even the unigram is unknown. Key orders cannot
    * collide (a gram's order is its space count), so one map holds all
    * three sub-models.
    */
  def backoff(lm: LmMap, k3: UTF8String): java.lang.Double = {
    val s = k3.toString
    val hit3 = lm.m.get(s)
    if (hit3 != null) return hit3
    val s2 = s.substring(s.indexOf(' ') + 1)
    val hit2 = lm.m.get(s2)
    if (hit2 != null) return hit2
    lm.m.get(s2.substring(s2.indexOf(' ') + 1))
  }

  /** Single-key probe (the bigram LM's shape): known score or null. */
  def lookup(lm: LmMap, k: UTF8String): java.lang.Double = lm.m.get(k.toString)

  /** Whole-document LM scoring over a gram ARRAY in one probe loop:
    * (known-gram count, round6'd average log-probability), or null when
    * no gram is known — the per-doc aggregation of the literal scoring
    * path without exploding rows, exchanging them by doc_id, or
    * re-aggregating (r13; the explode + MapLp + groupBy spelling it
    * replaces shipped one row per bigram occurrence through a corpus-
    * wide exchange).
    *
    * Exactness contract (must stay bit-identical to
    * `round6(dsum(lp)/count)` over the exploded spelling, and so to
    * the DuckDB oracle):
    *  - every stored lp is `floor(ln(c/tot)·1e6 + 0.5)/1e6`, i.e. the
    *    nearest double to an exact micro-unit integer k/1e6; `rint`
    *    recovers k exactly (|k| ≲ 2e7, ulp(k) ≈ 4e-9 after the ·1e6);
    *  - `dsum`'s decimal sum of those doubles is exactly (Σk)/1e6
    *    (the ≤6-decimal double casts to decimal as exactly k/1e6), and
    *    its final double cast is the correctly-rounded quotient —
    *    which `(Σk).toDouble / 1e6` also is (Σk < 2^53);
    *  - the average then repeats Exact.round6's IEEE sequence
    *    (mul, add 0.5, floor, divide) verbatim.
    */
  def scoreArray(lm: LmMap, bgs: org.apache.spark.sql.catalyst.util.ArrayData):
      org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    var n = 0L
    var k = 0L
    var i = 0
    val m = bgs.numElements()
    while (i < m) {
      if (!bgs.isNullAt(i)) {
        val d = lm.m.get(bgs.getUTF8String(i).toString)
        if (d != null) {
          n += 1L
          k += Math.rint(d.doubleValue * 1e6).toLong
        }
      }
      i += 1
    }
    if (n == 0L) null
    else {
      val sum = k.toDouble / 1e6
      val avg = Math.floor(sum / n * 1e6 + 0.5) / 1e6
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](n, avg))
    }
  }
}

private[functions] trait LmProbe extends UnaryExpression {
  def bc: Broadcast[LmMap]
  def probeFn: String // static method name on LmMapUtil (eval + codegen)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  protected def probe(lm: LmMap, k: UTF8String): java.lang.Double

  override def nullSafeEval(input: Any): Any =
    probe(bc.value, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val bcRef = ctx.addReferenceObj("lmBc", bc,
        classOf[Broadcast[_]].getName)
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.LmMapUtil.$probeFn(
         |  (graft.functions.LmMap) $bcRef.value(), $c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
}

/** `graft_backoff_lp(k3)` — the trigram stupid-backoff score of one
  * 3-token span against a broadcast [[LmMap]]; null = skip position.
  * The literal-path sibling of the three-projection broadcast-join
  * chain in [[graft.ops.TrainPrepOps.scoreTrigramLm]] (which remains
  * the path for models past the literal cap) — spec'd equal in
  * TrainPrepOpsSpec.
  */
case class BackoffLp(child: Expression, bc: Broadcast[LmMap])
    extends LmProbe {
  override def prettyName: String = "graft_backoff_lp"
  override def probeFn: String = "backoff"
  override protected def probe(lm: LmMap, k: UTF8String): java.lang.Double =
    LmMapUtil.backoff(lm, k)
  override protected def withNewChildInternal(newChild: Expression): BackoffLp =
    copy(child = newChild)
}

/** `graft_bloom_contains(key)` — codegen probe of a broadcast
  * `util.sketch.BloomFilter` over a BIGINT key: the bloom-prefilter's
  * hot-path test stays inside whole-stage codegen (the ScalaUDF
  * spelling it replaces broke codegen at the fact scan and boxed every
  * key).
  */
case class BloomContains(child: Expression,
    bc: Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    bc.value.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((org.apache.spark.util.sketch.BloomFilter) $bcRef.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomContains =
    copy(child = newChild)
}

/** Literal string-set state (same transport rationale as [[LmMap]]):
  * a benchmark's distinct shingle set, broadcast once.
  */
final class StrSet(val s: java.util.HashSet[String]) extends Serializable

object ShingleHitUtil {
  /** Distinct word `n`-grams of `text` and how many are in `set` — the
    * whole corpus side of a contamination check in ONE pass: tokenize,
    * shingle, per-document dedup, set probe, with no exploded rows, no
    * join, and no per-document aggregation. Mirror of
    * `array_distinct(graft_shingles(text, n))` + a membership count
    * (dual-path spec'd in GraftOpsSpec).
    */
  def hits(set: StrSet, text: UTF8String, n: Int):
      org.apache.spark.sql.catalyst.InternalRow = {
    val toks = WordsUtil.tokenize(text.toString)
    val seen = new java.util.HashSet[String]()
    var nHit = 0L
    var i = 0
    val m = toks.size - n + 1
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks.get(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks.get(i + j)); j += 1 }
      val sp = sb.toString
      if (seen.add(sp) && set.s.contains(sp)) nHit += 1
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](seen.size.toLong, nHit))
  }
}

/** `graft_shingle_hits(text)` -> struct<n_shingles, n_hit> against a
  * broadcast [[StrSet]] (the contamination check's literal path).
  */
case class ShingleHits(child: Expression, bc: Broadcast[StrSet], n: Int)
    extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_shingles",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_hit",
        org.apache.spark.sql.types.LongType, nullable = false)))
  override def prettyName: String = "graft_shingle_hits"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    ShingleHitUtil.hits(bc.value, input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("shingleSetBc", bc,
      classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHitUtil.hits(" +
        s"(graft.functions.StrSet) $bcRef.value(), $c, $n)")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHits =
    copy(child = newChild)
}

/** `graft_strset_contains(s)` — broadcast string-set membership probe.
  * The literal-path replacement for a multi-million-value `isin(...)`:
  * an In over millions of Literal nodes costs the driver the whole
  * analyzed-plan allocation and optimization walk, where this ships the
  * set once via SparkContext.broadcast and probes it in codegen (the
  * [[ShingleHits]] transport). Null input -> null (isin parity: a null
  * probe never matches).
  */
object StrSetUtil {
  // Janino-callable static entry: Scala's `val s` compiles to a PRIVATE
  // field + accessor, which generated code cannot touch directly.
  def contains(set: StrSet, s: UTF8String): Boolean =
    set.s.contains(s.toString)
}

case class StrSetContains(child: Expression, bc: Broadcast[StrSet])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "graft_strset_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    StrSetUtil.contains(bc.value, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("strSetBc", bc, classOf[Broadcast[_]].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.StrSetUtil.contains(" +
        s"(graft.functions.StrSet) $bcRef.value(), $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): StrSetContains =
    copy(child = newChild)
}

/** `graft_lm_array_score(bgs)` -> struct<n_bigrams, avg_logprob> | null
  * against a broadcast [[LmMap]] — see [[LmMapUtil.scoreArray]] for the
  * per-doc semantics and the exactness contract.
  */
case class LmArrayScore(child: Expression, bc: Broadcast[LmMap])
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("n_bigrams",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("avg_logprob",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lm_array_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(_: StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    LmMapUtil.scoreArray(bc.value,
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val bcRef = ctx.addReferenceObj("lmBc", bc, classOf[Broadcast[_]].getName)
      s"""
         |org.apache.spark.sql.catalyst.expressions.GenericInternalRow
         |  ${ev.value}_r = graft.functions.LmMapUtil.scoreArray(
         |    (graft.functions.LmMap) $bcRef.value(), $c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LmArrayScore =
    copy(child = newChild)
}

/** `graft_map_lp(k)` — single-key LM probe (bigram LM literal path). */
case class MapLp(child: Expression, bc: Broadcast[LmMap]) extends LmProbe {
  override def prettyName: String = "graft_map_lp"
  override def probeFn: String = "lookup"
  override protected def probe(lm: LmMap, k: UTF8String): java.lang.Double =
    LmMapUtil.lookup(lm, k)
  override protected def withNewChildInternal(newChild: Expression): MapLp =
    copy(child = newChild)
}

/** Literal long-keyed model state (same transport rationale as
  * [[LmMap]]): the two-phase global-rank recipe's bucket → offset
  * table when the bucket count is bounded (valueDeciles' literal
  * path).
  */
final class LongMap(val m: java.util.HashMap[java.lang.Long, java.lang.Long])
    extends Serializable

object LongMapUtil {
  def lookup(lm: LongMap, k: Long): java.lang.Long = lm.m.get(k)
}

/** `graft_long_map(k)` — broadcast BIGINT → BIGINT probe; null when
  * the key is absent (for the offset table that cannot happen by
  * construction: the map is collected from the same frame it probes).
  */
case class LongMapLookup(child: Expression, bc: Broadcast[LongMap])
    extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_long_map"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == org.apache.spark.sql.types.LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a BIGINT argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val r = LongMapUtil.lookup(bc.value, input.asInstanceOf[Long])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val bcRef = ctx.addReferenceObj("longMapBc", bc,
        classOf[Broadcast[_]].getName)
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.LongMapUtil.lookup(
         |  (graft.functions.LongMap) $bcRef.value(), $c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LongMapLookup =
    copy(child = newChild)
}
