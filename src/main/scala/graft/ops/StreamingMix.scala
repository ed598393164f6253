package graft.ops

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Input row for the streaming source-mix: one document's token count. */
case class MixDoc(source: String, doc_id: Long, n_tokens: Long)

/** An admitted document plus the source's running kept-token total
  * AFTER admitting it.
  */
case class MixKept(source: String, doc_id: Long, n_tokens: Long, kept_tokens: Long)

/** Streaming sibling of [[PipelineOps.sourceMix]] (the batch operator
  * derives per-source keep RATES from full-corpus totals — a streaming
  * corpus has no full-corpus totals, so the budget must be enforced
  * incrementally): a per-source token BUDGET applied across micro-
  * batches with typed keyed state (`transformWithState`, the Spark 4
  * StatefulProcessor API over the RocksDB state store).
  *
  * Admission is greedy: a document is kept iff the source's running
  * kept-token total plus its tokens stays within the budget; the total
  * is ValueState carried across batches, so a source exhausting its
  * budget in batch 1 admits nothing in batch 3 — while a smaller doc
  * that still fits is admitted even after a larger one was refused.
  * Within a micro-batch, rows are admitted in doc_id order so the
  * decision is deterministic regardless of partition arrival order.
  *
  * Scale posture — stated precisely: STATE is one long per source (the
  * running total, never documents), but ROWS do shuffle keyed by
  * source, and each source's micro-batch slice is buffered and sorted
  * in its task for the deterministic admission order — so per-task
  * memory is bounded by the trigger size divided by the source count,
  * and a hot source funnels its slice through one task. That is the
  * inherent shape of sequential budget admission (the decision for doc
  * N depends on docs < N of the same source); this operator is the
  * metered-ingest form for bounded micro-batches, NOT a full-corpus
  * reshuffle — a corpus-scale backfill should run the batch
  * [[PipelineOps.sourceMix]] (rate-based, fully parallel) instead.
  *
  * Budgets are PER SOURCE: `budgets` names each source's token budget
  * (the streaming sibling of [[PipelineOps.sourceMixWeighted]]'s
  * per-source targets), and a source absent from the map falls back to
  * `defaultBudget` — 0 for the weighted form (unknown sources are
  * excluded, matching the batch operator's weight-0 contract), the
  * shared budget for the uniform form. The map is literal processor
  * state (serialized once with the processor, O(source count) — model
  * state, never data).
  */
class SourceBudgetProcessor(budgets: Map[String, Long], defaultBudget: Long)
    extends StatefulProcessor[String, MixDoc, MixKept] {
  require(defaultBudget >= 0, s"defaultBudget must be >= 0, got $defaultBudget")
  require(budgets.values.forall(_ >= 0), s"budgets must be >= 0, got $budgets")

  /** Uniform budget across all sources (the original single-knob form). */
  def this(budget: Long) = this(Map.empty, budget)

  @transient private var keptTokens: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    keptTokens = getHandle.getValueState[Long](
      "keptTokens", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(
      key: String, rows: Iterator[MixDoc],
      timerValues: TimerValues): Iterator[MixKept] = {
    val budget = budgets.getOrElse(key, defaultBudget)
    var t = if (keptTokens.exists()) keptTokens.get() else 0L
    // deterministic admission order within the batch (a micro-batch's
    // iterator order is partition-arrival order otherwise)
    val admitted = rows.toSeq.sortBy(_.doc_id).flatMap { d =>
      if (t + d.n_tokens <= budget) {
        t += d.n_tokens
        Some(MixKept(key, d.doc_id, d.n_tokens, t))
      } else None
    }
    keptTokens.update(t)
    admitted.iterator
  }
}

object StreamingMix {
  /** Wire the budget processor onto a (streaming or batch) Dataset of
    * [[MixDoc]] rows. Emits admitted docs only, with the running
    * per-source kept-token total.
    */
  def sourceBudget(docs: Dataset[MixDoc], budget: Long): Dataset[MixKept] =
    wire(docs, new SourceBudgetProcessor(budget))

  /** Per-source budget map (the streaming sibling of
    * [[PipelineOps.sourceMixWeighted]]): each named source gets its own
    * token budget, enforced independently across micro-batches; a
    * source absent from the map admits NOTHING (budget 0), matching the
    * batch operator's weight-0 contract for unknown sources.
    */
  def sourceBudgetWeighted(
      docs: Dataset[MixDoc], budgets: Map[String, Long]): Dataset[MixKept] = {
    require(budgets.nonEmpty, "sourceBudgetWeighted needs a non-empty budget map")
    wire(docs, new SourceBudgetProcessor(budgets, 0L))
  }

  private def wire(
      docs: Dataset[MixDoc], p: SourceBudgetProcessor): Dataset[MixKept] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.source)
      .transformWithState(
        p, TimeMode.None(), OutputMode.Append(),
        Encoders.product[MixKept])
  }
}
