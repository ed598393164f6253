package graft.ops

import graft.{Q, QueryModule}

/** Aggregates the initial query surface. Grows module by module per
  * SURVEY.md §7.2's build order.
  */
object CoreQueries extends QueryModule {
  def queries: Seq[Q] =
    Seq(Q("word_count", TextOps.wordCountOracle)(TextOps.wordCountQuery)) ++
      RelationalOps.queries ++
      ScalarOps.queries ++
      TextOps.analysisQueries ++
      DedupOps.queries ++
      SimilarityOps.queries ++
      EventOps.queries ++
      MediaQueries.queries ++
      AdvancedOps.queries ++
      ArchiveOps.queries ++
      HtmlOps.queries ++
      ScaleOps.queries ++
      ExtraOps.queries ++
      SecondPassOps.queries ++
      PipelineOps.queries ++
      GraphOps.queries ++
      MlOps.queries ++
      CurationOps.queries ++
      FilterOps.queries ++
      TrainPrepOps.queries
}
