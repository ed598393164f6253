package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Presentation-sort helper for KEY-DOMAIN-BOUNDED outputs.
  *
  * A plain `orderBy` plans a range exchange, whose boundary-sampling
  * pass is its own Spark job and whose shuffle is another — ~2 jobs of
  * pure scheduling floor to order 25 rows. When the output cardinality
  * is bounded by a FIXED key domain (the 25 nations, a corpus's
  * handful of sources, 8 shards, 10 deciles) — i.e. it does NOT grow
  * with the data — the right plan at ANY corpus size is a single-task
  * local sort: `coalesce(1).sortWithinPartitions`, a total order over
  * one partition with no exchange (the upstream aggregation's
  * map-side partials still did the distributed work; the collapsed
  * final stage only merges per-key partials).
  *
  * DO NOT use this for outputs that scale with the data (per-document
  * scores, per-order rows, join results): that is exactly the
  * single-task funnel the registry bans. The call sites are the
  * contract: each sorts on a fixed-domain key.
  */
object Present {
  implicit class BoundedSortOps(private val df: DataFrame) {
    def boundedSort(col1: String, cols: String*): DataFrame =
      df.coalesce(1).sortWithinPartitions(col1, cols: _*)
    def boundedSortCols(cols: Column*): DataFrame =
      df.coalesce(1).sortWithinPartitions(cols: _*)
  }
}
