package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text analysis operators over the `documents` table.
  *
  * The flagship computation mirrors the reference's word count
  * (`/root/reference/main.go:192-197`): Go `strings.Fields` splits on runs
  * of Unicode whitespace and drops empty tokens ("" -> 0 words). Java's
  * `\s` is ASCII-only, so we use an explicit Unicode-whitespace class to
  * keep `strings.Fields` parity (SURVEY.md §7.4).
  */
object TextOps {

  /** Unicode whitespace run — parity with Go strings.Fields / unicode.IsSpace. */
  val WsRe = "[\\s\\u0085\\u00A0\\u1680\\u2000-\\u200A\\u2028\\u2029\\u202F\\u205F\\u3000]+"

  /** Number of whitespace-separated words in `c` (empty string -> 0). */
  def wordCount(c: Column): Column =
    size(filter(split(c, WsRe), t => t =!= lit(""))).cast("long")

  /** Flagship: per-document word count, reference `processText` semantics. */
  def wordCountQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), wordCount(col("text")).as("text_count"))
      .orderBy("doc_id")

  val wordCountOracle: String =
    """SELECT doc_id,
      |       CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS text_count
      |FROM documents ORDER BY doc_id""".stripMargin
}
