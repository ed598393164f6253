package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.EventOps

/** Top-level so Spark can construct an Encoder without an outer scope. */
case class Ev(ts: Timestamp, event_type: String, value: Double, user_id: Long)

/** True Structured-Streaming behavior (SURVEY.md §5.2 item 4): the same
  * EventOps transforms that pass the batch oracle, driven incrementally
  * through MemoryStream, plus watermark/late-data and custom state.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("narrow pipeline ops apply to a stream unchanged (repetitionSignals)") {
    implicit val sq = spark.sqlContext
    // the quality signals are per-row/narrow, so the SAME GraftOps call
    // that passes the batch oracle runs on an unbounded stream with no
    // watermark or output-mode ceremony — the batch/stream unification
    // Structured Streaming promises, demonstrated on the library facade
    val mem = MemoryStream[(Long, String)]
    val q = GraftOps.repetitionSignals(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("rs_out")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, "a b a b"), (2L, "solo"))
    q.processAllAvailable()
    q.stop()
    // doc 2 has one token: filtered out (needs >= 2 for a bigram); all
    // four signal values of doc 1 pinned exactly (the fused native pass
    // must match the hand computation: 4 tokens, top count 2, bigrams
    // "a b"/"b a"/"a b" -> 2 distinct of 3, all words 1 char)
    val rows = spark.table("rs_out").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.toSeq == Seq((1L, 4L, 0.5, 1.0 - 2.0 / 3.0, 1.0)))
  }

  test("text→vector projection applies to a stream unchanged (embedFromText)") {
    implicit val sq = spark.sqlContext
    // the embedding derivation is one narrow map-only pass, so the SAME
    // facade call that passes q_embed_from_text's oracle projects an
    // unbounded stream of raw documents into vectors — the input side of
    // a streaming embed→ANN-admission loop (the ANN half is spec'd over
    // the fixture vectors in the admission test below)
    val mem = MemoryStream[(Long, String)]
    val q = GraftOps.embedFromText(mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("emb_stream_out")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, "alpha beta"), (2L, ""))
    q.processAllAvailable()
    mem.addData((3L, "alpha beta")) // later batch, same text
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("emb_stream_out").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L))
    assert(rows(1L).length == 64)
    // empty text → the zero vector (the documented no-trigram contract)
    assert(rows(2L).forall(_ == 0.0f))
    // deterministic: identical text in a different micro-batch projects
    // to the identical vector, and it is L2-normalized
    assert(rows(3L) == rows(1L))
    val n2 = rows(1L).map(v => v.toDouble * v).sum
    assert(math.abs(n2 - 1.0) < 1e-6, s"squared norm $n2")
  }

  test("image→vector projection applies to a stream unchanged (imageEmbed)") {
    implicit val sq = spark.sqlContext
    // the image projection is the same narrow map-only shape as
    // embedFromText (decode + block sums + normalize, all per-row), so
    // the SAME facade call that passes q_image_embed's oracle projects
    // an unbounded stream of (id, image bytes) — the ingest side of a
    // streaming multimodal dedup/ANN-admission loop
    val mem = MemoryStream[(Long, Array[Byte])]
    val q = GraftOps.imageEmbed(mem.toDF().toDF("doc_id", "content"))
      .writeStream.format("memory").queryName("img_emb_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (10L, graft.ocr.MultimodalOps.quadPatternPng(10)),
      (2L, Array[Byte](9, 9, 9))) // undecodable
    q.processAllAvailable()
    mem.addData((99L, graft.ocr.MultimodalOps.quadPatternPng(10))) // same image, later batch
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("img_emb_out").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getSeq[Float](1))).toMap
    assert(rows.keySet == Set(10L, 2L, 99L))
    assert(rows(2L) == null, "undecodable bytes must embed to NULL in-stream too")
    // deterministic across micro-batches, 64 dims, unit norm
    assert(rows(99L) == rows(10L))
    assert(rows(10L).length == 64)
    val n2 = rows(10L).map(v => v.toDouble * v).sum
    assert(math.abs(n2 - 1.0) < 1e-6, s"squared norm $n2")
  }

  test("chunking applies to a stream unchanged (chunkDocuments)") {
    implicit val sq = spark.sqlContext
    // chunking is fully narrow (tokenize → offset explode → slice), so
    // the same facade call that passes the batch oracle chunks an
    // unbounded stream with no watermark/output-mode ceremony — the
    // shape of a streaming RAG-ingest pipeline
    val mem = MemoryStream[(Long, String)]
    val q = GraftOps.chunkDocuments(
      mem.toDF().toDF("doc_id", "text"), window = 3, stride = 2)
      .writeStream.format("memory").queryName("chunk_out")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, "a b c d e"), (2L, "x"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("chunk_out").orderBy("doc_id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.toSeq == Seq(
      (1L, 0L, 0L, 3L, "a b c"),
      (1L, 1L, 2L, 3L, "c d e"),
      (1L, 2L, 4L, 1L, "e"),
      (2L, 0L, 0L, 1L, "x")))
  }

  test("rule filters apply to a stream unchanged (gopherRules + c4Clean)") {
    implicit val sq = spark.sqlContext
    // both rule batteries are single fused codegen passes, so the same
    // facade calls that pass the batch oracle gate an unbounded
    // document stream — the shape of an ingest-time quality filter
    val mem = MemoryStream[(Long, String)]
    val g = GraftOps.gopherRules(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_words", "r_stop", "keep")
      .writeStream.format("memory").queryName("gopher_out")
      .outputMode(OutputMode.Append).start()
    val c = GraftOps.c4Clean(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_lines", "n_kept", "keep", "cleaned")
      .writeStream.format("memory").queryName("c4_out")
      .outputMode(OutputMode.Append).start()
    val longDoc = (1 to 60).map(i => s"word$i").mkString(" ") + " the a of"
    mem.addData((1L, longDoc), (2L, "good line stays here.\nshort"))
    g.processAllAvailable(); c.processAllAvailable()
    g.stop(); c.stop()
    val gr = spark.table("gopher_out").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3)))
    assert(gr.toSeq == Seq((1L, 63L, true, true), (2L, 5L, false, false)))
    val cr = spark.table("c4_out").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3),
        r.getString(4)))
    assert(cr.toSeq == Seq(
      (1L, 1L, 0L, false, ""),
      (2L, 2L, 1L, true, "good line stays here.")))
  }

  test("normalization and URL gate apply to a stream unchanged") {
    implicit val sq = spark.sqlContext
    // both are stateless narrow projections, so the same calls that
    // pass the batch oracle gate an unbounded ingest stream
    val mem = MemoryStream[(Long, String, String)]
    val base = mem.toDF().toDF("doc_id", "url", "text")
    val q = ops.CurationOps
      .urlBlocklistGate(base, "url", Seq("spam.example"), "/tracker/")
      .select(col("doc_id"), col("status"),
        ops.CurationOps.normalizeText(col("text")).as(("norm")))
      .writeStream.format("memory").queryName("norm_gate_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      (1L, "https://cdn.spam.example/a", "x ‘y’  z"),
      (2L, "https://ok.example/page/1", "plain text"))
    q.processAllAvailable(); q.stop()
    val rows = spark.table("norm_gate_out").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, "blocked_domain", "x 'y' z"),
      (2L, "kept", "plain text")))
  }

  test("PII scrubbing applies to a stream unchanged (piiScrub)") {
    implicit val sq = spark.sqlContext
    // redaction at ingest time — the narrow regex pass runs on an
    // unbounded stream exactly as it passes the batch oracle
    val mem = MemoryStream[(Long, String)]
    val q = GraftOps.piiScrub(mem.toDF().toDF("doc_id", "text"))
      .select("doc_id", "n_emails", "scrubbed")
      .writeStream.format("memory").queryName("pii_out")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, "mail me at a@b.co now"), (2L, "clean text"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("pii_out").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(rows.toSeq == Seq(
      (1L, 1, "mail me at [EMAIL] now"), (2L, 0, "clean text")))
  }

  test("tumblingAgg over a stream == same transform over the batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val rows = Seq(
      Ev(ts("2024-01-01 10:05:00"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 10:55:00"), "view", 2.0, 2L),
      Ev(ts("2024-01-01 11:05:00"), "click", 4.0, 1L))
    val q = EventOps.tumblingAgg(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode(OutputMode.Complete).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tumbling_out")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    val batch = EventOps.tumblingAgg(rows.toDF(), "1 hour")
      .orderBy("window_start", "event_type")
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
    assert(streamed.size == 2)
    assert(streamed.head(2) == 2L) // two views in the 10:00 window
  }

  test("watermark drops late rows in append mode") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val agg = mem.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_timestamp(col("window.start")).as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("wm_out")
      .outputMode(OutputMode.Append).start()
    // batch 1: two on-time events; watermark advances to 11:00 - 10m = 10:50
    mem.addData(
      Ev(ts("2024-01-01 10:00:01"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 11:00:00"), "view", 1.0, 1L))
    q.processAllAvailable()
    // batch 2: a LATE event for the (closed) 10:00 window — must be dropped
    mem.addData(Ev(ts("2024-01-01 10:00:02"), "view", 1.0, 1L))
    q.processAllAvailable()
    // batch 3: push watermark far ahead so every window closes and emits
    mem.addData(Ev(ts("2024-01-01 12:00:00"), "view", 1.0, 1L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_out").orderBy("ws").collect()
    val w10 = out.filter(_.getLong(0) == ts("2024-01-01 10:00:00").getTime / 1000)
    assert(w10.length == 1)
    assert(w10.head.getLong(2) == 1L) // late duplicate NOT counted
  }

  test("dropDuplicatesWithinWatermark dedups keyed events across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dedup = mem.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
    val q = dedup.writeStream.format("memory").queryName("dd_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "view", 1.0, 1L))
    q.processAllAvailable()
    mem.addData(
      Ev(ts("2024-01-01 10:05:00"), "view", 2.0, 1L), // dup key within watermark
      Ev(ts("2024-01-01 10:06:00"), "click", 3.0, 1L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dd_out").collect()
    assert(out.length == 2) // second "view" for user 1 suppressed
  }

  test("flatMapGroupsWithState: running per-user event counter (custom state)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val counted = mem.toDS()
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[Ev], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + evs.size
          state.update(next)
          Iterator((user, next))
      }
    val q = counted.toDF("user_id", "running_n")
      .writeStream.format("memory").queryName("st_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(Ev(ts("2024-01-01 10:00:00"), "view", 1.0, 7L))
    q.processAllAvailable()
    mem.addData(
      Ev(ts("2024-01-01 10:01:00"), "view", 1.0, 7L),
      Ev(ts("2024-01-01 10:02:00"), "view", 1.0, 8L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("st_out").orderBy("running_n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.contains((7L, 1L))) // after batch 1
    assert(out.contains((7L, 2L))) // state carried across batches
    assert(out.contains((8L, 1L)))
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dim = Seq(("view", "browse"), ("click", "engage"), ("purchase", "convert"))
      .toDF("event_type", "category")
    val q = mem.toDF().join(dim, "event_type")
      .select("event_type", "category", "user_id")
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(
      Ev(ts("2024-01-01 10:00:00"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 10:01:00"), "purchase", 5.0, 1L),
      Ev(ts("2024-01-01 10:02:00"), "error", 0.0, 2L)) // no dim row -> dropped by inner join
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ss_join_out").orderBy("category").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("browse", "convert"))
  }

  test("stream-stream join: purchases matched to prior views within the time bound") {
    implicit val sq = spark.sqlContext
    val views = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val v = views.toDF().selectExpr("user_id AS v_user", "ts AS v_ts")
      .withWatermark("v_ts", "1 hour")
    val b = buys.toDF().selectExpr("user_id AS b_user", "ts AS b_ts")
      .withWatermark("b_ts", "1 hour")
    val joined = b.join(
      v,
      expr("b_user = v_user AND v_ts <= b_ts AND v_ts >= b_ts - INTERVAL 30 MINUTES"))
    val q = joined.writeStream.format("memory").queryName("ss2_join_out")
      .outputMode(OutputMode.Append).start()
    views.addData(
      Ev(ts("2024-01-01 10:00:00"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 08:00:00"), "view", 1.0, 2L)) // too old for user 2's buy
    buys.addData(
      Ev(ts("2024-01-01 10:20:00"), "purchase", 9.0, 1L),
      Ev(ts("2024-01-01 10:20:00"), "purchase", 9.0, 2L))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("ss2_join_out").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("b_user") == 1L)
  }

  test("foreachBatch sink: stream lands as parquet files (R2's durable-sink analog)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val dir = java.nio.file.Files.createTempDirectory("graft_fb").toFile.getAbsolutePath
    val q = mem.toDF().writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        batch.write.mode("append").parquet(s"$dir/batch")
      }
      .start()
    mem.addData(
      Ev(ts("2024-01-01 10:00:00"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 10:01:00"), "click", 2.0, 2L))
    q.processAllAvailable()
    mem.addData(Ev(ts("2024-01-01 10:02:00"), "view", 3.0, 3L))
    q.processAllAvailable()
    q.stop()
    assert(spark.read.parquet(s"$dir/batch").count() == 3)
  }

  test("checkpoint recovery: failed-before-commit batch replays exactly-once " +
    "through an idempotent foreachBatch sink") {
    implicit val sq = spark.sqlContext
    // The durability half of R2's analog: a query that dies AFTER writing
    // its offsets but BEFORE committing the batch must, on restart from
    // the checkpoint, re-execute that batch — and an idempotent sink
    // (overwrite-by-batch-id) must absorb the replay so the effect is
    // exactly-once. Simulated deterministically by deleting the newest
    // entry from the checkpoint's commit log between runs (exactly the
    // on-disk state a mid-batch crash leaves).
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("graft_ckpt_out").toFile.getAbsolutePath
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[Ev]
    def start() = EventOps.tumblingAgg(mem.toDF(), "1 hour")
      .writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seenBatches.synchronized { seenBatches += id }
        // idempotent: re-delivery of batch N lands on the same path
        batch.write.mode("overwrite").parquet(s"$out/$id")
      }
      .start()
    val q1 = start()
    mem.addData(
      Ev(ts("2024-01-01 10:05:00"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 10:10:00"), "view", 2.0, 2L))
    q1.processAllAvailable()
    q1.stop()
    q1.awaitTermination()
    // stop() tears the query down asynchronously w.r.t. the manager's
    // per-checkpoint registry — wait until it deregisters, or the
    // restart trips the concurrent-checkpoint-use guard
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.exists(_.id == q1.id) &&
      System.nanoTime() < deadline) Thread.sleep(50)
    // crash simulation: offsets/0 exists, commits/0 vanishes (the local
    // ChecksumFs also keeps a hidden .0.crc sidecar — remove it too, or
    // the replay's commit rename trips over the stale checksum)
    val lastCommit = new java.io.File(s"$ckpt/commits/0")
    assert(lastCommit.exists, "expected commit log entry for batch 0")
    assert(lastCommit.delete())
    new java.io.File(s"$ckpt/commits/.0.crc").delete()
    val q2 = start()
    q2.processAllAvailable() // replays batch 0 from the offset log
    mem.addData(Ev(ts("2024-01-01 10:20:00"), "click", 4.0, 1L))
    q2.processAllAvailable()
    q2.stop()
    // batch 0 really ran twice (the at-least-once half)...
    assert(seenBatches.count(_ == 0L) == 2, s"batches seen: $seenBatches")
    // ...and the sink state is exactly-once: batch 0's dir holds the
    // pre-crash aggregate once, and the final batch holds the aggregate
    // over ALL events — the groupBy state survived the restart
    assert(spark.read.parquet(s"$out/0")
      .agg(sum("n_events")).collect().head.getLong(0) == 2L)
    val finalId = seenBatches.max
    val fin = spark.read.parquet(s"$out/$finalId")
      .orderBy("event_type").collect()
    assert(fin.map(_.getAs[Long]("n_events")).sum == 3L)
    assert(fin.map(_.getAs[String]("event_type")).toSeq.contains("click"))
  }

  test("streaming fingerprint dedup: whitespace-variant docs collapse across batches") {
    implicit val sq = spark.sqlContext
    // The dedup surface composed with Structured Streaming: the SAME
    // GraftOps.fingerprint expression the batch oracle verifies keys a
    // dropDuplicatesWithinWatermark — so a near-exact duplicate arriving
    // in a LATER micro-batch is still suppressed (the streaming half of
    // the corpus-curation recipe).
    val mem = MemoryStream[(Long, java.sql.Timestamp, String)]
    val dedup = mem.toDF().toDF("doc_id", "ts", "text")
      .withColumn("fp", GraftOps.fingerprint(col("text")))
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("fp")
    val q = dedup.writeStream.format("memory").queryName("fp_dedup_out")
      .outputMode(OutputMode.Append).start()
    mem.addData((1L, ts("2024-01-01 10:00:00"), "alpha  beta gamma"))
    q.processAllAvailable()
    mem.addData(
      (2L, ts("2024-01-01 10:10:00"), "alpha beta\tgamma"), // ws-variant dup
      (3L, ts("2024-01-01 10:11:00"), "something else entirely"))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("fp_dedup_out").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("streaming token-id emission: per-micro-batch ids == batch (narrow encode)") {
    implicit val sq = spark.sqlContext
    // The token-ID emission is ONE narrow codegen pass (trained model
    // rides the expression), so it applies to an unbounded stream
    // unchanged — the streaming half of the tokenize→ids step. The
    // tokenizer is trained ONCE on the reference corpus (model state,
    // like the perplexity gate's LM) and each arriving micro-batch
    // encodes against it.
    val docs = Tables.documents(spark, sfDir).limit(30)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tok = graft.ops.TrainPrepOps.bpeTokenizer(
      Tables.documents(spark, sfDir), graft.ops.TrainPrepOps.TokRounds)
    val mem = MemoryStream[(Long, String, String)]
    val ids = mem.toDF().toDF("doc_id", "source", "text")
      .select(col("doc_id"),
        graft.functions.GraftFunctions.bpe_encode_ids(
          graft.ops.TextOps.words(col("text")), tok.encoder).as("ids"))
    val q = ids.writeStream.format("memory").queryName("tok_ids_out")
      .outputMode(OutputMode.Append).start()
    mem.addData(docs.take(10).toSeq: _*)
    q.processAllAvailable()
    mem.addData(docs.drop(10).toSeq: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("tok_ids_out").collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    // batch side over the SAME full-corpus-trained tokenizer (tokenIds
    // trains on the frame it is given — a limit(30) frame would train
    // a different, 30-doc tokenizer)
    val batch = graft.GraftOps.tokenIds(
      Tables.documents(spark, sfDir), graft.ops.TrainPrepOps.TokRounds)
      .filter(col("doc_id").isin(docs.map(_._1).toSeq: _*))
      .collect().map(r => (r.getLong(0), r.getSeq[Int](2))).toMap
    assert(streamed == batch && streamed.size == 30)
    assert(streamed.values.forall(_.forall(_ >= 0)), "no UNK on the training corpus")
  }

  test("streaming id-shard emission: exactly-once shard commit across " +
    "3 batches incl. checkpoint replay") {
    implicit val sq = spark.sqlContext
    // The tokenize→pack→write capstone's streaming sibling: each
    // micro-batch packs against the reference-trained tokenizer (fixed
    // model state) and commits ONE shard dir per batch id via temp +
    // atomic rename. The replay half: delete the checkpoint's newest
    // commit-log entry (the on-disk state of a crash between sink
    // commit and checkpoint commit), restart, and assert the replayed
    // delivery is absorbed — same three shards, byte-identical content,
    // no stale temp dirs.
    val docs = Tables.documents(spark, sfDir).limit(30)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tok = graft.ops.TrainPrepOps.bpeTokenizer(
      Tables.documents(spark, sfDir), graft.ops.TrainPrepOps.TokRounds)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_shard_ckpt")
      .toFile.getAbsolutePath
    val out = java.nio.file.Files.createTempDirectory("graft_shard_out")
      .toFile.getAbsolutePath
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String, String)]
    def start() = mem.toDF().toDF("doc_id", "source", "text").writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.synchronized { seen += id }
        graft.ops.TrainPrepOps.idShardBatchCommit(tok, out, seqLen = 16)(b, id)
      }
      .start()
    val q1 = start()
    mem.addData(docs.take(10).toSeq: _*)
    q1.processAllAvailable()
    mem.addData(docs.slice(10, 20).toSeq: _*)
    q1.processAllAvailable()
    q1.stop()
    q1.awaitTermination()
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    while (spark.streams.active.exists(_.id == q1.id) &&
      System.nanoTime() < deadline) Thread.sleep(50)
    // crash simulation: batch 1's sink commit survived, its checkpoint
    // commit didn't (ChecksumFs keeps a .crc sidecar — remove it too)
    val lastCommit = new java.io.File(s"$ckpt/commits/1")
    assert(lastCommit.exists, "expected commit log entry for batch 1")
    assert(lastCommit.delete())
    new java.io.File(s"$ckpt/commits/.1.crc").delete()
    val q2 = start()
    q2.processAllAvailable() // replays batch 1
    mem.addData(docs.drop(20).toSeq: _*)
    q2.processAllAvailable()
    q2.stop()
    // the at-least-once half: batch 1 really was delivered twice
    assert(seen.count(_ == 1L) == 2, s"batches seen: $seen")
    // the exactly-once half: three shards, no temp debris
    val entries = new java.io.File(out).listFiles.map(_.getName)
    assert(entries.filter(_.startsWith("shard-")).sorted.toSeq ==
      Seq("shard-00000", "shard-00001", "shard-00002"), entries.toSeq)
    assert(!entries.exists(_.startsWith(".tmp-")), entries.toSeq)
    // shard content == the batch pack of exactly that micro-batch's rows
    def expected(rows: Seq[(Long, String, String)]) =
      graft.ops.TrainPrepOps.packTokenIdsWith(
        rows.toDF("doc_id", "source", "text"), tok, seqLen = 16)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2))).toSet
    def got(i: Int) = spark.read.parquet(f"$out/shard-$i%05d").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Int](2))).toSet
    assert(got(0) == expected(docs.take(10).toSeq))
    assert(got(1) == expected(docs.slice(10, 20).toSeq))
    assert(got(2) == expected(docs.drop(20).toSeq))
    // every published shard carries its commit marker (created only
    // after the publishing rename returned — the object-store-safe
    // committed? signal; r15 ADVICE)
    (0 to 2).foreach { i =>
      assert(new java.io.File(f"$out/shard-$i%05d/_GRAFT_COMMITTED").exists,
        s"shard $i missing its commit marker")
    }
    // torn-publish recovery: a shard dir WITHOUT its marker (the state
    // a crash mid-copy+delete rename leaves on an object store) must be
    // treated as NOT committed — deleted and rebuilt whole on replay,
    // never silently accepted with missing rows
    val shard2 = new java.io.File(f"$out/shard-00002")
    assert(new java.io.File(shard2, "_GRAFT_COMMITTED").delete())
    val part = shard2.listFiles.filter(_.getName.startsWith("part-")).head
    assert(part.delete()) // the torn half: data missing, marker missing
    graft.ops.TrainPrepOps.idShardBatchCommit(tok, out, seqLen = 16)(
      docs.drop(20).toSeq.toDF("doc_id", "source", "text"), 2L)
    assert(new java.io.File(shard2, "_GRAFT_COMMITTED").exists)
    assert(got(2) == expected(docs.drop(20).toSeq),
      "torn publish was not rebuilt whole")
  }

  test("streaming session windows match the batch oracle emulation") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val rows = Seq(
      Ev(ts("2024-01-01 10:00:00"), "view", 1.0, 1L),
      Ev(ts("2024-01-01 10:03:00"), "view", 2.0, 1L),  // same session (< 5 min gap)
      Ev(ts("2024-01-01 10:30:00"), "view", 4.0, 1L))  // new session
    val q = EventOps.sessionAgg(
      mem.toDF().withWatermark("ts", "10 minutes"), "5 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete).start()
    mem.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("sess_out").orderBy("session_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Long]("session_end") - out(0).getAs[Long]("session_start") == 480L) // 3 min span + 5 min gap
    assert(out(1).getAs[Long]("n_events") == 1L)
  }

  test("streaming source-mix: per-source token budget enforced across 3 batches") {
    implicit val sq = spark.sqlContext
    // The streaming sibling of q_source_mix: the batch operator derives
    // keep RATES from full-corpus totals; a stream has no totals, so the
    // budget rides typed keyed state (transformWithState / RocksDB) as a
    // running kept-token count per source — admission is greedy and the
    // state survives across micro-batches.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val budget = 100L
      val mem = MemoryStream[ops.MixDoc]
      val q = ops.StreamingMix.sourceBudget(mem.toDS(), budget)
        .toDF().writeStream.format("memory").queryName("mix_out")
        .outputMode(OutputMode.Append).start()
      // batch 1: web uses 70 of 100; books uses 90 of 100
      mem.addData(
        ops.MixDoc("web", 1L, 40L), ops.MixDoc("web", 2L, 30L),
        ops.MixDoc("books", 10L, 90L))
      q.processAllAvailable()
      // batch 2: web doc of 40 would overflow (70+40>100) -> dropped,
      // but the later 25 still fits (greedy); books 20 overflows -> dropped
      mem.addData(
        ops.MixDoc("web", 3L, 40L), ops.MixDoc("web", 4L, 25L),
        ops.MixDoc("books", 11L, 20L))
      q.processAllAvailable()
      // batch 3: web is at 95 — only <=5 fits; books admits an exact fill
      mem.addData(
        ops.MixDoc("web", 5L, 6L), ops.MixDoc("web", 6L, 5L),
        ops.MixDoc("books", 12L, 10L))
      q.processAllAvailable()
      q.stop()
      val kept = spark.table("mix_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(kept == Seq(
        ("books", 10L, 90L, 90L), ("books", 12L, 10L, 100L),
        ("web", 1L, 40L, 40L), ("web", 2L, 30L, 70L),
        ("web", 4L, 25L, 95L), ("web", 6L, 5L, 100L)))
      // the invariant the operator exists for: kept tokens track the
      // budget — never exceed it, and reach it when supply allows
      val bySource = kept.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      assert(bySource.values.forall(_ <= budget))
      assert(bySource == Map("web" -> 100L, "books" -> 100L))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("weighted streaming source-mix: per-source budgets enforced independently across 3 batches") {
    implicit val sq = spark.sqlContext
    // The streaming sibling of q_source_mix_weighted: each source gets
    // its OWN token budget from a map (web 100, books 40 here), and a
    // source absent from the map admits nothing — the weight-0 contract
    // of the batch operator, enforced incrementally via keyed state.
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val budgets = Map("web" -> 100L, "books" -> 40L)
      val mem = MemoryStream[ops.MixDoc]
      val q = ops.StreamingMix.sourceBudgetWeighted(mem.toDS(), budgets)
        .toDF().writeStream.format("memory").queryName("wmix_out")
        .outputMode(OutputMode.Append).start()
      // batch 1: web admits 70 of 100; books admits 30 of 40 — the SAME
      // 30-token doc web also gets, proving the budgets differ per key;
      // "forum" is not in the map -> budget 0, admits nothing ever
      mem.addData(
        ops.MixDoc("web", 1L, 40L), ops.MixDoc("web", 2L, 30L),
        ops.MixDoc("books", 10L, 30L), ops.MixDoc("forum", 20L, 1L))
      q.processAllAvailable()
      // batch 2: web's 25 fits (70+25<=100); books' 25 would overflow
      // (30+25>40) -> dropped — identical doc size, opposite outcome
      mem.addData(
        ops.MixDoc("web", 3L, 25L), ops.MixDoc("books", 11L, 25L),
        ops.MixDoc("forum", 21L, 1L))
      q.processAllAvailable()
      // batch 3: web exact-fills its last 5; books admits its last 10;
      // the budget-1 doc of the unknown source still admits nothing
      mem.addData(
        ops.MixDoc("web", 4L, 5L), ops.MixDoc("books", 12L, 10L),
        ops.MixDoc("forum", 22L, 1L))
      q.processAllAvailable()
      q.stop()
      val kept = spark.table("wmix_out")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(x => (x._1, x._2)).toSeq
      assert(kept == Seq(
        ("books", 10L, 30L, 30L), ("books", 12L, 10L, 40L),
        ("web", 1L, 40L, 40L), ("web", 2L, 30L, 70L),
        ("web", 3L, 25L, 95L), ("web", 4L, 5L, 100L)))
      val bySource = kept.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      assert(bySource == Map("web" -> 100L, "books" -> 40L))
      assert(!kept.exists(_._1 == "forum"), "unknown source must admit nothing")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming perplexity gate: foreachBatch scores against a refreshed broadcast LM") {
    implicit val sq = spark.sqlContext
    import ops.PipelineOps
    // The pinned contract from FilterOps.perplexityFilter's scaladoc —
    // the ONE curation operator whose batch form is corpus-relative (LM
    // probabilities + decile cutoffs are corpus statistics): train the
    // LM on a reference corpus as model state, score each micro-batch
    // against the BROADCAST table inside foreachBatch, gate on a frozen
    // cutoff, and refresh by retraining + swapping the reference the
    // closure reads — no stream restart.
    val ref = Seq(
      (100L, "the cat sat"), (101L, "the cat ran")).toDF("doc_id", "text")
    // (0) self-scoring parity: scoring a corpus against its own trained
    // table reproduces the batch operator bit-for-bit — the guarantee
    // that the streaming gate scores on the SAME scale the frozen
    // batch-trained cutoff was computed on
    val viaLm = PipelineOps.scoreBigramLm(ref, PipelineOps.bigramLmTable(ref))
      .orderBy("doc_id").collect().toSeq
    val viaBatch = PipelineOps.bigramLogProb(ref)
      .orderBy("doc_id").collect().toSeq
    assert(viaLm == viaBatch, "LM-table scoring drifted from the batch scorer")

    @volatile var lm = PipelineOps.bigramLmTable(ref).localCheckpoint()
    val cutoff = -0.5 // frozen policy cutoff (model state, like the LM)
    val scored = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double, Boolean)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = PipelineOps.scoreBigramLm(batch, lm)
          .withColumn("keep", col("avg_logprob") >= cutoff)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        scored.synchronized { scored ++= rows; () }
      }
      .start()
    // batch 1 against the reference LM: "the cat" has lp ln(1)=0,
    // "cat sat" lp ln(1/2); doc 1 scores (0 + ln .5)/2 >= -0.5 -> keep;
    // doc 2's only bigram is LM-unknown -> NO score row (the documented
    // no-signal policy hook)
    mem.addData((1L, "the cat sat"), (2L, "zz qq"))
    q.processAllAvailable()
    // expected avg = round6((0 + round6(ln 1/2)) / 2) = round6(-0.3465735)
    // = -0.346573 under round6's floor(x*1e6 + 0.5) half-UP (toward +inf)
    assert(scored.synchronized(scored.toSeq) == Seq((1L, 2L, -0.346573, true)))
    // REFRESH: retrain on reference + the new-domain text and swap the
    // reference the closure reads — next batch scores under the new LM
    lm = PipelineOps.bigramLmTable(
      ref.union(Seq((102L, "zz qq")).toDF("doc_id", "text"))).localCheckpoint()
    mem.addData((3L, "zz qq"))
    q.processAllAvailable()
    q.stop()
    val after = scored.synchronized(scored.toSeq)
    // "zz qq" is now LM-known with lp ln(1)=0 -> avg 0, kept
    assert(after.size == 2 && after(1) == ((3L, 1L, 0.0, true)),
      s"refreshed LM not picked up: $after")
  }

  test("streaming trigram gate: foreachBatch scores against a refreshed backoff LM") {
    implicit val sq = spark.sqlContext
    import ops.TrainPrepOps
    // The trigram sibling of the streaming perplexity gate above —
    // scoreTrigramLm's scaladoc pins it as the foreachBatch scoring step
    // of a STREAMING gate: train on a reference corpus as model state,
    // score each micro-batch against the broadcast/literal model inside
    // foreachBatch, gate on a frozen cutoff, refresh by retraining and
    // swapping the model the closure reads — no stream restart.
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ref = Seq((0L, "a b c a b d"), (2L, "a b c")).toDF("doc_id", "text")
    @volatile var lm = TrainPrepOps.trigramBackoffLm(ref)
    val cutoff = -2.0 // frozen policy cutoff (model state, like the LM)
    val scored = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double, Boolean)]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = TrainPrepOps.scoreTrigramLm(batch, lm)
          .withColumn("keep", col("avg_logprob") >= cutoff)
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        scored.synchronized { scored ++= rows; () }
      }
      .start()
    // batch 1: doc 1 grounds 3 of 4 positions (known trigram, unigram
    // backoff, bigram backoff — the TrainPrepOpsSpec example); doc 9 is
    // out-of-vocabulary at every order -> NO row (no-signal policy)
    mem.addData((1L, "a b c x b d"), (9L, "z z z z"))
    q.processAllAvailable()
    val exp1 = r6((r6(math.log(2.0 / 3)) +
      r6(math.log(0.16 * (3.0 / 9))) +
      r6(math.log(0.4 * (1.0 / 3)))) / 3)
    assert(scored.synchronized(scored.toSeq) ==
      Seq((1L, 4L, 3L, exp1, exp1 >= cutoff)))
    // REFRESH: retrain with the new-domain text and swap the model the
    // closure reads — the next batch scores under the new LM
    lm = TrainPrepOps.trigramBackoffLm(
      ref.union(Seq((4L, "z z z z")).toDF("doc_id", "text")))
    mem.addData((10L, "z z z"))
    q.processAllAvailable()
    q.stop()
    val after = scored.synchronized(scored.toSeq)
    // "z z z" is now a known trigram: lp = ln(c3(z,z,z)/c2(z,z)) = ln(2/2)...
    // c3(z z z) = 2 (two windows in "z z z z"), c2(z z) = 3 -> ln(2/3)
    val exp2 = r6(r6(math.log(2.0 / 3)) / 1)
    assert(after.size == 2 && after(1) == ((10L, 1L, 1L, exp2, true)),
      s"refreshed LM not picked up: $after")
  }

  test("streaming dedup admission: per-batch index probe + index maintenance") {
    implicit val sq = spark.sqlContext
    import ops.DedupOps
    // The streaming form of incrementalAdmission: each micro-batch is
    // admitted against the stored LSH index (band probe + signature
    // verify), and the ADMITTED docs' index rows are appended before
    // the next batch — so later batches dedup against earlier
    // admissions, not just the original corpus. Index state lives as a
    // checkpointed frame the closure swaps, the same
    // model-state-refresh shape as the streaming LM gate above.
    val textA = "alpha beta gamma delta epsilon zeta"
    val textB = "one two three four five six seven"
    val textC = "red orange yellow green blue indigo violet"
    val textD = "north south east west up down sideways"
    val corpus = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
    @volatile var index = DedupOps.lshIndex(corpus).localCheckpoint()
    val admitted = scala.collection.mutable.ArrayBuffer.empty[Long]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val adm = DedupOps.admitAgainstIndex(batch, index).localCheckpoint()
        index = index.union(DedupOps.lshIndex(adm)).localCheckpoint()
        admitted.synchronized {
          admitted ++= adm.collect().map(_.getLong(0)); () }
      }
      .start()
    // batch 1: doc 10 duplicates corpus doc 1 -> dropped; doc 11 fresh
    mem.addData((10L, textA), (11L, textC))
    q.processAllAvailable()
    assert(admitted.synchronized(admitted.toSet) == Set(11L))
    // batch 2: doc 20 duplicates the batch-1 ADMISSION (present only if
    // the index was maintained); doc 21 fresh; doc 22 duplicates 21
    // WITHIN the same batch — the dropped_batch arm: only 21 admits
    mem.addData((20L, textC), (21L, textD), (22L, textD))
    q.processAllAvailable()
    assert(admitted.synchronized(admitted.toSet) == Set(11L, 21L))
    // batch 3: one dup of a batch-2 admission, one dup of the original
    // corpus — nothing admitted
    mem.addData((30L, textD), (31L, textB))
    q.processAllAvailable()
    q.stop()
    assert(admitted.synchronized(admitted.toSet) == Set(11L, 21L))
  }

  test("streaming semantic admission: per-batch cell probe + index maintenance") {
    implicit val sq = spark.sqlContext
    import ops.MlOps
    // The streaming form of semanticAdmission (the embedding-space
    // sibling of the LSH admission stream above): the codebook trains
    // ONCE on the corpus — batches must not shape the cells they are
    // judged in — and per batch the stored cell index absorbs the
    // admitted vectors before the next batch, so later batches dedup
    // against earlier admissions. Index state lives as a checkpointed
    // frame the closure swaps (the model-state-refresh shape).
    def v(x: Float, y: Float, z: Float, w: Float) = Seq(x, y, z, w)
    val vA = v(1f, 0f, 0f, 0f); val vB = v(0f, 1f, 0f, 0f)
    val vC = v(0f, 0f, 1f, 0f); val vD = v(0f, 0f, 0f, 1f)
    val corpus = Seq((1L, vA), (2L, vB)).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val (cents, corpusIndex) = MlOps.semanticIndexState(corpus, k = 2, iters = 2)
    @volatile var index = corpusIndex.localCheckpoint()
    val status = scala.collection.mutable.Map.empty[Long, String]
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val typed = batch.select(col("vec_id"),
          col("embedding").cast("array<float>").as("embedding"))
        val adm = MlOps.semanticAdmitAgainst(cents, index, typed, 0.96)
          .localCheckpoint()
        index = index.union(MlOps.semanticIndexRows(cents,
          adm.filter(col("status") === "admitted")
            .select(col("vec_id"), col("embedding")))).localCheckpoint()
        adm.collect().foreach(r => status.synchronized {
          status(r.getLong(0)) = r.getString(2); () })
        ()
      }
      .start()
    // batch 1: 10 duplicates corpus vec A -> dropped_index; 11 fresh
    mem.addData((10L, vC), (11L, vA))
    q.processAllAvailable()
    assert(status.synchronized(status.toMap) ==
      Map(10L -> "admitted", 11L -> "dropped_index"))
    // batch 2: 20 duplicates the batch-1 ADMISSION (cross-batch index
    // maintenance); 21 fresh; 22 duplicates 21 WITHIN the batch
    // (dropped_batch: the smaller id 21 wins); 23 is zero-norm and must
    // admit (similar to nothing)
    mem.addData((20L, vC), (21L, vD), (22L, vD), (23L, v(0f, 0f, 0f, 0f)))
    q.processAllAvailable()
    assert(status.synchronized(status.toMap) == Map(
      10L -> "admitted", 11L -> "dropped_index",
      20L -> "dropped_index", 21L -> "admitted",
      22L -> "dropped_batch", 23L -> "admitted"))
    // batch 3: a dup of a batch-2 admission and a dup of the original
    // corpus -> nothing new admits
    mem.addData((30L, vD), (31L, vB))
    q.processAllAvailable()
    q.stop()
    assert(status.synchronized(status.toMap).view.filterKeys(_ >= 30L).toMap ==
      Map(30L -> "dropped_index", 31L -> "dropped_index"))
  }

  test("streaming line dedup: seen-digest state strips across batches (firstLineDedup recipe)") {
    implicit val sq = spark.sqlContext
    // The streaming form of firstLineDedup (its batch form is
    // corpus-relative: the winner is the GLOBAL first occurrence, so it
    // cannot run verbatim on an unbounded stream). Recipe: the batch
    // operator handles WITHIN-batch first occurrence; lines seen in
    // EARLIER batches are stripped by the boiler probe against the
    // accumulated digest state (a literal StrSet under the
    // incremental-dedup cap; past it, the stored digest table +
    // anti-join — q_dedup_incremental's discipline); then the surviving
    // lines' digests append to the state before the next batch.
    // Exactness: every line window is exactly nTok tokens (only a
    // document's final line may be short), so a rebuilt document
    // re-windows identically and the two-stage composition equals the
    // batch operator over the union — asserted below.
    val seen = new java.util.HashSet[String]()
    val got = scala.collection.mutable.Map.empty[Long, String]
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val within = ops.FilterOps.firstLineDedup(batch)
        val bc = spark.sparkContext.broadcast(
          new graft.functions.StrSet(new java.util.HashSet[String](seen)))
        val stripped = ops.FilterOps.boilerProbeFrame(
          within.select(col("doc_id"), col("cleaned").as("text")), bc, 4)
          .localCheckpoint()
        stripped.collect().foreach(r => got.synchronized {
          got(r.getLong(0)) = r.getString(3); () })
        stripped
          .select(explode(graft.functions.GraftFunctions.line_digest_seq(
            col("cleaned"), 4)).as("dg"))
          .distinct().collect().foreach(r => seen.add(r.getString(0)))
        ()
      }
      .start()
    // batch 1: doc 2's first line duplicates doc 1's; doc 2's tail is new
    mem.addData(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x y z w"))
    q.processAllAvailable()
    // batch 2: doc 3 repeats a batch-1 line (cross-batch strip) then a
    // fresh line; doc 4 repeats doc 3's fresh line WITHIN the batch
    mem.addData(
      (3L, "e f g h m n o p"),
      (4L, "m n o p q r s t"))
    q.processAllAvailable()
    // batch 3: entirely previously-seen lines -> survives empty
    mem.addData((5L, "x y z w q r s t"))
    q.processAllAvailable()
    q.stop()
    val union = Seq(
      (1L, "a b c d e f g h"), (2L, "a b c d x y z w"),
      (3L, "e f g h m n o p"), (4L, "m n o p q r s t"),
      (5L, "x y z w q r s t")).toDF("doc_id", "text")
    val batchForm = GraftOps.firstLineDedup(union)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got.synchronized(got.toMap) == batchForm)
    assert(batchForm(5L) == "", "batch-3 doc must survive fully stripped")
  }

  test("streaming ANN admission: cell probe + index append + retrain-and-swap") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // The similarity side of the streaming-admission story
    // (MlOps.searchAgainstIvfIndex): each micro-batch of new embeddings
    // is assigned to the STORED codebook and searches only its cell's
    // index rows; admitted batches append their index rows; a
    // retrain-and-swap step replaces codebook AND index (drift +
    // retention), and the next batch must observably probe the NEW
    // state. Every batch's values are asserted against a driver-side
    // brute-force mirror of the batch path (same argmin-cell, same
    // cosine, same round6).
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
    }
    def cellOf(e: Seq[Float], cents: Seq[(Long, Seq[Double])]): Long =
      cents.map { case (k, c) =>
        (e.zip(c).map { case (x, cc) =>
          (x.toDouble - cc) * (x.toDouble - cc) }.sum, k)
      }.min._2
    def centsOf(codebook: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Double])] =
      codebook.collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    def expectTop2(qid: Long, qe: Seq[Float], pool: Seq[(Long, Seq[Float])],
        cents: Seq[(Long, Seq[Double])]): Set[(Long, Long, Long, Double)] = {
      val cell = cellOf(qe, cents)
      pool.filter(v => v._1 != qid && cellOf(v._2, cents) == cell)
        .map(v => (qid, cell, v._1, r6(cos(qe, v._2))))
        .sortBy(-_._4).take(2).toSet
    }
    val corpusRows = Seq(
      0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f),
      2L -> Seq(0.9f, 0.1f), 3L -> Seq(0.1f, 0.9f))
    val corpus = corpusRows.toDF("vec_id", "embedding")
    @volatile var codebook = GraftOps.kmeansCentroids(corpus, k = 2, iters = 2)
      .localCheckpoint()
    @volatile var index = GraftOps.ivfIndex(corpus, codebook).localCheckpoint()
    val found = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val hits = GraftOps.searchAgainstIvfIndex(batch, codebook, index, topk = 2)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        found.synchronized { found ++= hits; () }
        // admit: later batches search earlier admissions too
        index = index.union(GraftOps.ivfIndex(batch, codebook)).localCheckpoint()
      }
      .start()
    val cents1 = centsOf(codebook)
    // batch 1: one query per cell; results = brute force over the
    // original corpus cells
    mem.addData((10L, Seq(0.8f, 0.2f)), (11L, Seq(0.2f, 0.8f)))
    q.processAllAvailable()
    val exp1 = expectTop2(10L, Seq(0.8f, 0.2f), corpusRows, cents1) ++
      expectTop2(11L, Seq(0.2f, 0.8f), corpusRows, cents1)
    assert(found.synchronized(found.toSet) == exp1, s"batch1: ${found.toSeq}")
    // batch 2: candidates must include the batch-1 ADMISSION (vec 10
    // lands in q20's cell and outranks vec 0 by cosine)
    val pool2 = corpusRows ++ Seq(10L -> Seq(0.8f, 0.2f), 11L -> Seq(0.2f, 0.8f))
    mem.addData((20L, Seq(0.85f, 0.15f)))
    q.processAllAvailable()
    val exp2 = expectTop2(20L, Seq(0.85f, 0.15f), pool2, cents1)
    assert(found.synchronized(found.toSet) == exp1 ++ exp2, s"batch2: ${found.toSeq}")
    assert(exp2.exists(_._3 == 10L), "sanity: the admitted vec must rank in top-2")
    // RETRAIN-AND-SWAP: retention drops the old corpus tail (vecs 2, 3)
    // — keep the seeds + every admission — and the codebook retrains on
    // the retained set; both swap atomically before the next batch
    val retained = Seq(0L -> Seq(1.0f, 0.0f), 1L -> Seq(0.0f, 1.0f)) ++
      Seq(10L -> Seq(0.8f, 0.2f), 11L -> Seq(0.2f, 0.8f), 20L -> Seq(0.85f, 0.15f))
    val retainedDf = retained.toDF("vec_id", "embedding")
    codebook = GraftOps.kmeansCentroids(retainedDf, k = 2, iters = 2).localCheckpoint()
    index = GraftOps.ivfIndex(retainedDf, codebook).localCheckpoint()
    val cents2 = centsOf(codebook)
    // batch 3: probes the NEW state — vec 2 would be a top-2 hit under
    // the old index (cos((0.9,0.05),(0.9,0.1)) outranks every retained
    // axis vector except vec 0), so its absence pins the swap
    mem.addData((30L, Seq(0.9f, 0.05f)))
    q.processAllAvailable()
    q.stop()
    val exp3 = expectTop2(30L, Seq(0.9f, 0.05f), retained, cents2)
    val all = found.synchronized(found.toSet)
    assert(all == exp1 ++ exp2 ++ exp3, s"batch3: ${found.toSeq}")
    assert(!all.exists(h => h._1 == 30L && h._3 == 2L),
      "vec 2 was dropped by retention — a hit means the old index survived the swap")
  }
}
