package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.StreamingOps
import graft.operators.StreamingOps.Ev

/** Drives the genuinely-streaming paths (watermarked window agg, stateful
  * meanvar) through MemoryStream and checks them against their batch twins.
  */
object StreamingSpec {
  case class SDoc(doc_id: Long, text: String, ts: Timestamp)
}

class StreamingSpec extends AnyFunSuite {
  import StreamingSpec.SDoc
  import TestSpark._

  private def mkEvents(): Seq[Ev] = {
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 200).map { i =>
      Ev(i.toLong, new Timestamp(t0 + i * 137000L), i % 7L,
        Seq("click", "view", "purchase")(i % 3), (i % 13) * 0.5)
    }
  }

  test("streaming tumbling-window counts match the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingOps.streamingTumbling(input.toDS())
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumble_out").start()
    try {
      input.addData(mkEvents())
      query.processAllAvailable()
      val streamed = spark.table("tumble_out")
        .select(col("wstart"), col("event_type"), col("cnt"))
        .collect().map(_.toString).sorted
      val batch = mkEvents().toDF()
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(batch))
      assert(streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming windowed PSI matches the batch twin and runs in ONE stateful op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = (0 until 10).map(b => (b + 1.0) / 55.0) // any positive shares
    val input = MemoryStream[Ev]
    val query = StreamingOps.streamingWindowedPsi(input.toDS(), ref, 0.0, 0.5)
      .writeStream.outputMode("complete")
      .format("memory").queryName("psi_out").start()
    try {
      input.addData(mkEvents())
      query.processAllAvailable()
      val streamed = spark.table("psi_out").collect().map(_.toString).sorted
      val batch = StreamingOps.windowedPsi(mkEvents().toDF(), ref, 0.0, 0.5)
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(batch) && streamed.nonEmpty)
    } finally query.stop()
  }

  test("streaming count-min grid matches the batch twin and never underestimates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingOps.streamingCms(input.toDS(), 4, 64)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_out").start()
    try {
      input.addData(mkEvents())
      query.processAllAvailable()
      val streamed = spark.table("cms_out").collect().map(_.toString).sorted
      val batch = StreamingOps.windowedCms(mkEvents().toDF(), col("user_id"),
        4, 64, "6 hours").collect().map(_.toString).sorted
      assert(streamed.sameElements(batch) && streamed.nonEmpty)
      // point-query property on the batch grid: est >= exact per user
      val grid = StreamingOps.windowedCms(mkEvents().toDF(), col("user_id"),
        4, 64, "6 hours")
      val cells = grid.collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)) -> r.getLong(3)).toMap
      val exact = mkEvents().toDF()
        .groupBy(window(col("ts"), "6 hours").as("w"), col("user_id"))
        .agg(count(lit(1)).as("c"))
        .select(col("w.start"), col("user_id").cast("string"), col("c")).collect()
      exact.foreach { r =>
        val est = (0 until 4).map { dd =>
          val b = java.lang.Long.parseLong(
            java.security.MessageDigest.getInstance("MD5")
              .digest(s"$dd:${r.getString(1)}".getBytes("UTF-8"))
              .take(4).map(x => f"$x%02x").mkString, 16) % 64
          cells((r.getTimestamp(0), dd, b))
        }.min
        assert(est >= r.getLong(2), s"CMS underestimated ${r.getString(1)}")
      }
    } finally query.stop()
  }

  test("streaming meanvar state matches single-pass batch moments") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingOps.streamingMeanVar(input.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("meanvar_out").start()
    try {
      // two micro-batches: state must merge across them
      val (first, second) = mkEvents().splitAt(120)
      input.addData(first)
      query.processAllAvailable()
      input.addData(second)
      query.processAllAvailable()
      // last update per key is the final state
      val finalRows = spark.table("meanvar_out")
        .groupBy(col("event_type"))
        .agg(max(struct(col("n"), col("mean"), col("variance"))).as("s"))
        .select(col("event_type"), col("s.n"), col("s.mean"), col("s.variance"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
      val batch = mkEvents().toDF()
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), avg(col("value")).as("mean"),
          var_samp(col("value")).as("variance"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP),
          BigDecimal(r.getDouble(3)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSet
      assert(finalRows == batch)
    } finally query.stop()
  }

  test("file-source streaming ingest: windowed agg over parquet matches batch") {
    import spark.implicits._
    // copy events into a temp dir as the "arriving files" source
    val src = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val ev = graft.Tables.events(spark, sf)
    ev.coalesce(2).write.mode("overwrite").parquet(src)
    val stream = spark.readStream
      .schema(spark.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1) // incremental micro-batches
      .parquet(src)
    val agg = stream
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("file_stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("file_stream_out").collect().map(_.toString).sorted
      val batch = ev
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(batch))
    } finally q.stop()
  }

  test("streaming session_window matches the batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = input.toDS()
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s"), col("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sess_stream_out").start()
    try {
      input.addData(mkEvents())
      q.processAllAvailable()
      val streamed = spark.table("sess_stream_out")
        .collect().map(_.toString).sorted
      val batch = mkEvents().toDF()
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"), col("w.start").as("s"), col("n"))
        .collect().map(_.toString).sorted
      assert(streamed.sameElements(batch))
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stream-stream join: purchases join clicks within the preceding hour") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val p = purchases.toDS().withWatermark("ts", "2 hours")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = clicks.toDS().withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") < col("p_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 10:00:00").getTime
      clicks.addData(Seq(
        Ev(100, new Timestamp(t0 - 30 * 60000L), 1, "click", 1.0),  // 30 min before
        Ev(101, new Timestamp(t0 - 90 * 60000L), 1, "click", 1.0),  // too early
        Ev(102, new Timestamp(t0 - 10 * 60000L), 2, "click", 1.0))) // other user
      purchases.addData(Seq(Ev(1, new Timestamp(t0), 1, "purchase", 5.0)))
      q.processAllAvailable()
      val rows = spark.table("ss_join_out").collect()
      assert(rows.length == 1) // only click 100 qualifies
      assert(rows.head.getLong(0) == 1L)
    } finally q.stop()
  }

  test("late data beyond the watermark is dropped in append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingOps.streamingTumbling(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      input.addData(Seq(Ev(1, new Timestamp(t0), 1, "click", 1.0),
        Ev(2, new Timestamp(t0 + 10 * 3600 * 1000L), 1, "click", 1.0)))
      query.processAllAvailable()
      // event 8 hours behind the max-seen ts (watermark = 2h) → dropped
      input.addData(Seq(Ev(3, new Timestamp(t0 + 2 * 3600 * 1000L), 1, "click", 1.0)))
      query.processAllAvailable()
      input.addData(Seq(Ev(4, new Timestamp(t0 + 20 * 3600 * 1000L), 1, "click", 1.0)))
      query.processAllAvailable()
      val emitted = spark.table("late_out")
        .select(col("wstart"), col("cnt")).collect()
        .map(r => (r.getTimestamp(0).getTime - t0) / 3600000L -> r.getLong(1)).toMap
      assert(emitted.get(0L).contains(1L)) // late event NOT counted
    } finally query.stop()
  }

  test("streaming curation gates quality and dedups content incrementally") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDoc]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val short = "alpha beta"
    val repet = "aa aa aa aa aa aa aa aa aa aa" // distinct ratio 0.1 < 0.2
    val query = StreamingOps.streamingCurate(input.toDF())
      .select(col("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("curate_out").start()
    try {
      input.addData(Seq(SDoc(1, good, new Timestamp(t0)),
        SDoc(2, short, new Timestamp(t0 + 1000))))
      query.processAllAvailable()
      // batch 2: exact replay of doc 1's text + a repetitive doc
      input.addData(Seq(SDoc(3, good, new Timestamp(t0 + 2000)),
        SDoc(4, repet, new Timestamp(t0 + 3000))))
      query.processAllAvailable()
      val kept = spark.table("curate_out").collect().map(_.getLong(0)).sorted
      assert(kept.sameElements(Array(1L)),
        s"expected only doc 1 to survive gate+dedup, got ${kept.mkString(",")}")
    } finally query.stop()
  }

  test("streaming minhash flags cross-batch near-duplicates via bucket state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDoc]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val b = "one two three four five six seven eight nine ten eleven twelve"
    val query = StreamingOps.streamingMinhashCandidates(input.toDF())
      .toDF("doc_id", "dup_of")
      .writeStream.outputMode("append")
      .format("memory").queryName("mh_out").start()
    try {
      input.addData(Seq(SDoc(1, a, new Timestamp(t0)),
        SDoc(2, b, new Timestamp(t0 + 1000))))
      query.processAllAvailable()
      // batch 2: doc 10 replays doc 1's text (all bands collide), doc 11 is fresh
      input.addData(Seq(SDoc(10, a, new Timestamp(t0 + 2000)),
        SDoc(11, "unrelated words entirely distinct tokens here appear once only now", new Timestamp(t0 + 3000))))
      query.processAllAvailable()
      val cands = spark.table("mh_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(cands == Set((10L, 1L)),
        s"expected exactly the cross-batch dup candidate (10,1), got $cands")
    } finally query.stop()
  }

  test("streaming top-k keeps the running leaderboard across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDoc]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val query = StreamingOps.streamingTopK(input.toDF(), 2)
      .writeStream.outputMode("complete")
      .format("memory").queryName("topk_out").start()
    try {
      input.addData(Seq(SDoc(1, words(5, "a"), new Timestamp(t0)),
        SDoc(2, words(9, "b"), new Timestamp(t0 + 1000))))
      query.processAllAvailable()
      val r1 = spark.table("topk_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(r1 === Map(1L -> 5.0, 2L -> 9.0))
      // batch 2: doc 3 outscores doc 1 — the heap state evicts it
      input.addData(Seq(SDoc(3, words(7, "c"), new Timestamp(t0 + 2000))))
      query.processAllAvailable()
      val r2 = spark.table("topk_out").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(r2 === Map(2L -> 9.0, 3L -> 7.0),
        s"expected the running top-2 {2->9, 3->7}, got $r2")
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch attribution pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Ev]
    val purchases = MemoryStream[Ev]
    val query = StreamingOps.streamingAttribution(clicks.toDF(), purchases.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ssjoin_out").start()
    try {
      val evs = mkEvents()
      val (c, p) = (evs.filter(_.event_type == "click"),
        evs.filter(_.event_type == "purchase"))
      // two micro-batches per side: pairs must match across batch edges
      val (c1, c2) = c.splitAt(c.length / 2)
      val (p1, p2) = p.splitAt(p.length / 2)
      clicks.addData(c1); purchases.addData(p1)
      query.processAllAvailable()
      clicks.addData(c2); purchases.addData(p2)
      query.processAllAvailable()
      val streamed = spark.table("ssjoin_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = StreamingOps.streamingAttribution(
        c.toDF(), p.toDF()).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch, "stream-stream join must equal the batch join")
      assert(batch.nonEmpty, "fixture must produce at least one attribution pair")
    } finally query.stop()
  }

  test("streaming quantile sketch merges micro-batches into the batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOps.Ev]
    val query = StreamingOps.streamingQuantileSketch(input.toDS())
      .writeStream.outputMode("complete")
      .format("memory").queryName("qsketch_out").start()
    try {
      val (first, second) = mkEvents().splitAt(120)
      input.addData(first)
      query.processAllAvailable()
      input.addData(second)
      query.processAllAvailable()
      val streamed = spark.table("qsketch_out").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val batch = StreamingOps.streamingQuantileSketch(mkEvents().toDS())
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(streamed === batch, "bucket counts must merge across micro-batches")
      assert(streamed.nonEmpty && streamed.size <= 700, "state stays a bounded sketch")
    } finally query.stop()
  }

  test("stream-static anti join gates banned content in every micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SDoc]
    val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val banned = "forbidden eval sentence that must never train"
    val ref = Seq(banned).toDF("text")
    val query = StreamingOps.streamingRefGate(input.toDF(), ref)
      .select(col("doc_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("refgate_out").start()
    try {
      input.addData(Seq(SDoc(1, "clean document one", new Timestamp(t0)),
        SDoc(2, banned, new Timestamp(t0 + 1000))))
      query.processAllAvailable()
      // the static side must be probed again in batch 2, not just batch 1
      input.addData(Seq(SDoc(3, banned, new Timestamp(t0 + 2000)),
        SDoc(4, "clean document two", new Timestamp(t0 + 3000))))
      query.processAllAvailable()
      val kept = spark.table("refgate_out").collect().map(_.getLong(0)).sorted
      assert(kept.sameElements(Array(1L, 4L)),
        s"expected banned docs 2,3 dropped in both batches, got ${kept.mkString(",")}")
    } finally query.stop()
  }

  test("streaming dedup drops replays within and across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val query = StreamingOps.streamingDedup(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      val t0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ev = (id: Long, m: Long) =>
        Ev(id, new Timestamp(t0 + m * 60000L), 1, "click", id * 1.0)
      // batch 1: ids 1,2,3 with 2 replayed inside the batch
      input.addData(Seq(ev(1, 0), ev(2, 1), ev(2, 2), ev(3, 3)))
      query.processAllAvailable()
      // batch 2: ids 2,3 replayed across batches, 4 is new
      input.addData(Seq(ev(2, 4), ev(3, 5), ev(4, 6)))
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select(col("event_id"))
        .collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L, 3L, 4L)),
        s"expected first-occurrence ids 1..4, got ${ids.mkString(",")}")
    } finally query.stop()
  }
}
