package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming surface over the `events` table (SURVEY.md §2.12). The
  * reference has no streaming subsystem; what carries over is its
  * incremental-friendly aggregates — single-pass meanvar
  * (stats/meanvar.cuh:39) becomes mergeable (n, Σx, Σx²) state in
  * flatMapGroupsWithState. Batch twins of each windowed aggregation are
  * exposed as oracle-checked queries; the genuinely streaming paths
  * (watermark, state timeout) run in StreamingSpec against MemoryStream.
  */
object StreamingOps {

  /** Tumbling 1-hour windows per event type (batch twin of the
    * readStream → groupBy(window(...)) aggregation). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sval"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"), col("sval"))

  /** Sliding 1-hour windows hopping every 30 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))

  /** Sessionization with a 30-minute inactivity gap — batch gaps-and-islands
    * (lag + running sum), keyed by user: the deterministic twin of
    * session_window/flatMapGroupsWithState sessionization.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val flagged = events.select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("sess_no", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("sess_no"))
      .agg(min(col("ts")).as("sess_start"), max(col("ts")).as("sess_end"),
        count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
  }

  /** Native session_window sessionization (streaming-capable form of
    * sessionize; merge semantics: events merge when gap < 30 min strictly).
    */
  def sessionWindowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("w.start").as("sess_start"),
        col("n_events"), col("sum_value"))

  // ---- genuinely streaming paths (driven by StreamingSpec) ----

  case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class MeanVarState(n: Long, sum: Double, sumSq: Double)
  case class MeanVarOut(event_type: String, n: Long, mean: Double, variance: Double)

  /** Watermarked tumbling-window aggregation as a streaming Dataset. */
  def streamingTumbling(events: Dataset[Ev]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("event_type"), col("cnt"))

  /** Streaming exact dedup — the incremental form of the pipeline's
    * exact-dedup pass: the first event per event_id survives; replays and
    * cross-batch duplicates are dropped from the stream. Uses
    * `dropDuplicatesWithinWatermark`, whose state entries carry the event
    * time and ARE evicted once the watermark passes them (plain
    * `dropDuplicates("event_id")` would keep every id forever because the
    * event-time column is not part of the key) — the property that keeps
    * state proportional to the watermark horizon, not the corpus, at
    * 100 TB/day ingest. Replays are assumed to arrive within the
    * watermark delay of the original (the standard at-least-once
    * redelivery window). */
  def streamingDedup(events: Dataset[Ev]): Dataset[Ev] =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Incremental corpus curation — the quality gate + exact dedup
    * composed as one always-on streaming pipeline: the gate is pure
    * per-row expressions (stateless, no shuffle), dedup keys on the
    * content hash via `dropDuplicatesWithinWatermark`, so each hash's
    * state entry is evicted once the watermark passes it — state stays
    * proportional to the 1-hour horizon, not the corpus (plain
    * `dropDuplicates` would grow without bound). Content replays landing
    * beyond the horizon are the batch dedup pass's job, as in any
    * lambda-style curation stack. The batch twins of these rules are
    * TextOps.qualityGate / DedupOps.exactDedupStats; this is the
    * ingest-time form a 100 TB/day feed runs. */
  def streamingCurate(docs: DataFrame, minTokens: Int = 8): DataFrame = {
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    docs
      .withWatermark("ts", "1 hour")
      .withColumn("n_tokens", size(toks))
      .where(col("n_tokens") >= minTokens &&
        size(array_distinct(toks)).cast("double") / size(toks) >= 0.2)
      .withColumn("content_h", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_h")
  }

  /** Windowed PSI drift monitor — per tumbling window, the population
    * stability index of the window's value distribution against a
    * STATIC reference share vector (computed offline — StatsOps.psi's
    * smoothed shares — and baked in as literals). The whole monitor is
    * ONE streaming aggregation: the B bins are fixed, so per-bin counts
    * are B conditional sums inside a single groupBy(window), and the
    * PSI fold is a pure projection over those B columns — no chained
    * streaming aggregation, no stream-side join, append-mode safe with
    * state bounded by the watermark horizon. The same DataFrame code
    * runs batch (the driver-query twin) and streaming (StreamingSpec).
    * Alarm convention: <0.1 stable, >0.25 investigate. */
  def windowedPsi(events: DataFrame, refShares: Seq[Double], lo: Double,
      width: Double, windowDur: String = "6 hours"): DataFrame = {
    val bins = refShares.length
    val bin = least(lit(bins - 1L), greatest(lit(0L),
      floor((col("value") - lo) / width).cast("long")))
    val sums = (0 until bins).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"c$b"))
    val agged = events
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(sums.head, sums.tail: _*)
    val n = (0 until bins).map(b => col(s"c$b")).reduce(_ + _)
    val psi = (0 until bins).map { b =>
      val q = (col(s"c$b") + 1) / (col("n") + lit(bins)).cast("double")
      (lit(refShares(b)) - q) * log(lit(refShares(b)) / q)
    }.reduce(_ + _)
    agged.withColumn("n", n)
      .select(col("w.start").as("wstart"), col("n"),
        (round(psi, 6) + 0.0).as("psi"))
  }

  /** [[windowedPsi]] with the watermark attached — the genuinely
    * streaming form driven by StreamingSpec. */
  def streamingWindowedPsi(events: Dataset[Ev], refShares: Seq[Double],
      lo: Double, width: Double): DataFrame =
    windowedPsi(events.toDF().withWatermark("ts", "2 hours"),
      refShares, lo, width, "6 hours")

  /** Windowed count-min sketch of a keyed stream: each event contributes
    * one increment per hash row (a stateless explode over `depth`), then
    * ONE streaming aggregation on the composite key (window, d, bucket)
    * builds the grid incrementally — no chained aggregates, so the same
    * code runs as a Structured Streaming query with the watermark
    * attached ([[streamingCms]]). State is bounded by
    * open-windows × depth × width cells regardless of stream length or
    * key cardinality — the CMS trade the stream twin of
    * TextOps.heavyHittersCms makes: pay a fixed grid, answer any point
    * query with min over depth cells (an overestimate, never under). */
  def windowedCms(events: DataFrame, keyCol: Column, depth: Int = 4,
      width: Int = 256, windowDur: String = "6 hours"): DataFrame = {
    val rows = events
      .select(col("ts"), keyCol.cast("string").as("k"))
      .select(col("ts"),
        explode(sequence(lit(0), lit(depth - 1))).as("d"), col("k"))
      .select(col("ts"), col("d"),
        pmod(TextOps.h32(concat_ws(":", col("d"), col("k"))), lit(width)).as("b"))
    rows.groupBy(window(col("ts"), windowDur).as("w"), col("d"), col("b"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("w.start").as("wstart"), col("d"), col("b"), col("cnt"))
  }

  /** [[windowedCms]] with the watermark attached — the genuinely
    * streaming form driven by StreamingSpec. */
  def streamingCms(events: Dataset[Ev], depth: Int = 4, width: Int = 256): DataFrame =
    windowedCms(events.toDF().withWatermark("ts", "2 hours"),
      col("user_id"), depth, width)

  /** Streaming running top-k — the select_k of a STREAM: a complete-mode
    * global aggregate whose state is the k-entry bounded heap
    * (functions.TopKAgg), so every trigger emits the current
    * leaderboard of the highest-scoring documents seen so far. State is
    * k entries total regardless of stream length — the streaming twin
    * of the batch select_k family, and the shape an incremental curation
    * pipeline uses for "best N so far" reporting. Score = token count
    * (cheap deterministic quality proxy; swap in any per-row score). */
  def streamingTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    import graft.functions.TopKAgg
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    docs.select(col("doc_id"), size(toks).cast("double").as("score"))
      .agg(TopKAgg.topKMin(-col("score"), col("doc_id"), k).as("flat"))
      .select(explode(TopKAgg.decodeTopK(col("flat"))).as("e"))
      .select(col("e.j").as("doc_id"), (-col("e.c")).as("score"))
  }

  /** Streaming quantile sketch — [[graft.operators.StatsOps.quantileSketch]]'s
    * HDR histogram as a STREAMING aggregate: state is one count per
    * touched bucket (≤ ~700 cells no matter how long the stream runs —
    * the same bounded-state story as the top-k heap and the meanvar
    * triple), merged across micro-batches by ordinary aggregate merge
    * because bucket counts are commutative. Complete-mode output is the
    * current sketch; a downstream reader derives any quantile from the
    * emitted cells, so the stream never re-sorts anything. Values =
    * event value in integer cents (non-negative slice). */
  def streamingQuantileSketch(events: Dataset[Ev]): DataFrame =
    events.toDF()
      .select(expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      .where(col("v") >= 0L)
      .select(graft.operators.StatsOps.hdrBucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))

  /** Stream-STREAM interval join — the remaining Structured Streaming
    * join flavor (both sides streaming, state on both sides): clicks
    * joined to purchases of the SAME user within the hour before the
    * purchase. The watermarks + the time-range predicate are what make
    * unbounded two-sided state droppable: Spark derives the state
    * retention window from them, so each side holds ≤ (watermark +
    * interval) of events per key — the attribution join of a live
    * clickstream, keyed by user at any scale. Works identically as a
    * batch query (the batch twin `pipe_stream_join` hash-checks the
    * semantics; StreamingSpec runs the same function on two
    * MemoryStreams and proves stream == batch). */
  def streamingAttribution(clicks: DataFrame, purchases: DataFrame): DataFrame =
    clicks.select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
      .join(purchases.select(col("event_id").as("purchase_id"),
          col("user_id").as("p_user"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "2 hours"),
        expr("""c_user = p_user
               |AND c_ts >= p_ts - INTERVAL 1 HOUR
               |AND c_ts < p_ts""".stripMargin))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))

  /** Stream-static decontamination gate — the join flavor the other
    * streaming ops don't exercise: the incoming doc stream LEFT-ANTI joins
    * a STATIC reference table (banned / eval-set content hashes) that
    * Structured Streaming re-reads per micro-batch, so reference updates
    * land without restarting the query. Stateless (anti join against a
    * static side needs no watermark or state store), and the static side
    * broadcasts: at 100 TB/day the corpus streams through map-side hash
    * probes — the per-batch twin of DedupOps.contamination's broadcast
    * shape. Exact-hash gating here; shingle-overlap decontamination stays
    * a batch pass (its per-doc aggregate needs stateful streaming). */
  def streamingRefGate(docs: DataFrame, ref: DataFrame): DataFrame = {
    val banned = ref.select(md5(col("text")).as("content_h"))
    docs.withColumn("content_h", md5(col("text")))
      .join(broadcast(banned), Seq("content_h"), "left_anti")
      .drop("content_h")
  }

  case class BandHit(doc_id: Long, band: Int, sig: String, ts: java.sql.Timestamp)

  /** Streaming MinHash-LSH near-dup candidates — the incremental twin of
    * DedupOps.minhashDupPairs. The signature pipeline is re-expressed as
    * pure per-row expressions (shingles as an array column, each minhash
    * as an array_min over it — no shuffle, so it composes with the ONE
    * stateful stage Structured Streaming allows): state per (band, sig)
    * bucket = first doc_id seen; later arrivals emit (doc_id, dup_of)
    * candidates. Exact-Jaccard verification of candidates is a
    * micro-batch join downstream, as in the batch pipeline. Same affine
    * permutation family as the batch op. Bucket state expires via an
    * event-time timeout one day past the bucket's newest document (under
    * the 2-hour watermark), so state is proportional to the buckets
    * touched in the last day, not every bucket ever seen — near-dups
    * farther apart than that are the batch LSH pass's job. */
  def streamingMinhashCandidates(docs: DataFrame): Dataset[(Long, Long)] = {
    import DedupOps.P
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")
    val sh = transform(sequence(lit(0), size(col("tk")) - 3),
      i => graft.operators.TextOps.h32(concat_ws(" ",
        element_at(col("tk"), i + 1), element_at(col("tk"), i + 2),
        element_at(col("tk"), i + 3))))
    val mh = (0 until 16).map { i =>
      array_min(transform(col("sh"),
        h => pmod(h * (2L * i + 1L) + (12345L * i + 7L), lit(P)))).as(s"mh_$i")
    }
    val bands = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        concat_ws(":", (0 until 4).map(r => col(s"mh_${b * 4 + r}")): _*).as("sig"))
    }
    val banded = docs
      .select(col("doc_id"), col("ts"), toks.as("tk"))
      .where(size(col("tk")) >= 3)
      .select(col("doc_id"), col("ts"), sh.as("sh"))
      .select(col("doc_id") +: col("ts") +: mh: _*)
      .select(col("doc_id"), col("ts"), explode(array(bands: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"),
        col("ts"))
      .as[BandHit]
    banded
      .withWatermark("ts", "2 hours")
      .groupByKey(h => (h.band, h.sig))
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_, rows: Iterator[BandHit], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val hits = rows.toSeq
            val ids = hits.map(_.doc_id).sorted
            val first = state.getOption.getOrElse(ids.head)
            if (!state.exists) state.update(first)
            // evict a bucket one day after its newest doc's event time
            state.setTimeoutTimestamp(hits.map(_.ts.getTime).max, "24 hours")
            ids.filter(_ != first).map(d => (d, first)).iterator
          }
      }
  }

  /** Streaming meanvar: mergeable (n, Σx, Σx²) state per key — the
    * reference's single-pass meanvar as flatMapGroupsWithState. */
  def streamingMeanVar(events: Dataset[Ev]): Dataset[MeanVarOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState[MeanVarState, MeanVarOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[Ev], state: GroupState[MeanVarState]) =>
          val s0 = state.getOption.getOrElse(MeanVarState(0L, 0.0, 0.0))
          val s = rows.foldLeft(s0) { (acc, e) =>
            MeanVarState(acc.n + 1, acc.sum + e.value, acc.sumSq + e.value * e.value)
          }
          state.update(s)
          val mean = s.sum / s.n
          val varia = if (s.n > 1) (s.sumSq - s.n * mean * mean) / (s.n - 1) else 0.0
          Iterator(MeanVarOut(key, s.n, mean, varia))
      }
  }
}
