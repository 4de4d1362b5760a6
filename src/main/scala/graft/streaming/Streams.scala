package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

/** Structured Streaming operators over the events stream.
  *
  * Reference analog: hadoop-2.7.1 has no streaming engine — the closest
  * surface is incremental MR jobs over growing HDFS directories. The
  * Spark-native replacement is Structured Streaming: the SAME declarative
  * plans as the batch ops (AggOps.eventsHourly / AggOps.sessionize are the
  * batch twins), run incrementally with watermarks bounding state.
  *
  * Scale: state is partitioned by group key across executors; watermarks
  * evict state, so memory is O(active keys × window), not O(history).
  */
object Streams {

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Tumbling hourly counts with a watermark (batch twin: eventsHourly).
    * Append-mode-safe: results finalize when the watermark passes. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"),
              col("n_events"), col("sum_value"))

  /** Stream-stream inner join with watermark-bounded state: click events
    * joined to view events of the same user within `joinWindowSec`
    * (click after view). Both sides buffer only up to their watermark
    * horizon — state is O(events per horizon), the bounded form of the
    * reduce-side join for two live streams. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame,
                    joinWindowSec: Long = 3600L,
                    watermark: String = "2 hours",
                    joinType: String = "inner"): DataFrame = {
    // respect an upstream watermark (e.g. dedupStream → join composition):
    // redefining one is an analysis error, and the upstream bound is the
    // one already governing that side's state eviction
    def ensureWm(df: DataFrame, tsCol: String): DataFrame =
      if (df.schema(tsCol).metadata.contains("spark.watermarkDelayMs")) df
      else df.withWatermark(tsCol, watermark)
    val v = ensureWm(views.select(col("user_id").as("v_user"), col("ts").as("v_ts"),
        col("event_id").as("view_id")), "v_ts")
    val c = ensureWm(clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id")), "c_ts")
    // left_outer: an unmatched view emits (view, null click) only once the
    // watermark passes its join window — i.e. when a match is provably
    // impossible — so null rows are final, never retracted. full_outer
    // completes the matrix symmetrically: an unmatched CLICK also emits
    // (null view, click), and only once BOTH sides' watermarks prove no
    // view can still arrive for it — outer rows are final on either side.
    // user_id must coalesce across sides: an outer row has exactly one of
    // v_user/c_user (they are equal on matches by the join condition).
    v.join(c,
      col("v_user") === col("c_user") &&
      col("c_ts") >= col("v_ts") &&
      col("c_ts") <= col("v_ts") + expr(s"INTERVAL $joinWindowSec SECONDS"),
      joinType)
      .select(coalesce(col("v_user"), col("c_user")).as("user_id"),
        col("view_id"), col("click_id"), col("v_ts"), col("c_ts"))
  }

  /** Incremental rollup (the MR "re-run the job over a growing directory"
    * analog, without the re-scan): each micro-batch appends PARTIAL
    * aggregates to a parquet rollup table; readers merge on read with one
    * more groupBy. Partials are mergeable because sum/count are — the same
    * contract as the MR combiner. At 100 TB/day this turns the daily
    * recompute into a per-batch append of KB-sized partials plus a
    * rollup-sized final merge. */
  def incrementalRollup(events: DataFrame, outDir: String, checkpointDir: String) =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      // batchId-keyed OVERWRITE, not a blind append: foreachBatch can re-run
      // a batch whose write committed but whose checkpoint offset didn't —
      // overwriting the same per-batch directory makes the retry idempotent
      // (exactly-once partials without a transactional sink). checkpointDir
      // and outDir form ONE unit: batch ids are assigned by the checkpoint,
      // so resetting the checkpoint against an existing outDir restarts ids
      // at 0 and overwrites old partials — reset or retain them together.
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  /** Streaming IVF index maintenance — the ingest half of the persisted
    * ANN index (SimilarityOps.ivfWriteIndex builds; this appends): each
    * incoming vector is assigned to its nearest centroid from the index's
    * OWN centroid relation (fixed at build time — the faiss convention:
    * appends never retrain; re-clustering is a batch rebuild) and written
    * under postings_inc/batch_N in the same bucket-partitioned layout, so
    * SimilarityOps.readIndexPostings serves queries over base + increments
    * with the same partition pruning. Assignment is a pure map-side argmax
    * (no state store, no shuffle); the batchId-keyed OVERWRITE makes
    * foreachBatch retries idempotent (the incrementalRollup contract).
    * Compaction: fold postings_inc into postings with a batch rewrite when
    * batch count grows — queries see either layout identically. */
  def ivfAppendStream(vectors: DataFrame, indexDir: String,
                      checkpointDir: String): StreamingQuery = {
    val spark = vectors.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val cents = spark.read.parquet(s"$indexDir/centroids").orderBy("cluster")
      .collect().map(r => r.getSeq[Float](r.fieldIndex("centroid")).toArray)
    require(cents.nonEmpty, s"no centroid relation under $indexDir")
    vectors.select(col("vec_id"), col("embedding"),
        graft.functions.GraftFunctions.nearestCentroids(col("embedding"), cents, 1)(0)
          .as("bucket"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Empty-batch guard: partitionBy with zero rows writes a directory
        // with no parquet part files, and the next readIndexPostings schema
        // inference fails on it — breaking every subsequent query over the
        // index. An empty micro-batch (idle trigger) simply writes nothing.
        if (!batch.isEmpty)
          batch.write.mode("overwrite").partitionBy("bucket")
            .parquet(s"$indexDir/postings_inc/batch_$batchId")
      }
      .start()
  }

  /** Merge-on-read for the incremental rollup table: partials → totals.
    * A rollup with no committed batch yet (empty stream, or a reader racing
    * the first trigger) reads as an EMPTY rollup, not an AnalysisException. */
  def readRollup(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(root) &&
      fs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
    val partials =
      if (hasBatch) spark.read.parquet(s"$outDir/batch_*")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          "hour STRING, event_type STRING, n_events BIGINT, sum_value DOUBLE"))
    partials
      .groupBy(col("hour"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        round(sum(col("sum_value")), 2).as("sum_value"))
  }

  /** Streaming exact dedup with bounded state: drop events whose dedup key
    * was already seen, keeping state only within the watermark horizon —
    * the ingest-time half of the dedup family (DedupOps covers the batch
    * corpus side). At 100 TB/day ingest this is the standard "at-least-once
    * source → exactly-once sink" repair: state is partitioned by key hash
    * across executors and watermark-evicted, so memory is O(keys per
    * horizon), not O(history). Works on any expression — pass md5(text)
    * for content dedup or event_id for replay dedup. */
  def dedupStream(events: DataFrame, keyCols: Seq[String] = Seq("event_id"),
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Streaming MinHash-LSH near-dup CANDIDATES over a document stream —
    * the ingest-time twin of DedupOps.minhashLshPairs. Each arriving doc is
    * banded map-side (DedupOps.bandedMinhashSigs: same tokenizer/perms/
    * bands as batch, so candidate sets agree), then flatMapGroupsWithState
    * keyed by (band, band_sig) pairs it against every doc previously seen
    * in that bucket. Cross-band duplicate pairs are dropped by a stateful
    * dropDuplicates downstream.
    *
    * Emits CANDIDATES (band-collision pairs), not verified pairs: exact
    * Jaccard verification needs the two shingle sets, which belong in a doc
    * store, not in per-bucket state ×32 bands — the production shape is
    * `foreachBatch { cands => DedupOps-style verify join against the
    * corpus table }` (spec-proven equivalent to the batch op's output).
    *
    * State: one Long per doc per band (the bucket membership list) —
    * O(32 × docs) total, uniform across executors because bucket keys are
    * hashes. `maxBucket` caps a hot bucket (a band_sig shared by thousands
    * of near-identical docs): beyond the cap the bucket stops ACCUMULATING
    * but new arrivals still pair against the stored members — the same
    * role as the batch op's maxDf posting cap; duplicates of a saturated
    * bucket are by construction already paired with its members.
    *
    * SECOND state store — the cross-band pair dedup: the trailing
    * `dropDuplicates(a_id, b_id)` keeps one row per EMITTED PAIR forever
    * (no watermark exists to bound it), so its footprint is O(total pairs
    * emitted) — worst case quadratic within a hot bucket up to `maxBucket`,
    * i.e. potentially LARGER than the bucket store above. That is the price
    * of the exact forever-contract (any doc may pair with any past doc, so
    * no pair key is ever safely forgettable). When a time horizon is
    * acceptable, [[nearDupCandidatesWithin]] bounds BOTH stores by the
    * horizon via dropDuplicatesWithinWatermark. */
  def nearDupCandidates(docs: DataFrame, numPerms: Int = 128, bands: Int = 32,
                        maxBucket: Int = 4096): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val banded = graft.ops.DedupOps.bandedMinhashSigs(docs, numPerms, bands)
      .select(col("doc_id"), col("band"), col("band_sig"))
      .as[(Long, Int, Long)]
    banded
      .groupByKey { case (_, band, sig) => (band, sig) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), rows: Iterator[(Long, Int, Long)],
         state: GroupState[List[Long]]) =>
          val stored = state.getOption.getOrElse(Nil)
          // membership probes go through a Set built ONCE per invocation —
          // per-arrival List.contains is O(|bucket|), i.e. ~16 M comparisons
          // per micro-batch for one saturated 4096-member bucket; the state
          // stays a List (schema-stable, cheap to persist)
          val storedSet = stored.toSet
          // distinct+sorted: a doc re-sent in the same batch pairs once
          val fresh = rows.map(_._1).toSeq.distinct.sorted.filterNot(storedSet)
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
          var members = stored
          var nMembers = stored.size // List.size is O(n) — track it once
          fresh.foreach { id =>
            members.foreach { m =>
              out += (if (m < id) (m, id) else (id, m))
            }
            // saturated buckets stop growing but keep pairing (see doc)
            if (nMembers < maxBucket) { members ::= id; nMembers += 1 }
          }
          if (members ne stored) state.update(members)
          out.iterator
      }
      .toDF("a_id", "b_id")
      // Cross-band pair dedup is ALSO stateful and, with no watermark,
      // grows with emitted pair count — worst case quadratic within a hot
      // bucket up to maxBucket, i.e. a larger footprint than the
      // O(32 × docs) bucket state above. That is the price of the EXACT
      // forever-contract (any doc may pair with any past doc, so no pair
      // key is ever safely forgettable); when a time horizon is
      // acceptable, [[nearDupCandidatesWithin]] bounds BOTH state stores
      // by the horizon.
      .dropDuplicates("a_id", "b_id")
  }

  /** Streaming sign-LSH SEMANTIC near-dup candidates over an embedding
    * stream — the ingest-time twin of SimilarityOps.semanticDedupAnn's
    * candidate stage, exactly as [[nearDupCandidates]] twins the MinHash
    * batch op. Each arriving vector is bucketed MAP-SIDE by the same
    * multi-table hyperplane family as the batch path
    * (SimilarityOps.lshIndexRelation: same genPlanes(tables·bits, dim,
    * seed), same table namespacing — candidates found by one are
    * candidates under the other), then flatMapGroupsWithState keyed by
    * bucket pairs it against every vector previously seen there.
    *
    * Emits CANDIDATES; exact-cosine verification joins the pair stream
    * against the vector store per micro-batch (`foreachBatch`), for the
    * same reason the MinHash twin defers Jaccard: embeddings belong in a
    * store, not in per-bucket state × tables. `dim` is explicit — a
    * streaming source cannot be sampled for it, and the plane family is a
    * pure function of (tables·bits, dim, seed). State: one Long per vector
    * per table; `maxBucket` saturation identical to the MinHash twin
    * (stop accumulating, keep pairing). */
  def semanticNearDupCandidates(vecs: DataFrame, dim: Int, tables: Int = 8,
                                bits: Int = 4, seed: Long = 42L,
                                maxBucket: Int = 4096): DataFrame = {
    val session = vecs.sparkSession
    import session.implicits._
    graft.functions.GraftFunctions.register(session)
    val planes = graft.functions.HyperplaneLsh.genPlanes(tables * bits, dim, seed)
    val bucketed = vecs.select(col("vec_id"),
        explode(graft.functions.GraftFunctions.hyperplaneLsh(
          col("embedding"), planes, tables, bits)).as("bucket"))
      .as[(Long, Int)]
    bucketed
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Int, rows: Iterator[(Long, Int)], state: GroupState[List[Long]]) =>
          val stored = state.getOption.getOrElse(Nil)
          // O(1) membership + tracked size — see nearDupCandidates
          val storedSet = stored.toSet
          val fresh = rows.map(_._1).toSeq.distinct.sorted.filterNot(storedSet)
          val out = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
          var members = stored
          var nMembers = stored.size
          fresh.foreach { id =>
            members.foreach { m =>
              out += (if (m < id) (m, id) else (id, m))
            }
            if (nMembers < maxBucket) { members ::= id; nMembers += 1 }
          }
          if (members ne stored) state.update(members)
          out.iterator
      }
      .toDF("a_id", "b_id")
      // cross-TABLE pair dedup — same forever-contract/footprint trade as
      // the MinHash twin's cross-band dedup (see nearDupCandidates doc)
      .dropDuplicates("a_id", "b_id")
  }

  /** Horizon-bounded [[nearDupCandidates]]: pairs only docs whose event
    * times lie within `horizon` of each other, in exchange for BOUNDED
    * state — bucket members older than `watermark + horizon` can never
    * pair with a future in-watermark arrival, so they are evicted on
    * event-time timeout, and the cross-band pair dedup uses
    * dropDuplicatesWithinWatermark (pair rows carry the newer doc's ts).
    * State is O(docs per horizon) per store instead of O(history) — the
    * dedupStream contract applied to near-dup detection. Within the
    * horizon the emitted pairs are EXACTLY the unbounded op's (spec-
    * pinned); pairs farther apart than `horizon` are the documented loss.
    * Requires an event-time column `ts`; watermark should be ≥ the
    * source's lateness bound as usual. */
  def nearDupCandidatesWithin(docs: DataFrame, horizon: String = "24 hours",
                              watermark: String = "2 hours",
                              numPerms: Int = 128, bands: Int = 32,
                              maxBucket: Int = 4096): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    // Chained stateful ops (flatMapGroupsWithState → dropDuplicatesWithin
    // Watermark) trip Spark's conservative static late-row check. This
    // specific chain is safe by construction: every emitted pair carries
    // event time max(member_ts, arrival_ts) ≥ arrival_ts, and arrivals are
    // never below the watermark, so no emitted row is late for the
    // downstream dedup store. The check is static (it cannot see the max),
    // hence the documented opt-out.
    session.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val horizonMs = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(horizonMs.months == 0, "horizon must be day/time-based, not months")
    val hMs = horizonMs.days * 86400000L + horizonMs.microseconds / 1000L
    val banded = graft.ops.DedupOps
      .bandedMinhashSigs(docs, numPerms, bands, carryCols = Seq("ts"))
      .withWatermark("ts", watermark)
      .select(col("doc_id"), col("band"), col("band_sig"), col("ts"))
      .as[(Long, Int, Long, Timestamp)]
    banded
      .groupByKey { case (_, band, sig, _) => (band, sig) }
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: (Int, Long), rows: Iterator[(Long, Int, Long, Timestamp)],
         state: GroupState[List[(Long, Long)]]) =>
          val wm = state.getCurrentWatermarkMs()
          // evict members that can no longer pair with any future arrival
          // (future ts ≥ watermark, so a member is dead once ts < wm − h)
          val kept = state.getOption.getOrElse(Nil)
            .filter { case (_, t) => t >= wm - hMs }
          if (rows.isEmpty) {
            // timeout firing: shrink or clear
            if (kept.isEmpty) state.remove() else {
              state.update(kept)
              state.setTimeoutTimestamp(math.max(kept.map(_._2).max + hMs, wm + 1))
            }
            Iterator.empty
          } else {
            // O(1) membership + tracked size — see nearDupCandidates
            val keptIds = kept.iterator.map(_._1).toSet
            val fresh = rows.map(r => (r._1, r._4.getTime)).toSeq
              .distinct.sortBy(r => (r._2, r._1))
              .filterNot { case (id, _) => keptIds(id) }
            val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Timestamp)]
            var members = kept
            var nMembers = kept.size
            fresh.foreach { case (id, t) =>
              members.foreach { case (m, mt) =>
                if (math.abs(t - mt) <= hMs)
                  out += (if (m < id) (m, id, new Timestamp(math.max(t, mt)))
                          else (id, m, new Timestamp(math.max(t, mt))))
              }
              if (nMembers < maxBucket) { members ::= ((id, t)); nMembers += 1 }
            }
            state.update(members)
            state.setTimeoutTimestamp(math.max(members.map(_._2).max + hMs, wm + 1))
            out.iterator
          }
      }
      .toDF("a_id", "b_id", "ts")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("a_id", "b_id")
      .select(col("a_id"), col("b_id"))
  }

  /** Ingest-time fuzzy decontamination CANDIDATES: flag arriving docs that
    * LSH-collide with the STATIC benchmark relation — the streaming twin of
    * DedupOps.crossMinhashPairs' candidate stage. A stream-static equi-join
    * on (band, band_sig) with ZERO streaming state: the benchmark side is a
    * plain batch relation (an eval suite — always small), broadcast into
    * every micro-batch; nothing about past stream rows needs remembering,
    * because contamination is a doc-vs-static property, not a doc-vs-doc
    * one. That makes this the cheapest stateful-looking op in the file — it
    * isn't stateful at all.
    *
    * Emits (doc_id, ref_id) band collisions; a pair colliding in k bands is
    * emitted up to k times (per-pair dedup would need a stateful
    * dropDuplicates — pointless when the downstream exact-Jaccard verify in
    * foreachBatch is idempotent, the [[nearDupCandidates]] production
    * shape). DISTINCT candidate parity with the batch cross banding is
    * spec-pinned (same tokenizer/perms/bands on both sides). */
  def decontaminateCandidatesStream(docs: DataFrame, benchmark: DataFrame,
                                    numPerms: Int = 128, bands: Int = 32): DataFrame = {
    val banded = graft.ops.DedupOps.bandedMinhashSigs(docs, numPerms, bands)
      .select(col("doc_id"), col("band"), col("band_sig"))
    val refBanded = graft.ops.DedupOps.bandedMinhashSigs(benchmark, numPerms, bands)
      .select(col("doc_id").as("ref_id"), col("band"), col("band_sig"))
    banded.join(refBanded, Seq("band", "band_sig"))
      .select(col("doc_id"), col("ref_id"))
  }

  /** Ingest-time quality scoring: the trained classifier's map-side margin
    * expression applied to a document STREAM — stateless, so the streaming
    * plan is the same one Scan+Project as batch scoring (weights ship with
    * the plan; no state, no watermark, no shuffle). This is the production
    * shape of "score every crawl document as it lands": train offline on a
    * sample (Classifier.trainLogReg), deploy the weight vector into the
    * ingest stream, route by margin. Emits only rows with margin ≥
    * minMargin when `filter` is set; pass minMargin = −∞ to score-and-keep
    * everything. Spec-pinned equal to batch scoreMapSide row-for-row. */
  def scoreStream(docs: DataFrame, weights: Array[Double],
                  minMargin: Double = 0.0,
                  keepOnly: Boolean = true): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val margin = graft.functions.GraftFunctions.hashedLinearMargin(col("text"), weights)
    val scored = docs.withColumn("margin", round(margin, 5))
    if (keepOnly) scored.filter(col("margin") >= minMargin) else scored
  }

  /** Incremental Count-Min sketch maintenance (the streaming twin of
    * TextAnalysis.cmsMatrix): each micro-batch writes ITS OWN depth×width
    * counter matrix as a batchId-keyed partial (same idempotent-overwrite
    * contract as [[incrementalRollup]]); [[readCms]] merges partials with
    * one groupBy-sum. Correct because CMS is a LINEAR sketch — the matrix
    * of a union is the cell-wise sum of the matrices — so the merged
    * estimate equals the batch sketch over everything ever streamed
    * (spec-pinned). At 100 TB/day each partial is ≤ depth×width cells
    * regardless of batch size: the sketch family's constant-bounded
    * shuffle story, now also its constant-bounded STATE story. */
  def cmsStream(docs: DataFrame, outDir: String, checkpointDir: String,
                depth: Int = 4, width: Int = 2048) =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ops.TextAnalysis.cmsMatrix(batch, depth, width)
          .write.mode("overwrite").parquet(s"$outDir/batch_$batchId")
      }
      .start()

  /** Merge-on-read for the incremental CMS: cell-wise partial sums. An
    * empty rollup dir reads as an empty matrix, matching readRollup. */
  def readCms(spark: org.apache.spark.sql.SparkSession, outDir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatch = fs.exists(root) &&
      fs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("batch_"))
    val partials =
      if (hasBatch) spark.read.parquet(s"$outDir/batch_*")
      else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL("d INT, idx INT, c BIGINT"))
    partials.groupBy(col("d"), col("idx")).agg(sum(col("c")).as("c"))
  }

  /** Custom-state sessionization: flatMapGroupsWithState with event-time
    * timeout. A session closes when the gap exceeds gapSec (decided against
    * the watermark clock), emitting (user, start, end, n). */
  def sessionize(events: Dataset[Ev], gapSec: Long = 1800L,
                 watermark: String = "2 hours"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def update(userId: Long, evs: Iterator[Ev],
               state: GroupState[(Timestamp, Timestamp, Long)]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val (s, e, n) = state.get
        state.remove()
        Iterator(Session(userId, s, e, n))
      } else {
        val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        var out = List.empty[Session]
        var cur = state.getOption
        sorted.foreach { ev =>
          cur match {
            case Some((s, e, n)) if ev.ts.getTime - e.getTime <= gapSec * 1000 =>
              // a late (above-watermark) event from an earlier micro-batch
              // may precede the stored bounds — extend, never regress them
              val lo = if (ev.ts.before(s)) ev.ts else s
              val hi = if (ev.ts.after(e)) ev.ts else e
              cur = Some((lo, hi, n + 1))
            case Some((s, e, n)) =>
              out ::= Session(userId, s, e, n)
              cur = Some((ev.ts, ev.ts, 1L))
            case None =>
              cur = Some((ev.ts, ev.ts, 1L))
          }
        }
        cur.foreach { c =>
          state.update(c)
          state.setTimeoutTimestamp(c._2.getTime + gapSec * 1000)
        }
        out.reverseIterator
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
