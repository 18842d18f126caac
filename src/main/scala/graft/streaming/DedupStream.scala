package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.llm.{Dedup, TextOps}

/** Streaming near-dup ingest gate — the unbounded-stream analog of the
  * batch MinHash-LSH path ([[graft.llm.Dedup.lshNearDups]]): documents
  * arrive continuously and each is admitted or rejected against what
  * the gate has already seen, without ever holding the corpus.
  *
  * Shape: each arriving doc computes its signature JVM-side
  * ([[graft.llm.Dedup.docSignature]], same hash family as the batch
  * path), fans out to its LSH band buckets, and each bucket keeps a
  * BOUNDED FIFO of recent signatures in the state store. A doc whose
  * exact jaccard against any stored signature reaches the threshold is
  * flagged with the id it duplicates. Keyed shuffle on the band bucket
  * only — never all-pairs, and state is bounded by
  * `maxPerBucket × #active buckets`, not by stream lifetime. The cap is
  * the streaming trade-off: a near-dup of a doc already evicted from
  * its bucket's FIFO is re-admitted (recall degrades gracefully with
  * age), exactly like any production ingest gate with finite memory —
  * the batch `lshNearDups` over the landed corpus remains the
  * exhaustive check.
  *
  * Per-(doc, band) verdicts are emitted (Update mode); [[survivors]]
  * shows the standard consumption pattern — reduce verdicts to per-doc
  * admit/reject inside `foreachBatch`, where plain batch operators are
  * unrestricted.
  */
object DedupStream {

  case class Doc(doc_id: Long, text: String)

  /** One verdict per (doc, band bucket): `is_dup` with the matched
    * earlier doc id, or a clean pass for this band (`dup_of = -1`).
    */
  case class GateVerdict(doc_id: Long, band: Int, is_dup: Boolean, dup_of: Long)

  /** Bounded bucket memory: newest-first ids and their sorted shingle
    * sets (public: the state encoder's generated code needs the
    * accessors).
    */
  case class BucketState(ids: List[Long], shs: List[Array[Long]])

  /** Internal band-bucket record — public because the Dataset encoder's
    * generated code must reach its accessors (same Janino constraint as
    * EventStream.SessionState).
    */
  case class BandDoc(band: Int, h0: Long, h1: Long,
                     doc_id: Long, sh: Array[Long])

  /** Per-(doc, band) near-dup verdicts over a streaming (or batch)
    * `Dataset[Doc]`. A doc with no shingles (under 2 tokens) emits a
    * single clean verdict on band -1 — it cannot reach jaccard ≥ t > 0
    * against anything, mirroring the batch path's skip rule.
    */
  def nearDupVerdicts(docs: Dataset[Doc], threshold: Double,
                      maxPerBucket: Int = 64): Dataset[GateVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nBands = TextOps.MinhashParams.size / TextOps.BandRows
    docs
      .flatMap { d =>
        val (sh, mh) = Dedup.docSignature(d.text)
        if (sh.isEmpty) Iterator.single(BandDoc(-1, 0L, 0L, d.doc_id, sh))
        else (0 until nBands).iterator.map { b =>
          BandDoc(b, mh(b * TextOps.BandRows), mh(b * TextOps.BandRows + 1), d.doc_id, sh)
        }
      }
      .groupByKey(bd => (bd.band, bd.h0, bd.h1))
      .flatMapGroupsWithState[BucketState, GateVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long, Long), batch: Iterator[BandDoc], state: GroupState[BucketState]) =>
          if (key._1 == -1) {
            // shingle-less docs: structurally clean, no state
            batch.map(bd => GateVerdict(bd.doc_id, -1, is_dup = false, dup_of = -1L))
          } else {
            var st = state.getOption.getOrElse(BucketState(Nil, Nil))
            val out = Seq.newBuilder[GateVerdict]
            batch.foreach { bd =>
              val hit = st.ids.iterator.zip(st.shs.iterator)
                .find { case (id, sh) =>
                  id != bd.doc_id && {
                    val inter = Dedup.sortedIntersectCount(bd.sh, sh)
                    inter.toDouble / (bd.sh.length + sh.length - inter) >= threshold
                  }
                }
              out += GateVerdict(bd.doc_id, key._1, hit.isDefined,
                hit.map(_._1).getOrElse(-1L))
              // always insert (newest first), FIFO-capped: keeping dups
              // too lets later copies match the freshest occurrence
              // even after the original ages out
              st = BucketState((bd.doc_id :: st.ids).take(maxPerBucket),
                (bd.sh :: st.shs).take(maxPerBucket))
            }
            state.update(st)
            out.result().iterator
          }
      }
  }

  /** Consume the gate: per micro-batch, reduce band verdicts to per-doc
    * admit/reject (a doc is rejected if ANY band flagged it) and append
    * admitted doc ids to `outDir` as parquet. Returns the started query
    * (Update output mode; the per-batch reduction runs as plain batch
    * operators inside foreachBatch).
    */
  def survivors(verdicts: Dataset[GateVerdict], outDir: String,
                checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    verdicts.writeStream
      .outputMode(OutputMode.Update)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[GateVerdict], _: Long) =>
        batch.groupBy("doc_id")
          .agg(max(col("is_dup")).as("rejected"))
          .filter(!col("rejected"))
          .select("doc_id")
          .write.mode("append").parquet(outDir)
      }
      .start()
}
