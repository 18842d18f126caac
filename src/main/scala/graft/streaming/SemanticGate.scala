package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SEMANTIC near-dup ingest gate — the unbounded-stream analog
  * of the batch SemDeDup path ([[graft.llm.Similarity.semanticDedup]]),
  * and the embedding-space sibling of [[DedupStream]]'s MinHash gate:
  * vectors arrive continuously and each is admitted or rejected against
  * the representatives already kept in ITS OWN k-means cell, without
  * ever holding the corpus or comparing across cells.
  *
  * Shape: the codebook is trained offline (batch
  * [[graft.llm.Similarity.ivfCentroids]] — an index artifact, exactly
  * like any production ANN/dedup deployment) and ships as a broadcast
  * handle; each arriving vector computes its nearest cell JVM-side with
  * the SAME arithmetic as the batch `nearest_centroids` expression
  * (score = ‖c‖² − 2·v·c, left-fold dots, ties to the lowest index — so
  * stream and batch agree bit-for-bit on assignment), then the keyed
  * shuffle is on the cell id only. Each cell keeps a BOUNDED FIFO of
  * ADMITTED representatives: a newcomer at cosine ≥ threshold to any of
  * them is rejected (with the witness id and similarity); otherwise it
  * is admitted and becomes a representative itself. Admitting only
  * survivors keeps state bounded by the cell's ε-net diversity, not by
  * stream volume — and gives the gate its core guarantee: the admitted
  * set within a cell is pairwise BELOW the threshold (while nothing has
  * been evicted; after FIFO eviction recall degrades gracefully with
  * age, the same finite-memory trade as the MinHash gate).
  *
  * Cosines use the exact IEEE op sequence of the batch
  * `Similarity.cosine` fold (dot / (√dot(a,a) · √dot(b,b))), so a
  * stream-vs-batch comparison is an equality check, not an
  * approximate one. Zero-norm vectors are structurally clean (cell -1,
  * no state) — cos(0, x) is NaN and never reaches a threshold, the
  * batch path's isnan rule.
  */
object SemanticGate {

  case class Vec(vec_id: Long, embedding: Array[Float])

  /** One verdict per vector: its cell, whether it duplicates an already
    * admitted representative, that witness (`dup_of`, −1 if clean) and
    * the witnessing cosine (NaN if clean).
    */
  case class GateVerdict(vec_id: Long, cluster: Int, is_dup: Boolean,
                         dup_of: Long, cos: Double)

  /** Bounded per-cell memory: newest-first admitted ids, their vectors
    * and their MEMOIZED norms — `sqrt(dot(w, w))` is a pure function of
    * the stored vector, so computing it once at admission (instead of
    * once per comparison per arrival) changes no IEEE op in the cosine
    * itself: `dot(v,w) / (vNorm * wNorm)` sees bit-identical operands
    * either way, preserving the batch-parity contract. (Public: the
    * state encoder's generated code needs the accessors.)
    */
  case class CellState(ids: List[Long], vecs: List[Array[Double]],
                       norms: List[Double])

  /** Internal assigned record (public for the Dataset encoder, the
    * Janino constraint shared with DedupStream.BandDoc).
    */
  case class CellVec(cluster: Int, vec_id: Long, v: Array[Double])

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Nearest cell by ‖c‖² − 2·v·c with ties to the lowest index — the
    * byte-for-byte JVM mirror of `CentroidIndex.nearest(v, 1)`.
    */
  private[graft] def nearestCell(cents: Array[Array[Double]],
                                 norms: Array[Double],
                                 v: Array[Double]): Int = {
    var best = 0; var bestScore = Double.PositiveInfinity
    var j = 0
    while (j < cents.length) {
      val s = norms(j) - 2.0 * dot(v, cents(j))
      if (s < bestScore) { bestScore = s; best = j }
      j += 1
    }
    best
  }

  /** Per-vector admit/reject verdicts over a streaming (or batch)
    * `Dataset[Vec]` against a pretrained codebook.
    */
  def verdicts(vecs: Dataset[Vec], codebook: Array[Array[Double]],
               threshold: Double, maxPerCell: Int = 256): Dataset[GateVerdict] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(codebook)
    vecs
      .mapPartitions { it =>
        val cents = bc.value
        val norms = cents.map(c => dot(c, c))
        val dim = if (cents.isEmpty) 0 else cents(0).length
        it.map { r =>
          // a ragged vector would silently TRUNCATE the JVM dot loops
          // (the batch expressions null out on length mismatch) — route
          // it to the structurally-clean cell with the zero vectors
          // rather than let it poison a real cell's comparisons
          val v = new Array[Double](r.embedding.length)
          var i = 0
          while (i < v.length) { v(i) = r.embedding(i).toDouble; i += 1 }
          val cell =
            if (v.length != dim || dot(v, v) == 0.0) -1
            else nearestCell(cents, norms, v)
          CellVec(cell, r.vec_id, v)
        }
      }
      .groupByKey(_.cluster)
      .flatMapGroupsWithState[CellState, GateVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (cell: Int, batch: Iterator[CellVec], state: GroupState[CellState]) =>
          if (cell == -1) {
            batch.map(cv => GateVerdict(cv.vec_id, -1, is_dup = false,
              dup_of = -1L, cos = Double.NaN))
          } else {
            var st = state.getOption.getOrElse(CellState(Nil, Nil, Nil))
            val out = Seq.newBuilder[GateVerdict]
            batch.foreach { cv =>
              val vNorm = math.sqrt(dot(cv.v, cv.v))
              var hitId = -1L
              var hitCos = Double.NaN
              val ids = st.ids.iterator
              val vs = st.vecs.iterator
              val ns = st.norms.iterator
              while (hitId == -1L && ids.hasNext) {
                val id = ids.next(); val w = vs.next(); val wNorm = ns.next()
                if (id != cv.vec_id) {
                  val c = dot(cv.v, w) / (vNorm * wNorm)
                  if (c >= threshold) { hitId = id; hitCos = c }
                }
              }
              out += GateVerdict(cv.vec_id, cell, hitId != -1L, hitId, hitCos)
              if (hitId == -1L) {
                // admitted → becomes a representative (newest first,
                // FIFO-capped); rejects are NOT stored — state tracks
                // the cell's ε-net, not its traffic
                st = CellState((cv.vec_id :: st.ids).take(maxPerCell),
                  (cv.v :: st.vecs).take(maxPerCell),
                  (vNorm :: st.norms).take(maxPerCell))
              }
            }
            state.update(st)
            out.result().iterator
          }
      }
  }
}
