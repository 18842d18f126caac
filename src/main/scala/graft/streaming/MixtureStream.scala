package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming mixture-budget ingest gate — the unbounded-stream arm of
  * the batch mixture planners (`mixture_rebalance` computes per-source
  * rates, `temperature_mixture` the α-scaled variant): documents arrive
  * continuously and each is admitted while its source still has token
  * budget, so the admitted stream realizes a PLANNED mixture without
  * ever seeing the corpus.
  *
  * Shape: the per-source token budgets are an offline planning artifact
  * (exactly like [[SemanticGate]]'s codebook — a batch job computes
  * them, the stream enforces them) and ship as a broadcast handle. The
  * keyed shuffle is on `source` only, and per-source state is a SINGLE
  * running counter of admitted tokens — state bounded by source
  * cardinality, the smallest of the gate family (the MinHash gate holds
  * shingle sets, the semantic gate vectors; this holds one long).
  *
  * Admission is greedy in doc_id order WITHIN each micro-batch (and
  * batch-arrival order across batches): a doc that would overflow the
  * remaining budget is rejected, but the source stays open — a later,
  * smaller doc may still fit (greedy knapsack, the rule a budgeted
  * sampler wants; terminal close-on-first-overflow would under-fill
  * every source whose doc sizes vary). The within-batch sort exists
  * because groupByKey's shuffle orders only by KEY — same-source rows
  * arriving from multiple upstream partitions would otherwise
  * interleave non-deterministically, making which doc gets the last
  * budget tokens a partition-race (invisible with single-partition
  * MemoryStream feeds, real on any sharded source). Sorting the group
  * iterator by doc_id pins one verdict per input, any partitioning.
  * The buffer this costs is one micro-batch's single-source slice —
  * trigger-bounded, not stream-bounded. Unknown sources are rejected
  * explicitly: a budget gate must not silently pass traffic the plan
  * never saw.
  */
object MixtureStream {

  case class DocTokens(doc_id: Long, source: String, n_tok: Long)

  /** One verdict per doc: admitted or not, and the source's admitted
    * token total AFTER this doc (unchanged on reject).
    */
  case class BudgetVerdict(doc_id: Long, source: String, n_tok: Long,
                           admitted: Boolean, cum_tokens: Long)

  /** Per-source admitted-token counter (public: the state encoder's
    * generated code needs the accessor — the Janino constraint shared
    * with the other gates' state classes).
    */
  case class SrcState(admitted: Long)

  def verdicts(docs: Dataset[DocTokens],
               budgets: Map[String, Long]): Dataset[BudgetVerdict] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(budgets)
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[SrcState, BudgetVerdict](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (source: String, batch: Iterator[DocTokens], state: GroupState[SrcState]) =>
          bc.value.get(source) match {
            case None =>
              // unplanned source: reject loudly (cum 0), no state kept
              batch.map(d => BudgetVerdict(d.doc_id, source, d.n_tok,
                admitted = false, cum_tokens = 0L))
            case Some(budget) =>
              var st = state.getOption.getOrElse(SrcState(0L))
              val out = Seq.newBuilder[BudgetVerdict]
              // deterministic greedy order: see the scaladoc — shuffle
              // delivery order within a key is a partition race
              batch.toSeq.sortBy(_.doc_id).foreach { d =>
                val fits = d.n_tok >= 0 && st.admitted + d.n_tok <= budget
                if (fits) st = SrcState(st.admitted + d.n_tok)
                out += BudgetVerdict(d.doc_id, source, d.n_tok, fits, st.admitted)
              }
              state.update(st)
              out.result().iterator
          }
      }
  }
}
