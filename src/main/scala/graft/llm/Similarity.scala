package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * All vector math is built from codegen'd higher-order functions
  * (`zip_with` + `aggregate` left-fold in double) — no UDFs. Elements are
  * cast float→double (exact) before any arithmetic, and the dot-product
  * fold is strictly left-to-right, so an external engine evaluating the
  * same fold reproduces the doubles bit-for-bit.
  *
  * Scale design: [[bruteForceTopK]] broadcasts the (small) query set and
  * scans the corpus once — linear, the right plan for "k queries vs 100 TB
  * corpus". The quadratic all-pairs form exists only as [[nearDupPairs]]
  * for small-SF oracles/tests. The sub-linear path is [[lshBuckets]] /
  * [[annTopK]]: sign-of-projection buckets against a fixed pseudo-random
  * hyperplane set, with Hamming-radius multiprobe; candidates come from a
  * bucket-equi-join, never a cross join.
  */
object Similarity {

  /** Cast an array<float> column to array<double> (exact widening). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Strict left-fold dot product of two array<double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Euclidean distance, as the same strict left fold as [[dot]] (so the
    * DuckDB mirror `sqrt(list_sum(list_transform(list_zip(a,b), …)))`
    * reproduces it bit-for-bit); sqrt is correctly rounded on both
    * engines (IEEE 754).
    */
  def euclidean(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine similarity of two array<double> columns. try_divide: a
    * zero-norm vector yields null (under ANSI a bare `/` would abort the
    * whole job with DIVIDE_BY_ZERO), and null never passes a `>= t`
    * filter nor ranks above real cosines in a desc sort — matching the
    * JVM baseline, where cos(zero, x) = NaN and IEEE `>=` excludes it.
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector: broadcast the query set,
    * one corpus scan, per-query row_number on (similarity desc, id asc).
    * Output: (query_id, rank, neighbor_id, cosine).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
    val scored = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")
  }

  /** All pairs (a < b) with cosine ≥ threshold — embedding near-dup.
    * Quadratic: small-SF oracle/test baseline only (collects + broadcasts
    * the vectors); the scale path is LSH-bucketed candidates + exact
    * confirmation on the candidate set. The tight loop reproduces the
    * declarative form's arithmetic exactly: float→double cast, strict
    * left-fold dot/norm accumulation, cos = dot/(normA*normB).
    */
  def nearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = corpus.repartition(spark.sparkContext.defaultParallelism)
      .select(col(idCol).cast("long"), toDouble(col(vecCol)))
      .as[(Long, Seq[Double])]
    val all = v.collect().map { case (id, e) =>
      val arr = e.toArray; (id, arr, normOf(arr))
    }.sortBy(_._1)
    val bc = spark.sparkContext.broadcast(all)
    v.flatMap { case (aId, aSeq) =>
      val a = aSeq.toArray
      val na = normOf(a)
      bc.value.iterator
        .filter(_._1 > aId)
        .flatMap { case (bId, b, nb) =>
          val cos = dotOf(a, b) / (na * nb)
          if (cos >= threshold) Some((aId, bId, cos)) else None
        }
    }.toDF("a_id", "b_id", "cos")
  }

  /** All pairs (a < b) with cosine ≥ threshold, computed as a distributed
    * block self-join — the registered exact path (no driver collect, no
    * broadcast of the corpus):
    *
    *   - each vector gets a block id `pmod(xxhash64(id), nBlocks)` and a
    *     precomputed norm (one map-side pass);
    *   - a tiny literal frame of the `nBlocks·(nBlocks+1)/2` unordered
    *     block pairs `(bi ≤ bj)` is broadcast onto the corpus, replicating
    *     each vector ~nBlocks/2 times (shuffle volume `O(n·nBlocks)` vector
    *     rows — NOT n²);
    *   - the equi-join on the second block key streams the n²/2 candidate
    *     pairs through the codegen'd [[graft.functions.DotProduct]] kernel
    *     and the threshold filter inside the join stage — pairs are never
    *     materialized to shuffle or driver.
    *
    * Per-task memory is one block of vectors (n/nBlocks rows): size
    * nBlocks to the cluster, not the data. The n²/2 dot products are
    * inherent to EXACT all-pairs similarity (use [[annTopK]]'s LSH buckets
    * when approximate recall is acceptable); this shape just distributes
    * them evenly. Arithmetic is identical to [[nearDupPairs]] / the HOF
    * form: float→double cast, strict left-fold dot and norms,
    * cos = dot/(normA·normB) — bit-for-bit reproducible on any engine.
    */
  /** (id, v double-cast, nrm) with a typed identity-map barrier: without
    * it CollapseProject inlines the float→double transform and the norm
    * into the join output, paying both once per PAIR instead of once per
    * vector — post-barrier the per-pair work is exactly one codegen'd
    * dot + one divide. Shared by the self-join and bipartite block paths.
    */
  private def preppedVectors(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorExpressions.vectorDot
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("nrm", sqrt(vectorDot(col("v"), col("v"))))
      .as[(Long, Seq[Double], Double)].map(identity).toDF("id", "v", "nrm")
  }

  def blockNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nBlocks: Int = 32): DataFrame = {
    import graft.functions.VectorExpressions.vectorDot
    val spark = corpus.sparkSession
    import spark.implicits._
    val v = preppedVectors(corpus, idCol, vecCol)
      .withColumn("blk", pmod(xxhash64(col("id")), lit(nBlocks.toLong)))
    val blockPairs = (0 until nBlocks)
      .flatMap(i => (i until nBlocks).map(j => (i.toLong, j.toLong)))
      .toDF("bi", "bj")
    val left = v.select(col("id").as("l_id"), col("v").as("lv"),
        col("nrm").as("ln"), col("blk").as("lb"))
      .join(broadcast(blockPairs), col("lb") === col("bi"))
    val joined = left.join(
      v.select(col("id").as("r_id"), col("v").as("rv"),
        col("nrm").as("rn"), col("blk").as("rb")),
      col("bj") === col("rb"))
    joined
      // cross-block pairs appear once (smaller block on the left); same-
      // block pairs appear in both orientations — keep one by id order
      .filter(col("lb") < col("rb") || col("l_id") < col("r_id"))
      // try_divide: zero-norm vectors yield null (ANSI `/` would abort the
      // job) and null fails the threshold filter — matching the JVM
      // baseline, where cos(zero, x) = NaN and IEEE `>=` excludes it. The
      // isnan guard covers NaN reaching cos any other way: Spark's total
      // ordering would otherwise rank NaN above every threshold.
      .withColumn("cos",
        try_divide(vectorDot(col("lv"), col("rv")), col("ln") * col("rn")))
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .select(least(col("l_id"), col("r_id")).as("a_id"),
        greatest(col("l_id"), col("r_id")).as("b_id"), col("cos"))
  }

  /** Bipartite cosine near-dup: every (batch_id, corpus_id, cos ≥
    * threshold) pair between a NEW embedding batch and an EXISTING
    * corpus — the embedding-space incremental-ingestion dedup. Never
    * compares batch-batch or corpus-corpus. The corpus is partitioned by
    * block hash and shuffled once; the (typically much smaller) batch is
    * replicated to every block — shuffle volume O(corpus + batch·nBlocks),
    * exact batch×corpus cosines streamed through the codegen'd
    * [[graft.functions.DotProduct]] kernel inside the join stage.
    * Arithmetic identical to [[blockNearDupPairs]].
    */
  def crossNearDupPairs(batch: DataFrame, corpus: DataFrame, idCol: String,
                        vecCol: String, threshold: Double,
                        nBlocks: Int = 32): DataFrame = {
    import graft.functions.VectorExpressions.vectorDot
    val c = preppedVectors(corpus, idCol, vecCol)
      .withColumn("blk", pmod(xxhash64(col("id")), lit(nBlocks.toLong)))
      .select(col("id").as("c_id"), col("v").as("cv"), col("nrm").as("cn"), col("blk"))
    val b = preppedVectors(batch, idCol, vecCol)
      .withColumn("blk", explode(array((0 until nBlocks).map(i => lit(i.toLong)): _*)))
      .select(col("id").as("b_id"), col("v").as("bv"), col("nrm").as("bn"), col("blk"))
    b.join(c, Seq("blk"))
      // try_divide + !isnan: zero-norm and NaN vectors can never pass the
      // threshold, matching the JVM baseline (see blockNearDupPairs)
      .withColumn("cos",
        try_divide(vectorDot(col("bv"), col("cv")), col("bn") * col("cn")))
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .select("b_id", "c_id", "cos")
  }

  /** LSH-bucketed cosine near-dup — the sub-quadratic SCALE path for
    * embedding near-dup (vs [[blockNearDupPairs]]' exact-all-pairs
    * semantics): candidate pairs are vectors whose sign-of-projection
    * buckets lie within Hamming distance `probeRadius`, confirmed by
    * exact cosine ≥ threshold. Deterministic end to end (fixed
    * [[hyperplanes]], plan-time probe enumeration), so the approximate
    * semantics still have one exact answer and a full SQL oracle.
    *
    * Shape: one map-side bucketing pass, the left side exploded
    * ×(probe-set size), then a bucket-equi join — shuffle volume
    * O(n·probes), never the n²/2 of all-pairs. A pair at bucket distance
    * d ≤ r matches on exactly one flip per orientation, and `l_id <
    * r_id` keeps one orientation — no dedup aggregation needed. Norms
    * are computed once per vector behind [[preppedVectors]]' typed
    * barrier; per-pair work is one codegen'd dot + one divide.
    */
  def lshNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                      threshold: Double, nPlanes: Int = 4, dim: Int = 64,
                      probeRadius: Int = 1): DataFrame = {
    import graft.functions.VectorExpressions.vectorDot
    val spark = corpus.sparkSession
    import spark.implicits._
    // fail FAST on a non-integral id column: the cast-to-long below would
    // turn e.g. a string id into null, making `l_id < r_id` unknown and
    // silently dropping every pair (empty result) — the same loud-failure
    // discipline lshBuckets applies to dim mismatches, at plan time
    Dedup.requireIntegralId(corpus, idCol, "lshNearDupPairs")
    // one bucketing pass; the typed identity-map barrier keeps the
    // float→double cast, norm, and bucket per-VECTOR (CollapseProject
    // would otherwise inline them into the join output, per PAIR)
    val b = lshBuckets(corpus, idCol, vecCol, nPlanes, dim)
      .select(col(idCol).cast("long").as("id"), col("v"),
        sqrt(vectorDot(col("v"), col("v"))).as("nrm"), col("bucket"))
      .as[(Long, Seq[Double], Double, Long)].map(identity)
      .toDF("id", "v", "nrm", "bucket")
    // probe set: identity + every bit-flip combination up to the radius
    val flips = hammingFlips(nPlanes, probeRadius)
    val left = b
      .select(col("id").as("l_id"), col("v").as("lv"), col("nrm").as("ln"),
        explode(array(flips.map(f => col("bucket").bitwiseXOR(lit(f))): _*)).as("bucket"))
    val right = b.select(col("id").as("r_id"), col("v").as("rv"),
      col("nrm").as("rn"), col("bucket"))
    left.join(right, Seq("bucket"))
      .filter(col("l_id") < col("r_id"))
      // try_divide + !isnan: zero-norm and NaN vectors can never pass the
      // threshold, matching the JVM baseline (see blockNearDupPairs)
      .withColumn("cos",
        try_divide(vectorDot(col("lv"), col("rv")), col("ln") * col("rn")))
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .select(col("l_id").as("a_id"), col("r_id").as("b_id"), col("cos"))
  }

  /** Strict left-fold dot product (same op order as [[dot]]). */
  private def dotOf(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Euclidean norm via the same fold as [[norm]]. */
  private def normOf(a: Array[Double]): Double = math.sqrt(dotOf(a, a))

  /** Deterministic pseudo-random hyperplane matrix: `planes` rows ×
    * `dim` cols, weights in [-10, 10] from integer arithmetic (no RNG —
    * reproducible across engines and runs).
    */
  def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim)((i, j) => ((i * 131 + j * 37) % 21 - 10).toDouble)

  /** Sign-of-projection LSH bucket id (one bit per hyperplane) as a
    * per-row expression over an array<double> vector column.
    */
  def bucketId(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (w, i) =>
      val proj = dot(vec, array(w.toIndexedSeq.map(lit): _*))
      when(proj > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Corpus with LSH bucket ids attached (map-side only; partition/bucket
    * the output by `bucket` to co-locate candidates).
    */
  def lshBuckets(corpus: DataFrame, idCol: String, vecCol: String,
                 nPlanes: Int = 4, dim: Int = 64): DataFrame = {
    // a dim mismatch would null every projection (zip_with pads with
    // null) and silently send ALL vectors to bucket 0 — the exact
    // quadratic blowup LSH exists to avoid; fail loudly instead. The
    // guard is per-row IN the plan (raise_error in the non-matching
    // branch): no extra driver action/job, catches a ragged vector
    // anywhere in the corpus (not just row 0), and an empty corpus
    // passes trivially.
    val vec = col(vecCol)
    // coalesce keeps the message non-null for NULL embeddings (size(null)
    // is null, and concat-with-null would hand raise_error a blank error)
    val checked = when(size(vec) === dim, toDouble(vec))
      .otherwise(raise_error(concat(
        lit(s"lshBuckets: expected dim=$dim but $vecCol has "),
        coalesce(size(vec).cast("string"), lit("NULL")), lit(" elements"))))
    val hp = hyperplanes(nPlanes, dim)
    corpus.select(col(idCol), checked.as("v"))
      .withColumn("bucket", bucketId(col("v"), hp))
  }

  // ---- IVF (inverted-file) ANN ----

  /** Array of the `nProbe` nearest centroids to `vec` as (score, idx)
    * structs, ordered by squared-L2 distance (ties → lowest index),
    * via the codegen'd [[graft.functions.NearestCentroids]] probe
    * (‖c‖² − 2·v·c ranks identically to ‖v−c‖² since ‖v‖² is constant
    * per row). The codebook rides a BROADCAST handle, not plan
    * literals: a literal codebook re-serializes into every task binary
    * of every plan that probes it — the ann_tuning_curve probe sweep
    * (7 unioned probe points) pushed task binaries past Spark's
    * 1000 KiB guidance that way.
    */
  private def nearestCentroids(
      vec: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]],
      nProbe: Int): Column =
    graft.functions.VectorExpressions.nearestCentroids(bc, vec, nProbe)

  /** Column: index of the single nearest centroid. */
  private def clusterOf(
      vec: Column,
      bc: org.apache.spark.broadcast.Broadcast[Array[Array[Double]]]): Column =
    element_at(nearestCentroids(vec, bc, 1), 1).getField("idx")

  /** Deterministic IVF coarse quantizer: Lloyd's k-means for a fixed
    * number of iterations from a deterministic seed (the `nClusters`
    * lowest-id vectors). Assignment and the per-cluster mean run
    * distributed (posexplode → grouped avg); only the codebook —
    * `nClusters·dim` doubles, a parameter rather than a data-sized
    * object — ever reaches the driver, exactly like any IVF index's
    * centroid table. Empty clusters keep their previous centroid.
    */
  def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                   nClusters: Int, iters: Int = 2): Array[Array[Double]] = {
    // persist across the 1 + iters training actions (seed collect + one
    // assignment/mean job per Lloyd round) — without it every round
    // re-scans and re-casts the corpus. At cluster scale, train the
    // codebook on a deterministic hash-sample instead of the full corpus
    // (the standard IVF practice); the training set is what you persist.
    val v = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v")).persist()
    try {
      var centroids = v.orderBy("id").limit(nClusters)
        .select("v").collect().map(_.getSeq[Double](0).toArray)
      var it = 0
      while (it < iters) {
        // decimal partial sums are exact, so the merge order of shuffle
        // fetches cannot perturb the mean in the last ulp — the codebook
        // is bit-reproducible run to run, as the determinism contract
        // requires. Sum-then-cast-then-divide (not decimal division):
        // exact sum → one double rounding → one IEEE divide, the exact
        // sequence an external oracle reproduces
        // per-round broadcast of the evolving codebook (k·dim doubles;
        // torn down with the session, negligible vs re-literalizing it
        // into every assignment task)
        val cbc = v.sparkSession.sparkContext.broadcast(centroids)
        val means = v
          .withColumn("cluster", clusterOf(col("v"), cbc))
          .select(col("cluster"), posexplode(col("v")))
          .groupBy("cluster", "pos")
          .agg((sum(col("col").cast("decimal(38,18)")).cast("double") / count(lit(1)))
            .as("m"))
          .collect()
          .groupBy(_.getAs[Int]("cluster"))
        centroids = Array.tabulate(centroids.length) { i =>
          means.get(i)
            .map(_.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")))
            .getOrElse(centroids(i))
        }
        it += 1
      }
      centroids
    } finally v.unpersist()
  }

  /** IVF approximate top-k: corpus rows are bucketed by nearest centroid
    * (one scan, one int per row); each query probes its `nProbe` nearest
    * clusters and candidates come from a cluster-equi join — the corpus
    * side is scanned once and never crossed. Exact cosine + row_number
    * rank within candidates. A corpus row sits in exactly one cluster,
    * so multiprobe never duplicates a candidate.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nClusters: Int = 16, nProbe: Int = 4,
              iters: Int = 2): DataFrame =
    ivfTopKWith(corpus, queries, idCol, vecCol, k,
      ivfCentroids(corpus, idCol, vecCol, nClusters, iters), nProbe)

  /** [[ivfTopK]] against a prebuilt codebook — the production shape (an
    * IVF index trains once and serves many queries/probe settings; a
    * recall sweep over nProbe must not re-run k-means per point).
    */
  def ivfTopKWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                  vecCol: String, k: Int, cs: Array[Array[Double]],
                  nProbe: Int): DataFrame =
    ivfCandidatesWith(corpus, queries, idCol, vecCol, cs, nProbe)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")

  /** The raw candidate set the IVF probe examines — (query_id,
    * neighbor_id, cos) BEFORE the top-k rank; the cost axis of a
    * recall/nProbe sweep (see [[annCandidatesWith]]).
    */
  def ivfCandidatesWith(corpus: DataFrame, queries: DataFrame, idCol: String,
                        vecCol: String, cs: Array[Array[Double]],
                        nProbe: Int): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cs)
    val c = corpus.select(col(idCol).as("neighbor_id"), toDouble(col(vecCol)).as("cv"))
      .withColumn("cluster", clusterOf(col("cv"), bc))
    val q = queries.select(col(idCol).as("query_id"), toDouble(col(vecCol)).as("qv"))
      .withColumn("cluster",
        explode(transform(nearestCentroids(col("qv"), bc, nProbe), s => s.getField("idx"))))
    c.join(broadcast(q), Seq("cluster"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cos")
  }

  /** Approximate top-k: candidates are corpus vectors whose bucket is
    * within Hamming distance `probeRadius` of the query's bucket
    * (multiprobe); exact cosine + row_number within candidates. The join
    * is bucket-equi (query side exploded ×(1+nPlanes choose ≤radius)) —
    * sub-linear per query when buckets are balanced.
    */
  def annTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 4, dim: Int = 64,
              probeRadius: Int = 1): DataFrame =
    annTopKWith(
      lshBuckets(corpus, idCol, vecCol, nPlanes, dim)
        .select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("bucket")),
      lshBuckets(queries, idCol, vecCol, nPlanes, dim)
        .select(col(idCol).as("query_id"), col("v").as("qv"), col("bucket")),
      k, nPlanes, probeRadius)

  /** [[annTopK]] against prebuilt bucket tables — the production shape
    * (an LSH index is bucketed once and serves many queries/probe
    * radii; a recall sweep must not re-bucket the corpus per point).
    * `corpusBuckets` = (neighbor_id, cv, bucket), `queryBuckets` =
    * (query_id, qv, bucket), both as produced by [[lshBuckets]].
    */
  /** All XOR masks within Hamming distance `radius` of a bucket id (the
    * identity mask included) — the plan-time probe enumeration shared by
    * [[annTopKWith]] and the DuckDB oracles (single source of truth: a
    * drifted copy would silently desynchronize index and oracle).
    */
  def hammingFlips(nPlanes: Int, radius: Int): Seq[Long] = {
    def combos(bits: Seq[Int], r: Int): Seq[Seq[Int]] =
      if (r == 0) Seq(Seq.empty)
      else bits.combinations(r).toSeq ++ combos(bits, r - 1)
    combos(0 until nPlanes, radius).map(_.map(1L << _).foldLeft(0L)(_ ^ _)).distinct
  }

  def annTopKWith(corpusBuckets: DataFrame, queryBuckets: DataFrame,
                  k: Int, nPlanes: Int, probeRadius: Int): DataFrame =
    annCandidatesWith(corpusBuckets, queryBuckets, nPlanes, probeRadius)
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("cos"), col("neighbor_id"))).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cos")

  /** The raw candidate set the LSH probe examines — (query_id,
    * neighbor_id, cos) BEFORE the top-k rank. Exposed so recall
    * evaluations can report the COST axis (candidates scanned per
    * query) next to recall: that pair is the actual tuning trade.
    */
  def annCandidatesWith(corpusBuckets: DataFrame, queryBuckets: DataFrame,
                        nPlanes: Int, probeRadius: Int): DataFrame = {
    // enumerate probe buckets: the query bucket plus all buckets within
    // the Hamming radius (bit flips enumerated at plan time)
    val flips = hammingFlips(nPlanes, probeRadius)
    val q = queryBuckets
      .withColumn("bucket", explode(array(flips.map(f => col("bucket").bitwiseXOR(lit(f))): _*)))
    corpusBuckets.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
      .select("query_id", "neighbor_id", "cos")
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, then mark
    * near-duplicates ONLY within each cluster — a row is a duplicate iff
    * some lower-id member of its own cluster sits at cosine ≥ threshold.
    * Keep-lowest-id is the deterministic stand-in for the paper's
    * keep-one-per-ε-ball; `dup_of` is the lowest-id such witness and
    * `cos` its similarity (row_number over a_id, not max(cos), so the
    * reported pair is a single well-defined one).
    *
    * Scale shape: this is THE trick that makes embedding dedup tractable
    * at corpus scale — the quadratic comparison runs inside k-means
    * cells, never across the corpus. k grows with the corpus so cell
    * sizes stay bounded (n/k rows per cell ⇒ n·(n/k) pair work, linear
    * in n at fixed cell size); the per-cell self-join shuffles on the
    * cluster id only, and the codebook is an O(k·dim) broadcast handle
    * exactly as in [[ivfTopKWith]]. Every step reuses the deterministic
    * IVF machinery ([[ivfCentroids]] seeds/decimal means, the
    * `nearest_centroids` assignment expression), so the "approximate"
    * result has one exact answer an external oracle reproduces.
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
                    threshold: Double, nClusters: Int = 8,
                    iters: Int = 2): DataFrame = {
    val cs = ivfCentroids(corpus, idCol, vecCol, nClusters, iters)
    semanticDedupWith(corpus, idCol, vecCol, threshold, cs)
  }

  /** (id, cluster) assignment of every corpus row against a codebook —
    * the coarse-quantizer step of [[semanticDedupWith]]/[[ivfTopKWith]]
    * exposed on its own (cluster-balance diagnostics, index persistence).
    */
  def clusterAssignments(corpus: DataFrame, idCol: String, vecCol: String,
                         cs: Array[Array[Double]]): DataFrame = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cs)
    corpus.select(col(idCol).cast("long").as("id"), toDouble(col(vecCol)).as("v"))
      .withColumn("cluster", clusterOf(col("v"), bc).cast("long"))
  }

  /** [[semanticDedup]] against a prebuilt codebook — the production
    * shape (dedup reruns on corpus deltas reuse the trained clustering).
    */
  def semanticDedupWith(corpus: DataFrame, idCol: String, vecCol: String,
                        threshold: Double,
                        cs: Array[Array[Double]]): DataFrame =
    semanticDedupOn(clusterAssignments(corpus, idCol, vecCol, cs), threshold)

  // ---- PQ (product quantization) ----

  /** Deterministic product-quantization codebooks (Jégou et al. 2011):
    * the vector space splits into `m` contiguous subspaces of dim/m
    * dims, and each subspace trains its own k-codeword codebook by the
    * SAME deterministic Lloyd chain as [[ivfCentroids]] over the sliced
    * corpus (lowest-id seeds, decimal-exact means) — so the "trained"
    * index has one exact answer an external oracle reproduces. Returns
    * codebooks(subspace)(codeword)(pos): m·k·(dim/m) doubles total —
    * parameter-sized, the IVF-codebook convention (only parameters ever
    * reach the driver; train on a hash-sample at cluster scale).
    */
  def pqCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
                  m: Int, k: Int, iters: Int = 2): Array[Array[Array[Double]]] = {
    // dim is inferred from row 0, so guard both failure shapes (r9
    // ADVICE): an EMPTY corpus has no row 0 — name the problem instead
    // of a bare NoSuchElementException; a RAGGED corpus (one short
    // vector anywhere) would let slice() silently null-pad that row's
    // subvectors and train garbage codebooks — fail per-row IN the plan
    // (the lshBuckets raise_error convention: no extra driver job,
    // catches the bad row wherever it is).
    val dimRow = corpus.select(size(col(vecCol)).as("d")).limit(1).collect()
    require(dimRow.nonEmpty,
      s"pqCodebooks: empty corpus - cannot infer dim from $vecCol")
    val dim = dimRow(0).getInt(0)
    require(dim % m == 0, s"pqCodebooks: dim $dim not divisible by m=$m")
    val sub = dim / m
    val vec = col(vecCol)
    val checked = when(size(vec) === dim, vec)
      .otherwise(raise_error(concat(
        lit(s"pqCodebooks: expected dim=$dim but $vecCol has "),
        coalesce(size(vec).cast("string"), lit("NULL")), lit(" elements"))))
    // All m subspace Lloyd chains batched into ONE frame: one persist,
    // one seed collect, one assignment/mean action per round — the old
    // per-subspace ivfCentroids loop ran m·(2+iters) driver actions
    // over the same rows (m=8: 32 serial scheduler round-trips, ~2.3 s
    // of pure fixed cost on this box, r12 profile). The arithmetic is
    // the byte-identical slice → nearest-centroid → decimal-exact mean
    // chain, just keyed by subspace: seeds are the same k lowest-id
    // rows' slices, assignment dispatches each exploded slice to its
    // own subspace codebook, and the (subspace, cluster, pos) decimal
    // sums regroup the exact same addends (order-exact, so the merged
    // grouping cannot perturb a ulp). Empty clusters keep their
    // previous centroid per subspace, as before.
    val sc = corpus.sparkSession.sparkContext
    val sliced = corpus.select(col(idCol).as("id"),
        array((0 until m).map(si =>
          toDouble(slice(checked, si * sub + 1, sub))): _*).as("subs"))
      .persist()
    try {
      val seedRows = sliced.orderBy("id").limit(k).select("subs").collect()
      var cbs: Array[Array[Array[Double]]] = Array.tabulate(m) { si =>
        seedRows.map(_.getSeq[scala.collection.Seq[Double]](0)(si).toArray)
      }
      var it = 0
      while (it < iters) {
        val bcs = cbs.map(cb => sc.broadcast(cb))
        val clusterExpr = (0 until m).foldRight(lit(null).cast("int")) {
          case (si, acc) => when(col("si") === si,
            clusterOf(col("sv"), bcs(si))).otherwise(acc)
        }
        val means = sliced
          .select(posexplode(col("subs")).as(Seq("si", "sv")))
          .withColumn("cluster", clusterExpr)
          .select(col("si"), col("cluster"), posexplode(col("sv")))
          .groupBy("si", "cluster", "pos")
          .agg((sum(col("col").cast("decimal(38,18)")).cast("double") / count(lit(1)))
            .as("m"))
          .collect()
          .groupBy(r => (r.getAs[Int]("si"), r.getAs[Int]("cluster")))
        cbs = Array.tabulate(m) { si =>
          Array.tabulate(k) { cl =>
            means.get((si, cl))
              .map(_.sortBy(_.getAs[Int]("pos")).map(_.getAs[Double]("m")).toArray)
              .getOrElse(cbs(si)(cl))
          }
        }
        it += 1
      }
      cbs
    } finally sliced.unpersist()
  }

  /** The trained codebooks as a parameter-sized DataFrame
    * (subspace, cl, cvec) — the join-side shape of the ADC lookup
    * tables and the distortion report (m·k rows; always broadcast).
    */
  def pqCodebookDf(spark: org.apache.spark.sql.SparkSession,
                   cbs: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    cbs.zipWithIndex.flatMap { case (cb, si) =>
      cb.zipWithIndex.map { case (c, cl) => (si.toLong, cl.toLong, c.toSeq) }
    }.toSeq.toDF("subspace", "cl", "cvec")
  }

  /** PQ code assignment, long form (vec_id, subspace, code): ONE corpus
    * scan computes all m sub-assignments (each a broadcast-codebook
    * nearest-centroid probe over the slice), then stacks them — the
    * fact-sized side of every ADC query plan.
    */
  def pqCodes(corpus: DataFrame, idCol: String, vecCol: String,
              cbs: Array[Array[Array[Double]]]): DataFrame = {
    val sc = corpus.sparkSession.sparkContext
    val sub = cbs(0)(0).length
    val bcs = cbs.map(cb => sc.broadcast(cb))
    val wide = corpus.select(
      col(idCol).cast("long").as("vec_id") +:
        bcs.zipWithIndex.map { case (bc, si) =>
          clusterOf(slice(toDouble(col(vecCol)), si * sub + 1, sub), bc)
            .cast("long").as(s"c$si")
        }.toSeq: _*)
    wide.selectExpr("vec_id",
      s"stack(${cbs.length}, " +
        cbs.indices.map(i => s"CAST($i AS BIGINT), c$i").mkString(", ") +
        ") AS (subspace, code)")
  }

  /** Per-(query, subspace, codeword) ADC lookup table: the squared-L2
    * distance from the query's slice to every codeword, per-position
    * terms 8dp-floor-rounded into an exact DECIMAL sum (the engine-
    * portable spelling — see the ANN oracles). Parameter-sized
    * (|queries|·m·k rows); the corpus never appears.
    */
  def pqAdcLut(queries: DataFrame, idCol: String, vecCol: String,
               cbs: Array[Array[Array[Double]]]): DataFrame = {
    val sub = cbs(0)(0).length
    val cbDf = pqCodebookDf(queries.sparkSession, cbs)
    queries.select(col(idCol).cast("long").as("query_id"),
        toDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cbDf))
      .select(col("query_id"), col("subspace"), col("cl"),
        posexplode(col("cvec")).as(Seq("pos", "cval")),
        col("qv"))
      .withColumn("qval",
        element_at(col("qv"), (col("subspace") * sub + col("pos") + 1).cast("int")))
      .withColumn("t",
        (floor((col("qval") - col("cval")) * (col("qval") - col("cval"))
          * lit(1e8) + lit(0.5)) / lit(1e8)).cast("decimal(28,8)"))
      .groupBy("query_id", "subspace", "cl")
      .agg(sum(col("t")).as("d2"))
  }

  /** PQ asymmetric-distance top-k: corpus rows are scanned as CODES
    * only (m small ints per vector — the 8–32× memory shape that lets
    * a 100 TB corpus serve ANN from RAM); each query's distance to a
    * corpus vector is the exact DECIMAL sum of m LUT entries. The LUT
    * is parameter-sized and broadcast; the only fact-sized flow is
    * codes → per-(query, vec) partial aggregate → top-k.
    */
  def pqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, cbs: Array[Array[Array[Double]]],
                k: Int): DataFrame = {
    val codes = pqCodes(corpus, idCol, vecCol, cbs)
    val lut = pqAdcLut(queries, idCol, vecCol, cbs)
    codes.join(broadcast(lut),
        codes("subspace") === lut("subspace") && codes("code") === lut("cl"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d2")).as("adc_dec"))
      .withColumn("adc",
        floor(col("adc_dec").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dec"), col("neighbor_id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc")
  }

  /** IVFADC (Jégou et al. 2011, the FAISS production shape): an IVF
    * coarse quantizer restricts the search to `nProbe` cells, and a
    * GLOBAL product quantizer over the RESIDUALS (vector − its cell
    * centroid) scores candidates by asymmetric distance — residual
    * encoding is what makes m·k tiny codebooks accurate, because
    * residual magnitudes are a fraction of the raw vectors'. All
    * training is the deterministic Lloyd chain (one exact answer);
    * residual subtraction is exact IEEE on both engines because the
    * centroids are decimal-exact means. Per query the only fact-sized
    * flow is the probed cells' codes → per-(query, vec) decimal
    * aggregate → top-k; codebooks and LUTs are parameter-sized.
    */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, coarseK: Int, nProbe: Int,
                m: Int, pqK: Int, iters: Int = 2): DataFrame = {
    val sc = corpus.sparkSession.sparkContext
    val cs = ivfCentroids(corpus, idCol, vecCol, coarseK, iters)
    val coarseDf = broadcast(pqCodebookDf(corpus.sparkSession,
      Array(cs)).select(col("cl").as("cluster"), col("cvec").as("cent")))
    // residual corpus: (vec_id, embedding := v − cent(cluster), cluster)
    val bc = sc.broadcast(cs)
    val resid = corpus
      .select(col(idCol).cast("long").as("vec_id"),
        toDouble(col(vecCol)).as("v"))
      .withColumn("cluster", clusterOf(col("v"), bc).cast("long"))
      .join(coarseDf, "cluster")
      .select(col("vec_id"), col("cluster"),
        zip_with(col("v"), col("cent"), (a, b) => a - b).as(vecCol))
      .localCheckpoint(false) // trains the PQ codebooks AND gets coded
    val cbs = pqCodebooks(resid, "vec_id", vecCol, m, pqK, iters)
    val sub = cbs(0)(0).length
    val codes = pqCodes(resid, "vec_id", vecCol, cbs)
      .join(resid.select(col("vec_id"), col("cluster")), "vec_id")
    // per-(query, probed-cell) residual, then the ADC LUT against the
    // global residual codebook — |queries|·nProbe·m·pqK rows, broadcast
    val q0 = queries.select(col(idCol).cast("long").as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    val qr = q0
      .withColumn("cluster",
        explode(transform(nearestCentroids(col("qv"), bc, nProbe),
          s => s.getField("idx").cast("long"))))
      .join(coarseDf, "cluster")
      .select(col("query_id"), col("cluster"),
        zip_with(col("qv"), col("cent"), (a, b) => a - b).as("qres"))
    val cbDf = pqCodebookDf(corpus.sparkSession, cbs)
    val lut = qr.crossJoin(broadcast(cbDf))
      .select(col("query_id"), col("cluster"), col("subspace"), col("cl"),
        posexplode(col("cvec")).as(Seq("pos", "cval")), col("qres"))
      .withColumn("qval", element_at(col("qres"),
        (col("subspace") * sub + col("pos") + 1).cast("int")))
      .withColumn("t",
        (floor((col("qval") - col("cval")) * (col("qval") - col("cval"))
          * lit(1e8) + lit(0.5)) / lit(1e8)).cast("decimal(28,8)"))
      .groupBy("query_id", "cluster", "subspace", "cl")
      .agg(sum(col("t")).as("d2"))
    codes.join(broadcast(lut),
        codes("cluster") === lut("cluster") &&
          codes("subspace") === lut("subspace") && codes("code") === lut("cl"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id").as("neighbor_id"))
      .agg(sum(col("d2")).as("adc_dec"))
      .withColumn("adc",
        floor(col("adc_dec").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("adc_dec"), col("neighbor_id")))
        .cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "adc")
  }

  /** The within-cell pair stage over an existing (id, v, cluster)
    * assignment — split out so callers can interpose the cell-size
    * guard (CoreQueries.blockSizeGuard) or a custom assignment between
    * quantization and the quadratic stage.
    */
  def semanticDedupOn(assigned: DataFrame, threshold: Double): DataFrame = {
    val a = assigned.select(col("cluster"), col("id").as("dup_of"), col("v").as("av"))
    val b = assigned.select(col("cluster"), col("id").as("vec_id"), col("v").as("bv"))
    a.join(b, Seq("cluster"))
      .filter(col("dup_of") < col("vec_id"))
      .withColumn("cos", cosine(col("av"), col("bv")))
      .filter(!isnan(col("cos")) && col("cos") >= threshold)
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy("dup_of")))
      .filter(col("rn") === 1)
      .select("vec_id", "cluster", "dup_of", "cos")
  }
}
