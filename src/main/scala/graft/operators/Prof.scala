package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

// Temporary stage-level profiler for the graph-family constant-factor hunt.
object Prof {
  private def time(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val q = sys.env.getOrElse("SPARK_GRAFT_PROF_Q", "pagerank")
    // warm-up: file indexes + codegen
    Seq("lineitem", "documents").foreach(t =>
      s.read.parquet(s"$dir/$t.parquet").count())
    if (q == "allpairs_stages") {
      import org.apache.spark.sql.functions._
      val iters = 3
      (1 to iters).foreach { i =>
        val d = s.read.parquet(s"$dir/documents.parquet")
          .filter(col("doc_id") < 1000)
        val np = 32
        time(s"[$i] tfidf_weights") {
          graft.llm.AllPairs.tfidfUnitWeights(d, "doc_id", "text")
        }
        val u = org.apache.spark.sql.graftbridge.CheckpointBridge
          .partitionedCheckpoint(
            graft.llm.AllPairs.tfidfUnitWeights(d, "doc_id", "text"), np,
            Seq("id"), Seq("id", "sdf", "token"))
        time(s"[$i] ckpt_materialize") { u.select("id") }
        import org.apache.spark.sql.expressions.Window
        def r6(c: org.apache.spark.sql.Column) =
          floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
        val maxw = u.groupBy("token").agg(max("u").as("maxw"))
        val contrib = u.join(maxw, "token")
          .withColumn("tail", sum(r6(col("u") * col("maxw"))
            .cast("decimal(18,6)")).over(
            Window.partitionBy("id").orderBy(col("sdf"), col("token"))
              .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
        val prefix = contrib.filter(col("tail").cast("double") >= lit(0.9))
        time(s"[$i] prefix") { prefix }
        val cand = prefix.select(col("token"), col("id").as("a_id"))
          .repartition(np, col("token"))
          .join(prefix.select(col("token"), col("id").as("b_id")), Seq("token"))
          .filter(col("a_id") < col("b_id"))
          .select("a_id", "b_id").distinct()
          .repartition(np, col("a_id"))
        time(s"[$i] candidates") { cand }
        time(s"[$i] full") {
          graft.llm.AllPairs.tfidfNearDupPairs(d, "doc_id", "text", 0.9)
            .orderBy("a_id", "b_id")
        }
        println(s"PROF [$i] cand_count " + cand.count())
      }
    } else if (q == "cc_stages") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.graftbridge.CheckpointBridge
      (1 to 3).foreach { i =>
        val bo = s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("items"))
        val e0 = bo.select(explode(col("items")).as("src"), col("items"))
          .select(col("src"), explode(col("items")).as("dst"))
          .filter(col("src") < col("dst"))
        val t0 = System.nanoTime()
        val e = CheckpointBridge.partitionedCheckpoint(e0, 32, Seq("src"),
          Seq("src", "dst"), dedupSorted = true, declareStats = false)
        time(s"[$i] edge_ckpt") { e.limit(1) }
        val dk = e.select(explode(array(col("src"), col("dst"))).as("n"))
          .groupBy("n").agg(count(lit(1)).as("d")).localCheckpoint(false)
        time(s"[$i] degrees") { dk.limit(1) }
        val oriented0 = e
          .join(dk.select(col("n").as("src"), col("d").as("ds")), "src")
          .join(dk.select(col("n").as("dst"), col("d").as("dd")), "dst")
          .select(when(col("ds") < col("dd") ||
              (col("ds") === col("dd") && col("src") < col("dst")),
              struct(col("src").as("u"), col("dst").as("v"), col("dd").as("dv")))
            .otherwise(struct(col("dst").as("u"), col("src").as("v"),
              col("ds").as("dv"))).as("o"))
          .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
        val oriented = CheckpointBridge.partitionedCheckpoint(oriented0, 32,
          Seq("u"), Seq("u"), declareStats = false)
        time(s"[$i] oriented_ckpt") { oriented.limit(1) }
        val tb = System.nanoTime()
        val edgeBloom = s.sparkContext.broadcast(
          oriented.select(xxhash64(least(col("u"), col("v")),
            greatest(col("u"), col("v"))).as("k"))
            .stat.bloomFilter("k", 4000000L, 1L << 23))
        println(f"PROF [$i] bloom_build ${(System.nanoTime() - tb) / 1e9}%8.3f s")
        val adj = oriented.groupBy(col("u"))
          .agg(sort_array(collect_list(struct(col("dv"), col("v")))).as("nbrs"))
        val wed = adj.select(col("u"), explode(graft.functions.WedgeClosures
            .wedgeClosures(edgeBloom, col("nbrs"))).as("w"))
          .select(col("u"), col("w.a").as("a"), col("w.b").as("b"))
        time(s"[$i] wedges_kernel") { wed }
        val tris = wed
          .join(oriented.select(col("u").as("a"), col("v").as("b"))
            .hint("shuffle_hash"), Seq("a", "b"))
          .select(col("u"), col("a"), col("b"))
        time(s"[$i] tris_confirm") { tris }
        val tri = tris.select(explode(array(col("u"), col("a"), col("b"))).as("w"))
          .groupBy("w").agg(count(lit(1)).as("n_triangles"))
        time(s"[$i] tri_counts") { tri }
        println(f"PROF [$i] total_from_ckpt ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    } else if (q == "lpa_stages") {
      // conductance/modularity breakdown: edge build, per-round LPA
      // cost, and the scoring tail — which side of the carried <=3s ask
      // actually needs work
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.graftbridge.CheckpointBridge
      (1 to 3).foreach { it =>
        val t00 = System.nanoTime()
        val bo = s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("items"))
        val e0 = bo.select(explode(col("items")).as("src"), col("items"))
          .select(col("src"), explode(col("items")).as("dst"))
          .filter(col("src") =!= col("dst"))
        val e = CheckpointBridge.partitionedCheckpoint(e0, 32, Seq("dst"),
          Seq("dst", "src"), dedupSorted = true, declareStats = false)
        time(s"[$it] edge_ckpt") { e.limit(1) }
        var lbl = e.groupBy(col("src").as("node"))
          .agg(mode(col("dst"), deterministic = true).as("lbl"))
        time(s"[$it] lpa_round1") { lbl }
        for (i <- 2 to 4) {
          lbl = e.join(lbl.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node"))
            .agg(mode(col("lbl"), deterministic = true).as("lbl"))
          time(s"[$it] lpa_round$i") { lbl }
        }
        val lab = lbl.localCheckpoint(false)
        time(s"[$it] lab_ckpt") { lab.limit(1) }
        val nbr = e
          .join(lab.withColumnRenamed("node", "dst")
            .withColumnRenamed("lbl", "lb"), "dst")
          .groupBy(col("src"), col("lb")).agg(count(lit(1)).as("cnt"))
          .join(lab.withColumnRenamed("node", "src")
            .withColumnRenamed("lbl", "la"), "src")
        val vol = nbr.groupBy(col("la").as("c"))
          .agg(countDistinct(col("src")).as("n_nodes"), sum("cnt").as("vv"),
            sum(when(col("la") =!= col("lb"), col("cnt"))
              .otherwise(lit(0L))).as("ce"))
        time(s"[$it] score_tail") { vol }
        println(f"PROF [$it] lpa_total ${(System.nanoTime() - t00) / 1e9}%8.3f s")
        s.sharedState.cacheManager.clearCache()
      }
    } else if (q == "truss_stages") {
      // mirrors the SHIPPED k_truss shape (triangle-edge index built
      // once, incremental decrement rounds) with per-stage noop timing
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.graftbridge.CheckpointBridge
      import org.apache.spark.sql.DataFrame
      (1 to 3).foreach { it =>
        val t00 = System.nanoTime()
        val bo = s.read.parquet(s"$dir/lineitem.parquet")
          .groupBy(col("l_orderkey"))
          .agg(collect_set(col("l_partkey")).as("items"))
        val e0 = bo.select(explode(col("items")).as("src"), col("items"))
          .select(col("src"), explode(col("items")).as("dst"))
          .filter(col("src") < col("dst"))
        val e = CheckpointBridge.partitionedCheckpoint(e0, 32, Seq("src"),
          Seq("src", "dst"), dedupSorted = true, declareStats = false)
        time(s"[$it] edge_ckpt") { e.limit(1) }
        val tb0 = System.nanoTime()
        val edgeBloom = s.sparkContext.broadcast(
          e.select(xxhash64(col("src"), col("dst")).as("k"))
            .stat.bloomFilter("k", 4000000L, 1L << 24))
        println(f"PROF [$it] bloom_build ${(System.nanoTime() - tb0) / 1e9}%8.3f s")
        val dk = e.select(explode(array(col("src"), col("dst"))).as("n"))
          .groupBy("n").agg(count(lit(1)).as("d"))
        val oriented0 = e
          .join(dk.select(col("n").as("src"), col("d").as("ds")), "src")
          .join(dk.select(col("n").as("dst"), col("d").as("dd")), "dst")
          .select(when(col("ds") < col("dd") ||
              (col("ds") === col("dd") && col("src") < col("dst")),
              struct(col("src").as("u"), col("dst").as("v"), col("dd").as("dv")))
            .otherwise(struct(col("dst").as("u"), col("src").as("v"),
              col("ds").as("dv"))).as("o"))
          .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
        val oriented = CheckpointBridge.partitionedCheckpoint(oriented0, 32,
          Seq("u"), Seq("u"), declareStats = false)
        time(s"[$it] oriented_ckpt") { oriented.limit(1) }
        val adj = oriented.groupBy(col("u"))
          .agg(sort_array(collect_list(struct(col("dv"), col("v")))).as("nbrs"))
        val wed = adj
          .select(col("u"), explode(graft.functions.WedgeClosures
            .wedgeClosures(edgeBloom, col("nbrs"))).as("w"))
          .select(col("u"), col("w.a").as("a"), col("w.b").as("b"))
        val adjC = oriented.groupBy(col("u"))
          .agg(collect_list(col("v")).as("vs"))
        val tri0 = wed
          .join(adjC.select(col("u").as("a"), col("vs")).hint("shuffle_hash"),
            Seq("a"))
          .filter(array_contains(col("vs"), col("b")))
          .select(col("u"), col("a"), col("b"))
        def edgesOf(t: DataFrame): DataFrame = t
          .select(col("u"), col("a"), col("b"), explode(array(
            struct(col("u").as("eu"), col("a").as("ev")),
            struct(col("u").as("eu"), col("b").as("ev")),
            struct(col("a").as("eu"), col("b").as("ev")))).as("t"))
          .select(col("u"), col("a"), col("b"),
            col("t.eu").as("eu"), col("t.ev").as("ev"))
        val triByEdge = CheckpointBridge.partitionedCheckpoint(
          edgesOf(tri0), 32, Seq("eu", "ev"), Seq("eu", "ev"),
          declareStats = false)
        time(s"[$it] triByEdge_ckpt") { triByEdge.limit(1) }
        var alive = CheckpointBridge.partitionedCheckpoint(
          triByEdge.groupBy(col("eu").as("u"), col("ev").as("v"))
            .agg(count(lit(1)).as("sup")),
          32, Seq("u", "v"), Seq("u", "v"), declareStats = false)
        time(s"[$it] alive_ckpt0") { alive.limit(1) }
        var destroyedSoFar: Option[DataFrame] = None
        (2 to 3).foreach { r =>
          val tr0 = System.nanoTime()
          val dRel = alive.filter(col("sup") < 2)
          val hit = triByEdge
            .join(dRel.select(col("u").as("eu"), col("v").as("ev")),
              Seq("eu", "ev"), "left_semi")
            .select("u", "a", "b").dropDuplicates("u", "a", "b")
          val nd = destroyedSoFar.fold(hit)(d =>
              hit.join(d, Seq("u", "a", "b"), "left_anti"))
            .localCheckpoint(false)
          time(s"[$it:r$r] nd") { nd }
          val dec = edgesOf(nd)
            .groupBy(col("eu").as("u"), col("ev").as("v"))
            .agg(count(lit(1)).as("dec"))
          alive = CheckpointBridge.partitionedCheckpoint(
            alive.filter(col("sup") >= 2)
              .join(dec, Seq("u", "v"), "left")
              .select(col("u"), col("v"),
                (col("sup") - coalesce(col("dec"), lit(0L))).as("sup"))
              .filter(col("sup") >= 1),
            32, Seq("u", "v"), Seq("u", "v"), declareStats = false)
          time(s"[$it:r$r] alive_ckpt") { alive.limit(1) }
          destroyedSoFar = Some(destroyedSoFar.fold(nd)(_ union nd))
          val tcc = System.nanoTime()
          val n = alive.filter(col("sup") >= 2).count()
          println(f"PROF [$it:r$r] count ${(System.nanoTime() - tcc) / 1e9}%8.3f s survivors=$n")
          println(f"PROF [$it:r$r] round_total ${(System.nanoTime() - tr0) / 1e9}%8.3f s")
        }
        println(f"PROF [$it] truss_total ${(System.nanoTime() - t00) / 1e9}%8.3f s")
        s.sharedState.cacheManager.clearCache()
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      }
    } else {
      val df = graft.SparkEntry.queries(q)(s, dir)
      df.write.mode("overwrite").format("noop").save()
      println(df.queryExecution.executedPlan.toString.take(12000))
    }
    s.stop()
  }
}
