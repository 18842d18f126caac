package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {

  private lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("codebook round-trips bit-exactly through the parquet sidecar") {
    val cs = Similarity.ivfCentroids(emb, "vec_id", "embedding", nClusters = 8, iters = 2)
    val work = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    IvfIndex.write(emb, "vec_id", "embedding", cs, work)
    val back = IvfIndex.readCodebook(spark, work)
    assert(back.length === cs.length)
    assert(back.map(_.toSeq).toSeq === cs.map(_.toSeq).toSeq,
      "parquet doubles are exact — any drift would silently desync index and probe")
  }

  test("index topK is row-identical to the in-plan ivfTopKWith under the same codebook") {
    val cs = Similarity.ivfCentroids(emb, "vec_id", "embedding", nClusters = 8, iters = 2)
    val work = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    IvfIndex.write(emb, "vec_id", "embedding", cs, work)
    val q = emb.filter(col("vec_id") < 5)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos"))).toSet
    val fromIndex = rows(IvfIndex.topK(spark, work, q, "vec_id", "embedding",
      k = 10, nProbe = 4))
    val inPlan = rows(Similarity.ivfTopKWith(emb, q, "vec_id", "embedding",
      k = 10, cs, nProbe = 4))
    assert(fromIndex === inPlan,
      "the layout changes where bytes are read, never the arithmetic")
    assert(fromIndex.nonEmpty)
  }

  test("probed cells prune partitions: the cluster filter reaches the file source") {
    val cs = Similarity.ivfCentroids(emb, "vec_id", "embedding", nClusters = 8, iters = 2)
    val work = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    IvfIndex.write(emb, "vec_id", "embedding", cs, work)
    val pruned = IvfIndex.probedCells(spark, work, Seq(0L, 3L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), s"no partition filters in:\n$plan")
    assert(plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*cluster[^\\]]*\\].*"),
      s"cluster predicate must be a PARTITION filter, not a data filter:\n$plan")
    // semantic check: only rows of the probed cells come back, and they
    // match the unpruned scan restricted the slow way
    val all = spark.read.parquet(s"$work/corpus")
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet ===
      all.filter(col("cluster").isin(0L, 3L)).select("id").collect().map(_.getLong(0)).toSet)
    assert(pruned.select(countDistinct("cluster")).head.getLong(0) <= 2L)
  }
}
