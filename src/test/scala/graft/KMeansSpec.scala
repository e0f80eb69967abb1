package graft

import org.apache.spark.sql.functions._
import graft.similarity.KMeansCosine

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated direction groups in 4-d; ids 0 and 1 (the first-k
  // seeds) land one in each group so 2 Lloyd rounds can only converge
  private def grouped() = Seq(
    (0L, Array(1.0f, 0.05f, 0.0f, 0.0f)),
    (1L, Array(0.05f, 1.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.02f, 0.0f)),
    (3L, Array(0.08f, 0.95f, 0.0f, 0.01f)),
    (4L, Array(1.1f, 0.0f, 0.05f, 0.0f)),
    (5L, Array(0.0f, 0.8f, 0.03f, 0.0f)),
    (6L, Array(0.95f, 0.12f, 0.0f, 0.02f)),
    (7L, Array(0.1f, 1.2f, 0.01f, 0.0f))
  ).toDF("id", "vec")

  test("fit+assign separates two direction groups from first-k seeds") {
    val df = grouped()
    val cent = KMeansCosine.fit(df, "id", "vec", k = 2, iters = 2)
    val asg = KMeansCosine.assign(
      KMeansCosine.normalized(df, "id", "vec"), "id", cent)
      .select(col("id"), col("cluster")).as[(Long, Long)].collect().toMap
    val g1 = Set(0L, 2L, 4L, 6L)
    val g2 = Set(1L, 3L, 5L, 7L)
    g1.map(asg) should have size 1
    g2.map(asg) should have size 1
    asg(0L) should not equal asg(1L)
  }

  test("centroids are bit-identical on any input partitioning") {
    // DECIMAL component sums make the update order-independent; a float
    // sum would drift between these two layouts
    val df = grouped()
    def fitArrays(parts: Int): Map[Long, Seq[Double]] =
      KMeansCosine.fit(df.repartition(parts), "id", "vec", k = 2, iters = 3)
        .select(col("j"), col("c")).as[(Long, Seq[Double])].collect().toMap
    val a = fitArrays(7)
    val b = fitArrays(3)
    a.keySet shouldBe b.keySet
    for (k <- a.keySet) a(k) shouldBe b(k) // exact element equality
  }

  test("fit's job budget is bounded — one materialization per Lloyd round") {
    import org.apache.spark.sql.graft.bridge
    // per round: one localCheckpoint of the k-row centroid table (a
    // handful of AQE stage jobs through assign + update); plus the init
    // limit and the persist of vh. A regression that re-derives vh per
    // stage (the pre-persist shape) or adds per-round actions blows this.
    val df = grouped()
    val jobs = bridge.countJobs(spark) {
      KMeansCosine.fit(df, "id", "vec", k = 2, iters = 3).collect()
    }
    jobs should be <= 30 // measured ~14 on this data; 2x headroom
  }

  test("a cluster that loses every member drops out deterministically") {
    // all vectors identical: both seed centroids coincide, the cosine tie
    // breaks to the smaller centroid id, cluster 1 starves and vanishes
    val df = (0L to 4L).map(i => (i, Array(0.6f, 0.8f, 0.0f, 0.0f)))
      .toDF("id", "vec")
    val cent = KMeansCosine.fit(df, "id", "vec", k = 2, iters = 1)
    cent.select(col("j")).as[Long].collect().toSeq shouldBe Seq(0L)
  }
}
