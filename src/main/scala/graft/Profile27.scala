package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiling main (not part of the driver contract). */
object Profile27 {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile27")
    import graft.similarity.MinHashLsh
    import graft.tables.Tables

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.documents(spark, dir)
    import graft.functions.CharNgrams
    val d = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      CharNgrams.charNgrams(col("text"), 3).as("g3"))
    time("warmup")(docs.count())
    time("g3 only")(d.select(sum(size(col("g3")))).collect())
    val a = d.select(col("doc_id").as("id_a"), col("lang"), col("n_chars").as("nc_a"), col("g3").as("ga"))
      .withColumn("nc_key", explode(array((-2 to 2).map(dlt => col("nc_a") + lit(dlt)): _*)))
    val b = d.select(col("doc_id").as("id_b"), col("lang"), col("n_chars").as("nc_b"), col("g3").as("gb"))
    val joined = a.join(b, a("lang") === b("lang") && col("nc_key") === col("nc_b") &&
      col("id_a") < col("id_b"))
    time("band join count")(println("cand=" + joined.count()))
    val jac = joined.withColumn("jaccard",
      graft.functions.JaccardSim.jaccardSim(col("ga"), col("gb")))
      .filter(col("jaccard") >= 0.8)
    time("q29 jaccardsim")(println("q29=" + jac.count()))
    time("q29 real")(println("q29=" + graft.queries.PipelineQueries.q29_ngram_jaccard(spark, dir).count()))
    time("q27 real")(println("q27=" + graft.queries.PipelineQueries.q27_minhash_dedup(spark, dir).count()))
    time("q38 real")(graft.queries.PipelineQueries.q38_ann_ivf(spark, dir).count())
    spark.stop()
  }
}
