package graft.tools

import org.apache.spark.sql.functions._
import graft.Tables
import graft.ops._

/** Ad-hoc phase profiler for the quality classifier (dev tool). */
object ClfProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSessions.local("32")
    graft.functions.GraftFunctions.register(spark)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d)
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[clf] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val dd = 1 << 15
    // phase isolation
    val t = TextOps.tokens(col("text"))
    time("explode only") {
      docs.select(explode(t).as("word")).count()
    }
    time("explode+hash+groupBy") {
      docs.select(col("doc_id"), explode(t).as("word"))
        .groupBy(col("doc_id"), pmod(hash(col("word")), lit(dd)).as("idx"))
        .agg(count(lit(1))).count()
    }
    time("label only") {
      docs.select(Classifier.stopDensityLabel().as("y")).count()
    }
    time("label+size+explode") {
      docs.select(col("doc_id"), Classifier.stopDensityLabel().as("y"),
        size(t).as("n_tokens"), explode(t).as("word")).count()
    }
    time("full hashedFeatures") {
      Classifier.hashedFeatures(docs, Classifier.stopDensityLabel(), dd).count()
    }
    if (sys.env.contains("SPARK_GRAFT_CLF_EXPLAIN"))
      Classifier.hashedFeatures(docs, Classifier.stopDensityLabel(), dd).explain(true)
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val label = Classifier.stopDensityLabel()
      val feats = time("features+persist") {
        val f = Classifier.hashedFeatures(docs, label, dd)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count(); f
      }
      val w = time("train30") { Classifier.trainLogReg(feats, dd) }
      time("score+noop") {
        Classifier.scoreMapSide(docs, label, w)
          .write.format("noop").mode("overwrite").save()
      }
      feats.unpersist()
    }
    spark.stop()
  }
}
