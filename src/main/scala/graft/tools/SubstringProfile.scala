package graft.tools

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Phase-by-phase timing of substringDupSpans' plan over a corpus dir —
  * diagnostic harness for sizing the op's stages independently
  * (`SPARK_GRAFT_SCALE_DIR`-style corpus layout: documents.parquet). */
object SubstringProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_scale/n50000")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = graft.GraftSessions.local(cpus)
    GraftFunctions.register(spark)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val L = 40

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[sp] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val winsSubstr = docs
      .filter(length(col("text")) >= L)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("text")) - lit(L - 1))).as("pos"),
        col("text").substr(col("pos"), lit(L)).as("win"))
      .withColumn("h", xxhash64(col("win")))

    val winsRoll = docs
      .filter(octet_length(col("text")) >= L)
      .select(col("doc_id"),
        posexplode(GraftFunctions.rollingWindowHashes(col("text"), L)).as(Seq("pos0", "h")))

    // V1: map-side-partial-agg groupBy over substr+xxhash windows (status quo)
    t("V1 groupBy substr-xxhash") {
      winsSubstr.groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
        .write.format("noop").mode("overwrite").save()
    }
    // V2: repartition-first (no map-side partial agg maps over distinct-heavy keys)
    t("V2 repartition+groupBy substr") {
      winsSubstr.select(col("h")).repartition(col("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
        .write.format("noop").mode("overwrite").save()
    }
    // V3: rolling-hash enumeration + repartition-first agg
    t("V3 repartition+groupBy rolling") {
      winsRoll.select(col("h")).repartition(col("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
        .write.format("noop").mode("overwrite").save()
    }
    // V4: rolling + plain groupBy
    t("V4 groupBy rolling") {
      winsRoll.select(col("h")).groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
        .write.format("noop").mode("overwrite").save()
    }
    t("full op noop") {
      graft.ops.DedupOps.substringDupSpans(docs)
        .write.format("noop").mode("overwrite").save()
    }

    // ---- multibyte-path enumeration: per-window substr+poly_hash64 (the
    // pre-r9 fallback) vs the one-pass rolling char-window hash. An "é"
    // prefix pushes every doc onto the MB path (octet_length != length)
    // without changing window count materially.
    val mbDocs = docs.select(col("doc_id"),
        concat(lit("é"), col("text")).as("text"))
      .filter(length(col("text")) >= L)
    t("MB V-substr enumerate+count") {
      mbDocs
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(1), length(col("text")) - lit(L - 1))).as("pos"))
        .withColumn("h", GraftFunctions.polyHash64(col("text").substr(col("pos"), lit(L))))
        .select(col("h")).groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
        .write.format("noop").mode("overwrite").save()
    }
    t("MB V-rolling enumerate+count") {
      mbDocs
        .select(col("doc_id"),
          posexplode(GraftFunctions.rollingCharWindowHashes(col("text"), L))
            .as(Seq("pos0", "h")))
        .select(col("h")).groupBy(col("h")).agg(count(lit(1)).as("c"))
        .filter(col("c") > 1).select(col("h"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
