package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-level API for graft's native Catalyst expressions.
  *
  * Registered in the session FunctionRegistry so they work from both the
  * Column API (via call_function) and plain SQL (`SELECT cosine_sim(a, b)`).
  * Idempotent — call per session before use.
  */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
  }

  /** Cosine similarity of two array<float> columns (codegen'd, double acc). */
  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)

  /** 64-bit SimHash fingerprint of an array<string> token column. */
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)

  /** Hamming distance between two 64-bit fingerprints (pure builtin combo —
    * bit_count is codegen'd). */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
