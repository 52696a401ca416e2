package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A/Bs the fused graft_simhash60 map-stage against the original
  * explode + 60-conditional-sums aggregation on the real corpus — the
  * two formulations must agree on every doc (integer bit votes are
  * order-independent, so fusion cannot change the value).
  */
class SimhashSpec extends SparkSpec {

  test("fused simhash60 == explode+sum aggregation form on sf0.001") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fused = Dedup.simhashOf(docs)
    val builtin = Dedup.simhashOfBuiltin(docs)
    val diff = fused.join(builtin.withColumnRenamed("simhash", "expected"), "doc_id")
      .filter(col("simhash") =!= col("expected"))
      .count()
    assert(diff === 0)
    assert(fused.count() === docs.count())
  }
}
