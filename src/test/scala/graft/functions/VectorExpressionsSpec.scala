package graft.functions

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.5, 0.25), Seq(0.125, 1.0)),
    (3L, Seq(1.5, -2.5), Seq(-1.0, 2.0)),
  ).toDF("id", "a", "b")

  test("native dot/cosine agree bit-for-bit with the HOF fold") {
    val native = vecs.select(
      VectorExpressions.dot_product(col("a"), col("b")).as("d"),
      VectorExpressions.cosine_sim(col("a"), col("b")).as("c"))
    val hof = vecs.select(
      Similarity.hofDot(col("a"), col("b")).as("d"),
      Similarity.hofCosine(col("a"), col("b")).as("c"))
    assert(native.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq ===
      hof.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq)
  }

  test("native expression matches on the full embeddings corpus") {
    val emb = Tables2.embeddingsDouble
    val pairs = emb.as("x").crossJoin(emb.as("y")).limit(2000)
      .select(
        VectorExpressions.cosine_sim(col("x.e"), col("y.e")).as("native"),
        Similarity.hofCosine(col("x.e"), col("y.e")).as("hof"))
    assert(pairs.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("zero-norm vector yields NaN (not an ANSI divide error)") {
    val df = Seq((1L, Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("id", "a", "b")
    val v = df.select(VectorExpressions.cosine_sim(col("a"), col("b")).as("c"))
      .head().getDouble(0)
    assert(v.isNaN)
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0), null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (3L, Seq[java.lang.Double](1.0), Seq[java.lang.Double](1.0, 2.0)),
    ).toDF("id", "a", "b")
    val out = df.select(col("id"), VectorExpressions.dot_product(col("a"), col("b")).as("d"))
      .orderBy("id").collect()
    assert(out.forall(_.isNullAt(1)))
  }

  test("float arrays implicitly cast (embedding column works unconverted)") {
    val raw = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(5)
    val out = raw.select(
      VectorExpressions.cosine_sim(col("embedding"), col("embedding")).as("self"))
      .collect().map(_.getDouble(0))
    assert(out.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("SQL registration: graft_cosine callable from spark.sql") {
    VectorExpressions.register(spark)
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(3)
      .createOrReplaceTempView("emb_t")
    val r = spark.sql("SELECT graft_cosine(embedding, embedding) AS c FROM emb_t")
      .collect().map(_.getDouble(0))
    assert(r.forall(v => math.abs(v - 1.0) < 1e-9))
  }

  test("expression participates in whole-stage codegen (no fallback)") {
    // needs a non-local source: local Seqs get constant-folded at plan time
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(VectorExpressions.cosine_sim(col("embedding"), col("embedding")).as("c"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("), p) // codegen stage wraps the projection
    assert(p.contains("graft_cosine"), p)
  }

  private object Tables2 {
    def embeddingsDouble = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
  }
}
