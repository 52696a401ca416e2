package graft.etl

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the reference-parity enrichment (SURVEY §5.5):
  * random records with present/absent/null/weird `name` fields always
  * satisfy the glue/job.py:27-34 invariants. (Raw scalacheck generators
  * driven from a fixed seed sweep — the scalatest/scalacheck bridge
  * artifact isn't in the offline dependency set.)
  */
class EnrichPropSpec extends SparkSpec {
  import spark.implicits._

  private val nameGen: Gen[Option[Option[String]]] = Gen.oneOf(
    Gen.const(None),                                  // field absent
    Gen.const(Some(None)),                            // field null
    Gen.alphaNumStr.map(s => Some(Some(s))),          // plain
    Gen.oneOf("", " ", "ümlaut ß", "mIxEd CaSe", "42", "\"quoted\"")
      .map(s => Some(Some(s))),                       // tricky
  )
  private val batchGen = Gen.nonEmptyListOf(nameGen)

  private def sample(i: Long): List[Option[Option[String]]] =
    batchGen.apply(Gen.Parameters.default, Seed(i)).get

  private def jsonFor(id: Long, name: Option[Option[String]]): String = name match {
    case None          => s"""{"id":$id}"""
    case Some(None)    => s"""{"id":$id,"name":null}"""
    case Some(Some(s)) =>
      val esc = s.replace("\\", "\\\\").replace("\"", "\\\"")
      s"""{"id":$id,"name":"$esc"}"""
  }

  test("enrichment invariants hold for arbitrary name-field shapes") {
    (1L to 15L).foreach { seed =>
      val names = sample(seed)
      val lines = names.zipWithIndex.map { case (n, i) => jsonFor(i.toLong, n) }
      val out = Enrich.enrich(spark.read.json(lines.toDS)).collect()

      assert(out.length === lines.length, s"seed=$seed")
      out.foreach { row =>
        assert(row.getAs[Boolean]("processed"), s"seed=$seed")
        val up = row.getAs[String]("uppercase_name")
        assert(up != null, s"uppercase_name null, seed=$seed")
        val nameIdx = row.schema.fieldNames.indexOf("name")
        val expected =
          if (nameIdx < 0 || row.isNullAt(nameIdx)) ""
          else row.getString(nameIdx).toUpperCase
        assert(up === expected, s"seed=$seed")
      }
    }
  }

  test("enrichment never drops or invents input columns") {
    (100L to 109L).foreach { seed =>
      val names = sample(seed)
      val lines = names.zipWithIndex.map { case (n, i) => jsonFor(i.toLong, n) }
      val in = spark.read.json(lines.toDS)
      val out = Enrich.enrich(in)
      assert(out.columns.toSet === in.columns.toSet ++ Set("processed", "uppercase_name"),
        s"seed=$seed")
    }
  }
}
