package graft.llm

import org.scalatest.funsuite.AnyFunSuite

/** The PERMISSIVE decode tier (`mm_jpeg_quarantine`) — what the oracle
  * can't show: that corruption is survived, not just counted. The oracled
  * query pins bucket counts and healthy dims cross-engine; this spec pins
  * the task-survival contract itself:
  *
  *  1. the STRICT parse throws on every planted corruption class — i.e.
  *     without the permissive tier, one corrupt object would kill its
  *     task (and every healthy object sharing the partition);
  *  2. the permissive walk classifies each class to its stable reason
  *     code, never throws, and decodes every healthy payload with the
  *     exact container facts the strict parse reports;
  *  3. end-to-end over ONE partition mixing all classes: no healthy row
  *     is dropped, no corrupt row leaks into the decoded set, and the
  *     reason codes partition the corrupt set exactly.
  *
  * Pure-JVM driver-side loops on purpose (the JpegSpec discipline):
  * these are codec/parser facts, not plan facts.
  */
class JpegQuarantineSpec extends AnyFunSuite {

  private val ids: Seq[Long] = 0L until 630L by 3 // covers all id%7 classes

  private def payloads: Seq[Multimodal.JpegPayload] =
    Multimodal.encodeJpegPartition(
      ids.map(id => (id, id)).iterator, Multimodal.JpegQuality).toSeq

  private def reasonOf(id: Long): String = (id % 7) match {
    case 1 => "missing_soi"
    case 2 => "no_sof"
    case 3 => "bad_marker"
    case _ => "ok"
  }

  test("strict parse dies on every corruption class; permissive never throws") {
    val byClass = payloads.groupBy(p => reasonOf(p.id))
    for (cls <- Seq("missing_soi", "no_sof", "bad_marker")) {
      val p = byClass(cls).head
      val corrupted = Multimodal.corruptFor(p.src_id, p.payload)
      intercept[RuntimeException](Multimodal.parseJpegSof(corrupted))
      assert(Multimodal.parseJpegSofEither(corrupted).left.exists(_._1 == cls),
        s"class $cls must classify to its own reason code")
    }
  }

  test("one mixed partition: healthy rows all survive, corrupt rows all quarantine") {
    val results = payloads.map { p =>
      val b = Multimodal.corruptFor(p.src_id, p.payload)
      p.id -> Multimodal.parseJpegSofEither(b)
    }
    // every object classified — the map itself not throwing IS claim 1's
    // task-survival, exercised over the full mixed population
    assert(results.size === ids.size)
    val (decoded, quarantined) = results.partition(_._2.isRight)
    // no healthy row dropped, with the exact strict-parse container facts
    val healthy = ids.filter(reasonOf(_) == "ok").toSet
    assert(decoded.map(_._1).toSet === healthy)
    decoded.foreach {
      case (id, Right((w, h, nc, prec, prog))) =>
        assert(w === (8 + id % 9).toInt && h === (8 + (id / 7) % 9).toInt,
          s"container dims of healthy id=$id")
        assert(nc === 1 && prec === 8 && !prog)
      case _ => fail("unreachable")
    }
    // no corrupt row leaks; reason codes partition the corrupt set exactly
    val gotReasons = quarantined.map { case (id, Left((code, _))) => id -> code
      case _ => fail("unreachable") }.toMap
    assert(gotReasons.keySet === ids.filterNot(reasonOf(_) == "ok").toSet)
    gotReasons.foreach { case (id, code) => assert(code === reasonOf(id)) }
  }
}
