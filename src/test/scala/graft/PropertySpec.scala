package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.json._
import graft.pipeline.{Dates, Helpers}

/** Property tests (SURVEY §5.4(4)): toUTC epoch round-trips across
  * magnitudes, brace-scanner recovery, lowercase idempotence, merge laws.
  * Raw scalacheck generators driven by a fixed-seed sampler (the
  * scalatest-scalacheck bridge isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  /** Deterministic forAll: 200 samples from a fixed seed. */
  private def forAllG[A](gen: Gen[A])(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var n = 0
    while (n < 200) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => check(a); n += 1 }
      seed = seed.next
    }
  }

  test("toUTC: 10-digit epoch seconds round-trip") {
    forAllG(Gen.choose(1000000000L, 2000000000L)) { epoch =>
      assert(Dates.toUTC(JLong(epoch)).toEpochSecond == epoch)
    }
  }

  test("toUTC: 13-digit epoch millis round-trip") {
    forAllG(Gen.choose(1000000000000L, 2000000000000L)) { ms =>
      assert(Dates.toUTC(JLong(ms)).toInstant.toEpochMilli == ms)
    }
  }

  test("toUTC: float epochs of any magnitude land in the sane era") {
    // the magnitude rule scales into [1e9, 1e10) seconds = years 2001..2286
    // ("This breaks in the year 2286", dates.py:51)
    forAllG(Gen.choose(1.0e9, 2.0e18)) { d =>
      val yr = Dates.toUTC(JDouble(d)).getYear
      assert(yr >= 2001 && yr <= 2286, s"epoch $d -> year $yr")
    }
  }

  private val safeKey: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
  private val safeValue: Gen[JValue] = Gen.oneOf(
    Gen.listOf(Gen.alphaNumChar).map(cs => JString(cs.take(12).mkString)),
    Gen.choose(-1000000L, 1000000L).map(JLong(_)),
    Gen.oneOf(JBool(true), JBool(false), JNull))
  private val flatObj: Gen[JObject] = Gen.mapOf(Gen.zip(safeKey, safeValue))
    .map(m => JObject(m.toVector))

  test("brace scanner: parse(emit(concatenated docs)) == docs (brace-free strings)") {
    forAllG(Gen.listOfN(4, flatObj)) { objs =>
      val text = objs.map(Json.render).mkString("  ")
      val recovered = Helpers.emitJsonBlocks(text).filter(_.nonEmpty).flatMap(Json.parseOpt).toVector
      assert(recovered == objs.toVector)
    }
  }

  test("json round-trip: parse(render(x)) == x") {
    forAllG(flatObj) { o => assert(Json.parse(Json.render(o)) == o) }
  }

  test("lowercaseKeys is idempotent") {
    forAllG(flatObj) { o =>
      val once = JsonOps.lowercaseKeys(o)
      assert(JsonOps.lowercaseKeys(once) == once)
    }
  }

  test("merge: identity and self-absorption") {
    forAllG(flatObj) { o =>
      assert(JsonOps.merge(o, JObject.empty) == o)
      assert(JsonOps.merge(JObject.empty, o) == o)
      assert(JsonOps.merge(o, o) == o)
    }
  }

  test("dotGet agrees with top-level lookup") {
    forAllG(flatObj) { o =>
      o.fields.foreach { case (k, _) =>
        assert(JsonOps.dotGet(o, k) == Some(o(k)))
        assert(JsonOps.getPath(o, k) == o(k))
      }
    }
  }
}
