package graft.hep

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import MetaCodec._

class MetaCodecSpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(params, Seed(seed)).getOrElse(sys.error("gen failed"))

  val valueGen: Gen[MetaValue] = Gen.oneOf(
    Gen.long.map(MetaInt),
    Gen.double.map(MetaDouble),
    Gen.oneOf(true, false).map(MetaBool),
    Gen.alphaNumStr.map(MetaString),
    Gen.listOf(Gen.long).map(l => MetaIntArray(l)),
    Gen.listOf(Gen.double).map(l => MetaDoubleArray(l)))

  test("generated values round-trip") {
    for (seed <- 1L to 200L) {
      val v = sample(valueGen, seed)
      assert(decode(encode(v)) == v, s"seed=$seed v=$v")
    }
  }

  test("reference-shaped metadata round-trips (signal_pdgs, com_e)") {
    val meta = Map(
      "signal_pdgs" -> MetaIntArray(Seq(25, 23, -11)),
      "com_e" -> MetaDouble(13600.0),
      "e_unit" -> MetaString("GeV"),
      "is_signal" -> MetaBool(true),
      "n_events" -> MetaInt(100000L),
      "weights" -> MetaDoubleArray(Seq(0.5, 0.25, 0.125)))
    assert(decodeMap(encodeMap(meta)) == meta)
  }

  test("strings containing the tag separator survive") {
    val v = MetaString("p p > h z , (h > b b~) : madgraph")
    assert(decode(encode(v)) == v)
  }

  test("empty arrays round-trip") {
    assert(decode(encode(MetaIntArray(Nil))) == MetaIntArray(Nil))
    assert(decode(encode(MetaDoubleArray(Nil))) == MetaDoubleArray(Nil))
  }
}
