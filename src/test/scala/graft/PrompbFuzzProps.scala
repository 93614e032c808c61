package graft

import graft.sources.Prompb
import org.scalacheck.{Arbitrary, Gen, Prop, Properties}

/** Decoder fuzz: ARBITRARY bytes must either decode or throw
  * `Prompb.DecodeError` — never an OOB/negative-allocation/other runtime
  * error. This seals the frontend's 400-on-garbage contract
  * (`/root/reference/kinesis.go:79,86`): the handler turns DecodeError
  * into a 400, so any OTHER throwable would surface as a 500 (or worse,
  * an allocation bomb) on attacker-controlled input.
  *
  * Three generators: pure noise, valid-prefix + noise tail (truncation
  * and trailing-garbage cases), and field-tag-shaped noise (valid varint
  * keys with hostile lengths — the generator most likely to reach the
  * length-delimited allocation paths). */
object PrompbFuzzProps extends Properties("PrompbFuzz") {

  private def decodesOrRejects(bytes: Array[Byte]): Prop = {
    try { Prompb.decode(bytes); Prop.passed }
    catch {
      case _: Prompb.DecodeError => Prop.passed
      case t: Throwable => Prop.falsified :| s"non-DecodeError ${t.getClass.getName}: ${t.getMessage}"
    }
  }

  private val noise: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte])

  private val validPrefixed: Gen[Array[Byte]] = for {
    tail <- noise
  } yield {
    val valid = Prompb.encode(Seq(Prompb.TimeSeries(
      Map("__name__" -> "m", "job" -> "x"), Seq(Prompb.Sample(1.5, 42L)))))
    // cut the valid message anywhere and append noise: exercises every
    // truncation boundary plus resync-on-garbage
    val cut = math.abs(tail.length * 31 + 7) % (valid.length + 1)
    valid.take(cut) ++ tail
  }

  private val tagShaped: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 30)
    parts <- Gen.listOfN(n, for {
      field <- Gen.choose(0, 7)
      wire <- Gen.choose(0, 7)
      len <- Gen.oneOf(Gen.choose(0, 64), Gen.oneOf(
        Int.MaxValue, -1, 0x7fffffff, 1 << 28)) // hostile lengths
      junk <- Gen.containerOf[Array, Byte](Arbitrary.arbitrary[Byte])
    } yield {
      def varint(v: Long): Array[Byte] = {
        var x = v; val b = Array.newBuilder[Byte]
        var more = true
        while (more) {
          val lo = (x & 0x7f).toInt; x = x >>> 7
          more = x != 0
          b += (if (more) (lo | 0x80).toByte else lo.toByte)
        }
        b.result()
      }
      varint((field << 3) | wire.toLong) ++ varint(len.toLong) ++ junk.take(16)
    })
  } yield parts.flatten.toArray

  property("noise never escapes DecodeError") =
    Prop.forAll(noise)(decodesOrRejects)

  property("truncations + trailing garbage never escape DecodeError") =
    Prop.forAll(validPrefixed)(decodesOrRejects)

  property("tag-shaped hostile lengths never allocate or escape") =
    Prop.forAll(tagShaped)(decodesOrRejects)
}
