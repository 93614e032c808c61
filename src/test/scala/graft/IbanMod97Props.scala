package graft

import java.math.BigInteger

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties}

/** The q210 IBAN mod-97 fold (ISO 13616) against an independent
  * BigInteger reference: for random IBAN-shaped candidates, the Spark
  * piecewise-mod higher-order fold must agree with literally building
  * the rearranged big integer and taking `mod 97` — the textbook
  * definition the fold exists to avoid materializing. Runs through
  * `piiExtPerDoc`, so the regex gate and the fold are exercised
  * together exactly as q210 runs them. */
object IbanMod97Props extends Properties("IbanMod97") {
  private lazy val spark = TestSpark.spark

  private val genIbanShaped: Gen[String] = for {
    cc <- Gen.listOfN(2, Gen.alphaUpperChar).map(_.mkString)
    check <- Gen.choose(0, 99).map(n => f"$n%02d")
    bodyLen <- Gen.choose(11, 30)
    body <- Gen.listOfN(bodyLen,
      Gen.oneOf(Gen.alphaUpperChar, Gen.numChar)).map(_.mkString)
  } yield cc + check + body

  /** ISO 13616 reference: rearrange, expand letters to two digits,
    * take the whole number mod 97. */
  private def referenceValid(iban: String): Boolean = {
    val rearranged = iban.substring(4) + iban.substring(0, 4)
    val digits = rearranged.flatMap { c =>
      if (c.isDigit) c.toString else (c - 'A' + 10).toString
    }
    new BigInteger(digits).mod(BigInteger.valueOf(97)) == BigInteger.ONE
  }

  property("fold == BigInteger mod-97 on random IBAN-shaped runs") =
    Prop.forAll(Gen.listOfN(24, genIbanShaped)) { cands =>
      import spark.implicits._
      val rows = cands.zipWithIndex
        .map { case (s, i) => (i.toLong, "en", s"pay $s now") }
      val got = operators.TextStats.piiExtPerDoc(
          rows.toDF("doc_id", "lang", "text"))
        .select(col("doc_id"), col("n_ibans"), col("n_iban_valid"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
      cands.zipWithIndex.forall { case (s, i) =>
        got(i.toLong) == ((1, if (referenceValid(s)) 1 else 0))
      }
    }

  property("a known-valid IBAN stays valid under any case-preserving pad") =
    Prop.forAll(Gen.alphaLowerStr.map(_.take(10))) { pad =>
      import spark.implicits._
      val row = operators.TextStats.piiExtPerDoc(
          Seq((0L, "en", s"$pad GB82WEST12345698765432 $pad"))
            .toDF("doc_id", "lang", "text"))
        .select(col("n_ibans"), col("n_iban_valid")).collect().head
      row.getInt(0) == 1 && row.getInt(1) == 1
    }
}
