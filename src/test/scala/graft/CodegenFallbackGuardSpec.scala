package graft

import org.apache.spark.sql.Encoders
import org.scalatest.funsuite.AnyFunSuite

/** Proves the guard both ways: it stays silent on a properly-visible
  * product, and it demonstrably FAILS on a planted plain-`private` one —
  * the exact regression class that put StreamingGapFill's state
  * (de)serialization into interpreter mode in r16. */
/** The planted regression lives in a top-level object — the exact shape of
  * r16's `StreamingGapFill.LastSample`: a plain-`private` product nested in
  * an object. Encoder analysis accepts it, but generated code cannot access
  * a private member, so every (de)serialization falls back to the
  * interpreter — functionally correct, silently slow. */
object CodegenFallbackGuardSpec {
  private final case class PlantedPrivate(a: Long, b: Double)

  private[graft] def runPlanted(spark: org.apache.spark.sql.SparkSession): Int =
    spark.createDataset(Seq(PlantedPrivate(1L, 2.0), PlantedPrivate(3L, 4.0)))(
      Encoders.product[PlantedPrivate]).collect().length
}

class CodegenFallbackGuardSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("guard detects a planted plain-private product (fallback captured)") {
    val (n, hits) = CodegenFallbackGuard.capture {
      CodegenFallbackGuardSpec.runPlanted(spark)
    }
    assert(n == 2) // fallback is functional — that's the trap
    assert(hits.nonEmpty,
      "planted private product did not trigger an interpreter fallback — " +
        "guard would be blind to the regression class it exists for")
    // and assertNone demonstrably fails on the same body
    val err = intercept[AssertionError] {
      CodegenFallbackGuard.assertNone(CodegenFallbackGuardSpec.runPlanted(spark))
    }
    assert(err.getMessage.contains("interpreter mode"))
  }

  test("guard is silent on a properly-visible product") {
    import spark.implicits._
    CodegenFallbackGuard.assertNone {
      val ds = spark.createDataset(Seq(
        graft.streaming.SeriesSample("a", 1L, 1.0),
        graft.streaming.SeriesSample("b", 2L, 2.0)))
      assert(ds.filter(_.tsUs > 0L).collect().length == 2)
    }
  }
}
