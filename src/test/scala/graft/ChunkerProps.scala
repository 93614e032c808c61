package graft

import graft.streaming.{Chunker, SinkEntry}
import org.scalacheck.{Gen, Prop, Properties}

/** Chunker invariants (`/root/reference/kinesis.go:22-23,126-148`):
  * every emitted batch ≤ maxEntries and ≤ maxBytes (unless a single record
  * alone exceeds maxBytes — fixed vs the reference's empty-buffer bypass),
  * and concatenation of batches ≡ input in order.
  */
object ChunkerProps extends Properties("Chunker") {

  private val genEntry: Gen[SinkEntry] = for {
    n <- Gen.choose(0, 40000)
    k <- Gen.option(Gen.alphaStr.map(_.take(16)))
  } yield SinkEntry(k, new Array[Byte](n))

  private val genBatch = Gen.listOf(genEntry)

  property("limits hold") = Prop.forAll(genBatch) { entries =>
    val chunks = Chunker.chunk[SinkEntry](
      entries.iterator, _.size.toLong, maxEntries = 50, maxBytes = 100000L).toSeq
    chunks.forall { c =>
      c.size <= 50 &&
      (c.map(_.size.toLong).sum <= 100000L || c.size == 1)
    }
  }

  property("order and completeness preserved") = Prop.forAll(genBatch) { entries =>
    val chunks = Chunker.chunk[SinkEntry](
      entries.iterator, _.size.toLong, maxEntries = 7, maxBytes = 50000L).toSeq
    chunks.flatten == entries
  }

  property("no empty batches") = Prop.forAll(genBatch) { entries =>
    Chunker.chunk[SinkEntry](entries.iterator, _.size.toLong).forall(_.nonEmpty)
  }

  property("oversized single record emitted alone, limits still split rest") =
    Prop.forAll(Gen.choose(1, 10)) { n =>
      val big = SinkEntry(None, new Array[Byte](5000001))
      val small = (1 to n).map(_ => SinkEntry(None, new Array[Byte](10)))
      val chunks = Chunker.chunk[SinkEntry](
        (small :+ big).iterator ++ small.iterator, _.size.toLong).toSeq
      chunks.flatten.size == 2 * n + 1 &&
        chunks.exists(c => c.size == 1 && c.head.size > Chunker.MaxBytes)
    }
}
