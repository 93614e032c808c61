package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

/** The file-tree helpers every single-writer maintenance op shares
  * ([[operators.Pipeline.phraseIndexCompact]],
  * [[streaming.SignatureCompaction]], `TextStats.bpeVocabRetention`) —
  * one copy of the eager-close and reverse-walk disciplines (ADVICE r15:
  * an unclosed directory stream leaks one fd per call; a forward-order
  * delete fails on non-empty dirs). */
object FsTrees {

  /** Directory entries with the stream closed eagerly. */
  def listDir(p: Path): Seq[Path] = {
    val s = Files.list(p)
    try s.iterator().asScala.toList finally s.close()
  }

  /** The `.parquet` files directly under `p`. */
  def parquets(p: Path): Seq[Path] =
    listDir(p).filter(_.getFileName.toString.endsWith(".parquet"))

  /** Recursive delete, children-first; missing paths are fine — the
    * existence guard makes the documented contract real (ADVICE r17:
    * `Files.walk` throws NoSuchFileException on a nonexistent root;
    * `deleteIfExists` only covers races mid-walk). */
  def rmTree(p: Path): Unit = {
    if (!Files.exists(p)) return
    val w = Files.walk(p)
    val tree = try w.iterator().asScala.toList finally w.close()
    tree.reverse.foreach(q => Files.deleteIfExists(q))
  }
}
