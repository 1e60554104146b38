package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Guards the repo's source files against the failure class VERDICT
  * r18 flagged: a raw control byte (0x00) embedded in a string literal
  * makes git/grep classify the file as BINARY — diffs become
  * unreviewable and text tooling degrades silently. Control characters
  * in source must be written as unicode escapes, never as raw
  * bytes. */
class SourceHygieneSpec extends AnyFunSuite {

  private def scalaSources: Seq[Path] = {
    val root = Paths.get("src")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .toSeq
  }

  test("no .scala source file contains a raw NUL (0x00) byte") {
    val offenders = scalaSources.flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val i = bytes.indexOf(0.toByte)
      if (i >= 0) Some(s"$p (first at byte offset $i)") else None
    }
    assert(offenders.isEmpty,
      s"raw NUL bytes make these files binary to git/grep — use \\u0000 escapes: ${offenders.mkString(", ")}")
  }

  test("no .scala source file contains raw C0 control bytes other than tab/newline") {
    val allowed = Set(0x09, 0x0a, 0x0d)
    val offenders = scalaSources.flatMap { p =>
      val bytes = Files.readAllBytes(p)
      val i = bytes.indexWhere(b => (b & 0xff) < 0x20 && !allowed((b & 0xff).toInt))
      if (i >= 0) Some(s"$p (0x${(bytes(i) & 0xff).toHexString} at offset $i)") else None
    }
    assert(offenders.isEmpty,
      s"raw control bytes in source — use unicode escapes: ${offenders.mkString(", ")}")
  }
}
