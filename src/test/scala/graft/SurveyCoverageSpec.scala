package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md is the blueprint the driver grades against — the registry and
  * the document must never drift apart.
  */
class SurveyCoverageSpec extends AnyFunSuite {
  private lazy val survey =
    scala.io.Source.fromFile("SURVEY.md")("UTF-8").mkString
  private lazy val mentioned =
    "q_[a-z0-9_]+".r.findAllIn(survey).toSet

  test("every query id mentioned in SURVEY.md exists in the registry") {
    val missing = mentioned -- Registry.all.map(_.name).toSet
    assert(missing.isEmpty, s"SURVEY mentions unimplemented queries: $missing")
  }

  test("every registry query is documented in SURVEY.md") {
    val undocumented = Registry.all.map(_.name).toSet -- mentioned
    assert(undocumented.isEmpty, s"queries missing from SURVEY: $undocumented")
  }
}
