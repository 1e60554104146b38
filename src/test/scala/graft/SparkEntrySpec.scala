package graft

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Driver-contract smoke: entry() yields rows on sf0.001, the
  * query/oracle maps stay in sync, and every query declares a
  * deterministic total order (the hash-compare precondition). */
class SparkEntrySpec extends AnyFlatSpec with Matchers with SparkFixture {

  behavior of "SparkEntry contract"

  it should "run the flagship entry() with rows > 0" in {
    SparkEntry.entry(spark).count() should be > 0L
  }

  it should "declare an oracle for every query (and no orphans)" in {
    // since round 6 EVERY query is oracled — agg_approx (the last
    // rows-only entry) became self-checking: it emits exact aggregates
    // plus sketch-bounds flags the oracle pins to 1
    SparkEntry.oracleSql.keySet shouldBe SparkEntry.queries.keySet
  }

  it should "end every oracle in a total ORDER BY" in {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(name) {
        sql.toUpperCase should include("ORDER BY")
      }
    }
  }
}
