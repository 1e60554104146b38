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

  /** Queries deliberately WITHOUT a SQL oracle — sketch-based results
    * no second engine can reproduce; the driver records a rows-only
    * check and their accuracy contract lives in a dedicated spec
    * (ApproxAccuracySpec). Every other query must have an oracle. */
  private val rowsOnlyQueries = Set("agg_approx")

  it should "declare an oracle for every query (and no orphans)" in {
    SparkEntry.oracleSql.keySet shouldBe (SparkEntry.queries.keySet -- rowsOnlyQueries)
    rowsOnlyQueries.subsetOf(SparkEntry.queries.keySet) shouldBe true
  }

  it should "end every oracle in a total ORDER BY" in {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      withClue(name) {
        sql.toUpperCase should include("ORDER BY")
      }
    }
  }
}
