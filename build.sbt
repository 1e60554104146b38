ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "arcaneframeworkspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// per-test durations in the report (round 21: the test run must fit
// the round driver's budget — durations are how regressions get found)
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
// ---- parallel forked test groups (round 21, VERDICT r20 #1) ----
// `sbt test` ran 55 suites sequentially in ONE forked JVM; the round
// driver's run timed out mid-suite (VERIFY_r20 tests_ok:false with no
// red assertion). Suites are independent — per-JVM shared
// SparkSession (local[4]), temp-dir fixtures, no cross-suite state —
// so split them into duration-balanced groups, each its own forked
// JVM, run concurrently. Weights = measured suite seconds (round-21
// timing); unknown suites default small. GRAFT_TEST_GROUPS=1 restores
// the single-JVM run.
val testSuiteWeights: Map[String, Int] = Map(
  "CorpusBuildJobSpec" -> 820,
  "StreamingDecisionSpec" -> 260,
  "ComponentStoreSpec" -> 250,
  "StreamingDedupSpec" -> 240,
  "StreamingCorpusSpec" -> 180,
  "StreamingOpsSpec" -> 150,
  "StreamingRetractionSpec" -> 120,
  "GraftMainSpec" -> 150,
  "RetractionJobSpec" -> 120,
  "DedupStateSpec" -> 110,
  "ExtOpsSpec" -> 100,
  "PipelineDecisionSpec" -> 95,
  "SignatureStoreSpec" -> 90,
  "VectorIndexSpec" -> 90,
  "SparkEntrySpec" -> 90,
  "PlanAuditSpec" -> 80,
  "StreamRunnerSpec" -> 80,
  "TokenizerStoreSpec" -> 60,
  "KeeperElectionSpec" -> 50,
)
val testGroupCount =
  sys.env.get("GRAFT_TEST_GROUPS").map(_.toInt).getOrElse(6)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / forkOptions).value
  if (testGroupCount <= 1)
    Seq(Tests.Group("all", tests.toVector, Tests.SubProcess(opts)))
  else {
    // greedy balance, deterministic: heaviest first, ties by name
    val weighted = tests
      .map(t => t -> testSuiteWeights.getOrElse(t.name.split('.').last, 30))
      .sortBy { case (t, w) => (-w, t.name) }
    val binTests =
      Array.fill(testGroupCount)(Vector.newBuilder[sbt.TestDefinition])
    val binLoad = Array.fill(testGroupCount)(0)
    weighted.foreach { case (t, w) =>
      val i = binLoad.indices.minBy(binLoad)
      binTests(i) += t
      binLoad(i) += w
    }
    binTests.zipWithIndex.flatMap { case (b, i) =>
      val ts = b.result()
      if (ts.isEmpty) None
      else Some(Tests.Group(s"g$i", ts, Tests.SubProcess(opts)))
    }.toSeq
  }
}
Global / concurrentRestrictions += Tags.limit(Tags.ForkedTestGroup, testGroupCount)
// Pass the forked process's stdout straight through (no "[info] "
// prefix) so the bench/verify JSON lines stay machine-parseable —
// round 1's BENCH json was unparseable because of the sbt log prefix.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // deep expression trees (the 1,200-merge replace-chain REFERENCE
  // encoder in TokenizerStoreSpec) recurse past the JDK default stack
  // during Column→Expression conversion; production encode is one
  // flat node and doesn't need this
  "-Xss32m",
)
