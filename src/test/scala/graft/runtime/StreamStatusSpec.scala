package graft.runtime

import java.nio.file.{Files, Path, Paths}

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkFixture

/** The Kubernetes Job-annotation contract
  * (StreamStatusService.cs:18-25 + Annotations.cs:14-21 parity):
  * schema mismatch PATCHes `arcane/state=schema-mismatch` onto the Job
  * named by the stream id, in the pod's namespace, with the mounted
  * service-account bearer token — exercised through an injected
  * transport (no cluster in the sandbox; the URL/header/body contract
  * IS the unit under test). */
class StreamStatusSpec extends AnyFlatSpec with Matchers with SparkFixture {

  private def saDir(ns: String = "arcane-ns", token: String = "tok-123"): Path = {
    val d = Paths.get(tempDir("sa"))
    Files.writeString(d.resolve("namespace"), ns + "\n")
    Files.writeString(d.resolve("token"), token)
    d
  }

  private val env = Map(
    "KUBERNETES_SERVICE_HOST" -> "10.0.0.1",
    "KUBERNETES_SERVICE_PORT" -> "6443")

  behavior of "K8sStreamStatusService"

  it should "PATCH the stream's own Job with arcane/state=schema-mismatch" in {
    var seen: Option[(String, Map[String, String], String)] = None
    val svc = new K8sStreamStatusService(
      transport = (url, headers, body, _) => { seen = Some((url, headers, body)); 200 },
      serviceAccountDir = saDir(), env = env, onError = s => fail(s"unexpected error: $s"))
    svc.reportSchemaMismatch("orders-ct-stream")
    val (url, headers, body) = seen.get
    url shouldBe "https://10.0.0.1:6443/apis/batch/v1/namespaces/arcane-ns/jobs/orders-ct-stream"
    headers("Authorization") shouldBe "Bearer tok-123"
    headers("Content-Type") shouldBe "application/strategic-merge-patch+json"
    body shouldBe """{"metadata":{"annotations":{"arcane/state":"schema-mismatch"}}}"""
  }

  it should "report non-2xx and transport failures without throwing (exit codes stay untouched)" in {
    val errors = scala.collection.mutable.ListBuffer[String]()
    new K8sStreamStatusService(
      transport = (_, _, _, _) => 403,
      serviceAccountDir = saDir(), env = env, onError = errors += _)
      .reportSchemaMismatch("s1")
    new K8sStreamStatusService(
      transport = (_, _, _, _) => throw new java.io.IOException("connection refused"),
      serviceAccountDir = saDir(), env = env, onError = errors += _)
      .reportSchemaMismatch("s1")
    // outside a cluster the env var is missing — reported, not thrown
    new K8sStreamStatusService(
      transport = (_, _, _, _) => 200,
      serviceAccountDir = saDir(), env = Map.empty, onError = errors += _)
      .reportSchemaMismatch("s1")
    errors.size shouldBe 3
    errors.head should include("HTTP 403")
  }

  it should "fall back to the default namespace without a mounted service account" in {
    var url = ""
    val svc = new K8sStreamStatusService(
      transport = (u, _, _, _) => { url = u; 200 },
      serviceAccountDir = Paths.get(tempDir("empty-sa")), env = env)
    svc.currentNamespace shouldBe "default"
    svc.reportSchemaMismatch("s2")
    url should include("/namespaces/default/jobs/s2")
  }

  it should "detect in-cluster mode from env + mounted token" in {
    K8sStreamStatusService.inCluster(env, saDir()) shouldBe true
    K8sStreamStatusService.inCluster(Map.empty, saDir()) shouldBe false
    K8sStreamStatusService.inCluster(env, Paths.get(tempDir("no-sa"))) shouldBe false
    // and the sandbox really is not a cluster
    K8sStreamStatusService.inCluster() shouldBe false
  }

  behavior of "the StreamRunner status adapter"

  it should "annotate exactly on schema-mismatch statuses and pass everything to the sink" in {
    var annotated = List.empty[String]
    val svc = new StreamStatusService {
      override def reportSchemaMismatch(streamId: String): Unit =
        annotated ::= streamId
    }
    val sunk = scala.collection.mutable.ListBuffer[String]()
    val reporter = K8sStreamStatusService.statusReporter(svc, "s9", sunk += _)
    reporter("schema-mismatch: upstream added a column")
    reporter("schema-inconsistent: mid-read drift")
    reporter("fatal: boom")
    annotated shouldBe List("s9")
    sunk.size shouldBe 3
  }
}
