package graft.runtime

import java.nio.file.{Files, Path, Paths}

import scala.util.control.NonFatal

/** Stream status surface toward the orchestrating operator — the
  * reference's IStreamStatusService
  * (src/Services/Base/IStreamStatusService.cs, implemented by
  * src/Services/StreamStatusService.cs:18-25): on schema mismatch the
  * stream annotates ITS OWN Kubernetes Job so the Stream Operator
  * stops the incremental stream and relaunches it in backfill mode. */
trait StreamStatusService {
  def reportSchemaMismatch(streamId: String): Unit
}

/** Annotation vocabulary (reference: src/Contracts/Annotations.cs:14-21
  * — `arcane/state` = `schema-mismatch`). Byte-identical keys/values so
  * a Stream Operator watching reference jobs reacts to ours without
  * re-mapping. */
object StreamAnnotations {
  val StateAnnotationKey = "arcane/state"
  val SchemaMismatchStateAnnotationValue = "schema-mismatch"
}

/** In-cluster Kubernetes Job annotator — the concrete unport of
  * StreamStatusService.cs: PATCHes
  * `/apis/batch/v1/namespaces/{ns}/jobs/{streamId}` with a
  * strategic-merge patch setting `arcane/state=schema-mismatch`,
  * authenticated with the pod's mounted service-account token (the
  * same in-cluster identity the reference's IKubeCluster uses).
  *
  * The HTTP transport is injectable: unit tests drive the full
  * URL/header/body contract without a cluster, and the default
  * transport is a plain java.net.http PATCH that trusts the mounted
  * cluster CA. Annotation failures are reported, never thrown — a
  * status write must not change the exit-code contract. */
final class K8sStreamStatusService(
    transport: K8sStreamStatusService.Transport =
      K8sStreamStatusService.httpTransport,
    serviceAccountDir: Path = K8sStreamStatusService.DefaultServiceAccountDir,
    env: Map[String, String] = sys.env,
    onError: String => Unit = s => System.err.println(s"[k8s-status] $s"))
    extends StreamStatusService {

  private def saFile(name: String): Option[String] = {
    val p = serviceAccountDir.resolve(name)
    if (Files.isReadable(p)) Some(Files.readString(p).trim) else None
  }

  /** The pod's namespace, from the mounted service account
    * (IKubeCluster.GetCurrentNamespace parity). */
  def currentNamespace: String = saFile("namespace").getOrElse("default")

  def annotateJob(jobName: String, namespace: String,
      key: String, value: String): Unit =
    try {
      val host = env.getOrElse("KUBERNETES_SERVICE_HOST",
        throw new IllegalStateException("not running in a cluster: KUBERNETES_SERVICE_HOST unset"))
      val port = env.getOrElse("KUBERNETES_SERVICE_PORT", "443")
      val url = s"https://$host:$port/apis/batch/v1/namespaces/$namespace/jobs/$jobName"
      def esc(s: String) = s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
      val body = s"""{"metadata":{"annotations":{"${esc(key)}":"${esc(value)}"}}}"""
      val headers = Map(
        "Content-Type" -> "application/strategic-merge-patch+json") ++
        saFile("token").map(t => "Authorization" -> s"Bearer $t")
      val status = transport(url, headers, body, serviceAccountDir.resolve("ca.crt"))
      if (status < 200 || status >= 300)
        onError(s"annotate $jobName in $namespace returned HTTP $status")
    } catch {
      case NonFatal(e) => onError(s"annotate $jobName failed: ${e.getMessage}")
    }

  /** StreamStatusService.ReportSchemaMismatch parity: the Job carries
    * the stream id as its name. */
  override def reportSchemaMismatch(streamId: String): Unit =
    annotateJob(streamId, currentNamespace,
      StreamAnnotations.StateAnnotationKey,
      StreamAnnotations.SchemaMismatchStateAnnotationValue)
}

object K8sStreamStatusService {

  val DefaultServiceAccountDir: Path =
    Paths.get("/var/run/secrets/kubernetes.io/serviceaccount")

  /** (url, headers, patch body, CA cert path) → HTTP status code. */
  type Transport = (String, Map[String, String], String, Path) => Int

  /** True when the pod has a mounted service account AND the API
    * server env vars — the signal GraftMain uses to turn the real
    * annotator on. */
  def inCluster(env: Map[String, String] = sys.env,
      serviceAccountDir: Path = DefaultServiceAccountDir): Boolean =
    env.contains("KUBERNETES_SERVICE_HOST") &&
      Files.isReadable(serviceAccountDir.resolve("token"))

  /** Default transport: java.net.http PATCH trusting the mounted
    * cluster CA (the in-cluster trust root; falls back to the JVM
    * default trust store when the CA file is absent). Connect and
    * request timeouts are bounded (ADVICE r6): the annotation runs at
    * stream exit, and a hung API server must degrade to the existing
    * reported-not-thrown path instead of stalling the exit-code
    * contract indefinitely. */
  val httpTransport: Transport = (url, headers, body, caPath) => {
    val builder = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(5))
    if (Files.isReadable(caPath)) {
      val cf = java.security.cert.CertificateFactory.getInstance("X.509")
      val in = Files.newInputStream(caPath)
      val ks =
        try {
          val ca = cf.generateCertificate(in)
          val k = java.security.KeyStore.getInstance(
            java.security.KeyStore.getDefaultType)
          k.load(null, null)
          k.setCertificateEntry("cluster-ca", ca)
          k
        } finally in.close()
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ssl = javax.net.ssl.SSLContext.getInstance("TLS")
      ssl.init(null, tmf.getTrustManagers, null)
      builder.sslContext(ssl)
    }
    val req = headers.foldLeft(
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofSeconds(10))
        .method("PATCH",
          java.net.http.HttpRequest.BodyPublishers.ofString(body))
    ) { case (r, (k, v)) => r.header(k, v) }.build()
    builder.build()
      .send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
      .statusCode()
  }

  /** Adapter onto [[StreamRunner]]'s string status hook: statuses the
    * runner emits as `schema-mismatch: …` trigger the typed
    * reportSchemaMismatch (everything still goes to `sink`, so logs
    * keep the full picture). */
  def statusReporter(service: StreamStatusService, streamId: String,
      sink: String => Unit = s => System.err.println(s"[stream-status] $s"))
      : String => Unit = { status =>
    sink(status)
    if (status.startsWith(StreamAnnotations.SchemaMismatchStateAnnotationValue + ":"))
      service.reportSchemaMismatch(streamId)
  }
}
