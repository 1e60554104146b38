package graft.ext

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The ONE single-writer JSON metadata protocol shared by the
  * persisted stores ([[SignatureStore]] `metadata/v0/store.json`,
  * [[VectorIndex]] `metadata/v0/index.json` / `qerr.json` / drift
  * records) — folded here so a third store cannot fork a fourth copy
  * of the create-no-overwrite dance (VERDICT r9 #7).
  *
  * Every write lands the FULL content in a same-directory temp file
  * first, then renames onto the target, so a reader can never observe
  * a partially-written JSON and a failed writer can never leave a
  * truncated target behind (ADVICE r9: the old delete-then-create
  * overwrite path had a window where a racing writer's stale file
  * survived under a reported success):
  *
  *  - `overwrite = false` (first-writer-wins metadata like the bucket
  *    count): the rename REFUSES an existing target — the race loser
  *    is detected precisely by that rename failure (its temp file is
  *    removed and `false` returned so callers re-read the winner's
  *    values), while any OTHER I/O failure propagates instead of being
  *    swallowed by a broad exists-check (the old catch could mask a
  *    genuine partial-write error of an earlier attempt);
  *  - `overwrite = true` (owner-refreshed metadata like qerr.json):
  *    rename with OVERWRITE — atomic replace on HDFS and local file
  *    systems, no delete window.
  */
object StoreMeta {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  /** Write `json` at `path/rel` via temp-file + rename. Returns true
    * when this call's content is the surviving target; false when
    * `overwrite = false` and another writer's file was already there
    * (callers defer to the winner by re-reading). */
  def writeJson(spark: SparkSession, path: String, rel: String,
      json: String, overwrite: Boolean): Boolean = {
    val conf = spark.sessionState.newHadoopConf()
    val f = new Path(path).getFileSystem(conf)
    val target = f.makeQualified(new Path(s"$path/$rel"))
    f.mkdirs(target.getParent)
    val tmp = new Path(target.getParent,
      s".${target.getName}.tmp-${java.util.UUID.randomUUID()}")
    val out = f.create(tmp, true)
    try { out.write(json.getBytes("UTF-8")) } finally out.close()
    val fc = FileContext.getFileContext(target.toUri, conf)
    if (overwrite) {
      fc.rename(tmp, target, Options.Rename.OVERWRITE)
      true
    } else {
      try {
        fc.rename(tmp, target, Options.Rename.NONE)
        true
      } catch {
        // the narrow loser signal: the TARGET exists (another writer's
        // rename won); our fully-written temp file is discarded
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          f.delete(tmp, false); false
        case _: java.io.IOException if f.exists(target) =>
          f.delete(tmp, false); false // local-fs rename reports exists as IOE
      }
    }
  }

  def readJson(spark: SparkSession, path: String, rel: String): Option[String] = {
    val f = fs(spark, path)
    val p = new Path(s"$path/$rel")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      Some(try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close())
    }
  }

  /** Bucketed-store metadata pair: write-once `{"format":F,"buckets":B}`
    * plus the FORMAT-CHECKED read — shared by [[ComponentStore]] and
    * [[graft.streaming.StreamingDecision]] so a layout bump cannot
    * silently read old data with new semantics ([[SignatureStore]]
    * keeps its own richer hash-format error message). */
  def writeBucketMeta(spark: SparkSession, path: String,
      format: Int, buckets: Int): Unit = {
    writeJson(spark, path, "metadata/v0/store.json",
      s"""{"format":$format,"buckets":$buckets}""", overwrite = false)
    ()
  }

  def readBucketMeta(spark: SparkSession, path: String,
      expectedFormat: Int): Int = {
    val txt = readJson(spark, path, "metadata/v0/store.json")
      .getOrElse(throw new IllegalStateException(s"no store metadata under $path"))
    val fmt = jsonLong(txt, "format").getOrElse(1L)
    if (fmt != expectedFormat)
      throw new IllegalStateException(
        s"store at $path has format v$fmt, this engine reads v$expectedFormat — " +
          "rebuild the store to upgrade")
    jsonLong(txt, "buckets")
      .getOrElse(throw new IllegalStateException(s"unreadable store metadata under $path"))
      .toInt
  }

  /** The token a held lease hands its body: `owner` is this holder's
    * unique id, `epoch` the monotonically increasing acquire counter
    * for the store — together the FENCING identity
    * [[ArcaneLayout.replacePartitions]]-style swaps verify (via
    * [[verifyLease]]) immediately before their point of no return
    * (VERDICT r12 #4). */
  final case class Lease(path: String, owner: String, epoch: Long)

  /** Thrown by a lease body to signal the pass failed in a state where
    * BACKGROUND WORK MAY STILL TOUCH THE STORE (e.g. a patch pool that
    * would not drain after interrupt, ADVICE r13): the lease is left
    * in place to TTL-expire instead of being released, so the next
    * writer waits out the TTL rather than racing a wedged straggler. */
  final class LeasePoisonedException(msg: String)
    extends IllegalStateException(msg)

  /** SINGLE-WRITER LEASE for the stores' MUTATING passes (VERDICT r11
    * #7). The append paths are concurrency-safe by construction (fresh
    * UUID files, insert-if-absent reads, commit markers) — but every
    * pass that REWRITES partitions in place (ComponentStore
    * merge/compact/delete, StreamingDecision delete/readjudicate,
    * SignatureStore.delete, VectorIndex.delete) uses
    * delete-then-write partition overwrites with no transaction log:
    * two concurrent rewriters can interleave their read-patch-write
    * cycles and silently drop each other's rows. The CONTRACT is one
    * maintenance writer at a time per store path, and this lease
    * enforces it mechanically:
    *
    *  - acquire = create-no-overwrite of `_lease/writer.json` (the
    *    same atomic rename-refuses-existing protocol as the bucket
    *    metadata) — a second writer's acquire FAILS while the lease
    *    file exists, and the loser throws rather than corrupting; each
    *    acquire records a monotonically increasing `epoch` (tracked in
    *    `_lease/epoch.json`, bumped under the won lease) so the
    *    (owner, epoch) pair is a fencing token;
    *  - release = delete the file in `finally` ONLY when it still
    *    carries this holder's owner id (delete-if-owner, ADVICE r12):
    *    a holder whose lease was stolen mid-pass must NOT delete the
    *    stealer's fresh lease — that would open a third writer's
    *    acquire while the second is mid-rewrite;
    *  - crash recovery: a holder that died leaves its file behind —
    *    past the recorded TTL the lease counts as abandoned and the
    *    next writer breaks it. The break alone is not sufficient to
    *    stop a wedged-but-alive holder — that is what the fencing
    *    check NARROWS: every partition swap re-reads the lease and
    *    refuses to clear/rename when (owner, epoch) no longer match
    *    ([[verifyLease]]), so a revenant holder almost always fails
    *    its swap before touching the store. The check is
    *    check-then-act: a steal landing in the window between
    *    [[verifyLease]] and the subsequent clear/rename (or between
    *    the release path's owner read and its delete) can still
    *    interleave with the new holder. Plain-file fencing cannot
    *    close that window — only a storage layer that validates the
    *    fencing token on every mutation can — so treat the lease as a
    *    strong narrowing, not an absolute guarantee (ADVICE r13).
    *
    * Deployments needing the absolute guarantee put the store tables
    * on a transactional format that checks the token server-side; this
    * file keeps the layout plain parquet readable by everything. */
  def withWriterLease[A](spark: SparkSession, path: String, op: String,
      ttlMs: Long = 600000L)(f: => A): A =
    withWriterLeaseFenced(spark, path, op, ttlMs)(_ => f)

  /** [[withWriterLease]] variant handing the body its [[Lease]] token,
    * for passes that thread it to a fenced partition swap. */
  def withWriterLeaseFenced[A](spark: SparkSession, path: String, op: String,
      ttlMs: Long = 600000L)(body: Lease => A): A = {
    val rel = "_lease/writer.json"
    val owner = s"$op-${java.util.UUID.randomUUID()}"
    val now = System.currentTimeMillis()
    // next epoch: strictly above BOTH the recorded high-water mark and
    // any epoch visible in a (possibly stale) current lease — a crash
    // between winning writer.json and bumping epoch.json cannot reissue
    // an epoch, because the stale writer.json still carries it
    def nextEpoch(): Long = {
      val highWater = readJson(spark, path, "_lease/epoch.json")
        .flatMap(jsonLong(_, "epoch")).getOrElse(0L)
      val inFlight = readJson(spark, path, rel)
        .flatMap(jsonLong(_, "epoch")).getOrElse(0L)
      math.max(highWater, inFlight) + 1
    }
    def tryAcquire(floor: Long): Option[Lease] = {
      val e = math.max(nextEpoch(), floor + 1)
      if (writeJson(spark, path, rel,
        s"""{"owner":"$owner","epoch":$e,"acquiredAt":$now,"ttl":$ttlMs}""",
        overwrite = false)) {
        // bump the high-water mark under the won lease (single writer)
        writeJson(spark, path, "_lease/epoch.json",
          s"""{"epoch":$e}""", overwrite = true)
        Some(Lease(path, owner, e))
      } else None
    }
    var lease = tryAcquire(0L)
    if (lease.isEmpty) {
      val current = readJson(spark, path, rel)
      val stale = current.forall { t =>
        val at = jsonLong(t, "acquiredAt").getOrElse(0L)
        val ttl = jsonLong(t, "ttl").getOrElse(ttlMs)
        now - at > ttl
      }
      if (stale) {
        // the stale holder's epoch must stay a floor for ours even
        // after its file is parked away below (nextEpoch can no longer
        // see it) — otherwise a steal could REISSUE that epoch
        val staleEpoch = current.flatMap(jsonLong(_, "epoch")).getOrElse(0L)
        // ATOMIC STEAL: exactly one contender wins the rename of the
        // stale file to a unique parking name (rename fails for every
        // other breaker — the source is gone); the winner removes it
        // and acquires, the losers fall through to a normal (failing)
        // acquire against the winner's fresh lease. A naive
        // delete-then-create here would let a second breaker delete
        // the WINNER's fresh lease and double-acquire.
        val f = fs(spark, path)
        val src = new Path(s"$path/$rel")
        val parked = new Path(src.getParent,
          s".stale-${java.util.UUID.randomUUID()}")
        val stole =
          try f.rename(src, parked)
          catch { case scala.util.control.NonFatal(_) => false }
        if (stole) f.delete(parked, false): Unit
        lease = tryAcquire(staleEpoch)
      }
    }
    val token = lease.getOrElse(throw new IllegalStateException(
      s"store at $path is held by another maintenance writer " +
        s"(_lease/writer.json, op=$op): the partition-rewriting passes are " +
        "single-writer — wait for the holder to finish, or remove a stale " +
        "lease left by a crashed writer"))
    // delete-if-owner (ADVICE r12): release only OUR lease; if it was
    // stolen mid-pass, the file now belongs to the stealer — leave it
    def release(): Unit =
      try {
        val stillOurs = readJson(spark, path, rel)
          .exists(t => jsonString(t, "owner").contains(owner))
        if (stillOurs) fs(spark, path).delete(new Path(s"$path/$rel"), false): Unit
        else System.err.println(
          s"[store-lease] lease at $path no longer held by $owner " +
            "(stolen past TTL?) — leaving the current holder's lease in place")
      } catch { case scala.util.control.NonFatal(_) => () }
    try {
      val r = body(token)
      release()
      r
    } catch {
      // a POISONED pass may still have background work touching the
      // store — do NOT release; the lease TTL-expires, making the next
      // writer wait out the straggler instead of racing it (ADVICE r13)
      case e: LeasePoisonedException =>
        System.err.println(
          s"[store-lease] lease at $path (owner=$owner) left to TTL-expire " +
            s"after a poisoned pass: ${e.getMessage}")
        throw e
      case e: Throwable =>
        release()
        throw e
    }
  }

  /** FENCING CHECK: throw unless `_lease/writer.json` still records
    * exactly this holder's (owner, epoch). Called by the partition-swap
    * primitives immediately before their point of no return, so a
    * holder whose lease was broken mid-pass (TTL steal by a new
    * writer) fails its swap rather than interleaving with the new
    * holder's rewrite (VERDICT r12 #4). Residual window (ADVICE r13):
    * the check is check-then-act — a steal landing between this read
    * and the caller's clear/rename still interleaves; see the
    * [[withWriterLease]] doc for why plain-file fencing cannot close
    * it. */
  def verifyLease(spark: SparkSession, lease: Lease): Unit = {
    val ok = readJson(spark, lease.path, "_lease/writer.json").exists { t =>
      jsonString(t, "owner").contains(lease.owner) &&
        jsonLong(t, "epoch").contains(lease.epoch)
    }
    if (!ok) throw new IllegalStateException(
      s"writer lease for ${lease.path} lost (owner=${lease.owner}, " +
        s"epoch=${lease.epoch}): the lease was broken or released while this " +
        "pass ran — refusing the partition swap; re-run the pass under a " +
        "fresh lease")
  }

  /** TOMBSTONE ENFORCEMENT AT INGEST (VERDICT r12 #1) — the ONE
    * admission rule every store's append path applies: arrivals are
    * anti-joined against `path/tombstones`'s `doc_id` ledger BY
    * DEFAULT, so a retracted doc re-arriving through a batch loop that
    * never consults the decision surface is dropped at the store.
    * `admitTombstoned = true` is the explicit opt-out (a takedown
    * later reversed). The batch side is bounded (one micro-batch); the
    * tombstone ledger stays tiny relative to the corpus, so AQE
    * broadcasts it at any corpus scale. Shared by
    * [[SignatureStore.append]], [[VectorIndex.append]] and
    * [[VectorIndex.build]] so the contract cannot silently diverge. */
  def filterTombstoned(df: DataFrame, idCol: String, path: String,
      admitTombstoned: Boolean): DataFrame = {
    val spark = df.sparkSession
    if (admitTombstoned || !fs(spark, path).exists(new Path(s"$path/tombstones")))
      df
    else df.join(
      spark.read.parquet(s"$path/tombstones")
        .select(col("doc_id").cast("long").as("__tomb_id")).distinct(),
      df(idCol).cast("long") === col("__tomb_id"), "left_anti")
  }

  def jsonString(txt: String, k: String): Option[String] =
    s""""$k"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))

  def jsonLong(txt: String, k: String): Option[Long] =
    s""""$k"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1).toLong)

  def jsonDouble(txt: String, k: String): Option[Double] =
    s""""$k"\\s*:\\s*([0-9.Ee+-]+)""".r.findFirstMatchIn(txt).map(_.group(1).toDouble)
}
