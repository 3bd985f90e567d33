package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** A local filesystem that COUNTS metadata operations, registered under
  * its own `countfs://` scheme — the measurement instrument behind the
  * streaming index's bounded-LISTING contract (StreamIndexIoSpec).
  *
  * Why a real FileSystem and not self-reported counters: the claim
  * under test is that a maintenance batch's driver-side metadata cost
  * (dir listings + status probes, from Warehouse's own listings AND
  * from Spark's file-index construction inside every read) stays flat
  * as waves accumulate. Only the filesystem boundary sees both kinds;
  * a counter the code under test increments itself would silently miss
  * exactly the table-root InMemoryFileIndex listings the contract
  * forbids. Registering the scheme via `fs.countfs.impl` routes every
  * Path under a `countfs://` warehouse root — reads, writes, renames,
  * recovery probes, task-side opens — through this class in-process.
  *
  * Statuses returned by listStatus are qualified with THIS scheme (the
  * RawLocalFileSystem contract qualifies against `getUri`), so derived
  * paths stay inside the counted universe instead of escaping to
  * `file://`. Counters are JVM-global; the scheme is touched by this
  * suite alone, so concurrent suites on the shared SparkContext cannot
  * pollute a measurement (the same isolation-by-ownership discipline
  * as [[ScopedTaskMetrics]]).
  */
class CountingFs extends RawLocalFileSystem {
  override def getScheme: String = "countfs"
  override def getUri: URI = URI.create("countfs:///")

  override def listStatus(p: Path): Array[FileStatus] = {
    val r = super.listStatus(p)
    CountingFs.listCalls.incrementAndGet(): Unit
    if (r != null) CountingFs.listedPaths.addAndGet(r.length.toLong): Unit
    r
  }

  override def getFileStatus(p: Path): FileStatus = {
    CountingFs.statCalls.incrementAndGet(): Unit
    super.getFileStatus(p)
  }
}

object CountingFs {
  /** listStatus invocations. */
  val listCalls = new AtomicLong
  /** Total entries those listings returned — "paths listed". */
  val listedPaths = new AtomicLong
  /** Single-path status probes (exists/getFileStatus). */
  val statCalls = new AtomicLong

  /** The spec's one number: every path the driver or a file index had
    * to enumerate or probe. */
  def metadataOps: Long = listCalls.get + listedPaths.get + statCalls.get
}
