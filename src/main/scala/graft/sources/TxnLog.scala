package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE atomic commits over [[CommitLog]] tables — the
  * catalog-commit design (ref: n/a, SURVEY §0; the shape is the
  * public coordinated-commit / catalog-transaction idea: per-table
  * logs stay the source of data truth, but cross-table ATOMICITY
  * moves to one coordinator entry whose publish is the single commit
  * point).
  *
  * Why a coordinator at all: two tables publish manifests as two
  * separate filesystem operations, so a reader resolving each table's
  * log independently can observe table A's new version next to table
  * B's old one — fine for independent tables, wrong for a data table
  * and its derived aggregate that must move together. The fix is
  * reader cooperation: writers publish BOTH manifests first (invisible
  * to coordinated readers), then publish ONE txn entry listing the
  * (table, version) pairs — hard-link-atomic, immutable, numbered.
  * [[snapshotAtomic]] reads the LATEST entry and opens each table at
  * its recorded version, so a reader sees every transaction entirely
  * or not at all.
  *
  * Crash anatomy (the protocol's whole point):
  *  - crash BEFORE any manifest: nothing happened.
  *  - crash BETWEEN manifests, or after both but BEFORE the txn
  *    entry: the published versions are ORPHANS — present in their
  *    table logs, referenced by no txn entry, invisible to
  *    coordinated readers forever (a retry commits at the next free
  *    version; orphans are reclaimable garbage, exactly like a
  *    failed writer's data units under plain OCC).
  *  - crash AFTER the txn entry: the transaction is durable.
  *
  * Concurrency: per-table version races resolve through
  * [[CommitLog.tryCommit]] (a loser aborts the whole txn and returns
  * false — its earlier tables' manifests become orphans); txn-entry
  * id races resolve by retrying the entry publish at the next id,
  * which is safe because by then every manifest of BOTH transactions
  * is already published — entry order just serializes reader
  * visibility. Tables are committed in sorted-path order so two
  * writers touching the same tables contend on the FIRST shared
  * table, not on disjoint prefixes of each other's work.
  *
  * At 100 TB the costs are unchanged from single-table commits: data
  * units move per table as before; the txn adds O(tables) manifest
  * writes + one O(tables)-line entry. The coordinator directory is a
  * catalog, not a data path.
  */
object TxnLog {

  private def txnDir(root: String): java.nio.file.Path =
    java.nio.file.Paths.get(root, "_txn")

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** Ordered txn ids currently published under `root`. */
  def txns(root: String): Seq[Long] = {
    val d = txnDir(root)
    if (!java.nio.file.Files.isDirectory(d)) return Seq.empty
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(d)
    try st.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("t") && n.endsWith(".txt"))
      .map(_.stripPrefix("t").stripSuffix(".txt").toLong)
      .toVector.sorted
    finally st.close()
  }

  /** The (table, version) pairs of txn `id`. */
  def entry(root: String, id: Long): Seq[(String, Long)] =
    java.nio.file.Files
      .readAllLines(txnDir(root).resolve(f"t$id%05d.txt"))
      .toArray(Array.empty[String]).toSeq.filter(_.nonEmpty)
      .map { l => val Array(t, v) = l.split('|'); (dec(t), v.toLong) }

  /** Atomically commit `entries` = (table, units-for-its-next-version)
    * across all tables, or nothing. Returns the txn id, or -1 when a
    * per-table version race was lost (the caller retries on fresh
    * state; any already-published manifests of the aborted attempt
    * are invisible orphans).
    *
    * `prepared` is a test seam firing after every manifest is
    * published but before the txn entry — the crash window the
    * protocol exists for. `raceSeam` fires per table between its
    * version read and its tryCommit — the per-table race window.
    *
    * `id` pins the transaction's ENTRY id — the idempotence handle a
    * streaming sink needs (id = batchId, the Delta txnVersion idea
    * lifted to multi-table): a REPLAYED transaction whose entry
    * already exists returns that id up front, committing nothing —
    * exactly-once for coordinated readers however many times the
    * batch re-fires. A replay that crashed after its manifests but
    * before its entry re-publishes manifests at fresh versions and
    * then claims the fixed id; the first attempt's versions stay
    * invisible orphans ([[vacuumOrphans]] fodder). With `id` unset,
    * entry ids auto-increment (the interactive-writer path).
    */
  def commitAtomic(root: String,
      entries: Seq[(String, Seq[String])],
      prepared: () => Unit = () => (),
      raceSeam: String => Unit = _ => (),
      id: Option[Long] = None): Long = {
    require(entries.nonEmpty, "an empty transaction commits nothing")
    require(entries.map(_._1).distinct.size == entries.size,
      "a table may appear once per transaction")
    id match { // idempotent replay: the txn already committed
      case Some(i) if txns(root).contains(i) => return i
      case _ => ()
    }
    // fixed global order: concurrent transactions touching the same
    // tables contend on the first shared table instead of publishing
    // interleaved prefixes
    val ordered = entries.sortBy(_._1)
    val committed = Seq.newBuilder[(String, Long)]
    for ((table, units) <- ordered) {
      val v = CommitLog.versions(table).lastOption.map(_ + 1).getOrElse(0L)
      raceSeam(table)
      if (!CommitLog.tryCommit(table, v, units))
        return -1L // lost a per-table race: abort; prior manifests orphan
      committed += ((table, v))
    }
    prepared()
    publishEntry(root, committed.result(), id)
  }

  /** Publish the txn entry — at the caller's fixed id (losing the
    * link race there means a concurrent replay of the SAME logical
    * transaction won: report its id), or at the next free id,
    * retrying the id race only (every manifest either entry
    * references is already durable).
    */
  private def publishEntry(root: String, pairs: Seq[(String, Long)],
      fixed: Option[Long]): Long = {
    val d = txnDir(root)
    java.nio.file.Files.createDirectories(d)
    val content = pairs
      .map { case (t, v) => s"${enc(t)}|$v" }.mkString("", "\n", "\n")
    var id = fixed.getOrElse(txns(root).lastOption.map(_ + 1).getOrElse(0L))
    while (true) {
      val tmp = d.resolve(s".t$id.${java.util.UUID.randomUUID}.tmp")
      java.nio.file.Files.writeString(tmp, content)
      try {
        java.nio.file.Files.createLink(d.resolve(f"t$id%05d.txt"), tmp)
        java.nio.file.Files.deleteIfExists(tmp)
        return id
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp)
          if (fixed.isDefined) return id // the replayed twin won
          id += 1 // entry-id race: both txns' manifests are durable,
                  // the retry only serializes visibility order
      }
    }
    -1L // unreachable
  }

  /** Reclaim everything the retained transactions do NOT reference:
    * per table, every version absent from the retained entries — in
    * particular the ORPHANS a crashed transaction left (manifests
    * published, entry never was) — goes through [[CommitLog.vacuum]]
    * with its ownership guard and deletion accounting; expired txn
    * entries are removed FIRST (an entry must never outlive the
    * versions it references — vacuuming first would let a coordinated
    * reader, or a crash between the two steps, resolve an entry whose
    * manifests are already gone; the safe-direction crash instead
    * leaves entry-less versions, which are ordinary orphans the next
    * run reclaims). Default retains
    * every published transaction, i.e. reclaims ONLY orphans. A table
    * referenced by NO retained transaction is out of scope here — its
    * whole directory is the caller's to delete (this op never guesses
    * at table lifetimes beyond what the retained catalog states).
    */
  def vacuumOrphans(root: String,
      retainTxns: Option[Seq[Long]] = None)
      : Map[String, CommitLog.VacuumReport] = {
    val all = txns(root)
    val keepIds = retainTxns.getOrElse(all)
    require(keepIds.nonEmpty && keepIds.forall(all.contains),
      s"retain set ${keepIds.mkString(",")} must be published txns " +
        s"(${all.mkString(",")})")
    val byTable = keepIds.flatMap(id => entry(root, id))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted.toSeq)
      .toMap
    all.filterNot(keepIds.contains).foreach(id =>
      java.nio.file.Files.delete(txnDir(root).resolve(f"t$id%05d.txt")))
    byTable.map { case (t, keep) => t -> CommitLog.vacuum(t, keep) }
  }

  /** Coordinated read: every requested table at the versions the
    * LATEST txn entry records — all of a transaction or none of it.
    * Fails loudly on a table the entry does not cover (a coordinated
    * reader asking for an uncoordinated table is a bug, not a
    * fallback).
    */
  def snapshotAtomic(spark: SparkSession, root: String,
      tables: Seq[String]): Map[String, DataFrame] = {
    val ids = txns(root)
    require(ids.nonEmpty, s"$root has no committed transactions")
    snapshotAt(spark, root, ids.last, tables)
  }

  /** Coordinated read at a SPECIFIC txn id — cross-table time travel:
    * the consistent pair the catalog recorded at that transaction.
    */
  def snapshotAt(spark: SparkSession, root: String, id: Long,
      tables: Seq[String]): Map[String, DataFrame] = {
    val at = entry(root, id).toMap
    tables.map { t =>
      require(at.contains(t),
        s"txn t$id covers ${at.keys.mkString(",")} — not $t")
      t -> CommitLog.snapshot(spark, t, at(t))
    }.toMap
  }
}
