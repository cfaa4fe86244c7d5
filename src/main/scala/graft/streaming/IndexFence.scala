package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Replay/zombie fencing for STREAMING APPENDS to persisted index tables
  * (r14 verdict item 2): a bucketed `saveAsTable(append)` is not
  * replay-idempotent — a failure-recovery redelivery of a micro-batch
  * would double-append its postings, silently duplicating probe results.
  * [[fencedAppend]] wraps the append with the same two commit primitives
  * [[StreamOps.upsertSnapshot]] uses (a writer EPOCH claimed at
  * construction and a committed-batch manifest swapped by atomic rename),
  * plus the one piece an append needs that a compact-and-swap doesn't: a
  * PENDING file-listing manifest that makes the append itself
  * crash-recoverable (a replay first deletes the orphan files the crashed
  * attempt wrote, then re-appends — so the committed row set is exactly
  * once regardless of where the previous attempt died).
  *
  * Fence state lives NEXT TO the table, keyed by table NAME
  * (`<parent>/_graft_fence_<table>` — see [[fenceRoot]]): it must
  * OUTLIVE the table directory, because compaction retires the postings
  * directory and flips the table to a fresh generation (the pre-r16
  * in-table layout lost its epoch markers and `_COMMITTED` manifest at
  * every compaction, so a checkpoint-resumed append double-appended).
  * Still underscore-prefixed and outside every table directory, so no
  * scan ever sees it. Layout:
  *   - `epoch-<n>`            writer-epoch claim markers (create-if-absent
  *                            is the lease primitive; content = claimant's
  *                            nonce, read-back-verified — see the
  *                            filesystem contract on
  *                            [[StreamOps.upsertSnapshot]])
  *   - `_COMMITTED`           `committed=<batchId>` + `epoch=<n>` +
  *                            `writer=<nonce>` of the last committed
  *                            append (atomic rename swap; a same-epoch
  *                            FOREIGN nonce here fences a double-claimed
  *                            writer loudly)
  *   - `pending-<e>-<id>`     pre-append snapshot of every covered table,
  *                            taken BEFORE batch id's first append
  *                            attempt: `#loc <table> <qualified dir>`
  *                            headers (one per table — the generation the
  *                            listing describes), then `<table>/<file>`
  *                            data-file keys
  *
  * Commit protocol per batch:
  *   1. read `_COMMITTED`; a HIGHER epoch there ⇒ this writer is a zombie
  *      ⇒ fail loudly; `committed ≥ batchId` at ANY epoch ⇒ exactly-once
  *      replay no-op (batch ids are monotonic across restarts under a
  *      shared checkpoint, and a batch fence-committed just before a
  *      driver crash is redelivered by the resumed writer under a FRESH
  *      epoch — an epoch-equality condition here would re-append it).
  *   2. if ANY `pending-*` manifest exists — not just this epoch's: a
  *      checkpoint resume claims a FRESH epoch, so a crashed attempt's
  *      manifest usually carries a LOWER epoch than the replaying
  *      writer's — the previous attempt crashed mid-append. For each
  *      table still at the location its manifests recorded, delete every
  *      data file not in ALL of its listings (the orphan half-append);
  *      a table whose location CHANGED was compacted since the crash —
  *      skip its purge (the listing names only retired-generation files;
  *      fence-aware compaction purged the orphans before rewriting, see
  *      [[purgeCrashedAppendOrphans]]). Delete the stale manifests.
  *   3. snapshot the now-clean listing to `pending-<e>-<id>` (tmp+rename).
  *   4. run the append.
  *   5. swap `_COMMITTED` (tmp+rename), delete the pending manifest.
  *
  * A crash anywhere re-enters at step 1 on redelivery and converges to the
  * same committed row set. The unfenced window matches upsertSnapshot's
  * (a zombie whose fence read precedes the live writer's first commit) and
  * carries the same documented contract.
  */
object IndexFence {

  private lazy val graftLog =
    org.slf4j.LoggerFactory.getLogger(IndexFence.getClass)

  private def tableDir(spark: SparkSession, table: String): Path =
    new Path(spark.sessionState.catalog
      .getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .location)

  /** Fence state must OUTLIVE the table directory: compaction
    * ([[graft.ops.SimilarityOps.compactBucketedTable]]) retires the
    * postings directory and flips the table to a fresh generation (and
    * the earlier DROP+RENAME design deleted the directory outright) — a
    * fence living inside the table directory (the pre-r16 layout) lost
    * its epoch markers and `_COMMITTED` manifest at every compaction, so
    * a checkpoint-resumed append afterwards would REPLAY its committed
    * batches and double-append (pinned in IndexMaintenanceSpec r16).
    * The root therefore lives NEXT TO the table, keyed by table NAME
    * (`<parent>/_graft_fence_<table>`): stable across drops, renames and
    * compaction generation flips; still underscore-prefixed and outside
    * every table directory, so no scan ever sees it. */
  private def fenceRoot(spark: SparkSession, table: String): Path =
    new Path(tableDir(spark, table).getParent, s"_graft_fence_$table")

  /** Claim this writer's fencing epoch for appends to `table` — call ONCE
    * per writer, at construction (epochs must follow writer start order;
    * see [[StreamOps.upsertSnapshot]]'s inverted-failure note). The
    * returned claim carries the writer's nonce — the double-claim
    * detector for non-atomic stores (see [[StreamOps.claimEpoch]]). */
  def claimWriterEpoch(spark: SparkSession, table: String): StreamOps.EpochClaim = {
    val root = fenceRoot(spark, table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    StreamOps.claimEpoch(fs, root)
  }

  /** Reset the PER-INCARNATION fence state (`_COMMITTED` + `pending-*`)
    * for `table` — called by every fresh index BUILD over a possibly
    * pre-existing name (writeIvfIndex / writeLshIndex overwrite paths).
    * Batch-id-based replay no-ops are only sound WITHIN one table
    * incarnation: a rebuilt index restarts its stream from a fresh
    * checkpoint (batch ids from 0 again), and a stale `_COMMITTED` from
    * the previous incarnation would silently no-op every early batch of
    * the new one. Epoch markers are KEPT: the writer lease outlives
    * incarnations, so a zombie writer from before the rebuild stays
    * fenced. */
  def resetBatchState(spark: SparkSession, table: String): Unit = {
    val root = fenceRoot(spark, table)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    fs.listStatus(root).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n == "_COMMITTED" || n.startsWith("pending-")
      }
      .foreach { st =>
        graftLog.info(s"resetBatchState($table): clearing " +
          s"${st.getPath.getName} from the previous table incarnation")
        fs.delete(st.getPath, false)
      }
  }

  private case class Committed(batchId: Long, epoch: Long, writer: String)

  private def readCommitted(fs: FileSystem, root: Path): Option[Committed] = {
    val p = new Path(root, "_COMMITTED")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val s = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val kv = s.split("\n").map(_.trim).filter(_.contains("="))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
      Some(Committed(kv("committed").toLong, kv("epoch").toLong,
        kv.getOrElse("writer", "")))
    }
  }

  private def writeAtomic(fs: FileSystem, target: Path, tmp: Path,
                          contents: String): Unit = {
    val out = fs.create(tmp, true)
    try out.write(contents.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(target.toUri, fs.getConf)
      .rename(tmp, target, Options.Rename.OVERWRITE)
  }

  /** Non-hidden data files of a table directory, as `dirName/fileName`
    * relative keys (the pending-manifest vocabulary). Bucketed index
    * tables are unpartitioned, so data files sit directly in the dir. */
  private def dataFiles(fs: FileSystem, dir: Path): Seq[String] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName)

  /** A crashed append attempt's pre-append snapshot: which generation
    * directory each covered table lived in (`locs`) and the data files it
    * held (`files`, as `table/file` keys) when the attempt started. */
  private case class PendingManifest(path: Path, locs: Map[String, String],
                                     files: Set[String])

  private def listPendingManifests(fs: FileSystem,
                                   root: Path): Seq[PendingManifest] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("pending-") &&
        !st.getPath.getName.endsWith(".tmp"))
      .map { st =>
        val in = fs.open(st.getPath)
        val lines = try scala.io.Source.fromInputStream(in, "UTF-8")
          .getLines().map(_.trim).filter(_.nonEmpty).toList
        finally in.close()
        val (locLines, fileLines) = lines.partition(_.startsWith("#loc "))
        // DELIBERATE hard stop, not a migration shim (r17 review weighed
        // and kept it): a header-less manifest (pre-r17 format) cannot
        // say which generation its listing describes. Guessing "current
        // location" reproduces the exact bug the headers fix (a purge
        // against a compaction-flipped generation deletes every
        // compacted file), and silently skipping would leave the crashed
        // attempt's orphans to be doubled by the replay. The operator
        // remedy is explicit: reconcile the table against the listing,
        // then delete the manifest.
        if (locLines.isEmpty)
          throw new IllegalStateException(
            s"fence: unrecognized pending-manifest format at ${st.getPath}" +
              " — no '#loc' headers, so there is no way to tell which " +
              "generation its listing describes; refusing to purge " +
              "against it (a wrong guess deletes live index files). " +
              "Reconcile the table manually, then delete this manifest")
        val locs = locLines.map { l =>
          val Array(t, loc) = l.stripPrefix("#loc ").split(" ", 2)
          t -> loc
        }.toMap
        PendingManifest(st.getPath, locs, fileLines.toSet)
      }

  /** Purge crashed-append orphan files from `table`'s CURRENT directory,
    * using any pending fence manifest that recorded the table at that
    * location. Called by compaction
    * ([[graft.ops.SimilarityOps.compactBucketedTable]]) BEFORE it reads
    * the live rows (ADVICE r16): a compaction running between an append
    * crash and its checkpoint replay would otherwise bake the crashed
    * attempt's half-appended rows into the new generation — and the
    * replay, whose location check correctly refuses to purge a flipped
    * generation against an old listing, would then re-append the whole
    * batch and silently DOUBLE those rows. The manifests are deliberately
    * left in place: the replay still needs them to know a repair was due;
    * it sees the location changed, skips its own purge, and takes a
    * fresh snapshot.
    *
    * The fence root is keyed by the fence group's HEAD table, which need
    * not be `table` itself, so this scans every `_graft_fence_*` sibling
    * of the table's parent directory. Single-maintainer contract as
    * everywhere in this file: no append runs concurrently with the
    * compaction that calls this. */
  def purgeCrashedAppendOrphans(spark: SparkSession, table: String): Unit = {
    val dir = tableDir(spark, table)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = fs.makeQualified(dir).toString
    val parent = dir.getParent
    if (parent == null || !fs.exists(parent)) return
    val relevant = fs.listStatus(parent).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("_graft_fence_"))
      .flatMap(st => listPendingManifests(fs, st.getPath))
      .filter(_.locs.get(table).contains(live))
    if (relevant.isEmpty) return
    val keep = relevant
      .map(_.files.filter(_.startsWith(s"$table/")))
      .reduce(_ intersect _)
    var purged = 0
    dataFiles(fs, dir).filterNot(f => keep(s"$table/$f")).foreach { f =>
      graftLog.warn(s"purgeCrashedAppendOrphans: purging $table/$f — a " +
        "crashed append attempt's orphan (recorded by a pending fence " +
        "manifest) must not be compacted into the next generation")
      fs.delete(new Path(dir, f), false)
      purged += 1
    }
    if (purged > 0) spark.catalog.refreshTable(table)
  }

  /** Run `append` exactly once for (`myEpoch`, `batchId`) against the data
    * tables `tables` (all must live in the same metastore; the fence root
    * hangs off `tables.head`'s directory). Returns true if the append ran,
    * false if it was skipped as an in-epoch replay of a committed batch.
    * Throws `IllegalStateException` if a newer writer epoch has committed
    * (this writer is a zombie). */
  def fencedAppend(spark: SparkSession, tables: Seq[String],
                   myClaim: StreamOps.EpochClaim, batchId: Long)
                  (append: => Unit): Boolean = {
    require(tables.nonEmpty, "fencedAppend: no tables to fence")
    val myEpoch = myClaim.epoch
    val root = fenceRoot(spark, tables.head)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(root)
    val committed = readCommitted(fs, root)
    committed.filter(_.epoch > myEpoch).foreach { c =>
      throw new IllegalStateException(
        s"fencedAppend: writer fenced at ${tables.head} — a newer writer " +
          s"(epoch ${c.epoch}, committed through batch ${c.batchId}) owns " +
          s"this index; this writer (epoch $myEpoch) is a zombie from an " +
          "abandoned run and must shut down")
    }
    // equal epoch, foreign nonce ⇒ a non-atomic store double-claimed the
    // epoch past claimEpoch's read-back window — fail loudly (see the
    // FILESYSTEM CONTRACT on StreamOps.upsertSnapshot)
    committed.filter(c => c.epoch == myEpoch && c.writer.nonEmpty &&
        c.writer != myClaim.nonce).foreach { c =>
      throw new IllegalStateException(
        s"fencedAppend: DOUBLE-CLAIMED epoch $myEpoch at ${tables.head} — " +
          s"committed manifest carries writer ${c.writer}, this writer is " +
          s"${myClaim.nonce}; the store's create-if-absent is not atomic. " +
          "Shut down and restart to claim a fresh epoch")
    }
    // Replay no-op on batch id ALONE, not (epoch, batch): with a shared
    // checkpoint, batch ids are monotonic across restarts, and the
    // crash window BETWEEN the fence commit (step 5) and Spark's own
    // commit-log write means a fully fence-committed batch can be
    // redelivered by a resumed writer under a FRESH epoch — requiring
    // epoch equality here made that replay re-append and double the
    // batch (r17 review finding, pinned in IndexMaintenanceSpec). Higher
    // epochs were already fenced above; a lower-epoch committed marker
    // with batchId >= ours is precisely "my predecessor finished this
    // batch before dying".
    if (committed.exists(c => c.batchId >= batchId)) {
      graftLog.info(s"fencedAppend: skipping batch $batchId at " +
        s"${tables.head} — already committed through " +
        s"${committed.get.batchId} by epoch ${committed.get.epoch} " +
        s"(this writer: epoch $myEpoch; cross-epoch replay after a " +
        "checkpoint resume is a no-op)")
      return false
    }
    val dirs = tables.map(t => t -> tableDir(spark, t))
    def qualifiedLoc(dir: Path): String =
      dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(dir).toString
    val stale = listPendingManifests(fs, root)
    if (stale.nonEmpty) {
      // SOME previous append attempt crashed mid-append — not necessarily
      // under THIS epoch or batch id: a checkpoint resume claims a FRESH
      // epoch, so matching on pending-<myEpoch>-<batchId> alone would
      // miss a lower-epoch crash, snapshot its orphans as legitimate
      // pre-batch files, and DOUBLE them on re-append (pinned in
      // IndexMaintenanceSpec r17). A data file not present in EVERY
      // manifest that recorded the table at its CURRENT location is an
      // uncommitted orphan (appends only land through this fence, and a
      // committed append deletes its manifest) — delete them so the
      // re-append lands exactly once.
      dirs.foreach { case (t, dir) =>
        val nowLoc = qualifiedLoc(dir)
        val (current, flipped) = stale.filter(_.locs.contains(t))
          .partition(_.locs(t) == nowLoc)
        flipped.foreach { m =>
          graftLog.warn(s"fencedAppend: $t moved from ${m.locs(t)} to " +
            s"$nowLoc since ${m.path.getName}'s pre-append snapshot — a " +
            "compaction flipped the generation. Skipping that manifest's " +
            "purge (its listing names only retired-generation files; " +
            "purging the new generation against it would delete every " +
            "compacted file). The fence-aware compaction already purged " +
            "the crashed attempt's orphans before rewriting " +
            "(purgeCrashedAppendOrphans)")
        }
        if (current.nonEmpty) {
          val keep = current
            .map(_.files.filter(_.startsWith(s"$t/")))
            .reduce(_ intersect _)
          dataFiles(fs, dir).filterNot(f => keep(s"$t/$f")).foreach { f =>
            graftLog.warn(s"fencedAppend: purging orphan file $t/$f from " +
              "a crashed append attempt")
            fs.delete(new Path(dir, f), false)
          }
        }
        // the catalog caches the table's file listing; the purge (or a
        // generation flip) must be visible to the re-append's reads of
        // the index table itself
        spark.catalog.refreshTable(t)
      }
      stale.foreach(m => fs.delete(m.path, false))
    }
    // snapshot the NOW-clean pre-append state — fresh even on a replay:
    // after the purge the directories hold exactly the pre-batch row set,
    // and reusing a stale listing would poison the next repair if this
    // attempt also crashes
    val pending = new Path(root, s"pending-$myEpoch-$batchId")
    val snapshot = {
      val locs = dirs.map { case (t, dir) => s"#loc $t ${qualifiedLoc(dir)}" }
      val files = dirs.flatMap { case (t, dir) =>
        dataFiles(fs, dir).map(f => s"$t/$f") }
      (locs ++ files).mkString("\n")
    }
    writeAtomic(fs, pending,
      new Path(root, s"pending-$myEpoch-$batchId.tmp"), snapshot)
    append
    writeAtomic(fs, new Path(root, "_COMMITTED"),
      new Path(root, s"_COMMITTED.$myEpoch.$batchId.tmp"),
      s"committed=$batchId\nepoch=$myEpoch\nwriter=${myClaim.nonce}")
    fs.delete(pending, false)
    true
  }
}
