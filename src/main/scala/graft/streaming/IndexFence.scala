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
  * Fence state lives under `<table location>/_graft_fence/` —
  * underscore-prefixed, so every table scan ignores it (Spark's hidden
  * path filter). Layout:
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
  *   - `pending-<e>-<id>`     data-file listing of every covered table
  *                            taken BEFORE batch id's first append attempt
  *
  * Commit protocol per batch:
  *   1. read `_COMMITTED`; a HIGHER epoch there ⇒ this writer is a zombie
  *      ⇒ fail loudly; same epoch with `committed ≥ batchId` ⇒ exactly-once
  *      replay no-op.
  *   2. if `pending-<e>-<id>` exists, the previous attempt crashed
  *      mid-append: delete every data file not in its listing (the orphan
  *      half-append), else snapshot the listing and write it (tmp+rename).
  *   3. run the append.
  *   4. swap `_COMMITTED` (tmp+rename), delete the pending manifest.
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
    if (committed.exists(c => c.epoch == myEpoch && c.batchId >= batchId)) {
      graftLog.info(s"fencedAppend: skipping batch $batchId at " +
        s"${tables.head} — already committed through " +
        s"${committed.get.batchId} (epoch $myEpoch in-epoch replay)")
      return false
    }
    val dirs = tables.map(t => t -> tableDir(spark, t))
    val pending = new Path(root, s"pending-$myEpoch-$batchId")
    if (fs.exists(pending)) {
      // previous attempt of THIS batch crashed mid-append: every data file
      // not in its pre-append listing is the crashed attempt's orphan —
      // delete them so the re-append lands exactly once
      val in = fs.open(pending)
      val keep = try scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toSet
      finally in.close()
      dirs.foreach { case (t, dir) =>
        dataFiles(fs, dir).filterNot(f => keep(s"$t/$f")).foreach { f =>
          graftLog.warn(s"fencedAppend: purging orphan file $t/$f from a " +
            s"crashed append attempt of batch $batchId")
          fs.delete(new Path(dir, f), false)
        }
        // the catalog caches the table's file listing; the purge must be
        // visible to the re-append's reads of the index table itself
        spark.catalog.refreshTable(t)
      }
    } else {
      val listing = dirs.flatMap { case (t, dir) =>
        dataFiles(fs, dir).map(f => s"$t/$f") }.mkString("\n")
      writeAtomic(fs, pending,
        new Path(root, s"pending-$myEpoch-$batchId.tmp"), listing)
    }
    append
    writeAtomic(fs, new Path(root, "_COMMITTED"),
      new Path(root, s"_COMMITTED.$myEpoch.$batchId.tmp"),
      s"committed=$batchId\nepoch=$myEpoch\nwriter=${myClaim.nonce}")
    fs.delete(pending, false)
    true
  }
}
