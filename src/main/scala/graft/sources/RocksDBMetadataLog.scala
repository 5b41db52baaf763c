package graft.sources

import java.io.{File, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.UUID
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.internal.Logging
import org.apache.spark.sql.execution.streaming.checkpointing.CheckpointFileManager
import org.rocksdb.{Checkpoint, Options, RocksDB, WriteBatch, WriteOptions}

/** RocksDB-backed implementation of [[FileMetadataLog]] — the stage-2
  * log of SURVEY §7.1, giving the reference's O22-O25 capabilities
  * (versioned KV store, incremental DFS checkpointing, version GC) in a
  * deliberately smaller design:
  *
  *  - KV layout: `b:<batchId>` -> JSON file entries; `f:<path>` ->
  *    `{ts, batch}` (the reference's two key-type tags, as prefixes).
  *  - Durability: every `add` is a sync WriteBatch, then an incremental
  *    checkpoint to the streaming checkpoint dir: immutable `*.sst`
  *    files upload once under uuid-suffixed names (`SSTs/`), mutable
  *    files (MANIFEST/CURRENT/OPTIONS/log) zip into an atomically-renamed
  *    `<version>.zip` whose metadata lists the SSTs it needs.
  *  - Recovery: newest zip + referenced SSTs rebuild the local DB.
  *  - GC: versions older than `minVersionsToRetain` are deleted along
  *    with SSTs no retained version references (amortized via commit()).
  *
  * The reference instead forked ~1,600 LoC of Spark's state-store
  * internals (RocksDB.scala, RocksDBFileManager.scala); this impl uses
  * rocksdbjni directly and keeps the same externally-observable contract.
  */
final class RocksDBMetadataLog(
    metadataPath: String,
    hadoopConf: Configuration,
    minVersionsToRetain: Int = 10) extends FileMetadataLog with Logging {

  import RocksDBMetadataLog._

  RocksDB.loadLibrary()

  private val mapper = new ObjectMapper()
  private val dfsRoot = new Path(metadataPath, "rocksdb")
  private val sstDir = new Path(dfsRoot, "SSTs")
  private val fm = CheckpointFileManager.create(dfsRoot, hadoopConf)
  if (!fm.exists(sstDir)) fm.mkdirs(sstDir)

  private val localRoot = Files.createTempDirectory("graft-rocksdb").toFile
  private val dbDir = new File(localRoot, "db")

  // local sst name -> dfs uploaded name (survives across versions)
  private val uploadedSsts = mutable.HashMap[String, String]()
  @volatile private var version: Long = 0L
  @volatile private var latestBatch: Option[Long] = None

  // O27 parity with the reference's RocksDB-side metrics
  // (RocksDB.scala:334-381): commit-phase latencies + checkpoint bytes
  // moved vs reused, surfaced via metricsJson at every source commit
  private object metrics {
    var adds = 0L
    var addLatencyTotalMs = 0L
    var lastAddLatencyMs = 0L
    var checkpoints = 0L
    var checkpointLatencyTotalMs = 0L
    var lastCheckpointLatencyMs = 0L
    var sstFilesUploaded = 0L
    var sstBytesUploaded = 0L
    var sstFilesReused = 0L
    var sstBytesReused = 0L
    var zipBytesWritten = 0L
    var gcRuns = 0L
    var gcAborts = 0L
    var versionsDeleted = 0L
    var sstsDeleted = 0L
  }

  override def metricsJson: String = synchronized {
    import metrics._
    s"""{"adds":$adds,"addLatencyTotalMs":$addLatencyTotalMs,""" +
      s""""lastAddLatencyMs":$lastAddLatencyMs,"checkpoints":$checkpoints,""" +
      s""""checkpointLatencyTotalMs":$checkpointLatencyTotalMs,""" +
      s""""lastCheckpointLatencyMs":$lastCheckpointLatencyMs,""" +
      s""""sstFilesUploaded":$sstFilesUploaded,"sstBytesUploaded":$sstBytesUploaded,""" +
      s""""sstFilesReused":$sstFilesReused,"sstBytesReused":$sstBytesReused,""" +
      s""""zipBytesWritten":$zipBytesWritten,"gcRuns":$gcRuns,"gcAborts":$gcAborts,""" +
      s""""versionsDeleted":$versionsDeleted,"sstsDeleted":$sstsDeleted}"""
  }

  private val dbOptions = new Options().setCreateIfMissing(true)
  private val writeOptions = new WriteOptions().setSync(true)
  private var db: RocksDB = restore()

  // ---------------------------------------------------------------- keys
  private def batchKey(id: Long): Array[Byte] =
    f"b:$id%020d".getBytes(StandardCharsets.UTF_8)
  private def fileKey(path: String): Array[Byte] =
    ("f:" + path).getBytes(StandardCharsets.UTF_8)

  private def entriesToJson(entries: Array[FileEntry]): Array[Byte] = {
    val arr = mapper.createArrayNode()
    entries.foreach { e =>
      val o = arr.addObject()
      o.put("path", e.path); o.put("timestampMs", e.timestampMs)
    }
    mapper.writeValueAsBytes(arr)
  }

  private def jsonToEntries(bytes: Array[Byte], batchId: Long): Array[FileEntry] =
    mapper.readTree(bytes).elements().asScala.map { n =>
      FileEntry(n.get("path").asText(), n.get("timestampMs").asLong(), batchId)
    }.toArray

  // ------------------------------------------------------------ contract
  override def add(batchId: Long, entries: Array[FileEntry]): Boolean = synchronized {
    val t0 = System.nanoTime()
    if (db.get(batchKey(batchId)) != null) throw new GraftMetalogAddException(batchId)
    val wb = new WriteBatch()
    try {
      wb.put(batchKey(batchId), entriesToJson(entries))
      entries.foreach { e =>
        wb.put(fileKey(e.path),
          s"""{"ts":${e.timestampMs},"batch":$batchId}""".getBytes(StandardCharsets.UTF_8))
      }
      db.write(writeOptions, wb)
    } finally wb.close()
    latestBatch = Some(latestBatch.fold(batchId)(math.max(_, batchId)))
    version += 1
    checkpointToDfs()
    metrics.adds += 1
    metrics.lastAddLatencyMs = (System.nanoTime() - t0) / 1000000L
    metrics.addLatencyTotalMs += metrics.lastAddLatencyMs
    true
  }

  override def get(batchId: Long): Option[Array[FileEntry]] =
    Option(db.get(batchKey(batchId))).map(jsonToEntries(_, batchId))

  override def get(startId: Long, endId: Long): Array[(Long, Array[FileEntry])] =
    (startId to endId).map { id =>
      id -> get(id).getOrElse(
        throw new GraftSourceException(s"batch $id missing from metadata log [$startId, $endId]"))
    }.toArray

  override def getLatestBatchId: Option[Long] = latestBatch

  override def isNewFile(path: String, lastPurgeTimestampMs: Long): Boolean =
    getFile(path).forall(_.timestampMs < lastPurgeTimestampMs)

  override def getFile(path: String): Option[FileEntry] =
    Option(db.get(fileKey(path))).map { bytes =>
      val n = mapper.readTree(bytes)
      FileEntry(path, n.get("ts").asLong(), n.get("batch").asLong())
    }

  override def purgeBefore(horizonMs: Long): Int = synchronized {
    val toRemove = mutable.ArrayBuffer[(Long, Array[FileEntry])]()
    val it = db.newIterator()
    try {
      it.seek("b:".getBytes(StandardCharsets.UTF_8))
      while (it.isValid && toRemove.size < FileBackedMetadataLog.MaxBatchesRemovedPerPurge &&
        new String(it.key(), StandardCharsets.UTF_8).startsWith("b:")) {
        val id = new String(it.key(), StandardCharsets.UTF_8).stripPrefix("b:").toLong
        val entries = jsonToEntries(it.value(), id)
        if (!latestBatch.contains(id) && entries.forall(_.timestampMs < horizonMs)) {
          toRemove += ((id, entries))
        }
        it.next()
      }
    } finally it.close()
    if (toRemove.nonEmpty) {
      val wb = new WriteBatch()
      try {
        toRemove.foreach { case (id, entries) =>
          wb.delete(batchKey(id))
          entries.foreach { e =>
            // only drop the file key if it still points at this batch
            getFile(e.path).filter(_.batchId == id).foreach(_ => wb.delete(fileKey(e.path)))
          }
        }
        db.write(writeOptions, wb)
      } finally wb.close()
      version += 1
      checkpointToDfs()
    }
    toRemove.size
  }

  /** Amortized version GC (the reference's maintenance-task duty). */
  override def commit(): Unit = deleteOldVersions()

  override def close(): Unit = synchronized {
    if (db != null) { db.close(); db = null }
    dbOptions.close(); writeOptions.close()
    org.apache.commons.io.FileUtils.deleteQuietly(localRoot)
  }

  // ----------------------------------------------- checkpointing to DFS
  private def versionZip(v: Long): Path = new Path(dfsRoot, s"$v.zip")

  private def checkpointToDfs(): Unit = {
    val t0 = System.nanoTime()
    val snapDir = new File(localRoot, s"snap-$version")
    val cp = Checkpoint.create(db)
    try cp.createCheckpoint(snapDir.getAbsolutePath) finally cp.close()
    try {
      val files = snapDir.listFiles().toSeq
      val (ssts, mutables) = files.partition(_.getName.endsWith(".sst"))
      // immutable SSTs: upload new ones once, under uuid-suffixed names
      // (a restarted DB can reuse local names with different content)
      ssts.foreach { sst =>
        if (!uploadedSsts.contains(sst.getName)) {
          val dfsName = s"${sst.getName}-${UUID.randomUUID().toString.take(8)}"
          val out = fm.createAtomic(new Path(sstDir, dfsName), overwriteIfPossible = false)
          try { Files.copy(sst.toPath, out); out.close() }
          catch { case t: Throwable => out.cancel(); throw t }
          uploadedSsts(sst.getName) = dfsName
          metrics.sstFilesUploaded += 1
          metrics.sstBytesUploaded += sst.length()
        } else {
          metrics.sstFilesReused += 1
          metrics.sstBytesReused += sst.length()
        }
      }
      // mutable files + metadata -> one atomic zip per version
      val meta = mapper.createObjectNode()
      meta.put("formatVersion", RocksDBMetadataLog.CheckpointFormatVersion)
      meta.put("version", version)
      meta.put("latestBatch", latestBatch.getOrElse(-1L))
      val sstMap = meta.putObject("ssts")
      ssts.foreach(s => sstMap.put(s.getName, uploadedSsts(s.getName)))
      // expected byte sizes, so restore can tell a torn/truncated SST
      // sidecar from a healthy one BEFORE handing the files to RocksDB
      // (whose open error would not name the damaged file)
      val sizeMap = meta.putObject("sstSizes")
      ssts.foreach(s => sizeMap.put(s.getName, s.length()))
      val out = fm.createAtomic(versionZip(version), overwriteIfPossible = true)
      try {
        val zos = new ZipOutputStream(out)
        zos.putNextEntry(new ZipEntry("metadata.json"))
        zos.write(mapper.writeValueAsBytes(meta))
        zos.closeEntry()
        mutables.foreach { f =>
          zos.putNextEntry(new ZipEntry(f.getName))
          val in = new FileInputStream(f)
          try in.transferTo(zos) finally in.close()
          zos.closeEntry()
        }
        zos.finish()
        out.close()
        metrics.zipBytesWritten += mutables.map(_.length()).sum
      } catch { case t: Throwable => out.cancel(); throw t }
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(snapDir)
    }
    metrics.checkpoints += 1
    metrics.lastCheckpointLatencyMs = (System.nanoTime() - t0) / 1000000L
    metrics.checkpointLatencyTotalMs += metrics.lastCheckpointLatencyMs
  }

  private def listVersions(): Seq[Long] =
    if (!fm.exists(dfsRoot)) Seq.empty
    else fm.list(dfsRoot).toSeq
      .flatMap(_.getPath.getName.stripSuffix(".zip") match {
        case s if s.forall(_.isDigit) && s.nonEmpty => Some(s.toLong)
        case _ => None
      })

  /** Restore the newest READABLE checkpoint version. A torn newest zip
    * means that version's commit never completed (createAtomic makes this
    * unreachable on rename-atomic filesystems, but an object store can
    * tear) — the previous retained version is then the durable state,
    * like a WAL truncated to its last complete record; the next commit
    * re-writes the torn version's zip atomically. Only corruption falls
    * through to an older version; a future-format checkpoint still fails
    * immediately (it is intact — this build just must not touch it).
    * RocksDB.open runs INSIDE the fallback loop: a version whose files
    * extract cleanly but refuse to open (an SST rotted at its recorded
    * size, a corrupt MANIFEST) is as unrestorable as a torn zip, so it
    * falls back to the previous retained version instead of hard-failing
    * while restorable checkpoints still exist. */
  private def restore(): RocksDB = {
    dbDir.mkdirs()
    val versions = listVersions().sorted(Ordering[Long].reverse)
    val corrupt = mutable.ArrayBuffer[String]()
    var db: RocksDB = null
    val restored = versions.find { v =>
      try {
        loadVersion(v)
        db = try RocksDB.open(dbOptions, dbDir.getAbsolutePath) catch {
          case scala.util.control.NonFatal(e) =>
            throw new GraftCheckpointCorruptException(
              s"checkpoint zip ${versionZip(v)} extracted cleanly but RocksDB " +
                s"refused to open it (${e.getMessage})", e)
        }
        true
      } catch {
        case e: GraftCheckpointCorruptException =>
          corrupt += e.getMessage
          logWarning(s"${e.getMessage}; falling back to the previous retained version")
          // drop any partially-extracted files before trying the older zip
          Option(dbDir.listFiles()).foreach(_.foreach(f =>
            org.apache.commons.io.FileUtils.deleteQuietly(f)))
          uploadedSsts.clear()
          false
      }
    }
    if (restored.isEmpty && versions.nonEmpty) {
      throw new GraftSourceException(
        s"metadata log restore failed: no readable checkpoint among versions " +
          s"${versions.mkString(", ")} under $dfsRoot (${corrupt.mkString("; ")})")
    }
    if (restored.isDefined) db
    else try RocksDB.open(dbOptions, dbDir.getAbsolutePath) catch {
      case scala.util.control.NonFatal(e) =>
        // fresh checkpoint dir (no versions yet): nothing to fall back to,
        // and saying "checkpoint version null extracted cleanly" would lie
        throw new GraftSourceException(
          s"metadata log init failed: RocksDB refused to open a fresh " +
            s"instance at $dbDir (${e.getMessage})", e)
    }
  }

  /** Extract one checkpoint version into dbDir and adopt its metadata.
    * Throws [[GraftCheckpointCorruptException]] for anything torn and
    * [[GraftSourceException]] for an intact-but-newer format. */
  private def loadVersion(v: Long): Unit = {
    def corruptFail(detail: String, cause: Throwable = null): Nothing =
      throw new GraftCheckpointCorruptException(s"checkpoint zip ${versionZip(v)} $detail", cause)
    var metaBytes: Array[Byte] = null
    try {
      val in = new ZipInputStream(fm.open(versionZip(v)))
      try {
        var entry = in.getNextEntry
        while (entry != null) {
          val target = new File(dbDir, new File(entry.getName).getName)
          if (entry.getName == "metadata.json") {
            metaBytes = in.readAllBytes()
          } else {
            val fos = new FileOutputStream(target)
            try in.transferTo(fos) finally fos.close()
          }
          entry = in.getNextEntry
        }
      } finally in.close()
    } catch {
      case scala.util.control.NonFatal(e) => corruptFail(s"is unreadable (${e.getMessage})", e)
    }
    if (metaBytes == null) {
      corruptFail("has no metadata.json — torn write, or not a graft metalog checkpoint")
    }
    val meta = try mapper.readTree(metaBytes) catch {
      case scala.util.control.NonFatal(e) => corruptFail(s"has torn metadata.json (${e.getMessage})", e)
    }
    // format discipline (reference parity: its metadata logs version
    // their payloads): checkpoints written before the marker existed
    // read as format 1; a future format fails descriptively
    val fmtVersion =
      if (meta.hasNonNull("formatVersion")) meta.get("formatVersion").asInt() else 1
    if (fmtVersion > RocksDBMetadataLog.CheckpointFormatVersion) {
      throw new GraftSourceException(
        s"checkpoint ${versionZip(v)} has format version $fmtVersion, but this " +
          s"build reads at most ${RocksDBMetadataLog.CheckpointFormatVersion} — " +
          "the checkpoint was written by a newer release")
    }
    if (!meta.hasNonNull("version") || !meta.hasNonNull("latestBatch") || !meta.hasNonNull("ssts")) {
      corruptFail("has metadata.json missing version/latestBatch/ssts")
    }
    try {
      meta.get("ssts").properties().asScala.foreach { e =>
        val localName = e.getKey
        val dfsName = e.getValue.asText()
        val is = fm.open(new Path(sstDir, dfsName))
        try Files.copy(is, new File(dbDir, localName).toPath)
        finally is.close()
        // torn-sidecar check: a truncated SST copies without error and
        // only explodes later, opaquely, inside RocksDB — compare against
        // the size recorded at upload time (absent in pre-size checkpoints)
        if (meta.hasNonNull("sstSizes") && meta.get("sstSizes").hasNonNull(localName)) {
          val expected = meta.get("sstSizes").get(localName).asLong()
          val actual = new File(dbDir, localName).length()
          if (actual != expected) {
            corruptFail(s"references SST $dfsName which is torn " +
              s"($actual bytes on DFS, $expected recorded at upload)")
          }
        }
        uploadedSsts(localName) = dfsName
      }
    } catch {
      case e: GraftCheckpointCorruptException => throw e
      case scala.util.control.NonFatal(e) => corruptFail(s"references an unreadable SST (${e.getMessage})", e)
    }
    version = meta.get("version").asLong()
    latestBatch = Some(meta.get("latestBatch").asLong()).filter(_ >= 0)
    logInfo(s"restored rocksdb metadata log at version $version, " +
      s"latestBatch=$latestBatch, ${uploadedSsts.size} SSTs")
  }

  /** Drop version zips beyond the retention window and SSTs that no
    * retained version references. */
  private def deleteOldVersions(): Unit = synchronized {
    val versions = listVersions().sorted
    if (versions.size <= minVersionsToRetain) return
    val (old, keep) = versions.splitAt(versions.size - minVersionsToRetain)
    val referenced = mutable.HashSet[String]()
    for (v <- keep) {
      // Only the NEWEST retained zip may legitimately be torn: restore()
      // deliberately leaves a torn newest on disk (the next checkpoint
      // overwrites it), and skipping it is safe — a torn zip can never be
      // restored from, so it contributes no SST references worth
      // protecting. Any OLDER retained zip that fails to read is a
      // different story: a transient DFS blip on a perfectly restorable
      // version looks identical to corruption, and GC'ing the SSTs it
      // references would silently make that checkpoint unrestorable
      // forever. Abort the whole pass (no deletes) and retry next commit —
      // a real corruption just means GC stays paused until retention
      // rotates the bad zip into the newest-tolerated slot or an operator
      // intervenes, never silent data loss.
      // Either the zip's SST references, or why they couldn't be read.
      // NB a truncated zip does NOT reliably throw: ZipInputStream's
      // getNextEntry returns null on a torn header, so "no metadata.json
      // found" must count as unreadable, not as an empty reference set.
      val refs: Either[String, Seq[String]] = try {
        val in = new ZipInputStream(fm.open(versionZip(v)))
        try {
          var entry = in.getNextEntry
          while (entry != null && entry.getName != "metadata.json") entry = in.getNextEntry
          if (entry == null) Left("has no reachable metadata.json (torn write)")
          else Right(mapper.readTree(in.readAllBytes()).get("ssts").properties().asScala
            .map(_.getValue.asText()).toSeq)
        } finally in.close()
      } catch {
        case scala.util.control.NonFatal(e) => Left(s"is unreadable (${e.getMessage})")
      }
      refs match {
        case Right(r) => referenced ++= r
        case Left(why) if v == keep.last =>
          logWarning(s"metadata log GC: newest retained zip ${versionZip(v)} $why — " +
            "torn final commit; skipping its SST references")
        case Left(why) =>
          logWarning(s"metadata log GC: retained zip ${versionZip(v)} $why but is not " +
            "the newest — possibly a transient read failure on a restorable " +
            "checkpoint; aborting this GC pass, will retry")
          metrics.gcAborts += 1
          return
      }
    }
    old.foreach(v => fm.delete(versionZip(v)))
    fm.list(sstDir).foreach { st =>
      if (!referenced.contains(st.getPath.getName)) {
        fm.delete(st.getPath)
        metrics.sstsDeleted += 1
      }
    }
    metrics.gcRuns += 1
    metrics.versionsDeleted += old.size
    logInfo(s"metadata log GC: removed ${old.size} versions, kept ${keep.size}")
  }
}

object RocksDBMetadataLog {
  /** On-disk checkpoint-zip format version, stamped into metadata.json.
    * Checkpoints that predate the marker read as version 1 (same layout);
    * a zip claiming a higher version fails restore descriptively. */
  val CheckpointFormatVersion = 1
}
