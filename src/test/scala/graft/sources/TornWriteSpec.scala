package graft.sources

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Torn-write fault injection on both metadata logs (reference
  * discipline: RocksDBFileManager's atomic-rename + recover-previous-
  * version handling, RocksDBFileManager.scala:244-312,435-466).
  *
  * `createAtomic` makes a torn FINAL file unreachable on rename-atomic
  * filesystems — a mid-write kill leaves only an invisible temp file —
  * but object stores without atomic rename can tear the renamed artifact
  * itself. These specs inject exactly that: truncate a compact file /
  * checkpoint zip in place and demand restore either reconstructs the
  * pre-crash state from older intact artifacts or fails descriptively,
  * never continues from silently-partial state (which would re-admit
  * already-ingested files at the source).
  */
class TornWriteSpec extends AnyFunSuite {

  private def entries(batchId: Long, paths: (String, Long)*): Array[FileEntry] =
    paths.map { case (p, ts) => FileEntry(p, ts, batchId) }.toArray

  private def truncate(p: Path, keep: Int): Unit = {
    val bytes = Files.readAllBytes(p)
    assert(bytes.length > keep, s"fixture too small to tear: $p (${bytes.length} bytes)")
    Files.write(p, bytes.take(keep), StandardOpenOption.TRUNCATE_EXISTING)
  }

  // ------------------------------------------------ FileBackedMetadataLog

  test("file log: torn newest compact falls back to the previous compact + full tail") {
    val dir = Files.createTempDirectory("graft-torn").toString
    val log = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3)
    (0L to 4L).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    log.close() // on disk now: 2.compact (intact) + batch files 3, 4
    val logDir = Paths.get(dir, "graft-batches")

    // crash model for the torn compaction at batch 5: the batch file was
    // written (adds are file-first), the compact's rename tore, and the
    // post-compact deletes never ran — so batches 3..5 all still exist
    Files.write(logDir.resolve("5"),
      """[{"path":"f5","timestampMs":1005,"batchId":5}]""".getBytes("UTF-8"))
    Files.write(logDir.resolve("5.compact"),
      """{"version":2,"batchIds":[0,1,2,3,4,5],"entr""".getBytes("UTF-8")) // torn mid-key

    val restored = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3)
    try {
      assert(restored.getLatestBatchId.contains(5L))
      (0L to 5L).foreach(i =>
        assert(restored.get(i).exists(_.exists(_.path == s"f$i")),
          s"batch $i lost by the torn-compact fallback"))
      assert(!restored.isNewFile("f1", 0L), "file index missing pre-compact state")
      assert(!restored.isNewFile("f5", 0L), "file index missing the tail batch")
    } finally restored.close()
  }

  test("file log: all compacts torn fails descriptively, never silently partial") {
    val dir = Files.createTempDirectory("graft-torn").toString
    val log = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3)
    (0L to 3L).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    log.close() // 2.compact + batch 3; batches 0-2 live only in the compact
    truncate(Paths.get(dir, "graft-batches", "2.compact"), 20)
    val e = intercept[GraftSourceException](
      new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3))
    assert(e.getMessage.contains("no readable compact"), s"not descriptive: ${e.getMessage}")
    assert(e.getMessage.contains("2.compact"), s"must name the torn file: ${e.getMessage}")
  }

  test("file log: torn per-batch tail file fails descriptively and names the batch") {
    val dir = Files.createTempDirectory("graft-torn").toString
    val log = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 100)
    (0L to 2L).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    log.close()
    truncate(Paths.get(dir, "graft-batches", "2"), 10)
    val e = intercept[GraftSourceException](
      new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 100))
    assert(e.getMessage.contains("torn or corrupt"), s"not descriptive: ${e.getMessage}")
    assert(e.getMessage.contains("2"), s"must name the batch file: ${e.getMessage}")
  }

  test("file log: torn compact whose cleanup already ran refuses, never rebuilds stale state") {
    val dir = Files.createTempDirectory("graft-torn").toString
    val log = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3)
    (0L to 4L).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    log.close() // on disk: 2.compact (intact) + batch files 3, 4
    val logDir = Paths.get(dir, "graft-batches")

    // rot model (vs the crash model above): the compaction at batch 5
    // COMPLETED — its cleanup deleted the folded batch files but crashed
    // before removing the superseded 2.compact — and 5.compact rotted
    // later. Falling back to 2.compact + surviving tail would silently
    // regress latestBatchId to 2 and re-admit f3..f5 at the source.
    Files.write(logDir.resolve("5.compact"),
      """{"version":2,"batchIds":[0,1,2,3,4,5],"entr""".getBytes("UTF-8"))
    Files.delete(logDir.resolve("3"))
    Files.delete(logDir.resolve("4"))

    val e = intercept[GraftSourceException](
      new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3))
    assert(e.getMessage.contains("already deleted"), s"not descriptive: ${e.getMessage}")
    assert(e.getMessage.contains("5.compact"), s"must name the torn compact: ${e.getMessage}")
    assert(e.getMessage.contains("3") && e.getMessage.contains("4"),
      s"must name the missing batches: ${e.getMessage}")
  }

  test("file log: fallback audit exempts horizon-purged batches instead of refusing") {
    val dir = Files.createTempDirectory("graft-torn").toString
    val log = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 4)
    (0L to 5L).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    // on disk: 3.compact + batch files 4, 5
    // age-horizon purge removes batch 4 (all files below horizon, not the
    // latest) and records it in the _purged sidecar
    assert(log.purgeBefore(1005L) >= 1)
    log.add(6L, entries(6L, "f6" -> 1006L))
    log.close()
    val logDir = Paths.get(dir, "graft-batches")
    assert(!Files.exists(logDir.resolve("4")), "purge must have deleted batch file 4")

    // crash model: compaction at batch 7 tore mid-rename, cleanup never
    // ran — every batch it folded still exists EXCEPT purged batch 4,
    // whose absence is deliberate, not evidence that cleanup ran
    Files.write(logDir.resolve("7"),
      """[{"path":"f7","timestampMs":1007,"batchId":7}]""".getBytes("UTF-8"))
    Files.write(logDir.resolve("7.compact"),
      """{"version":2,"batchIds":[0,1,2,3,5,6,7],"entr""".getBytes("UTF-8"))

    val restored = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 4)
    try {
      assert(restored.getLatestBatchId.contains(7L),
        "purge-exempt fallback must reconstruct up to the torn compact's tail")
      Seq(5L, 6L, 7L).foreach(i =>
        assert(restored.get(i).exists(_.exists(_.path == s"f$i")), s"batch $i lost"))
      assert(restored.get(4L).isEmpty, "purged batch must stay purged after fallback")
    } finally restored.close()

    // negative control on the same layout: a batch missing WITHOUT a purge
    // record still refuses (the "cleanup already ran" rot model)
    Files.delete(logDir.resolve("5"))
    val e = intercept[GraftSourceException](
      new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 4))
    assert(e.getMessage.contains("already deleted"), s"not descriptive: ${e.getMessage}")
  }

  test("file log: a leftover createAtomic temp file is invisible to restore") {
    val dir = Files.createTempDirectory("graft-torn").toString
    val log = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3)
    (0L to 3L).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    log.close()
    // the rename-atomic crash shape: a half-written temp that never renamed
    Files.write(Paths.get(dir, "graft-batches", ".5.compact.deadbeef.tmp"),
      """{"version":2,"batchIds":[0""".getBytes("UTF-8"))
    val restored = new FileBackedMetadataLog(dir, new Configuration(), compactInterval = 3)
    try assert(restored.getLatestBatchId.contains(3L))
    finally restored.close()
  }

  // -------------------------------------------------- RocksDBMetadataLog

  test("rocksdb log: torn newest zip restores the previous retained version and keeps writing") {
    val dir = Files.createTempDirectory("graft-torn-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    (0L to 2L).foreach(i => log.add(i, entries(i, s"p$i" -> (100L + i))))
    log.close() // one checkpoint version per add: 1.zip, 2.zip, 3.zip
    truncate(Paths.get(dir, "rocksdb", "3.zip"), 8) // torn mid-write

    val restored = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    try {
      // version 3's commit never completed; version 2 is the durable state
      assert(restored.getLatestBatchId.contains(1L),
        s"expected the previous version's latest batch, got ${restored.getLatestBatchId}")
      assert(restored.get(0).exists(_.head.path == "p0"))
      assert(restored.get(1).exists(_.head.path == "p1"))
      // the replayed batch re-adds cleanly and the new commit overwrites
      // the torn zip atomically
      restored.add(2L, entries(2L, "p2" -> 102L))
      assert(restored.getLatestBatchId.contains(2L))
    } finally restored.close()

    val again = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    try assert(again.getLatestBatchId.contains(2L), "re-written version 3 must restore")
    finally again.close()
  }

  test("rocksdb log: GC right after a torn-newest fallback skips the torn zip instead of dying") {
    val dir = Files.createTempDirectory("graft-torn-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 2)
    (0L to 3L).foreach(i => log.add(i, entries(i, s"p$i" -> (100L + i))))
    log.close() // versions 1..4
    truncate(Paths.get(dir, "rocksdb", "4.zip"), 8)

    val restored = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 2)
    try {
      assert(restored.getLatestBatchId.contains(2L))
      // restore deliberately left torn 4.zip on disk; GC's retained window
      // [3.zip, 4.zip] includes it — the old behavior threw an uncaught
      // ZipException out of commit() here
      restored.commit()
      restored.add(3L, entries(3L, "p3" -> 103L)) // re-writes 4.zip atomically
      assert(restored.getLatestBatchId.contains(3L))
    } finally restored.close()

    val again = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 2)
    try {
      assert(again.getLatestBatchId.contains(3L), "re-written version 4 must restore")
      (0L to 3L).foreach(i => assert(again.get(i).exists(_.head.path == s"p$i")))
    } finally again.close()
  }

  test("rocksdb log: a torn reused SST referenced by intact zips fails descriptively naming it") {
    val dir = Files.createTempDirectory("graft-torn-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 10)
    (0L to 5L).foreach(i => log.add(i, entries(i, s"p$i" -> (100L + i))))
    log.close()
    import scala.jdk.CollectionConverters._
    val ssts = Files.list(Paths.get(dir, "rocksdb", "SSTs")).iterator().asScala.toSeq
    assert(ssts.nonEmpty, "fixture must have produced at least one SST sidecar")
    // every version that references a torn SST must be rejected by the
    // size audit; with all sidecars torn no version is restorable
    ssts.foreach(truncate(_, 4))
    val e = intercept[GraftSourceException](
      new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 10))
    assert(e.getMessage.contains("no readable checkpoint"), s"not descriptive: ${e.getMessage}")
    assert(e.getMessage.contains("SST") && e.getMessage.contains("torn"),
      s"must blame a torn SST: ${e.getMessage}")
    assert(ssts.exists(s => e.getMessage.contains(s.getFileName.toString)),
      s"must name the damaged sidecar file: ${e.getMessage}")
  }

  /** Rewrite one entry of a checkpoint zip with same-length garbage —
    * content rot, not truncation: the zip itself stays structurally valid
    * (fresh CRCs), so extraction succeeds and only RocksDB.open can
    * notice. */
  private def rotZipEntry(zipPath: Path, namePrefix: String): Unit = {
    val contents = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    val zin = new java.util.zip.ZipInputStream(Files.newInputStream(zipPath))
    try {
      var e = zin.getNextEntry
      while (e != null) { contents(e.getName) = zin.readAllBytes(); e = zin.getNextEntry }
    } finally zin.close()
    val victim = contents.keys.find(_.startsWith(namePrefix))
    assert(victim.isDefined, s"no $namePrefix* entry in $zipPath: ${contents.keys}")
    contents(victim.get) = Array.fill[Byte](contents(victim.get).length)(0x5A)
    val zout = new java.util.zip.ZipOutputStream(Files.newOutputStream(zipPath))
    try contents.foreach { case (name, bytes) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name)); zout.write(bytes); zout.closeEntry()
    } finally zout.close()
  }

  test("rocksdb log: a version that extracts cleanly but won't open falls back, not hard-fails") {
    val dir = Files.createTempDirectory("graft-torn-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    (0L to 2L).foreach(i => log.add(i, entries(i, s"p$i" -> (100L + i))))
    log.close() // versions 1..3
    // rot version 3's MANIFEST in place: same length, valid zip, garbage
    // content — the SST size audit can't see it and extraction succeeds,
    // so the failure only surfaces at RocksDB.open
    rotZipEntry(Paths.get(dir, "rocksdb", "3.zip"), "MANIFEST")

    val restored = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    try {
      // version 2 is the newest version that actually opens
      assert(restored.getLatestBatchId.contains(1L),
        s"expected fallback to version 2's state, got ${restored.getLatestBatchId}")
      assert(restored.get(0).exists(_.head.path == "p0"))
      assert(restored.get(1).exists(_.head.path == "p1"))
      restored.add(2L, entries(2L, "p2" -> 102L)) // re-writes 3.zip atomically
      assert(restored.getLatestBatchId.contains(2L))
    } finally restored.close()

    val again = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    try assert(again.getLatestBatchId.contains(2L), "re-written version 3 must restore")
    finally again.close()
  }

  test("rocksdb log: GC aborts when an OLDER retained zip is unreadable, deleting nothing") {
    val dir = Files.createTempDirectory("graft-torn-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 2)
    (0L to 3L).foreach(i => log.add(i, entries(i, s"p$i" -> (100L + i))))
    log.close() // versions 1..4, retained window [3, 4]
    // tear the OLDER retained zip: from GC's seat this is indistinguishable
    // from a transient DFS read failure on a perfectly restorable version —
    // deleting the SSTs it references would be silent data loss
    truncate(Paths.get(dir, "rocksdb", "3.zip"), 8)

    import scala.jdk.CollectionConverters._
    def ls(p: Path): Set[String] =
      Files.list(p).iterator().asScala.map(_.getFileName.toString).toSet
    val zipsBefore = ls(Paths.get(dir, "rocksdb"))
    val sstsBefore = ls(Paths.get(dir, "rocksdb", "SSTs"))
    assert(sstsBefore.nonEmpty, "fixture must have produced SST sidecars")

    val restored = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 2)
    try {
      assert(restored.getLatestBatchId.contains(3L)) // newest zip is intact
      restored.commit() // the GC pass: must abort, not guess
      assert(ls(Paths.get(dir, "rocksdb")) == zipsBefore,
        "aborted GC must delete no version zips")
      assert(ls(Paths.get(dir, "rocksdb", "SSTs")) == sstsBefore,
        "aborted GC must delete no SSTs")
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(restored.metricsJson)
      assert(m.get("gcAborts").asLong() == 1, s"abort not counted: ${restored.metricsJson}")
      assert(m.get("sstsDeleted").asLong() == 0 && m.get("versionsDeleted").asLong() == 0)
      restored.add(4L, entries(4L, "p4" -> 104L)) // and the log keeps writing
      assert(restored.getLatestBatchId.contains(4L))
    } finally restored.close()
  }

  test("rocksdb log: every zip torn fails descriptively with the version list") {
    val dir = Files.createTempDirectory("graft-torn-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5)
    (0L to 1L).foreach(i => log.add(i, entries(i, s"p$i" -> (100L + i))))
    log.close()
    import scala.jdk.CollectionConverters._
    Files.list(Paths.get(dir, "rocksdb")).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".zip"))
      .foreach(z => truncate(z, 8))
    val e = intercept[GraftSourceException](
      new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 5))
    assert(e.getMessage.contains("no readable checkpoint"), s"not descriptive: ${e.getMessage}")
  }
}
