package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

/** Same contract battery as FileMetadataLogSpec, against the RocksDB
  * backend, plus version GC and crash-recovery-from-checkpoint behavior
  * (reference: RocksDBS3SourceLogSuite scenarios). */
class RocksDBMetadataLogSpec extends AnyFunSuite {

  private def withLog(dir: String = Files.createTempDirectory("graft-rdb").toString)(
      f: (RocksDBMetadataLog, String) => Unit): Unit = {
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 3)
    try f(log, dir) finally log.close()
  }

  private def entries(batchId: Long, paths: (String, Long)*): Array[FileEntry] =
    paths.map { case (p, ts) => FileEntry(p, ts, batchId) }.toArray

  test("add/get roundtrip, latest, duplicate rejection") {
    withLog() { (log, _) =>
      assert(log.getLatestBatchId.isEmpty)
      log.add(0, entries(0, "a" -> 10L, "b" -> 20L))
      log.add(1, entries(1, "c" -> 30L))
      assert(log.getLatestBatchId.contains(1L))
      assert(log.get(0).get.map(_.path).toSeq == Seq("a", "b"))
      assert(log.get(99).isEmpty)
      intercept[GraftMetalogAddException](log.add(1, entries(1, "x" -> 1L)))
      assert(log.get(0, 1).map(_._1).toSeq == Seq(0L, 1L))
      intercept[GraftSourceException](log.get(0, 5))
    }
  }

  test("file index: getFile / isNewFile with expiry resurrection") {
    withLog() { (log, _) =>
      log.add(0, entries(0, "p" -> 100L))
      assert(log.getFile("p").contains(FileEntry("p", 100L, 0L)))
      assert(!log.isNewFile("p", 50L))
      assert(log.isNewFile("p", 150L)) // past horizon: vouching expires
      assert(log.isNewFile("unseen", 0L))
    }
  }

  test("recovery: a new instance on the same checkpoint path restores state") {
    val dir = Files.createTempDirectory("graft-rdb").toString
    val log1 = new RocksDBMetadataLog(dir, new Configuration())
    log1.add(0, entries(0, "p1" -> 100L))
    log1.add(1, entries(1, "p2" -> 200L))
    log1.close()

    val log2 = new RocksDBMetadataLog(dir, new Configuration())
    try {
      assert(log2.getLatestBatchId.contains(1L))
      assert(log2.get(0).get.head.path == "p1")
      assert(log2.getFile("p2").get.batchId == 1L)
      assert(!log2.isNewFile("p1", 0L))
      // and it can keep writing
      log2.add(2, entries(2, "p3" -> 300L))
      assert(log2.getLatestBatchId.contains(2L))
    } finally log2.close()
  }

  /** Rewrite the newest checkpoint zip's metadata.json in place. */
  private def editLatestZipMeta(dir: String)(
      edit: com.fasterxml.jackson.databind.node.ObjectNode => Unit): Unit = {
    import scala.jdk.CollectionConverters._
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = java.nio.file.Paths.get(dir, "rocksdb")
    val latest = java.nio.file.Files.list(root).iterator().asScala
      .filter(_.getFileName.toString.matches("""\d+\.zip"""))
      .maxBy(_.getFileName.toString.stripSuffix(".zip").toLong)
    val contents = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    val zin = new java.util.zip.ZipInputStream(java.nio.file.Files.newInputStream(latest))
    try {
      var e = zin.getNextEntry
      while (e != null) { contents(e.getName) = zin.readAllBytes(); e = zin.getNextEntry }
    } finally zin.close()
    val meta = mapper.readTree(contents("metadata.json"))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    edit(meta)
    contents("metadata.json") = mapper.writeValueAsBytes(meta)
    val zout = new java.util.zip.ZipOutputStream(java.nio.file.Files.newOutputStream(latest))
    try contents.foreach { case (name, bytes) =>
      zout.putNextEntry(new java.util.zip.ZipEntry(name)); zout.write(bytes); zout.closeEntry()
    } finally zout.close()
  }

  test("restore accepts a pre-marker checkpoint (no formatVersion field)") {
    val dir = Files.createTempDirectory("graft-rdb").toString
    val log1 = new RocksDBMetadataLog(dir, new Configuration())
    log1.add(0, entries(0, "legacy" -> 100L))
    log1.close()
    // strip the marker: the zip now looks like a pre-round-6 checkpoint
    editLatestZipMeta(dir)(_.remove("formatVersion"))
    val log2 = new RocksDBMetadataLog(dir, new Configuration())
    try {
      assert(log2.getLatestBatchId.contains(0L))
      assert(log2.get(0).get.head.path == "legacy")
    } finally log2.close()
  }

  test("restore fails descriptively on a future checkpoint format version") {
    val dir = Files.createTempDirectory("graft-rdb").toString
    val log1 = new RocksDBMetadataLog(dir, new Configuration())
    log1.add(0, entries(0, "p" -> 100L))
    log1.close()
    editLatestZipMeta(dir)(_.put("formatVersion", 99))
    val e = intercept[GraftSourceException](new RocksDBMetadataLog(dir, new Configuration()))
    assert(e.getMessage.contains("format version 99"), s"unexpected: ${e.getMessage}")
  }

  test("purgeBefore removes fully-expired batches, never the latest") {
    withLog() { (log, _) =>
      log.add(0, entries(0, "a" -> 10L, "b" -> 500L))
      log.add(1, entries(1, "c" -> 20L))
      log.add(2, entries(2, "d" -> 900L))
      assert(log.purgeBefore(300L) == 1)
      assert(log.get(1).isEmpty && log.get(0).isDefined && log.get(2).isDefined)
      assert(log.purgeBefore(Long.MaxValue) == 1) // batch 0 only; latest kept
      assert(log.get(2).isDefined)
    }
  }

  test("version GC keeps the retention window and recovery still works") {
    val dir = Files.createTempDirectory("graft-rdb").toString
    val log = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 3)
    (0 until 8).foreach(i => log.add(i, entries(i, s"f$i" -> (1000L + i))))
    log.commit() // triggers deleteOldVersions
    log.close()
    val log2 = new RocksDBMetadataLog(dir, new Configuration(), minVersionsToRetain = 3)
    try {
      assert(log2.getLatestBatchId.contains(7L))
      (0 until 8).foreach(i => assert(log2.get(i).get.head.path == s"f$i"))
    } finally log2.close()
  }

  test("metrics: adds/checkpoints counted, SST bytes split into uploaded vs reused") {
    withLog() { (log, _) =>
      (0 until 6).foreach(i => log.add(i, entries(i, s"m$i" -> (100L + i))))
      val m = new com.fasterxml.jackson.databind.ObjectMapper().readTree(log.metricsJson)
      assert(m.get("adds").asLong() == 6)
      assert(m.get("checkpoints").asLong() == 6)
      assert(m.get("lastAddLatencyMs").asLong() >= 0)
      assert(m.get("addLatencyTotalMs").asLong() >= m.get("lastAddLatencyMs").asLong())
      assert(m.get("zipBytesWritten").asLong() > 0, "mutable files must ship every checkpoint")
      // incremental sync: once an SST exists it is reused, not re-uploaded —
      // across 6 checkpoints at least one flushed SST must have been reused
      assert(m.get("sstFilesUploaded").asLong() >= 1)
      assert(m.get("sstFilesReused").asLong() >= 1,
        s"no SST reuse observed: ${log.metricsJson}")
      assert(m.get("sstBytesUploaded").asLong() > 0 && m.get("sstBytesReused").asLong() > 0)
    }
  }

  test("e2e: streaming source runs with metadataLog=rocksdb and survives restart") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val qn = s"rdb-${System.nanoTime()}"
      val queue = InMemoryQueueRegistry.queue(qn)
      val dir = Files.createTempDirectory("rdb-e2e")
      val out = Files.createTempDirectory("rdb-out").toString
      val ckpt = Files.createTempDirectory("rdb-ckpt").toString
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.IntegerType)))
      def put(name: String, id: Int): String = {
        val f = dir.resolve(name)
        Files.write(f, s"""{"id":$id}""".getBytes)
        "file:" + f
      }
      def runOnce(): Unit = {
        val q = spark.readStream.format("graft-files").schema(schema)
          .option("fileFormat", "json").option("queueName", qn)
          .option("metadataLog", "rocksdb")
          .option("queueFetchWaitTimeoutSeconds", "5")
          .load().writeStream.format("parquet")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      val p1 = put("a.json", 1)
      queue.send(s"""{"path":"$p1","timestampMs":1}""")
      runOnce()
      assert(spark.read.parquet(out).count() == 1)
      queue.send(s"""{"path":"$p1","timestampMs":1}""") // dup across restart
      queue.send(s"""{"path":"${put("b.json", 2)}","timestampMs":2}""")
      runOnce()
      assert(spark.read.parquet(out).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    } finally spark.stop()
  }
}
