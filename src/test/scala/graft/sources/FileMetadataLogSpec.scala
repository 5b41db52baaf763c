package graft.sources

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.scalatest.funsuite.AnyFunSuite

class FileMetadataLogSpec extends AnyFunSuite {
  private def withLog(f: (FileBackedMetadataLog, String) => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-metalog").toString
    val log = new FileBackedMetadataLog(dir, new Configuration())
    try f(log, dir) finally log.close()
  }

  private def entries(batchId: Long, paths: (String, Long)*): Array[FileEntry] =
    paths.map { case (p, ts) => FileEntry(p, ts, batchId) }.toArray

  test("add/get roundtrip and latest") {
    withLog { (log, _) =>
      assert(log.getLatestBatchId.isEmpty)
      log.add(0, entries(0, "a" -> 10L, "b" -> 20L))
      log.add(1, entries(1, "c" -> 30L))
      assert(log.getLatestBatchId.contains(1L))
      assert(log.get(0).get.map(_.path).toSeq == Seq("a", "b"))
      assert(log.get(1).get.head.timestampMs == 30L)
      assert(log.get(99).isEmpty)
    }
  }

  test("duplicate batch id rejected") {
    withLog { (log, _) =>
      log.add(0, entries(0, "a" -> 1L))
      intercept[GraftMetalogAddException](log.add(0, entries(0, "b" -> 2L)))
    }
  }

  test("range get; missing batch in range throws") {
    withLog { (log, _) =>
      log.add(0, entries(0, "a" -> 1L)); log.add(1, entries(1, "b" -> 2L))
      val r = log.get(0, 1)
      assert(r.map(_._1).toSeq == Seq(0L, 1L))
      intercept[GraftSourceException](log.get(0, 5))
    }
  }

  test("restart restores offset and file index from disk") {
    val dir = Files.createTempDirectory("graft-metalog").toString
    val log1 = new FileBackedMetadataLog(dir, new Configuration())
    log1.add(0, entries(0, "p1" -> 100L))
    log1.add(1, entries(1, "p2" -> 200L))
    log1.close()
    val log2 = new FileBackedMetadataLog(dir, new Configuration())
    assert(log2.getLatestBatchId.contains(1L))
    assert(!log2.isNewFile("p1", 0L))
    assert(log2.getFile("p2").get.batchId == 1L)
    assert(log2.get(0).get.head.path == "p1")
    log2.close()
  }

  test("isNewFile: expiry resurrection semantics (SURVEY §2.2)") {
    withLog { (log, _) =>
      log.add(0, entries(0, "old" -> 100L))
      assert(!log.isNewFile("old", 50L))  // within horizon: dedup holds
      assert(log.isNewFile("old", 150L))  // past horizon: new again
      assert(log.isNewFile("never-seen", 0L))
    }
  }

  test("purgeBefore removes only fully-expired batches, never the latest") {
    withLog { (log, dir) =>
      log.add(0, entries(0, "a" -> 10L, "b" -> 500L)) // mixed: keep
      log.add(1, entries(1, "c" -> 20L))              // all old: drop
      log.add(2, entries(2, "d" -> 900L))             // latest: keep
      val removed = log.purgeBefore(300L)
      assert(removed == 1)
      assert(log.get(1).isEmpty)
      assert(log.get(0).isDefined && log.get(2).isDefined)
      // latest is never purged even when expired
      assert(log.purgeBefore(Long.MaxValue) == 1) // removes batch 0 only
      assert(log.get(2).isDefined)
      assert(log.getLatestBatchId.contains(2L))
    }
  }
}
