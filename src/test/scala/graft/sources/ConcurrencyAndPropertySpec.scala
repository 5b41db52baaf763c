package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency semantics of the cache CAS (the race the validate->insert
  * path depends on) and generator-driven coverage of the option parser
  * (going a step past the reference's example-based suites, SURVEY §5).
  * Uses raw ScalaCheck Gens with a fixed seed (the scalatest bridge
  * artifact is not in the offline cache). */
class ConcurrencyAndPropertySpec extends AnyFunSuite {

  /** Deterministic sampling: 200 values from a seeded generator. */
  private def samples[A](gen: Gen[A], n: Int = 200): Seq[A] =
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => gen.pureApply(Gen.Parameters.default, s))
      .take(n).toSeq

  test("addIfAbsent: exactly one winner per key under 16-thread contention") {
    val cache = new FileCache(Long.MaxValue / 2)
    val pool = Executors.newFixedThreadPool(16)
    val wins = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val done = new CountDownLatch(16 * 50)
    (0 until 16).foreach { t =>
      pool.submit(new Runnable {
        override def run(): Unit = {
          start.await()
          (0 until 50).foreach { k =>
            if (cache.addIfAbsent(s"file-$k", QueueMessageDesc(k.toLong, isProcessed = false, s"m$t")))
              wins.incrementAndGet()
            done.countDown()
          }
        }
      })
    }
    start.countDown()
    assert(done.await(30, TimeUnit.SECONDS))
    pool.shutdown()
    assert(wins.get() == 50) // one winner per distinct key
    assert(cache.size == 50)
  }

  test("generated: durationMs parses every unit consistently") {
    val units = Seq(("ms", 1L), ("s", 1000L), ("m", 60000L), ("h", 3600000L), ("d", 86400000L))
    for {
      n <- samples(Gen.choose(0L, 10000L), 50)
      (suffix, factor) <- units
    } assert(ConnectorOptions.durationMs(s"$n$suffix") == n * factor)
  }

  test("generated: maxFilesPerTrigger - positive kept, non-positive/garbage unlimited") {
    val base = Map("fileFormat" -> "csv", "queueName" -> "q")
    samples(Gen.choose(-1000, 1000)).foreach { n =>
      val got = ConnectorOptions(base + ("maxFilesPerTrigger" -> n.toString)).maxFilesPerTrigger
      if (n > 0) assert(got.contains(n)) else assert(got.isEmpty)
    }
    samples(Gen.alphaStr, 50).filter(_.toIntOption.isEmpty).foreach { s =>
      assert(ConnectorOptions(base + ("maxFilesPerTrigger" -> s)).maxFilesPerTrigger.isEmpty)
    }
  }

  test("generated: unknown options always pass through to the file format") {
    val base = Map("fileFormat" -> "csv", "queueName" -> "q")
    val known = Set("fileformat", "queuename", "queueurl", "maxfilespertrigger",
      "maxfileage", "pathglobfilter", "partitioncolumns", "basepath",
      "queuefetchwaittimeoutseconds", "reprocessstartbatchid",
      "reprocessendbatchid", "reprocessdryrun", "sortbatchbytimestamp", "metadatalog")
    val kv = for {
      k <- Gen.identifier.suchThat(_.nonEmpty)
      v <- Gen.alphaNumStr
    } yield (k, v)
    samples(kv, 100)
      .filter { case (k, _) =>
        val lk = k.toLowerCase
        !known.contains(lk) && !lk.startsWith("queue.")
      }
      .foreach { case (k, v) =>
        val o = ConnectorOptions(base + (k -> v))
        assert(o.formatOptions.get(k.toLowerCase).contains(v))
      }
  }
}
