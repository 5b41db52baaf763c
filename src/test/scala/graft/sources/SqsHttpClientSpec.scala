package graft.sources

import java.util.concurrent.TimeUnit

import scala.concurrent.Await
import scala.concurrent.duration.Duration

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The [[InMemoryQueueSpec]] semantics matrix re-run against the SDK-free
  * SQS wire binding: [[QueueFetchClient]] over [[SqsHttpQueue]] talking the
  * AWS Query protocol + SigV4 to an in-process [[SqsStubServer]] that
  * verifies every signature independently. Zero egress, full protocol
  * coverage (reference semantics: AsyncSqsClientImpl.scala:169-319).
  */
class SqsHttpClientSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Akid = "AKIDGRAFTTEST"
  private val Secret = "graft-test-secret-key"
  private val creds = QueueCredentials(Akid, Secret)
  private val stub = new SqsStubServer(Map(Akid -> Secret))

  override def afterAll(): Unit = stub.stop()

  private def rawQueue(
      c: QueueCredentials = creds,
      longPoll: Int = 0): SqsHttpQueue =
    new SqsHttpQueue(stub.queueUrl, "us-east-1", StaticCredentialsProvider(c),
      longPollWaitSeconds = longPoll)

  private def client(
      consumer: FileMetadata => Unit,
      maxFiles: Option[Int] = None,
      keepOnError: Boolean = false): QueueFetchClient =
    new QueueFetchClient(rawQueue(), "sqs-stub", consumer, maxFiles,
      visibilityTimeoutSeconds = 60, maxConcurrency = 4,
      keepMessageOnConsumerError = keepOnError)

  private def fetch(c: QueueFetchClient): Seq[ConsumeResult] =
    Await.result(c.asyncFetch(10), Duration(30, TimeUnit.SECONDS))

  test("wire roundtrip: receive hides, visibility re-arms, delete removes") {
    stub.queue.clear()
    val id = stub.queue.send("""{"path":"p1","timestampMs":1}""")
    val q = rawQueue()
    val first = q.receive(10, visibilityTimeoutSeconds = 60)
    assert(first.map(_.messageId) == Seq(id), "receipt handle threads through the XML")
    assert(first.head.body == """{"path":"p1","timestampMs":1}""")
    assert(q.receive(10, 60).isEmpty) // in flight: invisible
    assert(q.changeVisibility(id, 0))
    assert(q.receive(10, 60).size == 1) // re-armed: redelivered
    assert(q.delete(id))
    assert(!q.delete(id)) // ReceiptHandleIsInvalid -> entry-level false
    // expired handle on this action is InvalidParameterValue with a
    // ReceiptHandle-naming Message -> still entry-level false
    assert(!q.changeVisibility(id, 0))
    assert(stub.rejectedSignatures == 0)
    q.close()
  }

  test("call-level InvalidParameterValue (VisibilityTimeout > 43200) throws, not false") {
    stub.queue.clear()
    val id = stub.queue.send("""{"path":"loud","timestampMs":1}""")
    val q = rawQueue()
    assert(q.receive(10, 60).map(_.messageId) == Seq(id))
    val e = intercept[GraftSourceException](q.changeVisibility(id, 43201))
    assert(e.getMessage.contains("InvalidParameterValue"),
      s"misconfiguration must surface the service error code: ${e.getMessage}")
    // the same handle is still valid: the failure was the call, not the entry
    assert(q.changeVisibility(id, 0))
    q.close()
  }

  test("XML escaping: bodies with special characters survive the wire") {
    stub.queue.clear()
    val tricky = """{"path":"a&b<c>.json","timestampMs":1,"note":"\"quoted\""}"""
    stub.queue.send(tricky)
    val q = rawQueue()
    assert(q.receive(10, 60).head.body == tricky)
    stub.queue.clear()
    q.close()
  }

  test("client fetch loop over the wire: consumes all, drops garbage, counts metrics") {
    stub.queue.clear()
    (1 to 25).foreach(i => stub.queue.send(s"""{"path":"f$i","timestampMs":$i}"""))
    stub.queue.send("garbage")
    var seen = List.empty[String]
    val c = client(m => seen.synchronized { seen = m.filePath :: seen })
    val res = fetch(c)
    assert(seen.size == 25)
    assert(c.metrics.receiveMessageCounter.sum() == 26)
    assert(c.metrics.parseMessageCounter.sum() == 25)
    assert(c.metrics.parseMessageFailedCounter.sum() == 1)
    assert(res.count(_ == ConsumeResult.Ok) == 25)
    assert(res.count(_ == ConsumeResult.ParseNone) == 1)
    assert(res.last == ConsumeResult.ReceiveEmpty)
    assert(stub.queue.approximateSize == 25, "consumed-ok messages await the commit-time ack")
    c.close()
  }

  test("fetch stops at maxFilesPerFetch budget") {
    stub.queue.clear()
    (1 to 30).foreach(i => stub.queue.send(s"""{"path":"g$i","timestampMs":$i}"""))
    var n = 0
    val c = client(_ => n.synchronized { n += 1 }, maxFiles = Some(12))
    fetch(c)
    assert(n == 12)
    stub.queue.clear()
    c.close()
  }

  test("consumer exception: deleted over the wire unless keepMessageOnConsumerError") {
    stub.queue.clear()
    stub.queue.send("""{"path":"bad","timestampMs":1}""")
    val c = client(_ => throw new RuntimeException("boom"))
    val res = fetch(c)
    assert(res.contains(ConsumeResult.ConsumerException))
    assert(stub.queue.approximateSize == 0) // DeleteMessage reached the stub
    c.close()

    stub.queue.send("""{"path":"bad2","timestampMs":1}""")
    val keeper = client(_ => throw new RuntimeException("boom"), keepOnError = true)
    fetch(keeper)
    assert(stub.queue.approximateSize == 1)
    stub.queue.clear()
    keeper.close()
  }

  test("batch delete: chunked to 10, partial entry failure, call failure falls back") {
    stub.queue.clear()
    val ids = (1 to 25).map(i => stub.queue.send(s"""{"path":"d$i","timestampMs":$i}"""))
    val c = client(_ => ())
    // one unknown receipt in the middle: a failed ENTRY, not a failed call
    c.deleteMessageBatch(ids.take(10) :+ "no-such-receipt")
    assert(c.metrics.deleteMessageCounter.sum() == 10)
    assert(c.metrics.deleteMessageFailedCounter.sum() == 1)
    assert(stub.queue.approximateSize == 15)
    // batch endpoint down (500 on the wire): per-message fallback clears it
    stub.queue.failBatchDeletes = true
    c.deleteMessageBatch(ids.drop(10))
    stub.queue.failBatchDeletes = false
    assert(stub.queue.approximateSize == 0)
    assert(c.metrics.deleteMessageCounter.sum() == 25)
    c.close()
  }

  test("service-side receive failures build a streak; a working round resets it") {
    stub.queue.clear()
    stub.queue.send("""{"path":"later","timestampMs":1}""")
    var consumed = 0
    val c = client(_ => consumed.synchronized { consumed += 1 })
    stub.queue.failReceives = true
    (1 to 3).foreach { i =>
      val res = fetch(c)
      assert(res == Seq(ConsumeResult.ReceiveException))
      assert(c.consecutiveReceiveFailures == i)
    }
    stub.queue.failReceives = false
    val ok = fetch(c)
    assert(ok.contains(ConsumeResult.Ok) && consumed == 1)
    assert(c.consecutiveReceiveFailures == 0)
    stub.queue.clear()
    c.close()
  }

  test("long-poll wait is forwarded on the wire") {
    stub.queue.clear()
    val q = rawQueue(longPoll = 7)
    q.receive(10, 60)
    assert(stub.lastWaitTimeSeconds.contains(7))
    q.close()
  }

  test("session-token credentials sign x-amz-security-token into the request") {
    stub.queue.clear()
    stub.queue.send("""{"path":"tok","timestampMs":1}""")
    val q = rawQueue(c = QueueCredentials(Akid, Secret, Some("session-token-value")))
    assert(q.receive(10, 60).size == 1)
    assert(stub.rejectedSignatures == 0)
    stub.queue.clear()
    q.close()
  }

  test("a wrong secret is rejected by independent signature verification") {
    stub.queue.clear()
    val before = stub.rejectedSignatures
    val q = rawQueue(c = QueueCredentials(Akid, "wrong-secret"))
    val e = intercept[GraftSourceException](q.receive(10, 60))
    assert(e.getMessage.contains("403"))
    assert(stub.rejectedSignatures == before + 1)
    // streak surfaces through the fetch client exactly like an outage
    val c = new QueueFetchClient(rawQueue(c = QueueCredentials(Akid, "wrong-secret")),
      "sqs-bad-creds", _ => (), None, 60, 2, keepMessageOnConsumerError = false)
    assert(fetch(c) == Seq(ConsumeResult.ReceiveException))
    assert(c.consecutiveReceiveFailures == 1)
    c.close()
    q.close()
  }

  test("unknown access key is rejected") {
    val q = new SqsHttpQueue(stub.queueUrl, "us-east-1",
      StaticCredentialsProvider(QueueCredentials("AKIDUNKNOWN", Secret)),
      longPollWaitSeconds = 0)
    intercept[GraftSourceException](q.receive(10, 60))
    q.close()
  }
}
