package graft.sources

import java.util.concurrent.atomic.LongAdder

import scala.concurrent.Future

/** Counter set mirroring the reference's 14 queue-client metrics
  * (AsyncClientMetrics.scala:22-38, AsyncSqsClientMetricsImpl.scala:25-76). */
final class QueueClientMetrics {
  val receiveMessageCounter = new LongAdder
  val receiveMessageFailedCounter = new LongAdder
  val parseMessageCounter = new LongAdder
  val parseMessageFailedCounter = new LongAdder
  val discardedMessageCounter = new LongAdder
  val consumeMessageCounter = new LongAdder
  val consumeMessageFailedCounter = new LongAdder
  val deleteMessageCounter = new LongAdder
  val deleteMessageFailedCounter = new LongAdder
  val setVisibilityCounter = new LongAdder
  val setVisibilityFailedCounter = new LongAdder
  val fetchThreadCounter = new LongAdder
  val fetchThreadFailedCounter = new LongAdder
  val fetchThreadUncaughtExceptionCounter = new LongAdder

  def json: String = {
    val fields = Seq(
      "receiveMessage" -> receiveMessageCounter, "receiveMessageFailed" -> receiveMessageFailedCounter,
      "parseMessage" -> parseMessageCounter, "parseMessageFailed" -> parseMessageFailedCounter,
      "discardedMessage" -> discardedMessageCounter,
      "consumeMessage" -> consumeMessageCounter, "consumeMessageFailed" -> consumeMessageFailedCounter,
      "deleteMessage" -> deleteMessageCounter, "deleteMessageFailed" -> deleteMessageFailedCounter,
      "setVisibility" -> setVisibilityCounter, "setVisibilityFailed" -> setVisibilityFailedCounter,
      "fetchThread" -> fetchThreadCounter, "fetchThreadFailed" -> fetchThreadFailedCounter,
      "fetchThreadUncaughtException" -> fetchThreadUncaughtExceptionCounter)
    fields.map { case (k, v) => s""""$k":${v.sum()}""" }.mkString("{", ",", "}")
  }
}

/** Pluggable async queue-ingest seam (reference: AsyncQueueClient.scala:26-52).
  *
  * Implementations: [[InMemoryQueueClient]] (hermetic tests / local e2e);
  * an SQS implementation would bind the same surface to the AWS SDK v2
  * async client — deliberately kept out of this build (zero-egress, no
  * SDK on the classpath), which is exactly why the seam exists.
  */
trait AsyncQueueClient extends AutoCloseable {
  /** Kick one fetch round-trip; the returned future completes when the
    * round finishes (caller may stop waiting early and let it continue). */
  def asyncFetch(waitTimeoutSeconds: Long): Future[Seq[ConsumeResult]]

  /** Number of fetch rounds in a row that ended in a receive failure; any
    * round that talks to the queue successfully resets it. The source
    * compares this against its error budget to fail the query loudly
    * instead of letting a dead queue look like an idle (or, during an
    * AvailableNow drain, a fully-drained) one. */
  def consecutiveReceiveFailures: Int

  def deleteMessage(messageId: String): Unit
  def deleteMessageBatch(messageIds: Seq[String]): Unit
  def setMessageVisibility(messageId: String, timeoutSeconds: Int): Unit
  /** Ack a committed batch: delete all its messages (chunked). */
  def handleProcessedMessageBatch(messageIds: Seq[String]): Unit
  def metrics: QueueClientMetrics
}
