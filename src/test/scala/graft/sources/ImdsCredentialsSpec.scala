package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** In-process IMDSv2 stub: token PUT + role listing + role document, with
  * token enforcement — the 169.254.169.254 semantics the reference's
  * default chain ends at (ConnectorAwsCredentialsProvider.scala:35-67 via
  * the SDK), resolved hermetically.
  */
class ImdsCredentialsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val Token = "stub-imds-token"
  @volatile private var tokenRequests = 0

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val b = body.getBytes(StandardCharsets.UTF_8)
    ex.sendResponseHeaders(status, b.length.toLong)
    ex.getResponseBody.write(b)
    ex.close()
  }

  private def requireToken(ex: HttpExchange)(ok: => Unit): Unit =
    if (ex.getRequestHeaders.getFirst("X-aws-ec2-metadata-token") == Token) ok
    else respond(ex, 401, "token required")

  /** A fresh stub instance; the grace test stops its own mid-test. */
  private def newImdsStub(): HttpServer = {
    val srv = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/latest/api/token", (ex: HttpExchange) =>
      if (ex.getRequestMethod == "PUT" &&
        ex.getRequestHeaders.containsKey("X-aws-ec2-metadata-token-ttl-seconds")) {
        tokenRequests += 1
        respond(ex, 200, Token)
      } else respond(ex, 400, "PUT with TTL header required"))
    srv.createContext("/latest/meta-data/iam/security-credentials/", (ex: HttpExchange) =>
      requireToken(ex) {
        if (ex.getRequestURI.getPath.endsWith("/security-credentials/")) {
          respond(ex, 200, "graft-instance-role\n")
        } else if (ex.getRequestURI.getPath.endsWith("graft-instance-role")) {
          respond(ex, 200,
            """{"Code":"Success","Type":"AWS-HMAC","AccessKeyId":"AKIDIMDS",""" +
              """"SecretAccessKey":"imds-secret","Token":"imds-session-token",""" +
              """"Expiration":"2030-01-01T00:00:00Z"}""")
        } else respond(ex, 404, "unknown role")
      })
    srv.setExecutor(null)
    srv
  }

  private val server = newImdsStub()
  server.start()

  private def endpoint = s"http://127.0.0.1:${server.getAddress.getPort}"

  override def afterAll(): Unit = server.stop(0)

  test("IMDSv2 flow: token PUT, role discovery, credential document") {
    val p = InstanceMetadataCredentialsProvider(endpoint = Some(endpoint))
    val c = p.resolve()
    assert(c == QueueCredentials("AKIDIMDS", "imds-secret", Some("imds-session-token")))
    assert(tokenRequests >= 1)
  }

  test("endpoint override via the SDK-standard env var lookup") {
    val p = InstanceMetadataCredentialsProvider(
      lookup = k => if (k == "AWS_EC2_METADATA_SERVICE_ENDPOINT") Some(endpoint) else None)
    assert(p.resolve().accessKeyId == "AKIDIMDS")
  }

  test("AWS_EC2_METADATA_DISABLED short-circuits without a network attempt") {
    val before = tokenRequests
    val p = InstanceMetadataCredentialsProvider(
      endpoint = Some(endpoint),
      lookup = k => if (k == "AWS_EC2_METADATA_DISABLED") Some("true") else None)
    intercept[GraftNoCredentialsException](p.resolve())
    assert(tokenRequests == before)
  }

  test("unreachable endpoint fails as no-credentials, not a hang") {
    val p = InstanceMetadataCredentialsProvider(
      endpoint = Some("http://127.0.0.1:1"), timeoutMs = 500)
    intercept[GraftNoCredentialsException](p.resolve())
  }

  test("caching: repeated resolve() (one per SQS call) pays one IMDS fetch") {
    val before = tokenRequests
    val p = InstanceMetadataCredentialsProvider(endpoint = Some(endpoint))
    // SqsHttpQueue.call() resolves per request; the provider must absorb that
    val creds = (1 to 25).map(_ => p.resolve())
    assert(creds.distinct.size == 1)
    assert(tokenRequests == before + 1,
      s"expected exactly one IMDS fetch for 25 resolves, got ${tokenRequests - before}")
  }

  test("caching: re-fetches when the clock nears the role document's Expiration") {
    // stub role document expires 2030-01-01T00:00:00Z
    val expiry = java.time.Instant.parse("2030-01-01T00:00:00Z").toEpochMilli
    @volatile var now = expiry - 60 * 60 * 1000L // one hour out: cache holds
    val before = tokenRequests
    val p = InstanceMetadataCredentialsProvider(endpoint = Some(endpoint), clock = () => now)
    p.resolve(); p.resolve()
    assert(tokenRequests == before + 1)
    now = expiry - 2 * 60 * 1000L // inside the 5-minute refresh margin
    p.resolve()
    assert(tokenRequests == before + 2, "provider must refresh near expiry")
    p.resolve() // still near expiry: every call re-fetches until a fresher doc arrives
    assert(tokenRequests == before + 3)
  }

  test("stale-credential grace: failed refresh inside the margin serves cached creds until expiry") {
    val expiry = java.time.Instant.parse("2030-01-01T00:00:00Z").toEpochMilli
    @volatile var now = expiry - 60 * 60 * 1000L // one hour out
    val srv = newImdsStub(); srv.start()
    val p = InstanceMetadataCredentialsProvider(
      endpoint = Some(s"http://127.0.0.1:${srv.getAddress.getPort}"),
      timeoutMs = 500, clock = () => now)
    assert(p.resolve().accessKeyId == "AKIDIMDS") // first fetch succeeds
    srv.stop(0) // IMDS goes dark
    now = expiry - 2 * 60 * 1000L // inside the 5-min margin: refresh fails...
    assert(p.resolve().accessKeyId == "AKIDIMDS",
      "cached credentials are still valid — a failed early refresh must not surface")
    assert(p.resolve().accessKeyId == "AKIDIMDS") // keeps serving, keeps retrying
    now = expiry + 1 // past actual expiry: the grace window is over
    intercept[GraftNoCredentialsException](p.resolve())
  }

  test("chain falls through to IMDS when env/props/profile are absent") {
    val chain = new CredentialsProviderChain(Seq(
      EnvironmentCredentialsProvider(lookup = _ => None),
      ProfileCredentialsProvider(path = Some("/nonexistent/credentials")),
      InstanceMetadataCredentialsProvider(endpoint = Some(endpoint))))
    assert(chain.resolve().accessKeyId == "AKIDIMDS")
  }
}
