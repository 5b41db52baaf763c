package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CredentialsSpec extends AnyFunSuite {

  private def env(pairs: (String, String)*): String => Option[String] = {
    val m = pairs.toMap
    k => m.get(k)
  }

  test("environment provider resolves id/secret/token and fails when unset") {
    val p = EnvironmentCredentialsProvider(env(
      "AWS_ACCESS_KEY_ID" -> "AKIA1", "AWS_SECRET_ACCESS_KEY" -> "s3cr3t",
      "AWS_SESSION_TOKEN" -> "tok"))
    assert(p.resolve() == QueueCredentials("AKIA1", "s3cr3t", Some("tok")))
    val noToken = EnvironmentCredentialsProvider(env(
      "AWS_ACCESS_KEY_ID" -> "AKIA1", "AWS_SECRET_ACCESS_KEY" -> "s3cr3t"))
    assert(noToken.resolve().sessionToken.isEmpty)
    intercept[GraftNoCredentialsException] {
      EnvironmentCredentialsProvider(env("AWS_ACCESS_KEY_ID" -> "AKIA1")).resolve()
    }
  }

  test("system-properties provider honors aws.accessKeyId/aws.secretKey and the alias") {
    val keys = Seq("aws.accessKeyId", "aws.secretKey", "aws.secretAccessKey", "aws.sessionToken")
    val saved = keys.map(k => k -> Option(System.getProperty(k))).toMap
    try {
      keys.foreach(System.clearProperty)
      intercept[GraftNoCredentialsException](SystemPropertiesCredentialsProvider().resolve())
      System.setProperty("aws.accessKeyId", "AKIA2")
      System.setProperty("aws.secretAccessKey", "viaAlias")
      assert(SystemPropertiesCredentialsProvider().resolve() ==
        QueueCredentials("AKIA2", "viaAlias", None))
      System.setProperty("aws.secretKey", "primary")
      System.setProperty("aws.sessionToken", "tk")
      assert(SystemPropertiesCredentialsProvider().resolve() ==
        QueueCredentials("AKIA2", "primary", Some("tk")))
    } finally {
      keys.foreach(System.clearProperty)
      saved.foreach { case (k, v) => v.foreach(System.setProperty(k, _)) }
    }
  }

  test("profile provider parses the shared-credentials INI, named profiles included") {
    val f = Files.createTempFile("graft-creds", ".ini")
    Files.write(f,
      """# comment
        |[default]
        |aws_access_key_id = DEFID
        |aws_secret_access_key= DEFSECRET
        |
        |; another comment
        |[profile analytics]
        |aws_access_key_id=ANAID
        |aws_secret_access_key = ANASECRET
        |aws_session_token = ANATOKEN
        |""".stripMargin.getBytes(StandardCharsets.UTF_8))
    try {
      val p = ProfileCredentialsProvider(Some(f.toString))
      assert(p.resolve() == QueueCredentials("DEFID", "DEFSECRET", None))
      val named = ProfileCredentialsProvider(Some(f.toString), Some("analytics"))
      assert(named.resolve() == QueueCredentials("ANAID", "ANASECRET", Some("ANATOKEN")))
      intercept[GraftNoCredentialsException] {
        ProfileCredentialsProvider(Some(f.toString), Some("absent")).resolve()
      }
      intercept[GraftNoCredentialsException] {
        ProfileCredentialsProvider(Some("/nonexistent/creds"), None).resolve()
      }
    } finally Files.delete(f)
  }

  test("chain takes the first successful provider and reuses it afterwards") {
    var calls = 0
    val counting = new ConnectorCredentialsProvider {
      override def resolve(): QueueCredentials = { calls += 1; QueueCredentials("W", "X") }
    }
    val chain = new CredentialsProviderChain(Seq(
      EnvironmentCredentialsProvider(env()), // always fails
      counting,
      StaticCredentialsProvider(QueueCredentials("NEVER", "REACHED"))))
    assert(chain.resolve().accessKeyId == "W")
    assert(chain.resolve().accessKeyId == "W")
    assert(calls == 2, "winner must be re-invoked directly, later providers never probed")
  }

  test("chain failure aggregates every provider's reason") {
    val chain = new CredentialsProviderChain(Seq(
      EnvironmentCredentialsProvider(env()),
      ProfileCredentialsProvider(Some("/nonexistent/creds"))))
    val e = intercept[GraftNoCredentialsException](chain.resolve())
    assert(e.getMessage.contains("EnvironmentCredentialsProvider"))
    assert(e.getMessage.contains("ProfileCredentialsProvider"))
  }

  test("retry wrapper retries transient failures then surfaces the final error") {
    var attempts = 0
    val flaky = new ConnectorCredentialsProvider {
      override def resolve(): QueueCredentials = {
        attempts += 1
        if (attempts < 3) throw new GraftNoCredentialsException("warming up")
        QueueCredentials("OK", "OK")
      }
    }
    assert(new RetryableCredentialsProvider(flaky, maxAttempts = 10, sleepMs = 1)
      .resolve().accessKeyId == "OK")
    assert(attempts == 3)

    var always = 0
    val dead = new ConnectorCredentialsProvider {
      override def resolve(): QueueCredentials = { always += 1; throw new GraftNoCredentialsException("down") }
    }
    intercept[GraftNoCredentialsException] {
      new RetryableCredentialsProvider(dead, maxAttempts = 4, sleepMs = 1).resolve()
    }
    assert(always == 5, "maxAttempts retries after the initial attempt")
  }

  test("builder shapes: static, profile, default chain; chain is serializable") {
    val fixed = ConnectorCredentialsProvider.builder
      .staticCredentials(QueueCredentials("A", "B")).build()
    assert(fixed.resolve() == QueueCredentials("A", "B"))

    val f = Files.createTempFile("graft-creds2", ".ini")
    Files.write(f, "[default]\naws_access_key_id=P\naws_secret_access_key=Q\n"
      .getBytes(StandardCharsets.UTF_8))
    try {
      val viaProfile = ConnectorCredentialsProvider.builder
        .profile(path = Some(f.toString)).build()
      assert(viaProfile.resolve() == QueueCredentials("P", "Q", None))
    } finally Files.delete(f)

    // executors receive the provider through closure serialization
    val bytes = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bytes)
    oos.writeObject(ConnectorCredentialsProvider.defaultChain())
    oos.close()
    val back = new ObjectInputStream(new ByteArrayInputStream(bytes.toByteArray))
      .readObject().asInstanceOf[ConnectorCredentialsProvider]
    assert(back.isInstanceOf[CredentialsProviderChain])
  }
}
