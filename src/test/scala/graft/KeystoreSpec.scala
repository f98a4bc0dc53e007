package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.security.KeyStore
import java.util.Base64

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

import graft.lscl.{Keystore, LsclRun}

/** The secret store: reading the reference's REAL fixture keystore, running
  * the reference secret_store fixture config VERBATIM, and the default-pass
  * (appended obfuscated block) round trip.
  */
class KeystoreSpec extends SparkSpec {


  private val fixtureKeystore =
    Paths.get("/root/reference/qa/integration/logstash.keystore")
  // the fixture's password, documented in the reference spec
  // (qa/integration/specs/secret_store_spec.rb:24-31)
  private val fixturePass = "keystore_pa9454w3rd"

  test("reads the reference fixture keystore (explicit pass)") {
    assume(Files.exists(fixtureKeystore))
    val secrets = Keystore.load(fixtureKeystore, Some(fixturePass.toCharArray))
    assert(secrets == Map(
      "input.count" -> "10",
      "output.path" -> "mypath",
      "pipeline.id" -> "mypipeline",
      "tag1" -> "mytag1",
      "tag2" -> "mytag2",
      "tag3" -> "mytag3"), secrets.toString)
  }

  test("wrong pass and non-logstash PKCS12 fail loudly") {
    assume(Files.exists(fixtureKeystore))
    intercept[Exception] {
      Keystore.load(fixtureKeystore, Some("nope".toCharArray))
    }
    // a plain PKCS12 with no keystore.seed marker is rejected
    val tmp = Files.createTempFile("graft_plainp12", ".p12")
    val ks = KeyStore.getInstance("pkcs12")
    ks.load(null, "pw".toCharArray)
    val os = Files.newOutputStream(tmp)
    try ks.store(os, "pw".toCharArray) finally os.close()
    val e = intercept[IllegalArgumentException] {
      Keystore.load(tmp, Some("pw".toCharArray))
    }
    assert(e.getMessage.contains("keystore.seed"))
  }

  // qa/integration/fixtures/secret_store_spec.yml, VERBATIM (the keystore
  // itself is qa/integration/logstash.keystore — the spec copies ../../): every `${...}`
  // except TEST_ENV_PATH resolves from the keystore
  private val fixtureConfig = """input {
    generator {
      count => "${input.count}"
    }
  }
  filter {
    mutate {
      add_tag => [ "${tag1}", "${tag2}.${tag3}" ]
    }
  }
  output {
    file {
      path => "${TEST_ENV_PATH}/${output.path}/logstash_secretstore_test.output"
      flush_interval => 0
      codec => line { format => "%{message} %{tags}" }
    }
  }"""

  test("secret_store fixture config runs VERBATIM against the real keystore") {
    assume(Files.exists(fixtureKeystore))
    val tmp = Files.createTempDirectory("graft_secretstore")
    val env = Map(
      "TEST_ENV_PATH" -> tmp.toString,
      "LOGSTASH_KEYSTORE_PASS" -> fixturePass,
      "LOGSTASH_KEYSTORE_PATH" -> fixtureKeystore.toString)
    val res = LsclRun.runConfig(spark, fixtureConfig, s"$tmp/out", env)
    assert(res.counts("_total") == 10L)
    val lines = spark.read.text(res.sinkPaths.values.head)
      .collect().map(_.getString(0)).toSeq
    // secret_store_spec.rb:66 — ("Hello world! mytag1,mytag2.mytag3" * 10)
    assert(lines.size == 10 &&
      lines.forall(_ == "Hello world! mytag1,mytag2.mytag3"),
      lines.take(3).mkString("|"))
  }

  test("default-pass keystore (appended obfuscated block) reads back") {
    // create a logstash-shaped keystore the way the reference does with no
    // explicit pass: PKCS12 + PBE entries + obfuscated pass appended + a
    // final length byte (JavaKeyStore.java:208-230 read path)
    val pass = Base64.getEncoder.encodeToString(
      Array.tabulate[Byte](32)(i => (i * 7 + 3).toByte)).toCharArray
    val ks = KeyStore.getInstance("pkcs12")
    ks.load(null, pass)
    val factory = SecretKeyFactory.getInstance("PBE")
    val protection = new KeyStore.PasswordProtection(pass)
    def put(key: String, value: String): Unit = {
      val b64 = Base64.getEncoder.encodeToString(value.getBytes(StandardCharsets.UTF_8))
      val sk = factory.generateSecret(new PBEKeySpec(b64.toCharArray))
      ks.setEntry(s"urn:logstash:secret:v1:$key", new KeyStore.SecretKeyEntry(sk), protection)
    }
    put("keystore.seed", "marker")
    put("api.key", "s3cr3t value")
    val tmp = Files.createTempFile("graft_defpass", ".keystore")
    val os = Files.newOutputStream(tmp)
    try ks.store(os, pass) finally os.close()
    // append: obfuscated pass block + 1-byte length
    val pad = Array.tabulate[Byte](pass.length)(i => (i * 31 + 11).toByte)
    val obf = Keystore.obfuscate(pass, pad)
    Files.write(tmp, obf :+ obf.length.toByte,
      java.nio.file.StandardOpenOption.APPEND)
    val secrets = Keystore.load(tmp, None)
    assert(secrets == Map("api.key" -> "s3cr3t value"), secrets.toString)
  }
}
