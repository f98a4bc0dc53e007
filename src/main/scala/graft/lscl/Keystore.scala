package graft.lscl

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}
import java.security.KeyStore
import java.util.Base64

import javax.crypto.SecretKeyFactory
import javax.crypto.spec.PBEKeySpec

/** Reader for the reference's secret-store keystore file (the `bin/logstash-
  * keystore` artifact that backs `${secret}` substitution in config and
  * settings text).
  *
  * The on-disk format is PUBLIC and simple (reference
  * `logstash-core/src/main/java/org/logstash/secret/store/backend/JavaKeyStore.java`,
  * `SecretStoreUtil.java`):
  *
  *   - the file is a standard PKCS12 keystore;
  *   - each secret is a PBE `SecretKeyEntry` whose "password" chars are the
  *     BASE64 of the UTF-8 plaintext, stored under the alias
  *     `urn:logstash:secret:v1:<key>` (keys lowercased,
  *     `SecretIdentifier.java:27-71`);
  *   - a marker entry `keystore.seed` identifies the file as a logstash
  *     keystore (`SecretStoreFactory.LOGSTASH_MARKER`);
  *   - when the user sets no explicit password (`LOGSTASH_KEYSTORE_PASS`),
  *     a random pass is generated at create time and OBFUSCATED onto the
  *     file tail: `xor_bytes ++ random_bytes ++ length_byte` where
  *     `xor_bytes[i] = pass[i] ^ random_bytes[i]` and the final byte is the
  *     obfuscated block's length (`JavaKeyStore.java:208-230`,
  *     `SecretStoreUtil.obfuscate/deObfuscate`). PKCS12 is length-prefixed
  *     DER, so the parser ignores the appended tail.
  *
  * Lookup precedence follows the reference's substitution rule: the secret
  * store wins over the process environment for the same name.
  */
object Keystore {

  private val UrnPrefix = "urn:logstash:secret:v1:"
  private val Marker = "keystore.seed"

  /** De-obfuscate the appended default-pass block: first half XOR second
    * half (reference SecretStoreUtil.deObfuscate).
    */
  private[graft] def deObfuscate(block: Array[Byte]): Array[Char] = {
    val half = block.length / 2
    val out = new Array[Char](half)
    var i = 0
    while (i < half) {
      out(i) = ((block(i) ^ block(half + i)) & 0xff).toChar
      i += 1
    }
    out
  }

  /** Obfuscate a pass the way the reference writes it (xor-half ++
    * random-half) — used by tests to produce default-pass keystores.
    */
  private[graft] def obfuscate(pass: Array[Char], random: Array[Byte]): Array[Byte] = {
    require(random.length == pass.length, "random pad must match pass length")
    val out = new Array[Byte](pass.length * 2)
    var i = 0
    while (i < pass.length) {
      out(i) = ((pass(i).toByte ^ random(i)) & 0xff).toByte
      out(pass.length + i) = random(i)
      i += 1
    }
    out
  }

  /** The keystore password: explicit when given, else the de-obfuscated
    * tail block (the default-pass convention).
    */
  private def password(bytes: Array[Byte], explicit: Option[Array[Char]]): Array[Char] =
    explicit.getOrElse {
      require(bytes.nonEmpty, "keystore file is empty")
      val size = bytes(bytes.length - 1) & 0xff
      require(size > 0 && bytes.length > size,
        "keystore has no appended default-pass block; set LOGSTASH_KEYSTORE_PASS")
      deObfuscate(java.util.Arrays.copyOfRange(bytes, bytes.length - 1 - size, bytes.length - 1))
    }

  /** Load every secret from a logstash keystore file: `key -> plaintext`.
    * The `keystore.seed` marker entry is validated (it is what makes the
    * file a LOGSTASH keystore, not a generic PKCS12) and excluded.
    */
  def load(path: Path, pass: Option[Array[Char]] = None): Map[String, String] = {
    val bytes = Files.readAllBytes(path)
    val pw = password(bytes, pass)
    val ks = KeyStore.getInstance("pkcs12")
    val in = new java.io.ByteArrayInputStream(bytes)
    try ks.load(in, pw) finally in.close()
    val protection = new KeyStore.PasswordProtection(pw)
    val factory = SecretKeyFactory.getInstance("PBE")
    val out = Map.newBuilder[String, String]
    var sawMarker = false
    val aliases = ks.aliases()
    while (aliases.hasMoreElements) {
      val alias = aliases.nextElement()
      if (alias.startsWith(UrnPrefix)) {
        val key = alias.substring(UrnPrefix.length)
        ks.getEntry(alias, protection) match {
          case e: KeyStore.SecretKeyEntry =>
            val spec = factory.getKeySpec(e.getSecretKey, classOf[PBEKeySpec])
              .asInstanceOf[PBEKeySpec]
            val plain = new String(
              Base64.getDecoder.decode(new String(spec.getPassword)),
              StandardCharsets.UTF_8)
            if (key == Marker) sawMarker = true
            else out += key -> plain
          case _ => () // not a secret entry; ignore
        }
      }
    }
    require(sawMarker,
      s"$path is a PKCS12 keystore but not a logstash keystore (no keystore.seed marker)")
    out.result()
  }

  /** The substitution environment for a config run: process/user env with
    * the keystore's secrets layered ON TOP (the reference resolves the
    * secret store before the environment for the same name). The pass comes
    * from `LOGSTASH_KEYSTORE_PASS` in `env` when present, else the
    * keystore's appended default-pass block.
    */
  def envWith(path: Path, env: Map[String, String] = sys.env): Map[String, String] =
    env ++ load(path, env.get("LOGSTASH_KEYSTORE_PASS").map(_.toCharArray))

  /** Substitution-env resolution hook applied by [[Lscl.parse]]: when
    * `LOGSTASH_KEYSTORE_PATH` names a keystore file (our analogue of the
    * reference's `path.settings/logstash.keystore` discovery — there is no
    * settings directory here), its secrets are layered over the env.
    */
  def resolve(env: Map[String, String]): Map[String, String] =
    env.get("LOGSTASH_KEYSTORE_PATH") match {
      case Some(p) => envWith(java.nio.file.Paths.get(p), env)
      case None => env
    }
}
