package graft.pgwire

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import javax.crypto.Mac
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** Authentication policy for [[PgServer]] (reference authn.clj:18-75 —
  * rule-based method selection — and Authenticator.kt). The method decides
  * which wire exchange runs after StartupMessage:
  *
  *  - [[PgAuth.Trust]]      → AuthenticationOk immediately
  *  - [[PgAuth.Cleartext]]  → AuthenticationCleartextPassword (code 3)
  *  - [[PgAuth.Md5]]        → AuthenticationMD5Password (code 5, salted)
  *  - [[PgAuth.Scram]]      → SASL SCRAM-SHA-256 (codes 10/11/12, RFC 5802)
  *
  * `passwordFor` maps a startup user to its password; `None` rejects the
  * user. Passwords are held in memory for the handshake only — a production
  * store would keep SCRAM's derived (salt, StoredKey, ServerKey) triple and
  * bcrypt hashes for cleartext, like the reference; the wire exchanges here
  * are identical either way.
  */
sealed trait PgAuth
object PgAuth {
  case object Trust extends PgAuth
  final case class Cleartext(passwordFor: String => Option[String])
      extends PgAuth
  /** Cleartext wire exchange verified by an arbitrary (user, password)
    * check — the at-rest-hash shape (reference authn.clj stores bcrypt;
    * see [[Bcrypt.verify]]): storage never holds the cleartext, the wire
    * carries it (over TLS in production), the check hashes and compares. */
  final case class Verify(check: (String, String) => Boolean) extends PgAuth
  final case class Md5(passwordFor: String => Option[String]) extends PgAuth
  final case class Scram(passwordFor: String => Option[String],
      iterations: Int = 4096) extends PgAuth

  // ---- shared crypto primitives (JDK only) --------------------------------

  def md5hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  /** Postgres MD5 auth response: "md5" + hex(md5(hex(md5(pw+user)) + salt)). */
  def md5Response(user: String, password: String, salt: Array[Byte]): String = {
    val inner = md5hex((password + user).getBytes(UTF_8))
    "md5" + md5hex(inner.getBytes(UTF_8) ++ salt)
  }

  def hmacSha256(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(msg)
  }

  def sha256(bytes: Array[Byte]): Array[Byte] =
    MessageDigest.getInstance("SHA-256").digest(bytes)

  /** RFC 5802 Hi() = PBKDF2-HMAC-SHA-256. */
  def saltedPassword(password: String, salt: Array[Byte],
      iterations: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, iterations, 256)
    javax.crypto.SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    a.zip(b).map { case (x, y) => (x ^ y).toByte }

  /** Server-side SCRAM-SHA-256 state machine (RFC 5802 §3): one instance
    * per handshake. The caller feeds the two client messages and relays the
    * two server messages; `verify` runs the constant-shape key check. */
  final class ScramServer(user: String, password: String, iterations: Int,
      rng: java.security.SecureRandom = new java.security.SecureRandom()) {
    private val b64e = java.util.Base64.getEncoder
    private def nonce(): String = {
      val b = new Array[Byte](18); rng.nextBytes(b); b64e.encodeToString(b)
    }
    private val salt = { val b = new Array[Byte](16); rng.nextBytes(b); b }
    private var clientFirstBare: String = _
    private var serverFirst: String = _
    private var fullNonce: String = _

    /** client-first-message → server-first-message. */
    def serverFirstMessage(clientFirst: String): String = {
      // gs2 header is "n,," (no channel binding) or "y,,"; bare part follows
      val bare = clientFirst.split(",", 3).drop(2).headOption
        .getOrElse(sys.error("malformed client-first-message"))
      clientFirstBare = bare
      val attrs = bare.split(",").map(_.splitAt(2)).toMap
      val cnonce = attrs.getOrElse("r=", sys.error("missing client nonce"))
      fullNonce = cnonce + nonce()
      serverFirst =
        s"r=$fullNonce,s=${b64e.encodeToString(salt)},i=$iterations"
      serverFirst
    }

    /** client-final-message → Some(server-final "v=…") if the proof checks
      * out, None on auth failure. */
    def verify(clientFinal: String): Option[String] = {
      val attrs = clientFinal.split(",").map(_.splitAt(2)).toMap
      val proofB64 = attrs.getOrElse("p=", return None)
      val theirNonce = attrs.getOrElse("r=", return None)
      if (theirNonce != fullNonce) return None
      val withoutProof =
        clientFinal.substring(0, clientFinal.lastIndexOf(",p="))
      val authMessage =
        (clientFirstBare + "," + serverFirst + "," + withoutProof)
          .getBytes(UTF_8)
      val sp = saltedPassword(password, salt, iterations)
      val clientKey = hmacSha256(sp, "Client Key".getBytes(UTF_8))
      val storedKey = sha256(clientKey)
      val clientSig = hmacSha256(storedKey, authMessage)
      val proof = java.util.Base64.getDecoder.decode(proofB64)
      if (proof.length != clientSig.length) return None
      // recovered ClientKey = proof XOR ClientSignature; auth holds iff its
      // hash equals StoredKey (the server never needs the cleartext proof)
      val recovered = xor(proof, clientSig)
      if (!MessageDigest.isEqual(sha256(recovered), storedKey)) None
      else {
        val serverKey = hmacSha256(sp, "Server Key".getBytes(UTF_8))
        val serverSig = hmacSha256(serverKey, authMessage)
        Some("v=" + b64e.encodeToString(serverSig))
      }
    }
  }
}
