package graft.auth

import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** Minimal HS256 JWT issue/verify — the reference's auth layer
  * (/root/reference/app.py:284-299 login; helper/jwt_request.py:13-69
  * verification gate). App-layer rather than engine-layer, but part of the
  * capability contract: every data operation is bound to the verified
  * `email` identity, which becomes the engine's mandatory `user` column
  * (SURVEY.md §2.1 A1/A2 → X5 tenancy filter).
  *
  * Pure JVM (javax.crypto HMAC-SHA256 + base64url), no external deps.
  * Claims: `email`, `exp` (epoch seconds; reference TTL is 1 hour).
  */
object Jwt {

  val DefaultTtlSeconds: Long = 3600 // app.py:294 — timedelta(hours=1)

  sealed trait AuthError { def message: String }
  case object Missing extends AuthError { val message = "Token is missing" }
  case object Expired extends AuthError { val message = "Token has expired" }
  case object Invalid extends AuthError { val message = "Invalid token" }

  private val b64e = Base64.getUrlEncoder.withoutPadding()
  private val b64d = Base64.getUrlDecoder

  private def hmac(secret: String, data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(secret.getBytes(StandardCharsets.UTF_8), "HmacSHA256"))
    mac.doFinal(data.getBytes(StandardCharsets.US_ASCII))
  }

  private def enc(s: String): String = b64e.encodeToString(s.getBytes(StandardCharsets.UTF_8))

  /** Issue a token for `email` valid until `nowSeconds + ttl`. */
  def issue(email: String, secret: String, nowSeconds: Long,
      ttlSeconds: Long = DefaultTtlSeconds): String = {
    val header = enc("""{"alg":"HS256","typ":"JWT"}""")
    // deterministic, minimal claim set (email, exp) — jwt_request.py reads
    // payload["email"]; expiry is standard `exp`
    val payload = enc(s"""{"email":"${email.replace("\"", "")}","exp":${nowSeconds + ttlSeconds}}""")
    val signature = b64e.encodeToString(hmac(secret, s"$header.$payload"))
    s"$header.$payload.$signature"
  }

  /** Verify `Authorization: Bearer <token>`-style input; returns the bound
    * email. Mirrors the reference's error surface: missing / expired /
    * invalid (jwt_request.py:36-66). */
  def verify(token: String, secret: String, nowSeconds: Long): Either[AuthError, String] = {
    if (token == null || token.isEmpty) return Left(Missing)
    val raw = if (token.startsWith("Bearer ")) token.drop(7) else token
    raw.split('.') match {
      case Array(h, p, s) =>
        val expected = b64e.encodeToString(hmac(secret, s"$h.$p"))
        if (!constantTimeEq(expected, s)) Left(Invalid)
        else {
          val payload = new String(b64d.decode(p), StandardCharsets.UTF_8)
          (extract(payload, "email"), extractLong(payload, "exp")) match {
            case (Some(email), Some(exp)) =>
              if (nowSeconds >= exp) Left(Expired) else Right(email)
            case _ => Left(Invalid)
          }
        }
      case _ => Left(Invalid)
    }
  }

  private def constantTimeEq(a: String, b: String): Boolean =
    java.security.MessageDigest.isEqual(
      a.getBytes(StandardCharsets.US_ASCII), b.getBytes(StandardCharsets.US_ASCII))

  private def extract(json: String, key: String): Option[String] =
    s""""$key"\\s*:\\s*"([^"]*)"""".r.findFirstMatchIn(json).map(_.group(1))

  private def extractLong(json: String, key: String): Option[Long] =
    s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json).map(_.group(1).toLong)
}
