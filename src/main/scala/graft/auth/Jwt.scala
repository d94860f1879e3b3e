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

  /** JSON string escape for claim values: quote, backslash, and all
    * control chars — an email may legally contain quotes ("a\"b"@x.com),
    * and silently stripping them would rebind the token to a different
    * identity (email is the engine's tenancy key). */
  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Issue a token for `email` valid until `nowSeconds + ttl`. */
  def issue(email: String, secret: String, nowSeconds: Long,
      ttlSeconds: Long = DefaultTtlSeconds): String = {
    val header = enc("""{"alg":"HS256","typ":"JWT"}""")
    // deterministic, minimal claim set (email, exp) — jwt_request.py reads
    // payload["email"]; expiry is standard `exp`
    val payload = enc(s"""{"email":"${jsonEscape(email)}","exp":${nowSeconds + ttlSeconds}}""")
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

  /** Minimal JSON string-value extractor for the two flat claims this
    * token carries: tolerates backslash escapes inside the value (so an
    * issued token with an escaped-quote email round-trips) and decodes
    * the escapes jsonEscape produces. */
  private def extract(json: String, key: String): Option[String] =
    s""""$key"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""".r.findFirstMatchIn(json).flatMap { m =>
      val raw = m.group(1)
      // malformed escapes (e.g. \uZZZZ from a co-signer) → None → Invalid
      scala.util.Try {
        val sb = new StringBuilder(raw.length)
        var i = 0
        while (i < raw.length) {
          val c = raw.charAt(i)
          if (c == '\\' && i + 1 < raw.length) {
            raw.charAt(i + 1) match {
              case 'u' if i + 5 < raw.length =>
                sb.append(Integer.parseInt(raw.substring(i + 2, i + 6), 16).toChar); i += 6
              case e => sb.append(e); i += 2
            }
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      }.toOption
    }

  private def extractLong(json: String, key: String): Option[Long] =
    s""""$key"\\s*:\\s*(\\d+)""".r.findFirstMatchIn(json)
      // an exp beyond Long.MaxValue in a validly-signed token must surface
      // as Invalid (the Either error channel), not a NumberFormatException
      .flatMap(m => scala.util.Try(m.group(1).toLong).toOption)
}
