package graft.auth

import org.scalatest.funsuite.AnyFunSuite

class JwtSpec extends AnyFunSuite {
  private val secret = "test-secret"
  private val now = 1700000000L

  test("issue/verify round-trip binds the email") {
    val t = Jwt.issue("a@x.com", secret, now)
    assert(Jwt.verify(t, secret, now + 10) == Right("a@x.com"))
    assert(Jwt.verify(s"Bearer $t", secret, now + 10) == Right("a@x.com"))
  }

  test("expired token is rejected after the 1h TTL") {
    val t = Jwt.issue("a@x.com", secret, now)
    assert(Jwt.verify(t, secret, now + 3600) == Left(Jwt.Expired))
    assert(Jwt.verify(t, secret, now + 3599) == Right("a@x.com"))
  }

  test("missing/malformed/forged tokens map to the reference error surface") {
    assert(Jwt.verify(null, secret, now) == Left(Jwt.Missing))
    assert(Jwt.verify("", secret, now) == Left(Jwt.Missing))
    assert(Jwt.verify("not.a", secret, now) == Left(Jwt.Invalid))
    val t = Jwt.issue("a@x.com", secret, now)
    assert(Jwt.verify(t, "other-secret", now) == Left(Jwt.Invalid))
    // tampered payload
    val Array(h, p, s) = t.split('.')
    val forged = java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString("""{"email":"evil@x.com","exp":9999999999}""".getBytes)
    assert(Jwt.verify(s"$h.$forged.$s", secret, now) == Left(Jwt.Invalid))
  }

  test("token is deterministic for fixed inputs") {
    assert(Jwt.issue("a@x.com", secret, now) == Jwt.issue("a@x.com", secret, now))
  }

  test("emails with quotes, backslashes, and control chars round-trip exactly") {
    // RFC 5321 quoted local parts may contain escaped quotes; the claim must
    // bind the REAL identity, not a stripped variant (tenancy key)
    for (email <- Seq("\"a\\\"b\"@x.com", "trailing\\@x.com", "tab\there@x.com")) {
      val t = Jwt.issue(email, secret, now)
      assert(Jwt.verify(t, secret, now + 10) == Right(email), s"round-trip of $email")
      // and the payload is well-formed JSON a standard consumer could parse:
      val payload = new String(java.util.Base64.getUrlDecoder.decode(t.split('.')(1)), "UTF-8")
      // structural quotes (escapes removed) must pair up
      assert(payload.replaceAll("\\\\.", "").count(_ == '"') % 2 == 0)
      assert(!payload.exists(c => c < ' '))
    }
  }

  test("overflow exp in a validly signed token is Invalid, not an exception") {
    val h = java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString("""{"alg":"HS256","typ":"JWT"}""".getBytes)
    val p = java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString("""{"email":"a@x.com","exp":99999999999999999999999}""".getBytes)
    // sign it properly with the same secret (a "valid" token from a co-signer)
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret.getBytes("UTF-8"), "HmacSHA256"))
    val s = java.util.Base64.getUrlEncoder.withoutPadding()
      .encodeToString(mac.doFinal(s"$h.$p".getBytes("US-ASCII")))
    assert(Jwt.verify(s"$h.$p.$s", secret, now) == Left(Jwt.Invalid))
  }
}
