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
}
