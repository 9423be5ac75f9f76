package graft.server

import java.security.{KeyFactory, KeyPair, KeyPairGenerator, PrivateKey, PublicKey, Signature}
import java.security.interfaces.EdECPublicKey
import java.security.spec.{EdECPoint, EdECPublicKeySpec, NamedParameterSpec}
import java.util.Base64

import graft.core.Json

/** Signed-token auth for the HTTP frontend (reference
  * `cmd/server/main.go:34-98`): a token is `sign(json)` — a 64-byte Ed25519
  * signature followed by the JSON payload — base64url-encoded without
  * padding (Go's `base64.RawURLEncoding` + `nacl/sign`). The payload carries
  * an expiry (`e`, unix seconds), a comma-separated list of allowed URL
  * prefixes (`u`), and the signer's 32-byte public key (`p`, std base64 as
  * Go marshals []byte); verification checks expiry, path scope, that the
  * embedded key is on the server's allow-list, and the signature itself.
  *
  * Uses the JDK's native Ed25519 (Java 15+) — same curve and signature
  * scheme as NaCl `sign`, no extra dependency. One deliberate divergence:
  * the reference demo rejects requests whose path DOES match a token prefix
  * (`main.go:65-67` — the condition reads inverted for a scoping check);
  * here a token authorizes exactly the paths matching one of its prefixes,
  * which is the semantics the reference's Token doc implies.
  */
object TokenAuth {

  final case class Token(expiresAt: Long, urlPrefixes: String, publicKey: Array[Byte])

  private val b64url = Base64.getUrlEncoder.withoutPadding
  private val b64urlDec = Base64.getUrlDecoder
  private val b64std = Base64.getEncoder
  private val b64stdDec = Base64.getDecoder
  private val SigLen = 64

  def generateKeyPair(): KeyPair =
    KeyPairGenerator.getInstance("Ed25519").generateKeyPair()

  /** Raw 32-byte Ed25519 public key (little-endian y with the x-parity high
    * bit — the NaCl/RFC8032 wire form) from a JDK key.
    */
  def rawPublicKey(pub: PublicKey): Array[Byte] = {
    val point = pub.asInstanceOf[EdECPublicKey].getPoint
    val y = point.getY.toByteArray.reverse // big-endian → little-endian
    val out = new Array[Byte](32)
    System.arraycopy(y, 0, out, 0, math.min(y.length, 32))
    if (point.isXOdd) out(31) = (out(31) | 0x80).toByte
    out
  }

  /** JDK key from the raw 32-byte wire form. */
  def publicKeyFromRaw(raw: Array[Byte]): PublicKey = {
    require(raw.length == 32, s"Ed25519 public key must be 32 bytes, got ${raw.length}")
    val b = raw.clone()
    val xOdd = (b(31) & 0x80) != 0
    b(31) = (b(31) & 0x7f).toByte
    val y = new java.math.BigInteger(1, b.reverse)
    KeyFactory.getInstance("Ed25519")
      .generatePublic(new EdECPublicKeySpec(NamedParameterSpec.ED25519, new EdECPoint(xOdd, y)))
  }

  private def tokenJson(tok: Token): Array[Byte] =
    s"""{"e":${tok.expiresAt},"u":${Json.write(Json.mapper.valueToTree(tok.urlPrefixes))},"p":"${b64std.encodeToString(tok.publicKey)}"}"""
      .getBytes("UTF-8")

  /** `base64url(signature || json)` — the reference's `signToken`
    * (`main.go:90-98`).
    */
  def signToken(tok: Token, priv: PrivateKey): String = {
    val js = tokenJson(tok)
    val sig = Signature.getInstance("Ed25519")
    sig.initSign(priv)
    sig.update(js)
    b64url.encodeToString(sig.sign() ++ js)
  }

  /** Verify an Authorization value for `path` against the allow-listed raw
    * public keys (reference `verify`, `main.go:53-86`). Returns the token on
    * success, a reason on failure — never throws on malformed input.
    */
  def verify(auth: String, path: String, allowed: Seq[Array[Byte]],
      now: () => Long = () => System.currentTimeMillis() / 1000): Either[String, Token] =
    try {
      val msg = b64urlDec.decode(auth)
      if (msg.length < SigLen) return Left("invalid auth len")
      val js = Json.parse(new String(msg, SigLen, msg.length - SigLen, "UTF-8"))
      val tok = Token(
        expiresAt = js.get("e").asLong,
        urlPrefixes = js.get("u").asText,
        publicKey = b64stdDec.decode(js.get("p").asText))
      if (now() > tok.expiresAt) Left("token expired")
      else if (!tok.urlPrefixes.split(',').exists(p => p.nonEmpty && path.startsWith(p)))
        Left("path not in token scope")
      else if (!allowed.exists(_.sameElements(tok.publicKey))) Left("invalid pk")
      else {
        val sig = Signature.getInstance("Ed25519")
        sig.initVerify(publicKeyFromRaw(tok.publicKey))
        sig.update(msg, SigLen, msg.length - SigLen)
        if (sig.verify(java.util.Arrays.copyOfRange(msg, 0, SigLen))) Right(tok)
        else Left("bad signature")
      }
    } catch { case e: Exception => Left(s"malformed token: ${e.getMessage}") }
}
