package graft

import graft.connectors.ConnectorDefs
import graft.server.{HttpFrontend, TokenAuth}
import graft.sources.JdkHttpClient

/** Server frontend entrypoint (reference `cmd/server/main.go`): serve the
  * connector registry over HTTP.
  *
  * {{{
  *   runMain graft.ServerMain [--port N] [--auth]
  * }}}
  *
  * With `--auth`, a fresh Ed25519 keypair is generated and a one-hour
  * all-paths token printed to stderr (exactly the reference demo's
  * behavior, `main.go:100-106`): requests must present it in
  * `Authorization`.
  */
object ServerMain {
  def main(args: Array[String]): Unit = {
    // value-flags found positionally (step 1, so a value-less flag like
    // --auth anywhere in argv cannot shift them off a pair boundary)
    def flagValue(name: String): Option[String] =
      args.toList.sliding(2).collectFirst {
        case List(`name`, v) if !v.startsWith("--") => v
      }
    val port = flagValue("--port").map(_.toInt).getOrElse(8080)
    val withAuth = args.contains("--auth")
    val authKeys = if (withAuth) {
      val kp = TokenAuth.generateKeyPair()
      val pub = TokenAuth.rawPublicKey(kp.getPublic)
      val tok = TokenAuth.Token(
        expiresAt = System.currentTimeMillis() / 1000 + 3600,
        urlPrefixes = "/", publicKey = pub)
      System.err.println(s"Authorization: ${TokenAuth.signToken(tok, kp.getPrivate)}")
      Seq(pub)
    } else Nil
    val fe = new HttpFrontend(ConnectorDefs.all, new JdkHttpClient(), port, authKeys = authKeys)
    fe.start()
    System.err.println(s"graft server listening on 127.0.0.1:${fe.boundPort} " +
      s"(connectors: ${ConnectorDefs.all.keys.toSeq.sorted.mkString(", ")})")
    Thread.currentThread().join() // serve until killed
  }
}
