package graft.core

import java.nio.file.{Files, Path, Paths}

import com.fasterxml.jackson.databind.JsonNode

/** Per-stream cursor persistence (reference `protocol.go:15,35-53`; fixture
  * `stubs/airbyte-state.json`). One JSON doc per stream, written atomically
  * (temp file + move) and only after the stream's sink write commits —
  * SURVEY §7 hard part (a): `write → state`, never the reverse. Crash
  * between the two re-syncs the window (at-least-once), matching the
  * reference's end-of-run state emission semantics.
  */
final class FileStateStore(dir: String) {
  private val base: Path = Paths.get(dir)
  Files.createDirectories(base)

  private def fileOf(stream: String): Path = {
    require(stream.nonEmpty && !stream.contains('/') && !stream.contains(".."),
      s"invalid stream name: $stream")
    base.resolve(s"$stream.json")
  }

  def load(stream: String): Option[JsonNode] = {
    val f = fileOf(stream)
    if (Files.exists(f)) Some(Json.parse(Files.readString(f))) else None
  }

  def loadAll(): Map[String, JsonNode] = {
    // Files.list must be closed (javadoc) — it holds a directory fd; a
    // long-running server calling loadAll per sync would leak one per call
    val stream = Files.list(base)
    try {
      val it = stream.iterator()
      val out = Map.newBuilder[String, JsonNode]
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.endsWith(".json"))
          out += n.stripSuffix(".json") -> Json.parse(Files.readString(p))
      }
      out.result()
    } finally stream.close()
  }

  def save(stream: String, stateJson: String): Unit = {
    val f = fileOf(stream)
    val tmp = f.resolveSibling(f.getFileName.toString + ".tmp")
    Files.writeString(tmp, stateJson)
    Files.move(tmp, f, java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }
}
