package graft.util

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import scala.util.Using

/** Small NIO helpers that eagerly materialize directory streams and CLOSE
  * them — `Files.list`/`Files.walk` return lazy streams holding an open
  * directory fd until closed, and several engine paths (exists-probes,
  * expiration sweeps) run inside the streaming loop where a leaked fd per
  * call accumulates for the life of the JVM. */
object Fs {

  /** Immediate children of `dir` (stream closed). */
  def list(dir: Path): List[Path] =
    Using.resource(Files.list(dir))(_.iterator().asScala.toList)

  /** Recursive walk of `dir`, parents before children (stream closed). */
  def walk(dir: Path): List[Path] =
    Using.resource(Files.walk(dir))(_.iterator().asScala.toList)

  /** Delete a tree bottom-up; missing tree or racing deletes are ignored. */
  def rmTree(dir: Path): Unit =
    try walk(dir).reverse.foreach(Files.deleteIfExists(_))
    catch { case _: Throwable => () }
}
