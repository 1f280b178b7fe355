package graft.icelite

import java.io.{BufferedInputStream, File, FileOutputStream}
import java.net.{HttpURLConnection, URI}
import java.nio.file.{Files, Path, Paths}
import scala.collection.mutable.ArrayBuffer

/** Source classification and resolution for the ingest pipeline (semantics
  * of `/root/reference/utils.py:125-254`): remote URL, glob directory, or
  * single local file. Pure decision logic + a streamed download helper.
  */
object SourceResolver {

  sealed trait SourceType
  case object Remote  extends SourceType
  case object Glob    extends SourceType
  case object Local   extends SourceType
  case object Unknown extends SourceType

  /** `file:` URIs (e.g. from Hadoop Path.toString) -> plain local paths. */
  def localize(path: String): String =
    if (path.startsWith("file:")) Paths.get(URI.create(path)).toString else path

  private def hasWildcard(p: String): Boolean =
    p.exists(c => c == '*' || c == '?' || c == '[')

  /** Classify, in the reference's order: URL scheme first, then an explicit
    * glob pattern, then a wildcard-bearing source path (treated as
    * dir+pattern), then an existing local file; else unknown. */
  def detect(path: String, globPattern: Option[String]): SourceType =
    if (path.startsWith("http://") || path.startsWith("https://")) Remote
    else if (globPattern.exists(_.nonEmpty)) Glob
    else if (hasWildcard(path)) Glob
    else if (new File(localize(path)).isFile) Local
    else Unknown

  /** Expand `dir` + glob `pattern` to a sorted list of matching file paths. */
  def expandGlob(dir: String, pattern: String): Seq[String] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val matcher = d.getFileSystem.getPathMatcher("glob:" + pattern)
      val out     = ArrayBuffer.empty[String]
      val stream  = Files.newDirectoryStream(d)
      try {
        stream.forEach { p =>
          if (Files.isRegularFile(p) && matcher.matches(p.getFileName)) out += p.toString
        }
      } finally stream.close()
      out.sorted.toSeq
    }
  }

  /** Stream-download a remote CSV to `destDir` in 8 KiB chunks (the
    * reference's `download_remote_csv`). Supports file:// URIs too, which is
    * what the zero-egress tests exercise. Returns (localPath, fileName). */
  def download(url: String, destDir: String): (String, String) = {
    val uri      = URI.create(url)
    val fileName = Option(uri.getPath).map(_.split('/').last).filter(_.nonEmpty).getOrElse("download.csv")
    val dest     = Paths.get(destDir, fileName)
    Files.createDirectories(dest.getParent)
    val conn = uri.toURL.openConnection()
    conn match {
      case h: HttpURLConnection => h.setInstanceFollowRedirects(true)
      case _                    =>
    }
    val in  = new BufferedInputStream(conn.getInputStream)
    val out = new FileOutputStream(dest.toFile)
    try {
      val buf = new Array[Byte](8192)
      var n   = in.read(buf)
      while (n >= 0) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } finally {
      in.close(); out.close()
    }
    (dest.toString, fileName)
  }

  /** Resolve the concrete list of files to ingest: (localPath, fileName).
    * A wildcard-bearing `path` with no explicit pattern splits into
    * (parent dir, filename pattern). Unknown sources raise rather than
    * silently ingesting nothing. */
  def filesToProcess(path: String, globPattern: Option[String], tmpDir: String): Seq[(String, String)] =
    detect(path, globPattern) match {
      case Remote => Seq(download(path, tmpDir))
      case Glob =>
        val (dir, pat) = globPattern.filter(_.nonEmpty) match {
          case Some(p) => (localize(path), p)
          case None =>
            val f = new File(localize(path))
            (Option(f.getParent).getOrElse("."), f.getName)
        }
        expandGlob(dir, pat).map(p => (p, new File(p).getName))
      case Local   => val p = localize(path); Seq((p, new File(p).getName))
      case Unknown => throw new IllegalArgumentException(s"cannot resolve ingest source: $path")
    }
}
