package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}

/** S1: HTTP archive fetch to a landing directory (SURVEY.md §2.1; ≙
  * `export_svg.py:85-98`, which GETs a gz archive to /tmp then the
  * object store). Driver-side utility — ingestion of the landed file
  * is a normal Spark scan (`FjcPipeline.readRaw` reads `.gz`
  * directly, so the reference's separate gunzip hop disappears).
  *
  * Unlike the reference (`verify=False` at `export_svg.py:93`), TLS
  * verification stays ON — there is no legitimate reason to disable
  * it for a public archive download.
  */
object HttpFetch {

  def fetch(url: String, landingDir: String,
            fileName: Option[String] = None): Path = {
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val name = fileName.getOrElse {
      val p = URI.create(url).getPath
      val base = p.substring(p.lastIndexOf('/') + 1)
      if (base.nonEmpty) base else "download"
    }
    val target = dir.resolve(name)
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(target))
    if (resp.statusCode() / 100 != 2) {
      Files.deleteIfExists(target)
      throw new RuntimeException(s"GET $url -> HTTP ${resp.statusCode()}")
    }
    target
  }
}
