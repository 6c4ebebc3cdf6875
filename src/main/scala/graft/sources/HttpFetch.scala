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
  * it for a public archive download. The reference also has no retry
  * of its own (Airflow task retries around it); here the fetch
  * retries RETRYABLE failures explicitly — connect/read errors and
  * 5xx/429 — with exponential backoff, and fails fast on other 4xx
  * (a 404 never heals).
  */
object HttpFetch {

  /** @param retries   additional attempts after the first (0 = one shot)
    * @param backoffMs base delay before attempt n+1; doubles each retry */
  def fetch(url: String, landingDir: String,
            fileName: Option[String] = None,
            retries: Int = 2, backoffMs: Long = 250L): Path = {
    require(retries >= 0 && backoffMs >= 0, "retries/backoffMs must be >= 0")
    val dir = Paths.get(landingDir)
    Files.createDirectories(dir)
    val name = fileName.getOrElse {
      val p = URI.create(url).getPath
      val base = p.substring(p.lastIndexOf('/') + 1)
      if (base.nonEmpty) base else "download"
    }
    val target = dir.resolve(name)
    // Stream into a temp file in the SAME directory (so the final move
    // is a rename, not a copy) and only promote it over `target` on a
    // 2xx. A failed refresh — error status, mid-body IO error, retries
    // exhausted — must never destroy a previously good download.
    val tmp = Files.createTempFile(dir, "." + name + ".", ".part")
    val client = HttpClient.newBuilder()
      .followRedirects(HttpClient.Redirect.NORMAL)
      .build()
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()

    def attempt(left: Int, delayMs: Long): Path = {
      val outcome: Either[Throwable, Path] =
        try {
          // TRUNCATE_EXISTING: a retry over a longer failed attempt
          // must not keep the old tail (ofFile's default is CREATE+
          // WRITE only, which writes from offset 0 without truncating)
          val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(tmp,
            java.nio.file.StandardOpenOption.CREATE,
            java.nio.file.StandardOpenOption.WRITE,
            java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
          val code = resp.statusCode()
          if (code / 100 == 2) {
            Files.move(tmp, target,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
            Right(target)
          } else {
            val e = new RuntimeException(s"GET $url -> HTTP $code")
            if (code == 429 || code / 100 == 5) Left(e) // retryable
            else throw e // other 4xx: never heals, fail fast
          }
        } catch {
          case e: java.io.IOException => Left(e) // connect/read failure
        }
      outcome match {
        case Right(p) => p
        case Left(e) if left > 0 =>
          Thread.sleep(delayMs)
          attempt(left - 1, delayMs * 2)
        case Left(e) => throw e
      }
    }
    try attempt(retries, backoffMs)
    finally Files.deleteIfExists(tmp)
  }
}
