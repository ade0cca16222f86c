package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

/** The HTTP service surface must run a full two-stage JSON query (catalog
  * resolved from the request, like the reference's fuse service), reject
  * bad queries with a client error, and answer health checks. */
class ServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def request(
      url: String, method: String, body: Option[String]): (Int, String) = {
    val conn = URI.create(url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    body.foreach { b =>
      conn.setDoOutput(true)
      conn.getOutputStream.write(b.getBytes(UTF_8))
    }
    val status = conn.getResponseCode
    val in = if (status < 400) conn.getInputStream else conn.getErrorStream
    val out = new String(in.readAllBytes(), UTF_8)
    conn.disconnect()
    (status, out)
  }

  test("server answers health checks and runs a two-stage query end to end") {
    val server = Server.start(spark, 0) // ephemeral port
    try {
      val base = s"http://localhost:${server.getAddress.getPort}"
      assert(request(s"$base/health", "GET", None) == ((200, "\"H\"")))

      val query =
        s"""{
           |"steps": [
           | {"sql": "SELECT r_regionkey, count(*) AS cnt FROM region GROUP BY r_regionkey",
           |  "name": "m", "step_type": "HBee"},
           | {"sql": "SELECT sum(cnt) AS total FROM m", "name": "r", "step_type": "HComb"}
           |],
           |"capacity": {"zones": 1},
           |"catalogs": [{"name": "region", "type": "Static",
           |  "uri": "${TestSpark.sf}/region.parquet"}]
           |}""".stripMargin
      val (status, body) = request(s"$base/query", "POST", Some(query))
      assert(status == 200, s"body: $body")
      assert(body == """[{"total":5}]""", body)

      // malformed query → client error with a JSON error payload
      val (bad, badBody) = request(s"$base/query", "POST", Some("""{"steps": []}"""))
      assert(bad == 400, badBody)
      assert(badBody.contains("error"))

      // syntactically invalid JSON is ALSO a client error, not a 500
      val (unparseable, upBody) = request(s"$base/query", "POST", Some("not json at all"))
      assert(unparseable == 400, upBody)
      assert(upBody.contains("invalid JSON"))

      // wrong method
      assert(request(s"$base/query", "GET", None)._1 == 405)

      // concurrent identical queries share step names — per-request session
      // cloning must keep their temp views from racing
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val results = Await.result(
        Future.sequence(Seq.fill(4)(Future(request(s"$base/query", "POST", Some(query))))),
        120.seconds)
      results.foreach { case (st, b) =>
        assert(st == 200 && b == """[{"total":5}]""", s"concurrent run broke: $st $b")
      }
    } finally server.stop(0)
  }
}
