package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.serving.HttpServing

/** Exercises the production HTTP serving client against an in-process
  * OpenAI-compatible server — the analogue of the reference's Flask
  * dummy-server tests (`test/dummy_server/app.py`, `test/conftest.py`):
  * happy path, error-then-retry, concurrency.
  */
class HttpServingSpec extends AnyFunSuite {

  private def withServer(handler: (Int, String) => (Int, String))(
      body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val counter = new java.util.concurrent.atomic.AtomicInteger(0)
    server.createContext("/v1/chat/completions",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val req = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        val (status, resp) = handler(counter.incrementAndGet(), req)
        val bytes = resp.getBytes("UTF-8")
        exchange.sendResponseHeaders(status, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
    finally server.stop(0)
  }

  private def ok(content: String): (Int, String) =
    (200, s"""{"choices":[{"message":{"role":"assistant","content":"$content"}}]}""")

  test("generate returns parsed content, order-preserving") {
    withServer { (_, req) =>
      // echo the user content back, marked
      val m = """"role":"user","content":"([^"]*)"""".r.findFirstMatchIn(req)
      ok("resp:" + m.map(_.group(1)).getOrElse("?"))
    } { url =>
      val client = HttpServing(url, "test-model", maxWorkers = 4)
      val out = client.generate(Seq("a", "b", "c"), "sys")
      assert(out == Seq("resp:a", "resp:b", "resp:c"))
    }
  }

  test("retries recover from transient 500s") {
    val fails = new java.util.concurrent.atomic.AtomicInteger(0)
    withServer { (n, _) =>
      if (fails.incrementAndGet() <= 2) (500, """{"error":"queue full"}""")
      else ok("recovered")
    } { url =>
      val client = HttpServing(url, "test-model", maxRetries = 5)
      assert(client.generate(Seq("x"), "").head == "recovered")
    }
  }

  test("exhausted retries surface the failure") {
    withServer { (_, _) => (503, """{"error":"down"}""") } { url =>
      val client = HttpServing(url, "test-model", maxRetries = 2)
      intercept[Exception](client.generate(Seq("x"), ""))
    }
  }

  private def withEmbedServer(respond: String => String)(
      body: String => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/v1/embeddings",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val req = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        val bytes = respond(req).getBytes("UTF-8")
        exchange.sendResponseHeaders(200, bytes.length.toLong)
        exchange.getResponseBody.write(bytes)
        exchange.close()
      })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/v1/chat/completions")
    finally server.stop(0)
  }

  test("embed reorders out-of-order data entries by index") {
    // OpenAI allows data[] in any order; vector j must land on text j
    withEmbedServer { _ =>
      """{"object":"list","data":[
        |{"object":"embedding","index":2,"embedding":[2.0,2.0]},
        |{"embedding":[0.0,0.5],"index":0,"object":"embedding"},
        |{"object":"embedding","index":1,"embedding":[1.0,1.5]}
        |],"model":"m"}""".stripMargin
    } { url =>
      val out = HttpServing(url, "m").embed(Seq("a", "b", "c"))
      assert(out.map(_.toSeq) ==
        Seq(Seq(0.0, 0.5), Seq(1.0, 1.5), Seq(2.0, 2.0)))
    }
  }

  test("embed falls back to stream order when the server omits index") {
    withEmbedServer { _ =>
      """{"data":[{"embedding":[1.0]},{"embedding":[2.0]}]}"""
    } { url =>
      val out = HttpServing(url, "m").embed(Seq("a", "b"))
      assert(out.map(_.toSeq) == Seq(Seq(1.0), Seq(2.0)))
    }
  }

  test("embed rejects an index set that is not a permutation") {
    withEmbedServer { _ =>
      """{"data":[{"index":0,"embedding":[1.0]},{"index":0,"embedding":[2.0]}]}"""
    } { url =>
      intercept[IllegalArgumentException](HttpServing(url, "m").embed(Seq("a", "b")))
    }
  }

  test("json escaping survives quotes and newlines in prompts") {
    withServer { (_, req) =>
      assert(req.contains("\\\"quoted\\\"") && req.contains("\\n"))
      ok("fine")
    } { url =>
      val client = HttpServing(url, "test-model")
      assert(client.generate(Seq("say \"quoted\"\nline2"), "s\"y\"s").head == "fine")
    }
  }
}
