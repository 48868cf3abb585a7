package graft.control

import java.net.InetSocketAddress
import com.sun.net.httpserver.HttpServer

/** Liveness endpoint (reference C1, cdc_consumer.py:26-40): HTTP 200
  * "OK" on any GET — enough for a container orchestrator's liveness
  * probe. Runs on a daemon thread; `close()` stops it. */
object Health {
  final class Handle(server: HttpServer) extends AutoCloseable {
    /** Bound port (useful when started with port 0). */
    def port: Int = server.getAddress.getPort
    override def close(): Unit = server.stop(0)
  }

  def start(port: Int): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", { exchange =>
      val body = "OK".getBytes
      exchange.sendResponseHeaders(200, body.length)
      val os = exchange.getResponseBody
      os.write(body); os.close()
    })
    // Daemon executor, like the reference's daemon health thread
    // (cdc_consumer.py:37-40): liveness must never block JVM exit.
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor { r =>
      val t = new Thread(r, "graft-health"); t.setDaemon(true); t
    })
    server.start()
    new Handle(server)
  }
}
