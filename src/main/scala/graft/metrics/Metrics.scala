package graft.metrics

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ListBuffer

/** Pluggable operational-metrics emitter — the reference ships its
  * discovery counters to statsd (metrics/StatsDClient.scala:25-49,
  * asserted by bbtest/features/metrics.feature:31-37). The pipeline calls
  * [[MetricsEmitter.count]]/[[MetricsEmitter.gauge]]; the binding decides
  * where lines go. Emission is best-effort by contract: a metrics failure
  * must never fail a sync pass.
  */
trait MetricsEmitter {
  def count(aspect: String, value: Long): Unit
  def gauge(aspect: String, value: Long): Unit
}

object MetricsEmitter {

  /** Default: no metrics (the reference's NilClient). */
  object Disabled extends MetricsEmitter {
    def count(aspect: String, value: Long): Unit = ()
    def gauge(aspect: String, value: Long): Unit = ()
  }

  /** statsd line protocol: `<prefix>.<aspect>:<value>|c` (count) and
    * `…|g` (gauge), one UDP datagram per line.
    */
  def statsdLine(prefix: String, aspect: String, value: Long, kind: String): String =
    s"$prefix.$aspect:$value|$kind"

  /** UDP statsd emitter. Datagrams are fire-and-forget; send errors are
    * swallowed (metrics must not take down the pipeline). One datagram
    * per metric — sync emits a handful per PASS, not per row, so
    * client-side aggregation buys nothing here.
    */
  final class StatsD(host: String, port: Int, prefix: String = "graft.dwh")
      extends MetricsEmitter with AutoCloseable {
    private val socket = new DatagramSocket()
    private val addr = InetAddress.getByName(host)

    private def send(line: String): Unit =
      try {
        val bytes = line.getBytes(StandardCharsets.UTF_8)
        socket.send(new DatagramPacket(bytes, bytes.length, addr, port))
      } catch { case _: Exception => () }

    def count(aspect: String, value: Long): Unit =
      send(statsdLine(prefix, aspect, value, "c"))
    def gauge(aspect: String, value: Long): Unit =
      send(statsdLine(prefix, aspect, value, "g"))
    def close(): Unit = socket.close()
  }

  /** In-memory capture for tests: records the exact statsd lines the
    * StatsD emitter would send.
    */
  final class Recording(prefix: String = "graft.dwh") extends MetricsEmitter {
    private val buf = ListBuffer.empty[String]
    def count(aspect: String, value: Long): Unit =
      buf.synchronized { buf += statsdLine(prefix, aspect, value, "c"): Unit }
    def gauge(aspect: String, value: Long): Unit =
      buf.synchronized { buf += statsdLine(prefix, aspect, value, "g"): Unit }
    def lines: List[String] = buf.synchronized(buf.toList)
  }
}
