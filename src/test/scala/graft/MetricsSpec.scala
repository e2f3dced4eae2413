package graft

import java.nio.file.Files

import graft.metrics.MetricsEmitter
import graft.warehouse.Warehouse

/** Metrics transport tests mirroring the reference's black-box metrics
  * scenario (bbtest/features/metrics.feature:3-37): one tenant, two
  * accounts, one committed transfer ⇒ discovery counters (1, 2, 1), plus
  * the statsd line protocol over real UDP.
  */
class MetricsSpec extends SparkSpec {

  private def fixture(): String = {
    val root = Files.createTempDirectory("journal")
    def put(rel: String, content: String): Unit = {
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, content)
    }
    put("t_M/account/A/snapshot/0000000000", "EUR FORMAT_T\n")
    put("t_M/account/B/snapshot/0000000000", "EUR FORMAT_T\n")
    put("t_M/account/A/events/0000000000/1_1_TRN", "1\n")
    put("t_M/account/B/events/0000000000/1_-1_TRN", "1\n")
    put("t_M/transaction/TRN",
      "committed\nTRX M A M B 2020-01-01T00:00:00Z 1 EUR\n")
    root.toString
  }

  test("sync emits the reference's discovery counters as statsd lines") {
    val rec = new MetricsEmitter.Recording(prefix = "graft.dwh")
    val wh = Files.createTempDirectory("wh").toString
    Warehouse.sync(spark, fixture(), wh, metrics = rec)

    val counts = rec.lines.filter(_.endsWith("|c"))
    assert(counts == List(
      "graft.dwh.discovery.tenant:1|c",
      "graft.dwh.discovery.account:2|c",
      "graft.dwh.discovery.transfer:1|c"))
    val gauges = rec.lines.filter(_.endsWith("|g"))
    assert(gauges.size == 1 && gauges.head.startsWith("graft.dwh.memory.bytes:"))

    // an idempotent re-sync reports zero discoveries, not silence
    val rec2 = new MetricsEmitter.Recording()
    Warehouse.sync(spark, fixture(), wh, metrics = rec2)
    assert(rec2.lines.count(_.endsWith(":0|c")) == 3)
  }

  test("StatsD emitter speaks the line protocol over UDP") {
    val receiver = new java.net.DatagramSocket() // ephemeral loopback port
    receiver.setSoTimeout(10000)
    val emitter = new MetricsEmitter.StatsD("127.0.0.1", receiver.getLocalPort)
    try {
      emitter.count("discovery.tenant", 3)
      emitter.gauge("memory.bytes", 42)
      def recv(): String = {
        val p = new java.net.DatagramPacket(new Array[Byte](512), 512)
        receiver.receive(p)
        new String(p.getData, 0, p.getLength, "UTF-8")
      }
      assert(recv() == "graft.dwh.discovery.tenant:3|c")
      assert(recv() == "graft.dwh.memory.bytes:42|g")
    } finally {
      emitter.close()
      receiver.close()
    }
  }
}
