package graft.streaming

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import graft.SparkTestBase

/** Shared in-memory wide-column store standing in for the HBase cluster
  * (local[*] = one JVM, so executors and the assertion see the same map). */
object InMemoryKV {
  val store = new ConcurrentHashMap[(String, String, String, String), String]()
  val clientsCreated = new AtomicInteger(0)
  val flushes = new AtomicInteger(0)
  def reset(): Unit = { store.clear(); clientsCreated.set(0); flushes.set(0) }
}

/** The production seam: a real deployment returns an HBase-connection-backed
  * client here; the test returns one writing to [[InMemoryKV]]. */
class InMemoryKVFactory extends KVClientFactory {
  def create(): KVClient = {
    InMemoryKV.clientsCreated.incrementAndGet()
    new KVClient {
      def put(table: String, rowKey: String, family: String, qualifier: String,
          value: Array[Byte]): Unit = {
        InMemoryKV.store.put((table, rowKey, family, qualifier),
          new String(value, java.nio.charset.StandardCharsets.UTF_8))
        ()
      }
      override def flush(): Unit = { InMemoryKV.flushes.incrementAndGet(); () }
    }
  }
}

/** The HBase-connector parity surface (reference:
  * docs/contents/dev/dev-connectors.md:21-26,103-140): `(rowKey, family,
  * column, value)` tuples land as cell upserts, one client per
  * partition/epoch, flush on successful close, and replay converges
  * (idempotent upsert). */
class KVSinkSpec extends SparkTestBase {

  test("(rowKey, family, column, value) tuples land as cells; replay is idempotent") {
    import spark.implicits._
    InMemoryKV.reset()
    val in = GraftSource.memory[(String, String, String, String)](spark)
    val sink = new KVSink("users", new InMemoryKVFactory)
    val q = in.toDS()
      .map(t => (t._1, t._2, t._3, t._4.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      .writeStream.foreach(sink).start()
    try {
      in.addData(("row1", "cf", "name", "ada"), ("row2", "cf", "name", "bob"))
      q.processAllAvailable()
      assert(InMemoryKV.store.get(("users", "row1", "cf", "name")) === "ada")
      assert(InMemoryKV.store.get(("users", "row2", "cf", "name")) === "bob")
      assert(InMemoryKV.clientsCreated.get() > 0)
      assert(InMemoryKV.flushes.get() > 0)

      // upsert semantics: a newer put for the same cell wins...
      in.addData(("row1", "cf", "name", "ada lovelace"))
      q.processAllAvailable()
      assert(InMemoryKV.store.get(("users", "row1", "cf", "name")) === "ada lovelace")
      val snapshot = new java.util.HashMap(InMemoryKV.store)

      // ...and re-delivering the same tuples (epoch replay) changes nothing
      in.addData(("row1", "cf", "name", "ada lovelace"), ("row2", "cf", "name", "bob"))
      q.processAllAvailable()
      assert(InMemoryKV.store === snapshot)
    } finally q.stop()
  }
}
