package graft.server

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.log.WalrusLog

/** Wire-protocol roundtrip, mirroring the reference's CLI e2e
  * (reference: distributed-walrus/tests/cli_e2e.rs:24-123). */
class WalrusServerSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("WalrusServerSpec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("REGISTER / PUT / GET / STATE / METRICS roundtrip + error paths") {
    val root = Files.createTempDirectory("wserver-").toString
    val log = new WalrusLog(spark, root)
    val server = new WalrusServer(log)
    try {
      val p = server.boundPort
      assert(WalrusClient.call(p, "REGISTER orders") == "OK")
      assert(WalrusClient.call(p, "PUT orders hello-1") == "OK")
      assert(WalrusClient.call(p, "PUT orders hello-2") == "OK")
      assert(WalrusClient.call(p, "GET orders") == "OK hello-1")
      assert(WalrusClient.call(p, "GET orders") == "OK hello-2")
      assert(WalrusClient.call(p, "GET orders") == "EMPTY")
      val state = WalrusClient.call(p, "STATE orders")
      assert(state.startsWith("OK {") && state.contains("\"next_offset\":2"))
      val metrics = WalrusClient.call(p, "METRICS")
      assert(metrics.startsWith("OK {") && metrics.contains("\"topics\":1"))
      // error paths (cli_e2e.rs error cases)
      assert(WalrusClient.call(p, "PUT orders").startsWith("ERR"))
      assert(WalrusClient.call(p, "BOGUS x").startsWith("ERR unknown command"))
      assert(WalrusClient.call(p, "GET never-registered") == "EMPTY")
    } finally server.close()
  }
}
