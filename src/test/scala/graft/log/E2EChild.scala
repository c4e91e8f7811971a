package graft.log

import java.nio.file.{Files, Paths}

/** Child-JVM driver for the cross-process e2e suite
  * ([[graft.server.CrossJvmE2ESpec]]) — the analogue of the reference's
  * spawned-node CLI tests (distributed-walrus/tests/cli_e2e.rs:24-123,
  * Makefile cluster-test-*). Three modes:
  *
  *   protocol <port>            drive REGISTER/PUT/GET/STATE/METRICS over
  *                              TCP against a server in ANOTHER process,
  *                              one fresh connection per command (the
  *                              reconnect-resilience shape of cli_e2e)
  *   collide <target> <marker>  wait for the `<target>.go` barrier file,
  *                              then race `writeAtomicNew` on <target>
  *                              against a sibling process → WIN/LOSE
  *   append <root> <topic> <n>  open a real WalrusLog (own SparkSession)
  *                              on a namespace the parent also uses and
  *                              append n entries
  *   stagecrash <root> <topic> <n>  begin a TRANSACTION, stage n entries
  *                              durably, print the spool dir, then HALT
  *                              the JVM without commit or abort — the
  *                              mid-transaction writer crash whose spool
  *                              must never become visible (the
  *                              read_committed crash window)
  *
  * All output contracts are single stdout lines (Spark logs go to
  * stderr); a failed assertion exits nonzero.
  */
object E2EChild {
  def main(args: Array[String]): Unit = args(0) match {
    case "protocol" =>
      val port = args(1).toInt
      def call(cmd: String): String = graft.server.WalrusClient.call(port, cmd)
      def expect(cmd: String, pred: String => Boolean): Unit = {
        val r = call(cmd)
        if (!pred(r)) { println(s"FAIL $cmd -> $r"); sys.exit(1) }
      }
      expect("REGISTER e2e", _ == "OK")
      // three put/consume cycles, each command on a fresh connection
      (0 until 3).foreach { round =>
        (0 until 2).foreach(i => expect(s"PUT e2e r$round-m$i", _ == "OK"))
        expect("GET e2e", _ == s"OK r$round-m0")
        expect("GET e2e", _ == s"OK r$round-m1")
      }
      expect("GET e2e", _ == "EMPTY") // shared cursor drained
      expect("STATE e2e", r => r.startsWith("OK {") && r.contains("\"topic\""))
      expect("METRICS", _.startsWith("OK {"))
      expect("BOGUS cmd", _.startsWith("ERR unknown command"))
      println("PROTOCOL OK")

    case "collide" =>
      val target = Paths.get(args(1))
      val go = Paths.get(args(1) + ".go")
      println("READY")
      Console.out.flush()
      while (!Files.exists(go)) Thread.onSpinWait()
      try {
        WalrusLog.writeAtomicNew(target, args(2))
        println("WIN")
      } catch {
        case _: IllegalStateException => println("LOSE")
      }

    case "append" =>
      val (root, topic, n) = (args(1), args(2), args(3).toInt)
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .appName("e2e-child")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val log = new WalrusLog(spark, root)
      (0 until n).foreach(i => log.append(topic, s"child-$i".getBytes("UTF-8")))
      val count = log.entryCount(topic)
      log.close()
      spark.stop()
      println(s"APPENDED $count")

    case "racingappend" =>
      // Two of these race one namespace: both OPEN the log (nextBatchId=0
      // in each), report READY, block on the barrier, then batch-append —
      // the loser of the commit race must resync + retry internally
      // (LogConfig.commitCollisionRetries), not throw.
      val (root, topic, n, marker) = (args(1), args(2), args(3).toInt, args(4))
      val barrier = Paths.get(args(5))
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .appName(s"e2e-race-$marker")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val log = new WalrusLog(spark, root)
      println("READY")
      Console.out.flush()
      while (!Files.exists(barrier)) Thread.onSpinWait()
      try {
        log.batchAppend(topic,
          (0 until n).map(i => s"$marker-$i".getBytes("UTF-8")))
        println(s"APPENDED ${log.entryCount(topic)}")
        Console.out.flush()
      } catch {
        case e: Throwable =>
          println(s"FAILED ${e.getClass.getSimpleName}: ${e.getMessage}")
          Console.out.flush()
          sys.exit(1)
      }
      log.close()
      spark.stop()

    case "stagecrash" =>
      val (root, topic, n) = (args(1), args(2), args(3).toInt)
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master("local[2]")
        .appName("e2e-stagecrash")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import org.apache.spark.sql.functions.col
      val log = new WalrusLog(spark, root)
      val txn = log.beginTxn()
      val rows = (0 until n).map(i => (topic, s"staged-$i".getBytes("UTF-8"), i.toLong))
      txn.append(
        spark.createDataFrame(rows).toDF("topic", "value", "seq"), col("seq"))
      println(s"STAGED ${log.txnStageRoot.resolve(s"txn-${txn.txnId}")}")
      Console.out.flush()
      // crash, not exit: no shutdown hooks, no cleanup — the spool stays
      // on disk exactly as a power-cut would leave it
      Runtime.getRuntime.halt(137)

    case other =>
      println(s"FAIL unknown mode $other"); sys.exit(2)
  }
}
