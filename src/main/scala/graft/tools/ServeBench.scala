package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.graph.GraphQueries.{CustomerV, GeoModel, GeoRoot, GeoV}
import graft.store.{GraphReplica, GraphStore, RemoteRead, RemoteWrite}

/** Serve-path throughput receipts: wall-clock requests/sec for the
  * thin-client READ path (batched poll vs forced per-request) and
  * acked-txns/sec for the WRITE path, under one realistic burst each —
  * the measured form of the reference's per-action round-trip cost model
  * (Client.hs:71-117). Emits ONE JSON line; record it in SERVE_r{N}.json.
  *
  * Usage: runMain graft.tools.ServeBench [readClients] [reqsPerClient]
  *                                       [idsPerReq] [writeTxns]
  */
object ServeBench {
  def main(args: Array[String]): Unit = {
    val readClients = if (args.length > 0) args(0).toInt else 64
    val reqsPerClient = if (args.length > 1) args(1).toInt else 16
    val idsPerReq = if (args.length > 2) args(2).toInt else 16
    val writeTxns = if (args.length > 3) args(3).toInt else 256
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (1 << 20).toString) // bounded TopKEntries buffers (r18) — see Bench
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))

    // ---- store under test: root -> 2000 customers, committed once
    val storeDir = Files.createTempDirectory("graft-servebench-").toString
    val store = GraphStore.open(spark, GeoModel, GeoRoot: GeoV, storeDir)
    val nNodes = 2000
    // allocate all nodes, then all edges: two collapsed op runs, not 4000
    val ids = (1 to nNodes).map(i => store.session.newNode(CustomerV(i.toLong)))
    ids.foreach(id => store.session.addTarget(store.session.root, id))
    store.commit()
    val replica = GraphReplica.bootstrap(spark, GeoModel, storeDir)
    replica.catchUp()
    val rnd = new scala.util.Random(42)

    // ---- READ burst: readClients × reqsPerClient getValues point reads
    def writeReadBurst(): String = {
      val inbox = Files.createTempDirectory("graft-servebench-read-").toString
      for (c <- 0 until readClients; s <- 0 until reqsPerClient) {
        val reqId = f"c$c%03d-$s%06d"
        val req = Seq.fill(idsPerReq)(ids(rnd.nextInt(nNodes))).mkString(", ")
        Files.writeString(Paths.get(inbox).resolve(s"$reqId.req.json"),
          s"""{"reqId": "$reqId", "op": "getValues", "ids": [$req]}""")
      }
      inbox
    }
    val nReqs = readClients * reqsPerClient
    def drainReads(inbox: String, cap: Int): Double = {
      val t0 = System.nanoTime()
      var answered = 0
      while (answered < nReqs) {
        val got = RemoteRead.answerPendingBounded(replica, inbox, cap).size
        require(got > 0, s"stalled at $answered/$nReqs answered")
        answered += got
      }
      (System.nanoTime() - t0) / 1e9
    }
    // warmup: absorb codegen/JIT so both paths are measured warm
    drainReads(writeReadBurst(), Int.MaxValue)
    val batchedSec = drainReads(writeReadBurst(), Int.MaxValue)
    val perReqSec = drainReads(writeReadBurst(), -1)

    // ---- WRITE burst: writeTxns shipped txns (newNode + addTarget each),
    // 8 client namespaces, drained by the owner's applyPending poll loop
    val wInbox = Files.createTempDirectory("graft-servebench-write-").toString
    val wClients = (0 until 8).map(c =>
      new RemoteWrite.Client(spark, GeoModel, wInbox, f"w$c%02d"))
    (0 until writeTxns).foreach { i =>
      wClients(i % 8).submit { txn =>
        val n = txn.newNode(CustomerV(100000L + i))
        txn.addTarget(0L, n)
      }
    }
    val t0 = System.nanoTime()
    var acked = 0
    var polls = 0
    while (acked < writeTxns) {
      val got = RemoteWrite.applyPending(store, wInbox).size
      require(got > 0, s"stalled at $acked/$writeTxns acked")
      acked += got
      polls += 1
    }
    val writeSec = (System.nanoTime() - t0) / 1e9
    val phases = RemoteWrite.lastPollPhaseNanos.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"$k=${fmt(v / 1e9)}" }.mkString(" ")
    System.err.println(s"[serve] write polls=$polls last-poll phases: $phases")

    // ---- WIRE burst: the TCP transport (store.Wire) under the same
    // point-read/write shape — 4 socket clients x 4 getValues requests of
    // idsPerReq ids, then 16 wire txns. Each frame is a synchronous
    // request/response (the reference's per-action round trip), so this
    // measures the per-action serving floor over a real socket; batching
    // ids per request is the amortization lever, as on the inbox path.
    import graft.store.Wire
    val wireServer = Wire.serve(replica, store)
    val wireReadSec = {
      val clients = (0 until 4).map(c => new Wire.ReadClient(
        spark, GeoModel, wireServer.host, wireServer.port, f"wire$c%02d"))
      clients.head.getValues(Seq(ids(0))) // warm the path
      val t0 = System.nanoTime()
      for (s <- 0 until 4; c <- clients)
        c.getValues(Seq.fill(idsPerReq)(ids(rnd.nextInt(nNodes))))
      val sec = (System.nanoTime() - t0) / 1e9
      clients.foreach(_.close())
      sec
    }
    val wireWriteSec = {
      val wc = new Wire.WriteClient(spark, GeoModel,
        wireServer.host, wireServer.port, "wirew")
      val t0 = System.nanoTime()
      val txnIds = (0 until 16).map { i =>
        wc.submit { txn =>
          val n = txn.newNode(CustomerV(900000L + i))
          txn.addTarget(0L, n)
        }
      }
      txnIds.foreach(id => wc.await(id, timeoutMs = 120000L))
      val sec = (System.nanoTime() - t0) / 1e9
      wc.close()
      sec
    }
    wireServer.close()

    println(
      s"""{"metric":"serve","read":{"requests":$nReqs,"ids_per_req":$idsPerReq,""" +
      s""""batched_sec":${fmt(batchedSec)},"batched_rps":${fmt(nReqs / batchedSec)},""" +
      s""""per_request_sec":${fmt(perReqSec)},"per_request_rps":${fmt(nReqs / perReqSec)},""" +
      s""""batched_speedup":${fmt(perReqSec / batchedSec)}},""" +
      s""""write":{"txns":$writeTxns,"sec":${fmt(writeSec)},""" +
      s""""txn_rps":${fmt(writeTxns / writeSec)}},""" +
      s""""wire":{"read_requests":16,"ids_per_req":$idsPerReq,""" +
      s""""read_sec":${fmt(wireReadSec)},"read_rps":${fmt(16 / wireReadSec)},""" +
      s""""write_txns":16,"write_sec":${fmt(wireWriteSec)},""" +
      s""""write_rps":${fmt(16 / wireWriteSec)}}}""")
    store.close()
    spark.stop()
  }
}
