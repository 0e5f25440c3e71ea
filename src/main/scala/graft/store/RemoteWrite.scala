package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name}

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.Try

import graft.graph._

/** File-queue write shipping — the Spark-suitable analog of the reference's
  * client/server WRITE path (/root/reference/library/GraphDB/Server.hs:17-94,
  * Client.hs:53-117, Protocol.hs:8-43). The reference accepts socket
  * connections and executes each client's shipped transaction inside a real
  * local txn on a dedicated worker; here the transport is a shared
  * filesystem inbox instead of a socket — the natural medium on a Spark
  * deployment, where "clients" are other jobs sharing distributed storage:
  *
  * {{{
  *   <inbox>/<clientId>-<seq>.txn/     one shipped transaction (parquet ops,
  *                                     same row format as the WAL, + _meta.json)
  *   <inbox>/acks/<txnId>.json         the server's response ("reply" leg)
  *   <inbox>/applied/<txnId>.txn/      archive of executed transactions
  * }}}
  *
  * Protocol semantics mirrored from the reference:
  *  - '''tx-local refs''': a shipped `newNode` cannot know its global id, so
  *    it carries a NEGATIVE ordinal (−1, −2, …) that later ops in the same
  *    txn reference — exactly the reference's tx-local ordinal scheme
  *    (Persistent.hs:126-171); the server resolves ordinals to fresh global
  *    ids at apply time and returns the mapping in the ack (the response
  *    round-trip of Client.hs:71-117).
  *  - '''atomicity''': a txn is validated structurally before ANY op is
  *    applied; a refused txn (bad ref, oversized, undecodable) changes no
  *    state and gets a refused ack.
  *  - '''version handshake''': each txn carries the client's format version;
  *    a mismatch is refused, not half-applied — the `ClientFailure`
  *    handshake (GraphDB.hs:169-174, 184-208).
  *  - '''single-writer discipline''': only the store owner applies txns, so
  *    the reference's exclusive write lock (Nonpersistent.hs:51-56) maps to
  *    the store's dir lock; per-client FIFO order is guaranteed by the seq
  *    in the dir name, cross-client order is arbitrary-but-deterministic
  *    (lexicographic), matching concurrent-txn semantics.
  *
  * Durability trade (documented, same family as the reference's buffered
  * WAL): the ack is written AFTER the txn's WAL batch is durable, so a
  * server crash in the tiny window between commit and ack re-applies that
  * txn on the next poll — at-least-once in the crash window, exactly-once
  * otherwise (an acked txn dir found still in the inbox is moved to the
  * archive without re-applying).
  *
  * Scale posture: txns are driver-sized by construction (a remote client
  * ships a monadic program, not a dataset — the reference's txns are the
  * same); bulk data belongs to [[GraphStore.commitBulk]]. An oversized txn
  * is refused with a typed ack, not collected.
  */
object RemoteWrite {

  /** Server response for one shipped transaction — the Protocol.hs response
    * leg. `assigned` maps the client's tx-local negative ordinals to the
    * global ids the server allocated.
    */
  final case class TxnAck(txnId: String, applied: Boolean,
      assigned: Map[Long, Long], error: Option[String])

  /** Fail-stop signal: a txn failed AFTER its first session mutation. No
    * ack is written (the txn stays in the inbox); the store owner must
    * reopen the store (WAL-prefix recovery) before serving again — a
    * refusal ack here would lie, because the partial txn's ops sit in the
    * session op log and a later commit would persist them.
    */
  final class ApplyFailedException(val txnId: String, cause: Throwable)
    extends IllegalStateException(
      s"write-shipping apply failed mid-txn $txnId; the session may hold a " +
        "partial txn — reopen the store to recover (the WAL holds only " +
        "complete, acked txns)", cause)

  private[store] val MetaName = "_meta.json"

  private def writeJsonAtomic(target: Path, json: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def ackJson(a: TxnAck): String = {
    val assigned = a.assigned.toSeq.sortBy(_._1)
      .map { case (l, g) => s""""$l": $g""" }.mkString("{", ", ", "}")
    val err = a.error.fold("null") { e =>
      "\"" + e.replace("\\", "\\\\").replace("\"", "\\\"")
        .replaceAll("[\r\n]", " ") + "\""
    }
    s"""{"txnId": "${a.txnId}", "applied": ${a.applied}, "assigned": $assigned, "error": $err}"""
  }

  private[store] def parseAck(json: String): TxnAck = {
    val txnId = """"txnId":\s*"([^"]*)"""".r.findFirstMatchIn(json)
      .map(_.group(1)).getOrElse("")
    val applied = """"applied":\s*(true|false)""".r.findFirstMatchIn(json)
      .exists(_.group(1) == "true")
    val assigned = """"(-\d+)":\s*(\d+)""".r.findAllMatchIn(json)
      .map(m => m.group(1).toLong -> m.group(2).toLong).toMap
    val error = """"error":\s*"((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(json)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    TxnAck(txnId, applied, assigned, error)
  }

  // ------------------------------------------------------------- client side

  /** Snapshot reads an open [[RemoteTxn]] overlays its pending ops on —
    * the base leg of read-your-uncommitted-writes. Adapters below wrap the
    * existing read surfaces; `getValue` is total (None for unknown ids).
    *
    * `mark` is the snapshot's WAL-coverage stamp (GraphReplica.watermark,
    * captured ONCE at construction — conservative: reads can only observe
    * newer state, so conflict-checking against the construction-time mark
    * never misses a conflict). `None` (legacy adapters) disables the
    * apply-time staleness check — the txn applies optimistically, the
    * pre-r16 behavior.
    */
  trait TxnReads[V] {
    def getValue(n: Long): Option[V]
    def targets(n: Long): Seq[Long]
    def mark: Option[(Long, Long)] = None
  }

  object TxnReads {
    /** Mid-txn reads against a thin read client (shared-storage or wire —
      * the wire's ReadClient wraps this same class). Fetches the serving
      * replica's watermark once, up front, as the snapshot stamp.
      */
    def fromRemoteRead[V](c: RemoteRead.Client[V]): TxnReads[V] = {
      val m = c.watermark()
      new TxnReads[V] {
        def getValue(n: Long): Option[V] = c.getValues(Seq(n)).get(n)
        def targets(n: Long): Seq[Long] = c.targets(n)
        override def mark: Option[(Long, Long)] = Some(m)
      }
    }

    /** Mid-txn reads against a local follower replica. */
    def fromReplica[V](r: GraphReplica[V]): TxnReads[V] = {
      val m = r.watermark
      new TxnReads[V] {
        def getValue(n: Long): Option[V] = r.getValues(Seq(n)).get(n)
        def targets(n: Long): Seq[Long] = r.targets(n)
        override def mark: Option[(Long, Long)] = Some(m)
      }
    }
  }

  /** Transaction builder — the client-side action DSL (Client.hs:53-60).
    * `newNode` returns a tx-local NEGATIVE ref usable by later ops in this
    * txn; ids ≥ 0 reference globally-known nodes (the root is 0; others come
    * from prior acks or replica reads — the same "handles you got from the
    * server" contract the reference's typed client enforces).
    *
    * INTERACTIVE MID-TXN READS ([[getValue]]/[[targets]]): the reference's
    * client holds its write transaction open over the socket and
    * interleaves reads that see its own uncommitted state
    * (Server.hs:17-69, Client.hs:71-117 — under the held write lock).
    * Here the same read-your-uncommitted-writes semantics come from
    * OVERLAYING this txn's pending ops (in op order) on a snapshot
    * ([[TxnReads]]) — no lock is held across the wire. Under the
    * single-writer discipline the group-commit server enforces, a
    * caught-up snapshot makes these reads exactly what the reference's
    * lock-holding reads return. With concurrent writers the reads are
    * VALIDATED AT APPLY TIME instead of locked: the txn ships its
    * snapshot's WAL mark plus the ids it read, and the server refuses
    * with a typed stale-read conflict if any of them was mutated by a
    * later-committed txn (see applyOne) — optimistic concurrency where
    * the reference holds a lock, with the lost-update shape turned from
    * a silent apply into a retry signal.
    */
  final class RemoteTxn[V] private[store] (
      reads: Option[TxnReads[V]] = None) {
    private[store] val ops = mutable.ArrayBuffer[GraphOp[V]]()
    private val defined = mutable.Set[Long]()
    private var locals = 0
    // global ids whose SNAPSHOT state this txn's reads depended on —
    // shipped with the txn (plus the snapshot's WAL mark) so the server
    // can refuse at apply time if any of them was mutated by a
    // later-committed txn: the lock-free stand-in for the reference's
    // reads-under-the-held-write-lock serializability (GraphDB.hs:288-289)
    private[store] val valueReads = mutable.Set[Long]()
    private[store] val targetReads = mutable.Set[Long]()
    // members the snapshot ANSWERED for targets reads: a later-committed
    // RemoveNode(m) changes a targets(src) result only when m was in the
    // observed list (removals strip incoming edges) — shipping the
    // observed members lets the server conflict-check removals precisely
    // instead of refusing on ANY removal after the mark
    private[store] val targetMembers = mutable.Set[Long]()

    /** (snapshot mark, value-read ids, targets-read ids, observed
      * members) when this txn performed snapshot-dependent reads against
      * a stamped snapshot.
      */
    private[store] def readsInfo
        : Option[((Long, Long), Set[Long], Set[Long], Set[Long])] =
      reads.flatMap(_.mark)
        .map(m => (m, valueReads.toSet, targetReads.toSet, targetMembers.toSet))
        .filter { case (_, v, t, _) => v.nonEmpty || t.nonEmpty }

    private def checkRef(x: Long, what: String): Unit =
      require(x >= 0 || defined(x),
        s"$what references undefined tx-local ref $x — refs must come from " +
          "this txn's newNode (negative) or be global ids (non-negative)")

    def newNode(v: V): Long = {
      locals += 1
      val ref = -locals.toLong
      defined += ref
      ops += GraphOp.NewNode(ref, v)
      ref
    }
    def setValue(n: Long, v: V): Unit = {
      checkRef(n, "setValue"); ops += GraphOp.SetValue(n, v)
    }
    def addTarget(src: Long, dst: Long): Unit = {
      checkRef(src, "addTarget src"); checkRef(dst, "addTarget dst")
      ops += GraphOp.AddTarget(src, dst)
    }
    def removeTarget(src: Long, dst: Long): Unit = {
      checkRef(src, "removeTarget src"); checkRef(dst, "removeTarget dst")
      ops += GraphOp.RemoveTarget(src, dst)
    }
    def remove(n: Long): Unit = {
      checkRef(n, "remove"); ops += GraphOp.RemoveNode(n)
    }

    /** The value `n` would have if this txn committed now: the latest
      * NewNode/SetValue in THIS txn wins; otherwise the snapshot answers.
      * Throws NoSuchElementException like the session's getValue.
      *
      * LAZY-REMOVE PARITY: a RemoveNode does NOT hide the value here,
      * because it does not hide it on the server either —
      * GraphState.withoutNodes strips only INCOMING edges and index
      * entries; the value row (and outgoing edges) survive until vacuum,
      * so committed-state getValue(removed) still answers. The overlay
      * reproduces exactly that, keeping "caught-up snapshot ⇒ reads equal
      * committed-state reads" true for the remove case too (spec-pinned
      * against a post-commit replica read).
      */
    def getValue(n: Long): V = {
      checkRef(n, "getValue")
      val local = ops.reverseIterator.collectFirst {
        case GraphOp.NewNode(r, v) if r == n => v
        case GraphOp.SetValue(m, v) if m == n => v
      }
      local.getOrElse {
        // the answer depends on the SNAPSHOT (no local override) — record
        // the dependency for the apply-time staleness check
        if (n >= 0 && reads.isDefined) valueReads += n
        reads.flatMap(_.getValue(n)).getOrElse(
          throw new NoSuchElementException(
            if (reads.isEmpty)
              s"unknown node $n (no snapshot attached — use submitWithReads)"
            else s"unknown node $n"))
      }
    }

    /** The targets `src` would have if this txn committed now: snapshot
      * edges (tx-local refs start empty) with this txn's add/remove ops
      * replayed in order. Removing a node hides it from every OTHER
      * node's list but keeps its own outgoing list readable — the
      * server's lazy-remove semantics (GraphState.withoutNodes strips
      * incoming edges only; outgoing rows survive until vacuum).
      */
    def targets(src: Long): Seq[Long] = {
      checkRef(src, "targets")
      if (src >= 0 && reads.isDefined) targetReads += src
      val base =
        if (src >= 0) reads.map(_.targets(src).toVector).getOrElse(Vector.empty)
        else Vector.empty
      if (src >= 0 && reads.isDefined) targetMembers ++= base
      ops.foldLeft(base) { (acc, op) =>
        op match {
          case GraphOp.AddTarget(s, d) if s == src =>
            if (acc.contains(d)) acc else acc :+ d
          case GraphOp.RemoveTarget(s, d) if s == src => acc.filterNot(_ == d)
          case GraphOp.RemoveNode(m) if m == src => acc // lazy remove: outgoing kept
          case GraphOp.RemoveNode(m) => acc.filterNot(_ == m)
          case _ => acc
        }
      }
    }
  }

  /** Write client: builds transactions and ships them to the inbox; polls
    * acks for the response leg. One instance per logical client; `clientId`
    * namespaces its txn ids, and a restarted client resumes after its
    * highest shipped seq (scanning inbox + archive + acks), so ids never
    * collide.
    */
  final class Client[V](spark: SparkSession, model: GraphModel[V],
      inboxDir: String, clientId: String) {
    require(clientId.matches("[A-Za-z0-9_-]+"),
      s"clientId '$clientId' must be [A-Za-z0-9_-]+ (it names txn dirs)")

    private val inbox = Paths.get(inboxDir)
    Files.createDirectories(inbox)
    private val mySeq = s"""^${java.util.regex.Pattern.quote(clientId)}-(\\d+)""".r

    private var seq: Long = {
      def seqsIn(p: Path): Seq[Long] =
        if (!Files.isDirectory(p)) Seq.empty
        else GraphStore.listPaths(p)
          .flatMap(f => mySeq.findFirstMatchIn(f.getFileName.toString)
            .flatMap(m => Try(m.group(1).toLong).toOption))
      (seqsIn(inbox) ++ Seq("acks", "applied").flatMap(s => seqsIn(inbox.resolve(s))))
        .maxOption.fold(0L)(_ + 1L)
    }

    /** Ship one transaction; returns its txnId. Published atomically: ops
      * parquet + meta land in a staging dir, then one rename — a reader
      * (the server) sees the whole txn or nothing, the same staged-publish
      * rule as the WAL (GraphStore.writeWalBatch).
      */
    def submit(build: RemoteTxn[V] => Unit): String =
      submitTxn(new RemoteTxn[V](), build)

    /** [[submit]] with a snapshot attached: the builder can interleave
      * [[RemoteTxn.getValue]]/[[RemoteTxn.targets]] reads that see this
      * txn's own uncommitted ops overlaid on `reads` — the reference
      * client's mid-transaction read-then-branch pattern
      * (Client.hs:71-117), without its held write lock.
      */
    def submitWithReads(reads: TxnReads[V])(build: RemoteTxn[V] => Unit): String =
      submitTxn(new RemoteTxn[V](Some(reads)), build)

    private def submitTxn(txn: RemoteTxn[V],
        build: RemoteTxn[V] => Unit): String = {
      build(txn)
      require(txn.ops.nonEmpty, "empty transaction")
      // the server orders txns lexicographically by dir name; a seq wider
      // than the zero-padding would sort BEFORE 999999 and break FIFO —
      // enforce the bound instead of silently reordering
      require(seq < 1000000L,
        s"client '$clientId' exceeded 10^6 shipped txns; use a new clientId")
      val txnId = f"$clientId-$seq%06d"
      val staging = inbox.resolve("_staging").resolve(s"$txnId.txn")
      val target = inbox.resolve(s"$txnId.txn")
      deleteRecursively(staging)
      val rows = txn.ops.toSeq.zipWithIndex.map { case (op, i) =>
        GraphStore.opToRow(model, op, i.toLong)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), GraphStore.opSchema(model))
      // snapshot-read dependencies ride the txn meta so the server can
      // conflict-check at apply time; bounded — interactive reads are
      // handfuls, and an unbounded list would be driver/meta pressure
      val readsJson = txn.readsInfo.map { case ((me, mb), vr, tr, tm) =>
        require(vr.size + tr.size + tm.size <= 10000,
          s"txn read ${vr.size + tr.size + tm.size} distinct nodes; the " +
            "stale-read check ships read ids in the txn meta and caps them " +
            "at 10000")
        s""", "readMark": [$me, $mb]""" +
          s""", "valueReads": [${vr.toSeq.sorted.mkString(", ")}]""" +
          s""", "targetReads": [${tr.toSeq.sorted.mkString(", ")}]""" +
          s""", "targetMembers": [${tm.toSeq.sorted.mkString(", ")}]"""
      }.getOrElse("")
      try {
        df.write.mode(SaveMode.ErrorIfExists).parquet(staging.toString)
        Files.writeString(staging.resolve(MetaName),
          s"""{"formatVersion": ${GraphStore.FormatVersion}, "txnId": "$txnId", "ops": ${txn.ops.size}$readsJson}""")
        Files.createDirectories(target.getParent)
        Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case e: Throwable => deleteRecursively(staging); throw e
      }
      seq += 1
      txnId
    }

    /** Non-blocking ack poll. */
    def ack(txnId: String): Option[TxnAck] = {
      val f = inbox.resolve("acks").resolve(s"$txnId.json")
      if (Files.exists(f)) Some(parseAck(Files.readString(f))) else None
    }

    /** Block until the server acks `txnId` — the synchronous round-trip the
      * reference's client performs per action (Client.hs:71-117); ours is
      * per-txn, which is strictly fewer round-trips.
      */
    def await(txnId: String, timeoutMs: Long = 30000L): TxnAck = {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      var a = ack(txnId)
      while (a.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(10L); a = ack(txnId)
      }
      a.getOrElse(throw new java.util.concurrent.TimeoutException(
        s"no ack for $txnId within ${timeoutMs}ms"))
    }
  }

  // ------------------------------------------------------------- server side

  /** A deterministic poison pill (a txn that fail-stops the serve loop
    * every time it is retried) gets this many apply attempts before it is
    * QUARANTINED: moved aside with a refused ack so the serve loop stays
    * live — the reference server refuses bad client txns with
    * `ClientFailure` without dying (Server.hs:17-69); fail-stopping forever
    * on one bad txn would be a liveness DoS the reference doesn't have.
    * 2 = one retry after the first recovery (transient faults get a second
    * chance; deterministic ones don't loop).
    */
  val MaxApplyAttempts: Int = 2

  /** Per-poll txn-dir load jobs — 1 when the batched read served the whole
    * poll, N on the per-dir fallback. Observability hook for the spec that
    * pins the batched-read claim.
    */
  private[store] var lastPollTxnLoadJobs: Int = 0

  /** Apply every committed, un-acked transaction in `inboxDir` to the open
    * store — the server's worker loop body (Server.hs:17-69). Returns the
    * acks written this poll, in apply order. Call in a loop (or from a
    * scheduler) to serve continuously; [[serveWhile]] wraps exactly that.
    *
    * Poll cost: all txn dirs are loaded in ONE parquet read (split back
    * per-txn by `input_file_name`), all global refs across the poll are
    * existence-checked in ONE job, and all applied txns are made durable by
    * ONE group-committed WAL batch per [[GroupCommitMaxOps]] ops (tagged
    * with every member's ack) — a poll finding N txns runs ~3 jobs +
    * O(N/groupOps) publishes, not O(N).
    */
  def applyPending[V](store: GraphStore[V], inboxDir: String): Seq[TxnAck] = {
    // the fail-stop is mechanical, not advisory: after a mid-txn failure
    // the session may hold a partial txn, and polling again would apply
    // that txn's ops a SECOND time — refuse until the store is reopened
    if (store.remoteApplyPoisoned) throw new IllegalStateException(
      "a previous shipped txn failed mid-apply; reopen the store " +
        "(WAL-prefix recovery) before serving again")
    val inbox = Paths.get(inboxDir)
    val acksDir = inbox.resolve("acks")
    val appliedDir = inbox.resolve("applied")
    Files.createDirectories(acksDir)
    Files.createDirectories(appliedDir)
    if (!Files.isDirectory(inbox)) return Seq.empty

    val tTriage0 = System.nanoTime()
    val committed = GraphStore.listPaths(inbox)
      .filter(p => p.getFileName.toString.endsWith(".txn"))
      // _SUCCESS (Spark's commit marker) + _meta.json are both inside the
      // atomically-renamed dir: present ⇔ fully published; anything else is
      // a foreign partial write — skip, never delete (it's not ours)
      .filter(p => Files.exists(p.resolve("_SUCCESS")) &&
        Files.exists(p.resolve(MetaName)))
      .sortBy(_.getFileName.toString)

    val acks = mutable.ArrayBuffer[TxnAck]()

    // phase 1 — driver-side triage, no Spark jobs: already-acked dirs
    // archive; tagged dirs (applied, ack lost in the crash window) replay
    // their RECORDED ack; repeat poison pills quarantine; version
    // mismatches refuse. Everything else proceeds to the batched load.
    // The meta string read here rides along to applyOne — the stale-read
    // conflict check parses it from THIS read, so an IO error at apply
    // time can never silently skip the check (fail-closed: a triage-time
    // read failure already refused via the version gate below).
    val todo = mutable.ArrayBuffer[(Path, String, String)]()
    committed.foreach { dir =>
      val txnId = dir.getFileName.toString.stripSuffix(".txn")
      val ackFile = acksDir.resolve(s"$txnId.json")
      if (Files.exists(ackFile)) {
        // crash-window recovery leg 1: acked means applied (ack is written
        // after commit) — archive without re-applying. Clear any stale
        // failure strike too (best-effort, non-throwing: the txn is done;
        // this leg is also the backstop for a swallowed delete failure on
        // the apply path, since an acked txn never reaches leg 2)
        archive(dir, appliedDir)
        Try(Files.deleteIfExists(inbox.resolve(FailedDirName).resolve(txnId)))
      } else store.txnTag(txnId) match {
        case Some(recorded) =>
          // crash-window recovery leg 2: the txn's WAL batch is durable and
          // carries its ack as the batch tag (GraphStore.commitTagged), but
          // the crash hit between drain and ack write. Re-applying would
          // mint FRESH global ids for the same newNodes — a duplicated
          // subgraph reachable from root — so replay the recorded ack:
          // the client sees the mapping of the application that is
          // actually durable. Exactly-once restored across the window.
          writeJsonAtomic(ackFile, recorded)
          archive(dir, appliedDir)
          // tagged means durably applied — any failure strike is stale;
          // non-throwing like every marker cleanup (a transient FS error
          // on best-effort cleanup must never kill the serve loop)
          Try(Files.deleteIfExists(inbox.resolve(FailedDirName).resolve(txnId)))
          acks += parseAck(recorded)
        case None if failCount(inbox, txnId) >= MaxApplyAttempts =>
          val n = failCount(inbox, txnId)
          val ack = TxnAck(txnId, applied = false, Map.empty, Some(
            s"quarantined after $n mid-apply failures; txn moved to " +
              "quarantined/ for inspection — a deterministic apply failure " +
              "must not wedge the serve loop"))
          writeJsonAtomic(ackFile, ackJson(ack))
          // same non-throwing replace-aware move as archive(): a stale
          // same-named dir in quarantined/ must not wedge the loop
          archive(dir, inbox.resolve("quarantined"))
          Try(Files.deleteIfExists(inbox.resolve(FailedDirName).resolve(txnId)))
          acks += ack
        case None =>
          val meta = Try(Files.readString(dir.resolve(MetaName))).getOrElse("")
          val version = """"formatVersion":\s*(\d+)""".r.findFirstMatchIn(meta)
            .map(_.group(1).toInt).getOrElse(-1)
          if (version != GraphStore.FormatVersion) {
            val ack = TxnAck(txnId, applied = false, Map.empty, Some(
              s"incompatible format version $version; server speaks " +
                s"${GraphStore.FormatVersion} — the ClientFailure handshake refusal"))
            writeJsonAtomic(ackFile, ackJson(ack))
            archive(dir, appliedDir)
            acks += ack
          } else todo += ((dir, txnId, meta))
      }
    }
    if (todo.isEmpty) return acks.toSeq
    val tLoad0 = System.nanoTime()

    // phase 2 — ONE parquet load over every todo dir (fallback: per-dir)
    val loaded = loadTxns(store, todo.toSeq.map(t => (t._1, t._2)))
    val tExists0 = System.nanoTime()

    // phase 3 — one existence-check job for ALL global refs in the poll;
    // ids created/removed by earlier txns IN this poll are tracked
    // driver-side (the server itself assigns/resolves them), so per-txn
    // validation needs no further jobs
    val allGlobals = loaded.valuesIterator
      .collect { case Right(ops) => ops }.flatten
      .flatMap(refsOf).filter(_ >= 0).toSeq.distinct
    val existsAtStart: Set[Long] =
      if (allGlobals.isEmpty) Set.empty
      else {
        val nodes = store.session.applied().nodes
        val wanted =
          if (allGlobals.size <= 10000) nodes.where(col("id").isin(allGlobals: _*))
          else {
            // a giant in-list stresses codegen; past ~10k ids a broadcast
            // semi-join is the plan that scales (same cutover as
            // GraphReplica.getValues)
            val spark = store.sparkOf
            import spark.implicits._
            nodes.join(broadcast(allGlobals.toDF("id")), Seq("id"), "left_semi")
          }
        wanted.select("id").collect().map(_.getLong(0)).toSet
      }
    val createdThisPoll = mutable.Set[Long]()
    val removedThisPoll = mutable.Set[Long]()
    // ids mutated by txns applied EARLIER IN THIS POLL (their WAL batch is
    // not yet flushed, so mutatedSince cannot see them) — the intra-poll
    // leg of the stale-read conflict check
    val mutatedThisPoll = mutable.Set[Long]()
    // one WAL-suffix scan per distinct snapshot mark per poll
    val mutatedSinceCache =
      mutable.Map[(Long, Long), Either[String, (Set[Long], Set[Long])]]()
    val tApply0 = System.nanoTime()
    var flushNanos = 0L
    var flushCommitNanos = 0L
    var flushDrainNanos = 0L

    // phase 4 — GROUP COMMIT: applied txns' ops accumulate uncommitted in
    // the session op log; one commitTaggedAll per group publishes ONE WAL
    // batch carrying every member's ack tag (batch-durable ⟺ every ack
    // recoverable — recovery legs 1/2 are unchanged because the tag readers
    // parse per line). Ack files and archival happen only AFTER the drain
    // barrier, so no client is ever told "applied" before the WAL has it.
    // This turns the write path's measured bottleneck (one parquet publish
    // per txn, SERVE_r10.json) into one publish per poll; groups are capped
    // at [[GroupCommitMaxOps]] session ops so a huge poll flushes in bounded
    // driver-memory chunks. Refusals mutate nothing and are deterministic,
    // so they ack+archive immediately, outside the group.
    val group = mutable.ArrayBuffer[(Path, String, TxnAck)]()
    var groupOps = 0
    // a prior multi-member flush failure left the guilty txn unknown: this
    // poll flushes per-txn (bound 0) so any deterministic pill fails alone
    // and strikes toward quarantine while innocents commit normally
    val perTxnMode = Files.exists(inbox.resolve(FailedDirName).resolve(FlushFailedMarker))
    val flushBound = if (perTxnMode) 0 else GroupCommitMaxOps
    def flushGroup(): Unit = if (group.nonEmpty) {
      val tF0 = System.nanoTime()
      try {
        store.commitTaggedAll(group.map(g => ackJson(g._3)).toSeq)
        flushCommitNanos += System.nanoTime() - tF0
        // a BUFFERED store acknowledges commit() at enqueue; the acks'
        // durable-after-WAL promise requires the drain barrier (no-op on an
        // unbuffered store) — otherwise a crash could lose txns the clients
        // were told were applied
        val tD0 = System.nanoTime()
        store.drain()
        flushDrainNanos += System.nanoTime() - tD0
      } catch {
        case scala.util.control.NonFatal(e) =>
          // a failed group flush leaves COMPLETE txns' ops in the session
          // log uncommitted — polling again would apply them a SECOND time
          // on top of the first application's ops, so fail-stop exactly as
          // a mid-apply throw does (reopen = WAL-prefix recovery = rollback,
          // next poll re-applies; no ack was written, exactly-once holds).
          // Strike attribution: a single-member flush IS attributable, so
          // it records the member's strike toward quarantine. A multi-
          // member flush is not — instead of striking innocents, drop a
          // poll-level marker that forces the NEXT poll into per-txn
          // flushes: a deterministic commit-time pill then fails ALONE,
          // strikes individually, and quarantines after the usual
          // [[MaxApplyAttempts]] while every innocent member commits —
          // liveness without collateral refusals
          if (group.size == 1) recordFailure(inbox, group.head._2)
          else Try {
            Files.createDirectories(inbox.resolve(FailedDirName))
            Files.writeString(
              inbox.resolve(FailedDirName).resolve(FlushFailedMarker), "1")
          }
          store.remoteApplyPoisoned = true
          throw new ApplyFailedException(group.head._2, e)
      }
      group.foreach { case (dir, txnId, ack) =>
        store.recordTxnTag(txnId, ackJson(ack))
        writeJsonAtomic(acksDir.resolve(s"$txnId.json"), ackJson(ack))
        // a SUCCESSFUL apply clears any prior failure marker: a txn that
        // fail-stopped once transiently and then succeeded must not carry
        // that strike toward quarantine forever. Best-effort and
        // NON-throwing: the txn is durably committed at this point, so a
        // transient FS error here must not be recorded as a NEW strike
        // (the acked-txn triage leg also clears markers whenever a crash
        // leaves the dir in the inbox; a marker that survives a swallowed
        // delete AND a completed archive merely costs one earlier
        // quarantine strike if its txnId is ever reused after an operator
        // purge — bounded, and strictly better than poisoning)
        Try(Files.deleteIfExists(inbox.resolve(FailedDirName).resolve(txnId)))
        archive(dir, appliedDir)
      }
      group.clear()
      groupOps = 0
      flushNanos += System.nanoTime() - tF0
    }
    todo.foreach { case (dir, txnId, meta) =>
      val ack = applyOne(store, inbox, txnId, meta, loaded(txnId),
        existsAtStart, createdThisPoll, removedThisPoll,
        mutatedThisPoll, mutatedSinceCache)
      if (ack.applied) {
        group += ((dir, txnId, ack))
        groupOps += loaded(txnId).toOption.map(_.size).getOrElse(0)
        if (groupOps >= flushBound) flushGroup()
      } else {
        writeJsonAtomic(acksDir.resolve(s"$txnId.json"), ackJson(ack))
        archive(dir, appliedDir)
      }
      acks += ack
    }
    flushGroup()
    // every flush of this poll landed: the per-txn degradation (if any) did
    // its job — the next poll group-commits again
    if (perTxnMode)
      Try(Files.deleteIfExists(inbox.resolve(FailedDirName).resolve(FlushFailedMarker)))
    val tEnd = System.nanoTime()
    lastPollPhaseNanos = Map(
      "triage" -> (tLoad0 - tTriage0), "load" -> (tExists0 - tLoad0),
      "exists" -> (tApply0 - tExists0), "flush" -> flushNanos,
      "flushCommit" -> flushCommitNanos, "flushDrain" -> flushDrainNanos,
      "apply" -> (tEnd - tApply0 - flushNanos))
    acks.toSeq
  }

  /** Wall-clock breakdown of the last [[applyPending]] poll that reached
    * phase 2 — diagnostic only (ServeBench, perf probes).
    */
  private[graft] var lastPollPhaseNanos: Map[String, Long] = Map.empty

  /** Session-op cap per group-commit flush: bounds the size of the single
    * WAL batch a poll publishes (driver-built, one partition — the same
    * driver-memory contract as the replay bound). Tunable per deployment
    * via -Dgraft.write.groupOps; a var only as a chunking test seam.
    */
  private[graft] var GroupCommitMaxOps: Int =
    sys.props.get("graft.write.groupOps")
      .flatMap(s => Try(s.toInt).toOption).getOrElse(100000)

  /** Serve loop: poll-and-apply every `pollMs` until `keepGoing` turns
    * false. The minimal continuous server — a caller owning the store runs
    * this on a side thread, exactly the reference's accept-loop shape.
    *
    * Thread discipline: while this loop runs, the serving thread IS the
    * store's writer — the owner must not mutate the session from another
    * thread concurrently (GraphSession is single-writer by design, the
    * same exclusive write lock the reference takes per txn,
    * Nonpersistent.hs:51-56). Pause the loop (keepGoing → false, rejoin)
    * around owner-side writes, or route them through a [[Client]].
    */
  def serveWhile[V](store: GraphStore[V], inboxDir: String, pollMs: Long = 50L)(
      keepGoing: () => Boolean): Unit =
    while (keepGoing()) {
      applyPending(store, inboxDir)
      Thread.sleep(pollMs)
    }

  private val FailedDirName = "_failed"

  /** Poll-level marker under [[FailedDirName]]: a multi-member group flush
    * failed, guilty member unknown — the next poll flushes per-txn to
    * attribute it. Cannot collide with a txn strike file: txnIds are
    * `<clientId>-<seq>` and this name carries no `-<seq>` suffix.
    */
  private val FlushFailedMarker = "_flush"

  /** Mid-apply failure count for a txn — durable across store reopens
    * (markers live in the inbox, not the store), feeding the quarantine
    * threshold [[MaxApplyAttempts]].
    */
  private def failCount(inbox: Path, txnId: String): Int =
    Try(Files.readString(inbox.resolve(FailedDirName).resolve(txnId)).trim.toInt)
      .getOrElse(0)

  private def recordFailure(inbox: Path, txnId: String): Unit = {
    val d = inbox.resolve(FailedDirName)
    Files.createDirectories(d)
    Files.writeString(d.resolve(txnId), (failCount(inbox, txnId) + 1).toString)
  }

  /** Node ids an op REFERENCES (newNode defines, it doesn't reference). */
  private def refsOf[V](op: GraphOp[V]): Seq[Long] = op match {
    case GraphOp.NewNode(_, _) => Seq.empty
    case GraphOp.SetValue(id, _) => Seq(id)
    case GraphOp.AddTarget(s, d) => Seq(s, d)
    case GraphOp.RemoveTarget(s, d) => Seq(s, d)
    case GraphOp.RemoveNode(id) => Seq(id)
  }

  /** Load + decode every todo txn dir: ONE parquet read over all dirs on
    * the fast path (rows split back per-txn by file name, re-ordered by
    * seq driver-side), falling back to per-dir reads when the batched load
    * fails (foreign schema in one dir must not poison its neighbors) or
    * the poll's total rows exceed the driver bound (so a single oversized
    * txn gets its typed per-txn refusal, not a whole-poll error).
    * `Left` = refusal message; `Right` = decoded ops in seq order.
    */
  private def loadTxns[V](store: GraphStore[V], todo: Seq[(Path, String)])
      : Map[String, Either[String, Seq[GraphOp[V]]]] = {
    val bound = GraphStore.maxReplayBatchRows
    def decode(rows: Seq[Row], txnId: String): Either[String, Seq[GraphOp[V]]] =
      if (rows.length > bound)
        Left(s"txn exceeds $bound ops; shipped txns are driver-sized by " +
          "contract — use commitBulk for bulk ingest")
      else Try(rows.map(r => GraphStore.rowToOp(store.modelOf, r))).toEither
        .left.map(e => s"undecodable txn: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("")}")
    def perDir(): Map[String, Either[String, Seq[GraphOp[V]]]] = {
      lastPollTxnLoadJobs = todo.size
      todo.map { case (dir, txnId) =>
        txnId -> (Try {
          store.sparkOf.read.parquet(dir.toString)
            .select("seq", "op", "id", "src", "dst", "kind", "value")
            .orderBy("seq").limit(bound + 1).collect().toSeq
        }.toEither.left.map(e => s"undecodable txn: ${e.getClass.getSimpleName}: " +
          s"${Option(e.getMessage).getOrElse("")}")
          .flatMap(rows => decode(rows, txnId)))
      }.toMap
    }
    val batched = Try {
      val TxnOf = """.*/([^/]+)\.txn/[^/]*$""".r
      val rows = store.sparkOf.read.parquet(todo.map(_._1.toString): _*)
        .select(col("seq"), col("op"), col("id"), col("src"), col("dst"),
          col("kind"), col("value"), input_file_name().as("_file"))
        .limit(bound + 1).collect()
      if (rows.length > bound) None // poll exceeds the driver bound: attribute per-dir
      else Some(rows.toSeq.groupBy(r => r.getString(7) match {
        case TxnOf(id) => id
        case other => other
      }))
    }.toOption.flatten
    batched match {
      case Some(byTxn) =>
        lastPollTxnLoadJobs = 1
        todo.map { case (_, txnId) =>
          val rows = byTxn.getOrElse(txnId, Seq.empty)
            .sortBy(_.getLong(0)).map(r => Row(r.toSeq.dropRight(1): _*))
          txnId -> decode(rows, txnId)
        }.toMap
      case None => perDir()
    }
  }

  /** Parse the optional snapshot-read stamp out of a shipped txn's meta:
    * (mark, value-read ids, targets-read ids, observed target members).
    * Absent for txns built without reads (or against an unstamped
    * snapshot) — those apply optimistically, the pre-r16 contract.
    */
  private[store] def parseReadInfo(meta: String)
      : Option[((Long, Long), Set[Long], Set[Long], Set[Long])] = {
    def ids(k: String): Set[Long] =
      (s""""$k":\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(meta)
        .map(m => """-?\d+""".r.findAllIn(m.group(1)).map(_.toLong).toSet)
        .getOrElse(Set.empty)
    """"readMark":\s*\[\s*(-?\d+)\s*,\s*(-?\d+)\s*\]""".r
      .findFirstMatchIn(meta)
      .map(m => ((m.group(1).toLong, m.group(2).toLong),
        ids("valueReads"), ids("targetReads"), ids("targetMembers")))
  }

  private def applyOne[V](store: GraphStore[V], inbox: Path, txnId: String,
      meta: String, loaded: Either[String, Seq[GraphOp[V]]],
      existsAtStart: Set[Long],
      createdThisPoll: mutable.Set[Long],
      removedThisPoll: mutable.Set[Long],
      mutatedThisPoll: mutable.Set[Long],
      mutatedSinceCache: mutable.Map[(Long, Long),
        Either[String, (Set[Long], Set[Long])]]): TxnAck = {
    def refused(msg: String) = TxnAck(txnId, applied = false, Map.empty, Some(msg))
    loaded match {
      case Left(msg) => refused(msg)
      case Right(ops) if ops.isEmpty => refused("empty shipped txn")
      case Right(ops) =>
        // structural validation BEFORE any state change (txn atomicity):
        // every negative ref must be defined by a prior newNode in this
        // txn, no ref may point at a node this txn already removed, and —
        // the reference server's ClientFailure posture, Server.hs:17-69 —
        // every GLOBAL ref must exist in the store: a bad global id must
        // be a typed refusal up front, because discovering it mid-apply
        // (the session's unknown-id guard) would fail-stop the serve loop
        // on a purely client-side mistake, and on retry fail-stop it
        // again — a deterministic liveness DoS
        val defined = mutable.Set[Long]()
        val removedHere = mutable.Set[Long]()
        var invalid: Option[String] = None
        val it = ops.iterator
        while (invalid.isEmpty && it.hasNext) it.next() match {
          case GraphOp.NewNode(id, _) =>
            if (id >= 0)
              invalid = Some(s"shipped newNode must use a negative tx-local ref, got $id")
            else if (defined(id)) invalid = Some(s"duplicate tx-local ref $id")
            else defined += id
          case op =>
            val refs = refsOf(op)
            refs.find(r => r < 0 && !defined(r)).foreach(r =>
              invalid = Some(s"op references undefined tx-local ref $r"))
            if (invalid.isEmpty)
              refs.find(removedHere).foreach(r =>
                invalid = Some(s"op references node $r removed earlier in this txn"))
            if (invalid.isEmpty) op match {
              case GraphOp.RemoveNode(id) => removedHere += id
              case _ => ()
            }
        }
        if (invalid.isDefined) return refused(invalid.get)
        // encode probe: a value the store model cannot re-encode would
        // otherwise throw at COMMIT time, where group commit cannot
        // attribute the failure to a member (see flushGroup) — catching it
        // here turns a deterministic poison pill into a typed refusal
        // BEFORE any mutation. Values round-tripped through the client's
        // parquet shipping normally re-encode fine; this guards asymmetric
        // models. Cost: one extra encode of value-carrying ops, driver-side
        ops.foreach {
          case op @ (GraphOp.NewNode(_, _) | GraphOp.SetValue(_, _)) =>
            Try(GraphStore.opToRow(store.modelOf, op, 0L)) match {
              case scala.util.Failure(e) =>
                return refused(s"op value not encodable by the store model: ${e.getMessage}")
              case _ => ()
            }
          case _ => ()
        }
        val missing = ops.flatMap(refsOf).filter(_ >= 0).distinct.filterNot(r =>
          (existsAtStart(r) || createdThisPoll(r)) && !removedThisPoll(r))
        if (missing.nonEmpty)
          return refused(s"ops reference unknown or removed global ids: " +
            missing.take(8).mkString(", "))

        // STALE-READ CONFLICT CHECK (the apply-time stand-in for the
        // reference's reads-under-the-held-write-lock serializability,
        // GraphDB.hs:288-289): a txn that shipped snapshot-read
        // dependencies is refused if any node it READ was mutated by a
        // txn committed after its snapshot mark — the lost-update shape
        // that previously applied silently. Value reads conflict with
        // set/rm of the read id (and add/rmt of its target list);
        // targets reads additionally conflict with removals of members
        // the read actually OBSERVED (a removed node disappears from
        // every other node's list without naming it; the observed
        // members ship with the txn, so an unrelated removal elsewhere
        // in the graph does NOT refuse the txn). The meta string is the
        // one phase-1 triage read — never re-read here, so there is no
        // apply-time IO failure mode that could silently SKIP this check
        // (the previous Try(readString).getOrElse("") failed OPEN).
        parseReadInfo(meta).foreach { case (mark, vReads, tReads, tMembers) =>
          mutatedSinceCache.getOrElseUpdate(mark, store.mutatedSince(mark)) match {
            case Left(msg) =>
              return refused(s"stale-read conflict check failed ($msg); " +
                "rebuild the txn from a fresh snapshot")
            case Right((mutated, removed)) =>
              val mutAll = mutated ++ mutatedThisPoll
              val removedAll = removed ++ removedThisPoll
              val hit = (vReads ++ tReads).filter(mutAll) ++
                tMembers.filter(removedAll)
              if (hit.nonEmpty)
                return refused("stale-read conflict: node(s) " +
                  hit.toSeq.sorted.take(8).mkString(", ") +
                  " mutated after the snapshot this txn read from — " +
                  "rebuild the txn from a fresh snapshot")
          }
        }

        // apply as one local txn (the reference worker's interpret loop),
        // resolving ordinals to fresh global ids as newNode executes.
        // IMPORTANT: from the first session mutation on, failures are
        // FAIL-STOP, not refusals — a refused ack after mutation would lie
        // (the mutated ops sit in the session op log and a LATER txn's
        // commit would persist them while the client was told "refused").
        // A throw here leaves the txn un-acked in the inbox; the owner must
        // reopen the store (WAL-prefix recovery), after which the next poll
        // re-applies the txn from scratch — the same fail-stop discipline
        // as the buffered WAL worker (GraphStore walFailure). Under group
        // commit, earlier applied-but-unflushed txns of the SAME group are
        // equally un-acked and uncommitted, so the reopen rolls them back
        // too and the next poll re-applies them — no ack was written, so
        // exactly-once is preserved for every group member. The failure
        // marker feeds the quarantine threshold: a txn that fail-stops
        // [[MaxApplyAttempts]] times is moved aside on the next poll.
        val session = store.session
        val mapping = mutable.Map[Long, Long]()
        def resolve(x: Long): Long = if (x < 0) mapping(x) else x
        try {
          ops.foreach {
            case GraphOp.NewNode(ref, v) => mapping(ref) = session.newNode(v)
            case GraphOp.SetValue(id, v) => session.setValue(resolve(id), v)
            case GraphOp.AddTarget(s, d) => session.addTarget(resolve(s), resolve(d))
            case GraphOp.RemoveTarget(s, d) => session.removeTarget(resolve(s), resolve(d))
            case GraphOp.RemoveNode(id) => session.remove(resolve(id))
          }
          val ack = TxnAck(txnId, applied = true, mapping.toMap, None)
          // the ops now sit in the session op log, UNCOMMITTED: durability
          // (one WAL batch tagged with every member's ack — batch-durable
          // ⟺ ack-recoverable, see applyPending's recovery leg 2) is the
          // caller's GROUP flush, so a poll of N applied txns pays one
          // parquet publish, not N
          createdThisPoll ++= mapping.values
          removedThisPoll ++= ops.collect { case GraphOp.RemoveNode(id) => resolve(id) }
          mutatedThisPoll ++= ops.collect {
            case GraphOp.SetValue(id, _) => resolve(id)
            case GraphOp.AddTarget(s, _) => resolve(s)
            case GraphOp.RemoveTarget(s, _) => resolve(s)
            case GraphOp.RemoveNode(id) => resolve(id)
          }
          ack
        } catch {
          case scala.util.control.NonFatal(e) =>
            recordFailure(inbox, txnId)
            store.remoteApplyPoisoned = true
            throw new ApplyFailedException(txnId, e)
        }
    }
  }

  /** Archive a txn dir, NON-THROWING (the marker-cleanup discipline):
    * `Files.move(REPLACE_EXISTING)` cannot replace a non-empty directory
    * (DirectoryNotEmptyException), so a same-named dir already present in
    * the target (operator restore, purged-then-reused clientId) would
    * otherwise throw out of every poll's triage and wedge the serve loop.
    * The stale target is deleted first — it is superseded by construction
    * (txn dirs are identified by txnId; the occurrence being archived is
    * the one the inbox just processed) — and if the move STILL fails the
    * dir moves to a uniquified sibling, or stays in the inbox for the next
    * poll's triage (which re-classifies it correctly from its ack/tag).
    */
  private def archive(dir: Path, appliedDir: Path): Unit = {
    val moved = Try {
      Files.createDirectories(appliedDir)
      val target = appliedDir.resolve(dir.getFileName)
      if (Files.exists(target)) deleteRecursively(target)
      Files.move(dir, target, StandardCopyOption.REPLACE_EXISTING)
    }
    if (moved.isFailure)
      (1 to 3).iterator
        .map(i => Try(Files.move(dir,
          appliedDir.resolve(s"${dir.getFileName}-dup$i"))))
        .find(_.isSuccess)
    ()
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) GraphStore.listPaths(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
