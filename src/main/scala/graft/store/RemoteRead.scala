package graft.store

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._
import scala.util.Try

import graft.graph.{GraphModel, IndexKey}

/** Thin-client READ shipping — the serve/client read-action analog
  * (/root/reference/library/GraphDB/Client.hs:71-117 runs every read
  * action as a request/response round-trip against the server;
  * Server.hs:17-94 dispatches it on a session worker). The Spark-suitable
  * form keeps the reference's thin-client contract — the client holds ZERO
  * graph state — but serves from a [[GraphReplica]] follower instead of
  * the writer's worker pool, and transports over the same shared-storage
  * inbox as [[RemoteWrite]] (the deployment's natural medium; a bespoke
  * socket protocol is Spark Connect's job):
  *
  * {{{
  *   <dir>/<clientId>-<seq>.req.json    one read request (atomic publish)
  *   <dir>/acks/<reqId>/                parquet answer (atomic dir rename;
  *                                      _SUCCESS inside ⇔ complete)
  *   <dir>/acks/<reqId>.err.json        typed refusal (unknown id etc.)
  * }}}
  *
  * Request ops mirror the served read surface: `getValues` (batched —
  * the single-id round-trip of the reference is its scalability defect,
  * so the protocol is batched-first and `getValue` is the 1-element
  * case), `getTargets` under an index key, `targets`, `sources`,
  * `getStats`. Answers are parquet (the exact value fidelity of the
  * checkpoint format — any `valueSchema` round-trips), one Spark job per
  * request on each side: that IS the per-action round-trip cost model of
  * the reference, which is why a read-heavy deployment runs a local
  * [[GraphReplica]] instead; this exists so the THIN-client posture has a
  * runnable analog too.
  *
  * Consistency: answers reflect the serving replica's state at dispatch —
  * WAL-prefix-ordered, eventually consistent, same as any follower read.
  */
object RemoteRead {

  /** One client's view of a completed read — either the answer DataFrame
    * or the server's typed refusal message.
    */
  final case class ReadAck(reqId: String, result: Either[String, DataFrame])

  private def writeJsonAtomic(target: Path, json: String): Unit = {
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replaceAll("[\r\n]", " ")

  // ------------------------------------------------------------- client side

  /** Read client: ships read requests, awaits parquet answers. `spark` is
    * used only to READ answers — the client runs no graph logic at all
    * (the reference's typed thin client, Client.hs:53-60).
    */
  final class Client[V](spark: SparkSession, model: GraphModel[V],
      dir: String, clientId: String) {
    require(clientId.matches("[A-Za-z0-9_-]+"),
      s"clientId '$clientId' must be [A-Za-z0-9_-]+ (it names request files)")
    private val base = Paths.get(dir)
    Files.createDirectories(base)
    private val mySeq = s"""^${java.util.regex.Pattern.quote(clientId)}-(\\d+)""".r
    private var seq: Long = {
      def seqsIn(p: Path): Seq[Long] =
        if (!Files.isDirectory(p)) Seq.empty
        else GraphStore.listPaths(p)
          .flatMap(f => mySeq.findFirstMatchIn(f.getFileName.toString)
            .flatMap(m => Try(m.group(1).toLong).toOption))
      (seqsIn(base) ++ seqsIn(base.resolve("acks"))).maxOption.fold(0L)(_ + 1L)
    }

    private def submit(body: String): String = {
      require(seq < 1000000L,
        s"client '$clientId' exceeded 10^6 requests; use a new clientId")
      val reqId = f"$clientId-$seq%06d"
      writeJsonAtomic(base.resolve(s"$reqId.req.json"),
        s"""{"reqId": "$reqId", $body}""")
      seq += 1
      reqId
    }

    /** Batched point reads (covers the reference's getValue as the
      * 1-element case). Returns id → value for ids that exist.
      */
    def getValues(ids: Seq[Long], timeoutMs: Long = 30000L): Map[Long, V] = {
      val reqId = submit(
        s""""op": "getValues", "ids": [${ids.mkString(", ")}]""")
      rows(await(reqId, timeoutMs))
        .map(r => r.getLong(0) -> model.fromValueRow(r.getString(1), r.getStruct(2)))
        .toMap
    }

    /** getValue — throws on an unknown id, the session contract. */
    def getValue(id: Long, timeoutMs: Long = 30000L): V =
      getValues(Seq(id), timeoutMs).getOrElse(id,
        throw new NoSuchElementException(s"unknown node id $id"))

    /** getTargets under an index key (distinct), served from the index. */
    def getTargets(id: Long, k: IndexKey, timeoutMs: Long = 30000L): Seq[Long] = {
      val reqId = submit(s""""op": "getTargets", "id": $id, """ +
        s""""kkind": "${esc(k.kind)}", "key": "${esc(k.key)}"""")
      rows(await(reqId, timeoutMs)).map(_.getLong(0)).sorted
    }

    /** traverseTargets — distinct targets regardless of key. */
    def targets(id: Long, timeoutMs: Long = 30000L): Seq[Long] = {
      val reqId = submit(s""""op": "targets", "id": $id""")
      rows(await(reqId, timeoutMs)).map(_.getLong(0)).sorted
    }

    /** traverseSources. */
    def sources(id: Long, timeoutMs: Long = 30000L): Seq[Long] = {
      val reqId = submit(s""""op": "sources", "id": $id""")
      rows(await(reqId, timeoutMs)).map(_.getLong(0)).sorted
    }

    /** getStats of the closure reachable from `from`. */
    def getStats(from: Long = 0L, timeoutMs: Long = 30000L): (Long, Long, Long) = {
      val reqId = submit(s""""op": "getStats", "id": $from""")
      val r = rows(await(reqId, timeoutMs)).head
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    private def rows(ack: ReadAck) = ack.result match {
      case Right(df) => df.collect().toSeq
      case Left(err) => throw new NoSuchElementException(
        s"read ${ack.reqId} refused: $err")
    }

    /** Block until the server answers `reqId`. */
    def await(reqId: String, timeoutMs: Long = 30000L): ReadAck = {
      val ansDir = base.resolve("acks").resolve(reqId)
      val errFile = base.resolve("acks").resolve(s"$reqId.err.json")
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (System.nanoTime() < deadline) {
        if (Files.exists(errFile)) {
          val msg = """"error":\s*"((?:[^"\\]|\\.)*)"""".r
            .findFirstMatchIn(Files.readString(errFile))
            .map(_.group(1)).getOrElse("unknown error")
          return ReadAck(reqId, Left(msg))
        }
        if (Files.exists(ansDir.resolve("_SUCCESS")))
          return ReadAck(reqId, Right(spark.read.parquet(ansDir.toString)))
        Thread.sleep(10L)
      }
      throw new java.util.concurrent.TimeoutException(
        s"no answer for $reqId within ${timeoutMs}ms")
    }
  }

  // ------------------------------------------------------------- server side

  /** Answer every unanswered request in `dir` from the replica's current
    * state — the read-dispatch loop body (Server.hs:17-69 for reads).
    * Returns the request ids answered this poll. The caller owns freshness:
    * interleave `replica.catchUp()` in its serve loop at the staleness
    * budget it wants.
    */
  def answerPending[V](replica: GraphReplica[V], dir: String): Seq[String] = {
    val base = Paths.get(dir)
    if (!Files.isDirectory(base)) return Seq.empty
    val acks = base.resolve("acks")
    Files.createDirectories(acks)
    val pending = GraphStore.listPaths(base)
      .filter(_.getFileName.toString.endsWith(".req.json"))
      .sortBy(_.getFileName.toString)
      .filter { p =>
        val reqId = p.getFileName.toString.stripSuffix(".req.json")
        !Files.exists(acks.resolve(reqId).resolve("_SUCCESS")) &&
          !Files.exists(acks.resolve(s"$reqId.err.json"))
      }
    pending.map { p =>
      val reqId = p.getFileName.toString.stripSuffix(".req.json")
      try {
        val req = Files.readString(p)
        def fld(k: String): Option[String] = {
          val r = ("\"" + java.util.regex.Pattern.quote(k) +
            "\":\\s*(\"(?:[^\"\\\\]|\\\\.)*\"|[^,}\\s]+)").r
          r.findFirstMatchIn(req)
            .map(_.group(1).stripPrefix("\"").stripSuffix("\"")
              // inverse of the client's esc(): unescape quote then
              // backslash, the parseAck order — a key containing quotes
              // must match the index verbatim, not its escaped spelling
              .replace("\\\"", "\"").replace("\\\\", "\\"))
        }
        val st = replica.currentState
        val answer: DataFrame = fld("op").getOrElse("?") match {
          case "getValues" =>
            val ids = """"ids":\s*\[([^\]]*)\]""".r.findFirstMatchIn(req)
              .map(m => """-?\d+""".r.findAllIn(m.group(1)).map(_.toLong).toSeq)
              .getOrElse(Seq.empty)
            require(ids.size <= 100000, "getValues request exceeds 100k ids")
            if (ids.isEmpty)
              st.nodes.select(col("id"), col("kind"), col("value")).limit(0)
            else {
              // same 10k cutover as GraphReplica.getValues: a giant
              // in-list stresses codegen; a broadcast semi-join scales
              val wanted =
                if (ids.size <= 10000) st.nodes.where(col("id").isin(ids: _*))
                else {
                  val spark = st.nodes.sparkSession
                  import spark.implicits._
                  st.nodes.join(broadcast(ids.toDF("id")), Seq("id"), "left_semi")
                }
              wanted.select(col("id"), col("kind"), col("value"))
            }
          case "getTargets" =>
            st.index.where(col("src") === fld("id").get.toLong &&
                col("kkind") === fld("kkind").get && col("key") === fld("key").get)
              .select(col("dst").as("id")).distinct()
          case "targets" =>
            st.edges.where(col("src") === fld("id").get.toLong)
              .select(col("dst").as("id")).distinct()
          case "sources" =>
            st.edges.where(col("dst") === fld("id").get.toLong)
              .select(col("src").as("id")).distinct()
          case "getStats" =>
            val (n, e, i) = replica.getStats(fld("id").fold(0L)(_.toLong))
            val spark = st.nodes.sparkSession
            import spark.implicits._
            Seq((n, e, i)).toDF("nodes", "edges", "index")
          case other =>
            throw new IllegalArgumentException(s"unknown read op '$other'")
        }
        // staged atomic publish, same rule as every other inbox artifact:
        // the client sees a complete answer dir or nothing. A target dir
        // without _SUCCESS is debris from a dead server — clear it so the
        // retry succeeds instead of refusing on a name collision.
        val staging = base.resolve("_staging").resolve(reqId)
        val target = acks.resolve(reqId)
        deleteRecursively(staging)
        if (Files.exists(target) && !Files.exists(target.resolve("_SUCCESS")))
          deleteRecursively(target)
        answer.coalesce(1).write
          .mode(org.apache.spark.sql.SaveMode.ErrorIfExists)
          .parquet(staging.toString)
        Files.move(staging, target, StandardCopyOption.ATOMIC_MOVE)
      } catch {
        case scala.util.control.NonFatal(e) =>
          writeJsonAtomic(acks.resolve(s"$reqId.err.json"),
            s"""{"reqId": "$reqId", "error": "${esc(
              s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")}"}""")
      }
      reqId
    }
  }

  /** Serve loop: catch the replica up, answer, repeat — the read-side
    * accept loop. `catchUpEvery` bounds staleness (0 = every poll).
    */
  def serveWhile[V](replica: GraphReplica[V], dir: String, pollMs: Long = 50L,
      catchUpEvery: Int = 10)(keepGoing: () => Boolean): Unit = {
    var i = 0
    while (keepGoing()) {
      if (catchUpEvery == 0 || i % math.max(1, catchUpEvery) == 0)
        replica.catchUp()
      answerPending(replica, dir)
      Thread.sleep(pollMs)
      i += 1
    }
  }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) GraphStore.listPaths(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }
}
