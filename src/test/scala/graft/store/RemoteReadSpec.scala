package graft.store

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.graph._

/** Thin-client read-shipping suite — the serve/client READ-action analog
  * (reference Client.hs:71-117 request/response per read): a client
  * holding zero graph state ships read requests over the inbox and gets
  * parquet answers served from a replica; unknown ops/ids are typed
  * refusals; re-polling never re-answers.
  */
class RemoteReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def storeWithData() = {
    val dir = Files.createTempDirectory("graft-rr-store-").toString
    val store = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val g = store.session
    val mj = g.newNode(Artist(1, "Michael Jackson"))
    val bj = g.newNode(Song("Billie Jean"))
    g.addTarget(g.root, mj)
    g.addTarget(g.root, bj)
    g.addTarget(bj, mj)
    store.commit()
    (store, dir, mj, bj)
  }

  test("thin client: every read op round-trips against a replica server") {
    val (store, dir, mj, bj) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = Files.createTempDirectory("graft-rr-inbox-").toString
    val client = new RemoteRead.Client(spark, CatalogueModel, inbox, "thin")

    @volatile var serving = true
    val server = new Thread(() =>
      RemoteRead.serveWhile(replica, inbox, pollMs = 20L,
        catchUpEvery = 0)(() => serving))
    server.start()
    try {
      // the client's answers == the owner's session reads, action by action
      assert(client.getValue(mj) === Artist(1, "Michael Jackson"))
      assert(client.getValues(Seq(mj, bj, 424242L)) ===
        Map(mj -> Artist(1, "Michael Jackson"), bj -> Song("Billie Jean")),
        "batched read: unknown ids absent, not errors")
      assert(client.getTargets(store.session.root,
        IndexKey("Catalogue_Artist_Name", "Michael Jackson")) === Seq(mj))
      assert(client.targets(bj) === Seq(mj))
      assert(client.sources(mj).sorted === Seq(store.session.root, bj).sorted)
      assert(client.getStats() === store.session.getStats())
      // single-id contract: unknown id throws, like the session
      intercept[NoSuchElementException](client.getValue(999999L))
      // the server keeps serving after refusals AND sees live writes once
      // the replica catches up (the serve loop interleaves catchUp)
      val tw = store.session.newNode(Song("Thriller"))
      store.session.addTarget(store.session.root, tw)
      store.commit()
      // eventually consistent BY CONTRACT (follower reads): a request can
      // race the serve loop's catchUp and be answered from the pre-commit
      // state — retry with fresh requests until the write is visible
      val deadline = System.nanoTime() + 60L * 1000000000L
      var got = Option.empty[Cat]
      while (got.isEmpty && System.nanoTime() < deadline) {
        got = client.getValues(Seq(tw), timeoutMs = 60000L).get(tw)
        if (got.isEmpty) Thread.sleep(100L)
      }
      assert(got === Some(Song("Thriller")),
        "a committed write must become client-visible via the tailing replica")
    } finally {
      serving = false
      server.join(10000)
    }
    store.close()
  }

  test("unknown op is a typed refusal; answers are idempotent on re-poll") {
    val (store, dir, _, _) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = java.nio.file.Paths.get(
      Files.createTempDirectory("graft-rr-bad-").toString)
    // a foreign request with an op this server does not speak
    Files.writeString(inbox.resolve("alien-000000.req.json"),
      """{"reqId": "alien-000000", "op": "dropEverything"}""")
    val answered = RemoteRead.answerPending(replica, inbox.toString)
    assert(answered === Seq("alien-000000"))
    val err = Files.readString(
      inbox.resolve("acks").resolve("alien-000000.err.json"))
    assert(err.contains("unknown read op"))
    // second poll: already answered — nothing re-served
    assert(RemoteRead.answerPending(replica, inbox.toString).isEmpty)
    store.close()
  }

  test("restarted client resumes its seq after answered requests") {
    val (store, dir, mj, _) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = Files.createTempDirectory("graft-rr-seq-").toString
    val c1 = new RemoteRead.Client(spark, CatalogueModel, inbox, "re")
    // submit + answer one request (inline serve, no thread needed)
    val answerer = new Thread(() => {
      Thread.sleep(100L); RemoteRead.answerPending(replica, inbox); ()
    })
    answerer.start()
    assert(c1.getValues(Seq(mj))(mj) === Artist(1, "Michael Jackson"))
    answerer.join(10000)
    // a NEW client instance with the same id scans the answered request
    // and must NOT reuse seq 0 (its request file may already be consumed)
    val c2 = new RemoteRead.Client(spark, CatalogueModel, inbox, "re")
    val answerer2 = new Thread(() => {
      Thread.sleep(100L); RemoteRead.answerPending(replica, inbox); ()
    })
    answerer2.start()
    assert(c2.getStats() === store.session.getStats())
    answerer2.join(10000)
    // answered requests are ARCHIVED out of the inbox (poll cost stays
    // O(pending)); the archive is what the restarted client's seq scan saw
    val answered = GraphStore.listPaths(
      java.nio.file.Paths.get(inbox).resolve("answered"))
      .map(_.getFileName.toString).filter(_.endsWith(".req.json")).toSet
    assert(answered === Set("re-000000.req.json", "re-000001.req.json"))
    assert(GraphStore.listPaths(java.nio.file.Paths.get(inbox))
      .forall(!_.getFileName.toString.endsWith(".req.json")),
      "no answered request may linger in the inbox listing")
    store.close()
  }

  test("N same-op requests answer with O(1) Spark jobs (batched poll)") {
    val (store, dir, mj, bj) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = java.nio.file.Paths.get(
      Files.createTempDirectory("graft-rr-batch-").toString)
    val client = new RemoteRead.Client(spark, CatalogueModel, inbox.toString, "jb")
    // 6 getValues (one of them all-unknown ids → empty answer) + 2 targets,
    // written directly so ONE poll sees them all
    (0 until 6).foreach { i =>
      val ids = if (i == 5) "424242" else s"$mj, $bj"
      Files.writeString(inbox.resolve(f"jb-$i%06d.req.json"),
        s"""{"reqId": "jb-00000$i", "op": "getValues", "ids": [$ids]}""")
    }
    Files.writeString(inbox.resolve("jb-000006.req.json"),
      s"""{"reqId": "jb-000006", "op": "targets", "id": $bj}""")
    Files.writeString(inbox.resolve("jb-000007.req.json"),
      s"""{"reqId": "jb-000007", "op": "targets", "id": $mj}""")
    // malformed member of a batchable group: missing its id field — must
    // get its OWN typed refusal without poisoning the group's batch
    Files.writeString(inbox.resolve("jb-000008.req.json"),
      """{"reqId": "jb-000008", "op": "getTargets", "kkind": "K"}""")

    spark.sparkContext.setJobGroup("rr-batched-poll", "batched read poll")
    val answered =
      try RemoteRead.answerPending(replica, inbox.toString)
      finally spark.sparkContext.clearJobGroup()
    assert(answered.size === 9)
    assert(client.await("jb-000008", 5000L).result.isLeft,
      "a malformed batchable request is an individual refusal")

    // structural proof of batching: every answer is a POINTER into a
    // shared batch dir — no per-request parquet dir was written at all
    val acks = inbox.resolve("acks")
    val ptrs = GraphStore.listPaths(acks)
      .map(_.getFileName.toString).filter(_.endsWith(".ptr.json"))
    assert(ptrs.size === 8, s"expected 8 pointer answers, got $ptrs")
    val batches = GraphStore.listPaths(acks.resolve("batches"))
      .map(_.getFileName.toString)
    assert(batches.toSet === Set("jb-000000", "jb-000006"),
      "one batch dir per op group, named after the group's first request")

    // job-count proof: 8 requests, ≤ 6 jobs — O(op groups), not O(N).
    // Each group is ONE logical write; AQE materializes its shuffle
    // stages as extra "jobs" (the targets group's distinct costs ~3),
    // where the per-request path would pay that PER REQUEST (≥ 8 writes
    // plus per-request AQE stages). The status tracker is fed
    // asynchronously — poll until the count is stable.
    def jobs() = spark.sparkContext.statusTracker
      .getJobIdsForGroup("rr-batched-poll").length
    var last = -1
    var stableSince = System.nanoTime()
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (System.nanoTime() < deadline &&
        (jobs() != last || System.nanoTime() - stableSince < 1000000000L)) {
      if (jobs() != last) { last = jobs(); stableSince = System.nanoTime() }
      Thread.sleep(50L)
    }
    assert(last >= 1 && last <= 6, s"batched poll used $last jobs for 8 requests")

    // pointer answers round-trip with full value fidelity, including the
    // all-unknown request (empty result, schema intact)
    (0 until 5).foreach { i =>
      val ack = client.await(f"jb-$i%06d", timeoutMs = 5000L)
      val got = ack.result.toOption.get.collect()
        .map(r => r.getLong(0) -> CatalogueModel.fromValueRow(
          r.getString(1), r.getStruct(2))).toMap
      assert(got === Map(mj -> Artist(1, "Michael Jackson"),
        bj -> Song("Billie Jean")))
    }
    assert(client.await("jb-000005", 5000L).result.toOption.get.count() === 0L,
      "all-unknown getValues answers empty WITH schema, not an error")
    assert(client.await("jb-000006", 5000L).result.toOption.get.collect()
      .map(_.getLong(0)).toSeq === Seq(mj))
    assert(client.await("jb-000007", 5000L).result.toOption.get.count() === 0L)
    // re-poll: pointer answers count as answered
    assert(RemoteRead.answerPending(replica, inbox.toString).isEmpty)
    store.close()
  }

  test("property: batched poll and per-request answers are row-identical") {
    val (store, dir, mj, bj) = storeWithData()
    val root = store.session.root
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ids = Seq(root, mj, bj, 424242L) // known AND unknown ids
    val genReq: Gen[String] = Gen.frequency(
      3 -> Gen.someOf(ids).map(s =>
        s""""op": "getValues", "ids": [${s.mkString(", ")}]"""),
      2 -> Gen.oneOf(ids).map(id => s""""op": "targets", "id": $id"""),
      2 -> Gen.oneOf(ids).map(id => s""""op": "sources", "id": $id"""),
      2 -> Gen.oneOf(ids).map(id => s""""op": "getTargets", "id": $id, """ +
        s""""kkind": "Catalogue_Artist_Name", "key": "Michael Jackson""""),
      1 -> Gen.const(""""op": "getStats", "id": 0"""))
    val genSet: Gen[List[String]] =
      Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, genReq))
    // raw scalacheck Gen with fixed seeds (scalatestplus is not in the
    // offline cache) — deterministic across runs, seeds printed on failure
    (1 to 5).foreach { i =>
      val bodies = genSet(Gen.Parameters.default, Seed(1000L + i))
        .getOrElse(sys.error(s"gen failed for seed ${1000L + i}"))
      // cap -1 forces EVERY group through the per-request fallback; the
      // huge cap keeps every group on the batched join path
      def runWith(cap: Int): Map[String, Either[String, Seq[String]]] = {
        val inbox = java.nio.file.Paths.get(
          Files.createTempDirectory("graft-rr-prop-").toString)
        bodies.zipWithIndex.foreach { case (b, j) =>
          Files.writeString(inbox.resolve(f"pp-$j%06d.req.json"),
            s"""{"reqId": "pp-$j%06d", $b}""")
        }
        RemoteRead.answerPendingBounded(replica, inbox.toString, cap)
        val reader = new RemoteRead.Client(spark, CatalogueModel, inbox.toString, "rd")
        bodies.indices.map { j =>
          val reqId = f"pp-$j%06d"
          reqId -> reader.await(reqId, timeoutMs = 5000L).result
            .map(df => df.collect().map(_.toString).sorted.toSeq)
        }.toMap
      }
      assert(runWith(1000000) === runWith(-1),
        s"batched != per-request for seed ${1000L + i}: $bodies")
    }
    store.close()
  }

  test("retention sweeps orphaned batch dirs and keeps referenced ones") {
    val (store, dir, mj, bj) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = java.nio.file.Paths.get(
      Files.createTempDirectory("graft-rr-ret-").toString)
    val client = new RemoteRead.Client(spark, CatalogueModel, inbox.toString, "rt")
    (0 until 2).foreach { i =>
      Files.writeString(inbox.resolve(f"rt-$i%06d.req.json"),
        s"""{"reqId": "rt-00000$i", "op": "getValues", "ids": [$mj, $bj]}""")
    }
    assert(RemoteRead.answerPending(replica, inbox.toString).size === 2)
    val acks = inbox.resolve("acks")
    val live = acks.resolve("batches").resolve("rt-000000")
    assert(Files.exists(live))
    // plant the crash shape: a batch dir a poll published, then died
    // before writing ANY pointer — no pointer references it, ever
    val orphan = acks.resolve("batches").resolve("zz-000000")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-00000.parquet"), "debris")
    RemoteRead.retention(inbox.toString)
    assert(!Files.exists(orphan), "unreferenced batch dir must be swept")
    assert(Files.exists(live), "pointer-referenced batch dir must survive")
    // pointer answers still resolve identically after the sweep
    val got = client.await("rt-000001", timeoutMs = 5000L)
      .result.toOption.get.collect()
      .map(r => r.getLong(0) -> CatalogueModel.fromValueRow(
        r.getString(1), r.getStruct(2))).toMap
    assert(got === Map(mj -> Artist(1, "Michael Jackson"),
      bj -> Song("Billie Jean")))
    store.close()
  }

  test("answered/ compacts past the bound; seq resume survives compaction") {
    val (store, dir, mj, _) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = java.nio.file.Paths.get(
      Files.createTempDirectory("graft-rr-cpt-").toString)
    (0 until 6).foreach { i =>
      Files.writeString(inbox.resolve(f"cp-$i%06d.req.json"),
        s"""{"reqId": "cp-00000$i", "op": "getValues", "ids": [$mj]}""")
    }
    assert(RemoteRead.answerPending(replica, inbox.toString).size === 6)
    val answered = inbox.resolve("answered")
    assert(GraphStore.listPaths(answered)
      .count(_.getFileName.toString.endsWith(".req.json")) === 6)
    RemoteRead.retention(inbox.toString, maxAnswered = 4)
    assert(GraphStore.listPaths(answered)
      .count(_.getFileName.toString.endsWith(".req.json")) === 0,
      "past the bound, archived request files compact into _seq.json")
    val seqJson = Files.readString(answered.resolve("_seq.json"))
    assert(seqJson.contains("\"cp\": 5"))
    // below the bound nothing compacts (the map is not rewritten for a
    // handful of stragglers)
    RemoteRead.retention(inbox.toString, maxAnswered = 4)
    assert(seqJson === Files.readString(answered.resolve("_seq.json")))
    // a restarted client must get its seq from the compacted map ALONE —
    // even with every acks artifact consumed and cleared, seq 0..5 are
    // burned and the next request must be cp-000006
    RemoteRead.deleteRecursively(inbox.resolve("acks"))
    val c2 = new RemoteRead.Client(spark, CatalogueModel, inbox.toString, "cp")
    val answerer = new Thread(() => {
      Thread.sleep(100L); RemoteRead.answerPending(replica, inbox.toString); ()
    })
    answerer.start()
    assert(c2.getValues(Seq(mj))(mj) === Artist(1, "Michael Jackson"))
    answerer.join(10000)
    val artifacts = (GraphStore.listPaths(inbox.resolve("acks")) ++
      GraphStore.listPaths(answered)).map(_.getFileName.toString)
    assert(artifacts.exists(_.startsWith("cp-000006")),
      s"restarted client must resume at seq 6 from _seq.json, saw: $artifacts")
    store.close()
  }

  test("batch publish failure after the dir move sweeps the orphan and falls back") {
    val (store, dir, mj, bj) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = java.nio.file.Paths.get(
      Files.createTempDirectory("graft-rr-orph-").toString)
    val client = new RemoteRead.Client(spark, CatalogueModel, inbox.toString, "or")
    (0 until 2).foreach { i =>
      Files.writeString(inbox.resolve(f"or-$i%06d.req.json"),
        s"""{"reqId": "or-00000$i", "op": "getValues", "ids": [$mj, $bj]}""")
    }
    // die AFTER the atomic batch-dir move, BEFORE any pointer write: the
    // published dir is unreferenced — it must be swept, not leaked forever
    RemoteRead.failNextBatchPublish = true
    val answered = RemoteRead.answerPending(replica, inbox.toString)
    assert(answered.size === 2)
    val acks = inbox.resolve("acks")
    assert(GraphStore.listPaths(acks)
      .forall(!_.getFileName.toString.endsWith(".ptr.json")),
      "no pointer may reference the failed batch")
    assert(!Files.exists(acks.resolve("batches").resolve("or-000000")),
      "the unreferenced published batch dir must be swept on fallback")
    (0 until 2).foreach { i =>
      val got = client.await(f"or-$i%06d", timeoutMs = 5000L)
        .result.toOption.get.collect()
        .map(r => r.getLong(0) -> CatalogueModel.fromValueRow(
          r.getString(1), r.getStruct(2))).toMap
      assert(got === Map(mj -> Artist(1, "Michael Jackson"),
        bj -> Song("Billie Jean")),
        "fallback answers must be identical to the batched form's")
    }
    assert(RemoteRead.answerPending(replica, inbox.toString).isEmpty)
    store.close()
  }

  test("oversized group falls back to per-request answers with identical results") {
    val (store, dir, mj, bj) = storeWithData()
    val replica = GraphReplica.bootstrap(spark, CatalogueModel, dir)
    replica.catchUp()
    val inbox = java.nio.file.Paths.get(
      Files.createTempDirectory("graft-rr-fb-").toString)
    val client = new RemoteRead.Client(spark, CatalogueModel, inbox.toString, "fb")
    (0 until 3).foreach { i =>
      Files.writeString(inbox.resolve(f"fb-$i%06d.req.json"),
        s"""{"reqId": "fb-00000$i", "op": "getValues", "ids": [$mj, $bj]}""")
    }
    // cap of 1 pair: the 6-pair group exceeds it → every request answered
    // on the per-request path, with the group's results unchanged
    val answered = RemoteRead.answerPendingBounded(replica, inbox.toString, 1)
    assert(answered.size === 3)
    val acks = inbox.resolve("acks")
    assert(GraphStore.listPaths(acks)
      .forall(!_.getFileName.toString.endsWith(".ptr.json")),
      "fallback must not publish pointer answers")
    (0 until 3).foreach { i =>
      val ack = client.await(f"fb-$i%06d", timeoutMs = 5000L)
      val got = ack.result.toOption.get.collect()
        .map(r => r.getLong(0) -> CatalogueModel.fromValueRow(
          r.getString(1), r.getStruct(2))).toMap
      assert(got === Map(mj -> Artist(1, "Michael Jackson"),
        bj -> Song("Billie Jean")),
        "per-request fallback answers must equal the batched form's")
    }
    assert(RemoteRead.answerPending(replica, inbox.toString).isEmpty)
    store.close()
  }
}
