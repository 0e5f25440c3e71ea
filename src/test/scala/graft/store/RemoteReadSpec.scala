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
    val reqs = Files.list(java.nio.file.Paths.get(inbox)).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(reqs)
      .asScala.map(_.getFileName.toString).filter(_.endsWith(".req.json")).toSet
    assert(names === Set("re-000000.req.json", "re-000001.req.json"))
    store.close()
  }
}
