package graft.store

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.graph._

import scala.jdk.CollectionConverters._
import scala.util.Random

/** Persistence suite mirroring the reference's StorageTests + the
  * restart-equivalence API property
  * (/root/reference/executables/InternalTests/StorageTests.hs:55-144,
  * /root/reference/executables/APITests.hs:52-68).
  */
class GraphStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tmpDir(): Path = Files.createTempDirectory("graft-store-")

  test("fresh store → mutate → close → reopen restores identical state") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val g1 = s1.session
    val michael = g1.newNode(Artist(1, "Michael Jackson"))
    val bj = g1.newNode(Song("Billie Jean"))
    g1.addTarget(g1.root, michael)
    g1.addTarget(g1.root, bj)
    g1.addTarget(bj, michael)
    val statsBefore = g1.getStats()
    s1.close()

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(s2.session.getStats() === statsBefore)
    assert(s2.session.getValue(michael) === Artist(1, "Michael Jackson"))
    assert(s2.session.getTargets(s2.session.root,
      IndexKey("Catalogue_Artist_Name", "Michael Jackson")) === Seq(michael))
    s2.close()
  }

  test("uncheckpointed events replay on reopen (crash recovery)") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val a = s1.session.newNode(Artist(7, "Prince"))
    s1.session.addTarget(s1.session.root, a)
    s1.commit() // events on disk, NO checkpoint
    s1.abandon() // simulated crash: lock drops, no checkpoint written

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    assert(s2.session.getValue(a) === Artist(7, "Prince"))
    s2.close()
  }

  test("orphaned subgraphs are vacuumed at checkpoint (reachability scope)") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val linked = s1.session.newNode(Artist(1, "Kept"))
    val orphanSrc = s1.session.newNode(Song("OrphanSong"))
    val orphanDst = s1.session.newNode(Artist(2, "OrphanArtist"))
    s1.session.addTarget(s1.session.root, linked)
    s1.session.addTarget(orphanSrc, orphanDst) // island, unreachable from root
    assert(s1.session.getStats() === ((2L, 1L, 2L)))
    s1.close()

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    // the island must be gone from the persisted nodes entirely
    assert(s2.session.applied().nodes.count() === 2L)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    s2.close()
  }

  test("file naming/archival rules: N.checkpoint, N.events, archive/") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    s1.session.addTarget(s1.session.root, s1.session.newNode(Artist(1, "A")))
    s1.close()
    assert(Files.exists(dir.resolve("1.checkpoint")))
    assert(Files.exists(dir.resolve("archive/1.events")))
    assert(!Files.exists(dir.resolve("1.events")))

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    s2.session.addTarget(s2.session.root, s2.session.newNode(Artist(2, "B")))
    s2.close()
    assert(Files.exists(dir.resolve("2.checkpoint")))
    assert(Files.exists(dir.resolve("archive/1.checkpoint")))
    assert(Files.exists(dir.resolve("archive/2.events")))
    assert(!Files.exists(dir.resolve("1.checkpoint")))

    val s3 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s3.session.getStats() === ((3L, 2L, 4L)))
    s3.close()
  }

  test("store dir stays bounded across many open/close cycles") {
    // the reference's cleanup contract (Rules.hs:7-25): superseded files
    // move to archive/, the live dir holds exactly one checkpoint, and
    // nothing (staging debris, stale events, duplicate checkpoints)
    // accumulates per cycle — the property that keeps a long-lived store
    // from growing without bound in its HOT path
    val dir = tmpDir()
    val N = 5
    (1 to N).foreach { i =>
      val s = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
      s.session.addTarget(s.session.root, s.session.newNode(Artist(i, s"A$i")))
      s.close()
    }
    def entries(p: Path): Seq[String] =
      if (!Files.exists(p)) Seq.empty
      else Files.list(p).iterator().asScala.map(_.getFileName.toString).toSeq
    val root = entries(dir)
    // exactly ONE live checkpoint — the newest generation
    assert(root.filter(_.endsWith(".checkpoint")) === Seq(s"$N.checkpoint"))
    // every events dir was archived at its close; none linger live
    assert(!root.exists(_.endsWith(".events")))
    // a clean close leaves no staging debris behind
    assert(entries(dir.resolve("_staging")).isEmpty)
    // the archive holds exactly the superseded history — N-1 checkpoints
    // and N event generations, not duplicates re-accumulated per cycle
    val archived = entries(dir.resolve("archive"))
    assert(archived.count(_.endsWith(".checkpoint")) === N - 1)
    assert(archived.count(_.endsWith(".events")) === N)
    // and the surviving state is the full history
    val s = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s.session.getStats()._1 === N + 1L) // root + N artists
    s.close()
  }

  test("bulk edge commit: distributed WAL batch, set-wise replay, restart-stable") {
    import org.apache.spark.sql.functions.col
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val g = s1.session
    val artists = (1 to 20).map(i => g.newNode(Artist(i, s"artist-$i")))
    val songs = (1 to 20).map(i => g.newNode(Song(s"song-$i")))
    import spark.implicits._
    // root→everything plus song→artist, as one distributed delta (with
    // duplicates — commitBulk dedupes like addTarget's idempotence)
    val edges = ((artists ++ songs).map(n => (g.root, n)) ++
      songs.zip(artists) ++ songs.zip(artists)).toDF("src", "dst")
    s1.commitBulk(edges)
    val stats = g.getStats()
    // 41 nodes; 40 root edges + 20 song→artist = 60; index: artists@root
    // 2 keys (20×2) + songs@root 1 key (20) + Song_Artist (20) = 80
    assert(stats === ((41L, 60L, 80L)))
    val bulkDirs = java.nio.file.Files.list(dir.resolve("1.events"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(bulkDirs.exists(_.endsWith("-bulk")), s"bulk batch dir expected, got $bulkDirs")
    s1.abandon() // crash BEFORE checkpoint: reopen must replay the bulk batch set-wise

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.session.getStats() === stats)
    assert(s2.session.targets(songs.head).toSet === Set(artists.head))
    s2.close()

    val s3 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s3.session.getStats() === stats) // checkpoint round-trip too
    s3.close()
  }

  test("torn WAL batch (no _SUCCESS) is dropped on reopen, not replayed") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = s1.session.newNode(Artist(5, "Kept"))
    s1.session.addTarget(s1.session.root, a)
    s1.commit()
    s1.abandon() // crash without checkpoint

    // simulate a crash mid-commit: a batch dir with parquet debris but no
    // _SUCCESS marker (Spark writes the marker only on commit)
    val torn = dir.resolve("1.events").resolve("batch-000001")
    Files.createDirectories(torn)
    Files.writeString(torn.resolve("part-00000.parquet"), "garbage")

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    assert(!Files.exists(torn), "torn batch debris must be deleted")
    s2.close()
  }

  test("partial checkpoint (no _meta.json) falls back to the previous one") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = s1.session.newNode(Artist(3, "Kept"))
    s1.session.addTarget(s1.session.root, a)
    s1.close() // committed 1.checkpoint

    // a crash mid-close leaves a newer checkpoint dir WITHOUT the
    // _meta.json commit marker (it is written last) — open must skip and
    // delete it, not throw on the incomplete parquet dirs
    val partial = dir.resolve("5.checkpoint")
    Files.createDirectories(partial.resolve("nodes"))
    Files.writeString(partial.resolve("nodes").resolve("part-00000"), "garbage")

    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    assert(s2.session.getValue(a) === Artist(3, "Kept"))
    assert(!Files.exists(partial), "partial checkpoint debris must be deleted")
    s2.close()
  }

  test("torn _meta.json (truncated marker) is a PARTIAL checkpoint, not id reset") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = s1.session.newNode(Artist(3, "Kept"))
    s1.session.addTarget(s1.session.root, a)
    s1.close() // committed 1.checkpoint
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val b = s2.session.newNode(Song("Later"))
    s2.session.addTarget(s2.session.root, b)
    s2.commit() // 2.events durable
    s2.abandon() // crash DURING a close that got as far as...
    // ...a checkpoint dir whose marker flushed TRUNCATED — it exists but
    // the nextId field is gone (the legacy non-atomic-write crash shape;
    // close() now publishes the marker atomically, but an old or tampered
    // store can still present this). Treating it as committed would
    // default the id watermark to 0: a DUPLICATE root row and every later
    // newNode colliding with existing ids (silent corruption).
    val torn = dir.resolve("2.checkpoint")
    Files.createDirectories(torn)
    Files.writeString(torn.resolve("_meta.json"), """{"formatVersion": 1, "nex""")
    val s3 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    // fell back to checkpoint 1 + replay of the live 2.events — intact
    assert(s3.session.getValue(a) === Artist(3, "Kept"))
    assert(s3.session.getValue(b) === Song("Later"))
    // the id watermark survived: a fresh node gets a FRESH id
    val c = s3.session.newNode(Genre("fresh"))
    assert(c > b, s"watermark must not reset (got id $c after $b)")
    assert(s3.session.applied().nodes
      .where(org.apache.spark.sql.functions.col("id") === 0L).count() === 1L,
      "exactly one root row — no duplicate from a watermark reset")
    s3.close()
  }

  test("close() is retryable over debris from a failed prior attempt") {
    val dir = tmpDir()
    val store = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = store.session.newNode(Artist(7, "Persist"))
    store.session.addTarget(store.session.root, a)
    // simulate an earlier close() that died mid-checkpoint: the dir holds a
    // partial table and NO _meta.json; without clearing, close()'s
    // ErrorIfExists write would fail on every retry with the lock held
    val debris = dir.resolve("1.checkpoint")
    Files.createDirectories(debris.resolve("nodes"))
    Files.writeString(debris.resolve("nodes").resolve("part-00000"), "junk")
    store.close() // must clear the meta-less debris and commit cleanly
    val reopened = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(reopened.session.getValue(a) === Artist(7, "Persist"))
    reopened.close()
  }

  test("close() retry after a POST-publish failure skips the rewrite; store is sealed") {
    val dir = tmpDir().toString
    val store = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val a = store.session.newNode(Artist(8, "Sealed"))
    store.session.addTarget(store.session.root, a)
    val stats = store.session.getStats()
    // prior failure shape #2: the atomic _meta.json publish SUCCEEDED,
    // then close() died (transient cleanUp error). Before the fix, every
    // retried close() failed forever on the ErrorIfExists checkpoint
    // writes with the dir lock still held.
    store.failNextCleanUp = true
    intercept[RuntimeException](store.close())
    // the committed checkpoint shadows this index's events on reopen, so
    // a commit after it would be silently lost — sealed: typed refusal
    store.session.newNode(Song("Too Late"))
    val eSeal = intercept[IllegalArgumentException](store.commit())
    assert(eSeal.getMessage.contains("sealed"))
    store.close() // retry: skips the rewrite, archives, releases the lock
    val reopened = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(reopened.session.getValue(a) === Artist(8, "Sealed"))
    assert(reopened.session.getStats() === stats,
      "the post-seal op must NOT have leaked into the durable state")
    reopened.close()
  }

  test("a sealed store whose marker later vanished re-enters the rewrite on retry") {
    val dir = tmpDir().toString
    val store = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val a = store.session.newNode(Artist(10, "Unsealed"))
    store.session.addTarget(store.session.root, a)
    store.failNextCleanUp = true
    intercept[RuntimeException](store.close()) // marker published → sealed
    // external delete of the marker (tamper, torn disk): the committed
    // checkpoint no longer exists as a record — retry must UNSEAL and
    // rewrite, not die in requireNotSealed forever with the lock held
    Files.delete(java.nio.file.Paths.get(dir)
      .resolve("1.checkpoint").resolve("_meta.json"))
    store.close()
    val reopened = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(reopened.session.getValue(a) === Artist(10, "Unsealed"))
    reopened.close()
  }

  test("txn tags with embedded newlines resolve identically before and after archival") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = s1.session.newNode(Artist(11, "Newline"))
    s1.session.addTarget(s1.session.root, a)
    val rawTag = "{\"txnId\": \"nl-000001\",\n  \"applied\": true}"
    val norm = rawTag.replaceAll("[\r\n]+", " ").trim
    s1.commitTagged(Some(rawTag))
    // force the lazy cache through the LIVE-dir walk branch
    assert(s1.txnTag("nl-000001") === Some(norm),
      "live walk must flatten/trim exactly as the archival sidecar will")
    s1.close() // archives with the sidecar index
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.txnTag("nl-000001") === Some(norm),
      "the tag a client reads must be stable across archival")
    s2.close()
  }

  test("shipped-txn tags: archived dirs are read via the one-file index, pre-index via walk") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = s1.session.newNode(Artist(9, "Tagged"))
    s1.session.addTarget(s1.session.root, a)
    val tag = """{"txnId": "cli-000001", "applied": true, "mapping": {"-1": 5}}"""
    s1.commitTagged(Some(tag))
    s1.session.newNode(Song("Untagged"))
    s1.commitTagged(None)
    s1.close() // archives 1.events WITH its tag index sidecar

    val sidecar = dir.resolve("archive").resolve("1.events")
      .resolve(GraphStore.TxnTagIndexName)
    assert(Files.exists(sidecar), "archival must write the tag index sidecar")
    assert(Files.readString(sidecar).contains("cli-000001"))

    // recovery reads the SIDECAR, not the batch dirs: poison every
    // per-batch _txnmeta.json under the archive — the tag must still load
    GraphStore.listPaths(dir.resolve("archive").resolve("1.events"))
      .filter(p => p.getFileName.toString.startsWith("batch-"))
      .foreach { b =>
        val m = b.resolve("_txnmeta.json")
        if (Files.exists(m)) Files.writeString(m, """{"txnId": "WRONG"}""")
      }
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.txnTag("cli-000001") === Some(tag),
      "archived tags must resolve via the one-file index")
    assert(s2.txnTag("WRONG").isEmpty)
    s2.close()

    // a PRE-INDEX store (no sidecar anywhere) still recovers via the walk
    Files.delete(sidecar)
    // undo the poison so the walk finds the original tag
    GraphStore.listPaths(dir.resolve("archive").resolve("1.events"))
      .filter(p => p.getFileName.toString.startsWith("batch-"))
      .foreach { b =>
        val m = b.resolve("_txnmeta.json")
        if (Files.exists(m)) Files.writeString(m, tag)
      }
    val s3 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s3.txnTag("cli-000001") === Some(tag),
      "a store from before the sidecar existed must recover via the batch walk")
    s3.close()
  }

  test("second concurrent open is rejected by the dir lock") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val e = intercept[IllegalStateException] {
      GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    }
    assert(e.getMessage.contains("locked"))
    s1.close()
    // after close the lock is released and reopen works
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    s2.close()
  }

  test("time-travel snapshots: archived checkpoints stay readable, lock-free") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    s1.session.addTarget(s1.session.root, s1.session.newNode(Artist(1, "A")))
    s1.close() // checkpoint 1
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    s2.session.addTarget(s2.session.root, s2.session.newNode(Artist(2, "B")))
    s2.close() // checkpoint 2; checkpoint 1 archived

    assert(GraphStore.snapshots(dir) === Seq(1L, 2L))
    val v1 = GraphStore.snapshot(spark, CatalogueModel, dir, 1L)
    val v2 = GraphStore.snapshot(spark, CatalogueModel, dir, 2L)
    assert(v1.stats(0L) === ((2L, 1L, 2L)))
    assert(v2.stats(0L) === ((3L, 2L, 4L)))

    // snapshot reads take no lock: works while a writer holds the store
    val s3 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(GraphStore.snapshot(spark, CatalogueModel, dir, 2L)
      .stats(0L) === ((3L, 2L, 4L)))
    s3.close()

    intercept[NoSuchElementException] {
      GraphStore.snapshot(spark, CatalogueModel, dir, 99L)
    }
  }

  test("durability property: crash loses exactly the uncommitted suffix") {
    val rnd = new Random(7)
    (1 to 2).foreach { _ =>
      val dir = tmpDir().toString
      val store = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
      val g = store.session
      val nodes = scala.collection.mutable.ArrayBuffer[Long]()
      store.commit()
      var committedStats = g.getStats()
      (1 to 18).foreach { i =>
        rnd.nextInt(4) match {
          case 0 | 1 =>
            val n = g.newNode(Song(s"s-$i")); g.addTarget(g.root, n); nodes += n
          case 2 if nodes.nonEmpty =>
            g.setValue(nodes(rnd.nextInt(nodes.size)), Song(s"s-$i'"))
          case _ if nodes.nonEmpty =>
            g.remove(nodes(rnd.nextInt(nodes.size)))
          case _ => ()
        }
        if (rnd.nextInt(3) == 0) {
          store.commit()
          committedStats = g.getStats()
        }
      }
      store.abandon() // crash: everything after the last commit is gone
      val re = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
      assert(re.session.getStats() === committedStats,
        "reopen must restore exactly the last committed state")
      re.close()
    }
  }

  test("failed WAL publish is retryable: slot not poisoned, retry succeeds") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val a = s1.session.newNode(Artist(1, "Retry"))
    s1.session.addTarget(s1.session.root, a)
    s1.failNextWalPublish = true
    val e = intercept[RuntimeException] { s1.commit() }
    assert(e.getMessage.contains("injected"))
    // the ops are still drainable and the batch slot is clean — the retry
    // (and close(), which commits) must succeed, per the docstring promise
    // mirroring /root/reference/library/GraphDB/Storage.hs:154-177
    s1.commit()
    s1.abandon() // crash without checkpoint: reopen replays the retried batch
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    assert(s2.session.getValue(a) === Artist(1, "Retry"))
    s2.close()
  }

  test("unmarked batch debris in the events dir cannot poison commit") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    // debris squatting on the exact slot the next commit will use — the
    // old (pre-staging) failure mode where ErrorIfExists then fails every
    // retry including close()
    val debris = dir.resolve("1.events").resolve("batch-000000")
    Files.createDirectories(debris)
    Files.writeString(debris.resolve("part-00000.parquet"), "garbage")
    val a = s1.session.newNode(Artist(2, "Wins"))
    s1.session.addTarget(s1.session.root, a)
    s1.commit() // must clear the unmarked debris and publish
    assert(Files.exists(debris.resolve("_SUCCESS")))
    s1.close()
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    s2.close()
  }

  test("format version gate refuses a bumped-version store with a typed error") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    s1.session.addTarget(s1.session.root, s1.session.newNode(Artist(1, "A")))
    s1.close()
    val meta = dir.resolve("1.checkpoint").resolve("_meta.json")
    val original = Files.readString(meta)
    assert(original.contains(s""""formatVersion": ${GraphStore.FormatVersion}"""))
    Files.writeString(meta,
      original.replace(s""""formatVersion": ${GraphStore.FormatVersion}""",
        """"formatVersion": 99"""))
    val e = intercept[GraphStore.IncompatibleStoreFormatException] {
      GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    }
    assert(e.found === 99)
    // refusal is read-only: restoring the stamp makes the store usable again
    Files.writeString(meta, original)
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    s2.close()
  }

  test("buffered WAL: commit acks before publish; drain/close make it durable") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString,
      buffered = true)
    val gate = new java.util.concurrent.CountDownLatch(1)
    s1.stallWal(gate)
    val a = s1.session.newNode(Artist(1, "Buffered"))
    s1.session.addTarget(s1.session.root, a)
    s1.commit()
    // the worker is parked, yet commit returned — proof the parquet write
    // is off the caller; nothing has been published
    assert(!Files.exists(dir.resolve("1.events")),
      "commit must not publish synchronously in buffered mode")
    gate.countDown()
    s1.drain()
    assert(Files.exists(
      dir.resolve("1.events").resolve("batch-000000").resolve("_SUCCESS")))
    s1.close()
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    assert(s2.session.getStats() === ((2L, 1L, 2L)))
    assert(s2.session.getValue(a) === Artist(1, "Buffered"))
    s2.close()
  }

  test("buffered WAL crash loses exactly the buffered suffix (prefix property)") {
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir,
      buffered = true)
    val g = s1.session
    val a = g.newNode(Artist(1, "Durable"))
    g.addTarget(g.root, a)
    s1.commit()
    s1.drain() // batch 0 durable
    val durableStats = g.getStats()
    val gate = new java.util.concurrent.CountDownLatch(1)
    s1.stallWal(gate)
    val b = g.newNode(Song("Lost"))
    g.addTarget(g.root, b)
    s1.commit() // acked, queued behind the stalled worker — never published
    s1.abandon() // crash: the buffered suffix dies with the process
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(s2.session.getStats() === durableStats,
      "reopen must restore exactly the durable prefix")
    s2.close()
  }

  test("buffered WAL preserves driver-op/bulk batch order through the queue") {
    import spark.implicits._
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir,
      buffered = true)
    val g = s1.session
    val gate = new java.util.concurrent.CountDownLatch(1)
    s1.stallWal(gate)
    // driver ops then a bulk delta while the worker is parked: commitBulk
    // must flush the driver ops as batch 0 and enqueue the bulk batch
    // AFTER them — a bulk batch overtaking queued driver ops would survive
    // a crash as a non-prefix WAL
    val a = g.newNode(Artist(1, "First"))
    g.addTarget(g.root, a)
    val b = g.newNode(Song("Second"))
    val edges = Seq((g.root, b), (b, a)).toDF("src", "dst")
    s1.commitBulk(edges)
    assert(!Files.exists(Paths.get(dir, "1.events")), "nothing published while parked")
    gate.countDown()
    s1.drain()
    val batches = Files.list(Paths.get(dir, "1.events")).iterator().asScala
      .map(_.getFileName.toString).toSeq.sorted
    assert(batches === Seq("batch-000000", "batch-000001-bulk"))
    val stats = g.getStats()
    s1.abandon() // replay path (no checkpoint) must reproduce the same state
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(s2.session.getStats() === stats)
    assert(s2.session.targets(b).toSet === Set(a))
    s2.close()
  }

  test("buffered durability property: reopen lands on a commit boundary ≥ last drain") {
    val rnd = new Random(13)
    val dir = tmpDir().toString
    val store = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir,
      buffered = true)
    val g = store.session
    val nodes = scala.collection.mutable.ArrayBuffer[Long]()
    // stats at every commit boundary; a crash may surface ANY boundary at
    // or after the last drain (the worker may have flushed batches beyond
    // the last barrier before the crash)
    store.commit(); store.drain()
    val boundaries = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)](g.getStats())
    var lastDrain = 0
    (1 to 12).foreach { i =>
      rnd.nextInt(3) match {
        case 0 =>
          val n = g.newNode(Song(s"s-$i")); g.addTarget(g.root, n); nodes += n
        case 1 if nodes.nonEmpty =>
          g.setValue(nodes(rnd.nextInt(nodes.size)), Song(s"s-$i'"))
        case _ =>
          val n = g.newNode(Artist(i, s"a-$i")); g.addTarget(g.root, n); nodes += n
      }
      if (rnd.nextInt(2) == 0) { store.commit(); boundaries += g.getStats() }
      if (rnd.nextInt(4) == 0) { store.drain(); lastDrain = boundaries.size - 1 }
    }
    store.abandon() // crash with possibly-queued batches
    val re = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val got = re.session.getStats()
    assert(boundaries.drop(lastDrain).contains(got),
      s"reopened stats $got not a commit boundary ≥ last drain " +
        s"(${boundaries.drop(lastDrain).mkString(", ")})")
    re.close()
  }

  test("random update mix preserves stats across restart (APITests analog)") {
    // weighted mix per APITests/Catalogue.hs:148-209, driver-side shadow
    // for target selection, sized for Spark job latency
    val rnd = new Random(42)
    val dir = tmpDir().toString
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    val g = s1.session
    val nodes = scala.collection.mutable.ArrayBuffer[Long]()
    (1 to 40).foreach { i =>
      rnd.nextInt(100) match {
        case x if x < 40 => // insert song (weight analog 200/2541)
          val n = g.newNode(Song(s"song-$i")); g.addTarget(g.root, n); nodes += n
        case x if x < 60 =>
          val n = g.newNode(Artist(i, s"artist-$i")); g.addTarget(g.root, n); nodes += n
        case x if x < 70 =>
          val n = g.newNode(Genre(s"genre-$i")); g.addTarget(g.root, n); nodes += n
        case x if x < 85 && nodes.nonEmpty => // add random edge
          g.addTarget(nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size)))
        case _ if nodes.nonEmpty => // remove random node
          g.remove(nodes(rnd.nextInt(nodes.size)))
        case _ => ()
      }
    }
    val stats = g.getStats()
    s1.close()
    val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir)
    assert(s2.session.getStats() === stats)
    s2.close()
  }

  test("oversized non-bulk WAL batch is refused with a typed error on replay") {
    val dir = tmpDir()
    val s1 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
    val a = s1.session.newNode(Artist(1, "A"))
    s1.session.addTarget(s1.session.root, a)
    s1.commit()
    s1.abandon() // crash: events stay, no checkpoint

    // handcraft a non-bulk batch (foreign tooling analog) with more ops
    // than the replay bound — lowered for the spec so proving the refusal
    // does not require writing 2^20 real rows
    val schema = GraphStore.opSchema(CatalogueModel)
    val base = (1L << 44) | (1L << 28)
    val rows = (0 until 10).map(i =>
      org.apache.spark.sql.Row(base + i, "add", null, 0L, a, null, null))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.parquet(dir.resolve("1.events").resolve("batch-000001").toString)

    val saved = GraphStore.maxReplayBatchRows
    GraphStore.maxReplayBatchRows = 8
    try {
      intercept[GraphStore.OversizedReplayBatchException] {
        GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
      }
      // with the real bound the same store opens fine (10 ≤ 2^20) and the
      // handcrafted ops are replayed
      GraphStore.maxReplayBatchRows = saved
      val s2 = GraphStore.open(spark, CatalogueModel, CatRoot: Cat, dir.toString)
      assert(s2.session.targets(0L).contains(a))
      s2.close()
    } finally GraphStore.maxReplayBatchRows = saved
  }
}
