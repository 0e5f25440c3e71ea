package graft.graph

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Model-based property test: random op sequences applied both to the
  * DataFrame-backed GraphSession and to a trivial executable model of the
  * reference's semantics (Graph.hs:40-133 — value cell, idempotent edge
  * set, index multimap, reachability-scoped stats). Observable state must
  * agree after every sequence — the strongest form of the "same semantics,
  * different engine" claim (the reference's own APITests do the same
  * against Postgres, APITests.hs:52-68).
  */
class ModelPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ------------------------------------------- executable reference model
  private final case class Model(
      values: Map[Long, Cat] = Map.empty,
      edges: Set[(Long, Long)] = Set.empty) {

    def addTarget(s: Long, d: Long): Model = copy(edges = edges + ((s, d)))
    def removeTarget(s: Long, d: Long): Model = copy(edges = edges - ((s, d)))
    def remove(n: Long): Model = copy(edges = edges.filterNot(_._2 == n))
    def setValue(n: Long, v: Cat): Model = copy(values = values.updated(n, v))

    private def reachable: Set[Long] = {
      var seen = Set(0L)
      var frontier = Set(0L)
      while (frontier.nonEmpty) {
        frontier = edges.collect {
          case (s, d) if frontier(s) && !seen(d) => d
        }
        seen ++= frontier
      }
      seen
    }

    /** (nodes, edges, index entries) scoped to the root-reachable closure,
      * mirroring GraphState.stats / Graph.hs:82-118.
      */
    def stats: (Long, Long, Long) = {
      val r = reachable
      val keptEdges = edges.filter(e => r(e._1))
      val idx = keptEdges.toSeq.map { case (s, d) =>
        CatalogueModel.indexes(values(d), values(s)).size.toLong
      }.sum
      (r.count(values.contains).toLong, keptEdges.size.toLong, idx)
    }

    def targets(n: Long): Set[Long] = edges.collect { case (`n`, d) => d }
    def sources(n: Long): Set[Long] = edges.collect { case (s, `n`) => s }
  }

  private sealed trait Op
  private case class AddNode(v: Cat) extends Op
  private case class Link(srcIdx: Int, dstIdx: Int) extends Op
  private case class Unlink(srcIdx: Int, dstIdx: Int) extends Op
  private case class Remove(idx: Int) extends Op
  private case class SetVal(idx: Int, v: Cat) extends Op

  private val genValue: Gen[Cat] = Gen.oneOf(
    Gen.chooseNum(1, 9).flatMap(u => Gen.identifier.map(n => Artist(u, n.take(8)))),
    Gen.identifier.map(n => Genre(n.take(8))),
    Gen.identifier.map(n => Song(n.take(8))))

  private val genOps: Gen[List[Op]] = Gen.listOfN(12, Gen.frequency(
    4 -> genValue.map(AddNode),
    5 -> Gen.zip(Gen.chooseNum(0, 30), Gen.chooseNum(0, 30)).map((Link.apply _).tupled),
    1 -> Gen.zip(Gen.chooseNum(0, 30), Gen.chooseNum(0, 30)).map((Unlink.apply _).tupled),
    1 -> Gen.chooseNum(0, 30).map(Remove),
    2 -> Gen.zip(Gen.chooseNum(0, 30), genValue).map((SetVal.apply _).tupled)))

  test("random op sequences: GraphSession == executable reference model") {
    // raw scalacheck Gen with fixed seeds (scalatestplus is not in the
    // offline cache) — deterministic across runs, seeds printed on failure
    val sequences = (1 to 8).map { i =>
      genOps(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(sys.error(s"gen failed for seed ${42L + i}"))
    }
    sequences.foreach { ops =>
      val g = GraphSession.inMemory(spark, CatalogueModel, CatRoot: Cat)
      var m = Model(values = Map(0L -> CatRoot))
      var ids = Vector(0L)
      ops.foreach {
        case AddNode(v) =>
          val id = g.newNode(v)
          m = m.setValue(id, v)
          ids :+= id
        case Link(s, d) if ids.nonEmpty =>
          val (si, di) = (ids(s % ids.size), ids(d % ids.size))
          g.addTarget(si, di); m = m.addTarget(si, di)
        case Unlink(s, d) if ids.nonEmpty =>
          val (si, di) = (ids(s % ids.size), ids(d % ids.size))
          g.removeTarget(si, di); m = m.removeTarget(si, di)
        case Remove(i) if ids.size > 1 =>
          val n = ids(1 + i % (ids.size - 1)) // never remove the root
          g.remove(n); m = m.remove(n)
        case SetVal(i, v) if ids.size > 1 =>
          val n = ids(1 + i % (ids.size - 1)) // keep the root's value fixed
          g.setValue(n, v); m = m.setValue(n, v)
        case _ => ()
      }
      assert(g.getStats() === m.stats, s"stats diverged after: $ops")
      // spot-check adjacency of every node the model knows
      ids.foreach { n =>
        assert(g.targets(n).toSet === m.targets(n), s"targets($n) after: $ops")
        assert(g.sources(n).toSet === m.sources(n), s"sources($n) after: $ops")
      }
    }
  }
}
