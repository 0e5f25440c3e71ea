package graft.graph

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The MacrosTests.hs / THTests.hs analog
  * (/root/reference/executables/InternalTests/MacrosTests.hs,
  * THTests.hs:14-39): the reference asserts its TH-generated `Setup`
  * instance behaves like the explicit one; we assert the
  * runtime-derived [[GraphModel]] is member-for-member equal to the
  * hand-written codec on every existing model — schema (names, types,
  * nullability, ORDER), kindOf, toValueRow, fromValueRow round trips,
  * and indexes — plus closure-serializability (models ship to
  * executors) and the derive-time failure modes.
  */
class DeriveSpec extends AnyFunSuite {

  private def gen[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  private val strGen = Gen.listOfN(6, Gen.alphaNumChar).map(_.mkString)

  private val catGen: Gen[Cat] = Gen.oneOf(
    Gen.const(CatRoot: Cat),
    Gen.zip(Gen.chooseNum(-1000, 1000), strGen).map { case (u, n) => Artist(u, n) },
    strGen.map(Genre(_)),
    strGen.map(Song(_)))

  private val demoGen: Gen[DemoV] = Gen.oneOf(
    Gen.const(DemoRoot: DemoV),
    Gen.listOfN(3, strGen).map(ws => DArtist(ws.mkString(" "))),
    strGen.map(DGenre(_)))

  private val geoGen: Gen[GraphQueries.GeoV] = {
    import GraphQueries._
    Gen.oneOf(
      Gen.const(GeoRoot: GeoV),
      strGen.map(RegionV(_)),
      strGen.map(NationV(_)),
      Gen.chooseNum(0L, 100000L).map(CustomerV(_)))
  }

  private def assertEqualModels[V](derived: GraphModel[V],
      hand: GraphModel[V], samples: Seq[V]): Unit = {
    assert(derived.valueSchema === hand.valueSchema,
      "sparse union schema must match the hand-written one exactly " +
        "(names, types, nullability, field order)")
    for (v <- samples) {
      assert(derived.kindOf(v) === hand.kindOf(v))
      assert(derived.toValueRow(v) === hand.toValueRow(v))
      val k = hand.kindOf(v)
      val r = hand.toValueRow(v)
      assert(derived.fromValueRow(k, r) === v)
      assert(derived.fromValueRow(k, derived.toValueRow(v)) === v)
      for (s <- samples)
        assert(derived.indexes(v, s) === hand.indexes(v, s))
    }
  }

  test("derived CatalogueModel == hand-written (all members, 40 samples)") {
    assertEqualModels(CatalogueModel, CatalogueModelHand, gen(catGen, 40, 11L))
  }

  test("derived DemoModel == hand-written") {
    assertEqualModels(DemoModel, DemoModelHand, gen(demoGen, 40, 12L))
  }

  test("derived GeoModel == hand-written (the declared-query model)") {
    assertEqualModels(GraphQueries.GeoModel, GraphQueries.GeoModelHand,
      gen(geoGen, 40, 13L))
  }

  test("derived schema reproduces hand-written field order") {
    // CatalogueModel: Artist(uid, name) is the first variant declared with
    // fields, so the union is (uid, name); GeoModel declares RegionV(name)
    // before CustomerV(custkey), so the union is (name, custkey).
    assert(CatalogueModel.valueSchema.fieldNames.toSeq === Seq("uid", "name"))
    assert(GraphQueries.GeoModel.valueSchema.fieldNames.toSeq ===
      Seq("name", "custkey"))
  }

  test("derived model survives java serialization (executor shipping)") {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.ObjectOutputStream(bos)
    out.writeObject(GraphQueries.GeoModel)
    out.close()
    val in = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val copy = in.readObject().asInstanceOf[GraphModel[GraphQueries.GeoV]]
    assertEqualModels(copy, GraphQueries.GeoModelHand, gen(geoGen, 20, 14L))
  }

  // ---------------------------------------- richer field types round-trip

  private val derivedRich: GraphModel[DeriveSpecADT.Rich] =
    GraphModel.derive[DeriveSpecADT.Rich]((_, _) => Seq.empty)

  test("derive handles Option / Seq / nested case class / binary fields") {
    import DeriveSpecADT._
    assert(derivedRich.valueSchema === StructType(Seq(
      StructField("n", LongType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true),
      StructField("note", StringType, nullable = true),
      StructField("point", StructType(Seq(
        StructField("x", DoubleType, nullable = true),
        StructField("y", DoubleType, nullable = true))), nullable = true),
      StructField("blob", BinaryType, nullable = true))))
    val vs: Seq[Rich] = Seq(
      RichRoot,
      Wide(7L, Seq("a", "b"), Some("hi"), Point(1.5, -2.5)),
      Wide(0L, Seq.empty, None, Point(0.0, 0.0)),
      Blobby(Array[Byte](1, 2, 3)))
    for (v <- vs) {
      val k = derivedRich.kindOf(v)
      val r = derivedRich.toValueRow(v)
      assert(r.size === 5)
      val back = derivedRich.fromValueRow(k, r)
      (v, back) match {
        // Array[Byte] equality is reference equality — compare contents
        case (Blobby(a), Blobby(b)) => assert(a.toSeq === b.toSeq)
        case _ => assert(back === v)
      }
    }
    // Option encodes as the bare value / null, not a struct (positions:
    // n=0, tags=1, note=2, point=3, blob=4 in the union schema)
    val w = derivedRich.toValueRow(Wide(1L, Seq("x"), Some("y"), Point(0, 0)))
    assert(w.get(2) === "y")
    assert(derivedRich.toValueRow(Wide(1L, Seq("x"), None, Point(0, 0)))
      .get(2) === null)
    // nested case class encodes as a nested Row
    assert(w.get(3) === Row(0.0, 0.0))
  }

  test("derive handles tuple / Map / nested sealed-trait fields") {
    import DeriveSpecADT._
    val m = GraphModel.derive[Rich2](indexesFn = (_, _) => Seq.empty)
    assert(m.valueSchema === StructType(Seq(
      StructField("ids", StructType(Seq(
        StructField("_1", IntegerType, nullable = true),
        StructField("_2", LongType, nullable = true),
        StructField("_3", StringType, nullable = true))), nullable = true),
      StructField("tags",
        MapType(StringType, IntegerType, valueContainsNull = true),
        nullable = true),
      StructField("shape", StructType(Seq(
        StructField("_kind", StringType, nullable = true),
        StructField("r", DoubleType, nullable = true))), nullable = true),
      StructField("name", StringType, nullable = true))))
    // tuple encodes as a nested struct _1.._N (tuples are case classes)
    val t = m.toValueRow(TupRoot((1, 2L, "x")))
    assert(t.get(0) === Row(1, 2L, "x"))
    // nested sum encodes as (_kind, union...) — a case object carries
    // only its tag, a payload variant its fields
    assert(m.toValueRow(Shaped(Dot, "d")).get(2) === Row("Dot", null))
    assert(m.toValueRow(Shaped(Circle(2.5), "c")).get(2) === Row("Circle", 2.5))
    val vs: Seq[Rich2] = Seq(
      TupRoot((1, 2L, "x")),
      Tagged(Map("a" -> 1, "b" -> 2)),
      Tagged(Map.empty),
      Shaped(Dot, "d"),
      Shaped(Circle(2.5), "c"))
    for (v <- vs)
      assert(m.fromValueRow(m.kindOf(v), m.toValueRow(v)) === v)
  }

  test("derive rejects recursive value ADTs with a clear error") {
    import DeriveSpecADT._
    val e = intercept[IllegalArgumentException] {
      GraphModel.derive[Rec](indexesFn = (_, _) => Seq.empty)
    }
    assert(e.getMessage.contains("recursive"))
  }

  test("tuple-ROOT model (the reference catalogue shape) runs live") {
    // the reference's own catalogue root value is a tuple
    // (/root/reference/executables/APITests/Catalogue.hs:19)
    import DeriveSpecADT._
    val spark = TestSpark.spark
    val m = GraphModel.derive[Rich2](
      indexesFn = GraphModel.indexesFromEdges[Rich2](Seq(
        GraphModel.edge[Shaped, TupRoot](sh =>
          Seq(IndexKey("Rich2_Shaped_Name", sh.name))))))
    val g = GraphSession.inMemory(spark, m, TupRoot((1, 2L, "root")): Rich2)
    val n = g.newNode(Shaped(Circle(1.5), "c1"))
    g.addTarget(g.root, n)
    assert(g.getValue(n) === Shaped(Circle(1.5), "c1"))
    assert(g.getValue(g.root) === TupRoot((1, 2L, "root")))
    g.setValue(g.root, TupRoot((7, 8L, "updated")))
    assert(g.getValue(g.root) === TupRoot((7, 8L, "updated")))
  }

  test("Map-field values live in a session (newNode/getValue/setValue)") {
    import DeriveSpecADT._
    val spark = TestSpark.spark
    val m = GraphModel.derive[Rich2](indexesFn = (_, _) => Seq.empty)
    val g = GraphSession.inMemory(spark, m, TupRoot((0, 0L, "r")): Rich2)
    val n = g.newNode(Tagged(Map("a" -> 1, "b" -> 2)))
    g.addTarget(g.root, n)
    assert(g.getValue(n) === Tagged(Map("a" -> 1, "b" -> 2)))
    g.setValue(n, Tagged(Map("c" -> 3)))
    assert(g.getValue(n) === Tagged(Map("c" -> 3)))
  }

  test("per-edge dispatch: unmatched pairs empty, duplicates rejected") {
    // the three primary models' indexes now come from indexesFromEdges —
    // the equality tests above already prove dispatch == hand-written
    // match on every sampled (target, source) pair; here: the fall-through
    // and the overlapping-clause rejection (renderIndexesClause analog)
    val f = GraphModel.indexesFromEdges[Cat](Seq(
      GraphModel.edge[Artist, CatRoot.type](a =>
        Seq(IndexKey("A", a.name)))))
    assert(f(Artist(1, "x"), CatRoot) === Seq(IndexKey("A", "x")))
    assert(f(Artist(1, "x"), Genre("g")) === Seq.empty) // no clause
    assert(f(CatRoot, CatRoot) === Seq.empty)
    assertThrows[IllegalArgumentException] {
      GraphModel.indexesFromEdges[Cat](Seq(
        GraphModel.edge[Artist, CatRoot.type](_ => Seq.empty),
        GraphModel.edge[Artist, CatRoot.type](_ => Seq.empty)))
    }
  }

  test("derived rich model round-trips 60 random values (property)") {
    import DeriveSpecADT._
    val wideGen: Gen[Rich] = for {
      n <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      tags <- Gen.listOf(strGen).map(_.take(5))
      note <- Gen.option(strGen)
      x <- Gen.chooseNum(-1e6, 1e6)
      y <- Gen.chooseNum(-1e6, 1e6)
    } yield Wide(n, tags, note, Point(x, y))
    val richGen: Gen[Rich] = Gen.oneOf(
      Gen.const(RichRoot: Rich), wideGen,
      Gen.listOf(Gen.chooseNum(-128, 127)).map(bs =>
        Blobby(bs.map(_.toByte).toArray)))
    for (v <- gen(richGen, 60, 77L)) {
      val back = derivedRich.fromValueRow(
        derivedRich.kindOf(v), derivedRich.toValueRow(v))
      (v, back) match {
        case (Blobby(a), Blobby(b)) => assert(a.toSeq === b.toSeq)
        case _ => assert(back === v)
      }
    }
  }

  test("derive rejects non-sealed roots and conflicting field types") {
    assertThrows[IllegalArgumentException] {
      GraphModel.derive[DeriveSpecADT.Unsealed]((_, _) => Seq.empty)
    }
    assertThrows[IllegalArgumentException] {
      GraphModel.derive[DeriveSpecADT.Conflict]((_, _) => Seq.empty)
    }
  }

  test("derived model round-trips through a live GraphSession") {
    val spark = TestSpark.spark
    val g = GraphSession.inMemory(spark, derivedRich,
      DeriveSpecADT.RichRoot: DeriveSpecADT.Rich)
    val n = g.newNode(DeriveSpecADT.Wide(42L, Seq("t1", "t2"), Some("v"),
      DeriveSpecADT.Point(3.25, -1.0)))
    g.addTarget(g.root, n)
    assert(g.getValue(n) ===
      DeriveSpecADT.Wide(42L, Seq("t1", "t2"), Some("v"),
        DeriveSpecADT.Point(3.25, -1.0)))
  }
}

/** ADTs for the derive failure / rich-type tests (top level so runtime
  * reflection sees ordinary static classes).
  */
object DeriveSpecADT {
  sealed trait Rich
  case object RichRoot extends Rich
  final case class Wide(n: Long, tags: Seq[String], note: Option[String],
      point: Point) extends Rich
  final case class Blobby(blob: Array[Byte]) extends Rich
  final case class Point(x: Double, y: Double)

  sealed trait Rich2
  final case class TupRoot(ids: (Int, Long, String)) extends Rich2
  final case class Tagged(tags: Map[String, Int]) extends Rich2
  final case class Shaped(shape: Shape, name: String) extends Rich2

  sealed trait Shape
  case object Dot extends Shape
  final case class Circle(r: Double) extends Shape

  sealed trait Rec
  final case class RNode(child: Rec) extends Rec

  trait Unsealed
  final case class U1(a: Int) extends Unsealed

  sealed trait Conflict
  final case class C1(a: Int) extends Conflict
  final case class C2(a: String) extends Conflict
}
