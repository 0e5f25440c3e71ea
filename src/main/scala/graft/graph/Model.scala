package graft.graph

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** An index key: the engine-level analog of the reference's `Index s` ADT
  * (/root/reference/library/GraphDB/Graph.hs:19-21). A key constructor with
  * a payload (e.g. `Catalogue_Artist_Name "x"`) maps to
  * `(kind = "Catalogue_Artist_Name", key = "x")`; a payload-free
  * constructor maps to `(kind, "")`.
  */
final case class IndexKey(kind: String, key: String)

object IndexKey {
  def apply(kind: String): IndexKey = IndexKey(kind, "")
}

/** User-supplied model: the Scala analog of the reference's `Setup`
  * typeclass (/root/reference/library/GraphDB/Graph.hs:15-25). Where the
  * reference derives a closed sum type via Template Haskell
  * (Macros/Templates.hs:41-68), we take a sealed-trait ADT plus an explicit
  * sparse-struct codec — Spark has no native sum type, so values are stored
  * as a `kind` tag + a struct with the union of all variants' fields
  * (nullable where a variant lacks the field). Keeping values as real
  * columns (not opaque binary) is what lets Catalyst prune and push down.
  *
  * `indexes(target, source)` mirrors `indexes :: Value s -> Value s ->
  * [Index s]` (Graph.hs:25): given the value at the edge head and the value
  * at the edge tail, emit the index keys under which the target is
  * registered in the source's adjacency index.
  */
trait GraphModel[V] extends Serializable {

  /** Sparse struct covering all variants' fields. */
  def valueSchema: StructType

  def kindOf(v: V): String

  /** Encode into a row matching `valueSchema` (absent fields null). */
  def toValueRow(v: V): Row

  def fromValueRow(kind: String, row: Row): V

  /** Index keys emitted for an edge source→target. */
  def indexes(target: V, source: V): Seq[IndexKey]
}

/** Runtime model derivation — the analog of the reference's
  * `deriveSetup` Template Haskell macro
  * (/root/reference/library/GraphDB/Macros.hs:15-32,
  * Macros/Templates.hs:41-68). Where the reference reifies the value
  * types at compile time and renders the `Setup` instance (sum
  * constructors for `Value`/`Index`, pack/unpack per variant, the
  * `indexes` dispatch), we reify the sealed-trait ADT at runtime with
  * `scala.reflect` and assemble the codec: the sparse union schema,
  * `kindOf`, `toValueRow`, `fromValueRow`. The per-edge `indexes` logic
  * stays user-supplied — exactly as in the reference, where `M.indexes`
  * is user code and the macro only generates the dispatch clauses
  * (Templates.hs:76-88).
  *
  * The derived model must survive Spark closure serialization (index
  * derivation runs model code on executors), so the descriptors hold
  * only serializable state — `java.lang.Class`, field layouts, codec
  * ADTs — and rebuild java-reflection mirrors lazily on each JVM.
  */
object GraphModel {

  import org.apache.spark.sql.types._

  /** Per-field encoder between a Scala constructor argument and its
    * Spark SQL column representation. A small closed algebra keeps every
    * codec a serializable case class (no captured reflection mirrors).
    */
  sealed trait FieldCodec extends Serializable {
    def sparkType: DataType
    def toRow(v: Any): Any
    def fromRow(v: Any): Any
  }

  /** Types whose Scala and Row representations coincide. */
  final case class PrimCodec(sparkType: DataType) extends FieldCodec {
    def toRow(v: Any): Any = v
    def fromRow(v: Any): Any = v
  }

  final case class OptionCodec(inner: FieldCodec) extends FieldCodec {
    val sparkType: DataType = inner.sparkType
    def toRow(v: Any): Any = v match {
      case Some(x) => inner.toRow(x)
      case _ => null
    }
    def fromRow(v: Any): Any = if (v == null) None else Some(inner.fromRow(v))
  }

  final case class SeqCodec(inner: FieldCodec) extends FieldCodec {
    val sparkType: DataType = ArrayType(inner.sparkType, containsNull = true)
    def toRow(v: Any): Any =
      if (v == null) null
      else v.asInstanceOf[scala.collection.Seq[Any]].map(inner.toRow)
    def fromRow(v: Any): Any =
      if (v == null) null
      else v.asInstanceOf[scala.collection.Seq[Any]].map(inner.fromRow).toSeq
  }

  /** `Map[K, V]` ⇄ `MapType`. Row-land maps are `scala.collection.Map`;
    * keys/values recurse through their own codecs.
    */
  final case class MapCodec(key: FieldCodec, value: FieldCodec)
      extends FieldCodec {
    val sparkType: DataType =
      MapType(key.sparkType, value.sparkType, valueContainsNull = true)
    def toRow(v: Any): Any =
      if (v == null) null
      else v.asInstanceOf[scala.collection.Map[Any, Any]]
        .map { case (k, x) => (key.toRow(k), value.toRow(x)) }.toMap
    def fromRow(v: Any): Any =
      if (v == null) null
      else v.asInstanceOf[scala.collection.Map[Any, Any]]
        .map { case (k, x) => (key.fromRow(k), value.fromRow(x)) }.toMap
  }

  /** Nested sealed-trait (sum) field ⇄ kind-tagged sparse struct: column 0
    * is the variant tag, the rest the union of the variants' fields — the
    * same representation the top-level model uses, one struct down (the
    * reference admits arbitrary value nesting,
    * /root/reference/library/GraphDB/Graph.hs:15-16).
    */
  final case class SumCodec(variants: Seq[VariantDesc],
      union: StructType) extends FieldCodec {
    val sparkType: DataType = StructType(
      StructField("_kind", StringType, nullable = true) +: union.fields)
    @transient private lazy val byClass: Map[Class[_], VariantDesc] =
      variants.map(v => (v.clazz: Class[_]) -> v).toMap
    @transient private lazy val byKind: Map[String, VariantDesc] =
      variants.map(v => v.kind -> v).toMap
    def toRow(v: Any): Any =
      if (v == null) null
      else {
        val d = byClass.getOrElse(v.getClass,
          throw new IllegalArgumentException(
            s"${v.getClass.getName} is not a variant of this sum field"))
        val arr = new Array[Any](union.size + 1)
        arr(0) = d.kind
        if (!d.isObject) {
          val p = v.asInstanceOf[Product]
          var i = 0
          while (i < d.fieldCodecs.length) {
            arr(1 + d.unionPos(i)) = d.fieldCodecs(i).toRow(p.productElement(i))
            i += 1
          }
        }
        Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
      }
    def fromRow(v: Any): Any =
      if (v == null) null
      else {
        val r = v.asInstanceOf[Row]
        val d = byKind.getOrElse(r.getString(0),
          throw new IllegalArgumentException(
            s"unknown kind '${r.getString(0)}' for this sum field"))
        if (d.isObject) d.moduleInstance
        else {
          val args = d.fieldCodecs.indices.map(i =>
            d.fieldCodecs(i).fromRow(r.get(1 + d.unionPos(i)))
              .asInstanceOf[AnyRef])
          d.ctor.newInstance(args: _*)
        }
      }
  }

  /** Nested case class ⇄ nested struct. */
  final case class StructCodec(clazz: Class[_],
      fields: Seq[(String, FieldCodec)]) extends FieldCodec {
    val sparkType: DataType =
      StructType(fields.map { case (n, c) =>
        StructField(n, c.sparkType, nullable = true) })
    @transient private lazy val ctor = primaryCtorOf(clazz, fields.size)
    def toRow(v: Any): Any =
      if (v == null) null
      else {
        val p = v.asInstanceOf[Product]
        Row.fromSeq(fields.indices.map(i => fields(i)._2.toRow(p.productElement(i))))
      }
    def fromRow(v: Any): Any =
      if (v == null) null
      else {
        val r = v.asInstanceOf[Row]
        val args = fields.indices.map(i => fields(i)._2.fromRow(r.get(i)).asInstanceOf[AnyRef])
        ctor.newInstance(args: _*)
      }
  }

  /** One sum constructor of the ADT — the runtime analog of a rendered
    * `SumConstructor` (Templates.hs:60-70). `unionPos(i)` is the slot of
    * constructor field i inside the union schema.
    */
  final case class VariantDesc(
      kind: String,
      clazz: Class[_],
      isObject: Boolean,
      fieldCodecs: Seq[FieldCodec],
      unionPos: Seq[Int]) extends Serializable {
    @transient lazy val moduleInstance: AnyRef =
      clazz.getField("MODULE$").get(null)
    @transient lazy val ctor: java.lang.reflect.Constructor[_] =
      primaryCtorOf(clazz, fieldCodecs.size)
  }

  private def primaryCtorOf(clazz: Class[_], arity: Int): java.lang.reflect.Constructor[_] = {
    val c = clazz.getDeclaredConstructors
      .find(_.getParameterCount == arity)
      .getOrElse(throw new IllegalArgumentException(
        s"${clazz.getName}: no $arity-ary constructor"))
    c.setAccessible(true)
    c
  }

  private final class Derived[V](
      val valueSchema: StructType,
      variants: Seq[VariantDesc],
      indexesFn: (V, V) => Seq[IndexKey]) extends GraphModel[V] {

    @transient private lazy val byClass: Map[Class[_], VariantDesc] =
      variants.map(v => (v.clazz: Class[_]) -> v).toMap
    @transient private lazy val byKind: Map[String, VariantDesc] =
      variants.map(v => v.kind -> v).toMap
    private val arity = valueSchema.size

    private def variantOf(v: V): VariantDesc =
      byClass.getOrElse(v.getClass, throw new IllegalArgumentException(
        s"${v.getClass.getName} is not a variant of this model"))

    def kindOf(v: V): String = variantOf(v).kind

    def toValueRow(v: V): Row = {
      val d = variantOf(v)
      val arr = new Array[Any](arity)
      if (!d.isObject) {
        val p = v.asInstanceOf[Product]
        var i = 0
        while (i < d.fieldCodecs.length) {
          arr(d.unionPos(i)) = d.fieldCodecs(i).toRow(p.productElement(i))
          i += 1
        }
      }
      Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(arr))
    }

    def fromValueRow(kind: String, row: Row): V = {
      val d = byKind.getOrElse(kind, throw new IllegalArgumentException(
        s"unknown kind '$kind' for this model"))
      if (d.isObject) d.moduleInstance.asInstanceOf[V]
      else {
        val args = d.fieldCodecs.indices.map(i =>
          d.fieldCodecs(i).fromRow(row.get(d.unionPos(i))).asInstanceOf[AnyRef])
        d.ctor.newInstance(args: _*).asInstanceOf[V]
      }
    }

    def indexes(target: V, source: V): Seq[IndexKey] = indexesFn(target, source)
  }

  /** One edge declaration — the runtime analog of an
    * `instance M.Edge source target` with its `indexes :: target ->
    * [Index]` (/root/reference/library/GraphDB/Model.hs:30-34,
    * GraphTests.hs:31-43): the handler sees the TARGET value; the source
    * participates by TYPE only, selecting the instance — exactly the
    * reference's dispatch shape (Templates.hs:76-88 renders
    * `indexes (Target v) (Source _) = map IndexCtor (M.indexes v)`).
    * Case objects declare with their singleton type
    * (`edge[Artist, CatRoot.type](...)`).
    */
  final class EdgeDef private[GraphModel] (
      private[GraphModel] val targetClass: Class[_],
      private[GraphModel] val sourceClass: Class[_],
      private[GraphModel] val fn: Any => Seq[IndexKey]) extends Serializable

  def edge[T: scala.reflect.ClassTag, S: scala.reflect.ClassTag](
      fn: T => Seq[IndexKey]): EdgeDef =
    new EdgeDef(
      scala.reflect.classTag[T].runtimeClass,
      scala.reflect.classTag[S].runtimeClass,
      v => fn(v.asInstanceOf[T]))

  /** Assemble the total `indexes` dispatch from per-edge declarations —
    * the `renderIndexesClause` analog: unmatched (target, source) type
    * pairs emit no keys, exactly like the reference's fall-through
    * `indexes _ _ = []`. Duplicate declarations for one pair are
    * rejected (the macro would have produced overlapping clauses).
    */
  def indexesFromEdges[V](edges: Seq[EdgeDef]): (V, V) => Seq[IndexKey] = {
    val keys = edges.map(e => (e.targetClass: Class[_], e.sourceClass: Class[_]))
    require(keys.distinct.size == keys.size,
      s"duplicate edge declarations: ${keys.diff(keys.distinct).mkString(", ")}")
    val table: Map[(Class[_], Class[_]), Any => Seq[IndexKey]] =
      edges.map(e => (e.targetClass: Class[_], e.sourceClass: Class[_]) -> e.fn).toMap
    (target: V, source: V) =>
      table.get((target.getClass, source.getClass))
        .map(_(target)).getOrElse(Seq.empty)
  }

  // scala.reflect runtime universes are not thread-safe; derivation is a
  // one-time driver-side step, so a coarse lock is free.
  private val reflectLock = new Object

  /** Derive a [[GraphModel]] for the sealed-trait ADT `V`.
    *
    * Variant kinds default to the constructor's simple name (as the
    * reference's macro names its sum constructors after the value types,
    * Macros/Analysis — `Value_*`/`Index_*` prefixes aside); `kindNames`
    * renames individual variants (e.g. a root marker object `CatRoot` →
    * kind `"Catalogue"`).
    *
    * The union schema takes each field at its first appearance, scanning
    * variants in DECLARATION order (falling back to alphabetical when
    * the enclosing scope can't be scanned) — so a hand-written sparse
    * struct that lists fields in ADT order is reproduced exactly. Two
    * variants may share a field name only at the same Spark type.
    *
    * @param indexesFn the user's per-edge index emission — the analog of
    *   the user-written `M.indexes` the reference macro dispatches to.
    *   Usually assembled from per-edge declarations:
    *   {{{
    *   sealed trait Cat
    *   case object CatRoot extends Cat
    *   final case class Artist(uid: Int, name: String) extends Cat
    *
    *   val model = GraphModel.derive[Cat](
    *     indexesFn = GraphModel.indexesFromEdges[Cat](Seq(
    *       GraphModel.edge[Artist, CatRoot.type](a =>
    *         Seq(IndexKey("Catalogue_Artist_Name", a.name))))),
    *     kindNames = Map("CatRoot" -> "Catalogue"))
    *   }}}
    */
  def derive[V](indexesFn: (V, V) => Seq[IndexKey],
      kindNames: Map[String, String] = Map.empty)(
      implicit tt: scala.reflect.runtime.universe.TypeTag[V]): GraphModel[V] =
    reflectLock.synchronized {
      import scala.reflect.runtime.universe._
      val mirror = tt.mirror
      val root = tt.tpe.typeSymbol.asClass
      require(root.isSealed,
        s"${root.fullName} must be a sealed trait/class to derive a GraphModel")

      def leavesOf(c: ClassSymbol): Seq[ClassSymbol] = {
        c.info // force, so knownDirectSubclasses is populated
        if (c.isSealed && (c.isTrait || c.isAbstract))
          c.knownDirectSubclasses.toSeq.map(_.asClass).flatMap(leavesOf)
        else Seq(c)
      }
      // Declaration order: scan the enclosing scopes' decls (a MemberScope
      // iterates in declaration order); a case object's decl is its module
      // symbol, so match either the class symbol or its module.
      // With variants spread across several owners, knownDirectSubclasses
      // (a Set) gives no stable owner order — sort owners by fullName so
      // the derived union schema's column order is identical across JVM
      // runs (persisted value rows depend on it).
      def orderedLeavesOf(c: ClassSymbol): Seq[ClassSymbol] = {
        val leaves = leavesOf(c)
        require(leaves.nonEmpty, s"${c.fullName}: no concrete variants found " +
          "(knownDirectSubclasses empty — are the subclasses compiled?)")
        val declOrder: Seq[Symbol] =
          leaves.map(_.owner).distinct.sortBy(_.fullName)
            .flatMap(o => o.info.decls.toSeq)
        def orderOf(cs: ClassSymbol): (Int, String) = {
          val i = declOrder.indexWhere(s =>
            s == cs || (cs.isModuleClass && s == cs.module))
          (if (i < 0) Int.MaxValue else i, cs.name.toString)
        }
        leaves.sortBy(orderOf)
      }

      // cycle guard: a self-referential case class or sum type would
      // recurse codecFor forever — reject with the offending type named
      val inProgress = scala.collection.mutable.Set.empty[Symbol]

      def codecFor(t: Type): FieldCodec = {
        val d = t.dealias
        if (d =:= typeOf[Int]) PrimCodec(IntegerType)
        else if (d =:= typeOf[Long]) PrimCodec(LongType)
        else if (d =:= typeOf[Double]) PrimCodec(DoubleType)
        else if (d =:= typeOf[Float]) PrimCodec(FloatType)
        else if (d =:= typeOf[Short]) PrimCodec(ShortType)
        else if (d =:= typeOf[Byte]) PrimCodec(ByteType)
        else if (d =:= typeOf[Boolean]) PrimCodec(BooleanType)
        else if (d =:= typeOf[String]) PrimCodec(StringType)
        else if (d =:= typeOf[Array[Byte]]) PrimCodec(BinaryType)
        else if (d =:= typeOf[java.sql.Timestamp]) PrimCodec(TimestampType)
        else if (d =:= typeOf[java.sql.Date]) PrimCodec(DateType)
        else if (d =:= typeOf[java.math.BigDecimal])
          PrimCodec(DecimalType.SYSTEM_DEFAULT)
        else if (d <:< typeOf[Option[_]]) OptionCodec(codecFor(d.typeArgs.head))
        else if (d <:< typeOf[scala.collection.Map[_, _]])
          MapCodec(codecFor(d.typeArgs(0)), codecFor(d.typeArgs(1)))
        else if (d <:< typeOf[scala.collection.Seq[_]])
          SeqCodec(codecFor(d.typeArgs.head))
        else if (d.typeSymbol.isClass && d.typeSymbol.asClass.isSealed &&
            (d.typeSymbol.asClass.isTrait || d.typeSymbol.asClass.isAbstract)) {
          // nested sum type — same kind-tagged sparse-union encoding as
          // the top level, one struct down
          val sym = d.typeSymbol
          require(inProgress.add(sym),
            s"recursive ADT at $d: self-referential value types are not " +
            "derivable (the reference stores them behind node refs instead)")
          try {
            val (u, vs) = buildVariants(orderedLeavesOf(sym.asClass), Map.empty)
            SumCodec(vs, u)
          } finally inProgress.remove(sym)
        }
        else if (d.typeSymbol.isClass && d.typeSymbol.asClass.isCaseClass) {
          // includes TupleN — tuples ARE case classes with fields _1.._N
          // (the reference's own catalogue ROOT value is a tuple,
          // /root/reference/executables/APITests/Catalogue.hs:19)
          val sym = d.typeSymbol
          require(inProgress.add(sym),
            s"recursive ADT at $d: self-referential value types are not " +
            "derivable (the reference stores them behind node refs instead)")
          try {
            val fs = caseFields(d)
            StructCodec(mirror.runtimeClass(d.typeSymbol.asClass),
              fs.map { case (n, ft) => (n, codecFor(ft)) })
          } finally inProgress.remove(sym)
        } else throw new IllegalArgumentException(
          s"unsupported field type $d — supported: primitives, String, " +
          "binary, Timestamp/Date, BigDecimal, Option, Seq, Map, tuple, " +
          "nested case class, nested sealed trait")
      }

      def caseFields(t: Type): Seq[(String, Type)] = {
        val ctor = t.decl(termNames.CONSTRUCTOR).alternatives
          .collectFirst { case m: MethodSymbol if m.isPrimaryConstructor => m }
          .getOrElse(throw new IllegalArgumentException(
            s"$t: no primary constructor"))
        // typeSignatureIn does not substitute the CLASS's own type
        // parameters (a generic case class like TupleN reports `_1: T1`)
        // — substitute them with the applied type's arguments explicitly
        val sym = t.typeSymbol.asClass
        ctor.paramLists.flatten.map(p =>
          (p.name.toString, p.typeSignatureIn(t)
            .substituteTypes(sym.typeParams, t.typeArgs).dealias))
      }

      // Union schema: first-appearance field order over declaration-ordered
      // variants; same name ⇒ same Spark type, else the model is ambiguous.
      // Shared by the top level and every nested sum field (codecFor).
      def buildVariants(ordered: Seq[ClassSymbol],
          kinds: Map[String, String]): (StructType, Seq[VariantDesc]) = {
        val union = scala.collection.mutable.LinkedHashMap.empty[String, DataType]
        val perVariant = ordered.map { leaf =>
          val isObject = leaf.isModuleClass
          val simpleName = leaf.name.toString
          val kind = kinds.getOrElse(simpleName, simpleName)
          val fields =
            if (isObject) Seq.empty[(String, FieldCodec)]
            else caseFields(leaf.toType).map { case (n, t) => (n, codecFor(t)) }
          fields.foreach { case (n, c) =>
            union.get(n) match {
              case Some(dt) => require(dt == c.sparkType,
                s"field '$n' maps to both $dt and ${c.sparkType} across variants")
              case None => union(n) = c.sparkType
            }
          }
          (kind, leaf, isObject, fields)
        }
        require(perVariant.map(_._1).distinct.size == perVariant.size,
          s"duplicate kinds after renaming: ${perVariant.map(_._1).mkString(", ")}")
        val unionNames = union.keys.toIndexedSeq
        val schema = StructType(unionNames.map(n =>
          StructField(n, union(n), nullable = true)))
        val variants = perVariant.map { case (kind, leaf, isObject, fields) =>
          val clazz = mirror.runtimeClass(leaf)
          VariantDesc(kind, clazz, isObject,
            fields.map(_._2), fields.map(f => unionNames.indexOf(f._1)))
        }
        (schema, variants)
      }

      val (schema, variants) = buildVariants(orderedLeavesOf(root), kindNames)
      new Derived[V](schema, variants, indexesFn)
    }
}
