package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

/** The r18 rank-machinery replacements, pinned row-identical against the
  * window plans they replaced:
  *  - [[TopKEntries]] vs the two-phase (local + global) window rank —
  *    including NULL order keys (NULLS LAST), exact score ties (nbr
  *    tie-break), 0.0 vs -0.0 (raw IEEE compare, the SortOrder
  *    semantics), and partial/merge across many input partitions;
  *  - [[TopPCentroids]] vs posexplode(CentroidDots) + window (score
  *    parity is by construction — same normalized matrix, same loop —
  *    so the spec pins the SELECTION: order, ties to the smaller index,
  *    p > n truncation);
  *  - [[AdcSum]] vs the posexplode codes → join LUT rows → group-sum
  *    pipeline it replaced.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("TopKEntries == two-phase window rank (ties, nulls, ±0.0, many partitions)") {
    import spark.implicits._
    // deterministic adversarial scores: exact ties across nbrs, NULLs,
    // 0.0 vs -0.0, negative scores — spread over 7 partitions so
    // partial buffers and merges all engage
    val rows = (0L until 500L).flatMap { nbr =>
      val qid = nbr % 7
      val sim: java.lang.Double = (nbr % 11) match {
        case 0 => null
        case 1 => 0.0d
        case 2 => -0.0d
        case 3 => 1.0d / ((nbr % 5) + 1)
        case 4 => -1.0d / ((nbr % 3) + 1)
        case k => k.toDouble / 7.0d
      }
      Seq((qid, nbr, sim))
    }
    val df = rows.toDF("qid", "nbr", "sim").repartition(7)
    for (k <- Seq(1, 3, 10)) {
      val wLocal = Window.partitionBy(col("qid"), col("_part"))
        .orderBy(col("sim").desc, col("nbr"))
      val wGlobal = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("nbr"))
      val viaWindow = df
        .withColumn("_part", spark_partition_id())
        .withColumn("_lr", row_number().over(wLocal))
        .where(col("_lr") <= k)
        .withColumn("rank", row_number().over(wGlobal).cast("bigint"))
        .where(col("rank") <= k)
        .select(col("qid"), col("nbr"), col("rank"), col("sim"))
        .orderBy("qid", "rank").collect().toSeq
      val viaAgg = df.groupBy("qid")
        .agg(TopKEntries(col("sim"), col("nbr"), lit(0), lit(0), lit(0L), k)
          .as("_top"))
        .select(col("qid"), posexplode(col("_top")).as(Seq("_r", "_e")))
        .select(col("qid"), col("_e.nbr").as("nbr"),
          (col("_r") + 1).cast("bigint").as("rank"), col("_e.sim").as("sim"))
        .orderBy("qid", "rank").collect().toSeq
      assert(viaAgg.map(_.toString) === viaWindow.map(_.toString), s"k=$k")
    }
  }

  test("TopKEntries ±0.0 straddling the top-k boundary == window (SortOrder equality)") {
    import spark.implicits._
    // r19 (ADVICE): the k-boundary lands INSIDE a mixed 0.0 / -0.0
    // plateau, so survival is decided by the tie-break. SortOrder
    // (SQLOrderingUtil.compareDoubles) treats ±0.0 as EQUAL and breaks
    // ties on nbr ASC; raw Double.compare would rank every 0.0 strictly
    // above every -0.0 and pick different survivors.
    val rows = (0L until 120L).map { nbr =>
      val qid = nbr % 4
      val sim: java.lang.Double = (nbr % 3) match {
        case 0 => 0.0d
        case 1 => -0.0d
        case _ => -1.0d // below the zero plateau
      }
      (qid, nbr, sim)
    }
    val df = rows.toDF("qid", "nbr", "sim").repartition(5)
    for (k <- Seq(1, 2, 7, 25)) {
      val wLocal = Window.partitionBy(col("qid"), col("_part"))
        .orderBy(col("sim").desc, col("nbr"))
      val wGlobal = Window.partitionBy("qid")
        .orderBy(col("sim").desc, col("nbr"))
      val viaWindow = df
        .withColumn("_part", spark_partition_id())
        .withColumn("_lr", row_number().over(wLocal))
        .where(col("_lr") <= k)
        .withColumn("rank", row_number().over(wGlobal).cast("bigint"))
        .where(col("rank") <= k)
        .select(col("qid"), col("nbr"), col("rank"))
        .orderBy("qid", "rank").collect().toSeq
      val viaAgg = df.groupBy("qid")
        .agg(TopKEntries(col("sim"), col("nbr"), lit(0), lit(0), lit(0L), k)
          .as("_top"))
        .select(col("qid"), posexplode(col("_top")).as(Seq("_r", "_e")))
        .select(col("qid"), col("_e.nbr").as("nbr"),
          (col("_r") + 1).cast("bigint").as("rank"))
        .orderBy("qid", "rank").collect().toSeq
      assert(viaAgg.map(_.toString) === viaWindow.map(_.toString), s"k=$k")
    }
  }

  test("TopKEntries carries (c1, c2, aux) payloads with the winning entries") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 0.9d, 3, 7, 900L),
      (1L, 11L, 0.9d, 2, 1, 901L), // tie with 10 → loses on larger nbr? no: 10 < 11 wins
      (1L, 12L, 0.95d, 5, 5, 902L),
      (2L, 20L, 0.1d, 1, 2, 200L))
      .toDF("qid", "nbr", "sim", "c1", "c2", "aux")
    val got = df.groupBy("qid")
      .agg(TopKEntries(col("sim"), col("nbr"), col("c1"), col("c2"),
        col("aux"), 2).as("_top"))
      .select(col("qid"), posexplode(col("_top")).as(Seq("_r", "_e")))
      .select(col("qid"), col("_e.nbr"), col("_e.c1"), col("_e.c2"),
        col("_e.aux"))
      .orderBy(col("qid"), col("_r")).collect().toSeq.map(_.toString)
    assert(got === Seq("[1,12,5,5,902]", "[1,10,3,7,900]", "[2,20,1,2,200]"))
  }

  test("TopPCentroids == posexplode(CentroidDots) + window selection") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val cents = Array.fill(9)(Array.fill(8)(rnd.nextGaussian().toFloat))
    // duplicate centroid rows force exact score ties → smaller index wins
    val centsWithTies = cents ++ Array(cents(2).clone(), cents(5).clone())
    val vecs = (0L until 200L)
      .map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat).toSeq))
      .toDF("id", "v")
      .select(col("id"), col("v").cast("array<float>").as("v"))
    for (p <- Seq(1, 3, 11, 15)) { // 15 > n pins truncation
      val viaWindow = vecs
        .select(col("id"),
          posexplode(CentroidDots(col("v"), centsWithTies))
            .as(Seq("_c", "_s")))
        .withColumn("_r", row_number().over(
          Window.partitionBy("id").orderBy(col("_s").desc, col("_c"))))
        .where(col("_r") <= p)
        .select(col("id"), col("_r"), col("_c"))
        .orderBy("id", "_r").collect().toSeq
      val viaExpr = vecs
        .select(col("id"),
          posexplode(TopPCentroids(col("v"), centsWithTies, p))
            .as(Seq("_r0", "_c")))
        .select(col("id"), (col("_r0") + 1).as("_r"), col("_c"))
        .orderBy("id", "_r").collect().toSeq
      assert(viaExpr.map(_.toString) === viaWindow.map(_.toString), s"p=$p")
    }
  }

  test("CosineSimPre(VecNorm) == CosineSim bit-for-bit (zero norms, ragged)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vecs = ((0L until 100L).map { i =>
      val d = if (i % 17 == 0) 5 else 8 // ragged pairs → NULL both ways
      (i, Array.fill(d)(if (i % 13 == 0) 0f // zero-norm → NULL both ways
        else rnd.nextGaussian().toFloat).toSeq)
    }).toDF("id", "v").select(col("id"), col("v").cast("array<float>").as("v"))
    val a = vecs.select(col("id").as("ia"), col("v").as("va"),
      VecNorm(col("v")).as("na"))
    val b = vecs.select(col("id").as("ib"), col("v").as("vb"),
      VecNorm(col("v")).as("nb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val both = pairs.select(col("ia"), col("ib"),
      CosineSim(col("va"), col("vb")).as("plain"),
      CosineSimPre(col("va"), col("vb"), col("na"), col("nb")).as("pre"))
      .collect()
    both.foreach { r =>
      val (p, q) = (r.isNullAt(2), r.isNullAt(3))
      assert(p === q, s"null mismatch at ${r.getLong(0)},${r.getLong(1)}")
      if (!p) assert(
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)) ===
          java.lang.Double.doubleToRawLongBits(r.getDouble(3)),
        s"bit mismatch at ${r.getLong(0)},${r.getLong(1)}")
    }
    assert(both.nonEmpty)
  }

  test("AdcSum == posexplode codes -> join LUT rows -> group sum") {
    import spark.implicits._
    val m = 6
    val ksub = 17
    val rnd = new scala.util.Random(42)
    val codesRows = (0L until 50L).map { id =>
      (id, Array.fill(m)(rnd.nextInt(ksub).toLong))
    }
    val packed = codesRows.toDF("nbr", "codes")
      .select(col("nbr"), PackI8(col("codes")).as("pq"))
    val lutRows = (0 until m).flatMap(sub => (0 until ksub).map(code =>
      (sub, code.toLong, rnd.nextInt(255).toLong - 127L)))
      .toDF("sub", "code", "part")
    val viaJoin = packed
      .select(col("nbr"), posexplode(UnpackI8(col("pq"))).as(Seq("sub", "code")))
      .join(lutRows, Seq("sub", "code"))
      .groupBy("nbr").agg(sum("part").as("score"))
      .orderBy("nbr").collect().toSeq
    // positional layout built from the same deterministic tuples (sub-major,
    // code-minor) — the layout Similarity's sorted collect produces
    val parts = lutRows.collect().map(r =>
      ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      .toSeq.sortBy(_._1).map(_._2)
    val viaExpr = packed
      .select(col("nbr"),
        AdcSum(col("pq"), typedLit(parts), ksub).as("score"))
      .orderBy("nbr").collect().toSeq
    assert(viaExpr.map(_.toString) === viaJoin.map(_.toString))
  }
}
