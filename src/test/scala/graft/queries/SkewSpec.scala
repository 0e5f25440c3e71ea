package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.TestSpark

class SkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join == plain join on a pathologically skewed key") {
    import spark.implicits._
    // 90% of fact rows share one key — the shape that melts one reducer
    val fact = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val dim = (1L to 2000L).map(k => (k, s"dim-$k")).toDF("k", "attr")

    val plain = fact.join(dim, Seq("k"))
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8)
      .select("k", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted

    assert(salted.toSeq === plain.toSeq)
    // and the hot key's rows really spread over several salt values
    val spread = fact
      .withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(8)).cast("int"))
      .where(col("k") === 7L)
      .select("_salt").distinct().count()
    assert(spread > 1, "salt must split the hot key across reducers")
  }

  test("ngram DF cap is skew-safe: groupBy+anti-join bounds hot-shingle buckets") {
    import spark.implicits._
    import graft.pipeline.{Dedup, TextAnalysis}
    // adversarial corpus: every doc carries the same hot boilerplate phrase,
    // so uncapped candidate generation admits ALL C(60,2)=1770 pairs through
    // the boilerplate shingles; each doc is otherwise unique
    val boiler = "click here to accept all cookies on this site now"
    val corpus = (1L to 60L)
      .map(i => (i, s"$boiler document $i body ${i * 7} unique tail ${i * 13}"))
      .toDF("doc_id", "text")
    val cap = 10
    val capped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.5, maxDF = Some(cap))
    // plan guard: NO window may partition by the shingle key — that puts a
    // hot shingle's whole bucket on one task, the exact skew this operator
    // exists to avoid. (The prefix ranking's window partitions by DOC id,
    // which is bounded by document length and skew-safe.)
    val wins = capped.queryExecution.executedPlan.collect {
      case win: org.apache.spark.sql.execution.window.WindowExec => win
    }
    assert(wins.forall(_.partitionSpec.forall(
      _.references.toSeq.forall(_.name != "_k"))),
      "no window may partition by the shingle key")
    assert(wins.forall(_.partitionSpec.nonEmpty),
      "a global (unpartitioned) window would serialize the corpus on one task")
    // the boilerplate shingles exceed the cap and are dropped, so no pair
    // survives on boilerplate alone
    assert(capped.count() === 0L)
    // every surviving inverted-index bucket is ≤ cap — the per-bucket
    // quadratic term is bounded regardless of how hot the corpus is
    val maxBucket = corpus
      .select(col("doc_id"), explode(TextAnalysis.shingles(col("text"), 3)).as("_k"))
      .groupBy("_k").count()
      .where(col("count") <= cap)
      .agg(max("count")).head().getLong(0)
    assert(maxBucket <= cap)
    // true duplicates under the cap are still found
    val dup = "exactly the same long duplicated text body right here"
    val withDups = corpus.unionByName(
      Seq((100L, dup), (101L, dup)).toDF("doc_id", "text"))
    val pairs = Dedup.ngramJaccardPairs(withDups, "doc_id", "text",
      n = 3, threshold = 0.9, maxDF = Some(cap))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((100L, 101L)))
  }
}
