package graft.ops

import graft.SparkSpec

/** `Dedup.prefixJaccardPairs` must produce EXACTLY the all-pairs
  * `jaccardPairs` output (the prefix-filtering lemma's completeness
  * claim), including at a threshold whose ⌈τ|S|⌉ is a non-trivial
  * integer ceiling. Corpus: deterministic sliding windows over a small
  * vocab, which plants near-dup pairs at many different Jaccard levels. */
class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private val vocab = (0 until 30).map(i => s"w$i")
  // doc i = 12 consecutive vocab words starting at (i * 3) mod 30 —
  // neighbors overlap 9/15 words, so shingle Jaccard spans a wide range
  private val docs = (0L until 40L).map { i =>
    val start = (i * 3 % 30).toInt
    val words = (0 until 12).map(j => vocab((start + j) % 30))
    (i, words.mkString(" "))
  }.toDF("doc_id", "text")

  private def runBoth(tNum: Int, tDen: Int): Unit = {
    val brute = Dedup.jaccardPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = tNum.toDouble / tDen)
      .orderBy($"id_a", $"id_b").collect().toSeq
    val prefix = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        shingleK = 3, tNum = tNum, tDen = tDen)
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(prefix === brute, s"prefix join diverged at tau=$tNum/$tDen")
    assert(brute.nonEmpty, s"degenerate test: no pairs at tau=$tNum/$tDen")
  }

  test("prefix join == brute force at tau=1/2") { runBoth(1, 2) }

  test("sortedIntersectCount == size(array_intersect) on sorted-distinct arrays") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted
      (a, b)
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(5L)))
    val df = rows.toDF("a", "b")
      .withColumn("kernel",
        graft.functions.HashOps.sortedIntersectCount(col("a"), col("b")))
      .withColumn("builtin", size(array_intersect(col("a"), col("b"))).cast("long"))
    assert(df.filter(col("kernel") =!= col("builtin")).isEmpty)
  }
  test("prefix join == brute force at tau=3/10 (non-dyadic ceiling)") {
    runBoth(3, 10)
  }
  test("prefix join == brute force at tau=7/10 (short prefixes)") {
    val brute = Dedup.jaccardPairs(docs, "doc_id", "text",
        shingleK = 3, threshold = 0.7)
      .orderBy($"id_a", $"id_b").collect().toSeq
    val prefix = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        shingleK = 3, tNum = 7, tDen = 10)
      .orderBy($"id_a", $"id_b").collect().toSeq
    assert(prefix === brute)
  }
}
