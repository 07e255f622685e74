package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.etl.Matching

class MultiContainsSpec extends SparkSpec {
  import spark.implicits._

  val keywords = Seq("PC200-8", "PC2", "SANY", "CAT", "ANY", "XCMG", "PC200",
    "A", "ZAXIS", "KOMATSU", "K", "OMA", "ATSU")

  val texts = Seq(
    "KOMATSU PC200-8 UNIT", "SANY MACHINE", "NOTHING HERE IS MATCHED???",
    "PC2 ONLY", "CATALOG", "", "XCMG AND SANY AND KOMATSU")

  test("automaton first-by-order equals chained-contains semantics") {
    val df = texts.toDF("t")
    val viaAc = df.select(MultiContains.multiContainsFirst($"t", keywords)).as[Option[String]].collect()
    val viaLit = df.select(Matching.literalFirstMatch(Seq($"t"), keywords)).as[Option[String]].collect()
    assert(viaAc.toSeq == viaLit.toSeq)
  }

  test("automaton longest equals literal longest semantics") {
    val df = texts.toDF("t")
    val viaAc = df.select(MultiContains.multiContainsLongest($"t", keywords)).as[Option[String]].collect()
    val viaLit = df.select(Matching.literalLongestMatch($"t", keywords)).as[Option[String]].collect()
    assert(viaAc.toSeq == viaLit.toSeq)
  }

  test("overlapping + prefix keywords resolve by list order") {
    // "CATALOG" contains CAT (idx 3) and A (idx 7) and also "ATALOG"? no —
    // first by order is CAT; automaton must not early-stop at A
    val got = Seq("CATALOG").toDF("t")
      .select(MultiContains.multiContainsFirst($"t", keywords)).as[String].head()
    assert(got == "PC200-8" == false && got == "CAT")
  }

  test("null text → null, no keyword → null") {
    val got = Seq(Option.empty[String], Some("zzz")).toDF("t")
      .select(MultiContains.multiContainsFirst($"t", Seq("A", "B"))).as[Option[String]].collect()
    assert(got.toSeq == Seq(None, None))
  }

  test("multi-text NUL join cannot match across boundaries") {
    val df = Seq(("AB", "CD")).toDF("x", "y")
    val got = df.select(Matching.firstMatchAuto(Seq($"x", $"y"),
      (1 to 20).map(i => s"K$i") :+ "BC", automatonThreshold = 1)).as[Option[String]].head()
    assert(got.isEmpty) // "BC" spans the boundary → must NOT match
  }

  test("a multi-word brand spanning the description/supplier boundary does not match") {
    // A space separator would concatenate to "CRANE JOHN DEERE 200" and
    // falsely match; the NUL separator must not.
    val kws = (1 to 20).map(i => s"K$i") :+ "JOHN DEERE"
    val df = Seq(("CRANE JOHN", "DEERE 200"), ("JOHN DEERE 850", "OTHER")).toDF("x", "y")
    val got = df.select(Matching.firstMatchAuto(Seq($"x", $"y"), kws,
      automatonThreshold = 1)).as[Option[String]].collect()
    assert(got.toSeq == Seq(None, Some("JOHN DEERE")))
  }

  test("firstMatchAuto picks identical results on both sides of the threshold") {
    val df = texts.toDF("t")
    val small = df.select(Matching.firstMatchAuto(Seq($"t"), keywords, automatonThreshold = 99))
      .as[Option[String]].collect()
    val auto = df.select(Matching.firstMatchAuto(Seq($"t"), keywords, automatonThreshold = 1))
      .as[Option[String]].collect()
    assert(small.toSeq == auto.toSeq)
  }
}

class HashOpsSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import graft.functions.HashOps
  import graft.ops.Dedup

  test("md5Prefix60Array and minhashSigFast are bit-identical to the lambda forms") {
    val docs = graft.Tables.documents(spark, sfTiny)
      .select($"doc_id", Dedup.shingles($"text", 3).as("sh"))
    val both = docs
      .withColumn("hs_fast", HashOps.md5Prefix60Array($"sh"))
      .withColumn("hs_ref", transform($"sh", s => Dedup.baseHash(s)))
      .withColumn("sig_fast", HashOps.minhashSigFast($"hs_fast", 16))
      .withColumn("sig_ref", Dedup.minhashSignatureFromHashes($"hs_ref", 16))
    assert(both.filter(not($"hs_fast" <=> $"hs_ref")).count() == 0)
    assert(both.filter(not($"sig_fast" <=> $"sig_ref")).count() == 0)
    // empty shingle set → all-zero signature, both paths
    val empty = Seq(Array.empty[Long]).toDF("hs")
    val z = empty.select(HashOps.minhashSigFast($"hs", 4)).as[Seq[Long]].head()
    assert(z == Seq(0L, 0L, 0L, 0L))
    // null hash array → all-zero too, matching the declarative coalesce(_, 0L)
    val nullIn = Seq(Option.empty[Array[Long]]).toDF("hs")
    val zFused = nullIn.select(HashOps.minhashSigFast($"hs", 4)).as[Seq[Long]].head()
    val zDecl = nullIn.select(Dedup.minhashSignatureFromHashes($"hs", 4)).as[Seq[Long]].head()
    assert(zFused == Seq(0L, 0L, 0L, 0L) && zDecl == zFused)
    // null TEXT: fused and declarative shingles agree (both null)
    val nullTxt = Seq(Option.empty[String]).toDF("t")
    val sh = nullTxt.select(Dedup.shingles($"t").isNull, Dedup.shinglesDeclarative($"t").isNull)
      .as[(Boolean, Boolean)].head()
    assert(sh == ((true, true)))
  }
}

class VectorCodegenSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.functions.VectorOps

  test("vector kernels generate compilable code (no silent interpreted fallback)") {
    val emb = graft.Tables.embeddings(spark, sfTiny)
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val df = emb.select($"vec_id",
        VectorOps.cosineSim($"embedding", $"embedding").as("c"),
        VectorOps.dotLiteral($"embedding", Array.fill(64)(0.5)).as("d"),
        VectorOps.norm2Fast($"embedding").as("n"))
      val rows = df.collect()
      assert(rows.length == emb.count())
      // the projection stays inside a WholeStageCodegen span (starred stage)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("*(1)"), "projection fell out of whole-stage codegen:\n" + plan)
      rows.foreach { r =>
        assert(math.abs(r.getDouble(1) - 1.0) < 1e-12) // cos(v, v) == 1
        assert(!r.isNullAt(2) && !r.isNullAt(3))
      }
      // short-array → null path in generated code
      val short = Seq(Tuple1(Array(1.0f))).toDF("v")
        .select(VectorOps.dotLiteral($"v", Array(1.0, 2.0)).as("d"))
      assert(short.collect().head.isNullAt(0))
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }
}
