package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks the latest right row at-or-before each left ts") {
    val trades = Seq(
      (1L, "K", ts("2024-01-01 10:00:00")),
      (2L, "K", ts("2024-01-01 10:05:00")),
      (3L, "K", ts("2024-01-01 09:00:00")), // before any quote
      (4L, "M", ts("2024-01-01 10:00:00"))) // other key
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (10L, "K", ts("2024-01-01 09:59:00"), 1.0),
      (11L, "K", ts("2024-01-01 10:00:00"), 2.0), // ties trade 1 → inclusive
      (12L, "K", ts("2024-01-01 10:04:00"), 3.0),
      (13L, "M", ts("2024-01-01 09:00:00"), 9.0))
      .toDF("quote_id", "sym", "t", "px")
    val got = AsOf.asofBackward(trades, "sym", "t", quotes, "sym", "t",
        carry = Seq("quote_id", "px"), outPrefix = "q_")
      .select($"trade_id", $"q_quote_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got(1L) == Some(11L)) // equal ts is visible (inclusive)
    assert(got(2L) == Some(12L))
    assert(got(3L) == None)      // nothing precedes → nulls
    assert(got(4L) == Some(13L))
  }

  test("ties on right timestamp resolve to the largest carry payload") {
    val l = Seq((1L, "K", ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val r = Seq(
      (7L, "K", ts("2024-01-01 11:00:00"), 1.0),
      (9L, "K", ts("2024-01-01 11:00:00"), 2.0),
      (8L, "K", ts("2024-01-01 11:00:00"), 3.0))
      .toDF("rid", "k", "t", "v")
    val got = AsOf.asofBackward(l, "k", "t", r, "k", "t", Seq("rid", "v"))
      .select($"asof_rid").as[Long].head()
    assert(got == 9L) // max rid wins on equal ts — deterministic
  }

  test("matches the brute-force window formulation on real events") {
    val ev = Tables.events(spark, sfTiny)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id", $"value")
    val nonP = ev.filter($"event_type" =!= "purchase")
    val fast = AsOf.asofBackward(nonP, "user_id", "ts", purchases, "user_id", "ts",
        Seq("event_id"), "lp_")
      .select($"event_id", $"lp_event_id")
      .as[(Long, Option[Long])].collect().toMap
    // brute force: theta join + argmax
    val brute = nonP.as("e").join(purchases.as("p"),
        col("p.user_id") === col("e.user_id") && col("p.ts") <= col("e.ts"), "left")
      .groupBy(col("e.event_id").as("eid"))
      .agg(max(struct(col("p.ts"), col("p.event_id"))).as("b"))
      .select($"eid", $"b.event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == brute)
  }
  test("forward as-of picks the earliest right row at-or-after each left ts") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "a"),
      (1L, ts("2024-01-01 12:00:00"), "b"), // equal-ts right is INCLUSIVE
      (1L, ts("2024-01-01 23:00:00"), "c"), // nothing after → nulls
      (2L, ts("2024-01-01 10:00:00"), "d")  // other key never crosses
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 100L),
      (1L, ts("2024-01-01 12:00:00"), 200L),
      (1L, ts("2024-01-01 13:00:00"), 300L),
      (2L, ts("2024-01-01 10:30:00"), 900L)
    ).toDF("k", "t", "v")
    val out = AsOf.asofForward(left, "k", "t", right, "k", "t",
        carry = Seq("v"), outPrefix = "nx_")
      .select($"tag", $"nx_v").as[(String, Option[Long])].collect().toMap
    assert(out("a").contains(100L))
    assert(out("b").contains(200L)) // inclusive: the equal-ts right wins
    assert(out("c").isEmpty)
    assert(out("d").contains(900L))
  }

  test("forward as-of equal-ts right rows resolve to the largest payload") {
    val left = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 11:00:00"), 5L),
      (1L, ts("2024-01-01 11:00:00"), 9L) // same ts: larger payload wins
    ).toDF("k", "t", "v")
    val out = AsOf.asofForward(left, "k", "t", right, "k", "t", Seq("v"), "nx_")
      .select($"nx_v").as[Option[Long]].head()
    assert(out.contains(9L))
  }
}

class AsOfNearestSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, 100L, "p1"), (1L, 200L, "p2"), (2L, 50L, "p3"))
    .toDF("k", "t", "tag")

  test("nearest picks the closer side; equidistant ties go backward") {
    val right = Seq((1L, 90L, "b"), (1L, 110L, "f"), (1L, 300L, "far"))
      .toDF("k", "t", "v")
    val out = AsOf.asofNearest(left, "k", "t", right, "k", "t",
        Seq("v"), toleranceMicros = 1000L)
      .select($"tag", $"asof_v").as[(String, Option[String])].collect().toMap
    // p1 at 100: backward 90 (d=10) vs forward 110 (d=10) -> tie -> backward
    assert(out("p1").contains("b"))
    // p2 at 200: backward 110 (d=90) beats forward 300 (d=100) — the
    // carried value is the row AT t=110 (labeled "f")
    assert(out("p2").contains("f"))
  }

  test("tolerance excludes far matches; no-match rows carry nulls") {
    val right = Seq((1L, 90L, "b")).toDF("k", "t", "v")
    val out = AsOf.asofNearest(left, "k", "t", right, "k", "t",
        Seq("v"), toleranceMicros = 5L)
      .select($"tag", $"asof_v").as[(String, Option[String])].collect().toMap
    assert(out("p1").isEmpty, "match at distance 10 must not pass tolerance 5")
    assert(out("p3").isEmpty, "key with no right rows must be null")
  }

  test("equal-ts right row matches in BOTH directions (inclusive)") {
    val right = Seq((1L, 100L, "same")).toDF("k", "t", "v")
    val out = AsOf.asofNearest(left, "k", "t", right, "k", "t",
        Seq("v"), toleranceMicros = 0L)
      .select($"tag", $"asof_v").as[(String, Option[String])].collect().toMap
    assert(out("p1").contains("same"))
  }
}

class EmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed near-dup pairs = bucket-filtered subset of all-pairs truth") {
    val emb = Tables.embeddings(spark, sfTiny)
    val got = Dedup.embedDupPairs(emb, "vec_id", "embedding", 64, 4, 0.45)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // truth: all pairs ≥ threshold, then keep those sharing a bucket
    val b = emb.withColumn("bkt", Similarity.lshBucket($"embedding", 64, 4))
      .select($"vec_id", $"embedding", $"bkt")
    val truth = b.as("a").join(b.as("c"), col("a.vec_id") < col("c.vec_id"))
      .withColumn("sim", Similarity.cosine(col("a.embedding"), col("c.embedding")))
      .filter($"sim" >= 0.45 && col("a.bkt") === col("c.bkt"))
      .select(col("a.vec_id"), col("c.vec_id")).as[(Long, Long)].collect().toSet
    assert(got == truth)
    assert(got.nonEmpty, "sf0.001 corpus should yield at least one near-dup pair")
  }
}

class KmeansSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  lazy val emb = graft.Tables.embeddings(spark, sfTiny)

  test("k-means centroids are deterministic across partitionings") {
    val a = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 2)
    val b = Similarity.kmeansCentroids(emb.repartition(13), "vec_id", "embedding", 4, 2)
    assert(a.map(_._1) == b.map(_._1))
    a.zip(b).foreach { case ((_, va), (_, vb)) => assert(va.sameElements(vb)) }
  }

  test("fitting improves the clustering objective over the init assignment") {
    def objective(cs: Seq[(Int, Array[Float])]): Double = {
      val cands = cs.map { case (_, cv) =>
        graft.functions.VectorOps.dotLiteral($"embedding", cv.map(_.toDouble)) /
          (sqrt(graft.functions.VectorOps.norm2Fast($"embedding")) *
            lit(math.sqrt(cv.map(v => v.toDouble * v.toDouble).sum)))
      }
      emb.select(greatest(cands: _*).as("best"))
        .agg(avg($"best")).as[Double].head()
    }
    val init = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 0)
    val fit = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 3)
    assert(objective(fit) >= objective(init))
  }

  test("fitted centroids slot into ivfTopK; self-query returns itself first") {
    val cs = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 4, 2)
    val q = emb.filter($"vec_id" === 7).select($"embedding".as("qvec"))
    val top = Similarity.ivfTopK(emb, "vec_id", "embedding", q, cs, 5)
      .select("vec_id").as[Long].collect()
    assert(top.head == 7L)
  }
}

class AsOfPropertySpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def samples[A](g: org.scalacheck.Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: as-of equals brute-force argmax on random keyed timelines") {
    val row = for {
      k <- Gen.chooseNum(0, 5)
      t <- Gen.chooseNum(0L, 50L)
    } yield (k, new java.sql.Timestamp(t * 1000))
    val left = samples(row, 150).zipWithIndex
      .map { case ((k, t), i) => (i.toLong, k, t) }.toDF("lid", "k", "t")
    val right = samples(row, 150).zipWithIndex
      .map { case ((k, t), i) => (1000L + i, k, t) }.toDF("rid", "k", "t")
    val fast = AsOf.asofBackward(left, "k", "t", right, "k", "t", Seq("rid"))
      .select($"lid", $"asof_rid").as[(Long, Option[Long])].collect().toMap
    val brute = left.as("l").join(right.as("r"),
        col("r.k") === col("l.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.lid").as("lid"))
      .agg(max(struct(col("r.t"), col("r.rid"))).as("b"))
      .select($"lid", $"b.rid").as[(Long, Option[Long])].collect().toMap
    assert(fast == brute)
  }
}

class AnnRecallSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  lazy val emb = graft.Tables.embeddings(spark, sfTiny)
  private def ids(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_id").as[Long].collect().toSet
  lazy val q = emb.filter($"vec_id" === 0).select($"embedding".as("qvec"))
  lazy val exact = ids(Similarity.cosineTopK(emb, "vec_id", "embedding", q, 10))

  test("IVF with fitted k-means centroids reaches recall@10 >= 0.7") {
    val cs = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val ivf = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", q, cs, 10))
    assert(ivf.intersect(exact).size >= 7, s"ivf recall ${ivf.intersect(exact).size}/10")
  }

  test("multi-probe IVF recall is monotone in nprobe and hits 1.0 at nprobe=K") {
    val cs = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    def recall(nprobe: Int) =
      ids(Similarity.ivfTopKProbed(emb, "vec_id", "embedding", q, cs, 10, nprobe))
        .intersect(exact).size
    val r1 = recall(1); val r4 = recall(4); val r8 = recall(8)
    assert(r4 >= r1, s"nprobe=4 recall $r4 < nprobe=1 recall $r1")
    assert(r8 == 10, s"nprobe=K must equal brute force, got $r8/10")
    // nprobe=1 must agree with the single-cell path exactly
    assert(ids(Similarity.ivfTopKProbed(emb, "vec_id", "embedding", q, cs, 10, 1))
      == ids(Similarity.ivfTopK(emb, "vec_id", "embedding", q, cs, 10)))
  }

  test("recallAtK: one row per query, self always hits, recall in (0,1]") {
    val cs = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, 2)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.recallAtK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", cs, k = 10)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 10)
    out.foreach { case (qid, n, r) =>
      assert(n >= 1 && n <= 10, s"qid=$qid n_hits=$n") // self is in its own cell
      assert(r == n.toDouble / 10.0)
    }
  }

  test("recallAtK is exactly 1.0 with a single cell (IVF == brute force)") {
    val one = Seq(0 -> Array.fill(64)(0.1f))
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val out = Similarity.recallAtK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", one, k = 10)
      .select($"recall").as[Double].collect()
    assert(out.forall(_ == 1.0))
  }

  test("LSH recall floor holds and rises as planes decrease (bigger buckets)") {
    def lshRecall(planes: Int) =
      ids(Similarity.lshTopK(emb, "vec_id", "embedding", q, 64, planes, 10))
        .intersect(exact).size
    // 6 planes = 64 buckets: cheap, low recall BY DESIGN; 2 planes = 4
    // buckets: ~16x more candidates, recall must not be worse
    assert(lshRecall(6) >= 1)
    assert(lshRecall(2) >= lshRecall(6)) // 4 buckets vs 64: more candidates
  }
}

class ShinglesEquivalenceSpec extends graft.SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("fused shingler is bit-identical to the declarative slice/zip form") {
    val docs = graft.Tables.documents(spark, sfTiny).select($"text")
      .union(Seq("", "one", "one two", "one two three",
        "a  b   c d", "UPPER Case MiX", " lead", "trail ", "x x x x").toDF("text"))
    for (k <- Seq(2, 3, 4)) {
      val diff = docs.filter(
        not(Dedup.shingles($"text", k) <=> Dedup.shinglesDeclarative($"text", k)))
      assert(diff.count() == 0, s"k=$k mismatch")
    }
  }

}
