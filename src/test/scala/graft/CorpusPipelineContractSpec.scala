package graft

import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.ops.CorpusPipeline

/** The packing-item encoding contract (doc_id·10^6 + chunk_idx in one
  * sortable long) at both boundary edges: the largest encodable doc_id
  * round-trips exactly; one past it fails the job loudly instead of
  * silently overflowing into a wrong packing order. */
class CorpusPipelineContractSpec extends SparkSpec {

  // the bound leaves room for the LARGEST admissible chunk_idx (999999):
  // Long.MaxValue/10^6 itself would overflow at chunk_idx >= 775808
  private val MaxDoc = (Long.MaxValue - 999999L) / 1000000L

  // 24 distinct medium-length tokens incl. stopwords — passes every
  // qualityKeep rule (>=20 tokens, mean len 3-10, stopword ratio >= 1%,
  // low repetition) so the doc reaches the packing stage.
  private val okText = ("the quick brown foxes jumped over lazy sleeping dogs " +
    "while a gentle breeze carried autumn leaves across quiet village " +
    "streets toward distant mountain peaks tonight").trim

  private def docs(id: Long) = {
    import spark.implicits._
    Seq((id, okText, "en")).toDF("doc_id", "text", "lang")
  }

  test("largest encodable doc_id round-trips through the packed output") {
    val out = CorpusPipeline.run(docs(MaxDoc)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("doc_id") == MaxDoc)
      assert(r.getAs[Int]("chunk_idx") >= 0)
    }
  }

  test("doc_id one past the encodable bound fails the job, not the data") {
    // MaxDoc+1 == Long.MaxValue/10^6: admitted by the naive bound, but its
    // encoding overflows for chunk_idx >= 775808 — must be rejected
    val e = intercept[Exception] {
      CorpusPipeline.run(docs(MaxDoc + 1)).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[SparkException] ||
        Option(c.getMessage).exists(_.contains("CorpusPipeline item encoding"))),
      s"unexpected failure shape: $e")
  }

  test("negative doc_id is rejected (DIV/% decode would mis-order it)") {
    intercept[Exception] {
      CorpusPipeline.run(docs(-1L)).collect()
    }
  }

  test("pipeline v2: bins respect capacity, offsets are contiguous, hashes intact") {
    import spark.implicits._
    val out = CorpusPipeline.runV2(Tables.documents(spark, sfTiny),
        blocklist = Seq("order fast", "slow slow"), capacity = 256L)
      .as[(String, Long, Long, Long, Long, Long, String)].collect()
    assert(out.nonEmpty)
    // every doc fits its offsets: off_end − off_start == n_clean
    out.foreach { case (_, id, n, _, s, e, h) =>
      assert(e - s == n, s"doc $id offsets disagree with token count")
      assert(h.length == 32, s"doc $id cleaned_hash not an md5")
    }
    // per (stratum, bin): total ≤ capacity unless a single oversized doc;
    // offsets tile [0, fill) without gaps in id order
    out.groupBy(t => (t._1, t._4)).foreach { case ((g, bin), items) =>
      val sorted = items.sortBy(_._2)
      val fill = sorted.map(_._3).sum
      assert(fill <= 256L || sorted.length == 1, s"($g,$bin) overfilled: $fill")
      var cursor = 0L
      sorted.foreach { case (_, id, n, _, s, e, _) =>
        assert(s == cursor, s"($g,$bin) doc $id starts at $s, expected $cursor")
        cursor = e
      }
    }
    // survivors are a subset of the input and unique
    assert(out.map(_._2).distinct.length == out.length)
  }
}
