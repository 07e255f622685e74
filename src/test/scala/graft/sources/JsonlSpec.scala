package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  test("documents round-trip through JSONL exactly") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/docs"
    val docs = Tables.documents(spark, sfTiny)
    Jsonl.writeDocuments(docs, dir)
    val (back, corrupt) = Jsonl.readDocuments(spark, dir)
    assert(corrupt == 0L)
    assert(back.count() == docs.count())
    // exact content equality both directions
    assert(back.exceptAll(docs).count() == 0)
    assert(docs.exceptAll(back).count() == 0)
  }

  test("malformed lines are captured, not silently dropped") {
    val dir = Files.createTempDirectory("graft_jsonl_bad").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.json")
    f.println("""{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}""")
    f.println("""{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}""")
    f.println("""{"doc_id": 3, "text": "truncated...""") // malformed
    f.println("""not json at all""")
    f.close()
    val (clean, corrupt) = Jsonl.readDocuments(spark, dir)
    assert(corrupt == 2L)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // enforced schema: no inference — types exactly as declared
    assert(clean.schema("doc_id").dataType.typeName == "long")
    assert(clean.schema("n_chars").dataType.typeName == "long")
  }
}

class PartitionPruneSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned layout prunes non-matching partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part").toString + "/events"
    Tables.events(spark, sfTiny)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val read = spark.read.parquet(dir).filter($"event_type" === "purchase")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(800))
    assert(plan.contains("event_type"), "partition filter lost:\n" + plan.take(800))
    // the pruned scan reads ONLY the purchase partition's rows
    val expected = Tables.events(spark, sfTiny)
      .filter($"event_type" === "purchase").count()
    assert(read.count() == expected)
    // and a full scan of one partition dir agrees (layout is real)
    val direct = spark.read.parquet(s"$dir/event_type=purchase").count()
    assert(direct == expected)
  }
}
