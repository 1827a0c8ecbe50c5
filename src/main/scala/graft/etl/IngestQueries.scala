package graft.etl

import graft.{Query, Tables}
import graft.functions.{Hashing, TextFunctions}
import org.apache.spark.sql.functions._

/** Additional ingestion + composite-pipeline queries (SURVEY §2.7). */
object IngestQueries {

  private val documentsSchemaJson =
    """{"fields": [
      |  {"name": "doc_id",  "type": "INTEGER", "mode": "REQUIRED"},
      |  {"name": "text",    "type": "STRING"},
      |  {"name": "lang",    "type": "STRING"},
      |  {"name": "source",  "type": "STRING"},
      |  {"name": "n_chars", "type": "INTEGER"}
      |]}""".stripMargin

  val entries: Seq[(String, Query)] = Seq(

    // JSON-lines round-trip: documents -> jsonl -> schema'd read. Green
    // iff the jsonl path is lossless and typed; oracle is the straight
    // parquet projection.
    "etl_ingest_jsonl" -> Query(
      (s, d) => {
        val dir = s"/root/repo/target/tmp/jsonl_${new java.io.File(d).getName}"
        Tables.documents(s, d).write.mode("overwrite").json(dir)
        graft.sources.Sources
          .jsonlWithJsonSchema(s, dir, documentsSchemaJson)
          .select(col("doc_id"), md5(col("text")).as("text_md5"),
            col("lang"), col("source"), col("n_chars"))
      },
      Some("""SELECT doc_id, md5(text) AS text_md5, lang, source,
             |       CAST(n_chars AS BIGINT) AS n_chars
             |FROM documents""".stripMargin)
    ),

    // End-to-end corpus curation composite: quality filter -> exact
    // dedup (min doc_id survivor) -> near-dup drop (SimHash band
    // collision with a better-quality doc) -> clean corpus stats per
    // source. Chains the engine's text + dedup stages the way a real
    // curation run would; rows-only check (the full chain is covered
    // piecewise by the oracle-checked stage queries).
    "pipeline_corpus_curation" -> Query(
      (s, d) => {
        val toks = TextFunctions.cleanTokens(col("text"))
        val scored = Tables.documents(s, d)
          .withColumn("quality", TextFunctions.qualityScore(col("text")))
          .filter(col("quality") >= 0.3 && size(toks) >= 3)
        val exact = scored
          .withColumn("h", md5(col("text")))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("h"))
              .orderBy(col("doc_id"))))
          .filter(col("rn") === 1).drop("rn", "h")
        val sims = exact.select(col("doc_id"), col("quality"))
          .join(graft.dedup.SimHash.relational(
            exact.select(col("doc_id"), col("text")), "doc_id", "text"), Seq("doc_id"))
        val bands = sims.select(col("doc_id"), col("quality"), col("sim"),
          explode(array((0 until 4).map(b =>
            struct(lit(b).as("bi"), Hashing.simHashBand(col("sim"), b).as("bk"))): _*)).as("bd"))
          .select(col("doc_id"), col("quality"), col("sim"),
            col("bd.bi").as("bi"), col("bd.bk").as("bk"))
        // drop any doc that band-collides with a strictly better one
        val losers = bands.as("a").join(bands.as("b"),
            col("a.bi") === col("b.bi") && col("a.bk") === col("b.bk") &&
              (col("b.quality") > col("a.quality") ||
               (col("b.quality") === col("a.quality") && col("b.doc_id") < col("a.doc_id"))) &&
              Hashing.hamming60(col("a.sim"), col("b.sim")) <= 20)
          .select(col("a.doc_id").as("doc_id")).distinct()
        val clean = exact.join(losers, Seq("doc_id"), "left_anti")
        clean.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            round(avg(col("quality")), 4).as("avg_quality"))
      },
      None
    )
  )
}
