package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Chunker, Dedup, LogStore}
import org.apache.spark.sql.functions._

/** The full training-data pipeline composed end-to-end on real testdata:
  * quality-filter → language-ID → fuzzy dedup → chunk/ingest → reassemble.
  * What a user of the engine actually runs, not operators in isolation.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("documents flow: filter -> langid -> dedup -> ingest -> reassemble") {
    val docs = Tables.documents(spark, Sf0001)
    val n0 = docs.count()

    // 1. cheap quality prefilter
    val scored = docs
      .withColumn("quality", TF.qualityScore(col("text")))
      .withColumn("lang_pred", TF.langId(col("text")))
    val kept = scored.where(col("quality") >= 0.2 && length(col("text")) > 0)
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. fuzzy dedup keeps one representative per near-dup cluster
    val deduped = Dedup.minhashDeduped(kept, minEstJaccard = 0.5)
    val n2 = deduped.count()
    assert(n2 > 0 && n2 <= n1)

    // 3. ingest through the log store (chunk + zip + lineage)
    val asLogs = deduped.select(
      col("doc_id").cast("string").as("user_id"),
      col("lang_pred").as("event_type"),
      lit("preview").as("trigger"),
      col("doc_id").as("js_time_of_creation"),
      col("text").as("payload")).as[LogStore.LogDoc]
    val ingested = LogStore.ingest(asLogs)
    assert(ingested.where(length(col("zipped_log")) > Chunker.MaxDocBytes).count() == 0)

    // 4. reassembly restores every surviving document byte-for-byte
    val restored = LogStore.reassemble(ingested)
      .select(col("user_id").cast("long").as("doc_id"), col("payload"))
    val diff = restored.join(deduped, "doc_id")
      .where(col("payload") =!= col("text")).count()
    assert(diff == 0)
    assert(restored.count() == n2)
  }
}
