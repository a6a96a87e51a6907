package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, Sf0001)

  test("stratified: rates honored within tolerance, absent strata dropped") {
    val fr = Map("en" -> 0.8, "es" -> 0.2)
    val out = Sampling.stratified(docs, "lang", "doc_id", fr)
    val byLang = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.keySet.subsetOf(fr.keySet))
    fr.foreach { case (lang, rate) =>
      if (total.contains(lang)) {
        val got = byLang.getOrElse(lang, 0L).toDouble / total(lang)
        assert(math.abs(got - rate) < 0.15, s"$lang: got $got want ~$rate")
      }
    }
  }

  test("sampling is reproducible and layout-independent") {
    val a = Sampling.stratified(docs, "lang", "doc_id", Map("en" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratified(docs.repartition(7), "lang", "doc_id", Map("en" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample must follow row content, not partition layout")
  }

  test("mix honors per-source rates and keeps all columns") {
    val en = docs.where(col("lang") === "en")
    val rest = docs.where(col("lang") =!= "en")
    val mixed = Sampling.mix(Seq(en -> 1.0, rest -> 0.1), "doc_id")
    assert(mixed.columns.toSeq == docs.columns.toSeq)
    val nEn = mixed.where(col("lang") === "en").count()
    assert(nEn == en.count(), "rate 1.0 must keep everything")
    val nRest = mixed.where(col("lang") =!= "en").count()
    assert(nRest < rest.count() / 2, "rate 0.1 must drop most rows")
  }
}
