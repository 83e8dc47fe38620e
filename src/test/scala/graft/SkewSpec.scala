package graft

import org.apache.spark.sql.functions._

import graft.extensions.{Dedup, Skew}

/** Skew operators: salting must change the shuffle distribution, never the
  * result. Also covers the composite corpus-dedup pass.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // one hot key (90% of rows) + a long tail
    val n = 10000
    spark.range(n).select(
      when($"id" % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), $"id")).as("k"),
      ($"id" % 97).cast("double").as("v"))
  }

  test("saltedSumCount equals plain groupBy sum/count") {
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("sum_v"), count(lit(1)).as("count_rows"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, Seq("k"), "v", buckets = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("saltedJoin equals plain join, including duplicate build keys") {
    val probe = skewed
    val build = Seq(("hot", 1), ("hot", 2), ("k0", 3), ("absent", 4)).toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(probe, build, Seq("k"), buckets = 8)
      .groupBy("k", "tag").count()
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("dedupCorpus: keeps one rep per exact-dup group, never invents ids") {
    val docs = Tables.documents(spark, sf)
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", minJaccard = 0.5)
    val keptIds = kept.as[Long].collect().toSet
    val allIds = docs.select("doc_id").as[Long].collect().toSet
    assert(keptIds.subsetOf(allIds))
    assert(keptIds.nonEmpty)
    // exact dups collapsed: kept count <= distinct-fingerprint count
    val nFp = Dedup.exactGroups(docs, "doc_id", "text").count()
    assert(keptIds.size <= nFp)
    // every exact-dup group's min id survives candidate-free (group reps
    // can only be dropped by a verified near-dup with a smaller id)
    val minIds = Dedup.exactGroups(docs, "doc_id", "text")
      .select("keep_id").as[Long].collect().toSet
    assert(keptIds.subsetOf(minIds))
  }
}
