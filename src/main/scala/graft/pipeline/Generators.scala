package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, distributed data generators matching the reference's
  * semantics (G1–G3; reference `generate_transaction.py:6-47`,
  * `data_processing.py:34-80`, `data_processing.py:85-131`) but Spark-native:
  * `spark.range(n)` + hash-derived columns instead of driver-side
  * Faker/`random` loops, so generation parallelizes across executors and is
  * reproducible (the reference is nondeterministic — `random.randint`,
  * `datetime.now()` at `generate_transaction.py:20-32`; SURVEY §7.4.10).
  *
  * At 100 TB: `spark.range` partitions the id space evenly; every derived
  * column is a codegen'd expression on the partition — zero shuffle, zero
  * driver involvement, linear scaling with executor count.
  */
object Generators {

  /** Fixed "now" so timestamps are reproducible (reference uses
    * `datetime.now()` — SURVEY §7.4.8 requires timezone-free arithmetic).
    * 2024-06-01 00:00:00 UTC.
    */
  private val anchorEpoch: Long = 1717200000L

  private def pick(c: org.apache.spark.sql.Column, vs: Seq[String]) =
    element_at(array(vs.map(lit): _*), (pmod(c, lit(vs.size)) + 1).cast("int"))

  /** u64-ish uniform in [0, m) derived from (id, seed, salt). */
  private def u(id: org.apache.spark.sql.Column, seed: Long, salt: String, m: Long) =
    pmod(xxhash64(id, lit(seed), lit(salt)), lit(m))

  /** G1 — transactions (reference `generate_transaction.py:6-47`):
    * uuid-shaped id, customer_id∈[1000,50000], product_id='PROD'+[100,999],
    * timestamp within the 365 days before the anchor (formatted
    * `yyyy-MM-dd HH:mm:ss`), quantity∈[1,10], price=round(U(5,500),2),
    * store/payment domains. `badTsEvery`>0 injects malformed timestamps
    * (1-in-N rows) to exercise the F1 coerce-filter (FIXTURES.md §2.1).
    */
  def transactions(spark: SparkSession, n: Long, seed: Long = 42L,
      badTsEvery: Long = 0L): DataFrame = {
    val id = col("id")
    val tsCol = from_unixtime(lit(anchorEpoch) - u(id, seed, "ts", 365L * 86400L),
      "yyyy-MM-dd HH:mm:ss")
    val maybeBadTs =
      if (badTsEvery > 0)
        when(u(id, seed, "bad", badTsEvery) === 0, lit("not-a-timestamp"))
          .otherwise(tsCol)
      else tsCol
    spark.range(n).select(
      // uuid4-shaped deterministic surrogate (reference :19 uses uuid4)
      regexp_replace(md5(concat(lit("txn"), id, lit(seed))),
        "^(.{8})(.{4})(.{4})(.{4})(.{12})$", "$1-$2-$3-$4-$5").as("transaction_id"),
      (lit(1000) + u(id, seed, "cust", 49001L)).as("customer_id"),
      concat(lit("PROD"), lit(100) + u(id, seed, "prod", 900L)).as("product_id"),
      maybeBadTs.as("transaction_timestamp"),
      (lit(1) + u(id, seed, "qty", 10L)).as("quantity"),
      round(lit(5.0) + u(id, seed, "price", 495000L) / lit(1000.0), 2).as("price"),
      pick(u(id, seed, "store", 4L), Seq("online", "store_A", "store_B", "mobile_app"))
        .as("store_location"),
      pick(u(id, seed, "pay", 4L), Seq("credit_card", "paypal", "cash", "bank_transfer"))
        .as("payment_method"))
  }

  /** G2 — customers (reference `data_processing.py:34-80`): unique ids
    * sampled without replacement from [lo,hi] (clamped like `:54-56`),
    * synthetic name/email/city/country, registration date within 2024,
    * segment∈{A,B,C,D} with 1-in-`nullSegEvery` nulls (the curated layer
    * must fill those with 'Unknown' — FIXTURES.md §2.2).
    *
    * Sampling without replacement = order the id domain by a seeded hash and
    * take n — a top-k over the domain, not a full sort at scale.
    */
  def customers(spark: SparkSession, n: Long, seed: Long = 42L,
      idLo: Long = 1000L, idHi: Long = 50000L,
      nullSegEvery: Long = 0L): DataFrame = {
    val clamped = math.min(n, idHi - idLo + 1)
    val id = col("id")
    val cities = Seq("Springfield", "Rivertown", "Lakeside", "Hillview",
      "Portsmouth", "Greenfield", "Fairmont", "Oakdale")
    val countries = Seq("USA", "Canada", "Germany", "France", "Japan",
      "Brazil", "India", "Australia")
    val seg = pick(u(id, seed, "seg", 4L), Seq("A", "B", "C", "D"))
    val maybeNullSeg =
      if (nullSegEvery > 0)
        when(u(id, seed, "segnull", nullSegEvery) === 0, lit(null: String))
          .otherwise(seg)
      else seg
    // sample-without-replacement via seeded-hash order + limit: plans as a
    // TakeOrderedAndProject bounded heap (no global sort) — right for this
    // ≤49k-id dim domain. Do NOT reuse the pattern to sample a LARGE table:
    // limit(k) for huge k regresses to a single-reducer global sort; sample
    // big tables with a pure hash predicate (xxhash64(id) % m < t) instead.
    spark.range(idLo, idHi + 1)
      .orderBy(xxhash64(id, lit(seed), lit("sample")))
      .limit(clamped.toInt)
      .select(
        id.as("customer_id"),
        concat(lit("Customer "), id).as("customer_name"),
        concat(lit("customer"), id, lit("@example.com")).as("customer_email"),
        pick(u(id, seed, "city", cities.size.toLong), cities).as("customer_city"),
        pick(u(id, seed, "country", countries.size.toLong), countries).as("customer_country"),
        from_unixtime(
          lit(1704067200L) + u(id, seed, "reg", 330L) * 86400L, // within 2024
          "yyyy-MM-dd").as("registration_date"),
        maybeNullSeg.as("customer_segment"))
  }

  /** G3 — products (reference `data_processing.py:85-131`): unique
    * 'PROD'+[100,999] ids, two-word name, 8-value category domain
    * (multi-word values included so T1 pandas-capitalize is exercised),
    * brand, weight=round(U(0.1,20),2).
    */
  def products(spark: SparkSession, n: Long, seed: Long = 42L,
      idLo: Long = 100L, idHi: Long = 999L): DataFrame = {
    val clamped = math.min(n, idHi - idLo + 1)
    val id = col("id")
    val adjectives = Seq("Swift", "Sturdy", "Bright", "Compact", "Deluxe",
      "Classic", "Modern", "Eco")
    val nouns = Seq("Widget", "Gadget", "Lamp", "Chair", "Bottle", "Speaker",
      "Notebook", "Blender")
    val categories = Seq("Electronics", "Books", "Clothing", "Home Goods",
      "Groceries", "Outdoors", "Toys", "Beauty")
    // bounded-heap sampling; see the note on customers() before reusing
    spark.range(idLo, idHi + 1)
      .orderBy(xxhash64(id, lit(seed), lit("psample")))
      .limit(clamped.toInt)
      .select(
        concat(lit("PROD"), id).as("product_id"),
        concat_ws(" ",
          pick(u(id, seed, "adj", adjectives.size.toLong), adjectives),
          pick(u(id, seed, "noun", nouns.size.toLong), nouns)).as("product_name"),
        pick(u(id, seed, "cat", categories.size.toLong), categories).as("product_category"),
        concat(lit("Brand "), u(id, seed, "brand", 50L)).as("product_brand"),
        round(lit(0.1) + u(id, seed, "wt", 19900L) / lit(1000.0), 2).as("product_weight_kg"))
  }

  /** Write a generated frame as a single-header CSV (the reference's
    * generators emit one CSV file — `generate_transaction.py:43-45`).
    */
  def writeCsv(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
  }
}
