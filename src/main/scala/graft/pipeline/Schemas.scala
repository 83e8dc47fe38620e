package graft.pipeline

import org.apache.spark.sql.types._

/** Pinned schemas for every table in the reference pipeline (SURVEY.md §1.2).
  * The reference deliberately avoids dtype inference by passing explicit
  * dtype maps to every CSV read (reference `data_processing.py:141-150`,
  * `flows.py:120-124`, `flows.py:182-190`); we mirror that with explicit
  * `StructType`s — `spark.read.schema(...)` never triggers an inference scan,
  * which also matters at 100 TB (no extra pass over the input).
  */
object Schemas {

  /** Transactions CSV — 8 columns (reference `data_processing.py:141-150`).
    * `transaction_timestamp` stays a string at read time; it is parsed with
    * coerce semantics downstream (F1), matching pandas `errors='coerce'`.
    */
  val transactionsCsv: StructType = StructType(Seq(
    StructField("transaction_id", StringType),
    StructField("customer_id", LongType),
    StructField("product_id", StringType),
    StructField("transaction_timestamp", StringType),
    StructField("quantity", LongType),
    StructField("price", DoubleType),
    StructField("store_location", StringType),
    StructField("payment_method", StringType)))

  /** Customers CSV — 7 columns (reference `flows.py:182-190`). */
  val customersCsv: StructType = StructType(Seq(
    StructField("customer_id", LongType),
    StructField("customer_name", StringType),
    StructField("customer_email", StringType),
    StructField("customer_city", StringType),
    StructField("customer_country", StringType),
    StructField("registration_date", StringType),
    StructField("customer_segment", StringType)))

  /** Products CSV — 5 columns (reference `flows.py:120-124`). */
  val productsCsv: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("product_name", StringType),
    StructField("product_category", StringType),
    StructField("product_brand", StringType),
    StructField("product_weight_kg", DoubleType)))

  /** Curated fact column order (reference `data_processing.py:253-263`). */
  val curatedFactColumns: Seq[String] = Seq(
    "transaction_id", "customer_id", "product_id", "transaction_date",
    "transaction_timestamp", "quantity", "price", "store_location",
    "payment_method")

  /** Curated customer-dim columns (reference `data_processing.py:301-309`). */
  val curatedCustomerColumns: Seq[String] = Seq(
    "customer_id", "customer_name", "customer_email", "customer_city",
    "customer_country", "registration_date", "customer_segment")

  /** Curated product-dim columns (reference `data_processing.py:359-365`). */
  val curatedProductColumns: Seq[String] = Seq(
    "product_id", "product_name", "product_category", "product_brand",
    "product_weight_kg")
}
