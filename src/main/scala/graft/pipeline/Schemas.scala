package graft.pipeline

import org.apache.spark.sql.types._

/** Canonical declared output schemas (SURVEY.md §1.2 — Postgres naming is
  * canonical; the S3 variant maps via [[Extract.toS3Naming]]).
  * `SchemaSpec` asserts the extraction plan conforms.
  */
object Schemas {
  private def f(n: String, t: DataType, nullable: Boolean) = StructField(n, t, nullable)

  val payments: StructType = StructType(Seq(
    f("source", StringType, nullable = true),
    f("destination", StringType, nullable = true),
    f("amount", DoubleType, nullable = true),
    f("memo_text", StringType, nullable = true),
    f("fee", IntegerType, nullable = true),
    f("fee_charged", IntegerType, nullable = true),
    f("operation_index", IntegerType, nullable = false),
    f("tx_status", StringType, nullable = true),
    f("op_status", StringType, nullable = true),
    f("hash", StringType, nullable = true),
    f("time", TimestampType, nullable = true)))

  val creations: StructType = StructType(
    payments.fields.map(x => if (x.name == "amount") x.copy(name = "starting_balance") else x))

  val operations: StructType = StructType(
    StructField("type", StringType, nullable = false) +:
      (payments.fields.take(2) ++
        Array(
          StructField("amount", DoubleType, nullable = true),
          StructField("starting_balance", DoubleType, nullable = true)) ++
        payments.fields.drop(3)))
}
