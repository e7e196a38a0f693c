package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Asserts the PRE-serialization array surface: the gate hashes
  * t14/t18/t19/n3 through Cols.djoin/ijoin/sjoin string joins (the
  * driver's comparator cannot hash raw array cells), so without this spec
  * array-typed result delivery — element types, nested arrays, map
  * values — would only ever be verified through its string rendering.
  */
class ArraySurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("t14 family delivers real array<double> results before djoin") {
    val out = Tables.lineitem(spark, sf)
      .orderBy("l_orderkey", "l_linenumber").limit(1)
      .withColumn("arr", array(col("l_quantity"), col("l_tax"), col("l_discount")))
      .select(
        col("arr"),
        slice(col("arr"), 1, 2).as("sl"),
        sort_array(col("arr")).as("so"),
        flatten(array(col("arr"), array(col("l_quantity")))).as("fl"))
    // schema: every column is a genuine ArrayType(DoubleType)
    out.schema.fields.foreach { f =>
      f.dataType match {
        case ArrayType(DoubleType, _) => ()
        case other => fail(s"${f.name}: expected array<double>, got $other")
      }
    }
    val r = out.head()
    val Seq(q, t, disc) = r.getSeq[Double](0)
    assert(r.getSeq[Double](1) === Seq(q, t))                  // slice keeps order
    assert(r.getSeq[Double](2) === Seq(q, t, disc).sorted)     // sort_array
    assert(r.getSeq[Double](3) === Seq(q, t, disc, q))         // flatten nests correctly
  }

  test("t18/t19 families deliver typed long arrays and map values") {
    val out = spark.range(1).select(
      transform(sequence(lit(1), lit(3)), x => x * 2).as("t"),
      filter(sequence(lit(1), lit(6)), x => x % 2 === 0).as("f"),
      zip_with(sequence(lit(1), lit(3)), sequence(lit(4), lit(6)), (a, b) => a * b).as("zw"),
      map_values(map(lit("q"), lit(1.5), lit("d"), lit(0.25))).as("mv"),
      map_keys(map(lit("q"), lit(1.5), lit("d"), lit(0.25))).as("mk"))
    assert(out.schema("t").dataType.asInstanceOf[ArrayType].elementType === IntegerType)
    assert(out.schema("mv").dataType.asInstanceOf[ArrayType].elementType === DoubleType)
    assert(out.schema("mk").dataType.asInstanceOf[ArrayType].elementType === StringType)
    val r = out.head()
    assert(r.getSeq[Int](0) === Seq(2, 4, 6))
    assert(r.getSeq[Int](1) === Seq(2, 4, 6))
    assert(r.getSeq[Int](2) === Seq(4, 10, 18))
    assert(r.getSeq[Double](3) === Seq(1.5, 0.25))
    assert(r.getSeq[String](4) === Seq("q", "d"))
  }

  test("n3 top-k aggregator returns a real array<double> before djoin") {
    val topk = udaf(new graft.functions.TopKDoubles(3))
    val out = Tables.events(spark, sf)
      .groupBy("event_type").agg(topk(col("value")).as("top_values"))
    assert(out.schema("top_values").dataType.asInstanceOf[ArrayType].elementType === DoubleType)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vs = r.getSeq[Double](1)
      assert(vs.size <= 3 && vs === vs.sorted.reverse) // bounded, descending
    }
  }
}
