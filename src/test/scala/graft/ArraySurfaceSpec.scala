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

  test("x29 chunk geometry: stride starts, 8-token overlap, exact reassembly") {
    val d = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x29_chunk_overlap")(spark, d).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val texts = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byDoc.keySet === texts.keySet)
    byDoc.foreach { case (docId, chunks) =>
      val toks = texts(docId).split(" ", -1)
      val sorted = chunks.sortBy(_.getLong(1))
      // chunk_idx is dense from 0; starts cover every stride step
      assert(sorted.map(_.getLong(1)).toSeq === sorted.indices.map(_.toLong))
      assert(sorted.length === (toks.length + 23) / 24)
      sorted.foreach { c =>
        val start = c.getLong(1).toInt * 24
        val expect = toks.slice(start, start + 32)
        assert(c.getString(2) === expect.mkString(" "), s"doc $docId chunk ${c.getLong(1)}")
        assert(c.getLong(3) === math.min(toks.length - start, 32).toLong)
      }
      // consecutive full windows overlap by exactly 8 tokens
      sorted.sliding(2).foreach {
        case Array(a, b) if a.getLong(3) == 32L =>
          val aT = a.getString(2).split(" ", -1)
          val bT = b.getString(2).split(" ", -1)
          assert(aT.drop(24).sameElements(bT.take(8)),
            s"doc $docId chunks ${a.getLong(1)}/${b.getLong(1)} must share the 8-token seam")
        case _ => ()
      }
    }
  }
}
