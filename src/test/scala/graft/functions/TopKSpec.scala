package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topK keeps the k best under (score desc, id asc), any partitioning") {
    val rows = Seq(
      ("a", 0.9, 1L), ("a", 0.9, 2L), ("a", 0.5, 3L), ("a", 0.99, 4L),
      ("a", 0.7, 5L), ("b", 0.1, 6L))
    // 1 partition vs 7 partitions must agree (merge-order independence)
    val results = Seq(1, 7).map { np =>
      rows.toDF("g", "s", "id").repartition(np)
        .groupBy("g").agg(TopK.topK(3)(col("s"), col("id")).as("top"))
        .select(col("g"), col("top"))
        .as[(String, Seq[(Double, Long)])].collect().toMap
    }
    assert(results(0) == results(1))
    assert(results(0)("a") == Seq((0.99, 4L), (0.9, 1L), (0.9, 2L)))
    assert(results(0)("b") == Seq((0.1, 6L)))
  }

  test("TopKAgg reduce/merge are order-insensitive and bounded") {
    val agg = new TopK.TopKAgg[TopK.Scored](2,
      Ordering.by { case (s, id) => (-s, id) }, null)
    val items = Seq((0.1, 9L), (0.5, 2L), (0.5, 1L), (0.9, 7L))
    val forward = items.foldLeft(agg.zero)(agg.reduce)
    val backward = items.reverse.foldLeft(agg.zero)(agg.reduce)
    assert(forward == backward)
    assert(forward == Seq((0.9, 7L), (0.5, 1L)))
    val (l, r) = items.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    assert(merged == forward)
  }
}
