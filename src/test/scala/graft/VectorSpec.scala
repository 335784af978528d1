package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.sample.Sampling
import graft.vector.KnnJoin

class VectorSpec extends AnyFunSuite {
  import SparkTestSession._

  test("broadcast heap kNN agrees exactly with the declarative form") {
    val e = Tables(spark, sf).embeddings
    val cross = KnnJoin.exactCross(e, e, 3)
      .select(col("query_id"), col("rank"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val heap = KnnJoin.exactBroadcast(spark, e, e, 3)
      .collect().map(h => (h.query_id, h.rank.toLong, h.neighbor_id)).toSet
    assert(cross == heap)
  }

  test("LSH approx kNN has usable recall vs exact on sf0.001") {
    val e = Tables(spark, sf).embeddings
    val exact = KnnJoin.exactCross(e, e, 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = KnnJoin.approxLsh(spark, e, e, 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall > 0.5, s"recall $recall too low")
  }

  test("hash split fractions are close to requested and deterministic") {
    val d = Tables(spark, sf).documents
    val s1 = Sampling.hashSplit(d, col("doc_id"), 0.8)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = s1.values.sum.toDouble
    assert(math.abs(s1("train") / total - 0.8) < 0.1)
    val s2 = Sampling.hashSplit(d.repartition(7), col("doc_id"), 0.8)
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s1 == s2, "split must not depend on partitioning")
  }

  test("doc split keeps all rows of a source on one side") {
    val d = Tables(spark, sf).documents
    val n = Sampling.docSplit(d, col("source"), 0.8)
      .groupBy("source").agg(countDistinct("split").as("k"))
      .filter(col("k") > 1).count()
    assert(n == 0)
  }

  test("statistical sample size reproduces the reference's 136") {
    assert(Sampling.sampleSize(1.96, 0.9021, 0.05) == 136L)
  }

  test("balanced sample returns exactly n per label") {
    val e = Tables(spark, sf).embeddings
    val counts = Sampling.balancedSample(e, col("label"), 10, col("vec_id"))
      .groupBy("label").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 10))
  }
}

class MlSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._

  test("MLP head trains and beats random guessing on its train set") {
    val preds = graft.vector.MlPack.mlpClassify(spark, sf).collect()
    val acc = preds.count(r => r.getLong(1) == r.getLong(2)).toDouble / preds.length
    assert(preds.length == 500)
    assert(acc > 0.2, s"train accuracy $acc should beat 10-class chance")
  }
}

class IvfSpec extends org.scalatest.funsuite.AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  test("IVF approx kNN reaches usable recall and never exceeds k") {
    val e = graft.core.Tables(spark, sf).embeddings
    val exact = graft.vector.KnnJoin.exactCross(e, e, 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.vector.KnnJoin.approxIvf(spark, e, e, 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ivf.groupBy(_._1).values.forall(_.length <= 3))
    val recall = (exact intersect ivf.toSet).size.toDouble / exact.size
    assert(recall > 0.3, s"IVF recall $recall too low")
  }

  test("IVF is deterministic across runs") {
    val e = graft.core.Tables(spark, sf).embeddings
    def run() = graft.vector.KnnJoin.approxIvf(spark, e, e, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run() == run())
  }
}
