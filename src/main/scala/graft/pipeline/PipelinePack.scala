package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.QueryPack

/** The flagship lifecycle (§3.2: split → train-index kNN → report)
  * under the oracle gate end-to-end — the whole pipeline, including
  * the hash split and the train/test asymmetry, replayed in SQL.
  */
object PipelinePack extends QueryPack {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p01_classify_lifecycle" ->
      ((s, d) => Lifecycles.classifyAndReport(s, d)))

  /** 0.8 split threshold: round(0.8·65536) = 52429 = 0xcccd (the same
    * constant `Sampling.hashSplit` derives). */
  private val splitCte = """
    |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label,
    |        CASE WHEN substr(md5('42' || CAST(vec_id AS VARCHAR)), 1, 4) < 'cccd'
    |             THEN 'train' ELSE 'test' END AS split
    |      FROM embeddings),
    |tr AS (SELECT * FROM e WHERE split = 'train'),
    |te AS (SELECT * FROM e WHERE split = 'test'),
    |pr AS (SELECT q.vec_id AS qid, n.vec_id AS nid, n.label AS nlabel,
    |        q.label AS tlabel, list_dot_product(q.v, n.v) AS sim
    |      FROM te q JOIN tr n ON true),
    |r AS (SELECT qid, nid, nlabel, tlabel, sim,
    |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rnk
    |      FROM pr),
    |p1 AS (SELECT qid, CAST(tlabel AS VARCHAR) AS t, CAST(nlabel AS VARCHAR) AS p
    |       FROM r WHERE rnk = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "p01_classify_lifecycle" -> graft.metrics.MetricsPack.reportSqlFrom(splitCte))
}
