package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `chunk(text, size, overlap)` as a Catalyst table Generator
  * (SURVEY.md §2.11/§7.3: the F14 chunker exposed to SQL as a 1→N
  * generator usable in LATERAL VIEW / SELECT position).
  *
  * One output row per chunk: (chunk_idx, start_word, chunk_text).
  * Reference semantics (`faiss_new_.py:400-410`): whitespace words,
  * starts at 0, step = size − overlap, last chunk may be short.
  * Generators run outside expression codegen by design
  * (CodegenFallback is the standard posture — Spark's own `explode`
  * generator nodes work the same way); the per-row work is one
  * split + slicing.
  */
case class ChunkWords(text: Expression, size: Expression, overlap: Expression)
  extends CollectionGenerator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, size, overlap)
  override def position: Boolean = false
  override def inline: Boolean = false

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", IntegerType, nullable = false),
    StructField("start_word", IntegerType, nullable = false),
    StructField("chunk_text", StringType, nullable = false)))

  override def collectionType: DataType = ArrayType(elementSchema)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    if (t == null) return Nil
    val chunkSize = size.eval(input).asInstanceOf[Int]
    val ov = overlap.eval(input).asInstanceOf[Int]
    require(chunkSize > ov, s"chunk size $chunkSize must exceed overlap $ov")
    val words = t.asInstanceOf[UTF8String].toString.trim
      .split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) return Nil
    val step = chunkSize - ov
    Iterator.range(0, words.length, step).zipWithIndex.map {
      case (start, idx) =>
        val chunk = words.slice(start, start + chunkSize).mkString(" ")
        InternalRow(idx, start, UTF8String.fromString(chunk))
    }.toSeq
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChunkWords =
    copy(text = newChildren(0), size = newChildren(1), overlap = newChildren(2))
}
