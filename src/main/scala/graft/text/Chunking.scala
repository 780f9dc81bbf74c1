package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split long documents into overlapping
  * token-window chunks — the preprocessing step that turns a corpus
  * into context-length-bounded training/retrieval units.
  *
  * Chunk i covers tokens [i·stride, i·stride + chunkSize) with
  * stride = chunkSize − overlap; the last chunk is allowed to be short
  * so every token is covered and chunk starts are aligned to the
  * stride grid. A document with ≤ chunkSize tokens yields exactly one
  * chunk.
  *
  * Everything is a pure per-row expression (split/sequence/transform/
  * slice) — codegen'd projection, zero shuffle, scales embarrassingly.
  */
object Chunking {

  /** Array of (chunk_id, chunk_tokens, chunk) structs for one text. */
  def chunkStructs(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    val toks = split(text, " ")
    val n = size(toks)
    // n <= chunkSize -> 1 chunk; else ceil((n - chunkSize)/stride) + 1
    val nc = when(n <= chunkSize, lit(1)).otherwise(
      floor((n - lit(chunkSize) + lit(stride - 1)).cast("double") / stride)
        .cast("int") + 1)
    transform(sequence(lit(0), nc - 1), i => struct(
      i.cast("long").as("chunk_id"),
      least(n - i * stride, lit(chunkSize)).cast("long").as("chunk_tokens"),
      array_join(slice(toks, i * stride + 1, lit(chunkSize)), " ").as("chunk")))
  }

  /** One row per chunk: (idCol, chunk_id, chunk_tokens, chunk). */
  def chunkDocs(docs: DataFrame, chunkSize: Int, overlap: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        explode(chunkStructs(col(textCol), chunkSize, overlap)).as("c"))
      .select(col(idCol), col("c.chunk_id"), col("c.chunk_tokens"), col("c.chunk"))

  /** Content-defined chunking (E-55): chunk boundaries are set by token
    * CONTENT — a token whose sha256 starts with a chosen hex digit set
    * opens a new chunk — not by position. Unlike the fixed grid above,
    * an insertion near the start of a document shifts every grid chunk
    * but leaves all content-defined chunks outside the edited span
    * intact (the rsync/LBFS trick, applied to sub-document text dedup);
    * ChunkingSpec pins that stability property.
    *
    * `boundaryHex.size / 16` is the expected boundary rate (mean chunk
    * length 16/|hex| tokens). sha256 keeps the boundary decision
    * engine-portable — the DuckDB oracle replays it exactly.
    *
    * One row per chunk: (idCol, chunk_seq, chunk). Shuffles once, keyed
    * by doc id, for the per-doc boundary prefix-sum window; the
    * reassembled chunk rides the same partitioning.
    */
  def contentDefinedChunks(docs: DataFrame, boundaryHex: String = "01",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy("pos")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol), posexplode(
        filter(split(col(textCol), " "), t => t =!= "")).as(Seq("pos", "tok")))
      .withColumn("b",
        when(substring(sha2(col("tok"), 256), 1, 1)
          .isin(boundaryHex.map(_.toString): _*), 1L).otherwise(0L))
      .withColumn("chunk_seq", sum("b").over(w))
      .groupBy(idCol, "chunk_seq")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("tok")))),
        e => e.getField("tok")), " ").as("chunk"))
  }
}
