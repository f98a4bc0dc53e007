package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic tokenizer: the bridge from the raw `documents` table to the
  * north-star input shape `(doc_id:string, tokens:array<int>, n_tok:int, source:string)`
  * (BASELINE.json input_hint; an Iceberg-shaped table of pre-tokenized sequences).
  *
  * Token id = 1-based index of the word in the fixed sorted vocabulary, 0 for
  * unknown — chosen because `array_position` (Spark) and `list_position`
  * (DuckDB/ANSI-ish) have identical semantics, so the oracle can reproduce the
  * mapping byte-for-byte. The mapping is a pure Catalyst expression (higher-order
  * functions over a split — fully codegen'd, no UDF), so at 100 TB the tokenize
  * stage is a narrow map with predicate pushdown intact underneath it.
  */
object Tok {
  /** Fixed sorted vocabulary of the synthetic corpus (31 words). */
  val Vocab: IndexedSeq[String] = IndexedSeq(
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream", "table",
    "the", "value", "vector", "window")

  val UnkId = 0
  def idOf(w: String): Int = Vocab.indexOf(w) + 1 // 0 if absent

  /** Sentinel token ids used by the planted dissect structure (see graft.operators.Dissect). */
  val DelimId: Int = idOf("the") // 28 — plays the dissect-delimiter role

  /** words -> array<int> token ids. Default: the specialized one-pass
    * kernel (graft.plans.VocabTokenize — hash lookup, primitive output);
    * [[tokenizeBuiltins]] keeps the pure-built-in composition for
    * cross-checking (byte-identical results, ~5x slower per profile).
    */
  def tokenize(text: Column): Column =
    graft.plans.TokenizeExpr.vocabTokenize(text)

  /** Reference composition of built-ins (same output as [[tokenize]]). */
  def tokenizeBuiltins(text: Column): Column =
    transform(split(text, " "), w => array_position(typedLit(Vocab), w).cast("int"))

  /** Inverse mapping (token id -> word, UNK for 0/out-of-range). */
  def detokenize(tokens: Column): Column =
    transform(tokens, t =>
      when(t >= 1 && t <= Vocab.size, element_at(typedLit(Vocab), t)).otherwise(lit("<unk>")))

  /** Canonical string rendering of a token array — the byte-for-byte per-row
    * equality invariant used by the correctness gate ("1,2,3").
    */
  def tokStr(tokens: Column): Column =
    array_join(transform(tokens, _.cast("string")), ",")

  /** documents(doc_id:int64, text, lang, source, n_chars) -> raw_sequences
    * (doc_id:string, tokens:array<int>, n_tok:int, source:string).
    */
  def rawSequences(documents: DataFrame): DataFrame =
    documents
      .withColumn("tokens", tokenize(col("text")))
      .select(
        col("doc_id").cast("string").as("doc_id"),
        col("tokens"),
        size(col("tokens")).cast("int").as("n_tok"),
        col("source"))

  // ---- oracle-side (DuckDB SQL) fragments, generated from the same constants ----

  /** DuckDB list literal of the vocabulary. */
  def sqlVocab: String = Vocab.map(w => s"'$w'").mkString("[", ",", "]")

  /** DuckDB expression producing the identical token array from a text column. */
  def sqlTokenize(textExpr: String): String =
    s"list_transform(string_split($textExpr, ' '), w -> coalesce(list_position($sqlVocab, w), 0))"

  /** DuckDB CTE mirroring [[rawSequences]] over the `documents` table. */
  def sqlRawSequences: String =
    s"""WITH raw AS (
       |  SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       |         ${sqlTokenize("text")} AS tokens,
       |         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
       |         source
       |  FROM documents
       |)""".stripMargin
}
