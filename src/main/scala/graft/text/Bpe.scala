package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Distributed BPE tokenizer training (the Sennrich-style byte-pair-merge
 * loop, re-expressed as Spark aggregates) — the corpus-level counterpart
 * of `text_token_count_bpe`'s fixed segmentation: it LEARNS the merge
 * table from the corpus.
 *
 * Algorithm (exactly what the DuckDB oracle replays):
 *  1. word frequencies: one shuffle over the corpus → a VOCAB-bounded
 *     frame (distinct words ≪ corpus rows at any scale — this is the
 *     standard industrial shape for distributed BPE: all later rounds
 *     run over word types weighted by frequency, never over the corpus);
 *  2. each word is sentinel-encoded as "|c1|c2|...|": symbols never
 *     contain '|' ([a-z0-9] tokenization), so every symbol boundary is
 *     explicit and merge application is a plain string rewrite both
 *     engines implement with identical bytes;
 *  3. per round: adjacent-pair counts weighted by word frequency (one
 *     aggregate over the vocab frame), argmax with (count DESC, a ASC,
 *     b ASC) tie-break — ONE row to the driver (the KMeans
 *     bounded-collect contract) — then the merge is applied to every
 *     word via the codegen'd `text_bpe_merge` expression and the frame
 *     is re-checkpointed so the lineage stays one-round deep.
 *
 * Merge semantics: repeatedly rewrite the LEFTMOST "|a|b|" to "|ab|"
 * until none remains (Text.mergePair). Rescan-from-start is equivalent
 * to the classic greedy left-to-right pass because a merge never creates
 * a new occurrence at an earlier position (the changed pairs are (x,ab)
 * and (ab,y); neither can equal (a,b) since ab ≠ a and ab ≠ b), and it
 * is EXACTLY the oracle's recursive strpos/substr rewrite.
 *
 * 100 TB: round cost = one explode+agg over the vocab frame plus a
 * narrow map; the corpus is touched once (word counting). Driver traffic
 * is 1 row per round. `rounds` is the vocabulary budget knob.
 */
object Bpe {

  final case class Merge(round: Int, a: String, b: String, cnt: Long)

  /** (doc_id, word) rows: [a-z0-9]+ tokenization (the q80 corpus
    * convention) — the ONE definition train and tokenize share; the
    * oracle CTEs mirror it character-for-character. */
  private def docWords(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), explode(split(
        regexp_replace(lower(col(textCol)), "[^a-z0-9]+", " "), " ")).as("word"))
      .where(col("word") =!= "")

  /** Sentinel seed encoding of `word`: "|c1|c2|...|". */
  private def sentinelEnc: org.apache.spark.sql.Column =
    concat(lit("|"), regexp_replace(col("word"), "(.)", "$1|"))

  /** Learn `rounds` merges from `docs(textCol)`; [a-z0-9]+ word
    * tokenization (the q80 corpus convention). */
  def train(docs: DataFrame, textCol: String, rounds: Int): Seq[Merge] = {
    require(rounds >= 1 && rounds <= 4096, s"rounds=$rounds out of [1,4096]")
    val idCol = docs.columns.head // any column works: only words are kept
    val words = docWords(docs, idCol, textCol)
      .groupBy("word").agg(count(lit(1)).as("freq"))
    var enc = words
      .withColumn("enc", sentinelEnc)
      .select("freq", "enc")
      .localCheckpoint(true) // vocab-bounded; cuts corpus lineage
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val best = enc
        .withColumn("syms", split(expr("trim(BOTH '|' FROM enc)"), "\\|"))
        .where(size(col("syms")) >= 2)
        // sequence(2, size) is safe: size >= 2 keeps it ascending
        .select(col("freq"), explode(expr(
          "transform(sequence(2, size(syms)), i -> " +
            "struct(element_at(syms, i - 1) AS a, element_at(syms, i) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1).collect() // bounded: exactly one row per round
      if (best.isEmpty) done = true // every word fused to one symbol
      else {
        val (a, b, cnt) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(r, a, b, cnt)
        val prev = enc
        enc = enc
          .withColumn("enc", call_function("text_bpe_merge", col("enc"), lit(a), lit(b)))
          .localCheckpoint(true)
        prev.unpersist()
        r += 1
      }
    }
    merges.result()
  }

  /** train() as a DataFrame (round, a, b, cnt) — the q185 surface. */
  def trainDf(spark: SparkSession, docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    import spark.implicits._
    train(docs, textCol, rounds)
      .map(m => (m.round.toLong, m.a, m.b, m.cnt))
      .toDF("round", "a", "b", "cnt")
  }

  /** Tokenize the corpus under a learned merge table: per doc, the token
    * count after applying every merge in order (the train→apply
    * composition a data pipeline runs to budget sequences). The merges
    * fold into ONE projection over the distinct-word frame (rounds chained
    * `text_bpe_merge` calls — still a single codegen'd stage); docs then
    * join word→token-count once. Token count of an encoded word is its
    * sentinel count − 1. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               merges: Seq[Merge]): DataFrame = {
    val dw = docWords(docs, idCol, textCol)
    val encAll = merges.foldLeft[org.apache.spark.sql.Column](sentinelEnc) {
      (e, m) => call_function("text_bpe_merge", e, lit(m.a), lit(m.b))
    }
    val wordTokens = dw.select("word").distinct()
      .withColumn("n_tok",
        (length(encAll) - length(translate(encAll, "|", "")) - 1).cast("long"))
    dw.join(wordTokens, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_tok").as("n_tokens"))
  }
}
