package graft.llm

import graft.{Catalog, QueryDef}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-pipeline assembly operators over `documents`: sequence
  * packing into fixed token budgets, benchmark-contamination detection,
  * and language-balanced sampling — the steps between "clean corpus"
  * and "training batches". All DuckDB-oracle-checked.
  *
  * Scale notes (100 TB stance):
  *  - packing: one window per shard key (here `lang`); a real run
  *    shards by (corpus shard, lang) so each cumulative sum is bounded
  *    by shard size, keeping windows memory-safe and parallel. The
  *    concatenate-and-chunk semantics (GPT-style pretraining packing)
  *    need only a running sum — no global sort across shards.
  *  - contamination: inverted-index equi-join keyed by shingle; the
  *    benchmark side is orders of magnitude smaller and broadcasts.
  *    Never all-pairs.
  *  - balanced sampling: per-language top-k by a deterministic hash
  *    order — at scale, pre-filter with a hash threshold (q32's trick)
  *    so the window only ranks ~k rows per language.
  */
object Pipeline {
  import TextExprs._

  private val PackBudget = 512  // tokens per packed training sequence
  private val BalancedK = 50    // docs per language
  private val EvalMod = 97      // doc_id % EvalMod == 0 -> benchmark set

  def all: Seq[QueryDef] = Seq(

    // GPT-style concatenate-and-chunk packing: within each language
    // shard, documents concatenate in doc_id order and slice into
    // PackBudget-token windows; each doc reports its bin, offset, and
    // whether it straddles a bin boundary.
    QueryDef(
      "p01_pack_sequences",
      Some(s"""WITH d AS (SELECT doc_id, lang,
              |    cast(len(string_split(text, ' ')) as bigint) AS n_tokens
              |  FROM documents),
              |c AS (SELECT doc_id, lang, n_tokens,
              |    coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
              |  FROM d)
              |SELECT doc_id, lang, n_tokens,
              |  cum // $PackBudget AS bin_id,
              |  cum % $PackBudget AS bin_offset,
              |  ((cum + n_tokens - 1) // $PackBudget) > (cum // $PackBudget)
              |    AS spans_boundary
              |FROM c""".stripMargin),
      (s, d) => packSequences(Catalog.t(s, d, "documents"), PackBudget,
        shardCol = col("lang"), orderCol = col("doc_id"),
        tokensCol = expr(s"cast(size($sparkWords) as bigint)"))),

    // Benchmark contamination: training docs sharing any 3-word
    // shingle with the (deterministic) held-out set, with the count of
    // distinct shared shingles — the pre-training hygiene check.
    QueryDef(
      "d11_contamination",
      Some(s"""WITH d AS (SELECT doc_id, $duckWords AS w FROM documents),
              |s AS (SELECT DISTINCT doc_id, unnest($duckShingles) AS sh FROM d),
              |ev AS (SELECT DISTINCT sh FROM s WHERE doc_id % $EvalMod = 0),
              |tr AS (SELECT doc_id, sh FROM s WHERE doc_id % $EvalMod <> 0)
              |SELECT doc_id, count(*) AS n_shared_shingles
              |FROM tr JOIN ev USING (sh)
              |GROUP BY doc_id""".stripMargin),
      (s, d) => {
        val docs = Catalog.t(s, d, "documents")
        contamination(docs.filter(col("doc_id") % EvalMod =!= 0),
          docs.filter(col("doc_id") % EvalMod === 0))
      }),

    // Language-balanced sample: exactly k docs per language in a
    // deterministic md5 order — the mix-balancing step of a multi-
    // lingual training run.
    QueryDef(
      "p02_lang_balanced",
      Some(s"""SELECT doc_id, lang, pick FROM (
              |  SELECT doc_id, lang,
              |    cast(row_number() OVER (PARTITION BY lang
              |      ORDER BY md5(cast(doc_id as varchar)), doc_id) as bigint) AS pick
              |  FROM documents) x
              |WHERE pick <= $BalancedK""".stripMargin),
      (s, d) => balancedSample(Catalog.t(s, d, "documents"),
        col("lang"), BalancedK))
  )

  // ------------------------------------------------------- public API

  /** Concatenate-and-chunk sequence packing: within each `shardCol`
    * partition, rows concatenate in `orderCol` order and slice into
    * `budget`-token bins. Returns the input keys plus `n_tokens`,
    * `bin_id`, `bin_offset`, `spans_boundary`.
    */
  def packSequences(docs: DataFrame, budget: Long, shardCol: Column,
      orderCol: Column, tokensCol: Column): DataFrame = {
    val w = Window.partitionBy(shardCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("n_tokens", tokensCol)
      .withColumn("cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(col("doc_id"), shardCol, col("n_tokens"),
        expr(s"cum div $budget").as("bin_id"),
        (col("cum") % budget).as("bin_offset"),
        (expr(s"(cum + n_tokens - 1) div $budget") >
          expr(s"cum div $budget")).as("spans_boundary"))
  }

  /** Contamination check: `train` docs sharing any 3-word shingle with
    * `eval` docs, with distinct-shared-shingle counts. The eval
    * shingle set is the (small) broadcast side of one equi-join keyed
    * by shingle — candidate generation is inverted-index, not
    * all-pairs.
    */
  def contamination(train: DataFrame, eval0: DataFrame): DataFrame = {
    def shingled(df: DataFrame): DataFrame = df
      .withColumn("w", expr(sparkWords))
      .select(col("doc_id"), explode(expr(sparkShingles)).as("sh"))
      .distinct()
    val evalShingles = shingled(eval0).select("sh").distinct()
    shingled(train)
      .join(broadcast(evalShingles), "sh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Exactly `k` rows per `byCol` group, picked in deterministic
    * md5(doc_id) order. Output adds the 1-based `pick` rank.
    */
  def balancedSample(docs: DataFrame, byCol: Column, k: Int): DataFrame = {
    val w = Window.partitionBy(byCol)
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    docs
      .withColumn("pick", row_number().over(w).cast("long"))
      .filter(col("pick") <= k)
      .select(col("doc_id"), byCol, col("pick"))
  }
}
