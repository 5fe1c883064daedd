package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Corpus text statistics beyond the quality/langid family:
  * subword-ish tokenization, repetition signals (the strongest
  * low-quality indicator in web-scale corpora), and bigram
  * language-model tables. All composed from built-in expressions so
  * they run inside whole-stage codegen; per-doc signals are one
  * narrow scan, corpus-level tables are one explode + hash-agg shuffle
  * keyed by term — the same shape at 100 TB as at sf0.01.
  */
object TextStats {

  /** GPT-2-style pre-tokenizer pattern, restricted to the syntax subset
    * shared by java.util.regex and RE2 so results are engine-portable:
    * contractions, letter runs, digit runs, punctuation runs — each
    * optionally preceded by one space (the "byte-level BPE boundary"
    * trick: leading space is part of the token). */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"

  /** BPE-ish pre-tokenization: the array of pattern matches in order.
    * (Real BPE would further merge within these pre-tokens against a
    * learned vocabulary; counts over pre-tokens are the standard cheap
    * proxy used for corpus token budgeting.) */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  private val AccentFrom = "áàâäãåéèêëíìîïóòôöõúùûüçñý"
  private val AccentTo = "aaaaaaeeeeiiiiooooouuuucny"

  /** Canonical text normalization for dedup keys and matching:
    * lowercase → fold common Latin accents (fixed translate map — the
    * deterministic subset of Unicode NFD+strip that both JVM and
    * other engines reproduce byte-identically) → collapse whitespace
    * runs → trim. Pure codegen'd expressions, no UDF. */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      translate(lower(text), AccentFrom, AccentTo), "\\s+", " "))

  /** Per-doc token/repetition signals, integer-exact:
    *  - n_bpe: BPE-ish token count; n_ws: whitespace token count
    *  - tok_md5: md5 of the joined BPE token stream (tokenization
    *    fingerprint — equal streams ⇒ equal hash on any engine)
    *  - dup_permille: (n_ws − n_distinct) · 1000 / n_ws, the repeated
    *    token fraction (Gopher-style repetition signal)
    */
  def tokenSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bpe = bpeTokens(col(textCol))
    val ws = TextFunctions.tokens(col(textCol))
    df.select(
      col(idCol),
      size(bpe).cast("long").as("n_bpe"),
      md5(concat_ws("|", bpe).cast("binary")).as("tok_md5"),
      size(ws).cast("long").as("n_ws"),
      size(array_distinct(ws)).cast("long").as("n_distinct"))
      .withColumn("dup_permille",
        when(col("n_ws") > 0,
          ((col("n_ws") - col("n_distinct")) * 1000L / col("n_ws")).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Top-bigram repetition: for each doc, the count of its most
    * frequent word bigram and that count as a per-mille fraction of all
    * bigrams (Gopher "top 2-gram fraction"). Relational explode →
    * two-level hash agg; docs with < 2 tokens report zeros. */
  def topBigramRepetition(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol),
      TextFunctions.shingles(TextFunctions.tokens(col(textCol)), 2).as("bg"))
    val perBigram = base
      .select(col(idCol), explode(col("bg")).as("big"))
      .groupBy(col(idCol), col("big")).agg(count(lit(1)).as("c"))
    val top = perBigram.groupBy(col(idCol))
      .agg(max(col("c")).as("top_bigram_n"), sum(col("c")).as("n_bigrams"))
    base.select(col(idCol))
      .join(top, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      .withColumn("top_bigram_permille",
        when(col("n_bigrams") > 0,
          (col("top_bigram_n") * 1000L / col("n_bigrams")).cast("long"))
          .otherwise(lit(0L)))
  }

  /** Corpus bigram LM table: for each word, its most frequent successor
    * (count-desc, lexicographic tie-break) with count ≥ minCount.
    * One explode + one hash agg + one per-word window — the canonical
    * "conditional next-token distribution" build. */
  def bigramNext(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = df.select(explode(
      TextFunctions.shingles(TextFunctions.tokens(lower(col(textCol))), 2)).as("big"))
      .select(split(col("big"), " ").getItem(0).as("w"),
        split(col("big"), " ").getItem(1).as("next_tok"))
    val counts = bg.groupBy(col("w"), col("next_tok")).agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("w")).orderBy(col("n").desc, col("next_tok"))
    counts.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1 && col("n") >= minCount)
      .select(col("w"), col("next_tok"), col("n"))
  }

  /** Per-document bigram "surprise" — an integer-exact perplexity
    * proxy for quality filtering: for each adjacent token pair (a,b),
    * surprise ≈ −log2 P(b|a) ≈ bitlen(c(a·)) − bitlen(c(a,b)), where
    * bitlen is the binary magnitude (`length(bin(n))`) and the marginal
    * c(a·) sums the PAIR table, so Σ_b c(a,b) = c(a·) and every term is
    * ≥ 0. Bit-length is the load-bearing trick: a float log2 would
    * drift across engines/accumulation orders, the bit count cannot.
    * Returns per doc: n_pairs, surprise (Σ), mean_permille
    * (⌊1000·surprise ÷ n_pairs⌋).
    *
    * Scale shape: two map-side-combined counts over the corpus pair
    * stream plus two key-joins of doc pairs against the count tables —
    * no windows, no broadcast of corpus-sized state, no driver math.
    * High mean ⇒ improbable token transitions (garbled/TL-mixed text);
    * low ⇒ boilerplate. The KenLM-scoring slot of a curation pipeline
    * without the float model. */
  def bigramSurprise(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = df.select(col(idCol), explode(
        TextFunctions.shingles(
          TextFunctions.tokens(lower(col(textCol))), 2)).as("big"))
      .select(col(idCol), split(col("big"), " ").getItem(0).as("a"), col("big"))
    val pc = pairs.groupBy(col("big")).agg(count(lit(1)).as("cab"))
    val mc = pairs.groupBy(col("a")).agg(count(lit(1)).as("ca"))
    pairs.join(pc, "big").join(mc, "a")
      .select(col(idCol),
        (length(bin(col("ca"))) - length(bin(col("cab")))).cast("long").as("s"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_pairs"), sum(col("s")).as("surprise"))
      .withColumn("mean_permille", expr("surprise * 1000 div n_pairs"))
  }

  /** Per-document out-of-vocabulary rate against the corpus top-K
    * vocabulary — a cheap perplexity proxy for quality filtering (high
    * OOV ⇒ boilerplate/garbled/foreign text). `oov_ppm` is integer
    * parts-per-million (n_oov·10^6 div n_tokens), engine-exact. The
    * vocabulary is a TakeOrdered top-K (deterministic count-desc/word
    * tie-break) broadcast back onto the token stream: one groupBy
    * shuffle for counts, one for the per-doc rollup — the vocabulary
    * itself never shuffles the corpus. */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
      vocabK: Int): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .orderBy(col("cw").desc, col("w")).limit(vocabK)
      .select(col("w"), lit(1).as("__in"))
    toks.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
  }

  /** Class-conditional token likelihoods with Laplace smoothing — the
    * naive-Bayes training table, in exact integer ppm:
    * P(w|c) ≈ (count(w,c)+1)·10⁶ div (tokens(c)+|V|). One explode, two
    * map-side-combining count passes (per-class token counts carry the
    * vocabulary across the shuffle, not the corpus), class totals and
    * |V| broadcast back. `minCount` bounds the emitted table. */
  def classTokenLikelihood(df: DataFrame, classCol: String,
      textCol: String, minCount: Long): DataFrame = {
    val toks = df.select(col(classCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("w"))
    val wc = toks.groupBy(col(classCol), col("w"))
      .agg(count(lit(1)).as("n_wc"))
    val classTotal = toks.groupBy(col(classCol))
      .agg(count(lit(1)).as("__n_c"))
    val vocabSize = wc.select(col("w")).distinct().count()
    wc.filter(col("n_wc") >= minCount)
      .join(broadcast(classTotal), Seq(classCol))
      .withColumn("p_ppm",
        expr(s"(n_wc + 1) * 1000000 div (__n_c + $vocabSize)"))
      .select(col(classCol), col("w"), col("n_wc"), col("p_ppm"))
  }

  /** Collocation mining: top-k adjacent bigrams by integer-scaled PMI,
    * score = (c_xy · N · 10^6) div (c_w1 · c_w2) — a monotone transform
    * of pointwise mutual information computed entirely in 64-bit
    * integer arithmetic (engine-portable; fits while c_xy·N·10^6 <
    * 2^63, i.e. corpora to ~10^5 tokens per count unit — shard counts
    * or drop the 10^6 scale beyond that). Unigram/bigram count passes
    * are map-side-combining groupBys; the count joins shuffle on the
    * word (AQE broadcasts the vocabulary side when it fits); top-k is
    * TakeOrdered, never a global sort. */
  def collocations(df: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(
      TextFunctions.tokens(lower(col(textCol))).as("tk"))
    val uni = toks.select(explode(col("tk")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val total = uni.agg(sum(col("cw")).as("n_tokens"))
    val bg = toks
      .select(explode(TextFunctions.shingles(col("tk"), 2)).as("big"))
      .select(split(col("big"), " ").getItem(0).as("w1"),
        split(col("big"), " ").getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    val scored = bg
      .join(uni.select(col("w").as("w1"), col("cw").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("cw").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("pmi_scaled",
        expr("(cxy * n_tokens * 1000000) div (c1 * c2)"))
    val top = scored
      .orderBy(col("pmi_scaled").desc, col("w1"), col("w2")).limit(k)
    top.withColumn("rk", row_number().over(
        Window.orderBy(col("pmi_scaled").desc, col("w1"), col("w2"))))
      .select(col("w1"), col("w2"), col("cxy"), col("pmi_scaled"), col("rk"))
  }
}
