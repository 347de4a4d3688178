package graft.llm

/** Cross-engine expression fragments shared by the LLM-pipeline operators.
  *
  * Every operator here is graded against a DuckDB oracle, so the Spark
  * side and the oracle SQL are generated from the SAME Scala builders —
  * only dialect syntax differs (`split` vs `string_split`, `element_at`
  * vs 1-based list index). Both dialects use exact integer / decimal /
  * string primitives (md5, polynomial mod-hash) so results are
  * bit-identical across engines regardless of parallelism.
  */
object TextExprs {

  def q(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Word array from the single-space-separated `text` column. */
  val sparkWords = "split(text, ' ')"
  val duckWords  = "string_split(text, ' ')"

  /** 3-word shingles over a words column named `w` (empty when <3 words). */
  val sparkShingles: String =
    "CASE WHEN size(w) >= 3 THEN transform(sequence(1, size(w) - 2), " +
      "i -> concat(element_at(w, i), ' ', element_at(w, i + 1), ' ', element_at(w, i + 2))) " +
      "ELSE cast(array() as array<string>) END"
  val duckShingles: String =
    "list_transform(range(1, greatest(len(w) - 1, 1)), " +
      "i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])"

  /** Occurrence count of `words` inside the array column `w`. */
  def sparkStopHits(words: Seq[String]): String =
    s"size(filter(w, x -> array_contains(array(${words.map(q).mkString(", ")}), x)))"
  def duckStopHits(words: Seq[String]): String =
    s"len(list_filter(w, x -> list_contains([${words.map(q).mkString(", ")}], x)))"

  /** 32-bit polynomial hash of a word (exact bigint math in both engines):
    * fold over chars of `h = (h*31 + ascii(c)) mod 4294967291`.
    */
  val PolyMod = 4294967291L // largest prime < 2^32; h*31 stays < 2^63
  // (Spark-side word hashing runs as the graft_polyhash32 kernel,
  // functions/Expressions.scala — same fold as this oracle builder.)
  def duckWordHash(x: String): String =
    s"list_reduce(list_prepend(cast(0 as bigint), " +
      s"list_transform(range(1, length($x) + 1), i -> cast(ascii($x[i]) as bigint))), " +
      s"(a, b) -> (a * 31 + b) % $PolyMod)"

  /** Independent second 32-bit hash family (multiplier 37, next prime
    * modulus down): drives bits 32–63 of the 64-bit SimHash — the
    * oracle mirror of the `h2` fold in
    * [[graft.functions.SimHash64.fingerprint]].
    */
  val PolyMod2 = 4294967279L
  def duckWordHash2(x: String): String =
    s"list_reduce(list_prepend(cast(0 as bigint), " +
      s"list_transform(range(1, length($x) + 1), i -> cast(ascii($x[i]) as bigint))), " +
      s"(a, b) -> (a * 37 + b) % $PolyMod2)"

  /** BYTE-exact polynomial hash over the UTF-8 encoding of `x`: the
    * oracle mirror of the Spark-side fold over the `encode(x, 'UTF-8')`
    * payload (m-series decode stub, unsigned bytes). Bytes are recovered
    * from `hex(encode(x))` pairs — DuckDB exposes no direct blob octet
    * indexing — so non-ASCII text folds identically in both engines
    * (unlike the per-CODEPOINT [[duckWordHash]], whose char-fold equals
    * the byte-fold only for pure-ASCII input).
    */
  def duckByteHash(x: String): String = {
    val hx = s"hex(encode($x))"
    val byte = s"(strpos('0123456789ABCDEF', $hx[2*i-1]) - 1) * 16 " +
      s"+ (strpos('0123456789ABCDEF', $hx[2*i]) - 1)"
    s"list_reduce(list_prepend(cast(0 as bigint), " +
      s"list_transform(range(1, strlen($x) + 1), i -> cast($byte as bigint))), " +
      s"(a, b) -> (a * 31 + b) % $PolyMod)"
  }

  /** Stopword lists for the language-ID heuristic (tie-break order below). */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "for", "on"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "von", "zu"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "les", "des", "est", "une", "dans", "pour", "sur", "avec", "ne"),
    "zh" -> Seq("的", "是", "在", "了", "我", "有", "和", "就", "不", "人"))

  /** Deterministic arg-max over the score columns s_en..s_zh: first
    * language in [[stopwords]] order wins ties. Identical text in both
    * dialects.
    */
  val predLangCase: String = {
    val langs = stopwords.map(_._1)
    val clauses = langs.init.zipWithIndex.map { case (l, i) =>
      val rest = langs.drop(i + 1).map(r => s"s_$l >= s_$r").mkString(" AND ")
      s"WHEN $rest THEN '$l'"
    }
    s"CASE ${clauses.mkString(" ")} ELSE '${langs.last}' END"
  }
}
