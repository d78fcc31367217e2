package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions
import graft.functions.TextFunctions.{English, LangProfiles}
import org.apache.spark.sql.functions._

/** Text-analysis operator family (language-ID, quality scoring, token
  * counting, fingerprinting) as oracle-checked queries. All column
  * functions are pure Catalyst expressions, so each has an exact
  * DuckDB mirror (list_filter / list_transform lambdas).
  */
object TextQueries {

  /** The canonical r4 convention — see [[TextFunctions.r4]]. */
  private def r4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    TextFunctions.r4(c)

  /** DuckDB-side whitespace tokenization matching TextFunctions.tokens. */
  private val toksSql =
    "list_filter(string_split_regex(trim(coalesce(text, '')), '\\s+'), x -> length(x) > 0)"

  /** DuckDB mirror of [[TextFunctions.spaceTokens]] (single-space
    * split, not the \\s+ regex — the two differ on tab/newline
    * corpora; q228 pairs with the Spark side's spaceTokens).
    */
  private val toksSqlSpace =
    "list_filter(string_split(coalesce(text, ''), ' '), x -> length(x) > 0)"

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** [[TextFunctions.bpePattern]] with the apostrophe doubled for a
    * single-quoted SQL literal.
    */
  private val bpePatternSql: String = TextFunctions.bpePattern.replace("'", "''")

  /** DuckDB mirror of `r4(TextFunctions.qualityScore(text))` — shared
    * by q25 (per-doc scores) and q55 (curation filter).
    */
  private def qualitySql: String = {
    val sw = inList(English.stopwords)
    s"""floor((
       |    0.3 * (CASE WHEN len($toksSql) = 0 THEN 0.0
       |      ELSE len(list_distinct($toksSql)) * 1.0 / len($toksSql) END) +
       |    0.3 * least(len($toksSql) / 100.0, 1.0) +
       |    0.2 * (1.0 - (CASE WHEN len($toksSql) = 0 THEN 0.0
       |      ELSE len(list_filter($toksSql, x -> x IN $sw)) * 1.0 / len($toksSql) END)) +
       |    0.2 * least((CASE WHEN len($toksSql) = 0 THEN 0.0
       |      ELSE list_sum(list_transform($toksSql, x -> length(x))) * 1.0 / len($toksSql) END) / 8.0, 1.0)
       |  ) * 10000 + 0.5) / 10000""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(
    // ----- q205: cross-source vocabulary overlap — pairwise Jaccard
    // of per-source token vocabularies, the "are these corpus slices
    // contaminating each other" audit next to q61 (train/eval
    // decontamination) and q116 (language-mix KL). One (source, word)
    // distinct (vocab-sized, word-keyed shuffle), one equi-join on
    // word for intersections (never a source×source product of
    // documents), set algebra in exact integers, Jaccard as ppm
    // integer division. All 190 source pairs reported — zero-overlap
    // pairs included via the pair frame, not dropped by the join.
    QueryDef(
      "q205_source_overlap",
      (s, d) => {
        import s.implicits._
        val vocab = graft.Par.spread(Tables.documents(s, d))
          .select($"source", explode(TextFunctions.tokens($"text")).as("w"))
          .distinct()
        val sizes = vocab.groupBy($"source").agg(count(lit(1)).as("n"))
        val common = vocab.select($"source".as("src_a"), $"w")
          .join(vocab.select($"source".as("src_b"), $"w"), "w")
          .filter($"src_a" < $"src_b")
          .groupBy($"src_a", $"src_b").agg(count(lit(1)).as("n_common"))
        val pairs = sizes.select($"source".as("src_a"), $"n".as("na"))
          .join(sizes.select($"source".as("src_b"), $"n".as("nb")),
            $"src_a" < $"src_b")
        pairs.join(common, Seq("src_a", "src_b"), "left")
          .select($"src_a", $"src_b", $"na", $"nb",
            coalesce($"n_common", lit(0L)).as("n_common"),
            expr("coalesce(n_common, 0) * 1000000 DIV (na + nb - coalesce(n_common, 0))")
              .as("jaccard_ppm"))
          .orderBy($"src_a", $"src_b")
      },
      Some(
        s"""WITH vocab AS MATERIALIZED (
           |  SELECT DISTINCT source, unnest($toksSql) AS w
           |  FROM documents),
           |sizes AS (
           |  SELECT source, CAST(count(*) AS BIGINT) AS n
           |  FROM vocab GROUP BY 1),
           |common AS (
           |  SELECT a.source AS src_a, b.source AS src_b,
           |    CAST(count(*) AS BIGINT) AS n_common
           |  FROM vocab a JOIN vocab b
           |    ON a.w = b.w AND a.source < b.source
           |  GROUP BY 1, 2)
           |SELECT sa.source AS src_a, sb.source AS src_b,
           |  sa.n AS na, sb.n AS nb,
           |  COALESCE(c.n_common, 0) AS n_common,
           |  COALESCE(c.n_common, 0) * 1000000
           |    // (sa.n + sb.n - COALESCE(c.n_common, 0)) AS jaccard_ppm
           |FROM sizes sa JOIN sizes sb ON sa.source < sb.source
           |LEFT JOIN common c ON c.src_a = sa.source AND c.src_b = sb.source
           |ORDER BY src_a, src_b""".stripMargin)),

    // ----- q23: token statistics per language
    QueryDef(
      "q23_token_stats",
      (s, d) => {
        import s.implicits._
        graft.Par.spread(Tables.documents(s, d))
          .select($"lang", TextFunctions.tokenCount($"text").as("n_tokens"))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_tokens").as("total_tokens"),
            min($"n_tokens").as("min_tokens"),
            max($"n_tokens").as("max_tokens"))
          .orderBy($"lang")
      },
      Some(s"""SELECT lang, COUNT(*) AS n_docs,
              |  CAST(SUM(len($toksSql)) AS BIGINT) AS total_tokens,
              |  MIN(len($toksSql)) AS min_tokens,
              |  MAX(len($toksSql)) AS max_tokens
              |FROM documents
              |GROUP BY lang
              |ORDER BY lang""".stripMargin)),

    // ----- q24: language-ID confusion matrix (labeled lang × predicted)
    QueryDef(
      "q24_lang_id",
      (s, d) => {
        import s.implicits._
        graft.Par.spread(Tables.documents(s, d))
          .select($"lang", TextFunctions.langId($"text").as("pred"))
          .groupBy($"lang", $"pred")
          .agg(count(lit(1)).as("n"))
          .orderBy($"lang", $"pred")
      },
      Some {
        val scores = LangProfiles.default.map { case (code, words) =>
          s"len(list_filter($toksSql, x -> x IN ${inList(words)})) AS s_$code"
        }.mkString(",\n  ")
        s"""SELECT lang, pred, COUNT(*) AS n FROM (
           |  SELECT lang,
           |    CASE
           |      WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           |      WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
           |      WHEN s_es >= s_fr THEN 'es'
           |      ELSE 'fr' END AS pred
           |  FROM (SELECT lang,
           |  $scores
           |  FROM documents))
           |GROUP BY lang, pred
           |ORDER BY lang, pred""".stripMargin
      }),

    // ----- q25: per-document quality scoring (length/repetition/
    // stopword-density/token-shape heuristics)
    QueryDef(
      "q25_quality_score",
      (s, d) => {
        import s.implicits._
        graft.Par.spread(Tables.documents(s, d))
          .select(
            $"doc_id",
            TextFunctions.tokenCount($"text").as("n_tokens"),
            r4(TextFunctions.distinctRatio($"text")).as("distinct_ratio"),
            r4(TextFunctions.stopwordRatio($"text", English.stopwords)).as("stopword_ratio"),
            r4(TextFunctions.avgTokenLen($"text")).as("avg_token_len"),
            r4(TextFunctions.qualityScore($"text")).as("quality"))
          .orderBy($"doc_id")
      },
      Some {
        val sw = inList(English.stopwords)
        s"""SELECT doc_id,
           |  len($toksSql) AS n_tokens,
           |  floor((CASE WHEN len($toksSql) = 0 THEN 0.0
           |    ELSE len(list_distinct($toksSql)) * 1.0 / len($toksSql) END) * 10000 + 0.5) / 10000 AS distinct_ratio,
           |  floor((CASE WHEN len($toksSql) = 0 THEN 0.0
           |    ELSE len(list_filter($toksSql, x -> x IN $sw)) * 1.0 / len($toksSql) END) * 10000 + 0.5) / 10000 AS stopword_ratio,
           |  floor((CASE WHEN len($toksSql) = 0 THEN 0.0
           |    ELSE list_sum(list_transform($toksSql, x -> length(x))) * 1.0 / len($toksSql) END) * 10000 + 0.5) / 10000 AS avg_token_len,
           |  $qualitySql AS quality
           |FROM documents
           |ORDER BY doc_id""".stripMargin
      }),

    // ----- q55: the curation PIPELINE — the operators composed the
    // way a training-data ingest actually runs them: fingerprint
    // dedup survivors → token-count band → quality threshold →
    // per-language corpus stats. Aggregates are integer sums and
    // min/max of pre-rounded scores (order-independent), so the
    // composition stays hash-exact against the oracle.
    QueryDef(
      "q55_curation_pipeline",
      (s, d) => {
        import s.implicits._
        import graft.operators.Dedup
        val kept = Dedup.fingerprintDedup(Tables.documents(s, d), "doc_id", "text")
          .withColumn("nt", TextFunctions.tokenCount($"text"))
          .withColumn("q", r4(TextFunctions.qualityScore($"text")))
          .filter($"nt".between(20, 1000) && $"q" >= 0.5)
        kept.groupBy($"lang")
          .agg(
            count(lit(1)).cast("bigint").as("n_docs"),
            sum($"n_chars").cast("bigint").as("total_chars"),
            min($"q").as("min_q"),
            max($"q").as("max_q"))
          .orderBy($"lang")
      },
      Some(s"""WITH kept AS (
              |  SELECT * FROM documents WHERE doc_id IN (
              |    SELECT MIN(doc_id) FROM documents
              |    GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')))),
              |scored AS (
              |  SELECT lang, n_chars,
              |    len($toksSql) AS nt,
              |    $qualitySql AS q
              |  FROM kept)
              |SELECT lang,
              |  CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              |  MIN(q) AS min_q, MAX(q) AS max_q
              |FROM scored
              |WHERE nt BETWEEN 20 AND 1000 AND q >= 0.5
              |GROUP BY lang
              |ORDER BY lang""".stripMargin)),

    // ----- q53: BPE-ish token statistics — subword-shaped counting
    // next to q23's whitespace counts: per language, pre-tokenizer
    // token totals and the chars-per-token compression signal corpus
    // curation filters on. Same regex, same leftmost-first
    // alternation in Java regex and RE2.
    QueryDef(
      "q53_bpe_token_stats",
      (s, d) => {
        import s.implicits._
        graft.Par.spread(Tables.documents(s, d))
          .select($"lang", $"text",
            TextFunctions.bpeTokenCount($"text").as("bpe"),
            TextFunctions.tokenCount($"text").as("ws"))
          .groupBy($"lang")
          .agg(
            sum($"bpe").cast("bigint").as("bpe_tokens"),
            sum($"ws").cast("bigint").as("ws_tokens"),
            r4(sum(length($"text")).cast("double") / sum($"bpe")).as("chars_per_token"))
          .orderBy($"lang")
      },
      Some(s"""SELECT lang,
              |  CAST(SUM(len(regexp_extract_all(text, '$bpePatternSql'))) AS BIGINT) AS bpe_tokens,
              |  CAST(SUM(len($toksSql)) AS BIGINT) AS ws_tokens,
              |  floor((SUM(length(text)) * 1.0 /
              |         SUM(len(regexp_extract_all(text, '$bpePatternSql')))) * 10000 + 0.5) / 10000
              |    AS chars_per_token
              |FROM documents
              |GROUP BY lang
              |ORDER BY lang""".stripMargin)),

    // ----- q52: BM25 keyword top-k (lexical retrieval, the sparse
    // counterpart of q19/q31's dense search). Catalyst-composed:
    // filtered explode → tf/df aggregates → Lucene-flavor idf —
    // mirrored term for term in DuckDB. Scores are rounded BEFORE
    // the ordering so libm ulp drift in ln() can never flip ranks.
    QueryDef(
      "q52_bm25_search",
      (s, d) => {
        import s.implicits._
        graft.operators.TextSearch.bm25TopK(Tables.documents(s, d), "doc_id", "text",
            query = Seq("vector", "join", "stream"), k = 10)
          .select($"id".as("doc_id"), $"score", $"n_hit")
          .orderBy($"score".desc, $"doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |    list_filter(string_split_regex(trim(text), '\s+'), x -> length(x) > 0) AS toks
             |  FROM documents),
             |tl AS (SELECT doc_id, toks, len(toks) AS len FROM t),
             |stats AS (SELECT COUNT(*) AS n_docs, SUM(len) AS total_len FROM tl),
             |tf AS (
             |  SELECT doc_id, len, term, COUNT(*) AS tf
             |  FROM (SELECT doc_id, len,
             |          unnest(list_filter(toks, x -> x IN ('vector', 'join', 'stream'))) AS term
             |        FROM tl)
             |  GROUP BY doc_id, len, term),
             |dfq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY term)
             |SELECT doc_id,
             |  round(SUM(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2 /
             |            (tf + 1.2 * (0.25 + 0.75 * len / (total_len * 1.0 / n_docs)))), 4) AS score,
             |  CAST(COUNT(*) AS BIGINT) AS n_hit
             |FROM tf JOIN dfq USING (term) CROSS JOIN stats
             |GROUP BY doc_id
             |ORDER BY score DESC, doc_id
             |LIMIT 10""".stripMargin)),

    // ----- q56: corpus-frequency boilerplate detection (the n-gram
    // form of CCNet shared-line removal): 5-grams occurring in ≥3
    // distinct docs are boilerplate; per-doc gram totals + ratio.
    // One gram-keyed shuffle for document frequency (array_distinct
    // before explode), AQE-broadcast join-back for per-doc stats.
    QueryDef(
      "q56_boilerplate_ngrams",
      (s, d) => {
        import s.implicits._
        graft.operators.Boilerplate.stats(Tables.documents(s, d), "doc_id", "text",
            n = 5, minDf = 3)
          .select($"id".as("doc_id"), $"n_grams", $"n_boiler", $"boiler_ratio")
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (
              |  SELECT doc_id, CASE WHEN len(toks) >= 5
              |    THEN list_transform(generate_series(1, len(toks) - 4),
              |                        i -> array_to_string(toks[i:i+4], ' '))
              |    ELSE [] END AS grams
              |  FROM t),
              |e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
              |dfreq AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM e GROUP BY gram),
              |boiler AS (SELECT gram FROM dfreq WHERE df >= 3),
              |per AS (
              |  SELECT e.doc_id,
              |    CAST(COUNT(*) AS BIGINT) AS n_grams,
              |    CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
              |  FROM e LEFT JOIN boiler b ON e.gram = b.gram
              |  GROUP BY e.doc_id)
              |SELECT d.doc_id,
              |  CAST(COALESCE(n_grams, 0) AS BIGINT) AS n_grams,
              |  CAST(COALESCE(n_boiler, 0) AS BIGINT) AS n_boiler,
              |  floor((CASE WHEN COALESCE(n_grams, 0) = 0 THEN 0.0
              |    ELSE n_boiler * 1.0 / n_grams END) * 10000 + 0.5) / 10000 AS boiler_ratio
              |FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    // ----- q58: per-language top-k bigrams — the n-gram frequency
    // profile a curation pipeline inspects for repeated chrome /
    // TLD-specific patterns. explode → (lang, gram) partial-agg
    // shuffle → partitioned row_number window (never a global sort);
    // ties broken by gram so the rank is total on both engines.
    QueryDef(
      "q58_top_ngrams",
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy($"lang").orderBy($"n".desc, $"gram")
        graft.Par.spread(Tables.documents(s, d))
          .select($"lang",
            explode(graft.operators.Boilerplate.ngrams($"text", 2)).as("gram"))
          .groupBy($"lang", $"gram")
          .agg(count(lit(1)).as("n"))
          .withColumn("rk", row_number().over(w))
          .filter($"rk" <= 5)
          .select($"lang", $"rk", $"gram", $"n")
          .orderBy($"lang", $"rk")
      },
      Some(s"""WITH t AS (
              |  SELECT lang, $toksSql AS toks FROM documents),
              |e AS (
              |  SELECT lang, unnest(CASE WHEN len(toks) >= 2
              |    THEN list_transform(generate_series(1, len(toks) - 1),
              |                        i -> array_to_string(toks[i:i+1], ' '))
              |    ELSE [] END) AS gram
              |  FROM t),
              |c AS (SELECT lang, gram, COUNT(*) AS n FROM e GROUP BY lang, gram),
              |r AS (SELECT lang, gram, n,
              |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS rk
              |      FROM c)
              |SELECT lang, rk, gram, CAST(n AS BIGINT) AS n
              |FROM r WHERE rk <= 5
              |ORDER BY lang, rk""".stripMargin)),

    // ----- q60: sequence packing — documents assigned to fixed-token-
    // budget training sequences, packed independently per shard (no
    // global ordering; see operators.Packing). budget 2048 is a power
    // of two so the start-offset division is IEEE-exact cross-engine.
    QueryDef(
      "q60_sequence_packing",
      (s, d) => {
        import s.implicits._
        val docs = graft.Par.spread(Tables.documents(s, d))
          .select($"doc_id", TextFunctions.tokenCount($"text").as("n_tokens"))
        graft.operators.Packing.manifest(docs, "doc_id", "n_tokens",
            budget = 2048, shards = 8)
          .select($"shard", $"pack_id", $"n_docs",
            $"pack_tokens".cast("long").as("pack_tokens"))
          .orderBy($"shard", $"pack_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id % 8 AS shard, doc_id,
              |    len($toksSql) AS n_tokens
              |  FROM documents),
              |c AS (
              |  SELECT shard, n_tokens,
              |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
              |  FROM t)
              |SELECT shard,
              |  CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
              |  COUNT(*) AS n_docs,
              |  CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
              |FROM c
              |GROUP BY shard, pack_id
              |ORDER BY shard, pack_id""".stripMargin)),

    // ----- q61: benchmark decontamination — training docs sharing any
    // 3-gram with the (deterministic ~1%) eval slice; the eval gram
    // blocklist is broadcast, the training side never shuffles (see
    // operators.Decontaminate). Real pipelines use 8-13-grams; the
    // synthetic corpus is token soup with no long verbatim passages,
    // so n=3 is where the fixture exercises the operator (longer n
    // matches zero pairs at test scale).
    QueryDef(
      "q61_decontaminate",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val eval  = docs.filter($"doc_id" % 97 === 0)
        val train = docs.filter($"doc_id" % 97 =!= 0)
        graft.operators.Decontaminate.overlap(train, eval, "doc_id", "text", n = 3)
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (
              |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
              |    THEN list_transform(generate_series(1, len(toks) - 2),
              |                        i -> array_to_string(toks[i:i+2], ' '))
              |    ELSE [] END)) AS gram
              |  FROM t),
              |ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0),
              |tr AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 <> 0)
              |SELECT tr.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
              |FROM tr JOIN ev ON tr.gram = ev.gram
              |GROUP BY tr.doc_id
              |ORDER BY tr.doc_id""".stripMargin)),

    // ----- q62: domain mixing — per-language deterministic
    // subsampling to a target mixture (see operators.Mixing: a literal
    // CASE cutoff against id mod 1000, a codegen'd scan filter with no
    // shuffle). The post-mix per-stratum mass is what a training run
    // consumes.
    QueryDef(
      "q62_domain_mixing",
      (s, d) => {
        import s.implicits._
        graft.operators.Mixing.sampleStrata(
            Tables.documents(s, d), "doc_id", "lang",
            Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.1, "fr" -> 1.0))
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_docs"),
            sum($"n_chars").cast("long").as("total_chars"))
          .orderBy($"lang")
      },
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
             |FROM documents
             |WHERE doc_id % 1000 < CASE lang
             |  WHEN 'en' THEN 500 WHEN 'de' THEN 250
             |  WHEN 'es' THEN 100 WHEN 'fr' THEN 1000 ELSE 0 END
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ----- q63: within-document repetition scores — the Gopher-style
    // duplicate-n-gram fraction per doc (operators.Boilerplate
    // .repetitionRatio), a pure per-row expression: corpus-frequency
    // boilerplate (q56) catches cross-doc repeats, this catches a doc
    // repeating ITSELF.
    QueryDef(
      "q63_repetition_score",
      (s, d) => {
        import s.implicits._
        graft.Par.spread(Tables.documents(s, d))
          .select(
            $"doc_id",
            graft.operators.Boilerplate.repetitionRatio($"text", 2).as("rep2"),
            graft.operators.Boilerplate.repetitionRatio($"text", 3).as("rep3"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |g AS (
              |  SELECT doc_id,
              |    CASE WHEN len(toks) >= 2
              |      THEN list_transform(generate_series(1, len(toks) - 1),
              |                          i -> array_to_string(toks[i:i+1], ' '))
              |      ELSE [] END AS g2,
              |    CASE WHEN len(toks) >= 3
              |      THEN list_transform(generate_series(1, len(toks) - 2),
              |                          i -> array_to_string(toks[i:i+2], ' '))
              |      ELSE [] END AS g3
              |  FROM t)
              |SELECT doc_id,
              |  CASE WHEN len(g2) = 0 THEN 0.0
              |    ELSE floor((1.0 - len(list_distinct(g2)) * 1.0 / len(g2)) * 10000 + 0.5) / 10000 END AS rep2,
              |  CASE WHEN len(g3) = 0 THEN 0.0
              |    ELSE floor((1.0 - len(list_distinct(g3)) * 1.0 / len(g3)) * 10000 + 0.5) / 10000 END AS rep3
              |FROM g
              |ORDER BY doc_id""".stripMargin)),

    // ----- q68: vocabulary build + token-id encoding (operators
    // .Vocab) — the tokenize→ids trainer-input step. The id arrays
    // are checked through order-sensitive digests (first_id) and an
    // order-independent checksum (ids_sum): the driver's comparator
    // can't sort raw array columns, and the digests pin both content
    // and position order anyway.
    QueryDef(
      "q68_vocab_encode",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val vocab = graft.operators.Vocab.build(docs, "text", maxSize = 500)
        graft.operators.Vocab.encode(docs, "doc_id", "text", vocab)
          .select($"doc_id", $"n_tokens", $"n_oov",
            aggregate($"ids", lit(0L), (a, x) => a + x).as("ids_sum"),
            element_at($"ids", 1).as("first_id"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id, $toksSql AS toks FROM documents),
              |e AS (SELECT doc_id, unnest(toks) AS token FROM t),
              |freq AS (SELECT token, COUNT(*) AS n FROM e GROUP BY token),
              |vocab AS (
              |  SELECT token, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS id
              |  FROM (SELECT * FROM freq ORDER BY n DESC, token LIMIT 500)),
              |enc AS (
              |  SELECT e.doc_id, COALESCE(v.id, 0) AS tid
              |  FROM e LEFT JOIN vocab v USING (token)),
              |firsts AS (
              |  SELECT t.doc_id, COALESCE(v.id, 0) AS first_id
              |  FROM t LEFT JOIN vocab v ON v.token = t.toks[1]
              |  WHERE len(t.toks) > 0)
              |SELECT enc.doc_id,
              |  COUNT(*) AS n_tokens,
              |  CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
              |  CAST(SUM(tid) AS BIGINT) AS ids_sum,
              |  ANY_VALUE(firsts.first_id) AS first_id
              |FROM enc JOIN firsts ON enc.doc_id = firsts.doc_id
              |GROUP BY enc.doc_id
              |ORDER BY enc.doc_id""".stripMargin)),

    // ----- q73: higher-order array functions (§2.8-9 breadth:
    // transform / filter / exists / aggregate / zip_with / slice) —
    // the codegen'd lambda surface Spark evaluates without a UDF,
    // mirrored 1:1 by DuckDB list lambdas. Output is scalars only:
    // the driver's comparator cannot sort raw array columns.
    QueryDef(
      "q73_array_functions",
      (s, d) => {
        import s.implicits._
        val toks = TextFunctions.tokens($"text")
        graft.Par.spread(Tables.documents(s, d))
          .select(
            $"doc_id",
            size(filter(toks, t => length(t) > 5)).as("n_long"),
            exists(toks, t => length(t) > 10).cast("int").as("has_giant"),
            aggregate(transform(toks, t => length(t)), lit(0),
              (a, x) => a + x).as("total_chars"),
            // zip_with pairs each token length with its reverse-order
            // counterpart; max of the sums is a position-sensitive
            // scalar digest of the whole array
            array_max(zip_with(
              transform(toks, t => length(t)),
              reverse(transform(toks, t => length(t))),
              (a, b) => a + b)).as("max_sym_len"),
            concat_ws("_", slice(toks, 1, 3)).as("head3"))
          .orderBy($"doc_id")
      },
      Some(s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents)
              |SELECT doc_id,
              |  len(list_filter(toks, x -> length(x) > 5)) AS n_long,
              |  CAST(CASE WHEN len(list_filter(toks, x -> length(x) > 10)) > 0
              |    THEN 1 ELSE 0 END AS INT) AS has_giant,
              |  CAST(COALESCE(list_sum(list_transform(toks, x -> length(x))), 0) AS INT) AS total_chars,
              |  list_max(list_zip(list_transform(toks, x -> length(x)),
              |                    list_reverse(list_transform(toks, x -> length(x))))
              |    .list_transform(p -> p[1] + p[2])) AS max_sym_len,
              |  array_to_string(toks[1:3], '_') AS head3
              |FROM t
              |ORDER BY doc_id""".stripMargin)),

    // ----- q74: curation pipeline v2 — the ROUND-3 operators composed
    // the way a training-data run chains them: domain mixing →
    // benchmark decontamination (drop) → repetition filter → sequence
    // packing, summarized per shard. Each stage is individually
    // oracle-checked (q62/q61/q63/q60); this checks the COMPOSITION —
    // stage boundaries (who filters before whom) are where pipeline
    // bugs live.
    QueryDef(
      "q74_curation_v2",
      (s, d) => {
        import s.implicits._
        import graft.operators.{Decontaminate, Mixing, Packing}
        val docs = Tables.documents(s, d)
        val mixed = Mixing.sampleStrata(docs, "doc_id", "lang",
          Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.1, "fr" -> 1.0))
        val eval = docs.filter($"doc_id" % 97 === 0)
        val train = mixed.filter($"doc_id" % 97 =!= 0)
        val contaminated = Decontaminate.overlap(train, eval, "doc_id", "text", n = 3)
          .select($"doc_id")
        val kept = train
          .join(contaminated, Seq("doc_id"), "left_anti")
          .filter(graft.operators.Boilerplate.repetitionRatio($"text", 2) <= 0.2)
          .select($"doc_id", TextFunctions.tokenCount($"text").as("n_tokens"))
        Packing.manifest(kept, "doc_id", "n_tokens", budget = 2048, shards = 4)
          .groupBy($"shard")
          .agg(
            count(lit(1)).as("n_packs"),
            sum($"n_docs").cast("long").as("n_docs"),
            sum($"pack_tokens").cast("long").as("total_tokens"))
          .orderBy($"shard")
      },
      Some(s"""WITH mixed AS (
              |  SELECT doc_id, lang, text FROM documents
              |  WHERE doc_id % 1000 < CASE lang
              |    WHEN 'en' THEN 500 WHEN 'de' THEN 250
              |    WHEN 'es' THEN 100 WHEN 'fr' THEN 1000 ELSE 0 END),
              |t_all AS (SELECT doc_id, $toksSql AS toks FROM documents),
              |g_all AS (
              |  SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 3
              |    THEN list_transform(generate_series(1, len(toks) - 2),
              |                        i -> array_to_string(toks[i:i+2], ' '))
              |    ELSE [] END)) AS gram
              |  FROM t_all),
              |ev AS (SELECT DISTINCT gram FROM g_all WHERE doc_id % 97 = 0),
              |contam AS (
              |  SELECT DISTINCT g.doc_id FROM g_all g JOIN ev USING (gram)
              |  WHERE g.doc_id % 97 <> 0),
              |surv AS (
              |  SELECT m.doc_id FROM mixed m
              |  WHERE m.doc_id % 97 <> 0
              |    AND m.doc_id NOT IN (SELECT doc_id FROM contam)),
              |rep AS (
              |  SELECT t.doc_id, t.toks,
              |    CASE WHEN len(t.toks) >= 2
              |      THEN list_transform(generate_series(1, len(t.toks) - 1),
              |                          i -> array_to_string(t.toks[i:i+1], ' '))
              |      ELSE [] END AS g2
              |  FROM t_all t JOIN surv USING (doc_id)),
              |keep AS (
              |  SELECT doc_id, len(toks) AS n_tokens FROM rep
              |  WHERE (CASE WHEN len(g2) = 0 THEN 0.0
              |    ELSE floor((1.0 - len(list_distinct(g2)) * 1.0 / len(g2)) * 10000 + 0.5) / 10000 END) <= 0.2),
              |c AS (
              |  SELECT doc_id % 4 AS shard, n_tokens,
              |    SUM(n_tokens) OVER (PARTITION BY doc_id % 4 ORDER BY doc_id) AS cum
              |  FROM keep),
              |p AS (
              |  SELECT shard, CAST(FLOOR((cum - n_tokens) / 2048.0) AS BIGINT) AS pack_id,
              |    COUNT(*) AS nd, SUM(n_tokens) AS tok
              |  FROM c GROUP BY shard, pack_id)
              |SELECT shard, COUNT(*) AS n_packs,
              |  CAST(SUM(nd) AS BIGINT) AS n_docs,
              |  CAST(SUM(tok) AS BIGINT) AS total_tokens
              |FROM p GROUP BY shard ORDER BY shard""".stripMargin)),

    // ----- q127: BPE tokenizer TRAINING (operators.Bpe) — the ranked
    // merge table learned from the corpus's word-frequency dict.
    // FULLY oracle-checked (upgraded from rows-only in round 7): the
    // whole Sennrich recurrence — weighted adjacent-pair counts,
    // (-count, a, b) argmax, greedy left-to-right re-segmentation —
    // unrolls as 30 MATERIALIZED CTE rounds in DuckDB; the re-encode
    // is a list_reduce fold that is provably ≡ Bpe.applyMerge for any
    // single pair (the merged symbol a||b can never equal a, so the
    // fold cannot re-merge across the scan pointer). BpeSpec still
    // pins layout invariance; see [[bpeMergesOracleSql]] for the one
    // documented divergence bound (minPairCount early-stop).
    QueryDef(
      "q127_bpe_merges",
      (s, d) => {
        import s.implicits._
        graft.operators.Bpe.train(Tables.documents(s, d), "text", numMerges = 30)
          .toDF()
          .select($"rank".cast("long").as("rank"), $"left", $"right", $"pairCount".as("pair_count"))
          .orderBy($"rank")
      },
      Some(bpeMergesOracleSql(numMerges = 30, minPairCount = 2L))),

    // ----- q138: the trained tokenizer APPLIED at corpus scale —
    // every document encoded with the q127 merge list (narrow map,
    // per-task word memoization), rolled up to the fertility stats a
    // tokenizer rollout is judged by: subwords per doc and the
    // subword/whitespace-token ratio per language. Rows-only like
    // q127 (the merge recurrence isn't SQL-expressible); determinism
    // rides BpeSpec's merge-for-merge + encode round-trip pins.
    QueryDef(
      "q138_bpe_encode_corpus",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
        val merges = graft.operators.Bpe.train(docs, "text", numMerges = 30)
        val enc = graft.operators.Bpe.encode(docs, "doc_id", "text", merges)
          .select($"doc_id", size($"subwords").as("n_subwords"))
        docs.select($"doc_id", $"lang",
            graft.functions.TextFunctions.tokenCount($"text").as("n_words"))
          .join(enc, "doc_id")
          .groupBy($"lang")
          .agg(count(lit(1)).as("n_docs"),
            sum($"n_subwords").as("total_subwords"),
            sum($"n_words").as("total_words"),
            expr("CAST(floor(CAST(1000 * sum(n_subwords) AS DOUBLE) / " +
              "CAST(sum(n_words) AS DOUBLE)) AS BIGINT)").as("fertility_milli"))
          .orderBy($"lang")
      },
      // upgraded from rows-only in round 7 alongside q127: the oracle
      // replays the SAME training chain, reads the FINAL dictionary
      // (word → merged symbol count after all 30 rounds — exactly
      // segmentWord's output length, since applying merges in rank
      // order to the dict word IS the training-state evolution), and
      // re-aggregates the fertility stats per language. Valid for
      // corpora with no zero-token documents (this one — the encode
      // join is inner on exploded words).
      Some(
        s"""WITH ${bpeTrainCtes(30)},
           |wlen AS MATERIALIZED (SELECT w, len(syms) AS ns FROM w30),
           |dw AS (
           |  SELECT doc_id, lang, unnest(list_filter(
           |      string_split_regex(trim(COALESCE(text, '')), '\\s+'),
           |      x -> length(x) > 0)) AS w
           |  FROM documents),
           |perdoc AS (
           |  SELECT d.doc_id, any_value(d.lang) AS lang,
           |    CAST(SUM(wl.ns) AS BIGINT) AS n_subwords,
           |    COUNT(*) AS n_words
           |  FROM dw d JOIN wlen wl ON d.w = wl.w
           |  GROUP BY d.doc_id)
           |SELECT lang, COUNT(*) AS n_docs,
           |  CAST(SUM(n_subwords) AS BIGINT) AS total_subwords,
           |  CAST(SUM(n_words) AS BIGINT) AS total_words,
           |  CAST(floor(CAST(1000 * SUM(n_subwords) AS DOUBLE) /
           |             CAST(SUM(n_words) AS DOUBLE)) AS BIGINT) AS fertility_milli
           |FROM perdoc GROUP BY lang ORDER BY lang""".stripMargin)),

    // ----- q142: temperature-scaled mixture weights (τ = 0.7, the
    // standard multilingual rebalance) — the recipe-table companion
    // of q62's mixture EXECUTION: per source, empirical share p,
    // τ-scaled weight w, and the integer per-epoch allocation. pow()
    // is the one non-exact op; both w and p are r4-rounded and alloc
    // derives from the ROUNDED w, so the oracle's allocations match
    // integer-for-integer.
    QueryDef(
      "q142_temperature_mixing",
      (s, d) => {
        import s.implicits._
        graft.operators.Mixing.temperatureWeights(
            Tables.documents(s, d), "source", tau = 0.7, epochSize = 10000L)
          .orderBy($"source")
      },
      Some("""WITH c AS (SELECT source, count(*) AS n_docs
             |          FROM documents GROUP BY source),
             |t AS (SELECT SUM(n_docs) AS n_tot,
             |             SUM(pow(CAST(n_docs AS DOUBLE), 0.7)) AS z FROM c)
             |SELECT source, n_docs,
             |  floor(CAST(n_docs AS DOUBLE) / CAST(n_tot AS DOUBLE)
             |    * 10000 + 0.5) / 10000 AS p,
             |  floor(pow(CAST(n_docs AS DOUBLE), 0.7) / z
             |    * 10000 + 0.5) / 10000 AS w,
             |  CAST(floor((floor(pow(CAST(n_docs AS DOUBLE), 0.7) / z
             |    * 10000 + 0.5) / 10000) * 10000 + 0.5) AS BIGINT) AS alloc
             |FROM c, t
             |ORDER BY source""".stripMargin)
    ),

    // ----- q228: Good–Turing frequency smoothing over corpus
    // BIGRAMS — the unseen-mass estimate (P₀ = n₁/N) and the
    // adjusted counts r* = (r+1)·n_{r+1}/n_r for the low-frequency
    // band (r ≤ 8), the classical answer to "how much probability
    // should a language model reserve for n-grams it never saw".
    // Bigrams, not unigrams: the synthetic vocabulary has no rare
    // WORDS (min count 26 at sf0.01), but the bigram spectrum has a
    // genuine low-count tail at both SFs. Pure integer algebra on
    // the frequency-of-frequencies table (integer divisions both
    // engines); next to q183 Zipf, q162 Heaps, and the q138 KN
    // bigram model in the vocabulary-statistics family.
    QueryDef(
      "q228_good_turing",
      (s, d) => {
        import s.implicits._
        val t = graft.Par.spread(Tables.documents(s, d))
          .select(graft.functions.TextFunctions.spaceTokens($"text")
            .as("toks"))
          .filter(size($"toks") >= 2)
        val bi = t.select(explode(zip_with(
          slice($"toks", lit(1), size($"toks") - 1),
          slice($"toks", lit(2), size($"toks") - 1),
          (a, b) => concat(a, lit(" "), b))).as("bg"))
        val counts = bi.groupBy($"bg").agg(count(lit(1)).as("r"))
        val fof = counts.groupBy($"r").agg(count(lit(1)).as("nr"))
          .transform(graft.operators.Iterate.truncate)   // three consumers: N, n1, the band
        val tot = fof.agg(sum($"r" * $"nr").as("n_bigrams"))
        val n1 = fof.agg(coalesce(sum(when($"r" === 1, $"nr")), lit(0L))
          .as("n_1"))
        val nxt = fof.select(($"r" - 1).as("r"), $"nr".as("nr_next"))
        fof.filter($"r" <= 8).join(nxt, Seq("r"), "left")
          .crossJoin(tot).crossJoin(n1)
          .select($"r", $"nr",
            coalesce($"nr_next", lit(0L)).as("nr_next"),
            expr("1000 * (r + 1) * coalesce(nr_next, 0) DIV nr")
              .as("rstar_milli"),
            $"n_bigrams",
            expr("1000000 * n_1 DIV n_bigrams").as("p0_micro"))
          .orderBy($"r")
      },
      Some(s"""WITH t AS (
             |  SELECT $toksSqlSpace AS toks FROM documents),
             |bi AS (
             |  SELECT toks[i] || ' ' || toks[i + 1] AS bg
             |  FROM t, unnest(range(1, len(toks))) AS u(i)
             |  WHERE len(toks) >= 2),
             |counts AS (SELECT bg, CAST(count(*) AS BIGINT) AS r
             |           FROM bi GROUP BY bg),
             |fof AS (SELECT r, CAST(count(*) AS BIGINT) AS nr
             |        FROM counts GROUP BY r),
             |tot AS (SELECT CAST(SUM(r * nr) AS BIGINT) AS n_bigrams FROM fof),
             |n1 AS (SELECT CAST(COALESCE(SUM(CASE WHEN r = 1 THEN nr END), 0)
             |         AS BIGINT) AS n_1 FROM fof)
             |SELECT f.r, f.nr,
             |  CAST(coalesce(nx.nr, 0) AS BIGINT) AS nr_next,
             |  CAST(1000 * (f.r + 1) * coalesce(nx.nr, 0) // f.nr AS BIGINT)
             |    AS rstar_milli,
             |  tot.n_bigrams,
             |  CAST(1000000 * n1.n_1 // tot.n_bigrams AS BIGINT) AS p0_micro
             |FROM fof f LEFT JOIN fof nx ON nx.r = f.r + 1
             |CROSS JOIN tot CROSS JOIN n1
             |WHERE f.r <= 8
             |ORDER BY f.r""".stripMargin)),

    // ----- q229: Hill tail-index estimator (Hill 1975) on per-part
    // revenue — "how heavy is the revenue tail" as a number, the
    // quantitative companion to q183's Zipf slope: α̂ = k / Σ ln(x_i
    // / x_ref) over the top k=200 order statistics (x_ref = the
    // 201st). One r4-snapped ln per tail member (the q96/q165 libm
    // discipline), exact BIGINT sum, one final mirrored division.
    // The top-(k+1) selection is a TakeOrderedAndProject — never a
    // global sort or unpartitioned window on the Spark side.
    QueryDef(
      "q229_hill_tail",
      (s, d) => {
        import s.implicits._
        val k = 200
        val x = Tables.lineitem(s, d).groupBy($"l_partkey")
          .agg(sum(floor($"l_extendedprice" * 100 + lit(0.5)).cast("long"))
            .as("x"))
        val top = x.orderBy($"x".desc, $"l_partkey").limit(k + 1)
          .transform(graft.operators.Iterate.truncate)
        // the (k+1)-th row in (x desc, key asc) order = min x, then
        // max key among min-x rows: min of (x, −key)
        val ref = top.agg(min(struct($"x", (-$"l_partkey").as("nk"))).as("m"))
          .select($"m.x".as("xref"), (-$"m.nk").as("kref"))
        val terms = top.crossJoin(ref)
          .filter(!($"x" === $"xref" && $"l_partkey" === $"kref"))
          .select($"xref",
            floor(log($"x".cast("double") / $"xref") * 10000 + lit(0.5))
              .cast("long").as("lnq"))
        // a corpus with fewer than k+1 distinct values has no (k+1)-th
        // reference order statistic - emit nothing, as the oracle's
        // rn = k+1 lookup does (seen at sf0.001: exactly 200 parts)
        terms.groupBy($"xref").agg(count(lit(1)).as("k"), sum($"lnq").as("s"))
          .filter($"k" === k)
          .select($"k", $"xref".as("x_ref_cents"), $"s".as("sum_lnq"),
            floor($"k".cast("double") * 10000 / $"s" * 1000000 + lit(0.5))
              .cast("long").as("alpha_micro"))
      },
      Some("""WITH x AS (
             |  SELECT l_partkey,
             |    CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS x
             |  FROM lineitem GROUP BY 1),
             |rk AS (
             |  SELECT l_partkey, x,
             |    row_number() OVER (ORDER BY x DESC, l_partkey) AS rn
             |  FROM x),
             |ref AS (SELECT x AS xref FROM rk WHERE rn = 201),
             |terms AS (
             |  SELECT ref.xref,
             |    CAST(floor(ln(CAST(rk.x AS DOUBLE) / ref.xref) * 10000 + 0.5)
             |      AS BIGINT) AS lnq
             |  FROM rk CROSS JOIN ref WHERE rk.rn <= 200),
             |agg AS (SELECT xref, CAST(count(*) AS BIGINT) AS k,
             |          CAST(SUM(lnq) AS BIGINT) AS s
             |        FROM terms GROUP BY 1 HAVING count(*) = 200)
             |SELECT k, xref AS x_ref_cents, s AS sum_lnq,
             |  CAST(floor(CAST(k AS DOUBLE) * 10000 / s * 1000000 + 0.5)
             |    AS BIGINT) AS alpha_micro
             |FROM agg""".stripMargin)),

    // ----- q230: Gumbel block-maxima fit (method of moments) over
    // monthly maxima of daily revenue — the extreme-value member:
    // β = s·√6/π and μ = x̄ − γβ with √6/π and Euler's γ inlined as
    // DOUBLE LITERALS (no π/γ evaluation, no libm at all — the only
    // irrational op is one exactly-rounded sqrt on exact integer
    // moments), so the fitted location/scale match micro-for-micro.
    QueryDef(
      "q230_gumbel_maxima",
      (s, d) => {
        import s.implicits._
        val daily = Tables.orders(s, d)
          .groupBy($"o_orderdate".cast("date").as("day"))
          .agg(sum(floor($"o_totalprice" * 100 + lit(0.5)).cast("long"))
            .as("rev"))
        val blocks = daily
          .groupBy(date_trunc("month", $"day").cast("date").as("month"))
          .agg(expr("max(rev) DIV 100").as("x"))     // block maxima in $
        // sxx in decimal(38,0): a monthly max can reach ~2^31 dollars
        // at 100×, so the square-sum needs exact wide integers (the
        // repo's decimal moment-sum discipline)
        val m = blocks.agg(count(lit(1)).as("n"), sum($"x").as("sx"),
          sum($"x".cast("decimal(38,0)") * $"x").as("sxx"))
        val nd = $"n".cast("double")
        val mean = $"sx".cast("double") / $"n"
        val sd = sqrt((nd * $"sxx".cast("double")
          - $"sx".cast("double") * $"sx") / (nd * (nd - 1.0)))
        val beta = sd * 0.779696801233676      // √6/π
        val mu = mean - lit(0.5772156649015329) * beta   // Euler γ
        m.select($"n".as("n_months"),
          floor(mean + lit(0.5)).cast("long").as("mean_dollars"),
          floor(beta + lit(0.5)).cast("long").as("beta_dollars"),
          floor(mu + lit(0.5)).cast("long").as("mu_dollars"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(o_orderdate AS DATE) AS day,
             |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
             |      AS BIGINT) AS rev
             |  FROM orders GROUP BY 1),
             |blocks AS (
             |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
             |    CAST(MAX(rev) // 100 AS BIGINT) AS x
             |  FROM daily GROUP BY 1),
             |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |        CAST(SUM(x) AS BIGINT) AS sx,
             |        SUM(CAST(x AS HUGEINT) * x) AS sxx
             |      FROM blocks)
             |SELECT n AS n_months,
             |  CAST(floor(CAST(sx AS DOUBLE) / n + 0.5) AS BIGINT)
             |    AS mean_dollars,
             |  CAST(floor(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * sx)
             |      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |    * 0.779696801233676 + 0.5) AS BIGINT)
             |    AS beta_dollars,
             |  CAST(floor((CAST(sx AS DOUBLE) / n - 0.5772156649015329
             |      * (sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * sx)
             |        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
             |        * 0.779696801233676))
             |    + 0.5) AS BIGINT) AS mu_dollars
             |FROM m""".stripMargin)),

    // ----- q281: pairwise Jensen–Shannon divergence between source
    // unigram distributions — the SYMMETRIC, bounded companion to
    // q116's KL and the distributional refinement of q205's vocab
    // Jaccard (that one asks which words sources share; this weighs
    // HOW differently they use them — the corpus-mixing distance
    // DSIR-style selection actually wants). Per shared word the
    // pointwise JS term p·ln(2p/(p+q)) + q·ln(2q/(p+q)) ≥ 0 is one
    // double chain nano-snapped before exact BIGINT sums; the
    // disjoint-support mass enters in closed form (ln 2 × unmatched
    // probability mass per side), so no outer join is ever built;
    // the final halving is integer DIV. All 190 source pairs out.
    QueryDef(
      "q281_js_divergence",
      (s, d) => {
        import s.implicits._
        val toks = graft.Par.spread(Tables.documents(s, d))
          .select($"source",
            explode(TextFunctions.tokens($"text")).as("w"))
        val cnt = toks.groupBy($"source", $"w").agg(count(lit(1)).as("n"))
        val tot = cnt.groupBy($"source").agg(sum($"n").as("nn"))
        val cw = cnt.join(tot, "source").transform(graft.operators.Iterate.truncate)
        val p = $"na".cast("double") / $"nna".cast("double")
        val q = $"nb".cast("double") / $"nnb".cast("double")
        val shared = cw.as("a").join(cw.as("b"),
            $"a.w" === $"b.w" && $"a.source" < $"b.source")
          .select($"a.source".as("src_a"), $"b.source".as("src_b"),
            $"a.n".as("na"), $"a.nn".as("nna"),
            $"b.n".as("nb"), $"b.nn".as("nnb"))
          .withColumn("term_nano",
            floor((p * log(lit(2.0) * p / (p + q))
              + q * log(lit(2.0) * q / (p + q))) * 1000000000.0 + lit(0.5))
              .cast("long"))
        shared.groupBy($"src_a", $"src_b")
          .agg(count(lit(1)).as("n_shared"),
            sum($"term_nano").as("ts"),
            sum($"na").as("ma"), max($"nna").as("nna"),
            sum($"nb").as("mb"), max($"nnb").as("nnb"))
          .withColumn("aonly_nano",
            floor(log(lit(2.0)) * ($"nna" - $"ma").cast("double")
              / $"nna".cast("double") * 1000000000.0 + lit(0.5)).cast("long"))
          .withColumn("bonly_nano",
            floor(log(lit(2.0)) * ($"nnb" - $"mb").cast("double")
              / $"nnb".cast("double") * 1000000000.0 + lit(0.5)).cast("long"))
          .select($"src_a", $"src_b", $"n_shared",
            expr("(ts + aonly_nano + bonly_nano) DIV 2").as("jsd_nano"))
          .orderBy($"src_a", $"src_b")
      },
      Some("""WITH toks AS (
             |  SELECT source, unnest(list_filter(
             |    string_split_regex(trim(text), '\s+'),
             |    x -> length(x) > 0)) AS w
             |  FROM documents),
             |cnt AS (
             |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM toks GROUP BY 1, 2),
             |tot AS (
             |  SELECT source, CAST(SUM(n) AS BIGINT) AS nn
             |  FROM cnt GROUP BY 1),
             |cw AS MATERIALIZED (
             |  SELECT c.source, c.w, c.n, t.nn
             |  FROM cnt c JOIN tot t USING (source)),
             |shared AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |    a.n AS na, a.nn AS nna, b.n AS nb, b.nn AS nnb,
             |    CAST(floor((
             |      CAST(a.n AS DOUBLE) / CAST(a.nn AS DOUBLE)
             |        * ln(2.0 * (CAST(a.n AS DOUBLE) / CAST(a.nn AS DOUBLE))
             |          / (CAST(a.n AS DOUBLE) / CAST(a.nn AS DOUBLE)
             |             + CAST(b.n AS DOUBLE) / CAST(b.nn AS DOUBLE)))
             |      + CAST(b.n AS DOUBLE) / CAST(b.nn AS DOUBLE)
             |        * ln(2.0 * (CAST(b.n AS DOUBLE) / CAST(b.nn AS DOUBLE))
             |          / (CAST(a.n AS DOUBLE) / CAST(a.nn AS DOUBLE)
             |             + CAST(b.n AS DOUBLE) / CAST(b.nn AS DOUBLE))))
             |      * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
             |  FROM cw a JOIN cw b ON a.w = b.w AND a.source < b.source),
             |agg AS (
             |  SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_shared,
             |    CAST(SUM(term_nano) AS BIGINT) AS ts,
             |    CAST(SUM(na) AS BIGINT) AS ma, CAST(MAX(nna) AS BIGINT) AS nna,
             |    CAST(SUM(nb) AS BIGINT) AS mb, CAST(MAX(nnb) AS BIGINT) AS nnb
             |  FROM shared GROUP BY 1, 2)
             |SELECT src_a, src_b, n_shared,
             |  (ts
             |   + CAST(floor(ln(2.0) * CAST(nna - ma AS DOUBLE)
             |       / CAST(nna AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT)
             |   + CAST(floor(ln(2.0) * CAST(nnb - mb AS DOUBLE)
             |       / CAST(nnb AS DOUBLE) * 1000000000.0 + 0.5) AS BIGINT))
             |  // 2 AS jsd_nano
             |FROM agg ORDER BY src_a, src_b""".stripMargin)),

    // ----- q301: context-length truncation-loss curve — for each
    // candidate training context L, how many documents exceed it and
    // what fraction of corpus TOKENS a hard truncation discards:
    // the sizing analysis that picks L before q60's packing runs at
    // the chosen one. Scatter-by-explode per L (no per-L scans);
    // exact integer token counts (the q23 \s+ convention),
    // loss_milli by round-half-up integer division.
    QueryDef(
      "q301_truncation_loss",
      (s, d) => {
        import s.implicits._
        val ls = Seq(128, 256, 512, 1024)
        graft.Par.spread(Tables.documents(s, d))
          .select(size(graft.functions.TextFunctions.tokens($"text"))
            .cast("long").as("nt"))
          .select($"nt", explode(array(ls.map(lit): _*)).as("context_len"))
          .groupBy($"context_len")
          .agg(count(lit(1)).as("n_docs"),
            sum(when($"nt" > $"context_len", 1L).otherwise(0L))
              .as("docs_truncated"),
            sum($"nt").as("tokens_total"),
            sum(greatest($"nt" - $"context_len", lit(0L))).as("tokens_lost"))
          .select($"context_len".cast("long").as("context_len"),
            $"n_docs", $"docs_truncated", $"tokens_total", $"tokens_lost",
            expr("(2000 * tokens_lost + tokens_total) DIV (2 * tokens_total)")
              .as("loss_milli"))
          .orderBy($"context_len")
      },
      Some(s"""WITH nt AS (
             |  SELECT len(list_filter(string_split_regex(trim(text), '\\s+'),
             |    x -> length(x) > 0)) AS nt
             |  FROM documents),
             |sc AS (
             |  SELECT CAST(l.l AS BIGINT) AS context_len, nt.nt
             |  FROM nt CROSS JOIN (VALUES (128), (256), (512), (1024))
             |    AS l(l))
             |SELECT context_len,
             |  CAST(COUNT(*) AS BIGINT) AS n_docs,
             |  CAST(SUM(CASE WHEN nt > context_len THEN 1 ELSE 0 END)
             |    AS BIGINT) AS docs_truncated,
             |  CAST(SUM(nt) AS BIGINT) AS tokens_total,
             |  CAST(SUM(GREATEST(nt - context_len, 0)) AS BIGINT)
             |    AS tokens_lost,
             |  CAST((2000 * CAST(SUM(GREATEST(nt - context_len, 0)) AS BIGINT)
             |      + CAST(SUM(nt) AS BIGINT))
             |    // (2 * CAST(SUM(nt) AS BIGINT)) AS BIGINT) AS loss_milli
             |FROM sc GROUP BY 1 ORDER BY context_len""".stripMargin)),

    // ----- q316: Flesch-style readability scoring per (source,
    // lang) — the READABILITY member of the quality family (q25
    // ratio score, q128 learned filter): FRE = 206.835 − 1.015·
    // (words/sentence) − 84.6·(syllables/word), with the corpus's
    // punctuation-free docs taking the doc-as-sentence convention
    // (documented; the machinery is the per-word syllable counter).
    // Syllables = vowel-group runs via a marker regexp (min 1 per
    // word — the standard heuristic), exact integer totals on both
    // engines; FRE is ONE double chain over the exact counts,
    // micro-snapped.
    QueryDef(
      "q316_readability",
      (s, d) => {
        import s.implicits._
        val words = Tables.documents(s, d)
          .select($"doc_id", $"source", $"lang",
            explode(split($"text", " ")).as("w"))
          .filter(length($"w") > 0)
        val marked = words.withColumn("r",
          regexp_replace(lower($"w"), "[aeiouy]+", "#"))
        val syl = marked.withColumn("runs",
          (length($"r") - length(translate($"r", "#", ""))).cast("long"))
          .withColumn("syl", greatest(lit(1L), $"runs"))
        val perDoc = syl.groupBy($"doc_id", $"source", $"lang").agg(
          count(lit(1)).as("nw"), sum($"syl").as("ns"))
        val grp = perDoc.groupBy($"source", $"lang").agg(
          count(lit(1)).as("n_docs"),
          sum($"nw").as("n_words"),
          sum($"ns").as("n_syllables"))
        def d2(c: org.apache.spark.sql.Column) = c.cast("double")
        grp.select($"source", $"lang", $"n_docs", $"n_words", $"n_syllables",
            floor((lit(206.835)
              - lit(1.015) * (d2($"n_words") / d2($"n_docs"))
              - lit(84.6) * (d2($"n_syllables") / d2($"n_words")))
              * 1000000 + lit(0.5)).cast("long").as("fre_micro"))
          .orderBy($"source", $"lang")
      },
      Some("""WITH words AS (
             |  SELECT doc_id, source, lang, w
             |  FROM (SELECT doc_id, source, lang,
             |          unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  WHERE length(w) > 0),
             |syl AS (
             |  SELECT doc_id, source, lang,
             |    GREATEST(1, length(r) - length(replace(r, '#', ''))) AS syl
             |  FROM (SELECT doc_id, source, lang,
             |          regexp_replace(lower(w), '[aeiouy]+', '#', 'g') AS r
             |        FROM words)),
             |per_doc AS (
             |  SELECT doc_id, source, lang,
             |    CAST(COUNT(*) AS BIGINT) AS nw,
             |    CAST(SUM(syl) AS BIGINT) AS ns
             |  FROM syl GROUP BY 1, 2, 3),
             |grp AS (
             |  SELECT source, lang,
             |    CAST(COUNT(*) AS BIGINT) AS n_docs,
             |    CAST(SUM(nw) AS BIGINT) AS n_words,
             |    CAST(SUM(ns) AS BIGINT) AS n_syllables
             |  FROM per_doc GROUP BY 1, 2)
             |SELECT source, lang, n_docs, n_words, n_syllables,
             |  CAST(floor((206.835
             |    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_docs AS DOUBLE))
             |    - 84.6 * (CAST(n_syllables AS DOUBLE)
             |      / CAST(n_words AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS fre_micro
             |FROM grp ORDER BY source, lang""".stripMargin)),

    // ----- q326: character-level Shannon entropy per source — the
    // COMPRESSIBILITY proxy next to q296's event-mix entropy and
    // q63's repetition score: low char entropy flags templated or
    // degenerate corpora before tokenization even runs. Per-char
    // probability terms p·ln p are micro-snapped per distinct
    // character (alphabet-bounded, so the integer sum is order-free
    // — the q165 per-factor discipline); counts exact.
    QueryDef(
      "q326_char_entropy",
      (s, d) => {
        import s.implicits._
        val ch = Tables.documents(s, d)
          .select($"source", explode(split($"text", "")).as("ch"))
          .filter(length($"ch") > 0)
        val hist = ch.groupBy($"source", $"ch").agg(count(lit(1)).as("cnt"))
        val tot = hist.groupBy($"source").agg(
          sum($"cnt").as("tot"), count(lit(1)).as("n_distinct"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val p = db($"cnt") / db($"tot")
        hist.join(tot, "source")
          .select($"source", $"tot", $"n_distinct",
            floor(p * log(p) * 1000000 + lit(0.5)).cast("long").as("term"))
          .groupBy($"source", $"tot", $"n_distinct")
          .agg((-sum($"term")).as("entropy_micro"))
          .select($"source", $"tot".as("n_chars"), $"n_distinct",
            $"entropy_micro")
          .orderBy($"source")
      },
      Some("""WITH ch AS (
             |  SELECT source, c AS ch
             |  FROM (SELECT source, unnest(string_split(text, '')) AS c
             |        FROM documents)
             |  WHERE length(c) > 0),
             |hist AS (
             |  SELECT source, ch, CAST(COUNT(*) AS BIGINT) AS cnt
             |  FROM ch GROUP BY 1, 2),
             |tot AS (
             |  SELECT source, CAST(SUM(cnt) AS BIGINT) AS tot,
             |    CAST(COUNT(*) AS BIGINT) AS n_distinct
             |  FROM hist GROUP BY 1),
             |terms AS (
             |  SELECT h.source, t.tot, t.n_distinct,
             |    CAST(floor(CAST(h.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE)
             |      * ln(CAST(h.cnt AS DOUBLE) / CAST(t.tot AS DOUBLE))
             |      * 1000000 + 0.5) AS BIGINT) AS term
             |  FROM hist h JOIN tot t ON t.source = h.source)
             |SELECT source, tot AS n_chars, n_distinct,
             |  CAST(-SUM(term) AS BIGINT) AS entropy_micro
             |FROM terms GROUP BY source, tot, n_distinct
             |ORDER BY source""".stripMargin)),

    // ----- q331: cross-source n-gram novelty — per source, the
    // fraction of its distinct trigrams appearing in NO other source:
    // the "does this source add anything" mixing signal next to q62's
    // volume-based domain mixing and q281's distributional JSD.
    // Trigram arrays by the q324 index-transform (no explode-order
    // dependence); per-gram source counts from one distinct frame;
    // novelty an exact integer ppm division.
    QueryDef(
      "q331_ngram_novelty",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d).select($"source",
          expr("filter(split(text, ' '), x -> x != '')").as("ws"))
        val tg = docs.select($"source",
            explode(expr(
              """CASE WHEN size(ws) < 3 THEN array()
                |ELSE transform(sequence(1, size(ws) - 2),
                |  i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1),
                |    ' ', element_at(ws, i + 2)))
                |END""".stripMargin)).as("gram"))
          .distinct()
          .transform(graft.operators.Iterate.truncate) // gram-count + rollup legs read it
        val ns = tg.groupBy($"gram").agg(count(lit(1)).as("n_sources"))
        tg.join(ns, "gram")
          .groupBy($"source").agg(
            count(lit(1)).as("n_grams"),
            sum(when($"n_sources" === 1L, 1L).otherwise(0L)).as("n_unique"))
          .select($"source", $"n_grams", $"n_unique",
            expr("n_unique * 1000000 DIV n_grams").as("novelty_ppm"))
          .orderBy($"source")
      },
      Some("""WITH docs AS (
             |  SELECT source,
             |    list_filter(string_split(text, ' '), x -> x <> '') AS ws
             |  FROM documents),
             |tg AS MATERIALIZED (
             |  SELECT DISTINCT source, gram
             |  FROM (
             |    SELECT source,
             |      unnest(CASE WHEN len(ws) < 3 THEN []
             |        ELSE list_transform(range(1, len(ws) - 1),
             |          i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])
             |        END) AS gram
             |    FROM docs)),
             |ns AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS n_sources
             |       FROM tg GROUP BY 1)
             |SELECT t.source,
             |  CAST(COUNT(*) AS BIGINT) AS n_grams,
             |  CAST(SUM(CASE WHEN ns.n_sources = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_unique,
             |  CAST(SUM(CASE WHEN ns.n_sources = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000 // CAST(COUNT(*) AS BIGINT)
             |    AS novelty_ppm
             |FROM tg t JOIN ns ON ns.gram = t.gram
             |GROUP BY t.source ORDER BY t.source""".stripMargin)),

    // ----- q339: TF-IDF cosine pairs over a hash-sampled,
    // lang-blocked document set — the WEIGHTED similarity member
    // between the set-based dedup family (q26 Jaccard, q324 ROUGE-2)
    // and the query-doc BM25 (q52): rare shared vocabulary counts
    // more than common. idf is ONE snapped ln per sampled-corpus
    // word (vocabulary-bounded, the q165 discipline); weights
    // tf·idf_micro and norms are exact integers; the cosine is ONE
    // double chain over exact sums, micro-snapped; only pairs at
    // cosine ≥ 0.5 emit (an exact integer threshold on the snapped
    // value, identical both sides).
    QueryDef(
      "q339_tfidf_cosine",
      (s, d) => {
        import s.implicits._
        // hash-CAPPED 400-doc pool (the q189 discipline) — a fixed
        // rate would grow the pair frame quadratically with corpus
        val docs = Tables.documents(s, d)
          .withColumn("hf",
            graft.operators.Sampling.hashFraction($"doc_id", 339L))
          .orderBy($"hf", $"doc_id").limit(400)
          .select($"doc_id", $"lang",
            explode(expr("filter(split(text, ' '), x -> x != '')"))
              .as("w"))
        val tf = docs.groupBy($"doc_id", $"lang", $"w")
          .agg(count(lit(1)).as("tf"))
          .transform(graft.operators.Iterate.truncate) // df + weight legs read it
        val nDocs = tf.select($"doc_id").distinct()
          .agg(count(lit(1)).as("nd"))
        val dfreq = tf.groupBy($"w").agg(count(lit(1)).as("df"))
        val idf = dfreq.crossJoin(nDocs).select($"w",
          floor(log($"nd".cast("double") / $"df".cast("double"))
            * 1000000 + lit(0.5)).cast("long").as("idf"))
        val wts = tf.join(idf, "w")
          .select($"doc_id", $"lang", $"w", ($"tf" * $"idf").as("wt"))
          .transform(graft.operators.Iterate.truncate) // norm + pair legs read it
        val norms = wts.groupBy($"doc_id").agg(
          sum($"wt".cast("decimal(38,0)") * $"wt").as("n2"))
        val dot = wts.as("a").join(wts.as("b"),
            col("a.w") === col("b.w") && col("a.lang") === col("b.lang") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .agg(sum(col("a.wt").cast("decimal(38,0)") * col("b.wt"))
            .as("dot"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        dot
          .join(norms.select($"doc_id".as("doc_a"), $"n2".as("na2")), "doc_a")
          .join(norms.select($"doc_id".as("doc_b"), $"n2".as("nb2")), "doc_b")
          .filter($"na2" > 0 && $"nb2" > 0) // all-idf-zero docs: no norm
          .select($"doc_a", $"doc_b",
            floor(db($"dot") / (sqrt(db($"na2")) * sqrt(db($"nb2")))
              * 1000000 + lit(0.5)).cast("long").as("cosine_micro"))
          .filter($"cosine_micro" >= 500000L)
          .orderBy($"doc_a", $"doc_b")
      },
      Some(s"""WITH words AS (
             |  SELECT doc_id, lang, w
             |  FROM (SELECT doc_id, lang,
             |          unnest(string_split(text, ' ')) AS w
             |        FROM (
             |          SELECT doc_id, lang, text FROM (
             |            SELECT doc_id, lang, text,
             |              ${graft.operators.Sampling
                            .hashFractionSql("doc_id", 339L)} AS hf
             |            FROM documents)
             |          ORDER BY hf, doc_id LIMIT 400))
             |  WHERE length(w) > 0),
             |tf AS MATERIALIZED (
             |  SELECT doc_id, lang, w, CAST(COUNT(*) AS BIGINT) AS tf
             |  FROM words GROUP BY 1, 2, 3),
             |nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
             |       FROM tf),
             |idf AS (
             |  SELECT w, CAST(floor(ln(CAST(nd.nd AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
             |    AS idf
             |  FROM tf CROSS JOIN nd GROUP BY w, nd.nd),
             |wts AS MATERIALIZED (
             |  SELECT t.doc_id, t.lang, t.w, t.tf * i.idf AS wt
             |  FROM tf t JOIN idf i ON i.w = t.w),
             |norms AS (
             |  SELECT doc_id, SUM(CAST(wt AS HUGEINT) * wt) AS n2
             |  FROM wts GROUP BY 1),
             |dot AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |    SUM(CAST(a.wt AS HUGEINT) * b.wt) AS dot
             |  FROM wts a JOIN wts b ON a.w = b.w AND a.lang = b.lang
             |    AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT d.doc_a, d.doc_b,
             |  CAST(floor(CAST(d.dot AS DOUBLE)
             |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) AS cosine_micro
             |FROM dot d
             |JOIN norms na ON na.doc_id = d.doc_a
             |JOIN norms nb ON nb.doc_id = d.doc_b
             |WHERE na.n2 > 0 AND nb.n2 > 0
             |  AND CAST(floor(CAST(d.dot AS DOUBLE)
             |    / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
             |    * 1000000 + 0.5) AS BIGINT) >= 500000
             |ORDER BY d.doc_a, d.doc_b""".stripMargin)),

    // ----- q343: Chao1 vocabulary-richness estimate per source —
    // "how many word types does this source REALLY have, counting
    // the ones we haven't sampled yet": the species-richness member
    // completing the unseen-mass trio (q228 Good–Turing discounts
    // the seen, q260 capture–recapture sizes a duplicate population,
    // Chao1 extrapolates the unseen from singletons/doubletons).
    // Bias-corrected form D + f₁(f₁−1)/(2(f₂+1)) — defined even at
    // f₂ = 0; counts exact, the estimate ONE double chain,
    // milli-snapped.
    QueryDef(
      "q343_chao1_richness",
      (s, d) => {
        import s.implicits._
        val wc = Tables.documents(s, d)
          .select($"source",
            explode(expr("filter(split(text, ' '), x -> x != '')")).as("w"))
          .groupBy($"source", $"w").agg(count(lit(1)).as("c"))
        def db(c: org.apache.spark.sql.Column) = c.cast("double")
        val agg = wc.groupBy($"source").agg(
          count(lit(1)).as("d_obs"),
          sum(when($"c" === 1L, 1L).otherwise(0L)).as("f1"),
          sum(when($"c" === 2L, 1L).otherwise(0L)).as("f2"),
          sum($"c").as("n_tokens"))
        agg.select($"source", $"n_tokens", $"d_obs", $"f1", $"f2",
            floor((db($"d_obs") + db($"f1") * (db($"f1") - lit(1.0))
              / (lit(2.0) * (db($"f2") + lit(1.0))))
              * 1000 + lit(0.5)).cast("long").as("chao1_milli"))
          .orderBy($"source")
      },
      Some("""WITH words AS (
             |  SELECT source, w
             |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
             |        FROM documents)
             |  WHERE length(w) > 0),
             |wc AS (
             |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
             |  FROM words GROUP BY 1, 2),
             |agg AS (
             |  SELECT source,
             |    CAST(COUNT(*) AS BIGINT) AS d_obs,
             |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS f1,
             |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS f2,
             |    CAST(SUM(c) AS BIGINT) AS n_tokens
             |  FROM wc GROUP BY 1)
             |SELECT source, n_tokens, d_obs, f1, f2,
             |  CAST(floor((CAST(d_obs AS DOUBLE)
             |    + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - 1.0)
             |      / (2.0 * (CAST(f2 AS DOUBLE) + 1.0)))
             |    * 1000 + 0.5) AS BIGINT) AS chao1_milli
             |FROM agg ORDER BY source""".stripMargin))
  )

  /** DuckDB replay of [[graft.operators.Bpe.train]] — the q127
    * oracle. The full merge recurrence unrolls: w0 is the
    * word-frequency dict seeded as char symbols + '</w>'; each round
    * computes weighted adjacent-pair counts (overlapping, 1-based
    * `syms[k], syms[k+1]`), picks the argmax under the Scala
    * ordering (-count, a, b) — ASCII corpus, so VARCHAR byte order ≡
    * Scala string order — and re-segments every word with a
    * list_reduce fold over singleton-wrapped symbols (provably ≡
    * the greedy non-overlapping applyMerge: a||b ≠ a for nonempty b,
    * so a freshly merged symbol can never immediately re-merge).
    * Every CTE is MATERIALIZED: each round's state feeds both the
    * pair count and the re-encode, and un-materialized inlining
    * doubles the tree per round (2^30 by the end).
    *
    * minPairCount is mirrored as a FINAL filter, which is exact
    * while every trained round clears the threshold (true for this
    * corpus at the sf0.01 gate). A corpus where some mid-training
    * round dropped below it would diverge LOUDLY (hash mismatch) —
    * the Scala trainer stops, the SQL would keep merging — never
    * silently.
    */
  private def bpeMergesOracleSql(numMerges: Int, minPairCount: Long): String = {
    val sel = (0 until numMerges).map(i =>
      s"""SELECT $i AS rank, a AS "left", b AS "right", c AS pair_count FROM best$i""")
      .mkString(" UNION ALL ")
    s"""WITH ${bpeTrainCtes(numMerges)}
       |SELECT * FROM ($sel)
       |WHERE pair_count >= $minPairCount ORDER BY rank""".stripMargin
  }

  /** The shared 30-round training CTE chain behind [[bpeMergesOracleSql]]
    * (q127 reads the best$i rows) and the q138 oracle (which reads the
    * FINAL w$numMerges dictionary — the word column rides the whole
    * chain so the encode oracle can join subword counts back to docs).
    */
  private def bpeTrainCtes(numMerges: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT w, string_split(w, '') || ['</w>'] AS syms,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM (SELECT unnest(list_filter(
        |          string_split_regex(trim(COALESCE(text, '')), '\s+'),
        |          x -> length(x) > 0)) AS w
        |        FROM documents)
        |  GROUP BY w)""".stripMargin
    val rounds = (0 until numMerges).map { i =>
      s"""best$i AS MATERIALIZED (
         |  SELECT a, b, CAST(SUM(n) AS BIGINT) AS c FROM (
         |    SELECT syms[k] AS a, syms[k+1] AS b, n
         |    FROM (SELECT syms, n, unnest(range(1, len(syms))) AS k FROM w$i))
         |  GROUP BY a, b ORDER BY c DESC, a, b LIMIT 1),
         |w${i + 1} AS MATERIALIZED (
         |  SELECT w.w,
         |         list_reduce(
         |           list_transform(w.syms, s -> [s]),
         |           (acc, x) -> CASE WHEN acc[len(acc)] = bb.a AND x[1] = bb.b
         |                            THEN acc[1:len(acc)-1] || [bb.a || bb.b]
         |                            ELSE acc || x END) AS syms,
         |         w.n
         |  FROM w$i w, best$i bb)""".stripMargin
    }
    (w0 +: rounds).mkString(",\n")
  }
}
