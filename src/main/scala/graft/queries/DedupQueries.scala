package graft.queries

import graft.{QueryDef, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Deduplication / similarity-join operator family as driver-checkable
  * queries. Exact + similarity-join variants carry DuckDB oracles;
  * MinHash/SimHash pair generation depends on seeded Murmur hashing
  * (not SQL-expressible) → rows-only checks + ScalaTest specs with
  * planted near-duplicates.
  */
object DedupQueries {

  def defs: Seq[QueryDef] = Seq(
    // ----- q21: exact dedup groups (hash groupBy — one digest-keyed shuffle)
    QueryDef(
      "q21_dedup_exact",
      (s, d) => {
        import s.implicits._
        Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
          .orderBy($"content_hash")
      },
      Some("""SELECT md5(text) AS content_hash,
             |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
             |FROM documents
             |GROUP BY md5(text)
             |ORDER BY content_hash""".stripMargin)),

    // ----- q22: fingerprint dedup survivors (normalized-content md5)
    QueryDef(
      "q22_fingerprint_dedup",
      (s, d) => {
        import s.implicits._
        Dedup.fingerprintDedup(Tables.documents(s, d), "doc_id", "text")
          .select($"doc_id", $"lang", $"n_chars")
          .orderBy($"doc_id")
      },
      Some("""SELECT doc_id, lang, n_chars
             |FROM documents
             |WHERE doc_id IN (
             |  SELECT MIN(doc_id) FROM documents
             |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
             |ORDER BY doc_id""".stripMargin)),

    // ----- q26: word-set Jaccard similarity join (blocked self-join;
    // array_intersect stays in Catalyst)
    QueryDef(
      "q26_jaccard_join",
      (s, d) => {
        import s.implicits._
        Dedup.jaccardPairs(Tables.documents(s, d), "doc_id", "text",
            blockCol = "lang", sizeCol = "n_chars", sizeBand = 30, threshold = 0.8)
          .orderBy($"id_a", $"id_b")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, n_chars,
             |    list_distinct(list_filter(string_split_regex(trim(text), '\s+'),
             |                              x -> length(x) > 0)) AS toks
             |  FROM documents)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  round(len(list_intersect(a.toks, b.toks)) * 1.0 /
             |        (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 4) AS jaccard
             |FROM t a JOIN t b
             |  ON a.lang = b.lang AND a.doc_id < b.doc_id
             |  AND abs(a.n_chars - b.n_chars) <= 30
             |WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
             |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) > 0.8
             |ORDER BY id_a, id_b""".stripMargin)),

    // ----- q27: embedding-cosine near-dup pairs (label-blocked self-join)
    QueryDef(
      "q27_embedding_neardup",
      (s, d) => {
        import s.implicits._
        Dedup.cosinePairs(Tables.embeddings(s, d), "vec_id", "embedding",
            blockCol = "label", threshold = 0.4)
          .orderBy($"id_a", $"id_b")
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos
             |FROM embeddings a JOIN embeddings b
             |  ON a.label = b.label AND a.vec_id < b.vec_id
             |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
             |                             CAST(b.embedding AS DOUBLE[])) > 0.4
             |ORDER BY id_a, id_b""".stripMargin)),

    // ----- q28: MinHash-LSH near-dup candidates (banded signatures;
    // seeded Murmur → rows-only, semantics spec-tested)
    QueryDef(
      "q28_minhash_pairs",
      (s, d) => {
        import s.implicits._
        Dedup.minhashPairs(s, Tables.documents(s, d), "doc_id", "text",
            bands = 16, threshold = 0.7)
          .orderBy($"id_a", $"id_b")
      },
      None),

    // ----- q37: LSH similarity JOIN over embeddings (D3) — bucket-
    // cohabitation candidates + exact-cosine verify; no blocking
    // column needed, works on unlabeled corpora (rows-only: seeded
    // hyperplanes; pair recall vs brute force is spec-tested)
    QueryDef(
      "q37_lsh_similarity_join",
      (s, d) => {
        import s.implicits._
        import graft.operators.AnnSearch
        val lsh = AnnSearch.HyperplaneLsh(dim = 64, nBits = 10, seed = 2)
        AnnSearch.lshJoin(s, Tables.embeddings(s, d), "vec_id", "embedding",
            lsh, threshold = 0.4, nFlip = 6)
          .orderBy($"id_a", $"id_b")
      },
      None),

    // ----- q29: SimHash near-dup pairs (pigeonhole-blocked; rows-only)
    QueryDef(
      "q29_simhash_pairs",
      (s, d) => {
        import s.implicits._
        Dedup.simhashPairs(s, Tables.documents(s, d), "doc_id", "text",
            maxDistance = 3)
          .orderBy($"id_a", $"id_b")
      },
      None)
  )
}
