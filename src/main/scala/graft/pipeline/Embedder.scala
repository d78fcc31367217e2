package graft.pipeline

import scala.util.hashing.MurmurHash3

/** Text → fixed-dim embedding, the engine-side analogue of the
  * reference's model-serving endpoint
  * (`03-model-inference-on-chunks.py:55-60,96-109` — the reference's
  * hosted-endpoint name; see SURVEY §2.11 U9). Behind a trait so the
  * deterministic
  * local implementation used by tests/oracles and a real remote
  * endpoint client are drop-in replacements (SURVEY.md §7.1).
  *
  * Implementations must be pure (same text ⇒ same vector) and
  * Serializable — instances are constructed per partition inside
  * `mapPartitions` (the batch-amortized-init pattern the reference's
  * Iterator-style pandas_udf exists for,
  * `03-model-inference-on-chunks.py:70-83`).
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one batch. Batch size is controlled by the caller
    * (`Inference.embedChunks` groups to ≤150, the reference's
    * endpoint cap at `03-model-inference-on-chunks.py:102-104`).
    */
  def embed(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic feature-hashing embedder: unigram + bigram token
  * features hashed into `dim` signed buckets (hashing trick), then
  * L2-normalized. Seeded MurmurHash3 — identical output on every JVM,
  * executor, and retry, which is what makes embedding-dependent
  * queries reproducible offline (no live endpoint at test time).
  */
final case class HashingEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {
  require(dim > 0)

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)

  def embedOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      var i = 0
      while (i < toks.length) {
        add(v, toks(i))
        if (i + 1 < toks.length) add(v, toks(i) + " " + toks(i + 1))
        i += 1
      }
    }
    val norm = math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x)).toFloat
    if (norm > 0) { var j = 0; while (j < dim) { v(j) /= norm; j += 1 } }
    v
  }

  @inline private def add(v: Array[Float], feature: String): Unit = {
    val h = MurmurHash3.stringHash(feature, seed)
    val bucket = math.floorMod(h, dim)
    val sign = if (((h >>> 31) & 1) == 0) 1.0f else -1.0f
    v(bucket) += sign
  }
}

/** Feature-hashing embedder whose every output coordinate a second
  * engine re-derives in plain SQL — the oracle-replay twin of
  * [[HashingEmbedder]] (used by q157 the way PolySimHasher serves
  * q154): features are the same unigram+bigram tokens, hashed with
  * the shared [[graft.functions.PolyHash]] polynomial; bucket = low
  * bits (h mod dim), sign = popcount parity of the REMAINING bits
  * (h >>> log2(dim), so sign and bucket stay decorrelated at every
  * power-of-two dim; the deployed dim = 64 shifts by 6, which is
  * what the q157/q159 oracle SQL replays).
  *
  * Deliberately NOT L2-normalized: the coordinates stay small signed
  * integer counts, exactly representable as floats, so any
  * double-precision cosine over them — Spark's codegen cosine or
  * DuckDB's list_cosine_similarity — sums exact integer products and
  * rounds only at the final divide: bit-identical cross-engine, no
  * float-division double-rounding anywhere. Cosine is scale-
  * invariant, so similarity semantics match the normalized embedder.
  */
final case class PolyHashingEmbedder(dim: Int = 64) extends Embedder {
  require(dim > 0 && (dim & (dim - 1)) == 0, "dim must be a power of two")
  // the sign reads the bits ABOVE the bucket's low log2(dim) bits, so
  // sign and bucket stay decorrelated for ANY power-of-two dim (a
  // fixed 6-bit shift would overlap the bucket bits past dim = 64)
  private val signShift = Integer.numberOfTrailingZeros(dim)

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(embedOne)

  def embedOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text != null) {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      var i = 0
      while (i < toks.length) {
        add(v, toks(i))
        if (i + 1 < toks.length) add(v, toks(i) + " " + toks(i + 1))
        i += 1
      }
    }
    v
  }

  @inline private def add(v: Array[Float], feature: String): Unit = {
    val h = graft.functions.PolyHash.featureHash(feature)
    val bucket = (h % dim).toInt
    val sign =
      if ((java.lang.Long.bitCount(h >>> signShift) & 1) == 0) 1.0f else -1.0f
    v(bucket) += sign
  }
}

/** Production endpoint client over `java.net.http` + the Jackson that
  * ships with Spark (no added dependency) — the embed-side counterpart
  * of [[HttpFetcher]], mirroring the reference's model-serving call
  * (`03-model-inference-on-chunks.py:96-109`, POST
  * `{"input": [texts...]}` → `{"data": [{"embedding": [...]}, ...]}`,
  * the serving protocol of the reference's hosted embedding endpoint;
  * see SURVEY §2.11 U9).
  *
  * Failure contract (the U1/U2 null discipline): a failed REQUEST —
  * timeout, non-200, malformed/mis-sized response — yields a null
  * vector per affected text, never a throw that would kill the task
  * over one bad batch; rows stay aligned with inputs. Batches larger
  * than `batchCap` are re-split defensively (the endpoint rejects
  * >150, ref `:102-104`), though `Inference.embedChunks` already
  * groups upstream.
  *
  * One client per embedder instance per executor (`@transient lazy`,
  * rebuilt after deserialization) — the per-worker session the
  * reference gets from module scope.
  */
final case class HttpEmbedder(
    endpoint: String,
    dim: Int = 64,
    batchCap: Int = 150,
    connectTimeoutMs: Long = 10000,
    requestTimeoutMs: Long = 60000) extends Embedder {
  import java.net.URI
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  require(dim > 0)
  require(batchCap > 0)

  @transient private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(connectTimeoutMs))
    .build()

  @transient private lazy val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def embed(texts: Seq[String]): Seq[Array[Float]] =
    texts.grouped(batchCap).flatMap(embedBatch).toSeq

  private def embedBatch(batch: Seq[String]): Seq[Array[Float]] =
    tryEmbedBatch(batch).getOrElse(Seq.fill(batch.size)(null))

  /** One POST for one ≤batchCap batch; None on any failure. */
  def tryEmbedBatch(batch: Seq[String]): Option[Seq[Array[Float]]] = scala.util.Try {
    val payload = mapper.createObjectNode()
    val arr = payload.putArray("input")
    batch.foreach(t => arr.add(if (t == null) "" else t))
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(requestTimeoutMs))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(mapper.writeValueAsString(payload)))
      .build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) sys.error(s"HTTP ${resp.statusCode()} from $endpoint")
    val data = mapper.readTree(resp.body()).path("data")
    require(data.isArray && data.size() == batch.size,
      s"endpoint returned ${data.size()} embeddings for ${batch.size} inputs")
    (0 until data.size()).map { i =>
      val e = data.get(i).path("embedding")
      require(e.isArray && e.size() == dim,
        s"embedding $i has ${e.size()} dims, expected $dim")
      Array.tabulate(dim)(j => e.get(j).floatValue())
    }
  }.toOption
}
