package graft.functions

/** The engine's SQL-replayable string hash: the mod-(2^61−1)
  * polynomial h = fold(h·B + charCode) the Winnow oracle replays in
  * DuckDB HUGEINT arithmetic (`list_reduce(codes, (h, c) ->
  * (h * 1000003 + c) % 2305843009213693951)`). Shared by every
  * replay-twin operator (PolySimHasher q154, PolyHashingEmbedder
  * q157) so one spec-pinned implementation backs them all.
  *
  * charAt is a UTF-16 code unit where SQL's unicode() is a code
  * point — identical on ASCII text, the corpus-wide caveat the
  * winnow oracle documents.
  */
object PolyHash {
  val P = 2305843009213693951L // 2^61 − 1 (Mersenne)
  val B = 1000003L

  def featureHash(f: String): Long = {
    var h = 0L
    var i = 0
    while (i < f.length) {
      h = mulMod(h, B) + f.charAt(i) // < 2^61 + 2^16
      if (h >= P) h -= P
      i += 1
    }
    h
  }

  /** (a·b) mod (2^61−1) exactly, for 0 ≤ a, b < 2^61: the full
    * 128-bit product via Math.multiplyHigh (both operands
    * nonnegative, so the signed high word is the unsigned one),
    * then the Mersenne fold 2^61 ≡ 1 — quotient-plus-remainder,
    * conditionally corrected.
    */
  def mulMod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b) // < 2^58
    val lo = a * b // low 64 bits
    var s = ((hi << 3) | (lo >>> 61)) + (lo & P) // q + r, < 2^62
    if (s >= P) s -= P
    if (s >= P) s -= P
    s
  }
}
