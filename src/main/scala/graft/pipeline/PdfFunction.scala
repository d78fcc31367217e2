package graft.pipeline

/** PDF functions (PDF 32000-1 §7.10) — the tint-transform subset
  * `/Separation` and `/DeviceN` colorspaces carry (reference corpus:
  * wild web-fetched PDFs, `01-download-pdfs.py:105-112`, whose spot-
  * color scans previously stranded as `opaque`): ONE input variable,
  * `m` outputs, function types
  *
  *  - **2** (exponential interpolation, §7.10.3):
  *    `y_j = C0_j + x^N · (C1_j − C0_j)`;
  *  - **0** (sampled, §7.10.2): a stream of packed samples with
  *    linear interpolation between the two nearest, under the
  *    `/Encode` input map and `/Decode` output map;
  *  - **3** (stitching, §7.10.4): `/Bounds` pick a subfunction,
  *    `/Encode` maps the subdomain onto its domain.
  *
  * Type 4 (PostScript calculator) and multi-input functions are out
  * of subset — [[parse]] returns None and the caller declines to
  * `opaque`, never wrong pixels. Every evaluation step is plain
  * `+ − × ÷` IEEE double arithmetic in a FIXED order (the §7.10.5.2
  * interpolation formula, written exactly once), so a fixture's
  * bytes replay bit-for-bit in SQL (the q361 oracle) — same policy
  * as [[PdfImages.labToRgb]].
  */
object PdfFunction {
  import PdfTextPartitioner.PdfObj

  /** §7.10.5.2: Interpolate(x, xmin, xmax, ymin, ymax) — THE one
    * linear-map expression; parsers and the SQL oracle mirror it
    * term-for-term (a re-association changes the double rounding). */
  private def interp(x: Double, xmin: Double, xmax: Double,
      ymin: Double, ymax: Double): Double =
    ymin + (x - xmin) * (ymax - ymin) / (xmax - xmin)

  private def clamp(v: Double, lo: Double, hi: Double): Double =
    if (v < lo) lo else if (v > hi) hi else v

  /** One parsed 1-in / m-out function. `apply` clamps the input to
    * the domain and the outputs to `/Range` when present. */
  sealed trait Fn {
    def d0: Double
    def d1: Double
    def nOut: Int
    protected def evalIn(x: Double): Array[Double]
    def range: Option[Array[Double]]
    final def apply(x0: Double): Array[Double] = {
      val y = evalIn(clamp(x0, d0, d1))
      range match {
        case Some(r) =>
          var j = 0
          while (j < y.length) {
            y(j) = clamp(y(j), r(2 * j), r(2 * j + 1))
            j += 1
          }
          y
        case None => y
      }
    }
  }

  /** Type 2: `y_j = C0_j + x^N (C1_j − C0_j)`. Integer N ∈ [1, 4]
    * evaluates as repeated multiplication (exact, SQL-replayable);
    * other exponents through `math.pow` (decoder-side only — no
    * fixture uses them, `pow` has no cross-engine bit guarantee). */
  private final case class Exponential(
      d0: Double, d1: Double, c0: Array[Double], c1: Array[Double],
      n: Double, range: Option[Array[Double]]) extends Fn {
    def nOut: Int = c0.length
    protected def evalIn(x: Double): Array[Double] = {
      val xn =
        if (n == 1.0) x
        else if (n == 2.0) x * x
        else if (n == 3.0) x * x * x
        else if (n == 4.0) (x * x) * (x * x)
        else math.pow(x, n)
      Array.tabulate(c0.length)(j => c0(j) + xn * (c1(j) - c0(j)))
    }
  }

  /** Type 0: `size` samples of `nOut` components, 8- or 16-bit
    * big-endian, linearly interpolated. `e = Interpolate(x, d0, d1,
    * e0, e1)` clamped to [0, size−1]; `k = min(⌊e⌋, size−2)`;
    * `r_j = s[k]_j + (e − k) · (s[k+1]_j − s[k]_j)`; decode
    * `Interpolate(r, 0, 2^bps−1, dec_2j, dec_2j+1)`. */
  private final case class Sampled(
      d0: Double, d1: Double, size: Int, bps: Int,
      e0: Double, e1: Double, dec: Array[Double],
      samples: Array[Int], nOut: Int,
      range: Option[Array[Double]]) extends Fn {
    protected def evalIn(x: Double): Array[Double] = {
      val e = clamp(interp(x, d0, d1, e0, e1), 0.0, (size - 1).toDouble)
      val k = math.min(e.toInt, math.max(size - 2, 0))
      val frac = e - k
      val maxS = ((1L << bps) - 1).toDouble
      Array.tabulate(nOut) { j =>
        val s0 = samples(k * nOut + j).toDouble
        val s1 =
          if (size == 1) s0 else samples((k + 1) * nOut + j).toDouble
        val r = s0 + frac * (s1 - s0)
        interp(r, 0.0, maxS, dec(2 * j), dec(2 * j + 1))
      }
    }
  }

  /** Type 3: subdomain `k` per `/Bounds`, input re-encoded onto the
    * subfunction (§7.10.4: low edge inclusive; the last subdomain
    * includes the domain's high edge). */
  private final case class Stitching(
      d0: Double, d1: Double, bounds: Array[Double],
      enc: Array[Double], fns: IndexedSeq[Fn],
      range: Option[Array[Double]]) extends Fn {
    def nOut: Int = fns.head.nOut
    protected def evalIn(x: Double): Array[Double] = {
      var k = 0
      while (k < bounds.length && x >= bounds(k)) k += 1
      val lo = if (k == 0) d0 else bounds(k - 1)
      val hi = if (k == bounds.length) d1 else bounds(k)
      fns(k)(interp(x, lo, hi, enc(2 * k), enc(2 * k + 1)))
    }
  }

  private val numTok = """-?\d+(?:\.\d+)?""".r
  private def arr(dict: String, key: String): Option[Array[Double]] =
    (s"""/$key\\s*\\[([^\\]\\[]*)\\]""").r.findFirstMatchIn(dict)
      .map(m => numTok.findAllIn(m.group(1)).map(_.toDouble).toArray)
  private def num(dict: String, key: String): Option[Double] =
    (s"""/$key\\s+(-?\\d+(?:\\.\\d+)?)""").r.findFirstMatchIn(dict)
      .map(_.group(1).toDouble)
  private val fnRefs = """(\d{1,9})\s+\d+\s+R""".r

  /** Parse the function OBJECT `obj` (a dict for types 2/3, a stream
    * for type 0). None on type 4, multi-input domains, malformed
    * entries, or out-of-subset depths — the caller declines. */
  def parse(obj: PdfObj,
      objs: Map[Int, (Int, PdfObj)], depth: Int = 0): Option[Fn] = {
    if (depth > 2) return None                // stitching self-reference guard
    val dict = obj.dict
    val ft = num(dict, "FunctionType").map(_.toInt).getOrElse(return None)
    val dom = arr(dict, "Domain").getOrElse(return None)
    if (dom.length != 2 || !(dom(0) < dom(1))) return None  // 1-in only
    val range = arr(dict, "Range").filter(r =>
      r.length >= 2 && r.length % 2 == 0 &&
        r.grouped(2).forall(p => p(0) <= p(1)))
    ft match {
      case 2 =>
        val c0 = arr(dict, "C0").getOrElse(Array(0.0))
        val c1 = arr(dict, "C1").getOrElse(Array(1.0))
        val n = num(dict, "N").getOrElse(return None)
        if (c0.length != c1.length || c0.isEmpty || c0.length > 8) None
        else if (n <= 0) None
        else Some(Exponential(dom(0), dom(1), c0, c1, n, range))
      case 0 =>
        val rng = range.getOrElse(return None) // Range REQUIRED for type 0
        val nOut = rng.length / 2
        val size = arr(dict, "Size")
          .filter(s => s.length == 1 && s(0) >= 1 && s(0) <= 65536)
          .map(_(0).toInt).getOrElse(return None)
        val bps = num(dict, "BitsPerSample").map(_.toInt).getOrElse(return None)
        if (bps != 8 && bps != 16) return None // sub-byte/24/32: out of subset
        val enc = arr(dict, "Encode")
          .getOrElse(Array(0.0, (size - 1).toDouble))
        if (enc.length != 2) return None
        val dec = arr(dict, "Decode").getOrElse(rng)
        if (dec.length != nOut * 2) return None
        val bytes = obj.data.getOrElse(return None)
        val need = size.toLong * nOut * (bps / 8)
        if (nOut < 1 || nOut > 8 || bytes.length < need) return None
        val samples = new Array[Int](size * nOut)
        var i = 0
        while (i < samples.length) {
          samples(i) =
            if (bps == 8) bytes(i) & 0xff
            else ((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)
          i += 1
        }
        Some(Sampled(dom(0), dom(1), size, bps, enc(0), enc(1), dec,
          samples, nOut, range))
      case 3 =>
        val refs = (s"""/Functions\\s*\\[([^\\]]*)\\]""").r
          .findFirstMatchIn(dict).map(_.group(1)).getOrElse(return None)
        val subs = fnRefs.findAllMatchIn(refs).map(_.group(1).toInt).toVector
        if (subs.isEmpty || subs.size > 8) return None
        val fns = subs.map(n =>
          objs.get(n).flatMap(e => parse(e._2, objs, depth + 1))
            .getOrElse(return None))
        if (fns.map(_.nOut).distinct.size != 1) return None
        val bounds = arr(dict, "Bounds").getOrElse(Array.empty[Double])
        if (bounds.length != subs.size - 1) return None
        if (!bounds.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)))
          return None
        if (bounds.exists(b => b < dom(0) || b > dom(1))) return None
        val enc = arr(dict, "Encode").getOrElse(return None)
        if (enc.length != subs.size * 2) return None
        Some(Stitching(dom(0), dom(1), bounds, enc, fns, range))
      case _ => None                          // type 4 et al.: out of subset
    }
  }
}
