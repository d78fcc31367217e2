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

  /** One parsed n-in / m-out function (types 0/2/3 are 1-in; the
    * type-4 calculator takes `/Domain`-many inputs). `apply` clamps
    * each input to its domain pair and the outputs to `/Range` when
    * present; null = evaluation failure (calculator stack fault) —
    * the caller declines to opaque, never wrong pixels. */
  sealed trait Fn {
    def domain: Array[Double]                 // 2·nIn pairs
    final def nIn: Int = domain.length / 2
    final def d0: Double = domain(0)
    final def d1: Double = domain(1)
    def nOut: Int
    protected def evalIn(xs: Array[Double]): Array[Double]
    def range: Option[Array[Double]]
    final def apply(x0: Double): Array[Double] = apply(Array(x0))
    final def apply(xs: Array[Double]): Array[Double] = {
      if (xs.length != nIn) return null
      val c = new Array[Double](nIn)
      var i = 0
      while (i < nIn) {
        c(i) = clamp(xs(i), domain(2 * i), domain(2 * i + 1))
        i += 1
      }
      val y = evalIn(c)
      if (y == null) return null
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
      domain: Array[Double], c0: Array[Double], c1: Array[Double],
      n: Double, range: Option[Array[Double]]) extends Fn {
    def nOut: Int = c0.length
    protected def evalIn(xs: Array[Double]): Array[Double] = {
      val x = xs(0)
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
      domain: Array[Double], size: Int, bps: Int,
      e0: Double, e1: Double, dec: Array[Double],
      samples: Array[Int], nOut: Int,
      range: Option[Array[Double]]) extends Fn {
    protected def evalIn(xs: Array[Double]): Array[Double] = {
      val x = xs(0)
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
      domain: Array[Double], bounds: Array[Double],
      enc: Array[Double], fns: IndexedSeq[Fn],
      range: Option[Array[Double]]) extends Fn {
    def nOut: Int = fns.head.nOut
    protected def evalIn(xs: Array[Double]): Array[Double] = {
      val x = xs(0)
      var k = 0
      while (k < bounds.length && x >= bounds(k)) k += 1
      val lo = if (k == 0) d0 else bounds(k - 1)
      val hi = if (k == bounds.length) d1 else bounds(k)
      fns(k)(interp(x, lo, hi, enc(2 * k), enc(2 * k + 1)))
    }
  }

  // ---- type 4: PostScript calculator (§7.10.5) — n inputs pushed in
  // order, the program runs on a double-valued operand stack
  // (booleans as 1/0), and the outputs are the stack's bottom-to-top
  // remainder truncated to /Range's arity. Inline `{}` procedures
  // attach to the following `if`/`ifelse`. Faults (underflow, step
  // cap, unknown operator, wrong leftover arity) return null — the
  // image declines to opaque.

  private sealed trait Tok
  private final case class Num(v: Double) extends Tok
  private final case class Op(name: String) extends Tok
  private final case class Block(body: Vector[Tok]) extends Tok
  private final case class IfTok(proc: Vector[Tok]) extends Tok
  private final case class IfElseTok(a: Vector[Tok], b: Vector[Tok]) extends Tok

  private final case class Calculator(
      domain: Array[Double], prog: Vector[Tok], nOut: Int,
      range: Option[Array[Double]]) extends Fn {
    protected def evalIn(xs: Array[Double]): Array[Double] = {
      val st = new Array[Double](100)
      var sp = 0
      var steps = 0
      def push(v: Double): Boolean =
        if (sp >= st.length) false else { st(sp) = v; sp += 1; true }
      def run(toks: Vector[Tok]): Boolean = {
        var i = 0
        while (i < toks.size) {
          steps += 1
          if (steps > 100000) return false
          toks(i) match {
            case Num(v) => if (!push(v)) return false
            case Block(_) => return false      // orphan procedure
            case IfTok(proc) =>
              if (sp < 1) return false
              sp -= 1
              if (st(sp) != 0.0 && !run(proc)) return false
            case IfElseTok(a, b) =>
              if (sp < 1) return false
              sp -= 1
              if (!run(if (st(sp) != 0.0) a else b)) return false
            case Op(name) => if (!op(name)) return false
          }
          i += 1
        }
        true
      }
      def bool(b: Boolean): Double = if (b) 1.0 else 0.0
      def op(name: String): Boolean = {
        def un(f: Double => Double): Boolean = {
          if (sp < 1) return false
          st(sp - 1) = f(st(sp - 1)); true
        }
        def bin(f: (Double, Double) => Double): Boolean = {
          if (sp < 2) return false
          st(sp - 2) = f(st(sp - 2), st(sp - 1)); sp -= 1; true
        }
        name match {
          case "add" => bin(_ + _)
          case "sub" => bin(_ - _)
          case "mul" => bin(_ * _)
          case "div" => bin(_ / _)
          case "idiv" => bin((a, b) =>
            if (b.toInt == 0) return false else (a.toInt / b.toInt).toDouble)
          case "mod" => bin((a, b) =>
            if (b.toInt == 0) return false else (a.toInt % b.toInt).toDouble)
          case "neg" => un(-_)
          case "abs" => un(math.abs)
          case "sqrt" => un(math.sqrt)
          case "sin" => un(v => math.sin(math.toRadians(v)))
          case "cos" => un(v => math.cos(math.toRadians(v)))
          case "atan" => bin((num, den) => {
            val d = math.toDegrees(math.atan2(num, den))
            if (d < 0) d + 360.0 else d
          })
          case "exp" => bin(math.pow)
          case "ln" => un(math.log)
          case "log" => un(math.log10)
          case "ceiling" => un(math.ceil)
          case "floor" => un(math.floor)
          case "round" => un(v => math.rint(v))
          case "truncate" => un(v => v.toLong.toDouble)
          case "cvi" => un(v => v.toInt.toDouble)
          case "cvr" => un(identity)
          case "dup" =>
            if (sp < 1) return false
            push(st(sp - 1))
          case "pop" =>
            if (sp < 1) return false
            sp -= 1; true
          case "exch" =>
            if (sp < 2) return false
            val t = st(sp - 1); st(sp - 1) = st(sp - 2); st(sp - 2) = t; true
          case "copy" =>
            if (sp < 1) return false
            sp -= 1
            val n = st(sp).toInt
            if (n < 0 || sp < n || sp + n > st.length) return false
            var k = 0
            while (k < n) { st(sp + k) = st(sp - n + k); k += 1 }
            sp += n; true
          case "index" =>
            if (sp < 1) return false
            sp -= 1
            val n = st(sp).toInt
            if (n < 0 || sp < n + 1) return false
            push(st(sp - 1 - n))
          case "roll" =>
            if (sp < 2) return false
            val j0 = st(sp - 1).toInt
            val n = st(sp - 2).toInt
            sp -= 2
            if (n < 0 || sp < n) return false
            if (n > 0) {
              val j = ((j0 % n) + n) % n
              val tmp = new Array[Double](n)
              var k = 0
              while (k < n) { tmp((k + j) % n) = st(sp - n + k); k += 1 }
              k = 0
              while (k < n) { st(sp - n + k) = tmp(k); k += 1 }
            }
            true
          case "eq" => bin((a, b) => bool(a == b))
          case "ne" => bin((a, b) => bool(a != b))
          case "gt" => bin((a, b) => bool(a > b))
          case "ge" => bin((a, b) => bool(a >= b))
          case "lt" => bin((a, b) => bool(a < b))
          case "le" => bin((a, b) => bool(a <= b))
          case "and" => bin((a, b) => (a.toLong & b.toLong).toDouble)
          case "or" => bin((a, b) => (a.toLong | b.toLong).toDouble)
          case "xor" => bin((a, b) => (a.toLong ^ b.toLong).toDouble)
          case "not" => un(v =>
            if (v == 0.0) 1.0 else if (v == 1.0) 0.0 else (~v.toLong).toDouble)
          case "bitshift" => bin((a, s) => {
            val sh = s.toInt
            if (sh >= 0) (a.toLong << math.min(sh, 63)).toDouble
            else (a.toLong >> math.min(-sh, 63)).toDouble
          })
          case "true" => push(1.0)
          case "false" => push(0.0)
          case _ => false
        }
      }
      var i = 0
      while (i < xs.length) { if (!push(xs(i))) return null; i += 1 }
      if (!run(prog)) return null
      if (sp < nOut) return null
      // outputs are the TOP nOut values, bottom of that group first
      val out = new Array[Double](nOut)
      var j = 0
      while (j < nOut) { out(j) = st(sp - nOut + j); j += 1 }
      out
    }
  }

  /** Tokenize a calculator program body and bind `{}` procedures to
    * their `if`/`ifelse`. None on unbalanced braces, junk tokens, or
    * an orphan procedure. */
  private def parseCalc(src: String): Option[Vector[Tok]] = {
    val raw = """\{|\}|[^\s{}]+""".r.findAllIn(src).toVector
    var pos = 0
    def block(): Option[Vector[Tok]] = {
      val out = Vector.newBuilder[Tok]
      val pending = scala.collection.mutable.ArrayBuffer.empty[Vector[Tok]]
      def flushOrphans(): Boolean = pending.isEmpty
      while (pos < raw.size && raw(pos) != "}") {
        raw(pos) match {
          case "{" =>
            pos += 1
            block() match {
              case None => return None
              case Some(b) =>
                if (pos >= raw.size || raw(pos) != "}") return None
                pos += 1
                pending += b
            }
          case "if" =>
            if (pending.size != 1) return None
            out += IfTok(pending.remove(0))
            pos += 1
          case "ifelse" =>
            if (pending.size != 2) return None
            val b2 = pending.remove(1); val b1 = pending.remove(0)
            out += IfElseTok(b1, b2)
            pos += 1
          case tok =>
            if (!flushOrphans()) return None   // block not consumed
            tok.toDoubleOption match {
              case Some(v) => out += Num(v)
              case None =>
                if (!CalcOps.contains(tok)) return None
                out += Op(tok)
            }
            pos += 1
        }
      }
      if (!flushOrphans()) return None
      Some(out.result())
    }
    // the body itself is one outer { ... }
    if (raw.isEmpty || raw.head != "{") return None
    pos = 1
    val b = block()
    b.filter(_ => pos < raw.size && raw(pos) == "}" && {
      pos += 1; pos == raw.size
    })
  }

  private val CalcOps: Set[String] = Set(
    "add", "sub", "mul", "div", "idiv", "mod", "neg", "abs", "sqrt",
    "sin", "cos", "atan", "exp", "ln", "log", "ceiling", "floor",
    "round", "truncate", "cvi", "cvr", "dup", "pop", "exch", "copy",
    "index", "roll", "eq", "ne", "gt", "ge", "lt", "le", "and", "or",
    "xor", "not", "bitshift", "true", "false")

  // PDF reals may omit the integer part (".5", "-.5" — §7.3.3); a
  // digits-only pattern would read "/C1 [.5]" as 5.0 and emit WRONG
  // raw pixels instead of either right ones or a decline
  private val numTok = """-?(?:\d+(?:\.\d+)?|\.\d+)""".r
  private def arr(dict: String, key: String): Option[Array[Double]] =
    (s"""/$key\\s*\\[([^\\]\\[]*)\\]""").r.findFirstMatchIn(dict)
      .map(m => numTok.findAllIn(m.group(1)).map(_.toDouble).toArray)
  private def num(dict: String, key: String): Option[Double] =
    (s"""/$key\\s+(-?(?:\\d+(?:\\.\\d+)?|\\.\\d+))""").r.findFirstMatchIn(dict)
      .map(_.group(1).toDouble)
  private val fnRefs = """(\d{1,9})\s+\d+\s+R""".r

  /** Parse the function OBJECT `obj` (a dict for types 2/3, a stream
    * for types 0/4). None on malformed entries or out-of-subset
    * shapes — the caller declines. Types 0/2/3 are 1-in; type 4
    * takes as many inputs as `/Domain` declares (≤ 8). */
  def parse(obj: PdfObj,
      objs: Map[Int, (Int, PdfObj)], depth: Int = 0): Option[Fn] = {
    if (depth > 2) return None                // stitching self-reference guard
    val dict = obj.dict
    val ft = num(dict, "FunctionType").map(_.toInt).getOrElse(return None)
    val dom = arr(dict, "Domain").getOrElse(return None)
    val maxDom = if (ft == 4) 16 else 2       // 1-in except the calculator
    if (dom.length < 2 || dom.length > maxDom || dom.length % 2 != 0 ||
      !dom.grouped(2).forall(p => p(0) < p(1))) return None
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
        else Some(Exponential(dom, c0, c1, n, range))
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
        Some(Sampled(dom, size, bps, enc(0), enc(1), dec,
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
        if (!bounds.sliding(2).forall(p => p.length < 2 || p(0) < p(1)))
          return None
        // §7.10.4 requires STRICT Domain0 < Bounds… < Domain1: a
        // bound touching a domain edge makes a zero-width subdomain
        // whose encode interpolation divides by zero (NaN → byte 0 —
        // wrong pixels, review finding)
        if (bounds.exists(b => b <= dom(0) || b >= dom(1))) return None
        val enc = arr(dict, "Encode").getOrElse(return None)
        if (enc.length != subs.size * 2) return None
        Some(Stitching(dom, bounds, enc, fns, range))
      case 4 =>
        val rng = range.getOrElse(return None) // Range REQUIRED for type 4
        val src = obj.data.map(b =>
          new String(b, java.nio.charset.StandardCharsets.ISO_8859_1))
          .getOrElse(return None)
        if (src.length > 65536) return None
        parseCalc(src).map(prog =>
          Calculator(dom, prog, rng.length / 2, Some(rng)))
      case _ => None
    }
  }
}
