package graft.pipeline

import java.nio.charset.StandardCharsets

/** PDF standard security handler (public spec: PDF 32000-1 §7.6.3
  * and the 32000-2 V5 revision), the EMPTY-USER-PASSWORD subset —
  * "readable by design" documents that any viewer opens without
  * prompting (most encrypted PDFs in a web corpus are this shape:
  * encryption asserts permissions, not secrecy). Scope: /Filter
  * /Standard, V 1-2 (RC4 40..128 bit, R 2-3), V 4 with the /AESV2
  * (AES-128-CBC, R 4) or /V2 (RC4) crypt filter, and **V 5
  * (AES-256-CBC) with R 5 (plain-SHA-256 derivation) or R 6 (the
  * ISO 32000-2 Algorithm 2.B hardened hash)** — the default of
  * current PDF writers. A V 4/5 file whose `/StmF` is `/Identity`
  * (or absent — Identity is the spec default) stores its STREAMS in
  * plaintext: such a file passes through untranscrypted and the text
  * layer extracts directly. Real passwords and out-of-subset
  * handlers stay classified as `pdf_encrypted` — detected, never
  * misparsed.
  *
  * The decrypt pipeline rewrites stream payloads IN PLACE under their
  * per-object keys (Algorithm 1: MD5(fileKey ‖ objnum₃LE ‖ gen₂LE),
  * ‖ sAlT for AES), producing a byte-identical-layout plaintext PDF
  * that the normal extraction walk
  * ([[PdfTextPartitioner.fontMap]]/`contentStreams`) processes
  * unchanged — no second parser. RC4 preserves lengths exactly; AES
  * plaintext is shorter than its stored IV+ciphertext, so the tail
  * pads with spaces (inflate stops at the deflate terminator, raw
  * streams ignore trailing whitespace). Strings inside dictionaries are
  * also encrypted per spec, but extraction reads none (the /O and /U
  * validators live in the UNencrypted /Encrypt dictionary).
  *
  * All algorithms below are the spec's, implemented from the public
  * document: Algorithm 2 (file key), 3 (/O), 4/5 (/U per revision),
  * 6 (user-password check), 1 (object key). The encrypt side
  * ([[encryptStreams]]) exists for fixtures and is the same spec
  * arithmetic run forward, so fixture and decoder cannot drift apart
  * without a spec divergence showing up in the round trip.
  */
object PdfCrypt {

  /** The spec's 32-byte password padding (§7.6.3.3, Algorithm 2a). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Plain RC4 (KSA + PRGA) — symmetric, length-preserving. */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s(((s(x) & 0xff) + (s(y) & 0xff)) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def padPwd(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  /** /Encrypt parameters of the standard handler (plus the trailer's
    * first /ID element, which salts every V≤4 key). `aes` marks an
    * AES crypt filter (AES-128 /AESV2 at V4, AES-256 /AESV3 at V5);
    * `encryptMetadata` feeds the R4 key-derivation extension;
    * `streamsPlain` marks a V4/V5 file whose `/StmF` resolves to
    * `/Identity` — streams stored in PLAINTEXT (only strings
    * encrypted), so no transcryption may touch them; `ue` is the V5
    * /UE entry (the file key wrapped under the user-password
    * intermediate key); `permsV5` is the V5 /Perms validator. */
  final case class StdSecurity(
      r: Int, v: Int, length: Int,
      o: Array[Byte], u: Array[Byte], p: Int, id0: Array[Byte],
      aes: Boolean = false, encryptMetadata: Boolean = true,
      streamsPlain: Boolean = false,
      ue: Array[Byte] = Array.empty,
      permsV5: Array[Byte] = Array.empty)

  private def keyBytes(sec: StdSecurity): Int =
    if (sec.r == 2) 5 else math.max(5, math.min(16, sec.length / 8))

  /** Algorithm 2: the file encryption key for a given user password
    * (empty here — the subset's whole point). */
  def fileKey(sec: StdSecurity, userPwd: Array[Byte] = Array.empty): Array[Byte] = {
    val n = keyBytes(sec)
    val pLe = Array[Byte](
      (sec.p & 0xff).toByte, ((sec.p >> 8) & 0xff).toByte,
      ((sec.p >> 16) & 0xff).toByte, ((sec.p >> 24) & 0xff).toByte)
    var h =
      if (sec.r >= 4 && !sec.encryptMetadata)
        md5(padPwd(userPwd), sec.o, pLe, sec.id0,
          Array(0xff, 0xff, 0xff, 0xff).map(_.toByte))
      else md5(padPwd(userPwd), sec.o, pLe, sec.id0)
    if (sec.r >= 3) for (_ <- 1 to 50) h = md5(h.take(n))
    h.take(n)
  }

  /** Algorithm 3: the /O entry (owner-password validator). Empty
    * owner password falls back to the user password per spec. */
  def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte],
      r: Int, length: Int): Array[Byte] = {
    val n = if (r == 2) 5 else math.max(5, math.min(16, length / 8))
    val oPwd = if (ownerPwd.nonEmpty) ownerPwd else userPwd
    var h = md5(padPwd(oPwd))
    if (r >= 3) for (_ <- 1 to 50) h = md5(h)
    val rc4key = h.take(n)
    var o = rc4(rc4key, padPwd(userPwd))
    if (r >= 3) for (i <- 1 to 19)
      o = rc4(rc4key.map(b => (b ^ i).toByte), o)
    o
  }

  /** Algorithms 4 (R2) / 5 (R3): the /U entry for a file key. */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var u = rc4(key, md5(Pad, id0))
      for (i <- 1 to 19) u = rc4(key.map(b => (b ^ i).toByte), u)
      u ++ new Array[Byte](16)       // 16 bytes of padding, value-free
    }

  /** Algorithm 6: does the EMPTY user password open this file?
    * V5 revisions validate through the SHA-2 family instead
    * ([[fileKeyV5]]). */
  def emptyUserPasswordWorks(sec: StdSecurity): Boolean =
    if (sec.r >= 5) fileKeyV5(sec).isDefined
    else {
      val expect = computeU(fileKey(sec), sec.id0, sec.r)
      val cmp = if (sec.r == 2) 32 else 16
      sec.u.length >= cmp && java.util.Arrays.equals(
        expect.take(cmp), sec.u.take(cmp))
    }

  // ---- V5 (AES-256) derivation: ISO 32000-2 §7.6.4.3.3/4 ----------

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private def aesCbcNoPad(
      mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Algorithm 2.B (R 6): the hardened SHA-2 hash — at least 64
    * rounds of (repeat input 64×, AES-128-CBC under the running
    * hash's halves, re-hash with SHA-256/384/512 picked by the
    * ciphertext mod 3), ending once round ≥ 64 and the ciphertext's
    * last byte ≤ round − 32. R 5 (the deprecated pre-ISO revision)
    * is the plain SHA-256 of the same input. `udata` is the full
    * 48-byte /U string when hashing an OWNER password, empty for a
    * user password. */
  def hash2B(
      r: Int, pwd: Array[Byte], salt: Array[Byte],
      udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    if (r == 5) return k
    var round = 0
    var done = false
    while (!done) {
      val one = pwd ++ k ++ udata
      val k1 = new Array[Byte](one.length * 64)
      var i = 0
      while (i < 64) {
        System.arraycopy(one, 0, k1, i * one.length, one.length); i += 1
      }
      val e = aesCbcNoPad(javax.crypto.Cipher.ENCRYPT_MODE,
        k.take(16), k.slice(16, 32), k1)
      // first 16 bytes as a big-endian integer mod 3 ≡ byte-sum mod 3
      // (256 ≡ 1 mod 3)
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = sha(mod match {
        case 0 => "SHA-256"; case 1 => "SHA-384"; case _ => "SHA-512"
      }, e)
      round += 1
      if (round >= 64 && (e.last & 0xff) <= round - 32) done = true
    }
    k.take(32)
  }

  /** The V5 file encryption key for the EMPTY user password: validate
    * the password against /U's hash + validation salt (bytes 32..40),
    * then unwrap /UE under the key-salt (bytes 40..48) intermediate
    * key with AES-256-CBC, zero IV. When /Perms is present its
    * decryption must spell the spec's `adb` marker (bytes 9..11) —
    * a wrong-key unwrap fails closed. None ⇒ the file needs a real
    * password (stays `pdf_encrypted`). */
  def fileKeyV5(sec: StdSecurity, userPwd: Array[Byte] = Array.empty): Option[Array[Byte]] = {
    if (sec.u.length < 48 || sec.ue.length < 32) return None
    val pwd = userPwd.take(127)
    val valSalt = sec.u.slice(32, 40)
    val keySalt = sec.u.slice(40, 48)
    if (!java.util.Arrays.equals(
        hash2B(sec.r, pwd, valSalt, Array.empty), sec.u.take(32)))
      return None
    try {
      val ik = hash2B(sec.r, pwd, keySalt, Array.empty)
      val fk = aesCbcNoPad(javax.crypto.Cipher.DECRYPT_MODE,
        ik, new Array[Byte](16), sec.ue.take(32))
      if (sec.permsV5.length >= 16) {
        val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
        c.init(javax.crypto.Cipher.DECRYPT_MODE,
          new javax.crypto.spec.SecretKeySpec(fk, "AES"))
        val p = c.doFinal(sec.permsV5.take(16))
        if (!(p(9) == 'a' && p(10) == 'd' && p(11) == 'b')) return None
      }
      Some(fk)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fixture-side V5 (R 5/6) /U‖/UE‖/O‖/OE‖/Perms entries for a given
    * file key — the same spec arithmetic run forward, with salts
    * derived deterministically from the file key so fixtures are
    * reproducible. Returns (u, ue, o, oe, perms). */
  def computeV5Entries(
      r: Int, fileKey: Array[Byte], p: Int,
      userPwd: Array[Byte] = Array.empty,
      ownerPwd: Array[Byte] = Array.empty): (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    def salt(tag: String): Array[Byte] =
      sha("SHA-256", fileKey, tag.getBytes(StandardCharsets.ISO_8859_1)).take(8)
    val (uv, uk) = (salt("uval"), salt("ukey"))
    val u = hash2B(r, userPwd, uv, Array.empty) ++ uv ++ uk
    val ue = aesCbcNoPad(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(r, userPwd, uk, Array.empty), new Array[Byte](16), fileKey)
    val (ov, ok) = (salt("oval"), salt("okey"))
    val o = hash2B(r, ownerPwd, ov, u) ++ ov ++ ok
    val oe = aesCbcNoPad(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2B(r, ownerPwd, ok, u), new Array[Byte](16), fileKey)
    val permsPlain = Array[Byte](
      (p & 0xff).toByte, ((p >> 8) & 0xff).toByte,
      ((p >> 16) & 0xff).toByte, ((p >> 24) & 0xff).toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      'T', 'a', 'd', 'b') ++ salt("perms").take(4)
    val c = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    (u, ue, o, oe, c.doFinal(permsPlain))
  }

  /** Algorithm 1: the per-object key — AES appends the spec's `sAlT`
    * marker bytes before hashing. */
  def objectKey(fk: Array[Byte], num: Int, gen: Int,
      aes: Boolean = false): Array[Byte] = {
    val ext = Array[Byte](
      (num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
      ((num >> 16) & 0xff).toByte,
      (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
    val salted =
      if (aes) md5(fk, ext, Array('s', 'A', 'l', 'T').map(_.toByte))
      else md5(fk, ext)
    salted.take(math.min(fk.length + 5, 16))
  }

  /** AES-128-CBC stream decrypt (the /AESV2 crypt filter): payload =
    * 16-byte IV ‖ ciphertext, PKCS#5-style padding. None on any
    * malformed shape — skip, never misparse. */
  def aesDecrypt(key: Array[Byte], data: Array[Byte]): Option[Array[Byte]] = {
    if (data.length < 32 || data.length % 16 != 0) return None
    try {
      val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
      c.init(javax.crypto.Cipher.DECRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(key, "AES"),
        new javax.crypto.spec.IvParameterSpec(data.take(16)))
      val plain = c.doFinal(java.util.Arrays.copyOfRange(data, 16, data.length))
      val pad = plain.last & 0xff
      if (pad < 1 || pad > 16 || pad > plain.length) None
      else Some(plain.dropRight(pad))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Fixture-side AES-CBC encrypt (128 or 256 by key length) with a
    * DETERMINISTIC IV derived from the key and an optional per-stream
    * seed (fixtures must be reproducible; per-stream uniqueness is
    * what CBC needs here, not unpredictability — V5 shares ONE file
    * key across all streams, so the seed carries the object number). */
  def aesEncrypt(key: Array[Byte], data: Array[Byte],
      ivSeed: Array[Byte] = Array.empty): Array[Byte] = {
    val iv = md5(key, Array[Byte]('i', 'v'), ivSeed).take(16)
    val pad = 16 - (data.length % 16)
    val padded = data ++ Array.fill(pad)(pad.toByte)
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    iv ++ c.doFinal(padded)
  }

  // ---- parsing ----------------------------------------------------

  private def intKey(dict: String, key: String): Option[Int] =
    s"""$key\\s+(-?\\d{1,10})""".r.findFirstMatchIn(dict)
      .map(_.group(1).toInt)

  /** A dictionary string value: `<hex>` or `(literal)` with the
    * standard escapes — enough for /O, /U, and /ID elements. */
  private[pipeline] def dictString(dict: String, key: String): Option[Array[Byte]] = {
    val at = dict.indexOf(key)
    if (at < 0) return None
    var i = at + key.length
    while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    // /ID holds an ARRAY of two strings; step inside to the first
    if (i < dict.length && dict.charAt(i) == '[') {
      i += 1
      while (i < dict.length && dict.charAt(i).isWhitespace) i += 1
    }
    if (i >= dict.length) None
    else if (dict.charAt(i) == '<') {
      val e = dict.indexOf('>', i)
      if (e < 0) None
      else {
        val hx = dict.substring(i + 1, e).filterNot(_.isWhitespace)
        val h = if (hx.length % 2 == 1) hx + "0" else hx
        val out = new Array[Byte](h.length / 2)
        var k = 0
        while (k < out.length) {
          out(k) = Integer.parseInt(h.substring(2 * k, 2 * k + 2), 16).toByte
          k += 1
        }
        Some(out)
      }
    } else if (dict.charAt(i) == '(') {
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      i += 1
      while (i < dict.length && depth > 0) {
        val c = dict.charAt(i)
        if (c == '\\' && i + 1 < dict.length) {
          dict.charAt(i + 1) match {
            case 'n' => out.write('\n'); i += 2
            case 'r' => out.write('\r'); i += 2
            case 't' => out.write('\t'); i += 2
            case 'b' => out.write('\b'); i += 2
            case 'f' => out.write('\f'); i += 2
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = i + 1; var cnt = 0
              while (k < dict.length && cnt < 3 &&
                  dict.charAt(k) >= '0' && dict.charAt(k) <= '7') {
                v = v * 8 + (dict.charAt(k) - '0'); k += 1; cnt += 1
              }
              out.write(v & 0xff); i = k
            case other => out.write(other & 0xff); i += 2
          }
        } else if (c == '(') { depth += 1; out.write(c); i += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); i += 1 }
        else { out.write(c & 0xff); i += 1 }
      }
      Some(out.toByteArray)
    } else None
  }

  /** The `/StmF` stream crypt filter name: absent means `/Identity`
    * per spec (streams stored PLAINTEXT — only strings encrypted). */
  private def stmFilter(dict: String): String =
    """/StmF\s*/([A-Za-z0-9]+)""".r.findFirstMatchIn(dict)
      .map(_.group(1)).getOrElse("Identity")

  /** The encrypt dict with its balanced `/CF << … >>` sub-dict
    * removed: the TOP-LEVEL `/Length` is the key length in BITS,
    * while a crypt filter's `/Length` is in BYTES (e.g. 16) — a
    * first-match read across both would derive a 40-bit key from a
    * 128-bit file and fail /U validation on a readable document. */
  private[pipeline] def withoutCfDict(dict: String): String = {
    val at = dict.indexOf("/CF")
    if (at < 0) return dict
    val start = dict.indexOf("<<", at)
    if (start < 0) return dict
    var depth = 1
    var j = start + 2
    while (j < dict.length && depth > 0) {
      if (dict.regionMatches(j, "<<", 0, 2)) { depth += 1; j += 2 }
      else if (dict.regionMatches(j, ">>", 0, 2)) { depth -= 1; j += 2 }
      else j += 1
    }
    if (depth == 0) dict.substring(0, at) + dict.substring(j) else dict
  }

  /** The /StdCF crypt filter's /CFM method name, when declared. */
  private def stdCfMethod(dict: String): Option[String] =
    for {
      cf <- """(?s)/StdCF\s*<<(.*?)>>""".r.findFirstMatchIn(dict)
      m <- """/CFM\s*/([A-Za-z0-9]+)""".r.findFirstMatchIn(cf.group(1))
    } yield m.group(1)

  /** Parse the standard-handler parameters. The `/Encrypt N 0 R`
    * reference lives in the `trailer` dictionary — or, in
    * xref-stream-only files (the dominant container for V4/V5
    * encryption), in the `/Type /XRef` stream dictionary, which this
    * falls back to when no trailer keyword carries the entry (the
    * r14 gap that left the AES leg dead on modern corpora). The
    * winning container window also supplies the first /ID element.
    * None when absent or out of subset (real crypt-filter exotica
    * stay classified, not decrypted). */
  def parse(bytes: Array[Byte]): Option[StdSecurity] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val encRefRe = """/Encrypt\s+(\d+)\s+(\d+)\s+R""".r
    val objs = PdfTextPartitioner.objectsWithPos(bytes)
    // encryption-dict container: last trailer carrying /Encrypt, else
    // the LAST /Type /XRef STREAM DICT carrying it (xref-stream
    // files) — the parsed dict text, never a raw byte window, whose
    // back-span could include a preceding object's compressed payload
    // spelling '/ID' and shadow the real trailer /ID
    val container: Option[String] = {
      def lastTrailerWith: Option[String] = {
        var best: Option[String] = None
        var i = s.indexOf("trailer")
        while (i >= 0) {
          val w = s.substring(i, math.min(s.length, i + 2048))
          if (encRefRe.findFirstIn(w).isDefined) best = Some(w)
          i = s.indexOf("trailer", i + 7)
        }
        best
      }
      lastTrailerWith.orElse(
        objs.values.toSeq
          .filter { case (_, o) =>
            o.dict.contains("/XRef") && encRefRe.findFirstIn(o.dict).isDefined }
          .sortBy(-_._1).headOption.map(_._2.dict))
    }
    for {
      cont <- container
      encRef <- encRefRe.findFirstMatchIn(cont)
      encObj <- objs.get(encRef.group(1).toInt).map(_._2)
      dict = encObj.dict
      if dict.contains("/Standard")
      v = intKey(dict, "/V").getOrElse(0)
      stmf = stmFilter(dict)
      cfm = stdCfMethod(dict)
      // V4/V5 stream handling: /Identity ⇒ plaintext streams (no
      // transcryption — 'decrypting' them would destroy real text);
      // /StdCF ⇒ the declared method must be one we implement
      plainStreams = (v == 4 || v == 5) && stmf == "Identity"
      aes = !plainStreams &&
        ((v == 4 && cfm.contains("AESV2")) || (v == 5 && cfm.contains("AESV3")))
      v4rc4 = v == 4 && !plainStreams && cfm.contains("V2")
      if v == 1 || v == 2 || aes || v4rc4 || plainStreams
      r <- intKey(dict, "/R")
      if r == 2 || r == 3 || (r == 4 && v == 4) ||
        ((r == 5 || r == 6) && v == 5)
      o <- dictString(dict, "/O") if o.length >= 32
      u <- dictString(dict, "/U")
      p <- intKey(dict, "/P")
      id0 <- dictString(cont, "/ID").orElse(Some(Array.empty[Byte]))
    } yield StdSecurity(r, v,
      if (v == 5) 256
      else if (aes) 128
      else intKey(withoutCfDict(dict), "/Length")
        .getOrElse(if (v == 4) 128 else 40),
      o, u, p, id0, aes,
      encryptMetadata = !dict.contains("/EncryptMetadata false"),
      streamsPlain = plainStreams,
      ue = dictString(dict, "/UE").getOrElse(Array.empty),
      permsV5 = dictString(dict, "/Perms").getOrElse(Array.empty))
  }

  // ---- whole-file stream transcryption -----------------------------

  /** Apply `f(objNum, payload)` to every indirect object's stream
    * payload IN PLACE (RC4 keeps lengths, so offsets survive) and
    * return the rewritten bytes. Generation numbers are taken from
    * the object header. */
  private def mapStreams(bytes: Array[Byte])(
      f: (Int, Int, Array[Byte]) => Array[Byte]): Array[Byte] = {
    val s = new String(bytes, StandardCharsets.ISO_8859_1)
    val out = bytes.clone()
    val objRe = """(?<!\d)(\d{1,9})\s+(\d{1,5})\s+obj\b""".r
    var minPos = 0
    for (m <- objRe.findAllMatchIn(s) if m.start >= minPos) {
      val num = m.group(1).toInt
      val gen = m.group(2).toInt
      val start = m.end
      val endobj = s.indexOf("endobj", start)
      val streamKw = s.indexOf("stream", start)
      val hasStream = streamKw >= 0 && (endobj < 0 || streamKw < endobj) &&
        !(streamKw >= 3 && s.regionMatches(streamKw - 3, "endstream", 0, 9))
      if (hasStream) {
        val dict = s.substring(start, streamKw)
        PdfTextPartitioner.streamSpanFor(s, streamKw, dict) match {
          case Some((ds, de, end)) =>
            // xref streams are NEVER encrypted (spec: they must be
            // readable to FIND /Encrypt) — transcrypting one would
            // destroy plaintext
            if (!dict.contains("/XRef")) {
              val enc = f(num, gen,
                java.util.Arrays.copyOfRange(bytes, ds, de))
              // shorter results (AES strips IV + padding) pad with
              // spaces so offsets survive; longer results are a
              // contract violation and are truncated defensively
              val n = math.min(enc.length, de - ds)
              System.arraycopy(enc, 0, out, ds, n)
              var k = ds + n
              while (k < de) { out(k) = ' '.toByte; k += 1 }
            }
            minPos = end
          case None =>
            // unresolvable span ⇒ no endstream anywhere after this
            // point: everything to EOF is payload bytes, and payload
            // spelling 'N G obj … stream' must not fabricate a
            // phantom object that gets spuriously rewritten
            minPos = s.length
        }
      } else if (endobj >= 0) minPos = endobj + 6
    }
    out
  }

  /** Decrypt every stream payload under the empty-user-password file
    * key; None when the handler is out of subset or the empty
    * password does not open the file. The /Encrypt dictionary itself
    * carries no stream, so nothing in it is touched. RC4 payloads
    * decrypt length-for-length; AES plaintext is SHORTER than the
    * stored IV+ciphertext, so the in-place rewrite pads the tail with
    * spaces — harmless to every downstream consumer (inflate stops at
    * the deflate terminator; raw content streams ignore trailing
    * whitespace tokens; a failed shape decrypts to nothing, never to
    * misparsed bytes). */
  def decryptStreams(bytes: Array[Byte]): Option[Array[Byte]] =
    parse(bytes).flatMap { sec =>
      if (sec.r >= 5)
        // V5: the /U validation IS the key derivation — derive ONCE
        // (Algorithm 2.B is ≥64 hardened-hash rounds; a boolean
        // pre-filter would pay it twice per document) and branch on
        // the Option. One AES-256 file key for every object — no
        // per-object derivation (ISO 32000-2 §7.6.3.2 note 3).
        fileKeyV5(sec).map { fk =>
          if (sec.streamsPlain) bytes
          else mapStreams(bytes)((_, _, data) =>
            aesDecrypt(fk, data)
              .getOrElse(Array.fill(data.length)(' '.toByte)))
        }
      else if (!emptyUserPasswordWorks(sec)) None
      else if (sec.streamsPlain)
        Some(bytes)      // /StmF /Identity: streams stored plaintext
      else {
        val fk = fileKey(sec)
        Some(mapStreams(bytes) { (num, gen, data) =>
          if (sec.aes)
            aesDecrypt(objectKey(fk, num, gen, aes = true), data)
              .getOrElse(Array.fill(data.length)(' '.toByte))
          else rc4(objectKey(fk, num, gen), data)
        })
      }
    }

  /** Fixture-side forward pass: encrypt every stream payload under
    * the same object keys (RC4 is symmetric). */
  def encryptStreams(bytes: Array[Byte], fk: Array[Byte]): Array[Byte] =
    mapStreams(bytes)((num, gen, data) => rc4(objectKey(fk, num, gen), data))
}
