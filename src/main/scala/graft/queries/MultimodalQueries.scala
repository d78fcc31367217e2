package graft.queries

import java.nio.charset.StandardCharsets

import graft.{QueryDef, Tables}
import graft.multimodal.{ImageDedup, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal-column family as a driver-checkable query. The media
  * table is DERIVED deterministically from the `documents` fixture
  * (media_id = doc_id, content = FakeCodec "GIMG" binary whose header
  * fields are arithmetic in fixture columns, every 7th row corrupted
  * to a headerless blob), so the DuckDB oracle can recompute from
  * first principles the metadata that the Spark side must recover by
  * PARSING THE BINARY HEADERS — the oracle checks the codec plumbing,
  * not a copy of it. Feature extraction (murmur-hashed byte 4-grams)
  * is not SQL-expressible and stays spec-covered (MultimodalSpec).
  */
object MultimodalQueries {

  /** Deterministic media table derived from `documents` (shared by
    * q50/q54): GIMG-framed text payload, every 7th row corrupted to a
    * headerless blob.
    */
  private def mediaFromDocs(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val codec = Multimodal.FakeCodec()
    Tables.documents(s, d).select($"doc_id", $"text", $"n_chars")
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val payload = text.getBytes(StandardCharsets.UTF_8)
        val content =
          if (id % 7 == 0) payload   // corrupted: headerless blob
          else codec.encode((nChars % 640 + 16).toInt, (id % 480 + 16).toInt, payload)
        (id, "image", content)
      }.toDF("media_id", "kind", "content")
  }

  def defs: Seq[QueryDef] = Seq(
    // ----- q50: binary media + typed meta struct → per-lang stats.
    // Exercises: binary column construction, header parse into a
    // struct (batched, no shuffle), invalid-blob tolerance
    // (valid=false rows, never task failures), broadcast dimension
    // join, grouped aggregation over struct fields.
    QueryDef(
      "q50_multimodal_meta",
      (s, d) => {
        import s.implicits._
        val codec = Multimodal.FakeCodec()
        val docs = Tables.documents(s, d)
        Multimodal.withMeta(s, mediaFromDocs(s, d), codec)
          .join(broadcast(docs.select($"doc_id".as("media_id"), $"lang")), "media_id")
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_media"),
            sum(when($"meta.valid", 1L).otherwise(0L)).as("n_valid"),
            sum($"meta.n_bytes").as("total_bytes"),
            max(when($"meta.valid", $"meta.width")).as("max_width"),
            min(when($"meta.valid", $"meta.height")).as("min_height"))
          .orderBy($"lang")
      },
      Some("""SELECT lang,
             |  CAST(COUNT(*) AS BIGINT) AS n_media,
             |  CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
             |  CAST(SUM(strlen(text) + CASE WHEN doc_id % 7 <> 0 THEN 12 ELSE 0 END) AS BIGINT) AS total_bytes,
             |  MAX(CASE WHEN doc_id % 7 <> 0 THEN n_chars % 640 + 16 END) AS max_width,
             |  MIN(CASE WHEN doc_id % 7 <> 0 THEN doc_id % 480 + 16 END) AS min_height
             |FROM documents
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ----- q54: uniform frame sampling over "video" media — each
    // valid blob explodes into ≤5 evenly-spaced frames (64-byte
    // stand-in framing), invalid blobs into none. The oracle
    // recomputes the sampled-frame arithmetic from first principles:
    // frames = ceil(payload/64), sampled = least(frames, 5); the
    // Spark side must get there by decoding the actual binary.
    QueryDef(
      "q54_frame_sample",
      (s, d) => {
        import s.implicits._
        val codec = Multimodal.FakeCodec()
        val docs = Tables.documents(s, d)
        Multimodal.sampleFrames(s, mediaFromDocs(s, d), codec, maxFrames = 5)
          .join(broadcast(docs.select($"doc_id".as("media_id"), $"lang")), "media_id")
          .groupBy($"lang")
          .agg(
            count(lit(1)).as("n_frames"),
            countDistinct($"media_id").as("n_media"),
            sum(length($"frame")).cast("bigint").as("frame_bytes"))
          .orderBy($"lang")
      },
      Some("""SELECT lang,
             |  CAST(SUM(CASE WHEN doc_id % 7 <> 0
             |      THEN least(CAST(ceil(strlen(text) / 64.0) AS BIGINT), 5) ELSE 0 END) AS BIGINT)
             |    AS n_frames,
             |  CAST(SUM(CASE WHEN doc_id % 7 <> 0 AND strlen(text) > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_media,
             |  CAST(SUM(CASE WHEN doc_id % 7 <> 0 THEN
             |      least(CAST(ceil(strlen(text) / 64.0) AS BIGINT), 5) * 64
             |      - CASE WHEN CAST(ceil(strlen(text) / 64.0) AS BIGINT) <= 5
             |             AND strlen(text) % 64 <> 0
             |             THEN 64 - strlen(text) % 64 ELSE 0 END
             |    ELSE 0 END) AS BIGINT) AS frame_bytes
             |FROM documents
             |GROUP BY lang
             |ORDER BY lang""".stripMargin)),

    // ----- q147: perceptual image near-dup (multimodal/ImageDedup) —
    // dHash over the codec luma grid + pigeonhole Hamming join on the
    // synthesized media table; output is the pair count per Hamming
    // distance. Codec-dependent bits ⇒ rows-only like q50/q54;
    // brightness invariance, pigeonhole-equals-brute-force, and
    // real-PNG behavior are pinned by ImageDedupSpec.
    QueryDef(
      "q147_image_neardup",
      (s, d) => {
        import s.implicits._
        val codec = Multimodal.FakeCodec()
        // Par.spread: the decode+hash stage is CPU-dense over a
        // single-split source (the q141/q28 narrow-source lesson)
        val valid = Multimodal.withMeta(
            s, graft.Par.spread(mediaFromDocs(s, d)), codec)
          .filter($"meta.valid")
        ImageDedup.nearDupPairs(
            ImageDedup.withPHash(valid, "media_id", "content", codec),
            "media_id", maxHamming = 8)
          .groupBy($"hamming")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy($"hamming")
      },
      None),

    // ----- q176: audio frame features (multimodal/Audio) — the
    // AUDIO leg, ORACLE-CHECKED: the fixture waveform is generated BY
    // FORMULA in both engines (multiplicative-hash noise scaled by
    // clip_id % 4 — clips ≡ 0 (mod 4) are digital silence), the
    // Spark side round-trips it through REAL s16le PCM bytes
    // (encode → binary column → decode; the q121 no-drift rule:
    // one formula, zero literals), and energy/ZCR/silence are pure
    // integer arithmetic both sides. The byte codec itself is
    // spec-pinned (AudioSpec round-trip incl. negative samples).
    QueryDef(
      "q176_audio_features",
      (s, d) => {
        import s.implicits._
        val clips = s.range(AudioClips).map { c =>
          val samples = Array.tabulate(AudioSamples) { t =>
            val m = ((c * 31 + t) * 2654435761L) % 8192L
            ((m - 4096L) * (c % 4L)).toInt
          }
          (c, graft.multimodal.Audio.PcmCodec.encode(samples))
        }.toDF("clip_id", "audio")
        graft.multimodal.Audio.frameFeatures(clips, "clip_id", "audio",
          frameSize = AudioFrame)
      },
      Some(s"""WITH samples AS MATERIALIZED (
             |  SELECT c.range AS c, t.range AS t,
             |    CAST((((c.range * 31 + t.range) * 2654435761) % 8192 - 4096)
             |         * (c.range % 4) AS BIGINT) AS s
             |  FROM range(0, $AudioClips) c, range(0, $AudioSamples) t),
             |en AS (
             |  SELECT c, t // $AudioFrame AS f,
             |    CAST(SUM(s * s) AS BIGINT) AS energy
             |  FROM samples GROUP BY 1, 2),
             |zc AS (
             |  SELECT a.c, a.t // $AudioFrame AS f,
             |    CAST(SUM(CASE WHEN a.s * b.s < 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS zcr
             |  FROM samples a JOIN samples b
             |    ON a.c = b.c AND b.t = a.t - 1 AND a.t % $AudioFrame <> 0
             |  GROUP BY 1, 2)
             |SELECT en.c AS clip_id, en.f AS frame_id, en.energy,
             |  COALESCE(zc.zcr, 0) AS zcr,
             |  en.energy < ${graft.multimodal.Audio.EnergyFloor} AS is_silent
             |FROM en LEFT JOIN zc ON en.c = zc.c AND en.f = zc.f
             |ORDER BY clip_id, frame_id""".stripMargin)),

    // ----- q202: the ORACLE-CHECKED twin of q147 — the dHash +
    // pigeonhole-Hamming near-dup leg run end-to-end through the REAL
    // ImageDedup operators, with the luma grid generated BY FORMULA
    // (HashGridCodec: three-surface hash, the q176 waveform
    // precedent) instead of a byte codec. The oracle recomputes every
    // grid cell, rebuilds the 56-bit dHash from gradient comparisons,
    // and brute-forces all-pairs Hamming — so blocking recall,
    // bit-packing, and distance all hash-match; q147 stays as the
    // codec-bound compatibility surface (real-PNG behavior pinned in
    // ImageDedupSpec).
    {
      val GridSalt = 202L
      val MaxHamming = 18
      QueryDef(
        "q202_image_dhash_replay",
        (s, d) => {
          import s.implicits._
          val codec = Multimodal.HashGridCodec(GridSalt)
          val media = graft.Par.spread(
            Tables.documents(s, d).select($"doc_id").as[Long]
              .map(id => (id, java.nio.ByteBuffer.allocate(8).putLong(id).array()))
              .toDF("media_id", "content"))
          ImageDedup.nearDupPairs(
              ImageDedup.withPHash(media, "media_id", "content", codec),
              "media_id", maxHamming = MaxHamming)
            .orderBy($"id_a", $"id_b")
        },
        Some {
          val mix = graft.operators.Sampling.hashBitsSql("(i.id * 64 + g.p)", GridSalt)
          s"""WITH ids AS (SELECT doc_id AS id FROM documents),
             |cells AS MATERIALIZED (
             |  SELECT i.id, g.p, ($mix) % 1048576 AS v
             |  FROM ids i CROSS JOIN
             |    (SELECT unnest(range(0, 64)) AS p) g),
             |h AS MATERIALIZED (
             |  SELECT l.id,
             |    CAST(SUM(CASE WHEN l.v < r.v
             |      THEN (1::BIGINT << ((l.p // 8) * 7 + (l.p % 8)))
             |      ELSE 0 END) AS BIGINT) AS phash
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.p = l.p + 1
             |  WHERE l.p % 8 < 7
             |  GROUP BY l.id)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.id < b.id
             |WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
             |ORDER BY id_a, id_b""".stripMargin
        })
    },

    // ----- q348: embedded raster-image extraction, ORACLE-CHECKED —
    // the scanned-PDF leg run end-to-end through REAL byte plumbing.
    // Each document becomes an image-only PDF (PdfGen.rasterPdf:
    // 16×16 8-bit raster, encoding cycled doc_id%4 over plain Flate,
    // PNG-Up predictor, TIFF predictor, and an ASCII85+Flate
    // transport coat; gray and RGB colorspaces); PdfImages walks the
    // object table, reverses the filter/predictor chain, pools the
    // 8×8 luma grid, and ImageDedup.dHashOfGrid packs the 56-bit
    // perceptual hash. The oracle recomputes every PIXEL by formula
    // (hashBits salt 348 — the q176/q202 one-formula rule) and
    // rebuilds cells and hash in SQL: integer numerators, one double
    // division, one float cast, so cell values are bit-identical
    // cross-engine. Any regression in object shadowing, stream-span
    // arithmetic, Flate/A85 decode, either predictor reversal, dict
    // dimension/colorspace parsing, pooling, or bit packing shifts a
    // hash and the row set stops matching — the whole extraction
    // stack is one live tripwire.
    {
      val Salt = 348L
      QueryDef(
        "q348_pdf_image_dhash_replay",
        (s, d) => {
          import s.implicits._
          val pdfs = graft.Par.spread(
            Tables.documents(s, d).select($"doc_id").as[Long]
              .map(id => (id, graft.pipeline.PdfGen.rasterPdf(id)))
              .toDF("doc_id", "pdf"))
          pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
            it.flatMap { case (id, bytes) =>
              graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
                graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                  (id, im.objNum.toLong, im.width.toLong, im.height.toLong,
                    im.colorSpace, ImageDedup.dHashOfGrid(g))
                }
              }
            }
          }.toDF("doc_id", "obj_num", "width", "height", "colorspace", "phash")
            .orderBy($"doc_id")
        },
        Some {
          val gmix = graft.operators.Sampling.hashBitsSql("(i.id * 256 + g.p)", Salt)
          val rmix = graft.operators.Sampling.hashBitsSql("(i.id * 768 + q.q)", Salt)
          s"""WITH ids AS (SELECT doc_id AS id FROM documents),
             |gpx AS (
             |  SELECT i.id, g.p AS p, ($gmix) % 256 AS num
             |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 256)) AS p) g
             |  WHERE i.id % 4 <> 3),
             |rpx AS (
             |  SELECT i.id, q.q // 3 AS p, SUM(($rmix) % 256) AS num
             |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 768)) AS q) q
             |  WHERE i.id % 4 = 3
             |  GROUP BY 1, 2),
             |px AS (
             |  SELECT id, p, num, 4 AS denom FROM gpx
             |  UNION ALL
             |  SELECT id, p, num, 12 AS denom FROM rpx),
             |cells AS MATERIALIZED (
             |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
             |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
             |  FROM px GROUP BY 1, 2),
             |h AS (
             |  SELECT l.id,
             |    CAST(SUM(CASE WHEN l.cv < r.cv
             |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
             |      ELSE 0 END) AS BIGINT) AS phash
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
             |  WHERE l.cp % 8 < 7 GROUP BY 1)
             |SELECT id AS doc_id, CAST(20 AS BIGINT) AS obj_num,
             |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
             |  CASE WHEN id % 4 = 3 THEN 'DeviceRGB'
             |       ELSE 'DeviceGray' END AS colorspace,
             |  phash
             |FROM h ORDER BY doc_id""".stripMargin
        })
    },

    // ----- q349: scanned-corpus perceptual near-dup, ORACLE-CHECKED
    // end-to-end — every document contributes its rasterPdf AND a
    // planted twin (same image, first sample bumped one gray level ⇒
    // guaranteed within Hamming 2), the PdfRasterCodec bridge hashes
    // WHOLE-PDF bytes (extract → luma grid → dHash), and the
    // pigeonhole Hamming join recovers the pair set exactly. The
    // oracle recomputes both versions' pixels by formula and
    // brute-forces all pairs, so planted-pair recall AND any chance
    // cross-document collision must both replay — this is the "dedup
    // scans before OCRing them" pipeline (the 100 TB ordering that
    // makes the OCR pass affordable) as one driver-checked query.
    {
      val Salt = 348L
      val MaxHamming = 2
      QueryDef(
        "q349_scanned_pdf_neardup",
        (s, d) => {
          import s.implicits._
          val pdfs = graft.Par.spread(
            Tables.documents(s, d).select($"doc_id").as[Long]
              .flatMap(id => Seq(
                (id * 2, graft.pipeline.PdfGen.rasterPdf(id)),
                (id * 2 + 1, graft.pipeline.PdfGen.rasterPdfTwin(id))))
              .toDF("media_id", "pdf"))
          val hashed = pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
            val codec = graft.pipeline.PdfRasterCodec()
            it.map { case (id, b) => (id, ImageDedup.dHash(codec, b)) }
          }.toDF("media_id", "phash")
          ImageDedup.nearDupPairs(hashed, "media_id", maxHamming = MaxHamming)
            .orderBy($"id_a", $"id_b")
        },
        Some {
          val gmix = graft.operators.Sampling.hashBitsSql("(m.doc * 256 + g.p)", Salt)
          val rmix = graft.operators.Sampling.hashBitsSql("(m.doc * 768 + q.q)", Salt)
          s"""WITH m AS (
             |  SELECT doc_id * 2 + t.t AS id, doc_id AS doc, t.t AS tw
             |  FROM documents CROSS JOIN (SELECT unnest(range(0, 2)) AS t) t),
             |gpx AS (
             |  SELECT m.id, g.p AS p,
             |    CASE WHEN m.tw = 1 AND g.p = 0
             |         THEN (($gmix) % 256 + 1) % 256
             |         ELSE ($gmix) % 256 END AS num
             |  FROM m CROSS JOIN (SELECT unnest(range(0, 256)) AS p) g
             |  WHERE m.doc % 4 <> 3),
             |rpx AS (
             |  SELECT m.id, q.q // 3 AS p,
             |    SUM(CASE WHEN m.tw = 1 AND q.q = 0
             |          THEN (($rmix) % 256 + 1) % 256
             |          ELSE ($rmix) % 256 END) AS num
             |  FROM m CROSS JOIN (SELECT unnest(range(0, 768)) AS q) q
             |  WHERE m.doc % 4 = 3
             |  GROUP BY 1, 2),
             |px AS (
             |  SELECT id, p, num, 4 AS denom FROM gpx
             |  UNION ALL
             |  SELECT id, p, num, 12 AS denom FROM rpx),
             |cells AS MATERIALIZED (
             |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
             |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
             |  FROM px GROUP BY 1, 2),
             |h AS MATERIALIZED (
             |  SELECT l.id,
             |    CAST(SUM(CASE WHEN l.cv < r.cv
             |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
             |      ELSE 0 END) AS BIGINT) AS phash
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
             |  WHERE l.cp % 8 < 7 GROUP BY 1)
             |SELECT a.id AS id_a, b.id AS id_b,
             |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
             |FROM h a JOIN h b ON a.id < b.id
             |WHERE bit_count(xor(a.phash, b.phash)) <= $MaxHamming
             |ORDER BY id_a, id_b""".stripMargin
        })
    },

    // ----- q350: CCITT Group 4 scans, ORACLE-CHECKED end-to-end —
    // the fax compression real scanned PDFs carry. Each document
    // becomes a G4-compressed bilevel scan (PdfGen.ccittPdf: 16×16
    // bitmap by formula, hashBits salt 350, parity ⇒ black;
    // CcittG4.encode's vertical/horizontal/pass modes and T.4 run
    // tables produce the payload), PdfImages reverses it through the
    // pure-JVM T.6 decoder into gray luma, and the dHash replays.
    // The oracle recomputes the BITS in SQL (black ⇒ 0, white ⇒ 255,
    // 2×2 block means), so a single wrong Huffman table entry, mode
    // transition, or changing-element rule anywhere in
    // encode→container→decode shifts a hash and the row set stops
    // matching.
    {
      val Salt = 350L
      QueryDef(
        "q350_ccitt_scan_dhash_replay",
        (s, d) => {
          import s.implicits._
          val pdfs = graft.Par.spread(
            Tables.documents(s, d).select($"doc_id").as[Long]
              .map(id => (id, graft.pipeline.PdfGen.ccittPdf(id)))
              .toDF("doc_id", "pdf"))
          pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
            it.flatMap { case (id, bytes) =>
              graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
                graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                  (id, im.colorSpace, im.bitsPerComponent,
                    ImageDedup.dHashOfGrid(g))
                }
              }
            }
          }.toDF("doc_id", "colorspace", "bpc", "phash")
            .withColumn("bpc", col("bpc").cast("long"))
            .orderBy($"doc_id")
        },
        Some {
          val mix = graft.operators.Sampling.hashBitsSql("(i.id * 256 + g.p)", Salt)
          s"""WITH ids AS (SELECT doc_id AS id FROM documents),
             |px AS (
             |  SELECT i.id, g.p AS p,
             |    CASE WHEN ($mix) % 2 = 1 THEN 0 ELSE 255 END AS num
             |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 256)) AS p) g),
             |cells AS MATERIALIZED (
             |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
             |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
             |  FROM px GROUP BY 1, 2),
             |h AS (
             |  SELECT l.id,
             |    CAST(SUM(CASE WHEN l.cv < r.cv
             |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
             |      ELSE 0 END) AS BIGINT) AS phash
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
             |  WHERE l.cp % 8 < 7 GROUP BY 1)
             |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
             |  CAST(8 AS BIGINT) AS bpc, phash
             |FROM h ORDER BY doc_id""".stripMargin
        })
    },

    // ----- q351: INLINE images (BI … ID … EI), ORACLE-CHECKED —
    // the second raster carrier: abbreviated-key parameter dicts and
    // Flate image data nested INSIDE a Flate-compressed content
    // stream (PdfGen.inlineImagePdf, pixel formula salt 351). The
    // Spark side must find the content stream, inflate it, locate
    // the BI operator, parse /W /H /BPC /CS /F abbreviations, pick
    // the TRUE whitespace-delimited EI (binary payloads can fake
    // one — candidates are validated by decode), inflate the nested
    // payload, and pool+hash; the oracle recomputes the pixels in
    // SQL. objNum -1 marks the inline carrier.
    {
      val Salt = 351L
      QueryDef(
        "q351_inline_image_dhash_replay",
        (s, d) => {
          import s.implicits._
          val pdfs = graft.Par.spread(
            Tables.documents(s, d).select($"doc_id").as[Long]
              .map(id => (id, graft.pipeline.PdfGen.inlineImagePdf(id)))
              .toDF("doc_id", "pdf"))
          pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
            it.flatMap { case (id, bytes) =>
              graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
                graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                  (id, im.objNum.toLong, ImageDedup.dHashOfGrid(g))
                }
              }
            }
          }.toDF("doc_id", "obj_num", "phash")
            .orderBy($"doc_id")
        },
        Some {
          val mix = graft.operators.Sampling.hashBitsSql("(i.id * 256 + g.p)", Salt)
          s"""WITH ids AS (SELECT doc_id AS id FROM documents),
             |px AS (
             |  SELECT i.id, g.p AS p, ($mix) % 256 AS num
             |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 256)) AS p) g),
             |cells AS MATERIALIZED (
             |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
             |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
             |  FROM px GROUP BY 1, 2),
             |h AS (
             |  SELECT l.id,
             |    CAST(SUM(CASE WHEN l.cv < r.cv
             |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
             |      ELSE 0 END) AS BIGINT) AS phash
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
             |  WHERE l.cp % 8 < 7 GROUP BY 1)
             |SELECT id AS doc_id, CAST(-1 AS BIGINT) AS obj_num, phash
             |FROM h ORDER BY doc_id""".stripMargin
        })
    },

    // ----- q352: JBIG2 scans, ORACLE-CHECKED end-to-end — the MQ
    // arithmetic coder (47-state Qe table, byte stuffing, SETBITS
    // flush), template-0 generic-region coding, and the embedded
    // segment layer, all round-tripped through the PDF container
    // (PdfGen.jbig2Pdf, bitmap by formula salt 352). The oracle
    // recomputes the BITS in SQL, so a single wrong state
    // transition, context bit, or header offset shifts a hash and
    // the row set stops matching.
    {
      val Salt = 352L
      QueryDef(
        "q352_jbig2_scan_dhash_replay",
        (s, d) => {
          import s.implicits._
          val pdfs = graft.Par.spread(
            Tables.documents(s, d).select($"doc_id").as[Long]
              .map(id => (id, graft.pipeline.PdfGen.jbig2Pdf(id)))
              .toDF("doc_id", "pdf"))
          pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
            it.flatMap { case (id, bytes) =>
              graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
                graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                  (id, im.colorSpace, im.bitsPerComponent.toLong,
                    ImageDedup.dHashOfGrid(g))
                }
              }
            }
          }.toDF("doc_id", "colorspace", "bpc", "phash")
            .orderBy($"doc_id")
        },
        Some {
          val mix = graft.operators.Sampling.hashBitsSql("(i.id * 256 + g.p)", Salt)
          s"""WITH ids AS (SELECT doc_id AS id FROM documents),
             |px AS (
             |  SELECT i.id, g.p AS p,
             |    CASE WHEN ($mix) % 2 = 1 THEN 0 ELSE 255 END AS num
             |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 256)) AS p) g),
             |cells AS MATERIALIZED (
             |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
             |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
             |  FROM px GROUP BY 1, 2),
             |h AS (
             |  SELECT l.id,
             |    CAST(SUM(CASE WHEN l.cv < r.cv
             |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
             |      ELSE 0 END) AS BIGINT) AS phash
             |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
             |  WHERE l.cp % 8 < 7 GROUP BY 1)
             |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
             |  CAST(8 AS BIGINT) AS bpc, phash
             |FROM h ORDER BY doc_id""".stripMargin
        })
    },

    q353,
    q354,
    q355,
    q356,
    q357,
    q358,
    q359,
    q360,
    q361,
    q362,
    q363,
    q364,
    q365,
    q366,
    q367,
    q368,
    q369)

  /** q353: sub-8-bit and `/Indexed` rasters, ORACLE-CHECKED — the
    * r15 top-next decode leg run end-to-end. Each document becomes
    * PdfGen.subbitPdf (1-bit gray, 4-bit gray, 4-bit Indexed-RGB
    * hex palette, 1-bit Indexed with indirect base+stream lookup,
    * cycled doc_id%4) PLUS an inline 1-bit RAW carrier on the same
    * page; PdfImages expands samples/palettes to 8-bit and the dHash
    * replays. The oracle recomputes every pixel (salts 353/354/355:
    * sample formula, palette formula, inline formula) and rebuilds
    * cells and hashes in SQL, so a regression in bit unpacking, the
    * v·255/(2^bpc−1) scale, palette resolution (hex, indirect
    * stream), clamping, or the inline raw-length parse shifts a hash
    * and the row set stops matching. */
  private def q353: QueryDef = {
    QueryDef(
      "q353_subbit_indexed_dhash_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.subbitPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.objNum.toLong, im.colorSpace,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "obj_num", "colorspace", "phash")
          .orderBy($"doc_id", $"obj_num")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h353 = hashBitsSql("(i.id * 256 + g.p)", 353L)
        val h354v3 = hashBitsSql("(s3.id * 2 + s3.hv % 2)", 354L)
        val h354pal = hashBitsSql("(s3.id * 48 + (s3.hv % 16) * 3 + c.c)", 354L)
        val h355 = hashBitsSql("(i.id * 256 + g.p)", 355L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s3 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h353) AS hv
           |  FROM ids i CROSS JOIN g),
           |xg AS (
           |  SELECT id, p,
           |    CASE id % 4
           |      WHEN 0 THEN (hv % 2) * 255
           |      WHEN 1 THEN (hv % 16) * 17
           |      ELSE ($h354v3) % 256
           |    END AS num, 4 AS denom
           |  FROM s3 WHERE id % 4 <> 2),
           |xr AS (
           |  SELECT s3.id, s3.p,
           |    SUM(($h354pal) % 256) AS num, 12 AS denom
           |  FROM s3 CROSS JOIN (SELECT unnest(range(0, 3)) AS c) c
           |  WHERE s3.id % 4 = 2 GROUP BY 1, 2),
           |xo AS (
           |  SELECT id, CAST(20 AS BIGINT) AS obj_num, p, num, denom FROM xg
           |  UNION ALL
           |  SELECT id, CAST(20 AS BIGINT), p, num, denom FROM xr),
           |inl AS (
           |  SELECT i.id, CAST(-1 AS BIGINT) AS obj_num, g.p,
           |    (($h355) % 2) * 255 AS num, 4 AS denom
           |  FROM ids i CROSS JOIN g),
           |px AS (SELECT * FROM xo UNION ALL SELECT * FROM inl),
           |cells AS MATERIALIZED (
           |  SELECT id, obj_num, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2, 3),
           |h AS (
           |  SELECT l.id, l.obj_num,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r
           |    ON r.id = l.id AND r.obj_num = l.obj_num AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1, 2)
           |SELECT id AS doc_id, obj_num,
           |  CASE WHEN obj_num = 20 AND id % 4 = 2 THEN 'DeviceRGB'
           |       ELSE 'DeviceGray' END AS colorspace,
           |  phash
           |FROM h ORDER BY doc_id, obj_num""".stripMargin
      })
  }

  /** q354: SYMBOL-CODED JBIG2 scans, ORACLE-CHECKED — the r15
    * "What's missing" #2 leg run end-to-end: the MQ integer
    * arithmetic procedures (IADH/IADW/IAEX/IADT/IAFS/IADS/IAID),
    * symbol-dictionary decoding (height classes, shared GB contexts,
    * export runs), text-region placement (strips, TOPLEFT corners),
    * and the `/JBIG2Globals` plumbing (odd docs carry the dictionary
    * in a separate stream object). The oracle recomputes every page
    * pixel from the two nested formulas (glyph bitmap salt 356,
    * per-cell glyph choice salt 357), so one wrong PREV-tree
    * transition, export run, S/T delta, or globals hand-off shifts a
    * hash and the row set stops matching. */
  private def q354: QueryDef = {
    QueryDef(
      "q354_jbig2_symbol_text_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2TextPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h357 = hashBitsSql(
          "(i.id * 16 + ((g.p // 16) // 4) * 4 + (g.p % 16) // 4)", 357L)
        val h356 = hashBitsSql(
          "(s7.k * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)", 356L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s7 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h357) % 4 AS k
           |  FROM ids i CROSS JOIN g),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN ($h356) % 2 = 1 THEN 0 ELSE 255 END AS num
           |  FROM s7),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q355: `/ICCBased` colorspaces, ORACLE-CHECKED — the wrapper real
    * writers put around device spaces, resolved to the alternate by
    * the profile stream's `/N` component count through BOTH container
    * shapes (fully-indirect chain for even docs, direct array for odd
    * — PdfGen.iccPdf). The oracle recomputes pixels (salt 358) and
    * hashes in SQL; a resolution regression strands the raster as
    * `opaque` (no rows) or mislabels components and shifts hashes. */
  private def q355: QueryDef = {
    val Salt = 358L
    QueryDef(
      "q355_iccbased_dhash_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.iccPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val gmix = hashBitsSql("(i.id * 256 + g.p)", Salt)
        val rmix = hashBitsSql("(i.id * 768 + q.q)", Salt)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |gpx AS (
           |  SELECT i.id, g.p AS p, ($gmix) % 256 AS num
           |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 256)) AS p) g
           |  WHERE i.id % 2 = 0),
           |rpx AS (
           |  SELECT i.id, q.q // 3 AS p, SUM(($rmix) % 256) AS num
           |  FROM ids i CROSS JOIN (SELECT unnest(range(0, 768)) AS q) q
           |  WHERE i.id % 2 = 1
           |  GROUP BY 1, 2),
           |px AS (
           |  SELECT id, p, num, 4 AS denom FROM gpx
           |  UNION ALL
           |  SELECT id, p, num, 12 AS denom FROM rpx),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id,
           |  CASE WHEN id % 2 = 1 THEN 'DeviceRGB'
           |       ELSE 'DeviceGray' END AS colorspace,
           |  phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q356: CIE `/Lab` colorspace rasters, ORACLE-CHECKED — the
    * closed-form §8.6.5.4 conversion run end-to-end: sample decode
    * under the Lab defaults (L ∈ [0,100], a/b ∈ `/Range` — default
    * for even docs, explicit [−128 127 −128 127] behind an object
    * reference for odd), L*a*b* → XYZ → LINEAR sRGB (gamma omitted
    * by design — see PdfImages.labToRgb), clamp, round. The oracle
    * recomputes every byte of the conversion in SQL (salt 359) —
    * pure +,−,×,÷ IEEE arithmetic on both engines, so one wrong
    * constant, range default, or clamping bound shifts a hash and
    * the row set stops matching. */
  private def q356: QueryDef = {
    QueryDef(
      "q356_lab_colorspace_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.labPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        def smp(c: Int) = hashBitsSql(s"(i.id * 768 + g.p * 3 + $c)", 359L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |smp AS MATERIALIZED (
           |  SELECT i.id, g.p,
           |    (${smp(0)}) % 256 AS s0,
           |    (${smp(1)}) % 256 AS s1,
           |    (${smp(2)}) % 256 AS s2,
           |    CASE WHEN i.id % 2 = 1 THEN -128.0 ELSE -100.0 END AS amin,
           |    CASE WHEN i.id % 2 = 1 THEN 127.0 ELSE 100.0 END AS amax,
           |    CASE WHEN i.id % 2 = 1 THEN -128.0 ELSE -100.0 END AS bmin,
           |    CASE WHEN i.id % 2 = 1 THEN 127.0 ELSE 100.0 END AS bmax
           |  FROM ids i CROSS JOIN g),
           |f AS (
           |  SELECT id, p,
           |    (s0 * 100.0 / 255.0 + 16.0) / 116.0 AS fy,
           |    (s0 * 100.0 / 255.0 + 16.0) / 116.0
           |      + (amin + s1 * (amax - amin) / 255.0) / 500.0 AS fx,
           |    (s0 * 100.0 / 255.0 + 16.0) / 116.0
           |      - (bmin + s2 * (bmax - bmin) / 255.0) / 200.0 AS fz
           |  FROM smp),
           |xyz AS (
           |  SELECT id, p,
           |    0.9505 * (CASE WHEN fx >= 6.0 / 29.0 THEN fx * fx * fx
           |      ELSE (108.0 / 841.0) * (fx - 4.0 / 29.0) END) AS x,
           |    1.0 * (CASE WHEN fy >= 6.0 / 29.0 THEN fy * fy * fy
           |      ELSE (108.0 / 841.0) * (fy - 4.0 / 29.0) END) AS y,
           |    1.089 * (CASE WHEN fz >= 6.0 / 29.0 THEN fz * fz * fz
           |      ELSE (108.0 / 841.0) * (fz - 4.0 / 29.0) END) AS z
           |  FROM f),
           |px AS (
           |  SELECT id, p,
           |    CAST(FLOOR(255.0 * LEAST(GREATEST(
           |        3.2406 * x - 1.5372 * y - 0.4986 * z, 0.0), 1.0) + 0.5)
           |      AS BIGINT)
           |    + CAST(FLOOR(255.0 * LEAST(GREATEST(
           |        -0.9689 * x + 1.8758 * y + 0.0415 * z, 0.0), 1.0) + 0.5)
           |      AS BIGINT)
           |    + CAST(FLOOR(255.0 * LEAST(GREATEST(
           |        0.0557 * x - 0.204 * y + 1.057 * z, 0.0), 1.0) + 0.5)
           |      AS BIGINT) AS num
           |  FROM xyz),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 12 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceRGB' AS colorspace, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q357: `/SMask` soft-masked rasters, ORACLE-CHECKED — the
    * §11.6.5.2 compositing leg run end-to-end: the mask XObject is
    * excluded from standalone rows, the base (gray for even docs,
    * RGB for odd) composites onto white through the half-size mask
    * (nearest-neighbor sampled), and the dHash replays on the
    * VISIBLE pixels. The oracle recomputes
    * `(v·m + 255·(255−m) + 127) / 255` per component in integer SQL
    * (salts 360/361) — a wrong mask sample position, rounding term,
    * or a mask leaking through as its own row shifts the row set. */
  private def q357: QueryDef = {
    QueryDef(
      "q357_smask_composite_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.smaskPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.objNum.toLong, im.colorSpace,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "obj_num", "colorspace", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val hm = hashBitsSql(
          "(i.id * 64 + ((g.p // 16) // 2) * 8 + (g.p % 16) // 2)", 361L)
        val hg = hashBitsSql("(i.id * 256 + g.p)", 360L)
        val hr = hashBitsSql("(i.id * 768 + q.q)", 360L)
        val hmr = hashBitsSql(
          "(i.id * 64 + (((q.q // 3) // 16) // 2) * 8 + ((q.q // 3) % 16) // 2)",
          361L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |q AS (SELECT unnest(range(0, 768)) AS q),
           |gpx AS (
           |  SELECT i.id, g.p,
           |    ((($hg) % 256) * (($hm) % 256)
           |      + 255 * (255 - ($hm) % 256) + 127) // 255 AS num,
           |    4 AS denom
           |  FROM ids i CROSS JOIN g WHERE i.id % 2 = 0),
           |rpx AS (
           |  SELECT i.id, q.q // 3 AS p,
           |    SUM(((($hr) % 256) * (($hmr) % 256)
           |      + 255 * (255 - ($hmr) % 256) + 127) // 255) AS num,
           |    12 AS denom
           |  FROM ids i CROSS JOIN q WHERE i.id % 2 = 1 GROUP BY 1, 2),
           |px AS (
           |  SELECT id, p, num, denom FROM gpx
           |  UNION ALL
           |  SELECT id, p, num, denom FROM rpx),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, CAST(20 AS BIGINT) AS obj_num,
           |  CASE WHEN id % 2 = 1 THEN 'DeviceRGB'
           |       ELSE 'DeviceGray' END AS colorspace,
           |  phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q358: HUFFMAN-CODED JBIG2 text pages (SDHUFF=1 / SBHUFF=1),
    * ORACLE-CHECKED — the r16 "What's missing" #1 leg run end-to-end:
    * Annex B standard-table integers (B.1/B.2/B.4 dictionary-side,
    * B.6/B.8/B.11 text-side), runcode-built symbol ID codes, and
    * height-class COLLECTIVE bitmaps in both §6.5.9 shapes (MMR for
    * even docs, uncompressed for odd), with ids ≡ 2,3 (mod 4)
    * routing the dictionary through `/JBIG2Globals`. The oracle
    * recomputes every page pixel from the two nested formulas
    * (glyph bitmap salt 362, per-cell glyph choice salt 363) — one
    * wrong table line, canonical code, runcode expansion, collective
    * split, or globals hand-off shifts a hash and the row set stops
    * matching. */
  private def q358: QueryDef = {
    QueryDef(
      "q358_jbig2_huffman_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2HuffPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h363 = hashBitsSql(
          "(i.id * 16 + ((g.p // 16) // 4) * 4 + (g.p % 16) // 4)", 363L)
        val h362 = hashBitsSql(
          "(s7.k * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)", 362L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s7 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h363) % 4 AS k
           |  FROM ids i CROSS JOIN g),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN ($h362) % 2 = 1 THEN 0 ELSE 255 END AS num
           |  FROM s7),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q359: STRIPED JBIG2 pages (§7.4.8.5), ORACLE-CHECKED — the
    * unknown-height page form (0xFFFFFFFF + striped bit) with
    * per-stripe regions and end-of-stripe segments, stripe heights
    * cycling 1-6 (including non-dividing ones, and blank stripes
    * carried by their end-of-stripe marker alone). The oracle
    * recomputes every page pixel (salt 364) — a stripe composed at
    * the wrong offset or a height finalized short shifts the hash
    * and the row set stops matching. */
  private def q359: QueryDef = {
    QueryDef(
      "q359_jbig2_striped_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.stripedJbig2Pdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h364 = hashBitsSql("(i.id * 256 + g.p)", 364L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |px AS (
           |  SELECT i.id, g.p,
           |    CASE WHEN ($h364) % 2 = 1 THEN 0 ELSE 255 END AS num
           |  FROM ids i CROSS JOIN g),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q360: REFINEMENT-CODED JBIG2 (SDREFAGG=1, §6.3 template 1),
    * ORACLE-CHECKED — the last arithmetic branch run end-to-end: a
    * base dictionary, a refining dictionary (REFAGGNINST=1 ids +
    * RDX/RDY offsets + the 10-bit refinement contexts), and a text
    * region placing among BOTH dictionaries' exports, with odd docs
    * routing the whole chain through `/JBIG2Globals`. The oracle
    * recomputes every page pixel (base salt 365, flip-mask salt 366,
    * choice salt 367 over 8 symbols) — a wrong refinement context
    * bit, reference id, or offset shifts a hash and the row set
    * stops matching. */
  private def q360: QueryDef = {
    QueryDef(
      "q360_jbig2_refined_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2RefinedPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h367 = hashBitsSql(
          "(i.id * 16 + ((g.p // 16) // 4) * 4 + (g.p % 16) // 4)", 367L)
        val gq = "((s7.k % 4) * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)"
        val h365 = hashBitsSql(gq, 365L)
        val h366 = hashBitsSql(gq, 366L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s7 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h367) % 8 AS k
           |  FROM ids i CROSS JOIN g),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN (($h365) % 2
           |      + CASE WHEN s7.k >= 4 AND ($h366) % 4 = 0
           |             THEN 1 ELSE 0 END) % 2 = 1
           |      THEN 0 ELSE 255 END AS num
           |  FROM s7),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q361: `/Separation` and `/DeviceN` spot-color rasters,
    * ORACLE-CHECKED — the tint-transform leg (PDF 32000-1 §8.6.6.4-5
    * + §7.10) run end-to-end across all three in-subset function
    * types: TYPE 2 exponential → DeviceRGB (docs ≡ 0 mod 3), TYPE 3
    * stitching of two type-2 halves → DeviceGray (≡ 1), and a TYPE 0
    * sampled stream with REAL fractional interpolation → DeviceRGB
    * (≡ 2, `/Size [17]`); odd docs route the colorspace array behind
    * an object reference. The oracle recomputes every evaluation
    * step — domain decode, interpolation, clamp, rounding — in the
    * same IEEE double order (salts 368-371), so one re-associated
    * expression, wrong stitch bound, or off-by-one sample index
    * shifts a hash and the row set stops matching. */
  private def q361: QueryDef = {
    QueryDef(
      "q361_separation_tint_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.sepPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val hv = hashBitsSql("(i.id * 256 + g.p)", 368L)
        def c369(off: Int) = s"(CAST((${hashBitsSql(s"(i.id * 8 + $off)", 369L)}) % 256 AS DOUBLE) / 255.0)"
        def c370(off: Int) = s"(CAST((${hashBitsSql(s"(i.id * 8 + $off)", 370L)}) % 256 AS DOUBLE) / 255.0)"
        def s371(kExpr: String, j: Int) =
          s"CAST((${hashBitsSql(s"(i.id * 64 + ($kExpr) * 3 + $j)", 371L)}) % 256 AS DOUBLE)"
        // one byte of the type-2 leg: floor(255·clamp01(c0 + t(c1−c0)) + 0.5)
        def t2byte(j: Int) =
          s"""CAST(FLOOR(255.0 * LEAST(GREATEST(
             |      ${c369(j)} + t * (${c369(4 + j)} - ${c369(j)}),
             |      0.0), 1.0) + 0.5) AS BIGINT)""".stripMargin
        // one byte of the type-0 leg: sample interp then decode map
        def t0byte(j: Int) =
          s"""CAST(FLOOR(255.0 * LEAST(GREATEST(
             |      ((${s371("k", j)} + (e - CAST(k AS DOUBLE)) *
             |        (${s371("k + 1", j)} - ${s371("k", j)})) - 0.0)
             |        * 1.0 / 255.0,
             |      0.0), 1.0) + 0.5) AS BIGINT)""".stripMargin
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |tin AS MATERIALIZED (
           |  SELECT i.id, g.p,
           |    0.0 + (CAST(($hv) % 256 AS DOUBLE) * (1.0 - 0.0)) / 255.0 AS t
           |  FROM ids i CROSS JOIN g),
           |p2 AS (
           |  SELECT i.id, p, t,
           |    ${t2byte(0)} + ${t2byte(1)} + ${t2byte(2)} AS num, 12 AS denom
           |  FROM tin JOIN ids i ON i.id = tin.id WHERE i.id % 3 = 0),
           |p3 AS (
           |  SELECT i.id, p,
           |    CAST(FLOOR(255.0 * LEAST(GREATEST(
           |      CASE WHEN t >= 0.5
           |        THEN ${c370(2)} + ((t - 0.5) * (1.0 - 0.0) / (1.0 - 0.5))
           |          * (${c370(3)} - ${c370(2)})
           |        ELSE ${c370(0)} + ((t - 0.0) * (1.0 - 0.0) / (0.5 - 0.0))
           |          * (${c370(1)} - ${c370(0)})
           |      END, 0.0), 1.0) + 0.5) AS BIGINT) AS num, 4 AS denom
           |  FROM tin JOIN ids i ON i.id = tin.id WHERE i.id % 3 = 1),
           |d0 AS (
           |  SELECT i.id, p,
           |    0.0 + ((t - 0.0) * (16.0 - 0.0)) / (1.0 - 0.0) AS e
           |  FROM tin JOIN ids i ON i.id = tin.id WHERE i.id % 3 = 2),
           |p0 AS (
           |  SELECT i.id, p, e,
           |    ${t0byte(0)} + ${t0byte(1)} + ${t0byte(2)} AS num, 12 AS denom
           |  FROM (SELECT id, p, e,
           |          LEAST(CAST(FLOOR(e) AS BIGINT), 15) AS k FROM d0) d
           |    JOIN ids i ON i.id = d.id),
           |px AS (
           |  SELECT id, p, num, denom FROM p2
           |  UNION ALL SELECT id, p, num, denom FROM p3
           |  UNION ALL SELECT id, p, num, denom FROM p0),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id,
           |  CASE WHEN id % 3 = 1 THEN 'DeviceGray'
           |       ELSE 'DeviceRGB' END AS colorspace,
           |  phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q362: CUSTOM-Huffman-table JBIG2 text pages (T.88 §7.4.13
    * type-53 segments, §B.2 assembly), ORACLE-CHECKED — all six
    * selectable tables (DH/DW/BMSIZE dictionary-side, FS/DS/DT
    * text-side) arrive as referred table segments with selector 3,
    * previously a clean decline. Collective bitmaps MMR for even
    * docs, uncompressed for odd; ids ≡ 2,3 (mod 4) route dictionary
    * + tables through `/JBIG2Globals`. The oracle recomputes every
    * page pixel from the two formulas (glyph salt 372, choice salt
    * 373) — a wrong table line, canonical code, or cursor order in
    * the custom-table hand-off shifts a hash and the row set stops
    * matching. */
  private def q362: QueryDef = {
    QueryDef(
      "q362_jbig2_custom_table_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2CustomTablePdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h373 = hashBitsSql(
          "(i.id * 16 + ((g.p // 16) // 4) * 4 + (g.p % 16) // 4)", 373L)
        val h372 = hashBitsSql(
          "(s7.k * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)", 372L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s7 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h373) % 4 AS k
           |  FROM ids i CROSS JOIN g),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN ($h372) % 2 = 1 THEN 0 ELSE 255 END AS num
           |  FROM s7),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q363: JBIG2 text-region PLACEMENT MODES (§6.4.5 — r17),
    * ORACLE-CHECKED — transposed placement, all four reference
    * corners, XOR composition over an overlapping glyph grid, and
    * SBDEFPIXEL, cycling with strip height by doc id. The decoded
    * page must be mode-INVARIANT (the wire encoding is completely
    * different per mode: corner-derived T coordinates, pre/post CURS
    * updates, strip grouping), so the oracle replays pure geometry —
    * pixel = (defpixel + Σ covering glyph bits) mod 2 (salts
    * 374/375). A wrong corner edge, a missed pre-advance, or a
    * defpixel fill leak shifts a hash and the row set stops
    * matching. */
  private def q363: QueryDef = {
    QueryDef(
      "q363_jbig2_text_modes_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2ModesPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h375 = hashBitsSql("(i.id * 32 + pl.gy * 5 + pl.gx)", 375L)
        val h374 = hashBitsSql(
          "(cov.k * 16 + (cov.y - cov.gy * 3) * 4 + (cov.x - cov.gx * 3))",
          374L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |pl AS (SELECT a.gx, b.gy
           |  FROM (SELECT unnest(range(0, 5)) AS gx) a
           |  CROSS JOIN (SELECT unnest(range(0, 5)) AS gy) b),
           |cov AS MATERIALIZED (
           |  SELECT i.id, g.p, g.p % 16 AS x, g.p // 16 AS y,
           |    pl.gx, pl.gy, ($h375) % 4 AS k
           |  FROM ids i CROSS JOIN g JOIN pl
           |    ON (g.p % 16) BETWEEN pl.gx * 3 AND pl.gx * 3 + 3
           |   AND (g.p // 16) BETWEEN pl.gy * 3 AND pl.gy * 3 + 3),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN (MAX(id // 8) % 2 + SUM(($h374) % 2)) % 2 = 1
           |         THEN 0 ELSE 255 END AS num
           |  FROM cov GROUP BY id, p),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q364: EXTERNAL region composition operators + page default
    * pixel (§7.4.8.5 — r17), ORACLE-CHECKED — three overlapping
    * generic regions compose sequentially as REPLACE, XOR, AND onto
    * a page whose default pixel alternates by doc id. The oracle
    * replays the exact sequential algebra per pixel (salts
    * 379/380/381): rows 0-7 carry A (through the AND box), rows 8-11
    * carry A⊕B (through the box), rows 12-15 carry default⊕B — one
    * region composed as OR, one missed default fill, or a swapped
    * application order shifts the overlap bands and the row set
    * stops matching. */
  private def q364: QueryDef = {
    QueryDef(
      "q364_jbig2_region_ops_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.regionOpsPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val ha = hashBitsSql("(i.id * 192 + (g.p // 16) * 16 + g.p % 16)", 379L)
        val hb = hashBitsSql("(i.id * 128 + ((g.p // 16) - 8) * 16 + g.p % 16)", 380L)
        val hc = hashBitsSql("(i.id * 64 + ((g.p // 16) - 4) * 8 + (g.p % 16) - 4)", 381L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |bits AS MATERIALIZED (
           |  SELECT i.id, g.p, g.p % 16 AS x, g.p // 16 AS y,
           |    ($ha) % 2 AS a, ($hb) % 2 AS b, ($hc) % 2 AS c,
           |    i.id % 2 AS dp
           |  FROM ids i CROSS JOIN g),
           |seq AS (
           |  SELECT id, p,
           |    CASE WHEN y < 12 THEN a ELSE dp END AS p1,
           |    x, y, b, c
           |  FROM bits),
           |seq2 AS (
           |  SELECT id, p,
           |    CASE WHEN y >= 8 THEN (p1 + b) % 2 ELSE p1 END AS p2,
           |    x, y, c
           |  FROM seq),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN (CASE WHEN x BETWEEN 4 AND 11 AND y BETWEEN 4 AND 11
           |                    THEN p2 * c ELSE p2 END) = 1
           |         THEN 0 ELSE 255 END AS num
           |  FROM seq2),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q365: PER-INSTANCE refined JBIG2 text regions (SBREFINE=1,
    * §6.4.11 — r17), ORACLE-CHECKED — each cell's IARI decision
    * (salt 385) either places the dictionary glyph or refines it
    * in-line through RDW/RDH/RDX/RDY and the §6.3 procedure, under
    * BOTH GRTEMPLATEs (docId parity) and the globals split. The
    * oracle recomputes every pixel (glyph salt 382, flip salt 383,
    * choice salt 384) — a wrong refinement context, a missed IARI,
    * or an unconsumed strip terminator shifts a hash and the row
    * set stops matching. */
  private def q365: QueryDef = {
    QueryDef(
      "q365_jbig2_inst_refined_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2InstRefinedPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val cell = "(i.id * 16 + ((g.p // 16) // 4) * 4 + (g.p % 16) // 4)"
        val h384 = hashBitsSql(cell, 384L)
        val h385 = hashBitsSql(cell, 385L)
        val gp = "(s7.k * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)"
        val h382 = hashBitsSql(gp, 382L)
        val h383 = hashBitsSql(gp, 383L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s7 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h384) % 4 AS k, ($h385) % 2 AS rf
           |  FROM ids i CROSS JOIN g),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN (($h382) % 2
           |      + CASE WHEN s7.rf = 1 AND ($h383) % 4 = 0
           |             THEN 1 ELSE 0 END) % 2 = 1
           |      THEN 0 ELSE 255 END AS num
           |  FROM s7),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q366: MULTI-AGGREGATE JBIG2 dictionaries (REFAGGNINST = 2,
    * §6.5.8.2.2 — r17), ORACLE-CHECKED — each dictionary symbol is
    * an embedded TEXT REGION on the dictionary's own arithmetic
    * stream, OR-ing two refined base-glyph instances, under both
    * GRTEMPLATEs and the globals split. The oracle recomputes every
    * pixel (base salt 386, flip salts 387/388, choice salt 389) —
    * a wrong shared-stream hand-off, aggregate code length, or
    * refinement bit shifts a hash and the row set stops matching. */
  private def q366: QueryDef = {
    QueryDef(
      "q366_jbig2_aggregate_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2AggPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val cell = "(i.id * 16 + ((g.p // 16) // 4) * 4 + (g.p % 16) // 4)"
        val h389 = hashBitsSql(cell, 389L)
        val gpK = "(s7.k * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)"
        val gpK1 = "(((s7.k + 1) % 4) * 16 + ((s7.p // 16) % 4) * 4 + (s7.p % 16) % 4)"
        val ga = hashBitsSql(gpK, 386L)
        val gb = hashBitsSql(gpK1, 386L)
        val fa = hashBitsSql(gpK, 387L)
        val fb = hashBitsSql(gpK, 388L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |s7 AS MATERIALIZED (
           |  SELECT i.id, g.p, ($h389) % 4 AS k
           |  FROM ids i CROSS JOIN g),
           |px AS (
           |  SELECT id, p,
           |    CASE WHEN GREATEST(
           |      (($ga) % 2 + CASE WHEN ($fa) % 4 = 0 THEN 1 ELSE 0 END) % 2,
           |      (($gb) % 2 + CASE WHEN ($fb) % 4 = 0 THEN 1 ELSE 0 END) % 2
           |    ) = 1 THEN 0 ELSE 255 END AS num
           |  FROM s7),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q367: TYPE 4 (PostScript calculator) tint transforms +
    * multi-colorant `/DeviceN` (§7.10.5 — r17), ORACLE-CHECKED — a
    * 1-in Separation program (dup/exch/roll/mul/sub → RGB) for even
    * docs, a 2-in two-ink DeviceN program (→ gray) for odd, both
    * previously declines. The oracle replays every program step as
    * plain SQL arithmetic (ink salts 390/391, constant salt 392) —
    * a wrong stack rotation, operand order, or domain decode shifts
    * a hash and the row set stops matching. */
  private def q367: QueryDef = {
    QueryDef(
      "q367_tint_calculator_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.tintCalcPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val v0 = hashBitsSql("(i.id * 256 + g.p)", 390L)
        val v1 = hashBitsSql("(i.id * 256 + g.p)", 391L)
        def c392(off: Int) =
          s"(CAST((${hashBitsSql(s"(i.id * 8 + $off)", 392L)}) % 256 AS DOUBLE) / 255.0)"
        def byteOf(expr: String) =
          s"CAST(FLOOR(255.0 * LEAST(GREATEST($expr, 0.0), 1.0) + 0.5) AS BIGINT)"
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |tin AS MATERIALIZED (
           |  SELECT i.id, g.p,
           |    0.0 + (CAST(($v0) % 256 AS DOUBLE) * (1.0 - 0.0)) / 255.0 AS t0,
           |    0.0 + (CAST(($v1) % 256 AS DOUBLE) * (1.0 - 0.0)) / 255.0 AS t1
           |  FROM ids i CROSS JOIN g),
           |p0 AS (
           |  SELECT i.id, p,
           |    ${byteOf(s"t0 * ${c392(0)}")} +
           |    ${byteOf(s"t0 * ${c392(1)}")} +
           |    ${byteOf(s"1.0 - t0 * ${c392(2)}")} AS num, 12 AS denom
           |  FROM tin JOIN ids i ON i.id = tin.id WHERE i.id % 2 = 0),
           |p1 AS (
           |  SELECT i.id, p,
           |    ${byteOf(s"1.0 - (t1 * ${c392(5)} + t0 * ${c392(4)})")} AS num,
           |    4 AS denom
           |  FROM tin JOIN ids i ON i.id = tin.id WHERE i.id % 2 = 1),
           |px AS (
           |  SELECT id, p, num, denom FROM p0
           |  UNION ALL SELECT id, p, num, denom FROM p1),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / MAX(denom) AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id,
           |  CASE WHEN id % 2 = 1 THEN 'DeviceGray'
           |       ELSE 'DeviceRGB' END AS colorspace,
           |  phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q368: REFINEMENT REGION segments + TPGRON (§7.4.7 / §6.3.5.6 —
    * r17), ORACLE-CHECKED — the two-pass progressive page: a base
    * raster composed first, then a type-40 segment that REPLACES the
    * center box with a refinement coded against the page beneath,
    * typical prediction on for odd docs. These segments were
    * previously SKIPPED — wrong pixels, not a decline — so the
    * oracle's final-page replay (base salt 393, flip salt 394) is
    * the regression tripwire for the whole pass. */
  private def q368: QueryDef = {
    QueryDef(
      "q368_jbig2_refine_region_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2RefineRegionPdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val hb = hashBitsSql("(i.id * 256 + g.p)", 393L)
        val hf = hashBitsSql(
          "(i.id * 64 + ((g.p // 16) - 4) * 8 + (g.p % 16) - 4)", 394L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |px AS (
           |  SELECT i.id, g.p,
           |    CASE WHEN (($hb) % 2
           |      + CASE WHEN (g.p % 16) BETWEEN 4 AND 11
           |                  AND (g.p // 16) BETWEEN 4 AND 11
           |                  AND ($hf) % 4 = 0
           |             THEN 1 ELSE 0 END) % 2 = 1
           |      THEN 0 ELSE 255 END AS num
           |  FROM ids i CROSS JOIN g),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  /** q369: generic-region GBTEMPLATEs 1-3 (§6.2.5.3 — r17),
    * ORACLE-CHECKED — the smaller coding contexts real encoders pick
    * for speed, previously declines. Template cycles by doc id with
    * TPGDON on bit 2; the oracle recomputes every pixel (salt 395),
    * so a wrong context-pixel slot, nominal-AT position, or TPGD
    * pseudo-context in any template shifts a hash and the row set
    * stops matching. */
  private def q369: QueryDef = {
    QueryDef(
      "q369_jbig2_templates_replay",
      (s, d) => {
        import s.implicits._
        val pdfs = graft.Par.spread(
          Tables.documents(s, d).select($"doc_id").as[Long]
            .map(id => (id, graft.pipeline.PdfGen.jbig2TemplatePdf(id)))
            .toDF("doc_id", "pdf"))
        pdfs.as[(Long, Array[Byte])].mapPartitions { it =>
          it.flatMap { case (id, bytes) =>
            graft.pipeline.PdfImages.extract(bytes).flatMap { im =>
              graft.pipeline.PdfImages.lumaGrid(im).map { g =>
                (id, im.colorSpace, im.bitsPerComponent.toLong,
                  ImageDedup.dHashOfGrid(g))
              }
            }
          }
        }.toDF("doc_id", "colorspace", "bpc", "phash")
          .orderBy($"doc_id")
      },
      Some {
        import graft.operators.Sampling.hashBitsSql
        val h395 = hashBitsSql("(i.id * 256 + g.p)", 395L)
        s"""WITH ids AS (SELECT doc_id AS id FROM documents),
           |g AS (SELECT unnest(range(0, 256)) AS p),
           |px AS (
           |  SELECT i.id, g.p,
           |    CASE WHEN ($h395) % 2 = 1 THEN 0 ELSE 255 END AS num
           |  FROM ids i CROSS JOIN g),
           |cells AS MATERIALIZED (
           |  SELECT id, ((p // 16) // 2) * 8 + ((p % 16) // 2) AS cp,
           |    CAST(CAST(SUM(num) AS DOUBLE) / 4 AS FLOAT) AS cv
           |  FROM px GROUP BY 1, 2),
           |h AS (
           |  SELECT l.id,
           |    CAST(SUM(CASE WHEN l.cv < r.cv
           |      THEN (1::BIGINT << ((l.cp // 8) * 7 + (l.cp % 8)))
           |      ELSE 0 END) AS BIGINT) AS phash
           |  FROM cells l JOIN cells r ON r.id = l.id AND r.cp = l.cp + 1
           |  WHERE l.cp % 8 < 7 GROUP BY 1)
           |SELECT id AS doc_id, 'DeviceGray' AS colorspace,
           |  CAST(8 AS BIGINT) AS bpc, phash
           |FROM h ORDER BY doc_id""".stripMargin
      })
  }

  private val AudioClips = 8L
  private val AudioSamples = 2048
  private val AudioFrame = 256
}
