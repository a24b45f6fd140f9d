package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Multimodal pipeline queries: binary media column -> batched mapPartitions
  * decode/feature/frame-sample stage (graft.operators.Multimodal). The
  * decode is a deterministic stub (no codecs in this container); the feature
  * math over bytes is real, so the DuckDB oracle can recompute selected
  * histogram bins from the text with regexp counts — an end-to-end check of
  * the mapPartitions plumbing, schema, and batch shape. */
object MultimodalQueries {

  /** Byte-histogram features, re-derived as integer counts so float ratio
    * rounding can't flake the hash: bin 6 = bytes 0x60-0x6f ([`a-o]),
    * bin 7 = 0x70-0x7f ([p-z{|}~]), bin 2 = 0x20-0x2f (space + punct). */
  private val features = Q(
    "q_multimodal_features",
    (s, d) => {
      val media = Multimodal.processMedia(Multimodal.documentsAsMedia(s, d))
      media.select(
        col("doc_id"),
        col("mime_type"),
        col("byte_len"),
        round(element_at(col("features"), 7).cast("double") * col("byte_len"), 0)
          .cast("long").as("n_ao"),
        round(element_at(col("features"), 8).cast("double") * col("byte_len"), 0)
          .cast("long").as("n_pz"),
        round(element_at(col("features"), 3).cast("double") * col("byte_len"), 0)
          .cast("long").as("n_space_punct"))
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id, 'text/plain;fake=1' AS mime_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        CAST(len(regexp_extract_all(text, '[`a-o]')) AS BIGINT) AS n_ao,
        CAST(len(regexp_extract_all(text, '[p-z{|}~]')) AS BIGINT) AS n_pz,
        CAST(len(regexp_extract_all(text, '[ -/]')) AS BIGINT) AS n_space_punct
      FROM documents ORDER BY doc_id"""))

  /** Frame sampling: deterministic rolling fingerprint over the (stride 7,
    * ≤32) sampled "frames". The corpus is pure ASCII (checked per sf), so
    * DuckDB can mirror the byte-level 64-bit wrapping hash exactly: sampled
    * code points in HUGEINT arithmetic mod 2^64, then mapped to the signed
    * value Scala's wrapping Long produces. */
  private val frames = Q(
    "q_multimodal_frames",
    (s, d) =>
      Multimodal.processMedia(Multimodal.documentsAsMedia(s, d))
        .select(col("doc_id"), col("frame_fingerprint"))
        .orderBy("doc_id"),
    Some("""WITH f AS (SELECT doc_id,
        list_transform(
          range(0, least(32, (octet_length(encode(text)) + 6) // 7)),
          k -> CAST(ord(substr(text, CAST(k*7 + 1 AS INT), 1)) AS HUGEINT)) AS frames
      FROM documents),
      fp AS (SELECT doc_id,
        list_reduce(list_prepend(1125899906842597::HUGEINT, frames),
                    (acc, x) -> (acc*31 + x) % 18446744073709551616::HUGEINT) AS fp_u
      FROM f)
      SELECT doc_id,
        CASE WHEN fp_u >= 9223372036854775808::HUGEINT
             THEN CAST(fp_u - 18446744073709551616::HUGEINT AS BIGINT)
             ELSE CAST(fp_u AS BIGINT) END AS frame_fingerprint
      FROM fp ORDER BY doc_id"""))

  /** REAL codec path, end to end: deterministic 8x8 gray PNGs (actual
    * zlib-compressed image bytes) -> ImageIO decode -> pixel-domain
    * histogram features + frame fingerprint. The oracle recomputes
    * everything from the pixel formula — if decode returned anything but
    * the exact pixels (or invented dimensions), every column would
    * mismatch. Feature bins are count/64 (dyadic => float-exact, no
    * rounding needed). */
  private val decodeQ = Q(
    "q_multimodal_decode",
    (s, d) =>
      Multimodal.decodeImageTable(Multimodal.syntheticImages(s, d))
        .select(
          col("doc_id"), col("width"), col("height"),
          element_at(col("features"), 1).cast("double").as("f0"),
          element_at(col("features"), 6).cast("double").as("f5"),
          element_at(col("features"), 11).cast("double").as("f10"),
          element_at(col("features"), 16).cast("double").as("f15"),
          col("frame_fp"))
        .orderBy("doc_id"),
    Some("""WITH px AS (SELECT doc_id,
        list_transform(range(0, 64), i -> (doc_id*31 + i*7) % 256) AS p
      FROM documents),
      f AS (SELECT doc_id, p,
        list_transform(range(0, 10), k -> CAST(p[CAST(k*7 + 1 AS INT)] AS HUGEINT)) AS frames
      FROM px),
      fp AS (SELECT doc_id, p,
        list_reduce(list_prepend(1125899906842597::HUGEINT, frames),
                    (acc, x) -> (acc*31 + x) % 18446744073709551616::HUGEINT) AS fp_u
      FROM f)
      SELECT doc_id,
        CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        CAST(len(list_filter(p, x -> x // 16 = 0)) AS DOUBLE)/64 AS f0,
        CAST(len(list_filter(p, x -> x // 16 = 5)) AS DOUBLE)/64 AS f5,
        CAST(len(list_filter(p, x -> x // 16 = 10)) AS DOUBLE)/64 AS f10,
        CAST(len(list_filter(p, x -> x // 16 = 15)) AS DOUBLE)/64 AS f15,
        CASE WHEN fp_u >= 9223372036854775808::HUGEINT
             THEN CAST(fp_u - 18446744073709551616::HUGEINT AS BIGINT)
             ELSE CAST(fp_u AS BIGINT) END AS frame_fp
      FROM fp ORDER BY doc_id"""))

  /** REAL audio path, end to end: deterministic 16-bit PCM WAV containers
    * (actual RIFF bytes) -> javax.sound.sampled decode -> exact integer
    * sample features (abs-sum, energy, zero crossings). The oracle
    * recomputes every column from the sample formula — a header misparse,
    * endianness slip, or sample corruption would mismatch everything.
    * Sample i of doc d is ((d*37 + i*11) % 65536) - 32768. */
  private val audioQ = Q(
    "q_multimodal_audio",
    (s, d) =>
      Multimodal.decodeAudioTable(Multimodal.syntheticWavs(s, d))
        .orderBy("doc_id"),
    Some("""WITH sm AS (SELECT doc_id,
        list_transform(range(0, 64), i -> (doc_id*37 + i*11) % 65536 - 32768) AS s
      FROM documents)
      SELECT doc_id,
        CAST(64 AS BIGINT) AS n_samples,
        CAST(8000 AS BIGINT) AS sample_rate,
        CAST(list_reduce(list_transform(s, x -> abs(x)), (a, b) -> a + b) AS BIGINT) AS sum_abs,
        CAST(list_reduce(list_transform(s, x -> x*x), (a, b) -> a + b) AS BIGINT) AS energy,
        CAST(len(list_filter(range(1, 64), i -> (s[i] < 0) <> (s[i+1] < 0))) AS BIGINT) AS zero_cross
      FROM sm ORDER BY doc_id"""))

  /** REAL multi-frame (video-like) path: deterministic 4-frame animated
    * GIFs — an actual multi-image container the JDK writes AND reads — one
    * output row per decoded frame with exact integer pixel stats. The gray
    * palette is stored verbatim (no quantizer), so the oracle recomputes
    * every frame from the pixel formula; frame f pixel i of doc d is
    * (d*31 + f*97 + i*7) % 256. True compressed-video codecs (H.264 etc.)
    * remain the documented JDK boundary — the container/frame-iteration
    * plumbing this pins is the part the pipeline owns. Bounded to a
    * constant 500-doc slice (the audit stance): the JDK GIF writer costs
    * ~ms per sequence, and the codec-path proof doesn't strengthen with
    * corpus size — the mapPartitions stage itself scales by partition. */
  private val videoQ = Q(
    "q_multimodal_video",
    (s, d) =>
      Multimodal.decodeVideoTable(
          Multimodal.syntheticVideos(s, d).filter(col("doc_id") < 500))
        .orderBy("doc_id", "frame"),
    Some("""WITH fr AS (SELECT doc_id, ff.f AS frame,
        list_transform(range(0, 64), i -> (doc_id*31 + ff.f*97 + i*7) % 256) AS p
      FROM documents, (SELECT unnest(range(4)) AS f) ff
      WHERE doc_id < 500)
      SELECT doc_id, CAST(frame AS BIGINT) AS frame,
        CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        CAST(list_reduce(p, (a, b) -> a + b) AS BIGINT) AS px_sum,
        CAST(list_reduce(p, (a, b) -> least(a, b)) AS BIGINT) AS px_min,
        CAST(list_reduce(p, (a, b) -> greatest(a, b)) AS BIGINT) AS px_max
      FROM fr ORDER BY doc_id, frame"""))

  /** Media dedup over DECODED CONTENT — the cross-modal composition the
    * north star asks for: real PNG decode -> pixel-domain fingerprint ->
    * exact-dup keep-list by content (not by bytes: two encodings of the
    * same pixels dedup together). The synthetic pixel formula makes image
    * content a function of doc_id % 256, so the oracle derives the same
    * keep-list INDEPENDENTLY of the codec path — decode, fingerprint, or
    * grouping drift all mismatch. Scale shape: decode is narrow, the
    * keep-list is one groupBy on the fingerprint (hash-sized shuffle,
    * never pixels). */
  private val mediaDedup = Q(
    "q_multimodal_dedup",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("frame_fp")
      Multimodal.decodeImageTable(Multimodal.syntheticImages(s, d))
        .select(col("doc_id"), col("frame_fp"))
        .withColumn("canonical_id", min("doc_id").over(w))
        .withColumn("is_dup", col("canonical_id") < col("doc_id"))
        .select("doc_id", "canonical_id", "is_dup")
        .orderBy("doc_id")
    },
    Some("""SELECT doc_id,
        min(doc_id) OVER (PARTITION BY doc_id % 256) AS canonical_id,
        min(doc_id) OVER (PARTITION BY doc_id % 256) < doc_id AS is_dup
      FROM documents ORDER BY doc_id"""))

  /** MP3 frame-header metadata — the smallest useful slice of the
    * compressed-codec boundary (STATUS.md): bitrate/samplerate/frame-count/
    * duration from a pure-JVM frame walk over real MPEG-1 Layer III sync
    * headers and spec frame sizes, no PCM decode (the JDK ships no MP3
    * codec — full decode stays documented out of scope). The synthetic
    * frames derive every field from doc_id formulas, so the oracle
    * recomputes the metadata INDEPENDENTLY of the parser: a sync slip,
    * bitrate-table error, or frame-size miscalculation mismatches
    * everything. Same batched-mapPartitions scale shape as the other
    * decode tables. */
  private val mp3MetaQ = Q(
    "q_multimodal_mp3_meta",
    (s, d) =>
      Multimodal.mp3MetaTable(Multimodal.syntheticMp3s(s, d))
        .orderBy("doc_id"),
    Some("""WITH br AS (SELECT list_value(32,40,48,56,64,80,96,112,128,160,192,224,256,320) AS t),
        sr AS (SELECT list_value(44100,48000,32000) AS t),
        m AS (SELECT doc_id,
                CAST(doc_id % 4 + 1 AS BIGINT) AS n_frames,
                CAST(br.t[CAST(doc_id % 14 + 1 AS INT)] AS BIGINT) AS bitrate_kbps,
                CAST(sr.t[CAST(doc_id % 3 + 1 AS INT)] AS BIGINT) AS sample_rate
              FROM documents, br, sr)
      SELECT doc_id, n_frames, bitrate_kbps, sample_rate,
             n_frames * 1152 * 1000 // sample_rate AS duration_ms
      FROM m ORDER BY doc_id"""))

  /** REAL resize path: PNG decode -> 2-D nearest-neighbor 8x8 -> 4x4 in the
    * pixel domain (output pixel (r, c) samples source (2r, 2c)) -> exact
    * integer stats + the stride-7 rolling fingerprint over the RESIZED
    * buffer — the tensor-shaping stage every image training pipeline runs
    * before batching. The oracle recomputes the resized pixels from the
    * generator formula, so a decode slip, an index-math off-by-one, or a
    * fingerprint drift each mismatches every row. */
  private val resizeQ = Q(
    "q_multimodal_resize",
    (s, d) =>
      Multimodal.resizeImageTable(Multimodal.syntheticImages(s, d), 4, 4)
        .orderBy("doc_id"),
    Some("""WITH rp AS (SELECT doc_id,
        list_transform(range(0, 16),
          k -> (doc_id*31 + ((k // 4)*16 + (k % 4)*2)*7) % 256) AS q
      FROM documents),
      fp AS (SELECT doc_id, q,
        list_reduce(list_prepend(1125899906842597::HUGEINT,
            list_transform(range(0, 3), k -> CAST(q[CAST(k*7 + 1 AS INT)] AS HUGEINT))),
          (acc, x) -> (acc*31 + x) % 18446744073709551616::HUGEINT) AS fp_u
      FROM rp)
      SELECT doc_id, CAST(4 AS BIGINT) AS width, CAST(4 AS BIGINT) AS height,
        CAST(list_sum(q) AS BIGINT) AS px_sum,
        CAST(list_min(q) AS BIGINT) AS px_min,
        CAST(list_max(q) AS BIGINT) AS px_max,
        CASE WHEN fp_u >= 9223372036854775808::HUGEINT
             THEN CAST(fp_u - 18446744073709551616::HUGEINT AS BIGINT)
             ELSE CAST(fp_u AS BIGINT) END AS resize_fp
      FROM fp ORDER BY doc_id"""))

  /** Perceptual near-dup over image content (the LAION-scale image dedup
    * step): real PNG decode -> integer DCT pHash (operators.Multimodal.
    * phash8 — 63 AC coefficients thresholded at their 32nd-smallest value,
    * packed as two 32-bit words) -> group by hash. The corpus is
    * brightness-shifted replicas (`syntheticImagesNoisy`): same pattern
    * class, different bytes — so `q_multimodal_dedup`'s exact fingerprint
    * CANNOT pair them, while the pHash groups them exactly (the rounded
    * DCT basis's non-DC rows sum to zero, making every AC coefficient
    * bit-invariant under uniform shift). The oracle recomputes pixels from
    * the generator formula and replays the identical DCT/threshold/pack
    * integer math. Scale shape: decode+hash is narrow; the only shuffle is
    * the 16-byte hash key — pixels never leave their partition; past
    * identical-hash grouping, Hamming-radius pairing would reuse the
    * banded equi-join the binary ANN family already pins. */
  private val phashQ = Q(
    "q_multimodal_phash",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("w0", "w1")
      Multimodal.phashTable(Multimodal.syntheticImagesNoisy(s, d))
        .withColumn("canonical_id", min("doc_id").over(w))
        .withColumn("is_dup", col("canonical_id") < col("doc_id"))
        .select("doc_id", "w0", "w1", "canonical_id", "is_dup")
        .orderBy("doc_id")
    },
    Some("""WITH wm AS (SELECT list_value(
        64,64,64,64,64,64,64,64,
        63,53,36,12,-12,-36,-53,-63,
        59,24,-24,-59,-59,-24,24,59,
        53,-12,-63,-36,36,63,12,-53,
        45,-45,-45,45,45,-45,-45,45,
        36,-63,12,53,-53,-12,63,-36,
        24,-59,59,-24,-24,59,-59,24,
        12,-36,53,-63,63,-53,36,-12) AS W),
      px AS (SELECT doc_id, list_transform(range(0, 64),
               i -> ((doc_id % 256) * 2654435761 + i * (2 * (doc_id % 256) + 7)
                     + i * i * ((doc_id % 256) % 13 + 1)) % 250
                    + 3 + ((doc_id // 256) % 5 - 2)) AS p
             FROM documents),
      acs AS (SELECT doc_id, list_transform(range(1, 64), c ->
                CAST(list_sum(list_transform(range(0, 64), i ->
                  W[CAST((c//8)*8 + (i//8) + 1 AS INT)]
                    * W[CAST((c%8)*8 + (i%8) + 1 AS INT)]
                    * p[CAST(i + 1 AS INT)])) AS BIGINT)) AS ac
              FROM px, wm),
      th AS (SELECT doc_id, ac, list_sort(ac)[32] AS thr FROM acs),
      hw AS (SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 32), j ->
                 CASE WHEN ac[CAST(j + 1 AS INT)] > thr
                      THEN (1::BIGINT << CAST(j AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS w0,
               CAST(list_sum(list_transform(range(32, 63), j ->
                 CASE WHEN ac[CAST(j + 1 AS INT)] > thr
                      THEN (1::BIGINT << CAST(j - 32 AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS w1
             FROM th)
      SELECT doc_id, w0, w1,
             min(doc_id) OVER (PARTITION BY w0, w1) AS canonical_id,
             min(doc_id) OVER (PARTITION BY w0, w1) < doc_id AS is_dup
      FROM hw ORDER BY doc_id"""))

  /** Scene-cut detection — the shot-boundary segmentation step a video
    * training pipeline runs before frame sampling (sample per scene, not
    * per fixed stride). Real GIF decode -> per-frame pixel vectors -> a
    * WINDOW over frames per video: SAD against the previous frame
    * (zip_with + abs fold, all integer), cut where SAD clears the
    * threshold, scene id as the running cut count. The synthetic corpus
    * plants one hard cut per video at frame 3 + doc_id % 3 (within-scene
    * motion SAD 64, cross-cut ≈ 6400), and the oracle recomputes
    * everything from the pixel formula — decode drift, window-order drift,
    * or SAD math each mismatch. Scale shape: decode is narrow; the window
    * partitions by video id over bounded frames-per-video (at 100 TB the
    * key widens to (video, chunk) with chunk-boundary frames duplicated —
    * same plan, no global sort). */
  private val scenesQ = Q(
    "q_multimodal_scenes",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id").orderBy("frame")
      Multimodal.videoFramesTable(Multimodal.syntheticVideosScenes(s, d))
        .withColumn("prev", lag("p", 1).over(w))
        .withColumn("sad",
          // codegen'd L1 kernel (r19): the zip_with+aggregate fold
          // interpreted a lambda per pixel per frame (bit-parity pinned in
          // FunctionsSpec)
          when(col("prev").isNull, lit(0L)).otherwise(
            graft.functions.VectorFunctions.l1Dist(col("p"), col("prev"))))
        .withColumn("is_cut", col("sad") > 1000)
        .withColumn("scene_id",
          sum(when(col("sad") > 1000, 1L).otherwise(0L)).over(w))
        .select("doc_id", "frame", "sad", "is_cut", "scene_id")
        .orderBy("doc_id", "frame")
    },
    Some("""WITH fr AS (SELECT doc_id, ff.f AS frame,
        list_transform(range(0, 64),
          i -> (doc_id*37 + CASE WHEN ff.f >= 3 + doc_id % 3 THEN 97 ELSE 0 END + i*11)
               % 200 + 20 + ff.f) AS p
      FROM documents, (SELECT unnest(range(8)) AS f) ff),
      lg AS (SELECT doc_id, frame, p,
               lag(p) OVER (PARTITION BY doc_id ORDER BY frame) AS prev
             FROM fr),
      sd AS (SELECT doc_id, frame,
               CASE WHEN prev IS NULL THEN 0
                    ELSE CAST(list_sum(list_transform(range(0, 64),
                      i -> abs(p[CAST(i + 1 AS INT)] - prev[CAST(i + 1 AS INT)]))) AS BIGINT)
               END AS sad
             FROM lg)
      SELECT doc_id, CAST(frame AS BIGINT) AS frame, sad, sad > 1000 AS is_cut,
             CAST(sum(CASE WHEN sad > 1000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY frame) AS BIGINT) AS scene_id
      FROM sd ORDER BY doc_id, frame"""))

  /** Hamming-RADIUS perceptual near-dup — the full LAION-dedup shape:
    * `q_multimodal_phash` groups identical hashes; this pairs images
    * within Hamming distance 3, which a non-uniform perturbation (the
    * dithered corpus) demands — 18 of the 244 planted pairs sit at
    * distance 1-2 where identical-hash grouping goes blind. Candidates
    * meet through the 4-band pigeonhole equi-join (63 bits as 16/16/16/15
    * bands; <= 3 flips leave >= 1 band untouched — guaranteed recall, the
    * same device as the text MinHash banding), then an exact integer
    * popcount verifies. Scale shape: 4 band rows per image join on the
    * band value — never a pair enumeration; verification touches only
    * candidates; pixels never shuffle. The oracle replays pixel formula ->
    * DCT -> bands -> join -> popcount in full. */
  /** JPEG ingestion — the codec real crawls arrive in (LAION is
    * overwhelmingly JPEG; the JDK ships a JPEG ImageIO plugin next to the
    * PNG one): the corpus re-encoded at quality 95, decoded back, and
    * checked against DECODE-TOLERANT invariants rather than exact pixels
    * (a lossy codec makes exact-pixel oracles impossible by construction):
    * every image decodes, dimensions survive the container round-trip, and
    * >= 95% of perceptual hashes stay within the scrub radius (3 bits) of
    * their lossless PNG twin's — the measured stability the mixed-codec
    * scrub (MultimodalSpec) leans on; the tail is order-statistic
    * threshold fragility on single-block 8x8 sources, documented there.
    * The oracle predicts the invariants from the corpus alone (count, 8x8,
    * true) — the engine-independent shape of a lossy-codec check. Scale:
    * decode+hash narrow, one corpus-count aggregate; the PNG-side hashes
    * ride the same scan shape as `q_multimodal_phash`. */
  private val jpegQ = Q(
    "q_multimodal_jpeg",
    (s, d) => {
      val png = Multimodal.phashTable(Multimodal.syntheticImagesNoisy(s, d))
        .select(col("doc_id"), col("w0").as("p0"), col("w1").as("p1"))
      val jpegs = Multimodal.syntheticImagesJpeg(s, d)
      Multimodal.decodeImageTable(jpegs)
        .select("doc_id", "width", "height")
        .join(Multimodal.phashTable(jpegs), "doc_id")
        .join(png, "doc_id")
        .agg(
          count(lit(1)).as("n_images"),
          min("width").as("w_min"), max("width").as("w_max"),
          min("height").as("h_min"), max("height").as("h_max"),
          (sum(when(
            expr("bit_count(w0 ^ p0) + bit_count(w1 ^ p1)") <= 3, 1L).otherwise(0L))
            * 100 >= count(lit(1)) * 95).as("phash_stable_95pct"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS n_images,
        CAST(8 AS BIGINT) AS w_min, CAST(8 AS BIGINT) AS w_max,
        CAST(8 AS BIGINT) AS h_min, CAST(8 AS BIGINT) AS h_max,
        true AS phash_stable_95pct
      FROM documents"""))

  private val phashRadiusQ = Q(
    "q_multimodal_phash_radius",
    (s, d) => {
      val ph = Multimodal.phashTable(Multimodal.syntheticImagesDithered(s, d)).cache()
      val bands = ph.select(col("doc_id"), col("w0"), col("w1"),
        explode(array(
          struct(lit(0L).as("b"), (col("w0") % 65536L).as("v")),
          struct(lit(1L).as("b"), expr("w0 div 65536").as("v")),
          struct(lit(2L).as("b"), (col("w1") % 65536L).as("v")),
          struct(lit(3L).as("b"), expr("w1 div 65536").as("v")))).as("band"))
        .select(col("doc_id"), col("w0"), col("w1"),
          col("band.b").as("b"), col("band.v").as("v"))
      val pairs = bands.as("x").join(bands.as("y"),
          col("x.b") === col("y.b") && col("x.v") === col("y.v") &&
            col("x.doc_id") =!= col("y.doc_id"))
        .select(
          col("x.doc_id").as("doc_id"), col("y.doc_id").as("nbr"),
          col("x.w0").as("a0"), col("x.w1").as("a1"),
          col("y.w0").as("b0"), col("y.w1").as("b1"))
        .distinct()
        .withColumn("hd", expr("bit_count(a0 ^ b0) + bit_count(a1 ^ b1)"))
        .filter(col("hd") <= 3)
      ph.join(pairs.groupBy("doc_id")
          .agg(count(lit(1)).as("n_neighbors"), min("nbr").as("min_nbr")),
          Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("w0"), col("w1"),
          coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
          least(col("doc_id"), coalesce(col("min_nbr"), col("doc_id"))).as("canonical_id"))
        .orderBy("doc_id")
    },
    Some("""WITH wm AS (SELECT list_value(
        64,64,64,64,64,64,64,64,
        63,53,36,12,-12,-36,-53,-63,
        59,24,-24,-59,-59,-24,24,59,
        53,-12,-63,-36,36,63,12,-53,
        45,-45,-45,45,45,-45,-45,45,
        36,-63,12,53,-53,-12,63,-36,
        24,-59,59,-24,-24,59,-59,24,
        12,-36,53,-63,63,-53,36,-12) AS W),
      px AS (SELECT doc_id, list_transform(range(0, 64),
               i -> ((doc_id % 256) * 2654435761 + i * (2 * (doc_id % 256) + 7)
                     + i * i * ((doc_id % 256) % 13 + 1)) % 244
                    + 6 + ((doc_id // 256) % 5 - 2)
                    + CASE WHEN doc_id >= 256
                           THEN CASE WHEN i % 2 = 0 THEN 1 ELSE -1 END ELSE 0 END) AS p
             FROM documents),
      acs AS (SELECT doc_id, list_transform(range(1, 64), c ->
                CAST(list_sum(list_transform(range(0, 64), i ->
                  W[CAST((c//8)*8 + (i//8) + 1 AS INT)]
                    * W[CAST((c%8)*8 + (i%8) + 1 AS INT)]
                    * p[CAST(i + 1 AS INT)])) AS BIGINT)) AS ac
              FROM px, wm),
      th AS (SELECT doc_id, ac, list_sort(ac)[32] AS thr FROM acs),
      hw AS (SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 32), j ->
                 CASE WHEN ac[CAST(j + 1 AS INT)] > thr
                      THEN (1::BIGINT << CAST(j AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS w0,
               CAST(list_sum(list_transform(range(32, 63), j ->
                 CASE WHEN ac[CAST(j + 1 AS INT)] > thr
                      THEN (1::BIGINT << CAST(j - 32 AS INT)) ELSE 0::BIGINT END)) AS BIGINT) AS w1
             FROM th),
      bands AS (SELECT doc_id, w0, w1, b,
                  CASE b WHEN 0 THEN w0 % 65536 WHEN 1 THEN w0 // 65536
                         WHEN 2 THEN w1 % 65536 ELSE w1 // 65536 END AS v
                FROM hw, LATERAL unnest(range(0, 4)) t(b)),
      cand AS (SELECT DISTINCT x.doc_id AS doc_id, y.doc_id AS nbr,
                 x.w0 AS a0, x.w1 AS a1, y.w0 AS b0, y.w1 AS b1
               FROM bands x JOIN bands y
                 ON x.b = y.b AND x.v = y.v AND x.doc_id <> y.doc_id),
      nb AS (SELECT doc_id, count(*) AS n_neighbors, min(nbr) AS min_nbr
             FROM cand
             WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1)) <= 3
             GROUP BY doc_id)
      SELECT h.doc_id, h.w0, h.w1,
             coalesce(nb.n_neighbors, 0) AS n_neighbors,
             least(h.doc_id, coalesce(nb.min_nbr, h.doc_id)) AS canonical_id
      FROM hw h LEFT JOIN nb ON h.doc_id = nb.doc_id
      ORDER BY h.doc_id"""))

  /** Audio near-dup over gain-scaled recordings — the audio leg of the
    * perceptual-dedup family (pHash covers images, scene SAD covers
    * video): real WAV decode -> energy-order fingerprint
    * (operators.Multimodal.audioFingerprint — 29 sign-of-delta bits over
    * 16 window energies, exactly gain-invariant) -> keep-first grouping.
    * The corpus plays each base waveform at gains 1/2/3: byte-level and
    * sample-level dedup both miss the replicas; the fingerprint pairs
    * them exactly, and the oracle recomputes everything from the sample
    * formula. Scale shape: decode + fingerprint are narrow; only the
    * 8-byte fingerprint shuffles. */
  private val audioDedup = Q(
    "q_multimodal_audio_dedup",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("afp")
      Multimodal.audioFingerprintTable(Multimodal.syntheticWavsGained(s, d))
        .withColumn("canonical_id", min("doc_id").over(w))
        .withColumn("is_dup", col("canonical_id") < col("doc_id"))
        .select("doc_id", "afp", "canonical_id", "is_dup")
        .orderBy("doc_id")
    },
    Some("""WITH sm AS (SELECT doc_id, list_transform(range(0, 64),
               i -> (((doc_id % 256) * 2654435761
                      + i * (2 * (doc_id % 256) + 7) * 113
                      + i * i * ((doc_id % 256) % 13 + 1) * 29) % 16001 - 8000)
                    * ((doc_id // 256) % 3 + 1)) AS s
             FROM documents),
      en AS (SELECT doc_id, list_transform(range(0, 16), w ->
               CAST(list_sum(list_transform(range(0, 4), j ->
                 s[CAST(w*4 + j + 1 AS INT)] * s[CAST(w*4 + j + 1 AS INT)])) AS BIGINT)) AS e
             FROM sm),
      fp AS (SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 15), w ->
                   CASE WHEN e[CAST(w + 1 AS INT)] > e[CAST(w + 2 AS INT)]
                        THEN (1::BIGINT << CAST(w AS INT)) ELSE 0::BIGINT END))
                 + list_sum(list_transform(range(0, 14), w ->
                   CASE WHEN e[CAST(w + 1 AS INT)] > e[CAST(w + 3 AS INT)]
                        THEN (1::BIGINT << CAST(w + 15 AS INT)) ELSE 0::BIGINT END))
                 AS BIGINT) AS afp
             FROM en)
      SELECT doc_id, afp,
             min(doc_id) OVER (PARTITION BY afp) AS canonical_id,
             min(doc_id) OVER (PARTITION BY afp) < doc_id AS is_dup
      FROM fp ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(features, frames, decodeQ, audioQ, videoQ, mediaDedup, mp3MetaQ,
    resizeQ, phashQ, scenesQ, phashRadiusQ, audioDedup, jpegQ)
}
