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

  /** Frame-sampling stub shape: deterministic rolling fingerprint over the
    * sampled "frames" — rows-only here, determinism pinned in MultimodalSpec. */
  private val frames = Q(
    "q_multimodal_frames",
    (s, d) =>
      Multimodal.processMedia(Multimodal.documentsAsMedia(s, d))
        .select(col("doc_id"), col("frame_fingerprint"))
        .orderBy("doc_id"),
    None)

  val all: Seq[Q] = Seq(features, frames)
}
