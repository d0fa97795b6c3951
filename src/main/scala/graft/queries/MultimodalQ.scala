package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.Multimodal
import Tables._

/** Multimodal pipeline queries: opaque binary payloads → typed
  * per-partition decode (stubbed codec, real plumbing) → relational
  * aggregation. See [[graft.functions.Multimodal]].
  */
object MultimodalQ {

  val defs: Seq[QueryDef] = Seq(
    // Feature extraction then per-type profile. Decode is the stub
    // codec → no DuckDB oracle (rows-only check); MultimodalSpec pins
    // the exact values.
    QueryDef("mm_feature_profile",
      (s, dir) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.blobsFromDocuments(s, dir))
        feats.groupBy("mediaType")
          .agg(count(lit(1)).as("n"),
            sum("nBytes").as("total_bytes"),
            min("width").as("min_w"), max("width").as("max_w"))
          .orderBy("mediaType")
      },
      // The stub decode's width formula is integer arithmetic over the
      // first utf-8 byte → expressible in SQL (the texts are ASCII).
      Some("""SELECT media_type AS "mediaType", COUNT(*) AS n,
          CAST(SUM(n_bytes) AS BIGINT) AS total_bytes, MIN(w) AS min_w, MAX(w) AS max_w
        FROM (
          SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                      WHEN doc_id % 3 = 1 THEN 'audio'
                      ELSE 'video' END AS media_type,
            octet_length(encode(text)) AS n_bytes,
            64 + (CASE WHEN length(text) = 0 THEN 0
                       ELSE ascii(substr(text, 1, 1)) % 192 END) AS w
          FROM documents) q
        GROUP BY media_type ORDER BY "mediaType" """)),

    // Frame sampling: row-expansion (flatMap) then dedup of frames by
    // content hash — the video half of the pipeline.
    QueryDef("mm_frame_dedup",
      (s, dir) => {
        val videos = Multimodal.blobsFromDocuments(s, dir)
          .filter(col("mediaType") === "video")
        val frames = Multimodal.sampleFrames(videos, 4)
        frames.agg(count(lit(1)).as("n_frames"),
          countDistinct(col("frameHash")).as("n_unique_frames"))
      },
      None),

    // Binary metadata profile is SQL-expressible → full oracle.
    QueryDef("mm_bytes_by_type",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          length(col("text").cast("binary")).as("n_bytes"))
        .groupBy("media_type")
        .agg(count(lit(1)).as("n"), sum("n_bytes").as("total_bytes"))
        .orderBy("media_type"),
      Some("""SELECT media_type, COUNT(*) AS n, CAST(SUM(n_bytes) AS BIGINT) AS total_bytes
        FROM (SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                          WHEN doc_id % 3 = 1 THEN 'audio'
                          ELSE 'video' END AS media_type,
                     octet_length(encode(text)) AS n_bytes
              FROM documents) q
        GROUP BY media_type ORDER BY media_type"""))
  )
}
