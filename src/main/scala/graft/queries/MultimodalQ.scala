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
    // content hash — the video half of the pipeline. The frame hash is
    // the first 60 bits of md5 over the frame's byte range, so DuckDB
    // reproduces it from the same (ASCII) source bytes.
    QueryDef("mm_frame_dedup",
      (s, dir) => {
        val videos = Multimodal.blobsFromDocuments(s, dir)
          .filter(col("mediaType") === "video")
        val frames = Multimodal.sampleFrames(videos, 4)
        frames.agg(count(lit(1)).as("n_frames"),
          countDistinct(col("frameHash")).as("n_unique_frames"))
      },
      Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
          CAST(COUNT(DISTINCT fh) AS BIGINT) AS n_unique_frames
        FROM (
          SELECT CAST('0x' || substr(md5(substr(text, st + 1, fl)), 1, 15)
                   AS BIGINT) AS fh
          FROM (
            SELECT text, ((n * f) // 4) AS st,
              least(n, ((n * f) // 4) + greatest(1, n // 4)) - ((n * f) // 4)
                AS fl
            FROM (SELECT text, octet_length(encode(text)) AS n
                  FROM documents WHERE doc_id % 3 = 2) d
            CROSS JOIN (SELECT unnest(range(0, 4)) AS f) fr) q) z""")),

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
