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

    // Resize/batch-shape planning — the preprocessing step before
    // batched image inference: fit each decoded image's long side to
    // 224 preserving aspect (integer math end-to-end), then bucket
    // assets by identical TARGET shape so the inference runner knows
    // its batch shapes and per-bucket volume. Scale shape: the decode
    // is the same map-only per-partition pass as mm_feature_profile
    // (no shuffle, scan parallelism); the rollup shuffles only the
    // (tw, th) bucket keys — a bounded enum (both sides <= 224).
    // The stub decode's dims are integer functions of the first two
    // bytes, so DuckDB replays the whole plan bit-exactly.
    QueryDef("mm_resize_plan",
      (s, dir) => {
        val feats = Multimodal.extractFeatures(
          Multimodal.blobsFromDocuments(s, dir))
          .filter(col("mediaType") === "image")
        feats.selectExpr(
            "CAST(CASE WHEN width >= height THEN 224 ELSE " +
              "(CAST(width AS BIGINT) * 224) DIV height END AS INT) AS tw",
            "CAST(CASE WHEN height >= width THEN 224 ELSE " +
              "(CAST(height AS BIGINT) * 224) DIV width END AS INT) AS th",
            "width", "height")
          .groupBy("tw", "th")
          .agg(count(lit(1)).as("n_assets"),
            sum(expr("CAST(width AS BIGINT) * height"))
              .as("sum_src_pixels"))
          .orderBy("tw", "th")
      },
      Some("""WITH img AS (
          SELECT 64 + (CASE WHEN length(text) = 0 THEN 0
                       ELSE ascii(substr(text, 1, 1)) % 192 END) AS w,
                 64 + (CASE WHEN length(text) < 2 THEN 0
                       ELSE ascii(substr(text, 2, 1)) % 128 END) AS h
          FROM documents WHERE doc_id % 3 = 0),
        pl AS (
          SELECT CASE WHEN w >= h THEN 224 ELSE (w * 224) // h END AS tw,
                 CASE WHEN h >= w THEN 224 ELSE (h * 224) // w END AS th,
                 w, h FROM img)
        SELECT tw, th, COUNT(*) AS n_assets,
          CAST(SUM(CAST(w AS BIGINT) * h) AS BIGINT) AS sum_src_pixels
        FROM pl GROUP BY tw, th ORDER BY tw, th""")),

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
