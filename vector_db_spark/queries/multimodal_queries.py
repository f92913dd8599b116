"""Multimodal query family: binary media columns processed through
Arrow-batched mapInPandas stages (operators/multimodal.py).

The SYNTH codec's pixel/sample law is pure integer arithmetic, so every
query here has a value-exact DuckDB oracle — the binary encode →
mapInPandas decode → NumPy feature path is verified end to end, not just
schema-checked. The oracles re-derive the pixels with generate_series and
must use the same K/P/Q constants as the codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vector_db_spark.operators.multimodal import (
    attach_audio,
    attach_images,
    attach_videos,
    audio_features,
    image_features,
    resize_images,
    sample_frames,
)
from vector_db_spark.queries.registry import query
from vector_db_spark.sources.fixtures import load_table

N_DOCS = 50  # doc_id < 50 keeps the oracle's generate_series fan-out small


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < N_DOCS)


_IMAGE_ORACLE = """
WITH px AS (
  SELECT doc_id, unnest(generate_series(0, 767)) AS i
  FROM documents WHERE doc_id < 50
),
vals AS (
  SELECT doc_id, (doc_id*2654435761 + i*40503) % 256 AS v FROM px
)
SELECT doc_id AS media_id,
       16 AS width, 16 AS height,
       round(CAST(sum(v) AS DOUBLE)/768, 6) AS mean_px,
       round(CAST(sum(v*v) AS DOUBLE)/768
             - (CAST(sum(v) AS DOUBLE)/768)*(CAST(sum(v) AS DOUBLE)/768), 6) AS var_px,
       CAST(min(v) AS INT) AS min_px,
       CAST(max(v) AS INT) AS max_px
FROM vals GROUP BY doc_id
"""


@query("multimodal_image_features", oracle=_IMAGE_ORACLE)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_images(_docs(spark, sf_dir), width=16, height=16, channels=3)
    feats = image_features(media)
    return feats.select(
        "media_id",
        "width",
        "height",
        F.round("mean_px", 6).alias("mean_px"),
        F.round("var_px", 6).alias("var_px"),
        "min_px",
        "max_px",
    )


# Resize 16x16 -> 5x5 (deliberately non-divisible): output pixel i maps to
# source index ((y*16)//5*16 + (x*16)//5)*3 + ch with y=i//15, x=(i%15)//3,
# ch=i%3 — the same nearest-neighbor law as resize_images.
_RESIZE_ORACLE = """
WITH px AS (
  SELECT doc_id, unnest(generate_series(0, 74)) AS i
  FROM documents WHERE doc_id < 50
),
mapped AS (
  SELECT doc_id,
         ((((i//15)*16)//5)*16 + ((((i%15)//3)*16)//5))*3 + (i%3) AS src
  FROM px
),
vals AS (
  SELECT doc_id, (doc_id*2654435761 + src*40503) % 256 AS v FROM mapped
)
SELECT doc_id AS media_id,
       5 AS width, 5 AS height,
       round(CAST(sum(v) AS DOUBLE)/75, 6) AS mean_px
FROM vals GROUP BY doc_id
"""


@query("multimodal_resize", oracle=_RESIZE_ORACLE)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_images(_docs(spark, sf_dir), width=16, height=16, channels=3)
    resized = resize_images(media, new_w=5, new_h=5)
    feats = image_features(resized)
    return feats.select(
        "media_id", "width", "height", F.round("mean_px", 6).alias("mean_px")
    )


# Video 8x8x3, 12 frames, sample every 4th -> frames 0,4,8.
_FRAMES_ORACLE = """
WITH f AS (
  SELECT doc_id, unnest([0, 4, 8]) AS frame
  FROM documents WHERE doc_id < 50
),
px AS (
  SELECT doc_id, frame, unnest(generate_series(0, 191)) AS i FROM f
),
vals AS (
  SELECT doc_id, frame,
         (doc_id*2654435761 + frame*97003 + i*40503) % 256 AS v
  FROM px
)
SELECT doc_id AS media_id, CAST(frame AS INT) AS frame,
       round(CAST(sum(v) AS DOUBLE)/192, 6) AS mean_px
FROM vals GROUP BY doc_id, frame
"""


@query("multimodal_frame_sample", oracle=_FRAMES_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    vids = attach_videos(
        _docs(spark, sf_dir), width=8, height=8, channels=3, n_frames=12
    )
    frames = sample_frames(vids, every=4)
    return frames.select(
        "media_id", "frame", F.round("mean_px", 6).alias("mean_px")
    )


_AUDIO_ORACLE = """
WITH px AS (
  SELECT doc_id, unnest(generate_series(0, 2047)) AS i
  FROM documents WHERE doc_id < 50
),
s AS (
  SELECT doc_id, i,
         ((doc_id*2654435761 + i*40503) % 65536) - 32768 AS v
  FROM px
),
flips AS (
  SELECT doc_id,
         CASE WHEN (v >= 0) <> lag(v >= 0)
                OVER (PARTITION BY doc_id ORDER BY i)
              THEN 1 ELSE 0 END AS flip
  FROM s
),
agg AS (
  SELECT doc_id, CAST(sum(v*v) AS DOUBLE) AS ss FROM s GROUP BY doc_id
),
zagg AS (
  SELECT doc_id, CAST(sum(flip) AS BIGINT) AS zc FROM flips GROUP BY doc_id
)
SELECT a.doc_id AS media_id,
       16000 AS sample_rate, 2048 AS n_samples,
       round(sqrt(a.ss/2048), 6) AS rms,
       z.zc AS zero_crossings
FROM agg a JOIN zagg z ON a.doc_id = z.doc_id
"""


@query("multimodal_audio_features", oracle=_AUDIO_ORACLE)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = attach_audio(_docs(spark, sf_dir), sample_rate=16000, n_samples=2048)
    feats = audio_features(media)
    return feats.select(
        "media_id",
        "sample_rate",
        "n_samples",
        F.round("rms", 6).alias("rms"),
        "zero_crossings",
    )


_PHASH_NEARDUP_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 10
),
h AS (SELECT doc_id, md5(text) AS m FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(0 AS INTEGER) AS hamming
FROM h a JOIN h b ON a.m = b.m AND a.doc_id < b.doc_id
"""


@query("image_phash_neardup", oracle=_PHASH_NEARDUP_ORACLE)
def image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup end to end: content-seeded NOISE
    images (equal text ⇒ identical bytes; different text ⇒ independent
    frequency content — the linear SYNTH pixel law is deliberately NOT
    used here, see attach_noise_images), Arrow decode → 32×32 DCT →
    64-bit pHash, pigeonhole chunk blocking (shared with SimHash), exact
    popcount verify at ≤3 bits. The found pairs must be EXACTLY the
    equal-content pairs at distance 0: independent noise images sit ~32
    bits apart, so any blocking or hashing defect — a missed bucket, a
    nondeterministic DCT, a bit-packing slip — changes the result set.
    The oracle is the text-equality self-join."""
    from vector_db_spark.operators.multimodal import (
        attach_noise_images,
        image_neardup,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant 10 exact duplicates under shifted ids so the gate is
    # non-trivial at every scale factor (sf0.001/0.01 carry no natural
    # exact-text dups; the oracle plants the identical rows)
    docs = base.unionByName(
        base.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).withColumn("seed", F.xxhash64(F.col("text")))
    media = attach_noise_images(docs, id_col="doc_id", seed_col="seed")
    return image_neardup(media, max_hamming=3, chunks=4).select(
        "a_id", "b_id", "hamming"
    )


_AUDIO_FP_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 10
),
h AS (SELECT doc_id, md5(text) AS m FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(0 AS INTEGER) AS hamming
FROM h a JOIN h b ON a.m = b.m AND a.doc_id < b.doc_id
"""


@query("audio_fp_neardup", oracle=_AUDIO_FP_ORACLE)
def audio_fp_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio fingerprint dedup end to end (the image gate's acoustic
    twin): content-seeded noise clips + 10 planted exact dups →
    envelope-DCT 64-bit fingerprints → pigeonhole blocking → popcount
    verify. Found pairs must be exactly the equal-content pairs at
    distance 0; independent noise clips sit ~32 bits apart."""
    from vector_db_spark.operators.multimodal import (
        attach_noise_audio,
        audio_neardup,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = base.unionByName(
        base.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).withColumn("seed", F.xxhash64(F.col("text")))
    media = attach_noise_audio(docs, id_col="doc_id", seed_col="seed")
    return audio_neardup(media, max_hamming=3, chunks=4).select(
        "a_id", "b_id", "hamming"
    )


_VIDEO_PHASH_ORACLE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 10
),
h AS (SELECT doc_id, md5(text) AS m FROM corpus)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(3 AS BIGINT) AS matched_frames, CAST(3 AS BIGINT) AS total_frames
FROM h a JOIN h b ON a.m = b.m AND a.doc_id < b.doc_id
"""


@query("video_phash_neardup", oracle=_VIDEO_PHASH_ORACLE)
def video_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup: per-sampled-frame pHash (frames 0/4/8 of 12),
    frame-ALIGNED pigeonhole candidates, pair emitted when >= half the
    sampled frames match. Planted exact dups must match on all 3 sampled
    frames; independent noise videos share none. 200-doc slice keeps the
    per-frame DCT volume test-sized (the operator itself is one
    mapInPandas pass at any scale)."""
    from vector_db_spark.operators.multimodal import (
        attach_noise_videos,
        video_neardup,
    )

    base = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", "text")
    )
    docs = base.unionByName(
        base.filter(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 1000000).alias("doc_id"), "text"
        )
    ).withColumn("seed", F.xxhash64(F.col("text")))
    media = attach_noise_videos(docs, id_col="doc_id", seed_col="seed", width=32, height=32)
    return video_neardup(media, every=4, max_hamming=3, chunks=4)
