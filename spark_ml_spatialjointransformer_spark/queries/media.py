"""Query registry, media family — split from the single-module registry (r11);
see ``queries/_core.py`` for the registration machinery and shared helpers."""

from __future__ import annotations

from spark_ml_spatialjointransformer_spark.queries._core import (
    DataFrame,
    F,
    SparkSession,
    _register,
    h60_col,
    h60_sql,
    load_table,
)



_M1_ORACLE = f"""
WITH RECURSIVE seeds AS (
  SELECT doc_id,
         strlen(text) AS n_bytes,
         {h60_sql('text')} AS checksum
  FROM documents
),
s0 AS (SELECT doc_id,
              CAST(CASE WHEN checksum = 0 THEN 1 ELSE checksum END AS HUGEINT) AS st
       FROM seeds),
gen AS (
  -- 8-step 64-bit LCG (Knuth MMIX constants), HUGEINT avoids signed-64 overflow
  SELECT doc_id, 0 AS i,
         (st * 6364136223846793005 + 1442695040888963407) % 18446744073709551616 AS state
  FROM s0
  UNION ALL
  SELECT doc_id, i + 1,
         (state * 6364136223846793005 + 1442695040888963407) % 18446744073709551616
  FROM gen WHERE i < 7
),
feats AS (
  -- (state >> 11) / 2^53 * 2 - 1, rounded once to float32 like the kernel
  SELECT doc_id,
         CAST(CAST(state // 2048 AS DOUBLE) / 9007199254740992.0 * 2.0 - 1.0 AS FLOAT) AS f
  FROM gen
),
fs AS (SELECT doc_id, CAST(round(sum(CAST(f AS DOUBLE)) * 1000000) AS BIGINT) AS feat_sum_e6
       FROM feats GROUP BY doc_id)
SELECT s.doc_id, CAST(s.n_bytes AS INTEGER) AS n_bytes, s.checksum, fs.feat_sum_e6
FROM seeds s JOIN fs USING (doc_id)
"""


@_register("m1_media_features", _M1_ORACLE)
def m1_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: documents' bytes as stand-in binary
    payloads → typed metadata struct (JVM) → mapInPandas feature extraction.
    The md5-h60 checksum/seed + integer LCG kernel are replayed exactly by
    the DuckDB oracle's recursive CTE (the float32 features sum exactly in
    double — 8 values of ≤ 24-bit mantissa — so the sum is order-free);
    also verified against the python kernel in
    tests/test_multimodal_streaming.py."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        extract_features,
        with_media_meta,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    feat = extract_features(
        with_media_meta(docs, "content", "text/plain"), "content", dim=8
    )
    return feat.select(
        "doc_id",
        F.col("content_meta.n_bytes").alias("n_bytes"),
        F.col("content_meta.checksum").alias("checksum"),
        F.round(
            F.aggregate(
                F.col("features").cast("array<double>"),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("feat_sum_e6"),
    )


_M2_ORACLE = f"""
WITH c AS (SELECT doc_id, hex(encode(text)) AS hx,
                  octet_length(encode(text)) AS n
           FROM documents),
f AS (SELECT doc_id, hx,
             unnest(range(0, greatest(1, CAST(ceil(n / 256.0) AS BIGINT)), 2))
               AS frame_idx
      FROM c),
s AS (SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
             substring(hx, CAST(frame_idx * 512 + 1 AS BIGINT), 512) AS fh
      FROM f)
SELECT doc_id, frame_idx,
       CAST(length(fh) / 2 AS INTEGER) AS frame_len,
       {h60_sql('fh')} AS frame_h60
FROM s
"""


@_register("m2_frame_sampling", _M2_ORACLE)
def m2_frame_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal one-to-many frame sampling: the payload splits into
    256-byte "frames", keeping every 2nd (the keyframe-sampling shape —
    real decoders swap the chunker, the mapInPandas row-explosion plumbing
    is what's exercised).  Frames are verified by content: the oracle
    replays the byte chunking via hex-string slicing (2 hex chars/byte)
    and both engines h60 the SAME uppercase hex text of each frame."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("content")
    )
    frames = sample_frames(
        docs, "content", frame_bytes=256, stride=2, id_cols=("doc_id",)
    )
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.length("frame").cast("int").alias("frame_len"),
        h60_col(F.hex(F.col("frame"))).alias("frame_h60"),
    )


#: m3 geometry: synthesize 16×12 PPMs, nearest-neighbor resize to 7×5.
#: The oracle replays the integer pipeline from first principles: the
#: floor index map src=(dst*src_dim)//dst_dim picks pixels of the synth
#: pattern R=(3x+5y+id)%256 G=(x+2y)%256 B=(id+x·y)%256 — every term
#: integer, so the resized pixel sum is engine-exact.
_M3_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(7)) AS x1), yo AS (SELECT unnest(range(5)) AS y1),
m AS (SELECT doc_id, (x1 * 16) // 7 AS xs, (y1 * 12) // 5 AS ys
      FROM d CROSS JOIN xo CROSS JOIN yo),
p AS (SELECT doc_id,
             (3 * xs + 5 * ys + doc_id) % 256
             + (xs + 2 * ys) % 256
             + (doc_id + xs * ys) % 256 AS v
      FROM m)
SELECT doc_id, 7 AS out_w, 5 AS out_h, CAST(sum(v) AS BIGINT) AS pix_sum
FROM p GROUP BY doc_id
"""


@_register("m3_image_resize", _M3_ORACLE)
def m3_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image codec end-to-end: synthesize a deterministic 16×12 PPM
    per document, decode it (pure-numpy P6 parser), nearest-neighbor
    resize to 7×5 (odd targets exercise the floor index map), re-encode
    as PPM, decode AGAIN, and emit width/height/pixel-sum stats — the
    encode/decode round-trip plus resize arithmetic all checked against a
    from-first-principles SQL replay.  Scale shape: two mapInPandas
    passes over the scan, partition-preserving, no shuffle; binaries
    never leave the executor."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_stats,
        resize_images,
        synth_ppm_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    resized = resize_images(imgs, "img", width=7, height=5, out_col="small")
    stats = image_stats(resized, "small", prefix="s_")
    return stats.select(
        "doc_id",
        F.col("s_width").cast("int").alias("out_w"),
        F.col("s_height").cast("int").alias("out_h"),
        F.col("s_pix_sum").alias("pix_sum"),
    )


#: m4 waveform: sample t of doc ``id`` is ((id·7919 + t·M) mod 65536) −
#: 32768 with M = 2654435761 (Knuth's 2^32 golden-ratio constant; odd, so
#: t·M cycles all residues mod 65536).  Every term is integer BIGINT
#: arithmetic, so the decoded-waveform stats are engine-exact.
_M4_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
t AS (SELECT unnest(range(256)) AS t),
s AS (SELECT doc_id,
             ((doc_id * 7919 + t * 2654435761) % 65536) - 32768 AS v
      FROM d CROSS JOIN t)
SELECT doc_id, CAST(16000 AS INTEGER) AS sample_rate,
       CAST(256 AS INTEGER) AS n_samples,
       CAST(max(abs(v)) AS BIGINT) AS peak,
       CAST(sum(abs(v)) AS BIGINT) AS sum_abs,
       CAST(sum(v * v) AS BIGINT) AS energy
FROM s GROUP BY doc_id
"""


@_register("m4_audio_stats", _M4_ORACLE)
def m4_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec end-to-end: synthesize a deterministic 256-sample
    PCM16 waveform per document, encode it as a RIFF/WAVE file, decode it
    back (chunk-walking pure-struct parser — the audio twin of m3's image
    round-trip), and emit integer waveform stats (peak, Σ|a|, Σa²
    energy) checked against a from-first-principles SQL replay of the
    synth formula.  Scale shape: two chained mapInPandas passes over the
    scan, partition-preserving, zero shuffle; audio bytes never leave the
    executor — only the 5-column integer stats row continues downstream."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        audio_stats,
        synth_wav,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = synth_wav(docs, "doc_id", n_samples=256, sample_rate=16000)
    stats = audio_stats(wavs, "wav", prefix="a_")
    return stats.select(
        "doc_id",
        F.col("a_sample_rate").alias("sample_rate"),
        F.col("a_n_samples").alias("n_samples"),
        F.col("a_peak").alias("peak"),
        F.col("a_sum_abs").alias("sum_abs"),
        F.col("a_energy").alias("energy"),
    )


#: m5 replays the whole pipeline in integer SQL: the synth pattern
#: (3x+5y+id)%256 + (x+2y)%256 + (id+x·y)%256 gives each pixel's R+G+B
#: luminance, the resize floor-map picks source pixels, and the ahash bit
#: test is the exact cross-multiplication L·n ≥ ΣL (n=35 pixels) so no
#: float enters; bit k = y·7+x packs with an integer shift.  The synth
#: pattern repeats with period 256 in doc_id, so real duplicate clusters
#: exist wherever the corpus has ≥ 256 documents.
_M5_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(7)) AS x1), yo AS (SELECT unnest(range(5)) AS y1),
p AS (SELECT doc_id, y1 * 7 + x1 AS k,
             (3 * ((x1 * 16) // 7) + 5 * ((y1 * 12) // 5) + doc_id) % 256
             + ((x1 * 16) // 7 + 2 * ((y1 * 12) // 5)) % 256
             + (doc_id + ((x1 * 16) // 7) * ((y1 * 12) // 5)) % 256 AS v
      FROM d CROSS JOIN xo CROSS JOIN yo),
t AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tot FROM p GROUP BY doc_id),
h AS (SELECT p.doc_id,
             CAST(sum(CASE WHEN p.v * 35 >= t.tot
                           THEN CAST(1 AS BIGINT) << p.k
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
      FROM p JOIN t USING (doc_id) GROUP BY p.doc_id)
SELECT doc_id, ahash,
       min(doc_id) OVER (PARTITION BY ahash) AS keeper,
       doc_id != min(doc_id) OVER (PARTITION BY ahash) AS is_dup
FROM h
"""


@_register("m5_image_phash_dedup", _M5_ORACLE)
def m5_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual-hash dedup — the multimodal twin of t2's exact
    text dedup: synthesize a 16×12 PPM per document, thumbnail it to 7×5
    (the resize IS ahash's low-pass filter), average-hash the thumbnail
    into an int64 (one bit per pixel, set iff luminance ≥ image mean,
    computed as the exact cross-multiplication L·35 ≥ ΣL), then assign
    every document a keeper = min doc_id within its hash cluster.  Scale
    shape: three chained mapInPandas passes over the scan (synth, resize,
    hash — partition-preserving, binaries never shuffle), then ONE
    exchange on the 8-byte hash; at 100 TB only (doc_id, ahash) pairs
    move, exactly like text-fingerprint dedup."""
    from pyspark.sql import Window

    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_ahash,
        resize_images,
        synth_ppm_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    thumbs = resize_images(imgs, "img", width=7, height=5, out_col="thumb")
    hashed = image_ahash(thumbs, "thumb", out_col="ahash")
    w = Window.partitionBy("ahash")
    return (
        hashed.select("doc_id", "ahash")
        .withColumn("keeper", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper"))
    )


#: m6 replays the synth waveform ((id·7919 + t·M) mod 65536) − 32768,
#: windows Σ|a| into 8 buckets of 32 samples, and sets bit w iff
#: e_w·8 ≥ Σe — every term a non-negative integer, so the fingerprint is
#: engine-exact bit-for-bit.
_M6_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
t AS (SELECT unnest(range(256)) AS t),
s AS (SELECT doc_id, t // 32 AS w,
             abs(((doc_id * 7919 + t * 2654435761) % 65536) - 32768) AS av
      FROM d CROSS JOIN t),
e AS (SELECT doc_id, w, CAST(sum(av) AS BIGINT) AS ew
      FROM s GROUP BY doc_id, w),
tt AS (SELECT doc_id, CAST(sum(ew) AS BIGINT) AS tot FROM e GROUP BY doc_id),
h AS (SELECT e.doc_id,
             CAST(sum(CASE WHEN e.ew * 8 >= tt.tot
                           THEN CAST(1 AS BIGINT) << e.w
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS afp
      FROM e JOIN tt USING (doc_id) GROUP BY e.doc_id)
SELECT doc_id, afp,
       min(doc_id) OVER (PARTITION BY afp) AS keeper,
       doc_id != min(doc_id) OVER (PARTITION BY afp) AS is_dup
FROM h
"""


@_register("m6_audio_fp_dedup", _M6_ORACLE)
def m6_audio_fp_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio perceptual-fingerprint dedup — m5's twin on the audio
    column: synthesize a 256-sample PCM16 waveform per document, encode →
    decode through the real RIFF/WAVE codec, fingerprint the loudness
    envelope (8 windows, one bit per window set iff its Σ|a| is ≥ the
    mean, computed as the exact cross-multiplication e_w·8 ≥ Σe), then
    assign every document a keeper = min doc_id within its fingerprint
    cluster.  Scale shape: two chained mapInPandas passes over the scan
    (synth+encode, decode+fingerprint — partition-preserving, audio bytes
    never shuffle), then ONE exchange on the int64 fingerprint."""
    from pyspark.sql import Window

    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        audio_fingerprint,
        synth_wav,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = synth_wav(docs, "doc_id", n_samples=256, sample_rate=16000)
    fp = audio_fingerprint(wavs, "wav", n_windows=8, out_col="afp")
    w = Window.partitionBy("afp")
    return (
        fp.select("doc_id", "afp")
        .withColumn("keeper", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper"))
    )


#: m7 scene geometry: 12 frames of 8×6 px, scene length 4, so per-frame
#: byte sums follow the closed form 48·((d%16)·3 + (f//4)·53 + (d%8) + 2f)
#: + 876 (Σ2x=336, Σy=120, Σxy=420 over the 48 pixels) — the oracle scores
#: the detector without decoding a byte, while Spark must earn the same
#: numbers from the actual PPM container.
_M7_JUMP = 1000

_M7_ORACLE = f"""
WITH d AS (SELECT doc_id FROM documents),
fr AS (SELECT doc_id, f,
              48 * ((doc_id % 16) * 3 + (f // 4) * 53 + (doc_id % 8) + 2 * f)
                + 876 AS luma
       FROM d, unnest(range(12)) t(f)),
fl AS (SELECT doc_id, f, luma,
              CASE WHEN lag(luma) OVER w IS NULL
                     OR abs(luma - lag(luma) OVER w) > {_M7_JUMP}
                   THEN 1 ELSE 0 END AS is_new
       FROM fr WINDOW w AS (PARTITION BY doc_id ORDER BY f)),
s AS (SELECT *, CAST(sum(is_new) OVER (PARTITION BY doc_id ORDER BY f)
                     AS BIGINT) AS scene_seq
      FROM fl)
SELECT doc_id, scene_seq, count(*) AS n_frames,
       CAST(min(f) AS BIGINT) AS first_frame,
       CAST(sum(luma) AS BIGINT) AS luma_sum
FROM s GROUP BY doc_id, scene_seq
"""


@_register("m7_scene_change", _M7_ORACLE)
def m7_scene_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-change detection: each document carries a synthetic
    concatenated-PPM "video" (the MJPEG shape — self-delimiting frames in
    one opaque blob); the frame walker parses every frame header from the
    bytes, per-frame luma thresholds against its predecessor, and
    gaps-and-islands numbering turns the jump flags into scenes.  The
    oracle knows the closed-form luma of the synthesizer, so a walker
    that mis-parses a header, drops a frame, or mis-orders the window
    breaks the hash.  Scale shape: blobs never shuffle (two
    partition-preserving Arrow passes: synthesize, walk); only
    (doc_id, frame_idx, int64) rows reach the one doc_id-keyed exchange
    that both window passes and the scene rollup share."""
    from pyspark.sql import Window

    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        frame_byte_sums,
        synth_video,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    vids = synth_video(docs, "doc_id", n_frames=12, width=8, height=6,
                       scene_len=4)
    lumas = frame_byte_sums(vids, "video", id_cols=("doc_id",))
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    flagged = lumas.withColumn(
        "is_new",
        F.when(F.lag("luma").over(w).isNull(), 1)
        .when(F.abs(F.col("luma") - F.lag("luma").over(w)) > _M7_JUMP, 1)
        .otherwise(0),
    ).withColumn("scene_seq", F.sum("is_new").over(w).cast("bigint"))
    return flagged.groupBy("doc_id", "scene_seq").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.min("frame_idx").cast("bigint").alias("first_frame"),
        F.sum("luma").cast("bigint").alias("luma_sum"),
    )


#: m8's oracle is m5's per-doc ahash computation crossed with the two
#: container formats: content identity is format-independent, so both
#: rows of a document must carry the SAME hash — any BGR/row-order/padding
#: slip in either codec breaks it.
_M8_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(7)) AS x1), yo AS (SELECT unnest(range(5)) AS y1),
p AS (SELECT doc_id, y1 * 7 + x1 AS k,
             (3 * ((x1 * 16) // 7) + 5 * ((y1 * 12) // 5) + doc_id) % 256
             + ((x1 * 16) // 7 + 2 * ((y1 * 12) // 5)) % 256
             + (doc_id + ((x1 * 16) // 7) * ((y1 * 12) // 5)) % 256 AS v
      FROM d CROSS JOIN xo CROSS JOIN yo),
t AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tot FROM p GROUP BY doc_id),
h AS (SELECT p.doc_id,
             CAST(sum(CASE WHEN p.v * 35 >= t.tot
                           THEN CAST(1 AS BIGINT) << p.k
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
      FROM p JOIN t USING (doc_id) GROUP BY p.doc_id)
SELECT doc_id, fmt, ahash
FROM h CROSS JOIN (SELECT unnest(['bmp', 'ppm']) AS fmt)
"""


@_register("m8_crossformat_dedup", _M8_ORACLE)
def m8_crossformat_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-container image dedup: the SAME pixels shipped as a PPM and
    as a 24-bit BMP must collapse to one perceptual hash — the container
    -normalization problem real corpora have (identical photos, different
    formats, byte-level dedup blind to it).  Each document's synthetic
    image rides BOTH codecs (PPM pass-through; decode → BMP re-encode
    with its BGR channel order, bottom-up rows, and 4-byte padding),
    then both variants thumbnail and average-hash through the SAME
    format-dispatching decode path; the oracle pins each (doc, fmt) row
    to the closed-form hash, so the two codecs must agree pixel-for-
    pixel.  Scale shape: four partition-preserving Arrow passes, a
    no-shuffle union of the two variant streams; binaries never
    shuffle."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_ahash,
        resize_images,
        synth_ppm_images,
        transcode_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    ppm = imgs.select("doc_id", F.lit("ppm").alias("fmt"),
                      F.col("img").alias("blob"))
    bmp = transcode_images(imgs, "img", "bmp", out_col="bmp").select(
        "doc_id", F.lit("bmp").alias("fmt"), F.col("bmp").alias("blob")
    )
    both = ppm.unionByName(bmp)
    thumbs = resize_images(both, "blob", width=7, height=5, out_col="thumb")
    return image_ahash(thumbs, "thumb", out_col="ahash").select(
        "doc_id", "fmt", "ahash"
    )


#: m9 replays synth pixels (m5's formulas), quadrant split (qx = x//8,
#: qy = y//6, local bit k = (y%6)·8 + (x%8)), the per-quadrant 48-pixel
#: ahash via exact cross-multiplication, bucket sizes per (pos, hash),
#: and the per-doc dup-quadrant profile.
_M9_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(16)) AS x), yo AS (SELECT unnest(range(12)) AS y),
p AS (SELECT doc_id, x // 8 AS qx, y // 6 AS qy,
             (y % 6) * 8 + (x % 8) AS k,
             (3 * x + 5 * y + doc_id) % 256
             + (x + 2 * y) % 256
             + (doc_id + x * y) % 256 AS v
      FROM d CROSS JOIN xo CROSS JOIN yo),
t AS (SELECT doc_id, qx, qy, CAST(sum(v) AS BIGINT) AS tot
      FROM p GROUP BY 1, 2, 3),
h AS (SELECT p.doc_id, p.qx, p.qy,
             CAST(sum(CASE WHEN p.v * 48 >= t.tot
                           THEN CAST(1 AS BIGINT) << p.k ELSE 0 END)
               AS BIGINT) AS qh
      FROM p JOIN t USING (doc_id, qx, qy) GROUP BY 1, 2, 3),
b AS (SELECT qx, qy, qh, count(*) AS n_share FROM h GROUP BY 1, 2, 3)
SELECT h.doc_id,
       CAST(count(CASE WHEN b.n_share >= 2 THEN 1 END) AS INTEGER)
         AS n_dup_q,
       CAST(max(b.n_share) AS BIGINT) AS max_share
FROM h JOIN b USING (qx, qy, qh)
GROUP BY h.doc_id
"""


@_register("m9_region_dedup", _M9_ORACLE)
def m9_region_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-region (boilerplate) detection: tile every image into 2×2
    quadrants, ahash each quadrant, and profile per document how many of
    its regions also appear in OTHER images — the watermark / template /
    header-strip signal that whole-image hashing (m5) washes out, since
    a shared corner changes the global hash.  Deliberately emits per-DOC
    profiles, not pairs: region buckets in a deduped corpus can hold
    hundreds of members, and pair enumeration inside them is quadratic —
    bucket sizes join back linearly instead (the same groups-not-pairs
    rule as t2's exact dedup).  Scale shape: synth → tile → hash are
    three partition-preserving Arrow passes (tiles fan out in place,
    pixels never shuffle); only (doc, pos, 8-byte hash) rows reach the
    bucket exchange."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_ahash,
        synth_ppm_images,
        tile_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    tiles = tile_images(imgs, "img", nx=2, ny=2, out_col="tile").select(
        "doc_id", "tx", "ty", "tile"
    )
    hashed = image_ahash(tiles, "tile", out_col="qh").select(
        "doc_id",
        F.col("tx").alias("qx"),
        F.col("ty").alias("qy"),
        "qh",
    )
    from pyspark.sql import Window

    # bucket sizes as a count-over-window, NOT groupBy + join-back: the
    # join form re-executes the synth→tile→hash Arrow chain for the
    # second branch (6 Python nodes); the window reads it once
    wb = Window.partitionBy("qx", "qy", "qh")
    prof = hashed.withColumn("n_share", F.count(F.lit(1)).over(wb))
    return prof.groupBy("doc_id").agg(
        F.count(F.when(F.col("n_share") >= 2, 1)).cast("int").alias("n_dup_q"),
        F.max("n_share").cast("bigint").alias("max_share"),
    )


#: the same double expression text runs in both engines so the one float
#: step (moments → mean/variance) is a fixed IEEE op sequence
_M10_MEAN = "CAST(round(sum_v * 10000e0 / n_px) AS BIGINT)"
_M10_VAR = (
    "CAST(round((sumsq_v * 1.0e0 / n_px"
    " - (sum_v * 1.0e0 / n_px) * (sum_v * 1.0e0 / n_px)) * 10000e0)"
    " AS BIGINT)"
)

_M10_ORACLE = f"""
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(16)) AS x), yo AS (SELECT unnest(range(12)) AS y),
px AS (SELECT doc_id, x, y,
              (3 * x + 5 * y + doc_id) % 256 AS c0,
              (x + 2 * y) % 256 AS c1,
              (doc_id + x * y) % 256 AS c2
       FROM d CROSS JOIN xo CROSS JOIN yo),
ch AS (SELECT 0 AS channel, c0 AS v FROM px
       UNION ALL SELECT 1, c1 FROM px
       UNION ALL SELECT 2, c2 FROM px),
agg AS (SELECT channel, count(*) AS n_px,
               CAST(sum(v) AS BIGINT) AS sum_v,
               CAST(sum(v * v) AS BIGINT) AS sumsq_v
        FROM ch GROUP BY channel)
SELECT channel, n_px, sum_v, sumsq_v,
       {_M10_MEAN} AS mean_e4,
       {_M10_VAR} AS var_e4
FROM agg
"""


@_register("m10_channel_stats", _M10_ORACLE)
def m10_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset normalization constants for the vision pipeline: global
    per-channel pixel mean and variance over every decoded image — the
    numbers that parameterize the input-normalization transform of any
    image training run.  The Arrow pass emits exact integer moment rows
    (3 per image: n, Σv, Σv²), a plain aggregate reduces them (int64
    sums — associative, order-free), and the single float step happens
    once on the 3-row result with an expression both engines evaluate
    identically.  Scale shape: one partition-preserving mapInPandas
    chain (synth → moments), then a 3-group map-combined aggregate —
    pixels never shuffle; at 100 TB the reduce moves 3 rows per
    partition.  See ``operators/multimodal.py:image_channel_stats``."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_channel_stats,
        synth_ppm_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    stats = image_channel_stats(imgs, "img", prefix="ch_")
    agg = stats.groupBy(F.col("ch_channel").alias("channel")).agg(
        F.sum("ch_n").cast("bigint").alias("n_px"),
        F.sum("ch_sum").cast("bigint").alias("sum_v"),
        F.sum("ch_sumsq").cast("bigint").alias("sumsq_v"),
    )
    return agg.select(
        "channel", "n_px", "sum_v", "sumsq_v",
        F.expr(_M10_MEAN).alias("mean_e4"),
        F.expr(_M10_VAR).alias("var_e4"),
    )


#: m11 waveform is m4's synth (sample t of doc id = ((id·7919 + t·M) mod
#: 65536) − 32768), framed at 64 samples; a frame is ACTIVE when its Σv²
#: clears 64·E[v²] ≈ 2.29e10 (the flat-noise expectation — the synth is a
#: full-period LCG, so activity is pseudo-random per frame and real multi-
#: frame segments occur).  Islands: frame_idx − row_number over active
#: frames is constant per run.
_M11_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
t AS (SELECT unnest(range(1024)) AS t),
s AS (SELECT doc_id, t // 64 AS f,
             ((doc_id * 7919 + t * 2654435761) % 65536) - 32768 AS v
      FROM d CROSS JOIN t),
fe AS (SELECT doc_id, f, sum(v * v) AS energy FROM s GROUP BY doc_id, f),
act AS (SELECT doc_id, f, energy,
               f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM fe WHERE energy >= 22900000000)
SELECT doc_id, CAST(min(f) AS INTEGER) AS seg_start,
       CAST(max(f) AS INTEGER) AS seg_end,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(energy) AS BIGINT) AS sum_energy
FROM act GROUP BY doc_id, grp
"""


@_register("m11_audio_vad", _M11_ORACLE)
def m11_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection over REAL WAV payloads: synthesize a
    1024-sample PCM16 waveform per document, encode→decode through the
    RIFF codec, frame at 64 samples with integer Σv² energy
    (`audio_frame_energy` — the new framing operator), threshold at the
    flat-noise expectation, and merge consecutive active frames into
    segments with the gaps-and-islands window — the speech-segment
    extraction every audio curation pipeline runs before transcription.
    Scale shape: synth + framing are two chained mapInPandas passes over
    the scan (audio bytes never shuffle; 16 integer frame rows per doc
    continue), then ONE doc-keyed window exchange serves both the island
    grouping and the per-segment aggregate."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        audio_frame_energy,
        synth_wav,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wavs = synth_wav(docs, "doc_id", n_samples=1024, sample_rate=16000)
    frames = audio_frame_energy(wavs, "wav", frame_len=64, id_cols=("doc_id",))
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    act = (
        frames.where(F.col("frame_energy") >= F.lit(22_900_000_000))
        .withColumn(
            "grp", F.col("frame_idx").cast("long") - F.row_number().over(w)
        )
    )
    return act.groupBy("doc_id", "grp").agg(
        F.min("frame_idx").alias("seg_start"),
        F.max("frame_idx").alias("seg_end"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("frame_energy").cast("bigint").alias("sum_energy"),
    ).drop("grp")
#: g9: activity assortativity of the user↔event-type bipartite graph —
#: Pearson correlation between endpoint ACTIVITY (total event counts; the
#: distinct-degree variant is degenerate here — every user touches all 5
#: types, zero variance) over every incidence edge: do heavy users favor
#: busy event types?  One distinct exchange builds the edge list; the two
#: weight frames join back (type side broadcasts, user side reuses the
#: user partitioning); ONE global moment combine; a single row crosses
#: the last exchange.


_M12_ORACLE = """
WITH d AS (SELECT doc_id, doc_id % 3 AS m FROM documents),
c AS (SELECT CASE m WHEN 0 THEN 'wav' WHEN 1 THEN 'ppm'
                    ELSE 'unknown' END AS fmt,
             CASE m WHEN 0 THEN 108 WHEN 1 THEN 589 ELSE 17 END AS nb
      FROM d)
SELECT fmt, count(*) AS n_docs, CAST(sum(nb) AS BIGINT) AS total_bytes
FROM c GROUP BY fmt
"""


@_register("m12_format_sniff", _M12_ORACLE)
def m12_format_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container sniffing over a MIXED-modality corpus: a third of the
    payloads are real RIFF/WAVE files, a third real PPM P6 images, a third
    opaque 16-byte blobs; the sniffer classifies by MAGIC BYTES with pure
    JVM expressions (binary substring vs X'' literals — no Python touches
    the payload) and rolls up count + byte volume per detected container —
    the routing/triage step in front of every multimodal decode fan-out
    (m3/m4 downstream assume their container; this is what dispatches
    them, and 'unknown' is the poison-row quarantine lane).  Byte sizes
    come from the typed metadata struct (`with_media_meta`), oracled by
    the closed-form container arithmetic: WAV = 44-byte header + 2·32
    samples = 108, PPM 16×12 = 13-byte header + 576 = 589, blob = 17."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        synth_ppm_images,
        synth_wav,
        with_media_meta,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    wav = synth_wav(
        docs.where(F.col("doc_id") % 3 == 0), "doc_id", n_samples=32
    ).withColumnRenamed("wav", "payload")
    ppm = synth_ppm_images(
        docs.where(F.col("doc_id") % 3 == 1), "doc_id",
        width=16, height=12, out_col="payload",
    )
    raw = docs.where(F.col("doc_id") % 3 == 2).withColumn(
        "payload",
        # 0x00 prefix: md5 bytes are pseudo-random, so 1-in-65536 blobs
        # would START with a real magic ('BM'/'P6') and sniff as that
        # container — correct behavior, but the oracle needs the lane
        # closed-form; a leading NUL matches no magic ever
        F.expr("concat(X'00', unhex(md5(CAST(doc_id AS STRING))))")
    )
    mixed = wav.unionByName(ppm).unionByName(raw)
    sniffed = mixed.withColumn(
        "fmt",
        F.expr(
            "CASE WHEN substring(payload, 1, 4) = X'52494646'"
            "      AND substring(payload, 9, 4) = X'57415645' THEN 'wav'"
            "     WHEN substring(payload, 1, 2) = X'5036' THEN 'ppm'"
            "     WHEN substring(payload, 1, 2) = X'424D' THEN 'bmp'"
            "     ELSE 'unknown' END"
        ),
    )
    meta = with_media_meta(sniffed, "payload", mime="application/octet-stream")
    return meta.groupBy("fmt").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("payload_meta.n_bytes")).cast("bigint")
        .alias("total_bytes"),
    )
#: t50: code-vs-prose routing — the symbol-density heuristic ({}();=<>[]#
#: share of characters, e6-scaled) that decides which documents go to the
#: code pipeline vs the prose one; the flag itself is the exact integer
#: cross-multiplication (3% threshold), so no ratio rounding leaks into
#: the routing decision.  One scan, pure length/translate codegen
#: identities, zero shuffles before the driver-bound result.


#: m13 replays the synth pixels in SQL: luma(x,y) = R+G+B with the m3/m5
#: formulas, and the sharpness is Σ|luma(x−1,y) − 2·luma(x,y) + luma(x+1,y)|
#: — three shifted copies of the SAME closed form joined on (doc, y, x).
_M13_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(16)) AS x), yo AS (SELECT unnest(range(12)) AS y),
p AS (SELECT doc_id, x, y,
             (3 * x + 5 * y + doc_id) % 256
             + (x + 2 * y) % 256
             + (doc_id + x * y) % 256 AS luma
      FROM d CROSS JOIN xo CROSS JOIN yo)
SELECT a.doc_id,
       CAST(sum(abs(a.luma - 2 * b.luma + c.luma)) AS BIGINT) AS sharpness,
       CAST(192 AS INTEGER) AS n_px
FROM p a
JOIN p b ON b.doc_id = a.doc_id AND b.y = a.y AND b.x = a.x + 1
JOIN p c ON c.doc_id = a.doc_id AND c.y = a.y AND c.x = a.x + 2
GROUP BY a.doc_id
"""


@_register("m13_blur_metric", _M13_ORACLE)
def m13_blur_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image blur/quality gate over REAL codec round-trips: synthesize a
    16×12 PPM per document, decode it, and score sharpness as the integer
    sum of |horizontal second differences| of the per-pixel luma
    (`image_sharpness` — the 1-D Laplacian-energy proxy that image
    curation thresholds to drop blurry/flat frames).  Scale shape: two
    chained mapInPandas passes over the scan (synth, then decode+score),
    partition-preserving, pixels never shuffle — only (doc_id, int64)
    continues; the oracle replays the pixels from first principles."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_sharpness,
        synth_ppm_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12)
    scored = image_sharpness(imgs, "img", prefix="")
    return scored.select("doc_id", "sharpness", "n_px")


_M14_NAME_SQL = (
    "'m' || CAST(s.doc_id AS VARCHAR) || '_' || CAST(s.i AS VARCHAR)"
    " || '.bin'"
)

_M14_ORACLE = f"""
WITH d AS (SELECT doc_id FROM documents),
m AS (SELECT doc_id, unnest(range(doc_id % 3 + 1)) AS i FROM d),
s AS (SELECT doc_id, i, (doc_id * 7 + i * 13) % 200 + 10 AS size FROM m),
by AS (SELECT doc_id, i, size, unnest(generate_series(0, size - 1)) AS j
       FROM s),
sums AS (SELECT doc_id, i,
                CAST(sum((doc_id + (i + 1) * j) % 256) AS BIGINT) AS byte_sum
         FROM by GROUP BY 1, 2)
SELECT s.doc_id, CAST(s.i AS INTEGER) AS member_idx,
       {h60_sql(_M14_NAME_SQL)} AS name_h60,
       CAST(s.size AS BIGINT) AS size, sums.byte_sum
FROM s JOIN sums ON sums.doc_id = s.doc_id AND sums.i = s.i
"""


@_register("m14_archive_members", _M14_ORACLE)
def m14_archive_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container MEMBER EXPLOSION — the crawl-dump ingestion shape (WARC
    /tar/zip dumps arrive as archives; the first distributed operator
    any 100 TB text pipeline runs is one-archive-in, one-row-PER-MEMBER
    out): synthesize a deterministic POSIX tar per document (stdlib
    ``tarfile`` writer — a real, independent encoder), then parse it
    with the hand-rolled 512-byte-block walker (octal size field,
    spaced-checksum verification, block padding, zero-block
    terminator) and emit each member's index, h60 name hash, size,
    and byte sum — all replayed from first principles by the SQL
    oracle, so a parser that mis-walks a single block boundary
    hash-mismatches.  m12 sniffs formats and m1-m13 decode LEAF
    media; this is the CONTAINER layer above them.  Scale shape: two
    chained ``mapInPandas`` passes over the scan (synth, parse),
    partition-preserving — archive binaries are opened and dropped
    inside the executor; only (id, idx, hash, two ints) rows leave,
    so member explosion never shuffles payload bytes.  Corrupt
    archives poison only themselves (emit nothing), the m-family
    convention."""
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        parse_tar_members,
        synth_tar_archives,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    tars = synth_tar_archives(docs, "doc_id", out_col="tar")
    return parse_tar_members(tars, "doc_id", "tar")


#: m15 reuses m5's exact ahash replay (synth 16×12 → resize 7×5 → 35-bit
#: average hash), then counts NEAR neighbors per image: Hamming 1..2 —
#: d=0 is exact-equality territory m5 already owns, so m15 measures the
#: perceptually-close-but-not-identical tail (recompressed thumbnails,
#: single-pixel watermarks) that equality dedup misses.
_M15_ORACLE = """
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(7)) AS x1), yo AS (SELECT unnest(range(5)) AS y1),
p AS (SELECT doc_id, y1 * 7 + x1 AS k,
             (3 * ((x1 * 16) // 7) + 5 * ((y1 * 12) // 5) + doc_id) % 256
             + ((x1 * 16) // 7 + 2 * ((y1 * 12) // 5)) % 256
             + (doc_id + ((x1 * 16) // 7) * ((y1 * 12) // 5)) % 256 AS v
      FROM d CROSS JOIN xo CROSS JOIN yo),
t AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tot FROM p GROUP BY doc_id),
h AS (SELECT p.doc_id,
             CAST(sum(CASE WHEN p.v * 35 >= t.tot
                           THEN CAST(1 AS BIGINT) << p.k
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
      FROM p JOIN t USING (doc_id) GROUP BY p.doc_id),
pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM h a JOIN h b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.ahash, b.ahash)) BETWEEN 1 AND 2),
u AS (SELECT id_a AS doc_id FROM pr
      UNION ALL SELECT id_b AS doc_id FROM pr)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neardups
FROM u GROUP BY doc_id
"""


@_register("m15_image_hamming_neardup", _M15_ORACLE)
def m15_image_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image NEAR-duplicate degree by perceptual-hash Hamming distance:
    for every image with at least one neighbor at ahash Hamming 1–2, the
    count of such neighbors — the multimodal twin of t7's SimHash near-
    dup, where m5 (exact ahash equality) is the twin of t2's exact
    fingerprint dedup.  Distance 0 is deliberately EXCLUDED: those are
    m5's exact clusters; the 1–2 band is what recompression, resize
    jitter, and single-region watermarks produce, and is what an image
    dedup pass at training-data scale actually hunts.  Pair generation
    is the pigeonhole band join (``operators/dedup.py:hamming_pairs``,
    3 bands over 35 bits ⇒ any d ≤ 2 pair collides exactly in ≥ 1 band),
    NOT an all-pairs scan — the oracle's cross join is the sf-scale
    replay only.  Scale shape: three chained mapInPandas passes synth/
    resize/hash the binaries in place (nothing binary ever shuffles),
    then the band self-join moves (id, hash, band, key) longs, the
    refine is codegen bit_count(xor), and the degree rollup is one
    map-combinable id-keyed count."""
    from spark_ml_spatialjointransformer_spark.operators.dedup import (
        hamming_pairs,
    )
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_ahash,
        resize_images,
        synth_ppm_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    thumbs = resize_images(imgs, "img", width=7, height=5, out_col="thumb")
    hashed = image_ahash(thumbs, "thumb", out_col="ahash")
    pairs = hamming_pairs(
        hashed, "doc_id", "ahash", bits=35, max_hamming=2
    ).where(F.col("hamming") >= 1)
    return (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neardups"))
    )


#: m16 bucket cap — chosen so the cap genuinely TRIPS at every SF (the
#: synthetic corpus's period-256 ahash values collide heavily on the
#: 11/12-bit band slices: max bucket 330 at 500 docs, 3271 at 5000)
#: while SURVIVING pairs remain at every SF for the non-empty parity
#: gate (cap 2 suppressed the entire output — every bucket is hot here).
_M16_CAP = 60

#: m16 replays m15's ahash pipeline PLUS hamming_pairs' skew cap: band
#: keys are the exact integer shift+mask the engine computes (3 bands
#: over 35 bits: [0,12) [12,23) [23,35)), each band's bucket size is a
#: window count over that band's key, and a pair survives iff its LOWEST
#: key-matching band is cool — the first-match semantics the Spark side
#: enforces with its codegen filter after the anti-join.
_M16_ORACLE = f"""
WITH d AS (SELECT doc_id FROM documents),
xo AS (SELECT unnest(range(7)) AS x1), yo AS (SELECT unnest(range(5)) AS y1),
p AS (SELECT doc_id, y1 * 7 + x1 AS k,
             (3 * ((x1 * 16) // 7) + 5 * ((y1 * 12) // 5) + doc_id) % 256
             + ((x1 * 16) // 7 + 2 * ((y1 * 12) // 5)) % 256
             + (doc_id + ((x1 * 16) // 7) * ((y1 * 12) // 5)) % 256 AS v
      FROM d CROSS JOIN xo CROSS JOIN yo),
t AS (SELECT doc_id, CAST(sum(v) AS BIGINT) AS tot FROM p GROUP BY doc_id),
h AS (SELECT p.doc_id,
             CAST(sum(CASE WHEN p.v * 35 >= t.tot
                           THEN CAST(1 AS BIGINT) << p.k
                           ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
      FROM p JOIN t USING (doc_id) GROUP BY p.doc_id),
bk AS (SELECT doc_id, ahash,
              (ahash >> 0) & 4095 AS k0,
              (ahash >> 12) & 2047 AS k1,
              (ahash >> 23) & 4095 AS k2 FROM h),
hb AS (SELECT *,
              count(*) OVER (PARTITION BY k0) > {_M16_CAP} AS hot0,
              count(*) OVER (PARTITION BY k1) > {_M16_CAP} AS hot1,
              count(*) OVER (PARTITION BY k2) > {_M16_CAP} AS hot2 FROM bk),
pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
       FROM hb a JOIN hb b ON a.doc_id < b.doc_id
       WHERE (a.k0 = b.k0 OR a.k1 = b.k1 OR a.k2 = b.k2)
         AND (CASE WHEN a.k0 = b.k0 THEN NOT a.hot0
                   WHEN a.k1 = b.k1 THEN NOT a.hot1
                   WHEN a.k2 = b.k2 THEN NOT a.hot2
                   ELSE FALSE END)
         AND bit_count(xor(a.ahash, b.ahash)) BETWEEN 1 AND 2),
u AS (SELECT id_a AS doc_id FROM pr
      UNION ALL SELECT id_b AS doc_id FROM pr)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_neardups
FROM u GROUP BY doc_id
"""


@_register("m16_capped_hamming_neardup", _M16_ORACLE)
def m16_capped_hamming_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m15's image near-dup degree under the SKEW CAP
    (``max_bucket={_M16_CAP}``): hot (band, key) buckets — the synthetic
    corpus's period-256 ahash clusters stand in for the re-exported-
    thumbnail template hashes a real 100 TB image corpus carries — are
    dropped before the self-join, bounding any single task's pair fanout
    at cap²/2 per bucket.  This is t62's engine-vs-engine pin ported to
    the GENERIC ``hamming_pairs`` (the r10 verdict's ask): the oracle
    replays the exact 35-bit ahash, derives each band key with the same
    shift+mask integers the engine plans, sizes every bucket with a
    window count, and walks the bands in order so the lowest-matching-
    band survival rule is checked value-for-value, not just unit-tested.
    Scale shape: m15's plan plus ONE map-combinable (band, key) count
    and a size-gated anti-join (broadcast under 1M hot keys, shuffle
    above)."""
    from spark_ml_spatialjointransformer_spark.operators.dedup import (
        hamming_pairs,
    )
    from spark_ml_spatialjointransformer_spark.operators.multimodal import (
        image_ahash,
        resize_images,
        synth_ppm_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    imgs = synth_ppm_images(docs, "doc_id", width=16, height=12, out_col="img")
    thumbs = resize_images(imgs, "img", width=7, height=5, out_col="thumb")
    hashed = image_ahash(thumbs, "thumb", out_col="ahash")
    pairs = hamming_pairs(
        hashed, "doc_id", "ahash", bits=35, max_hamming=2, max_bucket=_M16_CAP
    ).where(F.col("hamming") >= 1)
    return (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_neardups"))
    )
