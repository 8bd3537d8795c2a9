"""Batch twins of the streaming operators (Q14) — identical window
semantics expressed on bounded data so DuckDB can oracle-check them, plus
the multimodal metadata query.

Window starts are epoch-aligned exactly like Spark's ``F.window``
(start = floor(epoch/slide)*slide - k*slide), and rendered as strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import binary_metadata, decode_image_features, to_binary_payload
from ..registry import register
from ..sources.tables import load_table

_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "window_tumbling_events",
    oracle=f"""
    SELECT strftime(TIMESTAMP '1970-01-01 00:00:00'
                    + (CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600) * INTERVAL 1 SECOND,
                    '{_FMT_DUCK}') AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour windowed aggregation (Q14 batch twin of "
        "streaming.windowed_event_agg; same epoch-aligned windows).",
)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("win.start", _FMT_SPARK).alias("window_start"),
            "event_type", "n", "sum_value",
        )
    )


@register(
    "window_sliding_events",
    oracle=f"""
    SELECT strftime(TIMESTAMP '1970-01-01 00:00:00'
                    + ((CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900) * INTERVAL 1 SECOND,
                    '{_FMT_DUCK}') AS window_start,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events CROSS JOIN range(4) r(k)
    GROUP BY 1
    """,
    doc="Sliding 1-hour/15-min windowed aggregation (each event in 4 "
        "overlapping windows — the explode-to-slides plan F.window uses).",
)
def q_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format("win.start", _FMT_SPARK).alias("window_start"),
            "n", "sum_value",
        )
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           strftime(min(ts), '{_FMT_DUCK}') AS session_start,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
    doc="Gap-based sessionization (30-min) via lag + cumulative-sum session "
        "ids — batch twin of streaming session_window.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "value")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # interval comparison, not cast-to-double: exact at microsecond
    # precision, matches the oracle's `> INTERVAL 30 MINUTE`, and works
    # for both TIMESTAMP and TIMESTAMP_NTZ (NTZ forbids numeric casts;
    # the fixture's ts reads as NTZ on a vanilla Spark 4.1 session).
    new_s = (
        prev.isNull() |
        ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    # event_id tiebreaks the cumulative sum too: duplicate (user_id, ts)
    # rows would otherwise make session_id assignment nondeterministic.
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0)
    return (
        e.withColumn("new_session", new_s)
        .withColumn("session_id", F.sum("new_session").over(wc))
        .groupBy("user_id", "session_id")
        .agg(
            F.date_format(F.min("ts"), _FMT_SPARK).alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


@register(
    "stream_join_attribution",
    oracle=f"""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           strftime(c.ts, '{_FMT_DUCK}') AS click_ts,
           p.event_id AS purchase_id,
           strftime(p.ts, '{_FMT_DUCK}') AS purchase_ts,
           round(p.value, 2) AS amount
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
    doc="Batch twin of streaming.click_attribution_join: purchases "
        "attributed to a same-user click within 1 hour (the watermarked "
        "stream-stream join's exact semantics on bounded input).",
)
def q_stream_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.ops import click_attribution_join

    e = load_table(spark, sf_dir, "events")
    return (
        click_attribution_join(e, e)
        .withColumn("click_ts", F.date_format("click_ts", _FMT_SPARK))
        .withColumn("purchase_ts", F.date_format("purchase_ts", _FMT_SPARK))
    )


@register(
    "multimodal_binary_meta",
    oracle="""
    SELECT doc_id,
           'text/plain' AS media_type,
           octet_length(encode(text)) AS byte_len,
           sha256(text) AS sha256_hex,
           md5(text) AS md5_hex
    FROM documents
    """,
    doc="Opaque binary payload + typed metadata (multimodal column model): "
        "size/sha256/md5 without decoding, all JVM-side.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return binary_metadata(to_binary_payload(docs, "text"), "doc_id")


@register(
    "multimodal_decode_stub",
    oracle="""
    SELECT doc_id,
           CAST(16 + octet_length(encode(text)) % 64 AS INTEGER) AS width,
           CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST((ascii(text) + octet_length(encode(text))) % 256 AS DOUBLE) AS mean_luma,
           'stub' AS decoder
    FROM documents
    """,
    doc="Arrow-batched mapInPandas decode plumbing with a deterministic "
        "stub decoder (no imaging libs in env); schema/batching real.  "
        "Fully hash-oracled (r7): the stub features are a pure formula "
        "over payload bytes — width/height from byte length, luma from "
        "(first byte + length) % 256 — so DuckDB reproduces every value "
        "from the same text-encoded payloads (fixture text is ASCII, so "
        "ascii(text) IS the first payload byte; integer-valued luma "
        "makes round(.,2) a no-op on both engines).  The decoder ladder "
        "(PIL -> pure-PNG -> stub) is pinned separately by "
        "multimodal_decode_png's real decode leg.",
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return decode_image_features(to_binary_payload(docs, "text"), "doc_id")


@register(
    "multimodal_decode_png",
    oracle="""
    SELECT vec_id,
           8 AS width, 8 AS height, 1 AS channels,
           CAST(list_sum(list_transform(embedding,
                e -> CAST(floor(least(greatest((CAST(e AS DOUBLE) + 1) / 2, 0), 1)
                          * 255) AS BIGINT))) AS BIGINT) AS luma_total,
           'png' AS decoder
    FROM embeddings
    """,
    doc="REAL image decode end-to-end, fully hash-oracled: each 64-dim "
        "embedding renders to an 8x8 grayscale PNG payload (pure-Python "
        "encoder, executor-side), then decode_image_features decodes it "
        "back via the dependency-free PNG decoder (zlib inflate + "
        "scanline de-filter).  luma_total reconstructs the exact integer "
        "pixel sum from the rounded mean (|round err| * 64 < 0.5), so "
        "DuckDB can recompute it from the quantization formula alone — "
        "proving dimensions AND pixel content survive the encode->decode "
        "trip.  Quantization is pure IEEE double math in both engines "
        "(clip((e+1)/2) * 255, floored), so the hash comparison is "
        "bit-exact.  At 100 TB payloads stay in executor Arrow batches; "
        "only (id, features) rows leave the decode stage.",
)
def q_multimodal_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import encode_png_gray

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def render(batches):
        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                v = np.asarray(vec, dtype=np.float64)
                px = np.floor(np.clip((v + 1.0) / 2.0, 0.0, 1.0) * 255.0)
                payloads.append(encode_png_gray(px.astype(np.uint8).tobytes(), 8, 8))
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "payload": payloads})

    rendered = emb.mapInPandas(render, schema="vec_id BIGINT, payload BINARY")
    feats = decode_image_features(rendered, "vec_id")
    return feats.select(
        F.col("doc_id").alias("vec_id"),
        "width", "height", "channels",
        F.round(F.col("mean_luma") * 64).cast("long").alias("luma_total"),
        "decoder",
    )


@register(
    "multimodal_image_dhash_pairs",
    oracle="""
    WITH px AS (
      SELECT vec_id, list_transform(embedding,
         e -> CAST(floor(least(greatest((CAST(e AS DOUBLE)+1)/2, 0), 1)*255)
              AS BIGINT)) AS p
      FROM embeddings
    ),
    allpx AS (
      SELECT vec_id AS id, p FROM px
      UNION ALL
      SELECT vec_id + 100000,
             list_concat([255 - p[1]], p[2:64])
      FROM px WHERE vec_id % 5 = 0
    ),
    dh AS (
      SELECT id,
        (SELECT sum(CASE WHEN p[r*8+c+1] > p[r*8+c+2]
                    THEN (1::BIGINT << (r*7+c)) ELSE 0 END)
         FROM range(8) t1(r), range(7) t2(c)) AS dhash
      FROM allpx
    )
    SELECT a.id AS a, b.id AS b,
           CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS hamming
    FROM dh a JOIN dh b ON a.id < b.id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    """,
    doc="Image near-duplicate detection by dHash perceptual fingerprint "
        "over REAL decoded pixels: embeddings render to 8x8 grayscale "
        "PNGs plus deterministic perturbed twins (every 5th image with "
        "its first pixel inverted, id+100000 — the constructed "
        "near-identical pairs an image-dedup fixture needs), the "
        "pure-Python decoder recovers the pixel grid, and the "
        "56-bit difference hash joins via EXACT pigeonhole banding "
        "(4 bands x 14 bits: Hamming <= 3 guarantees a shared band, so "
        "the banded equi-join is lossless — LSH shuffle shape, exact "
        "semantics).  The oracle recomputes the hash arithmetically "
        "from the render formula, so a decoder or banding bug breaks "
        "the hash match.  Fixture minimum inter-image distance is 11, "
        "so exactly the constructed twins match.",
)
def q_multimodal_dhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        dhash_near_dup_pairs, encode_png_gray, image_dhash,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def render(batches):
        for pdf in batches:
            ids, payloads = [], []
            for vid, vec in zip(pdf["vec_id"], pdf["embedding"]):
                v = np.asarray(vec, dtype=np.float64)
                px = np.floor(np.clip((v + 1.0) / 2.0, 0.0, 1.0) * 255.0
                              ).astype(np.uint8)
                ids.append(vid)
                payloads.append(encode_png_gray(px.tobytes(), 8, 8))
                if vid % 5 == 0:
                    twin = px.copy()
                    twin[0] = 255 - int(px[0])
                    ids.append(vid + 100000)
                    payloads.append(encode_png_gray(twin.tobytes(), 8, 8))
            yield pd.DataFrame({"id": pd.Series(ids, dtype="int64"),
                                "payload": payloads})

    rendered = emb.mapInPandas(render, schema="id BIGINT, payload BINARY")
    sigs = image_dhash(rendered, "id")
    return dhash_near_dup_pairs(sigs, "id", max_hamming=3,
                                bands=4, band_bits=14)


@register(
    "multimodal_audio_rms",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             CAST(floor(least(greatest(CAST(e AS DOUBLE), -1), 1) * 32767
                        + 0.5) AS INTEGER) AS smp,
             CAST(i - 1 AS INTEGER) AS idx
      FROM (SELECT vec_id, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    )
    SELECT vec_id,
           CAST(idx // 16 AS INTEGER) AS frame_idx,
           round(sqrt(sum(CAST(smp AS DOUBLE) * smp) / 16.0), 6) AS rms,
           8000 AS sample_rate,
           64 AS n_samples
    FROM s GROUP BY vec_id, idx // 16
    """,
    doc="REAL audio decode end-to-end, fully hash-oracled — the WAV "
        "twin of the PNG path, completing the multimodal triad (image "
        "decode, audio decode, binary chunk sampling): each 64-dim "
        "embedding renders to a mono 16-bit PCM WAV (RIFF writer, "
        "executor-side), decode_wav_pcm parses the RIFF chunks back, "
        "and audio_frame_rms emits per-16-sample-frame RMS energy — "
        "the VAD / silence-trim / loudness primitive of an audio "
        "curation pipeline.  Quantization (floor(clip(e)*32767+0.5)) "
        "and the RMS arithmetic are identical IEEE expressions in both "
        "engines, so the oracle recomputes every frame from the "
        "embedding alone — a RIFF writer, parser, or framing bug "
        "breaks the hash.",
)
def q_multimodal_audio_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import audio_frame_rms, encode_wav_pcm16

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def render(batches):
        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                v = np.asarray(vec, dtype=np.float64)
                smp = np.floor(np.clip(v, -1.0, 1.0) * 32767.0 + 0.5
                               ).astype(np.int64)
                payloads.append(encode_wav_pcm16([int(x) for x in smp], 8000))
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "payload": payloads})

    rendered = emb.mapInPandas(render, schema="vec_id BIGINT, payload BINARY")
    feats = audio_frame_rms(rendered, "vec_id", frame=16)
    return feats.select(
        "vec_id", "frame_idx",
        F.round("rms", 6).alias("rms"),
        "sample_rate", "n_samples",
    )


@register(
    "multimodal_video_framesample",
    oracle="""
    SELECT vec_id,
           CAST(t AS INTEGER) AS frame_idx,
           round(list_sum(list_transform(embedding,
             e -> least(CAST(floor(least(greatest((CAST(e AS DOUBLE) + 1) / 2,
                                         0), 1) * 255) AS BIGINT)
                        + 16 * t, 255))) / 64.0, 6) AS mean_luma,
           16 AS n_frames,
           8 AS fps
    FROM embeddings, (SELECT unnest([0, 4, 8, 12]) AS t) s
    """,
    doc="Video frame sampling end-to-end, fully hash-oracled — the "
        "video leg of the multimodal family (image PNG decode, audio "
        "WAV decode, binary chunk sampling): each 64-dim embedding "
        "renders a 16-frame 8x8 grayscale clip (frame t = base pixels "
        "+16t, clipped — a deterministic brightness ramp, so every "
        "frame is distinguishable and an off-by-one frame index breaks "
        "the hash) packed into a VID0 container (magic + u16 dims/count "
        "+ u8 fps header, raw frames), then video_frame_sample walks "
        "the container, keeps every 4th frame and emits per-frame mean "
        "luminance.  The oracle recomputes each sampled frame's mean "
        "from the render formula alone (integer pixel math, one final "
        "division — bit-exact IEEE both engines), so a container "
        "writer, parser, stride, or frame-offset bug flips the hash.  "
        "At 100 TB the multi-frame payload never leaves the executor "
        "Arrow batch; only (id, frame_idx, features) rows emerge — "
        "frame sampling stays a map stage, no explode shuffle.",
)
def q_multimodal_video_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import encode_video_gray, video_frame_sample

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def render(batches):
        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                v = np.asarray(vec, dtype=np.float64)
                base = np.floor(np.clip((v + 1.0) / 2.0, 0.0, 1.0) * 255.0
                                ).astype(np.int64)
                frames = [np.minimum(base + 16 * t, 255).astype(np.uint8)
                          .tobytes() for t in range(16)]
                payloads.append(encode_video_gray(frames, 8, 8, fps=8))
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "payload": payloads})

    rendered = emb.mapInPandas(render, schema="vec_id BIGINT, payload BINARY")
    feats = video_frame_sample(rendered, "vec_id", stride=4)
    return feats.select(
        "vec_id", "frame_idx",
        F.round("mean_luma", 6).alias("mean_luma"),
        "n_frames", "fps",
    )


@register(
    "sessions_interval_overlap",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE OR
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    ),
    sess AS (
      SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
             min(ts) AS s, max(ts) AS e
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT a.user_id, a.session_id,
           CAST(count(b.user_id) AS BIGINT) AS n_concurrent
    FROM sess a LEFT JOIN sess b
      ON a.s <= b.e AND b.s <= a.e
     AND NOT (a.user_id = b.user_id AND a.session_id = b.session_id)
    GROUP BY a.user_id, a.session_id
    """,
    doc="Session concurrency via the bucketized INTERVAL-OVERLAP self-"
        "join (operators/joins.interval_overlap_join): for every "
        "gap-based session, how many other sessions were live at any "
        "overlapping moment — the load-profile / abuse-correlation "
        "query.  A naive inequality self-join is a "
        "BroadcastNestedLoopJoin (|S|^2 at scale); here each session "
        "explodes into its covered 1-hour buckets (fixture sessions "
        "span <= 2), pairs equi-join on the bucket, the residual "
        "overlap predicate filters, and the greatest-start-bucket rule "
        "keeps each pair exactly once.  The oracle runs the plain "
        "theta self-join — same pairs, different plan class.  The "
        "session frame is persisted (three consumers: both join sides "
        "and the zero-preserving rejoin).",
)
def q_sessions_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.caching import tracked_persist
    from ..operators.joins import interval_overlap_join

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_s = (
        prev.isNull() |
        ((F.col("ts") - prev) > F.expr("INTERVAL 30 MINUTES"))
    ).cast("int")
    wc = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0)
    sess = tracked_persist(
        e.withColumn("_ns", new_s)
        .withColumn("session_id", F.sum("_ns").over(wc).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e")))
    a = sess.select(F.col("user_id").alias("user_a"),
                    F.col("session_id").alias("sid_a"),
                    F.col("s").alias("s_a"), F.col("e").alias("e_a"))
    b = sess.select(F.col("user_id").alias("user_b"),
                    F.col("session_id").alias("sid_b"),
                    F.col("s").alias("s_b"), F.col("e").alias("e_b"))
    pairs = (
        interval_overlap_join(a, b, "s_a", "e_a", "s_b", "e_b",
                              bucket_seconds=3600)
        .where(~((F.col("user_a") == F.col("user_b"))
                 & (F.col("sid_a") == F.col("sid_b"))))
    )
    cnt = pairs.groupBy("user_a", "sid_a").agg(
        F.count(F.lit(1)).alias("_n"))
    return (
        sess.join(cnt, (sess.user_id == cnt.user_a)
                  & (sess.session_id == cnt.sid_a), "left")
        .select(sess.user_id, sess.session_id,
                F.coalesce(F.col("_n"), F.lit(0)).alias("n_concurrent"))
    )


@register(
    "window_session_builtin",
    oracle="""
    WITH ev AS (
      SELECT user_id, date_trunc('microseconds', ts) AS ts, value
      FROM events
    ),
    brk AS (
      SELECT user_id, ts, value,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                  THEN 1 ELSE 0 END AS b
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    grp AS (
      SELECT user_id, ts, value,
             sum(b) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS g
      FROM brk
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE,
                    '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM grp GROUP BY user_id, g
    """,
    doc="Sessionization via Spark's BUILT-IN session_window aggregate "
        "(the dynamic-gap session primitive shared by batch and "
        "Structured Streaming, 30-min gap): one groupBy(user, "
        "session_window(ts)) — Spark merges overlapping candidate "
        "windows internally, no explicit lag/running-sum pass.  The "
        "oracle derives the identical sessions with the gaps-and-islands "
        "formulation, pinning the boundary semantics: a gap of EXACTLY "
        "the 30-min duration starts a new session (windows are "
        "half-open [start, last+gap)), and session_end = last event + "
        "gap.  Cross-checks the engine's own gaps-and-islands "
        "`sessionize_events` from the opposite direction.",
)
def q_window_session_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    sw = (e.groupBy("user_id", F.session_window("ts", "30 minutes"))
          .agg(F.count(F.lit(1)).alias("n_events"),
               F.round(F.sum("value"), 2).alias("total_value")))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return sw.select(
        "user_id",
        F.date_format(F.col("session_window.start"), fmt)
         .alias("session_start"),
        F.date_format(F.col("session_window.end"), fmt).alias("session_end"),
        "n_events", "total_value")


_RESIZE_IDX = " + ".join(
    f"p[{(2 * y) * 8 + 2 * x + 1}]" for y in range(4) for x in range(4))


@register(
    "multimodal_image_resize",
    oracle=f"""
    WITH px AS (
      SELECT vec_id, list_transform(embedding,
         e -> CAST(floor(least(greatest((CAST(e AS DOUBLE)+1)/2, 0), 1)*255)
              AS BIGINT)) AS p
      FROM embeddings
    )
    SELECT vec_id, 4 AS out_w, 4 AS out_h,
           CAST({_RESIZE_IDX} AS BIGINT) AS pixel_total,
           CAST(p[1] AS INTEGER) AS top_left,
           CAST(p[55] AS INTEGER) AS bottom_right
    FROM px
    """,
    doc="REAL image resize end-to-end: each embedding renders to an 8x8 "
        "grayscale PNG (same executor-side encoder as the decode query), "
        "then resize_image_nearest decodes and nearest-neighbor "
        "downsamples to 4x4 inside one mapInPandas stage — decode + "
        "resample never leave the executor.  Nearest-neighbor source "
        "index is pure integer math (src = (y*8//4, x*8//4) = (2y, 2x)), "
        "so the oracle recomputes all 16 output pixels, their sum, and "
        "the two corners directly from the render quantization formula "
        "— proving the resample picked exactly the right pixels through "
        "the encode->decode->resize trip.",
)
def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import encode_png_gray, resize_image_nearest

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def render(batches):
        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                v = np.asarray(vec, dtype=np.float64)
                px = np.floor(np.clip((v + 1.0) / 2.0, 0.0, 1.0) * 255.0)
                payloads.append(encode_png_gray(px.astype(np.uint8).tobytes(), 8, 8))
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "payload": payloads})

    rendered = emb.mapInPandas(render, schema="vec_id BIGINT, payload BINARY")
    out = resize_image_nearest(rendered, "vec_id", out_w=4, out_h=4)
    return out.select(F.col("id").alias("vec_id"), "out_w", "out_h",
                      "pixel_total", "top_left", "bottom_right")


@register(
    "multimodal_audio_vad_spans",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             CAST(floor(least(greatest(CAST(e AS DOUBLE), -1), 1) * 32767
                        + 0.5) AS INTEGER) AS smp,
             CAST(i - 1 AS INTEGER) AS idx
      FROM (SELECT vec_id, unnest(embedding) AS e,
                   generate_subscripts(embedding, 1) AS i
            FROM embeddings)
    ),
    fr AS (
      SELECT vec_id, CAST(idx // 16 AS INTEGER) AS frame_idx,
             sqrt(sum(CAST(smp AS DOUBLE) * smp) / 16.0) AS rms
      FROM s GROUP BY vec_id, idx // 16
    ),
    act AS (
      SELECT vec_id, frame_idx, rms,
             avg(rms) OVER (PARTITION BY vec_id) AS thr
      FROM fr
    ),
    hit AS (SELECT vec_id, frame_idx, rms FROM act WHERE rms > thr),
    brk AS (
      SELECT vec_id, frame_idx, rms,
             CASE WHEN frame_idx - lag(frame_idx)
                    OVER (PARTITION BY vec_id ORDER BY frame_idx) = 1
                  THEN 0 ELSE 1 END AS b
      FROM hit
    ),
    grp AS (
      SELECT vec_id, frame_idx, rms,
             sum(b) OVER (PARTITION BY vec_id ORDER BY frame_idx) AS g
      FROM brk
    )
    SELECT vec_id,
           CAST(min(frame_idx) AS INTEGER) AS span_start,
           CAST(max(frame_idx) AS INTEGER) AS span_end,
           CAST(count(*) AS BIGINT) AS n_frames,
           round(sum(rms) / count(*), 6) AS mean_rms
    FROM grp GROUP BY vec_id, g
    """,
    doc="Voice-activity spans over the decoded WAV frames (the "
        "silence-trim / VAD segmentation step of an audio curation "
        "pipeline, composing the RIFF decode + frame-RMS machinery of "
        "multimodal_audio_rms with gaps-and-islands): a frame is "
        "'active' when its RMS exceeds the clip's own mean (adaptive, "
        "unitless threshold), consecutive active frames merge into "
        "spans with their frame count and mean energy.  Frame RMS is "
        "integer sample math + one sqrt — bit-identical IEEE both "
        "engines — so the oracle recomputes spans entirely from the "
        "render formula; the islands window is bounded by frames PER "
        "CLIP, never corpus size.",
)
def q_multimodal_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from pyspark.sql.window import Window

    from ..operators.multimodal import audio_frame_rms, encode_wav_pcm16

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def render(batches):
        for pdf in batches:
            payloads = []
            for vec in pdf["embedding"]:
                v = np.asarray(vec, dtype=np.float64)
                smp = np.floor(np.clip(v, -1.0, 1.0) * 32767.0 + 0.5
                               ).astype(np.int64)
                payloads.append(encode_wav_pcm16([int(x) for x in smp], 8000))
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "payload": payloads})

    rendered = emb.mapInPandas(render, schema="vec_id BIGINT, payload BINARY")
    fr = audio_frame_rms(rendered, "vec_id", frame=16)
    thr = Window.partitionBy("vec_id")
    hit = (fr.withColumn("thr", F.avg("rms").over(thr))
           .where(F.col("rms") > F.col("thr")))
    w = Window.partitionBy("vec_id").orderBy("frame_idx")
    brk = F.when(F.col("frame_idx") - F.lag("frame_idx").over(w) == 1,
                 F.lit(0)).otherwise(F.lit(1))
    grp = (hit.withColumn("_b", brk)
           .withColumn("_g", F.sum("_b").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (grp.groupBy("vec_id", "_g")
            .agg(F.min("frame_idx").cast("int").alias("span_start"),
                 F.max("frame_idx").cast("int").alias("span_end"),
                 F.count(F.lit(1)).alias("n_frames"),
                 F.round(F.sum("rms") / F.count(F.lit(1)), 6)
                  .alias("mean_rms"))
            .drop("_g"))
