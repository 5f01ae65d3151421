"""Registry surface for the multimodal plumbing.

The driver fixtures ship no media table, so mm01 derives a
deterministic binary column from the documents fixture (UTF-8 bytes of
the text) and runs the REAL metadata pass over it — binary length,
magic-byte sniff, hex head — oracle-checked byte-for-byte. mm02 runs
the Arrow decode/featurize pipeline (deterministic fake codec) over
the same payloads; its md5-derived features have no reasonable SQL
twin, so it registers rows-only and pytest pins determinism
(tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import register
from ..sources.catalog import load_table
from .binaryops import decode_and_featurize, extract_media_metadata


def _as_media(docs: DataFrame) -> DataFrame:
    """documents -> the MEDIA_SCHEMA shape with text bytes as payload."""
    return docs.select(
        F.col("doc_id").cast("string").alias("media_ref"),
        F.abs(F.hash("doc_id")).cast("long").alias("media_id"),
        F.lit("text").alias("kind"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


@register(
    "mm01_media_metadata",
    oracle="""
    SELECT CAST(doc_id AS VARCHAR) AS media_ref,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           upper(substring(hex(encode(text)), 1, 8)) AS head_hex,
           CAST(octet_length(encode(text)) AS BIGINT)
             - CAST(length(text) AS BIGINT) AS multibyte_overhead
    FROM documents
    """,
)
def mm01_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side binary metadata pass over opaque payloads: byte length
    (vs character length — the multibyte overhead column proves the
    binary path, not a string path), and the 4-byte magic head as hex —
    exactly what extract_media_metadata sniffs mime types from."""
    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs)
    return media.select(
        "media_ref",
        F.length("payload").cast("long").alias("n_bytes"),
        F.upper(F.hex(F.substring("payload", 1, 4))).alias("head_hex"),
        (
            F.length("payload").cast("long")
            - F.length(F.decode("payload", "UTF-8")).cast("long")
        ).alias("multibyte_overhead"),
    )


_MM02_FEAT_BYTES = ", ".join(
    f"('0x' || substring(md5(text), {2 * i + 1}, 2))::INT" for i in range(8)
)

_MM02_SQL = f"""
    SELECT CAST(doc_id AS VARCHAR) AS media_ref,
           'text' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           array_to_string([{_MM02_FEAT_BYTES}], ',') AS feat_bytes
    FROM documents
"""


@register("mm02_media_features", oracle=_MM02_SQL)
def mm02_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Arrow decode/featurize pipeline over binary payloads
    (mapInPandas, deterministic fake codec): schema, batch shape and
    null handling are the real thing — only the codec body is the
    documented stand-in. Hash-certified since round 8: the ARRAY
    feature column stays produced by the kernel and is consumed by a
    higher-order ``transform`` back to the exact md5 bytes
    (``round(f * 256)`` — each feature is the dyadic rational b/256,
    so the round-trip is exact, the dd07/dd19 guard-band argument with
    zero wobble), joined to a CSV the driver can hash; the key is the
    portable media_ref. mm07 remains the scalar-float twin keyed by
    doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs).withColumn(
        "media_id", F.col("media_ref").cast("long")
    ).select("media_id", "kind", "payload", "mime", "meta")
    out = decode_and_featurize(media, codec="fake")
    return out.select(
        F.col("media_id").cast("string").alias("media_ref"),
        "kind",
        "n_bytes",
        F.concat_ws(
            ",", F.expr("transform(features, f -> cast(round(f * 256) as int))")
        ).alias("feat_bytes"),
    )


_FRAME_BYTES = 256  # fake codec: fixed-size frames
_FRAME_STRIDE = 4  # keep every 4th frame


@register(
    "mm03_frame_sample",
    oracle=f"""
    WITH m AS (
        SELECT CAST(doc_id AS VARCHAR) AS media_ref,
               octet_length(encode(text)) AS nb,
               hex(encode(text)) AS hx
        FROM documents
    ),
    f AS (
        SELECT media_ref, nb, hx,
               UNNEST(range(0, CAST((nb + {_FRAME_BYTES - 1}) // {_FRAME_BYTES} AS BIGINT),
                            {_FRAME_STRIDE})) AS frame_idx
        FROM m WHERE nb > 0
    )
    SELECT media_ref,
           CAST(frame_idx AS BIGINT) AS frame_idx,
           CAST(LEAST({_FRAME_BYTES}, nb - frame_idx * {_FRAME_BYTES}) AS BIGINT) AS n_bytes,
           upper(substring(hx, frame_idx * {_FRAME_BYTES} * 2 + 1, 16)) AS head_hex
    FROM f
    """,
)
def mm03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: the fake
    codec treats the payload as consecutive 256-byte frames
    and keeps every 4th (the decimation step of a video
    ingestion pipeline), emitting one row per sampled frame with its
    byte length and 8-byte head. The Arrow plumbing is the real thing —
    ``mapInPandas`` receives binary batches, explodes them to variable
    per-row frame counts, and never shuttles payload bytes through
    Python objects row-at-a-time; swap the slicing body for a real
    decoder (pyav/ffmpeg) and nothing else changes. Because the fake
    codec is pure byte arithmetic, the output is fully oracle-checkable
    (DuckDB slices the hex encoding) — the plumbing gets a hard driver
    signal, unlike a stubbed NotImplementedError."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs).select("media_ref", "payload")

    def sample_frames(batches):
        for batch in batches:
            refs, idxs, sizes, heads = [], [], [], []
            for ref, payload in zip(batch["media_ref"], batch["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                n_frames = (len(payload) + _FRAME_BYTES - 1) // _FRAME_BYTES
                for i in range(0, n_frames, _FRAME_STRIDE):
                    chunk = payload[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                    refs.append(ref)
                    idxs.append(i)
                    sizes.append(len(chunk))
                    heads.append(chunk[:8].hex().upper())
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idxs, "n_bytes": sizes, "head_hex": heads}
            )

    return media.mapInPandas(
        sample_frames,
        schema="media_ref string, frame_idx long, n_bytes long, head_hex string",
    )


_WIN_BYTES = 1024  # fake PCM: analysis window length
_HOP_BYTES = 512  # 50% overlap — the STFT framing shape


@register(
    "mm04_audio_energy_windows",
    oracle=f"""
    WITH m AS (
        SELECT CAST(doc_id AS VARCHAR) AS media_ref,
               octet_length(encode(text)) AS nb,
               hex(encode(text)) AS hx
        FROM documents
    ),
    w AS (
        SELECT media_ref, nb, hx,
               UNNEST(range(0, CAST((nb + {_HOP_BYTES - 1}) // {_HOP_BYTES} AS BIGINT)))
                   AS window_idx
        FROM m WHERE nb > 0
    ),
    sliced AS (
        SELECT media_ref, window_idx,
               LEAST({_WIN_BYTES}, nb - window_idx * {_HOP_BYTES}) AS wlen,
               window_idx * {_HOP_BYTES} AS s,
               hx
        FROM w
    )
    SELECT media_ref,
           CAST(window_idx AS BIGINT) AS window_idx,
           CAST(wlen AS BIGINT) AS n_bytes,
           CAST(list_aggregate(list_transform(range(1, wlen + 1),
                    i -> ('0x' || substr(hx, 2 * (s + i - 1) + 1, 2))::INT), 'sum')
                AS BIGINT) AS energy,
           CAST(list_aggregate(list_transform(range(1, wlen + 1),
                    i -> ('0x' || substr(hx, 2 * (s + i - 1) + 1, 2))::INT), 'max')
                AS BIGINT) AS peak
    FROM sliced
    """,
)
def mm04_audio_energy_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style OVERLAPPING window features over opaque payloads:
    1024-byte analysis windows at a 512-byte hop (the 50%-overlap STFT
    framing), each summarized by integer energy (byte sum) and peak.
    Complements mm03's disjoint frame decimation: this is the shape a
    spectrogram/VAD front-end produces. One numpy pass per Arrow batch
    (`np.frombuffer`, no per-byte Python); integer features keep the
    whole pipeline oracle-checkable — DuckDB recomputes every window
    from the hex encoding. Zero shuffles; a real DSP kernel replaces
    the two reductions without touching schema or batching."""
    import numpy as np
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs).select("media_ref", "payload")

    def window_features(batches):
        for batch in batches:
            refs, idxs, sizes, energies, peaks = [], [], [], [], []
            for ref, payload in zip(batch["media_ref"], batch["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                arr = np.frombuffer(payload, dtype=np.uint8)
                n_windows = (len(arr) + _HOP_BYTES - 1) // _HOP_BYTES
                for wi in range(n_windows):
                    s = wi * _HOP_BYTES
                    win = arr[s : s + _WIN_BYTES]
                    refs.append(ref)
                    idxs.append(wi)
                    sizes.append(len(win))
                    energies.append(int(win.sum()))
                    peaks.append(int(win.max()))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "window_idx": idxs,
                    "n_bytes": sizes,
                    "energy": energies,
                    "peak": peaks,
                }
            )

    return media.mapInPandas(
        window_features,
        schema="media_ref string, window_idx long, n_bytes long, energy long, peak long",
    )


_MM05_BUDGET = 4096  # cost units (text tokens / media patch tokens) per batch


@register(
    "mm05_multimodal_batch_assembly",
    oracle=f"""
    WITH samples AS (
        SELECT 't' || CAST(doc_id AS VARCHAR) AS sample_id,
               source, 'text' AS modality,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS cost
        FROM documents
        UNION ALL
        SELECT 'm' || CAST(doc_id AS VARCHAR) AS sample_id,
               source, 'media' AS modality,
               64 + CAST(octet_length(encode(text)) AS BIGINT) // 16 AS cost
        FROM documents
    ),
    placed AS (
        SELECT source, modality, cost,
               (SUM(cost) OVER (PARTITION BY source
                    ORDER BY md5(sample_id), sample_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - cost) // {_MM05_BUDGET} AS bin
        FROM samples
    )
    SELECT source, CAST(bin AS BIGINT) AS bin,
           CAST(SUM(CASE WHEN modality = 'text' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_text,
           CAST(SUM(CASE WHEN modality = 'media' THEN 1 ELSE 0 END) AS BIGINT)
               AS n_media,
           CAST(SUM(CASE WHEN modality = 'text' THEN cost ELSE 0 END) AS BIGINT)
               AS text_cost,
           CAST(SUM(CASE WHEN modality = 'media' THEN cost ELSE 0 END) AS BIGINT)
               AS media_cost
    FROM placed
    GROUP BY source, bin
    """,
)
def mm05_multimodal_batch_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal training-batch assembly: text samples (cost = token
    count) and media samples (cost = 64 + payload bytes / 16 — the
    patch-token accounting of a vision encoder) interleave in a
    deterministic hash-shuffled order and pack into fixed-cost batches
    (tx10's windowed-cumsum move over a cross-modal union); output is
    the per-batch modality mix a dataloader contract is written
    against.

    Packing partitions by source, so each source assembles batches
    independently at scale — no global ordering. The media cost derives
    from BYTE length of the opaque payload (the mm01 binary path), not
    string length, which is what a real image/audio column would
    expose. A mix-ratio CONSTRAINT (e.g. media <= 50% of batch cost)
    would be a second swap pass over neighboring batches; the
    accounting columns here are exactly its input."""
    from ..functions import text as X

    docs = load_table(spark, sf_dir, "documents")
    text_side = docs.select(
        F.concat(F.lit("t"), F.col("doc_id").cast("string")).alias("sample_id"),
        "source",
        F.lit("text").alias("modality"),
        X.word_count().cast("long").alias("cost"),
    )
    media_side = _as_media(docs).join(
        docs.select(F.col("doc_id").cast("string").alias("media_ref"), "source"),
        "media_ref",
    ).select(
        F.concat(F.lit("m"), F.col("media_ref")).alias("sample_id"),
        "source",
        F.lit("media").alias("modality"),
        (F.lit(64) + F.expr("length(payload) div 16")).cast("long").alias("cost"),
    )
    samples = text_side.unionAll(media_side)
    placed = samples.select(
        "source",
        "modality",
        "cost",
        F.expr(
            f"(sum(cost) over (partition by source order by md5(sample_id), sample_id"
            f" rows between unbounded preceding and current row) - cost)"
            f" div {_MM05_BUDGET}"
        ).alias("bin"),
    )
    return placed.groupBy("source", F.col("bin").cast("long").alias("bin")).agg(
        F.sum(F.when(F.col("modality") == "text", 1).otherwise(0)).cast("long").alias("n_text"),
        F.sum(F.when(F.col("modality") == "media", 1).otherwise(0)).cast("long").alias("n_media"),
        F.sum(F.when(F.col("modality") == "text", F.col("cost")).otherwise(0)).cast("long").alias("text_cost"),
        F.sum(F.when(F.col("modality") == "media", F.col("cost")).otherwise(0)).cast("long").alias("media_cost"),
    )


_AHASH_BANDS = 4  # 4 x 16-bit band keys = the 64-bit aHash, band-major
_AHASH_MAXDIST = 6

# 64 evenly-spaced point samples of the payload (the fake decode's 8x8
# "grid"); bit i = sample_i strictly above the mean, compared as the
# integer cross-product 64*s_i > sum(s) so no float enters the hash.
# The fingerprint is materialized directly as four 16-bit band keys
# (never one 64-bit integer — bit 63 shifts overflow checked engines).
# LET-BOUND on the Spark side: `hx` as a plain alias would be inlined
# by CollapseProject into the lambda body and re-hex the whole payload
# once PER SAMPLE (64x per row, ~40 MB of transient strings per row on
# multi-KB payloads — OOMed the vanilla-1g driver session at sf0.1).
# The array-lambda binding evaluates hex(payload) exactly once.
_AHASH_SAMPLES = (
    "element_at(transform(array(hex(payload)), hx ->"
    " transform(sequence(0, 63), i -> cast(conv(substring(hx,"
    " cast((i * length(payload)) div 64 as int) * 2 + 1, 2), 16, 10)"
    " as bigint))), 1)"
)
_AHASH_SAMPLES_SQL = (
    "list_transform(range(0, 64), i -> ('0x' || substring(hx,"
    " CAST((i * nb) // 64 AS INTEGER) * 2 + 1, 2))::BIGINT)"
)


def _ahash_band(b: int) -> str:
    """Spark expr: 16-bit key for band b from samples `s` and total `tot`."""
    return (
        f"aggregate(zip_with(slice(s, {16 * b + 1}, 16), sequence(0, 15),"
        " (v, i) -> if(64 * v > tot, shiftleft(cast(1 as bigint), i),"
        " cast(0 as bigint))), cast(0 as bigint), (acc, x) -> acc + x)"
    )


def _ahash_band_sql(b: int) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(range(0, 16), i -> CASE WHEN"
        f" 64 * s[{16 * b} + i + 1] > tot THEN (CAST(1 AS BIGINT) << i)"
        " ELSE CAST(0 AS BIGINT) END)), (acc, x) -> acc + x)"
    )


@register(
    "mm06_perceptual_hash_pairs",
    oracle=f"""
    WITH m AS (
        SELECT CAST(doc_id AS VARCHAR) AS media_ref,
               CAST(octet_length(encode(text)) AS BIGINT) AS nb,
               hex(encode(text)) AS hx
        FROM documents
        WHERE octet_length(encode(text)) > 0
    ),
    sampled AS (
        SELECT media_ref, {_AHASH_SAMPLES_SQL} AS s FROM m
    ),
    tot AS (
        SELECT media_ref, s, list_reduce(s, (a, b) -> a + b) AS tot FROM sampled
    ),
    hashed AS (
        SELECT media_ref,
               {', '.join(f'{_ahash_band_sql(b)} AS b{b}' for b in range(_AHASH_BANDS))}
        FROM tot
    ),
    bands AS (
        {' UNION ALL '.join(f"SELECT media_ref, {b} AS band, b{b} AS band_key FROM hashed" for b in range(_AHASH_BANDS))}
    ),
    cands AS (
        SELECT DISTINCT a.media_ref AS ref_a, b.media_ref AS ref_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.band_key = b.band_key
         AND a.media_ref < b.media_ref
    )
    SELECT c.ref_a, c.ref_b,
           CAST(bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
              + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
             AS BIGINT) AS hamming
    FROM cands c
    JOIN hashed ha ON ha.media_ref = c.ref_a
    JOIN hashed hb ON hb.media_ref = c.ref_b
    WHERE bit_count(xor(ha.b0, hb.b0)) + bit_count(xor(ha.b1, hb.b1))
        + bit_count(xor(ha.b2, hb.b2)) + bit_count(xor(ha.b3, hb.b3))
        <= {_AHASH_MAXDIST}
    """,
)
def mm06_perceptual_hash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-duplicate detection over binary payloads —
    the image-dedup analog of the simhash text path (dd05/dd06), with
    a full oracle: the fake decode point-samples the payload at 64
    evenly-spaced offsets (the stand-in for an 8x8 downscaled
    grayscale grid), aHash bit i = sample strictly above the mean
    (compared as the integer cross-product 64*s_i > sum — no float
    enters the fingerprint), candidates come from 4x16-bit LSH band
    equi-joins, and survivors verify at Hamming distance <= 6 summed
    from per-band bit_count(xor). The fingerprint lives as four 16-bit
    keys end-to-end — the banding needs them split anyway, and checked
    engines reject the 1<<63 a single 64-bit pack would need. Swap the
    point-sampler for a real decoder's mean-pooled pixels and every
    stage after the hash is unchanged.

    Scale shape is exactly dd06's: fingerprints are one map-only pass
    over the scan (64 two-hex-char reads per payload), the only
    corpus-scale shuffle carries (16-bit key, ref) band rows, and the
    Hamming verify joins candidates back to the 4-short fingerprint
    table — never all pairs. Identical payloads collide on every band;
    near-identical ones need only one clean band (the pigeonhole
    guarantee at distance <= 3 across 4 bands; distance 4-6 pairs are
    best-effort, as in any banded LSH)."""
    docs = load_table(spark, sf_dir, "documents")
    m = _as_media(docs).select("media_ref", "payload").filter(
        F.length("payload") > 0
    )
    # checkpoint: cut the expression lineage so the tot/band projections
    # below operate on the MATERIALIZED 64-int array instead of
    # re-inlining the whole sampling expression per reference
    sampled = m.select("media_ref", F.expr(_AHASH_SAMPLES).alias("s")).localCheckpoint(
        eager=False
    )
    tot = sampled.select(
        "media_ref",
        "s",
        F.expr("aggregate(s, cast(0 as bigint), (a, b) -> a + b)").alias("tot"),
    )
    hashed = tot.select(
        "media_ref",
        *[F.expr(_ahash_band(b)).alias(f"b{b}") for b in range(_AHASH_BANDS)],
    ).localCheckpoint(eager=False)
    bands = hashed.select(
        "media_ref",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), F.col(f"b{b}").alias("band_key")
                    )
                    for b in range(_AHASH_BANDS)
                ]
            )
        ).alias("p"),
    ).select("media_ref", F.col("p.band").alias("band"), F.col("p.band_key").alias("band_key"))
    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.media_ref") < F.col("b.media_ref")),
        )
        .select(
            F.col("a.media_ref").alias("ref_a"),
            F.col("b.media_ref").alias("ref_b"),
        )
        .distinct()
    )
    ha = hashed.select(
        F.col("media_ref").alias("ref_a"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(_AHASH_BANDS)],
    )
    hb = hashed.select(
        F.col("media_ref").alias("ref_b"),
        *[F.col(f"b{b}").alias(f"bb{b}") for b in range(_AHASH_BANDS)],
    )
    hamming = sum(
        F.bit_count(F.expr(f"a{b} ^ bb{b}")) for b in range(_AHASH_BANDS)
    ).cast("long")
    return (
        cands.join(ha, "ref_a")
        .join(hb, "ref_b")
        .select("ref_a", "ref_b", hamming.alias("hamming"))
        .filter(F.col("hamming") <= _AHASH_MAXDIST)
    )


# ---------------------------------------------------------------------------
# mm07: the decode/featurize pipeline on the hard signal (round-6)
# ---------------------------------------------------------------------------

_MM07_FEATS = ",\n           ".join(
    f"((('0x' || substring(md5(text), {2 * i + 1}, 2))::INT) / 256.0) AS f{i}"
    for i in range(8)
)

_MM07_SQL = f"""
    SELECT doc_id,
           'text' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           {_MM07_FEATS}
    FROM documents
"""


@register("mm07_media_features_exact", oracle=_MM07_SQL)
def mm07_media_features_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mm02's Arrow decode/featurize pipeline value-hash-checked: the
    fake codec's features are md5-derived bytes scaled to [0,1) —
    fully deterministic — so the oracle reconstructs every feature in
    SQL (byte i of md5(payload) / 256.0, an exact dyadic rational in
    both engines). The mapInPandas batch path, null handling, and
    schema are mm02's verbatim (same decode_and_featurize call); the
    only differences are a portable join key (doc_id instead of the
    Spark-murmur3 media_id) and features unnested to scalar columns
    because the driver's canonicalizer cannot hash array cells (the
    ev09 lesson). mm02 stays registered as the production-shaped
    surface."""
    docs = load_table(spark, sf_dir, "documents")
    media = _as_media(docs).withColumn(
        "media_id", F.col("media_ref").cast("long")
    ).select("media_id", "kind", "payload", "mime", "meta")
    out = decode_and_featurize(media, codec="fake")
    return out.select(
        F.col("media_id").alias("doc_id"),
        "kind",
        "n_bytes",
        *[F.element_at("features", i + 1).alias(f"f{i}") for i in range(8)],
    )
