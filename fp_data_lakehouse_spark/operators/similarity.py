"""Similarity search over the embeddings table (array<float> column).

- sim01: brute-force cosine top-k — the exact baseline, oracle-checked
  against DuckDB with the dot/norm folds written in the identical
  sequential order on both sides (bit-identical doubles, no rounding).
- sim02: random-hyperplane LSH ANN — the scale path: bucket by sign
  bits of fixed projections, rank within buckets only. Approximate →
  rows-only driver check + pytest recall against sim01.
- sim03: nearest-centroid assignment (IVF coarse quantizer shape):
  centroids from the label column, exact assignment.

Scale notes: probes broadcast (they are the small side by definition);
the embedding table is scanned once per query, never self-joined. The
per-probe top-k goes through a window over the probe partition — with
P probes and N vectors the shuffle is the (probe, candidate) pairs
after bucket pruning, not P×N.
"""

from __future__ import annotations

import math
import hashlib
import random

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.catalog import load_table
from .registry import register

_DIM = 64
_TOP_K = 10
_N_PROBES = 5  # probe set: vec_id < 5

# Sequential left folds, identical shape on both engines → identical
# doubles. (No float reassociation: aggregate() is an ordered fold.)
_DOT = (
    "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0.0 as double), (acc, v) -> acc + v)"
)
_NORM = "sqrt(aggregate({v}, cast(0.0 as double), (acc, x) -> acc + x * x))"

_COSINE = f"{_DOT} / ({_NORM.format(v='a')} * {_NORM.format(v='b')})"

_DOT_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(range(1, 65), i -> a[i] * b[i])), (acc, v) -> acc + v)"
)
_NORM_SQL = (
    "sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform({v}, x -> x * x)), (acc, v) -> acc + v))"
)
_COSINE_SQL = f"{_DOT_SQL} / ({_NORM_SQL.format(v='a')} * {_NORM_SQL.format(v='b')})"


def _vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    # float32 -> float64 once, up front: fold arithmetic then matches
    # DuckDB's DOUBLE list math exactly (float->double is value-exact).
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec"), "label"
    )


@register(
    "sim01_cosine_topk_bruteforce",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    pairs AS (
        SELECT p.vec_id AS probe_id, c.vec_id AS candidate_id,
               p.vec AS a, c.vec AS b
        FROM v p JOIN v c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {_N_PROBES}
    ),
    scored AS (
        SELECT probe_id, candidate_id, {_COSINE_SQL} AS cosine
        FROM pairs
    )
    SELECT probe_id, candidate_id, cosine, rank FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cosine DESC, candidate_id ASC) AS rank
        FROM scored
    ) r
    WHERE rank <= {_TOP_K}
    """,
)
def sim01_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for probe vectors (vec_id < 5): broadcast the
    probes against one scan of the corpus, ordered-fold dot/norms,
    row_number top-k with a deterministic tie-break."""
    v = _vectors(spark, sf_dir)
    probes = v.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("vec").alias("a")
    )
    cands = v.select(F.col("vec_id").alias("candidate_id"), F.col("vec").alias("b"))
    scored = (
        cands.join(F.broadcast(probes), F.col("candidate_id") != F.col("probe_id"))
        .withColumn("cosine", F.expr(_COSINE))
        .select("probe_id", "candidate_id", "cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "candidate_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (sign-bit buckets)
# ---------------------------------------------------------------------------

_LSH_BANDS = 8
_LSH_BITS = 4  # bits per band -> 16 buckets per band; 8 chances to collide
# (recall for a neighbor with bit-agreement p is 1-(1-p^4)^8: ~0.83 at
# p=2/3, ~0.99 at p=0.8 — measured ~0.14 with the 4x6 configuration)

# Fixed hyperplanes baked at import from a seeded RNG: identical on every
# executor, every run, every engine.
_rng = random.Random(20240801)
_PLANES = [
    [_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(_LSH_BANDS * _LSH_BITS)
]


def _band_keys_col(vec_col: str = "vec") -> F.Column:
    """All band bucket ids of a vector at once: array of _LSH_BANDS ints,
    each in [0, 2^bits).

    Arrow-vectorized: one numpy GEMM against the fixed hyperplane matrix
    per batch, sign bits packed per band. The expression-tree version
    (32 literal 64-element arrays, one interpreted dot fold each) costs
    seconds of plan analysis per query and runs row-at-a-time; sign
    flips vs the sequential fold would need |dot| ~ 1 ulp and only move
    candidates between buckets (verification stays exact)."""
    planes = np.array(_PLANES, dtype=np.float64)  # (bands*bits, dim)
    weights = 1 << np.arange(_LSH_BITS)

    @F.pandas_udf("array<int>")
    def band_keys(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy()).astype(np.float64)
        sign_bits = (mat @ planes.T) > 0  # (n, bands*bits)
        keys = sign_bits.reshape(len(mat), _LSH_BANDS, _LSH_BITS) @ weights
        return pd.Series(list(keys.astype(np.int32)))

    return band_keys(vec_col)


@register("sim02_cosine_topk_lsh")
def sim02_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via random-hyperplane LSH: candidates share a sign-bit
    bucket with the probe in at least one of 8 bands; exact cosine
    re-ranking within candidates only.

    At 100 TB the bucket equi-join replaces the P×N cross product with
    Σ per-bucket |probes|·|candidates|; recall tunes with bands × bits (8×4 here)
    (pytest measures it against sim01 on the clustered fixture).
    Approximate — no SQL oracle; the driver records rows-only.
    """
    v = _vectors(spark, sf_dir)
    # lazy checkpoint: probes and candidates both read this subtree
    banded = v.select(
        "vec_id", "vec", F.posexplode(_band_keys_col("vec")).alias("band", "key")
    ).localCheckpoint(eager=False)

    probes = banded.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("vec").alias("a"), "band", "key"
    )
    cands = banded.select(
        F.col("vec_id").alias("candidate_id"), F.col("vec").alias("b"), "band", "key"
    )
    pairs = (
        cands.join(F.broadcast(probes), ["band", "key"])
        .filter(F.col("candidate_id") != F.col("probe_id"))
        .select("probe_id", "candidate_id", "a", "b")
        .dropDuplicates(["probe_id", "candidate_id"])
    )
    scored = pairs.withColumn("cosine", F.expr(_COSINE)).select(
        "probe_id", "candidate_id", "cosine"
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "candidate_id", "cosine", "rank")
    )


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors with a fixed summation order (vec_id),
    so both engines fold identically — the IVF coarse quantizer."""
    v = _vectors(spark, sf_dir)
    per_label = v.groupBy("label").agg(
        F.expr("sort_array(collect_list(struct(vec_id, vec)))").alias("vs"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_label.select(
        F.col("label").alias("centroid_label"),
        F.expr(
            "transform(sequence(1, 64), i -> aggregate(vs, cast(0.0 as double),"
            " (acc, s) -> acc + element_at(s.vec, i)) / n)"
        ).alias("cvec"),
    )


# nprobe/|centroids| is the scanned-corpus fraction AND the recall lever:
# measured on the fixture (weakly clustered noise, 10 label buckets)
# recall was 0.38/0.48/0.66 at nprobe 2/3/4 — on real clustered
# embeddings the curve is far steeper. 4 of 10 buckets here.
_IVF_NPROBE = 4


_SIM04_SQL = f"""
WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
grouped AS (
    SELECT label AS centroid_label, list(vec ORDER BY vec_id) AS vlist, COUNT(*) AS n
    FROM v GROUP BY label
),
centroids AS (
    SELECT centroid_label,
           list_transform(range(1, 65),
               i -> list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                        list_transform(vlist, vv -> vv[i])), (acc, x) -> acc + x) / n)
           AS cvec
    FROM grouped
),
apairs AS (
    SELECT v.vec_id, c.centroid_label, v.vec AS a, c.cvec AS b
    FROM v CROSS JOIN centroids c
),
ascored AS (
    SELECT vec_id, centroid_label, {_COSINE_SQL} AS cosine FROM apairs
),
assigned AS (
    SELECT vec_id, centroid_label AS bucket FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cosine DESC, centroid_label ASC) AS rn
        FROM ascored
    ) WHERE rn = 1
),
rpairs AS (
    SELECT v.vec_id AS probe_id, c.centroid_label, v.vec AS a, c.cvec AS b
    FROM v CROSS JOIN centroids c
    WHERE v.vec_id < {_N_PROBES}
),
rscored AS (
    SELECT probe_id, centroid_label, {_COSINE_SQL} AS c_cos FROM rpairs
),
routed AS (
    SELECT probe_id, centroid_label AS bucket FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY c_cos DESC, centroid_label ASC) AS rn
        FROM rscored
    ) WHERE rn <= {_IVF_NPROBE}
),
cpairs AS (
    SELECT r.probe_id, cv.vec_id AS candidate_id, pv.vec AS a, cv.vec AS b
    FROM routed r
    JOIN assigned asg ON asg.bucket = r.bucket
    JOIN v cv ON cv.vec_id = asg.vec_id AND cv.vec_id <> r.probe_id
    JOIN v pv ON pv.vec_id = r.probe_id
),
scored AS (
    SELECT probe_id, candidate_id, {_COSINE_SQL} AS cosine FROM cpairs
)
SELECT probe_id, candidate_id, cosine, rank
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
               ORDER BY cosine DESC, candidate_id) AS rank
    FROM scored
)
WHERE rank <= {_TOP_K}
"""


@register("sim04_cosine_topk_ivf", oracle=_SIM04_SQL)
def sim04_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via an IVF index: the corpus is partitioned into
    centroid buckets (the sim03 coarse quantizer), each probe searches
    only its nprobe nearest centroids' buckets (_IVF_NPROBE), and
    exact cosine re-ranks the candidates.

    The scale shape: candidate volume is (nprobe / n_centroids) of the
    corpus per probe, tunable independently of recall-per-bucket; the
    probe→bucket routing is a broadcast of |centroids| rows and the
    candidate join is an equi-join on the centroid id.

    Oracle-backed since round 6 (it was rows-only by oversight, not
    necessity): every float in the pipeline — centroid means, routing
    cosines, rerank cosines — already folds in a fixed order on both
    engines (the sim03/sim01 machinery), so the APPROXIMATE operator's
    exact candidate set and ranking are value-hash-checkable, the
    sim08 pattern. pytest still measures recall against sim01."""
    v = _vectors(spark, sf_dir)
    assigned = sim03_label_centroid_assignment(spark, sf_dir).select(
        "vec_id", F.col("assigned_label").alias("bucket")
    )
    corpus = v.join(assigned, "vec_id").select(
        F.col("vec_id").alias("candidate_id"), F.col("vec").alias("b"), "bucket"
    )

    # route each probe to its nprobe nearest centroid buckets
    centroids = _centroids(spark, sf_dir)
    probes = v.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), F.col("vec").alias("a")
    )
    routed = (
        probes.crossJoin(F.broadcast(centroids.select(F.col("centroid_label").alias("bucket"), F.col("cvec").alias("b"))))
        .withColumn("c_cos", F.expr(_COSINE))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("probe_id").orderBy(F.desc("c_cos"), F.asc("bucket"))
            ),
        )
        .filter(F.col("rn") <= _IVF_NPROBE)
        .select("probe_id", "a", "bucket")
    )

    scored = (
        corpus.join(F.broadcast(routed), "bucket")
        .filter(F.col("candidate_id") != F.col("probe_id"))
        .withColumn("cosine", F.expr(_COSINE))
        .select("probe_id", "candidate_id", "cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "candidate_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Nearest-centroid assignment (IVF coarse quantizer shape)
# ---------------------------------------------------------------------------


@register(
    "sim03_label_centroid_assignment",
    oracle=f"""
    WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    grouped AS (
        SELECT label AS centroid_label, list(vec ORDER BY vec_id) AS vlist, COUNT(*) AS n
        FROM v GROUP BY label
    ),
    centroids AS (
        SELECT centroid_label,
               list_transform(range(1, 65),
                   i -> list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                            list_transform(vlist, vv -> vv[i])), (acc, x) -> acc + x) / n)
               AS cvec
        FROM grouped
    ),
    pairs AS (
        SELECT v.vec_id, v.label, c.centroid_label, v.vec AS a, c.cvec AS b
        FROM v CROSS JOIN centroids c
    ),
    scored AS (
        SELECT vec_id, label, centroid_label, {_COSINE_SQL} AS cosine FROM pairs
    )
    SELECT vec_id, label, centroid_label AS assigned_label, cosine FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY cosine DESC, centroid_label ASC) AS rn
        FROM scored
    ) r WHERE rn = 1
    """,
)
def sim03_label_centroid_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each vector to its nearest label centroid by cosine — the
    coarse-quantizer step of an IVF index, exact and oracle-checked.

    Centroid = elementwise mean with a fixed summation order (vec_id) so
    both engines fold identically; assignment broadcasts the |labels|
    centroids against one corpus scan.
    """
    v = _vectors(spark, sf_dir)
    centroids = _centroids(spark, sf_dir)
    scored = (
        v.select("vec_id", "label", F.col("vec").alias("a"))
        .crossJoin(F.broadcast(centroids.select("centroid_label", F.col("cvec").alias("b"))))
        .withColumn("cosine", F.expr(_COSINE))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("centroid_label"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "label", F.col("centroid_label").alias("assigned_label"), "cosine")
    )


_KMEANS_K = 8

_SQDIST_SQL = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    " list_transform(range(1, 65), i -> (a[i] - b[i]) * (a[i] - b[i]))),"
    " (acc, v) -> acc + v)"
)


def _kmeans_assign(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by squared Euclidean distance
    (sequential fold — bit-identical on both engines), centroid id as
    the deterministic tie-break. All |K| centroids travel as ONE
    broadcast row and the argmin is a row-local ``array_min`` over
    ``struct(d, cid)`` (struct ordering = the (d asc, cid asc)
    tie-break), so assignment is map-only — the former per-vector
    window argmin exchanged and sorted the n x k candidate pairs every
    Lloyd iteration (measured 0.83 -> 0.52 s per assign at sf0.1).
    The distance fold is the same zip_with/aggregate chain, so d is
    bit-identical."""
    packed = centroids.agg(F.expr("collect_list(struct(cid, cvec))").alias("cs"))
    best = (
        "array_min(transform(cs, c -> struct("
        "aggregate(zip_with(a, c.cvec, (x, y) -> (x - y) * (x - y)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
        " AS d, c.cid AS cid)))"
    )
    return (
        vectors.select("vec_id", F.col("vec").alias("a"))
        .crossJoin(F.broadcast(packed))
        .withColumn("best", F.expr(best))
        .select("vec_id", F.col("best.cid").alias("cid"), F.col("best.d").alias("d"))
    )


def _kmeans_update(vectors: DataFrame, assign: DataFrame) -> DataFrame:
    """Mean of each cluster's members in fixed vec_id order (exact
    parity fold, as _centroids). Clusters that lose all members drop —
    the standard dead-centroid policy made explicit. At 100 TB the
    oracle-exact ordered fold gives way to per-dimension SUM/COUNT
    partial aggregation (order-dependent floats, mergeable partials) —
    same math, no parity guarantee."""
    m = (
        vectors.join(assign.select("vec_id", "cid"), "vec_id")
        .groupBy("cid")
        .agg(
            F.expr("sort_array(collect_list(struct(vec_id, vec)))").alias("vs"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return m.select(
        "cid",
        F.expr(
            f"transform(sequence(1, {_DIM}), i -> aggregate(vs, cast(0.0 as double),"
            " (acc, s) -> acc + element_at(s.vec, i)) / n)"
        ).alias("cvec"),
    )


@register(
    "sim05_kmeans_lloyd_step",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    c0 AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < {_KMEANS_K}),
    d1 AS (
        SELECT v.vec_id, c0.cid, {_SQDIST_SQL.replace('a[i]', 'v.vec[i]').replace('b[i]', 'c0.cvec[i]')} AS d
        FROM v CROSS JOIN c0
    ),
    a1 AS (
        SELECT vec_id, cid FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
            FROM d1
        ) r WHERE rn = 1
    ),
    m AS (
        SELECT cid, list(vec ORDER BY vec_id) AS vs, COUNT(*) AS n
        FROM v JOIN a1 USING (vec_id) GROUP BY cid
    ),
    c1 AS (
        SELECT cid, list_transform(range(1, {_DIM + 1}), i ->
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(vs, s -> s[i])), (acc, x) -> acc + x) / n)
               AS cvec
        FROM m
    ),
    d2 AS (
        SELECT v.vec_id, c1.cid, {_SQDIST_SQL.replace('a[i]', 'v.vec[i]').replace('b[i]', 'c1.cvec[i]')} AS d
        FROM v CROSS JOIN c1
    )
    SELECT vec_id, cid AS cluster_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM d2
    ) r WHERE rn = 1
    """,
)
def sim05_kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE exactly-reproducible Lloyd iteration of k-means (k=8,
    deterministic seeding from the first k vec_ids): assign all vectors
    to their nearest centroid, recompute centroids as member means in a
    FIXED summation order, re-assign, emit the new assignment. Every
    float op is an ordered fold mirrored in the oracle, so an
    inherently-iterative ML kernel lands on the hard hash-equality
    signal — the single-step anchor that sim06's free-running loop is
    verified against in pytest.

    Scale shape per iteration: one broadcast of k rows + a map-side
    distance argmin (no shuffle of the corpus), one groupBy(k) for the
    update. The ordered-fold update buffers each cluster's members
    (the price of cross-engine exactness); sim06 documents the
    production alternative."""
    v = _vectors(spark, sf_dir)
    c0 = v.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    a1 = _kmeans_assign(v, c0)
    c1 = _kmeans_update(v, a1)
    a2 = _kmeans_assign(v, c1)
    return a2.select("vec_id", F.col("cid").alias("cluster_id"))


_KMEANS_MAX_ITER = 10


@register("sim06_kmeans_train")
def sim06_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full k-means training loop: Lloyd iterations from the sim05 seed
    until assignments stabilize or 10 rounds, returning per-cluster
    size and inertia (sum of squared distances). The iterative-ML
    driver pattern on DataFrames: per-round ``localCheckpoint`` cuts
    the growing lineage (as dd09), the ONLY per-round driver traffic is
    the single changed-count long, and each round is one k-row
    broadcast + one k-group aggregate — the corpus never re-shuffles.
    Float folds across rounds compound ulps, so the free-running loop
    is rows-only for the driver; pytest anchors round 1 to sim05's
    hash-exact step and asserts monotone non-increasing inertia."""
    v = _vectors(spark, sf_dir).localCheckpoint(eager=False)
    centroids = v.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    assign = _kmeans_assign(v, centroids).localCheckpoint(eager=False)
    for _ in range(_KMEANS_MAX_ITER - 1):
        centroids = _kmeans_update(v, assign)
        new_assign = _kmeans_assign(v, centroids).localCheckpoint(eager=False)
        changed = (
            new_assign.alias("n")
            .join(assign.alias("o"), "vec_id")
            .filter(F.col("n.cid") != F.col("o.cid"))
            .count()
        )
        assign = new_assign
        if changed == 0:
            break
    return assign.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("d").alias("inertia"),
    )


@register(
    "sim07_int8_quantize",
    oracle="""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    s AS (
        SELECT vec_id, vec,
               list_max(list_transform(vec, x -> abs(x))) AS max_abs
        FROM v
    )
    SELECT vec_id,
           CASE WHEN max_abs = 0 THEN 0.0 ELSE 127.0 / max_abs END AS scale,
           CAST(len(vec) AS INTEGER) AS n_dims,
           array_to_string(
               list_transform(vec, x -> CAST(floor(
                   x * (CASE WHEN max_abs = 0 THEN 0.0 ELSE 127.0 / max_abs END)
                   + 0.5) AS BIGINT)), ',') AS q_csv
    FROM s
    """,
)
def sim07_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization — per-vector scale
    127/max|x|, elements round-half-up to [-127, 127] — the 4x storage
    and bandwidth compression step every large-scale ANN index applies
    before sharding vectors (IVF-PQ's simpler cousin; scale stored
    alongside for dequantization).

    Map-only: no shuffle at any corpus size, whole row stays in one
    expression pipeline. Both engines run identical IEEE-754 ops
    (exact float->double widening, one multiply, floor(x+0.5)), so the
    quantized codes match exactly; they ship as a CSV string because
    the driver's pandas canonicalizer can't hash array cells (the ev09
    lesson). The scale guard keeps all-zero vectors at code 0 rather
    than inf."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    scale = (
        "CASE WHEN array_max(transform(vec, x -> abs(x))) = 0d THEN 0d"
        " ELSE cast(127.0 as double) / array_max(transform(vec, x -> abs(x))) END"
    )
    # LET-BIND the scale (see _SHINGLES note in dedup.py): referenced
    # inside the per-element lambda, a plain alias would be inlined and
    # re-run array_max once per element (O(d^2) per row).
    q_csv = (
        f"element_at(transform(array({scale}), s ->"
        " concat_ws(',', transform(vec, x ->"
        " cast(cast(floor(x * s + 0.5d) as bigint) as string)))), 1)"
    )
    return v.select(
        "vec_id",
        F.expr(scale).alias("scale"),
        F.size("vec").alias("n_dims"),
        F.expr(q_csv).alias("q_csv"),
    )


# ---------------------------------------------------------------------------
# sim08: max-inner-product search over int8 codes
# ---------------------------------------------------------------------------

_S8_SCALE = (
    "CASE WHEN array_max(transform(vec, x -> abs(x))) = 0d THEN 0d"
    " ELSE cast(127.0 as double) / array_max(transform(vec, x -> abs(x))) END"
)
_S8_SCALE_SQL = (
    "CASE WHEN list_max(list_transform(vec, x -> abs(x))) = 0 THEN 0.0"
    " ELSE 127.0 / list_max(list_transform(vec, x -> abs(x))) END"
)


@register(
    "sim08_int8_mips_topk",
    oracle=f"""
    WITH v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    q AS (
        SELECT vec_id,
               {_S8_SCALE_SQL} AS scale,
               list_transform(vec, x -> CAST(floor(
                   x * ({_S8_SCALE_SQL}) + 0.5) AS BIGINT)) AS code
        FROM v
    ),
    scored AS (
        SELECT p.vec_id AS probe_id,
               c.vec_id AS candidate_id,
               CAST(list_sum(list_transform(list_zip(p.code, c.code),
                    s -> s[1] * s[2])) AS BIGINT) AS int_dot,
               CAST(list_sum(list_transform(list_zip(p.code, c.code),
                    s -> s[1] * s[2])) AS DOUBLE)
                   / (p.scale * c.scale) AS approx_dot
        FROM q p JOIN q c ON c.vec_id <> p.vec_id
        WHERE p.vec_id < {_N_PROBES} AND p.scale > 0 AND c.scale > 0
    )
    SELECT probe_id, candidate_id, int_dot, approx_dot, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY approx_dot DESC, candidate_id) AS rank
        FROM scored
    )
    WHERE rank <= {_TOP_K}
    """,
)
def sim08_int8_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate max-inner-product search over sim07's int8 codes:
    score = integer code dot product dequantized by the two per-vector
    scales — the memory-bandwidth-bound kernel of a quantized ANN
    serving tier (4x smaller vectors, integer multiply-adds). Exactness
    across engines: codes are integers, the dot product is an exact
    integer, and the dequantization is two IEEE multiplies and one
    divide — so even this APPROXIMATE operator carries a bit-exact SQL
    oracle; what is approximated is the float inner product, and pytest
    bounds that error against the exact sim01 scores.

    Plan: probes broadcast against one corpus scan (same shape as
    sim01), integer fold per pair, per-probe top-k window. At corpus
    scale the candidate side would first be cut by an IVF/LSH bucket
    (sim02/sim04); the quantized kernel is unchanged."""
    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("vec")
    )
    code_expr = (
        f"element_at(transform(array({_S8_SCALE}), s ->"
        " transform(vec, x -> cast(floor(x * s + 0.5d) as bigint))), 1)"
    )
    q = v.select(
        "vec_id",
        F.expr(_S8_SCALE).alias("scale"),
        F.expr(code_expr).alias("code"),
    ).filter(F.col("scale") > 0)
    probes = q.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"),
        F.col("scale").alias("p_scale"),
        F.col("code").alias("p_code"),
    )
    scored = (
        q.select(
            F.col("vec_id").alias("candidate_id"),
            F.col("scale").alias("c_scale"),
            F.col("code").alias("c_code"),
        )
        .join(F.broadcast(probes), F.col("candidate_id") != F.col("probe_id"))
        .withColumn(
            "int_dot",
            F.expr(
                "aggregate(zip_with(p_code, c_code, (x, y) -> x * y),"
                " cast(0 as bigint), (acc, v) -> acc + v)"
            ),
        )
        .withColumn(
            "approx_dot",
            F.col("int_dot").cast("double") / (F.col("p_scale") * F.col("c_scale")),
        )
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("approx_dot"), F.asc("candidate_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "candidate_id", "int_dot", "approx_dot", "rank")
    )


# Product quantization geometry: M subspaces x SUBDIM dims, K_PQ
# centroids per subspace, seeded deterministically from the first K_PQ
# vectors (sim05's seeding convention) so the whole codebook — and
# therefore every code and every ADC distance — is engine-exact.
_PQ_M = 4
_PQ_SUBDIM = _DIM // _PQ_M
_PQ_K = 16
_PQ_TOPK = 10
_PQ_QUERY_ID = 0

_SUBDIST = (
    "aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),"
    " cast(0.0 as double), (acc, v) -> acc + v)"
)
_SUBDIST_SQL = (
    f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE),"
    f" list_transform(range(1, {_PQ_SUBDIM + 1}), i -> (a[i] - b[i]) * (a[i] - b[i]))),"
    " (acc, v) -> acc + v)"
)


@register(
    "sim09_pq_adc_topk",
    oracle=f"""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings),
    sub AS (
        SELECT v.vec_id, m.m,
               list_slice(v.vec, m.m * {_PQ_SUBDIM} + 1, (m.m + 1) * {_PQ_SUBDIM}) AS s
        FROM v CROSS JOIN (SELECT unnest(range({_PQ_M})) AS m) m
    ),
    cb AS (
        SELECT m, vec_id AS cid, s AS c FROM sub WHERE vec_id < {_PQ_K}
    ),
    dists AS (
        SELECT sub.vec_id, sub.m, cb.cid,
               {_SUBDIST_SQL.replace('a[i]', 'sub.s[i]').replace('b[i]', 'cb.c[i]')} AS d
        FROM sub JOIN cb USING (m)
    ),
    enc AS (
        SELECT vec_id, m, cid AS code FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id, m
                                         ORDER BY d ASC, cid ASC) AS rn
            FROM dists
        ) r WHERE rn = 1
    ),
    q AS (SELECT m, s AS qs FROM sub WHERE vec_id = {_PQ_QUERY_ID}),
    adc AS (
        SELECT cb.m, cb.cid,
               {_SUBDIST_SQL.replace('a[i]', 'q.qs[i]').replace('b[i]', 'cb.c[i]')} AS d
        FROM cb JOIN q USING (m)
    ),
    approx AS (
        SELECT e.vec_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(a.d ORDER BY e.m)),
                           (acc, x) -> acc + x) AS approx_dist
        FROM enc e JOIN adc a ON e.m = a.m AND e.code = a.cid
        GROUP BY e.vec_id
    ),
    qfull AS (SELECT vec FROM v WHERE vec_id = {_PQ_QUERY_ID}),
    exact AS (
        SELECT v.vec_id,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                   list_transform(range(1, {_DIM + 1}),
                                  i -> (v.vec[i] - q.vec[i]) * (v.vec[i] - q.vec[i]))),
                   (acc, x) -> acc + x) AS exact_dist
        FROM v CROSS JOIN qfull q
    )
    SELECT rnk, vec_id, approx_dist, exact_dist FROM (
        SELECT a.vec_id, a.approx_dist, e.exact_dist,
               ROW_NUMBER() OVER (ORDER BY a.approx_dist ASC, a.vec_id ASC) AS rnk
        FROM approx a JOIN exact e USING (vec_id)
        WHERE a.vec_id <> {_PQ_QUERY_ID}
    ) r WHERE rnk <= {_PQ_TOPK}
    """,
)
def sim09_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN: split the 64-dim embedding into 4
    subspaces of 16 dims, encode every vector as 4 nibble codes (nearest
    of 16 per-subspace centroids, deterministically seeded from the
    first 16 vectors), then answer a top-10 query by ASYMMETRIC DISTANCE
    COMPUTATION — the query precomputes its distance to each of the
    4 x 16 codebook entries and every corpus vector's approximate
    distance is just 4 table lookups summed. The exact distance rides
    along for a per-row error readout.

    This is the memory story that makes billion-vector ANN feasible:
    64 floats (256 B) compress to 4 codes (2 B, 128x), and the scan
    side of a query never touches the original vectors — at 100 TB the
    codes table is the only thing read per query, with the codebook
    (64 rows) and the ADC lookup table (64 doubles) broadcast. Encoding
    is one corpus scan against the broadcast codebook (argmin per
    subspace, no shuffle); every float reduction is an ordered fold
    mirrored by the oracle, so codes, ADC distances, and the final
    ranking are all hash-exact across engines. In production the
    codebook comes from k-means per subspace (sim05/sim06 are exactly
    that machinery); the seeded codebook keeps the demonstration
    end-to-end exact."""
    v = _vectors(spark, sf_dir)
    msubs = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice("vec", m * _PQ_SUBDIM + 1, _PQ_SUBDIM).alias("s"),
            )
            for m in range(_PQ_M)
        ]
    )
    sub = v.select("vec_id", F.explode(msubs).alias("p")).select(
        "vec_id", F.col("p.m").alias("m"), F.col("p.s").alias("s")
    )
    cb = sub.filter(F.col("vec_id") < _PQ_K).select(
        "m", F.col("vec_id").alias("cid"), F.col("s").alias("c")
    )
    dists = (
        sub.join(F.broadcast(cb), "m")
        .withColumn(
            "d",
            F.expr(
                _SUBDIST.replace("zip_with(a, b", "zip_with(s, c")
            ),
        )
    )
    wenc = Window.partitionBy("vec_id", "m").orderBy(F.asc("d"), F.asc("cid"))
    enc = (
        dists.withColumn("rn", F.row_number().over(wenc))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m", F.col("cid").alias("code"))
    )
    q = sub.filter(F.col("vec_id") == _PQ_QUERY_ID).select(
        "m", F.col("s").alias("qs")
    )
    adc = (
        cb.join(F.broadcast(q), "m")
        .withColumn(
            "d", F.expr(_SUBDIST.replace("zip_with(a, b", "zip_with(qs, c"))
        )
        .select("m", "cid", "d")
    )
    approx = (
        enc.join(F.broadcast(adc), (enc.m == adc.m) & (enc.code == adc.cid))
        .select("vec_id", enc.m.alias("m"), "d")
        .groupBy("vec_id")
        .agg(
            F.expr(
                "aggregate(array_sort(collect_list(struct(m, d))),"
                " cast(0.0 as double), (acc, x) -> acc + x.d)"
            ).alias("approx_dist")
        )
    )
    qfull = v.filter(F.col("vec_id") == _PQ_QUERY_ID).select(
        F.col("vec").alias("qvec")
    )
    exact = (
        v.crossJoin(F.broadcast(qfull))
        .withColumn(
            "exact_dist",
            F.expr(_SUBDIST.replace("zip_with(a, b", "zip_with(vec, qvec")),
        )
        .select("vec_id", "exact_dist")
    )
    wtop = Window.orderBy(F.asc("approx_dist"), F.asc("vec_id"))
    return (
        approx.filter(F.col("vec_id") != _PQ_QUERY_ID)
        .join(exact, "vec_id")
        .withColumn("rnk", F.row_number().over(wtop))
        .filter(F.col("rnk") <= _PQ_TOPK)
        .select("rnk", "vec_id", "approx_dist", "exact_dist")
    )


# ---------------------------------------------------------------------------
# sim10: hyperplane LSH over int8 codes — the banding mechanism on the
# hard signal (round-6 coverage)
# ---------------------------------------------------------------------------

# sim02's float-GEMM banding can't carry an oracle (BLAS pairwise sums
# vs a SQL sequential fold differ in last-ulp terms, and a 1-ulp sign
# flip moves a vector between buckets). This variant quantizes first
# (sim07's int8 codes, oracle-proven engine-exact) and uses ±1 integer
# hyperplanes derived from md5 parity — the band keys are then PURE
# INTEGER arithmetic, identical in any fold order, so the whole
# bucket -> candidate -> exact-rerank pipeline is value-hash-checkable.
# Production trade: int8 sign banding is also the cheaper kernel
# (integer adds on 4x-compressed codes), so this is the form a
# bandwidth-bound 100 TB index would actually run.

_S10_PLANES = _LSH_BANDS * _LSH_BITS  # 32 planes


# The int8-banding CTE chain (quantize -> ±1-plane integer dots ->
# band keys) shared by the sim10 search certificate and dd29's banded
# near-dup-pairs certificate in operators/dedup.py.
_INT8_KEYS_CTES = f"""v AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, vec,
               {_S8_SCALE_SQL} AS scale,
               list_transform(vec, x -> CAST(floor(
                   x * ({_S8_SCALE_SQL}) + 0.5) AS BIGINT)) AS code
        FROM v
    ),
    qa AS (SELECT * FROM q WHERE scale > 0),
    cl AS (
        SELECT vec_id, i.i, code[i.i] AS c
        FROM qa CROSS JOIN (SELECT unnest(range(1, {_DIM} + 1)) AS i) i
    ),
    planes AS (
        SELECT p.p, i.i,
               CASE WHEN (('0x' || substring(md5(p.p || '_' || i.i), 1, 1))::INT)
                         % 2 = 0 THEN 1 ELSE -1 END AS sgn
        FROM (SELECT unnest(range(0, {_S10_PLANES})) AS p) p
        CROSS JOIN (SELECT unnest(range(1, {_DIM} + 1)) AS i) i
    ),
    dots AS (
        SELECT cl.vec_id, pl.p, SUM(cl.c * pl.sgn) AS dot
        FROM cl JOIN planes pl ON cl.i = pl.i
        GROUP BY cl.vec_id, pl.p
    ),
    keys AS (
        SELECT vec_id, p // {_LSH_BITS} AS band,
               CAST(SUM(CASE WHEN dot > 0
                             THEN (1 << (p % {_LSH_BITS})) ELSE 0 END) AS BIGINT)
                   AS key
        FROM dots GROUP BY vec_id, p // {_LSH_BITS}
    )"""


def _int8_band_keys(spark: SparkSession, sf_dir: str):
    """(qa, keys): the int8 quantization frame and its engine-exact
    hyperplane band keys — shared by sim10 (search certificate) and
    dd29 (banded near-dup-pairs certificate). Integer dots against
    md5-parity ±1 planes make the keys identical in any fold order."""
    v = _vectors(spark, sf_dir)
    code_expr = (
        f"element_at(transform(array({_S8_SCALE}), s ->"
        " transform(vec, x -> cast(floor(x * s + 0.5d) as bigint))), 1)"
    )
    qa = v.select(
        "vec_id",
        "vec",
        F.expr(_S8_SCALE).alias("scale"),
        F.expr(code_expr).alias("code"),
    ).filter(F.col("scale") > 0)

    cl = qa.select(
        "vec_id", F.posexplode("code").alias("i0", "c")
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "c")
    planes = (
        spark.range(_S10_PLANES)
        .select(F.col("id").alias("p"))
        .crossJoin(spark.range(1, _DIM + 1).select(F.col("id").alias("i")))
        .select(
            "p",
            "i",
            F.when(
                F.expr(
                    "cast(conv(substring(md5(concat(cast(p as string), '_',"
                    " cast(i as string))), 1, 1), 16, 10) as int) % 2"
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .alias("sgn"),
        )
    )
    dots = (
        cl.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("c") * F.col("sgn")).alias("dot"))
    )
    keys = (
        dots.groupBy(
            "vec_id", (F.col("p") / _LSH_BITS).cast("long").alias("band")
        )
        .agg(
            F.sum(
                F.expr(
                    f"CASE WHEN dot > 0 THEN"
                    f" shiftleft(1, cast(p % {_LSH_BITS} as int)) ELSE 0 END"
                )
            )
            .cast("long")
            .alias("key")
        )
    )
    return qa, keys


def _sim10_oracle() -> str:
    return f"""
    WITH {_INT8_KEYS_CTES},
    cand AS (
        SELECT DISTINCT pk.vec_id AS probe_id, ck.vec_id AS candidate_id
        FROM keys pk JOIN keys ck
          ON pk.band = ck.band AND pk.key = ck.key
         AND pk.vec_id < {_N_PROBES} AND ck.vec_id <> pk.vec_id
    ),
    scored AS (
        SELECT c.probe_id, c.candidate_id,
               (SELECT {_COSINE_SQL} FROM (SELECT pa.vec AS a, pb.vec AS b))
                   AS cosine
        FROM cand c
        JOIN qa pa ON pa.vec_id = c.probe_id
        JOIN qa pb ON pb.vec_id = c.candidate_id
    )
    SELECT probe_id, candidate_id, cosine, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY cosine DESC, candidate_id) AS rank
        FROM scored
    )
    WHERE rank <= {_TOP_K}
    """


@register("sim10_int8_hyperplane_lsh", oracle=_sim10_oracle())
def sim10_int8_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-10 via sign-bit hyperplane LSH computed on int8 codes
    with md5-parity ±1 planes — sim02's banding mechanism made
    engine-exact (integer dots can't suffer the float sign-flip that
    keeps sim02 rows-only), then exact-cosine reranked within the
    bucket candidates using sim01's proven fold pair.

    Plan: codes explode to (vec_id, dim, code) and join the 32x64
    plane relation (a broadcast constant), two integer aggregations
    rebuild the band keys, probes broadcast into the bucket equi-join,
    rerank touches candidates only. Every shuffle carries ids +
    integers; at corpus scale this is the same Σ per-bucket
    |probes|·|candidates| cost shape as sim02 with a 4x smaller
    candidate payload."""
    qa, keys = _int8_band_keys(spark, sf_dir)
    probe_keys = keys.filter(F.col("vec_id") < _N_PROBES).select(
        F.col("vec_id").alias("probe_id"), "band", "key"
    )
    cand = (
        keys.select(F.col("vec_id").alias("candidate_id"), "band", "key")
        .join(F.broadcast(probe_keys), ["band", "key"])
        .filter(F.col("candidate_id") != F.col("probe_id"))
        .select("probe_id", "candidate_id")
        .distinct()
    )
    va = qa.select(F.col("vec_id").alias("probe_id"), F.col("vec").alias("a"))
    vb = qa.select(F.col("vec_id").alias("candidate_id"), F.col("vec").alias("b"))
    scored = (
        cand.join(F.broadcast(va), "probe_id")
        .join(vb, "candidate_id")
        .withColumn("cosine", F.expr(_COSINE))
        .select("probe_id", "candidate_id", "cosine")
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("candidate_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _TOP_K)
        .select("probe_id", "candidate_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# sim11: the k-means TRAINING LOOP on the hard signal (round-6 coverage)
# ---------------------------------------------------------------------------


def _sim11_oracle() -> str:
    """sim06's Lloyd loop unrolled to the full _KMEANS_MAX_ITER rounds.
    Lloyd from a deterministic seed is a FIXPOINT iteration of sim05's
    hash-exact step: once assignments stabilize, the ordered-fold
    update reproduces the same centroids and the next assignment is
    identical — so the 10-round unrolled closed form equals the
    early-stopping loop regardless of which round it converged in,
    and 'float folds compound across rounds' is no obstacle (both
    engines compound the SAME folds)."""
    dist = _SQDIST_SQL.replace("a[i]", "v.vec[i]")
    ctes = [
        f"v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cid, vec AS cvec FROM v WHERE vec_id < {_KMEANS_K})",
        f"""d1 AS (
        SELECT v.vec_id, c0.cid, {dist.replace('b[i]', 'c0.cvec[i]')} AS d
        FROM v CROSS JOIN c0)""",
        """a1 AS (
        SELECT vec_id, cid, d FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
            FROM d1) r WHERE rn = 1)""",
    ]
    for t in range(2, _KMEANS_MAX_ITER + 1):
        ctes.append(f"""m{t} AS (
        SELECT cid, list(vec ORDER BY vec_id) AS vs, COUNT(*) AS n
        FROM v JOIN a{t - 1} USING (vec_id) GROUP BY cid)""")
        ctes.append(f"""c{t} AS (
        SELECT cid, list_transform(range(1, {_DIM + 1}), i ->
                   list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                       list_transform(vs, s -> s[i])), (acc, x) -> acc + x) / n)
               AS cvec
        FROM m{t})""")
        ctes.append(f"""d{t} AS (
        SELECT v.vec_id, c{t}.cid, {dist.replace('b[i]', f'c{t}.cvec[i]')} AS d
        FROM v CROSS JOIN c{t})""")
        ctes.append(f"""a{t} AS (
        SELECT vec_id, cid, d FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
            FROM d{t}) r WHERE rn = 1)""")
    chain = ",\n    ".join(ctes)
    last = f"a{_KMEANS_MAX_ITER}"
    return f"""
    WITH {chain}
    SELECT cid AS cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(d ORDER BY vec_id)),
               (acc, x) -> acc + x) AS inertia
    FROM {last}
    GROUP BY cid
    """


@register("sim11_kmeans_train_exact", oracle=_sim11_oracle())
def sim11_kmeans_train_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sim06's FULL k-means training loop on the hard signal: same
    deterministic seed, same hash-exact per-round step (sim05's
    machinery), same early stop — but the final per-cluster rollup
    folds inertia in vec_id order so the output, not just each step,
    is engine-exact. The oracle unrolls all 10 Lloyd rounds as chained
    CTEs; the fixpoint property (converged assignments reproduce
    themselves through the ordered-fold update) makes the unrolled
    closed form equal the early-stopping loop — the pr03 move applied
    to iterative ML training. sim06 stays the production form
    (codegen'd unordered sums, same plan shape)."""
    v = _vectors(spark, sf_dir).localCheckpoint(eager=False)
    centroids = v.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("vec").alias("cvec")
    )
    assign = _kmeans_assign(v, centroids).localCheckpoint(eager=False)
    for _ in range(_KMEANS_MAX_ITER - 1):
        centroids = _kmeans_update(v, assign)
        new_assign = _kmeans_assign(v, centroids).localCheckpoint(eager=False)
        changed = (
            new_assign.alias("n")
            .join(assign.alias("o"), "vec_id")
            .filter(F.col("n.cid") != F.col("o.cid"))
            .count()
        )
        assign = new_assign
        if changed == 0:
            break
    return assign.groupBy(F.col("cid").alias("cluster_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(vec_id, d))),"
            " cast(0.0 as double), (acc, x) -> acc + x.d)"
        ).alias("inertia"),
    )
