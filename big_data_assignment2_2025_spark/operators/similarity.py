"""Similarity search over embedding columns (``array<float>``).

LLM-data-pipeline extension (SURVEY.md §7.6). Two paths:

- **brute-force top-k** (the correctness baseline): query-set × corpus
  cosine via native zip_with/aggregate expressions, ranked per query with a
  window. Exact; cost O(|Q| * N * d). Right answer for small |Q|; the
  corpus side stays distributed, queries broadcast.
- **LSH-bucketed** (the scale path): random-hyperplane signatures — sign
  bits of dot products against ``n_planes`` pseudo-random ±1 hyperplanes
  derived deterministically from md5, so any engine reproduces them.
  Neighbor candidates come from equal signature buckets (optionally with
  multi-probe by flipping one bit); exact cosine re-ranks within buckets.
  At 100 TB the bucket join replaces the N×Q cross product with
  |bucket collisions|.

Cosine near-dup for *pair* discovery (dedup use case) lives here too,
blocked by a key column to bound the pair space.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.vectors import cosine_similarity
from ..sources.readers import fan_out
from .dedup import hash64


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors of each query vector.

    Broadcast the (small) query set against the distributed corpus; rank
    with a per-query window. Ties broken by neighbor id; cosine rounded to
    6 decimals so ranking survives float-accumulation differences across
    engines.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def hyperplane_signature(
    vec: Column, n_planes: int = 8, dim: int | None = None
) -> Column:
    """Deterministic random-hyperplane LSH signature (int in [0, 2^n)).

    Plane p's component for dimension d is +1 if hash64(f"{p}:{d}") is odd
    else -1 — reproducible in any engine with md5. Signature bit p = 1 iff
    dot(vec, plane_p) > 0. ``dim=None`` (default) derives the dimension
    from each vector at runtime (``size(vec)``), so a regenerated fixture
    with a different embedding width needs no code change.
    """
    # NB: the lambda must take exactly ONE parameter — F.transform treats a
    # two-parameter lambda as (element, index), so capturing the plane id via
    # a default arg (lambda d, p=p: ...) silently binds p to the array index.
    hi = F.lit(dim - 1) if dim is not None else F.size(vec) - 1

    def _terms(p: int) -> Column:
        return F.transform(
            F.sequence(F.lit(0), hi),
            lambda d: F.element_at(vec, d + 1).cast("double")
            * F.when(
                hash64(F.concat(F.lit(f"{p}:"), d.cast("string"))) % 2 == 1, F.lit(1.0)
            ).otherwise(F.lit(-1.0)),
        )

    bits = []
    for p in range(n_planes):
        dot_p = F.aggregate(_terms(p), F.lit(0.0), lambda a, x: a + x)
        bits.append(F.when(dot_p > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; exact
    cosine re-ranks candidates. Queries whose bucket holds < k neighbors
    return fewer rows — the standard ANN recall trade-off (raise recall
    with fewer planes or multi-probe)."""
    sig = lambda df, name: df.select(  # noqa: E731
        F.col(id_col).alias(name),
        F.col(vec_col).alias(f"{name}_vec"),
        hyperplane_signature(F.col(vec_col), n_planes, dim).alias("bucket"),
    )
    c = sig(fan_out(corpus), "neighbor_id")
    q = sig(queries, "query_id")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _assign_cells(
    df: DataFrame,
    cents: DataFrame,
    n_probe: int,
    name: str,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Rank centroids by (rounded) cosine per vector; keep the top n_probe
    cell assignments. Ties broken by centroid id — deterministic."""
    scored = (
        df.select(F.col(id_col).alias(name), F.col(vec_col).alias(f"{name}_vec"))
        .crossJoin(F.broadcast(cents))
        .select(
            name,
            f"{name}_vec",
            "cell",
            F.round(
                cosine_similarity(F.col(f"{name}_vec"), F.col("cent_vec")), 6
            ).alias("cent_cos"),
        )
    )
    w = W.partitionBy(name).orderBy(F.col("cent_cos").desc(), F.col("cell").asc())
    return (
        scored.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= n_probe)
        .drop("_r", "cent_cos")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer (the ``n_cells``
    lowest-id corpus vectors as deterministic centroids) partitions the
    corpus into cells; each query probes its ``n_probe`` nearest cells and
    exact cosine re-ranks only those candidates.

    Scale story: corpus cell assignment is one broadcast pass (centroid set
    is tiny); the search join touches ``n_probe / n_cells`` of the corpus per
    query instead of all of it, and the cell column is a plain int — at
    100 TB you would write the corpus bucketed/partitioned BY cell so probes
    prune at the scan. Deterministic by construction (no trained kmeans), so
    the DuckDB oracle replays it exactly.
    """
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec"))
    )
    c = _assign_cells(fan_out(corpus), cents, 1, "neighbor_id", id_col, vec_col)
    q = _assign_cells(queries, cents, n_probe, "query_id", id_col, vec_col)
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6
            ).alias("cosine"),
        )
        .distinct()  # a (query, neighbor) pair can meet in several probed cells
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_kmeans_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF with TRAINED centroids (MLlib KMeans) — the production variant of
    ``ivf_topk``: learned cells track the data distribution, so recall at
    the same n_probe is higher than the deterministic lowest-id quantizer.

    Not oracle-checkable (a trained model isn't SQL-replayable); verified
    instead by a recall bound against brute force in
    tests/test_ivf_kmeans.py — the same discipline as the MLlib MinHashLSH
    cross-validation. Train cost is one pass over a sample; assignment and
    search reuse the exact ``ivf_topk`` plan shape with the learned
    centroid table swapped in."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    train = corpus.select(
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=10).fit(train)
    cents_rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cents = corpus.sparkSession.createDataFrame(
        cents_rows, ["cell", "cent_vec"]
    ).select("cell", F.col("cent_vec").cast(f"array<double>").alias("cent_vec"))

    c = _assign_cells(fan_out(corpus), cents, 1, "neighbor_id", id_col, vec_col)
    q = _assign_cells(queries, cents, n_probe, "query_id", id_col, vec_col)
    scored = (
        c.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("query_id_vec"), F.col("neighbor_id_vec")), 6
            ).alias("cosine"),
        )
        .distinct()
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within blocking groups.

    Blocking bounds the pair space to sum(|block|^2) — the practical
    pattern when a cheap partition key exists (source, language, shard).
    Exact within each block."""
    a = fan_out(df).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("id1") < F.col("id2"))
        .select(
            "blk",
            "id1",
            "id2",
            F.round(cosine_similarity(F.col("v1"), F.col("v2")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def argmax_cell_assignment(
    corpus: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """MAP-ONLY nearest-centroid assignment: the ``n_cells`` lowest-id
    vectors collapse to ONE broadcast array row, and each vector's cell
    is an argmax fold inside the scan projection — zero shuffle, unlike
    ``_assign_cells``' windowed rank (fine for a tiny query set, wrong
    for a pass that touches ALL N vectors). Ties keep the lowest cell
    id, matching ``_assign_cells``' (cos DESC, cell ASC) ordering.

    Returns (cell, vid, vid_vec) for every corpus vector.
    """
    cents_row = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("cell"), F.col("cent_vec")))
            ).alias("cents")
        )
    )

    vec = F.col("vid_vec")

    def _nearer(acc, c):
        cs = F.round(cosine_similarity(vec, c["cent_vec"]), 6)
        return F.when(
            cs > acc["cos"],
            F.struct(cs.alias("cos"), c["cell"].alias("cell")),
        ).otherwise(acc)

    return (
        fan_out(corpus)
        .select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vid_vec"))
        .crossJoin(F.broadcast(cents_row))
        .select(
            F.aggregate(
                "cents",
                F.struct(
                    F.lit(-2.0).alias("cos"),
                    F.lit(-1).cast("long").alias("cell"),
                ),
                _nearer,
            )["cell"].alias("cell"),
            "vid",
            "vid_vec",
        )
    )


#: default expected cell occupancy for the scale-aware quantizer: k =
#: ceil(n / TARGET_CELL_ROWS) keeps within-cell pair work at
#: ~n * (TARGET_CELL_ROWS - 1) / 2 — linear in the corpus. 50 keeps the
#: DuckDB oracle's within-cell join cheap at every shipped fixture while
#: differing from the fixed-k twin's 8 cells at sf0.01 (k=10), so the
#: scaled gate is not vacuously the fixed gate.
TARGET_CELL_ROWS = 50


def derive_n_cells(n: int, target_cell_rows: int = TARGET_CELL_ROWS) -> int:
    """The scale-aware SemDeDup cell count, k = max(1, ceil(n / target)).
    THE single definition — semantic_dedup, the scale probe's two
    measurement sites and the oracle SQL (as a literal) must all agree,
    or the probe measures a different configuration than the operator
    ships."""
    return max(1, -(-n // target_cell_rows))


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int | None = None,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    target_cell_rows: int = TARGET_CELL_ROWS,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space into cells, then mark
    as duplicates the within-cell vectors whose cosine to a *lower-id*
    cellmate clears ``threshold`` — the cluster step bounds the pair
    space to sum(|cell|^2) instead of N^2, which is what makes semantic
    dedup tractable on a 100 TB corpus (the paper prunes LAION/C4 the
    same way: k-means first, pairwise cosine only inside each cluster).

    ``n_cells=None`` (the default) derives the cell count from the
    corpus: ``k = max(1, ceil(n / target_cell_rows))`` — the paper's own
    regime (k grows with n, e.g. 50k clusters for LAION-440M). This is
    the only 100 TB-viable default: a FIXED k means cell occupancy grows
    ∝ n and within-cell pairs ∝ n² (measured: tools/scale_probe.py r9
    saw 10.01x pair growth at a 10x corpus with k=8, vs ~10x with
    scaled k). Deriving k costs one column-pruned count job at
    plan-construction time; callers that already know the corpus size —
    or need a plan with no eager work — pass ``n_cells`` explicitly.

    Deviations from the paper, for engine-replayable determinism: the
    coarse quantizer is the ``ivf_topk`` one (the ``n_cells`` lowest-id
    vectors as centroids — swap in the MLlib-trained centroids of
    ``ivf_kmeans_topk`` in production) and the keeper of a duplicate
    group is the lowest id (the paper keeps the centroid-farthest
    example; keep-lowest-id matches this repo's canonical-keeper
    discipline in ``dedup_keep_canonical`` and is order-independent).

    Returns every corpus vector with its cell, a ``kept`` flag, and the
    number of lower-id cellmates within ``threshold`` (0 for kept rows).

    Scale shape: cell assignment is MAP-ONLY — the centroid set is
    collapsed to a single broadcast array row and the nearest cell is an
    argmax folded inside the scan projection (``ivf_topk``'s windowed
    rank would shuffle every vector on its own id; a dedup pass touches
    ALL N vectors, so that shuffle is the difference between one
    map-stage and re-partitioning the corpus three times). The only
    shuffles left are the pair join on the int cell key and one
    cell-local aggregation. At 100 TB, write the corpus partitioned BY
    cell so the pair join is partition-local with no cross-cell traffic.

    The returned frame is LAZY and nothing is persisted: the verdict is
    ONE left join — every vector against its lower-id cellmates clearing
    the threshold, folded straight into a count — so the assignment scan
    is derived exactly twice (once per join side), not three times as the
    earlier join-back-for-zero-rows shape did. (ReusedExchange cannot
    dedupe the sides here: the argmax projection's higher-order-function
    lambdas defeat plan canonicalization, so identical branches don't
    unify.) Earlier revisions instead persisted the assignment and
    eagerly counted the result, which charged plan-only callers a full
    job and leaked one cache entry per call; at production scale the
    right materialization is writing the assignment out partitioned by
    cell, not executor cache.
    """
    if n_cells is None:
        n = corpus.select(id_col).count()
        n_cells = derive_n_cells(n, target_cell_rows)
    assigned = argmax_cell_assignment(
        corpus, n_cells=n_cells, id_col=id_col, vec_col=vec_col
    )
    a = assigned.select(
        F.col("cell").alias("a_cell"),
        F.col("vid").alias("id1"),
        F.col("vid_vec").alias("v1"),
    )
    b = assigned.select("cell", F.col("vid").alias("id2"), F.col("vid_vec").alias("v2"))
    cond = (
        (F.col("a_cell") == F.col("cell"))
        & (F.col("id1") < F.col("id2"))
        & (
            F.round(cosine_similarity(F.col("v1"), F.col("v2")), 6)
            >= threshold
        )
    )
    return (
        b.join(a, cond, "left")
        .groupBy("cell", "id2")
        .agg(F.count("id1").alias("n_dup_lower"))
        .select(
            "cell",
            F.col("id2").alias(id_col),
            F.col("n_dup_lower").cast("long").alias("n_dup_lower"),
            F.when(F.col("n_dup_lower") == 0, 1).otherwise(0).alias("kept"),
        )
    )
