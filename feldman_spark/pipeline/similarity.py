"""Approximate-nearest-neighbor search over an embedding column.

Beyond-reference capability: top-k cosine similarity search over
``array<float>`` embeddings.

* :func:`cosine_topk` — brute force: one distributed pass, per-row dot
  product via ``zip_with``/``aggregate`` (JVM-side, no Python), global
  top-k via window rank. The correctness baseline at any scale that can
  afford a full scan.
* :func:`lsh_partitioned_topk` — the scale path: random-hyperplane LSH
  buckets (deterministic md5-derived hyperplanes) prune the scan to
  matching buckets; recall < 1.0, cost ~ bucket fraction of the corpus.
"""

from __future__ import annotations

from typing import List, Sequence

# seed-pass over-collect bound for ivf_build's num_centroids=None
# auto-sizing: covers N ≲ _KMV_CAP · target_cluster_rows (~2M rows at
# the default target) with exact-or-KMV sizing in ONE collect of at
# most this many (id, vector, hash) rows
_KMV_CAP = 8192

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_topk",
    "lsh_partitioned_topk",
    "hyperplane_signature",
    "ivf_assign",
    "ivf_build",
    "ivf_bucket_stats",
    "ivf_drift_report",
    "ivf_topk",
    "ivf_write",
    "ivf_read",
    "pq_train",
    "pq_encode",
    "pq_decode",
    "pq_topk",
    "ivf_pq_topk",
    "quantize_embeddings",
    "dequantize_embeddings",
    "group_centroids",
    "knn_join",
]


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(v: Column) -> Column:
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x))


def _safe_norm(v: Column) -> Column:
    """Norm clamped away from zero: an all-zero vector gets norm 1 so its
    cosine is 0.0 instead of an ANSI DIVIDE_BY_ZERO (dot is already 0)."""
    n = _norm(v)
    return F.when(n == 0, F.lit(1.0)).otherwise(n)


def cosine_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    digits: int = 6,
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector. The query
    is a plan literal (no join), so the scan is one stage; ties broken by
    id for determinism."""
    q = [float(x) for x in query_vec]
    qn = sum(x * x for x in q) ** 0.5
    v = _as_double(F.col(vec_col))
    qcol = F.array(*[F.lit(x) for x in q])
    cos = F.round(_dot(v, qcol) / (_safe_norm(v) * F.lit(qn or 1.0)), digits)
    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(
    vec: Column, dim: int, num_planes: int = 8, seed: str = "ivf",
) -> Column:
    """Deterministic random-hyperplane LSH signature: plane p's component
    for dimension d is +1/-1 by the high bit of md5('{seed}:{p}:{d}').
    Pseudo-random, reproducible across engines and runs — signatures of a
    growing corpus never need recomputation."""
    import hashlib

    def sign(p: int, d: int) -> float:
        h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
        return 1.0 if int(h[0], 16) >= 8 else -1.0

    bits = []
    for p in range(num_planes):
        plane = F.array(*[F.lit(sign(p, d)) for d in range(dim)])
        bits.append(F.when(_dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def lsh_partitioned_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_planes: int = 8,
    probe_hamming: int = 1,
    digits: int = 6,
) -> DataFrame:
    """IVF-style ANN: scan only rows whose hyperplane signature is within
    ``probe_hamming`` of the query's signature (multi-probe). With 8
    planes and 1-bit probing this scans ~9/256 of the corpus. Recall is
    approximate — the contract of ANN; the brute-force path is the oracle.
    ``probe_hamming == num_planes`` probes every signature and is therefore
    EXACTLY brute force — the value-level oracle twin (`knn_lsh_exact`)."""
    from itertools import combinations
    from math import comb as _comb

    q = [float(x) for x in query_vec]
    dim = len(q)
    v = _as_double(F.col(vec_col))
    signed = df.withColumn("_sig", hyperplane_signature(v, dim, num_planes))

    qrow = signed.sparkSession.createDataFrame([(q,)], f"qv: array<double>")
    qsig = qrow.select(
        hyperplane_signature(F.col("qv"), dim, num_planes).alias("s")
    ).first()["s"]

    # Enumerating sum_{i<=h} C(planes, i) probe signatures is fine for the
    # default 8 planes (<=256 literals) but combinatorial for wide
    # signatures (32 planes / hamming 8 ~ 15M literals would blow up the
    # plan before any data is scanned). Past the cap, filter on hamming
    # distance computed in-plan instead of an isin() enumeration — same
    # rows scanned, O(num_planes) expression size, at the cost of losing
    # literal-level pruning.
    MAX_PROBE_ENUM = 4096
    n_probes = sum(
        _comb(num_planes, i) for i in range(min(probe_hamming, num_planes) + 1)
    )
    if n_probes > MAX_PROBE_ENUM:
        hamming = sum(
            (F.substring(F.col("_sig"), i + 1, 1) != F.lit(qsig[i])).cast("int")
            for i in range(num_planes)
        )
        sig_filter = hamming <= probe_hamming
    else:
        probes = set()
        for nbits in range(min(probe_hamming, num_planes) + 1):
            for idxs in combinations(range(num_planes), nbits):
                s = list(qsig)
                for i in idxs:
                    s[i] = "0" if s[i] == "1" else "1"
                probes.add("".join(s))
        sig_filter = F.col("_sig").isin(list(probes))

    qn = sum(x * x for x in q) ** 0.5
    qcol = F.array(*[F.lit(x) for x in q])
    cos = F.round(_dot(v, qcol) / (_safe_norm(v) * F.lit(qn or 1.0)), digits)
    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        signed.filter(sig_filter)
        .select(F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_assign(df: DataFrame, centroids, vec_col: str = "embedding") -> DataFrame:
    """Assign vectors to their nearest (max-cosine) centroid: the input
    plus a ``cid`` bucket column. One corpus pass against the broadcast
    C×d centroid matrix (vectorized numpy matmul per Arrow batch), no
    shuffle. This is also the incremental-growth path for a materialized
    index: assign a new batch with the FROZEN centroids and append it
    ``partitionBy("cid")`` onto the :func:`ivf_write` layout — existing
    signatures/buckets never need recomputation."""
    import numpy as np

    cmat = np.array(centroids, dtype=np.float64)
    b = df.sparkSession.sparkContext.broadcast(cmat)
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", cid int"

    def assign(batches):
        import pandas as pd

        c = b.value
        for pdf in batches:
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1, keepdims=True)
            xn[xn == 0] = 1.0
            sims = (x / xn) @ c.T
            pdf = pdf.copy()
            pdf["cid"] = sims.argmax(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, schema=out_schema)


def ivf_build(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: "int | None" = 16,
    iters: int = 2,
    target_cluster_rows: int = 256,
    sizing: str = "capacity",
):
    """IVF index build: spherical k-means with deterministic seeding.

    Initial centroids are the vectors whose ``xxhash64(id)`` is smallest —
    a reproducible pseudo-random sample, no RNG state. Each iteration is
    one distributed pass: assignment by max cosine against the broadcast
    centroid matrix (vectorized ``numpy`` matmul per Arrow batch), then
    new centroids as the mean of assigned L2-normalized vectors. The
    centroid matrix is C×d doubles — driver/broadcast-sized for any
    realistic C.

    ``num_centroids=None`` auto-sizes by ``sizing`` rule:

    * ``"capacity"`` (default): ``max(8, ceil(N / target_cluster_rows))``
      — constant expected cluster occupancy, the right shape for a
      SEARCH index (probe cost ∝ cluster rows). Note the build's
      assignment pass is N·C·d, so this rule makes the one-time build
      quadratic in N — acceptable for an index built once and probed
      many times.
    * ``"balanced"``: ``max(8, ceil(√(N / iters)))`` — minimizes total
      flops for consumers that pay BOTH the assignment (iters·N·C·d)
      and a within-cluster quadratic pass (N²·d/C, e.g. the SemDeDup
      prune): d·N·(iters·C + N/C) is minimal at C* = √(N/iters), and
      both terms stay O(N^1.5) as the corpus grows instead of O(N²).

    Either way sizing needs N WITHOUT a separate ``count()`` pass:
    the seed job over-collects the ``_KMV_CAP`` smallest-hash rows, and
    because xxhash64 values are uniform, the k smallest of N hashes give
    N two ways in one action — exactly (fewer than the cap came back ⇒
    the collected rows ARE the corpus) or via the k-minimum-values
    estimate N̂ = (k−1)/u_k (Bar-Yossef et al. 2002), u_k the largest
    collected hash mapped to (0,1). Sizing then reuses the collected
    prefix as the seed sample; only when the auto-sized C exceeds the
    cap (≳2M rows at the default target) does a second exact seed pass
    run.

    Returns ``(assigned, centroids)``: the input with a ``cid`` bucket
    column, and the centroid matrix as a list of lists. At corpus scale,
    persist ``assigned`` partitioned/bucketed by ``cid`` so that probing
    reads only the matching files.

    Each k-means iteration is ONE corpus pass: the assignment
    ``mapInPandas`` pre-aggregates per-Arrow-batch (cid, count,
    sum-of-normalized-vectors) partials, so the only shuffle moves
    ~``batches × C`` tiny rows into a single ``groupBy(cid)`` whose
    element-wise array sum is a ``zip_with`` fold — never the corpus
    itself (the earlier posexplode formulation shuffled corpus × dim
    rows twice per iteration).
    """
    import math

    import numpy as np

    hashed = df.select(id_col, vec_col).withColumn(
        "_h", F.xxhash64(F.col(id_col)))
    if num_centroids is None:
        rows = hashed.orderBy("_h").limit(_KMV_CAP).collect()
        if len(rows) < _KMV_CAP:
            n_est = len(rows)  # the whole corpus fit under the cap: exact
        else:
            # signed 64-bit hash -> uniform u_k in (0, 1)
            u_k = (rows[-1]["_h"] + 2**63 + 1) / 2.0**64
            n_est = int((_KMV_CAP - 1) / u_k)
        if sizing == "balanced":
            num_centroids = max(8, math.ceil(
                math.sqrt(n_est / max(iters, 1))))
        elif sizing == "capacity":
            num_centroids = max(8, math.ceil(n_est / target_cluster_rows))
        else:
            raise ValueError(
                f"ivf_build: unknown sizing rule {sizing!r} "
                "(expected 'capacity' or 'balanced')")
        seeds = (rows[:num_centroids] if num_centroids <= len(rows)
                 else hashed.orderBy("_h").limit(num_centroids).collect())
    else:
        seeds = hashed.orderBy("_h").limit(num_centroids).collect()
    cents = np.array([r[vec_col] for r in seeds], dtype=np.float64)
    seed_norms = np.linalg.norm(cents, axis=1, keepdims=True)
    seed_norms[seed_norms == 0] = 1.0  # an all-zero seed must not NaN-poison assignment
    cents /= seed_norms
    dim = cents.shape[1]

    spark = df.sparkSession
    # slim iteration frame: only the vector column, cached across passes
    vecs = df.select(vec_col).persist()

    def partials_with(cmat: "np.ndarray") -> DataFrame:
        b = spark.sparkContext.broadcast(cmat)

        def stats(batches):
            import pandas as pd

            c = b.value
            for pdf in batches:
                x = np.array(list(pdf[vec_col]), dtype=np.float64)
                xn = np.linalg.norm(x, axis=1, keepdims=True)
                xn[xn == 0] = 1.0
                u = x / xn
                cid = (u @ c.T).argmax(axis=1)
                cids, ns, sums = [], [], []
                for k in np.unique(cid):
                    mask = cid == k
                    cids.append(int(k))
                    ns.append(int(mask.sum()))
                    sums.append([float(v) for v in u[mask].sum(axis=0)])
                yield pd.DataFrame({"cid": cids, "n": ns, "s": sums})

        return vecs.mapInPandas(stats, schema="cid int, n bigint, s array<double>")

    zero = F.array_repeat(F.lit(0.0), dim)
    for _ in range(iters):
        # mean of normalized members per bucket; empty buckets keep their
        # previous centroid (argmax assignment can abandon a seed)
        rows = (
            partials_with(cents)
            .groupBy("cid")
            .agg(
                F.sum("n").alias("n"),
                F.aggregate(
                    F.collect_list("s"), zero,
                    lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
                ).alias("s"),
            )
            .collect()
        )
        new = cents.copy()
        for r in rows:
            m = np.array(r["s"], dtype=np.float64) / r["n"]
            n = np.linalg.norm(m)
            if n > 0:
                new[r["cid"]] = m / n
        cents = new
    vecs.unpersist()

    return ivf_assign(df, cents, vec_col), [list(map(float, c)) for c in cents]


def ivf_topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_centroids: int = 16,
    nprobe: int = 2,
    iters: int = 2,
    digits: int = 6,
    index=None,
) -> DataFrame:
    """IVF-flat ANN: scan only the ``nprobe`` buckets whose centroid is
    most cosine-similar to the query, then exact cosine top-k within.
    ``nprobe == num_centroids`` degenerates to brute force (exact);
    smaller nprobe trades recall for a ~nprobe/C scan fraction. Pass a
    prebuilt ``index=(assigned, centroids)`` to amortize the build across
    queries — the production shape, where the index is written bucketed
    by cid and probing is partition pruning."""
    import numpy as np

    assigned, cents = index if index is not None else ivf_build(
        df, vec_col, id_col, num_centroids, iters)
    q = np.array([float(x) for x in query_vec], dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    sims = (np.array(cents, dtype=np.float64) @ (q / qn))
    probes = [int(i) for i in np.argsort(-sims)[:nprobe]]

    v = _as_double(F.col(vec_col))
    qcol = F.array(*[F.lit(float(x)) for x in q])
    cos = F.round(_dot(v, qcol) / (_safe_norm(v) * F.lit(float(qn))), digits)
    w = Window.orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        assigned.filter(F.col("cid").isin(probes))
        .select(F.col(id_col), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_write(assigned: DataFrame, centroids, path: str) -> None:
    """Materialize an IVF index on disk in its production shape: vectors
    written ``partitionBy("cid")`` so a probe's ``cid IN (...)`` filter
    becomes partition pruning (only ~nprobe/C of the files are read —
    the plan shows it under ``PartitionFilters``), plus the tiny C×d
    centroid table as a parquet sidecar."""
    assigned.write.partitionBy("cid").mode("overwrite").parquet(f"{path}/vectors")
    spark = assigned.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, centroid array<double>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_read(spark, path: str):
    """Load an index written by :func:`ivf_write` as the
    ``(assigned, centroids)`` pair :func:`ivf_topk` consumes. The
    vectors frame is partition-pruned on ``cid`` at probe time."""
    assigned = spark.read.parquet(f"{path}/vectors")
    rows = spark.read.parquet(f"{path}/centroids").orderBy("cid").collect()
    return assigned, [list(r["centroid"]) for r in rows]


def ivf_bucket_stats(
    assigned: DataFrame, centroids, vec_col: str = "embedding",
) -> DataFrame:
    """Index-quality monitor: per-bucket vector count and mean cosine to
    the owning centroid, in ONE pass (broadcast centroid join + agg —
    never collects vectors). The incremental-append path
    (:func:`ivf_assign` under frozen centroids) has no retraining step,
    so this is the drift signal: data pulling away from the centroids
    shows up as falling ``mean_sim`` and bucket imbalance long before
    recall craters."""
    spark = assigned.sparkSession
    cdf = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cid int, _centroid array<double>",
    )
    v = _as_double(F.col(vec_col))
    # build-time centroids are unit-norm, so cosine = dot / |v|
    sim = _dot(v, F.col("_centroid")) / _safe_norm(v)
    return (
        assigned.join(F.broadcast(cdf), "cid")
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_vectors"),
             F.round(F.avg(sim), 6).alias("mean_sim"))
    )


def ivf_drift_report(
    assigned: DataFrame, centroids, vec_col: str = "embedding",
) -> dict:
    """Collect :func:`ivf_bucket_stats` into a one-line summary and emit
    it through the progress listener — the per-append hook for the
    incremental index: ``mean_sim`` is the count-weighted mean cosine to
    the owning centroid, ``imbalance`` is max-bucket-count over the
    uniform expectation (1.0 = perfectly even). Collect is C rows —
    driver-safe at any corpus scale."""
    from ..progress import report_progress

    rows = ivf_bucket_stats(assigned, centroids, vec_col).collect()
    total = sum(r["n_vectors"] for r in rows) or 1
    mean_sim = sum(r["mean_sim"] * r["n_vectors"] for r in rows) / total
    imbalance = max(r["n_vectors"] for r in rows) / (total / len(centroids))
    out = {"n_vectors": total, "n_buckets_hit": len(rows),
           "mean_sim": round(mean_sim, 6), "imbalance": round(imbalance, 4)}
    report_progress(
        1.0,
        f"ivf index: {total} vecs, {len(rows)}/{len(centroids)} buckets, "
        f"mean_sim={out['mean_sim']}, imbalance={out['imbalance']}")
    return out


def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 16,
    iters: int = 8,
    sample: int = 2048,
):
    """Train product-quantization codebooks (Jégou et al. 2011): split
    the dimension into ``m`` subspaces and k-means each to ``k``
    centroids. Returns a ``(m, k, dim/m)`` numpy array.

    Training runs on a DETERMINISTIC bounded sample (the ``sample``
    lowest rows by ``xxhash64(id)`` — stable under growth and
    partitioning), collected to the driver and Lloyd-iterated in numpy:
    the FAISS convention — codebooks are dimension-sized model state,
    not data-sized, and a 100 TB corpus trains on the same few thousand
    rows. Init is the first ``k`` distinct subvectors in hash order
    (deterministic, no RNG); empty cells re-seed to the farthest point
    of the fullest cell.
    """
    import numpy as np

    if m < 1 or k < 2:
        raise ValueError(f"pq_train: need m >= 1 and k >= 2 (got {m}, {k})")
    rows = (
        df.select(F.col(id_col), _as_double(F.col(vec_col)).alias("_v"))
        .withColumn("_h", F.xxhash64(F.col(id_col)))
        .orderBy("_h").limit(sample).select("_v").collect()
    )
    if not rows:
        raise ValueError("pq_train: empty input")
    X = np.array([r["_v"] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    books = np.zeros((m, k, sub))
    for s in range(m):
        Xs = X[:, s * sub:(s + 1) * sub]
        # deterministic init: first k DISTINCT subvectors in sample order
        seen, init = set(), []
        for row in Xs:
            key = row.tobytes()
            if key not in seen:
                seen.add(key)
                init.append(row)
            if len(init) == k:
                break
        C = np.array((init + [init[-1]] * k)[:k], dtype=np.float64)
        for _ in range(iters):
            d2 = ((Xs[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = Xs[mask].mean(axis=0)
                else:  # re-seed dead cell to the fullest cell's far point
                    full = np.bincount(assign, minlength=k).argmax()
                    far = d2[assign == full, full].argmax()
                    C[c] = Xs[assign == full][far]
        books[s] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    carry: Sequence[str] = (),
) -> DataFrame:
    """Encode vectors to PQ codes: ``(id_col, *carry, codes array<int>)``
    with ``codes[s]`` the nearest codebook centroid of subspace ``s``.
    One corpus pass against the broadcast ``(m, k, dim/m)`` codebooks —
    vectorized numpy argmin per Arrow batch, no shuffle. Storage drops
    from ``dim`` floats to ``m`` small ints per vector — the memory
    move that lets a billion-vector index fit a cluster's RAM. Pass
    ``carry=["cid"]`` over an :func:`ivf_assign` output to build the
    IVF-PQ index frame :func:`ivf_pq_topk` probes."""
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)
    m, k, sub = cb.shape
    b = df.sparkSession.sparkContext.broadcast(cb)
    carry = list(carry)

    def encode(batches):
        import pandas as pd

        B = b.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf["_v"]), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * sub:(s + 1) * sub]
                d2 = ((Xs[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = d2.argmin(axis=1)
            out = {"_id": pdf["_id"]}
            for c in carry:
                out[c] = pdf[c]
            out["codes"] = list(codes)
            yield pd.DataFrame(out)

    slim = df.select(F.col(id_col).alias("_id"),
                     *[F.col(c) for c in carry],
                     _as_double(F.col(vec_col)).alias("_v"))
    carry_schema = "".join(
        f", `{f.name}` {f.dataType.simpleString()}"
        for f in df.select(*carry).schema.fields)
    out = slim.mapInPandas(
        encode, schema=f"_id bigint{carry_schema}, codes array<bigint>")
    return out.select(F.col("_id").alias(id_col), *carry, "codes")


def pq_decode(codes, codebooks):
    """Reconstruct approximate vectors from PQ codes (numpy helper for
    reconstruction-error audits): ``codes (n, m)`` → ``(n, dim)``."""
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)
    codes = np.asarray(codes, dtype=np.int64)
    return np.concatenate(
        [cb[s][codes[:, s]] for s in range(cb.shape[0])], axis=1)


def pq_topk(
    encoded: DataFrame,
    codebooks,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: the query stays
    full-precision, each code looks up its subspace's precomputed
    query↔centroid squared distance and the m lookups sum. Returns
    ``(id_col, adc_dist, rank)``, ascending distance, id tiebreak.

    The scan is PURE JVM codegen: the m lookup tables are literal
    arrays in the plan (m × k doubles — e.g. 4×16) and the score is
    ``element_at(lut_s, codes[s]+1)`` sums — no Python, no join, no
    shuffle beyond the global top-k. At 100 TB this is the point of
    PQ: the scan touches m bytes per vector instead of dim floats,
    the distance math collapses to table lookups, and the same codes
    compose with the IVF layout (encode per cid-partition) for
    IVF-PQ probe pruning."""
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)
    m, kk, sub = cb.shape
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    if q.shape[0] != m * sub:
        raise ValueError(
            f"pq_topk: query dim {q.shape[0]} != codebooks dim {m * sub}")
    score = None
    for s in range(m):
        lut = ((cb[s] - q[s * sub:(s + 1) * sub][None, :]) ** 2).sum(axis=1)
        lut_col = F.array(*[F.lit(float(x)) for x in lut])
        term = F.element_at(
            lut_col, (F.element_at("codes", s + 1) + 1).cast("int"))
        score = term if score is None else score + term
    w = Window.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    return (
        encoded.select(F.col(id_col), F.round(score, digits).alias("adc_dist"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_pq_topk(
    encoded: DataFrame,
    centroids,
    codebooks,
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    cid_col: str = "cid",
    digits: int = 6,
) -> DataFrame:
    """IVF-PQ: the billion-scale composition — coarse probe pruning
    (scan only the ``nprobe`` max-cosine centroids' buckets) over
    PQ-coded vectors (ADC lookup-table scoring, m bytes per vector).
    ``encoded`` is :func:`pq_encode` over an :func:`ivf_assign` output
    with ``carry=[cid_col]``; when it is read from the
    :func:`ivf_write` ``partitionBy(cid)`` layout, the ``cid`` filter
    IS partition pruning and the non-probed buckets are never read.

    Probe selection is driver-side numpy over the dimension-sized
    centroid matrix (ties by cid); ``nprobe >= num_centroids`` scans
    every bucket and equals :func:`pq_topk` exactly — the oracle twin
    relation, same contract as ``knn_ivf_exact``/``knn_lsh_exact``."""
    import numpy as np

    cmat = np.asarray(centroids, dtype=np.float64)
    q = np.asarray([float(x) for x in query_vec], dtype=np.float64)
    if nprobe < 1:
        raise ValueError(f"ivf_pq_topk: nprobe must be >= 1 (got {nprobe})")
    norms = np.linalg.norm(cmat, axis=1) * (np.linalg.norm(q) or 1.0)
    cos = (cmat @ q) / np.where(norms == 0, 1.0, norms)
    order = np.lexsort((np.arange(len(cmat)), -cos))
    probe = [int(c) for c in order[: min(nprobe, len(cmat))]]
    pruned = encoded.filter(F.col(cid_col).isin(probe))
    return pq_topk(pruned, codebooks, query_vec, k=k,
                   id_col=id_col, digits=digits)


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q", scale_col: str = "q_scale"
) -> DataFrame:
    """Symmetric int8 quantization per vector: q_i = round(x_i / s) with
    s = max|x| / 127 — a 4x (vs float32) storage cut for a 100 TB
    embedding store, with cosine preserved to ~1e-2. Pure column
    expressions (HOFs), one pass; the scale rides alongside as a double
    so dequantization is exact-per-vector."""
    v = _as_double(F.col(vec_col))
    mx = F.aggregate(v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x)))
    s = F.when(mx > 0, mx / 127.0).otherwise(F.lit(1.0))
    return df.withColumn(scale_col, s).withColumn(
        out_col,
        F.transform(v, lambda x: F.round(x / F.col(scale_col)).cast("tinyint")),
    )


def dequantize_embeddings(
    df: DataFrame, q_col: str = "q", scale_col: str = "q_scale", out_col: str = "embedding"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: x_i ≈ q_i * s."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda q: q.cast("double") * F.col(scale_col)),
    )


def group_centroids(
    df: DataFrame,
    group_col: str,
    vec_col: str = "embedding",
    digits: int = 6,
) -> DataFrame:
    """Per-group mean embedding — the class prototype behind semantic
    routing, centroid-seeded clustering, per-domain drift monitors, and
    nearest-class-mean classification. Returns ``(group_col, n_vectors,
    centroid)`` with every element rounded to ``digits``.

    The scale-correct shape is **posexplode + partial aggregation**,
    NOT ``collect_list`` of vectors per group: the exploded (group,
    position, value) scalar stream partial-aggregates map-side, so the
    exchange carries only ``groups × dim`` running (sum, count) partials
    — independent of corpus size — and a hot group (one label owning a
    billion vectors) parallelizes across every input partition instead
    of funnelling its vectors to one reducer. The centroid array is
    reassembled from the dimension partials with an ``array_sort`` over
    ``dim``-sized struct lists — group-count-sized state, never
    corpus-sized.

    NULL vectors are excluded; ragged inputs surface as centroids whose
    trailing positions average only the longer vectors (callers wanting
    strictness should validate dimensions upstream — e.g. with
    ``F.size`` + :func:`feldman_spark.pipeline.profile.profile_table`).
    """
    g = F.col(f"`{group_col}`")
    ex = (
        df.filter(F.col(f"`{vec_col}`").isNotNull())
        .select(g, F.posexplode(F.col(f"`{vec_col}`"))
                .alias("_pos", "_val"))
    )
    agg = ex.groupBy(group_col, "_pos").agg(
        F.avg(F.col("_val").cast("double")).alias("_m"),
        F.count("*").alias("_n"),
    )
    return (
        agg.groupBy(group_col)
        .agg(
            F.max("_n").cast("bigint").alias("n_vectors"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_m"))),
                lambda s: F.round(s["_m"], digits),
            ).alias("centroid"),
        )
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    digits: int = 6,
    local_margin: int = 8,
) -> DataFrame:
    """Batch k-NN join: EXACT top-``k`` cosine neighbors from ``corpus``
    for EVERY row of ``queries`` — the all-pairs retrieval shape behind
    hard-negative mining, embedding-based decontamination against a
    probe set, and retrieval-training pair generation (one
    :func:`cosine_topk` per query would replan/rescan the corpus per
    query). Returns ``(query_id, vec_id, cosine, rank)``, ties broken
    by corpus id.

    Scale shape (billions of corpus vectors × thousands of queries):
    the QUERY matrix ships to executors inside the Arrow UDF closure
    (queries are the small side by regime; a partition never sees
    another partition's corpus rows), and ONE ``mapInPandas`` pass
    computes per-batch scores as a (batch × q) matmul, keeping a
    bounded per-partition accumulator of the best ``k + local_margin``
    candidate ids per query — any true global top-k row is necessarily
    in its partition's local top-k, so the emitted candidates are
    ``(k + margin) × partitions`` rows per query, never the corpus.
    Final scores for the surviving candidates are RECOMPUTED JVM-side
    with the same sequential fold as :func:`cosine_topk` (bit-identical
    to the SQL twin — the numpy matmul orders additions differently in
    the last ulp, so it is used only to SELECT candidates, where
    ``local_margin`` absorbs any boundary flip), then ranked with one
    window over candidate rows (WindowGroupLimit prunes map-side).
    """
    if k < 1:
        raise ValueError(f"knn_join: k must be >= 1, got {k}")
    qpdf = queries.select(F.col(query_id_col).alias("_qid"),
                          _as_double(F.col(vec_col)).alias("_qv")).toPandas()
    if qpdf.empty:
        raise ValueError("knn_join: queries frame is empty")
    import numpy as np

    qids = qpdf["_qid"].to_numpy()
    qmat = np.stack(qpdf["_qv"].to_numpy()).astype(np.float64)   # (q, d)
    qn = np.linalg.norm(qmat, axis=1)
    qn[qn == 0.0] = 1.0
    qunit = (qmat.T / qn)                                        # (d, q)
    kk = k + max(0, local_margin)

    src = corpus.select(F.col(id_col).alias("_cid"),
                        _as_double(F.col(vec_col)).alias("_cv"))

    def local_topk(batches):
        import numpy as np
        import pandas as pd

        best_s = None   # (q, kk) scores, descending
        best_i = None   # (q, kk) corpus ids
        for pdf in batches:
            if pdf.empty:
                continue
            emat = np.stack(pdf["_cv"].to_numpy()).astype(np.float64)
            en = np.linalg.norm(emat, axis=1)
            en[en == 0.0] = 1.0
            scores = (emat / en[:, None]) @ qunit                # (b, q)
            ids = pdf["_cid"].to_numpy()
            take = min(kk, scores.shape[0])
            part = np.argpartition(-scores, take - 1, axis=0)[:take]  # (take, q)
            bs = np.take_along_axis(scores, part, axis=0).T      # (q, take)
            bi = ids[part].T                                     # (q, take)
            if best_s is None:
                best_s, best_i = bs, bi
            else:
                best_s = np.concatenate((best_s, bs), axis=1)
                best_i = np.concatenate((best_i, bi), axis=1)
            if best_s.shape[1] > kk:
                sel = np.argpartition(-best_s, kk - 1, axis=1)[:, :kk]
                best_s = np.take_along_axis(best_s, sel, axis=1)
                best_i = np.take_along_axis(best_i, sel, axis=1)
        if best_s is not None:
            n = best_s.shape[1]
            yield pd.DataFrame({
                "_qid": np.repeat(qids, n),
                "_cid": best_i.reshape(-1),
            })

    qid_field = queries.select(F.col(query_id_col).alias("_qid")).schema[0]
    cid_field = src.schema[0]
    from pyspark.sql.types import StructType
    # no distinct needed: a corpus id lives in exactly one partition and
    # the accumulator keeps each id at most once per query, so candidate
    # rows are unique by construction (corpus ids must be unique — the
    # same contract as every other knn_* operator here)
    cand = src.mapInPandas(
        local_topk, schema=StructType([qid_field, cid_field]))

    qdf = queries.select(F.col(query_id_col).alias("_qid"),
                         _as_double(F.col(vec_col)).alias("_qv"))
    cos = F.round(
        _dot(F.col("_cv"), F.col("_qv"))
        / (_safe_norm(F.col("_cv")) * _safe_norm(F.col("_qv"))), digits)
    return (
        cand.join(src, "_cid")
        .join(F.broadcast(qdf), "_qid")
        .select(F.col("_qid").alias(query_id_col),
                F.col("_cid").alias(id_col),
                cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(
            Window.partitionBy(query_id_col).orderBy(
                F.col("cosine").desc(), F.col(id_col).asc())))
        .filter(F.col("rank") <= k)
    )
