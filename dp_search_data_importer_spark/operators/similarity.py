"""Similarity search over embedding columns (array<float>).

Two paths, mirroring the BM25 exact/WAND split:
- brute-force cosine top-k — pure Catalyst (zip_with + aggregate), the
  correctness baseline; scan-dominated, embarrassingly parallel.
- LSH-bucketed ANN (random hyperplanes, Charikar 2002) — the scale path:
  bucket = sign-bit string of h hyperplane dot products; candidates share a
  bucket (plus optional multiprobe flips), exact cosine re-rank inside.
  At 10^9+ vectors the bucket join replaces the full scan; recall is
  tunable via n_planes / multiprobe radius (measured in tests).

Hyperplanes are seeded-deterministic and shipped as column literals —
no Python at execution time for bucketing (all Catalyst), only numpy at
plan-build time on the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k against one query vector. The query is a
    literal array → broadcast-free; the scan is the only data movement and
    the top-k is a TakeOrdered (no full sort shuffle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine_expr(F.col(vec_col), q), 4).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_expr(vec_col: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id (long) from ≤ 63 hyperplanes, pure Catalyst."""
    bits = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = (_dot(vec_col, plane) > 0).cast("long") * F.lit(1 << i)
        bits = bit if bits is None else bits + bit
    return bits


def lsh_index(df: DataFrame, planes: np.ndarray,
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    return df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )


def ann_topk(indexed: DataFrame, query_vec: list[float], planes: np.ndarray,
             k: int = 10, multiprobe: int = 1) -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    ``multiprobe`` bit flips, exact cosine re-rank inside the probed set.
    In-memory-plan form; at stored scale use :func:`ann_topk_stored`, whose
    probe set prunes parquet partitions instead of filtering a full scan."""
    probes = _probe_set(query_vec, planes, multiprobe)
    cand = indexed.filter(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), q), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)
    )


def _probe_set(query_vec, planes: np.ndarray, multiprobe: int) -> list[int]:
    qv = np.asarray(query_vec, dtype=np.float64)
    qbits = int(sum((1 << i) for i, p in enumerate(planes) if p @ qv > 0))
    probes = {qbits}
    if multiprobe >= 1:
        probes |= {qbits ^ (1 << i) for i in range(len(planes))}
    if multiprobe >= 2:
        probes |= {
            qbits ^ (1 << i) ^ (1 << j)
            for i in range(len(planes)) for j in range(i + 1, len(planes))
        }
    return sorted(int(x) for x in probes)


def write_ann_index(df: DataFrame, path: str, planes: np.ndarray,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """Persist the LSH index PARTITIONED BY bucket — the storage layout that
    makes probes prune: at 10^9 vectors a query touches only its
    ~1+h+h(h-1)/2 probe dirs, never the full table. The hyperplanes are
    stored alongside (_planes.json) so the index is self-describing.
    ``repartition("bucket")`` first: bucket→task is functional, so each
    partition dir is written by exactly one task (no file fragmentation)."""
    import json
    import os

    idx = lsh_index(df, planes, vec_col, id_col)
    (idx.repartition("bucket")
     .write.mode("overwrite").partitionBy("bucket").parquet(path))
    with open(os.path.join(path, "_planes.json"), "w") as f:
        json.dump({"planes": planes.tolist()}, f)


def load_ann_planes(path: str) -> np.ndarray:
    import json
    import os

    with open(os.path.join(path, "_planes.json")) as f:
        return np.asarray(json.load(f)["planes"], dtype=np.float64)


def ann_topk_stored(spark, path: str, query_vec: list[float], k: int = 10,
                    multiprobe: int = 1) -> DataFrame:
    """ANN top-k over a stored index: the probe set becomes a partition
    filter on the bucket-partitioned parquet, so the scan reads ONLY the
    probed dirs (PartitionFilters in the physical plan — regression-locked
    by tests/test_similarity.py). Exact cosine re-rank inside."""
    from dp_search_data_importer_spark.plans.update_ann import (
        recover_ann_for_read,
    )

    recover_ann_for_read(path)  # finish any interrupted upsert commit first
    planes = load_ann_planes(path)
    probes = _probe_set(query_vec, planes, multiprobe)
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), q), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means twin of the hyperplane-LSH path:
# a coarse quantizer assigns each vector to its nearest centroid cell; a
# query probes only the nprobe nearest cells. Same storage discipline as
# the LSH index: parquet partitioned by cell, centroids stored alongside.


DEFAULT_TRAIN_SAMPLE_ROWS = 100_000


def _derive_sample_mod(df: DataFrame, sample_mod: int | None,
                       target_sample_rows: int) -> int:
    """Explicit ``sample_mod`` wins; otherwise derive it from one cheap
    ``count()`` so the driver-side training collect is bounded by
    ``target_sample_rows`` REGARDLESS of table size — a 10^9-vector table
    must never default to collecting itself onto the driver. Mod-based
    selection (``id % mod == 0``) is kept because it is order-independent:
    any engine replaying training over the same ids gets the same sample
    (the ANN oracles depend on this). The bound is exact for dense ids and
    proportional for sparse ones."""
    if sample_mod is not None:
        return int(sample_mod)
    n = df.count()
    return max(1, -(-n // target_sample_rows))  # ceil(n / target)


def _train_sample(df: DataFrame, sample_mod: int | None,
                  target_sample_rows: int, id_col: str,
                  vec_col: str) -> np.ndarray:
    """id-ordered training matrix from the deterministic mod-sample.
    Sorting by id makes the trained quantizers independent of scan order,
    so any engine replaying this procedure gets bit-identical results."""
    mod = _derive_sample_mod(df, sample_mod, target_sample_rows)
    sample = (
        df.filter(F.pmod(F.col(id_col), F.lit(mod)) == 0)
        .select(id_col, vec_col).collect()
    )
    sample.sort(key=lambda r: r[0])
    return np.asarray([r[1] for r in sample], dtype=np.float64)


def train_ivf_centroids(df: DataFrame, n_cells: int = 16,
                        sample_mod: int | None = None,
                        iters: int = 10, seed: int = 42,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        target_sample_rows: int = DEFAULT_TRAIN_SAMPLE_ROWS,
                        ) -> np.ndarray:
    """Deterministic Lloyd's k-means on a seeded sample (vec_id % mod == 0),
    trained driver-side — the quantizer is tiny and global; assignment (the
    data-sized pass) stays distributed. The default derives the mod from
    ``target_sample_rows``, so at 10^9 vectors the collect pulls ~10^5
    rows; pass ``sample_mod`` explicitly to pin the sample instead."""
    x = _train_sample(df, sample_mod, target_sample_rows, id_col, vec_col)
    return kmeans(x, n_cells, iters=iters, seed=seed)


def kmeans(x: np.ndarray, n_cells: int, iters: int = 10,
           seed: int = 42) -> np.ndarray:
    """Seeded Lloyd's iterations on an id-ordered matrix — bit-identical
    for any engine that replays it on the same rows (the IVF oracle does)."""
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = x[assign == c]
            if len(m):
                cents[c] = m.mean(axis=0)
    return cents


def ivf_assign(df: DataFrame, centroids: np.ndarray,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """(vec_id, embedding, cell): nearest-centroid assignment in one
    vectorized Arrow pass (numpy matmul per batch; expanded ‖x‖²−2x·c+‖c‖²
    form — the SQL oracle mirrors the same expression structure)."""
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)

    def gen(batches):
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) \
                + (cents * cents).sum(1)[None, :]
            yield pd.DataFrame({
                "vec_id": pdf[id_col].astype("int64"),
                "embedding": pdf[vec_col],
                "cell": d2.argmin(axis=1).astype("int32"),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id long, embedding array<float>, cell int")


def write_ivf_index(df: DataFrame, path: str, centroids: np.ndarray,
                    vec_col: str = "embedding",
                    id_col: str = "vec_id") -> None:
    """Assign each vector to its nearest centroid and persist partitioned
    by cell."""
    import json
    import os

    cents = np.asarray(centroids, dtype=np.float64)
    idx = ivf_assign(df, cents, vec_col, id_col)
    (idx.repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    with open(os.path.join(path, "_centroids.json"), "w") as f:
        json.dump({"centroids": cents.tolist()}, f)


def ivf_probes(centroids: np.ndarray, query_vec, nprobe: int) -> list[int]:
    cents = np.asarray(centroids, dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    d2 = ((cents - qv[None, :]) ** 2).sum(axis=1)
    return [int(c) for c in np.argsort(d2, kind="stable")[:nprobe]]


def ivf_topk(spark, path: str, query_vec: list[float], k: int = 10,
             nprobe: int = 4) -> DataFrame:
    """IVF ANN top-k over a stored index: probe the nprobe nearest cells
    (partition-pruned parquet read), exact cosine re-rank inside."""
    from dp_search_data_importer_spark.plans.update_ann import (
        recover_ann_for_read,
    )

    recover_ann_for_read(path)  # finish any interrupted upsert commit first
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as f:
        cents = np.asarray(json.load(f)["centroids"], dtype=np.float64)
    probes = ivf_probes(cents, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(
            "vec_id",
            F.round(cosine_expr(F.col("embedding"), q), 4).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(k)
    )


def embedding_near_dup_pairs(df: DataFrame, planes: np.ndarray,
                             threshold: float = 0.95,
                             vec_col: str = "embedding",
                             id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH blocking + exact verify —
    the embedding twin of MinHash-LSH text dedup."""
    idx = lsh_index(df, planes, vec_col, id_col)
    a = idx.alias("a")
    b = idx.alias("b")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.round(cosine_expr(F.col("a.embedding"), F.col("b.embedding")), 4)
            .alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ / IVF-PQ) — the memory-compression ANN family
# (Jégou, Douze, Schmid: "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011). A D-dim vector becomes M sub-codes (argmin against
# a per-subspace codebook): 64 float32 dims → 8 one-byte codes here (32×).
# Queries score candidates with an Asymmetric Distance Computation (ADC)
# table — per subspace, the query-to-centroid distances — so the stored
# index never needs the original vectors. This is the third ANN family
# next to hyperplane-LSH and IVF, and composes with IVF's cell pruning.


def train_pq_codebooks(df: DataFrame, m: int = 8, ks: int = 8,
                       iters: int = 8, seed: int = 42,
                       sample_mod: int | None = None,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       target_sample_rows: int = DEFAULT_TRAIN_SAMPLE_ROWS,
                       ) -> np.ndarray:
    """(m, ks, D/m) codebooks: per-subspace seeded Lloyd's k-means on the
    id-ordered sample — deterministic like :func:`train_ivf_centroids`, so
    the DuckDB oracle replays training bit-identically. Driver-side on a
    sample bounded by ``target_sample_rows`` (see
    :func:`_derive_sample_mod`); encoding (the data-sized pass) stays
    distributed."""
    x = _train_sample(df, sample_mod, target_sample_rows, id_col, vec_col)
    d = x.shape[1]
    assert d % m == 0, (d, m)
    ds = d // m
    return np.stack([
        kmeans(x[:, i * ds:(i + 1) * ds], ks, iters=iters, seed=seed + i)
        for i in range(m)
    ])


def pq_encode(df: DataFrame, codebooks: np.ndarray,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """(vec_id, codes array<int>): per-subspace nearest-centroid argmin in
    one vectorized Arrow pass (first-min tie-break, matching the oracle's
    CASE chain)."""
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)  # (m, ks, ds)
    m, ks, ds = cb.shape

    def gen(batches):
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            codes = np.empty((len(x), m), dtype=np.int32)
            for i in range(m):
                sub = x[:, i * ds:(i + 1) * ds]
                cents = cb[i]
                d2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cents.T) \
                    + (cents * cents).sum(1)[None, :]
                # snap before argmin: Lloyd's can converge near-duplicate
                # sub-centroids, and a 1e-16 summation-order difference
                # between engines would flip the assignment on such ties;
                # rounding makes them exact ties, resolved first-min in
                # both engines (the oracle rounds identically)
                codes[:, i] = np.round(d2, 6).argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].astype("int64"),
                "codes": list(codes),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id long, codes array<int>")


def pq_adc_table(codebooks: np.ndarray, query_vec) -> np.ndarray:
    """(m, ks) table of squared L2 distances from the query's subvectors
    to every sub-centroid — the ADC lookup table, computed once per query
    on the driver and shipped as plan literals."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ks, ds = cb.shape
    qv = np.asarray(query_vec, dtype=np.float64)
    assert len(qv) == m * ds, (len(qv), m, ds)  # no silently-dropped dims
    return np.stack([
        ((cb[i] - qv[i * ds:(i + 1) * ds][None, :]) ** 2).sum(axis=1)
        for i in range(m)
    ])


def pq_adc_expr(codes_col, dtable: np.ndarray):
    """Approximate squared L2 as a pure Catalyst expression: Σ_m
    table[m][codes[m]] over the literal ADC table — an aggregate over a
    sequence of subspace indices, whole-stage-codegen'd, no Python."""
    dt = F.array(*[
        F.array(*[F.lit(float(v)) for v in row]) for row in dtable
    ])
    m = len(dtable)
    return F.aggregate(
        F.sequence(F.lit(1), F.lit(m)), F.lit(0.0),
        lambda acc, i: acc + F.element_at(
            F.element_at(dt, i), F.element_at(codes_col, i) + 1),
    )


def pq_topk(codes: DataFrame, codebooks: np.ndarray, query_vec,
            k: int = 10) -> DataFrame:
    """(vec_id, adc) top-k by ascending approximate squared L2 over PQ
    codes — compressed-domain scan, the original vectors are never read."""
    dtable = pq_adc_table(codebooks, query_vec)
    return (
        codes.select(
            "vec_id",
            F.round(pq_adc_expr(F.col("codes"), dtable), 4).alias("adc"),
        )
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc()).limit(k)
    )


def write_ivfpq_index(df: DataFrame, path: str, centroids: np.ndarray,
                      codebooks: np.ndarray, vec_col: str = "embedding",
                      id_col: str = "vec_id") -> None:
    """IVF-PQ store: (vec_id, codes) partitioned by coarse cell — the
    original vectors are NOT stored (that is the point: 32× less storage
    at (64-dim float32, m=8)); centroids + codebooks ride alongside as
    JSON. Queries prune cells (partition filter) then ADC-scan codes."""
    import json
    import os

    cents = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    assigned = ivf_assign(df, cents, vec_col, id_col)
    coded = pq_encode(assigned, cb, vec_col, id_col)
    out = assigned.select("vec_id", "cell").join(coded, "vec_id")
    (out.repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    with open(os.path.join(path, "_quantizers.json"), "w") as f:
        json.dump({"centroids": cents.tolist(),
                   "codebooks": cb.tolist()}, f)


def ivfpq_topk(spark, path: str, query_vec, k: int = 10,
               nprobe: int = 4) -> DataFrame:
    """IVF-PQ query: probe the nprobe nearest cells (parquet partition
    pruning) and ADC-rank their codes — compressed-domain end to end."""
    from dp_search_data_importer_spark.plans.update_ann import (
        recover_ann_for_read,
    )

    recover_ann_for_read(path)  # finish any interrupted upsert commit first
    import json
    import os

    with open(os.path.join(path, "_quantizers.json")) as f:
        qz = json.load(f)
    cents = np.asarray(qz["centroids"], dtype=np.float64)
    cb = np.asarray(qz["codebooks"], dtype=np.float64)
    probes = ivf_probes(cents, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    dtable = pq_adc_table(cb, query_vec)
    return (
        cand.select(
            "vec_id",
            F.round(pq_adc_expr(F.col("codes"), dtable), 4).alias("adc"),
        )
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc()).limit(k)
    )


def train_ivfpq(df: DataFrame, n_cells: int = 8, m: int = 16, ks: int = 8,
                iters: int = 8, seed: int = 42,
                sample_mod: int | None = None,
                vec_col: str = "embedding",
                id_col: str = "vec_id",
                target_sample_rows: int = DEFAULT_TRAIN_SAMPLE_ROWS,
                ) -> tuple[np.ndarray, np.ndarray]:
    """(centroids, codebooks) for RESIDUAL IVF-PQ — the Jégou et al. 2011
    formulation: the coarse quantizer removes the cell mean and PQ encodes
    the residual ``x − c(x)``, which has far less variance than x itself,
    so the same code budget quantizes much finer. Both quantizers train on
    the deterministic id-ordered sample (driver-side, bounded by
    ``target_sample_rows``)."""
    x = _train_sample(df, sample_mod, target_sample_rows, id_col, vec_col)
    cents = kmeans(x, n_cells, iters=iters, seed=seed)
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    resid = x - cents[np.round(d2, 6).argmin(axis=1)]
    d = x.shape[1]
    # train_pq_codebooks asserts this; silently flooring here would drop
    # the trailing d % m dims from training/encoding/ADC and quietly
    # degrade rankings
    assert d % m == 0, (d, m)
    ds = d // m
    cbs = np.stack([
        kmeans(resid[:, i * ds:(i + 1) * ds], ks, iters=iters, seed=seed + i)
        for i in range(m)
    ])
    return cents, cbs


def ivfpq_encode(df: DataFrame, centroids: np.ndarray,
                 codebooks: np.ndarray, vec_col: str = "embedding",
                 id_col: str = "vec_id") -> DataFrame:
    """(vec_id, cell, codes): assign + residual + PQ-encode in ONE Arrow
    pass (no second scan, no join)."""
    import pandas as pd

    cents = np.asarray(centroids, dtype=np.float64)
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ks, ds = cb.shape

    def gen(batches):
        for pdf in batches:
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ cents.T) \
                + (cents * cents).sum(1)[None, :]
            cell = np.round(d2, 6).argmin(axis=1)
            resid = x - cents[cell]
            codes = np.empty((len(x), m), dtype=np.int32)
            for i in range(m):
                sub = resid[:, i * ds:(i + 1) * ds]
                cc = cb[i]
                sd2 = (sub * sub).sum(1)[:, None] - 2.0 * (sub @ cc.T) \
                    + (cc * cc).sum(1)[None, :]
                codes[:, i] = np.round(sd2, 6).argmin(axis=1)
            yield pd.DataFrame({
                "vec_id": pdf[id_col].astype("int64"),
                "cell": cell.astype("int32"),
                "codes": list(codes),
            })

    return df.select(id_col, vec_col).mapInPandas(
        gen, schema="vec_id long, cell int, codes array<int>")


def write_ivfpq_residual_index(df: DataFrame, path: str,
                               centroids: np.ndarray,
                               codebooks: np.ndarray,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id") -> None:
    """Residual IVF-PQ store: (vec_id, codes) partitioned by cell, no
    vectors on disk; quantizers ride alongside, tagged residual."""
    import json
    import os

    out = ivfpq_encode(df, centroids, codebooks, vec_col, id_col)
    (out.repartition("cell")
     .write.mode("overwrite").partitionBy("cell").parquet(path))
    with open(os.path.join(path, "_quantizers.json"), "w") as f:
        json.dump({"centroids": np.asarray(centroids).tolist(),
                   "codebooks": np.asarray(codebooks).tolist(),
                   "residual": True}, f)


def ivfpq_residual_topk(spark, path: str, query_vec, k: int = 10,
                        nprobe: int = 4) -> DataFrame:
    """Residual IVF-PQ query: per probed cell the ADC table is built
    against the query's OWN residual (q − c_cell); scoring stays pure
    Catalyst — a when-chain selects the probed cell's literal table."""
    from dp_search_data_importer_spark.plans.update_ann import (
        recover_ann_for_read,
    )

    recover_ann_for_read(path)  # finish any interrupted upsert commit first
    import json
    import os

    with open(os.path.join(path, "_quantizers.json")) as f:
        qz = json.load(f)
    cents = np.asarray(qz["centroids"], dtype=np.float64)
    cb = np.asarray(qz["codebooks"], dtype=np.float64)
    qv = np.asarray(query_vec, dtype=np.float64)
    probes = ivf_probes(cents, qv, nprobe)
    cand = spark.read.parquet(path).filter(F.col("cell").isin(probes))
    # when-chain over the probed cells: every candidate row's cell is in
    # `probes` (partition filter above), so exactly one branch fires
    chain = F.lit(None).cast("double")
    for c in probes:
        dtable = pq_adc_table(cb, qv - cents[c])
        chain = F.when(F.col("cell") == c,
                       pq_adc_expr(F.col("codes"), dtable)).otherwise(chain)
    return (
        cand.select("vec_id",
                    F.round(chain, 4).alias("adc"))
        .orderBy(F.col("adc").asc(), F.col("vec_id").asc()).limit(k)
    )
