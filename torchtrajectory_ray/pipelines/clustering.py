"""Iterative k-means clustering over an embedding column — the web-text
analog of the reference's k-paths trajectory clustering (Torch-Clus:
/root/reference/src/main/java/au/edu/rmit/bdm/clustering/trajectory/
kpaths/Process.java:21-90, Yinyang.java:50-120): an iterative loop of
(broadcast centers → assign every record → re-aggregate centers), with
the same bound-based assignment-skipping idea (Yinyang's group bounds)
expressed as a vectorized distance computation per batch.

Dataflow shape per iteration (ST7's "iterative groupby + broadcast loop
driven from the driver"):

  centroids (small, driver)  --broadcast-->  map_batches(assign+partial
  sums per cluster)  --small groupby-->  new centroids (driver)

Only per-cluster partial sums travel — never the vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _assign_partials(batch: pa.Table, centroids: np.ndarray) -> pa.Table:
    """Assign each vector to its nearest (euclidean) centroid; emit per-
    cluster partial sums (sum vector, count, inertia) for the re-center
    step — the combiner that keeps the shuffle tiny."""
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    e = _batch_matrix(batch)
    # ||x - c||² = ||x||² - 2x·c + ||c||² ; argmin over c drops ||x||²
    d = -2.0 * (e @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
    assign = np.argmin(d, axis=1)
    inertia = ((e - centroids[assign]) ** 2).sum(axis=1)
    rows = []
    for c in np.unique(assign):
        m = assign == c
        rows.append(
            {
                "cluster": int(c),
                "count": int(m.sum()),
                "inertia": float(inertia[m].sum()),
                "vec_sum": e[m].sum(axis=0).tolist(),
            }
        )
    return pa.Table.from_pylist(rows)


def kmeans_embeddings(
    sf_dir: str,
    k: int = 8,
    iters: int = 12,
    seed: int = 42,
) -> tuple[pd.DataFrame, np.ndarray, list[float]]:
    """K-means over ``embeddings.parquet``.

    Returns (assignments DataFrame(vec_id, cluster), centroids, inertia
    per iteration).  Deterministic: seeded init from the first rows,
    fixed iteration count with early stop on converged inertia.
    """
    import pyarrow.parquet as pq

    # decoded blocks pinned in the object store: every Lloyd iteration is
    # a pure compute pass instead of a fresh parquet scan
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).materialize()
    # seed centroids from the first row group(s) — the driver never
    # materializes the table (at 10^12 rows that would OOM before the
    # distributed loop starts); read further groups only when the first
    # holds fewer than k rows
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    pf = pq.ParquetFile(f"{sf_dir}/embeddings.parquet")
    heads, n_rows = [], 0
    for rg in range(pf.num_row_groups):
        heads.append(pf.read_row_group(rg, columns=["embedding"]))
        n_rows += heads[-1].num_rows
        if n_rows >= k:
            break
    sample = _batch_matrix(pa.concat_tables(heads))
    if len(sample) < k:
        raise ValueError(f"corpus has {len(sample)} vectors < k={k}")
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)].copy()

    history: list[float] = []
    for _ in range(iters):
        parts = (
            ds.map_batches(
                _assign_partials,
                fn_kwargs={"centroids": centroids},
                batch_format="pyarrow",
                batch_size=4096,
            )
            .to_pandas()
        )
        agg = parts.groupby("cluster").agg(
            count=("count", "sum"),
            inertia=("inertia", "sum"),
            vec_sum=("vec_sum", lambda s: np.sum(np.stack(s.to_numpy()), axis=0)),
        )
        history.append(float(agg["inertia"].sum()))
        new_c = centroids.copy()
        for c, row in agg.iterrows():
            new_c[int(c)] = np.asarray(row["vec_sum"]) / row["count"]
        if np.allclose(new_c, centroids, atol=1e-12):
            break
        centroids = new_c
        if len(history) >= 2 and abs(history[-1] - history[-2]) < 1e-9:
            break

    # final assignment pass (vec_id → cluster)
    def final_assign(batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.pipelines.knn import _batch_matrix

        e = _batch_matrix(batch)
        d = -2.0 * (e @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(np.argmin(d, axis=1).astype(np.int64)),
            }
        )

    assigns = (
        ds.map_batches(final_assign, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    return assigns, centroids, history


def kmeans_onestep(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """(cluster, n) after EXACTLY one Lloyd assignment from a FIXED,
    SQL-reproducible init: centroid c = the embedding of vec_id c
    (c < k), nearest by euclidean distance, ties to the lowest cluster
    id.  This is the driver-gate projection of the k-means machinery —
    the assignment kernel, the broadcast-centroid shape, and the
    partial-sum groupby all run exactly as in :func:`kmeans_embeddings`
    but the answer is deterministic AND DuckDB-expressible
    (``list_distance`` against the k seed rows), so the driver
    hash-gates it; the full seeded-random iterative run stays the
    rows-only entry (SQL cannot run Lloyd's loop)."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    src = f"{sf_dir}/embeddings.parquet"
    seed_tbl = pads.dataset(src, format="parquet").to_table(
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id") < k,
    )
    order = np.argsort(seed_tbl["vec_id"].to_numpy())
    centroids = _batch_matrix_seed(seed_tbl)[order]
    if len(centroids) < k:
        raise ValueError(f"need vec_ids 0..{k-1} as seed centroids")

    def assign_counts(batch: pa.Table) -> pa.Table:
        from torchtrajectory_ray.pipelines.knn import _batch_matrix

        e = _batch_matrix(batch)
        # direct squared distance (not the dot-product expansion): the
        # same float64 quantity DuckDB's list_distance orders by, so
        # near-tie argmins agree across the two engines
        d = ((e[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d, axis=1)  # first minimum = lowest cluster id
        cl, n = np.unique(a, return_counts=True)
        return pa.table(
            {
                "cluster": pa.array(cl.astype(np.int64)),
                "n": pa.array(n.astype(np.int64)),
            }
        )

    agg = (
        ray.data.read_parquet(src, columns=["vec_id", "embedding"])
        .map_batches(assign_counts, batch_format="pyarrow", batch_size=4096)
        .groupby("cluster")
        .sum("n")
        .to_pandas()
    )
    agg.columns = ["cluster", "n"]
    return (
        agg.astype({"cluster": "int64", "n": "int64"})
        .sort_values("cluster")
        .reset_index(drop=True)
    )


def _batch_matrix_seed(tbl: pa.Table) -> np.ndarray:
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    return _batch_matrix(tbl)


def cluster_sizes(sf_dir: str, k: int = 8) -> pd.DataFrame:
    """cluster, n — driver-facing summary of the k-means run."""
    assigns, _, _ = kmeans_embeddings(sf_dir, k=k)
    out = (
        assigns.groupby("cluster", as_index=False)
        .agg(n=("vec_id", "size"))
        .sort_values("cluster")
        .reset_index(drop=True)
    )
    out["cluster"] = out["cluster"].astype("int64")
    out["n"] = out["n"].astype("int64")
    return out
