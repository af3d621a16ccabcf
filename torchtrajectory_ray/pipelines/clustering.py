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


def _min_id_centroids(ds: ray.data.Dataset, k: int) -> np.ndarray:
    """Init centroids = embeddings of the k SMALLEST vec_ids — a pure
    function of the window's content (deterministic across partitioning
    and cluster size), computed with per-block partial top-k."""
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    def block_min(t: pa.Table) -> pd.DataFrame:
        ids = t["vec_id"].to_numpy().astype(np.int64)
        sel = np.argsort(ids)[:k]
        return pd.DataFrame(
            {
                "vec_id": ids[sel],
                "embedding": [
                    np.asarray(v, np.float64)
                    for v in np.asarray(
                        _batch_matrix(t), dtype=np.float64
                    )[sel]
                ],
            }
        )

    head = ds.map_batches(block_min, batch_format="pyarrow").to_pandas()
    head = head.sort_values("vec_id").head(k)
    if len(head) < k:
        raise ValueError(f"window has {len(head)} vectors < k={k}")
    return np.stack(head["embedding"].to_numpy())


def kmeans_dataset(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 12,
    *,
    yinyang: bool = False,
) -> tuple[pd.DataFrame, np.ndarray, list[float], dict]:
    """Lloyd k-means over any (vec_id, embedding) Dataset with the
    min-id deterministic init.  ``yinyang=True`` switches the assign
    pass to bound-filtered skipping (the reference's Yinyang.java:50-120
    acceleration): each point carries (assign, upper, lower) bounds that
    are adjusted by the centroid movements each round, and the k-way
    distance computation runs ONLY for points whose bounds cross —
    identical assignments (the filter is exact), fewer distance kernels.

    Returns (assignments, centroids, history, stats): ``history`` is
    per-iteration INERTIA in the plain path and per-iteration MAX
    CENTROID MOVEMENT in the yinyang path (skipped points have no exact
    distance to fold into an inertia, and movement is the bound
    signal); stats['dist_rows_computed'] / stats['rows_seen'] shows the
    skip rate under ``yinyang``."""
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    ds = ds.materialize()
    centroids = _min_id_centroids(ds, k)
    history: list[float] = []
    stats = {"rows_seen": 0, "dist_rows_computed": 0, "iters": 0}

    if not yinyang:
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
                vec_sum=(
                    "vec_sum",
                    lambda s: np.sum(np.stack(s.to_numpy()), axis=0),
                ),
            )
            history.append(float(agg["inertia"].sum()))
            stats["iters"] += 1
            new_c = centroids.copy()
            for c, row in agg.iterrows():
                new_c[int(c)] = np.asarray(row["vec_sum"]) / row["count"]
            if np.allclose(new_c, centroids, atol=1e-12):
                break
            centroids = new_c
            if len(history) >= 2 and abs(history[-1] - history[-2]) < 1e-9:
                break
    else:
        # state rows: vec_id, embedding, assign, ub, lb (euclidean)
        def init_state(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return t.append_column(
                "assign", pa.array(np.full(n, -1, np.int64))
            ).append_column(
                "ub", pa.array(np.full(n, np.inf))
            ).append_column("lb", pa.array(np.full(n, -np.inf)))

        state = ds.map_batches(
            init_state, batch_format="pyarrow", batch_size=4096
        ).materialize()
        moves = np.full(k, np.inf)  # first round: recompute everything
        for _ in range(iters):
            C = centroids
            mv, mvmax = moves, float(np.max(moves))

            def step(t: pa.Table) -> pa.Table:
                e = _batch_matrix(t)
                a = t["assign"].to_numpy().astype(np.int64).copy()
                ub = t["ub"].to_numpy().astype(np.float64).copy()
                lb = t["lb"].to_numpy().astype(np.float64).copy()
                live = a >= 0
                ub[live] += mv[a[live]]
                lb[live] -= mvmax
                redo = ~(live & (ub < lb))
                if redo.any():
                    d = np.sqrt(
                        np.maximum(
                            ((e[redo, None, :] - C[None, :, :]) ** 2).sum(
                                axis=2
                            ),
                            0.0,
                        )
                    )
                    a[redo] = np.argmin(d, axis=1)
                    srt = np.sort(d, axis=1)
                    ub[redo] = srt[:, 0]
                    lb[redo] = srt[:, 1] if k > 1 else np.inf
                return pa.table(
                    {
                        "vec_id": t["vec_id"],
                        "embedding": t["embedding"],
                        "assign": pa.array(a),
                        "ub": pa.array(ub),
                        "lb": pa.array(lb),
                        "redone": pa.array(redo.astype(np.int64)),
                    }
                )

            state = state.map_batches(
                step, batch_format="pyarrow", batch_size=4096
            ).materialize()
            stats["dist_rows_computed"] += int(state.sum("redone"))

            def sums(t: pa.Table) -> pa.Table:
                e = _batch_matrix(t)
                a = t["assign"].to_numpy().astype(np.int64)
                rows = []
                for c in np.unique(a):
                    m = a == c
                    rows.append(
                        {
                            "cluster": int(c),
                            "count": int(m.sum()),
                            "vec_sum": e[m].sum(axis=0).tolist(),
                        }
                    )
                return pa.Table.from_pylist(rows)

            parts = state.map_batches(
                sums, batch_format="pyarrow", batch_size=4096
            ).to_pandas()
            agg = parts.groupby("cluster").agg(
                count=("count", "sum"),
                vec_sum=(
                    "vec_sum",
                    lambda s: np.sum(np.stack(s.to_numpy()), axis=0),
                ),
            )
            stats["rows_seen"] += int(parts["count"].sum())
            stats["iters"] += 1
            new_c = centroids.copy()
            for c, row in agg.iterrows():
                new_c[int(c)] = np.asarray(row["vec_sum"]) / row["count"]
            moves = np.sqrt(((new_c - centroids) ** 2).sum(axis=1))
            history.append(float(moves.max()))
            centroids = new_c
            if float(moves.max()) < 1e-12:
                break

    def final_assign(batch: pa.Table) -> pa.Table:
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
    return assigns, centroids, history, stats


def windowed_kmeans(
    sf_dir: str,
    k: int = 4,
    window_us: int = 3_600_000_000,
    slide_us: int = 1_800_000_000,
    iters: int = 8,
    concurrency: int = 4,
) -> pd.DataFrame:
    """Sliding-window re-clustering — the reference's StreamKpath loop
    (clustering/Streaming/StreamKpath.java): re-run k-means over the
    vectors inside each sliding event-time window.

    The sf fixture stream is embeddings joined to their event times
    (``vec_id == event_id``, a broadcast lookup — GATE-SCALE plumbing
    only: a real vector stream already carries its timestamps, and at
    cluster scale the stamp would be a hash join, not a driver-built
    lookup array).  Each window's run is an INDEPENDENT deterministic
    k-means (min-id init), so a window's result equals a batch run over
    that window's slice — the window-identity property the tests
    assert; windows are also independent of each other, so a cluster
    deployment can process them concurrently.  Returns one row per
    (window_start_us, cluster): member count."""
    import pyarrow.parquet as pq
    import pyarrow.dataset as pads

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    n_vec = pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows
    ev = pads.dataset(
        f"{sf_dir}/events.parquet", format="parquet"
    ).to_table(
        columns=["event_id", "ts"],
        filter=pads.field("event_id") < n_vec,
    )
    ts_of = np.full(n_vec, -1, np.int64)
    ts_of[ev["event_id"].to_numpy()] = ev["ts"].to_numpy().astype(np.int64)

    def stamp(t: pa.Table) -> pa.Table:
        ids = t["vec_id"].to_numpy().astype(np.int64)
        return t.append_column("ts_us", pa.array(ts_of[ids], pa.int64()))

    stream = emb.map_batches(stamp, batch_format="pyarrow").materialize()
    if not (ts_of >= 0).any():
        # no event joins any embedding: an empty windowed result, not a
        # reduction crash
        return pd.DataFrame(
            columns=["window_start_us", "cluster", "n"]
        ).astype("int64")
    lo = int(ts_of[ts_of >= 0].min())
    hi = int(ts_of.max())
    start0 = lo - (lo % slide_us)
    starts = list(range(start0, hi + 1, slide_us))

    def run_window(w0: int) -> list[tuple[int, int, int]]:
        win = stream.filter(
            expr=f"ts_us >= {w0} and ts_us < {w0 + window_us}"
        )
        if win.count() < k:
            return []
        assigns, _, _, _ = kmeans_dataset(
            win.select_columns(["vec_id", "embedding"]), k, iters
        )
        g = assigns.groupby("cluster").size()
        return [(w0, int(c), int(n)) for c, n in g.items()]

    # windows are INDEPENDENT deterministic runs, so they overlap freely:
    # a thread per in-flight window keeps the cluster busy while another
    # window's driver-side reduce runs (the GIL is released inside Ray
    # waits).  Results are reassembled in window order, so the output is
    # bit-identical to the sequential loop at any concurrency.
    out: list[tuple[int, int, int]] = []
    if concurrency <= 1 or len(starts) <= 1:
        for w0 in starts:
            out.extend(run_window(w0))
    else:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=concurrency) as ex:
            for rows in ex.map(run_window, starts):
                out.extend(rows)
    return pd.DataFrame(
        out, columns=["window_start_us", "cluster", "n"]
    ).astype("int64")


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
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    centroids = _batch_matrix(seed_tbl)[order]
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
