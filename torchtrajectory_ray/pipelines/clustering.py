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

import json
import os

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


N_STAMP_PARTS = 64  # hash-join partitions for the vec_id==event_id stamp


def _stamped_window_layout(
    sf_dir: str, slide_us: int, scratch: str
) -> list[int]:
    """Stamp every embedding with its event time via a DISTRIBUTED
    hash join (vec_id == event_id) and write the stamped stream to
    ``scratch`` as parquet hive-partitioned by the tumbling slide
    bucket (``slide_idx = ts_us // slide_us``).  Returns the sorted
    slide-bucket ids present.

    Nothing corpus-sized ever touches the driver: both sides ship
    through one bounded-partition exchange (the union∪groupby join
    shape), and per-window consumers later read ONLY their buckets
    back (partition-pruned).  The bucket list is directory metadata,
    not data — O(windows), the same scale as the result itself."""
    import pyarrow.parquet as pq

    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    emb_type = (
        pq.read_schema(f"{sf_dir}/embeddings.parquet")
        .field("embedding")
        .type
    )

    def emb_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t["vec_id"].cast(pa.int64()),
                "embedding": t["embedding"],
                "ts_us": pa.nulls(len(t), pa.int64()),
                "side": pa.array(
                    np.zeros(len(t), np.int8), pa.int8()
                ),
            }
        )

    def ev_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id": t["event_id"].cast(pa.int64()),
                "embedding": pa.nulls(len(t), emb_type),
                "ts_us": t["ts"].cast(pa.int64()),
                "side": pa.array(np.ones(len(t), np.int8), pa.int8()),
            }
        )

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts"]
    )
    both = emb.map_batches(emb_side, batch_format="pyarrow").union(
        ev.map_batches(ev_side, batch_format="pyarrow")
    )

    def add_jb(t: pa.Table) -> pa.Table:
        jb = (
            t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            % N_STAMP_PARTS
        ).astype(np.int32)
        return t.append_column("jb", pa.array(jb, pa.int32()))

    def join_group(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_ev = side == 1
        ev_ids = ids[is_ev]
        ev_ts = t["ts_us"].to_numpy(zero_copy_only=False)[is_ev].astype(
            np.int64
        )
        order = np.argsort(ev_ids, kind="stable")
        ev_ids, ev_ts = ev_ids[order], ev_ts[order]
        emb_rows = np.flatnonzero(~is_ev)
        if len(ev_ids) == 0 or len(emb_rows) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": pa.nulls(0, emb_type),
                    "ts_us": pa.array([], pa.int64()),
                    "slide_idx": pa.array([], pa.int64()),
                }
            )
        vids = ids[emb_rows]
        j = np.searchsorted(ev_ids, vids)
        j = np.clip(j, 0, len(ev_ids) - 1)
        hit = ev_ids[j] == vids
        keep = emb_rows[hit]
        ts = ev_ts[j[hit]]
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table(
            {
                "vec_id": sub["id"],
                "embedding": sub["embedding"],
                "ts_us": pa.array(ts, pa.int64()),
                "slide_idx": pa.array(ts // slide_us, pa.int64()),
            }
        )

    (
        both.map_batches(add_jb, batch_format="pyarrow")
        .groupby("jb")
        .map_groups(join_group, batch_format="pyarrow")
        .write_parquet(scratch, partition_cols=["slide_idx"])
    )
    buckets = sorted(
        int(name.split("=", 1)[1])
        for name in os.listdir(scratch)
        if name.startswith("slide_idx=")
    )
    return buckets


# Identity bound for the in-task local Lloyd: kmeans_dataset slices its
# input into ≤4096-row batches, so a window at or under that size runs
# as EXACTLY ONE batch there — the driver fold over one partial is the
# identity, and the local single-batch loop reproduces the distributed
# result bit for bit (same kernels, same float64 summation order).
_LOCAL_WINDOW_MAX = 4096


def _kmeans_local(
    tbl: pa.Table, k: int, iters: int
) -> list[tuple[int, int]]:
    """Single-batch mirror of :func:`kmeans_dataset`'s plain path —
    SAME init (min-id), SAME assignment kernel (_assign_partials), SAME
    driver fold and convergence breaks, run on one in-task table.
    Returns (cluster, n) for the final assignment."""
    from torchtrajectory_ray.pipelines.knn import _batch_matrix

    ids = tbl["vec_id"].to_numpy().astype(np.int64)
    sel = np.argsort(ids)[:k]
    e64 = np.asarray(_batch_matrix(tbl), dtype=np.float64)
    centroids = e64[sel].copy()
    history: list[float] = []
    for _ in range(iters):
        parts = _assign_partials(tbl, centroids).to_pandas()
        agg = parts.groupby("cluster").agg(
            count=("count", "sum"),
            inertia=("inertia", "sum"),
            vec_sum=(
                "vec_sum",
                lambda s: np.sum(np.stack(s.to_numpy()), axis=0),
            ),
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
    e = _batch_matrix(tbl)
    d = -2.0 * (e @ centroids.T) + (centroids**2).sum(axis=1)[None, :]
    cl, n = np.unique(np.argmin(d, axis=1), return_counts=True)
    return [(int(c), int(m)) for c, m in zip(cl, n)]


class _WindowKMeansTask:
    """One window per input row: pushdown-read the window's slide
    buckets, residual-filter to the window span, run the local Lloyd.
    Windows over the single-batch identity bound emit a DEFER marker
    row (cluster = -1) for the caller's distributed path."""

    def __init__(self, k: int, iters: int, window_us: int):
        self.k = k
        self.iters = iters
        self.window_us = window_us

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        rows: list[tuple[int, int, int]] = []
        for w0, paths_json in zip(batch["w0"], batch["paths"]):
            w0 = int(w0)
            tbl = pads.dataset(
                json.loads(paths_json), format="parquet"
            ).to_table(columns=["vec_id", "embedding", "ts_us"])
            mask = pc.and_(
                pc.greater_equal(tbl["ts_us"], w0),
                pc.less(tbl["ts_us"], w0 + self.window_us),
            )
            tbl = tbl.filter(mask).select(["vec_id", "embedding"])
            if tbl.num_rows < self.k:
                continue
            if tbl.num_rows > _LOCAL_WINDOW_MAX:
                rows.append((w0, -1, tbl.num_rows))
                continue
            rows.extend(
                (w0, c, n)
                for c, n in _kmeans_local(tbl, self.k, self.iters)
            )
        return pd.DataFrame(
            rows, columns=["window_start_us", "cluster", "n"]
        ).astype("int64")


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

    Scale shape (de-drivered in round 5): the event-time stamp is a
    DISTRIBUTED hash join (``vec_id == event_id`` through a bounded
    partition exchange — never a driver-built lookup array), the
    stamped stream lands on disk partitioned by slide bucket, and each
    window's k-means consumes a PARTITION-PRUNED read of just its
    buckets (window working set in the object store; the corpus never
    materializes whole anywhere).  Each window's run is an INDEPENDENT
    deterministic k-means (min-id init), so a window's result equals a
    batch run over that window's slice — the window-identity property
    the tests assert.  Windows fan out as ONE RAY TASK EACH (the local
    Lloyd is a bit-identical single-batch mirror of kmeans_dataset);
    only a window too large for one batch falls back to a distributed
    per-window run.  Returns one row per (window_start_us, cluster):
    member count.  ``concurrency`` is accepted for API compatibility
    (the task fan-out parallelizes windows natively now)."""
    import shutil
    import tempfile

    scratch = tempfile.mkdtemp(prefix="ttray_wkm_", dir="/tmp")
    try:
        buckets = _stamped_window_layout(sf_dir, slide_us, scratch)
        if not buckets:
            # no event joins any embedding: an empty windowed result,
            # not a reduction crash
            return pd.DataFrame(
                columns=["window_start_us", "cluster", "n"]
            ).astype("int64")
        # min-bucket × slide == lo - lo % slide: the bucket ids ARE the
        # aligned window starts, no timestamp scan needed
        starts = [
            b * slide_us for b in range(buckets[0], buckets[-1] + 1)
        ]

        bucket_set = set(buckets)

        def window_paths(w0: int) -> list[str]:
            b0 = w0 // slide_us
            b1 = (w0 + window_us - 1) // slide_us
            # partition pruning by PATH: only this window's slide-bucket
            # directories are opened (the hive layout is the prune)
            return [
                f"{scratch}/slide_idx={b}/{f}"
                for b in range(b0, b1 + 1)
                if b in bucket_set
                for f in sorted(os.listdir(f"{scratch}/slide_idx={b}"))
                if f.endswith(".parquet")
            ]

        # WINDOWS are the parallelism unit: one Ray task per window does
        # its own pushdown read + the single-batch local Lloyd (exact
        # mirror of kmeans_dataset — see _kmeans_local).  Driving each
        # tiny window through its own multi-round Dataset execution pays
        # ~10 executor round-trips per window; one task per window pays
        # one.  A window too big for the single-batch identity bound
        # emits a DEFER marker and runs on the distributed path below —
        # at scale those few windows each saturate the cluster anyway.
        specs = pd.DataFrame(
            {
                "w0": pd.array(
                    [w for w in starts if window_paths(w)], dtype="int64"
                ),
            }
        )
        specs["paths"] = [
            json.dumps(window_paths(int(w))) for w in specs["w0"]
        ]
        if specs.empty:
            return pd.DataFrame(
                columns=["window_start_us", "cluster", "n"]
            ).astype("int64")
        res = (
            ray.data.from_pandas(specs)
            .repartition(len(specs))
            .map_batches(
                _WindowKMeansTask(k, iters, window_us),
                batch_format="pandas",
                batch_size=None,
            )
            .to_pandas()  # O(windows × k) rows
        )
        deferred = res[res["cluster"] < 0]
        out = res[res["cluster"] >= 0]
        rows: list[tuple[int, int, int]] = []
        for w0 in deferred["window_start_us"]:
            w0 = int(w0)
            win = (
                ray.data.read_parquet(window_paths(w0))
                .filter(
                    expr=f"ts_us >= {w0} and ts_us < {w0 + window_us}"
                )
                .select_columns(["vec_id", "embedding"])
                .materialize()  # ONE window's working set, not the corpus
            )
            assigns, _, _, _ = kmeans_dataset(win, k, iters)
            g = assigns.groupby("cluster").size()
            rows.extend((w0, int(c), int(n)) for c, n in g.items())
        out = pd.concat(
            [out, pd.DataFrame(rows, columns=out.columns)],
            ignore_index=True,
        )
        return (
            out.astype("int64")
            .sort_values(["window_start_us", "cluster"])
            .reset_index(drop=True)
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


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
