"""Generic analytic operators over the TPC-H-ish tables — the engine's
aggregate / join / top-k building blocks exercised end-to-end.

Patterns (each named in SURVEY.md §2's Ray-mapping column):
- partial (combiner) aggregation inside ``map_batches`` before the small
  ``groupby`` — the A8-style histogram shape; the shuffle moves one row
  per (batch × group), not per input row;
- broadcast hash join: the small side is collected once and shipped to
  every task (J2/J5 broadcast-lookup shape) instead of an all-to-all
  shuffle join;
- global sort + limit only on already-reduced data (K5).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape: per (returnflag, linestatus) sums/averages with
    in-batch partial aggregation."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        df["charge"] = df["disc_price"] * (1 + df["l_tax"])
        g = (
            df.groupby(["l_returnflag", "l_linestatus"], as_index=False)
            .agg(
                sum_qty=("l_quantity", "sum"),
                sum_base_price=("l_extendedprice", "sum"),
                sum_disc_price=("disc_price", "sum"),
                sum_charge=("charge", "sum"),
                sum_disc=("l_discount", "sum"),
                count_order=("l_quantity", "size"),
            )
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag",
                "l_linestatus",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
                "l_tax",
            ],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .sum(
            ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
             "sum_disc", "count_order"]
        )
    )
    df = ds.to_pandas()
    df.columns = [c.replace("sum(", "").replace(")", "") for c in df.columns]
    out = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            # big float sums rounded to 2dp: accumulation order differs
            # between engines, and ~1e9-magnitude doubles only carry ~7
            # stable decimals — 6dp would compare noise
            "sum_qty": df["sum_qty"].round(2),
            "sum_base_price": df["sum_base_price"].round(2),
            "sum_disc_price": df["sum_disc_price"].round(2),
            "sum_charge": df["sum_charge"].round(2),
            "avg_qty": (df["sum_qty"] / df["count_order"]).round(6),
            "avg_price": (df["sum_base_price"] / df["count_order"]).round(6),
            "avg_disc": (df["sum_disc"] / df["count_order"]).round(6),
            "count_order": df["count_order"].astype("int64"),
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def revenue_topk(
    sf_dir: str,
    k: int = 10,
    segment: str = "BUILDING",
    _audit: dict | None = None,
) -> pd.DataFrame:
    """TPC-H Q3 shape: broadcast-join lineitem → orders → customer
    (small sides collected once and shipped via ``ray.put``), partial
    revenue per batch, distributed per-order groupby, then a per-block
    partial top-k so the driver only ever sees O(k × blocks) candidate
    rows — never the full per-order table.  Order dates are hydrated for
    the k winners only (no driver-side dict over the segment's orders).

    ``_audit``, when passed, receives ``n_candidate_rows`` /
    ``n_blocks`` so tests can assert the driver-held volume bound.
    """
    import ray
    import pyarrow.parquet as pq

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    )
    wanted_cust = set(
        cust.filter(pc.equal(cust["c_mktsegment"], segment))["c_custkey"].to_pylist()
    )
    orders = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )
    omask = pc.is_in(orders["o_custkey"], value_set=pa.array(list(wanted_cust)))
    sel = orders.filter(omask)
    # broadcast side: sorted wanted-orderkey array (one market segment's
    # orders) — membership via searchsorted, not per-batch set hashing;
    # put ONCE into the object store, fetched zero-copy inside each task.
    wanted_keys = np.sort(sel["o_orderkey"].to_numpy())
    if len(wanted_keys) == 0:
        return pd.DataFrame(columns=["rank", "l_orderkey", "revenue", "o_orderdate"])
    wanted_ref = ray.put(wanted_keys)

    def partial(batch: pa.Table) -> pa.Table:
        wk = ray.get(wanted_ref)  # node-local after first fetch
        keys = batch["l_orderkey"].to_numpy()
        j = np.searchsorted(wk, keys)
        j = np.clip(j, 0, len(wk) - 1)
        hit = wk[j] == keys
        if not hit.any():
            return pa.table(
                {
                    "l_orderkey": pa.array([], pa.int64()),
                    "revenue": pa.array([], pa.float64()),
                }
            )
        rev = (
            batch["l_extendedprice"].to_numpy()[hit]
            * (1 - batch["l_discount"].to_numpy()[hit])
        )
        g = (
            pd.DataFrame({"l_orderkey": keys[hit], "revenue": rev})
            .groupby("l_orderkey", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def block_topk(batch: pa.Table) -> pa.Table:
        # local top-k per grouped block under the GLOBAL sort key
        # (6-dp-rounded revenue desc, orderkey asc): every global winner
        # is a local winner, so this is lossless for the final head(k)
        df = batch.to_pandas()
        # rename BY NAME so a Ray Data aggregate-output schema change
        # fails loud here instead of silently mislabeling columns
        df = df.rename(columns={"sum(revenue)": "revenue"})
        if list(df.columns) != ["l_orderkey", "revenue"]:
            raise ValueError(
                f"block_topk: unexpected aggregate schema {list(df.columns)}"
            )
        df["revenue"] = df["revenue"].round(6)
        df = df.sort_values(
            ["revenue", "l_orderkey"], ascending=[False, True]
        ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand_ds = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_orderkey")
        .sum("revenue")
        .map_batches(block_topk, batch_format="pyarrow")
    )
    cand = cand_ds.to_pandas()  # O(k × blocks) rows by construction
    if _audit is not None:
        _audit["n_candidate_rows"] = len(cand)
        _audit["k"] = k
    top = cand.sort_values(
        ["revenue", "l_orderkey"], ascending=[False, True]
    ).head(k)
    # hydrate dates for the k winners only, from the already-filtered
    # orders table (k-row semi-join, not an O(orders) driver dict)
    win = sel.filter(
        pc.is_in(sel["o_orderkey"], value_set=pa.array(top["l_orderkey"].tolist()))
    )
    dmap = dict(
        zip(win["o_orderkey"].to_pylist(),
            (str(v) for v in win["o_orderdate"].to_pylist()))
    )
    top = top.copy()
    top["o_orderdate"] = top["l_orderkey"].map(dmap)
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["rank", "l_orderkey", "revenue", "o_orderdate"]].reset_index(
        drop=True
    )


def part_type_stats(sf_dir: str) -> pd.DataFrame:
    """p_type, n_parts, avg_retail — single-key groupby with in-batch
    partials over the part dimension table."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("p_type", as_index=False).agg(
            n_parts=("p_partkey", "size"), sum_retail=("p_retailprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_type", "p_retailprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("p_type")
        .sum(["n_parts", "sum_retail"])
        .to_pandas()
    )
    agg.columns = ["p_type", "n_parts", "sum_retail"]
    out = pd.DataFrame(
        {
            "p_type": agg["p_type"],
            "n_parts": agg["n_parts"].astype("int64"),
            "avg_retail": (agg["sum_retail"] / agg["n_parts"]).round(6),
        }
    )
    return out.sort_values("p_type").reset_index(drop=True)


def supplier_nation_balance(sf_dir: str) -> pd.DataFrame:
    """n_name, n_suppliers, sum_acctbal — supplier fact joined to the
    broadcast nation dimension."""
    import pyarrow.parquet as pq

    nname = {
        n["n_nationkey"]: n["n_name"]
        for n in pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    }

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("s_nationkey", as_index=False).agg(
            n_suppliers=("s_suppkey", "size"), sum_acctbal=("s_acctbal", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_nationkey", "s_acctbal"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("s_nationkey")
        .sum(["n_suppliers", "sum_acctbal"])
        .to_pandas()
    )
    agg.columns = ["s_nationkey", "n_suppliers", "sum_acctbal"]
    out = pd.DataFrame(
        {
            "n_name": agg["s_nationkey"].map(nname),
            "n_suppliers": agg["n_suppliers"].astype("int64"),
            "sum_acctbal": agg["sum_acctbal"].round(6),
        }
    )
    return out.sort_values("n_name").reset_index(drop=True)


def nation_customer_stats(sf_dir: str) -> pd.DataFrame:
    """Customer count + account balance per nation/region name: dimension
    tables (nation, region) broadcast, fact aggregated with a partial."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
    region = {
        r["r_regionkey"]: r["r_name"]
        for r in pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
    }
    nname = {n["n_nationkey"]: n["n_name"] for n in nation}
    nregion = {n["n_nationkey"]: region[n["n_regionkey"]] for n in nation}

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("c_nationkey", as_index=False).agg(
            n_customers=("c_custkey", "size"), sum_acctbal=("c_acctbal", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ray.data.read_parquet(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_nationkey", "c_acctbal"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby("c_nationkey")
        .sum(["n_customers", "sum_acctbal"])
        .to_pandas()
    )
    agg.columns = ["c_nationkey", "n_customers", "sum_acctbal"]
    out = pd.DataFrame(
        {
            "n_name": agg["c_nationkey"].map(nname),
            "r_name": agg["c_nationkey"].map(nregion),
            "n_customers": agg["n_customers"].astype("int64"),
            "sum_acctbal": agg["sum_acctbal"].round(6),
        }
    )
    return out.sort_values("n_name").reset_index(drop=True)


def revenue_rollup(sf_dir: str) -> pd.DataFrame:
    """ROLLUP aggregate over orders: (priority, status) → (priority) →
    grand total, one distributed pass.  Per-batch partials key the
    FINEST level only; the coarser levels are re-aggregated from the
    finest RESULT (|priorities|×|statuses| rows — post-aggregate data,
    driver-side by design), so the corpus is read once and shuffled
    never.  Subtotal keys use the literal ``'ALL'`` (the data's enum
    values never collide with it), matching the SQL oracle's COALESCE
    over GROUP BY ROLLUP.  Float sums follow the 2dp big-sum protocol
    (see :func:`pricing_summary`)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["o_orderpriority", "o_orderstatus", "o_totalprice"]
        ).to_pandas()
        g = df.groupby(
            ["o_orderpriority", "o_orderstatus"], as_index=False
        ).agg(sum_price=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .sum(["sum_price", "n_orders"])
    )
    fine = ds.to_pandas()
    fine.rename(
        columns={"sum(sum_price)": "sum_price", "sum(n_orders)": "n_orders"},
        inplace=True,
    )
    if not {"sum_price", "n_orders"} <= set(fine.columns):  # fail loud
        raise RuntimeError(f"unexpected aggregate schema: {list(fine.columns)}")
    mid = fine.groupby("o_orderpriority", as_index=False).agg(
        sum_price=("sum_price", "sum"), n_orders=("n_orders", "sum")
    )
    mid["o_orderstatus"] = "ALL"
    top = pd.DataFrame(
        {
            "o_orderpriority": ["ALL"],
            "o_orderstatus": ["ALL"],
            "sum_price": [fine["sum_price"].sum()],
            "n_orders": [fine["n_orders"].sum()],
        }
    )
    out = pd.concat([fine, mid, top], ignore_index=True)
    out["sum_price"] = out["sum_price"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (
        out[["o_orderpriority", "o_orderstatus", "sum_price", "n_orders"]]
        .sort_values(["o_orderpriority", "o_orderstatus"])
        .reset_index(drop=True)
    )


def customers_no_orders(
    sf_dir: str, priority: str = "1-URGENT"
) -> ray.data.Dataset:
    """Distributed ANTI-join: customers with no ``priority``-class order
    — NOT EXISTS over two tables where NEITHER side is broadcastable at
    scale.  The priority predicate pushes into the orders READ (row
    filter, only matching rows leave storage), and both sides are
    reduced before the wide step: the probe side (orders) collapses to
    its DISTINCT ``o_custkey`` per batch (a combiner — the exchange
    moves at most one row per key per batch, never a row per order),
    the preserved side (customer) ships only the output columns.  One
    256-way Fibonacci-hash exchange on the key co-locates both sides;
    each partition drops preserved rows whose key appears in its probe
    set (``isin`` against a partition-local hash set — vectorized,
    bounded by the partition's keys).  Semi-join is the same plan with
    the mask un-negated.  Analog of the reference's membership pruning
    of candidate trajectories against the visited set
    (queryEngine/query/TrajectoryResolver.java visited-set filter)."""
    import pyarrow.dataset as pads

    def cust_part(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy().astype(np.uint64)
        part = (
            (key * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(56)
        ).astype(np.int32)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"],
                "c_name": batch["c_name"],
                "probe": pa.array(np.zeros(len(key), np.int8)),
                "part": pa.array(part, pa.int32()),
            }
        )

    def order_part(batch: pa.Table) -> pa.Table:
        key = np.unique(batch["o_custkey"].to_numpy())
        part = (
            (key.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(56)
        ).astype(np.int32)
        return pa.table(
            {
                "c_custkey": pa.array(key, pa.int64()),
                "c_name": pa.array([""] * len(key), pa.string()),
                "probe": pa.array(np.ones(len(key), np.int8)),
                "part": pa.array(part, pa.int32()),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(cust_part, batch_format="pyarrow")
    probe = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey"],
        filter=pads.field("o_orderpriority") == priority,
    ).map_batches(order_part, batch_format="pyarrow")

    def anti(g: pd.DataFrame) -> pa.Table:
        is_probe = g["probe"].to_numpy() == 1
        seen = g.loc[is_probe, "c_custkey"].to_numpy()
        keep = g.loc[~is_probe, ["c_custkey", "c_name"]]
        keep = keep[~keep["c_custkey"].isin(seen)]
        # explicit types so empty partitions keep the schema
        return pa.table(
            {
                "c_custkey": pa.array(keep["c_custkey"].to_numpy(), pa.int64()),
                "c_name": pa.array(keep["c_name"].tolist(), pa.string()),
            }
        )

    return (
        cust.union(probe)
        .groupby("part")
        .map_groups(anti, batch_format="pandas")
    )


def corr_stats(sf_dir: str) -> pd.DataFrame:
    """Per-group second-moment cross-statistics — Pearson correlation
    and sample covariance of (l_quantity, l_extendedprice) per
    l_returnflag — in ONE distributed pass with numerically stable
    partials (Chan/Golub/LeVeque pairwise combination: each batch emits
    (n, mean_x, mean_y, M2x, M2y, Cxy) per group; the driver folds one
    tiny row per batch × group).  Centered moments never form the
    catastrophic Σxy − ΣxΣy/n difference, so the result agrees with the
    SQL engine's streaming covariance to ~1 ulp relative.  The shape is
    A7/A8 (global stats via per-batch partials) extended to cross
    moments; at 100 TB the fold input stays O(batches × groups)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        rows = []
        for flag, g in df.groupby("l_returnflag"):
            x = g["l_quantity"].to_numpy()
            y = g["l_extendedprice"].to_numpy()
            mx, my = float(x.mean()), float(y.mean())
            rows.append(
                {
                    "l_returnflag": flag,
                    "n": len(x),
                    "mean_x": mx,
                    "mean_y": my,
                    "m2x": float(((x - mx) ** 2).sum()),
                    "m2y": float(((y - my) ** 2).sum()),
                    "cxy": float(((x - mx) * (y - my)).sum()),
                }
            )
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_returnflag", "l_quantity", "l_extendedprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )

    out_rows = []
    for flag, g in parts.groupby("l_returnflag"):
        n = mx = my = m2x = m2y = cxy = 0.0
        for r in g.itertuples(index=False):
            # Chan et al. 1983 pairwise update of centered moments
            nb = float(r.n)
            nt = n + nb
            dx, dy = r.mean_x - mx, r.mean_y - my
            m2x += r.m2x + dx * dx * n * nb / nt
            m2y += r.m2y + dy * dy * n * nb / nt
            cxy += r.cxy + dx * dy * n * nb / nt
            mx += dx * nb / nt
            my += dy * nb / nt
            n = nt
        out_rows.append(
            {
                "l_returnflag": flag,
                "n": int(n),
                "mean_qty": round(mx, 6),
                "mean_price": round(my, 4),
                "corr_qty_price": round(cxy / np.sqrt(m2x * m2y), 6),
                "covar_qty_price": round(cxy / (n - 1), 2),
            }
        )
    return (
        pd.DataFrame(out_rows)
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )


def nation_revenue(sf_dir: str, region: str = "ASIA") -> pd.DataFrame:
    """TPC-H Q5 shape: revenue per nation where the ordering customer
    and the line's supplier sit in the SAME nation of one region.  The
    genuinely wide step — lineitem ⋈ orders on orderkey, two fact
    tables — is a 256-way content-hash exchange (one shuffle, both
    sides keyed by the same Fibonacci hash of the orderkey, joined
    vectorized per partition); customer and supplier are dimensions
    broadcast as sorted key arrays + searchsorted lookups inside the
    read (J2/J5 shape — at TPC-H's customer:lineitem ≈ 1:40 ratio the
    broadcast is the documented assumption; past broadcastable size the
    customer stamp would move into the same exchange keyed by custkey
    first).  Per-partition output is pre-aggregated to (nationkey,
    revenue) partials, so the final groupby moves O(partitions ×
    nations) rows."""
    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet")
    reg = pq.read_table(f"{sf_dir}/region.parquet")
    rkey = reg.filter(pc.equal(reg["r_name"], region))["r_regionkey"]
    nsel = nat.filter(pc.is_in(nat["n_regionkey"], value_set=rkey))
    nation_keys = set(nsel["n_nationkey"].to_pylist())
    nation_names = dict(
        zip(nsel["n_nationkey"].to_pylist(), nsel["n_name"].to_pylist())
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    cmask = pc.is_in(cust["c_nationkey"], value_set=nsel["n_nationkey"])
    cust = cust.filter(cmask)
    c_keys = cust["c_custkey"].to_numpy()
    c_order = np.argsort(c_keys)
    c_keys, c_nat = c_keys[c_order], cust["c_nationkey"].to_numpy()[c_order]

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    smask = pc.is_in(supp["s_nationkey"], value_set=nsel["n_nationkey"])
    supp = supp.filter(smask)
    s_keys = supp["s_suppkey"].to_numpy()
    s_order = np.argsort(s_keys)
    s_keys, s_nat = s_keys[s_order], supp["s_nationkey"].to_numpy()[s_order]

    def _part_of(keys: np.ndarray) -> np.ndarray:
        return (
            (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(56)
        ).astype(np.int32)

    def order_side(batch: pa.Table) -> pa.Table:
        ok = batch["o_orderkey"].to_numpy()
        ck = batch["o_custkey"].to_numpy()
        pos = np.searchsorted(c_keys, ck)
        pos = np.clip(pos, 0, len(c_keys) - 1)
        hit = c_keys[pos] == ck if len(c_keys) else np.zeros(len(ck), bool)
        ok, pos = ok[hit], pos[hit]
        return pa.table(
            {
                "part": pa.array(_part_of(ok), pa.int32()),
                "okey": pa.array(ok, pa.int64()),
                "nation": pa.array(c_nat[pos].astype(np.int32), pa.int32()),
                "revenue": pa.array(np.zeros(len(ok)), pa.float64()),
                "side": pa.array(np.zeros(len(ok), np.int8), pa.int8()),
            }
        )

    def line_side(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy()
        sk = batch["l_suppkey"].to_numpy()
        pos = np.searchsorted(s_keys, sk)
        pos = np.clip(pos, 0, len(s_keys) - 1)
        hit = s_keys[pos] == sk if len(s_keys) else np.zeros(len(sk), bool)
        rev = (
            batch["l_extendedprice"].to_numpy() * (1.0 - batch["l_discount"].to_numpy())
        )[hit]
        ok, pos = ok[hit], pos[hit]
        return pa.table(
            {
                "part": pa.array(_part_of(ok), pa.int32()),
                "okey": pa.array(ok, pa.int64()),
                "nation": pa.array(s_nat[pos].astype(np.int32), pa.int32()),
                "revenue": pa.array(rev, pa.float64()),
                "side": pa.array(np.ones(len(ok), np.int8), pa.int8()),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).map_batches(order_side, batch_format="pyarrow")
    lines = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(line_side, batch_format="pyarrow")

    def join_part(g: pd.DataFrame) -> pd.DataFrame:
        o = g[g["side"] == 0]
        l = g[g["side"] == 1]
        m = l.merge(
            o[["okey", "nation"]], on="okey", suffixes=("", "_cust")
        )
        m = m[m["nation"] == m["nation_cust"]]
        if m.empty:
            return pd.DataFrame({"nationkey": pd.Series([], dtype=np.int32),
                                 "revenue": pd.Series([], dtype=np.float64)})
        agg = m.groupby("nation", as_index=False)["revenue"].sum()
        return pd.DataFrame(
            {"nationkey": agg["nation"].astype(np.int32),
             "revenue": agg["revenue"]}
        )

    parts = (
        orders.union(lines)
        .groupby("part")
        .map_groups(join_part, batch_format="pandas")
        .to_pandas()
    )
    agg = parts.groupby("nationkey", as_index=False)["revenue"].sum()
    agg["n_name"] = agg["nationkey"].map(nation_names)
    agg["revenue"] = agg["revenue"].round(2)
    return (
        agg[["n_name", "revenue"]]
        .sort_values(["revenue", "n_name"], ascending=[False, True])
        .reset_index(drop=True)
    )


def priority_ntile(sf_dir: str, tiles: int = 4) -> pd.DataFrame:
    """Distributed NTILE(t) without a global sort: equal-split tiles of
    orders under the strict total order (o_totalprice, o_orderkey),
    aggregated per (tile, o_orderpriority).  The t−1 boundary ROWS are
    found by distributed rank selection (functions/rankselect: histogram
    descent + integer-key tie-break — driver state O(bins × t), never
    O(rows)); every batch then stamps its rows with one vectorized
    composite comparison per boundary and emits (tile, priority)
    partials.  SQL window NTILE sorts the world; this reads the corpus
    a handful of times and shuffles one tiny partial table."""
    from torchtrajectory_ray.functions.rankselect import select_ranks

    path = f"{sf_dir}/orders.parquet"

    def make_ds():
        return ray.data.read_parquet(
            path, columns=["o_totalprice", "o_orderkey"]
        )

    n = int(make_ds().count())  # parquet count comes from file metadata
    # NTILE semantics: first (n mod t) tiles get ceil(n/t) rows
    q, r = divmod(n, tiles)
    sizes = [q + 1 if i < r else q for i in range(tiles)]
    bounds = list(np.cumsum(sizes)[:-1])  # last rank of tiles 1..t-1
    picked = select_ranks(
        make_ds, "o_totalprice", [int(b) for b in bounds], key_col="o_orderkey"
    )
    bvals = np.array([picked[b][0] for b in bounds], np.float64)
    bkeys = np.array([picked[b][1] for b in bounds], np.int64)

    def stamp(batch: pa.Table) -> pa.Table:
        p = batch["o_totalprice"].to_numpy()
        k = batch["o_orderkey"].to_numpy()
        tile = np.ones(len(p), np.int64)
        for bv, bk in zip(bvals, bkeys):
            tile += (p > bv) | ((p == bv) & (k > bk))
        df = pd.DataFrame(
            {
                "tile": tile,
                "o_orderpriority": batch["o_orderpriority"].to_pandas(),
                "o_totalprice": p,
            }
        )
        g = df.groupby(["tile", "o_orderpriority"], as_index=False).agg(
            n_orders=("o_totalprice", "size"), sum_price=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        ray.data.read_parquet(
            path, columns=["o_totalprice", "o_orderkey", "o_orderpriority"]
        )
        .map_batches(stamp, batch_format="pyarrow")
        .groupby(["tile", "o_orderpriority"])
        .sum(["n_orders", "sum_price"])
    )
    df = ds.to_pandas()
    df.rename(
        columns={"sum(n_orders)": "n_orders", "sum(sum_price)": "sum_price"},
        inplace=True,
    )
    if not {"n_orders", "sum_price"} <= set(df.columns):  # fail loud
        raise RuntimeError(f"unexpected aggregate schema: {list(df.columns)}")
    df["n_orders"] = df["n_orders"].astype("int64")
    df["sum_price"] = df["sum_price"].round(2)
    return (
        df[["tile", "o_orderpriority", "n_orders", "sum_price"]]
        .sort_values(["tile", "o_orderpriority"])
        .reset_index(drop=True)
    )


def nation_suppliers(sf_dir: str) -> pd.DataFrame:
    """Ordered string aggregation (SQL ``string_agg(... ORDER BY ...)``)
    per nation: supplier count and the comma-joined, name-sorted list.
    Per-batch partials carry one small list per (nation × batch); the
    deterministic global order comes from ONE sort of the already
    per-group-reduced lists on the driver (groups ≪ rows — at any
    corpus size the driver holds one string per group member, which is
    the operator's OUTPUT, not the corpus)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["s_nationkey", "s_name"]).to_pandas()
        g = df.groupby("s_nationkey")["s_name"].agg(list).reset_index()
        g.rename(columns={"s_name": "names"}, inplace=True)
        g["n_suppliers"] = g["names"].map(len).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    import pyarrow.parquet as pq

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_name"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    rows = []
    for nk, g in parts.groupby("s_nationkey"):
        names = sorted(x for lst in g["names"] for x in lst)
        rows.append(
            {
                "s_nationkey": nk,
                "n_suppliers": int(g["n_suppliers"].sum()),
                "supplier_names": ",".join(names),
            }
        )
    out = pd.DataFrame(rows).merge(
        nat, left_on="s_nationkey", right_on="n_nationkey"
    )
    return (
        out[["n_name", "n_suppliers", "supplier_names"]]
        .sort_values("n_name")
        .reset_index(drop=True)
    )


def revenue_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(priority, status) in one corpus pass: the finest
    (priority, status) partials stream through ``map_batches`` once;
    the other three grouping sets — (priority), (status), () — are
    re-aggregated from the finest RESULT (|priorities|×|statuses| rows
    of post-aggregate data).  Same discipline as
    :func:`revenue_rollup`, completing the grouping-set family; the
    'ALL' literal matches the SQL oracle's COALESCE."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["o_orderpriority", "o_orderstatus", "o_totalprice"]
        ).to_pandas()
        g = df.groupby(
            ["o_orderpriority", "o_orderstatus"], as_index=False
        ).agg(sum_price=("o_totalprice", "sum"), n_orders=("o_totalprice", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    ds = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .sum(["sum_price", "n_orders"])
    )
    fine = ds.to_pandas()
    fine.rename(
        columns={"sum(sum_price)": "sum_price", "sum(n_orders)": "n_orders"},
        inplace=True,
    )
    if not {"sum_price", "n_orders"} <= set(fine.columns):  # fail loud
        raise RuntimeError(f"unexpected aggregate schema: {list(fine.columns)}")

    def _lvl(keys: list[str]) -> pd.DataFrame:
        if keys:
            g = fine.groupby(keys, as_index=False).agg(
                sum_price=("sum_price", "sum"), n_orders=("n_orders", "sum")
            )
        else:
            g = pd.DataFrame(
                {"sum_price": [fine["sum_price"].sum()],
                 "n_orders": [fine["n_orders"].sum()]}
            )
        for col in ("o_orderpriority", "o_orderstatus"):
            if col not in g.columns:
                g[col] = "ALL"
        return g

    out = pd.concat(
        [fine, _lvl(["o_orderpriority"]), _lvl(["o_orderstatus"]), _lvl([])],
        ignore_index=True,
    )
    out["sum_price"] = out["sum_price"].round(2)
    out["n_orders"] = out["n_orders"].astype("int64")
    return (
        out[["o_orderpriority", "o_orderstatus", "sum_price", "n_orders"]]
        .sort_values(["o_orderpriority", "o_orderstatus"])
        .reset_index(drop=True)
    )


def customer_order_counts(sf_dir: str, status: str = "O") -> ray.data.Dataset:
    """LEFT-join aggregate: every customer with their count and total
    value of status-``O`` orders — INCLUDING zero-order customers (the
    preserved-side semantics :func:`customers_no_orders` negates).
    Probe side pre-reduces to ≤1 partial row per (custkey × batch)
    inside ``map_batches``; both sides meet in ONE content-hash
    exchange; each partition left-merges vectorized.  No broadcast
    side — the shape that still works when customers outgrow memory."""

    def _part_of(keys: np.ndarray) -> np.ndarray:
        return (
            (keys.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
            >> np.uint64(56)
        ).astype(np.int32)

    def cust_part(batch: pa.Table) -> pa.Table:
        ck = batch["c_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array(_part_of(ck), pa.int32()),
                "c_custkey": pa.array(ck, pa.int64()),
                "c_name": batch["c_name"],
                "n_orders": pa.array(np.zeros(len(ck), np.int64), pa.int64()),
                "total_price": pa.array(np.zeros(len(ck)), pa.float64()),
                "probe": pa.array(np.zeros(len(ck), np.int8), pa.int8()),
            }
        )

    def order_part(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df["o_orderstatus"] == status]
        g = df.groupby("o_custkey", as_index=False).agg(
            n_orders=("o_orderkey", "size"), total_price=("o_totalprice", "sum")
        )
        ck = g["o_custkey"].to_numpy()
        return pa.table(
            {
                "part": pa.array(_part_of(ck), pa.int32()),
                "c_custkey": pa.array(ck, pa.int64()),
                "c_name": pa.array([""] * len(ck), pa.string()),
                "n_orders": pa.array(g["n_orders"].to_numpy(), pa.int64()),
                "total_price": pa.array(g["total_price"].to_numpy(), pa.float64()),
                "probe": pa.array(np.ones(len(ck), np.int8), pa.int8()),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).map_batches(cust_part, batch_format="pyarrow")
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderstatus"],
    ).map_batches(order_part, batch_format="pyarrow")

    def left_agg(g: pd.DataFrame) -> pd.DataFrame:
        keep = g[g["probe"] == 0][["c_custkey", "c_name"]]
        pr = (
            g[g["probe"] == 1]
            .groupby("c_custkey", as_index=False)
            .agg(n_orders=("n_orders", "sum"), total_price=("total_price", "sum"))
        )
        m = keep.merge(pr, on="c_custkey", how="left")
        return pd.DataFrame(
            {
                "c_custkey": m["c_custkey"].astype(np.int64),
                "c_name": m["c_name"],
                "n_orders": m["n_orders"].fillna(0).astype(np.int64),
                "total_price": m["total_price"].fillna(0.0).round(2),
            }
        )

    return (
        cust.union(orders)
        .groupby("part")
        .map_groups(left_agg, batch_format="pandas")
    )


def region_orders_semijoin(
    sf_dir: str, region: str = "ASIA", bits_per_key: int = 10
) -> ray.data.Dataset:
    """Distributed SEMI-join with a broadcast Bloom prefilter: every
    order placed by a customer in ``region`` (``o_custkey IN (SELECT
    ...)``), exact at any scale.  Three stages:

    1. **key side** — customers filtered to the region's nation keys
       (dims read on the driver: nation × region is dozens of rows);
       each batch emits a fixed-size Bloom partial (uint64 words) plus
       its keys tagged for the exchange.  Partials OR-fold on the
       driver into ONE filter (~10 bits/key — 1/6th the raw int64
       keys, broadcastable long after an exact set would OOM).
    2. **probe side** — the orders scan tests each batch against the
       broadcast filter (vectorized double-hash membership); only true
       matches + ε false positives survive to the exchange.  Bloom
       error is one-sided, so no true match is ever dropped.
    3. **exact verify** — survivors and keys meet in a 256-way hash
       exchange on custkey; each partition drops the false positives
       with a vectorized ``isin`` against its co-located key set.

    The pattern the reference's broadcast id-set loads (J2,
    RoadNetwork id↔object maps) needs at web scale: prune-broadcast
    cheaply, verify exactly co-partitioned."""
    import pyarrow.parquet as pq

    from torchtrajectory_ray.functions.bloom import (
        bloom_or,
        bloom_params,
        bloom_test,
        bloom_zero,
        bloom_add,
    )

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    rkey = set(reg[reg["r_name"] == region]["r_regionkey"])
    nkeys = set(nation[nation["n_regionkey"].isin(rkey)]["n_nationkey"])

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    # size the filter from the key-side row count (a cheap count on the
    # pruned two-column read; at scale this is parquet metadata)
    n_keys = max(1, int(cust.count()))
    m_bits, k_hashes = bloom_params(n_keys, bits_per_key)

    def key_partial(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy()[
            np.isin(batch["c_nationkey"].to_numpy(), list(nkeys))
        ]
        words = bloom_zero(m_bits)
        bloom_add(words, keys, k_hashes)
        return pa.table(
            {
                "keys": pa.array([keys.tolist()], pa.list_(pa.int64())),
                "words": pa.array(
                    [words.view(np.int64).tolist()], pa.list_(pa.int64())
                ),
            }
        )

    key_parts = cust.map_batches(
        key_partial, batch_format="pyarrow"
    ).to_pandas()  # one fixed-size row per batch
    bloom = bloom_or(
        [np.asarray(w, np.int64).view(np.uint64) for w in key_parts["words"]]
    )

    fib = np.uint64(0x9E3779B97F4A7C15)

    def part_of(keys: np.ndarray) -> np.ndarray:
        return (
            (keys.astype(np.uint64) * fib) >> np.uint64(56)
        ).astype(np.int32)

    key_rows_list = [
        np.asarray(ks, np.int64) for ks in key_parts["keys"] if len(ks)
    ]
    key_rows = (
        np.concatenate(key_rows_list) if key_rows_list else np.zeros(0, np.int64)
    )
    keys_ds = ray.data.from_arrow(
        pa.table(
            {
                "side": pa.array(np.zeros(len(key_rows), np.int8)),
                "c_custkey": pa.array(key_rows, pa.int64()),
                "o_orderkey": pa.array(
                    np.zeros(len(key_rows), np.int64), pa.int64()
                ),
                "o_totalprice": pa.array(
                    np.zeros(len(key_rows), np.float64), pa.float64()
                ),
                "part": pa.array(part_of(key_rows), pa.int32()),
            }
        )
    )

    def probe(batch: pa.Table) -> pa.Table:
        ck = batch["o_custkey"].to_numpy()
        m = bloom_test(bloom, ck, k_hashes)
        t = batch.filter(pa.array(m))
        ck = t["o_custkey"].to_numpy()
        return pa.table(
            {
                "side": pa.array(np.ones(len(ck), np.int8)),
                "c_custkey": pa.array(ck, pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "o_totalprice": pa.array(
                    np.round(t["o_totalprice"].to_numpy(), 6)
                ),
                "part": pa.array(part_of(ck), pa.int32()),
            }
        )

    probed = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"],
    ).map_batches(probe, batch_format="pyarrow")

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        keys = g[g["side"] == 0]["c_custkey"]
        hits = g[(g["side"] == 1) & g["c_custkey"].isin(set(keys))]
        return pd.DataFrame(
            {
                "o_orderkey": hits["o_orderkey"].astype(np.int64),
                "o_custkey": hits["c_custkey"].astype(np.int64),
                "o_totalprice": hits["o_totalprice"].astype(np.float64),
            }
        )

    return (
        keys_ds.union(probed)
        .groupby("part")
        .map_groups(verify, batch_format="pandas")
    )
