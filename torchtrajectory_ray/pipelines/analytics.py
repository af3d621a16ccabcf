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
