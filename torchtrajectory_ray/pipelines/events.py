"""Windowed aggregates over the ``events`` stream table.

Ray Data is a batch engine — windows are expressed as per-batch partial
aggregation keyed by (key, window bucket) followed by a small groupby
over the partials (the streaming-shaped-workload pattern; analog of the
reference's sliding-window index recompute, clustering/Streaming/
Streaming.java:25-46, recast as tumbling event-time buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

HOUR_US = 3_600_000_000


def tumbling_hour_agg(sf_dir: str) -> ray.data.Dataset:
    """event_type, window_start_us, n_events, sum_value — 1-hour tumbling
    windows by event time.  Partial-aggregates inside map_batches so the
    shuffle moves one row per (type, window) per batch, not per event."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy()
        win = (ts // HOUR_US) * HOUR_US
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"].to_pylist(),
                "window_start_us": win,
                "value": batch["value"].to_numpy(),
            }
        )
        g = df.groupby(["event_type", "window_start_us"], as_index=False).agg(
            n_events=("value", "size"), sum_value=("value", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        ray.data.read_parquet(
            f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
        )
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["event_type", "window_start_us"])
        .aggregate(
            Sum("n_events", alias_name="n_events"),
            Sum("sum_value", alias_name="sum_value"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        return batch.set_column(
            batch.schema.get_field_index("sum_value"),
            "sum_value",
            pa.array(np.round(batch["sum_value"].to_numpy(), 6)),
        )

    return out.map_batches(finish, batch_format="pyarrow")
