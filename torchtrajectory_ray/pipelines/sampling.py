"""Deterministic subset selection for training corpora.

Two operators a 100-TB pipeline needs between cleaning and packing:

- :func:`stratified_sample` — per-stratum downsampling with an
  id-derived pseudo-random key, so the sample is reproducible, join-free
  (no sampling state to ship), and resumable: every task decides keep /
  drop locally from (doc_id, lang) alone.  The decorrelation hash is
  ``(doc_id * P1) % P2 % 1000`` over int64 — exactly expressible in SQL,
  which keeps the operator oracle-gated (a production variant would use
  splitmix64; the plumbing is identical).  Valid for doc_id < 2^63/P1
  (~9.2e12); guarded.
- :func:`top_per_lang` — group-wise top-k by lexical diversity
  (n_uniq / n_tokens): per-batch PARTIAL top-k per language first, so
  the all-to-all stage only ever moves k × n_langs × n_blocks candidate
  rows, never the corpus (the same partial-then-merge discipline as the
  BM25 top-k, reference EdgeInvertedIndex.java:172-175).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

_P1 = 1_000_003
_P2 = 1_000_000_007

# permille keep-rates per stratum; _DEFAULT_RATE for unlisted langs
SAMPLE_RATES = {"en": 500, "de": 250}
_DEFAULT_RATE = 100


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def sample_key(ids: np.ndarray) -> np.ndarray:
    """Permille pseudo-random key of a doc id (int64, overflow-guarded)."""
    ids = ids.astype(np.int64)
    if ids.size and int(ids.max()) > (2**63 - 1) // _P1:
        raise ValueError("doc_id too large for the SQL-exact sample hash")
    return (ids * _P1) % _P2 % 1000


def stratified_sample(sf_dir: str) -> ray.data.Dataset:
    """Kept (doc_id, lang) under per-language permille rates — a pure
    per-batch filter: no shuffle, no driver state."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        langs = batch["lang"].to_pylist()
        key = sample_key(ids)
        rates = np.fromiter(
            (SAMPLE_RATES.get(l, _DEFAULT_RATE) for l in langs), np.int64, len(langs)
        )
        return batch.filter(pa.array(key < rates))

    return _read_docs(sf_dir, ["doc_id", "lang"]).map_batches(
        f, batch_format="pyarrow"
    )


def top_per_lang(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Top-``k`` docs per language by rounded lexical diversity
    (ties broken by doc_id asc): ``lang, rank, doc_id, diversity``."""

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok = np.fromiter((t.count(" ") + 1 for t in texts), np.int64, len(texts))
        n_uniq = np.fromiter(
            (len(set(t.split(" "))) for t in texts), np.int64, len(texts)
        )
        div = np.round(n_uniq / n_tok, 6)
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "doc_id": batch["doc_id"].to_numpy().astype(np.int64),
                "diversity": div,
            }
        )
        # partial top-k per lang under the FINAL ordering (rounded
        # diversity desc, doc_id asc) — truncation can never drop a
        # global winner, whatever the tie structure
        df = df.sort_values(
            ["lang", "diversity", "doc_id"], ascending=[True, False, True]
        )
        out = df.groupby("lang", sort=False).head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    cand = (
        _read_docs(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()  # k × n_langs × n_blocks candidate rows only
    )
    cand = cand.sort_values(
        ["lang", "diversity", "doc_id"], ascending=[True, False, True]
    )
    top = cand.groupby("lang", sort=True).head(k).copy()
    top["rank"] = top.groupby("lang").cumcount() + 1
    return top[["lang", "rank", "doc_id", "diversity"]].reset_index(drop=True)


def source_mix_sample(sf_dir: str, budget_den: int = 2) -> ray.data.Dataset:
    """Source-mixture resampling (the Pile-style mixing pass): pick a
    token budget of ``total_tokens // budget_den`` and allocate it
    UNIFORMLY across sources, so over-represented sources are
    downsampled toward the target share and small sources keep
    everything (rate clamps at 1).

    Two stages, both scale-safe: a per-source token-total ``groupby``
    whose output is #sources rows (tiny — the driver computes the
    per-source keep permille from it with exact int64 arithmetic,
    ``min(1000, 1000 * budget // (n_sources * T_s))``), then one
    streaming per-batch filter on the same id-derived sample key as
    :func:`stratified_sample` — deterministic, join-free, resumable.
    Returns kept ``doc_id, source`` rows."""
    import ray.data
    from ray.data.aggregate import Sum

    def tok_partial(batch: pa.Table) -> pa.Table:
        n = np.fromiter(
            (t.count(" ") + 1 for t in batch["text"].to_pylist()),
            np.int64,
            len(batch),
        )
        return (
            pa.table({"source": batch["source"], "n": pa.array(n, pa.int64())})
            .group_by("source")
            .aggregate([("n", "sum")])
            .rename_columns(["source", "n"])
        )

    totals = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["source", "text"]
        )
        .map_batches(tok_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n", alias_name="toks"))
        .to_pandas()
    )
    total = int(totals["toks"].sum())
    ns = len(totals)
    budget = total // budget_den
    permille = {
        str(s): min(1000, (1000 * budget) // (ns * int(t)))
        for s, t in zip(totals["source"], totals["toks"])
    }

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        key = sample_key(ids)
        rates = np.fromiter(
            (permille[s] for s in batch["source"].to_pylist()),
            np.int64,
            len(batch),
        )
        return batch.filter(pa.array(key < rates))

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
    ).map_batches(keep, batch_format="pyarrow")


def shuffle_key(ids: np.ndarray, seed: int) -> list[str]:
    """Deterministic per-doc shuffle key: ``md5(f"{doc_id}:{seed}")`` hex
    — exactly expressible in SQL (DuckDB ``md5``), so the global shuffle
    order is oracle-gated.  Hashing is per-row Python, but an export
    shuffle is IO/sort-bound: the hash is ~1 µs/row against a full-text
    read + range-partition sort of the same rows."""
    import hashlib

    return [
        hashlib.md5(f"{int(d)}:{seed}".encode()).hexdigest() for d in ids
    ]


def global_shuffle_ds(
    sf_dir: str, seed: int = 42, columns: list[str] | None = None
) -> ray.data.Dataset:
    """Seeded DETERMINISTIC global shuffle of the corpus — the export
    step before training consumes the data.  ``random_shuffle()`` is
    neither seeded across cluster sizes nor resumable; instead each
    batch derives a reproducible md5 key from (doc_id, seed) and ONE
    range-partition sort orders the corpus by it (the one unavoidable
    all-to-all — a global shuffle IS an all-to-all).  The order is a
    pure function of (doc ids, seed): independent of parallelism,
    re-runnable, and verifiable row-for-row in SQL.  Write the result
    with ``write_parquet`` — block order is the shuffle order."""
    cols = ["doc_id"] + [c for c in (columns or []) if c != "doc_id"]

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        return batch.append_column(
            "shuffle_key", pa.array(shuffle_key(ids, seed), pa.string())
        )

    return (
        _read_docs(sf_dir, cols)
        .map_batches(add_key, batch_format="pyarrow")
        .sort("shuffle_key")
    )


def shuffled_ids(sf_dir: str, seed: int = 42) -> pd.DataFrame:
    """(rank, doc_id, shuffle_key) of the seeded global shuffle — the
    driver-gate projection (the full ordering; tiny at gate scale, the
    bulk path is :func:`global_shuffle_ds` + ``write_parquet``)."""
    df = global_shuffle_ds(sf_dir, seed).to_pandas()
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    return df[["rank", "doc_id", "shuffle_key"]]


def shuffle_shard_of(keys: list[str], n_shards: int) -> np.ndarray:
    """Shard id from the shuffle key's first 4 hex digits:
    ``int(key[:4], 16) * n_shards >> 16`` — monotone in the key, so
    shard boundaries respect the global shuffle order, and exactly
    expressible in SQL (``CAST(concat('0x', substr(key, 1, 4)) AS INT)``)."""
    if not 1 <= n_shards <= 65536:
        raise ValueError("n_shards must be in [1, 65536]")
    pref = np.fromiter((int(k[:4], 16) for k in keys), np.int64, len(keys))
    return (pref * n_shards) >> 16


def shuffle_shards(sf_dir: str, seed: int = 42, n_shards: int = 16) -> pd.DataFrame:
    """(doc_id, shard) of the sharded export — the driver-gate
    projection of :func:`export_shuffled`'s placement."""

    def f(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        sh = shuffle_shard_of(shuffle_key(ids, seed), n_shards)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "shard": pa.array(sh, pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir, ["doc_id"])
        .map_batches(f, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def export_shuffled(
    sf_dir: str,
    out_dir: str,
    seed: int = 42,
    n_shards: int = 16,
    columns: list[str] | None = None,
) -> dict:
    """RESUMABLE sharded export of the seeded global shuffle: shard i
    holds the i-th key range of the shuffle order (global order =
    shard_id asc, shuffle_key asc within the shard), one atomic parquet
    per shard + a manifest.  A re-run skips finished shards (per-shard
    checkpoint files), so a failed export resumes instead of restarting
    — the resumable-output rule for training exports.

    Shape: ONE pass assigns (shuffle_key, shard) per batch, a
    ``groupby("shard").map_groups`` shuffle co-locates each shard's rows
    (sorted within the group), and every group writes its own file —
    no global sort barrier, no driver materialization."""
    import json

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    cols = ["doc_id"] + [c for c in (columns or ["text"]) if c != "doc_id"]

    done = {
        s
        for s in range(n_shards)
        if os.path.exists(os.path.join(out_dir, f"shard-{s:05d}.parquet"))
        and os.path.exists(os.path.join(out_dir, f"shard-{s:05d}.parquet.ok"))
    }

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        keys = shuffle_key(ids, seed)
        shard = shuffle_shard_of(keys, n_shards)
        batch = batch.append_column(
            "shuffle_key", pa.array(keys, pa.string())
        )
        return batch.append_column("shard", pa.array(shard, pa.int64()))

    def write_group(g: pd.DataFrame) -> pd.DataFrame:
        s = int(g["shard"].iloc[0])
        if s in done:  # finished in a previous run
            return pd.DataFrame({"shard": [s], "rows": [-1]})
        g = g.sort_values("shuffle_key").drop(columns=["shard"])
        path = os.path.join(out_dir, f"shard-{s:05d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(g, preserve_index=False), path + ".tmp"
        )
        os.replace(path + ".tmp", path)
        with open(path + ".ok.tmp", "w") as f:
            f.write("ok")
        os.replace(path + ".ok.tmp", path + ".ok")
        return pd.DataFrame({"shard": [s], "rows": [len(g)]})

    res = (
        _read_docs(sf_dir, cols)
        .map_batches(add_key, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()  # n_shards rows
    )
    # a shard whose key range matched zero rows never reaches the
    # groupby — write its (empty, schema-correct) parquet + .ok anyway
    # so consumers can tell "expected empty" from "missing/failed"
    present = set(int(s) for s in res["shard"].tolist()) | done
    missing = [s for s in range(n_shards) if s not in present]
    if missing:
        src_schema = pq.read_schema(f"{sf_dir}/documents.parquet")
        fields = [src_schema.field(c) for c in cols]
        fields.append(pa.field("shuffle_key", pa.string()))
        empty = pa.table(
            {f.name: pa.array([], f.type) for f in fields}
        )
        for s in missing:
            path = os.path.join(out_dir, f"shard-{s:05d}.parquet")
            pq.write_table(empty, path + ".tmp")
            os.replace(path + ".tmp", path)
            with open(path + ".ok.tmp", "w") as f:
                f.write("ok")
            os.replace(path + ".ok.tmp", path + ".ok")
    # empty_shards must survive RESUMED runs too: a previously-written
    # empty shard sits in `done` and never reaches the groupby, so
    # re-derive the set from the on-disk row counts (metadata-only reads)
    empty_shards = sorted(
        set(missing)
        | {
            s
            for s in done
            if pq.read_metadata(
                os.path.join(out_dir, f"shard-{s:05d}.parquet")
            ).num_rows
            == 0
        }
    )
    manifest = {
        "seed": seed,
        "n_shards": n_shards,
        "columns": cols,
        "shards": [f"shard-{s:05d}.parquet" for s in range(n_shards)],
        "empty_shards": empty_shards,
        "skipped": int((res["rows"] < 0).sum()),
    }
    with open(manifest_path + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(manifest_path + ".tmp", manifest_path)
    return manifest


def length_weighted_sample(
    sf_dir: str, target_chars: float = 2000.0, salt: str = "ws"
) -> ray.data.Dataset:
    """Weighted Bernoulli sampling with DETERMINISTIC hash coins: keep a
    document with probability ``min(1, n_chars / target_chars)`` — the
    continuous-weight generalization of :func:`stratified_sample`'s
    per-stratum rates (a length-balanced sample up-weights long
    documents the way token-budget curation does).  The coin is the
    first 13 hex digits of ``md5(f"{doc_id}:{salt}")`` scaled to
    [0, 1) — 52 bits, exactly representable in a double on BOTH
    engines, so the SQL oracle replays every coin bit-for-bit.  No
    shuffle, no driver state: one pruned read + one vectorized filter
    per batch; retries/parallelism can't change membership."""
    import hashlib

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy().astype(np.int64)
        coins = np.array(
            [
                int(hashlib.md5(f"{int(d)}:{salt}".encode()).hexdigest()[:13], 16)
                for d in ids
            ],
            np.float64,
        ) / float(1 << 52)
        w = np.minimum(1.0, batch["n_chars"].to_numpy() / target_chars)
        return batch.filter(pa.array(coins < w))

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).map_batches(pick, batch_format="pyarrow")
