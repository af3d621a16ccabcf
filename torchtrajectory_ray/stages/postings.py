"""Posting-list construction stages: tokenize+combine ``map_batches`` and
the (term_id, salt)-keyed shuffle with per-segment atomic writes.

Parity target: the reference's index-build aggregate — for each edge
occurrence append (trajId, position) into a per-edge in-heap map, then
sort + delta/FastPFOR-compress each list (/root/reference/src/main/java/au/
edu/rmit/bdm/Torch/base/invertedIndex/EdgeInvertedIndex.java:41-49,
InvertedIndex.java:89-136).  Here the "HashMap" is a real distributed
shuffle:

  docs → map_batches(TokenizeCombine)      # flatten + PRE-AGGREGATE per
                                           # batch: per-(term, salt)
                                           # compressed partial runs, so
                                           # the shuffle moves varint
                                           # blobs, not raw posting rows
       → groupby("segment")                # the one all-to-all exchange;
                                           # segment = term_shard × salt
       → map_groups(SegmentWriter)         # merge partials per (term,
                                           # salt), block-max metadata,
                                           # atomic parquet + manifest row

Salting is by doc_id high bits (disjoint ordered ranges), so a head
term's postings split into bounded runs across segments and runs merge
by concatenation — the skew handling the reference's single HashMap
never needed (SURVEY.md §4 skew row).
"""

from __future__ import annotations

import itertools
import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.functions.bm25 import tf_norm
from torchtrajectory_ray.functions.codec import (
    delta_decode,
    delta_encode,
    varint_decode,
    varint_encode,
)
from torchtrajectory_ray.functions.text import TermHasher, tokenize

PARTIAL_COLS = [
    "term",
    "term_id",
    "salt",
    "segment",
    "df",
    "doc_ids_blob",
    "tfs_blob",
    "doclens_blob",
    "pos_blob",
]


def salt_shift(max_doc_id: int, num_salts: int) -> int:
    """Right-shift such that doc_id >> shift lands in [0, num_salts)."""
    span = max(int(max_doc_id), 0) + 1
    shift = 0
    while (span - 1) >> shift >= num_salts:
        shift += 1
    return shift


class TokenizeCombine:
    """Actor-pool stage: docs batch → compressed per-(term, salt) partial
    posting runs.

    The flatten + within-batch combine is fully vectorized (factorize +
    lexsort + run-length boundaries); the only Python-level loops are
    over unique terms (vocabulary-sized, memoized hashing) and over runs
    (for blob encoding, each encode itself vectorized).  This is the
    analog of the reference's per-trajectory ``index()`` append loop
    (EdgeInvertedIndex.java:41-49) done batch-at-a-time.
    """

    def __init__(self, cfg: IndexConfig, shift: int):
        self.cfg = cfg
        self.shift = shift
        self.hasher = TermHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
        texts = batch["text"].to_pylist()
        tok_lists = [tokenize(t) for t in texts]
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
        total = int(counts.sum())
        if total == 0:
            return pa.table({c: [] for c in PARTIAL_COLS}).cast(_partial_schema())

        flat_terms = np.fromiter(
            itertools.chain.from_iterable(tok_lists), object, total
        )
        doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)

        codes, uniq_terms = pd.factorize(flat_terms, sort=False)
        n_uniq = len(uniq_terms)

        # per-(doc, term) tf + first position
        key = doc_idx * n_uniq + codes
        order = np.argsort(key, kind="stable")
        skey = key[order]
        heads = np.concatenate(([0], np.flatnonzero(skey[1:] != skey[:-1]) + 1))
        tf = np.diff(np.concatenate((heads, [total]))).astype(np.int64)
        first_pos = pos_in_doc[order][heads]
        e_doc_idx = doc_idx[order][heads]
        e_code = codes[order][heads]
        e_doc_id = doc_ids[e_doc_idx]
        e_doclen = counts[e_doc_idx]

        term_ids = np.fromiter(
            (self.hasher(t) for t in uniq_terms), np.int64, n_uniq
        )
        e_term_id = term_ids[e_code]
        e_salt = np.minimum(e_doc_id >> self.shift, cfg.num_salts - 1).astype(
            np.int64
        )

        # group entries into (term, salt) runs sorted by doc_id
        run_key = e_code.astype(np.int64) * cfg.num_salts + e_salt
        run_order = np.lexsort((e_doc_id, run_key))
        rk = run_key[run_order]
        run_heads = np.concatenate(([0], np.flatnonzero(rk[1:] != rk[:-1]) + 1))
        run_ends = np.concatenate((run_heads[1:], [len(rk)]))

        d_ids = e_doc_id[run_order]
        d_tf = tf[run_order]
        d_dl = e_doclen[run_order]
        d_pos = first_pos[run_order]

        out: dict[str, list] = {c: [] for c in PARTIAL_COLS}
        shards = (term_ids % cfg.num_term_shards).astype(np.int64)
        for h, e in zip(run_heads, run_ends):
            code = int(rk[h] // cfg.num_salts)
            salt = int(rk[h] % cfg.num_salts)
            tid = int(term_ids[code])
            out["term"].append(str(uniq_terms[code]))
            out["term_id"].append(tid)
            out["salt"].append(salt)
            out["segment"].append(int(shards[code]) * cfg.num_salts + salt)
            out["df"].append(int(e - h))
            out["doc_ids_blob"].append(delta_encode(d_ids[h:e]))
            out["tfs_blob"].append(varint_encode(d_tf[h:e]))
            out["doclens_blob"].append(varint_encode(d_dl[h:e]))
            out["pos_blob"].append(
                varint_encode(d_pos[h:e]) if cfg.store_positions else b""
            )
        return pa.table(
            {
                "term": pa.array(out["term"], pa.string()),
                "term_id": pa.array(out["term_id"], pa.int64()),
                "salt": pa.array(out["salt"], pa.int32()),
                "segment": pa.array(out["segment"], pa.int32()),
                "df": pa.array(out["df"], pa.int64()),
                "doc_ids_blob": pa.array(out["doc_ids_blob"], pa.binary()),
                "tfs_blob": pa.array(out["tfs_blob"], pa.binary()),
                "doclens_blob": pa.array(out["doclens_blob"], pa.binary()),
                "pos_blob": pa.array(out["pos_blob"], pa.binary()),
            }
        )


def _partial_schema() -> pa.Schema:
    return pa.schema(
        [
            ("term", pa.string()),
            ("term_id", pa.int64()),
            ("salt", pa.int32()),
            ("segment", pa.int32()),
            ("df", pa.int64()),
            ("doc_ids_blob", pa.binary()),
            ("tfs_blob", pa.binary()),
            ("doclens_blob", pa.binary()),
            ("pos_blob", pa.binary()),
        ]
    )


SEGMENT_COLS = [
    "term_id",
    "term",
    "salt",
    "df",
    "max_tfn",
    "doc_ids_blob",
    "tfs_blob",
    "doclens_blob",
    "pos_blob",
    "blk_last",
    "blk_max_tfn",
]


class SegmentWriter:
    """``map_groups`` callable over the segment-keyed shuffle: merges the
    partial runs of each (term_id, salt) (decode → concat → sort by
    doc_id → re-encode; (term, doc) pairs are globally unique because a
    doc lives in exactly one input batch), computes block-max metadata,
    and writes one segment parquet atomically (+ sidecar meta), returning
    a manifest row.

    The posting sort mirrors the reference's sort-before-compress
    precondition (InvertedIndex.java:63-67,102-105); block-max values are
    per-block maxima of the BM25 doc-side factor, the analog of the
    per-term edge-length upper bound (EdgeInvertedIndex.java:121).
    """

    def __init__(self, out_dir: str, cfg: IndexConfig, avgdl: float):
        self.out_dir = out_dir
        self.cfg = cfg
        self.avgdl = avgdl

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        seg = int(group["segment"].iloc[0])
        path = os.path.join(self.out_dir, f"seg-{seg:05d}.parquet")
        meta_path = path + ".meta.json"
        if os.path.exists(path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            meta["skipped"] = True
            return pd.DataFrame([meta])

        t0 = time.monotonic()
        cfg, B = self.cfg, self.cfg.block_size
        rows: dict[str, list] = {c: [] for c in SEGMENT_COLS}
        n_postings = 0
        group = group.sort_values(["term_id", "salt"], kind="mergesort")
        for (tid, salt), runs in group.groupby(["term_id", "salt"], sort=True):
            n = int(runs["df"].sum())
            if len(runs) == 1:
                r = runs.iloc[0]
                ids = delta_decode(r["doc_ids_blob"], int(r["df"]))
                tfs = varint_decode(r["tfs_blob"], int(r["df"]))
                dls = varint_decode(r["doclens_blob"], int(r["df"]))
                poss = (
                    varint_decode(r["pos_blob"], int(r["df"]))
                    if cfg.store_positions
                    else None
                )
            else:
                ids = np.concatenate(
                    [delta_decode(b) for b in runs["doc_ids_blob"]]
                )
                tfs = np.concatenate([varint_decode(b) for b in runs["tfs_blob"]])
                dls = np.concatenate(
                    [varint_decode(b) for b in runs["doclens_blob"]]
                )
                poss = (
                    np.concatenate([varint_decode(b) for b in runs["pos_blob"]])
                    if cfg.store_positions
                    else None
                )
                o = np.argsort(ids, kind="stable")
                ids, tfs, dls = ids[o], tfs[o], dls[o]
                if poss is not None:
                    poss = poss[o]

            tfn = tf_norm(tfs, dls, self.avgdl, cfg.bm25.k1, cfg.bm25.b)
            nblk = (n + B - 1) // B
            blk_last = ids[np.minimum(np.arange(1, nblk + 1) * B - 1, n - 1)]
            blk_max = np.fromiter(
                (tfn[i * B : (i + 1) * B].max() for i in range(nblk)),
                np.float64,
                nblk,
            )
            rows["term_id"].append(int(tid))
            rows["term"].append(str(runs["term"].iloc[0]))
            rows["salt"].append(int(salt))
            rows["df"].append(n)
            rows["max_tfn"].append(float(tfn.max()))
            rows["doc_ids_blob"].append(delta_encode(ids))
            rows["tfs_blob"].append(varint_encode(tfs))
            rows["doclens_blob"].append(varint_encode(dls))
            rows["pos_blob"].append(
                varint_encode(poss) if poss is not None else b""
            )
            rows["blk_last"].append(blk_last.tolist())
            rows["blk_max_tfn"].append(blk_max.tolist())
            n_postings += n

        tbl = pa.table(
            {
                "term_id": pa.array(rows["term_id"], pa.int64()),
                "term": pa.array(rows["term"], pa.string()),
                "salt": pa.array(rows["salt"], pa.int32()),
                "df": pa.array(rows["df"], pa.int64()),
                "max_tfn": pa.array(rows["max_tfn"], pa.float64()),
                "doc_ids_blob": pa.array(rows["doc_ids_blob"], pa.binary()),
                "tfs_blob": pa.array(rows["tfs_blob"], pa.binary()),
                "doclens_blob": pa.array(rows["doclens_blob"], pa.binary()),
                "pos_blob": pa.array(rows["pos_blob"], pa.binary()),
                "blk_last": pa.array(rows["blk_last"], pa.list_(pa.int64())),
                "blk_max_tfn": pa.array(
                    rows["blk_max_tfn"], pa.list_(pa.float64())
                ),
            }
        )
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        meta = {
            "segment": seg,
            "path": path,
            "n_terms": int(group["term_id"].nunique()),
            "n_runs": tbl.num_rows,
            "n_postings": n_postings,
            "bytes": os.path.getsize(path),
            "wall_s": round(time.monotonic() - t0, 4),
            "skipped": False,
        }
        with open(meta_path + ".tmp", "w") as f:
            json.dump(meta, f)
        os.replace(meta_path + ".tmp", meta_path)
        return pd.DataFrame([meta])
