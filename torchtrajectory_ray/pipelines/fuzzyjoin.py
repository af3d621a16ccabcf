"""Fuzzy (edit-distance ≤ 1) self-join over a dimension-table string
column — the distributed flavor of the engine's per-query fuzzy-term
probe (``functions/fuzzy.edit1_mask``; reference analog: the query-time
street-name fuzzy lookup, torch-clus/imported/Search.java findByName
path, recast as an offline all-pairs join).

Design (FastSS / deletion-neighborhood, Bocek et al. 2007, public):
two strings at Levenshtein distance ≤ 1 ALWAYS share a deletion-
neighborhood key — the string itself (distance 0 and the shorter side
of an insert/delete) or a single-deletion variant (substitution pairs
share ``del_i``; the longer side of an insert/delete has some ``del_i``
equal to the shorter string).  So: emit one 64-bit Karp-Rabin hash per
variant per row (vectorized — no variant STRINGS are ever built, the
deletion hash is assembled from prefix/suffix polynomial cumsums),
hash-exchange on the key, expand candidate pairs inside each bucket,
dedupe across buckets on a pair-hash exchange, and verify with an exact
vectorized pairwise edit-distance-≤-1 kernel.  Hash collisions can only
ADD candidates (verification is exact); losing a true pair would need a
64-bit collision to NOT happen, i.e. recall is structural.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_P = np.uint64(1099511628211)  # FNV-1a prime; uint64 arithmetic wraps mod 2^64
_FIB = np.uint64(0x9E3779B97F4A7C15)
MAX_BUCKET = 4096  # fail-loud bound on one variant-key's bucket


def _pad_codes(names: np.ndarray, width: int) -> np.ndarray:
    """(n, width) uint64 code-point matrix (zero-padded)."""
    out = np.zeros((len(names), width), np.uint64)
    for i, s in enumerate(names):  # dimension-table rows; width ~ name len
        cs = np.frombuffer(s.encode("utf-32-le"), np.uint32)
        out[i, : len(cs)] = cs.astype(np.uint64)
    return out


def _deletion_hashes(codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """For an (n, L) equal-length code matrix: (full-string hash (n,),
    deletion-variant hashes (n, L)) under the polynomial rolling hash
    h(s) = Σ s[j]·P^(len-1-j) mod 2^64.  del_i's hash is assembled from
    the prefix poly up to i and the weight-aligned suffix poly after i —
    identical to hashing the materialized L-1-length variant, without
    materializing it."""
    n, L = codes.shape
    # uint64 wrap IS the mod-2^64 hash arithmetic; silence numpy's
    # scalar-overflow warning for the power table only
    with np.errstate(over="ignore"):
        pows = np.empty(L + 1, np.uint64)
        pows[0] = np.uint64(1)
        for k in range(1, L + 1):
            pows[k] = pows[k - 1] * _P
    # full hash: Σ c_j · P^(L-1-j)
    full = (codes * pows[L - 1 :: -1][None, :]).sum(axis=1, dtype=np.uint64)
    if L == 1:
        return full, np.zeros((n, 1), np.uint64)  # del → empty string
    # pre[i] = poly hash of c[:i] (length-i prefix): Horner cumulation
    pre = np.zeros((n, L), np.uint64)
    for i in range(1, L):
        pre[:, i] = pre[:, i - 1] * _P + codes[:, i - 1]
    # T[k] = Σ_{j≥k} c_j · P^(L-1-j)  (suffix poly, weights aligned to
    # the DELETED string's positions: del_i keeps c_{i+1..} at ranks
    # i..L-2 of an (L-1)-length string ⇒ weight P^(L-2-(j-1)) = P^(L-1-j))
    w = pows[: L][::-1].copy()  # P^(L-1-j) for j = 0..L-1
    T = np.zeros((n, L + 1), np.uint64)
    T[:, :L] = np.cumsum((codes * w[None, :])[:, ::-1], axis=1, dtype=np.uint64)[
        :, ::-1
    ]
    # del_i = pre[i] · P^(L-1-i) + T[i+1]
    dels = pre * pows[L - 1 :: -1][None, :L] + T[:, 1:]
    return full, dels


def _variant_key_rows(batch: pa.Table, name_col: str, id_col: str) -> pa.Table:
    """One row per (deletion-neighborhood key, row): key64, id, name."""
    names = np.asarray(batch[name_col].to_pylist(), dtype=object)
    ids = batch[id_col].to_numpy().astype(np.int64)
    lens = np.fromiter((len(s) for s in names), np.int64, len(names))
    keys, out_ids, out_names = [], [], []
    for L in np.unique(lens):
        m = lens == L
        sub_names, sub_ids = names[m], ids[m]
        if L == 0:
            keys.append(np.zeros(len(sub_ids), np.uint64))
            out_ids.append(sub_ids)
            out_names.append(sub_names)
            continue
        codes = _pad_codes(sub_names, int(L))
        full, dels = _deletion_hashes(codes)
        # the string itself + each deletion variant
        keys.append(full)
        out_ids.append(sub_ids)
        out_names.append(sub_names)
        keys.append(dels.ravel())
        out_ids.append(np.repeat(sub_ids, int(L)))
        out_names.append(np.repeat(sub_names, int(L)))
    k = np.concatenate(keys) if keys else np.zeros(0, np.uint64)
    return pa.table(
        {
            "key64": pa.array(k.view(np.int64), pa.int64()),
            "rid": pa.array(
                np.concatenate(out_ids) if out_ids else np.zeros(0, np.int64),
                pa.int64(),
            ),
            "name": pa.array(
                np.concatenate(out_names) if out_names else [], pa.string()
            ),
            "part": pa.array(
                ((k * _FIB) >> np.uint64(56)).astype(np.int32), pa.int32()
            ),
        }
    )


def _bucket_pairs(tbl: pa.Table) -> pd.DataFrame:
    """One key-partition → candidate pairs: lexsort by key, run-length
    bucket boundaries, vectorized (ia < ib) expansion, local dedupe."""
    k = tbl["key64"].to_numpy().astype(np.int64)
    rid = tbl["rid"].to_numpy().astype(np.int64)
    names = np.asarray(tbl["name"].to_pylist(), dtype=object)
    order = np.lexsort((rid, k))
    k, rid, names = k[order], rid[order], names[order]
    heads = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
    ends = np.concatenate((heads[1:], [len(k)]))
    pa_l, pb_l, na_l, nb_l = [], [], [], []
    for h, e in zip(heads, ends):
        n = e - h
        if n < 2:
            continue
        if n > MAX_BUCKET:  # fail loud, never silently drop recall
            raise RuntimeError(
                f"fuzzy-join bucket exceeds MAX_BUCKET ({n} > {MAX_BUCKET}); "
                "raise the bound or pre-split the key"
            )
        ia, ib = np.triu_indices(n, k=1)
        ga, gb = rid[h:e][ia], rid[h:e][ib]
        keep = ga != gb  # same row can appear twice in one bucket
        pa_l.append(np.where(ga[keep] < gb[keep], ga[keep], gb[keep]))
        pb_l.append(np.where(ga[keep] < gb[keep], gb[keep], ga[keep]))
        na_l.append(np.where(ga[keep] < gb[keep], names[h:e][ia][keep], names[h:e][ib][keep]))
        nb_l.append(np.where(ga[keep] < gb[keep], names[h:e][ib][keep], names[h:e][ia][keep]))
    if not pa_l:
        return pd.DataFrame(
            {
                "ka": np.array([], np.int64),
                "kb": np.array([], np.int64),
                "na": np.array([], object),
                "nb": np.array([], object),
            }
        )
    ka = np.concatenate(pa_l)
    kb = np.concatenate(pb_l)
    na = np.concatenate(na_l)
    nb = np.concatenate(nb_l)
    # local dedupe (the same pair recurs across this partition's buckets)
    # — EXACT: lexsort on the (ka, kb) pair itself, keep run heads.  A
    # hashed-key np.unique here could collide two DIFFERENT pairs and
    # silently drop one (recall loss); sorting the actual pair can't.
    order = np.lexsort((kb, ka))
    ka, kb, na, nb = ka[order], kb[order], na[order], nb[order]
    keep = np.ones(len(ka), bool)
    keep[1:] = (ka[1:] != ka[:-1]) | (kb[1:] != kb[:-1])
    return pd.DataFrame(
        {"ka": ka[keep], "kb": kb[keep], "na": na[keep], "nb": nb[keep]}
    )


def _add_pair_part(df: pd.DataFrame) -> pd.DataFrame:
    h = (
        df["ka"].to_numpy().astype(np.uint64) * _FIB
        + df["kb"].to_numpy().astype(np.uint64)
    ) * _FIB
    df = df.copy()
    df["pp"] = (h >> np.uint64(56)).astype(np.int32)
    return df


def edit1_pairs_mask(na: np.ndarray, nb: np.ndarray) -> np.ndarray:
    """Exact vectorized pairwise Levenshtein-≤-1 over aligned string
    arrays, grouped by (len_a, len_b): equal lengths compare code
    mismatch counts; off-by-one lengths run the shifted-suffix check
    (prefix matches to the first mismatch, remainder matches shifted by
    one).  |len diff| ≥ 2 is distance ≥ 2."""
    la = np.fromiter((len(s) for s in na), np.int64, len(na))
    lb = np.fromiter((len(s) for s in nb), np.int64, len(nb))
    out = np.zeros(len(na), bool)
    for (qa, qb) in set(zip(la.tolist(), lb.tolist())):
        m = (la == qa) & (lb == qb)
        if abs(qa - qb) >= 2:
            continue
        if qa == qb:
            if qa == 0:
                out[m] = True
                continue
            A = _pad_codes(na[m], qa)
            B = _pad_codes(nb[m], qa)
            out[m] = (A != B).sum(axis=1) <= 1
        else:
            X, Y, Lx = (na[m], nb[m], qa) if qa > qb else (nb[m], na[m], qb)
            Ls = Lx - 1
            C = _pad_codes(X, Lx)
            D = _pad_codes(Y, Ls) if Ls else np.zeros((m.sum(), 0), np.uint64)
            if Ls == 0:
                out[m] = True  # 1-char vs empty: one deletion
                continue
            eq = C[:, :Ls] == D
            p = np.where(eq.all(axis=1), Ls, eq.argmin(axis=1))
            shifted = C[:, 1:] == D  # X with position j+1 matched to Y's j
            okf = np.ones((m.sum(), Ls + 1), bool)
            okf[:, :Ls] = np.flip(
                np.cumprod(np.flip(shifted, axis=1), axis=1), axis=1
            ).astype(bool)
            out[m] = okf[np.arange(m.sum()), p]
    return out


def _verify_group(g: pd.DataFrame) -> pd.DataFrame:
    if g.empty:
        return pd.DataFrame(
            {"custkey_a": np.array([], np.int64), "custkey_b": np.array([], np.int64)}
        )
    g = g.drop_duplicates(["ka", "kb"])
    na = np.asarray(g["na"].to_numpy(), dtype=object)
    nb = np.asarray(g["nb"].to_numpy(), dtype=object)
    ok = edit1_pairs_mask(na, nb)
    return pd.DataFrame(
        {
            "custkey_a": g["ka"].to_numpy()[ok].astype(np.int64),
            "custkey_b": g["kb"].to_numpy()[ok].astype(np.int64),
        }
    )


def fuzzy_name_pairs(
    sf_dir: str,
    *,
    table: str = "customer",
    name_col: str = "c_name",
    id_col: str = "c_custkey",
) -> ray.data.Dataset:
    """All (id_a < id_b) pairs whose names are within Levenshtein
    distance 1 — deletion-neighborhood candidates, pair-hash exchange
    dedupe, exact vectorized verification."""
    import functools

    return (
        ray.data.read_parquet(
            f"{sf_dir}/{table}.parquet", columns=[id_col, name_col]
        )
        .map_batches(
            functools.partial(
                _variant_key_rows, name_col=name_col, id_col=id_col
            ),
            batch_format="pyarrow",
        )
        .groupby("part")
        .map_groups(_bucket_pairs, batch_format="pyarrow")
        .map_batches(_add_pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(_verify_group, batch_format="pandas")
    )
