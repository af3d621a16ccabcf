"""Near-duplicate detection pipelines over a documents table.

Training-data-pipeline operators beyond the reference's exact-dedup
(U5, TorSaver.saveEdges visited-set): MinHash+LSH, SimHash, and n-gram
Jaccard verification.  All follow the sketch pattern: vectorized sketch
per doc inside ``map_batches``, explode to (band, bucket) rows, one
``groupby`` over the bands, candidate pairs verified exactly.

Scale notes (10^12 docs): the banding groupby is the only wide exchange
and its key cardinality grows with the corpus (bucket sizes stay small
for honest hash functions); candidate-pair verification re-reads only
the involved docs (predicate-pushdown read), which LSH keeps ≪ corpus.
A bucket-size cap guards against degenerate buckets (all-identical spam
pages) — capped buckets are reported, not silently dropped.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

MERSENNE = (1 << 61) - 1
MAX_BUCKET = 64  # pairs per bucket cap: 64*63/2 ≈ 2k pairs


def _minhash_params(num_perm: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """crc32 of each k-token shingle — stable across processes."""
    if len(tokens) < k:
        joined = [" ".join(tokens)] if tokens else []
    else:
        joined = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in joined), np.uint64, len(joined)
    )


class MinHasher:
    """Actor-pool stage: docs → (doc_id, band, band_hash) rows.

    Permutation parameters are generated once per actor in __init__
    (deterministic seed), minhash computation per doc is one vectorized
    (num_perm × n_shingles) min-reduction.
    """

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.r = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)

    def signature(self, tokens: list[str]) -> np.ndarray:
        sh = _shingle_hashes(tokens, self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        hv = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(MERSENNE)
        return hv.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, bands, bhashes = [], [], []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sig = self.signature(text.split(" "))
            for bi in range(self.bands):
                band = sig[bi * self.r : (bi + 1) * self.r]
                doc_ids.append(doc_id)
                bands.append(bi)
                bhashes.append(zlib.crc32(band.tobytes()))
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band": pa.array(bands, pa.int32()),
                "band_hash": pa.array(bhashes, pa.int64()),
            }
        )


def _bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
    """Candidate pairs within one (band, band_hash) bucket (a < b)."""
    ids = np.unique(g["doc_id"].to_numpy())
    if len(ids) < 2:
        return pd.DataFrame(columns=["doc_a", "doc_b", "capped"])
    capped = len(ids) > MAX_BUCKET
    ids = ids[:MAX_BUCKET]
    ia, ib = np.triu_indices(len(ids), k=1)
    return pd.DataFrame(
        {"doc_a": ids[ia], "doc_b": ids[ib], "capped": capped}
    )


def minhash_candidates(docs: ray.data.Dataset, **kw) -> pd.DataFrame:
    """documents Dataset → deduped candidate pair DataFrame."""
    pairs = (
        docs.map_batches(
            MinHasher, fn_constructor_kwargs=kw, batch_format="pyarrow",
            concurrency=(1, 4),
        )
        .groupby(["band", "band_hash"])
        .map_groups(_bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if pairs.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b"])
    return (
        pairs.drop_duplicates(["doc_a", "doc_b"])[["doc_a", "doc_b"]]
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def exact_jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa = set(map(int, _shingle_hashes(tokens_a, k)))
    sb = set(map(int, _shingle_hashes(tokens_b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def minhash_dedup_pairs(
    sf_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """Full MinHash-LSH near-dup pipeline: sketch → band groupby →
    candidates → exact n-gram-Jaccard verification → (doc_a, doc_b,
    jaccard) pairs ≥ threshold."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    cand = minhash_candidates(
        docs, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    if cand.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    involved = pa.array(
        sorted(set(cand["doc_a"]) | set(cand["doc_b"])), pa.int64()
    )
    # verification re-reads only the involved docs (vectorized semi-join)
    tbl = (
        docs.map_batches(
            lambda t: t.filter(pc.is_in(t["doc_id"], value_set=involved)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .set_index("doc_id")["text"]
    )
    rows = []
    for a, b in cand.itertuples(index=False):
        j = exact_jaccard(tbl[a].split(" "), tbl[b].split(" "), shingle_k)
        if j >= threshold:
            rows.append((int(a), int(b), round(j, 6)))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard"])


# --- SimHash -----------------------------------------------------------------


class SimHasher:
    """docs → (doc_id, simhash, band0..band3) — 64-bit tf-weighted simhash
    split into 4×16-bit bands for hamming-≤3 candidate search."""

    def __init__(self):
        from torchtrajectory_ray.functions.text import TermHasher

        self.hasher = TermHasher()

    def simhash(self, tokens: list[str]) -> int:
        if not tokens:
            return 0
        terms, counts = np.unique(np.asarray(tokens, dtype=object), return_counts=True)
        hs = np.fromiter((self.hasher(t) for t in terms), np.uint64, len(terms))
        bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        votes = (bits.astype(np.int64) * 2 - 1) * counts[:, None]
        return int(
            ((votes.sum(axis=0) > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum()
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "simhash": [], "band": [], "band_val": []}
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            sh = self.simhash(text.split(" "))
            for bi in range(4):
                out["doc_id"].append(doc_id)
                out["simhash"].append(np.int64(np.uint64(sh)))
                out["band"].append(bi)
                out["band_val"].append((sh >> (16 * bi)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "simhash": pa.array(out["simhash"], pa.int64()),
                "band": pa.array(out["band"], pa.int32()),
                "band_val": pa.array(out["band_val"], pa.int32()),
            }
        )


def simhash_dedup_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """SimHash near-dup: 4-band pigeonhole candidates → exact hamming
    verify → (doc_a, doc_b, hamming)."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    rows = docs.map_batches(
        SimHasher, batch_format="pyarrow", concurrency=(1, 4)
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = u["doc_id"].to_numpy()[:MAX_BUCKET]
        sh = u["simhash"].to_numpy()[:MAX_BUCKET]
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame(
            {"doc_a": ids[ia], "doc_b": ids[ib], "sh_a": sh[ia], "sh_b": sh[ib]}
        )

    cand = (
        rows.groupby(["band", "band_val"])
        .map_groups(pairs, batch_format="pandas")
        .to_pandas()
    )
    if cand.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    cand = cand.drop_duplicates(["doc_a", "doc_b"])
    x = cand["sh_a"].to_numpy().astype(np.uint64) ^ cand["sh_b"].to_numpy().astype(
        np.uint64
    )
    ham = np.fromiter((bin(v).count("1") for v in x), np.int64, len(x))
    cand = cand.assign(hamming=ham)
    out = cand[cand["hamming"] <= max_hamming][["doc_a", "doc_b", "hamming"]]
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# --- document fingerprint ----------------------------------------------------


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """doc_id, fingerprint — polynomial rolling hash of the token stream
    (order-sensitive content id; exact-dup detection that, unlike the
    sha1 of exact_dedup, is computable incrementally over a stream)."""

    MASK = (1 << 64) - 1

    def f(batch: pa.Table) -> pa.Table:
        fps = []
        for text in batch["text"].to_pylist():
            h = 1469598103934665603
            for t in text.split(" "):
                h = ((h * 1099511628211) & MASK) ^ zlib.crc32(t.encode("utf-8"))
            fps.append(h >> 1)  # keep int64-positive
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.int64())}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")
