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

# all-pairs expansion cap: buckets up to this size emit the full pair
# set; LARGER (degenerate) buckets fall back to star expansion — every
# member pairs with the bucket's min doc_id — so no member is silently
# unpaired (union-find connectivity is preserved at O(n) pairs) and the
# pair rows carry capped=True
MAX_BUCKET = 64


def _minhash_params(num_perm: int, seed: int = 42):
    """Per-permutation (a, b) for the odd-affine family
    h_i(x) = (a_i·x + b_i) mod 2^64 with a_i ODD.

    An odd multiplier makes the map a BIJECTION of the 64-bit space
    (multiply-shift lineage, Dietzfelbinger et al.), so the uint64
    wrap-around IS the hash definition — the intended family, not a
    silent truncation of a prime-field map — and each permutation costs
    one multiply + one add per shingle (the earlier exact Mersenne-61
    limb arithmetic was ~4× the memory-bandwidth cost of the whole
    sketch for no recall benefit; both families are 2-universal-grade
    approximations of min-wise independence)."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 1 << 63, size=num_perm, dtype=np.uint64) * np.uint64(
        2
    ) + np.uint64(1)
    b = rng.integers(0, 1 << 64, size=num_perm, dtype=np.uint64)
    return a, b


def _shingle_strings(tokens: list[str], k: int) -> list[str]:
    """The k-token shingles of a doc (space-joined, order preserved);
    a doc shorter than k yields its whole text as the one shingle."""
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def _shingle_hashes(tokens: list[str], k: int) -> np.ndarray:
    """crc32 of each k-token shingle — stable across processes."""
    joined = _shingle_strings(tokens, k)
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in joined), np.uint64, len(joined)
    )


_POLY1 = np.uint64(1_000_003)
_POLY2 = np.uint64(998_244_353)


class MinHasher:
    """Actor-pool stage: docs batch → (doc_id, band, band_hash) rows,
    fully vectorized across the batch.

    Once per actor (__init__): permutation parameters + a memoized
    token→hash cache.  Per batch: ONE factorize over all tokens, one
    polynomial pass for every k-shingle, one (num_perm × n_shingles)
    permutation matrix (chunked to bound memory), and per-doc signatures
    via ``np.minimum.reduceat`` — no per-doc Python math."""

    def __init__(self, num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
        assert num_perm % bands == 0
        self.num_perm, self.bands, self.k = num_perm, bands, shingle_k
        self.r = num_perm // bands
        self.a, self.b = _minhash_params(num_perm)
        self._token_cache: dict[str, int] = {}

    def _token_hashes(self, uniq) -> np.ndarray:
        cache = self._token_cache
        out = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            h = cache.get(t)
            if h is None:
                h = zlib.crc32(t.encode("utf-8"))
                cache[t] = h
            out[i] = h
        return out

    def signatures(self, tok_lists: list[list[str]]) -> np.ndarray:
        """List of token lists → (n_docs × num_perm) uint64 signatures."""
        import itertools

        import pandas as pd

        n_docs = len(tok_lists)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n_docs)
        total = int(counts.sum())
        sigs = np.zeros((n_docs, self.num_perm), dtype=np.uint64)
        if total == 0:
            return sigs
        flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
        codes, uniq = pd.factorize(flat, sort=False)
        th = self._token_hashes(list(uniq))[codes]  # uint64 per token

        k = self.k
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        # k-shingle polynomial hash over token hashes, one pass;
        # cross-doc windows masked out via per-doc shingle counts
        nsh = np.maximum(counts - k + 1, 0)
        if int(nsh.sum()):
            win = np.zeros(total - k + 1 if total >= k else 0, dtype=np.uint64)
            for j in range(k):
                win = win * _POLY1 + th[j : total - k + 1 + j]
            from torchtrajectory_ray.functions.codec import concat_aranges

            keep_idx = (
                np.repeat(starts[nsh > 0], nsh[nsh > 0])
                + concat_aranges(nsh[nsh > 0])
            )
            sh = win[keep_idx]  # full 64-bit shingle value
            doc_of = np.repeat(np.flatnonzero(nsh > 0), nsh[nsh > 0])
            sh_starts = np.concatenate(([0], np.cumsum(nsh[nsh > 0])[:-1]))
            # chunk the permutation matrix to bound memory.  The chunk
            # buffer is allocated ONCE and written in place: the naive
            # broadcast (`a[:,None]*sh+b`) materializes three fresh
            # num_perm × CH temporaries per chunk, and at the old
            # CH=2^18 that was ~400 MB of page-faulting allocation
            # traffic per chunk — 30× the cost of the arithmetic
            # (measured 3.94 s vs 0.13 s for 1.42 M shingles × 64
            # perms, bit-identical output).  CH=2^16 keeps the reused
            # buffer at 32 MB (L3-friendly).
            CH = 1 << 16
            mins = np.full(
                (int((nsh > 0).sum()), self.num_perm),
                np.iinfo(np.uint64).max,
                dtype=np.uint64,
            )
            buf = np.empty((self.num_perm, min(CH, len(sh))), np.uint64)
            bounds = np.concatenate((sh_starts, [len(sh)]))
            for c0 in range(0, len(sh), CH):
                c1 = min(c0 + CH, len(sh))
                # odd-affine permutation: uint64 wrap is the definition
                hv = buf[:, : c1 - c0]
                np.multiply(self.a[:, None], sh[None, c0:c1], out=hv)
                np.add(hv, self.b[:, None], out=hv)
                # reduceat boundaries clipped to this chunk
                lo = np.searchsorted(bounds, c0, side="right") - 1
                hi = np.searchsorted(bounds, c1, side="left")
                rs = np.clip(bounds[lo:hi], c0, c1) - c0
                part = np.minimum.reduceat(hv, rs, axis=1).T  # groups × perm
                np.minimum(mins[lo:hi], part, out=mins[lo:hi])
            sigs[np.flatnonzero(nsh > 0)] = mins
        # short docs (fewer than k tokens): one shingle of the whole doc
        for di in np.flatnonzero((counts > 0) & (counts < k)):
            s, c = starts[di], counts[di]
            h = np.uint64(0)
            for j in range(c):
                h = h * _POLY1 + th[s + j]
            sigs[di] = self.a * h + self.b
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids_in = batch["doc_id"].to_numpy().astype(np.int64)
        tok_lists = [t.split(" ") for t in batch["text"].to_pylist()]
        return self.band_rows(doc_ids_in, tok_lists)

    def band_rows(
        self, doc_ids_in: np.ndarray, tok_lists: list[list[str]]
    ) -> pa.Table:
        """Pre-tokenized entry (doc_id, band, band_hash rows) — lets a
        fused caller tokenize each doc exactly once (the same sharing
        contract as TokenizeCombine.combine_tokens)."""
        sigs = self.signatures(tok_lists)
        n = len(doc_ids_in)
        # band hash: polynomial mix of the band's signature rows (vectorized)
        bands = np.empty((n, self.bands), dtype=np.int64)
        for bi in range(self.bands):
            band = sigs[:, bi * self.r : (bi + 1) * self.r]
            h = np.zeros(n, dtype=np.uint64)
            for j in range(self.r):
                h = h * _POLY2 + band[:, j]
            bands[:, bi] = (h >> np.uint64(1)).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids_in, self.bands), pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n), pa.int32()
                ),
                "band_hash": pa.array(bands.reshape(-1), pa.int64()),
            }
        )


N_BUCKET_PARTS = 64


def _add_bucket_part(batch: pa.Table) -> pa.Table:
    """Coarse partition key over (band, band_hash): the LSH bucket space
    has ~one bucket per (doc, band) — grouping by the raw bucket key makes
    millions of tiny groups (per-group overhead dominates), so buckets are
    hashed into a BOUNDED number of partitions and each partition finds
    its buckets' pairs vectorized."""
    bh = batch["band_hash"].to_numpy().astype(np.int64)
    band = batch["band"].to_numpy().astype(np.int64)
    part = ((bh * 31 + band) % N_BUCKET_PARTS).astype(np.int32)
    return batch.append_column("part", pa.array(part, pa.int32()))


def _partition_pairs(tbl: pa.Table) -> pd.DataFrame:
    """All candidate pairs within one partition: one lexsort, run-length
    bucket boundaries, pair expansion only for buckets with ≥2 docs."""
    ids = tbl["doc_id"].to_numpy().astype(np.int64)
    band = tbl["band"].to_numpy().astype(np.int64)
    bh = tbl["band_hash"].to_numpy().astype(np.int64)
    order = np.lexsort((ids, bh, band))
    ids, band, bh = ids[order], band[order], bh[order]
    change = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
    heads = np.concatenate(([0], np.flatnonzero(change) + 1))
    ends = np.concatenate((heads[1:], [len(ids)]))
    out_a, out_b, capped_any = [], [], []
    for h, e in zip(heads, ends):
        if e - h < 2:
            continue
        u = np.unique(ids[h:e])
        if len(u) < 2:
            continue
        if len(u) > MAX_BUCKET:
            # star expansion: connect every member to the representative
            out_a.append(np.full(len(u) - 1, u[0]))
            out_b.append(u[1:])
            capped_any.append(np.full(len(u) - 1, True))
        else:
            ia, ib = np.triu_indices(len(u), k=1)
            out_a.append(u[ia])
            out_b.append(u[ib])
            capped_any.append(np.full(len(ia), False))
    if not out_a:
        return pd.DataFrame(
            {
                "doc_a": np.array([], np.int64),
                "doc_b": np.array([], np.int64),
                "capped": np.array([], bool),
            }
        )
    return pd.DataFrame(
        {
            "doc_a": np.concatenate(out_a),
            "doc_b": np.concatenate(out_b),
            "capped": np.concatenate(capped_any),
        }
    )


def _add_pair_part(df: pd.DataFrame) -> pd.DataFrame:
    """Partition key over the PAIR space: all copies of a (doc_a, doc_b)
    candidate land in one partition, so pair-level dedupe can run
    distributed instead of as a driver-side pandas groupby.

    (A doc_a-only key was tried for verify-read locality and REJECTED:
    dup-cluster structure skews pairs-per-doc_a, and the straggler
    blocks cost more than the saved reads — measured 2× slower verify
    at 1M docs.)"""
    a = df["doc_a"].to_numpy().astype(np.int64)
    b = df["doc_b"].to_numpy().astype(np.int64)
    pp = (((a * np.int64(1_000_003)) ^ b) % N_BUCKET_PARTS).astype(np.int32)
    return df.assign(pp=pp)


def _dedupe_pairs_group(g: pd.DataFrame) -> pd.DataFrame:
    """One pair-partition → one row per (doc_a, doc_b); ``capped`` (when
    present) ORs across duplicates.  Correct globally because
    ``_add_pair_part`` co-locates every copy of a pair."""
    g = g.drop(columns=["pp"])
    if g.empty:
        return g
    if "capped" in g.columns:
        keys = [c for c in g.columns if c != "capped"]
        return g.groupby(keys, as_index=False).agg(capped=("capped", "max"))
    return g.drop_duplicates(["doc_a", "doc_b"]).reset_index(drop=True)


_SKETCH_SINGLETONS: dict = {}


def _minhash_task(batch: pa.Table, **kw) -> pa.Table:
    """Task-pool entry for MinHasher (state is cheap to rebuild — a task
    pool with a per-worker singleton avoids actor-pool spin-up; swap to
    the class + concurrency=N when the sketcher loads real models)."""
    key = ("minhash", tuple(sorted(kw.items())))
    inst = _SKETCH_SINGLETONS.get(key)
    if inst is None:
        inst = MinHasher(**kw)
        _SKETCH_SINGLETONS[key] = inst
    return inst(batch)


def _simhash_task(batch: pa.Table) -> pa.Table:
    inst = _SKETCH_SINGLETONS.get("simhash")
    if inst is None:
        inst = SimHasher()
        _SKETCH_SINGLETONS["simhash"] = inst
    return inst(batch)


def candidates_from_band_rows_ds(rows: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, band, band_hash) Dataset → DEDUPED candidate-pair
    Dataset.  Shared tail of the LSH pipeline: coarse bucket
    partitioning, one vectorized pair expansion per partition, then a
    pair-partitioned distributed dedupe — the pair list stays on the
    cluster end to end (at 100 TB it is written to parquet, never
    collected).

    The band rows are MATERIALIZED before the exchange: Ray's
    sort-based groupby SAMPLES its input to pick partition boundaries,
    and over a lazy upstream that re-executes the expensive sketch map
    for the sample (measured 38 s staged vs 53–103 s fused at 1M docs,
    identical output).  The band rows are a bounded ~40 B/row
    object-store intermediate the shuffle would hold anyway."""
    staged = rows.map_batches(
        _add_bucket_part, batch_format="pyarrow"
    ).materialize()
    return (
        staged.groupby("part")
        .map_groups(_partition_pairs, batch_format="pyarrow")
        .map_batches(_add_pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(_dedupe_pairs_group, batch_format="pandas")
    )


def candidates_from_band_rows(rows: ray.data.Dataset) -> pd.DataFrame:
    """Driver-collected compat wrapper around the Dataset chain (sf-scale
    gates and tests; the pair ANSWER here is the result, not an
    intermediate)."""
    pairs = candidates_from_band_rows_ds(rows).to_pandas()
    if pairs.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "capped"])
    return (
        pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    )


def minhash_candidates(docs: ray.data.Dataset, **kw) -> pd.DataFrame:
    """documents Dataset → deduped candidate pair DataFrame."""
    return candidates_from_band_rows(
        docs.map_batches(_minhash_task, fn_kwargs=kw, batch_format="pyarrow")
    )


def exact_jaccard(tokens_a: list[str], tokens_b: list[str], k: int = 3) -> float:
    sa = set(map(int, _shingle_hashes(tokens_a, k)))
    sb = set(map(int, _shingle_hashes(tokens_b, k)))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class _VerifyPairsTask:
    """Per-pair-partition verification: one predicate-pushdown read of
    THIS partition's involved docs, shingle sets computed once per doc,
    Jaccard per pair via sorted-array intersection.  Task memory is
    bounded by the partition's docs, never the corpus; the driver only
    ever holds the pair lists (LSH-bounded)."""

    def __init__(
        self,
        docs_paths: list[str],
        threshold: float,
        k: int,
        exact_strings: bool = False,
    ):
        self.docs_paths = docs_paths
        self.threshold = threshold
        self.k = k
        # exact_strings: shingle sets are the STRINGS themselves, not
        # crc32 hashes — collision-free, so the Jaccard values are exact
        # (the all-pairs pipeline is oracle-gated against SQL on the raw
        # text; a 32-bit hash collision would shift the 6th decimal)
        self.exact_strings = exact_strings

    _EMPTY = pd.DataFrame(
        {
            "doc_a": np.array([], np.int64),
            "doc_b": np.array([], np.int64),
            "jaccard": np.array([], np.float64),
        }
    )

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.dataset as pads

        from torchtrajectory_ray.stages.postings import _pin_arrow_single_thread

        _pin_arrow_single_thread()
        if g.empty:
            return self._EMPTY.copy()
        a = g["doc_a"].to_numpy().astype(np.int64)
        b = g["doc_b"].to_numpy().astype(np.int64)
        involved = pa.array(sorted(set(a) | set(b)), pa.int64())
        tbl = pads.dataset(self.docs_paths, format="parquet").to_table(
            columns=["doc_id", "text"],
            filter=pads.field("doc_id").isin(involved),
        )
        doc_ids = tbl["doc_id"].to_pylist()
        texts = tbl["text"].to_pylist()
        if self.exact_strings:
            # one factorize over the BLOCK's shingles → int codes.
            # pd.factorize is COLLISION-FREE (equal strings ⇔ equal
            # codes), so intersections over the codes are bit-identical
            # to string-set intersections — exactness preserved, object
            # comparisons replaced by int64 kernels (the round-4 verify
            # re-sorted object arrays per PAIR; this pays the string
            # work once per block)
            per_doc = [
                np.unique(
                    np.asarray(_shingle_strings(t.split(" "), self.k), object)
                )
                for t in texts
            ]
            sizes = np.fromiter(
                (len(s) for s in per_doc), np.int64, len(per_doc)
            )
            if sizes.sum():
                codes, _ = pd.factorize(
                    np.concatenate([s for s in per_doc if len(s)]),
                    sort=False,
                )
            else:
                codes = np.array([], np.int64)
            bounds = np.concatenate(([0], np.cumsum(sizes)))
            shingles = {
                int(d): np.sort(codes[bounds[i] : bounds[i + 1]])
                for i, d in enumerate(doc_ids)
            }
        else:
            shingles = {
                int(d): np.unique(_shingle_hashes(t.split(" "), self.k))
                for d, t in zip(doc_ids, texts)
            }
        out_a, out_b, out_j = [], [], []
        for x, y in zip(a, b):
            sa, sb = shingles[int(x)], shingles[int(y)]
            union = len(sa) + len(sb)
            if union == 0:
                j = 1.0
            else:
                if len(sa) > len(sb):
                    sa, sb = sb, sa
                # merge-count on the pre-sorted arrays (no per-pair
                # sort); sb is the longer side, nonempty since union>0
                pos = np.searchsorted(sb, sa)
                pos[pos == len(sb)] = 0  # off-end → compare against sb[0]
                inter = int(np.count_nonzero(sb[pos] == sa))
                j = inter / (union - inter)
            if j >= self.threshold:
                out_a.append(int(x))
                out_b.append(int(y))
                out_j.append(round(j, 6))
        if not out_a:
            return self._EMPTY.copy()
        return pd.DataFrame(
            {
                "doc_a": np.array(out_a, np.int64),
                "doc_b": np.array(out_b, np.int64),
                "jaccard": np.array(out_j, np.float64),
            }
        )


def _expand_parquet(path: str) -> list[str]:
    """A directory source (e.g. a sharded documents.parquet dir) becomes
    its file list — pyarrow.dataset rejects directories inside a source
    LIST, and the verification tasks always pass lists."""
    import os

    if os.path.isdir(path):
        return sorted(
            os.path.join(root, f)
            for root, _, names in os.walk(path)
            for f in names
            if f.endswith(".parquet")
        )
    return [path]


def _as_docs_paths(docs_source) -> tuple[list[str], str | None]:
    """(paths, staged_dir_to_cleanup_or_None)."""
    if isinstance(docs_source, (list, tuple)):
        return [f for p in docs_source for f in _expand_parquet(p)], None
    if isinstance(docs_source, str):
        return _expand_parquet(docs_source), None
    # Dataset input (compat): stage once so verification tasks can do
    # per-partition predicate-pushdown reads; caller removes the staging
    import os
    import tempfile

    stage = tempfile.mkdtemp(prefix="verify-docs-", dir="/tmp")
    docs_source.select_columns(["doc_id", "text"]).write_parquet(stage)
    paths = sorted(
        os.path.join(stage, p) for p in os.listdir(stage) if p.endswith(".parquet")
    )
    return paths, stage


def verify_pairs_ds(
    docs_paths: list[str],
    cand: ray.data.Dataset,
    threshold: float,
    shingle_k: int = 3,
    exact_strings: bool = False,
    pairs_per_task: int | None = None,
    sort_candidates: bool = False,
) -> ray.data.Dataset:
    """Exact n-gram-Jaccard verification of a candidate-pair DATASET:
    each BLOCK of pairs is one task doing ONE predicate-pushdown read of
    its involved docs, then vectorized verification.  Per-task memory is
    bounded by the candidate partitioning — NOT by sub-batching, which
    would repeat the pushdown read per sub-batch (measured 6× the whole
    chain's wall at 1M docs).  Pairs stream through — candidate and
    confirmed lists never touch the driver; chain ``write_parquet`` or
    ``connected_components_ds`` on the result.

    ``sort_candidates=True`` RANGE-SORTS the pairs by ``doc_a`` first:
    each verify task then holds a contiguous doc_a slice, so its
    pushdown read is a narrow id range instead of a scatter over the
    whole corpus and a doc's shingle set is built in ~1 task instead of
    ~min(pairs, tasks) — a controlled fresh-process A/B at 1M docs with
    3.02M candidates measured 120–156 s unsorted vs 30–40 s sorted
    (sort included), identical pair output.  It is OFF by default
    because the sort is a pipeline BARRIER: when candidates are few
    (the LSH chains emit ~0.1 M pairs at 1M docs), verification no
    longer overlaps the upstream sketch/bucket stages and the chain
    measured ~5× slower — turn it on when candidates are plentiful
    relative to docs (the exact all-pairs join does)."""
    task = _VerifyPairsTask(docs_paths, threshold, shingle_k, exact_strings)

    def verify_chunk(g: pd.DataFrame) -> pd.DataFrame:
        return task(g[["doc_a", "doc_b"]])

    if sort_candidates:
        cand = cand.sort("doc_a")
    return cand.map_batches(
        verify_chunk, batch_format="pandas", batch_size=pairs_per_task
    )


def _collect_pairs(out: pd.DataFrame, cols: list[str]) -> pd.DataFrame:
    if out.empty:
        return pd.DataFrame(columns=cols)
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)[cols]


def verify_pairs(
    docs_source,
    cand: pd.DataFrame,
    threshold: float,
    shingle_k: int = 3,
    exact_strings: bool = False,
) -> pd.DataFrame:
    """Driver-DataFrame compat wrapper over :func:`verify_pairs_ds`:
    chunks the candidate frame into blocks (pairs are independent — any
    split works, no shuffle), fans them out, collects the verified
    answer.  ``docs_source``: parquet path(s) or a Dataset (staged
    once).  Returns (doc_a, doc_b, jaccard) pairs ≥ threshold."""
    if cand.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    paths, staged = _as_docs_paths(docs_source)
    n_parts = int(max(1, min(64, -(-len(cand) // 512))))
    work = cand[["doc_a", "doc_b"]].reset_index(drop=True)
    chunks = [
        work.iloc[i : i + -(-len(work) // n_parts)]
        for i in range(0, len(work), -(-len(work) // n_parts))
    ]
    try:
        out = verify_pairs_ds(
            paths,
            ray.data.from_pandas(chunks),
            threshold,
            shingle_k,
            exact_strings,
            pairs_per_task=None,  # one batch per already-bounded block
        ).to_pandas()
    finally:
        if staged is not None:  # don't leak a staged corpus copy per call
            import shutil

            shutil.rmtree(staged, ignore_errors=True)
    return _collect_pairs(out, ["doc_a", "doc_b", "jaccard"])


def minhash_dedup_pairs_ds(
    sf_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> ray.data.Dataset:
    """Full MinHash-LSH near-dup pipeline as a DATASET: sketch → band
    groupby → distributed pair dedupe → exact n-gram-Jaccard
    verification — candidate and confirmed pair lists live on the
    cluster end to end (the 100-TB path: ``.write_parquet`` the
    result)."""
    src = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])
    kw = dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k)
    cand = candidates_from_band_rows_ds(
        docs.map_batches(_minhash_task, fn_kwargs=kw, batch_format="pyarrow")
    )
    return verify_pairs_ds(
        _expand_parquet(src), cand, threshold, shingle_k
    )


def minhash_dedup_pairs(
    sf_dir: str,
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """Collected answer of :func:`minhash_dedup_pairs_ds` — (doc_a,
    doc_b, jaccard) pairs ≥ threshold, sorted.  The collect IS the
    result sink here; the soak path writes parquet instead."""
    out = minhash_dedup_pairs_ds(
        sf_dir, threshold, num_perm, bands, shingle_k
    ).to_pandas()
    return _collect_pairs(out, ["doc_a", "doc_b", "jaccard"])


# --- Exact n-gram-Jaccard all-pairs (prefix filter) --------------------------
#
# EXACT near-dup discovery — every pair with Jaccard ≥ t, no LSH recall
# loss — via the AllPairs/PPJoin prefix filter (Bayardo, Ma & Srikant,
# "Scaling Up All Pairs Similarity Search", WWW'07; Chaudhuri et al.
# SSJoin): under ANY globally consistent total order on shingles, two
# sets with J ≥ t must share an element within their first
# |S| - ceil(t·|S|) + 1 shingles (proof: J ≥ t ⇒ overlap ≥ ceil(t·|S|)
# for BOTH sets, so the smallest common shingle cannot hide in either
# suffix).  Ordering shingles rarest-first makes the prefix groups tiny:
# frequent (stopword) shingles land in the suffixes and never generate
# candidates.
#
# Scale shape (the reference's visited-set dedup, TorSaver.saveEdges,
# generalized): pass 1 is a pre-aggregated shingle-df groupby whose
# top-K frequent shingles are broadcast (K entries, not the df table);
# pass 2 emits only prefix rows (~(1-t) of the shingle rows); the one
# wide exchange groups prefix rows by a bounded coarse partition key and
# expands pairs vectorized with the |min| ≥ t·|max| length filter;
# verification re-reads only involved docs (predicate pushdown).  Groups
# past ``max_group`` docs fail LOUD (an exact answer there is inherently
# quadratic — dedupe exact copies first or raise ``freq_topk``).


def _shingle_hash64(uniq: np.ndarray) -> np.ndarray:
    """uint64→int64 content hash of shingle strings (pd.util.hash_array
    — vectorized siphash, deterministic within a run).  Used ONLY as a
    grouping/partitioning/ordering key in the exact-Jaccard chain: a
    collision can merely MERGE two shingles' groups, which adds
    spurious candidate pairs that exact verification removes — never
    drops a true pair (equal strings always share the hash).  The
    filters' set SIZES stay string-derived, so the chain stays exact
    while the exchange rows shrink from ~49 B (strings) to fixed ints
    and the shuffle sorts ints instead of strings."""
    if len(uniq) == 0:
        return np.array([], np.int64)
    return pd.util.hash_array(np.asarray(uniq, dtype=object)).view(np.int64)


def _frequent_shingle_ranks(
    docs: ray.data.Dataset, k: int, top: int
) -> dict[int, int]:
    """Top-``top`` most document-frequent shingle HASHES → rank
    ascending by df (rank 0 = least frequent of the top set).  Partial
    counts inside ``map_batches``, small groupby, per-block top-K then
    driver merge — the full df table never reaches the driver."""

    empty = pa.table(
        {"h": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def partial(batch: pa.Table) -> pa.Table:
        allsh = [
            np.unique(np.asarray(_shingle_strings(t.split(" "), k), object))
            for t in batch["text"].to_pylist()
        ]
        if not allsh:
            return empty
        flat_s = np.concatenate(allsh)
        if not len(flat_s):
            return empty
        # ONE vectorized hash over the batch's flattened per-doc-unique
        # shingles (a per-doc hash_array call costs more in call
        # overhead than the hashing itself)
        uniq, counts = np.unique(_shingle_hash64(flat_s), return_counts=True)
        # shuffle-row economy: shingles unique WITHIN this batch are
        # overwhelmingly df≈1 globally and can never be top-K hot — drop
        # them before the exchange (makes the df ranks approximate for
        # borderline shingles, which only shifts the prefix ORDER, never
        # the result: any consistent global order is correct)
        hot = counts >= 2
        if not hot.any():
            return empty
        return pa.table(
            {
                "h": pa.array(uniq[hot], pa.int64()),
                "n": pa.array(counts[hot].astype(np.int64), pa.int64()),
            }
        )

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.nlargest(top, "sum(n)")

    # batch_size=None = one batch per block: parallelism tracks the block
    # count (a 2-block sf0.1 input isn't serialized onto 2 CPUs, and a
    # 64-shard soak corpus still gets 64 lean per-shard prunes)
    agg = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("h")
        .sum("n")
        .map_batches(block_topk, batch_format="pandas")
        .to_pandas()
    )
    if agg.empty:
        return {}
    head = agg.nlargest(top, "sum(n)").sort_values(
        ["sum(n)", "h"]
    )  # ascending df; ties broken by hash for determinism
    return {int(h): i for i, h in enumerate(head["h"])}


def _prefix_rows_task(
    batch: pa.Table, *, threshold: float, k: int, freq_rank: dict[int, int]
) -> pa.Table:
    """Docs batch → (sh64, doc_id, size, pos) PREFIX rows only.

    Global shingle order: non-frequent shingles first (by content hash
    — arbitrary but fixed), then the broadcast top-K frequents by
    ascending df.  One flattened lexsort ranks every doc's shingles in
    a single pass; position-within-doc < prefix length selects the
    rows.  Set SIZES and prefix lengths come from the exact STRING
    sets; only the exchanged key is the 64-bit hash (lossless — see
    :func:`_shingle_hash64`).  ``freq_rank`` is tiny (top-K entries) —
    at cluster scale it ships once per task via ``ray.put`` semantics,
    not per batch."""
    doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
    sh_lists = [
        np.unique(np.asarray(_shingle_strings(t.split(" "), k), object))
        for t in batch["text"].to_pylist()
    ]
    sizes = np.fromiter((len(s) for s in sh_lists), np.int64, len(sh_lists))
    total = int(sizes.sum())
    empty = pa.table(
        {
            "sh64": pa.array([], pa.int64()),
            "doc_id": pa.array([], pa.int64()),
            "size": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "qf": pa.array([], pa.int64()),
            "qv": pa.array([], pa.int64()),
        }
    )
    if total == 0:
        return empty
    flat = np.concatenate([s for s in sh_lists if len(s)])
    doc_idx = np.repeat(np.arange(len(sh_lists), dtype=np.int64), sizes)
    codes, uniq = pd.factorize(flat, sort=False)
    u_h = _shingle_hash64(uniq)
    u_rank = np.fromiter(
        (freq_rank.get(int(h), -1) for h in u_h), np.int64, len(uniq)
    )
    key1 = (u_rank >= 0).astype(np.int64)[codes]  # frequents last
    key2 = np.where(u_rank >= 0, u_rank, u_h)[codes]
    h_flat = u_h[codes]
    order = np.lexsort((h_flat, key2, key1, doc_idx))
    # prefix length p = |S| - ceil(t|S|) + 1 (0 for empty docs)
    p = np.minimum(
        sizes - np.ceil(threshold * sizes).astype(np.int64) + 1, sizes
    )
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, sizes)
    keep = pos < np.repeat(p, sizes)  # order keeps doc_idx runs intact
    # each doc's PREFIX-MAX order key (key1, key2) of its p-th smallest
    # shingle — the REGION bound in _PPJoinPairReduce compares the two
    # docs' prefix maxima under the global shingle order; a per-doc
    # constant rides on every prefix row (hash exchanges have no side
    # channel)
    last_idx = starts + p - 1  # p >= 1 whenever size >= 1
    k1o, k2o = key1[order], key2[order]
    qf_doc, qv_doc = k1o[last_idx], k2o[last_idx]
    # ``pos`` (the shingle's rank in the doc's global order) rides along
    # for the PPJoin POSITIONAL filter at pair-reduce time
    return pa.table(
        {
            "sh64": pa.array(h_flat[order][keep], pa.int64()),
            "doc_id": pa.array(doc_ids[doc_idx][keep], pa.int64()),
            "size": pa.array(sizes[doc_idx][keep], pa.int64()),
            "pos": pa.array(pos[keep], pa.int64()),
            "qf": pa.array(np.repeat(qf_doc, p), pa.int64()),
            "qv": pa.array(np.repeat(qv_doc, p), pa.int64()),
        }
    )


def _prefix_pair_part(batch: pa.Table) -> pa.Table:
    """Coarse bounded partition key over the prefix-shingle space (same
    rationale as ``_add_bucket_part``: millions of tiny per-shingle
    groups → per-group overhead dominates)."""
    h = batch["sh64"].to_numpy().astype(np.int64)
    part = (h % N_BUCKET_PARTS).astype(np.int32)
    return batch.append_column("part", pa.array(part, pa.int32()))


class _PrefixGroupPairs:
    """One partition's candidate-pair OCCURRENCES: lexsort, run-length
    shingle boundaries, vectorized pair expansion gated by the exact
    LENGTH filter (min(|Sa|,|Sb|) ≥ t·max — a J ≥ t pair always passes:
    the overlap is ≤ min and ≥ t·max of the union ≥ t·max).

    Every occurrence of a surviving pair is emitted (one per shared
    prefix shingle) carrying (size, pos, prefix-max key) per side; the
    pair-hash exchange then runs the PPJoin positional bound (Xiao et
    al., WWW'08) plus the tighter REGION bound in
    :class:`_PPJoinPairReduce`, both of which need the pair's COMPLETE
    occurrence chain — which is why no per-occurrence pruning happens
    here.
    """

    def __init__(self, threshold: float, max_group: int):
        self.threshold = threshold
        self.max_group = max_group

    _COLS = ("doc_a", "doc_b", "sa", "sb", "pa", "pb", "qfa", "qva", "qfb", "qvb")

    def __call__(self, tbl: pa.Table) -> pd.DataFrame:
        ids = tbl["doc_id"].to_numpy().astype(np.int64)
        sz = tbl["size"].to_numpy().astype(np.int64)
        pos = tbl["pos"].to_numpy().astype(np.int64)
        qf = tbl["qf"].to_numpy().astype(np.int64)
        qv = tbl["qv"].to_numpy().astype(np.int64)
        codes = tbl["sh64"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, codes))
        ids, sz, codes, pos = ids[order], sz[order], codes[order], pos[order]
        qf, qv = qf[order], qv[order]
        heads = np.concatenate(([0], np.flatnonzero(codes[1:] != codes[:-1]) + 1))
        ends = np.concatenate((heads[1:], [len(ids)]))
        t = self.threshold
        out = {c: [] for c in self._COLS[:2]}
        out_sa, out_sb, out_pa, out_pb = [], [], [], []
        out_q = {c: [] for c in ("qfa", "qva", "qfb", "qvb")}
        for h, e in zip(heads, ends):
            n = e - h
            if n < 2:
                continue
            if n > self.max_group:
                raise ValueError(
                    f"prefix group of {n} docs exceeds max_group="
                    f"{self.max_group}: an exact all-pairs answer here is "
                    "quadratic — run exact dedup first or raise freq_topk "
                    "so the hot shingle is suffix-filtered"
                )
            ia, ib = np.triu_indices(n, k=1)
            ga, gb = ids[h:e][ia], ids[h:e][ib]
            sa, sb = sz[h:e][ia], sz[h:e][ib]
            pa_, pb_ = pos[h:e][ia], pos[h:e][ib]
            # PAIR-LEVEL filters only (length, self): they kill or keep a
            # pair's whole occurrence chain atomically, so the reduce
            # still sees an exact per-pair occurrence count c.  The
            # per-occurrence positional prune moved INTO the reduce
            # (_PPJoinPairReduce) — pruning single occurrences here would
            # under-count c and break the region bound's losslessness.
            ok = np.minimum(sa, sb) >= t * np.maximum(sa, sb)
            ok &= ga != gb  # a doc pairs with itself never
            out["doc_a"].append(ga[ok])
            out["doc_b"].append(gb[ok])
            out_sa.append(sa[ok])
            out_sb.append(sb[ok])
            out_pa.append(pa_[ok])
            out_pb.append(pb_[ok])
            out_q["qfa"].append(qf[h:e][ia][ok])
            out_q["qva"].append(qv[h:e][ia][ok])
            out_q["qfb"].append(qf[h:e][ib][ok])
            out_q["qvb"].append(qv[h:e][ib][ok])
        if not out["doc_a"]:
            return pd.DataFrame(
                {c: np.array([], np.int64) for c in self._COLS}
            )
        a = np.concatenate(out["doc_a"])
        b = np.concatenate(out["doc_b"])
        sa = np.concatenate(out_sa)
        sb = np.concatenate(out_sb)
        pa_ = np.concatenate(out_pa)
        pb_ = np.concatenate(out_pb)
        qfa = np.concatenate(out_q["qfa"])
        qva = np.concatenate(out_q["qva"])
        qfb = np.concatenate(out_q["qfb"])
        qvb = np.concatenate(out_q["qvb"])
        # orient metadata with the canonical (lo, hi) pair order
        swap = a > b
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame(
            {
                "doc_a": lo,
                "doc_b": hi,
                "sa": np.where(swap, sb, sa),
                "sb": np.where(swap, sa, sb),
                "pa": np.where(swap, pb_, pa_),
                "pb": np.where(swap, pa_, pb_),
                "qfa": np.where(swap, qfb, qfa),
                "qva": np.where(swap, qvb, qva),
                "qfb": np.where(swap, qfa, qfb),
                "qvb": np.where(swap, qva, qvb),
            }
        )


class _PPJoinPairReduce:
    """One pair-partition → one row per (doc_a, doc_b) that survives TWO
    lossless upper bounds on the exact overlap.  A pair's complete
    occurrence chain (one row per shared prefix shingle, all emitted by
    ``_PrefixGroupPairs``) is co-located by ``_add_pair_part``; with
    c = chain length, (pa*, pb*) the positions of the LAST shared prefix
    shingle in the global shingle order, and p(S) = |S| − ceil(t|S|) + 1
    the prefix length:

    - ACCUMULATING POSITIONAL bound (PPJoin, Xiao et al., WWW'08):
      overlap ≤ c + min(|Sa| − pa* − 1, |Sb| − pb* − 1) — every common
      shingle ≤ the last shared one lies in both prefixes (prefixes are
      order-prefixes) and is counted in c; common shingles after it fit
      in the shorter remaining suffix.
    - REGION bound: let M be the side whose prefix-max order key
      (qf, qv) is the smaller, i.e. τ = prefix-max(M) ≤ prefix-max(other).
      Any common shingle ≤ τ is inside BOTH prefixes (≤ each side's
      prefix max ⇒ in that side's bottom-p) and is therefore counted in
      c; common shingles > τ fit among M's |S_M| − p(S_M) elements above
      its own prefix max.  So overlap ≤ c + |S_M| − p(S_M).  This is
      what kills the random-single-collision pair the positional bound
      can't: c = 1 with compatible sizes gives ≈ 1 + 0.3·|S| headroom
      below the required t/(1+t)·(|Sa|+|Sb|).

    Prune pairs where min(bound₁, bound₂) < t/(1+t)·(|Sa|+|Sb|); a true
    J ≥ t pair always passes (both are genuine upper bounds on a
    quantity that is ≥ the requirement).  At 100k docs the reduce cuts
    verification candidates 67.2k → 0.8k against 256 confirmed pairs
    (the r4 verdict's 46×-over-read item)."""

    def __init__(self, threshold: float):
        self.threshold = threshold

    _EMPTY = staticmethod(
        lambda: pd.DataFrame(
            {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
        )
    )

    def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return self._EMPTY()
        agg = g.groupby(["doc_a", "doc_b"], as_index=False, sort=False).agg(
            c=("pa", "size"),
            pa=("pa", "max"),
            pb=("pb", "max"),
            sa=("sa", "first"),
            sb=("sb", "first"),
            qfa=("qfa", "first"),
            qva=("qva", "first"),
            qfb=("qfb", "first"),
            qvb=("qvb", "first"),
        )
        t = self.threshold
        c = agg["c"].to_numpy()
        sa = agg["sa"].to_numpy()
        sb = agg["sb"].to_numpy()
        bound_pos = c + np.minimum(
            sa - agg["pa"].to_numpy() - 1, sb - agg["pb"].to_numpy() - 1
        )
        # region bound: suffix length |S| - p of the side with the
        # SMALLER prefix-max key (lexicographic on (qf, qv))
        p_a = np.minimum(sa - np.ceil(t * sa).astype(np.int64) + 1, sa)
        p_b = np.minimum(sb - np.ceil(t * sb).astype(np.int64) + 1, sb)
        qfa, qfb = agg["qfa"].to_numpy(), agg["qfb"].to_numpy()
        qva, qvb = agg["qva"].to_numpy(), agg["qvb"].to_numpy()
        a_is_min = (qfa < qfb) | ((qfa == qfb) & (qva <= qvb))
        bound_reg = c + np.where(a_is_min, sa - p_a, sb - p_b)
        # 1e-9 float slack on the PRUNE side only — never drops a
        # qualifying pair
        keep = np.minimum(bound_pos, bound_reg) >= (
            t / (1.0 + t) * (sa + sb) - 1e-9
        )
        return (
            agg.loc[keep, ["doc_a", "doc_b"]]
            .reset_index(drop=True)
            .astype(np.int64)
        )


def ngram_jaccard_pairs_ds(
    sf_dir: str,
    threshold: float = 0.7,
    shingle_k: int = 3,
    freq_topk: int = 256,
    max_group: int = 4096,
) -> ray.data.Dataset:
    """EXACT all-pairs n-gram-Jaccard near-dup as a DATASET: every
    (doc_a, doc_b, jaccard) with doc_a < doc_b sharing ≥ 1 shingle and
    J ≥ threshold — equal to the quadratic SQL self-join, computed with
    prefix-filter pruning, a distributed pair dedupe, and exact
    string-shingle verification (collision-free).  Candidate and
    confirmed pair lists never touch the driver."""
    src = f"{sf_dir}/documents.parquet"
    docs = ray.data.read_parquet(src, columns=["doc_id", "text"])
    rank = _frequent_shingle_ranks(docs, shingle_k, freq_topk)
    rows = docs.map_batches(
        _prefix_rows_task,
        fn_kwargs=dict(threshold=threshold, k=shingle_k, freq_rank=rank),
        batch_format="pyarrow",
    )
    expand = _PrefixGroupPairs(threshold, max_group)

    def expand_part(tbl: pa.Table) -> pd.DataFrame:
        return expand(tbl)

    cand = (
        rows.map_batches(_prefix_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(expand_part, batch_format="pyarrow")
        .map_batches(_add_pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(_PPJoinPairReduce(threshold).__call__, batch_format="pandas")
    )
    return verify_pairs_ds(
        _expand_parquet(src),
        cand,
        threshold,
        shingle_k,
        exact_strings=True,
        # the prefix filter emits ~3 candidates per doc at 1M — the
        # range-sort's read locality far outweighs its barrier here
        sort_candidates=True,
    )


def ngram_jaccard_pairs(
    sf_dir: str,
    threshold: float = 0.7,
    shingle_k: int = 3,
    freq_topk: int = 256,
    max_group: int = 4096,
) -> pd.DataFrame:
    """Collected, sorted answer of :func:`ngram_jaccard_pairs_ds`."""
    out = ngram_jaccard_pairs_ds(
        sf_dir, threshold, shingle_k, freq_topk, max_group
    ).to_pandas()
    return _collect_pairs(out, ["doc_a", "doc_b", "jaccard"])


# --- Near-dup connected components (hash-to-min) -----------------------------

# directed edge rows that still fit one worker's heap comfortably
# (16 B/row → ~64 MB at the bound): below this the single-task
# union-find path replaces the exchange rounds
LOCAL_CC_MAX_ROWS = 4_000_000


def _components_local(t: pa.Table) -> pa.Table:
    """ONE task: path-compressed union-find over the whole (node,
    member) edge list → the identical (doc_id, rep_id = component min)
    label table the hash-to-min rounds converge to."""
    node = t["node"].to_numpy().astype(np.int64)
    member = t["member"].to_numpy().astype(np.int64)
    ids, inv = np.unique(np.concatenate((node, member)), return_inverse=True)
    ea, eb = inv[: len(node)], inv[len(node) :]
    parent = np.arange(len(ids), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(ea, eb):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            # union toward the smaller ORDINAL: ids is sorted, so the
            # smaller ordinal is the smaller doc_id — the root IS the
            # component minimum, matching hash-to-min's fixpoint
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = np.fromiter((find(int(i)) for i in range(len(ids))), np.int64, len(ids))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "rep_id": pa.array(ids[roots], pa.int64()),
        }
    )


def connected_components_ds(
    pairs: "ray.data.Dataset", max_iters: int = 64
) -> ray.data.Dataset:
    """(doc_a, doc_b) near-dup pair DATASET → (doc_id, rep_id) Dataset:
    every doc that appears in a pair, labeled with the MINIMUM doc_id of
    its connected component (the canonical keeper — ``rep_id != doc_id``
    marks drops).  The pair list never touches the driver.

    Hash-to-min label propagation (Rastogi et al., "Finding Connected
    Components in Map-Reduce in Logarithmic Rounds", ICDE'13): state is
    (node, member) rows; each round every node broadcasts its current
    minimum to its member set and its member set to the minimum, so
    cluster ids collapse onto component minima in O(log n) groupby
    rounds — no joins, no driver-side union-find.  Convergence is
    detected by a (count, checksum) signature computed as a streaming
    aggregate; ``max_iters`` fails loud (the proven bound is ~log₂ of
    the largest component, far under 64).

    Size-aware dispatch (round 5): an edge list under
    ``LOCAL_CC_MAX_ROWS`` runs as ONE union-find task instead (identical
    labels, none of the exchange rounds); the rounds remain the path for
    pair graphs that outgrow a worker."""
    _empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "rep_id": pa.array([], pa.int64())}
    )

    def both_directions(t: pa.Table) -> pd.DataFrame:
        a = t["doc_a"].to_numpy().astype(np.int64)
        b = t["doc_b"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {"node": np.concatenate((a, b)), "member": np.concatenate((b, a))}
        )

    init = pairs.map_batches(
        both_directions, batch_format="pyarrow"
    ).materialize()
    n_rows = init.count()
    if n_rows == 0:
        return ray.data.from_arrow(_empty)
    if n_rows <= LOCAL_CC_MAX_ROWS:
        # the whole edge list fits ONE worker: a single union-find task
        # produces the IDENTICAL (doc_id, min-id rep) label table while
        # skipping every O(log diameter) exchange round — the same
        # size-aware dispatch as the windowed-kmeans fan-out.  The
        # distributed rounds below remain the path for pair graphs
        # that outgrow a worker.
        return init.repartition(1).map_batches(
            _components_local, batch_format="pyarrow", batch_size=None
        )
    n_parts = int(max(2, min(64, n_rows // 4096 + 2)))
    rows = init.repartition(n_parts)

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["node"].to_numpy().astype(np.int64) % n_parts).astype(np.int32)
        return t.append_column("part", pa.array(part, pa.int32()))

    def step(g: pd.DataFrame) -> pd.DataFrame:
        """One hash-to-min round over a whole node-partition, vectorized:
        self-augment, dedupe, per-node min via reduceat, emit both
        broadcast directions — no per-node Python."""
        node = g["node"].to_numpy().astype(np.int64)
        member = g["member"].to_numpy().astype(np.int64)
        uniq_nodes = np.unique(node)
        node = np.concatenate((node, uniq_nodes))
        member = np.concatenate((member, uniq_nodes))  # v ∈ C(v)
        order = np.lexsort((member, node))
        node, member = node[order], member[order]
        keep = np.concatenate(
            ([True], (node[1:] != node[:-1]) | (member[1:] != member[:-1]))
        )
        node, member = node[keep], member[keep]
        heads = np.concatenate(
            ([0], np.flatnonzero(node[1:] != node[:-1]) + 1)
        )
        mins = member[heads]  # member sorted within node → first = min
        counts = np.diff(np.concatenate((heads, [len(node)])))
        m_rep = np.repeat(mins, counts)
        return pd.DataFrame(
            {
                "node": np.concatenate((member, m_rep)),
                "member": np.concatenate((m_rep, member)),
            }
        )

    def signature(ds: ray.data.Dataset) -> tuple[int, int]:
        def partial(t: pa.Table) -> pd.DataFrame:
            n = t["node"].to_numpy().astype(np.int64)
            m = t["member"].to_numpy().astype(np.int64)
            chk = int((n * np.int64(1_000_003) ^ m).sum(dtype=np.int64))
            return pd.DataFrame({"n": [len(n)], "chk": [chk]})

        agg = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        return int(agg["n"].sum()), int(agg["chk"].sum())

    prev = None
    for _ in range(max_iters):
        rows = (
            rows.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(step, batch_format="pandas")
            .materialize()
        )
        sig = signature(rows)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(
            f"hash-to-min did not converge in {max_iters} rounds "
            "(checksum still moving) — pathological component or "
            "signature collision loop"
        )

    def to_labels(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["node"].cast(pa.int64()),
                "rep_id": t["min(member)"].cast(pa.int64()),
            }
        )

    return (
        rows.groupby("node")
        .min("member")
        .map_batches(to_labels, batch_format="pyarrow")
    )


def connected_components(
    pairs, max_iters: int = 64
) -> pd.DataFrame:
    """Collected compat wrapper over :func:`connected_components_ds`;
    accepts a (doc_a, doc_b) DataFrame or Dataset, returns the sorted
    (doc_id, rep_id) label table."""
    if isinstance(pairs, pd.DataFrame):
        if pairs.empty:
            return pd.DataFrame(
                {
                    "doc_id": np.array([], np.int64),
                    "rep_id": np.array([], np.int64),
                }
            )
        pairs = ray.data.from_pandas(
            pairs[["doc_a", "doc_b"]].reset_index(drop=True)
        )
    out = connected_components_ds(pairs, max_iters).to_pandas()
    return (
        out.sort_values("doc_id")
        .reset_index(drop=True)[["doc_id", "rep_id"]]
        .astype(np.int64)
    )


def neardup_components(
    sf_dir: str, threshold: float = 0.7, shingle_k: int = 3
) -> pd.DataFrame:
    """Exact near-dup GROUPS over the documents table: prefix-filter
    all-pairs Jaccard ≥ threshold → connected components → (doc_id,
    rep_id) canonical-keeper assignment.  Deterministic end to end, so
    SQL-oracle-gated (recursive-CTE transitive closure).  The pair list
    flows Dataset→Dataset into the components rounds — it is never a
    driver DataFrame."""
    return connected_components(
        ngram_jaccard_pairs_ds(sf_dir, threshold=threshold, shingle_k=shingle_k)
    )


# --- SimHash -----------------------------------------------------------------


class SimHasher:
    """docs batch → (doc_id, simhash, band, band_val) — 64-bit tf-weighted
    simhash split into 4×16-bit bands for hamming-≤3 candidate search.
    Batch-vectorized: one factorize, per-(doc, term) tf via run-length
    boundaries, per-doc bit votes via ``np.add.reduceat`` — same flatten +
    combine shape as the index build's TokenizeCombine."""

    def __init__(self):
        from torchtrajectory_ray.functions.text import TermHasher

        self.hasher = TermHasher()

    def simhash(self, tokens: list[str]) -> int:
        """Single-doc reference implementation (used by tests)."""
        if not tokens:
            return 0
        sigs = self._signatures([tokens])
        return int(sigs[0])

    def _signatures(self, tok_lists: list[list[str]]) -> np.ndarray:
        import itertools

        import pandas as pd

        n_docs = len(tok_lists)
        counts = np.fromiter((len(t) for t in tok_lists), np.int64, n_docs)
        total = int(counts.sum())
        out = np.zeros(n_docs, dtype=np.uint64)
        if total == 0:
            return out
        flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
        codes, uniq = pd.factorize(flat, sort=False)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
        key = doc_idx * len(uniq) + codes
        order = np.argsort(key, kind="stable")
        skey = key[order]
        heads = np.concatenate(([0], np.flatnonzero(skey[1:] != skey[:-1]) + 1))
        tf = np.diff(np.concatenate((heads, [total]))).astype(np.int64)
        e_doc = doc_idx[order][heads]
        e_code = codes[order][heads]

        th = np.fromiter((self.hasher(t) for t in uniq), np.uint64, len(uniq))
        bits = (
            (th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
        ).astype(np.int64) * 2 - 1  # n_uniq × 64 of ±1
        contrib = bits[e_code] * tf[:, None]  # n_pairs × 64
        doc_heads = np.concatenate(
            ([0], np.flatnonzero(e_doc[1:] != e_doc[:-1]) + 1)
        )
        votes = np.add.reduceat(contrib, doc_heads, axis=0)  # docs_present × 64
        sh = (
            (votes > 0).astype(np.uint64)
            << np.arange(64, dtype=np.uint64)[None, :]
        ).sum(axis=1, dtype=np.uint64)
        out[e_doc[doc_heads]] = sh
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_numpy().astype(np.int64)
        sigs = self._signatures([t.split(" ") for t in batch["text"].to_pylist()])
        n = len(doc_ids)
        band_idx = np.arange(4, dtype=np.uint64)
        band_vals = (
            (sigs[:, None] >> (np.uint64(16) * band_idx[None, :]))
            & np.uint64(0xFFFF)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(doc_ids, 4), pa.int64()),
                "simhash": pa.array(
                    np.repeat(sigs.view(np.int64), 4), pa.int64()
                ),
                "band": pa.array(
                    np.tile(np.arange(4, dtype=np.int32), n), pa.int32()
                ),
                "band_val": pa.array(band_vals.reshape(-1), pa.int32()),
            }
        )


def simhash_rows_pairs_ds(
    rows: ray.data.Dataset, max_hamming: int = 3
) -> ray.data.Dataset:
    """(doc_id, simhash, band, band_val) rows → verified near-dup pair
    Dataset: 4-band pigeonhole candidates → distributed pair dedupe +
    exact hamming verify (the signatures ride along with the candidate
    rows, so verification needs no doc re-read at all)."""

    def pairs(tbl: pa.Table) -> pd.DataFrame:
        ids = tbl["doc_id"].to_numpy().astype(np.int64)
        band = tbl["band"].to_numpy().astype(np.int64)
        bv = tbl["band_val"].to_numpy().astype(np.int64)
        sh = tbl["simhash"].to_numpy().astype(np.int64)
        order = np.lexsort((ids, bv, band))
        ids, band, bv, sh = ids[order], band[order], bv[order], sh[order]
        change = (band[1:] != band[:-1]) | (bv[1:] != bv[:-1])
        heads = np.concatenate(([0], np.flatnonzero(change) + 1))
        ends = np.concatenate((heads[1:], [len(ids)]))
        a, b, sa, sb = [], [], [], []
        for h, e in zip(heads, ends):
            if e - h < 2:
                continue
            u, first = np.unique(ids[h:e], return_index=True)
            if len(u) < 2:
                continue
            us = sh[h:e][first]
            if len(u) > MAX_BUCKET:
                # star expansion (see MAX_BUCKET note)
                a.append(np.full(len(u) - 1, u[0]))
                b.append(u[1:])
                sa.append(np.full(len(u) - 1, us[0]))
                sb.append(us[1:])
            else:
                ia, ib = np.triu_indices(len(u), k=1)
                a.append(u[ia]); b.append(u[ib]); sa.append(us[ia]); sb.append(us[ib])
        if not a:
            return pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "sh_a": np.array([], np.int64),
                    "sh_b": np.array([], np.int64),
                }
            )
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(a),
                "doc_b": np.concatenate(b),
                "sh_a": np.concatenate(sa),
                "sh_b": np.concatenate(sb),
            }
        )

    def add_part(batch: pa.Table) -> pa.Table:
        bv = batch["band_val"].to_numpy().astype(np.int64)
        band = batch["band"].to_numpy().astype(np.int64)
        part = ((bv * 31 + band) % N_BUCKET_PARTS).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        """One pair-partition: dedupe then exact hamming from the
        carried signatures, vectorized popcount via uint8 bit table."""
        g = g.drop(columns=["pp"]).drop_duplicates(["doc_a", "doc_b"])
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_a": np.array([], np.int64),
                    "doc_b": np.array([], np.int64),
                    "hamming": np.array([], np.int64),
                }
            )
        x = g["sh_a"].to_numpy().astype(np.uint64) ^ g["sh_b"].to_numpy().astype(
            np.uint64
        )
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
            .sum(axis=1)
            .astype(np.int64)
        )
        out = g.assign(hamming=ham)
        return out[out["hamming"] <= max_hamming][
            ["doc_a", "doc_b", "hamming"]
        ].reset_index(drop=True)

    return (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs, batch_format="pyarrow")
        .map_batches(_add_pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(finish, batch_format="pandas")
    )


def simhash_dedup_pairs_ds(
    sf_dir: str, max_hamming: int = 3
) -> ray.data.Dataset:
    """SimHash near-dup over the sf documents table as a DATASET."""
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    return simhash_rows_pairs_ds(
        docs.map_batches(_simhash_task, batch_format="pyarrow"), max_hamming
    )


def _simhash_pairs_from_rows(
    rows: ray.data.Dataset, max_hamming: int
) -> pd.DataFrame:
    return _collect_pairs(
        simhash_rows_pairs_ds(rows, max_hamming).to_pandas(),
        ["doc_a", "doc_b", "hamming"],
    )


def simhash_dedup_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Collected, sorted answer of :func:`simhash_dedup_pairs_ds`."""
    out = simhash_dedup_pairs_ds(sf_dir, max_hamming).to_pandas()
    return _collect_pairs(out, ["doc_a", "doc_b", "hamming"])


# --- LSH recall gates (driver-checkable reductions) --------------------------
#
# The LSH candidate sets are probabilistic, so the pair lists themselves
# have no SQL oracle — but IDENTICAL-TEXT pairs are a deterministic
# subset LSH must recover with probability 1 (identical text → identical
# signatures → same buckets in every band; J = 1 ≥ any threshold).  The
# recall gates return exactly the identical-text pairs the chain found;
# DuckDB's text-equality self-join is the oracle, and equality proves
# 100 % structural recall through sketch → banding → bucketing →
# verification.  (The reference gates its index the same way — a
# deterministic roundtrip property, InvertedIndexTest.java:10-147.)


RECALL_PLANT_N = 25           # sf docs planted as duplicates for the gate
RECALL_PLANT_OFFSET = 10_000_000


def _planted_dup_docs(sf_dir: str) -> list[str]:
    """The sf documents table UNION a duplicated copy of its first
    ``RECALL_PLANT_N`` docs (doc_id + RECALL_PLANT_OFFSET) — staged to a
    cached parquet dir so the recall gates have a guaranteed-nonempty,
    SQL-expressible identical-text subset at every sf.  The SQL mirror:
    ``documents UNION ALL SELECT doc_id + off, text WHERE doc_id < n``."""
    import os

    import hashlib

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    tag = hashlib.md5(
        f"{os.path.abspath(src)}:{st.st_size}:{st.st_mtime_ns}".encode()
    ).hexdigest()[:10]
    d = f"/tmp/ttray_cache/recall-{tag}-{RECALL_PLANT_N}"
    marker = os.path.join(d, "_STAGED")
    if not os.path.exists(marker):
        os.makedirs(d, exist_ok=True)
        import pyarrow.parquet as pq

        t = pq.read_table(src, columns=["doc_id", "text"])
        pq.write_table(t, os.path.join(d, "base.parquet.tmp"))
        os.replace(
            os.path.join(d, "base.parquet.tmp"), os.path.join(d, "base.parquet")
        )
        mask = pc.less(t["doc_id"], RECALL_PLANT_N)
        dup = t.filter(mask)
        dup = dup.set_column(
            0,
            "doc_id",
            pc.add(dup["doc_id"], RECALL_PLANT_OFFSET),
        )
        pq.write_table(dup, os.path.join(d, "plant.parquet.tmp"))
        os.replace(
            os.path.join(d, "plant.parquet.tmp"),
            os.path.join(d, "plant.parquet"),
        )
        with open(marker, "w") as f:
            f.write("ok")
    return [os.path.join(d, "base.parquet"), os.path.join(d, "plant.parquet")]


def _keyed_pairs_ds(
    docs_paths: list[str], key_rows, max_group: int = 4096
) -> ray.data.Dataset:
    """(doc_a, doc_b) pairs of docs sharing a 63-bit content key
    (doc_a < doc_b): ``key_rows`` maps a (doc_id, text) Arrow batch to
    (h, doc_id) rows, then a key groupby expands all in-group pairs
    (groups past ``max_group`` fail loud — the pair answer there is
    inherently quadratic)."""

    def group_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(g["doc_id"].to_numpy().astype(np.int64))
        n = len(ids)
        if n < 2:
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
            )
        if n > max_group:
            raise ValueError(
                f"identical-key group of {n} docs exceeds max_group="
                f"{max_group}"
            )
        ia, ib = np.triu_indices(n, k=1)
        return pd.DataFrame({"doc_a": ids[ia], "doc_b": ids[ib]})

    return (
        ray.data.read_parquet(docs_paths, columns=["doc_id", "text"])
        .map_batches(key_rows, batch_format="pyarrow")
        .groupby("h")
        .map_groups(group_pairs, batch_format="pandas")
    )


def exact_text_pairs_ds(
    docs_paths: list[str], max_group: int = 4096
) -> ray.data.Dataset:
    """(doc_a, doc_b) pairs of IDENTICAL text (doc_a < doc_b) over the
    given parquet files: sha-keyed groupby via :func:`_keyed_pairs_ds`."""
    import hashlib

    def key_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.int64)
        hs = [
            int.from_bytes(
                hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
            )
            >> 1
            for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "h": pa.array(hs, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
            }
        )

    return _keyed_pairs_ds(docs_paths, key_rows, max_group)


def fingerprint_dups(sf_dir: str) -> pd.DataFrame:
    """(doc_a, doc_b) pairs whose ROLLING-HASH document fingerprints
    collide, over documents ∪ the planted duplicated head — the driver
    gate for the fingerprint operator (:func:`fingerprints`).  The
    Karp-Rabin polynomial is a deterministic function of the token
    stream and text → token stream is injective (``' '.join ∘ split``
    is the identity), so equal fingerprint ⟺ equal text up to 2⁻⁶³
    collision odds — the SQL text-equality self-join (the recall-gate
    oracle) reproduces the pair set exactly; a fingerprint kernel that
    dropped tokens, ignored order, or truncated would break the match."""

    def key_rows(t: pa.Table) -> pa.Table:
        fps = fingerprint_batch(
            [s.split(" ") for s in t["text"].to_pylist()]
        )
        return pa.table(
            {
                "h": pa.array(fps, pa.int64()),
                "doc_id": t["doc_id"].cast(pa.int64()),
            }
        )

    pairs = _keyed_pairs_ds(_planted_dup_docs(sf_dir), key_rows).to_pandas()
    if pairs.empty:
        return pd.DataFrame(
            {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
        )
    return pairs.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def _lsh_exact_recall(
    docs_paths: list[str], found: pd.DataFrame
) -> pd.DataFrame:
    """Identical-text pairs ∩ the chain's found pairs, sorted — equals
    the full identical-text pair set iff recall is 100 %."""
    exact = exact_text_pairs_ds(docs_paths).to_pandas()
    if exact.empty or found.empty:
        return pd.DataFrame(
            {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)}
        )
    out = exact.merge(found[["doc_a", "doc_b"]], on=["doc_a", "doc_b"])
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


def minhash_recall_pairs(sf_dir: str, threshold: float = 0.7) -> pd.DataFrame:
    """Identical-text pairs recovered by the full MinHash-LSH chain over
    the planted-duplicate corpus (oracle: the text-equality self-join on
    the SAME SQL-expressible union — equality = perfect recall on the
    deterministic subset)."""
    paths = _planted_dup_docs(sf_dir)
    docs = ray.data.read_parquet(paths, columns=["doc_id", "text"])
    cand = candidates_from_band_rows_ds(
        docs.map_batches(_minhash_task, batch_format="pyarrow")
    )
    found = _collect_pairs(
        verify_pairs_ds(paths, cand, threshold).to_pandas(),
        ["doc_a", "doc_b", "jaccard"],
    )
    return _lsh_exact_recall(paths, found)


def simhash_recall_pairs(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Identical-text pairs recovered by the SimHash chain over the
    planted-duplicate corpus (identical text → hamming 0 → always ≤
    max_hamming)."""
    paths = _planted_dup_docs(sf_dir)
    docs = ray.data.read_parquet(paths, columns=["doc_id", "text"])
    rows = docs.map_batches(_simhash_task, batch_format="pyarrow")
    found = _simhash_pairs_from_rows(rows, max_hamming)
    return _lsh_exact_recall(paths, found)


# --- document fingerprint ----------------------------------------------------


_FP_SEED = np.uint64(1469598103934665603)
_FP_POLY = np.uint64(1099511628211)


def fingerprint_tokens(tokens: list[str]) -> int:
    """Single-doc reference implementation of the polynomial rolling hash
    h ← h·P + crc32(token) (mod 2^64) — the sequential fold the batched
    kernel must reproduce exactly (golden test).

    DEFINITION v2 (round 2): the fold is multiply-ADD, deliberately
    replacing round 1's multiply-XOR FNV variant — the additive form is
    linear, which is what makes the fingerprint both incrementally
    computable over a stream AND batch-vectorizable; fingerprints are a
    self-contained content id with no persisted consumers, so the value
    change is a versioned definition change, not silent drift."""
    h = int(_FP_SEED)
    for t in tokens:
        h = (h * int(_FP_POLY) + zlib.crc32(t.encode("utf-8"))) & ((1 << 64) - 1)
    return h >> 1  # keep int64-positive


def fingerprint_batch(tok_lists: list[list[str]]) -> np.ndarray:
    """Batched fingerprints, fully vectorized: h·P + c is linear, so
    h_doc = seed·P^L + Σ_j c_j·P^(L−1−j) (mod 2^64) — one factorize over
    all tokens, one power table, one ``np.add.reduceat`` per batch (the
    same shape as MinHasher.signatures; uint64 wrap-around IS the mod)."""
    import itertools

    n_docs = len(tok_lists)
    counts = np.fromiter((len(t) for t in tok_lists), np.int64, n_docs)
    total = int(counts.sum())
    if total == 0:
        return np.full(n_docs, int(_FP_SEED) >> 1, dtype=np.int64)
    flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
    codes, uniq = pd.factorize(flat, sort=False)
    crcs = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) for t in uniq), np.uint64, len(uniq)
    )
    max_len = int(counts.max())
    powers = np.empty(max_len + 1, dtype=np.uint64)
    powers[0] = np.uint64(1)
    if max_len:
        np.multiply.accumulate(
            np.full(max_len, _FP_POLY, dtype=np.uint64), out=powers[1:]
        )
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ends = starts + counts
    # exponent of token j in doc d: (end_d − 1 − j)
    exp = np.repeat(ends - 1, counts) - np.arange(total, dtype=np.int64)
    contrib = crcs[codes] * powers[exp]  # uint64 wrap == mod 2^64
    sums = np.zeros(n_docs, dtype=np.uint64)
    nz = counts > 0
    if nz.any():
        sums[nz] = np.add.reduceat(contrib, starts[nz])
    h = _FP_SEED * powers[counts] + sums
    return (h >> np.uint64(1)).astype(np.int64)


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """doc_id, fingerprint — polynomial rolling hash of the token stream
    (order-sensitive content id; exact-dup detection that, unlike the
    sha1 of exact_dedup, is computable incrementally over a stream)."""

    def f(batch: pa.Table) -> pa.Table:
        fps = fingerprint_batch([t.split(" ") for t in batch["text"].to_pylist()])
        return pa.table(
            {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps, pa.int64())}
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(f, batch_format="pyarrow")


# --- substring-level duplication (k-token windows) ---------------------------

_KGRAM_POLY = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _window_hashes(
    texts: list[str], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """(window hash, local doc index) for every k-token window of the
    batch, vectorized: one flat token-id array + a k-pass Horner
    accumulation, no per-window Python.  Window identity = a degree-k polynomial in the
    63-bit blake term ids (uint64 wraparound) — deterministic and
    collision-free for practical purposes (the same trade as the 63-bit
    term ids themselves); windows never straddle a doc boundary (masked
    by comparing the doc index at both window ends)."""

    from torchtrajectory_ray.functions.text import term_hash

    tok_lists = [t.split(" ") for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    total = int(counts.sum())
    import itertools

    flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
    codes, uniq = pd.factorize(flat, sort=False)
    tids = np.fromiter(
        (term_hash(t) for t in uniq), np.uint64, len(uniq)
    )[codes]
    doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), counts)
    if total < k:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    # Horner accumulation: k passes over ONE n_windows-sized array
    # (peak memory O(n_windows)) instead of materializing the
    # (n_windows × k) product matrix — bit-deterministic like any other
    # fixed evaluation order under uint64 wraparound
    n_win = total - k + 1
    h = np.zeros(n_win, dtype=np.uint64)
    for j in range(k):
        h *= _KGRAM_POLY
        h += tids[j : j + n_win]
    in_doc = doc_idx[: total - k + 1] == doc_idx[k - 1 :]
    return (h[in_doc] >> np.uint64(1)).astype(np.int64), doc_idx[
        : total - k + 1
    ][in_doc]


def kgram_dup_stats(
    sf_dir: str, k: int = 8, max_dup_hashes: int = 2_000_000
) -> "ray.data.Dataset":
    """(doc_id, n_windows, n_dup) — per-doc counts of k-token windows
    whose window-gram occurs at least twice in the WHOLE corpus: the
    substring-level duplication signal of Lee et al., "Deduplicating
    Training Data Makes Language Models Better" (ACL 2022, public),
    here as a two-pass hash pipeline instead of a suffix array:

    1. per-batch pre-aggregated (hash, n) partials → ONE groupby →
       the global gram-frequency table, filtered to hashes with
       count >= 2 (the dup set — small when duplication is rare);
    2. the dup-hash set broadcasts (``ray.put`` of one sorted int64
       array) and a second streaming pass counts each doc's windows
       and dup-windows by searchsorted membership — no per-doc state
       leaves the batch except its two counters.

    The broadcast is the scale knob: ``max_dup_hashes`` fails loud when
    the corpus is so duplicated that the dup set itself outgrows a
    broadcast (at that point dedup the corpus first, or shuffle
    (doc, hash) pairs instead — the line_dedup exchange shape).  Docs
    shorter than ``k`` tokens have no windows and emit nothing, matching
    the SQL oracle."""
    import ray as _ray

    N_GRAM_PARTS = 256

    def hash_partial(batch: pa.Table) -> pa.Table:
        h, _ = _window_hashes(batch["text"].to_pylist(), k)
        hu, n = np.unique(h, return_counts=True)
        return pa.table(
            {
                "hash": pa.array(hu, pa.int64()),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                # hash-partition key: the global count of a gram only
                # needs its rows CO-LOCATED, not globally sorted — a
                # 256-way hash exchange replaces the full sort-based
                # groupby of the ~1-row-per-window partial table
                # (~105 M rows at 1M docs; measured 2.2× on the soak)
                "part": pa.array(
                    (hu & np.int64(N_GRAM_PARTS - 1)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def dup_in_part(g: pd.DataFrame) -> pd.DataFrame:
        hu, inv = np.unique(g["hash"].to_numpy(), return_inverse=True)
        tot = np.bincount(inv, weights=g["n"].to_numpy().astype(np.float64))
        return pd.DataFrame({"hash": hu[tot >= 2]})

    def read():
        return ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )

    freq = (
        read()
        .map_batches(hash_partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dup_in_part, batch_format="pandas")
    )

    dup_tbl = freq.to_pandas()
    if len(dup_tbl) > max_dup_hashes:
        raise ValueError(
            f"kgram_dup_stats: {len(dup_tbl)} duplicated grams exceed the "
            f"broadcast bound {max_dup_hashes} — dedup the corpus first or "
            "raise max_dup_hashes"
        )
    dup_ref = _ray.put(np.sort(dup_tbl["hash"].to_numpy().astype(np.int64)))

    def count_dups(batch: pa.Table) -> pa.Table:
        dup = _ray.get(dup_ref)
        texts = batch["text"].to_pylist()
        h, local = _window_hashes(texts, k)
        n_win = np.bincount(local, minlength=len(texts))
        if len(dup):
            idx = np.searchsorted(dup, h)
            idx[idx >= len(dup)] = 0
            is_dup = dup[idx] == h
        else:
            is_dup = np.zeros(len(h), bool)
        n_dup = np.bincount(
            local, weights=is_dup.astype(np.float64), minlength=len(texts)
        ).astype(np.int64)
        keep = n_win > 0  # docs shorter than k have no windows (oracle rule)
        return pa.table(
            {
                "doc_id": pa.array(
                    np.asarray(batch["doc_id"])[keep], pa.int64()
                ),
                "n_windows": pa.array(n_win[keep].astype(np.int64), pa.int64()),
                "n_dup": pa.array(n_dup[keep], pa.int64()),
            }
        )

    return read().map_batches(count_dups, batch_format="pyarrow")
