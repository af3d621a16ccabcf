"""Salt-bucket segment searcher: the stateful query-serving unit.

Analog of the reference's in-memory compressed index + per-query decode
(``InvertedIndex.build`` keeps lists compressed, ``getPairs`` decodes on
access — /root/reference/src/main/java/au/edu/rmit/bdm/Torch/base/
invertedIndex/InvertedIndex.java:170-209,138-161) and of its LORS top-k
(EdgeInvertedIndex.java:102-177): rank candidates by upper bound, pop in
bound order, exact-score, terminate when the k-th best beats the next
bound.

One searcher owns one **salt bucket** (a disjoint doc_id range) and loads
that bucket's posting runs from every term shard.  Because all of a doc's
postings share its salt, BM25 scores are bucket-local and exact; the
cross-bucket merge is a simple top-k heap merge (QueryEngine).  Wrapped
in ``ray.remote`` by the engine for distributed serving; usable directly
in-process for tests.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq

from torchtrajectory_ray.functions.codec import (
    concat_aranges,
    delta_decode,
    delta_decode_concat,
    varint_decode,
)
from torchtrajectory_ray.functions.scoring import make_scorer


class SaltSearcher:
    def __init__(
        self,
        index_dir: str,
        salt: int,
        num_term_shards: int,
        num_salts: int,
        avgdl: float,
        k1: float = 1.2,
        b: float = 0.75,
        load_doc_meta: bool = False,
        load_mode: str = "memory",
        salt_shift: int | None = None,
        seg_paths: list[str] | None = None,
        docs_paths: list[str] | None = None,
        scorer: str = "bm25",
        deleted: np.ndarray | None = None,
        position_mode: str = "first",
    ):
        """``load_mode``:

        - "memory" — all of this bucket's compressed runs live in the
          actor heap (decoded per probe, like the reference's
          compressedIndex, InvertedIndex.java:170-209).  Right when a
          bucket's segments fit a serving node.
        - "lazy" — probes read only the probed term's rows from the
          segment parquet via term_id row-group-statistics pushdown
          (segments are written sorted by term_id with small row groups),
          with a per-term cache.  The 10^12-doc path: actor memory stays
          O(hot terms), storage does the lookups.
        """
        self.salt = salt
        self.avgdl = avgdl
        self.k1, self.b = k1, b
        # this bucket's tombstoned doc ids (sorted int64; Lucene-style
        # soft deletes): every query path masks them in _allowed_mask,
        # segments stay immutable, compaction purges them physically
        self.deleted = (
            np.asarray(deleted, dtype=np.int64)
            if deleted is not None and len(deleted)
            else None
        )
        # pluggable similarity measure (scoring.SCORERS); bounds are
        # (max_tf, min_dl) so any registered scorer works on any index
        self.scorer = make_scorer(scorer, k1=k1, b=b)
        self.load_mode = load_mode
        # how pos_blob is encoded ("first" = one int per posting, the
        # reference layout; "full" = every occurrence, Lucene layout) —
        # from the build manifest via the engine
        self.position_mode = position_mode
        # compressed runs: term_id -> list of row dicts (kept compressed,
        # decoded per probe like the reference)
        self.runs: dict[int, list[dict]] = {}
        self._lazy_cache: dict[int, list[dict]] = {}
        self._decoded_cache: dict[int, tuple] = {}
        self._pos_cache: dict[int, tuple] = {}
        self._posfull_cache: dict[int, tuple] = {}
        if seg_paths is None:
            # standalone fallback: discover by glob (base build first, then
            # generations in order — dense doc ordinals grow per
            # generation, so concatenated runs stay doc_id-sorted).  The
            # engine instead passes the MANIFEST's segment list, so a
            # crashed extend's orphan generation files are never served.
            import glob as _glob

            seg_dir = os.path.join(index_dir, "segments")
            seg_paths = []
            for shard in range(num_term_shards):
                seg = shard * num_salts + salt
                for path in [
                    os.path.join(seg_dir, f"seg-{seg:05d}.parquet")
                ] + sorted(
                    _glob.glob(
                        os.path.join(seg_dir, "gen-*", f"seg-{seg:05d}.parquet")
                    )
                ):
                    if os.path.exists(path):
                        seg_paths.append(path)
        self.seg_paths = list(seg_paths)
        if load_mode == "memory":
            for path in self.seg_paths:
                tbl = pq.read_table(path)
                for row in tbl.to_pylist():
                    self.runs.setdefault(row["term_id"], []).append(row)
        # optional doc metadata for predicate filters (lang / warc_ts) —
        # bucket-local, analog of the broadcast timeSpanLookup
        # (TrajectoryResolver.java:250-276) but partitioned, not global
        self.doc_meta: dict | None = None
        self._doc_meta_requested = load_doc_meta
        if load_doc_meta:
            # salt ranges are contiguous doc_id intervals, so the range
            # predicate pushes into the parquet read — each searcher
            # reads ~1/num_salts of the corpus metadata, not all of it
            filters = None
            if salt_shift is not None:
                lo = salt << salt_shift
                filters = [("doc_id", ">=", lo)]
                if salt < num_salts - 1:  # tail bucket is open-ended (clamp)
                    filters.append(("doc_id", "<", (salt + 1) << salt_shift))
            if docs_paths is None:
                # standalone fallback: walk docs/ (the engine instead
                # passes the MANIFEST's docs shard list so stale/orphan
                # shards are never read — same rule as seg_paths)
                docs_dir = os.path.join(index_dir, "docs")
                docs_paths = sorted(
                    os.path.join(root, p)
                    for root, _, files in os.walk(docs_dir)
                    for p in files
                    if p.endswith(".parquet")
                )
            metas = [
                pq.read_table(
                    p, columns=["doc_id", "lang", "warc_ts"], filters=filters
                )
                for p in docs_paths
            ]
            if metas:
                import pyarrow as pa

                t = pa.concat_tables(metas)
                ids = t["doc_id"].to_numpy().astype(np.int64)
                order = np.argsort(ids, kind="stable")
                ts = t["warc_ts"].cast("int64").to_numpy(zero_copy_only=False)
                self.doc_meta = {
                    "doc_id": ids[order],
                    "lang": np.asarray(t["lang"].to_pylist(), dtype=object)[order],
                    "ts": ts[order],
                }

    def set_params(
        self,
        k1: float | None = None,
        b: float | None = None,
        scorer: str | None = None,
        avgdl: float | None = None,
    ) -> bool:
        """Runtime scoring swap (params AND measure) — valid because
        segment bound metadata is (max_tf, min_dl), independent of any
        scorer; nothing cached depends on the measure (decoded postings
        are raw tf/doclen).  ``avgdl`` overrides the corpus statistic —
        the global-statistics hook for federated search across indexes
        (bounds stay valid: block metadata is avgdl-independent and the
        serving bound is recomputed under the override)."""
        if k1 is not None:
            self.k1 = float(k1)
        if b is not None:
            self.b = float(b)
        if avgdl is not None:
            self.avgdl = float(avgdl)
        if scorer is not None:
            self.scorer = make_scorer(scorer, k1=self.k1, b=self.b)
        else:
            self.scorer.set_params(k1=k1, b=b)
        return True

    _LAZY_CACHE_MAX = 4096

    def _rows(self, term_id: int) -> list[dict]:
        if self.load_mode == "memory":
            return self.runs.get(term_id, [])
        hit = self._lazy_cache.get(term_id)
        if hit is not None:
            return hit
        rows: list[dict] = []
        for p in self.seg_paths:
            t = pq.read_table(p, filters=[("term_id", "==", term_id)])
            rows.extend(t.to_pylist())
        if len(self._lazy_cache) >= self._LAZY_CACHE_MAX:
            self._lazy_cache.clear()  # simple epoch eviction
        self._lazy_cache[term_id] = rows
        return rows

    # --- posting access (J1: the fundamental probe) ---

    _DECODED_CACHE_MAX = 128

    def postings(self, term_id: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decoded (doc_ids, tfs, doclens) for a term in this bucket,
        runs concatenated in salt order (single salt here → ≤1 run).
        Hot terms stay decoded in a small cache — the reference decodes
        per probe (InvertedIndex.java:138-148); with 10^6-posting head
        terms the decode dominates query latency, so serving caches it."""
        hit = self._decoded_cache.get(term_id)
        if hit is not None:
            return hit
        rows = self._rows(term_id)
        if not rows:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        ids = np.concatenate([delta_decode(r["doc_ids_blob"], r["df"]) for r in rows])
        tfs = np.concatenate([varint_decode(r["tfs_blob"], r["df"]) for r in rows])
        dls = np.concatenate([varint_decode(r["doclens_blob"], r["df"]) for r in rows])
        if len(self._decoded_cache) >= self._DECODED_CACHE_MAX:
            self._decoded_cache.clear()  # simple epoch eviction
        self._decoded_cache[term_id] = (ids, tfs, dls)
        return ids, tfs, dls

    def term_doc_stats(
        self, term_id: int, want: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, tfs, doclens) of this bucket's postings restricted
        to the SORTED ``want`` doc-id array — the per-doc raw statistics
        behind a score explanation (Lucene Explanation.describe shape);
        cost is one postings decode + a searchsorted mask."""
        ids, tfs, dls = self.postings(term_id)
        if ids.size == 0 or want.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        j = np.clip(np.searchsorted(want, ids), 0, want.size - 1)
        m = want[j] == ids
        return ids[m], tfs[m], dls[m]

    def postings_pos(self, term_id: int) -> tuple[np.ndarray, np.ndarray]:
        """(doc_ids, first_positions) — requires store_positions=True.
        Works on both position modes (under "full" the first occurrence
        is each posting's first stored position).  Cached like
        :meth:`postings` (same decode-dominates argument)."""
        hit = self._pos_cache.get(term_id)
        if hit is not None:
            return hit
        if self.position_mode == "full":
            ids, offsets, pos_flat = self.positions_full(term_id)
            first = pos_flat[offsets[:-1]] if ids.size else pos_flat
            if len(self._pos_cache) >= self._DECODED_CACHE_MAX:
                self._pos_cache.clear()
            self._pos_cache[term_id] = (ids, first)
            return ids, first
        rows = self._rows(term_id)
        if not rows:
            e = np.empty(0, dtype=np.int64)
            return e, e
        if any(len(r["pos_blob"]) == 0 and r["df"] > 0 for r in rows):
            raise ValueError(
                "index was built without store_positions=True; phrase "
                "queries need the position payload"
            )
        ids = np.concatenate([delta_decode(r["doc_ids_blob"], r["df"]) for r in rows])
        pos = np.concatenate([varint_decode(r["pos_blob"], r["df"]) for r in rows])
        if len(self._pos_cache) >= self._DECODED_CACHE_MAX:
            self._pos_cache.clear()
        self._pos_cache[term_id] = (ids, pos)
        return ids, pos

    def positions_full(
        self, term_id: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(doc_ids, offsets, pos_flat) — EVERY occurrence position of the
        term in this bucket (``position_mode="full"`` indexes only).
        ``pos_flat[offsets[i]:offsets[i+1]]`` is doc ``doc_ids[i]``'s
        ascending position list.  Generations concatenate transparently:
        the delta coding restarts at every posting, so joined blobs
        decode in one pass segmented by the tf array."""
        if self.position_mode != "full":
            raise ValueError(
                "positions_full requires an index built with "
                "store_positions=True, position_mode='full' (this index "
                f"is {self.position_mode!r}); use the forward-index "
                "verification path instead"
            )
        hit = self._posfull_cache.get(term_id)
        if hit is not None:
            return hit
        rows = self._rows(term_id)
        if not rows:
            e = np.empty(0, dtype=np.int64)
            return e, np.zeros(1, dtype=np.int64), e
        ids = np.concatenate([delta_decode(r["doc_ids_blob"], r["df"]) for r in rows])
        tfs = np.concatenate([varint_decode(r["tfs_blob"], r["df"]) for r in rows])
        pos_flat = delta_decode_concat([r["pos_blob"] for r in rows], tfs)
        offsets = np.concatenate(([0], np.cumsum(tfs)))
        if len(self._posfull_cache) >= self._DECODED_CACHE_MAX:
            self._posfull_cache.clear()
        self._posfull_cache[term_id] = (ids, offsets, pos_flat)
        return ids, offsets, pos_flat

    _ORD_SHIFT = 32  # composite verify key = candidate ordinal << 32 | pos

    def _cand_positions(
        self, per: dict[int, tuple], cand: np.ndarray
    ) -> dict[int, tuple[np.ndarray, np.ndarray]]:
        """Per term: (tf per candidate doc, flat positions of the
        candidates only), candidates in ``cand``'s (sorted) order."""
        out = {}
        for tid, (ids, offsets, pos_flat) in per.items():
            sel = np.searchsorted(ids, cand)  # every cand is present
            tf_sel = (offsets[sel + 1] - offsets[sel]).astype(np.int64)
            gather = np.repeat(offsets[sel], tf_sel) + concat_aranges(tf_sel)
            out[tid] = (tf_sel, pos_flat[gather])
        return out

    def _pos_candidates(self, term_ids: list[int]) -> tuple:
        """(unique ids, per-term positions_full, sorted candidate array =
        docs containing ALL unique terms) — shared entry of the three
        positional verifiers."""
        uniq = list(dict.fromkeys(term_ids))
        per = {t: self.positions_full(t) for t in uniq}
        empty = np.empty(0, dtype=np.int64)
        if any(per[t][0].size == 0 for t in uniq):
            return uniq, per, empty
        cand = per[uniq[0]][0]
        for t in uniq[1:]:
            cand = cand[
                np.isin(cand, per[t][0], assume_unique=True)
            ]
            if cand.size == 0:
                return uniq, per, empty
        return uniq, per, cand

    def phrase_pos(
        self, term_ids: list[int], lang=None, ts_lo=None, ts_hi=None
    ) -> np.ndarray:
        """EXACT index-only phrase matching over full positional postings
        (repeated terms and non-first occurrences included — the Lucene
        PhraseQuery semantics, no forward-index read).  Candidates =
        docs containing all unique terms; verification is one vectorized
        composite-key membership pass per query term: an occurrence key
        is ``ordinal<<32 | position``, and a phrase start survives iff
        ``key + j`` exists in term j's key set for every j."""
        cand, keys = self._occ_keys(term_ids)
        if cand.size == 0:
            return cand
        k0 = keys[term_ids[0]]
        # the chain adds up to len-1 to the position field; a position
        # within len-1 of 2^32 would carry into the ordinal field and
        # could match the NEXT candidate doc's first occurrence
        # (_occ_keys guards raw positions; this guards the arithmetic)
        if k0.size and int(
            (k0 & ((1 << self._ORD_SHIFT) - 1)).max()
        ) >= (1 << self._ORD_SHIFT) - len(term_ids):
            raise ValueError("document position too large for phrase keys")
        alive = np.ones(k0.size, dtype=bool)
        for j, tid in enumerate(term_ids[1:], 1):
            kj = keys[tid]
            idx = np.searchsorted(kj, k0 + j)
            inb = idx < kj.size
            idx = np.minimum(idx, kj.size - 1)
            alive &= inb & (kj[idx] == k0 + j)
        hits = cand[np.unique(k0[alive] >> self._ORD_SHIFT)]
        return hits[self._allowed_mask(hits, lang, ts_lo, ts_hi)]

    def _occ_keys(self, term_ids: list[int]) -> tuple:
        """Shared verifier entry: (candidate array, composite occurrence
        keys ``ordinal<<32 | position`` per unique term — sorted, since
        ordinals ascend and positions ascend within a doc)."""
        uniq, per, cand = self._pos_candidates(term_ids)
        if cand.size == 0:
            return cand, {}
        cp = self._cand_positions(per, cand)
        ords = np.arange(cand.size, dtype=np.int64)
        keys = {}
        for t in set(term_ids):
            tf_sel, pos_sel = cp[t]
            if pos_sel.size and int(pos_sel.max()) >= (1 << self._ORD_SHIFT):
                raise ValueError("document position exceeds 2^32")
            keys[t] = (np.repeat(ords, tf_sel) << self._ORD_SHIFT) | pos_sel
        return cand, keys

    def span_pos(
        self, term_ids: list[int], window: int, lang=None, ts_lo=None, ts_hi=None
    ) -> np.ndarray:
        """Ordered proximity (span-near in-order) straight from full
        positional postings — the greedy earliest chain of the
        forward-index route (``functions.proximity.span_chain_ok``, the
        per-start greedy is optimal for a fixed start) vectorized across
        ALL candidate docs at once: occurrences become composite
        ``ordinal<<32|pos`` keys, each chain step is one searchsorted
        over the next term's key array, and staying inside the doc is
        one ordinal-equality mask (route identity is pytest- and
        driver-gated against the text route)."""
        cand, keys = self._occ_keys(term_ids)
        if cand.size == 0:
            return cand
        starts = keys[term_ids[0]]
        f = starts
        alive = np.ones(starts.size, dtype=bool)
        for tid in term_ids[1:]:
            kj = keys[tid]
            idx = np.searchsorted(kj, f, side="right")  # strictly after f
            inb = idx < kj.size
            idx = np.minimum(idx, kj.size - 1)
            nxt = kj[idx]
            alive &= inb & ((nxt >> self._ORD_SHIFT) == (f >> self._ORD_SHIFT))
            f = nxt
        ok = alive & ((f - starts) <= window - 1)  # same ord ⇒ key Δ = pos Δ
        hits = cand[np.unique(starts[ok] >> self._ORD_SHIFT)]
        return hits[self._allowed_mask(hits, lang, ts_lo, ts_hi)]

    def near_pos(
        self, term_ids: list[int], window: int, lang=None, ts_lo=None, ts_hi=None
    ) -> np.ndarray:
        """Unordered proximity (NEAR/WITHIN) from full positional
        postings, vectorized across all candidate docs.  A covering
        window exists iff some occurrence x0 (of ANY query term — the
        leftmost one inside the window) has every term's next occurrence
        ≥ x0 within x0 + window - 1, so each unique term costs ONE
        searchsorted over the merged start set (equivalence with the
        text route's minimal-cover sweep is pytest- and driver-gated)."""
        cand, keys = self._occ_keys(term_ids)
        if cand.size == 0:
            return cand
        uniq = list(dict.fromkeys(term_ids))
        starts = np.sort(np.concatenate([keys[t] for t in uniq]))
        ok = np.ones(starts.size, dtype=bool)
        for tid in uniq:
            kt = keys[tid]
            idx = np.searchsorted(kt, starts, side="left")  # first ≥ start
            inb = idx < kt.size
            idx = np.minimum(idx, kt.size - 1)
            nt = kt[idx]
            ok &= (
                inb
                & ((nt >> self._ORD_SHIFT) == (starts >> self._ORD_SHIFT))
                & ((nt - starts) <= window - 1)
            )
        hits = cand[np.unique(starts[ok] >> self._ORD_SHIFT)]
        return hits[self._allowed_mask(hits, lang, ts_lo, ts_hi)]

    def phrase_and(
        self, term_ids: list[int], lang=None, ts_lo=None, ts_hi=None
    ) -> np.ndarray:
        """Docs where the terms' FIRST positions are consecutive in query
        order (position-payload phrase matching; exact when each term
        occurs once per doc)."""
        parts = [self.postings_pos(t) for t in term_ids]
        if not parts or any(len(p[0]) == 0 for p in parts):
            return np.empty(0, dtype=np.int64)
        base_ids, base_pos = parts[0]
        ok = np.ones(len(base_ids), dtype=bool)
        for i, (ids, pos) in enumerate(parts[1:], 1):
            j = np.searchsorted(ids, base_ids)
            j = np.clip(j, 0, len(ids) - 1)
            ok &= (ids[j] == base_ids) & (pos[j] == base_pos + i)
        cand = base_ids[ok]
        return cand[self._allowed_mask(cand, lang, ts_lo, ts_hi)]

    def _allowed_mask(self, ids: np.ndarray, lang, ts_lo, ts_hi) -> np.ndarray:
        ok = np.ones(len(ids), dtype=bool)
        if self.deleted is not None:
            pos = np.clip(
                np.searchsorted(self.deleted, ids), 0, len(self.deleted) - 1
            )
            ok &= self.deleted[pos] != ids
        if lang is None and ts_lo is None and ts_hi is None:
            return ok
        if self.doc_meta is None:
            if self._doc_meta_requested:
                raise ValueError(
                    "doc metadata was requested but no docs/ parquet shards "
                    "exist in this index — cannot apply lang/ts filters"
                )
            raise ValueError(
                "lang/ts predicate filters require the engine to be opened "
                "with load_doc_meta=True"
            )
        m = self.doc_meta
        pos = np.searchsorted(m["doc_id"], ids)
        pos = np.clip(pos, 0, len(m["doc_id"]) - 1)
        ok &= m["doc_id"][pos] == ids
        if lang is not None:
            ok &= m["lang"][pos] == lang
        if ts_lo is not None:
            ok &= m["ts"][pos] >= ts_lo
        if ts_hi is not None:
            ok &= m["ts"][pos] <= ts_hi
        return ok

    # --- boolean algebra (findByPath:52-62 / findByStrictPath:65-89) ---

    def bool_or(self, term_ids: list[int], lang=None, ts_lo=None, ts_hi=None) -> np.ndarray:
        parts = [self.postings(t)[0] for t in term_ids]
        if not parts:
            return np.empty(0, dtype=np.int64)
        ids = np.unique(np.concatenate(parts))
        return ids[self._allowed_mask(ids, lang, ts_lo, ts_hi)]

    def bool_and(self, term_ids: list[int], lang=None, ts_lo=None, ts_hi=None) -> np.ndarray:
        """Intersection via counting, exactly the reference's shape:
        candidate count == number of distinct query terms."""
        uniq = sorted(set(term_ids))
        parts = [self.postings(t)[0] for t in uniq]
        if not parts or any(len(p) == 0 for p in parts):
            return np.empty(0, dtype=np.int64)
        allc = np.concatenate(parts)
        ids, counts = np.unique(allc, return_counts=True)
        ids = ids[counts == len(uniq)]
        return ids[self._allowed_mask(ids, lang, ts_lo, ts_hi)]

    def count_match(
        self, term_ids: list[int], mode: str, lang=None, ts_lo=None, ts_hi=None
    ) -> int:
        """Bucket-local match COUNT (OR/AND) — the hit-total collector:
        only one integer crosses the bucket boundary (buckets are
        disjoint doc ranges, so the engine's total is a plain sum)."""
        ids = (
            self.bool_or(term_ids, lang, ts_lo, ts_hi)
            if mode == "or"
            else self.bool_and(term_ids, lang, ts_lo, ts_hi)
        )
        return int(ids.size)

    def bool_min_match(
        self, term_ids: list[int], m: int, lang=None, ts_lo=None, ts_hi=None
    ) -> np.ndarray:
        """At-least-``m``-of-n boolean (Lucene minimum_should_match):
        the same counting intersection as ``bool_and`` with the count
        threshold relaxed from n to ``m`` — m=1 is OR, m=n is AND."""
        uniq = sorted(set(term_ids))
        parts = [p for t in uniq if len(p := self.postings(t)[0])]
        if len(parts) < m:
            return np.empty(0, dtype=np.int64)
        allc = np.concatenate(parts)
        ids, counts = np.unique(allc, return_counts=True)
        ids = ids[counts >= m]
        return ids[self._allowed_mask(ids, lang, ts_lo, ts_hi)]

    def bool_and_not(
        self,
        include_tids: list[int],
        exclude_tids: list[int],
        lang=None,
        ts_lo=None,
        ts_hi=None,
    ) -> np.ndarray:
        """AND of the includes minus the union of the excludes —
        bucket-local subtraction is globally correct because a doc's
        postings for every term live in its one salt bucket."""
        keep = self.bool_and(include_tids, lang, ts_lo, ts_hi)
        if keep.size == 0 or not exclude_tids:
            return keep
        parts = [self.postings(t)[0] for t in exclude_tids]
        excl = np.unique(np.concatenate(parts)) if parts else None
        if excl is None or excl.size == 0:
            return keep
        return keep[~np.isin(keep, excl)]

    # --- BM25 top-k ---

    def topk(
        self,
        term_ids: list[int],
        idfs: list[float],
        k: int,
        method: str = "wand",
        lang=None,
        ts_lo=None,
        ts_hi=None,
        require_all: bool = False,
        after: tuple | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Bucket-local BM25 top-k → (doc_ids, scores), unsorted length ≤ k.

        Deterministic float accumulation: contributions are added in
        ascending term_id order in both methods, so ``wand`` and
        ``exhaustive`` produce bit-identical scores.

        ``require_all`` scores ONLY docs containing every query term
        (ranked conjunctive retrieval) — valid bucket-locally because a
        doc's postings for all terms live in its one salt bucket.

        ``after=(doc_id, score)`` — a result row of a previous page —
        keeps only docs STRICTLY after the cursor in (score desc,
        doc_id asc) order — cursor pagination
        (Lucene searchAfter).  Exact because scoring is bit-deterministic,
        so a cursor from a previous page compares equal bitwise; forces
        exhaustive bucket scoring (WAND's threshold prunes from above,
        the wrong side of a cursor).
        """
        if after is not None:
            method = "exhaustive"
        order = np.argsort(np.asarray(term_ids, dtype=np.int64), kind="stable")
        tids = [term_ids[i] for i in order]
        ws = [idfs[i] for i in order]
        posts = []
        for tid, w in zip(tids, ws):
            ids, tfs, dls = self.postings(tid)
            if len(ids):
                posts.append((tid, w, ids, tfs, dls))
        empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if not posts:
            return empty
        if require_all and len(posts) < len(set(tids)):
            return empty  # a term with no postings in this bucket
        if method == "exhaustive":
            return self._topk_exhaustive(
                posts, k, lang, ts_lo, ts_hi, require_all, after
            )
        return self._topk_wand(posts, k, lang, ts_lo, ts_hi, require_all)

    def doc_term_stats(
        self, term_ids: list[int], doc_id: int
    ) -> list[tuple[int, int, int]]:
        """(term_id, tf, doclen) for each query term whose posting list
        in this bucket contains ``doc_id`` — the explain probe: one
        binary search per term, no scoring.  Tombstoned docs return
        nothing (they can't appear in any result, so they have no
        explanation)."""
        arr = np.asarray([doc_id], dtype=np.int64)
        if not self._allowed_mask(arr, None, None, None)[0]:
            return []
        out = []
        for tid in sorted(term_ids):
            ids, tfs, dls = self.postings(tid)
            if len(ids):
                i = int(np.searchsorted(ids, doc_id))
                if i < len(ids) and ids[i] == doc_id:
                    out.append((int(tid), int(tfs[i]), int(dls[i])))
        return out

    def topk_groups(
        self,
        group_tids: list[list[int]],
        weights: list[float],
        k: int,
        lang=None,
        ts_lo=None,
        ts_hi=None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Synonym-group scoring (the Lucene SynonymQuery shape): each
        group scores as ONE pseudo-term — per-doc tf is the SUM of the
        member tfs, the group weight (idf of the max member df) comes in
        via ``weights``.  Exhaustive scoring on purpose: block metadata
        stores per-TERM bounds, and a summed-tf pseudo-term's bound is
        not derivable from them without over-pruning risk; the candidate
        set stays bucket-local.  A single-member group degenerates to
        the plain term."""
        posts = []
        for tids, w in zip(group_tids, weights):
            ids_parts, tf_parts, dl_parts = [], [], []
            for tid in sorted(tids):
                ids, tfs, dls = self.postings(tid)
                if len(ids):
                    ids_parts.append(ids)
                    tf_parts.append(tfs.astype(np.float64))
                    dl_parts.append(dls)
            if not ids_parts:
                continue
            allids = np.concatenate(ids_parts)
            uniq, inv = np.unique(allids, return_inverse=True)
            tfsum = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(tfsum, inv, np.concatenate(tf_parts))
            dl = np.zeros(len(uniq), dtype=np.int64)
            dl[inv] = np.concatenate(dl_parts)  # doclen is per doc
            posts.append((None, w, uniq, tfsum, dl))
        if not posts:
            return (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        return self._topk_exhaustive(posts, k, lang, ts_lo, ts_hi)

    def collapse_topk(
        self,
        term_ids: list[int],
        idfs: list[float],
        lang=None,
        ts_lo=None,
        ts_hi=None,
    ) -> tuple[list, np.ndarray, np.ndarray]:
        """Bucket-local field collapsing: exhaustively score every OR
        candidate, then keep only the best-scoring doc per ``lang`` group
        — (6-dp-rounded score desc, doc_id asc) within the group, the
        same float-stable protocol as the topk gates.  Returns parallel
        (group values, doc_ids, scores); docs with a null group drop out.

        Exhaustive (not WAND) on purpose: a collapsed ranking needs each
        group's true maximum, and per-group upper bounds aren't tracked
        in the block metadata — the candidate set is bucket-local so the
        scan stays bounded."""
        if self.doc_meta is None:
            raise ValueError(
                "collapse_topk requires the engine to be opened with "
                "load_doc_meta=True"
            )
        order = np.argsort(np.asarray(term_ids, dtype=np.int64), kind="stable")
        posts = []
        for i in order:
            ids, tfs, dls = self.postings(term_ids[i])
            if len(ids):
                posts.append((idfs[i], ids, tfs, dls))
        empty = ([], np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64))
        if not posts:
            return empty
        uniq = np.unique(np.concatenate([p[1] for p in posts]))
        scores = np.zeros(len(uniq), dtype=np.float64)
        for w, ids, tfs, dls in posts:
            idx = np.searchsorted(uniq, ids)
            np.add.at(scores, idx, w * self.scorer.tf_norm(tfs, dls, self.avgdl))
        ok = self._allowed_mask(uniq, lang, ts_lo, ts_hi)
        uniq, scores = uniq[ok], scores[ok]
        if not len(uniq):
            return empty
        m = self.doc_meta
        pos = np.searchsorted(m["doc_id"], uniq)  # all candidates are local
        groups = m["lang"][pos]
        valid = np.fromiter((g is not None for g in groups), bool, len(groups))
        uniq, scores, groups = uniq[valid], scores[valid], groups[valid]
        if not len(uniq):
            return empty
        scores = np.round(scores, 6)
        # best per group: sort (group asc, score desc, doc_id asc), take
        # the first row of each group run
        sel = np.lexsort((uniq, -scores, groups))
        g_sorted = groups[sel]
        first = np.ones(len(sel), dtype=bool)
        first[1:] = g_sorted[1:] != g_sorted[:-1]
        keep = sel[first]
        return groups[keep].tolist(), uniq[keep], scores[keep]

    @staticmethod
    def _conjunctive(posts) -> np.ndarray:
        """Docs present in EVERY posting list (the bool_and count
        intersection, reused by ranked-AND)."""
        ids, counts = np.unique(
            np.concatenate([p[2] for p in posts]), return_counts=True
        )
        return ids[counts == len(posts)]

    def _topk_exhaustive(
        self, posts, k, lang, ts_lo, ts_hi, require_all=False, after=None
    ):
        if require_all:
            uniq = self._conjunctive(posts)
            if not len(uniq):
                return uniq, np.empty(0, dtype=np.float64)
        else:
            uniq = np.unique(np.concatenate([p[2] for p in posts]))
        scores = np.zeros(len(uniq), dtype=np.float64)
        for _, w, ids, tfs, dls in posts:
            idx = np.searchsorted(uniq, ids)
            if require_all:  # uniq is a subset: drop non-members
                idx = np.clip(idx, 0, len(uniq) - 1)
                hit = uniq[idx] == ids
                idx, tfs, dls = idx[hit], tfs[hit], dls[hit]
            np.add.at(scores, idx, w * self.scorer.tf_norm(tfs, dls, self.avgdl))
        ok = self._allowed_mask(uniq, lang, ts_lo, ts_hi)
        uniq, scores = uniq[ok], scores[ok]
        if after is not None:
            d_a, s_a = int(after[0]), float(after[1])
            keep = (scores < s_a) | ((scores == s_a) & (uniq > d_a))
            uniq, scores = uniq[keep], scores[keep]
        if len(uniq) > k:
            # top-k by (score desc, doc_id asc)
            sel = np.lexsort((uniq, -scores))[:k]
            return uniq[sel], scores[sel]
        return uniq, scores

    def _topk_wand(self, posts, k, lang, ts_lo, ts_hi, require_all=False):
        """LORS-shaped upper-bound pruning (EdgeInvertedIndex.java:102-177)
        with block-max bounds: accumulate per-candidate upper bounds from
        per-block maxima, visit candidates in bound-descending order,
        exact-score each, stop when bestKth ≥ next upper bound."""
        cand = (
            self._conjunctive(posts)
            if require_all
            else np.unique(np.concatenate([p[2] for p in posts]))
        )
        if not len(cand):
            return cand, np.empty(0, dtype=np.float64)
        ub = np.zeros(len(cand), dtype=np.float64)
        for tid, w, ids, tfs, dls in posts:
            rows = self._rows(tid)
            # per-posting block-max bound (tighter than idf·(k1+1))
            off = 0
            for r in rows:
                n = r["df"]
                blk_last = np.asarray(r["blk_last"], dtype=np.int64)
                blk_max = self.scorer.tf_norm(
                    np.asarray(r["blk_max_tf"], dtype=np.int64),
                    np.asarray(r["blk_min_dl"], dtype=np.int64),
                    self.avgdl,
                )
                seg_ids = ids[off : off + n]
                blk_of = np.searchsorted(blk_last, seg_ids)
                idx = np.searchsorted(cand, seg_ids)
                bm = blk_max[np.minimum(blk_of, len(blk_max) - 1)]
                if require_all:  # cand is a subset: drop non-members
                    idx = np.clip(idx, 0, len(cand) - 1)
                    hit = cand[idx] == seg_ids
                    idx, bm = idx[hit], bm[hit]
                ub[idx] += w * bm
                off += n
        ok = self._allowed_mask(cand, lang, ts_lo, ts_hi)
        cand, ub = cand[ok], ub[ok]
        if len(cand) == 0:
            return cand, ub
        # visit in (ub desc, doc_id asc) order — the candidate heap — in
        # vectorized chunks: a chunk is exact-scored in one pass per term,
        # then the LORS termination check runs against the NEXT chunk's
        # best bound (bestKth ≥ every later bound ⇒ stop).  Same pruning
        # semantics as the per-candidate loop, ~100× fewer Python steps.
        visit = np.lexsort((cand, -ub))
        # geometric chunk growth: when bounds prune well the first small
        # chunks terminate cheaply; when they don't (uniform scores), the
        # loop degrades gracefully into ~O(log n) vectorized passes over
        # everything instead of n/CH small ones
        CH = max(k, 512)
        out_ids: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        n_scored = 0
        kth = -np.inf
        c0 = 0
        while c0 < len(visit):
            # STRICT inequality (the reference's `bestKth > upperBound`
            # break, EdgeInvertedIndex.java:160): a candidate whose bound
            # ties the kth score can still tie exactly and win the
            # (score desc, doc_id asc) tie-break, so it must be scored
            if n_scored >= k and ub[visit[c0]] < kth:
                break
            chunk = visit[c0 : c0 + CH]
            c0 += CH
            CH *= 4
            d = cand[chunk]
            order = np.argsort(d, kind="stable")
            d_sorted = d[order]
            s = np.zeros(len(d_sorted), dtype=np.float64)
            for _, w, ids, tfs, dls in posts:
                j = np.searchsorted(ids, d_sorted)
                j = np.clip(j, 0, len(ids) - 1)
                hit = ids[j] == d_sorted
                if hit.any():
                    s[hit] += w * self.scorer.tf_norm(
                        tfs[j[hit]], dls[j[hit]], self.avgdl
                    )
            out_ids.append(d_sorted)
            out_scores.append(s)
            n_scored += len(d_sorted)
            if n_scored >= k:
                allsc = np.concatenate(out_scores)
                kth = np.partition(allsc, len(allsc) - k)[len(allsc) - k]
        ids_arr = np.concatenate(out_ids)
        sc_arr = np.concatenate(out_scores)
        if len(ids_arr) > k:
            sel = np.lexsort((ids_arr, -sc_arr))[:k]
            return ids_arr[sel], sc_arr[sel]
        return ids_arr, sc_arr
