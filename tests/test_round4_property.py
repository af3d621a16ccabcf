"""Property tests for the round-4 kernels:

- the PPJoin positional filter must never drop a qualifying pair: the
  whole prefix-filter pipeline (prefix rows → positional prune → pair
  expansion → exact verification) equals brute-force all-pairs Jaccard
  on ARBITRARY small corpora and thresholds;
- the branch-and-bound exact probe's admissible bound: for random
  vectors and centroids, cos(max(0, θ(q,c) − r_c)) really upper-bounds
  every member's cosine similarity;
- dhash64 monotone-map invariance on arbitrary images;
- hash-to-min components equal brute-force transitive closure on
  arbitrary pair graphs (pure-python mirror of the distributed step).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from torchtrajectory_ray.pipelines import dedup
from torchtrajectory_ray.stages import multimodal as mm

VOCAB = ["a", "b", "c", "d", "e"]


@st.composite
def corpus(draw):
    n = draw(st.integers(2, 8))
    docs = [
        " ".join(
            draw(st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12))
        )
        for _ in range(n)
    ]
    return docs


def _jacc(a: str, b: str, k: int = 3) -> float:
    sa = set(dedup._shingle_strings(a.split(" "), k))
    sb = set(dedup._shingle_strings(b.split(" "), k))
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


@given(corpus(), st.sampled_from([0.3, 0.5, 0.7, 0.9]))
@settings(max_examples=60, deadline=None)
def test_prefix_positional_filter_is_lossless(docs, thr):
    """In-process mirror of the pipeline stages (no Ray): prefix rows at
    the threshold → length filter → expansion → the PPJoin pair reduce
    (accumulating positional + region bounds) must retain EVERY
    brute-force qualifying pair."""
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    rows = dedup._prefix_rows_task(tbl, threshold=thr, k=3, freq_rank={})
    expand = dedup._PrefixGroupPairs(thr, max_group=4096)
    occ = expand(rows)
    cand = dedup._PPJoinPairReduce(thr)(occ)
    cand_set = set(map(tuple, cand[["doc_a", "doc_b"]].to_numpy()))
    import itertools

    for a, b in itertools.combinations(range(len(docs)), 2):
        if _jacc(docs[a], docs[b]) >= thr:
            assert (a, b) in cand_set, (docs[a], docs[b], thr)


def test_ppjoin_region_bound_kills_single_collision_pair():
    """A size-compatible pair sharing exactly ONE prefix shingle at
    position 0 (the old positional bound's blind spot: bound ≈ full
    size passes it to verification): the REGION bound
    c + |S|−p of the smaller-prefix-max side must prune it.  Hand-built
    occurrence rows drive the reduce deterministically; t = 0.7,
    |Sa| = |Sb| = 40 → p = 13, need = 0.7/1.7·80 ≈ 32.9, positional
    bound = 1 + min(39, 39) = 40 (passes), region = 1 + 40 − 13 = 28
    (prunes)."""
    import pandas as pd

    one = pd.DataFrame(
        {
            "doc_a": [0],
            "doc_b": [1],
            "sa": [40],
            "sb": [40],
            "pa": [0],
            "pb": [0],
            "qfa": [0],
            "qva": [500],
            "qfb": [0],
            "qvb": [900],
        }
    )
    assert len(dedup._PPJoinPairReduce(0.7)(one)) == 0
    # same pair but with a FULL shared prefix chain (c = 13 shared
    # prefix shingles, the near-dup shape): both bounds pass
    c = 13
    chain = pd.DataFrame(
        {
            "doc_a": 0,
            "doc_b": 1,
            "sa": 40,
            "sb": 40,
            "pa": range(c),
            "pb": range(c),
            "qfa": 0,
            "qva": 500,
            "qfb": 0,
            "qvb": 900,
        }
    )
    kept = dedup._PPJoinPairReduce(0.7)(chain)
    assert list(map(tuple, kept.to_numpy())) == [(0, 1)]


@given(st.integers(0, 10_000), st.integers(2, 24))
@settings(max_examples=40, deadline=None)
def test_exact_probe_bound_is_admissible(seed, dim):
    """cos(max(0, θ(q,c) − r)) ≥ sim(q, x) for every member x whose
    angle to the (normalized) centroid is ≤ r."""
    rng = np.random.default_rng(seed)
    c = rng.normal(size=dim)
    c /= np.linalg.norm(c)
    q = rng.normal(size=dim)
    q /= np.linalg.norm(q)
    members = rng.normal(size=(16, dim))
    members /= np.linalg.norm(members, axis=1, keepdims=True)
    ang = np.arccos(np.clip(members @ c, -1.0, 1.0))
    r = float(ang.max())
    theta = float(np.arccos(np.clip(q @ c, -1.0, 1.0)))
    bound = np.cos(max(0.0, theta - r))
    sims = members @ q
    assert (sims <= bound + 1e-9).all()


@given(st.integers(0, 10_000), st.integers(4, 40), st.integers(4, 40))
@settings(max_examples=40, deadline=None)
def test_dhash_monotone_invariance(seed, h, w):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 200, size=(h, w, 3), dtype=np.uint8)
    h0 = mm.dhash64(img)
    # any strictly monotone pixel map preserves the hash
    assert mm.dhash64(img.astype(np.int32) * 2 + 7) == h0
    assert mm.dhash64(np.minimum(img.astype(np.int32) + 31, 255)) == h0


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=60, deadline=None)
def test_hash_to_min_step_converges_to_closure(raw_pairs):
    """The vectorized hash-to-min step (the exact per-partition kernel
    the Dataset rounds run) iterated to fixpoint labels every node with
    its component minimum."""
    pairs = [(a, b) for a, b in raw_pairs if a != b]
    if not pairs:
        return
    a = np.array([p[0] for p in pairs], dtype=np.int64)
    b = np.array([p[1] for p in pairs], dtype=np.int64)
    node = np.concatenate((a, b))
    member = np.concatenate((b, a))

    def step(node, member):
        uniq = np.unique(node)
        node = np.concatenate((node, uniq))
        member = np.concatenate((member, uniq))
        order = np.lexsort((member, node))
        node, member = node[order], member[order]
        keep = np.concatenate(
            ([True], (node[1:] != node[:-1]) | (member[1:] != member[:-1]))
        )
        node, member = node[keep], member[keep]
        heads = np.concatenate(([0], np.flatnonzero(node[1:] != node[:-1]) + 1))
        mins = member[heads]
        counts = np.diff(np.concatenate((heads, [len(node)])))
        m_rep = np.repeat(mins, counts)
        return (
            np.concatenate((member, m_rep)),
            np.concatenate((m_rep, member)),
        )

    prev = None
    for _ in range(64):
        node, member = step(node, member)
        order = np.lexsort((member, node))
        sig = (
            len(node),
            int((node[order] * np.int64(1_000_003) ^ member[order]).sum()),
        )
        if sig == prev:
            break
        prev = sig
    got = {}
    order = np.lexsort((member, node))
    n2, m2 = node[order], member[order]
    heads = np.concatenate(([0], np.flatnonzero(n2[1:] != n2[:-1]) + 1))
    for h_, mn in zip(n2[heads], m2[heads]):
        got[int(h_)] = min(got.get(int(h_), int(h_)), int(mn))
    # brute force closure
    lab = {}
    for x, y in pairs:
        lab.setdefault(x, x)
        lab.setdefault(y, y)
    changed = True
    while changed:
        changed = False
        for x, y in pairs:
            mn = min(lab[x], lab[y])
            if lab[x] != mn or lab[y] != mn:
                lab[x] = lab[y] = mn
                changed = True
    for n_, rep in lab.items():
        assert got[n_] == rep
