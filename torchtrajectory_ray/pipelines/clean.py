"""End-to-end training-corpus cleaning pipeline — the flagship chain of
the training-data operators: quality filter → exact dedup → near-dup
removal → partitioned clean-corpus write.

One streaming pass computes per-doc quality features and the content
hash; the exact-dedup keep-set (min doc_id per content hash) comes from
the same small groupby used by ``textstats.exact_dedup``; MinHash-LSH
near-dup pairs (verified by n-gram Jaccard) remove the higher-id member
of each confirmed pair.  The verdict per document is explicit — docs are
never silently dropped, every removal carries a reason code, which is
what an auditable data pipeline needs:

    reason ∈ {kept, too_short, too_long, high_stop_ratio,
              exact_dup, near_dup}

``clean_corpus`` returns the verdicts (driver-gate friendly);
``write_clean_corpus`` additionally writes the kept docs as partitioned
parquet (resumable output layout: one file per input block range).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from torchtrajectory_ray.pipelines import dedup as dedup_mod
from torchtrajectory_ray.pipelines.textstats import STOPWORDS, text_sha1

MIN_TOKENS = 10
MAX_TOKENS = 100_000
MAX_STOP_RATIO = 0.5


def _features(batch: pa.Table) -> pa.Table:
    """Per-doc (content hash, n_tokens, stop_ratio) — vectorized with the
    factorize pattern; kept separate from textstats.quality_score because
    the verdicts need the UNROUNDED ratio (boundary semantics match the
    SQL oracle) plus the sha."""
    import itertools

    texts = batch["text"].to_pylist()
    tok_lists = [t.split(" ") for t in texts]
    counts = np.fromiter((len(t) for t in tok_lists), np.int64, len(tok_lists))
    total = int(counts.sum())
    if total:
        flat = np.fromiter(itertools.chain.from_iterable(tok_lists), object, total)
        codes, uniq = pd.factorize(flat, sort=False)
        stop_codes = np.fromiter(
            (t in STOPWORDS for t in uniq), bool, len(uniq)
        )
        doc_idx = np.repeat(np.arange(len(tok_lists), dtype=np.int64), counts)
        n_stop = np.bincount(
            doc_idx, weights=stop_codes[codes], minlength=len(tok_lists)
        )
    else:
        n_stop = np.zeros(len(tok_lists))
    n_tok = counts
    out = text_sha1(batch.select(["doc_id", "text"]))
    return pa.table(
        {
            "doc_id": out["doc_id"],
            "text_sha": out["text_sha"],
            "n_tokens": pa.array(n_tok, pa.int64()),
            "stop_ratio": pa.array(
                np.asarray(n_stop, np.float64)
                / np.maximum(np.asarray(n_tok, np.float64), 1)
            ),
        }
    )


def clean_corpus(
    sf_dir: str,
    *,
    near_dup_threshold: float = 0.7,
    with_near_dup: bool = True,
) -> pd.DataFrame:
    """doc_id, reason — one verdict per document of the sf documents
    table, in the order the rules fire (length → stopwords → exact dup →
    near dup)."""
    feats = (
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        .map_batches(_features, batch_format="pyarrow")
        .to_pandas()
    )
    reason = pd.Series("kept", index=feats.index, dtype=object)
    reason[feats["n_tokens"] < MIN_TOKENS] = "too_short"
    reason[feats["n_tokens"] > MAX_TOKENS] = "too_long"
    ok = reason == "kept"
    reason[ok & (feats["stop_ratio"] > MAX_STOP_RATIO)] = "high_stop_ratio"

    # exact dedup among survivors: keep the min doc_id per content hash
    ok = reason == "kept"
    surv = feats[ok]
    keep_min = surv.groupby("text_sha")["doc_id"].transform("min")
    dup_ids = set(surv.loc[surv["doc_id"] != keep_min, "doc_id"])
    reason[ok & feats["doc_id"].isin(dup_ids)] = "exact_dup"

    if with_near_dup:
        # sketch ONLY the surviving docs (quality-filtered + exact-deduped)
        # — on spam-heavy corpora the dropped docs dominate and their LSH
        # work would be wasted
        kept_ids = set(int(x) for x in feats.loc[reason == "kept", "doc_id"])
        keep_arr = pa.array(sorted(kept_ids), pa.int64())

        def only_kept(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return batch.filter(pc.is_in(batch["doc_id"], value_set=keep_arr))

        docs = ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).map_batches(only_kept, batch_format="pyarrow")
        pairs = dedup_mod.verify_pairs(
            docs, dedup_mod.minhash_candidates(docs), near_dup_threshold
        )
        near = {int(b) for _, b, _ in pairs.itertuples(index=False)}
        reason[(reason == "kept") & feats["doc_id"].isin(near)] = "near_dup"

    return (
        pd.DataFrame({"doc_id": feats["doc_id"], "reason": reason})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def clean_corpus_summary(sf_dir: str) -> pd.DataFrame:
    """reason, n — audit counts of the cleaning run (oracle-checkable:
    the rule chain up to exact dedup is pure SQL)."""
    v = clean_corpus(sf_dir, with_near_dup=False)
    out = (
        v.groupby("reason", as_index=False)
        .agg(n=("doc_id", "size"))
        .sort_values("reason")
        .reset_index(drop=True)
    )
    out["n"] = out["n"].astype("int64")
    return out


def write_clean_corpus(sf_dir: str, out_dir: str) -> dict:
    """Write the kept documents as partitioned parquet (resumable output
    layout — many files via Ray's block-parallel writer, never one giant
    file) and return audit counts."""
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)  # rerun = replace, not append
    verdicts = clean_corpus(sf_dir)
    keep = pa.array(
        sorted(verdicts.loc[verdicts["reason"] == "kept", "doc_id"]), pa.int64()
    )

    def keep_only(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.is_in(batch["doc_id"], value_set=keep))

    (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet")
        .map_batches(keep_only, batch_format="pyarrow")
        .write_parquet(out_dir)
    )
    counts = verdicts["reason"].value_counts().to_dict()
    return {"out_dir": out_dir, "counts": {k: int(v) for k, v in counts.items()}}
