"""Domain-level quality gate (RefinedWeb-style whole-source drop):
per-source verdicts recomputed driver-side must match, and the applied
gate must partition the corpus exactly.  The sf0.01 DuckDB oracle gate
runs in test_driver_gate.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from torchtrajectory_ray.pipelines import textstats

SF = "/root/testdata/sf0.001"


def _driver_truth() -> pd.DataFrame:
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"])
    rows = []
    for s, txt in zip(t["source"].to_pylist(), t["text"].to_pylist()):
        toks = txt.split(" ")
        sr = sum(w in textstats.STOPWORDS for w in toks) / len(toks)
        rows.append((s, len(toks), sr))
    df = pd.DataFrame(rows, columns=["source", "n", "sr"])
    g = df.groupby("source").agg(
        n_docs=("n", "size"), mean_toks=("n", "mean"), mean_stop=("sr", "mean")
    )
    g["kept"] = (g["mean_stop"] >= textstats.SOURCE_MIN_STOP) & (
        g["mean_toks"] >= textstats.SOURCE_MIN_TOKENS
    )
    return g


def test_source_quality_matches_driver_recompute(ray_session):
    got = (
        textstats.source_quality(SF)
        .to_pandas()
        .set_index("source")
        .sort_index()
    )
    want = _driver_truth().sort_index()
    assert got.index.tolist() == want.index.tolist()
    assert got["n_docs"].tolist() == want["n_docs"].tolist()
    assert np.allclose(got["mean_stop"], want["mean_stop"], atol=1e-6)
    assert np.allclose(got["mean_toks"], want["mean_toks"], atol=1e-6)
    assert got["kept"].tolist() == want["kept"].tolist()


def test_source_filtered_partitions_corpus(ray_session):
    verdicts = textstats.source_quality(SF).to_pandas()
    kept_sources = set(verdicts.loc[verdicts["kept"], "source"])
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    all_ids = t["doc_id"].to_numpy()
    want = sorted(
        int(d)
        for d, s in zip(all_ids, t["source"].to_pylist())
        if s in kept_sources
    )
    got = sorted(
        textstats.source_filtered(SF).to_pandas()["doc_id"].astype(int)
    )
    assert got == want
    # the gate is a real partition: kept + dropped == corpus
    n_dropped = int(verdicts.loc[~verdicts["kept"], "n_docs"].sum())
    assert len(got) + n_dropped == len(all_ids)
