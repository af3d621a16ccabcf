"""Edge tests for the round-5 hash-partition exchanges: the global
reduce must be exact when a key's rows straddle blocks, when top-k ties
sit on partition boundaries, and when partitions come out empty.

These guard the invariant the exchanges rely on: the 256-way content
hash only PLACES rows (co-location), never changes comparison
semantics — results must be bit-identical to a brute-force pandas
reduce over the same rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from torchtrajectory_ray.pipelines import textstats
from torchtrajectory_ray.pipelines.lines import line_dedup_ds

import ray.data


def _write_docs_dir(tmp_path, frames):
    """documents.parquet as a DIRECTORY of one file per frame — each
    file is (at least) one Ray block, so cross-block merges are real."""
    d = tmp_path / "documents.parquet"
    d.mkdir()
    for i, df in enumerate(frames):
        pq.write_table(pa.Table.from_pandas(df), str(d / f"part-{i}.parquet"))
    return str(tmp_path)


def test_exact_dedup_cross_block_min_and_counts(ray_session, tmp_path):
    # the same text appears in THREE separate files; the minimum doc_id
    # lives in the LAST file, so a per-block reduce alone would get the
    # group representative wrong — only a correct cross-block merge
    # recovers it
    frames = [
        pd.DataFrame({"doc_id": [10, 11], "text": ["dup text", "solo a"]}),
        pd.DataFrame({"doc_id": [20, 21], "text": ["dup text", "solo b"]}),
        pd.DataFrame({"doc_id": [5, 6], "text": ["dup text", "solo c"]}),
    ]
    sf = _write_docs_dir(tmp_path, frames)
    got = (
        textstats.exact_dedup(sf)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    exp = pd.DataFrame(
        {"doc_id": [5, 6, 11, 21], "n_dups": [3, 1, 1, 1]}
    ).astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_top_bigrams_global_ties_across_partitions(ray_session, tmp_path):
    # 30 distinct bigrams all with count 2 (every "w<i> x<i>" repeated
    # in two docs) land in many different hash partitions; k=7 must cut
    # the tie by bigram ASC globally, exactly as a single-node reduce
    # would
    texts = [f"w{i:02d} x{i:02d}" for i in range(30)]
    frames = [
        pd.DataFrame(
            {"doc_id": list(range(i, 30, 3)), "text": texts[i::3]}
        )
        for i in range(3)
    ]
    # duplicate every doc once (count 2 per bigram), spread differently
    frames.append(pd.DataFrame({"doc_id": range(100, 130), "text": texts}))
    sf = _write_docs_dir(tmp_path, frames)
    got = textstats.top_bigrams(sf, k=7)
    exp_bigrams = sorted(f"w{i:02d} x{i:02d}" for i in range(30))[:7]
    assert list(got["bigram"]) == exp_bigrams
    assert (got["n"] == 2).all()
    assert list(got["rank"]) == list(range(1, 8))


def test_distinct_terms_cross_block_cross_lang(ray_session, tmp_path):
    # the same term in the same lang across blocks counts ONCE; the
    # same term in different langs counts once PER lang
    frames = [
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["alpha beta", "beta gamma"],
                "lang": ["en", "en"],
            }
        ),
        pd.DataFrame(
            {
                "doc_id": [3, 4],
                "text": ["alpha alpha delta", "beta"],
                "lang": ["en", "de"],
            }
        ),
    ]
    sf = _write_docs_dir(tmp_path, frames)
    got = textstats.distinct_terms(sf)
    exp = pd.DataFrame({"lang": ["de", "en"], "n_terms": [1, 4]})
    exp["n_terms"] = exp["n_terms"].astype(np.int64)
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp)


def test_line_dedup_no_boilerplate_schema_survives(ray_session):
    # min_df above every line's df: the boilerplate set is EMPTY, every
    # df_filter partition returns a zero-row Arrow table, and the scrub
    # must pass every doc through untouched with the full schema
    rows = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": [f"only line {i}\nsecond {i}" for i in range(4)],
        }
    )

    def docs():
        return ray.data.from_pandas(rows)

    out = (
        line_dedup_ds(docs, min_df=99)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["doc_id", "n_lines", "n_removed", "text_clean"]
    assert (out["n_removed"] == 0).all()
    assert list(out["text_clean"]) == list(rows["text"])
