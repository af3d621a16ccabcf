"""Sequence packing (distributed prefix scan) + deterministic sampling."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _packed(budget=512, n_ranges=None) -> pd.DataFrame:
    from torchtrajectory_ray.pipelines import pack

    return (
        pack.pack_sequences(SF, budget=budget, n_ranges=n_ranges)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_pack_is_range_count_independent(ray_session):
    """The scan's answer is a pure function of the data — K is only a
    parallelism knob (3 forces multi-doc ranges, 1000 forces empties)."""
    a = _packed(n_ranges=3)
    b = _packed(n_ranges=1000)
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_pack_offsets_are_the_sequential_fold(ray_session):
    got = _packed(budget=100)
    seq = got.sort_values("doc_id").reset_index(drop=True)
    start = np.concatenate(([0], np.cumsum(seq["n_tokens"].to_numpy())[:-1]))
    assert (seq["bin_id"].to_numpy() == start // 100).all()
    assert (seq["offset_in_bin"].to_numpy() == start % 100).all()


def test_pack_bin_fill_invariant(ray_session):
    """Every bin except the last receives exactly `budget` tokens of
    stream — i.e. consecutive docs' (bin_id, offset) are consistent with
    a gapless token stream (what a packed dataloader relies on)."""
    budget = 64
    seq = _packed(budget=budget)
    stream_pos = seq["bin_id"].to_numpy() * budget + seq["offset_in_bin"].to_numpy()
    expected_next = stream_pos + seq["n_tokens"].to_numpy()
    assert (stream_pos[1:] == expected_next[:-1]).all()
    assert stream_pos[0] == 0


def test_pack_summary_counts(ray_session):
    from torchtrajectory_ray.pipelines import pack

    s = pack.bin_fill_stats(SF, budget=512).iloc[0]
    seq = _packed(budget=512)
    assert s["n_docs"] == len(seq)
    assert s["total_tokens"] == int(seq["n_tokens"].sum())
    assert s["n_bins"] == -(-s["total_tokens"] // 512)


def test_sample_key_overflow_guard():
    from torchtrajectory_ray.pipelines.sampling import sample_key

    with pytest.raises(ValueError, match="too large"):
        sample_key(np.array([2**62], dtype=np.int64))


def test_top_per_lang_matches_single_partition(ray_session):
    """Partial-top-k-per-block merge == a single global sort (the merge
    ordering is the final ordering, so truncation is lossless)."""
    import duckdb

    from torchtrajectory_ray.pipelines import sampling

    got = sampling.top_per_lang(SF, k=3)
    exp = duckdb.sql(
        f"""
        WITH t AS (SELECT doc_id, lang,
          round(len(list_distinct(string_split(text,' ')))::DOUBLE
                / len(string_split(text,' ')), 6) AS diversity
          FROM read_parquet('{SF}/documents.parquet'))
        SELECT lang, CAST(row_number() OVER (PARTITION BY lang
               ORDER BY diversity DESC, doc_id ASC) AS BIGINT) AS rank,
               doc_id, diversity
        FROM t QUALIFY rank <= 3
        ORDER BY lang, rank
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), atol=2e-6, rtol=0
    )


def test_decontaminate_bench_set_bound_fails_loud(ray_session):
    """A benchmark gram set over max_grams raises instead of OOMing a
    worker via an unbounded broadcast (the kgram max_dup_hashes
    discipline)."""
    import pytest

    from torchtrajectory_ray.pipelines import decontaminate

    with pytest.raises(ValueError, match="max_grams"):
        decontaminate.benchmark_grams(SF, n=3, max_grams=2)
    # and the ordinary path is untouched by the default bound
    assert decontaminate.benchmark_grams(SF, n=3).size > 2


def test_decontaminate_self_and_cross(ray_session):
    """Every benchmark doc with a full window flags itself with exactly
    its own distinct-gram count; flags are >= min_shared."""
    import duckdb

    from torchtrajectory_ray.pipelines import decontaminate

    out = (
        decontaminate.decontaminate(SF, n=3)
        .to_pandas()
        .set_index("doc_id")["n_shared"]
    )
    bench = duckdb.sql(
        f"""
        SELECT doc_id,
               len(list_distinct(list_transform(
                   generate_series(1, greatest(len(ts) - 2, 0)),
                   i -> array_to_string(ts[i:i+2], ' ')))) AS n_own
        FROM (SELECT doc_id, string_split(text, ' ') AS ts
              FROM read_parquet('{SF}/documents.parquet'))
        WHERE doc_id % 97 = 0 AND len(ts) >= 3
        """
    ).df()
    assert len(bench) > 0
    for _, r in bench.iterrows():
        assert out.loc[int(r.doc_id)] == int(r.n_own)
    assert (out >= 1).all()


def test_repetition_stats_degenerate_doc(ray_session, tmp_path):
    """An all-identical-token doc maxes both signals; a no-repeat doc
    zeroes dup_bigram_frac."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torchtrajectory_ray.pipelines import textstats

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["x x x x x", "a b c d", "y"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    out = (
        textstats.repetition_stats(str(tmp_path))
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert list(out.index) == [1, 2]  # single-token doc 3 has no bigrams
    assert out.loc[1, "top_bigram_frac"] == 1.0
    assert out.loc[1, "dup_bigram_frac"] == 0.75  # 4 occurrences, 1 distinct
    assert out.loc[2, "top_bigram_frac"] == round(1 / 3, 6)
    assert out.loc[2, "dup_bigram_frac"] == 0.0
