"""Line-level boilerplate dedup, PII scrubbing, chunking, source mixing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# --- line_dedup -----------------------------------------------------------


def _corpus_ds(rows):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    # from_arrow is ONE block; repartition to exercise cross-block df
    return ray.data.from_arrow(tbl).repartition(3)


def _run_line_dedup(rows, **kw) -> pd.DataFrame:
    from torchtrajectory_ray.pipelines.lines import line_dedup_ds

    return (
        line_dedup_ds(lambda: _corpus_ds(rows), **kw)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_line_dedup_removes_cross_doc_lines_keeps_order(ray_session):
    rows = [
        (1, "unique alpha\nshared footer\nunique beta"),
        (2, "shared footer\nonly two"),
        (3, "solo document"),
    ]
    df = _run_line_dedup(rows)
    by = df.set_index("doc_id")
    assert by.loc[1, "text_clean"] == "unique alpha\nunique beta"
    assert by.loc[1, "n_lines"] == 3 and by.loc[1, "n_removed"] == 1
    assert by.loc[2, "text_clean"] == "only two"
    assert by.loc[3, "text_clean"] == "solo document"
    assert by.loc[3, "n_removed"] == 0


def test_line_dedup_within_doc_repeats_dont_count_as_df(ray_session):
    """df counts DISTINCT docs: a line repeated inside ONE doc stays."""
    rows = [(1, "again\nagain\nagain"), (2, "other")]
    df = _run_line_dedup(rows)
    assert df.set_index("doc_id").loc[1, "text_clean"] == "again\nagain\nagain"


def test_line_dedup_all_removed_yields_empty_string(ray_session):
    rows = [(1, "dup line"), (2, "dup line"), (3, "dup line\nsurvivor")]
    df = _run_line_dedup(rows).set_index("doc_id")
    assert df.loc[1, "text_clean"] == "" and df.loc[1, "n_removed"] == 1
    assert df.loc[3, "text_clean"] == "survivor"
    # removal drops ALL occurrences, including within-doc repeats
    rows2 = [(1, "dup\ndup\nkeep"), (2, "dup")]
    df2 = _run_line_dedup(rows2).set_index("doc_id")
    assert df2.loc[1, "text_clean"] == "keep" and df2.loc[1, "n_removed"] == 2


def test_line_dedup_empty_boilerplate_is_identity(ray_session):
    rows = [(1, "a\nb"), (2, "c")]
    df = _run_line_dedup(rows).set_index("doc_id")
    assert df.loc[1, "text_clean"] == "a\nb" and int(df["n_removed"].sum()) == 0


def test_line_dedup_cap_fails_loud(ray_session):
    rows = [(1, "x\ny"), (2, "x\ny")]
    with pytest.raises(ValueError, match="boilerplate set"):
        _run_line_dedup(rows, max_boilerplate=1)


# --- pii scrub ------------------------------------------------------------


def test_scrub_batch_golden():
    from torchtrajectory_ray.pipelines.scrub import scrub_batch

    r = scrub_batch(
        [
            "mail bob.smith+x@corp.example.org now",
            "server 192.168.10.1 and 8.8.8.8 up",
            "call +1-555-123-4567 or 040-123456789",
            "clean text with no pii at all",
        ]
    )
    assert r["texts"][0] == "mail <EMAIL> now"
    assert r["texts"][1] == "server <IP> and <IP> up"
    assert r["texts"][2] == "call <PHONE> or <PHONE>"
    assert r["texts"][3] == "clean text with no pii at all"
    assert list(r["n_emails"]) == [1, 0, 0, 0]
    assert list(r["n_ips"]) == [0, 2, 0, 0]
    assert list(r["n_phones"]) == [0, 0, 2, 0]


def test_scrub_order_email_before_phone():
    """Digits inside an e-mail local part must not leak to the phone
    pattern (EMAIL is applied first)."""
    from torchtrajectory_ray.pipelines.scrub import scrub_batch

    r = scrub_batch(["reach 123-456-7890abc@mail.example today"])
    assert r["texts"][0] == "reach <EMAIL> today"
    assert list(r["n_phones"]) == [0]


def test_scrub_text_dataset_form(ray_session):
    import ray.data
    from torchtrajectory_ray.pipelines.scrub import scrub_text

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["a@b.example x", "no pii"], pa.string()),
            }
        )
    )
    df = scrub_text(ds).to_pandas().sort_values("doc_id")
    assert df["text"].tolist() == ["<EMAIL> x", "no pii"]
    assert df["n_emails"].tolist() == [1, 0]


# --- chunk_documents ------------------------------------------------------


def test_chunk_documents_edges(ray_session):
    from torchtrajectory_ray.pipelines import pack

    df = pack.chunk_documents(SF, size=16, stride=12).to_pandas()
    docs = df.groupby("doc_id")
    # every doc emits >= 1 chunk; chunk 0 starts at 0
    first = df[df["chunk_id"] == 0]
    assert set(first["doc_id"]) == set(df["doc_id"])
    assert (first["start_tok"] == 0).all()
    # reconstruct each doc's token count: last chunk's start + n_tokens
    last = df.sort_values("chunk_id").groupby("doc_id").tail(1)
    n = last.set_index("doc_id")["start_tok"] + last.set_index("doc_id")["n_tokens"]
    # chunk windows tile with stride 12 and width <= 16
    assert (df["start_tok"] == df["chunk_id"] * 12).all()
    assert (df["n_tokens"] <= 16).all() and (df["n_tokens"] >= 1).all()
    # non-final chunks are full-width
    nonlast = df.merge(
        last[["doc_id", "chunk_id"]], on="doc_id", suffixes=("", "_last")
    )
    nonlast = nonlast[nonlast["chunk_id"] < nonlast["chunk_id_last"]]
    assert (nonlast["n_tokens"] == 16).all()
    # chunk text matches its token window for a spot-checked doc
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))
    row = df.iloc[len(df) // 2]
    toks = texts[row["doc_id"]].split(" ")
    s = int(row["start_tok"])
    assert row["chunk_text"] == " ".join(toks[s : s + 16])
    assert (n == pd.Series({d: len(texts[d].split(" ")) for d in n.index})).all()


def test_chunk_documents_single_chunk_short_doc(ray_session, tmp_path):
    import pyarrow.parquet as pq
    from torchtrajectory_ray.pipelines import pack

    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": pa.array(["just three tokens"], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = pack.chunk_documents(str(tmp_path), size=16, stride=12).to_pandas()
    assert len(df) == 1
    assert df.iloc[0]["n_tokens"] == 3 and df.iloc[0]["chunk_text"] == "just three tokens"


def test_chunk_documents_rejects_bad_stride(ray_session):
    from torchtrajectory_ray.pipelines import pack

    with pytest.raises(ValueError):
        pack.chunk_documents(SF, size=8, stride=9)


# --- source_mix_sample ----------------------------------------------------


def test_source_mix_clamps_small_sources(ray_session, tmp_path):
    """A source under its uniform share keeps EVERYTHING (permille=1000);
    a dominant source is downsampled."""
    import pyarrow.parquet as pq
    from torchtrajectory_ray.pipelines import sampling

    big = [(i, "tok " * 9 + "tok", "big") for i in range(400)]
    small = [(1000 + i, "a b", "small") for i in range(5)]
    rows = big + small
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "source": pa.array([r[2] for r in rows], pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    df = sampling.source_mix_sample(str(tmp_path)).to_pandas()
    kept = df.groupby("source").size()
    assert kept.get("small", 0) == 5  # clamped at keep-all
    # big: permille = 1000 * (4010//2) // (2 * 4000) = 250 -> ~25%
    assert 0 < kept["big"] < 200


def test_source_mix_is_deterministic(ray_session):
    from torchtrajectory_ray.pipelines import sampling

    a = sampling.source_mix_sample(SF).to_pandas().sort_values("doc_id")
    b = sampling.source_mix_sample(SF).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )
    assert len(a) > 0


# --------------------------------------------------- property: totality


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=80), min_size=1, max_size=8))
def test_scrub_idempotent_and_total(texts):
    """scrub(scrub(t)) == scrub(t) over arbitrary unicode, and the second
    pass counts ZERO new redactions — the replacement tokens must never
    re-trigger a rule (the webhygiene totality lesson on the PII side)."""
    from torchtrajectory_ray.pipelines.scrub import _RULES, scrub_batch

    once = scrub_batch(texts)
    twice = scrub_batch(once["texts"])
    assert twice["texts"] == once["texts"]
    for name, _, _ in _RULES:
        assert int(twice[name].sum()) == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=120), min_size=1, max_size=6))
def test_lang_id_total_on_arbitrary_unicode(texts):
    """The trigram LID kernel is total and deterministic on arbitrary
    unicode (emoji, RTL, control chars) and only ever emits a known
    language code or 'und'."""
    from torchtrajectory_ray.pipelines.textstats import LangId

    lid = LangId()
    preds = lid.classify_batch(texts)
    assert len(preds) == len(texts)
    assert all(p == "und" or p in lid.langs for p in preds)
    assert preds == lid.classify_batch(texts)
