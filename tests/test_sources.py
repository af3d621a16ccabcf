"""Source formats (WARC / JSONL → canonical parquet → ordinary build):
the whole point is that an ingested corpus is INDISTINGUISHABLE from a
parquet-native one — same extracted text per url, same query answers."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from torchtrajectory_ray import fixtures
from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.pipelines.build import build_index
from torchtrajectory_ray.sources.jsonl import jsonl_to_parquet
from torchtrajectory_ray.sources.warc import parse_warc, warc_to_parquet
from torchtrajectory_ray.state.engine import QueryEngine

CFG = dict(num_term_shards=2, num_salts=2, doc_id_mode="url_hash")
N = 120


def _reference_engine(tmp_path):
    paths = fixtures.write_webpages(str(tmp_path / "pq"), N, num_files=2)
    d = str(tmp_path / "idx-pq")
    build_index(paths, d, IndexConfig(**CFG))
    return QueryEngine(d)


QUERIES = [["w0000"], ["w0001", "w0005"], ["needle_phrase_a"]]


def test_warc_ingest_build_matches_parquet_build(ray_session, tmp_path):
    w1 = fixtures.write_warc(str(tmp_path / "a.warc"), N // 2, 0)
    w2 = fixtures.write_warc(
        str(tmp_path / "b.warc.gz"), N - N // 2, N // 2, gzipped=True
    )
    shards = warc_to_parquet([w1, w2], str(tmp_path / "pages"))
    # byte-identity: ingested text per url == the canonical corpus text
    got = pq.read_table(shards[0]).to_pydict()
    want = fixtures.webpages_table(N // 2).to_pydict()
    by_url = dict(zip(want["url"], want["text"]))
    assert all(by_url[u] == t for u, t in zip(got["url"], got["text"]))
    # same query answers as the parquet-native build (url_hash ids are
    # input-layout independent, so doc ids line up exactly)
    d = str(tmp_path / "idx-warc")
    build_index(shards, d, IndexConfig(**CFG))
    eng = QueryEngine(d)
    ref = _reference_engine(tmp_path)
    for q in QUERIES:
        res = ref.topk(q, k=10)
        assert res, q  # the comparison must be about real matches
        assert eng.topk(q, k=10) == res, q


def test_warc_ingest_is_resumable(ray_session, tmp_path):
    w = fixtures.write_warc(str(tmp_path / "a.warc"), 20, 0)
    out = str(tmp_path / "pages")
    warc_to_parquet([w], out)
    mtime = os.path.getmtime(os.path.join(out, "pages-a.parquet"))
    warc_to_parquet([w], out)  # rerun skips (file untouched)
    assert os.path.getmtime(os.path.join(out, "pages-a.parquet")) == mtime


def test_warc_parser_record_types_and_errors():
    data = open(
        fixtures.write_warc("/tmp/ttray_test_tiny.warc", 3, 0), "rb"
    ).read()
    recs = parse_warc(data)
    assert len(recs) == 3 and all(r["html"].startswith(b"<html>") for r in recs)
    # truncated payload: raise by default, drop on request
    trunc = data[: len(data) - 40]
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(trunc)
    stats = {}
    assert len(parse_warc(trunc, bad_records="drop", stats=stats)) == 2
    assert stats["n_bad"] == 1  # the truncated tail record is COUNTED
    with pytest.raises(ValueError, match="not a WARC record"):
        parse_warc(b"GIBBERISH\r\n\r\n")


def test_warc_drop_mode_resyncs_past_corrupt_record():
    """A corrupt record mid-file must not discard the rest of the file:
    drop mode counts it and resyncs to the next WARC/ header."""
    data = open(
        fixtures.write_warc("/tmp/ttray_test_resync.warc", 4, 0), "rb"
    ).read()
    # corrupt record #2's Content-Length header value in place
    first = data.find(b"Content-Length:")
    second = data.find(b"Content-Length:", first + 1)
    bad = data[:second] + b"Content-Bogus: x\r\n" + data[
        second + data[second:].find(b"\r\n") + 2 :
    ]
    stats = {}
    recs = parse_warc(bad, bad_records="drop", stats=stats)
    assert len(recs) == 3  # records 1, 3, 4 survive
    assert stats["n_bad"] == 1
    with pytest.raises(ValueError):
        parse_warc(bad)  # raise mode still raises


def test_jsonl_ingest_build_matches_parquet_build(ray_session, tmp_path):
    j = fixtures.write_jsonl(str(tmp_path / "a.jsonl"), N, 0)
    shards = jsonl_to_parquet([j], str(tmp_path / "pages"))
    d = str(tmp_path / "idx-jsonl")
    build_index(shards, d, IndexConfig(**CFG))
    eng = QueryEngine(d)
    ref = _reference_engine(tmp_path)
    for q in QUERIES:
        assert eng.topk(q, k=10) == ref.topk(q, k=10), q


def test_jsonl_text_only_and_bad_lines(ray_session, tmp_path):
    p = str(tmp_path / "x.jsonl")
    j = fixtures.write_jsonl(p, 30, 0, with_html=False)
    with open(p, "a") as f:
        f.write("NOT JSON\n")
        f.write('{"url": "https://x/1"}\n')  # missing text
    with pytest.raises(Exception):
        jsonl_to_parquet([j], str(tmp_path / "p1"))
    shards = jsonl_to_parquet(
        [j], str(tmp_path / "p2"), bad_records="drop"
    )
    t = pq.read_table(shards[0])
    assert t.num_rows == 30
    # text-only rows still build and serve
    d = str(tmp_path / "idx")
    build_index(shards, d, IndexConfig(**CFG))
    assert QueryEngine(d).topk(["w0000"], k=5)


def test_duplicate_shard_names_fail_loud(ray_session, tmp_path):
    """Two inputs mapping to one output shard would silently overwrite
    each other — both converters refuse upfront."""
    import shutil

    a = fixtures.write_warc(str(tmp_path / "d1" / "a.warc"), 3, 0)
    b = str(tmp_path / "d2" / "a.warc")
    os.makedirs(os.path.dirname(b), exist_ok=True)
    shutil.copy(a, b)
    with pytest.raises(ValueError, match="unique shard names"):
        warc_to_parquet([a, b], str(tmp_path / "pages"))
    ja = fixtures.write_jsonl(str(tmp_path / "d1" / "x.jsonl"), 3, 0)
    jb = str(tmp_path / "d2" / "x.jsonl.gz")
    import gzip

    os.makedirs(os.path.dirname(jb), exist_ok=True)
    with open(ja, "rb") as f, open(jb, "wb") as g:
        g.write(gzip.compress(f.read()))
    with pytest.raises(ValueError, match="unique shard names"):
        jsonl_to_parquet([ja, jb], str(tmp_path / "pages2"))


def test_naive_timestamps_are_utc():
    from torchtrajectory_ray.sources.warc import _parse_warc_date

    assert _parse_warc_date("2024-01-01T00:00:00") == _parse_warc_date(
        "2024-01-01T00:00:00Z"
    )
    assert _parse_warc_date("2024-01-01T09:00:00+09:00") == _parse_warc_date(
        "2024-01-01T00:00:00Z"
    )


def test_csv_ingest_build_matches_parquet_build(ray_session, tmp_path):
    from torchtrajectory_ray.sources.csvsrc import csv_to_parquet

    c1 = fixtures.write_csv(str(tmp_path / "a.csv"), N // 2, 0)
    c2 = fixtures.write_csv(
        str(tmp_path / "b.tsv.gz"),
        N - N // 2,
        N // 2,
        delimiter="\t",
        gzipped=True,
    )
    shards = csv_to_parquet([c1, c2], str(tmp_path / "pages"))
    # byte-identity: ingested text per url == the canonical corpus text
    got = pq.read_table(shards[0]).to_pydict()
    want = fixtures.webpages_table(N // 2).to_pydict()
    by_url = dict(zip(want["url"], want["text"]))
    assert all(by_url[u] == t for u, t in zip(got["url"], got["text"]))
    d = str(tmp_path / "idx-csv")
    build_index(shards, d, IndexConfig(**CFG))
    eng = QueryEngine(d)
    ref = _reference_engine(tmp_path)
    for q in QUERIES:
        res = ref.topk(q, k=10)
        assert res, q
        assert eng.topk(q, k=10) == res, q


def test_csv_text_only_bad_rows_and_resume(ray_session, tmp_path):
    from torchtrajectory_ray.sources.csvsrc import csv_to_parquet

    p = str(tmp_path / "x.csv")
    fixtures.write_csv(p, 30, 0, with_html=False)
    with open(p, "a") as f:
        f.write(",missing-url-text,,\n")  # empty url → malformed
    with pytest.raises(Exception):
        csv_to_parquet([p], str(tmp_path / "p1"))
    shards = csv_to_parquet([p], str(tmp_path / "p2"), bad_records="drop")
    t = pq.read_table(shards[0])
    assert t.num_rows == 30 and "html" not in t.column_names
    import json as _json

    side = _json.load(open(shards[0] + ".src.json"))
    assert side["n_bad"] == 1  # dropped rows are COUNTED, not silent
    d = str(tmp_path / "idx")
    build_index(shards, d, IndexConfig(**CFG))
    assert QueryEngine(d).topk(["w0000"], k=5)
    # resume: a rerun must skip the finished shard (file untouched)
    mtime = os.path.getmtime(shards[0])
    csv_to_parquet([p], str(tmp_path / "p2"), bad_records="drop")
    assert os.path.getmtime(shards[0]) == mtime


def test_csv_header_and_mixed_html_fail_loud(ray_session, tmp_path):
    from torchtrajectory_ray.sources.csvsrc import csv_to_parquet

    p = str(tmp_path / "h.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    with pytest.raises(Exception, match="required columns"):
        csv_to_parquet([p], str(tmp_path / "p1"))
    m = str(tmp_path / "m.csv")
    with open(m, "w") as f:
        f.write("url,text,html_b64\nhttps://x/1,hello,aGk=\nhttps://x/2,bye,\n")
    with pytest.raises(Exception, match="mixed html"):
        csv_to_parquet([m], str(tmp_path / "p2"))


def test_csv_huge_field_and_mixed_extension_collision(ray_session, tmp_path):
    from torchtrajectory_ray.sources.csvsrc import csv_to_parquet

    # review regression 1: a >128 KiB cell (real html base64) must not
    # trip stdlib csv's default field_size_limit
    import base64

    big = base64.b64encode(b"<html>" + b"x" * 200_000 + b"</html>").decode()
    p = str(tmp_path / "big.csv")
    with open(p, "w") as f:
        f.write("url,text,html_b64\n")
        f.write(f"https://x/1,hello world,{big}\n")
    shards = csv_to_parquet([p], str(tmp_path / "out"))
    t = pq.read_table(shards[0])
    assert t.num_rows == 1 and len(t["html"][0].as_py()) > 200_000
    # review regression 2: a.tsv.gz and a.csv.gz map to the same shard
    # stem — must fail loud upfront, not silently overwrite
    a = str(tmp_path / "a.tsv.gz")
    b = str(tmp_path / "a.csv.gz")
    fixtures.write_csv(a, 3, 0, delimiter="\t", gzipped=True)
    fixtures.write_csv(b, 3, 0, gzipped=True)
    with pytest.raises(ValueError, match="unique shard names"):
        csv_to_parquet([a, b], str(tmp_path / "out2"))
