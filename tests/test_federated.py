"""Federated search (global-statistics querying across independent
indexes): scores must be BITWISE equal to one index built over the
union — the query-side dual of merge_indexes, with no physical merge."""

from __future__ import annotations

import pytest

from torchtrajectory_ray import fixtures
from torchtrajectory_ray.config import IndexConfig
from torchtrajectory_ray.pipelines.build import build_index
from torchtrajectory_ray.pipelines.federated import FederatedEngine
from torchtrajectory_ray.state.engine import QueryEngine

CFG = dict(num_term_shards=2, num_salts=2, doc_id_mode="url_hash")


@pytest.fixture(scope="module")
def pair(ray_session, tmp_path_factory):
    """(federated engine over 3 member indexes, single full-union
    engine) — url_hash ids so members are globally disjoint."""
    tmp = tmp_path_factory.mktemp("fed")
    paths = fixtures.write_webpages(str(tmp / "c"), 240, num_files=6)
    members = []
    for i in range(3):
        d = str(tmp / f"idx-{i}")
        build_index(paths[2 * i : 2 * i + 2], d, IndexConfig(**CFG))
        members.append(d)
    full = str(tmp / "idx-full")
    build_index(paths, full, IndexConfig(**CFG))
    return FederatedEngine(members), QueryEngine(full)


QUERIES = [
    ["spark", "lake"],
    ["taxi"],
    ["wind", "solar", "river"],
    ["the"],
    ["nosuchterm"],
    ["spark", "nosuchterm"],
]


def test_bitwise_equal_to_union_index(pair):
    fed, full = pair
    for q in QUERIES:
        a = fed.topk(q, k=12)
        b = full.topk(q, k=12)
        assert a == b, (q, a[:3], b[:3])  # scores compared bitwise


def test_both_methods_agree(pair):
    fed, _ = pair
    for q in QUERIES[:3]:
        assert fed.topk(q, k=8, method="wand") == fed.topk(
            q, k=8, method="exhaustive"
        )


def test_resolve_across_members(pair):
    fed, full = pair
    top = fed.topk(["spark"], k=5)
    if top:
        ids = [d for d, _ in top]
        assert fed.resolve(ids)["doc_id"].tolist() == full.resolve(ids)[
            "doc_id"
        ].tolist()


def test_single_member_equals_plain_engine(ray_session, tmp_path):
    paths = fixtures.write_webpages(str(tmp_path / "c"), 60, num_files=2)
    d = str(tmp_path / "i")
    build_index(paths, d, IndexConfig(**CFG))
    fed = FederatedEngine([d])
    plain = QueryEngine(d)
    assert fed.topk(["spark", "lake"], k=10) == plain.topk(
        ["spark", "lake"], k=10
    )


def test_tokenizer_mismatch_fails_loud(ray_session, tmp_path):
    paths = fixtures.write_webpages(str(tmp_path / "c"), 40, num_files=2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(paths[:1], a, IndexConfig(**CFG))
    build_index(
        paths[1:], b, IndexConfig(**{**CFG, "tokenizer": "ws"})
    )
    with pytest.raises(ValueError, match="tokenizer"):
        FederatedEngine([a, b])
