"""IDVersion optimistic-concurrency upsert gates (lucene_ray.build
.upsert_documents_versioned / pk_version_lookup — the sandbox/idversion
contract: a write applies only with a strictly greater version)."""

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lucene_ray.api import Index
from lucene_ray.build import pk_version_lookup, upsert_documents_versioned
from lucene_ray.corpus import generate_corpus


@pytest.fixture()
def vidx(ray_session, tmp_path):
    c = tmp_path / "c"
    c.mkdir()
    pq.write_table(generate_corpus(80, seed=11), str(c / "a.parquet"))
    idx = str(tmp_path / "i")
    Index.build(str(c), idx)
    return idx


def _delta(tmp_path, name, rows):
    d = tmp_path / name
    d.mkdir()
    base = generate_corpus(1, seed=5)
    tbl = pa.table({
        "repo": pa.array([r.get("repo", "r0") for r in rows]),
        "path": pa.array([r["path"] for r in rows]),
        "commit": pa.array([r.get("commit", "c0") for r in rows]),
        "lang": pa.array([r.get("lang", "py") for r in rows]),
        "content": pa.array([r["content"] for r in rows]),
        "version": pa.array([r["version"] for r in rows], pa.int64()),
    })
    del base
    pq.write_table(tbl, str(d / "d.parquet"))
    return str(d)


def test_versioned_upsert_applies_and_rejects(vidx, tmp_path):
    a, r = upsert_documents_versioned(
        vidx, _delta(tmp_path, "d1", [
            {"path": "k1", "content": "alpha beta", "version": 5},
            {"path": "k2", "content": "gamma", "version": 3}]))
    assert (a, r) == (2, 0)
    assert pk_version_lookup(vidx, ["k1", "k2"]) == {"k1": 5, "k2": 3}

    # stale write rejected; newer applies
    a, r = upsert_documents_versioned(
        vidx, _delta(tmp_path, "d2", [
            {"path": "k1", "content": "stale", "version": 4},
            {"path": "k2", "content": "newer", "version": 7}]))
    assert (a, r) == (1, 1)
    assert pk_version_lookup(vidx, ["k1", "k2"]) == {"k1": 5, "k2": 7}

    # equal version rejected (strictly greater required)
    a, r = upsert_documents_versioned(
        vidx, _delta(tmp_path, "d3", [
            {"path": "k2", "content": "same", "version": 7}]))
    assert (a, r) == (0, 1)


def test_batch_highest_version_wins(vidx, tmp_path):
    a, r = upsert_documents_versioned(
        vidx, _delta(tmp_path, "d4", [
            {"path": "k9", "content": "v one", "version": 1},
            {"path": "k9", "content": "v two", "version": 2}]))
    assert (a, r) == (1, 0)
    assert pk_version_lookup(vidx, ["k9"]) == {"k9": 2}
    # the surviving content is the version-2 row
    idx = Index(vidx)
    hits = idx.search("two", 5)
    assert len(hits) >= 1


def test_lookup_absent_and_missing_store(vidx):
    assert pk_version_lookup(vidx, ["nope"]) == {}


def test_index_info_overview(vidx, ray_session):
    """Luke-role index overview (lucene/luke Overview tab semantics)."""
    from lucene_ray.build import index_info

    info = index_info(vidx, top_terms=5)
    assert info["doc_count"] == 80
    assert info["n_terms"] > 0 and info["sum_df"] >= info["n_terms"]
    assert len(info["top_terms"]) == 5
    # df-descending
    dfs = [d for _t, d in info["top_terms"]]
    assert dfs == sorted(dfs, reverse=True)
