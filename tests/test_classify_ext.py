"""Confusion matrix + DatasetSplitter (classification/utils)."""

import numpy as np
import pytest


def test_split_closed_form_matches_reference_simulation():
    """The window-function closed form must reproduce the literal
    DatasetSplitter.split loop (DatasetSplitter.java:103-141: one
    GLOBAL alternating counter across groups, per-group float quotas)
    for every group-size mix."""
    from lucene_ray.pipelines.classify_ext import (
        _split_closed_form, _split_quota, split_dataset_sim,
        CV_RATIO, TEST_RATIO)

    rng = np.random.default_rng(7)
    for trial in range(200):
        sizes = rng.integers(0, 23, size=rng.integers(1, 6)).tolist()
        want = split_dataset_sim(sizes)
        got = []
        base = 0
        parts = np.array(["test", "cv", "train"], dtype=object)
        for n in sizes:
            r = np.arange(n, dtype=np.int64)
            k = _split_quota(n, TEST_RATIO)
            l_cv = _split_quota(n, CV_RATIO)
            got.extend(parts[_split_closed_form(r, base, k, l_cv)])
            base += n
        assert got == want, (trial, sizes)


def test_split_quota_float_compare():
    from lucene_ray.pipelines.classify_ext import _split_quota
    # tc < n*ratio with integer tc: non-integral products round up,
    # integral ones stay (10 * 0.2 is exactly 2.0 in IEEE double)
    assert _split_quota(10, 0.2) == 2
    assert _split_quota(11, 0.2) == 3
    assert _split_quota(0, 0.2) == 0
    assert _split_quota(1, 0.2) == 1


def test_split_dataset_partition_properties(ray_session):
    from lucene_ray.pipelines.classify_ext import split_dataset
    df = split_dataset("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500
    assert df["doc_id"].is_unique
    assert set(df["part"].unique()) <= {"test", "cv", "train"}
    counts = df["part"].value_counts()
    # quotas: ~20% test, ~10% cv (each class rounds up, global b parity
    # can starve a class of even slots only when quotas exceed half)
    assert counts["test"] >= 90
    assert counts["cv"] >= 45
    assert counts["train"] >= 300


def test_confusion_counts_sum_to_corpus(ray_session):
    from lucene_ray.pipelines.classify_ext import classify_confusion
    t = classify_confusion("/root/testdata/sf0.001").to_pandas()
    assert t["n"].sum() == 500
    assert (t.groupby("actual")["n"].sum() > 0).all()


def test_bm25nb_assigns_every_doc_a_known_class(ray_session):
    from lucene_ray.pipelines.classify_ext import classify_bm25nb
    df = classify_bm25nb("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500 and df["doc_id"].is_unique
    assert set(df["pred_lang"].unique()) <= {"de", "en", "es", "fr", "zh"}


def test_knn_fuzzy_votes_spread_and_cover(ray_session):
    """Unlike NB (prior-dominated on this corpus), the kNN-fuzzy vote
    follows per-document nearest neighbors, so several classes must
    appear among the predictions."""
    from lucene_ray.pipelines.classify_ext import classify_knn_fuzzy
    df = classify_knn_fuzzy("/root/testdata/sf0.001").to_pandas()
    assert len(df) == 500 and df["doc_id"].is_unique
    assert df["pred_lang"].nunique() >= 3
