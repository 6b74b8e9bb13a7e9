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


def test_perceptron_hand_trace():
    """Hand-traced reference loop: init weights = ttf; a misclassified
    doc at batchCount 0 rebuilds the snapshot immediately; later
    updates inside the same batch read STALE values and overwrite."""
    from lucene_ray.pipelines.classify_ext import _perceptron_train
    docs = [["a", "a", "b"], ["b", "c"], ["a", "c", "c"]]
    # ttf: a=3, b=2, c=3; bias default = 8/3
    # doc0: output = 3+3+2 = 8 >= 8/3 -> True; label True -> no update
    # doc1: output = 2+3 = 5 >= 8/3 -> True; label False -> modifier -1
    #   batchCount 1, 1 % 2 != 0 -> NO rebuild; weights b=1, c=2
    # doc2: snapshot STILL old: output = 3+3+3 = 9 -> True; label True
    fst, bias = _perceptron_train(docs, [True, False, True],
                                  batch_size=2)
    assert bias == 8 / 3
    # final snapshot is the one built at init (never rebuilt)
    assert fst == {"a": 3, "b": 2, "c": 3}

    # same but batch_size=1: doc1's update rebuilds (1 % 1 == 0)
    fst, _ = _perceptron_train(docs, [True, False, True], batch_size=1)
    assert fst == {"a": 3, "b": 1, "c": 2}


def test_perceptron_weight_floor_and_stale_overwrite():
    from lucene_ray.pipelines.classify_ext import _perceptron_train
    # two consecutive negative docs in one batch: the second update
    # reads the STALE snapshot, so the decrements do NOT accumulate
    docs = [["x", "x", "x"], ["x", "x", "x"], ["y"]]
    fst, _ = _perceptron_train(docs, [False, False, True],
                               batch_size=10, bias=1.0)
    # ttf x=6, y=1; doc0: out 18 >= 1 -> True vs False: x := 6-3 = 3,
    # batchCount 0 -> rebuild; doc1: out 9 -> True vs False:
    # x := 3-3 = 0, batchCount 1 -> no rebuild; final snapshot keeps 3
    assert fst["x"] == 3
    # with rebuilds every time the floor at 0 binds on a third pass
    fst, _ = _perceptron_train(
        [["x", "x", "x"]] * 3 + [["y"]],
        [False, False, False, True], batch_size=1, bias=1.0)
    assert fst["x"] == 0


def test_perceptron_entry_shape(ray_session):
    from lucene_ray.pipelines.classify_ext import classify_perceptron
    t = classify_perceptron("/root/testdata/sf0.001").to_pandas()
    assert len(t) == 500 and t["doc_id"].is_unique
    assert t["pred"].dtype == bool
