"""BpVectorReorderer (misc/index/BpVectorReorderer.java:55)."""

import numpy as np


def _clustered(n_per=60, k=4, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((k, dim)) * 10
    vecs, labels = [], []
    for j in range(k):
        vecs.append(centers[j] + rng.standard_normal((n_per, dim)))
        labels.extend([j] * n_per)
    v = np.concatenate(vecs).astype(np.float32)
    labels = np.array(labels)
    perm0 = rng.permutation(len(v))
    return v[perm0], labels[perm0]


def _adjacent_cost(v, order):
    d = np.diff(v[order], axis=0)
    return float((d * d).sum())


def test_bp_vector_improves_locality_and_groups_clusters():
    from lucene_ray.bp import bp_vector_permutation
    v, labels = _clustered()
    perm = bp_vector_permutation(v, min_partition_size=8)
    assert sorted(perm.tolist()) == list(range(len(v)))
    base = _adjacent_cost(v, np.arange(len(v)))
    opt = _adjacent_cost(v, perm)
    assert opt < base * 0.5
    # well-separated clusters become (nearly) contiguous runs
    lr = labels[perm]
    transitions = int((lr[1:] != lr[:-1]).sum())
    assert transitions <= 6, transitions


def test_bp_vector_deterministic_and_small_passthrough():
    from lucene_ray.bp import bp_vector_permutation
    v, _ = _clustered(n_per=40, k=3)
    p1 = bp_vector_permutation(v, min_partition_size=8)
    p2 = bp_vector_permutation(v, min_partition_size=8)
    assert (p1 == p2).all()
    # below the minimum partition size the ids stay in order
    small = v[:20]
    assert (bp_vector_permutation(small) == np.arange(20)).all()


def test_bp_vector_cosine_mode():
    from lucene_ray.bp import bp_vector_permutation
    v, labels = _clustered(n_per=50, k=3)
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    perm = bp_vector_permutation(v, score="cosine", min_partition_size=8)
    lr = labels[perm]
    base = int((labels[1:] != labels[:-1]).sum())
    assert int((lr[1:] != lr[:-1]).sum()) < base
