import numpy as np

from hashgan_tpu.eval.oracle import (
    average_precision_np,
    mean_average_precision_np,
    precision_at_radius_np,
    precision_recall_curve_np,
)


def test_ap_hand_computed():
    # ranking: dists 0,1,2,3 -> order 0,1,2,3; rel pattern [1,0,1,0]
    dist = np.array([0, 1, 2, 3])
    rel = np.array([True, False, True, False])
    # P@1 = 1, P@3 = 2/3; AP = (1 + 2/3)/2 = 5/6
    ap = average_precision_np(dist, rel, R=4)
    assert abs(ap - 5.0 / 6.0) < 1e-12


def test_ap_no_relevant_is_zero():
    dist = np.array([0, 1, 2])
    rel = np.array([False, False, False])
    assert average_precision_np(dist, rel, R=3) == 0.0


def test_ap_respects_R_cutoff():
    dist = np.array([0, 1, 2, 3])
    rel = np.array([False, False, True, True])
    # R=2: no relevant retrieved -> 0
    assert average_precision_np(dist, rel, R=2) == 0.0
    # R=3: one relevant at rank 3 -> AP = (1/3)/1
    assert abs(average_precision_np(dist, rel, R=3) - 1.0 / 3.0) < 1e-12


def test_ap_tie_breaks_by_index():
    # identical distances: stable argsort keeps db order 0,1,2
    dist = np.array([5, 5, 5])
    rel = np.array([False, True, False])
    # order = [0,1,2]; hit at rank 2 -> AP = (1/2)/1
    assert abs(average_precision_np(dist, rel, R=3) - 0.5) < 1e-12


def test_map_perfect_codes():
    # two classes, queries and db with identical per-class distance structure
    qlab = np.eye(2, dtype=np.float32)[[0, 1]]
    dlab = np.eye(2, dtype=np.float32)[[0, 0, 1, 1]]
    # distances: class-matched items closer
    dist = np.array([[0, 1, 9, 9], [9, 9, 1, 0]])
    assert mean_average_precision_np(dist, qlab, dlab, R=4) == 1.0


def test_map_multilabel_relevance():
    qlab = np.array([[1, 1, 0]], dtype=np.float32)
    dlab = np.array([[0, 1, 0], [0, 0, 1]], dtype=np.float32)
    dist = np.array([[2, 1]])  # irrelevant item ranks first
    # order: db1 (irrelevant), db0 (relevant): AP = (1/2)/1
    assert abs(mean_average_precision_np(dist, qlab, dlab, R=2) - 0.5) < 1e-12


def test_precision_at_radius():
    qlab = np.eye(2, dtype=np.float32)[[0]]
    dlab = np.eye(2, dtype=np.float32)[[0, 1, 0]]
    dist = np.array([[1, 2, 5]])
    # within radius 2: items 0 (rel) and 1 (not): precision 1/2
    assert precision_at_radius_np(dist, qlab, dlab, radius=2) == 0.5
    # radius 0: nothing retrieved -> 0
    assert precision_at_radius_np(dist, qlab, dlab, radius=0) == 0.0


def test_pr_curve_monotone_recall():
    rng = np.random.default_rng(0)
    dist = rng.integers(0, 32, size=(10, 200))
    qlab = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 10)]
    dlab = np.eye(4, dtype=np.float32)[rng.integers(0, 4, 200)]
    p, r = precision_recall_curve_np(dist, qlab, dlab, n_points=20)
    assert (np.diff(r) >= -1e-12).all()
    assert r[-1] >= 0.999  # full sweep reaches recall 1
    assert p.shape == r.shape
