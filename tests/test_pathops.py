"""TextSnake decode kernels: merge_disks and min_connect_path goldens
(mmocr test style, cf. tests/test_utils/test_wrapper.py)."""

import numpy as np

from my_ocr_spark.kernel import pathops as po


def test_merge_disks_absorbs_overlapping():
    disks = [[0, 0, 5, 0.9], [1, 0, 5, 0.8], [100, 0, 5, 0.7]]
    out = po.merge_disks(disks, 0.5)
    assert out.shape == (2, 4)
    # highest-scored absorbs the overlapping second: component-wise mean
    assert np.allclose(out[0], [0.5, 0.0, 5.0, 0.85])
    assert np.allclose(out[1], [100, 0, 5, 0.7])


def test_merge_disks_no_overlap_identity():
    disks = [[0, 0, 1, 0.5], [10, 0, 1, 0.9], [20, 0, 1, 0.1]]
    out = po.merge_disks(disks, 0.5)
    # emitted in score order, unchanged
    assert np.allclose(out, [[10, 0, 1, 0.9], [0, 0, 1, 0.5],
                             [20, 0, 1, 0.1]])


def test_merge_disks_chain_not_transitive():
    # B overlaps A and C, but A is taken first and absorbs only B;
    # C survives separately (greedy, not transitive closure)
    disks = [[0, 0, 4, 0.9], [3, 0, 4, 0.8], [7, 0, 4, 0.7]]
    out = po.merge_disks(disks, 0.5)
    assert out.shape == (2, 4)
    assert np.allclose(out[0], [1.5, 0, 4, 0.85])
    assert np.allclose(out[1], [7, 0, 4, 0.7])


def test_merge_disks_score_tie_stable():
    disks = [[0, 0, 5, 0.5], [1, 0, 5, 0.5]]
    out = po.merge_disks(disks, 0.5)
    # tie broken by input index: disk 0 leads the merge
    assert out.shape == (1, 4)
    assert np.allclose(out[0], [0.5, 0, 5, 0.5])


def test_merge_disks_empty():
    assert po.merge_disks(np.empty((0, 4)), 0.5).shape == (0, 4)


def test_min_connect_path_collinear_is_sorted():
    xs = [7, 1, 5, 3, 9, 0]
    pts = [[float(x), 0.0] for x in xs]
    order = po.canonical_path_order(pts)
    assert [xs[i] for i in order] == sorted(xs)


def test_min_connect_path_visits_all_once():
    rng = np.random.RandomState(3)
    pts = rng.randint(0, 100, size=(20, 2)).astype(float).tolist()
    order = po.min_connect_path(pts)
    assert sorted(order) == list(range(20))


def test_min_connect_path_l_shape_golden():
    # L-shaped chain: greedy two-ended traversal follows the chain
    pts = [[0.0, 0.0], [0.0, 1.0], [0.0, 2.0], [1.0, 2.0], [2.0, 2.0]]
    order = po.canonical_path_order(pts)
    assert order == [0, 1, 2, 3, 4]


def test_min_connect_path_trivial():
    assert po.min_connect_path([]) == []
    assert po.min_connect_path([[1.0, 2.0]]) == [0]
    assert po.canonical_path_order([[5.0, 0.0], [1.0, 0.0]]) == [1, 0]
