"""Tests for DAVIS J/F metrics vs hand-computed and reference-semantic cases."""

import numpy as np

from rmnet_tpu.utils.metrics import Metrics, get_iou, get_f_score, seg2bmap, _disk


def test_iou_basic():
    a = np.zeros((10, 10), np.uint8)
    b = np.zeros((10, 10), np.uint8)
    a[:5, :] = 1
    b[:, :5] = 1
    # intersection 25, union 75
    assert abs(get_iou(a, b) - 25 / 75) < 1e-6
    assert get_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_seg2bmap_square():
    seg = np.zeros((8, 8), bool)
    seg[2:6, 2:6] = True
    b = seg2bmap(seg)
    # boundary of a 4x4 square: all 16 minus inner 2x2... with the reference's
    # shifted-diff definition the left/top edges plus the pixels adjacent to
    # the right/bottom outside edges light up; verify exact golden
    expected = np.zeros((8, 8), bool)
    # reference semantics: b = seg^e | seg^s | seg^se with shifted copies
    e = np.zeros_like(seg); e[:, :-1] = seg[:, 1:]
    s = np.zeros_like(seg); s[:-1, :] = seg[1:, :]
    se = np.zeros_like(seg); se[:-1, :-1] = seg[1:, 1:]
    expected = seg ^ e | seg ^ s | seg ^ se
    expected[-1, :] = seg[-1, :] ^ e[-1, :]
    expected[:, -1] = seg[:, -1] ^ s[:, -1]
    expected[-1, -1] = 0
    np.testing.assert_array_equal(b, expected)


def test_disk_matches_skimage_semantics():
    # skimage.morphology.disk(2) golden (hardcoded)
    golden2 = np.array(
        [
            [0, 0, 1, 0, 0],
            [0, 1, 1, 1, 0],
            [1, 1, 1, 1, 1],
            [0, 1, 1, 1, 0],
            [0, 0, 1, 0, 0],
        ],
        bool,
    )
    np.testing.assert_array_equal(_disk(2), golden2)


def test_f_score_perfect_and_disjoint():
    m = np.zeros((64, 64), np.uint8)
    m[20:40, 20:40] = 1
    assert get_f_score(m, m) == 1.0
    other = np.zeros((64, 64), np.uint8)
    other[50:60, 50:60] = 1
    assert get_f_score(m, other) < 0.5
    # empty/empty -> precision=recall=1
    assert get_f_score(np.zeros((32, 32)), np.zeros((32, 32))) == 1.0


def test_metrics_get_and_better_than():
    T, H, W = 3, 32, 32
    gt = np.zeros((T, H, W), np.uint8)
    gt[:, 5:20, 5:20] = 1
    pred = gt.copy()
    j, f, jf = Metrics.get(pred, gt)
    assert j == 1.0 and f == 1.0 and jf == 1.0

    pred2 = np.zeros_like(gt)
    pred2[:, 7:22, 7:22] = 1
    j2, f2, jf2 = Metrics.get(pred2, gt)
    assert 0 < j2 < 1

    m1 = Metrics("JF-Mean", [j, f, jf])
    m2 = Metrics("JF-Mean", [j2, f2, jf2])
    assert m1.better_than(m2)
    assert not m2.better_than(m1)
    assert m2.better_than(None)
    # dict construction
    m3 = Metrics("JF-Mean", {"JF-Mean": 0.5})
    assert m3.state_dict()["JF-Mean"] == 0.5


def test_dilate_disk_equals_structure_dilation():
    """The EDT-threshold dilation must be BIT-identical to
    binary_dilation(structure=_disk(r)) — same L2 ball, O(N) instead of
    O(N * disk area)."""
    import scipy.ndimage

    from rmnet_tpu.utils.metrics import _disk, _dilate_disk

    rs = np.random.RandomState(3)
    for density in (0.0, 0.002, 0.05):
        b = rs.rand(77, 133) < density
        for r in (1, 4, 9):
            ref = scipy.ndimage.binary_dilation(b, structure=_disk(r))
            np.testing.assert_array_equal(_dilate_disk(b, r), ref)


def test_metrics_get_parallel_matches_serial():
    """Frame-parallel scoring must be bit-identical to serial (results are
    collected in frame order; the mean reduction sees the same sequence)."""
    from rmnet_tpu.utils.metrics import Metrics

    rs = np.random.RandomState(5)
    gt = rs.randint(0, 4, (6, 60, 90)).astype(np.uint8)
    pred = gt.copy()
    pred[:, 10:30, 20:50] = rs.randint(0, 4, (6, 20, 30))
    serial = Metrics.get(pred, gt)
    parallel = Metrics.get(pred, gt, n_workers=4)
    assert serial == parallel
