"""Native motionkit kernels vs numpy fallback parity + speed sanity."""

import numpy as np
import pytest

from animate_anything_tpu.data import native
from animate_anything_tpu.metrics.motion import calculate_motion_score, get_moved_area_mask

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def _frames(f=6, h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.random((h, w, 3)) * 255).astype(np.uint8)
    out = []
    for i in range(f):
        fr = base.copy()
        fr[10:20, 5 + 4 * i : 15 + 4 * i] = [250, 10, 10]
        out.append(fr)
    return np.stack(out)


def test_moved_area_mask_parity():
    frames = _frames()
    m_native = get_moved_area_mask(frames, use_native=True)
    m_numpy = get_moved_area_mask(frames, use_native=False)
    # identical box masks
    np.testing.assert_array_equal(m_native, m_numpy)
    assert m_native.max() == 255


def test_moved_area_mask_thresholds():
    frames = _frames()
    big = get_moved_area_mask(frames, move_th=5, th=0)
    none = get_moved_area_mask(frames, move_th=250, th=0)
    assert big.sum() > 0
    assert none.sum() == 0


def test_motion_score_parity():
    frames = _frames()
    s_native = calculate_motion_score(frames, use_native=True)
    s_numpy = calculate_motion_score(frames, use_native=False)
    assert abs(s_native - s_numpy) <= 1  # float-order rounding tolerance
    static = np.repeat(frames[:1], 4, axis=0)
    assert calculate_motion_score(static) == 0


def test_resize_bilinear_sane():
    frame = _frames(f=1)[0]
    out = native.resize_bilinear(frame, 24, 32)
    assert out.shape == (24, 32, 3)
    # mean preserved approximately
    assert abs(float(out.mean()) - float(frame.mean())) < 8.0
