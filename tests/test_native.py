"""Native fastops tests: build, correctness vs numpy/cv2, and fallback."""

import numpy as np
import pytest

from intact_tpu import native


class TestNative:
    def test_builds(self):
        assert native.available(), "g++ build of fastops.cpp failed"

    def test_normalize_matches_numpy(self, rng):
        img = rng.integers(0, 256, (17, 9, 3)).astype(np.uint8)
        out = native.normalize_u8(img)
        ref = img.astype(np.float32) * (2.0 / 255.0) - 1.0
        np.testing.assert_allclose(out, ref, atol=1e-6)
        assert out.dtype == np.float32

    def test_resize_matches_cv2(self, rng):
        cv2 = pytest.importorskip("cv2")
        img = rng.integers(0, 256, (64, 48, 3)).astype(np.uint8)
        out = native.resize_bilinear(img, 32, 24)
        ref = cv2.resize(img, (24, 32), interpolation=cv2.INTER_LINEAR)
        # same convention; off-by-one from rounding allowed
        assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_assemble_batch_mixed_sizes(self, rng):
        frames = [
            rng.integers(0, 256, (64, 64, 3)).astype(np.uint8),
            rng.integers(0, 256, (32, 32, 3)).astype(np.uint8),  # resized
            rng.integers(0, 256, (64, 64, 3)).astype(np.uint8),
        ]
        out = native.assemble_batch(frames, 64, 64)
        assert out.shape == (3, 64, 64, 3) and out.dtype == np.float32
        ref0 = frames[0].astype(np.float32) * (2 / 255) - 1
        np.testing.assert_allclose(out[0], ref0, atol=1e-6)
        # float32 affine: 255*(2/255)-1 lands at 1+1ulp
        assert out.min() >= -1.0 - 1e-5 and out.max() <= 1.0 + 1e-5

    def test_identity_resize(self, rng):
        img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
        np.testing.assert_array_equal(native.resize_bilinear(img, 16, 16), img)
