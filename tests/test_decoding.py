"""AR action-token decoding tests (Magma/SpatialVLA vocab-offset scheme)."""

import numpy as np

from intact_tpu.serve.decoding import (
    actions_to_tokens,
    denormalize_with_quantiles,
    make_action_bins,
    tokens_to_actions,
)


class TestDecoding:
    def test_bins_cover_range(self):
        bins = make_action_bins(256)
        assert bins.shape == (256,)
        assert -1 < bins[0] < -0.99 and 0.99 < bins[-1] < 1

    def test_roundtrip(self):
        vocab = 50_000
        actions = np.linspace(-0.95, 0.95, 7)
        tokens = actions_to_tokens(actions, vocab)
        assert (tokens >= vocab - 256).all() and (tokens < vocab).all()
        back = tokens_to_actions(tokens, vocab)
        np.testing.assert_allclose(back, actions, atol=1.0 / 256)

    def test_out_of_range_ids_clip(self):
        out = tokens_to_actions(np.array([0, 10**6]), vocab_size=50_000)
        assert np.isfinite(out).all()
        assert (np.abs(out) <= 1).all()

    def test_quantile_denorm_respects_mask(self):
        a = np.array([0.0, 1.0, -1.0])
        q01, q99 = np.array([-2.0, 0.0, 0.0]), np.array([2.0, 4.0, 1.0])
        mask = np.array([True, True, False])
        out = denormalize_with_quantiles(a, q01, q99, mask)
        np.testing.assert_allclose(out, [0.0, 4.0, -1.0])
