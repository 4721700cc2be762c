"""FAST action tokenizer tests: DCT+quantize+BPE round trip, compression,
vocab-tail mapping, persistence."""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")

from intact_tpu.models.pi0fast.fast_tokenizer import FastTokenizer  # noqa: E402


def _corpus(n=64, h=8, d=7, seed=0):
    """Smooth bridge-like normalized action chunks (DCT-compressible)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, h)[None, :, None]
    freq = rng.uniform(0.5, 2.0, (n, 1, d))
    phase = rng.uniform(0, np.pi, (n, 1, d))
    amp = rng.uniform(0.1, 0.8, (n, 1, d))
    return (amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.float32)


@pytest.fixture(scope="module")
def tok():
    return FastTokenizer(scale=20.0, max_token=512).fit(_corpus())


class TestRoundTrip:
    def test_reconstruction_within_quantization(self, tok):
        chunks = _corpus(8, seed=1)
        for a in chunks:
            ids = tok.encode(a)
            back = tok.decode(ids, *a.shape)
            # orthonormal DCT quantization error <= 0.5/scale per coef
            assert np.abs(back - a).max() < 0.15
            np.testing.assert_allclose(back, a, atol=0.15)

    def test_bpe_compresses(self, tok):
        a = _corpus(1, seed=2)[0]
        raw_len = a.size  # symbols before BPE
        assert len(tok.encode(a)) < raw_len

    def test_batch_tail_vocab_mapping(self, tok):
        chunks = _corpus(4, seed=3)
        V = 257_152
        ids, mask = tok.encode_batch(chunks, max_len=48, vocab_size=V)
        assert ids.shape == (4, 48) and mask.any(axis=1).all()
        assert ids[mask].min() >= V - tok.max_token
        back = tok.decode_batch(ids, mask, chunks.shape[1], chunks.shape[2],
                                vocab_size=V)
        np.testing.assert_allclose(back, chunks, atol=0.15)

    def test_malformed_ids_dont_crash(self, tok):
        out = tok.decode([0, 99999, 3], horizon=8, dim=7)
        assert out.shape == (8, 7) and np.isfinite(out).all()


class TestPersistence:
    def test_save_load_identical(self, tok, tmp_path):
        p = tmp_path / "fast.json"
        tok.save(p)
        tok2 = FastTokenizer.load(p)
        a = _corpus(1, seed=4)[0]
        assert tok.encode(a) == tok2.encode(a)


class TestTraining:
    def test_fit_learns_merges(self):
        t = FastTokenizer(scale=20.0, max_token=300).fit(_corpus(16))
        assert len(t.merges) > 0
        # merged ids stay under the vocabulary bound
        a = _corpus(1, seed=5)[0]
        assert max(t.encode(a)) < t.max_token
