"""Tokenizer wiring tests.

Pins the reference's language-tokenization conventions
(`src/model/mvla/modeling_mvla.py:388-407`): pad to tokenizer_max_length,
"\n" suffix appended to the instruction, ids/mask shapes and dtypes — and
the round-2 policy that a configured tokenizer asset must load or RAISE
(no silent hash fallback).

The environment has no network and no cached PaliGemma asset, so the golden
mechanics run against a tiny HF-format tokenizer constructed on disk; a
second golden pinning real PaliGemma ids is gated on asset availability.
"""

import json
import os

import numpy as np
import pytest

from intact_tpu.models.tokenizer import (
    HashTokenizer,
    HFTokenizer,
    make_tokenizer,
)

VOCAB = {
    "<pad>": 0,
    "<eos>": 1,
    "<bos>": 2,
    "<unk>": 3,
    "pick": 4,
    "up": 5,
    "the": 6,
    "carrot\n": 7,
    "carrot": 8,
    "plate\n": 9,
    "put": 10,
}


@pytest.fixture(scope="module")
def hf_asset(tmp_path_factory):
    """Write a minimal valid HF fast-tokenizer directory: word-level model,
    space split (newline stays attached to the final word, standing in for
    SentencePiece's explicit newline token), <bos> prefix via post-processor,
    <pad> right padding — the same mechanics the PaliGemma tokenizer has."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers, processors

    tok = Tokenizer(models.WordLevel(VOCAB, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Split(" ", behavior="removed")
    tok.post_processor = processors.TemplateProcessing(
        single="<bos> $A",
        special_tokens=[("<bos>", VOCAB["<bos>"])],
    )
    d = tmp_path_factory.mktemp("tok")
    tok.save(str(d / "tokenizer.json"))
    (d / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "pad_token": "<pad>",
        "bos_token": "<bos>",
        "eos_token": "<eos>",
        "unk_token": "<unk>",
        "model_max_length": 72,
    }))
    return str(d)


class TestHFTokenizer:
    def test_golden_ids(self, hf_asset):
        t = HFTokenizer(hf_asset, max_length=8)
        ids, mask = t(["pick up the carrot"])
        # bos + pick + up + the + carrot\n (suffix newline merged into last
        # word by this asset; real PaliGemma emits a separate "\n" token)
        np.testing.assert_array_equal(ids[0], [2, 4, 5, 6, 7, 0, 0, 0])
        np.testing.assert_array_equal(mask[0], [1, 1, 1, 1, 1, 0, 0, 0])
        assert ids.dtype == np.int32 and mask.dtype == bool

    def test_newline_suffix_changes_ids(self, hf_asset):
        """The "\n" suffix is load-bearing: 'carrot' alone maps to a
        different id than the suffixed 'carrot\n' the policy feeds."""
        t = HFTokenizer(hf_asset, max_length=8)
        ids, _ = t(["pick up the carrot"])
        raw = t.tok(["pick up the carrot"], return_tensors="np")["input_ids"]
        assert ids[0, 4] == VOCAB["carrot\n"]
        assert raw[0, -1] == VOCAB["carrot"]

    def test_batch_padding_and_truncation(self, hf_asset):
        t = HFTokenizer(hf_asset, max_length=4)
        ids, mask = t(["put the carrot on the plate", "pick up"])
        assert ids.shape == (2, 4) and mask.shape == (2, 4)
        assert mask[0].all()  # truncated: every slot real
        # "pick up" -> suffixed "up\n" is unknown to this tiny vocab -> <unk>
        np.testing.assert_array_equal(ids[1], [2, VOCAB["pick"], VOCAB["<unk>"], 0])
        np.testing.assert_array_equal(mask[1], [1, 1, 1, 0])

    def test_max_length_override(self, hf_asset):
        t = HFTokenizer(hf_asset, max_length=8)
        ids, _ = t(["pick up"], max_length=16)
        assert ids.shape == (1, 16)


class TestMakeTokenizer:
    def test_explicit_path_failure_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="refusing"):
            make_tokenizer(str(tmp_path / "nonexistent"))

    def test_explicit_hash(self):
        assert isinstance(make_tokenizer("hash"), HashTokenizer)

    def test_none_falls_back_with_warning(self, monkeypatch, caplog):
        monkeypatch.delenv("VLA_TOKENIZER_PATH", raising=False)
        import intact_tpu.models.tokenizer as m

        monkeypatch.setattr(m, "_warned_hash_fallback", [False])
        with caplog.at_level("WARNING", logger="intact_tpu.tokenizer"):
            tok = make_tokenizer(None)
        assert isinstance(tok, HashTokenizer)
        assert any("HashTokenizer" in r.message for r in caplog.records)

    def test_env_var_resolution(self, monkeypatch, hf_asset):
        monkeypatch.setenv("VLA_TOKENIZER_PATH", hf_asset)
        assert isinstance(make_tokenizer(None), HFTokenizer)

    def test_env_var_bad_path_raises(self, monkeypatch, tmp_path):
        monkeypatch.setenv("VLA_TOKENIZER_PATH", str(tmp_path / "nope"))
        with pytest.raises(RuntimeError):
            make_tokenizer(None)


class TestConfigResolution:
    def test_pipeline_overrides_json_overrides_nothing(self, monkeypatch):
        from intact_tpu.config.pipeline import TrainPipelineConfig

        monkeypatch.delenv("VLA_TOKENIZER_PATH", raising=False)
        cfg = TrainPipelineConfig(model_cfg={"type": "pi0", "tokenizer_path": "from-json"})
        assert cfg.resolve_tokenizer_path() == "from-json"
        monkeypatch.setenv("VLA_TOKENIZER_PATH", "from-env")
        assert cfg.resolve_tokenizer_path() == "from-env"
        cfg.tokenizer_path = "from-field"
        assert cfg.resolve_tokenizer_path() == "from-field"

    def test_model_jsons_name_the_asset(self):
        import pathlib

        for name in ["pi0_finetune_bridge", "pi0fast_finetune_bridge", "mvla_bridge"]:
            d = json.loads(
                (pathlib.Path(__file__).parent.parent / f"config/models/{name}.json").read_text()
            )
            assert d["tokenizer_path"] == "google/paligemma-3b-pt-224"


PALIGEMMA = os.environ.get("VLA_TOKENIZER_PATH", "google/paligemma-3b-pt-224")


def _paligemma_available() -> bool:
    try:
        from transformers import AutoTokenizer

        AutoTokenizer.from_pretrained(PALIGEMMA)
        return True
    except Exception:
        return False


@pytest.mark.skipif(not _paligemma_available(), reason="PaliGemma tokenizer asset not present")
def test_real_paligemma_golden():
    """With the real asset: pin bos=2, trailing newline token, 72-pad —
    the exact prompt encoding converted Pi0 checkpoints were trained on
    (reference modeling_mvla.py:388-407)."""
    t = HFTokenizer(PALIGEMMA, max_length=72)
    ids, mask = t(["pick up the carrot"])
    assert ids.shape == (1, 72)
    assert ids[0, 0] == 2  # <bos>
    n = int(mask[0].sum())
    assert t.tok.decode(ids[0, :n]).endswith("\n")
