"""Real-extractor code paths with locally-built tiny backbones (VERDICT r2
next #6).

Round 2 only ever exercised StubExtractor; the HF-preprocessing/pooling
logic in VJEPA2Extractor / LanguageModelExtractor was untested. Here both
run end-to-end against REAL HF classes (a tiny ``VJEPA2Model`` +
``VJEPA2VideoProcessor``, a tiny ``LlamaModel`` + in-memory tokenizer)
constructed locally — no network — so the exact production code path
(processor → frozen forward → reshape/pool) executes
(reference: encoders/vision/vjepa2_extractor.py:51-96,
encoders/modality_infrastructure.py:192-308).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class _VideoProcessorStandIn:
    """Same call interface as VJEPA2VideoProcessor (which needs torchvision,
    absent from this image): list of HWC frames → resized/normalized
    ``pixel_values_videos`` (B, T, C, H, W) in a BatchFeature with
    ``.to(device)`` — the contract VJEPA2Extractor codes against."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, frames, return_tensors="pt"):
        from transformers import BatchFeature

        vids = []
        for f in frames:
            a = torch.tensor(np.asarray(f), dtype=torch.float32) / 255.0
            a = a.permute(2, 0, 1)[None]  # (1, C, H, W)
            a = torch.nn.functional.interpolate(
                a, size=(self.size, self.size), mode="bilinear",
                align_corners=False,
            )[0]
            vids.append((a - 0.5) / 0.5)
        return BatchFeature(
            {"pixel_values_videos": torch.stack(vids)[None]},  # (1, T, C, H, W)
            tensor_type=return_tensors,
        )


@pytest.fixture(scope="module")
def tiny_vjepa2():
    from transformers import VJEPA2Config, VJEPA2Model

    cfg = VJEPA2Config(
        patch_size=16, crop_size=64, frames_per_clip=4, tubelet_size=2,
        hidden_size=32, num_attention_heads=2, num_hidden_layers=2,
        pred_hidden_size=32, pred_num_attention_heads=2,
        pred_num_hidden_layers=2, pred_num_mask_tokens=2,
    )
    torch.manual_seed(0)
    model = VJEPA2Model(cfg)
    processor = _VideoProcessorStandIn(size=64)
    return model, processor, cfg


class TestVJEPA2ExtractorReal:
    def test_extract_native_embeddings(self, tiny_vjepa2):
        from deepearth_tpu.data.extractors import VJEPA2Extractor

        model, processor, cfg = tiny_vjepa2
        ex = VJEPA2Extractor(model=model, processor=processor, dtype="float16")
        assert ex.get_native_dim() == 32

        # two uint8 "images" — the production input type (PIL/ndarray)
        rng = np.random.default_rng(0)
        images = [rng.integers(0, 255, (80, 96, 3), np.uint8) for _ in range(2)]
        out = ex.extract_native_embeddings(images)

        # (frames/tubelet) * (crop/patch)^2 patches, fp16 storage
        n_patches = (cfg.frames_per_clip // cfg.tubelet_size) * (
            (64 // cfg.patch_size) ** 2
        )
        assert out.shape == (2, n_patches, 32)
        assert out.dtype == np.float16
        assert np.isfinite(out).all()
        # distinct images → distinct features; same image → deterministic
        out2 = ex.extract_native_embeddings([images[0]])
        np.testing.assert_array_equal(out2[0], out[0])
        assert not np.array_equal(out[0], out[1])

    def test_parallel_extraction_matches_serial(self, tiny_vjepa2):
        from deepearth_tpu.data.extractors import (
            VJEPA2Extractor,
            run_parallel_extraction,
        )

        model, processor, _ = tiny_vjepa2
        ex = VJEPA2Extractor(model=model, processor=processor)
        rng = np.random.default_rng(1)
        images = [rng.integers(0, 255, (64, 64, 3), np.uint8) for _ in range(5)]
        serial = ex.extract_native_embeddings(images)
        par = run_parallel_extraction(ex, images, n_workers=2, chunk_size=2)
        np.testing.assert_array_equal(par, serial)


@pytest.fixture(scope="module")
def tiny_lm():
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import LlamaConfig, LlamaModel, PreTrainedTokenizerFast

    vocab = {"[PAD]": 0, "[UNK]": 1}
    for i, w in enumerate(
        "live oak quercus virginiana palmetto florida plant tree the a".split()
    ):
        vocab[w] = i + 2
    tok = Tokenizer(WordLevel(vocab, unk_token="[UNK]"))
    tok.pre_tokenizer = Whitespace()
    tokenizer = PreTrainedTokenizerFast(
        tokenizer_object=tok, pad_token="[PAD]", unk_token="[UNK]"
    )
    cfg = LlamaConfig(
        vocab_size=len(vocab), hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        output_hidden_states=True,
    )
    torch.manual_seed(0)
    return LlamaModel(cfg), tokenizer


class TestLanguageModelExtractorReal:
    def test_pooled_and_sequence_paths(self, tiny_lm):
        from deepearth_tpu.data.extractors import LanguageModelExtractor

        model, tokenizer = tiny_lm
        ex = LanguageModelExtractor(model=model, tokenizer=tokenizer)
        assert ex.get_native_dim() == 48

        texts = ["live oak tree", "palmetto"]
        pooled = ex.extract_native_embeddings(texts)
        assert pooled.shape == (2, 48) and pooled.dtype == np.float32

        seq = ex.extract_native_embeddings(texts, pooled=False)
        assert seq.ndim == 3 and seq.shape[0] == 2 and seq.shape[2] == 48

        # masked-mean semantics: pad positions must not affect the pooled
        # vector — "palmetto" alone vs padded next to a longer text
        solo = ex.extract_native_embeddings(["palmetto"])
        np.testing.assert_allclose(pooled[1], solo[0], rtol=1e-4, atol=1e-5)

        # selectable layer (reference: modality_infrastructure.py:262-267)
        ex0 = LanguageModelExtractor(model=model, tokenizer=tokenizer, layer=0)
        emb0 = ex0.extract_native_embeddings(texts)
        assert not np.allclose(emb0, pooled)

    def test_tokenize_helper(self, tiny_lm):
        from deepearth_tpu.data.extractors import LanguageModelExtractor

        model, tokenizer = tiny_lm
        ex = LanguageModelExtractor(model=model, tokenizer=tokenizer)
        enc = ex.tokenize(["live oak", "the quercus virginiana tree"])
        assert enc["input_ids"].shape[0] == 2
        assert enc["attention_mask"].shape == enc["input_ids"].shape
        # padding to the longest element
        assert (enc["attention_mask"][0] == 0).any()
