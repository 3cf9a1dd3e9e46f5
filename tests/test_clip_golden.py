"""Golden parity: CLIP text encoder + BPE tokenizer vs the reference."""

import numpy as np
import pytest

import jax.numpy as jnp

from edtr_tpu.models.clip import CLIPTextEncoder
from edtr_tpu.utils import convert as C

from ref_loader import load_ref_module

pytestmark = pytest.mark.golden  # torch-oracle tier

TEXT_CFG = dict(context_length=16, vocab_size=512, width=32, heads=4, layers=3)
VISION_CFG = dict(image_size=32, layers=1, width=16, head_width=8, patch_size=16)


@pytest.fixture(scope="module")
def torch_clip():
    import torch

    ref_clip = load_ref_module("model.clip")
    m = ref_clip.FrozenOpenCLIPEmbedder(
        embed_dim=32, vision_cfg=VISION_CFG, text_cfg=TEXT_CFG, layer="penultimate"
    )
    m.eval()
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


def test_clip_text_parity(torch_clip):
    import torch

    g = np.random.default_rng(0)
    tokens = g.integers(0, 512, size=(2, 16)).astype(np.int64)
    with torch.no_grad():
        ref = torch_clip(torch.from_numpy(tokens)).numpy()

    sd = C.torch_state_dict_to_numpy(torch_clip.state_dict())
    params = C.convert_clip_text(sd, prefix="model", layers=2)  # penultimate: 3-1
    ours = CLIPTextEncoder(
        vocab_size=512, width=32, heads=4, layers=3, context_length=16,
        penultimate=True,
    ).apply({"params": params}, jnp.asarray(tokens, jnp.int32))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=3e-3, atol=3e-3)


def test_tokenizer_parity_with_reference():
    ref_tok = load_ref_module("model.open_clip.tokenizer")
    from edtr_tpu.data.tokenizer import tokenize

    prompts = ["", "a photo of a cat", "High-quality photograph, 8k!!"]
    ref = ref_tok.tokenize(prompts).numpy()
    ours = tokenize(prompts, context_length=77)
    np.testing.assert_array_equal(ours, ref)


def test_tokenizer_empty_prompt_without_vocab(monkeypatch):
    """default_prompt "" must tokenize even with no BPE table available."""
    import edtr_tpu.data.tokenizer as T

    tk = T.SimpleTokenizer(bpe_path="/nonexistent")
    assert tk.encode("") == []
    with pytest.raises(RuntimeError):
        tk.encode("hello")
