"""End-to-end parity vs HuggingFace transformers: build a tiny random HF
Llama on CPU, save it, load it with our loader, and require logits to match.
This pins RoPE conventions, norm semantics, attention math, and the weight
transpose — the same contract the reference relies on by forking HF's
modeling_llama (LLM-QAT/models/modeling_llama_quant.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mxq_tpu.models import hf_loader, llama


@pytest.fixture(scope="module")
def hf_ckpt(tmp_path_factory):
    torch = pytest.importorskip("torch")
    import transformers

    path = tmp_path_factory.mktemp("hf_tiny")
    c = transformers.LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rms_norm_eps=1e-6, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(c)
    model.eval()
    model.save_pretrained(path, safe_serialization=True)

    ids = torch.randint(0, 512, (2, 12), generator=torch.Generator().manual_seed(1))
    with torch.no_grad():
        out = model(ids).logits.float().numpy()
    return str(path), ids.numpy(), out


def test_logits_match_hf(hf_ckpt):
    path, ids, hf_logits = hf_ckpt
    cfg, params = hf_loader.load_params(path, dtype=jnp.float32)
    assert cfg.num_key_value_heads == 2
    logits, _ = llama.forward(params, jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(logits), hf_logits,
                               rtol=5e-3, atol=5e-3)


def test_bf16_load(hf_ckpt):
    path, ids, hf_logits = hf_ckpt
    cfg, params = hf_loader.load_params(path, dtype=jnp.bfloat16)
    logits, _ = llama.forward(params, jnp.asarray(ids), cfg)
    # bf16 params: loose agreement
    corr = np.corrcoef(np.asarray(logits).ravel(), hf_logits.ravel())[0, 1]
    assert corr > 0.99
