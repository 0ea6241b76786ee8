"""End-to-end cross-framework PTQ parity: the reference's ``nas_quant``
pipeline (torch, /root/reference) and our ``ptq_quantize`` run on the SAME
tiny Llama checkpoint with the SAME calibration samples; the resulting
quant-dequantized projection weights must agree.

This is the whole-pipeline analogue of the per-op golden tests: it exercises
the reference's Catcher capture -> per-layer hook -> fasterquant -> re-forward
schedule (prune.py:326-425) against our jitted layer-sequential driver."""

import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from mxq_tpu.models import hf_loader, llama
from mxq_tpu.ptq import calibrate

REF = "/root/reference/mxq_quant"


SHAPES = {
    # MHA, the r1/r2 shape
    "mha": dict(hidden_size=128, intermediate_size=192,
                num_attention_heads=4, num_key_value_heads=4),
    # GQA (the 70B shape class), different block counts per linear
    "gqa": dict(hidden_size=192, intermediate_size=256,
                num_attention_heads=6, num_key_value_heads=2),
}


@pytest.fixture(scope="module", params=sorted(SHAPES))
def tiny_ckpt(request, tmp_path_factory):
    torch = pytest.importorskip("torch")
    import transformers

    path = tmp_path_factory.mktemp(f"hf_tiny_ptq_{request.param}")
    c = transformers.LlamaConfig(
        vocab_size=256, num_hidden_layers=2, max_position_embeddings=64,
        tie_word_embeddings=False, **SHAPES[request.param])
    torch.manual_seed(3)
    model = transformers.LlamaForCausalLM(c)
    model.eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path)


def run_reference_ptq(path, samples):
    """Drive the reference nas_quant on CPU with injected calibration data."""
    import torch
    import transformers

    sys.path.insert(0, REF)
    from lib import prune as ref_prune

    model = transformers.AutoModelForCausalLM.from_pretrained(
        path, torch_dtype=torch.float32)
    model.seqlen = samples.shape[1]
    model.eval()
    model.hf_device_map = {}  # nas_quant expects accelerate's map (prune.py:335)

    # The reference replays captured inputs by calling decoder layers
    # directly (prune.py:389-417), which predates transformers'
    # position_embeddings argument — supply it when missing.
    from transformers.models.llama import modeling_llama as ml
    orig_fwd = ml.LlamaDecoderLayer.forward
    rotary = model.model.rotary_emb

    def patched(self, hidden_states, attention_mask=None, position_ids=None,
                position_embeddings=None, **kw):
        if position_embeddings is None:
            if position_ids is None:
                position_ids = torch.arange(
                    hidden_states.shape[1])[None].to(hidden_states.device)
            position_embeddings = rotary(hidden_states, position_ids)
        return orig_fwd(self, hidden_states, attention_mask=attention_mask,
                        position_ids=position_ids,
                        position_embeddings=position_embeddings, **kw)

    ml.LlamaDecoderLayer.forward = patched

    # no CUDA on this host (mxqgpt.py:445 calls cuda.synchronize; data loader
    # would hit the network) — patch both.
    torch.cuda.synchronize = lambda *a, **k: None
    loaders = [(torch.tensor(s[None]), None) for s in samples]
    ref_prune.get_loaders = lambda *a, **k: (loaders, None)

    class Args:
        nsamples = len(samples)
        seed = 0
        seqlen = samples.shape[1]
        save = None  # prune.py:410 gates stats dumping on args.save

    ref_prune.nas_quant(Args(), model, None, torch.device("cpu"))
    out = {}
    for i, layer in enumerate(model.model.layers):
        out[i] = {
            "q_proj": layer.self_attn.q_proj.weight.detach().numpy(),
            "k_proj": layer.self_attn.k_proj.weight.detach().numpy(),
            "v_proj": layer.self_attn.v_proj.weight.detach().numpy(),
            "o_proj": layer.self_attn.o_proj.weight.detach().numpy(),
            "gate_proj": layer.mlp.gate_proj.weight.detach().numpy(),
            "up_proj": layer.mlp.up_proj.weight.detach().numpy(),
            "down_proj": layer.mlp.down_proj.weight.detach().numpy(),
        }
    return out


def test_full_ptq_pipeline_matches_reference(tiny_ckpt):
    rng = np.random.RandomState(0)
    samples = rng.randint(0, 256, size=(4, 64)).astype(np.int64)

    ref_weights = run_reference_ptq(tiny_ckpt, samples)

    cfg, params = hf_loader.load_params(tiny_ckpt, dtype=jnp.float32)
    qparams, _ = calibrate.ptq_quantize(params, cfg,
                                        jnp.asarray(samples, jnp.int32))

    worst = 0.0
    for i in range(cfg.num_hidden_layers):
        for name in llama.LAYER_LINEARS:
            ours = np.asarray(qparams["layers"][name][i]).T  # [out, in]
            ref = ref_weights[i][name]
            d = np.abs(ours - ref).max()
            worst = max(worst, float(d))
            # measured envelope: 2.98e-8 (f32 rounding through identical
            # math); the gate sits 30x above it and 4 orders below what a
            # real PTQ-math drift would produce
            assert d < 1e-6, (i, name, d)
    # layer-0 inputs are identical => near-bit-exact there; later layers
    # accumulate tiny fp divergence through the re-forward
    print("max |ours - reference| over all quantized projections:", worst)
