"""CLI smoke tests (tiny presets, synthetic data) + packed checkpoint roundtrip."""

import json
import numpy as np
import pytest
import jax.numpy as jnp
import jax

from mxq_tpu import cli
from mxq_tpu.models import llama
from mxq_tpu.utils import checkpoint as ckpt


@pytest.mark.slow
def test_cli_ptq_tiny(capsys, tmp_path):
    cli.main(["ptq", "--preset", "tiny", "--nsamples", "2", "--seqlen", "32",
              "--max_eval_windows", "2", "--mode", "packed",
              "--save_model", str(tmp_path / "m")])
    out = capsys.readouterr().out
    assert "ppl (quantized):" in out
    # reload the saved packed model and run a forward
    cfg, params = ckpt.load_params(str(tmp_path / "m"))
    logits, _ = llama.forward(params, jnp.arange(4)[None], cfg)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_cli_eval_ppl(capsys):
    cli.main(["eval-ppl", "--preset", "tiny", "--w_bits", "2",
              "--seqlen", "64", "--max_eval_windows", "2"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert np.isfinite(json.loads(out)["ppl"])


@pytest.mark.slow
def test_cli_train_tiny(capsys, tmp_path):
    cli.main(["train", "--preset", "tiny", "--w_bits", "2",
              "--batch_size", "2", "--block_size", "32", "--max_steps", "2",
              "--output_dir", str(tmp_path / "qat")])
    assert "trained to step" in capsys.readouterr().out


def test_cli_generate_data(capsys, tmp_path):
    cli.main(["generate-data", "--preset", "tiny", "--num_seeds", "2",
              "--length", "8", "--out_dir", str(tmp_path / "gen"), "--merge"])
    out = capsys.readouterr().out
    assert "merged 2 sequences" in out


def test_cli_serve(capsys):
    cli.main(["serve", "--preset", "tiny", "--slots", "2", "--max_len", "64",
              "--max_new_tokens", "4", "--requests", "3", "--kv_bits", "32"])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    res = json.loads(out)
    assert res["requests"] == 3


@pytest.mark.slow
def test_packed_checkpoint_roundtrip(tmp_path):
    cfg = llama.LlamaConfig.tiny(num_hidden_layers=1)
    params = llama.init_params(cfg, jax.random.PRNGKey(0))
    packed = llama.quantize_params_packed(params, cfg)
    ref, _ = llama.forward(packed, jnp.arange(4)[None], cfg)
    ckpt.save_params(str(tmp_path / "p"), packed, cfg)
    cfg2, params2 = ckpt.load_params(str(tmp_path / "p"))
    out, _ = llama.forward(params2, jnp.arange(4)[None], cfg2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
