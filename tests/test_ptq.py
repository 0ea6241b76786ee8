"""PTQ pipeline tests: quantization reduces to per-layer scheme application,
dead columns handled, ppl sanity (quantized ppl close to fp on tiny model)."""

import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from mxq_tpu.models import llama
from mxq_tpu.ptq import calibrate, data as ptq_data
from mxq_tpu.eval import ppl as ppl_eval
from mxq_tpu import scheme

CFG = llama.LlamaConfig.tiny()


@pytest.mark.slow
def test_ptq_quantizes_all_linears():
    params = llama.init_params(CFG, jax.random.PRNGKey(0))
    ids = jnp.asarray(ptq_data.get_calibration_batch(4, 32, vocab_size=CFG.vocab_size))
    qparams, packed = calibrate.ptq_quantize(params, CFG, ids)
    assert packed is None
    for name in llama.LAYER_LINEARS:
        w0 = np.asarray(params["layers"][name])
        wq = np.asarray(qparams["layers"][name])
        assert not np.allclose(w0, wq), name
        # each layer weight equals the scheme applied to it (no dead cols here)
        ref = np.asarray(jax.vmap(
            lambda w: scheme.mxq_fake_quant_ptq(w.T, CFG.scheme).T)(
                params["layers"][name]))
        np.testing.assert_allclose(wq, ref, rtol=1e-5, atol=1e-6)


def test_ptq_packed_mode_roundtrips():
    from mxq_tpu import packfmt
    params = llama.init_params(CFG, jax.random.PRNGKey(1))
    ids = jnp.asarray(ptq_data.get_calibration_batch(2, 32, vocab_size=CFG.vocab_size))
    qparams, packed = calibrate.ptq_quantize(params, CFG, ids,
                                             calibrate.PTQConfig(mode="packed"))
    assert packed is not None
    # the packed artifact dequantizes to exactly the fake-quant weights
    p0 = jax.tree_util.tree_map(lambda l: l[0], packed["layers"]["q_proj"])
    w = qparams["layers"]["q_proj"][0]
    np.testing.assert_allclose(np.asarray(packfmt.unpack_dequant(p0, CFG.scheme)),
                               np.asarray(w), rtol=0, atol=1e-6)
    # and the packed model forward runs
    logits, _ = llama.forward(packed, jnp.arange(4)[None], CFG)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_ppl_quantized_close_to_fp():
    params = llama.init_params(CFG, jax.random.PRNGKey(2))
    tokens = ptq_data.get_eval_tokens(vocab_size=CFG.vocab_size, n_tokens=64 * 8)
    p_fp = ppl_eval.eval_ppl(params, CFG, tokens, seqlen=64)
    ids = jnp.asarray(ptq_data.get_calibration_batch(2, 32, vocab_size=CFG.vocab_size))
    qparams, _ = calibrate.ptq_quantize(params, CFG, ids)
    p_q = ppl_eval.eval_ppl(qparams, CFG, tokens, seqlen=64)
    assert np.isfinite(p_q) and np.isfinite(p_fp)
    # random init: ppl ~ vocab; quantization shouldn't blow it up
    assert p_q < p_fp * 3


def test_dataset_loaders_select_and_salt():
    """wikitext2/c4/ptb are selectable (lib/data.py:86-92); offline fallbacks
    are deterministic and differ per dataset; strict mode raises."""
    import pytest
    from mxq_tpu.ptq import data as ptq_data

    outs = {}
    for ds in ptq_data.DATASETS:
        b = ptq_data.get_calibration_batch(4, 64, vocab_size=512, seed=0,
                                           dataset=ds)
        assert b.shape == (4, 64) and b.dtype == np.int32
        outs[ds] = b
        t = ptq_data.get_eval_tokens(vocab_size=512, n_tokens=256, dataset=ds)
        assert t.ndim == 1
    assert not np.array_equal(outs["wikitext2"], outs["c4"])
    assert not np.array_equal(outs["c4"], outs["ptb"])
    # determinism
    again = ptq_data.get_calibration_batch(4, 64, vocab_size=512, seed=0,
                                           dataset="c4")
    np.testing.assert_array_equal(outs["c4"], again)
    with pytest.raises(ValueError):
        ptq_data.get_calibration_batch(1, 8, dataset="owt")
    with pytest.raises(RuntimeError):
        ptq_data.get_calibration_batch(1, 8, dataset="ptb", strict=True)
    with pytest.raises(RuntimeError):
        ptq_data.get_eval_tokens(dataset="c4", strict=True)


def test_ptq_chunked_matches_unchunked():
    """nsamples-chunked calibration (bounded activation residency) must
    reproduce the one-shot path exactly: the column stats only gate the
    dead-column zeroing, and summing chunk stats preserves the ==0 test."""
    params = llama.init_params(CFG, jax.random.PRNGKey(3))
    ids = jnp.asarray(ptq_data.get_calibration_batch(
        4, 32, vocab_size=CFG.vocab_size))
    q_ref, _ = calibrate.ptq_quantize(params, CFG, ids)
    q_chk, _ = calibrate.ptq_quantize(params, CFG, ids,
                                      calibrate.PTQConfig(chunk=2))
    for name in llama.LAYER_LINEARS:
        np.testing.assert_allclose(np.asarray(q_chk["layers"][name]),
                                   np.asarray(q_ref["layers"][name]),
                                   rtol=0, atol=1e-6, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ptq_sharded_matches_single_device():
    """Mesh-sharded calibration (activations over data axes, layer weights
    over (fsdp, tp)) reproduces the single-device result — the rebuild of
    the reference's multi-GPU hf_device_map calibration (prune.py:371-379)
    as real tensor sharding."""
    from mxq_tpu.parallel import sharding as shlib

    params = llama.init_params(CFG, jax.random.PRNGKey(4))
    ids = jnp.asarray(ptq_data.get_calibration_batch(
        4, 32, vocab_size=CFG.vocab_size))
    q_ref, _ = calibrate.ptq_quantize(params, CFG, ids)
    mesh = shlib.make_mesh(dp=2, fsdp=2, tp=2)
    q_sh, _ = calibrate.ptq_quantize(params, CFG, ids,
                                     calibrate.PTQConfig(chunk=2), mesh=mesh)
    for name in llama.LAYER_LINEARS:
        np.testing.assert_allclose(np.asarray(q_sh["layers"][name]),
                                   np.asarray(q_ref["layers"][name]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ptq_sharded_packed_mode():
    """Sharded + packed: the 70B-class calibration path end to end on the
    virtual mesh (tiny shapes) producing a packable artifact."""
    from mxq_tpu.parallel import sharding as shlib

    params = llama.init_params(CFG, jax.random.PRNGKey(5))
    ids = jnp.asarray(ptq_data.get_calibration_batch(
        4, 32, vocab_size=CFG.vocab_size))
    mesh = shlib.make_mesh(dp=1, fsdp=2, tp=4)
    qparams, packed = calibrate.ptq_quantize(
        params, CFG, ids, calibrate.PTQConfig(mode="packed", chunk=2),
        mesh=mesh)
    assert packed is not None
    logits, _ = llama.forward(qparams, jnp.arange(4)[None], CFG)
    assert np.all(np.isfinite(np.asarray(logits)))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ptq_sharded_hybrid_mesh_matches_single_device():
    """Calibration over a HYBRID (dcn x ici) mesh — the multi-host PTQ
    topology — reproduces the single-device result."""
    from mxq_tpu.parallel import multihost

    params = llama.init_params(CFG, jax.random.PRNGKey(6))
    ids = jnp.asarray(ptq_data.get_calibration_batch(
        4, 32, vocab_size=CFG.vocab_size))
    q_ref, _ = calibrate.ptq_quantize(params, CFG, ids)
    mesh = multihost.make_hybrid_mesh(dcn=2, dp=1, fsdp=2, tp=2)
    q_sh, _ = calibrate.ptq_quantize(params, CFG, ids,
                                     calibrate.PTQConfig(chunk=2), mesh=mesh)
    for name in llama.LAYER_LINEARS:
        np.testing.assert_allclose(np.asarray(q_sh["layers"][name]),
                                   np.asarray(q_ref["layers"][name]),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
