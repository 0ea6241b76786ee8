"""Generate golden outputs by RUNNING the reference implementation on fixed seeds.

The reference (torch, CPU) is executed, never copied: we import its modules from
/root/reference, feed seeded random tensors through its quantizers, and record the
outputs as .npz files under tests/golden/. The JAX scheme module is then held to
these numbers bit-for-bit (see tests/test_scheme.py).

Run: python tools/make_goldens.py
"""

import os
import sys

import numpy as np
import torch

REF = "/root/reference"
sys.path.insert(0, os.path.join(REF, "LLM-QAT"))
sys.path.insert(0, os.path.join(REF, "mxq_quant"))

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
os.makedirs(OUT, exist_ok=True)

torch.manual_seed(0)


def save(name, **arrs):
    np.savez(os.path.join(OUT, name + ".npz"),
             **{k: np.asarray(v) for k, v in arrs.items()})
    print(f"wrote {name}: " + ", ".join(f"{k}{tuple(np.shape(v))}" for k, v in arrs.items()))


def qat_goldens():
    from models.utils_quant import MXAsymQuantizer, SymQuantizer, AsymQuantizer

    clip = torch.tensor([-2.0, 2.0])

    g = torch.Generator().manual_seed(42)
    w = torch.randn(32, 256, generator=g, dtype=torch.float32)
    out = MXAsymQuantizer.apply(w, clip, 2, False)
    # STE backward: grad of sum(out * coeff) wrt w
    w_g = w.clone().requires_grad_(True)
    coeff = torch.randn(32, 256, generator=g)
    # scale some weights outside the clip range to exercise the mask
    w_big = (w * 3.0).detach().requires_grad_(True)
    out_big = MXAsymQuantizer.apply(w_big, clip, 2, False)
    (out_big * coeff).sum().backward()
    save("qat_mxasym", w=w.numpy(), out=out.detach().numpy(),
         w_big=w_big.detach().numpy(), coeff=coeff.numpy(),
         grad_big=w_big.grad.numpy())

    x = torch.randn(8, 256, generator=g)
    save("qat_sym_a8", x=x.numpy(),
         out=SymQuantizer.apply(x, clip, 8, False).numpy(),
         out_lw=SymQuantizer.apply(x, clip, 8, True).numpy())
    x4 = torch.randn(8, 64, generator=g)
    save("qat_asym_a4", x=x4.numpy(),
         out=AsymQuantizer.apply(x4, clip, 4, False).numpy(),
         out_lw=AsymQuantizer.apply(x4, clip, 4, True).numpy())

    # The reference's 3-D SymQuantizer branch (utils_quant.py:56-66) slices
    # the SEQUENCE axis with a feature-axis group count on [B, T, H] — per-
    # token full-row maxima for t < (H//128)*128 and an uninitialized
    # (max=0) tail beyond. Capture it verbatim so the compatibility shim
    # (scheme.sym_fake_quant_ref3d) is pinned bit-for-bit, and the delta vs
    # the fixed groupwise semantics is quantified (tests/test_scheme.py).
    # T=300 > 2*128 exercises the zero-max tail.
    x3 = torch.randn(2, 300, 256, generator=g)
    save("qat_sym3d", x=x3.numpy(),
         out=SymQuantizer.apply(x3, clip, 8, False).numpy())


def ptq_goldens():
    from lib.quantizer import Quantizer
    import torch.nn as nn
    from lib.mxqgpt import MXQGPT

    g = torch.Generator().manual_seed(7)

    # Bare Quantizer: 2-bit groupwise + qq_scale_bits=4 (as mxqgpt.py:424-428)
    w1 = torch.randn(32, 16, generator=g)
    q = Quantizer()
    q.configure(bits=2, perchannel=True, sym=False, qq_scale_bits=4)
    q.find_params(w1, weight=True)
    save("ptq_quantizer_2b", w=w1.numpy(),
         out=q.quantize_dequantize(w1).numpy(),
         scale=q.scale.numpy(), zero=q.zero.numpy(),
         scale_codes=q.quant_scale.numpy())

    # 4-bit rowwise + qq (as mxqgpt.py:433-436)
    w4 = torch.randn(32, 64, generator=g)
    q4 = Quantizer()
    q4.configure(bits=4, perchannel=True, sym=False, qq_scale_bits=4)
    q4.find_params(w4, weight=True)
    save("ptq_quantizer_4b", w=w4.numpy(),
         out=q4.quantize_dequantize(w4).numpy(),
         scale=q4.scale.numpy(), zero=q4.zero.numpy())

    # Full fasterquant on a small linear, including a dead input column.
    # (fasterquant unconditionally calls torch.cuda.synchronize, mxqgpt.py:445 —
    # no-op it so the reference runs on CPU.)
    torch.cuda.synchronize = lambda *a, **k: None
    layer = nn.Linear(128, 32, bias=False)
    with torch.no_grad():
        layer.weight.copy_(torch.randn(32, 128, generator=g))
    w_before = layer.weight.data.clone().numpy()
    eng = MXQGPT(layer)
    inp = torch.randn(4, 128, generator=g)
    inp[:, 5] = 0.0  # dead column -> W[:, 5] must be zeroed (mxqgpt.py:401-403)
    eng.add_batch(inp, None)
    eng.fasterquant(blocksize=16, percdamp=0.01)
    save("ptq_fasterquant", w=w_before, inp=inp.numpy(),
         out=layer.weight.data.numpy())





def outlier_goldens():
    """MXQGPT1 (outlier-aware, mxqgpt.py:95-254) — the active bit==1 branch via
    the class, and get_leave_one_out_error directly for the bits>=2 path."""
    import torch.nn as nn
    from lib.mxqgpt import MXQGPT1, get_leave_one_out_error

    torch.cuda.synchronize = lambda *a, **k: None
    g = torch.Generator().manual_seed(13)
    layer = nn.Linear(64, 16, bias=False)
    with torch.no_grad():
        w = torch.randn(16, 64, generator=g)
        w[2, 5] = 6.0   # force some clear outliers
        w[7, 33] = -5.0
        layer.weight.copy_(w)
    eng = MXQGPT1(layer)
    inp = torch.randn(4, 64, generator=g)
    eng.add_batch(inp, None)
    eng.fasterquant(blocksize=16, percdamp=0.01)
    save("ptq_outlier_1b", w=w.numpy(), inp=inp.numpy(),
         out=layer.weight.data.numpy(),
         mask=eng.unstructured_outlier_mask.numpy())

    gw = torch.randn(8, 16, generator=g)
    hd = torch.rand(16, generator=g) + 0.5
    red = get_leave_one_out_error(gw, hd, bits=2, sym=False)
    save("ptq_loo_2b", w=gw.numpy(), hdiag=hd.numpy(), red=red.numpy())


def variant_goldens():
    import torch
    from models.utils_quant import MX1AsymQuantizer
    clip = torch.tensor([-2.0, 2.0])
    g = torch.Generator().manual_seed(11)
    w = torch.randn(16, 256, generator=g)
    out = MX1AsymQuantizer.apply(w, clip, 2, False)
    save("qat_mx1", w=w.numpy(), out=out.detach().numpy())


if __name__ == "__main__":
    qat_goldens()
    ptq_goldens()
    outlier_goldens()
    variant_goldens()
    print("done")
