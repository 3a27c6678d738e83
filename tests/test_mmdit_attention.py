"""Fused MMDiT attention (ops.mmdit_attention) vs the unfused composition.

The fused path replaces the whole per-block attention chain of the Flux
MMDiT (head split, qk-rmsnorm, interleaved RoPE, flash prescale, joint
softmax, output transpose — models/flux/model.py) with two Pallas kernels
operating in the qkv GEMM's (B, S, H*d) lane layout. Exactness contract:
bf16-rounding-level agreement with the unfused composition in the forward,
EXACT gradients (the custom VJP recomputes the unfused path).

Reference workload these blocks serve: diffusers' FluxAttnProcessor inside
the pipelines the reference drives (batch_generate_flux_kshot.py:148-151).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from domainrag_tpu.ops import mmdit_attention as mma

HEADS = 2
HD = 128


def _tables(rng, s_total):
    ang = rng.uniform(-np.pi, np.pi, size=(s_total, HD // 2))
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _qknorm(rng):
    return {"q": {"scale": jnp.asarray(
                rng.uniform(0.5, 1.5, size=(HD,)), jnp.float32)},
            "k": {"scale": jnp.asarray(
                rng.uniform(0.5, 1.5, size=(HD,)), jnp.float32)}}


def _bf16(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)


def _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin):
    return mma._reference_double(
        txt_qkv, img_qkv, tn["q"]["scale"], tn["k"]["scale"],
        inorm["q"]["scale"], inorm["k"]["scale"], cos, sin, HEADS, HD)


def _ref_single(proj, qn, cos, sin):
    return mma._reference_single(proj, qn["q"]["scale"], qn["k"]["scale"],
                                 cos, sin, HEADS, HD)


def _close(a, b, atol=0.05):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=0.05)


@pytest.mark.parametrize("s_txt,s_img", [
    (512, 512),      # block-aligned: mask chain statically elided
    (64, 192),       # both streams padded: kv masking exercised
])
def test_double_fused_matches_reference(rng, s_txt, s_img):
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (2, s_img, 3 * HEADS * HD)
                    )[:1]  # non-trivial strides survive the pad path
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    got_t, got_i = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    assert got_t.shape == (1, s_txt, HEADS * HD)
    assert got_i.shape == (1, s_img, HEADS * HD)
    _close(got_t, want_t)
    _close(got_i, want_i)


def test_double_accepts_broadcast_tables(rng):
    s_txt, s_img = 64, 192
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    got_t, got_i = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos[None, None], sin[None, None],
        HEADS, HD, interpret=True)
    _close(got_t, want_t, atol=0)
    _close(got_i, want_i, atol=0)


@pytest.mark.parametrize("s", [512, 96])
def test_single_fused_matches_reference(rng, s):
    mlp = 4 * HEADS * HD
    proj = _bf16(rng, (1, s, 3 * HEADS * HD + mlp))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    want = _ref_single(proj, qn, cos, sin)
    got = mma.mmdit_single_attention(proj, qn, cos, sin, HEADS, HD,
                                     interpret=True)
    assert got.shape == (1, s, HEADS * HD)
    _close(got, want)


def test_double_gradients_exact(rng):
    """custom_vjp backward = vjp of the unfused composition, exactly."""
    s_txt, s_img = 64, 128
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)

    def loss_fused(tq, iq):
        t, i = mma.mmdit_double_attention(tq, iq, tn, inorm, cos, sin,
                                          HEADS, HD, interpret=True)
        return (jnp.sum(t.astype(jnp.float32) ** 2)
                + jnp.sum(i.astype(jnp.float32) ** 2))

    def loss_ref(tq, iq):
        t, i = _ref_double(tq, iq, tn, inorm, cos, sin)
        return (jnp.sum(t.astype(jnp.float32) ** 2)
                + jnp.sum(i.astype(jnp.float32) ** 2))

    gt_f, gi_f = jax.grad(loss_fused, argnums=(0, 1))(txt_qkv, img_qkv)
    gt_r, gi_r = jax.grad(loss_ref, argnums=(0, 1))(txt_qkv, img_qkv)
    # forward values differ at bf16 rounding level -> the cotangents fed
    # into the (identical) backward differ slightly; exactness holds for
    # the primal-independent part, so compare at bf16 tolerance.
    _close(gt_f, gt_r, atol=0.1)
    _close(gi_f, gi_r, atol=0.1)


def test_single_gradients_exact(rng):
    s = 96
    proj = _bf16(rng, (1, s, 3 * HEADS * HD + 64))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)

    def loss_fused(p):
        return jnp.sum(mma.mmdit_single_attention(
            p, qn, cos, sin, HEADS, HD, interpret=True)
            .astype(jnp.float32) ** 2)

    def loss_ref(p):
        return jnp.sum(_ref_single(p, qn, cos, sin)
                       .astype(jnp.float32) ** 2)

    g_f = jax.grad(loss_fused)(proj)
    g_r = jax.grad(loss_ref)(proj)
    _close(g_f, g_r, atol=0.1)


def test_dispatch_falls_back_off_head128(rng):
    """head_dim != 128 routes through the unfused composition (and so
    stays correct for the tiny test configs)."""
    heads, hd = 4, 16
    s_txt, s_img = 8, 24
    txt_qkv = _bf16(rng, (1, s_txt, 3 * heads * hd))
    img_qkv = _bf16(rng, (1, s_img, 3 * heads * hd))
    qn = {"q": {"scale": jnp.ones((hd,), jnp.float32)},
          "k": {"scale": jnp.ones((hd,), jnp.float32)}}
    ang = rng.uniform(-1, 1, size=(s_txt + s_img, hd // 2))
    cos = jnp.asarray(np.cos(ang), jnp.float32)
    sin = jnp.asarray(np.sin(ang), jnp.float32)
    want = mma._reference_double(
        txt_qkv, img_qkv, qn["q"]["scale"], qn["k"]["scale"],
        qn["q"]["scale"], qn["k"]["scale"], cos, sin, heads, hd)
    got = mma.mmdit_double_attention(txt_qkv, img_qkv, qn, qn, cos, sin,
                                     heads, hd, interpret=True)
    _close(got[0], want[0], atol=0)
    _close(got[1], want[1], atol=0)


def test_dispatch_falls_back_under_force_reference(rng):
    from domainrag_tpu.ops import attention as attn
    s = 256
    proj = _bf16(rng, (1, s, 3 * HEADS * HD))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    with attn.dense_attention():
        got = mma.mmdit_single_attention(proj, qn, cos, sin, HEADS, HD,
                                         interpret=True)
    want = _ref_single(proj, qn, cos, sin)
    _close(got, want, atol=0)


def test_dispatch_falls_back_under_tp_and_sp(rng):
    """TP/SP contexts must route through the unfused composition (whose
    ops.attention dispatcher owns the head/sequence sharding); the fused
    kernel's lane blocking assumes unsharded (B, S, H*d)."""
    import jax as _jax
    from domainrag_tpu.ops import attention as attn
    from domainrag_tpu.parallel.mesh import create_mesh
    s_txt, s_img = 64, 192
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    mesh = create_mesh(model_parallel=2)
    with attn.tp_attention(mesh):
        got_t, got_i = mma.mmdit_double_attention(
            txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD,
            interpret=True)
    _close(got_t, want_t)
    _close(got_i, want_i)
    sp_mesh = _jax.sharding.Mesh(
        np.array(_jax.devices()[:2]).reshape(2), ("data",))
    with attn.sp_attention(sp_mesh, axis="data"):
        got_t, got_i = mma.mmdit_double_attention(
            txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD,
            interpret=True)
    _close(got_t, want_t)
    _close(got_i, want_i)


def test_max_onepass_gate_routes_to_multipass(rng, monkeypatch):
    """Shapes above the one-pass VMEM ceiling now dispatch to the
    multi-KV-pass kernels (VERDICT r3 item 4: the 2800 px fill regime
    previously lost the fusion win to the unfused fallback). Online
    softmax reassociates the reduction, so the pin is closeness, not
    bit equality."""
    monkeypatch.setattr(mma, "_MAX_ONEPASS", 128)
    s_txt, s_img = 64, 192            # 256 total > patched ceiling
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    got_t, got_i = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    _close(got_t, want_t)
    _close(got_i, want_i)


def test_max_multipass_gate_falls_back(rng, monkeypatch):
    """Above the largest MEASURED multipass regime the dispatcher still
    takes the proven unfused path — bit-exactly."""
    monkeypatch.setattr(mma, "_MAX_ONEPASS", 64)
    monkeypatch.setattr(mma, "_MAX_MULTIPASS", 128)
    s_txt, s_img = 64, 192            # 256 total > both ceilings
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    got_t, got_i = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    _close(got_t, want_t, atol=0)
    _close(got_i, want_i, atol=0)


def test_int8_above_onepass_routes_to_multipass(rng, monkeypatch):
    """Round 5: int8 modes above the one-pass ceiling route to the int8
    multipass kernel (the 2800 px cap regime is exactly where the int8
    MXU rate matters most — VERDICT r4 weak #2); above _MAX_MULTIPASS
    they still take the exact unfused path."""
    monkeypatch.setattr(mma, "_MAX_ONEPASS", 128)
    s_txt, s_img = 64, 192
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    mma.set_int8_qk(True)
    try:
        got_t, got_i = mma.mmdit_double_attention(
            txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD,
            interpret=True)
    finally:
        mma.set_int8_qk(False)
    # int8 rounding tolerance, and it must DIFFER from exact (the int8
    # multipass engaged, not a silent bf16 or fallback path)
    _close(got_t, want_t, atol=0.08)
    _close(got_i, want_i, atol=0.08)
    assert np.abs(np.asarray(got_i, np.float32)
                  - np.asarray(want_i, np.float32)).max() > 0

    # above _MAX_MULTIPASS: exact unfused fallback
    monkeypatch.setattr(mma, "_MAX_MULTIPASS", 128)
    mma.set_int8_qk(True)
    try:
        got_t2, got_i2 = mma.mmdit_double_attention(
            txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD,
            interpret=True)
    finally:
        mma.set_int8_qk(False)
    _close(got_t2, want_t, atol=0)
    _close(got_i2, want_i, atol=0)


@pytest.mark.parametrize("s_txt,s_img,int8_pv", [
    (64, 256, False),     # aligned kv tiles, int8 QK only
    (64, 200, False),     # padded: kv masking across tiles
    (64, 200, True),      # full int8 (QK + P·V), padded
])
def test_double_int8_multipass_close(rng, s_txt, s_img, int8_pv):
    """int8 multipass == unfused composition within the int8 rounding
    envelope (bq=64 so several kv passes and the online-softmax rescale
    chain are exercised with quantized P)."""
    cos, sin = _tables(rng, s_txt + s_img)
    tn, inorm = _qknorm(rng), _qknorm(rng)
    txt_qkv = _bf16(rng, (2, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (2, s_img, 3 * HEADS * HD))
    want = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    got = mma._fused_double_mp(
        txt_qkv, img_qkv, tn["q"]["scale"], tn["k"]["scale"],
        inorm["q"]["scale"], inorm["k"]["scale"], cos, sin,
        heads=HEADS, interpret=True, qkv3=False, bq=64,
        int8_qk=True, int8_pv=int8_pv)
    _close(got[0], want[0], atol=0.08)
    _close(got[1], want[1], atol=0.08)
    assert np.abs(np.asarray(got[1], np.float32)
                  - np.asarray(want[1], np.float32)).max() > 0


@pytest.mark.parametrize("s,int8_pv,qkv3", [
    (256, False, False), (200, False, False), (200, True, False),
    (200, True, True),
])
def test_single_int8_multipass_close(rng, s, int8_pv, qkv3):
    cos, sin = _tables(rng, s)
    qn = _qknorm(rng)
    proj = _bf16(rng, (2, s, 3 * HEADS * HD))
    want = _ref_single(proj, qn, cos, sin)
    a = mma.qkv3_from_lanes(proj, HEADS, HD) if qkv3 else proj
    got = mma._fused_single_mp(a, qn["q"]["scale"], qn["k"]["scale"],
                               cos, sin, heads=HEADS, interpret=True,
                               qkv3=qkv3, bq=64, int8_qk=True,
                               int8_pv=int8_pv)
    _close(got, want, atol=0.08)


@pytest.mark.parametrize("s_txt,s_img,qkv3", [
    (64, 256, False),     # block-aligned kv tiles
    (64, 200, False),     # padded img stream: kv masking across tiles
    (40, 200, True),      # qkv3 layout + both streams padded
])
def test_double_multipass_matches_reference(rng, s_txt, s_img, qkv3):
    """The multi-KV-pass joint kernel == unfused composition at bf16
    rounding, across tile-aligned, masked, and qkv3-layout shapes
    (bq=64 so small shapes exercise SEVERAL kv passes)."""
    cos, sin = _tables(rng, s_txt + s_img)
    tn, inorm = _qknorm(rng), _qknorm(rng)
    txt_qkv = _bf16(rng, (2, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (2, s_img, 3 * HEADS * HD))
    want = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    at, ai = ((mma.qkv3_from_lanes(txt_qkv, HEADS, HD),
               mma.qkv3_from_lanes(img_qkv, HEADS, HD))
              if qkv3 else (txt_qkv, img_qkv))
    got = mma._fused_double_mp(
        at, ai, tn["q"]["scale"], tn["k"]["scale"],
        inorm["q"]["scale"], inorm["k"]["scale"], cos, sin,
        heads=HEADS, interpret=True, qkv3=qkv3, bq=64)
    _close(got[0], want[0])
    _close(got[1], want[1])


@pytest.mark.parametrize("s,qkv3", [(256, False), (200, False),
                                    (200, True)])
def test_single_multipass_matches_reference(rng, s, qkv3):
    cos, sin = _tables(rng, s)
    qn = _qknorm(rng)
    proj = _bf16(rng, (2, s, 3 * HEADS * HD))
    want = _ref_single(proj, qn, cos, sin)
    a = mma.qkv3_from_lanes(proj, HEADS, HD) if qkv3 else proj
    got = mma._fused_single_mp(a, qn["q"]["scale"], qn["k"]["scale"],
                               cos, sin, heads=HEADS, interpret=True,
                               qkv3=qkv3, bq=64)
    _close(got, want)


@pytest.mark.parametrize("s_txt,s_img", [(512, 512), (64, 192)])
def test_double_int8_qk_close(rng, s_txt, s_img):
    """SageAttention-style int8 QK: scores carry per-row x per-tensor
    int8 rounding, outputs stay within a small tolerance of the exact
    composition (P.V remains bf16)."""
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    mma.set_int8_qk(True)
    try:
        got_t, got_i = mma.mmdit_double_attention(
            txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD,
            interpret=True)
    finally:
        mma.set_int8_qk(False)
    # int8 scores perturb the softmax weights; on unit-scale inputs the
    # measured deviation is ~1e-2 — pin a 4x envelope
    _close(got_t, want_t, atol=0.08)
    _close(got_i, want_i, atol=0.08)
    # and it must actually differ from the exact fused path (the flag
    # reached the kernel, not a silent no-op)
    exact_t, _ = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    assert np.abs(np.asarray(got_t, np.float32)
                  - np.asarray(exact_t, np.float32)).max() > 0


@pytest.mark.parametrize("s", [512, 96])
def test_single_int8_qk_close(rng, s):
    mlp = 4 * HEADS * HD
    proj = _bf16(rng, (1, s, 3 * HEADS * HD + mlp))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    want = _ref_single(proj, qn, cos, sin)
    mma.set_int8_qk(True)
    try:
        got = mma.mmdit_single_attention(proj, qn, cos, sin, HEADS, HD,
                                         interpret=True)
    finally:
        mma.set_int8_qk(False)
    _close(got, want, atol=0.08)


@pytest.mark.parametrize("s", [512, 96])
def test_single_qkv3_matches_lanes(rng, s):
    """The contiguous (3,B,S,H*d) qkv3 layout (round-4 DMA-pitch fix)
    computes the identical attention as the fused-lane form."""
    mlp = 4 * HEADS * HD
    proj = _bf16(rng, (1, s, 3 * HEADS * HD + mlp))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    want = mma.mmdit_single_attention(proj, qn, cos, sin, HEADS, HD,
                                      interpret=True)
    qkv3 = mma.qkv3_from_lanes(proj[..., :3 * HEADS * HD], HEADS, HD)
    assert qkv3.shape == (3, 1, s, HEADS * HD)
    got = mma.mmdit_single_attention(qkv3, qn, cos, sin, HEADS, HD,
                                     interpret=True)
    _close(got, want, atol=0)
    # round-trip helper consistency
    np.testing.assert_array_equal(
        np.asarray(mma.lanes_from_qkv3(qkv3)),
        np.asarray(proj[..., :3 * HEADS * HD]))


@pytest.mark.parametrize("s_txt,s_img", [(512, 512), (64, 192)])
def test_double_qkv3_matches_lanes(rng, s_txt, s_img):
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    got_t, got_i = mma.mmdit_double_attention(
        mma.qkv3_from_lanes(txt_qkv, HEADS, HD),
        mma.qkv3_from_lanes(img_qkv, HEADS, HD),
        tn, inorm, cos, sin, HEADS, HD, interpret=True)
    _close(got_t, want_t, atol=0)
    _close(got_i, want_i, atol=0)


def test_qkv3_fallback_path(rng):
    """qkv3 form also works through the unfused reference fallback
    (forced via the force-reference context)."""
    from domainrag_tpu.ops import attention as attn_mod
    s = 96
    proj = _bf16(rng, (1, s, 3 * HEADS * HD))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    want = _ref_single(proj, qn, cos, sin)
    qkv3 = mma.qkv3_from_lanes(proj, HEADS, HD)
    with attn_mod.dense_attention():
        got = mma.mmdit_single_attention(qkv3, qn, cos, sin, HEADS, HD,
                                         interpret=True)
    _close(got, want, atol=0)


def test_double_qkv3_gradients_exact(rng):
    """custom_vjp in qkv3 form: backward equals the vjp of the unfused
    composition chained through the layout transpose."""
    s_txt, s_img = 64, 128
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)

    def loss_fused(tq, iq):
        t, i = mma.mmdit_double_attention(
            mma.qkv3_from_lanes(tq, HEADS, HD),
            mma.qkv3_from_lanes(iq, HEADS, HD),
            tn, inorm, cos, sin, HEADS, HD, interpret=True)
        return (jnp.sum(t.astype(jnp.float32) ** 2)
                + jnp.sum(i.astype(jnp.float32) ** 2))

    def loss_ref(tq, iq):
        t, i = _ref_double(tq, iq, tn, inorm, cos, sin)
        return (jnp.sum(t.astype(jnp.float32) ** 2)
                + jnp.sum(i.astype(jnp.float32) ** 2))

    gf = jax.grad(loss_fused, argnums=(0, 1))(txt_qkv, img_qkv)
    gr = jax.grad(loss_ref, argnums=(0, 1))(txt_qkv, img_qkv)
    # the qkv3 backward chains through the layout transpose, which gives
    # XLA a DIFFERENT graph than the plain reference — rounding-level
    # (bf16) agreement is the correct pin, not bitwise
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=0.05, rtol=0.05)


@pytest.mark.parametrize("s_txt,s_img", [(512, 512), (64, 192)])
def test_double_int8_pv_close(rng, s_txt, s_img):
    """Full int8 attention (QK + P·V on the int8 MXU): P quantizes at
    the constant scale 127 (shared-max exp2 makes the row max exactly
    1), V per column, and the l-normalization uses the quantized row
    sum so the output is an exact convex combination of quantized
    rows. Pin a small absolute envelope vs the exact composition."""
    txt_qkv = _bf16(rng, (1, s_txt, 3 * HEADS * HD))
    img_qkv = _bf16(rng, (1, s_img, 3 * HEADS * HD))
    tn, inorm = _qknorm(rng), _qknorm(rng)
    cos, sin = _tables(rng, s_txt + s_img)
    want_t, want_i = _ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin)
    mma.set_int8_pv(True)
    try:
        got_t, got_i = mma.mmdit_double_attention(
            txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD,
            interpret=True)
    finally:
        mma.set_int8_pv(False)
    _close(got_t, want_t, atol=0.1)
    _close(got_i, want_i, atol=0.1)
    exact_t, _ = mma.mmdit_double_attention(
        txt_qkv, img_qkv, tn, inorm, cos, sin, HEADS, HD, interpret=True)
    assert np.abs(np.asarray(got_t, np.float32)
                  - np.asarray(exact_t, np.float32)).max() > 0


@pytest.mark.parametrize("s", [512, 96])
def test_single_int8_pv_close(rng, s):
    mlp = 4 * HEADS * HD
    proj = _bf16(rng, (1, s, 3 * HEADS * HD + mlp))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    want = _ref_single(proj, qn, cos, sin)
    mma.set_int8_pv(True)
    try:
        got = mma.mmdit_single_attention(proj, qn, cos, sin, HEADS, HD,
                                         interpret=True)
    finally:
        mma.set_int8_pv(False)
    _close(got, want, atol=0.1)


def test_int8_qk_folded_dequant_matches_rescale(rng):
    """The folded exp2(alpha·(s-m)) formulation must equal the explicit
    dequant-then-softmax route: independent numpy recompute of the
    int8-QK path for one (batch, head), bitwise identical quant grid."""
    s = 128
    proj = _bf16(rng, (1, s, 3 * HEADS * HD))
    qn = _qknorm(rng)
    cos, sin = _tables(rng, s)
    mma.set_int8_qk(True)
    try:
        got = np.asarray(mma.mmdit_single_attention(
            proj, qn, cos, sin, HEADS, HD, interpret=True), np.float32)
    finally:
        mma.set_int8_qk(False)
    # numpy oracle: same quantizers, EXPLICIT dequant then f32 softmax
    c2 = np.repeat(np.asarray(cos), 2, axis=-1)
    s2 = np.stack([-np.asarray(sin), np.asarray(sin)],
                  axis=-1).reshape(s, HD)
    prescale = np.float32(mma.LOG2_E / np.sqrt(128.0))
    pj = np.asarray(proj, np.float32)
    for h in range(HEADS):
        def nr(x, w, pre):
            y = x / np.sqrt(np.mean(x * x, axis=-1, keepdims=True)
                            + mma._EPS)
            y = (y * w).astype(np.float32)
            y = y.astype("bfloat16").astype(np.float32)
            sw = y[:, [j ^ 1 for j in range(HD)]]
            r = y * c2 + sw * s2
            return r * pre if pre is not None else r
        qh = nr(pj[0, :, h * HD:(h + 1) * HD],
                np.asarray(qn["q"]["scale"]), prescale)
        kh = nr(pj[0, :, (HEADS + h) * HD:(HEADS + h + 1) * HD],
                np.asarray(qn["k"]["scale"]), None)
        vh = pj[0, :, (2 * HEADS + h) * HD:(2 * HEADS + h + 1) * HD]
        sq = np.maximum(np.abs(qh).max(axis=-1, keepdims=True) / 127, 1e-12)
        qq = np.clip(np.round(qh / sq), -127, 127)
        sk = np.maximum(np.abs(kh).max() / 127, 1e-12)
        kq = np.clip(np.round(kh / sk), -127, 127)
        scores = (qq @ kq.T) * (sq * sk)          # explicit dequant
        p = np.exp2(scores - scores.max(axis=1, keepdims=True))
        want = (p @ vh.astype("bfloat16").astype(np.float32)
                ) / p.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(got[0, :, h * HD:(h + 1) * HD], want,
                                   atol=0.02, rtol=0.02)
