"""One-shot TPU microbenchmarks feeding the round-2 perf work.

Run on the real chip: `python tools/tpu_experiments.py [exp ...]`.
Experiments: w8a8, flashblocks, hires, all (default).

Timing through the axon tunnel must force a value fetch per rep — see
BENCH_NOTES.md "measurement methodology caveat".
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def _fetch1(out):
    """Force completion by fetching ONE element (device-side slice first —
    np.asarray(full_array) would drag the whole buffer through the
    tunnel and dominate the measurement)."""
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    idx = tuple(0 for _ in leaf.shape[:-1])
    return np.asarray(leaf[idx][:1])


def _timeit(fn, *args, reps=3, chain=1):
    _fetch1(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        _fetch1(fn(*args))
    return (time.perf_counter() - t0) / (reps * chain)


def exp_w8a8():
    """int8 MXU matmul vs bf16 at the Flux hot GEMM shapes."""
    import jax
    import jax.numpy as jnp

    shapes = [
        (4608, 3072, 3072 * 3),   # double-block qkv
        (4608, 3072, 12288),      # mlp up
        (4608, 12288, 3072),      # mlp down
        (4608, 3072, 21504),      # single-block linear1
    ]
    n_chain = 8
    rng = np.random.default_rng(0)
    print("== W8A8 vs bf16 matmul (per call, chained x8) ==")
    for m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.ones((n,), jnp.float32)

        # chain = n_chain INDEPENDENT dots in one executable, accumulated
        # in bf16; per-iteration input perturbation defeats CSE
        @jax.jit
        def f_bf16(x, w):
            acc = jnp.zeros((x.shape[0], w.shape[1]), jnp.bfloat16)
            for i in range(n_chain):
                acc = acc + jnp.dot(x * (1.0 + i * 1e-6), w,
                                    preferred_element_type=jnp.bfloat16)
            return acc

        @jax.jit
        def f_w8a8(x, wq, ws):
            # dynamic per-token activation quant + int8 MXU dot + rescale
            acc = jnp.zeros((x.shape[0], wq.shape[1]), jnp.bfloat16)
            for i in range(n_chain):
                xs = (x * (1.0 + i * 1e-6)).astype(jnp.float32)
                amax = jnp.max(jnp.abs(xs), -1, keepdims=True) / 127.0
                amax = jnp.maximum(amax, 1e-12)
                q = jnp.clip(jnp.round(xs / amax), -127, 127
                             ).astype(jnp.int8)
                o = jnp.dot(q, wq, preferred_element_type=jnp.int32)
                acc = acc + (o.astype(jnp.float32) * amax * ws
                             ).astype(jnp.bfloat16)
            return acc

        @jax.jit
        def f_int8_raw(xq, wq):
            # pure int8 GEMM (upper bound, no quant/rescale overhead)
            acc = jnp.zeros((xq.shape[0], wq.shape[1]), jnp.bfloat16)
            for i in range(n_chain):
                acc = acc + jnp.dot(jnp.roll(xq, i, axis=0), wq,
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.bfloat16)
            return acc

        t_bf = _timeit(f_bf16, x, w, chain=n_chain)
        t_q = _timeit(f_w8a8, x, wq, ws, chain=n_chain)
        t_raw = _timeit(f_int8_raw, xq, wq, chain=n_chain)
        fl = 2 * m * k * n
        print(f"  ({m}x{k}x{n}): bf16 {t_bf*1e3:.2f}ms "
              f"({fl/t_bf/1e12:.0f}TF/s) | w8a8+requant {t_q*1e3:.2f}ms "
              f"({fl/t_q/1e12:.0f}TOP/s) | int8 raw {t_raw*1e3:.2f}ms "
              f"({fl/t_raw/1e12:.0f}TOP/s)")


def _timeit_total(fn, *args, reps=3):
    """Total seconds per fetch (NOT divided by chain)."""
    _fetch1(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        _fetch1(fn(*args))
    return (time.perf_counter() - t0) / reps


def _slope_time(make_chain, c_lo=8, c_hi=32, reps=3):
    """Per-call seconds via two chain lengths: slope cancels the ~30 ms
    tunnel dispatch/fetch floor that poisons absolute short timings
    (everything whose total executable time is under the RTT reads as
    ~RTT/chain — see BENCH_NOTES methodology caveat, round-3 update)."""
    t_lo = _timeit_total(make_chain(c_lo), reps=reps)
    t_hi = _timeit_total(make_chain(c_hi), reps=reps)
    return (t_hi - t_lo) / (c_hi - c_lo)


def exp_gemm2():
    """Slope-calibrated GEMM timing at the Flux hot shapes: settles the
    round-2 '61-173 TF/s shape gap' question with overhead-free numbers,
    and tests the accumulation-dtype hypothesis (bf16 accumulation was the
    one variant clearly slow ABOVE the RTT floor in the raw sweep)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    shapes = [
        ("qkv      ", 4608, 3072, 9216),
        ("mlp-up   ", 4608, 3072, 12288),
        ("mlp-down ", 4608, 12288, 3072),
        ("proj     ", 4608, 3072, 3072),
        ("linear1  ", 4608, 3072, 21504),
        ("linear2  ", 4608, 15360, 3072),
        ("img-qkv  ", 4096, 3072, 9216),
        ("txt-qkv  ", 512, 3072, 9216),
        ("img-mlp1 ", 4096, 3072, 12288),
        ("img-mlp2 ", 4096, 12288, 3072),
    ]
    print("== GEMM slope-calibrated (per-call, overhead-free) ==")
    for name, m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.full((n,), 0.01, jnp.bfloat16)
        fl = 2 * m * k * n

        def mk(dotfn, *extra):
            def make(chain):
                @jax.jit
                def f(x, *e):
                    acc = None
                    for i in range(chain):
                        # i/64 is EXACT in bf16 — a 1e-6 perturbation
                        # rounds to 1.0 in bf16 and the whole chain
                        # CSE-collapses to a single dot (the round-2
                        # microbench bug this experiment replaces)
                        y = dotfn(x * (1.0 + i * (1.0 / 64.0)), *e)
                        acc = y if acc is None else acc + y
                    return acc
                return lambda: f(x, *extra)
            return make

        def d_bf16(xi, w):
            return jnp.dot(xi, w, preferred_element_type=jnp.bfloat16)

        def d_f32(xi, w):
            return jnp.dot(xi, w, preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        def d_int8w_bf16(xi, wq, ws):
            return jnp.dot(xi, wq.astype(jnp.bfloat16),
                           preferred_element_type=jnp.bfloat16) * ws

        def d_int8w_f32(xi, wq, ws):
            return (jnp.dot(xi, wq.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
                    .astype(jnp.bfloat16) * ws)

        rows = [("bf16acc", _slope_time(mk(d_bf16, w))),
                ("f32acc", _slope_time(mk(d_f32, w))),
                ("i8w-bf16", _slope_time(mk(d_int8w_bf16, wq, ws))),
                ("i8w-f32", _slope_time(mk(d_int8w_f32, wq, ws)))]
        msg = " | ".join(f"{lbl} {t*1e3:.2f}ms ({fl/t/1e12:.0f}TF/s)"
                         for lbl, t in rows)
        print(f"  {name} ({m}x{k}x{n}): {msg}")


def exp_flash2():
    """Slope-calibrated flash attention per-layer timing at the Flux
    shapes — measures the kernel-v2 work (mask-free 1-pass, exp2,
    q-prescale) and sweeps bq."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.attention import (attention_reference,
                                             flash_attention)

    rng = np.random.default_rng(0)
    print("== flash v2 per-layer (slope-calibrated) ==")
    for seq in (4608, 8448, 16896):
        q = jnp.asarray(rng.standard_normal((1, 24, seq, 128)),
                        jnp.bfloat16)
        flops = 4 * seq * seq * 128 * 24

        def mk(bq, bkv):
            def make(chain):
                @jax.jit
                def f(y):
                    for _ in range(chain):
                        y = flash_attention(y, y, y, block_q=bq,
                                            block_kv=bkv)
                    return y
                return lambda: f(q)
            return make

        from domainrag_tpu.ops.attention import _tuned_blocks
        tq, tkv = _tuned_blocks(seq)
        rows = [(f"bq={bq}" + ("*" if (bq, bkv) == (tq, tkv) else ""),
                 _slope_time(mk(bq, bkv), c_lo=4, c_hi=16))
                for bq, bkv in [(128, tkv), (256, tkv), (512, tkv)]]
        msg = " | ".join(f"{lbl} {t*1e3:.2f}ms ({flops/t/1e12:.0f}TF/s "
                         f"{flops/t/197e12*100:.0f}%MFU)"
                         for lbl, t in rows)
        print(f"  seq={seq}: {msg}")


def exp_insitu():
    """In-situ per-block cost via DEPTH slope: time the full proxy forward
    at two (double, single) depth pairs; the depth difference isolates the
    true per-double-block and per-single-block cost inside the real
    compiled graph (no microbench artifacts).  Repeats with attention
    swapped to identity for the true in-situ attention share."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import attention as attn_mod

    sys.path.insert(0, "/root/repo")
    from bench import build_proxy

    grid, s_txt = 64, 512
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, 4096)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    tt = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 2.5, jnp.float32)
    n_chain = 4

    def time_cfg(nd, ns):
        cfg, params = build_proxy(nd, ns)
        img = jnp.asarray(rng.standard_normal(
            (1, grid * grid, cfg.in_channels)), jnp.bfloat16)

        @jax.jit
        def f(params, x):
            y = x
            for _ in range(n_chain):
                y = flux.apply(params, y, txt, pooled, tt, img_ids,
                               txt_ids, cfg, guidance=g
                               ).astype(jnp.bfloat16)[:, :, :cfg.in_channels]
            return y
        t = _timeit_total(lambda: f(params, img)) / n_chain
        del params
        return t

    results = {}
    for nd, ns in [(2, 4), (6, 4), (2, 12)]:
        results[(nd, ns)] = time_cfg(nd, ns)
        print(f"  proxy {nd}d+{ns}s fwd: {results[(nd, ns)]*1e3:.1f} ms")
    per_d = (results[(6, 4)] - results[(2, 4)]) / 4
    per_s = (results[(2, 12)] - results[(2, 4)]) / 8
    full = 19 * per_d + 38 * per_s
    print(f"  => per double block {per_d*1e3:.2f} ms | per single "
          f"{per_s*1e3:.2f} ms | 19d+38s step {full*1e3:.0f} ms")

    ident = lambda q, k, v, **kw: v  # noqa: E731
    orig = attn_mod.attention
    attn_mod.attention = ident
    flux.attention = ident
    try:
        r2 = {}
        for nd, ns in [(2, 4), (6, 4), (2, 12)]:
            r2[(nd, ns)] = time_cfg(nd, ns)
        pd2 = (r2[(6, 4)] - r2[(2, 4)]) / 4
        ps2 = (r2[(2, 12)] - r2[(2, 4)]) / 8
        print(f"  no-attention: per double {pd2*1e3:.2f} ms | per single "
              f"{ps2*1e3:.2f} ms")
        print(f"  => attention share per double {(per_d-pd2)*1e3:.2f} ms, "
              f"per single {(per_s-ps2)*1e3:.2f} ms "
              f"(57-layer total {((per_d-pd2)*19+(per_s-ps2)*38)*1e3:.0f} ms)")
    finally:
        attn_mod.attention = orig
        flux.attention = orig


def exp_gemm():
    """Round-3: why do the double-block GEMM shapes run at 61-87 TF/s when
    the single-block fused linear1 (same M, K; wider N) hits 173?  Sweep
    layout/accumulation/split variants of the same math at the hot shapes
    to find a fast formulation (VERDICT r2 item 1)."""
    import jax
    import jax.numpy as jnp

    n_chain = 8
    rng = np.random.default_rng(0)

    def chain_timer(make_fn, *args):
        @jax.jit
        def f(*a):
            acc = None
            for i in range(n_chain):
                y = make_fn(i, *a)
                acc = y if acc is None else acc + y
            return acc
        return _timeit(f, *args, chain=n_chain)

    shapes = [
        ("qkv      ", 4608, 3072, 9216),
        ("mlp-up   ", 4608, 3072, 12288),
        ("mlp-down ", 4608, 12288, 3072),
        ("proj     ", 4608, 3072, 3072),
        ("linear1  ", 4608, 3072, 21504),
        ("img-qkv  ", 4096, 3072, 9216),
        ("txt-qkv  ", 512, 3072, 9216),
        ("img-mlp1 ", 4096, 3072, 12288),
        ("txt-mlp1 ", 512, 3072, 12288),
    ]
    print("== GEMM layout sweep (chained x8, bf16 unless noted) ==")
    for name, m, k, n in shapes:
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
        wt = jnp.asarray(np.asarray(w, np.float32).T.copy(), jnp.bfloat16)
        wq = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.full((n,), 0.01, jnp.bfloat16)
        fl = 2 * m * k * n

        def base(i, x, w):
            return jnp.dot(x * (1.0 + i * 1e-6), w,
                           preferred_element_type=jnp.bfloat16)

        def f32acc(i, x, w):
            return jnp.dot(x * (1.0 + i * 1e-6), w,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)

        def wT(i, x, wt):
            return jax.lax.dot_general(
                x * (1.0 + i * 1e-6), wt, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.bfloat16)

        def nsplit2(i, x, w):
            xi = x * (1.0 + i * 1e-6)
            h = w.shape[1] // 2
            return jnp.concatenate(
                [jnp.dot(xi, w[:, :h], preferred_element_type=jnp.bfloat16),
                 jnp.dot(xi, w[:, h:], preferred_element_type=jnp.bfloat16)],
                axis=-1)

        def int8w(i, x, wq, ws):
            y = jnp.dot(x * (1.0 + i * 1e-6), wq.astype(jnp.bfloat16),
                        preferred_element_type=jnp.bfloat16)
            return y * ws

        rows = [("base", chain_timer(base, x, w)),
                ("f32acc", chain_timer(f32acc, x, w)),
                ("wT", chain_timer(wT, x, wt)),
                ("nsplit2", chain_timer(nsplit2, x, w)),
                ("int8w", chain_timer(int8w, x, wq, ws))]
        msg = " | ".join(f"{lbl} {t*1e3:.2f}ms ({fl/t/1e12:.0f}TF/s)"
                         for lbl, t in rows)
        print(f"  {name} ({m}x{k}x{n}): {msg}")

    # grouped (ragged) formulation: both streams' projections as ONE
    # ragged_dot over the joint [txt; img] sequence with stacked weights
    print("== grouped two-stream formulations ==")
    for name, n in [("qkv", 9216), ("mlp1", 12288), ("proj", 3072)]:
        k = 3072 if n != 3072 else 3072
        kk = 12288 if name == "mlp2" else 3072
        x = jnp.asarray(rng.standard_normal((4608, kk)), jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((2, kk, n)), jnp.bfloat16)
        gs = jnp.asarray([512, 4096], jnp.int32)
        fl = 2 * 4608 * kk * n

        def ragged(i, x, w2, gs):
            return jax.lax.ragged_dot(
                x * (1.0 + i * 1e-6), w2, gs,
                preferred_element_type=jnp.bfloat16)

        def twodots(i, x, w2, gs):
            xi = x * (1.0 + i * 1e-6)
            a = jnp.dot(xi[:512], w2[0],
                        preferred_element_type=jnp.bfloat16)
            b = jnp.dot(xi[512:], w2[1],
                        preferred_element_type=jnp.bfloat16)
            return jnp.concatenate([a, b], axis=0)

        try:
            t_r = chain_timer(ragged, x, w2, gs)
            r_msg = f"ragged {t_r*1e3:.2f}ms ({fl/t_r/1e12:.0f}TF/s)"
        except Exception as e:  # noqa: BLE001
            r_msg = f"ragged FAILED ({str(e)[:60]})"
        t_2 = chain_timer(twodots, x, w2, gs)
        print(f"  {name} (4608x{kk}x{n}): {r_msg} | "
              f"two-dots {t_2*1e3:.2f}ms ({fl/t_2/1e12:.0f}TF/s)")


def exp_flashblocks():
    """Flash attention block-size sweep at the Flux 1024 px + fill shapes.

    8 calls chained in ONE executable (output feeds q) — single-call
    timings through the tunnel are dominated by ~30 ms dispatch RTT."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    n_chain = 8
    print("== flash attention block sweep (chained x8, per layer) ==")
    for seq in (4608, 8448):        # 1024 px gen; 1448^2-ish fill
        q = jnp.asarray(rng.standard_normal((1, 24, seq, 128)),
                        jnp.bfloat16)
        flops = 4 * seq * seq * 128 * 24
        for bq, bkv in [(256, 512), (512, 1024), (1024, 1024),
                        (256, 2048), (256, 4608), (512, 2304),
                        (128, 4608)]:

            @jax.jit
            def chain(y, bq=bq, bkv=bkv):
                for _ in range(n_chain):
                    y = flash_attention(y, y, y, block_q=bq, block_kv=bkv)
                return y

            t = _timeit(chain, q, chain=n_chain)
            print(f"  seq={seq} bq={bq} bkv={bkv}: {t*1e3:.2f} ms "
                  f"({flops/t/1e12:.0f} TF/s, "
                  f"{flops/t/197e12*100:.0f}% MFU)")
        # dense XLA reference at the same shape
        from domainrag_tpu.ops.attention import attention_reference

        @jax.jit
        def chain_ref(y):
            for _ in range(n_chain):
                y = attention_reference(y, y, y)
            return y

        try:
            t = _timeit(chain_ref, q, chain=n_chain)
            print(f"  seq={seq} dense XLA: {t*1e3:.2f} ms "
                  f"({flops/t/1e12:.0f} TF/s)")
        except Exception as e:  # noqa: BLE001
            print(f"  seq={seq} dense XLA: failed ({str(e)[:80]})")


def exp_hires():
    """2048 px fill-regime pieces on one chip: per-layer attention at 26k
    tokens + tiled vs full VAE decode at 2048 px (OOM check)."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.attention import flash_attention
    from domainrag_tpu.models.flux import vae as vae_mod

    rng = np.random.default_rng(0)
    print("== hires pieces ==")
    seq = 2048 * 2048 // 256 + 512   # 16896 tokens @2048px + txt
    q = jnp.asarray(rng.standard_normal((1, 24, seq, 128)), jnp.bfloat16)
    t = _timeit(lambda: flash_attention(q, q, q))
    print(f"  flash attn @2048px ({seq} tok): {t*1e3:.2f} ms/layer")

    cfg = vae_mod.FLUX_VAE
    params = vae_mod.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), params)
    lat = jnp.asarray(rng.standard_normal((1, 256, 256, 16)), jnp.bfloat16)
    t_tiled = _timeit(lambda: vae_mod.decode_tiled(params, lat, cfg,
                                                   tile=96, overlap=16))
    print(f"  tiled VAE decode 2048px: {t_tiled:.2f} s")
    try:
        t_full = _timeit(lambda: vae_mod.decode(params, lat, cfg))
        print(f"  full VAE decode 2048px: {t_full:.2f} s (no OOM)")
    except Exception as e:  # noqa: BLE001
        print(f"  full VAE decode 2048px: FAILED ({type(e).__name__}: "
              f"{str(e)[:120]})")


def exp_stepbreak():
    """Where does the denoise step go? Time a 4d+8s bf16 proxy forward
    with (a) flash attention, (b) attention replaced by identity —
    the difference is the true attention share."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import attention as attn_mod

    sys.path.insert(0, "/root/repo")
    from bench import build_proxy

    cfg, params = build_proxy(4, 8)
    grid, s_txt = 64, 512
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal(
        (1, grid * grid, cfg.in_channels)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, cfg.text_dim)),
                      jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                         jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    t = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 2.5, jnp.float32)

    n_chain = 4

    def fwd_chain(params, x):
        # params as an ARGUMENT — closing over them bakes 5 GB of
        # constants into the lowering and stalls the remote compile
        y = x
        for _ in range(n_chain):
            y = flux.apply(params, y, txt, pooled, t, img_ids, txt_ids,
                           cfg, guidance=g).astype(jnp.bfloat16)
        return y

    t_flash = _timeit(jax.jit(fwd_chain), params, img, chain=n_chain)

    ident = lambda q, k, v, **kw: v  # noqa: E731
    orig = attn_mod.attention
    attn_mod.attention = ident
    flux.attention = ident
    try:
        t_noattn = _timeit(jax.jit(fwd_chain), params, img, chain=n_chain)
    finally:
        attn_mod.attention = orig
        flux.attention = orig

    n_layers = cfg.depth_double + cfg.depth_single
    print("== step breakdown (4d+8s proxy, 4608 tok) ==")
    print(f"  full fwd: {t_flash*1e3:.1f} ms | no-attention: "
          f"{t_noattn*1e3:.1f} ms | attention share: "
          f"{(t_flash-t_noattn)*1e3:.1f} ms "
          f"({(t_flash-t_noattn)/n_layers*1e3:.2f} ms/layer, "
          f"{(t_flash-t_noattn)/t_flash*100:.0f}%)")


def exp_flash3():
    """Can the fill shapes run ONE KV pass? v5e VMEM is 128 MiB; the
    4608 cap was conservative. Scores tile at bq=512, kv=16896 is 34.6 MB."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    print("== flash 1-pass cap probe ==")
    for seq in (8448, 16896):
        q = jnp.asarray(rng.standard_normal((1, 24, seq, 128)),
                        jnp.bfloat16)
        flops = 4 * seq * seq * 128 * 24
        for bq in (256, 512):
            def make(chain, bq=bq):
                @jax.jit
                def f(y):
                    for _ in range(chain):
                        y = flash_attention(y, y, y, block_q=bq,
                                            block_kv=seq)
                    return y
                return lambda: f(q)
            try:
                t = _slope_time(make, c_lo=4, c_hi=16)
                print(f"  seq={seq} bq={bq} 1-pass: {t*1e3:.2f}ms "
                      f"({flops/t/1e12:.0f}TF/s "
                      f"{flops/t/197e12*100:.0f}%MFU)")
            except Exception as e:  # noqa: BLE001
                print(f"  seq={seq} bq={bq} 1-pass FAILED: {str(e)[:100]}")


def exp_topk2():
    """Slope-calibrated retrieval top-k: XLA vs the threshold-gated Pallas
    kernel (round-3 shortlist redesign) at the production shapes."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.topk import topk_ip, topk_ip_pallas

    rng = np.random.default_rng(0)
    print("== top-k slope-calibrated ==")
    for nq, nb in [(128, 100_000), (512, 200_000), (2048, 200_000)]:
        qv = jnp.asarray(rng.standard_normal((nq, 512)), jnp.float32)
        qv = qv / jnp.linalg.norm(qv, axis=1, keepdims=True)
        bank = jnp.asarray(rng.standard_normal((nb, 512)), jnp.float32)
        bank = bank / jnp.linalg.norm(bank, axis=1, keepdims=True)

        def mk(fn):
            def make(chain):
                @jax.jit
                def f(qv, bank):
                    accs = None
                    acci = None
                    for i in range(chain):
                        s_, i_ = fn(jnp.roll(qv, i, axis=0), bank, 100)
                        accs = s_ if accs is None else accs + s_
                        acci = i_ if acci is None else acci + i_
                    return accs, acci
                return lambda: f(qv, bank)
            return make

        t_x = _slope_time(mk(topk_ip), c_lo=4, c_hi=16)
        t_p = _slope_time(mk(topk_ip_pallas), c_lo=4, c_hi=16)
        print(f"  {nq}q x {nb}: XLA {t_x*1e3:.2f}ms ({nq/t_x:.0f} q/s) | "
              f"pallas-gated {t_p*1e3:.2f}ms ({nq/t_p:.0f} q/s)")


def exp_attnpath():
    """Model-style attention call (split fused qkv -> qknorm -> rope ->
    flash -> output transpose) vs the bare kernel: how much do the
    surroundings cost per layer?"""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    cfg = flux.FLUX_DEV
    seq, h, hd, heads = 4608, 3072, 128, 24
    qkv = jnp.asarray(rng.standard_normal((1, seq, 3 * h)), jnp.bfloat16)
    scale_q = jnp.ones((hd,), jnp.float32)
    scale_k = jnp.ones((hd,), jnp.float32)
    ids = np.concatenate([flux.make_text_ids(512),
                          flux.make_image_ids(64, 64)])
    cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim, cfg.theta)
    cos, sin = cos[None, None], sin[None, None]
    qq = jnp.asarray(rng.standard_normal((1, heads, seq, hd)), jnp.bfloat16)

    def full_path(x):
        q, k, v = flux._split_qkv(x, heads, hd)
        q = flux.rmsnorm({"scale": scale_q}, q)
        k = flux.rmsnorm({"scale": scale_k}, k)
        q = flux.apply_rope(q, cos, sin)
        k = flux.apply_rope(k, cos, sin)
        out = flash_attention(q, k, v)
        out = out.transpose(0, 2, 1, 3).reshape(1, seq, heads * hd)
        # feed back into qkv shape to chain
        return jnp.concatenate([out, out, out], axis=-1)

    def mk(fn, x0):
        def make(chain):
            @jax.jit
            def f(x):
                for _ in range(chain):
                    x = fn(x)
                return x
            return lambda: f(x0)
        return make

    t_full = _slope_time(mk(full_path, qkv), c_lo=4, c_hi=16)
    t_bare = _slope_time(mk(lambda y: flash_attention(y, y, y), qq),
                         c_lo=4, c_hi=16)
    print("== attention path overhead (per layer, slope) ==")
    print(f"  model-style full path: {t_full*1e3:.2f} ms | bare kernel: "
          f"{t_bare*1e3:.2f} ms | surroundings: "
          f"{(t_full-t_bare)*1e3:.2f} ms")


def exp_insitu2():
    """Ablation depth-slope: where do the non-GEMM, non-attention ~170 ms
    of the step go? Patch one elementwise family to identity at a time
    and re-measure the per-block depth slope."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux

    sys.path.insert(0, "/root/repo")
    from bench import build_proxy

    grid, s_txt = 64, 512
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, 4096)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    tt = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 2.5, jnp.float32)
    n_chain = 4

    def time_cfg(nd, ns):
        cfg, params = build_proxy(nd, ns)
        img = jnp.asarray(rng.standard_normal(
            (1, grid * grid, cfg.in_channels)), jnp.bfloat16)

        @jax.jit
        def f(params, x):
            y = x
            for _ in range(n_chain):
                y = flux.apply(params, y, txt, pooled, tt, img_ids,
                               txt_ids, cfg, guidance=g
                               ).astype(jnp.bfloat16)[:, :, :cfg.in_channels]
            return y
        t = _timeit_total(lambda: f(params, img)) / n_chain
        del params
        return t

    def slopes():
        r = {}
        for nd, ns in [(2, 4), (6, 4), (2, 12)]:
            r[(nd, ns)] = time_cfg(nd, ns)
        return ((r[(6, 4)] - r[(2, 4)]) / 4,
                (r[(2, 12)] - r[(2, 4)]) / 8)

    # NB (post fused-attention): RoPE/qk-norm now live INSIDE
    # ops.mmdit_attention's kernel — patching flux.apply_rope/_qknorm
    # ablates nothing. Ablate attention by replacing the fused entry
    # points with cheap passthroughs that still CONSUME the projections
    # (a pure identity would let XLA dead-code the qkv GEMM — round-3
    # postmortem).
    def _attn_off_double(txt_qkv, img_qkv, tn, inorm, cos, sin, heads,
                         hd, interpret=False):
        h = heads * hd
        return txt_qkv[..., :h], img_qkv[..., :h]

    def _attn_off_single(proj, qn, cos, sin, heads, hd, interpret=False):
        return proj[..., :heads * hd]

    orig = dict(gelu=flux.gelu_tanh, ln=flux._ln_no_affine,
                mod=flux._modulate, rope=flux.apply_rope,
                qknorm=flux._qknorm,
                mmd=flux.mmdit_double_attention,
                mms=flux.mmdit_single_attention)
    ablations = {
        "full": {},
        "no-gelu": {"gelu_tanh": lambda x: x},
        "no-lnmod": {"_ln_no_affine": lambda x, eps=1e-6: x,
                     "_modulate": lambda x, sh, sc: x},
        "no-attn": {"mmdit_double_attention": _attn_off_double,
                    "mmdit_single_attention": _attn_off_single},
    }
    print("== in-situ ablation depth-slopes (per block) ==")
    base = None
    for name, patch in ablations.items():
        for attr, fn in patch.items():
            setattr(flux, attr, fn)
        try:
            pd, ps = slopes()
        finally:
            flux.gelu_tanh = orig["gelu"]
            flux._ln_no_affine = orig["ln"]
            flux._modulate = orig["mod"]
            flux.apply_rope = orig["rope"]
            flux._qknorm = orig["qknorm"]
            flux.mmdit_double_attention = orig["mmd"]
            flux.mmdit_single_attention = orig["mms"]
        if name == "full":
            base = (pd, ps)
            print(f"  {name}: double {pd*1e3:.2f} ms | single "
                  f"{ps*1e3:.2f} ms | 19d+38s {19*pd*1e3+38*ps*1e3:.0f} ms")
        else:
            print(f"  {name}: double {pd*1e3:.2f} ms (d {1e3*(base[0]-pd):+.2f}) "
                  f"| single {ps*1e3:.2f} ms (d {1e3*(base[1]-ps):+.2f}) "
                  f"| 57-layer share "
                  f"{(19*(base[0]-pd)+38*(base[1]-ps))*1e3:.0f} ms")


def exp_mmdit():
    """Fused MMDiT attention (ops.mmdit_attention) vs the unfused model
    composition at the real 1024 px Flux shape (24 heads, 512 txt +
    4096 img). On-chip parity check first (Mosaic numerics, not just the
    interpreter), then depth slopes for the double and single variants."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    rng = np.random.default_rng(0)
    heads, hd = 24, 128
    h = heads * hd
    s_txt, s_img = 512, 4096
    cfg = flux.FLUX_DEV
    ids = np.concatenate([flux.make_text_ids(s_txt),
                          flux.make_image_ids(64, 64)])
    cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim, cfg.theta)

    def qknorm():
        return {"q": {"scale": jnp.asarray(
                    rng.uniform(0.5, 1.5, (hd,)), jnp.float32)},
                "k": {"scale": jnp.asarray(
                    rng.uniform(0.5, 1.5, (hd,)), jnp.float32)}}

    tn, inorm = qknorm(), qknorm()
    txt_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_txt, 3 * h)),
                          jnp.bfloat16)
    img_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_img, 3 * h)),
                          jnp.bfloat16)
    proj = jnp.asarray(0.3 * rng.standard_normal((1, s_txt + s_img, 7 * h)),
                       jnp.bfloat16)

    # --- parity on chip ---
    @jax.jit
    def both_double(tq, iq):
        ft, fi = mma.mmdit_double_attention(tq, iq, tn, inorm, cos, sin,
                                            heads, hd)
        rt, ri = mma._reference_double(
            tq, iq, tn["q"]["scale"], tn["k"]["scale"],
            inorm["q"]["scale"], inorm["k"]["scale"], cos, sin, heads, hd)
        err = lambda a, b: jnp.max(jnp.abs(  # noqa: E731
            a.astype(jnp.float32) - b.astype(jnp.float32)))
        return jnp.maximum(err(ft, rt), err(fi, ri))

    @jax.jit
    def both_single(p):
        f = mma.mmdit_single_attention(p, tn, cos, sin, heads, hd)
        r = mma._reference_single(p, tn["q"]["scale"], tn["k"]["scale"],
                                  cos, sin, heads, hd)
        return jnp.max(jnp.abs(f.astype(jnp.float32)
                               - r.astype(jnp.float32)))

    print("== fused MMDiT attention: on-chip parity ==")
    print(f"  double max|fused-unfused|: {float(both_double(txt_qkv, img_qkv)):.4f}")
    print(f"  single max|fused-unfused|: {float(both_single(proj)):.4f}")

    # --- depth slopes ---
    def chain_double(fn):
        def make(chain):
            @jax.jit
            def f(tq, iq):
                for _ in range(chain):
                    t, i = fn(tq, iq)
                    tq = jnp.concatenate([t, t, t], axis=-1)
                    iq = jnp.concatenate([i, i, i], axis=-1)
                return tq
            return lambda: f(txt_qkv, img_qkv)
        return make

    def chain_single(fn):
        def make(chain):
            @jax.jit
            def f(p):
                for _ in range(chain):
                    o = fn(p)
                    p = jnp.tile(o, (1, 1, 7))
                return p
            return lambda: f(proj)
        return make

    fused_d = chain_double(lambda tq, iq: mma.mmdit_double_attention(
        tq, iq, tn, inorm, cos, sin, heads, hd))
    ref_d = chain_double(lambda tq, iq: mma._reference_double(
        tq, iq, tn["q"]["scale"], tn["k"]["scale"], inorm["q"]["scale"],
        inorm["k"]["scale"], cos, sin, heads, hd))
    fused_s = chain_single(lambda p: mma.mmdit_single_attention(
        p, tn, cos, sin, heads, hd))
    ref_s = chain_single(lambda p: mma._reference_single(
        p, tn["q"]["scale"], tn["k"]["scale"], cos, sin, heads, hd))

    print("== fused MMDiT attention: per-layer slope (ms) ==")
    td_f = _slope_time(fused_d, c_lo=4, c_hi=16)
    td_r = _slope_time(ref_d, c_lo=4, c_hi=16)
    ts_f = _slope_time(fused_s, c_lo=4, c_hi=16)
    ts_r = _slope_time(ref_s, c_lo=4, c_hi=16)
    print(f"  double: fused {td_f*1e3:.2f} | unfused {td_r*1e3:.2f} "
          f"| delta {1e3*(td_r-td_f):+.2f}")
    print(f"  single: fused {ts_f*1e3:.2f} | unfused {ts_r*1e3:.2f} "
          f"| delta {1e3*(ts_r-ts_f):+.2f}")
    print(f"  57-layer step delta: "
          f"{(19*(td_r-td_f) + 38*(ts_r-ts_f))*1e3:.0f} ms")


def exp_mmditwidth():
    """Why is the fused SINGLE attention slower than the double (2.59 vs
    2.00 ms/layer) at identical math? Hypothesis: the single kernel's
    lane-block DMAs read (bq, 128) slices out of the 21504-lane linear1
    output — 256 B segments at a 43 KB row stride — while the double
    reads from 9216-lane arrays (18.4 KB stride). Measure the fused
    single kernel fed by (a) the real 21504-lane proj, (b) a 9216-lane
    qkv-only array, and (c) the 21504-lane proj pre-sliced by XLA into a
    contiguous 9216 buffer before the kernel (copy cost included)."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    rng = np.random.default_rng(0)
    heads, hd = 24, 128
    h = heads * hd
    s_txt, s_img = 512, 4096
    cfg = flux.FLUX_DEV
    ids = np.concatenate([flux.make_text_ids(s_txt),
                          flux.make_image_ids(64, 64)])
    cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim, cfg.theta)
    qk = {"q": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, (hd,)),
                                     jnp.float32)},
          "k": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, (hd,)),
                                     jnp.float32)}}
    s = s_txt + s_img
    proj7 = jnp.asarray(0.3 * rng.standard_normal((1, s, 7 * h)),
                        jnp.bfloat16)
    proj3 = proj7[..., :3 * h]

    def chain(fn, x):
        def make(c):
            @jax.jit
            def f(p):
                for _ in range(c):
                    o = fn(p)
                    reps_needed = p.shape[-1] // o.shape[-1]
                    p = jnp.tile(o, (1, 1, reps_needed))
                return p
            return lambda: f(x)
        return make

    attn = lambda p: mma.mmdit_single_attention(  # noqa: E731
        p, qk, cos, sin, heads, hd)
    sliced = lambda p: mma.mmdit_single_attention(  # noqa: E731
        jax.lax.slice_in_dim(p, 0, 3 * h, axis=2) * 1.0001,
        qk, cos, sin, heads, hd)

    print("== fused single attention: lane-width sensitivity ==")
    t7 = _slope_time(chain(attn, proj7), c_lo=4, c_hi=16)
    t3 = _slope_time(chain(attn, proj3), c_lo=4, c_hi=16)
    tsl = _slope_time(chain(sliced, proj7), c_lo=4, c_hi=16)
    print(f"  proj width 21504 (production): {t7*1e3:.2f} ms/layer")
    print(f"  proj width  9216 (qkv only):   {t3*1e3:.2f} ms/layer")
    print(f"  21504 pre-sliced to 9216 (copy included): {tsl*1e3:.2f}")
    print(f"  potential step save if slice wins: "
          f"{38*(t7-tsl)*1e3:.0f} ms")


def exp_mmdithires():
    """Fused MMDiT attention at the FILL-regime sequence lengths
    (8448 and 16896 tokens): does the one-pass joint kernel compile
    inside the 100 MB VMEM budget, does it match, and is it still faster
    than the unfused composition?"""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    rng = np.random.default_rng(0)
    heads, hd = 24, 128
    h = heads * hd
    cfg = flux.FLUX_DEV

    for s_img, hw in [(7936, (62, 128)), (16384, (128, 128)),
                      (30625, (175, 175))]:               # 175² = 2800 px cap
        s_txt = 512
        ids = np.concatenate([flux.make_text_ids(s_txt),
                              flux.make_image_ids(*hw)])
        cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim,
                                     cfg.theta)
        wq = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
        wk = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
        qn = {"q": {"scale": wq}, "k": {"scale": wk}}
        txt_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_txt, 3 * h)),
                              jnp.bfloat16)
        img_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_img, 3 * h)),
                              jnp.bfloat16)

        @jax.jit
        def parity(tq, iq):
            ft, fi = mma.mmdit_double_attention(tq, iq, qn, qn, cos, sin,
                                                heads, hd)
            rt, ri = mma._reference_double(tq, iq, wq, wk, wq, wk,
                                           cos, sin, heads, hd)
            err = lambda a, b: jnp.max(jnp.abs(  # noqa: E731
                a.astype(jnp.float32) - b.astype(jnp.float32)))
            return jnp.maximum(err(ft, rt), err(fi, ri))

        try:
            e = float(parity(txt_qkv, img_qkv))
            print(f"  double {s_txt}+{s_img}: parity {e:.4f}", flush=True)
        except Exception as ex:
            print(f"  double {s_txt}+{s_img}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            continue

        def chain(fn):
            def make(c):
                @jax.jit
                def f(tq, iq):
                    for _ in range(c):
                        t, i = fn(tq, iq)
                        tq = jnp.concatenate([t, t, t], axis=-1)
                        iq = jnp.concatenate([i, i, i], axis=-1)
                    return tq
                return lambda: f(txt_qkv, img_qkv)
            return make

        tf_ = _slope_time(chain(lambda tq, iq: mma.mmdit_double_attention(
            tq, iq, qn, qn, cos, sin, heads, hd)), c_lo=2, c_hi=6)
        tr = _slope_time(chain(lambda tq, iq: mma._reference_double(
            tq, iq, wq, wk, wq, wk, cos, sin, heads, hd)), c_lo=2, c_hi=6)
        print(f"  double {s_txt}+{s_img}: fused {tf_*1e3:.2f} ms | "
              f"unfused {tr*1e3:.2f} ms", flush=True)

        # single-block stream at the same joint length (the 38 single
        # blocks also process the full fill sequence)
        s_all = s_txt + s_img
        proj = jnp.asarray(0.3 * rng.standard_normal((1, s_all, 3 * h)),
                           jnp.bfloat16)

        @jax.jit
        def parity_s(p):
            f = mma.mmdit_single_attention(p, qn, cos, sin, heads, hd)
            r = mma._reference_single(p, wq, wk, cos, sin, heads, hd)
            return jnp.max(jnp.abs(f.astype(jnp.float32)
                                   - r.astype(jnp.float32)))

        try:
            e = float(parity_s(proj))
            print(f"  single {s_all}: parity {e:.4f}", flush=True)
        except Exception as ex:
            print(f"  single {s_all}: FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}", flush=True)
            continue

        def chain_s(fn):
            def make(c):
                @jax.jit
                def f(p):
                    for _ in range(c):
                        o = fn(p)
                        p = jnp.concatenate([o, o, o], axis=-1)
                    return p
                return lambda: f(proj)
            return make

        tfs = _slope_time(chain_s(lambda p: mma.mmdit_single_attention(
            p, qn, cos, sin, heads, hd)), c_lo=2, c_hi=6)
        trs = _slope_time(chain_s(lambda p: mma._reference_single(
            p, wq, wk, cos, sin, heads, hd)), c_lo=2, c_hi=6)
        print(f"  single {s_all}: fused {tfs*1e3:.2f} ms | "
              f"unfused {trs*1e3:.2f} ms", flush=True)


def exp_mmditsitu():
    """End-to-end in-situ check of the fused MMDiT attention: run the
    proxy flux.apply on the chip with the fused path engaged vs
    monkeypatched to the unfused composition — parity on the real model
    surface + the in-situ per-block depth slopes."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    sys.path.insert(0, "/root/repo")
    from bench import build_proxy

    grid, s_txt = 64, 512
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, 4096)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    tt = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 2.5, jnp.float32)

    def run_once(nd, ns, chain):
        cfg, params = build_proxy(nd, ns)
        img = jnp.asarray(rng.standard_normal(
            (1, grid * grid, cfg.in_channels)), jnp.bfloat16)

        @jax.jit
        def f(params, x):
            def body(y, _):
                y = flux.apply(params, y, txt, pooled, tt, img_ids,
                               txt_ids, cfg, guidance=g
                               ).astype(jnp.bfloat16)[:, :, :cfg.in_channels]
                return y, None
            # scan: ONE compiled body regardless of chain length (the
            # unrolled variant cost ~4x the remote-compile time)
            return jax.lax.scan(body, x, None, length=chain)[0]
        out = f(params, img)
        t = _timeit_total(lambda: f(params, img)) / chain
        val = np.asarray(out, np.float32)
        del params
        return t, val

    def ref_double(txt_qkv, img_qkv, tn, inorm, cos, sin, heads, hd,
                   interpret=False):
        c, s = mma._squeeze_tables(cos, sin)
        return mma._reference_double(
            txt_qkv, img_qkv, tn["q"]["scale"], tn["k"]["scale"],
            inorm["q"]["scale"], inorm["k"]["scale"], c, s, heads, hd)

    def ref_single(proj, qn, cos, sin, heads, hd, interpret=False):
        c, s = mma._squeeze_tables(cos, sin)
        return mma._reference_single(proj, qn["q"]["scale"],
                                     qn["k"]["scale"], c, s, heads, hd)

    results = {}
    for mode in ("fused", "unfused"):
        if mode == "unfused":
            flux.mmdit_double_attention = ref_double
            flux.mmdit_single_attention = ref_single
        try:
            r = {}
            for nd, ns, chain in [(2, 4, 4), (6, 4, 4), (2, 12, 4)]:
                t, val = run_once(nd, ns, chain)
                r[(nd, ns)] = (t, val)
                print(f"  [{mode} ({nd},{ns})]: {t*1e3:.1f} ms/apply",
                      flush=True)
            results[mode] = r
        finally:
            flux.mmdit_double_attention = mma.mmdit_double_attention
            flux.mmdit_single_attention = mma.mmdit_single_attention

    print("== fused MMDiT in-situ (proxy flux.apply, real chip) ==")
    for key in [(2, 4), (6, 4), (2, 12)]:
        vf = results["fused"][key][1]
        vr = results["unfused"][key][1]
        print(f"  cfg {key}: max|fused-unfused| = "
              f"{np.max(np.abs(vf - vr)):.4f} "
              f"(scale {np.max(np.abs(vr)):.2f})")
    for mode in ("fused", "unfused"):
        r = results[mode]
        pd = (r[(6, 4)][0] - r[(2, 4)][0]) / 4
        ps = (r[(2, 12)][0] - r[(2, 4)][0]) / 8
        print(f"  {mode}: double {pd*1e3:.2f} ms/blk | single "
              f"{ps*1e3:.2f} ms/blk | 19d+38s {(19*pd+38*ps)*1e3:.0f} ms")


def exp_w8a8tiles():
    """Tile sweep for ops.int8_gemm at the Flux hot shapes: serialized
    chains (each iteration's input depends on the previous output), slope
    timing. Picks feed int8_gemm's tile table."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops import int8_gemm

    rng = np.random.default_rng(0)
    shapes = [
        ("qkv     ", 4608, 3072, 9216),
        ("mlp-up  ", 4608, 3072, 12288),
        ("mlp-down", 4608, 12288, 3072),
        ("lin1    ", 4608, 3072, 21504),
        ("lin2    ", 4608, 15360, 3072),
        ("img-qkv ", 4096, 3072, 9216),
    ]
    tiles = [(512, 512, 1536), (512, 1024, 768), (512, 1024, 1536),
             (512, 1024, 3072), (512, 2048, 1536), (1024, 1024, 1536),
             (512, 512, 3072), (512, 1536, 1536)]
    print("== W8A8 pallas GEMM tile sweep (slope, serialized) ==")
    for name, m, k, n in shapes:
        fl = 2 * m * k * n
        xb = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        wi = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
        ws = jnp.full((1, n), 0.01, jnp.float32)
        rows = []
        for bm, bn, bk in tiles:
            if m % bm or n % bn or k % bk:
                continue

            def make(chain, bm=bm, bn=bn, bk=bk):
                @jax.jit
                def f(x, w):
                    dep = jnp.zeros((1, 1), jnp.bfloat16)
                    for i in range(chain):
                        xp = x * (1.0 + i * (1.0 / 64.0)) + dep
                        q, s = int8_gemm.quantize_rowwise(xp)
                        y = int8_gemm._w8a8_gemm(
                            q, w, s, ws, None, bm, bn, bk, jnp.bfloat16)
                        dep = (y[:1, :1] * 0.0).astype(jnp.bfloat16)
                    return dep
                return lambda: f(xb, wi)

            try:
                # ~1 ms kernels: chains must be long enough that the
                # hi-lo difference (~48 ms at 16/64) dwarfs the ~30 ms
                # tunnel floor's variance, or slopes come out negative
                t = _slope_time(make, c_lo=16, c_hi=64, reps=3)
                rows.append(((bm, bn, bk), t))
            except Exception as e:
                print(f"  {name} bm{bm} bn{bn} bk{bk}: FAIL "
                      f"{str(e)[:80]}", flush=True)
        rows.sort(key=lambda r: r[1])
        msg = " | ".join(
            f"{bm}/{bn}/{bk} {t*1e3:.2f}ms ({fl/t/1e12:.0f}T)"
            for (bm, bn, bk), t in rows[:4])
        print(f"  {name} ({m}x{k}x{n}): {msg}", flush=True)


def exp_w8a8situ():
    """In-situ W8A8 on reduced-depth int8 proxies: per-block depth
    slopes for (a) weight-only int8 + bf16 MXU (the current headline
    mode) and (b) W8A8 through the Pallas int8-MXU GEMM
    (ops.int8_gemm), plus max-abs divergence of (b) vs (a) on the
    apply output. Weights synthesize directly in the int8 layout
    (bench.build_full_int8 with reduced depths) - a host quantize of
    device-resident proxies would drag GBs back through the tunnel."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models import common as _common
    from domainrag_tpu.models.flux import model as flux

    sys.path.insert(0, "/root/repo")
    from bench import build_full_int8

    # W8S_GRID: image-token grid per side (64 = 1024 px; 89 ~ 1408 px
    # fill regime, 128 = 2048 px) — the fill shapes exercise the kernel
    # at M = S_img + 512
    import os
    grid, s_txt = int(os.environ.get("W8S_GRID", "64")), 512
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, 4096)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    tt = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 2.5, jnp.float32)
    configs = [(2, 4), (6, 4), (2, 12)]
    modes = [("int8w-bf16", False), ("w8a8-pallas", True)]
    if os.environ.get("W8S_INT8QK", "0") == "1":
        modes.append(("w8a8+int8qk", True))

    results = {name: {} for name, _ in modes}
    for nd, ns in configs:
        cfg, params = build_full_int8(nd, ns)
        img = jnp.asarray(rng.standard_normal(
            (1, grid * grid, cfg.in_channels)), jnp.bfloat16)
        chain = 4

        def make():
            @jax.jit
            def f(params, x):
                def body(y, _):
                    y = flux.apply(params, y, txt, pooled, tt, img_ids,
                                   txt_ids, cfg, guidance=g
                                   ).astype(jnp.bfloat16
                                            )[:, :, :cfg.in_channels]
                    return y, None
                return jax.lax.scan(body, x, None, length=chain)[0]
            return f

        from domainrag_tpu.ops import mmdit_attention as _mma
        for name, acts in modes:
            _common.set_int8_activations(acts)
            _mma.set_int8_qk("int8qk" in name)
            try:
                f = make()
                out = f(params, img)
                t = _timeit_total(lambda: f(params, img)) / chain
                val = np.asarray(out, np.float32)
            finally:
                _common.set_int8_activations(False)
                _mma.set_int8_qk(False)
            results[name][(nd, ns)] = (t, val)
            print(f"  [{name} ({nd},{ns})]: {t*1e3:.1f} ms/apply",
                  flush=True)
        del params

    print("== W8A8 in-situ (int8 proxy flux.apply, real chip) ==")
    for name, _ in modes:
        r = results[name]
        pd = (r[(6, 4)][0] - r[(2, 4)][0]) / 4
        ps = (r[(2, 12)][0] - r[(2, 4)][0]) / 8
        print(f"  {name}: double {pd*1e3:.2f} ms/blk | single "
              f"{ps*1e3:.2f} ms/blk | 19d+38s {(19*pd+38*ps)*1e3:.0f} ms")
    for key in configs:
        base = results["int8w-bf16"][key][1]
        pal = results["w8a8-pallas"][key][1]
        print(f"  cfg {key}: max|w8a8-int8w| = "
              f"{np.max(np.abs(pal - base)):.4f} "
              f"(scale {np.max(np.abs(base)):.2f})")


def exp_w8a8prof():
    """Round-4 (VERDICT r3 item 2): where does the W8A8 step's non-GEMM
    remainder go? Ablation depth-slopes on int8-layout proxies with
    set_int8_activations(True): full vs no-attn (fused attention replaced
    by a projection-consuming passthrough) vs cheap-quant (per-token amax
    +round replaced by a bare int8 cast with unit scales — same HBM
    traffic, no reduction) vs no-elemwise (gelu/ln/modulate to identity).
    The deltas price the bf16 attention, the quantize passes, and the
    VPU chains against the 0.63-of-int8-peak measured step."""
    import os
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models import common as _common
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import int8_gemm

    sys.path.insert(0, "/root/repo")
    from bench import build_full_int8

    grid, s_txt = int(os.environ.get("W8S_GRID", "64")), 512
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, 4096)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))
    tt = jnp.full((1,), 0.5, jnp.float32)
    g = jnp.full((1,), 2.5, jnp.float32)
    configs = [(2, 4), (6, 4), (2, 12)]
    chain = 4

    def _attn_off_double(txt_qkv, img_qkv, tn, inorm, cos, sin, heads,
                         hd, interpret=False):
        h = heads * hd
        return txt_qkv[..., :h], img_qkv[..., :h]

    def _attn_off_single(proj, qn, cos, sin, heads, hd, interpret=False):
        return proj[..., :heads * hd]

    def _cheap_quant(x):
        # same read/write bytes as quantize_rowwise, no amax reduce and
        # no round — prices the reduction+rounding, not the traffic.
        # The int8 cast CONSUMES every element, so the producer chain
        # cannot be dead-coded (round-3 postmortem rule).
        q = x.astype(jnp.int8)
        s = jnp.ones(x.shape[:-1] + (1,), jnp.float32)
        return q, s

    orig = dict(mmd=flux.mmdit_double_attention,
                mms=flux.mmdit_single_attention,
                gelu=flux.gelu_tanh, ln=flux._ln_no_affine,
                mod=flux._modulate, qr=int8_gemm.quantize_rowwise)
    ablations = {
        "full": {},
        "no-attn": {("flux", "mmdit_double_attention"): _attn_off_double,
                    ("flux", "mmdit_single_attention"): _attn_off_single},
        "cheap-quant": {("int8_gemm", "quantize_rowwise"): _cheap_quant},
        "no-elemwise": {("flux", "gelu_tanh"): lambda x: x,
                        ("flux", "_ln_no_affine"): lambda x, eps=1e-6: x,
                        ("flux", "_modulate"): lambda x, sh, sc: x},
    }
    mods = {"flux": flux, "int8_gemm": int8_gemm}

    results = {}
    for nd, ns in configs:
        cfg, params = build_full_int8(nd, ns)
        img = jnp.asarray(rng.standard_normal(
            (1, grid * grid, cfg.in_channels)), jnp.bfloat16)

        def make():
            @jax.jit
            def f(params, x):
                def body(y, _):
                    y = flux.apply(params, y, txt, pooled, tt, img_ids,
                                   txt_ids, cfg, guidance=g
                                   ).astype(jnp.bfloat16
                                            )[:, :, :cfg.in_channels]
                    return y, None
                return jax.lax.scan(body, x, None, length=chain)[0]
            return f

        for name, patch in ablations.items():
            _common.set_int8_activations(True)
            for (m, attr), fn in patch.items():
                setattr(mods[m], attr, fn)
            try:
                f = make()
                _ = np.asarray(f(params, img)[0, 0, :1])
                t = _timeit_total(lambda: f(params, img)) / chain
            finally:
                _common.set_int8_activations(False)
                flux.mmdit_double_attention = orig["mmd"]
                flux.mmdit_single_attention = orig["mms"]
                flux.gelu_tanh = orig["gelu"]
                flux._ln_no_affine = orig["ln"]
                flux._modulate = orig["mod"]
                int8_gemm.quantize_rowwise = orig["qr"]
            results.setdefault(name, {})[(nd, ns)] = t
            print(f"  [w8a8 {name} ({nd},{ns})]: {t*1e3:.1f} ms/apply",
                  flush=True)
        del params

    print("== W8A8 ablation depth-slopes (per block, int8 proxies) ==")
    base = None
    for name in ablations:
        r = results[name]
        pd = (r[(6, 4)] - r[(2, 4)]) / 4
        ps = (r[(2, 12)] - r[(2, 4)]) / 8
        step = (19 * pd + 38 * ps) * 1e3
        if name == "full":
            base = (pd, ps)
            print(f"  {name}: double {pd*1e3:.2f} ms | single "
                  f"{ps*1e3:.2f} ms | 19d+38s {step:.0f} ms")
        else:
            share = (19 * (base[0] - pd) + 38 * (base[1] - ps)) * 1e3
            print(f"  {name}: double {pd*1e3:.2f} ms "
                  f"(d {1e3*(base[0]-pd):+.2f}) | single {ps*1e3:.2f} ms "
                  f"(d {1e3*(base[1]-ps):+.2f}) | 57-layer share "
                  f"{share:.0f} ms")


def exp_attn8():
    """Round-4: fused attention kernel modes at the 1024 px Flux shape —
    bf16 vs folded-dequant int8 QK vs full int8 (QK + P·V). Per-layer
    slope times + on-chip max deviation vs the bf16 fused path."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    rng = np.random.default_rng(0)
    heads, hd = 24, 128
    h = heads * hd
    s_txt, s_img = 512, 4096
    cfg = flux.FLUX_DEV
    ids = np.concatenate([flux.make_text_ids(s_txt),
                          flux.make_image_ids(64, 64)])
    cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim, cfg.theta)
    tn = {"q": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, (hd,)),
                                     jnp.float32)},
          "k": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, (hd,)),
                                     jnp.float32)}}
    inorm = {"q": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, (hd,)),
                                        jnp.float32)},
             "k": {"scale": jnp.asarray(rng.uniform(0.5, 1.5, (hd,)),
                                        jnp.float32)}}
    txt_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_txt, 3 * h)),
                          jnp.bfloat16)
    img_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_img, 3 * h)),
                          jnp.bfloat16)
    proj = jnp.asarray(0.3 * rng.standard_normal((1, s_txt + s_img, 7 * h)),
                       jnp.bfloat16)

    _QKV3 = [False]

    def chain_double(chain):
        qkv3 = _QKV3[0]

        @jax.jit
        def f(tq, iq):
            for _ in range(chain):
                at, ai = (mma.qkv3_from_lanes(tq, heads, hd),
                          mma.qkv3_from_lanes(iq, heads, hd)) \
                    if qkv3 else (tq, iq)
                t, i = mma.mmdit_double_attention(at, ai, tn, inorm, cos,
                                                  sin, heads, hd)
                tq = jnp.concatenate([t, t, t], axis=-1)
                iq = jnp.concatenate([i, i, i], axis=-1)
            return tq
        return lambda: f(txt_qkv, img_qkv)

    def chain_single(chain):
        qkv3 = _QKV3[0]

        @jax.jit
        def f(p):
            for _ in range(chain):
                a = (mma.qkv3_from_lanes(p[..., :3 * h], heads, hd)
                     if qkv3 else p)
                o = mma.mmdit_single_attention(a, tn, cos, sin, heads, hd)
                p = jnp.tile(o, (1, 1, 7))
            return p
        return lambda: f(proj)

    @jax.jit
    def one_double(tq, iq):
        return mma.mmdit_double_attention(tq, iq, tn, inorm, cos, sin,
                                          heads, hd)

    print("== attention kernel modes @1024 px shape (per-layer slope; "
          "qkv3 rows INCLUDE the layout transpose) ==", flush=True)
    base = None
    results = {}
    modes = (("bf16", False, False, False),
             ("bf16-qkv3", False, False, True),
             ("int8qk-folded", True, False, False),
             ("int8qk-qkv3", True, False, True),
             ("int8qk+pv", True, True, False),
             ("int8qk+pv-qkv3", True, True, True))
    for name, qk, pv, qkv3 in modes:
        mma.set_int8_qk(qk)
        mma.set_int8_pv(pv)
        _QKV3[0] = qkv3
        try:
            td = _slope_time(chain_double, c_lo=4, c_hi=16)
            ts = _slope_time(chain_single, c_lo=4, c_hi=16)
            ot, oi = one_double(txt_qkv, img_qkv)
            val = np.asarray(oi, np.float32)
        finally:
            mma.set_int8_qk(False)
            mma.set_int8_pv(False)
            _QKV3[0] = False
        if base is None:
            base = val
        dev = float(np.max(np.abs(val - base)))
        results[name] = (td, ts)
        print(f"  {name:15s}: double {td*1e3:.2f} ms | single "
              f"{ts*1e3:.2f} ms | 57-layer {(19*td+38*ts)*1e3:.0f} ms "
              f"| max dev vs bf16 {dev:.4f}", flush=True)
    td0, ts0 = results["bf16"]
    for name, _, _, _ in modes[1:]:
        td, ts = results[name]
        print(f"  {name} step delta: "
              f"{(19*(td0-td)+38*(ts0-ts))*1e3:+.0f} ms")


def exp_mpbq():
    """Round-4 headroom probe: multipass fused-attention tile sweep at
    the 2800 px cap regime (~31k tokens). BENCH_NOTES records the
    remaining gap as K/V HBM re-fetch (scales with n_q = S/bq): bq=4096
    would halve it vs the shipped default 2048 but was never compiled.
    Sweep (bq, bkv) over the VMEM-plausible grid, with parity + slope
    timing per config; compile failures are recorded, not fatal."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    rng = np.random.default_rng(0)
    heads, hd = 24, 128
    h = heads * hd
    cfg = flux.FLUX_DEV
    s_txt, s_img = 512, 30625                   # 175^2 = 2800 px cap
    ids = np.concatenate([flux.make_text_ids(s_txt),
                          flux.make_image_ids(175, 175)])
    cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim,
                                 cfg.theta)
    wq = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
    wk = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
    txt_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_txt, 3 * h)),
                          jnp.bfloat16)
    img_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_img, 3 * h)),
                          jnp.bfloat16)
    ref_t, ref_i = jax.jit(lambda tq, iq: mma._reference_double(
        tq, iq, wq, wk, wq, wk, cos, sin, heads, hd))(txt_qkv, img_qkv)

    def chain(bq, bkv):
        def make(c):
            @jax.jit
            def f(tq, iq):
                for _ in range(c):
                    t, i = mma._fused_double_mp(
                        tq, iq, wq, wk, wq, wk, cos, sin, heads=heads,
                        interpret=False, qkv3=False, bq=bq, bkv=bkv)
                    tq = jnp.concatenate([t, t, t], axis=-1)
                    iq = jnp.concatenate([i, i, i], axis=-1)
                return tq
            return lambda: f(txt_qkv, img_qkv)
        return make

    for bq, bkv in [(1024, 1024), (2048, 1024), (2048, 2048),
                    (4096, 1024), (4096, 2048), (4096, 4096),
                    (8192, 1024)]:
        try:
            ft, fi = jax.jit(lambda tq, iq, b=bq, k=bkv: mma._fused_double_mp(
                tq, iq, wq, wk, wq, wk, cos, sin, heads=heads,
                interpret=False, qkv3=False, bq=b, bkv=k))(txt_qkv, img_qkv)
            err = max(
                float(jnp.max(jnp.abs(ft.astype(jnp.float32)
                                      - ref_t.astype(jnp.float32)))),
                float(jnp.max(jnp.abs(fi.astype(jnp.float32)
                                      - ref_i.astype(jnp.float32)))))
            t = _slope_time(chain(bq, bkv), c_lo=2, c_hi=6)
            print(f"  double 512+30625 bq={bq} bkv={bkv}: "
                  f"{t*1e3:.2f} ms | parity {err:.4f}", flush=True)
        except Exception as ex:
            print(f"  double 512+30625 bq={bq} bkv={bkv}: FAILED "
                  f"{type(ex).__name__}: {str(ex)[:160]}", flush=True)


def exp_vae():
    """Where do the 0.56 s of 1024 px VAE decode go? ~6.5 TFLOP of convs
    should take ~35 ms at peak — measure the full decode with slope
    timing and ablate the suspects: conv precision=highest (f32
    multi-pass emulation?), f32 groupnorm statistics, the mid attention."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models import common as common_mod
    from domainrag_tpu.models.flux import vae as vae_mod

    rng = np.random.default_rng(0)
    cfg = vae_mod.FLUX_VAE
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        vae_mod.init(jax.random.PRNGKey(0), cfg))
    lat = jnp.asarray(rng.standard_normal((1, 128, 128, 16)) * 0.5,
                      jnp.bfloat16)

    def mk():
        def make(chain):
            @jax.jit
            def f(params, z):
                def body(zc, _):
                    out = vae_mod.decode(params, zc, cfg)
                    # force sequential dependency (x*0 is fold-bait;
                    # a sub-ulp perturbation is not)
                    zc = zc + (out.astype(jnp.float32).mean()
                               * 1e-6).astype(zc.dtype)
                    return zc, None
                return jax.lax.scan(body, z, None, length=chain)[0]
            return lambda: f(params, lat)
        return make

    orig_conv = common_mod.conv2d
    orig_gn = vae_mod.groupnorm

    def conv_default_precision(p, x, stride=1, padding="SAME", groups=1):
        if isinstance(stride, int):
            stride = (stride, stride)
        y = jax.lax.conv_general_dilated(
            x, p["w"].astype(x.dtype), window_strides=stride,
            padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, preferred_element_type=x.dtype)
        if "b" in p:
            y = y + p["b"].astype(x.dtype)
        return y

    print("== VAE decode 1024px ablations (slope, ms) ==", flush=True)
    t = _slope_time(mk(), c_lo=2, c_hi=6)
    print(f"  as-is: {t*1e3:.1f}", flush=True)
    vae_mod.conv2d = conv_default_precision
    try:
        t = _slope_time(mk(), c_lo=2, c_hi=6)
        print(f"  conv default precision: {t*1e3:.1f}", flush=True)
    finally:
        vae_mod.conv2d = orig_conv
    vae_mod.groupnorm = lambda p, x, groups=32, eps=1e-6: x
    try:
        t = _slope_time(mk(), c_lo=2, c_hi=6)
        print(f"  groupnorm=identity: {t*1e3:.1f}", flush=True)
    finally:
        vae_mod.groupnorm = orig_gn
    orig_mid = vae_mod._mid
    vae_mod._mid = lambda p, x, g: x
    try:
        t = _slope_time(mk(), c_lo=2, c_hi=6)
        print(f"  mid(attn)=identity: {t*1e3:.1f}", flush=True)
    finally:
        vae_mod._mid = orig_mid


def exp_prior():
    """SigLIP so400m prior at 0.45 s for ~2 TFLOP (2 images) — find the
    sink: slope-time the tower, ablate attention vs MLP, and check the
    patchify embed."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models import siglip as siglip_mod

    rng = np.random.default_rng(0)
    scfg = siglip_mod.SIGLIP_SO400M
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        siglip_mod.init(jax.random.PRNGKey(0), scfg))
    imgs = jnp.asarray(rng.standard_normal(
        (2, scfg.image_size, scfg.image_size, 3)), jnp.bfloat16)

    def mk():
        def make(chain):
            @jax.jit
            def f(params, x):
                # the forward's INPUT must depend on the carry, or XLA
                # hoists the loop-invariant tower out of the scan and the
                # "slope" measures nothing (first attempt read 0.3 ms)
                def body(xc, _):
                    out = siglip_mod.apply(params, xc, scfg)
                    eps = (out[:, 0, :1].astype(jnp.float32).mean()
                           * 1e-6).astype(xc.dtype)
                    return xc + eps, None
                return jax.lax.scan(body, x, None, length=chain)[0]
            return lambda: f(params, imgs)
        return make

    print("== SigLIP so400m prior (slope, ms / 2-image forward) ==",
          flush=True)
    t = _slope_time(mk(), c_lo=2, c_hi=8)
    print(f"  as-is: {t*1e3:.1f}", flush=True)


def exp_mpint8():
    """Round 5 (VERDICT r4 weak #2 / next #3): int8 attention at the
    shapes where attention DOMINATES the step. The round-4 "every int8
    variant slower" verdict was measured at 4608 tokens (1024 px, ~20 %
    of the step); here the dispatcher-chosen kernels — one-pass int8 at
    512+16384, the new int8 MULTIPASS (_mp_flash_i8) at 512+30625 — are
    timed against fused bf16 and the unfused composition, with parity
    vs the exact reference per row. Matches the fill hot loop
    (outpainting_updown_sampling_redux.py:1246-1257) at 2048 px and the
    2800 px cap (:104-108)."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.ops import mmdit_attention as mma

    rng = np.random.default_rng(0)
    heads, hd = 24, 128
    h = heads * hd
    cfg = flux.FLUX_DEV

    shapes = [(16384, (128, 128)), (30625, (175, 175))]
    if os.environ.get("MPINT8_SHAPES"):   # e.g. "30625" to rerun one cell
        keep = {int(s) for s in os.environ["MPINT8_SHAPES"].split(",")}
        shapes = [sh for sh in shapes if sh[0] in keep]
    mode_filter = os.environ.get("MPINT8_MODES")  # e.g. "int8qk+pv"
    for s_img, hw in shapes:
        s_txt = 512
        ids = np.concatenate([flux.make_text_ids(s_txt),
                              flux.make_image_ids(*hw)])
        cos, sin = flux.rope_cos_sin(jnp.asarray(ids), cfg.axes_dim,
                                     cfg.theta)
        wq = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
        wk = jnp.asarray(rng.uniform(0.5, 1.5, (hd,)), jnp.float32)
        qn = {"q": {"scale": wq}, "k": {"scale": wk}}
        txt_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_txt, 3 * h)),
                              jnp.bfloat16)
        img_qkv = jnp.asarray(0.3 * rng.standard_normal((1, s_img, 3 * h)),
                              jnp.bfloat16)
        s_all = s_txt + s_img
        proj = jnp.asarray(0.3 * rng.standard_normal((1, s_all, 3 * h)),
                           jnp.bfloat16)

        def chain_d(fn):
            def make(c):
                @jax.jit
                def f(tq, iq):
                    for _ in range(c):
                        t, i = fn(tq, iq)
                        tq = jnp.concatenate([t, t, t], axis=-1)
                        iq = jnp.concatenate([i, i, i], axis=-1)
                    return tq
                return lambda: f(txt_qkv, img_qkv)
            return make

        def chain_s(fn):
            def make(c):
                @jax.jit
                def f(p):
                    for _ in range(c):
                        p = jnp.concatenate([fn(p)] * 3, axis=-1)
                    return p
                return lambda: f(proj)
            return make

        @jax.jit
        def refs(tq, iq, p):
            rt, ri = mma._reference_double(tq, iq, wq, wk, wq, wk,
                                           cos, sin, heads, hd)
            rs = mma._reference_single(p, wq, wk, cos, sin, heads, hd)
            return rt, ri, rs

        rt, ri, rs = refs(txt_qkv, img_qkv, proj)
        err = lambda a, b: float(jnp.max(jnp.abs(  # noqa: E731
            a.astype(jnp.float32) - b.astype(jnp.float32))))

        for mode, qk, pv in [("bf16", False, False),
                             ("int8qk", True, False),
                             ("int8qk+pv", True, True)]:
            if mode_filter and mode not in mode_filter.split(","):
                continue
            mma.set_int8_qk(qk)
            mma.set_int8_pv(pv)
            try:
                fd = jax.jit(lambda tq, iq: mma.mmdit_double_attention(
                    tq, iq, qn, qn, cos, sin, heads, hd))
                t_, i_ = fd(txt_qkv, img_qkv)
                pe = max(err(t_, rt), err(i_, ri))
                td = _slope_time(chain_d(
                    lambda tq, iq: mma.mmdit_double_attention(
                        tq, iq, qn, qn, cos, sin, heads, hd)),
                    c_lo=2, c_hi=6)
                fs = jax.jit(lambda p: mma.mmdit_single_attention(
                    p, qn, cos, sin, heads, hd))
                ps = err(fs(proj), rs)
                ts = _slope_time(chain_s(
                    lambda p: mma.mmdit_single_attention(
                        p, qn, cos, sin, heads, hd)), c_lo=2, c_hi=6)
                print(f"  {mode:9s} double {s_txt}+{s_img}: "
                      f"{td*1e3:8.2f} ms (parity {pe:.4f}) | "
                      f"single {s_all}: {ts*1e3:8.2f} ms "
                      f"(parity {ps:.4f})", flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"  {mode:9s} {s_txt}+{s_img}: FAILED "
                      f"{type(ex).__name__}: {str(ex)[:200]}", flush=True)
            finally:
                mma.set_int8_qk(False)
                mma.set_int8_pv(False)
        if mode_filter and "unfused" not in mode_filter.split(","):
            continue
        tr = _slope_time(chain_d(lambda tq, iq: mma._reference_double(
            tq, iq, wq, wk, wq, wk, cos, sin, heads, hd)), c_lo=2, c_hi=6)
        trs = _slope_time(chain_s(lambda p: mma._reference_single(
            p, wq, wk, cos, sin, heads, hd)), c_lo=2, c_hi=6)
        print(f"  unfused   double {s_txt}+{s_img}: {tr*1e3:8.2f} ms | "
              f"single {s_all}: {trs*1e3:8.2f} ms", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("backend:", jax.default_backend(), jax.devices())
    which = sys.argv[1:] or ["all"]
    if "mpint8" in which:
        exp_mpint8()
    if "attn8" in which:
        exp_attn8()
    if "w8a8prof" in which:
        exp_w8a8prof()
    if "gemm" in which:
        exp_gemm()
    if "gemm2" in which:
        exp_gemm2()
    if "flash2" in which:
        exp_flash2()
    if "flash3" in which:
        exp_flash3()
    if "topk2" in which:
        exp_topk2()
    if "attnpath" in which:
        exp_attnpath()
    if "mmdit" in which:
        exp_mmdit()
    if "mmditwidth" in which:
        exp_mmditwidth()
    if "mmditsitu" in which:
        exp_mmditsitu()
    if "mmdithires" in which:
        exp_mmdithires()
    if "mpbq" in which:
        exp_mpbq()
    if "vae" in which:
        exp_vae()
    if "prior" in which:
        exp_prior()
    if "w8a8situ" in which:
        exp_w8a8situ()
    if "w8a8tiles" in which:
        exp_w8a8tiles()
    if "insitu2" in which:
        exp_insitu2()
    if "insitu" in which:
        exp_insitu()
    if "all" in which or "w8a8" in which:
        exp_w8a8()
    if "all" in which or "flashblocks" in which:
        exp_flashblocks()
    if "all" in which or "hires" in which:
        exp_hires()
    if "all" in which or "stepbreak" in which:
        exp_stepbreak()


if __name__ == "__main__":
    main()
