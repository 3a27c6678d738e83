"""One-shot TPU microbenchmarks feeding the round-2 perf work.

Run on the real chip: `python tools/tpu_experiments.py [exp ...]`.
Experiments: w8a8, flashblocks, hires, all (default).

Timing through the axon tunnel must force a value fetch per rep — see
BENCH_NOTES.md "measurement methodology caveat".
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def _timeit(fn, *args, reps=3, chain=1):
    import jax
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
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


def exp_flashblocks():
    """Flash attention block-size sweep at the Flux 1024 px + fill shapes."""
    import jax.numpy as jnp
    from domainrag_tpu.ops.attention import flash_attention

    rng = np.random.default_rng(0)
    print("== flash attention block sweep ==")
    for seq in (4608, 8448):        # 1024 px gen; 1448^2-ish fill
        q = jnp.asarray(rng.standard_normal((1, 24, seq, 128)),
                        jnp.bfloat16)
        for bq, bkv in [(256, 512), (512, 512), (256, 1024), (512, 1024),
                        (1024, 1024), (128, 512)]:
            t = _timeit(lambda q=q, bq=bq, bkv=bkv: flash_attention(
                q, q, q, block_q=bq, block_kv=bkv))
            print(f"  seq={seq} bq={bq} bkv={bkv}: {t*1e3:.2f} ms")


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


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    print("backend:", jax.default_backend(), jax.devices())
    which = sys.argv[1:] or ["all"]
    if "all" in which or "w8a8" in which:
        exp_w8a8()
    if "all" in which or "flashblocks" in which:
        exp_flashblocks()
    if "all" in which or "hires" in which:
        exp_hires()


if __name__ == "__main__":
    main()
