"""Headline benchmark: Flux-Redux 1024 px images/min/chip (28-step denoise,
BASELINE.json config 3).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Method. Real FLUX.1 weights are unavailable here (zero egress) and the 12B
bf16 model (~24 GB) exceeds one v5e chip's HBM anyway (BASELINE targets a
v5e-8 with TP). The benchmark therefore measures the denoise step on a
PROXY MMDiT with the production per-layer dimensions (hidden 3072, 24
heads x 128, joint 512+4096-token sequence, bf16, Pallas flash attention)
and a reduced block count that fits one chip, then scales wall-clock
linearly in block count to the full 19-double/38-single model. Per-block
cost is constant in depth, so the extrapolation is exact up to the
(unmeasured, amortized) non-block overhead — extrapolated numbers are
marked as such in BENCH_NOTES.md.

vs_baseline: the reference's achieved throughput on its own 8x-GPU recipe
is not published (SURVEY.md §6); BENCH_NOTES.md derives the 2.0
images/min/GPU estimate used here (A100 bf16, 28 steps, diffusers).
"""

import json
import time

import numpy as np

# Estimated reference throughput (images/min per A100 GPU, 1024 px,
# 28-step flux-dev) — derivation in BENCH_NOTES.md.
REFERENCE_IMAGES_PER_MIN = 2.0

NUM_STEPS = 28
HEIGHT = WIDTH = 1024


def build_proxy(depth_double: int, depth_single: int):
    import jax
    from domainrag_tpu.models.flux import model as flux

    cfg = flux.FluxConfig(depth_double=depth_double,
                          depth_single=depth_single)
    params = flux.init(jax.random.PRNGKey(0), cfg)
    import jax.numpy as jnp
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    return cfg, params


def build_full_int8():
    """The FULL 19-double/38-single 12B MMDiT with weight-only int8
    (models.quant): ~12 GB of weights fits the single chip, so the
    headline is measured end-to-end, not extrapolated. Blocks are
    initialized on the host CPU one at a time, quantized, and streamed to
    the device (a monolithic f32 init would need 48 GB)."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models import quant
    from domainrag_tpu.models.flux import model as flux

    cfg = flux.FLUX_DEV
    cpu = jax.devices("cpu")[0] if jax.devices("cpu") else None
    device = jax.devices()[0]

    def to_dev(tree):
        tree = quant.quantize_tree(jax.device_get(tree), min_size=1 << 16)
        tree = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, tree)
        return jax.device_put(tree, device)

    key = jax.random.PRNGKey(0)
    n_keys = 8 + cfg.depth_double + cfg.depth_single
    with jax.default_device(cpu):
        ks = jax.random.split(key, n_keys)
        params = {
            "img_in": to_dev(flux.linear_init(ks[0], cfg.in_channels,
                                              cfg.hidden)),
            "txt_in": to_dev(flux.linear_init(ks[1], cfg.text_dim,
                                              cfg.hidden)),
            "time_in": to_dev(flux._mlp_embedder_init(
                ks[2], cfg.time_embed_dim, cfg.hidden)),
            "vector_in": to_dev(flux._mlp_embedder_init(
                ks[3], cfg.pooled_dim, cfg.hidden)),
            "guidance_in": to_dev(flux._mlp_embedder_init(
                ks[6], cfg.time_embed_dim, cfg.hidden)),
            "final_mod": to_dev(flux.linear_init(ks[4], cfg.hidden,
                                                 2 * cfg.hidden)),
            "final_proj": to_dev(flux.linear_init(ks[5], cfg.hidden,
                                                  cfg.out_channels)),
            "double": [], "single": [],
        }
        for i in range(cfg.depth_double):
            params["double"].append(
                to_dev(flux._double_block_init(ks[8 + i], cfg)))
        for i in range(cfg.depth_single):
            params["single"].append(to_dev(flux._single_block_init(
                ks[8 + cfg.depth_double + i], cfg)))
    return cfg, params


def main() -> None:
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import scheduler as sched

    # persistent compile cache: the 57-block graph costs minutes to build
    # through the remote-compile tunnel on a cold run
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import os
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    quantized = on_tpu and os.environ.get("BENCH_QUANT", "1") != "0"
    if on_tpu:
        depth_double, depth_single = 4, 8   # ~2.5B, fits 16 GB HBM in bf16
        override = os.environ.get("BENCH_DEPTHS")  # e.g. "2,4" for the
        if override:                                # extrapolation check
            depth_double, depth_single = map(int, override.split(","))
            quantized = False
        grid = HEIGHT // 16                  # 64 -> 4096 image tokens
        s_txt = 512
    else:  # CPU smoke mode so the script always works
        depth_double, depth_single = 1, 2
        grid, s_txt = 8, 16
        quantized = False

    if quantized:
        # full 12B with int8 weights: measured, no extrapolation
        cfg, params = build_full_int8()
        depth_double, depth_single = cfg.depth_double, cfg.depth_single
    else:
        cfg, params = build_proxy(depth_double, depth_single)
    seq = grid * grid
    schedule = sched.make_schedule(NUM_STEPS, image_seq_len=seq)
    sigmas = jnp.asarray(schedule.sigmas)

    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal(
        (1, seq, cfg.in_channels)).astype(np.float32), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal(
        (1, s_txt, cfg.text_dim)).astype(np.float32), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_dim)).astype(np.float32), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))

    @jax.jit
    def denoise(params, latents):
        def body(i, x):
            sigma = sigmas[i]
            v = flux.apply(params, x, txt, pooled,
                           jnp.full((1,), sigma, jnp.float32),
                           img_ids, txt_ids, cfg,
                           guidance=jnp.full((1,), 2.5, jnp.float32))
            return sched.euler_step(x, v, sigma, sigmas[i + 1])
        return jax.lax.fori_loop(0, NUM_STEPS, body, latents)

    params = jax.device_put(params)
    # NOTE: timings must force a VALUE fetch — through the remote-TPU
    # tunnel block_until_ready returns before device execution finishes
    # (measured: impossible >peak FLOP rates otherwise).
    _ = np.asarray(denoise(params, latents)[0, 0, :1])  # compile + warm

    reps = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = denoise(params, latents)
        _ = np.asarray(out[0, 0, :1])     # forces completion
    elapsed = (time.perf_counter() - t0) / reps

    if quantized:
        images_per_min = 60.0 / elapsed
        metric = ("flux-1024px-28step-images-per-min-per-chip"
                  "(12B-int8-weights-measured)")
    else:
        # scale proxy blocks -> full model blocks (cost linear in depth;
        # double blocks cost ~2x a single block at same hidden width)
        proxy_cost = depth_double * 2.0 + depth_single
        full_cost = 19 * 2.0 + 38
        full_time = elapsed * full_cost / proxy_cost
        images_per_min = 60.0 / full_time
        metric = ("flux-1024px-28step-images-per-min-per-chip"
                  f"(12B-extrapolated-from-{depth_double}d{depth_single}s"
                  "-proxy)")

    result = {
        "metric": metric,
        "value": round(images_per_min, 4),
        "unit": "images/min/chip",
        "vs_baseline": round(images_per_min / REFERENCE_IMAGES_PER_MIN, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
