"""Velocity-cache throughput on the FULL 12B int8 model, one process.

Measures the velocity-extrapolation denoise accelerator
(flux/pipeline._vcache_denoise — the transformer runs every N-th step,
skipped steps integrate a linearly-extrapolated velocity) on the real
chip at the headline workload (1024 px, 28 steps), for intervals
{1 (exact), 2, 3} in BOTH serving modes (int8-weight/bf16-compute and
W8A8), with the same resident weights — one weight synthesis + transfer
instead of six bench runs.

Run:  python tools/vcache_bench.py
Env:  VC_INTERVALS=2,3  VC_ORDER=1  VC_REPS=3  VC_MODES=int8w,w8a8
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    import jax.numpy as jnp

    from bench import build_full_int8, build_proxy, NUM_STEPS
    from domainrag_tpu.models import common as _common
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import pipeline as fp
    from domainrag_tpu.models.flux import scheduler as sched

    on_tpu = jax.devices()[0].platform == "tpu"
    intervals = [int(i) for i in
                 os.environ.get("VC_INTERVALS", "2,3").split(",")]
    order = int(os.environ.get("VC_ORDER", "1"))
    reps = int(os.environ.get("VC_REPS", "3" if on_tpu else "1"))
    modes = os.environ.get("VC_MODES", "int8w,w8a8").split(",")

    if on_tpu:
        cfg, params = build_full_int8()
        grid, s_txt = 64, 512
    else:  # CPU smoke
        cfg, params = build_proxy(1, 2)
        grid, s_txt = 8, 16

    seq = grid * grid
    schedule = sched.make_schedule(NUM_STEPS, image_seq_len=seq)
    sigmas = jnp.asarray(schedule.sigmas)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal(
        (1, seq, cfg.in_channels)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal(
        (1, s_txt, cfg.text_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_dim)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))

    import functools

    @functools.lru_cache(maxsize=None)
    def make_denoise(interval: int):
        @jax.jit
        def run(params, latents):
            def model_fn(x, sigma):
                return flux.apply(
                    params, x, txt, pooled,
                    jnp.full((1,), sigma, jnp.float32), img_ids, txt_ids,
                    cfg, guidance=jnp.full((1,), 2.5, jnp.float32))
            return fp._pick_denoise(model_fn, latents, sigmas,
                                    vcache_interval=interval,
                                    vcache_order=order)
        return run

    def measure(interval: int) -> float:
        run = make_denoise(interval)
        _ = np.asarray(run(params, latents)[0, 0, :1])  # compile + warm
        t0 = time.perf_counter()
        for _ in range(reps):
            _ = np.asarray(run(params, latents)[0, 0, :1])
        return (time.perf_counter() - t0) / reps

    base = [] if os.environ.get("VC_EXACT", "1") == "0" else [1]
    for mode in modes:
        _common.set_int8_activations(mode == "w8a8")
        make_denoise.cache_clear()  # the toggle is read at trace time
        for interval in base + intervals:
            t = measure(interval)
            print(json.dumps({
                "mode": mode, "interval": interval, "order": order,
                "denoise_seconds": round(t, 4),
                "images_per_min": round(60.0 / t, 4),
                "vs_reference_as_written": round(60.0 / t, 2),
            }), flush=True)
    _common.set_int8_activations(False)


if __name__ == "__main__":
    main()
