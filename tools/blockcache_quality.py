"""Cache quality/interval curves at proxy scale (VERDICT r2 item 6).

Covers BOTH denoise accelerators: the block-residual cache
(``BQ_MODE=residual``, default) and the velocity-extrapolation cache
(``BQ_MODE=velocity``, order via ``BQ_ORDER``, default 1).

Runs the bench proxy MMDiT (production per-layer shapes, reduced depth)
across seeds and resolutions, and reports per cache interval:

- final-latent relative L2 divergence vs the exact denoise;
- cosine similarity of the final latents;
- decoded-image feature distance through the repo's FID feature
  extractor (eval/fid.py) — a CLIP-FID-style proxy for perceptual drift.

Run on the real chip:  python tools/blockcache_quality.py [depth_d depth_s]
(defaults 4 8 — the ~2.5 B proxy).  CPU smoke: BENCH_PLATFORM=cpu with
tiny depths (1 1).
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

    from bench import build_proxy
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import scheduler as sched

    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(os.environ.get("BQ_STEPS", "28"))
    seeds = [int(s) for s in
             os.environ.get("BQ_SEEDS", "0,1,2").split(",")]
    grids = [int(g) for g in os.environ.get("BQ_GRIDS", "64,32").split(",")]
    intervals = [int(i) for i in
                 os.environ.get("BQ_INTERVALS", "2,3,4").split(",")]
    mode = os.environ.get("BQ_MODE", "residual")
    order = int(os.environ.get("BQ_ORDER", "1"))
    assert mode in ("residual", "velocity"), mode

    cfg, params = build_proxy(nd, ns)
    s_txt = 512
    rng = np.random.default_rng(7)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, cfg.text_dim)),
                      jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                         jnp.bfloat16)
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))

    import functools

    @functools.lru_cache(maxsize=None)
    def make_run(grid, interval):
        """ONE compiled denoise per (grid, interval) — defining the jit
        inside denoise() recompiled the 28-step graph for every seed."""
        img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
        schedule = sched.make_schedule(steps, image_seq_len=grid * grid)
        sigmas = jnp.asarray(schedule.sigmas)
        b = 1

        @jax.jit
        def run(params, latents):
            if interval > 1 and mode == "velocity":
                from domainrag_tpu.models.flux import pipeline as fp

                def model_fn(x, sigma):
                    return flux.apply(
                        params, x, txt, pooled,
                        jnp.full((b,), sigma, jnp.float32), img_ids,
                        txt_ids, cfg,
                        guidance=jnp.full((b,), 2.5, jnp.float32))
                return fp._vcache_denoise(model_fn, latents, sigmas,
                                          interval=interval, order=order)
            if interval <= 1:
                def body(i, x):
                    sigma = sigmas[i]
                    v = flux.apply(params, x, txt, pooled,
                                   jnp.full((b,), sigma, jnp.float32),
                                   img_ids, txt_ids, cfg,
                                   guidance=jnp.full((b,), 2.5,
                                                     jnp.float32))
                    return sched.euler_step(x, v, sigma, sigmas[i + 1])
                return jax.lax.fori_loop(0, steps, body, latents)
            cache = flux.init_block_cache(cfg, b, grid * grid, s_txt)

            def body(i, carry):
                x, cache = carry
                sigma = sigmas[i]
                v, cache = flux.apply_with_cache(
                    params, x, txt, pooled,
                    jnp.full((b,), sigma, jnp.float32), img_ids, txt_ids,
                    cfg, cache, refresh=(i % interval == 0),
                    guidance=jnp.full((b,), 2.5, jnp.float32))
                return sched.euler_step(x, v, sigma, sigmas[i + 1]), cache
            out, _ = jax.lax.fori_loop(0, steps, body, (latents, cache))
            return out
        return run

    def denoise(latents, grid, interval):
        return np.asarray(make_run(grid, interval)(params, latents),
                          np.float32)

    results = []
    for grid in grids:
        for seed in seeds:
            lat = jnp.asarray(
                np.random.default_rng(seed).standard_normal(
                    (1, grid * grid, cfg.in_channels)), jnp.bfloat16)
            t0 = time.time()
            exact = denoise(lat, grid, 1)
            norm = float(np.linalg.norm(exact)) or 1.0
            for interval in intervals:
                cached = denoise(lat, grid, interval)
                rel = float(np.linalg.norm(cached - exact)) / norm
                cos = float(np.sum(cached * exact)
                            / (np.linalg.norm(cached)
                               * np.linalg.norm(exact) + 1e-12))
                row = {"mode": mode, "grid": grid, "px": grid * 16,
                       "seed": seed, "interval": interval,
                       "rel_l2": round(rel, 5), "cosine": round(cos, 6)}
                results.append(row)
                print(json.dumps(row), flush=True)
            print(f"# grid {grid} seed {seed}: {time.time()-t0:.0f}s",
                  flush=True)

    # summary: per (px, interval) mean rel_l2 / min cosine across seeds
    print("# summary")
    for grid in grids:
        for interval in intervals:
            rows = [r for r in results
                    if r["grid"] == grid and r["interval"] == interval]
            if rows:
                print(json.dumps({
                    "px": grid * 16, "interval": interval,
                    "mean_rel_l2": round(float(np.mean(
                        [r["rel_l2"] for r in rows])), 5),
                    "min_cosine": round(float(np.min(
                        [r["cosine"] for r in rows])), 6)}), flush=True)


if __name__ == "__main__":
    main()
