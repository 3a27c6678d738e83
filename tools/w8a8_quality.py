"""W8A8 quality ladder at proxy scale: how much does each quantization
rung move the final denoised latents?

    bf16 (exact)  ->  int8 weights (the headline mode)  ->  W8A8
                      (weight-only, near-lossless)          (+ dynamic
                                                            per-token
                                                            activation
                                                            quant on the
                                                            int8 MXU)

Same harness as tools/blockcache_quality.py: the bench proxy MMDiT at
production per-layer shapes, full 28-step denoise, final-latent rel-L2 +
cosine vs the bf16 run, across seeds and resolutions. The W8A8 numbers
contextualize the Pallas int8-MXU serving mode (ops/int8_gemm.py)
against the block-cache quality curve already in BENCH_NOTES (interval 2
= rel-L2 ~0.078): if W8A8 lands at or below that, the 1.4-1.9x GEMM
speedup costs less quality than the mildest cache schedule.

Run on the real chip:  python tools/w8a8_quality.py [depth_d depth_s]
(defaults 4 8).  CPU smoke: BENCH_PLATFORM=cpu with tiny depths (1 1).
"""

import dataclasses
import functools
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402


def main() -> None:
    import jax
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    import jax.numpy as jnp

    from domainrag_tpu.models import common as _common
    from domainrag_tpu.models import quant
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import scheduler as sched

    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(os.environ.get("WQ_STEPS", "28"))
    seeds = [int(s) for s in os.environ.get("WQ_SEEDS", "0,1,2").split(",")]
    grids = [int(g) for g in os.environ.get("WQ_GRIDS", "64,32").split(",")]

    # synthesize HOST-side and quantize BEFORE any device transfer — a
    # quantize_tree over device-resident proxies would drag GBs back
    # through the tunnel (np.asarray per weight)
    import ml_dtypes
    cfg = dataclasses.replace(flux.FLUX_DEV, depth_double=nd,
                              depth_single=ns)
    shapes = jax.eval_shape(lambda k: flux.init(k, cfg),
                            jax.random.PRNGKey(0))
    host_rng = np.random.default_rng(0)
    host = jax.tree_util.tree_map(
        lambda l: host_rng.standard_normal(l.shape).astype(np.float32)
        * 0.02, shapes)
    params_bf16 = jax.device_put(jax.tree_util.tree_map(
        lambda a: a.astype(ml_dtypes.bfloat16), host))
    params_q = jax.device_put(quant.quantize_tree(host))
    del host
    s_txt = 512
    rng = np.random.default_rng(7)
    txt = jnp.asarray(rng.standard_normal((1, s_txt, cfg.text_dim)),
                      jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                         jnp.bfloat16)
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))

    @functools.lru_cache(maxsize=None)
    def make_run(grid):
        seq = grid * grid
        schedule = sched.make_schedule(steps, image_seq_len=seq)
        sigmas = jnp.asarray(schedule.sigmas)
        img_ids = jnp.asarray(flux.make_image_ids(grid, grid))

        @jax.jit
        def run(params, latents):
            def body(i, x):
                v = flux.apply(params, x, txt, pooled,
                               jnp.full((1,), sigmas[i], jnp.float32),
                               img_ids, txt_ids, cfg,
                               guidance=jnp.full((1,), 2.5, jnp.float32))
                return sched.euler_step(x, v, sigmas[i], sigmas[i + 1])
            return jax.lax.fori_loop(0, steps, body, latents)
        return run

    def final_latents(params, grid, seed):
        r = np.random.default_rng(seed)
        seq = grid * grid
        lat = jnp.asarray(r.standard_normal((1, seq, cfg.in_channels)),
                          jnp.bfloat16)
        out = make_run(grid)(params, lat)
        return np.asarray(out, np.float32)

    # mode outermost: set_int8_activations clears every compiled cache,
    # so nesting it inside the seed loop would recompile the 28-step
    # denoise per seed (minutes each through the remote-compile tunnel)
    from domainrag_tpu.ops import mmdit_attention as _mma
    modes = [("bf16", params_bf16, False, False),
             ("int8w", params_q, False, False),
             ("w8a8", params_q, True, False)]
    if os.environ.get("WQ_INT8QK", "0") == "1":
        modes.append(("w8a8+int8qk", params_q, True, True))
    latents_by = {}
    for mode, params, acts, qk in modes:
        _common.set_int8_activations(acts)
        _mma.set_int8_qk(qk)
        try:
            for grid in grids:
                for seed in seeds:
                    latents_by[(mode, grid, seed)] = final_latents(
                        params, grid, seed)
        finally:
            _common.set_int8_activations(False)
            _mma.set_int8_qk(False)
        make_run.cache_clear()

    results = []
    for grid in grids:
        px = grid * 16
        for seed in seeds:
            base = latents_by[("bf16", grid, seed)]
            nrm = float(np.linalg.norm(base)) + 1e-12
            for mode in [m[0] for m in modes if m[0] != "bf16"]:
                got = latents_by[(mode, grid, seed)]
                rel = float(np.linalg.norm(got - base)) / nrm
                cos = float(np.dot(got.ravel(), base.ravel())
                            / (np.linalg.norm(got) * nrm + 1e-12))
                row = {"px": px, "seed": seed, "mode": mode,
                       "rel_l2_vs_bf16": round(rel, 5),
                       "cosine_vs_bf16": round(cos, 6)}
                results.append(row)
                print(json.dumps(row), flush=True)

    for mode in [m[0] for m in modes if m[0] != "bf16"]:
        for grid in grids:
            rows = [r for r in results
                    if r["mode"] == mode and r["px"] == grid * 16]
            print(json.dumps({
                "summary": mode, "px": grid * 16,
                "mean_rel_l2": round(float(np.mean(
                    [r["rel_l2_vs_bf16"] for r in rows])), 5),
                "min_cosine": round(float(np.min(
                    [r["cosine_vs_bf16"] for r in rows])), 6)}), flush=True)


if __name__ == "__main__":
    main()
