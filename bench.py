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

vs_baseline: the reference publishes no throughput numbers (SURVEY.md §6),
so the baseline is an explicit FLOP-accounted model of the reference
AS WRITTEN — per-sample pipeline reloads
(/root/reference/outpainting_updown_sampling_redux.py:1185), 50 steps,
sequential ranks, eager diffusers on an A100 — fully derived in
BENCH_NOTES.md §"Reference baseline". A second, generous "ideal serving"
baseline (28 steps, no reloads, compiled) is reported alongside so the
claim is bounded from both sides.

Extra env modes: BENCH_W8A8=1 (int8 activations on the int8 MXU path),
BENCH_E2E=1 (adds Redux prior + VAE decode + PNG IO to the measured
image), BENCH_HIRES=1 (2048 px fill-regime step + tiled VAE, OOM check),
BENCH_BLOCKCACHE=1 (block-residual cache section),
BENCH_VCACHE_SECTION=0 (skip the default-on W8A8+velocity-cache
capstone section; intervals via *_INTERVAL — both cache sections are
labeled experimental and never the headline),
BENCH_CHECKS=0 (skip the on-TPU exactness assertions).
"""

import json
import os
import sys
import time

import numpy as np

# Reference throughput model (images/min per A100 GPU, 1024 px) — full
# derivation in BENCH_NOTES.md. "as written": 50 steps + per-sample
# pipeline reloads + eager diffusers (~25% MFU). "ideal": 28 steps, no
# reloads, compiled (~45% MFU) — a serving stack the reference does not
# contain, priced in its favor.
REFERENCE_AS_WRITTEN_IPM = 1.0
REFERENCE_IDEAL_SERVING_IPM = 2.5

NUM_STEPS = 28
HEIGHT = WIDTH = 1024


def run_exactness_checks() -> None:
    """On-TPU regression assertions folded into every bench run
    (VERDICT r1 weak #6): retrieval top-k vs the numpy oracle on both
    backends, and Pallas flash attention vs dense XLA attention."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.topk import (topk_ip, topk_ip_numpy,
                                        topk_ip_pallas)
    from domainrag_tpu.ops.attention import (attention_reference,
                                             flash_attention)

    interp = jax.default_backend() != "tpu"  # Pallas interpret off-TPU
    rng = np.random.default_rng(7)
    n_bank, n_q = (4096, 16) if not interp else (512, 4)  # interpret: slow
    bank = rng.standard_normal((n_bank, 512)).astype(np.float32)
    bank /= np.linalg.norm(bank, axis=1, keepdims=True)
    q = rng.standard_normal((n_q, 512)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    _, oracle_idx = topk_ip_numpy(q, bank, 100)
    _, xla_idx = topk_ip(jnp.asarray(q), jnp.asarray(bank), 100)
    # explicit raises (not assert): the gate must survive `python -O`
    if not np.array_equal(np.asarray(xla_idx), oracle_idx):
        raise RuntimeError("XLA top-k diverged from oracle")
    _, pl_idx = topk_ip_pallas(jnp.asarray(q), jnp.asarray(bank), 100,
                               interpret=interp)
    if not np.array_equal(np.asarray(pl_idx), oracle_idx):
        raise RuntimeError("Pallas top-k diverged from oracle")

    s_attn = 512 if not interp else 128
    qh = jnp.asarray(rng.standard_normal((1, 4, s_attn, 128)),
                     jnp.bfloat16)
    flash = np.asarray(flash_attention(qh, qh, qh, interpret=interp),
                       np.float32)
    dense = np.asarray(attention_reference(qh, qh, qh), np.float32)
    err = np.abs(flash - dense).max() / (np.abs(dense).max() + 1e-8)
    if err >= 0.02:
        raise RuntimeError(f"flash vs dense attention rel err {err:.4f}")
    print(f"exactness checks passed (flash rel err {err:.2e})",
          file=sys.stderr)


def build_proxy(depth_double: int, depth_single: int):
    """Proxy MMDiT with production layer shapes, reduced depth. Weights
    are synthesized HOST-side in numpy and shipped bf16: a device-side
    f32 `flux.init` of the 4d+8s proxy needs ~15 GB transient HBM (f32
    tree + bf16 cast) and OOMs when anything else is resident."""
    import jax
    import ml_dtypes
    from domainrag_tpu.models.flux import model as flux

    cfg = flux.FluxConfig(depth_double=depth_double,
                          depth_single=depth_single)
    shapes = jax.eval_shape(lambda k: flux.init(k, cfg),
                            jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def synth(leaf):
        return jax.device_put(
            (rng.standard_normal(leaf.shape).astype(np.float32) * 0.02
             ).astype(ml_dtypes.bfloat16))

    return cfg, jax.tree_util.tree_map(synth, shapes)


def build_full_int8(depth_double=None, depth_single=None, fill=False):
    """The FULL 19-double/38-single 12B MMDiT with weight-only int8
    (models.quant layout): ~12 GB of weights fits the single chip, so the
    headline is measured end-to-end, not extrapolated.

    Weights are synthesized DIRECTLY in the quantized layout from shape
    specs (random int8 + unit scales): dense-compute timing is independent
    of weight values, and skipping the 48 GB f32 init + host quantization
    cuts the benchmark's setup from ~20 min to ~2 on this host. Blocks
    stream to the device one at a time.

    ``depth_double``/``depth_single`` override the depths for
    reduced-depth int8 proxies (tools/tpu_experiments.py w8a8situ);
    ``fill=True`` builds the FLUX_FILL_DEV variant (in_channels 384)."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    import numpy as np
    from domainrag_tpu.models.flux import model as flux

    cfg = flux.FLUX_FILL_DEV if fill else flux.FLUX_DEV
    if depth_double is not None:
        cfg = dataclasses.replace(cfg, depth_double=depth_double,
                                  depth_single=depth_single)
    device = jax.devices()[0]
    rng = np.random.default_rng(0)

    def synth(shape_tree):
        def small(x):
            return rng.standard_normal(x.shape).astype(np.float32) * 0.02

        def walk(node):
            if isinstance(node, dict):
                w = node.get("w")
                if w is not None and len(getattr(w, "shape", ())) == 2 \
                        and int(np.prod(w.shape)) >= (1 << 16):
                    out = {  # quantized-linear layout (models.quant)
                        "w_q": rng.integers(-127, 128, w.shape,
                                            dtype=np.int8),
                        "w_s": np.full((w.shape[1],),
                                       (2.0 / w.shape[0]) ** 0.5 / 127.0,
                                       np.float32),
                    }
                    if "b" in node:
                        out["b"] = small(node["b"])
                    return out
                return {k: walk(v) for k, v in node.items()}
            if isinstance(node, list):
                return [walk(v) for v in node]
            if hasattr(node, "shape"):
                return small(node)
            return node

        return walk(shape_tree)

    key = jax.random.PRNGKey(0)

    def block_shapes(init_fn, *args):
        # close over non-array args so eval_shape keeps them static
        return jax.eval_shape(lambda k: init_fn(k, *args), key)

    params = {
        "img_in": synth(block_shapes(flux.linear_init, cfg.in_channels,
                                     cfg.hidden)),
        "txt_in": synth(block_shapes(flux.linear_init, cfg.text_dim,
                                     cfg.hidden)),
        "time_in": synth(block_shapes(flux._mlp_embedder_init,
                                      cfg.time_embed_dim, cfg.hidden)),
        "vector_in": synth(block_shapes(flux._mlp_embedder_init,
                                        cfg.pooled_dim, cfg.hidden)),
        "guidance_in": synth(block_shapes(flux._mlp_embedder_init,
                                          cfg.time_embed_dim, cfg.hidden)),
        "final_mod": synth(block_shapes(flux.linear_init, cfg.hidden,
                                        2 * cfg.hidden)),
        "final_proj": synth(block_shapes(flux.linear_init, cfg.hidden,
                                         cfg.out_channels)),
        "double": [], "single": [],
    }
    dbl_shapes = block_shapes(flux._double_block_init, cfg)
    sgl_shapes = block_shapes(flux._single_block_init, cfg)
    params = jax.device_put(params, device)
    for _ in range(cfg.depth_double):
        params["double"].append(jax.device_put(synth(dbl_shapes), device))
    for _ in range(cfg.depth_single):
        params["single"].append(jax.device_put(synth(sgl_shapes), device))
    return cfg, params


def main() -> None:
    import os
    import jax

    # NB: this environment preloads jax at interpreter startup (axon TPU
    # integration), so the JAX_PLATFORMS env var is read too early to
    # matter — use BENCH_PLATFORM=cpu for a CPU smoke run (same mechanism
    # as tests/conftest.py).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import scheduler as sched

    # persistent compile cache: the 57-block graph costs minutes to build
    # through the remote-compile tunnel on a cold run
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    if os.environ.get("BENCH_PIPELINE_PHASE"):
        bench_pipeline_phase(os.environ["BENCH_PIPELINE_PHASE"])
        return
    if os.environ.get("BENCH_PIPELINE") == "1":
        cfg = _pipebench_cfg()
        px = cfg.generate.sampling.height
        steps = cfg.generate.sampling.num_steps
        print(json.dumps({
            "metric": f"full-pipeline-{px}px-{steps}step"
            + ("-w8a8" if os.environ.get("BENCH_PIPELINE_W8A8") == "1"
               else "")
            + (f"-vcache{os.environ['BENCH_PIPELINE_VCACHE']}"
               if os.environ.get("BENCH_PIPELINE_VCACHE", "1") != "1"
               else ""),
            **bench_full_pipeline()}))
        return
    if os.environ.get("BENCH_FILLRUN") == "1" and on_tpu:
        # fresh-process complete fill at the 2800 px cap — the round-5
        # per-step numbers (9.56 s int8w / 8.10 s W8A8) measured single
        # steps; this runs the ENTIRE 50-step strength-trimmed denoise
        # loop + tiled VAE encode/decode through the real fill_batch API
        # at the reference's max shape (outpainting...py:104-108)
        print(json.dumps(bench_fill_fullrun()))
        return
    if os.environ.get("BENCH_ONLY_HIRES") == "1" and on_tpu:
        # fresh-process 2048 px fill entry: device-buffer freeing through
        # the axon tunnel is unreliable, so the hires measurement gets a
        # process of its own. The fresh process is also the best shot for
        # the donated-params full-12B attempt (VERDICT r3 item 6): nothing
        # else is resident, so build the full int8 model here and let
        # bench_hires_fill try the direct + donated paths before falling
        # back to the depth-proxy extrapolation. BENCH_HIRES_FULL=0 skips
        # the 12 GB build for a quick proxy-only rerun.
        from domainrag_tpu.models.flux.model import FLUX_DEV
        holder = {}
        if os.environ.get("BENCH_HIRES_FULL", "1") == "1":
            _, holder["params"] = build_full_int8()
        px = int(os.environ.get("BENCH_HIRES_GRID", "128")) * 16
        print(json.dumps({"metric": f"flux-{px}px-fill-step(standalone)",
                          **bench_hires_fill(holder, FLUX_DEV)}))
        return
    quantized = on_tpu and os.environ.get("BENCH_QUANT", "1") != "0"
    w8a8 = quantized and os.environ.get("BENCH_W8A8", "0") == "1"
    if os.environ.get("BENCH_CHECKS", "1") != "0":
        run_exactness_checks()
    if w8a8:
        from domainrag_tpu.models import common as _common
        _common.set_int8_activations(True)
    if os.environ.get("BENCH_INT8QK", "0") == "1" and on_tpu:
        # SageAttention-style int8 QK scores (ops/mmdit_attention.py)
        from domainrag_tpu.ops import mmdit_attention as _mma
        _mma.set_int8_qk(True)
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

    # BENCH_BATCH=5 measures the production serving pattern: a sample's
    # <=5 retrieval ranks denoise as ONE batch (the reference generates
    # them sequentially — ref batch_generate_flux_kshot.py:996-1005)
    batch = int(os.environ.get("BENCH_BATCH", "1"))
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal(
        (batch, seq, cfg.in_channels)).astype(np.float32), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal(
        (batch, s_txt, cfg.text_dim)).astype(np.float32), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal(
        (batch, cfg.pooled_dim)).astype(np.float32), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))

    @jax.jit
    def denoise(params, latents):
        def body(i, x):
            sigma = sigmas[i]
            v = flux.apply(params, x, txt, pooled,
                           jnp.full((batch,), sigma, jnp.float32),
                           img_ids, txt_ids, cfg,
                           guidance=jnp.full((batch,), 2.5, jnp.float32))
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

    # BENCH_BLOCKCACHE=1: block-residual caching (refresh every other
    # step — models/flux/model.apply_with_cache; arXiv:2312.03209
    # family). EXPERIMENTAL: changes outputs; labeled separately, never
    # the headline. Measured with the same resident params.
    blockcache_ipm = None
    if os.environ.get("BENCH_BLOCKCACHE", "0") == "1" and quantized:
        bc_interval = int(os.environ.get("BENCH_BLOCKCACHE_INTERVAL", "2"))
        try:
            cache0 = flux.init_block_cache(cfg, batch, seq, s_txt)

            @jax.jit
            def denoise_bc(params, latents, cache):
                def body(i, carry):
                    x, cache = carry
                    sigma = sigmas[i]
                    v, cache = flux.apply_with_cache(
                        params, x, txt, pooled,
                        jnp.full((batch,), sigma, jnp.float32),
                        img_ids, txt_ids, cfg, cache,
                        refresh=(i % bc_interval == 0),
                        guidance=jnp.full((batch,), 2.5, jnp.float32))
                    return sched.euler_step(x, v, sigma,
                                            sigmas[i + 1]), cache
                out, _ = jax.lax.fori_loop(0, NUM_STEPS, body,
                                           (latents, cache))
                return out

            _ = np.asarray(denoise_bc(params, latents, cache0)[0, 0, :1])
            t0 = time.perf_counter()
            for _ in range(reps):
                _ = np.asarray(denoise_bc(params, latents,
                                          cache0)[0, 0, :1])
            blockcache_ipm = batch * 60.0 * reps / (time.perf_counter()
                                                    - t0)
        except Exception as e:  # noqa: BLE001 — cache adds ~1.6 GB HBM
            blockcache_ipm = f"error: {type(e).__name__}: {str(e)[:80]}"

    # W8A8 serving (ops/int8_gemm.py: the Pallas GEMM engages the v5e's
    # native 394-TOPS int8 MXU, ~1.5x the bf16-compute step). Default-on
    # section so every BENCH_r*.json records both modes; the headline
    # stays int8-weight/bf16-compute (W8A8 quantizes activations and
    # drifts outputs — quality ladder in tools/w8a8_quality.py).
    # Measured BEFORE the experimental vcache capstone: as the THIRD
    # resident full graph the retraced W8A8 step read 0.4394 s vs its
    # true 0.2999 s (round 5, tunnel-side executable freeing strikes
    # again) — the labeled number runs second, the experimental one
    # absorbs the co-residency risk.
    w8a8_ipm = None
    if quantized and not w8a8 \
            and os.environ.get("BENCH_W8A8_SECTION", "1") != "0":
        from domainrag_tpu.models import common as _common
        try:
            # the toggle clears compiled caches; the next denoise call
            # retraces with the int8-activation path
            _common.set_int8_activations(True)
            _ = np.asarray(denoise(params, latents)[0, 0, :1])
            t0 = time.perf_counter()
            for _ in range(reps):
                _ = np.asarray(denoise(params, latents)[0, 0, :1])
            w8a8_ipm = batch * 60.0 * reps / (time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — keep the headline alive
            w8a8_ipm = f"error: {type(e).__name__}: {str(e)[:80]}"
        finally:
            _common.set_int8_activations(False)

    # Velocity-extrapolation cache section (pipeline._vcache_denoise —
    # the transformer runs every Nth step, skipped steps integrate an
    # extrapolated velocity; state is two latent-sized f32 buffers, so it
    # has none of the block cache's ~1.6 GB/sample HBM cost and composes
    # with PP). EXPERIMENTAL: changes outputs; labeled, never the
    # headline. Default-on at the measured capstone point (W8A8 +
    # interval 3 = 19.8x the reference as written — BENCH_NOTES); the
    # W8A8 toggle is skipped when the main mode is already W8A8.
    # BENCH_VCACHE_SECTION=0 disables; *_INTERVAL/*_ORDER configure.
    vcache_ipm = None
    vc_interval = int(os.environ.get("BENCH_VCACHE_INTERVAL", "3"))
    vc_order = int(os.environ.get("BENCH_VCACHE_ORDER", "1"))
    if os.environ.get("BENCH_VCACHE_SECTION", "1") == "1" and quantized:
        from domainrag_tpu.models import common as _common
        from domainrag_tpu.models.flux import pipeline as fp
        try:
            if not w8a8:
                _common.set_int8_activations(True)

            @jax.jit
            def denoise_vc(params, latents):
                def model_fn(x, sigma):
                    return flux.apply(
                        params, x, txt, pooled,
                        jnp.full((batch,), sigma, jnp.float32),
                        img_ids, txt_ids, cfg,
                        guidance=jnp.full((batch,), 2.5, jnp.float32))
                return fp._vcache_denoise(model_fn, latents, sigmas,
                                          interval=vc_interval,
                                          order=vc_order)

            _ = np.asarray(denoise_vc(params, latents)[0, 0, :1])
            t0 = time.perf_counter()
            for _ in range(reps):
                _ = np.asarray(denoise_vc(params, latents)[0, 0, :1])
            vcache_ipm = batch * 60.0 * reps / (time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001 — keep the headline alive
            vcache_ipm = f"error: {type(e).__name__}: {str(e)[:80]}"
        finally:
            if not w8a8:
                _common.set_int8_activations(False)

    if quantized:
        images_per_min = batch * 60.0 / elapsed
        tag = "12B-int8w8a8-measured" if w8a8 else "12B-int8-weights-measured"
        if batch > 1:
            tag += f"-batch{batch}"
        metric = f"flux-1024px-28step-images-per-min-per-chip({tag})"
    else:
        # scale proxy blocks -> full model blocks (cost linear in depth;
        # double blocks cost ~2x a single block at same hidden width)
        proxy_cost = depth_double * 2.0 + depth_single
        full_cost = 19 * 2.0 + 38
        full_time = elapsed * full_cost / proxy_cost
        images_per_min = batch * 60.0 / full_time
        metric = ("flux-1024px-28step-images-per-min-per-chip"
                  f"(12B-extrapolated-from-{depth_double}d{depth_single}s"
                  "-proxy)")

    # MFU from exact FLOP accounting (eval/flops.py; fixes the round-1
    # overcount). Denominator is the chip's bf16 peak: for int8-weight
    # serving the MXU still computes bf16; for W8A8 we also report
    # utilization of the doubled int8 peak.
    from domainrag_tpu.eval import flops as flops_mod
    from domainrag_tpu.models.flux.model import FLUX_DEV
    step_flops = flops_mod.flux_forward_flops(FLUX_DEV, seq, s_txt).total
    step_seconds = 60.0 / images_per_min / NUM_STEPS
    mfu_bf16 = flops_mod.mfu(step_flops, step_seconds,
                             flops_mod.PEAK_TFLOPS["tpu-v5e"]) \
        if on_tpu else None

    result = {
        "metric": metric,
        "value": round(images_per_min, 4),
        "unit": "images/min/chip",
        # vs the reference AS WRITTEN (50 steps + per-sample pipeline
        # reloads + eager diffusers; BENCH_NOTES.md "Reference baseline")
        "vs_baseline": round(images_per_min / REFERENCE_AS_WRITTEN_IPM, 3),
        # vs a generous idealized reference serving stack (28 steps,
        # resident pipelines, compiled) that the reference does not ship
        "vs_baseline_ideal_serving": round(
            images_per_min / REFERENCE_IDEAL_SERVING_IPM, 3),
        "step_seconds": round(step_seconds, 4),
        "step_tflops": round(step_flops / 1e12, 2),
    }
    if mfu_bf16 is not None:
        result["mfu_vs_bf16_peak"] = round(mfu_bf16, 4)
        if w8a8:
            result["mfu_vs_int8_peak"] = round(mfu_bf16 / 2.0, 4)
    if blockcache_ipm is not None:
        result["blockcache_images_per_min_experimental"] = (
            round(blockcache_ipm, 4) if isinstance(blockcache_ipm, float)
            else blockcache_ipm)
    if vcache_ipm is not None:
        key = f"w8a8_vcache{vc_interval}_images_per_min_experimental"
        result[key] = (round(vcache_ipm, 4)
                       if isinstance(vcache_ipm, float) else vcache_ipm)
    if w8a8_ipm is not None:
        if isinstance(w8a8_ipm, float):
            w8_step = 60.0 / w8a8_ipm / NUM_STEPS
            result["w8a8_images_per_min"] = round(w8a8_ipm, 4)
            result["w8a8_step_seconds"] = round(w8_step, 4)
            result["w8a8_vs_baseline"] = round(
                w8a8_ipm / REFERENCE_AS_WRITTEN_IPM, 3)
            if on_tpu:
                result["w8a8_mfu_vs_int8_peak"] = round(flops_mod.mfu(
                    step_flops, w8_step,
                    2 * flops_mod.PEAK_TFLOPS["tpu-v5e"]), 4)
        else:
            result["w8a8_images_per_min"] = w8a8_ipm

    # optional sections are best-effort: a transient remote-compile/tunnel
    # failure must not lose the headline measurement. Exceptions are
    # caught per section; a HANG (the axon worker died mid-run — observed:
    # jax calls block forever on a severed tunnel, signals can't preempt
    # the stuck C++ frame) is covered by a watchdog that prints the
    # headline-so-far and exits.
    import threading as _threading
    _done = _threading.Event()
    _print_lock = _threading.Lock()
    _printed = [False]

    def _emit():
        with _print_lock:
            if not _printed[0]:
                _printed[0] = True
                print(json.dumps(dict(result)), flush=True)

    def _watchdog():
        # generous: a cold BENCH_HIRES tiled-decode compile alone is ~22 min
        deadline = float(os.environ.get("BENCH_SECTION_DEADLINE", "2400"))
        if not _done.wait(deadline):
            result["sections_error"] = (
                f"optional sections exceeded {deadline:.0f}s "
                "(tpu worker hang?) — partial result emitted")
            _emit()
            os._exit(0)

    if on_tpu:
        _threading.Thread(target=_watchdog, daemon=True).start()

    def _section(flag, default, name, fn, *args):
        if os.environ.get(flag, default) != "1" or not on_tpu:
            return
        try:
            result.update(fn(*args))
        except Exception as e:  # noqa: BLE001
            result[f"{name}_error"] = f"{type(e).__name__}: {str(e)[:120]}"

    # e2e/hires interpret `elapsed`/`params` as FULL-model quantities;
    # in proxy mode (BENCH_QUANT=0 / BENCH_DEPTHS) they would report
    # proxy timings under full-model metric names — skip them there
    if quantized:
        _section("BENCH_E2E", "0", "e2e", bench_e2e_components,
                 elapsed / batch)
    elif os.environ.get("BENCH_E2E", "0") == "1":
        result["e2e_skipped"] = "proxy mode (set BENCH_QUANT=1)"
    _section("BENCH_RETRIEVAL", "1", "retrieval", bench_retrieval_qps)
    # hires last: its 16k-token full-model step is the most HBM-hungry
    # piece and an OOM here must not take the other sections with it.
    # The params travel in a holder so the section can FREE the 12 GB
    # before its reduced-depth fallback.
    holder = {"params": params, "latents": latents}
    del params, latents
    if quantized:
        _section("BENCH_HIRES", "0", "hires2048", bench_hires_fill,
                 holder, cfg)
    elif os.environ.get("BENCH_HIRES", "0") == "1":
        result["hires2048_skipped"] = "proxy mode (set BENCH_QUANT=1)"
    # train/retrscale run LAST: the train section's proxy params + grads
    # + f32 Adam moments (~11 GB at depth 2,3) and the 500k-row f32 bank
    # (~1 GB) do not fit HBM next to the full 12 GB int8 weights, so the
    # headline weights must be released first. This holds in PROXY mode
    # too: the depth-2,3 noremat train cell OOMs next to the leftover
    # (1,2) headline proxy + latents (measured, round 5), so the holder
    # clears unconditionally.
    if (os.environ.get("BENCH_TRAIN", "0") == "1"
            or os.environ.get("BENCH_RETRSCALE", "0") == "1"):
        holder.clear()
    _section("BENCH_TRAIN", "0", "train", bench_train_step)
    _section("BENCH_RETRSCALE", "0", "retrscale", bench_retrieval_scale)
    if on_tpu:
        _done.set()
        _emit()
    else:
        print(json.dumps(result))


def bench_train_step() -> dict:
    """Measured on-chip flow-match training steps (VERDICT r3 item 8 /
    r4 weak #6: one point is not a curve). Grid = BENCH_TRAIN_DEPTHS
    (';'-separated depth pairs, default "2,3") x BENCH_TRAIN_BATCH
    (','-separated batch sizes) x remat on/off, per-cell OOM capture —
    Adam moments are f32, so 2 extra param copies must fit HBM next to
    grads (depth 2,3 ~0.9 B params is near the single-chip ceiling;
    the full 12 B trains sharded, make_sharded_train_step fsdp+tp,
    exercised by the dryrun). Reports step time + model-FLOPs MFU (3x
    forward; remat recompute counts as overhead, not useful FLOPs)."""
    import functools
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.eval import flops as flops_mod
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.train import flow_match as fm

    depth_pairs = []
    for seg in os.environ.get("BENCH_TRAIN_DEPTHS", "2,3").split(";"):
        if seg.strip():
            a, b = seg.split(",")
            depth_pairs.append((int(a), int(b)))
    # BENCH_TRAIN_BATCH: comma-separated batch sizes. Batch 1 pins the
    # single-chip floor; larger batches amortize the per-step fixed costs
    # (Adam's f32 moment sweep, in/out projections) and give the bwd
    # GEMMs cross-sample reuse — the production-relevant MFU.
    batches = [int(b) for b in os.environ.get(
        "BENCH_TRAIN_BATCH", "1").split(",") if b.strip()] or [1]
    out = {"train_proxy_depths":
           ";".join(f"{a},{b}" for a, b in depth_pairs)}
    for dd, ds in depth_pairs:
        dtag = "" if (dd, ds) == (2, 3) else f"_d{dd}x{ds}"
        try:
            _train_cells(out, dd, ds, dtag, batches, flops_mod, flux,
                         fm, functools, jax, jnp)
        except Exception as e:  # noqa: BLE001 — the proxy build itself
            out[f"train{dtag}_error"] = f"{type(e).__name__}: " \
                f"{str(e)[:160]}"
    return out


def _train_cells(out, dd, ds, dtag, batches, flops_mod, flux, fm,
                 functools, jax, jnp) -> None:
    """Fills ``out`` in place so cells measured before a larger batch
    OOMs survive (per-batch error capture below)."""
    cfg, params = build_proxy(dd, ds)
    grid, s_txt = HEIGHT // 16, 512
    seq = grid * grid
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    for batch in batches:
        batch_d = {
            "x0": jnp.asarray(rng.standard_normal(
                (batch, seq, cfg.in_channels)), jnp.bfloat16),
            "txt": jnp.asarray(rng.standard_normal(
                (batch, s_txt, cfg.text_dim)), jnp.bfloat16),
            "pooled": jnp.asarray(rng.standard_normal(
                (batch, cfg.pooled_dim)), jnp.bfloat16),
            "img_ids": jnp.asarray(flux.make_image_ids(grid, grid)),
            "txt_ids": jnp.asarray(flux.make_text_ids(s_txt)),
        }
        fwd = flops_mod.flux_forward_flops(cfg, seq, s_txt).total * batch
        # same suffix rule as the step-time tags: legacy unsuffixed key
        # at batch 1 so older bench JSON consumers keep working
        seq_tag = ("" if batch == 1 else f"_b{batch}") + dtag
        out[f"train_batch_seq{seq_tag}"] = f"{batch}x{seq}"
        try:
            _train_remat_cells(out, batch, batch_d, dtag, cfg, params,
                               fwd, flops_mod, fm, functools, jax, jnp)
        except Exception as e:  # noqa: BLE001 — record the OOM cell
            out[f"train_step{seq_tag}_error"] = f"{type(e).__name__}: " \
                f"{str(e)[:160]}"
        del batch_d


def _train_remat_cells(out, batch, batch_d, dtag, cfg, params, fwd,
                       flops_mod, fm, functools, jax, jnp) -> None:
    key = jax.random.PRNGKey(0)
    # BENCH_TRAIN_REMAT: "remat" / "noremat" / "both" (default). A TPU
    # OOM poisons subsequent allocations in the same process through
    # the axon tunnel (measured: the b1-noremat OOM took every later
    # grid cell with it), so tools/train_grid.py sweeps the grid as
    # one-cell fresh processes using this filter.
    which = os.environ.get("BENCH_TRAIN_REMAT", "both")
    for remat in (True, False):
        if which != "both" and remat != (which == "remat"):
            continue
        tc = fm.TrainConfig(remat=remat)
        opt = fm.make_optimizer(tc)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, o, b_, k, tc=tc, opt=opt):
            return fm.train_step(p, o, b_, k, cfg, tc, opt)

        # fresh buffers per variant: device_put of an already-placed
        # tree is a no-op returning the SAME buffers, so donating
        # them into step() would delete `params` for the next
        # variant (measured: "Array has been deleted" on the
        # noremat pass)
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = opt.init(p)
        p, o, loss = step(p, o, batch_d, key)
        _ = np.asarray(loss)                       # compile + warm
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            p, o, loss = step(p, o, batch_d, key)
            _ = np.asarray(loss)                   # forced value fetch
        dt = (time.perf_counter() - t0) / reps
        tag = ("remat" if remat else "noremat") + (
            f"_b{batch}" if batch != 1 else "") + dtag
        out[f"train_step_s_{tag}"] = round(dt, 4)
        out[f"train_mfu_vs_bf16_peak_{tag}"] = round(flops_mod.mfu(
            3 * fwd, dt, flops_mod.PEAK_TFLOPS["tpu-v5e"]), 4)
        del p, o


def bench_retrieval_scale() -> dict:
    """Retrieval QPS vs bank size (VERDICT r3 item 9: COCO train2017 is
    118k rows and the multi-source corpus larger, so the 100k gate alone
    does not cover the reference corpus scale). Single-chip exact
    top-100 at 100k/250k/500k x 512; the sharded-bank path is covered by
    the dryrun's bit-equal merge."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.topk import topk_ip

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((128, 512)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    n_chain = 10
    out = {}
    for n in (100_000, 250_000, 500_000):
        bank = jnp.asarray(rng.standard_normal((n, 512)), jnp.float32)
        bank = bank / jnp.linalg.norm(bank, axis=1, keepdims=True)

        @jax.jit
        def chain(q, bank):
            idx = jnp.zeros((q.shape[0], 100), jnp.int32)
            for i in range(n_chain):
                _, ix = topk_ip(q + 1e-6 * i, bank, 100)  # defeat CSE
                idx = idx + ix
            return idx

        _ = np.asarray(chain(q, bank)[0, :1])
        t0 = time.perf_counter()
        _ = np.asarray(chain(q, bank)[0, :1])
        per_call = (time.perf_counter() - t0) / n_chain
        out[f"retrieval_qps_{n // 1000}k_bank"] = round(128 / per_call, 1)
        del bank
    return out


def bench_retrieval_qps() -> dict:
    """Exact top-100 retrieval QPS over a device-resident 100k x 512 bank
    (BASELINE.json names retrieval QPS as part of the headline metric).
    20 searches chained in one executable; forced value fetch."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.ops.topk import topk_ip

    rng = np.random.default_rng(3)
    bank = jnp.asarray(rng.standard_normal((100_000, 512)), jnp.float32)
    bank = bank / jnp.linalg.norm(bank, axis=1, keepdims=True)
    q = jnp.asarray(rng.standard_normal((128, 512)), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
    n_chain = 20

    @jax.jit
    def chain(q, bank):
        idx = jnp.zeros((q.shape[0], 100), jnp.int32)
        for i in range(n_chain):
            _, ix = topk_ip(q + 1e-6 * i, bank, 100)  # defeat CSE
            idx = idx + ix
        return idx

    _ = np.asarray(chain(q, bank)[0, :1])
    t0 = time.perf_counter()
    _ = np.asarray(chain(q, bank)[0, :1])
    per_call = (time.perf_counter() - t0) / n_chain
    return {"retrieval_qps_100k_bank": round(128 / per_call, 1)}


# ---------------------------------------------------------------------------
# BENCH_PIPELINE: orchestrator-driven four-stage pipeline at full size
# ---------------------------------------------------------------------------

_PIPE_DATASET = "PIPEBENCH"


def _pipebench_paths() -> dict:
    root = os.environ.get("BENCH_PIPELINE_DIR", "/tmp/drtpu_pipebench")
    return {"root": root,
            "datasets": os.path.join(root, "datasets"),
            "out": os.path.join(root, "out"),
            "corpus": os.path.join(root, "corpus"),
            "prompts": os.path.join(root, "prompt_cache.npz"),
            "frag": os.path.join(root, "fragments")}


def _pipebench_tiny() -> bool:
    """BENCH_PIPELINE_TINY=1: tiny models + tiny shapes — a CPU smoke
    mode validating the 3-phase orchestration (npz round-trip, prompt
    release, fragment merge) without chip time."""
    return os.environ.get("BENCH_PIPELINE_TINY", "0") == "1"


def _pipebench_cfg():
    import dataclasses
    from domainrag_tpu.core.config import DatasetParams, PipelineConfig
    p = _pipebench_paths()
    tiny = _pipebench_tiny()
    steps = int(os.environ.get("BENCH_PIPELINE_STEPS",
                               "2" if tiny else str(NUM_STEPS)))
    size = 32 if tiny else 1024
    cfg = PipelineConfig(datasets=(_PIPE_DATASET,), shots=(1,),
                         datasets_dir=p["datasets"], output_dir=p["out"])
    # BENCH_PIPELINE_VCACHE=N: fast-mode end-to-end run — both denoise
    # stages use the velocity cache at interval N (labeled mode, image-
    # space budgets in BENCH_NOTES); composes with BENCH_PIPELINE_W8A8=1
    vc = int(os.environ.get("BENCH_PIPELINE_VCACHE", "1"))
    return dataclasses.replace(
        cfg,
        generate=dataclasses.replace(
            cfg.generate,
            sampling=dataclasses.replace(cfg.generate.sampling,
                                         num_steps=steps, height=size,
                                         width=size,
                                         velocity_cache_interval=vc),
            # the repo's own single-chip serving guidance (BENCH_NOTES
            # "Measured batch scaling on ONE chip": batch 2 is SLOWER
            # per image, and in the pipeline phase — where the VAE/
            # SigLIP/Redux co-reside with the 12 GB int8 tree — the
            # batch-2 denoise graph's compile estimate is 19.31 GB vs
            # 15.75 GB HBM (measured OOM, round 5)
            max_rank_batch=1),
        compose=dataclasses.replace(
            cfg.compose, num_steps=steps,
            velocity_cache_interval=vc,
            # same single-chip guidance as generate: the one-batch
            # <=5-bg fill graph OOMs at 20.29 GB (measured, round 5)
            max_rank_batch=1,
            dataset_params={_PIPE_DATASET: DatasetParams(
                upscale_dimension=size)}))


def _synth_bf16_tree(init_fn, seed=0, dtype=None):
    """Host-synthesized params from shape specs (no device f32
    transient; same pool trick as the full-flux-synth rehearsal).
    bf16 unless ``dtype`` overrides (LaMa's spectral path wants f32)."""
    import jax
    import ml_dtypes
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    pool = (np.random.default_rng(seed).standard_normal(1 << 20)
            .astype(np.float32) * 0.02).astype(
                dtype or ml_dtypes.bfloat16)

    def synth(leaf):
        n = int(np.prod(leaf.shape))
        return jax.device_put(np.resize(pool, n).reshape(leaf.shape))

    return jax.tree_util.tree_map(synth, shapes)


def _pipebench_prompt_cache():
    """Load the textencode phase's npz into a FluxBundle prompt cache."""
    import jax.numpy as jnp
    data = np.load(_pipebench_paths()["prompts"], allow_pickle=True)
    prompts = list(data["prompts"])
    return {p: (jnp.asarray(data[f"t5_{i}"]),
                jnp.asarray(data[f"pooled_{i}"]))
            for i, p in enumerate(prompts)}


def _pipebench_bundle(fill: bool):
    """Full-size serving bundle: 12 B int8 transformer + bf16 VAE /
    SigLIP-so400m / Redux, text towers RELEASED (prompt cache from the
    textencode phase). Small models build first so the SigLIP f32 init
    transient never lands next to the 12 GB int8 tree."""
    import jax.numpy as jnp
    from domainrag_tpu.models import redux as redux_mod
    from domainrag_tpu.models import siglip as siglip_mod
    from domainrag_tpu.models import clip as clip_mod
    from domainrag_tpu.models import t5 as t5_mod
    from domainrag_tpu.models.flux import pipeline as fp
    from domainrag_tpu.models.flux import vae as vae_mod

    if _pipebench_tiny():
        b = fp.tiny_bundle(fill=fill)
        b.prompt_cache = _pipebench_prompt_cache()
        fp.release_text_encoders(b)
        return b
    vae_cfg = vae_mod.FLUX_VAE
    vae_params = _synth_bf16_tree(lambda k: vae_mod.init(k, vae_cfg), 1)
    scfg = siglip_mod.SIGLIP_SO400M
    sparams = _synth_bf16_tree(lambda k: siglip_mod.init(k, scfg), 2)
    rcfg = redux_mod.REDUX_DEV
    rparams = _synth_bf16_tree(lambda k: redux_mod.init(k, rcfg), 3)
    cfg, params = build_full_int8(fill=fill)
    return fp.FluxBundle(
        flux_params=params, flux_cfg=cfg,
        vae_params=vae_params, vae_cfg=vae_cfg,
        t5_params=None, t5_cfg=t5_mod.T5_XXL,
        clip_text_params=None,
        clip_text_cfg=clip_mod.ClipTextConfig(),
        siglip_params=sparams, siglip_cfg=scfg,
        redux_params=rparams, redux_cfg=rcfg,
        compute_dtype=jnp.bfloat16,
        prompt_cache=_pipebench_prompt_cache())


def _pipebench_corpus_sources() -> dict:
    import glob as glob_mod
    return {"coco": sorted(glob_mod.glob(
        os.path.join(_pipebench_paths()["corpus"], "*.jpg")))}


def _write_fragment(name: str, payload: dict) -> None:
    p = _pipebench_paths()
    os.makedirs(p["frag"], exist_ok=True)
    with open(os.path.join(p["frag"], f"{name}.json"), "w") as f:
        json.dump(payload, f, indent=2)


def bench_pipeline_phase(phase: str) -> None:
    """One child phase of the full-pipeline benchmark. Phases are
    separate PROCESSES mirroring the reference's four fire-and-forget
    shell phases (domainrag.sh:1-31) — and because on one 16 GB chip
    T5-XXL (9.5 GB), the int8 dev transformer (11.9 GB) and the int8
    fill transformer (11.9 GB) can never be co-resident (device-buffer
    freeing through the axon tunnel is additionally unreliable, the
    BENCH_ONLY_HIRES lesson)."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from domainrag_tpu.pipeline.orchestrator import PipelineRunner
    cfg = _pipebench_cfg()
    if os.environ.get("BENCH_PIPELINE_W8A8", "0") == "1" and \
            phase in ("main3", "compose"):
        # fast-mode end-to-end: int8 activations through the denoise
        # phases (the text/encoder phase stays bf16, as in serving)
        from domainrag_tpu.models import common as _common
        _common.set_int8_activations(True)

    if phase == "textencode":
        import jax.numpy as jnp
        from domainrag_tpu.core import text as text_util
        from domainrag_tpu.models import clip as clip_mod
        from domainrag_tpu.models import t5 as t5_mod
        from domainrag_tpu.models.flux import pipeline as fp
        from domainrag_tpu.models.flux import model as flux_mod
        from domainrag_tpu.models.flux import vae as vae_mod
        t0 = time.perf_counter()
        if _pipebench_tiny():
            bundle = fp.tiny_bundle()
        else:
            t5_cfg = t5_mod.T5_XXL
            ct_cfg = clip_mod.ClipTextConfig()
            bundle = fp.FluxBundle(
                flux_params=None, flux_cfg=flux_mod.FLUX_DEV,
                vae_params=None, vae_cfg=vae_mod.FLUX_VAE,
                t5_params=_synth_bf16_tree(
                    lambda k: t5_mod.init(k, t5_cfg), 10),
                t5_cfg=t5_cfg,
                clip_text_params=_synth_bf16_tree(
                    lambda k: clip_mod.init_text(k, ct_cfg), 11),
                clip_text_cfg=ct_cfg,
                clip_tokenizer=text_util.StubTokenizer(
                    vocab_size=ct_cfg.vocab_size,
                    bos_id=ct_cfg.vocab_size - 2,
                    eos_id=ct_cfg.eos_token_id),
                t5_tokenizer=text_util.StubTokenizer(
                    vocab_size=t5_cfg.vocab_size, bos_id=None, eos_id=1))
        load_s = time.perf_counter() - t0
        prompts = sorted({cfg.generate.redux.prompt} | {
            d.redux_prompt
            for d in cfg.compose.dataset_params.values()})
        t0 = time.perf_counter()
        fp.precompute_prompts(bundle, prompts)
        encode_s = time.perf_counter() - t0
        arrs = {"prompts": np.array(prompts, object)}
        for i, p_ in enumerate(prompts):
            t5_e, pooled = bundle.prompt_cache[p_]
            arrs[f"t5_{i}"] = np.asarray(t5_e, np.float32)
            arrs[f"pooled_{i}"] = np.asarray(pooled, np.float32)
        np.savez(_pipebench_paths()["prompts"], **arrs)
        _write_fragment("textencode", {
            "model_load_s": round(load_s, 2),
            "stage_s": {"textencode": round(encode_s, 4)},
            "n_prompts": len(prompts)})
        return

    if phase == "main3":
        from domainrag_tpu.models import clip as clip_mod
        from domainrag_tpu.models import lama as lama_mod
        from domainrag_tpu.models import resnet_stem
        from domainrag_tpu.stages import inpaint as inpaint_stage
        from domainrag_tpu.stages.encoders import (ClipImageEncoder,
                                                   StyleEncoder)
        tiny = _pipebench_tiny()
        t0 = time.perf_counter()
        lama_cfg = lama_mod.TINY_LAMA if tiny else lama_mod.BIG_LAMA
        lama_params = _synth_bf16_tree(
            lambda k: lama_mod.init(k, lama_cfg), 20, dtype=np.float32)
        vcfg = (clip_mod.TINY_VISION if tiny
                else clip_mod.ClipVisionConfig())
        clip_enc = ClipImageEncoder(
            _synth_bf16_tree(lambda k: clip_mod.init_vision(k, vcfg), 21),
            vcfg, batch_size=8)
        style_enc = StyleEncoder(_synth_bf16_tree(resnet_stem.init, 22),
                                 batch_size=8,
                                 resize=cfg.retrieval.style_resize)
        small_load_s = time.perf_counter() - t0
        runner = PipelineRunner(
            cfg=cfg,
            lama_runner=inpaint_stage.LamaRunner(lama_params, lama_cfg),
            clip_encoder=clip_enc, style_encoder=style_enc,
            flux_bundle=None, fill_bundle=None,
            corpus_sources=_pipebench_corpus_sources())
        res = runner.run(stages=("inpaint", "retrieve"))
        # free the inpaint/retrieval models BEFORE the 12 GB transformer
        # builds (same staged residency the reference's separate scripts
        # get for free; tunnel-side freeing is unreliable enough that
        # every co-resident GB matters)
        runner.lama_runner = None
        runner.clip_encoder = None
        runner.style_encoder = None
        del lama_params, clip_enc, style_enc
        t0 = time.perf_counter()
        runner.flux_bundle = _pipebench_bundle(fill=False)
        flux_load_s = time.perf_counter() - t0
        res2 = runner.run(stages=("generate",))
        gen = res2["generate"][f"{_PIPE_DATASET}/1"]
        _write_fragment("main3", {
            "model_load_s": {"small": round(small_load_s, 2),
                             "flux_dev_int8": round(flux_load_s, 2)},
            "stage_s": {k.split("/")[-1]: round(v["total_s"], 4)
                        for k, v in {**res["timings"],
                                     **res2["timings"]}.items()},
            "generate_result": gen})
        return

    if phase == "compose":
        t0 = time.perf_counter()
        fill_bundle = _pipebench_bundle(fill=True)
        flux_load_s = time.perf_counter() - t0
        runner = PipelineRunner(
            cfg=cfg, lama_runner=None, clip_encoder=None,
            style_encoder=None, flux_bundle=None,
            fill_bundle=fill_bundle)
        res = runner.run(stages=("compose",))
        comp = res["compose"][f"{_PIPE_DATASET}/1"]
        n_final = sum(len(s["outpainted_images"]) for s in comp["samples"])
        _write_fragment("compose", {
            "model_load_s": {"flux_fill_int8": round(flux_load_s, 2)},
            "stage_s": {k.split("/")[-1]: round(v["total_s"], 4)
                        for k, v in res["timings"].items()},
            "compose_final_images": n_final})
        return

    raise ValueError(f"unknown BENCH_PIPELINE_PHASE {phase!r}")


def bench_full_pipeline() -> dict:
    """Parent driver: synthesize a toy dataset, run the three phase
    processes, merge their timing fragments into one pipeline-level
    measurement (VERDICT r4 missing #3: every stage was measured in
    isolation; the reference's deliverable is the four-stage pipeline,
    domainrag.sh:1-31). Stage wall-clock comes from each phase's
    orchestrator StepTimer spans; model synthesis/placement is reported
    separately (a real deployment pays checkpoint-load there instead)."""
    import shutil
    import subprocess
    from PIL import Image
    p = _pipebench_paths()
    n_samples = int(os.environ.get("BENCH_PIPELINE_SAMPLES", "3"))
    n_corpus = int(os.environ.get("BENCH_PIPELINE_CORPUS", "16"))
    if os.environ.get("BENCH_PIPELINE_FRESH", "1") == "1" and \
            os.path.isdir(p["root"]):
        shutil.rmtree(p["root"])
    rng = np.random.default_rng(0)
    train = os.path.join(p["datasets"], _PIPE_DATASET, "train")
    anns = os.path.join(p["datasets"], _PIPE_DATASET, "annotations")
    os.makedirs(train, exist_ok=True)
    os.makedirs(anns, exist_ok=True)
    os.makedirs(p["corpus"], exist_ok=True)
    h = w = 64 if _pipebench_tiny() else 1024
    images, annotations = [], []
    for i in range(n_samples):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(os.path.join(train, f"sample_{i}.jpg"))
        images.append({"id": i, "file_name": f"sample_{i}.jpg",
                       "width": w, "height": h})
        annotations.append({"id": i, "image_id": i, "category_id": 1,
                            "bbox": [w // 4, h // 4, w // 4, h // 4]})
    with open(os.path.join(anns, "1_shot.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": 1, "name": "object"}]}, f)
    cs = 64 if _pipebench_tiny() else 640
    for i in range(n_corpus):
        Image.fromarray(rng.integers(0, 255, (cs, cs, 3), dtype=np.uint8)
                        ).save(os.path.join(p["corpus"], f"c{i}.jpg"))

    phase_wall = {}
    for phase in ("textencode", "main3", "compose"):
        t0 = time.perf_counter()
        env = dict(os.environ, BENCH_PIPELINE_PHASE=phase)
        env.pop("BENCH_PIPELINE", None)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, stdout=sys.stderr, stderr=sys.stderr)
        phase_wall[phase] = round(time.perf_counter() - t0, 1)
        if r.returncode != 0:
            return {"value": 0.0, "unit": "img/min",
                    "vs_baseline": 0.0, "error": f"phase {phase} failed "
                    f"(rc {r.returncode})", "phase_wall_s": phase_wall}

    frags = {}
    for name in ("textencode", "main3", "compose"):
        with open(os.path.join(p["frag"], f"{name}.json")) as f:
            frags[name] = json.load(f)
    stage_s = {**frags["textencode"]["stage_s"],
               **frags["main3"]["stage_s"], **frags["compose"]["stage_s"]}
    total = sum(stage_s.values())
    n_final = frags["compose"]["compose_final_images"]
    ipm = n_final * 60.0 / total if total else 0.0
    return {
        "value": round(ipm, 4), "unit": "img/min",
        "vs_baseline": round(ipm / REFERENCE_AS_WRITTEN_IPM, 2),
        "samples": n_samples, "final_images": n_final,
        "steps": _pipebench_cfg().generate.sampling.num_steps,
        "stage_seconds": {k: round(v, 2) for k, v in stage_s.items()},
        "stage_share": {k: round(v / total, 4)
                        for k, v in stage_s.items()} if total else {},
        "model_load_s": {"textencode":
                         frags["textencode"]["model_load_s"],
                         **frags["main3"]["model_load_s"],
                         **frags["compose"]["model_load_s"]},
        "phase_wall_s": phase_wall,
    }


def bench_e2e_components(denoise_seconds: float) -> dict:
    """Measure the non-denoise pieces of one served image ONCE at full
    size (VERDICT r1 weak #5): SigLIP+Redux dual-image prior, 1024 px VAE
    decode, and host PNG encode. Text-encoder cost is excluded: stage 3
    uses empty prompts (ref batch_generate_flux_kshot.py:64), so CLIP/T5
    embeds are computed once per run and cached."""
    import io
    import jax
    import jax.numpy as jnp
    from PIL import Image
    from domainrag_tpu.models import siglip as siglip_mod
    from domainrag_tpu.models import redux as redux_mod
    from domainrag_tpu.models.flux import vae as vae_mod

    rng = np.random.default_rng(0)

    def fetch1(out):
        # completion via a DEVICE-SIDE 1-element slice. Fetching the whole
        # leaf (np.asarray(leaf)) measured the axon tunnel's bandwidth on
        # 6-24 MB outputs (0.3-0.5 s!), not device compute — a real TPU
        # host pays local PCIe for this, so it does not belong in the
        # component cost. Round-2/early-round-3 prior/VAE numbers were
        # inflated by exactly this (BENCH_NOTES e2e section).
        leaf = jax.tree_util.tree_leaves(out)[0]
        idx = tuple(0 for _ in leaf.shape[:-1])
        return np.asarray(leaf[idx][:1])

    def timeit(fn, *args, reps=3):
        fetch1(fn(*args))
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        fetch1(outs[-1])     # async dispatches queue on-device; one fetch
        return (time.perf_counter() - t0) / reps

    scfg = siglip_mod.SIGLIP_SO400M
    sparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        siglip_mod.init(jax.random.PRNGKey(0), scfg))
    rcfg = redux_mod.REDUX_DEV
    rparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        redux_mod.init(jax.random.PRNGKey(1), rcfg))
    imgs = jnp.asarray(rng.standard_normal(
        (2, scfg.image_size, scfg.image_size, 3)), jnp.bfloat16)

    # params as ARGUMENTS: closing over them bakes ~1 GB of constants
    # into the lowering, which the remote-compile transport rejects
    @jax.jit
    def prior(sparams, rparams, imgs):
        h = siglip_mod.apply(sparams, imgs, scfg)
        return redux_mod.apply(rparams, h)

    t_prior = timeit(prior, sparams, rparams, imgs)

    vcfg = vae_mod.FLUX_VAE
    vparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        vae_mod.init(jax.random.PRNGKey(2), vcfg))
    lat = jnp.asarray(rng.standard_normal((1, 128, 128, 16)), jnp.bfloat16)
    try:
        decode = jax.jit(lambda p, z: vae_mod.decode(p, z, vcfg))
        t_vae = timeit(decode, vparams, lat)
    except Exception:  # noqa: BLE001 — remote compile limits on the
        # full-frame 1024px decode graph; production _fill_core tiles
        decode = jax.jit(lambda p, z: vae_mod.decode_tiled(p, z, vcfg))
        t_vae = timeit(decode, vparams, lat)

    px = np.asarray(
        jnp.clip((decode(vparams, lat)[0].astype(jnp.float32) + 1) * 127.5,
                 0, 255)).astype(np.uint8)
    t0 = time.perf_counter()
    buf = io.BytesIO()
    Image.fromarray(px).save(buf, format="PNG")
    t_io = time.perf_counter() - t0

    total = denoise_seconds + t_prior + t_vae + t_io
    return {
        "e2e_prior_seconds": round(t_prior, 4),
        "e2e_vae_decode_seconds": round(t_vae, 4),
        "e2e_png_io_seconds": round(t_io, 4),
        "e2e_images_per_min": round(60.0 / total, 4),
        "e2e_denoise_share": round(denoise_seconds / total, 4),
    }


def bench_fill_fullrun() -> dict:
    """One COMPLETE Flux-Fill outpaint at the 2800 px cap, as THREE
    fresh processes: VAE-only conditioning → 12 B denoise → VAE-only
    decode (handoff via npz in /tmp). The single-process attempt is
    documented in BENCH_NOTES: the one-graph core's compile estimate is
    20.91 GB; staged jits compile individually but the remote worker
    CRASHES at runtime once the second big executable runs (the same
    tunnel-side freeing pathology as BENCH_NOTES' "batches 4 and 5
    crash the worker" — per-phase process residency is this
    environment's established answer, exactly as BENCH_PIPELINE runs
    its phases). Reference configs: 50 steps, guidance 30, strength
    0.9 → 45 trimmed steps, 1241-token serving conditioning.
    BENCH_FILLRUN_W8A8=1 / BENCH_FILLRUN_VCACHE=N select the labeled
    fast modes. Matches the reference's max fill shape,
    outpainting_updown_sampling_redux.py:104-108."""
    import subprocess
    phase = os.environ.get("BENCH_FILLRUN_PHASE")
    if phase:
        return _fillrun_phase(phase)
    px = int(os.environ.get("BENCH_FILLRUN_PX", "2800"))
    steps = int(os.environ.get("BENCH_FILLRUN_STEPS", "50"))
    vc = int(os.environ.get("BENCH_FILLRUN_VCACHE", "1"))
    w8a8 = os.environ.get("BENCH_FILLRUN_W8A8", "0") == "1"
    tag = ("w8a8" if w8a8 else "int8w") + \
        (f"+vcache{vc}" if vc != 1 else "")
    out = {"metric": f"flux-fill-{px}px-{steps}step-complete({tag})"}
    wall = {}
    for ph in ("cond", "denoise", "decode"):
        env = dict(os.environ, BENCH_FILLRUN="1", BENCH_FILLRUN_PHASE=ph)
        t0 = time.perf_counter()
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, stdout=sys.stderr, stderr=sys.stderr)
        wall[ph] = round(time.perf_counter() - t0, 1)
        if r.returncode != 0:
            out.update(value=0.0, unit="s/image", vs_baseline=0.0,
                       error=f"phase {ph} rc {r.returncode}",
                       phase_wall_s=wall)
            return out
    with open(_fillrun_path("timing.json")) as f:
        timing = json.load(f)
    out.update(value=round(timing["steady_total_s"], 2), unit="s/image",
               vs_baseline=round(timing["steady_total_s"], 2),
               phase_wall_s=wall, **timing)
    return out


def _fillrun_path(name: str) -> str:
    d = "/tmp/drtpu_fillrun"
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, name)


def _fillrun_phase(phase: str) -> dict:
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models import common as _common
    from domainrag_tpu.models.flux import pipeline as fp
    from domainrag_tpu.models.flux import scheduler as sched_mod
    from domainrag_tpu.models.flux import vae as vae_mod

    px = int(os.environ.get("BENCH_FILLRUN_PX", "2800"))
    steps = int(os.environ.get("BENCH_FILLRUN_STEPS", "50"))
    vc = int(os.environ.get("BENCH_FILLRUN_VCACHE", "1"))
    w8a8 = os.environ.get("BENCH_FILLRUN_W8A8", "0") == "1"
    grid = px // 16
    seq = grid * grid
    vae_cfg = vae_mod.FLUX_VAE
    rng = np.random.default_rng(0)
    schedule = sched_mod.make_schedule(steps, image_seq_len=seq,
                                       strength=0.9)
    sigmas = jnp.asarray(schedule.sigmas)
    tpath = _fillrun_path("timing.json")
    timing = {}
    if os.path.exists(tpath) and phase != "cond":
        with open(tpath) as f:
            timing = json.load(f)

    if phase in ("cond", "decode"):
        vae_params = _synth_bf16_tree(
            lambda k: vae_mod.init(k, vae_cfg), 1)
        if phase == "cond":
            image = jnp.asarray(
                rng.standard_normal((1, px, px, 3)), jnp.bfloat16)
            mask = np.full((1, px, px), 1.0, np.float32)
            lo, hi = int(px * 0.3), int(px * 0.7)
            mask[:, lo:hi, lo:hi] = 0.0          # keep the center 40 %
            mask = jnp.asarray(mask, jnp.bfloat16)
            noise = jnp.asarray(
                rng.standard_normal((1, seq, 64)), jnp.bfloat16)
            t0 = time.perf_counter()
            latents, cond = fp._fill_cond_jit(
                vae_params, image, mask, noise, sigmas, vae_cfg, True,
                96, 16)
            _ = np.asarray(latents[0, :1, :1])
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            latents, cond = fp._fill_cond_jit(
                vae_params, image, mask, noise, sigmas, vae_cfg, True,
                96, 16)
            _ = np.asarray(latents[0, :1, :1])
            timing["cond_steady_s"] = round(time.perf_counter() - t0, 3)
            timing["cond_first_s"] = round(first, 1)
            np.savez(_fillrun_path("cond.npz"),
                     latents=np.asarray(latents, np.float32),
                     cond=np.asarray(cond, np.float32))
        else:
            toks = jnp.asarray(
                np.load(_fillrun_path("toks.npz"))["toks"], jnp.bfloat16)
            t0 = time.perf_counter()
            out = fp._decode_tokens_jit(vae_params, toks, grid, grid,
                                        vae_cfg, True, 96, 16)
            _ = np.asarray(out[0, :1, :1, :1])
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = fp._decode_tokens_jit(vae_params, toks, grid, grid,
                                        vae_cfg, True, 96, 16)
            img = np.asarray(out, np.float32)
            timing["decode_steady_s"] = round(
                time.perf_counter() - t0, 3)
            timing["decode_first_s"] = round(first, 1)
            timing["outputs_finite"] = bool(np.isfinite(img).all())
            timing["steady_total_s"] = round(
                timing["cond_steady_s"] + timing["denoise_steady_s"]
                + timing["decode_steady_s"], 3)
    elif phase == "denoise":
        d = np.load(_fillrun_path("cond.npz"))
        latents = jnp.asarray(d["latents"], jnp.bfloat16)
        cond = jnp.asarray(d["cond"], jnp.bfloat16)
        embeds = jnp.asarray(rng.standard_normal((1, 1241, 4096)),
                             jnp.bfloat16)
        pooled = jnp.asarray(rng.standard_normal((1, 768)), jnp.bfloat16)
        cfg, params = build_full_int8(fill=True)
        if w8a8:
            _common.set_int8_activations(True)
        try:
            t0 = time.perf_counter()
            toks = fp._fill_denoise_jit(
                params, latents, cond, embeds, pooled, sigmas,
                jnp.float32(30.0), cfg, grid, grid, "none/none", vc, 1)
            _ = np.asarray(toks[0, :1, :1])
            first = time.perf_counter() - t0
            t0 = time.perf_counter()
            toks = fp._fill_denoise_jit(
                params, latents, cond, embeds, pooled, sigmas,
                jnp.float32(30.0), cfg, grid, grid, "none/none", vc, 1)
            _ = np.asarray(toks[0, :1, :1])
            timing["denoise_steady_s"] = round(
                time.perf_counter() - t0, 3)
            timing["denoise_first_s"] = round(first, 1)
            timing["denoise_steps"] = int(sigmas.shape[0]) - 1
            np.savez(_fillrun_path("toks.npz"),
                     toks=np.asarray(toks, np.float32))
        finally:
            _common.set_int8_activations(False)
    else:
        raise ValueError(f"unknown BENCH_FILLRUN_PHASE {phase!r}")
    with open(tpath, "w") as f:
        json.dump(timing, f)
    return timing


def bench_hires_fill(holder, cfg) -> dict:
    """2048 px fill-regime entry (VERDICT r1 item 1): one full-model
    denoise step at 16384+512 tokens plus a tiled 2048 px VAE decode,
    both on the real chip — the OOM check for the UODD upscale config
    (ref outpainting_updown_sampling_redux.py:72-82). ``holder`` owns the
    12 GB int8 params so they can be freed for the reduced-depth
    fallback."""
    import jax
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import vae as vae_mod

    params = holder.pop("params", None)
    holder.clear()
    # bigger proxy when nothing else is resident (BENCH_ONLY_HIRES fresh
    # process) — tighter extrapolation base
    proxy_depths = (2, 4) if params is not None else (4, 8)
    rng = np.random.default_rng(0)
    # 2048 px -> grid 128 -> 16384 image tokens. BENCH_HIRES_GRID=175
    # probes the reference's 2800 px cap (~31k tokens, the multipass
    # fused-attention regime) — with only the int8 weights resident the
    # O(seq) attention may fit even that on one chip.
    grid = int(os.environ.get("BENCH_HIRES_GRID", "128"))
    s_txt = 512
    pxkey = f"hires{grid * 16}"     # hires2048 at the default grid

    def _pk(suffix):
        return f"{pxkey}_{suffix}"
    lat = jnp.asarray(rng.standard_normal(
        (1, grid * grid, cfg.in_channels)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal(
        (1, s_txt, cfg.text_dim)), jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal(
        (1, cfg.pooled_dim)), jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(grid, grid))
    txt_ids = jnp.asarray(flux.make_text_ids(s_txt))

    @jax.jit
    def step(params, x):
        return flux.apply(params, x, txt, pooled,
                          jnp.full((1,), 0.5, jnp.float32), img_ids,
                          txt_ids, cfg,
                          guidance=jnp.full((1,), 30.0, jnp.float32))

    out = {}
    t_step = None
    if params is not None:
        try:
            _ = np.asarray(step(params, lat)[0, 0, :1])
            t0 = time.perf_counter()
            _ = np.asarray(step(params, lat)[0, 0, :1])
            t_step = time.perf_counter() - t0
            # partial progress to stderr IMMEDIATELY: the round-5
            # grid-175 first run measured the step and then lost it to
            # a tiled-VAE OOM at the very end (JSON printed nothing)
            print(f"# {pxkey} direct step: {t_step:.4f}s",
                  file=sys.stderr, flush=True)
        except Exception:  # noqa: BLE001 — 12 GB int8 weights +
            # 16k-token activations exceed one v5e's HBM. NB: the
            # fallback must run OUTSIDE this handler — the live
            # exception's traceback pins the params through the inner
            # call frames.
            pass
    if params is not None and t_step is not None \
            and os.environ.get("BENCH_HIRES_W8A8", "1") == "1":
        # the plain step fit, so the full model is still resident:
        # measure the W8A8 serving mode at the same 16896-token shape
        # directly (round 3 could only extrapolate 2.22 s from proxy
        # depth slopes). The toggle retraces the quantized-linear path
        # onto the Pallas int8-MXU GEMM; one extra remote compile.
        from domainrag_tpu.models import common as _common
        try:
            _common.set_int8_activations(True)

            @jax.jit
            def step8(params, x):
                return flux.apply(params, x, txt, pooled,
                                  jnp.full((1,), 0.5, jnp.float32),
                                  img_ids, txt_ids, cfg,
                                  guidance=jnp.full((1,), 30.0,
                                                    jnp.float32))

            _ = np.asarray(step8(params, lat)[0, 0, :1])
            t0 = time.perf_counter()
            _ = np.asarray(step8(params, lat)[0, 0, :1])
            out[f"{pxkey}_w8a8_step_seconds"] = round(
                time.perf_counter() - t0, 4)
            print(f"# {pxkey} w8a8 step: "
                  f"{out[f'{pxkey}_w8a8_step_seconds']}s",
                  file=sys.stderr, flush=True)
            del step8
        except Exception as e:  # noqa: BLE001 — W8A8 extra must not
            # lose the measured plain step
            out[f"{pxkey}_w8a8_attempt"] = (
                f"{type(e).__name__}: {str(e)[:120]}")
        finally:
            _common.set_int8_activations(False)
    if params is not None and t_step is None:
        # Donated one-shot (VERDICT r3 item 6): with the params DONATED,
        # XLA buffer assignment may reuse each block's weight buffers as
        # activation scratch once that block has consumed them — the
        # liveness peak drops from (all weights + peak activations) to
        # roughly (all weights) since the 17408-token intermediates fit
        # in already-dead weight space. One execution consumes the
        # params; a second synthesized copy gives a confirming rep.
        import functools
        import gc
        del step
        gc.collect()
        jax.clear_caches()

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step_d(params, x):
            return flux.apply(params, x, txt, pooled,
                              jnp.full((1,), 0.5, jnp.float32), img_ids,
                              txt_ids, cfg,
                              guidance=jnp.full((1,), 30.0, jnp.float32))

        try:
            reps = []
            for r in range(2):
                if r > 0:
                    _, params = build_full_int8()
                t0 = time.perf_counter()
                y = step_d(params, jnp.copy(lat))
                jax.block_until_ready(y)
                reps.append(time.perf_counter() - t0)
                params = None
                del y
                gc.collect()
            # rep 0 includes the compile; rep 1 is execute-only (plus
            # one dispatch through the tunnel, ~ms against ~seconds)
            t_step = reps[-1]
            out[f"{pxkey}_step_note"] = (
                "MEASURED full 12B via donated params (weight buffers "
                f"reused as activation scratch); reps={[round(x, 3) for x in reps]}")
        except Exception as e:  # noqa: BLE001
            out[f"{pxkey}_donated_attempt"] = (
                f"{type(e).__name__}: {str(e)[:160]}")
            params = None
            gc.collect()
            jax.clear_caches()
    if t_step is None:
        # free the full model, measure a reduced-depth bf16 proxy at the
        # same shapes and extrapolate linearly in depth (the same
        # validated model as the round-1 headline). Multi-chip (TP/SP) is
        # the production deployment for this regime.
        import gc
        params = None
        if "step" in dir():
            del step         # absent when the donated attempt ran
        gc.collect()
        jax.clear_caches()   # drop the failed executable + its workspace
        dd, ds = proxy_depths
        proxy_cfg, proxy_params = build_proxy(dd, ds)

        @jax.jit
        def pstep(params, x):
            return flux.apply(params, x, txt, pooled,
                              jnp.full((1,), 0.5, jnp.float32), img_ids,
                              txt_ids, proxy_cfg,
                              guidance=jnp.full((1,), 30.0, jnp.float32))
        _ = np.asarray(pstep(proxy_params, lat)[0, 0, :1])
        t0 = time.perf_counter()
        _ = np.asarray(pstep(proxy_params, lat)[0, 0, :1])
        t_step = (time.perf_counter() - t0) * (19 * 2.0 + 38) / (dd * 2.0
                                                                 + ds)
        out[f"{pxkey}_step_note"] = (
            f"extrapolated-from-{dd}d{ds}s-proxy (full int8 model + "
            "16k-token activations exceed one chip; production is TP/SP)")

    vcfg = vae_mod.FLUX_VAE
    vparams = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        vae_mod.init(jax.random.PRNGKey(2), vcfg))
    z = jnp.asarray(rng.standard_normal((1, grid * 2, grid * 2, 16)), jnp.bfloat16)
    tiled = jax.jit(lambda p, z: vae_mod.decode_tiled(p, z, vcfg))
    try:
        _ = np.asarray(tiled(vparams, z)[0, 0, 0, :1])
        t0 = time.perf_counter()
        _ = np.asarray(tiled(vparams, z)[0, 0, 0, :1])
        t_vae = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001 — first grid-175 run: the
        # tiled decode OOMed with the 12 GB weights + both step
        # executables still resident and took the measured step numbers
        # down with it. The decode must never lose the step results;
        # retry once with the transformer executables and weights freed
        # (serving note: at the 2800 px cap, decode-with-model-resident
        # is HBM-marginal on one chip — recorded either way).
        import gc
        out[_pk("tiled_vae_model_resident")] = (
            f"OOM with transformer resident: {type(e).__name__}")
        params = None
        gc.collect()
        jax.clear_caches()   # drop the step/step8 executables+workspace
        try:
            _ = np.asarray(tiled(vparams, z)[0, 0, 0, :1])
            t0 = time.perf_counter()
            _ = np.asarray(tiled(vparams, z)[0, 0, 0, :1])
            t_vae = time.perf_counter() - t0
        except Exception as e2:  # noqa: BLE001
            out[_pk("tiled_vae_error")] = f"{type(e2).__name__}"
            t_vae = -1.0

    from domainrag_tpu.eval import flops as flops_mod
    fl = flops_mod.flux_forward_flops(cfg, grid * grid, s_txt).total
    out.update({
        _pk("step_seconds"): round(t_step, 4),
        _pk("step_tflops"): round(fl / 1e12, 1),
        _pk("mfu_vs_bf16_peak"): round(
            flops_mod.mfu(fl, t_step, flops_mod.PEAK_TFLOPS["tpu-v5e"]), 4),
        _pk("tiled_vae_seconds"): round(t_vae, 4),
    })
    t8 = out.get(_pk("w8a8_step_seconds"))
    if isinstance(t8, float):
        out[f"{pxkey}_w8a8_mfu_vs_bf16_peak"] = round(
            flops_mod.mfu(fl, t8, flops_mod.PEAK_TFLOPS["tpu-v5e"]), 4)
    return out


if __name__ == "__main__":
    main()
