"""Image-space quality gate for the fast serving modes (VERDICT r3 #1).

The round-3 quality ladders scored W8A8 and the caches by final-LATENT
rel-L2/cosine only; the north star is "FID-matched generated images"
(BASELINE.json; reference quality claim /root/reference/README.md:20).
Real-weight FID is environment-blocked (zero egress), but the judge's
prescribed proxy IS measurable on this chip: decode the exact and the
fast-mode outputs to IMAGES through the VAE, push both sets through
eval/fid.py's Frechet machinery on the repo's own CLIP image tower, and
report CLIP-FID plus per-image paired feature distances.

Everything is proxy-scale (random-init weights), so the numbers are not
claims about FLUX.1-dev aesthetics — they measure how far each
throughput dial moves the DECODED IMAGE as seen by a CLIP-architecture
feature extractor, on the same model the latent ladders used.  The
extractor is a fixed random nonlinear feature map; paired distances and
Frechet distances in its feature space upper-bound nothing but rank the
modes in an image-derived space, which is exactly the evidence the
latent-only ladders were missing.

Modes (VERDICT r3 #1 names them): W8A8, velocity cache (2, 3, sched),
block cache (2, 3), plus the two headline combos (w8a8+vcache).

Run on the real chip:   python tools/clip_fid_quality.py [depth_d depth_s]
(defaults 4 8; 3 seeds x 2 resolutions x 8 prompts+latents per cell).
CPU smoke: BENCH_PLATFORM=cpu CF_GRIDS=8 CF_STEPS=4 CF_SEEDS=0 with
depths 1 1.
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
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from domainrag_tpu.eval import fid as fid_mod
    from domainrag_tpu.models import clip as clip_mod
    from domainrag_tpu.models import common as _common
    from domainrag_tpu.models import quant
    from domainrag_tpu.models.flux import model as flux
    from domainrag_tpu.models.flux import pipeline as fp
    from domainrag_tpu.models.flux import scheduler as sched
    from domainrag_tpu.models.flux import vae as vae_mod

    nd = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    ns = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(os.environ.get("CF_STEPS", "28"))
    seeds = [int(s) for s in os.environ.get("CF_SEEDS", "0,1,2").split(",")]
    grids = [int(g) for g in os.environ.get("CF_GRIDS", "64,32").split(",")]
    batch = int(os.environ.get("CF_BATCH", "8"))

    # --- proxy transformer (same construction as tools/w8a8_quality.py:
    # host-side synth + quantize BEFORE device transfer) ---------------
    import ml_dtypes
    cfg = dataclasses.replace(flux.FLUX_DEV, depth_double=nd,
                              depth_single=ns)
    shapes = jax.eval_shape(lambda k: flux.init(k, cfg),
                            jax.random.PRNGKey(0))
    host_rng = np.random.default_rng(0)
    host = jax.tree_util.tree_map(
        lambda l: host_rng.standard_normal(l.shape).astype(np.float32)
        * 0.02, shapes)
    # HBM discipline (first chip run RESOURCE_EXHAUSTED with both trees
    # resident): keep host copies, device_put per section, free between
    host_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(ml_dtypes.bfloat16), host)
    host_q = quant.quantize_tree(host)
    del host
    params_bf16 = jax.device_put(host_bf16)
    params_q = None                       # materialized for modes_b

    # --- decoder + extractor: 16-ch VAE (matches in_channels 64 = 16x4)
    # and the repo's CLIP ViT-B/32 image tower, both random-init -------
    vae_cfg = vae_mod.VaeConfig(block_out=(32, 64, 96, 128),
                                layers_per_block=1, norm_groups=16)
    vae_params = vae_mod.init(jax.random.PRNGKey(1), vae_cfg)
    clip_cfg = (clip_mod.TINY_VISION
                if os.environ.get("BENCH_PLATFORM") == "cpu"
                else clip_mod.ClipVisionConfig())
    clip_params = clip_mod.init_vision(jax.random.PRNGKey(2), clip_cfg)

    s_txt = 512 if os.environ.get("BENCH_PLATFORM") != "cpu" else 32
    # 8 DIFFERENT prompts per batch: per-sample random prompt embeds
    prompt_rng = np.random.default_rng(7)
    txt = jnp.asarray(prompt_rng.standard_normal(
        (batch, s_txt, cfg.text_dim)), jnp.bfloat16)
    pooled = jnp.asarray(prompt_rng.standard_normal(
        (batch, cfg.pooled_dim)), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("grid",))
    def _decode_and_extract(vae_params, clip_params, tokens, grid):
        """final latents (B, S, C) -> CLIP features (B, D): VAE decode,
        resize to the CLIP input, extract. One fused graph per grid.
        Params are ARGUMENTS (closure constants blow the axon tunnel's
        compile-payload limit: HTTP 413 on remote_compile); the batch
        lax.maps per image (a batch-8 1024 px decode's activations next
        to the resident param tree RESOURCE_EXHAUSTED the chip)."""
        def one(tok):
            lat = flux.unpack_latents(tok[None].astype(jnp.float32),
                                      grid, grid)
            img = vae_mod.decode(vae_params, lat, vae_cfg)  # [-1, 1]
            img = jnp.clip(img, -1.0, 1.0)
            img = jax.image.resize(
                img, (1, clip_cfg.image_size, clip_cfg.image_size, 3),
                "linear")
            return clip_mod.apply_vision(
                clip_params, img.astype(jnp.float32), clip_cfg)[0]

        return jax.lax.map(one, tokens)

    def decode_and_extract(tokens, grid):
        return _decode_and_extract(vae_params, clip_params, tokens,
                                   grid=grid)

    @functools.lru_cache(maxsize=None)
    def grid_setup(grid):
        seq = grid * grid
        schedule = sched.make_schedule(steps, image_seq_len=seq)
        return jnp.asarray(schedule.sigmas), np.asarray(schedule.sigmas)

    def run_mode(params, grid, seed, *, vc=1, bc=1):
        sig, _ = grid_setup(grid)
        r = np.random.default_rng(seed)
        lat = jnp.asarray(r.standard_normal(
            (batch, grid * grid, cfg.in_channels)), jnp.bfloat16)
        out = fp._denoise_latents(params, lat, txt, pooled, sig,
                                  jnp.float32(2.5), cfg=cfg, grid_h=grid,
                                  grid_w=grid, cache_interval=bc,
                                  vcache_interval=vc)
        feats = decode_and_extract(out, grid=grid)
        return np.asarray(out, np.float32), np.asarray(feats, np.float64)

    # sched anchors: the pipeline's own image-space selection (round-5
    # rework of VERDICT r4 weak #1 — latent-DP optimum vs uniform-3,
    # each scored by a real cached denoise decoded through the VAE;
    # fp.select_vcache_anchors is exactly what sched:K now ships).
    # Computed EAGERLY while the bf16 tree is resident — sections below
    # swap param trees to keep one copy in HBM at a time.
    def _sched_anchors(grid):
        sig, sig_np = grid_setup(grid)
        r = np.random.default_rng(0)
        lat = jnp.asarray(r.standard_normal(
            (1, grid * grid, cfg.in_channels)), jnp.bfloat16)
        exact, vs = fp._record_velocities(
            params_bf16, lat, txt[:1], pooled[:1], sig, jnp.float32(2.5),
            cfg=cfg, grid_h=grid, grid_w=grid)
        return fp.select_vcache_anchors(
            np.asarray(vs, np.float32), sig_np, -(-steps // 3), 3,
            lambda anchors: fp._denoise_latents(
                params_bf16, lat, txt[:1], pooled[:1], sig,
                jnp.float32(2.5), cfg=cfg, grid_h=grid, grid_w=grid,
                vcache_interval=anchors),
            lambda tokens: np.asarray(fp._decode_tokens(
                vae_params, tokens, grid, grid, vae_cfg), np.float32),
            exact, log_tag=f"quality-tool grid={grid} ")

    anchors = {g: _sched_anchors(g) for g in grids}
    print(f"# sched anchors: {anchors}", flush=True)

    # section order groups the param tree AND the int8-activation flag
    # outermost (set_int8_activations clears every compiled cache)
    sections = [
        ("bf16", False, [("exact", {}), ("vcache2", {"vc": 2}),
                         ("vcache3", {"vc": 3}),
                         ("vcache-sched3", {"vc": "sched"}),
                         ("bcache2", {"bc": 2}), ("bcache3", {"bc": 3})]),
        ("int8w", False, [("int8w", {})]),
        ("w8a8", True, [("w8a8", {}), ("w8a8+vcache2", {"vc": 2}),
                        ("w8a8+vcache3", {"vc": 3}),
                        ("w8a8+vcache-sched3", {"vc": "sched"})]),
    ]
    # CF_MODES: comma-separated mode-name filter (e.g. the round-5
    # sched:K re-measurement needs only exact,vcache3,vcache-sched3 —
    # "exact" always stays in, it anchors every comparison)
    want = os.environ.get("CF_MODES")
    if want:
        keep = {m.strip() for m in want.split(",")} | {"exact"}
        sections = [(t, a, [mk for mk in modes if mk[0] in keep])
                    for t, a, modes in sections]
        sections = [s for s in sections if s[2]]

    latents_by, feats_by = {}, {}
    params = params_bf16
    del params_bf16
    cur_tree = "bf16"
    for tree, acts, modes in sections:
        want = "bf16" if tree == "bf16" else "q"
        if want != cur_tree:
            del params                     # free bf16 before int8 lands
            params = jax.device_put(host_q)
            cur_tree = want
        _common.set_int8_activations(acts)
        try:
            for mode, kw in modes:
                for grid in grids:
                    kw2 = dict(kw)
                    if kw2.get("vc") == "sched":
                        kw2["vc"] = anchors[grid]
                    for seed in seeds:
                        lat, feats = run_mode(params, grid, seed, **kw2)
                        latents_by[(mode, grid, seed)] = lat
                        feats_by[(mode, grid, seed)] = feats
                    print(f"# ran {mode} grid={grid}", flush=True)
        finally:
            _common.set_int8_activations(False)

    # --- metrics: CLIP-FID over the pooled set (seeds x batch images per
    # cell) + PAIRED per-image feature distance (robust at small N, the
    # primary number) + the latent rel-L2 cross-check vs round-3 ladders
    all_modes = [m for _, _, ms in sections for m, _ in ms
                 if m != "exact"]
    for grid in grids:
        px = grid * 16
        ref_feats = np.concatenate([feats_by[("exact", grid, s)]
                                    for s in seeds])
        ref_lat = np.concatenate([latents_by[("exact", grid, s)]
                                  for s in seeds])
        ref_norm = np.linalg.norm(ref_feats, axis=1)
        for mode in all_modes:
            got_feats = np.concatenate([feats_by[(mode, grid, s)]
                                        for s in seeds])
            got_lat = np.concatenate([latents_by[(mode, grid, s)]
                                      for s in seeds])
            cfid = fid_mod.fid_from_features(ref_feats, got_feats)
            # paired: same (seed, prompt, latent) -> same image slot
            d = np.linalg.norm(got_feats - ref_feats, axis=1)
            rel = d / (ref_norm + 1e-12)
            cos = np.sum(got_feats * ref_feats, axis=1) / (
                np.linalg.norm(got_feats, axis=1) * ref_norm + 1e-12)
            lat_rel = float(np.linalg.norm(got_lat - ref_lat)
                            / (np.linalg.norm(ref_lat) + 1e-12))
            print(json.dumps({
                "mode": mode, "px": px, "n_images": int(len(d)),
                "clip_fid_vs_exact": round(float(cfid), 4),
                "feat_rel_l2_mean": round(float(rel.mean()), 5),
                "feat_rel_l2_max": round(float(rel.max()), 5),
                "feat_cos_mean": round(float(cos.mean()), 6),
                "feat_cos_min": round(float(cos.min()), 6),
                "latent_rel_l2": round(lat_rel, 5)}), flush=True)
        # scale anchor: CLIP-FID between two DISJOINT exact half-sets —
        # the small-N estimator floor every mode number sits on top of
        half = len(ref_feats) // 2
        floor = fid_mod.fid_from_features(ref_feats[:half],
                                          ref_feats[half:])
        print(json.dumps({"mode": "exact-split-floor", "px": px,
                          "clip_fid_vs_exact": round(float(floor), 4)}),
              flush=True)


if __name__ == "__main__":
    main()
