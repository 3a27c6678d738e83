"""Flux pipelines: text/Redux-conditioned generation (B5+B7) and Fill (B6).

First-party equivalents of the diffusers pipelines the reference drives:
- background generation: ``FluxPriorReduxPipeline`` + ``FluxPipeline``
  (batch_generate_flux_kshot.py:139-151,459-474 — dual-image Redux prior,
  guidance 2.5, 50 steps, 1024x1024, fixed seed);
- composition: ``FluxPriorReduxPipeline`` + ``FluxFillPipeline``
  (outpainting_updown_sampling_redux.py:525-541,1237-1257 — keep-mask,
  guidance 30-40, strength partial denoise).

Everything on-device is one jit-compiled graph per (resolution, steps)
bucket: prompt encode, prior fusion, ``lax.fori_loop`` denoise, VAE decode.
Host work is limited to PIL preprocessing and PRNG seeding.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from ...core import text as text_util
from ...ops import attention as attn_mod
from .. import clip as clip_mod
from .. import redux as redux_mod
from .. import siglip as siglip_mod
from .. import t5 as t5_mod
from . import model as flux_mod
from . import scheduler as sched_mod
from . import vae as vae_mod


@dataclasses.dataclass
class FluxBundle:
    """All weights + configs for one Flux deployment (dev or fill)."""

    flux_params: dict
    flux_cfg: flux_mod.FluxConfig
    vae_params: dict
    vae_cfg: vae_mod.VaeConfig
    t5_params: dict
    t5_cfg: t5_mod.T5Config
    clip_text_params: dict
    clip_text_cfg: clip_mod.ClipTextConfig
    siglip_params: Optional[dict] = None
    siglip_cfg: Optional[siglip_mod.SiglipVisionConfig] = None
    redux_params: Optional[dict] = None
    redux_cfg: Optional[redux_mod.ReduxEncoderConfig] = None
    clip_tokenizer: text_util.TokenizerLike = None
    t5_tokenizer: text_util.TokenizerLike = None
    t5_max_len: int = 512
    clip_max_len: int = 77
    compute_dtype: jnp.dtype = jnp.bfloat16
    # set by parallel.deploy.shard_bundle: attention runs head-sharded
    # over this mesh's model axis (ops.attention.tp_attention)
    tp_mesh: Optional[object] = None
    tp_axis: str = "model"
    # per-prompt (t5_embeds (1,S,D), clip_pooled (1,P)) cache filled by
    # :func:`precompute_prompts`. Lets t5/clip-text params be RELEASED
    # (:func:`release_text_encoders`) once every prompt a run will use
    # is cached — on a 16 GB chip T5-XXL (9.5 GB bf16) and the int8 12B
    # transformer (11.9 GB) cannot be co-resident, so single-chip serving
    # encodes prompts first and frees the tower (the reference never
    # faces this: 40 GB A100s hold both, batch_generate_flux_kshot.py
    # :117-153).
    prompt_cache: Optional[dict] = None

    @property
    def latent_factor(self) -> int:
        # token grid cell covers vae_factor * 2 pixels (2x2 latent packing)
        return self.vae_cfg.spatial_factor * 2


def tiny_bundle(key=None, fill: bool = False) -> FluxBundle:
    """Random tiny bundle for tests / CPU drives. Structure-identical to
    the 12B deployment, toy sizes."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    vae_cfg = vae_mod.TINY_VAE          # factor 2 -> latent_factor 4
    base = flux_mod.TINY_FLUX
    lat_packed = vae_cfg.latent_channels * 4
    # fill conditioning: latents + masked-image latents + f^2*4 mask chans
    fill_in = lat_packed * 2 + vae_cfg.spatial_factor ** 2 * 4
    flux_cfg = dataclasses.replace(
        base,
        in_channels=fill_in if fill else lat_packed,
        out_channels=lat_packed)
    t5_cfg = t5_mod.TINY_T5
    # tie dims: flux.text_dim must equal t5.d_model; pooled_dim = clip hidden
    flux_cfg = dataclasses.replace(flux_cfg, text_dim=t5_cfg.d_model,
                                   pooled_dim=64)
    clip_cfg = dataclasses.replace(clip_mod.TINY_TEXT, hidden=64)
    siglip_cfg = siglip_mod.TINY_SIGLIP
    redux_cfg = redux_mod.ReduxEncoderConfig(
        siglip_hidden=siglip_cfg.hidden, txt_dim=t5_cfg.d_model)
    return FluxBundle(
        flux_params=flux_mod.init(ks[0], flux_cfg), flux_cfg=flux_cfg,
        vae_params=vae_mod.init(ks[1], vae_cfg), vae_cfg=vae_cfg,
        t5_params=t5_mod.init(ks[2], t5_cfg), t5_cfg=t5_cfg,
        clip_text_params=clip_mod.init_text(ks[3], clip_cfg),
        clip_text_cfg=clip_cfg,
        siglip_params=siglip_mod.init(ks[4], siglip_cfg),
        siglip_cfg=siglip_cfg,
        redux_params=redux_mod.init(ks[5], redux_cfg), redux_cfg=redux_cfg,
        clip_tokenizer=text_util.StubTokenizer(vocab_size=clip_cfg.vocab_size,
                                               bos_id=98, eos_id=99),
        t5_tokenizer=text_util.StubTokenizer(vocab_size=t5_cfg.vocab_size,
                                             bos_id=None, eos_id=1),
        t5_max_len=16, clip_max_len=16,
        compute_dtype=jnp.float32)


# ---------------------------------------------------------------------------
# prompt + prior encoding
# ---------------------------------------------------------------------------

def encode_prompt(bundle: FluxBundle, prompts: Sequence[str]
                  ) -> Tuple[jax.Array, jax.Array]:
    """(T5 embeds (N, S, D_t5), CLIP pooled (N, D_clip)) per prompt.

    Consults ``bundle.prompt_cache`` first: when every prompt is cached
    the text towers never run (and may have been released —
    :func:`release_text_encoders`)."""
    cache = bundle.prompt_cache
    if cache is not None and all(p in cache for p in prompts):
        return (jnp.concatenate([cache[p][0] for p in prompts]),
                jnp.concatenate([cache[p][1] for p in prompts]))
    if bundle.t5_params is None:
        missing = [p for p in prompts
                   if cache is None or p not in cache]
        raise ValueError(
            f"text encoders released but prompts not in the cache: "
            f"{missing!r} — precompute_prompts() them first")
    t5_ids = text_util.batch_tokenize(bundle.t5_tokenizer, prompts,
                                      bundle.t5_max_len)
    clip_ids = text_util.batch_tokenize(bundle.clip_tokenizer, prompts,
                                        bundle.clip_max_len)
    t5_out = t5_mod.apply(bundle.t5_params, jnp.asarray(t5_ids),
                          bundle.t5_cfg)
    _, pooled = clip_mod.apply_text(bundle.clip_text_params,
                                    jnp.asarray(clip_ids),
                                    bundle.clip_text_cfg)
    return t5_out, pooled


def precompute_prompts(bundle: FluxBundle,
                       prompts: Sequence[str]) -> None:
    """Fill ``bundle.prompt_cache`` for ``prompts`` (each encoded once).
    After this, :func:`release_text_encoders` can drop the T5/CLIP-text
    params and every downstream prior/denoise call that sticks to these
    prompts works unchanged — the single-chip staged-residency pattern
    (BENCH_NOTES "Full-pipeline benchmark")."""
    if bundle.prompt_cache is None:
        bundle.prompt_cache = {}
    for p in prompts:
        if p not in bundle.prompt_cache:
            t5_e, pooled = encode_prompt(bundle, [p])
            bundle.prompt_cache[p] = (jax.block_until_ready(t5_e),
                                      jax.block_until_ready(pooled))


def release_text_encoders(bundle: FluxBundle) -> None:
    """Drop the T5 + CLIP-text params (device buffers free once no other
    reference holds them). Prompt encoding afterwards requires a
    :func:`precompute_prompts` cache hit."""
    bundle.t5_params = None
    bundle.clip_text_params = None


def redux_prior_pairs(bundle: FluxBundle, images: np.ndarray,
                      prompt: str,
                      prompt_embeds_scale: Sequence[float],
                      pooled_prompt_embeds_scale: Sequence[float]
                      ) -> Tuple[jax.Array, jax.Array]:
    """Batched dual-image priors for DP generation: images (N, K, S, S, 3)
    siglip-preprocessed, one shared prompt, scales (K,). The text encoders
    run ONCE and broadcast (the reference re-encoded the same empty prompt
    per rank). Each group's K per-image sequences are weighted-summed per
    the diffusers multi-image semantics; returns
    ((N, S_txt + S_img, D), (N, P))."""
    assert bundle.siglip_params is not None, "bundle lacks Redux weights"
    n, k = images.shape[:2]
    txt1, pooled1 = encode_prompt(bundle, [prompt])
    txt = jnp.broadcast_to(txt1[:, None], (n, k) + txt1.shape[1:])
    pooled = jnp.broadcast_to(pooled1[:, None], (n, k) + pooled1.shape[1:])
    flat = jnp.asarray(images).reshape((n * k,) + images.shape[2:])
    sig = siglip_mod.apply(bundle.siglip_params, flat, bundle.siglip_cfg)
    img_embeds = redux_mod.apply(bundle.redux_params, sig)
    img_embeds = img_embeds.reshape((n, k) + img_embeds.shape[1:])
    return redux_mod.combine_prior_pairs(txt, pooled, img_embeds,
                                         prompt_embeds_scale,
                                         pooled_prompt_embeds_scale)


def redux_prior_pairs_indexed(bundle: FluxBundle,
                              unique_images: np.ndarray,
                              pair_idx: np.ndarray,
                              prompt: str,
                              prompt_embeds_scale: Sequence[float],
                              pooled_prompt_embeds_scale: Sequence[float]
                              ) -> Tuple[jax.Array, jax.Array]:
    """:func:`redux_prior_pairs` with image DEDUPLICATION: the SigLIP
    tower runs once per UNIQUE image and the per-pair embeddings are
    gathered by index.

    The workload shares one target image across a sample's <=5 retrieval
    ranks (batch_generate_flux_kshot.py:996-1005 runs the prior per rank
    pair, re-encoding the target every time — 2K tower forwards where
    K+1 suffice). ``unique_images``: (U, S, S, 3) siglip-preprocessed;
    ``pair_idx``: (N, K) int indices into the unique batch. Returns
    ((N, S_txt + S_img, D), (N, P))."""
    assert bundle.siglip_params is not None, "bundle lacks Redux weights"
    pair_idx = np.asarray(pair_idx)
    n, k = pair_idx.shape
    txt1, pooled1 = encode_prompt(bundle, [prompt])
    txt = jnp.broadcast_to(txt1[:, None], (n, k) + txt1.shape[1:])
    pooled = jnp.broadcast_to(pooled1[:, None], (n, k) + pooled1.shape[1:])
    sig = siglip_mod.apply(bundle.siglip_params, jnp.asarray(unique_images),
                           bundle.siglip_cfg)
    img_unique = redux_mod.apply(bundle.redux_params, sig)   # (U, S_i, D)
    img_embeds = jnp.take(img_unique, jnp.asarray(pair_idx), axis=0)
    return redux_mod.combine_prior_pairs(txt, pooled, img_embeds,
                                         prompt_embeds_scale,
                                         pooled_prompt_embeds_scale)


def redux_prior(bundle: FluxBundle, images: np.ndarray,
                prompts: Sequence[str],
                prompt_embeds_scale: Sequence[float],
                pooled_prompt_embeds_scale: Sequence[float]
                ) -> Tuple[jax.Array, jax.Array]:
    """images: (N, S, S, 3) siglip-preprocessed. Returns fused
    (1, S_txt + N*0 ... see combine, D) embeds + (1, P) pooled."""
    assert bundle.siglip_params is not None, "bundle lacks Redux weights"
    txt, pooled = encode_prompt(bundle, prompts)
    sig = siglip_mod.apply(bundle.siglip_params, jnp.asarray(images),
                           bundle.siglip_cfg)
    img_embeds = redux_mod.apply(bundle.redux_params, sig)
    return redux_mod.combine_prior(txt, pooled, img_embeds,
                                   prompt_embeds_scale,
                                   pooled_prompt_embeds_scale)


# ---------------------------------------------------------------------------
# generation (text/Redux -> image)
# ---------------------------------------------------------------------------

def _tp_context(bundle: FluxBundle):
    if bundle.tp_mesh is None:
        return contextlib.nullcontext()
    # TP-sharded params: head-sharded attention AND no Pallas W8A8 GEMM
    # (pallas_call has no GSPMD partitioning rule; the XLA W8A8
    # formulation partitions transparently and stays bit-identical)
    from ...ops import int8_gemm
    stack = contextlib.ExitStack()
    stack.enter_context(attn_mod.tp_attention(bundle.tp_mesh,
                                              bundle.tp_axis))
    stack.enter_context(int8_gemm.disable_pallas_w8a8())
    return stack


def _tp_tag(bundle: FluxBundle) -> str:
    if bundle.tp_mesh is None:
        return "none"
    return f"{bundle.tp_axis}:{bundle.tp_mesh.shape[bundle.tp_axis]}"


def _dp_wrap(core_fn, mesh, data_axis: str, n_sharded: int, n_rep: int,
             **static_kwargs):
    """Run a denoise core under shard_map over the data axis.

    The cores are batch-independent (every op is per-sample), so
    sharding the leading dim via shard_map is semantically identical to
    GSPMD propagation — but it guarantees each device traces the core at
    its LOCAL batch shape, which is what the Pallas kernels (flash /
    fused MMDiT attention, int8-MXU GEMM) require: pallas_call has no
    GSPMD partitioning rule, so under plain jit a multi-chip mesh would
    gather the batch onto every device (or fail to partition) instead of
    running data-parallel.

    Args layout: (flux_params, vae_params, *sharded x n_sharded,
    *replicated x n_rep). Returns a callable with the same signature."""
    from jax.sharding import PartitionSpec as P
    in_specs = ((P(), P()) + (P(data_axis),) * n_sharded
                + (P(),) * n_rep)

    def local(fp, vp, *args):
        return core_fn(fp, vp, *args, **static_kwargs)

    return jax.shard_map(local, mesh=mesh, in_specs=in_specs,
                         out_specs=P(data_axis), check_vma=False)


# --- shared pieces of the four jitted cores (dense/PP x generate/fill):
# one definition of the velocity model call, the euler loop, and the
# token decode so the PP path cannot drift from the unsharded one ---

def _euler_denoise(model_fn, latents, sigmas):
    def body(i, x):
        sigma = sigmas[i]
        return sched_mod.euler_step(x, model_fn(x, sigma), sigma,
                                    sigmas[i + 1])

    return jax.lax.fori_loop(0, sigmas.shape[0] - 1, body, latents)


def _vcache_denoise(model_fn, latents, sigmas, interval: int,
                    order: int = 1, anchors=None):
    """Velocity-extrapolation cached Euler denoise (training-free
    rectified-flow acceleration, VDE family — PAPERS.md,
    arXiv:2605.23381): the network runs only on every ``interval``-th
    step; the skipped steps reuse a velocity EXTRAPOLATED from the last
    two computed velocities (``order=1``: linear in sigma; ``order=0``:
    hold). The rectified-flow velocity field is smooth in sigma, which
    is what makes the extrapolation cheap to trust (quality curves in
    BENCH_NOTES.md).

    Versus the block-residual cache (``apply_with_cache``): cached steps
    skip the WHOLE network (embedders included) so the speedup is a full
    ``interval``x on the denoise, the state is two latent-sized f32
    buffers instead of ~1.6 GB of per-block residuals, and — because it
    wraps ``model_fn`` — it composes with every serving mode (DP/TP/SP
    and the PP pipelined model the residual cache cannot run under).

    The first group has no second sample point and falls back to
    order-0 hold automatically (zero slope via the s_prev == s0 guard).

    ``anchors`` (static tuple of step indices, must start at 0) places
    the computed steps NON-uniformly — same model-call count as a
    uniform schedule with the same anchor count, but the anchors can
    cluster where the velocity trajectory bends most
    (:func:`plan_vcache_anchors`). The model call stays inside one
    ``fori_loop`` body regardless (one copy of the 57-block graph);
    variable group lengths are handled by unrolling to the longest
    group and masking the tail, exactly like the uniform path's
    non-dividing tail.
    """
    n = int(sigmas.shape[0]) - 1
    if anchors is None:
        anchors = tuple(range(0, n, int(interval)))
    else:
        anchors = tuple(sorted({int(a) for a in anchors}))
        if not anchors or anchors[0] != 0 or anchors[-1] >= n:
            raise ValueError(
                f"velocity-cache anchors must start at step 0 and stay "
                f"below the last step index {n}: got {anchors}")
    groups = len(anchors)
    bounds = anchors + (n,)
    max_len = max(b - a for a, b in zip(bounds, bounds[1:]))
    starts = jnp.asarray(bounds, jnp.int32)

    def group(g, carry):
        x, v_prev, s_prev = carry
        i0 = starts[g]
        i_end = starts[g + 1]
        s0 = sigmas[i0]
        v0 = model_fn(x, s0).astype(jnp.float32)
        if order >= 1:
            d = s0 - s_prev
            slope = (v0 - v_prev) * jnp.where(
                d == 0.0, 0.0, 1.0 / jnp.where(d == 0.0, 1.0, d))
        else:
            slope = None
        for j in range(max_len):            # static unroll, elementwise
            i = i0 + j
            s_i = sigmas[jnp.minimum(i, n - 1)]
            s_next = sigmas[jnp.minimum(i + 1, n)]
            v = v0 if slope is None else v0 + (s_i - s0) * slope
            stepped = sched_mod.euler_step(x, v, s_i, s_next)
            x = stepped if j == 0 else jnp.where(i < i_end, stepped, x)
        return x, v0, s0

    out, _, _ = jax.lax.fori_loop(
        0, groups, group,
        (latents, jnp.zeros(latents.shape, jnp.float32),
         sigmas[0].astype(jnp.float32)))
    return out


def _pick_denoise(model_fn, latents, sigmas, vcache_interval,
                  vcache_order: int):
    """``vcache_interval``: 1 = dense Euler; int N > 1 = uniform
    velocity cache; tuple = explicit (possibly non-uniform) anchor
    schedule. Tuples are hashable, so the value rides the cores'
    ``vcache_interval`` static arg unchanged."""
    if isinstance(vcache_interval, tuple):
        return _vcache_denoise(model_fn, latents, sigmas, interval=0,
                               order=vcache_order,
                               anchors=vcache_interval)
    if vcache_interval <= 1:
        return _euler_denoise(model_fn, latents, sigmas)
    return _vcache_denoise(model_fn, latents, sigmas,
                           interval=vcache_interval, order=vcache_order)


def _vc_active(vcache_interval) -> bool:
    """True when the velocity cache is on, for int / tuple / 'auto' /
    'sched:K' forms alike (pre- or post-resolution)."""
    if isinstance(vcache_interval, tuple):
        return len(vcache_interval) > 0
    if isinstance(vcache_interval, str):
        return True                     # "auto" / "sched:K" may resolve >1
    return vcache_interval > 1


def _dense_model_fn(flux_params, prompt_embeds, pooled, guidance,
                    img_ids, txt_ids, cfg):
    def model_fn(x, sigma):
        b = x.shape[0]
        return flux_mod.apply(
            flux_params, x, prompt_embeds, pooled,
            jnp.full((b,), sigma, jnp.float32), img_ids, txt_ids, cfg,
            guidance=jnp.full((b,), guidance, jnp.float32))

    return model_fn


def _pp_model_fn(flux_params, stages, prompt_embeds, pooled, guidance,
                 img_ids, txt_ids, cfg, mesh, axis, microbatches):
    from ...parallel import pipeline_parallel as pp

    def model_fn(x, sigma):
        b = x.shape[0]
        return pp.pipelined_apply(
            flux_params, stages, x, prompt_embeds, pooled,
            jnp.full((b,), sigma, jnp.float32), img_ids, txt_ids, cfg,
            mesh=mesh, axis=axis,
            guidance=jnp.full((b,), guidance, jnp.float32),
            microbatches=microbatches)

    return model_fn


def _decode_tokens(vae_params, tokens, grid_h, grid_w, vae_cfg,
                   tiled_vae: bool = False, vae_tile: int = 96,
                   vae_overlap: int = 16):
    lat = flux_mod.unpack_latents(tokens.astype(jnp.float32),
                                  grid_h, grid_w)
    if tiled_vae:
        return vae_mod.decode_tiled(vae_params, lat, vae_cfg,
                                    tile=vae_tile, overlap=vae_overlap)
    return vae_mod.decode(vae_params, lat, vae_cfg)


def _fill_conditioning(vae_params, image, mask, noise, sigmas, vae_cfg,
                       tiled_vae: bool, vae_tile: int, vae_overlap: int):
    """Fill conditioning shared by the dense and PP fill cores:
    -> (initial latents at sigma_0, 320-ch cond tokens)."""
    if tiled_vae:
        def enc(x):
            return vae_mod.encode_tiled(vae_params, x, vae_cfg,
                                        tile=vae_tile, overlap=vae_overlap)
    else:
        def enc(x):
            return vae_mod.encode(vae_params, x, vae_cfg)
    masked = image * (1.0 - mask[..., None])
    masked_tokens = flux_mod.pack_latents(enc(masked))
    mask_tokens = pack_mask(mask, vae_cfg.spatial_factor)
    image_tokens = flux_mod.pack_latents(enc(image))
    # scale_noise's f32 sigma silently promoted the latents — and with
    # flux.apply inheriting its INPUT dtype, the entire fill transformer
    # then ran in f32 with the unfused reference attention (found by the
    # round-5 full 2800 px fill run, where the f32 unfused flash kernel
    # VMEM-OOMs at 31k tokens; at 1024 px it just silently cost ~2x).
    # The denoise stream must stay in the compute dtype; the scheduler
    # still does its f32 state updates internally (euler_step).
    latents = sched_mod.scale_noise(image_tokens, noise, sigmas[0]) \
        .astype(noise.dtype)
    cond = jnp.concatenate(
        [masked_tokens, mask_tokens], axis=-1).astype(latents.dtype)
    return latents, cond


def _pipeline_stages(bundle: "FluxBundle", n_stages: int, mesh=None,
                     axis: str = "pipe"):
    """Prepare (and cache on the bundle) depth-sharded PP stages.

    Cache entries hold weakrefs to EVERY leaf array of the params they
    were built from (dicts are not weakref-able; jax arrays are):
    swapping ``bundle.flux_params`` — e.g. quantizing after a first serve
    — invalidates the entry. A single-leaf or ``id()`` anchor is not
    enough: ``quantize_tree`` reuses bias arrays verbatim, so the first
    flattened leaf can be the SAME object across the swap (measured —
    this served stale unquantized stages)."""
    import weakref
    from ...parallel import pipeline_parallel as pp
    cache = getattr(bundle, "_pp_stages", None)
    if cache is None:
        cache = {}
        bundle._pp_stages = cache
    leaves = jax.tree_util.tree_leaves(bundle.flux_params)
    entry = cache.get(n_stages)
    if entry is not None and len(entry[0]) == len(leaves) and \
            all(r() is l for r, l in zip(entry[0], leaves)):
        return entry[1]
    cache.clear()              # old params' stacks would pin device mem
    stages = pp.prepare_stages(bundle.flux_params, n_stages, mesh=mesh,
                               axis=axis)
    cache[n_stages] = ([weakref.ref(l) for l in leaves], stages)
    return stages


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "vae_cfg", "grid_h", "grid_w", "axis",
                     "microbatches", "mesh", "d", "g", "n_stages",
                     "vcache_interval", "vcache_order"))
def _generate_core_pp(flux_params, doubles, singles, vae_params, latents,
                      prompt_embeds, pooled, sigmas, guidance,
                      cfg: flux_mod.FluxConfig, vae_cfg: vae_mod.VaeConfig,
                      grid_h: int, grid_w: int, axis: str,
                      microbatches: int, mesh=None, d: int = 1,
                      g: int = 1, n_stages: int = 1,
                      vcache_interval: int = 1, vcache_order: int = 1):
    """Denoise with the 57 blocks pipelined over ``mesh[axis]``
    (parallel/pipeline_parallel.py). ``mesh`` is hashable and keys the
    jit cache directly; the stacked stage params travel as pytrees."""
    from ...parallel import pipeline_parallel as pp
    stages = pp.PipelineStages(doubles=doubles, singles=singles,
                               per_stage_double=d, per_stage_single=g,
                               n_stages=n_stages)
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    model_fn = _pp_model_fn(flux_params, stages, prompt_embeds, pooled,
                            guidance, img_ids, txt_ids, cfg, mesh, axis,
                            microbatches)
    out_tokens = _pick_denoise(model_fn, latents, sigmas,
                               vcache_interval, vcache_order)
    return _decode_tokens(vae_params, out_tokens, grid_h, grid_w, vae_cfg)


def _check_block_cache_hbm(bundle, batch: int, s_img: int, s_txt: int,
                           mesh, data_axis: str) -> None:
    """Block caching holds one bf16 residual per block per sample
    (~1.6 GB/sample for the 12B at 1024 px).  The serving batch multiplies
    that, and the reference workload batches up to 5 retrieval ranks into
    one denoise — on a 16 GB v5e with ~12 GB of int8 weights that OOMs
    (ADVICE r2).  Estimate per-device HBM at config time and warn loudly
    before the compile fails opaquely."""
    from ...core.log import get_logger
    cfg = bundle.flux_cfg
    per_dev_batch = batch
    if mesh is not None and mesh.shape.get(data_axis, 1) > 1:
        d = mesh.shape[data_axis]
        per_dev_batch = -(-batch // d)
    cache_bytes = ((cfg.depth_double + cfg.depth_single) * per_dev_batch
                   * (s_img + s_txt) * cfg.hidden * 2)
    param_bytes = sum(
        x.size * x.dtype.itemsize for x in
        jax.tree_util.tree_leaves(bundle.flux_params)
        if hasattr(x, "dtype"))
    if mesh is not None and bundle.tp_mesh is not None:
        param_bytes //= max(1, mesh.shape.get(bundle.tp_axis, 1))
    budget = 15.0e9  # usable HBM on a 16 GB v5e chip
    if cache_bytes + param_bytes > budget:
        get_logger("domainrag_tpu.flux").warning(
            "block_cache_interval>1: estimated per-device HBM %.1f GB "
            "(residual cache %.1f GB for batch %d + weights %.1f GB) "
            "exceeds ~%.0f GB — expect RESOURCE_EXHAUSTED; reduce the "
            "rank batch, shard over more devices, or disable block "
            "caching", (cache_bytes + param_bytes) / 1e9,
            cache_bytes / 1e9, per_dev_batch, param_bytes / 1e9,
            budget / 1e9)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "vae_cfg", "grid_h", "grid_w", "tp_tag",
                     "cache_interval"))
def _generate_core_cached(flux_params, vae_params, latents, prompt_embeds,
                          pooled, sigmas, guidance,
                          cfg: flux_mod.FluxConfig,
                          vae_cfg: vae_mod.VaeConfig, grid_h: int,
                          grid_w: int, tp_tag: str = "none",
                          cache_interval: int = 2):
    """:func:`_generate_core` with block-residual caching
    (flux_mod.apply_with_cache): blocks recompute every
    ``cache_interval`` steps and replay their residuals in between.
    EXPERIMENTAL — changes outputs (see BENCH_NOTES)."""
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    b, s_img = latents.shape[0], latents.shape[1]
    cache = flux_mod.init_block_cache(cfg, b, s_img,
                                      prompt_embeds.shape[1],
                                      dtype=latents.dtype)

    def body(i, carry):
        x, cache = carry
        sigma = sigmas[i]
        v, cache = flux_mod.apply_with_cache(
            flux_params, x, prompt_embeds, pooled,
            jnp.full((b,), sigma, jnp.float32), img_ids, txt_ids, cfg,
            cache, refresh=(i % cache_interval == 0),
            guidance=jnp.full((b,), guidance, jnp.float32))
        return sched_mod.euler_step(x, v, sigma, sigmas[i + 1]), cache

    out_tokens, _ = jax.lax.fori_loop(0, sigmas.shape[0] - 1, body,
                                      (latents, cache))
    return _decode_tokens(vae_params, out_tokens, grid_h, grid_w, vae_cfg)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_h", "grid_w", "tp_tag", "cache_interval",
                     "vcache_interval", "vcache_order"))
def _denoise_latents(flux_params, latents, prompt_embeds, pooled, sigmas,
                     guidance, cfg: flux_mod.FluxConfig, grid_h: int,
                     grid_w: int, tp_tag: str = "none",
                     cache_interval: int = 1, vcache_interval: int = 1,
                     vcache_order: int = 1):
    """Denoise WITHOUT the VAE decode — the latent-trajectory probe the
    cache auto-calibrations compare across intervals (block-residual via
    ``cache_interval``, velocity extrapolation via ``vcache_interval``)."""
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    b = latents.shape[0]
    if cache_interval <= 1:
        model_fn = _dense_model_fn(flux_params, prompt_embeds, pooled,
                                   guidance, img_ids, txt_ids, cfg)
        return _pick_denoise(model_fn, latents, sigmas, vcache_interval,
                             vcache_order)
    cache = flux_mod.init_block_cache(cfg, b, latents.shape[1],
                                      prompt_embeds.shape[1],
                                      dtype=latents.dtype)

    def body(i, carry):
        x, cache = carry
        sigma = sigmas[i]
        v, cache = flux_mod.apply_with_cache(
            flux_params, x, prompt_embeds, pooled,
            jnp.full((b,), sigma, jnp.float32), img_ids, txt_ids, cfg,
            cache, refresh=(i % cache_interval == 0),
            guidance=jnp.full((b,), guidance, jnp.float32))
        return sched_mod.euler_step(x, v, sigma, sigmas[i + 1]), cache

    out, _ = jax.lax.fori_loop(0, sigmas.shape[0] - 1, body,
                               (latents, cache))
    return out


_BLOCK_CACHE_CALIBRATIONS: dict = {}


def _params_token(bundle):
    """Stable identity token for ``bundle.flux_params``, regenerated
    whenever ANY leaf array is swapped — the same weakref-per-leaf guard
    as :func:`_pipeline_stages`. Calibration caches key on this object
    (held strongly by the cache key) instead of ``id(params)``: after the
    original tree is GC'd a new model's params can reuse the id and
    silently inherit the old calibration (VERDICT r3 weak #2)."""
    import weakref
    leaves = jax.tree_util.tree_leaves(bundle.flux_params)
    entry = getattr(bundle, "_calib_token", None)
    if entry is not None and len(entry[0]) == len(leaves) and \
            all(r() is l for r, l in zip(entry[0], leaves)):
        return entry[1]
    token = object()
    bundle._calib_token = ([weakref.ref(l) for l in leaves], token)
    return token


def calibrate_block_cache_interval(bundle: FluxBundle,
                                   prompt_embeds: jax.Array,
                                   pooled: jax.Array,
                                   height: int, width: int,
                                   num_steps: int, guidance: float,
                                   seed: int = 0,
                                   divergence_budget: float = 0.05,
                                   candidates=(4, 3, 2),
                                   mode: str = "residual",
                                   budget_space: str = "image") -> int:
    """Pick the largest cache interval whose divergence from the exact
    denoise stays within ``divergence_budget`` (VERDICT r2 item 6: an
    interval chosen by a pinned divergence budget instead of a blind
    flag). ``mode``: "residual" calibrates the block-residual cache,
    "velocity" the velocity-extrapolation cache.

    ``budget_space`` (VERDICT r3 item 1: the north star is FID-matched
    IMAGES, so a budget keyed to latent norms is one step removed from
    what a user sees): "image" (default) takes the relative L2 between
    the VAE-DECODED probe images — the space the quality claim lives
    in; "latent" preserves the round-3 final-latent metric. The log
    records both curves either way.

    Runs one exact + up to len(candidates) cached denoises of a SINGLE
    sample at the call's own config — a one-time calibration per
    (model, resolution, steps) that is cached process-wide.  Returns 1
    when no candidate fits the budget."""
    from ...core.log import get_logger
    assert mode in ("residual", "velocity"), mode
    assert budget_space in ("image", "latent"), budget_space
    lf = bundle.latent_factor
    grid_h, grid_w = height // lf, width // lf
    schedule = sched_mod.make_schedule(num_steps,
                                       image_seq_len=grid_h * grid_w)
    c = bundle.vae_cfg.latent_channels * 4
    latents = jax.random.normal(jax.random.PRNGKey(seed),
                                (1, grid_h * grid_w, c), jnp.float32
                                ).astype(bundle.compute_dtype)
    e = prompt_embeds[:1].astype(bundle.compute_dtype)
    p = pooled[:1].astype(bundle.compute_dtype)
    sig = jnp.asarray(schedule.sigmas)
    g = jnp.float32(guidance)

    def probe(interval: int):
        kw = ({"cache_interval": interval} if mode == "residual"
              else {"vcache_interval": interval})
        lat = _denoise_latents(
            bundle.flux_params, latents, e, p, sig, g,
            cfg=bundle.flux_cfg, grid_h=grid_h, grid_w=grid_w,
            tp_tag=_tp_tag(bundle), **kw)
        img = _decode_tokens(bundle.vae_params, lat, grid_h, grid_w,
                             bundle.vae_cfg)
        return (np.asarray(lat, np.float32), np.asarray(img, np.float32))

    with _tp_context(bundle):
        exact_lat, exact_img = probe(1)
        norms = {"latent": float(np.linalg.norm(exact_lat)) or 1.0,
                 "image": float(np.linalg.norm(exact_img)) or 1.0}
        curve: dict = {}
        chosen = 1
        for interval in sorted(candidates, reverse=True):
            lat, img = probe(int(interval))
            rel = {"latent": float(np.linalg.norm(lat - exact_lat))
                   / norms["latent"],
                   "image": float(np.linalg.norm(img - exact_img))
                   / norms["image"]}
            curve[int(interval)] = rel
            if rel[budget_space] <= divergence_budget and chosen == 1:
                chosen = int(interval)
    get_logger("domainrag_tpu.flux").info(
        "%s-cache calibration @%dx%d/%d steps: divergence %s, budget "
        "%.3f on %s -> interval %d", mode, width, height, num_steps,
        {k: {s: round(v2, 4) for s, v2 in v.items()}
         for k, v in sorted(curve.items())},
        divergence_budget, budget_space, chosen)
    return chosen


@functools.partial(
    jax.jit, static_argnames=("cfg", "grid_h", "grid_w", "tp_tag"))
def _record_velocities(flux_params, latents, prompt_embeds, pooled,
                       sigmas, guidance, cfg: flux_mod.FluxConfig,
                       grid_h: int, grid_w: int, tp_tag: str = "none"):
    """Dense Euler denoise that RETURNS (final latents, per-step
    velocities (n, *latent.shape) f32) — the probe
    :func:`plan_vcache_anchors` and the image-space schedule selection
    consume. One scan, one copy of the transformer graph."""
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    model_fn = _dense_model_fn(flux_params, prompt_embeds, pooled,
                               guidance, img_ids, txt_ids, cfg)

    def step(x, i):
        v = model_fn(x, sigmas[i]).astype(jnp.float32)
        return sched_mod.euler_step(x, v, sigmas[i], sigmas[i + 1]), v

    out, vs = jax.lax.scan(step, latents,
                           jnp.arange(sigmas.shape[0] - 1))
    return out, vs


def plan_vcache_anchors(velocities: np.ndarray, sigmas: np.ndarray,
                        n_anchors: int, order: int = 1) -> tuple:
    """Optimal anchor placement for the velocity cache under the
    frozen-field surrogate, as an exact dynamic program.

    Treat the recorded dense velocities ``v_i`` as the field along the
    trajectory (velocity extrapolation banks on v depending mostly on
    sigma there). The cached Euler integrator's final-state error is
    then sum_i ds_i (v_used_i - v_i); we minimize the additive
    relaxation sum_i ds_i^2 ||v_used_i - v_i||^2, which a DP over
    consecutive anchor PAIRS solves exactly (the order-1 slope couples
    each group to its previous anchor). All pairwise inner products
    reduce to the velocity Gram matrix, so after the single recorded
    probe this is O(n^2) memory and O(G n^3) scalar work (n = steps,
    a few hundred k ops at n = 28) — no further device work.

    Returns a strictly increasing tuple starting at 0 with
    ``n_anchors`` entries (the model-call count).
    """
    v = np.asarray(velocities, np.float64)
    n = v.shape[0]
    if not 1 <= n_anchors <= n:
        raise ValueError(f"n_anchors must be in [1, {n}]: {n_anchors}")
    v = v.reshape(n, -1)
    s = np.asarray(sigmas, np.float64)[:n]
    w = np.square(np.diff(np.asarray(sigmas, np.float64)[:n + 1]))
    gram = v @ v.T

    # err2[(p, a)][i] = w_i * ||v_used_i - v_i||^2 for step i >= a with
    # anchor a and previous anchor p (p == a encodes the first group's
    # order-0 hold); cum[(p, a)] prefix-sums it so any group cost is a
    # subtraction.
    def _cum(p, a):
        idx = np.arange(a, n)
        if order >= 1 and p != a:
            t = (s[idx] - s[a]) / (s[a] - s[p])
        else:
            t = np.zeros(len(idx))
        al = 1.0 + t
        e2 = (al * al * gram[a, a] + t * t * gram[p, p]
              + gram[idx, idx] - 2.0 * al * t * gram[a, p]
              - 2.0 * al * gram[a, idx] + 2.0 * t * gram[p, idx])
        c = np.zeros(n + 1 - a)
        np.cumsum(np.maximum(e2, 0.0) * w[idx], out=c[1:])
        return c

    cums: dict = {}

    def cost(p, a, b):                      # group [a, b) under (p, a)
        c = cums.get((p, a))
        if c is None:
            c = cums[(p, a)] = _cum(p, a)
        return c[b - a]

    # f[(p, a)] = best cost of the steps BEFORE a, with the last two
    # anchors (p, a); g anchors placed so far.
    INF = float("inf")
    f = {(0, 0): 0.0}
    parent: dict = {}
    for g in range(1, n_anchors):
        nxt: dict = {}
        for (p, a), val in f.items():
            for b_ in range(a + 1, n - (n_anchors - g) + 1):
                cand = val + cost(p, a, b_)
                if cand < nxt.get((a, b_), INF):
                    nxt[(a, b_)] = cand
                    parent[(g, a, b_)] = p
        f = nxt
    best, best_pa = INF, None
    for (p, a), val in f.items():
        total = val + cost(p, a, n)
        if total < best:
            best, best_pa = total, (p, a)
    # walk parents back to 0
    anchors = []
    p, a = best_pa
    for g in range(n_anchors - 1, 0, -1):
        anchors.append(a)
        p, a = parent[(g, p, a)], p
    anchors.append(0)
    return tuple(sorted(anchors))


def select_vcache_anchors(vs, sigmas, n_anchors: int, interval: int,
                          probe_fn, decode_fn, exact_final,
                          log_tag: str = "") -> tuple:
    """Pick the ``sched:K`` anchor schedule by IMAGE-space divergence
    (VERDICT r4 weak #1: the round-3 anchor DP optimized the LATENT
    velocity residual while every other budget moved to VAE-decoded
    image space, and its sched:3 measured image-space WORSE than
    uniform-3 at 512 px).

    Candidates are the latent-DP optimum (:func:`plan_vcache_anchors`)
    and the uniform-``interval`` schedule at the same model-call count.
    Each is scored with ONE real cached probe (``probe_fn(anchors)`` →
    final latent tokens) decoded through the VAE (``decode_fn``) against
    the dense probe's ``exact_final``; the schedule with the smaller
    image rel-L2 ships. sched:K therefore can never rank below
    uniform-K under the calibration's own metric — the failure mode
    round 4 measured is structurally closed.

    Returns the winning anchors tuple (uniform expressed as its
    explicit tuple; identical trajectory to the int interval)."""
    from ...core.log import get_logger
    n = len(np.asarray(sigmas)) - 1
    dp = plan_vcache_anchors(np.asarray(vs, np.float32),
                             np.asarray(sigmas), n_anchors)
    uniform = tuple(range(0, n, int(interval)))
    if dp == uniform:
        return dp
    exact_img = decode_fn(exact_final)
    norm = float(np.linalg.norm(exact_img)) or 1.0
    scores = {}
    for name, anchors in (("dp", dp), ("uniform", uniform)):
        img = decode_fn(probe_fn(anchors))
        scores[name] = float(np.linalg.norm(img - exact_img)) / norm
    winner = min(scores, key=scores.get)
    get_logger("domainrag_tpu.flux").info(
        "%svelocity-cache schedule selection (%d anchors): image rel-L2 "
        "dp=%.4f uniform=%.4f -> %s %s", log_tag, n_anchors,
        scores["dp"], scores["uniform"], winner,
        dp if winner == "dp" else uniform)
    return dp if winner == "dp" else uniform


_VCACHE_SCHEDULES: dict = {}


def calibrate_vcache_schedule(bundle: "FluxBundle",
                              prompt_embeds: jax.Array,
                              pooled: jax.Array, height: int, width: int,
                              num_steps: int, guidance: float,
                              n_anchors: int, interval: int,
                              seed: int = 0) -> tuple:
    """One recorded dense probe at the call's own config, then the
    IMAGE-space schedule selection (:func:`select_vcache_anchors`:
    latent-DP optimum vs uniform-``interval``, each scored by one real
    cached denoise decoded through the VAE). A one-time calibration per
    (model, resolution, steps, anchor count), cached process-wide
    (``"sched:K"`` resolution). Costs one exact + two cached denoises —
    the same class as the interval auto-calibration."""
    lf = bundle.latent_factor
    grid_h, grid_w = height // lf, width // lf
    schedule = sched_mod.make_schedule(num_steps,
                                       image_seq_len=grid_h * grid_w)
    c = bundle.vae_cfg.latent_channels * 4
    latents = jax.random.normal(jax.random.PRNGKey(seed),
                                (1, grid_h * grid_w, c), jnp.float32
                                ).astype(bundle.compute_dtype)
    e = prompt_embeds[:1].astype(bundle.compute_dtype)
    p = pooled[:1].astype(bundle.compute_dtype)
    sig = jnp.asarray(schedule.sigmas)
    g = jnp.float32(guidance)

    def decode(tokens):
        return np.asarray(_decode_tokens(
            bundle.vae_params, tokens, grid_h, grid_w, bundle.vae_cfg),
            np.float32)

    def probe(anchors):
        return _denoise_latents(
            bundle.flux_params, latents, e, p, sig, g,
            cfg=bundle.flux_cfg, grid_h=grid_h, grid_w=grid_w,
            tp_tag=_tp_tag(bundle), vcache_interval=anchors)

    with _tp_context(bundle):
        exact, vs = _record_velocities(
            bundle.flux_params, latents, e, p, sig, g,
            cfg=bundle.flux_cfg, grid_h=grid_h, grid_w=grid_w,
            tp_tag=_tp_tag(bundle))
        return select_vcache_anchors(
            np.asarray(vs, np.float32), np.asarray(schedule.sigmas),
            n_anchors, interval, probe, decode, exact,
            log_tag=f"@{width}x{height}/{num_steps} steps ")


def _resolve_block_cache_interval(bundle, block_cache_interval,
                                  prompt_embeds, pooled, height, width,
                                  num_steps, guidance,
                                  mode: str = "residual"):
    v = block_cache_interval
    if isinstance(v, (list, tuple)):
        if mode != "velocity":
            raise ValueError("anchor-schedule form is velocity-cache "
                             "only; block_cache_interval takes an int")
        return tuple(int(a) for a in v)
    if isinstance(v, str) and v.startswith("sched:"):
        if mode != "velocity":
            raise ValueError("'sched:K' is velocity-cache only")
        k = int(v.split(":", 1)[1])
        if k <= 1:
            return 1
        n_anchors = -(-num_steps // k)      # model-call parity with
        key = (_params_token(bundle), height, width, num_steps,
               float(guidance), "velocity-sched", n_anchors)
        if key not in _VCACHE_SCHEDULES:   # uniform interval k
            _VCACHE_SCHEDULES[key] = calibrate_vcache_schedule(
                bundle, prompt_embeds, pooled, height, width, num_steps,
                guidance, n_anchors, k)
        return _VCACHE_SCHEDULES[key]
    if block_cache_interval != "auto":
        return int(block_cache_interval)
    key = (_params_token(bundle), height, width, num_steps,
           float(guidance), mode)
    if key not in _BLOCK_CACHE_CALIBRATIONS:
        _BLOCK_CACHE_CALIBRATIONS[key] = calibrate_block_cache_interval(
            bundle, prompt_embeds, pooled, height, width, num_steps,
            guidance, mode=mode)
    return _BLOCK_CACHE_CALIBRATIONS[key]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "vae_cfg", "grid_h", "grid_w", "tp_tag",
                     "vcache_interval", "vcache_order"))
def _generate_core(flux_params, vae_params, latents, prompt_embeds, pooled,
                   sigmas, guidance, cfg: flux_mod.FluxConfig,
                   vae_cfg: vae_mod.VaeConfig, grid_h: int, grid_w: int,
                   tp_tag: str = "none", vcache_interval: int = 1,
                   vcache_order: int = 1):
    # tp_tag keys the jit cache: the TP shard_map is baked into the traced
    # graph via the surrounding tp_attention context, invisible to jit
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    model_fn = _dense_model_fn(flux_params, prompt_embeds, pooled,
                               guidance, img_ids, txt_ids, cfg)
    out_tokens = _pick_denoise(model_fn, latents, sigmas,
                               vcache_interval, vcache_order)
    return _decode_tokens(vae_params, out_tokens, grid_h, grid_w, vae_cfg)


def generate(bundle: FluxBundle, prompt_embeds: jax.Array,
             pooled: jax.Array, height: int, width: int,
             num_steps: int = 50, guidance: float = 2.5,
             seed=0,
             scheduler_overrides: Optional[dict] = None,
             mesh=None, data_axis: str = "data",
             pipe_axis: Optional[str] = None,
             microbatches: Optional[int] = None,
             block_cache_interval: int = 1,
             velocity_cache_interval: int = 1,
             velocity_cache_order: int = 1) -> np.ndarray:
    """Full text/Redux-to-image run. Returns (B, H, W, 3) uint8 when
    ``prompt_embeds`` is batched (B > 1), else (H, W, 3).

    ``block_cache_interval`` > 1 enables the EXPERIMENTAL block-residual
    caching accelerator (blocks recompute every N steps, residuals replay
    in between — ~1.5× at N=2, outputs change; BENCH_NOTES.md). 1 = exact.

    ``velocity_cache_interval`` > 1 enables the velocity-extrapolation
    accelerator instead (_vcache_denoise): the network runs every N-th
    step and skipped steps integrate an extrapolated velocity — a full
    N× on the denoise, no residual-cache HBM, composes with DP/TP/PP.
    Also EXPERIMENTAL (outputs change; quality curves in BENCH_NOTES.md);
    mutually exclusive with ``block_cache_interval``. ``"auto"``
    calibrates the largest interval within the divergence budget.

    Defaults mirror the background-gen stage (guidance 2.5, 50 steps,
    fixed seed — batch_generate_flux_kshot.py:467-474). Batched priors
    denoise together in one compiled graph (the reference generated the 5
    retrieval ranks sequentially — do not replicate).

    ``pipe_axis``: name of a mesh axis to PIPELINE the transformer depth
    over (parallel/pipeline_parallel.py) — each device then executes only
    57/S of the blocks per microbatch; ``microbatches`` defaults to the
    batch size. Mutually exclusive with data-axis sharding here (PP
    serves the depth dimension; combine with DP by vmapping sample groups
    at the stage level)."""
    batched = prompt_embeds.ndim == 3 and prompt_embeds.shape[0] > 1
    b = prompt_embeds.shape[0] if prompt_embeds.ndim == 3 else 1
    seeds = list(seed) if isinstance(seed, (list, tuple)) else [seed] * b
    assert len(seeds) == b

    lf = bundle.latent_factor
    grid_h, grid_w = height // lf, width // lf
    seq = grid_h * grid_w
    schedule = sched_mod.make_schedule(num_steps, image_seq_len=seq,
                                       **(scheduler_overrides or {}))
    c = bundle.vae_cfg.latent_channels * 4
    latents = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(s), (seq, c), jnp.float32)
        for s in seeds]).astype(bundle.compute_dtype)
    embeds = prompt_embeds.astype(bundle.compute_dtype)
    pooled_c = pooled.astype(bundle.compute_dtype)

    # "auto": one-time calibration picks the largest interval within the
    # pinned latent-divergence budget (cached per model/resolution/steps)
    block_cache_interval = _resolve_block_cache_interval(
        bundle, block_cache_interval, embeds, pooled_c, height, width,
        num_steps, guidance)
    velocity_cache_interval = _resolve_block_cache_interval(
        bundle, velocity_cache_interval, embeds, pooled_c, height, width,
        num_steps, guidance, mode="velocity")
    if block_cache_interval > 1 and _vc_active(velocity_cache_interval):
        raise ValueError(
            "block_cache_interval and velocity_cache_interval are "
            "mutually exclusive accelerators — pick one")

    n_real = latents.shape[0]
    if pipe_axis is not None:
        if mesh is None or mesh.shape.get(pipe_axis, 1) <= 1:
            raise ValueError("pipe_axis requires a mesh with that axis")
        if block_cache_interval > 1:
            raise ValueError("block_cache_interval is not implemented on "
                             "the pipelined (pipe_axis) path")
        if bundle.tp_mesh is not None:
            raise ValueError(
                "pipe_axis (pipeline parallelism) does not compose with a "
                "TP-sharded bundle: the PP path serves unsharded per-stage "
                "block params and would silently ignore tp_mesh. Serve "
                "with EITHER model_parallel (TP) or pipeline_parallel.")
        S = mesh.shape[pipe_axis]
        stages = _pipeline_stages(bundle, S, mesh=mesh,
                                   axis=pipe_axis)
        light = {k: v for k, v in bundle.flux_params.items()
                 if k not in ("double", "single")}  # blocks live sharded
        img = _generate_core_pp(
            light, stages.doubles, stages.singles, bundle.vae_params,
            latents, embeds, pooled_c, jnp.asarray(schedule.sigmas),
            jnp.float32(guidance), cfg=bundle.flux_cfg,
            vae_cfg=bundle.vae_cfg, grid_h=grid_h, grid_w=grid_w,
            axis=pipe_axis, microbatches=microbatches or n_real,
            mesh=mesh, d=stages.per_stage_double,
            g=stages.per_stage_single, n_stages=S,
            vcache_interval=velocity_cache_interval,
            vcache_order=velocity_cache_order)
        out = to_uint8(np.asarray(img, np.float32))[:n_real]
        return out if batched else out[0]
    if block_cache_interval > 1:
        _check_block_cache_hbm(bundle, n_real, grid_h * grid_w,
                               prompt_embeds.shape[-2], mesh, data_axis)
    if mesh is not None:
        # data-parallel sample sharding (replaces the reference's
        # process-per-GPU executor, outpainting...py:1605-1715): pad the
        # batch to the data-axis size and shard the leading dim; GSPMD
        # runs each device's slice independently.
        from jax.sharding import NamedSharding, PartitionSpec as P
        d = mesh.shape[data_axis]
        pad = (-n_real) % d
        if pad:
            def pad0(x):
                return jnp.concatenate([x] + [x[:1]] * pad, axis=0)
            latents, embeds, pooled_c = (pad0(latents), pad0(embeds),
                                         pad0(pooled_c))
        shard = NamedSharding(mesh, P(data_axis))
        latents = jax.device_put(latents, shard)
        embeds = jax.device_put(embeds, shard)
        pooled_c = jax.device_put(pooled_c, shard)

    # pure DP (no TP bundle): run the core under shard_map so the Pallas
    # kernels see per-device local batch shapes (_dp_wrap docstring)
    dp_map = (mesh is not None and bundle.tp_mesh is None
              and mesh.shape.get(data_axis, 1) > 1)
    with _tp_context(bundle):
        if block_cache_interval > 1:
            core = (_dp_wrap(_generate_core_cached, mesh, data_axis, 3, 2,
                             cfg=bundle.flux_cfg, vae_cfg=bundle.vae_cfg,
                             grid_h=grid_h, grid_w=grid_w,
                             tp_tag=_tp_tag(bundle),
                             cache_interval=block_cache_interval)
                    if dp_map else functools.partial(
                        _generate_core_cached, cfg=bundle.flux_cfg,
                        vae_cfg=bundle.vae_cfg, grid_h=grid_h,
                        grid_w=grid_w, tp_tag=_tp_tag(bundle),
                        cache_interval=block_cache_interval))
        else:
            core = (_dp_wrap(_generate_core, mesh, data_axis, 3, 2,
                             cfg=bundle.flux_cfg, vae_cfg=bundle.vae_cfg,
                             grid_h=grid_h, grid_w=grid_w,
                             tp_tag=_tp_tag(bundle),
                             vcache_interval=velocity_cache_interval,
                             vcache_order=velocity_cache_order)
                    if dp_map else functools.partial(
                        _generate_core, cfg=bundle.flux_cfg,
                        vae_cfg=bundle.vae_cfg, grid_h=grid_h,
                        grid_w=grid_w, tp_tag=_tp_tag(bundle),
                        vcache_interval=velocity_cache_interval,
                        vcache_order=velocity_cache_order))
        img = core(bundle.flux_params, bundle.vae_params, latents, embeds,
                   pooled_c, jnp.asarray(schedule.sigmas),
                   jnp.float32(guidance))
    out = to_uint8(np.asarray(img, np.float32))[:n_real]
    return out if batched else out[0]


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 (diffusers postprocess convention)."""
    return (np.clip(img / 2.0 + 0.5, 0.0, 1.0) * 255.0).round().astype(
        np.uint8)


def from_uint8(img: np.ndarray) -> np.ndarray:
    return img.astype(np.float32) / 127.5 - 1.0


# ---------------------------------------------------------------------------
# fill (inpaint/outpaint composition)
# ---------------------------------------------------------------------------

def pack_mask(mask: jax.Array, vae_factor: int) -> jax.Array:
    """(B, H, W) binary mask (1 = repaint) -> (B, S, vae_factor^2 * 4)
    tokens: 8x8 pixel-unshuffle into channels, then 2x2 latent packing
    (diffusers FluxFillPipeline mask conditioning)."""
    b, h, w = mask.shape
    f = vae_factor
    lh, lw = h // f, w // f
    x = mask.reshape(b, lh, f, lw, f)
    x = x.transpose(0, 1, 3, 2, 4).reshape(b, lh, lw, f * f)
    return flux_mod.pack_latents(x)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "vae_cfg", "grid_h", "grid_w", "tp_tag",
                     "tiled_vae", "vae_tile", "vae_overlap",
                     "vcache_interval", "vcache_order"))
def _fill_core(flux_params, vae_params, image, mask, noise, prompt_embeds,
               pooled, sigmas, guidance, cfg: flux_mod.FluxConfig,
               vae_cfg: vae_mod.VaeConfig, grid_h: int, grid_w: int,
               tp_tag: str = "none", tiled_vae: bool = False,
               vae_tile: int = 96, vae_overlap: int = 16,
               vcache_interval: int = 1, vcache_order: int = 1):
    """image (1, H, W, 3) in [-1,1]; mask (1, H, W) float 0/1 (1=repaint).

    ``tiled_vae`` bounds VAE activation memory for the >=2048 px fill
    configs (the regime the reference capped at 2800 px to dodge CUDA OOM,
    outpainting_updown_sampling_redux.py:104-108)."""
    # strength partial denoise: latents start from noised image latents
    # at sigma_0 (_fill_conditioning)
    latents, cond = _fill_conditioning(vae_params, image, mask, noise,
                                       sigmas, vae_cfg, tiled_vae,
                                       vae_tile, vae_overlap)
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    base_fn = _dense_model_fn(flux_params, prompt_embeds, pooled,
                              guidance, img_ids, txt_ids, cfg)
    model_fn = lambda x, sigma: base_fn(  # noqa: E731
        jnp.concatenate([x, cond], axis=-1), sigma)
    out = _pick_denoise(model_fn, latents, sigmas, vcache_interval,
                        vcache_order)
    return _decode_tokens(vae_params, out, grid_h, grid_w, vae_cfg,
                          tiled_vae, vae_tile, vae_overlap)


@functools.partial(
    jax.jit,
    static_argnames=("vae_cfg", "tiled_vae", "vae_tile", "vae_overlap"))
def _fill_cond_jit(vae_params, image, mask, noise, sigmas,
                   vae_cfg: vae_mod.VaeConfig, tiled_vae: bool,
                   vae_tile: int, vae_overlap: int):
    return _fill_conditioning(vae_params, image, mask, noise, sigmas,
                              vae_cfg, tiled_vae, vae_tile, vae_overlap)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "grid_h", "grid_w", "tp_tag",
                     "vcache_interval", "vcache_order"))
def _fill_denoise_jit(flux_params, latents, cond, prompt_embeds, pooled,
                      sigmas, guidance, cfg: flux_mod.FluxConfig,
                      grid_h: int, grid_w: int, tp_tag: str,
                      vcache_interval=1, vcache_order: int = 1):
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    base_fn = _dense_model_fn(flux_params, prompt_embeds, pooled,
                              guidance, img_ids, txt_ids, cfg)
    model_fn = lambda x, sigma: base_fn(  # noqa: E731
        jnp.concatenate([x, cond], axis=-1), sigma)
    return _pick_denoise(model_fn, latents, sigmas, vcache_interval,
                         vcache_order)


@functools.partial(
    jax.jit,
    static_argnames=("vae_cfg", "grid_h", "grid_w", "tiled_vae",
                     "vae_tile", "vae_overlap"))
def _decode_tokens_jit(vae_params, tokens, grid_h: int, grid_w: int,
                       vae_cfg: vae_mod.VaeConfig, tiled_vae: bool,
                       vae_tile: int, vae_overlap: int):
    return _decode_tokens(vae_params, tokens, grid_h, grid_w, vae_cfg,
                          tiled_vae, vae_tile, vae_overlap)


def _fill_core_staged(flux_params, vae_params, image, mask, noise,
                      prompt_embeds, pooled, sigmas, guidance, *,
                      cfg, vae_cfg, grid_h, grid_w, tp_tag,
                      vae_tile, vae_overlap, vcache_interval,
                      vcache_order):
    """Single-chip hires fill: the one-graph ``_fill_core`` at the
    2800 px cap needs 20.91 GB of HBM at compile time (tiled VAE
    encode ×2 + the 45-step denoise + tiled decode next to the 12 GB
    int8 tree — measured OOM, round 5), so the three phases run as
    separate executables whose peaks fit 16 GB individually. Costs two
    extra dispatches per image (~ms) against a multi-minute graph."""
    latents, cond = _fill_cond_jit(vae_params, image, mask, noise,
                                   sigmas, vae_cfg, True, vae_tile,
                                   vae_overlap)
    toks = _fill_denoise_jit(flux_params, latents, cond, prompt_embeds,
                             pooled, sigmas, guidance, cfg, grid_h,
                             grid_w, tp_tag, vcache_interval,
                             vcache_order)
    del latents, cond
    return _decode_tokens_jit(vae_params, toks, grid_h, grid_w, vae_cfg,
                              True, vae_tile, vae_overlap)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "vae_cfg", "grid_h", "grid_w", "tp_tag",
                     "tiled_vae", "vae_tile", "vae_overlap",
                     "vcache_interval", "vcache_order", "record"))
def _fill_probe_core(flux_params, vae_params, image, mask, noise,
                     prompt_embeds, pooled, sigmas, guidance,
                     cfg: flux_mod.FluxConfig, vae_cfg: vae_mod.VaeConfig,
                     grid_h: int, grid_w: int, tp_tag: str = "none",
                     tiled_vae: bool = False, vae_tile: int = 96,
                     vae_overlap: int = 16, vcache_interval=1,
                     vcache_order: int = 1, record: bool = False):
    """Calibration probe on the FILL core: the same conditioning +
    strength-trimmed denoise as :func:`_fill_core` but returning final
    latent TOKENS (no VAE decode — calibration compares latents).
    ``record=True`` runs the dense loop and additionally returns the
    per-step velocities for :func:`plan_vcache_anchors` (the fill-regime
    counterpart of :func:`_record_velocities`, VERDICT r3 item 3)."""
    latents, cond = _fill_conditioning(vae_params, image, mask, noise,
                                       sigmas, vae_cfg, tiled_vae,
                                       vae_tile, vae_overlap)
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    base_fn = _dense_model_fn(flux_params, prompt_embeds, pooled,
                              guidance, img_ids, txt_ids, cfg)
    model_fn = lambda x, sigma: base_fn(  # noqa: E731
        jnp.concatenate([x, cond], axis=-1), sigma)
    if record:
        def step(x, i):
            v = model_fn(x, sigmas[i]).astype(jnp.float32)
            return sched_mod.euler_step(x, v, sigmas[i],
                                        sigmas[i + 1]), v

        out, vs = jax.lax.scan(step, latents,
                               jnp.arange(sigmas.shape[0] - 1))
        return out, vs
    return _pick_denoise(model_fn, latents, sigmas, vcache_interval,
                         vcache_order)


_FILL_VCACHE_CALIBRATIONS: dict = {}


def calibrate_fill_vcache(bundle: "FluxBundle", image, mask, noise,
                          prompt_embeds, pooled, sigmas, guidance: float,
                          grid_h: int, grid_w: int, *, form: str,
                          tiled_vae: bool = False, vae_tile: int = 96,
                          vae_overlap: int = 16,
                          divergence_budget: float = 0.05,
                          candidates=(4, 3, 2),
                          budget_space: str = "image"):
    """Velocity-cache calibration ON the fill regime (VERDICT r3 item 3:
    the compose stage — the reference's headline workload,
    outpainting_updown_sampling_redux.py:1246-1257 — previously got only
    blind integers because the generate-path calibration refused fill).

    Probes a SINGLE sample of the actual call (its own image, mask,
    prompt, strength-trimmed sigmas — so the per-dataset strengths of
    outpainting_updown_sampling_redux.py:31-56 shape the schedule):

    - ``form="auto"``: one dense probe (exact final latents) + up to
      ``len(candidates)`` cached fill denoises; returns the largest
      uniform interval whose rel-L2 divergence — measured on the
      VAE-DECODED images by default (``budget_space="image"``, VERDICT
      r3 item 1; ``"latent"`` preserves the final-latent metric) —
      stays within ``divergence_budget`` (1 when none fits).
    - ``form="sched:K"``: one dense probe recording velocities, then the
      IMAGE-space selection (:func:`select_vcache_anchors`: latent-DP
      anchors vs uniform-K at model-call parity over the TRIMMED step
      count, each scored by a real cached fill denoise decoded through
      the VAE); returns the winning anchor tuple.
    """
    from ...core.log import get_logger
    assert budget_space in ("image", "latent"), budget_space
    n_steps = int(sigmas.shape[0]) - 1
    kw = dict(cfg=bundle.flux_cfg, vae_cfg=bundle.vae_cfg, grid_h=grid_h,
              grid_w=grid_w, tp_tag=_tp_tag(bundle), tiled_vae=tiled_vae,
              vae_tile=vae_tile, vae_overlap=vae_overlap)

    def decode(tokens):
        return np.asarray(_decode_tokens(
            bundle.vae_params, tokens, grid_h, grid_w, bundle.vae_cfg,
            tiled_vae, vae_tile, vae_overlap), np.float32)

    with _tp_context(bundle):
        exact, vs = _fill_probe_core(
            bundle.flux_params, bundle.vae_params, image, mask, noise,
            prompt_embeds, pooled, sigmas, jnp.float32(guidance),
            record=True, **kw)
        if form.startswith("sched:"):
            k = int(form.split(":", 1)[1])
            if k <= 1:
                return 1
            n_anchors = -(-n_steps // k)
            if n_anchors >= n_steps:
                return 1
            return select_vcache_anchors(
                np.asarray(vs, np.float32), np.asarray(sigmas),
                n_anchors, k,
                lambda anchors: _fill_probe_core(
                    bundle.flux_params, bundle.vae_params, image, mask,
                    noise, prompt_embeds, pooled, sigmas,
                    jnp.float32(guidance), vcache_interval=anchors, **kw),
                decode, exact,
                log_tag=f"fill @{grid_w}x{grid_h} grid/{n_steps} "
                        f"trimmed steps ")
        exact_img = decode(exact)
        exact_lat = np.asarray(exact, np.float32)
        norms = {"latent": float(np.linalg.norm(exact_lat)) or 1.0,
                 "image": float(np.linalg.norm(exact_img)) or 1.0}
        curve: dict = {}
        chosen = 1
        for interval in sorted(candidates, reverse=True):
            if interval >= n_steps:
                continue
            cached = _fill_probe_core(
                bundle.flux_params, bundle.vae_params, image, mask,
                noise, prompt_embeds, pooled, sigmas,
                jnp.float32(guidance), vcache_interval=int(interval),
                **kw)
            rel = {"latent": float(np.linalg.norm(
                       np.asarray(cached, np.float32) - exact_lat))
                   / norms["latent"],
                   "image": float(np.linalg.norm(
                       decode(cached) - exact_img)) / norms["image"]}
            curve[int(interval)] = rel
            if rel[budget_space] <= divergence_budget and chosen == 1:
                chosen = int(interval)
    get_logger("domainrag_tpu.flux").info(
        "fill velocity-cache calibration @%dx%d grid/%d trimmed steps: "
        "divergence %s, budget %.3f on %s -> interval %d", grid_w,
        grid_h, n_steps,
        {k_: {s: round(v2, 4) for s, v2 in v_.items()}
         for k_, v_ in sorted(curve.items())},
        divergence_budget, budget_space, chosen)
    return chosen


def _resolve_fill_vcache(bundle, form: str, image, mask, noise,
                         prompt_embeds, pooled, sigmas, guidance,
                         grid_h, grid_w, tiled_vae, vae_tile, vae_overlap,
                         height, width, num_steps, strength,
                         divergence_budget: float):
    """Resolve ``"auto"`` / ``"sched:K"`` for :func:`fill_batch` via a
    one-time :func:`calibrate_fill_vcache` of THIS call's first sample,
    cached process-wide per (model, resolution, steps, strength,
    guidance, form) — strength is in the key because it trims the sigma
    schedule the anchors index into."""
    if form != "auto" and not form.startswith("sched:"):
        raise ValueError(
            f"velocity_cache_interval string form must be 'auto' or "
            f"'sched:K': {form!r}")
    key = (_params_token(bundle), height, width, num_steps,
           round(float(strength), 6), round(float(guidance), 6),
           "fill-" + form, round(float(divergence_budget), 6))
    if key not in _FILL_VCACHE_CALIBRATIONS:
        _FILL_VCACHE_CALIBRATIONS[key] = calibrate_fill_vcache(
            bundle, image, mask, noise, prompt_embeds, pooled, sigmas,
            guidance, grid_h, grid_w, form=form, tiled_vae=tiled_vae,
            vae_tile=vae_tile, vae_overlap=vae_overlap,
            divergence_budget=divergence_budget)
    return _FILL_VCACHE_CALIBRATIONS[key]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "vae_cfg", "grid_h", "grid_w", "axis",
                     "microbatches", "mesh", "d", "g", "n_stages",
                     "tiled_vae", "vae_tile", "vae_overlap",
                     "vcache_interval", "vcache_order"))
def _fill_core_pp(flux_params, doubles, singles, vae_params, image, mask,
                  noise, prompt_embeds, pooled, sigmas, guidance,
                  cfg: flux_mod.FluxConfig, vae_cfg: vae_mod.VaeConfig,
                  grid_h: int, grid_w: int, axis: str, microbatches: int,
                  mesh=None, d: int = 1, g: int = 1, n_stages: int = 1,
                  tiled_vae: bool = False, vae_tile: int = 96,
                  vae_overlap: int = 16,
                  vcache_interval: int = 1, vcache_order: int = 1):
    """:func:`_fill_core` with the transformer depth pipelined over
    ``mesh[axis]`` (parallel/pipeline_parallel.py)."""
    from ...parallel import pipeline_parallel as pp
    stages = pp.PipelineStages(doubles=doubles, singles=singles,
                               per_stage_double=d, per_stage_single=g,
                               n_stages=n_stages)
    latents, cond = _fill_conditioning(vae_params, image, mask, noise,
                                       sigmas, vae_cfg, tiled_vae,
                                       vae_tile, vae_overlap)
    img_ids = jnp.asarray(flux_mod.make_image_ids(grid_h, grid_w))
    txt_ids = jnp.asarray(flux_mod.make_text_ids(prompt_embeds.shape[1]))
    base_fn = _pp_model_fn(flux_params, stages, prompt_embeds, pooled,
                           guidance, img_ids, txt_ids, cfg, mesh, axis,
                           microbatches)
    model_fn = lambda x, sigma: base_fn(  # noqa: E731
        jnp.concatenate([x, cond], axis=-1), sigma)
    out = _pick_denoise(model_fn, latents, sigmas, vcache_interval,
                        vcache_order)
    return _decode_tokens(vae_params, out, grid_h, grid_w, vae_cfg,
                          tiled_vae, vae_tile, vae_overlap)


def fill(bundle: FluxBundle, image: np.ndarray, mask: np.ndarray,
         prompt_embeds: jax.Array, pooled: jax.Array,
         num_steps: int = 50, guidance: float = 30.0,
         strength: float = 0.75, seed: int = 0) -> np.ndarray:
    """Flux-Fill outpaint. image (H, W, 3) uint8; mask (H, W) uint8 with
    255 = repaint, 0 = keep (the compose-stage keep-mask,
    outpainting_updown_sampling_redux.py:836-870). Returns uint8 image.
    """
    out = fill_batch(bundle, image[None],
                     np.broadcast_to(mask, (1,) + mask.shape),
                     prompt_embeds, pooled, num_steps=num_steps,
                     guidance=guidance, strength=strength, seeds=[seed])
    return out[0]


def fill_batch(bundle: FluxBundle, images: np.ndarray, masks: np.ndarray,
               prompt_embeds: jax.Array, pooled: jax.Array,
               num_steps: int = 50, guidance: float = 30.0,
               strength: float = 0.75,
               seeds: Sequence[int] = (0,),
               mesh=None, data_axis: str = "data",
               pipe_axis: Optional[str] = None,
               microbatches: Optional[int] = None,
               hires_threshold_px: int = 2048 * 2048,
               vae_tile: int = 96, vae_overlap: int = 16,
               velocity_cache_interval: int = 1,
               velocity_cache_order: int = 1,
               vcache_divergence_budget: float = 0.05) -> np.ndarray:
    """Batched Fill over same-shape samples: images (B, H, W, 3) uint8,
    masks (B, H, W) uint8, prompt_embeds (B, S, D), pooled (B, P), one
    seed per row. The whole batch denoises in one compiled graph; with
    ``mesh`` the batch shards over the data axis (padded as needed).

    High-res regime (H*W >= ``hires_threshold_px``, i.e. the reference's
    >=2048 px upscale / <=2800 px cap,
    outpainting_updown_sampling_redux.py:72-82,104-108): the VAE runs
    tiled (bounded activation memory) and, when a multi-device ``mesh`` is
    given, attention rings over the data axis (sequence parallel — the
    ~31k-token joint sequence shards across chips) instead of sharding the
    tiny batch.

    ``velocity_cache_interval`` > 1 enables the velocity-extrapolation
    accelerator (_vcache_denoise): the transformer runs every N-th step
    and skipped steps integrate an extrapolated velocity — a full N× on
    the denoise, composing with DP/TP/SP and PP. EXPERIMENTAL (outputs
    change; quality curves in BENCH_NOTES.md). Forms: integer (uniform
    interval), explicit anchor tuple over this call's strength-trimmed
    step indices, ``"auto"`` (largest uniform interval within
    ``vcache_divergence_budget``, calibrated ON the fill core against
    this call's own first sample), or ``"sched:K"`` (DP-planned anchors
    at uniform-K model-call parity from a recorded fill-core velocity
    probe) — see :func:`calibrate_fill_vcache`."""
    # int = uniform interval; tuple = explicit anchor schedule over THIS
    # call's (strength-trimmed) step indices; "auto"/"sched:K" calibrate
    # on the FILL core below (fill conditioning + trimmed sigmas), not
    # the generate path.
    velocity_cache_interval = (
        tuple(int(a) for a in velocity_cache_interval)
        if isinstance(velocity_cache_interval, (list, tuple))
        else velocity_cache_interval
        if isinstance(velocity_cache_interval, str)
        else int(velocity_cache_interval))
    b, h, w = images.shape[:3]
    lf = bundle.latent_factor
    grid_h, grid_w = h // lf, w // lf
    seq = grid_h * grid_w
    hires = hires_threshold_px > 0 and h * w >= hires_threshold_px
    schedule = sched_mod.make_schedule(num_steps, image_seq_len=seq,
                                       strength=strength)
    img = jnp.asarray(from_uint8(images)).astype(bundle.compute_dtype)
    m = jnp.asarray((masks.astype(np.float32) / 255.0) > 0.5,
                    bundle.compute_dtype)
    c = bundle.vae_cfg.latent_channels * 4
    noise = jnp.stack([
        jax.random.normal(jax.random.PRNGKey(s), (seq, c), jnp.float32)
        for s in seeds]).astype(bundle.compute_dtype)
    embeds = prompt_embeds.astype(bundle.compute_dtype)
    pooled_c = pooled.astype(bundle.compute_dtype)

    if isinstance(velocity_cache_interval, str):
        velocity_cache_interval = _resolve_fill_vcache(
            bundle, velocity_cache_interval, img[:1], m[:1], noise[:1],
            embeds[:1], pooled_c[:1], jnp.asarray(schedule.sigmas),
            guidance, grid_h, grid_w, hires, vae_tile, vae_overlap,
            h, w, num_steps, strength, vcache_divergence_budget)

    n_real = b
    if pipe_axis is not None:
        # depth-sharded pipeline over mesh[pipe_axis] — the fill
        # counterpart of generate(pipe_axis=...)
        if mesh is None or mesh.shape.get(pipe_axis, 1) <= 1:
            raise ValueError("pipe_axis requires a mesh with that axis")
        if bundle.tp_mesh is not None:
            raise ValueError(
                "pipe_axis (pipeline parallelism) does not compose with a "
                "TP-sharded bundle: the PP path serves unsharded per-stage "
                "block params and would silently ignore tp_mesh. Serve "
                "with EITHER model_parallel (TP) or pipeline_parallel.")
        S = mesh.shape[pipe_axis]
        stages = _pipeline_stages(bundle, S, mesh=mesh,
                                   axis=pipe_axis)
        light = {k: v for k, v in bundle.flux_params.items()
                 if k not in ("double", "single")}
        out = _fill_core_pp(
            light, stages.doubles, stages.singles, bundle.vae_params,
            img, m, noise, embeds, pooled_c,
            jnp.asarray(schedule.sigmas), jnp.float32(guidance),
            cfg=bundle.flux_cfg, vae_cfg=bundle.vae_cfg,
            grid_h=grid_h, grid_w=grid_w, axis=pipe_axis,
            microbatches=microbatches or n_real, mesh=mesh,
            d=stages.per_stage_double, g=stages.per_stage_single,
            n_stages=S, tiled_vae=hires, vae_tile=vae_tile,
            vae_overlap=vae_overlap,
            vcache_interval=velocity_cache_interval,
            vcache_order=velocity_cache_order)
        return to_uint8(np.asarray(out, np.float32))[:n_real]
    sp_ctx = contextlib.nullcontext()
    sp_tag = "none"
    if mesh is not None and hires and mesh.shape.get(data_axis, 1) > 1:
        # sequence parallel: inputs stay replicated; ring attention
        # shards the joint sequence over the data axis inside the model
        sp_ctx = attn_mod.sp_attention(mesh, data_axis)
        sp_tag = f"sp-{data_axis}:{mesh.shape[data_axis]}"
    elif mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        d = mesh.shape[data_axis]
        pad = (-n_real) % d
        if pad:
            def pad0(x):
                return jnp.concatenate([x] + [x[:1]] * pad, axis=0)
            img, m, noise = pad0(img), pad0(m), pad0(noise)
            embeds, pooled_c = pad0(embeds), pad0(pooled_c)
        shard = NamedSharding(mesh, P(data_axis))
        img, m, noise, embeds, pooled_c = (
            jax.device_put(x, shard) for x in (img, m, noise, embeds,
                                               pooled_c))

    dp_map = (mesh is not None and not hires and bundle.tp_mesh is None
              and mesh.shape.get(data_axis, 1) > 1)
    if hires and mesh is None:
        # single-chip cap regime: staged three-executable path (the
        # one-graph core's compile-time peak exceeds HBM — see
        # _fill_core_staged)
        with _tp_context(bundle):
            out = _fill_core_staged(
                bundle.flux_params, bundle.vae_params, img, m, noise,
                embeds, pooled_c, jnp.asarray(schedule.sigmas),
                jnp.float32(guidance), cfg=bundle.flux_cfg,
                vae_cfg=bundle.vae_cfg, grid_h=grid_h, grid_w=grid_w,
                tp_tag=_tp_tag(bundle) + "/" + sp_tag,
                vae_tile=vae_tile, vae_overlap=vae_overlap,
                vcache_interval=velocity_cache_interval,
                vcache_order=velocity_cache_order)
        return to_uint8(np.asarray(out, np.float32))[:n_real]
    with _tp_context(bundle), sp_ctx:
        core = (_dp_wrap(_fill_core, mesh, data_axis, 5, 2,
                         cfg=bundle.flux_cfg, vae_cfg=bundle.vae_cfg,
                         grid_h=grid_h, grid_w=grid_w,
                         tp_tag=_tp_tag(bundle) + "/" + sp_tag,
                         tiled_vae=hires, vae_tile=vae_tile,
                         vae_overlap=vae_overlap,
                         vcache_interval=velocity_cache_interval,
                         vcache_order=velocity_cache_order)
                if dp_map else functools.partial(
                    _fill_core, cfg=bundle.flux_cfg,
                    vae_cfg=bundle.vae_cfg, grid_h=grid_h, grid_w=grid_w,
                    tp_tag=_tp_tag(bundle) + "/" + sp_tag,
                    tiled_vae=hires, vae_tile=vae_tile,
                    vae_overlap=vae_overlap,
                    vcache_interval=velocity_cache_interval,
                    vcache_order=velocity_cache_order))
        out = core(bundle.flux_params, bundle.vae_params, img, m, noise,
                   embeds, pooled_c, jnp.asarray(schedule.sigmas),
                   jnp.float32(guidance))
    return to_uint8(np.asarray(out, np.float32))[:n_real]
