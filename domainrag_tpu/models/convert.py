"""Real-checkpoint conversion: torch/safetensors state dicts -> param trees.

The reference loads everything ``from_pretrained`` local dirs
(``./model/FLUX.1-dev`` etc. — batch_generate_flux_kshot.py:21-23,117-153).
This module converts those checkpoints (diffusers/transformers layouts)
into this framework's param trees. The transformers-layout converters
(CLIP/T5/SigLIP) are parity-tested against random HF models in tests/;
the diffusers Flux transformer/VAE mappings follow the published diffusers
module layout and are shape-validated against our ``init`` trees.

No network access is assumed: all loaders take local paths.
"""

from __future__ import annotations

import contextlib
import glob
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .common import Params
from . import clip as clip_mod
from . import redux as redux_mod
from . import siglip as siglip_mod
from . import t5 as t5_mod
from .flux import model as flux_mod
from .flux import vae as vae_mod


def host_conversion():
    """Context manager: run checkpoint conversion on the HOST device.

    The converters build jnp arrays; on a TPU backend those would land
    on the chip — and the full FLUX.1 transformer is ~48 GB as f32,
    3x one v5e's HBM (caught by the round-4 full-size rehearsal,
    tools/real_weights_harness.py --full-flux-synth). Conversion +
    weight-only quantization are host jobs; only the quantized tree
    (~12 GB int8) is placed on device, by the caller
    (cli/main._quantize_runner or deploy.shard_bundle)."""
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:           # no cpu backend registered (unusual)
        return contextlib.nullcontext()
    return jax.default_device(cpu)


class _LazySafetensors:
    """Read-on-demand Mapping over one or more safetensors files.

    The eager loader materialized the FULL merged state dict; on the
    22 GB FLUX tree that dict stayed resident while the converters built
    the ~48 GB f32 param tree — measured 69.5 GB peak host RSS in the
    round-5 day-one rehearsal (tools/reports/full_flux_report.json), an
    OOM on any 64 GB host. Here each ``__getitem__`` reads exactly one
    tensor from its (kept-open) handle and nothing is cached, so the
    source tree contributes one tensor at a time to the peak. Key order
    preserves file order then per-file order (the LaMa ordered-leaves
    contract, convert_lama)."""

    def __init__(self, files):
        from safetensors import safe_open
        self._handles = [safe_open(f, framework="np") for f in files]
        self._index: Dict[str, object] = {}
        for h in self._handles:
            for k in h.keys():
                self._index[k] = h

    def __getitem__(self, key: str) -> np.ndarray:
        return self._index[key].get_tensor(key)

    def __contains__(self, key) -> bool:
        return key in self._index

    def __iter__(self):
        return iter(self._index)

    def __len__(self) -> int:
        return len(self._index)

    def keys(self):
        return self._index.keys()

    def items(self):
        return ((k, self[k]) for k in self._index)


def load_safetensors_dir(path: str, lazy: bool = True):
    """All ``*.safetensors`` under ``path`` as one mapping — lazy
    (read-on-demand, constant memory) by default; ``lazy=False``
    restores the eager merged dict."""
    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files and os.path.isfile(path):
        files = [path]
    if lazy:
        return _LazySafetensors(files)
    from safetensors import safe_open
    state: Dict[str, np.ndarray] = {}
    for file in files:
        with safe_open(file, framework="np") as f:
            for key in f.keys():
                state[key] = f.get_tensor(key)
    return state


def _w(sd, key) -> jnp.ndarray:
    return jnp.asarray(np.asarray(sd[key], np.float32))


def _lin(sd, prefix) -> Params:
    p = {"w": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32).T)}
    if f"{prefix}.bias" in sd:
        p["b"] = _w(sd, f"{prefix}.bias")
    return p


def _cat_lin(sd, prefixes) -> Params:
    """Concatenate several Linear layers along the OUTPUT dim (fused qkv)."""
    ws = [np.asarray(sd[f"{p}.weight"], np.float32).T for p in prefixes]
    out = {"w": jnp.asarray(np.concatenate(ws, axis=1))}
    if f"{prefixes[0]}.bias" in sd:
        bs = [np.asarray(sd[f"{p}.bias"], np.float32) for p in prefixes]
        out["b"] = jnp.asarray(np.concatenate(bs))
    return out


# ---------------------------------------------------------------------------
# Flux transformer (diffusers FluxTransformer2DModel layout)
# ---------------------------------------------------------------------------

def convert_flux_transformer(sd: Dict[str, np.ndarray],
                             cfg: flux_mod.FluxConfig,
                             block_transform=None) -> Params:
    """``block_transform`` (e.g. ``quant.quantize_tree``) applies to each
    double/single block subtree IMMEDIATELY after it is built, so its
    f32 arrays free before the next block converts — with the lazy
    loader this streams the 12 B tree at ~(quantized tree + one f32
    block) peak host memory instead of (source + full f32 tree)."""
    def mlp_embedder(prefix) -> Params:
        return {"in": _lin(sd, f"{prefix}.linear_1"),
                "out": _lin(sd, f"{prefix}.linear_2")}

    params: Params = {
        "img_in": _lin(sd, "x_embedder"),
        "txt_in": _lin(sd, "context_embedder"),
        "time_in": mlp_embedder("time_text_embed.timestep_embedder"),
        "vector_in": mlp_embedder("time_text_embed.text_embedder"),
        "double": [], "single": [],
    }
    if cfg.guidance_embed:
        params["guidance_in"] = mlp_embedder(
            "time_text_embed.guidance_embedder")

    tf = block_transform if block_transform is not None else (lambda x: x)
    i = 0
    while f"transformer_blocks.{i}.norm1.linear.weight" in sd:
        pre = f"transformer_blocks.{i}"
        params["double"].append(tf({
            "img_mod": _lin(sd, f"{pre}.norm1.linear"),
            "txt_mod": _lin(sd, f"{pre}.norm1_context.linear"),
            "img_qkv": _cat_lin(sd, [f"{pre}.attn.to_q", f"{pre}.attn.to_k",
                                     f"{pre}.attn.to_v"]),
            "txt_qkv": _cat_lin(sd, [f"{pre}.attn.add_q_proj",
                                     f"{pre}.attn.add_k_proj",
                                     f"{pre}.attn.add_v_proj"]),
            "img_qknorm": {"q": {"scale": _w(sd, f"{pre}.attn.norm_q.weight")},
                           "k": {"scale": _w(sd, f"{pre}.attn.norm_k.weight")}},
            "txt_qknorm": {
                "q": {"scale": _w(sd, f"{pre}.attn.norm_added_q.weight")},
                "k": {"scale": _w(sd, f"{pre}.attn.norm_added_k.weight")}},
            "img_proj": _lin(sd, f"{pre}.attn.to_out.0"),
            "txt_proj": _lin(sd, f"{pre}.attn.to_add_out"),
            "img_mlp1": _lin(sd, f"{pre}.ff.net.0.proj"),
            "img_mlp2": _lin(sd, f"{pre}.ff.net.2"),
            "txt_mlp1": _lin(sd, f"{pre}.ff_context.net.0.proj"),
            "txt_mlp2": _lin(sd, f"{pre}.ff_context.net.2"),
        }))
        i += 1
    i = 0
    while f"single_transformer_blocks.{i}.norm.linear.weight" in sd:
        pre = f"single_transformer_blocks.{i}"
        params["single"].append(tf({
            "mod": _lin(sd, f"{pre}.norm.linear"),
            "linear1": _cat_lin(sd, [f"{pre}.attn.to_q", f"{pre}.attn.to_k",
                                     f"{pre}.attn.to_v", f"{pre}.proj_mlp"]),
            "linear2": _lin(sd, f"{pre}.proj_out"),
            "qknorm": {"q": {"scale": _w(sd, f"{pre}.attn.norm_q.weight")},
                       "k": {"scale": _w(sd, f"{pre}.attn.norm_k.weight")}},
        }))
        i += 1

    # diffusers AdaLayerNormContinuous emits (scale, shift); our final layer
    # consumes (shift, scale) — swap the halves.
    w = np.asarray(sd["norm_out.linear.weight"], np.float32).T
    b = np.asarray(sd["norm_out.linear.bias"], np.float32)
    h = w.shape[1] // 2
    params["final_mod"] = {
        "w": jnp.asarray(np.concatenate([w[:, h:], w[:, :h]], axis=1)),
        "b": jnp.asarray(np.concatenate([b[h:], b[:h]])),
    }
    params["final_proj"] = _lin(sd, "proj_out")
    return params


# ---------------------------------------------------------------------------
# Flux VAE (diffusers AutoencoderKL layout)
# ---------------------------------------------------------------------------

def _conv(sd, prefix) -> Params:
    w = np.asarray(sd[f"{prefix}.weight"], np.float32)  # (O, I, kh, kw)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
    if f"{prefix}.bias" in sd:
        p["b"] = _w(sd, f"{prefix}.bias")
    return p


def _gn(sd, prefix) -> Params:
    return {"scale": _w(sd, f"{prefix}.weight"),
            "bias": _w(sd, f"{prefix}.bias")}


def _vae_resnet(sd, prefix) -> Params:
    p = {"norm1": _gn(sd, f"{prefix}.norm1"),
         "conv1": _conv(sd, f"{prefix}.conv1"),
         "norm2": _gn(sd, f"{prefix}.norm2"),
         "conv2": _conv(sd, f"{prefix}.conv2")}
    if f"{prefix}.conv_shortcut.weight" in sd:
        p["shortcut"] = _conv(sd, f"{prefix}.conv_shortcut")
    return p


def _vae_attn(sd, prefix) -> Params:
    def lin_as_conv(name):
        w = np.asarray(sd[f"{prefix}.{name}.weight"], np.float32)
        if w.ndim == 2:  # Linear (out, in) -> 1x1 conv HWIO
            w = w.T[None, None]
        else:
            w = w.transpose(2, 3, 1, 0)
        p = {"w": jnp.asarray(w)}
        if f"{prefix}.{name}.bias" in sd:
            p["b"] = _w(sd, f"{prefix}.{name}.bias")
        return p

    return {"norm": _gn(sd, f"{prefix}.group_norm"),
            "q": lin_as_conv("to_q"), "k": lin_as_conv("to_k"),
            "v": lin_as_conv("to_v"), "o": lin_as_conv("to_out.0")}


def convert_flux_vae(sd: Dict[str, np.ndarray],
                     cfg: vae_mod.VaeConfig) -> Params:
    enc: Params = {"conv_in": _conv(sd, "encoder.conv_in"), "down": []}
    i = 0
    while f"encoder.down_blocks.{i}.resnets.0.norm1.weight" in sd:
        pre = f"encoder.down_blocks.{i}"
        stage = {"res": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            stage["res"].append(_vae_resnet(sd, f"{pre}.resnets.{j}"))
            j += 1
        if f"{pre}.downsamplers.0.conv.weight" in sd:
            stage["down"] = _conv(sd, f"{pre}.downsamplers.0.conv")
        enc["down"].append(stage)
        i += 1
    enc["mid"] = {
        "res1": _vae_resnet(sd, "encoder.mid_block.resnets.0"),
        "attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "res2": _vae_resnet(sd, "encoder.mid_block.resnets.1"),
    }
    enc["norm_out"] = _gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Params = {"conv_in": _conv(sd, "decoder.conv_in"),
                   "mid": {
                       "res1": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
                       "attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
                       "res2": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
                   },
                   "up": []}
    i = 0
    while f"decoder.up_blocks.{i}.resnets.0.norm1.weight" in sd:
        pre = f"decoder.up_blocks.{i}"
        stage = {"res": []}
        j = 0
        while f"{pre}.resnets.{j}.norm1.weight" in sd:
            stage["res"].append(_vae_resnet(sd, f"{pre}.resnets.{j}"))
            j += 1
        if f"{pre}.upsamplers.0.conv.weight" in sd:
            stage["up"] = _conv(sd, f"{pre}.upsamplers.0.conv")
        dec["up"].append(stage)
        i += 1
    dec["norm_out"] = _gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# full-deployment loader
# ---------------------------------------------------------------------------

def default_configs(fill: bool = False) -> dict:
    """Production model configs per checkpoint subdir; the real-weights
    harness overrides these with tiny configs for its self-test mode."""
    return {
        "flux": flux_mod.FLUX_FILL_DEV if fill else flux_mod.FLUX_DEV,
        "vae": vae_mod.FLUX_VAE,
        "t5": t5_mod.T5_XXL,
        "clip_text": clip_mod.ClipTextConfig(),
        "siglip": siglip_mod.SIGLIP_SO400M,
        "redux": redux_mod.REDUX_DEV,
    }


def load_flux_bundle(checkpoints_dir: str, fill: bool = False,
                     compute_dtype=jnp.bfloat16,
                     configs: Optional[dict] = None):
    """Build a FluxBundle from a converted checkpoint tree:

    {checkpoints_dir}/
      flux-dev/ (or flux-fill/)  transformer safetensors
      vae/  t5/  clip-text/  siglip/  redux/  (safetensors each)
      tokenizer dirs per HF layout (optional; stub tokenizers otherwise)

    ``configs`` overrides the production model configs (keys of
    :func:`default_configs`) — used by the real-weights harness self-test.
    """
    from ..core import text as text_util
    from .flux import pipeline as flux_pipeline

    c = dict(default_configs(fill))
    c.update(configs or {})
    name = "flux-fill" if fill else "flux-dev"
    with host_conversion():
        flux_params = convert_flux_transformer(
            load_safetensors_dir(os.path.join(checkpoints_dir, name)),
            c["flux"])
        vae_params = convert_flux_vae(
            load_safetensors_dir(os.path.join(checkpoints_dir, "vae")),
            c["vae"])
        t5_params = t5_mod.convert_hf_t5(
            load_safetensors_dir(os.path.join(checkpoints_dir, "t5")),
            c["t5"])
        clip_params = clip_mod.convert_hf_clip_text(
            load_safetensors_dir(os.path.join(checkpoints_dir,
                                              "clip-text")),
            c["clip_text"])
        siglip_params = siglip_mod.convert_hf_siglip(
            load_safetensors_dir(os.path.join(checkpoints_dir, "siglip")),
            c["siglip"])
        redux_params = redux_mod.convert_hf_redux(
            load_safetensors_dir(os.path.join(checkpoints_dir, "redux")))
    try:
        clip_tok, t5_tok = text_util.load_hf_tokenizers(checkpoints_dir)
    except Exception:
        cv = c["clip_text"].vocab_size
        clip_tok = text_util.StubTokenizer(vocab_size=cv, bos_id=cv - 2,
                                           eos_id=cv - 1)
        t5_tok = text_util.StubTokenizer(vocab_size=c["t5"].vocab_size,
                                         bos_id=None, eos_id=1)
    return flux_pipeline.FluxBundle(
        flux_params=flux_params, flux_cfg=c["flux"],
        vae_params=vae_params, vae_cfg=c["vae"],
        t5_params=t5_params, t5_cfg=c["t5"],
        clip_text_params=clip_params, clip_text_cfg=c["clip_text"],
        siglip_params=siglip_params, siglip_cfg=c["siglip"],
        redux_params=redux_params, redux_cfg=c["redux"],
        clip_tokenizer=clip_tok, t5_tokenizer=t5_tok,
        t5_max_len=c.get("t5_max_len", 512),
        clip_max_len=min(77, c["clip_text"].max_len),
        compute_dtype=compute_dtype)


def build_runner_from_checkpoints(checkpoints_dir: str, cfg,
                                  corpus_sources: Optional[dict] = None,
                                  configs: Optional[dict] = None):
    """PipelineRunner with real weights (CLI --checkpoints).

    ``configs`` may additionally carry "clip_vision" / "lama" overrides."""
    from ..pipeline.orchestrator import PipelineRunner
    from ..stages import inpaint as inpaint_stage
    from ..stages.encoders import ClipImageEncoder, StyleEncoder
    from . import lama as lama_mod
    from . import resnet_stem

    configs = configs or {}
    clip_vision_cfg = configs.get("clip_vision", clip_mod.ClipVisionConfig())
    lama_cfg = configs.get("lama", lama_mod.BIG_LAMA)
    with host_conversion():
        clip_vision = clip_mod.convert_hf_clip_vision(
            load_safetensors_dir(os.path.join(checkpoints_dir,
                                              "clip-vision")),
            clip_vision_cfg)
        stem_sd = load_safetensors_dir(os.path.join(checkpoints_dir,
                                                    "resnet-stem"))
        stem_params = resnet_stem.convert_torch_stem(
            stem_sd["conv1.weight"], stem_sd["bn1.weight"],
            stem_sd["bn1.bias"], stem_sd["bn1.running_mean"],
            stem_sd["bn1.running_var"])
        lama_sd = load_safetensors_dir(os.path.join(checkpoints_dir,
                                                    "lama"))
        lama_params = convert_lama(lama_sd, lama_cfg)
    return PipelineRunner(
        cfg=cfg,
        lama_runner=inpaint_stage.LamaRunner(lama_params, lama_cfg),
        clip_encoder=ClipImageEncoder(clip_vision, clip_vision_cfg),
        style_encoder=StyleEncoder(stem_params),
        flux_bundle=load_flux_bundle(checkpoints_dir, fill=False,
                                     configs=configs),
        fill_bundle=load_flux_bundle(checkpoints_dir, fill=True,
                                     configs=configs),
        corpus_sources=corpus_sources or {},
    )


def lama_leaf_order(params) -> list:
    """Deterministic topological walk of a LaMa param tree: (path, leaf)
    pairs in module order (the order a torch Sequential export emits)."""
    out = []

    def walk(node, path):
        if isinstance(node, dict):
            # fixed intra-module order mirroring torch module ordering
            order = ["w", "b", "scale", "bias", "mean", "var",
                     "l2l", "l2g", "g2l", "g2g", "bn_l", "bn_g",
                     "conv1", "bn1", "fu", "conv2", "conv", "bn",
                     "stem", "down", "blocks", "up", "head"]
            keys = sorted(node.keys(),
                          key=lambda k: (order.index(k)
                                         if k in order else len(order), k))
            for k in keys:
                walk(node[k], path + (k,))
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + (i,))
        else:
            out.append((path, node))

    walk(params, ())
    return out


def convert_lama(sd: Dict[str, np.ndarray], cfg) -> Params:
    """big-lama generator state dict -> param tree, by ORDERED shape
    matching (the TorchScript export's parameter names vary by export, but
    ``state_dict()`` iteration follows module order, which matches our
    topological walk).

    Every source tensor must match the next expected leaf's torch-layout
    shape (convs transpose (O, I, kh, kw) <-> HWIO, linear-like 1x1s
    included; 0-d entries like num_batches_tracked are skipped), otherwise
    conversion aborts with the offending key — no silent misassignment.
    Validated by round-trip in tests/test_convert.py."""
    import jax

    from . import lama as lama_mod

    template = jax.eval_shape(
        lambda k: lama_mod.init(k, cfg), jax.random.PRNGKey(0))
    expected = lama_leaf_order(template)

    tensors = [(k, np.asarray(v, np.float32)) for k, v in sd.items()
               if getattr(v, "ndim", np.asarray(v).ndim) > 0]
    if len(tensors) != len(expected):
        raise ValueError(
            f"source has {len(tensors)} tensors, template expects "
            f"{len(expected)}")

    leaves = {}
    for (path, spec), (key, tensor) in zip(expected, tensors):
        if len(spec.shape) == 4:  # conv HWIO expected; torch is (O,I,kh,kw)
            torch_shape = (spec.shape[3], spec.shape[2], spec.shape[0],
                           spec.shape[1])
            if tensor.shape != torch_shape:
                raise ValueError(
                    f"{key}: shape {tensor.shape} does not match expected "
                    f"conv {torch_shape} for {path}")
            value = tensor.transpose(2, 3, 1, 0)
        else:
            if tensor.shape != spec.shape:
                raise ValueError(
                    f"{key}: shape {tensor.shape} != expected "
                    f"{spec.shape} for {path}")
            value = tensor
        leaves[path] = jnp.asarray(value)

    def rebuild(node, path):
        if isinstance(node, dict):
            return {k: rebuild(v, path + (k,)) for k, v in node.items()}
        if isinstance(node, list):
            return [rebuild(v, path + (i,)) for i, v in enumerate(node)]
        return leaves[path]

    return rebuild(template, ())
