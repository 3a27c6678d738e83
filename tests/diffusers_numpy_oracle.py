"""Independent numpy oracle of the diffusers ``FluxTransformer2DModel``.

Written from the PUBLISHED diffusers module semantics (diffusers
``models/transformers/transformer_flux.py``, ``models/embeddings.py``,
``models/normalization.py``, ``models/attention_processor.py`` — the
layers the reference drives via ``FluxPipeline``/``FluxFillPipeline``,
/root/reference/batch_generate_flux_kshot.py:148-151 and
/root/reference/outpainting_updown_sampling_redux.py:534-541) — NOT from
this repo's ``models/convert.py`` or ``models/flux/model.py``.  It
consumes a diffusers-layout state dict directly (torch ``(out, in)``
Linear weights, diffusers key names), so it shares no code or mapping
assumptions with the converter under test.

Purpose (VERDICT r2 item 3): the Flux weight converter was previously
validated only by round-trip against this repo's own exporter — both
sides encode the same conventions, so a flipped convention (the
``norm_out`` scale/shift order, the fused-qkv concat order, the RoPE
pairing, the ``_pack_latents`` feature order) would pass every test and
silently ruin real-weight inference.  tests/test_flux_oracle.py runs a
random tiny diffusers-layout checkpoint through THIS oracle and through
``convert_flux_transformer`` + ``flux.apply`` and demands agreement.

Everything is float64 numpy; semantics over speed.
"""

from __future__ import annotations

import numpy as np


# ---------------------------------------------------------------------------
# diffusers building blocks (published semantics)
# ---------------------------------------------------------------------------

def linear(sd, prefix, x):
    """torch nn.Linear: y = x @ W^T + b, W stored (out, in)."""
    y = x @ np.asarray(sd[f"{prefix}.weight"], np.float64).T
    if f"{prefix}.bias" in sd:
        y = y + np.asarray(sd[f"{prefix}.bias"], np.float64)
    return y


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu_tanh(x):
    # torch nn.GELU(approximate="tanh")
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def layer_norm(x, eps=1e-6):
    """LayerNorm(elementwise_affine=False) as used by AdaLayerNorm*."""
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps)


def rms_norm(x, weight, eps=1e-6):
    """diffusers RMSNorm (attn.norm_q / norm_k), per-head over head_dim."""
    var = np.mean(x ** 2, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * np.asarray(weight, np.float64)


def get_timestep_embedding(timesteps, embedding_dim,
                           flip_sin_to_cos=True,
                           downscale_freq_shift=0.0,
                           max_period=10000):
    """diffusers ``embeddings.get_timestep_embedding`` — the ``Timesteps``
    module inside ``CombinedTimestepGuidanceTextProjEmbeddings`` is
    constructed with flip_sin_to_cos=True, downscale_freq_shift=0."""
    half_dim = embedding_dim // 2
    exponent = -np.log(max_period) * np.arange(half_dim, dtype=np.float64)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = np.exp(exponent)[None, :] * np.asarray(timesteps,
                                                 np.float64)[:, None]
    emb = np.concatenate([np.sin(emb), np.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = np.concatenate([emb[:, half_dim:], emb[:, :half_dim]],
                             axis=-1)
    return emb


def time_text_embed(sd, timestep, guidance, pooled, time_embed_dim):
    """CombinedTimestepGuidanceTextProjEmbeddings.forward."""
    t_proj = get_timestep_embedding(timestep, time_embed_dim)
    t_emb = linear(sd, "time_text_embed.timestep_embedder.linear_2",
                   silu(linear(sd,
                               "time_text_embed.timestep_embedder.linear_1",
                               t_proj)))
    cond = t_emb
    if guidance is not None:
        g_proj = get_timestep_embedding(guidance, time_embed_dim)
        g_emb = linear(
            sd, "time_text_embed.guidance_embedder.linear_2",
            silu(linear(sd, "time_text_embed.guidance_embedder.linear_1",
                        g_proj)))
        cond = cond + g_emb
    # PixArtAlphaTextProjection(act_fn="silu")
    p_emb = linear(sd, "time_text_embed.text_embedder.linear_2",
                   silu(linear(sd, "time_text_embed.text_embedder.linear_1",
                               pooled)))
    return cond + p_emb


def flux_pos_embed(ids, axes_dim, theta=10000):
    """FluxPosEmbed: per-axis rotary tables, cos/sin repeat_interleaved
    over consecutive channel pairs, concatenated across axes.
    Returns (cos, sin) of shape (S, sum(axes_dim))."""
    cos_out, sin_out = [], []
    for i, dim in enumerate(axes_dim):
        pos = np.asarray(ids[..., i], np.float64)
        freqs = 1.0 / (theta ** (np.arange(0, dim, 2,
                                           dtype=np.float64) / dim))
        out = pos[..., None] * freqs[None, :]        # (S, dim/2)
        cos_out.append(np.repeat(np.cos(out), 2, axis=-1))
        sin_out.append(np.repeat(np.sin(out), 2, axis=-1))
    return (np.concatenate(cos_out, axis=-1),
            np.concatenate(sin_out, axis=-1))


def apply_rotary_emb(x, cos, sin):
    """diffusers ``apply_rotary_emb`` with use_real=True,
    use_real_unbind_dim=-1: x is (B, H, S, D); rotate-half over
    consecutive pairs."""
    x_real = x[..., 0::2]
    x_imag = x[..., 1::2]
    x_rotated = np.stack([-x_imag, x_real], axis=-1).reshape(x.shape)
    return x * cos + x_rotated * sin


def sdpa(q, k, v):
    """torch scaled_dot_product_attention (no mask)."""
    scale = 1.0 / np.sqrt(q.shape[-1])
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * scale
    logits = logits - logits.max(-1, keepdims=True)
    w = np.exp(logits)
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bhqk,bhkd->bhqd", w, v)


def _heads(x, num_heads):
    b, s, _ = x.shape
    return x.reshape(b, s, num_heads, -1).transpose(0, 2, 1, 3)


def _unheads(x):
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def joint_attention(sd, pre, img, txt, rope, num_heads):
    """FluxAttnProcessor2_0 with encoder_hidden_states: joint attention
    over [text; image], RMS qk-norm per head, rotary on the joint
    sequence.  Returns (img_attn_after_to_out, txt_attn_after_to_add_out).
    """
    cos, sin = rope
    q = _heads(linear(sd, f"{pre}.attn.to_q", img), num_heads)
    k = _heads(linear(sd, f"{pre}.attn.to_k", img), num_heads)
    v = _heads(linear(sd, f"{pre}.attn.to_v", img), num_heads)
    q = rms_norm(q, sd[f"{pre}.attn.norm_q.weight"])
    k = rms_norm(k, sd[f"{pre}.attn.norm_k.weight"])

    tq = _heads(linear(sd, f"{pre}.attn.add_q_proj", txt), num_heads)
    tk = _heads(linear(sd, f"{pre}.attn.add_k_proj", txt), num_heads)
    tv = _heads(linear(sd, f"{pre}.attn.add_v_proj", txt), num_heads)
    tq = rms_norm(tq, sd[f"{pre}.attn.norm_added_q.weight"])
    tk = rms_norm(tk, sd[f"{pre}.attn.norm_added_k.weight"])

    # text tokens FIRST in the joint sequence
    q = np.concatenate([tq, q], axis=2)
    k = np.concatenate([tk, k], axis=2)
    v = np.concatenate([tv, v], axis=2)
    q = apply_rotary_emb(q, cos, sin)
    k = apply_rotary_emb(k, cos, sin)

    out = _unheads(sdpa(q, k, v))
    t_len = txt.shape[1]
    txt_attn, img_attn = out[:, :t_len], out[:, t_len:]
    return (linear(sd, f"{pre}.attn.to_out.0", img_attn),
            linear(sd, f"{pre}.attn.to_add_out", txt_attn))


def double_block(sd, i, img, txt, temb, rope, num_heads):
    """FluxTransformerBlock.forward."""
    pre = f"transformer_blocks.{i}"
    # AdaLayerNormZero: 6-way chunk (shift, scale, gate) x (msa, mlp)
    emb = linear(sd, f"{pre}.norm1.linear", silu(temb))
    (shift_msa, scale_msa, gate_msa,
     shift_mlp, scale_mlp, gate_mlp) = np.split(emb, 6, axis=-1)
    emb_c = linear(sd, f"{pre}.norm1_context.linear", silu(temb))
    (c_shift_msa, c_scale_msa, c_gate_msa,
     c_shift_mlp, c_scale_mlp, c_gate_mlp) = np.split(emb_c, 6, axis=-1)

    norm_img = layer_norm(img) * (1 + scale_msa[:, None]) \
        + shift_msa[:, None]
    norm_txt = layer_norm(txt) * (1 + c_scale_msa[:, None]) \
        + c_shift_msa[:, None]

    img_attn, txt_attn = joint_attention(sd, pre, norm_img, norm_txt,
                                         rope, num_heads)
    img = img + gate_msa[:, None] * img_attn
    txt = txt + c_gate_msa[:, None] * txt_attn

    norm_img = layer_norm(img) * (1 + scale_mlp[:, None]) \
        + shift_mlp[:, None]
    ff = linear(sd, f"{pre}.ff.net.2",
                gelu_tanh(linear(sd, f"{pre}.ff.net.0.proj", norm_img)))
    img = img + gate_mlp[:, None] * ff

    norm_txt = layer_norm(txt) * (1 + c_scale_mlp[:, None]) \
        + c_shift_mlp[:, None]
    ff_c = linear(sd, f"{pre}.ff_context.net.2",
                  gelu_tanh(linear(sd, f"{pre}.ff_context.net.0.proj",
                                   norm_txt)))
    txt = txt + c_gate_mlp[:, None] * ff_c
    return img, txt


def single_block(sd, i, x, temb, rope, num_heads):
    """FluxSingleTransformerBlock.forward (attention WITHOUT to_out;
    concat [attn, mlp] -> proj_out, gated residual)."""
    pre = f"single_transformer_blocks.{i}"
    cos, sin = rope
    emb = linear(sd, f"{pre}.norm.linear", silu(temb))
    shift_msa, scale_msa, gate = np.split(emb, 3, axis=-1)
    norm_x = layer_norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]

    mlp_h = gelu_tanh(linear(sd, f"{pre}.proj_mlp", norm_x))

    q = _heads(linear(sd, f"{pre}.attn.to_q", norm_x), num_heads)
    k = _heads(linear(sd, f"{pre}.attn.to_k", norm_x), num_heads)
    v = _heads(linear(sd, f"{pre}.attn.to_v", norm_x), num_heads)
    q = rms_norm(q, sd[f"{pre}.attn.norm_q.weight"])
    k = rms_norm(k, sd[f"{pre}.attn.norm_k.weight"])
    q = apply_rotary_emb(q, cos, sin)
    k = apply_rotary_emb(k, cos, sin)
    attn = _unheads(sdpa(q, k, v))

    out = linear(sd, f"{pre}.proj_out",
                 np.concatenate([attn, mlp_h], axis=-1))
    return x + gate[:, None] * out


def flux_forward(sd, img_tokens, txt_tokens, pooled, timestep,
                 img_ids, txt_ids, *, num_layers, num_single_layers,
                 num_heads, axes_dim, time_embed_dim,
                 guidance=None, theta=10000):
    """FluxTransformer2DModel.forward (numpy, float64).

    ``timestep``/``guidance`` in the pipeline convention (sigma in [0,1],
    raw guidance scale) — the transformer multiplies both by 1000 before
    the sinusoidal embedding.
    """
    img = linear(sd, "x_embedder", np.asarray(img_tokens, np.float64))
    txt = linear(sd, "context_embedder", np.asarray(txt_tokens, np.float64))

    temb = time_text_embed(
        sd, np.asarray(timestep, np.float64) * 1000.0,
        None if guidance is None
        else np.asarray(guidance, np.float64) * 1000.0,
        np.asarray(pooled, np.float64), time_embed_dim)

    ids = np.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = flux_pos_embed(ids, axes_dim, theta)
    rope = (cos[None, None], sin[None, None])

    for i in range(num_layers):
        img, txt = double_block(sd, i, img, txt, temb, rope, num_heads)

    x = np.concatenate([txt, img], axis=1)
    for i in range(num_single_layers):
        x = single_block(sd, i, x, temb, rope, num_heads)
    img = x[:, txt.shape[1]:]

    # AdaLayerNormContinuous: chunk order is (scale, shift) — the
    # convention the converter must swap for our (shift, scale) layer
    emb = linear(sd, "norm_out.linear", silu(temb))
    scale, shift = np.split(emb, 2, axis=-1)
    img = layer_norm(img) * (1 + scale[:, None]) + shift[:, None]
    return linear(sd, "proj_out", img)


# ---------------------------------------------------------------------------
# latent packing (FluxPipeline._pack_latents / _unpack_latents, NCHW)
# ---------------------------------------------------------------------------

def pack_latents_nchw(latents):
    """(B, C, H, W) -> (B, H/2*W/2, C*4): view(B, C, H//2, 2, W//2, 2)
    .permute(0, 2, 4, 1, 3, 5).reshape(...)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latents_nchw(tokens, h, w):
    """Inverse of :func:`pack_latents_nchw` -> (B, C, h, w) with h, w the
    FULL latent dims (diffusers passes pixel dims / vae_scale_factor)."""
    b, s, d = tokens.shape
    c = d // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)
