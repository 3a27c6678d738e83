"""Pipeline parallelism for the Flux MMDiT over a ``pipe`` mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2C: "PP: No");
round 1 documented it out of scope. This module implements it anyway for
depth-sharded serving: with S pipeline stages each device holds only
57/S of the transformer blocks (ceil(19/S) double + ceil(38/S) single),
so the bf16 12B model serves on a v5e-8 without tensor-parallel weight
splits (24 GB / 8 ≈ 3 GB of blocks per chip) and composes with DP/TP on
the other mesh axes.

Schedule: GPipe-style microbatching with an interleaved two-loop ring
(Megatron "virtual pipeline" with 2 virtual stages per device). The
57-block chain is two homogeneous regions — 19 double blocks then 38
single blocks — so device s holds double-chunk s AND single-chunk s, and
every microbatch makes two trips around the ring:

    dev0(d0) → dev1(d1) → … → devS-1(dS-1)   # doubles loop (slot A)
      ↘ crossover at dev0 ↙
    dev0(s0) → dev1(s1) → … → devS-1(sS-1)   # singles loop (slot B)

Each step every device processes one activation per slot (its double
chunk on slot A, its single chunk on slot B) and ``ppermute``s both
forward — full steady-state utilization, bubbles only during ramp
up/down: M microbatches finish in M + 2S steps.

Depth padding: chunks are equalized by appending ALL-ZERO blocks. Under
the gated-residual block structure a zero block is an exact identity
(modulation → gates are 0.0, and ``x + 0.0·f(x) == x`` bitwise), so the
pipelined forward is bit-equal to the unsharded one — asserted in
tests/test_pipeline_parallel.py on the 8-device CPU mesh.

Embedders and the final modulation/projection run outside the shard_map
(replicated; ≪1 % of FLOPs). Inference-only: the serving path has no VJP
(training uses FSDP/TP — train/).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.flux import model as flux


# ---------------------------------------------------------------------------
# stage preparation
# ---------------------------------------------------------------------------

def _zero_block_like(block):
    return jax.tree_util.tree_map(jnp.zeros_like, block)


def _stack_blocks(blocks):
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


@dataclasses.dataclass(frozen=True)
class PipelineStages:
    """Stacked, depth-padded block params ready for the pipe axis."""
    doubles: dict          # leaves (S*d, ...)
    singles: dict          # leaves (S*g, ...)
    per_stage_double: int  # d
    per_stage_single: int  # g
    n_stages: int


def prepare_stages(params, n_stages: int, mesh: Optional[Mesh] = None,
                   axis: str = "pipe") -> PipelineStages:
    """Pad both block lists to a multiple of ``n_stages`` with exact
    identity (all-zero) blocks and stack them for P('pipe') sharding.

    Pass ``mesh`` to place each stacked leaf SHARDED over the pipe axis
    at creation time — without it the full stack materializes on the
    default device first, which defeats the depth-sharding memory goal
    at real model scale (12B bf16 blocks ≈ 24 GB > one chip's HBM)."""
    doubles = list(params["double"])
    singles = list(params["single"])
    d = -(-len(doubles) // n_stages)
    g = -(-len(singles) // n_stages)
    doubles += [_zero_block_like(doubles[0])] * (n_stages * d - len(doubles))
    singles += [_zero_block_like(singles[0])] * (n_stages * g - len(singles))
    stacked_d = _stack_blocks(doubles)
    stacked_s = _stack_blocks(singles)
    if mesh is not None:
        from jax.sharding import NamedSharding
        shard = NamedSharding(mesh, P(axis))
        place = lambda l: jax.device_put(l, shard)  # noqa: E731
        stacked_d = jax.tree_util.tree_map(place, stacked_d)
        stacked_s = jax.tree_util.tree_map(place, stacked_s)
    return PipelineStages(doubles=stacked_d, singles=stacked_s,
                          per_stage_double=d, per_stage_single=g,
                          n_stages=n_stages)


# ---------------------------------------------------------------------------
# pipelined forward
# ---------------------------------------------------------------------------

def pipelined_apply(params, stages: PipelineStages,
                    img_tokens: jax.Array, txt_tokens: jax.Array,
                    pooled: jax.Array, timestep: jax.Array,
                    img_ids: jax.Array, txt_ids: jax.Array,
                    cfg: flux.FluxConfig,
                    mesh: Mesh, axis: str = "pipe",
                    guidance: Optional[jax.Array] = None,
                    microbatches: Optional[int] = None) -> jax.Array:
    """Bit-equal :func:`flux.apply` with the 57 blocks pipelined over
    ``mesh[axis]``. ``params`` supplies the (replicated, tiny) embedder
    and final-layer weights; ``stages`` the stacked blocks. The batch is
    split into ``microbatches`` (default: one per batch row)."""
    S = mesh.shape[axis]
    b = img_tokens.shape[0]
    m_count = microbatches or b
    if b % m_count:
        raise ValueError(f"batch {b} not divisible into {m_count} "
                         "microbatches")
    mb = b // m_count
    dtype = img_tokens.dtype
    t_len = txt_tokens.shape[1]

    # ---- embedders (outside the pipeline; ≪1 % of FLOPs) ----
    from ..models.common import linear
    img = linear(params["img_in"], img_tokens)
    txt = linear(params["txt_in"], txt_tokens.astype(dtype))
    vec = flux._mlp_embedder(
        params["time_in"],
        flux.timestep_embedding(timestep, cfg.time_embed_dim).astype(dtype))
    if cfg.guidance_embed:
        if guidance is None:
            raise ValueError("flux-dev requires a guidance value")
        vec = vec + flux._mlp_embedder(
            params["guidance_in"],
            flux.timestep_embedding(guidance,
                                    cfg.time_embed_dim).astype(dtype))
    vec = vec + flux._mlp_embedder(params["vector_in"], pooled.astype(dtype))

    ids = jnp.concatenate([txt_ids, img_ids], axis=0)
    cos, sin = flux.rope_cos_sin(ids, cfg.axes_dim, cfg.theta)
    cos, sin = cos[None, None], sin[None, None]

    x = jnp.concatenate([txt, img], axis=1)          # BFL order: text first
    seq, h = x.shape[1], x.shape[2]
    xs = x.reshape(m_count, mb, seq, h)
    vecs = vec.reshape(m_count, mb, h)

    def run_doubles(chunk, x, v):
        img, txt = x[:, t_len:], x[:, :t_len]

        def body(carry, bp):
            i, t = carry
            i, t = flux._double_block(bp, i, t, v, cos, sin, cfg)
            return (i, t), None

        (img, txt), _ = jax.lax.scan(body, (img, txt), chunk)
        return jnp.concatenate([txt, img], axis=1)

    def run_singles(chunk, x, v):
        def body(xc, bp):
            return flux._single_block(bp, xc, v, cos, sin, cfg), None

        x, _ = jax.lax.scan(body, x, chunk)
        return x

    total_steps = m_count + 2 * S
    perm = [(i, (i + 1) % S) for i in range(S)]

    def stage_program(doubles, singles, xs, vecs):
        # local chunks after the pipe split: leaves (d, ...) / (g, ...)
        idx = jax.lax.axis_index(axis)
        is_first = (idx == 0)

        a0 = jnp.zeros((mb, seq, h), dtype)          # doubles-loop slot
        a1 = jnp.zeros((mb, seq, h), dtype)          # singles-loop slot
        v0 = jnp.zeros((mb, h), dtype)
        v1 = jnp.zeros((mb, h), dtype)
        # NB: every stage carries the full (M, mb, seq, h) collection
        # buffer though only stage 0's is meaningful — (S-1)/S of this
        # allocation is waste (~28 MB per 1024 px microbatch). Accepted
        # for schedule simplicity; a final ppermute-to-stage-0 collect
        # would eliminate it if activation memory ever becomes the bound.
        out = jnp.zeros((m_count, mb, seq, h), dtype)

        def step(t, carry):
            a0, a1, v0, v1, out = carry
            # -- route incoming buffers (set by the previous permute) --
            m_out = t - 2 * S                        # finished microbatch
            m_out_c = jnp.clip(m_out, 0, m_count - 1)
            valid_out = jnp.logical_and(m_out >= 0, m_out < m_count)
            collected = jnp.where(
                jnp.logical_and(is_first, valid_out), a1,
                jax.lax.dynamic_index_in_dim(out, m_out_c, 0,
                                             keepdims=False))
            out = jax.lax.dynamic_update_index_in_dim(out, collected,
                                                      m_out_c, 0)
            # crossover at device 0: doubles tail -> singles head;
            # fresh input into the doubles head
            m_in = jnp.clip(t, 0, m_count - 1)
            fresh_x = jax.lax.dynamic_index_in_dim(xs, m_in, 0,
                                                   keepdims=False)
            fresh_v = jax.lax.dynamic_index_in_dim(vecs, m_in, 0,
                                                   keepdims=False)
            a1 = jnp.where(is_first, a0, a1)
            v1 = jnp.where(is_first, v0, v1)
            a0 = jnp.where(is_first, fresh_x, a0)
            v0 = jnp.where(is_first, fresh_v, v0)
            # -- compute both virtual stages, gated on slot validity --
            # the slot schedule is deterministic: stage idx's doubles slot
            # holds microbatch (t - idx), its singles slot (t - S - idx);
            # outside [0, m_count) the slot carries warmup/drain ghosts.
            # lax.cond genuinely skips the branch on TPU, so the drain
            # phase stops burning 2S full-stage computations per forward
            # (ADVICE r2); the ppermutes below stay unconditional — every
            # device must join each step's collectives.
            m_d = t - idx
            m_s = t - S - idx
            valid_d = jnp.logical_and(m_d >= 0, m_d < m_count)
            valid_s = jnp.logical_and(m_s >= 0, m_s < m_count)
            a0 = jax.lax.cond(
                valid_d, lambda a, v: run_doubles(doubles, a, v),
                lambda a, v: a, a0, v0)
            a1 = jax.lax.cond(
                valid_s, lambda a, v: run_singles(singles, a, v),
                lambda a, v: a, a1, v1)
            # -- advance the ring --
            a0 = jax.lax.ppermute(a0, axis, perm)
            a1 = jax.lax.ppermute(a1, axis, perm)
            v0 = jax.lax.ppermute(v0, axis, perm)
            v1 = jax.lax.ppermute(v1, axis, perm)
            return a0, a1, v0, v1, out

        carry = (a0, a1, v0, v1, out)
        carry = jax.lax.fori_loop(0, total_steps, step, carry)
        return carry[4][None]                        # (1, M, mb, seq, h)

    block_spec = jax.tree_util.tree_map(lambda _: P(axis), stages.doubles)
    single_spec = jax.tree_util.tree_map(lambda _: P(axis), stages.singles)
    fn = jax.shard_map(stage_program, mesh=mesh,
                       in_specs=(block_spec, single_spec, P(), P()),
                       out_specs=P(axis),
                       check_vma=False)
    out = fn(stages.doubles, stages.singles, xs, vecs)   # (S, M, mb, seq, h)
    x = out[0].reshape(b, seq, h)

    # ---- final layers (outside the pipeline) ----
    img = x[:, t_len:]
    mod = linear(params["final_mod"], jax.nn.silu(vec))
    shift, scale = jnp.split(mod, 2, axis=-1)
    img = flux._modulate(flux._ln_no_affine(img), shift, scale)
    return linear(params["final_proj"], img)
