"""Real-weights turnkey harness (VERDICT r1 item 10).

Given a checkpoint tree (layout of models/convert.load_flux_bundle), runs:
  1. every converter (flux-dev, flux-fill, vae, t5, clip-text,
     clip-vision, siglip, redux, resnet-stem, lama), timed, with param
     counts;
  2. parity microchecks vs transformers for every component whose HF dir
     is loadable (config.json present) — activations compared on fixed
     inputs;
  3. VAE encode->decode reconstruction check;
  4. one image per stage end-to-end (inpaint -> retrieve -> generate ->
     compose) on a synthesized toy dataset;
  5. a JSON readiness report.

So the day real weights exist (`huggingface-cli download` the FLUX/CLIP/
T5/SigLIP/LaMa repos into the tree), one command validates the whole
conversion + inference path and produces the first images — the FID gate
(eval/fid.py) closes right after. Mirrors what the reference gets from
``load_model`` (batch_generate_flux_kshot.py:117-153) plus the validation
it never had.

Self-test (works TODAY, no weights): ``--tiny-selftest`` synthesizes a
tiny checkpoint tree (transformers tiny models saved via save_pretrained,
our exporters for flux/vae, ordered leaves for lama) and runs the whole
harness against it — the exact code paths real weights will take.

Usage:
  python tools/real_weights_harness.py CKPT_DIR [--out DIR]
  python tools/real_weights_harness.py /tmp/ck --tiny-selftest
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


# ---------------------------------------------------------------------------
# tiny checkpoint synthesis (self-test mode)
# ---------------------------------------------------------------------------

def synthesize_tiny_checkpoints(ckpt: str) -> dict:
    """Write a structurally-complete tiny checkpoint tree; returns the
    config overrides to convert it with."""
    import jax
    import torch
    from safetensors.numpy import save_file
    from transformers import (CLIPConfig, CLIPModel, CLIPTextConfig,
                              CLIPVisionConfig, SiglipVisionConfig,
                              SiglipVisionModel, T5Config, T5EncoderModel)

    import dataclasses
    from domainrag_tpu.models import clip as clip_mod
    from domainrag_tpu.models import lama as lama_mod
    from domainrag_tpu.models import redux as redux_mod
    from domainrag_tpu.models import siglip as siglip_mod
    from domainrag_tpu.models import t5 as t5_mod
    from domainrag_tpu.models.convert import lama_leaf_order
    from domainrag_tpu.models.export_diffusers import (
        export_flux_to_diffusers, export_vae_to_diffusers)
    from domainrag_tpu.models.flux import model as flux_mod
    from domainrag_tpu.models.flux import vae as vae_mod

    torch.manual_seed(0)
    rng = np.random.default_rng(0)

    def save(sub, sd):
        d = os.path.join(ckpt, sub)
        os.makedirs(d, exist_ok=True)
        save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
                   for k, v in sd.items()},
                  os.path.join(d, "model.safetensors"))

    # transformers tiny models: save_pretrained gives config.json +
    # safetensors, so the harness's HF-parity step exercises for real
    clip_hf = CLIPModel(CLIPConfig.from_text_vision_configs(
        # mirrors clip.TINY_TEXT / TINY_VISION
        CLIPTextConfig(vocab_size=100, max_position_embeddings=16,
                       hidden_size=64, num_hidden_layers=2,
                       num_attention_heads=4, intermediate_size=256,
                       hidden_act="quick_gelu", eos_token_id=99,
                       bos_token_id=98, pad_token_id=97),
        CLIPVisionConfig(image_size=32, patch_size=8, hidden_size=64,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=256, hidden_act="quick_gelu"),
        projection_dim=32)).eval()
    clip_hf.save_pretrained(os.path.join(ckpt, "clip-text"),
                            safe_serialization=True)
    clip_hf.save_pretrained(os.path.join(ckpt, "clip-vision"),
                            safe_serialization=True)

    t5_hf = T5EncoderModel(T5Config(
        vocab_size=120, d_model=32, d_kv=8, d_ff=64, num_layers=2,
        num_heads=4, feed_forward_proj="gated-gelu",
        is_encoder_decoder=False, use_cache=False,
        tie_word_embeddings=False)).eval()
    t5_hf.save_pretrained(os.path.join(ckpt, "t5"), safe_serialization=True)

    sig_hf = SiglipVisionModel(SiglipVisionConfig(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=7,
        hidden_act="gelu_pytorch_tanh")).eval()
    sig_hf.save_pretrained(os.path.join(ckpt, "siglip"),
                           safe_serialization=True)

    # redux projection
    save("redux", {
        "redux_up.weight": rng.standard_normal((3 * 32, 48)) * 0.02,
        "redux_up.bias": np.zeros(3 * 32),
        "redux_down.weight": rng.standard_normal((32, 3 * 32)) * 0.02,
        "redux_down.bias": np.zeros(32),
    })

    # flux dev/fill + vae via our exporters (tied dims: t5 32, clip 64)
    vae_cfg = vae_mod.TINY_VAE
    lat_packed = vae_cfg.latent_channels * 4
    fill_in = lat_packed * 2 + vae_cfg.spatial_factor ** 2 * 4
    base = dataclasses.replace(flux_mod.TINY_FLUX, text_dim=32,
                               pooled_dim=64, in_channels=lat_packed,
                               out_channels=lat_packed)
    fill_cfg = dataclasses.replace(base, in_channels=fill_in)
    key = jax.random.PRNGKey(0)
    save("flux-dev", export_flux_to_diffusers(flux_mod.init(key, base),
                                              base))
    save("flux-fill", export_flux_to_diffusers(
        flux_mod.init(jax.random.PRNGKey(1), fill_cfg), fill_cfg))
    save("vae", export_vae_to_diffusers(
        vae_mod.init(jax.random.PRNGKey(2), vae_cfg)))

    # lama: ordered leaves with zero-padded keys (load_safetensors_dir
    # returns file order; numeric prefixes keep any sort stable too)
    lama_cfg = lama_mod.TINY_LAMA
    template = lama_mod.init(jax.random.PRNGKey(3), lama_cfg)
    sd = {}
    for i, (path, leaf) in enumerate(lama_leaf_order(template)):
        arr = np.asarray(leaf, np.float32)
        if arr.ndim == 4:  # HWIO -> torch OIHW
            arr = arr.transpose(3, 2, 0, 1)
        sd[f"{i:04d}.param"] = arr
    save("lama", sd)

    # resnet stem
    save("resnet-stem", {
        "conv1.weight": rng.standard_normal((64, 3, 7, 7)) * 0.05,
        "bn1.weight": np.ones(64), "bn1.bias": np.zeros(64),
        "bn1.running_mean": np.zeros(64),
        "bn1.running_var": np.ones(64),
    })

    return {
        "flux": base, "flux_fill": fill_cfg, "vae": vae_cfg,
        "t5": t5_mod.TINY_T5, "clip_text": clip_mod.TINY_TEXT,
        "siglip": siglip_mod.TINY_SIGLIP,
        "redux": redux_mod.ReduxEncoderConfig(siglip_hidden=48,
                                              txt_dim=32),
        "clip_vision": clip_mod.TINY_VISION,
        "lama": lama_cfg,
        "t5_max_len": 16,
    }


# ---------------------------------------------------------------------------
# parity microchecks (run whenever the HF dir is loadable)
# ---------------------------------------------------------------------------

def _parity_clip_text(ckpt, bundle, report):
    import torch
    from transformers import CLIPModel
    from domainrag_tpu.models import clip as clip_mod
    import jax.numpy as jnp

    hf = CLIPModel.from_pretrained(os.path.join(ckpt, "clip-text")).eval()
    cfg = bundle.clip_text_cfg
    ids = np.array([[98, 5, 7, 12, 99, 97, 97, 97]], np.int32)
    with torch.no_grad():
        ref = hf.text_model(
            input_ids=torch.from_numpy(ids.astype(np.int64)))
    hidden, pooled = clip_mod.apply_text(bundle.clip_text_params,
                                         jnp.asarray(ids), cfg)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(),
                               rtol=3e-4, atol=3e-5)
    report["parity"]["clip-text"] = "ok"


def _parity_t5(ckpt, bundle, report):
    import torch
    from transformers import T5EncoderModel
    import jax.numpy as jnp
    from domainrag_tpu.models import t5 as t5_mod

    hf = T5EncoderModel.from_pretrained(os.path.join(ckpt, "t5")).eval()
    ids = np.array([[3, 17, 42, 99, 1, 0, 0, 0]], np.int64)
    attn = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(attn)
                 ).last_hidden_state.numpy()
    ours = np.asarray(t5_mod.apply(
        bundle.t5_params, jnp.asarray(ids.astype(np.int32)), bundle.t5_cfg,
        attention_mask=jnp.asarray(attn != 0)))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-4)
    report["parity"]["t5"] = "ok"


def _parity_siglip(ckpt, bundle, report):
    import torch
    from transformers import SiglipVisionModel
    import jax.numpy as jnp
    from domainrag_tpu.models import siglip as siglip_mod

    hf = SiglipVisionModel.from_pretrained(
        os.path.join(ckpt, "siglip")).eval()
    size = bundle.siglip_cfg.image_size
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(
            images.transpose(0, 3, 1, 2))).last_hidden_state.numpy()
    ours = np.asarray(siglip_mod.apply(bundle.siglip_params,
                                       jnp.asarray(images),
                                       bundle.siglip_cfg))
    np.testing.assert_allclose(ours, ref, rtol=5e-4, atol=5e-5)
    report["parity"]["siglip"] = "ok"


def _parity_clip_vision(ckpt, runner, report):
    import torch
    from transformers import CLIPModel
    import jax.numpy as jnp
    from domainrag_tpu.models import clip as clip_mod

    hf = CLIPModel.from_pretrained(
        os.path.join(ckpt, "clip-vision")).eval()
    enc = runner.clip_encoder
    size = enc.cfg.image_size
    rng = np.random.default_rng(0)
    images = rng.standard_normal((1, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=torch.from_numpy(
            images.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(clip_mod.apply_vision(enc._params,
                                            jnp.asarray(images), enc.cfg))
    np.testing.assert_allclose(ours, ref, rtol=3e-4, atol=3e-5)
    report["parity"]["clip-vision"] = "ok"


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------

def run(ckpt: str, out_dir: str, tiny: bool, size: int,
        skip_images: bool) -> int:
    import jax
    report = {"checkpoints": ckpt, "backend": jax.default_backend(),
              "convert": {}, "parity": {}, "stages": {}, "errors": []}

    configs = None
    if tiny:
        print("== synthesizing tiny self-test checkpoints ==")
        configs = synthesize_tiny_checkpoints(ckpt)
        size = min(size, 32)

    from domainrag_tpu.core.config import (DatasetParams, PipelineConfig)
    import dataclasses
    from domainrag_tpu.models.convert import (build_runner_from_checkpoints,
                                              load_flux_bundle)

    os.makedirs(out_dir, exist_ok=True)
    dataset = "HARNESS"
    dsdir = os.path.join(out_dir, "datasets")
    cfg = PipelineConfig(datasets=(dataset,), shots=(1,),
                         datasets_dir=dsdir,
                         output_dir=os.path.join(out_dir, "out"))
    steps = 2 if tiny else 8
    cfg = dataclasses.replace(
        cfg,
        generate=dataclasses.replace(
            cfg.generate,
            sampling=dataclasses.replace(cfg.generate.sampling,
                                         num_steps=steps, height=size,
                                         width=size)),
        compose=dataclasses.replace(
            cfg.compose, num_steps=steps,
            dataset_params={dataset: DatasetParams(
                upscale_dimension=size if tiny else 1024)}))

    # 1. converters -------------------------------------------------------
    print("== converting checkpoints ==")
    t0 = time.perf_counter()
    try:
        if tiny and "flux_fill" in configs:
            # tiny fill config differs from production FLUX_FILL_DEV
            fill_configs = dict(configs)
            fill_configs["flux"] = configs["flux_fill"]
        runner = build_runner_from_checkpoints(
            ckpt, cfg, corpus_sources={}, configs=configs)
        if tiny:
            runner.fill_bundle = load_flux_bundle(ckpt, fill=True,
                                                  configs=fill_configs)
    except Exception as e:  # noqa: BLE001
        report["errors"].append(f"convert: {type(e).__name__}: {e}")
        _write(report, out_dir)
        print("CONVERSION FAILED:", e)
        return 1
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        runner.flux_bundle.flux_params) if hasattr(x, "size"))
    report["convert"] = {"seconds": round(time.perf_counter() - t0, 2),
                         "flux_params": int(n_params)}
    print(f"  all converters ok in {report['convert']['seconds']}s "
          f"(flux params: {n_params:,})")

    # 2. parity micochecks ------------------------------------------------
    print("== parity microchecks (vs transformers) ==")
    for name, fn in [("clip-text", _parity_clip_text),
                     ("t5", _parity_t5), ("siglip", _parity_siglip)]:
        if not os.path.exists(os.path.join(ckpt, name, "config.json")):
            report["parity"][name] = "skipped (no config.json)"
            continue
        try:
            fn(ckpt, runner.flux_bundle, report)
        except Exception as e:  # noqa: BLE001
            report["parity"][name] = f"FAILED: {e}"
            report["errors"].append(f"parity {name}: {e}")
    if os.path.exists(os.path.join(ckpt, "clip-vision", "config.json")):
        try:
            _parity_clip_vision(ckpt, runner, report)
        except Exception as e:  # noqa: BLE001
            report["parity"]["clip-vision"] = f"FAILED: {e}"
            report["errors"].append(f"parity clip-vision: {e}")
    else:
        report["parity"]["clip-vision"] = "skipped (no config.json)"
    for k, v in report["parity"].items():
        print(f"  {k}: {v}")

    # 3. VAE reconstruction ----------------------------------------------
    import jax.numpy as jnp
    from domainrag_tpu.models.flux import vae as vae_mod
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.tile(np.linspace(-0.8, 0.8, 64, dtype=np.float32)
                            [None, :, None, None], (1, 1, 64, 3))
                    ).transpose(0, 2, 1, 3)
    rec = vae_mod.decode(runner.flux_bundle.vae_params,
                         vae_mod.encode(runner.flux_bundle.vae_params, x,
                                        runner.flux_bundle.vae_cfg),
                         runner.flux_bundle.vae_cfg)
    mse = float(np.mean((np.asarray(rec) - np.asarray(x)) ** 2))
    report["vae_recon_mse"] = mse
    print(f"== VAE reconstruction MSE: {mse:.4f} "
          f"{'(random weights: unbounded)' if tiny else ''}")
    if not tiny and mse > 0.05:
        report["errors"].append(f"vae reconstruction poor: mse {mse}")

    # 4. one image per stage ---------------------------------------------
    if not skip_images:
        print("== one image per stage ==")
        from PIL import Image
        train = os.path.join(dsdir, dataset, "train")
        anns = os.path.join(dsdir, dataset, "annotations")
        os.makedirs(train, exist_ok=True)
        os.makedirs(anns, exist_ok=True)
        h = w = size
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(os.path.join(train, "sample_0.jpg"))
        with open(os.path.join(anns, "1_shot.json"), "w") as f:
            json.dump({"images": [{"id": 0, "file_name": "sample_0.jpg",
                                   "width": w, "height": h}],
                       "annotations": [{"id": 0, "image_id": 0,
                                        "category_id": 1,
                                        "bbox": [w // 4, h // 4,
                                                 w // 4, h // 4]}],
                       "categories": [{"id": 1, "name": "object"}]}, f)
        corpus_dir = os.path.join(out_dir, "corpus")
        os.makedirs(corpus_dir, exist_ok=True)
        cpaths = []
        for i in range(6):
            p = os.path.join(corpus_dir, f"c{i}.jpg")
            Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                            ).save(p)
            cpaths.append(p)
        runner.corpus_sources = {"coco": cpaths}
        try:
            res = runner.run()
            comp = res["compose"][f"{dataset}/1"]
            n_final = sum(len(s["outpainted_images"])
                          for s in comp["samples"])
            report["stages"] = {
                "inpaint": bool(res["inpaint"]),
                "retrieve": bool(res["retrieve"]),
                "generate": res["generate"][f"{dataset}/1"],
                "compose_final_images": n_final,
            }
            print(f"  pipeline produced {n_final} composed image(s)")
            if n_final == 0:
                report["errors"].append("compose produced no images")
        except Exception as e:  # noqa: BLE001
            report["errors"].append(f"stages: {type(e).__name__}: {e}")

    _write(report, out_dir)
    ok = not report["errors"]
    print("== HARNESS", "PASSED" if ok else
          f"FAILED ({len(report['errors'])} errors)", "==")
    for e in report["errors"]:
        print("  ERROR:", e)
    return 0 if ok else 1


def run_full_flux(ckpt: str, out_dir: str) -> int:
    """--full-flux-synth: the day-one rehearsal at REAL size (VERDICT r3
    item 7). Synthesizes the FLUX.1-dev transformer at its full 12 B
    size in the diffusers sharded-safetensors layout (via our exporter —
    the exact inverse of the converter), then runs the actual day-one
    path against the chip: load → convert (HOST — models/convert.
    host_conversion) → weight-only int8 quantize → device placement →
    one 1024 px denoise step. Wall-clock per phase + device HBM stats go
    to ``full_flux_report.json``, so the only untested step when real
    weights arrive is the download itself. Values are tiled random:
    timing/memory are size-faithful, outputs are not aesthetic; f32
    numerical parity is pinned at proxy scale by the oracle tests."""
    import glob as glob_mod
    import time

    import jax
    import jax.numpy as jnp
    import ml_dtypes
    from safetensors.numpy import save_file

    from domainrag_tpu.models import convert as convert_mod
    from domainrag_tpu.models import export_diffusers as exp
    from domainrag_tpu.models import quant
    from domainrag_tpu.models.flux import model as flux

    report = {"mode": "full-flux-synth",
              "backend": jax.default_backend(), "phases_s": {},
              "device_mem": {}, "host_rss_gb": {}}
    os.makedirs(out_dir, exist_ok=True)
    fdir = os.path.join(ckpt, "flux-dev")
    cfg = flux.FLUX_DEV

    def mem(tag):
        try:
            report["device_mem"][tag] = {
                k: v for k, v in jax.devices()[0].memory_stats().items()
                if "bytes" in k}
        except Exception:
            report["device_mem"][tag] = "memory_stats unavailable"

    def rss(tag):
        # VmRSS = current resident set, VmHWM = peak; the peak is the
        # number that decides whether a host can run day one at all.
        vals = {}
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith(("VmRSS", "VmHWM")):
                    k, v = line.split(":", 1)
                    vals[k] = round(int(v.split()[0]) / 2**20, 2)
        report["host_rss_gb"][tag] = vals

    if not glob_mod.glob(os.path.join(fdir, "*.safetensors")):
        print("== synthesizing full-size diffusers flux-dev tree ==",
              flush=True)
        os.makedirs(fdir, exist_ok=True)
        t0 = time.perf_counter()
        shapes = jax.eval_shape(lambda k: flux.init(k, cfg),
                                jax.random.PRNGKey(0))
        pool = (np.random.default_rng(0).standard_normal(1 << 22)
                .astype(np.float32) * 0.02).astype(ml_dtypes.bfloat16)

        def synth(leaf):
            n = int(np.prod(leaf.shape))
            return np.resize(pool, n).reshape(leaf.shape)

        host = jax.tree_util.tree_map(synth, shapes)
        sd = exp.export_flux_to_diffusers(host, cfg)
        # hub-style ~5 GB shards; the loader merges *.safetensors
        shard, shard_bytes, shards = {}, 0, []
        for key in sd:
            a = sd[key]
            shard[key] = a
            shard_bytes += a.nbytes
            if shard_bytes >= 5 << 30:
                shards.append(dict(shard))
                shard, shard_bytes = {}, 0
        if shard:
            shards.append(shard)
        for i, s in enumerate(shards):
            save_file(
                {k: np.ascontiguousarray(v) for k, v in s.items()},
                os.path.join(
                    fdir, f"diffusion_pytorch_model-{i + 1:05d}-of-"
                    f"{len(shards):05d}.safetensors"))
        del host, sd, shards, shard
        report["phases_s"]["synthesize_and_write"] = round(
            time.perf_counter() - t0, 1)
        rss("after_synthesize")
        print(f"   wrote {len(os.listdir(fdir))} shards in "
              f"{report['phases_s']['synthesize_and_write']}s", flush=True)
    report["tree_gb"] = round(sum(
        os.path.getsize(os.path.join(fdir, f))
        for f in os.listdir(fdir)) / 2**30, 2)

    print("== load + convert + quantize (host, streaming) ==", flush=True)
    rss("before_load")
    t0 = time.perf_counter()
    # round 5: lazy per-tensor loading + per-block convert->quantize
    # streaming. The round-5 eager rehearsal measured 69.5 GB peak host
    # RSS (22 GB source dict + 48 GB f32 tree co-resident) — an OOM on
    # any 64 GB host; this path holds the int8 tree + ONE f32 block.
    with convert_mod.host_conversion():
        params = convert_mod.convert_flux_transformer(
            convert_mod.load_safetensors_dir(fdir), cfg,
            block_transform=quant.quantize_tree)
        params = quant.quantize_tree(params)    # top-level linears
    report["phases_s"]["load_convert_host"] = round(
        time.perf_counter() - t0, 1)
    report["param_count"] = int(sum(
        int(np.prod(x.shape))
        for x in jax.tree_util.tree_leaves(params)
        if hasattr(x, "shape")))
    rss("after_convert")
    print(f"   {report['param_count'] / 1e9:.2f} B param-tree leaves in "
          f"{report['phases_s']['load_convert_host']}s", flush=True)

    print("== device placement ==", flush=True)
    mem("before_place")
    t0 = time.perf_counter()
    qparams = jax.device_put(params, jax.devices()[0])
    del params
    jax.block_until_ready(jax.tree_util.tree_leaves(qparams)[0])
    report["phases_s"]["place"] = round(time.perf_counter() - t0, 1)
    report["quantized_gb"] = round(
        quant.quantized_bytes(qparams) / 2**30, 2)
    mem("after_place")
    rss("after_place")
    print(f"   {report['quantized_gb']} GB on device in "
          f"{report['phases_s']['place']}s", flush=True)

    print("== one 1024 px denoise step on device ==", flush=True)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 4096, cfg.in_channels)),
                      jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, 512, cfg.text_dim)),
                      jnp.bfloat16)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                         jnp.bfloat16)
    img_ids = jnp.asarray(flux.make_image_ids(64, 64))
    txt_ids = jnp.asarray(flux.make_text_ids(512))

    @jax.jit
    def step(p, x):
        return flux.apply(p, x, txt, pooled,
                          jnp.full((1,), 0.5, jnp.float32), img_ids,
                          txt_ids, cfg,
                          guidance=jnp.full((1,), 3.5, jnp.float32))

    t0 = time.perf_counter()
    out = step(qparams, lat)
    _ = np.asarray(out[0, 0, :1])
    report["phases_s"]["first_step_incl_compile"] = round(
        time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    _ = np.asarray(step(qparams, lat)[0, 0, :1])
    report["phases_s"]["step"] = round(time.perf_counter() - t0, 4)
    report["finite"] = bool(np.isfinite(np.asarray(
        out[0, :4, :4], np.float32)).all())
    mem("after_step")
    rss("after_step")
    _write_json(report, os.path.join(out_dir, "full_flux_report.json"))
    print(json.dumps(report["phases_s"]))
    print(f"report -> {out_dir}/full_flux_report.json", flush=True)
    return 0


def _write_json(report, path):
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=str)


def _write(report, out_dir):
    with open(os.path.join(out_dir, "harness_report.json"), "w") as f:
        json.dump(report, f, indent=2, default=str)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoints")
    ap.add_argument("--out", default="/tmp/drtpu_harness")
    ap.add_argument("--tiny-selftest", action="store_true")
    ap.add_argument("--full-flux-synth", action="store_true",
                    help="full-12B day-one rehearsal: synthesize a "
                    "real-size diffusers flux-dev tree, convert, "
                    "quantize, serve one 1024 px step on the chip")
    ap.add_argument("--size", type=int, default=256,
                    help="image size for the per-stage smoke images")
    ap.add_argument("--skip-images", action="store_true")
    args = ap.parse_args()

    import jax
    if args.full_flux_synth:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/drtpu_jax_cache")
        sys.exit(run_full_flux(args.checkpoints, args.out))
    if args.tiny_selftest:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass
    jax.config.update("jax_compilation_cache_dir", "/tmp/drtpu_jax_cache")
    sys.exit(run(args.checkpoints, args.out, args.tiny_selftest,
                 args.size, args.skip_images))


if __name__ == "__main__":
    main()
