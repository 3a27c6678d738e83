"""Manifest-driven pipeline orchestrator — replaces ``domainrag.sh``.

The reference's end-to-end run is four fire-and-forget shell phases with no
cross-phase scheduler (domainrag.sh:1-31; SURVEY.md §3.5). Here the DAG is
explicit: inpaint -> retrieve -> generate -> compose, each stage consuming
the previous stage's on-disk artifacts (the L4 contract is preserved so
stages stay independently re-runnable) and reporting into per-stage
manifests.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence

import jax

from ..core.config import PipelineConfig
from ..core.log import StepTimer, get_logger
from ..parallel.mesh import create_mesh
from ..models import clip as clip_mod
from ..models import lama as lama_mod
from ..models import resnet_stem
from ..models.flux import pipeline as flux_pipeline
from ..stages import compose as compose_stage
from ..stages import generate as generate_stage
from ..stages import inpaint as inpaint_stage
from ..stages import retrieve as retrieve_stage
from ..stages.encoders import ClipImageEncoder, StyleEncoder

logger = get_logger("domainrag_tpu.pipeline")

STAGES = ("inpaint", "retrieve", "generate", "compose")


@dataclasses.dataclass
class PipelineRunner:
    """Holds all models + config; runs any subset of the stage DAG."""

    cfg: PipelineConfig
    lama_runner: inpaint_stage.LamaRunner
    clip_encoder: ClipImageEncoder
    style_encoder: StyleEncoder
    flux_bundle: flux_pipeline.FluxBundle       # dev (generation)
    fill_bundle: flux_pipeline.FluxBundle       # fill (composition)
    corpus_sources: Dict[str, List[str]] = dataclasses.field(
        default_factory=dict)                   # source -> image paths
    timer: StepTimer = dataclasses.field(default_factory=StepTimer)
    force_recompute: bool = False               # ignore feature caches
    # migration path: precomputed reference caches per source,
    # {source: (features.npy|.pt, paths.json)} — used instead of encoding
    pretrained_features: Dict[str, tuple] = dataclasses.field(
        default_factory=dict)

    # -- stage entries -----------------------------------------------------
    @property
    def lamainpaint_dir(self) -> str:
        return os.path.join(self.cfg.output_dir, "lamainpaint")

    @property
    def retrieval_dir(self) -> str:
        return os.path.join(self.cfg.output_dir, "retrieval_results")

    def run_inpaint(self, resume: bool = False):
        with self.timer.span("stage/inpaint"):
            return inpaint_stage.run_inpaint(
                self.cfg.datasets, self.cfg.shots, self.lama_runner,
                self.cfg.datasets_dir, self.cfg.output_dir, resume=resume,
                worker_id=self.cfg.worker_id,
                num_workers=self.cfg.num_workers)

    def _data_mesh(self):
        """Data mesh when >1 device is visible (sharded retrieval + DP
        generation), else None.

        Multi-host worker slicing (num_workers > 1 under jax.distributed)
        deliberately restricts the mesh to THIS host's local devices:
        each worker runs an independent program over a disjoint sample
        slice, so a global mesh would require lockstep identical
        collectives across hosts (they differ per slice — measured gloo
        crash). Cross-host scale-out is the sample dimension over DCN;
        in-host scale-out is this local mesh."""
        from ..parallel import multihost
        devices = (jax.local_devices() if multihost.is_distributed()
                   and self.cfg.num_workers > 1 else jax.devices())
        if len(devices) > 1:
            return create_mesh(
                model_parallel=self.cfg.mesh.model_parallel_size,
                devices=devices)
        return None

    def _pipe_mesh(self):
        """Pipe mesh for depth-sharded PP serving when configured
        (mesh.pipeline_parallel_size > 1), else None."""
        pp = self.cfg.mesh.pipeline_parallel_size
        if pp > 1:
            import numpy as np
            from jax.sharding import Mesh
            from ..parallel import multihost
            devices = (jax.local_devices()
                       if multihost.is_distributed()
                       and self.cfg.num_workers > 1 else jax.devices())
            if len(devices) < pp:
                raise ValueError(f"pipeline_parallel_size={pp} needs {pp} "
                                 f"devices, found {len(devices)}")
            return Mesh(np.array(devices[:pp]),
                        (self.cfg.mesh.pipe_axis,))
        return None

    def _build_bank(self, mesh=None) -> retrieve_stage.EmbeddingBank:
        feats, paths = {}, {}
        for source, spec in self.pretrained_features.items():
            f, kept = retrieve_stage.load_pretrained_features(*spec)
            feats[source], paths[source] = f, kept
        for source, image_paths in self.corpus_sources.items():
            if source in feats:
                continue
            f, kept = retrieve_stage.load_or_compute_source_features(
                self.retrieval_dir, source, image_paths, self.clip_encoder,
                force_recompute=self.force_recompute)
            feats[source], paths[source] = f, kept
        return retrieve_stage.EmbeddingBank.from_sources(feats, paths,
                                                         mesh=mesh)

    def run_retrieve(self):
        from ..parallel import multihost
        with self.timer.span("stage/retrieve"):
            bank = self._build_bank(mesh=self._data_mesh())
            out = retrieve_stage.run_retrieval(
                self.cfg.datasets, self.cfg.shots, bank, self.clip_encoder,
                self.style_encoder, self.lamainpaint_dir,
                self.retrieval_dir, self.cfg.retrieval,
                worker_id=self.cfg.worker_id,
                num_workers=self.cfg.num_workers)
            if self.cfg.num_workers > 1:
                # fence all hosts, then worker 0 merges the partials into
                # the canonical all-shots contract the next stage reads
                multihost.barrier("retrieve-done")
                if multihost.is_distributed():
                    if multihost.process_index() == 0:
                        multihost.merge_worker_retrieval_results(
                            self.retrieval_dir)
                    multihost.barrier("retrieve-merged")
                elif self.cfg.worker_id == 0:
                    # independent-process mode: no barrier exists; worker 0
                    # merges whatever partials are present (launcher must
                    # sequence workers, or run `retrieve --merge_only`)
                    multihost.merge_worker_retrieval_results(
                        self.retrieval_dir)
            return out

    def run_generate(self, resume: bool = False,
                     reference_artifacts: bool = False):
        results_file = os.path.join(self.retrieval_dir,
                                    "all_shots_retrieval_results.json")
        retrieval_results = {}
        if os.path.exists(results_file):
            with open(results_file) as f:
                retrieval_results = json.load(f)
        stage = generate_stage.GenerateStage(self.flux_bundle,
                                             self.cfg.generate)
        corpus_paths = [p for paths in self.corpus_sources.values()
                        for p in paths]
        corpus_roots = {
            src: os.path.commonpath(paths) if len(paths) > 1
            else os.path.dirname(paths[0])
            for src, paths in self.corpus_sources.items() if paths}
        # PP (depth-sharded serving) when configured, else DP sample
        # batching when several devices are visible
        pipe_mesh = self._pipe_mesh()
        mesh = None if pipe_mesh is not None else self._data_mesh()
        from ..parallel import multihost
        # multi-host: the timestamped run dir must agree across hosts
        run_name = None
        if self.cfg.num_workers > 1:
            run_name = generate_stage.results_dir_name(
                self.cfg.generate, multihost.shared_timestamp())
        out = {}
        with self.timer.span("stage/generate"):
            for dataset in self.cfg.datasets:
                for shot in self.cfg.shots:
                    out[f"{dataset}/{shot}"] = generate_stage.process_dataset(
                        stage, dataset, shot, retrieval_results,
                        self.lamainpaint_dir, self.cfg.output_dir,
                        corpus_paths=corpus_paths, resume=resume,
                        run_name=run_name,
                        worker_id=self.cfg.worker_id,
                        num_workers=self.cfg.num_workers,
                        mesh=mesh, pipe_mesh=pipe_mesh,
                        pipe_axis=self.cfg.mesh.pipe_axis,
                        reference_artifacts=reference_artifacts,
                        corpus_roots=corpus_roots)
            if self.cfg.num_workers > 1 and run_name is not None:
                multihost.barrier("generate-done")
                i_merge = (multihost.process_index() == 0
                           if multihost.is_distributed()
                           else self.cfg.worker_id == 0)
                if i_merge:
                    import glob as _glob
                    for dataset in self.cfg.datasets:
                        for shot in self.cfg.shots:
                            base = os.path.join(
                                self.cfg.output_dir, "result",
                                f"{dataset}_{shot}shot_retrieval", run_name)
                            parts = sorted(_glob.glob(os.path.join(
                                base, "manifest.worker*.json")))
                            if parts:
                                multihost.merge_worker_manifests(
                                    parts,
                                    os.path.join(base, "manifest.json"))
                multihost.barrier("generate-merged")
        return out

    def run_generate_legacy(self, resume: bool = False,
                            inpainted_dir: str = None,
                            retrieval_results_dir: str = None):
        """Legacy no-retrieval-JSON generation (ref
        batch_generate_flux_kshot.py:526-736): one generated_image.png per
        sample from the per-dataset legacy retrieval file."""
        stage = generate_stage.GenerateStage(self.flux_bundle,
                                             self.cfg.generate)
        out = {}
        with self.timer.span("stage/generate-legacy"):
            for dataset in self.cfg.datasets:
                out[dataset] = generate_stage.process_dataset_legacy(
                    stage, dataset,
                    inpainted_dir or self.lamainpaint_dir,
                    retrieval_results_dir or self.retrieval_dir,
                    os.path.join(self.cfg.output_dir, "result"),
                    resume=resume)
        return out

    def run_compose(self, resume: bool = False, failed_only: bool = False):
        pipe_mesh = self._pipe_mesh()
        stage = compose_stage.ComposeStage(
            self.fill_bundle, self.cfg.compose,
            process_id=self.cfg.process_id,
            mesh=None if pipe_mesh is not None else self._data_mesh(),
            pipe_mesh=pipe_mesh, pipe_axis=self.cfg.mesh.pipe_axis)
        out = {}
        with self.timer.span("stage/compose"):
            for dataset in self.cfg.datasets:
                for shot in self.cfg.shots:
                    out[f"{dataset}/{shot}"] = compose_stage.process_dataset(
                        stage, dataset, shot, self.cfg.datasets_dir,
                        self.cfg.output_dir, resume=resume,
                        failed_only=failed_only,
                        worker_id=self.cfg.worker_id,
                        num_workers=self.cfg.num_workers)
        return out

    def run(self, stages: Sequence[str] = STAGES, resume: bool = False,
            failed_only: bool = False, reference_artifacts: bool = False):
        """Run the DAG (or a contiguous subset — artifacts on disk carry
        state between invocations, exactly like the reference's phases).

        ``failed_only`` forwards to compose's failed-only re-run
        (ref outpainting_updown_sampling_redux.py:2064-2079);
        ``reference_artifacts`` forwards to generate's tolerant reader for
        reference-produced retrieval JSONs (stages/migrate.py)."""
        results = {}
        for stage in stages:
            if stage not in STAGES:
                raise ValueError(f"unknown stage {stage!r}; "
                                 f"choose from {STAGES}")
            logger.info("=== stage: %s ===", stage)
            if stage == "retrieve":
                results[stage] = self.run_retrieve()
            elif stage == "compose":
                results[stage] = self.run_compose(resume=resume,
                                                  failed_only=failed_only)
            elif stage == "generate":
                results[stage] = self.run_generate(
                    resume=resume, reference_artifacts=reference_artifacts)
            else:
                results[stage] = getattr(self, f"run_{stage}")(resume=resume)
        results["timings"] = self.timer.summary()
        return results


def build_tiny_runner(cfg: PipelineConfig,
                      corpus_sources: Optional[Dict[str, List[str]]] = None,
                      seed: int = 0) -> PipelineRunner:
    """Random tiny-model runner: full pipeline mechanics without real
    weights (tests, CPU smoke runs — SURVEY.md §4.4)."""
    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 4)
    lama_cfg = lama_mod.TINY_LAMA
    lama_params = lama_mod.init(ks[0], lama_cfg)
    clip_cfg = clip_mod.TINY_VISION
    clip_params = clip_mod.init_vision(ks[1], clip_cfg)
    stem_params = resnet_stem.init(ks[2])
    return PipelineRunner(
        cfg=cfg,
        lama_runner=inpaint_stage.LamaRunner(lama_params, lama_cfg),
        clip_encoder=ClipImageEncoder(clip_params, clip_cfg, batch_size=8),
        style_encoder=StyleEncoder(stem_params, batch_size=8, resize=64),
        flux_bundle=flux_pipeline.tiny_bundle(ks[3], fill=False),
        fill_bundle=flux_pipeline.tiny_bundle(ks[3], fill=True),
        corpus_sources=corpus_sources or {},
    )
