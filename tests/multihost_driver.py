"""Worker driver for tests/test_multihost.py: one coordinated
``jax.distributed`` CPU process running the worker-sliced
retrieve -> generate flow over a shared toy directory.

Invoked as: python multihost_driver.py <process_id> <num_processes>
<coordinator> <root_dir>.  The toy dataset (made by the test) lives
under <root_dir>; stage artifacts land in <root_dir>/output.
"""

import sys

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    pid, nproc, coordinator, root = (int(sys.argv[1]), int(sys.argv[2]),
                                     sys.argv[3], sys.argv[4])
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import glob
    import os

    from domainrag_tpu.core.config import (ComposeConfig, DatasetParams,
                                           FluxSamplingConfig,
                                           GenerateConfig, PipelineConfig,
                                           ReduxConfig, ResolutionPolicy)
    from domainrag_tpu.pipeline import build_tiny_runner

    corpus_paths = sorted(glob.glob(os.path.join(root, "coco", "*.jpg")))
    cfg = PipelineConfig(
        datasets=("NEU-DET",), shots=(1,),
        datasets_dir=os.path.join(root, "datasets"),
        output_dir=os.path.join(root, "output"),
        process_id="mh",
        worker_id=jax.process_index(),
        num_workers=jax.process_count(),
        generate=GenerateConfig(
            sampling=FluxSamplingConfig(num_steps=2, height=32, width=32,
                                        seed=0),
            redux=ReduxConfig(), top_ranks=2),
        compose=ComposeConfig(
            resolution=ResolutionPolicy(min_dimension=32,
                                        max_dimension=64),
            num_steps=2,
            dataset_params={"NEU-DET": DatasetParams(
                strength=0.5, guidance_scale=4.0, upscale_dimension=32)}),
    )
    runner = build_tiny_runner(cfg, {"coco": corpus_paths})

    # every worker inpaints its own sample slice (run_inpaint is
    # worker-sliced like the rest); barrier before cross-worker reads
    from domainrag_tpu.parallel import multihost
    runner.run_inpaint()
    multihost.barrier("inpaint-done")

    runner.run_retrieve()
    runner.run_generate()
    print(f"worker {pid}: done", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
