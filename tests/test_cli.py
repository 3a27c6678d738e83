"""CLI argument handling (no model execution)."""

import pytest

from domainrag_tpu.cli import main as cli


def parse(argv):
    import argparse
    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers(dest="command", required=True)
    for name in ("inpaint", "retrieve", "generate", "compose", "pipeline",
                 "export"):
        p = sub.add_parser(name)
        cli._add_common(p)
        if name == "pipeline":
            p.add_argument("--stages",
                           default="inpaint,retrieve,generate,compose")
    return parser.parse_args(argv)


def test_dataset_and_shot_aliases():
    args = parse(["compose", "--dataset", "UODD", "--shot", "5"])
    assert args.datasets == ["UODD"] and args.shots == [5]
    args = parse(["inpaint", "--datasets", "A", "B", "--shots", "1", "10"])
    assert args.datasets == ["A", "B"] and args.shots == [1, 10]


def test_custom_upscale_and_compose_cfg():
    args = parse(["compose", "--dataset", "NEU-DET",
                  "--custom_upscale", "NEU-DET:512", "--max_dimension",
                  "1400", "--shots", "1"])
    cfg = cli._build_cfg(args)
    params = {k.lower(): v for k, v in
              cfg.compose.dataset_params.items()}
    assert params["neu-det"].upscale_dimension == 512
    assert cfg.compose.resolution.max_dimension == 1400
    # untouched dataset keeps its table value
    assert params["uodd"].upscale_dimension == 2048


def test_corpus_and_pretrained_specs(tmp_path):
    (tmp_path / "a.jpg").write_bytes(b"x")
    sources = cli._corpus_sources([f"coco={tmp_path}"])
    assert list(sources) == ["coco"] and len(sources["coco"]) == 1

    class A:
        corpus_features = ["coco=f.npy:p.json"]
    specs = cli._pretrained_specs(A())
    assert specs == {"coco": ("f.npy", "p.json")}


def test_worker_flags_reach_config():
    args = parse(["generate", "--worker_id", "2", "--num_workers", "4",
                  "--shots", "1"])
    cfg = cli._build_cfg(args)
    assert cfg.worker_id == 2 and cfg.num_workers == 4


def test_w8a8_implies_int8_and_serving_mode(tmp_path):
    """--w8a8 quantizes the Flux weights AND flips the process-wide
    int8-activation serving mode (common.set_int8_activations)."""
    from domainrag_tpu.models import common

    args = parse(["generate", "--tiny-models", "--shots", "1",
                  "--datasets_dir", str(tmp_path / "d"),
                  "--output_dir", str(tmp_path / "o")])
    args.w8a8 = True
    args.int8 = False
    args.force_recompute = False
    args.corpus_features = []
    quantized = []
    orig = cli._quantize_runner
    cli._quantize_runner = lambda r: quantized.append(r)
    try:
        runner = cli._build_runner(args)
        assert common._INT8_ACTIVATIONS is True
        # --w8a8 implies weight quantization even without --int8
        # (tiny-model weights are below quantize_tree's min_size, so
        # assert on the call, not on w_q leaves)
        assert quantized == [runner]
    finally:
        cli._quantize_runner = orig
        common.set_int8_activations(False)
