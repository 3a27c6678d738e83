"""Small behavioral seams: tokenizers, preprocess ranges, encoder error
paths, bank building."""

import numpy as np
import pytest
from PIL import Image

from domainrag_tpu.core import imaging
from domainrag_tpu.core.text import StubTokenizer, batch_tokenize


def test_stub_tokenizer_deterministic_and_padded():
    tok = StubTokenizer(vocab_size=100, bos_id=98, eos_id=99, pad_id=0)
    a = tok("hello world", 8)
    b = tok("hello world", 8)
    np.testing.assert_array_equal(a, b)
    assert a[0] == 98 and 99 in a and len(a) == 8
    assert a[-1] == 0  # padded
    # truncation
    long = tok(" ".join(["w"] * 50), 8)
    assert len(long) == 8
    # batch
    batch = batch_tokenize(tok, ["", "x"], 8)
    assert batch.shape == (2, 8)
    assert batch[0][0] == 98 and batch[0][1] == 99  # empty prompt = bos,eos


def test_siglip_preprocess_range(rng):
    img = Image.fromarray(rng.integers(0, 255, (50, 60, 3), dtype=np.uint8))
    arr = imaging.siglip_preprocess(img, 28)
    assert arr.shape == (28, 28, 3)
    assert arr.min() >= -1.0 and arr.max() <= 1.0


def test_clip_encoder_error_path(tmp_path):
    import jax
    from domainrag_tpu.models import clip as jclip
    from domainrag_tpu.stages.encoders import ClipImageEncoder
    cfg = jclip.TINY_VISION
    enc = ClipImageEncoder(jclip.init_vision(jax.random.PRNGKey(0), cfg),
                           cfg, batch_size=4)
    good = tmp_path / "good.png"
    Image.new("RGB", (32, 32)).save(good)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not an image")
    errors = []
    feats, kept = enc.encode_paths([str(good), str(bad)],
                                   on_error=lambda p, e: errors.append(p))
    assert kept == [str(good)]
    assert feats.shape == (1, cfg.projection_dim)
    assert errors == [str(bad)]


def test_embedding_bank_rejects_empty():
    from domainrag_tpu.stages.retrieve import EmbeddingBank
    with pytest.raises(ValueError):
        EmbeddingBank.from_sources({"a": np.zeros((0, 4), np.float32)},
                                   {"a": []})


def test_quantized_bytes_accounts_int8():
    import jax.numpy as jnp
    from domainrag_tpu.models.quant import quantized_bytes
    dense = {"w": jnp.zeros((100, 100), jnp.float32)}
    quant = {"w_q": jnp.zeros((100, 100), jnp.int8),
             "w_s": jnp.zeros((100,), jnp.float32)}
    assert quantized_bytes(quant) < quantized_bytes(dense) / 3


def test_bench_exactness_checks_cpu():
    """The on-TPU exactness gate folded into bench.py must also pass on
    the CPU backend (interpret-mode Pallas), so CI covers the assertion
    logic itself."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import run_exactness_checks

    run_exactness_checks()  # raises on any divergence
