"""Exactness tests for the FAISS-replacement top-k paths.

BASELINE demands identical top-100 indices; every path (XLA, Pallas,
native C++) is checked against the numpy oracle, including tie-heavy banks.
"""

import numpy as np
import pytest

from domainrag_tpu.ops import topk as topk_mod
from domainrag_tpu.native.build import (topk_ip_native, load_native,
                                        native_available)


def random_case(rng, nq, nb, d, ties=False):
    """Integer-valued features: dot products are exact in f32 (magnitudes
    far below 2^24), so scores are bitwise identical regardless of backend
    accumulation order and index comparisons are meaningful. Small alphabet
    produces natural exact ties, exercising the (score desc, index asc)
    tie-break."""
    lo, hi = (-2, 3) if ties else (-8, 8)
    bank = rng.integers(lo, hi, (nb, d)).astype(np.float32)
    queries = rng.integers(lo, hi, (nq, d)).astype(np.float32)
    if ties:
        bank[nb // 3:2 * nb // 3] = bank[:nb // 3][:nb // 3]
    return queries, bank


@pytest.mark.parametrize("nq,nb,d,k", [
    (1, 1000, 512, 100),     # the reference workload shape
    (7, 333, 64, 100),       # odd sizes
    (4, 50, 32, 100),        # k > n -> clipped
])
def test_xla_matches_oracle(rng, nq, nb, d, k):
    queries, bank = random_case(rng, nq, nb, d)
    ref_s, ref_i = topk_mod.topk_ip_numpy(queries, bank, k)
    vals, idx = topk_mod.topk_ip(queries, bank, k)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.asarray(vals), ref_s, rtol=1e-6, atol=1e-6)


def test_xla_tie_break(rng):
    queries, bank = random_case(rng, 3, 300, 64, ties=True)
    ref_s, ref_i = topk_mod.topk_ip_numpy(queries, bank, 100)
    _, idx = topk_mod.topk_ip(queries, bank, 100)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)


def test_bitonic_sort_desc(rng):
    scores = rng.standard_normal((5, 128)).astype(np.float32)
    # inject ties
    scores[:, 10] = scores[:, 90]
    idx = np.broadcast_to(np.arange(128, dtype=np.int32), (5, 128)).copy()
    import jax.numpy as jnp
    s, i = topk_mod.bitonic_sort_desc(jnp.asarray(scores), jnp.asarray(idx))
    s, i = np.asarray(s), np.asarray(i)
    order = np.argsort(-scores, axis=1, kind="stable")
    np.testing.assert_array_equal(i, order.astype(np.int32))
    np.testing.assert_allclose(s, np.take_along_axis(scores, order, 1))


@pytest.mark.parametrize("nq,nb,d,k,ties", [
    (2, 1000, 512, 100, False),
    (1, 700, 64, 100, True),
    (3, 513, 32, 100, False),    # non-multiple bank size -> padding path
])
def test_pallas_matches_oracle(rng, nq, nb, d, k, ties):
    queries, bank = random_case(rng, nq, nb, d, ties=ties)
    ref_s, ref_i = topk_mod.topk_ip_numpy(queries, bank, min(k, nb))
    vals, idx = topk_mod.topk_ip_pallas(queries, bank, min(k, nb),
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), ref_i)
    np.testing.assert_allclose(np.asarray(vals), ref_s, rtol=1e-5, atol=1e-5)


@pytest.mark.skipif(not native_available(),
                    reason="no native toolchain and no prebuilt .so")
def test_native_matches_oracle(rng):
    # fail loudly (not skip) if the expected-loadable library broke:
    # the prebuilt .so is committed, so a silent load failure is a bug.
    assert load_native() is not None, \
        "native library should be loadable (g++ or prebuilt .so present)"
    for ties in (False, True):
        queries, bank = random_case(rng, 5, 1200, 512, ties=ties)
        ref_s, ref_i = topk_mod.topk_ip_numpy(queries, bank, 100)
        vals, idx = topk_ip_native(queries, bank, 100, n_threads=2)
        np.testing.assert_array_equal(idx, ref_i)
        np.testing.assert_allclose(vals, ref_s, rtol=1e-6, atol=1e-6)
