"""Generate the frozen FAISS-equivalence fixture for the top-k exactness gate.

The gate (ref retrieval/clip100_resnet_style_all_shots.py:425-434) is
*identical top-100 indices vs FAISS ``IndexFlatIP``*. faiss is not installed
in this image, so the fixture is constructed to be provably equal to what
FAISS would return, with no dependence on FAISS internals:

1. Features are integer-valued f32 with |score| < 2^24, so inner products
   are exactly representable in f32 and bitwise identical under ANY
   summation order (BLAS sgemm, MXU, numpy — all agree).
2. The generator rejects any (queries, bank) draw where some query's top
   ``K_CHECK+1`` scores are not strictly distinct. With all relevant scores
   distinct, exact top-100 is UNIQUE: every correct implementation — FAISS's
   heap k-selection included — must return the same indices in the same
   (descending-score) order. No tie-break policy can differ.

Expected values are computed in int64 (exact). When faiss IS importable
(e.g. regenerating on a dev box), the script additionally runs real
``faiss.IndexFlatIP`` and asserts bit-equality before writing.

Usage: python tools/gen_faiss_fixture.py [out.npz]
"""

from __future__ import annotations

import sys

import numpy as np

NQ, NB, D = 8, 1000, 512
K_CHECK = 100


def gen(seed: int):
    rng = np.random.default_rng(seed)
    bank = rng.integers(-30, 31, (NB, D)).astype(np.int64)
    queries = rng.integers(-30, 31, (NQ, D)).astype(np.int64)
    scores = queries @ bank.T  # exact int64
    # reject draws with any tie inside the top K_CHECK+1 of any query
    for q in range(NQ):
        top = np.sort(scores[q])[::-1][:K_CHECK + 1]
        if np.unique(top).size != top.size:
            return None
    order = np.argsort(-scores, axis=1, kind="stable")[:, :K_CHECK]
    exp_scores = np.take_along_axis(scores, order, axis=1)
    return (queries.astype(np.float32), bank.astype(np.float32),
            order.astype(np.int64), exp_scores.astype(np.float32))


def main(out_path: str) -> None:
    for seed in range(10_000):
        result = gen(seed)
        if result is not None:
            break
    else:
        raise RuntimeError("no tie-free draw found")
    queries, bank, exp_idx, exp_scores = result
    # |score| bound check for f32 exactness
    assert np.abs(exp_scores).max() < 2 ** 24

    try:
        import faiss  # noqa: F401
        index = faiss.IndexFlatIP(D)
        index.add(bank)
        fs, fi = index.search(queries, K_CHECK)
        np.testing.assert_array_equal(fi.astype(np.int64), exp_idx)
        np.testing.assert_array_equal(fs, exp_scores)
        verified = "real-faiss-verified"
    except ImportError:
        verified = "distinct-scores-proof"

    np.savez_compressed(
        out_path, queries=queries, bank=bank,
        expected_indices=exp_idx, expected_scores=exp_scores,
        seed=np.int64(seed), verification=np.bytes_(verified.encode()))
    print(f"wrote {out_path} (seed={seed}, {verified})")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1
         else "tests/fixtures/faiss_topk_fixture.npz")
