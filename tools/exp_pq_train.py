"""Profile the driver-side PQ/OPQ training path (b6/b6o/b6x) —
no Spark needed: train_pq/train_opq run entirely on a sample matrix
when sample_matrix is supplied, which is exactly how the bench calls
them. cProfile + per-phase timers to find where b6x's 25.3 s goes.
"""
import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from nebuia_vector_db_spark.operators import pq as pqmod  # noqa: E402

SYNTH_D = 64


def b6x_sample():
    an_d, an_n = SYNTH_D, 200_000
    an_rng = np.random.default_rng(5)
    an_scales = np.exp(-np.arange(an_d) / 12.0)
    an_basis = np.linalg.qr(an_rng.normal(size=(an_d, an_d)))[0]
    an_mat = (
        (an_rng.normal(size=(an_n, an_d)) * an_scales) @ an_basis.T
    ).astype(np.float64)
    return an_mat[:40_000]


def main():
    smat = b6x_sample()
    x = pqmod._training_residuals(None, len(smat), "embedding", None, None, smat)

    t0 = time.perf_counter()
    books_p = pqmod._fit_books(x, 16, 256, 10, 42)
    t_fit = time.perf_counter() - t0
    print(f"_fit_books(40k x 64, m=16, k=256, iters=10): {t_fit:.2f}s")

    t0 = time.perf_counter()
    rot = pqmod._eigen_allocation_rotation(x, 16)
    print(f"_eigen_allocation_rotation: {time.perf_counter() - t0:.3f}s")

    y = x @ rot
    t0 = time.perf_counter()
    codes = pqmod._encode_np(y, books_p)
    print(f"_encode_np(40k): {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    y_hat = pqmod._reconstruct_np(codes, books_p)
    print(f"_reconstruct_np(40k): {time.perf_counter() - t0:.3f}s")
    t0 = time.perf_counter()
    u, _, vt = np.linalg.svd(x.T @ y_hat, full_matrices=False)
    print(f"procrustes svd: {time.perf_counter() - t0:.3f}s")

    if "--profile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        pqmod.train_opq(
            None, m=16, k=256, sample=len(smat), iters=10, opq_iters=4,
            sample_matrix=smat, init="eigen",
        )
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(25)
    else:
        t0 = time.perf_counter()
        pqmod.train_pq(
            None, m=16, k=256, sample=len(smat), iters=10,
            sample_matrix=smat,
        )
        t_pq = time.perf_counter() - t0
        t0 = time.perf_counter()
        pqmod.train_opq(
            None, m=16, k=256, sample=len(smat), iters=10, opq_iters=4,
            sample_matrix=smat, init="eigen",
        )
        t_opq = time.perf_counter() - t0
        print(f"train_pq: {t_pq:.2f}s  train_opq: {t_opq:.2f}s  "
              f"(b6x_train_sec r15 = 25.33)")


if __name__ == "__main__":
    main()
