"""Standalone b9 GEMM-kernel experiment (no Spark): measure the
per-task cosine block kernel under realistic 21-way concurrency.

The bench's b9 runs _cosine_pairs_blocked on 240k rows in 40k blocks:
21 block-pair tasks, each a 40k x 40k score matrix processed in
chunks. BENCH_SELF r15 records 99.4 s wall for the whole job on 32
cores, yet the isolated per-task kernel was measured at ~9-14 s —
the gap is what this experiment isolates: under 21 concurrent tasks
the shared L3 is ~1.5 MB/task, so the "cache-resident" small-chunk
heuristic (_CACHE_SCORE_CELLS, step=50) re-streams the 20 MB right
operand 800x per task from RAM.

Variants (all per-cell arithmetic identical: dot / (na*nb), float64):
  A. current: cells heuristic (step=50 when right block <= 32 MB)
  B. big chunks: step from _MAX_SCORE_CELLS (=800 rows)
  C. 2-D tiling: l-tile x r-tile sized for per-task cache share
Run single-task first, then N_PROC concurrent processes.
"""
import os
import sys
import time
from concurrent.futures import ProcessPoolExecutor

import numpy as np

N_BLOCK = 40_000
D = 64
THRESHOLD = 0.9
N_TASKS = 21  # 6 diagonal + 15 cross pairs for 6 blocks


def make_blocks(seed):
    rng = np.random.default_rng(seed)
    l_mat = rng.normal(size=(N_BLOCK, D)).astype(np.float64)
    r_mat = rng.normal(size=(N_BLOCK, D)).astype(np.float64)
    l_ids = np.arange(N_BLOCK, dtype=np.int64)
    r_ids = np.arange(N_BLOCK, 2 * N_BLOCK, dtype=np.int64)
    return l_ids, l_mat, r_ids, r_mat


def kernel_chunked(l_ids, l_mat, r_ids, r_mat, step):
    """The current kernel shape: chunk the left operand only."""
    l_norms = np.sqrt(np.einsum("ij,ij->i", l_mat, l_mat))
    r_norms = np.sqrt(np.einsum("ij,ij->i", r_mat, r_mat))
    r_mat_t = np.ascontiguousarray(r_mat.T)
    n_l = len(l_ids)
    dot_buf = np.empty((min(step, n_l), len(r_ids)))
    den_buf = np.empty_like(dot_buf)
    total = 0
    for s in range(0, n_l, step):
        lid = l_ids[s : s + step]
        m = len(lid)
        cos = np.matmul(l_mat[s : s + m], r_mat_t, out=dot_buf[:m])
        den = np.multiply(
            l_norms[s : s + m, None], r_norms[None, :], out=den_buf[:m]
        )
        np.divide(cos, den, out=cos)
        ii, jj = np.nonzero(cos >= THRESHOLD)
        keep = lid[ii] < r_ids[jj]
        total += int(keep.sum())
    return total


def kernel_tiled(l_ids, l_mat, r_ids, r_mat, m_tile, r_tile):
    """2-D tiling: the (m_tile, r_tile) score tile stays cache-resident
    through GEMM -> den -> divide -> nonzero. Same per-cell math."""
    l_norms = np.sqrt(np.einsum("ij,ij->i", l_mat, l_mat))
    r_norms = np.sqrt(np.einsum("ij,ij->i", r_mat, r_mat))
    n_l, n_r = len(l_ids), len(r_ids)
    dot_buf = np.empty((m_tile, r_tile))
    den_buf = np.empty_like(dot_buf)
    total = 0
    for rs in range(0, n_r, r_tile):
        rt = min(r_tile, n_r - rs)
        r_sub_t = np.ascontiguousarray(r_mat[rs : rs + rt].T)
        rn = r_norms[rs : rs + rt]
        rid = r_ids[rs : rs + rt]
        for ls in range(0, n_l, m_tile):
            m = min(m_tile, n_l - ls)
            cos = np.matmul(
                l_mat[ls : ls + m], r_sub_t, out=dot_buf[:m, :rt]
            )
            den = np.multiply(
                l_norms[ls : ls + m, None], rn[None, :], out=den_buf[:m, :rt]
            )
            np.divide(cos, den, out=cos)
            ii, jj = np.nonzero(cos >= THRESHOLD)
            keep = l_ids[ls + ii] < rid[jj]
            total += int(keep.sum())
    return total


def kernel_f32_screen(l_ids, l_mat, r_ids, r_mat, step):
    """f32 screening GEMM on normalized rows (margin 1e-3, ~100x the
    worst-case f32 error for d=64), then exact f64 dot/(na*nb) on the
    sparse candidate set — final values identical to the f64 kernel
    modulo accumulation-order ULPs (within the tests' 1e-12)."""
    l_norms = np.sqrt(np.einsum("ij,ij->i", l_mat, l_mat))
    r_norms = np.sqrt(np.einsum("ij,ij->i", r_mat, r_mat))
    l32 = (l_mat / l_norms[:, None]).astype(np.float32)
    r32_t = np.ascontiguousarray((r_mat / r_norms[:, None]).astype(np.float32).T)
    n_l = len(l_ids)
    buf = np.empty((min(step, n_l), len(r_ids)), dtype=np.float32)
    screen = np.float32(THRESHOLD - 1e-3)
    total = 0
    for s in range(0, n_l, step):
        lid = l_ids[s : s + step]
        m = len(lid)
        cos32 = np.matmul(l32[s : s + m], r32_t, out=buf[:m])
        ii, jj = np.nonzero(cos32 >= screen)
        if len(ii) == 0:
            continue
        # exact recompute: f64 dot / (na*nb), row-pair einsum
        d64 = np.einsum(
            "ij,ij->i", l_mat[s + ii], r_mat[jj]
        ) / (l_norms[s + ii] * r_norms[jj])
        ok = d64 >= THRESHOLD
        keep = lid[ii[ok]] < r_ids[jj[ok]]
        total += int(keep.sum())
    return total


def kernel_tiled_prenorm(l_ids, l_mat, r_ids, r_mat, m_tile, r_tile):
    l_n = l_mat / np.sqrt(np.einsum("ij,ij->i", l_mat, l_mat))[:, None]
    r_n = r_mat / np.sqrt(np.einsum("ij,ij->i", r_mat, r_mat))[:, None]
    n_l, n_r = len(l_ids), len(r_ids)
    dot_buf = np.empty((m_tile, r_tile))
    total = 0
    for rs in range(0, n_r, r_tile):
        rt = min(r_tile, n_r - rs)
        r_sub_t = np.ascontiguousarray(r_n[rs : rs + rt].T)
        rid = r_ids[rs : rs + rt]
        for ls in range(0, n_l, m_tile):
            m = min(m_tile, n_l - ls)
            cos = np.matmul(l_n[ls : ls + m], r_sub_t, out=dot_buf[:m, :rt])
            ii, jj = np.nonzero(cos >= THRESHOLD)
            keep = l_ids[ls + ii] < rid[jj]
            total += int(keep.sum())
    return total


def kernel_prenorm(l_ids, l_mat, r_ids, r_mat, step):
    """Pre-normalize rows once (O(n*d)); the GEMM then emits cosine
    directly — no den matrix, no divide pass: 16 B/cell of traffic
    instead of 48. Values shift by ~1 ULP vs dot/(na*nb)."""
    l_n = l_mat / np.sqrt(np.einsum("ij,ij->i", l_mat, l_mat))[:, None]
    r_n = r_mat / np.sqrt(np.einsum("ij,ij->i", r_mat, r_mat))[:, None]
    r_n_t = np.ascontiguousarray(r_n.T)
    n_l = len(l_ids)
    dot_buf = np.empty((min(step, n_l), len(r_ids)))
    total = 0
    for s in range(0, n_l, step):
        lid = l_ids[s : s + step]
        m = len(lid)
        cos = np.matmul(l_n[s : s + m], r_n_t, out=dot_buf[:m])
        ii, jj = np.nonzero(cos >= THRESHOLD)
        keep = lid[ii] < r_ids[jj]
        total += int(keep.sum())
    return total


VARIANTS = {
    "A_cache50": lambda *b: kernel_chunked(*b, step=50),
    "G_f32_100": lambda *b: kernel_f32_screen(*b, step=100),
    "G_f32_800": lambda *b: kernel_f32_screen(*b, step=800),
    "G_f32_1600": lambda *b: kernel_f32_screen(*b, step=1600),
    "G_f32_6400": lambda *b: kernel_f32_screen(*b, step=6400),
    "D_prenorm50": lambda *b: kernel_prenorm(*b, step=50),
    "D_prenorm400": lambda *b: kernel_prenorm(*b, step=400),
    "D_prenorm800": lambda *b: kernel_prenorm(*b, step=800),
    "D_prenorm3200": lambda *b: kernel_prenorm(*b, step=3200),
    "B_big800": lambda *b: kernel_chunked(*b, step=800),
    "E_orig_256x512": lambda *b: kernel_tiled(*b, 256, 512),
    "E_orig_128x1024": lambda *b: kernel_tiled(*b, 128, 1024),
    "E_orig_256x1024": lambda *b: kernel_tiled(*b, 256, 1024),
    "E_orig_512x1024": lambda *b: kernel_tiled(*b, 512, 1024),
    "F_pre_256x512": lambda *b: kernel_tiled_prenorm(*b, 256, 512),
    "F_pre_256x1024": lambda *b: kernel_tiled_prenorm(*b, 256, 1024),
    "F_pre_512x2048": lambda *b: kernel_tiled_prenorm(*b, 512, 2048),
    "C_tile_512x2048": lambda *b: kernel_tiled(*b, 512, 2048),
    "C_tile_256x4096": lambda *b: kernel_tiled(*b, 256, 4096),
    "C_tile_1024x4096": lambda *b: kernel_tiled(*b, 1024, 4096),
    "C_tile_2048x8192": lambda *b: kernel_tiled(*b, 2048, 8192),
}


def run_one(args):
    name, seed = args
    blocks = make_blocks(seed)
    t0 = time.perf_counter()
    n = VARIANTS[name](*blocks)
    return time.perf_counter() - t0, n


def main():
    only = sys.argv[1:] or list(VARIANTS)
    print(f"single-task (one process, {N_BLOCK}x{N_BLOCK}):")
    for name in only:
        dt, n = run_one((name, 7))
        print(f"  {name:22s} {dt:7.2f}s  pairs={n}")
    print(f"\nconcurrent ({N_TASKS} procs):")
    for name in only:
        t0 = time.perf_counter()
        with ProcessPoolExecutor(max_workers=N_TASKS) as ex:
            list(ex.map(run_one, [(name, 100 + i) for i in range(N_TASKS)]))
        print(f"  {name:22s} {time.perf_counter() - t0:7.2f}s wall")


if __name__ == "__main__":
    main()
