"""Bench regression comparator (round-8, VERDICT r7 task #4).

Diffs a fresh bench payload against the last *committed* BENCH_SELF.json
(``git show HEAD:BENCH_SELF.json``) and reports, in ONE compact line:

- ``timed_moved``: any wall-clock/throughput row whose new/old ratio
  leaves [1/1.5, 1.5] — the threshold the round-7 manual diff used to
  spot the single cross-run mover (b5_ivf_build_sec 6.0 -> 9.7 s).
- ``pinned_moved``: any determinism-pinned ratio (recall@k / *_fraction
  rows, all computed on the seeded deterministic index with fixed query
  sets — bit-identical across runs by design, VERDICT r3 #2 / r7) that
  changed AT ALL. A pinned move means the seeded build or the query set
  changed, never benign variance. One documented exception (round 10):
  *_fraction rows derived from a repartitionByRange layout (b10/b10xl)
  are deterministic only per SESSION JOB HISTORY — Spark's
  RangePartitioner seeds its reservoir sample with the RDD id, a
  session-sequential counter, so inserting a b-series block upstream
  OR an AQE coalesce decision flipping on size jitter shifts the
  sampled file boundaries a little (observed: b10 alternates between
  0.125 and 0.1562 across identical-code runs). A small fraction move
  on these two rows is layout-sample jitter; the gated PROPERTY
  (fraction ≪ 1, pruning works) holds at every observed value, and a
  LARGE move (toward 1.0) remains a hard flag.

Usable standalone (``python tools/bench_compare.py [new.json [old.json]]``)
and from bench.py via :func:`compare_line`, which prints before the
final gate line so the driver's stdout tail carries the verdict.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Rows where run-to-run variance is expected (timings, throughputs, and
# the slopes/ratios derived from them). Everything matching PINNED is
# seeded-deterministic and must not move at all. Suffix-anchored
# (ADVICE r8): a bare substring match would hard-flag any future
# timing row whose NAME contains a marker (e.g. *_compression_sec)
# while letting deterministic count rows (*_total) drift silently.
_PINNED_RE = re.compile(
    r"(recall_at_\d+(_nprobe\d+)?$)"  # recall@k incl. nprobe variants
    r"|(_fraction$)"                  # files/cells/candidate fractions
    r"|(_snr_db$)|(_mse$)"            # codec / quantizer fidelity
    r"|(_total$)"                     # deterministic count rows
    r"|(_orth_err$)"                  # OPQ rotation orthogonality
    r"|(_compression_x$)"             # deterministic compression ratio
)
_TIMED_FLAG = 1.5

# Derived-throughput rows (*_per_sec / *_fps) are the inverse of a
# timed sibling over a deterministic count: when the _sec row moves,
# these move identically, so flagging both double-reports ONE mover
# and buries real signal (VERDICT r9 task #5 — the b14 fps swing was
# box load showing up twice). They are skipped from timed_moved; the
# _sec sibling carries the flag, and the counts they divide by are
# _total rows, which stay PINNED.
_DERIVED_RE = re.compile(r"(_per_sec$)|(_fps$)")


def _is_pinned(key: str) -> bool:
    return _PINNED_RE.search(key) is not None


def _is_derived(key: str) -> bool:
    return _DERIVED_RE.search(key) is not None


def load_committed(path: str = "BENCH_SELF.json") -> dict | None:
    """The last committed payload, or None (first run / no git)."""
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "show", f"HEAD:{path}"],
            capture_output=True,
            text=True,
            timeout=30,
        )
        if out.returncode != 0:
            return None
        return json.loads(out.stdout)
    except Exception:
        return None


def diff(new_q: dict, old_q: dict) -> dict:
    """Compare metric dicts; see module docstring for the two buckets."""
    timed_moved: dict[str, list[float]] = {}
    pinned_moved: dict[str, list[float]] = {}
    for key in sorted(set(new_q) & set(old_q)):
        a, b = old_q[key], new_q[key]
        if not isinstance(a, (int, float)) or not isinstance(b, (int, float)):
            continue
        if _is_pinned(key):
            if a != b:
                pinned_moved[key] = [a, b]
        elif _is_derived(key):
            continue  # inverse of a timed sibling; _sec carries the flag
        else:
            lo, hi = sorted([abs(a), abs(b)])
            # sub-50ms rows sit at the dispatch floor; noise, not signal
            if hi >= 0.05 and (lo == 0 or hi / lo > _TIMED_FLAG):
                timed_moved[key] = [a, b]
    return {
        "compared": len(set(new_q) & set(old_q)),
        "timed_moved": timed_moved,
        "pinned_moved": pinned_moved,
    }


def compare_line(new_payload: dict, budget: int = 900) -> str:
    """One compact printable line vs the committed baseline payload.

    Total length is bounded by ``budget`` chars (ADVICE r8: the
    driver keeps a ~2,000-char stdout tail shared with the ≤999-char
    gate line and log noise — a fixed 8-items-per-bucket cap could
    still clip this line's head). Degrades progressively: fewer items
    per bucket, then key-only lists, each step keeping an explicit
    *_truncated count."""
    old = load_committed()
    if old is None:
        return '{"bench_diff":"no committed BENCH_SELF.json to compare"}'
    full = diff(new_payload.get("queries", {}), old.get("queries", {}))

    def _render(cap: int, keys_only: bool) -> str:
        d = dict(full)
        for bucket in ("timed_moved", "pinned_moved"):
            items = list(full[bucket].items())
            kept = items[:cap]
            d[bucket] = (
                [k for k, _ in kept] if keys_only else dict(kept)
            )
            if len(items) > cap:
                d[bucket + "_truncated"] = len(items) - cap
        return json.dumps({"bench_diff": d}, separators=(",", ":"))

    for cap, keys_only in ((8, False), (4, False), (8, True), (2, True)):
        line = _render(cap, keys_only)
        if len(line) <= budget:
            return line
    return _render(0, True)


def main() -> int:
    new_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_SELF.json"
    )
    with open(new_path) as fh:
        new_payload = json.load(fh)
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as fh:
            old = json.load(fh)
        d = diff(new_payload.get("queries", {}), old.get("queries", {}))
        print(json.dumps({"bench_diff": d}, separators=(",", ":")))
        return 1 if (d["timed_moved"] or d["pinned_moved"]) else 0
    line = compare_line(new_payload)
    print(line)
    parsed = json.loads(line)["bench_diff"]
    moved = isinstance(parsed, dict) and (
        parsed["timed_moved"] or parsed["pinned_moved"]
    )
    return 1 if moved else 0


if __name__ == "__main__":
    sys.exit(main())
