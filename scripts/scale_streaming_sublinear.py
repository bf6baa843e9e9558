#!/usr/bin/env python3
"""Memory-scaling suite: verify the streaming paths keep RSS sublinear in T.

Linux-friendly re-implementation of the reference's zsh suite
(scripts/scale_streaming_sublinear.zsh): sweep T, run each pipeline stage in
a fresh subprocess, record peak RSS (ru_maxrss of the child), then fit
log-log slopes.  Healthy streaming verify should show p = dlog(RSS)/dlog(T)
well below 1 (reference README.md:188-193 expects ~0.05-0.3).

Usage:
  python scripts/scale_streaming_sublinear.py \
      --t-list 4096,16384,65536,262144 --b 64 --tau 8 --modes minram \
      --out-dir /tmp/sezkp-scale
"""

from __future__ import annotations

import argparse
import json
import math
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(argv, env=None) -> dict:
    """Run a CLI stage in a fresh subprocess; return wall ms + the child's own
    peak RSS (measured in-process by scripts/_rss_wrapper.py, so each stage
    gets an independent high-water mark)."""
    full_env = dict(os.environ)
    full_env["PYTHONPATH"] = REPO + os.pathsep + full_env.get("PYTHONPATH", "")
    if env:
        full_env.update(env)
    rss_file = os.path.join("/tmp", f".sezkp-rss-{os.getpid()}-{time.monotonic_ns()}")
    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_rss_wrapper.py"), rss_file]
        + argv,
        env=full_env,
        capture_output=True,
        text=True,
    )
    ms = (time.perf_counter() - t0) * 1e3
    if r.returncode != 0:
        raise RuntimeError(f"stage {argv} failed:\n{r.stdout}\n{r.stderr}")
    with open(rss_file) as f:
        rss = json.load(f)["rss_kib"]
    os.remove(rss_file)
    return {"ms": ms, "rss_kib": rss}


def loglog_slope(xs, ys) -> float:
    lx = [math.log(x) for x in xs]
    ly = [math.log(max(y, 1)) for y in ys]
    n = len(xs)
    mx, my = sum(lx) / n, sum(ly) / n
    num = sum((a - mx) * (b - my) for a, b in zip(lx, ly))
    den = sum((a - mx) ** 2 for a in lx)
    return num / den if den else float("nan")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--t-list", default="4096,16384,65536")
    ap.add_argument("--b", type=int, default=64)
    ap.add_argument("--tau", type=int, default=8)
    ap.add_argument("--modes", default="minram")
    ap.add_argument("--fold-cache", type=int, default=64)
    ap.add_argument("--out-dir", default="/tmp/sezkp-scale")
    args = ap.parse_args()

    ts = [int(x) for x in args.t_list.split(",")]
    os.makedirs(args.out_dir, exist_ok=True)

    results = []
    for t in ts:
        d = os.path.join(args.out_dir, f"t{t}")
        os.makedirs(d, exist_ok=True)
        # .cbor: the reference's native block format; the streaming writer's
        # vectorized encoder and the windowed cbor reader keep both the
        # simulate and read sides O(window) (jsonl also works but encodes
        # ~10x slower at the 2^24+ sizes this suite sweeps)
        blocks = os.path.join(d, "blocks.cbor")
        manifest = os.path.join(d, "manifest.cbor")
        proof = os.path.join(d, "proof.cbor")

        rec = {"t": t}
        rec["simulate"] = run_stage(
            ["simulate", "--t", str(t), "--b", str(args.b), "--tau", str(args.tau),
             "--out-blocks", blocks]
        )
        rec["commit"] = run_stage(["commit", "--blocks", blocks, "--out", manifest])
        rec["precheck"] = run_stage(
            ["verify-commit", "--blocks", blocks, "--manifest", manifest]
        )
        for mode in args.modes.split(","):
            rec[f"prove_{mode}"] = run_stage(
                ["prove", "--backend", "fold", "--blocks", blocks,
                 "--manifest", manifest, "--out", proof,
                 "--fold-mode", mode, "--fold-cache", str(args.fold_cache),
                 "--stream", "--assume-committed"]
            )
            rec[f"verify_{mode}"] = run_stage(
                ["verify", "--backend", "fold", "--blocks", blocks,
                 "--manifest", manifest, "--proof", proof, "--assume-committed"]
            )
        results.append(rec)
        print(json.dumps(rec), flush=True)

    print("\n== log-log RSS slopes (p in RSS ~ T^p; sublinear means p << 1) ==")
    stages = [k for k in results[0] if k != "t"]
    for st in stages:
        xs = [r["t"] for r in results]
        ys = [r[st]["rss_kib"] for r in results]
        print(f"{st:16s} p = {loglog_slope(xs, ys):+.3f}   rss(KiB) = {ys}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
