"""Measure + model ICI collective traffic of the sharded prover.

1. Compiles the production phase-1/phase-2 shard_map programs on the
   virtual 8-device CPU mesh at a small size and tallies the bytes every
   collective moves per device straight from the compiled HLO
   (parallel/traffic.py::collective_bytes_from_hlo).
2. Validates the analytic per-collective model against those counts.
3. Extrapolates the model to the north-star domains and prints the
   predicted 1->D scaling efficiencies at v5e ICI bandwidth (SCALING.md).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python scripts/sharded_traffic.py [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--base-log2", type=int, default=12)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from sezkp_tpu.parallel import prove_sharded as PS
    from sezkp_tpu.parallel.mesh import make_mesh, make_global
    from sezkp_tpu.parallel.traffic import (
        analytic_phase_bytes,
        collective_bytes_from_hlo,
        scaling_model,
    )
    from sezkp_tpu.stark.v1.prover import DEFAULT_MASK_DEG, DEFAULT_N_MASKS
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    d = 8
    base_log2 = args.base_log2
    blow_log2 = 3
    tau = 2
    n = 1 << base_log2
    blocks = partition_trace(generate_trace(n, tau), 512)
    nb = len(blocks)
    mesh = make_mesh(d)

    f1, _m, tabs = PS._build_phase1(
        d, base_log2, blow_log2, tau, DEFAULT_N_MASKS, DEFAULT_MASK_DEG, 3,
        nb=nb, raw=True, tops=False,
    )
    raw_args = PS.raw_shard_args(mesh, d, blocks)
    a = np.zeros(11, dtype=np.uint32)
    mc = np.zeros((DEFAULT_N_MASKS, DEFAULT_MASK_DEG), dtype=np.uint32)
    z = np.uint32(1)
    tab_args = {
        k: tabs[k]
        for k in (
            "t_inv1", "t_inv2", "t_f1", "t_f2", "w_inv", "w_fwd",
            "inv_n", "s1", "s2", "x1", "x2", "xs_loc", "xs_dev",
        )
    }
    lowered = f1.lower(
        *raw_args,
        PS._gin(mesh, P(), a), PS._gin(mesh, P(), a),
        PS._gin(mesh, P(), mc), PS._gin(mesh, P(), mc),
        PS._gin(mesh, P(), z), PS._gin(mesh, P(), z),
        tab_args,
    )
    hlo1 = lowered.compile().as_text()
    c1 = collective_bytes_from_hlo(hlo1, d)

    ln_log2 = base_log2 + blow_log2
    L = max(1, ln_log2 - PS.MIN_DEVICE_LAYER_LOG2)
    f2, _m2 = PS._build_phase2(d, ln_log2, L, False)
    lde = make_global(mesh, P(None), np.zeros(1 << ln_log2, np.uint32))
    betas = make_global(mesh, P(), np.zeros(L, np.uint32))
    hlo2 = f2.lower(lde, lde, betas, betas).compile().as_text()
    c2 = collective_bytes_from_hlo(hlo2, d)

    model = analytic_phase_bytes(base_log2, blow_log2, d, tau)
    measured_total = sum(v["link_bytes"] for v in c1.values()) + sum(
        v["link_bytes"] for v in c2.values()
    )

    print(f"== measured (compiled HLO, D={d}, n=2^{base_log2}, LDE 2^{ln_log2}) ==")
    for name, c in (("phase1", c1), ("phase2", c2)):
        for op, rec in sorted(c.items()):
            print(f"  {name:7s} {op:20s} ops={rec['ops']:4d} "
                  f"payload={rec['payload_bytes']/1e6:8.3f} MB "
                  f"link={rec['link_bytes']/1e6:8.3f} MB")
    print(f"  total link bytes/device: {measured_total/1e6:.3f} MB")
    print(f"== analytic model ==")
    for ph in ("phase1", "phase2"):
        for k, v in model[ph].items():
            print(f"  {ph:7s} {k:20s} {v/1e6:8.3f} MB")
    print(f"  total: {model['total_per_device']/1e6:.3f} MB "
          f"(measured/model = {measured_total/model['total_per_device']:.2f})")

    # north-star extrapolation (single-chip prove seconds from
    # benchmarks/reports/prove_large.jsonl, tau=8 production configs).
    # t_host: measured host-serialized transcript fraction from
    # scripts/measure_host_transcript.py when a report exists (scaled
    # linearly in T from the measured size), else 0 with a warning.
    host_frac = 0.0
    host_src = None
    reports = sorted(
        pathlib.Path(REPO, "benchmarks", "reports").glob("host_transcript_*.json")
    )
    if reports:
        hr = json.loads(reports[-1].read_text())
        host_frac = hr["host_serial_s"] / hr["total_warm_s"]
        host_src = reports[-1].name
    print(f"== predicted scaling efficiency (v5e, 200 GB/s ICI/chip; "
          f"t_host from {host_src or 'NONE — host term 0'}) ==")
    rows = []
    for (b2, t1) in ((23, 17.0), (24, 45.0)):
        for dd in (2, 4, 8):
            # ICI-only model (efficiency_serial keeps its r3 meaning) plus
            # the host-inclusive Amdahl number alongside it
            m = scaling_model(b2, 3, dd, t1)
            mh = scaling_model(b2, 3, dd, t1 * (1 - host_frac),
                               host_seconds=t1 * host_frac)
            m["t_host_s"] = mh["t_host_s"]
            m["efficiency_with_host"] = mh["efficiency_serial"]
            rows.append({"base_log2": b2, **m})
            print(f"  T=2^{b2} (LDE 2^{b2+3}) D={dd}: "
                  f"traffic {m['traffic_per_device_bytes']/1e9:.2f} GB/dev, "
                  f"t_comp {m['t_compute_s']:.2f}s t_ici {m['t_ici_s']:.2f}s "
                  f"t_host {m['t_host_s']:.2f}s, "
                  f"eff ICI-serial {m['efficiency_serial']:.2%} / "
                  f"with-host {m['efficiency_with_host']:.2%}")

    if args.json:
        with open(args.json, "w") as fh:
            json.dump(
                {
                    "measured_small": {"phase1": c1, "phase2": c2,
                                       "total_link_bytes": measured_total},
                    "analytic_small": model,
                    "predictions": rows,
                },
                fh, indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
