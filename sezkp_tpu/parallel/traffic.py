"""ICI collective-traffic accounting for the sharded prover.

Two complementary views (SCALING.md; VERDICT round-2 item 4):

- `collective_bytes_from_hlo`: parse the compiled XLA module of a sharded
  program and tally the actual bytes each collective moves per device —
  ground truth for what XLA emitted (counted on the virtual CPU mesh; the
  op set is identical on TPU, where the collectives ride ICI).
- `analytic_phase_bytes`: closed-form per-device byte volumes for every
  collective in phases 1/2 as a function of (base_log2, blow_log2, D) —
  validated against the HLO counts at small sizes, then extrapolated to
  the north-star domains where compiling the program would need real HBM.

No reference counterpart (the Rust prover is single-process); the model
follows the standard TPU scaling methodology: per-link volume for a
D-device 1-D ring, all_to_all and all_gather both move (D-1)/D of the
payload out of each device.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVES = ("all-to-all", "all-gather", "collective-permute",
                "all-reduce", "reduce-scatter")

_SHAPE_RE = re.compile(r"\b([a-z]+[0-9]*)\[([0-9,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    total = _DTYPE_BYTES[dt]
    if dims:
        for d in dims.split(","):
            total *= int(d)
    return total


_PAIRS_RE = re.compile(r"source_target_pairs=\{((?:\{\d+,\d+\},?)*)\}")


def collective_bytes_from_hlo(hlo_text: str, n_devices: int) -> Dict[str, dict]:
    """Tally per-collective-kind op counts and per-device bytes moved.

    For each collective op the *output* shape is the per-device payload
    (HLO shapes inside SPMD partitions are already per-device). Bytes sent
    per device: all-to-all and all-gather move (D-1)/D of the payload over
    the links; all-reduce moves ~2(D-1)/D (ring).

    collective-permute is attributed by its actual `source_target_pairs`
    membership: a device only sends if it appears as a source, so the mean
    per-device link volume is payload x len(pairs)/D — NOT payload x 1.
    (The sharded FRI fold's half-shard exchanges permute between disjoint
    half-mesh source sets; counting full payload on every device
    double-counted them — SCALING.md's former 'known 2x artifact',
    VERDICT round-3 item 6.)"""
    out: Dict[str, dict] = {}
    frac = (n_devices - 1) / n_devices
    factor = {
        "all-to-all": frac,
        "all-gather": frac,
        "all-reduce": 2 * frac,
        "reduce-scatter": frac,
    }
    for line in hlo_text.splitlines():
        line = line.strip()
        m = re.match(r"%?[\w.\-]+\s*=\s*(\([^)]*\)|[a-z]+[0-9]*\[[0-9,]*\][^ ]*)\s+([a-z\-]+)", line)
        if not m:
            continue
        shape_str, op = m.groups()
        if op not in _COLLECTIVES:
            continue
        if shape_str.startswith("("):
            # tuple shapes list dims with commas too; parse each leaf shape
            nbytes = sum(
                _shape_bytes(s) for s in re.findall(r"[a-z]+[0-9]*\[[0-9,]*\]", shape_str)
            )
        else:
            nbytes = _shape_bytes(shape_str)
        if op == "collective-permute":
            pm = _PAIRS_RE.search(line)
            n_pairs = len(re.findall(r"\{\d+,\d+\}", pm.group(1))) if pm else n_devices
            f = n_pairs / n_devices
        else:
            f = factor[op]
        rec = out.setdefault(op, {"ops": 0, "payload_bytes": 0, "link_bytes": 0.0})
        rec["ops"] += 1
        rec["payload_bytes"] += nbytes
        rec["link_bytes"] += nbytes * f
    return out


def analytic_phase_bytes(base_log2: int, blow_log2: int, d: int,
                         tau: int = 8) -> Dict[str, float]:
    """Per-device ICI byte volumes for one sharded prove (both phases).

    Every field element moves as two u32 planes (8 B). Formulas follow
    parallel/prove_sharded.py's collectives one-for-one:

    phase 1 (per device, payload bytes; multiply by (D-1)/D for link):
      halo ppermute      : 2 slabs x tau rows x 1 col x 8 B       (tiny)
      intt input a2a     : n/D x 8
      intt internal a2a  : n/D x 8
      coeff relayout a2a : 2 x n/D x 8
      lde internal a2a   : ln/D x 8
      natural order a2a  : ln/D x 8
      roots all_gather   : 32 x D                                  (tiny)
    phase 2:
      fold ppermutes     : sum over device layers of (m_l/D) x 8
                           (the four half-shard ppermutes move each
                           device's full local layer once)
      tail all_gather    : 2^MIN_DEVICE_LAYER_LOG2 x 8 x (D-1)/D
      roots all_gather   : 32 x L x D                              (tiny)
    """
    from .prove_sharded import MIN_DEVICE_LAYER_LOG2

    n = 1 << base_log2
    ln = 1 << (base_log2 + blow_log2)
    b = 8.0
    frac = (d - 1) / d if d > 1 else 0.0

    phase1 = {
        "halo_ppermute": 2 * 2 * tau * b,
        "intt_input_a2a": (n / d) * b * frac,
        "intt_internal_a2a": (n / d) * b * frac,
        "coeff_relayout_a2a": 2 * (n / d) * b * frac,
        "lde_internal_a2a": (ln / d) * b * frac,
        "natural_order_a2a": (ln / d) * b * frac,
        "roots_all_gather": 32.0 * d * frac,
    }
    dev_layers = max(1, (base_log2 + blow_log2) - MIN_DEVICE_LAYER_LOG2)
    fold = 0.0
    m = ln
    for _ in range(dev_layers):
        fold += (m / d) * b  # ppermute: full local layer crosses once
        m //= 2
    phase2 = {
        "fold_ppermutes": fold,
        "tail_all_gather": float(1 << MIN_DEVICE_LAYER_LOG2) * b * frac,
        "roots_all_gather": 32.0 * dev_layers * d * frac,
    }
    total = sum(phase1.values()) + sum(phase2.values())
    return {"phase1": phase1, "phase2": phase2, "total_per_device": total}


def scaling_model(base_log2: int, blow_log2: int, d: int,
                  single_chip_seconds: float,
                  ici_bytes_per_s: float = 200e9, tau: int = 8,
                  host_seconds: float = 0.0) -> dict:
    """Predicted scaling efficiency 1 -> D chips.

    t_D = t_1_dev/D + traffic_D / ICI_BW + t_host (serial, pessimistic) and
    max(t_1_dev/D, traffic) + t_host (overlapped); efficiency is
    t_1 / (D * t_D) where t_1 = t_1_dev + t_host. v5e ICI: 4 links x
    400 Gb/s ~ 200 GB/s per chip usable (public spec).

    `host_seconds` is the measured host-serialized transcript time (root
    pulls, Fiat-Shamir, query planning, proof assembly) — it does NOT
    shrink with D, so it is the real Amdahl term that bounds efficiency at
    t_dev/(t_dev + t_host) as D grows (SCALING.md caveat 2, VERDICT
    round-3 item 6). `single_chip_seconds` here is the DEVICE portion of
    the single-chip prove (total minus host_seconds)."""
    tr = analytic_phase_bytes(base_log2, blow_log2, d, tau)
    t_ici = tr["total_per_device"] / ici_bytes_per_s
    t_comp = single_chip_seconds / d
    t_serial = t_comp + t_ici + host_seconds
    t_overlap = max(t_comp, t_ici) + host_seconds
    t_1 = single_chip_seconds + host_seconds
    return {
        "d": d,
        "traffic_per_device_bytes": tr["total_per_device"],
        "t_compute_s": t_comp,
        "t_ici_s": t_ici,
        "t_host_s": host_seconds,
        "efficiency_serial": t_1 / (d * t_serial),
        "efficiency_overlapped": t_1 / (d * t_overlap),
    }
