"""STARK v1 prover (column commitments + DEEP coset LDE + FRI + openings).

Transcript schedule is byte-identical to crates/sezkp-stark/src/v1/prover.rs:
  manifest_root, n, tau -> col roots -> alphas -> masks -> ood point ->
  fri layer roots (root0 then betas then folded roots) -> AIR row queries ->
  FRI queries.

TPU-first re-architecture of the compute:
- the composition polynomial is evaluated for ALL rows in one vectorized pass
  (the reference evaluates per-row, re-deriving omega^i incrementally);
- the DEEP coset LDE (INTT -> coset NTT -> divide) runs as one fused JAX
  program on device for large domains (ops/ntt_jax.deep_coset_lde_u64);
- FRI layer hashing/folding is batched;
- openings are answered from cached chunked commitments, not by re-driving
  the whole LDE stream per query (reference prover.rs:312-398 re-streams the
  full pipeline once per tree level per query — same proof bytes, radically
  different schedule).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from ...core.types import BlockSummary
from ...crypto.transcript import Blake3Transcript
from ...ops import goldilocks as G
from ...ops import ntt as ntt_host
from . import params
from .air import Alphas, compose_all_rows
from .columns import TraceColumns
from .fri import fri_open_query, fri_commit, layer_tree
from .masking import (
    DEFAULT_MASK_DEG,
    DEFAULT_N_MASKS,
    derive_mask_coeffs,
    eval_masks_sum_at_points,
)
from .openings import ColumnEngine
from .proof import FriQuery, PerTapeOpen, ProofV1, RowOpenings

# Domain-size threshold above which the fused JAX/TPU LDE kernel is used.
# Below this the host numpy path wins (the device kernel's one-time compile
# cost dominates at small sizes).
JAX_LDE_MIN_LOG2 = 15


def _use_device_cols(n: int) -> bool:
    """Full device pipeline threshold (columns derived on device)."""
    if n < (1 << 13):
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_device_fri(lde_n: int) -> bool:
    if lde_n < (1 << 14):
        return False
    try:
        import jax

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _next_wrap(idx: int, n: int) -> int:
    if n == 0:
        return 0
    return idx + 1 if idx + 1 < n else 0


def _nudge_off_coset(z: int, shift: int, lde_k_log2: int) -> int:
    p = int(G.P)
    shift_inv = G.inv(shift)
    def on_coset(zz: int) -> bool:
        t = zz * shift_inv % p
        for _ in range(lde_k_log2):
            t = t * t % p
        return t == 1
    while on_coset(z):
        z = (z + 1) % p
    return z


def _deep_lde(base_vals: np.ndarray, blow_log2: int, shift: int, z: int) -> np.ndarray:
    n = base_vals.shape[0]
    base_log2 = n.bit_length() - 1
    if base_log2 >= JAX_LDE_MIN_LOG2:
        try:
            import jax

            if jax.default_backend() == "tpu":
                from ...ops import ntt_pallas

                return ntt_pallas.deep_coset_lde_u64(base_vals, blow_log2, shift, z)
            from ...ops import ntt_jax

            return ntt_jax.deep_coset_lde_u64(base_vals, blow_log2, shift, z)
        except Exception:
            pass
    coeffs = ntt_host.interpolate_from_evals(base_vals)
    y = ntt_host.evaluate_on_coset_pow2(coeffs, base_log2 + blow_log2, shift)
    lde_n = 1 << (base_log2 + blow_log2)
    xs = G.mul(
        np.uint64(shift), ntt_host.powers(G.primitive_root_2exp(base_log2 + blow_log2), lde_n)
    )
    denom = G.sub(xs, np.uint64(z))
    return G.mul(y, G.inv_array(denom))


def _release_planes_if_large(dc, n_cols: int, n: int) -> None:
    """Drop the [C, n] device column planes when they exceed the budget
    (SEZKP_RELEASE_PLANES_BYTES, default 2 GiB) — shared by the pre-LDE and
    post-openings release sites so the threshold cannot drift."""
    import os

    if dc is None or not dc.planes_resident:
        return
    if 2 * 4 * n_cols * n >= int(
        os.environ.get("SEZKP_RELEASE_PLANES_BYTES", 2 << 30)
    ):
        dc.release_planes()


def prove_v1(
    blocks: Sequence[BlockSummary],
    manifest_root: bytes,
    streaming: bool = False,
    engine=None,
    tc=None,
) -> ProofV1:
    """Produce a v1 proof. `streaming=True` selects the O(chunk)-memory
    column engine (recompute-on-open) — same proof bytes, different memory
    schedule (reference: StarkV1::prove_streaming, lib.rs:170-191).

    `engine` injects a custom column-commitment engine (e.g. the sharded
    multi-chip one, parallel/engine.py); `tc` optionally supplies the host
    TraceColumns alongside it to avoid rebuilding them."""
    n = sum(b.n_steps for b in blocks)
    tau = blocks[0].tau if blocks else 0
    assert n & (n - 1) == 0 and n > 0, "trace length must be a power of two"

    # Fully device-resident pipeline: columns derived from the raw movement
    # logs on device, hashed/committed/composed/LDE'd/FRI'd there; only the
    # logs go up and roots/paths come back.
    device_pipeline = engine is None and not streaming and _use_device_cols(n)
    dc = None
    if device_pipeline:
        from .columns_device import DeviceColumns

        dc = DeviceColumns(blocks)
    elif tc is None:
        tc = TraceColumns.build(blocks)

    tr = Blake3Transcript(params.DS_V1_DOMAIN)
    tr.absorb("manifest_root", manifest_root)
    tr.absorb_u64("n", n)
    tr.absorb_u64("tau", tau)

    # ---- column commitments (batched; streaming = chunked recompute) ----
    if engine is None:
        if streaming:
            from .openings import StreamingColumnEngine

            engine = StreamingColumnEngine(blocks, params.COL_CHUNK_LOG2)
        else:
            engine = ColumnEngine(tc, params.COL_CHUNK_LOG2, dc=dc)
    col_roots = engine.build_roots()
    tr.absorb_u64(params.DS_N_COLS, len(col_roots))
    for cr in col_roots:
        tr.absorb(params.DS_COL_ROOT, cr.root)

    # ---- alphas / masks / OOD point ----
    alphas = Alphas.from_list(params.derive_alphas(tr))
    mask_coeffs = derive_mask_coeffs(tr, DEFAULT_MASK_DEG, DEFAULT_N_MASKS)

    blow_log2 = params.BLOWUP.bit_length() - 1
    base_log2 = n.bit_length() - 1
    lde_k_log2 = base_log2 + blow_log2
    lde_n = 1 << lde_k_log2

    shift = 3
    z = params.derive_ood_point(tr)
    z = _nudge_off_coset(z, shift, lde_k_log2)

    # ---- base composition + ZK masks + DEEP coset LDE ----
    fri_eng = None
    if engine is not None and hasattr(engine, "deep_lde_fri"):
        # mesh-sharded hot path: composition, LDE, and FRI run as SPMD
        # programs over the engine's device mesh (parallel/prove_sharded.py)
        fri_eng = engine.deep_lde_fri(alphas, mask_coeffs, blow_log2, shift, z)
    elif device_pipeline:
        import os

        from ...ops import ntt_pallas
        from .columns_device import compose_device
        from .fri_device import DeviceFri

        base_planes = compose_device(dc, alphas, mask_coeffs)
        # At T >= ~2^22 the [C, n] column planes (~8 GB at 2^24, tau=8)
        # cannot stay resident through the LDE/FRI transients; drop them now
        # and let the openings phase re-derive from the raw device inputs.
        _release_planes_if_large(dc, len(engine.labels), n)
        lde_planes = ntt_pallas.deep_coset_lde_planes(base_planes, blow_log2, shift, z)
        fri_eng = DeviceFri(planes=lde_planes)
    else:
        comp = compose_all_rows(tc, alphas)
        w_base_pows = ntt_host.powers(G.primitive_root_2exp(base_log2), n)
        base_vals = G.add(comp, eval_masks_sum_at_points(mask_coeffs, w_base_pows))
        lde_vals = _deep_lde(base_vals, blow_log2, shift, z)
        if _use_device_fri(lde_n):
            from .fri_device import DeviceFri

            fri_eng = DeviceFri(lde_vals)

    # ---- FRI commit: bind root0, betas, fold + bind roots ----
    if fri_eng is not None:
        root0 = fri_eng.commit_layer0()
        tr.absorb(params.DS_FRI_LAYER_ROOT, root0)
        betas = params.derive_betas_for_fri(tr, lde_k_log2)
        rest = fri_eng.commit_rest(betas)
        for r in rest:
            tr.absorb(params.DS_FRI_LAYER_ROOT, r)
        roots = [root0] + rest
        fri_final_value_le = fri_eng.final_value_le()
    else:
        roots, layers, betas = fri_commit(tr, lde_vals)
        trees = [layer_tree(layer) for layer in layers]
        fri_final_value_le = G.to_le_bytes(layers[-1][0]).tobytes()

    # ---- AIR query openings (batched: one device round-trip for all paths) --
    rows = params.derive_queries(tr, n, params.NUM_QUERIES)
    requests = []
    for row in rows:
        ip1 = _next_wrap(row, n)
        for r in range(tau):
            requests += [
                (f"mv_{r}", row), (f"mv_{r}", ip1),
                (f"wflag_{r}", row), (f"wsym_{r}", row),
                (f"head_{r}", row), (f"head_{r}", ip1),
                (f"winlen_{r}", row), (f"in_off_{r}", row), (f"out_off_{r}", row),
            ]
        requests += [("is_first", row), ("is_last", row), ("input_mv", row)]
    opened = iter(engine.open_batch(requests))

    queries: List[RowOpenings] = []
    for row in rows:
        per_tape = [
            PerTapeOpen(
                mv=next(opened), next_mv=next(opened), write_flag=next(opened),
                write_sym=next(opened), head=next(opened), next_head=next(opened),
                win_len=next(opened), in_off=next(opened), out_off=next(opened),
            )
            for _ in range(tau)
        ]
        queries.append(
            RowOpenings(
                row=row,
                per_tape=per_tape,
                is_first=next(opened),
                is_last=next(opened),
                input_mv=next(opened),
            )
        )

    if device_pipeline:
        # AIR openings done; free the planes before the FRI gathers
        _release_planes_if_large(dc, len(engine.labels), n)

    # ---- FRI queries ----
    fri_rows = params.derive_queries(tr, lde_n, params.NUM_QUERIES)
    if fri_eng is not None:
        fri_queries: List[FriQuery] = fri_eng.open_queries(fri_rows)
    else:
        fri_queries = [fri_open_query(layers, trees, idx0) for idx0 in fri_rows]

    return ProofV1(
        domain_n=lde_n,
        tau=tau,
        col_roots=col_roots,
        queries=queries,
        fri_roots=roots,
        fri_queries=fri_queries,
        fri_final_value_le=fri_final_value_le,
        manifest_root=manifest_root,
    )
