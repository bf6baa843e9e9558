"""STARK v1 verifier (reference: crates/sezkp-stark/src/v1/verify.rs)."""

from __future__ import annotations

from typing import Dict, Sequence

from ...core.types import BlockSummary
from ...crypto.transcript import Blake3Transcript
from ...ops import goldilocks as G
from . import params
from .air import (
    Alphas,
    RowView,
    compose_boundary_from_openings,
    compose_row_from_openings,
)
from .fri import fri_verify
from .masking import DEFAULT_MASK_DEG, DEFAULT_N_MASKS, derive_mask_coeffs
from .merkle import verify_chunked_open
from .proof import Opening, ProofV1


def _verify_opening(root_map: Dict[str, bytes], label: str, op: Opening) -> None:
    root = root_map.get(label)
    if root is None:
        raise ValueError(f"missing col root for {label}")
    ok = verify_chunked_open(
        root,
        label,
        op.value_le,
        op.chunk_root,
        op.index_in_chunk,
        op.path_in_chunk,
        op.chunk_index,
        op.path_to_chunk,
    )
    if not ok:
        raise ValueError(f"chunked merkle path failed for column {label} @ {op.index}")


def verify_v1(proof: ProofV1, blocks: Sequence[BlockSummary]) -> None:
    blow = params.BLOWUP
    if proof.domain_n % blow != 0:
        raise ValueError("FRI domain_n not multiple of blowup")
    n = proof.domain_n // blow
    if n & (n - 1) != 0:
        raise ValueError("trace length n must be a power of two")

    tau = proof.tau
    if blocks and blocks[0].tau != tau:
        raise ValueError(
            f"tau mismatch vs. block windows: got {tau}, expected {blocks[0].tau}"
        )

    # ---- transcript prelude + col roots ----
    tr = Blake3Transcript(params.DS_V1_DOMAIN)
    tr.absorb("manifest_root", proof.manifest_root)
    tr.absorb_u64("n", n)
    tr.absorb_u64("tau", tau)
    tr.absorb_u64(params.DS_N_COLS, len(proof.col_roots))
    for cr in proof.col_roots:
        tr.absorb(params.DS_COL_ROOT, cr.root)

    alphas = Alphas.from_list(params.derive_alphas(tr))
    _ = derive_mask_coeffs(tr, DEFAULT_MASK_DEG, DEFAULT_N_MASKS)
    _ = params.derive_ood_point(tr)  # alignment only

    # ---- AIR row-query re-derivation (FRI roots already absorbed by prover) --
    n_layers = len(proof.fri_roots)
    tr_rows = tr.clone()
    if n_layers > 0:
        tr_rows.absorb(params.DS_FRI_LAYER_ROOT, proof.fri_roots[0])
        _ = params.derive_betas_for_fri(tr_rows, max(n_layers - 1, 0))
        for r in range(1, n_layers):
            tr_rows.absorb(params.DS_FRI_LAYER_ROOT, proof.fri_roots[r])

    expected_rows = params.derive_queries(tr_rows, n, params.NUM_QUERIES)
    if len(expected_rows) != len(proof.queries):
        raise ValueError(
            f"AIR query count mismatch (expected {len(expected_rows)}, "
            f"got {len(proof.queries)})"
        )
    for i, q in enumerate(proof.queries):
        if q.row != expected_rows[i]:
            raise ValueError(
                f"AIR query row mismatch at position {i}: got {q.row}, "
                f"expected {expected_rows[i]}"
            )

    # ---- openings + AIR composition ----
    root_map = {c.label: c.root for c in proof.col_roots}
    for q in proof.queries:
        _verify_opening(root_map, "input_mv", q.input_mv)
        _verify_opening(root_map, "is_first", q.is_first)
        _verify_opening(root_map, "is_last", q.is_last)
        for r, t in enumerate(q.per_tape):
            _verify_opening(root_map, f"mv_{r}", t.mv)
            _verify_opening(root_map, f"mv_{r}", t.next_mv)
            _verify_opening(root_map, f"wflag_{r}", t.write_flag)
            _verify_opening(root_map, f"wsym_{r}", t.write_sym)
            _verify_opening(root_map, f"head_{r}", t.head)
            _verify_opening(root_map, f"head_{r}", t.next_head)
            _verify_opening(root_map, f"winlen_{r}", t.win_len)
            _verify_opening(root_map, f"in_off_{r}", t.in_off)
            _verify_opening(root_map, f"out_off_{r}", t.out_off)

        rv = RowView.from_openings(q)
        c = (
            compose_row_from_openings(rv, alphas)
            + compose_boundary_from_openings(rv, alphas)
        ) % int(G.P)
        if c != 0:
            raise ValueError(f"AIR composition non-zero at row {q.row}")

    # ---- FRI ----
    fri_verify(tr, proof.fri_roots, proof.fri_queries, proof.fri_final_value_le)
