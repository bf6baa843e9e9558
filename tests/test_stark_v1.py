"""STARK v1: e2e prove/verify, bincode roundtrip, adversarial AIR tests.

Mirrors the reference test strategy (crates/sezkp-stark/tests/*): valid
blocks use window-anchored walks (left = 0) like the reference's demo blocks;
negative tests follow the "prover OR verifier must reject; else the
full-column composition must be non-zero" pattern (air_fail_bit_range.rs).
"""

import numpy as np
import pytest

from sezkp_tpu.core.types import BlockSummary, MovementLog
from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.stark.backends import StarkV1
from sezkp_tpu.stark.v1 import proof as PM
from sezkp_tpu.stark.v1.air import Alphas, compose_all_rows
from sezkp_tpu.stark.v1.columns import TraceColumns
from sezkp_tpu.stark.v1.prover import prove_v1
from sezkp_tpu.stark.v1.verify import verify_v1


def demo_block(t: int, block_id: int = 1, step_lo: int = 1, tau: int = 1) -> BlockSummary:
    """Anchored demo block: mv alternates {1,0}, writes symbol 5 every 3rd row
    (reference: tests/air_ok.rs demo_block)."""
    mv = np.array([[1 if i % 2 == 0 else 0] * tau for i in range(t)], dtype=np.int8)
    wf = np.array([[i % 3 == 0] * tau for i in range(t)], dtype=bool)
    ws = np.where(wf, 5, 0).astype(np.uint16)
    head_last = int(mv[:, 0].astype(np.int64).sum())
    return BlockSummary(
        version=1,
        block_id=block_id,
        step_lo=step_lo,
        step_hi=step_lo + t - 1,
        ctrl_in=0,
        ctrl_out=0,
        in_head_in=0,
        in_head_out=0,
        windows=np.array([[0, max(t, 1) - 1]] * tau, dtype=np.int64),
        head_in_offsets=np.zeros(tau, dtype=np.uint32),
        head_out_offsets=np.full(tau, head_last, dtype=np.uint32),
        movement_log=MovementLog(
            input_mv=np.zeros(t, dtype=np.int8),
            tape_mv=mv,
            write_flag=wf,
            write_sym=ws,
        ),
        pre_tags=[b"\x00" * 16] * tau,
        post_tags=[b"\x00" * 16] * tau,
    )


def demo_blocks(n_blocks: int, t: int, tau: int = 1):
    return [
        demo_block(t, block_id=i + 1, step_lo=1 + i * t, tau=tau)
        for i in range(n_blocks)
    ]


MANIFEST = bytes([7]) * 32


def test_v1_valid_proof_verifies_single_block():
    blocks = [demo_block(16)]
    art = StarkV1.prove(blocks, MANIFEST)
    StarkV1.verify(art, blocks, MANIFEST)


def test_v1_valid_proof_verifies_multi_block_multi_tape():
    blocks = demo_blocks(4, 16, tau=2)
    art = StarkV1.prove(blocks, MANIFEST)
    StarkV1.verify(art, blocks, MANIFEST)


def test_v1_proof_bincode_roundtrip():
    blocks = demo_blocks(2, 16)
    p = prove_v1(blocks, MANIFEST)
    data = PM.encode_proof(p)
    p2 = PM.decode_proof(data)
    assert PM.encode_proof(p2) == data
    verify_v1(p2, blocks)


def test_v1_rejects_wrong_manifest_binding():
    blocks = [demo_block(16)]
    art = StarkV1.prove(blocks, MANIFEST)
    with pytest.raises(ValueError):
        StarkV1.verify(art, blocks, bytes([8]) * 32)


def test_v1_rejects_tampered_proof_bytes():
    blocks = [demo_block(16)]
    art = StarkV1.prove(blocks, MANIFEST)
    bad = bytearray(art.proof_bytes)
    bad[50] ^= 0xFF
    art.proof_bytes = bytes(bad)
    with pytest.raises(Exception):
        StarkV1.verify(art, blocks, MANIFEST)


def _prove_verify_or_composition_nonzero(blocks):
    """Reference negative-test pattern: prover or verifier rejects, or the
    full-column composition is non-zero somewhere."""
    try:
        art = StarkV1.prove(blocks, MANIFEST)
    except Exception:
        return
    try:
        StarkV1.verify(art, blocks, MANIFEST)
    except Exception:
        return
    tc = TraceColumns.build(blocks)
    alphas = Alphas.from_list([1] * 8)
    comp = compose_all_rows(tc, alphas)
    assert np.any(comp != 0), "invalid block must violate the AIR somewhere"


def test_air_fail_bit_range_symbol_too_wide():
    b = demo_block(16)
    b.movement_log.write_flag[0, 0] = True
    b.movement_log.write_sym[0, 0] = 32  # > 4-bit range
    _prove_verify_or_composition_nonzero([b])


def test_air_fail_endpoint_corrupt_in_offset():
    b = demo_block(16)
    b.head_in_offsets = np.array([3], dtype=np.uint32)  # breaks boundary_first
    _prove_verify_or_composition_nonzero([b])


def test_air_fail_endpoint_corrupt_out_offset():
    b = demo_block(16)
    b.head_out_offsets = np.array([0], dtype=np.uint32)  # exit head is 8
    _prove_verify_or_composition_nonzero([b])


def test_air_fail_write_outside_window():
    b = demo_block(16)
    # Shrink the window so late writes land outside it; slack goes negative.
    b.windows = np.array([[0, 2]], dtype=np.int64)
    b.head_out_offsets = np.array([2], dtype=np.uint32)
    _prove_verify_or_composition_nonzero([b])


def test_full_composition_zero_on_interior_rows_of_valid_block():
    blocks = demo_blocks(2, 16)
    tc = TraceColumns.build(blocks)
    alphas = Alphas.from_list(list(range(2, 10)))
    comp = compose_all_rows(tc, alphas)
    # Interior rows (not first/last of a block, and not wrapping row n-1)
    interior = np.ones(tc.n, dtype=bool)
    interior[tc.is_first == 1] = False
    interior[tc.is_last == 1] = False
    assert np.all(comp[interior] == 0)


def test_column_head_semantics_post_move():
    blocks = [demo_block(8)]
    tc = TraceColumns.build(blocks)
    mv = blocks[0].movement_log.tape_mv[:, 0].astype(np.int64)
    assert np.array_equal(tc.head[0], G.from_i64(np.cumsum(mv)))


def test_v1_unanchored_windows_prove_and_verify():
    """Honest generator traces whose windows extend LEFT of the block entry
    (off_in > 0) must verify — regression for the reference's head-anchoring
    bug (columns.rs:298-315 anchors head at entry; the AIR boundary terms
    air.rs:119-136 assume window-left anchoring, so the reference rejects
    its own honest proofs when a query row hits such a block's boundary row;
    see docs/parity.md #2). Config chosen so boundary rows make up 1/16 of
    the domain — a 30-query draw hits one with p ~ 0.86."""
    from sezkp_tpu.commit.merkle import commit_blocks
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    blocks = partition_trace(generate_trace(1024, 8), 32)
    assert any(int(b.head_in_offsets.max()) > 0 for b in blocks)
    man = commit_blocks(blocks)
    art = StarkV1.prove(blocks, man.root)
    StarkV1.verify(art, blocks, man.root)


def test_v1_composition_vanishes_on_honest_trace():
    """The full composition (row + boundary terms) must be identically zero
    on every row of an honest trace — the verifier's query check
    (verify.rs:178-180) demands it pointwise."""
    import numpy as np

    from sezkp_tpu.stark.v1 import air
    from sezkp_tpu.stark.v1.columns import TraceColumns
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    blocks = partition_trace(generate_trace(2048, 4), 64)
    tc = TraceColumns.build(blocks)
    alphas = air.Alphas.from_list(list(range(3, 11)))
    acc = air.compose_all_rows(tc, alphas)
    assert not np.any(acc), f"nonzero at rows {np.nonzero(acc)[0][:5]}"


@pytest.mark.slow
def test_scan_commit_and_recompute_openings_match_resident(monkeypatch):
    """Large-n path: segment-scanned roots (no resident CVs) + device chunk
    recompute on open must equal the host ColumnCommit exactly."""
    from sezkp_tpu.stark.v1.columns import TraceColumns
    from sezkp_tpu.stark.v1.columns_device import DeviceColumns
    from sezkp_tpu.stark.v1.openings import ColumnEngine

    blocks = demo_blocks(n_blocks=(1 << 12) // 64, t=64, tau=2)
    tc = TraceColumns.build(blocks)
    host = ColumnEngine(tc, chunk_log2=10)
    want_roots = host.build_roots()

    dc = DeviceColumns(blocks)
    eng = ColumnEngine(None, chunk_log2=10, dc=dc)
    monkeypatch.setattr(ColumnEngine, "_cv_budget_bytes", staticmethod(lambda: 0))
    eng._build_device()
    assert eng._dev_cvs is None  # scan path taken
    got_roots = eng.build_roots()
    assert [(r.label, r.root) for r in got_roots] == [
        (r.label, r.root) for r in want_roots
    ]

    reqs = [("mv_0", 5), ("head_1", 1 << 11), ("input_mv", (1 << 12) - 1),
            ("is_first", 0), ("wflag_1", 1027)]
    got = eng.open_batch(reqs)
    want = host.open_batch(reqs)
    for g, w in zip(got, want):
        assert g.value_le == w.value_le
        assert g.chunk_root == w.chunk_root
        assert g.path_in_chunk == w.path_in_chunk
        assert g.path_to_chunk == w.path_to_chunk

    # released planes -> derive_ranges path (the T>=2^24 opening schedule)
    dc.release_planes()
    got2 = eng.open_batch(reqs)
    assert not dc.planes_resident  # ranges path must not rematerialize
    for g, w in zip(got2, want):
        assert g.value_le == w.value_le
        assert g.chunk_root == w.chunk_root
        assert g.path_in_chunk == w.path_in_chunk
        assert g.path_to_chunk == w.path_to_chunk


@pytest.mark.slow
def test_device_pipeline_proof_bytes_match_host(monkeypatch):
    """Force the full device pipeline (DeviceColumns -> compose_device ->
    deep_coset_lde_planes -> DeviceFri) on the CPU backend and assert its
    proof bytes equal the host engine's. Round-1 left this branch gated on
    backend == "tpu" and it was never CI-covered — exactly where the
    test_fri_device hang lived (VERDICT round-1 item 3)."""
    from sezkp_tpu.stark.v1 import merkle as M
    from sezkp_tpu.stark.v1 import openings as O
    from sezkp_tpu.stark.v1 import prover as P
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.verify import verify_v1

    blocks = demo_blocks(n_blocks=4, t=1024, tau=2)  # n = 2^12, LDE 2^15
    host_proof = P.prove_v1(blocks, MANIFEST)

    monkeypatch.setattr(P, "_use_device_cols", lambda n: True)
    monkeypatch.setattr(P, "_use_device_fri", lambda n: True)
    monkeypatch.setattr(M, "_device_ready", lambda n: True)
    monkeypatch.setattr(O, "_device_ready", lambda n: True, raising=False)
    dev_proof = P.prove_v1(blocks, MANIFEST)

    assert encode_proof(dev_proof) == encode_proof(host_proof)
    verify_v1(dev_proof, blocks)


def test_compose_scan_matches_monolithic(monkeypatch):
    """The segment-scanned composition (large-n memory schedule) must be
    bit-identical to the monolithic device graph and the host oracle."""
    import numpy as np

    from sezkp_tpu.ops import goldilocks_jax as FJ
    from sezkp_tpu.stark.v1.columns import TraceColumns
    from sezkp_tpu.stark.v1.columns_device import DeviceColumns, compose_device
    from sezkp_tpu.stark.v1.masking import eval_masks_sum_at_points
    from sezkp_tpu.ops import goldilocks as G
    from sezkp_tpu.ops import ntt as ntt_host

    blocks = demo_blocks(n_blocks=8, t=128, tau=2)  # n = 2^10
    tc = TraceColumns.build(blocks)
    alphas = Alphas.from_list(list(range(3, 11)))
    mask_coeffs = [[5, 11, 17, 23]]

    comp = compose_all_rows(tc, alphas)
    w = ntt_host.powers(G.primitive_root_2exp(10), 1 << 10)
    want = G.add(comp, eval_masks_sum_at_points(mask_coeffs, w))

    dc = DeviceColumns(blocks)
    monkeypatch.setenv("SEZKP_COMPOSE_SCAN_MIN_LOG2", "10")
    got_scan = FJ.unpack(tuple(np.asarray(x) for x in compose_device(dc, alphas, mask_coeffs)))
    monkeypatch.setenv("SEZKP_COMPOSE_SCAN_MIN_LOG2", "30")
    got_mono = FJ.unpack(tuple(np.asarray(x) for x in compose_device(dc, alphas, mask_coeffs)))

    assert np.array_equal(got_scan, want)
    assert np.array_equal(got_mono, want)


@pytest.mark.slow
def test_device_pipeline_chunked_fri_proof_bytes_match_host(monkeypatch):
    """Same as above but with the chunked ("big") FRI tree mode forced via
    SEZKP_FRI_CHUNKED_MIN_LOG2 — the T>=2^24 memory schedule (tops-only
    trees + in-chunk path recompute) must produce byte-identical proofs."""
    from sezkp_tpu.stark.v1 import fri_device as FD
    from sezkp_tpu.stark.v1 import merkle as M
    from sezkp_tpu.stark.v1 import openings as O
    from sezkp_tpu.stark.v1 import prover as P
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.verify import verify_v1

    blocks = demo_blocks(n_blocks=4, t=1024, tau=2)  # n = 2^12, LDE 2^15
    host_proof = P.prove_v1(blocks, MANIFEST)

    monkeypatch.setattr(P, "_use_device_cols", lambda n: True)
    monkeypatch.setattr(P, "_use_device_fri", lambda n: True)
    monkeypatch.setattr(M, "_device_ready", lambda n: True)
    monkeypatch.setattr(O, "_device_ready", lambda n: True, raising=False)
    monkeypatch.setenv("SEZKP_FRI_CHUNKED_MIN_LOG2", "14")
    # exercise the scan-segmented hashing too (segments of 2^13 over 2^15)
    monkeypatch.setattr(FD, "SEG_LOG2", 13)
    big_proof = P.prove_v1(blocks, MANIFEST)

    assert encode_proof(big_proof) == encode_proof(host_proof)
    verify_v1(big_proof, blocks)
