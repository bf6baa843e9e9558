"""Fold line: gadgets, drivers (balanced/minram/streaming), verifiers.

Mirrors crates/sezkp-fold/tests/{fold_line,leaf_pi,are_iface,harness}.rs.
"""

import io
import os

import numpy as np
import pytest

from sezkp_tpu.commit.merkle import commit_blocks
from sezkp_tpu.core.prover import StreamingProver
from sezkp_tpu.fold.api import Commitment, DriverOptions, FoldMode, commit_pi
from sezkp_tpu.fold.are import CombineAux, InterfaceWitness, Pi, combine
from sezkp_tpu.fold.backend import FoldBackend, bundle_top, decode_envelope, encode_envelope_v2
from sezkp_tpu.fold.driver import (
    BundleCollectorSink,
    CborSeqSink,
    FoldProofBundle,
    StreamDriverSink,
    run_pipeline,
)
from sezkp_tpu.fold.gadgets import CryptoFold, CryptoLeaf, CryptoWrap
from sezkp_tpu.fold.verify import verify_bundle, verify_stream
from sezkp_tpu.trace.generator import generate_trace
from sezkp_tpu.trace.partition import partition_trace
from sezkp_tpu.utils import cbor


@pytest.fixture(scope="module")
def blocks():
    return partition_trace(generate_trace(128, 3), 8)


@pytest.fixture(scope="module")
def manifest(blocks):
    return commit_blocks(blocks)


def test_leaf_prove_verify_and_tamper(blocks):
    pi, c, pr = CryptoLeaf.prove_leaf(blocks[0])
    assert CryptoLeaf.verify_leaf(c, commit_pi(pi), pr)
    # pi-limb tamper
    bad_pi = Pi(pi.ctrl_in, pi.ctrl_out, pi.flags, (pi.acc[0] ^ 1,) + pi.acc[1:])
    assert not CryptoLeaf.verify_leaf(c, commit_pi(bad_pi), pr)
    # boundary-half swap detection (left/right digests swapped)
    pr2_public = pr.public
    swapped = type(pr2_public)(
        ctrl_in=pr2_public.ctrl_in,
        ctrl_out=pr2_public.ctrl_out,
        flags=pr2_public.flags,
        acc_limbs=pr2_public.acc_limbs[2:] + pr2_public.acc_limbs[:2],
        left_tail_digest=pr2_public.right_head_digest,
        right_head_digest=pr2_public.left_tail_digest,
    )
    pr_sw = type(pr)(swapped, pr.proof_mac, pr.mac)
    assert not CryptoLeaf.verify_leaf(c, commit_pi(pi), pr_sw)


def test_fold_gadget_roundtrip(blocks):
    pi0, c0, _ = CryptoLeaf.prove_leaf(blocks[0])
    pi1, c1, _ = CryptoLeaf.prove_leaf(blocks[1])
    iface = InterfaceWitness(pi0.ctrl_out, pi1.ctrl_in, b"\x01" * 32)
    c_par, pi_par, pf = CryptoFold.fold((c0, pi0), (c1, pi1), iface)
    assert CryptoFold.verify_fold(
        (c_par, commit_pi(pi_par)), (c0, commit_pi(pi0)), (c1, commit_pi(pi1)), pf
    )
    # wrong parent rejected
    bad = Commitment(b"\x02" * 32, c_par.len)
    assert not CryptoFold.verify_fold(
        (bad, commit_pi(pi_par)), (c0, commit_pi(pi0)), (c1, commit_pi(pi1)), pf
    )


def test_wrap_gadget(blocks):
    pi, c, _ = CryptoLeaf.prove_leaf(blocks[0])
    w = CryptoWrap.wrap((c, pi))
    assert CryptoWrap.verify_wrap((c, commit_pi(pi)), w)
    assert not CryptoWrap.verify_wrap((Commitment(b"\x09" * 32, 1), commit_pi(pi)), w)


def test_combine_is_associative_on_acc():
    a = Pi(0, 0, 1, (1, 2, 3, 4))
    b = Pi(0, 0, 2, (5, 6, 7, 8))
    c = Pi(0, 0, 4, (9, 1, 1, 1))
    aux = CombineAux()
    lhs = combine(combine(a, b, aux), c, aux)
    rhs = combine(a, combine(b, c, aux), aux)
    assert lhs.acc == rhs.acc and lhs.flags == rhs.flags


@pytest.mark.parametrize("n", [1, 2, 3, 4, 8, 16])
def test_balanced_equals_minram(blocks, n):
    bl = partition_trace(generate_trace(n * 4, 2), 4)
    assert len(bl) == n
    b1 = run_pipeline(bl, DriverOptions(fold_mode=FoldMode.BALANCED))
    b2 = run_pipeline(bl, DriverOptions(fold_mode=FoldMode.MINRAM, endpoint_cache=8))
    assert bundle_top(b1) == bundle_top(b2)
    verify_bundle(b1)
    verify_bundle(b2)


def test_fold_root_equals_manifest_root(blocks, manifest):
    bundle = run_pipeline(blocks, DriverOptions())
    top_c, _ = bundle_top(bundle)
    assert top_c.root == manifest.root


def test_streaming_driver_matches_batch(blocks, manifest):
    sink = BundleCollectorSink()
    drv = StreamDriverSink(sink, DriverOptions())
    for b in blocks:
        drv.push_block(b)
    root_c, root_pi = drv.finish()
    assert root_c.root == manifest.root
    batch = run_pipeline(blocks, DriverOptions())
    assert bundle_top(batch) == (root_c, root_pi)
    n_folds = sum(1 for it in sink.items if it[0] == "fold")
    assert n_folds == len(batch.folds)


def test_backend_batch_roundtrip(blocks, manifest):
    art = FoldBackend.prove(blocks, manifest.root)
    assert art.manifest_root == manifest.root
    FoldBackend.verify(art, [], manifest.root)
    # envelope codec roundtrip
    bundle_bytes, root_c, root_pi, is_cbor = decode_envelope(art.proof_bytes)
    assert is_cbor and root_c.root == manifest.root
    assert encode_envelope_v2(bundle_bytes, root_c, root_pi) == art.proof_bytes


def test_backend_streaming_roundtrip(tmp_path, blocks, manifest):
    os.environ["SEZKP_PROOF_STREAM_PATH"] = str(tmp_path / "proof.cborseq")
    try:
        sp = StreamingProver(FoldBackend)
        art = sp.prove_stream_iter(iter(blocks), manifest.root)
        assert art.manifest_root == manifest.root
        sp.verify_stream_iter(art, iter(blocks), manifest.root)
    finally:
        del os.environ["SEZKP_PROOF_STREAM_PATH"]


def test_stream_tamper_detected(tmp_path, blocks, manifest):
    path = str(tmp_path / "proof.cborseq")
    os.environ["SEZKP_PROOF_STREAM_PATH"] = path
    try:
        sp = StreamingProver(FoldBackend)
        art = sp.prove_stream_iter(iter(blocks), manifest.root)
    finally:
        del os.environ["SEZKP_PROOF_STREAM_PATH"]
    data = bytearray(open(path, "rb").read())
    data[200] ^= 0xFF
    with pytest.raises(Exception):
        verify_stream(bytes(data))


def test_bundle_cbor_roundtrip(blocks):
    bundle = run_pipeline(blocks[:4], DriverOptions(wrap_cadence=1))
    data = cbor.dumps(bundle.to_obj())
    b2 = FoldProofBundle.from_obj(cbor.loads(data))
    assert cbor.dumps(b2.to_obj()) == data
    verify_bundle(b2)


def test_pi_serde_roundtrip():
    pi = Pi(3, 4, 5, (11, 22, 33, 44))
    assert Pi.from_obj(pi.to_obj()) == pi


def test_batched_pipeline_matches_sequential(blocks):
    from sezkp_tpu.fold.batch import run_pipeline_batched

    for wc in (0, 3):
        a = run_pipeline(blocks, DriverOptions(wrap_cadence=wc))
        b = run_pipeline_batched(blocks, DriverOptions(wrap_cadence=wc))
        assert cbor.dumps(a.to_obj()) == cbor.dumps(b.to_obj())
        verify_bundle(b)


def test_batched_leaf_proofs_match(blocks):
    from sezkp_tpu.fold.batch import batch_leaf_proofs

    want = [CryptoLeaf.prove_leaf(b) for b in blocks]
    got = batch_leaf_proofs(blocks)
    for (p1, c1, pr1), (p2, c2, pr2) in zip(got, want):
        assert p1 == p2 and c1 == c2
        assert (pr1.public, pr1.proof_mac, pr1.mac) == (
            pr2.public,
            pr2.proof_mac,
            pr2.mac,
        )
