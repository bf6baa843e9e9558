"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Bit-exactness requirement (SURVEY.md section 7.8): multi-host output must
equal single-host output exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.ops import goldilocks_jax as FJ
from sezkp_tpu.ops import ntt as N
from sezkp_tpu.ops import ntt_jax as NJ
from sezkp_tpu.parallel.commit_sharded import sharded_merkle_root_u64
from sezkp_tpu.parallel.mesh import make_mesh
from sezkp_tpu.parallel.ntt_sharded import sharded_ntt_u64

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8)


@needs_8
@pytest.mark.parametrize("k", [8, 10])
def test_sharded_forward_ntt_bit_exact(mesh8, k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
    assert np.array_equal(sharded_ntt_u64(a, mesh8), N.forward_ntt(a))


@needs_8
@pytest.mark.parametrize("k", [8, 10])
def test_sharded_inverse_ntt_bit_exact(mesh8, k):
    rng = np.random.default_rng(k)
    a = rng.integers(0, int(G.P), 1 << k, dtype=np.uint64)
    assert np.array_equal(
        sharded_ntt_u64(a, mesh8, inverse=True), N.inverse_ntt(a)
    )


@needs_8
def test_sharded_merkle_root_bit_exact(mesh8):
    from sezkp_tpu.crypto import blake3 as B3

    rng = np.random.default_rng(0)
    vals = rng.integers(0, int(G.P), 1 << 9, dtype=np.uint64)
    got = sharded_merkle_root_u64(vals, mesh8)
    want = B3.merkle_root_leaves(B3.hash_many(G.to_le_bytes(vals)))
    assert got == want


def test_sharded_ingest_matches_sequential(tmp_path):
    from sezkp_tpu.commit.merkle import commit_block_file
    from sezkp_tpu.core.io import write_block_summaries_jsonl
    from sezkp_tpu.parallel.ingest import commit_block_file_sharded
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    blocks = partition_trace(generate_trace(777, 3), 7)  # odd sizes on purpose
    path = str(tmp_path / "blocks.jsonl")
    write_block_summaries_jsonl(path, blocks)
    seq = commit_block_file(path, str(tmp_path / "m.cbor"))
    for hosts in (1, 2, 3, 5):
        sh = commit_block_file_sharded(path, n_hosts=hosts)
        assert sh.root == seq.root and sh.n_leaves == seq.n_leaves


@pytest.mark.slow
@needs_8
def test_sharded_commitments_prove_v1_matches_single_chip(mesh8):
    """Proof bytes with only the column commitments sharded == host prover
    (round-1 engine, kept as the fast default-tier parity check)."""
    from test_stark_v1 import MANIFEST, demo_blocks

    from sezkp_tpu.parallel.engine import prove_v1_sharded
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.stark.v1.verify import verify_v1

    blocks = demo_blocks(4, 1024, tau=2)  # n = 4096 -> 4 column chunks
    host = prove_v1(blocks, MANIFEST)
    shard = prove_v1_sharded(blocks, MANIFEST, mesh8, commitments_only=True)
    assert encode_proof(shard) == encode_proof(host)
    verify_v1(shard, blocks)


@pytest.mark.slow
@needs_8
def test_sharded_prove_v1_full_pipeline_matches_single_chip(mesh8):
    """FULL sharded prover (composition + DEEP-LDE + FRI + trees on the
    mesh) produces byte-identical proofs at n=4096 and verifies."""
    from test_stark_v1 import MANIFEST, demo_blocks

    from sezkp_tpu.parallel.engine import prove_v1_sharded
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.stark.v1.verify import verify_v1

    blocks = demo_blocks(4, 1024, tau=2)
    host = prove_v1(blocks, MANIFEST)
    shard = prove_v1_sharded(blocks, MANIFEST, mesh8)
    assert encode_proof(shard) == encode_proof(host)
    verify_v1(shard, blocks)


@pytest.mark.slow
@needs_8
@pytest.mark.parametrize("nd", [2, 4, 8])
def test_sharded_prove_v1_full_n2_16(nd):
    """North-star parity: full sharded prover at n=2^16 (LDE 2^19), proof
    bytes == single-chip at every mesh size, with the hot arrays verifiably
    sharded across the devices (SURVEY.md section 7.8; VERDICT round-1
    item 1)."""
    from test_stark_v1 import MANIFEST, demo_blocks

    from sezkp_tpu.parallel.engine import prove_v1_sharded
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1

    blocks = demo_blocks(64, 1024, tau=2)  # n = 65536
    host = prove_v1(blocks, MANIFEST)
    shard = prove_v1_sharded(blocks, MANIFEST, make_mesh(nd))
    assert encode_proof(shard) == encode_proof(host)


@needs_8
def test_sharded_lde_fri_arrays_actually_sharded(mesh8):
    """The LDE, folded-layer values, and tree-node buffers of the sharded
    pipeline live distributed across all mesh devices (one shard each), and
    the layer-0 root matches the host FRI tree for the same LDE."""
    from test_stark_v1 import MANIFEST, demo_blocks

    from sezkp_tpu.parallel.prove_sharded import ShardedPipeline
    from sezkp_tpu.stark.v1 import fri as host_fri
    from sezkp_tpu.stark.v1.air import Alphas, compose_all_rows
    from sezkp_tpu.stark.v1.columns import TraceColumns
    from sezkp_tpu.stark.v1.masking import eval_masks_sum_at_points
    from sezkp_tpu.stark.v1.prover import _deep_lde
    from sezkp_tpu.ops import ntt as ntt_host

    blocks = demo_blocks(4, 1024, tau=2)  # n = 4096, LDE 2^15
    tc = TraceColumns.build(blocks)
    alphas = Alphas.from_list([3, 5, 7, 11, 13, 17, 19, 23])
    mask_coeffs = [[1, 2, 3, 4]]
    z = 123456789
    fri = ShardedPipeline(mesh8, tc).deep_lde_fri(alphas, mask_coeffs, 3, 3, z)

    # sharding: one addressable shard per device, local size = ln/D
    for arr in (fri._lde[0], fri._lde[1]):
        shards = arr.addressable_shards
        assert len({s.device for s in shards}) == 8
        assert all(s.data.shape == (fri.n // 8,) for s in shards)
    t0 = fri._tree0
    assert len({s.device for s in t0.addressable_shards}) == 8

    # values + layer-0 root match the host pipeline bit-exactly
    comp = compose_all_rows(tc, alphas)
    xs = ntt_host.powers(G.primitive_root_2exp(12), 4096)
    base = G.add(comp, eval_masks_sum_at_points(mask_coeffs, xs))
    lde_host = _deep_lde(base, 3, 3, z)
    got = np.asarray(jax.device_get(fri._lde[0])).astype(np.uint64) | (
        np.asarray(jax.device_get(fri._lde[1])).astype(np.uint64) << np.uint64(32)
    )
    assert np.array_equal(got, lde_host)
    assert fri.commit_layer0() == host_fri.layer_tree(lde_host).root()


@pytest.mark.slow
@needs_8
def test_sharded_column_engine_roots_and_opens(mesh8):
    from test_stark_v1 import demo_blocks

    from sezkp_tpu.parallel.engine import ShardedColumnEngine
    from sezkp_tpu.stark.v1 import params
    from sezkp_tpu.stark.v1.columns import TraceColumns
    from sezkp_tpu.stark.v1.openings import ColumnEngine

    blocks = demo_blocks(2, 1024, tau=1)
    tc = TraceColumns.build(blocks)
    ref = ColumnEngine(tc, params.COL_CHUNK_LOG2)
    eng = ShardedColumnEngine(tc, mesh8)
    assert [
        (r.label, r.root) for r in eng.build_roots()
    ] == [(r.label, r.root) for r in ref.build_roots()]
    for lb, row in [("mv_0", 0), ("head_0", 1025), ("is_last", 2047)]:
        a, b = eng.open(lb, row), ref.open(lb, row)
        assert (a.value_le, a.chunk_root, a.path_in_chunk, a.path_to_chunk) == (
            b.value_le, b.chunk_root, b.path_in_chunk, b.path_to_chunk
        )


def test_distributed_noop_single_host(monkeypatch):
    """ensure_initialized is a no-op without env config; helpers work on a
    single-process runtime."""
    from sezkp_tpu.parallel import distributed as D

    monkeypatch.delenv(D.ENV_COORDINATOR, raising=False)
    monkeypatch.delenv(D.ENV_NUM_PROCESSES, raising=False)
    assert D.ensure_initialized() is False
    assert D.is_coordinator() is True
    lo, hi = D.process_shard_bounds(1000)
    assert (lo, hi) == (0, 1000)
    mesh = D.global_mesh()
    assert mesh.devices.size >= 1


@pytest.mark.parametrize("nproc", [2, 4])
def test_multiprocess_distributed_commit_and_prove(tmp_path, nproc):
    """REAL multi-process run: N OS processes join one jax.distributed
    runtime via the SEZKP_COORDINATOR/.._NUM_PROCESSES/.._PROCESS_ID env
    contract (parallel/distributed.py), shard the ingest by
    process_shard_bounds, allgather digests, and all derive the identical
    manifest root and proof bytes as the sequential single-process run
    (VERDICT round-1 item 5; SURVEY.md section 5.8)."""
    import hashlib
    import json
    import os
    import socket
    import subprocess
    import sys

    from sezkp_tpu.commit.merkle import commit_blocks
    from sezkp_tpu.core.io import write_block_summaries_auto
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    blocks = partition_trace(generate_trace(1024, 2), 64)
    blocks_path = str(tmp_path / "blocks.cbor")
    write_block_summaries_auto(blocks_path, blocks)

    # sequential ground truth
    seq_root = commit_blocks(blocks).root
    seq_digest = hashlib.sha256(
        encode_proof(prove_v1(blocks, seq_root))
    ).hexdigest()

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(
            SEZKP_COORDINATOR=f"localhost:{port}",
            SEZKP_NUM_PROCESSES=str(nproc),
            SEZKP_PROCESS_ID=str(pid),
        )
        out = str(tmp_path / f"result_{pid}.json")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, worker, out, blocks_path],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                ),
                out,
            )
        )

    results = []
    for p, out in procs:
        stdout, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{stdout.decode()[-2000:]}"
        with open(out) as f:
            results.append(json.load(f))

    for i, r in enumerate(results):
        assert r["process_index"] == i
        assert r["process_count"] == nproc
        assert r["global_devices"] == 2 * nproc
        assert r["local_devices"] == 2
        assert r["is_coordinator"] == (i == 0)
        assert r["root"] == seq_root.hex(), "sharded ingest root mismatch"
        assert r["proof_sha256"] == seq_digest, "proof bytes differ"
    # shards tile [0, n) contiguously
    spans = [tuple(r["shard"]) for r in results]
    assert spans[0][0] == 0 and spans[-1][1] == len(blocks)
    assert all(spans[i][1] == spans[i + 1][0] for i in range(nproc - 1))


@pytest.mark.slow
def test_multiprocess_sharded_prove(tmp_path):
    """The SPMD sharded prover spans OS-process boundaries: 2 processes x
    2 CPU devices join one jax.distributed runtime and run prove_v1_sharded
    over the GLOBAL 4-device mesh — composition, distributed NTTs
    (all_to_all), FRI folds (ppermute) and Merkle trees execute as one
    shard_map program whose collectives cross the process boundary; every
    process assembles proof bytes identical to the sequential single-process
    prover (VERDICT round-2 item 2; SURVEY.md section 5.8 'multi-host
    output == single-host output bit-exactly')."""
    import hashlib
    import json
    import os
    import socket
    import subprocess
    import sys

    from sezkp_tpu.commit.merkle import commit_blocks
    from sezkp_tpu.core.io import write_block_summaries_auto
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1
    from sezkp_tpu.trace.generator import generate_trace
    from sezkp_tpu.trace.partition import partition_trace

    nproc = 2
    blocks = partition_trace(generate_trace(4096, 2), 64)
    blocks_path = str(tmp_path / "blocks.cbor")
    write_block_summaries_auto(blocks_path, blocks)

    seq_root = commit_blocks(blocks).root
    seq_digest = hashlib.sha256(
        encode_proof(prove_v1(blocks, seq_root))
    ).hexdigest()

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "_mp_worker.py")
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(
            SEZKP_COORDINATOR=f"localhost:{port}",
            SEZKP_NUM_PROCESSES=str(nproc),
            SEZKP_PROCESS_ID=str(pid),
        )
        out = str(tmp_path / f"result_{pid}.json")
        procs.append(
            (
                subprocess.Popen(
                    [sys.executable, worker, out, blocks_path, "sharded"],
                    env=env,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.STDOUT,
                ),
                out,
            )
        )

    results = []
    for p, out in procs:
        # Generous: on a 2-core box both workers cold-compile the full
        # sharded-prover program set concurrently; the first populate run
        # can take several minutes per worker (later runs hit the shared
        # persistent compile cache enabled by ensure_initialized()).
        stdout, _ = p.communicate(timeout=840)
        assert p.returncode == 0, f"worker failed:\n{stdout.decode()[-3000:]}"
        with open(out) as f:
            results.append(json.load(f))

    for i, r in enumerate(results):
        assert r["process_count"] == nproc
        assert r["global_devices"] == 2 * nproc
        assert r["root"] == seq_root.hex()
        assert r["proof_sha256"] == seq_digest, (
            "cross-process sharded proof bytes != sequential proof bytes"
        )


@needs_8
def test_sharded_prove_v1_tops_only_trees(mesh8, monkeypatch):
    """Tops-only (chunked) tree storage in the sharded prover: force the
    big-domain threshold down so n=4096 (LDE 2^15) takes the tops path —
    per-device subtree levels below CHUNK_LOG2 are dropped after the
    commit phases and every queried in-chunk path is recomputed from
    gathered leaf values. Proof bytes must equal the single-chip prover's
    (VERDICT round-2 item 3c: the large-T memory schedule composed with
    the mesh)."""
    from test_stark_v1 import MANIFEST, demo_blocks

    from sezkp_tpu.parallel.engine import prove_v1_sharded
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1

    monkeypatch.setenv("SEZKP_SHARDED_TOPS_MIN_LOG2", "15")
    blocks = demo_blocks(4, 1024, tau=2)
    host = prove_v1(blocks, MANIFEST)
    shard = prove_v1_sharded(blocks, MANIFEST, mesh8)
    assert encode_proof(shard) == encode_proof(host)


@pytest.mark.slow
@needs_8
def test_sharded_prove_v1_full_n2_18_tops(mesh8):
    """Large-domain parity: full sharded prover at n=2^18 (LDE 2^21) on
    the 8-device mesh — big enough that the tops-only chunked tree mode is
    active by default (threshold 2^20-point LDE) together with in-kernel
    column derivation and the all_to_all coefficient relayout. Proof bytes
    == single-chip (VERDICT round-2 item 3: the north-star memory schedule
    composed with the mesh, at the largest size the CPU-mesh CI can
    carry)."""
    from test_stark_v1 import MANIFEST, demo_blocks

    from sezkp_tpu.parallel.engine import prove_v1_sharded
    from sezkp_tpu.parallel.prove_sharded import _tops_threshold_log2
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1

    assert _tops_threshold_log2() <= 21
    blocks = demo_blocks(256, 1024, tau=2)  # n = 262144
    host = prove_v1(blocks, MANIFEST)
    shard = prove_v1_sharded(blocks, MANIFEST, mesh8)
    assert encode_proof(shard) == encode_proof(host)
