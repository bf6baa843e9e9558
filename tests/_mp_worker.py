"""Worker process for the multi-process jax.distributed tests.

Launched N times by tests/test_parallel.py::test_multiprocess_* with
SEZKP_COORDINATOR / SEZKP_NUM_PROCESSES / SEZKP_PROCESS_ID set (the exact
env contract of parallel/distributed.py). Two modes (argv[3]):

"replicated" (default): sharded ingest + replicated prove —
1. wires into the multi-process runtime via ensure_initialized()
2. leaf-hashes ITS contiguous shard of the blocks (process_shard_bounds),
   allgathers the 32-byte digests (DCN-analogue traffic), and folds them
   through one streaming Frontier — every process derives the same root
3. proves a small STARK v1 proof and hashes the bytes

"sharded": the proof itself is computed ONCE, SPMD, across the global
P-process x 2-device mesh — prove_v1_sharded runs column commitments, AIR
composition, distributed NTTs (all_to_all), FRI folds (ppermute) and
Merkle trees as shard_map programs spanning OS-process boundaries; every
process assembles identical proof bytes from the replicated pulls.

Both modes write root/proof-hash/topology facts to the result file for
the parent test to compare against the sequential single-process run.
"""

import hashlib
import json
import os
import sys


def main() -> None:
    out_path = sys.argv[1]
    blocks_path = sys.argv[2]
    mode = sys.argv[3] if len(sys.argv) > 3 else "replicated"

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = [
        f
        for f in os.environ.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    flags.append("--xla_force_host_platform_device_count=2")
    os.environ["XLA_FLAGS"] = " ".join(flags)
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from sezkp_tpu.parallel.distributed import (
        ensure_initialized,
        is_coordinator,
        process_shard_bounds,
    )

    assert ensure_initialized() is True, "env-configured init must activate"

    import numpy as np
    from jax.experimental import multihost_utils as mhu

    from sezkp_tpu.commit.merkle import Frontier, leaf_hashes_batch
    from sezkp_tpu.core.io import read_block_summaries_auto
    from sezkp_tpu.stark.v1.proof import encode_proof
    from sezkp_tpu.stark.v1.prover import prove_v1

    blocks = read_block_summaries_auto(blocks_path)

    # --- sharded ingest: hash own shard, allgather digests, fold frontier ---
    lo, hi = process_shard_bounds(len(blocks))
    my_hashes = leaf_hashes_batch(blocks[lo:hi])  # [k, 32] u8
    # pad to the max shard size so allgather shapes agree; ship counts too
    counts = mhu.process_allgather(np.array([hi - lo], dtype=np.int32))
    kmax = int(counts.max())
    padded = np.zeros((kmax, 32), dtype=np.uint8)
    padded[: hi - lo] = my_hashes
    gathered = mhu.process_allgather(padded)  # [P, kmax, 32]

    fr = Frontier()
    for p in range(jax.process_count()):
        fr.push_leaves(np.asarray(gathered[p][: int(counts[p, 0])]))
    root = fr.finalize_root()

    if mode == "sharded":
        # --- SPMD prove across the GLOBAL multi-process mesh: one proof,
        # computed once, collectives spanning OS-process boundaries ---
        from sezkp_tpu.parallel.distributed import global_mesh
        from sezkp_tpu.parallel.engine import prove_v1_sharded

        mesh = global_mesh()
        proof = prove_v1_sharded(blocks, root, mesh)
    else:
        # --- replicated prove: every process derives identical bytes ---
        proof = prove_v1(blocks, root)
    digest = hashlib.sha256(encode_proof(proof)).hexdigest()

    with open(out_path, "w") as f:
        json.dump(
            {
                "process_index": jax.process_index(),
                "process_count": jax.process_count(),
                "global_devices": len(jax.devices()),
                "local_devices": len(jax.local_devices()),
                "is_coordinator": is_coordinator(),
                "shard": [lo, hi],
                "root": root.hex(),
                "proof_sha256": digest,
            },
            f,
        )


if __name__ == "__main__":
    main()
