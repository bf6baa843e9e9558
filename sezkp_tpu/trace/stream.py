"""Streaming trace frontend: generate + partition + write in bounded chunks.

`simulate` previously materialized all T steps before partitioning (same
design as the reference's generator.rs + partition.rs, but the reference
still sweeps T to 2^27 — scripts/scale_streaming_sublinear.zsh:6-27 — while
a resident tau=8 trace is 8.6 GB at T=2^22). This module keeps RSS bounded
by the chunk size:

- the native ChaCha12 generator exposes a resumable state
  (sezkp_generate_trace_chunk; trace_gen.cpp), with a pure-Python stateful
  fallback (the same ChaChaRng object carried across chunks);
- partitioning runs per chunk with the carried global input-head prefix
  (block boundaries never span chunks: the chunk size is a multiple of b);
- blocks append to the output incrementally: JSONL lines directly; CBOR as
  a definite-length array whose header is written first (the block count
  ceil(t/b) is known up front) — output bytes are identical to
  write_block_summaries_auto on the materialized list (cross-tested).
"""

from __future__ import annotations

import ctypes
import json
from typing import Iterator, List, Tuple

import numpy as np

from ..core.types import BlockSummary, MovementLog
from ..utils import cbor

__all__ = ["simulate_stream", "iter_trace_chunks"]

_MV = (-1, 0, 1)


def _native_stream():
    from ..crypto import blake3 as b3

    if not b3.HAVE_NATIVE or not hasattr(b3._native, "sezkp_generate_trace_chunk"):
        return None
    lib = b3._native
    lib.sezkp_trace_state_size.restype = ctypes.c_size_t
    lib.sezkp_trace_state_init.argtypes = [ctypes.c_void_p]
    lib.sezkp_generate_trace_chunk.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    return lib


def iter_trace_chunks(t: int, tau: int, chunk: int) -> Iterator[MovementLog]:
    """Yield the seed-42 synthetic trace in chunks of `chunk` steps (last
    one possibly shorter). Bit-exact with generator.generate_trace."""
    lib = _native_stream()
    if lib is not None:
        state = ctypes.create_string_buffer(lib.sezkp_trace_state_size())
        lib.sezkp_trace_state_init(state)
        done = 0
        while done < t:
            n = min(chunk, t - done)
            input_mv = np.zeros(n, dtype=np.int8)
            tape_mv = np.zeros((n, tau), dtype=np.int8)
            write_flag = np.zeros((n, tau), dtype=np.uint8)
            write_sym = np.zeros((n, tau), dtype=np.uint16)
            lib.sezkp_generate_trace_chunk(
                state, n, tau,
                input_mv.ctypes.data_as(ctypes.c_void_p),
                tape_mv.ctypes.data_as(ctypes.c_void_p),
                write_flag.ctypes.data_as(ctypes.c_void_p),
                write_sym.ctypes.data_as(ctypes.c_void_p),
            )
            yield MovementLog(input_mv, tape_mv, write_flag.astype(bool), write_sym)
            done += n
        return
    # pure-Python fallback: one stateful rng carried across chunks
    from .rng import ChaChaRng

    rng = ChaChaRng.std_rng(42)
    done = 0
    while done < t:
        n = min(chunk, t - done)
        input_mv = np.zeros(n, dtype=np.int8)
        tape_mv = np.zeros((n, tau), dtype=np.int8)
        write_flag = np.zeros((n, tau), dtype=bool)
        write_sym = np.zeros((n, tau), dtype=np.uint16)
        for i in range(n):
            input_mv[i] = _MV[rng.random_range_u32(0, 2)]
            for r in range(tau):
                if rng.random_bool(0.4):
                    write_flag[i, r] = True
                    write_sym[i, r] = rng.random_range_u16(0, 15)
                tape_mv[i, r] = _MV[rng.random_range_u32(0, 2)]
        yield MovementLog(input_mv, tape_mv, write_flag, write_sym)
        done += n


def _partition_chunk(ml: MovementLog, b: int, step0: int, in_head: int,
                     block_id0: int) -> Tuple[List[BlockSummary], int]:
    """partition_trace's per-block math on one chunk, with carried global
    offsets (step0 = absolute step index of the chunk start, in_head = the
    absolute input-head position there). Chunk length must be a multiple
    of b except for the final chunk."""
    t = ml.input_mv.shape[0]
    in_prefix = np.concatenate(
        [[in_head], in_head + np.cumsum(ml.input_mv.astype(np.int64))]
    )
    out: List[BlockSummary] = []
    k = block_id0
    for lo in range(0, t, b):
        hi = min(lo + b, t)
        mv = ml.tape_mv[lo:hi].astype(np.int64)
        heads = np.cumsum(mv, axis=0)
        min_pos = np.minimum(heads.min(axis=0), 0)
        max_pos = np.maximum(heads.max(axis=0), 0)
        cur = heads[-1]
        off_in = -min_pos
        off_out = cur - min_pos
        tau = ml.tape_mv.shape[1]
        out.append(
            BlockSummary(
                version=1,
                block_id=k,
                step_lo=step0 + lo + 1,
                step_hi=step0 + hi,
                ctrl_in=0,
                ctrl_out=0,
                in_head_in=int(in_prefix[lo]),
                in_head_out=int(in_prefix[hi]),
                windows=np.stack([min_pos, max_pos], axis=1).astype(np.int64),
                head_in_offsets=off_in.astype(np.uint32),
                head_out_offsets=off_out.astype(np.uint32),
                movement_log=MovementLog(
                    ml.input_mv[lo:hi].copy(), ml.tape_mv[lo:hi].copy(),
                    ml.write_flag[lo:hi].copy(), ml.write_sym[lo:hi].copy(),
                ),
                pre_tags=[b"\x00" * 16] * tau,
                post_tags=[b"\x00" * 16] * tau,
            )
        )
        k += 1
    return out, int(in_prefix[-1])


def simulate_stream(t: int, b: int, tau: int, out_path: str,
                    chunk_steps: int | None = None) -> int:
    """Generate, partition, and write the blocks file in bounded chunks.

    Returns the block count. Output bytes are identical to
    `write_block_summaries_auto(path, partition_trace(generate_trace(t,
    tau), b))` for both .cbor and .jsonl (cross-tested)."""
    if chunk_steps is None:
        # ~80 MB of resident movement log at tau=8
        chunk_steps = 1 << 21
    chunk_steps = max(b, (chunk_steps // b) * b)
    n_blocks = -(-t // b)
    ext = out_path.rsplit(".", 1)[-1].lower()

    if ext == "cbor":
        head = bytearray()
        cbor._encode_head(head, 4, n_blocks)  # definite-length array
        with open(out_path, "wb") as f:
            f.write(bytes(head))
            in_head = 0
            step0 = 0
            bid = 1
            for ml in iter_trace_chunks(t, tau, chunk_steps):
                blocks, in_head = _partition_chunk(ml, b, step0, in_head, bid)
                step0 += ml.input_mv.shape[0]
                bid += len(blocks)
                buf = bytearray()
                for blk in blocks:
                    cbor.encode_into(buf, blk.to_obj())
                f.write(bytes(buf))
    elif ext in ("jsonl", "ndjson"):
        with open(out_path, "w") as f:
            in_head = 0
            step0 = 0
            bid = 1
            for ml in iter_trace_chunks(t, tau, chunk_steps):
                blocks, in_head = _partition_chunk(ml, b, step0, in_head, bid)
                step0 += ml.input_mv.shape[0]
                bid += len(blocks)
                for blk in blocks:
                    json.dump(blk.to_obj(), f, separators=(",", ":"))
                    f.write("\n")
    else:
        raise ValueError(
            f"simulate_stream supports .cbor/.jsonl outputs (got .{ext})"
        )
    return n_blocks
