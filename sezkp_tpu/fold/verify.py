"""Fold verifiers: in-memory bundle and O(1)-memory CBOR-seq streaming.

Reference: crates/sezkp-fold/src/verify.rs.
"""

from __future__ import annotations

from typing import Optional, Tuple

from ..utils import cbor
from .api import Commitment, PiCommitment, commit_pi
from .driver import STREAM_MAGIC, STREAM_VERSION, FoldProofBundle
from .gadgets import (
    CryptoFold,
    CryptoFoldProof,
    CryptoLeaf,
    CryptoLeafProof,
    CryptoWrap,
    CryptoWrapProof,
)


def verify_bundle(bundle: FoldProofBundle) -> None:
    """Leaves -> folds -> wraps, order enforced."""
    for c, pi, lp in bundle.leaves:
        if not CryptoLeaf.verify_leaf(c, commit_pi(pi), lp):
            raise ValueError("leaf proof failed")
    for (c_par, pi_par), (c_l, pi_l), (c_r, pi_r), pf in bundle.folds:
        ok = CryptoFold.verify_fold(
            (c_par, commit_pi(pi_par)),
            (c_l, commit_pi(pi_l)),
            (c_r, commit_pi(pi_r)),
            pf,
        )
        if not ok:
            raise ValueError("fold proof failed")
    for (c, pi), wp in bundle.wraps:
        if not CryptoWrap.verify_wrap((c, commit_pi(pi)), wp):
            raise ValueError("wrap proof failed")


def _cp(x) -> Tuple[Commitment, PiCommitment]:
    return Commitment.from_obj(x[0]), PiCommitment.from_obj(x[1])


def verify_stream(data_or_file) -> None:
    """Incrementally verify a CBOR sequence {Header, Item*, Footer}."""
    if hasattr(data_or_file, "read"):
        data = data_or_file.read()
    else:
        data = data_or_file
    dec = cbor.CBORDecoder(data)

    header = dec.decode()
    if not (
        isinstance(header, dict)
        and header.get("magic") == STREAM_MAGIC
        and header.get("ver") == STREAM_VERSION
    ):
        raise ValueError("unsupported stream format")

    n_leaves = 0
    final_root: Optional[Tuple[Commitment, PiCommitment]] = None

    while True:
        if dec.at_end():
            raise ValueError("fold stream ended without footer")
        v = dec.decode()
        if isinstance(v, dict) and "n_blocks" in v:  # Footer
            if v["n_blocks"] != n_leaves:
                raise ValueError(
                    f"footer.n_blocks ({v['n_blocks']}) != counted leaves ({n_leaves})"
                )
            if final_root is not None:
                fc = Commitment.from_obj(v["root_c"])
                fp = PiCommitment.from_obj(v["root_pi_cmt"])
                if fc != final_root[0] or fp != final_root[1]:
                    raise ValueError("footer root does not match last root seen")
            break

        if "Leaf" in v:
            it = v["Leaf"]
            c = Commitment.from_obj(it["c"])
            pi_cmt = PiCommitment.from_obj(it["pi_cmt"])
            proof = CryptoLeafProof.from_obj(it["proof"])
            if not CryptoLeaf.verify_leaf(c, pi_cmt, proof):
                raise ValueError("leaf proof failed")
            n_leaves += 1
        elif "Fold" in v:
            it = v["Fold"]
            parent = _cp(it["parent"])
            left = _cp(it["left"])
            right = _cp(it["right"])
            proof = CryptoFoldProof.from_obj(it["proof"])
            if not CryptoFold.verify_fold(parent, left, right, proof):
                raise ValueError("fold proof failed")
            final_root = parent
        elif "Wrap" in v:
            it = v["Wrap"]
            root = _cp(it["root"])
            proof = CryptoWrapProof.from_obj(it["proof"])
            if not CryptoWrap.verify_wrap(root, proof):
                raise ValueError("wrap proof failed")
            final_root = root
        else:
            raise ValueError("unknown stream item")
