"""Device-resident FRI vs host FRI: bit-identical roots, values, paths."""

import numpy as np
import pytest

from sezkp_tpu.crypto.transcript import Blake3Transcript
from sezkp_tpu.ops import goldilocks as G
from sezkp_tpu.stark.v1 import params
from sezkp_tpu.stark.v1.fri import fri_commit, fri_open_query, fri_verify, layer_tree
from sezkp_tpu.stark.v1.fri_device import DeviceFri


@pytest.fixture(scope="module")
def lde_vals():
    rng = np.random.default_rng(0)
    return rng.integers(0, int(G.P), 1 << 7, dtype=np.uint64)


def test_device_fri_matches_host(lde_vals):
    tr_host = Blake3Transcript("fri-test")
    roots_h, layers_h, betas_h = fri_commit(tr_host, lde_vals)
    trees_h = [layer_tree(l) for l in layers_h]

    tr_dev = Blake3Transcript("fri-test")
    eng = DeviceFri(lde_vals)
    root0 = eng.commit_layer0()
    tr_dev.absorb(params.DS_FRI_LAYER_ROOT, root0)
    betas_d = params.derive_betas_for_fri(tr_dev, lde_vals.shape[0].bit_length() - 1)
    rest = eng.commit_rest(betas_d)
    for r in rest:
        tr_dev.absorb(params.DS_FRI_LAYER_ROOT, r)

    assert betas_d == betas_h
    assert [root0] + rest == roots_h
    assert eng.final_value_le() == G.to_le_bytes(layers_h[-1][0]).tobytes()
    assert tr_dev.challenge_bytes("x", 16) == tr_host.challenge_bytes("x", 16)

    rng = np.random.default_rng(1)
    rows = [int(r) for r in rng.integers(0, lde_vals.shape[0], 8)]
    got = eng.open_queries(rows)
    want = [fri_open_query(layers_h, trees_h, r) for r in rows]
    for a, b in zip(got, want):
        assert a.positions == b.positions
        assert a.pairs == b.pairs

    # and the assembled queries verify
    tr_v = Blake3Transcript("fri-test")
    fri_verify(tr_v, roots_h, got, eng.final_value_le())


def test_device_fri_bounded_layers_match_host(lde_vals, monkeypatch):
    """Exercise the mixed device/host-tail path with several device layers."""
    import sezkp_tpu.stark.v1.fri_device as FD

    monkeypatch.setattr(FD, "MIN_DEVICE_LAYER_LOG2", 3)

    tr_host = Blake3Transcript("fri-test2")
    roots_h, layers_h, betas_h = fri_commit(tr_host, lde_vals)
    trees_h = [layer_tree(l) for l in layers_h]

    tr_dev = Blake3Transcript("fri-test2")
    eng = FD.DeviceFri(lde_vals)
    root0 = eng.commit_layer0()
    tr_dev.absorb(params.DS_FRI_LAYER_ROOT, root0)
    betas_d = params.derive_betas_for_fri(tr_dev, lde_vals.shape[0].bit_length() - 1)
    rest = eng.commit_rest(betas_d)
    assert eng._dev_layers == 4  # 7 - 3
    assert [root0] + rest == roots_h

    rng = np.random.default_rng(2)
    rows = [int(r) for r in rng.integers(0, lde_vals.shape[0], 6)]
    got = eng.open_queries(rows)
    want = [fri_open_query(layers_h, trees_h, r) for r in rows]
    for a, b in zip(got, want):
        assert a.positions == b.positions and a.pairs == b.pairs
