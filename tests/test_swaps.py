import jax
import jax.numpy as jnp
import numpy as np

from pigeons_tpu.swaps import deo_partner_map, swap_scan


def test_deo_partner_maps():
    # odd scan (scan counter starts at 1): pairs (0,1),(2,3),...
    assert deo_partner_map(4, 1).tolist() == [1, 0, 3, 2]
    # even scan: pairs (1,2),... with boundary chains resting
    assert deo_partner_map(4, 2).tolist() == [0, 2, 1, 3]
    assert deo_partner_map(5, 1).tolist() == [1, 0, 3, 2, 4]
    assert deo_partner_map(5, 2).tolist() == [0, 2, 1, 4, 3]
    assert deo_partner_map(1, 1).tolist() == [0]
    # involution: partner(partner(c)) == c (reference checked_partner_chain)
    for n in (2, 3, 7, 10):
        for scan in (1, 2):
            p = np.asarray(deo_partner_map(n, scan))
            assert np.all(p[p] == np.arange(n))


def test_swap_scan_permutation_validity():
    n = 8
    key = jax.random.key(0)
    chain_of = jnp.arange(n, dtype=jnp.int32)
    replica_of = jnp.arange(n, dtype=jnp.int32)
    for scan in range(1, 20):
        log_ratio = jax.random.normal(jax.random.fold_in(key, scan), (n,))
        res = swap_scan(
            jax.random.fold_in(key, 1000 + scan), scan, chain_of, replica_of, log_ratio
        )
        chain_of, replica_of = res.chain_of, res.replica_of
        c = np.asarray(chain_of)
        r = np.asarray(replica_of)
        assert sorted(c.tolist()) == list(range(n))
        assert np.all(r[c] == np.arange(n))  # inverse permutations


def test_always_accept_deterministic_dynamics():
    # with acceptance 1, DEO moves every interacting pair every scan
    n = 4
    chain_of = jnp.arange(n, dtype=jnp.int32)
    replica_of = jnp.arange(n, dtype=jnp.int32)
    accept_one = lambda s: jnp.ones_like(s)
    key = jax.random.key(0)
    res = swap_scan(key, 1, chain_of, replica_of, jnp.zeros(n), accept_one)
    assert res.chain_of.tolist() == [1, 0, 3, 2]
    res2 = swap_scan(key, 2, res.chain_of, res.replica_of, jnp.zeros(n), accept_one)
    # replica 0 was moved to chain 1; even scan pairs (1,2): moves to 2
    assert res2.chain_of.tolist() == [2, 0, 3, 1]


def test_never_accept_keeps_permutation():
    n = 6
    chain_of = jnp.arange(n, dtype=jnp.int32)
    replica_of = jnp.arange(n, dtype=jnp.int32)
    res = swap_scan(
        jax.random.key(3), 1, chain_of, replica_of, jnp.full(n, -jnp.inf)
    )
    assert res.chain_of.tolist() == list(range(n))
    assert not bool(res.do_swap.any())
