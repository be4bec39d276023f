"""Exact round-trip combinatorics with the constant-acceptance TestSwapper
(reference ``test/test_round_trips.jl``)."""

import pigeons_tpu as pg


def expected_round_trips(n_chains: int, n_rounds: int) -> int:
    length = 2**n_rounds  # scans in the final round
    return sum(max(length - i, 0) // (n_chains * 2) for i in range(n_chains))


def simulate_round_trips(n_chains: int, n_rounds: int) -> int:
    """Faithful scan-by-scan simulation of the reference's always-accept DEO
    dynamics and round-trip state machine (swap.jl:106-126,
    RoundTripRecorder.jl:46-52, recorders reset each round)."""
    chain = list(range(n_chains))
    trips = 0
    for r in range(1, n_rounds + 1):
        state = [0] * n_chains
        trips = 0
        for scan in range(1, 2**r + 1):
            for i in range(n_chains):
                c = chain[i]
                is_ref = (c == 0) and n_chains > 1
                is_tgt = c == n_chains - 1
                if state[i] == 0 and is_ref:
                    state[i] = 1
                elif state[i] == 1 and is_tgt:
                    state[i] = 2
                elif state[i] == 2 and is_ref:
                    state[i] = 1
                    trips += 1
            offset = 1 if scan % 2 == 0 else 0
            new = chain[:]
            for i in range(n_chains):
                c = chain[i]
                if (c - offset) % 2 == 0 and c + 1 < n_chains:
                    new[i] = c + 1
                elif (c - offset) % 2 == 1 and c - 1 >= 0:
                    new[i] = c - 1
            chain = new
    return trips


def test_round_trips_exact():
    n_chains, n_rounds = 4, 5
    pt = pg.pigeons(
        target=pg.TestSwapper(1.0),
        n_chains=n_chains,
        n_rounds=n_rounds,
        show_report=False,
    )
    assert pt.n_round_trips == expected_round_trips(n_chains, n_rounds)


def test_round_trips_exact_other_configs():
    # the closed formula from the reference test is exact only for particular
    # (N, rounds) phases; other configs are checked against the faithful
    # simulation of the reference dynamics
    for n_chains, n_rounds in [(6, 6), (5, 5), (3, 4)]:
        pt = pg.pigeons(
            target=pg.TestSwapper(1.0),
            n_chains=n_chains,
            n_rounds=n_rounds,
            show_report=False,
        )
        assert pt.n_round_trips == simulate_round_trips(n_chains, n_rounds)


def test_no_swaps_no_round_trips():
    pt = pg.pigeons(
        target=pg.TestSwapper(0.0), n_chains=4, n_rounds=5, show_report=False
    )
    assert pt.n_round_trips == 0
    # replica 0 starts at the reference and never leaves; no restarts happen
    # because the target is never reached from the reference
    assert pt.n_tempered_restarts == 0
