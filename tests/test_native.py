"""Native shared-library targets (reference ``test/test_stan.jl`` analogue:
compiled model via C ABI, gradients wired into the traced kernels)."""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pigeons_tpu as pg
from pigeons_tpu.models.native import NativeTarget, compile_native_model

PREC = np.array([500.0, 167.0, 56.0, 1.0])


@pytest.fixture(scope="module")
def lib_path(tmp_path_factory):
    out = tmp_path_factory.mktemp("native") / "het_normal.so"
    return compile_native_model("examples/native/het_normal.cpp", str(out))


def test_log_density_and_gradient(lib_path):
    t = NativeTarget(lib_path)
    assert t.dim == 4
    x = jnp.array([0.1, -0.2, 0.3, 1.0], jnp.float32)
    lp = t.log_density(x)
    assert np.isclose(float(lp), -0.5 * float(PREC @ (np.asarray(x) ** 2)), rtol=1e-5)
    g = jax.grad(lambda v: t.log_density(v))(x)
    assert np.allclose(np.asarray(g), -PREC * np.asarray(x), rtol=1e-4)
    # vmapped (the engine's replica batch) hits the batched entry point
    xs = jnp.stack([x, 2 * x, 0 * x])
    lps = jax.vmap(t.log_density)(xs)
    assert np.isclose(float(lps[2]), 0.0)


def test_default_explorer_is_gradient_based(lib_path):
    from pigeons_tpu.ops import AutoMALA

    assert isinstance(NativeTarget(lib_path).default_explorer(), AutoMALA)


@pytest.mark.slow
def test_run_moments(lib_path):
    t = NativeTarget(lib_path)
    pt = pg.pigeons(
        target=t, n_chains=5, n_rounds=9, explorer=pg.SliceSampler(),
        show_report=False,
    )
    # posterior variances ~ 1/prec per coordinate
    assert np.all(np.abs(pt.mean()) < 5.0 / np.sqrt(PREC))
    assert np.allclose(pt.var(), 1.0 / PREC, rtol=0.5)


def test_pickle_roundtrip(lib_path):
    t = NativeTarget(lib_path)
    t2 = pickle.loads(pickle.dumps(t))
    x = jnp.ones((4,), jnp.float32)
    assert float(t.log_density(x)) == float(t2.log_density(x))
