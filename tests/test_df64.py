"""df64 (float32-pair) arithmetic vs the float64 oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from mgbtpu.ops import df64


def _f32(x):
    return jnp.asarray(np.asarray(x, dtype=np.float32))


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = _f32(rng.standard_normal(1000) * 1e6)
    b = _f32(rng.standard_normal(1000) * 1e-3)
    s, e = df64.two_sum(a, b)
    exact = a.astype(jnp.float64) + b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact)


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = _f32(rng.standard_normal(1000))
    b = _f32(rng.standard_normal(1000))
    p, e = df64.two_prod(a, b)
    exact = a.astype(jnp.float64) * b.astype(jnp.float64)
    np.testing.assert_array_equal(
        np.asarray(p, np.float64) + np.asarray(e, np.float64), exact)


def test_tree_sum_accuracy():
    rng = np.random.default_rng(2)
    # ill-conditioned sum: huge + tiny terms
    x = np.concatenate([rng.standard_normal(500) * 1e8,
                        rng.standard_normal(5000) * 1e-2])
    rng.shuffle(x)
    hi, lo = df64.dd_sum_f(_f32(x), axis=0)
    ref = np.sum(x.astype(np.float32).astype(np.float64))
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    assert abs(got - ref) <= 1e-6 * abs(ref) + 1e-4
    # f32 plain sum is much worse on this input
    plain = float(np.sum(x.astype(np.float32)))
    assert abs(got - ref) < abs(plain - ref) + 1e-4


def test_dd_dot_vs_f64():
    rng = np.random.default_rng(3)
    a = rng.standard_normal(4096).astype(np.float32) * 1e4
    b = rng.standard_normal(4096).astype(np.float32)
    hi, lo = df64.dd_dot(_f32(a), _f32(b))
    ref = np.dot(a.astype(np.float64), b.astype(np.float64))
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    assert abs(got - ref) <= 1e-10 * abs(ref) + 1e-8


def test_dd_matvec_vs_f64():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((64, 128)).astype(np.float32)
    A[::7] *= 1e6   # wildly varying row scales
    x = rng.standard_normal(128).astype(np.float32)
    hi, lo = df64.dd_matvec(_f32(A), jnp.zeros_like(_f32(A)), _f32(x))
    ref = A.astype(np.float64) @ x.astype(np.float64)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    np.testing.assert_allclose(got, ref, rtol=2e-12, atol=1e-9)


def test_dd_under_jit():
    @jax.jit
    def f(a, b):
        return df64.dd_dot(a, b)

    a = _f32(np.linspace(1, 2, 257))
    hi, lo = f(a, a)
    ref = np.dot(np.asarray(a, np.float64), np.asarray(a, np.float64))
    assert abs(float(hi) + float(lo) - ref) < 1e-9 * abs(ref) + 1e-9


def _pair(x64):
    hi, lo = df64.f64_split(x64)
    return (jnp.asarray(hi), jnp.asarray(lo))


def _relerr(got, want):
    g = np.asarray(got[0], np.float64) + np.asarray(got[1], np.float64)
    return np.max(np.abs(g - want) / np.maximum(np.abs(want), 1e-300))


def test_dd_transcendentals_vs_f64():
    rng = np.random.default_rng(5)
    x64 = rng.uniform(1e-6, 1e6, 4096)
    x = _pair(x64)
    assert _relerr(df64.dd_log(x), np.log(x64)) < 1e-13
    assert _relerr(df64.dd_sqrt(x), np.sqrt(x64)) < 1e-13
    assert _relerr(df64.dd_recip(x), 1.0 / x64) < 1e-13
    assert _relerr(df64.dd_sqr(x), x64 ** 2) < 1e-13
    e_in = rng.uniform(-60, 60, 4096)
    assert _relerr(df64.dd_exp(_pair(e_in)), np.exp(e_in)) < 1e-12
    a32 = rng.uniform(0.1, 3.0, 4096).astype(np.float32)
    want = x64 ** a32.astype(np.float64)
    assert _relerr(df64.dd_pow(x, jnp.asarray(a32)), want) < 1e-12


def test_dd_transcendental_edges():
    def one(fn, v):
        h, l = fn((jnp.float32(v), jnp.float32(0.0)))
        return float(h)

    assert one(df64.dd_exp, -np.inf) == 0.0
    assert one(df64.dd_exp, np.inf) == np.inf
    assert np.isnan(one(df64.dd_exp, np.nan))
    assert one(df64.dd_exp, 100.0) == np.inf
    assert one(df64.dd_exp, -100.0) == 0.0
    assert one(df64.dd_log, 0.0) == -np.inf
    assert np.isnan(one(df64.dd_log, -1.0))
    assert one(df64.dd_log, np.inf) == np.inf
    # barrier Log: negative -> -inf (rejected trial), not NaN
    assert one(df64.dd_log_barrier, -1.0) == -np.inf


def test_dd_cancellation_r():
    # the solver's money cancellation: r = s^2 - |q|^2 with r/s^2 ~ 1e-5
    rng = np.random.default_rng(6)
    s = rng.uniform(0.5, 2.0, 4096)
    q2 = s ** 2 * (1 - 1e-5 * rng.uniform(0.5, 1.5, 4096))
    r = df64.dd_sub(df64.dd_sqr(_pair(s)), _pair(q2))
    want = s ** 2 - q2
    assert _relerr(r, want) < 1e-8        # plain f32 is ~1e-2 here
