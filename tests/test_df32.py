"""df32 compensated arithmetic (ops/df32.py) vs NumPy float64 ground truth,
and the gram_dense duality gap below the plain-f32 cancellation floor
(ADVICE r2: the old gap silently degraded to f32 when x64 was off)."""
import numpy as np
import jax
import jax.numpy as jnp

from fastoptsolver_tpu.ops import df32


def test_two_sum_two_prod_exact():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=256) * 10.0 ** rng.integers(-6, 6, 256),
                    jnp.float32)
    b = jnp.asarray(rng.normal(size=256) * 10.0 ** rng.integers(-6, 6, 256),
                    jnp.float32)
    s, e = df32.two_sum(a, b)
    exact = np.asarray(a, np.float64) + np.asarray(b, np.float64)
    np.testing.assert_array_equal(
        np.asarray(s, np.float64) + np.asarray(e, np.float64), exact
    )
    p, pe = df32.two_prod(a, b)
    exact = np.asarray(a, np.float64) * np.asarray(b, np.float64)
    err = np.abs(np.asarray(p, np.float64) + np.asarray(pe, np.float64) - exact)
    # the cross-term fold rounds once at the 12-bit-half scale (~2⁻³⁵)
    assert np.all(err <= 2.0 ** -33 * np.abs(exact))
    # the four split addends themselves are exact
    t1, t2, t3, t4 = df32.exact_mul_terms(a, b)
    total = sum(np.asarray(t, np.float64) for t in (t1, t2, t3, t4))
    np.testing.assert_array_equal(total, exact)


def test_dot2_sum2_cancellation_accuracy():
    # adversarial: large positive/negative terms cancelling to a tiny result
    rng = np.random.default_rng(1)
    n = 4097  # non-multiple of the block
    u64 = rng.normal(size=n) * 1e4
    u64[n // 2:] = -u64[: n - n // 2][::-1] * (1 + 1e-9)  # near-cancellation
    u = u64.astype(np.float32)
    v = rng.normal(size=n).astype(np.float32)

    hi, lo = df32.dot2(jnp.asarray(u), jnp.asarray(v))
    exact = float(u.astype(np.float64) @ v.astype(np.float64))
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    scale = float(np.abs(u.astype(np.float64) * v.astype(np.float64)).sum())
    assert abs(got - exact) <= 1e-13 * scale
    # plain f32 is orders of magnitude worse on the same data
    plain = float(np.float32(u @ v))
    assert abs(got - exact) < abs(plain - exact) or plain == exact

    hi, lo = df32.sum2(jnp.asarray(u))
    exact = float(u.astype(np.float64).sum())
    got = float(np.asarray(hi, np.float64) + np.asarray(lo, np.float64))
    assert abs(got - exact) <= 1e-13 * float(np.abs(u).sum())


def test_matvec2_matches_float64():
    rng = np.random.default_rng(2)
    for n in (7, 64, 300):
        Q = rng.normal(size=(n, n)).astype(np.float32) * 100.0
        x = rng.normal(size=n).astype(np.float32)
        wh, wl = df32.matvec2(jnp.asarray(Q), jnp.asarray(x))
        exact = Q.astype(np.float64) @ x.astype(np.float64)
        got = np.asarray(wh, np.float64) + np.asarray(wl, np.float64)
        scale = np.abs(Q.astype(np.float64) * x.astype(np.float64)[None, :]).sum(1)
        assert np.all(np.abs(got - exact) <= 1e-13 * np.maximum(scale, 1e-30))


def _gap_f64(Q, c, btb, a1, a2, x):
    """Host float64 oracle of the gap formula on the stored f32 values."""
    Q, c, x = Q.astype(np.float64), c.astype(np.float64), x.astype(np.float64)
    btb = np.float64(btb)
    QX = Q @ x
    xQx = x @ QX
    cx = c @ x
    xx = x @ x
    l1 = np.abs(x).sum()
    rr = max(xQx - 2 * cx + btb, 0.0)
    rb = cx - btb
    u = QX - c + a2 * x
    u_inf = np.abs(u).max()
    uu = u @ u
    f = 0.5 * rr + 0.5 * a2 * xx + a1 * l1
    s = a1 / max(u_inf, 1e-30) if u_inf > a1 else 1.0
    dual_neg = 0.5 * s * s * rr + s * rb + 0.5 * a2 * s * s * xx
    l1_gap = max(f + dual_neg, 0.0)
    smooth = uu / (2 * a2) if a2 > 0 else uu
    gap = l1_gap if a1 > 0 else smooth
    return gap / max(f, 1.0)


def _large_m_problem(m=200_000, n=40, seed=0):
    """The cancellation regime: ‖Ax−b‖² ≪ bᵀb (b dominated by a component
    far from the column space's reach at the optimum is NOT what we want —
    we want a very good fit, so residual tiny vs ‖b‖)."""
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(m, n)).astype(np.float32) / np.sqrt(n)
    x_true = rng.normal(size=n).astype(np.float32) * 3.0
    b = (A @ x_true + 1e-4 * rng.normal(size=m).astype(np.float32)).astype(
        np.float32
    )
    # stored-f32 Gram triple (computed accurately, then rounded — mirrors
    # stream_gram's compensated accumulation)
    Q = (A.astype(np.float64).T @ A.astype(np.float64)).astype(np.float32)
    c = (A.astype(np.float64).T @ b.astype(np.float64)).astype(np.float32)
    btb = np.float32(b.astype(np.float64) @ b.astype(np.float64))
    return Q, c, btb


def test_rel_gap_dense_resolves_below_f32_floor():
    from fastoptsolver_tpu.solvers.gram_dense import _rel_gap_dense

    Q, c, btb = _large_m_problem()
    n = Q.shape[0]
    a1 = 0.001 * float(np.abs(c).max())
    a2 = 0.0
    # near-optimal x: a long f64 FISTA run on the stored triple
    x = np.zeros(n)
    y, t = x.copy(), 1.0
    L = float(np.linalg.eigvalsh(Q.astype(np.float64)).max())
    for _ in range(30000):
        g = Q.astype(np.float64) @ y - c.astype(np.float64)
        v = y - g / L
        xn = np.sign(v) * np.maximum(np.abs(v) - a1 / L, 0.0)
        tn = 0.5 * (1 + np.sqrt(1 + 4 * t * t))
        y = xn + ((t - 1) / tn) * (xn - x)
        x, t = xn, tn
    x32 = x.astype(np.float32)

    oracle = _gap_f64(Q, c, btb, a1, a2, x32)
    got = float(
        _rel_gap_dense(
            jnp.asarray(Q), jnp.asarray(c), jnp.asarray(btb, jnp.float32),
            a1, a2, jnp.asarray(x32),
        )
    )
    # the df32 gap matches the f64 oracle on the stored triple
    assert abs(got - oracle) <= 1e-7 + 0.05 * oracle, (got, oracle)
    # x is at the stored triple's optimum: what remains (~2.6e-5 here) is the
    # f32 representation floor of (Q, c, bᵀb) itself — the documented residual
    # limit, NOT arithmetic error (4000 vs 30000 f64 iterations: same value)
    assert oracle < 2e-4, oracle
    f = 0.5 * max(
        float(x32.astype(np.float64) @ (Q.astype(np.float64) @ x32.astype(np.float64)))
        - 2 * float(c.astype(np.float64) @ x32.astype(np.float64)) + float(btb),
        0.0,
    ) + a1 * float(np.abs(x32).sum())
    assert float(btb) / max(f, 1.0) > 300  # heavy cancellation present
    # plain-f32 evaluation of the same formula drowns in that cancellation —
    # the df32 path is what makes the gap readable at all here
    f32 = np.float32
    QX = Q @ x32
    rr32 = max(f32(f32(x32 @ QX) - f32(2.0) * f32(c @ x32) + btb), f32(0.0))
    u = QX - c
    u_inf = f32(np.abs(u).max())
    l1_ = f32(np.abs(x32).sum())
    f32_f = f32(f32(0.5) * rr32 + f32(a1) * l1_)
    s = f32(a1 / u_inf) if u_inf > a1 else f32(1.0)
    dn = f32(f32(0.5) * s * s * rr32 + s * f32(f32(c @ x32) - btb))
    gap32 = max(f32(f32_f + dn), f32(0.0)) / max(f32_f, f32(1.0))
    assert abs(float(gap32) - oracle) > 10 * max(abs(got - oracle), 1e-9), (
        float(gap32), got, oracle
    )


def test_stream_gram_compensated_accumulation():
    from fastoptsolver_tpu.problems import stream_gram, chunk_rows

    rng = np.random.default_rng(3)
    m, n = 60_000, 8
    A = rng.normal(size=(m, n)).astype(np.float32)
    b = rng.normal(size=m).astype(np.float32) * 1.1  # non-dyadic values
    gram = stream_gram(chunk_rows(A, b, 512), n=n)  # 118 chunks
    btb64 = float(b.astype(np.float64) @ b.astype(np.float64))
    Q64 = A.astype(np.float64).T @ A.astype(np.float64)
    # Kahan keeps the cross-chunk accumulation to ~one rounding; what remains
    # on Q is the per-chunk f32 matmul rounding (absolute, at the scale of
    # the m-term column dots), not chunk-count drift
    assert abs(float(gram.btb) - btb64) <= 4e-7 * btb64
    np.testing.assert_allclose(
        np.asarray(gram.Q, np.float64), Q64, rtol=1e-5, atol=1e-3
    )
    assert int(gram.m) == m
