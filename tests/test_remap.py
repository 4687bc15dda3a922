"""PPM vertical remap validation.

Strategy (mirrors SURVEY §7 kernel-3 validation): a slow per-column numpy
oracle implements the published PPM remap algorithm (Lin 2004; FV3
fv_mapz 'mappm' semantics, reference external/mappm/mappm/mappm.f90) with
explicit loops; the vectorized TPU implementation must match it, plus
conservation / identity / boundedness properties that hold for any kord.
"""
import numpy as np
import pytest
import jax

from fv3net_tpu.ops import remap

jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# numpy oracle: single-column PPM reconstruction + integral remap (kord<=7)
# ---------------------------------------------------------------------------


def oracle_ppm_profile(q, delp, iv, kord):
    km = len(q)
    al = np.zeros(km)
    ar = np.zeros(km)
    a6 = np.zeros(km)
    dc = np.zeros(km)
    delq = np.diff(q)  # delq[k] = q[k+1]-q[k]
    d4 = np.zeros(km)
    for k in range(1, km):
        d4[k] = delp[k - 1] + delp[k]
    df2 = np.zeros(km)
    for k in range(1, km - 1):
        c1 = (delp[k - 1] + 0.5 * delp[k]) / d4[k + 1]
        c2 = (delp[k + 1] + 0.5 * delp[k]) / d4[k]
        df2[k] = delp[k] * (c1 * delq[k] + c2 * delq[k - 1]) / (d4[k] + delp[k + 1])
        qmax = max(q[k - 1], q[k], q[k + 1]) - q[k]
        qmin = q[k] - min(q[k - 1], q[k], q[k + 1])
        dc[k] = np.sign(df2[k]) * min(abs(df2[k]), qmax, qmin) if df2[k] != 0 else 0.0
        if df2[k] == 0:
            dc[k] = 0.0
        else:
            dc[k] = min(abs(df2[k]), qmax, qmin) * (1 if df2[k] >= 0 else -1)
    for k in range(2, km - 1):
        c1 = delq[k - 1] * delp[k - 1] / d4[k]
        a1 = d4[k - 1] / (d4[k] + delp[k - 1])
        a2 = d4[k + 1] / (d4[k] + delp[k])
        al[k] = q[k - 1] + c1 + 2.0 / (d4[k - 1] + d4[k + 1]) * (
            delp[k] * (c1 * (a1 - a2) + a2 * dc[k - 1]) - delp[k - 1] * a1 * dc[k]
        )
    # top cubic
    d1, d2 = delp[0], delp[1]
    qm = (d2 * q[0] + d1 * q[1]) / (d1 + d2)
    dq = 2.0 * (q[1] - q[0]) / (d1 + d2)
    c1 = 4.0 * (al[2] - qm - d2 * dq) / (d2 * (2 * d2 * d2 + d1 * (d2 + 3 * d1)))
    c3 = dq - 0.5 * c1 * (d2 * (5 * d1 + d2) - 3 * d1 * d1)
    al[1] = qm - 0.25 * c1 * d1 * d2 * (d2 + 3.0 * d1)
    al[0] = d1 * (2.0 * c1 * d1 * d1 - c3) + al[1]
    al[1] = min(max(al[1], min(q[0], q[1])), max(q[0], q[1]))
    dc[0] = 0.5 * (al[1] - q[0])
    if iv == 0:
        al[0] = max(0.0, al[0])
        al[1] = max(0.0, al[1])
    elif iv == -1:
        if al[0] * q[0] <= 0.0:
            al[0] = 0.0
    iv2_top = abs(iv) == 2
    # bottom cubic
    d1, d2 = delp[km - 1], delp[km - 2]
    qm = (d2 * q[km - 1] + d1 * q[km - 2]) / (d1 + d2)
    dq = 2.0 * (q[km - 2] - q[km - 1]) / (d1 + d2)
    c1 = (al[km - 2] - qm - d2 * dq) / (d2 * (2 * d2 * d2 + d1 * (d2 + 3 * d1)))
    c3 = dq - 2.0 * c1 * (d2 * (5 * d1 + d2) - 3 * d1 * d1)
    al[km - 1] = qm - c1 * d1 * d2 * (d2 + 3.0 * d1)
    ar_last = d1 * (8.0 * c1 * d1 * d1 - c3) + al[km - 1]
    al[km - 1] = min(max(al[km - 1], min(q[km - 1], q[km - 2])),
                     max(q[km - 1], q[km - 2]))
    dc[km - 1] = 0.5 * (q[km - 1] - al[km - 1])
    if iv == 0:
        al[km - 1] = max(0.0, al[km - 1])
        ar_last = max(0.0, ar_last)
    elif iv < 0:
        if q[km - 1] * ar_last <= 0.0:
            ar_last = 0.0
    if iv2_top:
        al[0] = q[0]
    for k in range(km - 1):
        ar[k] = al[k + 1]
    ar[km - 1] = ar_last

    def limiters(k, lmt):
        if lmt == 3:
            return
        if lmt == 0:
            if dc[k] == 0.0:
                al[k] = q[k]
                ar[k] = q[k]
                a6[k] = 0.0
            else:
                da1 = ar[k] - al[k]
                da2 = da1 ** 2
                a6da = a6[k] * da1
                if a6da < -da2:
                    a6[k] = 3.0 * (al[k] - q[k])
                    ar[k] = al[k] - a6[k]
                elif a6da > da2:
                    a6[k] = 3.0 * (ar[k] - q[k])
                    al[k] = ar[k] - a6[k]
        elif lmt == 1:
            qmp = 2.0 * dc[k]
            al[k] = q[k] - np.sign(qmp) * min(abs(qmp), abs(al[k] - q[k])) if qmp != 0 else q[k]
            ar[k] = q[k] + np.sign(qmp) * min(abs(qmp), abs(ar[k] - q[k])) if qmp != 0 else q[k]
            a6[k] = 3.0 * (2.0 * q[k] - (al[k] + ar[k]))
        elif lmt == 2:
            if abs(ar[k] - al[k]) < -a6[k]:
                fmin = q[k] + 0.25 * (ar[k] - al[k]) ** 2 / a6[k] + a6[k] / 12.0
                if fmin < 0.0:
                    if q[k] < ar[k] and q[k] < al[k]:
                        ar[k] = q[k]
                        al[k] = q[k]
                        a6[k] = 0.0
                    elif ar[k] > al[k]:
                        a6[k] = 3.0 * (al[k] - q[k])
                        ar[k] = al[k] - a6[k]
                    else:
                        a6[k] = 3.0 * (ar[k] - q[k])
                        al[k] = ar[k] - a6[k]

    for k in (0, 1):
        a6[k] = 3.0 * (2.0 * q[k] - (al[k] + ar[k]))
        limiters(k, 0)
    if kord >= 7:
        h2 = np.zeros(km)
        for k in range(1, km - 1):
            h2[k] = (
                2.0 * (dc[k + 1] / delp[k + 1] - dc[k - 1] / delp[k - 1])
                / (delp[k] + 0.5 * (delp[k - 1] + delp[k + 1]))
                * delp[k] ** 2
            )
        fac = 1.5
        for k in range(2, km - 2):
            pmp = 2.0 * dc[k]
            qmp = q[k] + pmp
            lac = q[k] + fac * h2[k - 1] + dc[k]
            ar[k] = min(max(ar[k], min(q[k], qmp, lac)), max(q[k], qmp, lac))
            qmp = q[k] - pmp
            lac = q[k] + fac * h2[k + 1] - dc[k]
            al[k] = min(max(al[k], min(q[k], qmp, lac)), max(q[k], qmp, lac))
            a6[k] = 3.0 * (2.0 * q[k] - (al[k] + ar[k]))
            if iv == 0 and kord >= 6:
                limiters(k, 2)
    else:
        lmt = max(0, kord - 3)
        if iv == 0:
            lmt = min(2, lmt)
        for k in range(2, km - 2):
            if kord != 4:
                a6[k] = 3.0 * (2.0 * q[k] - (al[k] + ar[k]))
            if kord != 6:
                limiters(k, lmt)
    for k in (km - 2, km - 1):
        a6[k] = 3.0 * (2.0 * q[k] - (al[k] + ar[k]))
        limiters(k, 0)
    return al, ar, a6


def oracle_mappm(pe1, q1, pe2, iv, kord):
    """Single-column integral remap from the PPM reconstruction."""
    km = len(q1)
    kn = len(pe2) - 1
    dp1 = np.diff(pe1)
    al, ar, a6 = oracle_ppm_profile(q1, dp1, iv, kord)
    q2 = np.zeros(kn)

    def seg_mean(L, pl, pr):
        tt = (pr * (pr + pl) + pl * pl) / 3.0
        return al[L] + 0.5 * (a6[L] + ar[L] - al[L]) * (pr + pl) - a6[L] * tt

    for k in range(kn):
        if pe2[k] <= pe1[0]:
            q2[k] = q1[0]
        elif pe2[k] >= pe1[km]:
            q2[k] = q1[km - 1]
        else:
            L = np.searchsorted(pe1, pe2[k], side="right") - 1
            L = min(L, km - 1)
            pl = (pe2[k] - pe1[L]) / dp1[L]
            if pe2[k + 1] <= pe1[L + 1]:
                pr = (pe2[k + 1] - pe1[L]) / dp1[L]
                q2[k] = seg_mean(L, pl, pr)
            else:
                qsum = (pe1[L + 1] - pe2[k]) * seg_mean(L, pl, 1.0)
                dpsum = pe1[L + 1] - pe2[k]
                Lp = L + 1
                while Lp < km and pe2[k + 1] > pe1[Lp + 1]:
                    qsum += dp1[Lp] * q1[Lp]
                    dpsum += dp1[Lp]
                    Lp += 1
                if Lp < km:
                    delp = pe2[k + 1] - pe1[Lp]
                    esl = delp / dp1[Lp]
                    qsum += delp * seg_mean(Lp, 0.0, esl)
                    dpsum += delp
                else:
                    delp = pe2[k + 1] - pe1[km]
                    if delp > 0:
                        qsum += delp * q1[km - 1]
                        dpsum += delp
                q2[k] = qsum / dpsum
    return q2


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def random_columns(rng, n, km, kn):
    """Random increasing edge pressures + fields."""
    pe1 = np.sort(rng.uniform(300, 1e5, (n, km + 1)), axis=-1)
    pe1[:, 0] = 300.0
    # target grids overlapping but shifted/extended
    pe2 = np.sort(rng.uniform(250, 1.05e5, (n, kn + 1)), axis=-1)
    q1 = rng.uniform(0.1, 10.0, (n, km))
    return pe1, q1, pe2


@pytest.mark.parametrize("iv,kord", [(1, 1), (0, 1), (-1, 1), (2, 1), (1, 7), (0, 7)])
def test_remap_matches_oracle(iv, kord):
    rng = np.random.RandomState(42)
    km, kn, n = 20, 15, 12
    pe1, q1, pe2 = random_columns(rng, n, km, kn)
    got = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=iv, kord=kord))
    for i in range(n):
        want = oracle_mappm(pe1[i], q1[i], pe2[i], iv, kord)
        np.testing.assert_allclose(got[i], want, rtol=1e-9, atol=1e-10,
                                   err_msg=f"column {i}")


@pytest.mark.parametrize("kord", [1, 7, 9, 17])
def test_mass_conservation(kord):
    """Same total pressure range => total mass conserved for any kord."""
    rng = np.random.RandomState(1)
    km, kn, n = 24, 17, 8
    pe1 = np.sort(rng.uniform(300, 1e5, (n, km + 1)), axis=-1)
    q1 = rng.uniform(0.1, 5.0, (n, km))
    # pe2 with the same first/last edges
    interior = np.sort(rng.uniform(0.02, 0.98, (n, kn - 1)), axis=-1)
    pe2 = np.concatenate(
        [
            pe1[:, :1],
            pe1[:, :1] + interior * (pe1[:, -1:] - pe1[:, :1]),
            pe1[:, -1:],
        ],
        axis=-1,
    )
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=1, kord=kord))
    mass1 = (q1 * np.diff(pe1, axis=-1)).sum(-1)
    mass2 = (q2 * np.diff(pe2, axis=-1)).sum(-1)
    np.testing.assert_allclose(mass1, mass2, rtol=1e-10)


@pytest.mark.parametrize("kord", [1, 7, 9, 17])
def test_identity_remap(kord):
    rng = np.random.RandomState(2)
    km, n = 30, 6
    pe1 = np.sort(rng.uniform(300, 1e5, (n, km + 1)), axis=-1)
    q1 = rng.uniform(0.1, 5.0, (n, km))
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe1, iv=1, kord=kord))
    np.testing.assert_allclose(q2, q1, rtol=1e-9)


def test_constant_field_preserved():
    rng = np.random.RandomState(3)
    pe1, q1, pe2 = random_columns(rng, 5, 22, 13)
    q1 = np.full_like(q1, 3.25)
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=1, kord=1))
    np.testing.assert_allclose(q2, 3.25, rtol=1e-12)


@pytest.mark.parametrize("kord", [1])
def test_monotone_bounds_interior(kord):
    """Monotonic remap must not create new extrema for target layers that
    sample only interior source layers (the unclipped boundary cubic may
    legitimately overshoot in the first/last two layers, and the kord>7
    cubic-spline path intentionally preserves extrema — the Fortran
    behaves identically, so only kord=1 is checked)."""
    rng = np.random.RandomState(4)
    pe1, q1, pe2 = random_columns(rng, 10, 25, 18)
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=1, kord=kord))
    interior = (pe2[:, :-1] >= pe1[:, 2:3]) & (pe2[:, 1:] <= pe1[:, -3:-2])
    hi = q1.max(-1, keepdims=True)
    lo = q1.min(-1, keepdims=True)
    assert (q2[interior] <= np.broadcast_to(hi, q2.shape)[interior] + 1e-10).all()
    assert (q2[interior] >= np.broadcast_to(lo, q2.shape)[interior] - 1e-10).all()


def test_positive_definite_iv0():
    rng = np.random.RandomState(5)
    pe1, q1, pe2 = random_columns(rng, 10, 25, 18)
    q1 = np.maximum(q1 - 4.0, 0.0)  # sparse nonneg field
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=0, kord=1))
    assert (q2 >= -1e-12).all()


def test_extension_above_and_below():
    """Targets beyond the source range take the edge-layer values."""
    km = 10
    pe1 = np.linspace(300.0, 1e5, km + 1)
    q1 = np.linspace(1.0, 2.0, km)
    pe2 = np.array([100.0, 200.0, 250.0, 5e4, 1.2e5, 1.3e5])
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe2, iv=1, kord=1))
    np.testing.assert_allclose(q2[0], q1[0])  # entirely above old top
    np.testing.assert_allclose(q2[1], q1[0])
    np.testing.assert_allclose(q2[-1], q1[-1])  # entirely below old surface


def test_interpolate_1d_matches_np_interp():
    rng = np.random.RandomState(6)
    n, n_in, n_out = 7, 15, 9
    x = np.sort(rng.uniform(0, 100, (n, n_in)), axis=-1)
    y = rng.randn(n, n_in)
    xp = rng.uniform(-10, 110, (n, n_out))
    got = np.asarray(remap.interpolate_1d(xp, x, y))
    for i in range(n):
        inside = (xp[i] >= x[i, 0]) & (xp[i] <= x[i, -1])
        want = np.interp(xp[i], x[i], y[i])
        np.testing.assert_allclose(got[i][inside], want[inside], rtol=1e-12)
        assert np.isnan(got[i][~inside]).all()


def test_remap_batched_shapes():
    """Leading batch dims of any rank are supported."""
    rng = np.random.RandomState(7)
    pe1 = np.sort(rng.uniform(300, 1e5, (2, 3, 11)), axis=-1)
    q1 = rng.uniform(0.1, 5.0, (2, 3, 10))
    q2 = np.asarray(remap.remap_ppm(pe1, q1, pe1, iv=1, kord=1))
    assert q2.shape == (2, 3, 10)
