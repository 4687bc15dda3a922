"""Hydrostatic vertically-Lagrangian dynamics step.

The TPU-native replacement for the Fortran FV3 dycore invoked through
``wrapper.step_dynamics()`` (reference:
workflows/prognostic_c48_run/runtime/loop.py:376-383).  Discretization:

- A-grid finite volume on the gnomonic cubed sphere; all horizontal
  operators are Green-Gauss edge sums using the grid's edge lengths and
  Cartesian edge normals, so the same code handles tile interiors, the 12
  cube edges and 8 corners (halo-extended arrays carry neighbor data).
- Flux-form upwind transport of mass, theta_v, tracers, and the three
  Cartesian wind components (momentum advection + curvature handled by
  tangent-plane projection after update).
- Hydrostatic pressure-gradient force in the Simmons-Burridge form
  (-grad phi - R T_v grad ln p), forward-backward coupled (mass first).
- Vertically Lagrangian: no vertical terms during substeps; a PPM remap
  (fv3net_tpu.ops.remap) returns layers to the hybrid coordinate each
  dynamics interval — the FV3 signature architecture (Lin 2004).

Everything is shape-static and jittable; the substep loop is a
``lax.fori_loop``.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fv3net_tpu.core.constants import (
    CP_AIR,
    GRAVITY,
    KAPPA,
    RDGAS,
    REFERENCE_SURFACE_PRESSURE,
    TOA_PRESSURE,
)
from fv3net_tpu.grid.geometry import Grid
from fv3net_tpu.parallel.halo import halo_append
from fv3net_tpu.dycore import vertical
from fv3net_tpu.ops import zscan
from fv3net_tpu.dycore.state import DycoreState


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GridArrays:
    """Device-resident static geometry (pytree of jnp arrays)."""

    area: jnp.ndarray  # [6, n, n]
    edge_len_x: jnp.ndarray  # [6, n+1, n]
    edge_len_y: jnp.ndarray  # [6, n, n+1]
    normal_x: jnp.ndarray  # [3, 6, n+1, n]
    normal_y: jnp.ndarray  # [3, 6, n, n+1]
    khat: jnp.ndarray  # [3, 6, n, n]
    f_coriolis: jnp.ndarray  # [6, n, n]
    dist_x: jnp.ndarray  # [6, n+1, n] center-to-center across x-edges
    dist_y: jnp.ndarray  # [6, n, n+1] center-to-center across y-edges
    # distance-based interpolation weight of the LEFT (lower-index) cell at
    # each edge midpoint; 0.5 in the uniform interior, asymmetric at cube
    # edges/corners where the stencil is skewed
    wleft_x: jnp.ndarray  # [6, n+1, n]
    wleft_y: jnp.ndarray  # [6, n, n+1]
    # least-squares gradient coefficients: grad_c = sum_k C[k] (s_k - s_c)
    # over the 4 face neighbors (W, E, S, N); exact for linear fields on
    # every cell including the skewed cube corners
    lsq_coeff: jnp.ndarray  # [4, 3, 6, n, n]
    east: jnp.ndarray  # [3, 6, n, n] unit east at centers
    north: jnp.ndarray  # [3, 6, n, n] unit north at centers
    lat: jnp.ndarray  # [6, n, n] radians
    lon: jnp.ndarray  # [6, n, n] radians

    @classmethod
    def from_grid(cls, grid: Grid, dtype=jnp.float32) -> "GridArrays":
        # every geometry table is computed host-side in float64 numpy and
        # cast to the device dtype LAST: adjacent-center differences
        # cancel catastrophically if the unit vectors round through f32
        # first (float64-exact halo: parallel/halo.py halo_append_numpy)
        from fv3net_tpu.parallel.halo import halo_append_numpy

        ext = halo_append_numpy(
            np.moveaxis(grid.centers_xyz, -1, 1).reshape(
                6, 3, grid.n, grid.n
            ).astype(np.float64),
            1,
        )
        # ext: [6, 3, n+2, n+2] unit center vectors incl. neighbors
        def gc_dist(a, b):
            cross = np.linalg.norm(np.cross(a, b, axis=1), axis=1)
            dot = np.sum(a * b, axis=1)
            return np.arctan2(cross, dot) * grid.radius

        # across y-edges (between (j,i-1),(j,i)): i_edge = 0..n
        dist_y = gc_dist(ext[:, :, 1:-1, :-1], ext[:, :, 1:-1, 1:])
        # across x-edges
        dist_x = gc_dist(ext[:, :, :-1, 1:-1], ext[:, :, 1:, 1:-1])

        # edge midpoints for distance-weighted face interpolation: the
        # interpolated value at the edge midpoint is
        #   w_left * s_left + (1 - w_left) * s_right
        # with w_left = d(right_center, edge_mid) / (d_left + d_right)
        corners = np.moveaxis(grid.corners_xyz, -1, 1).astype(
            np.float64
        )  # [6, 3, n+1, n+1]
        mid_y = corners[:, :, :-1, :] + corners[:, :, 1:, :]  # y-edge mids
        mid_y = mid_y / np.linalg.norm(mid_y, axis=1, keepdims=True)
        mid_x = corners[:, :, :, :-1] + corners[:, :, :, 1:]
        mid_x = mid_x / np.linalg.norm(mid_x, axis=1, keepdims=True)

        dl_y = gc_dist(ext[:, :, 1:-1, :-1], mid_y)
        dr_y = gc_dist(mid_y, ext[:, :, 1:-1, 1:])
        wleft_y = dr_y / (dl_y + dr_y)
        dl_x = gc_dist(ext[:, :, :-1, 1:-1], mid_x)
        dr_x = gc_dist(mid_x, ext[:, :, 1:, 1:-1])
        wleft_x = dr_x / (dl_x + dr_x)

        # least-squares gradient tables (numpy, float64)
        ext_np = ext * grid.radius  # [6, 3, n+2, n+2]
        c = ext_np[:, :, 1:-1, 1:-1]
        disp = np.stack(
            [
                ext_np[:, :, 1:-1, :-2] - c,  # W
                ext_np[:, :, 1:-1, 2:] - c,  # E
                ext_np[:, :, :-2, 1:-1] - c,  # S
                ext_np[:, :, 2:, 1:-1] - c,  # N
            ]
        )  # [4, 6, 3, n, n]
        k_np = np.moveaxis(grid.centers_xyz, -1, 1)  # [6, 3, n, n]
        # normal equations with the radial direction regularized out:
        # M = sum_k d d^T + R^2 khat khat^T; C_k = M^-1 d_k
        M = np.einsum("ktaij,ktbij->tijab", disp, disp)
        M += grid.radius ** 2 * np.einsum(
            "taij,tbij->tijab", k_np, k_np
        )
        Minv = np.linalg.inv(M)  # [6, n, n, 3, 3]
        lsq = np.einsum("tijab,ktbij->katij", Minv, disp)  # [4,3,6,n,n]
        return cls(
            area=jnp.asarray(grid.area, dtype),
            edge_len_x=jnp.asarray(grid.edge_len_x, dtype),
            edge_len_y=jnp.asarray(grid.edge_len_y, dtype),
            normal_x=jnp.asarray(np.moveaxis(grid.normal_x, -1, 0), dtype),
            normal_y=jnp.asarray(np.moveaxis(grid.normal_y, -1, 0), dtype),
            khat=jnp.asarray(np.moveaxis(grid.centers_xyz, -1, 0), dtype),
            f_coriolis=jnp.asarray(grid.f_coriolis, dtype),
            dist_x=jnp.asarray(dist_x, dtype),
            dist_y=jnp.asarray(dist_y, dtype),
            wleft_x=jnp.asarray(wleft_x, dtype),
            wleft_y=jnp.asarray(wleft_y, dtype),
            lsq_coeff=jnp.asarray(lsq, dtype),
            east=jnp.asarray(np.moveaxis(grid.east, -1, 0), dtype),
            north=jnp.asarray(np.moveaxis(grid.north, -1, 0), dtype),
            lat=jnp.asarray(grid.lat, dtype),
            lon=jnp.asarray(grid.lon, dtype),
        )


@dataclasses.dataclass(frozen=True)
class DycoreConfig:
    """Static dynamics configuration (hashable; closed over by jit)."""

    dt: float = 900.0  # dynamics interval, s (reference default dt_atmos)
    n_split: int = 2  # forward-backward substeps per interval
    kord: int = 9  # PPM reconstruction order for the vertical remap
    ptop: float = TOA_PRESSURE
    diff_coef: float = 0.015  # nondim del-2 damping (x dx^2 / dt_sub)
    # nondim divergence damping (x dx^2 / dt_sub); FV3's principal
    # stabilizer of the divergent modes (nord/d4_bg machinery in
    # fv3gfs-fortran; a del-2 form here)
    divergence_damp_coef: float = 0.0
    remap: bool = True
    # remap total energy (cp Tv + phi + K) instead of theta_v during the
    # vertical remap and recover Tv hydrostatically — FV3's
    # energy-conserving te_map (fv_mapz.F90 remap_te); costs one extra
    # remapped field + an upward sweep
    remap_te: bool = False
    # 1 = upwind, 2 = monotone van Leer MUSCL, 4 = PPM with CW84
    # monotonization and Courant-integrated face fluxes (the Lin & Rood
    # 1996 / Putman & Lin 2007 transport operator, FV3's hord family)
    advection_order: int = 2
    # False = nonhydrostatic: prognostic w/delz, equation-of-state full
    # pressure in the horizontal PGF, and a semi-implicit per-column
    # acoustic solve each substep (dycore/nonhydro.py; the fv3gfs-fortran
    # ``hydrostatic`` namelist switch / nh_utils.F90 SIM solver)
    hydrostatic: bool = True
    # upper-level Rayleigh sponge (fv3gfs-fortran Rayleigh_Super;
    # namelist ``tau``/``rf_cutoff``): winds (and w nonhydrostatically)
    # are damped implicitly above rf_cutoff with a sin^2 ramp in log-p
    # toward the model top — e-folding time tau_rayleigh days at the
    # top — and the removed kinetic energy is returned as heat (the
    # Fortran ``conserve=.true.`` branch).  0 disables
    tau_rayleigh: float = 0.0  # days
    rf_cutoff: float = 750.0  # Pa
    # sponge-layer damping boost for the TOP TWO layers (fv3gfs-fortran
    # fv_core_nml ``d2_bg_k1``/``d2_bg_k2``): vertically-propagating
    # stationary/gravity waves steepen and break against the rigid model
    # top; FV3's standard remedy is strongly enhanced del-2 divergence
    # damping there.  Values are the nondim coefficient applied AT
    # layers 0/1 in place of divergence_damp_coef (0 = no boost).  The
    # del-2 wind/Tv damping is boosted to the same coefficients.
    d2_bg_k1: float = 0.0
    d2_bg_k2: float = 0.0


def _ext(field, h: int = 1):
    """Halo-extend [6, ..., n, n] -> [6, ..., n+2h, n+2h]."""
    return halo_append(field, h)


def _edge_normal_wind(wind_ext, g: GridArrays):
    """Normal velocity at y-edges and x-edges from halo-extended Cartesian
    wind [3, 6, nz, n+2, n+2].

    Face values use the distance-based edge-midpoint weights: plain 0.5
    averaging is zeroth-order on the skewed cube-corner cells where the
    two centers are not symmetric about the edge midpoint (the same
    consideration the wleft tables encode for scalar interpolation)."""
    wly = g.wleft_y[:, None]
    wy = (
        wly * wind_ext[..., 1:-1, :-1]
        + (1.0 - wly) * wind_ext[..., 1:-1, 1:]
    )
    vn_y = (wy * g.normal_y[:, :, None, :, :]).sum(axis=0)
    wlx = g.wleft_x[:, None]
    wx = (
        wlx * wind_ext[..., :-1, 1:-1]
        + (1.0 - wlx) * wind_ext[..., 1:, 1:-1]
    )
    vn_x = (wx * g.normal_x[:, :, None, :, :]).sum(axis=0)
    return vn_y, vn_x


def _upwind(vn, left, right):
    return jnp.where(vn > 0, left, right)


def _divergence(fy, fx, area):
    return (
        fy[..., 1:] - fy[..., :-1] + fx[..., 1:, :] - fx[..., :-1, :]
    ) / area


def _lsq_gradient(s_ext, g: GridArrays):
    """Least-squares tangent-plane gradient of [6, nz, n+2, n+2]
    -> [3, 6, nz, n, n]; exact for linear fields on every cell."""
    s_c = s_ext[..., 1:-1, 1:-1]
    diffs = jnp.stack(
        [
            s_ext[..., 1:-1, :-2] - s_c,
            s_ext[..., 1:-1, 2:] - s_c,
            s_ext[..., :-2, 1:-1] - s_c,
            s_ext[..., 2:, 1:-1] - s_c,
        ]
    )  # [4, 6, nz, n, n]
    coeff = g.lsq_coeff[:, :, :, None]  # [4, 3, 6, 1, n, n]
    return (coeff * diffs[:, None]).sum(axis=0)


def _del2(s_ext, g: GridArrays, nu):
    """Diffusive del-2 flux divergence of [6, nz, n+2, n+2] with viscosity
    nu [m^2/s]."""
    fy = (
        (s_ext[..., 1:-1, 1:] - s_ext[..., 1:-1, :-1])
        / g.dist_y[:, None]
        * g.edge_len_y[:, None]
    )
    fx = (
        (s_ext[..., 1:, 1:-1] - s_ext[..., :-1, 1:-1])
        / g.dist_x[:, None]
        * g.edge_len_x[:, None]
    )
    return nu * _divergence(fy, fx, g.area[:, None])


def _project_tangent(wind, khat):
    """Remove the radial component: wind [3, 6, nz, n, n]."""
    radial = (wind * khat[:, :, None]).sum(axis=0)
    return wind - radial[None] * khat[:, :, None]


def _minmod(a, b):
    return jnp.where(
        a * b > 0.0, jnp.where(jnp.abs(a) < jnp.abs(b), a, b), 0.0
    )


def _face_values_2nd(q_ext2, vn_y, vn_x):
    """Monotone 2nd-order (van Leer / minmod MUSCL) upwind face values
    from an h=2 extended array [6, nz, n+4, n+4]."""
    # --- y-edges (faces between (j, i-1) and (j, i)), i_edge = 0..n ------
    qm = q_ext2[..., 2:-2, 0:-3]   # q[i-2]
    ql = q_ext2[..., 2:-2, 1:-2]   # q[i-1]
    qr = q_ext2[..., 2:-2, 2:-1]   # q[i]
    qp = q_ext2[..., 2:-2, 3:]     # q[i+1]
    slope_l = _minmod(ql - qm, qr - ql)
    slope_r = _minmod(qr - ql, qp - qr)
    qy = jnp.where(vn_y > 0, ql + 0.5 * slope_l, qr - 0.5 * slope_r)
    # --- x-edges ---------------------------------------------------------
    qm = q_ext2[..., 0:-3, 2:-2]
    ql = q_ext2[..., 1:-2, 2:-2]
    qr = q_ext2[..., 2:-1, 2:-2]
    qp = q_ext2[..., 3:, 2:-2]
    slope_l = _minmod(ql - qm, qr - ql)
    slope_r = _minmod(qr - ql, qp - qr)
    qx = jnp.where(vn_x > 0, ql + 0.5 * slope_l, qr - 0.5 * slope_r)
    return qy, qx


def _ppm_edges_1d(q):
    """4th-order edge estimates + CW84 monotonized parabola coefficients
    along the LAST axis.  q: [..., m] -> (qL, qR, q6) for cells 2..m-3
    (each [..., m-4])."""
    # van-Leer limited central slopes (CW84 eq. 1.8) keep the edge
    # estimate bounded by the adjacent cell means
    dqc = 0.5 * (q[..., 2:] - q[..., :-2])  # cells 1..m-2
    dlo = q[..., 1:-1] - q[..., :-2]
    dhi = q[..., 2:] - q[..., 1:-1]
    dm = jnp.where(
        dlo * dhi > 0.0,
        jnp.sign(dqc)
        * jnp.minimum(jnp.abs(dqc),
                      2.0 * jnp.minimum(jnp.abs(dlo), jnp.abs(dhi))),
        0.0,
    )
    # 4th-order edge estimate (CW84 eq. 1.6): edge k+1/2 for k = 1..m-3
    qe = 0.5 * (q[..., 1:-2] + q[..., 2:-1]) - (
        dm[..., 1:] - dm[..., :-1]
    ) / 6.0  # [..., m-3]
    qc = q[..., 2:-2]          # cells 2..m-3
    ql = qe[..., :-1]
    qr = qe[..., 1:]
    # CW84 monotonization
    extremum = (qr - qc) * (qc - ql) <= 0.0
    dq = qr - ql
    q6_raw = 6.0 * (qc - 0.5 * (ql + qr))
    ql = jnp.where(extremum, qc, jnp.where(dq * q6_raw > dq * dq,
                                           3.0 * qc - 2.0 * qr, ql))
    qr = jnp.where(extremum, qc, jnp.where(-dq * dq > dq * q6_raw,
                                           3.0 * qc - 2.0 * ql, qr))
    q6 = 6.0 * (qc - 0.5 * (ql + qr))
    return ql, qr, q6


def _ppm_face_value_1d(q, c):
    """Courant-integrated PPM face values along the LAST axis.

    q: [..., m] cell means (m = n + 6, halo 3); c: [..., n+1] face Courant
    numbers (positive = flow toward +i).  Returns the swept-region mean
    [..., n+1] (CW84 eq. 1.12: the average of the upwind parabola over the
    distance |c| dx swept through the face in one step).
    """
    ql, qr, q6 = _ppm_edges_1d(q)  # cells 2..m-3 = local -1..n
    # face f (local 0..n) sits between parabola cells f and f+1 here
    l_ql, l_qr, l_q6 = ql[..., :-1], qr[..., :-1], q6[..., :-1]
    r_ql, r_qr, r_q6 = ql[..., 1:], qr[..., 1:], q6[..., 1:]
    cp = jnp.clip(c, 0.0, 1.0)
    cm = jnp.clip(-c, 0.0, 1.0)
    from_left = l_qr - 0.5 * cp * (
        (l_qr - l_ql) - (1.0 - 2.0 * cp / 3.0) * l_q6
    )
    from_right = r_ql + 0.5 * cm * (
        (r_qr - r_ql) + (1.0 - 2.0 * cm / 3.0) * r_q6
    )
    return jnp.where(c > 0, from_left, from_right)


def _face_values_ppm(q_ext3, cy, cx):
    """PPM face values from an h=3 extended array [6, nz, n+6, n+6]."""
    qy = _ppm_face_value_1d(q_ext3[..., 3:-3, :], cy)
    qx_t = _ppm_face_value_1d(
        jnp.swapaxes(q_ext3[..., 3:-3], -1, -2), jnp.swapaxes(cx, -1, -2)
    )
    return qy, jnp.swapaxes(qx_t, -1, -2)


def _substep(state: DycoreState, g: GridArrays, cfg: DycoreConfig, dt: float):
    delp, pt, wind, tracers = state.delp, state.pt, state.wind, state.tracers
    order = cfg.advection_order
    h = {1: 1, 2: 2, 4: 3}[order]

    # ---- halo extension -------------------------------------------------
    # ONE batched halo exchange for every transported field (stacking is
    # two cheap copies; separate per-field halo calls measured 1.35x
    # slower on v5e — the exchange's slice/flip/transpose moves dominate)
    names = list(tracers)
    fields = [delp, pt] + [tracers[k] for k in names] + [
        wind[c] for c in range(3)
    ]
    if not cfg.hydrostatic:
        fields += [state.w, state.delz]
    ext_all = _ext(jnp.stack(fields, axis=1), h)  # [6, F, nz, ny+, nx+]
    delp_e = ext_all[:, 0]
    pt_e = ext_all[:, 1]
    tr_e = {k: ext_all[:, 2 + i] for i, k in enumerate(names)}
    iw = 2 + len(names)
    wind_e = jnp.moveaxis(ext_all[:, iw : iw + 3], 1, 0)
    if not cfg.hydrostatic:
        w_e = ext_all[:, iw + 3]
        delz_e = ext_all[:, iw + 4]
    wind_e1 = wind_e[..., h - 1 : wind_e.shape[-2] - (h - 1),
                     h - 1 : wind_e.shape[-1] - (h - 1)]

    vn_y, vn_x = _edge_normal_wind(wind_e1, g)

    if order == 4:
        cy = vn_y * dt / g.dist_y[:, None]
        cx = vn_x * dt / g.dist_x[:, None]

    def faces(q_ext):
        if order == 4:
            return _face_values_ppm(q_ext, cy, cx)
        if order == 2:
            return _face_values_2nd(q_ext, vn_y, vn_x)
        qy = _upwind(vn_y, q_ext[..., 1:-1, :-1], q_ext[..., 1:-1, 1:])
        qx = _upwind(vn_x, q_ext[..., :-1, 1:-1], q_ext[..., 1:, 1:-1])
        return qy, qx

    # ---- mass fluxes ----------------------------------------------------
    ly = g.edge_len_y[:, None]
    lx = g.edge_len_x[:, None]
    dply, dplx = faces(delp_e)
    fy_m = vn_y * ly * dply
    fx_m = vn_x * lx * dplx
    div_m = _divergence(fy_m, fx_m, g.area[:, None])
    delp_new = delp - dt * div_m

    # ---- consistent scalar transport -----------------------------------
    def transport(q_ext, q_c):
        qy, qx = faces(q_ext)
        div_q = _divergence(fy_m * qy, fx_m * qx, g.area[:, None])
        return (q_c * delp - dt * div_q) / delp_new

    pt_new = transport(pt_e, pt)
    tracers_new = {k: transport(tr_e[k], tracers[k]) for k in tracers}
    wind_adv = jnp.stack(
        [transport(wind_e[c], wind[c]) for c in range(3)]
    )
    if not cfg.hydrostatic:
        # w is mass-weighted (rho*w momentum conserving); delz is advected
        # in flux form with the VOLUME flux, so horizontal convergence
        # compresses the layer — that compression is what the equation of
        # state turns into nonhydrostatic pressure
        w_adv = transport(w_e, state.w)
        dzy, dzx = faces(delz_e)
        delz_adv = state.delz - dt * _divergence(
            vn_y * ly * dzy, vn_x * lx * dzx, g.area[:, None]
        )

    # ---- pressure-gradient force on the NEW mass field ------------------
    pe = jnp.concatenate(
        [
            jnp.full_like(delp_new[:, :1], cfg.ptop),
            cfg.ptop + zscan.cumsum(delp_new, axis=1),
        ],
        axis=1,
    )
    lnpe = jnp.log(pe)
    dlnp = lnpe[:, 1:] - lnpe[:, :-1]
    pmid = delp_new / dlnp
    if cfg.hydrostatic:
        tv = pt_new * (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
        # geopotential: integrate hydrostatically from the surface upward
        dphi = RDGAS * tv * dlnp  # interface-to-interface increment
        phi_below = zscan.suffix_sum_strict(dphi, axis=1) + state.phis[:, None]
        phi_mid = phi_below + RDGAS * tv * (lnpe[:, 1:] - jnp.log(pmid))
        p_for_pgf = pmid
    else:
        # full-pressure PGF: -(1/rho) grad_z p = -grad_s phi - R Tv_full
        # grad_s ln(p_full) along the Lagrangian layers, with phi from the
        # ACTUAL geometric thicknesses and p_full from the equation of
        # state (Lin's finite-volume PGF uses the same ingredients)
        from fv3net_tpu.dycore import nonhydro

        p_full = nonhydro.full_pressure(delp_new, pt_new, delz_adv)
        dphi = GRAVITY * delz_adv
        phi_below = zscan.suffix_sum_strict(dphi, axis=1) + state.phis[:, None]
        # midpoint at the hydrostatic log-pressure fraction (NOT 0.5):
        # the PGF pairs grad(phi_mid) with grad(ln pmid_full), so the two
        # must be evaluated at the same sub-layer position or a resting
        # atmosphere over terrain self-accelerates (O(dlnp^2) imbalance)
        f_mid = (lnpe[:, 1:] - jnp.log(pmid)) / dlnp
        phi_mid = phi_below + dphi * f_mid
        tv = p_full * GRAVITY * delz_adv / (delp_new * RDGAS)  # p/(rho R)
        p_for_pgf = p_full

    # ---- one batched halo for every PGF/damping stencil input -----------
    # (separate per-field exchanges measured 1.35x slower; see the
    # transport halo note above)
    halo_fields = [phi_mid, jnp.log(p_for_pgf)]
    div_damp_on = (
        cfg.divergence_damp_coef > 0.0
        or cfg.d2_bg_k1 > 0.0
        or cfg.d2_bg_k2 > 0.0
    )
    if div_damp_on:
        div = _divergence(
            vn_y * g.edge_len_y[:, None], vn_x * g.edge_len_x[:, None],
            g.area[:, None],
        )
        i_div = len(halo_fields)
        halo_fields.append(div)
    if cfg.diff_coef > 0.0:
        # damp VIRTUAL TEMPERATURE, not theta_v: theta varies along
        # terrain-following layers even in a balanced isothermal rest
        # state, so del-2 of theta over topography manufactures
        # circulation (mountain-rest test: 2.4 m/s/day spurious winds);
        # del-2 of Tv is balance-neutral there and equally dissipative.
        # The hydrostatic-convention Tv (the state's theta definition) is
        # used in both modes, keeping the inverse conversion exact.
        tv_damp = pt_new * (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
        i_tv = len(halo_fields)
        halo_fields.append(tv_damp)
    ext2 = _ext(jnp.stack(halo_fields, axis=1))

    grad_phi = _lsq_gradient(ext2[:, 0], g)
    grad_lnp = _lsq_gradient(ext2[:, 1], g)
    pgf = -grad_phi - RDGAS * tv[None] * grad_lnp

    # ---- Coriolis -------------------------------------------------------
    kh = g.khat[:, :, None]
    cor = -g.f_coriolis[None, :, None] * jnp.cross(kh, wind_adv, axis=0)

    wind_new = wind_adv + dt * (pgf + cor)

    # ---- divergence damping ---------------------------------------------
    if div_damp_on:
        # per-level coefficient: base everywhere, boosted in the top two
        # sponge layers (fv3gfs-fortran d2_bg_k1/d2_bg_k2 — the standard
        # remedy for vertically-propagating waves breaking against the
        # rigid model top)
        nz = delp.shape[1]
        coef = jnp.full((nz,), cfg.divergence_damp_coef, delp.dtype)
        if cfg.d2_bg_k1 > 0.0:
            coef = coef.at[0].set(
                max(cfg.d2_bg_k1, cfg.divergence_damp_coef)
            )
        if cfg.d2_bg_k2 > 0.0 and nz > 1:
            coef = coef.at[1].set(
                max(cfg.d2_bg_k2, cfg.divergence_damp_coef)
            )
        # gradient is [3, 6, nz, ny, nx]
        nu_d = coef[None, None, :, None, None] * g.area.mean() / dt
        wind_new = wind_new + dt * nu_d * _lsq_gradient(ext2[:, i_div], g)

    # ---- del-2 damping --------------------------------------------------
    if cfg.diff_coef > 0.0:
        dx2 = g.area.mean()  # ~ dx^2
        # sponge boost in the top two layers (d2_bg_k1/k2): breaking
        # mountain waves are rotational as well as divergent, so the
        # top sponge must damp the full wind, not just its divergence
        nzv = delp.shape[1]
        dcoef = jnp.full((nzv,), cfg.diff_coef, delp.dtype)
        if cfg.d2_bg_k1 > 0.0:
            dcoef = dcoef.at[0].set(max(cfg.d2_bg_k1, cfg.diff_coef))
        if cfg.d2_bg_k2 > 0.0 and nzv > 1:
            dcoef = dcoef.at[1].set(max(cfg.d2_bg_k2, cfg.diff_coef))
        nu = dcoef[None, :, None, None] * dx2 / dt  # [1, nz, 1, 1]
        wind_new = wind_new + dt * jnp.stack(
            [_del2(wind_e1[c], g, nu) for c in range(3)]
        )
        dtv = _del2(ext2[:, i_tv], g, nu)
        pt_new = pt_new + dt * dtv * (
            REFERENCE_SURFACE_PRESSURE / pmid
        ) ** KAPPA

    wind_new = _project_tangent(wind_new, g.khat)

    # ---- vertical acoustic step (nonhydrostatic only) -------------------
    w_new = delz_new = None
    if not cfg.hydrostatic:
        from fv3net_tpu.dycore import nonhydro

        if cfg.diff_coef > 0.0:
            w_e1 = w_e[..., h - 1 : w_e.shape[-2] - (h - 1),
                       h - 1 : w_e.shape[-1] - (h - 1)]
            w_adv = w_adv + dt * _del2(w_e1, g, nu)
        # material lower BC over terrain: w at the ground follows the
        # surface-parallel flow, w_s = u · grad(z_s)
        grad_zs = (
            _lsq_gradient(_ext(state.phis[:, None]), g)[:, :, 0] / GRAVITY
        )  # [3, 6, ny, nx]
        w_surf = (wind_new[:, :, -1] * grad_zs).sum(axis=0)
        w_new, delz_new = nonhydro.vertical_solver(
            w_adv, delz_adv, delp_new, pt_new, dt, cfg.ptop, w_surf=w_surf
        )

    return DycoreState(
        delp=delp_new,
        pt=pt_new,
        wind=wind_new,
        tracers=tracers_new,
        phis=state.phis,
        w=w_new,
        delz=delz_new,
    )


def _column_te(pe, tv, ke, phis):
    """Total energy per unit mass on layers (z-last): cp Tv + phi_mid + K,
    with phi integrated hydrostatically up from ``phis``."""
    lnpe = jnp.log(pe)
    dlnp = lnpe[..., 1:] - lnpe[..., :-1]
    pmid = (pe[..., 1:] - pe[..., :-1]) / dlnp
    dphi = RDGAS * tv * dlnp
    phi_below = zscan.suffix_sum_strict(dphi, axis=-1) + phis[..., None]
    # same midpoint convention as the recovery sweep (exact round-trip
    # when the target coordinate equals the source)
    phi_mid = phi_below + 0.5 * RDGAS * tv * dlnp
    return CP_AIR * tv + phi_mid + ke, pmid


def _remap_total_energy(state, pe1, pe2, wind2, cfg, zlast, search=None,
                        delz2=None):
    """FV3's energy-conserving temperature remap (fv_mapz.F90 te_map):
    remap column total energy conservatively, then recover Tv on the new
    layers.  Hydrostatic: phi from R Tv dlnp and the implicit upward
    sweep Tv_k = (te_k - K_k - phi_below_k) / (cp + R/2 dlnp_k).
    Nonhydrostatic (``delz2`` given): phi is GEOMETRIC (g dz), so the
    recovery is direct, Tv = (te - K - phi_mid) / cp — using the
    hydrostatic phi there would conserve the wrong energy.
    Returns theta_v on the target layers (z-last)."""
    delp1 = zlast(state.delp)
    lnpe1 = jnp.log(pe1)
    dlnp1 = lnpe1[..., 1:] - lnpe1[..., :-1]
    pmid1 = delp1 / dlnp1
    tv1 = zlast(state.pt) * (pmid1 / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    ke1 = 0.5 * sum(zlast(state.wind[c]) ** 2 for c in range(3))
    if state.w is not None:
        ke1 = ke1 + 0.5 * zlast(state.w) ** 2
    nonhydro = state.delz is not None
    if nonhydro:
        dz1 = zlast(state.delz)
        dphi1 = GRAVITY * dz1
        phi_below1 = zscan.suffix_sum_strict(dphi1, axis=-1) + state.phis[..., None]
        # same hydrostatic-fraction midpoint as the NH PGF (see _substep)
        f1 = (lnpe1[..., 1:] - jnp.log(pmid1)) / dlnp1
        te1 = CP_AIR * tv1 + phi_below1 + dphi1 * f1 + ke1
    else:
        te1, _ = _column_te(pe1, tv1, ke1, state.phis)
    from fv3net_tpu.ops import remap as _rm

    if search is not None:
        te2 = _rm.remap_apply(search, te1, iv=1, kord=cfg.kord)
    else:
        te2 = _rm.remap_ppm(pe1, te1, pe2, iv=1, kord=cfg.kord, window=2)

    lnpe2 = jnp.log(pe2)
    dlnp2 = lnpe2[..., 1:] - lnpe2[..., :-1]
    pmid2 = (pe2[..., 1:] - pe2[..., :-1]) / dlnp2
    ke2 = 0.5 * sum(w ** 2 for w in wind2)

    if nonhydro:
        dphi2 = GRAVITY * delz2
        phi_below2 = zscan.suffix_sum_strict(dphi2, axis=-1) + state.phis[..., None]
        f2 = (lnpe2[..., 1:] - jnp.log(pmid2)) / dlnp2
        tv2 = (te2 - ke2 - phi_below2 - dphi2 * f2) / CP_AIR
        return tv2 / (pmid2 / REFERENCE_SURFACE_PRESSURE) ** KAPPA

    # upward sweep: z index 0 = top, so reverse=True starts at the
    # surface layer (phis) and carries phi upward
    def up(phi_below, inp):
        te_k, ke_k, dlnp_k = inp
        tv_k = (te_k - ke_k - phi_below) / (CP_AIR + 0.5 * RDGAS * dlnp_k)
        return phi_below + RDGAS * tv_k * dlnp_k, tv_k

    inps = (
        jnp.moveaxis(te2, -1, 0),
        jnp.moveaxis(ke2, -1, 0),
        jnp.moveaxis(dlnp2, -1, 0),
    )
    _, tv2_scan = jax.lax.scan(up, state.phis, inps, reverse=True)
    tv2 = jnp.moveaxis(tv2_scan, 0, -1)
    return tv2 / (pmid2 / REFERENCE_SURFACE_PRESSURE) ** KAPPA


def _rm_specific_volume(state, pe1, pe2, cfg, zlast, search=None):
    """Remap dz/dpi (z-last) from pe1 to pe2 layers conservatively."""
    from fv3net_tpu.ops import remap as _rm

    dp1 = pe1[..., 1:] - pe1[..., :-1]
    sv1 = zlast(state.delz) / dp1
    if search is not None:
        return _rm.remap_apply(search, sv1, iv=1, kord=cfg.kord)
    return _rm.remap_ppm(pe1, sv1, pe2, iv=1, kord=cfg.kord, window=2)


def _remap_to_hybrid(state: DycoreState, ak, bk, cfg: DycoreConfig):
    """PPM-remap the Lagrangian layers back to the hybrid coordinate."""
    ps = state.delp.sum(axis=1) + cfg.ptop
    # z-last views for the column remap
    def zlast(x):
        return jnp.moveaxis(x, 1, -1)

    pe1 = jnp.concatenate(
        [
            jnp.full_like(zlast(state.delp)[..., :1], cfg.ptop),
            cfg.ptop + zscan.cumsum(zlast(state.delp), axis=-1),
        ],
        axis=-1,
    )
    pe2 = ak + bk * ps[..., None]
    # ONE banded layer search feeds every remapped field (the search
    # depends only on the edge sets; Lagrangian edges drift a tiny
    # fraction of a layer per interval, so window=2 suffices)
    from fv3net_tpu.ops import remap as _rm

    search = _rm.banded_search(pe1, pe2, window=2)
    # w remaps with the same iv=-1 profile as the winds, so batch it into
    # the same reconstruction when present.  (ops/remap.py also supports
    # the FV3 iv=-2 w-variant with a prescribed surface value; this
    # A-grid redesign keeps w batched with the winds — the batched
    # exchange is the measured TPU win and the dycore's lower boundary
    # is rigid, where the variants agree to reconstruction order.)
    components = tuple(zlast(state.wind[c]) for c in range(3))
    if state.w is not None:
        components = components + (zlast(state.w),)
    pt2, comp2, tracers2 = vertical.remap_column_fields(
        pe1,
        pe2,
        # remap_te recomputes theta from the energy remap, so the plain
        # theta remap would be discarded — skip it then
        None if cfg.remap_te else zlast(state.pt),
        components,
        {k: zlast(v) for k, v in state.tracers.items()},
        kord=cfg.kord,
        search=search,
    )
    wind2 = comp2[:3]

    dz2_zlast = None
    if state.w is not None:
        # delz remaps as mass-weighted specific volume (dz per unit dpi):
        # conserving its mass integral conserves the total column height
        sv2 = _rm_specific_volume(state, pe1, pe2, cfg, zlast, search=search)
        dz2_zlast = sv2 * (pe2[..., 1:] - pe2[..., :-1])

    if cfg.remap_te:
        # comp2 includes the remapped w when nonhydrostatic, so the
        # target-layer kinetic energy picks up 0.5 w^2 automatically
        pt2 = _remap_total_energy(state, pe1, pe2, comp2, cfg, zlast,
                                  search=search, delz2=dz2_zlast)

    def zmid(x):
        return jnp.moveaxis(x, -1, 1)

    w2 = delz2 = None
    if state.w is not None:
        w2 = zmid(comp2[3])
        delz2 = zmid(dz2_zlast)

    return DycoreState(
        delp=zmid(pe2[..., 1:] - pe2[..., :-1]),
        pt=zmid(pt2),
        wind=jnp.stack([zmid(w) for w in wind2]),
        # floor: flux-form transport of q with independently-limited delp
        # and q faces can leave O(1e-5) negative tracer transients in f32;
        # clamp here (the mass error is far below the f32 conservation
        # noise floor) — the reference relies on Fortran fillz similarly
        tracers={
            k: jnp.maximum(zmid(v), 0.0) for k, v in tracers2.items()
        },
        phis=state.phis,
        w=w2,
        delz=delz2,
    )


def _rayleigh_damp(state: DycoreState, cfg: DycoreConfig, dt: float):
    """Upper-level Rayleigh sponge (fv3gfs-fortran Rayleigh_Super,
    applied through ``wrapper.step_dynamics()``): implicit wind damping
    above ``rf_cutoff`` with rate (dt/tau) sin^2(pi/2 * ln(rf_cutoff/p)
    / ln(rf_cutoff/ptop)), i.e. zero at the cutoff rising smoothly to
    1/tau at the model top.  The removed kinetic energy is deposited as
    heat (the Fortran ``conserve`` branch) via the Exner function;
    theta_v absorbs it directly (the O(0.61 q) virtual correction is
    negligible at sponge altitudes, where q ~ ppm).
    """
    if cfg.rf_cutoff <= cfg.ptop:
        raise ValueError(
            f"Rayleigh sponge needs rf_cutoff > ptop (the sin^2 ramp "
            f"spans ptop..rf_cutoff); got rf_cutoff={cfg.rf_cutoff} Pa "
            f"<= ptop={cfg.ptop} Pa — raise rf_cutoff or disable tau"
        )
    pe_below = cfg.ptop + zscan.cumsum(state.delp, axis=1)
    pmid = pe_below - 0.5 * state.delp  # [6, nz, ny, nx]
    # NOTE: float() keeps the np scalar weak-typed — a bare np.float64
    # here upcasts the whole sponge (and everything downstream) to f64
    # under jax_enable_x64
    arg = jnp.clip(
        jnp.log(cfg.rf_cutoff / jnp.maximum(pmid, 1e-3))
        / float(np.log(cfg.rf_cutoff / cfg.ptop)),
        0.0,
        1.0,
    )
    rf = (dt / (cfg.tau_rayleigh * 86400.0)) * jnp.sin(
        0.5 * jnp.pi * arg
    ) ** 2
    fac = 1.0 / (1.0 + rf)
    wind = state.wind * fac[None]
    dke = 0.5 * (1.0 - fac ** 2) * (state.wind ** 2).sum(axis=0)
    w = state.w
    if w is not None:
        dke = dke + 0.5 * (1.0 - fac ** 2) * w ** 2
        w = w * fac
    exner = (pmid / REFERENCE_SURFACE_PRESSURE) ** KAPPA
    pt = state.pt + dke / (CP_AIR * exner)
    return dataclasses.replace(state, wind=wind, pt=pt, w=w)


def validate_acoustic_cfl(g: GridArrays, cfg: DycoreConfig) -> None:
    """Nonhydrostatic runs carry horizontal sound waves explicitly, so the
    substep must satisfy c_s * dt_sub <= ~0.75 dx_min (the vertical
    direction is implicit; see dycore/nonhydro.py).  Raises ValueError
    with the smallest stable ``n_split`` — kinder than the NaNs FV3 also
    produces when the namelist's acoustic substepping is too coarse.
    """
    if cfg.hydrostatic:
        return
    c_s = 350.0  # sound speed bound, m/s
    dx_min = float(jnp.minimum(g.dist_x.min(), g.dist_y.min()))
    dt_sub = cfg.dt / cfg.n_split
    if c_s * dt_sub > 0.75 * dx_min:
        need = int(np.ceil(c_s * cfg.dt / (0.75 * dx_min)))
        raise ValueError(
            f"nonhydrostatic acoustic CFL violated: c_s*dt/n_split = "
            f"{c_s * dt_sub:.0f} m > 0.75*dx_min = {0.75 * dx_min:.0f} m; "
            f"use n_split >= {need} (got {cfg.n_split})"
        )


@partial(jax.jit, static_argnames=("cfg",))
def dynamics_step(
    state: DycoreState, g: GridArrays, ak: jnp.ndarray, bk: jnp.ndarray,
    cfg: DycoreConfig,
) -> DycoreState:
    """One full dynamics interval: n_split Lagrangian substeps + vertical
    remap (the ``wrapper.step_dynamics()`` equivalent)."""
    dt_sub = cfg.dt / cfg.n_split

    def body(_, s):
        return _substep(s, g, cfg, dt_sub)

    # FV3NET_DYCORE_UNROLL=1 python-unrolls the substep loop (measured
    # 9 ms/chunk SLOWER at C48 — CLAUDE.md — but re-testable per grid;
    # the loop-form's dynamic-update-slice carries may scale differently)
    import os as _os

    if _os.environ.get("FV3NET_DYCORE_UNROLL", "0") == "1":
        for _ in range(cfg.n_split):
            state = body(0, state)
    else:
        state = jax.lax.fori_loop(0, cfg.n_split, body, state)
    if cfg.tau_rayleigh > 0.0:
        state = _rayleigh_damp(state, cfg, cfg.dt)
    if cfg.remap:
        state = _remap_to_hybrid(state, ak, bk, cfg)
    return state
