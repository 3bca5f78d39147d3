"""Independent NumPy reference implementation of the MAC-grid algorithms used by
the golden-trajectory parity tests (VERDICT r1 missing #6; BASELINE.md L2
metric). Written from the discretization definitions — NOT from phiflow_tpu
code — so it is an independent oracle:

  * staggered (MAC) layout with const-0 walls: component d stores the N−1
    interior faces along its own axis (wall faces are identically 0)
  * semi-Lagrangian advection: explicit Euler backtrace + multilinear
    interpolation with boundary-condition ghost values
  * divergence: conservative forward differences over cell faces
  * pressure projection: 5-point Neumann Poisson system solved densely
    (mean-zero gauge), velocity minus face pressure gradient

Grids are 2D, square, cell size h = L/N, cell centers at (i+1/2)h, x-faces of
component x at i·h (i = 1..N−1 interior).
"""
import numpy as np


# ---------------------------------------------------------------------------
# interpolation with ghost handling
# ---------------------------------------------------------------------------

def interp_bilinear(arr, px, py, ghost):
    """Bilinear interpolation of arr at fractional index positions (px, py).
    ghost: 'periodic' | 'zero' (value 0 outside) | 'edge' (zero-gradient)."""
    nx, ny = arr.shape
    if ghost == 'periodic':
        x0 = np.floor(px).astype(int)
        y0 = np.floor(py).astype(int)
        fx, fy = px - x0, py - y0
        out = 0.0
        for bx in (0, 1):
            for by in (0, 1):
                w = (fx if bx else 1 - fx) * (fy if by else 1 - fy)
                out = out + w * arr[(x0 + bx) % nx, (y0 + by) % ny]
        return out
    # pad with one ghost layer
    if ghost == 'zero':
        p = np.pad(arr, 1, mode='constant')
    elif ghost == 'edge':
        p = np.pad(arr, 1, mode='edge')
    else:
        raise ValueError(ghost)
    px = np.clip(px, -1.0, nx + 0.0)
    py = np.clip(py, -1.0, ny + 0.0)
    x0 = np.floor(px).astype(int)
    y0 = np.floor(py).astype(int)
    fx, fy = px - x0, py - y0
    out = 0.0
    for bx in (0, 1):
        for by in (0, 1):
            w = (fx if bx else 1 - fx) * (fy if by else 1 - fy)
            out = out + w * p[np.clip(x0 + bx + 1, 0, nx + 1), np.clip(y0 + by + 1, 0, ny + 1)]
    return out


# ---------------------------------------------------------------------------
# periodic Burgers (centered vector grid)
# ---------------------------------------------------------------------------

def burgers_step(vx, vy, dt, nu, h):
    """One Burgers step: semi-Lagrangian self-advection (Euler backtrace,
    bilinear periodic lookup) + explicit 5-point diffusion."""
    n = vx.shape[0]
    ix, iy = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
    # backtrace in index units (cell centers; dx = h)
    px = ix - dt * vx / h
    py = iy - dt * vy / h
    ax = interp_bilinear(vx, px, py, 'periodic')
    ay = interp_bilinear(vy, px, py, 'periodic')

    def lap(a):
        return (np.roll(a, 1, 0) + np.roll(a, -1, 0) + np.roll(a, 1, 1) + np.roll(a, -1, 1) - 4 * a) / h ** 2
    return ax + dt * nu * lap(ax), ay + dt * nu * lap(ay)


# ---------------------------------------------------------------------------
# closed-box MAC operations (const-0 velocity walls)
# ---------------------------------------------------------------------------

def mac_divergence(ux, uy, n, h):
    """Cell divergence from interior-face arrays ux (n−1, n), uy (n, n−1);
    wall faces contribute 0 flux."""
    fx = np.zeros((n + 1, n))
    fx[1:n, :] = ux
    fy = np.zeros((n, n + 1))
    fy[:, 1:n] = uy
    return (fx[1:, :] - fx[:-1, :]) / h + (fy[:, 1:] - fy[:, :-1]) / h


def neumann_poisson_solve(rhs, h):
    """Dense solve of the singular 5-point Neumann Poisson system
    Δp = rhs (zero-flux walls), zero-mean gauge."""
    n = rhs.shape[0]
    N = n * n
    A = np.zeros((N, N))

    def idx(i, j):
        return i * n + j
    for i in range(n):
        for j in range(n):
            k = idx(i, j)
            for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                ii, jj = i + di, j + dj
                if 0 <= ii < n and 0 <= jj < n:
                    A[k, idx(ii, jj)] += 1.0 / h ** 2
                    A[k, k] -= 1.0 / h ** 2
    b = (rhs - rhs.mean()).reshape(-1)
    p, *_ = np.linalg.lstsq(A, b, rcond=None)
    p = p.reshape(n, n)
    return p - p.mean()

def mac_project(ux, uy, n, h):
    """Make the interior-face field divergence-free: solve Neumann Poisson for
    the cell pressure, subtract its face gradient."""
    div = mac_divergence(ux, uy, n, h)
    p = neumann_poisson_solve(div, h)
    gx = (p[1:, :] - p[:-1, :]) / h       # at interior x-faces
    gy = (p[:, 1:] - p[:, :-1]) / h
    return ux - gx, uy - gy, p


def advect_staggered_semi_lagrangian(ux, uy, dt, n, h):
    """Semi-Lagrangian advection of the staggered field by itself
    (Euler backtrace at each face point, bilinear lookup with 0-ghosts)."""
    # full face arrays (wall faces = 0) for interpolation in face-index space
    fx = np.zeros((n + 1, n))
    fx[1:n, :] = ux
    fy = np.zeros((n, n + 1))
    fy[:, 1:n] = uy

    # --- x-component faces: positions (i·h, (j+1/2)h), i = 1..n−1 ---
    i, j = np.meshgrid(np.arange(1, n), np.arange(n), indexing='ij')
    vx_here = ux
    vy_here = 0.25 * (fy[0:n - 1, 0:n] + fy[0:n - 1, 1:n + 1] + fy[1:n, 0:n] + fy[1:n, 1:n + 1])
    # backtraced position in x-face index space: fx index (a, b) is at (a·h, (b+1/2)h)
    px = i - dt * vx_here / h
    py = j - dt * vy_here / h
    ux_new = interp_bilinear(fx, px, py, 'zero')

    # --- y-component faces: positions ((i+1/2)h, j·h), j = 1..n−1 ---
    i, j = np.meshgrid(np.arange(n), np.arange(1, n), indexing='ij')
    vy_here = uy
    vx_here = 0.25 * (fx[0:n, 0:n - 1] + fx[0:n, 1:n] + fx[1:n + 1, 0:n - 1] + fx[1:n + 1, 1:n])
    px = i - dt * vx_here / h
    py = j - dt * vy_here / h
    uy_new = interp_bilinear(fy, px, py, 'zero')
    return ux_new, uy_new


def smoke_step(smoke, ux, uy, dt, buoyancy, n, h):
    """One buoyant-smoke step: semi-Lagrangian smoke advection (zero-gradient
    ghosts), buoyancy source on y-faces, semi-Lagrangian velocity
    self-advection, pressure projection."""
    # advect smoke at cell centers (positions (i+1/2, j+1/2)·h)
    fx = np.zeros((n + 1, n))
    fx[1:n, :] = ux
    fy = np.zeros((n, n + 1))
    fy[:, 1:n] = uy
    vcx = 0.5 * (fx[:-1, :] + fx[1:, :])   # center velocity
    vcy = 0.5 * (fy[:, :-1] + fy[:, 1:])
    ic, jc = np.meshgrid(np.arange(n), np.arange(n), indexing='ij')
    px = ic - dt * vcx / h
    py = jc - dt * vcy / h
    smoke_new = interp_bilinear(smoke, px, py, 'edge')
    # buoyancy at interior y-faces: average of adjacent cell smoke
    buoy_y = buoyancy * 0.5 * (smoke_new[:, :-1] + smoke_new[:, 1:])
    ux_adv, uy_adv = advect_staggered_semi_lagrangian(ux, uy, dt, n, h)
    uy_adv = uy_adv + dt * buoy_y
    ux_p, uy_p, p = mac_project(ux_adv, uy_adv, n, h)
    return smoke_new, ux_p, uy_p, p


# ---------------------------------------------------------------------------
# obstacle-masked projection (closed box + sphere obstacle)
# ---------------------------------------------------------------------------

def sphere_masked_project(ux, uy, n, h, cx, cy, R, vx_o=0.0, vy_o=0.0, omega=0.0):
    """Pressure projection with a sphere obstacle, mirroring the reference
    pipeline (phi/physics/fluid.py:94-162): hard accessible-cell mask, binary
    staggered face masks (min of adjacent cells), soft velocity blending at the
    obstacle boundary, identity rows on blocked cells, dense masked Poisson
    solve (zero-mean gauge).

    (vx_o, vy_o) is the obstacle's linear velocity and omega its angular
    velocity; faces inside the obstacle blend toward
    v_obs + ω×(r−c) = (vx_o − ω·(y−cy), vy_o + ω·(x−cx))
    (reference: apply_boundary_conditions, phi/physics/fluid.py:212-241)."""
    # cell centers
    xs = (np.arange(n) + 0.5) * h
    cc_x, cc_y = np.meshgrid(xs, xs, indexing='ij')
    dist_cell = np.sqrt((cc_x - cx) ** 2 + (cc_y - cy) ** 2)
    accessible = (dist_cell >= R).astype(np.float64)  # hard lies_inside complement

    # soft obstacle fraction at faces (balance=1, cell bounding radius h·√2/2)
    r_cell = h * np.sqrt(2) / 2

    def soft_frac(px, py):
        sgn = np.sqrt((px - cx) ** 2 + (py - cy) ** 2) - R
        return np.clip(1.0 - sgn / r_cell, 0.0, 1.0)

    fx_x, fx_y = np.meshgrid(np.arange(1, n) * h, xs, indexing='ij')   # interior x-faces
    fy_x, fy_y = np.meshgrid(xs, np.arange(1, n) * h, indexing='ij')   # interior y-faces
    frac_x = soft_frac(fx_x, fx_y)
    frac_y = soft_frac(fy_x, fy_y)
    obs_ux = vx_o - omega * (fx_y - cy)   # obstacle velocity at x-faces
    obs_uy = vy_o + omega * (fy_x - cx)   # obstacle velocity at y-faces
    ux_m = ux * (1.0 - frac_x) + frac_x * obs_ux
    uy_m = uy * (1.0 - frac_y) + frac_y * obs_uy

    # binary face masks: both adjacent cells accessible
    mask_fx = np.minimum(accessible[:-1, :], accessible[1:, :])
    mask_fy = np.minimum(accessible[:, :-1], accessible[:, 1:])

    div = mac_divergence(ux_m, uy_m, n, h)
    div = div * accessible
    div = div - accessible * (div.sum() / accessible.sum())

    # dense masked Poisson: identity rows on blocked cells
    N = n * n
    A = np.zeros((N, N))

    def idx(i, j):
        return i * n + j
    for i in range(n):
        for j in range(n):
            k = idx(i, j)
            if accessible[i, j] == 0:
                A[k, k] = 1.0
                continue
            # x-neighbors through interior faces
            if i > 0 and mask_fx[i - 1, j]:
                A[k, idx(i - 1, j)] += 1 / h ** 2
                A[k, k] -= 1 / h ** 2
            if i < n - 1 and mask_fx[i, j]:
                A[k, idx(i + 1, j)] += 1 / h ** 2
                A[k, k] -= 1 / h ** 2
            if j > 0 and mask_fy[i, j - 1]:
                A[k, idx(i, j - 1)] += 1 / h ** 2
                A[k, k] -= 1 / h ** 2
            if j < n - 1 and mask_fy[i, j]:
                A[k, idx(i, j + 1)] += 1 / h ** 2
                A[k, k] -= 1 / h ** 2
    b = (div - div.mean()).reshape(-1)
    p, *_ = np.linalg.lstsq(A, b, rcond=None)
    p = p.reshape(n, n)
    p = p - p.mean()
    gx = (p[1:, :] - p[:-1, :]) / h * mask_fx
    gy = (p[:, 1:] - p[:, :-1]) / h * mask_fy
    return ux_m - gx, uy_m - gy, p


# ---------------------------------------------------------------------------
# 3D closed-box projection
# ---------------------------------------------------------------------------

def mac_divergence_3d(ux, uy, uz, n, h):
    fx = np.zeros((n + 1, n, n)); fx[1:n] = ux
    fy = np.zeros((n, n + 1, n)); fy[:, 1:n] = uy
    fz = np.zeros((n, n, n + 1)); fz[:, :, 1:n] = uz
    return ((fx[1:] - fx[:-1]) + (fy[:, 1:] - fy[:, :-1]) + (fz[:, :, 1:] - fz[:, :, :-1])) / h


def mac_project_3d(ux, uy, uz, n, h):
    """3D Neumann Poisson projection (dense lstsq; n small)."""
    div = mac_divergence_3d(ux, uy, uz, n, h)
    N = n ** 3
    A = np.zeros((N, N))
    idx = lambda i, j, k: (i * n + j) * n + k
    for i in range(n):
        for j in range(n):
            for k in range(n):
                r = idx(i, j, k)
                for di, dj, dk in ((1, 0, 0), (-1, 0, 0), (0, 1, 0), (0, -1, 0), (0, 0, 1), (0, 0, -1)):
                    ii, jj, kk = i + di, j + dj, k + dk
                    if 0 <= ii < n and 0 <= jj < n and 0 <= kk < n:
                        A[r, idx(ii, jj, kk)] += 1 / h ** 2
                        A[r, r] -= 1 / h ** 2
    b = (div - div.mean()).reshape(-1)
    p, *_ = np.linalg.lstsq(A, b, rcond=None)
    p = p.reshape(n, n, n)
    p -= p.mean()
    gx = (p[1:] - p[:-1]) / h
    gy = (p[:, 1:] - p[:, :-1]) / h
    gz = (p[:, :, 1:] - p[:, :, :-1]) / h
    return ux - gx, uy - gy, uz - gz, p
