"""On-chip tier parity sweep -> VERIFY_TPU_r{N}.md (run on the real chip).

Two sections:
1. fused-kernel SMOKE — construct AND call every fused Pallas kernel for
   every nv regime that selects a different route (nv=4 below
   SO_DENSE_MIN_NV, 7, 12, 17 composed-FDSVA, 28 SO_MAX edge). This is the
   regression gate the CPU-forced suite cannot provide (tests/conftest.py
   pins JAX_PLATFORMS=cpu, so `jax.default_backend()=="tpu"` dispatch
   branches are unreachable there) — the r4 fdsva_so_pallas capture bug
   shipped through exactly this blind spot (VERDICT.md r4 weak #1). Run
   this before end-of-round on ANY kernel-touching change.
2. sweep-kernel tier parity — every fused sweep kernel vs its XLA scan
   reference (rollouts, Riccati variants, in-kernel line-search cost).
"""
import numpy as np, jax, jax.numpy as jnp, json

from gridcodegenerator_tpu.models.model import build_model
from gridcodegenerator_tpu.models.zoo import load_robot
from gridcodegenerator_tpu.ops.aba import aba
from gridcodegenerator_tpu.ops.spatial import bmv, bmm
from gridcodegenerator_tpu.ops.linalg import gj_inverse
from gridcodegenerator_tpu.ops.pallas import sweeps as _ps

def rel(a, b):
    import jax.numpy as _j
    return float(_j.max(_j.abs(a - b) / (_j.abs(b) + 1.0)))


# ---------------------------------------------------------------------------
# Section 1: fused-kernel constructor+call smoke, one row per (robot, kernel)
# ---------------------------------------------------------------------------
def fused_kernel_smoke():
    from gridcodegenerator_tpu.ops.pallas import kernels as _pk
    from gridcodegenerator_tpu.ops import eepose as _ee

    GRAV = -9.81
    # nv regimes that select different routes: below SO_DENSE_MIN_NV (4),
    # arm (7), quadruped (12), composed-FDSVA humanoid (17 > MONO_MAX=16),
    # SO_MAX edge (28)
    robots = ("pendulum4", "iiwa", "hyq", "gym_humanoid", "atlas")
    rows = []
    rng = np.random.default_rng(0)
    for name in robots:
        model = build_model(load_robot(name), dtype=jnp.float32)
        n = model.n
        # 1024 lanes exercises the 2-D (8,128) batch-tile path where the
        # robot qualifies (kernels._batch2d); others smoke at the flat tile
        bb = 1024 if _pk._batch2d(model) else _pk.default_block_b(model)
        sbb = _pk.so_block_b(model)
        mk3 = lambda B: tuple(
            jnp.asarray(rng.uniform(-1, 1, (n, B)), jnp.float32)
            for _ in range(3))
        ne = _ee.num_ees(model, None)
        builders = {
            "rnea": (lambda: _pk.rnea_pallas(model, GRAV), 3, bb),
            "rnea_noqdd": (lambda: _pk.rnea_pallas(
                model, GRAV, with_qdd=False), 2, bb),
            "minv": (lambda: _pk.minv_pallas(model), 1, bb),
            "crba": (lambda: _pk.crba_pallas(model), 1, bb),
            "fd": (lambda: _pk.fd_pallas(model, GRAV), 3, bb),
            "aba": (lambda: _pk.aba_pallas(model, GRAV), 3, bb),
            "id_du": (lambda: _pk.id_du_pallas(model, GRAV), 3, bb),
            "fd_du": (lambda: _pk.fd_du_pallas(model, GRAV), 3, bb),
            "fd_du_extras": (lambda: _pk.fd_du_pallas(
                model, GRAV, with_extras=True), 3, bb),
            "eepos": (lambda: _pk.eepos_pallas(model), 1, bb),
            "deepos": (lambda: _pk.deepos_pallas(model), 1, bb),
        }
        if _pk.so_fits(model):
            builders["idsva_so"] = (
                lambda: _pk.idsva_so_pallas(model, GRAV), 3, sbb)
            # exercise the chunked (grid>1) route too at humanoid scale
            builders["idsva_so_2blk"] = (
                lambda: _pk.idsva_so_pallas(model, GRAV), 3, 2 * sbb)
            builders["fdsva_so"] = (
                lambda: _pk.fdsva_so_pallas(model, GRAV), 3, sbb)
        if _pk.ee_hess_fits(model, ne):
            builders["d2eepos"] = (
                lambda: _pk.d2eepos_pallas(model), 1, sbb)
        for kname, (build, nin, B) in builders.items():
            try:
                fn = build()
                args = mk3(B)[:nin]
                val = jax.block_until_ready(fn(*args))
                leaves = jax.tree.leaves(val)
                finite = all(bool(jnp.isfinite(x).all()) for x in leaves)
                rows.append({"robot": name, "nv": model.num_vel,
                             "kernel": kname, "batch": B,
                             "ok": bool(finite),
                             **({} if finite else {"err": "non-finite"})})
            except Exception as e:  # noqa: BLE001
                rows.append({"robot": name, "nv": model.num_vel,
                             "kernel": kname, "batch": B, "ok": False,
                             "err": str(e)[:160]})
            print(json.dumps(rows[-1]), flush=True)
    return rows


smoke_rows = fused_kernel_smoke()
smoke_ok = all(r["ok"] for r in smoke_rows)

out = {}
N, B, DT, GRAV = 8, 256, 0.005, -9.81
f32 = jnp.float32
model = build_model(load_robot("iiwa14"), dtype=f32)  # vendor effort limits
n = model.n; nx = 2*n
eff = np.asarray(model.effort_limit, np.float32).reshape(-1, 1)
u_lo, u_hi = -eff, eff
rng = np.random.default_rng(0)
x0 = jnp.asarray(rng.uniform(-0.3, 0.3, (nx, B)), f32)
U = jnp.asarray(rng.uniform(-45, 45, (N, n, B)), f32)  # clamps the 40 Nm joints

# --- fused rollout vs XLA scan (array-valued effort clamp) ---------------
roll = _ps.rollout_pallas(model, N, DT, GRAV, u_lo, u_hi, block_b=256)
Xf = jax.block_until_ready(roll(x0, U))
def step(x, u):
    u = jnp.clip(u, u_lo, u_hi)
    q, qd = x[:n], x[n:]
    qdn = qd + DT * aba(model, q, qd, u, GRAV)
    xn = jnp.concatenate([q + DT*qdn, qdn], axis=0)
    return xn, xn
_, Xs = jax.jit(lambda x0_, U_: jax.lax.scan(step, x0_, U_))(x0, U)
out["rollout_clamped"] = float(jnp.max(jnp.abs(Xf - Xs)))

# --- fused line-search rollout vs scan (alpha widening + clamp) ----------
alphas = (1.0, 0.5, 0.1)
ks = jnp.asarray(0.5*rng.uniform(-1, 1, (N, n, B)), f32)
Ks = jnp.asarray(0.1*rng.uniform(-1, 1, (N, n, nx, B)), f32)
fb = _ps.linesearch_rollout_pallas(model, N, DT, GRAV, alphas, u_lo, u_hi, block_b=256)
Xw_f, Uw_f = jax.block_until_ready(fb(x0, U, Xs[:N], ks, Ks))
na = len(alphas)
def widen(z): return jnp.tile(z, (1,)*(z.ndim-1) + (na,))
alpha_w = jnp.repeat(jnp.asarray(alphas, f32), B)
def fstep(x, inp):
    xr, ur, k_t, K_t = inp
    u = jnp.clip(widen(ur) + alpha_w*widen(k_t) + bmv(widen(K_t), x - widen(xr)), u_lo, u_hi)
    q, qd = x[:n], x[n:]
    qdn = qd + DT * aba(model, q, qd, u, GRAV)
    xn = jnp.concatenate([q + DT*qdn, qdn], axis=0)
    return xn, (xn, u)
_, (Xw_s, Uw_s) = jax.jit(lambda: jax.lax.scan(fstep, widen(x0), (Xs[:N], U, ks, Ks)))()
out["linesearch_clamped_X_rel"] = rel(Xw_f, Xw_s)
out["linesearch_clamped_U_rel"] = rel(Uw_f, Uw_s)

# --- streamed riccati (stationary + nonstationary) vs scan ----------------
def scan_ric(reg, Amat, Bmat, lx, lu, lxx, luu, lux, Vx0, Vxx0):
    def body(carry, inp):
        Vx, Vxx = carry
        A, Bm, lx_t, lu_t, lxx_t, luu_t, lux_t = inp
        At = jnp.swapaxes(A, 0, 1); Bt = jnp.swapaxes(Bm, 0, 1)
        Qx = lx_t + bmv(At, Vx); Qu = lu_t + bmv(Bt, Vx)
        Qxx = lxx_t + bmm(bmm(At, Vxx), A)
        Qux = lux_t + bmm(bmm(Bt, Vxx), A)
        Quu = luu_t + bmm(bmm(Bt, Vxx), Bm)
        Qi = gj_inverse(Quu + reg*jnp.eye(n, dtype=Quu.dtype)[:, :, None])
        k_t = -bmv(Qi, Qu); K_t = -bmm(Qi, Qux)
        KtT = jnp.swapaxes(K_t, 0, 1); QuxT = jnp.swapaxes(Qux, 0, 1)
        Vx_n = Qx + bmv(KtT, bmv(Quu, k_t)) + bmv(KtT, Qu) + bmv(QuxT, k_t)
        Vxx_n = Qxx + bmm(KtT, bmm(Quu, K_t)) + bmm(KtT, Qux) + bmm(QuxT, K_t)
        Vxx_n = 0.5*(Vxx_n + jnp.swapaxes(Vxx_n, 0, 1))
        return (Vx_n, Vxx_n), (k_t, K_t)
    _, (ks_, Ks_) = jax.lax.scan(body, (Vx0, Vxx0),
                                 (Amat, Bmat, lx, lu, lxx, luu, lux), reverse=True)
    return ks_, Ks_

Amat = jnp.asarray(np.eye(nx)[None,:,:,None] + 0.05*rng.uniform(-1,1,(N,nx,nx,B)), f32)
Bmat = jnp.asarray(0.1*rng.uniform(-1,1,(N,nx,n,B)), f32)
lx = jnp.asarray(rng.uniform(-1,1,(N,nx,B)), f32)
lu = jnp.asarray(rng.uniform(-1,1,(N,n,B)), f32)
lxx1 = jnp.asarray(np.tile(np.diag(rng.uniform(0.5,1,nx))[:,:,None],(1,1,B)), f32)
luu1 = jnp.asarray(np.tile(np.diag(rng.uniform(0.1,1,n))[:,:,None],(1,1,B)), f32)
lux1 = jnp.zeros((n,nx,B), f32)
Vx0 = jnp.asarray(rng.uniform(-1,1,(nx,B)), f32)
Vxx0 = jnp.asarray(np.tile(np.diag(rng.uniform(0.5,2,nx))[:,:,None],(1,1,B)), f32)
ric_s = _ps.riccati_pallas(n, N, 1e-6, dtype=f32, stationary_curvature=True)
kf, Kf = jax.block_until_ready(ric_s(Amat, Bmat, lx, lu, lxx1, luu1, lux1, Vx0, Vxx0))
T = lambda z: jnp.tile(z[None], (N,1,1,1))
ks_ref, Ks_ref = jax.jit(lambda: scan_ric(1e-6, Amat, Bmat, lx, lu, T(lxx1), T(luu1), T(lux1), Vx0, Vxx0))()
out["riccati_stationary_k"] = float(jnp.max(jnp.abs(kf - ks_ref)))
out["riccati_stationary_K"] = float(jnp.max(jnp.abs(Kf - Ks_ref)))

lxxN = jnp.asarray(np.tile(np.diag(rng.uniform(0.5,1,nx))[None,:,:,None],(N,1,1,B))
                   + 0.01*rng.uniform(-1,1,(N,nx,nx,B)), f32)
lxxN = 0.5*(lxxN + jnp.swapaxes(lxxN,1,2))
luuN = T(luu1); luxN = jnp.asarray(0.1*rng.uniform(-1,1,(N,n,nx,B)), f32)
ric_n = _ps.riccati_pallas(n, N, 1e-6, dtype=f32, stationary_curvature=False)
kf2, Kf2 = jax.block_until_ready(ric_n(Amat, Bmat, lx, lu, lxxN, luuN, luxN, Vx0, Vxx0))
ks2, Ks2 = jax.jit(lambda: scan_ric(1e-6, Amat, Bmat, lx, lu, lxxN, luuN, luxN, Vx0, Vxx0))()
out["riccati_nonstationary_k"] = float(jnp.max(jnp.abs(kf2 - ks2)))
out["riccati_nonstationary_K"] = float(jnp.max(jnp.abs(Kf2 - Ks2)))

# --- factored riccati vs scan with the dense curvature it encodes --------
# Two regimes (ADVICE r4): well-conditioned u_d=1e-2 with a tight bar, AND
# the near-singular-Quu regime u_d=1e-4 with its own documented looser bar —
# there reg 1e-6 + tiny u damping against random low-rank J'J amplifies f32
# accumulation-order noise through Quu^-1 into percent-level k differences
# in BOTH implementations (measured 2.2e-2 rel, r4 first sweep) — that is
# conditioning, not kernel error, but the regime stays in the sweep so a
# divergence past that envelope is caught.
r = 3; qd_d = 0.01
for u_d, tag in ((1e-2, ""), (1e-4, "_illcond")):
    Jw = jnp.asarray(rng.uniform(-1,1,(r,n,N*B)), f32)
    fac = _ps.riccati_pallas_factored(n, N, 1e-6, r, qd_d, u_d, dtype=f32)
    flat = lambda z: jnp.swapaxes(z,0,1).reshape(z.shape[1], -1)
    kf3, Kf3 = jax.block_until_ready(fac(Amat, Bmat, flat(lx), flat(lu), Jw, Vx0, Vxx0))
    Jt = jnp.moveaxis(Jw.reshape(r,n,N,B), 2, 0)
    JJ = jnp.einsum("trib,trjb->tijb", Jt, Jt, precision="highest")
    dq = qd_d*jnp.eye(nx, dtype=f32).at[:n,:n].set(0.0)
    lxxF = jnp.zeros((N,nx,nx,B), f32).at[:,:n,:n].set(JJ) + dq[None,:,:,None]
    luuF = u_d*jnp.broadcast_to(jnp.eye(n,dtype=f32)[None,:,:,None],(N,n,n,B))
    luxF = jnp.zeros((N,n,nx,B), f32)
    ks3, Ks3 = jax.jit(lambda: scan_ric(1e-6, Amat, Bmat, lx, lu, lxxF, luuF, luxF, Vx0, Vxx0))()
    out[f"riccati_factored_k_rel{tag}"] = rel(kf3, ks3)
    out[f"riccati_factored_K_rel{tag}"] = rel(Kf3, Ks3)

# --- in-kernel cost accumulation (EEReach) vs separate total_cost ---------
from gridcodegenerator_tpu.ops import eepose as _eepose
from gridcodegenerator_tpu.trajopt.cost import EEReachCost
goal = _eepose.eepos(model, jnp.full((n,1), 0.3, f32))[:3, 0]
cost = EEReachCost(model=model, goal_xyz=goal, w_pos=0.5, w_pos_f=50.0)
ccv, stage_fn, term_fn = cost.pallas_cost()
fbc = _ps.linesearch_rollout_pallas(model, N, DT, GRAV, alphas, u_lo, u_hi,
                                    block_b=256, cost_consts=ccv,
                                    stage_cost=stage_fn, terminal_cost=term_fn)
Xw2, Uw2, cw2 = jax.block_until_ready(fbc(x0, U, Xs[:N], ks, Ks))
Xfull = jnp.concatenate([widen(x0)[None], Xw2], axis=0)
c_ref = cost.terminal(Xfull[N])
for t in range(N):
    c_ref = c_ref + cost.stage(Xfull[t], Uw2[t], t)
out["linesearch_inkernel_cost_rel"] = float(
    jnp.max(jnp.abs(cw2 - c_ref) / (jnp.abs(c_ref) + 1e-6)))
print(json.dumps(out, indent=1))

# --- write the round artifact --------------------------------------------
import os, sys, subprocess
ROUND = int(os.environ.get("GRID_ROUND", "5"))
# f32 accumulation-order differences only; anything past ~100 ulp is a bug.
# Trajectory STATE comparisons get a looser bar: an N-step clamped rollout
# is chaotic, so a 1-ulp control difference near a clamp boundary lawfully
# amplifies into ~1e-3-relative state divergence — the per-step CONTROL
# parity (linesearch_clamped_U_rel) is the tight check on the same sweep.
# The _illcond factored rows certify the near-singular-Quu regime at the
# measured conditioning envelope (see comment at the factored sweep above).
THRESH = {"default": 1e-4,
          "linesearch_clamped_X_rel": 2e-3,
          "riccati_factored_k_rel": 1e-3,
          "riccati_factored_K_rel": 1e-3,
          "riccati_factored_k_rel_illcond": 5e-2,
          "riccati_factored_K_rel_illcond": 5e-2}
backend = jax.default_backend()
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
try:
    commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                            capture_output=True, text=True,
                            cwd=repo).stdout.strip()
except Exception:  # noqa: BLE001
    commit = "unknown"
path = os.path.join(repo, f"VERIFY_TPU_r{ROUND:02d}.md")
lines = [
    f"# VERIFY_TPU — round {ROUND} on-chip verification",
    "",
    f"Backend: `{backend}` ({jax.devices()[0].device_kind}); "
    f"measured at commit `{commit}`.",
    "Regenerate: `python benchmarks/verify_tpu.py` on the chip (set "
    "GRID_ROUND). Run before end-of-round on ANY kernel-touching change.",
    "",
    "## 1. Fused-kernel constructor+call smoke",
    "",
    "Every fused Pallas kernel constructed AND called on-chip, per nv "
    "regime (4 below SO_DENSE_MIN_NV / 7 arm / 12 quadruped / 17 "
    "composed-FDSVA / 28 SO_MAX edge). The regression gate the CPU-forced "
    "suite cannot provide (conftest pins JAX_PLATFORMS=cpu).",
    "",
    "| robot | nv | kernel | batch | pass |",
    "|---|---|---|---|---|",
]
for r_ in smoke_rows:
    status = "yes" if r_["ok"] else f"NO — {r_.get('err', '?')}"
    lines.append(f"| {r_['robot']} | {r_['nv']} | {r_['kernel']} | "
                 f"{r_['batch']} | {status} |")
lines += [
    "",
    f"Smoke: {sum(r_['ok'] for r_ in smoke_rows)}/{len(smoke_rows)} PASS",
    "",
    "## 2. Sweep-kernel tier parity",
    "",
    f"Robot iiwa14 (vendor effort limits), f32, N={N}, B={B}. "
    "Every fused Pallas sweep kernel vs its XLA scan reference, including "
    "the array-valued effort-limit clamp path, the factored-curvature "
    "(well- and ill-conditioned regimes) and nonstationary Riccati "
    "kernels, and the in-kernel line-search cost accumulation.",
    "",
    "| check | max abs/rel err | bar | pass |",
    "|---|---|---|---|",
]
ok = True
for k, v in out.items():
    bar = THRESH.get(k, THRESH["default"])
    good = v < bar
    ok &= good
    lines.append(f"| {k} | {v:.3e} | {bar:g} | {'yes' if good else 'NO'} |")
ok = ok and smoke_ok
lines += [
    "",
    "Exact zeros are bit-identical tiers; nonzero rows are f32 "
    "accumulation-order differences between the in-kernel fused order and "
    "the scan reference (quantified-ulp, per-check bars above — state "
    "trajectories carry a looser bar than per-step controls because the "
    "clamped rollout is chaotic; the _illcond rows carry the measured "
    "conditioning envelope of the near-singular-Quu regime).",
    f"\nOverall: {'PASS' if ok else 'FAIL'}",
]
with open(path, "w") as f:
    f.write("\n".join(lines) + "\n")
print(f"wrote {path} ({'PASS' if ok else 'FAIL'})")
sys.exit(0 if ok else 1)
