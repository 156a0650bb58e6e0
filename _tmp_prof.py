import time, jax, jax.numpy as jnp, numpy as np, dataclasses
from allocnet_tpu.config import QPConfig, SolverConfig
from allocnet_tpu.ops import admm, qp
from allocnet_tpu.ops.pallas import admm_tiled
from allocnet_tpu.utils import scenarios

cfg = QPConfig(); scfg = SolverConfig(); B = 1024
sc = scenarios.random_scenarios(cfg, B, seed=123, min_seg=1)
args = [jnp.asarray(sc.state, jnp.float32), jnp.asarray(sc.hpolys, jnp.float32),
        jnp.asarray(sc.times, jnp.float32), jnp.asarray(sc.seg)]
data = jax.jit(lambda st,hp,tm,sg: qp.build_qp(cfg,st,hp,tm,sg))(*args)

def sync(r):
    leaf = jax.tree.leaves(r)[0]
    float(np.asarray(leaf).ravel()[0])

def timeit(f, *a, n=5):
    sync(f(*a))
    t0 = time.time()
    for _ in range(n): sync(f(*a))
    return (time.time()-t0)/n*1000

NQ, NRR, MEQ = admm_tiled.dims(cfg)
rho_i = jnp.full((B,), scfg.rho, jnp.float32); rho_e = rho_i*scfg.rho_eq_scale

f_build = jax.jit(lambda d, re, ri: qp.normal_matrix(d, scfg.sigma, re, ri))
M = f_build(data, rho_e, rho_i)
print("normal_matrix:", round(timeit(f_build, data, rho_e, rho_i),1), "ms, M", M.shape)
f_inv = jax.jit(admm.spd_inverse); Minv = f_inv(M)
print("spd_inverse:", round(timeit(f_inv, M),1), "ms")
f_fused = jax.jit(lambda M, Minv: admm_tiled._fused_refined_inverse(M, Minv, NQ))
print("fused_refined_inverse:", round(timeit(f_fused, M, Minv),1), "ms")

for name, kw in [("deploy", {}), ("no-polish", dict(polish=False)),
                 ("no-polish 1chunk", dict(polish=False, n_chunks=1)),
                 ("no-polish 3chunk x1iter", dict(polish=False, iters_per_chunk=1)),
                 ("polish-only-ish 3x1", dict(iters_per_chunk=1))]:
    s2 = dataclasses.replace(scfg, **kw)
    f = jax.jit(lambda st,hp,tm,sg,s2=s2: admm.solve_qp(qp.build_qp(cfg,st,hp,tm,sg), s2))
    r = f(*args)
    print(name, ":", round(timeit(f, *args, n=3),1), "ms  solved", float(np.asarray(r.solved).mean()))
