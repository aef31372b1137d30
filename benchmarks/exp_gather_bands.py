"""Gather-bound probes: banded slices (no help) and row-width/dtype/order
invariance — evidence that the v5e gather engine is index-count bound at
~2.6 ns/row. Feeds the Roofline gather term (utils/profiling.py).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, numpy as np, jax.numpy as jnp

from demuxalot_tpu.ops import likelihood as L
from demuxalot_tpu.sim import synthesize_device_workload

assert jax.default_backend() == "tpu"
n_donors, n_barcodes, n_snps, cpb = 32, 65536, 65536, 64
betas, v2s, vid, cb, q, _ = synthesize_device_workload(n_barcodes, n_donors, n_snps, cpb, seed=3)
gp = jnp.asarray(np.asarray(jax.jit(L.probs_from_betas, static_argnums=(2,3))(
    jnp.asarray(betas), jnp.asarray(v2s), n_snps, 0.01)))
V = gp.shape[0]
print(f"table {V}x{n_donors} = {V*n_donors*4/1e6:.1f} MB, N={len(vid)}", flush=True)

order = np.argsort(cb, kind="stable")
vid_s = vid[order]; q_s = q[order]
omq = jnp.asarray((1.0 - q_s).astype(np.float32).reshape(1, -1))
qt = jnp.asarray(np.maximum(q_s, 1e-4).astype(np.float32).reshape(1, -1))

trivial = jax.jit(lambda x: x + 1)
float(jnp.sum(trivial(jnp.zeros(8))))
def lat():
    return min((lambda t0: (float(jnp.sum(trivial(jnp.zeros(8)))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(5))

def chain_bench(step, operands, k, label, iters=3):
    chain = jax.jit(lambda c, a: jax.lax.fori_loop(0, k, lambda i, c: step(c, a), c))
    float(jnp.sum(chain(jnp.float32(0.0), operands)))
    l = lat()
    best = min((lambda t0: (float(jnp.sum(chain(jnp.float32(0.0), operands))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(iters))
    print(f"{label:40s} {(max(best-l,1e-9))/k*1e3:8.2f} ms", flush=True)

for n_bands in (1, 2, 4, 8):
    edges = np.linspace(0, V, n_bands + 1).astype(np.int64)
    band = np.clip(np.searchsorted(edges, vid_s, side="right") - 1, 0, n_bands - 1)
    bord = np.argsort(band, kind="stable")
    vid_b = vid_s[bord]; 
    omq_b = jnp.asarray((1.0 - q_s[bord]).astype(np.float32).reshape(1, -1))
    qt_b = jnp.asarray(np.maximum(q_s[bord], 1e-4).astype(np.float32).reshape(1, -1))
    bounds = np.searchsorted(band[bord], np.arange(n_bands + 1))
    specs = tuple((int(edges[k]), int(edges[k+1]), int(bounds[k]), int(bounds[k+1])) for k in range(n_bands))
    vid_loc = vid_b.copy()
    for (vlo, vhi, clo, chi) in specs:
        vid_loc[clo:chi] -= vlo
    vid_d = jnp.asarray(vid_loc)

    def gstep(c, a, specs=specs):
        g, v, om, w = a
        tot = jnp.float32(0.0)
        for (vlo, vhi, clo, chi) in specs:
            tab = jax.lax.slice_in_dim(g + c, vlo, vhi, axis=0).T
            vk = jax.lax.slice_in_dim(v, clo, chi, axis=0)
            uk = tab[:, vk] * jax.lax.slice_in_dim(om, clo, chi, axis=1) + jax.lax.slice_in_dim(w, clo, chi, axis=1)
            tot = tot + jnp.sum(uk)
        return tot * 1e-30
    chain_bench(gstep, (gp, vid_d, omq_b, qt_b), k=12, label=f"gather+fold {n_bands} band(s), no concat")

    if n_bands > 1:
        def cstep(c, a, specs=specs):
            g, v, om, w = a
            parts = []
            for (vlo, vhi, clo, chi) in specs:
                tab = jax.lax.slice_in_dim(g + c, vlo, vhi, axis=0).T
                vk = jax.lax.slice_in_dim(v, clo, chi, axis=0)
                parts.append(tab[:, vk] * jax.lax.slice_in_dim(om, clo, chi, axis=1) + jax.lax.slice_in_dim(w, clo, chi, axis=1))
            return jnp.sum(jnp.concatenate(parts, axis=1)) * 1e-30
        chain_bench(cstep, (gp, vid_d, omq_b, qt_b), k=12, label=f"gather+fold {n_bands} band(s), concat")
