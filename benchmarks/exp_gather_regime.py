"""Gather regime probes: f32/bf16, 8/32/64-wide rows, ascending vs
barcode-order indices — all ~10-12 ms for 4.19M rows. The gather is
index-count bound; see utils/profiling.py Roofline."""
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
V, D = gp.shape
N = len(vid)
order = np.argsort(cb, kind="stable")
vid_bc = jnp.asarray(vid[order])          # barcode-sorted (random-ish vids)
vid_asc = jnp.asarray(np.sort(vid))       # ascending vids
gp16 = gp.astype(jnp.bfloat16)
gp64 = jnp.concatenate([gp, gp], axis=1)  # 256B rows
gp8 = jnp.asarray(np.asarray(gp)[:, :8].copy())  # 32B rows

trivial = jax.jit(lambda x: x + 1)
float(jnp.sum(trivial(jnp.zeros(8))))
def lat():
    return min((lambda t0: (float(jnp.sum(trivial(jnp.zeros(8)))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(5))
def bench(step, operands, k, label, iters=3):
    chain = jax.jit(lambda c, a: jax.lax.fori_loop(0, k, lambda i, c: step(c, a), c))
    float(jnp.sum(chain(jnp.float32(0.0), operands)))
    l = lat()
    best = min((lambda t0: (float(jnp.sum(chain(jnp.float32(0.0), operands))), time.perf_counter()-t0)[1])(time.perf_counter()) for _ in range(iters))
    print(f"{label:44s} {(max(best-l,1e-9))/k*1e3:8.2f} ms", flush=True)

bench(lambda c, a: jnp.sum(a[0].T[:, a[1]] + c) * 1e-30, (gp, vid_bc), 12, "f32 [V,32] gather (bc order) +sum")
bench(lambda c, a: jnp.sum((a[0] + c.astype(jnp.bfloat16)).T[:, a[1]].astype(jnp.float32)) * 1e-30, (gp16, vid_bc), 12, "bf16 [V,32] gather (bc order) +sum")
bench(lambda c, a: jnp.sum(a[0].T[:, a[1]] + c) * 1e-30, (gp, vid_asc), 12, "f32 [V,32] gather (ascending) +sum")
bench(lambda c, a: jnp.sum(a[0].T[:, a[1]] + c) * 1e-30, (gp64, vid_bc), 12, "f32 [V,64] gather (bc order) +sum")
bench(lambda c, a: jnp.sum(a[0].T[:, a[1]] + c) * 1e-30, (gp8, vid_bc), 12, "f32 [V,8] gather (bc order) +sum")
# row-major gather (no transpose trick) for comparison
bench(lambda c, a: jnp.sum((a[0] + c)[a[1], :]) * 1e-30, (gp, vid_bc), 12, "f32 row-gather gp[vid,:] +sum")
