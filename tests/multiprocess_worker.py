"""Worker for the 2-process distributed EM test (launched by pytest).

Each process owns 4 virtual CPU devices; the global mesh spans 8 devices
across both processes. Both processes construct the same logical inputs;
`put_global` places only the shards each process can address, and the
M-step psum crosses the process boundary. Process 0 writes the learnt
addition for the test to compare against the single-process result.

Usage: python multiprocess_worker.py <process_id> <coordinator_port> <out_dir>
"""
import os
import sys
from pathlib import Path

process_id = int(sys.argv[1])
port = int(sys.argv[2])
out_dir = Path(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=2,
    process_id=process_id,
)

import numpy as np

from demuxalot_tpu.ops import likelihood as L
from demuxalot_tpu.ops import packing as P
from demuxalot_tpu.parallel.mesh import make_mesh, to_host
from demuxalot_tpu.parallel.sharded import ShardedDemultiplexer, _build_mstep
from demuxalot_tpu.sim import synthesize_device_workload

assert jax.device_count() == 8, jax.devices()
assert jax.local_device_count() == 4

N_B, N_D, N_S, CPB = 1024, 4, 64, 8
betas, v2s, vid, cb, q, _ = synthesize_device_workload(N_B, N_D, N_S, CPB, seed=11)
mixing, _names = L.pseudogenotype_mixing([f"D{i}" for i in range(N_D)], 0.25)
pen = L.doublet_penalties(N_D, 0.25)
n_variants, n_genotypes = betas.shape

sh = ShardedDemultiplexer(make_mesh())  # global 8-device mesh
rec = np.recarray(len(vid), dtype=P.BARCODE_CALLS_DTYPE)
rec["variant_id"], rec["compressed_cb"], rec["p_base_wrong"] = vid, cb, q
rec["snp_id"] = v2s[vid]
rec["barcode_variant_count"] = 1
rec["barcode_snp_count"] = 1

# shard-local data path: this process hands over ONLY the rows of its own
# barcode ranges — the full call table is never materialized here, which is
# the property that keeps host memory flat at pod scale
per_shard = sh._barcodes_per_shard(N_B)
my_rows = np.isin(rec["compressed_cb"] // per_shard, sh._local_shard_ids())
rec_local = rec[my_rows]
assert 0 < len(rec_local) < len(rec), "each process should hold a strict subset"
del rec

device, arrays, tiled = sh._shard_inputs(rec_local, N_B, mixing, pen, n_variants=n_variants)
betas_r, v2s_r, mix_r, pen_r = sh._replicate(betas, v2s, mixing, pen)
estep, eargs = sh._make_estep(device, arrays, tiled, N_S, 0.01, mixing.shape[1], mix_r, pen_r)
mstep = jax.jit(_build_mstep(sh.mesh, n_variants, n_genotypes, 2.0, sh.call_chunk))

logits, probs = estep(betas_r, v2s_r, *eargs)
addition = mstep(probs, arrays["vid_v"], arrays["cb_v"], arrays["q_v"])

logits_np = to_host(logits)[:N_B]
addition_np = to_host(addition)

if process_id == 0:
    np.savez(out_dir / "result.npz", logits=logits_np, addition=addition_np)
print(f"process {process_id} done", flush=True)
