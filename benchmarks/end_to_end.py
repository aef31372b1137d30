"""End-to-end pipeline benchmark: BAM → counting → packing → EM → posteriors.

Synthesizes a multi-chromosome experiment at a configurable scale, then
times every stage: native vs Python counting, host packing, device EM.
Prints one JSON line per stage plus a summary.

    python benchmarks/end_to_end.py [n_barcodes] [n_donors]
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

from demuxalot_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def main():
    import tempfile

    from demuxalot_tpu import BarcodeHandler, Demultiplexer, count_snps
    from demuxalot_tpu.sim import generate_bam_file

    n_barcodes = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    n_donors = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    np.random.seed(0)
    stages = {}
    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        filename, genotypes, _ids, names = generate_bam_file(
            str(Path(tmp) / "bench.bam"),
            n_genotypes=n_donors,
            n_barcodes=n_barcodes,
            n_reads_per_barcode=50,
            mutation_prob=0.005,
            chromosome2length={f"chr{i}": 20_000 for i in range(1, 9)},
        )
        stages["generate_bam_s"] = round(time.perf_counter() - t0, 2)
        handler = BarcodeHandler(list(names))
        positions = genotypes.get_chromosome2positions()
        n_reads = n_barcodes * 50

        t0 = time.perf_counter()
        calls = count_snps(filename, positions, handler, joblib_n_jobs=4,
                           joblib_verbosity=0, native=True)
        stages["count_native_s"] = round(time.perf_counter() - t0, 2)
        stages["native_reads_per_s"] = round(n_reads / stages["count_native_s"], 1)

        t0 = time.perf_counter()
        calls_py = count_snps(filename, positions, handler, joblib_n_jobs=4,
                              joblib_verbosity=0, native=False)
        stages["count_python_s"] = round(time.perf_counter() - t0, 2)
        del calls_py

        n_calls = sum(c.n_snp_calls for c in calls.values())

        t0 = time.perf_counter()
        learnt, probs = Demultiplexer.learn_genotypes(
            calls, genotypes, barcode_handler=handler, n_iterations=5
        )
        stages["learn_genotypes_5it_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        logits, probs = Demultiplexer.predict_posteriors(
            calls, genotypes, barcode_handler=handler, doublet_prior=0.35
        )
        stages["predict_posteriors_s"] = round(time.perf_counter() - t0, 2)

        # accuracy against ground truth: any truly-contributing donor named
        assignments = probs.idxmax(axis=1)
        correct = [
            any(d in names[barcode] for d in assigned.split("+"))
            for barcode, assigned in assignments.items()
        ]
        accuracy = float(np.mean(correct))

    import jax

    print(json.dumps({
        "benchmark": "end_to_end_pipeline",
        "backend": jax.default_backend(),
        "n_barcodes": n_barcodes,
        "n_donors": n_donors,
        "n_reads": n_reads,
        "n_calls": n_calls,
        "assignment_accuracy": round(accuracy, 4),
        **stages,
    }))


if __name__ == "__main__":
    main()
