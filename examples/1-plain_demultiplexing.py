"""Plain demultiplexing: VCF genotypes + barcode whitelist -> posteriors.

Stages:
  1. load donor genotypes from a VCF into the probabilistic store
  2. collect UMI-consensus SNP evidence from the BAM (C++ scanner when
     available, transparently)
  3. EM-refine the genotypes while computing doublet-aware posteriors
  4. checkpoint the learnt betas for reuse in later runs
"""
import sys
from pathlib import Path

# make the in-tree package importable when running straight from examples/
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demuxalot_tpu import (
    BarcodeHandler,
    Demultiplexer,
    ProbabilisticGenotypes,
    count_snps,
)
from demuxalot_tpu.utils import Timer

DATA = "./example_data"

genotypes = ProbabilisticGenotypes(
    genotype_names=["Donor01", "Donor02", "Donor03", "Donor04"]
)
genotypes.add_vcf(f"{DATA}/test_genotypes.vcf")
barcode_handler = BarcodeHandler.from_file(f"{DATA}/test_barcodes.csv")
print(genotypes)
print(barcode_handler)

with Timer("snp counting"):
    snps = count_snps(
        bamfile_location=f"{DATA}/test_bamfile.bam",
        chromosome2positions=genotypes.get_chromosome2positions(),
        barcode_handler=barcode_handler,
    )

for chromosome, chromosome_calls in sorted(snps.items()):
    print(
        f"  {chromosome}: {chromosome_calls.n_snp_calls} calls "
        f"from {chromosome_calls.n_molecules} molecules"
    )

with Timer("EM refinement + posteriors"):
    learnt_genotypes, posteriors = Demultiplexer.learn_genotypes(
        snps,
        genotypes=genotypes,
        barcode_handler=barcode_handler,
        doublet_prior=0.25,
    )

# the betas parquet is a reusable checkpoint: feed it to add_prior_betas later
learnt_genotypes.save_betas("/tmp/learnt_betas.parquet")

print("\nassignment counts (columns are donors + doublet pairs):")
print(posteriors.idxmax(axis=1).value_counts())
print("\nfirst barcodes:")
print(posteriors.round(3).head(8))
