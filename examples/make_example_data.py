"""Generate the checked-in example dataset (BAM + barcodes + VCF).

Synthetic 4-donor experiment written entirely through this framework's own
I/O: a sorted+indexed BAM with cellranger-style tags, a barcode whitelist,
and a diploid VCF of the donor-discriminative positions.
"""
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from demuxalot_tpu.sim import SyntheticReference, generate_bam_file  # noqa: E402


def main():
    out = Path(__file__).resolve().parent / "example_data"
    out.mkdir(exist_ok=True)
    np.random.seed(2024)

    filename, genotypes, _ids, barcode2donor_names = generate_bam_file(
        str(out / "test_bamfile.bam"),
        n_genotypes=4,
        doublets_fraction=0.2,
        mutation_prob=0.04,
        n_barcodes=400,
        n_reads_per_barcode=60,
        chromosome2length={"chr1": 1000, "chr2": 1000, "chr3": 1000},
    )
    (out / "test_barcodes.csv").write_text("\n".join(barcode2donor_names) + "\n")

    # rebuild donor genomes deterministically is awkward post-hoc; instead emit
    # the VCF from the ground-truth genotype store (ref/alt per snp)
    donor_names = genotypes.genotype_names
    by_snp = defaultdict(dict)
    for (chrom, pos, base), vid in genotypes.var2varid.items():
        by_snp[chrom, pos][base] = genotypes.variant_betas[vid]

    lines = [
        "##fileformat=VCFv4.2",
        "##source=demuxalot_tpu synthetic example",
        "##contig=<ID=chr1,length=1000>",
        "##contig=<ID=chr2,length=1000>",
        "##contig=<ID=chr3,length=1000>",
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t" + "\t".join(donor_names),
    ]
    snp_id = 0
    for (chrom, pos) in sorted(by_snp, key=lambda cp: (cp[0], cp[1])):
        base2betas = by_snp[chrom, pos]
        if len(base2betas) != 2:
            continue
        (ref, betas_ref), (alt, betas_alt) = sorted(base2betas.items())
        gts = []
        for d in range(len(donor_names)):
            gts.append("0/0" if betas_ref[d] > betas_alt[d] else "1/1")
        lines.append(f"{chrom}\t{pos + 1}\tSNP{snp_id}\t{ref}\t{alt}\t.\t.\t.\tGT\t" + "\t".join(gts))
        snp_id += 1
    (out / "test_genotypes.vcf").write_text("\n".join(lines) + "\n")
    print(f"wrote {snp_id} SNPs, BAM + barcodes + VCF in {out}")


if __name__ == "__main__":
    main()
