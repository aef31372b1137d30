"""
Simple demultiplexing with known genotypes using custom SAM tags.

Passing a functools.partial of the standard filter keeps the fast native
scanner; an arbitrary lambda would transparently use the Python scanner.
"""
from functools import partial

from demuxalot_tpu import Demultiplexer, BarcodeHandler, ProbabilisticGenotypes, count_snps
from demuxalot_tpu.frontend.cellranger import parse_read

genotypes = ProbabilisticGenotypes(genotype_names=['Donor01', 'Donor02', 'Donor03', 'Donor04'])
genotypes.add_vcf('./example_data/test_genotypes.vcf')
custom_celltag = "CB"
custom_umitag = "UB"

print(f'Loaded genotypes: {genotypes}')

barcode_handler = BarcodeHandler.from_file('./example_data/test_barcodes.csv', tag=custom_celltag)
print(f'Loaded barcodes: {barcode_handler}')

parse_read_custom = partial(parse_read, umi_tag=custom_umitag)
snps = count_snps(
    bamfile_location='./example_data/test_bamfile.bam',
    chromosome2positions=genotypes.get_chromosome2positions(),
    barcode_handler=barcode_handler,
    parse_read=parse_read_custom,
)

print('Collected SNPs: ')
for chromosome, snps_in_chromosome in snps.items():
    print(f'Chromosome {chromosome}, {snps_in_chromosome.n_snp_calls} calls in {snps_in_chromosome.n_molecules} mols')

learnt_genotypes, posterior_probabilities = Demultiplexer.learn_genotypes(
    snps,
    genotypes=genotypes,
    barcode_handler=barcode_handler,
    doublet_prior=0.25,
)

print('Result:')
print(posterior_probabilities.round(3))
