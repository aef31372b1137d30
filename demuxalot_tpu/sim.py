"""Synthetic data generation: donor genomes, reads, BAMs, genotypes.

The primary correctness harness (mirroring the reference's synthetic
end-to-end strategy, tests/test_synthetic.py:27-145): random reference
chromosomes, per-donor mutated genomes, cellranger-style tagged reads
written through this framework's own BAM writer, plus ground-truth
``ProbabilisticGenotypes``. Also used by the benchmark suite to synthesize
device-level workloads of arbitrary scale without BAM involvement.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .bamio import AlignedRead, BamWriter, index_bam, sort_bam
from .models.genotypes import ProbabilisticGenotypes


_BASES = np.array(list("ACGT"))


def random_bases(length: int) -> np.ndarray:
    # identical RNG stream and output to np.random.choice(list("ACGT"), n)
    # (choice draws via randint for uniform array sampling) without the
    # per-call list/array construction — this is the synthetic generator's
    # hottest call (two per read for name/UMI)
    return _BASES[np.random.randint(0, 4, length)]


_BASE_ASCII = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_string(length: int) -> str:
    return _BASE_ASCII[np.random.randint(0, 4, length)].tobytes().decode("ascii")


class SyntheticReference:
    """Random reference genome with per-chromosome sequences."""

    def __init__(self, chromosome2length: Dict[str, int]):
        self.chromosome2sequence = {
            chromosome: random_bases(length) for chromosome, length in chromosome2length.items()
        }
        self.chromosome2length = dict(chromosome2length)

    def bam_header(self) -> dict:
        return {
            "HD": {"VN": "1.0"},
            "SQ": [dict(LN=length, SN=name) for name, length in self.chromosome2length.items()],
        }

    def mutate(self, mutation_prob: float) -> "SyntheticReference":
        """Derive a donor genome by random point mutations."""
        result = SyntheticReference.__new__(SyntheticReference)
        result.chromosome2length = dict(self.chromosome2length)
        result.chromosome2sequence = {}
        for chrom, seq in self.chromosome2sequence.items():
            seq = seq.copy()
            mask = np.random.uniform(0, 1, size=len(seq)) < mutation_prob
            seq[mask] = random_bases(int(mask.sum()))
            result.chromosome2sequence[chrom] = seq
        return result

    def _rendered(self, chromosome: str) -> str:
        """Chromosome as one Python string (read slicing is O(read), not
        a per-base join); cached, invalidated implicitly by immutability —
        sequences are never mutated in place after construction."""
        cache = getattr(self, "_string_cache", None)
        if cache is None:
            cache = self._string_cache = {}
        s = cache.get(chromosome)
        if s is None:
            s = cache[chromosome] = "".join(self.chromosome2sequence[chromosome])
        return s

    def make_read(self, read_length: int, query_name: str, cb: str, ub: str) -> AlignedRead:
        """One cellranger-style tagged read from a random location."""
        reference_id = np.random.randint(len(self.chromosome2length))
        chromosome, chr_length = list(self.chromosome2length.items())[reference_id]
        start = np.random.randint(0, chr_length - read_length)

        a = AlignedRead()
        a.query_name = query_name
        a.query_sequence = self._rendered(chromosome)[start : start + read_length]
        a.flag = 99
        a.reference_id = reference_id
        a.reference_start = int(start)
        a.mapping_quality = 255
        a.cigar = ((0, read_length),)
        a.template_length = read_length
        a.query_qualities = [27] * read_length  # '<' in phred+33
        a.tags = (
            ("NM", 1),
            ("RG", "L1"),
            ("NH", 1),
            ("AS", read_length - 2),
            ("CB", cb),
            ("UB", ub),
        )
        return a


def genotypes_from_donor_genomes(donor_genomes: List[SyntheticReference]) -> ProbabilisticGenotypes:
    """Ground-truth betas: 100 at each donor's base, 0.5 elsewhere.

    Only polymorphic positions (where donors disagree) become variants.
    Registration order (per chromosome, ascending position, donor order
    within a position) is load-bearing: variant/SNP ids derive from it and
    the quality harnesses key degradation masks off those ids — this
    vectorized scan preserves the original per-position dict walk exactly.
    """
    donor_names = [f"Donor{donor_id + 1:02}" for donor_id in range(len(donor_genomes))]
    result = ProbabilisticGenotypes(donor_names)
    rows: List[int] = []
    donor_of_row: List[int] = []
    for chrom in donor_genomes[0].chromosome2length:
        seqs = np.stack([g.chromosome2sequence[chrom] for g in donor_genomes])  # [D, L]
        polymorphic = (seqs != seqs[:1]).any(axis=0)
        for pos in np.nonzero(polymorphic)[0]:
            # registry call per UNIQUE base only (typically 2 of D), in the
            # same first-seen donor order as the per-donor walk
            local: Dict[str, int] = {}
            for donor_index, base in enumerate(seqs[:, pos].tolist()):
                row = local.get(base)
                if row is None:
                    row = local[base] = result.get_variant_id(chrom, int(pos), base)
                rows.append(row)
                donor_of_row.append(donor_index)
    # everything not explicitly supported gets a weak 0.5 pseudo-count;
    # _with_betas also trims spare capacity so callers can mask full arrays
    betas = np.full((result.n_variants, len(donor_names)), 0.5, dtype=np.float32)
    if rows:
        betas[np.asarray(rows), np.asarray(donor_of_row)] = 100.0
    return result._with_betas(betas)


def generate_bam_file(
    filename: str,
    n_genotypes: int = 20,
    doublets_fraction: float = 0.2,
    mutation_prob: float = 0.01,
    read_length: int = 100,
    n_barcodes: int = 1000,
    n_reads_per_barcode: int = 100,
    chromosome2length: Dict[str, int] = None,
):
    """Synthesize a sorted, indexed BAM plus ground truth.

    Returns (filename, genotypes, barcode2donor_ids, barcode2donor_names).
    ``doublets_fraction`` of barcodes mix reads from two random donors.
    """
    if chromosome2length is None:
        chromosome2length = {"chr1": 1000, "chr2": 1000, "chr3": 1000}
    reference = SyntheticReference(chromosome2length)

    donor_genomes = [reference.mutate(mutation_prob) for _ in range(n_genotypes)]
    prob_genotypes = genotypes_from_donor_genomes(donor_genomes)

    barcode2donor_ids = {}
    barcode2donor_names = {}
    for _ in range(n_barcodes):
        doublet = np.random.uniform() < doublets_fraction
        donor_ids = np.random.randint(0, n_genotypes, size=1 + doublet)
        donor_names = [f"Donor{donor_id + 1:02}" for donor_id in donor_ids]
        barcode = random_string(10) + "-1"
        while barcode in barcode2donor_ids:  # collisions would corrupt ground truth
            barcode = random_string(10) + "-1"
        barcode2donor_ids[barcode] = donor_ids
        barcode2donor_names[barcode] = donor_names

    with BamWriter(filename, reference.bam_header()) as f:
        for barcode, donor_ids in barcode2donor_ids.items():
            for _ in range(n_reads_per_barcode):
                donor_id = np.random.choice(donor_ids)
                read = donor_genomes[donor_id].make_read(
                    read_length=read_length,
                    query_name=random_string(20),
                    cb=barcode,
                    ub=random_string(10),
                )
                f.write(read)

    sort_bam(filename, filename)
    index_bam(filename)
    return filename, prob_genotypes, barcode2donor_ids, barcode2donor_names


def synthesize_device_workload(
    n_barcodes: int,
    n_donors: int,
    n_snps: int,
    calls_per_barcode: int,
    seed: int = 0,
):
    """Device-level workload, no BAM: ground truth + packed call arrays.

    Produces (betas, variant2snp, vid, cb, q, truth_donor) with calls sorted
    by barcode; used by benchmarks and kernel tests at arbitrary scale.
    """
    rng = np.random.RandomState(seed)
    n_variants = n_snps * 2
    variant2snp = np.repeat(np.arange(n_snps, dtype=np.int32), 2)

    # two alleles per snp; each donor picks one with high confidence
    donor_allele = rng.randint(0, 2, size=(n_snps, n_donors))
    betas = np.full((n_variants, n_donors), 0.5, dtype=np.float32)
    snp_base_rows = np.arange(n_snps) * 2
    for donor in range(n_donors):
        betas[snp_base_rows + donor_allele[:, donor], donor] = 100.0

    truth_donor = rng.randint(0, n_donors, size=n_barcodes)
    n_calls = n_barcodes * calls_per_barcode
    cb = np.repeat(np.arange(n_barcodes, dtype=np.int32), calls_per_barcode)
    snp = rng.randint(0, n_snps, size=n_calls)
    # barcode's donor emits its own allele with small error probability
    allele = donor_allele[snp, truth_donor[cb]]
    flip = rng.rand(n_calls) < 0.02
    allele = np.where(flip, 1 - allele, allele)
    vid = (snp * 2 + allele).astype(np.int32)
    q = (0.1 ** (0.1 * rng.randint(20, 41, size=n_calls))).astype(np.float32)
    return betas, variant2snp, vid, cb, q, truth_donor
