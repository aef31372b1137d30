"""Data-driven discovery of new discriminative SNP positions.

Two-pass scan (reference: demuxalot/snp_detection.py): (1) a rough
demultiplexing with known genotypes gives provisional barcode→donor
assignments (TPU posterior pass, doublets off); (2) a coverage pileup over
the whole genome proposes candidate positions, which are re-counted with the
UMI-aware counter and scored by how far each provisional donor's base
distribution sits from the pooled average. Top candidates are exported as a
positions-only parquet that ``add_prior_betas`` turns into zero-weight
variants for the next EM refinement round.
"""
from __future__ import annotations

from collections import Counter, defaultdict
from pathlib import Path

import numpy as np
import pandas as pd
from joblib import Parallel, delayed

from ..bamio import BamReader
from ..frontend import cellranger
from ..frontend.snp_counter import CompressedSNPCalls, count_snps
from ..utils.barcodes import BarcodeHandler
from ..utils.files import as_str
from .demux import Demultiplexer
from .genotypes import ProbabilisticGenotypes


def detect_snps_for_chromosome(
    bamfile_path,
    chromosome: str,
    start: int,
    stop: int,
    sorted_donors,
    barcode2donor: dict,
    parse_read,
    barcode_handler: BarcodeHandler,
    regularization: float,
    minimum_coverage: int,
    minimum_alternative_fraction: float,
    minimum_alternative_coverage: int,
    max_snp_candidates: int = 10000,
    minimum_fraction_of_ref_and_alt: float = 0.98,
):
    """Scan one genomic fragment for donor-discriminative positions."""
    # stage 1: straightforward pileup counting to find SNP candidates
    # (C++ pileup when the standard tag filter is in use; Python otherwise)
    from ..frontend.native_counter import try_count_coverage_native

    coverage = 0
    bamfiles = [bamfile_path] if isinstance(bamfile_path, (str, Path)) else list(bamfile_path.values())
    for filename in bamfiles:
        native = try_count_coverage_native(as_str(filename), chromosome, start, stop, parse_read)
        if native is not None:
            coverage = coverage + np.asarray(native, dtype="int32")
            continue
        with BamReader(as_str(filename)) as bamfile:
            coverage = coverage + np.asarray(
                bamfile.count_coverage(
                    chromosome, start=start, stop=stop,
                    read_callback=lambda read: parse_read(read) is not None,
                ),
                dtype="int32",
            )

    total = coverage.sum(axis=0)
    *_, alt, ref = np.sort(coverage, axis=0)
    is_candidate = (ref + alt) > minimum_coverage
    # prefer positions where essentially all evidence is two alleles
    is_candidate &= (ref + alt) > minimum_fraction_of_ref_and_alt * total
    is_candidate &= alt > minimum_alternative_coverage
    is_candidate &= alt > ref * minimum_alternative_fraction

    candidate_positions = np.where(is_candidate)[0]

    if len(candidate_positions) > max_snp_candidates:
        # improbably many candidates: keep the strongest alternative signals
        candidate_positions = np.argsort(alt * is_candidate)[-max_snp_candidates:]
        candidate_positions = np.sort(candidate_positions)

    # positions are relative to `start` in the pileup; counting wants absolute
    candidate_positions = candidate_positions + start

    # stage 2: detailed UMI-aware counts at the candidates
    compressed_snp_calls = count_snps(
        bamfile_path,
        chromosome2positions={chromosome: candidate_positions},
        barcode_handler=barcode_handler,
        parse_read=parse_read,
        joblib_n_jobs=None,  # already inside a joblib worker
        joblib_verbosity=0,
    )
    if len(compressed_snp_calls) == 0:
        return []
    compressed_snp_calls = compressed_snp_calls[chromosome]
    donor2dindex = {donor: dindex for dindex, donor in enumerate(sorted_donors)}

    position2donor2base2count = _count_snp_stats_for_donors(
        compressed_snp_calls, barcode_handler, barcode2donor, donor2dindex
    )

    def importance_and_base_counts(counts):
        # counts: n_donors x 4; keep the two dominant bases
        top_bases = alt_b, ref_b = np.argsort(counts.sum(axis=0))[-2:]
        base_counts = {
            "ACGT"[ref_b]: counts[:, ref_b].sum(),
            "ACGT"[alt_b]: counts[:, alt_b].sum(),
        }

        counts = counts[:, top_bases] + 1e-4
        # how far is each donor from the pooled base distribution, and how
        # confident are we? 1.0 would be total confidence and total
        # divergence — 0.4 is already very good in practice
        count_0, count_1 = counts.sum(axis=0)
        p_1_avg = count_1 / (count_1 + count_0)
        p_1 = (counts[:, 1] + p_1_avg * regularization) / (counts.sum(axis=1) + regularization)
        mse_for_each_donor = np.square(p_1_avg - p_1)
        return mse_for_each_donor, base_counts

    return [
        (chromosome, position) + importance_and_base_counts(counts)
        for position, counts in position2donor2base2count.items()
    ]


def _count_snp_stats_for_donors(
    compressed_snp_calls: CompressedSNPCalls,
    barcode_handler,
    barcode2donor,
    donor2dindex,
    max_contribution_to_base_count_from_barcode=3.0,
):
    """Per-position per-donor base counts, capping any one barcode's vote.

    Vectorized: confident calls are grouped by (barcode, position, base),
    each group's count clipped at the cap, then summed per (position, donor,
    base) — same result as the reference's Counter loops
    (demuxalot/snp_detection.py:105-125) at numpy speed.
    """
    compressed_snp_calls.minimize_memory_footprint()
    calls = compressed_snp_calls.snp_calls
    confident = calls[calls["p_base_wrong"] < 0.01]
    position2donor2base2count = defaultdict(lambda: np.zeros([len(donor2dindex), 4], dtype="int32"))
    if len(confident) == 0:
        return position2donor2base2count

    # barcode index -> donor index (-1 = unassigned)
    cb2dindex = np.full(barcode_handler.n_barcodes, -1, dtype=np.int64)
    for barcode, donor in barcode2donor.items():
        index = barcode_handler.barcode2index.get(barcode)
        if index is not None:
            cb2dindex[index] = donor2dindex[donor]

    cb = compressed_snp_calls.molecules["compressed_cb"][confident["molecule_index"]].astype(np.int64)
    pos = confident["snp_position"].astype(np.int64)
    base = confident["base_index"].astype(np.int64)

    # count calls per (barcode, position, base)
    key = (cb * (pos.max() + 1) + pos) * 4 + base
    order = np.argsort(key, kind="stable")
    sorted_keys = key[order]
    starts = np.flatnonzero(
        np.concatenate([[True], sorted_keys[1:] != sorted_keys[:-1]])
    )
    counts = np.diff(np.append(starts, len(sorted_keys))).astype(np.float64)
    contribution = np.minimum(counts, max_contribution_to_base_count_from_barcode)

    first = order[starts]
    donor_idx = cb2dindex[cb[first]]
    keep = donor_idx >= 0
    g_pos, g_base, g_donor = pos[first][keep], base[first][keep], donor_idx[keep]
    g_contribution = contribution[keep].astype(np.int32)

    porder = np.argsort(g_pos, kind="stable")
    sp = g_pos[porder]
    pstarts = np.flatnonzero(np.concatenate([[True], sp[1:] != sp[:-1]]))
    for i, lo in enumerate(pstarts):
        hi = pstarts[i + 1] if i + 1 < len(pstarts) else len(sp)
        rows = porder[lo:hi]
        table = position2donor2base2count[int(sp[lo])]
        np.add.at(table, (g_donor[rows], g_base[rows]), g_contribution[rows])
    return position2donor2base2count


def detect_snps_positions(
    bamfile_location: str,
    genotypes: ProbabilisticGenotypes,
    barcode_handler: BarcodeHandler,
    *,
    minimum_coverage: int,
    minimum_alternative_fraction: float = 0.01,
    minimum_alternative_coverage: int = 100,
    n_best_snps_per_donor: int = 100,
    n_additional_best_snps: int = 1000,
    regularization: float = 3.0,
    parse_read=cellranger.parse_read,
    joblib_n_jobs=-1,
    result_beta_prior_filename=None,
    ignore_known_snps: bool = True,
    max_fragment_step: int = 10_000_000,
    joblib_verbosity=11,
):
    """Detect SNPs from the data, starting from loosely known genotypes."""
    # step 1: rough demultiplexing with the known genotypes
    snps = count_snps(
        bamfile_location=bamfile_location,
        chromosome2positions=genotypes.get_chromosome2positions(),
        barcode_handler=barcode_handler,
        joblib_n_jobs=joblib_n_jobs,
        parse_read=parse_read,
        joblib_verbosity=joblib_verbosity,
    )

    _likelihoods, posterior_probabilities = Demultiplexer.predict_posteriors(
        snps,
        genotypes=genotypes,
        barcode_handler=barcode_handler,
        doublet_prior=0.0,
    )
    confident = posterior_probabilities.max(axis=1) > 0.8
    barcode2donor = posterior_probabilities[confident].idxmax(axis=1).to_dict()
    donor_counts = Counter(barcode2donor.values())
    print("Number of confidently assigned barcodes for each donor")
    print(pd.Series(donor_counts).sort_index())

    # step 2: genome-wide candidate scan using the provisional assignments
    filename = (
        bamfile_location
        if isinstance(bamfile_location, (str, Path))
        else list(bamfile_location.values())[0]
    )
    with BamReader(as_str(filename)) as f:
        chromosomes = [(s.contig, f.get_reference_length(s.contig)) for s in f.get_index_statistics()]

    sorted_donors = np.unique([donor for donor in barcode2donor.values()])

    tasks = [
        delayed(detect_snps_for_chromosome)(
            bamfile_location,
            chromosome=chromosome,
            start=start,
            stop=min(start + max_fragment_step, length),
            barcode2donor=barcode2donor,
            parse_read=parse_read,
            sorted_donors=sorted_donors,
            minimum_coverage=minimum_coverage,
            minimum_alternative_coverage=minimum_alternative_coverage,
            minimum_alternative_fraction=minimum_alternative_fraction,
            barcode_handler=barcode_handler,
            regularization=regularization,
        )
        for chromosome, length in chromosomes
        for start in range(0, length, max_fragment_step)
    ]
    with Parallel(n_jobs=joblib_n_jobs, verbose=joblib_verbosity, pre_dispatch="all") as parallel:
        chrom_pos_importances_collection = parallel(tasks)

    chrom_pos_importances = sum(chrom_pos_importances_collection, [])
    if len(chrom_pos_importances) == 0:
        print("No SNP candidates passed the thresholds")
        return []
    selected_snps = _select_top_snps(chrom_pos_importances, n_additional_best_snps, n_best_snps_per_donor)

    if ignore_known_snps:
        snp_positions = genotypes.get_snp_positions_set()
        selected_snps = [
            (chrom, pos, importance, base_count)
            for chrom, pos, importance, base_count in selected_snps
            if (chrom, pos) not in snp_positions
        ]

    if result_beta_prior_filename is not None:
        _export_snps_to_beta(selected_snps, result_beta_prior_filename)

    return selected_snps


def _select_top_snps(chrom_pos_importances, n_additional_best_snps, n_best_snps_per_donor):
    """Union of the best positions per donor and the best positions overall."""
    importances_all = np.stack([imp for _chrom, _pos, imp, _bases in chrom_pos_importances], axis=0)
    best_snps_for_donors = np.argsort(-importances_all, axis=0)[:n_best_snps_per_donor]
    best_snps_overall = np.argsort(-importances_all.sum(axis=1))
    is_new_snps = ~np.isin(best_snps_overall, best_snps_for_donors)
    total_new_snps = np.cumsum(is_new_snps, axis=0)
    best_snps_overall = best_snps_overall[
        : np.searchsorted(total_new_snps, n_additional_best_snps, side="right")
    ]
    selected_snp_ids = np.union1d(best_snps_for_donors.flatten(), best_snps_overall)
    return [chrom_pos_importances[i] for i in selected_snp_ids]


def _export_snps_to_beta(selected_snps, prior_filename):
    """Positions-only parquet: add_prior_betas turns rows into zero-weight variants."""
    df = defaultdict(list)
    for chromosome, position, _importances, bases_count in selected_snps:
        for base, _base_count in bases_count.items():
            df["CHROM"].append(chromosome)
            df["POS"].append(position)
            df["BASE"].append(base)

    # empty-column dataframe with the (CHROM, POS, BASE) index — positions only
    df = pd.DataFrame(df, columns=["CHROM", "POS", "BASE"])
    df = df.set_index(["CHROM", "POS", "BASE"])
    df.to_parquet(prior_filename)
