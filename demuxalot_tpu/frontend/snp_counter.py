"""Streaming CPU frontend: BAM → per-chromosome compressed SNP calls.

This is the ingest stage of the pipeline. It streams a coordinate-sorted BAM,
groups reads by (cell barcode, molecule barcode) = one molecule, consensus-
calls the base each molecule shows at every SNP position (demuxalot's
signature UMI cross-checking), and emits compact columnar call tables that
are the host→device transfer format for the TPU likelihood/EM kernels.

Algorithmic behavior is kept identical to the reference
(demuxalot/snp_counter.py) because donor assignments must match bit-for-bit:
  - duplicate reads skipped by (start, end, AS) key,
  - per-base error prob chain  p_wrong *= 0.1 ** (0.1 * min(qual, 40)),
  - conflicting-base resolution with the ×1000 cutoff, ambiguous → no call,
  - group flushing every SEGMENT_LENGTH bp of stream progress.

Parallelism: embarrassing fan-out over genomic region shards via joblib
processes (each worker re-opens the BAM). The complexity-sorted task split
mirrors prepare_counting_tasks (demuxalot/snp_counter.py:330-385).
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

import joblib
import numpy as np

from ..bamio import BamReader
from ..utils.barcodes import BarcodeHandler
from ..utils.encoding import compress_base
from ..utils.files import as_str
from .cellranger import parse_read as default_parse_read

# maximal distance between non-overlapping reads from the same molecule
# to still be considered together
SEGMENT_LENGTH = 1000

MOLECULE_DTYPE = np.dtype(
    [("compressed_cb", "int32"), ("compressed_ub", "int32"), ("p_group_misaligned", "float32")]
)
SNP_CALL_DTYPE = np.dtype(
    [
        ("molecule_index", "int32"),
        ("snp_position", "int32"),
        ("base_index", "uint8"),
        ("p_base_wrong", "float32"),
    ]
)


class ChromosomeSNPLookup:
    """O(1) membership test "any SNP in [start, end)?" plus CIGAR extraction.

    Keeps a cumulative-count lookup over one chromosome's sorted SNP
    positions (reference: demuxalot/snp_counter.py:15-69).
    """

    def __init__(self, positions: np.ndarray):
        assert isinstance(positions, np.ndarray)
        assert np.array_equal(positions, np.sort(positions))
        assert len(positions) < 2**31, "can't handle that big a chromosome"
        self.lookup = np.cumsum(np.bincount(positions + 1)).astype("uint16")
        self.positions = positions

    def snips_exist(self, start: int, end: int) -> bool:
        """True if any SNP position falls in [start, end)."""
        if start >= len(self.lookup):
            return False
        end = min(end, len(self.lookup) - 1)
        return self.lookup[end] != self.lookup[start]

    def get_snps(self, read) -> List[Tuple[int, str, int]]:
        """(reference_position, base, base_quality) at SNP positions covered by the read."""
        snps: List[Tuple[int, str, int]] = []
        if not self.snips_exist(read.reference_start, read.reference_end + 1):
            return snps

        seq = read.seq
        qual = read.query_qualities

        read_position = 0
        refe_position = read.pos

        for code, length in read.cigartuples:
            if code in (0, 7, 8):  # M, =, X consume both
                if self.snips_exist(refe_position, refe_position + length):
                    lo, hi = np.searchsorted(self.positions, [refe_position, refe_position + length])
                    for ref_position in self.positions[lo:hi]:
                        position_in_read = read_position + (ref_position - refe_position)
                        snps.append((int(ref_position), seq[position_in_read], qual[position_in_read]))
                refe_position += length
                read_position += length
            elif code in (2, 3):  # deletions / skips consume reference
                refe_position += length
            elif code in (1, 4, 5, 6):  # insertions / clips consume read (or nothing)
                read_position += length
            else:
                raise NotImplementedError(f"cigar code unknown {code}")
        return snps


class CompressedSNPCalls:
    """Columnar per-chromosome store of molecules and their SNP calls.

    Two structured arrays (already SoA — they map directly to device arrays):
      molecules: (compressed_cb, compressed_ub, p_group_misaligned)
      snp_calls: (molecule_index, snp_position, base_index, p_base_wrong)
    """

    def __init__(self):
        self._molecule_rows: list = []
        self._call_rows: list = []
        self.molecules = np.empty(0, dtype=MOLECULE_DTYPE)
        self.snp_calls = np.empty(0, dtype=SNP_CALL_DTYPE)
        self._finalized = False

    @property
    def n_molecules(self) -> int:
        return len(self.molecules) if self._finalized else len(self._molecule_rows)

    @property
    def n_snp_calls(self) -> int:
        return len(self.snp_calls) if self._finalized else len(self._call_rows)

    def add_calls_from_read_group(self, compressed_cb, compressed_ub, p_group_misaligned, snps) -> None:
        assert not self._finalized, "cannot append after finalization"
        molecule_index = len(self._molecule_rows)
        self._molecule_rows.append((compressed_cb, compressed_ub, p_group_misaligned))
        for reference_position, base, p_base_wrong in snps:
            self._call_rows.append((molecule_index, reference_position, compress_base(base), p_base_wrong))

    def minimize_memory_footprint(self) -> None:
        """Finalize the growable builders into compact structured arrays."""
        if self._finalized:
            return
        self.molecules = np.array(self._molecule_rows, dtype=MOLECULE_DTYPE)
        self.snp_calls = np.array(self._call_rows, dtype=SNP_CALL_DTYPE)
        self._molecule_rows = []
        self._call_rows = []
        self._finalized = True

    def save(self, path) -> None:
        """Serialize to .npz (counting is expensive; results are reusable)."""
        self.minimize_memory_footprint()
        np.savez_compressed(path, molecules=self.molecules, snp_calls=self.snp_calls)

    @staticmethod
    def load(path) -> "CompressedSNPCalls":
        data = np.load(path)
        result = CompressedSNPCalls()
        result.molecules = data["molecules"].view(MOLECULE_DTYPE).reshape(-1)
        result.snp_calls = data["snp_calls"].view(SNP_CALL_DTYPE).reshape(-1)
        result._finalized = True
        return result

    @staticmethod
    def concatenate(snp_calls_list: List["CompressedSNPCalls"]) -> "CompressedSNPCalls":
        """Merge call sets from the same chromosome, re-basing molecule indices."""
        n_molecules = 0
        collected_calls = []
        collected_molecules = []
        for calls in snp_calls_list:
            calls.minimize_memory_footprint()
            variant_calls = calls.snp_calls.copy()
            variant_calls["molecule_index"] += n_molecules
            collected_calls.append(variant_calls)
            collected_molecules.append(calls.molecules)
            n_molecules += calls.n_molecules

        result = CompressedSNPCalls()
        result.molecules = (
            np.concatenate(collected_molecules) if collected_molecules else np.empty(0, MOLECULE_DTYPE)
        )
        result.snp_calls = (
            np.concatenate(collected_calls) if collected_calls else np.empty(0, SNP_CALL_DTYPE)
        )
        result._finalized = True
        return result


def consensus_call_molecule(
    reads,
    snp_lookup: ChromosomeSNPLookup,
    skip_complete_duplicates: bool = True,
) -> Tuple[float, list]:
    """Collapse one molecule's reads (same CB+UB) into per-SNP base calls.

    Aggregates bases across the molecule's reads; a position with
    irreconcilably conflicting candidate bases yields no call
    (reference numerics: demuxalot/snp_counter.py:142-192).
    """
    p_group_misaligned = 1.0
    seen_alignments = set()
    position2base2p_wrong: Dict[int, Dict[str, float]] = {}

    for read, p_misaligned_read in reads:
        if skip_complete_duplicates:
            # complete duplicates (same span and score) carry no new evidence
            alignment_key = (read.reference_start, read.reference_end, read.get_tag("AS"))
            if alignment_key in seen_alignments:
                continue
            seen_alignments.add(alignment_key)
        p_group_misaligned *= p_misaligned_read

        for reference_position, base, base_qual in snp_lookup.get_snps(read):
            base2p = position2base2p_wrong.setdefault(reference_position, {})
            base2p[base] = base2p.get(base, 1.0) * 0.1 ** (0.1 * min(base_qual, 40))

    consensus_calls = []  # (position, base, p_wrong)
    for snp_position, base2p_wrong in position2base2p_wrong.items():
        if len(base2p_wrong) > 1:
            # a molecule should show one base; conflicts are RT/PCR/sequencing
            # artifacts — drop candidates much worse than the best one
            best_prob = min(base2p_wrong.values())
            base2p_wrong = {
                base: p_wrong for base, p_wrong in base2p_wrong.items() if p_wrong <= best_prob * 1000
            }
        if len(base2p_wrong) != 1:
            # still ambiguous: make no call at this position
            continue
        ((base, p_wrong),) = base2p_wrong.items()
        consensus_calls.append((snp_position, base, p_wrong))

    return p_group_misaligned, consensus_calls


def _flush_molecule_groups(
    threshold_position,
    cbub2position_and_reads: dict,
    compressed_snp_calls: CompressedSNPCalls,
    snp_lookup: ChromosomeSNPLookup,
) -> None:
    """Consensus-call and evict molecule groups fully left behind the stream.

    Only groups whose rightmost read ends before ``threshold_position`` are
    processed, so later reads can never extend them
    (reference: demuxalot/snp_counter.py:195-226).
    """
    flushed_keys = []
    for cbub, (position, reads) in cbub2position_and_reads.items():
        if position >= threshold_position:
            continue
        flushed_keys.append(cbub)
        span_start = min(read.reference_start for read, _ in reads)
        span_end = max(read.reference_end for read, _ in reads) + 1
        if not snp_lookup.snips_exist(span_start, span_end):
            continue
        p_group_misaligned, snips = consensus_call_molecule(reads, snp_lookup)
        if len(snips) == 0:
            continue
        compressed_snp_calls.add_calls_from_read_group(cbub[0], cbub[1], p_group_misaligned, snips)

    for cbub in flushed_keys:
        cbub2position_and_reads.pop(cbub)


def count_call_variants_for_chromosome(
    bamfile_or_filename,
    chromosome: str,
    chromosome_snps_zero_based: np.ndarray,
    barcode_handler: BarcodeHandler,
    parse_read,
    start: Optional[int] = None,
    stop: Optional[int] = None,
) -> Tuple[str, CompressedSNPCalls]:
    """Stream one region of one chromosome into compressed SNP calls."""
    prev_segment = None
    compressed_snp_calls = CompressedSNPCalls()
    cbub2position_and_reads: dict = {}
    snp_lookup = ChromosomeSNPLookup(chromosome_snps_zero_based)
    if isinstance(bamfile_or_filename, (str, Path)):
        bamfile_or_filename = BamReader(as_str(bamfile_or_filename))

    for read in bamfile_or_filename.fetch(chromosome, start=start, stop=stop):
        parsed = parse_read(read)
        if parsed is None:
            continue
        cb = barcode_handler.get_barcode_index(read)
        if cb is None:
            continue

        p_misaligned_read, ub = parsed
        cbub = cb, ub
        entry = cbub2position_and_reads.get(cbub)
        if entry is None:
            cbub2position_and_reads[cbub] = [read.reference_end, [(read, p_misaligned_read)]]
        else:
            entry[0] = max(read.reference_end, entry[0])
            entry[1].append((read, p_misaligned_read))

        curr_segment = read.pos // SEGMENT_LENGTH
        if curr_segment != prev_segment:
            _flush_molecule_groups(
                read.pos - SEGMENT_LENGTH, cbub2position_and_reads, compressed_snp_calls, snp_lookup
            )
            prev_segment = curr_segment

    _flush_molecule_groups(np.inf, cbub2position_and_reads, compressed_snp_calls, snp_lookup)
    compressed_snp_calls.minimize_memory_footprint()
    return chromosome, compressed_snp_calls


def save_snp_counts(chromosome2calls: Dict[str, CompressedSNPCalls], directory) -> None:
    """Persist a count_snps result, one .npz per chromosome."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    for chromosome, calls in chromosome2calls.items():
        calls.save(directory / f"{chromosome}.calls.npz")


def load_snp_counts(directory) -> Dict[str, CompressedSNPCalls]:
    """Load a directory written by :func:`save_snp_counts`."""
    directory = Path(directory)
    result = {}
    for path in sorted(directory.glob("*.calls.npz")):
        chromosome = path.name[: -len(".calls.npz")]
        result[chromosome] = CompressedSNPCalls.load(path)
    return result


def count_snps(
    bamfile_location,
    chromosome2positions: Dict[str, np.ndarray],
    barcode_handler: BarcodeHandler,
    joblib_n_jobs=-1,
    joblib_verbosity=11,
    parse_read=default_parse_read,
    native: Optional[bool] = None,
) -> Dict[str, CompressedSNPCalls]:
    """Collect molecule-level SNP evidence from a BAM file.

    :param bamfile_location: path to a coordinate-sorted, indexed BAM — or a
        dict mapping RG values to paths when barcodes carry RG identity
    :param chromosome2positions: SNP positions of interest per chromosome
    :param barcode_handler: whitelist of cell barcodes
    :param joblib_n_jobs: process fan-out for region shards (None = inline)
    :param parse_read: read-filtering plugin (see frontend.cellranger)
    :param native: use the C++ scanner when available (None = auto). The
        native path requires the default cellranger-style ``parse_read``
        (tag names/thresholds are forwarded); custom callables fall back to
        the Python scanner.
    :return: per-chromosome compressed calls, consumable by the Demultiplexer
    """
    if native is not False:
        from .native_counter import try_count_snps_native

        result = try_count_snps_native(
            bamfile_location, chromosome2positions, barcode_handler,
            parse_read=parse_read, n_jobs=joblib_n_jobs, required=(native is True),
        )
        if result is not None:
            return result

    tasks = prepare_counting_tasks(bamfile_location, chromosome2positions, barcode_handler=barcode_handler)
    with joblib.Parallel(n_jobs=joblib_n_jobs, verbose=joblib_verbosity, pre_dispatch="all") as parallel:
        chromosome2compressed_snp_calls = parallel(
            joblib.delayed(count_call_variants_for_chromosome)(
                bamfile,
                chromosome,
                positions,
                start=start,
                stop=stop,
                barcode_handler=task_barcode_handler,
                parse_read=parse_read,
            )
            for bamfile, chromosome, start, stop, positions, task_barcode_handler in tasks
        )

    per_chromosome: Dict[str, List[CompressedSNPCalls]] = {}
    for chromosome, calls in chromosome2compressed_snp_calls:
        per_chromosome.setdefault(chromosome, []).append(calls)

    return {
        chromosome: CompressedSNPCalls.concatenate(chromosome_calls)
        for chromosome, chromosome_calls in per_chromosome.items()
    }


def prepare_counting_tasks(
    bamfile_location,
    chromosome2positions: Dict[str, np.ndarray],
    barcode_handler: BarcodeHandler,
    n_reads_per_job: int = 10_000_000,
    minimum_fragment_length_per_job: int = 5_000,
    minimum_overlap: int = 100,
) -> list:
    """Split counting into (region × positions) subtasks, hardest first.

    Each task covers a genomic span with a non-empty positions subset;
    regions are sized so a job sees ≲``n_reads_per_job`` reads and spans at
    least ``minimum_fragment_length_per_job`` bp, with ``minimum_overlap`` bp
    margins so molecules at the split are not lost.
    """
    if isinstance(bamfile_location, dict):
        # multiple bamfiles keyed by RG: fan out per source file with a
        # barcode handler restricted to that file's barcodes
        rg2bamfile_location = bamfile_location
        tasks = []
        assert barcode_handler.use_rg, "barcode handler should use RG tag"
        for rg in set(rg for _tag, rg in barcode_handler.barcode2index):
            assert rg in rg2bamfile_location, f"{rg} has no matching path in bamfile_location parameter"
            tasks.extend(
                prepare_counting_tasks(
                    rg2bamfile_location[rg],
                    chromosome2positions=chromosome2positions,
                    barcode_handler=barcode_handler.filter_to_rg_value(rg),
                    n_reads_per_job=n_reads_per_job,
                    minimum_fragment_length_per_job=minimum_fragment_length_per_job,
                    minimum_overlap=minimum_overlap,
                )
            )
        return tasks

    with BamReader(as_str(bamfile_location)) as f:
        chromosome2n_reads = {stat.contig: stat.mapped for stat in f.get_index_statistics()}

        tasks = []
        for chromosome, positions in chromosome2positions.items():
            length = f.get_reference_length(chromosome)
            n_jobs = min(
                chromosome2n_reads[chromosome] // n_reads_per_job,
                length // minimum_fragment_length_per_job,
            )
            n_jobs = max(1, n_jobs)

            split_ids = np.searchsorted(positions, np.linspace(0, length, n_jobs + 1)[1:-1])
            for positions_subset in np.split(positions, split_ids):
                if len(positions_subset) == 0:
                    continue
                start = max(0, int(min(positions_subset)) - minimum_overlap)
                stop = min(length, int(max(positions_subset)) + minimum_overlap)
                task = (bamfile_location, chromosome, start, stop, positions_subset, barcode_handler)
                # rough cost model: deep narrow regions with many SNPs first
                complexity = len(positions_subset) * chromosome2n_reads[chromosome] / length**0.5
                tasks.append((complexity, task))

    return [task for _complexity, task in sorted(tasks, key=lambda ct: ct[0], reverse=True)]
