"""Minimal VCF parsing: records with per-sample diploid GT calls.

Replaces the reference's use of ``pysam.VariantFile`` for genotype-prior
import (reference: demuxalot/genotypes.py:123). Handles plain and gzipped
(.gz, incl. BGZF) VCFs; only the fields demultiplexing needs are exposed:
``chrom``, ``pos`` (1-based like pysam), ``alleles`` (ref first), and
``samples[name]['GT']`` as a tuple of int-or-None.
"""
from __future__ import annotations

import gzip
from pathlib import Path
from typing import Iterator, List, Optional, Tuple, Union

import pandas as pd


class VariantRecord:
    __slots__ = ("chrom", "pos", "id", "alleles", "qual", "filter", "info", "samples")

    def __init__(self, chrom, pos, id_, alleles, qual, filter_, info, samples):
        self.chrom = chrom
        self.pos = pos  # 1-based, as in pysam.VariantRecord
        self.id = id_
        self.alleles = alleles  # (ref, alt1, alt2, ...)
        self.qual = qual
        self.filter = filter_
        self.info = info
        self.samples = samples  # name -> {"GT": (a0, a1) with None for '.'}

    @property
    def ref(self) -> str:
        return self.alleles[0]

    @property
    def alts(self) -> Tuple[str, ...]:
        return self.alleles[1:]

    def __repr__(self):
        return f"<VariantRecord {self.chrom}:{self.pos} {self.alleles}>"


def _open_maybe_gzip(path: Union[str, Path]):
    path = str(path)
    if path.endswith(".gz") or path.endswith(".bgz"):
        return gzip.open(path, "rt")
    return open(path, "rt")


def _parse_gt(value: str) -> Tuple[Optional[int], ...]:
    gt_field = value.split(":", 1)[0]
    sep = "/" if "/" in gt_field else "|"
    calls = []
    for part in gt_field.split(sep):
        calls.append(None if part in (".", "") else int(part))
    return tuple(calls)


class VariantFile:
    """Streaming VCF reader (``pysam.VariantFile`` work-alike for GT import)."""

    def __init__(self, path: Union[str, Path]):
        self.path = str(path)
        self.sample_names: List[str] = []
        self.header_lines: List[str] = []
        self._fh = _open_maybe_gzip(self.path)
        for line in self._fh:
            if line.startswith("##"):
                self.header_lines.append(line.rstrip("\n"))
            elif line.startswith("#CHROM"):
                fields = line.rstrip("\n").split("\t")
                assert fields[:9] == [
                    "#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT",
                ][: len(fields[:9])], f"malformed VCF column line: {fields[:9]}"
                self.sample_names = fields[9:]
                break
            else:
                raise ValueError(f"{path}: malformed VCF header (no #CHROM line)")

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None

    def __enter__(self) -> "VariantFile":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def fetch(self) -> Iterator[VariantRecord]:
        for line in self._fh:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            fields = line.split("\t")
            chrom, pos, id_, ref, alt = fields[0], int(fields[1]), fields[2], fields[3], fields[4]
            qual = None if fields[5] == "." else float(fields[5])
            alts = tuple(alt.split(",")) if alt != "." else ()
            alleles = (ref,) + alts
            samples = {}
            if len(fields) > 9:
                for name, sample_field in zip(self.sample_names, fields[9:]):
                    samples[name] = {"GT": _parse_gt(sample_field)}
            yield VariantRecord(chrom, pos, id_, alleles, qual, fields[6], fields[7], samples)

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *_exc):
        self.close()


def read_vcf_to_header_and_pandas(vcf_filename) -> Tuple[List[str], pd.DataFrame]:
    """Whole VCF as (meta header lines, records dataframe).

    Convenience helper covering the reference's loader surface
    (demuxalot/utils.py:112-131): the returned POS column is shifted to
    0-based to line up with this package's internal coordinates, and the
    '#CHROM' column loses its '#'.
    """
    meta: List[str] = []
    with _open_maybe_gzip(vcf_filename) as stream:
        while True:
            line = stream.readline()
            if not line.startswith("##"):
                column_line = line
                break
            meta.append(line)
        expected = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO"]
        names = column_line.rstrip("\n").split("\t")
        if names[:8] != expected:
            raise ValueError(f"{vcf_filename}: unexpected VCF columns {names[:8]}")
        records = pd.read_csv(stream, sep="\t", header=None, names=names)
    records["POS"] = records["POS"] - 1
    return meta, records.rename(columns={"#CHROM": "CHROM"})
